"""Python-worker daemon with heavy imports pre-warmed (guide §4.5).

Stock PySpark forks every worker from ``pyspark.daemon``; each fresh
worker then pays the ``pandas``/``pyarrow``/``numpy`` import cost
(~0.6 s, and N workers spawning at once contend for the same cores)
before the first Arrow batch can flow.  Importing those modules — and
this engine's pure-Python extraction core — ONCE in the daemon process
means every forked worker inherits them via copy-on-write for free.

On a real cluster the effect is the same per fresh executor: the first
task of every Python stage starts ~0.6 s earlier and 32 concurrent
worker spawns don't stampede the CPU with duplicate imports.

Wired up by ``session.get_spark`` via ``spark.python.daemon.module``
(the documented daemon hook).  NOTE: PySpark has NO automatic fallback
— if the configured daemon module cannot be imported by the executor's
Python, every Python task fails.  ``get_spark`` only builds local-mode
sessions, where the JVM inherits the driver process's PYTHONPATH (set
by ``get_spark`` itself), so the import is guaranteed there; when
submitting against a real cluster either ship the package AND set
``spark.executorEnv.PYTHONPATH``, or disable the daemon with
``OCRDS_WORKER_DAEMON=0``.  The try/except below only guards the
pre-warm imports: a missing pandas must degrade to a stock-speed
worker, never a dead one.
"""

from __future__ import annotations

if __name__ == "__main__":
    try:  # pre-warm the Arrow-stage stack; never fail the daemon on it
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401

        import ocr_devnagari_spark.extract_core  # noqa: F401
    except Exception:  # pragma: no cover - defensive: stock path works
        pass
    from pyspark.daemon import manager

    manager()
