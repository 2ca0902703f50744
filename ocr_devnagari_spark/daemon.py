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
(the documented daemon hook); falls back to stock behaviour if this
package is not importable on the worker side.
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
