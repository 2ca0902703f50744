"""SparkSession factory tuned for the extraction workload.

Local-mode defaults match the sandbox (``local[N]`` threads, single JVM);
every setting here is also the right default on a real multi-executor
cluster at 10^12-document scale:

- AQE on: runtime partition coalescing + skew-join splitting cover the
  escalation join-back whose selectivity (~8-15% of rows, see
  ``docs/HYBRID_ARCHITECTURE.md`` in the reference) is only known at runtime.
- Arrow on + bounded batch size: the extraction UDFs are Arrow-batched
  ``mapInPandas`` stages; big HTML payloads need smaller record batches so a
  batch's working set stays bounded (the reference's 26.4 GB → <4 GB memory
  incident, ``docs/RESILIENT_OCR_PLAN.md``, is exactly an unbounded-batch bug).
- UTC session timezone: no wall-clock leaks into output bytes.
"""

from __future__ import annotations

import hashlib
import os
import zipfile

from pyspark.sql import SparkSession


def package_zip(out_dir: str = "/tmp") -> str:
    """Zip this package for ``spark-submit --py-files`` shipping.

    Content-addressed filename so repeated sessions reuse the artifact and
    a changed source tree gets a fresh one. This is the same packaging the
    north rule's multi-executor run uses — in local mode it also makes the
    engine importable by Python workers regardless of the driver's cwd.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in root:
            continue
        for fn in sorted(files):
            if fn.endswith(".py"):
                entries.append(os.path.join(root, fn))
    h = hashlib.sha256()
    for fp in sorted(entries):
        h.update(fp.encode())
        with open(fp, "rb") as f:
            h.update(f.read())
    zpath = os.path.join(out_dir, f"ocr_devnagari_spark-{h.hexdigest()[:12]}.zip")
    if not os.path.exists(zpath):
        tmp = f"{zpath}.{os.getpid()}.tmp"   # unique per process: two
        #                                      concurrent builders must not
        #                                      interleave writes to one tmp
        parent = os.path.dirname(pkg_dir)
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for fp in sorted(entries):
                z.write(fp, os.path.relpath(fp, parent))
        os.replace(tmp, zpath)
    return zpath


def get_spark(
    app_name: str = "ocr_devnagari_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    # Pre-warmed Python-worker daemon (guide §4.5): forked workers
    # inherit pandas/pyarrow/numpy + the extraction core via
    # copy-on-write instead of importing them per worker (~0.6 s each,
    # and N cold workers otherwise stampede the same cores with
    # duplicate imports).  ON by default because this factory only
    # builds local-mode sessions, where the JVM child inherits this
    # process's PYTHONPATH (set below) and the daemon module import is
    # guaranteed.  PySpark has NO fallback when a configured daemon
    # module fails to import on an executor — when submitting against
    # a real cluster, ship the package AND set
    # spark.executorEnv.PYTHONPATH, or disable with
    # OCRDS_WORKER_DAEMON=0 (see daemon.py).
    use_daemon = os.environ.get("OCRDS_WORKER_DAEMON", "1") != "0"
    if use_daemon:
        # the PYTHONPATH export below only reaches the worker daemon if
        # the JVM launches AFTER this function patches the environment —
        # a JVM gateway already launched by some other session factory
        # froze its env snapshot without the repo root, and a daemon
        # module that fails to import kills every Python task (no
        # fallback).  With a live gateway, fall back to the stock daemon.
        from pyspark import SparkContext
        if SparkContext._gateway is not None:
            use_daemon = False
    if use_daemon:
        pkg_parent = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))
        pp = os.environ.get("PYTHONPATH", "")
        if pkg_parent not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                pkg_parent + (os.pathsep + pp if pp else ""))
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        .config("spark.driver.memory", os.environ.get("OCRDS_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # reliable checkpoint files (the _materialize cluster path) are
        # NOT removed by default; with the cleaner on, a checkpointed
        # intermediate whose DataFrame goes out of scope also releases
        # its files — long-lived sessions that construct gate queries
        # repeatedly would otherwise accumulate them unboundedly
        .config("spark.cleaner.referenceTracking.cleanCheckpoints",
                "true")
    )
    if use_daemon:
        builder = builder.config("spark.python.daemon.module",
                                 "ocr_devnagari_spark.daemon")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Ship the package to Python workers (--py-files semantics): without
    # this, mapInPandas UDFs that reference the package fail to unpickle on
    # workers whenever the driver's cwd is not the repo root.
    spark.sparkContext.addPyFile(package_zip())
    return spark
