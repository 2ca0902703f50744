"""spark-submit entry point for the extraction job.

The north rule specifies running via ``spark-submit --py-files`` — this is
that driver script. Package the engine and submit:

    ZIP=$(python -c "from ocr_devnagari_spark.session import package_zip; print(package_zip())")
    spark-submit --master local[8] --py-files "$ZIP" submit_job.py \
        --corpus /tmp/ocrds_corpus/sf0.1 --root /tmp/ocrds_out --token run1

On a real cluster only ``--master`` changes (yarn/k8s); the engine code is
shipped by ``--py-files`` exactly as here. The script intentionally builds
its own bare SparkSession (no factory) to prove the job carries no hidden
local-path dependence.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--token", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("ocrds-extract-job")
             .config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from ocr_devnagari_spark.config import ExtractConfig
    from ocr_devnagari_spark.plans.pipeline import run_extract_job

    cfg = ExtractConfig(root_dir=args.root)
    result = run_extract_job(spark, args.corpus, cfg, job_token=args.token)
    print("RESULT " + json.dumps(
        {k: v for k, v in result.items()}, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
