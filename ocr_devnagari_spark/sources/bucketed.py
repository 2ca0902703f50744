"""Bucketed tables — shuffle-free co-located joins for repeated big joins.

At 10^12 documents the recurring joins (extracted ⋈ metadata on url,
pages ⋈ checkpoint on url, embeddings ⋈ labels on id) each pay a full
shuffle of both sides per query. Spark's answer is BUCKETING: write both
tables ``bucketBy(N, key)`` once, and every subsequent equi-join on the
key is planned with ZERO Exchange on either side — the shuffle is paid
once at write time and amortized over every later join
(``test_bucketed_join_is_shuffle_free`` pins the plan).

Bucket metadata only survives through the catalog (``saveAsTable`` +
``spark.table``); a plain ``.parquet(path)`` write loses it — that is a
Spark contract, not a choice here. Pick ``num_buckets`` so one bucket of
the BIGGER table fits an executor core's working set (same arithmetic as
``spark.sql.shuffle.partitions``); both sides must use the same bucket
count for the exchange-free plan (Spark 3.1+ can also coalesce
mismatched counts when one divides the other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list,
                   num_buckets: int, sort_cols: list | None = None,
                   path: str | None = None) -> None:
    """Materialize ``df`` as a bucketed (optionally sorted) parquet table
    in the session catalog. ``sort_cols`` additionally sorts within each
    bucket file, upgrading later merge joins to zero-sort as well."""
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the only path that preserves bucket metadata."""
    return spark.table(table)
