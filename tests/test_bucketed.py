"""Bucketed co-located joins: the write-once / join-shuffle-free
contract that carries the engine's recurring large joins at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_devnagari_spark.sources.bucketed import read_bucketed, write_bucketed


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    a = spark.range(0, 5000).select(
        F.col("id").alias("url_id"), (F.col("id") * 3).alias("va"))
    b = spark.range(0, 5000, 2).select(
        F.col("id").alias("url_id"), (F.col("id") + 7).alias("vb"))
    write_bucketed(a, "bk_a", ["url_id"], 8, sort_cols=["url_id"],
                   path=str(tmp_path / "bk_a"))
    write_bucketed(b, "bk_b", ["url_id"], 8, sort_cols=["url_id"],
                   path=str(tmp_path / "bk_b"))
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_bucketed(spark, "bk_a").join(
                read_bucketed(spark, "bk_b"), "url_id")
            plan = j._jdf.queryExecution().executedPlan().toString()
            # both sides scan bucketed files pre-partitioned on the key:
            # a sort-merge join with NO Exchange anywhere in the plan
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # and the result is correct
            assert j.count() == 2500
            got = j.filter(F.col("url_id") == 10).first()
            assert (got.va, got.vb) == (30, 17)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_unbucketed_same_join_shuffles(spark, tmp_path):
    """Control: the identical join over plain parquet pays an Exchange
    on both sides — the cost bucketing amortizes away."""
    a = spark.range(0, 5000).select(
        F.col("id").alias("url_id"), (F.col("id") * 3).alias("va"))
    b = spark.range(0, 5000, 2).select(
        F.col("id").alias("url_id"), (F.col("id") + 7).alias("vb"))
    a.write.mode("overwrite").parquet(str(tmp_path / "pa"))
    b.write.mode("overwrite").parquet(str(tmp_path / "pb"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.read.parquet(str(tmp_path / "pa")).join(
            spark.read.parquet(str(tmp_path / "pb")), "url_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
