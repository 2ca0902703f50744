"""Deterministic splits/sampling and unicode normalization."""

from __future__ import annotations

import hashlib
import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_devnagari_spark.functions.normalize import (
    normalize_text,
    normalize_text_sql,
)
from ocr_devnagari_spark.functions.splits import (
    WHEEL,
    hash_bucket,
    hash_bucket_sql,
    sample_predicate,
    split_assign,
    split_assign_sql,
)


def _py_bucket(key: str, n: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n


def test_hash_bucket_matches_python_and_duckdb(spark):
    keys = [str(i) for i in range(50)] + ["", "host.example.com"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r["k"]: r["b"] for r in df.select(
        "k", hash_bucket(F.col("k"), 1000).alias("b")).collect()}
    con = duckdb.connect()
    for k in keys:
        exp = _py_bucket(k, 1000)
        assert got[k] == exp, k
        d = con.execute("SELECT " + hash_bucket_sql(f"'{k}'", 1000)
                        ).fetchone()[0]
        assert d == exp, k


def test_hash_bucket_null_key_is_empty_string(spark):
    df = spark.createDataFrame([(None,)], "k string")
    got = df.select(hash_bucket(F.col("k"), 1000).alias("b")).collect()
    assert got[0]["b"] == _py_bucket("", 1000)


def test_split_assign_deterministic_and_weighted(spark):
    n = 20_000
    df = spark.range(n).select(F.col("id").cast("string").alias("k"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    counts = {r["s"]: r["c"] for r in
              df.select(split_assign(F.col("k"), w).alias("s"))
              .groupBy("s").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / n == pytest.approx(0.8, abs=0.02)
    assert counts["val"] / n == pytest.approx(0.1, abs=0.01)
    # same key → same split on recompute (pure function, no RNG)
    again = {r["s"]: r["c"] for r in
             df.select(split_assign(F.col("k"), w).alias("s"))
             .groupBy("s").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert counts == again


def test_split_assign_matches_sql_mirror(spark):
    w = {"train": 0.5, "val": 0.25, "test": 0.25}
    df = spark.range(500).select(F.col("id").cast("string").alias("k"))
    got = {r["k"]: r["s"] for r in
           df.select("k", split_assign(F.col("k"), w).alias("s")).collect()}
    con = duckdb.connect()
    sql = split_assign_sql("k", w)
    for k in list(got)[:100]:
        assert con.execute(
            f"SELECT {sql} FROM (SELECT '{k}' AS k)").fetchone()[0] == got[k]


def test_split_assign_rejects_bad_weights(spark):
    with pytest.raises(ValueError):
        split_assign(F.lit("x"), {"a": 0.5, "b": 0.2})


def test_sample_predicate_rate_and_subset_property(spark):
    df = spark.range(20_000).select(F.col("id").cast("string").alias("k"))
    n10 = df.filter(sample_predicate(F.col("k"), 0.10)).count()
    n20 = df.filter(sample_predicate(F.col("k"), 0.20)).count()
    assert n10 / 20_000 == pytest.approx(0.10, abs=0.01)
    # nested property: the 10% sample is a subset of the 20% sample
    only10 = df.filter(sample_predicate(F.col("k"), 0.10)
                       & ~sample_predicate(F.col("k"), 0.20)).count()
    assert only10 == 0 and n20 > n10
    with pytest.raises(ValueError):
        sample_predicate(F.col("k"), 1.5)


def test_split_is_shuffle_free(spark):
    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    plan = (df.select(split_assign(F.col("k")).alias("s"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

CASES = [
    ("café niño", "café niño"),        # NFC composition
    ("a \t b\t\tc", "a b c"),                      # ws collapse
    ("x\x00y\x07z", "xyz"),                        # control strip
    ("  already clean  ", "already clean"),        # trim
    ("keep\nnewline", "keep\nnewline"),            # \n survives
    (None, None),
]


def test_normalize_text_fixed_cases(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "id long, t string")
    got = {r["id"]: r["n"] for r in df.select(
        "id", normalize_text(F.col("t")).alias("n")).collect()}
    for i, (_, exp) in enumerate(CASES):
        assert got[i] == exp, i


def test_normalize_matches_python_unicodedata(spark):
    texts = ["Ǻngström", "ffi ﬁ", "ẛ̣"]
    df = spark.createDataFrame(list(enumerate(texts)), "id long, t string")
    got = {r["id"]: r["n"] for r in df.select(
        "id", normalize_text(F.col("t")).alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == unicodedata.normalize("NFC", t).strip(), i


def test_normalize_sql_mirror_agrees(spark):
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES) if t is not None],
        "id long, t string")
    got = {r["id"]: r["n"] for r in df.select(
        "id", normalize_text(F.col("t")).alias("n")).collect()}
    for i, (t, _) in enumerate(CASES):
        if t is None:
            continue
        d = con.execute("SELECT " + normalize_text_sql("?::VARCHAR"),
                        [t]).fetchone()[0]
        assert d == got[i], i


# ---------------------------------------------------------------------------
# stratified sampling / shard packing
# ---------------------------------------------------------------------------

def test_stratified_rates_and_monotonicity(spark):
    from ocr_devnagari_spark.functions.splits import stratified_predicate
    n = 30_000
    df = spark.range(n).select(
        F.col("id").cast("string").alias("k"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b").otherwise("c").alias("s"))
    rates = {"a": 0.5, "b": 0.1}
    kept = df.filter(stratified_predicate(F.col("k"), F.col("s"), rates,
                                          default_rate=0.0))
    got = {r["s"]: r["c"] for r in kept.groupBy("s")
           .agg(F.count(F.lit(1)).alias("c")).collect()}
    assert got.get("c") is None                    # default 0 drops c
    assert got["a"] / (n / 3) == pytest.approx(0.5, abs=0.02)
    assert got["b"] / (n / 3) == pytest.approx(0.1, abs=0.01)
    # monotone growth: raising b's rate only ADDS keys
    kept2 = df.filter(stratified_predicate(
        F.col("k"), F.col("s"), {"a": 0.5, "b": 0.3}, default_rate=0.0))
    lost = kept.select("k").exceptAll(kept2.select("k")).count()
    assert lost == 0
    with pytest.raises(ValueError):
        stratified_predicate(F.col("k"), F.col("s"), {"a": 2.0})


def _shard_bruteforce(rows, shard_tokens, n_buckets):
    import hashlib

    def bucket(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:8],
                   16) % n_buckets
    ordered = sorted(rows, key=lambda r: (bucket(r[0]), r[0]))
    out, cum = {}, 0
    for i, tok in ordered:
        out[i] = (cum // shard_tokens, cum)
        cum += tok
    return out


def test_assign_shards_matches_bruteforce(spark):
    from ocr_devnagari_spark.plans.sharding import assign_shards
    rows = [(i, 10 + (i * 37) % 90) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["doc_id"]: (r["shard"], r["start_off"])
           for r in assign_shards(df, 1000, n_buckets=16).collect()}
    assert got == _shard_bruteforce(rows, 1000, 16)


def test_shard_report_budget(spark):
    from ocr_devnagari_spark.plans.sharding import assign_shards, shard_report
    rows = [(i, 100) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    rep = {r["shard"]: (r["n_docs"], r["tokens"])
           for r in shard_report(df, 1000, n_buckets=8).collect()}
    # 200 docs x 100 tokens / 1000-budget = exactly 20 full shards
    assert len(rep) == 20
    assert all(v == (10, 1000) for v in rep.values())
    with pytest.raises(ValueError):
        assign_shards(df, 0)


def test_shard_window_is_bucket_partitioned(spark):
    """The corpus-sized window must be hash-partitioned; only the
    n_buckets-row offsets table may use a global window."""
    from ocr_devnagari_spark.plans.sharding import assign_shards
    df = spark.range(100).select(F.col("id").alias("doc_id"),
                                 F.lit(10).alias("n_tokens"))
    plan = (assign_shards(df, 100, n_buckets=16)
            ._jdf.queryExecution().executedPlan().toString())
    assert "partitionBy=[_b]" in plan.replace(" ", "") or \
        "_b" in plan.split("Window")[1]


def test_split_weights_that_starve_a_split_raise(spark):
    from ocr_devnagari_spark.functions.splits import split_assign
    with pytest.raises(ValueError):
        split_assign(F.lit("x"), {"train": 0.99995, "val": 0.00005})


def test_paragraph_first_mode_has_no_window(spark):
    from ocr_devnagari_spark.operators.paragraphs import paragraph_dedup
    df = spark.createDataFrame([(0, "a\nb"), (1, "a")],
                               "doc_id long, text string")
    plan = (paragraph_dedup(df, keep="first")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan


def test_compression_ratio_matches_zlib(spark):
    import zlib

    from ocr_devnagari_spark.functions.compress import (
        LEVEL,
        compression_pass,
        compression_ratio,
    )
    texts = ["abc " * 200, "the quick brown fox jumps over the lazy dog",
             "", None, "x"]
    df = spark.createDataFrame(list(enumerate(texts)), "id long, t string")
    got = {r["id"]: (r["r"], r["k"]) for r in df.select(
        "id", compression_ratio(F.col("t")).alias("r"),
        compression_pass(F.col("t")).alias("k")).collect()}
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] == (None, None)
        elif t == "":
            assert got[i][0] == 1.0
        else:
            raw = t.encode()
            exp = round(len(zlib.compress(raw, LEVEL)) / len(raw), 6)
            assert got[i][0] == pytest.approx(exp, abs=1e-6), i
            assert got[i][1] == (exp >= 0.25), i
    # repetitive text compresses much better than prose
    assert got[0][0] < 0.1 < got[1][0]


def test_weighted_sample_bias_determinism_and_zero_weights(spark):
    from ocr_devnagari_spark.functions.splits import weighted_sample
    n = 4000
    df = spark.range(n).select(
        F.col("id").cast("string").alias("k"),
        F.when(F.col("id") % 2 == 0, 10.0).otherwise(0.5).alias("w"))
    pick = weighted_sample(df, weight=F.col("w"), k=400,
                           key=F.col("k"))
    rows = pick.collect()
    assert len(rows) == 400
    heavy = sum(1 for r in rows if int(r["k"]) % 2 == 0)
    assert heavy > 300            # 20x weight ratio dominates the draw
    # deterministic across recomputation and partitioning
    again = weighted_sample(df.repartition(7), weight=F.col("w"),
                            k=400, key=F.col("k")).collect()
    assert {r["k"] for r in rows} == {r["k"] for r in again}
    # zero/negative weights are never sampled
    df2 = spark.range(100).select(
        F.col("id").cast("string").alias("k"),
        F.when(F.col("id") < 5, 1.0).otherwise(0.0).alias("w"))
    got = {r["k"] for r in weighted_sample(
        df2, weight=F.col("w"), k=10, key=F.col("k")).collect()
        if r["w"] > 0}
    assert got == {"0", "1", "2", "3", "4"}
    with pytest.raises(ValueError):
        weighted_sample(df2, weight=F.col("w"), k=0, key=F.col("k"))


def test_weighted_sample_never_returns_zero_weight_rows(spark):
    from ocr_devnagari_spark.functions.splits import weighted_sample
    df = spark.range(100).select(
        F.col("id").cast("string").alias("k"),
        F.when(F.col("id") < 5, 1.0).otherwise(0.0).alias("w"))
    got = weighted_sample(df, weight=F.col("w"), k=10,
                          key=F.col("k")).collect()
    # k exceeds the positive-weight population: return FEWER rows,
    # never excluded ones
    assert len(got) == 5 and all(r["w"] > 0 for r in got)
