"""Watermarked windowed aggregation + applyInPandasWithState, both checked
against the identical batch plan as oracle."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from ocr_devnagari_spark.streaming.windows import (
    stream_running_user_counts,
    stream_windowed_event_counts,
    windowed_event_counts,
)

SRC = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture()
def landing(tmp_path, spark):
    """events split into two time-ordered waves (late-data realism: wave 2
    carries strictly later data, advancing the watermark past wave 1)."""
    ev = spark.read.parquet(SRC).orderBy("ts")
    n = ev.count()
    mid_ts = ev.select("ts").collect()[n // 2][0]
    d = str(tmp_path)
    ev.filter(F.col("ts") <= F.lit(mid_ts)).coalesce(1).write.parquet(
        f"{d}/wave1")
    ev.filter(F.col("ts") > F.lit(mid_ts)).coalesce(1).write.parquet(
        f"{d}/wave2")
    land = f"{d}/landing"
    os.makedirs(land)
    return d, land


def _land(src_dir, land_dir, tag):
    for i, f in enumerate(sorted(os.listdir(src_dir))):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src_dir, f),
                        os.path.join(land_dir, f"{tag}-{i}.parquet"))


def test_windowed_counts_match_batch(spark, landing, tmp_path):
    d, land = landing
    out, cp = f"{d}/out", f"{d}/cp"
    _land(f"{d}/wave1", land, "w1")
    stream_windowed_event_counts(spark, land, out, cp)
    _land(f"{d}/wave2", land, "w2")
    stream_windowed_event_counts(spark, land, out, cp)

    emitted = spark.read.parquet(out)
    batch = windowed_event_counts(spark.read.parquet(SRC))
    # append mode only emits windows the watermark has closed; every
    # emitted row must exactly equal the batch result for that window
    b = {(r.win_start, r.event_type): (r.n_events, r.total_value)
         for r in batch.collect()}
    got = emitted.collect()
    assert len(got) > 0
    for r in got:
        assert b[(r.win_start, r.event_type)] == (r.n_events,
                                                  r.total_value), r
    # no window emitted twice (exactly-once finalization)
    assert emitted.count() == emitted.select(
        "win_start", "event_type").distinct().count()


def test_running_user_counts_stateful(spark, landing):
    d, land = landing
    out, cp = f"{d}/sout", f"{d}/scp"
    _land(f"{d}/wave1", land, "w1")
    stream_running_user_counts(spark, land, out, cp)
    _land(f"{d}/wave2", land, "w2")
    stream_running_user_counts(spark, land, out, cp)

    # the LAST emission per user must equal the batch totals — state
    # survived across two separate drains via the state store
    emitted = spark.read.parquet(out)
    last = {r.user_id: (r.n_events, r.total_value)
            for r in emitted.orderBy("n_events").collect()}
    batch = (spark.read.parquet(SRC).groupBy("user_id")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))),
                          4).alias("tv")))
    for r in batch.collect():
        n, tv = last[r.user_id]
        assert n == r.n
        assert abs(tv - r.tv) < 1e-6


def test_stream_exact_dedup_across_drains(spark, tmp_path):
    """First-wins dedup state survives across separate drains: a clone of
    a drain-1 row arriving in drain 2 is dropped by the state store."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_devnagari_spark.streaming.windows import stream_exact_dedup

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    def _write(name, rows):
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([datetime(2024, 1, 1, 0, r[1]) for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array([r[2] for r in rows]),
        })
        pq.write_table(t, f"{in_dir}/{name}.parquet")

    _write("b1", [(1, 1, "payload-A"), (2, 2, "payload-B"),
                  (3, 3, "payload-A")])          # in-batch duplicate
    stream_exact_dedup(spark, in_dir, out_dir, ckpt)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 2                      # A kept once + B

    _write("b2", [(4, 10, "payload-A"),           # cross-drain duplicate
                  (5, 11, "payload-C")])
    stream_exact_dedup(spark, in_dir, out_dir, ckpt)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 3                      # only C added
    props = sorted(r.props for r in got2.collect())
    assert props == ["payload-A", "payload-B", "payload-C"]


def test_stream_heavy_hitters_state_survives_drains(spark, landing):
    """Sharded MG state across two drains: every value frequent enough
    for the MG guarantee appears in its shard's LAST emission with a
    counter inside the [f - n_shard/(k+1), f] band, and per-shard state
    never exceeds k entries."""
    from ocr_devnagari_spark.streaming.windows import stream_heavy_hitters

    d, land = landing
    out, cp = f"{d}/hhout", f"{d}/hhcp"
    K, SHARDS = 8, 2
    _land(f"{d}/wave1", land, "w1")
    stream_heavy_hitters(spark, land, out, cp, val_col="user_id",
                         k=K, shards=SHARDS)
    _land(f"{d}/wave2", land, "w2")
    stream_heavy_hitters(spark, land, out, cp, val_col="user_id",
                         k=K, shards=SHARDS)

    emitted = spark.read.parquet(out)
    # latest emission per shard = the max-n_shard rows of that shard
    latest_n = {r["shard"]: r["mx"] for r in emitted.groupBy("shard")
                .agg(F.max("n_shard").alias("mx")).collect()}
    last = [r for r in emitted.collect()
            if r["n_shard"] == latest_n[r["shard"]]]
    by_shard: dict = {}
    for r in last:
        if r["value"] is not None:        # skip empty-summary sentinels
            by_shard.setdefault(r["shard"], {})[r["value"]] = r["cnt_lo"]
    assert all(len(c) <= K for c in by_shard.values())

    # batch truth with the SAME shard tagging
    truth = (spark.read.parquet(SRC)
             .select(F.col("user_id").cast("string").alias("val"))
             .withColumn("shard", F.pmod(F.xxhash64("val"),
                                         F.lit(SHARDS)).cast("int")))
    freqs = {(r["shard"], r["val"]): r["f"] for r in
             truth.groupBy("shard", "val").agg(
                 F.count("*").alias("f")).collect()}
    n_shard = {r["shard"]: r["n"] for r in truth.groupBy("shard")
               .agg(F.count("*").alias("n")).collect()}
    assert latest_n == n_shard                    # state saw every row
    for (sh, v), f in freqs.items():
        bound = n_shard[sh] / (K + 1)
        if f > bound:                             # MG survival guarantee
            assert v in by_shard[sh], (sh, v, f)
        if v in by_shard.get(sh, {}):
            cnt = by_shard[sh][v]
            assert cnt <= f and f - cnt <= bound, (sh, v, f, cnt)


def test_stream_heavy_hitters_empty_summary_sentinel(spark, tmp_path):
    """A drain that decrements the MG summary to empty still advances
    n_shard in the OUTPUT (sentinel row, value NULL) so the latest-
    emission protocol never serves stale candidates."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_devnagari_spark.streaming.windows import stream_heavy_hitters

    in_dir, out, cp = (str(tmp_path / d) for d in ("in", "out", "cp"))
    os.makedirs(in_dir)

    def _write(name, users):
        t = pa.table({
            "event_id": pa.array(range(len(users)), pa.int64()),
            "ts": pa.array([datetime(2024, 1, 1)] * len(users),
                           pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["c"] * len(users)),
            "value": pa.array([1.0] * len(users)),
            "props": pa.array([""] * len(users)),
        })
        pq.write_table(t, f"{in_dir}/{name}.parquet")

    # 3 equal-count distinct values at k=2 → summary decrements empty
    _write("b1", [1, 2, 3])
    stream_heavy_hitters(spark, in_dir, out, cp, k=2, shards=1)
    got1 = spark.read.parquet(out).collect()
    assert [(r["value"], r["n_shard"]) for r in got1] == [(None, 3)]

    _write("b2", [7, 7, 7])                # clear heavy hitter arrives
    stream_heavy_hitters(spark, in_dir, out, cp, k=2, shards=1)
    emitted = spark.read.parquet(out)
    mx = emitted.agg(F.max("n_shard")).first()[0]
    assert mx == 6                         # output n advanced past 3
    latest = [r for r in emitted.collect() if r["n_shard"] == mx]
    assert {r["value"] for r in latest} == {"7"}

    import pytest
    with pytest.raises(ValueError):
        stream_heavy_hitters(spark, in_dir, out, cp, k=0)
    with pytest.raises(ValueError):
        stream_heavy_hitters(spark, in_dir, out, cp, shards=0)
