"""Checkpoint/resume + idempotent commit tests — the translation of the
reference's manual resilience plan (``docs/RESILIENT_OCR_PLAN.md:438-471``):
kill mid-run → resume processes only the remainder; re-running a completed
job is a no-op; resume N times = same table state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_devnagari_spark.config import ExtractConfig
from ocr_devnagari_spark.plans.pipeline import (
    pending_pages,
    read_pages,
    run_extract_job,
)
from ocr_devnagari_spark.sources.icebox import IceboxTable


def test_partial_run_then_resume(spark, corpus_dir, work_root):
    cfg = ExtractConfig(root_dir=work_root)
    total = read_pages(spark, corpus_dir).count()

    r1 = run_extract_job(spark, corpus_dir, cfg, job_token="t1",
                         limit_pending=200)
    assert r1["rows"] == 200
    out = IceboxTable(cfg.extracted_table)
    assert out.read(spark).count() == 200

    # Resume: only the remaining rows are recomputed.
    r2 = run_extract_job(spark, corpus_dir, cfg, job_token="t2")
    assert r2["rows"] == total - 200
    assert out.read(spark).count() == total
    # No url extracted twice.
    assert out.read(spark).select("url").distinct().count() == total


def test_rerun_completed_job_is_noop(spark, corpus_dir, work_root):
    cfg = ExtractConfig(root_dir=work_root)
    run_extract_job(spark, corpus_dir, cfg, job_token="full")
    out = IceboxTable(cfg.extracted_table)
    n1, snap1 = out.read(spark).count(), out.snapshot_id()
    # Resume of a finished job: anti-join leaves zero pending rows.
    r = run_extract_job(spark, corpus_dir, cfg, job_token="again")
    assert r["rows"] == 0
    assert out.read(spark).count() == n1
    assert out.snapshot_id() == snap1


def test_same_token_append_is_idempotent(spark, work_root):
    t = IceboxTable(f"{work_root}/tbl")
    df = spark.range(10).withColumnRenamed("id", "k")
    t.append(df, job_token="job-A")
    t.append(df, job_token="job-A")         # replayed commit → no-op
    assert t.read(spark).count() == 10
    t.append(df, job_token="job-B")
    assert t.read(spark).count() == 20


def test_merge_upsert_last_wins(spark, work_root):
    t = IceboxTable(f"{work_root}/tbl")
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    new = spark.createDataFrame([(2, "B"), (4, "D")], "k int, v string")
    t.overwrite(old)
    t.merge_upsert(spark, new, "k")
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_lineage_partition_accounting(spark, corpus_dir, work_root):
    cfg = ExtractConfig(root_dir=work_root)
    run_extract_job(spark, corpus_dir, cfg, job_token="t1")
    lin = IceboxTable(cfg.lineage_table).read(spark)
    total = read_pages(spark, corpus_dir).count()
    assert lin.agg(F.sum("row_count")).collect()[0][0] == total
    cols = set(lin.columns)
    assert {"snapshot_id", "partition_id", "url_min", "url_max", "row_count",
            "failed_count", "rule_hits", "committed_at"} <= cols
    # rule-hit histogram has at least one critical family recorded
    fams = (lin.select(F.explode_outer("rule_hits").alias("k", "n"))
            .filter(F.col("k").isNotNull()).groupBy("k").count().collect())
    assert len(fams) >= 1


def test_pending_pages_empty_checkpoint(spark, corpus_dir, work_root):
    cfg = ExtractConfig(root_dir=work_root)
    pages = read_pages(spark, corpus_dir)
    out = IceboxTable(cfg.extracted_table)
    assert pending_pages(pages, out, spark).count() == pages.count()


def test_in_job_exact_dedup(spark, corpus_dir, work_root, tmp_path):
    """dedup='exact' MARKS duplicate extracted texts inside the job
    (duplicate_of = the lexicographically-first url per fingerprint)."""
    import glob
    import shutil

    # corpus with planted duplicate pages (same html, new urls)
    dup_dir = str(tmp_path / "dupcorpus")
    shutil.copytree(corpus_dir, dup_dir)
    import pyarrow.parquet as pq
    src = glob.glob(f"{dup_dir}/pages.parquet")[0]
    t = pq.read_table(src)
    import pyarrow as pa
    clones = t.slice(0, 50).set_column(
        0, "url", pa.array(["zzz-" + u for u in
                            t.column("url").to_pylist()[:50]]))
    pq.write_table(pa.concat_tables([t, clones]), src)

    cfg = ExtractConfig(root_dir=work_root)
    r = run_extract_job(spark, dup_dir, cfg, job_token="d",
                        dedup="exact")
    out = IceboxTable(cfg.extracted_table).read(spark)
    n_docs = t.num_rows
    # mark-don't-drop: every url commits (resume convergence preserved)
    assert r["rows"] == n_docs + 50 == out.count()
    assert r["dedup_marked"] >= 50           # clones + natural empty dups
    # the deduplicated view has unique fingerprints
    clean = out.filter(F.col("duplicate_of").isNull())
    assert clean.select(F.md5("text")).distinct().count() == clean.count()
    # clone urls sort after originals → clones are the marked copies
    assert out.filter(out.url.startswith("zzz-")
                      & F.col("duplicate_of").isNull()).count() == 0
    # and a resume run is a no-op (the key property dropping would break)
    r2 = run_extract_job(spark, dup_dir, cfg, job_token="d2",
                         dedup="exact")
    assert r2["rows"] == 0


def test_in_job_dedup_marks_cross_run_duplicates(spark, corpus_dir,
                                                 work_root, tmp_path):
    """A resumed/incremental run must mark NEW rows that duplicate text
    already committed by an earlier run (keeper = the committed url)."""
    import glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    dup_dir = str(tmp_path / "growcorpus")
    shutil.copytree(corpus_dir, dup_dir)
    cfg = ExtractConfig(root_dir=work_root)
    run_extract_job(spark, dup_dir, cfg, job_token="r1", dedup="exact")

    # corpus grows: 30 clones of already-committed pages land with new urls
    src = glob.glob(f"{dup_dir}/pages.parquet")[0]
    t = pq.read_table(src)
    clones = t.slice(0, 30).set_column(
        0, "url", pa.array(["zzz-" + u for u in
                            t.column("url").to_pylist()[:30]]))
    pq.write_table(pa.concat_tables([t, clones]), src)

    r2 = run_extract_job(spark, dup_dir, cfg, job_token="r2", dedup="exact")
    assert r2["rows"] == 30                  # only the clones were pending
    out = IceboxTable(cfg.extracted_table).read(spark)
    marked = out.filter(out.url.startswith("zzz-"))
    assert marked.count() == 30
    # every clone points at its committed original, never at another clone
    assert marked.filter(F.col("duplicate_of").isNull()).count() == 0
    assert marked.filter(F.col("duplicate_of").startswith("zzz-")).count() == 0


def test_in_job_dedup_keeper_map_reliable_checkpoints(
        spark, corpus_dir, work_root, tmp_path):
    """With a checkpoint dir configured, the keeper-map materialization
    inside mark_staged_duplicates rides RELIABLE checkpoints (shared
    store — the mark phase survives executor loss on a real cluster,
    the dedup-module `_materialize` discipline), and the marked output
    is identical to the localCheckpoint path."""
    import glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    dup_dir = str(tmp_path / "ckcorpus")
    shutil.copytree(corpus_dir, dup_dir)
    src = glob.glob(f"{dup_dir}/pages.parquet")[0]
    t = pq.read_table(src)
    clones = t.slice(0, 40).set_column(
        0, "url", pa.array(["zzz-" + u for u in
                            t.column("url").to_pylist()[:40]]))
    pq.write_table(pa.concat_tables([t, clones]), src)

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        cfg = ExtractConfig(root_dir=work_root)
        r = run_extract_job(spark, dup_dir, cfg, job_token="ck",
                            dedup="exact")
        assert r["dedup_marked"] >= 40
        out = IceboxTable(cfg.extracted_table).read(spark)
        assert out.filter(out.url.startswith("zzz-")
                          & F.col("duplicate_of").isNull()).count() == 0
        assert glob.glob(f"{ckdir}/**/rdd-*", recursive=True), \
            "keeper map did not write reliable checkpoint data"
    finally:
        scala_none = getattr(getattr(sc._jvm.scala, "None$"), "MODULE$")
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(scala_none)


def test_dedup_schema_stable_across_modes(spark, corpus_dir, work_root):
    """Mixed dedup / non-dedup commits must yield ONE schema: fingerprint
    and duplicate_of are always present (ADVICE: mergeSchema-free reads
    must not silently drop the column)."""
    cfg = ExtractConfig(root_dir=work_root)
    run_extract_job(spark, corpus_dir, cfg, job_token="a",
                    limit_pending=100, dedup="none")
    run_extract_job(spark, corpus_dir, cfg, job_token="b", dedup="exact")
    out = IceboxTable(cfg.extracted_table).read(spark)
    assert {"fingerprint", "duplicate_of"} <= set(out.columns)
    total = read_pages(spark, corpus_dir).count()
    assert out.count() == total
    # duplicate_of is queryable across ALL rows, including the non-dedup
    # commit's (null there by construction)
    assert out.filter(F.col("duplicate_of").isNull()).count() > 0
    assert out.filter(F.col("fingerprint").isNull()).count() == 0


def test_dedup_mark_shuffles_no_payload(spark, tmp_path):
    """No Exchange in the dedup-mark plan may carry the extracted text —
    the 100-TB property the keeper-map design exists for."""
    import io
    from contextlib import redirect_stdout

    from ocr_devnagari_spark.plans.pipeline import exact_dedup_mark

    df = spark.createDataFrame(
        [(f"u{i}", "x" * 100, f"fp{i % 3}") for i in range(30)],
        "url string, text string, fingerprint string",
    ).withColumn("duplicate_of", F.lit(None).cast("string"))
    staged_dir = str(tmp_path / "staged")
    df.write.parquet(staged_dir)
    marked = exact_dedup_mark(spark.read.parquet(staged_dir))
    assert marked.filter(F.col("duplicate_of").isNotNull()).count() == 27

    buf = io.StringIO()
    with redirect_stdout(buf):
        marked.explain("formatted")
    plan = buf.getvalue()
    # formatted explain: each node block lists its Input/Output columns
    for block in plan.split("\n\n"):
        head = block.strip().splitlines()[0] if block.strip() else ""
        if "Exchange" in head:
            assert "text#" not in block, f"payload in shuffle:\n{block}"


def test_dedup_mark_large_keeper_map_not_broadcast(spark, tmp_path):
    """Above the keeper-broadcast gate the join must plan WITHOUT a
    broadcast of the keeper map (a forced broadcast of a billion-row map
    OOMs the driver on re-crawl-heavy corpora) — and produce identical
    marks either way."""
    from ocr_devnagari_spark.plans.pipeline import exact_dedup_mark

    df = spark.createDataFrame(
        [(f"u{i}", "x" * 50, f"fp{i % 7}") for i in range(40)],
        "url string, text string, fingerprint string",
    ).withColumn("duplicate_of", F.lit(None).cast("string"))
    staged_dir = str(tmp_path / "staged")
    df.write.parquet(staged_dir)
    staged = spark.read.parquet(staged_dir)

    # keeper_broadcast_rows=0 removes the hint; with auto-broadcast off
    # (emulating a keeper map too big for the thresholds) the join MUST
    # plan shuffled — the old forced F.broadcast() ignored both knobs
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold",
                             None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        shuffled = exact_dedup_mark(staged, keeper_broadcast_rows=0)
        got = {(r.url, r.duplicate_of) for r in shuffled.collect()}
        plan = shuffled._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                           old_aqe)
    broadcast = exact_dedup_mark(staged)      # default gate: broadcasts
    want = {(r.url, r.duplicate_of) for r in broadcast.collect()}
    assert got == want
    assert sum(1 for _, d in want if d is not None) == 40 - 7


def test_dedup_commit_rewrites_only_affected_files(spark, tmp_path):
    """Single-write dedup commit: only staged files containing a
    to-be-marked row are rewritten; the rest are referenced unchanged
    (bytes written ≈ 1× + dup-fraction, not 2×)."""
    import os

    from ocr_devnagari_spark.plans.pipeline import mark_staged_duplicates
    from ocr_devnagari_spark.sources.icebox import IceboxTable

    out = IceboxTable(str(tmp_path / "tbl"))
    # 4 staged files; duplicates confined to files 0 and 2 (fingerprint
    # shared within the file), files 1 and 3 are all-unique
    def rows(fid):
        return [(f"u{fid}-{i}", "t" * 30,
                 f"dupfp{fid}" if fid in (0, 2) and i < 2 else f"fp{fid}-{i}",
                 None) for i in range(5)]
    schema = "url string, text string, fingerprint string, duplicate_of string"
    files = []
    for fid in range(4):
        staged, _ = out.stage(spark.createDataFrame(rows(fid), schema)
                              .coalesce(1))
        files.extend(staged)
    assert len(files) == 4

    final, n_marked, n_rewritten = mark_staged_duplicates(
        spark, out, files, prior=None)
    assert n_marked == 2 and n_rewritten == 2
    # the two clean files survive by reference — same physical paths —
    # and contain exactly the all-unique url groups (u1-*, u3-*)
    survivors = set(files) & set(final)
    assert len(survivors) == 2
    prefixes = {r.url.split("-")[0]
                for r in spark.read.parquet(*survivors).collect()}
    assert prefixes == {"u1", "u3"}
    # the two affected originals are gone from disk and from the commit
    gone = set(files) - set(final)
    assert len(gone) == 2 and all(not os.path.exists(f) for f in gone)
    # content: every url still present exactly once, dups marked
    got = spark.read.parquet(*final)
    assert got.count() == 20
    assert got.filter(F.col("duplicate_of").isNotNull()).count() == 2
    assert got.filter((F.col("fingerprint") == "dupfp0")
                      & F.col("duplicate_of").isNull()).count() == 1


def test_compact_small_files(spark, work_root):
    t = IceboxTable(f"{work_root}/tbl")
    for i in range(6):                      # six tiny incremental commits
        t.append(spark.range(i * 100, (i + 1) * 100).repartition(3))
    m = t.current_manifest()
    assert len(m["files"]) >= 12
    before = {r.id for r in t.read(spark).collect()}
    snap = t.compact(spark)
    assert snap == m["snapshot_id"] + 1
    m2 = t.current_manifest()
    assert len(m2["files"]) < len(m["files"])
    assert {r.id for r in t.read(spark).collect()} == before
    removed = t.expire_snapshots(keep_last=1, grace_seconds=0)
    assert removed >= 12                    # old small files collected
    assert {r.id for r in t.read(spark).collect()} == before


def test_expire_snapshots(spark, work_root):
    t = IceboxTable(f"{work_root}/tbl")
    df = spark.range(5)
    t.overwrite(df)
    t.append(df)
    t.append(df)
    assert t.read(spark).count() == 15
    removed = t.expire_snapshots(keep_last=1, grace_seconds=0)
    assert removed == 0                     # last snapshot references all files
    t.overwrite(df)                         # orphan the old files
    # default grace window: freshly-orphaned files survive (an in-flight
    # job's staged-but-uncommitted files must never be collected)
    assert t.expire_snapshots(keep_last=1) == 0
    removed = t.expire_snapshots(keep_last=1, grace_seconds=0)
    assert removed > 0
    assert t.read(spark).count() == 5


def test_time_travel_read_at(spark, work_root):
    import pytest
    t = IceboxTable(f"{work_root}/tbl")
    t.append(spark.range(5).withColumnRenamed("id", "k"), job_token="a")
    t.append(spark.range(5, 12).withColumnRenamed("id", "k"),
             job_token="b")
    t.append(spark.range(12, 15).withColumnRenamed("id", "k"),
             job_token="c")
    assert [m["snapshot_id"] for m in t.snapshots()] == [3, 2, 1]
    assert t.read_at(spark, 1).count() == 5
    assert t.read_at(spark, 2).count() == 12
    assert t.read_at(spark, 3).count() == 15
    # each historical read is the exact rowset, not just a count
    assert sorted(r.k for r in t.read_at(spark, 2).collect()) \
        == list(range(12))
    with pytest.raises(FileNotFoundError):
        t.read_at(spark, 99)


def test_time_travel_respects_expiry(spark, work_root):
    import pytest
    t = IceboxTable(f"{work_root}/tbl")
    for lo, hi, tok in ((0, 5, "a"), (5, 9, "b"), (9, 10, "c")):
        t.append(spark.range(lo, hi).withColumnRenamed("id", "k"),
                 job_token=tok)
    t.expire_snapshots(keep_last=1, grace_seconds=0.0)
    assert [m["snapshot_id"] for m in t.snapshots()] == [3]
    assert t.manifest_at(1) is None
    with pytest.raises(FileNotFoundError):
        t.read_at(spark, 1)
    assert t.read_at(spark, 3).count() == 10       # current still fine


def test_time_travel_grace_window_data_gone_raises_cleanly(spark, work_root):
    import os
    import pytest
    t = IceboxTable(f"{work_root}/tbl")
    t.append(spark.range(4).withColumnRenamed("id", "k"), job_token="a")
    t.overwrite(spark.range(9).withColumnRenamed("id", "k"),
                job_token="b")
    # age snapshot 1's data past the grace window while its manifest
    # (and snapshot 2, which is current) stay young
    for f in t.manifest_at(1)["files"]:
        os.utime(f, (1, 1))
    t.expire_snapshots(keep_last=1, grace_seconds=3600.0)
    # manifest chain still lists snapshot 1, but its data is collected:
    # read_at must raise the documented FileNotFoundError, not a deep
    # scan error
    assert t.manifest_at(1) is not None
    with pytest.raises(FileNotFoundError, match="data expired"):
        t.read_at(spark, 1)
    assert t.read_at(spark, 2).count() == 9


def test_snapshots_walk_terminates_on_parent_cycle(spark, work_root):
    import json
    import os
    t = IceboxTable(f"{work_root}/tbl")
    t.append(spark.range(3).withColumnRenamed("id", "k"), job_token="a")
    t.append(spark.range(2).withColumnRenamed("id", "k"), job_token="b")
    # corrupt snapshot 1 to point at snapshot 2 (a parent-link cycle —
    # disk damage / hand-edited manifest); every walk-based API must
    # terminate rather than hang, and GC must still run
    m1 = os.path.join(t.path, "manifests", "manifest-00000001.json")
    with open(m1) as f:
        doc = json.load(f)
    doc["parent_snapshot_id"] = 2
    with open(m1, "w") as f:
        json.dump(doc, f)
    chain = t.snapshots()
    assert [m["snapshot_id"] for m in chain] == [2, 1]   # each id once
    assert t.manifest_at(99) is None
    assert t.snapshot_for_token("a") is not None
    t.expire_snapshots(keep_last=1, grace_seconds=0.0)   # terminates
    assert t.read(spark).count() == 5   # appends accumulate: 3 + 2


def test_read_at_empty_snapshot_distinct_error(spark, work_root):
    import pytest
    t = IceboxTable(f"{work_root}/tbl")
    t.append(spark.range(3).withColumnRenamed("id", "k"), job_token="a")
    # a zero-file snapshot (an overwrite still writes a schema-only part
    # file, but commit_staged accepts an empty staged list) is REACHABLE
    # but empty — the error must say so, not claim "not reachable"
    sid = t._commit([], 0, token="b")
    with pytest.raises(FileNotFoundError, match="empty"):
        t.read_at(spark, sid)
    with pytest.raises(FileNotFoundError, match="not reachable"):
        t.read_at(spark, 99)
