"""End-to-end extraction job: read → resume anti-join → extract → commit.

The Spark lifecycle mapping of the reference's primary entry point
(``cli.ocr`` → ``MultiBackendProcessor.process_pdf_async``,
``multi_processor.py:268-532``; SURVEY.md §3.4):

    job args → read pages table → LEFT ANTI join (already-extracted urls)
    → [optional rebalance] → fused hybrid extraction (one narrow map)
    → icebox append commit + per-partition lineage rows.

Scale notes (the parts that must survive 1000 executors × 100 TB):

- **Resume is an anti-join, not a driver loop** (the reference's
  ``[p for p in requested if p not in completed]``, ``utils.py:70-72``,
  is O(n²) driver-side; here Catalyst plans a broadcast or shuffled anti
  join and AQE picks by the checkpoint's actual size).
- **No payload shuffle by default.** The extraction map is narrow; task
  granularity is governed by ``spark.sql.files.maxPartitionBytes``, which
  bounds per-task working set WITHOUT moving 100 TB through a shuffle.
  ``rebalance_mode='salted'`` exists for pathologically skewed inputs (a
  few multi-GB rows): it repartitions by (size-tier, host-hash ⊕ salt) —
  use it only when input file layout itself is skewed, because it pays a
  full shuffle of the payload bytes.
- **Per-partition lineage, not per-row driver writes.** The reference
  JSON-dumps progress after EVERY page (``utils.py:41-56``, called per page
  at ``multi_processor.py:457``) — a driver-side bottleneck at any scale.
  Here each task's stats become one lineage row (FIXTURES.md F3) aggregated
  with a tiny shuffle of (partition_id, counters) tuples.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..operators.extract import EXTRACTED_SCHEMA, extract_fused
from ..sources.icebox import IceboxTable

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

LINEAGE_SCHEMA = T.StructType([
    T.StructField("snapshot_id", T.LongType(), False),
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("url_min", T.StringType(), True),
    T.StructField("url_max", T.StringType(), True),
    T.StructField("row_count", T.LongType(), False),
    T.StructField("failed_count", T.LongType(), False),
    T.StructField("rule_hits", T.MapType(T.StringType(), T.LongType()), True),
    T.StructField("committed_at", T.TimestampType(), False),
])


def read_pages(spark: SparkSession, corpus_dir: str) -> DataFrame:
    return spark.read.schema(PAGES_SCHEMA).parquet(
        os.path.join(corpus_dir, "pages.parquet"))


def pending_pages(pages: DataFrame, extracted: IceboxTable,
                  spark: SparkSession) -> DataFrame:
    """Resume semantics (J1/R2): requested − already committed, as a
    LEFT ANTI join on url. With no checkpoint, everything is pending."""
    if not extracted.exists():
        return pages
    done = extracted.read(spark).select("url")
    return pages.join(done, "url", "left_anti")


def rebalance(pages: DataFrame, cfg: ExtractConfig) -> DataFrame:
    """Optional skew-breaking shuffle: (size-tier, host, salt) keys.

    Size tier = log2 bucket of payload bytes keeps giant documents from
    convoying small ones in one task; the salt (hash of the full url) splits
    hot hosts across ``salt_buckets`` partitions (north-rule skew handling;
    Common-Crawl host and size distributions are heavy-tailed).
    """
    sz = F.length(F.col("html"))
    tier = (F.when(sz < cfg.size_tier_bytes[0], 0)
             .when(sz < cfg.size_tier_bytes[1], 1)
             .when(sz < cfg.size_tier_bytes[2], 2)
             .otherwise(3))
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.salt_buckets))
    return pages.repartition(
        cfg.num_partitions, tier.alias("size_tier"),
        F.xxhash64(host).alias("host_hash"), salt.alias("salt"))


def lineage_rows(extracted: DataFrame, snapshot_id: int) -> DataFrame:
    """Per-partition commit records (FIXTURES.md F3): row counts, url range,
    failure counts, rule-hit histogram (map summed via explode→groupBy)."""
    base = extracted.groupBy("partition_id").agg(
        F.min("url").alias("url_min"),
        F.max("url").alias("url_max"),
        F.count("*").alias("row_count"),
        F.sum(F.when(~F.col("success"), 1).otherwise(0)).alias("failed_count"),
    )
    hits = (extracted
            .select("partition_id", F.explode_outer("rule_hits")
                    .alias("rule", "n"))
            .filter(F.col("rule").isNotNull())
            .groupBy("partition_id", "rule").agg(F.sum("n").alias("n"))
            .groupBy("partition_id")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("rule", "n"))).alias("rule_hits")))
    return (base.join(hits, "partition_id", "left")
            .withColumn("snapshot_id", F.lit(snapshot_id).cast("long"))
            .withColumn("committed_at", F.current_timestamp())
            .select([f.name for f in LINEAGE_SCHEMA.fields]))


def keeper_map(pairs: DataFrame, prior: DataFrame | None = None) -> DataFrame:
    """(fingerprint, keep_url) for every fingerprint that is duplicated in
    this batch or already committed: the canonical url per fingerprint.
    ``pairs`` = the batch's (fingerprint, url) columns only — parquet
    column pruning keeps the groupBy shuffle at ~48-byte pairs, never the
    text. ``prior`` = (fingerprint, url) of canonical rows from committed
    snapshots; they take precedence, so resumed / incremental runs mark
    cross-run duplicates too."""
    grp = (pairs.select("fingerprint", "url")
           .groupBy("fingerprint")
           .agg(F.min("url").alias("new_min"), F.count("*").alias("cnt")))
    if prior is None:
        grp = grp.withColumn("prior_url", F.lit(None).cast("string"))
    else:
        grp = grp.join(
            prior.groupBy("fingerprint").agg(F.min("url").alias("prior_url")),
            "fingerprint", "left")
    return (grp
            .filter((F.col("cnt") > 1) | F.col("prior_url").isNotNull())
            .select("fingerprint",
                    F.coalesce("prior_url", "new_min").alias("keep_url")))


def exact_dedup_mark(staged: DataFrame,
                     prior: DataFrame | None = None,
                     keepers: DataFrame | None = None,
                     keeper_broadcast_rows: int = 5_000_000) -> DataFrame:
    """In-job exact dedup — MARK, don't drop: every url still commits (so
    resume converges to zero pending); non-canonical copies carry
    ``duplicate_of`` = the canonical url for their fingerprint. Consumers
    filter ``duplicate_of IS NULL``. Dropping rows instead would leave the
    dropped urls pending forever and re-commit them as duplicates on the
    next resume.

    Join strategy is GATED, not forced: the keeper map is dup-fraction-
    sized, which is usually broadcastable but NOT always — re-crawl-heavy
    corpora run 20-30%+ exact dups, and a forced broadcast of a
    billion-row map kills the driver. The map is counted first (a
    column-pruned pass over (fingerprint, url) hashes only); at or below
    ``keeper_broadcast_rows`` it broadcasts (and no Exchange carries the
    payload — ``test_dedup_mark_shuffles_no_payload``), above it the hint
    is omitted and AQE plans a shuffled join (0 = never broadcast, skips
    the count). Pass a precomputed ``keepers`` to reuse a global map while
    marking a subset of files (the single-write commit path below).
    """
    if keepers is None:
        keepers = keeper_map(staged, prior)
    if keeper_broadcast_rows > 0 and \
            keepers.count() <= keeper_broadcast_rows:
        keepers = F.broadcast(keepers)
    return (staged.drop("duplicate_of")
            .join(keepers, "fingerprint", "left")
            .withColumn(
                "duplicate_of",
                F.when(F.col("keep_url").isNotNull()
                       & (F.col("url") != F.col("keep_url")),
                       F.col("keep_url")).cast("string"))
            .select(*staged.columns))


def mark_staged_duplicates(spark: SparkSession, out: IceboxTable,
                           files: list, prior: DataFrame | None
                           ) -> tuple[list, int, int]:
    """Single-write dedup commit: annotate duplicates by REWRITING ONLY
    the staged files that contain a to-be-marked row (Iceberg
    MERGE-on-read rewrites only files with matched keys; the emulation
    does the same at file granularity). The previous shape — stage full
    output, read back, mark, re-stage full output — paid 2× the job's
    entire write I/O to annotate a few-% minority of rows; here bytes
    written ≈ 1× + dup-fraction.

    Returns (files_for_commit, n_marked_rows, n_files_rewritten). All
    planning shuffles carry (fingerprint, url, file) triples only; the
    payload moves once, inside the rewrite of affected files.
    """
    from urllib.parse import unquote, urlparse

    from ..operators.dedup import _materialize

    staged = spark.read.parquet(*files)
    # materialize the keeper map once: it is consumed three times below
    # (affected-file probe, broadcast-gate count, mark join), and each
    # un-truncated consumer would re-run the full staged scan +
    # fingerprint groupBy — the dominant planning cost.  _materialize
    # picks reliable checkpoints when sc.setCheckpointDir is configured
    # (cluster: survives executor loss) and localCheckpoint otherwise
    # (local[N]: executor == driver JVM) — the dedup-module discipline.
    keepers = _materialize(keeper_map(staged, prior))
    hits = (staged.select("fingerprint", "url")
            .withColumn("_file", F.input_file_name())
            .join(keepers, "fingerprint")
            .filter(F.col("url") != F.col("keep_url"))
            .groupBy("_file").agg(F.count("*").alias("n"))
            .collect())
    if not hits:
        return files, 0, 0
    n_marked = sum(r["n"] for r in hits)
    # input_file_name yields a URI (file:/... or s3a://...); staged file
    # names (part-<n>-<uuid>) are unique within the staging dir, so match
    # on the decoded basename.
    aff_names = {os.path.basename(unquote(urlparse(r["_file"]).path))
                 for r in hits}
    affected = [f for f in files if os.path.basename(f) in aff_names]
    untouched = [f for f in files if os.path.basename(f) not in aff_names]
    marked = exact_dedup_mark(spark.read.parquet(*affected), keepers=keepers)
    marked_files, _ = out.stage(marked)
    for f in affected:                     # superseded, never committed
        os.remove(f)
    return untouched + marked_files, n_marked, len(affected)


def run_extract_job(
    spark: SparkSession,
    corpus_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    job_token: str | None = None,
    rebalance_mode: str = "none",
    limit_pending: int | None = None,
    dedup: str = "none",
    primary: str | None = None,
    precise: str | None = None,
    pages: str | None = None,
) -> dict:
    """Run (or resume) the extraction job. Returns summary counters.

    ``limit_pending`` exists for the resilience tests: process only a prefix
    of the pending work, commit it, and leave the rest for the next run —
    simulating the reference's kill-9-mid-run scenario
    (``docs/RESILIENT_OCR_PLAN.md:438-471``).

    ``pages`` restricts the run to a document-number subset — the
    reference CLI's ``--pages "1-50,60"`` flag (``utils.py:75-141`` parse,
    wired through ``cli.py:134-251``). The number is the last digit run
    in the url (the corpus convention: ``.../a/000000000123.html``);
    rows whose url carries no number are excluded when a range is given.
    The predicate is a Catalyst filter, so it composes with the resume
    anti-join: ``--pages`` + resume converges exactly like a full run.
    """
    # Pre-flight the backend selection DRIVER-SIDE: a mistyped name must
    # fail here, not executor-side mid-stage (or worse, at the cost lookup
    # AFTER the snapshot commit — losing the summary of a job that
    # succeeded). BackendSpec objects carry their own cost metadata.
    from ..operators.registry import BackendSpec, get_spec

    def _cost_per_page(sel, default_name: str) -> float:
        if sel is None:
            return get_spec(default_name).cost_per_1000_pages / 1000.0
        if isinstance(sel, BackendSpec):
            return sel.cost_per_1000_pages / 1000.0
        return get_spec(sel).cost_per_1000_pages / 1000.0
    cost_primary = _cost_per_page(primary, "fast")
    cost_precise = _cost_per_page(precise, "precise")

    out = IceboxTable(cfg.extracted_table)
    lin = IceboxTable(cfg.lineage_table)
    if job_token and job_token in out.applied_tokens():
        # Heal the crash window between output commit and lineage append:
        # if THIS token's snapshot committed but its lineage never landed,
        # recompute lineage from the snapshot's own added files.
        lin_token = f"lineage-{job_token}"
        if lin_token not in lin.applied_tokens():
            m = out.snapshot_for_token(job_token)
            if m and m.get("added_files"):
                lin.append(
                    lineage_rows(spark.read.parquet(*m["added_files"]),
                                 m["snapshot_id"]), job_token=lin_token)
        return {"snapshot_id": out.snapshot_id(), "rows": 0, "resumed": True}

    src_pages = read_pages(spark, corpus_dir)
    if pages is not None and pages.strip().lower() != "all":
        from ..functions.text import range_predicate
        # try_cast: under ANSI (Spark 4 default) a >19-digit url tail
        # would make a plain cast throw and abort the run; such rows are
        # simply outside any selectable range
        seq = F.regexp_extract(F.col("url"), r"(\d+)[^\d]*$", 1) \
            .try_cast("long")
        src_pages = src_pages.filter(
            seq.isNotNull() & range_predicate(seq, pages))
    pending = pending_pages(src_pages, out, spark)
    if limit_pending is not None:
        pending = pending.limit(limit_pending)
    if rebalance_mode == "salted":
        pending = rebalance(pending, cfg)

    # ``primary``/``precise`` select engines by registry name (the
    # reference CLI's engine whitelist); None = the built-in defaults.
    result = extract_fused(pending, cfg.confidence_threshold,
                           primary=primary, precise=precise)

    # In-flight metrics via observe() — the Spark-native analog of the
    # reference's TokenUsage accumulator monoid (gemini_backend.py:25-80):
    # commutative aggregates collected DURING the job, no extra pass.
    from pyspark.sql import Observation
    obs = Observation("extract_metrics")
    result = result.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(~F.col("success"), 1).otherwise(0)).alias("failed"),
        F.sum(F.when(F.col("backend_used") == "fast+precise", 1)
              .otherwise(0)).alias("escalated"),
        F.sum(F.length("text")).alias("total_chars"),
    )
    if dedup not in ("none", "exact"):
        raise ValueError(f"unknown dedup mode {dedup!r}")

    # The extracted schema is STABLE across dedup modes: ``fingerprint``
    # (md5 of the text, computed JVM-side in the same narrow pass) and
    # ``duplicate_of`` (null unless an in-job dedup marks the row) are
    # always present, so a table mixing dedup and non-dedup commits never
    # has parquet files with divergent schemas.
    result = (result
              .withColumn("fingerprint", F.md5(F.col("text").cast("binary")))
              .withColumn("duplicate_of", F.lit(None).cast("string")))

    # ONE computation pass: extraction streams straight into staged parquet
    # files (task-level atomic; never through driver memory — a
    # localCheckpoint here would cache the entire output, impossible at
    # 100 TB). The commit is the manifest swap afterwards; lineage reads the
    # staged files back (cheap columnar scan, no re-extraction).
    files, n = out.stage(result)
    if n == 0:
        return {"snapshot_id": out.snapshot_id(), "rows": 0, "resumed": True}
    metrics = obs.get

    n_marked = files_rewritten = 0
    if dedup == "exact":
        prior = None
        if out.exists():
            committed = out.read(spark)
            if "fingerprint" in committed.columns:
                prior = (committed
                         .filter(F.col("duplicate_of").isNull())
                         .select("fingerprint", "url"))
        files, n_marked, files_rewritten = mark_staged_duplicates(
            spark, out, files, prior)

    snap = out.commit_staged(files, n, job_token=job_token)
    staged = spark.read.parquet(*files)
    lin.append(lineage_rows(staged, snap),
               job_token=f"lineage-{job_token}" if job_token else None)
    # A2 cost accounting (gemini_backend.py:25-80 analog): dollar cost
    # derived from the SAME in-flight observe counters — every row pays
    # the fast backend's unit cost, escalated rows additionally pay the
    # precise backend's (the hybrid's raison d'être is exactly this
    # number: escalation fraction × paid-backend unit cost).
    est_cost = (metrics["rows"] * cost_primary
                + metrics["escalated"] * cost_precise)
    summary = {"snapshot_id": snap, "rows": n, "resumed": False,
               "metrics": metrics,
               "estimated_cost_usd": round(est_cost, 6)}
    if dedup == "exact":
        summary["dedup_marked"] = n_marked
        summary["dedup_files_rewritten"] = files_rewritten
    return summary
