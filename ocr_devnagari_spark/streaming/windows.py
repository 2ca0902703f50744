"""Streaming windowed aggregation + custom stateful operator.

The reference is batch-only (SURVEY.md §2.9); these are the
Structured-Streaming-native operators a continuously-landing crawl feed
needs on top of the ingest path:

- ``stream_windowed_event_counts`` — tumbling event-time windows with a
  watermark for late data; append mode emits a window exactly once, when
  the watermark passes its end (exactly-once finalized aggregates).
- ``stream_running_user_counts`` — ``applyInPandasWithState``: arbitrary
  per-key state (here a running per-user counter, the template for
  dedup-state / rate-state / session-state operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("user_id", T.LongType(), False),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Shared plan for batch AND streaming input (same DataFrame code —
    the batch run is the oracle for the streaming run in tests)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming \
        else events
    return (src.groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .select(F.col("win.start").alias("win_start"), "event_type",
                    "n_events", "total_value"))


def stream_windowed_event_counts(
    spark: SparkSession, input_dir: str, output_dir: str,
    checkpoint_dir: str, window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Drain available files; append-mode emits each window once, after the
    watermark passes it. Windows still open stay in the state store and
    emit on a later drain — tested against the batch plan as oracle."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    out = windowed_event_counts(events, window, watermark)
    q = (out.writeStream.format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


_STATE_SCHEMA = "n_events LONG, total_value DOUBLE"
_OUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"


def _update_user_state(key, pdfs, state: GroupState):
    import pandas as pd
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    # State keeps the UNROUNDED running total — rounding on every drain
    # would accumulate up to ~1e-4 drift per drain against the batch
    # oracle. Rounding happens once, on emission.
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [round(total, 4)]})


def stream_running_user_counts(
    spark: SparkSession, input_dir: str, output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Custom stateful operator: per-user running totals that survive
    across drains via the state store (``applyInPandasWithState``).
    Each drain emits the updated totals for users seen in that drain."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    updated = (events.groupBy("user_id")
               .applyInPandasWithState(
                   _update_user_state,
                   outputStructType=_OUT_SCHEMA,
                   stateStructType=_STATE_SCHEMA,
                   outputMode="update",
                   timeoutConf=GroupStateTimeout.NoTimeout))
    def _append(df, _epoch):
        df.write.mode("append").parquet(output_dir)

    # parquet sinks can't take update mode; foreachBatch bridges it (each
    # micro-batch's updated rows append — downstream reads take the latest
    # emission per key, exactly the reference's last-wins upsert shape).
    q = (updated.writeStream
         .foreachBatch(_append)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def stream_exact_dedup(
    spark: SparkSession, input_dir: str, output_dir: str,
    checkpoint_dir: str, key_col: str = "fingerprint",
    watermark: str = "24 hours", ts_col: str = "ts",
) -> None:
    """Streaming exact dedup: first row per ``key_col`` wins, later copies
    arriving within the watermark window are dropped — across
    micro-batches AND drains (the key state lives in the state store).
    This is the streaming analog of the batch keeper-map dedup in
    ``plans.pipeline.exact_dedup_mark``.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``) is
    what actually bounds state: plain dropDuplicates on a non-event-time
    subset NEVER evicts, so state grows with every distinct key ever seen
    — the unbounded-state scale trap. The price is scoped semantics: a
    duplicate arriving later than the watermark window after its original
    is NOT dropped. For corpus-LIFETIME dedup, run the batch keeper-map
    over the committed table instead.
    """
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    if key_col == "fingerprint":
        # derive the content fingerprint only when deduping on it — an
        # unconditional extra column would fork the sink schema vs
        # non-dedup writers of the same table
        events = events.withColumn(
            "fingerprint", F.md5(F.col("props").cast("binary")))
    deduped = (events
               .withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark([key_col]))
    q = (deduped.writeStream.format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


_HH_STATE = "vals ARRAY<STRING>, cnts ARRAY<LONG>, n LONG"
_HH_OUT = ("shard INT, value STRING, cnt_lo LONG, n_shard LONG")


def stream_heavy_hitters(
    spark: SparkSession, input_dir: str, output_dir: str,
    checkpoint_dir: str, val_col: str = "user_id",
    k: int = 16, shards: int = 4,
) -> None:
    """Streaming heavy hitters: Misra-Gries state per SHARD maintained
    across micro-batches and drains (``applyInPandasWithState``) — the
    streaming face of ``functions.sketches.heavy_hitters``.

    State-boundedness is the design point: grouping by the VALUE would
    create one state-store key per distinct value ever seen (the
    unbounded-state trap ``stream_exact_dedup`` documents), so values
    hash into a FIXED ``shards``-sized key space and each shard keeps
    an MG summary of at most ``k`` counters — total state is
    ``shards × k`` entries forever, for any cardinality.  The MG
    guarantee still holds globally: a value lives in exactly one shard,
    so global frequency f = shard frequency, and f > n_shard/(k+1)
    (implied by f > n_total/(k+1)) keeps it in that shard's summary
    with ``f - n_shard/(k+1) ≤ cnt_lo ≤ f``.

    Each drain emits every touched shard's full candidate set tagged
    with the shard's cumulative row count ``n_shard`` (monotone per
    shard, so the latest emission per shard = max ``n_shard``).  A
    summary that decrements to EMPTY (possible: > k equal-count
    distinct values in one drain) still emits one sentinel row with
    ``value`` NULL so the protocol holds — consumers read candidates
    as the non-NULL values of the max-``n_shard`` rows.  An exact
    recount — the batch operator's pass 2 — can then run over the
    committed table against the emitted candidates when exact counts
    are needed; size that join the way ``functions/sketches.py
    heavy_hitters`` does (candidates ≤ shards×k: broadcast under the
    counted/bounded gate, plain left-semi shuffle join past it — never
    an unconditional broadcast of a partition-count-proportional set).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if shards < 1:
        raise ValueError("shards must be >= 1")
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    tagged = (events.select(F.col(val_col).cast("string").alias("val"))
              .filter(F.col("val").isNotNull())
              .withColumn("shard", F.pmod(F.xxhash64("val"),
                                          F.lit(shards)).cast("int")))

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        from ocr_devnagari_spark.functions.sketches import _mg_update
        if state.exists:
            vals, cnts, n = state.get
            counters = dict(zip(vals, cnts))
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            n += len(pdf)
            counters = _mg_update(
                counters, pdf["val"].value_counts().items(), k)
        state.update((list(counters.keys()),
                      [int(c) for c in counters.values()], int(n)))
        # sentinel row when the summary emptied: n_shard must still
        # advance in the OUTPUT, not only in state, or the latest-
        # emission protocol would silently serve stale candidates
        vals = list(counters.keys()) or [None]
        cnts = [int(c) for c in counters.values()] or [None]
        yield pd.DataFrame({
            "shard": [key[0]] * len(vals),
            "value": vals,
            "cnt_lo": cnts,
            "n_shard": [int(n)] * len(vals)})

    out = (tagged.groupBy("shard")
           .applyInPandasWithState(
               _update,
               outputStructType=_HH_OUT,
               stateStructType=_HH_STATE,
               outputMode="update",
               timeoutConf=GroupStateTimeout.NoTimeout))

    def _append(df, _epoch):
        df.write.mode("append").parquet(output_dir)

    q = (out.writeStream
         .foreachBatch(_append)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
