"""Token-budget shard packing — deterministic assignment of documents
to fixed-size training shards.

Training jobs consume a corpus as ~equal-token shards (webdataset/
Megatron-style).  The assignment must be a pure function of the data
(rebuilding the corpus must produce identical shards) and must not
funnel the whole corpus through one task — the naive
``Window.orderBy(...)`` global cumulative sum does exactly that (a
single-partition window), which is the textbook 100-TB faceplant.

Scalable shape — the classic two-level prefix sum:

1. bucket every doc by a deterministic hash (``splits.hash_bucket``);
2. LOCAL cumulative sum per bucket (hash-partitioned window);
3. per-bucket totals (one tiny aggregate, ``n_buckets`` rows) →
   EXCLUSIVE prefix offsets via a window over that tiny table only;
4. global offset = bucket offset + local cumsum; shard = start-offset
   // shard_tokens.

The global order is therefore ``(bucket, id)`` — documented, and what
the DuckDB oracle mirrors with a flat ``sum() OVER (ORDER BY bucket,
id)``.  Only step 3's window is single-partition, and it runs over
``n_buckets`` rows, not the corpus.  A document that straddles a
boundary belongs to the shard its START offset falls in (greedy
packing; shards may overrun by at most one document).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.splits import hash_bucket


def assign_shards(df: DataFrame, shard_tokens: int,
                  id_col: str = "doc_id", tokens_col: str = "n_tokens",
                  n_buckets: int = 1024) -> DataFrame:
    """(id_col, tokens_col, shard, start_off) — deterministic
    token-budget packing in ``(hash_bucket(id), id)`` order."""
    if shard_tokens <= 0:
        raise ValueError("shard_tokens must be positive")
    b = df.select(id_col, F.col(tokens_col).cast("long").alias("_tok"),
                  hash_bucket(F.col(id_col), n_buckets).alias("_b"))
    wloc = (Window.partitionBy("_b").orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = b.withColumn("_cum", F.sum("_tok").over(wloc))
    totals = b.groupBy("_b").agg(F.sum("_tok").alias("_btot"))
    woff = (Window.orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_btot").over(woff), F.lit(0))
        .alias("_off"))
    out = (local.join(F.broadcast(offsets), "_b")
           .select(F.col(id_col),
                   F.col("_tok").alias(tokens_col),
                   (F.col("_off") + F.col("_cum") - F.col("_tok"))
                   .alias("start_off")))
    return out.select(id_col, tokens_col,
                      (F.col("start_off") / shard_tokens).cast("long")
                      .alias("shard"),
                      "start_off")


def shard_report(df: DataFrame, shard_tokens: int,
                 id_col: str = "doc_id", tokens_col: str = "n_tokens",
                 n_buckets: int = 1024) -> DataFrame:
    """(shard, n_docs, tokens) — the shard manifest a corpus build
    publishes next to the data."""
    return (assign_shards(df, shard_tokens, id_col=id_col,
                          tokens_col=tokens_col, n_buckets=n_buckets)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(tokens_col).alias("tokens")))
