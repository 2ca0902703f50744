"""Temporal/range join operators Spark's API lacks — as-of join and
interval (range) join, expressed as compositions of built-in operators
so Catalyst/AQE still own the physical plan.

**As-of join** (kdb/pandas ``merge_asof`` semantics, DuckDB ``ASOF
JOIN``): for every left row, attach the LATEST right row of the same
key with ``right.ts <= left.ts`` (inclusive — a right row AT the left
timestamp matches), optionally within ``tolerance``.  The naive
formulation is an inequality join (quadratic per key); the scalable
plan is the classic union-tag sweep:

    union(right→tagged, left→tagged)
      → window last_value(right cols, ignorenulls)
           over (partition by key  order by ts, tag)
      → keep left rows

One shuffle on the key, one ordered pass — O(n log n) per key, never
all-pairs.  Hot keys are window-partition-bound (documented; pre-split
hot keys upstream if a single key's row count exceeds a task).

**Range join**: ``points × intervals`` containment (``lo <= v <= hi``)
without a cartesian product: intervals explode to the fixed-width
buckets they cover, points hash to their single bucket, and an
EQUI-join on the bucket feeds an exact containment filter.  Each
(point, interval) pair meets in exactly one bucket (the point's), so
no dedup pass is needed.  Bucket width trades explode factor against
join selectivity; shuffles are hash joins on ints either way.

Both carry DuckDB oracles (native ``ASOF JOIN``; plain theta join) —
the rare case where the oracle engine has MORE native support than the
engine under test, which is exactly what makes the parity check strong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str | list = "key", tolerance: float | None = None,
              right_cols: list | None = None,
              suffix: str = "_r") -> DataFrame:
    """Backward inclusive as-of join; right payload columns arrive as
    ``<col><suffix>`` (``on`` itself as ``<on><suffix>``), NULL when no
    right row precedes (or the match is older than ``tolerance``)."""
    by = [by] if isinstance(by, str) else list(by)
    right_cols = right_cols or [c for c in right.columns
                                if c not in by + [on]]
    l_tag = left.select(*by, F.col(on),
                        F.lit(1).alias("_is_l"),
                        F.lit(None).cast("double").alias("_rts"),
                        *[F.lit(None).cast(right.schema[c].dataType)
                          .alias(f"_rv_{c}") for c in right_cols],
                        F.struct(*left.columns).alias("_l"))
    r_tag = right.select(*by, F.col(on),
                         F.lit(0).alias("_is_l"),
                         F.col(on).cast("double").alias("_rts"),
                         *[F.col(c).alias(f"_rv_{c}")
                           for c in right_cols],
                         F.lit(None).cast(l_tag.schema["_l"].dataType)
                         .alias("_l"))
    # right rows sort BEFORE left rows at equal ts (_is_l asc) so a
    # quote AT the event time is visible — the inclusive rule
    w = (Window.partitionBy(*by).orderBy(F.col(on), F.col("_is_l"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = r_tag.unionByName(l_tag).select(
        "*",
        F.last("_rts", ignorenulls=True).over(w).alias("_m_ts"),
        *[F.last(f"_rv_{c}", ignorenulls=True).over(w)
          .alias(f"_m_{c}") for c in right_cols])
    out = carried.filter(F.col("_is_l") == 1)
    ok = F.col("_m_ts").isNotNull()
    if tolerance is not None:
        ok = ok & ((F.col(on) - F.col("_m_ts")) <= tolerance)
    sel = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    sel.append(F.when(ok, F.col("_m_ts")).alias(f"{on}{suffix}"))
    sel += [F.when(ok, F.col(f"_m_{c}")).alias(f"{c}{suffix}")
            for c in right_cols]
    return out.select(*sel)


def range_join(points: DataFrame, intervals: DataFrame,
               v_col: str = "v", lo_col: str = "lo", hi_col: str = "hi",
               bucket_width: float = 100.0) -> DataFrame:
    """Inner containment join (``lo <= v <= hi``, inclusive both ends)
    via bucketed equi-join — returns all point columns + all interval
    columns.  ``bucket_width`` should be of the order of the typical
    interval length (explode factor ≈ len/width + 1)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    pb = points.withColumn(
        "_b", F.floor(F.col(v_col) / bucket_width).cast("long"))
    ib = intervals.withColumn(
        "_b", F.explode(F.sequence(
            F.floor(F.col(lo_col) / bucket_width).cast("long"),
            F.floor(F.col(hi_col) / bucket_width).cast("long"))))
    return (pb.join(ib, on="_b")
            .filter((F.col(v_col) >= F.col(lo_col))
                    & (F.col(v_col) <= F.col(hi_col)))
            .drop("_b"))
