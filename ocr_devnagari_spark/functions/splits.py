"""Deterministic hash splits and sampling — train/val/test assignment
and reproducible subsampling for corpus building.

Every large-scale training pipeline needs BOTH of these, and both must
be pure functions of the data (re-running the pipeline on a grown
corpus must not reshuffle old documents between splits):

- ``hash_bucket(key, n)`` — stable bucket in [0, n) from the md5 of the
  key.  md5 (not xxhash64) is the documented choice because the DuckDB
  oracle computes the identical value; the first 8 hex chars give 32
  uniform bits, far more than any bucket count needs.
- ``split_assign(key, weights)`` — named split from cumulative weight
  ranges over a 10_000-bucket wheel.  Key on the *leakage unit* (URL
  host, not document id) so near-duplicate pages from one site cannot
  straddle train/test — the standard contamination guard.
- ``sample_predicate(key, rate)`` — keep ≈``rate`` of rows,
  deterministically; composable with any filter pushdown since it is
  a pure Catalyst expression over the key column.

All pure whole-stage-codegen expressions — no shuffle, no RNG state,
no driver involvement; the same row always lands in the same split on
any cluster size (the property ``df.sample`` does NOT have across
re-runs/re-partitionings with different seeds).

No counterpart in the reference (an OCR orchestrator); part of the
engine's web-corpus surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHEEL = 10_000  # split wheel resolution: 0.01% granularity


def wheel32(key: Column) -> Column:
    """Raw 32-bit md5-prefix hash as a LONG — the ONE cross-engine
    hash expression (see :func:`wheel32_sql`); every consumer (buckets,
    splits, KMV sketch) builds on this pair so the two engines can
    never desynchronize.  NULL in → NULL out; callers pick their own
    NULL policy."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8),
                  16, 10).cast("long")


def wheel32_sql(key: str) -> str:
    return f"('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))::UBIGINT"


def hash_bucket(key: Column, n_buckets: int) -> Column:
    """Stable bucket in ``[0, n_buckets)`` — ``int(md5(key)[:8], 16) %
    n_buckets``.  NULL keys hash as the empty string (documented: they
    all land together rather than dropping out)."""
    h = wheel32(F.coalesce(key.cast("string"), F.lit("")))
    return (h % n_buckets).alias("bucket")


def hash_bucket_sql(key: str, n_buckets: int) -> str:
    nn = f"coalesce(CAST({key} AS VARCHAR), '')"
    return f"({wheel32_sql(nn)} % {n_buckets})"


def _split_boundaries(weights: dict[str, float] | None
                      ) -> tuple[dict, list]:
    """Validated (weights, cumulative upper boundaries) — ONE
    computation shared by the Column and SQL builders.  Boundaries are
    the ROUNDED CUMULATIVE sums (rounding each weight independently can
    overshoot), and every non-final split must end strictly below
    WHEEL and strictly above its predecessor — otherwise a later split
    would be silently empty, which raises instead."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if abs(sum(weights.values()) - 1.0) > 1.0 / WHEEL:
        raise ValueError("split weights must sum to 1")
    names = list(weights)
    bounds, cum, prev = [], 0.0, 0
    for name in names[:-1]:
        cum += weights[name]
        hi = int(round(cum * WHEEL))
        if hi <= prev or hi >= WHEEL:
            raise ValueError(
                f"split '{name}' boundary {hi} leaves a later split "
                f"empty at wheel resolution 1/{WHEEL}; use coarser "
                "weights")
        bounds.append(hi)
        prev = hi
    return weights, bounds


def split_assign(key: Column, weights: dict[str, float] | None = None,
                 ) -> Column:
    """Named split from cumulative ``weights`` (default 98/1/1
    train/val/test).  Weights must sum to 1 within wheel resolution
    and give every split at least one bucket; assignment order is the
    dict order (part of the spec — iterate a plain dict,
    insertion-ordered)."""
    weights, bounds = _split_boundaries(weights)
    b = hash_bucket(key, WHEEL)
    expr = None
    names = list(weights)
    for name, hi in zip(names[:-1], bounds):
        cond = b < hi
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def split_assign_sql(key: str, weights: dict[str, float] | None = None,
                     ) -> str:
    from ..sqlutil import sq
    weights, bounds = _split_boundaries(weights)
    b = hash_bucket_sql(key, WHEEL)
    names = list(weights)
    parts = [f"WHEN {b} < {hi} THEN '{sq(name)}'"
             for name, hi in zip(names[:-1], bounds)]
    if not parts:
        return f"'{sq(names[-1])}'"
    return "CASE " + " ".join(parts) + f" ELSE '{sq(names[-1])}' END"


def sample_predicate(key: Column, rate: float) -> Column:
    """True for ≈``rate`` of rows, deterministically in the key."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return hash_bucket(key, WHEEL) < int(round(rate * WHEEL))


def sample_predicate_sql(key: str, rate: float) -> str:
    return f"({hash_bucket_sql(key, WHEEL)} < {int(round(rate * WHEEL))})"


def es_key(key: Column, weight: Column) -> Column:
    """Efraimidis–Spirakis weighted-sampling key: ``-ln(u) / w`` with
    ``u`` drawn deterministically from the md5 wheel (u ∈ (0, 1], the
    +1 shift keeps ln away from 0).  The k SMALLEST keys form a
    weighted sample without replacement — deterministic in the data,
    so re-running the corpus build selects the same documents.
    Non-positive weights get +infinity (never sampled)."""
    u = (wheel32(F.coalesce(key.cast("string"), F.lit("")))
         + F.lit(1)).cast("double") / F.lit(float((1 << 32)))
    return (F.when(weight > 0, -F.log(u) / weight)
            .otherwise(F.lit(float("inf"))))


def es_key_sql(key: str, weight: str) -> str:
    nn = f"coalesce(CAST({key} AS VARCHAR), '')"
    u = f"(({wheel32_sql(nn)} + 1) / {float(1 << 32)})"
    return (f"(CASE WHEN {weight} > 0 THEN -ln({u}) / {weight} "
            "ELSE 1e308 END)")


def weighted_sample(df: DataFrame, weight: Column, k: int,
                    key: Column) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: the k rows
    with the smallest ES keys.  Non-positive-weight rows are FILTERED
    (not merely pushed to +inf — a k larger than the positive-weight
    population must return fewer rows, never excluded ones), and the
    sample key itself is the final tie-breaker so 32-bit wheel
    collisions cannot make the selected set partition-order dependent.
    Executes as a bounded top-k (``orderBy().limit()`` →
    per-partition partial top-k + driver merge), never a full sort."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return (df.withColumn("_es", es_key(key, weight))
            .filter(F.col("_es") != float("inf"))
            .orderBy("_es", key).limit(k).drop("_es"))


def stratified_predicate(key: Column, strata: Column,
                         rates: dict[str, float],
                         default_rate: float = 0.0) -> Column:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. keep 100% of books, 30% of common crawl, 5% of forums).

    ``rates`` maps stratum value → keep rate; strata not listed keep
    ``default_rate``.  Within a stratum the kept set is the same nested
    hash wheel as :func:`sample_predicate`, so raising a stratum's rate
    only ADDS documents (monotone corpus growth across mix revisions —
    the property ad-hoc RNG sampling lacks)."""
    for r in list(rates.values()) + [default_rate]:
        if not 0.0 <= r <= 1.0:
            raise ValueError("rates must be in [0, 1]")
    b = hash_bucket(key, WHEEL)
    thr = F.lit(int(round(default_rate * WHEEL)))
    for val, r in rates.items():
        thr = F.when(strata == val,
                     F.lit(int(round(r * WHEEL)))).otherwise(thr)
    return b < thr


def stratified_predicate_sql(key: str, strata: str,
                             rates: dict[str, float],
                             default_rate: float = 0.0) -> str:
    from ..sqlutil import sq
    whens = " ".join(
        f"WHEN {strata} = '{sq(v)}' THEN {int(round(r * WHEEL))}"
        for v, r in rates.items())
    thr = (f"CASE {whens} ELSE {int(round(default_rate * WHEEL))} END"
           if whens else str(int(round(default_rate * WHEEL))))
    return f"({hash_bucket_sql(key, WHEEL)} < {thr})"
