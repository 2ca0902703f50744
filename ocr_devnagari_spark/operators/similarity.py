"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``   — brute-force exact top-k against one query vector.
  The arithmetic is higher-order functions (``zip_with`` + ``aggregate``),
  fully JVM-side; the top-k is ``orderBy(...).limit(k)``, which Spark plans
  as per-partition TakeOrdered + driver merge of k-element heaps — no full
  sort, no full shuffle. This is the correctness baseline.

- ``lsh_bucket_topk`` — the scale path: random-hyperplane (sign) LSH.
  Deterministic planes seeded per index; query probes its own bucket plus
  all Hamming-1 neighbours (multi-probe), exact cosine re-rank inside the
  candidate set. At 10^12 rows the bucket join touches a
  ~2^{-p}·multiprobe fraction of the table instead of all of it.

- ``knn_self_join`` — all-pairs k-NN within LSH buckets (embedding-cosine
  near-dup detection for training-data curation).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _query_lit(query_vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(emb: DataFrame, query_vec, k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine similarity; deterministic tie-break on id.

    Ordering uses the EXACT cosine (rounding only the emitted value) so
    the k-boundary selection agrees with any exact-arithmetic oracle.
    """
    q = _query_lit(query_vec)
    v = F.col(vec_col).cast("array<double>")
    return (emb.select(F.col(id_col), cosine_col(v, q).alias("_cos"))
            .orderBy(F.desc("_cos"), F.col(id_col))
            .limit(k)
            .select(F.col(id_col), F.round("_cos", 6).alias("cosine")))


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------

def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> list:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def derive_n_planes(n_rows: int, target_bucket_rows: int = 1024) -> int:
    """Plane count that bounds EXPECTED bucket population ≈
    ``target_bucket_rows``: 2^planes buckets for n_rows vectors. A fixed
    plane count is the scale trap — within-bucket candidate volume grows
    ∝ Σ bucket² ≈ n²/2^planes, so planes must grow with log2(n) for the
    join to stay linear-ish as the corpus grows 10-1000×."""
    buckets_needed = max(n_rows, 1) / max(target_bucket_rows, 1)
    return max(4, math.ceil(math.log2(max(buckets_needed, 2.0))))


def bucket_col(vec_col: Column, planes: list) -> Column:
    """Sign-bit bucket id: bit i set iff dot(v, plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = (_dot(vec_col, _query_lit(p)) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def _python_bucket(vec, planes) -> int:
    b = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(vec, p)) > 0:
            b |= 1 << i
    return b


def lsh_bucket_topk(emb: DataFrame, query_vec, k: int = 10,
                    n_planes: int | None = 12, seed: int = 42,
                    multiprobe: bool = True, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    target_bucket_rows: int = 1024) -> DataFrame:
    """ANN: restrict to the query's LSH bucket (+ Hamming-1 probes), then
    exact cosine re-rank. Bucket ids are computable at the parquet scan, so
    at scale you PARTITION the index table by bucket and this becomes
    partition pruning — the scan reads ~(1+p)/2^p of the files.

    ``n_planes=None`` derives the plane count from the table size so the
    probed candidate set stays ≈ (1+planes)·``target_bucket_rows`` rows —
    an opt-in, NOT the default, because it costs a full ``count()`` per
    lookup; on the query path size the index ONCE (``derive_n_planes``)
    when you build/partition it, and pass that constant here."""
    if n_planes is None:
        n_planes = derive_n_planes(emb.count(), target_bucket_rows)
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qb = _python_bucket(query_vec, planes)
    probes = [qb] + ([qb ^ (1 << i) for i in range(n_planes)]
                     if multiprobe else [])
    v = F.col(vec_col).cast("array<double>")
    bucketed = emb.withColumn("bucket", bucket_col(v, planes))
    cand = bucketed.filter(F.col("bucket").isin(probes))
    q = _query_lit(query_vec)
    return (cand.select(F.col(id_col), cosine_col(v, q).alias("_cos"))
            .orderBy(F.desc("_cos"), F.col(id_col))
            .limit(k)
            .select(F.col(id_col), F.round("_cos", 6).alias("cosine")))


def _index_version_dir(index_dir: str) -> str:
    """Resolve the committed index version via the ``_current`` pointer
    (same atomic-swap discipline as ``sources/icebox.py``)."""
    import os

    cp = os.path.join(index_dir, "_current")
    if not os.path.exists(cp):
        # legacy layout (pre-versioned builds): data/ + meta/ directly
        # under index_dir — still valid, serve it rather than forcing a
        # rebuild after upgrade
        if os.path.isdir(os.path.join(index_dir, "data")):
            return index_dir
        raise FileNotFoundError(f"no committed ANN index in {index_dir}")
    with open(cp) as f:
        return os.path.join(index_dir, f.read().strip())


def build_ann_index(emb: DataFrame, index_dir: str,
                    n_planes: int | None = None, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    target_bucket_rows: int = 1024) -> dict:
    """Materialize the ANN index as a bucket-PARTITIONED parquet table —
    the scale path ``lsh_bucket_topk``'s docstring promises: bucket
    membership is computed ONCE at build time, so a query is partition
    pruning (the scan opens ~(1+planes)/2^planes of the files) instead of
    recomputing every row's bucket per lookup. Plane count derives from
    the table size at build time (one count, amortized over all queries);
    plane geometry is persisted alongside the data so queries replay the
    exact same hash family.

    The build is ATOMIC: data + meta land in a fresh ``v-<uuid>`` dir and
    become visible only when the ``_current`` pointer swaps (the icebox
    commit discipline). Writing data then meta in place could crash
    in between and leave NEW bucket assignments under OLD plane geometry
    — queries would silently probe the wrong buckets. A crashed build
    leaves only an invisible orphan dir; the previous version keeps
    serving. The superseded version is removed after the swap."""
    import json
    import os
    import shutil
    import uuid

    head = emb.agg(F.count(F.lit(1)).alias("n"),
                   F.first(F.size(vec_col)).alias("dim")).first()
    if not head["n"]:
        raise ValueError("cannot index an empty embedding table")
    if n_planes is None:
        n_planes = derive_n_planes(head["n"], target_bucket_rows)
    planes = hyperplanes(head["dim"], n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    version = f"v-{uuid.uuid4().hex}"
    vdir = os.path.join(index_dir, version)
    (emb.select(F.col(id_col), F.col(vec_col),
                bucket_col(v, planes).alias("bucket"))
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(vdir, "data")))
    meta = {"dim": int(head["dim"]), "n_planes": int(n_planes),
            "seed": int(seed), "id_col": id_col, "vec_col": vec_col,
            "n_rows": int(head["n"])}
    # meta rides the SAME storage layer as the data (a one-row parquet
    # via Spark) — a driver-local open() would break the moment
    # index_dir is s3a://... while the parquet half succeeded
    (emb.sparkSession.createDataFrame(
        [(json.dumps(meta),)], "meta string")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(vdir, "meta")))
    old = None
    cp = os.path.join(index_dir, "_current")
    if os.path.exists(cp):
        with open(cp) as f:
            old = f.read().strip()
    tmp = cp + ".tmp"
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, cp)                      # THE atomic commit point
    if old and old != version:               # superseded, now invisible
        shutil.rmtree(os.path.join(index_dir, old), ignore_errors=True)
    return meta


def ann_index_topk(spark, index_dir: str, query_vec, k: int = 10,
                   multiprobe: bool = True) -> DataFrame:
    """Query a ``build_ann_index`` table: probe the query's bucket (+
    Hamming-1 neighbours), exact cosine re-rank inside the candidates.
    ``bucket`` is a hive partition column, so the probe filter is a
    PartitionFilter — non-probed files are never opened (asserted by
    ``test_ann_index_partition_pruning``)."""
    import json
    import os

    index_dir = _index_version_dir(index_dir)
    meta = json.loads(
        spark.read.parquet(os.path.join(index_dir, "meta"))
        .first()["meta"])
    planes = hyperplanes(meta["dim"], meta["n_planes"], meta["seed"])
    qb = _python_bucket(query_vec, planes)
    probes = [qb] + ([qb ^ (1 << i) for i in range(meta["n_planes"])]
                     if multiprobe else [])
    df = spark.read.parquet(os.path.join(index_dir, "data"))
    cand = df.filter(F.col("bucket").isin(probes))
    v = F.col(meta["vec_col"]).cast("array<double>")
    q = _query_lit(query_vec)
    return (cand.select(F.col(meta["id_col"]),
                        cosine_col(v, q).alias("_cos"))
            .orderBy(F.desc("_cos"), F.col(meta["id_col"]))
            .limit(k)
            .select(F.col(meta["id_col"]),
                    F.round("_cos", 6).alias("cosine")))


def label_centroids(emb: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label centroid via ``applyInPandas`` (group-wise Pandas, numpy
    mean per dimension) — the grouped-UDF counterpart of the ``mapInPandas``
    stages. Emitted EXPLODED as (label, dim, centroid) rows: plain columns
    survive any engine's value hashing, and downstream joins on (label, dim)
    stay columnar. One shuffle on the group key, numpy inside."""
    import numpy as np
    import pandas as pd

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        c = m.mean(axis=0)
        return pd.DataFrame({
            "label": pdf[label_col].iloc[0],
            "dim": np.arange(1, len(c) + 1, dtype=np.int32),
            "centroid": np.round(c, 6),
        })

    return emb.groupBy(label_col).applyInPandas(
        centroid, schema="label int, dim int, centroid double")


def banded_buckets(emb: DataFrame, planes_per_band: list,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, v, band_idx, bucket): one sign-bit bucket per band. Separate
    bands = independent LSH tables — recall is 1−(1−p^r)^b instead of the
    single-table p^r, which collapses once r scales up with corpus size."""
    v = F.col(vec_col).cast("array<double>")
    barr = F.array(*[bucket_col(v, p) for p in planes_per_band])
    return emb.select(F.col(id_col).alias("id"), v.alias("v"),
                      F.posexplode(barr).alias("band_idx", "bucket"))


def knn_self_join(emb: DataFrame, threshold: float = 0.95,
                  n_planes: int | None = None, bands: int = 4,
                  seed: int = 42, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  target_bucket_rows: int = 1024) -> DataFrame:
    """Embedding-cosine near-dup pairs: all-pairs ONLY within LSH buckets
    (per-band bucket join ⇒ candidate volume ∝ bands · Σ bucket², not n²),
    exact cosine filter afterwards.

    ``n_planes`` (bits per band) defaults to ``derive_n_planes(count)``,
    so expected bucket population stays ≈ ``target_bucket_rows`` as the
    corpus grows — a FIXED plane count explodes quadratically at 10^12
    rows. ``bands`` independent hash tables keep recall up as the
    per-band bucket count grows (multi-band LSH, same construction as the
    MinHash path)."""
    # dim + count in ONE action (two separate driver actions would
    # recompute an uncached upstream plan twice)
    head = emb.agg(F.count(F.lit(1)).alias("n"),
                   F.first(F.size(vec_col)).alias("dim")).first()
    if not head["n"]:           # empty input → empty pairs, not a crash
        return emb.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cosine double")
    if n_planes is None:
        n_planes = derive_n_planes(head["n"], target_bucket_rows)
    planes_per_band = [hyperplanes(head["dim"], n_planes, seed + 7919 * b)
                       for b in range(bands)]
    e = banded_buckets(emb, planes_per_band, id_col, vec_col)
    l, r = e.alias("l"), e.alias("r")
    return (l.join(r, ["band_idx", "bucket"])
            .filter(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"),
                    F.col("r.id").alias("id_b"),
                    F.round(cosine_col(F.col("l.v"), F.col("r.v")),
                            6).alias("cosine"))
            .filter(F.col("cosine") >= threshold)
            .distinct())   # a pair may collide in several bands
