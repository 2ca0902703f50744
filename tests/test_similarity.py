"""Similarity search: exact brute-force top-k vs numpy oracle; LSH ANN
recall and re-rank correctness."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_devnagari_spark.operators.similarity import (
    cosine_topk,
    knn_self_join,
    lsh_bucket_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, m


def _brute_topk(ids, m, q, k):
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -np.round(cos, 6)))
    return [(int(ids[i]), round(float(cos[i]), 6)) for i in order[:k]]


def test_cosine_topk_exact(spark, emb, emb_np):
    ids, m = emb_np
    q = m[ids == 0][0]
    want = _brute_topk(ids, m, q, 10)
    got = [(r.vec_id, r.cosine) for r in cosine_topk(emb, q, 10).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-5


def test_lsh_topk_rerank_and_recall(spark, emb, emb_np):
    ids, m = emb_np
    q = m[ids == 7][0]
    got = lsh_bucket_topk(emb, q, k=10, n_planes=6).collect()
    assert 0 < len(got) <= 10
    # re-rank is exact cosine: every returned score matches brute force
    cos_all = dict(_brute_topk(ids, m, q, len(ids)))
    for r in got:
        assert abs(r.cosine - cos_all[r.vec_id]) < 1e-5
    # seeded planes → deterministic recall; require a sane floor
    want10 = {w[0] for w in _brute_topk(ids, m, q, 10)}
    recall = len(want10 & {r.vec_id for r in got}) / 10
    assert recall >= 0.3


def test_knn_self_join_pairs_valid(spark, emb, emb_np):
    ids, m = emb_np
    pairs = knn_self_join(emb, threshold=0.8, n_planes=6).collect()
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    idx = {int(i): k for k, i in enumerate(ids)}
    for r in pairs:
        assert r.id_a < r.id_b
        true_cos = float(norm[idx[r.id_a]] @ norm[idx[r.id_b]])
        assert abs(r.cosine - true_cos) < 1e-5
        assert r.cosine >= 0.8


def _synthetic_emb(spark, n, dim=16, seed_col_mult=1):
    """Deterministic pseudo-random unit-ish vectors derived from vec_id
    hashes — no RNG state, reproducible across sessions/partitionings."""
    from pyspark.sql import functions as F
    e = spark.range(n).select(F.col("id").alias("vec_id"))
    dims = F.array(*[
        (F.pmod(F.xxhash64(F.col("vec_id") * seed_col_mult, F.lit(i)),
                F.lit(2001)) - 1000).cast("float") / 1000.0
        for i in range(dim)])
    return e.select("vec_id", dims.alias("embedding"))


def test_auto_planes_bound_bucket_population(spark):
    """derive_n_planes must keep expected (and observed max) bucket
    population bounded as the corpus grows 10× — the fixed-plane-count
    scale trap from round 1."""
    from pyspark.sql import functions as F

    from ocr_devnagari_spark.operators.similarity import (
        banded_buckets,
        derive_n_planes,
        hyperplanes,
    )

    target = 64
    sizes = (500, 5000)
    max_buckets = {}
    for n in sizes:
        emb = _synthetic_emb(spark, n)
        p = derive_n_planes(n, target_bucket_rows=target)
        planes = [hyperplanes(16, p, 42 + 7919 * b) for b in range(2)]
        bb = banded_buckets(emb, planes)
        top = (bb.groupBy("band_idx", "bucket").count()
               .agg(F.max("count")).first()[0])
        max_buckets[n] = top
    # 10× more rows must NOT mean 10× bigger buckets: plane growth keeps
    # the max-bucket population within a small factor of the target
    assert derive_n_planes(5000, target) > derive_n_planes(500, target)
    assert max_buckets[5000] < max_buckets[500] * 4
    assert max_buckets[5000] <= target * 16  # sign-bits skew, but bounded
    # and at 10^12 rows the derived count is sane (not 8, not 200)
    assert 25 <= derive_n_planes(10**12) <= 40


def test_knn_self_join_auto_planes_recall_unchanged(spark):
    """Planted exact clones must be recovered at ANY corpus scale with
    auto-derived planes (identical vectors share every band bucket)."""
    from pyspark.sql import functions as F

    for n in (300, 3000):
        emb = _synthetic_emb(spark, n)
        clones = (emb.filter(F.col("vec_id") % 100 == 7)
                  .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                          "embedding"))
        n_clones = clones.count()
        pairs = knn_self_join(emb.unionByName(clones), threshold=0.999,
                              target_bucket_rows=64)
        found = pairs.filter(F.col("id_b") >= 1_000_000).count()
        assert found >= n_clones       # every clone pair recovered


def test_ann_index_equals_inline_lsh(spark, emb, tmp_path):
    """A materialized index query returns EXACTLY the inline LSH result
    (same plane family/seed → same candidates → same exact re-rank)."""
    from ocr_devnagari_spark.operators.similarity import (
        ann_index_topk,
        build_ann_index,
    )
    idx = str(tmp_path / "annidx")
    meta = build_ann_index(emb, idx, n_planes=6, seed=42)
    assert meta["n_planes"] == 6 and meta["dim"] == 64

    q = emb.filter("vec_id = 7").first()["embedding"]
    want = [(r.vec_id, r.cosine)
            for r in lsh_bucket_topk(emb, q, k=10, n_planes=6,
                                     seed=42).collect()]
    got = [(r.vec_id, r.cosine)
           for r in ann_index_topk(spark, idx, q, k=10).collect()]
    assert got == want and len(got) > 0


def test_ann_index_partition_pruning(spark, emb, tmp_path):
    """The probe filter must reach the scan as a PartitionFilter — the
    property that makes the index O(probed buckets), not O(table)."""
    import io
    from contextlib import redirect_stdout

    from ocr_devnagari_spark.operators.similarity import (
        ann_index_topk,
        build_ann_index,
    )
    idx = str(tmp_path / "annidx2")
    build_ann_index(emb, idx, n_planes=5, seed=1)
    q = emb.filter("vec_id = 3").first()["embedding"]
    df = ann_index_topk(spark, idx, q, k=5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the bucket probe appears inside the partition filters, so non-probed
    # bucket directories are never opened
    pf_line = next(line for line in plan.splitlines()
                   if "PartitionFilters" in line)
    assert "bucket" in pf_line and "dynamicpruning" not in pf_line


def test_ann_index_build_crash_keeps_old_version(spark, emb, tmp_path,
                                                 monkeypatch):
    """A rebuild that dies before its commit marker lands must leave
    queries on the OLD index — data and meta can never be served from
    different plane geometries (the wrong-bucket silent-recall
    failure)."""
    import os

    from ocr_devnagari_spark.operators import similarity as sim

    idx = str(tmp_path / "annidx3")
    sim.build_ann_index(emb, idx, n_planes=6, seed=42)
    q = emb.filter("vec_id = 7").first()["embedding"]
    before = [(r.vec_id, r.cosine)
              for r in sim.ann_index_topk(spark, idx, q, k=10).collect()]

    def boom(*a, **kw):
        raise OSError("simulated crash before commit marker")

    monkeypatch.setattr(sim, "_commit_version", boom)
    import pytest as _pytest
    with _pytest.raises(OSError, match="simulated crash"):
        # different geometry: served buckets would be wrong if any of
        # this rebuild's output became visible
        sim.build_ann_index(emb, idx, n_planes=4, seed=99)
    monkeypatch.undo()

    after = [(r.vec_id, r.cosine)
             for r in sim.ann_index_topk(spark, idx, q, k=10).collect()]
    assert after == before
    # and a subsequent SUCCESSFUL rebuild swaps cleanly
    sim.build_ann_index(emb, idx, n_planes=4, seed=99)
    import json
    vdir = sim._index_version_dir(spark, idx)
    meta = json.loads(
        spark.read.parquet(os.path.join(vdir, "meta")).first()["meta"])
    assert meta["n_planes"] == 4 and meta["seed"] == 99


def test_ann_index_grace_retention_and_gc(spark, emb, tmp_path):
    """Superseded versions stay readable for ``keep_versions`` builds (an
    in-flight reader that resolved the old marker keeps working), then
    fall off the tail and are GC'd with their markers."""
    import os

    from ocr_devnagari_spark.operators import similarity as sim

    idx = str(tmp_path / "annidx_grace")
    sim.build_ann_index(emb, idx, n_planes=6, seed=42)
    v1 = sim._index_version_dir(spark, idx)
    sim.build_ann_index(emb, idx, n_planes=5, seed=7)
    v2 = sim._index_version_dir(spark, idx)
    assert v2 != v1
    # grace window: the superseded v1 data is still on disk and readable
    assert os.path.isdir(os.path.join(v1, "data"))
    q = emb.filter("vec_id = 7").first()["embedding"]
    assert len(sim.ann_index_topk(spark, idx, q, k=5).collect()) == 5
    # a third build pushes v1 past keep_versions=2 -> GC'd, v2 retained
    sim.build_ann_index(emb, idx, n_planes=4, seed=9)
    assert not os.path.exists(v1)
    assert os.path.isdir(os.path.join(v2, "data"))
    markers = [m for m in os.listdir(os.path.join(idx, "_commits"))
               if not m.startswith(".")]          # skip .crc sidecars
    assert len(markers) == 2


def test_ann_index_legacy_pointer_migrates(spark, emb, tmp_path):
    """A round-3 index (``_current`` pointer file, no ``_commits``) is
    served as-is, and the first new-style build folds the legacy version
    into the marker log so it gets the same grace/GC lifecycle."""
    import os

    from ocr_devnagari_spark.operators import similarity as sim

    idx = str(tmp_path / "annidx_legacy")
    sim.build_ann_index(emb, idx, n_planes=6, seed=42)
    vdir = sim._index_version_dir(spark, idx)
    version = os.path.basename(vdir)
    # rewrite the commit as the round-3 layout: pointer file, no markers
    import shutil
    shutil.rmtree(os.path.join(idx, "_commits"))
    with open(os.path.join(idx, "_current"), "w") as f:
        f.write(version)
    assert sim._index_version_dir(spark, idx) == vdir
    q = emb.filter("vec_id = 7").first()["embedding"]
    want = [(r.vec_id, r.cosine)
            for r in sim.ann_index_topk(spark, idx, q, k=5).collect()]
    # new-style rebuild: legacy version becomes marker 1, new one wins,
    # pointer file is retired; legacy data survives the grace window
    sim.build_ann_index(emb, idx, n_planes=4, seed=99)
    assert not os.path.exists(os.path.join(idx, "_current"))
    markers = sorted(m for m in os.listdir(os.path.join(idx, "_commits"))
                     if not m.startswith("."))    # skip .crc sidecars
    assert len(markers) == 2 and markers[0].endswith(version)
    assert os.path.isdir(os.path.join(vdir, "data"))
    assert len(want) == 5


def test_ivf_topk_recall_and_exact_rerank(spark, emb, emb_np):
    """IVF: probed-cell candidates, exact cosine re-rank — every
    returned score equals brute force, recall has a sane floor, and
    nprobe=n_centroids degenerates to EXACT top-k."""
    from ocr_devnagari_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    ids, m = emb_np
    q = m[ids == 7][0]
    cents = kmeans_centroids(emb, k=8, iterations=3)
    got = ivf_topk(emb, q, k=10, nprobe=2, centroids=cents).collect()
    assert 0 < len(got) <= 10
    cos_all = dict(_brute_topk(ids, m, q, len(ids)))
    for r in got:
        assert abs(r.cosine - cos_all[r.vec_id]) < 1e-5
    want10 = {w[0] for w in _brute_topk(ids, m, q, 10)}
    recall = len(want10 & {r.vec_id for r in got}) / 10
    assert recall >= 0.3
    # full probe = exact
    full = [(r.vec_id, r.cosine)
            for r in ivf_topk(emb, q, k=10, nprobe=8,
                              centroids=cents).collect()]
    brute = _brute_topk(ids, m, q, 10)
    assert [f[0] for f in full] == [b[0] for b in brute]


def test_kmeans_centroids_deterministic_and_shaped(spark, emb):
    from ocr_devnagari_spark.operators.similarity import kmeans_centroids

    a = kmeans_centroids(emb, k=4, iterations=2)
    b = kmeans_centroids(emb, k=4, iterations=2)
    assert len(a) == 4 and len(a[0]) == 64
    # deterministic across runs up to float-sum noise in the JVM means
    import numpy as np
    assert np.allclose(np.array(a), np.array(b), atol=1e-9)
