"""Model-application scoring operators: linear classifier, DSIR
importance weights, SemDeDup — brute-force Python oracles throughout."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ocr_devnagari_spark.operators.scoring import (
    ccnet_tier,
    dsir_bucket_logratios,
    dsir_weights,
    linear_quality_score,
    lm_bucket_logprobs,
    lm_cross_entropy,
)
from ocr_devnagari_spark.operators.similarity import semdedup

WEIGHTS = [("science", 1.5), ("research", 1.0), ("spam", -2.0),
           ("click", -1.5)]

DOCS = [
    (0, "Science research advances science"),     # 1.5+1.0+1.5 = 4.0
    (1, "spam click spam offers"),                # -2-1.5-2 = -5.5
    (2, "plain words only here"),                 # no hits
    (3, ""),                                      # empty
    (4, "research  with   science"),              # multi-space split
]


def _brute_linear(text, bias=0.0):
    w = dict(WEIGHTS)
    toks = [t for t in __import__("re").split(r"\s+", text.lower())]
    hits = [t for t in toks if t in w]
    s = bias + sum(w[t] for t in hits)
    return len(hits), round(1.0 / (1.0 + math.exp(-s)), 6)


def test_linear_score_matches_brute_force(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           linear_quality_score(df, WEIGHTS).collect()}
    assert set(got) == {0, 1, 2, 3, 4}          # every doc comes back
    for i, text in DOCS:
        n, score = _brute_linear(text)
        assert got[i]["n_hits"] == n, (i, text)
        assert got[i]["score"] == pytest.approx(score, abs=1e-6)
        assert got[i]["keep"] == (got[i]["score"] >= 0.5)
    assert got[0]["keep"] is True and got[1]["keep"] is False
    # no model hits → sigmoid(bias)=0.5 → keep at the default threshold
    assert got[2]["score"] == 0.5 and got[2]["keep"] is True


def test_linear_score_broadcast_gate_paths_agree(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(linear_quality_score(
        df, WEIGHTS, broadcast_weights=True).collect())
    b = sorted(linear_quality_score(
        df, WEIGHTS, broadcast_weights=False).collect())
    assert a == b


def test_linear_score_bias_shifts(spark):
    df = spark.createDataFrame([(0, "plain")], "doc_id long, text string")
    got = linear_quality_score(df, WEIGHTS, bias=-1.0).collect()[0]
    assert got["score"] == pytest.approx(
        round(1 / (1 + math.exp(1.0)), 6), abs=1e-6)
    assert got["keep"] is False


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

TARGET = [(100, "the quick brown fox jumps"),
          (101, "the quick brown cat sleeps")]
RAW = [(0, "the quick brown fox jumps"),        # = target doc → high w
       (1, "buy cheap pills online now today"),  # disjoint → low w
       (2, "the quick zebra runs"),              # partial overlap
       (3, "x")]                                 # <n words → 0 grams


def _brute_dsir(n=2, n_buckets=64, alpha=1.0):
    from decimal import ROUND_HALF_UP, Decimal
    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    def grams(t):
        ws = t.split(" ")
        return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)] \
            if len(ws) >= n else []

    tb = [bucket(g) for _, t in TARGET for g in grams(t)]
    rb = [bucket(g) for _, t in RAW for g in grams(t)]
    dt, dr = len(tb) + alpha * n_buckets, len(rb) + alpha * n_buckets
    lrm = {}
    for b in range(n_buckets):
        x = (math.log((tb.count(b) + alpha) / dt)
             - math.log((rb.count(b) + alpha) / dr))
        lrm[b] = int(Decimal(repr(x)).scaleb(6).quantize(
            Decimal(1), rounding=ROUND_HALF_UP))
    out = {}
    for i, t in RAW:
        gs = grams(t)
        out[i] = (len(gs), sum(lrm[bucket(g)] for g in gs) / 1e6)
    return out


def test_dsir_weights_match_brute_force(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dsir_weights(raw, target, n=2, n_buckets=64).collect()}
    want = _brute_dsir()
    assert set(got) == set(want)
    for i, (n_grams, w) in want.items():
        assert got[i]["n_grams"] == n_grams, i
        assert got[i]["weight"] == w, i      # exact — integer sum / 1e6
    # the target-identical doc must outweigh the disjoint one
    assert got[0]["weight"] > got[1]["weight"]
    assert got[3]["n_grams"] == 0 and got[3]["weight"] == 0.0


def test_dsir_precomputed_ratios_path(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    ratios = dsir_bucket_logratios(target, raw, n=2, n_buckets=64)
    assert ratios.count() == 64                 # every bucket present
    a = sorted(dsir_weights(raw, target, n=2, n_buckets=64).collect())
    b = sorted(dsir_weights(raw, target, n=2, n_buckets=64,
                            ratios=ratios).collect())
    assert a == b


def test_dsir_rejects_bad_params(spark):
    df = spark.createDataFrame(RAW, "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_bucket_logratios(df, df, n_buckets=0)
    with pytest.raises(ValueError):
        dsir_bucket_logratios(df, df, alpha=0.0)


# ---------------------------------------------------------------------------
# CCNet LM cross-entropy
# ---------------------------------------------------------------------------

def _brute_lm_ce(n=1, n_buckets=64, alpha=1.0):
    from decimal import ROUND_HALF_UP, Decimal
    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    def grams(t):
        ws = t.split(" ")
        return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)] \
            if len(ws) >= n else []

    tb = [bucket(g) for _, t in TARGET for g in grams(t)]
    denom = len(tb) + alpha * n_buckets
    lpm = {}
    for b in range(n_buckets):
        x = math.log((tb.count(b) + alpha) / denom)
        lpm[b] = int(Decimal(repr(x)).scaleb(6).quantize(
            Decimal(1), rounding=ROUND_HALF_UP))
    out = {}
    for i, t in RAW:
        gs = grams(t)
        if not gs:
            out[i] = (0, None)
        else:
            s = sum(lpm[bucket(g)] for g in gs)
            out[i] = (len(gs), -(s / 1e6) / len(gs))
    return out


def test_lm_cross_entropy_matches_brute_force(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           lm_cross_entropy(raw, target, n=1, n_buckets=64).collect()}
    want = _brute_lm_ce()
    assert set(got) == set(want)
    for i, (n_grams, ce) in want.items():
        assert got[i]["n_grams"] == n_grams, i
        assert got[i]["cross_entropy"] == ce, i   # exact — micro sums
    # the target-identical doc is closest to the LM
    assert got[0]["cross_entropy"] < got[1]["cross_entropy"]
    # single-word doc DOES have one unigram; an empty-text doc has none
    assert got[3]["n_grams"] == 1


def test_lm_empty_doc_null_ce_routes_tail(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    # bigram LM: a one-word doc has no bigrams → NULL cross-entropy
    raw = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    r = lm_cross_entropy(raw, target, n=2, n_buckets=64).collect()[0]
    assert r["n_grams"] == 0 and r["cross_entropy"] is None
    tiered = (lm_cross_entropy(raw, target, n=2, n_buckets=64)
              .select(ccnet_tier(F.col("cross_entropy"), 1.0, 2.0)
                      .alias("tier")).collect())
    assert tiered[0]["tier"] == "tail"


def test_lm_precomputed_logprobs_path(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    lp = lm_bucket_logprobs(target, n=1, n_buckets=64)
    assert lp.count() == 64
    a = sorted(lm_cross_entropy(raw, target, n=1, n_buckets=64).collect())
    b = sorted(lm_cross_entropy(raw, n=1, n_buckets=64,
                                logprobs=lp).collect())
    assert a == b


def test_lm_requires_target_or_logprobs(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    with pytest.raises(ValueError):
        lm_cross_entropy(raw)
    with pytest.raises(ValueError):
        ccnet_tier(F.col("x"), 2.0, 1.0)


def test_ccnet_tier_routing(spark):
    df = spark.createDataFrame(
        [(0, 0.5), (1, 1.0), (2, 1.5), (3, 2.0), (4, 2.5), (5, None)],
        "doc_id long, ce double")
    got = {r["doc_id"]: r["tier"] for r in df.select(
        "doc_id", ccnet_tier(F.col("ce"), 1.0, 2.0).alias("tier"))
        .collect()}
    assert got == {0: "head", 1: "head", 2: "middle", 3: "middle",
                   4: "tail", 5: "tail"}


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------

def _vec_rows():
    # two clusters; in cluster 0: ids 0,1 identical (dup), 2 far;
    # in cluster 1: ids 3,4 near-identical, 5 far
    return [
        (0, 0, [1.0, 0.0, 0.0]),
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [0.0, 1.0, 0.0]),
        (3, 1, [0.0, 0.6, 0.8]),
        (4, 1, [0.0, 0.6001, 0.7999]),
        (5, 1, [0.9, 0.1, 0.0]),
    ]


def test_semdedup_cluster_col_brute_force(spark):
    df = spark.createDataFrame(
        _vec_rows(), "vec_id long, label int, embedding array<float>")
    got = {r["vec_id"]: r for r in
           semdedup(df, tau=0.95, cluster_col="label").collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5}
    # lowest id of each dup-pair survives; witness side dropped
    assert got[0]["keep"] is True and got[1]["keep"] is False
    assert got[2]["keep"] is True
    assert got[3]["keep"] is True and got[4]["keep"] is False
    assert got[5]["keep"] is True
    assert got[1]["cluster"] == 0 and got[4]["cluster"] == 1


def test_semdedup_cross_cluster_dups_not_compared(spark):
    # identical vectors in DIFFERENT clusters are both kept — the
    # SemDeDup contract (quadratic bounded within cluster)
    df = spark.createDataFrame(
        [(0, 0, [1.0, 0.0]), (1, 1, [1.0, 0.0])],
        "vec_id long, label int, embedding array<float>")
    got = {r["vec_id"]: r["keep"] for r in
           semdedup(df, tau=0.9, cluster_col="label").collect()}
    assert got == {0: True, 1: True}


def test_semdedup_mega_cluster_capped(spark):
    # pathological clustering: one cluster holds ~90% of the rows
    # (plus planted dups).  With the cap engaged the mega-cluster is
    # EXCLUDED from the pair search — all its rows come back keep=True
    # (dups inside it are not found: the documented honest limit) —
    # while small clusters still dedup; uncapped (max_cluster=None)
    # keeps the original exhaustive behaviour.
    rows = [(i, 0, [float(i), 1.0]) for i in range(90)]          # mega
    rows += [(100, 1, [1.0, 0.0]), (101, 1, [1.0, 0.0]),          # dup
             (102, 2, [0.0, 1.0])]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")
    got = {r["vec_id"]: r["keep"] for r in
           semdedup(df, tau=0.9, cluster_col="label",
                    max_cluster=10).collect()}
    assert len(got) == 93                       # every row reported
    assert all(got[i] for i in range(90))       # mega-cluster all kept
    assert got[100] is True and got[101] is False and got[102] is True
    # uncapped: near-parallel high-index mega rows DO drop
    unc = {r["vec_id"]: r["keep"] for r in
           semdedup(df, tau=0.9, cluster_col="label",
                    max_cluster=None).collect()}
    assert not all(unc[i] for i in range(90))
    assert unc[100] is True and unc[101] is False


def test_semdedup_kmeans_path_drops_planted_dups(spark):
    # 20 well-separated base vectors + exact duplicates of 3 of them;
    # k-means clustering must co-locate each dup with its original,
    # and only the duplicate (higher id) is dropped
    base = [(i, [1.0 if j == i % 8 else 0.0 for j in range(8)])
            for i in range(20)]
    dups = [(100 + i, list(v)) for i, v in base[:3]]
    df = spark.createDataFrame(base + dups,
                               "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["keep"] for r in
           semdedup(df, tau=0.999, n_centroids=8, iterations=4)
           .collect()}
    for i in range(3):
        assert got[100 + i] is False, f"dup of {i} not dropped"
    # originals of the dups survive
    for i in range(3):
        assert got[i] is True


# ---------------------------------------------------------------------------
# Arrow vs Catalyst impl pins (shared md5-wheel, exact integer sums)
# ---------------------------------------------------------------------------

def test_dsir_impls_pinned_equal(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    a = sorted(map(tuple, dsir_weights(
        raw, target, n=2, n_buckets=64, impl="arrow").collect()))
    j = sorted(map(tuple, dsir_weights(
        raw, target, n=2, n_buckets=64, impl="jvm").collect()))
    assert a == j
    with pytest.raises(ValueError):
        dsir_weights(raw, target, n=2, n_buckets=64, impl="rdd")


def test_lm_impls_pinned_equal(spark):
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    raw = spark.createDataFrame(RAW + [(4, "")],
                                "doc_id long, text string")
    a = sorted(map(tuple, lm_cross_entropy(
        raw, target, n=2, n_buckets=64, impl="arrow").collect()))
    j = sorted(map(tuple, lm_cross_entropy(
        raw, target, n=2, n_buckets=64, impl="jvm").collect()))
    assert a == j


def test_bucket_counts_impls_pinned_equal(spark):
    from ocr_devnagari_spark.operators.scoring import _bucket_counts
    df = spark.createDataFrame(RAW, "doc_id long, text string")
    a = sorted(map(tuple, _bucket_counts(df, 2, 64, "text",
                                         impl="arrow").collect()))
    j = sorted(map(tuple, _bucket_counts(df, 2, 64, "text",
                                         impl="jvm").collect()))
    assert a == j


def test_ccnet_tier_cuts_terciles(spark):
    from ocr_devnagari_spark.operators.scoring import (
        ccnet_tier,
        ccnet_tier_cuts,
    )
    rows = [(i, float(i)) for i in range(90)] + [(90, None), (91, None)]
    df = spark.createDataFrame(rows, "doc_id long, cross_entropy double")
    lo, hi = ccnet_tier_cuts(df, rel_err=0.0)    # exact quantiles
    assert lo <= hi
    tiers = {r["doc_id"]: r["t"] for r in df.select(
        "doc_id", ccnet_tier(F.col("cross_entropy"), lo, hi)
        .alias("t")).collect()}
    counts = {t: sum(1 for v in tiers.values() if v == t)
              for t in ("head", "middle", "tail")}
    # terciles of 90 non-null docs -> ~30 per tier; NULLs route tail
    assert counts["head"] == 30
    assert counts["tail"] >= 30 + 2
    assert tiers[90] == "tail" and tiers[91] == "tail"


def test_ccnet_tier_cuts_all_null_raises(spark):
    import pytest

    from ocr_devnagari_spark.operators.scoring import ccnet_tier_cuts
    df = spark.createDataFrame(
        [(0, None), (1, None)], "doc_id long, cross_entropy double")
    with pytest.raises(ValueError, match="no non-NULL"):
        ccnet_tier_cuts(df, rel_err=0.0)
    with pytest.raises(ValueError, match="no non-NULL"):
        ccnet_tier_cuts(df.filter("doc_id < 0"), rel_err=0.0)
