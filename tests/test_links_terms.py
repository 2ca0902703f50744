"""Link graph (extraction, host edges, PageRank) and TF-IDF — Python
oracles with the same rounding discipline, plus fixed-expectation pins."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ocr_devnagari_spark.functions.links import (
    extract_links,
    host_edges,
    pagerank,
)
from ocr_devnagari_spark.functions.terms import tfidf_topk


def test_extract_links_cases(spark):
    cases = [
        (1, '<a href="https://x.com/a">x</a> <A HREF=\'/rel\'>r</A>',
         ["https://x.com/a", "/rel"]),
        (2, '<a class="z" href="//cdn.y.org/lib.js">y</a>', ["//cdn.y.org/lib.js"]),
        (3, "no links here", []),
        (4, '<a href=unquoted>skipped</a>', []),   # quoted hrefs only
    ]
    df = spark.createDataFrame([(i, h) for i, h, _ in cases],
                               "id long, html string")
    got = {r.id: r.links for r in
           df.select("id", extract_links(F.col("html"))
                     .alias("links")).collect()}
    assert got == {i: want for i, _, want in cases}


def test_host_edges_resolution(spark):
    df = spark.createDataFrame(
        [("a.com", '<a href="https://B.com/x">1</a>'
                   '<a href="//c.com:443/y">2</a>'
                   '<a href="/relative">3</a>'
                   '<a href="https://user@d.com/z">4</a>'
                   '<a href="https://b.com/again">5</a>')],
        "host string, html string")
    got = {(r.src_host, r.dst_host): r.n_links
           for r in host_edges(df).collect()}
    assert got == {("a.com", "b.com"): 2, ("a.com", "c.com"): 1,
                   ("a.com", "a.com"): 1, ("a.com", "d.com"): 1}


def _py_pagerank(edges, iterations=10, d=0.85):
    e = sorted({(s, t) for s, t in edges if s != t})
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    n = len(nodes)
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    pr = {v: round(1.0 / n, 6) for v in nodes}
    for _ in range(iterations):
        s_in = {v: 0.0 for v in nodes}
        for s, t in e:
            s_in[t] += pr[s] / out[s]
        pr = {v: round((1 - d) / n + d * s_in[v], 6) for v in nodes}
    return pr


def test_pagerank_matches_python_oracle(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
             ("d", "a"), ("d", "b"), ("e", "e"),     # self-loop dropped
             ("a", "b")]                              # parallel edge
    df = spark.createDataFrame(
        [(s, t, 1) for s, t in edges],
        "src_host string, dst_host string, n_links int")
    got = {r.host: r.pr for r in pagerank(df, iterations=10).collect()}
    want = _py_pagerank(edges)
    assert got == want
    # a node everyone links to outranks a dangling-ish one
    assert got["a"] > got["d"] and got["b"] > got["d"]
    # ranks are probabilities-ish: positive, sum ≈ ≤1 (dangling mass is
    # dropped; per-iteration rounding adds ~1e-6-scale drift)
    assert all(v > 0 for v in got.values())
    assert sum(got.values()) <= 1.0 + 1e-4


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src_host string, dst_host string")
    assert pagerank(df, iterations=3).count() == 0


def _py_tfidf(rows, k=3):
    import collections
    toks = {i: [t for t in txt.strip().lower().split() if t]
            for i, txt in rows}
    n = len(rows)
    dfreq = collections.Counter()
    for i in toks:
        for t in set(toks[i]):
            dfreq[t] += 1
    out = {}
    for i in toks:
        tf = collections.Counter(toks[i])
        scored = sorted(
            ((round(c * math.log(n / dfreq[t]), 6), t, c)
             for t, c in tf.items()),
            key=lambda x: (-x[0], x[1]))
        out[i] = [(t, c, s, r + 1)
                  for r, (s, t, c) in enumerate(scored[:k])]
    return out


def test_tfidf_matches_python_oracle(spark):
    rows = [(1, "the cat sat on the mat"),
            (2, "the dog ate the cat food"),
            (3, "quantum flux capacitors and the cat"),
            (4, "the the the")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in tfidf_topk(df, k=3).collect():
        got.setdefault(r.id, []).append((r.term, r.tf, r.score, r.rank))
    for i in got:
        got[i].sort(key=lambda x: x[3])
    assert got == _py_tfidf(rows, k=3)
    # doc 3's four unique singletons (idf ln4) tie → term-asc order;
    # corpus-wide 'the'/'cat' never crack its top 3
    top3 = [t for t, *_ in got[3]]
    assert top3 == ["and", "capacitors", "flux"]
    assert "the" not in top3 and "cat" not in top3
