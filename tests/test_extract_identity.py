"""Byte-identity of the distributed extraction vs the golden oracle —
the primary correctness gate (BASELINE.json: byte-identical text per url).
"""

from __future__ import annotations

import pytest


HOSTILE_MARKUP = [
    "",
    "plain text only",
    "a < b and c<d<e",
    "<p>unclosed",
    "<P CLASS='Nav sideBar'>mixed case attrs</p>",
    '<div class="a" id=\'b\' data-x=">">quoted > inside attr</div>',
    "<script>if (a<b) { x = '</div>'; }</script>after",
    "<SCRIPT>upper close</SCRIPT>tail",
    "<script>never closed raw text",
    "<style>p { content: '<'; }</style>s",
    "<textarea><p>not a tag</p></textarea>done",
    "<!-- comment <p>inside</p> -->x",
    "<!-- unterminated comment <p>y</p>",
    "<!DOCTYPE html><?xml version='1.0'?><p>z</p>",
    "<?php echo '<p>'; ?>w",
    "<br/><img src=x/><p/>v",
    "text &amp; entities &lt;kept&gt; &#65;",
    "<a href='x'>link</a> & <b>bold</b>",
    "<!bang no gt",
    "<",
    "tail<",
    "<1notatag>u",
    "<p><p><p>nested blocks",
    "<td>cell</td></tr></table>stray closers",
]


def test_materialize_events_matches_generator_tokenizer():
    """The list-building tokenizer twin must stay event-for-event
    identical to the generator (it IS the spec) — including rawtext
    skips, unterminated comments, bare '<', '<!'/'<?' dispatch and
    mixed-case close tags."""
    from ocr_devnagari_spark.extract_core import (
        iter_html_events,
        materialize_events,
    )
    import random
    import string

    cases = list(HOSTILE_MARKUP)
    rng = random.Random(42)
    frags = ["<p>", "</p>", "<div class='ad'>", "</div>", "text ",
             "<script>", "</script>", "<!--", "-->", "&amp;", "<",
             ">", "'", '"', "<br/>", "<a href='u'>", "</a>",
             "<!doctype>", "<?pi?>", "॥ 1 ॥ ॐ "]
    for _ in range(300):
        cases.append("".join(rng.choice(frags)
                             for _ in range(rng.randint(1, 40))))
    for _ in range(100):
        cases.append("".join(rng.choice(string.printable)
                             for _ in range(rng.randint(0, 120))))
    for h in cases:
        assert list(iter_html_events(h)) == materialize_events(h), h

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ocr_devnagari_spark.corpus import gen_page
from ocr_devnagari_spark.operators.extract import (
    extract_fused,
    extract_two_pass,
    split_routes,
)
from ocr_devnagari_spark.plans.pipeline import read_pages


def _golden_map(golden_path):
    t = pq.read_table(golden_path)
    return {u: (txt, b, s) for u, txt, b, s in zip(
        t.column("url").to_pylist(), t.column("text").to_pylist(),
        t.column("backend_used").to_pylist(), t.column("success").to_pylist())}


def test_fused_matches_golden_byte_identical(spark, corpus_dir, golden_path):
    pages = read_pages(spark, corpus_dir)
    out = extract_fused(pages).select(
        "url", "text", "backend_used", "success").collect()
    golden = _golden_map(golden_path)
    assert len(out) == len(golden)
    for r in out:
        g_text, g_backend, g_success = golden[r.url]
        assert r.text == g_text, f"text mismatch for {r.url}"
        assert r.backend_used == g_backend
        assert r.success == g_success


def test_expected_text_recovered_for_clean_docs(spark, corpus_dir):
    """Extraction recovers the generator's ground-truth main content —
    i.e. the oracle is ground truth, not self-agreement."""
    pages = read_pages(spark, corpus_dir)
    truth = spark.read.parquet(f"{corpus_dir}/truth.parquet")
    got = extract_fused(pages).select("url", "text")
    j = got.join(truth.filter(F.col("adversarial").isNull()), "url")
    bad = j.filter(F.col("text") != F.col("expected_text")).count()
    total = j.count()
    assert total > 400
    assert bad == 0


def test_two_pass_equals_fused(spark, corpus_dir):
    """The explicit fast→filter→precise→join-back topology and the fused
    single-stage plan implement the same function."""
    pages = read_pages(spark, corpus_dir)
    cols = ["url", "text", "success", "confidence", "error",
            "backend_used", "needs_verification"]
    a = {r.url: tuple(r) for r in extract_fused(pages).select(cols).collect()}
    b = {r.url: tuple(r)
         for r in extract_two_pass(pages).select(cols).collect()}
    assert a == b


def test_budgeted_escalation(spark, corpus_dir):
    """O3: budget=∞ is byte-identical to unbudgeted; budget=k escalates
    exactly the top-k flagged rows by detector priority."""
    pages = read_pages(spark, corpus_dir)
    cols = ["url", "text", "success", "confidence", "error",
            "backend_used", "needs_verification"]
    unbudgeted = {r.url: tuple(r)
                  for r in extract_two_pass(pages).select(cols).collect()}
    infinite = {r.url: tuple(r)
                for r in extract_two_pass(pages, budget=10**9)
                .select(cols).collect()}
    assert unbudgeted == infinite

    n_flagged = sum(1 for v in unbudgeted.values()
                    if v[cols.index("backend_used")] == "fast+precise")
    assert n_flagged > 10
    # critical rows rank above low-confidence ones (mantra rows ≥ 0.78,
    # code/table rows ~0.21-0.24, plain low-confidence 0.0), so a budget
    # below the critical count MUST defer some
    n_critical = sum(1 for v in unbudgeted.values()
                     if v[cols.index("needs_verification")])
    assert n_critical > 2
    k = n_critical // 2
    budgeted = extract_two_pass(pages, budget=k).select(cols).collect()
    esc_urls = {r.url for r in budgeted if r.backend_used == "fast+precise"}
    assert len(esc_urls) == k
    # non-escalated rows fall back to the fast result, text included
    by_url = {r.url: r for r in budgeted}
    for url, v in unbudgeted.items():
        if url not in esc_urls:
            assert by_url[url].backend_used in ("fast", "pdf")
    # a critical row the budget deferred was never verified — it must KEEP
    # needs_verification=True for the downstream verification queue
    nv = cols.index("needs_verification")
    deferred_critical = [u for u, v in unbudgeted.items()
                         if v[nv] and u not in esc_urls]
    assert deferred_critical, "budget must defer at least one critical row"
    for u in deferred_critical:
        assert by_url[u].needs_verification, u


def test_partitioning_invariance(spark, corpus_dir, golden_path):
    """Output must be identical under repartition(1) / repartition(16) /
    salted-by-hash partitioning — the property that carries byte-identity
    from local[8] to a 1000-executor cluster (SURVEY.md §7.3)."""
    pages = read_pages(spark, corpus_dir)
    golden = _golden_map(golden_path)
    for df in (pages.repartition(1), pages.repartition(16),
               pages.repartition(7, F.pmod(F.xxhash64("url"), F.lit(7)))):
        out = extract_fused(df).select("url", "text").collect()
        assert len(out) == len(golden)
        for r in out:
            assert r.text == golden[r.url][0]


def test_route_split_predicate(spark, corpus_dir):
    """Catalyst-native PDF-magic predicate agrees with the Python check."""
    pages = read_pages(spark, corpus_dir)
    html_df, pdf_df = split_routes(pages)
    n_pdf = pdf_df.count()
    n_html = html_df.count()
    assert n_pdf + n_html == pages.count()
    routed = extract_fused(pages).filter(
        F.col("backend_used") == "pdf").count()
    assert routed == n_pdf
    assert n_pdf > 0


def test_escalation_fraction_sane(spark, corpus_dir):
    """Hybrid routing escalates a minority (reference reports ~8-15%
    escalation; our corpus lands in the same regime, <35%)."""
    pages = read_pages(spark, corpus_dir)
    byb = dict(extract_fused(pages).groupBy("backend_used").count().collect())
    total = sum(byb.values())
    assert byb.get("fast", 0) > 0.55 * total
    assert 0 < byb.get("fast+precise", 0) < 0.35 * total


def test_validation_floor():
    """Sub-20-char extractions fail validation (MIN_VALID_LENGTH)."""
    for i in range(2000):
        row = gen_page(i)
        if row["adversarial"] == "tiny":
            from ocr_devnagari_spark.extract_core import extract_document
            r = extract_document(row["url"], row["html"])
            assert not r["success"]
            assert r["error"] in ("too_short", "no_alnum")
            return
    raise AssertionError("no tiny doc in first 2000")
