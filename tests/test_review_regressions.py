"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ocr_devnagari_spark.extract_core import extract_document, fast_extract_html
from ocr_devnagari_spark.sources.icebox import IceboxTable


def test_uppercase_rawtext_close_tags():
    """</SCRIPT> (any case) must terminate the raw section — previously it
    swallowed the rest of the document."""
    html = ("<html><head><SCRIPT>var x=1;</SCRIPT></head><body><article>"
            "<p>real content paragraph long enough to validate fine</p>"
            "</article></body></html>")
    text, _ = fast_extract_html(html)
    assert text == "real content paragraph long enough to validate fine"
    for variant in ("</Script>", "</STYLE >",):
        tag = "script" if "cript" in variant else "style"
        h = (f"<{tag}>junk < junk</{tag.upper()}><p>visible text that is "
             f"definitely long enough</p>").replace(
                 f"</{tag.upper()}>", variant)
        t, _ = fast_extract_html(h)
        assert "visible text" in t


def test_expire_survives_crashed_commit(spark, work_root):
    """A manifest written by a crashed commit (never pointed to by
    _current) must not cause expire_snapshots to delete the LIVE one."""
    t = IceboxTable(f"{work_root}/tbl")
    t.overwrite(spark.range(5))
    assert t.snapshot_id() == 1
    # simulate the crash window: manifest-2 exists, _current still → 1
    m = t.current_manifest()
    orphan = dict(m, snapshot_id=2, parent_snapshot_id=1,
                  files=[], added_files=[], row_count=0)
    with open(os.path.join(t.path, "manifests",
                           "manifest-00000002.json"), "w") as f:
        json.dump(orphan, f)
    t.expire_snapshots(keep_last=1)
    assert t.read(spark).count() == 5        # live snapshot intact
    assert t.snapshot_id() == 1


def test_lineage_heals_after_crash_between_commits(spark, corpus_dir,
                                                   work_root):
    """Crash between output commit and lineage append: a token-idempotent
    re-run must recompute the missing lineage from the snapshot's own
    added files."""
    from ocr_devnagari_spark.config import ExtractConfig
    from ocr_devnagari_spark.plans.pipeline import run_extract_job
    cfg = ExtractConfig(root_dir=work_root)
    run_extract_job(spark, corpus_dir, cfg, job_token="t1")
    # wipe the lineage table entirely (as if the job died pre-append)
    import shutil
    shutil.rmtree(cfg.lineage_table)
    r = run_extract_job(spark, corpus_dir, cfg, job_token="t1")
    assert r["resumed"]
    lin = IceboxTable(cfg.lineage_table).read(spark)
    total = spark.read.parquet(f"{corpus_dir}/pages.parquet").count()
    assert lin.agg(F.sum("row_count")).first()[0] == total


def test_merge_upsert_rejects_duplicate_keys(spark, work_root):
    t = IceboxTable(f"{work_root}/tbl")
    t.overwrite(spark.createDataFrame([(1, "a")], "k int, v string"))
    dup = spark.createDataFrame([(2, "x"), (2, "y")], "k int, v string")
    with pytest.raises(ValueError, match="duplicate"):
        t.merge_upsert(spark, dup, "k")


def test_deep_nesting_does_not_crash():
    """1500-deep tag nesting must not RecursionError out of the precise
    path (it would kill the whole Spark task at web scale)."""
    deep = ("<div>" * 1500
            + "<p>some content that is long enough to validate okay</p>"
            + "</div>" * 1500)
    # force escalation by adding a critical pattern
    payload = (deep + "<pre><code>def f(x): return x</code></pre>").encode()
    r = extract_document("u", payload)
    assert r["backend_used"] in ("fast", "fast+precise")
    assert "some content" in r["text"]


def test_wet_text_has_no_script_leak():
    """Uppercase <SCRIPT> docs must not leak JS into the WET text column."""
    from ocr_devnagari_spark.corpus import gen_page
    leaks = 0
    for i in range(600):
        row = gen_page(i)
        if not row["is_pdf"] and "var x=" in row["text"]:
            leaks += 1
    assert leaks == 0


def test_knn_empty_input(spark):
    from ocr_devnagari_spark.operators.similarity import knn_self_join
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int")
    assert knn_self_join(empty).count() == 0


def test_class_pattern_in_both_detectors(spark):
    """extract_core and the Catalyst cascade agree on 'class Foo:'."""
    from ocr_devnagari_spark.extract_core import detect_critical
    from ocr_devnagari_spark.functions.text import critical_score
    s = ("class Foo: a perfectly ordinary code sample with enough words "
         "around it to make a long document")
    flag, score, _ = detect_critical(s)
    assert flag
    got = spark.createDataFrame([(s,)], "text string").select(
        critical_score(F.col("text")).alias("s")).first().s
    assert abs(got - score) < 1e-9


def test_two_pass_does_not_persist_payload(spark, corpus_dir):
    """The persisted two-pass intermediate must not carry the html bytes."""
    from ocr_devnagari_spark.operators.extract import _FAST_SCHEMA
    assert "html" not in [f.name for f in _FAST_SCHEMA.fields]

    from ocr_devnagari_spark.operators.extract import extract_two_pass
    from ocr_devnagari_spark.plans.pipeline import read_pages
    pages = read_pages(spark, corpus_dir)
    out = extract_two_pass(pages)
    out.count()
    # every InMemoryRelation in the plan must exclude the payload column
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "InMemoryRelation" in line:
            assert "html" not in line, line

def test_data_class_attrs_are_not_class(spark=None):
    """data-class= / data-id= are custom attributes, not class/id — they
    must not mark real content blocks as dropped ('-' is a word boundary,
    so the old \\b(class|id) matched inside them)."""
    h = ('<div data-class="advert" data-id="comment-42">'
         '<p>real content that is definitely long enough to keep</p></div>')
    t, _ = fast_extract_html(h)
    assert "real content" in t
    # a genuine class attribute still drops
    h2 = ('<div class="advert"><p>pure advertisement junk here</p></div>'
          '<p>real content that is definitely long enough to keep</p>')
    t2, _ = fast_extract_html(h2)
    assert "advertisement junk" not in t2 and "real content" in t2
