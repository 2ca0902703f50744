"""Physical-plan shape assertions — the ``.explain()`` evidence that the
scale-critical properties hold (SURVEY.md §4): filters push to the parquet
scan, only (url, html) enters the Python worker, the fused pipeline is
shuffle-free, and the escalation join-back broadcasts its small side."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_devnagari_spark.operators.extract import (
    extract_fused,
    is_pdf_col,
    split_routes,
)
from ocr_devnagari_spark.plans.pipeline import read_pages


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fused_pipeline_is_shuffle_free(spark, corpus_dir):
    out = extract_fused(read_pages(spark, corpus_dir))
    plan = _plan(out)
    assert "Exchange" not in plan, plan     # narrow scan → map, no shuffle


def test_column_pruning_into_udf(spark, corpus_dir):
    """Only url+html may be read from parquet — the WET ``text`` column is
    a second copy of the corpus and must never reach the Python worker."""
    out = extract_fused(read_pages(spark, corpus_dir))
    plan = _plan(out)
    scan = plan[plan.index("Scan parquet"):]
    schema_line = [ln for ln in scan.splitlines()
                   if "ReadSchema" in ln or "struct<" in ln]
    txt = " ".join(schema_line)
    assert "html" in txt and "url" in txt
    assert "warc_ts" not in txt and "lang" not in txt


def test_filter_pushdown_to_scan(spark, corpus_dir):
    pages = read_pages(spark, corpus_dir).filter(F.col("lang") == "en")
    plan = _plan(pages)
    assert "PushedFilters: [" in plan
    assert "EqualTo(lang,en)" in plan.replace(" ", "")


def test_pdf_route_predicate_is_jvm_side(spark, corpus_dir):
    html_df, pdf_df = split_routes(read_pages(spark, corpus_dir))
    for df in (html_df, pdf_df):
        plan = _plan(df.select("url"))
        assert "EvalPython" not in plan     # startswith on binary: Catalyst


def test_two_pass_join_back_broadcasts(spark, corpus_dir):
    """The escalated side is ~8-15% of rows → Catalyst/AQE should pick a
    broadcast hash join for the join-back at this scale."""
    from ocr_devnagari_spark.operators.extract import extract_two_pass
    out = extract_two_pass(read_pages(spark, corpus_dir))
    out.count()                              # let AQE finalize
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_resume_antijoin_planned_as_join(spark, corpus_dir, work_root):
    from ocr_devnagari_spark.config import ExtractConfig
    from ocr_devnagari_spark.plans.pipeline import (
        pending_pages,
        run_extract_job,
    )
    from ocr_devnagari_spark.sources.icebox import IceboxTable
    cfg = ExtractConfig(root_dir=work_root)
    run_extract_job(spark, corpus_dir, cfg, job_token="t",
                    limit_pending=100)
    pend = pending_pages(read_pages(spark, corpus_dir),
                         IceboxTable(cfg.extracted_table), spark)
    plan = _plan(pend)
    assert "LeftAnti" in plan
    assert "EvalPython" not in plan


def test_is_pdf_col_matches_python(spark, corpus_dir):
    pages = read_pages(spark, corpus_dir)
    from ocr_devnagari_spark.extract_core import is_pdf_payload
    rows = pages.select("url", "html", is_pdf_col().alias("p")).collect()
    for r in rows[:200]:
        assert r.p == is_pdf_payload(r.html)


def test_bad_backend_name_fails_before_any_write(spark, corpus_dir,
                                                 work_root):
    """A mistyped --backend must fail driver-side pre-flight — not
    executor-side mid-stage, and never after the snapshot commit."""
    import os

    import pytest

    from ocr_devnagari_spark.config import ExtractConfig
    from ocr_devnagari_spark.plans.pipeline import run_extract_job
    cfg = ExtractConfig(root_dir=work_root)
    with pytest.raises(ValueError, match="unknown backend"):
        run_extract_job(spark, corpus_dir, cfg, primary="tesseractt")
    # nothing was staged or committed
    assert not os.path.exists(
        os.path.join(cfg.extracted_table, "_current"))
