"""Distributed extraction stages (Arrow-batched ``mapInPandas``).

Two physically different realizations of the reference's hybrid routing
(``backends/hybrid_backend.py:144-218``), with identical semantics:

**Fused (default, the 100-TB path).** One narrow ``mapInPandas`` stage per
input split: fast-extract every row, run the precise extractor inline on the
escalated minority of the batch. Plan shape = scan → map → sink: zero
shuffles, one pass over the payload bytes, embarrassingly parallel, task
working set bounded by the Arrow batch size. At 10^12 documents this is the
only sane topology — any alternative either scans the payload column twice
or shuffles it.

**Two-pass (explicit DataFrame topology).** fast over 100% → ``filter`` the
escalation predicate → precise over the flagged ~8-15% → left join-back +
``coalesce``. This mirrors the reference's operator graph literally and
gives Catalyst/AQE a real selectivity boundary, but it re-materializes the
fast output (or rescans the source) — kept for parity demonstration and as
the shape you'd use if the precise path ran on different hardware (the
reference's precise path was a remote API). Tests assert both topologies
produce byte-identical results.

The per-row logic is ``extract_core.extract_document`` — the same pure
function the golden oracle runs, which is what makes byte-identity a
theorem rather than a hope.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..extract_core import (
    CONFIDENCE_THRESHOLD,
    detect_critical_full,
    estimate_confidence,
    extract_document,
    fast_extract_html,
    precise_extract_html,
    validate_text,
)

# Output schema — FIXTURES.md F3 ``extracted`` + partition provenance.
EXTRACTED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("success", T.BooleanType(), False),
    T.StructField("confidence", T.DoubleType(), False),
    T.StructField("error", T.StringType(), True),
    T.StructField("backend_used", T.StringType(), False),
    T.StructField("needs_verification", T.BooleanType(), False),
    T.StructField("rule_hits", T.MapType(T.StringType(), T.LongType()), False),
    T.StructField("partition_id", T.IntegerType(), False),
])

PDF_MAGIC_HEX = "46504446310a"  # b"FPDF1\n"


def _pid() -> int:
    ctx = TaskContext.get()
    return ctx.partitionId() if ctx is not None else -1


# ---------------------------------------------------------------------------
# Fused stage (default)
# ---------------------------------------------------------------------------

def _fused_batches(batches: Iterator[pd.DataFrame], threshold: float,
                   primary, precise) -> Iterator[pd.DataFrame]:
    pid = _pid()
    # Resolve backends executor-side; lifecycle hooks run ONCE per task
    # around the batch loop (the reference's backend.initialize() /
    # cleanup() contract, base.py:49-132 — per-executor amortization for
    # heavy backends like a real model; pure built-ins have no hooks).
    # A string resolves against the registry AS IMPORTED ON THE WORKER
    # (built-ins + module-registration only); a BackendSpec/callable is
    # shipped inside the task closure and needs no registry sync.
    def _resolve(x):
        if x is None:
            return None, None
        if isinstance(x, str):
            from .registry import get_spec
            spec = get_spec(x)
            return spec.fn, spec
        from .registry import BackendSpec
        if isinstance(x, BackendSpec):
            return x.fn, x
        return x, None                       # bare callable, no lifecycle
    p_fn, p_spec = _resolve(primary)
    pr_fn, pr_spec = _resolve(precise)
    specs = [s for s in (p_spec, pr_spec) if s is not None]
    inited: list = []        # cleanup exactly the specs whose initialize
    #                          ran — a failed SECOND initialize must still
    #                          clean up the first (workers are reused
    #                          across tasks; a leak persists)
    try:
        for spec in specs:
            if spec.initialize is not None:
                ok, msg = spec.initialize()
                if not ok:
                    raise RuntimeError(f"backend initialize failed: {msg}")
            inited.append(spec)
        for pdf in batches:
            rows = [extract_document(u, h, threshold, p_fn, pr_fn)
                    for u, h in zip(pdf["url"], pdf["html"])]
            out = pd.DataFrame.from_records(rows)
            out["partition_id"] = pid
            yield out[[f.name for f in EXTRACTED_SCHEMA.fields]]
    finally:
        errs = []
        for spec in inited:
            if spec.cleanup is not None:
                try:
                    spec.cleanup()
                except Exception as e:     # noqa: BLE001 — every inited
                    errs.append(e)         # backend must get its attempt:
                    #                        workers are reused across
                    #                        tasks, a skipped cleanup leaks
        import sys
        if errs and sys.exc_info()[0] is None:
            raise errs[0]      # surface cleanup failure, but never mask
            #                    an in-flight task error with it


def extract_fused(pages: DataFrame,
                  threshold: float = CONFIDENCE_THRESHOLD,
                  primary=None,
                  precise=None) -> DataFrame:
    """scan(url, html) → one narrow Arrow-batched map → extracted rows.

    Column pruning is explicit: only ``url`` and ``html`` enter the Python
    worker (never ``text``/``lang`` — at 100 TB the WET text column is a
    second copy of the corpus you must not move).

    ``primary``/``precise`` select backends: a string resolves against the
    registry on the worker (``operators/registry.py``), a ``BackendSpec``
    travels in the task closure (lifecycle hooks honored), a bare callable
    travels in the closure with no lifecycle; None = built-in defaults.
    """
    src = pages.select("url", "html")
    return src.mapInPandas(
        lambda it: _fused_batches(it, threshold, primary, precise),
        schema=EXTRACTED_SCHEMA)


# ---------------------------------------------------------------------------
# Two-pass topology (reference-literal plan shape)
# ---------------------------------------------------------------------------

_FAST_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("fast_text", T.StringType(), True),
    T.StructField("fast_valid", T.BooleanType(), False),
    T.StructField("fast_error", T.StringType(), True),
    T.StructField("confidence", T.DoubleType(), False),
    T.StructField("critical", T.BooleanType(), False),
    T.StructField("priority", T.DoubleType(), False),
    T.StructField("rule_hits", T.MapType(T.StringType(), T.LongType()), False),
    T.StructField("is_pdf", T.BooleanType(), False),
    T.StructField("partition_id", T.IntegerType(), False),
])

_PRECISE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("precise_text", T.StringType(), True),
    T.StructField("precise_valid", T.BooleanType(), False),
    T.StructField("precise_error", T.StringType(), True),
    T.StructField("precise_confidence", T.DoubleType(), False),
])


def _fast_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..extract_core import PDF_MAGIC, extract_pdf, is_pdf_payload
    pid = _pid()
    for pdf in batches:
        recs = []
        for url, payload in zip(pdf["url"], pdf["html"]):
            if is_pdf_payload(payload):
                text = extract_pdf(payload)
                ok, err = validate_text(text)
                recs.append(dict(url=url, fast_text=text,
                                 fast_valid=ok, fast_error=err,
                                 confidence=1.0 if ok else 0.5,
                                 critical=False, priority=0.0,
                                 rule_hits={}, is_pdf=True,
                                 partition_id=pid))
                continue
            html_str = payload.decode("utf-8", errors="replace")
            text, _ = fast_extract_html(html_str)
            ok, err = validate_text(text)
            conf = estimate_confidence(text)
            det = detect_critical_full(text)
            recs.append(dict(url=url, fast_text=text,
                             fast_valid=ok, fast_error=err, confidence=conf,
                             critical=det["flag"], priority=det["priority"],
                             rule_hits=det["hits"], is_pdf=False,
                             partition_id=pid))
        yield pd.DataFrame.from_records(recs)[
            [f.name for f in _FAST_SCHEMA.fields]]


def _precise_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        recs = []
        for url, payload in zip(pdf["url"], pdf["html"]):
            text = precise_extract_html(payload.decode("utf-8",
                                                       errors="replace"))
            ok, err = validate_text(text)
            recs.append(dict(url=url, precise_text=text, precise_valid=ok,
                             precise_error=err,
                             precise_confidence=estimate_confidence(text)))
        yield pd.DataFrame.from_records(recs)[
            [f.name for f in _PRECISE_SCHEMA.fields]]


def escalation_predicate(threshold: float = CONFIDENCE_THRESHOLD):
    """The selectivity boundary Catalyst sees between the two passes."""
    return (~F.col("is_pdf")) & (
        (~F.col("fast_valid"))
        | (F.col("confidence") < F.lit(threshold))
        | F.col("critical"))


def extract_two_pass(pages: DataFrame,
                     threshold: float = CONFIDENCE_THRESHOLD,
                     budget: int | None = None) -> DataFrame:
    """Explicit fast → filter → precise → join-back ``coalesce`` topology.

    The persisted intermediate carries NO payload bytes (only the fast
    results); the precise pass re-reads the source for the flagged ~8-15%
    via a LEFT SEMI join on url — at scale that is a second, smaller scan,
    never a cache of the corpus. The join-back is an equi left join on
    ``url``, broadcast-eligible because the escalated side is small and
    AQE-right-sized at large scale (SURVEY.md §4.1 R1).

    ``budget`` (O3): escalate only the top-``budget`` flagged rows by
    detector priority (ties → url) — the budgeted-verification mode the
    reference's detector priority score implies but never consumed
    (mantra_detector.py:253-271). Planned as TakeOrdered (per-partition
    heaps + driver merge of k), never a full sort. ``budget=None``
    escalates every flagged row and is byte-identical to the fused path.
    """
    fast = pages.select("url", "html").mapInPandas(_fast_pass, _FAST_SCHEMA)
    fast = fast.persist()
    esc = escalation_predicate(threshold)
    flagged = fast.filter(esc)
    if budget is not None:
        flagged = (flagged.orderBy(F.desc("priority"), F.asc("url"))
                   .limit(budget))
    flagged_urls = flagged.select("url")
    precise_src = pages.select("url", "html").join(
        flagged_urls, "url", "left_semi")
    precise = precise_src.mapInPandas(_precise_pass, _PRECISE_SCHEMA)
    chosen = flagged_urls.withColumn("_chosen", F.lit(True))
    joined = fast.join(precise, "url", "left").join(chosen, "url", "left")
    escalated = F.col("_chosen").isNotNull()   # esc ∧ within budget
    final_text = F.when(F.col("precise_valid") == F.lit(True),
                        F.col("precise_text")).otherwise(F.col("fast_text"))
    final_ok = F.when(F.col("precise_valid") == F.lit(True), F.lit(True)) \
                .otherwise(F.col("fast_valid"))
    final_err = F.when(F.col("precise_valid") == F.lit(True),
                       F.lit(None).cast("string")) \
                 .otherwise(F.coalesce(F.col("fast_error"),
                                       F.col("precise_error")))
    backend = (F.when(F.col("is_pdf"), F.lit("pdf"))
                .when(escalated, F.lit("fast+precise"))
                .otherwise(F.lit("fast")))
    final_conf = F.when(F.col("precise_valid") == F.lit(True),
                        F.col("precise_confidence")) \
                  .otherwise(F.col("confidence"))
    return joined.select(
        "url",
        final_text.alias("text"),
        final_ok.alias("success"),
        final_conf.alias("confidence"),
        final_err.alias("error"),
        backend.alias("backend_used"),
        # plain `critical`, NOT critical & escalated: a critical row the
        # budget deferred was never precise-verified and must stay visible
        # to the downstream verification queue. Unbudgeted, critical ⇒
        # flagged ⇒ chosen, so this is byte-identical to the fused path.
        F.col("critical").alias("needs_verification"),
        "rule_hits",
        "partition_id",
    )


# ---------------------------------------------------------------------------
# Route-split helpers (Catalyst-native PDF detection on the binary column)
# ---------------------------------------------------------------------------

def is_pdf_col():
    return F.expr(f"startswith(html, x'{PDF_MAGIC_HEX}')")


def split_routes(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(html_rows, pdf_rows) — predicate stays JVM-side, pushes to the scan."""
    return pages.filter(~is_pdf_col()), pages.filter(is_pdf_col())
