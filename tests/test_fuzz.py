"""Property-based fuzzing of the extraction core: for ANY byte string the
extractor must (a) not raise, (b) be deterministic, (c) keep its output
invariants — because at 10^12 documents every corrupt byte sequence that
exists on the web WILL be in the table."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_devnagari_spark.extract_core import (
    detect_critical,
    estimate_confidence,
    extract_document,
    validate_text,
)

_html_ish = st.one_of(
    st.binary(max_size=2000),
    st.text(max_size=2000).map(lambda s: s.encode("utf-8")),
    st.from_regex(
        r"(<[a-zA-Z/!][^>]{0,40}>|[\w\s&;#]{0,40}){0,40}",
        fullmatch=True).map(lambda s: s.encode("utf-8", "ignore")),
)


@settings(max_examples=300, deadline=None)
@given(payload=_html_ish)
def test_extract_never_raises_and_is_deterministic(payload):
    r1 = extract_document("u", payload)
    r2 = extract_document("u", payload)
    assert r1 == r2
    assert r1["backend_used"] in ("fast", "fast+precise", "pdf")
    assert 0.0 <= r1["confidence"] <= 1.0
    assert isinstance(r1["text"], str)
    if r1["success"]:
        ok, _ = validate_text(r1["text"])
        assert ok


@settings(max_examples=300, deadline=None)
@given(text=st.text(max_size=1000))
def test_scalar_functions_total(text):
    c = estimate_confidence(text)
    assert 0.5 <= c <= 1.0 or c == 0.55      # formula range
    flag, score, hits = detect_critical(text)
    assert 0.0 <= score <= 1.0
    # strict gate: mantra families or the web (code/numeric) families
    assert flag == (("bija" in hits) or ("verse" in hits)
                    or hits.get("section", 0) >= 2
                    or "code" in hits or "numeric_table" in hits)
    ok, err = validate_text(text)
    assert ok == (err is None)
