"""ocr_devnagari_spark — a PySpark-native main-content extraction engine.

A brand-new, Spark-first re-expression of the capabilities of the reference
pipeline ``rajeshkanaka/OCR-Devnagari`` (a single-machine Python document
extraction tool; see SURVEY.md): batched extraction of main content from
Common-Crawl-style web pages (``url, warc_ts, html BINARY, text, lang``),
with a cheap fast path over 100% of rows, a precise path over the escalated
minority (the reference's hybrid routing, ``hybrid_backend.py:144-218``),
a PDF/layout branch for binary payloads, checkpoint/resume via anti-join,
and idempotent snapshot-committed output.

Everything here derives from public knowledge only: the Apache Spark API,
the reference repo's observable behaviour, and published boilerplate-removal
heuristics (Boilerpipe-style text-density / link-density block
classification, Kohlschütter et al., WSDM 2010).
"""

__version__ = "0.1.0"
