"""Unicode text normalization — NFC + control stripping + whitespace
collapse, the standard pre-tokenization cleanup.

Web text arrives in mixed normal forms (decomposed accents from macOS
file names, combining marks from some CMSes); tokenizers and the
exact/paragraph dedup family all treat ``café`` (NFC) and ``café``
(NFD) as different strings unless the corpus is normalized first.

Spark has NO built-in Unicode normalization, so NFC is the one genuine
Python step — an Arrow-batched pandas UDF over ``unicodedata`` (C
implementation, vectorized transfer; NEVER a row-at-a-time Python
UDF).  Everything around it stays Catalyst:

    normalize_text = trim(collapse_ws(strip_controls(nfc(text))))

- strip_controls removes C0 controls except \\t and \\n, plus DEL
  (``[\\x00-\\x08\\x0B-\\x1F\\x7F]``).
- collapse_ws folds runs of spaces/tabs into one space.

The DuckDB oracle mirrors the chain with its native ``nfc_normalize``
— two independent NFC implementations agreeing is the correctness
argument (both implement Unicode TR-15).

No counterpart in the reference; part of the engine's web-corpus
surface alongside functions/text.py.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

CONTROL_RE = r"[\x00-\x08\x0B-\x1F\x7F]"
WS_RUN_RE = r"[ \t]+"

_NFC_UDF = None


def _nfc(s):
    return s.map(lambda x: None if x is None
                 else unicodedata.normalize("NFC", x))


def nfc_udf(col: Column) -> Column:
    """Arrow-batched NFC — the UDF object is built lazily (pandas_udf
    registration needs an active SparkSession, and this module must be
    importable without one, e.g. during pytest collection)."""
    global _NFC_UDF
    if _NFC_UDF is None:
        _NFC_UDF = pandas_udf(_nfc, StringType())
    return _NFC_UDF(col)


def normalize_text(col: Column) -> Column:
    """NFC → strip controls → collapse space/tab runs → trim.
    NULL propagates (the pandas UDF and every regexp_replace keep it)."""
    step = nfc_udf(col)
    step = F.regexp_replace(step, CONTROL_RE, "")
    step = F.regexp_replace(step, WS_RUN_RE, " ")
    return F.trim(step)


def normalize_text_sql(c: str) -> str:
    """DuckDB mirror (independent NFC implementation)."""
    return (f"trim(regexp_replace(regexp_replace(nfc_normalize({c}), "
            f"'{CONTROL_RE}', '', 'g'), '{WS_RUN_RE}', ' ', 'g'))")
