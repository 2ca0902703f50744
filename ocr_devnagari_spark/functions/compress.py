"""Compression-ratio quality signal.

``zlib.compress(text) / len(text)`` is a cheap, language-agnostic
proxy for repetitive/templated content (public recipe: the RedPajama-2
and Dolma quality signal sets both carry it): machine-generated or
boilerplate-heavy pages compress far better than natural prose, and
the signal needs no wordlists, so it complements the word-level
repetition family (functions/repetition.py) on non-space-delimited
scripts where word n-grams are unavailable.

DEFLATE is not expressible in Catalyst or DuckDB SQL, so this is an
Arrow-batched pandas UDF (the engine's documented slow path, used only
where no built-in exists — the normalize.py precedent) and its driver
query is rows-only with a brute-force pytest oracle.  zlib level is
pinned so the signal is deterministic across runs and executors.
"""

from __future__ import annotations

import zlib

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

LEVEL = 6

_UDF = None


def _ratio(s):
    def one(x):
        if x is None:
            return None
        raw = x.encode("utf-8")
        if not raw:
            return 1.0
        return len(zlib.compress(raw, LEVEL)) / len(raw)
    return s.map(one)


def compression_ratio(col: Column) -> Column:
    """compressed/raw byte ratio; lower = more repetitive.  For
    documents beyond ~100 bytes the ratio lands in (0, ~1.05]; SHORT
    texts exceed 1 freely (zlib's fixed header/checksum overhead —
    ``'x'`` → 9/1 = 9.0), so pair any upper-bound gate with a length
    floor.  Empty → 1.0, NULL propagates.  Rounded to 6 d.p."""
    global _UDF
    if _UDF is None:
        _UDF = pandas_udf(_ratio, DoubleType())
    return F.round(_UDF(col), 6)


def compression_pass(col: Column, min_ratio: float = 0.25) -> Column:
    """True = keep (ratio above the templated-content floor; Dolma-style
    recipes drop the extreme-compressibility tail)."""
    return compression_ratio(col) >= min_ratio
