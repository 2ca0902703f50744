"""Content-type sniffing — magic-byte MIME detection over ``binary``
payload columns, pure Catalyst (no Python workers: ``substring`` +
``hex`` + prefix ``when`` chain compile into whole-stage codegen).

A crawl's media pipeline must route payloads by what they ARE, not what
the server claimed (Content-Type headers lie constantly); this is the
dispatch gate in front of the real codecs (``codecs.image_features``'s
PNG/JPEG signature dispatch generalized to a column operator).

``MAGIC_TABLE`` is the single source of truth: the Spark expression and
the DuckDB oracle mirror both generate from it, longest-prefix-first so
overlapping magics (GIF87a vs GIF89a) resolve deterministically. The
WAV rule is the one non-prefix check (RIFF container + WAVE type at
byte 9). Unknown payloads → ``application/octet-stream``. HTML
detection covers the real-world case shapes (``<!DOCTYPE``/
``<!doctype``, ``<html``/``<HTML``); arbitrary mixed-case preambles
fall through to octet-stream (documented — hex prefixes can't
case-fold; full sniffing belongs to a decode stage).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (uppercase hex prefix, mime) — matched longest-first
MAGIC_TABLE = [
    ("89504E470D0A1A0A", "image/png"),
    ("474946383761", "image/gif"),       # GIF87a
    ("474946383961", "image/gif"),       # GIF89a
    ("3C21444F43", "text/html"),         # <!DOC (HTML4-era)
    ("3C21646F63", "text/html"),         # <!doc (the dominant HTML5 form)
    ("3C68746D6C", "text/html"),         # <html
    ("3C48544D4C", "text/html"),         # <HTML
    ("255044462D", "application/pdf"),   # %PDF-
    ("504B0304", "application/zip"),
    ("FFD8FF", "image/jpeg"),
    ("1F8B", "application/gzip"),
]

_RIFF = "52494646"                        # 'RIFF'
_WAVE = "57415645"                        # 'WAVE' at byte offset 8

SNIFF_PREFIX_BYTES = 12                   # covers every rule above


def sniff_hex(payload: Column) -> Column:
    """Uppercase hex of the payload's first ``SNIFF_PREFIX_BYTES``."""
    return F.upper(F.hex(F.substring(payload, 1, SNIFF_PREFIX_BYTES)))


def classify_hex(sig: Column) -> Column:
    """MIME from an uppercase-hex prefix string (the shared classifier
    — also applied to hex strings directly, which is what makes the
    logic DuckDB-oracle-checkable without synthesizing binary)."""
    expr = None
    for prefix, mime in sorted(MAGIC_TABLE,
                               key=lambda t: -len(t[0])):
        cond = F.startswith(sig, F.lit(prefix))
        expr = (F.when(cond, mime) if expr is None
                else expr.when(cond, mime))
    wav = (F.startswith(sig, F.lit(_RIFF))
           & (F.substring(sig, 17, 8) == _WAVE))
    expr = expr.when(wav, "audio/wav")
    return expr.otherwise("application/octet-stream")


def sniff_mime(payload: Column) -> Column:
    """binary payload → MIME string."""
    return classify_hex(sniff_hex(payload))


def classify_hex_sql(sig: str) -> str:
    """DuckDB mirror of ``classify_hex``, generated from the same
    ``MAGIC_TABLE`` (longest-first order preserved)."""
    whens = "".join(
        f"WHEN starts_with({sig}, '{prefix}') THEN '{mime}' "
        for prefix, mime in sorted(MAGIC_TABLE, key=lambda t: -len(t[0])))
    wav = (f"WHEN starts_with({sig}, '{_RIFF}') "
           f"AND substring({sig}, 17, 8) = '{_WAVE}' THEN 'audio/wav' ")
    return (f"CASE {whens}{wav}"
            f"ELSE 'application/octet-stream' END")
