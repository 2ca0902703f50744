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
    ("00000100", "image/x-icon"),
    ("1F8B", "application/gzip"),
]

_RIFF = "52494646"                        # 'RIFF'

# container rules: (required prefix or None, 1-based hex-char offset,
# hex value at that offset, mime) — checked BEFORE the prefix table
# (an MP4 with leading box size 0x00000100 must beat ICO's weak magic);
# a RIFF payload that is neither WAVE nor WEBP stays octet-stream
CONTAINER_RULES = [
    (_RIFF, 17, "57415645", "audio/wav"),    # RIFF....WAVE
    (_RIFF, 17, "57454250", "image/webp"),   # RIFF....WEBP
    (None, 9, "66747970", "video/mp4"),      # ....ftyp (ISO BMFF)
]

SNIFF_PREFIX_BYTES = 12                   # covers every rule above


def sniff_hex(payload: Column) -> Column:
    """Uppercase hex of the payload's first ``SNIFF_PREFIX_BYTES``."""
    return F.upper(F.hex(F.substring(payload, 1, SNIFF_PREFIX_BYTES)))


def classify_hex(sig: Column) -> Column:
    """MIME from an uppercase-hex prefix string (the shared classifier
    — also applied to hex strings directly, which is what makes the
    logic DuckDB-oracle-checkable without synthesizing binary)."""
    # containers FIRST: an MP4 whose leading box size is 0x00000100
    # would otherwise be eaten by ICO's (genuinely weak) 00000100 magic
    expr = None
    for prefix, off, val, mime in CONTAINER_RULES:
        cond = F.substring(sig, off, len(val)) == val
        if prefix is not None:
            cond = F.startswith(sig, F.lit(prefix)) & cond
        expr = (F.when(cond, mime) if expr is None
                else expr.when(cond, mime))
    for prefix, mime in sorted(MAGIC_TABLE,
                               key=lambda t: -len(t[0])):
        expr = expr.when(F.startswith(sig, F.lit(prefix)), mime)
    return expr.otherwise("application/octet-stream")


def sniff_mime(payload: Column) -> Column:
    """binary payload → MIME string."""
    return classify_hex(sniff_hex(payload))


def classify_hex_sql(sig: str) -> str:
    """DuckDB mirror of ``classify_hex``, generated from the same
    ``MAGIC_TABLE`` (longest-first order preserved)."""
    whens = ""
    for prefix, off, val, mime in CONTAINER_RULES:
        cond = f"substring({sig}, {off}, {len(val)}) = '{val}'"
        if prefix is not None:
            cond = f"starts_with({sig}, '{prefix}') AND {cond}"
        whens += f"WHEN {cond} THEN '{mime}' "
    whens += "".join(
        f"WHEN starts_with({sig}, '{prefix}') THEN '{mime}' "
        for prefix, mime in sorted(MAGIC_TABLE, key=lambda t: -len(t[0])))
    return (f"CASE {whens}"
            f"ELSE 'application/octet-stream' END")
