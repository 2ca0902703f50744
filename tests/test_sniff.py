"""Magic-byte MIME sniffing over binary payloads — REAL codec bytes
(this repo's own PNG/JPEG/WAV encoders) plus adversarial cases."""

from __future__ import annotations

import io
import struct
import wave

from pyspark.sql import functions as F

from ocr_devnagari_spark.codecs import encode_png
from ocr_devnagari_spark.functions.sniff import sniff_mime
from ocr_devnagari_spark.jpegcodec import encode_jpeg


def _wav_bytes() -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<8h", *([1000, -1000] * 4)))
    return buf.getvalue()


def test_sniff_real_payloads(spark):
    px = [(100,)] * 64
    cases = [
        (1, encode_png(px, 8, 8, 1), "image/png"),
        (2, encode_jpeg(px, 8, 8, 1), "image/jpeg"),
        (3, _wav_bytes(), "audio/wav"),
        (4, b"GIF89a\x01\x00\x01\x00...", "image/gif"),
        (5, b"GIF87a\x01\x00...", "image/gif"),
        (6, b"%PDF-1.4 fake", "application/pdf"),
        (7, b"PK\x03\x04zipfile", "application/zip"),
        (8, b"\x1f\x8b\x08gz", "application/gzip"),
        (9, b"<!DOCTYPE html><p>x</p>", "text/html"),
        (10, b"<html><body>y</body>", "text/html"),
        # RIFF but NOT WAVE/WEBP (an AVI) is not audio/wav
        (11, b"RIFF\x10\x00\x00\x00AVI LIST", "application/octet-stream"),
        (12, b"just plain bytes", "application/octet-stream"),
        (13, b"", "application/octet-stream"),
        # JPEG magic is only 3 bytes - any FFD8FF marker variant
        (14, b"\xff\xd8\xff\xdb\x00C", "image/jpeg"),
        (15, b"RIFF\x24\x00\x00\x00WEBPVP8 ", "image/webp"),
        (16, b"\x00\x00\x00\x20ftypisom\x00\x00", "video/mp4"),
        (17, b"\x00\x00\x01\x00\x02\x00\x10\x10", "image/x-icon"),
        # MP4 whose box size collides with ICO's weak magic: the
        # container rule must win
        (18, b"\x00\x00\x01\x00ftypmp42\x00\x00", "video/mp4"),
        (19, b"<!doctype html><p>z</p>", "text/html"),
    ]
    df = spark.createDataFrame([(i, p) for i, p, _ in cases],
                               "id long, payload binary")
    out = df.select("id", sniff_mime(F.col("payload")).alias("mime"))
    got = {r.id: r.mime for r in out.collect()}
    assert got == {i: want for i, _, want in cases}
    # whole-stage codegen, no Python workers
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_classifier_matches_duckdb_mirror(spark):
    """The shared hex classifier agrees with its generated SQL mirror
    on every MAGIC_TABLE prefix and the near-miss variants."""
    import duckdb

    from ocr_devnagari_spark.functions.sniff import (
        MAGIC_TABLE,
        classify_hex,
        classify_hex_sql,
    )

    sigs = [p for p, _ in MAGIC_TABLE]
    sigs += ["52494646AABBCCDD57415645", "52494646AABBCCDD41564920",
             "52494646AABBCCDD57454250", "000000206674797069736F6D",
             "0000010066747970", "FFD8F0", "89504E47", "00FFD8FF", ""]
    df = spark.createDataFrame([(s,) for s in sigs], "sig string")
    got = [r.m for r in
           df.select(classify_hex(F.col("sig")).alias("m")).collect()]
    con = duckdb.connect()
    vals = ", ".join(f"('{s}')" for s in sigs)
    want = [r[0] for r in con.sql(
        f"SELECT {classify_hex_sql('sig')} FROM (VALUES {vals}) "
        f"AS t(sig)").fetchall()]
    assert got == want
    # truncated PNG magic (4 bytes) is NOT png - full 8-byte signature
    assert got[sigs.index("89504E47")] == "application/octet-stream"
