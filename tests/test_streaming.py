"""Streaming incremental ingest: new files extract incrementally with
exactly-once semantics; output matches the golden oracle byte-for-byte."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from ocr_devnagari_spark.corpus import write_corpus
from ocr_devnagari_spark.goldenref import golden_extract_corpus
from ocr_devnagari_spark.streaming.ingest import stream_extract_available_now


@pytest.fixture()
def staged(tmp_path):
    """A corpus split into two parquet files, landed one at a time."""
    src = str(tmp_path / "gen")
    write_corpus(src, 400, workers=2)       # → directory with ≥2 part files
    parts = sorted(glob.glob(os.path.join(src, "pages.parquet", "*.parquet")))
    assert len(parts) >= 2
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    return src, parts, landing, str(tmp_path / "out"), str(tmp_path / "cp")


def test_incremental_extraction_exactly_once(spark, staged):
    src, parts, landing, out_dir, cp_dir = staged
    half = len(parts) // 2

    # land first half of the files
    for p in parts[:half]:
        shutil.copy(p, landing)
    n1 = stream_extract_available_now(spark, landing, out_dir, cp_dir)
    assert n1 >= 1
    got1 = spark.read.parquet(out_dir)
    n_first = got1.count()
    assert n_first == sum(pq.ParquetFile(p).metadata.num_rows
                          for p in parts[:half])

    # draining again with no new files: zero new rows (exactly-once)
    stream_extract_available_now(spark, landing, out_dir, cp_dir)
    assert spark.read.parquet(out_dir).count() == n_first

    # land the remainder; only the new files are processed
    for p in parts[half:]:
        shutil.copy(p, landing)
    stream_extract_available_now(spark, landing, out_dir, cp_dir)
    got = spark.read.parquet(out_dir)
    total = sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
    assert got.count() == total
    assert got.select("url").distinct().count() == total

    # byte-identity against the golden oracle
    golden = pq.read_table(golden_extract_corpus(src))
    gmap = dict(zip(golden.column("url").to_pylist(),
                    golden.column("text").to_pylist()))
    for r in got.select("url", "text").collect():
        assert r.text == gmap[r.url]
