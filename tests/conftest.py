"""Shared fixtures: one SparkSession per test run, small corpora, golden."""

from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_devnagari_spark.corpus import write_corpus  # noqa: E402
from ocr_devnagari_spark.goldenref import golden_extract_corpus  # noqa: E402
from ocr_devnagari_spark.session import get_spark  # noqa: E402

TEST_CORPUS_DOCS = 600


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ocrds-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(d, TEST_CORPUS_DOCS)
    return d


@pytest.fixture(scope="session")
def golden_path(corpus_dir):
    return golden_extract_corpus(corpus_dir)


@pytest.fixture()
def work_root(tmp_path):
    d = str(tmp_path / "ocrds")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
