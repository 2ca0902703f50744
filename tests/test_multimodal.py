"""Multimodal plumbing: schema, batch shape, determinism, stub gating."""

from __future__ import annotations

import pytest

from ocr_devnagari_spark.operators.multimodal import (
    FEATURE_DIM,
    frame_sample_stage,
    image_feature_stage,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(f"m{i}", "image", bytes([i % 251]) * (100 + i * 37), "image/fake")
            for i in range(40)]
    return spark.createDataFrame(
        rows, "media_id string, kind string, payload binary, mime string") \
        .cache()


def test_image_features_schema_and_determinism(spark, media):
    out1 = {r.media_id: r for r in image_feature_stage(media).collect()}
    out2 = {r.media_id: r for r in
            image_feature_stage(media.repartition(5)).collect()}
    assert len(out1) == 40
    for mid, r in out1.items():
        assert len(r.features) == FEATURE_DIM
        assert r.n_bytes == len(bytes([int(mid[1:]) % 251])) * (
            100 + int(mid[1:]) * 37)
        r2 = out2[mid]
        assert (r.width, r.height, r.phash) == (r2.width, r2.height, r2.phash)
        assert r.features == r2.features


def test_frame_sampling_one_to_many(spark, media):
    frames = frame_sample_stage(media, every_ms=500, max_frames=4).collect()
    by_id = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f)
    assert set(by_id) == {f"m{i}" for i in range(40)}
    for mid, fs in by_id.items():
        assert 1 <= len(fs) <= 4
        idxs = sorted(f.frame_idx for f in fs)
        assert idxs == list(range(len(fs)))
        for f in fs:
            assert f.ts_ms == f.frame_idx * 500


def test_real_decode_is_explicitly_stubbed(spark, media):
    with pytest.raises(Exception) as ei:
        image_feature_stage(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)
