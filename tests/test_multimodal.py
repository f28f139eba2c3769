"""Multimodal plumbing + winnowing fingerprint tests."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from zopfli_spark.functions.multimodal import (
    extract_features,
    fake_decode_rgb,
    synth_media_df,
)
from zopfli_spark.functions.text import winnow_fingerprints


def test_feature_extraction_shapes(spark):
    media = synth_media_df(spark, 40, seed=3)
    feats = extract_features(media, out_w=16, out_h=16, max_frames=3).toPandas()
    assert len(feats) == 40
    assert (feats.out_width == 16).all() and (feats.out_height == 16).all()
    assert feats.n_frames_sampled.between(1, 3).all()
    # feature blob = float32 16x16 mean-luma plane
    assert {len(b) for b in feats.feature} == {16 * 16 * 4}
    assert feats.mean_luma.between(0, 255).all()
    # videos sample >1 frame, images exactly 1
    v = feats[feats.kind == "video"]
    assert (v.n_frames_sampled > 1).all()
    i = feats[feats.kind == "image"]
    assert (i.n_frames_sampled == 1).all()


def test_feature_extraction_deterministic(spark):
    media = synth_media_df(spark, 20, seed=3)
    a = extract_features(media).orderBy("media_id").toPandas()
    b = extract_features(media.repartition(7)).orderBy("media_id").toPandas()
    assert list(a.mean_luma) == list(b.mean_luma)
    assert [bytes(x) for x in a.feature] == [bytes(x) for x in b.feature]


def test_audio_stub_path(spark):
    a = spark.createDataFrame(
        [("a1", "audio", b"\x01\x02" * 64, 0, 0, 1, 16000)],
        "media_id string, kind string, payload binary, width int, height int, n_frames int, sample_rate int",
    )
    from zopfli_spark.functions.multimodal import extract_features as ef

    r = ef(a, out_w=8, out_h=8).first()
    assert r["n_frames_sampled"] == 1 and len(r["feature"]) == 8 * 8 * 4
    assert 0 <= r["mean_luma"] <= 255


def test_unknown_kind_fails_loudly(spark):
    bad = spark.createDataFrame(
        [("m1", "weird3d", b"\x00" * 64, 8, 8, 1, 16000)],
        "media_id string, kind string, payload binary, width int, height int, n_frames int, sample_rate int",
    )
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        extract_features(bad).collect()


def test_fake_decode_is_deterministic():
    a = fake_decode_rgb(b"abc", 4, 5, 2)
    b = fake_decode_rgb(b"abc", 4, 5, 2)
    c = fake_decode_rgb(b"abd", 4, 5, 2)
    assert a.shape == (2, 5, 4, 3)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_winnow_fingerprints_detect_duplication(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "a completely different sentence with nothing shared at all!"),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=8, window=4).toPandas()
    s1 = set(fp[fp.doc_id == 1].fingerprint)
    s2 = set(fp[fp.doc_id == 2].fingerprint)
    s3 = set(fp[fp.doc_id == 3].fingerprint)
    assert s1 == s2  # identical docs → identical fingerprint sets
    assert len(s1 & s3) / len(s1 | s3) < 0.2  # unrelated docs ≈ disjoint
