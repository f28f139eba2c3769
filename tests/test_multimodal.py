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


def test_resolve_decoders_modes():
    """Adapter layer (r5): 'stub' always returns the fakes; 'auto' falls
    back per-kind to the stub when the real lib is absent (this container
    has none) and swaps in the real codec when importable."""
    from zopfli_spark.functions import multimodal as mm

    stub = mm.resolve_decoders("stub")
    assert stub["image"] is mm.fake_decode_rgb
    assert stub["video"] is mm.fake_decode_rgb
    auto = mm.resolve_decoders("auto")
    try:
        import PIL  # noqa: F401

        assert auto["image"] is not mm.fake_decode_rgb
    except ImportError:
        assert auto["image"] is mm.fake_decode_rgb
    try:
        import av  # noqa: F401

        assert auto["video"] is not mm.fake_decode_rgb
    except ImportError:
        assert auto["video"] is mm.fake_decode_rgb
    with pytest.raises(ValueError, match="decoder mode"):
        mm.resolve_decoders("real")


def test_extract_features_uses_injected_decoder(spark):
    """An explicit {kind: callable} dict reaches the executor-side dispatch
    — the swap-in contract real deployments use, testable without any media
    lib: the injected decoder returns constant white frames, so mean_luma
    is exactly 255 - epsilon-free."""

    def white(payload, w, h, n_frames=1):
        return np.full((max(n_frames, 1), h, w, 3), 255, dtype=np.uint8)

    media = synth_media_df(spark, 6, seed=5)
    feats = extract_features(
        media, out_w=8, out_h=8, decoders={"image": white, "video": white}
    ).toPandas()
    assert len(feats) == 6
    assert np.allclose(feats.mean_luma, 255.0, atol=0.2)


def test_pillow_decodes_real_png(spark):
    """Real-codec path end-to-end when Pillow exists (skips otherwise):
    a generated 2-color PNG must decode to its actual pixels, not the
    BLAKE2-seeded fake."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    img = Image.new("RGB", (8, 4))
    px = img.load()
    for x in range(8):
        for y in range(4):
            px[x, y] = (255, 255, 255) if x < 4 else (0, 0, 0)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    media = spark.createDataFrame(
        [("p1", "image", buf.getvalue(), 8, 4, 1, 0)],
        "media_id string, kind string, payload binary, width int, height int, n_frames int, sample_rate int",
    )
    r = extract_features(media, out_w=8, out_h=4, decoders="auto").first()
    assert abs(r["mean_luma"] - 127.5) < 1.0  # half white, half black


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
