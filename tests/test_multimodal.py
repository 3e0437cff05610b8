"""Multimodal plumbing: schema, Arrow batch shape, determinism; decode
itself is stubbed (no media libs offline)."""

import numpy as np
import pytest

from pii_spark.multimodal import (
    decode_image,
    extract_features,
    media_features,
    resize_image,
    with_fake_media,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", 8, 8)


def test_fake_decode_deterministic():
    a = decode_image(b"payload", 16, 12, deterministic_fake=True)
    b = decode_image(b"payload", 16, 12, deterministic_fake=True)
    assert a.shape == (12, 16, 3) and a.dtype == np.uint8
    assert (a == b).all()
    c = decode_image(b"other", 16, 12, deterministic_fake=True)
    assert (a != c).any()


def test_resize_and_features():
    img = decode_image(b"x", 32, 32, deterministic_fake=True)
    small = resize_image(img, (4, 2))
    assert small.shape == (4, 2, 3)
    feat = extract_features(img)
    assert feat.shape == (8,) and feat.dtype == np.float32
    assert ((feat >= 0) & (feat <= 1)).all()


def test_media_features_spark(spark):
    from pii_spark.spark.gen_job import generate_corpus

    df = with_fake_media(
        generate_corpus(spark, 40).select("doc_id", "text")
    )
    feats = media_features(df).collect()
    assert len(feats) == 40
    by_id = {r.doc_id: r for r in feats}
    for r in feats:
        assert len(r.feat) == 8
        assert len(r.sha) == 16
        assert r.n_bytes > 0
    # partition-count independent (determinism across physical layouts)
    feats2 = media_features(df.repartition(7)).collect()
    assert {(r.doc_id, r.sha, r.mean_px) for r in feats2} == {
        (r.doc_id, r.sha, r.mean_px) for r in feats
    }
    assert by_id  # plumbing exercised end to end
