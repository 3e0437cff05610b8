"""Multimodal plumbing: schema, Arrow batch shape, determinism; real
decode for the dependency-free formats (BMP/PPM), NotImplementedError
for compressed formats (no codec libs offline)."""

import numpy as np
import pytest

from pii_spark.multimodal import (
    decode_image,
    extract_features,
    media_features,
    resize_image,
    with_fake_media,
)


def test_decode_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....", 8, 8)


def _bmp_bytes(pixels: np.ndarray, top_down: bool = False) -> bytes:
    """Handcraft an uncompressed 24-bpp BMP from an HxWx3 RGB array."""
    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    rows = pixels if top_down else pixels[::-1]
    for row in rows:
        line = row[:, ::-1].tobytes()  # RGB → BGR
        raster += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    size = off + len(raster)
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (-h if top_down else h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(header) + bytes(raster)


def test_decode_real_bmp_both_orientations():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    for top_down in (False, True):
        got = decode_image(_bmp_bytes(img, top_down), 3, 5)
        assert got.shape == (5, 3, 3)
        assert (got == img).all()


def test_decode_real_ppm_with_comment():
    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    payload = b"P6\n# a comment\n4 2\n255\n" + img.tobytes()
    got = decode_image(payload, 4, 2)
    assert got.shape == (2, 4, 3)
    assert (got == img).all()


def test_decode_real_bytes_flow_through_features(spark):
    img = np.full((6, 4, 3), 200, dtype=np.uint8)
    payload = b"P6\n4 6\n255\n" + img.tobytes()
    df = spark.createDataFrame(
        [(1, (payload, "image/x-portable-pixmap", 4, 6))],
        "doc_id long, media struct<payload:binary,mime:string,"
        "width:int,height:int>",
    )
    rows = media_features(df, fake_decode=False).collect()
    assert len(rows) == 1
    assert rows[0].mean_px == 200.0
    assert len(rows[0].feat) == 8


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


def test_sample_frames_deterministic():
    from pii_spark.multimodal import sample_frames

    payload = bytes(range(250)) * 4  # 1000 bytes
    frames = sample_frames(payload, frame_size=100, every_n=3)
    # 10 frames of 100 bytes; every 3rd → indices 0,3,6,9
    assert len(frames) == 4
    assert frames[0] == payload[0:100]
    assert frames[1] == payload[300:400]
    with pytest.raises(NotImplementedError):
        sample_frames(payload, frame_size=0)


def test_video_frame_features_spark(spark):
    import numpy as np

    from pii_spark.multimodal import video_frame_features

    payload = bytes([7] * 100) + bytes([9] * 100) + bytes([11] * 100)
    df = spark.createDataFrame(
        [(5, (payload, "video/raw", 0, 0))],
        "doc_id long, media struct<payload:binary,mime:string,"
        "width:int,height:int>",
    )
    rows = video_frame_features(df, frame_size=100, every_n=2).collect()
    # frames 0 and 2 sampled
    assert [(r.frame_idx, r.mean_byte) for r in rows] == [(0, 7.0), (1, 11.0)]
    assert all(r.n_bytes == 100 for r in rows)
    assert np is not None


def test_decode_ppm_rescales_nonstandard_maxval():
    from pii_spark.multimodal import decode_image

    img = np.full((2, 2, 3), 100, dtype=np.uint8)  # full white at maxval=100
    payload = b"P6\n2 2\n100\n" + img.tobytes()
    got = decode_image(payload, 2, 2)
    assert (got == 255).all()
    half = np.full((2, 2, 3), 50, dtype=np.uint8)
    got2 = decode_image(b"P6\n2 2\n100\n" + half.tobytes(), 2, 2)
    assert (got2 == 128).all()  # round(50 * 2.55)


def test_null_media_rows_are_skipped(spark):
    from pii_spark.multimodal import media_features, video_frame_features

    df = spark.createDataFrame(
        [(1, (b"x", "image/fake", 4, 4)), (2, None), (3, None)],
        "doc_id long, media struct<payload:binary,mime:string,"
        "width:int,height:int>",
    )
    rows = media_features(df, fake_decode=True).collect()
    assert [r.doc_id for r in rows] == [1]
    # an ALL-null partition must still produce a schema-valid empty batch
    allnull = df.filter("doc_id > 1").repartition(2)
    assert media_features(allnull, fake_decode=True).count() == 0
    assert video_frame_features(allnull, frame_size=4).count() == 0


def test_encoders_roundtrip_through_decoders():
    """encode_bmp/encode_ppm are exact inverses of the decoders — the
    guarantee that makes the driver's real-decode media rows
    trustworthy."""
    from pii_spark.multimodal import encode_bmp, encode_ppm

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (5, 3), (6, 8), (9, 13)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for enc in (encode_bmp, encode_ppm):
            got = decode_image(enc(img), w, h)
            assert (got == img).all(), (enc.__name__, h, w)


def test_driver_real_decode_rows_match_goldens(spark):
    """The driver-path real-decode rows (q_media_features
    decoder='real') are byte-pinned: sha of the generated payload and
    the decoded mean_px for two fixed doc_ids, computed once and
    committed. Any drift in the generator, encoders, or decoders
    surfaces here."""
    import __spark_entry__ as E

    rows = {
        r.doc_id: r
        for r in E.q_media_features(spark, "/root/testdata/sf0.001")
        .filter("decoder = 'real' AND doc_id IN (200, 201)")
        .collect()
    }
    # (payload sha256[:16], round(img.mean(), 4), n_bytes):
    # doc 200 = 6x12 BMP (54 + 6*36 = 270 B), doc 201 = 7x13 PPM
    golden = {
        200: ("72adbf90e569bfd8", 128.9028, 270),
        201: ("64f31ab55218fd59", 131.3883, 285),
    }
    assert set(rows) == set(golden)
    for d, (sha, mean_px, n_bytes) in golden.items():
        assert rows[d].sha == sha, d
        assert rows[d].mean_px == mean_px, d
        assert rows[d].n_bytes == n_bytes, d
