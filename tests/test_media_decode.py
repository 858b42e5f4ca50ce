"""Multimodal plumbing tests: fake-codec roundtrip, 1→N page explosion,
feature extraction batch shapes, and the NotImplementedError stub gate."""

import numpy as np
import pytest

from openocr_spark.kernels.media_decode import (
    decode_bytes,
    decode_media,
    encode_fake,
    extract_features,
)


def _pages(seed, n):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 255, size=(8, 12)).astype(np.uint8) for _ in range(n)]


def test_fake_codec_roundtrip():
    pages = _pages(1, 3)
    out = decode_bytes(encode_fake(pages))
    assert len(out) == 3
    for a, b in zip(pages, out):
        assert np.array_equal(a, b)


def test_real_codec_stubbed():
    with pytest.raises(NotImplementedError):
        decode_bytes(b"\x89PNG\r\n\x1a\n....")


def test_decode_media_explodes_pages(spark):
    rows = [
        ("d1", "m1", bytearray(encode_fake(_pages(1, 2)))),
        ("d2", "m2", bytearray(encode_fake(_pages(2, 1)))),
    ]
    df = spark.createDataFrame(rows, "doc_id string, media_ref string, content binary")
    out = decode_media(df)
    got = [(r["media_ref"], r["page_no"], r["height"], r["width"]) for r in out.collect()]
    assert sorted(got) == [("m1", 0, 8, 12), ("m1", 1, 8, 12), ("m2", 0, 8, 12)]


def test_extract_features(spark):
    pages = _pages(7, 1)
    df = spark.createDataFrame(
        [("d1", "m1", bytearray(encode_fake(pages)))],
        "doc_id string, media_ref string, content binary",
    )
    feats = extract_features(decode_media(df)).collect()[0]
    assert feats["mean_px"] == pytest.approx(float(pages[0].mean()), abs=1e-9)
    assert feats["std_px"] == pytest.approx(float(pages[0].std()), abs=1e-9)
    assert 0.9 <= feats["nonzero_frac"] <= 1.0
