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


# --- real formats (VERDICT r2 item 6): hand-built bytes, no image libs ------


def _make_pgm_p5(px):
    h, w = px.shape
    return f"P5\n# comment\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


def _make_pgm_p2(px):
    h, w = px.shape
    body = "\n".join(" ".join(str(v) for v in row) for row in px.tolist())
    return f"P2\n{w} {h}\n255\n{body}\n".encode()


def _make_ppm_p6(rgb):
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode() + rgb.astype(np.uint8).tobytes()


def _make_bmp24(rgb, top_down=False):
    """Hand-assembled uncompressed 24-bit BMP (BGR, 4-byte row pad)."""
    import struct

    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3
    img = b""
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        row = b"".join(
            bytes([rgb[y, x, 2], rgb[y, x, 1], rgb[y, x, 0]]) for x in range(w)
        )
        img += row + b"\x00" * (row_bytes - len(row))
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(img), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(img), 2835, 2835, 0, 0,
    )
    return header + info + img


def _make_bmp8(idx, palette):
    """8-bit palette BMP: palette entries are (B,G,R,0)."""
    import struct

    h, w = idx.shape
    row_bytes = (w + 3) & ~3
    img = b""
    for y in range(h - 1, -1, -1):
        row = bytes(idx[y].tolist())
        img += row + b"\x00" * (row_bytes - len(row))
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    off = 14 + 40 + len(pal)
    header = b"BM" + struct.pack("<IHHI", off + len(img), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(img), 2835, 2835, len(palette), 0,
    )
    return header + info + pal + img


def _luma_ref(rgb):
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def test_pgm_p5_decodes_exact():
    px = np.arange(48, dtype=np.uint8).reshape(6, 8)
    (out,) = decode_bytes(_make_pgm_p5(px))
    assert np.array_equal(out, px)


def test_pgm_p2_ascii_decodes_exact():
    px = (np.arange(30, dtype=np.uint8) * 7 % 256).astype(np.uint8).reshape(5, 6)
    (out,) = decode_bytes(_make_pgm_p2(px))
    assert np.array_equal(out, px)


def test_ppm_p6_luma():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 255, size=(4, 5, 3)).astype(np.uint8)
    (out,) = decode_bytes(_make_ppm_p6(rgb))
    assert np.array_equal(out, _luma_ref(rgb))


def test_bmp24_bottom_up_and_top_down():
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 255, size=(5, 7, 3)).astype(np.uint8)
    (up,) = decode_bytes(_make_bmp24(rgb, top_down=False))
    (down,) = decode_bytes(_make_bmp24(rgb, top_down=True))
    want = _luma_ref(rgb)
    assert np.array_equal(up, want)
    assert np.array_equal(down, want)


def test_bmp8_palette():
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (255, 255, 255)]
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    (out,) = decode_bytes(_make_bmp8(idx, palette))
    want = np.array(
        [[_luma_ref(np.array([[p]], dtype=np.uint8))[0, 0] for p in
          [palette[i] for i in row]] for row in idx.tolist()]
    )
    assert np.array_equal(out, want)


def test_real_format_through_spark_extract(spark):
    """A real-format (PGM/BMP) payload flows through the distributed
    decode + feature extraction end-to-end."""
    px = np.full((6, 8), 100, dtype=np.uint8)
    px[0, 0] = 0
    rng = np.random.RandomState(9)
    rgb = rng.randint(1, 255, size=(4, 4, 3)).astype(np.uint8)
    rows = [
        ("d1", "m1.pgm", bytearray(_make_pgm_p5(px))),
        ("d2", "m2.bmp", bytearray(_make_bmp24(rgb))),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, media_ref string, content binary"
    )
    feats = {r.media_ref: r for r in extract_features(decode_media(df)).collect()}
    assert set(feats) == {"m1.pgm", "m2.bmp"}
    f1 = feats["m1.pgm"]
    assert f1.page_no == 0
    assert abs(f1.mean_px - (100 * 47 / 48)) < 1e-9
    assert abs(f1.nonzero_frac - 47 / 48) < 1e-12
    f2 = feats["m2.bmp"]
    assert abs(f2.mean_px - float(_luma_ref(rgb).mean())) < 1e-9
