"""TIFF decode validation: every (compression × photometric × layout)
cell is round-tripped through the INDEPENDENT test-side encoder
(tests/tiff_ref_encoder.py — own bit writer, own G3/G4 mode selection,
own LZW table growth, own IFD serialization; only the spec-fixed T.4
code tables are shared), standalone and through the Spark decode path.
"""

import numpy as np
import pytest

from openocr_spark.kernels.media_decode import decode_bytes
from openocr_spark.kernels.tiff_format import (
    decode_ccitt,
    decode_tiff,
    packbits_decode,
    tiff_lzw_decode,
)
from tests.tiff_ref_encoder import (
    encode_ccitt,
    lzw_encode,
    packbits_encode,
    write_tiff,
)


def _gray(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)


def _rgb(h, w, seed=1):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


def _doc_bilevel(h, w, seed=2):
    """Document-like bilevel page: sparse black text-ish runs on white."""
    rng = np.random.RandomState(seed)
    ink = np.zeros((h, w), dtype=bool)
    for _ in range(h * w // 40):
        y, x = rng.randint(0, h), rng.randint(0, w)
        ln = rng.randint(1, 9)
        ink[y, x : x + ln] = True
    return ink


# ------------------------------------------------------------- container


@pytest.mark.parametrize("bo", ["<", ">"])
def test_uncompressed_gray_both_byte_orders(bo):
    px = _gray(23, 31)
    out = decode_tiff(write_tiff([{"pixels": px}], byte_order=bo))
    assert len(out) == 1
    assert np.array_equal(out[0], px)


def test_rgb_strips():
    px = _rgb(25, 17)
    out = decode_tiff(write_tiff([{"pixels": px, "rows_per_strip": 7}]))
    assert np.array_equal(out[0], px)


def test_16bit_high_byte_convention():
    px16 = (np.arange(16 * 9).reshape(16, 9) * 251 % 65536).astype(np.uint16)
    out = decode_tiff(write_tiff([{"pixels": px16}]))
    assert np.array_equal(out[0], (px16 >> 8).astype(np.uint8))


def test_16bit_big_endian():
    px16 = (np.arange(8 * 11).reshape(8, 11) * 997 % 65536).astype(np.uint16)
    out = decode_tiff(write_tiff([{"pixels": px16}], byte_order=">"))
    assert np.array_equal(out[0], (px16 >> 8).astype(np.uint8))


def test_bilevel_uncompressed_photometrics():
    ink = _doc_bilevel(14, 37)
    # BlackIsZero: sample 1 = white
    blk0 = write_tiff([{"pixels": ~ink, "photometric": 1}])
    assert np.array_equal(decode_tiff(blk0)[0], np.where(ink, 0, 255))
    # WhiteIsZero: sample 1 = black
    wht0 = write_tiff([{"pixels": ink, "photometric": 0}])
    assert np.array_equal(decode_tiff(wht0)[0], np.where(ink, 0, 255))


def test_4bit_gray():
    px4 = (np.arange(9 * 13).reshape(9, 13) % 16).astype(np.uint8)
    out = decode_tiff(write_tiff([{"pixels": px4, "bps": 4, "photometric": 1}]))
    expect = ((px4.astype(np.uint16) * 255 + 7) // 15).astype(np.uint8)
    assert np.array_equal(out[0], expect)


@pytest.mark.parametrize("bps", [4, 8])
def test_palette(bps):
    n = 1 << bps
    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (3, n)).astype(np.uint8)
    idx = rng.randint(0, n, (11, 18)).astype(np.uint8)
    out = decode_tiff(write_tiff([{"pixels": idx, "bps": bps, "palette": pal}]))
    expect = np.stack([pal[c][idx] for c in range(3)], axis=2)
    assert np.array_equal(out[0], expect)


def test_cmyk_composites_like_jpeg_path():
    rng = np.random.RandomState(7)
    ink = rng.randint(0, 256, (10, 12, 4)).astype(np.uint8)
    out = decode_tiff(write_tiff([{"pixels": ink}]))
    c, m, y, k = (ink[:, :, i].astype(np.uint16) for i in range(4))
    expect = np.stack(
        [((255 - c) * (255 - k)) // 255,
         ((255 - m) * (255 - k)) // 255,
         ((255 - y) * (255 - k)) // 255], axis=2).astype(np.uint8)
    assert np.array_equal(out[0], expect)


# ------------------------------------------------------------ compressions


def test_packbits_codec_raw():
    rng = np.random.RandomState(3)
    row = bytes(rng.choice([0, 0, 0, 255, 17], size=200).astype(np.uint8))
    assert packbits_decode(packbits_encode(row), len(row)) == row


def test_packbits_tiff():
    px = _gray(19, 33, seed=4)
    px[:, 5:20] = 200  # runs for the replicate path
    out = decode_tiff(write_tiff([{"pixels": px, "compression": 32773,
                                   "rows_per_strip": 5}]))
    assert np.array_equal(out[0], px)


def test_lzw_codec_raw_roundtrip_exercises_width_growth():
    rng = np.random.RandomState(9)
    data = bytes(rng.randint(0, 256, 30000).astype(np.uint8))  # incompressible
    assert tiff_lzw_decode(lzw_encode(data), len(data)) == data
    rle = bytes(np.repeat(rng.randint(0, 8, 500), 13).astype(np.uint8))
    assert tiff_lzw_decode(lzw_encode(rle), len(rle)) == rle


def test_lzw_tiff_gray_and_rgb():
    g = _gray(21, 29, seed=11)
    out = decode_tiff(write_tiff([{"pixels": g, "compression": 5}]))
    assert np.array_equal(out[0], g)
    c = _rgb(15, 10, seed=12)
    out = decode_tiff(write_tiff([{"pixels": c, "compression": 5,
                                   "rows_per_strip": 4}]))
    assert np.array_equal(out[0], c)


def test_deflate_with_predictor():
    c = _rgb(18, 22, seed=13)
    out = decode_tiff(write_tiff([{"pixels": c, "compression": 8,
                                   "predictor": 2}]))
    assert np.array_equal(out[0], c)
    g16 = (np.arange(12 * 15).reshape(12, 15) * 4111 % 65536).astype(np.uint16)
    out = decode_tiff(write_tiff([{"pixels": g16, "compression": 8,
                                   "predictor": 2, "rows_per_strip": 5}]))
    assert np.array_equal(out[0], (g16 >> 8).astype(np.uint8))


# ------------------------------------------------------------------ CCITT


@pytest.mark.parametrize("comp", [2, 3, 4])
def test_ccitt_roundtrip_modes(comp):
    ink = _doc_bilevel(20, 41, seed=comp)
    data = encode_ccitt(ink, comp)
    out = decode_ccitt(data, 41, 20, comp)
    assert np.array_equal(out.astype(bool), ink)


def test_g3_2d_rows():
    ink = _doc_bilevel(16, 53, seed=21)
    data = encode_ccitt(ink, 3, t4_2d=True)
    out = decode_ccitt(data, 53, 16, 3, t4_options=1)
    assert np.array_equal(out.astype(bool), ink)


def test_ccitt_edge_rows():
    # all-white, all-black, single-pixel columns, width not multiple of 8
    ink = np.zeros((6, 19), dtype=bool)
    ink[1, :] = True
    ink[2, 0] = True
    ink[3, 18] = True
    ink[4, ::2] = True
    for comp in (2, 3, 4):
        out = decode_ccitt(encode_ccitt(ink, comp), 19, 6, comp)
        assert np.array_equal(out.astype(bool), ink), f"comp {comp}"


def test_ccitt_photometric_1_inverts():
    """PhotometricInterpretation=1 (BlackIsZero) on a fax page inverts
    the rendered polarity vs the fax-default photometric 0 (TIFF6),
    matching libtiff/cv2 and the module's own uncompressed bilevel
    path — the same encoded runs must flip with the tag."""
    ink = _doc_bilevel(12, 37, seed=31)
    pages = {}
    for photo in (0, 1):
        t = write_tiff([{"pixels": ink, "compression": 4,
                         "photometric": photo}])
        pages[photo] = decode_tiff(t)[0]
    assert np.array_equal(pages[0], np.where(ink, 0, 255))
    assert np.array_equal(pages[1], np.where(ink, 255, 0))
    assert np.array_equal(pages[0], 255 - pages[1])


def test_ccitt_missing_photometric_defaults_min_is_white():
    """Fax pages that omit tag 262 entirely (real scanners do) must
    default to MinIsWhite — libtiff's 'assuming min-is-white' — so ink
    renders black, identical to an explicit photometric 0."""
    ink = _doc_bilevel(10, 33, seed=41)
    t = write_tiff([{"pixels": ink, "compression": 4,
                     "omit_photometric": True}])
    out = decode_tiff(t)[0]
    explicit = decode_tiff(write_tiff(
        [{"pixels": ink, "compression": 4, "photometric": 0}]))[0]
    assert np.array_equal(out, explicit)
    assert np.array_equal(out, np.where(ink, 0, 255))


def test_g4_tiff_multistrip_and_fill_order():
    ink = _doc_bilevel(30, 64, seed=31)
    t = write_tiff([{"pixels": ink, "compression": 4, "rows_per_strip": 8}])
    assert np.array_equal(decode_tiff(t)[0], np.where(ink, 0, 255))
    t2 = write_tiff([{"pixels": ink, "compression": 4, "fill_order": 2}])
    assert np.array_equal(decode_tiff(t2)[0], np.where(ink, 0, 255))


def test_mh_and_g3_tiff():
    ink = _doc_bilevel(12, 80, seed=41)
    for kwargs in ({"compression": 2}, {"compression": 3},
                   {"compression": 3, "t4_2d": True}):
        t = write_tiff([{"pixels": ink, "rows_per_strip": 5, **kwargs}])
        out = decode_tiff(t)
        assert np.array_equal(out[0], np.where(ink, 0, 255)), kwargs


# ------------------------------------------------------------------ layout


def test_tiled_rgb():
    px = _rgb(33, 45, seed=51)
    out = decode_tiff(write_tiff([{"pixels": px, "tile": (16, 16),
                                   "compression": 5}]))
    assert np.array_equal(out[0], px)


def test_tiled_g4():
    ink = _doc_bilevel(40, 48, seed=52)
    out = decode_tiff(write_tiff([{"pixels": ink, "compression": 4,
                                   "tile": (16, 16)}]))
    assert np.array_equal(out[0], np.where(ink, 0, 255))


def test_planar_rgb():
    px = _rgb(14, 21, seed=53)
    out = decode_tiff(write_tiff([{"pixels": px, "planar": 2,
                                   "rows_per_strip": 6}]))
    assert np.array_equal(out[0], px)


def test_multipage_chain():
    pages = [
        {"pixels": _gray(9, 9, seed=61)},
        {"pixels": _doc_bilevel(9, 17, seed=62), "compression": 4},
        {"pixels": _rgb(7, 8, seed=63), "compression": 5},
    ]
    out = decode_tiff(write_tiff(pages))
    assert len(out) == 3
    assert np.array_equal(out[0], pages[0]["pixels"])
    assert np.array_equal(out[1], np.where(pages[1]["pixels"], 0, 255))
    assert np.array_equal(out[2], pages[2]["pixels"])


# ------------------------------------------------------------ JPEG-in-TIFF


def _jpeg_stream(px, **kw):
    from tests.jpeg_ref_encoder import encode_jpeg

    return encode_jpeg(px, qtable=[1] * 64, **kw)


@pytest.mark.parametrize("split", [False, True])
def test_jpeg_in_tiff_gray(split):
    px = _gray(24, 32, seed=71)
    stream = _jpeg_stream(px)
    t = write_tiff([{"pixels": px, "compression": 7, "photometric": 1,
                     "jpeg_bytes": stream, "jpeg_split_tables": split}])
    out = decode_tiff(t)[0]
    from openocr_spark.kernels.jpeg_format import decode_jpeg

    assert np.array_equal(out, decode_jpeg(stream, apply_orientation=False))
    assert np.mean(np.abs(out.astype(int) - px.astype(int))) < 2.0


def test_jpeg_in_tiff_ycbcr():
    px = _rgb(16, 24, seed=72)
    stream = _jpeg_stream(px)
    t = write_tiff([{"pixels": px, "compression": 7, "photometric": 6,
                     "jpeg_bytes": stream}])
    out = decode_tiff(t)[0]
    assert out.shape == (16, 24, 3)
    assert np.mean(np.abs(out.astype(int) - px.astype(int))) < 4.0


def test_jpeg_in_tiff_cmyk():
    """A CMYK (spp=4, photometric 5) page whose strips are a
    4-component JPEG stream — the layout Adobe writers emit. The
    decoded JPEG lands as RGB (APP14 handling inside decode_jpeg), so
    the page canvas must follow the decoded channel count instead of
    the spp tag (which used to raise a numpy broadcast ValueError)."""
    from jpeg_ref_encoder import encode_jpeg
    from openocr_spark.kernels.jpeg_format import decode_jpeg

    rng = np.random.RandomState(73)
    cmyk = (rng.rand(16, 24, 4) * 255).astype(np.uint8)
    stream = encode_jpeg(cmyk, qtable=[1] * 64)
    t = write_tiff([{"pixels": cmyk, "compression": 7, "photometric": 5,
                     "jpeg_bytes": stream}])
    out = decode_tiff(t)[0]
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out, decode_jpeg(stream, apply_orientation=False))


def test_old_style_jpeg_fails_loudly():
    px = _gray(8, 8)
    t = write_tiff([{"pixels": px, "compression": 7, "photometric": 1,
                     "jpeg_bytes": _jpeg_stream(px)}])
    bad = bytearray(t)
    # flip the compression SHORT 7 → 6 wherever the IFD wrote it
    idx = bad.find((259).to_bytes(2, "little"))
    assert idx >= 0
    assert bad[idx + 8] == 7
    bad[idx + 8] = 6
    with pytest.raises(NotImplementedError, match="old-style"):
        decode_tiff(bytes(bad))


# ------------------------------------------------------------- Spark path


def test_tiff_through_spark_decode(spark):
    from openocr_spark.kernels.media_decode import decode_media

    gray = _gray(12, 16, seed=81)
    ink = _doc_bilevel(10, 33, seed=82)
    multi = write_tiff([{"pixels": gray},
                        {"pixels": ink, "compression": 4}])
    rgb = _rgb(9, 11, seed=83)
    single = write_tiff([{"pixels": rgb, "compression": 5}], byte_order=">")
    rows = [("d1", "m1", bytearray(multi)), ("d2", "m2", bytearray(single))]
    df = spark.createDataFrame(rows, "doc_id string, media_ref string, content binary")
    got = decode_media(df).orderBy("doc_id", "page_no").collect()
    assert [(r.doc_id, r.page_no, r.height, r.width) for r in got] == [
        ("d1", 0, 12, 16), ("d1", 1, 10, 33), ("d2", 0, 9, 11)]
    assert np.array_equal(
        np.frombuffer(got[0].pixels, np.uint8).reshape(12, 16), gray)


def test_package_sink_roundtrip():
    """The minimal package WRITE sink (encode_tiff_pages — the
    decode_roundtrip driver query's TIFF leg) round-trips bit-exact."""
    from openocr_spark.kernels.tiff_format import encode_tiff_pages

    gray = _gray(11, 15, seed=91)
    ink = _doc_bilevel(9, 14, seed=92)
    pages = decode_tiff(encode_tiff_pages(gray, ink))
    assert len(pages) == 2
    assert np.array_equal(pages[0], gray)
    assert np.array_equal(pages[1], np.where(ink, 0, 255))


def test_magic_dispatch():
    px = _gray(6, 6)
    pages = decode_bytes(write_tiff([{"pixels": px}]))
    assert len(pages) == 1 and np.array_equal(pages[0], px)
    pages = decode_bytes(write_tiff([{"pixels": px}], byte_order=">"))
    assert np.array_equal(pages[0], px)
