"""BMP RLE/bitfields/sub-byte and 16-bit netpbm decode validation,
against writers built here from the published format layouts."""

import struct

import numpy as np

from openocr_spark.kernels.media_decode import _luma, decode_bytes


def _bmp_headers(w, h, bpp, compression, data_size, n_pal=0, masks=None,
                 top_down=False):
    pal_bytes = 4 * n_pal
    mask_bytes = 12 if masks else 0
    px_offset = 14 + 40 + mask_bytes + pal_bytes
    filehdr = b"BM" + struct.pack("<IHHI", px_offset + data_size, 0, 0, px_offset)
    infohdr = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, compression,
        data_size, 2835, 2835, n_pal, 0)
    out = filehdr + infohdr
    if masks:
        out += struct.pack("<III", *masks)
    return out


def _pal_bytes(pal_rgb):
    return b"".join(bytes([b, g, r, 0]) for r, g, b in pal_rgb)


def _pal_luma(pal_rgb):
    arr = np.array(pal_rgb, dtype=np.uint8)
    return _luma(arr[:, 0], arr[:, 1], arr[:, 2])


def test_bmp_32bit_bgra():
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    rows = b""
    for y in range(4, -1, -1):  # bottom-up
        for x in range(7):
            r, g, b = rgb[y, x]
            rows += bytes([b, g, r, 0xFF])
    data = _bmp_headers(7, 5, 32, 0, len(rows)) + rows
    out = decode_bytes(data)[0]
    assert np.array_equal(out, _luma(rgb[:, :, 0].astype(np.uint32),
                                     rgb[:, :, 1], rgb[:, :, 2]))


def test_bmp_16bit_555_and_565():
    rng = np.random.RandomState(2)
    r5 = rng.randint(0, 32, (3, 6))
    g6 = rng.randint(0, 64, (3, 6))
    b5 = rng.randint(0, 32, (3, 6))
    # 565 via BI_BITFIELDS
    rows = b""
    for y in range(2, -1, -1):
        vals = (r5[y] << 11) | (g6[y] << 5) | b5[y]
        row = b"".join(struct.pack("<H", int(v)) for v in vals)
        rows += row + b"\x00" * ((-len(row)) % 4)
    data = _bmp_headers(6, 3, 16, 3, len(rows),
                        masks=(0xF800, 0x07E0, 0x001F)) + rows
    out = decode_bytes(data)[0]
    expect = _luma((r5.astype(np.uint32) * 255 // 31).astype(np.uint8),
                   (g6 * 255 // 63).astype(np.uint8),
                   (b5 * 255 // 31).astype(np.uint8))
    assert np.array_equal(out, expect)
    # 555 default (no masks)
    g5 = g6 >> 1
    rows = b""
    for y in range(2, -1, -1):
        vals = (r5[y] << 10) | (g5[y] << 5) | b5[y]
        row = b"".join(struct.pack("<H", int(v)) for v in vals)
        rows += row + b"\x00" * ((-len(row)) % 4)
    data = _bmp_headers(6, 3, 16, 0, len(rows)) + rows
    out = decode_bytes(data)[0]
    expect = _luma((r5.astype(np.uint32) * 255 // 31).astype(np.uint8),
                   (g5 * 255 // 31).astype(np.uint8),
                   (b5 * 255 // 31).astype(np.uint8))
    assert np.array_equal(out, expect)


def test_bmp_4bit_and_1bit_packed():
    pal4 = [(i * 16, 255 - i * 16, i * 5) for i in range(16)]
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 16, (4, 9)).astype(np.uint8)
    rows = b""
    for y in range(3, -1, -1):
        nb = (9 + 1) // 2
        packed = bytearray(nb)
        for x in range(9):
            packed[x >> 1] |= idx[y, x] << (4 if x % 2 == 0 else 0)
        row = bytes(packed)
        rows += row + b"\x00" * ((-len(row)) % 4)
    data = (_bmp_headers(9, 4, 4, 0, len(rows), n_pal=16)
            + _pal_bytes(pal4) + rows)
    assert np.array_equal(decode_bytes(data)[0], _pal_luma(pal4)[idx])

    pal1 = [(255, 255, 255), (0, 0, 0)]
    ink = rng.randint(0, 2, (3, 11)).astype(np.uint8)
    rows = b""
    for y in range(2, -1, -1):
        packed = np.packbits(ink[y]).tobytes()
        rows += packed + b"\x00" * ((-len(packed)) % 4)
    data = (_bmp_headers(11, 3, 1, 0, len(rows), n_pal=2)
            + _pal_bytes(pal1) + rows)
    assert np.array_equal(decode_bytes(data)[0], _pal_luma(pal1)[ink])


def test_bmp_rle8():
    pal = [(i, i, i) for i in range(256)]
    # build rows with runs, literals, EOL, delta, EOF
    w, h = 10, 3
    expect_idx = np.zeros((h, w), dtype=np.uint8)
    stream = bytearray()
    # file row 0 = bottom row (y=2 after flip)
    stream += bytes([5, 7])            # run: five 7s
    expect_idx[0, 0:5] = 7
    stream += bytes([0, 3, 1, 2, 3, 0])  # absolute: 1,2,3 (pad to word)
    expect_idx[0, 5:8] = [1, 2, 3]
    stream += bytes([0, 0])            # EOL
    stream += bytes([0, 2, 2, 1])      # delta: x+=2, y+=1 (skips row 1)
    stream += bytes([4, 9])            # run on row 2
    expect_idx[2, 2:6] = 9
    stream += bytes([0, 1])            # EOF
    data = (_bmp_headers(w, h, 8, 1, len(stream), n_pal=256)
            + _pal_bytes(pal) + bytes(stream))
    out = decode_bytes(data)[0]
    expect = _pal_luma(pal)[expect_idx][::-1]  # bottom-up flip
    assert np.array_equal(out, expect)


def test_bmp_rle4():
    pal = [(i * 17, 0, 255 - i * 17) for i in range(16)]
    w, h = 8, 2
    expect_idx = np.zeros((h, w), dtype=np.uint8)
    stream = bytearray()
    stream += bytes([5, 0x2B])         # run alternating 2,11: 2,11,2,11,2
    expect_idx[0, 0:5] = [2, 11, 2, 11, 2]
    stream += bytes([0, 3, 0x1C, 0x30])  # absolute 1,12,3 (2 bytes, word-aligned)
    expect_idx[0, 5:8] = [1, 12, 3]
    stream += bytes([0, 0])            # EOL
    stream += bytes([6, 0x4F])         # row 1: 4,15,4,15,4,15
    expect_idx[1, 0:6] = [4, 15, 4, 15, 4, 15]
    stream += bytes([0, 1])            # EOF
    data = (_bmp_headers(w, h, 4, 2, len(stream), n_pal=16)
            + _pal_bytes(pal) + bytes(stream))
    out = decode_bytes(data)[0]
    assert np.array_equal(out, _pal_luma(pal)[expect_idx][::-1])


def test_headerless_dib():
    """A .dib (BITMAPINFOHEADER with no BM file header) decodes like
    the equivalent BMP."""
    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, (4, 6, 3)).astype(np.uint8)
    rows = b""
    for y in range(3, -1, -1):
        row = b"".join(bytes([rgb[y, x, 2], rgb[y, x, 1], rgb[y, x, 0]])
                       for x in range(6))
        rows += row + b"\x00" * ((-len(row)) % 4)
    full = _bmp_headers(6, 4, 24, 0, len(rows)) + rows
    dib = full[14:]  # strip the BM file header
    out = decode_bytes(dib)[0]
    assert np.array_equal(out, decode_bytes(full)[0])
    assert np.array_equal(out, _luma(rgb[:, :, 0].astype(np.uint32),
                                     rgb[:, :, 1], rgb[:, :, 2]))


def test_pnm_16bit():
    rng = np.random.RandomState(4)
    v = rng.randint(0, 65536, (6, 9)).astype(np.uint16)
    data = b"P5\n9 6\n65535\n" + v.astype(">u2").tobytes()
    out = decode_bytes(data)[0]
    assert np.array_equal(out, (v.astype(np.uint32) * 255 // 65535).astype(np.uint8))

    rgb = rng.randint(0, 1024, (4, 5, 3)).astype(np.uint16)
    data = b"P6\n5 4\n1023\n" + rgb.astype(">u2").tobytes()
    out = decode_bytes(data)[0]
    u8 = (rgb.astype(np.uint32) * 255 // 1023).astype(np.uint8)
    assert np.array_equal(out, _luma(u8[:, :, 0].astype(np.uint32),
                                     u8[:, :, 1], u8[:, :, 2]))


def test_pnm_ascii_large_maxval():
    vals = [0, 100, 500, 1023]
    data = ("P2\n4 1\n1023\n" + " ".join(map(str, vals))).encode()
    out = decode_bytes(data)[0]
    assert list(out[0]) == [v * 255 // 1023 for v in vals]


def test_pnm_maxval_beyond_legal_fails_loudly():
    # netpbm's legal maximum is 65535; a malformed larger maxval must
    # not fall into the 2-byte path and decode silent garbage
    import pytest

    data = b"P5\n2 1\n100000\n" + b"\x00\x01\x00\x02"
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_bytes(data)
