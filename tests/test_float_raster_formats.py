"""PFM / Sun Raster / Radiance HDR decode validation. Each format is
round-tripped through a test-side writer implemented here from the
published format descriptions (netpbm PFM page, Sun rasterfile.h,
Radiance filefmts doc) — independent of the package parsers.
"""

import struct

import numpy as np

from openocr_spark.kernels.media_decode import _luma, decode_bytes


# ------------------------------------------------------------------- PFM


def _write_pfm(img: np.ndarray, scale: float = -1.0) -> bytes:
    """img: (h,w) or (h,w,3) float32 in [0, |scale|]."""
    color = img.ndim == 3
    h, w = img.shape[:2]
    head = b"PF\n" if color else b"Pf\n"
    head += f"{w} {h}\n".encode() + f"{scale}\n".encode()
    dt = np.dtype(np.float32).newbyteorder("<" if scale < 0 else ">")
    return head + img[::-1].astype(dt).tobytes()  # bottom-up rows


def test_pfm_gray_little_endian():
    rng = np.random.RandomState(1)
    f = rng.rand(9, 13).astype(np.float32)
    out = decode_bytes(_write_pfm(f, -1.0))
    assert len(out) == 1
    expect = np.clip(f * 255.0 + 0.5, 0, 255).astype(np.uint8)
    assert np.array_equal(out[0], expect)


def test_pfm_color_big_endian_scaled():
    rng = np.random.RandomState(2)
    f = (rng.rand(7, 11, 3) * 4.0).astype(np.float32)
    out = decode_bytes(_write_pfm(f, 4.0))[0]
    u8 = np.clip(f / 4.0 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    expect = _luma(u8[:, :, 0], u8[:, :, 1], u8[:, :, 2])
    assert np.array_equal(out, expect)


def test_pfm_values_above_scale_clamp():
    f = np.array([[0.0, 0.5, 1.0, 2.5]], dtype=np.float32)
    out = decode_bytes(_write_pfm(f, -1.0))[0]
    assert list(out[0]) == [0, 128, 255, 255]


# ------------------------------------------------------------- Sun Raster


def _ras_header(w, h, depth, length, rastype, maptype=0, maplen=0) -> bytes:
    return struct.pack(">8I", 0x59A66A95, w, h, depth, length, rastype,
                       maptype, maplen)


def _pad16(row: bytes) -> bytes:
    return row + b"\x00" * ((-len(row)) % 2)


def test_ras_8bit_gray_raw():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (6, 9)).astype(np.uint8)
    body = b"".join(_pad16(px[y].tobytes()) for y in range(6))
    data = _ras_header(9, 6, 8, len(body), 1) + body
    assert np.array_equal(decode_bytes(data)[0], px)


def test_ras_8bit_palette():
    rng = np.random.RandomState(4)
    pal = rng.randint(0, 256, (3, 16)).astype(np.uint8)
    idx = rng.randint(0, 16, (5, 8)).astype(np.uint8)
    body = b"".join(_pad16(idx[y].tobytes()) for y in range(5))
    data = (_ras_header(8, 5, 8, len(body), 1, maptype=1, maplen=48)
            + pal.tobytes() + body)
    expect = _luma(pal[0][idx], pal[1][idx], pal[2][idx])
    assert np.array_equal(decode_bytes(data)[0], expect)


def test_ras_24bit_bgr():
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (4, 7, 3)).astype(np.uint8)
    bgr = rgb[:, :, ::-1]
    body = b"".join(_pad16(bgr[y].tobytes()) for y in range(4))
    data = _ras_header(7, 4, 24, len(body), 1) + body
    expect = _luma(rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2])
    assert np.array_equal(decode_bytes(data)[0], expect)


def test_ras_1bit():
    ink = np.zeros((3, 10), dtype=np.uint8)
    ink[0, 0] = ink[1, 9] = ink[2, 4] = 1
    rows = []
    for y in range(3):
        packed = np.packbits(ink[y])
        rows.append(_pad16(packed.tobytes()))
    body = b"".join(rows)
    data = _ras_header(10, 3, 1, len(body), 1) + body
    assert np.array_equal(decode_bytes(data)[0], np.where(ink > 0, 0, 255))


def _rle_encode_ras(raw: bytes) -> bytes:
    """RT_BYTE_ENCODED: 0x80 0x00 = literal 0x80; 0x80 n b = b×(n+1)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        n = 1
        while i + n < len(raw) and raw[i + n] == b and n < 256:
            n += 1
        if n >= 2:
            out += bytes([0x80, n - 1, b])
            i += n
        elif b == 0x80:
            out += b"\x80\x00"
            i += 1
        else:
            out.append(b)
            i += 1
    return bytes(out)


def test_ras_rle():
    rng = np.random.RandomState(6)
    px = rng.choice([0, 0, 0, 128, 255, 7], size=(6, 12)).astype(np.uint8)
    raw = b"".join(_pad16(px[y].tobytes()) for y in range(6))
    body = _rle_encode_ras(raw)
    data = _ras_header(12, 6, 8, len(body), 2) + body
    assert np.array_equal(decode_bytes(data)[0], px)


# ---------------------------------------------------------------- HDR


def _float2rgbe(rgb: np.ndarray) -> np.ndarray:
    """Canonical Radiance float→RGBE (frexp on the max channel)."""
    h, w, _ = rgb.shape
    out = np.zeros((h, w, 4), dtype=np.uint8)
    mx = rgb.max(axis=2)
    nz = mx > 1e-32
    mant, exp = np.frexp(mx)
    scale = np.where(nz, mant * 256.0 / np.maximum(mx, 1e-32), 0.0)
    out[:, :, 0] = np.clip(rgb[:, :, 0] * scale, 0, 255).astype(np.uint8)
    out[:, :, 1] = np.clip(rgb[:, :, 1] * scale, 0, 255).astype(np.uint8)
    out[:, :, 2] = np.clip(rgb[:, :, 2] * scale, 0, 255).astype(np.uint8)
    out[:, :, 3] = np.where(nz, exp + 128, 0).astype(np.uint8)
    return out


def _write_hdr_flat(rgbe: np.ndarray) -> bytes:
    h, w, _ = rgbe.shape
    head = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
    head += f"-Y {h} +X {w}\n".encode()
    return head + rgbe.tobytes()


def _write_hdr_rle(rgbe: np.ndarray) -> bytes:
    """New-style per-channel RLE scanlines (0x02 0x02 len_hi len_lo)."""
    h, w, _ = rgbe.shape
    head = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
    head += f"-Y {h} +X {w}\n".encode()
    body = bytearray()
    for y in range(h):
        body += bytes([2, 2, w >> 8, w & 0xFF])
        for c in range(4):
            row = rgbe[y, :, c].tobytes()
            x = 0
            while x < w:
                j = x
                while j < w - 1 and row[j] == row[j + 1] and j - x < 126:
                    j += 1
                n = j - x + 1
                if n >= 3:
                    body += bytes([128 + n, row[x]])
                    x = j + 1
                else:
                    k = min(x + 128, w)
                    # stop the literal before a >=3 run
                    e = x
                    while e < k and not (
                        e < w - 2 and row[e] == row[e + 1] == row[e + 2]
                    ):
                        e += 1
                    if e == x:
                        e = x + 1
                    body += bytes([e - x]) + row[x:e]
                    x = e
    return bytes(head) + bytes(body)


def _expected_u8(rgb: np.ndarray) -> np.ndarray:
    u8 = np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return _luma(u8[:, :, 0], u8[:, :, 1], u8[:, :, 2])


def test_hdr_flat_rows():
    rng = np.random.RandomState(7)
    rgb = (rng.rand(5, 6, 3) * 0.9).astype(np.float64)
    rgbe = _float2rgbe(rgb)
    out = decode_bytes(_write_hdr_flat(rgbe))[0]
    # RGBE is lossy (~0.4% mantissa quantization): compare within 3 gray
    assert out.shape == (5, 6)
    assert np.max(np.abs(out.astype(int) - _expected_u8(rgb).astype(int))) <= 3


def test_hdr_rle_scanlines():
    rng = np.random.RandomState(8)
    rgb = (rng.rand(4, 32, 3) * 0.8).astype(np.float64)
    rgb[:, 5:15] = 0.25  # uniform patch to force RLE runs
    rgbe = _float2rgbe(rgb)
    flat = decode_bytes(_write_hdr_flat(rgbe))[0]
    rle = decode_bytes(_write_hdr_rle(rgbe))[0]
    assert np.array_equal(flat, rle)  # identical bytes either container
    assert np.max(np.abs(rle.astype(int) - _expected_u8(rgb).astype(int))) <= 3


def test_hdr_old_style_rle():
    """Old-style Radiance RLE: a quadruple (1,1,1,n) repeats the
    previous pixel n << (8*shift) times, consecutive markers raising
    the shift (color.c oldreadcolrs). Covers a plain run, a
    double-marker shifted count (n2 << 8), a row-start repeat pulling
    the previous row's last pixel, and an interleaved flat row; the
    oracle is the FLAT encoding of the same expanded pixels."""
    w = 300
    px_a = bytes([40, 80, 120, 130])
    px_b = bytes([200, 10, 60, 129])
    px_c = bytes([90, 90, 30, 131])
    head = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
    head += f"-Y 4 +X {w}\n".encode()
    body = bytearray()
    # row 0: literal, run of 43, then a shifted marker (1 << 8 = 256)
    body += px_a + bytes([1, 1, 1, 43]) + bytes([1, 1, 1, 1])
    # row 1: flat (no markers)
    row1 = bytes()
    for i in range(w):
        row1 += bytes([(i * 7) % 250 + 2, (i * 13) % 250 + 2,
                       (i * 29) % 250 + 2, 128])
    body += row1
    # row 2: literal then run 255, literal tail of 44
    body += px_b + bytes([1, 1, 1, 255])
    tail = bytes()
    for i in range(44):
        tail += bytes([i + 2, 255 - i, 50, 132])
    body += tail
    # row 3: starts with a repeat of row 2's LAST pixel, then literals
    body += bytes([1, 1, 1, 100])
    for i in range(w - 100):
        body += bytes([5 + i % 200, 9, 13, 129])
    data = bytes(head) + bytes(body)

    # expand by hand into the flat oracle
    rgbe = np.zeros((4, w, 4), np.uint8)
    rgbe[0, 0] = np.frombuffer(px_a, np.uint8)
    rgbe[0, 1:300] = rgbe[0, 0]
    rgbe[1] = np.frombuffer(row1, np.uint8).reshape(w, 4)
    rgbe[2, 0] = np.frombuffer(px_b, np.uint8)
    rgbe[2, 1:256] = rgbe[2, 0]
    rgbe[2, 256:] = np.frombuffer(tail, np.uint8).reshape(44, 4)
    rgbe[3, :100] = rgbe[2, w - 1]
    rgbe[3, 100:] = np.frombuffer(
        bytes().join(bytes([5 + i % 200, 9, 13, 129])
                     for i in range(w - 100)), np.uint8).reshape(w - 100, 4)

    out = decode_bytes(data)[0]
    flat = decode_bytes(_write_hdr_flat(rgbe))[0]
    assert np.array_equal(out, flat)
    assert out.shape == (4, w)


def test_hdr_bright_values_clamp():
    rgb = np.full((3, 16, 3), 7.5)  # HDR value far above display range
    rgbe = _float2rgbe(rgb)
    out = decode_bytes(_write_hdr_flat(rgbe))[0]
    assert np.all(out == 255)
