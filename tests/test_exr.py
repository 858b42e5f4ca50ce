"""OpenEXR scanline decode validation against a test-side writer built
here from the published file layout (magic/version, attribute records,
chlist entries, scanline offset table, per-block y/size prefix, and the
zip pre-filter: interleave halves then byte-delta — the writer applies
the FORWARD filter so the package decoder must invert it exactly).
"""

import struct
import zlib

import numpy as np
import pytest

from openocr_spark.kernels.exr_format import decode_exr
from openocr_spark.kernels.media_decode import _luma, decode_bytes


def _attr(name: str, typ: str, payload: bytes) -> bytes:
    return (name.encode() + b"\x00" + typ.encode() + b"\x00"
            + struct.pack("<I", len(payload)) + payload)


def _chlist(chans: list[tuple[str, int]]) -> bytes:
    out = b""
    for name, ptype in sorted(chans):
        out += name.encode() + b"\x00"
        out += struct.pack("<I", ptype) + b"\x00\x00\x00\x00"
        out += struct.pack("<II", 1, 1)
    return out + b"\x00"


def _zip_filter(raw: bytes) -> bytes:
    """FORWARD EXR zip pre-filter: interleave split, then delta."""
    arr = np.frombuffer(raw, dtype=np.uint8)
    n = len(arr)
    half = (n + 1) // 2
    t = np.empty(n, dtype=np.uint8)
    t[:half] = arr[0::2]
    t[half:] = arr[1::2]
    d = t.astype(np.int32)
    out = d.copy()
    out[1:] = (d[1:] - d[:-1] + 128) % 256
    return zlib.compress(out.astype(np.uint8).tobytes())


def write_exr(planes: dict[str, np.ndarray], compression: int = 3,
              dtype: int = 2, force_raw_blocks: bool = False) -> bytes:
    """planes: {channel: (h, w) float array}; compression 0/2/3;
    dtype 1=half 2=float. Like the real library, a ZIP/ZIPS block is
    stored RAW when zlib does not shrink it; force_raw_blocks stores
    every block raw under a compressed flag (the deterministic stand-in
    for high-entropy data, so the reader's size test is exercised
    without depending on what zlib achieves on a particular array)."""
    names = sorted(planes)
    h, w = planes[names[0]].shape
    npdt = np.dtype("<f2") if dtype == 1 else np.dtype("<f4")
    header = b"\x76\x2f\x31\x01" + struct.pack("<I", 2)
    header += _attr("channels", "chlist", _chlist([(n, dtype) for n in names]))
    header += _attr("compression", "compression", bytes([compression]))
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\x00")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"  # end of header

    lines_per_block = {0: 1, 2: 1, 3: 16}[compression]
    n_blocks = (h + lines_per_block - 1) // lines_per_block
    blocks = []
    for b in range(n_blocks):
        y = b * lines_per_block
        nl = min(lines_per_block, h - y)
        raw = b""
        for ln in range(nl):
            for name in names:
                raw += planes[name][y + ln].astype(npdt).tobytes()
        payload = raw if compression == 0 else _zip_filter(raw)
        if compression != 0 and (force_raw_blocks or len(payload) >= len(raw)):
            payload = raw  # real OpenEXR stores the block raw
        blocks.append((y, payload))
    table_pos = len(header)
    data_start = table_pos + 8 * n_blocks
    offsets = []
    pos = data_start
    body = b""
    for y, payload in blocks:
        offsets.append(pos)
        body += struct.pack("<ii", y, len(payload)) + payload
        pos += 8 + len(payload)
    table = struct.pack(f"<{n_blocks}Q", *offsets)
    return header + table + body


def _rand(h, w, seed):
    return np.random.RandomState(seed).rand(h, w).astype(np.float32)


def _expect_u8(f):
    return np.clip(f * 255.0 + 0.5, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("comp", [0, 2, 3])
def test_gray_float_compressions(comp):
    y = _rand(37, 23, seed=comp)  # 37 rows: a partial final ZIP block
    out = decode_exr(write_exr({"Y": y}, compression=comp))
    assert np.array_equal(out, _expect_u8(y))


def test_rgb_float():
    planes = {c: _rand(12, 17, seed=i) for i, c in enumerate("RGB")}
    out = decode_exr(write_exr(planes))
    expect = np.stack([_expect_u8(planes[c]) for c in "RGB"], axis=2)
    assert np.array_equal(out, expect)


def test_half_precision():
    y = _rand(9, 14, seed=9).astype(np.float16).astype(np.float32)
    out = decode_exr(write_exr({"Y": y}, dtype=1))
    assert np.array_equal(out, _expect_u8(y))


def test_values_clamp():
    y = np.array([[-0.5, 0.0, 0.5, 1.0, 3.0]], dtype=np.float32)
    out = decode_exr(write_exr({"Y": y}, compression=0))
    assert list(out[0]) == [0, 0, 128, 255, 255]


@pytest.mark.parametrize("comp", [2, 3])
def test_raw_stored_blocks_under_zip_flag(comp):
    # OpenEXR writers store a scanline block UNCOMPRESSED whenever zlib
    # does not shrink it (routine for high-entropy float data). The
    # reader must detect this by the stored-size == uncompressed-size
    # test instead of feeding raw bytes to inflate.
    y = _rand(37, 23, seed=comp + 40)
    out = decode_exr(write_exr({"Y": y}, compression=comp,
                               force_raw_blocks=True))
    assert np.array_equal(out, _expect_u8(y))


def test_raw_stored_rgb_half_partial_block():
    planes = {c: _rand(19, 11, seed=50 + i) for i, c in enumerate("RGB")}
    half = {c: p.astype(np.float16).astype(np.float32)
            for c, p in planes.items()}
    out = decode_exr(write_exr(half, compression=3, dtype=1,
                               force_raw_blocks=True))
    expect = np.stack([_expect_u8(half[c]) for c in "RGB"], axis=2)
    assert np.array_equal(out, expect)


def test_depth_plane_fallback():
    z = _rand(8, 8, seed=11)
    out = decode_exr(write_exr({"Z": z}))
    assert np.array_equal(out, _expect_u8(z))


def test_unsupported_compression_fails_loudly():
    y = _rand(4, 4, seed=12)
    data = bytearray(write_exr({"Y": y}, compression=0))
    i = data.index(b"compression\x00compression\x00")
    data[i + len(b"compression\x00compression\x00") + 4] = 4  # PIZ
    with pytest.raises(NotImplementedError, match="compression 4"):
        decode_exr(bytes(data))


def test_magic_dispatch_and_luma():
    planes = {c: _rand(6, 7, seed=20 + i) for i, c in enumerate("RGB")}
    pages = decode_bytes(write_exr(planes))
    assert len(pages) == 1
    u8 = {c: _expect_u8(planes[c]) for c in "RGB"}
    assert np.array_equal(pages[0], _luma(u8["R"].astype(np.uint32), u8["G"], u8["B"]))


def test_exr_through_spark(spark):
    from openocr_spark.kernels.media_decode import decode_media

    y = _rand(11, 19, seed=30)
    df = spark.createDataFrame(
        [("d", "m", bytearray(write_exr({"Y": y})))],
        "doc_id string, media_ref string, content binary",
    )
    r = decode_media(df).collect()[0]
    assert (r.height, r.width) == (11, 19)
    assert np.array_equal(
        np.frombuffer(r.pixels, np.uint8).reshape(11, 19), _expect_u8(y))
