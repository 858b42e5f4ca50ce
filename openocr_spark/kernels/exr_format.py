"""From-scratch OpenEXR scanline decoder — numpy + stdlib zlib only.

The reference reads EXR implicitly through cv2.imread (the same
check_and_read path as every raster format, tools/utils/utility.py:
76-107); depth maps and HDR renders in ML corpora ship as EXR.

Scope: single-part scanline files (magic 0x01312f76, version 2, no
tiles/deep/multipart — those fail loudly), attribute parse (chlist /
compression / dataWindow / lineOrder), channel types HALF and FLOAT
(UINT fails loudly), compressions NONE, ZIPS (1 line/block) and ZIP
(16 lines/block) with the EXR post-inflate reconstruction: byte-delta
prediction (+prev −128) followed by two-half deinterleave. Channels
are stored per scanline in chlist order, each channel's row
contiguous. Output: float rows → LDR clamp to 8-bit gray/RGB like the
PFM/HDR paths (cv2's default 8-bit read convention).

PIZ/PXR24/B44/DWA compressions are documented fail-loud boundaries
(wavelet/f24/dct codecs; rare outside VFX pipelines).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x76\x2f\x31\x01"


def _cstring(data: bytes, pos: int) -> tuple[str, int]:
    end = data.index(b"\x00", pos)
    return data[pos:end].decode("latin-1"), end + 1


def _parse_header(data: bytes) -> tuple[dict, int]:
    if data[:4] != _MAGIC:
        raise NotImplementedError("not an OpenEXR stream")
    (version,) = struct.unpack_from("<I", data, 4)
    if version & 0x200:
        raise NotImplementedError("tiled EXR not supported (scanline only)")
    if version & (0x800 | 0x1000):
        raise NotImplementedError("deep/multipart EXR not supported")
    pos = 8
    attrs: dict[str, tuple[str, bytes]] = {}
    while True:
        if data[pos] == 0:  # empty name = end of header
            pos += 1
            break
        name, pos = _cstring(data, pos)
        typ, pos = _cstring(data, pos)
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        attrs[name] = (typ, data[pos : pos + size])
        pos += size
    return attrs, pos


def _parse_chlist(raw: bytes) -> list[tuple[str, int]]:
    """→ [(channel name, pixel type)] in stored (alphabetical) order."""
    out = []
    pos = 0
    while raw[pos] != 0:
        name, pos = _cstring(raw, pos)
        # layout: pixel_type int32, pLinear uint8, reserved[3], xSampling
        # int32, ySampling int32
        (ptype,) = struct.unpack_from("<I", raw, pos)
        xs, ys = struct.unpack_from("<II", raw, pos + 8)
        pos += 16
        if (xs, ys) != (1, 1):
            raise NotImplementedError("EXR channel subsampling != 1")
        out.append((name, ptype))
    return out


def _exr_unzip(buf: bytes) -> bytes:
    """Inverse of EXR's zip pre-filter: un-delta then de-interleave."""
    arr = np.frombuffer(zlib.decompress(buf), dtype=np.uint8).astype(np.int32)
    # byte-delta prediction: d[i] = d[i-1] + stored[i] - 128
    arr = (np.cumsum(arr - 128) + 128) % 256  # cumsum of (v-128) + first term
    # cumsum form: out[0] = v0; out[i] = out[i-1] + v[i] - 128
    n = len(arr)
    out = np.empty(n, dtype=np.uint8)
    half = (n + 1) // 2
    out[0::2] = arr[:half].astype(np.uint8)
    out[1::2] = arr[half:].astype(np.uint8)
    return out.tobytes()


def decode_exr(data: bytes) -> np.ndarray:
    attrs, pos = _parse_header(data)
    chans = _parse_chlist(attrs["channels"][1])
    comp = attrs["compression"][1][0]
    x0, y0, x1, y1 = struct.unpack("<4i", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    from openocr_spark.kernels.media_decode import check_dims
    check_dims(w, h, "EXR", max(len(chans), 1))
    line_order = attrs.get("lineOrder", ("", b"\x00"))[1][0]
    if line_order not in (0, 1):
        raise NotImplementedError("random-Y EXR line order")
    if comp == 0:
        lines_per_block, unzip = 1, lambda b: b
    elif comp == 2:
        lines_per_block, unzip = 1, _exr_unzip
    elif comp == 3:
        lines_per_block, unzip = 16, _exr_unzip
    else:
        raise NotImplementedError(
            f"EXR compression {comp} (only NONE/ZIPS/ZIP supported)"
        )
    dtypes = {1: np.dtype("<f2"), 2: np.dtype("<f4")}
    for name, pt in chans:
        if pt not in dtypes:
            raise NotImplementedError(f"EXR channel type {pt} (UINT)")
    n_blocks = (h + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from(f"<{n_blocks}Q", data, pos)
    planes = {name: np.zeros((h, w), dtype=np.float32) for name, _ in chans}
    bytes_per_line = w * sum(dtypes[pt].itemsize for _, pt in chans)
    for off in offsets:
        (by,) = struct.unpack_from("<i", data, off)
        (size,) = struct.unpack_from("<i", data, off + 4)
        n_lines = min(lines_per_block, y1 - by + 1)
        block = data[off + 8 : off + 8 + size]
        # OpenEXR writers store a block RAW whenever zlib output would
        # not shrink it (high-entropy data); the reader's contract is
        # the same size test the library uses: stored size == exact
        # uncompressed size means no inflate, no predictor unfilter.
        if size == n_lines * bytes_per_line:
            raw = bytes(block)
        else:
            raw = unzip(block)
        p = 0
        for ln in range(n_lines):
            y = by - y0 + ln
            for name, pt in chans:
                dt = dtypes[pt]
                row = np.frombuffer(raw, dtype=dt, count=w, offset=p)
                planes[name][y] = row.astype(np.float32)
                p += w * dt.itemsize
    def tonemap(v: np.ndarray) -> np.ndarray:
        # Corrupt streams decode to NaN/inf halves/floats: make them
        # well-defined (NaN->0) instead of UB NaN->uint8 casts; valid
        # [0,1] data is bit-unchanged.
        with np.errstate(over="ignore", invalid="ignore"):
            s = v * 255.0 + 0.5
        return np.clip(
            np.nan_to_num(s, nan=0.0, posinf=255.0, neginf=0.0), 0, 255
        ).astype(np.uint8)

    names = [n for n, _ in chans]
    if all(c in names for c in "RGB"):
        return tonemap(
            np.stack([planes["R"], planes["G"], planes["B"]], axis=2)
        )
    if "Y" in names:
        return tonemap(planes["Y"])
    # fall back to the first channel as gray (e.g. a lone Z/depth plane)
    return tonemap(planes[names[0]])
