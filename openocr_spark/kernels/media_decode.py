"""Multimodal decode kernels — real Spark plumbing; real codecs for the
compression-free formats, stubs for the library-bound ones.

The reference decodes images with cv2/PIL (DecodeImage,
opendet/preprocess/__init__.py:85-143), GIF first-frames and PDF pages
with PyMuPDF (tools/utils/utility.py:76-107). cv2/PIL/PyMuPDF are not
in this container, so the entropy-coded formats (PNG/JPEG/GIF/PDF)
remain STUBBED behind NotImplementedError — but the Spark-side contract
is real and tested (schemas, Arrow batch shapes, mapInPandas
signatures, 1→N page explosion), and three REAL formats decode
end-to-end with from-scratch parsers:

  PGM  (P2 ascii / P5 binary, 8-bit grayscale)
  PPM  (P6 binary RGB → BT.601 integer luma)
  BMP  (BITMAPINFOHEADER, uncompressed, 8-bit palette or 24-bit BGR,
        bottom-up or top-down, 4-byte row padding)

Binary layout of the fake codec (kept for multi-page tests — the real
formats are single-page):
  header b'FAKEIMG1' | uint16 h | uint16 w | uint8 pages
  then pages * h * w bytes of grayscale pixels.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_MAGIC = b"FAKEIMG1"

DECODED_SCHEMA = (
    "doc_id string, media_ref string, page_no int, height int, width int, "
    "pixels binary"
)

FEATURE_SCHEMA = (
    "doc_id string, media_ref string, page_no int, mean_px double, "
    "std_px double, nonzero_frac double"
)


def encode_fake(pages: list[np.ndarray]) -> bytes:
    """Deterministic fake encoder (test fixture side)."""
    h, w = pages[0].shape
    head = _MAGIC + struct.pack("<HHB", h, w, len(pages))
    return head + b"".join(p.astype(np.uint8).tobytes() for p in pages)


def _luma(r: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma — deterministic RGB→grayscale."""
    return (
        (299 * r.astype(np.uint32) + 587 * g.astype(np.uint32) + 114 * b.astype(np.uint32))
        // 1000
    ).astype(np.uint8)


def _decode_pnm(data: bytes) -> np.ndarray:
    """PGM P2/P5 and PPM P6 parser (netpbm spec): magic, whitespace/
    comment-separated header tokens (width, height, maxval), then ascii
    samples (P2) or raw bytes (P5/P6)."""
    magic = data[:2]
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and '#' comments
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm samples not supported")
    if magic == b"P2":
        vals = np.array(data[pos:].split()[: h * w], dtype=np.uint16)
        return (vals * 255 // maxval).astype(np.uint8).reshape(h, w)
    pos += 1  # single whitespace byte after maxval before raster
    if magic == b"P5":
        px = np.frombuffer(data[pos : pos + h * w], dtype=np.uint8).reshape(h, w)
        return px if maxval == 255 else (px.astype(np.uint16) * 255 // maxval).astype(np.uint8)
    if magic == b"P6":
        rgb = np.frombuffer(data[pos : pos + h * w * 3], dtype=np.uint8).reshape(h, w, 3)
        return _luma(rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2])
    raise NotImplementedError(f"netpbm magic {magic!r} not supported")


def _decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed BMP parser (BITMAPFILEHEADER + BITMAPINFOHEADER):
    8-bit palette or 24-bit BGR, bottom-up (positive height) or top-down
    (negative), rows padded to 4 bytes; output 8-bit grayscale."""
    if data[:2] != b"BM":
        raise NotImplementedError("not a BMP")
    (px_offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    w, h_signed = struct.unpack_from("<ii", data, 18)
    _planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if hdr_size < 40 or compression != 0 or bpp not in (8, 24):
        raise NotImplementedError(
            f"only uncompressed 8/24-bit BITMAPINFOHEADER BMPs supported "
            f"(hdr={hdr_size}, comp={compression}, bpp={bpp})"
        )
    top_down = h_signed < 0
    h = abs(h_signed)
    row_bytes = (w * bpp // 8 + 3) & ~3
    if bpp == 8:
        # palette: 4 bytes/entry (B,G,R,0) right after the info header
        pal = np.frombuffer(
            data[14 + hdr_size : 14 + hdr_size + 4 * 256], dtype=np.uint8
        )
        n_entries = len(pal) // 4
        pal = pal[: n_entries * 4].reshape(-1, 4)
        gray_lut = _luma(pal[:, 2], pal[:, 1], pal[:, 0])
        rows = []
        for y in range(h):
            off = px_offset + y * row_bytes
            idx = np.frombuffer(data[off : off + w], dtype=np.uint8)
            rows.append(gray_lut[np.minimum(idx, n_entries - 1)])
        px = np.stack(rows)
    else:
        rows = []
        for y in range(h):
            off = px_offset + y * row_bytes
            bgr = np.frombuffer(data[off : off + w * 3], dtype=np.uint8).reshape(w, 3)
            rows.append(_luma(bgr[:, 2], bgr[:, 1], bgr[:, 0]))
        px = np.stack(rows)
    return px if top_down else px[::-1].copy()


def decode_bytes(data: bytes) -> list[np.ndarray]:
    """Codec entrypoint — format sniffed from the magic bytes. PGM/PPM
    and uncompressed BMP decode for real; the entropy-coded formats
    (PNG/JPEG/GIF/PDF) need cv2/PIL/PyMuPDF, absent in this
    environment, and stay behind NotImplementedError. Single-image
    formats return a 1-page list (check_and_read's contract,
    tools/utils/utility.py:76-107: everything normalizes to a page
    list)."""
    if data[: len(_MAGIC)] == _MAGIC:
        h, w, n = struct.unpack("<HHB", data[len(_MAGIC) : len(_MAGIC) + 5])
        body = data[len(_MAGIC) + 5 :]
        return [
            np.frombuffer(body[i * h * w : (i + 1) * h * w], dtype=np.uint8).reshape(
                h, w
            )
            for i in range(n)
        ]
    if data[:2] in (b"P2", b"P5", b"P6"):
        return [_decode_pnm(data)]
    if data[:2] == b"BM":
        return [_decode_bmp(data)]
    raise NotImplementedError(
        "entropy-coded codecs (PNG/JPEG/GIF/PDF via cv2/PIL/PyMuPDF) are "
        "not available in this environment; supported: FAKEIMG1, PGM/PPM "
        "(P2/P5/P6), uncompressed BMP (8/24-bit)"
    )


def decode_media(df: DataFrame) -> DataFrame:
    """(doc_id, media_ref, content:binary) → one row per page
    (the check_and_read PDF→pages 1→N expansion, SURVEY §2.1 S2, as a
    mapInPandas explode)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, content in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["content"]
            ):
                for page_no, px in enumerate(decode_bytes(bytes(content))):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_ref": ref,
                            "page_no": page_no,
                            "height": px.shape[0],
                            "width": px.shape[1],
                            "pixels": px.tobytes(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "page_no", "height", "width", "pixels",
                ],
            )

    return df.mapInPandas(kernel, schema=DECODED_SCHEMA)


def extract_features(decoded: DataFrame) -> DataFrame:
    """Per-page feature extraction (vectorized numpy per Arrow batch) —
    the stand-in for embedding/feature models over decoded pixels."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, stds, nz = [], [], []
            for h, w, buf in zip(pdf["height"], pdf["width"], pdf["pixels"]):
                px = np.frombuffer(buf, dtype=np.uint8).reshape(int(h), int(w))
                means.append(float(px.mean()))
                stds.append(float(px.std()))
                nz.append(float((px > 0).mean()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "page_no": pdf["page_no"],
                    "mean_px": means,
                    "std_px": stds,
                    "nonzero_frac": nz,
                }
            )

    return decoded.mapInPandas(kernel, schema=FEATURE_SCHEMA)
