"""Multimodal decode kernels — real Spark plumbing, stubbed codecs.

The reference decodes images with cv2/PIL (DecodeImage,
opendet/preprocess/__init__.py:85-143), GIF first-frames and PDF pages
with PyMuPDF (tools/utils/utility.py:76-107). Those libraries are not in
this container, so the byte-level codecs are STUBBED behind
NotImplementedError with a deterministic fake used by tests — but the
Spark-side contract is real and tested: schemas, Arrow batch shapes,
mapInPandas signatures, 1→N page explosion.

Binary layout of the fake codec (so tests exercise real byte parsing):
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


def decode_bytes(data: bytes) -> list[np.ndarray]:
    """Codec entrypoint. Real formats are stubbed: plug cv2/PyMuPDF here
    in production; the fake format keeps the plumbing testable."""
    if data[: len(_MAGIC)] == _MAGIC:
        h, w, n = struct.unpack("<HHB", data[len(_MAGIC) : len(_MAGIC) + 5])
        body = data[len(_MAGIC) + 5 :]
        return [
            np.frombuffer(body[i * h * w : (i + 1) * h * w], dtype=np.uint8).reshape(
                h, w
            )
            for i in range(n)
        ]
    raise NotImplementedError(
        "real image/PDF codecs (cv2/PIL/PyMuPDF) are not available in this "
        "environment; only the FAKEIMG1 test format is supported"
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
