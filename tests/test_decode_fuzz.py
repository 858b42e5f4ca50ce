"""Corruption-robustness property: for EVERY from-scratch codec, a
valid stream that is truncated or bit-flipped at an arbitrary position
must either decode to well-formed rasters or raise a clean Python
exception — never hang, never return junk-typed output. This is the
fail-loud contract under adversarial bytes (a web-scale corpus WILL
contain every possible corruption), complementing the targeted
truncation tests in test_media_decode."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from openocr_spark.kernels.media_decode import decode_bytes, encode_png
from openocr_spark.kernels.pdf_format import encode_pdf
from openocr_spark.kernels.tiff_format import encode_tiff_pages
from openocr_spark.kernels.webp_format import encode_webp_gray


def _img() -> np.ndarray:
    rng = np.random.RandomState(5)
    x, y = np.meshgrid(np.arange(24), np.arange(16))
    base = (96 + 60 * np.sin(x / 3.0) + 40 * np.cos(y / 2.0))
    return (base + rng.randint(0, 8, (16, 24))).clip(0, 255).astype(np.uint8)


def _streams() -> dict[str, bytes]:
    from jpeg_ref_encoder import encode_jpeg, encode_jpeg_lossless

    from test_exr import write_exr
    from test_float_raster_formats import _float2rgbe, _write_hdr_flat

    img = _img()
    out = {
        "png": encode_png(img),
        "pdf": encode_pdf([img]),
        "tiff": encode_tiff_pages(img, img > 128),
        "vp8l": encode_webp_gray(img),
        "jpeg": encode_jpeg(img, qtable=[2] * 64),
        "jpeg_lossless": encode_jpeg_lossless(img, predictor=4),
        "pnm": b"P5\n24 16\n255\n" + img.tobytes(),
        "exr": write_exr({"Y": img.astype(np.float32) / 255.0},
                         compression=3),
        "gif": __import__("test_media_decode")._make_gif(
            (img >> 4).astype(np.uint8),
            [(i * 17, i * 17, i * 17) for i in range(16)],
        ),
        "hdr": _write_hdr_flat(_float2rgbe(
            np.repeat(img[:, :, None], 3, axis=2).astype(np.float64) / 255.0
        )),
    }
    return out


STREAMS = _streams()
FMTS = sorted(STREAMS)


@pytest.mark.parametrize("fmt", FMTS)
@given(cut=st.floats(0.01, 0.999))
@settings(max_examples=60, deadline=2000)
def test_truncation_terminates_cleanly(fmt, cut):
    data = STREAMS[fmt]
    trunc = data[: max(1, int(len(data) * cut))]
    try:
        pages = decode_bytes(trunc)
    except Exception:
        return  # clean, loud failure is the contract
    assert isinstance(pages, list)
    for p in pages:
        assert isinstance(p, np.ndarray) and p.dtype == np.uint8
        assert p.ndim in (2, 3) and p.size > 0


@pytest.mark.parametrize("fmt", FMTS)
@given(off=st.floats(0.0, 0.999), bit=st.integers(0, 7))
@settings(max_examples=60, deadline=2000)
def test_bitflip_terminates_cleanly(fmt, off, bit):
    data = bytearray(STREAMS[fmt])
    data[int(len(data) * off)] ^= 1 << bit
    try:
        pages = decode_bytes(bytes(data))
    except Exception:
        return
    assert isinstance(pages, list)
    for p in pages:
        assert isinstance(p, np.ndarray) and p.dtype == np.uint8
        assert p.ndim in (2, 3) and p.size > 0
