"""Differential tests: repo G7/G8/G11 preprocessing kernels vs the
reference's OWN classes/functions, loaded at test time (never shipped).

Scope and honesty notes:
- DetResizeForTest / NormalizeImage are AST-extracted (load_class) from
  opendet/preprocess — their modules' top-level imports pull cv2/PIL/
  pyclipper chains that aren't in this container.
- cv2 is stubbed with closed forms of its DOCUMENTED semantics
  (threshold THRESH_BINARY_INV, findNonZero scan order, boundingRect
  inclusive extents). cv2.resize is stubbed with the repo's own
  bilinear: interpolation itself cannot be differentially tested
  offline, so these tests pin the WRAPPER logic — kwarg precedence,
  tiny-input padding, target-shape arithmetic (round-32 / ceil-32 /
  ceil-128), ratio bookkeeping — which is where conformance bugs live
  (the h+w<64 zero-pad was missing from the repo until this suite).
- Inputs are uint8 (the reference's image dtype): image_padding on the
  reference side allocates a uint8 canvas unconditionally, so uint8
  inputs keep both sides in the same domain.
"""

from __future__ import annotations

import contextlib
import sys
import types

import numpy as np
import pytest

from _reference_loader import (
    REF_TOOLS,
    install_pil_stub,
    load_class,
    load_function,
)

from openocr_spark.kernels import preprocess as pp

REF_DET = "/root/reference/opendet/preprocess/db_resize_for_test.py"
REF_OPS = "/root/reference/opendet/preprocess/__init__.py"
REF_UTILS = f"{REF_TOOLS}/utils/opendoc_onnx_utils/utils.py"


def _make_cv2_stub() -> types.ModuleType:
    cv2 = types.ModuleType("cv2")
    cv2.__stub__ = True
    cv2.THRESH_BINARY_INV = 1
    cv2.COLOR_BGR2GRAY = 6

    def resize(img, dsize, interpolation=None):
        # repo bilinear as the resample — see module docstring
        w, h = int(dsize[0]), int(dsize[1])
        return pp._resize_nd(np.asarray(img), h, w)

    def threshold(src, thresh, maxval, ttype):
        assert ttype == cv2.THRESH_BINARY_INV
        # docs: dst = 0 if src > thresh else maxval
        return thresh, np.where(src > thresh, 0, maxval).astype(np.uint8)

    def findNonZero(binary):
        ys, xs = np.nonzero(binary)
        if ys.size == 0:
            return None
        return (
            np.stack([xs, ys], axis=1).astype(np.int32).reshape(-1, 1, 2)
        )

    def boundingRect(points):
        xs = points[:, 0, 0]
        ys = points[:, 0, 1]
        x, y = int(xs.min()), int(ys.min())
        return x, y, int(xs.max()) - x + 1, int(ys.max()) - y + 1

    cv2.resize = resize
    cv2.threshold = threshold
    cv2.findNonZero = findNonZero
    cv2.boundingRect = boundingRect
    return cv2


@contextlib.contextmanager
def cv2_stub_installed():
    """crop_margin does `import cv2` INSIDE its body — the stub must be
    in sys.modules at call time, and must not leak to other tests."""
    if "cv2" in sys.modules and not getattr(sys.modules["cv2"], "__stub__", False):
        yield sys.modules["cv2"]  # a real cv2 somehow present
        return
    stub = _make_cv2_stub()
    prev = sys.modules.get("cv2")
    sys.modules["cv2"] = stub
    try:
        yield stub
    finally:
        if prev is None:
            sys.modules.pop("cv2", None)
        else:
            sys.modules["cv2"] = prev


def _ref_det_resize():
    import math

    return load_class(
        REF_DET,
        "DetResizeForTest",
        {"np": np, "math": math, "sys": sys, "cv2": _make_cv2_stub()},
    )


def _rand_img(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _compare(ref_out, ref_shape, repo_out, repo_rh, repo_rw):
    ratio_h, ratio_w = float(ref_shape[2]), float(ref_shape[3])
    assert (repo_rh, repo_rw) == (ratio_h, ratio_w)
    assert ref_out.shape == repo_out.shape
    np.testing.assert_array_equal(ref_out, repo_out)


def test_det_resize_type0_matches_reference():
    DetResizeForTest = _ref_det_resize()
    rng = np.random.default_rng(70)
    # dims bounded so 'min'-limit upscales stay small: ratio multiplies
    # BOTH sides, so a 736 'min' limit on a 1-px side would synthesize a
    # 736×220k resample — realistic inputs for the big limits are pinned
    # by the deterministic cases in test_det_resize_default_kwargs
    cases = [(rng.integers(8, 160), rng.integers(8, 160)) for _ in range(25)]
    cases += [(1, 1), (5, 20), (31, 32), (10, 50), (63, 1), (32, 32)]
    for h, w in cases:
        for limit, ltype in [
            (96, "resize_long"),
            (64, "min"),
            (64, "max"),
            (128, "min"),
        ]:
            img = _rand_img(rng, int(h), int(w))
            op = DetResizeForTest(limit_side_len=limit, limit_type=ltype)
            data = op({"image": img.copy()})
            out, rh, rw = pp.det_resize_for_test(
                img, limit_side_len=limit, limit_type=ltype
            )
            _compare(data["image"], data["shape"], out, rh, rw)
            # pre-pad source dims are what the reference records first
            assert tuple(data["shape"][:2].astype(int)) == (int(h), int(w))


def test_det_resize_default_kwargs_match_reference():
    DetResizeForTest = _ref_det_resize()
    rng = np.random.default_rng(71)
    for h, w in [(100, 700), (900, 400), (736, 736), (20, 20)]:
        img = _rand_img(rng, h, w)
        data = DetResizeForTest()({"image": img.copy()})
        out, rh, rw = pp.det_resize_for_test(img)
        _compare(data["image"], data["shape"], out, rh, rw)


def test_det_resize_type1_matches_reference():
    DetResizeForTest = _ref_det_resize()
    rng = np.random.default_rng(72)
    for h, w in [(100, 300), (17, 23), (5, 9), (960, 128), (64, 64)]:
        for shape in [(960, 960), (736, 1280), (64, 96)]:
            for keep in (False, True):
                img = _rand_img(rng, h, w)
                op = DetResizeForTest(image_shape=shape, keep_ratio=keep)
                data = op({"image": img.copy()})
                out, rh, rw = pp.det_resize_for_test(
                    img, image_shape=shape, keep_ratio=keep
                )
                _compare(data["image"], data["shape"], out, rh, rw)


def test_det_resize_type2_matches_reference():
    DetResizeForTest = _ref_det_resize()
    rng = np.random.default_rng(73)
    for h, w in [(100, 300), (31, 17), (4, 11), (1000, 250), (960, 960)]:
        for long in (960, 512, 128):
            img = _rand_img(rng, h, w)
            op = DetResizeForTest(resize_long=long)
            data = op({"image": img.copy()})
            out, rh, rw = pp.det_resize_for_test(img, resize_long=long)
            _compare(data["image"], data["shape"], out, rh, rw)


def test_det_resize_max_sile_len_override_matches_reference():
    # the reference's per-call data['max_sile_len'] override == passing
    # that limit_side_len to the functional API
    DetResizeForTest = _ref_det_resize()
    rng = np.random.default_rng(74)
    img = _rand_img(rng, 200, 150)
    op = DetResizeForTest(limit_side_len=736, limit_type="max")
    data = op({"image": img.copy(), "max_sile_len": 96})
    out, rh, rw = pp.det_resize_for_test(
        img, limit_side_len=96, limit_type="max"
    )
    _compare(data["image"], data["shape"], out, rh, rw)


def test_tiny_input_padding_matches_reference():
    """h + w < 64 must zero-pad to ≥32×32 BEFORE resizing — stretching
    the tiny image directly produces different pixels (the gap this
    suite was built to catch)."""
    DetResizeForTest = _ref_det_resize()
    rng = np.random.default_rng(75)
    img = _rand_img(rng, 10, 20)
    op = DetResizeForTest(limit_side_len=64, limit_type="min")
    data = op({"image": img.copy()})
    out, rh, rw = pp.det_resize_for_test(
        img, limit_side_len=64, limit_type="min"
    )
    _compare(data["image"], data["shape"], out, rh, rw)
    # and the padded flow differs from a naive stretch of the raw image
    naive = pp._resize_nd(img, data["image"].shape[0], data["image"].shape[1])
    assert not np.array_equal(naive, out)


def test_type2_degenerate_target_fails_loud():
    """Extreme aspect ratios make type2's ceil-128 of int(h·ratio) hit
    zero (review-caught); the reference crashes inside cv2.resize —
    the repo must raise cleanly, never emit an empty raster with a
    0.0 ratio."""
    img = np.zeros((1, 1000), np.float32)
    with pytest.raises(ValueError, match="degenerate resize target"):
        pp.det_resize_for_test(img, resize_long=128)


def test_det_stats_shapes_applies_tiny_pad():
    """The operator-level shape stats must follow DetResizeForTest's
    padded flow (review-caught: the pad was only wired into the pixel
    path at first): for tiny inputs the resize targets and implied
    ratios derive from the PADDED dims."""
    DetResizeForTest = _ref_det_resize()
    for h, w in [(10, 20), (1, 1), (30, 33), (40, 50), (96, 160)]:
        op = DetResizeForTest(limit_side_len=64, limit_type="resize_long")
        data = op({"image": np.zeros((h, w, 3), np.uint8)})
        ph, pw, rh, rw, _nw = pp.det_stats_shapes(
            h, w, limit_side_len=64, limit_type="resize_long"
        )
        assert (rh, rw) == data["image"].shape[:2]
        assert (rh / float(ph), rw / float(pw)) == (
            float(data["shape"][2]),
            float(data["shape"][3]),
        )


def test_resize_norm_pad_matches_reference():
    """G16/G17 vs openrec/preprocess/resize.py:resize_norm_img (the
    SVTRResize path, gray image_shape (1,H,W)): resized-region pixels
    (up to the reference's (x/255−0.5)/0.5 normalize, applied here to
    the repo output), width rule incl. the cap, and valid_ratio.
    Pad-region semantics are a DOCUMENTED divergence: the reference
    zero-pads in NORMALIZED space (pad value 0.0 ≡ raw 127.5) while the
    repo zero-pads raw pixels — downstream consumers mask the pad
    region via valid_ratio either way, and the repo's rec kernels read
    only the valid region."""
    import math

    cv2 = _make_cv2_stub()
    cv2.INTER_LINEAR = 1  # referenced as the default-arg at def time
    ref_fn = load_function(
        f"{REF_DET.rsplit('/', 3)[0]}/openrec/preprocess/resize.py",
        "resize_norm_img",
        {"np": np, "math": math, "cv2": cv2},
    )
    rng = np.random.default_rng(78)
    dims = [(int(rng.integers(4, 80)), int(rng.integers(4, 400))) for _ in range(30)]
    dims += [(3, 5), (7, 29), (32, 32), (100, 4), (1, 1)]
    for h, w in dims:
        for imgH, imgW in ((32, 128), (48, 96), (40, 112)):
            img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            ref_out, ref_vr = ref_fn(img.copy(), (1, imgH, imgW))
            got, vr = pp.resize_norm_pad(img.astype(np.float32), imgH, imgW)
            assert vr == ref_vr
            nw = int(round(vr * imgW))
            np.testing.assert_allclose(
                ref_out[0][:, :nw],
                (got[:, :nw] / 255.0 - 0.5) / 0.5,
                rtol=0,
                atol=1e-6,
            )
            assert np.all(ref_out[0][:, nw:] == 0.0)


def test_normalize_image_matches_reference():
    install_pil_stub()  # __call__ does `from PIL import Image`
    NormalizeImage = load_class(REF_OPS, "NormalizeImage", {"np": np})
    rng = np.random.default_rng(76)
    img = rng.integers(0, 256, size=(40, 30, 3), dtype=np.uint8)
    op = NormalizeImage(
        scale="1./255.", mean=[0.485] * 3, std=[0.229] * 3, order="hwc"
    )
    ref = op({"image": img.copy()})["image"]
    for c in range(3):
        np.testing.assert_array_equal(
            ref[:, :, c], pp.normalize_image(img[:, :, c])
        )
    assert ref.dtype == np.float32


@pytest.mark.parametrize("dtype", [np.uint8, np.float64])
def test_crop_margin_matches_reference(dtype):
    ref_crop = load_function(REF_UTILS, "crop_margin", {"np": np})
    rng = np.random.default_rng(77)
    with cv2_stub_installed():
        for trial in range(60):
            h = int(rng.integers(3, 60))
            w = int(rng.integers(3, 60))
            # light page with dark content patches (content = post-norm
            # value <= 200 under THRESH_BINARY_INV)
            img = rng.integers(150, 256, size=(h, w)).astype(dtype)
            n_patches = int(rng.integers(0, 4))
            for _ in range(n_patches):
                y = int(rng.integers(0, h))
                x = int(rng.integers(0, w))
                ph = int(rng.integers(1, max(2, h - y)))
                pw = int(rng.integers(1, max(2, w - x)))
                img[y : y + ph, x : x + pw] = int(rng.integers(0, 120))
            ref = ref_crop(img.copy())
            got = pp.crop_margin(img.copy())
            np.testing.assert_array_equal(ref, got)


def test_crop_margin_uniform_and_extremes_match_reference():
    ref_crop = load_function(REF_UTILS, "crop_margin", {"np": np})
    with cv2_stub_installed():
        for img in [
            np.full((8, 9), 255, np.uint8),  # uniform: returned as-is
            np.full((8, 9), 0, np.uint8),
            np.zeros((1, 1), np.uint8),
            np.stack([np.arange(256, dtype=np.uint8)] * 4),  # full ramp
        ]:
            ref = ref_crop(img.copy())
            got = pp.crop_margin(img.copy())
            np.testing.assert_array_equal(ref, got)
