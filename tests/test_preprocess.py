"""Pixel preprocessing / training-target kernels (G7, G8, G11, G15,
G16/G17) — direct numpy-level semantics checks; the Spark plumbing +
closed-form cross-check run through the preproc_targets driver query."""

import numpy as np

from openocr_spark.kernels import preprocess as pp


def test_bilinear_identity_and_interp():
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    assert np.allclose(pp.bilinear_resize(img, 3, 4), img)
    up = pp.bilinear_resize(img, 6, 8)
    assert up.shape == (6, 8)
    assert up.min() >= img.min() - 1e-6 and up.max() <= img.max() + 1e-6


def test_det_resize_rounds_to_32():
    img = np.zeros((96, 160), dtype=np.float32)
    out, rh, rw = pp.det_resize(img, limit_side_len=64, limit_type="resize_long")
    assert out.shape == (32, 64)
    assert abs(rh - 32 / 96) < 1e-9 and abs(rw - 64 / 160) < 1e-9
    # limit_type max: only shrinks when over the limit
    out2, rh2, rw2 = pp.det_resize(img, limit_side_len=736, limit_type="max")
    assert out2.shape == (96, 160) and rh2 == 1.0 and rw2 == 1.0
    # limit_type min: upscales when under the limit
    out3, _, _ = pp.det_resize(img, limit_side_len=192, limit_type="min")
    assert min(out3.shape) >= 192


def test_normalize_image():
    img = np.full((4, 4), 127.5, dtype=np.float32)
    out = pp.normalize_image(img, scale=1 / 255.0, mean=0.5, std=0.25)
    assert np.allclose(out, 0.0, atol=1e-6)


def test_crop_margin_crops_to_content():
    page = np.full((20, 30), 255, dtype=np.uint8)  # white page
    page[5:10, 8:20] = 0  # dark ink
    out = pp.crop_margin(page)
    assert out.shape == (5, 12)
    # uniform image unchanged
    flat = np.full((5, 5), 9, dtype=np.uint8)
    assert pp.crop_margin(flat).shape == (5, 5)


def test_make_shrink_map_inset_and_mask():
    rects = [(10.0, 10.0, 40.0, 30.0), (50.0, 5.0, 55.0, 9.0)]  # care, too-small
    gt, mask = pp.make_shrink_map(rects, [False, True], 48, 64)
    d = int(round(30 * 20 * (1 - 0.16) / (2 * 50)))  # = 5
    assert d == 5
    assert gt.sum() == (20 - 2 * d + 1) * (30 - 2 * d + 1)
    assert gt[10 + d, 10 + d] == 1.0 and gt[10 + d - 1, 10 + d] == 0.0
    # ignored rect zeroes the loss mask over its extent
    assert mask[5:10, 50:56].sum() == 0
    assert mask[10, 10] == 1.0


def test_make_border_map_ramp():
    rects = [(16.0, 16.0, 48.0, 32.0)]
    canvas, mask = pp.make_border_map(rects, [False], 64, 64)
    # background stays at thresh_min, the rect boundary peaks near thresh_max
    assert abs(canvas[0, 0] - 0.3) < 1e-6
    assert canvas[16, 16] > 0.69  # on the boundary: distance 0 -> max
    # inside the band the value decays with distance from the boundary
    assert canvas[24, 32] < canvas[17, 32] <= canvas[16, 32]
    assert mask[16, 16] == 1.0 and mask[0, 0] == 0.0


def test_perspective_matrix_roundtrip():
    src = np.array([[3, 2], [40, 5], [38, 24], [1, 20]], dtype=np.float64)
    dst = np.array([[0, 0], [37, 0], [37, 20], [0, 20]], dtype=np.float64)
    H = pp.perspective_matrix(src, dst)
    for s, d in zip(src, dst):
        v = H @ np.array([s[0], s[1], 1.0])
        assert np.allclose(v[:2] / v[2], d, atol=1e-8)


def test_rotate_crop_axis_aligned_identity():
    """An axis-aligned quad crop equals the plain slice (up to the
    sampling grid): constant regions come back exactly."""
    img = np.zeros((40, 60), dtype=np.float32)
    img[10:30, 20:50] = 7.0
    quad = [[20, 10], [50, 10], [50, 30], [20, 30]]
    crop = pp.rotate_crop(img, quad)
    assert crop.shape == (20, 30)
    assert np.allclose(crop[5:15, 5:25], 7.0, atol=1e-5)


def test_rotate_crop_rotated_quad_uprights_text():
    """A 90°-rotated quad (points walking down the image) produces an
    upright crop; tall crops are rotated to near-horizontal."""
    img = np.arange(40 * 60, dtype=np.float32).reshape(40, 60)
    # quad whose first edge runs vertically: width small, height big
    quad = [[30, 5], [34, 5], [34, 35], [30, 35]]
    crop = pp.rotate_crop(img, quad)
    # raw crop would be 30 tall x 4 wide (ratio 7.5 >= 1.5) -> rot90
    assert crop.shape == (4, 30)


def test_resize_norm_pad_keep_ratio():
    img = np.ones((96, 160), dtype=np.float32)
    out, valid = pp.resize_norm_pad(img, 32, 128)
    assert out.shape == (32, 128)
    used = int(round(valid * 128))
    assert used == min(int(np.ceil(32 * 160 / 96)), 128) == 54
    assert np.allclose(out[:, :54], 1.0, atol=1e-6)
    assert np.allclose(out[:, 54:], 0.0)
