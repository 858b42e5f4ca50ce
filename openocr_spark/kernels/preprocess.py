"""Pixel preprocessing + training-target kernels (SURVEY §2.8 G7, G8,
G11, G15, G16/G17) — numpy from scratch, no cv2/shapely/pyclipper.

Semantics follow the reference, specialized to our surrogate media
(single-channel float maps, axis-aligned rect regions — SURVEY §7.0
design stance):

  det_resize        — DetResizeForTest type0
                      (opendet/preprocess/db_resize_for_test.py:67-115):
                      limit-side ratio, round sides to multiples of 32
                      (min 32), bilinear resample, return (img, rh, rw)
  det_resize_for_test — the FULL DetResizeForTest surface: tiny-input
                      padding + type0/type1/type2 shape arithmetic with
                      the class's kwarg precedence (differentially
                      pinned against the reference class itself in
                      tests/test_preprocess_differential.py)
  normalize_image   — scale/mean/std normalize
                      (opendet/preprocess/__init__.py:19-45)
  crop_margin       — min/max-normalize to u8, inverse-threshold at 200,
                      crop to the bounding rect of content pixels
                      (tools/utils/opendoc_onnx_utils/utils.py:1023-1052)
  make_shrink_map   — DBNet probability-map target: each care region
                      inset by d = area·(1−r²)/perimeter, r=0.4; small
                      or ignored regions zero the loss mask
                      (opendet/preprocess/db_label_encode.py:218-283)
  make_border_map   — DBNet threshold-map target: pad each care region
                      by d, ramp 1−min_edge_distance/d inside the band,
                      scale to [thresh_min, thresh_max]
                      (db_label_encode.py:66-165)
  resize_norm_pad   — keep-ratio resize + zero pad to (H, W), the
                      recognition batch shape normalizer (G16/G17,
                      openrec/preprocess resize family)

Rect edge distances use the standard point-to-segment projection
(clamped parametric t) rather than the reference's law-of-cosines
formulation — same quantity, independent derivation.
"""

from __future__ import annotations

import math

import numpy as np


def bilinear_grids(
    h: int, w: int, out_h: int, out_w: int
) -> tuple[np.ndarray, ...]:
    """Half-pixel-center bilinear gather indices + weights for a
    (h, w) → (out_h, out_w) resample. Depends only on the SHAPES, so
    the label-encode operator precomputes it once per same-shape media
    group and reuses it across the group (the RatioDataSet same-shape
    bucketing idea, tools/data/ratio_dataset.py, applied to resampling
    overhead — a batch-major stacked gather was measured SLOWER than
    the per-image loop, ~3×: gathering one (y, x) across the whole
    batch strides the full image span per element, while per-image
    gathers stay cache-resident)."""
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    return y0, y1, x0, x1, wy, wx


def bilinear_apply(img: np.ndarray, grids: tuple[np.ndarray, ...]) -> np.ndarray:
    """Apply precomputed bilinear_grids to one image (the single shared
    resample formula — bilinear_resize routes through here too)."""
    y0, y1, x0, x1, wy, wx = grids
    img = img.astype(np.float64, copy=False)
    out = (
        img[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
        + img[np.ix_(y0, x1)] * (1 - wy) * wx
        + img[np.ix_(y1, x0)] * wy * (1 - wx)
        + img[np.ix_(y1, x1)] * wy * wx
    )
    return out.astype(np.float32)


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """2-D bilinear resample with half-pixel centers."""
    h, w = img.shape
    if (h, w) == (out_h, out_w):
        return img.astype(np.float32, copy=True)
    return bilinear_apply(img, bilinear_grids(h, w, out_h, out_w))


def image_padding(img: np.ndarray, value: int = 0) -> np.ndarray:
    """G7 tiny-input pre-pad (db_resize_for_test.py:47-51): inputs with
    h + w < 64 are value-padded to at least 32×32 BEFORE the resize, so
    content keeps its scale in the top-left corner instead of being
    stretched to the target shape."""
    h, w = img.shape[:2]
    out = np.zeros((max(32, h), max(32, w)) + img.shape[2:], img.dtype) + value
    out[:h, :w, ...] = img
    return out


def det_resize_shape_type1(
    h: int, w: int, image_shape: tuple[int, int], keep_ratio: bool = False
) -> tuple[int, int]:
    """G7 fixed-target shape arithmetic (db_resize_for_test.py:53-65):
    resize to image_shape outright, or — keep_ratio — hold the height
    and ceil the ratio-preserving width up to a multiple of 32."""
    resize_h, resize_w = image_shape
    if keep_ratio:
        resize_w = w * resize_h / float(h)
        resize_w = int(math.ceil(resize_w / 32) * 32)
    return int(resize_h), int(resize_w)


def det_resize_shape_type2(
    h: int, w: int, resize_long: int = 960
) -> tuple[int, int]:
    """G7 long-side shape arithmetic (db_resize_for_test.py:116-131):
    scale the LONG side to resize_long, then ceil both sides up to a
    multiple of the 128 max stride (ceil, unlike type0's round-to-32)."""
    ratio = float(resize_long) / max(h, w)
    resize_h = int(h * ratio)
    resize_w = int(w * ratio)
    stride = 128
    return (
        (resize_h + stride - 1) // stride * stride,
        (resize_w + stride - 1) // stride * stride,
    )


def _resize_nd(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """bilinear_resize for 2-D gray or per-channel 3-D images (grids
    built once and shared across channels — they depend only on shape)."""
    if img.ndim == 2:
        return bilinear_resize(img, out_h, out_w)
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img.astype(np.float32, copy=True)
    grids = bilinear_grids(h, w, out_h, out_w)
    return np.stack(
        [bilinear_apply(img[:, :, c], grids) for c in range(img.shape[2])],
        axis=2,
    )


def det_resize_for_test(
    img: np.ndarray,
    image_shape: tuple[int, int] | None = None,
    keep_ratio: bool = False,
    limit_side_len: int | None = None,
    limit_type: str = "min",
    resize_long: int | None = None,
) -> tuple[np.ndarray, float, float]:
    """G7: the reference's FULL DetResizeForTest surface as a function,
    kwarg precedence exactly the class's __init__
    (db_resize_for_test.py:7-26): image_shape → type1 (fixed target /
    keep-ratio width), elif limit_side_len → type0 (round-to-32 under a
    side limit), elif resize_long → type2 (ceil-to-128 long-side), else
    the 736/'min' type0 default. Inputs with h + w < 64 pad through
    image_padding first (:47-51); returned ratios are resize/padded —
    the reference's data['shape'][2:]."""
    if img.shape[0] + img.shape[1] < 64:
        img = image_padding(img)
    h, w = img.shape[:2]
    if image_shape is not None:
        rh, rw = det_resize_shape_type1(h, w, image_shape, keep_ratio)
    elif limit_side_len is not None:
        rh, rw = det_resize_shape(h, w, limit_side_len, limit_type)
    elif resize_long is not None:
        rh, rw = det_resize_shape_type2(h, w, resize_long)
    else:
        rh, rw = det_resize_shape(h, w, 736, "min")
    if rh <= 0 or rw <= 0:
        # type2's ceil-128 of int(h·ratio) hits 0 for extreme aspect
        # ratios (e.g. 1×1000 at resize_long=128); the reference
        # crashes inside cv2.resize on the zero size — fail loud here
        # instead of emitting an empty raster with a 0.0 ratio
        raise ValueError(
            f"degenerate resize target {rh}x{rw} for input {h}x{w}"
        )
    return _resize_nd(img, rh, rw), rh / float(h), rw / float(w)


def det_stats_shapes(
    h: int,
    w: int,
    limit_side_len: int = 64,
    limit_type: str = "resize_long",
    rec_h: int = 32,
    rec_w: int = 128,
) -> tuple[int, int, int, int, int]:
    """Shape arithmetic for the det_training_targets stats operator,
    raised to a testable altitude: returns (padded_h, padded_w,
    resized_h, resized_w, rec_valid_w). Applies DetResizeForTest's
    tiny-input pre-pad (h+w<64 → ≥32×32, db_resize_for_test.py:47-51)
    before the type0 shape math — ratios downstream are resize/PADDED
    dims, the reference's data['shape'][2:]. rec_valid_w uses the
    reference expression order ceil(rec_h·(w/float(h))) on the RAW dims
    (the rec path resizes crops, which are never pre-padded)."""
    ph, pw = (max(32, h), max(32, w)) if h + w < 64 else (h, w)
    rh, rw = det_resize_shape(ph, pw, limit_side_len, limit_type)
    nw = max(min(int(np.ceil(rec_h * (w / float(h)))), rec_w), 1)
    return ph, pw, rh, rw, nw


def det_resize_shape(
    h: int, w: int, limit_side_len: int = 736, limit_type: str = "min"
) -> tuple[int, int]:
    """G7 target-shape arithmetic (multiple-of-32 under a side-length
    limit) without the resample — shared by det_resize and the
    shape-grouped batch path (db_resize_for_test.py:113-114)."""
    if limit_type == "max":
        ratio = float(limit_side_len) / max(h, w) if max(h, w) > limit_side_len else 1.0
    elif limit_type == "min":
        ratio = float(limit_side_len) / min(h, w) if min(h, w) < limit_side_len else 1.0
    elif limit_type == "resize_long":
        ratio = float(limit_side_len) / max(h, w)
    else:
        raise ValueError(f"unsupported limit_type {limit_type!r}")
    resize_h = max(int(round(int(h * ratio) / 32) * 32), 32)
    resize_w = max(int(round(int(w * ratio) / 32) * 32), 32)
    return resize_h, resize_w


def det_resize(
    img: np.ndarray,
    limit_side_len: int = 736,
    limit_type: str = "min",
) -> tuple[np.ndarray, float, float]:
    """G7: resize to a multiple-of-32 shape under a side-length limit;
    returns (resized, ratio_h, ratio_w) with the post-rounding ratios
    (db_resize_for_test.py:113-114). Routes through det_resize_for_test
    so tiny inputs (h + w < 64) get the reference's zero-pad pre-step."""
    return det_resize_for_test(
        img, limit_side_len=limit_side_len, limit_type=limit_type
    )


def normalize_image(
    img: np.ndarray,
    scale: float = 1.0 / 255.0,
    mean: float = 0.485,
    std: float = 0.229,
) -> np.ndarray:
    """G8: (img·scale − mean) / std (single-channel form of
    opendet/preprocess/__init__.py:40-44)."""
    return ((img.astype(np.float32) * np.float32(scale)) - np.float32(mean)) / np.float32(std)


def crop_margin(img: np.ndarray, thresh: int = 200) -> np.ndarray:
    """G11: crop to the content bounding box. Gray is min/max-normalized
    to u8; pixels ≤ thresh after normalization are content
    (THRESH_BINARY_INV semantics — content is DARK on a light page,
    utils.py:1040-1050); uniform images return unchanged."""
    gray = img
    if gray.dtype != np.uint8:
        gray = gray.astype(np.uint8)
    mx, mn = int(gray.max()), int(gray.min())
    if mx == mn:
        return img
    # 256-entry LUT: the normalization depends only on the byte value,
    # so computing it per DISTINCT value and gathering (np.take) is
    # byte-identical to the former full-image float64 divide and ~10×
    # cheaper (the divide was most of this kernel's cost)
    lut = ((np.arange(256, dtype=np.float64) - mn) / (mx - mn) * 255).astype(
        np.uint8
    )
    content = lut[gray] <= thresh
    rows = np.flatnonzero(content.any(axis=1))
    if rows.size == 0:
        return img
    cols = np.flatnonzero(content.any(axis=0))
    return img[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]


def _rect_shrink_distance(x0: float, y0: float, x1: float, y1: float, ratio: float) -> float:
    """d = area·(1−r²)/perimeter for the axis-aligned rect polygon."""
    w = x1 - x0
    h = y1 - y0
    area = w * h
    perim = 2.0 * (w + h)
    return area * (1.0 - ratio**2) / max(perim, 1e-9)


def make_shrink_map(
    rects: list[tuple[float, float, float, float]],
    ignore: list[bool],
    h: int,
    w: int,
    shrink_ratio: float = 0.4,
    min_text_size: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """G15a: DBNet probability-map training target for rect regions.
    Returns (gt, mask): gt=1 inside each care rect inset by d; ignored
    or too-small rects zero the loss mask over their full extent."""
    gt = np.zeros((h, w), dtype=np.float32)
    mask = np.ones((h, w), dtype=np.float32)
    for (x0, y0, x1, y1), ig in zip(rects, ignore):
        rw, rh = x1 - x0, y1 - y0
        ix0, iy0 = int(round(x0)), int(round(y0))
        ix1, iy1 = int(round(x1)), int(round(y1))
        if ig or min(rw, rh) < min_text_size:
            mask[max(iy0, 0) : iy1 + 1, max(ix0, 0) : ix1 + 1] = 0.0
            continue
        d = int(round(_rect_shrink_distance(x0, y0, x1, y1, shrink_ratio)))
        sx0, sy0 = ix0 + d, iy0 + d
        sx1, sy1 = ix1 - d, iy1 - d
        if sx1 >= sx0 and sy1 >= sy0:
            gt[max(sy0, 0) : sy1 + 1, max(sx0, 0) : sx1 + 1] = 1.0
        else:
            mask[max(iy0, 0) : iy1 + 1, max(ix0, 0) : ix1 + 1] = 0.0
    return gt, mask


def make_border_map(
    rects: list[tuple[float, float, float, float]],
    ignore: list[bool],
    h: int,
    w: int,
    shrink_ratio: float = 0.4,
    thresh_min: float = 0.3,
    thresh_max: float = 0.7,
) -> tuple[np.ndarray, np.ndarray]:
    """G15b: DBNet threshold-map training target. For each care rect,
    pad by d; inside the padded box the value is max(1 − min distance
    to the rect's 4 edges / d, existing); finally scale the canvas to
    [thresh_min, thresh_max]. mask=1 over padded extents."""
    canvas = np.zeros((h, w), dtype=np.float32)
    mask = np.zeros((h, w), dtype=np.float32)
    for (x0, y0, x1, y1), ig in zip(rects, ignore):
        if ig:
            continue
        d = _rect_shrink_distance(x0, y0, x1, y1, shrink_ratio)
        if d <= 0:
            continue
        px0, py0 = int(np.floor(x0 - d)), int(np.floor(y0 - d))
        px1, py1 = int(np.ceil(x1 + d)), int(np.ceil(y1 + d))
        vx0, vy0 = max(px0, 0), max(py0, 0)
        vx1, vy1 = min(px1, w - 1), min(py1, h - 1)
        if vx1 < vx0 or vy1 < vy0:
            continue
        mask[vy0 : vy1 + 1, vx0 : vx1 + 1] = 1.0
        # min point-to-segment distance over the rect's 4 edges, with
        # the clamped projection specialized for axis-aligned segments:
        # projecting onto a horizontal edge clamps x to [x0, x1] (resp.
        # vertical: y to [y0, y1]), so each edge distance is one hypot
        # over broadcast row/col vectors — no mgrid materialization and
        # no 4×H×W stack (was 42% of the preproc kernel; ~4× faster,
        # same per-segment derivation the oracle deliberately does NOT
        # share — fixture_oracle uses the regional inside/outside form)
        gx = np.arange(vx0, vx1 + 1, dtype=np.float64)[None, :]
        gy = np.arange(vy0, vy1 + 1, dtype=np.float64)[:, None]
        ex = gx - np.clip(gx, x0, x1)  # 0 across the edge's x-span
        ey = gy - np.clip(gy, y0, y1)
        # the two horizontal edges share ex, so their min collapses to
        # one hypot with min(|y−y0|, |y−y1|) (hypot is monotone in the
        # second magnitude; correctly-rounded, so exactly equal to
        # min-of-two-hypots) — 2 hypots total instead of 4
        ay = np.minimum(np.abs(gy - y0), np.abs(gy - y1))
        ax = np.minimum(np.abs(gx - x0), np.abs(gx - x1))
        dist = np.minimum(np.hypot(ex, ay), np.hypot(ax, ey))
        ramp = 1.0 - np.clip(dist / d, 0.0, 1.0)
        region = canvas[vy0 : vy1 + 1, vx0 : vx1 + 1]
        canvas[vy0 : vy1 + 1, vx0 : vx1 + 1] = np.fmax(region, ramp)
    canvas = canvas * (thresh_max - thresh_min) + thresh_min
    return canvas, mask


def perspective_matrix(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3×3 homography H with H·[x,y,1]ᵀ ∝ [u,v,1]ᵀ for the 4 point
    pairs, via the standard 8×8 DLT linear system (the from-scratch
    equivalent of getPerspectiveTransform)."""
    A = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        x, y = float(src[i][0]), float(src[i][1])
        u, v = float(dst[i][0]), float(dst[i][1])
        A[2 * i] = [x, y, 1, 0, 0, 0, -x * u, -y * u]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -x * v, -y * v]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(A, b)
    return np.array(
        [[h[0], h[1], h[2]], [h[3], h[4], h[5]], [h[6], h[7], 1.0]]
    )


def warp_perspective(
    img: np.ndarray, H: np.ndarray, out_h: int, out_w: int
) -> np.ndarray:
    """Inverse-map warp: for every destination pixel, solve back to the
    source via H⁻¹ and bilinearly sample with border-replicate (clip).
    Vectorized over the whole destination grid."""
    Hinv = np.linalg.inv(H)
    gy, gx = np.mgrid[0:out_h, 0:out_w]
    ones = np.ones_like(gx, dtype=np.float64)
    pts = np.stack([gx.astype(np.float64), gy.astype(np.float64), ones])
    src = Hinv @ pts.reshape(3, -1)
    sx = (src[0] / src[2]).reshape(out_h, out_w)
    sy = (src[1] / src[2]).reshape(out_h, out_w)
    h, w = img.shape
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    wx = np.clip(sx - x0, 0.0, 1.0)
    wy = np.clip(sy - y0, 0.0, 1.0)
    im = img.astype(np.float64)
    out = (
        im[y0, x0] * (1 - wy) * (1 - wx)
        + im[y0, x1] * (1 - wy) * wx
        + im[y1, x0] * wy * (1 - wx)
        + im[y1, x1] * wy * wx
    )
    return out.astype(np.float32)


def rotate_crop(img: np.ndarray, points: np.ndarray) -> np.ndarray:
    """G5: perspective quad crop (tools/infer/utility.py:177-202
    get_rotate_crop_image): destination size from the quad's side
    lengths, homography quad→upright rect, warp (bilinear here vs the
    reference's INTER_CUBIC — same geometry, smoother-kernel detail
    differs), then rotate 90° when the crop is tall (h/w ≥ 1.5) so the
    recognizer always sees near-horizontal text."""
    pts = np.asarray(points, dtype=np.float64)
    assert pts.shape == (4, 2), "quad required"
    out_w = int(
        max(np.linalg.norm(pts[0] - pts[1]), np.linalg.norm(pts[2] - pts[3]))
    )
    out_h = int(
        max(np.linalg.norm(pts[0] - pts[3]), np.linalg.norm(pts[1] - pts[2]))
    )
    out_w, out_h = max(out_w, 1), max(out_h, 1)
    dst = np.array(
        [[0, 0], [out_w, 0], [out_w, out_h], [0, out_h]], dtype=np.float64
    )
    H = perspective_matrix(pts, dst)
    crop = warp_perspective(img, H, out_h, out_w)
    if out_h / max(out_w, 1) >= 1.5:
        crop = np.rot90(crop)
    return crop


def resize_norm_pad(
    img: np.ndarray, target_h: int, target_w: int
) -> tuple[np.ndarray, float]:
    """G16/G17: keep-ratio resize to height target_h (width capped at
    target_w), zero-pad right to the full width; returns (padded,
    valid_ratio = used_width / target_w) — the recognition batch shape
    normalizer (openrec/preprocess/resize.py:402-431 resize_norm_img /
    RecTVResize width rule). The width uses the reference's exact
    expression order ceil(target_h · (w / float(h))) — ratio FIRST:
    for power-of-2 heights the two associativity orders are provably
    identical (×2^k is exact), and for the reference's non-pow2 config
    heights (48/40) divergent pairs only occur above the width cap,
    but expression-identical means never having to make that argument."""
    h, w = img.shape
    ratio = w / float(h)
    new_w = (
        target_w
        if math.ceil(target_h * ratio) > target_w
        else int(math.ceil(target_h * ratio))
    )
    resized = bilinear_resize(img, target_h, max(new_w, 1))
    out = np.zeros((target_h, target_w), dtype=np.float32)
    out[:, : resized.shape[1]] = resized
    return out, resized.shape[1] / float(target_w)
