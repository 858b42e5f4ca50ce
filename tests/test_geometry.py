"""Exact convex-polygon geometry (G1/A2): shoelace, Sutherland–Hodgman
clipping, IoU, scanline rasterization, slow box score."""

import numpy as np

from openocr_spark.kernels import geometry as g

RECT_A = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
RECT_B = np.array([[5, 5], [15, 5], [15, 15], [5, 15]], dtype=float)


def test_polygon_area_shoelace():
    assert g.polygon_area(RECT_A) == 100.0
    tri = np.array([[0, 0], [4, 0], [0, 3]], dtype=float)
    assert g.polygon_area(tri) == 6.0
    # winding-independent
    assert g.polygon_area(tri[::-1]) == 6.0


def test_clip_reduces_to_rect_intersection():
    inter = g.clip_polygon(RECT_A, RECT_B)
    assert abs(g.polygon_area(inter) - 25.0) < 1e-9
    # disjoint -> empty
    far = RECT_A + 100
    assert len(g.clip_polygon(RECT_A, far)) == 0
    # containment -> inner polygon
    inner = np.array([[2, 2], [4, 2], [4, 4], [2, 4]], dtype=float)
    assert abs(g.polygon_area(g.clip_polygon(inner, RECT_A)) - 4.0) < 1e-9


def test_polygon_iou_rect_exact():
    # inter 25, union 175 -> exactly the rect formula
    assert abs(g.polygon_iou(RECT_A, RECT_B) - 25.0 / 175.0) < 1e-12


def test_polygon_iou_rotated_quad():
    """45°-rotated square inscribed in the unit square: intersection is
    the rotated square itself (area 50 for side sqrt50), IoU = 50/100."""
    diamond = np.array([[5, 0], [10, 5], [5, 10], [0, 5]], dtype=float)
    iou = g.polygon_iou(diamond, RECT_A)
    assert abs(iou - 50.0 / 100.0) < 1e-9


def test_mask_area_matches_polygon_area():
    diamond = np.array([[20, 2], [38, 20], [20, 38], [2, 20]], dtype=float)
    m = g.polygon_mask(diamond, 40, 40)
    # rasterized pixel count tracks the exact area (648) within the
    # boundary discretization band
    assert abs(int(m.sum()) - g.polygon_area(diamond)) < 40


def test_box_score_slow_rotated():
    """Mean under the exact mask differs from the bbox mean for a
    rotated region — the A1 fast / A2 slow distinction is real."""
    prob = np.full((40, 40), 0.1, dtype=np.float32)
    diamond = np.array([[20, 4], [36, 20], [20, 36], [4, 20]], dtype=float)
    m = g.polygon_mask(diamond, 40, 40)
    prob[m] = 0.9
    slow = g.box_score_slow(prob, diamond)
    assert slow > 0.89  # exact mask: all inside pixels are hot
    bbox_mean = float(prob[4:37, 4:37].mean())  # fast path: dilute corners
    assert bbox_mean < 0.6


def test_metric_iou_uses_polygon_math():
    from openocr_spark.operators.metrics import _iou

    diamond = np.array([[5, 0], [10, 5], [5, 10], [0, 5]], dtype=float)
    assert abs(_iou(diamond, RECT_A) - 0.5) < 1e-9


def test_polygon_mask_off_image_spans_clamped():
    """ADVICE r2 (medium): a scanline span entirely left of the image
    used to produce a negative slice end, which Python wraps around —
    an off-image polygon set most of the row True. Clamping must make
    fully off-frame polygons empty and partially off-frame polygons
    clip to the visible part."""
    # fully off-image to the left
    off_l = np.array([[-10, 2], [-5, 2], [-5, 8], [-10, 8]], dtype=float)
    assert not g.polygon_mask(off_l, 12, 20).any()
    assert g.box_score_slow(np.ones((12, 20)), off_l) == 0.0
    # fully off-image to the right
    off_r = np.array([[25, 2], [30, 2], [30, 8], [25, 8]], dtype=float)
    assert not g.polygon_mask(off_r, 12, 20).any()
    # fully off-image above/below
    off_t = np.array([[2, -9], [8, -9], [8, -3], [2, -3]], dtype=float)
    assert not g.polygon_mask(off_t, 12, 20).any()
    # straddling the left edge: only the in-frame columns light up
    strad = np.array([[-4, 2], [3, 2], [3, 5], [-4, 5]], dtype=float)
    m = g.polygon_mask(strad, 12, 20)
    rows, cols = np.nonzero(m)
    assert cols.min() == 0 and cols.max() == 3
    # y spans are half-open ([y0, y1)): row 5 (the top edge) excluded
    assert rows.min() == 2 and rows.max() == 4
    # straddling the right edge
    strad_r = np.array([[17, 2], [26, 2], [26, 5], [17, 5]], dtype=float)
    m2 = g.polygon_mask(strad_r, 12, 20)
    _, cols2 = np.nonzero(m2)
    assert cols2.min() == 17 and cols2.max() == 19
