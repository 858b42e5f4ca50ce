"""Exact convex-polygon geometry (SURVEY §2.8 G1, §2.4 A2) — numpy from
scratch, no shapely.

The reference scores detection matches with shapely polygon
intersection/union (opendet/metrics/eval_det_iou.py:18-25) and the slow
box-score path masks the exact polygon (db_postprocess.py box_score_slow).
Here:
  polygon_area   — shoelace formula
  clip_polygon   — Sutherland–Hodgman clipping of a polygon against a
                   CONVEX clip polygon (detection quads are convex)
  polygon_iou    — intersection via clipping, union = A + B − I
  polygon_mask   — even-odd scanline rasterization
  box_score_slow — mean probability under the exact polygon mask (the
                   A2 slow path; A1 fast path is the bbox mean in
                   kernels/detection.py)

For axis-aligned rectangles every function reduces exactly to the rect
formulas, so swapping these into the metric kernels changes nothing on
the rect fixtures (pinned by the driver's det oracle staying green)
while making rotated-quad inputs exact.
"""

from __future__ import annotations

import numpy as np


def polygon_area(pts: np.ndarray) -> float:
    """Shoelace area (positive regardless of winding)."""
    p = np.asarray(pts, dtype=np.float64)
    x, y = p[:, 0], p[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def clip_polygon(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip `subject` against CONVEX `clip`.
    Returns the (possibly empty) intersection polygon vertices."""
    clip = np.asarray(clip, dtype=np.float64)
    # ensure counter-clockwise clip winding (signed area > 0)
    x, y = clip[:, 0], clip[:, 1]
    if (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) < 0:
        clip = clip[::-1]
    out = [tuple(p) for p in np.asarray(subject, dtype=np.float64)]
    n = len(clip)
    for i in range(n):
        if not out:
            return np.zeros((0, 2))
        a = clip[i]
        b = clip[(i + 1) % n]
        ex, ey = b[0] - a[0], b[1] - a[1]

        def inside(p):
            return ex * (p[1] - a[1]) - ey * (p[0] - a[0]) >= 0

        def intersect(p, q):
            # line a→b with segment p→q
            dx, dy = q[0] - p[0], q[1] - p[1]
            denom = ex * dy - ey * dx
            if abs(denom) < 1e-12:
                return q
            t = (ex * (a[1] - p[1]) - ey * (a[0] - p[0])) / denom
            return (p[0] + t * dx, p[1] + t * dy)

        nxt = []
        m = len(out)
        for j in range(m):
            cur, prv = out[j], out[j - 1]
            if inside(cur):
                if not inside(prv):
                    nxt.append(intersect(prv, cur))
                nxt.append(cur)
            elif inside(prv):
                nxt.append(intersect(prv, cur))
        out = nxt
    return np.array(out, dtype=np.float64) if out else np.zeros((0, 2))


def polygon_iou(a: np.ndarray, b: np.ndarray) -> float:
    """Exact IoU of two convex polygons (eval_det_iou.py:18-25
    semantics via clipping instead of shapely)."""
    inter_poly = clip_polygon(a, b)
    inter = polygon_area(inter_poly) if len(inter_poly) >= 3 else 0.0
    union = polygon_area(a) + polygon_area(b) - inter
    return inter / union if union > 0 else 0.0


def polygon_intersection_area(a: np.ndarray, b: np.ndarray) -> float:
    inter_poly = clip_polygon(a, b)
    return polygon_area(inter_poly) if len(inter_poly) >= 3 else 0.0


def polygon_mask(pts: np.ndarray, h: int, w: int) -> np.ndarray:
    """Even-odd scanline rasterization at pixel centers (x+0, y+0 —
    integer grid), the from-scratch fillPoly."""
    p = np.asarray(pts, dtype=np.float64)
    mask = np.zeros((h, w), dtype=bool)
    n = len(p)
    ys = np.arange(h, dtype=np.float64)
    for yi, y in enumerate(ys):
        xs: list[float] = []
        for i in range(n):
            x1, y1 = p[i]
            x2, y2 = p[(i + 1) % n]
            if (y1 <= y < y2) or (y2 <= y < y1):
                xs.append(x1 + (y - y1) * (x2 - x1) / (y2 - y1))
        xs.sort()
        for k in range(0, len(xs) - 1, 2):
            # clamp BEFORE slicing: a span entirely off-image (hi < 0 or
            # lo > w-1) must be skipped, never wrap around via negative
            # slice ends
            lo = max(int(np.ceil(xs[k])), 0)
            hi = min(int(np.floor(xs[k + 1])), w - 1)
            if hi >= lo:
                mask[yi, lo : hi + 1] = True
    return mask


def box_score_slow(prob: np.ndarray, pts: np.ndarray) -> float:
    """A2 slow box score: mean probability under the exact polygon mask
    (db_postprocess.py box_score_slow semantics); empty masks score 0."""
    h, w = prob.shape
    m = polygon_mask(pts, h, w)
    if not m.any():
        return 0.0
    return float(prob[m].mean())
