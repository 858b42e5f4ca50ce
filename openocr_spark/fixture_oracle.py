"""Oracle parquet tables for the kernel-space driver queries
(VERDICT r1 item 4: give the rows-only queries real oracles).

The five kernel-space queries (det_metric_fixture, rec_metric_fixture,
doc_parse, doc_markdown, extract_spans) are not SQL-expressible from the
driver's base tables — their inputs pass through numpy kernels
(connected components, CTC/AR decode, layout geometry). The oracle side
is therefore the INDEPENDENT single-node implementation (oracle.py:
eager per-doc loops, BFS flood fill, per-timestep decode) materialized
to parquet; the driver's DuckDB then reads these tables with
read_parquet() and — where the remaining aggregation is relational
(greedy det matching, acc/NED) — recomputes the metric in SQL, checking
the Spark dataflow against an engine-independent computation.

Everything derives from /root/testdata/sf0.01 — the driver's documented
correctness SF ("runs YOUR Spark query AND your oracle SQL side-by-side
at sf=0.01"). Generation is cached on disk keyed by a version stamp;
`ensure()` is invoked from __spark_entry__.oracle_sql().
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd

from openocr_spark.config import DEFAULT_CONFIG

_ORACLE_BASE = os.environ.get("OPENOCR_ORACLE_DIR", "/tmp/openocr_oracle")
CORRECTNESS_SF_DIR = "/root/testdata/sf0.01"
# manual stamp for intentional invalidation; the cache key ALSO folds in
# a hash of the generating modules' sources, so semantics changes
# regenerate even without a bump
VERSION = "r3-1"

# modules whose code determines the oracle tables' contents — the
# TRANSITIVE dependency set of the generators (oracle.py pulls in
# config constants, the doc-parse/layout oracles, and the markdown
# converter), not just the directly-invoked files
_GEN_SOURCES = (
    "fixture_oracle.py",
    "oracle.py",
    "fixtures.py",
    "config.py",
    "kernels/tokenizer.py",
    "functions/text.py",
    "functions/markdown.py",
    "functions/otsl.py",
    "functions/exprs.py",
    "operators/ingest.py",
    "operators/doc_parse.py",
    "operators/layout.py",
    "operators/boilerplate.py",
)


def _src_stamp() -> str:
    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.md5()
    for rel in _GEN_SOURCES:
        try:
            with open(os.path.join(root, rel), "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(rel.encode())
    return h.hexdigest()[:10]


# version-keyed directory: a semantics change lands in a NEW directory,
# so a concurrent driver still reading the old version's tables is
# never served a half-regenerated mix
ORACLE_DIR = f"{_ORACLE_BASE}/{VERSION}-{_src_stamp()}"

NULL = "\\N"
FS = "\x1f"  # field separator
RS = "\x1e"  # row separator


def path(name: str) -> str:
    return f"{ORACLE_DIR}/{name}.parquet"


def span_seq_md5(rows: list[tuple]) -> str:
    """Canonical hash of an ordered span tuple sequence. Mirrored by the
    Spark queries with md5(array_join(transform(...), RS)) — the fields
    are FS-joined per span with NULL for missing values."""
    parts = [
        FS.join(NULL if v is None else str(v) for v in row) for row in rows
    ]
    return hashlib.md5(RS.join(parts).encode()).hexdigest()


def _doc_ids(sf_dir: str) -> list[str]:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return sorted(str(d) for d in docs["doc_id"])


def _gen_extract_spans(sf_dir: str) -> pd.DataFrame:
    """(doc_id, n_spans, n_media_spans, spans_md5) via the single-node
    extraction oracle over the interleaved driver corpus."""
    from openocr_spark.operators.ingest import _spans_for_text
    from openocr_spark.oracle import extract_media_text, is_boilerplate

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        doc_id = str(doc_id)
        spans = _spans_for_text(doc_id, text if isinstance(text, str) else "")
        kept = []
        for s in sorted(spans, key=lambda s: s["offset"]):
            if s["kind"] == "text":
                if is_boilerplate(s["text"]):
                    continue
                kept.append(("text", s["text"], None))
            else:
                kept.append(("media", extract_media_text(s["media_ref"]), s["media_ref"]))
        rows = [(k, t, m, i) for i, (k, t, m) in enumerate(kept)]
        out.append(
            {
                "doc_id": doc_id,
                "n_spans": len(rows),
                "n_media_spans": sum(1 for r in rows if r[0] == "media"),
                "spans_md5": span_seq_md5(rows),
            }
        )
    return pd.DataFrame(out)


def _media_refs(sf_dir: str) -> list[str]:
    from openocr_spark.operators.ingest import _spans_for_text

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    refs = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for s in _spans_for_text(str(doc_id), text if isinstance(text, str) else ""):
            if s["kind"] == "media":
                refs.append(s["media_ref"])
    return refs


def _gen_det_tables(
    sf_dir: str,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """det_pred (media_ref, det_idx, x0..y1, conf), det_gt (media_ref,
    gt_idx, x0..y1, ignore), rec_pairs (pred, gt), det_flags (media_ref,
    det_idx, conf, matched — the eager greedy don't-care exclusion +
    1:1 IoU>0.5 matching, eval_det_iou.py semantics) — from the
    single-node oracle pipeline + the fixture payload generator."""
    from openocr_spark.fixtures import payload_for_media_ref
    from openocr_spark.oracle import media_detail

    def inter(a, b):
        return max(0.0, min(a[2], b[2]) - max(a[0], b[0])) * max(
            0.0, min(a[3], b[3]) - max(a[1], b[1])
        )

    preds, gts, pairs, flags = [], [], [], []
    for ref in _media_refs(sf_dir):
        m_pred = []
        for d in media_detail(ref):
            pts = d["points"]
            rect = (
                float(pts[0][0]), float(pts[0][1]),
                float(pts[2][0]), float(pts[2][1]),
            )
            m_pred.append((d["region_idx"], rect, float(d["det_score"])))
            preds.append(
                {
                    "media_ref": ref,
                    "det_idx": d["region_idx"],
                    "x0": rect[0], "y0": rect[1], "x1": rect[2], "y1": rect[3],
                    "conf": float(d["det_score"]),
                }
            )
            # the single source of the recognition-confidence cutoff is
            # ExtractConfig.drop_score — never re-type the constant here
            if (d["rec_score"] >= DEFAULT_CONFIG.drop_score
                    and d["gt_text"] is not None):
                pairs.append({"pred": d["transcription"], "gt": d["gt_text"]})
        m_gt = []
        for gi, r in enumerate(payload_for_media_ref(ref)["regions"]):
            p = r["points"]
            rect = (float(p[0][0]), float(p[0][1]), float(p[2][0]), float(p[2][1]))
            m_gt.append((rect, bool(r["ignore"])))
            gts.append(
                {
                    "media_ref": ref,
                    "gt_idx": gi,
                    "x0": rect[0], "y0": rect[1], "x1": rect[2], "y1": rect[3],
                    "ignore": bool(r["ignore"]),
                }
            )
        # eager don't-care exclusion + greedy matching for AP flags
        gt_care = [r for r, ig in m_gt if not ig]
        gt_dc = [r for r, ig in m_gt if ig]
        det_care = []
        for idx, pr, conf in m_pred:
            area = max((pr[2] - pr[0]) * (pr[3] - pr[1]), 1e-9)
            if any(inter(pr, dc) / area > 0.5 for dc in gt_dc):
                continue
            det_care.append((idx, pr, conf))

        # INVARIANT the det_metric_fixture SQL oracle depends on: its
        # mutual-first window emulation (m1/m2) equals sequential greedy
        # matching only when no det has IoU>0.5 with >1 GT and vice
        # versa. Check the precondition here, loudly, so a fixture or
        # geometry change fails generation instead of desynchronizing
        # Spark vs oracle with a confusing metric mismatch.
        def _iou_r(a, b):
            i = inter(a, b)
            ua = (
                (a[2] - a[0]) * (a[3] - a[1])
                + (b[2] - b[0]) * (b[3] - b[1])
                - i
            )
            return i / ua if ua > 0 else 0.0

        for _idx, dr, _c in det_care:
            n = sum(1 for gr in gt_care if _iou_r(gr, dr) > 0.5)
            if n > 1:
                raise ValueError(
                    f"fixture invariant violated on {ref}: detection "
                    f"{_idx} overlaps {n} care GTs at IoU>0.5 — the SQL "
                    "greedy-match emulation requires multiplicity 1"
                )
        for gi, gr in enumerate(gt_care):
            n = sum(1 for _i, dr, _c in det_care if _iou_r(gr, dr) > 0.5)
            if n > 1:
                raise ValueError(
                    f"fixture invariant violated on {ref}: care GT {gi} "
                    f"overlaps {n} care detections at IoU>0.5 — the SQL "
                    "greedy-match emulation requires multiplicity 1"
                )

        used: set[int] = set()
        for gr in gt_care:
            for di, (idx, dr, _c) in enumerate(det_care):
                if di in used:
                    continue
                i = inter(gr, dr)
                ua = (
                    (gr[2] - gr[0]) * (gr[3] - gr[1])
                    + (dr[2] - dr[0]) * (dr[3] - dr[1])
                    - i
                )
                if ua > 0 and i / ua > 0.5:
                    used.add(di)
                    break
        for di, (idx, _dr, conf) in enumerate(det_care):
            flags.append(
                {
                    "media_ref": ref,
                    "det_idx": idx,
                    "conf": conf,
                    "matched": di in used,
                }
            )
    return (
        pd.DataFrame(preds),
        pd.DataFrame(gts),
        pd.DataFrame(pairs),
        pd.DataFrame(flags),
    )


def _gen_rec_heads(sf_dir: str) -> pd.DataFrame:
    """(media_ref, region_idx, head, text, conf) — every region's logits
    decoded under each head family by the independent eager oracle
    (oracle.rec_heads_rows)."""
    from openocr_spark.oracle import rec_heads_rows

    rows = []
    for ref in _media_refs(sf_dir):
        rows.extend(rec_heads_rows(ref))
    return pd.DataFrame(
        rows, columns=["media_ref", "region_idx", "head", "text", "conf"]
    )


def _gen_rec_long_pairs(
    sf_dir: str, window: int = 48, stride: int = 40
) -> pd.DataFrame:
    """(doc_id, pred, gt): eager slicing + suffix/prefix-overlap merge
    per document (rec_metric_long flow; merge kernel shared with the
    streaming operator by design)."""
    import math

    from openocr_spark.functions.text import stream_merge

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        t = text if isinstance(text, str) else ""
        n = max(1, math.ceil((len(t) - window) / stride) + 1)
        slices = [t[i * stride : i * stride + window] for i in range(n)]
        rows.append(
            {"doc_id": str(doc_id), "pred": stream_merge(slices), "gt": t}
        )
    return pd.DataFrame(rows)


def _gen_doc_tables(sf_dir: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    """doc_parse (doc_id, n_spans, n_tables, spans_md5) and doc_markdown
    (doc_id, markdown_len, markdown_md5) via the single-node doc oracle
    over the deterministic layout fixture."""
    from openocr_spark.fixtures import layout_blocks_for_doc
    from openocr_spark.oracle import doc_markdown_oracle, doc_parse_oracle

    ids = _doc_ids(sf_dir)
    blocks = pd.DataFrame(
        [b for d in ids for b in layout_blocks_for_doc(d)]
    )
    parsed = doc_parse_oracle(blocks)
    mds = doc_markdown_oracle(blocks)
    p_rows, m_rows = [], []
    for d in ids:
        spans = parsed.get(d, [])
        rows = [(s["kind"], s["text"], s["block_id"], s["order"]) for s in spans]
        p_rows.append(
            {
                "doc_id": d,
                "n_spans": len(rows),
                "n_tables": sum(1 for r in rows if r[0] == "table"),
                "spans_md5": span_seq_md5(rows),
            }
        )
        md = mds.get(d, "")
        m_rows.append(
            {
                "doc_id": d,
                "markdown_len": len(md),
                "markdown_md5": hashlib.md5(md.encode()).hexdigest(),
            }
        )
    return pd.DataFrame(p_rows), pd.DataFrame(m_rows)


def _union_pixel_count(boxes: list[tuple[int, int, int, int]]) -> int:
    """Pixel count of the union of inclusive integer boxes
    (vx0, vy0, vx1, vy1) — coordinate-compression sweep, pure
    arithmetic, no rasterization."""
    if not boxes:
        return 0
    xs = sorted({b[0] for b in boxes} | {b[2] + 1 for b in boxes})
    total = 0
    for xa, xb in zip(xs, xs[1:]):
        ivals = sorted(
            (b[1], b[3]) for b in boxes if b[0] <= xa and b[2] + 1 >= xb
        )
        if not ivals:
            continue
        cov = 0
        c0, c1 = ivals[0]
        for y0, y1 in ivals[1:]:
            if y0 <= c1 + 1:
                c1 = max(c1, y1)
            else:
                cov += c1 - c0 + 1
                c0, c1 = y0, y1
        cov += c1 - c0 + 1
        total += (xb - xa) * cov
    return total


def _border_map_oracle(
    regions: list[dict],
    h: int,
    w: int,
    shrink_ratio: float = 0.4,
    tmin: float = 0.3,
    tmax: float = 0.7,
) -> tuple[int, float]:
    """(mask_ones, canvas_sum) for the G15 border map — VERDICT r2 item
    4. mask_ones is CLOSED FORM (union of padded clipped boxes, no
    canvas); the canvas sum is an independent rasterization using the
    REGIONAL rect-boundary distance (inside: min edge inset; outside:
    hypot to the clamped point) instead of the kernel's per-segment
    point-to-segment distances — mathematically equal, derived
    differently, matching up to float32 ulps (both sides round the sum
    to 2 decimals)."""
    import numpy as np

    canvas = np.zeros((h, w), dtype=np.float32)
    vis_boxes: list[tuple[int, int, int, int]] = []
    for r in regions:
        if r["ignore"]:
            continue
        p = r["points"]
        x0, y0, x1, y1 = float(p[0][0]), float(p[0][1]), float(p[2][0]), float(p[2][1])
        bw, bh = x1 - x0, y1 - y0
        d = (bw * bh) * (1.0 - shrink_ratio**2) / max(2.0 * (bw + bh), 1e-9)
        if d <= 0:
            continue
        vx0 = max(int(np.floor(x0 - d)), 0)
        vy0 = max(int(np.floor(y0 - d)), 0)
        vx1 = min(int(np.ceil(x1 + d)), w - 1)
        vy1 = min(int(np.ceil(y1 + d)), h - 1)
        if vx1 < vx0 or vy1 < vy0:
            continue
        vis_boxes.append((vx0, vy0, vx1, vy1))
        gy, gx = np.mgrid[vy0 : vy1 + 1, vx0 : vx1 + 1]
        gx = gx.astype(np.float64)
        gy = gy.astype(np.float64)
        inside = (gx >= x0) & (gx <= x1) & (gy >= y0) & (gy <= y1)
        din = np.minimum(np.minimum(gx - x0, x1 - gx), np.minimum(gy - y0, y1 - gy))
        dout = np.hypot(
            np.maximum(np.maximum(x0 - gx, 0.0), gx - x1),
            np.maximum(np.maximum(y0 - gy, 0.0), gy - y1),
        )
        dist = np.where(inside, din, dout)
        ramp = 1.0 - np.clip(dist / d, 0.0, 1.0)
        region = canvas[vy0 : vy1 + 1, vx0 : vx1 + 1]
        canvas[vy0 : vy1 + 1, vx0 : vx1 + 1] = np.fmax(region, ramp)
    scaled = canvas * (tmax - tmin) + tmin
    return _union_pixel_count(vis_boxes), round(float(scaled.sum()), 2)


def _gen_preproc_stats(
    sf_dir: str,
    limit_side_len: int = 64,
    rec_h: int = 32,
    rec_w: int = 128,
    h: int = 96,
    w: int = 160,
) -> pd.DataFrame:
    """Closed-form preprocessing/training-target statistics per media —
    pure arithmetic from the region geometry, NO rasterization, so it
    independently checks the kernel's pixel semantics:
      resize: DetResize type0 rounding math
      shrink_pos: Σ care-rect inset counts (regions are disjoint)
      mask_zero: Σ ignored/too-small rect extents
      crop: union bbox of the painted (shrunk-paint) rects
      pad_valid_ratio: keep-ratio width / target width
    """
    import math

    from openocr_spark.fixtures import payload_for_media_ref

    # DetResize type0 (resize_long) closed form — constant-shape media.
    # DetResizeForTest's tiny-input pre-pad (h+w<64 → ≥32×32,
    # db_resize_for_test.py:47-51) is encoded in lockstep with the
    # engine even though fixture media never trigger it; ratios are
    # resize/PADDED dims per the reference
    ph, pw = (max(32, h), max(32, w)) if h + w < 64 else (h, w)
    ratio = float(limit_side_len) / max(ph, pw)
    resized_h = max(int(round(int(ph * ratio) / 32) * 32), 32)
    resized_w = max(int(round(int(pw * ratio) / 32) * 32), 32)
    ratio_h = round(resized_h / float(ph), 6)
    ratio_w = round(resized_w / float(pw), 6)
    pad_valid = round(min(math.ceil(rec_h * w / h), rec_w) / float(rec_w), 6)

    rows = []
    for ref in _media_refs(sf_dir):
        regions = payload_for_media_ref(ref)["regions"]
        bmap_ones, bmap_sum = _border_map_oracle(regions, h, w)
        shrink_pos = 0
        mask_zero = 0
        crop_rows: list[tuple[int, int]] = []
        crop_cols: list[tuple[int, int]] = []
        for r in regions:
            p = r["points"]
            x0, y0, x1, y1 = p[0][0], p[0][1], p[2][0], p[2][1]
            bw, bh = x1 - x0, y1 - y0
            # G15 shrink target math (ratio 0.4)
            if r["ignore"] or min(bw, bh) < 8:
                mask_zero += (bw + 1) * (bh + 1)
            else:
                d = int(round(bw * bh * (1 - 0.4**2) / (2.0 * (bw + bh))))
                ih, iw = bh - 2 * d + 1, bw - 2 * d + 1
                if ih > 0 and iw > 0:
                    shrink_pos += ih * iw
                else:
                    mask_zero += (bw + 1) * (bh + 1)
            # paint extent (fixtures.py shrink-paint pairing)
            area = float((bw + 1) * (bh + 1))
            perim = 2.0 * (bw + bh + 2)
            dp = int(round(area * 0.84 / perim))
            dp = max(0, min(dp, (bw - 4) // 2, (bh - 4) // 2))
            crop_rows.append((y0 + dp, y1 - dp))
            crop_cols.append((x0 + dp, x1 - dp))
        crop_h = max(r1 for _, r1 in crop_rows) - min(r0 for r0, _ in crop_rows) + 1
        crop_w = max(c1 for _, c1 in crop_cols) - min(c0 for c0, _ in crop_cols) + 1
        rows.append(
            {
                "media_ref": ref,
                "h": h, "w": w,
                "resized_h": resized_h, "resized_w": resized_w,
                "ratio_h": ratio_h, "ratio_w": ratio_w,
                "shrink_pos": shrink_pos, "mask_zero": mask_zero,
                "border_mask_pos": bmap_ones, "border_sum": bmap_sum,
                "crop_h": crop_h, "crop_w": crop_w,
                "pad_valid_ratio": pad_valid,
            }
        )
    return pd.DataFrame(rows)


def ensure(sf_dir: str = CORRECTNESS_SF_DIR, force: bool = False) -> str:
    """Generate the oracle parquet tables if missing or stale; returns
    ORACLE_DIR. Idempotent, cached, and ATOMIC: tables are written into
    a private temp directory and renamed into place in one step, so a
    concurrent reader either sees the complete version-keyed directory
    or none at all — never partially written tables."""
    import shutil

    marker = f"{ORACLE_DIR}/marker.json"
    want = {"version": VERSION, "sf_dir": sf_dir}
    if not force and os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == want:
                    return ORACLE_DIR
        except Exception:
            pass
    tmp = f"{ORACLE_DIR}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    def p(name: str) -> str:
        return f"{tmp}/{name}.parquet"

    _gen_extract_spans(sf_dir).to_parquet(p("extract_spans"), index=False)
    det_pred, det_gt, rec_pairs, det_flags = _gen_det_tables(sf_dir)
    det_pred.to_parquet(p("det_pred"), index=False)
    det_gt.to_parquet(p("det_gt"), index=False)
    rec_pairs.to_parquet(p("rec_pairs"), index=False)
    det_flags.to_parquet(p("det_flags"), index=False)
    _gen_rec_long_pairs(sf_dir).to_parquet(p("rec_long_pairs"), index=False)
    _gen_rec_heads(sf_dir).to_parquet(p("rec_heads"), index=False)
    _gen_preproc_stats(sf_dir).to_parquet(p("preproc_stats"), index=False)
    doc_parse, doc_md = _gen_doc_tables(sf_dir)
    doc_parse.to_parquet(p("doc_parse"), index=False)
    doc_md.to_parquet(p("doc_markdown"), index=False)
    with open(f"{tmp}/marker.json", "w") as f:
        json.dump(want, f)
    if force:
        shutil.rmtree(ORACLE_DIR, ignore_errors=True)
    try:
        os.rename(tmp, ORACLE_DIR)
    except OSError:
        # a directory already sits at ORACLE_DIR. Keep it ONLY if its
        # marker matches what we just generated (a concurrent writer's
        # complete copy of the SAME tables); a mismatched marker (e.g.
        # the same version generated for a different sf_dir) must be
        # replaced, not silently served to the caller
        existing_ok = False
        try:
            with open(marker) as f:
                existing_ok = json.load(f) == want
        except Exception:
            existing_ok = False
        if existing_ok:
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            shutil.rmtree(ORACLE_DIR, ignore_errors=True)
            os.rename(tmp, ORACLE_DIR)
    return ORACLE_DIR
