"""Single-node pandas/numpy oracle (SURVEY.md §5.2).

An INDEPENDENT re-implementation of the extraction semantics — eager
per-document loops, BFS flood-fill components, per-timestep decode loops
— deliberately structured like the reference's row-at-a-time engine
(tools/infer_e2e.py:220-402) and sharing no code with the Spark kernels
beyond the fixture generator and config constants. pytest asserts the
distributed pipeline equals this span-for-span.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from openocr_spark.config import DEFAULT_CONFIG, ID_TO_CHAR, ExtractConfig
from openocr_spark.fixtures import payload_for_media_ref

_MARKER_RE = re.compile(r"^\s*<(header|footer|nav|aside)>")


def is_boilerplate(text: str) -> bool:
    """Boilerplate spec (shared with operators/boilerplate.py, which
    implements it as vectorized Spark expressions). Mirrors the
    reference's boilerplate-label strip (tools/infer_doc_onnx.py:566-568,
    to_markdown.py:398-406) for our text spans."""
    if text is None:
        return True
    if _MARKER_RE.match(text):
        return True
    if len(text.strip()) < 3:
        return True
    tokens = text.split(" ")
    href = (len(text) - len(text.replace("href=", ""))) // 5
    if href / max(len(tokens), 1) > 0.3:
        return True
    return False


def _flood_components(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """BFS flood fill (independent from the kernel's run-based union-find).
    Returns inclusive bboxes (r0, r1, c0, c1) in scan order."""
    h, w = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    out = []
    for r in range(h):
        for c in range(w):
            if mask[r, c] and not seen[r, c]:
                stack = [(r, c)]
                seen[r, c] = True
                r0 = r1 = r
                c0 = c1 = c
                while stack:
                    y, x = stack.pop()
                    r0, r1 = min(r0, y), max(r1, y)
                    c0, c1 = min(c0, x), max(c1, x)
                    for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                        if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and not seen[ny, nx]:
                            seen[ny, nx] = True
                            stack.append((ny, nx))
                out.append((r0, r1, c0, c1))
    return out


def _decode_loop(logits: np.ndarray) -> tuple[str, float]:
    """Per-timestep CTC greedy decode loop (independent of the batch
    kernel; semantics of ctc_postprocess.py:55-118)."""
    prev = -1
    chars: list[str] = []
    confs: list[float] = []
    for t in range(logits.shape[0]):
        row = logits[t].astype(np.float64)
        e = np.exp(row - row.max())
        p = e / e.sum()
        k = int(p.argmax())
        if k != prev and k != 0:
            chars.append(ID_TO_CHAR.get(k, ""))
            confs.append(float(p[k]))
        prev = k
    if not chars:
        return "", 0.0
    return "".join(chars), float(np.mean(confs))


def media_detail(media_ref: str, cfg: ExtractConfig = DEFAULT_CONFIG) -> list[dict]:
    """Per-media detection+recognition detail in reading order —
    independent implementation of the kernel flow, incl. unassigned
    boxes (empty transcription, score 0.0) like the reference's result
    rows (infer_e2e.py:272-276)."""
    p = payload_for_media_ref(media_ref)
    prob = p["score_map"]
    h, w = prob.shape
    boxes = []
    for r0, r1, c0, c1 in _flood_components(prob > cfg.binarize_thresh):
        bw, bh = c1 - c0 + 1, r1 - r0 + 1
        if min(bw, bh) < cfg.min_size:
            continue
        score = float(prob[r0 : r1 + 1, c0 : c1 + 1].mean())
        if score < cfg.box_thresh:
            continue
        delta = int(round((bw * bh) * cfg.unclip_ratio / (2.0 * (bw + bh))))
        nc0, nr0 = max(c0 - delta, 0), max(r0 - delta, 0)
        nc1, nr1 = min(c1 + delta, w - 1), min(r1 + delta, h - 1)
        if min(nc1 - nc0 + 1, nr1 - nr0 + 1) < cfg.min_size + 2:
            continue
        boxes.append((nc0, nr0, nc1, nr1, score))

    # reading order (infer_e2e.py:54-75 semantics, independent rewrite)
    boxes.sort(key=lambda b: (b[1], b[0]))
    for i in range(len(boxes) - 1):
        j = i
        while j >= 0:
            if abs(boxes[j + 1][1] - boxes[j][1]) < cfg.line_tol and boxes[j + 1][0] < boxes[j][0]:
                boxes[j], boxes[j + 1] = boxes[j + 1], boxes[j]
                j -= 1
            else:
                break

    out = []
    for idx, (x0, y0, x1, y1, det_score) in enumerate(boxes):
        hit = None
        for reg in p["regions"]:
            pts = reg["points"]
            cx = sum(q[0] for q in pts) / 4.0
            cy = sum(q[1] for q in pts) / 4.0
            if x0 <= cx <= x1 and y0 <= cy <= y1:
                hit = reg
                break
        text, score = ("", 0.0)
        if hit is not None:
            text, score = _decode_loop(hit["logits"])
        out.append(
            {
                "region_idx": idx,
                "points": [[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
                "det_score": det_score,
                "transcription": text,
                "rec_score": score,
            }
        )
    return out


def extract_media_text(media_ref: str, cfg: ExtractConfig = DEFAULT_CONFIG) -> str:
    """Full per-media flow: detect → order → recognize → filter → join."""
    return "\n".join(
        d["transcription"]
        for d in media_detail(media_ref, cfg)
        if d["rec_score"] >= cfg.drop_score
    )


def extract_oracle(docs_pdf: pd.DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """documents (doc_id, spans) → extractions (doc_id, spans out).

    Output span invariant: (kind, text, media_ref, order) with order the
    0-based rank of surviving spans by offset."""
    rows = []
    for _, row in docs_pdf.iterrows():
        kept = []
        for s in sorted(row["spans"], key=lambda s: s["offset"]):
            if s["kind"] == "text":
                if is_boilerplate(s["text"]):
                    continue
                kept.append({"kind": "text", "text": s["text"], "media_ref": None})
            else:
                kept.append(
                    {
                        "kind": "media",
                        "text": extract_media_text(s["media_ref"], cfg),
                        "media_ref": s["media_ref"],
                    }
                )
        rows.append(
            {
                "doc_id": row["doc_id"],
                "spans": [
                    {**s, "order": i} for i, s in enumerate(kept)
                ],
            }
        )
    return pd.DataFrame(rows)
