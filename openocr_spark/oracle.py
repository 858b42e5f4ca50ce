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
                "gt_text": hit["gt_text"] if hit is not None else None,
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


def rec_heads_rows(media_ref: str) -> list[dict]:
    """Independent single-node decode-head matrix: every fixture region's
    logits decoded under each head family's vocabulary/stop/skip/conf
    rules (semantics of openrec/postprocess/*_postprocess.py; the Spark
    side runs kernels/decode_heads.py — this is a separate eager
    derivation using masks/comprehensions over the softmax table).
    Rows: (region_idx, head, text, conf round 6)."""
    from openocr_spark.config import CHARSET

    cs = CHARSET
    p = payload_for_media_ref(media_ref)
    out: list[dict] = []

    def _softmax_table(lg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        e = np.exp(lg - lg.max(axis=1, keepdims=True))
        pr = e / e.sum(axis=1, keepdims=True)
        return pr.argmax(axis=1), pr.max(axis=1)

    def eos_family(ids, conf, vocab, skip):
        """break at '</s>', drop skip tokens and out-of-range ids."""
        kept = []
        for k, c in zip(ids, conf):
            k = int(k)
            if k >= len(vocab):
                continue
            if vocab[k] == "</s>":
                break
            if vocab[k] in skip:
                continue
            kept.append((vocab[k], float(c)))
        if not kept:
            return "", 0.0
        return "".join(t for t, _ in kept), float(np.mean([c for _, c in kept]))

    for ridx, reg in enumerate(p["regions"]):
        lg = np.asarray(reg["logits"], dtype=np.float64)
        ids, conf = _softmax_table(lg)
        rows: dict[str, tuple[str, float]] = {}
        # ctc: lag-dedup + blank drop
        keep = np.ones(len(ids), dtype=bool)
        keep[1:] = ids[1:] != ids[:-1]
        keep &= ids != 0
        if keep.any():
            rows["ctc"] = (
                "".join(cs[k - 1] for k in ids[keep] if 1 <= k <= len(cs)),
                float(conf[keep].mean()),
            )
        else:
            rows["ctc"] = ("", 0.0)
        rows["abinet"] = eos_family(ids, conf, ["</s>"] + list(cs), set())
        rows["smtr"] = eos_family(
            ids, conf,
            ["</s>"] + list(cs) + ["<s>", "<INF>", "<INB>", "<pad>"],
            {"<s>", "<pad>"},
        )
        rows["lister"] = eos_family(
            ids, conf, ["</s>"] + list(cs) + ["<pad>"], {"<s>", "<pad>"}
        )
        rows["igtr"] = eos_family(
            ids, conf, ["</s>"] + list(cs) + ["<s>", "<pad>"], {"<s>", "<pad>"}
        )
        # visionlan: 1-based ids, geometric-mean confidence
        vl_text = "".join(
            cs[int(k) - 1] if 0 < int(k) <= len(cs) else "" for k in ids
        )
        vl_conf = (
            float(np.exp(np.log(np.maximum(conf, 1e-300)).sum() / (len(conf) + 1e-6)))
            if len(conf)
            else 0.0
        )
        rows["visionlan"] = (vl_text, vl_conf)
        # mgp char head: ['[GO]','[s]'] + charset, BOS slot dropped,
        # product confidence including the EOS position
        mg_vocab = ["[GO]", "[s]"] + list(cs)
        mg_chars: list[str] = []
        mg_score = 1.0
        for k, c in zip(ids[1:], conf[1:]):
            k = int(k)
            if k >= len(mg_vocab):
                continue
            mg_score *= float(c)
            if mg_vocab[k] == "[s]":
                break
            if mg_vocab[k] == "[GO]":
                continue
            mg_chars.append(mg_vocab[k])
        rows["mgp_char"] = ("".join(mg_chars), mg_score if len(ids) > 1 else 1.0)
        # ce: single-position classification on the first timestep
        if len(ids):
            k0 = int(ids[0])
            rows["ce"] = (
                (cs[k0], float(conf[0])) if k0 < len(cs) else ("", 0.0)
            )
        else:
            rows["ce"] = ("", 0.0)
        # cppd reads the last refinement iteration — single-logits
        # fixtures have exactly one, so its rows equal abinet's vocab/loop
        rows["cppd"] = eos_family(ids, conf, ["</s>"] + list(cs), set())
        # nrtr family: [blank,<unk>,<s>,</s>] prepended, EOS break, no
        # skip set (specials before EOS append literally); the char
        # primary branch and the gtc guidance branch decode identically
        nrtr_vocab = ["blank", "<unk>", "<s>", "</s>"] + list(cs)
        rows["nrtr"] = eos_family(ids, conf, nrtr_vocab, set())
        rows["char"] = rows["nrtr"]
        rows["gtc"] = rows["nrtr"]
        # srn: charset + [<BOS>,<EOS>] APPENDED, fixed max_len 25,
        # BOS/EOS positions skipped, NO break at EOS (the reference's
        # ignored-check-precedes-break quirk)
        srn_vocab = list(cs) + ["<BOS>", "<EOS>"]
        srn_kept = [
            (srn_vocab[int(k)], float(c))
            for k, c in zip(ids[:25], conf[:25])
            if int(k) < len(srn_vocab) - 2
        ]
        rows["srn"] = (
            ("".join(t for t, _ in srn_kept),
             float(np.mean([c for _, c in srn_kept])))
            if srn_kept
            else ("", 0.0)
        )
        # tokenizer-backed heads over the fixture tokenizer artifact —
        # the MAP is the shared external artifact (like the charset);
        # the decode rules are re-derived here
        from openocr_spark.kernels.tokenizer import fixture_token_map

        tokmap = dict(fixture_token_map())
        toks = [tokmap.get(int(k), "<|unk|>") for k in ids]
        # unirec: concat, Ġ/Ċ byte markers, chat-special strip, ordered rules
        ur = "".join(toks)
        ur = (
            ur.replace("Ġ", " ").replace("Ċ", "\n")
            .replace("<|bos|>", "").replace("<|eos|>", "")
            .replace("<|pad|>", "")
        )
        import re as _re

        for pat, rep in (
            (r"-<\|sn\|>", ""), (r" <\|sn\|>", " "), (r"<\|sn\|>", " "),
            (r"<\|unk\|>", ""), (r"<s>", ""), (r"</s>", ""), ("￿", ""),
            (r"_{4,}", "___"), (r"\.{4,}", "..."),
        ):
            ur = _re.sub(pat, rep, ur)
        rows["unirec"] = (ur, 0.0)
        # cmer: drop specials, join, remove all spaces, strip
        cmer_specials = {"<|pad|>", "<|bos|>", "<|eos|>", "<|unk|>"}
        cm = "".join(
            tokmap.get(int(k), "") for k in ids
            if tokmap.get(int(k), "") not in cmer_specials
        ).replace(" ", "").strip()
        rows["cmer"] = (cm, 0.0)
        # mgp bpe: break at '#' BEFORE appending/multiplying; product
        # conf; per-token GPT2 decode maps the byte-level marker Ġ → ' '
        bpe_parts: list[str] = []
        bpe_conf = 1.0
        for k, c in zip(ids, conf):
            tok = tokmap.get(int(k), "").replace("Ġ", " ")
            if tok == "#":
                break
            bpe_parts.append(tok)
            bpe_conf *= float(c)
        rows["mgp_bpe"] = ("".join(bpe_parts), bpe_conf)
        # mgp wp: detokenize all (## merges, space join), truncate the
        # STRING at find('[SEP]') (absent → -1 drops the last char),
        # product over probs[:index_of_sep_id+1] (absent → [:-1]; empty
        # window → 0.0)
        wp_pred = " ".join(toks).replace(" ##", "")
        for _a, _b in (
            (" .", "."), (" ?", "?"), (" !", "!"), (" ,", ","),
            (" ' ", "'"), (" n't", "n't"), (" 'm", "'m"), (" 's", "'s"),
            (" 've", "'ve"), (" 're", "'re"),
        ):
            wp_pred = wp_pred.replace(_a, _b)
        wp_pred = wp_pred[: wp_pred.find("[SEP]")]
        sep_ids = [i for i, k in enumerate(ids) if tokmap.get(int(k)) == "[SEP]"]
        eos_index = sep_ids[0] + 1 if sep_ids else -1
        window = list(conf)[:eos_index]
        wp_conf = 0.0
        if window:
            wp_conf = 1.0
            for c in window:
                wp_conf *= float(c)
        rows["mgp_wp"] = (wp_pred, wp_conf)
        for head, (text, c) in rows.items():
            out.append(
                {
                    "media_ref": media_ref,
                    "region_idx": ridx,
                    "head": head,
                    "text": text,
                    "conf": round(float(c), 6),
                }
            )
    return out


def doc_parse_full_oracle(
    blocks_pdf: pd.DataFrame,
    score_threshold: float = 0.4,
    use_chart_recognition: bool = True,
) -> dict:
    """Independent re-implementation of the doc-parse flow (SURVEY §3.2,
    the onnx path's OBSERVED behavior — see operators/layout.py module
    docstring): per doc_id → ordered list of ALL parsed blocks (label,
    text, block_id), boilerplate included (the markdown converter applies
    its own skip list, doc_spans applies IGNORE_LABELS). Text generation
    + per-block post (surrogate_block_text / postprocess_block_text) are
    shared with the Spark kernel by design — the oracle independently
    re-derives the FLOW (reference-label drop, dedup, GLOBAL numbering,
    suffix routing, doc-indexed figure tokens, assembly) with eager
    loops; the flow itself is pinned against the reference's own
    functions by tests/test_layout_differential.py."""
    from openocr_spark.operators.doc_parse import (
        postprocess_block_text,
        surrogate_block_text,
    )
    from openocr_spark.operators.layout import (
        figure_img_path,
        figure_token_numbers,
        image_label_set,
    )

    img_labels = image_label_set(use_chart_recognition)
    out: dict = {}
    for doc_id, grp in blocks_pdf.groupby("doc_id"):
        rows = [r for r in grp.to_dict("records") if r["score"] > score_threshold]
        # J4: reference-label pre-drop (utils.py:140-144), then greedy
        # overlap dedup (image-exempt)
        rows = [r for r in rows if r["label"] != "reference"]

        def ovs(a, b):
            ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
            iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
            aa = abs((a[2] - a[0]) * (a[3] - a[1]))
            ab = abs((b[2] - b[0]) * (b[3] - b[1]))
            ref = min(aa, ab)
            return ix * iy / ref if ref > 0 else 0.0

        drop = set()
        for i in range(len(rows)):
            if i in drop:
                continue
            for j in range(i + 1, len(rows)):
                if i in drop:
                    break
                if j in drop:
                    continue
                li, lj = rows[i]["label"], rows[j]["label"]
                if ovs(rows[i]["bbox"], rows[j]["bbox"]) > 0.7:
                    if (li == "image" or lj == "image") and li != lj:
                        continue
                    ai = abs((rows[i]["bbox"][2] - rows[i]["bbox"][0]) * (rows[i]["bbox"][3] - rows[i]["bbox"][1]))
                    aj = abs((rows[j]["bbox"][2] - rows[j]["bbox"][0]) * (rows[j]["bbox"][3] - rows[j]["bbox"][1]))
                    drop.add(j if aj <= ai else i)
        rows = [r for k, r in enumerate(rows) if k not in drop]

        # W2/W3: custom_value sort + GLOBAL 1-based numbering
        # (infer_doc_onnx.py:459-466); crop emptiness via int truncation
        rows.sort(key=lambda r: r["custom_value"])
        for i, r in enumerate(rows, start=1):
            r["block_id"] = f"{r['label']}_{i:02d}"
            w = int(r["bbox"][2]) - int(r["bbox"][0])
            h = int(r["bbox"][3]) - int(r["bbox"][1])
            r["has_img"] = w > 0 and h > 0
        # merge_blocks is a NO-OP here: labels are suffixed (see
        # operators/layout.py docstring), so no continuation rows exist.

        # J5: doc-level image index → per-table [Fn] tokens
        # (utils.py:478-535 + infer_doc_onnx.py:880-892)
        figures = [r for r in rows if r["label"] in img_labels and r["has_img"]]
        tok_nums = figure_token_numbers(len(figures))

        def table_figs(tb):
            toks, mds = [], []
            for fid, f in enumerate(figures):
                fb = f["bbox"]
                if (
                    fb[0] >= tb[0] and fb[1] >= tb[1]
                    and fb[2] <= tb[2] and fb[3] <= tb[3]
                ):
                    if min(fb[2] - fb[0], fb[3] - fb[1]) < 25:
                        continue  # too small to tokenize (utils.py:522)
                    toks.append(f"[F{tok_nums[fid]}]")
                    mds.append(
                        f'<img src="{figure_img_path(f["label"], fb)}" >'
                    )
            return toks, mds

        # routing (onnx substring semantics over the numbered label),
        # recognition, post, assembly
        spans = []
        for r in rows:
            bid = r["block_id"]
            base = r["label"]
            if base in img_labels or not r["has_img"]:
                task = None
            elif "table" in bid:
                task = "table_rec"
            elif bid == "chart" and use_chart_recognition:
                task = "chart_rec"  # dead: bid is always suffixed
            elif "formula" in bid and bid != "formula_number":
                task = "formula_rec"
            else:
                task = "ocr"
            ftoks, fmds = (
                table_figs(r["bbox"]) if task == "table_rec" else (None, None)
            )
            text = surrogate_block_text(doc_id, bid, task, ftoks)
            text = postprocess_block_text(text, task, bid, ftoks, fmds)
            spans.append((base, "" if text is None else text, bid))
        out[doc_id] = spans
    return out


def doc_parse_oracle(blocks_pdf: pd.DataFrame, score_threshold: float = 0.4) -> dict:
    """Per doc_id → ordered span dicts (kind, text, block_id, order)
    after the IGNORE_LABELS boilerplate strip — the doc_spans contract."""
    from openocr_spark.operators.layout import IGNORE_LABELS

    out = {}
    for doc_id, rows in doc_parse_full_oracle(blocks_pdf, score_threshold).items():
        kept = [(k, t, b) for k, t, b in rows if k not in IGNORE_LABELS]
        out[doc_id] = [
            {"kind": k, "text": t, "block_id": b, "order": i}
            for i, (k, t, b) in enumerate(kept)
        ]
    return out


def doc_markdown_oracle(
    blocks_pdf: pd.DataFrame, score_threshold: float = 0.4
) -> dict:
    """Per doc_id → assembled markdown via the full F11 handler set
    (functions/markdown.py) over the ordered parsed blocks."""
    from openocr_spark.functions.markdown import doc_markdown

    return {
        doc_id: doc_markdown([(k, t) for k, t, _ in rows])
        for doc_id, rows in doc_parse_full_oracle(blocks_pdf, score_threshold).items()
    }


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
