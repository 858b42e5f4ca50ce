"""OTSL → HTML table decoding, from scratch.

Semantics pinned to the reference's table decoder
(tools/utils/opendoc_onnx_utils/utils.py:662-924 —
otsl_pad_to_sqr_v2 → otsl_extract_tokens_and_text → otsl_parse_texts →
TableData.grid → export_to_html) and verified against the reference's
own functions by tests/test_reference_differential.py on randomized
token streams. The recognizer emits an OTSL token grid —
  <fcel> TEXT   a filled cell (content follows until the next tag)
  <ecel>        an empty cell
  <lcel>        continuation of the cell to the LEFT  (colspan)
  <ucel>        continuation of the cell ABOVE        (rowspan)
  <xcel>        continuation both left and above (2-D span interior)
  <nl>          end of grid row

Reference behaviors deliberately kept bug-for-bug:
  - width repair picks the width minimizing Σ|row_len − w| over
    [last-fcel-column .. max row length], TRUNCATING overlong rows;
  - a stream with no <nl> skips cell extraction entirely, so stray text
    before the first tag desynchronizes the text walk and every later
    cell loses its content;
  - a <fcel> with no following text picks up the NEXT TAG STRING as its
    cell text (positional texts[i+1] read);
  - cell text is html-escaped; an empty cell list exports ''.
"""

from __future__ import annotations

import html
import re

NL, FCEL, ECEL, LCEL, UCEL, XCEL = (
    "<nl>", "<fcel>", "<ecel>", "<lcel>", "<ucel>", "<xcel>",
)
_TAGS = (NL, FCEL, ECEL, LCEL, UCEL, XCEL)
_TAG_ALT = "|".join(_TAGS)
_CELL_RE = re.compile(f"(?:{_TAG_ALT}).*?(?=(?:{_TAG_ALT})|$)", re.DOTALL)
_TAG_RE = re.compile(f"({_TAG_ALT})")


def _repair_width(otsl: str) -> str:
    """Rectangularize (otsl_pad_to_sqr_v2): choose the optimal width,
    truncate long rows, pad short rows with <ecel>."""
    s = otsl.strip()
    if NL not in s:
        return s + NL
    rows = []
    for line in s.split(NL):
        cells = _CELL_RE.findall(line)
        if not cells:
            continue
        last_fcel = 0
        for i, cell in enumerate(cells):
            if cell.startswith(FCEL):
                last_fcel = i + 1
        rows.append((cells, last_fcel))
    if not rows:
        return NL
    lo = max(r[1] for r in rows)
    hi = max(lo, max(len(r[0]) for r in rows))
    width = min(
        range(lo, hi + 1),
        key=lambda w: (sum(abs(len(r[0]) - w) for r in rows), w),
    )
    fixed = [
        "".join(cells[:width]) + ECEL * max(0, width - len(cells))
        for cells, _ in rows
    ]
    return NL.join(fixed) + NL


def _parse(otsl: str):
    """Padded stream → (texts walk list, token matrix). The walk list
    interleaves tags with their attached raw text parts exactly like the
    reference's positional resync (otsl_parse_texts new_texts)."""
    tokens = _TAG_RE.findall(otsl)
    parts = [p for p in _TAG_RE.split(otsl) if p.strip()]

    matrix: list[list[str]] = []
    cur: list[str] = []
    for t in tokens:
        if t == NL:
            if cur:
                matrix.append(cur)
                cur = []
        else:
            cur.append(t)
    if cur:
        matrix.append(cur)
    if not matrix:
        return [], []

    max_cols = max(len(r) for r in matrix)
    for r in matrix:
        r.extend([ECEL] * (max_cols - len(r)))

    walk: list[str] = []
    pi = 0
    for row in matrix:
        for tok in row:
            walk.append(tok)
            if pi < len(parts) and parts[pi] == tok:
                pi += 1
                if pi < len(parts) and parts[pi] not in _TAGS:
                    walk.append(parts[pi])
                    pi += 1
        walk.append(NL)
        if pi < len(parts) and parts[pi] == NL:
            pi += 1
    return walk, matrix


def _run_right(matrix, r, c):
    span = 0
    while c < len(matrix[r]) and matrix[r][c] in (LCEL, XCEL):
        span += 1
        c += 1
    return span


def _run_down(matrix, r, c):
    span = 0
    while r < len(matrix) and matrix[r][c] in (UCEL, XCEL):
        span += 1
        r += 1
    return span


def otsl_to_html(otsl: str) -> str:
    """OTSL string → HTML table with rowspan/colspan reconstruction."""
    walk, matrix = _parse(_repair_width(otsl))
    n_rows = len(matrix)
    n_cols = max((len(r) for r in matrix), default=0)

    # anchor cells with spans, in walk order
    cells = []  # (r, c, row_span, col_span, text)
    r = c = 0
    for i, item in enumerate(walk):
        if item in (FCEL, ECEL):
            text = ""
            nxt = 1
            if item == FCEL:
                text = walk[i + 1] if i + 1 < len(walk) else ""
                nxt = 2
            col_span = row_span = 1
            right = walk[i + nxt] if i + nxt < len(walk) else ""
            below = (
                matrix[r + 1][c]
                if r + 1 < n_rows and c < len(matrix[r + 1])
                else ""
            )
            if right in (LCEL, XCEL):
                col_span += _run_right(matrix, r, c + 1)
            if below in (UCEL, XCEL):
                row_span += _run_down(matrix, r + 1, c)
            cells.append((r, c, row_span, col_span, text))
        if item in (FCEL, ECEL, LCEL, UCEL, XCEL):
            c += 1
        elif item == NL:
            r += 1
            c = 0

    if not cells:
        return ""

    # paint the grid; later cells overwrite, non-anchor slots default
    # to 1×1 empties that emit as bare <td></td>
    grid = [[(i, j, 1, 1, "") for j in range(n_cols)] for i in range(n_rows)]
    for cr, cc, rs, cs, text in cells:
        for i in range(min(cr, n_rows), min(cr + rs, n_rows)):
            for j in range(min(cc, n_cols), min(cc + cs, n_cols)):
                grid[i][j] = (cr, cc, rs, cs, text)

    out = []
    for i in range(n_rows):
        out.append("<tr>")
        for j in range(n_cols):
            cr, cc, rs, cs, text = grid[i][j]
            if cr != i or cc != j:
                continue
            attrs = ""
            if rs > 1:
                attrs += f' rowspan="{rs}"'
            if cs > 1:
                attrs += f' colspan="{cs}"'
            out.append(f"<td{attrs}>{html.escape(text.strip())}</td>")
        out.append("</tr>")
    return "<table>" + "".join(out) + "</table>"
