"""OTSL → HTML table decoding, from scratch.

Semantics re-created from the reference's table decoder
(tools/utils/opendoc_onnx_utils/utils.py:675-924): the recognizer emits
an OTSL token stream describing a table grid —
  <fcel> TEXT   a filled cell (content follows until the next tag)
  <ecel>        an empty cell
  <lcel>        continuation of the cell to the LEFT  (colspan)
  <ucel>        continuation of the cell ABOVE        (rowspan)
  <xcel>        continuation both left and above (2-D span interior)
  <nl>          end of grid row
The decoder pads rows to the max width (pad-to-square), resolves
row/colspans from the continuation cells, and emits an HTML <table>.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"<(fcel|ecel|lcel|ucel|xcel|nl)>")

F, E, L, U, X = "fcel", "ecel", "lcel", "ucel", "xcel"


def parse_otsl_grid(otsl: str) -> list[list[tuple[str, str]]]:
    """Token stream → rectangular grid of (tag, text). Short rows are
    padded with <ecel> (pad-to-square)."""
    rows: list[list[tuple[str, str]]] = [[]]
    pos = 0
    pending_tag: str | None = None
    for m in _TOKEN_RE.finditer(otsl):
        if pending_tag is not None:
            text = otsl[pos : m.start()].strip()
            if pending_tag == "nl":
                rows.append([])
            else:
                rows[-1].append((pending_tag, text if pending_tag == F else ""))
        pending_tag = m.group(1)
        pos = m.end()
    if pending_tag is not None:
        text = otsl[pos:].strip()
        if pending_tag == "nl":
            pass
        else:
            rows[-1].append((pending_tag, text if pending_tag == F else ""))
    rows = [r for r in rows if r]
    if not rows:
        return []
    width = max(len(r) for r in rows)
    for r in rows:
        r.extend([(E, "")] * (width - len(r)))
    return rows


def otsl_to_html(otsl: str) -> str:
    """OTSL string → HTML table with rowspan/colspan reconstruction."""
    grid = parse_otsl_grid(otsl)
    if not grid:
        return "<table></table>"
    n_rows, n_cols = len(grid), len(grid[0])
    # owner[r][c] = (orow, ocol) of the cell this position belongs to
    owner: list[list[tuple[int, int]]] = [
        [(r, c) for c in range(n_cols)] for r in range(n_rows)
    ]
    for r in range(n_rows):
        for c in range(n_cols):
            tag = grid[r][c][0]
            if tag == L and c > 0:
                owner[r][c] = owner[r][c - 1]
            elif tag == U and r > 0:
                owner[r][c] = owner[r - 1][c]
            elif tag == X and r > 0 and c > 0:
                owner[r][c] = owner[r - 1][c - 1]
    # span extents per owning cell
    span: dict[tuple[int, int], list[int]] = {}
    for r in range(n_rows):
        for c in range(n_cols):
            orow, ocol = owner[r][c]
            s = span.setdefault((orow, ocol), [orow, ocol])
            s[0] = max(s[0], r)
            s[1] = max(s[1], c)
    out = ["<table>"]
    for r in range(n_rows):
        out.append("<tr>")
        for c in range(n_cols):
            if owner[r][c] != (r, c):
                continue  # interior of a span
            tag, text = grid[r][c]
            if tag in (L, U, X):
                continue  # orphan continuation with no owner: drop
            rs = span[(r, c)][0] - r + 1
            cs = span[(r, c)][1] - c + 1
            attrs = ""
            if rs > 1:
                attrs += f' rowspan="{rs}"'
            if cs > 1:
                attrs += f' colspan="{cs}"'
            out.append(f"<td{attrs}>{text}</td>")
        out.append("</tr>")
    out.append("</table>")
    return "".join(out)
