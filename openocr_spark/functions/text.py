"""Pure-python text kernels (per-string logic the reference implements
as scalar helpers). Each is written from scratch against the *semantics*
documented in SURVEY.md §2.8; unit tests pin the behavior. Spark
exposure: `udfs.py` wraps them as Arrow-batched pandas UDFs for use on
span columns.
"""

from __future__ import annotations

import re


def truncate_repetitive_content(text: str, min_repeats: int = 5) -> str:
    """Repetition truncation with three priorities (semantics of
    tools/utils/opendoc_onnx_utils/utils.py:927-1020):
      1. a phrase repeated consecutively ≥ min_repeats times at the END
         of the string → keep one copy of the phrase;
      2. the WHOLE string is one phrase repeated ≥ 10 times → keep one;
      3. one line value accounts for ≥ 80% of ≥ 5 lines → keep the first
         occurrence of that line plus all other lines.
    Applied to recognition output before assembly
    (infer_doc_onnx.py:950)."""
    if not text:
        return text
    n = len(text)

    # priority 2: whole-string period repeated >= 10x
    for p in range(1, n // 10 + 1):
        if n % p == 0 and n // p >= 10 and text == text[:p] * (n // p):
            return text[:p]

    # priority 1: repeating suffix phrase (>= min_repeats consecutive
    # copies); the smallest period found wins (finest repetition)
    for p in range(1, n // min_repeats + 1):
        phrase = text[n - p :]
        k = 1
        while (k + 1) * p <= n and text[n - (k + 1) * p : n - k * p] == phrase:
            k += 1
        if k >= min_repeats:
            return text[: n - (k - 1) * p]

    # priority 3: dominant line
    lines = text.split("\n")
    if len(lines) >= 5:
        counts: dict[str, int] = {}
        for ln in lines:
            counts[ln] = counts.get(ln, 0) + 1
        top, c = max(counts.items(), key=lambda kv: kv[1])
        if c / len(lines) >= 0.8:
            out = []
            seen_top = False
            for ln in lines:
                if ln == top:
                    if seen_top:
                        continue
                    seen_top = True
                out.append(ln)
            return "\n".join(out)
    return text


def truncate_repeated_tail(text: str, max_repeats: int = 20) -> str:
    """Tail pattern repeated > max_repeats times → keep a single copy
    (to_markdown.py:7-55 semantics)."""
    if not text:
        return text
    n = len(text)
    for p in range(1, n // max_repeats + 1):
        phrase = text[n - p :]
        k = 1
        while (k + 1) * p <= n and text[n - (k + 1) * p : n - k * p] == phrase:
            k += 1
        if k > max_repeats:
            return text[: n - (k - 1) * p]
    return text


def stream_match(segments: list[str]) -> str:
    """Merge ordered overlapping text windows into one string by the
    longest suffix/prefix overlap (rec_metric.py:6-28 semantics, used for
    out-of-length recognition with sliding crops)."""
    out = ""
    for seg in segments:
        if not out:
            out = seg
            continue
        max_ov = 0
        limit = min(len(out), len(seg))
        for k in range(limit, 0, -1):
            if out[-k:] == seg[:k]:
                max_ov = k
                break
        out += seg[max_ov:]
    return out


_LATIN_RUN = re.compile(r"[a-zA-Z0-9 :*./%+-]+")


def pred_reverse(text: str) -> str:
    """RTL segment-wise reversal keeping latin runs intact
    (ctc_postprocess.py:36-50 semantics): split into latin runs and
    single non-latin chars, emit the sequence reversed, latin runs
    untouched internally."""
    parts: list[str] = []
    i = 0
    while i < len(text):
        m = _LATIN_RUN.match(text, i)
        if m:
            parts.append(m.group(0))
            i = m.end()
        else:
            parts.append(text[i])
            i += 1
    return "".join(reversed(parts))
