"""Differential property tests: repo helpers vs the REFERENCE's own
pure-Python helpers, imported at test time (see _reference_loader).

These exist because the engine and the single-node oracle share kernels
and constants by design — the driver's hash compare can't see a shared
misreading of the reference. Here the comparison target is the
reference's actual code, on randomized adversarial inputs.

Covered helpers (VERDICT r5 'Next round' #2):
  - truncate_repetitive_content (utils.py:973)
  - truncate_repeated_tail       (to_markdown.py:7)
  - convert_otsl_to_html         (utils.py:906)
  - sorted_boxes                 (infer_e2e.py:54)
  - MarkdownConverter handlers + convert (to_markdown.py:90-448)
  - filter_overlap_boxes         (utils.py:137)  [test_layout_differential]
  - merge_blocks                 (utils.py:258)  [test_layout_differential]
  - tokenize/untokenize_figure_of_table (utils.py:478,537)
"""

from __future__ import annotations

import random
import string

import numpy as np
import pytest

from tests._reference_loader import ref_sorted_boxes, ref_to_markdown, ref_utils

from openocr_spark.functions.markdown import (
    block_markdown,
    doc_markdown,
    handle_figure,
    handle_formula,
    handle_heading,
    handle_list_item,
    handle_table,
    handle_text,
)
from openocr_spark.functions.otsl import otsl_to_html
from openocr_spark.functions.text import (
    truncate_repeated_tail,
    truncate_repetitive_content,
)
from openocr_spark.kernels.detection import sorted_boxes


# ---------------------------------------------------------------- text


def _repetition_corpus():
    """Strings engineered around every gate in the reference's
    truncation logic: unit lengths 1..30, counts 3..30, with/without
    prefixes, newlines, spaces, lengths straddling 10/100/2000."""
    rng = random.Random(61)
    cases = [
        "", " ", "\n\n", "abc", "a" * 9, "a" * 11, "a" * 200,
        "ab" * 5, "ab" * 6, "abc" * 40, "x" + "abc" * 40,
        "word " * 30, "line\n" * 9, "line\n" * 12,
        ("spam\n" * 11) + "other\nlines\nhere",
        "prefix " + "na" * 60,
        "Lorem ipsum dolor sit amet " * 8,
        "short" + "yo" * 4,
    ]
    alphabet = "ab cd\nxy."
    for _ in range(400):
        unit_len = rng.randint(1, 30)
        unit = "".join(rng.choice(alphabet) for _ in range(unit_len))
        count = rng.randint(2, 30)
        prefix = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 120))
        )
        cases.append(prefix + unit * count)
    for _ in range(100):
        n_lines = rng.randint(1, 25)
        top = "".join(rng.choice("abc ") for _ in range(rng.randint(0, 12)))
        lines = []
        for _ in range(n_lines):
            if rng.random() < 0.82:
                lines.append(top)
            else:
                lines.append("".join(rng.choice("xyz ") for _ in range(6)))
        cases.append("\n".join(lines))
    return cases


def test_truncate_repetitive_content_matches_reference():
    ref = ref_utils().truncate_repetitive_content
    for s in _repetition_corpus():
        assert truncate_repetitive_content(s) == ref(s), repr(s)


def test_truncate_repeated_tail_matches_reference():
    ref = ref_to_markdown().truncate_repeated_tail
    extra = [
        "ab" * 2000,              # pattern-length cap: len//20 > 100
        "x" * 50 + "yz" * 1500,
        ("pattern-30-chars-long-exactly!" * 25),
    ]
    for s in _repetition_corpus() + extra:
        assert truncate_repeated_tail(s) == ref(s), repr(s)


# ---------------------------------------------------------------- otsl


def _otsl_corpus():
    rng = random.Random(1924)
    tags = ["<fcel>", "<ecel>", "<lcel>", "<ucel>", "<xcel>", "<nl>"]
    texts = ["", "a", "x y", "a<b", "q&r", "  pad  ", "5", "héllo", "a\nb"]
    cases = [
        "", "<nl>", "<fcel>a", "<fcel>a<nl>",
        "<fcel>a<fcel>b<nl><fcel>c<ecel><nl>",
        "<fcel>a<lcel><nl><fcel>b<fcel>c<nl>",
        "<fcel>a<fcel>b<nl><ucel><fcel>c<nl>",
        "<fcel>a<lcel><nl><ucel><xcel><nl>",
        "<fcel>wide<lcel><lcel><nl><fcel>1<fcel>2<fcel>3<nl>",
        "<fcel>a<nl><fcel>b<fcel>c<fcel>d<nl>",       # ragged
        "<lcel><fcel>x<nl>",                          # orphan lead continuation
        "<ucel><nl><fcel>y<nl>",
        "junk before<fcel>a<nl>trailing",
        "<fcel>a&b<fcel><i>c</i><nl>",                # html-escape content
        "<fcel>a<fcel>b",                             # no <nl> at all
        "<fcel>  <nl>",                               # whitespace-only cell
    ]
    for _ in range(300):
        n = rng.randint(1, 24)
        parts = []
        for _ in range(n):
            parts.append(rng.choice(tags))
            if rng.random() < 0.5:
                parts.append(rng.choice(texts))
        cases.append("".join(parts))
    return cases


def test_otsl_to_html_matches_reference():
    ref = ref_utils().convert_otsl_to_html
    crashes = 0
    for s in _otsl_corpus():
        try:
            want = ref(s)
        except IndexError:
            # the reference's count_right/count_down index unguarded
            # (utils.py:748) and crash when a text-less <fcel> in the
            # last column positionally picks up the next row's
            # continuation tag — out-of-domain for the real model; we
            # only require OUR decoder not to crash on it
            otsl_to_html(s)
            crashes += 1
            continue
        assert otsl_to_html(s) == want, repr(s)
    assert crashes < 40  # the corpus must stay dominated by valid streams


# ---------------------------------------------------------------- sorted_boxes


def test_sorted_boxes_matches_reference():
    ref = ref_sorted_boxes()
    rng = np.random.default_rng(54)
    for trial in range(200):
        n = int(rng.integers(1, 25))
        # top-left corners on a coarse grid so near-ties (<10px) occur
        tl = rng.integers(0, 60, size=(n, 2)).astype(np.float64)
        boxes = np.stack(
            [
                np.stack(
                    [
                        c,
                        c + [10, 0],
                        c + [10, 8],
                        c + [0, 8],
                    ]
                )
                for c in tl
            ]
        )
        got = sorted_boxes(list(boxes))
        want = ref(boxes.copy())
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert np.array_equal(g, w)


# ---------------------------------------------------------------- markdown


def _markdown_text_corpus():
    rng = random.Random(7717)
    frags = [
        "", "plain text", "text with <|sn|> token", "a-<|sn|>b",
        "<|unk|>x\uffffy", "____many____", "____________", ".....",
        "...............", "$\\bullet$ item", "\\( x+y \\) inline",
        "\\[ E=mc^2 \\]", "\\bm{v} \\eqno 4", "\\big{(}a\\big{)}",
        "图中没有可识别的文本。", "中文标题\n换行", "English\nheading",
        "<table><tr><td>c</td></tr></table> tail",
        "<table border=1><tr><tdcolspan=\"2\">x</td></tr></table>",
        "<table><tr><td colspan=\"2\">a</td></tr></table>\n\n<table><tr><td>b</td></tr></table>",
        "\\upmu norm", "a" * 30, "zz" * 40,
        "line one\n\n\nline two", "data:image/png;base64,AAAA",
        "figures/fig_01.png", "![Figure 3](x.png)", "a;b,c",
        "\\] (12)\n\nrest", "\\[\nx\n\\]", "\\[x\\]\n*\\[y\\]",
    ]
    cases = list(frags)
    for _ in range(200):
        k = rng.randint(1, 4)
        cases.append(" ".join(rng.choice(frags) for _ in range(k)))
    return cases


def test_markdown_handlers_match_reference():
    mc = ref_to_markdown().MarkdownConverter()
    for s in _markdown_text_corpus():
        assert handle_text(s) == mc._handle_text(s), repr(s)
        assert handle_table(s) == mc._handle_table(s), repr(s)
        assert handle_formula(s) == mc._handle_formula(s), repr(s)
        assert handle_list_item(s) == mc._handle_list_item(s), repr(s)
        for lbl in ("sec_0", "sec_1", "sec_3", "sec_5"):
            assert handle_heading(s, lbl) == mc._handle_heading(s, lbl), (
                repr(s),
                lbl,
            )
        for sc in (0, 3):
            assert handle_figure(s, sc) == mc._handle_figure(s, sc), repr(s)


LABELS_25 = [
    "abstract", "algorithm", "aside_text", "chart", "content",
    "display_formula", "doc_title", "figure_title", "footer",
    "footer_image", "footnote", "formula_number", "header",
    "header_image", "image", "inline_formula", "number",
    "paragraph_title", "reference", "reference_content", "seal",
    "table", "text", "vertical_text", "vision_footnote",
]


def test_markdown_convert_matches_reference():
    """Full-document dispatch: my block_markdown/doc_markdown vs the
    reference's MarkdownConverter.convert over randomized block lists
    covering all 25 layout classes plus sec_*/list/code."""
    mc = ref_to_markdown().MarkdownConverter()
    rng = random.Random(425)
    texts = _markdown_text_corpus()
    labels = LABELS_25 + ["list", "code", "sec_2"]
    for _ in range(120):
        n = rng.randint(0, 12)
        results = [
            {"label": rng.choice(labels), "text_unirec": rng.choice(texts)}
            for _ in range(n)
        ]
        want = mc.convert(results)
        got = doc_markdown(
            [(r["label"], r["text_unirec"]) for r in results]
        )
        assert got == want


def test_block_markdown_all_labels():
    """Per-label dispatch parity on every layout class at fixed
    positions (section_count feeds the figure handler)."""
    mc = ref_to_markdown().MarkdownConverter()
    for lbl in LABELS_25 + ["list", "code", "sec_0", "sec_4"]:
        for txt in ("", "body text", "\\( f \\)", "figures/x.png"):
            for pos in (0, 2):
                want = mc.convert(
                    [{"label": "text", "text_unirec": "pad"}] * pos
                    + [{"label": lbl, "text_unirec": txt}]
                )
                pad = block_markdown("text", "pad", 0)
                got = pad * pos + block_markdown(lbl, txt, pos)
                assert got == want, (lbl, txt, pos)
