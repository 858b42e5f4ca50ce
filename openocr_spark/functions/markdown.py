"""Full markdown conversion (SURVEY §2.8 F11) — per-label handlers with
the semantics of the reference's MarkdownConverter
(/root/reference/tools/to_markdown.py:71-448), re-implemented from
scratch as pure functions so the same code path serves the Spark
pandas-UDF kernel AND the single-node oracle:

  - control-token / junk rules (:71-80): <|sn|>, <|unk|>, U+FFFF
    removal, ____ and .... squeezes
  - latex bracket fix (:83-87): \\big{(} → \\big(
  - formula replacements (:111-123) and \\( \\) → $ rewrite (:200-215)
  - headings (:236-249): sec_0..sec_5 → #/##/###, newline joining that
    keeps CJK text unspaced (:217-234)
  - list items (:251-259), code fences (:429-430)
  - figures (:261-290): path / markdown / data-URI forms
  - tables (:292-338): <table> extraction, colspan/rowspan attribute
    repair, \\( → $ and \\[ → $$ in cells
  - display formulas (:340-375): bracket strip → $$ wrap → line
    continuation \\\\
  - dispatch + skip list (:377-448): boilerplate labels skipped,
    doc_title→sec_0, paragraph_title→sec_1, tail-repeat truncation
"""

from __future__ import annotations

import re

from openocr_spark.functions.text import truncate_repeated_tail

HEADING_LEVELS = {
    "sec_0": "#",
    "sec_1": "##",
    "sec_2": "###",
    "sec_3": "###",
    "sec_4": "###",
    "sec_5": "###",
}

# labels the markdown assembly drops (to_markdown.py:398-401; note this
# is the MARKDOWN skip list — inline_formula is dropped here but kept in
# doc_spans, and footnote is kept here but dropped from doc_spans)
MD_SKIP_LABELS = (
    "header", "header_image", "footer_image", "footer",
    "aside_text", "inline_formula", "number",
)

_RULES = (
    (re.compile(r"-<\|sn\|>"), ""),
    (re.compile(r"<\|sn\|>"), ""),
    (re.compile(r"<\|unk\|>"), ""),
    (re.compile("\uffff"), ""),
    (re.compile(r"_{4,}"), "___"),
    (re.compile(r"\.{4,}"), "..."),
)

# the table handler applies a REDUCED rule set \u2014 no '-<|sn|>' join rule
# (to_markdown.py:304-308 lists only <|sn|>/<|unk|>/U+FFFF/____/....)
_TABLE_RULES = _RULES[1:]

# the formula handler applies neither '-<|sn|>' nor the dot squeeze
# (to_markdown.py:347-350: <|sn|>/<|unk|>/U+FFFF/____ only)
_FORMULA_RULES = _RULES[1:5]

# sequential str.replace pairs (to_markdown.py:111-123); order matters
_FORMULA_REPLACEMENTS = (
    ("\\bm", "\\mathbf "),
    ("\\eqno", "\\quad "),
    ("\\quad", "\\quad "),
    ("\\leq", "\\leq "),
    ("\\pm", "\\pm "),
    ("\\varmathbb", "\\mathbb "),
    ("\\in fty", "\\infty"),
    ("\\mu", "\\mu "),
    ("\\cdot", "\\cdot "),
    ("\\langle", "\\langle "),
)

_BIG_BRACKET = re.compile(
    r"\\(big|Big|bigg|Bigg|bigl|bigr|Bigl|Bigr|biggr|biggl|Biggl|Biggr)"
    r"\{(\\?[{}\[\]\(\)\|])\}"
)

_TABLE_TAG = re.compile(r"<table.*?>.*?</table>", re.DOTALL)
_TABLE_OPEN = re.compile(r"<table[^>]*>")
_CLOSE_SPAN = tuple(
    re.compile(rf"</t{c}\s+{a}=\"[^\"]*\"\s*>", re.IGNORECASE)
    for c in ("d", "h")
    for a in ("colspan", "rowspan")
)
_HTML_TABLE_STRIP = re.compile(
    r"</?(table|tr|th|td|thead|tbody|tfoot)[^>]*>", re.IGNORECASE
)
_BLANK_LINES = re.compile(r"\n\s*\n+")
_FORMULA_NUMBER = re.compile(r"\\\] \(\d+\)\n\n")

_EMPTY_FIGURE_SENTINELS = frozenset(
    ("图中没有可识别的文本。", "图中无文本。", "图中没有文本。")
)


def _is_cjk(ch: str) -> bool:
    return "\u4e00" <= ch <= "\u9fff"


def fix_latex_brackets(text: str) -> str:
    return _BIG_BRACKET.sub(r"\\\1\2", text)


def apply_rules(text: str, rules=_RULES) -> str:
    for rx, repl in rules:
        text = rx.sub(repl, text)
    return text


def process_formulas_in_text(text: str) -> str:
    text = text.replace(r"\upmu", r"\mu").replace("\\(", "$").replace("\\)", "$")
    for k, v in _FORMULA_REPLACEMENTS:
        text = text.replace(k, v)
    return text


def handle_text(text: str) -> str:
    if not text:
        return ""
    if text in _EMPTY_FIGURE_SENTINELS:
        return ""
    text = apply_rules(text)
    text = process_formulas_in_text(text)
    # bug-for-bug fidelity: the reference's replace argument is the
    # Python literal '$\bullet$' whose \b is a BACKSPACE escape
    # (to_markdown.py:185), so it matches '$\x08ullet$' — i.e. real
    # '$\bullet$' text is never rewritten
    text = text.replace("$\x08ullet$", "•")
    if "<table>" in text:
        text = _HTML_TABLE_STRIP.sub("", text)
        text = _BLANK_LINES.sub("\n", text)
    return text


def remove_newline_in_heading(text: str) -> str:
    if any(_is_cjk(c) for c in text):
        return text.replace("\n", "")
    return text.replace("\n", " ")


def handle_heading(text: str, label: str) -> str:
    level = HEADING_LEVELS.get(label, "#")
    text = handle_text(remove_newline_in_heading(text.strip()))
    return f"{level} {text}\n\n"


def handle_list_item(text: str) -> str:
    return f"- {text.strip()}\n"


def handle_figure(text: str, section_count: int) -> str:
    if text.startswith("figures/"):
        return f"![Figure {section_count}](../{text})\n\n"
    if text.startswith("!["):
        return f"{text}\n\n"
    if text.startswith("data:image/"):
        return f"![Figure {section_count}]({text})\n\n"
    if ";" in text and "," in text:
        return f"![Figure {section_count}]({text})\n\n"
    return f"![Figure {section_count}](data:image/png;base64,{text})\n\n"


def handle_table(text: str) -> str:
    tables = [_TABLE_OPEN.sub("<table>", t) for t in _TABLE_TAG.findall(text)]
    t = "\n".join(tables)
    t = t.replace("<tdcolspan=", "<td colspan=")
    t = t.replace("<tdrowspan=", "<td rowspan=")
    t = t.replace('"colspan=', '" colspan=')
    t = apply_rules(t, _TABLE_RULES)
    for rx in _CLOSE_SPAN:
        t = rx.sub(lambda m: m.group(0)[:4] + ">", t)
    t = t.replace("\\(", "$").replace("\\)", "$")
    t = t.replace("\\[", "$$").replace("\\]", "$$")
    return t + "\n" + "\n\n"


def handle_formula(text: str) -> str:
    text = text.replace(r"\upmu", r"\mu")
    text = _FORMULA_NUMBER.sub(r"\\]", text)
    text = apply_rules(text, _FORMULA_RULES)
    text = text.replace("\\]\n*\\[", "\\\\")
    text = text.replace("\n\n\\[", "")
    text = text.replace("\\]\n\n", "")
    text = text.replace("\\[\n", "")
    text = text.replace("\n\\]", "")
    text = text.replace("\\]", "")
    text = text.replace("\\[", "")
    text = text.replace("\\( ", "")
    text = text.replace(" \\)", "")
    text = text.replace("\\(", "")
    text = text.replace("\\)", "")
    text = text.strip("$").rstrip("\\ ").replace(r"\upmu", r"\mu")
    for k, v in _FORMULA_REPLACEMENTS:
        text = text.replace(k, v)
    out = "$$" + text + "$$"
    out = out.replace("\n", "\\\\\n")
    return fix_latex_brackets(out) + "\n\n"


def block_markdown(label: str, text: str | None, section_count: int) -> str:
    """One block → its markdown fragment ('' when skipped) — the
    per-item dispatch of convert() (to_markdown.py:390-434)."""
    text = (text or "").strip()
    if not text:
        return ""
    if label in MD_SKIP_LABELS:
        return ""
    text = truncate_repeated_tail(text)
    if label == "doc_title":
        label = "sec_0"
    elif label == "paragraph_title":
        label = "sec_1"
    if label in HEADING_LEVELS:
        return handle_heading(text, label)
    if label in ("image", "chart", "seal"):
        return handle_figure(text, section_count)
    if label == "table":
        return handle_table(text)
    if label == "display_formula":
        return handle_formula(text)
    if label == "list":
        return handle_list_item(text)
    if label == "code":
        return f"```bash\n{text}\n```\n\n"
    return f"{handle_text(text)}\n\n"


def doc_markdown(blocks: list[tuple[str, str | None]]) -> str:
    """Ordered (label, text) blocks → one markdown document.
    section_count is the block's position in the FULL ordered result
    list (skipped blocks still advance it), matching the reference's
    enumerate over recognition_results (to_markdown.py:390)."""
    return "".join(
        block_markdown(label, text, i) for i, (label, text) in enumerate(blocks)
    )
