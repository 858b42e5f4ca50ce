"""Boilerplate classifier for text spans — pure vectorized Spark column
expressions (JVM-side, whole-stage-codegen'd; zero Python).

Semantics spec shared with oracle.is_boilerplate. Mirrors the reference's
boilerplate-label strip for doc assembly (tools/infer_doc_onnx.py:566-568;
tools/to_markdown.py:398-406 drops header/footer/aside_text/...) re-cast
as DOM/byte-stream heuristics over raw text spans:
  1. marker-tagged spans (`<header>`, `<footer>`, `<nav>`, `<aside>`)
  2. spans shorter than 3 chars after trim
  3. link farms: href density over tokens > 0.3
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MARKER_RE = r"^\s*<(header|footer|nav|aside)>"


def is_boilerplate(text: Column) -> Column:
    marker = text.rlike(MARKER_RE)
    short = F.length(F.trim(text)) < 3
    # token count without allocating a split array: #spaces + 1 ==
    # len(split(' ')) exactly (empty fragments between multi-spaces
    # count in both) — this runs on every text span, keep it arithmetic
    tokens = F.length(text) - F.length(F.replace(text, F.lit(" "))) + F.lit(1)
    href = (F.length(text) - F.length(F.replace(text, F.lit("href=")))) / F.lit(5)
    linky = (href / F.greatest(tokens, F.lit(1))) > F.lit(0.3)
    return text.isNull() | marker | short | linky
