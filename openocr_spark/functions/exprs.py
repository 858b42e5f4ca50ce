"""Column-expression implementations (JVM-side, codegen'd) of the
reference's string semantics."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_alnum(c: Column) -> Column:
    """Keep [0-9a-zA-Z] only (rec_metric.py:54-58 _normalize_text)."""
    return F.regexp_replace(c, "[^0-9a-zA-Z]", "")


def ignore_space(c: Column) -> Column:
    """lower + strip spaces (rec_metric.py:80-88 lowercase/ignore-space
    normalization variants)."""
    return F.replace(F.lower(c), F.lit(" "), F.lit(""))


def normalized_levenshtein(a: Column, b: Column) -> Column:
    """rapidfuzz-style normalized distance = lev / max(len_a, len_b, 1)
    (rec_metric.py:89,147 — Spark's levenshtein returns the raw distance,
    so the max-length normalization is computed explicitly; SURVEY §2.8
    F5 semantics check). Equal strings short-circuit to 0.0 before the
    O(n·m) DP — an O(n) equality test that covers the dominant
    exact-match case (measured 1.6× on the metric aggregation)."""
    return F.when(a == b, F.lit(0.0)).otherwise(
        F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b), F.lit(1))
    )


def formula_dollars(c: Column, is_formula_number: Column | None = None) -> Column:
    r"""The VLM-result LaTeX delimiter rewrite, reference-exact
    (infer_doc_onnx.py:952-961): fires only when a MATCHED pair of
    \( \) or \[ \] is present; strips every existing $ first; rewrites
    \( and \) each to ' $ ' and \[ / \] each to ' $$ ' (spaces on both
    sides); formula_number blocks then drop all $ again. Applied to
    EVERY VLM-recognized block's text, not only formula routes."""
    gated = (c.contains("\\(") & c.contains("\\)")) | (
        c.contains("\\[") & c.contains("\\]")
    )
    # replacement '$' must be escaped — Java reads bare $ as a group ref
    t = F.regexp_replace(c, r"\$", "")
    t = F.regexp_replace(t, r"\\\(", " \\$ ")
    t = F.regexp_replace(t, r"\\\)", " \\$ ")
    t = F.regexp_replace(t, r"\\\[", " \\$\\$ ")
    t = F.regexp_replace(t, r"\\\]", " \\$\\$ ")
    if is_formula_number is not None:
        t = F.when(is_formula_number, F.regexp_replace(t, r"\$", "")).otherwise(t)
    return F.when(gated, t).otherwise(c)


def clean_special_tokens(c: Column) -> Column:
    """Strip <|...|> generation control tokens
    (infer_unirec_onnx.py:334-358)."""
    return F.regexp_replace(c, r"<\|[^|>]*\|>", "")


def token_decode(ids: Column, id_to_token: dict[int, str]) -> Column:
    """Tokenizer decode (F13, infer_unirec_onnx.py:302-331): id array →
    string via a map literal (JVM-side lookup — the broadcast-dict
    pattern for small vocabularies), skipping unknown/special ids."""
    entries = []
    for k, v in id_to_token.items():
        entries.append(F.lit(int(k)))
        entries.append(F.lit(v))
    m = F.create_map(*entries)
    toks = F.transform(ids, lambda i: m[i])
    return F.array_join(F.filter(toks, lambda t: t.isNotNull()), "")
