"""The OpenDoc document-parse pipeline (SURVEY §3.2,
tools/infer_doc_onnx.py:758-1028) as one DataFrame flow over a
layout-blocks table:

  blocks → score filter (P6) → overlap dedup (J4) → merge (G13)
         → reading order + numbering (W2/W3) → route (label→task)
         → figure-in-table tokenize (J5, utils.py:478-556): contained
           figures become <figure_k> placeholder tokens the table
           recognizer sees
         → recognize:
             ocr/chart → greedy AR decode loop (W6, the real
               token-by-token generation kernel with EOS break and the
               L4 max_length cap — kernels/ar_decode.py)
             table → OTSL surrogate (figure tokens embedded as cells)
             formula → deterministic latex surrogate
         → post: repetition truncation (F7), OTSL→HTML (F9),
           figure untokenize (J5), formula $-rewrite (F10)
         → assemble: per-doc ordered span rows + markdown

Text generation is deterministic from (doc_id, block_id) so the
single-node oracle reproduces it without any model; the CONTROL FLOW
(sequential decode, tokenize/untokenize joins, per-doc assembly) is the
real reference semantics.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openocr_spark.functions.exprs import formula_dollars
from openocr_spark.functions.otsl import otsl_to_html
from openocr_spark.functions.text import truncate_repetitive_content
from openocr_spark.kernels.ar_decode import DEFAULT_MAX_LENGTH, ar_decode_text
from openocr_spark.operators.layout import (
    IGNORE_LABELS,
    figures_in_tables,
    filter_overlap_blocks,
    merge_text_blocks,
    order_and_label,
    route,
    score_filter,
    untokenize,
)

_WORDS = "alpha beta gamma delta sigma lambda theta omega".split()


def figure_markdown(doc_id: str, f_order: float, fig_idx: int) -> str:
    """Markdown replacement for a figure placeholder token — the
    cropped-figure image reference the reference writes during
    untokenize (utils.py:478-556 saves the crop under figures/ and
    substitutes its path)."""
    return f"![Figure {fig_idx}](figures/{doc_id}_{int(f_order)}.png)"


def surrogate_block_text(
    doc_id: str,
    block_id: str,
    task: str | None,
    fig_tokens: list[str] | None = None,
    max_gen_length: int = DEFAULT_MAX_LENGTH,
) -> str | None:
    """Deterministic recognition surrogate per routed block. The ocr and
    chart routes run the REAL greedy AR decode loop (W6) over surrogate
    step-logits; table/formula emit structured markup the downstream
    F9/F10 passes consume. Table blocks with contained figures (J5)
    embed the placeholder tokens as cells, exactly where the reference's
    tokenized crop would sit in the recognized table."""
    if task is None:
        return None
    h = int(hashlib.md5(f"{doc_id}/{block_id}".encode()).hexdigest()[:8], 16)
    if task == "table_rec":
        a, b, c = _WORDS[h % 8], _WORDS[(h >> 3) % 8], _WORDS[(h >> 6) % 8]
        cells = f"<fcel>{a}<fcel>{b}<nl><fcel>{c}<ecel>"
        if fig_tokens:
            for tok in fig_tokens:
                cells += f"<nl><fcel>{tok}<ecel>"
        return cells
    if task == "formula_rec":
        return f"\\( {_WORDS[h % 8]}_{h % 10} \\)"
    # ocr and chart routes: the sequential generation kernel
    prefix = "chart: " if task == "chart_rec" else ""
    return prefix + ar_decode_text(f"{doc_id}/{block_id}", max_gen_length)


def postprocess_block_text(
    raw: str | None,
    task: str | None,
    doc_id: str,
    fig_tokens: list[str] | None,
    fig_mds: list[str] | None,
) -> str | None:
    """Shared per-block post pipeline: F7 truncation, F9 OTSL→HTML,
    J5 untokenize (figure placeholders → markdown image refs)."""
    if raw is None:
        return None
    text = truncate_repetitive_content(raw)
    if task == "table_rec":
        text = otsl_to_html(text)
        if fig_tokens:
            text = untokenize(text, dict(zip(fig_tokens, fig_mds or [])))
    return text


def _recognize_kernel(max_gen_length: int):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for doc_id, block_id, task, ftoks, fmds in zip(
                pdf["doc_id"], pdf["block_id"], pdf["task"],
                pdf["fig_tokens"], pdf["fig_mds"],
            ):
                ftoks = list(ftoks) if ftoks is not None else None
                fmds = list(fmds) if fmds is not None else None
                raw = surrogate_block_text(
                    doc_id, block_id, task, ftoks, max_gen_length
                )
                texts.append(
                    postprocess_block_text(raw, task, doc_id, ftoks, fmds)
                )
            out = pdf.drop(columns=["fig_tokens", "fig_mds"])
            out["text"] = texts
            yield out

    return kernel


def _figure_tokens(staged: DataFrame) -> DataFrame:
    """Per (doc_id, table custom_value): ordered arrays of figure
    placeholder tokens and their markdown replacements (J5). The
    containment join and this aggregation both key on doc_id — one
    co-partitioned shuffle, no cross-doc surface."""
    figs = figures_in_tables(staged)
    pairs = F.array_sort(
        F.collect_list(F.struct("f_order", "token", "fig_md"))
    )
    return (
        figs.withColumn(
            "fig_md",
            F.format_string(
                "![Figure %d](figures/%s_%d.png)",
                F.col("fig_idx"),
                F.col("doc_id"),
                F.col("f_order").cast("int"),
            ),
        )
        .groupBy(F.col("doc_id").alias("f_doc_id"), F.col("t_order"))
        .agg(pairs.alias("pairs"))
        .select(
            "f_doc_id",
            "t_order",
            F.transform("pairs", lambda s: s["token"]).alias("fig_tokens"),
            F.transform("pairs", lambda s: s["fig_md"]).alias("fig_mds"),
        )
    )


def doc_parse(
    blocks: DataFrame,
    score_threshold: float = 0.4,
    max_gen_length: int = DEFAULT_MAX_LENGTH,
) -> DataFrame:
    """blocks → per-block parsed rows (doc_id, block_id, label, task,
    reading_order, bbox, text) after the full layout flow."""
    staged = route(
        order_and_label(
            merge_text_blocks(filter_overlap_blocks(score_filter(blocks, score_threshold)))
        )
    ).select(
        "doc_id", "block_id", "label", "task", "reading_order", "bbox",
        "custom_value",
    )
    figs = _figure_tokens(staged)
    staged = staged.join(
        figs,
        (staged["doc_id"] == figs["f_doc_id"])
        & (staged["custom_value"] == figs["t_order"]),
        "left",
    ).drop("f_doc_id", "t_order")
    schema = (
        "doc_id string, block_id string, label string, task string, "
        "reading_order int, bbox array<double>, custom_value double, text string"
    )
    recognized = staged.mapInPandas(_recognize_kernel(max_gen_length), schema=schema)
    # formula delimiter rewrite stays a column expr (F10)
    return recognized.withColumn(
        "text",
        F.when(
            F.col("task") == "formula_rec", formula_dollars(F.col("text"))
        ).otherwise(F.col("text")),
    )


def doc_spans(parsed: DataFrame) -> DataFrame:
    """Parsed blocks → per-doc ordered span rows (the doc-task analog of
    the extraction output): boilerplate labels dropped, order re-ranked."""
    clean = parsed.filter(~F.col("label").isin(*IGNORE_LABELS))
    assembled = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct("custom_value", "label", "text", "block_id")
            )
        ),
        lambda s, i: F.struct(
            s["label"].alias("kind"),
            s["text"].alias("text"),
            s["block_id"].alias("block_id"),
            i.cast("int").alias("order"),
        ),
    )
    return clean.groupBy("doc_id").agg(assembled.alias("spans"))
