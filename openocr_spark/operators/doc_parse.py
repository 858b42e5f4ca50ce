"""The OpenDoc document-parse pipeline (SURVEY §3.2,
tools/infer_doc_onnx.py:758-1028) as one DataFrame flow over a
layout-blocks table:

  blocks → score filter (P6) → overlap dedup (J4) → merge (G13)
         → reading order + numbering (W2/W3) → route (label→task)
         → recognize (surrogate: deterministic per-block text from the
           block fixture; table blocks emit OTSL)
         → post: repetition truncation (F7), formula $-rewrite (F10),
           OTSL→HTML (F9)
         → assemble: per-doc ordered span rows + markdown

The surrogate recognizer mirrors the extraction kernels' design: block
text is derived deterministically from (doc_id, block_id) so the oracle
can reproduce it without any model.
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
from openocr_spark.operators.layout import (
    IGNORE_LABELS,
    filter_overlap_blocks,
    merge_text_blocks,
    order_and_label,
    route,
    score_filter,
)

_WORDS = "alpha beta gamma delta sigma lambda theta omega".split()


def surrogate_block_text(doc_id: str, block_id: str, task: str | None) -> str | None:
    """Deterministic recognition surrogate per routed block."""
    if task is None:
        return None
    h = int(hashlib.md5(f"{doc_id}/{block_id}".encode()).hexdigest()[:8], 16)
    if task == "table_rec":
        a, b, c = _WORDS[h % 8], _WORDS[(h >> 3) % 8], _WORDS[(h >> 6) % 8]
        return f"<fcel>{a}<fcel>{b}<nl><fcel>{c}<ecel>"
    if task == "formula_rec":
        return f"\\( {_WORDS[h % 8]}_{h % 10} \\)"
    if task == "chart_rec":
        return f"chart: {_WORDS[h % 8]} vs {_WORDS[(h >> 3) % 8]}"
    n = 3 + h % 5
    words = [_WORDS[(h >> (2 * i)) % 8] for i in range(n)]
    if h % 7 == 0:  # exercise the repetition truncation path
        words += [words[-1]] * 6
    return " ".join(words)


def _recognize_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts = []
        for doc_id, block_id, task in zip(pdf["doc_id"], pdf["block_id"], pdf["task"]):
            raw = surrogate_block_text(doc_id, block_id, task)
            if raw is not None:
                raw = truncate_repetitive_content(raw)
                if task == "table_rec":
                    raw = otsl_to_html(raw)
            texts.append(raw)
        out = pdf.copy()
        out["text"] = texts
        yield out


def doc_parse(blocks: DataFrame, score_threshold: float = 0.4) -> DataFrame:
    """blocks → per-block parsed rows (doc_id, block_id, label, task,
    reading_order, bbox, text) after the full layout flow."""
    staged = route(
        order_and_label(
            merge_text_blocks(filter_overlap_blocks(score_filter(blocks, score_threshold)))
        )
    ).select("doc_id", "block_id", "label", "task", "reading_order", "bbox", "custom_value")
    schema = (
        "doc_id string, block_id string, label string, task string, "
        "reading_order int, bbox array<double>, custom_value double, text string"
    )
    recognized = staged.mapInPandas(_recognize_kernel, schema=schema)
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
