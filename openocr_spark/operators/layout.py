"""Layout-block operators — the OpenDoc layout-parse → route → assemble
flow (SURVEY §3.2) over a blocks table
(doc_id, cls_id, label, score, bbox[x1,y1,x2,y2], custom_value).

Per-doc geometric passes (overlap dedup, merge) run as grouped pandas
UDFs (`applyInPandas` per doc_id): K is dozens of blocks per doc, so the
O(K²) loops stay in one group — exactly how the reference iterates
(utils.py:129-168, 258-413) — while docs distribute across the cluster.
Ordering/numbering/routing are pure column expressions.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# boilerplate layout classes excluded from assembled output
# (infer_doc_onnx.py:566-568; to_markdown.py:398-406)
IGNORE_LABELS = (
    "header", "footer", "aside_text", "number", "footnote",
    "header_image", "footer_image",
)

# routing table: label → recognition task prefix (infer_doc_onnx.py:894-924)
ROUTE = {
    "table": "table_rec",
    "chart": "chart_rec",
    "display_formula": "formula_rec",
    "inline_formula": "formula_rec",
}
ROUTE_DEFAULT = "ocr"
NO_RECOGNIZE = ("image", "seal")  # image-kind blocks skip recognition


def score_filter(blocks: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Layout score filter (infer_doc_onnx.py:422-425, SURVEY P6)."""
    return blocks.filter(F.col("score") > threshold)


def _overlap_over_smaller(a: np.ndarray, b: np.ndarray) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    area_a = max((a[2] - a[0]) * (a[3] - a[1]), 1e-9)
    area_b = max((b[2] - b[0]) * (b[3] - b[1]), 1e-9)
    return inter / min(area_a, area_b)


def _dedup_one_doc(pdf: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Greedy overlap dedup (utils.py:129-168 semantics): for any pair
    with overlap-over-smaller > threshold, drop the smaller-area block.
    The exemption is the reference's EXACT rule: one side's label is
    'image' (only 'image' — a seal-vs-text pair still dedups) AND the
    labels differ (image-vs-image dedups). A block dropped mid-scan
    stops dropping others (the reference re-checks dropped_indexes per
    pair, utils.py:149)."""
    boxes = np.array(pdf["bbox"].tolist(), dtype=np.float64)
    labels = pdf["label"].tolist()
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    drop: set[int] = set()
    k = len(pdf)
    for i in range(k):
        if i in drop:
            continue
        for j in range(i + 1, k):
            if i in drop:
                break  # i was dropped by an earlier j in this scan
            if j in drop:
                continue
            if (
                (labels[i] == "image" or labels[j] == "image")
                and labels[i] != labels[j]
            ):
                continue  # image-vs-other exempt (utils.py:157-160)
            if _overlap_over_smaller(boxes[i], boxes[j]) > threshold:
                drop.add(j if areas[j] <= areas[i] else i)
    keep = [i for i in range(k) if i not in drop]
    return pdf.iloc[keep]


def filter_overlap_blocks(blocks: DataFrame, threshold: float = 0.7) -> DataFrame:
    """Per-doc overlap dedup via applyInPandas (SURVEY §2.3 J4)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _dedup_one_doc(pdf, threshold)

    return blocks.groupBy("doc_id").applyInPandas(fn, schema=blocks.schema)


def _merge_one_doc(pdf: pd.DataFrame, x_tol: float, max_aspect: float) -> pd.DataFrame:
    """Alignment-based vertical merge of text blocks
    (utils.py:258-413 merge_blocks semantics, simplified): two 'text'
    blocks merge when left+right edges align within x_tol, they are
    vertically adjacent (gap < mean block height), and the merged box
    aspect h/w stays < max_aspect. Merged text joins with '\\n'; bbox is
    the union; score/custom_value from the earlier block."""
    pdf = pdf.sort_values("custom_value", kind="stable").reset_index(drop=True)
    boxes = [list(map(float, b)) for b in pdf["bbox"]]
    rows = pdf.to_dict("records")
    merged = [False] * len(rows)
    out = []
    for i in range(len(rows)):
        if merged[i]:
            continue
        cur = dict(rows[i])
        cb = list(boxes[i])
        if cur["label"] == "text":
            for j in range(i + 1, len(rows)):
                if merged[j] or rows[j]["label"] != "text":
                    continue
                nb = boxes[j]
                h_cur = cb[3] - cb[1]
                h_nxt = nb[3] - nb[1]
                aligned = abs(cb[0] - nb[0]) <= x_tol and abs(cb[2] - nb[2]) <= x_tol
                gap = nb[1] - cb[3]
                adjacent = 0 <= gap < (h_cur + h_nxt) / 2
                new_h = nb[3] - cb[1]
                new_w = max(cb[2], nb[2]) - min(cb[0], nb[0])
                if aligned and adjacent and new_h / max(new_w, 1e-9) < max_aspect:
                    cb = [min(cb[0], nb[0]), cb[1], max(cb[2], nb[2]), nb[3]]
                    if rows[j].get("text"):
                        cur["text"] = (cur.get("text") or "") + "\n" + rows[j]["text"]
                    merged[j] = True
        cur["bbox"] = cb
        out.append(cur)
    return pd.DataFrame(out, columns=pdf.columns)


def merge_text_blocks(
    blocks: DataFrame, x_tol: float = 5.0, max_aspect: float = 3.0
) -> DataFrame:
    """Per-doc alignment merge via applyInPandas (SURVEY §2.8 G13)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _merge_one_doc(pdf, x_tol, max_aspect)

    return blocks.groupBy("doc_id").applyInPandas(fn, schema=blocks.schema)


def order_and_label(blocks: DataFrame) -> DataFrame:
    """Reading order by model-emitted custom_value + per-doc 1-based
    label numbering `label_{idx:02d}` (infer_doc_onnx.py:459-466,
    SURVEY W2/W3). Pure window expressions — one shuffle on doc_id."""
    w = Window.partitionBy("doc_id").orderBy("custom_value")
    wl = Window.partitionBy("doc_id", "label").orderBy("custom_value")
    return blocks.select(
        "*",
        F.row_number().over(w).alias("reading_order"),
        F.concat(
            F.col("label"),
            F.format_string("_%02d", F.row_number().over(wl)),
        ).alias("block_id"),
    )


def route(blocks: DataFrame) -> DataFrame:
    """Per-label task routing (infer_doc_onnx.py:894-924): adds a `task`
    column; image-kind blocks get NULL (skip recognition)."""
    task = F.lit(ROUTE_DEFAULT)
    for label, t in ROUTE.items():
        task = F.when(F.col("label") == label, F.lit(t)).otherwise(task)
    task = F.when(F.col("label").isin(*NO_RECOGNIZE), F.lit(None)).otherwise(task)
    return blocks.withColumn("task", task)


def figures_in_tables(blocks: DataFrame) -> DataFrame:
    """Containment theta-join (SURVEY §2.3 J5, utils.py:478-556
    tokenize_figure_of_table): match figure blocks whose bbox is
    contained in a table block of the same doc; emit one row per
    (table, figure) pair with the placeholder token the recognizer would
    see. Expressed as a real Spark join — equi on doc_id, theta on
    containment — so it distributes; per-doc pair counts are dozens."""
    t = blocks.filter(F.col("label") == "table").select(
        "doc_id",
        F.col("bbox").alias("t_bbox"),
        F.col("custom_value").alias("t_order"),
    )
    f = blocks.filter(F.col("label").isin("image", "chart")).select(
        "doc_id",
        F.col("bbox").alias("f_bbox"),
        F.col("custom_value").alias("f_order"),
    )
    contained = (
        (F.col("f_bbox")[0] >= F.col("t_bbox")[0])
        & (F.col("f_bbox")[1] >= F.col("t_bbox")[1])
        & (F.col("f_bbox")[2] <= F.col("t_bbox")[2])
        & (F.col("f_bbox")[3] <= F.col("t_bbox")[3])
    )
    w = Window.partitionBy("doc_id", "t_order").orderBy("f_order")
    return (
        t.join(f, "doc_id")
        .filter(contained)
        .withColumn("fig_idx", F.row_number().over(w) - 1)
        .select(
            "doc_id",
            "t_order",
            "f_order",
            "f_bbox",
            "fig_idx",
            F.format_string("<figure_%d>", F.col("fig_idx")).alias("token"),
        )
    )


def untokenize(text: str, token_to_md: dict[str, str]) -> str:
    """Replace figure placeholder tokens in recognized table text with
    their markdown (the untokenize step, utils.py:478-556)."""
    for tok, md in token_to_md.items():
        text = text.replace(tok, md)
    return text


def assemble_markdown(blocks: DataFrame) -> DataFrame:
    """Per-doc markdown assembly with the FULL per-label handler set
    (to_markdown.py:90-448 semantics — headings, lists, figures, tables
    with attribute repair, display formulas, code fences, boilerplate
    skip list; functions/markdown.py). The per-block conversion runs as
    an Arrow-batched pandas UDF (string → string, no kernel state); the
    per-doc ordered concatenation stays JVM-side (one groupBy shuffle).

    Input: doc_parse output (doc_id, label, text, reading_order,
    custom_value). section_count is the block's 0-based position in the
    doc's full ordered block list (reading_order − 1) — skipped blocks
    still advance it, matching the reference's enumerate over
    recognition_results (to_markdown.py:390)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    from openocr_spark.functions.markdown import block_markdown

    @pandas_udf(StringType())
    def md_udf(label: pd.Series, text: pd.Series, sec: pd.Series) -> pd.Series:
        return pd.Series(
            [
                block_markdown(lb, tx, int(s))
                for lb, tx, s in zip(label, text, sec)
            ]
        )

    frag = blocks.select(
        "doc_id",
        "custom_value",
        md_udf(F.col("label"), F.col("text"), F.col("reading_order") - 1).alias(
            "md"
        ),
    )
    ordered = frag.select(
        "doc_id", F.struct(F.col("custom_value"), F.col("md")).alias("s")
    )
    return ordered.groupBy("doc_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s["md"]),
            "",
        ).alias("markdown")
    )
