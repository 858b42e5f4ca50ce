"""Long-text recognition via sliding windows + stream-merge (SURVEY
§2.8 F6 composed into the A5 metric — the reference's rec_metric_long
flow: openrec/metrics/rec_metric_long.py slices out-of-length text into
overlapping crops, recognizes each, merges by longest suffix/prefix
overlap, then scores accuracy/NED against the full label).

Here the "recognition" of each slice is the identity (the fixture has
no long-image model); what is real and tested is the DATAFLOW: JVM-side
slicing (sequence + substr, no Python), a per-key grouped merge via the
same stream_match kernel the stateful streaming operator uses (batch/
stream parity by shared code), and the metric aggregation. Slices may
over-merge when the text is repetitive (the overlap detector finds a
longer-than-structural overlap) — exactly the reference's failure mode
for repetitive long lines — so the fixture metric is non-vacuous."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WINDOW = 48
DEFAULT_STRIDE = 40


def slice_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
    stride: int = DEFAULT_STRIDE,
) -> DataFrame:
    """(id, text) → (id, slice_idx, slice) overlapping windows, pure
    column expressions: n = max(1, ceil((len−window)/stride)+1),
    slice_i = substr(i·stride+1, window)."""
    n = F.greatest(
        (F.ceil((F.length(F.col(text_col)) - window) / F.lit(stride)) + 1).cast(
            "int"
        ),
        F.lit(1),
    )
    idxs = F.sequence(F.lit(0), n - 1)
    slices = F.transform(
        idxs,
        lambda i: F.substr(
            F.col(text_col), i * stride + 1, F.lit(window)
        ),
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(slices).alias("slice_idx", "slice"),
        )
    )


def merge_slices(slices: DataFrame) -> DataFrame:
    """(id, slice_idx, slice) → (id, merged) via the longest
    suffix/prefix-overlap merge (functions/text.py stream_match — the
    same kernel the applyInPandasWithState streaming operator runs, so
    batch and streaming merges agree by construction).

    Plan: JVM-side collect_list + array_sort does the per-key gather
    (one shuffle with map-side partial aggregation), then ONE
    Arrow-batched pandas UDF merges thousands of keys per batch —
    measured ~4× faster than a grouped applyInPandas, which pays
    per-group pandas-frame overhead on tiny groups."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    from openocr_spark.functions.text import stream_merge

    @pandas_udf(StringType())
    def merge_udf(arr: pd.Series) -> pd.Series:
        # single-slice (in-length) texts bypass the stream merge — the
        # reference streams only sliced long lines, and stream_match's
        # boundary trim would drop the last char of a lone segment
        return pd.Series(
            [stream_merge([s["slice"] for s in a]) for a in arr]
        )

    gathered = slices.groupBy("id").agg(
        F.array_sort(
            F.collect_list(F.struct("slice_idx", "slice"))
        ).alias("ordered")
    )
    return gathered.select("id", merge_udf("ordered").alias("merged"))


def normalize_long_pairs(
    pairs: DataFrame, ignore_space: bool = True, is_filter: bool = False
) -> DataFrame:
    """RecMetricLong's pre-metric normalization (rec_metric_long.py:
    48-52 with the reference DEFAULTS ignore_space=True, is_filter=
    False): strip ALL spaces from pred and target, and under is_filter
    keep only [0-9a-zA-Z] lowered (:27-31 _normalize_text)."""
    pred, gt = F.col("pred"), F.col("gt")
    if ignore_space:
        pred = F.replace(pred, F.lit(" "), F.lit(""))
        gt = F.replace(gt, F.lit(" "), F.lit(""))
    if is_filter:
        pred = F.lower(F.regexp_replace(pred, "[^0-9a-zA-Z]", ""))
        gt = F.lower(F.regexp_replace(gt, "[^0-9a-zA-Z]", ""))
    return pairs.select(pred.alias("pred"), gt.alias("gt"))


def long_text_indicator_aggs() -> list:
    """Aggregate columns for the reference's long-text secondary
    indicators over (pred, gt) pairs (rec_metric_long.py:67-75,
    reported at :93-103): acc_slice (pred is a PREFIX of the target),
    f_l_acc (first AND last chars match, both strings non-empty),
    len_acc (length match) — each over the same eps=1e-5 denominator as
    acc, empty input reading 0.0 like the reference's 0/(0+eps).
    Exposed as columns so rec_metric_long folds them into ONE .agg with
    the rec_metric aggregates (the slice+merge lineage is expensive —
    a crossJoin of two aggregations would execute it twice).
    Differentially pinned against the reference's own RecMetricLong in
    test_metric_differential."""
    pred, gt = F.col("pred"), F.col("gt")
    eps = F.lit(1e-5)
    n = F.count("*")
    is_slice = pred == F.substring(gt, 1, F.length(pred))
    is_fl = (
        (F.length(pred) >= 1)
        & (F.length(gt) >= 1)
        & (F.substring(pred, 1, 1) == F.substring(gt, 1, 1))
        & (F.substring(pred, -1, 1) == F.substring(gt, -1, 1))
    )
    is_len = F.length(pred) == F.length(gt)

    def frac(c):
        return F.round(F.coalesce(F.sum(c), F.lit(0.0)) / (n + eps), 6)

    return [
        frac(is_slice.cast("double")).alias("acc_slice"),
        frac(is_fl.cast("double")).alias("f_l_acc"),
        frac(is_len.cast("double")).alias("len_acc"),
    ]


def long_text_indicators(pairs: DataFrame) -> DataFrame:
    """One-row DataFrame form of long_text_indicator_aggs."""
    return pairs.agg(*long_text_indicator_aggs())


def rec_metric_long(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
    stride: int = DEFAULT_STRIDE,
    ignore_space: bool = True,
    is_filter: bool = False,
) -> DataFrame:
    """Full composed metric: slice → merge → RecMetricLong's
    normalization (ignore_space=True is the reference DEFAULT — spaces
    are stripped before every comparison) → exact acc + 1−NED plus the
    reference's secondary indicators (acc_slice / f_l_acc / len_acc),
    all in ONE aggregation pass over the merge lineage."""
    from openocr_spark.operators.metrics import rec_metric_aggs

    base = docs.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("gt")
    )
    merged = merge_slices(
        slice_text(base, "doc_id", "gt", window, stride)
    ).select(F.col("id").alias("doc_id"), F.col("merged").alias("pred"))
    pairs = normalize_long_pairs(
        base.join(merged, "doc_id").select("pred", "gt"), ignore_space, is_filter
    )
    return pairs.agg(*rec_metric_aggs(), *long_text_indicator_aggs())
