"""Multi-suite recognition eval harness — the Spark restatement of
tools/eval_rec_all_en.py:54-203 (SURVEY §3.3): benchmark suites united
with a suite column, per-suite exact-match acc + 1−NED, plus the
weighted/unweighted averages the reference writes to CSV — expressed as
ONE SQL job with GROUPING SETS-style rollup instead of a python loop
over LMDB dirs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openocr_spark.functions.exprs import normalized_levenshtein


def rec_suite_report(
    pairs: DataFrame,
    suite_col: str = "suite",
    pred_col: str = "pred",
    gt_col: str = "gt",
) -> DataFrame:
    """pairs(suite, pred, gt) → per-suite rows + a '__all__' rollup row
    whose acc is the SAMPLE-WEIGHTED average (the reference's weighted
    avg, eval_rec_all_en.py:127-177: sum(acc_i·n_i)/sum(n_i) — which is
    exactly global avg over samples, so one rollup computes it)."""
    ned = normalized_levenshtein(F.col(pred_col), F.col(gt_col))
    correct = F.when(F.col(pred_col) == F.col(gt_col), 1.0).otherwise(0.0)
    out = (
        pairs.rollup(suite_col)
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(correct), 6).alias("acc"),
            F.round(F.avg(1.0 - ned), 6).alias("one_minus_ned"),
        )
        .withColumn(
            suite_col, F.coalesce(F.col(suite_col), F.lit("__all__"))
        )
    )
    return out


def rec_suite_unweighted_avg(report: DataFrame, suite_col: str = "suite") -> DataFrame:
    """The reference's second average: arithmetic mean of per-suite accs
    (each suite counts equally regardless of size)."""
    return (
        report.filter(F.col(suite_col) != "__all__")
        .agg(
            F.round(F.avg("acc"), 6).alias("macro_acc"),
            F.round(F.avg("one_minus_ned"), 6).alias("macro_one_minus_ned"),
        )
    )
