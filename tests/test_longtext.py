"""Long-text slice → stream-merge → metric (SURVEY F6 composed into A5,
the rec_metric_long flow)."""

from pyspark.sql import functions as F

from openocr_spark.operators.longtext import merge_slices, rec_metric_long, slice_text


def test_slice_text_positions(spark):
    df = spark.createDataFrame([("d1", "abcdefghij")], "doc_id string, text string")
    rows = slice_text(df, window=4, stride=3).orderBy("slice_idx").collect()
    assert [(r.slice_idx, r.slice) for r in rows] == [
        (0, "abcd"), (1, "defg"), (2, "ghij"),
    ]


def test_slice_short_text_single_window(spark):
    df = spark.createDataFrame([("d1", "ab")], "doc_id string, text string")
    rows = slice_text(df, window=8, stride=6).collect()
    assert [(r.slice_idx, r.slice) for r in rows] == [(0, "ab")]


def test_merge_reconstructs_distinct_text(spark):
    df = spark.createDataFrame(
        [("d1", "the cat sat on the mat near a red door today")],
        "doc_id string, text string",
    )
    merged = merge_slices(slice_text(df, window=16, stride=12)).collect()
    assert merged[0]["merged"] == "the cat sat on the mat near a red door today"


def test_merge_overmerges_repetitive_text(spark):
    """Repetitive text defeats the overlap detector (the reference's
    known failure mode for repeated long lines): the found overlap is
    longer than the structural one, so content collapses."""
    text = "ab " * 20  # 60 chars of period-3 repetition
    df = spark.createDataFrame([("d1", text.strip())], "doc_id string, text string")
    merged = merge_slices(slice_text(df, window=12, stride=9)).collect()
    assert len(merged[0]["merged"]) < len(text.strip())


def test_rec_metric_long_on_driver_table(spark):
    out = rec_metric_long(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    ).collect()[0]
    assert out["all_num"] == 500
    # non-vacuous: most docs reconstruct exactly, a few over-merge
    assert 0 < out["correct_num"] < 500
    assert 0.9 < out["acc"] < 1.0
    assert out["one_minus_ned"] > 0.9
