"""J5 containment join + untokenize, and the seeded shuffle (ST4)."""

from openocr_spark.operators.layout import figures_in_tables, untokenize
from openocr_spark.sources.readers import seeded_shuffle

SCHEMA = (
    "doc_id string, cls_id int, label string, score double, "
    "bbox array<double>, custom_value double, text string"
)


def test_figures_in_tables(spark):
    rows = [
        ("d1", 0, "table", 0.9, [0.0, 0.0, 100.0, 100.0], 1.0, "tbl"),
        ("d1", 1, "image", 0.9, [10.0, 10.0, 30.0, 30.0], 2.0, None),   # inside
        ("d1", 1, "chart", 0.9, [40.0, 40.0, 60.0, 60.0], 3.0, None),   # inside
        ("d1", 1, "image", 0.9, [200.0, 200.0, 220.0, 220.0], 4.0, None),  # outside
        ("d2", 0, "table", 0.9, [0.0, 0.0, 50.0, 50.0], 1.0, "t2"),     # no figs
    ]
    blocks = spark.createDataFrame(rows, schema=SCHEMA)
    out = figures_in_tables(blocks).collect()
    assert len(out) == 2
    toks = {(r["doc_id"], r["f_order"]): r["token"] for r in out}
    assert toks[("d1", 2.0)] == "<figure_0>"
    assert toks[("d1", 3.0)] == "<figure_1>"


def test_untokenize():
    got = untokenize(
        "<fcel>a<figure_0>b", {"<figure_0>": "![fig](media://x/0)"}
    )
    assert got == "<fcel>a![fig](media://x/0)b"


def test_seeded_shuffle_deterministic(spark):
    df = spark.range(100)
    a = [r["id"] for r in seeded_shuffle(df, seed=7).collect()]
    b = [r["id"] for r in seeded_shuffle(df, seed=7).collect()]
    c = [r["id"] for r in seeded_shuffle(df, seed=7, epoch=1).collect()]
    assert a == b
    assert a != c
    assert sorted(a) == list(range(100))


def test_seeded_shuffle_local_deterministic_one_exchange(spark):
    """Scale-path reshuffle: reproducible permutation, different per
    epoch, and exactly ONE shuffle exchange (no range-partition sort)."""
    from openocr_spark import plans
    from openocr_spark.sources.readers import seeded_shuffle_local

    df = spark.range(100)
    out = seeded_shuffle_local(df, seed=7, partitions=4)
    a = [r["id"] for r in out.collect()]
    b = [r["id"] for r in seeded_shuffle_local(df, seed=7, partitions=4).collect()]
    c = [r["id"] for r in seeded_shuffle_local(df, seed=7, epoch=1, partitions=4).collect()]
    assert a == b and a != c and sorted(a) == list(range(100))
    plan = plans.physical_plan(out)
    # one hash exchange; AQE's executed-plan string prints it in both
    # the initial and final trees, so the line count is ≤ 2
    assert plans.count_exchanges(out) <= 2, plan
    assert "rangepartitioning" not in plan.lower()
