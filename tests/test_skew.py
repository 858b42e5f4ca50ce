"""Skew hardening (SURVEY §5.2): with the salted repartition on, media
work from the 1%-of-docs × 50× media-heavy tail must spread uniformly —
no partition holds more than a small multiple of the median row count."""

from pyspark.sql import functions as F

from openocr_spark import schemas
from openocr_spark.config import ExtractConfig
from openocr_spark.fixtures import gen_documents_pdf
from openocr_spark.operators.extract import explode_spans


def test_salted_repartition_balances_skew_tail(spark):
    # 200 docs → 2 skew docs carrying ~150 media spans each (~60% of all
    # media); without the salt those docs' spans would land together
    pdf = gen_documents_pdf(200)
    docs = spark.createDataFrame(pdf.to_dict("records"), schema=schemas.DOCUMENTS)
    n_parts = 16
    media = (
        explode_spans(docs)
        .filter(F.col("kind") == "media")
        .select("doc_id", "offset", "media_ref")
        .repartition(n_parts, "media_ref")
    )
    sizes = [
        r["n"]
        for r in media.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    sizes.sort()
    median = sizes[len(sizes) // 2]
    assert max(sizes) <= 2 * max(median, 1), sizes

    # control: partitioning by doc_id concentrates the tail
    by_doc = (
        explode_spans(docs)
        .filter(F.col("kind") == "media")
        .repartition(n_parts, "doc_id")
    )
    doc_sizes = [
        r["n"]
        for r in by_doc.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    doc_sizes.sort()
    doc_median = doc_sizes[len(doc_sizes) // 2]
    # the skewed layout is visibly worse than the salted one
    assert max(doc_sizes) > 2 * max(doc_median, 1)


def test_monster_document_10k_media_spans_bounded(spark):
    """VERDICT r2 item 7: ONE document carrying 10⁴ media spans (vs 100
    normal docs with ~2 each) must not create a straggler task — under
    the salt (media_ref is unique per span, so repartition(media_ref)
    spreads the monster uniformly) the max partition holds a small
    multiple of the mean, and the monster's own spans land on every
    partition rather than one."""
    n_media = 10_000
    monster = {
        "doc_id": "doc-monster",
        "spans": (
            [{"kind": "text", "text": "intro", "media_ref": None, "offset": 0}]
            + [
                {
                    "kind": "media",
                    "text": None,
                    "media_ref": f"media://doc-monster/{i}",
                    "offset": i + 1,
                }
                for i in range(n_media)
            ]
        ),
    }
    normal = [
        {
            "doc_id": f"doc-n{i:03d}",
            "spans": [
                {
                    "kind": "media",
                    "text": None,
                    "media_ref": f"media://doc-n{i:03d}/{j}",
                    "offset": j,
                }
                for j in range(2)
            ],
        }
        for i in range(100)
    ]
    docs = spark.createDataFrame([monster] + normal, schema=schemas.DOCUMENTS)
    n_parts = 16
    media = (
        explode_spans(docs)
        .filter(F.col("kind") == "media")
        .select("doc_id", "media_ref")
        .repartition(n_parts, "media_ref")
    )
    per_part = (
        media.groupBy(F.spark_partition_id().alias("p"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("doc_id") == "doc-monster", 1).otherwise(0)).alias(
                "n_monster"
            ),
        )
        .collect()
    )
    sizes = sorted(r.n for r in per_part)
    mean = sum(sizes) / len(sizes)
    # per-task span counts bounded: max-partition-skew ratio under 1.5×
    assert max(sizes) <= 1.5 * mean, sizes
    # the monster doc itself is spread across (almost) all partitions
    spread = sum(1 for r in per_part if r.n_monster > 0)
    assert spread >= n_parts - 1, [r.n_monster for r in per_part]

    # control: the unsalted doc_id layout concentrates ~98% of all media
    # rows in the monster's single partition
    by_doc = (
        explode_spans(docs)
        .filter(F.col("kind") == "media")
        .repartition(n_parts, "doc_id")
    )
    doc_sizes = sorted(
        r.n
        for r in by_doc.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert max(doc_sizes) >= n_media
