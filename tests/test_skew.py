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
