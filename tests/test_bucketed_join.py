"""Evidence for the extract_joined scale claim (ARCHITECTURE /
sources/iceberg.py): when both sides of the payload equi-join are
bucketed on media_ref with matching specs, the join is
storage-partitioned — NO exchange of the heavy payload side. This is
the local-parquet (bucketBy + saveAsTable) stand-in for the Iceberg
bucket(1024, media_ref) spec."""

import pytest
from pyspark.sql import functions as F

from openocr_spark import plans


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.sql("DROP TABLE IF EXISTS media_side_b")
    spark.sql("DROP TABLE IF EXISTS payload_side_b")
    refs = spark.range(200).select(
        F.concat(F.lit("media://d/"), F.col("id")).alias("media_ref"),
        F.col("id").alias("offset"),
    )
    payloads = spark.range(200).select(
        F.concat(F.lit("media://d/"), F.col("id")).alias("media_ref"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    (
        refs.write.bucketBy(8, "media_ref").sortBy("media_ref")
        .mode("overwrite").saveAsTable("media_side_b")
    )
    (
        payloads.write.bucketBy(8, "media_ref").sortBy("media_ref")
        .mode("overwrite").saveAsTable("payload_side_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS media_side_b")
    spark.sql("DROP TABLE IF EXISTS payload_side_b")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_payload_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    joined = spark.table("media_side_b").join(
        spark.table("payload_side_b"), "media_ref"
    )
    plan = plans.physical_plan(joined)
    assert "SortMergeJoin" in plan, plan
    # matching bucket specs: the join consumes the storage partitioning —
    # zero shuffle exchanges anywhere in the plan
    assert plans.count_exchanges(joined) == 0, plan
    assert joined.count() == 200


def test_mismatched_buckets_do_shuffle(spark, bucketed_tables, no_broadcast):
    """Control: joining a bucketed side against an unbucketed one must
    insert an exchange — proving the zero-exchange plan above really
    comes from the bucket spec, not from the data size."""
    unbucketed = spark.range(200).select(
        F.concat(F.lit("media://d/"), F.col("id")).alias("media_ref"),
        F.lit("x").alias("extra"),
    )
    joined = spark.table("payload_side_b").join(unbucketed, "media_ref")
    assert plans.count_exchanges(joined) >= 1, plans.physical_plan(joined)
