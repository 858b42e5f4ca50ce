"""Structured Streaming jobs.

The reference's stream-shaped structures (SURVEY §2.9): the det→rec
producer/consumer queue (ST1, infer_e2e_parallel.py:27-122) becomes
micro-batched foreachBatch extraction — each micro-batch runs the exact
batch pipeline, so batch/stream parity is by construction; checkpointing
is Spark's offset log + our manifest table.

Also a watermarked event-time windowed aggregation (the streaming analog
of the throughput metrics A9) for late-data handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from openocr_spark import schemas
from openocr_spark.config import DEFAULT_CONFIG, ExtractConfig
from openocr_spark.operators.extract import extract


def read_documents_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream of interleaved documents (new parquet files in
    input_dir are micro-batches — the cloud-storage drop-folder pattern)."""
    return (
        spark.readStream.schema(schemas.DOCUMENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def extract_stream(
    docs_stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    available_now: bool = True,
) -> StreamingQuery:
    """Micro-batched extraction: foreachBatch runs the batch pipeline on
    each increment and appends parquet. Exactly-once via the streaming
    checkpoint (offset log) + idempotent batch writes."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = extract(batch_df, cfg=cfg)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            output_dir
        )

    writer = (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event-time stream
    (late rows beyond the watermark are dropped; state is bounded)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
