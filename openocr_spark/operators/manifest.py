"""Per-partition checkpoint manifest — exact resume at 10^12-doc scale
(SURVEY §2.9 ST3; the distributed analog of the reference's
save_ckpt/load_ckpt epoch checkpoints, tools/engine/trainer.py:447-533).

Design:
  - work is split into `n_buckets` hash buckets of doc_id
    (pmod(xxhash64(doc_id), n)) — at Iceberg scale these are the table's
    bucket partitions, so pending-bucket selection prunes the scan;
  - each bucket is extracted and written to its own output subdirectory
    (overwrite-by-partition ⇒ idempotent under retries — a re-run of a
    half-written bucket replaces it, never duplicates);
  - a manifest row (status, timings, docs, spans, spans/sec, lineage) is
    appended only AFTER the bucket's output commits; resume = anti-join
    of all buckets against manifest rows with status='done';
  - the manifest itself is an append-only parquet table; replays are
    harmless (first 'done' wins).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openocr_spark.config import DEFAULT_CONFIG, ExtractConfig
from openocr_spark.operators.extract import extract


def bucket_of(doc_id_col, n_buckets: int):
    return F.pmod(F.xxhash64(doc_id_col), F.lit(n_buckets)).cast("int")


def read_manifest(spark: SparkSession, manifest_dir: str) -> DataFrame | None:
    try:
        return spark.read.parquet(manifest_dir)
    except Exception:
        return None


def pending_buckets(
    spark: SparkSession, manifest_dir: str, n_buckets: int
) -> list[int]:
    """Buckets with no status='done' manifest row (anti-join semantics;
    at this metadata scale a driver-side set difference)."""
    mf = read_manifest(spark, manifest_dir)
    if mf is None:
        return list(range(n_buckets))
    rows = (
        mf.filter(F.col("status") == "done")
        .select("partition_id", "lineage")
        .distinct()
        .collect()
    )
    # a 'done' bucket is only done under the SAME modulus: bucket b of
    # n_buckets=8 holds different docs than bucket b of n_buckets=16,
    # so resuming across a bucketing change would silently mix the two
    # partitionings (duplicate + missing docs). The modulus is recorded
    # in the lineage field; legacy rows without it are rejected too —
    # fail loud, never resume into an inconsistent output.
    for r in rows:
        marker = f"n_buckets={n_buckets}"
        if marker not in (r["lineage"] or ""):
            raise ValueError(
                f"manifest at hand was written under a different bucketing "
                f"({r['lineage']!r}); resume with the original n_buckets "
                f"or start a fresh manifest/output dir"
            )
    done = {int(r["partition_id"]) for r in rows}
    return [b for b in range(n_buckets) if b not in done]


def run_with_manifest(
    documents: DataFrame,
    out_dir: str,
    manifest_dir: str,
    n_buckets: int = 8,
    run_id: str = "run-0",
    media_payloads: DataFrame | None = None,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    max_buckets: int | None = None,
) -> list[int]:
    """Extract all pending buckets; returns the bucket ids processed.
    `max_buckets` stops early (used by the kill/resume test to simulate
    a dead driver). Output: parquet per bucket at
    {out_dir}/bucket={b}/, manifest rows appended at {manifest_dir}."""
    spark = documents.sparkSession
    todo = pending_buckets(spark, manifest_dir, n_buckets)
    if max_buckets is not None:
        todo = todo[:max_buckets]
    done: list[int] = []
    for b in todo:
        t0 = time.time()
        part = documents.filter(bucket_of(F.col("doc_id"), n_buckets) == b)
        result = extract(part, media_payloads, cfg)
        target = os.path.join(out_dir, f"bucket={b}")
        result.write.mode("overwrite").parquet(target)  # idempotent
        stats = (
            spark.read.parquet(target)
            .agg(
                F.count("*").alias("docs"),
                F.coalesce(F.sum(F.size("spans")), F.lit(0)).alias("spans"),
            )
            .collect()[0]
        )
        elapsed = max(time.time() - t0, 1e-9)
        lineage = (
            f"input={documents.schema.simpleString()[:64]} cfg=v{1} "
            f"n_buckets={n_buckets}"
        )
        row = spark.createDataFrame(
            [
                {
                    "partition_id": str(b),
                    "run_id": run_id,
                    "status": "done",
                    "started_at": None,
                    "finished_at": None,
                    "docs": int(stats["docs"]),
                    "spans": int(stats["spans"]),
                    "spans_per_sec": float(stats["spans"]) / elapsed,
                    "lineage": lineage,
                }
            ],
            schema=(
                "partition_id string, run_id string, status string, "
                "started_at timestamp, finished_at timestamp, docs long, "
                "spans long, spans_per_sec double, lineage string"
            ),
        ).withColumn("started_at", F.lit(None).cast("timestamp")).withColumn(
            "finished_at", F.current_timestamp()
        )
        row.write.mode("append").parquet(manifest_dir)
        done.append(b)
    return done


def read_extractions(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "bucket=*")
    )
