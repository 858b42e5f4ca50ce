"""Input-parallelism guard for compute-heavy narrow stages.

A parquet file is splittable only at row-group boundaries: a table
written as one file with one row group yields exactly ONE scan
partition, and every narrow operator chained onto that scan — shingle
hashing, hyperplane dots, per-row md5 — runs on one core no matter how
wide the executor is (the "one huge unsplittable file" input-skew case,
optimization guide §2.5: fix at the source if you can; otherwise
repartition immediately after the read).

`spread()` is that repartition, made adaptive so it cannot hurt the
scale path: it round-robins to the default parallelism ONLY when the
input has fewer partitions, so a 100 TB scan (thousands of splits) and
any already-shuffled intermediate pass through untouched. Apply it to
the narrow side of compute-heavy operators, right after the scan
projection, BEFORE the expensive per-row expressions — the shuffle then
moves the raw (small) rows once and the expression work fans out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Return df with at least `min_parallelism` partitions (default:
    sparkContext.defaultParallelism). No-op when the input already has
    enough partitions. The partition count probe compiles the physical
    plan but launches no job — call this on scan-side projections, not
    on post-shuffle/AQE intermediates (where the count is not knowable
    without executing; those are already parallel anyway)."""
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism
    n = df.rdd.getNumPartitions()
    return df if n >= target else df.repartition(target)
