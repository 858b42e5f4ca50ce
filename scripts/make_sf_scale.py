#!/usr/bin/env python
"""Derive a 10x ("sf1") dataset from /root/testdata/sf0.1 for the
scale-up study (VERDICT r2 item 9) — deterministic, no external data.

Each replica k in 0..9 remaps keys so referential integrity holds and
the workload SHAPE scales the way a real 10x corpus would:
  orders/lineitem   o_orderkey/l_orderkey += k * 10^9,
                    o_custkey += k * 10^8
  customer          c_custkey += k * 10^8
  events            event_id += k * 10^9, user_id suffixed per replica
                    (10x distinct users/sessions, not 10x-long sessions)
  documents         doc_id suffixed; every TOKEN suffixed per replica so
                    replicas are DISTINCT documents (plain duplication
                    would make every doc a 10-way near-dup and blow the
                    LSH pair count up 45x — that benchmarks a different,
                    pathological workload, not a bigger corpus)
  embeddings        vec_id += k * 10^8; the vector is rotated by k
                    positions (keeps the distribution, breaks the
                    replica-to-replica cosine≈1 identity that would
                    explode near-dup pair counts)
  region/nation/supplier/part  unchanged — dimensions stay small at
                    scale by design (that is what makes them
                    broadcast-able at 100 TB)

Usage: python scripts/make_sf_scale.py [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from openocr_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/openocr_sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if os.path.exists(os.path.join(out, "_DONE")):
        print(out)
        return
    spark = get_spark("make-sf-scale", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    def rep_union(name, fn):
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = [fn(src, k) for k in range(reps)]
        dfu = parts[0]
        for p in parts[1:]:
            dfu = dfu.unionByName(p)
        dfu.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: x{reps}", file=sys.stderr)

    rep_union(
        "orders",
        lambda df, k: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(k * 10**9)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(k * 10**8)),
    )
    rep_union(
        "lineitem",
        lambda df, k: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * 10**9)
        ),
    )
    rep_union(
        "customer",
        lambda df, k: df.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(k * 10**8)
        ),
    )
    rep_union(
        "events",
        lambda df, k: df.withColumn(
            "event_id", F.col("event_id") + F.lit(k * 10**9)
        ).withColumn(
            "user_id", F.concat(F.col("user_id").cast("string"), F.lit(f"_r{k}"))
        ),
    )
    rep_union(
        "documents",
        lambda df, k: df.withColumn(
            "doc_id", F.concat(F.col("doc_id").cast("string"), F.lit(f"~r{k}"))
        ).withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit(f"r{k}") if k else F.lit("")),
                ),
                " ",
            ),
        ),
    )

    def rotate(vec, k):
        if k == 0:
            return vec
        n = F.size(vec)
        return F.concat(F.slice(vec, k + 1, 10**6), F.slice(vec, 1, k))

    rep_union(
        "embeddings",
        lambda df, k: df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(k * 10**8)
        ).withColumn("embedding", rotate(F.col("embedding"), k)),
    )
    for name in ("region", "nation", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{name}.parquet")
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write(f"replicas={reps} src={SRC}\n")
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
