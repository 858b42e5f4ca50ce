#!/usr/bin/env python
"""spark-submit entrypoint for the extraction pipeline.

Deployment (north rule):
    python -c "from openocr_spark.session import package_zip; print(package_zip())"
    spark-submit --py-files /tmp/openocr_spark_pyfiles.zip \\
        scripts/run_extract.py \\
        --input  <documents table path>   (or --synthetic N) \\
        --output <extractions path> \\
        --manifest <manifest path> --buckets 64

Runs through the per-bucket manifest (operators/manifest.py): re-running
the same command resumes — only pending buckets execute.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents table path (parquet/iceberg)")
    ap.add_argument("--synthetic", type=int, help="generate N synthetic docs instead")
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--run-id", default="run-0")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("openocr-spark-extract").getOrCreate()
    # --py-files ships the zip to WORKERS but (Spark 4) not onto the
    # driver's sys.path — add it explicitly; fall back to the repo root
    # when running from a checkout
    import os

    for p in spark.sparkContext.getConf().get("spark.submit.pyFiles", "").split(","):
        if p and os.path.exists(p) and p not in sys.path:
            sys.path.insert(0, p)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.isdir(os.path.join(repo_root, "openocr_spark")):
        sys.path.insert(0, repo_root)
    try:
        from openocr_spark.session import package_zip

        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass

    from openocr_spark.fixtures import documents_df
    from openocr_spark.operators.manifest import read_extractions, run_with_manifest

    if args.synthetic:
        docs = documents_df(spark, args.synthetic)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic required")

    t0 = time.time()
    done = run_with_manifest(
        docs, args.output, args.manifest, n_buckets=args.buckets, run_id=args.run_id
    )
    out = read_extractions(spark, args.output)
    n_docs = out.count()
    print(
        json.dumps(
            {
                "buckets_processed": done,
                "docs_total": n_docs,
                "elapsed_sec": round(time.time() - t0, 2),
            }
        ),
        file=sys.stdout,
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
