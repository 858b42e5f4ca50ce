"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship extraction pipeline on sf0.001: flat driver
                 docs → interleaved spans → boilerplate strip + media
                 detect/recognize kernels → ordered span assembly.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data-pipeline ops); see openocr_spark/queries.py.
oracle_sql()   — DuckDB-equivalent SQL per query (omitted only for the
                 kernel-space extraction pipeline, which pytest instead
                 verifies span-for-span against the pandas oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_ROOT = os.path.dirname(os.path.abspath(__file__))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from openocr_spark.queries import ORACLE_Q, SPARK_Q, load  # noqa: E402


def _ship_package(spark: SparkSession) -> None:
    """Make openocr_spark importable on Python workers regardless of the
    driver's cwd (the --py-files mechanism)."""
    from openocr_spark.session import package_zip

    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added in this context


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    from openocr_spark.operators.extract import extract
    from openocr_spark.operators.ingest import interleave

    docs = interleave(load(spark, "/root/testdata/sf0.001", "documents"))
    return extract(docs, persist_spans=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in SPARK_Q.items()}


def oracle_sql() -> dict[str, str]:
    # the kernel-space queries' oracles read the single-node oracle's
    # outputs as parquet (fixture_oracle.py docstring explains why) —
    # materialize them for the driver's correctness SF before the SQL
    # can run; cached + idempotent (~20s cold)
    from openocr_spark import fixture_oracle

    try:
        fixture_oracle.ensure()
    except Exception as e:  # noqa: BLE001
        # report the root cause and WITHHOLD the file-backed oracle
        # entries — handing the driver SQL that reads parquet ensure()
        # failed to write would surface as an opaque DuckDB error; the
        # affected queries degrade to the rows-only check instead
        print(f"fixture_oracle.ensure() failed: {e!r}", file=sys.stderr)
        return {
            name: sql
            for name, sql in ORACLE_Q.items()
            if fixture_oracle.ORACLE_DIR not in sql
        }
    return dict(ORACLE_Q)
