"""Façade + multi-suite eval harness tests."""

import pytest
from pyspark.sql import functions as F

from openocr_spark import schemas
from openocr_spark.api import OpenExtractor
from openocr_spark.fixtures import (
    LAYOUT_SCHEMA,
    gen_documents_pdf,
    gen_layout_blocks_pdf,
)
from openocr_spark.operators.eval_harness import (
    rec_suite_report,
    rec_suite_unweighted_avg,
)


def test_openextractor_tasks(spark):
    ox = OpenExtractor(spark)
    docs = spark.createDataFrame(
        gen_documents_pdf(8).to_dict("records"), schema=schemas.DOCUMENTS
    )
    assert ox.ocr(docs).count() == 8

    refs = spark.createDataFrame([("media://doc-00000000/0",)], ["media_ref"])
    detail = ox.det_rec_detail(refs)
    assert detail.count() > 0

    blocks = spark.createDataFrame(gen_layout_blocks_pdf(3), schema=LAYOUT_SCHEMA)
    assert ox.doc(blocks).count() == 3
    md = ox.doc_markdown(blocks).collect()
    assert len(md) == 3 and all(r["markdown"].startswith("# ") for r in md)


def test_rec_suite_report_rollup(spark):
    pairs = spark.createDataFrame(
        [
            ("iiit5k", "abc", "abc"),
            ("iiit5k", "abd", "abc"),
            ("svt", "x", "x"),
            ("svt", "y", "y"),
            ("svt", "z", "z"),
            ("cute80", "q", "p"),
        ],
        ["suite", "pred", "gt"],
    )
    rep = {r["suite"]: r for r in rec_suite_report(pairs).collect()}
    assert rep["iiit5k"]["acc"] == 0.5 and rep["iiit5k"]["n"] == 2
    assert rep["svt"]["acc"] == 1.0 and rep["svt"]["n"] == 3
    assert rep["cute80"]["acc"] == 0.0
    # weighted avg = (1 + 3 + 0) / 6
    assert rep["__all__"]["acc"] == pytest.approx(4 / 6, abs=1e-6)
    assert rep["__all__"]["n"] == 6
    # unweighted macro avg = (0.5 + 1.0 + 0.0) / 3
    macro = rec_suite_unweighted_avg(rec_suite_report(pairs)).collect()[0]
    assert macro["macro_acc"] == pytest.approx(0.5, abs=1e-6)
