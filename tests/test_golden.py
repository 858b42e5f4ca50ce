"""Golden-file regression (FIXTURES F-E): the frozen files in
tests/golden/ pin the extraction semantics. Both the oracle (drift
guard) and the distributed pipeline must reproduce them exactly."""

import json
import os

import pytest

from tests.generate_golden import (
    GOLDEN_DIR,
    N_DOCS,
    golden_extractions,
    golden_media_refs,
    golden_system_results,
)


@pytest.fixture(scope="module")
def frozen_extractions():
    path = os.path.join(GOLDEN_DIR, "extractions.jsonl")
    return [json.loads(ln) for ln in open(path)]


def test_oracle_reproduces_golden(frozen_extractions):
    assert golden_extractions() == frozen_extractions


def test_oracle_reproduces_golden_system_results():
    frozen = open(os.path.join(GOLDEN_DIR, "system_results.txt")).read().splitlines()
    assert golden_system_results() == frozen


def test_spark_extractions_match_golden(spark, frozen_extractions):
    from openocr_spark import schemas
    from openocr_spark.fixtures import gen_documents_pdf
    from openocr_spark.operators.extract import extract

    docs = spark.createDataFrame(
        gen_documents_pdf(N_DOCS).to_dict("records"), schema=schemas.DOCUMENTS
    )
    got = {
        r["doc_id"]: [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"],
             "order": s["order"]}
            for s in r["spans"]
        ]
        for r in (x.asDict(recursive=True) for x in extract(docs).collect())
    }
    want = {r["doc_id"]: r["spans"] for r in frozen_extractions}
    assert got == want


def test_spark_system_results_match_golden(spark, tmp_path):
    import glob

    from openocr_spark.operators.metrics import extract_detail
    from openocr_spark.sources.sinks import write_system_results

    refs = spark.createDataFrame([(r,) for r in golden_media_refs()], ["media_ref"])
    path = str(tmp_path / "sys")
    # pass the refs universe: media with zero detections must still get
    # a `name\t[]` line, like the reference's per-image result rows
    write_system_results(extract_detail(refs), path, media_refs=refs)
    got = open(glob.glob(path + "/part-*")[0]).read().splitlines()
    frozen = open(os.path.join(GOLDEN_DIR, "system_results.txt")).read().splitlines()
    # JSON number formatting may differ (0.0 vs 0); compare parsed
    def parse(lines):
        return [
            (ln.split("\t")[0], json.loads(ln.split("\t", 1)[1])) for ln in lines
        ]

    assert parse(got) == parse(frozen)
