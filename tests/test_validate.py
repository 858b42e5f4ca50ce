"""Input validation: duplicate/descending offsets detected and
repairable; repaired docs flow through extract deterministically."""

from openocr_spark import schemas
from openocr_spark.operators.extract import extract
from openocr_spark.operators.validate import offset_violations, repair_offsets


def _doc(doc_id, offsets):
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": "text", "text": f"span number {i} with words", "media_ref": None,
             "offset": o}
            for i, o in enumerate(offsets)
        ],
    }


def test_offset_violations_detects(spark):
    docs = spark.createDataFrame(
        [_doc("ok", [0, 5, 9]), _doc("dup", [0, 5, 5]), _doc("desc", [9, 5, 0])],
        schema=schemas.DOCUMENTS,
    )
    bad = {r["doc_id"] for r in offset_violations(docs).collect()}
    assert bad == {"dup", "desc"}


def test_repair_offsets_makes_extractable(spark):
    docs = spark.createDataFrame(
        [_doc("dup", [0, 5, 5]), _doc("desc", [9, 5, 0])], schema=schemas.DOCUMENTS
    )
    fixed = repair_offsets(docs)
    assert offset_violations(fixed).count() == 0
    out = {
        r["doc_id"]: [s["text"] for s in r["spans"]]
        for r in (x.asDict(recursive=True) for x in extract(fixed).collect())
    }
    # repaired order = original array position
    assert out["dup"] == [f"span number {i} with words" for i in range(3)]
    assert out["desc"] == [f"span number {i} with words" for i in range(3)]
