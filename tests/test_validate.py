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


def test_missing_payloads_audit(spark):
    """The joined-payload path drops media spans whose payload row is
    absent (inner join) — the audit must surface exactly those refs
    BEFORE extraction runs."""
    from openocr_spark.fixtures import documents_df, media_payloads_df
    from openocr_spark.operators.extract import extract
    from openocr_spark.operators.validate import missing_payloads
    from pyspark.sql import functions as F

    docs = documents_df(spark, 12)
    payloads = media_payloads_df(spark, docs)
    # full coverage -> empty audit
    assert missing_payloads(docs, payloads).count() == 0
    # drop one payload row -> the audit names it, and extraction over
    # the holey table loses exactly that span
    victim = payloads.select("media_ref").first()[0]
    holey = payloads.filter(F.col("media_ref") != victim)
    missing = missing_payloads(docs, holey).collect()
    assert [r["media_ref"] for r in missing] == [victim]
    n_full = extract(docs, payloads).select(
        F.sum(F.size("spans"))).first()[0]
    n_holey = extract(docs, holey).select(
        F.sum(F.size("spans"))).first()[0]
    assert n_full - n_holey == 1
