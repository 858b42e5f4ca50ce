"""system_results sink format test: `name\\tJSON` lines, spans in
reading order, stable under re-runs (golden regression format S9)."""

import glob
import json

from openocr_spark.operators.metrics import extract_detail
from openocr_spark.sources.sinks import system_results_lines, write_system_results


def test_write_extractions_json(spark, tmp_path):
    from openocr_spark import schemas
    from openocr_spark.fixtures import gen_documents_pdf
    from openocr_spark.operators.extract import extract
    from openocr_spark.sources.sinks import write_extractions_json

    docs = spark.createDataFrame(
        gen_documents_pdf(6).to_dict("records"), schema=schemas.DOCUMENTS
    )
    path = str(tmp_path / "json")
    write_extractions_json(extract(docs), path)
    lines = [
        json.loads(ln)
        for f in glob.glob(path + "/part-*")
        for ln in open(f).read().splitlines()
    ]
    assert len(lines) == 6
    assert all("doc_id" in d and "spans" in d for d in lines)


def test_system_results_format(spark, tmp_path):
    refs = spark.createDataFrame(
        [(f"media://doc-{i:08d}/0",) for i in range(6)], ["media_ref"]
    )
    detail = extract_detail(refs)
    path = str(tmp_path / "system_results")
    write_system_results(detail, path)
    files = glob.glob(path + "/part-*")
    assert len(files) == 1
    lines = open(files[0]).read().splitlines()
    assert len(lines) == 6
    names = []
    for ln in lines:
        name, payload = ln.split("\t", 1)
        names.append(name)
        arr = json.loads(payload)
        for item in arr:
            assert list(item.keys()) == ["transcription", "points", "score"]
            assert len(item["points"]) == 4 and len(item["points"][0]) == 2
    assert names == sorted(names)

    # reading order: region_idx ascending == payload order
    rows = system_results_lines(detail).collect()
    detail_rows = detail.collect()
    by_media = {}
    for r in detail_rows:
        by_media.setdefault(r["media_ref"], []).append(r)
    for r in rows:
        arr = json.loads(r["line"].split("\t", 1)[1])
        expect = sorted(by_media[r["media_ref"]], key=lambda x: x["region_idx"])
        assert [x["transcription"] for x in expect] == [
            x["transcription"] for x in arr
        ]
