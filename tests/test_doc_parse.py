"""End-to-end doc-parse (OpenDoc flow, SURVEY §3.2): Spark pipeline vs
the independent oracle over the deterministic layout fixture."""

import pytest

from openocr_spark.fixtures import LAYOUT_SCHEMA, gen_layout_blocks_pdf
from openocr_spark.operators.doc_parse import doc_parse, doc_spans
from openocr_spark.oracle import doc_parse_oracle

N_DOCS = 12


@pytest.fixture(scope="module")
def blocks_pdf():
    return gen_layout_blocks_pdf(N_DOCS)


def test_doc_parse_matches_oracle(spark, blocks_pdf):
    blocks = spark.createDataFrame(blocks_pdf, schema=LAYOUT_SCHEMA)
    got_rows = doc_spans(doc_parse(blocks)).collect()
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["block_id"], s["order"]) for s in r["spans"]
        ]
        for r in (x.asDict(recursive=True) for x in got_rows)
    }
    want_raw = doc_parse_oracle(blocks_pdf)
    want = {
        d: [(s["kind"], s["text"], s["block_id"], s["order"]) for s in spans]
        for d, spans in want_raw.items()
    }
    assert got == want


def test_doc_parse_contents(spark, blocks_pdf):
    blocks = spark.createDataFrame(blocks_pdf, schema=LAYOUT_SCHEMA)
    parsed = {
        (r["doc_id"], r["block_id"]): r for r in doc_parse(blocks).collect()
    }
    # tables decoded to HTML, formulas space-padded-$-wrapped
    # (infer_doc_onnx.py:955-958), boilerplate still present pre-assembly,
    # image-kind rows unrecognized with EMPTY text
    # (recognition_results, infer_doc_onnx.py:988-1007)
    tables = [r for r in parsed.values() if r["label"] == "table"]
    assert tables and all(r["text"].startswith("<table>") for r in tables)
    formulas = [r for r in parsed.values() if r["label"] == "display_formula"]
    assert formulas and all(
        r["text"].startswith(" $ ") and r["text"].endswith(" $ ")
        for r in formulas
    )
    # formula_number is formula-routed on the onnx path (the suffix
    # defeats the exclusion, infer_doc_onnx.py:915) and keeps its $
    # (the == 'formula_number' strip never fires on suffixed labels)
    fnums = [r for r in parsed.values() if r["label"] == "formula_number"]
    assert fnums and all(
        r["task"] == "formula_rec" and " $ " in r["text"] for r in fnums
    )
    # chart OCR-routes (the equality check never matches a suffixed label)
    charts = [r for r in parsed.values() if r["label"] == "chart"]
    assert charts and all(r["task"] == "ocr" for r in charts)
    for kind in ("image", "seal", "header_image", "footer_image"):
        rows = [r for r in parsed.values() if r["label"] == kind]
        assert rows, kind
        for r in rows:
            assert r["text"] == "" and r["task"] is None
    # the reference label never reaches parsed output (utils.py:140-144)
    assert not any(r["label"] == "reference" for r in parsed.values())
    assert any(r["label"] == "reference_content" for r in parsed.values())
    # dedup actually dropped the crafted duplicate in at least one doc
    n_text = sum(1 for r in parsed.values() if r["label"] == "text")
    n_text_in = (blocks_pdf["label"] == "text").sum()
    assert n_text < n_text_in
    # global numbering: block ids are label_{global idx}
    any_doc = next(iter({k[0] for k in parsed}))
    doc_rows = sorted(
        (r for (d, _), r in parsed.items() if d == any_doc),
        key=lambda r: r["reading_order"],
    )
    for i, r in enumerate(doc_rows, start=1):
        assert r["block_id"] == f"{r['label']}_{i:02d}"


def test_figure_in_table_untokenized(spark, blocks_pdf):
    """J5 wiring: tables with contained ≥25px figures embed the
    reference's <img src> replacement (tokenize → recognize →
    untokenize, utils.py:478-555); no [Fn] placeholder survives."""
    blocks = spark.createDataFrame(blocks_pdf, schema=LAYOUT_SCHEMA)
    tables = [
        r["text"] for r in doc_parse(blocks).collect() if r["label"] == "table"
    ]
    assert any('<img src="imgs/img_in_image_box_' in t for t in tables)
    import re

    assert all(not re.search(r"\[F\d+\]", t) for t in tables)


def test_ocr_blocks_use_ar_decode(spark, blocks_pdf):
    """W6: ocr-routed block text comes from the greedy AR decode loop."""
    from openocr_spark.kernels.ar_decode import ar_decode_text

    blocks = spark.createDataFrame(blocks_pdf, schema=LAYOUT_SCHEMA)
    rows = [
        r for r in doc_parse(blocks).collect()
        if r["task"] == "ocr" and r["label"] == "text"
    ]
    assert rows
    from openocr_spark.functions.text import truncate_repetitive_content

    for r in rows[:5]:
        want = truncate_repetitive_content(
            ar_decode_text(f"{r['doc_id']}/{r['block_id']}")
        )
        assert r["text"] == want
