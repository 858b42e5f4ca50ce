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
    # tables decoded to HTML, formulas $-wrapped, boilerplate still present
    # pre-assembly, images unrecognized
    tables = [r for r in parsed.values() if r["label"] == "table"]
    assert tables and all(r["text"].startswith("<table>") for r in tables)
    formulas = [r for r in parsed.values() if r["label"] == "display_formula"]
    assert formulas and all(
        r["text"].startswith("$") and r["text"].endswith("$") for r in formulas
    )
    images = [r for r in parsed.values() if r["label"] == "image"]
    for r in images:
        assert r["text"] is None and r["task"] is None
    # dedup actually dropped the crafted duplicate in at least one doc
    n_text = sum(1 for r in parsed.values() if r["label"] == "text")
    n_text_in = (blocks_pdf["label"] == "text").sum()
    assert n_text < n_text_in


def test_figure_in_table_untokenized(spark, blocks_pdf):
    """J5 wiring: tables with contained figures embed the figure's
    markdown image ref (tokenize → recognize → untokenize,
    utils.py:478-556); no placeholder token survives."""
    blocks = spark.createDataFrame(blocks_pdf, schema=LAYOUT_SCHEMA)
    tables = [
        r["text"] for r in doc_parse(blocks).collect() if r["label"] == "table"
    ]
    assert any("![Figure 0](figures/" in t for t in tables)
    assert all("<figure_" not in t for t in tables)


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
