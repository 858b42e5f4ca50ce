"""F11 full markdown conversion: per-handler golden expectations pinned
against the reference semantics (to_markdown.py:71-448), plus Spark
assemble_markdown vs the single-node oracle over the layout fixture."""

from openocr_spark.functions import markdown as md


def test_handle_heading_levels():
    assert md.block_markdown("doc_title", "My\nTitle", 0) == "# My Title\n\n"
    assert md.block_markdown("paragraph_title", "Intro", 1) == "## Intro\n\n"
    # CJK headings join without the inserted space
    assert md.block_markdown("doc_title", "标\n题", 0) == "# 标题\n\n"


def test_handle_list_and_code():
    assert md.block_markdown("list", "  item one ", 3) == "- item one\n"
    assert md.block_markdown("code", "echo hi", 4) == "```bash\necho hi\n```\n\n"


def test_skip_labels_and_empty():
    for label in md.MD_SKIP_LABELS:
        assert md.block_markdown(label, "content", 0) == ""
    assert md.block_markdown("text", "", 0) == ""
    assert md.block_markdown("text", None, 0) == ""


def test_handle_text_rules():
    out = md.block_markdown("text", "a-<|sn|>b <|unk|>c ____ d .....", 0)
    assert out == "ab c ___ d ...\n\n"
    # inline formula delimiters rewritten; '$\bullet$' stays LITERAL —
    # the reference's replace key contains a backspace escape
    # (to_markdown.py:185), so real backslash-b text never matches
    out = md.block_markdown("text", "x \\(a+b\\) y $\\bullet$ z", 0)
    assert out == "x $a+b$ y $\\bullet$ z\n\n"
    # ...while the backspace form IS rewritten (bug-for-bug)
    out = md.block_markdown("text", "q $\x08ullet$ r", 0)
    assert out == "q • r\n\n"


def test_table_and_formula_rule_subsets():
    """to_markdown.py:304-308 (table) has no '-<|sn|>' rule;
    :347-350 (formula) has neither '-<|sn|>' nor the dot squeeze."""
    t = "<table><tr><td>foo-<|sn|>bar</td></tr></table>"
    out = md.block_markdown("table", t, 0)
    assert "foo-bar" in out and "foobar" not in out
    out = md.block_markdown("display_formula", "a ..... b", 0)
    assert "....." in out
    # text handler DOES squeeze dots and join '-<|sn|>'
    assert md.block_markdown("text", "a-<|sn|>b .....", 0) == "ab ...\n\n"


def test_handle_text_strips_stray_table_tags():
    out = md.block_markdown("text", "pre <table><tr><td>x</td></tr></table> post", 0)
    assert "<table>" not in out and "x" in out


def test_handle_figure_forms():
    assert (
        md.block_markdown("image", "figures/p1.png", 2)
        == "![Figure 2](../figures/p1.png)\n\n"
    )
    assert md.block_markdown("image", "![alt](x.png)", 2) == "![alt](x.png)\n\n"
    assert (
        md.block_markdown("seal", "data:image/png;base64,AAA", 1)
        == "![Figure 1](data:image/png;base64,AAA)\n\n"
    )
    assert (
        md.block_markdown("chart", "rawb64", 5)
        == "![Figure 5](data:image/png;base64,rawb64)\n\n"
    )


def test_handle_table_repair():
    t = '<table border=1><tr><tdcolspan="2">a\\(x\\)</td colspan="2"></tr></table>'
    out = md.block_markdown("table", t, 0)
    assert out.startswith("<table><tr><td colspan=")
    assert "</td>" in out and 'colspan="2">' not in out.split("</td>", 1)[1]
    assert "$x$" in out.replace("a$x$", "$x$")


def test_handle_formula():
    # trailing '\ ' is rstripped (to_markdown.py:362), leading space kept
    out = md.block_markdown("display_formula", "\\[ E=mc^2 \\]", 0)
    assert out == "$$ E=mc^2$$\n\n"
    # bm replacement + big-bracket fix
    out = md.block_markdown("display_formula", "\\bm{v} \\big{(}x\\big{)}", 0)
    assert "\\mathbf " in out and "\\big(" in out and "\\big{(}" not in out


def test_formula_multiline_continuation():
    out = md.block_markdown("display_formula", "a\nb", 0)
    assert "\\\\\n" in out


def test_tail_repeat_truncated():
    text = "start " + "xy" * 40
    out = md.block_markdown("text", text, 0)
    assert out == "start " + "xy" + "\n\n"


def test_doc_markdown_section_count_advances_through_skips():
    blocks = [
        ("header", "junk"),
        ("image", "rawb64"),
    ]
    out = md.doc_markdown(blocks)
    # header is skipped but still consumed index 0 -> figure is Figure 1
    assert out == "![Figure 1](data:image/png;base64,rawb64)\n\n"


def test_assemble_markdown_matches_oracle(spark):
    from openocr_spark.fixtures import LAYOUT_SCHEMA, gen_layout_blocks_pdf
    from openocr_spark.operators.doc_parse import doc_parse
    from openocr_spark.operators.layout import assemble_markdown
    from openocr_spark.oracle import doc_markdown_oracle

    pdf = gen_layout_blocks_pdf(10)
    blocks = spark.createDataFrame(pdf, schema=LAYOUT_SCHEMA)
    got = {
        r["doc_id"]: r["markdown"]
        for r in assemble_markdown(doc_parse(blocks)).collect()
    }
    want = doc_markdown_oracle(pdf)
    assert got == want
    # the full handler set actually fired: headings, formulas, tables
    alltext = "".join(got.values())
    assert "# " in alltext and "$$" in alltext and "<table>" in alltext
    assert "![Figure" in alltext
