"""Main-content extraction (operators/content.py)."""

import pytest

from pyproj_spark.operators.content import extract_main_content

LONG = ("The quick brown fox jumps over the lazy dog near the " * 3)
PAGE = (
    '<html><head><script>var x = "<p>fake content inside script</p>";'
    "</script><style>p { color: red }</style></head><body>"
    '<div><a href="/">home</a> <a href="/about">about us</a> '
    '<a href="/contact">contact page link text</a></div>'
    f"<p>{LONG}</p>"
    f'<p>{LONG} with an inline <a href="/x">small link</a> inside.</p>'
    "<p>Too short.</p>"
    f'<div><a href="/l">{LONG}</a></div>'
    "</body></html>")


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame([(1, PAGE)],
                               "doc_id long, html_text string")
    return extract_main_content(df).head()


def test_keeps_body_paragraphs_only(result):
    assert result.n_good == 2
    assert LONG.strip().split()[0] in result.content
    assert "home" not in result.content          # nav rejected
    assert "fake content" not in result.content  # script stripped
    assert "Too short" not in result.content     # below min_len
    # a LONG block that is one giant anchor: link density 1 -> out.
    # LONG repeats its sentence 3x; two kept paragraphs = 6 copies —
    # were the anchor-only div kept too, there would be 9
    assert result.content.count("The quick brown fox") == 6


def test_inline_link_tolerated(result):
    # second paragraph kept despite a small inline anchor
    assert "small link inside." in result.content


def test_empty_and_tagless(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "no tags at all " * 10)],
        "doc_id long, html_text string")
    rows = {r.doc_id: r for r in extract_main_content(df).collect()}
    assert rows[1].n_good == 0 and rows[1].content == ""
    assert rows[2].n_good == 1  # one long tagless block is content


def test_context_pass(spark):
    """jusText neighbor smoothing: a short quote between good
    paragraphs survives; short nav fragments do not."""
    page = (
        "<body>"
        '<div><a href="/">home</a> <a href="/b">all of these</a></div>'
        "<p>Tiny.</p>"          # short but neighbors are bad -> out
        f"<p>{LONG}</p>"
        "<p>A short quote.</p>"  # short, prev block good -> KEPT
        f"<p>{LONG}</p>"
        "<p>x</p>"               # below short_min -> out regardless
        "</body>")
    df = spark.createDataFrame([(1, page)],
                               "doc_id long, html_text string")
    plain = extract_main_content(df).head()
    ctx = extract_main_content(df, context=True).head()
    assert plain.n_good == 2
    assert ctx.n_good == 3
    assert "A short quote." in ctx.content
    assert "Tiny." not in ctx.content
    assert "home" not in ctx.content
