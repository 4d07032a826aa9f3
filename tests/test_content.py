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


def test_site_template_host_scoped_threshold(spark):
    """A line in ALL of host A's docs strips from A but the SAME line
    in only 1 of host B's 4 docs survives on B; exactly-50% lines are
    kept (strict > threshold)."""
    from pyproj_spark.operators.content import site_template_clean
    rows = []
    for d in range(4):  # host A: chrome in all, half in 2 of 4
        half = "half line\n" if d < 2 else ""
        rows.append((d, "A", f"unique a{d}\nchrome line\n{half}tail a{d}"))
    for d in range(4):  # host B: chrome line only in doc 0
        chrome = "chrome line\n" if d == 0 else ""
        rows.append((10 + d, "B", f"unique b{d}\n{chrome}tail b{d}"))
    df = spark.createDataFrame(rows, ["doc_id", "host", "text"])
    got = (site_template_clean(df).toPandas()
           .set_index("doc_id").sort_index())
    # host A: only 'chrome line' (4/4) removed; 'half line' (2/4 = 50%)
    # is NOT strictly above the 0.5 threshold
    assert (got.loc[got["host"] == "A", "n_removed"] == 1).all()
    # host B keeps everything, including the doc-0 chrome line
    assert (got.loc[got["host"] == "B", "n_removed"] == 0).all()
