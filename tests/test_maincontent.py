"""Main-content extraction (boilerplate strip, DOM text-density
heuristic): the pipeline-level operator the north rule names on top of
xq's extraction primitives."""

from xqspark.core.maincontent import main_text


NAV = '<div id="nav"><a href="/">Home</a> <a href="/x">About</a> <a href="/y">More</a></div>'
FOOT = '<div id="f"><a href="/p">Privacy</a> <a href="/t">Terms</a> (c)</div>'


def page(main_block):
    return f"<html><head><title>T</title></head><body>{NAV}{main_block}{FOOT}</body></html>"


def test_main_block_beats_nav_and_footer():
    body = "The quick brown fox jumps over the lazy dog again and again today."
    assert main_text(page(f'<div class="c"><p>{body}</p></div>')) == body


def test_tightest_wrapper_wins():
    # a wrapper div around the main div has the same score; the DEEPER
    # candidate (same text, later in document order) must win and the
    # output is identical either way
    body = "Plenty of plain prose content sits here for the densest block."
    out = main_text(page(f'<div id="outer"><div id="inner"><p>{body}</p></div></div>'))
    assert out == body


def test_link_dense_block_loses():
    links = "".join(f'<a href="/{i}">Category number {i} link text</a>' for i in range(8))
    body = "Short but genuine article prose, denser than any link farm."
    got = main_text(page(f'<div id="cats">{links}</div><div id="art"><p>{body}</p></div>'))
    assert got == body


def test_noise_subtrees_never_count():
    body = "Real content words live in this block of the test page."
    noisy = (f'<div id="m"><script>var x = "lots of script text here";</script>'
             f'<style>.c{{color:red}}</style><p>{body}</p>'
             f'<nav><a href="/1">One</a> deep nav text</nav></div>')
    assert main_text(page(noisy)) == body


def test_inline_markup_normalizes_to_spaced_words():
    got = main_text(page('<div><p>alpha <b>beta</b> gamma</p><p>delta</p></div>'))
    assert got == "alpha beta gamma delta"


def test_no_content_returns_empty():
    assert main_text("<html><body></body></html>") == ""
    assert main_text("") == ""
    # all-links page: every candidate scores negative
    assert main_text(page("")) == ""


def test_malformed_is_contained():
    # truncated/misnested input must not raise (falls back to the general
    # WHATWG builder underneath)
    assert isinstance(main_text(b"<div><b>x<table><td>y"), str)


def test_main_content_pipeline_mode():
    """main-content as an extract_pages mode: the full salted-repartition
    -> mapInPandas pipeline strips boilerplate per page."""
    from xqspark.pipeline import PAGES_SCHEMA, build_session, extract_pages

    spark = build_session(cpus=2, app="xq-maincontent")
    spark.sparkContext.setLogLevel("ERROR")
    rows = [
        (f"http://h{i}.example/p", None,
         page(f'<div id="m"><p>main body text for page number {i} with '
              f'plenty of words</p></div>').encode(), "", "en")
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    got = {r["url"]: r for r in extract_pages(df, mode="main-content").collect()}
    assert len(got) == 6
    for i in range(6):
        r = got[f"http://h{i}.example/p"]
        assert r["error"] is None
        assert r["extracted"] == (
            f"main body text for page number {i} with plenty of words"
        )
