"""CSS selector tests — mirrors utils_test.go:197-221 plus wider CSS3 coverage."""

import pathlib

import pytest

from xqspark.core.api import css_query
from xqspark.core.css import compile_css
from xqspark.core.htmltree import parse_html

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "html"
HTML = (FIXTURES / "formatted.html").read_bytes()


# -- reference test table (utils_test.go:206-211) --

def test_body_p():
    assert css_query(HTML, "body > p").strip("\n") == "text"

def test_script_src_attr():
    assert css_query(HTML, "script", attr="src").strip("\n") == "foo.js\nbar.js\nbaz.js"

def test_node_mode_p():
    assert css_query(HTML, "p", with_tags=True).strip("\n") == "<p>text</p>"

def test_node_mode_a():
    assert css_query(HTML, "a", with_tags=True).strip("\n") == '<a href="https://example.com">link</a>'


# -- implied structure --

def test_implied_body():
    assert css_query("<p>hello</p>", "body > p").strip("\n") == "hello"

def test_implied_head():
    out = css_query("<title>T</title><p>x</p>", "head > title").strip("\n")
    assert out == "T"


# -- wider selector coverage --

DOC = """<html><body>
<div id="main" class="box big">
  <ul>
    <li class="item">one</li>
    <li class="item sel">two</li>
    <li class="item">three</li>
  </ul>
  <p data-x="abc">para1</p>
  <p>para2</p>
  <span lang="en-US">hi</span>
</div>
<div class="box"><em>only</em></div>
</body></html>"""


def sel(selector, doc=DOC):
    root = parse_html(doc)
    return [n.inner_text() for n in compile_css(selector).select(root)]


def test_id_class():
    assert sel("#main .sel") == ["two"]
    assert sel("div.box.big ul li.item")[0] == "one"

def test_attr_selectors():
    assert sel('[data-x="abc"]') == ["para1"]
    assert sel("[data-x^=ab]") == ["para1"]
    assert sel("[data-x$=bc]") == ["para1"]
    assert sel("[data-x*=b]") == ["para1"]
    assert sel('[class~="sel"]') == ["two"]
    assert sel('[lang|="en"]') == ["hi"]

def test_combinators():
    assert sel("ul > li:first-child") == ["one"]
    assert sel("li + li") == ["two", "three"]
    assert sel("li.sel ~ li") == ["three"]

def test_pseudo_classes():
    assert sel("li:last-child") == ["three"]
    assert sel("li:nth-child(2)") == ["two"]
    assert sel("li:nth-child(odd)") == ["one", "three"]
    assert sel("li:nth-child(2n+1)") == ["one", "three"]
    assert sel("p:first-of-type") == ["para1"]
    assert sel("em:only-child") == ["only"]
    assert sel("li:not(.sel)") == ["one", "three"]

def test_group():
    assert sel("em, span") == ["only", "hi"] or sel("em, span") == ["hi", "only"]

def test_doc_order():
    # matches come back in document order regardless of group order
    assert sel("span, em") == ["hi", "only"]

def test_auto_close_li():
    doc = "<ul><li>a<li>b<li>c</ul>"
    assert sel("li", doc) == ["a", "b", "c"]

def test_auto_close_p():
    doc = "<p>one<p>two<div>three</div>"
    assert sel("p", doc) == ["one", "two"]


def test_cascadia_contains():
    doc = "<div><p>Hello World</p><p>other <b>hello</b></p></div>"
    assert sel("p:contains('hello')", doc) == ["Hello World", "other hello"]
    assert sel("p:containsOwn('other')", doc) == ["other hello"]
    assert sel("b:contains('HELLO')", doc) == ["hello"]


def test_attr_case_insensitive_flag():
    doc = '<a href="HTTP://X/">l</a>'
    assert sel('[href^="http" i]', doc) == ["l"]
    assert sel('[href^="http"]', doc) == []


def test_attr_s_flag_rejected_like_cascadia():
    # cascadia's parser only accepts the 'i' flag; 's' is a parse error
    # (ADVICE r1) — selectors that fail in the reference must fail here
    from xqspark.core.css import CssError
    for bad in ('[href^="http" s]', '[href^="http" S]'):
        with pytest.raises(CssError):
            compile_css(bad)


def test_selector_parity_sweep():
    doc = "<div><p>a</p><span>b</span><p>c</p><p>d</p></div>"
    cases = [
        ("p:nth-child(2n+1)", ["a", "c"]),
        ("p:nth-of-type(2)", ["c"]),
        ("p:last-of-type", ["d"]),
        ("P", ["a", "c", "d"]),         # type selectors are ASCII-folded
        ("p:NTH-CHILD(1)", ["a"]),
        ("span + p", ["c"]),
        ("span ~ p", ["c", "d"]),
        ("p:not(:first-child)", ["c", "d"]),
        ("p:nth-child(odd)", ["a", "c"]),
        ("p:nth-child(even)", ["d"]),
    ]
    for s, want in cases:
        assert sel(s, doc) == want, s
