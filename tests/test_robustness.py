"""Adversarial / Common-Crawl-realism tests (FIXTURES.md §4) + idempotence."""

import pathlib

import pytest

from xqspark.core.api import beautify, css_query, xpath_query
from xqspark.core.fmt_html import format_html
from xqspark.core.fmt_xml import format_xml
from xqspark.core.xmltok import XmlSyntaxError

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


# -- malformed inputs: error or lenient output, never a crash --

def test_unknown_entity_becomes_cdata():
    # quirk Q1: unknown entities pass through and force CDATA wrapping
    out = format_xml("<a>x&nbsp;y</a>")
    assert out == "<a><![CDATA[x&nbsp;y]]></a>\n"


def test_bare_ampersand_kept():
    out = format_xml("<a><![CDATA[Ding&Dong=]]></a>")
    assert out == "<a><![CDATA[Ding&Dong=]]></a>\n"


def test_mismatched_close_repaired():
    # Go non-strict: invents the end tag for the open element
    out = format_xml("<a><b>x</a>")
    assert out == "<a>\n  <b>x</b>\n</a>\n"


def test_stray_close_errors():
    with pytest.raises(XmlSyntaxError):
        format_xml("</a>")


def test_truncated_errors():
    with pytest.raises(XmlSyntaxError):
        format_xml("<a><b>truncated")


def test_unquoted_attr_lenient():
    assert format_xml("<a x=1/>") == '<a x="1"/>\n'


def test_valueless_attr_lenient():
    assert format_xml("<a checked/>") == '<a checked="checked"/>\n'


def test_html_never_errors_on_soup():
    soup = "<div><p>unclosed <li>stray</ul></div><b>tail"
    out = format_html(soup)
    assert out.endswith("\n")
    assert css_query(soup, "p") != ""


def test_html_raw_text_reescaped():
    # script content is raw at tokenizer level (no entity decode) but
    # FormatHtml re-escapes all text via escapeText (utils.go:364-366)
    out = format_html("<script>if (a && b < c) { x(); }</script>")
    assert "if (a &amp;&amp; b &lt; c) { x(); }" in out


def test_huge_page_bounded():
    big = ("<item a=\"1\">text</item>" * 20000).join(["<doc>", "</doc>"])
    out = format_xml(big)
    assert out.count("<item") == 20000


def test_empty_and_whitespace():
    assert format_xml("") == "\n"
    assert format_html("") == "\n"


def test_windows1251_transcode():
    data = (FIXTURES / "xml" / "unformatted3.xml").read_bytes()
    out = format_xml(data)
    assert "Решение" in out  # transcoded to UTF-8
    assert 'encoding="windows-1251"' in out  # decl preserved verbatim


def test_utf16_alias():
    data = '<?xml version="1.0" encoding="utf-16"?><a>x</a>'.encode("utf-8")
    assert format_xml(data) == '<?xml version="1.0" encoding="utf-16"?>\n<a>x</a>\n'


def test_undeclared_binary_passthrough():
    raw = b"<a>\xff\xfe</a>"
    out = format_xml(raw)
    assert out.startswith("<a>")


def test_xpath_error_contained():
    with pytest.raises(Exception):
        xpath_query("<a/>", "//[bad")


# -- idempotence: formatted output re-formats to itself --
#
# The reference formatter itself is NOT idempotent in three situations,
# and we match it faithfully: (a) multi-line comments re-indent on each
# pass (the per-line indent is additive, utils.go:157-165); (b) text
# followed by a child element re-wraps (normalizeSpaces sees the
# already-inserted newline); (c) a windows-1251 declaration on already
# UTF-8 output re-transcodes. Those fixtures are excluded.

_NON_IDEMPOTENT_XML = {"formatted3.xml", "formatted7.xml", "formatted13.xml"}
_NON_IDEMPOTENT_HTML = {"formatted3.html", "formatted4.html"}

XML_GOLDENS = [
    p for p in sorted((FIXTURES / "xml").glob("formatted*.xml"))
    if p.name not in _NON_IDEMPOTENT_XML
]
HTML_GOLDENS = [
    p for p in sorted((FIXTURES / "html").glob("formatted*.html"))
    if p.name not in _NON_IDEMPOTENT_HTML
]


@pytest.mark.parametrize("path", XML_GOLDENS, ids=lambda p: p.name)
def test_xml_idempotent(path):
    golden = path.read_bytes()
    assert format_xml(golden) == golden.decode("utf-8")


@pytest.mark.parametrize("path", HTML_GOLDENS, ids=lambda p: p.name)
def test_html_idempotent(path):
    golden = path.read_bytes()
    assert format_html(golden) == golden.decode("utf-8")


def test_beautify_json_detection():
    assert beautify(b'  {"a": 1}') == '{\n  "a": 1\n}\n'


# -- entity decoding edges (WHATWG, x/net/html escape.go semantics) --

def test_html_entity_longest_match():
    from xqspark.core.entities import unescape
    assert unescape("&notit;") == "¬it;"       # longest prefix wins
    assert unescape("&notin;") == "∉"
    assert unescape("&amp=1") == "&=1"          # no-semicolon form in text
    assert unescape("&amp=1", in_attr=True) == "&amp=1"  # attr-mode exception
    assert unescape("&copy 2024") == "© 2024"
    assert unescape("&copyx", in_attr=True) == "&copyx"
    assert unescape("&#65;&#x42;") == "AB"
    assert unescape("&#128;") == "€"            # windows-1252 remap
    assert unescape("&#xD800;") == "�"          # surrogate -> replacement
    assert unescape("&bogusentity;") == "&bogusentity;"


def test_charset_latin1():
    data = '<?xml version="1.0" encoding="iso-8859-1"?><a>caf\xe9</a>'.encode("latin-1")
    from xqspark.core.fmt_xml import format_xml
    assert "café" in format_xml(data)


def test_charset_unknown_is_error():
    from xqspark.core.charset import CharsetError, decode_payload
    import pytest as _pytest
    with _pytest.raises(CharsetError):
        decode_payload(b'<?xml version="1.0" encoding="no-such-charset"?><a/>')


def test_xml_numeric_entities():
    assert format_xml("<a>&#65;&#x42;</a>") == "<a>AB</a>\n"
    # malformed numeric refs stay raw (-> CDATA since they contain &)
    assert format_xml("<a>&#xZZ;</a>") == "<a><![CDATA[&#xZZ;]]></a>\n"


# -- regressions from the round-1 code review --

def test_trailing_spaces_then_newline_preserved():
    # Go regexp `\n +$` anchors at true end-of-text; '\n   \n' must NOT match
    assert format_xml("<a>text\n   \n</a>") == "<a>text\n   \n</a>\n"


def test_abrupt_closing_html_comments():
    # <!--> and <!---> are empty comments, not swallow-the-document
    # (level-0 comments print with a trailing newline, utils.go:438-440)
    assert format_html("<!-->after") == "<!-->\nafter\n"
    out = format_html("<!--->x<p>y</p>")
    assert "<p>y</p>" in out


def test_cdata_end_in_chardata_errors():
    # unconditional in Go, even non-strict (encoding/xml text())
    with pytest.raises(XmlSyntaxError):
        format_xml("<a>x]]>y</a>")


def test_illegal_control_char_errors():
    with pytest.raises(XmlSyntaxError):
        format_xml("<a>x\x00y</a>")
    with pytest.raises(XmlSyntaxError):
        format_xml('<a b="x\x01y"/>')


def test_nodeset_vs_boolean_compare():
    # XPath 1.0 §3.4: boolean(empty-node-set) = false() -> true
    assert xpath_query("<a/>", "//missing = false()").strip() == "true"
    assert xpath_query("<a/>", "//missing != true()").strip() == "true"
    assert xpath_query("<a><b/></a>", "//b = true()").strip() == "true"


def test_reverse_with_predicate():
    doc = "<r><a>1</a><a>2</a><a>3</a></r>"
    out = xpath_query(doc, "string-join(reverse(//a)[1], '')")
    assert out.strip() == "3"


def test_long_numeric_entity_consumed():
    from xqspark.core.entities import unescape
    assert unescape("&#999999999;") == "�"
    assert unescape("&#99999999999999999999;") == "�"


@pytest.mark.parametrize("enc,codec,text", [
    ("shift_jis", "shift_jis", "日本語"),
    ("gb2312", "gb2312", "中文"),
    ("koi8-r", "koi8_r", "текст"),
    ("iso-8859-2", "iso8859-2", "žluťoučký"),
])
def test_charset_matrix(enc, codec, text):
    payload = f'<?xml version="1.0" encoding="{enc}"?><a>{text}</a>'.encode(codec)
    out = format_xml(payload)
    assert text in out
    assert f'encoding="{enc}"' in out


# -- fifth review-batch regressions (tokenizer fidelity) --

def test_entity_escaped_cr_survives():
    # Go rewrites RAW \r only; &#13;/&#xD; expansions stay literal CR
    assert format_xml("<a>x&#13;y</a>") == "<a>x\ry</a>\n"
    assert format_xml('<a b="x&#13;y"/>') == '<a b="x&#xD;y"/>\n'


def test_unicode_digit_charref_contained():
    # non-ASCII digits are not entity digits; raw text kept, no crash
    assert format_xml("<a>x&#٣;y</a>") == "<a><![CDATA[x&#٣;y]]></a>\n"


def test_ns_mismatched_close_errors():
    # Go popElement: Space mismatch errors even in non-strict mode
    with pytest.raises(XmlSyntaxError):
        format_xml('<x:a xmlns:x="u"></a>')


def test_script_double_escape_state():
    from xqspark.core.htmltok import HtmlTokenizer, HText
    doc = "<script><!--<script>x('</script>')</script>--></script>"
    toks = list(HtmlTokenizer(doc).tokens())
    raw = next(t for t in toks if isinstance(t, HText))
    # the inner </script> inside the double-escaped block stays text
    assert "x('</script>')" in raw.text


def test_self_closing_script_still_raw():
    from xqspark.core.htmltok import HtmlTokenizer, HText
    toks = list(HtmlTokenizer("<script/>var a = '<b>';</script>").tokens())
    raw = next(t for t in toks if isinstance(t, HText))
    assert "<b>" in raw.text  # not parsed as a tag


def test_end_tag_with_quoted_gt():
    from xqspark.core.htmltok import HEndTag, HtmlTokenizer
    toks = list(HtmlTokenizer('<div></div a=">">tail').tokens())
    assert any(isinstance(t, HEndTag) and t.name == "div" for t in toks)


def test_comment_bang_terminator_data():
    from xqspark.core.htmltok import HComment, HtmlTokenizer
    toks = list(HtmlTokenizer("<!--a---!>rest").tokens())
    assert isinstance(toks[0], HComment) and toks[0].data == "a-"


def test_entity_output_bypasses_validation():
    """Go's illegal-char and ]]> checks run on RAW input bytes only;
    entity expansions bypass them (&#8; decodes to a literal \\x08)."""
    assert format_xml("<a>x&#8;&amp;y</a>") == "<a><![CDATA[x\x08&y]]></a>\n"


def test_cdata_end_in_quoted_attr_allowed():
    """The ]]> prohibition is content-only (XML spec + Go's quote<0 gate);
    attribute values may contain it."""
    assert format_xml('<a b="]]>"/>') == '<a b="]]&gt;"/>\n'


def test_bare_lt_in_text_single_token():
    # x/net/html keeps a bare '<' inside ONE text token; splitting let
    # normalize_spaces strip the interior space
    from xqspark.core.fmt_html import format_html
    assert format_html("<p>a < b</p>") == "<p>a &lt; b</p>\n"


def test_eof_abutting_raw_close_stays_in_text():
    # readRawEndTag returns false at EOF: '</script' is raw text
    from xqspark.core.htmltok import HtmlTokenizer
    toks = list(HtmlTokenizer("<script>x</script").tokens())
    assert toks[-1].text == "x</script"


def test_trailing_ampersand_is_unexpected_eof():
    # Go reads entity bytes with mustgetc: EOF inside '&...' errors even
    # in non-strict mode
    import pytest as _p
    from xqspark.core.xmltok import GoXmlTokenizer, XmlSyntaxError
    for doc in ("<a>x</a>&", "<a>&am</a>"[:7], "<a>&#12"):
        with _p.raises(XmlSyntaxError):
            list(GoXmlTokenizer(doc).tokens())


def test_directive_first_byte_is_raw():
    # Go writes the first byte after '<!' to the buffer before scanning,
    # so '<!>' and quote-initial directives keep scanning to EOF -> error
    import pytest as _p
    from xqspark.core.xmltok import GoXmlTokenizer, XmlSyntaxError
    for doc in ("<!>", "<!'a'>"):
        with _p.raises(XmlSyntaxError):
            list(GoXmlTokenizer(doc).tokens())
    toks = list(GoXmlTokenizer("<!d>").tokens())
    assert toks[0].text == "d"


def test_bogus_comment_from_pi_keeps_question_mark():
    # WHATWG bogus-comment entry from '<?' reconsumes the '?'
    from xqspark.core.htmltok import HtmlTokenizer
    tok = list(HtmlTokenizer("<?xml version='1.0'?>").tokens())[0]
    assert tok.data == "?xml version='1.0'?"
    assert tok.raw == "<?xml version='1.0'?>"  # raw span unchanged


def test_truncated_comment_trims_dash_dash_bang():
    from xqspark.core.htmltok import HtmlTokenizer
    assert list(HtmlTokenizer("<!--abc--!").tokens())[0].data == "abc"


def test_raw_text_nul_becomes_replacement():
    from xqspark.core.htmltok import HtmlTokenizer
    toks = list(HtmlTokenizer("<script>a\x00b</script>").tokens())
    assert toks[1].text == "a�b"
    # non-raw body text drops NULs at tree construction (inBodyIM)
    from xqspark.core.htmltree import parse_html
    doc = parse_html("<p>a\x00b</p>")
    p = [n for n in doc.iter_descendants() if n.data == "p"][0]
    assert p.inner_text() == "ab"


def test_json_depth_limit_matches_go():
    import pytest as _p
    from xqspark.core.fmt_json import JsonSyntaxError, format_json
    assert format_json("[" * 2000 + "1" + "]" * 2000, "").startswith("[")
    with _p.raises(JsonSyntaxError, match="exceeded max depth"):
        format_json("[" * 10001 + "1" + "]" * 10001, "")
