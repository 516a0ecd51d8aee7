"""Reference-parity corners: indent variants, scalar printing, JSON quoting,
xml2json coalescing — each pinned to cited reference behavior."""

import pytest

from xqspark.core.api import beautify, css_query, to_json, xpath_query
from xqspark.core.fmt_json import format_json, format_value
from xqspark.core.fmt_xml import format_xml
from xqspark.core.fmt_html import format_html
from xqspark.core.textutil import go_quote
from xqspark.core.dom import parse_dom
from xqspark.core.xml2json import node_to_json


# -- indent variants (cmd/root.go:179-202) --

def test_indent_zero_xml():
    # indent "" -> newline "" (utils.go:56-59): single line + trailing \n
    assert format_xml("<a><b>x</b></a>", "") == "<a><b>x</b></a>\n"

def test_indent_zero_html():
    assert format_html("<p><b>x</b></p>", "") == "<p><b>x</b></p>\n"

def test_indent_zero_json():
    assert format_json('{"a": [1, 2]}', "") == '{"a": [1,2]}\n'

def test_tab_indent():
    assert format_xml("<a><b>x</b></a>", "\t") == "<a>\n\t<b>x</b>\n</a>\n"

def test_indent_4():
    assert format_xml("<a><b>x</b></a>", "    ") == "<a>\n    <b>x</b>\n</a>\n"


# -- XPath scalar printing (utils.go:246-263) --

def test_number_result_rounding():
    # %.0f: round-half-even (Go fmt)
    assert xpath_query("<a/>", "2.5") == "2\n"
    assert xpath_query("<a/>", "3.5") == "4\n"
    assert xpath_query("<a/>", "1 div 0") == "+Inf\n"

def test_string_result_trimmed():
    assert xpath_query("<a>  pad  </a>", "string(/a)") == "pad\n"

def test_nodeset_one_line_per_node():
    out = xpath_query("<a><b> x </b><b>y</b></a>", "//b")
    assert out == "x\ny\n"

def test_extract_no_match_empty():
    assert xpath_query("<a/>", "//missing", single_node=True) == ""

def test_node_mode_multi():
    out = xpath_query("<a><b>1</b><b>2</b></a>", "//b", with_tags=True)
    assert out == "<b>1</b>\n<b>2</b>\n"

def test_node_mode_nested_reformat():
    out = xpath_query("<a><b><c>x</c></b></a>", "//b", with_tags=True)
    assert out == "<b>\n  <c>x</c>\n</b>\n"


# -- CSS modes (utils.go:283-315) --

def test_css_attr_missing_default_empty():
    out = css_query("<p><a>x</a></p>", "a", attr="href")
    assert out == "\n"  # AttrOr default "" + newline

def test_css_node_mode_nested():
    out = css_query("<div><ul><li>a</li></ul></div>", "ul", with_tags=True)
    assert out == "<ul>\n  <li>a</li>\n</ul>\n"

def test_css_text_concatenation():
    # Selection.Text(): all descendant text, trimmed once
    out = css_query("<div> x <b>y</b> z </div>", "div")
    assert out == "x y z\n"


# -- Go strconv.Quote (utils.go:505,570) --

@pytest.mark.parametrize("raw,quoted", [
    ("plain", '"plain"'),
    ('say "hi"', '"say \\"hi\\""'),
    ("tab\there", '"tab\\there"'),
    ("bell\x07", '"bell\\a"'),
    ("nul\x00", '"nul\\x00"'),
    ("emoji 😀", '"emoji 😀"'),       # printable unicode raw
    ("soft\xadhyphen", '"soft\\u00adhyphen"'),  # Cf category escaped
    ("line sep", '"line\\u2028sep"'),
])
def test_go_quote(raw, quoted):
    assert go_quote(raw) == quoted


def test_go_quote_fast_path_differential():
    """go_quote's plain-ASCII regex fast path must agree with the
    per-char Go-category loop on random unicode (r4 perf fix — the loop
    was 81% of xml2json time on plain corpus text)."""
    import random

    from xqspark.core import textutil as t

    def slow(s):
        out = ['"']
        for ch in s:
            esc = t._QUOTE_ESCAPES.get(ch)
            if esc is not None:
                out.append(esc)
                continue
            if t._go_is_print(ch):
                out.append(ch)
                continue
            cp = ord(ch)
            if cp < 0x80:
                out.append(f"\\x{cp:02x}")
            elif cp < 0x10000:
                out.append(f"\\u{cp:04x}")
            else:
                out.append(f"\\U{cp:08x}")
        out.append('"')
        return "".join(out)

    rng = random.Random(7)
    cases = ["", " ", "~", "!", "#", "[", "]", "\x7f", "del\x7fchar"]
    for _ in range(3000):
        top = 0x80 if rng.random() < 0.4 else (0x3000 if rng.random() < 0.7 else 0x10FFFF)
        s = "".join(chr(rng.randint(0, top)) for _ in range(rng.randint(0, 24)))
        if any(0xD800 <= ord(c) <= 0xDFFF for c in s):
            continue
        cases.append(s)
    for s in cases:
        assert go_quote(s) == slow(s), repr(s)


def test_json_number_lexeme_preserved():
    assert format_json('{"a": 100.320, "b": 1e5}') == '{\n  "a": 100.320,\n  "b": 1e5\n}\n'


def test_json_multiple_top_level_values():
    # Go FormatJson loops tokens until EOF: values concatenate
    assert format_json("{} []") == "{}[]\n"


# -- xml2json corners (jsonutil.go) --

def test_repeated_keys_coalesce():
    doc = parse_dom("<r><x>1</x><x>2</x><x>3</x></r>", strict=True)
    assert node_to_json(doc, -1) == {"r": {"x": ["1", "2", "3"]}}

def test_attrs_and_text():
    doc = parse_dom('<r a="v">hello</r>', strict=True)
    assert node_to_json(doc, -1) == {"r": {"@a": "v", "#text": "hello"}}

def test_depth_zero():
    doc = parse_dom("<r><a>1</a><b>2</b></r>", strict=True)
    assert node_to_json(doc.children[0], 0) == "1\n2"

def test_to_json_plain_text_detected_as_xml():
    # detectFormat only yields ContentText on a read error (empty input);
    # plain words go down the XML path -> document-level "#text"
    # (cmd/root.go:247-270 + jsonutil.go:45-47)
    assert to_json("plain words here") == '{\n  "#text": "plain words here"\n}\n'

def test_to_json_compact_sorted_keys():
    out = to_json("<r><z>1</z><a>2</a></r>", compact=True)
    assert out == '{"r": {"a": "2","z": "1"}}\n'


# -- detect + beautify dispatch (cmd/root.go:247-294) --

def test_force_html_on_xml():
    out = beautify("<a><b>x</b></a>", force_html=True)
    assert out == "<a>\n  <b>x</b>\n</a>\n"


def test_procinst_inside_element_quirk():
    """Faithful xq quirk: the ProcInst case never closes an open start tag
    (utils.go:86-102 writes directly, no startTagClosed check), so a PI as
    first child produces `<a<?pi x?>` — exactly as the reference does."""
    from xqspark.core.fmt_xml import format_xml
    assert format_xml("<a><?pi x?></a>") == "<a<?pi x?>\n/>\n"
    # with preceding text the tag is already closed and output is ordinary
    assert format_xml("<a>text<?pi x?></a>") == "<a>text<?pi x?>\n</a>\n"


# -- fourth review-batch regressions --

def test_json_mode_go_decode_semantics():
    # ints become float64 (precision loss like Go), first value only
    assert to_json('{"id": 9007199254740993}') == '{\n  "id": 9007199254740992\n}\n'
    assert to_json('{"a": 1} trailing-garbage') == '{\n  "a": 1\n}\n'

def test_json_invalid_utf8_to_replacement():
    from xqspark.core.fmt_json import format_json
    assert format_json(b'{"a":"\x80"}') == '{\n  "a": "�"\n}\n'

def test_bom_before_decl_transcodes():
    payload = b"\xef\xbb\xbf" + '<?xml version="1.0" encoding="windows-1251"?><a>\xcf\xf0\xe8</a>'.encode("latin-1")
    from xqspark.core.fmt_xml import format_xml
    assert "При" in format_xml(payload)

def test_strict_parse_rejects_declared_charset():
    # -j path has no CharsetReader (cmd/root.go:311 uses xmlquery.Parse)
    import pytest as _p
    from xqspark.core.xmltok import XmlSyntaxError
    with _p.raises(XmlSyntaxError):
        to_json(b'<?xml version="1.0" encoding="iso-8859-1"?><a>x</a>')

def test_detect_ascii_whitespace_only():
    from xqspark.core.detect import detect_format
    assert detect_format(" {\"a\":1}") == "xml"  # NBSP is not Go \s

def test_nbsp_after_bare_entity_in_attr_decodes():
    from xqspark.core.entities import unescape
    assert unescape("&notá", in_attr=True) == "¬á"  # non-ASCII doesn't block

def test_go_float_negative_zero_and_bignum():
    from xqspark.core.fmt_json import go_float_str
    assert go_float_str(-0.0) == "-0"
    assert go_float_str(float(2**60)) == "1152921504606847000"

def test_json_adjacent_values_error():
    import pytest as _p
    from xqspark.core.fmt_json import JsonSyntaxError, format_json
    for bad in ("01", "truefalse", "1x"):
        with _p.raises(JsonSyntaxError):
            format_json(bad)


def test_go_float_negative_exponent_unpadded():
    # Go encoding/json strips the leading zero from e-07..e-09 (ADVICE r1)
    from xqspark.core.fmt_json import go_float_str
    assert go_float_str(1e-7) == "1e-7"
    assert go_float_str(2.5e-8) == "2.5e-8"
    assert go_float_str(1e-10) == "1e-10"
    assert go_float_str(1e21) == "1e+21"
    assert go_float_str(1e-100) == "1e-100"
