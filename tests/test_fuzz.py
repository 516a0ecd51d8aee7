"""Property-based fuzzing (hypothesis): the engine must never crash with
anything but its typed errors, and structural invariants must hold."""

import string

from hypothesis import given, settings, strategies as st

from xqspark.core.api import beautify, css_query, xpath_query
from xqspark.core.detect import detect_format
from xqspark.core.fmt_html import format_html
from xqspark.core.fmt_json import JsonSyntaxError, format_json
from xqspark.core.fmt_xml import format_xml
from xqspark.core.htmltree import parse_html
from xqspark.core.xmltok import XmlSyntaxError

# building blocks for XML-ish soup
_tag = st.sampled_from(["a", "b", "item", "ns:x", "p"])
_text = st.text(alphabet=string.ascii_letters + " &<>'\"\n\t;#", max_size=20)


@st.composite
def xml_soup(draw, depth=0):
    if depth > 3:
        return draw(_text)
    parts = draw(
        st.lists(
            st.one_of(
                _text,
                st.builds(lambda t, inner: f"<{t}>{inner}</{t}>", _tag,
                          xml_soup(depth=depth + 1)),
                st.builds(lambda t: f"<{t}/>", _tag),
                st.builds(lambda c: f"<!--{c}-->", st.text(string.ascii_letters, max_size=8)),
            ),
            max_size=4,
        )
    )
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(xml_soup())
def test_format_xml_total(doc):
    try:
        out = format_xml(doc)
        assert out.endswith("\n")
    except XmlSyntaxError:
        pass  # typed rejection is fine; crashes are not


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=60))
def test_format_xml_arbitrary_text(doc):
    try:
        format_xml(doc)
    except XmlSyntaxError:
        pass


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=80))
def test_format_html_never_raises(doc):
    out = format_html(doc)
    assert out.endswith("\n")


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=80))
def test_html_tree_never_raises(doc):
    root = parse_html(doc)
    assert root.type == "document"


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_format_json_total(doc):
    try:
        format_json(doc)
    except JsonSyntaxError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=60))
def test_detect_total(data):
    assert detect_format(data) in ("xml", "html", "json", "text")


@settings(max_examples=60, deadline=None)
@given(xml_soup())
def test_xpath_total(doc):
    try:
        xpath_query(doc, "//a | //item")
    except XmlSyntaxError:
        pass


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=60))
def test_css_total(doc):
    out = css_query(doc, "p, a.cls > b:first-child")
    assert isinstance(out, str)


def test_comment_only_element_quirk():
    """Faithful xq quirk: Comment tokens do not reset lastTagName
    (utils.go:150-170 never touches it), so a comment-only element
    collapses to `/>` AFTER its comment — producing non-well-formed
    output, exactly as the reference does."""
    assert format_xml("<a><!--c--></a>") == "<a>\n  <!--c-->/>\n"


@settings(max_examples=100, deadline=None)
@given(xml_soup())
def test_xml_format_reparses(doc):
    """Well-formedness: format_xml output must itself tokenize cleanly
    (except for the comment-only-element quirk above, and numeric char
    refs to control chars: Go validates raw input bytes BEFORE entity
    decoding, so &#8; decodes to a literal \\x08 in the output which is
    then rejected on reparse — faithful to the reference)."""
    if "<!--" in doc or "&#" in doc:
        return
    try:
        out = format_xml(doc)
    except XmlSyntaxError:
        return
    format_xml(out)  # must not raise


def test_fused_formatter_differential():
    """The fused fast path must be byte-identical (output AND errors) to
    the general token path on a randomized construct soup."""
    import random

    from xqspark.core.fmt_xml import format_xml, format_xml_tokens
    from xqspark.core.xmltok import GoXmlTokenizer, XmlSyntaxError

    def general(text):
        return format_xml_tokens(GoXmlTokenizer(text, strict=False).tokens(), "  ")

    random.seed(1234)
    frag = ['<a>', '</a>', '<b x="1">', '</b>', 'text', ' ', '\n', '  ',
            '<c/>', '<d y="v w">', '</d>', '&amp;', '&bad', '<e:f>', '</e:f>',
            '<!-- c -->', '<?pi a="b"?>', '<![CDATA[x]]>', '<g xmlns="u">',
            '</g>', 'tail  ', '\n  ', 'x&#65;y', '<h i="a&quot;b">', '</h>',
            '<!DOCTYPE r>', '\t', ']]>', '<k >', '</k >', '<m a="1" b="2">',
            '</m>', 'unicodeü', '\x85', '\v', '<n><n>', '</n></n>']
    for _ in range(1500):
        doc = "".join(random.choice(frag) for _ in range(random.randint(1, 12)))
        try:
            want, werr = general(doc), None
        except XmlSyntaxError as e:
            want, werr = None, str(e)
        try:
            got, gerr = format_xml(doc), None
        except XmlSyntaxError as e:
            got, gerr = None, str(e)
        assert (want, werr) == (got, gerr), repr(doc)


_HTML_FMT_FRAGS = [
    '<div>', '</div>', '<p>', '</p>', '<p class="x">', 'text', ' ', '\n  ',
    '<b>', '</b>', '<i>', '</i>', '<a href="u">', '</a>', '<br>', '<hr/>',
    '<li>', '</li>', '<ul>', '</ul>', '<h1>', '</h1>', '<img src="i.png">',
    '<!doctype html>', '<!DOCTYPE HTML >', '<html lang="en">', '<head>',
    '</head>', '<body class="b">', '</body>', '</html>', '<title>T</title>',
    '<meta charset="u">', '<style>.c{}</style>',
    '<script>var a=1;</script>', '<script><!-- x --></script>',
    '<script><!-- <script>nested</script> --></script>',
    '<textarea>\nv</textarea>', '<pre>\nk</pre>', '<!--c-->', '<!-- a-b -->',
    '<!-->', '<!--->', '<!----->', '<!-- x --!>', '<!-- \r\n -->',
    '<!--unterminated', '<table>', '</table>', '<td>', '</td>', '<tr>',
    '</tr>', '<select>', '<option>o', '</select>', '<form a="f">', '</form>',
    '<button>x', '</br>', '<br/>', '<title>a&amp;b</title>',
    '<textarea>x&lt;y</textarea>', '<dd>', '<dt>', '<nobr>',
    '<b><i>x</b>y</i>', '&amp;', '&bad', '&lt;tag&gt;', "<div a='sq'>",
    '<input disabled>', '<DIV CLASS="UP">', '</DIV>',
    '<noscript><link></noscript>', '<iframe>raw</iframe>', '<?pi?>',
    '<!bogus>', '</>', '<', 'x < y', '<?xml version="1.0"?>', '<?php echo',
    '<?>', '<div  a="1"\tb="2">', '<p>one<p>two', '\r\n', '\x00', 'a&#0;b',
    '&#65;', '<xmp>raw</xmp>', '<script>s', '<title>t',
    '<plaintext>rest</plaintext>x', '<a b=c>', '<a b = "c">', '<a b>',
    '<a b="">', '<a b="x&y">', "<a b='&amp;'>", '<a b=c&d>', '  \n ',
    'word ', ' tail', 'mid  dle', '\n\n', 'a\rb', '<span a="v1" a="v2">',
    '</b >', '</b x>', '</tag', '<t', '<em>&nbsp;</em>', '<u>', '</u>',
    'ünïcode', 'a>b', '"q"', "'s'", '<script src="s.js"></script>',
    '<style>@media x{a{b:c}}</style>', '<svg>', '</svg>',
    '<video controls>', '</video>',
    # r5 widened attr shapes: ws around '=' (hit) and '= >' (bail)
    '<a b = c>', '<a b =c>', '<a b= "c">', '<a b = >', '<a b=c d>',
    '<a b c>', '<a b == c>', '<a b="x" c = \'y\' d=z e>',
    '<input type = "text" value= ok>',
    # unquoted values ending '/': raw-end "/>"  makes the tag
    # SELF-CLOSING with the '/' kept in the value (code-review r5 find)
    '<a foo=bar/>x</a>', '<div id=x/>t</div>', '<a href=/path/>link</a>',
    '<a b=c/ >x', '<script src=/s.js/></script>', '<a foo="x/">',
]


def test_fused_html_formatter_differential():
    """VERDICT r4 #7: the fused HTML tokenizer+formatter must be
    byte-identical to the general token path on a randomized soup that
    straddles every bail boundary (attr shapes, raw/RCDATA incl. script
    escape states, comments incl. abrupt/bogus/EOF, doctype, bare '<',
    entities, CR/NUL). Bails route through format_html's fallback, so
    format_html vs the explicit general path IS the identity check."""
    import random

    from xqspark.core.fmt_html import (
        _format_html_fused,
        _format_html_general,
        _HFallback,
    )

    random.seed(777)
    hit = bail = 0
    for _ in range(4000):
        doc = "".join(
            random.choice(_HTML_FMT_FRAGS)
            for _ in range(random.randint(1, 14))
        )
        gen = _format_html_general(doc, "  ")
        try:
            assert _format_html_fused(doc, "  ") == gen, repr(doc)
            hit += 1
        except _HFallback:
            bail += 1
    # both paths must stay exercised: the soup is bail-frag-heavy by
    # design (~18% bail), organic pages hit far higher
    assert hit > 2000 and bail > 100, (hit, bail)


def test_fused_html_formatter_hits_wellformed_pages():
    """Coverage floor: realistic well-formed pages (attrs of every
    quoting style, raw script with comments, style, entities, tables,
    forms, doctype, comments) must take the FUSED path — a future bail
    broad enough to kick these out would silently lose the 1.5x."""
    from xqspark.core.fmt_html import _format_html_fused

    page = (
        '<!doctype html>\n<html lang="en">\n<head>\n'
        "<title>Page %d &amp; more</title>\n<meta charset=utf-8>\n"
        "<style>.c{color:red}</style>\n"
        '<script src="/app.js" async></script>\n</head>\n'
        '<body class="page">\n<!-- header -->\n'
        '<form action="/s" method=get><input name=q disabled></form>\n'
        '<table><tr><td>a</td><td a="1" b=\'2\'>b</td></tr></table>\n'
        '<div  data-x="1&quot;2">x &lt; y &#65; &nbsp;</div>\n'
        "<script>if (a<b) { s = \"</div>\"; } <!-- x --></script>\n"
        "<textarea>raw &amp; entities</textarea>\n"
        "</body>\n</html>\n"
    )
    for i in range(20):
        _format_html_fused(page % i, "  ")  # raises _HFallback on bail


def test_fused_html_formatter_empty_indent():
    """indent='' (compact mode) flows through the fused path too —
    newline handling differs (newline = '')."""
    from xqspark.core.fmt_html import _format_html_fused, _format_html_general

    for doc in (
        '<!doctype html><html><head><title>t</title></head>'
        '<body><p>x</p><!--c--></body></html>',
        '<div><p>a</p> <p>b</p></div>',
    ):
        assert _format_html_fused(doc, "") == _format_html_general(doc, "")


def test_fused_dom_parse_differential():
    """The fused DOM fast path must produce structurally identical trees
    (and identical errors) to the general token loop, strict and lenient."""
    import random

    from xqspark.core import dom as dommod
    from xqspark.core.dom import parse_dom
    from xqspark.core.xmltok import XmlSyntaxError

    def tree_sig(n):
        return (n.type, n.data, n.prefix, n.namespace,
                tuple((a.space, a.local, a.value, a.prefix) for a in n.attrs),
                n.order, n.cdata, n.pi_inst,
                tuple(tree_sig(c) for c in n.children))

    def general(text, strict):
        orig = dommod._parse_dom_fast
        dommod._parse_dom_fast = lambda s: (_ for _ in ()).throw(dommod._DomFallback())
        try:
            return parse_dom(text, strict)
        finally:
            dommod._parse_dom_fast = orig

    random.seed(99)
    frag = ['<a>', '</a>', '<b x="1">', '</b>', 'text', ' ', '\n', '<c/>',
            '<d y="v w">', '</d>', '&amp;', '&bad', '<e:f>', '</e:f>',
            '<!-- c -->', '<?pi a="b"?>', '<![CDATA[x]]>', '<g xmlns="u">',
            '</g>', 'x&#65;y', '<h i="a&quot;b">', '</h>', '<!DOCTYPE r>',
            ']]>', '<k >', '</k >', '<m a="1" b="2">', '</m>', '<n><n>',
            '</n></n>', '<p q="tab\there">', '</p>', '\x85', '-->',
            '<!--a-b-->']
    for strict in (False, True):
        for _ in range(1200):
            doc = "".join(random.choice(frag) for _ in range(random.randint(1, 10)))
            try:
                want, werr = tree_sig(general(doc, strict)), None
            except XmlSyntaxError as e:
                want, werr = None, str(e)
            try:
                got, gerr = tree_sig(parse_dom(doc, strict)), None
            except XmlSyntaxError as e:
                got, gerr = None, str(e)
            assert (want, werr) == (got, gerr), (strict, repr(doc))


_xmlish = st.text(
    alphabet=string.ascii_letters + " <>/=\"'&;#!?-.[]\n\t\r\x0b]" + "é\x85",
    max_size=80,
)


@given(_xmlish)
@settings(max_examples=400, deadline=None)
def test_fused_formatter_hypothesis(doc):
    """Arbitrary text: fused and general formatter agree on bytes AND
    errors (hypothesis shrinks any divergence to a minimal witness)."""
    from xqspark.core.fmt_xml import format_xml, format_xml_tokens
    from xqspark.core.xmltok import GoXmlTokenizer

    try:
        want, werr = (
            format_xml_tokens(GoXmlTokenizer(doc, strict=False).tokens(), "  "),
            None,
        )
    except XmlSyntaxError as e:
        want, werr = None, str(e)
    try:
        got, gerr = format_xml(doc), None
    except XmlSyntaxError as e:
        got, gerr = None, str(e)
    assert (want, werr) == (got, gerr)


@given(_xmlish, st.booleans())
@settings(max_examples=400, deadline=None)
def test_fused_dom_hypothesis(doc, strict):
    from xqspark.core import dom as dommod
    from xqspark.core.dom import parse_dom

    def tree_sig(n):
        return (n.type, n.data, n.prefix, n.namespace,
                tuple((a.space, a.local, a.value, a.prefix) for a in n.attrs),
                n.order, n.cdata, n.pi_inst,
                tuple(tree_sig(c) for c in n.children))

    orig = dommod._parse_dom_fast
    dommod._parse_dom_fast = lambda s: (_ for _ in ()).throw(dommod._DomFallback())
    try:
        try:
            want, werr = tree_sig(parse_dom(doc, strict)), None
        except XmlSyntaxError as e:
            want, werr = None, str(e)
    finally:
        dommod._parse_dom_fast = orig
    try:
        got, gerr = tree_sig(parse_dom(doc, strict)), None
    except XmlSyntaxError as e:
        got, gerr = None, str(e)
    assert (want, werr) == (got, gerr)


def test_fused_html_tree_differential():
    """The fused tokenizer+tree fast path must produce structurally
    identical trees to the general tokenizer + WHATWG builder on a
    randomized soup that straddles every bail boundary (formatting
    misnesting, tables, selects, raw text, head routing, comments)."""
    import random

    from xqspark.core import htmltree as ht

    def tree_sig(n):
        return (n.type, n.data,
                tuple((a.local, a.value) for a in n.attrs),
                n.order,
                tuple(tree_sig(c) for c in n.children))

    def general(text):
        b = ht.HtmlTreeBuilder()
        return b.feed(ht.HtmlTokenizer(text).tokens())

    random.seed(4242)
    frag = [
        '<div>', '</div>', '<p>', '</p>', '<p class="x">', 'text', ' ',
        '\n  ', '<b>', '</b>', '<i>', '</i>', '<a href="u">', '</a>',
        '<span id="s">', '</span>', '<br>', '<hr/>', '<li>', '</li>',
        '<ul>', '</ul>', '<h1>', '</h1>', '<h2>', '<img src="i.png">',
        '<!doctype html>', '<html lang="en">', '<head>', '</head>',
        '<body class="b">', '</body>', '</html>', '<title>T</title>',
        '<meta charset="u">', '<link rel="x">', '<style>.c{}</style>',
        '<script>var a=1;</script>', '<script><!-- x --></script>',
        '<textarea>\nv</textarea>', '<pre>\nk</pre>', '<!--c-->',
        '<!-- a-b -->', '<table>', '</table>', '<td>', '</td>', '<tr>',
        '</tr>', '<th>', '<tbody>', '</tbody>', '<thead>', '<tfoot>',
        '<caption>', '</caption>', '<colgroup>', '<col>', '</colgroup>',
        '<table><tr><td>cell</td></tr></table>',
        '<table><td>implied</table>',
        '<table><tbody><tr><th>h</th><td>d</td></tr></tbody></table>',
        '<table><tr><td><b>deep</td><td>next',
        '<table><tr><td><table><tr><td>in</td></tr></table></td></tr></table>',
        '<table>loose text</table>', '<table><div>fostered</div></table>',
        '<table> \n <tr><td>ws-ok', '<td>stray-td</td>',
        '<p><table><tr><td>qp', '<table><col span="2">',
        '<b><table><tr><td>out</td></tr></table></b>',
        '<select>', '<option>o', '</select>', '<form>', '</form>',
        '<option>', '</option>', '<optgroup>', '</optgroup>',
        '<select><option>a<option>b</select>',
        '<select><div>ig<option>a</select>', '<select><input>',
        '<select><b>f</b><option>a</select>', '<select><select>',
        '<select><optgroup><option>a<optgroup><option>b</select>',
        '<table><tr><td><select><option>x<td>brk',
        '<select><script>s</script><option>q</select>',
        '<select><textarea>t</textarea>', '<select></table>',
        '<select><title>raw</title>x</select>', '<select></br></select>',
        '<form a="f"><input disabled></form>', '<form><form>n</form></form>',
        '<form><div>x</form>y</div>', '<image src="i">', '</image>',
        '<table><form><tr><td>tf', '<form><b>x</form>',
        '<button>', '</button>', '<button>x<button>y</button>', '</br>',
        '<br/>', '<title>a&amp;b</title>', '<textarea>x&lt;y</textarea>',
        '<listing>\nx</listing>', '<table></br>', '<p></br></p>',
        '<dd>', '<dt>', '<nobr>', '<b><i>x</b>y</i>', '&amp;', '&bad',
        '&lt;tag&gt;', '<div a=\'sq\'>', '<input disabled>',
        '<DIV CLASS="UP">', '</DIV>', '<noscript><link></noscript>',
        '<iframe>raw</iframe>', '<?pi?>', '<!bogus>', '</>', '<',
        '<?xml version="1.0"?>', '<?php echo', '<?>',
        '<applet>', '</applet>', '<marquee>x</marquee>', '<object a="o">',
        '</object>', '<applet><b>f</applet>after', '<marquee><p>m',
        '<table><applet>', '<b><marquee>x</marquee></b>', '<applet><td>',
        '<template>', '</template>', '<template><div>x</div></template>y',
        '<b><template>x</template></b>', '<table><template><tr><td>t</template>',
        '<select><template><option>o</template></select>',
        '<template><b>f</template>after',
        'x < y', '<em>', '</em>', '<button>', '<svg>', '</svg>',
        '<div  a="1"\tb="2">', '<p>one<p>two', '<td a="v">', '\r\n',
        '<h3>', '</h3>', '</li>', '</ul>', '</p>', '</b>', '</a>',
        '<b><b>', '</b></b>', '<a href="1">x</a><a href="2">y</a>',
        '<head></head> <meta a="1">', '<p><b>x<div>y</div>', '<wbr>',
        '</head><title>late</title>', '<xmp>raw</xmp>', '<script>s',
        '<title>t', '\x00', 'a&#0;b', '&#65;', '<body>', '<body a="1">',
        '<html b="2">', '</body><div>after</div>', '<caption><b>x</caption>',
        '<h1><b>x</b></h1><h2>', '<p a="">', '<div a="1" a="2">',
        '<table><thead><tr><th>h', '<table><tr><td><i>x</i></td><td><i>y',
        '<table><colgroup><col></colgroup><tr><td>c',
        # r4 foster-text fast path: pure text in table context
        '<table>stray<tr><td>y', '<table><tr>in-row-text<td>c',
        '<table><tbody>mid-tbody</tbody></table>',
        '<table>a<td>b</td>c</table>', 'before<table>x</table>after',
        '<table>one<tr>two<td>cell</td>three</tr>four</table>',
        '<table>x<!--c--><tr><td>y', '<table>t1</table><table>t2</table>',
        '<table><tr><td><table>inner-loose</table>',
        '<div>pre<table>fost</table>post</div>',
        '<table>&amp;ent<tr><td>e',
        # r4 foster-void fast path
        '<table><img src="i.png"><tr><td>x', '<table><tr><br><td>c',
        '<table><input>', '<table><tr><td>a</td></tr><wbr></table>',
        '<table><hr><tr><td>h', '<table><tbody><img></tbody>z</table>',
        '<p><table><br></table>', '<b><table><img></table></b>',
        '<table>mix<br>text<tr><td>y', '<table><meta charset="u"><td>m',
        # r4 foster-PUSHED fast path (div/span/p/form/fmt/raw in table ctx)
        '<table><div>in-div</div><tr><td>x', '<table><span>s</span></table>',
        '<table><div><tr><td>clears-div', '<table><p>par<tr><td>p',
        '<table><div>open-div</table>after', '<table><b>fmt</b><tr><td>f',
        '<table><b>unclosed<tr><td>f', '<table><form><input></form><td>fo',
        '<table><script>var x=1;</script><tr><td>s',
        '<table><textarea>tx</textarea><td>t', '<table><title>ti</title>',
        '<table><div>a<div>b</div>c</div><td>nested',
        '<table><tbody><div>d</div><tr><td>tb',
        '<table><tr><div>rowdiv</div><td>rd',
        '<table><ul><li>item</ul><tr><td>u', '<table><select><option>o',
        '<table><h2>head</h2><td>h', '<div><table><div>both</div></table></div>',
        # r4 bail-class recoveries: marker elts in tables, </br>/</p>
        # foster, NUL strip, script <!-- without nested opener, <!x bogus
        '<table><applet>a</applet><td>z', '<table><marquee>m</marquee></table>',
        '<table><object a="o">o</object><tr><td>q', '<table></br><td>x',
        '<table></p><td>y', '<td></p>cell', 'nul\x00mid', '\x00\x00',
        'pre&#0;post', '<script><!-- plain --></script>',
        '<script><!-- <b>not-opener</b> --></script>x',
        '<script><!-- <script>nested</script> -->tail</script>',
        '<!x bogus>', '<!doctypo y>', '<! >', '<div><!junk>t</div>',
        '<!no-close', '<!x\x00y>',
        # r4: plaintext (raw-to-EOF) + safe nobr (none open in scope)
        '<plaintext>rest <b>raw</b> &amp; x', '<p>x<plaintext>y</plaintext>z',
        '<plaintext>', '<nobr>n</nobr>', '<nobr>a<b>c</b></nobr>',
        '<table><plaintext>pt', '<div><nobr>solo</nobr></div>',
        # r4: active-formatting reconstruction + simple-AAA end tags
        '<p><b>head<p>body continues', '<p><b><i>two<p>strands',
        '<li><b>item<li>next', '<b><i>x</b>after</i>',
        '<b><em>y</b>z', '<h1><b>h<h2>next', '<button><b>b<button>c',
        '<td><b>cell<td>next-cell', '<p><b>x</body><div>tail',
        '<b>x</body>more', '<p><i>q<dd>r<dt>s',
        '<b><b>dup</b>once</b>twice', '<p><nobr>n<p>m',
        '<table><b>f<tr><td>cell</td></tr></table>after',
        '<b>a</p>b', '<i>x<ul><li>y</ul>z',
        # r4: FULL adoption agency (furthest block), <a> readoption,
        # Noah's Ark eviction, nested nobr
        '<b><div>fb</b>after</div>', '<i><p>par</i>more</p>',
        '<b><i><div>deep</b>x</i>y</div>', '<em><ul><li>l</em>m',
        '<a href="1">one<a href="2">two</a>', '<a>x<div><a>y</a></div>',
        '<b><b><b><b>ark</b>', '<nobr><nobr>nn</nobr>',
        '<b><p>one</b><p>two', '<strong><table><tr><td>c</strong>d',
        '<a><b>ab<a>cd', '<i><b><div>x</i></b>',
        '<b><span><div>s</b>t', '<font color="r"><div>f</font>g',
        # r4: script escape states via the shared scanner
        '<script><!-- <script>inner</script> --></script>after',
        '<script><!-- <script>never-closes --></script>tail',
        '<script><!-- no close at all', '<script>a<!--b--></script>c',
        '<script><!-- </script>esc-close -->x',
        # RCDATA over strands (r4: reconstructs INTO the element now)
        '<b>x</p><title>strand-title</title>after',
        '<b>y</p><textarea>strand-ta</textarea>tail',
        '<p><b><i>two</p><textarea>\nnl-ta</textarea>z',
        '<b>q</p><title>t1</title><title>t2</title>',
        # r4 final: frameset is just a plain element in the general
        # builder; comments use the shared reader (abrupt closes, --!>,
        # ---> extra dashes, EOF truncation)
        '<frameset>', '<frame>', '<frameset><frame></frameset>',
        '<!-->', '<!--->', '<!--a--b-->', '<!--c--!>after',
        '<!--d---->', '<!--trail-', '<!--e--', '<!--f--!',
    ]
    n_fast = n_fallback = 0
    for _ in range(3500):
        doc = "".join(random.choice(frag) for _ in range(random.randint(1, 14)))
        want = tree_sig(general(doc))
        try:
            got = tree_sig(ht._parse_html_fast(doc))
            n_fast += 1
        except ht._TreeFallback:
            got = tree_sig(ht.parse_html(doc))
            n_fallback += 1
        assert want == got, repr(doc)
    # r4 endgame: the fast path covers essentially the whole soup (the
    # only remaining bails are exotica like in-select RCDATA over
    # stranded formatting) — the fallback ROUTING is pinned by the
    # dedicated test below instead of a soup-share floor
    assert n_fast > 3000, (n_fast, n_fallback)


def test_tree_fallback_routing_still_engages():
    """The _TreeFallback -> general-builder chain must stay wired: an
    EOF-truncated/malformed tag (the tag regex can't parse it; the
    general tokenizer's recovery owns it) is the one PERMANENT
    deterministic bail, and parse_html must transparently produce the
    general tree for it."""
    import pytest

    from xqspark.core import htmltree as ht

    doc = "<pre&#0;post"
    with pytest.raises(ht._TreeFallback):
        ht._parse_html_fast(doc)

    def tree_sig(n):
        return (n.type, n.data, n.order,
                tuple(tree_sig(c) for c in n.children))

    b = ht.HtmlTreeBuilder()
    want = tree_sig(b.feed(ht.HtmlTokenizer(doc).tokens()))
    assert tree_sig(ht.parse_html(doc)) == want


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=200), st.text(max_size=40))
def test_robots_total(doc, path):
    """parse_robots + is_allowed are total on arbitrary text (crawl
    reality: robots.txt is often HTML, garbage, or truncated)."""
    from xqspark.core.robots import parse_robots

    rules = parse_robots(doc)
    assert rules.is_allowed("anybot", path) in (True, False)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_warc_total(data):
    """parse_warc either yields records, stops (truncation), or raises
    the declared WarcError — never anything else; http_response_body is
    total on whatever payload comes out."""
    from xqspark.core.warc import WarcError, http_response_body, parse_warc

    try:
        for headers, payload in parse_warc(data):
            assert isinstance(headers, dict)
            http_response_body(payload)
    except WarcError:
        pass
