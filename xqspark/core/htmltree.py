"""HTML5 tree builder — implied-tag subset of WHATWG tree construction.

Equivalent of the reference's goquery.NewDocumentFromReader
(internal/utils/utils.go:286), which builds a full WHATWG tree: implied
<html>/<head>/<body> insertion makes ``body > p`` match fragment-ish
inputs. This builder covers the implied-structure and auto-closing rules
that matter for Common-Crawl-style pages: unclosed <p>/<li>/<td>...,
stray end tags, head-content routing, raw-text elements.

Reuses DomNode so the CSS engine and serializers share one node type.
"""

from __future__ import annotations

from .dom import COMMENT, DOCUMENT, ELEMENT, TEXT, DomAttr, DomNode
from .htmltok import (
    RAW_TEXT_TAGS,
    HComment,
    HDoctype,
    HEndTag,
    HStartTag,
    HText,
    HtmlTokenizer,
)
from .textutil import VOID_TAGS

# tags whose start tag implicitly closes an open <p> (WHATWG "in body")
_CLOSES_P = frozenset(
    """address article aside blockquote center details dialog dir div dl
    fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup
    hr main menu nav ol p pre section summary table ul li dd dt
    plaintext xmp""".split()
)

_HEADINGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))

# start tag -> open tags it auto-closes (nearest first, stopping at scopes)
_SIBLING_CLOSERS = {
    "li": ("li",),
    "dd": ("dd", "dt"),
    "dt": ("dd", "dt"),
    "tr": ("tr", "td", "th"),
    "td": ("td", "th"),
    "th": ("td", "th"),
    "thead": ("thead", "tbody", "tfoot", "tr", "td", "th"),
    "tbody": ("thead", "tbody", "tfoot", "tr", "td", "th"),
    "tfoot": ("thead", "tbody", "tfoot", "tr", "td", "th"),
    "option": ("option",),
    "optgroup": ("option", "optgroup"),
}

# WHATWG "special" category (the auto-close scan for li/dd/dt stops at any
# special element except address/div/p, per the "in body" insertion mode)
_SPECIAL = frozenset(
    """applet area article aside base basefont bgsound blockquote body br
    button caption center col colgroup dd details dir div dl dt embed
    fieldset figcaption figure footer form frame frameset h1 h2 h3 h4 h5 h6
    head header hgroup hr html iframe img input keygen li link listing main
    marquee menu meta nav noembed noframes noscript object ol p param
    plaintext pre script section select source style summary table tbody td
    template textarea tfoot th thead title tr track ul wbr xmp
    address""".split()
)

_LIST_SCOPE_STOP = _SPECIAL - {"address", "div", "p"}

_TABLE_SCOPE_STOPS = frozenset(("html", "body", "table", "template"))

# base/basefont/bgsound/link/meta are inserted and immediately popped in
# the head insertion mode (x/net/html inHeadIM); the non-VOID_TAGS two
# must still never be pushed
_IMMEDIATE_POP = frozenset(("basefont", "bgsound"))

_P_SCOPE_STOPS = frozenset(
    ("html", "body", "table", "td", "th", "caption", "button", "select", "template")
)

# elements routed into <head> while no body content has been seen
_HEAD_ONLY = frozenset(
    ("title", "base", "basefont", "bgsound", "meta", "link", "style", "script", "noscript")
)


class HtmlTreeBuilder:
    """Stack-of-open-elements builder with implied html/head/body."""

    def __init__(self):
        self.doc = DomNode(DOCUMENT)
        self.html: DomNode | None = None
        self.head: DomNode | None = None
        self.body: DomNode | None = None
        self.stack: list[DomNode] = []

    def _current(self) -> DomNode:
        return self.stack[-1] if self.stack else self.doc

    def _merge_attrs(self, node: DomNode, attrs) -> None:
        for k, v in attrs:
            if not any(a.local == k for a in node.attrs):
                node.attrs.append(DomAttr("", k, v))

    def _ensure_html(self) -> DomNode:
        if self.html is None:
            self.html = DomNode(ELEMENT, "html")
            self.doc.append(self.html)
            self.stack = [self.html]
        return self.html

    def _open_head(self) -> DomNode:
        self._ensure_html()
        if self.head is None:
            self.head = DomNode(ELEMENT, "head")
            self.html.append(self.head)
        if not self._on_stack(self.head) and self.body is None:
            self.stack.append(self.head)
        return self.head

    def _open_body(self) -> DomNode:
        self._ensure_html()
        if self.head is None:
            self.head = DomNode(ELEMENT, "head")
            self.html.append(self.head)
        if self.body is None:
            # implied </head>: pop everything above html
            self.stack = [self.html]
            self.body = DomNode(ELEMENT, "body")
            self.html.append(self.body)
            self.stack.append(self.body)
        return self.body

    def _on_stack(self, node: DomNode) -> bool:
        return any(n is node for n in self.stack)

    def _auto_close(self, name: str) -> None:
        if name in _CLOSES_P:
            for i in range(len(self.stack) - 1, -1, -1):
                tag = self.stack[i].data
                if tag == "p":
                    del self.stack[i:]
                    break
                if tag in _P_SCOPE_STOPS:
                    break
        closers = _SIBLING_CLOSERS.get(name)
        if closers:
            if name in ("li", "dd", "dt"):
                stops = _LIST_SCOPE_STOP - set(closers)
            elif name in ("option", "optgroup"):
                # spec closes only when the CURRENT node is option/optgroup
                while self.stack and self.stack[-1].data in closers:
                    self.stack.pop()
                stops = None
            else:
                stops = _TABLE_SCOPE_STOPS
            if stops is not None:
                for i in range(len(self.stack) - 1, -1, -1):
                    tag = self.stack[i].data
                    if tag in closers:
                        del self.stack[i:]
                        break
                    if tag in stops:
                        break
        if name in _HEADINGS and self.stack and self.stack[-1].data in _HEADINGS:
            self.stack.pop()

    def feed(self, tokens) -> DomNode:
        for tok in tokens:
            if isinstance(tok, HDoctype):
                continue
            if isinstance(tok, HComment):
                self._current().append(DomNode(COMMENT, tok.data))
            elif isinstance(tok, HText):
                self._text(tok)
            elif isinstance(tok, HStartTag):
                self._start_tag(tok)
            elif isinstance(tok, HEndTag):
                self._end_tag(tok.name)
        idx = 0
        for n in self.doc.iter_descendants():
            n.order = idx
            idx += 1
        return self.doc

    def _text(self, tok: HText) -> None:
        if self.body is None:
            cur = self._current()
            in_head_element = (
                self.head is not None
                and cur is not self.html
                and cur is not self.doc
                and cur is not self.head
            )
            if not in_head_element:
                if tok.text.strip() == "":
                    return  # whitespace before body is dropped
                self._open_body()
        self._current().append(DomNode(TEXT, tok.text))

    def _start_tag(self, tok: HStartTag) -> None:
        name = tok.name
        if name == "html":
            node = self._ensure_html()
            self._merge_attrs(node, tok.attrs)
            return
        if name == "head":
            node = self._open_head()
            self._merge_attrs(node, tok.attrs)
            return
        if name == "body":
            node = self._open_body()
            self._merge_attrs(node, tok.attrs)
            return
        element = DomNode(ELEMENT, name)
        for k, v in tok.attrs:
            element.attrs.append(DomAttr("", k, v))
        if self.body is None and name in _HEAD_ONLY:
            head = self._open_head()
            cur = self._current()
            # nest inside an open head element (e.g. <noscript><link>)
            parent = cur if cur is not self.html and cur is not self.doc else head
            parent.append(element)
            if (
                name not in VOID_TAGS
                and name not in _IMMEDIATE_POP
                and not tok.self_closing
            ):
                self.stack.append(element)
            return
        self._open_body()
        self._auto_close(name)
        self._current().append(element)
        if (
            name not in VOID_TAGS
            and name not in _IMMEDIATE_POP
            and not tok.self_closing
        ):
            self.stack.append(element)

    def _end_tag(self, name: str) -> None:
        if name == "head":
            if self.head is not None and self._on_stack(self.head):
                self.stack = [self.html]
            return
        if name in ("body", "html"):
            if self.body is not None:
                self.stack = [self.html, self.body]
            return
        for i in range(len(self.stack) - 1, -1, -1):
            node = self.stack[i]
            if node is self.html or node is self.body or node is self.head:
                break
            if node.data == name:
                del self.stack[i:]
                return
        if name == "p":
            # WHATWG: </p> with no open p synthesizes an empty <p>
            self._open_body()
            self._current().append(DomNode(ELEMENT, "p"))
            return
        # stray end tag: ignored


def parse_html(data: bytes | str) -> DomNode:
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="surrogateescape")
    builder = HtmlTreeBuilder()
    return builder.feed(HtmlTokenizer(data).tokens())


# x/net/html Render writes raw child text ONLY for these (textarea and
# title are RCDATA: escaped on render, entity-decoded on re-tokenize)
_RAW_PARENTS = RAW_TEXT_TAGS - {"textarea", "title"}


def serialize_html(node: DomNode, outer: bool = True) -> str:
    """html.Render-equivalent: markup that re-tokenizes to the same tokens
    (used by CSS node mode, utils.go:293-307)."""
    out: list[str] = []

    def esc_text(s: str) -> str:
        # x/net/html escapeString set: & ' < > " \r
        return (
            s.replace("&", "&amp;")
            .replace("'", "&#39;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
            .replace('"', "&#34;")
            .replace("\r", "&#13;")
        )

    esc_attr = esc_text

    def walk(n: DomNode, emit_self: bool) -> None:
        if n.type == TEXT:
            parent = n.parent
            if parent is not None and parent.type == ELEMENT and parent.data in _RAW_PARENTS:
                out.append(n.data)
            else:
                out.append(esc_text(n.data))
            return
        if n.type == COMMENT:
            out.append("<!--" + n.data + "-->")
            return
        if n.type == DOCUMENT:
            for c in n.children:
                walk(c, True)
            return
        if emit_self:
            out.append("<" + n.data)
            for a in n.attrs:
                out.append(" " + a.local + '="' + esc_attr(a.value) + '"')
            if n.data in VOID_TAGS and not n.children:
                out.append("/>")
                return
            out.append(">")
        for c in n.children:
            walk(c, True)
        if emit_self:
            out.append("</" + n.data + ">")

    walk(node, outer)
    return "".join(out)
