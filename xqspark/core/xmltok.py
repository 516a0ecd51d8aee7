"""Lenient XML tokenizer with Go encoding/xml semantics.

A from-scratch re-expression of the token stream the reference consumes
(internal/utils/utils.go:46-48: xml.NewDecoder with Strict=false and a
charset reader). Byte-identical output of the downstream formatter depends
on matching Go's tokenizer behavior exactly:

- non-strict mode: unknown/malformed entities are left alone in text and
  attribute values; mismatched end tags are repaired by inventing the end
  tag for the open element (popElement's needClose mechanism); attributes
  may be unquoted ([a-zA-Z0-9_:-] runs) or valueless (value := local name)
- self-closing tags emit StartElement + EndElement
- namespace resolution: prefixes resolve to URIs via in-scope bindings
  declared by xmlns/xmlns:* attributes (bindings from the same tag apply to
  the tag itself); undeclared prefixes stay as the raw prefix; ``xml:`` is
  predeclared; bindings are undone when the element closes
- \r\n and lone \r rewritten to \n in character data and attribute values
- numeric character references and the five predefined entities decode;
  CDATA sections become CharData
- directives (<!DOCTYPE ...>) are scanned quote-aware with <...> nesting
  and embedded <!-- --> comments stripped
"""

from __future__ import annotations

from dataclasses import dataclass, field

XML_URL = "http://www.w3.org/XML/1998/namespace"

_PREDEFINED_ENTITIES = {"lt": "<", "gt": ">", "amp": "&", "apos": "'", "quot": '"'}


class XmlSyntaxError(ValueError):
    """Equivalent of Go xml.SyntaxError — malformed input."""


import re as _re

_STOP_TEXT = _re.compile(r"[<&]")
# Go text() rejects control characters outside the XML Char range in
# character data and attribute values, even in non-strict mode.
_ILLEGAL_CHAR = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
_STOP_DQUOTE = _re.compile(r'[<&"]')
_STOP_SQUOTE = _re.compile(r"[<&']")
# ASCII fast path for XML names; the slow unicode loop extends it
_NAME_RE = _re.compile(r"[A-Za-z_:][A-Za-z0-9_:.\-]*")
_SPACE_RE = _re.compile(r"[ \t\r\n]*")

# One-regex fast path for the overwhelmingly common tag shapes: ASCII
# unprefixed names, double-quoted attribute values with no entities, no
# CR. Anything else (prefixes, single quotes, entities, unquoted values,
# malformed) falls back to the general Go-faithful parser at the same
# position, so semantics are unchanged.
_FAST_TAG = _re.compile(
    r"<([A-Za-z_][A-Za-z0-9_.\-]*)"
    r"((?:[ \t\n]+[A-Za-z_][A-Za-z0-9_.\-]*="
    r"\"[^\"&<\r\x00-\x08\x0b\x0c\x0e-\x1f]*\")*)"
    r"[ \t\n]*(/?)>"
)
_FAST_ATTR = _re.compile(r"([A-Za-z_][A-Za-z0-9_.\-]*)=\"([^\"]*)\"")
_FAST_END = _re.compile(r"</([A-Za-z_][A-Za-z0-9_.\-]*)[ \t\r\n]*>")


@dataclass(slots=True)
class Name:
    space: str
    local: str
    prefix: str = ""  # prefix as written in the source (survives translation)

    def key(self) -> tuple[str, str]:
        return (self.space, self.local)


@dataclass(slots=True)
class Attr:
    name: Name
    value: str


@dataclass(slots=True)
class ProcInst:
    target: str
    inst: str


@dataclass(slots=True)
class StartElement:
    name: Name
    attrs: list[Attr] = field(default_factory=list)


@dataclass(slots=True)
class EndElement:
    name: Name


@dataclass(slots=True)
class CharData:
    text: str
    cdata: bool = False


@dataclass(slots=True)
class Comment:
    text: str


@dataclass(slots=True)
class Directive:
    text: str


def _is_name_start(ch: str) -> bool:
    return ch.isalpha() or ch in "_:"


def _is_name_char(ch: str) -> bool:
    return ch.isalnum() or ch in "_:.-\xb7"


def _split_name(raw: str) -> Name:
    i = raw.find(":")
    if i >= 0:
        return Name(raw[:i], raw[i + 1:], prefix=raw[:i])
    return Name("", raw)


def _rewrite_crlf(s: str) -> str:
    if "\r" in s:
        s = s.replace("\r\n", "\n").replace("\r", "\n")
    return s


class GoXmlTokenizer:
    """Iterator of tokens over a decoded document string."""

    def __init__(self, data: str, strict: bool = False):
        self.s = data
        self.pos = 0
        self.n = len(data)
        self.strict = strict
        # open-element stack: (translated Name, [(prefix, old_uri_or_None, had_binding)])
        self.stack: list[tuple[Name, list[tuple[str, str | None]]]] = []
        self.ns: dict[str, str] = {}
        self._pending: list = []

    # ---- low-level cursor ----

    def _getc(self) -> str:
        if self.pos >= self.n:
            raise XmlSyntaxError("unexpected EOF")
        ch = self.s[self.pos]
        self.pos += 1
        return ch

    def _peek(self) -> str:
        if self.pos >= self.n:
            return ""
        return self.s[self.pos]

    def _skip_space(self) -> None:
        self.pos = _SPACE_RE.match(self.s, self.pos).end()

    def _read_raw_name(self) -> str:
        start = self.pos
        m = _NAME_RE.match(self.s, start)
        if m is not None:
            self.pos = m.end()
        else:
            if self.pos >= self.n or not _is_name_start(self.s[self.pos]):
                raise XmlSyntaxError("invalid XML name")
            self.pos += 1
        # extend through any non-ASCII name characters (rare path)
        while self.pos < self.n:
            ch = self.s[self.pos]
            if ch.isascii() or not _is_name_char(ch):
                break
            self.pos += 1
        return self.s[start:self.pos]

    # ---- entity-aware text scanning (Go Decoder.text) ----

    def _text(self, quote: str | None, cdata: bool) -> str:
        """Read character data up to '<' (or closing quote / ``]]>``).

        Bulk slice scanning (str.find over a stop set) instead of a
        char-at-a-time loop — this is the hottest path per document.
        """
        s, n = self.s, self.n
        if cdata:
            idx = s.find("]]>", self.pos)
            if idx == -1:
                raise XmlSyntaxError("unexpected EOF in CDATA section")
            text = s[self.pos:idx]
            m_bad = _ILLEGAL_CHAR.search(text)
            if m_bad:
                raise XmlSyntaxError(
                    f"illegal character code U+{ord(m_bad.group()):04X}"
                )
            self.pos = idx + 3
            return _rewrite_crlf(text)

        out: list[str] = []
        if quote is None:
            stop_re = _STOP_TEXT
        elif quote == '"':
            stop_re = _STOP_DQUOTE
        else:
            stop_re = _STOP_SQUOTE
        while True:
            # bulk-copy until the next character that needs a decision
            start = self.pos
            m = stop_re.search(s, start)
            i = m.start() if m else n
            if quote is None:
                # NOT gated on Strict in Go (encoding/xml text()):
                j = s.find("]]>", start, i)
                if j != -1:
                    raise XmlSyntaxError("unescaped ]]> not in CDATA section")
            if i > start:
                chunk = s[start:i]
                m_bad = _ILLEGAL_CHAR.search(chunk)
                if m_bad:
                    raise XmlSyntaxError(
                        f"illegal character code U+{ord(m_bad.group()):04X}"
                    )
                # Go rewrites \r/\r\n -> \n on RAW input only; entity
                # expansions (&#xD;) bypass the rewrite, so it must run
                # per raw chunk, never over decoded output.
                out.append(_rewrite_crlf(chunk))
                self.pos = i
            if self.pos >= n:
                if quote is not None:
                    raise XmlSyntaxError("unexpected EOF in attribute value")
                break
            ch = s[self.pos]
            if ch == "<":
                if quote is not None:
                    # Not gated on Strict in Go (encoding/xml text()).
                    raise XmlSyntaxError("unescaped < inside quoted string")
                break
            if quote is not None and ch == quote:
                self.pos += 1
                break
            # ch == "&"
            out.append(self._entity())
        return "".join(out)

    def _entity(self) -> str:
        """Decode one &...; sequence; on failure return the raw consumed text
        (non-strict) or raise (strict). Mirrors Go text()'s entity branch.
        EOF anywhere inside the entity scan is an "unexpected EOF" error
        regardless of Strict (Go reads entity bytes with mustgetc)."""
        start = self.pos
        self.pos += 1  # consume '&'
        if self.pos >= self.n:
            raise XmlSyntaxError("unexpected EOF")
        ch = self.s[self.pos]
        if ch == "#":
            self.pos += 1
            if self.pos >= self.n:
                raise XmlSyntaxError("unexpected EOF")
            hexmode = False
            if self._peek() in ("x", "X"):
                # Go only accepts lowercase 'x'; '&#X..' is malformed.
                hexmode = self._peek() == "x"
                if not hexmode:
                    return self._entity_fail(start)
                self.pos += 1
            digits_start = self.pos
            if hexmode:
                while self.pos < self.n and self.s[self.pos] in "0123456789abcdefABCDEF":
                    self.pos += 1
            else:
                # ASCII digits only (str.isdigit accepts Unicode digits,
                # which Go treats as a malformed entity)
                while self.pos < self.n and "0" <= self.s[self.pos] <= "9":
                    self.pos += 1
            if self.pos >= self.n:
                raise XmlSyntaxError("unexpected EOF")
            if self.s[self.pos] != ";" or self.pos == digits_start:
                return self._entity_fail(start)
            num = int(self.s[digits_start:self.pos], 16 if hexmode else 10)
            if num > 0x10FFFF:
                return self._entity_fail(start)
            self.pos += 1
            if 0xD800 <= num <= 0xDFFF:
                # Go string(rune(n)) replaces surrogates with U+FFFD.
                return "�"
            return chr(num)
        # named entity
        name_start = self.pos
        if self.pos < self.n and _is_name_start(self.s[self.pos]):
            self.pos += 1
            while self.pos < self.n and _is_name_char(self.s[self.pos]):
                self.pos += 1
        if self.pos >= self.n:
            raise XmlSyntaxError("unexpected EOF")
        name = self.s[name_start:self.pos]
        if not name or self.s[self.pos] != ";":
            return self._entity_fail(start)
        self.pos += 1
        if name in _PREDEFINED_ENTITIES:
            return _PREDEFINED_ENTITIES[name]
        return self._entity_fail(start)

    def _entity_fail(self, start: int) -> str:
        if self.strict:
            raise XmlSyntaxError("invalid character entity")
        raw = self.s[start:self.pos]
        return raw

    # ---- namespace machinery (Go Decoder.translate / pushNs / popElement) ----

    def _translate(self, name: Name, is_element: bool) -> Name:
        space, local = name.space, name.local
        if space == "xmlns":
            return name
        if space == "" and not is_element:
            return name
        if space == "" and local == "xmlns":
            return name
        if space == "xml":
            space = XML_URL
        if space in self.ns:
            return Name(self.ns[space], local, prefix=name.prefix)
        return Name(space, local, prefix=name.prefix)

    def _push_element_fast(self, tok: StartElement) -> StartElement:
        """Regex-fast-path variant: element and attr spaces are all ""
        by construction, so only the default-ns binding and (when any ns
        is in scope) the element-name translation apply."""
        saved: list[tuple[str, str | None]] = []
        ns = self.ns
        for attr in tok.attrs:
            if attr.name.local == "xmlns":
                saved.append(("", ns.get("")))
                ns[""] = attr.value
        if ns:
            tok.name = self._translate(tok.name, True)
        self.stack.append((tok.name, saved))
        return tok

    def _push_element(self, tok: StartElement) -> StartElement:
        saved: list[tuple[str, str | None]] = []
        for attr in tok.attrs:
            if attr.name.space == "xmlns":
                prefix = attr.name.local
                saved.append((prefix, self.ns.get(prefix)))
                self.ns[prefix] = attr.value
            elif attr.name.space == "" and attr.name.local == "xmlns":
                saved.append(("", self.ns.get("")))
                self.ns[""] = attr.value
        tok.name = self._translate(tok.name, True)
        tok.attrs = [Attr(self._translate(a.name, False), a.value) for a in tok.attrs]
        self.stack.append((tok.name, saved))
        return tok

    def _pop_element(self, tok: EndElement) -> list[EndElement]:
        """Resolve an end tag to one or more EndElement tokens.

        A mismatched close in non-strict mode closes the innermost open
        element and replays itself (Go's needClose/toClose repair), which
        may cascade through several open elements.
        """
        out: list[EndElement] = []
        while True:
            if not self.stack:
                raise XmlSyntaxError(f"unexpected end element </{tok.name.local}>")
            top_name, saved = self.stack.pop()
            for prefix, old in reversed(saved):
                if old is None:
                    self.ns.pop(prefix, None)
                else:
                    self.ns[prefix] = old
            out.append(EndElement(top_name))
            if top_name.local == tok.name.local:
                if top_name.space != tok.name.space:
                    # Go popElement: the Space-mismatch error is NOT gated
                    # on Strict (only the Local repair is)
                    raise XmlSyntaxError(
                        f"element <{top_name.local}> in space {top_name.space} "
                        f"closed by </{tok.name.local}> in space {tok.name.space}"
                    )
                return out
            if self.strict:
                raise XmlSyntaxError(
                    f"element <{top_name.local}> closed by </{tok.name.local}>"
                )

    # ---- raw token scanning ----

    def tokens(self):
        """Yield tokens until EOF. Raises XmlSyntaxError on malformed input."""
        while True:
            if self._pending:
                yield self._pending.pop(0)
                continue
            if self.pos >= self.n:
                if self.stack:
                    raise XmlSyntaxError("unexpected EOF")
                return
            ch = self.s[self.pos]
            if ch != "<":
                text = self._text(None, False)
                if text != "":
                    yield CharData(text)
                continue
            # fast path: simple start / end tags via one regex each
            m = _FAST_TAG.match(self.s, self.pos)
            if m is not None:
                self.pos = m.end()
                attrs_raw = m.group(2)
                attrs = (
                    [Attr(Name("", k), v) for k, v in _FAST_ATTR.findall(attrs_raw)]
                    if attrs_raw
                    else []
                )
                start_tok = self._push_element_fast(
                    StartElement(Name("", m.group(1)), attrs)
                )
                yield start_tok
                if m.group(3):  # self-closing: close with the translated name
                    results = self._pop_element(EndElement(start_tok.name))
                    self._pending.extend(results[1:])
                    yield results[0]
                continue
            m = _FAST_END.match(self.s, self.pos)
            if m is not None:
                self.pos = m.end()
                end = EndElement(self._translate(Name("", m.group(1)), True))
                results = self._pop_element(end)
                self._pending.extend(results[1:])
                yield results[0]
                continue
            self.pos += 1  # consume '<'
            ch = self._getc()
            if ch == "/":
                raw = self._read_raw_name()
                self._skip_space()
                if self._getc() != ">":
                    raise XmlSyntaxError(f"invalid characters between </{raw} and >")
                end = EndElement(self._translate(_split_name(raw), True))
                results = self._pop_element(end)
                self._pending.extend(results[1:])
                yield results[0]
                continue
            if ch == "?":
                target = self._read_raw_name()
                rest_start = self.pos
                idx = self.s.find("?>", self.pos)
                if idx == -1:
                    raise XmlSyntaxError("unterminated <? directive")
                inst = self.s[rest_start:idx].lstrip(" \t\r\n")
                self.pos = idx + 2
                yield ProcInst(target, inst)
                continue
            if ch == "!":
                nxt = self._peek()
                if nxt == "-":
                    self.pos += 1
                    if self._getc() != "-":
                        raise XmlSyntaxError("invalid sequence <!- not part of <!--")
                    idx = self.s.find("-->", self.pos)
                    if idx == -1:
                        raise XmlSyntaxError("unterminated comment")
                    text = self.s[self.pos:idx]
                    self.pos = idx + 3
                    yield Comment(text)
                    continue
                if nxt == "[":
                    self.pos += 1
                    if not self.s.startswith("CDATA[", self.pos):
                        raise XmlSyntaxError("invalid <![ sequence")
                    self.pos += 6
                    text = self._text(None, True)
                    yield CharData(text, cdata=True)
                    continue
                yield Directive(self._directive())
                continue
            # start tag
            self.pos -= 1
            tok = self._start_tag()
            if isinstance(tok, tuple):  # self-closing: (start, end)
                start, _end_name = tok
                start_tok = self._push_element(start)
                yield start_tok
                # close with the translated start name (Go's needClose
                # replays the element's own name)
                results = self._pop_element(EndElement(start_tok.name))
                self._pending.extend(results[1:])
                yield results[0]
            else:
                yield self._push_element(tok)

    def _directive(self) -> str:
        """Go's quote-aware, nesting-aware <! ... > scan with embedded
        comments stripped (encoding/xml rawToken's '!' default branch)."""
        buf: list[str] = []
        inquote = ""
        depth = 0
        # Go writes the FIRST byte after '<!' to the buffer RAW, before
        # the quote/terminator scan ('<!>' keeps scanning past the '>',
        # a leading quote does not open a quoted section)
        buf.append(self._getc())
        while True:
            b = self._getc()
            if not inquote and b == ">" and depth == 0:
                break
            while True:
                buf.append(b)
                if b == inquote:
                    inquote = ""
                elif inquote:
                    pass
                elif b in "'\"":
                    inquote = b
                elif b == ">" and depth > 0:
                    depth -= 1
                elif b == "<" and depth > 0:
                    depth += 1
                elif b == "<":
                    # look for <!-- to begin a comment
                    marker = "!--"
                    matched = 0
                    nb = ""
                    for i, mc in enumerate(marker):
                        nb = self._getc()
                        if nb != mc:
                            buf.extend(marker[:i])
                            depth += 1
                            break
                        matched += 1
                    if matched == len(marker):
                        # strip the '<' we wrote; skip to -->
                        buf.pop()
                        idx = self.s.find("-->", self.pos)
                        if idx == -1:
                            raise XmlSyntaxError("unterminated comment in directive")
                        self.pos = idx + 3
                        break
                    else:
                        b = nb
                        continue
                break
        return "".join(buf)

    def _start_tag(self):
        raw = self._read_raw_name()
        name = _split_name(raw)
        attrs: list[Attr] = []
        while True:
            self._skip_space()
            ch = self._getc()
            if ch == "/":
                if self._getc() != ">":
                    raise XmlSyntaxError("expected /> in element")
                return (StartElement(name, attrs), _split_name(raw))
            if ch == ">":
                return StartElement(name, attrs)
            self.pos -= 1
            attr_raw = self._read_raw_name()
            attr_name = _split_name(attr_raw)
            self._skip_space()
            if self._peek() == "=":
                self.pos += 1
                self._skip_space()
                value = self._attrval()
            else:
                if self.strict:
                    raise XmlSyntaxError("attribute name without = in element")
                value = attr_name.local
            attrs.append(Attr(attr_name, value))

    def _attrval(self) -> str:
        ch = self._getc()
        if ch in "\"'":
            return self._text(ch, False)
        if self.strict:
            raise XmlSyntaxError("unquoted or missing attribute value in element")
        self.pos -= 1
        out = []
        while self.pos < self.n:
            b = self.s[self.pos]
            if b.isascii() and (b.isalnum() or b in "_:-"):
                out.append(b)
                self.pos += 1
            else:
                break
        return "".join(out)
