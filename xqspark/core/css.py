"""CSS3 selector engine — compiler + matcher over the HTML tree.

Equivalent of the reference's cascadia usage (internal/utils/utils.go:289,
go.mod:18): CSS3 selectors — type/#id/.class/[attr...] simple selectors,
combinators (descendant, >, +, ~), comma groups, and the structural
pseudo-classes. Matches are returned in document order (goquery Find).
"""

from __future__ import annotations

import re

from .dom import ELEMENT, TEXT, DomNode


class CssError(ValueError):
    pass


_IDENT = r"-?[A-Za-z_][\w-]*"
_TOK_RE = re.compile(
    rf"""
    (?P<ws>\s+)
  | (?P<comb>[>+~,])
  | (?P<star>\*)
  | (?P<type>{_IDENT})
  | (?P<id>\#[\w-]+)
  | (?P<class>\.[\w-]+)
  | (?P<attr>\[\s*(?P<aname>{_IDENT})\s*
      (?:(?P<aop>[~|^$*]?=)\s*(?P<aval>"[^"]*"|'[^']*'|[^\]\s]+)\s*
         (?:(?P<aflag>[iIsS])\s*)?)?\])
  | (?P<pseudo>:{_IDENT}(\((?P<parg>[^()]*|[^()]*\([^()]*\)[^()]*)\))?)
""",
    re.X,
)


def _unquote(v: str) -> str:
    if len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
        return v[1:-1]
    return v


_ASCII_WS = re.compile(r"[ \t\r\n\f]+")


def _ws_tokens(s: str) -> list[str]:
    """Split on ASCII whitespace only (CSS/cascadia rules; Python's
    str.split also splits NBSP and other Unicode spaces)."""
    return [t for t in _ASCII_WS.split(s) if t]


class _Simple:
    """One compound selector: type + conditions."""

    def __init__(self):
        self.type: str | None = None
        self.conds: list = []  # callables(node) -> bool

    def matches(self, n: DomNode) -> bool:
        if n.type != ELEMENT:
            return False
        if self.type is not None and n.data != self.type:
            return False
        return all(c(n) for c in self.conds)


def _attr_value(n: DomNode, name: str) -> str | None:
    for a in n.attrs:
        if a.local == name:
            return a.value
    return None


def _make_attr_cond(name: str, op: str | None, val: str | None, flag: str | None = None):
    # cascadia recognizes only the 'i' case-fold flag (cascadia parser.go
    # parseAttributeSelector); 's'/'S' is a parse error there, so reject it.
    if flag is not None and flag.lower() == "s":
        raise CssError(f"unsupported attribute selector flag {flag!r}")
    name = name.lower()
    if op is None:

        def cond(n):
            return _attr_value(n, name) is not None

        return cond
    v = _unquote(val)
    fold = flag is not None and flag.lower() == "i"
    if fold:
        v = v.lower()

    def cond(n):
        actual = _attr_value(n, name)
        if actual is None:
            return False
        if fold:
            actual = actual.lower()
        if op == "=":
            return actual == v
        if op == "~=":
            return v in _ws_tokens(actual)
        if op == "|=":
            return actual == v or actual.startswith(v + "-")
        if op == "^=":
            return v != "" and actual.startswith(v)
        if op == "$=":
            return v != "" and actual.endswith(v)
        if op == "*=":
            return v != "" and v in actual
        return False

    return cond


_NTH_RE = re.compile(
    r"^\s*(?:(odd)|(even)|([+-]?\d*)n\s*([+-]\s*\d+)?|([+-]?\d+))\s*$", re.I
)


def _parse_nth(arg: str) -> tuple[int, int]:
    m = _NTH_RE.match(arg)
    if m is None:
        raise CssError(f"invalid nth argument: {arg!r}")
    if m.group(1):
        return 2, 1
    if m.group(2):
        return 2, 0
    if m.group(5):
        return 0, int(m.group(5))
    a_txt = m.group(3)
    a = 1 if a_txt in ("", "+") else (-1 if a_txt == "-" else int(a_txt))
    b = int(m.group(4).replace(" ", "")) if m.group(4) else 0
    return a, b


def _nth_matches(a: int, b: int, pos: int) -> bool:
    if a == 0:
        return pos == b
    k = (pos - b) / a
    return k >= 0 and k == int(k)


def _elem_index(n: DomNode, of_type: bool, from_end: bool) -> int:
    sibs = [
        c
        for c in n.parent.children
        if c.type == ELEMENT and (not of_type or c.data == n.data)
    ]
    if from_end:
        sibs = list(reversed(sibs))
    for i, s in enumerate(sibs, 1):
        if s is n:
            return i
    return 0


def _make_pseudo_cond(name: str, arg: str | None, compile_group):
    name = name.lower()
    if name == "first-child":
        return lambda n: n.parent is not None and _elem_index(n, False, False) == 1
    if name == "last-child":
        return lambda n: n.parent is not None and _elem_index(n, False, True) == 1
    if name == "first-of-type":
        return lambda n: n.parent is not None and _elem_index(n, True, False) == 1
    if name == "last-of-type":
        return lambda n: n.parent is not None and _elem_index(n, True, True) == 1
    if name == "only-child":
        return lambda n: (
            n.parent is not None
            and _elem_index(n, False, False) == 1
            and _elem_index(n, False, True) == 1
        )
    if name == "only-of-type":
        return lambda n: (
            n.parent is not None
            and _elem_index(n, True, False) == 1
            and _elem_index(n, True, True) == 1
        )
    if name in ("nth-child", "nth-last-child", "nth-of-type", "nth-last-of-type"):
        if arg is None:
            raise CssError(f":{name} requires an argument")
        a, b = _parse_nth(arg)
        of_type = "of-type" in name
        from_end = "last" in name
        return lambda n: n.parent is not None and _nth_matches(
            a, b, _elem_index(n, of_type, from_end)
        )
    if name == "empty":
        return lambda n: not any(
            c.type == ELEMENT or (c.type == TEXT and c.data != "") for c in n.children
        )
    if name == "root":
        return lambda n: n.parent is not None and n.parent.type == "document"
    if name == "not":
        if arg is None:
            raise CssError(":not requires an argument")
        inner = compile_group(arg)
        return lambda n: not any(_complex_matches(cpx, n) for cpx in inner)
    if name in ("contains", "containsown"):
        # cascadia extensions (goquery surface): case-folded substring of
        # the element's text (own text only for :containsOwn)
        if arg is None:
            raise CssError(f":{name} requires an argument")
        needle = _unquote(arg.strip()).lower()
        if name == "contains":
            return lambda n: needle in n.inner_text().lower()
        return lambda n: any(
            c.type == TEXT and needle in c.data.lower() for c in n.children
        )
    raise CssError(f"unsupported pseudo-class :{name}")


def _compile_group(selector: str) -> list[list]:
    """Returns a list of complex selectors; each is
    [simple, (combinator, simple), ...] read right-to-left at match time."""
    group: list[list] = []
    current: list = []
    compound: _Simple | None = None
    pending_comb = " "
    pos = 0
    s = selector.strip()
    if not s:
        raise CssError("empty selector")
    had_ws = False
    while pos < len(s):
        m = _TOK_RE.match(s, pos)
        if m is None:
            raise CssError(f"invalid selector at {pos}: {s[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("aname", "aop", "aval", "parg"):
            kind = "attr"
        if kind == "ws":
            had_ws = True
            continue
        if kind == "comb":
            text = m.group("comb")
            if text == ",":
                if compound is None:
                    raise CssError("selector group with empty member")
                current.append((pending_comb, compound))
                group.append(current)
                current = []
                compound = None
                pending_comb = " "
                had_ws = False
                continue
            if compound is None:
                raise CssError(f"combinator {text!r} with no left side")
            current.append((pending_comb, compound))
            pending_comb = text
            compound = None
            had_ws = False
            continue
        # a simple-selector token begins/extends a compound
        if compound is not None and had_ws:
            current.append((pending_comb, compound))
            pending_comb = " "
            compound = None
        had_ws = False
        if compound is None:
            compound = _Simple()
        if kind == "star":
            pass
        elif kind == "type":
            compound.type = m.group("type").lower()
        elif kind == "id":
            ident = m.group("id")[1:]
            compound.conds.append(
                lambda n, i=ident: _attr_value(n, "id") == i
            )
        elif kind == "class":
            cls = m.group("class")[1:]
            compound.conds.append(
                lambda n, c=cls: c in _ws_tokens(_attr_value(n, "class") or "")
            )
        elif kind == "attr":
            compound.conds.append(
                _make_attr_cond(
                    m.group("aname"), m.group("aop"), m.group("aval"), m.group("aflag")
                )
            )
        elif kind == "pseudo":
            full = m.group("pseudo")
            pname = full[1:].split("(")[0]
            compound.conds.append(
                _make_pseudo_cond(pname, m.group("parg"), _compile_group)
            )
        else:
            raise CssError(f"unhandled token {kind}")
    if compound is None:
        raise CssError("selector ends with a combinator")
    current.append((pending_comb, compound))
    group.append(current)
    return group


def _complex_matches(complex_sel: list, node: DomNode) -> bool:
    """Match right-to-left: last compound against node, walk left."""
    idx = len(complex_sel) - 1
    comb, simple = complex_sel[idx]
    if not simple.matches(node):
        return False

    def backtrack(i: int, n: DomNode) -> bool:
        if i < 0:
            return True
        comb_right = complex_sel[i + 1][0]
        _, simple_left = complex_sel[i]
        if comb_right == " ":
            anc = n.parent
            while anc is not None:
                if simple_left.matches(anc) and backtrack(i - 1, anc):
                    return True
                anc = anc.parent
            return False
        if comb_right == ">":
            p = n.parent
            return p is not None and simple_left.matches(p) and backtrack(i - 1, p)
        if comb_right in ("+", "~"):
            if n.parent is None:
                return False
            sibs = [c for c in n.parent.children if c.type == ELEMENT]
            try:
                at = next(i2 for i2, c in enumerate(sibs) if c is n)
            except StopIteration:
                return False
            if comb_right == "+":
                prev = sibs[at - 1] if at > 0 else None
                return (
                    prev is not None
                    and simple_left.matches(prev)
                    and backtrack(i - 1, prev)
                )
            for prev in sibs[:at]:
                if simple_left.matches(prev) and backtrack(i - 1, prev):
                    return True
            return False
        raise CssError(f"unknown combinator {comb_right!r}")

    return backtrack(idx - 1, node)


class CssSelector:
    def __init__(self, selector: str):
        self.selector = selector
        self.group = _compile_group(selector)

    def select(self, root: DomNode) -> list[DomNode]:
        out: list[DomNode] = []
        group = self.group
        # hoisted hot shapes (single compound; two compounds joined by
        # '>' or ' '): no per-node backtrack closure, explicit walk
        # instead of the iter_descendants generator
        if len(group) == 1:
            cpx = group[0]
            if len(cpx) == 1:
                m = cpx[0][1].matches
                stack = list(reversed(root.children))
                pop = stack.pop
                extend = stack.extend
                while stack:
                    node = pop()
                    if node.children:
                        extend(reversed(node.children))
                    if node.type == ELEMENT and m(node):
                        out.append(node)
                return out
            if len(cpx) == 2 and cpx[1][0] in (">", " "):
                left = cpx[0][1].matches
                right = cpx[1][1].matches
                child_only = cpx[1][0] == ">"
                stack = list(reversed(root.children))
                pop = stack.pop
                extend = stack.extend
                while stack:
                    node = pop()
                    if node.children:
                        extend(reversed(node.children))
                    if node.type != ELEMENT or not right(node):
                        continue
                    p = node.parent
                    if child_only:
                        if p is not None and p.type == ELEMENT and left(p):
                            out.append(node)
                    else:
                        while p is not None:
                            if p.type == ELEMENT and left(p):
                                out.append(node)
                                break
                            p = p.parent
                return out
        for node in root.iter_descendants():
            if node.type != ELEMENT:
                continue
            if any(_complex_matches(cpx, node) for cpx in group):
                out.append(node)
        return out


import functools


@functools.lru_cache(maxsize=256)
def compile_css(selector: str) -> CssSelector:
    """Compiled selectors are immutable at match time — cached so
    per-document callers get compile-once-per-worker semantics."""
    return CssSelector(selector)
