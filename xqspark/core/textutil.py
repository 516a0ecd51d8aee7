"""String helpers shared by the formatters.

Pure Python, Spark-free. Byte-compatible re-expressions of the reference's
scalar helpers (sibprogrammer/xq):

- ``escape_text``     -> internal/utils/utils.go:671-684 (escapeText)
- ``normalize_spaces``-> internal/utils/utils.go:686-706 (normalizeSpaces)
- ``VOID_TAGS``       -> internal/utils/utils.go:651-669 (getSelfClosingTags)
- ``go_quote``        -> Go strconv.Quote semantics (used by utils.go:505,570)
- ``go_trim_space``   -> Go strings.TrimSpace semantics
"""

from __future__ import annotations

import re
import unicodedata

# The 15 HTML void elements (utils.go:651-669).
VOID_TAGS = frozenset(
    (
        "area",
        "base",
        "br",
        "col",
        "embed",
        "hr",
        "img",
        "input",
        "keygen",
        "link",
        "meta",
        "param",
        "source",
        "track",
        "wbr",
    )
)

# Go unicode.IsSpace: '\t','\n','\v','\f','\r',' ',U+0085,U+00A0 and category Z.
_GO_SPACE_ASCII = "\t\n\v\f\r \x85\xa0"


def _is_go_space(ch: str) -> bool:
    if ch in _GO_SPACE_ASCII:
        return True
    return unicodedata.category(ch).startswith("Z")


def go_trim_space(s: str) -> str:
    """Go strings.TrimSpace."""
    if s == "" or (not _is_go_space(s[0]) and not _is_go_space(s[-1])):
        return s
    start = 0
    end = len(s)
    while start < end and _is_go_space(s[start]):
        start += 1
    while end > start and _is_go_space(s[end - 1]):
        end -= 1
    return s[start:end]


def _in_xml_character_range(cp: int) -> bool:
    # Go xml.isInCharacterRange: XML 1.0 Char production.
    return (
        cp == 0x09
        or cp == 0x0A
        or cp == 0x0D
        or (0x20 <= cp <= 0xD7FF)
        or (0xE000 <= cp <= 0xFFFD)
        or (0x10000 <= cp <= 0x10FFFF)
    )


def escape_text(s: str) -> str:
    """xq escapeText (utils.go:671-684): Go xml.EscapeText, then
    ``&#34;``->``&quot;``, ``&#39;``->``&apos;``, newline refs -> literal \n.

    Net effect per character:
      " -> &quot;   ' -> &apos;   & -> &amp;   < -> &lt;   > -> &gt;
      \t -> &#x9;   \n -> \n (round-trips)   \r -> &#xD;
      chars outside the XML Char range -> U+FFFD
    """
    if _ESCAPE_NEEDED.search(s) is None:
        return s
    out = []
    for ch in s:
        if ch == '"':
            out.append("&quot;")
        elif ch == "'":
            out.append("&apos;")
        elif ch == "&":
            out.append("&amp;")
        elif ch == "<":
            out.append("&lt;")
        elif ch == ">":
            out.append("&gt;")
        elif ch == "\t":
            out.append("&#x9;")
        elif ch == "\n":
            out.append("\n")
        elif ch == "\r":
            out.append("&#xD;")
        elif not _in_xml_character_range(ord(ch)):
            out.append("�")
        else:
            out.append(ch)
    return "".join(out)


# chars escape_text passes through unchanged: \n, printable ASCII minus
# " & ' < >, and the XML Char ranges above ASCII
_ESCAPE_NEEDED = re.compile(
    "[^\n\x20\x21\x23-\x25\x28-\x3b\x3d\x3f-퟿-�"
    "\U00010000-\U0010ffff]"
)

_RE_HEAD = re.compile(r"^ *\n +")
# \Z not $: Go regexp's $ matches only at true end-of-text, while
# Python's $ also matches before a trailing newline
_RE_TAIL = re.compile(r"\n +\Z")


def normalize_spaces(s: str, indent: str, level: int) -> str:
    """xq normalizeSpaces (utils.go:686-706) — THE whitespace contract.

    - whitespace-only input -> ""
    - leading  ``^ *\\n +``  -> ``\\n + indent*level``
    - trailing ``\\n +$``    -> ``\\n + indent*(level-1)``
    - otherwise strip trailing spaces only
    """
    if go_trim_space(s) == "":
        s = ""

    if _RE_HEAD.search(s):
        s = s.lstrip(" \n")
        s = "\n" + indent * level + s

    if _RE_TAIL.search(s):
        s = s.rstrip(" \n")
        s += "\n" + indent * (level - 1)
    else:
        s = s.rstrip(" ")

    return s


def _go_is_print(ch: str) -> bool:
    # Go unicode.IsPrint: categories L, M, N, P, S plus ASCII space.
    if ch == " ":
        return True
    return unicodedata.category(ch)[0] in "LMNPS"


_QUOTE_ESCAPES = {
    "\a": "\\a",
    "\b": "\\b",
    "\f": "\\f",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\v": "\\v",
    '"': '\\"',
    "\\": "\\\\",
}


# printable ASCII minus '"' and '\\': every char Go's Quote passes
# through verbatim — one C-level regex pass instead of a per-char
# unicodedata.category call for the overwhelmingly common plain case
_RE_QUOTE_PLAIN = re.compile(r'[ !#-\[\]-~]*\Z')


def go_quote(s: str) -> str:
    """Go strconv.Quote — the string quoting used by FormatJson
    (utils.go:505,570). NOT standard JSON escaping: printable Unicode is
    kept raw, non-printables use Go escapes (\\x.., \\u...., \\U........).
    """
    if _RE_QUOTE_PLAIN.match(s):
        return '"' + s + '"'
    out = ['"']
    for ch in s:
        esc = _QUOTE_ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
            continue
        if _go_is_print(ch):
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
