"""WHATWG character-reference decoding (x/net/html unescape semantics).

The reference's HTML path unescapes entities via golang.org/x/net/html
(full WHATWG named-character-reference table, with attribute-mode rules).
Python's ``html.entities.html5`` ships the same table, so decoding here is
table-identical; we add the attribute-mode exception (a named reference
without a trailing semicolon is NOT decoded when followed by ``=`` or an
alphanumeric) and the Windows-1252 numeric remapping.
"""

from __future__ import annotations

import re
from html.entities import html5 as _HTML5

# Longest-match table split: names with and without trailing semicolons.
_MAX_NAME_LEN = max(len(k) for k in _HTML5)

# WHATWG numeric-reference replacements (x/net/html replacementTable):
# C1 control range 0x80-0x9F remaps to Windows-1252.
_REPLACEMENTS = {
    0x00: "�", 0x80: "€", 0x82: "‚", 0x83: "ƒ",
    0x84: "„", 0x85: "…", 0x86: "†", 0x87: "‡",
    0x88: "ˆ", 0x89: "‰", 0x8A: "Š", 0x8B: "‹",
    0x8C: "Œ", 0x8E: "Ž", 0x91: "‘", 0x92: "’",
    0x93: "“", 0x94: "”", 0x95: "•", 0x96: "–",
    0x97: "—", 0x98: "˜", 0x99: "™", 0x9A: "š",
    0x9B: "›", 0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}

# x/net/html consumes ALL digits, then range-checks (overflow -> U+FFFD)
_RE_NUMERIC = re.compile(r"#([0-9]+)|#[xX]([0-9a-fA-F]+)")


def _decode_numeric(num: int) -> str:
    if num in _REPLACEMENTS:
        return _REPLACEMENTS[num]
    if 0xD800 <= num <= 0xDFFF or num > 0x10FFFF:
        return "�"
    return chr(num)


def unescape(s: str, in_attr: bool = False) -> str:
    """Decode &-references per WHATWG rules (x/net/html escape.go unescape)."""
    if "&" not in s:
        return s
    out: list[str] = []
    i = 0
    n = len(s)
    while True:
        amp = s.find("&", i)
        if amp == -1:
            out.append(s[i:])
            break
        out.append(s[i:amp])
        i = amp + 1
        if i >= n:
            out.append("&")
            break
        if s[i] == "#":
            m = _RE_NUMERIC.match(s, i)
            if m is None:
                out.append("&")
                continue
            end = m.end()
            num = int(m.group(1)) if m.group(1) is not None else int(m.group(2), 16)
            if end < n and s[end] == ";":
                end += 1
            out.append(_decode_numeric(num))
            i = end
            continue
        # Named reference: longest match wins, semicolon forms preferred.
        chunk = s[i : i + _MAX_NAME_LEN]
        match_name = None
        for ln in range(min(len(chunk), _MAX_NAME_LEN), 0, -1):
            cand = chunk[:ln]
            if cand in _HTML5:
                match_name = cand
                break
        if match_name is None:
            out.append("&")
            continue
        if not match_name.endswith(";") and in_attr:
            nxt = i + len(match_name)
            if nxt < n and (
                s[nxt] == "="
                or ("a" <= s[nxt] <= "z")
                or ("A" <= s[nxt] <= "Z")
                or ("0" <= s[nxt] <= "9")
            ):
                out.append("&")
                continue
        out.append(_HTML5[match_name])
        i += len(match_name)
    return "".join(out)
