"""JSON beautifier — byte-identical to xq's FormatJson.

Re-expression of internal/utils/utils.go:447-597: a token-stream
pretty-printer where

- number lexemes are preserved verbatim (decoder.UseNumber, utils.go:449,
  printed raw at utils.go:571-572)
- strings are re-quoted with Go strconv.Quote rules (utils.go:505,570) —
  NOT standard JSON escaping (see textutil.go_quote)
- empty containers stay inline (utils.go:522-525,562-565)
- output ends with a newline (utils.go:596)

Also provides ``format_value`` — the composition json.Marshal -> FormatJson
used by the -j pipeline (cmd/root.go:331-340): Go's Marshal sorts object
keys, so dict output is key-sorted.
"""

from __future__ import annotations

import math
import sys

from .textutil import go_quote

# Go's json scanner allows 10000 nested levels (maxNestingDepth) before
# erroring; format_token recurses one frame per level. The limit check
# lives in format_json itself, NOT at import: third-party imports (jedi
# sets 3000 unconditionally) can clobber a process-global value set here.
_NEEDED_RECURSION_LIMIT = 25000


class JsonSyntaxError(ValueError):
    pass


_WS = " \t\r\n"


class _Lexer:
    def __init__(self, s: str):
        self.s = s
        self.pos = 0
        self.n = len(s)
        self._peeked = None

    def peek(self):
        if self._peeked is None:
            self._peeked = self._lex()
        return self._peeked

    def next(self):
        tok = self.peek()
        self._peeked = None
        return tok

    def _lex(self):
        s, n = self.s, self.n
        while self.pos < n and s[self.pos] in _WS:
            self.pos += 1
        if self.pos >= n:
            return ("eof", None)
        c = s[self.pos]
        if c in "{}[]:,":
            self.pos += 1
            return ("delim", c)
        if c == '"':
            return ("string", self._string())
        if c == "-" or c in "0123456789":
            return ("number", self._number())
        for word, tok in (("true", ("bool", True)), ("false", ("bool", False)),
                          ("null", ("null", None))):
            if s.startswith(word, self.pos):
                end = self.pos + len(word)
                if end < n and s[end] not in " \t\r\n{}[]:,\"":
                    raise JsonSyntaxError("invalid character after literal")
                self.pos = end
                return tok
        raise JsonSyntaxError(f"invalid character {c!r} looking for beginning of value")

    def _string(self) -> str:
        s, n = self.s, self.n
        self.pos += 1
        out: list[str] = []
        while True:
            if self.pos >= n:
                raise JsonSyntaxError("unexpected end of JSON input")
            c = s[self.pos]
            if c == '"':
                self.pos += 1
                return "".join(out)
            if c == "\\":
                self.pos += 1
                if self.pos >= n:
                    raise JsonSyntaxError("unexpected end of JSON input")
                e = s[self.pos]
                self.pos += 1
                if e == "u":
                    hexs = s[self.pos : self.pos + 4]
                    if len(hexs) < 4 or any(
                        c not in "0123456789abcdefABCDEF" for c in hexs
                    ):
                        raise JsonSyntaxError("invalid \\u escape")
                    cp = int(hexs, 16)
                    self.pos += 4
                    if 0xD800 <= cp <= 0xDBFF and s.startswith("\\u", self.pos):
                        try:
                            lo = int(s[self.pos + 2 : self.pos + 6], 16)
                        except ValueError:
                            lo = -1
                        if 0xDC00 <= lo <= 0xDFFF:
                            self.pos += 6
                            cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                            out.append(chr(cp))
                            continue
                        out.append("�")  # Go unquote: unpaired surrogate
                        continue
                    if 0xD800 <= cp <= 0xDFFF:
                        out.append("�")
                        continue
                    out.append(chr(cp))
                elif e in '"\\/':
                    out.append(e)
                elif e == "b":
                    out.append("\b")
                elif e == "f":
                    out.append("\f")
                elif e == "n":
                    out.append("\n")
                elif e == "r":
                    out.append("\r")
                elif e == "t":
                    out.append("\t")
                else:
                    raise JsonSyntaxError(f"invalid character {e!r} in string escape code")
                continue
            if ord(c) < 0x20:
                raise JsonSyntaxError("invalid character in string literal")
            out.append(c)
            self.pos += 1

    def _number(self) -> str:
        s, n = self.s, self.n
        start = self.pos
        digits = "0123456789"
        if s[self.pos] == "-":
            self.pos += 1
        if self.pos >= n or s[self.pos] not in digits:
            raise JsonSyntaxError("invalid number")
        if s[self.pos] == "0":
            self.pos += 1
        else:
            while self.pos < n and s[self.pos] in digits:
                self.pos += 1
        if self.pos < n and s[self.pos] == ".":
            self.pos += 1
            if self.pos >= n or s[self.pos] not in digits:
                raise JsonSyntaxError("invalid number")
            while self.pos < n and s[self.pos] in digits:
                self.pos += 1
        if self.pos < n and s[self.pos] in "eE":
            self.pos += 1
            if self.pos < n and s[self.pos] in "+-":
                self.pos += 1
            if self.pos >= n or s[self.pos] not in digits:
                raise JsonSyntaxError("invalid number")
            while self.pos < n and s[self.pos] in digits:
                self.pos += 1
        # Go errors on a value butted directly against the next one
        # ("invalid character ... after top-level value")
        if self.pos < n and s[self.pos] not in " \t\r\n{}[]:,\"":
            raise JsonSyntaxError("invalid character after number")
        return s[start:self.pos]


def format_json(data: bytes | str, indent: str = "  ") -> str:
    """Beautify JSON preserving number lexemes (FormatJson, utils.go:447-597).

    NOTE: temporarily raises the process-global recursion limit for deep
    documents and restores it afterwards. Safe in Spark's single-threaded
    Python workers (this library's execution context); in a multi-threaded
    embedder, a concurrent thread deep in recursion could observe the
    restore — raise sys.setrecursionlimit process-wide up front instead.
    """
    prev_limit = sys.getrecursionlimit()
    if prev_limit < _NEEDED_RECURSION_LIMIT:
        sys.setrecursionlimit(_NEEDED_RECURSION_LIMIT)
        try:
            return _format_json_inner(data, indent)
        finally:
            sys.setrecursionlimit(prev_limit)
    return _format_json_inner(data, indent)


def _format_json_inner(data: bytes | str, indent: str) -> str:
    if isinstance(data, bytes):
        # Go's json decoder coerces invalid UTF-8 in strings to U+FFFD
        data = data.decode("utf-8", errors="replace")
    lex = _Lexer(data)
    newline = "\n" if indent != "" else ""
    out: list[str] = []
    write = out.append

    def format_token(level: int) -> None:
        kind, val = lex.next()
        if kind == "delim" and val == "{":
            write("{")
            level += 1
            if level > 10000:
                raise JsonSyntaxError("exceeded max depth")
            index = 0
            while True:
                kind2, val2 = lex.peek()
                if kind2 == "delim" and val2 == "}":
                    lex.next()
                    break
                if index > 0:
                    if not (kind2 == "delim" and val2 == ","):
                        raise JsonSyntaxError("expected comma in object")
                    lex.next()
                    kind2, val2 = lex.peek()
                    write("," + newline)
                else:
                    write(newline)
                write(indent * level)
                kkind, key = lex.next()
                if kkind != "string":
                    raise JsonSyntaxError(f"expected JSON object key, got {kkind}")
                ckind, cval = lex.next()
                if not (ckind == "delim" and cval == ":"):
                    raise JsonSyntaxError("expected colon after object key")
                write(go_quote(key) + ": ")
                format_token(level)
                index += 1
            level -= 1
            if index > 0:
                write(newline + indent * level + "}")
            else:
                write("}")
        elif kind == "delim" and val == "[":
            write("[")
            level += 1
            if level > 10000:
                raise JsonSyntaxError("exceeded max depth")
            index = 0
            while True:
                kind2, val2 = lex.peek()
                if kind2 == "delim" and val2 == "]":
                    lex.next()
                    break
                if index > 0:
                    if not (kind2 == "delim" and val2 == ","):
                        raise JsonSyntaxError("expected comma in array")
                    lex.next()
                    write("," + newline)
                else:
                    write(newline)
                write(indent * level)
                format_token(level)
                index += 1
            level -= 1
            if index > 0:
                write(newline + indent * level + "]")
            else:
                write("]")
        elif kind == "string":
            write(go_quote(val))
        elif kind == "number":
            write(val)
        elif kind == "bool":
            write("true" if val else "false")
        elif kind == "null":
            write("null")
        elif kind == "eof":
            raise JsonSyntaxError("unexpected end of JSON input")
        else:
            raise JsonSyntaxError(f"unexpected JSON delimiter {val!r}")

    while True:
        kind, _ = lex.peek()
        if kind == "eof":
            break
        format_token(0)

    write("\n")
    return "".join(out)


def go_float_str(f: float) -> str:
    """Go encoding/json float64 formatting (shortest round-trip, 'e' only
    when exponent < -6 or >= 21)."""
    if math.isnan(f) or math.isinf(f):
        raise JsonSyntaxError("unsupported value")
    if f == 0:
        return "-0" if math.copysign(1.0, f) < 0 else "0"
    if f == int(f) and abs(f) < 2**53:
        # exact integers; larger integral floats use shortest-round-trip
        return str(int(f))
    r = repr(f)
    if "e" in r:
        mant, exp = r.split("e")
        iexp = int(exp)
        if -7 < iexp < 21:
            # expand the shortest-round-trip mantissa to fixed point
            # verbatim (no re-rounding): Go uses 'f' form in this range
            neg = mant.startswith("-")
            digits = mant.lstrip("-").replace(".", "")
            point = len(mant.lstrip("-").split(".")[0])  # digits before '.'
            point += iexp
            if point <= 0:
                body = "0." + "0" * (-point) + digits
            elif point >= len(digits):
                body = digits + "0" * (point - len(digits))
            else:
                body = digits[:point] + "." + digits[point:]
            return ("-" if neg else "") + body
        # Go strconv 'e' form pads positive exponents to two digits but
        # prints negative single-digit exponents unpadded (1e-07 -> 1e-07 is
        # wrong: Go emits 1e-07 only for |exp| >= 10; -7..-9 print as e-7)
        if iexp < 0:
            return f"{mant}e-{abs(iexp)}"
        return f"{mant}e+{iexp:02d}"
    if r.endswith(".0"):
        # Go never prints a trailing .0 for integral values
        return r[:-2]
    return r


def format_value(obj, indent: str = "  ", level: int = 0) -> str:
    """Serialize a Python value exactly as Go json.Marshal -> FormatJson
    would (cmd/root.go:331-340): dict keys sorted, strconv.Quote strings,
    empty containers inline. ``obj`` values: dict/list/str/float/int/bool/None.
    """
    newline = "\n" if indent != "" else ""
    if obj is None:
        return "null"
    if obj is True:
        return "true"
    if obj is False:
        return "false"
    if isinstance(obj, str):
        return go_quote(obj)
    if isinstance(obj, float):
        return go_float_str(obj)
    if isinstance(obj, int):
        return str(obj)
    if isinstance(obj, dict):
        if not obj:
            return "{}"
        parts = []
        for key in sorted(obj.keys()):
            parts.append(
                indent * (level + 1)
                + go_quote(key)
                + ": "
                + format_value(obj[key], indent, level + 1)
            )
        return "{" + newline + ("," + newline).join(parts) + newline + indent * level + "}"
    if isinstance(obj, (list, tuple)):
        if not obj:
            return "[]"
        parts = [
            indent * (level + 1) + format_value(item, indent, level + 1) for item in obj
        ]
        return "[" + newline + ("," + newline).join(parts) + newline + indent * level + "]"
    raise JsonSyntaxError(f"unsupported type: {type(obj)}")
