"""Vectorized Arrow/pandas UDFs wrapping the pure-Python core.

Per the input_hint contract: pandas/Arrow UDFs throughout, never per-row
Python UDFs. Queries (XPath/CSS) compile ONCE per UDF instantiation —
hoisted out of the per-row path exactly like the reference compiles before
iterating (internal/utils/utils.go:239-244).

Per-document errors are contained (lenient parsing + try/except -> None /
error string), never task failures — the Spark analog of the reference's
recover() on XPath panics (utils.go:211-215) at 10^12-document scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from xqspark.core.api import beautify, css_query, to_json, xpath_query
from xqspark.core.dom import parse_dom
from xqspark.core.fmt_html import format_html
from xqspark.core.fmt_json import format_json
from xqspark.core.fmt_xml import format_xml
from xqspark.core.textutil import go_trim_space
from xqspark.core.xpath import compile_xpath, string_value


def _as_payload(v):
    if v is None:
        return None
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v)
    return str(v)


def _series_map(series: pd.Series, fn) -> pd.Series:
    """Apply fn per document inside the Arrow batch; None on error."""
    out = []
    for v in series:
        payload = _as_payload(v)
        if payload is None:
            out.append(None)
            continue
        try:
            out.append(fn(payload))
        except Exception:
            out.append(None)
    return pd.Series(out, dtype=object)


def make_format_xml_udf(indent: str = "  "):
    @pandas_udf(T.StringType())
    def fmt(html: pd.Series) -> pd.Series:
        return _series_map(html, lambda p: format_xml(p, indent))

    return fmt


def make_format_html_udf(indent: str = "  "):
    @pandas_udf(T.StringType())
    def fmt(html: pd.Series) -> pd.Series:
        return _series_map(html, lambda p: format_html(p, indent))

    return fmt


def make_format_json_udf(indent: str = "  "):
    @pandas_udf(T.StringType())
    def fmt(payload: pd.Series) -> pd.Series:
        return _series_map(payload, lambda p: format_json(p, indent))

    return fmt


def make_beautify_udf(indent: str = "  "):
    """Format-sniffing beautifier (processContent, cmd/root.go:272-294)."""

    @pandas_udf(T.StringType())
    def fmt(payload: pd.Series) -> pd.Series:
        return _series_map(payload, lambda p: beautify(p, indent))

    return fmt


def make_xpath_values_udf(query: str):
    """extract_xpath: ArrayType(StringType) — one trimmed string-value per
    matched node (utils.go:253-260); a scalar result (count()/boolean()/
    string()) becomes a 1-element list printed with the same rules as the
    -x output (utils.go:246-251). The query compiles ONCE here, at factory
    time, and ships to every worker inside the UDF closure (the analog of
    the reference compiling before iterating, utils.go:239-244) — not once
    per Arrow batch."""
    from xqspark.core.api import _go_percent_0f

    expr = compile_xpath(query)

    @pandas_udf(T.ArrayType(T.StringType()))
    def extract(html: pd.Series) -> pd.Series:
        def one(payload):
            doc = parse_dom(payload, strict=False)
            val = expr.evaluate(doc)
            if isinstance(val, list):
                return [go_trim_space(string_value(n)) for n in val]
            if isinstance(val, bool):
                return ["true" if val else "false"]
            if isinstance(val, float):
                return [_go_percent_0f(val)]
            return [go_trim_space(str(val))]

        return _series_map(html, one)

    return extract


def make_xpath_output_udf(query: str, single: bool = False, with_tags: bool = False,
                          indent: str = "  "):
    """Full xq-printed output for -x/-e/-n (byte-identical text column)."""

    @pandas_udf(T.StringType())
    def extract(html: pd.Series) -> pd.Series:
        return _series_map(
            html, lambda p: xpath_query(p, query, single, with_tags, indent)
        )

    return extract


def make_xpath_spans_udf(query: str):
    """extract(html, xpath) -> spans map (north rule: "text/spans maps"):
    per matched node, the trimmed string-value PLUS its (start, end)
    character offsets in the decoded document. Offsets are located by a
    forward scan (each match searched at-or-after the previous match's
    end), which is deterministic and correct whenever node order follows
    document order — XPath node-sets do. A value the scan cannot locate
    (entity-decoded text differing from the source bytes) gets -1/-1
    rather than a guess."""
    from xqspark.core.charset import decode_payload

    expr = compile_xpath(query)
    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("text", T.StringType()),
                T.StructField("start", T.IntegerType()),
                T.StructField("end", T.IntegerType()),
            ]
        )
    )

    @pandas_udf(out_type)
    def extract(html: pd.Series) -> pd.Series:
        def one(payload):
            text = decode_payload(payload) if isinstance(payload, bytes) else payload
            doc = parse_dom(payload, strict=False)
            val = expr.evaluate(doc)
            if not isinstance(val, list):
                return []
            out = []
            cursor = 0
            for node in val:
                sv = go_trim_space(string_value(node))
                idx = text.find(sv, cursor) if sv else -1
                if idx == -1:
                    out.append((sv, -1, -1))
                else:
                    out.append((sv, idx, idx + len(sv)))
                    cursor = idx + len(sv)
            return out

        return _series_map(html, one)

    return extract


def make_css_values_udf(selector: str, attr: str = ""):
    """extract_css / extract_css_attr: ArrayType(StringType). The selector
    compiles ONCE at factory time and ships in the closure — not per batch."""
    from xqspark.core.css import compile_css
    from xqspark.core.htmltree import parse_html

    sel = compile_css(selector)

    @pandas_udf(T.ArrayType(T.StringType()))
    def extract(html: pd.Series) -> pd.Series:
        def one(payload):
            doc = parse_html(payload)
            out = []
            for item in sel.select(doc):
                if attr:
                    value = ""
                    for a in item.attrs:
                        if a.local == attr:
                            value = a.value
                            break
                    out.append(go_trim_space(value))
                else:
                    out.append(go_trim_space(item.inner_text()))
            return out

        return _series_map(html, one)

    return extract


def make_robots_udf(user_agent: str = "xqbot"):
    """RFC 9309 decisions: (robots_txt string, paths array) -> aligned
    array<boolean>. The robots text is parsed ONCE per row and applied
    to every path (crawl frontiers check many URLs per host)."""
    from xqspark.core.robots import parse_robots

    @pandas_udf(T.ArrayType(T.BooleanType()))
    def check(robots: pd.Series, paths: pd.Series) -> pd.Series:
        out = []
        for text, ps in zip(robots, paths):
            rules = parse_robots(text or "")
            out.append([rules.is_allowed(user_agent, p) for p in ps])
        return pd.Series(out, index=robots.index, dtype="object")

    return check


def make_link_pairs_udf(selector: str = "a", attr: str = "href"):
    """Outlink extraction for web-graph construction: ONE parse per page
    yields (attr value, anchor inner-text) pairs for every element the
    selector matches, in document order. Selector compiles at factory
    time; output array<struct> keeps the pair aligned without a second
    parse (two separate css UDF calls would parse the page twice)."""
    from xqspark.core.css import compile_css
    from xqspark.core.htmltree import parse_html

    sel = compile_css(selector)
    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("href", T.StringType()),
                T.StructField("anchor", T.StringType()),
            ]
        )
    )

    @pandas_udf(out_type)
    def extract(html: pd.Series) -> pd.Series:
        def one(payload):
            doc = parse_html(payload)
            out = []
            for item in sel.select(doc):
                value = ""
                for a in item.attrs:
                    if a.local == attr:
                        value = a.value
                        break
                out.append(
                    (go_trim_space(value), go_trim_space(item.inner_text()))
                )
            return out

        return _series_map(html, one)

    return extract


def make_css_output_udf(selector: str, attr: str = "", with_tags: bool = False,
                        indent: str = "  "):
    @pandas_udf(T.StringType())
    def extract(html: pd.Series) -> pd.Series:
        return _series_map(
            html, lambda p: css_query(p, selector, attr, with_tags, indent)
        )

    return extract


def make_main_content_udf():
    """Boilerplate-stripping main-content extraction (DOM text-density
    heuristic, xqspark/core/maincontent.py) as a vectorized pandas UDF."""
    from xqspark.core.maincontent import main_text

    @pandas_udf(T.StringType())
    def extract(html: pd.Series) -> pd.Series:
        return _series_map(html, main_text)

    return extract


def make_xml_to_json_udf(depth: int = -1, compact: bool = False):
    @pandas_udf(T.StringType())
    def convert(payload: pd.Series) -> pd.Series:
        return _series_map(payload, lambda p: to_json(p, depth, compact))

    return convert


def content_type_col(col):
    """Vectorized format sniffing as a Catalyst expression — the Spark
    analog of the 10-byte dispatch (cmd/root.go:247-270). Stays JVM-side.

    The window is the first 10 BYTES (like core detect_format and the Go
    reference), not 10 characters — a multibyte prefix must not widen it.
    All markers are ASCII, so byte-wise string ops on the sliced prefix
    match core's decode-with-replacement semantics. NULL stays NULL."""
    prefix = F.lower(F.substring(col.cast("binary"), 1, 10).cast("string"))
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(F.length(prefix) == 0, F.lit("text"))
        # Go regexp \s is ASCII-only (no \v, unlike Java \s)
        .when(prefix.rlike(r"^[ \t\n\f\r]*[\{\[]"), F.lit("json"))
        .when(
            prefix.contains("html") | prefix.contains("<!d") | prefix.contains("<body"),
            F.lit("html"),
        )
        .otherwise(F.lit("xml"))
    )


def declared_charset_col(col):
    """Vectorized xml-decl charset sniff (utils.go:708-717 analog)."""
    # anchored to the XML declaration only (Go inspects just the decl,
    # utils.go:708-717) — a bare encoding= elsewhere must not match.
    # Like charset.declared_encoding (_RE_DECL), tolerate an optional UTF-8
    # BOM and leading whitespace before the declaration.
    # the whitespace AFTER '<?xml' is required (charset._RE_DECL): a
    # '<?xml-stylesheet ... encoding=..?>' PI is NOT a declaration
    return F.regexp_extract(
        F.substring(col.cast("string"), 1, 200),
        "^\\ufeff?[ \\t\\r\\n]*<\\?xml[ \\t\\r\\n][^>]*encoding=[\"']([^\"']+)[\"']",
        1,
    )
