"""WARC (ISO 28500) record parsing — the Common-Crawl source format.

Pure Python, Spark-free, from the PUBLIC spec (WARC/1.0 and 1.1: a
record is a version line, CRLF header lines, a blank line, then
Content-Length payload bytes followed by two CRLFs). Common Crawl
ships .warc.gz with ONE gzip member per record, concatenated;
``gzip.decompress`` handles multi-member streams, so callers can
decompress the whole file and parse the concatenation.

Lenient by design for crawl reality: a truncated trailing record is
dropped (crawlers get cut off mid-write), unknown headers pass
through, and header names are case-insensitive per the spec. The
writer (``build_warc``) exists for tests and round-trip pinning.
"""

from __future__ import annotations


class WarcError(ValueError):
    """Structurally invalid WARC data (not mere truncation)."""


def parse_warc(data: bytes):
    """Yield (headers, payload) per record; headers is a dict with
    LOWERCASED names (latin-1 decoded, per the spec's octet rules).
    Truncated trailing records are dropped silently."""
    pos = 0
    n = len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        eol = data.find(b"\r\n", pos)
        if eol == -1:
            break  # truncated version line
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise WarcError(f"bad record header at byte {pos}: {version[:20]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(b"\r\n", pos)
            if eol == -1:
                return  # truncated header block
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcError(f"missing/bad Content-Length at {pos}") from exc
        if pos + length > n:
            return  # truncated payload
        yield headers, data[pos : pos + length]
        pos += length


def http_response_body(payload: bytes) -> bytes:
    """Body of an HTTP response payload (everything after the first
    blank line); the whole payload if no header block is present."""
    idx = payload.find(b"\r\n\r\n")
    if idx == -1:
        return payload
    return payload[idx + 4 :]


def build_warc(records) -> bytes:
    """Serialize (uri, iso_date, html_bytes) triples as WARC/1.0
    response records with a minimal HTTP/1.1 wrapper — enough for
    round-trip tests and deterministic corpora."""
    out = []
    for uri, date, body in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            "\r\n"
        ).encode("latin-1")  # the reader decodes latin-1 (spec octet
        # rule) — utf-8 here would mojibake non-ASCII URIs on the
        # round-trip this writer exists to pin; URIs with chars outside
        # latin-1 must be percent-encoded by the caller (as real
        # crawlers do)
        out.append(header + http + b"\r\n\r\n")
    return b"".join(out)
