"""Format sniffing — xq's detectFormat (cmd/root.go:247-270).

The first 10 bytes decide: JSON (``^\\s*[{\\[]``, utils.go:612-616), HTML
(lowercased prefix contains "html" | "<!d" | "<body", utils.go:599-610),
else XML. A read error (empty input) is Text.
"""

from __future__ import annotations

import re

CONTENT_XML = "xml"
CONTENT_HTML = "html"
CONTENT_JSON = "json"
CONTENT_TEXT = "text"

# Go regexp \s is ASCII-only ([\t\n\f\r ])
_RE_JSON = re.compile(r"^[ \t\n\f\r]*[{\[]")
_HTML_MARKERS = ("html", "<!d", "<body")


def is_json(prefix: str) -> bool:
    return _RE_JSON.search(prefix.lower()) is not None


def is_html(prefix: str) -> bool:
    low = prefix.lower()
    return any(marker in low for marker in _HTML_MARKERS)


def detect_format(data: bytes | str, force_html: bool = False) -> str:
    if force_html:
        return CONTENT_HTML
    if isinstance(data, bytes):
        prefix = data[:10].decode("utf-8", errors="replace")
    else:
        prefix = data[:10]
    if prefix == "":
        return CONTENT_TEXT
    if is_json(prefix):
        return CONTENT_JSON
    if is_html(prefix):
        return CONTENT_HTML
    return CONTENT_XML
