"""HTML beautify golden pairs — mirrors internal/utils/utils_test.go:83-107."""

import pathlib

import pytest

from xqspark.core.fmt_html import format_html

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "html"

PAIRS = [(f"unformatted{n}.html", f"formatted{n}.html") for n in [""] + list(range(2, 8))]
PAIRS.append(("unformatted.xml", "formatted.xml"))


@pytest.mark.parametrize("src,expected", PAIRS)
def test_format_html_golden(src, expected):
    data = (FIXTURES / src).read_bytes()
    want = (FIXTURES / expected).read_bytes().decode("utf-8")
    assert format_html(data, "  ") == want
