"""XML beautify golden-pair tests — mirrors internal/utils/utils_test.go:47-81."""

import pathlib

import pytest

from xqspark.core.fmt_xml import format_xml

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "xml"

PAIRS = [(f"unformatted{n}.xml", f"formatted{n}.xml") for n in [""] + list(range(2, 19))]


@pytest.mark.parametrize("src,expected", PAIRS)
def test_format_xml_golden(src, expected):
    data = (FIXTURES / src).read_bytes()
    want = (FIXTURES / expected).read_bytes().decode("utf-8")
    assert format_xml(data, "  ") == want
