"""JSON beautify goldens — mirrors internal/utils/utils_test.go:109-154."""

import pathlib

import pytest

from xqspark.core.fmt_json import JsonSyntaxError, format_json

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "json"


@pytest.mark.parametrize(
    "src,expected",
    [(f"unformatted{n}.json", f"formatted{n}.json") for n in ["", 2, 3]],
)
def test_format_json_golden(src, expected):
    data = (FIXTURES / src).read_bytes()
    want = (FIXTURES / expected).read_bytes().decode("utf-8")
    assert format_json(data, "  ") == want


@pytest.mark.parametrize(
    "src,expected",
    [
        ("{}", "{}\n"),
        ("[]", "[]\n"),
        ('{"a":{},"b":[]}', '{\n  "a": {},\n  "b": []\n}\n'),
        ("[{},[]]", "[\n  {},\n  []\n]\n"),
    ],
)
def test_format_json_inline(src, expected):
    assert format_json(src, "  ") == expected


def test_format_json_malformed():
    with pytest.raises(JsonSyntaxError):
        format_json('{"a":', "  ")
