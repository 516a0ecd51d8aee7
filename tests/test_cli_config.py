"""CLI + config tests — mirrors cmd/root_test.go:37-108 and config_test.go."""

import pathlib
import subprocess
import sys

import pytest

from xqspark.core.config import load_config

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
XML = str(FIXTURES / "xml" / "unformatted.xml")
HTML = str(FIXTURES / "html" / "unformatted.html")
JSON = str(FIXTURES / "json" / "unformatted.json")


def run(*args, stdin=None):
    return subprocess.run(
        [sys.executable, "-m", "xqspark", *args],
        capture_output=True, text=True, input=stdin,
        cwd=str(pathlib.Path(__file__).parent.parent),
    )


def test_beautify_file():
    r = run(XML)
    assert r.returncode == 0
    assert "This is not a real user" in r.stdout
    golden = (FIXTURES / "xml" / "formatted.xml").read_text()
    assert r.stdout == golden


def test_indent_zero():
    r = run("--indent", "0", XML)
    assert r.returncode == 0
    assert "\n" not in r.stdout.strip()


def test_indent_out_of_range():
    r = run("--indent", "-1", XML)
    assert r.returncode == 1
    assert "indent should be" in r.stderr


def test_tab():
    r = run("--tab", XML)
    assert "\t" in r.stdout


def test_html_force():
    r = run("-m", HTML)
    assert "<html>" in r.stdout


def test_json_file():
    r = run(JSON)
    assert r.stdout.startswith("{")


def test_css():
    r = run("-q", "body > p", HTML)
    assert r.returncode == 0
    assert "text" in r.stdout


def test_xpath_attr():
    r = run("-x", "/user/@status", XML)
    assert r.stdout.strip() == "active"


def test_attr_requires_query():
    r = run("-a", "href", XML)
    assert r.returncode == 1
    assert "query option (-q) is missed" in r.stderr


def test_inplace_incompatible():
    r = run("-x", "//a", "-i", XML)
    assert r.returncode == 1
    assert "in-place formatting is incompatible" in r.stderr


def test_stdin():
    r = run("-x", "//city", stdin='<a><city>Bellville</city></a>')
    assert r.stdout.strip() == "Bellville"


def test_nonexistent_file():
    r = run("nonexistent.xml")
    assert r.returncode == 1


def test_json_depth():
    r = run("-j", "-d", "1", stdin="<root><child1><grandchild>value</grandchild></child1></root>")
    assert '"child1": "value"' in r.stdout


def test_json_compact():
    r = run("-j", "--compact", stdin="<root><c>v</c></root>")
    assert r.stdout == '{"root": {"c": "v"}}\n'


def test_load_config(tmp_path):
    cfg_file = tmp_path / "cfg"
    cfg_file.write_text("# config\nindent = 8\nno-color = 1\nno-pager = 1\n")
    cfg = load_config(str(cfg_file))
    assert cfg.indent == 8 and cfg.no_color and cfg.no_pager

    empty = tmp_path / "empty"
    empty.write_text("# empty config\n")
    cfg = load_config(str(empty))
    assert cfg.indent == 2 and not cfg.no_color

    missing = load_config(str(tmp_path / "missing"))
    assert missing.indent == 2


def test_load_config_reference_fixtures():
    """Byte-identical mirrors of the reference fixtures
    (test/data/config/config{1,2}), pinned to the same assertions as
    internal/utils/config_test.go:12-24."""
    import os

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures", "config")
    cfg = load_config(os.path.join(fixdir, "config1"))
    assert cfg.indent == 8 and cfg.no_color and cfg.no_pager
    cfg = load_config(os.path.join(fixdir, "config2"))
    assert cfg.indent == 2


def test_readme_examples_parity():
    """The reference README's example invocations (README.md:25-104)."""
    H, X = HTML.replace("unformatted", "unformatted"), XML
    r = run("-q", "head > script", "-a", "src", H)
    assert r.stdout == "foo.js\nbar.js\nbaz.js\n"
    r = run("-n", "-q", "head", H)
    assert r.stdout == (
        "<head>\n  <title>Test</title>\n"
        '  <script src="foo.js"></script>\n'
        '  <script src="bar.js"></script>\n'
        '  <script src="baz.js"></script>\n</head>\n'
    )
    r = run("-j", X)
    assert '"city": "Bellville"' in r.stdout and r.stdout.startswith("{")
    # multi-file sequential concat (cmd/root.go:116-124)
    r = run(X, str(FIXTURES / "xml" / "unformatted5.xml"))
    assert r.stdout.endswith("</user>\n<root/>\n")


def test_in_place_stdin_noop():
    # -i with stdin: the reference loops only over file names — exit 0,
    # no output, input not processed (cmd/root.go:87-109)
    r = run("-i", stdin="<a")
    assert r.returncode == 0 and r.stdout == ""


def test_multi_file_continues_after_error(tmp_path):
    # the streaming loop processes EVERY reader; err is reassigned per
    # reader so a later success clears an earlier failure (exit 0), and
    # processing errors print to STDOUT (cmd/root.go:110-129)
    bad = tmp_path / "bad.xml"
    bad.write_text("<a")
    good = tmp_path / "good.xml"
    good.write_text("<r><c>v</c></r>")
    r = run(str(bad), str(good))
    assert "<r>" in r.stdout  # the good file still formatted
    assert r.returncode == 0  # last err wins: success overwrote it

    r2 = run(str(good), str(bad))
    assert "<r>" in r2.stdout
    assert r2.returncode == 1
    assert "Error:" in r2.stdout  # reference prints via fmt.Println
