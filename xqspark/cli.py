"""Local CLI — xq-compatible flag surface over the pure-Python core.

``python -m xqspark [flags] [files...]`` mirrors cmd/root.go's interface
so a user of the reference can run the same invocations against this
engine (single-node path; the Spark pipeline is the scale path):

  -x/--xpath QUERY    extract node(s) via XPath
  -e/--extract QUERY  extract a single node
  -q/--query SEL      extract node(s) via CSS selector
  -a/--attr NAME      attribute value for -q
  -n/--node           node content instead of text
  -j/--json           output as JSON (--compact, -d/--depth N)
  -m/--html           force the HTML formatter
  --indent N / --tab  indentation (0-8 spaces / tab)
  -i/--in-place       rewrite files in place
"""

from __future__ import annotations

import argparse
import os
import sys

from .core.api import beautify, css_query, to_json, xpath_query
from .core.config import load_config


def build_parser(defaults) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="xqspark",
        description="XML/HTML beautifier and content extractor (xq-compatible)",
    )
    p.add_argument("files", nargs="*")
    from xqspark import __version__
    p.add_argument("-v", "--version", action="version", version=f"xqspark {__version__}")
    p.add_argument("-x", "--xpath", default="")
    p.add_argument("-e", "--extract", default="")
    p.add_argument("-q", "--query", default="")
    p.add_argument("-a", "--attr", default="")
    p.add_argument("-n", "--node", action="store_true", default=defaults.node)
    p.add_argument("-j", "--json", action="store_true")
    p.add_argument("--compact", action="store_true")
    p.add_argument("-d", "--depth", type=int, default=-1)
    p.add_argument("-m", "--html", action="store_true", default=defaults.html)
    p.add_argument("--indent", type=int, default=defaults.indent)
    p.add_argument("--tab", action="store_true", default=defaults.tab)
    p.add_argument("-i", "--in-place", action="store_true")
    p.add_argument("--no-color", action="store_true")
    p.add_argument("-c", "--color", action="store_true")
    p.add_argument("--no-pager", action="store_true")
    return p


def get_indent(args) -> str:
    if args.indent < 0 or args.indent > 8:
        raise SystemExit("Error: indent should be between 0-8 spaces")
    return "\t" if args.tab else " " * args.indent


def process_one(data: bytes, args, indent: str) -> str:
    if args.xpath:
        return xpath_query(data, args.xpath, False, args.node, indent)
    if args.extract:
        return xpath_query(data, args.extract, True, args.node, indent)
    if args.query:
        return css_query(data, args.query, args.attr, args.node, indent)
    if args.json:
        return to_json(data, args.depth, args.compact, args.html)
    return beautify(data, indent, force_html=args.html)


def main(argv: list[str] | None = None) -> int:
    defaults = load_config(os.path.join(os.path.expanduser("~"), ".xq"))
    args = build_parser(defaults).parse_args(argv)

    if args.attr and not args.query:
        print("Error: query option (-q) is missed for attribute selection", file=sys.stderr)
        return 1
    if (args.xpath or args.extract or args.query) and args.in_place:
        print("Error: in-place formatting is incompatible with nodes selection", file=sys.stderr)
        return 1
    try:
        indent = get_indent(args)
    except SystemExit as exc:
        print(exc, file=sys.stderr)
        return 1

    if args.in_place and not args.files:
        # the reference's in-place branch loops only over file NAMES:
        # stdin input under -i is never processed — exit 0, no output
        # (cmd/root.go:87-109)
        return 0

    payloads: list[tuple[str, bytes]] = []
    if args.files:
        for name in args.files:
            try:
                with open(name, "rb") as fh:
                    payloads.append((name, fh.read()))
            except OSError as exc:
                print(f"Error: {exc}", file=sys.stderr)
                return 1
    else:
        if sys.stdin.isatty():
            build_parser(defaults).print_help()
            return 0
        payloads.append(("-", sys.stdin.buffer.read()))

    if args.in_place:
        # in-place aborts at the first error (cmd/root.go:88-105
        # returns err from inside the loop -> cobra stderr, exit 1)
        for name, data in payloads:
            try:
                out = process_one(data, args, indent)
            except Exception as exc:
                print(f"Error: {exc}", file=sys.stderr)
                return 1
            with open(name, "w", encoding="utf-8", errors="surrogateescape") as fh:
                fh.write(out)
        return 0

    # streaming path: every reader is processed even after an earlier
    # failure, err is REASSIGNED per reader (last error wins), and the
    # error message goes to STDOUT (cmd/root.go:110-129 fmt.Println)
    last_err: Exception | None = None
    for name, data in payloads:
        try:
            sys.stdout.write(process_one(data, args, indent))
            last_err = None
        except Exception as exc:
            last_err = exc
    if last_err is not None:
        print(f"Error: {last_err}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
