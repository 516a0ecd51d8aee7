"""RFC 9309 Robots Exclusion Protocol semantics (core/robots.py)."""

from xqspark.core.robots import parse_robots

RFC_EXAMPLE = """
# comment line
User-agent: otherbot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp1$
Disallow: /*.zip$
Allow: /
Crawl-delay: 10
"""


def test_group_selection_exact_beats_star():
    r = parse_robots(RFC_EXAMPLE)
    # otherbot gets its own group (everything disallowed)
    assert r.is_allowed("otherbot", "/anything") is False
    # any other UA falls to '*'
    assert r.is_allowed("xqbot", "/page") is True


def test_longest_match_and_allow_tiebreak():
    r = parse_robots(RFC_EXAMPLE)
    assert r.is_allowed("xqbot", "/private/x") is False  # /private (8) > / (1)
    assert r.is_allowed("xqbot", "/private/ok/y") is True  # allow (11) wins
    # RFC 9309: equal-length patterns BOTH matching -> allow wins,
    # regardless of rule order
    t = parse_robots("User-agent: *\nDisallow: /fold\nAllow: /fold\n")
    assert t.is_allowed("b", "/fold/x") is True
    t = parse_robots("User-agent: *\nAllow: /fold\nDisallow: /fold\n")
    assert t.is_allowed("b", "/fold/x") is True


def test_dollar_anchor_and_wildcard():
    r = parse_robots(RFC_EXAMPLE)
    assert r.is_allowed("xqbot", "/tmp1") is False  # $ exact
    assert r.is_allowed("xqbot", "/tmp1x") is True  # anchor fails
    assert r.is_allowed("xqbot", "/deep/file.zip") is False  # /*.zip$
    assert r.is_allowed("xqbot", "/file.zipx") is True


def test_defaults_and_edge_cases():
    # no groups at all -> everything allowed
    assert parse_robots("").is_allowed("b", "/x") is True
    # group exists but no rule matches -> allowed
    r = parse_robots("User-agent: *\nDisallow: /priv\n")
    assert r.is_allowed("b", "/pub") is True
    # empty Disallow means no restriction
    r = parse_robots("User-agent: *\nDisallow:\n")
    assert r.is_allowed("b", "/x") is True
    # multiple User-agent lines share one group
    r = parse_robots("User-agent: a\nUser-agent: b\nDisallow: /\n")
    assert r.is_allowed("a", "/x") is False and r.is_allowed("b", "/x") is False
    # a User-agent line AFTER rules starts a new group
    r = parse_robots(
        "User-agent: a\nDisallow: /\nUser-agent: b\nAllow: /\nDisallow: /q\n"
    )
    assert r.is_allowed("a", "/x") is False
    assert r.is_allowed("b", "/x") is True
    assert r.is_allowed("b", "/q") is False
    # case-insensitive directives and UA tokens
    r = parse_robots("USER-AGENT: MyBot\nDISALLOW: /x\n")
    assert r.is_allowed("mybot", "/x/y") is False


def test_repeated_ua_groups_combine():
    """RFC 9309 §2.2.1: multiple groups matching the same UA combine
    their rules (code-review r5 find — only the first group was used)."""
    r = parse_robots(
        "User-agent: xqbot\nDisallow: /a\n\n"
        "User-agent: xqbot\nDisallow: /b\n\n"
        "User-agent: *\nDisallow: /c\n\nUser-agent: *\nDisallow: /d\n"
    )
    assert r.is_allowed("xqbot", "/a/x") is False
    assert r.is_allowed("xqbot", "/b/x") is False  # second group combined
    assert r.is_allowed("xqbot", "/c/x") is True  # '*' not combined w/ exact
    assert r.is_allowed("other", "/c/x") is False
    assert r.is_allowed("other", "/d/x") is False  # both '*' groups combine


def test_non_rule_lines_do_not_split_ua_run():
    """Advisor r5: Sitemap/Crawl-delay/unknown directives between two
    User-agent lines are ignorable — the UA run stays combined, so
    agent a still gets the Disallow below agent b."""
    r = parse_robots(
        "User-agent: a\nSitemap: https://e.example/s.xml\n"
        "User-agent: b\nDisallow: /x\n"
    )
    assert r.is_allowed("a", "/x/y") is False
    assert r.is_allowed("b", "/x/y") is False
    # but Allow/Disallow still END the run: a later User-agent line
    # after rules starts a NEW group
    r = parse_robots(
        "User-agent: a\nDisallow: /x\nCrawl-delay: 5\n"
        "User-agent: b\nDisallow: /y\n"
    )
    assert r.is_allowed("a", "/y/z") is True  # b's group, not a's
    assert r.is_allowed("b", "/y/z") is False
    assert r.is_allowed("b", "/x/z") is True
