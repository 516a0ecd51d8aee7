"""Robots Exclusion Protocol (RFC 9309) — crawl-politeness decisions.

Pure Python, Spark-free, from the PUBLIC spec: group selection by the
most specific matching user-agent product token ('*' as fallback),
longest-path-match rule precedence with allow winning length ties,
``*`` wildcards and the ``$`` end anchor inside path patterns, and
allow-by-default when nothing matches. Unknown directives and comments
are ignored; a group is consecutive User-agent lines followed by its
rules (a later User-agent line after rules starts a new group).
"""

from __future__ import annotations

import re


def _compile_pattern(pattern: str):
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile(rx + ("\\Z" if anchored else ""))


class RobotsRules:
    """Parsed robots.txt: ``groups`` is a list of
    (user_agent_tokens, [(allow, raw_pattern, compiled)])."""

    def __init__(self, groups):
        self.groups = groups

    def _group_for(self, ua: str):
        ua = ua.lower()
        # RFC 9309 §2.2.1: when more than one group matches the same
        # user-agent, their rules are COMBINED (repeated-UA groups are
        # common in real robots.txt); exact-token groups beat '*'
        exact: list = []
        star: list = []
        for agents, rules in self.groups:
            if ua in agents:
                exact.extend(rules)
            if "*" in agents:
                star.extend(rules)
        return exact if exact else star

    def is_allowed(self, ua: str, path: str) -> bool:
        rules = self._group_for(ua)
        if not rules:
            return True
        best_len = -1
        best_allow = True
        for allow, raw, rx in rules:
            if not raw:
                # "Disallow:" empty = no restriction (spec), skip
                continue
            if rx.match(path) is not None:
                # longest pattern wins; on a tie, allow wins
                if len(raw) > best_len or (
                    len(raw) == best_len and allow and not best_allow
                ):
                    best_len = len(raw)
                    best_allow = allow
        return best_allow if best_len >= 0 else True


def parse_robots(text: str) -> RobotsRules:
    groups: list = []
    agents: set | None = None
    rules: list | None = None
    in_agent_run = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agent_run:
                # a User-agent line after rules starts a NEW group
                agents = set()
                rules = []
                groups.append((agents, rules))
                in_agent_run = True
            agents.add(value.lower())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if rules is None:
                continue  # rules before any User-agent line: ignored
            rules.append(
                (key == "allow", value, _compile_pattern(value))
                if value
                else (key == "allow", "", None)
            )
        else:
            # crawl-delay, sitemap, unknown directives: not rules, and
            # per RFC 9309 / the reference REP parsers they are
            # IGNORABLE inside a User-agent run — 'User-agent: a /
            # Sitemap: s / User-agent: b' keeps a and b in ONE group
            # (only Allow/Disallow end a run; r6 advisor fix)
            pass
    return RobotsRules(groups)
