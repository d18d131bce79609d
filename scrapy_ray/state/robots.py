"""Minimal robots.txt parsing + rule matching (SURVEY.md §2.1 S3, §2.3 F5).

The reference gates requests through RobotsTxtMiddleware with a per-netloc
parser cache ([S:scrapy/downloadermiddlewares/robotstxt.py],
[S:scrapy/robotstxt.py] — Protego by default). Semantics here follow the
REP de-facto standard Protego implements: within the ``User-agent: *``
group, the longest (most specific) matching rule wins between Allow and
Disallow, a tie prefers Allow, an empty Disallow allows everything,
``*`` matches any char run and ``$`` anchors the end of the path
(round 3 — previously prefix-only), and ``Crawl-delay`` feeds the
politeness budget (config.CrawlConfig.waves_per_emit). Engine and
simulator share THIS implementation, so the mirror holds by construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def _rule_matcher(pattern: str):
    """Compile one REP rule: plain prefix when literal, regex for * / $."""
    if "*" not in pattern and not pattern.endswith("$"):
        return None                      # startswith fast path
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


@dataclass
class RobotsRules:
    allow: list[str] = field(default_factory=list)
    disallow: list[str] = field(default_factory=list)
    crawl_delay: float = 0.0
    # `Sitemap:` directives are group-INDEPENDENT per the REP (collected
    # wherever they appear) — [S:scrapy/spiders/sitemap.py SitemapSpider
    # accepts robots.txt entries in sitemap_urls and follows these lines]
    sitemaps: list[str] = field(default_factory=list)
    _m: dict = field(default_factory=dict, repr=False, compare=False)

    def _matches(self, pattern: str, path: str) -> bool:
        if pattern not in self._m:
            self._m[pattern] = _rule_matcher(pattern)
        rx = self._m[pattern]
        return path.startswith(pattern) if rx is None else rx.match(path) is not None

    def is_allowed(self, path: str) -> bool:
        best_len, best_allow = -1, True
        for p in self.disallow:
            if p and len(p) > best_len and self._matches(p, path):
                best_len, best_allow = len(p), False
        for p in self.allow:
            if p and len(p) >= best_len and self._matches(p, path):
                best_len, best_allow = len(p), True
        return best_allow


ALLOW_ALL = RobotsRules()


def parse_robots(body: str, user_agent: str = "*") -> RobotsRules:
    """Parse robots.txt and return the rule group that governs
    ``user_agent``, per RFC 9309 / Protego group selection: the group
    whose agent token is a case-insensitive substring of the UA string
    wins, LONGEST token first; the ``*`` group is the fallback; no group
    at all = allow everything. Consecutive ``User-agent`` lines share one
    group (agent accumulation closes at the first rule line). Rules
    appearing BEFORE any ``User-agent`` line are used only when the file
    declares no group at all (then they act as the fallback group); when
    any explicit group exists they are dropped — the RFC 9309-strict
    reading (rules outside a group are undefined), intentionally stricter
    than pre-round-3 parsing which merged them into the ``*`` group.
    ``Sitemap:`` directives are group-independent and always collected.
    The default
    ``user_agent="*"`` reproduces the star-group-only behavior the
    reference crawler relies on (it sets no custom USER_AGENT)."""
    # groups: list of (agent_tokens_lowercased, RobotsRules)
    groups: list[tuple[list[str], RobotsRules]] = []
    sitemaps: list[str] = []
    pending_agents: list[str] | None = None
    cur: RobotsRules | None = None
    fallback_pre = RobotsRules()   # rules before any User-agent line
    saw_group = False

    def rule_line(rules: RobotsRules, key: str, val: str) -> None:
        if key == "disallow" and val:
            rules.disallow.append(val)
        elif key == "allow" and val:
            rules.allow.append(val)
        elif key == "crawl-delay":
            try:
                rules.crawl_delay = float(val)
            except ValueError:
                pass

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            if val:
                sitemaps.append(val)
        elif key == "user-agent":
            saw_group = True
            if pending_agents is None:          # new group starts
                pending_agents = []
                cur = RobotsRules()
                groups.append((pending_agents, cur))
            pending_agents.append(val.lower())
        else:
            pending_agents = None               # rule closes accumulation
            rule_line(cur if cur is not None else fallback_pre, key, val)

    ua = user_agent.lower()
    best: RobotsRules | None = None
    best_len = -1
    star: RobotsRules | None = fallback_pre if not saw_group else None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                star = star or rules
            elif a and a in ua and len(a) > best_len:
                best, best_len = rules, len(a)
    rules = best if best is not None else (star or RobotsRules())
    rules.sitemaps = sitemaps
    return rules
