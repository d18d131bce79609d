"""Minimal robots.txt parsing + rule matching (SURVEY.md §2.1 S3, §2.3 F5).

The reference gates requests through RobotsTxtMiddleware with a per-netloc
parser cache ([S:scrapy/downloadermiddlewares/robotstxt.py],
[S:scrapy/robotstxt.py]). Semantics here follow the de-facto standard the
stock parsers implement: within the ``User-agent: *`` group, longest-prefix
match wins between Allow and Disallow; a tie prefers Allow; an empty
Disallow value allows everything; ``Crawl-delay`` feeds the politeness
budget (config.CrawlConfig.waves_per_emit).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsRules:
    allow: list[str] = field(default_factory=list)
    disallow: list[str] = field(default_factory=list)
    crawl_delay: float = 0.0

    def is_allowed(self, path: str) -> bool:
        best_len, best_allow = -1, True
        for p in self.disallow:
            if p and path.startswith(p) and len(p) > best_len:
                best_len, best_allow = len(p), False
        for p in self.allow:
            if p and path.startswith(p) and len(p) >= best_len:
                best_len, best_allow = len(p), True
        return best_allow


ALLOW_ALL = RobotsRules()


def parse_robots(body: str) -> RobotsRules:
    """Parse the ``User-agent: *`` group (the reference crawler sets no custom
    USER_AGENT matching a specific group)."""
    rules = RobotsRules()
    in_star = False
    seen_any_group = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            in_star = val == "*"
            seen_any_group = True
        elif in_star or not seen_any_group:
            if key == "disallow" and val:
                rules.disallow.append(val)
            elif key == "allow" and val:
                rules.allow.append(val)
            elif key == "crawl-delay":
                try:
                    rules.crawl_delay = float(val)
                except ValueError:
                    pass
    return rules
