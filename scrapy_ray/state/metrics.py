"""Crawl stats collector (SURVEY.md §2.3 F7, §2.5 A1/A2).

The reference's MemoryStatsCollector ([S:scrapy/statscollectors.py]) is a
driver-heap dict; distributed stages can't reach it, so ours is one tiny Ray
actor taking *batched* increments (one RPC per stage per wave, never per
row). Per-host page counts (A2) ride along and feed hot-host detection for
the salted-aggregate path (pipelines/skew.py)."""

from __future__ import annotations

from collections import Counter

import ray


class MetricsActor:
    def __init__(self):
        self.counters: Counter = Counter()
        self.host_pages: Counter = Counter()

    def inc(self, deltas: dict[str, int]) -> None:
        self.counters.update(deltas)

    def inc_hosts(self, host_counts: dict[str, int]) -> None:
        self.host_pages.update(host_counts)

    def snapshot(self) -> dict:
        return dict(self.counters)

    def hot_hosts(self, top_k: int = 10) -> list[tuple[str, int]]:
        """A2 hot-domain detection: drives per-wave salting decisions."""
        return self.host_pages.most_common(top_k)


def create_metrics() -> "ray.actor.ActorHandle":
    return ray.remote(MetricsActor).options(num_cpus=0).remote()
