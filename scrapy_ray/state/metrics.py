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
        self._kll: dict = {}     # metric -> KLL sketch (lazy)

    def inc(self, deltas: dict[str, int]) -> None:
        self.counters.update(deltas)

    def inc_hosts(self, host_counts: dict[str, int]) -> None:
        self.host_pages.update(host_counts)

    def observe(self, metric: str, values: list[int]) -> None:
        """Distribution observations (per-wave latencies, wave sizes, ...)
        into a mergeable KLL sketch per metric — LOGSTATS-and-beyond: the
        reference reports rates; sketches give p50/p90/p99 with bounded
        state at any stream length."""
        from scrapy_ray.functions.sketch import KLL

        if metric not in self._kll:
            self._kll[metric] = KLL()
        self._kll[metric].add_many([int(v) for v in values])

    def record_wave(self, deltas: dict[str, int],
                    host_counts: dict[str, int],
                    observations: dict[str, list[int]]) -> None:
        """One merged per-wave RPC (round 5 serial-floor cut): counters +
        per-host counts + distribution observations in a single submission
        instead of four — state updates identical to calling inc /
        inc_hosts / observe in sequence."""
        self.inc(deltas)
        self.inc_hosts(host_counts)
        for metric, values in observations.items():
            self.observe(metric, values)

    def snapshot(self) -> dict:
        out = dict(self.counters)
        if self._kll:
            out["quantiles"] = {
                m: {"p50": k.quantile(0.5), "p90": k.quantile(0.9),
                    "p99": k.quantile(0.99), "n": k.n}
                for m, k in self._kll.items()}
        return out

    def hot_hosts(self, top_k: int = 10) -> list[tuple[str, int]]:
        """A2 hot-domain detection: drives per-wave salting decisions."""
        return self.host_pages.most_common(top_k)


def create_metrics() -> "ray.actor.ActorHandle":
    return ray.remote(MetricsActor).options(num_cpus=0).remote()
