"""Sharded crawl frontier (SURVEY.md §2.3 F2/F3/F5) — the distributed
scheduler.

The reference schedules through one in-process priority queue with per-host
download slots ([S:scrapy/core/scheduler.py], [S:scrapy/pqueues.py],
[S:scrapy/core/downloader/__init__.py Slot]). Here the frontier is an actor
pool hash-partitioned by **host** [B:north_rule] — politeness and the robots
cache need all of a host's URLs in one place (a co-located lookup, never a
shuffle — SURVEY §2.4 J2). Each shard holds:

- per-host heaps ordered by (-priority, seq) — priority desc, FIFO tiebreak,
  the engine's deterministic total order (SURVEY §2.9);
- a per-host politeness clock in *virtual wave time*: a host with effective
  crawl delay d emits at most 1 URL per eligible wave, eligible every
  ``ceil(d / wave_period)`` waves; a host with no delay emits up to
  ``per_domain_cap`` per wave (mirrors CONCURRENT_REQUESTS_PER_DOMAIN /
  DOWNLOAD_DELAY semantics [S:default_settings.py] deterministically);
- parsed robots rules (state/robots.py) gating enqueue [B:north_star].

Wave assembly: the driver gathers each shard's emission and merges by
(-priority, seq) — a cheap k-way merge, no shuffle (SURVEY §7.4.1).
"""

from __future__ import annotations

import heapq
import json
import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from scrapy_ray import schemas
from scrapy_ray.config import CrawlConfig
from scrapy_ray.functions.hashing import hash64
from scrapy_ray.state.errors import StaleShardError
from scrapy_ray.state.robots import ALLOW_ALL, RobotsRules, parse_robots

_NEVER = -1 << 30


def _path_of(url: str) -> str:
    i = url.find("://")
    j = url.find("/", i + 3) if i >= 0 else -1
    return url[j:] if j >= 0 else "/"


class FrontierShard:
    """One host-partition of the frontier. Plain class, Ray-wrapped by
    ShardedFrontier; unit-testable standalone."""

    def __init__(self, shard_id: int, cfg: CrawlConfig, robots_bodies: dict[str, str] | None = None):
        self.shard_id = shard_id
        self.cfg = cfg
        self.queues: dict[str, list] = defaultdict(list)  # host -> heap[(-pri, seq, row)]
        self.last_emit_wave: dict[str, int] = {}
        self.robots: dict[str, RobotsRules] = {}
        if robots_bodies:
            self.robots = {h: parse_robots(b) for h, b in robots_bodies.items()}
        self.n_robots_denied = 0
        self.n_pushed = 0
        self.epoch = -1  # stamped by the driver; -1 = fresh/restarted actor

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _guard(self, epoch: int | None) -> None:
        if epoch is not None and epoch != self.epoch:
            raise StaleShardError(
                f"frontier shard {self.shard_id}: epoch {self.epoch} != driver {epoch} "
                "(actor restarted since last stamp)")

    def _rules(self, host: str) -> RobotsRules:
        return self.robots.get(host, ALLOW_ALL)

    def _delay(self, host: str) -> float:
        robots_d = self._rules(host).crawl_delay if self.cfg.respect_crawl_delay else 0.0
        return max(self.cfg.download_delay, robots_d)

    def push(self, rows: pa.Table, epoch: int | None = None) -> int:
        """Enqueue FRONTIER rows; robots-denied rows are dropped here (they
        are already in the URL-seen set, matching the reference where the
        dupefilter runs at schedule time and robots gating at download time)."""
        self._guard(epoch)
        kept = 0
        obey = self.cfg.obey_robots
        for r in rows.to_pylist():
            host = r["host"]
            if obey and not self._rules(host).is_allowed(_path_of(r["url"])):
                self.n_robots_denied += 1
                continue
            heapq.heappush(self.queues[host], (-r["priority"], r["seq"], r))
            kept += 1
        self.n_pushed += kept
        return kept

    def next_wave(self, wave_idx: int, epoch: int | None = None) -> pa.Table:
        """Emit this wave's politeness-budgeted batch from every eligible host."""
        self._guard(epoch)
        out: list[dict] = []
        cfg = self.cfg
        for host in list(self.queues):
            q = self.queues[host]
            if not q:
                del self.queues[host]
                continue
            delay = self._delay(host)
            ready = self.last_emit_wave.get(host, _NEVER) + cfg.waves_per_emit(delay)
            if wave_idx < ready:
                continue
            cap = 1 if delay > 0 else cfg.per_domain_cap
            for _ in range(min(cap, len(q))):
                out.append(heapq.heappop(q)[2])
            self.last_emit_wave[host] = wave_idx
            if not q:
                del self.queues[host]
        if not out:
            return schemas.FRONTIER.empty_table()
        cols = {k: [r[k] for r in out] for k in schemas.FRONTIER.names}
        return pa.table(cols, schema=schemas.FRONTIER)

    def size(self) -> int:
        return sum(len(q) for q in self.queues.values())

    def earliest_ready_wave(self, epoch: int | None = None) -> int | None:
        """Smallest wave index at which any queued host may emit (None=empty)."""
        self._guard(epoch)
        best = None
        for host, q in self.queues.items():
            if not q:
                continue
            ready = self.last_emit_wave.get(host, _NEVER) + self.cfg.waves_per_emit(self._delay(host))
            best = ready if best is None else min(best, ready)
        return best

    def stats(self, epoch: int | None = None) -> dict:
        self._guard(epoch)
        return {"shard": self.shard_id, "queued": self.size(),
                "hosts": len(self.queues), "robots_denied": self.n_robots_denied,
                "pushed": self.n_pushed}

    def reset(self) -> None:
        """Back to construction state (driver-coordinated recovery when no
        committed checkpoint exists); robots rules are construction args and
        survive actor restart, so they stay."""
        self.queues = defaultdict(list)
        self.last_emit_wave = {}
        self.n_robots_denied = 0
        self.n_pushed = 0

    # --- checkpoint (SURVEY §4.2): queue rows + politeness clocks ---
    def checkpoint(self, dirpath: str, epoch: int | None = None) -> None:
        self._guard(epoch)  # a stale shard must never write a checkpoint
        os.makedirs(dirpath, exist_ok=True)
        rows = [e[2] for q in self.queues.values() for e in q]
        t = (pa.table({k: [r[k] for r in rows] for k in schemas.FRONTIER.names},
                      schema=schemas.FRONTIER)
             if rows else schemas.FRONTIER.empty_table())
        tmp = os.path.join(dirpath, f"frontier_{self.shard_id}.tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(dirpath, f"frontier_{self.shard_id}.parquet"))
        jtmp = os.path.join(dirpath, f"clock_{self.shard_id}.tmp")
        with open(jtmp, "w") as fh:
            json.dump({"last_emit_wave": self.last_emit_wave,
                       "n_robots_denied": self.n_robots_denied,
                       "n_pushed": self.n_pushed}, fh)
        os.replace(jtmp, os.path.join(dirpath, f"clock_{self.shard_id}.json"))

    def restore(self, dirpath: str) -> None:
        t = pq.read_table(os.path.join(dirpath, f"frontier_{self.shard_id}.parquet"))
        self.queues = defaultdict(list)
        for r in t.to_pylist():
            heapq.heappush(self.queues[r["host"]], (-r["priority"], r["seq"], r))
        with open(os.path.join(dirpath, f"clock_{self.shard_id}.json")) as fh:
            d = json.load(fh)
        self.last_emit_wave = {k: int(v) for k, v in d["last_emit_wave"].items()}
        self.n_robots_denied = d["n_robots_denied"]
        self.n_pushed = d["n_pushed"]


class ShardedFrontier:
    """Driver-side client over the frontier shard pool."""

    def __init__(self, cfg: CrawlConfig, robots_bodies: dict[str, str] | None = None):
        self.cfg = cfg
        self.n_shards = cfg.n_frontier_shards
        self.epoch: int | None = None  # engine stamps via set_epoch()
        # each shard receives ONLY the robots entries for hosts it owns —
        # at 10^7 hosts the cache partitions with the frontier instead of
        # being replicated n_shards times (SURVEY §2.3 F5 cache locality)
        parts: list[dict[str, str] | None] = [None] * self.n_shards
        if robots_bodies:
            parts = [{} for _ in range(self.n_shards)]
            hosts = list(robots_bodies)
            for host, s in zip(hosts, (hash64(hosts) % np.uint64(self.n_shards)).astype(int)):
                parts[s][host] = robots_bodies[host]
        # num_cpus=0 — see ShardedUrlSeen: always-schedulable RPC servers.
        # max_restarts>0: dead shard revives empty with its ORIGINAL args
        # (cfg + its robots partition); the driver restores queue/clock state
        # from the last committed checkpoint (crawl.py recover()).
        actor = ray.remote(FrontierShard)
        self.shards = [
            actor.options(num_cpus=0, max_restarts=4).remote(i, cfg, parts[i])
            for i in range(self.n_shards)
        ]

    def shard_of_hosts(self, hosts: list[str]) -> np.ndarray:
        return (hash64(hosts) % np.uint64(self.n_shards)).astype(np.int64)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        ray.get([s.set_epoch.remote(epoch) for s in self.shards])

    def push(self, rows: pa.Table) -> int:
        if len(rows) == 0:
            return 0
        shard = self.shard_of_hosts(rows["host"].to_pylist())
        futs = []
        for s in range(self.n_shards):
            idx = np.nonzero(shard == s)[0]
            if len(idx):
                futs.append(self.shards[s].push.remote(rows.take(pa.array(idx)),
                                                       epoch=self.epoch))
        return sum(ray.get(futs))

    def next_wave(self, wave_idx: int) -> pa.Table:
        parts = ray.get([s.next_wave.remote(wave_idx, epoch=self.epoch)
                         for s in self.shards])
        t = pa.concat_tables(parts)
        if len(t) == 0:
            return t
        return t.sort_by([("priority", "descending"), ("seq", "ascending")])

    def total_size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def earliest_ready_wave(self) -> int | None:
        vals = [v for v in ray.get([s.earliest_ready_wave.remote(epoch=self.epoch)
                                    for s in self.shards])
                if v is not None]
        return min(vals) if vals else None

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote(epoch=self.epoch) for s in self.shards])

    def checkpoint(self, dirpath: str) -> None:
        ray.get([s.checkpoint.remote(dirpath, epoch=self.epoch) for s in self.shards])

    def restore(self, dirpath: str) -> None:
        ray.get([s.restore.remote(dirpath) for s in self.shards])

    def reset(self) -> None:
        ray.get([s.reset.remote() for s in self.shards])
