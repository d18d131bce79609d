"""Unit + property tests for the stateful layer (plain classes, no Ray):
Bloom filter, robots parser, URL-seen shard, frontier shard (politeness,
ordering, checkpoint round-trips) — SURVEY.md §5.2.6."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy_ray import schemas
from scrapy_ray.config import CrawlConfig
from scrapy_ray.state.bloom import BloomFilter
from scrapy_ray.state.frontier import FrontierShard, _path_of
from scrapy_ray.state.robots import parse_robots
from scrapy_ray.state.urlseen import UrlSeenShard


def test_bloom_no_false_negatives():
    bf = BloomFilter(capacity=10_000, bits_per_key=10)
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=5_000, dtype=np.uint64)
    bf.add_many(keys)
    assert bf.contains_many(keys).all()


def test_bloom_fpr_reasonable():
    bf = BloomFilter(capacity=10_000, bits_per_key=10)
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=10_000, dtype=np.uint64)
    bf.add_many(keys)
    other = rng.integers(0, 2**63, size=20_000, dtype=np.uint64)
    other = np.setdiff1d(other, keys)
    fpr = bf.contains_many(other).mean()
    assert fpr < 0.02, fpr  # theoretical ~0.008 at 10 bits/key


def test_bloom_serialization_roundtrip():
    bf = BloomFilter(capacity=1000, bits_per_key=12)
    keys = np.arange(500, dtype=np.uint64) * 2654435761
    bf.add_many(keys)
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.contains_many(keys).all()
    assert bf2.m == bf.m and bf2.k == bf.k and bf2.n_added == bf.n_added


def test_robots_parse_and_match():
    r = parse_robots("User-agent: *\nDisallow: /hotel/\nAllow: /hotel/free\nCrawl-delay: 2\n")
    assert not r.is_allowed("/hotel/00001")
    assert r.is_allowed("/hotel/free/x")     # longest-match, Allow wins
    assert r.is_allowed("/restaurant/1")
    assert r.crawl_delay == 2.0
    # other-agent groups ignored
    r2 = parse_robots("User-agent: googlebot\nDisallow: /\nUser-agent: *\nAllow: /\n")
    assert r2.is_allowed("/anything")
    assert parse_robots("").is_allowed("/x")


def test_path_of():
    assert _path_of("https://h/x/y?q=1") == "/x/y?q=1"
    assert _path_of("https://h") == "/"


def test_urlseen_shard_first_occurrence():
    s = UrlSeenShard(0, capacity=1000)
    h = np.array([1, 2, 1, 3, 2, 4], dtype=np.uint64)
    mask = s.check_and_add(h, [f"u{int(x)}" for x in h])
    assert mask.tolist() == [True, True, False, True, False, True]
    mask2 = s.check_and_add(np.array([3, 5], dtype=np.uint64), ["u3", "u5"])
    assert mask2.tolist() == [False, True]
    t = s.seen_table()
    assert sorted(t["url_hash"].to_pylist()) == [1, 2, 3, 4, 5]


def test_urlseen_bloom_only_mode():
    s = UrlSeenShard(0, capacity=1000, exact=False)
    h = np.array([10, 11, 10], dtype=np.uint64)
    assert s.check_and_add(h, None).tolist() == [True, True, False]
    assert s.check_and_add(np.array([11], dtype=np.uint64), None).tolist() == [False]


def test_urlseen_checkpoint_roundtrip(tmp_path):
    s = UrlSeenShard(3, capacity=1000)
    h = np.array([7, 8, 9], dtype=np.uint64)
    s.check_and_add(h, ["a", "b", "c"])
    s.checkpoint(str(tmp_path))
    s2 = UrlSeenShard(3, capacity=1000)
    s2.restore(str(tmp_path))
    assert s2.check_and_add(np.array([8, 100], dtype=np.uint64), ["b", "z"]).tolist() == [False, True]


def _rows(specs):
    """specs: list of (url, host, priority, seq)"""
    return pa.table(
        {
            "url": [s[0] for s in specs],
            "host": [s[1] for s in specs],
            "url_hash": pa.array(np.arange(len(specs), dtype=np.uint64)),
            "depth": pa.array(np.zeros(len(specs), dtype=np.int32)),
            "priority": pa.array(np.array([s[2] for s in specs], dtype=np.int32)),
            "seq": pa.array(np.array([s[3] for s in specs], dtype=np.int64)),
            "parent_url": [""] * len(specs),
            "callback": ["parse_detail"] * len(specs),
            "dont_filter": [False] * len(specs),
            "retries": pa.array(np.zeros(len(specs), dtype=np.int32)),
            "redirects": pa.array(np.zeros(len(specs), dtype=np.int32)),
        },
        schema=schemas.FRONTIER,
    )


def test_frontier_priority_and_cap():
    cfg = CrawlConfig(per_domain_cap=2)
    f = FrontierShard(0, cfg)
    f.push(_rows([
        ("https://a/1", "a", 0, 0), ("https://a/2", "a", 5, 1),
        ("https://a/3", "a", 0, 2), ("https://b/1", "b", 0, 3),
    ]))
    w0 = f.next_wave(0)
    # host a capped at 2: picks (pri 5, seq 1) then (pri 0, seq 0); host b: seq 3
    got = sorted(zip(w0["priority"].to_pylist(), w0["seq"].to_pylist()))
    assert (5, 1) in [(p, s) for p, s in got]
    assert len([s for p, s in got]) == 3
    w1 = f.next_wave(1)
    assert w1["seq"].to_pylist() == [2]
    assert f.size() == 0


def test_frontier_politeness_delay():
    cfg = CrawlConfig(download_delay=2.0, wave_period=1.0)  # 1 url every 2 waves
    f = FrontierShard(0, cfg)
    f.push(_rows([(f"https://a/{i}", "a", 0, i) for i in range(3)]))
    assert len(f.next_wave(0)) == 1
    assert len(f.next_wave(1)) == 0
    assert f.earliest_ready_wave() == 2
    assert len(f.next_wave(2)) == 1
    assert len(f.next_wave(4)) == 1


def test_frontier_robots_gate():
    cfg = CrawlConfig(obey_robots=True)
    f = FrontierShard(0, cfg, {"a": "User-agent: *\nDisallow: /hotel/\n"})
    kept = f.push(_rows([("https://a/hotel/1", "a", 0, 0), ("https://a/listing/1", "a", 0, 1)]))
    assert kept == 1
    assert f.n_robots_denied == 1
    assert f.next_wave(0)["url"].to_pylist() == ["https://a/listing/1"]


def test_frontier_checkpoint_roundtrip(tmp_path):
    cfg = CrawlConfig(download_delay=1.0)
    f = FrontierShard(1, cfg)
    f.push(_rows([("https://a/1", "a", 0, 0), ("https://a/2", "a", 0, 1), ("https://b/1", "b", 3, 2)]))
    f.next_wave(0)
    f.checkpoint(str(tmp_path))
    f2 = FrontierShard(1, cfg)
    f2.restore(str(tmp_path))
    assert f2.size() == f.size()
    assert f2.last_emit_wave == f.last_emit_wave
    # identical future emission
    assert f2.next_wave(1).equals(f.next_wave(1))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(-3, 3)), min_size=1, max_size=40))
def test_frontier_emission_order_property(entries):
    """Within one host, emission follows (priority desc, seq asc) exactly."""
    cfg = CrawlConfig(per_domain_cap=1_000_000)
    f = FrontierShard(0, cfg)
    specs = [(f"https://a/{i}", "a", pri, i) for i, (_, pri) in enumerate(entries)]
    f.push(_rows(specs))
    w = f.next_wave(0)
    got = list(zip(w["priority"].to_pylist(), w["seq"].to_pylist()))
    # single host -> heap pop order is exactly (priority desc, seq asc)
    assert got == sorted(got, key=lambda t: (-t[0], t[1]))
    assert len(got) == len(entries)


def test_frontier_repeated_run_merge():
    """Regression (r3 ADVICE): a host whose run list exceeds the merge cap a
    SECOND time mixes an already-merged run (bid=-1, (2,n) idx pairs) with
    plain runs — the old _merge_runs concatenated 1-D and 2-D idx arrays and
    raised ValueError, killing the crawl under politeness-capped drain."""
    cfg = CrawlConfig(per_domain_cap=1_000_000)
    f = FrontierShard(0, cfg)
    n = 40  # two merge cycles at the >16-runs threshold
    for i in range(n):
        f.push(_rows([(f"https://a/{i}", "a", i % 7, i)]))
    w = f.next_wave(0)
    assert len(w) == n
    got = sorted(zip(w["priority"].to_pylist(), w["seq"].to_pylist()))
    assert set(w["seq"].to_pylist()) == set(range(n))
    assert got == sorted(got)
    assert f.size() == 0


def test_frontier_merge_after_partial_drain():
    """Merged runs with pos>0 (partially consumed) must re-merge correctly:
    drain a few rows under a per-host cap, then keep pushing past the merge
    threshold again and verify emission order and no row loss."""
    cfg = CrawlConfig(per_domain_cap=3)
    f = FrontierShard(0, cfg)
    for i in range(20):
        f.push(_rows([(f"https://a/{i}", "a", 0, i)]))
    w0 = f.next_wave(0)
    assert w0["seq"].to_pylist() == [0, 1, 2]
    for i in range(20, 40):
        f.push(_rows([(f"https://a/{i}", "a", 0, i)]))
    seqs = []
    wave = 1
    while f.size():
        seqs.extend(f.next_wave(wave)["seq"].to_pylist())
        wave += 1
    assert seqs == list(range(3, 40))


def test_robots_wildcards_and_anchors():
    """REP wildcard semantics (round 3, Protego parity): * spans, $ anchors,
    longest rule wins, tie prefers Allow."""
    r = parse_robots("User-agent: *\n"
                     "Disallow: /*.pdf$\n"
                     "Disallow: /private*\n"
                     "Allow: /private/ok\n"
                     "Disallow: /exact$\n")
    assert not r.is_allowed("/docs/file.pdf")
    assert r.is_allowed("/docs/file.pdfx")          # $ anchor
    assert not r.is_allowed("/private/stuff")
    assert r.is_allowed("/private/ok/page")          # longer Allow wins
    assert not r.is_allowed("/exact")
    assert r.is_allowed("/exact/sub")
    # star inside the path
    r2 = parse_robots("User-agent: *\nDisallow: /a/*/c\n")
    assert not r2.is_allowed("/a/b/c")
    assert not r2.is_allowed("/a/xx/yy/c")
    assert r2.is_allowed("/a/b/d")
    # plain prefixes unchanged
    r3 = parse_robots("User-agent: *\nDisallow: /hotel/\n")
    assert not r3.is_allowed("/hotel/1")
    assert r3.is_allowed("/restaurant/1")


def test_frontier_spill_is_invisible(tmp_path):
    """Disk-backed frontier ([S:queuelib]/JOBDIR parity): with a tiny
    in-memory cap the shard spills whole hosts to parquet and reloads them
    when ready — the emitted wave sequence must be IDENTICAL to an
    unbounded in-memory shard's, spilling must actually happen, and the
    in-memory row count must respect the cap after every push."""
    rows = _rows([(f"https://h{h}/{i}", f"h{h}", (i * 7) % 5, h * 100 + i)
                  for h in range(6) for i in range(40)])

    def drain(f):
        waves = []
        w = 0
        while True:
            t = f.next_wave(w)
            if len(t) == 0:
                if f.size() == 0:
                    break
                w += 1
                continue
            waves.append(sorted(zip(t["priority"].to_pylist(),
                                    t["seq"].to_pylist())))
            w += 1
        return waves

    base = FrontierShard(0, CrawlConfig(per_domain_cap=4))
    base.push(rows)
    want = drain(base)

    cfg = CrawlConfig(per_domain_cap=4, frontier_max_rows=60,
                      frontier_spill_dir=str(tmp_path))
    f = FrontierShard(0, cfg)
    f.push(rows)
    st = f.stats()
    assert st["spilled_rows"] > 0, "cap 60 over 240 rows must spill"
    assert st["mem_rows"] <= 60
    assert st["queued"] == 240
    assert drain(f) == want
    assert f.size() == 0 and not f.spilled


def test_frontier_spill_respill_and_checkpoint(tmp_path):
    """A spilled host that receives NEW pushes and spills again must merge
    with its existing spill file (no row loss); checkpoints must include
    disk-resident rows, and a restored shard drains identically."""
    cfg = CrawlConfig(per_domain_cap=100, frontier_max_rows=30,
                      frontier_spill_dir=str(tmp_path / "spill"))
    f = FrontierShard(0, cfg)
    f.push(_rows([(f"https://big/{i}", "big", 0, i) for i in range(50)]))
    assert f.stats()["spilled_rows"] == 50          # whole host spilled
    f.push(_rows([(f"https://big/x{i}", "big", 9, 100 + i) for i in range(40)]))
    st = f.stats()
    assert st["queued"] == 90
    assert st["mem_rows"] <= 30

    ck = str(tmp_path / "ck")
    f.checkpoint(ck)
    g = FrontierShard(0, cfg)
    g.restore(ck)
    assert g.size() == 90

    def pop_all(sh):
        out = []
        w = 0
        while sh.size():
            t = sh.next_wave(w)
            out += sorted(zip(t["priority"].to_pylist(),
                              t["seq"].to_pylist()))
            w += 1
        return out

    a, b = pop_all(f), pop_all(g)
    assert a == b
    # every row survives the spill/merge/checkpoint round-trips exactly once
    assert sorted(s for _, s in a) == list(range(50)) + list(range(100, 140))
    assert sorted(p for p, _ in a) == [0] * 50 + [9] * 40
