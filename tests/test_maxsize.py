"""DOWNLOAD_MAXSIZE / DOWNLOAD_WARNSIZE gate ([S:scrapy/core/downloader/
handlers/http11.py _ResponseReader]): oversized bodies abort before any
middleware — engine == simulator under the gate, dropped pages yield no
items/links and don't count as fetched, counters agree. SURVEY §2 round-3
addendum."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from scrapy_ray.config import CrawlConfig
from scrapy_ray.pipelines.crawl import run_crawl
from scrapy_ray.pipelines.simulator import simulate_crawl


def _assert_equal(a, b):
    assert a.crawl_order.to_pydict() == b.crawl_order.to_pydict()
    sa = set(zip(a.url_seen["url_hash"].to_pylist(), a.url_seen["url"].to_pylist()))
    sb = set(zip(b.url_seen["url_hash"].to_pylist(), b.url_seen["url"].to_pylist()))
    assert sa == sb
    assert a.items.sort_by("url").equals(b.items.sort_by("url"))


def test_maxsize_split_kernel():
    from scrapy_ray.stages.fetch import _maxsize_split

    t = pa.table({"html": pa.array([b"x" * 10, b"y" * 50, b"z" * 100],
                                   type=pa.binary()),
                  "url": ["a", "b", "c"]})
    kept, nd, nw = _maxsize_split(t, 50, 20)
    assert kept["url"].to_pylist() == ["a", "b"]   # 100 > 50 dropped
    assert nd == 1
    assert nw == 2                                  # 50 and 100 exceed 20
    kept, nd, nw = _maxsize_split(t, 0, 60)         # warn-only mode
    assert len(kept) == 3 and nd == 0 and nw == 1
    kept, nd, nw = _maxsize_split(t, 1000, 0)       # under-threshold: no-op
    assert len(kept) == 3 and nd == 0 and nw == 0


def test_engine_matches_simulator_with_maxsize(ray_session, e2e_corpus):
    """Listing bodies cluster at 2002-2006 bytes in the e2e corpus, so
    maxsize=2004 drops a fraction of the listings MID-crawl (their links are
    never discovered) while the crawl keeps running — ordering, url-seen and
    items must still match the simulator exactly, and both sides must agree
    on how many bodies were dropped/warned."""
    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=3,
                      download_maxsize=2004, download_warnsize=700)
    sim = simulate_crawl(e2e_corpus, cfg)
    eng = run_crawl(e2e_corpus, cfg)
    _assert_equal(sim, eng)
    assert eng.metrics["maxsize_dropped"] == sim.metrics["maxsize_dropped"] > 0
    assert eng.metrics["maxsize_warned"] == sim.metrics["maxsize_warned"] > 0
    assert eng.metrics["pages_fetched"] == sim.metrics["pages_fetched"] > 0
    assert len(eng.items) > 0             # the gated crawl still progressed

    # the gate changed the crawl: baseline run fetches more pages and a
    # superset of items (dropped detail pages never yield their item)
    base = run_crawl(e2e_corpus, CrawlConfig(n_filter_shards=2,
                                             n_frontier_shards=3))
    assert base.metrics["pages_fetched"] > eng.metrics["pages_fetched"]
    assert set(eng.items["url"].to_pylist()) < set(base.items["url"].to_pylist())
    assert base.metrics["maxsize_dropped"] == 0


def test_maxsize_drops_before_redirect_middleware(ray_session):
    """An oversized 3xx body aborts before RedirectMiddleware sees it — the
    target must NOT be scheduled (engine and simulator agree)."""
    from scrapy_ray.sources.corpus import CorpusSpec, generate_corpus

    root = "/tmp/scrapy_ray_test/corpus_maxsize_redir"
    generate_corpus(root, CorpusSpec(n_hosts=6, total_pages=300, seed=55,
                                     redirect_frac=0.3))
    # maxsize=1: EVERY body is oversized -> only seeds get scheduled, no
    # links, no redirect targets, zero items, zero fetched
    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2,
                      download_maxsize=1)
    sim = simulate_crawl(root, cfg)
    eng = run_crawl(root, cfg)
    _assert_equal(sim, eng)
    assert eng.metrics["pages_fetched"] == 0
    assert len(eng.items) == 0
    assert eng.metrics["maxsize_dropped"] > 0
    # no link or redirect target was ever scheduled: the crawl never grew
    # beyond the seed set (every emission is a distinct seed url)
    assert len(eng.url_seen) == len(eng.crawl_order)
