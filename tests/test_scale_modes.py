"""Scale-mode behaviors: Bloom-only dedup (10^10-URL memory-bounded path),
delay-off bench semantics, randomized engine-vs-simulator property check."""

from __future__ import annotations

import pyarrow as pa
import pytest

from scrapy_ray.config import CrawlConfig
from scrapy_ray.pipelines.crawl import run_crawl
from scrapy_ray.pipelines.simulator import simulate_crawl
from scrapy_ray.sources.corpus import CorpusSpec, generate_corpus


def test_bloom_only_mode_matches_exact(ray_session, e2e_corpus):
    """With the bloom sized well under capacity, the Bloom-only crawl visits
    the same pages in the same order as the exact-set crawl (no false
    positives at this fill ratio with overwhelming probability)."""
    exact = run_crawl(e2e_corpus, CrawlConfig(n_filter_shards=2, n_frontier_shards=2,
                                              max_waves=8))
    bloom = run_crawl(e2e_corpus, CrawlConfig(n_filter_shards=2, n_frontier_shards=2,
                                              max_waves=8, exact_urlseen=False,
                                              bloom_capacity=200_000))
    assert bloom.crawl_order.to_pydict() == exact.crawl_order.to_pydict()
    assert bloom.metrics["url_seen"] == exact.metrics["url_seen"]
    assert len(bloom.url_seen) == 0  # exact set intentionally unavailable
    assert bloom.items.sort_by("url").equals(exact.items.sort_by("url"))


def test_delay_off_mode_matches_simulator(ray_session, e2e_corpus):
    """The bench configuration (respect_crawl_delay=False, huge caps) is
    still pinned to the simulator under identical flags."""
    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=3,
                      per_domain_cap=1 << 20, respect_crawl_delay=False)
    sim = simulate_crawl(e2e_corpus, cfg)
    eng = run_crawl(e2e_corpus, cfg)
    assert sim.crawl_order.to_pydict() == eng.crawl_order.to_pydict()
    assert set(sim.url_seen["url"].to_pylist()) == set(eng.url_seen["url"].to_pylist())
    assert sim.items.sort_by("url").equals(eng.items.sort_by("url"))
    # delay-off drains in far fewer waves than the politeness-on golden run
    assert eng.metrics["waves"] < 25


@pytest.mark.parametrize("seed,n_hosts,pages", [(7, 5, 150), (13, 9, 260)])
def test_random_corpora_engine_equals_simulator(ray_session, tmp_path, seed, n_hosts, pages):
    """Property-style: engine == simulator on corpora it has never seen."""
    root = str(tmp_path / f"corpus_{seed}")
    generate_corpus(root, CorpusSpec(n_hosts=n_hosts, total_pages=pages, seed=seed),
                    use_ray=False)
    cfg = CrawlConfig(n_filter_shards=3, n_frontier_shards=2, download_delay=0.5)
    sim = simulate_crawl(root, cfg)
    eng = run_crawl(root, cfg)
    assert sim.crawl_order.to_pydict() == eng.crawl_order.to_pydict()
    assert set(sim.url_seen["url"].to_pylist()) == set(eng.url_seen["url"].to_pylist())
    assert sim.items.sort_by("url").equals(eng.items.sort_by("url"))
