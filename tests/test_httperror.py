"""HttpError pass-through ([S:scrapy/spidermiddlewares/httperror.py],
spider.handle_httpstatus_list): non-2xx statuses listed in
CrawlConfig.handle_httpstatus_list reach the parser as if OK — their items
and links flow; everything else keeps M10 semantics. Engine == simulator,
and the overlap guard rejects codes an active downloader middleware owns."""

from __future__ import annotations

import pytest

from scrapy_ray.config import CrawlConfig
from scrapy_ray.pipelines.crawl import run_crawl
from scrapy_ray.pipelines.simulator import simulate_crawl


def _assert_equal(a, b):
    assert a.crawl_order.to_pydict() == b.crawl_order.to_pydict()
    sa = set(zip(a.url_seen["url_hash"].to_pylist(), a.url_seen["url"].to_pylist()))
    sb = set(zip(b.url_seen["url_hash"].to_pylist(), b.url_seen["url"].to_pylist()))
    assert sa == sb
    assert a.items.sort_by("url").equals(b.items.sort_by("url"))


def test_engine_matches_simulator_with_allowed_statuses(ray_session, e2e_corpus):
    """error_frac detail pages carry real rendered bodies with 404/500
    statuses — allowing them must surface their items AND their outlinks
    (the crawl grows), identically in engine and simulator."""
    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=3,
                      handle_httpstatus_list=(404, 500))
    sim = simulate_crawl(e2e_corpus, cfg)
    eng = run_crawl(e2e_corpus, cfg)
    _assert_equal(sim, eng)

    base = run_crawl(e2e_corpus, CrawlConfig(n_filter_shards=2,
                                             n_frontier_shards=3))
    # baseline items are a strict subset: the allowed run adds the items
    # extracted from error-status detail pages
    assert set(base.items["url"].to_pylist()) < set(eng.items["url"].to_pylist())


def test_overlap_with_active_middleware_rejected(ray_session, e2e_corpus):
    with pytest.raises(ValueError, match="handle_httpstatus_list overlaps"):
        run_crawl(e2e_corpus, CrawlConfig(handle_httpstatus_list=(500,),
                                          retry_max=2))
    with pytest.raises(ValueError, match="handle_httpstatus_list overlaps"):
        run_crawl(e2e_corpus, CrawlConfig(handle_httpstatus_list=(301,)))
    # same codes are fine once the owning middleware is off
    res = run_crawl(e2e_corpus, CrawlConfig(n_filter_shards=2,
                                            n_frontier_shards=2,
                                            handle_httpstatus_list=(301,),
                                            redirect_max=0, max_pages=50))
    assert res.metrics["pages_fetched"] > 0
