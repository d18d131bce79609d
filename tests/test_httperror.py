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


def test_retry_redirect_overlap_rejected(ray_session, e2e_corpus):
    """A status claimed by BOTH retry and redirect middlewares would be
    double-subtracted from the per-task error count — rejected upfront."""
    with pytest.raises(ValueError, match="retry_codes and redirect_codes"):
        run_crawl(e2e_corpus, CrawlConfig(retry_max=2, retry_codes=(301, 500)))
    # fine when either middleware is off
    res = run_crawl(e2e_corpus, CrawlConfig(n_filter_shards=2,
                                            n_frontier_shards=2,
                                            retry_max=2, retry_codes=(301, 500),
                                            redirect_max=0, max_pages=20))
    assert res.metrics["pages_fetched"] > 0


ROBOTS_UA = """# comment
User-agent: googlebot
User-agent: bingbot
Disallow: /hotel/
Crawl-delay: 9

User-agent: raybot-images
Disallow: /restaurant/

User-agent: raybot
Disallow: /listing/

User-agent: *
Allow: /
Sitemap: sitemaps/x.xml
"""


def test_robots_ua_group_selection():
    """RFC 9309 / Protego: longest agent token that substring-matches the
    UA wins; '*' is the fallback; shared-agent groups work; Sitemap lines
    are group-independent."""
    from scrapy_ray.state.robots import parse_robots

    star = parse_robots(ROBOTS_UA)                       # default '*'
    assert star.is_allowed("/hotel/1") and star.is_allowed("/listing/0")

    g = parse_robots(ROBOTS_UA, "Mozilla/5.0 (compatible; Googlebot/2.1)")
    assert not g.is_allowed("/hotel/1")
    assert g.is_allowed("/listing/0")
    assert g.crawl_delay == 9.0                          # rides its group
    assert g.sitemaps == ["sitemaps/x.xml"]              # group-independent

    b = parse_robots(ROBOTS_UA, "BingBot/1.0")           # shared group
    assert not b.is_allowed("/hotel/1")

    r = parse_robots(ROBOTS_UA, "raybot/0.1")
    assert not r.is_allowed("/listing/0")                # raybot group
    assert r.is_allowed("/restaurant/2")                 # NOT raybot-images

    ri = parse_robots(ROBOTS_UA, "raybot-images/0.1")    # longest token wins
    assert not ri.is_allowed("/restaurant/2")
    assert ri.is_allowed("/listing/0")

    unk = parse_robots(ROBOTS_UA, "curl/8")              # fallback to '*'
    assert unk.is_allowed("/hotel/1")

    none = parse_robots("Disallow: /x/\n", "anybot")     # pre-group rules
    assert not none.is_allowed("/x/1")                   # act as fallback


def test_engine_matches_simulator_with_user_agent(ray_session, tmp_path):
    """A corpus whose robots carry UA-specific groups: crawling as
    'raybot' obeys the raybot group (hotel pages denied) identically in
    engine and simulator, and differs from the '*' crawl."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrapy_ray import schemas
    from scrapy_ray.sources.corpus import CorpusSpec, corpus_paths, generate_corpus

    root = str(tmp_path / "corpus")
    generate_corpus(root, CorpusSpec(n_hosts=5, total_pages=200, seed=11))
    p = corpus_paths(root)["robots"]
    t = pq.read_table(p)
    body = ("User-agent: raybot\nDisallow: /hotel/\n\n"
            "User-agent: *\nAllow: /\n")
    pq.write_table(pa.table({"host": t["host"].to_pylist(),
                             "body": [body] * len(t)},
                            schema=schemas.ROBOTS), p)

    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2,
                      user_agent="raybot/1.0")
    sim = simulate_crawl(root, cfg)
    eng = run_crawl(root, cfg)
    _assert_equal(sim, eng)
    assert eng.metrics["robots_denied"] == sim.metrics["robots_denied"] > 0
    assert not any("/hotel/" in u for u in eng.items["url"].to_pylist())

    base = run_crawl(root, CrawlConfig(n_filter_shards=2, n_frontier_shards=2))
    assert base.metrics["robots_denied"] == 0
    assert any("/hotel/" in u for u in base.items["url"].to_pylist())
