"""Sitemap seed source ([S:scrapy/spiders/sitemap.py]): urlset parsing,
sitemapindex recursion, gzip sniffing, rule filtering, and a crawl seeded
from corpus sitemaps matching the same crawl seeded from seeds.parquet."""

from __future__ import annotations

import gzip
import os

from scrapy_ray.sources.sitemap import (parse_sitemap, read_sitemap_seeds,
                                        write_corpus_sitemaps)

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example.com/listing/00000</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc> https://a.example.com/hotel/00001 </loc></url>
</urlset>"""

INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>child.xml</loc></sitemap>
  <sitemap><loc>https://cdn.example.com/remote.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_and_index():
    urls, children = parse_sitemap(URLSET)
    assert urls == ["https://a.example.com/listing/00000",
                    "https://a.example.com/hotel/00001"]
    assert children == []
    urls, children = parse_sitemap(INDEX)
    assert urls == []
    assert children == ["child.xml", "https://cdn.example.com/remote.xml"]
    assert parse_sitemap(b"not xml <<<") == ([], [])
    # namespace-free documents parse too (wild-web variance)
    urls, _ = parse_sitemap(b"<urlset><url><loc>https://x/p</loc></url></urlset>")
    assert urls == ["https://x/p"]


def test_read_sitemap_seeds_recursion_gzip_and_rules(tmp_path):
    (tmp_path / "child.xml").write_bytes(URLSET)
    with gzip.open(tmp_path / "z.xml.gz", "wb") as fh:
        fh.write(b"<urlset><url><loc>https://b.example.com/listing/00000</loc></url></urlset>")
    idx = tmp_path / "index.xml"
    idx.write_bytes(b"""<sitemapindex>
      <sitemap><loc>child.xml</loc></sitemap>
      <sitemap><loc>z.xml.gz</loc></sitemap>
      <sitemap><loc>https://cdn.example.com/remote.xml</loc></sitemap>
    </sitemapindex>""")
    seeds = read_sitemap_seeds(str(idx))
    urls = [s["url"] for s in seeds]
    assert "https://a.example.com/listing/00000" in urls
    assert "https://b.example.com/listing/00000" in urls     # gz child
    assert "https://cdn.example.com/remote.xml" in urls      # http child -> seed
    only_listing = read_sitemap_seeds(str(idx), allow=r"/listing/")
    assert all("/listing/" in s["url"] for s in only_listing)
    assert len(only_listing) == 2


def test_crawl_seeded_from_sitemaps_matches_seed_file(ray_session, e2e_corpus):
    from scrapy_ray.config import CrawlConfig
    from scrapy_ray.pipelines.crawl import run_crawl

    idx = write_corpus_sitemaps(e2e_corpus)
    assert os.path.exists(idx)
    sm_seeds = read_sitemap_seeds(idx)
    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, max_pages=120)
    a = run_crawl(e2e_corpus, cfg, seeds=sm_seeds)
    b = run_crawl(e2e_corpus, cfg)          # seeds.parquet path
    assert a.crawl_order.to_pydict() == b.crawl_order.to_pydict()
    assert a.items.sort_by("url").equals(b.items.sort_by("url"))


def test_parse_robots_collects_sitemap_directives():
    from scrapy_ray.state.robots import parse_robots

    r = parse_robots(
        "Sitemap: sitemaps/a.xml\n"          # before any group
        "User-agent: googlebot\nDisallow: /\n"
        "Sitemap: https://a.example.com/sm.xml\n"  # inside a non-* group
        "User-agent: *\nAllow: /\nSitemap: file:///tmp/x.xml\n")
    # group-independent per REP: all three collected
    assert r.sitemaps == ["sitemaps/a.xml",
                          "https://a.example.com/sm.xml",
                          "file:///tmp/x.xml"]
    # rule matching unaffected
    assert r.is_allowed("/hotel/1")


def test_crawl_seeded_from_robots_sitemaps(ray_session, tmp_path):
    """End-to-end SitemapSpider-style discovery: corpus robots.txt announce
    their sitemaps; the crawl seeded from those announcements equals the
    crawl seeded from seeds.parquet (private corpus copy — directive
    injection mutates robots.parquet)."""
    from scrapy_ray.config import CrawlConfig
    from scrapy_ray.pipelines.crawl import run_crawl
    from scrapy_ray.sources.corpus import CorpusSpec, generate_corpus
    from scrapy_ray.sources.sitemap import (read_robots_sitemap_seeds,
                                            write_robots_sitemap_directives)

    root = str(tmp_path / "corpus")
    generate_corpus(root, CorpusSpec(n_hosts=6, total_pages=200, seed=77))
    write_corpus_sitemaps(root)
    n = write_robots_sitemap_directives(root)
    assert n == 6

    seeds = read_robots_sitemap_seeds(root)
    assert len(seeds) == 6

    cfg = CrawlConfig(n_filter_shards=2, n_frontier_shards=2, max_pages=100)
    a = run_crawl(root, cfg, seeds=seeds)
    b = run_crawl(root, cfg)                 # seeds.parquet path
    assert a.crawl_order.to_pydict() == b.crawl_order.to_pydict()
    assert a.items.sort_by("url").equals(b.items.sort_by("url"))
