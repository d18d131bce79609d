"""Programmatic library API (SURVEY §3.3 — the ``CrawlerRunner`` embedding
analogue): one-call crawl returning Ray Datasets, plus the selector-debug
helper. Never calls ray.init — the caller (CLI / driver / tests) owns the
session.

    from scrapy_ray.api import crawl, parse_one
    items_ds = crawl("/path/to/corpus", CrawlConfig(max_pages=1000))
"""

from __future__ import annotations

import ray.data

from scrapy_ray.config import CrawlConfig
from scrapy_ray.pipelines.crawl import CrawlResult, run_crawl
from scrapy_ray.registry import page_handler, parse_one, parse_stage, url_route
from scrapy_ray.sources.sinks import export_items

__all__ = ["crawl", "crawl_result", "parse_one", "parse_stage",
           "page_handler", "url_route", "export_items", "CrawlConfig"]


def crawl(corpus_root: str, cfg: CrawlConfig | None = None,
          seeds: list[dict] | None = None, resume: bool = False) -> ray.data.Dataset:
    """Run the wave-loop crawl and return the extracted items as a Ray
    Dataset (``engine.api.run(config) -> Dataset`` per SURVEY §3.3)."""
    return ray.data.from_arrow(run_crawl(corpus_root, cfg, seeds=seeds,
                                         resume=resume).items)


def crawl_result(corpus_root: str, cfg: CrawlConfig | None = None,
                 seeds: list[dict] | None = None, resume: bool = False) -> CrawlResult:
    """Full result (items + crawl_order + url_seen + metrics) for callers
    that need the determinism artifacts, not just the items."""
    return run_crawl(corpus_root, cfg, seeds=seeds, resume=resume)
