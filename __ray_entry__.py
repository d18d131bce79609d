"""Driver contract (graft builder, Ray Data target).

``entry()`` runs the flagship wave-loop crawl on a small deterministic
synthetic pages corpus (the north-rule input shape) and returns the items
table; ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 + the training-data suite. Ray is initialised by the
driver BEFORE this module is imported — nothing here calls ray.init().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: deterministic synthetic Common-Crawl-style corpus
    -> sharded-frontier wave-loop crawl (politeness + robots + Bloom dedup)
    -> extracted hotel/restaurant items as a Ray Dataset."""
    import ray.data

    from scrapy_ray.config import CrawlConfig
    from scrapy_ray.pipelines.crawl import run_crawl
    from scrapy_ray.sources.corpus import CorpusSpec, generate_corpus

    root = "/tmp/scrapy_ray_cache/corpus_entry"
    generate_corpus(root, CorpusSpec(n_hosts=8, total_pages=300, seed=42))
    # big per-wave budget: the smoke check exercises the full engine, not the
    # politeness pacing (that is pinned by tests/test_crawl_e2e.py)
    res = run_crawl(root, CrawlConfig(n_filter_shards=2, n_frontier_shards=2,
                                      per_domain_cap=64))
    return ray.data.from_arrow(res.items)


def _registry() -> dict[str, tuple]:
    from scrapy_ray.pipelines.registry_all import full_registry

    return full_registry()


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
