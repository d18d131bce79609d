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
    from scrapy_ray.pipelines.crawl_queries import CRAWL_QUERIES
    from scrapy_ray.pipelines.multimodal import MULTIMODAL_QUERIES
    from scrapy_ray.pipelines.queries import QUERIES
    from scrapy_ray.pipelines.queries2 import QUERIES2
    from scrapy_ray.pipelines.queries3 import QUERIES3
    from scrapy_ray.pipelines.queries4 import QUERIES4
    from scrapy_ray.pipelines.queries5 import QUERIES5
    from scrapy_ray.pipelines.queries6 import QUERIES6
    from scrapy_ray.pipelines.queries7 import QUERIES7
    from scrapy_ray.pipelines.queries8 import QUERIES8
    from scrapy_ray.pipelines.queries9 import QUERIES9
    from scrapy_ray.pipelines.queries10 import QUERIES10
    from scrapy_ray.pipelines.queries11 import QUERIES11
    from scrapy_ray.pipelines.queries12 import QUERIES12
    from scrapy_ray.pipelines.queries13 import QUERIES13
    from scrapy_ray.pipelines.queries14 import QUERIES14
    from scrapy_ray.pipelines.queries15 import QUERIES15
    from scrapy_ray.pipelines.queries16 import QUERIES16
    from scrapy_ray.pipelines.queries17 import QUERIES17
    from scrapy_ray.pipelines.queries18 import QUERIES18
    from scrapy_ray.pipelines.queries19 import QUERIES19
    from scrapy_ray.pipelines.queries20 import QUERIES20
    from scrapy_ray.pipelines.queries21 import QUERIES21
    from scrapy_ray.pipelines.queries22 import QUERIES22
    from scrapy_ray.pipelines.queries23 import QUERIES23
    from scrapy_ray.pipelines.skew import SKEW_QUERIES
    from scrapy_ray.pipelines.textqual import TEXTQUAL_QUERIES
    from scrapy_ray.pipelines.training import TRAINING_QUERIES

    reg: dict[str, tuple] = {}
    reg.update(QUERIES)
    reg.update(QUERIES2)
    reg.update(QUERIES3)
    reg.update(QUERIES4)
    reg.update(QUERIES5)
    reg.update(QUERIES6)
    reg.update(QUERIES7)
    reg.update(QUERIES8)
    reg.update(QUERIES9)
    reg.update(QUERIES10)
    reg.update(QUERIES11)
    reg.update(QUERIES12)
    reg.update(QUERIES13)
    reg.update(QUERIES14)
    reg.update(QUERIES15)
    reg.update(QUERIES16)
    reg.update(QUERIES17)
    reg.update(QUERIES18)
    reg.update(QUERIES19)
    reg.update(QUERIES20)
    reg.update(QUERIES21)
    reg.update(QUERIES22)
    reg.update(QUERIES23)
    reg.update(TRAINING_QUERIES)
    reg.update(TEXTQUAL_QUERIES)
    reg.update(MULTIMODAL_QUERIES)
    reg.update(SKEW_QUERIES)
    reg.update(CRAWL_QUERIES)
    return reg


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
