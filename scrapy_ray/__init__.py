"""scrapy_ray — a from-scratch, Ray-Data-native crawl/extract engine.

Rebuilds the query and data-processing capabilities of the reference Scrapy
hotel/restaurant crawler (``anhlt59/Scrapy``; see SURVEY.md — the reference
checkout was empty at survey time, so framework semantics are cited as
``[S:scrapy/...]`` module paths per SURVEY.md §0) as distributed dataflow:

- a sharded **URL-frontier actor pool** (per-host priority queues, crawl-delay
  politeness budget, robots.txt cache)                      -> ``state/frontier.py``
- a partitioned **Bloom + exact URL-seen filter**           -> ``state/urlseen.py``
- stateless ``map_batches`` fetch-join / parse / extract stages over zero-copy
  Arrow batches of Common-Crawl-style Parquet pages         -> ``stages/``
- the wave-loop crawl engine + reference-semantics simulator-> ``pipelines/``
- training-data ops (dedup family, ANN, text analysis)      -> ``pipelines/``

Library code NEVER calls ``ray.init()`` / ``ray.shutdown()`` — sessions are
owned by the driver, ``bench.py``, and the pytest fixture only.
"""

__version__ = "0.1.0"
