"""Regenerate checked-in goldens (tests/goldens/) from the reference-semantics
simulator + the deterministic corpus (FIXTURES.md §4).

Run: python scripts/gen_goldens.py
Owns a Ray session (scripts only — never library code).
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scrapy_ray.config import CrawlConfig
from scrapy_ray.functions.htmlx import extract_detail, extract_listing, visible_text
from scrapy_ray.pipelines.simulator import simulate_crawl
from scrapy_ray.sources.corpus import corpus_paths, generate_corpus

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from conftest import E2E_ROOT, E2E_SPEC  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    generate_corpus(E2E_ROOT, E2E_SPEC, use_ray=False)

    # 1. extraction goldens: first 12 detail + 3 listing pages by url order
    full = pa.concat_tables([pq.read_table(p) for p in corpus_paths(E2E_ROOT)["pages"].values()])
    full = full.sort_by("url")
    goldens = []
    nd = nl = 0
    for i in range(len(full)):
        url = full["url"][i].as_py()
        html = full["html"][i].as_py()
        is_listing = "/listing/" in url
        if is_listing and nl < 3:
            nl += 1
            goldens.append({"url": url, "kind": "listing",
                            "extracted_text": visible_text(html),
                            "card_names": [c["name"] for c in extract_listing(html)["cards"]]})
        elif not is_listing and nd < 12:
            nd += 1
            d = extract_detail(html)
            goldens.append({"url": url, "kind": "detail",
                            "extracted_text": visible_text(html),
                            "item": {k: d[k] for k in
                                     ("name", "address", "rating", "price",
                                      "review_count", "reviews")}})
        if nd >= 12 and nl >= 3:
            break
    with open(os.path.join(GOLDEN_DIR, "extraction.json"), "w") as fh:
        json.dump(goldens, fh, indent=1, ensure_ascii=False)

    # 2. crawl goldens from the simulator (default e2e config)
    cfg = CrawlConfig(n_filter_shards=3, n_frontier_shards=3)
    sim = simulate_crawl(E2E_ROOT, cfg)
    pq.write_table(sim.crawl_order, os.path.join(GOLDEN_DIR, "crawl_order.parquet"))
    pq.write_table(sim.url_seen, os.path.join(GOLDEN_DIR, "url_seen.parquet"))
    pq.write_table(sim.items, os.path.join(GOLDEN_DIR, "items.parquet"))
    print("goldens written:", sim.metrics)


if __name__ == "__main__":
    main()
