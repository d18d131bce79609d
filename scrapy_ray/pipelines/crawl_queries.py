"""Crawl-engine pipelines exposed as driver queries (rows-only: the frontier
/ dedup / politeness semantics are not SQL-expressible — they are verified
against the reference-semantics simulator + goldens instead, SURVEY.md §5.2).

The synthetic corpus is generated deterministically per scale into /tmp and
cached (north-rule input shape: url, warc_ts, html, text, lang)."""

from __future__ import annotations

import pyarrow as pa

from scrapy_ray.config import CrawlConfig
from scrapy_ray.sources.corpus import CorpusSpec, generate_corpus

_Q_SPEC = CorpusSpec(n_hosts=12, total_pages=400, seed=42)
_Q_ROOT = "/tmp/scrapy_ray_cache/corpus_queries"
_CFG = CrawlConfig(n_filter_shards=2, n_frontier_shards=2)

_cache: dict[str, object] = {}


def _crawl_result():
    """One cached crawl per process (the three queries expose its tables)."""
    if "res" not in _cache:
        from scrapy_ray.pipelines.crawl import run_crawl

        generate_corpus(_Q_ROOT, _Q_SPEC)
        _cache["res"] = run_crawl(_Q_ROOT, _CFG)
    return _cache["res"]


def q_crawl_items(sf_dir: str) -> pa.Table:
    """Full wave-loop crawl -> extracted hotel/restaurant items table
    [B:north_star]. sf_dir is unused (pages corpus is the north-rule input,
    synthesized deterministically)."""
    return _crawl_result().items


def q_crawl_order(sf_dir: str) -> pa.Table:
    """Deterministic crawl-ordering log (priority desc, seq asc per wave)."""
    return _crawl_result().crawl_order


def q_crawl_url_seen(sf_dir: str) -> pa.Table:
    """Final URL-seen set from the partitioned Bloom+exact filter shards."""
    return _crawl_result().url_seen.sort_by("url")


def q_extract_items_corpus(sf_dir: str) -> pa.Table:
    """The minimum slice (SURVEY §7.0): full-corpus Dataset scan ->
    map_batches(extract) -> items, no frontier. Pure Ray Data pipeline."""
    from scrapy_ray.sources.readers import read_pages
    from scrapy_ray.stages.extract import extract_items_batch

    generate_corpus(_Q_ROOT, _Q_SPEC)
    ds = read_pages(_Q_ROOT, columns=["url", "html", "status"])
    out = ds.map_batches(extract_items_batch, batch_format="pyarrow")
    t = pa.concat_tables(list(out.iter_batches(batch_size=None, batch_format="pyarrow")))
    return t.sort_by("url")


def q_crawl_items_dedup(sf_dir: str) -> pa.Table:
    """A4 item dedup on the crawl output: same hotel reached via two paths
    collapses to the first (lowest-url) row per (name, address) natural key
    — hash-partition + per-group first ([S:scrapy project DropItem pipeline
    pattern])."""
    import pandas as pd
    import ray.data

    items = _crawl_result().items

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("url").head(1)

    out = ray.data.from_arrow(items.select(["name", "address", "url", "rating"])) \
        .groupby(["name", "address"]).map_groups(first, batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None).sort_by("url")


def q_crawl_redirects(sf_dir: str) -> pa.Table:
    """Redirect-middleware crawl, driver-visible (round 3): crawl a corpus
    with 301 '/moved/' aliases and emit per-host (aliases scheduled,
    redirect targets extracted). Rows-only; exact engine==simulator
    equality on this corpus is pinned in tests/test_redirects.py; the
    in-query assertion makes a dead redirect path loud."""
    from scrapy_ray.functions.urlnorm import hosts_of
    from scrapy_ray.pipelines.crawl import run_crawl

    root = "/tmp/scrapy_ray_cache/corpus_redirq"
    spec = CorpusSpec(n_hosts=8, total_pages=400, seed=77, redirect_frac=0.25)
    generate_corpus(root, spec)
    res = run_crawl(root, CrawlConfig(n_filter_shards=2, n_frontier_shards=2))
    import pandas as pd
    seen = res.url_seen["url"].to_pylist()
    moved = [u for u in seen if "/moved/" in u]
    assert moved, "redirect corpus produced no scheduled aliases"
    df = pd.DataFrame({"host": hosts_of(moved)})
    g = df.groupby("host").size().reset_index(name="n_aliases")
    item_urls = res.items["url"].to_pylist()
    from scrapy_ray.sources.corpus import is_moved
    tgt = pd.DataFrame({"host": hosts_of(item_urls),
                        "is_tgt": [is_moved(spec, int(h.split(".")[0][1:]),
                                            int(u.rsplit("/", 1)[1]))
                                   for h, u in zip(hosts_of(item_urls), item_urls)]})
    t2 = tgt[tgt.is_tgt].groupby("host").size().reset_index(name="n_redirected_items")
    out = g.merge(t2, on="host", how="left").fillna(0)
    out["n_redirected_items"] = out["n_redirected_items"].astype("int64")
    out["n_aliases"] = out["n_aliases"].astype("int64")
    assert out["n_redirected_items"].sum() > 0, "no redirect target extracted"
    return pa.Table.from_pandas(out.sort_values("host", ignore_index=True),
                                preserve_index=False).replace_schema_metadata(None)


CRAWL_QUERIES = {
    "crawl_items": (q_crawl_items, None),
    "crawl_order": (q_crawl_order, None),
    "crawl_url_seen": (q_crawl_url_seen, None),
    "crawl_redirects": (q_crawl_redirects, None),
    "crawl_items_dedup": (q_crawl_items_dedup, None),
    "extract_items_corpus": (q_extract_items_corpus, None),
}
