"""Page featurization stage — the bench's throughput kernel and the model
web-text feature-extraction pipeline: parse + extract + text stats + sketches
in one actor-pool ``map_batches`` pass over raw pages.

This is the shape a 100 TB training-data run has: heavy, vectorizable
per-page CPU (regex extraction, visible text, shingling, MinHash, SimHash)
with all state (compiled regexes, permutation tables) built once per actor in
``__init__`` (SURVEY.md §7.2)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from scrapy_ray.functions.htmlx import extract_detail, visible_text
from scrapy_ray.functions.sketch import _perms, band_keys, minhash_many, simhash64
from scrapy_ray.functions.textnorm import parse_price, parse_rating
from scrapy_ray.functions.hashing import hash64
from scrapy_ray.stages.extract import _KIND

FEATURES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("kind", pa.string()),
        ("name", pa.string()),
        ("rating", pa.float64()),
        ("price_value", pa.float64()),
        ("n_chars", pa.int64()),
        ("n_tokens", pa.int64()),
        ("uniq_ratio", pa.float64()),
        ("simhash", pa.int64()),
        ("minhash", pa.list_(pa.uint64())),
    ]
)


class PageFeaturizer:
    """Callable class -> actor pool; __init__ once per actor."""

    N_PERM = 16

    def __init__(self):
        self._perm_a, self._perm_b = _perms(self.N_PERM)  # warm the perm cache

    def __call__(self, t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in FEATURES_SCHEMA.names}
        urls = t["url"].to_pylist()
        htmls = t["html"].to_pylist()
        for url, html in zip(urls, htmls):
            m = _KIND.match(url)
            kind = m.group(1) if m else ""
            text = visible_text(html)
            toks = text.split()
            uniq = set(toks)
            th = np.unique(hash64(list(uniq))) if uniq else np.empty(0, dtype=np.uint64)
            sig = minhash_many([th], n_perm=self.N_PERM)[0]
            if kind in ("hotel", "restaurant"):
                d = extract_detail(html)
                name = d["name"]
                rating = parse_rating(d["rating"])
                price = parse_price(d["price"])
            else:
                name, rating, price = None, float("nan"), float("nan")
            cols["url"].append(url)
            cols["kind"].append(kind)
            cols["name"].append(name)
            cols["rating"].append(rating)
            cols["price_value"].append(price)
            cols["n_chars"].append(len(text))
            cols["n_tokens"].append(len(toks))
            cols["uniq_ratio"].append(len(uniq) / max(1, len(toks)))
            cols["simhash"].append(int(np.uint64(simhash64(th)).view(np.int64)))
            cols["minhash"].append(sig.tolist())
        return pa.table(cols, schema=FEATURES_SCHEMA)


_TASK_FEATURIZER: PageFeaturizer | None = None


def _featurize_task(t: pa.Table) -> pa.Table:
    """Stateless-task variant: the per-worker featurizer is module-cached, so
    task workers pay construction once. PageFeaturizer's state is tiny; use
    the actor-pool form (``concurrency=N``) when the stage holds real state
    (models/indexes) — an actor pool that reserves EVERY cpu starves the
    read/write stages (measured: 5x slowdown), so leave headroom then."""
    global _TASK_FEATURIZER
    if _TASK_FEATURIZER is None:
        _TASK_FEATURIZER = PageFeaturizer()
    return _TASK_FEATURIZER(t)


def featurize_corpus(corpus_root: str, out_dir: str, concurrency: int | None = None,
                     batch_size: int = 256) -> int:
    """Full-corpus streaming pipeline: read (pruned columns) -> featurize ->
    partitioned parquet sink. Returns row count. ``concurrency=None`` =
    stateless tasks (elastic, default); an int = actor pool of that size."""
    from scrapy_ray.sources.readers import read_pages

    ds = read_pages(corpus_root, columns=["url", "html"])
    if concurrency is None:
        out = ds.map_batches(_featurize_task, batch_format="pyarrow",
                             batch_size=batch_size)
    else:
        out = ds.map_batches(PageFeaturizer, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency)
    out.write_parquet(out_dir)
    import pyarrow.parquet as pq
    import os
    return sum(pq.read_metadata(os.path.join(out_dir, f)).num_rows
               for f in os.listdir(out_dir) if f.endswith(".parquet"))