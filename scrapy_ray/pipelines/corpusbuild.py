"""Crawl-to-training-corpus composition — the end-to-end user workflow as
ONE pipeline (`python -m scrapy_ray pipeline`): crawl a pages corpus, then
push the extracted items through the training-data passes the suite
implements individually — length/quality gate, exact text dedup, token
counting, deterministic shard export — and write hive-partitioned training
shards. Every stage is a Dataset op (map_batches partials + one dedup
shuffle + one shard write); the driver holds only the manifest counters.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def build_training_corpus(items: pa.Table, out_dir: str,
                          n_shards: int = 8,
                          min_tokens: int = 3) -> dict:
    """items (ITEMS schema or any table with url + extracted_text) ->
    ``<out_dir>/shard=<k>/part.parquet`` training shards.

    Passes: (1) gate — non-null text with >= min_tokens whitespace tokens
    (vectorized in-batch); (2) exact dedup — md5(text) keyed shuffle, keep
    the lexicographically smallest url per digest (the suite's
    dedup_exact_text rule); (3) shard — url-hash partitioned, rows written
    in deterministic (url) order per shard with per-row token counts.
    Returns the manifest: rows in/kept/deduped, tokens kept, shard sizes."""
    from scrapy_ray.functions.hashing import hash64

    ds = ray.data.from_arrow(items.select(["url", "extracted_text"]))
    n_in = len(items)

    def gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.and_(t["extracted_text"].is_valid(),
                     pc.greater_equal(
                         pc.count_substring_regex(
                             pc.cast(t["extracted_text"], pa.string()),
                             r"\S+"),
                         min_tokens))
        hit = t.filter(ok)
        texts = hit["extracted_text"].to_pylist()
        digests = [hashlib.md5(x.encode()).hexdigest() for x in texts]
        import pyarrow.compute as pc2
        ntok = pc2.count_substring_regex(hit["extracted_text"], r"\S+")
        return pa.table({
            "url": hit["url"],
            "text": hit["extracted_text"],
            "digest": pa.array(digests, type=pa.string()),
            "n_tokens": pc2.cast(ntok, pa.int64()),
        })

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["digest", "url"], kind="mergesort")
        return df.groupby("digest", sort=False).head(1)

    kept = (ds.map_batches(gate, batch_format="pyarrow")
              .groupby("digest").map_groups(keep_first, batch_format="pandas"))

    def shard_of(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["shard"] = (hash64(df["url"].tolist())
                       % np.uint64(n_shards)).astype(np.int64)
        return df

    sharded = kept.map_batches(shard_of, batch_format="pandas")

    # hive-partitioned distributed write (resumable layout: one directory
    # per shard; a failed run re-writes only missing shards)
    os.makedirs(out_dir, exist_ok=True)
    sharded.write_parquet(out_dir, partition_cols=["shard"])

    # manifest from a tiny per-shard aggregate (never the row stream)
    from ray.data.aggregate import Count, Sum

    agg = (sharded.groupby("shard")
                  .aggregate(Count(alias_name="rows"),
                             Sum("n_tokens", alias_name="tokens"))
                  .to_pandas().sort_values("shard"))
    n_kept = int(agg["rows"].sum())
    return {"rows_in": n_in, "rows_kept": n_kept,
            "rows_dropped": n_in - n_kept,
            "tokens": int(agg["tokens"].sum()),
            "shards": {str(int(s)): int(r)
                       for s, r in zip(agg["shard"], agg["rows"])}}
