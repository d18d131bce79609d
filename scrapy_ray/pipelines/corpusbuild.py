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
                          min_tokens: int = 3,
                          neardup: bool = False,
                          neardup_tau: float = 0.5) -> dict:
    """items (ITEMS schema or any table with url + extracted_text) ->
    ``<out_dir>/shard=<k>/part.parquet`` training shards.

    Passes: (1) gate — non-null text with >= min_tokens whitespace tokens
    (vectorized in-batch); (2) exact dedup — md5(text) keyed shuffle, keep
    the lexicographically smallest url per digest (the suite's
    dedup_exact_text rule); (3) optional NEAR-dup collapse — MinHash+LSH
    pairs (training.minhash_lsh_pairs, the bounded-memory core) over
    url-hash int64 ids, connected-components keep-min-id, drop-set
    broadcast into a stateless filter. With ``neardup`` the exact-deduped
    stream is spilled to ``<out_dir>/_stage_dedup`` parquet first so the
    LSH pass, the drop filter and the manifest aggregate each re-READ
    instead of re-running the gate+dedup lineage (the between-super-stage
    spill idiom — resumable and no recompute at scale); (4) shard —
    url-hash partitioned, rows written in deterministic (url) order per
    shard with per-row token counts.
    Returns the manifest: rows in/kept/deduped (+ near-dup drops), tokens
    kept, shard sizes."""
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

    n_neardup = 0
    if neardup:
        import shutil

        from scrapy_ray.pipelines.training import (
            _CC_DRIVER_PAIR_LIMIT, cc_hashmin_labels,
            connected_components_keep, minhash_lsh_pairs)

        def with_nid(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            # stable int64 id from the url hash (bijective uint64 view —
            # Ray groupby overflows on uint64 > 2^63). A 64-bit collision
            # can only OVER-drop one extra doc, never corrupt output.
            df["nid"] = hash64(df["url"].tolist()).view(np.int64)
            return df

        stage = os.path.join(out_dir, "_stage_dedup")
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage, exist_ok=True)
        kept.map_batches(with_nid, batch_format="pandas").write_parquet(stage)
        kept = ray.data.read_parquet(stage)

        # pruned 2-column read for the LSH pass (url/digest/n_tokens would
        # otherwise ride the scan for nothing)
        pairs = minhash_lsh_pairs(
            ray.data.read_parquet(stage, columns=["nid", "text"]),
            tau=neardup_tau, id_col="nid", text_col="text")
        if len(pairs):
            touched = np.unique(np.concatenate([
                pairs["doc_a"].to_numpy(zero_copy_only=False),
                pairs["doc_b"].to_numpy(zero_copy_only=False)]))
            if len(pairs) > _CC_DRIVER_PAIR_LIMIT:
                lab = cc_hashmin_labels(
                    pa.table({"doc_a": pairs["doc_a"],
                              "doc_b": pairs["doc_b"]}), touched)
                drop = set(lab.loc[lab["doc_id"] != lab["keep_doc"],
                                   "doc_id"].tolist())
            else:
                keep_t = connected_components_keep(
                    pairs["doc_a"].to_numpy(zero_copy_only=False),
                    pairs["doc_b"].to_numpy(zero_copy_only=False), touched)
                kt = keep_t.to_pandas()
                drop = set(kt.loc[kt["doc_id"] != kt["keep_doc"],
                                  "doc_id"].tolist())
            n_neardup = len(drop)
            drop_ref = ray.put(np.fromiter(drop, dtype=np.int64,
                                           count=len(drop)))

            def drop_neardups(df: pd.DataFrame) -> pd.DataFrame:
                d = ray.get(drop_ref)
                return df[~df["nid"].isin(d)].drop(columns=["nid"])

            kept = kept.map_batches(drop_neardups, batch_format="pandas")
        else:
            kept = kept.drop_columns(["nid"])

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
    if neardup:
        import shutil

        # the spill served its purpose (shards + manifest both read it);
        # drop it so the output dir holds only shard=<k> partitions
        shutil.rmtree(os.path.join(out_dir, "_stage_dedup"),
                      ignore_errors=True)
    return {"rows_in": n_in, "rows_kept": n_kept,
            "rows_dropped": n_in - n_kept,
            "rows_neardup_dropped": n_neardup,
            "tokens": int(agg["tokens"].sum()),
            "shards": {str(int(s)): int(r)
                       for s, r in zip(agg["shard"], agg["rows"])}}
