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


_SEM_DIM = 64     # hashed char-trigram feature dims (feature hashing)
_SEM_Q = 2000     # unit-vector quantization grain for the exact-int cosine
_SEM_PLANES = 8   # SRP sign bits -> 256 clusters (the SemDeDup cells)


def _sem_embed(texts: list[str]) -> np.ndarray:
    """Deterministic vocabulary-free text embedding: signed feature hashing
    of char trigrams into _SEM_DIM dims, L2-normalized — the classic
    hashing-trick embedder, vectorized via ONE hash64 call over the batch's
    flattened trigrams (polars xxhash, seed fixed)."""
    from scrapy_ray.functions.hashing import hash64

    grams: list[str] = []
    bounds = [0]
    for s in texts:
        s = " " + s.lower() + " "
        grams.extend(s[i:i + 3] for i in range(len(s) - 2))
        bounds.append(len(grams))
    E = np.zeros((len(texts), _SEM_DIM), np.float64)
    if grams:
        h = hash64(grams)
        dim = (h % np.uint64(_SEM_DIM)).astype(np.int64)
        sign = np.where((h >> np.uint64(63)).astype(np.uint64).astype(bool),
                        -1.0, 1.0)
        rows = np.repeat(np.arange(len(texts)), np.diff(bounds))
        np.add.at(E, (rows, dim), sign)
    n = np.linalg.norm(E, axis=1)
    n[n == 0] = 1.0
    return E / n[:, None]


def _semdedup_drops(stage: str, tau: float,
                    exclude: set[int] | None = None) -> set[int]:
    """SemDeDup pass over the stage spill (SemDeDup: Abbas et al. 2023 —
    cluster, then drop within-cluster semantic near-dups): embed each doc
    (_sem_embed), assign it to one of 2^_SEM_PLANES SRP sign-bit clusters
    (the k-means-free cell assignment; like SemDeDup's k-means cells, pairs
    split across cell boundaries are the accepted recall trade), then ONE
    groupby(cluster) shuffle and a within-cluster keep-min-nid sweep under
    an EXACT integer cosine test: with v = floor(e * _SEM_Q) of unit e and
    tau = p/100, ``cos >= tau`` is evaluated as ``dot > 0 AND (100*dot)^2
    >= p^2 * |a|^2 * |b|^2`` — |dot| <= _SEM_Q^2 = 4e6 so every term stays
    below 2^63 (the queries9 q_semdedup_embeddings device). The per-cluster
    comparison runs blockwise (4096-row strips vs the prefix) so a hot
    cluster's working set stays bounded; ``exclude`` ids (already dropped by
    an earlier stage) never act as survivors, giving exact sequential-stage
    semantics. Returns the drop set (small: only near-dup losers)."""
    planes = np.random.default_rng(7).standard_normal((_SEM_DIM, _SEM_PLANES))
    p_ref = ray.put(planes)
    p = int(round(tau * 100))          # tau at hundredths keeps ints < 2^63
    excl = exclude or set()

    def assign(t: pa.Table) -> pa.Table:
        P = ray.get(p_ref)
        E = _sem_embed([x if x is not None else ""
                        for x in t["text"].to_pylist()])
        bits = (E @ P) >= 0.0
        cl = bits @ (1 << np.arange(_SEM_PLANES))
        V = np.floor(E * _SEM_Q).astype(np.int64)
        return pa.table({
            "nid": t["nid"],
            "cluster": pa.array(cl.astype(np.int64)),
            "v": pa.array(list(V), type=pa.list_(pa.int64())),
        })

    def cluster_drops(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["nid"].to_numpy().astype(np.int64)
        o = np.argsort(ids, kind="mergesort")   # keep-min-nid = prefix order
        ids = ids[o]
        V = np.stack([np.asarray(v, dtype=np.int64)
                      for v in df["v"].to_numpy()[o]])
        alive = np.array([i not in excl for i in ids])  # earlier-stage drops
        removed = np.zeros(len(ids), dtype=bool)
        n2 = np.einsum("ij,ij->i", V, V)
        for lo in range(0, len(ids), 4096):     # blockwise: bounded memory
            hi = min(lo + 4096, len(ids))
            G = V[lo:hi] @ V[:hi].T             # |dot| <= _SEM_Q^2
            cond = (G > 0) & ((100 * G) ** 2
                              >= p * p * np.outer(n2[lo:hi], n2[:hi]))
            # drop iff ANY alive smaller-nid near-dup exists (the queries9
            # q_semdedup rule — representative need not itself survive, so
            # the sweep is block-order-independent); earlier-stage-dropped
            # docs never act as representatives
            tril = np.tril(np.ones((hi - lo, hi), dtype=bool), k=lo - 1)
            removed[lo:hi] = (cond & tril & alive[None, :hi]).any(axis=1)
        drop = ids[removed & alive]
        return pd.DataFrame({"nid": drop.astype(np.int64)})

    out = (ray.data.read_parquet(stage, columns=["nid", "text"])
           .map_batches(assign, batch_format="pyarrow")
           .groupby("cluster").map_groups(cluster_drops,
                                          batch_format="pandas")
           .to_pandas())
    return set(int(x) for x in out["nid"]) if len(out) else set()


def build_training_corpus(items: pa.Table, out_dir: str,
                          n_shards: int = 8,
                          min_tokens: int = 3,
                          neardup: bool = False,
                          neardup_tau: float = 0.5,
                          semdedup: bool = False,
                          semdedup_tau: float = 0.8) -> dict:
    """items (ITEMS schema or any table with url + extracted_text) ->
    ``<out_dir>/shard=<k>/part.parquet`` training shards.

    Passes: (1) gate — non-null text with >= min_tokens whitespace tokens
    (vectorized in-batch); (2) exact dedup — md5(text) keyed shuffle, keep
    the lexicographically smallest url per digest (the suite's
    dedup_exact_text rule); (3) optional NEAR-dup collapse — MinHash+LSH
    pairs (training.minhash_lsh_pairs, the bounded-memory core) over
    url-hash int64 ids, connected-components keep-min-id, drop-set
    broadcast into a stateless filter; (3b) optional SEMANTIC dedup
    (``semdedup``) — SemDeDup over hashed-trigram embeddings with SRP
    sign-bit cells and an exact-integer within-cell cosine test
    (_semdedup_drops), applied sequentially after the shingle pass. With
    either dedup stage the exact-deduped stream is spilled to
    ``<out_dir>/_stage_dedup`` parquet first so the LSH/semantic passes,
    the drop filter and the manifest aggregate each re-READ instead of
    re-running the gate+dedup lineage (the between-super-stage spill
    idiom — resumable and no recompute at scale); (4) shard — url-hash
    partitioned, rows written in deterministic (url) order per shard with
    per-row token counts.
    Returns the manifest: rows in/kept/deduped (+ near-dup and semantic
    drops), tokens kept, shard sizes."""
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

    n_neardup = n_semdedup = 0
    if neardup or semdedup:
        import shutil

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
        # every column is genuinely needed downstream (url/text/n_tokens for
        # the shard write, digest for schema stability, nid for the drop
        # filter) — the explicit list just makes that intent auditable
        kept = ray.data.read_parquet(
            stage, columns=["url", "text", "digest", "n_tokens", "nid"])

        drop: set[int] = set()
        if neardup:
            from scrapy_ray.pipelines.training import (
                _CC_DRIVER_PAIR_LIMIT, cc_hashmin_labels,
                connected_components_keep, minhash_lsh_pairs)

            # pruned 2-column read for the LSH pass (url/digest/n_tokens
            # would otherwise ride the scan for nothing)
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
                    nd = set(lab.loc[lab["doc_id"] != lab["keep_doc"],
                                     "doc_id"].tolist())
                else:
                    keep_t = connected_components_keep(
                        pairs["doc_a"].to_numpy(zero_copy_only=False),
                        pairs["doc_b"].to_numpy(zero_copy_only=False),
                        touched)
                    kt = keep_t.to_pandas()
                    nd = set(kt.loc[kt["doc_id"] != kt["keep_doc"],
                                    "doc_id"].tolist())
                n_neardup = len(nd)
                drop |= nd
        if semdedup:
            # semantic pass AFTER the shingle pass, with exact sequential
            # semantics: minhash-dropped docs never act as cluster
            # representatives (see _semdedup_drops)
            sd = _semdedup_drops(stage, semdedup_tau, exclude=drop)
            n_semdedup = len(sd)
            drop |= sd
        if drop:
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
    if neardup or semdedup:
        import shutil

        # the spill served its purpose (shards + manifest both read it);
        # drop it so the output dir holds only shard=<k> partitions
        shutil.rmtree(os.path.join(out_dir, "_stage_dedup"),
                      ignore_errors=True)
    return {"rows_in": n_in, "rows_kept": n_kept,
            "rows_dropped": n_in - n_kept,
            "rows_neardup_dropped": n_neardup,
            "rows_semdedup_dropped": n_semdedup,
            "tokens": int(agg["tokens"].sum()),
            "shards": {str(int(s)): int(r)
                       for s, r in zip(agg["shard"], agg["rows"])}}
