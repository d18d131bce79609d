"""Fetch stage = partition-pruned join of a frontier wave against the pages
corpus (SURVEY.md §2.1 S2, §2.4 J1).

The reference downloads over HTTP ([S:scrapy/core/downloader/handlers/
http11.py]); per the north rule, pages come from a Parquet corpus bucketed by
``url_hash % n_buckets``, so a wave only scans the bucket files its URLs can
live in. The wave side is small relative to the corpus -> broadcast it via
``ray.put`` once and hash-probe inside each ``map_batches`` task (the
broadcast-small-side join; no shuffle of the corpus).

At 100 TB the same shape holds: buckets are directories of row-grouped
Parquet, the wave's bucket set prunes the read, and the probe table is an
object-store broadcast. Nothing here materializes the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from scrapy_ray.sources.readers import read_pages

# frontier columns carried through onto fetched pages (J3 denormalization)
CARRY = ["depth", "priority", "seq", "callback"]


def _probe(batch: pa.Table, lookup_ref) -> pa.Table:
    lookup = ray.get(lookup_ref) if isinstance(lookup_ref, ray.ObjectRef) else lookup_ref
    mask = pc.is_in(batch["url"], value_set=pa.array(list(lookup.keys()), type=pa.string()))
    hit = batch.filter(mask)
    if len(hit) == 0:
        return _empty_fetched(batch.schema)
    rows = [lookup[u] for u in hit["url"].to_pylist()]
    hit = hit.append_column("depth", pa.array([r[0] for r in rows], type=pa.int32()))
    hit = hit.append_column("priority", pa.array([r[1] for r in rows], type=pa.int32()))
    hit = hit.append_column("seq", pa.array([r[2] for r in rows], type=pa.int64()))
    hit = hit.append_column("callback", pa.array([r[3] for r in rows], type=pa.string()))
    return hit


def _empty_fetched(page_schema: pa.Schema) -> pa.Table:
    s = page_schema
    for name, typ in zip(CARRY, (pa.int32(), pa.int32(), pa.int64(), pa.string())):
        s = s.append(pa.field(name, typ))
    return s.empty_table()


@ray.remote
def _fetch_parse_bucket(path: str, urls: list[str], carry: dict) -> pa.Table:
    """Read one corpus bucket with an ``url IN (...)`` parquet filter
    (row-group pruning — bucket files are written sorted by url), attach the
    frontier carry columns, and run the fused parse in-task. Returns the
    parsed table (no html leaves the task)."""
    import pyarrow.parquet as pq

    from scrapy_ray.stages.parse import parse_page_batch

    t = pq.read_table(path, filters=pc.field("url").isin(urls),
                      columns=["url", "html", "status"])
    if len(t) == 0:
        from scrapy_ray.stages.parse import PARSED_SCHEMA
        return PARSED_SCHEMA.empty_table()
    rows = [carry[u] for u in t["url"].to_pylist()]
    t = t.append_column("depth", pa.array([r[0] for r in rows], type=pa.int32()))
    t = t.append_column("priority", pa.array([r[1] for r in rows], type=pa.int32()))
    t = t.append_column("seq", pa.array([r[2] for r in rows], type=pa.int64()))
    return parse_page_batch(t)


def fetch_parse_wave(corpus_root: str, wave: pa.Table, n_buckets: int) -> pa.Table:
    """Wave-loop fast path (SURVEY §7.4.3): the per-wave fetch-join is a
    repeated *small indexed lookup*, for which per-wave ``read_parquet``
    Dataset construction costs seconds (fragment sampling). Raw Ray tasks —
    one per needed bucket — express it with ~ms overhead; this is the
    documented drop-to-raw-Ray exception. Whole-corpus scans still use the
    Dataset path (``fetch_wave`` / sources.readers)."""
    from scrapy_ray.sources.corpus import corpus_paths
    from scrapy_ray.stages.parse import PARSED_SCHEMA

    paths = corpus_paths(corpus_root)["pages"]
    hashes = wave["url_hash"].to_numpy(zero_copy_only=False)
    bucket_of = (hashes % np.uint64(n_buckets)).astype(np.int64)
    urls = wave["url"].to_pylist()
    depths = wave["depth"].to_pylist()
    pris = wave["priority"].to_pylist()
    seqs = wave["seq"].to_pylist()
    futs = []
    for b in np.unique(bucket_of):
        idx = np.nonzero(bucket_of == b)[0]
        b_urls = [urls[i] for i in idx]
        carry = {urls[i]: (depths[i], pris[i], seqs[i]) for i in idx}
        futs.append(_fetch_parse_bucket.remote(paths[int(b)], b_urls, carry))
    parts = [p for p in ray.get(futs) if len(p)]
    return pa.concat_tables(parts) if parts else PARSED_SCHEMA.empty_table()


def fetch_wave(corpus_root: str, wave: pa.Table, n_buckets: int) -> ray.data.Dataset:
    """wave (FRONTIER rows) -> Dataset of fetched pages + carry-through cols.

    Misses (dangling links) simply produce no row — the reference's 404 path.
    """
    hashes = wave["url_hash"].to_numpy(zero_copy_only=False)
    buckets = np.unique(hashes % np.uint64(n_buckets)).astype(int).tolist()
    lookup = {
        u: (int(d), int(p), int(s), cb)
        for u, d, p, s, cb in zip(
            wave["url"].to_pylist(),
            wave["depth"].to_pylist(),
            wave["priority"].to_pylist(),
            wave["seq"].to_pylist(),
            wave["callback"].to_pylist(),
        )
    }
    ref = ray.put(lookup)
    ds = read_pages(corpus_root, buckets=buckets)
    return ds.map_batches(lambda b: _probe(b, ref), batch_format="pyarrow")
