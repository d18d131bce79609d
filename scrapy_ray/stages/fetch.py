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
def _fetch_parse_bucket(path: str, urls: list[str], carry: dict, registry_ref=None) -> tuple:
    """Read one corpus bucket with an ``url IN (...)`` parquet filter
    (row-group pruning — bucket files are written sorted by url), attach the
    frontier carry columns, run the fused parse AND the items/links splits
    in-task. Returns (items_table, links_table, n_fetched) — neither html
    nor per-page list columns ever reach the driver, which keeps the wave
    barrier's serial fraction to concat + canonical sort + shard RPCs.
    ``registry_ref``: ray.put snapshot of (PAGE_HANDLERS, URL_ROUTES) —
    driver-side registrations are invisible to worker processes otherwise."""
    import pyarrow.parquet as pq

    from scrapy_ray import schemas
    from scrapy_ray.stages.parse import parse_page_batch, split_items, split_links

    # NB: Ray auto-dereferences ObjectRef args — the task receives the
    # snapshot tuple itself.
    handlers, routes = registry_ref if registry_ref is not None else ({}, [])
    t = pq.read_table(path, filters=pc.field("url").isin(urls),
                      columns=["url", "html", "status"])
    if len(t) == 0:
        return schemas.ITEMS.empty_table(), schemas.LINKS.empty_table(), 0
    rows = [carry[u] for u in t["url"].to_pylist()]
    t = t.append_column("depth", pa.array([r[0] for r in rows], type=pa.int32()))
    t = t.append_column("priority", pa.array([r[1] for r in rows], type=pa.int32()))
    t = t.append_column("seq", pa.array([r[2] for r in rows], type=pa.int64()))
    parsed = parse_page_batch(t, handlers=handlers, routes=routes)
    return split_items(parsed), split_links(parsed, routes=routes), len(parsed)


@ray.remote
def _load_bucket(path: str) -> pa.Table:
    """Decode one bucket into the object store (once; immutable input)."""
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=["url", "html", "status"])


@ray.remote
def _fetch_parse_cached(bucket: pa.Table, urls: list[str], carry: dict,
                        registry_ref=None) -> tuple:
    """In-memory probe variant of _fetch_parse_bucket: ``bucket`` arrives as
    a zero-copy plasma reference; filter + parse + split in-task."""
    from scrapy_ray import schemas
    from scrapy_ray.stages.parse import parse_page_batch, split_items, split_links

    # NB: Ray auto-dereferences ObjectRef args — the task receives the
    # snapshot tuple itself.
    handlers, routes = registry_ref if registry_ref is not None else ({}, [])
    t = bucket.filter(pc.is_in(bucket["url"], value_set=pa.array(urls, type=pa.string())))
    if len(t) == 0:
        return schemas.ITEMS.empty_table(), schemas.LINKS.empty_table(), 0
    rows = [carry[u] for u in t["url"].to_pylist()]
    t = t.append_column("depth", pa.array([r[0] for r in rows], type=pa.int32()))
    t = t.append_column("priority", pa.array([r[1] for r in rows], type=pa.int32()))
    t = t.append_column("seq", pa.array([r[2] for r in rows], type=pa.int64()))
    parsed = parse_page_batch(t, handlers=handlers, routes=routes)
    return split_items(parsed), split_links(parsed, routes=routes), len(parsed)


class BucketCache:
    """Lazy per-bucket ObjectRef cache (engine-held; one decode per bucket
    per run — the corpus is immutable input). ``paths`` is the
    ``corpus_paths()["pages"]`` dict keyed by bucket id; a bucket with no
    directory returns None (fetch miss)."""

    def __init__(self, paths: dict[int, str]):
        self.paths = dict(paths)
        self.refs: dict[int, ray.ObjectRef] = {}

    def get(self, b: int) -> "ray.ObjectRef | None":
        if b not in self.paths:
            return None
        if b not in self.refs:
            self.refs[b] = _load_bucket.remote(self.paths[b])
        return self.refs[b]


def fetch_parse_wave(corpus_root: str, wave: pa.Table, n_buckets: int,
                     cache: "BucketCache | None" = None, registry_ref=None) -> tuple:
    """Wave-loop fast path (SURVEY §7.4.3): the per-wave fetch-join is a
    repeated *small indexed lookup*, for which per-wave ``read_parquet``
    Dataset construction costs seconds (fragment sampling). Raw Ray tasks —
    one per needed bucket — express it with ~ms overhead; this is the
    documented drop-to-raw-Ray exception. Whole-corpus scans still use the
    Dataset path (``fetch_wave`` / sources.readers).

    Returns (items, links, n_fetched); links are unsorted across buckets —
    the caller applies the canonical (parent_seq, link_idx) sort."""
    from scrapy_ray import schemas
    from scrapy_ray.sources.corpus import corpus_paths

    paths = corpus_paths(corpus_root)["pages"]
    hashes = wave["url_hash"].to_numpy(zero_copy_only=False)
    bucket_of = (hashes % np.uint64(n_buckets)).astype(np.int64)
    urls = wave["url"].to_pylist()
    depths = wave["depth"].to_pylist()
    pris = wave["priority"].to_pylist()
    seqs = wave["seq"].to_pylist()
    futs = []
    for b in np.unique(bucket_of):
        if int(b) not in paths:
            continue  # bucket never written (empty at ingest) -> fetch miss
        idx = np.nonzero(bucket_of == b)[0]
        b_urls = [urls[i] for i in idx]
        carry = {urls[i]: (depths[i], pris[i], seqs[i]) for i in idx}
        if cache is not None:
            futs.append(_fetch_parse_cached.remote(cache.get(int(b)), b_urls, carry,
                                                   registry_ref))
        else:
            futs.append(_fetch_parse_bucket.remote(paths[int(b)], b_urls, carry,
                                                   registry_ref))
    items_p, links_p, n = [], [], 0
    for it, lk, nf in ray.get(futs):
        n += nf
        if len(it):
            items_p.append(it)
        if len(lk):
            links_p.append(lk)
    items = pa.concat_tables(items_p) if items_p else schemas.ITEMS.empty_table()
    links = pa.concat_tables(links_p) if links_p else schemas.LINKS.empty_table()
    return items, links, n


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
