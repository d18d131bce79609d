"""Corpus ingest — bring ANY pages table into the engine's bucketed layout
(SURVEY.md §2.1: the migration path for a reference user's existing data).

``import_pages(src, out_root, n_buckets)`` accepts parquet/json/csv inputs
with at least (url, html|text) columns, normalizes to the PAGES schema
[B:input_hint], computes ``url_hash``/``bucket``, and writes the hive-
partitioned bucket layout via Ray Data streaming — read -> map_batches ->
``write_parquet(partition_cols=["bucket"])``. Nothing materializes; a
100 TB import is the same pipeline with more files.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from scrapy_ray.functions.hashing import hash64
from scrapy_ray.functions.htmlx import visible_text
from scrapy_ray.functions.urlnorm import canonicalize_urls, hosts_of

_EPOCH_US = 1_704_067_200_000_000


def _normalize_batch(t: pa.Table, n_buckets: int) -> pa.Table:
    urls = canonicalize_urls(t["url"].to_pylist())
    n = len(urls)
    if "html" in t.column_names:
        html_col = pc.cast(t["html"], pa.binary())
        htmls = html_col.to_pylist()
    else:  # text-only source: treat the text as the body
        htmls = [s.encode() if s else b"" for s in t["text"].to_pylist()]
        html_col = pa.array(htmls, type=pa.binary())
    if "text" in t.column_names:
        text_col = pc.cast(t["text"], pa.string())
    else:
        text_col = pa.array([visible_text(h) for h in htmls], type=pa.string())
    if "warc_ts" in t.column_names:
        ts = pc.cast(t["warc_ts"], pa.timestamp("us"))
    else:
        ts = pa.array(np.full(n, _EPOCH_US, dtype=np.int64), type=pa.timestamp("us"))
    lang = (pc.cast(t["lang"], pa.string()) if "lang" in t.column_names
            else pa.array(["und"] * n, type=pa.string()))
    status = (pc.cast(t["status"], pa.int16()) if "status" in t.column_names
              else pa.array(np.full(n, 200, dtype=np.int16)))
    # location only when the source carries it: a location-less layout lets
    # the fetch stage skip the redirect column entirely (meta has_redirects)
    location = (pc.cast(t["location"], pa.string())
                if "location" in t.column_names else None)
    h = hash64(urls) if urls else np.empty(0, dtype=np.uint64)
    cols = {
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": ts,
        "html": html_col,
        "text": text_col,
        "lang": lang,
        "host": pa.array(hosts_of(urls), type=pa.string()),
        "status": status,
        "url_hash": pa.array(h, type=pa.uint64()),
        "bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int32)),
    }
    if location is not None:
        cols["location"] = location
    return pa.table(cols)


def import_pages(src: str | list[str], out_root: str, n_buckets: int = 16,
                 fmt: str = "parquet") -> dict:
    """Stream a pages source into ``<out_root>/pages/bucket=<k>/``; writes
    meta.json + empty robots/seeds stubs so the result is a valid corpus
    root for CrawlEngine / readers."""
    if fmt == "parquet":
        ds = ray.data.read_parquet(src)
    elif fmt in ("json", "jsonl"):
        ds = ray.data.read_json(src)
    elif fmt == "csv":
        ds = ray.data.read_csv(src)
    else:
        raise ValueError(fmt)
    pages_dir = os.path.join(out_root, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    ds.map_batches(lambda t: _normalize_batch(t, n_buckets),
                   batch_format="pyarrow").write_parquet(
        pages_dir, partition_cols=["bucket"])

    import pyarrow.parquet as pq

    from scrapy_ray import schemas

    # seeds default: one root per host (first url per host encountered)
    hosts_seen: dict[str, str] = {}
    for d in sorted(os.listdir(pages_dir)):
        sub = os.path.join(pages_dir, d)
        for f in os.listdir(sub):
            t = pq.read_table(os.path.join(sub, f), columns=["url", "host"])
            for u, h in zip(t["url"].to_pylist(), t["host"].to_pylist()):
                hosts_seen.setdefault(h, u)
    pq.write_table(pa.table({"url": list(hosts_seen.values()),
                             "priority": pa.array([0] * len(hosts_seen), type=pa.int32())},
                            schema=schemas.SEEDS),
                   os.path.join(out_root, "seeds.parquet"))
    pq.write_table(schemas.ROBOTS.empty_table(), os.path.join(out_root, "robots.parquet"))
    has_loc = any("location" in pq.read_schema(os.path.join(pages_dir, d, f)).names
                  for d in sorted(os.listdir(pages_dir))[:1] if d.startswith("bucket=")
                  for f in sorted(os.listdir(os.path.join(pages_dir, d)))[:1])
    meta = {"spec": {"n_buckets": n_buckets, "imported_from": str(src)},
            "version": "import-1", "has_redirects": has_loc}
    with open(os.path.join(out_root, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta
