"""Corpus validator — the ops-side integrity check for a bucketed pages
corpus (generator or `ingest.import_pages` layout). A corrupted or
mis-bucketed corpus fails SILENTLY at crawl time (bucket-pruned fetch-joins
read the wrong bucket and report misses), so this tool checks the
invariants the engine relies on, distributed (one Ray task per bucket):

- every row's ``url_hash % n_buckets`` equals its bucket directory id, and
  the stored url_hash equals hash64(url) (detects stale hashes after a
  rewrite);
- no duplicate urls within or across files of a bucket;
- files are url-sorted (the fetch-join's row-group-pruning contract);
- required PAGES columns present with the right types;
- meta.json n_buckets covers every bucket directory on disk.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray


@ray.remote
def _check_bucket(bucket_id: int, path: str, n_buckets: int) -> dict:
    import pyarrow.parquet as pq

    from scrapy_ray.functions.hashing import hash64

    errors: list[str] = []
    n_rows = 0
    seen: set[str] = set()
    files = sorted(os.listdir(path)) if os.path.isdir(path) else [""]
    for fname in files:
        fpath = os.path.join(path, fname) if fname else path
        if not fpath.endswith(".parquet"):
            continue
        t = pq.read_table(fpath, columns=["url", "url_hash"])
        n_rows += len(t)
        urls = t["url"].to_pylist()
        if urls != sorted(urls):
            errors.append(f"{fname}: not url-sorted")
        h = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        want = hash64(urls)
        if not np.array_equal(h, want):
            bad = int(np.count_nonzero(h != want))
            errors.append(f"{fname}: {bad} stale url_hash values")
        misplaced = int(np.count_nonzero(
            (h % np.uint64(n_buckets)).astype(np.int64) != bucket_id))
        if misplaced:
            errors.append(f"{fname}: {misplaced} rows in wrong bucket")
        dups = [u for u in urls if u in seen]
        if dups:
            errors.append(f"{fname}: {len(dups)} duplicate urls "
                          f"(first: {dups[0]})")
        seen.update(urls)
        schema = pq.read_schema(fpath)
        for col, typ in (("url", pa.string()), ("html", pa.binary()),
                         ("status", None)):
            if col not in schema.names:
                errors.append(f"{fname}: missing column {col}")
            elif typ is not None and schema.field(col).type != typ:
                errors.append(f"{fname}: {col} is {schema.field(col).type}, "
                              f"want {typ}")
    return {"bucket": bucket_id, "n_rows": n_rows, "errors": errors}


def validate_corpus(root: str) -> dict:
    """Returns {"ok": bool, "n_rows": int, "buckets": int,
    "errors": [str, ...]} — one Ray task per bucket, driver work
    O(buckets)."""
    from scrapy_ray.sources.corpus import corpus_paths

    errors: list[str] = []
    meta_path = os.path.join(root, "meta.json")
    if not os.path.exists(meta_path):
        return {"ok": False, "n_rows": 0, "buckets": 0,
                "errors": ["meta.json missing"]}
    with open(meta_path) as fh:
        n_buckets = json.load(fh)["spec"]["n_buckets"]
    paths = corpus_paths(root)["pages"]
    over = [b for b in paths if b >= n_buckets or b < 0]
    if over:
        errors.append(f"bucket dirs outside meta n_buckets={n_buckets}: {over}")
    results = ray.get([_check_bucket.remote(b, p, n_buckets)
                       for b, p in sorted(paths.items())])
    n_rows = sum(r["n_rows"] for r in results)
    for r in results:
        errors.extend(f"bucket={r['bucket']}: {e}" for e in r["errors"])
    return {"ok": not errors, "n_rows": n_rows, "buckets": len(paths),
            "errors": errors}
