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

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from scrapy_ray.sources.readers import read_pages

# frontier columns carried through onto fetched pages (J3 denormalization)
CARRY = ["depth", "priority", "seq", "callback"]


HOST_STATS_SCHEMA = pa.schema([("host", pa.string()), ("n", pa.int64()),
                               ("nbytes", pa.int64())])

# F6 cookies analogue: per-host session update emitted by each fetch task —
# (host, seq of the task's last-fetched row for the host, hash64(its url))
SESSION_SCHEMA = pa.schema([("host", pa.string()), ("seq", pa.int64()),
                            ("token", pa.uint64())])


def _session_updates(t: pa.Table) -> pa.Table:
    """F6 ([S:cookies.py] analogue): this task's per-host session
    contribution — the max-seq fetched row per host sets the token to
    hash64(url), like a server rotating a session cookie per hit. Runs on
    the joined (page x wave) table at the pages_fetched count point
    (after the maxsize gate, before status diversion), so EVERY response
    refreshes the jar, exactly as Set-Cookie applies to redirects too."""
    from scrapy_ray.functions.hashing import hash64

    if len(t) == 0:
        return SESSION_SCHEMA.empty_table()
    seqs = t["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
    hosts = np.asarray(t["host"].to_pylist(), dtype=object)
    idx = np.lexsort((seqs, hosts))
    hs = hosts[idx]
    last = np.r_[hs[1:] != hs[:-1], True]
    sel = idx[last]
    urls_all = t["url"].to_pylist()
    urls = [urls_all[i] for i in sel]
    return pa.table({"host": pa.array(list(hs[last]), type=pa.string()),
                     "seq": pa.array(seqs[sel], type=pa.int64()),
                     "token": pa.array(hash64(urls), type=pa.uint64())},
                    schema=SESSION_SCHEMA)


def _retry_rows(t: pa.Table, retry_codes: tuple, retry_max: int) -> pa.Table:
    """Fetched rows whose status is retryable and attempt budget remains ->
    RETRY_ROWS ([S:scrapy/downloadermiddlewares/retry.py]). Runs in-task on
    the joined (page x wave) table."""
    from scrapy_ray import schemas

    m = pc.and_(pc.is_in(t["status"], value_set=pa.array(list(retry_codes),
                                                         type=t["status"].type)),
                pc.less(t["retries"], retry_max))
    hit = t.filter(m)
    return pa.table({k: hit[k] for k in schemas.RETRY_ROWS.names},
                    schema=schemas.RETRY_ROWS)


def _redirect_rows(t: pa.Table, redirect_codes: tuple, redirect_max: int) -> pa.Table:
    """3xx rows with a Location and hop budget left -> REDIRECT_ROWS at the
    TARGET url ([S:scrapy/downloadermiddlewares/redirect.py]): urljoin +
    canonicalize + hash happen here in-task, so the driver receives
    ready-to-dedup frontier candidates. Runs on the joined (page x wave)
    table; a corpus without a location column never redirects."""
    from scrapy_ray import schemas
    from scrapy_ray.functions.hashing import hash64
    from scrapy_ray.functions.urlnorm import canonicalize_urls, hosts_of

    if "location" not in t.column_names:
        return schemas.REDIRECT_ROWS.empty_table()
    m = pc.and_(pc.and_(
        pc.is_in(t["status"], value_set=pa.array(list(redirect_codes),
                                                 type=t["status"].type)),
        pc.not_equal(t["location"], "")),
        pc.less(t["redirects"], redirect_max))
    hit = t.filter(m)
    if len(hit) == 0:
        return schemas.REDIRECT_ROWS.empty_table()
    from urllib.parse import urljoin
    targets = canonicalize_urls([urljoin(b, loc) for b, loc in
                                 zip(hit["url"].to_pylist(),
                                     hit["location"].to_pylist())])
    return pa.table({
        "url": pa.array(targets, type=pa.string()),
        "host": pa.array(hosts_of(targets), type=pa.string()),
        "url_hash": pa.array(hash64(targets), type=pa.uint64()),
        "depth": hit["depth"],
        "priority": hit["priority"],
        "seq": hit["seq"],
        "callback": pa.array([""] * len(hit), type=pa.string()),
        "redirects": pc.add(hit["redirects"], pa.scalar(1, pa.int32())),
    }, schema=schemas.REDIRECT_ROWS)


def _meta_refresh_split(t: pa.Table, maxdelay: float,
                        redirect_max: int) -> tuple[pa.Table, pa.Table]:
    """Meta-refresh middleware ([S:scrapy/downloadermiddlewares/redirect.py
    MetaRefreshMiddleware]): 2xx rows whose html carries a followable
    ``<meta http-equiv=refresh>`` (delay <= maxdelay, hop budget left) are
    DIVERTED — returned as REDIRECT_ROWS at the target url and removed
    from the parse stream (Scrapy replaces the response before the spider
    sees it). Negative path is one vectorized substring sniff over the
    binary html column, so corpora without refresh tags pay ~memchr."""
    from scrapy_ray import schemas
    from scrapy_ray.functions.hashing import hash64
    from scrapy_ray.functions.htmlx import base_url, meta_refresh
    from scrapy_ray.functions.urlnorm import canonicalize_urls, hosts_of

    status = t["status"].to_numpy(zero_copy_only=False)
    red = t["redirects"].to_numpy(zero_copy_only=False)
    cand = (status >= 200) & (status < 300) & (red < redirect_max)
    if cand.any():
        sniff = pc.match_substring(t["html"], "http-equiv",
                                   ignore_case=True) \
            .to_numpy(zero_copy_only=False)
        cand &= sniff.astype(bool)
    if not cand.any():
        return schemas.REDIRECT_ROWS.empty_table(), t
    idx = np.flatnonzero(cand)
    hit = t.take(pa.array(idx))
    urls = hit["url"].to_pylist()
    htmls = hit["html"].to_pylist()
    follow_i, raw_targets = [], []
    from urllib.parse import urljoin
    for k, (u, h) in enumerate(zip(urls, htmls)):
        mr = meta_refresh(h)
        if mr is None or mr[0] > maxdelay:
            continue        # absent or too-slow refresh: page parses normally
        follow_i.append(k)
        raw_targets.append(urljoin(base_url(u, h), mr[1]))
    if not follow_i:
        return schemas.REDIRECT_ROWS.empty_table(), t
    fhit = hit.take(pa.array(follow_i))
    targets = canonicalize_urls(raw_targets)
    rows = pa.table({
        "url": pa.array(targets, type=pa.string()),
        "host": pa.array(hosts_of(targets), type=pa.string()),
        "url_hash": pa.array(hash64(targets), type=pa.uint64()),
        "depth": fhit["depth"],
        "priority": fhit["priority"],
        "seq": fhit["seq"],
        "callback": pa.array([""] * len(fhit), type=pa.string()),
        "redirects": pc.add(fhit["redirects"], pa.scalar(1, pa.int32())),
    }, schema=schemas.REDIRECT_ROWS)
    keep = np.ones(len(t), dtype=bool)
    keep[idx[np.asarray(follow_i, dtype=np.int64)]] = False
    return rows, t.filter(pa.array(keep))


def _maxsize_split(t: pa.Table, maxsize: int, warnsize: int) -> tuple:
    """DOWNLOAD_MAXSIZE / DOWNLOAD_WARNSIZE gate ([S:http11.py
    _ResponseReader]): oversized bodies abort BEFORE any downloader
    middleware sees them — applied to the raw stored bytes ahead of the
    frontier join, host stats, retry/redirect/meta-refresh splits and the
    parse. warnsize counts every body over the threshold (dropped ones
    included — Scrapy warns while streaming, before it knows the final
    size). Returns (kept_table, n_dropped, n_warned)."""
    ln = pc.binary_length(t["html"])
    n_warn = 0
    if warnsize:
        n_warn = int(pc.sum(pc.greater(ln, warnsize)).as_py() or 0)
    if not maxsize:
        return t, 0, n_warn
    keep = pc.less_equal(ln, maxsize)
    n_drop = len(t) - int(pc.sum(keep).as_py() or 0)
    return (t.filter(keep) if n_drop else t), n_drop, n_warn


def _host_stats(t: pa.Table) -> pa.Table:
    """Per-host (responses, body bytes) partial for this task's fetched rows
    — the deterministic virtual-latency signal for AutoThrottle (F4)."""
    import pandas as pd

    from scrapy_ray.functions.urlnorm import hosts_of

    urls = t["url"].to_pylist()
    sizes = pc.binary_length(t["html"]).to_numpy(zero_copy_only=False)
    df = pd.DataFrame({"host": hosts_of(urls), "nbytes": sizes.astype(np.int64)})
    g = df.groupby("host").agg(n=("nbytes", "count"), nbytes=("nbytes", "sum")).reset_index()
    return pa.table({"host": pa.array(g["host"], type=pa.string()),
                     "n": pa.array(g["n"].to_numpy(), type=pa.int64()),
                     "nbytes": pa.array(g["nbytes"].to_numpy(), type=pa.int64())},
                    schema=HOST_STATS_SCHEMA)


def _schema_names(path: str) -> list[str]:
    """Column names of a bucket path (file OR hive dir) via one footer read."""
    import os

    import pyarrow.parquet as pq

    p = path
    if os.path.isdir(p):
        fs = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))
        if not fs:
            return []
        p = os.path.join(p, fs[0])
    return pq.read_schema(p).names


def _cap_arrow_threads() -> None:
    """Each fetch-parse task is a num_cpus=1 Ray task, but Arrow's global
    thread pools default to os.cpu_count() — so N concurrent tasks spawn
    N×cores decode threads (thrash), and a '1-CPU' session secretly uses
    the whole box (breaks scaling measurements). One thread per task is the
    honest per-core sizing."""
    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)


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
def _fetch_parse_bucket(path: str, sub: pa.Table, registry_ref=None,
                        want_stats: bool = False, retry_cfg=None,
                        redirect_cfg=None, metarefresh_cfg=None,
                        maxsize_cfg=None, allowed_statuses: tuple = (),
                        want_sessions: bool = False,
                        link_filter: tuple | None = None) -> tuple:
    """Read one corpus bucket with an ``url IN (...)`` parquet filter
    (row-group pruning — bucket files are written sorted by url and ``sub``
    is a url-sorted contiguous wave slice, so a chunk touches few row
    groups), join the frontier carry columns in-task (arrow hash join — the
    driver ships a zero-copy wave slice, builds no per-url dicts), run the
    fused parse AND the items/links splits in-task. Returns (items_table,
    links_table, n_fetched) — neither html nor per-page list columns ever
    reach the driver. ``registry_ref``: ray.put snapshot of (PAGE_HANDLERS,
    URL_ROUTES, CRAWL_RULES) — driver-side registrations are invisible to
    workers."""
    import pyarrow.parquet as pq

    from scrapy_ray import schemas
    from scrapy_ray.stages.parse import parse_page_batch, split_items, split_links

    _cap_arrow_threads()
    # NB: Ray auto-dereferences ObjectRef args — the task receives the
    # snapshot tuple itself.
    handlers, routes, rules = (registry_ref if registry_ref is not None
                                else ({}, [], []))
    # driver-side support check (fetch_parse_wave) guarantees the column
    # exists whenever redirect_cfg is set — no per-task footer sniffing
    cols = ["url", "html", "status"] + (["location"] if redirect_cfg else [])
    t = pq.read_table(path, filters=pc.field("url").isin(sub["url"]), columns=cols)
    nd = nw = 0
    if maxsize_cfg is not None and len(t):
        t, nd, nw = _maxsize_split(t, *maxsize_cfg)
    if len(t) == 0:
        return (schemas.ITEMS.empty_table(), schemas.LINKS.empty_table(), 0,
                HOST_STATS_SCHEMA.empty_table(), schemas.RETRY_ROWS.empty_table(),
                schemas.REDIRECT_ROWS.empty_table(), (nd, nw, 0),
                SESSION_SCHEMA.empty_table())
    stats = _host_stats(t) if want_stats else HOST_STATS_SCHEMA.empty_table()
    t = t.join(sub, keys="url", join_type="inner")
    n_fetched = len(t)    # BEFORE the meta-refresh split removes rows — a
                          # diverted interstitial is still a fetched page
                          # (simulator counts at the same point)
    sess = (_session_updates(t) if want_sessions
            else SESSION_SCHEMA.empty_table())
    retries = (_retry_rows(t, *retry_cfg) if retry_cfg is not None
               else schemas.RETRY_ROWS.empty_table())
    redirects = (_redirect_rows(t, *redirect_cfg) if redirect_cfg is not None
                 else schemas.REDIRECT_ROWS.empty_table())
    n_diverted = len(retries) + len(redirects)
    if metarefresh_cfg is not None:
        mr, t = _meta_refresh_split(t, *metarefresh_cfg)
        if len(mr):
            redirects = pa.concat_tables([redirects, mr]) if len(redirects) else mr
    parsed = parse_page_batch(t, handlers=handlers, routes=routes,
                              allowed_statuses=allowed_statuses, rules=rules)
    # error responses = fetched, non-2xx, fell through every middleware
    # (CLOSESPIDER_ERRORCOUNT input; diverted redirect/retry rows excluded)
    n_err = len(parsed) - int(pc.sum(parsed["status_ok"]).as_py() or 0) \
        - n_diverted
    links = split_links(parsed, routes=routes, rules=rules)
    if link_filter is not None and len(links):
        # M7/M8/M9 in-task (engine passes the pack iff no link middlewares
        # are registered — those must see the unfiltered stream): shrinks
        # the O(links) driver chain AND the task->driver payload; per-row
        # pure, so the surviving set is identical to the driver-side path
        from scrapy_ray.stages.links import filter_links_p

        links = filter_links_p(links, link_filter)
    return (split_items(parsed), links,
            n_fetched,
            stats, retries, redirects, (nd, nw, n_err), sess)


@ray.remote
def _load_bucket(path: str) -> pa.Table:
    """Decode one bucket into the object store (once; immutable input)."""
    import pyarrow.parquet as pq

    cols = ["url", "html", "status"]
    if "location" in _schema_names(path):
        cols.append("location")
    return pq.read_table(path, columns=cols)


@ray.remote
def _fetch_parse_cached(bucket: pa.Table, sub: pa.Table, registry_ref=None,
                        want_stats: bool = False, retry_cfg=None,
                        redirect_cfg=None, metarefresh_cfg=None,
                        maxsize_cfg=None, allowed_statuses: tuple = (),
                        want_sessions: bool = False,
                        link_filter: tuple | None = None) -> tuple:
    """In-memory probe variant of _fetch_parse_bucket: ``bucket`` arrives as
    a zero-copy plasma reference; filter + join + parse + split in-task."""
    from scrapy_ray import schemas
    from scrapy_ray.stages.parse import parse_page_batch, split_items, split_links

    _cap_arrow_threads()
    # NB: Ray auto-dereferences ObjectRef args — the task receives the
    # snapshot tuple itself.
    handlers, routes, rules = (registry_ref if registry_ref is not None
                                else ({}, [], []))
    sub_urls = sub["url"].combine_chunks() if isinstance(sub["url"], pa.ChunkedArray) \
        else sub["url"]
    t = bucket.filter(pc.is_in(bucket["url"], value_set=sub_urls))
    nd = nw = 0
    if maxsize_cfg is not None and len(t):
        t, nd, nw = _maxsize_split(t, *maxsize_cfg)
    if len(t) == 0:
        return (schemas.ITEMS.empty_table(), schemas.LINKS.empty_table(), 0,
                HOST_STATS_SCHEMA.empty_table(), schemas.RETRY_ROWS.empty_table(),
                schemas.REDIRECT_ROWS.empty_table(), (nd, nw, 0),
                SESSION_SCHEMA.empty_table())
    stats = _host_stats(t) if want_stats else HOST_STATS_SCHEMA.empty_table()
    t = t.join(sub, keys="url", join_type="inner")
    n_fetched = len(t)    # BEFORE the meta-refresh split removes rows — a
                          # diverted interstitial is still a fetched page
                          # (simulator counts at the same point)
    sess = (_session_updates(t) if want_sessions
            else SESSION_SCHEMA.empty_table())
    retries = (_retry_rows(t, *retry_cfg) if retry_cfg is not None
               else schemas.RETRY_ROWS.empty_table())
    redirects = (_redirect_rows(t, *redirect_cfg) if redirect_cfg is not None
                 else schemas.REDIRECT_ROWS.empty_table())
    n_diverted = len(retries) + len(redirects)
    if metarefresh_cfg is not None:
        mr, t = _meta_refresh_split(t, *metarefresh_cfg)
        if len(mr):
            redirects = pa.concat_tables([redirects, mr]) if len(redirects) else mr
    parsed = parse_page_batch(t, handlers=handlers, routes=routes,
                              allowed_statuses=allowed_statuses, rules=rules)
    # error responses = fetched, non-2xx, fell through every middleware
    # (CLOSESPIDER_ERRORCOUNT input; diverted redirect/retry rows excluded)
    n_err = len(parsed) - int(pc.sum(parsed["status_ok"]).as_py() or 0) \
        - n_diverted
    links = split_links(parsed, routes=routes, rules=rules)
    if link_filter is not None and len(links):
        # M7/M8/M9 in-task (engine passes the pack iff no link middlewares
        # are registered — those must see the unfiltered stream): shrinks
        # the O(links) driver chain AND the task->driver payload; per-row
        # pure, so the surviving set is identical to the driver-side path
        from scrapy_ray.stages.links import filter_links_p

        links = filter_links_p(links, link_filter)
    return (split_items(parsed), links,
            n_fetched,
            stats, retries, redirects, (nd, nw, n_err), sess)


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


_REDIRECT_SUPPORT: dict[tuple, bool] = {}


def _corpus_has_redirects(corpus_root: str, paths: dict) -> bool:
    """ONE driver-side check per corpus per process: meta.json's
    has_redirects when present (generator v4+ / ingest), else a single
    bucket-footer sniff for the location column. Keeps per-task work free
    of footer reads (measured ~0.4-1s per 6-wave crawl). Cache key
    includes meta.json's mtime so a regenerated corpus at the same path
    is re-checked."""
    import json as _json
    import os as _os

    mp = _os.path.join(corpus_root, "meta.json")
    try:
        key = (corpus_root, _os.stat(mp).st_mtime_ns)
    except OSError:
        key = (corpus_root, 0)
    got = _REDIRECT_SUPPORT.get(key)
    if got is not None:
        return got
    ans = None
    if _os.path.exists(mp):
        try:
            with open(mp) as fh:
                ans = _json.load(fh).get("has_redirects")
        except Exception:
            ans = None
    if ans is None:
        ans = any("location" in _schema_names(p) for p in list(paths.values())[:1])
    _REDIRECT_SUPPORT[key] = bool(ans)
    return bool(ans)


_METAREFRESH_SUPPORT: dict[tuple, bool] = {}


def _corpus_has_metarefresh(corpus_root: str) -> bool:
    """Same one-check-per-corpus pattern as _corpus_has_redirects, keyed on
    meta.json's has_metarefresh. A corpus WITHOUT the key (pre-v5
    generator, external ingest) conservatively returns True — the
    vectorized html sniff then costs ~memchr per task."""
    import json as _json
    import os as _os

    mp = _os.path.join(corpus_root, "meta.json")
    try:
        key = (corpus_root, _os.stat(mp).st_mtime_ns)
    except OSError:
        key = (corpus_root, 0)
    got = _METAREFRESH_SUPPORT.get(key)
    if got is not None:
        return got
    ans = True
    if _os.path.exists(mp):
        try:
            with open(mp) as fh:
                ans = bool(_json.load(fh).get("has_metarefresh", True))
        except Exception:
            ans = True
    _METAREFRESH_SUPPORT[key] = ans
    return ans


_CPU_CACHE: int | None = None


def _cluster_cpus() -> int:
    """Total cluster CPUs, memoized per process (cluster size is fixed for
    a crawl's lifetime; ray.cluster_resources() is a GCS round-trip)."""
    global _CPU_CACHE
    if _CPU_CACHE is None:
        try:
            _CPU_CACHE = max(1, int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            _CPU_CACHE = 8
    return _CPU_CACHE


def fetch_parse_wave(corpus_root: str, wave: pa.Table, n_buckets: int,
                     cache: "BucketCache | None" = None, registry_ref=None,
                     want_stats: bool = False, retry_cfg=None,
                     redirect_cfg=None, metarefresh_cfg=None,
                     maxsize_cfg=None, allowed_statuses: tuple = (),
                     want_sessions: bool = False,
                     link_filter: tuple | None = None) -> tuple:
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
    if redirect_cfg is not None and not _corpus_has_redirects(corpus_root, paths):
        redirect_cfg = None        # corpus can never redirect: free fast path
    if metarefresh_cfg is not None and \
            not _corpus_has_metarefresh(corpus_root):
        metarefresh_cfg = None     # generator says no refresh tags exist
    hashes = wave["url_hash"].to_numpy(zero_copy_only=False)
    bucket_of = (hashes % np.uint64(n_buckets)).astype(np.int64)
    # Fully columnar dispatch: sort the wave by (bucket, url) ONCE, then
    # ship zero-copy Arrow slices to the tasks — the driver builds no
    # per-url python structures. Sorting by url keeps each chunk a
    # contiguous url range, so the parquet isin filter prunes row groups
    # tightly (bucket files are written url-sorted).
    sub_cols = wave.select(["url", "host", "url_hash", "depth",
                            "priority", "seq", "callback", "retries",
                            "redirects"])
    tmp = sub_cols.append_column("bucket", pa.array(bucket_of))
    idx = pc.sort_indices(tmp, sort_keys=[("bucket", "ascending"),
                                          ("url", "ascending")])
    sub_sorted = sub_cols.take(idx)
    bsorted = bucket_of[idx.to_numpy()]
    ubs, starts = np.unique(bsorted, return_index=True)
    bounds = np.append(starts, len(bsorted))
    futs = []
    # Task granularity (re-tuned round 5): the round-2 fixed 256-row chunk
    # optimized straggler balance, but per-task overhead (dispatch, arg
    # serialization, result transfer — and cross-raylet hops on a real
    # multi-node cluster) now dominates at today's engine speed: measured
    # same-window, chunk 2048 beats 256 by 10-13% at EVERY level (flat
    # 2-CPU 9.06->8.01, flat 8-CPU 2.86->2.52, 4-node wide 12.7->11.2,
    # 1-node wide 36.1->28.3). Adaptive: ~2 task waves per CPU, clamped to
    # [256, 4096] so tiny waves stay balanced and huge waves stay bounded;
    # SCRAPY_RAY_WAVE_CHUNK overrides for tuning runs.
    chunk_env = os.environ.get("SCRAPY_RAY_WAVE_CHUNK")
    if chunk_env:
        chunk = int(chunk_env)
    else:
        chunk = min(4096, max(256, len(wave) // (2 * _cluster_cpus())))
    for k, b in enumerate(ubs):
        if int(b) not in paths:
            continue  # bucket never written (empty at ingest) -> fetch miss
        seg_len = int(bounds[k + 1] - bounds[k])
        n_parts = max(1, (seg_len + chunk - 1) // chunk)
        for j in range(n_parts):
            lo = bounds[k] + j * seg_len // n_parts
            hi = bounds[k] + (j + 1) * seg_len // n_parts
            sub = sub_sorted.slice(int(lo), int(hi - lo))
            if cache is not None:
                futs.append(_fetch_parse_cached.remote(cache.get(int(b)), sub,
                                                       registry_ref, want_stats,
                                                       retry_cfg, redirect_cfg,
                                                       metarefresh_cfg,
                                                       maxsize_cfg,
                                                       allowed_statuses,
                                                       want_sessions,
                                                       link_filter))
            else:
                futs.append(_fetch_parse_bucket.remote(paths[int(b)], sub,
                                                       registry_ref, want_stats,
                                                       retry_cfg, redirect_cfg,
                                                       metarefresh_cfg,
                                                       maxsize_cfg,
                                                       allowed_statuses,
                                                       want_sessions,
                                                       link_filter))
    items_p, links_p, stats_p, retry_p, redir_p, sess_p, n = [], [], [], [], [], [], 0
    nd_sum = nw_sum = ne_sum = 0
    # consume incrementally: driver-side deserialization + concat overlap
    # with still-running tasks instead of waiting for the full barrier
    pending = futs
    while pending:
        done, pending = ray.wait(pending, num_returns=min(16, len(pending)))
        for it, lk, nf, st, rr, rd, (nd, nw, ne), se in ray.get(done):
            n += nf
            nd_sum += nd
            nw_sum += nw
            ne_sum += ne
            if len(it):
                items_p.append(it)
            if len(lk):
                links_p.append(lk)
            if len(st):
                stats_p.append(st)
            if len(rr):
                retry_p.append(rr)
            if len(rd):
                redir_p.append(rd)
            if len(se):
                sess_p.append(se)
    items = pa.concat_tables(items_p) if items_p else schemas.ITEMS.empty_table()
    links = pa.concat_tables(links_p) if links_p else schemas.LINKS.empty_table()
    stats = (pa.concat_tables(stats_p) if stats_p
             else HOST_STATS_SCHEMA.empty_table())
    retries = (pa.concat_tables(retry_p) if retry_p
               else schemas.RETRY_ROWS.empty_table())
    redirects = (pa.concat_tables(redir_p) if redir_p
                 else schemas.REDIRECT_ROWS.empty_table())
    sess = (pa.concat_tables(sess_p) if sess_p
            else SESSION_SCHEMA.empty_table())
    return (items, links, n, stats, retries, redirects,
            (nd_sum, nw_sum, ne_sum), sess)


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
