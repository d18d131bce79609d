"""Link emission + vectorized request filters (SURVEY.md §2.2 M4–M9).

One batch pass turns fetched pages into candidate frontier rows: extract all
hrefs ([S:scrapy/linkextractors/lxmlhtml.py]), absolutize + canonicalize
(M5 [S:w3lib/url.py]), hash, then apply the spider-middleware filters as
vectorized Arrow predicates:

- offsite   (M7 [S:scrapy/spidermiddlewares/offsite.py])   host suffix-match
- urllength (M8 [S:scrapy/spidermiddlewares/urllength.py]) <= 2083
- depth     (M9 [S:scrapy/spidermiddlewares/depth.py])     depth <= limit,
  priority adjusted by ``depth * depth_priority``

Dedup against the URL-seen filter is NOT here — that is the stateful anti-join
against the filter shards (state/urlseen.py, SURVEY §2.4 J4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from scrapy_ray import schemas
from scrapy_ray.config import CrawlConfig
from scrapy_ray.functions.hashing import hash64
from scrapy_ray.functions.htmlx import base_url, extract_links
from scrapy_ray.functions.urlnorm import canonicalize_urls, hosts_of, urljoin_many
from scrapy_ray.stages.extract import classify_callback


def extract_links_batch(t: pa.Table) -> pa.Table:
    """Fetched pages -> candidate links (schema LINKS), unfiltered.

    Expects frontier carry-through columns ``depth`` and ``priority`` on the
    page rows (denormalized, mirroring Request.meta passing — SURVEY §2.4 J3).
    """
    urls = t["url"].to_pylist()
    htmls = t["html"].to_pylist()
    n = len(t)
    depths = (t["depth"].to_numpy(zero_copy_only=False)
              if "depth" in t.column_names else np.zeros(n, dtype=np.int32))
    pseqs = (t["seq"].to_numpy(zero_copy_only=False)
             if "seq" in t.column_names else np.zeros(n, dtype=np.int64))

    out_url: list[str] = []
    out_parent: list[str] = []
    out_depth: list[int] = []
    out_pseq: list[int] = []
    out_idx: list[int] = []
    for url, html, depth, pseq in zip(urls, htmls, depths, pseqs):
        hrefs = extract_links(html)
        if not hrefs:
            continue
        abs_urls = urljoin_many(base_url(url, html), hrefs)
        d = int(depth) + 1
        out_url.extend(abs_urls)
        out_parent.extend([url] * len(abs_urls))
        out_depth.extend([d] * len(abs_urls))
        out_pseq.extend([int(pseq)] * len(abs_urls))
        out_idx.extend(range(len(abs_urls)))

    canon = canonicalize_urls(out_url)
    return pa.table(
        {
            "url": pa.array(canon, type=pa.string()),
            "host": pa.array(hosts_of(canon), type=pa.string()),
            "url_hash": pa.array(hash64(canon) if canon else [], type=pa.uint64()),
            "depth": pa.array(out_depth, type=pa.int32()),
            "priority": pa.array(np.zeros(len(canon), dtype=np.int32)),
            "parent_url": pa.array(out_parent, type=pa.string()),
            "parent_seq": pa.array(out_pseq, type=pa.int64()),
            "link_idx": pa.array(out_idx, type=pa.int32()),
            "callback": pa.array(classify_callback(canon), type=pa.string()),
        },
        schema=schemas.LINKS,
    )


def filter_params(cfg: CrawlConfig) -> tuple:
    """Picklable M7/M8/M9 parameter pack — lets the per-bucket fetch tasks
    run the filter in-task (wide-wave scaling: the driver link chain is
    O(links), measured ~1.9 s/run on the 1M-page bench at every CPU level;
    BENCH/BASELINE.md run N). Per-row pure, so task-side pre-sort filtering
    yields the identical surviving set."""
    return (cfg.url_length_limit, tuple(cfg.allowed_domains or ()),
            cfg.depth_limit, cfg.depth_priority)


def filter_links_p(t: pa.Table, p: tuple) -> pa.Table:
    """Vectorized M7/M8/M9 predicates + depth-based priority adjust,
    parameterized by a ``filter_params`` pack (usable inside Ray tasks)."""
    url_length_limit, allowed_domains, depth_limit, depth_priority = p
    if len(t) == 0:
        return t
    mask = pc.less_equal(pc.utf8_length(t["url"]), url_length_limit)  # M8
    if allowed_domains:  # M7: host == domain or endswith "."+domain
        ok = pc.is_in(t["host"], value_set=pa.array(list(allowed_domains)))
        for dom in allowed_domains:
            ok = pc.or_(ok, pc.ends_with(t["host"], pattern="." + dom))
        mask = pc.and_(mask, ok)
    if depth_limit > 0:  # M9
        mask = pc.and_(mask, pc.less_equal(t["depth"], depth_limit))
    t = t.filter(mask)
    if depth_priority:
        pri = pc.add(t["priority"], pc.multiply(t["depth"], depth_priority))
        t = t.set_column(t.schema.get_field_index("priority"), "priority",
                         pc.cast(pri, pa.int32()))
    return t


def filter_links(t: pa.Table, cfg: CrawlConfig) -> pa.Table:
    """Vectorized M7/M8/M9 predicates + depth-based priority adjust."""
    return filter_links_p(t, filter_params(cfg))
