"""Fixed pyarrow schemas per logical table (SURVEY.md §1).

The reference (Scrapy) is schema-free Python objects ([S:scrapy/item.py]); we
invert that: every table has an explicit Arrow schema, nothing is inferred.
``pages`` is exactly the driver-mandated input shape [B:input_hint].
"""

from __future__ import annotations

import pyarrow as pa

# The input table of Common-Crawl-style web pages [B:input_hint].
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Sidecar columns the synthetic corpus also carries (FIXTURES.md §1): derivable,
# not part of the contract schema.
PAGES_FULL = pa.schema(
    list(PAGES)
    + [
        ("host", pa.string()),
        ("status", pa.int16()),
        ("location", pa.string()),   # 3xx redirect target ("" otherwise)
        ("url_hash", pa.uint64()),
        ("bucket", pa.int32()),
    ]
)

# One row of the frontier = one Scrapy Request ([S:scrapy/http/request]).
# ``callback`` is a named parse-stage tag, not a function pointer (SURVEY §1.1).
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("seq", pa.int64()),
        ("parent_url", pa.string()),
        ("callback", pa.string()),
        ("dont_filter", pa.bool_()),
        ("retries", pa.int32()),    # retry middleware attempt count
        ("redirects", pa.int32()),  # redirect middleware hop count
    ]
)

# Retryable fetch outcomes re-enqueued by the engine (retry middleware,
# [S:scrapy/downloadermiddlewares/retry.py]); subset of wave columns.
RETRY_ROWS = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("seq", pa.int64()),        # ORIGINAL seq: canonical retry order
        ("callback", pa.string()),
        ("retries", pa.int32()),
    ]
)

# 3xx fetch outcomes re-enqueued at their Location target (redirect
# middleware, [S:scrapy/downloadermiddlewares/redirect.py]): url columns
# describe the TARGET (already urljoined + canonicalized + hashed in-task);
# seq is the ORIGINAL request's seq = canonical redirect order; depth and
# priority carry over unchanged (Scrapy copies the request).
REDIRECT_ROWS = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("seq", pa.int64()),
        ("callback", pa.string()),
        ("redirects", pa.int32()),  # hops taken INCLUDING this one
    ]
)

# Extracted hotel/restaurant item [B:north_star]: name, address, rating,
# price, review fields; ``extracted_text`` carries the byte-identical
# per-url invariant [B:input_hint].
ITEMS = pa.schema(
    [
        ("url", pa.string()),
        ("item_type", pa.string()),     # "hotel" | "restaurant"
        ("name", pa.string()),
        ("address", pa.string()),
        ("rating", pa.float64()),
        ("price", pa.string()),
        ("price_value", pa.float64()),
        ("review_count", pa.int64()),
        ("reviews", pa.list_(pa.string())),
        ("extracted_text", pa.string()),
    ]
)

# Listing-card partial items (from listing pages) before detail enrichment.
LISTING_ITEMS = pa.schema(
    [
        ("url", pa.string()),           # listing page url
        ("detail_url", pa.string()),
        ("name", pa.string()),
        ("rating", pa.float64()),
        ("price", pa.string()),
    ]
)

SEEDS = pa.schema([("url", pa.string()), ("priority", pa.int32())])

ROBOTS = pa.schema([("host", pa.string()), ("body", pa.string())])

# Candidate links emitted by parse stages, pre-dedup (SURVEY §2.2 M4).
# (parent_seq, link_idx) is the canonical enqueue order: the driver sorts the
# link stream by it before dedup + seq assignment, which is what makes the
# cross-shard crawl ordering deterministic (SURVEY §7.4.1).
LINKS = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("parent_url", pa.string()),
        ("parent_seq", pa.int64()),
        ("link_idx", pa.int32()),
        ("callback", pa.string()),
    ]
)

CRAWL_ORDER = pa.schema([("seq", pa.int64()), ("wave", pa.int32()), ("url", pa.string())])

URL_SEEN = pa.schema([("url_hash", pa.uint64()), ("url", pa.string())])


def empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
