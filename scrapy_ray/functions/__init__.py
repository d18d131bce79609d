"""Scalar function library (SURVEY.md §2.8): url, hash, text, html kernels.

Vectorized (pyarrow.compute / numpy / polars) where a kernel exists; tight
per-batch Python loops otherwise. All functions are pure and deterministic —
the byte-identical-extraction invariant [B:input_hint] depends on it.
"""

from scrapy_ray.functions.hashing import hash64, hash64_one
from scrapy_ray.functions.urlnorm import canonicalize_url, canonicalize_urls, host_of, hosts_of, urljoin_many
from scrapy_ray.functions.textnorm import normalize_ws, parse_price, parse_rating
from scrapy_ray.functions.htmlx import visible_text

__all__ = [
    "hash64",
    "hash64_one",
    "canonicalize_url",
    "canonicalize_urls",
    "host_of",
    "hosts_of",
    "urljoin_many",
    "normalize_ws",
    "parse_price",
    "parse_rating",
    "visible_text",
]
