"""Stateless map_batches stages (SURVEY.md §2.2, §7.2): parse/extract, link
emission + vectorized filters, and the fetch-join against the pages corpus."""

from scrapy_ray.stages.extract import extract_items_batch, extract_listing_cards_batch, classify_callback
from scrapy_ray.stages.links import extract_links_batch, filter_links
from scrapy_ray.stages.fetch import fetch_wave

__all__ = [
    "extract_items_batch",
    "extract_listing_cards_batch",
    "classify_callback",
    "extract_links_batch",
    "filter_links",
    "fetch_wave",
]
