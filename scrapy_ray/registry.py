"""User-extension surface (SURVEY.md §2.10) — the Scrapy hook points
re-expressed as composable Arrow batch-function chains:

| Scrapy hook                                  | Ours                        |
|----------------------------------------------|-----------------------------|
| Spider.parse_* callbacks                     | @parse_stage registry       |
| Item pipelines (process_item/DropItem)       | item_pipelines chain        |
| Spider middlewares (filter/augment output)   | link_middlewares chain      |

A parse stage is ``fn(pa.Table) -> pa.Table`` over fetched-page batches,
registered under the callback tag carried on frontier rows. Item pipelines
and link middlewares are ``fn(pa.Table) -> pa.Table`` applied in order; a
pipeline drops rows by filtering them out (DropItem ≙ filter), and both run
inside the engine's batch path — never per row.

Round-1 scope note: the wave loop's fused parser dispatches the two built-in
stages internally (stages/parse.py); custom-registered stages are usable in
standalone pipelines (`read_pages(...).map_batches(PARSE_STAGES[tag])`) and
through the item/link chains, which ARE wired into the engine. Routing
arbitrary custom tags through the fused wave parser is a round-2 item.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

BatchFn = Callable[[pa.Table], pa.Table]

PARSE_STAGES: dict[str, BatchFn] = {}


def parse_stage(name: str) -> Callable[[BatchFn], BatchFn]:
    """Register a named parse stage (``callback`` tag on frontier rows)."""

    def deco(fn: BatchFn) -> BatchFn:
        PARSE_STAGES[name] = fn
        return fn

    return deco


def apply_chain(chain: list[BatchFn] | tuple[BatchFn, ...], t: pa.Table) -> pa.Table:
    for fn in chain:
        t = fn(t)
    return t


def _register_builtins() -> None:
    from scrapy_ray.stages.extract import extract_items_batch, extract_listing_cards_batch

    PARSE_STAGES.setdefault("parse_detail", extract_items_batch)
    PARSE_STAGES.setdefault("parse_listing", extract_listing_cards_batch)


_register_builtins()
