"""Feed exports (SURVEY.md §2.1 S5) — the FeedExporter surface
([S:scrapy/exporters.py JSON/JSON-lines/CSV], [S:scrapy/extensions/
feedexport.py]) as Ray Data sinks. Parquet is the primary format (partitioned
= resumable); JSON-lines and CSV cover the reference's interchange formats."""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _to_ds(items: "pa.Table | ray.data.Dataset") -> ray.data.Dataset:
    return ray.data.from_arrow(items) if isinstance(items, pa.Table) else items


def export_items(items: "pa.Table | ray.data.Dataset", out_dir: str,
                 fmt: str = "parquet") -> None:
    ds = _to_ds(items)
    if fmt == "parquet":
        ds.write_parquet(out_dir)
    elif fmt in ("json", "jsonl"):
        ds.write_json(out_dir)
    elif fmt == "csv":
        # csv cannot carry list<string> (reviews) — serialize to a joined
        # string first, mirroring Scrapy's CSV exporter flattening
        def flatten(t: pa.Table) -> pa.Table:
            if "reviews" in t.column_names:
                joined = pa.array(
                    [" | ".join(v) if v is not None else "" for v in t["reviews"].to_pylist()],
                    type=pa.string())
                t = t.set_column(t.schema.get_field_index("reviews"), "reviews", joined)
            return t

        _to_ds(items).map_batches(flatten, batch_format="pyarrow").write_csv(out_dir)
    else:
        raise ValueError(f"unknown export format: {fmt}")
