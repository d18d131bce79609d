"""Feed exports (SURVEY.md §2.1 S5) — the FeedExporter surface
([S:scrapy/exporters.py JSON/JSON-lines/CSV/XML/marshal/pickle],
[S:scrapy/extensions/feedexport.py]) as Ray Data sinks. Parquet is the
primary format (partitioned = resumable); JSON-lines and CSV cover the
reference's interchange formats; XML / marshal / pickle mirror the
remaining exporters — each is ONE feed file written by streaming batches
through the driver (a single feed file is inherently serial, exactly the
reference's shape; parquet is the scale path)."""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def _to_ds(items: "pa.Table | ray.data.Dataset") -> ray.data.Dataset:
    return ray.data.from_arrow(items) if isinstance(items, pa.Table) else items


def _iter_row_dicts(items: "pa.Table | ray.data.Dataset"):
    for b in _to_ds(items).iter_batches(batch_size=4096, batch_format="pyarrow"):
        yield from b.to_pylist()


def _write_xml_rows(rows, path: str) -> None:
    """[S:scrapy/exporters.py XmlItemExporter]: <items><item><f>v</f>...
    </item></items>; list values nest as <value> elements."""
    from xml.sax.saxutils import escape

    with open(path, "w", encoding="utf-8") as fh:
        fh.write('<?xml version="1.0" encoding="utf-8"?>\n<items>\n')
        for row in rows:
            fh.write("<item>")
            for k, v in row.items():
                if isinstance(v, list):
                    fh.write(f"<{k}>")
                    for x in v:
                        fh.write(f"<value>{escape('' if x is None else str(x))}</value>")
                    fh.write(f"</{k}>")
                else:
                    fh.write(f"<{k}>{escape('' if v is None else str(v))}</{k}>")
            fh.write("</item>\n")
        fh.write("</items>\n")


def _write_xml(items, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    _write_xml_rows(_iter_row_dicts(items), os.path.join(out_dir, "items.xml"))


def _write_seq_rows(rows, path: str, dump) -> None:
    """Record-sequence feeds ([S:scrapy/exporters.py Marshal/PickleItemExporter]:
    one dump per item, concatenated)."""
    with open(path, "wb") as fh:
        for row in rows:
            dump(row, fh)


def _write_seq(items, out_dir: str, fname: str, dump) -> None:
    os.makedirs(out_dir, exist_ok=True)
    _write_seq_rows(_iter_row_dicts(items), os.path.join(out_dir, fname), dump)


def _batch_tables(items, n: int):
    """Yield consecutive n-row pyarrow Tables (last one may be short) —
    the FEED_EXPORT_BATCH_ITEM_COUNT slicer; streams, never materializes."""
    buf: list[pa.Table] = []
    have = 0
    for b in _to_ds(items).iter_batches(batch_size=min(n, 4096),
                                        batch_format="pyarrow"):
        while len(b):
            take = min(n - have, len(b))
            buf.append(b.slice(0, take))
            have += take
            b = b.slice(take)
            if have == n:
                yield pa.concat_tables(buf)
                buf, have = [], 0
    if have:
        yield pa.concat_tables(buf)


def _flatten_reviews(rows: list[dict]) -> list[dict]:
    return [dict(r, reviews=" | ".join(r["reviews"] or []))
            if isinstance(r.get("reviews"), list) else r for r in rows]


_BATCH_EXT = {"parquet": "parquet", "json": "jsonl", "jsonl": "jsonl",
              "csv": "csv", "xml": "xml", "marshal": "marshal",
              "pickle": "pickle"}


def _write_feed_batch(t: pa.Table, path: str, fmt: str) -> None:
    """One batch feed file (each format's serializer mirrors the
    corresponding unbatched path)."""
    if fmt == "parquet":
        import pyarrow.parquet as pq

        pq.write_table(t, path)
        return
    rows = t.to_pylist()
    if fmt in ("json", "jsonl"):
        import json

        with open(path, "w", encoding="utf-8") as fh:
            for r in rows:
                fh.write(json.dumps(r, default=str) + "\n")
    elif fmt == "csv":
        import csv

        rows = _flatten_reviews(rows)
        with open(path, "w", encoding="utf-8", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=t.column_names, restval="")
            w.writeheader()        # header per batch file, like the reference
            for r in rows:
                w.writerow({k: ("" if v is None else v) for k, v in r.items()})
    elif fmt == "xml":
        _write_xml_rows(rows, path)
    elif fmt == "marshal":
        import marshal

        _write_seq_rows(rows, path, marshal.dump)
    elif fmt == "pickle":
        import pickle

        _write_seq_rows(rows, path, pickle.dump)
    else:
        raise ValueError(f"unknown export format: {fmt}")


_COMPRESSORS = {"gzip": ".gz", "bz2": ".bz2", "lzma": ".xz"}


def _postprocess_dir(out_dir: str, compress: str) -> None:
    """Feed post-processing ([S:scrapy/extensions/postprocessing.py
    GzipPlugin/Bz2Plugin/LZMAPlugin]): compress every delivered feed file
    in place, appending the codec extension. gzip writes mtime=0 so the
    output is byte-deterministic (the determinism contract applies to
    feeds too)."""
    ext = _COMPRESSORS[compress]
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isfile(path) or name.endswith(ext):
            continue
        with open(path, "rb") as fh:
            raw = fh.read()
        if compress == "gzip":
            import gzip

            with open(path + ext, "wb") as out:
                with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
                    gz.write(raw)
        elif compress == "bz2":
            import bz2

            with open(path + ext, "wb") as out:
                out.write(bz2.compress(raw))
        else:
            import lzma

            with open(path + ext, "wb") as out:
                out.write(lzma.compress(raw))
        os.remove(path)


def export_items(items: "pa.Table | ray.data.Dataset", out_dir: str,
                 fmt: str = "parquet",
                 fields: "tuple[str, ...] | None" = None,
                 batch_item_count: int | None = None,
                 compress: str | None = None) -> None:
    """``fields``: FEED_EXPORT_FIELDS parity ([S:scrapy/exporters.py
    BaseItemExporter fields_to_export]) — select AND order the exported
    columns; unknown names raise (the reference exports empty columns for
    unknown fields, but a typo silently producing blank data is the
    failure mode worth rejecting).

    ``batch_item_count``: FEED_EXPORT_BATCH_ITEM_COUNT parity
    ([S:scrapy/extensions/feedexport.py _FeedSlot batch delivery]) — the
    feed is delivered as numbered files ``items-%05d.<ext>`` of exactly N
    items each (last file short), batch ids starting at 1 like the
    reference's %(batch_id)d. Streams batch-by-batch; nothing
    materializes.

    ``compress``: feed post-processing parity — gzip / bz2 / lzma each
    delivered feed file (see _postprocess_dir). Parquet's native codec
    remains the scale path; compressing it anyway mirrors the reference,
    which gzips whatever the exporter wrote."""
    if compress is not None and compress not in _COMPRESSORS:
        raise ValueError(f"unknown compress codec: {compress}")
    if fields:
        t = items if isinstance(items, pa.Table) else None
        names = (t.column_names if t is not None
                 else _to_ds(items).schema().names)
        unknown = [f for f in fields if f not in names]
        if unknown:
            raise ValueError(f"unknown export fields: {unknown}")
        if t is not None:
            items = t.select(list(fields))
        else:
            items = _to_ds(items).select_columns(list(fields))
    if batch_item_count is not None:
        if batch_item_count < 1:
            raise ValueError("batch_item_count must be >= 1")
        os.makedirs(out_dir, exist_ok=True)
        ext = _BATCH_EXT.get(fmt)
        if ext is None:
            raise ValueError(f"unknown export format: {fmt}")
        for i, t in enumerate(_batch_tables(items, batch_item_count), start=1):
            _write_feed_batch(t, os.path.join(out_dir, f"items-{i:05d}.{ext}"),
                              fmt)
        if compress:
            _postprocess_dir(out_dir, compress)
        return
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
    elif fmt == "xml":
        _write_xml(items, out_dir)
    elif fmt == "marshal":
        import marshal

        # marshal can't serialize pa timestamps etc. beyond primitives;
        # rows here are plain str/int/float/list — matches the exporter
        _write_seq(items, out_dir, "items.marshal", marshal.dump)
    elif fmt == "pickle":
        import pickle

        _write_seq(items, out_dir, "items.pickle", pickle.dump)
    else:
        raise ValueError(f"unknown export format: {fmt}")
    if compress:
        _postprocess_dir(out_dir, compress)
