"""Small-file compaction for partitioned Parquet output (the OPTIMIZE /
bin-packing compactor every long-running ingestion needs).

The resumable sink writes one file per wave (`items/wave=N/part.parquet`,
SURVEY §4.2 checkpoint/resume) — correct for resumability, but a
long crawl accumulates thousands of small files and every later scan pays
per-file open + footer costs. Compaction rewrites them into ~target-size
files WITHOUT a shuffle: the driver bin-packs file paths by on-disk size
(first-fit over the sorted listing, preserving lexicographic order so
wave locality survives), then one Ray task per bin streams its files
through ``pyarrow.parquet`` into a single output file. Output lands in a
temp directory and is committed by atomic rename — a killed compaction
leaves the source untouched (the sink's pointer-swap discipline).

This is file-level surgery, not a data transform — the documented
drop-to-raw-Ray exception (same rationale as stages/fetch.py): a Dataset
``repartition`` would shuffle every row to achieve what a concat of
whole files does for free.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import ray


def plan_compaction(files: list[tuple[str, int]],
                    target_bytes: int) -> list[list[str]]:
    """First-fit bin-packing of (path, size) into bins of ~target_bytes,
    preserving input order (contiguous runs — wave locality survives).
    A file larger than the target gets its own bin. Pure + unit-tested."""
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_sz = 0
    for path, sz in files:
        if cur and cur_sz + sz > target_bytes:
            bins.append(cur)
            cur, cur_sz = [], 0
        cur.append(path)
        cur_sz += sz
    if cur:
        bins.append(cur)
    return bins


def hive_columns(root: str, path: str) -> list[tuple[str, object]]:
    """``key=value`` directory segments of ``path`` relative to ``root``,
    as (name, value) pairs — int64 when the value parses as an integer,
    string otherwise (the stable materialization rule; hive READ inference
    is engine-dependent, so the compactor pins the type explicitly)."""
    rel = os.path.relpath(os.path.dirname(path), root)
    out: list[tuple[str, object]] = []
    for seg in rel.split(os.sep):
        if "=" in seg:
            k, _, v = seg.partition("=")
            try:
                out.append((k, int(v)))
            except ValueError:
                out.append((k, v))
    return out


@ray.remote
def _compact_bin(paths: list[str], out_path: str,
                 root: str | None = None) -> tuple[int, int]:
    """Stream-concatenate whole parquet files into one output file,
    materializing any hive ``key=value`` partition segments as plain
    columns (a flat compacted file must not lose the partition keys).
    Row groups pass through a ParquetWriter — no row ever decodes into
    Python; peak memory is one input file's table."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    writer = None
    rows = 0
    try:
        for p in paths:
            t = pq_.read_table(p)
            if root is not None:
                for k, v in hive_columns(root, p):
                    typ = pa.int64() if isinstance(v, int) else pa.string()
                    t = t.append_column(
                        k, pa.array([v] * len(t), type=typ))
            if writer is None:
                writer = pq_.ParquetWriter(out_path, t.schema)
            writer.write_table(t)
            rows += len(t)
    finally:
        if writer is not None:
            writer.close()
    return rows, len(paths)


def list_parquet_files(root: str) -> list[tuple[str, int]]:
    """(path, size) for every .parquet under root, sorted by path —
    deterministic and locality-preserving (wave=1 < wave=10 < wave=2
    lexicographically is fine: bins only need CONTIGUITY, not numeric
    order)."""
    out = []
    for dirpath, _dirs, names in sorted(os.walk(root)):
        for n in sorted(names):
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                out.append((p, os.path.getsize(p)))
    return out


def compact_parquet_dir(src: str, dst: str | None = None,
                        target_mb: int = 128) -> dict:
    """Compact every parquet file under ``src`` into ~target_mb files at
    ``dst`` (default: ``<src>.compacted``). One Ray task per output file,
    atomic directory commit. Returns {files_in, files_out, rows}.

    The source is never modified — callers swap directories themselves
    once satisfied (keeping the uncompacted original is the safe default
    for a checkpointed sink)."""
    dst = dst or (src.rstrip("/") + ".compacted")
    files = list_parquet_files(src)
    if not files:
        raise ValueError(f"no parquet files under {src}")
    bins = plan_compaction(files, target_mb * (1 << 20))
    tmp = dst + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    futs = [_compact_bin.remote(b, os.path.join(tmp, f"part-{i:05d}.parquet"),
                                src)
            for i, b in enumerate(bins)]
    res = ray.get(futs)
    rows = sum(r for r, _ in res)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.rename(tmp, dst)
    return {"files_in": len(files), "files_out": len(bins), "rows": rows,
            "out_dir": dst}


def verify_compaction(src: str, dst: str) -> bool:
    """Footer-level equivalence check: total rows match (content equality
    is pinned in tests; this is the cheap operational assertion)."""
    n_src = sum(pq.read_metadata(p).num_rows for p, _ in list_parquet_files(src))
    n_dst = sum(pq.read_metadata(p).num_rows for p, _ in list_parquet_files(dst))
    return n_src == n_dst
