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


def _int_roundtrips(v: str) -> bool:
    """True iff v is a canonical base-10 integer (str(int(v)) == v) — a
    zero-padded value like '007' must stay a string or compaction would
    silently rewrite the partition value."""
    try:
        return str(int(v)) == v
    except ValueError:
        return False


def hive_key_types(root: str, paths: list[str]) -> dict[str, type]:
    """Pin ONE type per hive key across the whole compaction: int64 only
    when EVERY value of that key round-trips as a canonical integer, else
    string. Mixed int/string values for one key across files would
    otherwise produce different appended column types and fail the
    ParquetWriter mid-bin with a schema mismatch."""
    is_int: dict[str, bool] = {}
    for p in paths:
        rel = os.path.relpath(os.path.dirname(p), root)
        for seg in rel.split(os.sep):
            if "=" in seg:
                k, _, v = seg.partition("=")
                is_int[k] = is_int.get(k, True) and _int_roundtrips(v)
    return {k: (int if ok else str) for k, ok in is_int.items()}


def hive_columns(root: str, path: str,
                 key_types: dict[str, type] | None = None
                 ) -> list[tuple[str, object]]:
    """``key=value`` directory segments of ``path`` relative to ``root``,
    as (name, value) pairs. Types come from ``key_types`` (computed once
    per compaction by hive_key_types so every file of a key agrees);
    without it, int64 only when the value round-trips canonically."""
    rel = os.path.relpath(os.path.dirname(path), root)
    out: list[tuple[str, object]] = []
    for seg in rel.split(os.sep):
        if "=" in seg:
            k, _, v = seg.partition("=")
            typ = (key_types or {}).get(k)
            if typ is int or (typ is None and _int_roundtrips(v)):
                out.append((k, int(v)))
            else:
                out.append((k, v))
    return out


@ray.remote
def _compact_bin(paths: list[str], out_path: str,
                 root: str | None = None,
                 key_types: dict[str, type] | None = None) -> tuple[int, int]:
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
                for k, v in hive_columns(root, p, key_types):
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
    key_types = hive_key_types(src, [p for p, _ in files])
    futs = [_compact_bin.remote(b, os.path.join(tmp, f"part-{i:05d}.parquet"),
                                src, key_types)
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
