"""Coded-Bloom fact-to-fact join (the reusable core of the round-3
`revenue_by_region` rework): resolve a CODE (region, nation, segment...)
for every fact row keyed by another fact table's key WITHOUT shuffling
either fact table.

Shape:
1. One streaming pass over the BUILD fact (e.g. orders) constructs one
   mergeable Bloom per code over its keys (per-batch partial blooms,
   OR-merged driver-side — tiny fixed-size bitmaps).
2. The PROBE fact (e.g. lineitem) tests each row against the C blooms in
   its map stage: a unique hit IS the answer (the true code's bloom always
   hits); multi-hit rows are Bloom false positives (~(C-1)*fpr of rows)
   and are resolved EXACTLY afterwards by chunked pruned probes of the
   build fact.

Exact output, no O(fact) shuffle, no O(fact) driver state. Used by
q_revenue_by_region (region codes) and q_volume_shipping (nation codes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from scrapy_ray.state.bloom import BloomFilter


def build_coded_blooms(build: ray.data.Dataset, key_col: str, code_fn,
                       codes: np.ndarray, cap: int,
                       bits_per_key: int = 12) -> list[BloomFilter]:
    """One Bloom per code over the build fact's keys. ``code_fn(table) ->
    int64 code per row (or -1 to skip the row)``; runs inside the batch."""
    code_pos = {int(c): i for i, c in enumerate(codes)}

    def partial(t: pa.Table) -> pa.Table:
        rcode = code_fn(t)
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_c, out_w = [], []
        for c in np.unique(rcode):
            if c < 0:
                continue
            bf = BloomFilter(cap, bits_per_key)
            bf.add_many(keys[rcode == c])
            out_c.append(int(c))
            out_w.append(bf.words.tobytes())
        return pa.table({"code": pa.array(out_c, pa.int64()),
                         "words": pa.array(out_w, pa.binary())})

    blooms = [BloomFilter(cap, bits_per_key) for _ in codes]
    for b in build.map_batches(partial, batch_format="pyarrow") \
                  .iter_batches(batch_size=None, batch_format="pyarrow"):
        for c, w in zip(b["code"].to_pylist(), b["words"].to_pylist()):
            blooms[code_pos[c]].words |= np.frombuffer(w, dtype=np.uint64)
    return blooms


def probe_codes(blooms: list[BloomFilter], codes: np.ndarray,
                keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(resolved_mask, code_per_row, ambiguous_mask): rows hitting exactly
    one bloom are resolved; zero-hit rows belong to NO code (semi-join
    miss); multi-hit rows are ambiguous and need exact resolution."""
    hits = np.stack([bf.contains_many(keys.astype(np.uint64)) for bf in blooms])
    nhit = hits.sum(axis=0)
    one = nhit == 1
    amb = nhit > 1
    code = np.full(len(keys), -1, dtype=np.int64)
    if one.any():
        code[one] = codes[hits[:, one].argmax(axis=0)]
    return one, code, amb


def resolve_exact(build: ray.data.Dataset, key_col: str, code_fn,
                  amb_keys: list[int], chunk: int = 65536) -> dict[int, int]:
    """Exact code per ambiguous key via chunked pruned probes of the build
    fact — each chunk is one streaming 2-column scan filtered to the
    chunk's keys; driver holds one chunk at a time."""
    out: dict[int, int] = {}
    for lo in range(0, len(amb_keys), chunk):
        ks = pa.array(amb_keys[lo:lo + chunk], type=pa.int64())
        ks_ref = ray.put(ks)

        def probe(t: pa.Table) -> pa.Table:
            kk = ray.get(ks_ref) if isinstance(ks_ref, ray.ObjectRef) else ks_ref
            t = t.filter(pc.is_in(pc.cast(t[key_col], pa.int64()), value_set=kk))
            return pa.table({"key": pc.cast(t[key_col], pa.int64()),
                             "code": pa.array(code_fn(t), type=pa.int64())})

        for b in build.map_batches(probe, batch_format="pyarrow") \
                      .iter_batches(batch_size=None, batch_format="pyarrow"):
            out.update(zip(b["key"].to_pylist(), b["code"].to_pylist()))
    return out
