"""One-hundred-fifty-ninth oracle-query batch — distributed-systems
primitives audited as queries (companions to bloom_fpr_audit):

- consistent_hash_balance: a 8-server × 64-vnode consistent-hash
  ring over the distinct user_ids (multiplicative hashes, ties by
  (pos, vnode)); reports per-ring load extremes AND the exact moved
  fraction after adding a 9th server — the ~n/9 invariant that makes
  consistent hashing worth using, measured exactly.
- merkle_root_users: the Merkle root of the sorted distinct
  user_ids under the modular combine h = (a·1000003 + b) mod
  (2^61−1), zero-padded to the next power of two; the oracle halves
  a LIST state one level per recursion step (the half-sample
  device). Root, depth and leaf count are exact integers.
- skiplist_level_dist: skip-list level assignment ℓ(u) = trailing
  zeros of hash(u)+1 (geometric(1/2)); exact level counts c0..c3,
  the max level, and the chi-square against n/2^{ℓ+1} over levels
  0..3 as one identical float expression.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6

_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_CH_S = 8
_CH_V = 64
_MK_MOD = (1 << 61) - 1
_MK_MULT = 1000003


def _distinct_users(sf_dir: str) -> np.ndarray:
    ds = _pq(sf_dir, "events", columns=["user_id"])

    def users(t: pa.Table) -> pa.Table:
        u = np.unique(t["user_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({"u": pa.array(u)})

    return np.unique((ds.map_batches(users, batch_format="pyarrow")
                      .to_pandas())["u"].to_numpy(np.int64))


# ---------------------------------------------------------------------------
# Consistent hashing
# ---------------------------------------------------------------------------


def q_consistent_hash_balance(sf_dir: str):
    """Ring balance + rebalance moved fraction (docstring above)."""
    uu = _distinct_users(sf_dir).astype(np.uint64)
    kpos = (((uu % np.uint64(_H_MOD)) * np.uint64(_H_MULT)
             + np.uint64(_H_STEP)) % np.uint64(_H_MOD)) \
        .astype(np.int64)

    def assign(n_servers: int) -> np.ndarray:
        vid = np.arange(n_servers * _CH_V, dtype=np.uint64)
        pos = ((vid * np.uint64(_H_MULT) + np.uint64(_H_STEP))
               % np.uint64(_H_MOD)).astype(np.int64)
        srv = (vid // _CH_V).astype(np.int64)
        order = np.lexsort((srv, pos))
        pos_s, srv_s = pos[order], srv[order]
        idx = np.searchsorted(pos_s, kpos, side="left")
        idx = np.where(idx == len(pos_s), 0, idx)   # wraparound
        return srv_s[idx]

    a8 = assign(_CH_S)
    a9 = assign(_CH_S + 1)
    loads = np.bincount(a8, minlength=_CH_S)
    moved = int((a8 != a9).sum())
    n = len(uu)
    out = pd.DataFrame({
        "n_keys": [n], "max_load": [int(loads.max())],
        "min_load": [int(loads.min())], "moved": [moved],
        "moved_frac6": [_round6(np.array([float(moved)
                                          / float(n)]))[0]]})
    for col in ("n_keys", "max_load", "min_load", "moved"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CONSISTENT_HASH = f"""
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
keys AS (
  SELECT u,
         CAST(((u::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT
               + {_H_STEP}) % {_H_MOD} AS BIGINT) AS kpos
  FROM u),
ring8 AS (
  SELECT CAST(v // {_CH_V} AS BIGINT) AS sv,
         CAST((v::UBIGINT * {_H_MULT}::UBIGINT + {_H_STEP})
              % {_H_MOD} AS BIGINT) AS pos
  FROM (SELECT unnest(range({_CH_S * _CH_V})) AS v)),
ring9 AS (
  SELECT CAST(v // {_CH_V} AS BIGINT) AS sv,
         CAST((v::UBIGINT * {_H_MULT}::UBIGINT + {_H_STEP})
              % {_H_MOD} AS BIGINT) AS pos
  FROM (SELECT unnest(range({(_CH_S + 1) * _CH_V})) AS v)),
a8 AS (
  SELECT k.u,
         coalesce((SELECT sv FROM ring8 r WHERE r.pos >= k.kpos
                   ORDER BY r.pos, r.sv LIMIT 1),
                  (SELECT sv FROM ring8 ORDER BY pos, sv LIMIT 1))
           AS s
  FROM keys k),
a9 AS (
  SELECT k.u,
         coalesce((SELECT sv FROM ring9 r WHERE r.pos >= k.kpos
                   ORDER BY r.pos, r.sv LIMIT 1),
                  (SELECT sv FROM ring9 ORDER BY pos, sv LIMIT 1))
           AS s
  FROM keys k),
loads0 AS (SELECT s, count(*)::BIGINT AS c FROM a8 GROUP BY s),
loads AS (
  -- servers with ZERO keys must appear (min_load semantics)
  SELECT g.s, coalesce(loads0.c, 0) AS c
  FROM (SELECT unnest(range({_CH_S})) AS s) g
  LEFT JOIN loads0 ON loads0.s = g.s),
mv AS (
  SELECT count(*)::BIGINT AS moved
  FROM a8 JOIN a9 USING (u) WHERE a8.s <> a9.s),
c AS (SELECT count(*)::BIGINT AS n FROM keys)
SELECT c.n AS n_keys,
       (SELECT max(c) FROM loads)::BIGINT AS max_load,
       (SELECT min(c) FROM loads)::BIGINT AS min_load,
       mv.moved,
       round(CAST(mv.moved AS DOUBLE) / CAST(c.n AS DOUBLE), 6)
         AS moved_frac6
FROM c CROSS JOIN mv
"""


# ---------------------------------------------------------------------------
# Merkle root
# ---------------------------------------------------------------------------


def q_merkle_root_users(sf_dir: str):
    """Merkle root of sorted distinct user_ids (docstring above)."""
    uu = sorted(int(x) for x in _distinct_users(sf_dir))
    n = len(uu)
    size = 1
    depth = 0
    while size < n:
        size *= 2
        depth += 1
    leaves = uu + [0] * (size - n)
    level = leaves
    while len(level) > 1:
        level = [((level[2 * i] * _MK_MULT + level[2 * i + 1])
                  % _MK_MOD)
                 for i in range(len(level) // 2)]
    out = pd.DataFrame({"n_leaves": [n], "depth": [depth],
                        "root": [level[0]]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_MERKLE = f"""
WITH RECURSIVE u AS (SELECT DISTINCT user_id AS u FROM events),
base AS (
  SELECT count(*)::BIGINT AS n, list(u ORDER BY u) AS ls FROM u),
pad AS (
  SELECT n,
         CAST(ceil(ln(CAST(n AS DOUBLE)) / ln(2.0)
                   - 1e-12) AS BIGINT) AS depth,
         ls
  FROM base),
pad2 AS (
  SELECT n, depth,
         ls || [0::BIGINT FOR z IN
                range((1::BIGINT << depth) - n)] AS ls
  FROM pad),
tree AS (
  SELECT 0::BIGINT AS lvl, ls, n, depth FROM pad2
  UNION ALL
  SELECT lvl + 1,
         [(CAST(ls[2 * i - 1] AS HUGEINT) * {_MK_MULT}
           + ls[2 * i]) % {_MK_MOD}
          FOR i IN range(1, len(ls) // 2 + 1)],
         n, depth
  FROM tree WHERE len(ls) > 1)
SELECT n AS n_leaves, depth, ls[1]::BIGINT AS root
FROM tree WHERE len(ls) = 1
"""


# ---------------------------------------------------------------------------
# Skip-list levels
# ---------------------------------------------------------------------------


def q_skiplist_level_dist(sf_dir: str):
    """Skip-list level distribution + chi-square (docstring above)."""
    uu = _distinct_users(sf_dir).astype(np.uint64)
    h = (((uu % np.uint64(_H_MOD)) * np.uint64(_H_MULT)
          + np.uint64(_H_STEP)) % np.uint64(_H_MOD)) \
        .astype(np.int64) + 1
    lv = np.zeros(len(h), np.int64)
    hh = h.copy()
    while True:
        m = hh % 2 == 0
        if not m.any():
            break
        lv[m] += 1
        hh = np.where(m, hh // 2, hh)
        hh[~m] = 1
    lv = np.minimum(lv, 20)        # mirror the SQL CASE cap
    n = len(uu)
    counts = np.bincount(lv, minlength=4)
    chi2 = 0.0
    for l_ in range(4):
        exp = float(n) / float(2 ** (l_ + 1))
        chi2 = chi2 + (float(int(counts[l_])) - exp) ** 2 / exp
    out = pd.DataFrame({
        "n": [n], "c0": [int(counts[0])], "c1": [int(counts[1])],
        "c2": [int(counts[2])], "c3": [int(counts[3])],
        "max_level": [int(lv.max())],
        "chi2_6": [_round6(np.array([chi2]))[0]]})
    for col in ("n", "c0", "c1", "c2", "c3", "max_level"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SKIPLIST = f"""
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
h AS (
  SELECT CAST(((u::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT
               + {_H_STEP}) % {_H_MOD} AS BIGINT) + 1 AS h
  FROM u),
lvl AS (
  SELECT CASE
    WHEN h % 2 = 1 THEN 0 WHEN h % 4 = 2 THEN 1
    WHEN h % 8 = 4 THEN 2 WHEN h % 16 = 8 THEN 3
    WHEN h % 32 = 16 THEN 4 WHEN h % 64 = 32 THEN 5
    WHEN h % 128 = 64 THEN 6 WHEN h % 256 = 128 THEN 7
    WHEN h % 512 = 256 THEN 8 WHEN h % 1024 = 512 THEN 9
    WHEN h % 2048 = 1024 THEN 10 WHEN h % 4096 = 2048 THEN 11
    WHEN h % 8192 = 4096 THEN 12 WHEN h % 16384 = 8192 THEN 13
    WHEN h % 32768 = 16384 THEN 14 WHEN h % 65536 = 32768 THEN 15
    WHEN h % 131072 = 65536 THEN 16
    WHEN h % 262144 = 131072 THEN 17
    WHEN h % 524288 = 262144 THEN 18
    WHEN h % 1048576 = 524288 THEN 19
    ELSE 20 END AS l
  FROM h),
c AS (
  SELECT count(*)::BIGINT AS n,
         sum((l = 0)::INT)::BIGINT AS c0,
         sum((l = 1)::INT)::BIGINT AS c1,
         sum((l = 2)::INT)::BIGINT AS c2,
         sum((l = 3)::INT)::BIGINT AS c3,
         max(l)::BIGINT AS ml
  FROM lvl)
SELECT n, c0, c1, c2, c3, ml AS max_level,
       round((CAST(c0 AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             * (CAST(c0 AS DOUBLE) - CAST(n AS DOUBLE) / 2.0)
             / (CAST(n AS DOUBLE) / 2.0)
             + (CAST(c1 AS DOUBLE) - CAST(n AS DOUBLE) / 4.0)
               * (CAST(c1 AS DOUBLE) - CAST(n AS DOUBLE) / 4.0)
               / (CAST(n AS DOUBLE) / 4.0)
             + (CAST(c2 AS DOUBLE) - CAST(n AS DOUBLE) / 8.0)
               * (CAST(c2 AS DOUBLE) - CAST(n AS DOUBLE) / 8.0)
               / (CAST(n AS DOUBLE) / 8.0)
             + (CAST(c3 AS DOUBLE) - CAST(n AS DOUBLE) / 16.0)
               * (CAST(c3 AS DOUBLE) - CAST(n AS DOUBLE) / 16.0)
               / (CAST(n AS DOUBLE) / 16.0), 6) AS chi2_6
FROM c
"""


QUERIES159: dict[str, tuple] = {
    "consistent_hash_balance": (q_consistent_hash_balance,
                                SQL_CONSISTENT_HASH),
    "merkle_root_users": (q_merkle_root_users, SQL_MERKLE),
    "skiplist_level_dist": (q_skiplist_level_dist, SQL_SKIPLIST),
}
