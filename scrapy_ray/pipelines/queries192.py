"""One-hundred-ninety-second oracle-query batch — spatial indexing and
percolation on the 64×64 occupancy grid (the batch-171 Morton grid:
x = time-of-day bucket, y = user_id%64):

- quadtree_occupancy: quadtree node counts — distinct Morton-code
  prefixes at every level 1..6 vs the full 4^L capacity (the
  linear-quadtree fill audit behind every spatial index).
- grid_percolation_cluster: the largest 4-connected cluster of
  occupied cells via SYNCHRONOUS min-label propagation (Jacobi
  sweeps — numpy shifted-array minima and the SQL comprehension
  update are the same parallel schedule), 128 fixed sweeps ≥ the
  grid diameter so both sides provably converge; reports cluster
  count, the largest cluster size and its canonical (min-index)
  label.
- pow_leading_zeros: the proof-of-work difficulty audit — counts of
  hashed user ids with ≥k leading zero bits (k = 4, 8, 12) in the
  32-bit multiplicative-hash space against the n/2^k expectation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries171 import _morton

_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_T_US = 86_400_000_000
_GRID = 64
_PERC_IT = 128
_POW_KS = (4, 8, 12)


def _occupied_cells(sf_dir: str) -> pd.DataFrame:
    ds = _pq(sf_dir, "events", columns=["ts", "user_id"])

    def cells(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = (us % _T_US) // (_T_US // _GRID)
        y = u % _GRID
        g = pd.DataFrame({"x": x, "y": y, "one": np.int64(1)}) \
            .groupby(["x", "y"], sort=False).sum().reset_index()
        g["one"] = g["one"].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(cells, batch_format="pyarrow")
              .groupby(["x", "y"]).aggregate(Sum("one",
                                                 alias_name="one"))
              .to_pandas())


_SQL_OCC = f"""
occ AS (
  SELECT DISTINCT
         (epoch_us(ts) % {_T_US}) // ({_T_US} // {_GRID}) AS x,
         user_id % {_GRID} AS y
  FROM events)
"""


# ---------------------------------------------------------------------------
# Quadtree occupancy
# ---------------------------------------------------------------------------


def q_quadtree_occupancy(sf_dir: str):
    """Distinct Morton prefixes per quadtree level (docstring)."""
    occ = _occupied_cells(sf_dir)
    code = _morton(occ["x"].to_numpy(np.int64),
                   occ["y"].to_numpy(np.int64))
    rows = []
    for lvl in range(1, 7):
        pref = np.unique(code >> (12 - 2 * lvl))
        full = 4 ** lvl
        rows.append({"level": lvl, "n_nodes": len(pref),
                     "capacity": full,
                     "fill6": _round6(np.array(
                         [float(len(pref)) / full]))[0]})
    out = pd.DataFrame(rows)
    for col in ("level", "n_nodes", "capacity"):
        out[col] = out[col].astype(np.int64)
    return out


from scrapy_ray.pipelines.queries171 import _MORTON_SQL  # noqa: E402

SQL_QUADTREE = f"""
WITH {_SQL_OCC},
coded AS (SELECT x, y, {_MORTON_SQL} AS code FROM occ),
lv AS (SELECT unnest(range(1, 7)) AS level),
cnt AS (
  SELECT l.level,
         (SELECT count(DISTINCT code >> (12 - 2 * l.level))
          FROM coded)::BIGINT AS n_nodes
  FROM lv l)
SELECT level::BIGINT AS level, n_nodes,
       CAST(power(4, level) AS BIGINT) AS capacity,
       round(CAST(n_nodes AS DOUBLE)
             / CAST(power(4, level) AS DOUBLE), 6) AS fill6
FROM cnt ORDER BY level
"""


# ---------------------------------------------------------------------------
# Grid percolation
# ---------------------------------------------------------------------------


def q_grid_percolation_cluster(sf_dir: str):
    """Largest 4-connected occupied cluster (docstring above)."""
    occ = _occupied_cells(sf_dir)
    grid = np.zeros((_GRID, _GRID), bool)
    grid[occ["y"].to_numpy(np.int64),
         occ["x"].to_numpy(np.int64)] = True
    lab = np.where(grid,
                   np.arange(_GRID * _GRID).reshape(_GRID, _GRID)
                   + 1, 0).astype(np.int64)
    big = np.int64(1 << 40)
    for _ in range(_PERC_IT):
        cur = np.where(grid, lab, big)
        up = np.full_like(cur, big)
        dn = np.full_like(cur, big)
        lf = np.full_like(cur, big)
        rt = np.full_like(cur, big)
        up[1:, :] = cur[:-1, :]
        dn[:-1, :] = cur[1:, :]
        lf[:, 1:] = cur[:, :-1]
        rt[:, :-1] = cur[:, 1:]
        m = np.minimum.reduce([cur, up, dn, lf, rt])
        lab = np.where(grid, m, 0)
    labs = lab[grid]
    uniq, cnts = np.unique(labs, return_counts=True)
    best = np.lexsort((uniq, -cnts))[0]
    out = pd.DataFrame({
        "n_occupied": [int(grid.sum())],
        "n_clusters": [len(uniq)],
        "largest_cluster": [int(cnts[best])],
        "largest_label": [int(uniq[best])]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_PERC = f"""
WITH RECURSIVE {_SQL_OCC},
gridv AS (
  SELECT (SELECT list(
            CASE WHEN EXISTS (SELECT 1 FROM occ
                   WHERE occ.y = (z - 1) // {_GRID}
                     AND occ.x = (z - 1) % {_GRID})
                 THEN 1 ELSE 0 END ORDER BY z)
          FROM (SELECT unnest(range(1, {_GRID * _GRID} + 1))
                AS z)) AS g),
prop AS (
  SELECT 0 AS it, g,
         [CASE WHEN g[z2] = 1 THEN z2::BIGINT ELSE 0::BIGINT END
          FOR z2 IN range(1, {_GRID * _GRID} + 1)] AS lab
  FROM gridv
  UNION ALL
  SELECT it + 1, g,
         [CASE WHEN g[c] = 0 THEN 0::BIGINT ELSE
            least(lab[c],
                  CASE WHEN (c - 1) // {_GRID} > 0
                            AND g[c - {_GRID}] = 1
                       THEN lab[c - {_GRID}] ELSE lab[c] END,
                  CASE WHEN (c - 1) // {_GRID} < {_GRID - 1}
                            AND g[c + {_GRID}] = 1
                       THEN lab[c + {_GRID}] ELSE lab[c] END,
                  CASE WHEN (c - 1) % {_GRID} > 0
                            AND g[c - 1] = 1
                       THEN lab[c - 1] ELSE lab[c] END,
                  CASE WHEN (c - 1) % {_GRID} < {_GRID - 1}
                            AND g[c + 1] = 1
                       THEN lab[c + 1] ELSE lab[c] END)
          END
          FOR c IN range(1, {_GRID * _GRID} + 1)]
  FROM prop WHERE it < {_PERC_IT}),
fin AS (SELECT lab FROM prop WHERE it = {_PERC_IT}),
cells AS (
  SELECT lab[z] AS l
  FROM fin, (SELECT unnest(range(1, {_GRID * _GRID} + 1)) AS z) z
  WHERE lab[z] > 0),
cl AS (SELECT l, count(*)::BIGINT AS c FROM cells GROUP BY l),
best AS (SELECT * FROM cl ORDER BY c DESC, l LIMIT 1)
SELECT (SELECT count(*) FROM cells)::BIGINT AS n_occupied,
       (SELECT count(*) FROM cl)::BIGINT AS n_clusters,
       best.c AS largest_cluster, best.l::BIGINT AS largest_label
FROM best
"""


# ---------------------------------------------------------------------------
# Proof-of-work leading zeros
# ---------------------------------------------------------------------------


def q_pow_leading_zeros(sf_dir: str):
    """Leading-zero-bit difficulty counts over hashed ids."""
    ds = _pq(sf_dir, "events", columns=["user_id"])
    uids = np.asarray(sorted(int(u) for u in ds.unique("user_id")),
                      np.uint64)
    h = ((uids % np.uint64(_H_MOD)) * np.uint64(_H_MULT)
         + np.uint64(_H_STEP)) % np.uint64(_H_MOD)
    n = len(uids)
    rows = []
    for k in _POW_KS:
        cnt = int((h < np.uint64(1 << (32 - k))).sum())
        rows.append({"k_bits": k, "n_hits": cnt,
                     "expected6": _round6(np.array(
                         [float(n) / float(1 << k)]))[0]})
    out = pd.DataFrame(rows)
    for col in ("k_bits", "n_hits"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_POW = f"""
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
h AS (
  SELECT CAST(((u::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT
               + {_H_STEP}) % {_H_MOD} AS BIGINT) AS h
  FROM u),
n AS (SELECT count(*)::BIGINT AS n FROM h),
ks AS (SELECT unnest([{", ".join(str(k) for k in _POW_KS)}]) AS k)
SELECT k::BIGINT AS k_bits,
       (SELECT count(*) FROM h
        WHERE h.h < (1::BIGINT << (32 - ks.k)))::BIGINT AS n_hits,
       round(CAST((SELECT n FROM n) AS DOUBLE)
             / CAST(1::BIGINT << ks.k AS DOUBLE), 6) AS expected6
FROM ks ORDER BY k
"""


QUERIES192: dict[str, tuple] = {
    "quadtree_occupancy": (q_quadtree_occupancy, SQL_QUADTREE),
    "grid_percolation_cluster": (q_grid_percolation_cluster,
                                 SQL_PERC),
    "pow_leading_zeros": (q_pow_leading_zeros, SQL_POW),
}
