"""One-hundred-eighty-second oracle-query batch — Steiner trees,
bin packing, and tolerance intervals:

- steiner_tree_sources: the exact Steiner tree connecting the top-3
  sources on the 5-node overlap graph (edge cost = overlap weight),
  by enumerating the 4 subsets of the two optional nodes and running
  a deterministic Prim replay on each induced subgraph — crossing
  edges encoded as (w·64 + i)·64 + j integers so list_min IS the
  (w, i, j) tiebreak; 4 subset rows advance together through the
  recursion. Reports the optimal cost and the canonical optional set.
- ffd_bin_packing: First-Fit-Decreasing over the top-50 order totals
  (cents, desc, orderkey tiebreak) into bins of cap = 3/2 · max
  item — one recursion level per item carrying the bin-load LIST;
  reports bins used vs the ⌈Σ/cap⌉ lower bound and slack.
- normal_tolerance_interval: the 90%-content / 95%-confidence normal
  tolerance interval of daily revenue — Howe's k-factor with the
  Wilson–Hilferty chi-square quantile approximation (literal normal
  quantiles, identical float expressions both sides; mean and s from
  exact integer daily-cents sums).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries169 import _daily_xmy
from scrapy_ray.pipelines.queries179 import _overlap_graph, _SQL_GRAPH

_FFD_N = 50
_Z95 = 1.644854
_TI_P = 0.90
_TI_ALPHA = 0.05


# ---------------------------------------------------------------------------
# Steiner tree
# ---------------------------------------------------------------------------


def q_steiner_tree_sources(sf_dir: str):
    """Exact Steiner tree over optional-node subsets (docstring)."""
    w = _overlap_graph(sf_dir)
    best = None
    for om in range(4):
        nodes = [0, 1, 2] + [3 + b for b in range(2)
                             if (om >> b) & 1]
        intree = {0}
        total = 0
        while len(intree) < len(nodes):
            cand = None
            for i in sorted(intree):
                for j in nodes:
                    if j in intree:
                        continue
                    key = (int(w[i, j]), i + 1, j + 1)
                    if cand is None or key < cand:
                        cand = key
            total += cand[0]
            intree.add(cand[2] - 1)
        key = (total, om)
        if best is None or key < best:
            best = key
    out = pd.DataFrame({"steiner_cost": [best[0]],
                        "opt_mask": [best[1]],
                        "n_terminals": [3]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_STEINER = f"""
WITH RECURSIVE {_SQL_GRAPH},
wmat AS (
  SELECT (SELECT list(coalesce(e.w, 0) ORDER BY a.i * 10 + b.i)
          FROM (SELECT si AS i FROM top5) a
          CROSS JOIN (SELECT si AS i FROM top5) b
          LEFT JOIN edges e ON e.i = a.i AND e.j = b.i) AS wm),
subsets AS (
  SELECT m.m AS om,
         7 | (CASE WHEN (m.m & 1) = 1 THEN 8 ELSE 0 END)
           | (CASE WHEN (m.m & 2) = 2 THEN 16 ELSE 0 END)
           AS nodemask
  FROM (SELECT unnest(range(0, 4)) AS m) m),
prim AS (
  SELECT s.om, s.nodemask, 1::BIGINT AS tmask, 0::BIGINT AS total,
         w.wm AS wm, 0 AS step
  FROM subsets s, wmat w
  UNION ALL
  SELECT om, nodemask,
         CASE WHEN tmask = nodemask THEN tmask
              ELSE tmask | (1 << ((best % 64) - 1)) END,
         CASE WHEN tmask = nodemask THEN total
              ELSE total + best // 4096 END,
         wm, step + 1
  FROM (
    SELECT om, nodemask, tmask, total, wm, step,
           list_min([(wm[z] * 64 + ((z - 1) // 5 + 1)) * 64
                     + ((z - 1) % 5 + 1)
                     FOR z IN range(1, 26)
                     IF ((tmask >> ((z - 1) // 5)) & 1) = 1
                        AND ((tmask >> ((z - 1) % 5)) & 1) = 0
                        AND ((nodemask >> ((z - 1) % 5)) & 1) = 1
                    ]) AS best
    FROM prim WHERE step < 4) p),
fin AS (
  SELECT om, total FROM prim
  WHERE step = 4 AND tmask = nodemask),
bst AS (SELECT total, om FROM fin ORDER BY total, om LIMIT 1)
SELECT total::BIGINT AS steiner_cost, om::BIGINT AS opt_mask,
       3::BIGINT AS n_terminals
FROM bst
"""


# ---------------------------------------------------------------------------
# First-fit-decreasing bin packing
# ---------------------------------------------------------------------------


def q_ffd_bin_packing(sf_dir: str):
    """FFD replay on top-50 order totals (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def top_part(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        order = np.lexsort((ok, -c))[:_FFD_N]
        return pa.table({"k": pa.array(ok[order]),
                         "c": pa.array(c[order])})

    part = (ds.map_batches(top_part, batch_format="pyarrow")
              .to_pandas())
    part = part.sort_values(["c", "k"],
                            ascending=[False, True]).head(_FFD_N)
    items = [int(v) for v in part["c"]]
    cap = items[0] * 3 // 2
    bins: list[int] = []
    for it in items:
        placed = False
        for b in range(len(bins)):
            if bins[b] + it <= cap:
                bins[b] += it
                placed = True
                break
        if not placed:
            bins.append(it)
    tot = sum(items)
    lb = -(-tot // cap)
    r6 = _round6(np.array([float(len(bins) * cap - tot)
                           / float(len(bins) * cap)]))[0]
    out = pd.DataFrame({"n_items": [len(items)], "cap": [cap],
                        "n_bins": [len(bins)], "lower_bound": [lb],
                        "slack6": [r6]})
    for col in ("n_items", "cap", "n_bins", "lower_bound"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_FFD = f"""
WITH RECURSIVE items AS (
  SELECT list(c ORDER BY c DESC, k) AS il,
         count(*)::BIGINT AS n, sum(c)::BIGINT AS tot,
         max(c) * 3 // 2 AS cap
  FROM (SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders ORDER BY c DESC, k LIMIT {_FFD_N})),
ffd AS (
  SELECT 0::BIGINT AS i, il, n, tot, cap,
         []::BIGINT[] AS loads
  FROM items
  UNION ALL
  SELECT i + 1, il, n, tot, cap,
         CASE WHEN fit IS NULL THEN list_append(loads, il[i + 1])
              ELSE [CASE WHEN b = fit THEN loads[b] + il[i + 1]
                         ELSE loads[b] END
                    FOR b IN range(1, len(loads) + 1)] END
  FROM (
    SELECT i, il, n, tot, cap, loads,
           list_min([bb FOR bb IN range(1, len(loads) + 1)
                     IF loads[bb] + il[i + 1] <= cap]) AS fit
    FROM ffd WHERE i < n) f),
fin AS (SELECT * FROM ffd WHERE i = n)
SELECT n AS n_items, cap::BIGINT AS cap,
       len(loads)::BIGINT AS n_bins,
       ((tot + cap - 1) // cap)::BIGINT AS lower_bound,
       round(CAST(len(loads) * cap - tot AS DOUBLE)
             / CAST(len(loads) * cap AS DOUBLE), 6) AS slack6
FROM fin
"""


# ---------------------------------------------------------------------------
# Normal tolerance interval
# ---------------------------------------------------------------------------


def q_normal_tolerance_interval(sf_dir: str):
    """Howe k-factor tolerance interval on daily revenue."""
    dly = _daily_xmy(sf_dir)
    yc = [int(v) for v in dly["y"]]
    n = len(yc)
    s1 = sum(yc)
    s2 = sum(v * v for v in yc)
    mean = float(s1) / float(n) / 100.0
    sd = math.sqrt(float(n * s2 - s1 * s1)
                   / (float(n) * float(n - 1))) / 100.0
    df = n - 1
    base = (1.0 - 2.0 / (9.0 * df)
            + (-_Z95) * math.sqrt(2.0 / (9.0 * df)))
    chi2 = df * (base * base * base)
    k = _Z95 * math.sqrt(df * (1.0 + 1.0 / n) / chi2)
    r6 = _round6(np.array([mean, sd, k, mean - k * sd,
                           mean + k * sd]))
    out = pd.DataFrame({"n_days": [n], "mean6": [r6[0]],
                        "sd6": [r6[1]], "k6": [r6[2]],
                        "lo6": [r6[3]], "hi6": [r6[4]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_TOLERANCE = f"""
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
s AS (
  SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS s1,
         sum(CAST(y AS HUGEINT) * y) AS s2
  FROM dly),
f AS (
  SELECT n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean,
         sqrt(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
           / 100.0 AS sd,
         (1.0 - 2.0 / (9.0 * (n - 1))
          + (-{_Z95}) * sqrt(2.0 / (9.0 * (n - 1)))) AS bb
  FROM s),
f2 AS (
  SELECT n, mean, sd, (n - 1) * (bb * bb * bb) AS chi2 FROM f),
g AS (
  SELECT n, mean, sd,
         {_Z95} * sqrt((n - 1) * (1.0 + 1.0 / n) / chi2) AS k
  FROM f2)
SELECT n AS n_days, round(mean, 6) AS mean6, round(sd, 6) AS sd6,
       round(k, 6) AS k6, round(mean - k * sd, 6) AS lo6,
       round(mean + k * sd, 6) AS hi6
FROM g
"""


QUERIES182: dict[str, tuple] = {
    "steiner_tree_sources": (q_steiner_tree_sources, SQL_STEINER),
    "ffd_bin_packing": (q_ffd_bin_packing, SQL_FFD),
    "normal_tolerance_interval": (q_normal_tolerance_interval,
                                  SQL_TOLERANCE),
}
