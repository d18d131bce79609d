"""One-hundred-forty-third oracle-query batch — graph distances and
computational geometry, every statistic a pure integer:

- harmonic_centrality_docs: full-closure BFS from the 32 smallest
  doc_ids over the suite's deterministic stride graph
  (u → (31u+c) mod N, c=1..3; the pagerank/cc derivation). Each
  source's BFS runs VECTORIZED inside a map_batches task (sources
  fan out across tasks; each is O(N·diameter) boolean algebra), so
  the harmonic sum needs no float: contribution 10⁹ // d is integer
  floor division on both sides. The oracle recursion is depth-bounded
  at 18 — measured eccentricities are 8/10/14 at sf0.001/0.01/0.1,
  so the bound is slack through the driver's largest scale.
- convex_hull_daily: convex hull of the 30 (day-index, daily event
  cents) points. x is strictly increasing so the upper/lower chains
  are the O(n³) NOT-EXISTS membership tests with integer cross
  products (boundary-collinear points INCLUDED — the trapezoid area
  telescopes unchanged); 2·area comes from signed trapezoid sums
  over each chain and the diameter² is the max pairwise squared
  distance with HUGEINT squares.
- mst_prim_daily: exact minimum-spanning-tree weight of the complete
  graph on the daily points under w = |Δday|·10000 + |Δcents|,
  via Prim with a distance-array LIST state replayed one vertex per
  recursion level (argmin tie → smallest day index).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _nrows, _pq
from scrapy_ray.pipelines.queries47 import _strip

_HC_SOURCES = 32
_HC_DEPTH_BOUND = 18      # oracle recursion cap; ecc(sf0.1) = 14


def _daily_cents(sf_dir: str) -> np.ndarray:
    """Exact total event-value cents per day, dense in day order."""
    ds = _pq(sf_dir, "events", columns=["ts", "value"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"day": day, "c": c}) \
            .groupby("day", sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(dpart, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("c", alias_name="c"))
             .to_pandas().sort_values("day"))
    return agg["c"].to_numpy(np.int64)


# ---------------------------------------------------------------------------
# Harmonic centrality
# ---------------------------------------------------------------------------


def q_harmonic_centrality_docs(sf_dir: str):
    """Top-5 BFS harmonic centralities (docstring above)."""
    import ray.data

    n = _nrows(sf_dir, "documents")
    perms = [((31 * np.arange(n, dtype=np.int64) + c) % n)
             for c in (1, 2, 3)]

    def bfs(batch: dict) -> pd.DataFrame:
        srcs = np.asarray(batch["id"], np.int64)
        s = len(srcs)
        inf = np.int64(1 << 30)
        dist = np.full((s, n), inf, np.int64)
        dist[np.arange(s), srcs] = 0
        fr = np.zeros((s, n), bool)
        fr[np.arange(s), srcs] = True
        lvl = 0
        while fr.any():
            lvl += 1
            nxt = np.zeros((s, n), bool)
            for ix in perms:
                tmp = np.zeros((s, n), bool)
                tmp[:, ix] = fr
                nxt |= tmp
            nxt &= dist == inf
            dist[nxt] = lvl
            fr = nxt
        rows = []
        for i, src in enumerate(srcs.tolist()):
            d = dist[i]
            m = (d > 0) & (d < inf)
            rows.append((src, int(m.sum()), int(d[m].max()),
                         int((np.int64(1000000000) // d[m]).sum())))
        return _strip(pd.DataFrame(
            rows, columns=["src", "reached", "ecc", "h9"]))

    ds = ray.data.from_items(
        [{"id": i} for i in range(_HC_SOURCES)])
    res = (ds.map_batches(bfs, batch_format="numpy", batch_size=4)
             .to_pandas())
    res = res.sort_values(["h9", "src"],
                          ascending=[False, True]).head(5) \
        .reset_index(drop=True)
    for col in res.columns:
        res[col] = res[col].astype(np.int64)
    return res


SQL_HARMONIC = f"""
WITH RECURSIVE walk AS (
  SELECT doc_id AS src, doc_id AS node, 0 AS dist
  FROM documents WHERE doc_id < {_HC_SOURCES}
  UNION
  SELECT w.src, (w.node * 31 + c.c)
                % (SELECT count(*) FROM documents),
         w.dist + 1
  FROM walk w, (SELECT unnest([1, 2, 3]) AS c) c
  WHERE w.dist < {_HC_DEPTH_BOUND}
),
d AS (
  SELECT src, node, min(dist)::BIGINT AS dist
  FROM walk GROUP BY 1, 2),
h AS (
  SELECT src, count(*)::BIGINT AS reached, max(dist)::BIGINT AS ecc,
         sum(1000000000 // dist)::BIGINT AS h9
  FROM d WHERE dist > 0 GROUP BY src)
SELECT src, reached, ecc, h9 FROM h
ORDER BY h9 DESC, src LIMIT 5
"""


# ---------------------------------------------------------------------------
# Convex hull of daily points
# ---------------------------------------------------------------------------


def q_convex_hull_daily(sf_dir: str):
    """Hull size / area / diameter of daily points (docstring)."""
    y = _daily_cents(sf_dir).tolist()            # Python ints: exact
    n = len(y)
    x = list(range(1, n + 1))

    def on_chain(p: int, upper: bool) -> bool:
        for i in range(p):
            for j in range(p + 1, n):
                lhs = (y[p] - y[i]) * (x[j] - x[i])
                rhs = (y[j] - y[i]) * (x[p] - x[i])
                if (lhs < rhs) if upper else (lhs > rhs):
                    return False
        return True

    up = [p for p in range(n) if on_chain(p, True)]
    lo = [p for p in range(n) if on_chain(p, False)]
    area2 = sum((x[b] - x[a]) * (y[a] + y[b])
                for a, b in zip(up, up[1:])) \
        - sum((x[b] - x[a]) * (y[a] + y[b])
              for a, b in zip(lo, lo[1:]))
    diam2 = max((x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2
                for i in range(n) for j in range(i + 1, n))
    out = pd.DataFrame({"n_points": [n], "n_upper": [len(up)],
                        "n_lower": [len(lo)], "area2": [area2],
                        "diam2": [diam2]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_CONVEX_HULL = """
WITH dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
pts AS (
  SELECT row_number() OVER (ORDER BY dy) AS x, y FROM dd),
up AS (
  SELECT p.x, p.y FROM pts p WHERE NOT EXISTS (
    SELECT 1 FROM pts i, pts j
    WHERE i.x < p.x AND j.x > p.x
      AND (p.y - i.y) * (j.x - i.x) < (j.y - i.y) * (p.x - i.x))),
lo AS (
  SELECT p.x, p.y FROM pts p WHERE NOT EXISTS (
    SELECT 1 FROM pts i, pts j
    WHERE i.x < p.x AND j.x > p.x
      AND (p.y - i.y) * (j.x - i.x) > (j.y - i.y) * (p.x - i.x))),
ua AS (
  SELECT sum((x2 - x) * (y + y2))::BIGINT AS s, count(*)::BIGINT AS c
  FROM (SELECT x, y, lead(x) OVER (ORDER BY x) AS x2,
               lead(y) OVER (ORDER BY x) AS y2 FROM up)
  WHERE x2 IS NOT NULL),
la AS (
  SELECT sum((x2 - x) * (y + y2))::BIGINT AS s, count(*)::BIGINT AS c
  FROM (SELECT x, y, lead(x) OVER (ORDER BY x) AS x2,
               lead(y) OVER (ORDER BY x) AS y2 FROM lo)
  WHERE x2 IS NOT NULL),
dm AS (
  SELECT max(CAST(a.x - b.x AS HUGEINT) * (a.x - b.x)
             + CAST(a.y - b.y AS HUGEINT) * (a.y - b.y)) AS d2
  FROM pts a JOIN pts b ON a.x < b.x)
SELECT (SELECT count(*) FROM pts)::BIGINT AS n_points,
       (ua.c + 1)::BIGINT AS n_upper, (la.c + 1)::BIGINT AS n_lower,
       (ua.s - la.s)::BIGINT AS area2,
       CAST(dm.d2 AS BIGINT) AS diam2
FROM ua CROSS JOIN la CROSS JOIN dm
"""


# ---------------------------------------------------------------------------
# Prim MST on daily points
# ---------------------------------------------------------------------------


def q_mst_prim_daily(sf_dir: str):
    """Exact MST weight via Prim replay (docstring above)."""
    y = _daily_cents(sf_dir).tolist()
    n = len(y)
    x = list(range(1, n + 1))

    def w(i: int, j: int) -> int:
        return abs(x[i] - x[j]) * 10000 + abs(y[i] - y[j])

    used = [False] * n
    used[0] = True
    dist = [w(0, j) if j else 0 for j in range(n)]
    total = 0
    mx = 0
    for _ in range(n - 1):
        m = min(dist[j] for j in range(n) if not used[j])
        j_star = min(j for j in range(n)
                     if not used[j] and dist[j] == m)
        used[j_star] = True
        total += m
        mx = max(mx, m)
        for jj in range(n):
            if not used[jj]:
                dist[jj] = min(dist[jj], w(j_star, jj))
    out = pd.DataFrame({"n_nodes": [n], "mst_weight": [total],
                        "max_edge": [mx]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_MST_PRIM = """
WITH RECURSIVE dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
pts AS (
  SELECT row_number() OVER (ORDER BY dy) AS x, y FROM dd),
base AS (
  SELECT count(*)::BIGINT AS n, list(x ORDER BY x) AS xs,
         list(y ORDER BY x) AS ys
  FROM pts),
prim AS (
  SELECT 1::BIGINT AS step,
         [j = 1 FOR j IN range(1, n + 1)] AS used,
         [CASE WHEN j = 1 THEN 0
               ELSE abs(xs[j] - xs[1]) * 10000 + abs(ys[j] - ys[1])
          END FOR j IN range(1, n + 1)] AS dist,
         0::BIGINT AS total, 0::BIGINT AS mx, n, xs, ys
  FROM base
  UNION ALL
  SELECT step + 1,
         [used[j] OR j = pick.js FOR j IN range(1, n + 1)],
         [CASE WHEN used[j] OR j = pick.js THEN dist[j]
               ELSE least(dist[j],
                          abs(xs[j] - xs[pick.js]) * 10000
                          + abs(ys[j] - ys[pick.js]))
          END FOR j IN range(1, n + 1)],
         total + pick.m, greatest(mx, pick.m), n, xs, ys
  FROM prim, LATERAL (
    SELECT m, list_aggregate(
             [j FOR j IN range(1, CAST(n AS INT) + 1)
              IF NOT used[j] AND dist[j] = m], 'min') AS js
    FROM (SELECT list_aggregate(
            [dist[j] FOR j IN range(1, CAST(n AS INT) + 1)
             IF NOT used[j]], 'min') AS m)) pick
  WHERE step < n)
SELECT n AS n_nodes, total AS mst_weight, mx AS max_edge
FROM prim WHERE step = (SELECT max(step) FROM prim)
"""


QUERIES143: dict[str, tuple] = {
    "harmonic_centrality_docs": (q_harmonic_centrality_docs,
                                 SQL_HARMONIC),
    "convex_hull_daily": (q_convex_hull_daily, SQL_CONVEX_HULL),
    "mst_prim_daily": (q_mst_prim_daily, SQL_MST_PRIM),
}
