"""One-hundred-fifty-first oracle-query batch — exact combinatorial
optimization by full enumeration (the Kemeny device generalized),
every cost/weight an exact integer:

- assignment_sources_langs: the max-weight assignment of the top-5
  document sources to the top-5 languages (weight = doc count in the
  cell), solved EXACTLY over all 120 permutations with the
  (weight DESC, lang-tuple lexicographic) tiebreak.
- stable_matching_sources_langs: the source-optimal stable matching
  (= Gale-Shapley outcome) between the same two sides, preferences
  by cell count (desc, name asc). Instead of replaying proposals,
  both sides enumerate the 120 perfect matchings, filter those with
  NO blocking pair, and pick the lexicographic minimum of the
  source-rank vector — the source-optimal stable matching dominates
  every source's rank simultaneously, so this argmin IS Gale-Shapley.
- tsp_exact_top_days: the exact traveling-salesman cycle through the
  top-8 revenue days as (day·10⁴, cents) points under L1 distance —
  start pinned at the earliest day, all 5040 orderings of the rest
  enumerated (7-way distinct self-join in SQL), argmin by
  (cost, day-sequence lexicographic).
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries47 import _strip


def _src_lang_cells(sf_dir: str) -> pd.DataFrame:
    ds = _pq(sf_dir, "documents", columns=["source", "lang"])

    def cpart(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({"s": np.asarray(t["source"].to_pylist()),
                          "l": np.asarray(t["lang"].to_pylist()),
                          "n": np.int64(1)}) \
            .groupby(["s", "l"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(cpart, batch_format="pyarrow")
              .groupby(["s", "l"]).aggregate(Sum("n", alias_name="n"))
              .to_pandas())


def _tops(cells: pd.DataFrame, col: str) -> list[str]:
    tot = cells.groupby(col)["n"].sum().reset_index() \
        .sort_values(["n", col], ascending=[False, True])
    return sorted(tot[col].head(5).tolist())


# ---------------------------------------------------------------------------
# Max-weight assignment
# ---------------------------------------------------------------------------


def q_assignment_sources_langs(sf_dir: str):
    """Exact max-weight 5×5 assignment (docstring above)."""
    cells = _src_lang_cells(sf_dir)
    srcs = _tops(cells, "s")
    langs = _tops(cells, "l")
    w = {(r["s"], r["l"]): int(r["n"]) for _, r in cells.iterrows()}
    best = None
    for perm in itertools.permutations(langs):
        tot = sum(w.get((s, l), 0) for s, l in zip(srcs, perm))
        cand = (-tot, perm)
        if best is None or cand < best:
            best = cand
    tot, perm = -best[0], best[1]
    out = pd.DataFrame({
        "total_weight": [tot],
        "lang1": [perm[0]], "lang2": [perm[1]], "lang3": [perm[2]],
        "lang4": [perm[3]], "lang5": [perm[4]]})
    out["total_weight"] = out["total_weight"].astype(np.int64)
    return out


SQL_ASSIGNMENT = """
WITH cells AS (
  SELECT source AS s, lang AS l, count(*)::BIGINT AS n
  FROM documents GROUP BY 1, 2),
top_s AS (
  SELECT s, row_number() OVER (ORDER BY s) AS i FROM (
    SELECT s FROM (SELECT s, sum(n) AS t FROM cells GROUP BY s
                   ORDER BY t DESC, s LIMIT 5))),
top_l AS (
  SELECT l, row_number() OVER (ORDER BY l) AS i FROM (
    SELECT l FROM (SELECT l, sum(n) AS t FROM cells GROUP BY l
                   ORDER BY t DESC, l LIMIT 5))),
w AS (
  SELECT ts.i AS si, tl.i AS li, ts.s, tl.l,
         coalesce(c.n, 0)::BIGINT AS n
  FROM top_s ts CROSS JOIN top_l tl
  LEFT JOIN cells c ON c.s = ts.s AND c.l = tl.l),
perms AS (
  SELECT a.li AS p1, b.li AS p2, c.li AS p3, d.li AS p4, e.li AS p5
  FROM (SELECT DISTINCT li FROM w) a, (SELECT DISTINCT li FROM w) b,
       (SELECT DISTINCT li FROM w) c, (SELECT DISTINCT li FROM w) d,
       (SELECT DISTINCT li FROM w) e
  WHERE a.li <> b.li AND a.li <> c.li AND a.li <> d.li
    AND a.li <> e.li AND b.li <> c.li AND b.li <> d.li
    AND b.li <> e.li AND c.li <> d.li AND c.li <> e.li
    AND d.li <> e.li),
scored AS (
  SELECT p1, p2, p3, p4, p5,
      (SELECT n FROM w WHERE si = 1 AND li = p1)
    + (SELECT n FROM w WHERE si = 2 AND li = p2)
    + (SELECT n FROM w WHERE si = 3 AND li = p3)
    + (SELECT n FROM w WHERE si = 4 AND li = p4)
    + (SELECT n FROM w WHERE si = 5 AND li = p5) AS tot
  FROM perms)
SELECT tot::BIGINT AS total_weight,
       (SELECT l FROM top_l WHERE i = p1) AS lang1,
       (SELECT l FROM top_l WHERE i = p2) AS lang2,
       (SELECT l FROM top_l WHERE i = p3) AS lang3,
       (SELECT l FROM top_l WHERE i = p4) AS lang4,
       (SELECT l FROM top_l WHERE i = p5) AS lang5
FROM scored
ORDER BY tot DESC,
         (SELECT l FROM top_l WHERE i = p1),
         (SELECT l FROM top_l WHERE i = p2),
         (SELECT l FROM top_l WHERE i = p3),
         (SELECT l FROM top_l WHERE i = p4)
LIMIT 1
"""


# ---------------------------------------------------------------------------
# Stable matching
# ---------------------------------------------------------------------------


def q_stable_matching_sources_langs(sf_dir: str):
    """Source-optimal stable matching via enumeration (docstring)."""
    cells = _src_lang_cells(sf_dir)
    srcs = _tops(cells, "s")
    langs = _tops(cells, "l")
    w = {(r["s"], r["l"]): int(r["n"]) for _, r in cells.iterrows()}
    rs = {}                      # rank of lang within source's prefs
    for s in srcs:
        order = sorted(langs, key=lambda l: (-w.get((s, l), 0), l))
        for r_, l in enumerate(order, start=1):
            rs[(s, l)] = r_
    rl = {}
    for l in langs:
        order = sorted(srcs, key=lambda s: (-w.get((s, l), 0), s))
        for r_, s in enumerate(order, start=1):
            rl[(l, s)] = r_
    stable = []
    for perm in itertools.permutations(langs):
        asg = dict(zip(srcs, perm))
        inv = {l: s for s, l in asg.items()}
        blocked = any(
            rs[(s, l)] < rs[(s, asg[s])]
            and rl[(l, s)] < rl[(l, inv[l])]
            for s in srcs for l in langs)
        if not blocked:
            stable.append(perm)
    best = min(stable,
               key=lambda p: tuple(rs[(s, l)]
                                   for s, l in zip(srcs, p)))
    out = pd.DataFrame({
        "n_stable": [len(stable)],
        "lang1": [best[0]], "lang2": [best[1]], "lang3": [best[2]],
        "lang4": [best[3]], "lang5": [best[4]],
        "rank_sum": [sum(rs[(s, l)] for s, l in zip(srcs, best))]})
    for col in ("n_stable", "rank_sum"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_STABLE_MATCHING = """
WITH cells AS (
  SELECT source AS s, lang AS l, count(*)::BIGINT AS n
  FROM documents GROUP BY 1, 2),
top_s AS (
  SELECT s, row_number() OVER (ORDER BY s) AS i FROM (
    SELECT s FROM (SELECT s, sum(n) AS t FROM cells GROUP BY s
                   ORDER BY t DESC, s LIMIT 5))),
top_l AS (
  SELECT l, row_number() OVER (ORDER BY l) AS i FROM (
    SELECT l FROM (SELECT l, sum(n) AS t FROM cells GROUP BY l
                   ORDER BY t DESC, l LIMIT 5))),
w AS (
  SELECT ts.i AS si, tl.i AS li, ts.s, tl.l,
         coalesce(c.n, 0)::BIGINT AS n
  FROM top_s ts CROSS JOIN top_l tl
  LEFT JOIN cells c ON c.s = ts.s AND c.l = tl.l),
rs AS (
  SELECT si, li,
         row_number() OVER (PARTITION BY si ORDER BY n DESC, l)
           AS r
  FROM w),
rl AS (
  SELECT li, si,
         row_number() OVER (PARTITION BY li ORDER BY n DESC, s)
           AS r
  FROM w),
perms AS (
  SELECT row_number() OVER () AS pid,
         a.li AS p1, b.li AS p2, c.li AS p3, d.li AS p4, e.li AS p5
  FROM (SELECT DISTINCT li FROM w) a, (SELECT DISTINCT li FROM w) b,
       (SELECT DISTINCT li FROM w) c, (SELECT DISTINCT li FROM w) d,
       (SELECT DISTINCT li FROM w) e
  WHERE a.li <> b.li AND a.li <> c.li AND a.li <> d.li
    AND a.li <> e.li AND b.li <> c.li AND b.li <> d.li
    AND b.li <> e.li AND c.li <> d.li AND c.li <> e.li
    AND d.li <> e.li),
asg AS (
  SELECT pid, 1 AS si, p1 AS li FROM perms
  UNION ALL SELECT pid, 2, p2 FROM perms
  UNION ALL SELECT pid, 3, p3 FROM perms
  UNION ALL SELECT pid, 4, p4 FROM perms
  UNION ALL SELECT pid, 5, p5 FROM perms),
blocked AS (
  SELECT DISTINCT a.pid
  FROM asg a JOIN asg b ON b.pid = a.pid
  JOIN rs r1 ON r1.si = a.si AND r1.li = b.li
  JOIN rs r2 ON r2.si = a.si AND r2.li = a.li
  JOIN rl r3 ON r3.li = b.li AND r3.si = a.si
  JOIN rl r4 ON r4.li = b.li AND r4.si = b.si
  WHERE r1.r < r2.r AND r3.r < r4.r),
stable AS (
  SELECT p.*,
    (SELECT r FROM rs WHERE si = 1 AND li = p.p1) AS k1,
    (SELECT r FROM rs WHERE si = 2 AND li = p.p2) AS k2,
    (SELECT r FROM rs WHERE si = 3 AND li = p.p3) AS k3,
    (SELECT r FROM rs WHERE si = 4 AND li = p.p4) AS k4,
    (SELECT r FROM rs WHERE si = 5 AND li = p.p5) AS k5
  FROM perms p WHERE p.pid NOT IN (SELECT pid FROM blocked)),
ns AS (SELECT count(*)::BIGINT AS n_stable FROM stable)
SELECT ns.n_stable,
       (SELECT l FROM top_l WHERE i = s.p1) AS lang1,
       (SELECT l FROM top_l WHERE i = s.p2) AS lang2,
       (SELECT l FROM top_l WHERE i = s.p3) AS lang3,
       (SELECT l FROM top_l WHERE i = s.p4) AS lang4,
       (SELECT l FROM top_l WHERE i = s.p5) AS lang5,
       (s.k1 + s.k2 + s.k3 + s.k4 + s.k5)::BIGINT AS rank_sum
FROM stable s CROSS JOIN ns
ORDER BY s.k1, s.k2, s.k3, s.k4, s.k5 LIMIT 1
"""


# ---------------------------------------------------------------------------
# Exact TSP on top revenue days
# ---------------------------------------------------------------------------


def q_tsp_exact_top_days(sf_dir: str):
    """Exact L1 TSP over the top-8 revenue days (docstring above)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    y = [int(v) for v in _daily_cents(sf_dir).tolist()]
    days = sorted(range(1, len(y) + 1),
                  key=lambda t: (-y[t - 1], t))[:8]
    days.sort()
    pts = [(d * 10000, y[d - 1]) for d in days]

    def dist(a: int, b: int) -> int:
        return (abs(pts[a][0] - pts[b][0])
                + abs(pts[a][1] - pts[b][1]))

    best = None
    for perm in itertools.permutations(range(1, 8)):
        route = (0,) + perm
        cost = sum(dist(route[i], route[i + 1]) for i in range(7)) \
            + dist(route[7], 0)
        cand = (cost, tuple(days[i] for i in route))
        if best is None or cand < best:
            best = cand
    cost, tour = best
    cols = {"tour_cost": [cost]}
    for i in range(8):
        cols[f"d{i + 1}"] = [tour[i]]
    out = pd.DataFrame(cols)
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_TSP = """
WITH dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
top8 AS (
  SELECT t, y FROM seq ORDER BY y DESC, t LIMIT 8),
nodes AS (
  SELECT row_number() OVER (ORDER BY t) AS i, t, t * 10000 AS x, y
  FROM top8),
d AS (
  SELECT a.i AS u, b.i AS v,
         (abs(a.x - b.x) + abs(a.y - b.y))::BIGINT AS w
  FROM nodes a CROSS JOIN nodes b),
perms AS (
  SELECT a.i AS q2, b.i AS q3, c.i AS q4, d_.i AS q5, e.i AS q6,
         f.i AS q7, g.i AS q8
  FROM (SELECT i FROM nodes WHERE i > 1) a,
       (SELECT i FROM nodes WHERE i > 1) b,
       (SELECT i FROM nodes WHERE i > 1) c,
       (SELECT i FROM nodes WHERE i > 1) d_,
       (SELECT i FROM nodes WHERE i > 1) e,
       (SELECT i FROM nodes WHERE i > 1) f,
       (SELECT i FROM nodes WHERE i > 1) g
  WHERE a.i <> b.i AND a.i <> c.i AND a.i <> d_.i AND a.i <> e.i
    AND a.i <> f.i AND a.i <> g.i AND b.i <> c.i AND b.i <> d_.i
    AND b.i <> e.i AND b.i <> f.i AND b.i <> g.i AND c.i <> d_.i
    AND c.i <> e.i AND c.i <> f.i AND c.i <> g.i AND d_.i <> e.i
    AND d_.i <> f.i AND d_.i <> g.i AND e.i <> f.i AND e.i <> g.i
    AND f.i <> g.i),
scored AS (
  SELECT q2, q3, q4, q5, q6, q7, q8,
      (SELECT w FROM d WHERE u = 1 AND v = q2)
    + (SELECT w FROM d WHERE u = q2 AND v = q3)
    + (SELECT w FROM d WHERE u = q3 AND v = q4)
    + (SELECT w FROM d WHERE u = q4 AND v = q5)
    + (SELECT w FROM d WHERE u = q5 AND v = q6)
    + (SELECT w FROM d WHERE u = q6 AND v = q7)
    + (SELECT w FROM d WHERE u = q7 AND v = q8)
    + (SELECT w FROM d WHERE u = q8 AND v = 1) AS cost
  FROM perms)
SELECT cost::BIGINT AS tour_cost,
       (SELECT t FROM nodes WHERE i = 1)::BIGINT AS d1,
       (SELECT t FROM nodes WHERE i = q2)::BIGINT AS d2,
       (SELECT t FROM nodes WHERE i = q3)::BIGINT AS d3,
       (SELECT t FROM nodes WHERE i = q4)::BIGINT AS d4,
       (SELECT t FROM nodes WHERE i = q5)::BIGINT AS d5,
       (SELECT t FROM nodes WHERE i = q6)::BIGINT AS d6,
       (SELECT t FROM nodes WHERE i = q7)::BIGINT AS d7,
       (SELECT t FROM nodes WHERE i = q8)::BIGINT AS d8
FROM scored
ORDER BY cost, d2, d3, d4, d5, d6, d7, d8
LIMIT 1
"""


QUERIES151: dict[str, tuple] = {
    "assignment_sources_langs": (q_assignment_sources_langs,
                                 SQL_ASSIGNMENT),
    "stable_matching_sources_langs": (q_stable_matching_sources_langs,
                                      SQL_STABLE_MATCHING),
    "tsp_exact_top_days": (q_tsp_exact_top_days, SQL_TSP),
}
