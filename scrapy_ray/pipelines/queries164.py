"""One-hundred-sixty-fourth oracle-query batch — local search vs
exact optimum, knapsack DP, and robust regression:

- two_opt_tsp_gap: first-improvement 2-opt local search on the
  tsp_exact_top_days instance (start = day order, position 0
  pinned; moves scanned in lexicographic (i, j) order, reversal of
  tour[i+1..j]) iterated to a local optimum, next to the true
  optimum from the 5040-tour enumeration — the classic
  heuristic-vs-exact gap, all integer L1 costs. The oracle replays
  the same search with a tour-LIST recursion.
- knapsack_parts: 0/1 knapsack over the top-30 parts by retail
  price (weight = p_size, value = retail dollars // 10, capacity
  100) via the capacity-array DP — a 101-wide LIST state, one item
  per recursion level. Pure integers.
- huber_regression_daily: Huber-loss regression of daily dollars on
  the day index — OLS init from exact sums, scale = MAD of the
  initial residuals (exact integer median device), then 3 IRLS
  steps with per-day 1e-9-quantized weights and cleared weighted
  normal equations.
"""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6

_KN_CAP = 100
_KN_TOP = 30
_HU_K = 1.345
_HU_ITERS = 3


def _r9(v: float) -> int:
    return int(math.floor(abs(v) * 1e9 + 0.5)) * (1 if v >= 0 else -1)


# ---------------------------------------------------------------------------
# 2-opt vs exact
# ---------------------------------------------------------------------------


def q_two_opt_tsp_gap(sf_dir: str):
    """2-opt local optimum vs exact TSP (docstring above)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    y = [int(v) for v in _daily_cents(sf_dir).tolist()]
    days = sorted(range(1, len(y) + 1),
                  key=lambda t: (-y[t - 1], t))[:8]
    days.sort()
    pts = [(d * 10000, y[d - 1]) for d in days]
    n = 8

    def dist(a: int, b: int) -> int:
        return (abs(pts[a][0] - pts[b][0])
                + abs(pts[a][1] - pts[b][1]))

    def cost(tour: list[int]) -> int:
        return sum(dist(tour[i], tour[(i + 1) % n]) for i in range(n))

    tour = list(range(n))
    iters = 0
    while True:
        best_move = None
        for i in range(n - 1):
            for j in range(i + 1, n):
                if i == 0 and j == n - 1:
                    continue          # reversing all but start: no-op
                a, b = tour[i], tour[(i + 1) % n]
                c_, d_ = tour[j], tour[(j + 1) % n]
                delta = (dist(a, c_) + dist(b, d_)
                         - dist(a, b) - dist(c_, d_))
                if delta < 0:
                    best_move = (i, j)
                    break
            if best_move:
                break
        if not best_move:
            break
        i, j = best_move
        tour = tour[:i + 1] + tour[i + 1:j + 1][::-1] + tour[j + 1:]
        iters += 1
        if iters >= 50:
            break
    local = cost(tour)
    exact = min(
        sum(dist(r[k], r[(k + 1) % n]) for k in range(n))
        for r in ((0,) + p for p in
                  itertools.permutations(range(1, n))))
    out = pd.DataFrame({"n_nodes": [n], "iters": [iters],
                        "local_cost": [local], "exact_cost": [exact],
                        "gap": [local - exact]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_TWO_OPT = """
WITH RECURSIVE dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS yv
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, yv FROM dd),
top8 AS (SELECT t, yv FROM seq ORDER BY yv DESC, t LIMIT 8),
nodes AS (
  SELECT row_number() OVER (ORDER BY t) - 1 AS i, t * 10000 AS x, yv
    AS y
  FROM top8),
base AS (
  SELECT list(x ORDER BY i) AS xs, list(y ORDER BY i) AS ys
  FROM nodes),
moves AS (
  SELECT pc, pc // 8 AS i, pc % 8 AS j,
         (pc // 8 + 1) % 8 AS i2, (pc % 8 + 1) % 8 AS j2
  FROM (SELECT unnest(range(0, 56)) AS pc)
  WHERE pc % 8 > pc // 8 AND NOT (pc // 8 = 0 AND pc % 8 = 7)),
walk AS (
  SELECT 0::BIGINT AS it,
         [CAST(z AS BIGINT) FOR z IN range(0, 8)] AS tour,
         xs, ys, 0 AS done
  FROM base
  UNION ALL
  SELECT it + 1,
         CASE WHEN mv.mpc IS NULL THEN tour
              ELSE [CASE WHEN z - 1 <= mv.mpc // 8
                              OR z - 1 > mv.mpc % 8
                         THEN tour[z]
                         -- mirror within (i, j]: 1-based i+j+3-z
                         ELSE tour[(mv.mpc // 8) + (mv.mpc % 8)
                                   + 3 - z]
                    END
                    FOR z IN range(1, 9)] END,
         xs, ys,
         CASE WHEN mv.mpc IS NULL THEN 1 ELSE 0 END
  FROM walk, LATERAL (
    -- correlated join against a pair table (comprehension lambdas
    -- cannot capture nested list-of-list indexing)
    SELECT min(p.pc) AS mpc
    FROM moves p
    WHERE (abs(walk.xs[walk.tour[p.i + 1] + 1]
               - walk.xs[walk.tour[p.j + 1] + 1])
           + abs(walk.ys[walk.tour[p.i + 1] + 1]
                 - walk.ys[walk.tour[p.j + 1] + 1])
           + abs(walk.xs[walk.tour[p.i2 + 1] + 1]
                 - walk.xs[walk.tour[p.j2 + 1] + 1])
           + abs(walk.ys[walk.tour[p.i2 + 1] + 1]
                 - walk.ys[walk.tour[p.j2 + 1] + 1])
           - abs(walk.xs[walk.tour[p.i + 1] + 1]
                 - walk.xs[walk.tour[p.i2 + 1] + 1])
           - abs(walk.ys[walk.tour[p.i + 1] + 1]
                 - walk.ys[walk.tour[p.i2 + 1] + 1])
           - abs(walk.xs[walk.tour[p.j + 1] + 1]
                 - walk.xs[walk.tour[p.j2 + 1] + 1])
           - abs(walk.ys[walk.tour[p.j + 1] + 1]
                 - walk.ys[walk.tour[p.j2 + 1] + 1])) < 0) mv
  WHERE done = 0 AND it < 50),
fin AS (
  SELECT tour, xs, ys, it FROM walk
  WHERE it = (SELECT max(it) FROM walk)),
lc AS (
  SELECT it, list_aggregate(
    [abs(xs[tour[z] + 1] - xs[tour[(z % 8) + 1] + 1])
     + abs(ys[tour[z] + 1] - ys[tour[(z % 8) + 1] + 1])
     FOR z IN range(1, 9)], 'sum') AS local_cost
  FROM fin),
d AS (
  SELECT a.i AS u, b.i AS v,
         (abs(a.x - b.x) + abs(a.y - b.y))::BIGINT AS w
  FROM nodes a CROSS JOIN nodes b),
perms AS (
  SELECT a.i AS q2, b.i AS q3, c.i AS q4, d_.i AS q5, e.i AS q6,
         f.i AS q7, g.i AS q8
  FROM (SELECT i FROM nodes WHERE i > 0) a,
       (SELECT i FROM nodes WHERE i > 0) b,
       (SELECT i FROM nodes WHERE i > 0) c,
       (SELECT i FROM nodes WHERE i > 0) d_,
       (SELECT i FROM nodes WHERE i > 0) e,
       (SELECT i FROM nodes WHERE i > 0) f,
       (SELECT i FROM nodes WHERE i > 0) g
  WHERE a.i <> b.i AND a.i <> c.i AND a.i <> d_.i AND a.i <> e.i
    AND a.i <> f.i AND a.i <> g.i AND b.i <> c.i AND b.i <> d_.i
    AND b.i <> e.i AND b.i <> f.i AND b.i <> g.i AND c.i <> d_.i
    AND c.i <> e.i AND c.i <> f.i AND c.i <> g.i AND d_.i <> e.i
    AND d_.i <> f.i AND d_.i <> g.i AND e.i <> f.i AND e.i <> g.i
    AND f.i <> g.i),
ex AS (
  SELECT min((SELECT w FROM d WHERE u = 0 AND v = q2)
    + (SELECT w FROM d WHERE u = q2 AND v = q3)
    + (SELECT w FROM d WHERE u = q3 AND v = q4)
    + (SELECT w FROM d WHERE u = q4 AND v = q5)
    + (SELECT w FROM d WHERE u = q5 AND v = q6)
    + (SELECT w FROM d WHERE u = q6 AND v = q7)
    + (SELECT w FROM d WHERE u = q7 AND v = q8)
    + (SELECT w FROM d WHERE u = q8 AND v = 0)) AS exact_cost
  FROM perms)
SELECT 8::BIGINT AS n_nodes, (lc.it)::BIGINT AS iters,
       lc.local_cost::BIGINT AS local_cost,
       ex.exact_cost::BIGINT AS exact_cost,
       (lc.local_cost - ex.exact_cost)::BIGINT AS gap
FROM lc CROSS JOIN ex
"""


# ---------------------------------------------------------------------------
# Knapsack
# ---------------------------------------------------------------------------


def q_knapsack_parts(sf_dir: str):
    """0/1 knapsack over top-30 parts (docstring above)."""
    import pyarrow as pa
    from ray.data.aggregate import Sum  # noqa: F401

    from scrapy_ray.pipelines.queries import _pq
    from scrapy_ray.pipelines.queries47 import _strip

    ds = _pq(sf_dir, "part",
             columns=["p_partkey", "p_size", "p_retailprice"])

    def items(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = t["p_size"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = t["p_retailprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        return _strip(pd.DataFrame({"k": k, "w": s,
                                    "v": (c // 100) // 10}))

    df = (ds.map_batches(items, batch_format="pyarrow").to_pandas()
            .sort_values(["v", "k"], ascending=[False, True])
            .head(_KN_TOP))
    ws = df["w"].tolist()
    vs = df["v"].tolist()
    best = [0] * (_KN_CAP + 1)
    for w, v in zip(ws, vs):
        best = [max(best[c], (best[c - w] + v) if c >= w else 0)
                for c in range(_KN_CAP + 1)]
    out = pd.DataFrame({"n_items": [len(ws)], "cap": [_KN_CAP],
                        "best_value": [best[_KN_CAP]],
                        "sum_w": [sum(ws)]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_KNAPSACK = f"""
WITH RECURSIVE items AS (
  SELECT CAST(p_size AS BIGINT) AS w,
         (CAST(round(p_retailprice * 100) AS BIGINT) // 100) // 10
           AS v
  FROM part ORDER BY v DESC, p_partkey LIMIT {_KN_TOP}),
base AS (
  SELECT count(*)::BIGINT AS ni, sum(w)::BIGINT AS sw,
         list(w ORDER BY v DESC, w) AS dummy_ws
  FROM items),
ordered AS (
  SELECT row_number() OVER (ORDER BY v DESC, w) AS i, w, v
  FROM items),
lists AS (
  SELECT list(w ORDER BY i) AS ws, list(v ORDER BY i) AS vs
  FROM ordered),
dp AS (
  SELECT 0::BIGINT AS i,
         [0::BIGINT FOR z IN range(0, {_KN_CAP} + 1)] AS best,
         ws, vs
  FROM lists
  UNION ALL
  SELECT i + 1,
         [CASE WHEN z - 1 >= ws[i + 1]
               THEN greatest(best[z],
                             best[z - ws[i + 1]] + vs[i + 1])
               ELSE best[z] END
          FOR z IN range(1, {_KN_CAP} + 2)],
         ws, vs
  FROM dp WHERE i < (SELECT ni FROM base))
SELECT (SELECT ni FROM base) AS n_items, {_KN_CAP}::BIGINT AS cap,
       best[{_KN_CAP} + 1] AS best_value,
       (SELECT sw FROM base) AS sum_w
FROM dp WHERE i = (SELECT ni FROM base)
"""


# ---------------------------------------------------------------------------
# Huber regression
# ---------------------------------------------------------------------------


def q_huber_regression_daily(sf_dir: str):
    """Huber IRLS regression of daily dollars on day (docstring)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    yv = [int(v) // 100 for v in _daily_cents(sf_dir).tolist()]
    n = len(yv)
    xs = list(range(1, n + 1))
    sx = sum(xs)
    sy = sum(yv)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * v for x, v in zip(xs, yv))
    den = n * sxx - sx * sx
    b1 = float(n * sxy - sx * sy) / float(den)
    b0 = (float(sy) - b1 * float(sx)) / float(n)
    # MAD scale of initial residuals, quantized to 1e-6
    r6 = sorted(abs(_r9((float(v) - b0 - b1 * float(x)) * 1e-3))
                for x, v in zip(xs, yv))
    mad6 = r6[(n + 1) // 2 - 1]       # lower median of |r| in 1e-6
    k6 = _HU_K * float(mad6)
    for _ in range(_HU_ITERS):
        sw = swx = swx2 = swy = swxy = 0
        for x, v in zip(xs, yv):
            r = float(v) - b0 - b1 * float(x)
            a6 = abs(r) * 1e6
            w = 1.0 if a6 <= k6 else k6 / a6
            w9 = _r9(w)
            wy9 = _r9(w * float(v))
            sw += w9
            swx += w9 * x
            swx2 += w9 * x * x
            swy += wy9
            swxy += wy9 * x
        fw, fx, fx2 = float(sw), float(swx), float(swx2)
        fy, fxy = float(swy), float(swxy)
        det = fw * fx2 - fx * fx
        b1 = (fw * fxy - fx * fy) / det
        b0 = (fy * fx2 - fx * fxy) / det
    r6o = _round6(np.array([b0, b1]))
    out = pd.DataFrame({"n_days": [n], "mad6_units": [mad6],
                        "b0_6": [r6o[0]], "b1_6": [r6o[1]]})
    for col in ("n_days", "mad6_units"):
        out[col] = out[col].astype(np.int64)
    return out


def _huber_iter_sql(i: int) -> str:
    prev = f"it{i - 1}" if i > 1 else "init"
    r = "(CAST(s.y AS DOUBLE) - p.b0 - p.b1 * CAST(s.t AS DOUBLE))"
    w = (f"(CASE WHEN abs({r}) * 1e6 <= par.k6 THEN 1.0 "
         f"ELSE par.k6 / (abs({r}) * 1e6) END)")
    return f"""
h{i} AS MATERIALIZED (
  SELECT sum(CAST(round({w} * 1e9) AS BIGINT))::BIGINT AS sw,
         sum(CAST(round({w} * 1e9) AS BIGINT) * s.t)::BIGINT
           AS swx,
         sum(CAST(round({w} * 1e9) AS BIGINT) * s.t * s.t)::BIGINT
           AS swx2,
         sum(CAST(round({w} * CAST(s.y AS DOUBLE) * 1e9) AS BIGINT))
           ::BIGINT AS swy,
         sum(CAST(round({w} * CAST(s.y AS DOUBLE) * 1e9) AS BIGINT)
             * s.t)::BIGINT AS swxy
  FROM seq s CROSS JOIN {prev} p CROSS JOIN par),
it{i} AS MATERIALIZED (
  SELECT (CAST(h.swy AS DOUBLE) * CAST(h.swx2 AS DOUBLE)
          - CAST(h.swx AS DOUBLE) * CAST(h.swxy AS DOUBLE))
         / (CAST(h.sw AS DOUBLE) * CAST(h.swx2 AS DOUBLE)
            - CAST(h.swx AS DOUBLE) * CAST(h.swx AS DOUBLE)) AS b0,
         (CAST(h.sw AS DOUBLE) * CAST(h.swxy AS DOUBLE)
          - CAST(h.swx AS DOUBLE) * CAST(h.swy AS DOUBLE))
         / (CAST(h.sw AS DOUBLE) * CAST(h.swx2 AS DOUBLE)
            - CAST(h.swx AS DOUBLE) * CAST(h.swx AS DOUBLE)) AS b1
  FROM h{i} h)"""


def _huber_sql() -> str:
    return f"""
WITH seq AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM (
    SELECT date_trunc('day', ts) AS dy,
           sum(CAST(round(value * 100) AS BIGINT)) // 100 AS y
    FROM events GROUP BY 1)),
s0 AS MATERIALIZED (
  SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(t * t)::BIGINT AS sxx,
         sum(t * y)::BIGINT AS sxy
  FROM seq),
init AS MATERIALIZED (
  SELECT CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS b1,
         (CAST(sy AS DOUBLE)
          - CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE)
            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS b0
  FROM s0),
res AS MATERIALIZED (
  SELECT abs(CAST(round((CAST(s.y AS DOUBLE) - i.b0
                         - i.b1 * CAST(s.t AS DOUBLE))
                        * 1e-3 * 1e9) AS BIGINT)) AS a6
  FROM seq s CROSS JOIN init i),
par AS MATERIALIZED (
  SELECT {_HU_K} * CAST(quantile_disc(a6, 0.5) AS DOUBLE) AS k6,
         quantile_disc(a6, 0.5)::BIGINT AS mad6
  FROM res),
{",".join(_huber_iter_sql(i) for i in range(1, _HU_ITERS + 1))}
SELECT (SELECT n FROM s0) AS n_days,
       (SELECT mad6 FROM par) AS mad6_units,
       round(p.b0, 6) AS b0_6, round(p.b1, 6) AS b1_6
FROM it{_HU_ITERS} p
"""


SQL_HUBER_REG = _huber_sql()


QUERIES164: dict[str, tuple] = {
    "two_opt_tsp_gap": (q_two_opt_tsp_gap, SQL_TWO_OPT),
    "knapsack_parts": (q_knapsack_parts, SQL_KNAPSACK),
    "huber_regression_daily": (q_huber_regression_daily,
                               SQL_HUBER_REG),
}
