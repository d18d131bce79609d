"""One-hundred-forty-second oracle-query batch — operations-research
classics on the event/part tables, all pure-integer or replayed:

- wagner_whitin_daily: OPTIMAL dynamic lot sizing of daily purchase
  demand (revenue dollars per day). Setup cost K = total_demand // 10
  (data-derived so every scale is non-degenerate), holding cost 1 per
  dollar-day. Pair holding costs come from exact prefix sums
  H(s,t) = (Q_t − Q_{s−1}) − s·(P_t − P_{s−1}); the O(T²) DP replays
  in a recursive CTE carrying the cost LIST, and the setup count is
  reconstructed with a backward argmin walk (smallest-s tiebreak) —
  every quantity a pure integer.
- johnson_flowshop_makespan: Johnson's rule for the two-machine flow
  shop on per-part jobs (a = p_size, b = retail dollars // 40).
  Makespan = max_i (prefA_i + sufB_i) over the Johnson order; within
  a run of identical (a,b) jobs the expression is linear in the
  position, so only the run's two ENDPOINTS can attain the max —
  the whole computation collapses to the (a,b) histogram.
- ucb1_bandit_replay: a UCB1 bandit replayed over the 30 event days:
  arms = the 5 event types (alphabetical), reward(day, arm) = the
  day's mean event value in dollars rounded to 6dp (from exact
  integer cent sums). Days 1-5 initialize each arm once; days 6-30
  pick argmax of mean + sqrt(2·ln(day)/n) with smallest-arm
  tiebreak. The 25-step float recursion replays identically in a
  recursive CTE with per-arm state columns.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _daily_purchase_dollars(sf_dir: str) -> np.ndarray:
    """Exact integer purchase-revenue dollars per day, dense in day
    order (one tiny shuffle over ≤31 cells)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "ts", "value"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = np.asarray(t["event_type"].to_pylist())
        m = et == "purchase"
        v = t["value"].to_numpy(zero_copy_only=False)[m]
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)[m]
        g = pd.DataFrame({"day": day, "d": c // 100}) \
            .groupby("day", sort=False).sum().reset_index()
        g["d"] = g["d"].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(dpart, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("d", alias_name="d"))
             .to_pandas().sort_values("day"))
    return agg["d"].to_numpy(np.int64)


# ---------------------------------------------------------------------------
# Wagner-Whitin
# ---------------------------------------------------------------------------


def q_wagner_whitin_daily(sf_dir: str):
    """Optimal lot sizing of daily purchase demand (docstring)."""
    d = _daily_purchase_dollars(sf_dir)
    t_days = len(d)
    total = int(d.sum())
    k = total // 10
    # prefix sums: p[t] = sum d_1..d_t, q[t] = sum u*d_u (1-based)
    p = np.concatenate([[0], np.cumsum(d)]).astype(np.int64)
    u = np.arange(1, t_days + 1, dtype=np.int64)
    q = np.concatenate([[0], np.cumsum(u * d)]).astype(np.int64)

    def hold(s: int, t: int) -> int:
        return int(q[t] - q[s - 1]) - s * int(p[t] - p[s - 1])

    cost = [0]
    for t in range(1, t_days + 1):
        cost.append(min(cost[s - 1] + k + hold(s, t)
                        for s in range(1, t + 1)))
    # backward walk, smallest-s argmin at each step
    n_setups = 0
    t = t_days
    while t > 0:
        s_star = next(s for s in range(1, t + 1)
                      if cost[s - 1] + k + hold(s, t) == cost[t])
        n_setups += 1
        t = s_star - 1
    out = pd.DataFrame({"t_days": [t_days], "total_demand": [total],
                        "setup_cost": [k],
                        "total_cost": [int(cost[t_days])],
                        "n_setups": [n_setups]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_WAGNER_WHITIN = """
WITH RECURSIVE dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT) // 100)::BIGINT AS d
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, d FROM dd),
pre AS (
  SELECT t, d,
         sum(d) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cp,
         sum(t * d) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW) AS cq
  FROM seq),
base AS (
  SELECT max(t)::BIGINT AS td, sum(d)::BIGINT AS total,
         (sum(d) // 10)::BIGINT AS k,
         list_prepend(0::BIGINT, list(cp ORDER BY t)) AS pl,
         list_prepend(0::BIGINT, list(cq ORDER BY t)) AS ql
  FROM pre),
dp AS (
  SELECT 0::BIGINT AS t, [0::BIGINT] AS costs, td, k, pl, ql
  FROM base
  UNION ALL
  SELECT t + 1,
         -- correlated range() table functions are rejected in DuckDB,
         -- so the per-level argmin runs as a LIST comprehension
         list_append(costs, list_aggregate(
           [costs[s] + k + (ql[t + 2] - ql[s])
            - s * (pl[t + 2] - pl[s])
            FOR s IN range(1, t + 2)], 'min')),
         td, k, pl, ql
  FROM dp WHERE t < td),
fin AS (
  SELECT costs, td, k, pl, ql FROM dp
  WHERE t = (SELECT max(t) FROM dp)),
walk AS (
  SELECT td AS t, 0::BIGINT AS n, costs, td, k, pl, ql FROM fin
  UNION ALL
  SELECT list_aggregate(
           [s FOR s IN range(1, t + 1)
            IF costs[s] + k + (ql[t + 1] - ql[s])
               - s * (pl[t + 1] - pl[s]) = costs[t + 1]],
           'min') - 1,
         n + 1, costs, td, k, pl, ql
  FROM walk WHERE t > 0)
SELECT fin.td AS t_days, base.total AS total_demand, base.k AS setup_cost,
       fin.costs[fin.td + 1] AS total_cost,
       (SELECT max(n) FROM walk)::BIGINT AS n_setups
FROM fin CROSS JOIN base
"""


# ---------------------------------------------------------------------------
# Johnson two-machine flow shop
# ---------------------------------------------------------------------------


def q_johnson_flowshop_makespan(sf_dir: str):
    """Johnson's-rule flow-shop makespan on part jobs (docstring)."""
    ds = _pq(sf_dir, "part", columns=["p_size", "p_retailprice"])

    def jpart(t: pa.Table) -> pa.Table:
        a = t["p_size"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pr = t["p_retailprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(pr) * np.floor(np.abs(pr) * 100.0 + 0.5)) \
            .astype(np.int64)
        b = (c // 100) // 40
        g = pd.DataFrame({"a": a, "b": b, "n": np.int64(1)}) \
            .groupby(["a", "b"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(jpart, batch_format="pyarrow")
           .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    a = h["a"].to_numpy(np.int64)
    b = h["b"].to_numpy(np.int64)
    n = h["n"].to_numpy(np.int64)
    # Johnson order: a<b first by a asc, then a>=b by b desc;
    # partkey never matters because identical (a,b) jobs commute
    grp1 = a < b
    key = np.where(grp1, 0, 1) * (1 << 40) \
        + np.where(grp1, a, (1 << 20) - 1 - b) * 2 \
        + np.where(grp1, 0, 1)
    order = np.argsort(key, kind="stable")
    a, b, n = a[order], b[order], n[order]
    pa_ = np.cumsum(a * n)                 # prefix A through each run
    sb_after = np.concatenate([(np.cumsum((b * n)[::-1])[::-1])[1:],
                               [0]])      # suffix B strictly after run
    pa0 = pa_ - a * n                      # prefix A before each run
    first = pa0 + a + sb_after + b * n     # position 1 of the run
    last = pa_ + sb_after + b              # position k of the run
    makespan = int(max(int(first.max()), int(last.max())))
    sum_a = int((a * n).sum())
    sum_b = int((b * n).sum())
    out = pd.DataFrame({"n_jobs": [int(n.sum())], "sum_a": [sum_a],
                        "sum_b": [sum_b], "makespan": [makespan],
                        "idle_b": [makespan - sum_b]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_JOHNSON = """
WITH j AS (
  SELECT CAST(p_size AS BIGINT) AS a,
         (CAST(round(p_retailprice * 100) AS BIGINT) // 100) // 40
           AS b,
         count(*)::BIGINT AS n
  FROM part GROUP BY 1, 2),
o AS (
  SELECT a, b, n,
         sum(a * n) OVER w AS pa,
         sum(b * n) OVER (ORDER BY (CASE WHEN a < b THEN 0 ELSE 1
                          END), (CASE WHEN a < b THEN a ELSE -b END)
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED
                          FOLLOWING) AS sb_after
  FROM j
  WINDOW w AS (ORDER BY (CASE WHEN a < b THEN 0 ELSE 1 END),
               (CASE WHEN a < b THEN a ELSE -b END)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
c AS (
  SELECT greatest(
           max(pa - a * n + a + coalesce(sb_after, 0) + b * n),
           max(pa + coalesce(sb_after, 0) + b)) AS makespan
  FROM o),
t AS (
  SELECT sum(n)::BIGINT AS n_jobs, sum(a * n)::BIGINT AS sum_a,
         sum(b * n)::BIGINT AS sum_b
  FROM j)
SELECT t.n_jobs, t.sum_a, t.sum_b, c.makespan::BIGINT AS makespan,
       (c.makespan - t.sum_b)::BIGINT AS idle_b
FROM t CROSS JOIN c
"""


# ---------------------------------------------------------------------------
# UCB1 replay
# ---------------------------------------------------------------------------


def q_ucb1_bandit_replay(sf_dir: str):
    """UCB1 over daily mean event values (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "ts", "value"])

    def rpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"day": day, "g": et, "s": c,
                          "n": np.int64(1)}) \
            .groupby(["day", "g"], sort=False).sum().reset_index()
        for col in ("s", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(rpart, batch_format="pyarrow")
             .groupby(["day", "g"])
             .aggregate(Sum("s", alias_name="s"),
                        Sum("n", alias_name="n"))
             .to_pandas())
    arms = sorted(agg["g"].unique().tolist())
    days = sorted(agg["day"].unique().tolist())
    rtab = {(r["day"], r["g"]):
            _round6(np.array([float(r["s"]) / float(r["n"]) / 100.0]))[0]
            for _, r in agg.iterrows()}
    k = len(arms)
    n_arm = [0] * k
    s_arm = [0.0] * k
    for t, day in enumerate(days, start=1):
        if t <= k:
            chosen = t - 1
        else:
            best_u, chosen = -math.inf, 0
            for i in range(k):
                u_ = (s_arm[i] / float(n_arm[i])
                      + math.sqrt(2.0 * math.log(float(t))
                                  / float(n_arm[i])))
                if u_ > best_u:
                    best_u, chosen = u_, i
        n_arm[chosen] += 1
        s_arm[chosen] += float(rtab.get((day, arms[chosen]), 0.0))
    total = s_arm[0] + s_arm[1] + s_arm[2] + s_arm[3] + s_arm[4]
    out = pd.DataFrame({
        "n1": [n_arm[0]], "n2": [n_arm[1]], "n3": [n_arm[2]],
        "n4": [n_arm[3]], "n5": [n_arm[4]],
        "total_reward6": [_round6(np.array([total]))[0]]})
    for col in ("n1", "n2", "n3", "n4", "n5"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_UCB1 = """
WITH RECURSIVE cells AS (
  SELECT date_trunc('day', ts) AS dy, event_type AS g,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS s,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
arms AS (
  SELECT g, row_number() OVER (ORDER BY g) AS ai
  FROM (SELECT DISTINCT g FROM cells)),
dayr AS (
  SELECT dy, row_number() OVER (ORDER BY dy) AS t FROM
  (SELECT DISTINCT dy FROM cells)),
r AS (
  SELECT dayr.t,
    coalesce(max(CASE WHEN ai = 1 THEN round(CAST(s AS DOUBLE)
      / CAST(n AS DOUBLE) / 100.0, 6) END), 0.0) AS r1,
    coalesce(max(CASE WHEN ai = 2 THEN round(CAST(s AS DOUBLE)
      / CAST(n AS DOUBLE) / 100.0, 6) END), 0.0) AS r2,
    coalesce(max(CASE WHEN ai = 3 THEN round(CAST(s AS DOUBLE)
      / CAST(n AS DOUBLE) / 100.0, 6) END), 0.0) AS r3,
    coalesce(max(CASE WHEN ai = 4 THEN round(CAST(s AS DOUBLE)
      / CAST(n AS DOUBLE) / 100.0, 6) END), 0.0) AS r4,
    coalesce(max(CASE WHEN ai = 5 THEN round(CAST(s AS DOUBLE)
      / CAST(n AS DOUBLE) / 100.0, 6) END), 0.0) AS r5
  FROM cells JOIN arms USING (g) JOIN dayr USING (dy)
  GROUP BY dayr.t),
td AS (SELECT max(t)::BIGINT AS tmax FROM r),
rec AS (
  SELECT r5_.t AS t,
         1::BIGINT AS n1, 1::BIGINT AS n2, 1::BIGINT AS n3,
         1::BIGINT AS n4, 1::BIGINT AS n5,
         r1_.r1 AS s1, r2_.r2 AS s2, r3_.r3 AS s3, r4_.r4 AS s4,
         r5_.r5 AS s5
  FROM (SELECT r1 FROM r WHERE t = 1) r1_,
       (SELECT r2 FROM r WHERE t = 2) r2_,
       (SELECT r3 FROM r WHERE t = 3) r3_,
       (SELECT r4 FROM r WHERE t = 4) r4_,
       (SELECT t, r5 FROM r WHERE t = 5) r5_
  UNION ALL
  SELECT nxt.t,
         rec.n1 + (nxt.ch = 1)::BIGINT,
         rec.n2 + (nxt.ch = 2)::BIGINT,
         rec.n3 + (nxt.ch = 3)::BIGINT,
         rec.n4 + (nxt.ch = 4)::BIGINT,
         rec.n5 + (nxt.ch = 5)::BIGINT,
         rec.s1 + CASE WHEN nxt.ch = 1 THEN nxt.r1 ELSE 0.0 END,
         rec.s2 + CASE WHEN nxt.ch = 2 THEN nxt.r2 ELSE 0.0 END,
         rec.s3 + CASE WHEN nxt.ch = 3 THEN nxt.r3 ELSE 0.0 END,
         rec.s4 + CASE WHEN nxt.ch = 4 THEN nxt.r4 ELSE 0.0 END,
         rec.s5 + CASE WHEN nxt.ch = 5 THEN nxt.r5 ELSE 0.0 END
  FROM rec, LATERAL (
    SELECT r.t, r.r1, r.r2, r.r3, r.r4, r.r5,
      CASE
        WHEN u1 >= u2 AND u1 >= u3 AND u1 >= u4 AND u1 >= u5 THEN 1
        WHEN u2 >= u3 AND u2 >= u4 AND u2 >= u5 THEN 2
        WHEN u3 >= u4 AND u3 >= u5 THEN 3
        WHEN u4 >= u5 THEN 4
        ELSE 5 END AS ch
    FROM r, LATERAL (
      SELECT
        rec.s1 / CAST(rec.n1 AS DOUBLE)
          + sqrt(2.0 * ln(CAST(r.t AS DOUBLE))
                 / CAST(rec.n1 AS DOUBLE)) AS u1,
        rec.s2 / CAST(rec.n2 AS DOUBLE)
          + sqrt(2.0 * ln(CAST(r.t AS DOUBLE))
                 / CAST(rec.n2 AS DOUBLE)) AS u2,
        rec.s3 / CAST(rec.n3 AS DOUBLE)
          + sqrt(2.0 * ln(CAST(r.t AS DOUBLE))
                 / CAST(rec.n3 AS DOUBLE)) AS u3,
        rec.s4 / CAST(rec.n4 AS DOUBLE)
          + sqrt(2.0 * ln(CAST(r.t AS DOUBLE))
                 / CAST(rec.n4 AS DOUBLE)) AS u4,
        rec.s5 / CAST(rec.n5 AS DOUBLE)
          + sqrt(2.0 * ln(CAST(r.t AS DOUBLE))
                 / CAST(rec.n5 AS DOUBLE)) AS u5) uu
    WHERE r.t = rec.t + 1) nxt
  WHERE rec.t < (SELECT tmax FROM td))
SELECT n1, n2, n3, n4, n5,
       round(s1 + s2 + s3 + s4 + s5, 6) AS total_reward6
FROM rec WHERE t = (SELECT tmax FROM td)
"""


QUERIES142: dict[str, tuple] = {
    "wagner_whitin_daily": (q_wagner_whitin_daily, SQL_WAGNER_WHITIN),
    "johnson_flowshop_makespan": (q_johnson_flowshop_makespan,
                                  SQL_JOHNSON),
    "ucb1_bandit_replay": (q_ucb1_bandit_replay, SQL_UCB1),
}
