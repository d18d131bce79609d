"""One-hundred-sixty-fifth oracle-query batch — robust two-way
decomposition, IRR root finding, and fluctuation counting:

- median_polish_dow_type: two full sweeps of Tukey's median polish on
  the 7×5 (dow × event-type) mean-value table. Cell means are
  quantized ONCE to 1e-6 integers, so every row/column (lower)
  median and every subtraction is pure integer; reports the
  accumulated overall effect, the dow-0 row effect, the purchase
  column effect, and the max |residual|.
- irr_bisection_monthly: the monthly IRR of (−0.6·total at t=0,
  monthly revenue dollars at t=1..T) by 40 bisection steps on
  [0, 1]. Each step's NPV quantizes the per-month discounted term to
  1e-3 units before the integer sum (a float NPV sum would be
  order-dependent in the oracle), replayed in a 40-level recursion.
- ballot_lead_days: on the daily click/view cumulative race, the
  exact number of days the click total strictly leads, the final
  margin, and the lead fraction — the ballot-problem statistic.
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

_IRR_STEPS = 40


def _lower_median_int(vals: list[int]) -> int:
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


# ---------------------------------------------------------------------------
# Median polish
# ---------------------------------------------------------------------------


def q_median_polish_dow_type(sf_dir: str):
    """Two-sweep Tukey median polish on dow × type means."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type", "value"])

    def cells(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dow = pc.day_of_week(t["ts"]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"d": dow, "g": et, "s": c,
                          "n": np.int64(1)}) \
            .groupby(["d", "g"], sort=False).sum().reset_index()
        for col in ("s", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    cel = (ds.map_batches(cells, batch_format="pyarrow")
             .groupby(["d", "g"])
             .aggregate(Sum("s", alias_name="s"),
                        Sum("n", alias_name="n")).to_pandas())
    arms = sorted(cel["g"].unique().tolist())
    gi = {g_: i for i, g_ in enumerate(arms)}
    y = [[0] * len(arms) for _ in range(7)]
    for _, r_ in cel.iterrows():
        # cell mean in 1e-6-dollar units, quantized ONCE
        m6 = int(math.floor(abs(float(int(r_["s"]))
                                / float(int(r_["n"])) / 100.0 * 1e6)
                            + 0.5))
        y[int(r_["d"])][gi[r_["g"]]] = m6
    overall = 0
    row_eff = [0] * 7
    col_eff = [0] * len(arms)
    for _ in range(2):
        for d in range(7):
            m = _lower_median_int(y[d])
            row_eff[d] += m
            y[d] = [v - m for v in y[d]]
        cm = _lower_median_int(row_eff)
        overall += cm
        row_eff = [v - cm for v in row_eff]
        for j in range(len(arms)):
            m = _lower_median_int([y[d][j] for d in range(7)])
            col_eff[j] += m
            for d in range(7):
                y[d][j] -= m
        rm = _lower_median_int(col_eff)
        overall += rm
        col_eff = [v - rm for v in col_eff]
    max_res = max(abs(v) for row in y for v in row)
    out = pd.DataFrame({
        "overall_u6": [overall], "row0_u6": [row_eff[0]],
        "col_purchase_u6": [col_eff[gi["purchase"]]],
        "max_resid_u6": [max_res]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_MEDIAN_POLISH = """
WITH cells AS (
  SELECT isodow(ts) - 1 AS d, event_type AS g,
         CAST(round(abs(CAST(sum(CAST(round(value * 100) AS BIGINT))
                             AS DOUBLE)
                        / CAST(count(*) AS DOUBLE) / 100.0 * 1e6))
              AS BIGINT) AS m6
  FROM events GROUP BY 1, 2),
arms AS (
  SELECT g, row_number() OVER (ORDER BY g) - 1 AS j
  FROM (SELECT DISTINCT g FROM cells)),
y0 AS (SELECT c.d, a.j, c.m6 AS v
       FROM cells c JOIN arms a USING (g)),
-- sweep 1: rows
r1 AS (SELECT d, quantile_disc(v, 0.5)::BIGINT AS m
       FROM y0 GROUP BY d),
y1 AS (SELECT y0.d, y0.j, y0.v - r1.m AS v
       FROM y0 JOIN r1 USING (d)),
o1 AS (SELECT quantile_disc(m, 0.5)::BIGINT AS cm FROM r1),
re1 AS (SELECT d, m - (SELECT cm FROM o1) AS e FROM r1),
-- sweep 1: cols
c1 AS (SELECT j, quantile_disc(v, 0.5)::BIGINT AS m
       FROM y1 GROUP BY j),
y2 AS (SELECT y1.d, y1.j, y1.v - c1.m AS v
       FROM y1 JOIN c1 USING (j)),
o2 AS (SELECT quantile_disc(m, 0.5)::BIGINT AS rm FROM c1),
ce1 AS (SELECT j, m - (SELECT rm FROM o2) AS e FROM c1),
-- sweep 2: rows
r2 AS (SELECT d, quantile_disc(v, 0.5)::BIGINT AS m
       FROM y2 GROUP BY d),
y3 AS (SELECT y2.d, y2.j, y2.v - r2.m AS v
       FROM y2 JOIN r2 USING (d)),
re2a AS (SELECT re1.d, re1.e + r2.m AS e
         FROM re1 JOIN r2 USING (d)),
o3 AS (SELECT quantile_disc(e, 0.5)::BIGINT AS cm FROM re2a),
re2 AS (SELECT d, e - (SELECT cm FROM o3) AS e FROM re2a),
-- sweep 2: cols
c2 AS (SELECT j, quantile_disc(v, 0.5)::BIGINT AS m
       FROM y3 GROUP BY j),
y4 AS (SELECT y3.d, y3.j, y3.v - c2.m AS v
       FROM y3 JOIN c2 USING (j)),
ce2a AS (SELECT ce1.j, ce1.e + c2.m AS e
         FROM ce1 JOIN c2 USING (j)),
o4 AS (SELECT quantile_disc(e, 0.5)::BIGINT AS rm FROM ce2a),
ce2 AS (SELECT j, e - (SELECT rm FROM o4) AS e FROM ce2a)
SELECT ((SELECT cm FROM o1) + (SELECT rm FROM o2)
        + (SELECT cm FROM o3) + (SELECT rm FROM o4))::BIGINT
         AS overall_u6,
       (SELECT e FROM re2 WHERE d = 0)::BIGINT AS row0_u6,
       (SELECT ce2.e FROM ce2 JOIN arms USING (j)
        WHERE arms.g = 'purchase')::BIGINT AS col_purchase_u6,
       (SELECT max(abs(v)) FROM y4)::BIGINT AS max_resid_u6
"""


# ---------------------------------------------------------------------------
# IRR bisection
# ---------------------------------------------------------------------------


def q_irr_bisection_monthly(sf_dir: str):
    """Monthly IRR by 40-step bisection (docstring above)."""
    ds = _pq(sf_dir, "orders",
             columns=["o_orderdate", "o_totalprice"])

    import pyarrow.compute as pc

    def mpart(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = pc.month(t["o_orderdate"]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"ym": y * 100 + m, "c": c}) \
            .groupby("ym", sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(mpart, batch_format="pyarrow")
             .groupby("ym").aggregate(Sum("c", alias_name="c"))
             .to_pandas().sort_values("ym").reset_index(drop=True))
    flows = [int(v) // 100 for v in agg["c"].tolist()]
    total = sum(flows)
    outlay = total * 6 // 10

    def rint(v: float) -> int:
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    def npv_u(r: float) -> int:
        u = -outlay * 1000
        for t, f in enumerate(flows, start=1):
            u += rint(float(f) / (1.0 + r) ** t * 1e3)
        return u

    lo, hi = 0.0, 1.0
    for _ in range(_IRR_STEPS):
        mid = (lo + hi) / 2.0
        if npv_u(mid) > 0:
            lo = mid
        else:
            hi = mid
    out = pd.DataFrame({
        "n_months": [len(flows)], "outlay": [outlay],
        "irr6": [_round6(np.array([(lo + hi) / 2.0]))[0]]})
    for col in ("n_months", "outlay"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_IRR = f"""
WITH RECURSIVE mo AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS f
  FROM orders GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY ym) AS t, f FROM mo),
par AS (
  SELECT count(*)::BIGINT AS nm,
         (sum(f) * 6 // 10)::BIGINT AS outlay
  FROM seq),
bis AS (
  -- 0.0/1.0 would type lo/hi DECIMAL(2,1) and round every
  -- midpoint (the Elo lesson)
  SELECT 0::BIGINT AS i, 0e0 AS lo, 1e0 AS hi
  UNION ALL
  SELECT i + 1,
         CASE WHEN stp.npvu > 0 THEN (lo + hi) / 2.0 ELSE lo END,
         CASE WHEN stp.npvu > 0 THEN hi ELSE (lo + hi) / 2.0 END
  FROM bis, LATERAL (
    SELECT (SELECT -(SELECT outlay FROM par) * 1000
                   + sum(CAST(round(CAST(s.f AS DOUBLE)
                         / power(1.0 + (bis.lo + bis.hi) / 2.0,
                                 CAST(s.t AS DOUBLE)) * 1e3)
                         AS BIGINT))
            FROM seq s) AS npvu) stp
  WHERE i < {_IRR_STEPS})
SELECT (SELECT nm FROM par) AS n_months,
       (SELECT outlay FROM par) AS outlay,
       round((lo + hi) / 2.0, 6) AS irr6
FROM bis WHERE i = {_IRR_STEPS}
"""


# ---------------------------------------------------------------------------
# Ballot lead days
# ---------------------------------------------------------------------------


def q_ballot_lead_days(sf_dir: str):
    """Days the click cumulative strictly leads views (docstring)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def cells(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = np.asarray(t["event_type"].to_pylist())
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"day": day,
                          "c": (et == "click").astype(np.int64),
                          "v": (et == "view").astype(np.int64)}) \
            .groupby("day", sort=False).sum().reset_index()
        for col in ("c", "v"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(cells, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("c", alias_name="c"),
                                       Sum("v", alias_name="v"))
             .to_pandas().sort_values("day").reset_index(drop=True))
    cc = np.cumsum(agg["c"].to_numpy(np.int64))
    cv = np.cumsum(agg["v"].to_numpy(np.int64))
    n = len(cc)
    lead = int((cc > cv).sum())
    out = pd.DataFrame({
        "n_days": [n], "lead_days": [lead],
        "final_margin": [int(cc[-1] - cv[-1])],
        "lead_frac6": [_round6(np.array([float(lead)
                                         / float(n)]))[0]]})
    for col in ("n_days", "lead_days", "final_margin"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BALLOT = """
WITH d AS (
  SELECT date_trunc('day', ts) AS dy,
         sum((event_type = 'click')::INT)::BIGINT AS c,
         sum((event_type = 'view')::INT)::BIGINT AS v
  FROM events GROUP BY 1),
cum AS (
  SELECT sum(c) OVER w AS cc, sum(v) OVER w AS cv
  FROM d
  WINDOW w AS (ORDER BY dy ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)),
s AS (
  SELECT count(*)::BIGINT AS n,
         sum((cc > cv)::INT)::BIGINT AS lead,
         max(cc)::BIGINT AS fc, max(cv)::BIGINT AS fv
  FROM cum)
SELECT n AS n_days, lead AS lead_days,
       ((SELECT sum(c) - sum(v) FROM d))::BIGINT AS final_margin,
       round(CAST(lead AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS lead_frac6
FROM s
"""


QUERIES165: dict[str, tuple] = {
    "median_polish_dow_type": (q_median_polish_dow_type,
                               SQL_MEDIAN_POLISH),
    "irr_bisection_monthly": (q_irr_bisection_monthly, SQL_IRR),
    "ballot_lead_days": (q_ballot_lead_days, SQL_BALLOT),
}
