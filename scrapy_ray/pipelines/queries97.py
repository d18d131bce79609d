"""Ninety-seventh oracle-query batch — operations-analytics trio:

- leadtime_quantiles_priority: order fulfilment lead time (days from
  o_orderdate to the FIRST lineitem shipment — per-order Min
  pre-aggregated on the lineitem side, then the generic native
  Dataset.join, the q4 pattern) with exact disc p50/p90 per priority
  off the bounded day histogram.
- newsvendor_stock: the newsvendor critical-fractile stock for daily
  shipped quantity with cu=5, co=1 (literals): S* = exact disc
  quantile at 5/6 of the daily-demand distribution, plus the EXACT
  integer expected-cost sum SUM [1*max(S-d,0) + 5*max(d-S,0)] over
  the day histogram, for S* and for the mean-demand heuristic
  S = round(mean) (the comparison makes the fractile's optimality
  visible).
- inventory_sS_sim: an exact-integer (s,S) inventory simulation over
  the daily demand series — reorder point s = 2*median demand,
  order-up-to S = 4*median, lost-sales, instant end-of-day
  replenishment; the integer state recursion (stock, stockout days,
  orders placed, lost units) replays in a recursive CTE.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Min, Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries47 import _strip

_US_PER_DAY = 86_400_000_000


def _daily_qty(sf_dir: str) -> pd.DataFrame:
    ds = _pq(sf_dir, "lineitem", columns=["l_shipdate", "l_quantity"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["l_shipdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // _US_PER_DAY)
        q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)
                     + 0.5).astype(np.int64)
        df = pd.DataFrame({"day": day, "q": q})
        g = df.groupby("day", sort=False)["q"].sum().reset_index()
        g["q"] = g["q"].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(dpart, batch_format="pyarrow")
              .groupby("day").aggregate(Sum("q", alias_name="q"))
              .to_pandas().sort_values("day").reset_index(drop=True))


_DAILY_QTY_SQL = f"""
daily AS (
  SELECT CAST(epoch_us(l_shipdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS q
  FROM lineitem GROUP BY 1)
"""


# ---------------------------------------------------------------------------
# Lead-time quantiles
# ---------------------------------------------------------------------------


def q_leadtime_quantiles_priority(sf_dir: str):
    """Exact p50/p90 fulfilment lead time per priority (docstring
    above)."""
    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def li_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "ms": t["l_shipdate"].cast(pa.int64())
            .to_numpy(zero_copy_only=False)})
        g = df.groupby("o_orderkey", sort=False)["ms"].min().reset_index()
        g["ms"] = g["ms"].astype(np.int64)
        return _strip(g)

    per_order = (li.map_batches(li_partial, batch_format="pyarrow")
                   .groupby("o_orderkey")
                   .aggregate(Min("ms", alias_name="ms")))

    def cast_keys(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index("o_orderkey")
        t = t.set_column(idx, "o_orderkey",
                         pc.cast(t["o_orderkey"], pa.int64()))
        return t.set_column(
            t.schema.get_field_index("o_orderdate"), "o_orderdate",
            pc.cast(t["o_orderdate"], pa.int64()))

    joined = orders.map_batches(cast_keys, batch_format="pyarrow").join(
        per_order, join_type="inner", num_partitions=8,
        on=("o_orderkey",))

    def hpart(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        ms = t["ms"].to_numpy(zero_copy_only=False)
        d = (ms // _US_PER_DAY) - (od // _US_PER_DAY)
        df = pd.DataFrame({
            "pr": np.asarray(t["o_orderpriority"].to_pylist()),
            "d": d.astype(np.int64), "n": np.int64(1)})
        g = df.groupby(["pr", "d"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (joined.map_batches(hpart, batch_format="pyarrow")
                   .groupby(["pr", "d"])
                   .aggregate(Sum("n", alias_name="n"))
                   .to_pandas())
    rows = []
    for pr in sorted(cells["pr"].unique()):
        sub = cells[cells["pr"] == pr].sort_values("d")
        d = sub["d"].to_numpy(np.int64)
        cum = np.cumsum(sub["n"].to_numpy(np.int64))
        n = int(cum[-1])
        p50 = int(d[np.searchsorted(cum, math.ceil(0.5 * n))])
        p90 = int(d[np.searchsorted(cum, math.ceil(0.9 * n))])
        rows.append((pr, n, p50, p90))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n_orders",
                                      "p50_d", "p90_d"])
    for col in ("n_orders", "p50_d", "p90_d"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LEADTIME = f"""
WITH fs AS (
  SELECT l_orderkey, min(l_shipdate) AS ms FROM lineitem GROUP BY 1),
d AS (
  SELECT o_orderpriority,
         (epoch_us(ms) // {_US_PER_DAY}
          - epoch_us(o_orderdate) // {_US_PER_DAY})::BIGINT AS d
  FROM orders JOIN fs ON fs.l_orderkey = o_orderkey)
SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
       quantile_disc(d, 0.5)::BIGINT AS p50_d,
       quantile_disc(d, 0.9)::BIGINT AS p90_d
FROM d GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Newsvendor
# ---------------------------------------------------------------------------


def q_newsvendor_stock(sf_dir: str):
    """Critical-fractile stock + exact expected-cost comparison
    (docstring above)."""
    daily = _daily_qty(sf_dir)
    q = np.sort(daily["q"].to_numpy(np.int64))
    n = len(q)
    s_star = int(q[math.ceil(5.0 / 6.0 * n) - 1])
    s_tot = int(q.sum())
    s_mean = int(math.floor(float(s_tot) / float(n) + 0.5))

    def cost(s: int) -> int:
        return sum(1 * max(s - int(d), 0) + 5 * max(int(d) - s, 0)
                   for d in q)

    c_star = cost(s_star)
    c_mean = cost(s_mean)
    out = pd.DataFrame({"n_days": [n], "s_star": [s_star],
                        "cost_star": [c_star], "s_mean": [s_mean],
                        "cost_mean": [c_mean]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_NEWSVENDOR = f"""
WITH {_DAILY_QTY_SQL},
t AS (
  SELECT count(*)::BIGINT AS n, quantile_disc(q, 5.0 / 6.0) AS s_star,
         CAST(round(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT)
           AS s_mean
  FROM daily),
c AS (
  SELECT max(n) AS n, max(s_star) AS s_star, max(s_mean) AS s_mean,
         sum(1 * greatest(s_star - q, 0)
             + 5 * greatest(q - s_star, 0))::BIGINT AS cost_star,
         sum(1 * greatest(s_mean - q, 0)
             + 5 * greatest(q - s_mean, 0))::BIGINT AS cost_mean
  FROM daily CROSS JOIN t)
SELECT n AS n_days, s_star, cost_star, s_mean, cost_mean FROM c
"""


# ---------------------------------------------------------------------------
# (s, S) inventory simulation
# ---------------------------------------------------------------------------


def q_inventory_ss_sim(sf_dir: str):
    """Exact-integer (s,S) lost-sales simulation (docstring above)."""
    daily = _daily_qty(sf_dir)
    d = [int(v) for v in daily["q"]]
    n = len(d)
    srt = sorted(d)
    med = srt[math.ceil(0.5 * n) - 1]
    s_pt = 2 * med
    s_cap = 4 * med
    stock = s_cap
    stockouts = orders = lost = 0
    for dv in d:
        stock -= dv
        if stock < 0:
            stockouts += 1
            lost += -stock
            stock = 0
        if stock <= s_pt:
            orders += 1
            stock = s_cap
    out = pd.DataFrame({"n_days": [n], "s_point": [s_pt],
                        "s_cap": [s_cap], "stockout_days": [stockouts],
                        "orders_placed": [orders], "lost_units": [lost]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_INVENTORY = f"""
WITH RECURSIVE {_DAILY_QTY_SQL.replace("daily AS (",
                                       "daily AS MATERIALIZED (")},
seq AS MATERIALIZED (
  SELECT q, row_number() OVER (ORDER BY day) AS t FROM daily),
p AS MATERIALIZED (
  SELECT count(*)::BIGINT AS n, 2 * quantile_disc(q, 0.5) AS s_pt,
         4 * quantile_disc(q, 0.5) AS s_cap
  FROM daily),
r AS (
  SELECT 0::BIGINT AS t, s_cap AS stock, 0::BIGINT AS stockouts,
         0::BIGINT AS orders_ct, 0::BIGINT AS lost
  FROM p
  UNION ALL
  SELECT seq.t,
         CASE WHEN greatest(r.stock - seq.q, 0) <= p.s_pt THEN p.s_cap
              ELSE greatest(r.stock - seq.q, 0) END AS stock,
         r.stockouts + (r.stock - seq.q < 0)::INT AS stockouts,
         r.orders_ct
           + (greatest(r.stock - seq.q, 0) <= p.s_pt)::INT AS orders_ct,
         r.lost + greatest(seq.q - r.stock, 0) AS lost
  FROM r JOIN seq ON seq.t = r.t + 1 CROSS JOIN p)
SELECT (SELECT n FROM p) AS n_days, (SELECT s_pt FROM p) AS s_point,
       (SELECT s_cap FROM p) AS s_cap, stockouts AS stockout_days,
       orders_ct AS orders_placed, lost AS lost_units
FROM r WHERE t = (SELECT n FROM p)
"""


QUERIES97: dict[str, tuple] = {
    "leadtime_quantiles_priority": (q_leadtime_quantiles_priority,
                                    SQL_LEADTIME),
    "newsvendor_stock": (q_newsvendor_stock, SQL_NEWSVENDOR),
    "inventory_sS_sim": (q_inventory_ss_sim, SQL_INVENTORY),
}
