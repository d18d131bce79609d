"""One-hundred-thirty-seventh oracle-query batch — inspection bias,
robust consensus fitting, and audit sampling:

- inspection_paradox_gaps: the waiting-time (length-bias) paradox on
  per-user consecutive event gaps: plain mean S/n vs length-biased
  mean Q/S (the gap a random arrival lands in), and the exact bias
  ratio n·Q/S² — all from exact integer gap moments out of
  user-salted partitions.
- ransac_line_daily: deterministic RANSAC line consensus on the
  $1000-quantized daily revenue series — candidate models are all
  pairs of every-30th-day anchor points; the inlier test
  |(v−v1)·dt − (t−t1)·dv| ≤ eps·dt is a PURE integer inequality
  (eps = value-range//20); winner by (inliers desc, t1, t2).
- monetary_unit_sampling: systematic dollar-unit (MUS) selection over
  orders in o_orderkey order — an order is selected when the
  cumulative cents crosses a sampling-interval boundary
  (interval = total//97, start 0); outputs are exact counts/sums.
  The ordered prefix sum is a scan (parallelizable by range
  partition at scale; driver-side here over the key-sorted pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries26 import _PARTS
from scrapy_ray.pipelines.queries47 import _US_PER_DAY, _daily_cents, \
    _strip


# ---------------------------------------------------------------------------
# Inspection paradox
# ---------------------------------------------------------------------------


def q_inspection_paradox_gaps(sf_dir: str):
    """Length-biased vs plain mean gap (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def gpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "ts_us": t["ts"].cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "eid": t["event_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        df["gkey"] = (df["u"] % _PARTS).astype(np.int32)
        return _strip(df)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts_us", "eid"], kind="mergesort")
        u = df["u"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        g = (ts[1:] - ts[:-1])[same] // 1_000_000
        return pd.DataFrame({"n": [np.int64(len(g))],
                             "s": [np.int64(g.sum())],
                             "q": [np.int64((g * g).sum())]})

    agg = (ds.map_batches(gpart, batch_format="pyarrow")
             .groupby("gkey").map_groups(moments, batch_format="pandas")
             .to_pandas())
    n = int(agg["n"].sum())
    s = int(agg["s"].sum())
    q = int(agg["q"].sum())
    mean = float(s) / float(n)
    lb = float(q) / float(s)
    ratio = float(n * q) / float(s * s)
    out = pd.DataFrame({"n_gaps": [n], "sum_s": [s],
                        "mean6": [_round6(np.array([mean]))[0]],
                        "lb_mean6": [_round6(np.array([lb]))[0]],
                        "ratio6": [_round6(np.array([ratio]))[0]]})
    for col in ("n_gaps", "sum_s"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_INSPECTION = """
WITH g AS (
  SELECT (epoch_us(ts)
          - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)))
           // 1000000 AS gap
  FROM events QUALIFY gap IS NOT NULL),
m AS (
  SELECT count(*)::BIGINT AS n, sum(gap)::BIGINT AS s,
         sum(CAST(gap AS HUGEINT) * gap)::BIGINT AS q
  FROM g)
SELECT n AS n_gaps, s AS sum_s,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean6,
       round(CAST(q AS DOUBLE) / CAST(s AS DOUBLE), 6) AS lb_mean6,
       round(CAST(CAST(n AS HUGEINT) * q AS DOUBLE)
             / CAST(CAST(s AS HUGEINT) * s AS DOUBLE), 6) AS ratio6
FROM m
"""


# ---------------------------------------------------------------------------
# Deterministic RANSAC
# ---------------------------------------------------------------------------


def q_ransac_line_daily(sf_dir: str):
    """Integer RANSAC consensus line on daily revenue (docstring)."""
    cells = _daily_cents(sf_dir)
    v = cells["c"].to_numpy(np.int64) // 100000
    n = len(v)
    t = np.arange(1, n + 1, dtype=np.int64)
    eps = int((int(v.max()) - int(v.min())) // 20)
    anc = np.arange(0, n, 30)
    ai, aj = np.meshgrid(anc, anc, indexing="ij")
    mm = aj > ai
    i1, i2 = ai[mm], aj[mm]
    dt = t[i2] - t[i1]
    dv = v[i2] - v[i1]
    # |(v - v1)*dt - (t - t1)*dv| <= eps*dt, all integers
    lhs = np.abs((v[None, :] - v[i1][:, None]) * dt[:, None]
                 - (t[None, :] - t[i1][:, None]) * dv[:, None])
    inl = (lhs <= (eps * dt)[:, None]).sum(axis=1)
    order = np.lexsort((t[i2], t[i1], -inl))
    b = order[0]
    slope = float(dv[b]) / float(dt[b])
    out = pd.DataFrame({
        "t1": [int(t[i1[b]])], "t2": [int(t[i2[b]])],
        "n_inliers": [int(inl[b])], "eps": [eps],
        "slope6": [_round6(np.array([slope]))[0]]})
    for col in ("t1", "t2", "n_inliers", "eps"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RANSAC = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS v
  FROM orders GROUP BY 1),
s AS (SELECT v, row_number() OVER (ORDER BY d) AS t FROM daily),
ep AS (SELECT (max(v) - min(v)) // 20 AS eps FROM s),
anc AS (SELECT v, t FROM s WHERE (t - 1) % 30 = 0),
md AS (
  SELECT a.t AS t1, a.v AS v1, b.t AS t2,
         b.t - a.t AS dt, b.v - a.v AS dv
  FROM anc a JOIN anc b ON b.t > a.t),
inl AS (
  SELECT md.t1, md.t2, md.dt, md.dv,
         sum((abs((s.v - md.v1) * md.dt - (s.t - md.t1) * md.dv)
              <= (SELECT eps FROM ep) * md.dt)::INT)::BIGINT AS c
  FROM md CROSS JOIN s
  GROUP BY 1, 2, 3, 4),
pick AS (
  SELECT t1, t2, c, dt, dv,
         row_number() OVER (ORDER BY c DESC, t1, t2) AS r
  FROM inl)
SELECT t1, t2, c AS n_inliers, (SELECT eps FROM ep)::BIGINT AS eps,
       round(CAST(dv AS DOUBLE) / CAST(dt AS DOUBLE), 6) AS slope6
FROM pick WHERE r = 1
"""


# ---------------------------------------------------------------------------
# Monetary-unit sampling
# ---------------------------------------------------------------------------


def q_monetary_unit_sampling(sf_dir: str):
    """Systematic dollar-unit selection over orders (docstring)."""
    ds = _pq(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def kpart(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        return pa.table({"k": pa.array(k), "c": pa.array(c)})

    rows = (ds.map_batches(kpart, batch_format="pyarrow")
              .to_pandas().sort_values("k").reset_index(drop=True))
    c = rows["c"].to_numpy(np.int64)
    k = rows["k"].to_numpy(np.int64)
    cum = np.cumsum(c.astype(object))
    total = int(cum[-1])
    interval = max(1, total // 97)
    cur = np.array([int(x) // interval for x in cum], dtype=np.int64)
    prev = np.concatenate(([0], cur[:-1]))
    sel = cur > prev
    out = pd.DataFrame({
        "n_orders": [len(k)], "samp_interval": [interval],
        "n_selected": [int(sel.sum())],
        "sum_selected": [int(c[sel].sum())],
        "min_key": [int(k[sel].min())], "max_key": [int(k[sel].max())]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_MUS = """
WITH r AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders),
t AS (SELECT greatest(1, sum(c) // 97) AS iv,
             count(*)::BIGINT AS n
      FROM r),
cs AS (
  SELECT k, c,
         sum(c) OVER (ORDER BY k) AS cum,
         coalesce(sum(c) OVER (ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_prev
  FROM r),
sel AS (
  SELECT k, c FROM cs CROSS JOIN t
  WHERE cum // iv > cum_prev // iv)
SELECT (SELECT n FROM t) AS n_orders,
       (SELECT iv FROM t)::BIGINT AS samp_interval,
       count(*)::BIGINT AS n_selected,
       sum(c)::BIGINT AS sum_selected,
       min(k)::BIGINT AS min_key, max(k)::BIGINT AS max_key
FROM sel
"""


QUERIES137: dict[str, tuple] = {
    "inspection_paradox_gaps": (q_inspection_paradox_gaps,
                                SQL_INSPECTION),
    "ransac_line_daily": (q_ransac_line_daily, SQL_RANSAC),
    "monetary_unit_sampling": (q_monetary_unit_sampling, SQL_MUS),
}
