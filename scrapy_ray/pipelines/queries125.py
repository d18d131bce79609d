"""One-hundred-twenty-fifth oracle-query batch — diffusion, queueing
and density clustering:

- bass_diffusion_customers: discrete Bass model fit to monthly NEW
  customers (month of each customer's first order): OLS of
  n_t = a + b·N_{t−1} + c·N_{t−1}² solved by Cramer's rule on EXACT
  integer normal-equation determinants (entries up to ΣN⁴ — HUGEINT
  holds through sf0.1 with ~100× headroom); market size
  M = (−b − √(b²−4ac))/(2c), p = a/M, q = −c·M finalize through
  identical float expressions (the minus root reproduces the true
  customer count to ~0.1% on this data at every SF — probed before
  wiring).
- pollaczek_khinchine_queue: M/G/1 metrics for purchase events with
  service time = value seconds: λ from exact counts over the exact
  event-time span, E[S], E[S²] from exact Σcents/Σcents²; the P-K
  formula Wq = λE[S²]/(2(1−ρ)) and L/Lq/W finalize identically.
- dbscan_1d_daily: 1-D DBSCAN over $1000-quantized daily revenue
  values with integer eps = range//50 and minPts = 4 — a PURE-INTEGER
  query: neighborhood counts off the value histogram, core islands by
  gap > eps over sorted core values, border = non-core within eps of
  a core; outputs are all exact counts (no float anywhere).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq, _ts_minmax_us
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip
from scrapy_ray.pipelines.queries124 import _det3, _replace_col


# ---------------------------------------------------------------------------
# Bass diffusion
# ---------------------------------------------------------------------------


def q_bass_diffusion_customers(sf_dir: str):
    """Bass (p, q, M) from monthly new-customer counts (docstring)."""
    ds = _pq(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def fpart(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["o_orderdate"].dt.year.to_numpy(np.int64) * 12
             + df["o_orderdate"].dt.month.to_numpy(np.int64))
        g = pd.DataFrame({"cust": df["o_custkey"].to_numpy(np.int64),
                          "m": m}) \
            .groupby("cust", sort=False)["m"].min().reset_index()
        g["gkey"] = (g["cust"] % 64).astype(np.int32)
        return g

    def ffin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cust", sort=False)["m"].min().reset_index()
        h = g.groupby("m", sort=False)["cust"].size().rename("n") \
            .reset_index()
        h["n"] = h["n"].astype(np.int64)
        return h

    dn = (ds.map_batches(fpart, batch_format="pandas")
            .groupby("gkey").map_groups(ffin, batch_format="pandas")
            .to_pandas()
            .groupby("m").sum().reset_index().sort_values("m"))
    n = [int(x) for x in dn["n"]]
    cum = [0]
    for x in n[:-1]:
        cum.append(cum[-1] + x)
    t = len(n)
    s_n = sum(cum)
    s_n2 = sum(x * x for x in cum)
    s_n3 = sum(x ** 3 for x in cum)
    s_n4 = sum(x ** 4 for x in cum)
    s_y = sum(n)
    s_ny = sum(x * y for x, y in zip(cum, n))
    s_n2y = sum(x * x * y for x, y in zip(cum, n))
    mat = [[t, s_n, s_n2], [s_n, s_n2, s_n3], [s_n2, s_n3, s_n4]]
    v = [s_y, s_ny, s_n2y]
    det = _det3(mat)
    a = float(_det3(_replace_col(mat, 0, v))) / float(det)
    b = float(_det3(_replace_col(mat, 1, v))) / float(det)
    c = float(_det3(_replace_col(mat, 2, v))) / float(det)
    disc = b * b - 4.0 * a * c
    m_cap = (-b - np.sqrt(disc)) / (2.0 * c)
    p = a / m_cap
    q = -(c * m_cap)
    out = pd.DataFrame({"t_months": [t], "n_cust": [s_y],
                        "m6": [_round6(np.array([m_cap]))[0]],
                        "p6": [_round6(np.array([p]))[0]],
                        "q6": [_round6(np.array([q]))[0]]})
    for col in ("t_months", "n_cust"):
        out[col] = out[col].astype(np.int64)
    return out


def _bass_sql() -> str:
    def det3s(m):
        def mul2(a_, b_, c_, d_):
            return f"({a_} * {b_} - {c_} * {d_})"
        return (f"({m[0][0]} * {mul2(m[1][1], m[2][2], m[1][2], m[2][1])}"
                f" - {m[0][1]} * {mul2(m[1][0], m[2][2], m[1][2], m[2][0])}"
                f" + {m[0][2]} * {mul2(m[1][0], m[2][1], m[1][1], m[2][0])})")

    cols = ["t", "s_n", "s_n2", "s_n3", "s_n4"]
    mat = [[cols[0], cols[1], cols[2]],
           [cols[1], cols[2], cols[3]],
           [cols[2], cols[3], cols[4]]]
    v = ["s_y", "s_ny", "s_n2y"]
    det = det3s(mat)
    reps = [det3s(_replace_col(mat, k, v)) for k in range(3)]
    return f"""
WITH fu AS (
  SELECT o_custkey,
         year(min(o_orderdate)) * 12 + month(min(o_orderdate)) AS m
  FROM orders GROUP BY 1),
dn AS (SELECT m, count(*)::BIGINT AS n FROM fu GROUP BY 1),
cm AS (
  SELECT n, CAST(coalesce(sum(n) OVER (ORDER BY m
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS HUGEINT) AS cum
  FROM dn),
s AS (
  SELECT count(*)::HUGEINT AS t, sum(cum) AS s_n,
         sum(cum * cum) AS s_n2, sum(cum * cum * cum) AS s_n3,
         sum(cum * cum * cum * cum) AS s_n4,
         sum(CAST(n AS HUGEINT))::HUGEINT AS s_y,
         sum(cum * n) AS s_ny, sum(cum * cum * n) AS s_n2y
  FROM cm),
co AS (
  SELECT t, s_y,
         CAST({reps[0]} AS DOUBLE) / CAST({det} AS DOUBLE) AS a,
         CAST({reps[1]} AS DOUBLE) / CAST({det} AS DOUBLE) AS b,
         CAST({reps[2]} AS DOUBLE) / CAST({det} AS DOUBLE) AS c
  FROM s),
f AS (
  SELECT t, s_y, a, c,
         (-b - sqrt(b * b - 4.0 * a * c)) / (2.0 * c) AS m_cap
  FROM co)
SELECT t::BIGINT AS t_months, s_y::BIGINT AS n_cust,
       round(m_cap, 6) AS m6, round(a / m_cap, 6) AS p6,
       round(-(c * m_cap), 6) AS q6
FROM f
"""


SQL_BASS = _bass_sql()


# ---------------------------------------------------------------------------
# M/G/1 Pollaczek-Khinchine
# ---------------------------------------------------------------------------


def q_pollaczek_khinchine_queue(sf_dir: str):
    """M/G/1 queue metrics for purchase service times (docstring)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])
    mn_us, mx_us = _ts_minmax_us(sf_dir, "events")
    span_s = (mx_us - mn_us) // 1_000_000

    def ppart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        m = et == "purchase"
        c = cents[m]
        return pa.table({"g": pa.array([0], pa.int64()),
                         "n": pa.array([int(m.sum())], pa.int64()),
                         "s": pa.array([int(c.sum())], pa.int64()),
                         "q": pa.array([int((c * c).sum())], pa.int64())})

    agg = (ds.map_batches(ppart, batch_format="pyarrow")
             .groupby("g").aggregate(Sum("n", alias_name="n"),
                                     Sum("s", alias_name="s"),
                                     Sum("q", alias_name="q"))
             .to_pandas())
    n = int(agg["n"].iloc[0])
    s = int(agg["s"].iloc[0])
    qq = int(agg["q"].iloc[0])
    lam = float(n) / float(span_s)
    es = float(s) / (100.0 * float(n))
    es2 = float(qq) / (10000.0 * float(n))
    rho = lam * es
    wq = lam * es2 / (2.0 * (1.0 - rho))
    w = wq + es
    out = pd.DataFrame({
        "n_jobs": [n], "span_s": [span_s],
        "rho6": [_round6(np.array([rho]))[0]],
        "es6": [_round6(np.array([es]))[0]],
        "wq6": [_round6(np.array([wq]))[0]],
        "w6": [_round6(np.array([w]))[0]],
        "lq6": [_round6(np.array([lam * wq]))[0]],
        "l6": [_round6(np.array([lam * w]))[0]]})
    for col in ("n_jobs", "span_s"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PK_QUEUE = """
WITH sp AS (
  SELECT (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS span_s
  FROM events),
j AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS s,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
             * CAST(round(value * 100) AS BIGINT)) AS q
  FROM events WHERE event_type = 'purchase'),
f AS (
  SELECT n, s, q, span_s,
         CAST(n AS DOUBLE) / CAST(span_s AS DOUBLE) AS lam,
         CAST(s AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)) AS es,
         CAST(q AS DOUBLE) / (10000.0 * CAST(n AS DOUBLE)) AS es2
  FROM j CROSS JOIN sp),
g AS (
  SELECT n, span_s, lam, es, lam * es AS rho,
         lam * es2 / (2.0 * (1.0 - lam * es)) AS wq
  FROM f)
SELECT n AS n_jobs, span_s, round(rho, 6) AS rho6, round(es, 6) AS es6,
       round(wq, 6) AS wq6, round(wq + es, 6) AS w6,
       round(lam * wq, 6) AS lq6, round(lam * (wq + es), 6) AS l6
FROM g
"""


# ---------------------------------------------------------------------------
# 1-D DBSCAN
# ---------------------------------------------------------------------------


def q_dbscan_1d_daily(sf_dir: str):
    """Pure-integer 1-D DBSCAN on $1000-quantized daily revenue."""
    cells = _daily_cents(sf_dir)
    v = np.sort((cells["c"].to_numpy(np.int64) // 100000))
    vals, cnt = np.unique(v, return_counts=True)
    cnt = cnt.astype(np.int64)
    eps = int((vals[-1] - vals[0]) // 50)
    cum = np.concatenate(([0], np.cumsum(cnt)))
    lo = np.searchsorted(vals, vals - eps, side="left")
    hi = np.searchsorted(vals, vals + eps, side="right")
    nb = cum[hi] - cum[lo]
    core = nb >= 4
    cv, cc = vals[core], cnt[core]
    # islands over sorted core values: break when gap > eps
    brk = np.concatenate(([True], (cv[1:] - cv[:-1]) > eps))
    isl = np.cumsum(brk)
    sizes = pd.Series(cc).groupby(isl).sum()
    n_clusters = int(isl[-1]) if len(cv) else 0
    max_pts = int(sizes.max()) if len(sizes) else 0
    # border: non-core value within eps of some core value
    nc_vals, nc_cnt = vals[~core], cnt[~core]
    if len(cv):
        pos = np.searchsorted(cv, nc_vals)
        left = np.where(pos > 0, nc_vals - cv[np.maximum(pos - 1, 0)],
                        np.int64(2 ** 62))
        right = np.where(pos < len(cv),
                         cv[np.minimum(pos, len(cv) - 1)] - nc_vals,
                         np.int64(2 ** 62))
        isb = np.minimum(left, right) <= eps
    else:
        isb = np.zeros(len(nc_vals), bool)
    n_border = int(nc_cnt[isb].sum())
    n_core_pts = int(cc.sum())
    n_points = int(cnt.sum())
    out = pd.DataFrame({"eps": [eps], "n_points": [n_points],
                        "n_core_pts": [n_core_pts],
                        "n_clusters": [n_clusters],
                        "max_cluster_pts": [max_pts],
                        "n_border_pts": [n_border],
                        "n_noise_pts": [n_points - n_core_pts
                                        - n_border]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_DBSCAN_1D = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS v
  FROM orders GROUP BY 1),
h AS (SELECT v, count(*)::BIGINT AS cnt FROM daily GROUP BY 1),
ep AS (SELECT (max(v) - min(v)) // 50 AS eps FROM h),
nb AS (
  SELECT a.v, a.cnt, sum(b.cnt)::BIGINT AS nbc
  FROM h a CROSS JOIN ep JOIN h b
    ON b.v BETWEEN a.v - ep.eps AND a.v + ep.eps
  GROUP BY 1, 2),
core AS (SELECT v, cnt FROM nb WHERE nbc >= 4),
brk AS (
  SELECT v, cnt,
         CASE WHEN lag(v) OVER (ORDER BY v) IS NULL
                   OR v - lag(v) OVER (ORDER BY v)
                      > (SELECT eps FROM ep)
              THEN 1 ELSE 0 END AS b
  FROM core),
isl AS (SELECT v, cnt, sum(b) OVER (ORDER BY v) AS island FROM brk),
cl AS (SELECT island, sum(cnt)::BIGINT AS pts FROM isl GROUP BY 1),
border AS (
  SELECT sum(n.cnt)::BIGINT AS n_border
  FROM nb n CROSS JOIN ep
  WHERE n.nbc < 4 AND EXISTS (
    SELECT 1 FROM core c
    WHERE c.v BETWEEN n.v - ep.eps AND n.v + ep.eps))
SELECT (SELECT eps FROM ep)::BIGINT AS eps,
       (SELECT sum(cnt) FROM h)::BIGINT AS n_points,
       (SELECT coalesce(sum(cnt), 0) FROM core)::BIGINT AS n_core_pts,
       (SELECT count(*) FROM cl)::BIGINT AS n_clusters,
       (SELECT coalesce(max(pts), 0) FROM cl)::BIGINT
         AS max_cluster_pts,
       coalesce((SELECT n_border FROM border), 0)::BIGINT
         AS n_border_pts,
       ((SELECT sum(cnt) FROM h)
        - (SELECT coalesce(sum(cnt), 0) FROM core)
        - coalesce((SELECT n_border FROM border), 0))::BIGINT
         AS n_noise_pts
"""


QUERIES125: dict[str, tuple] = {
    "bass_diffusion_customers": (q_bass_diffusion_customers, SQL_BASS),
    "pollaczek_khinchine_queue": (q_pollaczek_khinchine_queue,
                                  SQL_PK_QUEUE),
    "dbscan_1d_daily": (q_dbscan_1d_daily, SQL_DBSCAN_1D),
}
