"""Forty-seventh oracle-query batch — residual autocorrelation /
nonparametric trend / outlier testing, all on exact integer cores:

- durbin_watson_daily_revenue: Durbin-Watson test of first-order
  autocorrelation in the residuals of the daily-revenue-vs-time OLS
  fit. The trick: with the centered integer time axis t' = 2t-(n+1)
  (so sum(t') = 0), the D-scaled residual r_t = n*Stt'*y_t - Stt'*Sy
  - n*Sty'*t' is an EXACT integer, and DW = sum(diff(r)^2)/sum(r^2)
  is scale-invariant — the whole statistic is integer arithmetic with
  one float division. Daily revenue is quantized to KILODOLLARS
  (round(day_cents/1e5) — dollar-unit r^2 sums would blow past
  HUGEINT at sf0.1; the k$ unit keeps sum(r^2) < ~3e37 through sf1).
- mann_kendall_daily_revenue: the Mann-Kendall trend test on the same
  daily series (dollars) — S = sum_{i<j} sign(y_j - y_i) exact via an
  O(n^2) pairwise scan of the O(days) aggregate (1094 days; SQL
  mirrors with a t1.t < t2.t self-join), tie-corrected variance kept
  as the exact integer var18 = n(n-1)(2n+5) - sum t_k(t_k-1)(2t_k+5),
  z = (S -/+ 1)/sqrt(var18/18) identical-expression.
- grubbs_order_value: Grubbs' max-deviation outlier test on order
  value in DOLLARS — ONE distributed pass carries (n, S1, S2, min,
  max); the max absolute deviation M = max(n*max - S1, S1 - n*min) is
  exact (no second pass needed), and G = M * sqrt((n-1)/(n*A2)) with
  A2 = n*S2 - S1^2 finalizes identical-expression (A2 combines in
  Python ints / HUGEINT — S1^2 passes 1e21 at sf0.1).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents_np, _pq
from scrapy_ray.pipelines.queries8 import _round6

_US_PER_DAY = 86_400_000_000


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _daily_cents(sf_dir: str) -> pd.DataFrame:
    """Exact per-day order-revenue cents, sorted by day (O(days) rows)."""
    ds = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // _US_PER_DAY)
        c = _cents_np(t["o_totalprice"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"day": day, "c": c})
        g = df.groupby("day", sort=False)["c"].sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(dpart, batch_format="pyarrow")
              .groupby("day").aggregate(Sum("c", alias_name="c"))
              .to_pandas()).sort_values("day").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Durbin-Watson
# ---------------------------------------------------------------------------


def q_durbin_watson_daily_revenue(sf_dir: str):
    """DW statistic of daily-revenue OLS residuals, exact integer core
    (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    # kilodollar daily totals: round(cents / 1e5), half-away-from-zero
    yv = np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)
    y = [int(v) for v in yv]
    n = len(y)
    tp = [2 * (i + 1) - (n + 1) for i in range(n)]   # centered, sum = 0
    sy = sum(y)
    stt = sum(t * t for t in tp)
    sty = sum(t * v for t, v in zip(tp, y))
    r = [n * stt * v - stt * sy - n * sty * t for t, v in zip(tp, y)]
    den = sum(v * v for v in r)
    num = sum((a - b) * (a - b) for a, b in zip(r[1:], r[:-1]))
    dw = float(num) / float(den)
    b1 = float(sty) / float(stt)
    r6 = _round6(np.array([b1, dw, 1.0 - dw / 2.0]))
    out = pd.DataFrame({"n_days": [n], "sy": [sy], "sty": [sty],
                        "b1_6": [r6[0]], "dw6": [r6[1]],
                        "rho1_6": [r6[2]]})
    for col in ("n_days", "sy", "sty"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_DW = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d AS (
  SELECT day, CAST(round(c / 100000.0) AS BIGINT) AS y,
         row_number() OVER (ORDER BY day) AS i
  FROM dc),
nn AS (SELECT count(*)::HUGEINT AS n FROM d),
t AS (
  SELECT y::HUGEINT AS y, (2 * i - (nn.n + 1))::HUGEINT AS tp, i
  FROM d, nn),
s AS (
  SELECT (SELECT n FROM nn) AS n, sum(y)::HUGEINT AS sy,
         sum(tp * tp)::HUGEINT AS stt, sum(tp * y)::HUGEINT AS sty
  FROM t),
r AS (
  SELECT t.i,
         (s.n * s.stt * t.y - s.stt * s.sy - s.n * s.sty * t.tp)
           AS res
  FROM t, s),
w AS (
  SELECT res, lag(res) OVER (ORDER BY i) AS prev FROM r),
f AS (
  SELECT sum(res * res) AS den,
         sum(CASE WHEN prev IS NULL THEN 0
                  ELSE (res - prev) * (res - prev) END) AS num
  FROM w)
SELECT s.n::BIGINT AS n_days, s.sy::BIGINT AS sy, s.sty::BIGINT AS sty,
       round(CAST(s.sty AS DOUBLE) / CAST(s.stt AS DOUBLE), 6) AS b1_6,
       round(CAST(f.num AS DOUBLE) / CAST(f.den AS DOUBLE), 6) AS dw6,
       round(1.0 - (CAST(f.num AS DOUBLE) / CAST(f.den AS DOUBLE))
                   / 2.0, 6) AS rho1_6
FROM s, f
"""


# ---------------------------------------------------------------------------
# Mann-Kendall
# ---------------------------------------------------------------------------


def q_mann_kendall_daily_revenue(sf_dir: str):
    """Mann-Kendall trend test on daily revenue dollars (docstring
    above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    y = (np.sign(c / 100.0)
         * np.floor(np.abs(c / 100.0) + 0.5)).astype(np.int64)
    n = len(y)
    diff = np.sign(y[None, :] - y[:, None])
    s = int(np.triu(diff, 1).sum())
    _, counts = np.unique(y, return_counts=True)
    ties = counts[counts > 1].astype(object)
    var18 = (n * (n - 1) * (2 * n + 5)
             - int(sum(t * (t - 1) * (2 * t + 5) for t in ties)))
    if s > 0:
        z = (float(s) - 1.0) / math.sqrt(float(var18) / 18.0)
    elif s < 0:
        z = (float(s) + 1.0) / math.sqrt(float(var18) / 18.0)
    else:
        z = 0.0
    out = pd.DataFrame({"n_days": [n], "s_stat": [s], "var18": [var18],
                        "z6": [_round6(np.array([z]))[0]]})
    for col in ("n_days", "s_stat", "var18"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MK = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d AS (
  SELECT CAST(round(c / 100.0) AS BIGINT) AS y,
         row_number() OVER (ORDER BY day) AS i
  FROM dc),
nn AS (SELECT count(*)::BIGINT AS n FROM d),
sp AS (
  SELECT sum(CASE WHEN b.y > a.y THEN 1
                  WHEN b.y < a.y THEN -1 ELSE 0 END)::BIGINT AS s
  FROM d a JOIN d b ON b.i > a.i),
tie AS (
  SELECT coalesce(sum(cnt * (cnt - 1) * (2 * cnt + 5)), 0)::BIGINT AS tt
  FROM (SELECT count(*)::BIGINT AS cnt FROM d GROUP BY y
        HAVING count(*) > 1)),
v AS (
  SELECT nn.n, sp.s,
         (nn.n * (nn.n - 1) * (2 * nn.n + 5) - tie.tt)::BIGINT AS var18
  FROM nn, sp, tie)
SELECT n AS n_days, s AS s_stat, var18,
       round(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                       / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                  WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                       / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                  ELSE 0.0 END, 6) AS z6
FROM v
"""


# ---------------------------------------------------------------------------
# Grubbs
# ---------------------------------------------------------------------------


def q_grubbs_order_value(sf_dir: str):
    """Grubbs' outlier test on order value dollars, single distributed
    pass (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def ppart(t: pa.Table) -> pa.Table:
        y = t["o_totalprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        if len(d) == 0:   # min/max are not defined on an empty block
            return pa.table({"n": pa.array([], pa.int64()),
                             "s1": pa.array([], pa.int64()),
                             "s2": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({"n": pa.array([np.int64(len(d))]),
                         "s1": pa.array([int(d.sum())]),
                         "s2": pa.array([int((d * d).sum())]),
                         "mn": pa.array([int(d.min())]),
                         "mx": pa.array([int(d.max())])})

    parts = ds.map_batches(ppart, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    s1 = sum(int(x) for x in parts["s1"])
    s2 = sum(int(x) for x in parts["s2"])
    mn = int(parts["mn"].min())
    mx = int(parts["mx"].max())
    a2 = n * s2 - s1 * s1
    hi, lo = n * mx - s1, s1 - n * mn
    m = max(hi, lo)
    g = float(m) * math.sqrt((float(n) - 1.0) / (float(n) * float(a2)))
    out = pd.DataFrame({"n": [n], "s1": [s1], "m_dev": [m],
                        "side": ["max" if hi >= lo else "min"],
                        "g6": [_round6(np.array([g]))[0]]})
    for col in ("n", "s1", "m_dev"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GRUBBS = """
WITH d AS (
  SELECT CAST(round(o_totalprice) AS BIGINT) AS v FROM orders),
s AS (
  SELECT count(*)::HUGEINT AS n, sum(v)::HUGEINT AS s1,
         sum(v * v)::HUGEINT AS s2, min(v)::HUGEINT AS mn,
         max(v)::HUGEINT AS mx
  FROM d),
f AS (
  SELECT n, s1, (n * s2 - s1 * s1) AS a2,
         (n * mx - s1) AS hi, (s1 - n * mn) AS lo
  FROM s)
SELECT n::BIGINT AS n, s1::BIGINT AS s1,
       greatest(hi, lo)::BIGINT AS m_dev,
       CASE WHEN hi >= lo THEN 'max' ELSE 'min' END AS side,
       round(CAST(greatest(hi, lo) AS DOUBLE)
             * sqrt((CAST(n AS DOUBLE) - 1.0)
                    / (CAST(n AS DOUBLE) * CAST(a2 AS DOUBLE))), 6)
         AS g6
FROM f
"""


QUERIES47: dict[str, tuple] = {
    "durbin_watson_daily_revenue": (q_durbin_watson_daily_revenue,
                                    SQL_DW),
    "mann_kendall_daily_revenue": (q_mann_kendall_daily_revenue, SQL_MK),
    "grubbs_order_value": (q_grubbs_order_value, SQL_GRUBBS),
}
