"""Fifty-fifth oracle-query batch — quadratic ECDF distance / paired-half
trend / relative forecastability:

- cramer_von_mises_click_view: two-sample Cramér-von Mises T between
  the click and view value distributions — the quadratic sibling of
  ks_test_click_view on the SAME bounded per-cent histogram machinery.
  At each merged support point the scaled ECDF gap
  D = c1*n2 - c2*n1 is an exact integer, and
  T = sum_v w_v*D_v^2 / (n1*n2*(n1+n2)^2) is ONE float of two exact
  integers (sum ~6e31 at sf1 — Python int / HUGEINT; D itself stays
  inside int64).
- cox_stuart_daily_revenue: Cox-Stuart paired-halves trend test on
  daily revenue dollars — pair y_i with y_{i+h}, h = (n+1)//2 (odd n
  drops the middle), count positive differences, drop ties;
  continuity-corrected z = (|2*S+ - n'| - 1)/sqrt(n') from exact
  integers. The sign complement of mann_kendall (all pairs) and
  runs_test (median crossings) on the same series.
- theil_u2_daily_revenue: Theil's U2 relative forecastability — RMSE
  of the seasonal-naive (lag-7) forecast over RMSE of the naive
  (lag-1) forecast on daily KILODOLLAR revenue, both restricted to
  days where both lags exist; exact integer SSEs, one float
  sqrt-ratio. The RMSE-family complement of mase_seasonal_naive
  (which is MAE-based with a different scaling convention).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Cramér-von Mises
# ---------------------------------------------------------------------------


def q_cramer_von_mises_click_view(sf_dir: str):
    """Two-sample CvM T on click vs view value cents (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def hpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        keep = (et == "click") | (et == "view")
        if not keep.any():
            return pa.table({"g": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        g = (et[keep] == "view").astype(np.int64)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)[keep]
        df = pd.DataFrame({"g": g, "c": c})
        out = df.groupby(["g", "c"], sort=False).size() \
                .reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype(np.int64)
        return _strip(out)

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby(["g", "c"]).aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())           # bounded by the value range
    merged = np.sort(cells["c"].unique().astype(np.int64))
    h = np.zeros((2, len(merged)), np.int64)
    for gi in (0, 1):
        sub = cells[cells["g"] == gi]
        pos = np.searchsorted(merged, sub["c"].to_numpy().astype(np.int64))
        h[gi, pos] = sub["cnt"].to_numpy().astype(np.int64)
    c1 = np.cumsum(h[0])
    c2 = np.cumsum(h[1])
    n1, n2 = int(c1[-1]), int(c2[-1])
    u_big = sum(int(w) * int(dd) * int(dd)
                for w, dd in zip(h[0] + h[1], c1 * n2 - c2 * n1))
    t = float(u_big) / float(n1 * n2 * (n1 + n2) * (n1 + n2))
    out = pd.DataFrame({"n1": [n1], "n2": [n2],
                        "n_support": [len(merged)],
                        "t6": [_round6(np.array([t]))[0]]})
    for col in ("n1", "n2", "n_support"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CVM = """
WITH b AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         (event_type = 'view')::INT AS g
  FROM events WHERE event_type IN ('click', 'view')),
h AS (
  SELECT c, sum((g = 0)::INT)::BIGINT AS h1,
         sum((g = 1)::INT)::BIGINT AS h2
  FROM b GROUP BY 1),
cum AS (
  SELECT c, h1, h2,
         CAST(sum(h1) OVER (ORDER BY c) AS BIGINT) AS c1,
         CAST(sum(h2) OVER (ORDER BY c) AS BIGINT) AS c2
  FROM h),
t AS (SELECT sum(h1)::BIGINT AS n1, sum(h2)::BIGINT AS n2 FROM h),
u AS (
  SELECT sum((h1 + h2)::HUGEINT
             * (c1 * n2 - c2 * n1)::HUGEINT
             * (c1 * n2 - c2 * n1)::HUGEINT) AS u_big,
         count(*)::BIGINT AS n_support, max(n1) AS n1, max(n2) AS n2
  FROM cum CROSS JOIN t)
SELECT n1, n2, n_support,
       round(CAST(u_big AS DOUBLE)
             / CAST((n1 * n2)::HUGEINT
                    * ((n1 + n2)::HUGEINT * (n1 + n2)::HUGEINT)
                    AS DOUBLE), 6) AS t6
FROM u
"""


# ---------------------------------------------------------------------------
# Cox-Stuart
# ---------------------------------------------------------------------------


def q_cox_stuart_daily_revenue(sf_dir: str):
    """Cox-Stuart paired-halves trend z on daily revenue dollars
    (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    y = (np.sign(c / 100.0)
         * np.floor(np.abs(c / 100.0) + 0.5)).astype(np.int64)
    n = len(y)
    hh = (n + 1) // 2
    a = y[:n - hh]
    b = y[hh:]
    nz = a != b
    npairs = int(nz.sum())
    sp = int((b[nz] > a[nz]).sum())
    num = abs(2 * sp - npairs) - 1
    z = float(num) / math.sqrt(float(npairs))
    out = pd.DataFrame({"n_days": [n], "n_pairs": [npairs],
                        "s_plus": [sp],
                        "z6": [_round6(np.array([z]))[0]]})
    for col in ("n_days", "n_pairs", "s_plus"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_COX_STUART = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d AS (
  SELECT CAST(round(c / 100.0) AS BIGINT) AS y,
         row_number() OVER (ORDER BY day) AS i
  FROM dc),
nn AS (SELECT count(*)::BIGINT AS n, ((count(*) + 1) // 2)::BIGINT AS h
       FROM d),
p AS (
  SELECT a.y AS ya, b.y AS yb
  FROM d a JOIN nn ON TRUE JOIN d b ON b.i = a.i + nn.h
  WHERE a.i <= nn.n - nn.h),
agg AS (
  SELECT sum(CASE WHEN yb != ya THEN 1 ELSE 0 END)::BIGINT AS npairs,
         sum(CASE WHEN yb > ya THEN 1 ELSE 0 END)::BIGINT AS sp
  FROM p)
SELECT nn.n AS n_days, agg.npairs AS n_pairs, agg.sp AS s_plus,
       round(CAST(abs(2 * agg.sp - agg.npairs) - 1 AS DOUBLE)
             / sqrt(CAST(agg.npairs AS DOUBLE)), 6) AS z6
FROM agg, nn
"""


# ---------------------------------------------------------------------------
# Theil's U2
# ---------------------------------------------------------------------------


def q_theil_u2_daily_revenue(sf_dir: str):
    """Theil's U2: seasonal-naive vs naive RMSE ratio on daily
    kilodollars (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    yv = np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)
    y = [int(v) for v in yv]
    n = len(y)
    sse7 = sum((y[t] - y[t - 7]) * (y[t] - y[t - 7]) for t in range(7, n))
    sse1 = sum((y[t] - y[t - 1]) * (y[t] - y[t - 1]) for t in range(7, n))
    u2 = math.sqrt(float(sse7) / float(sse1))
    out = pd.DataFrame({"n_days": [n], "n_terms": [n - 7],
                        "sse7": [sse7], "sse1": [sse1],
                        "u2_6": [_round6(np.array([u2]))[0]]})
    for col in ("n_days", "n_terms", "sse7", "sse1"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_THEIL_U2 = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d AS (
  SELECT CAST(round(c / 100000.0) AS BIGINT) AS y,
         row_number() OVER (ORDER BY day) AS i
  FROM dc),
lg AS (
  SELECT y, lag(y, 1) OVER (ORDER BY i) AS y1,
         lag(y, 7) OVER (ORDER BY i) AS y7
  FROM d),
agg AS (
  SELECT count(*)::BIGINT AS n_terms,
         sum((y - y7) * (y - y7))::BIGINT AS sse7,
         sum((y - y1) * (y - y1))::BIGINT AS sse1
  FROM lg WHERE y7 IS NOT NULL),
nn AS (SELECT count(*)::BIGINT AS n FROM d)
SELECT nn.n AS n_days, agg.n_terms, agg.sse7, agg.sse1,
       round(sqrt(CAST(agg.sse7 AS DOUBLE) / CAST(agg.sse1 AS DOUBLE)),
             6) AS u2_6
FROM agg, nn
"""


QUERIES55: dict[str, tuple] = {
    "cramer_von_mises_click_view": (q_cramer_von_mises_click_view,
                                    SQL_CVM),
    "cox_stuart_daily_revenue": (q_cox_stuart_daily_revenue,
                                 SQL_COX_STUART),
    "theil_u2_daily_revenue": (q_theil_u2_daily_revenue, SQL_THEIL_U2),
}
