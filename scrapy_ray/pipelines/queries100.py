"""One-hundredth oracle-query batch — sequential change detection /
censoring-free GOF / cross-spectral coherence:

- page_hinkley_daily: the Page-Hinkley drift detector on daily
  revenue, run ENTIRELY in cleared integers: with S = total cents
  and n days, the deviation n*x_t - S - delta_n (delta_n = S // 20,
  i.e. delta = 5% of the mean) accumulates through
  P <- max(0, P + dev); alarms count days with P > lambda_n =
  10 * S (lambda = 10x the mean, cleared by the same n factor).
  Integer recursion -> recursive CTE (MATERIALIZED inputs).
- ad_exponential_gaps: Anderson-Darling GOF of the complete
  inter-purchase gaps against the MLE exponential — the censoring-
  aware KS complement: A2 = -n - SUM(2i-1)[ln F_(i) +
  ln(1-F_(n+1-i))]/n where per support cell ln F and ln(1-F) are
  constant, so the rank weights (2i-1) collapse to closed-form range
  sums and each cell term is ONE quantized integer (1e-6, magnitudes
  < 2^52); F = 1 - exp(-lambda g) identical-expression.
- cross_coherence_weekly: the squared coherence of daily revenue vs
  daily order count at the weekly frequency, built from the
  queries61 shared integer cos/sin weight literals: the four
  demeaned DFT components a,b,c,d are exact ints (~2e19, Python int
  / HUGEINT) and coherence = ((ac+bd)^2 + (bc-ad)^2)/((a^2+b^2)
  (c^2+d^2)) assembles in float from the exact factors (the
  squared cross-products exceed int128).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries26 import _gap_hist
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries61 import _PW

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Page-Hinkley
# ---------------------------------------------------------------------------


def q_page_hinkley_daily(sf_dir: str):
    """Integer Page-Hinkley drift detector (docstring above)."""
    from scrapy_ray.pipelines.queries47 import _daily_cents
    c = [int(v) for v in _daily_cents(sf_dir)["c"].to_numpy(np.int64)]
    n = len(c)
    s = sum(c)
    delta_n = s // 20
    lambda_n = 10 * s
    p = 0
    alarms = 0
    pmax = 0
    for v in c:
        p = max(0, p + (n * v - s - delta_n))
        if p > pmax:
            pmax = p
        if p > lambda_n:
            alarms += 1
    out = pd.DataFrame({"n_days": [n], "delta_n": [delta_n],
                        "lambda_n": [lambda_n], "alarm_days": [alarms],
                        "p_max": [pmax]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_PAGE_HINKLEY = f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
seq AS MATERIALIZED (
  SELECT c, row_number() OVER (ORDER BY day) AS t FROM daily),
p AS MATERIALIZED (
  SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
         sum(c)::BIGINT // 20 AS delta_n,
         10 * sum(c)::BIGINT AS lambda_n
  FROM daily),
r AS (
  SELECT 0::BIGINT AS t, 0::HUGEINT AS ph, 0::BIGINT AS alarms,
         0::HUGEINT AS pmax
  FROM p
  UNION ALL
  SELECT seq.t,
         greatest(0, r.ph + (p.n::HUGEINT * seq.c - p.s - p.delta_n))
           AS ph,
         r.alarms
           + (greatest(0, r.ph + (p.n::HUGEINT * seq.c - p.s
                                  - p.delta_n)) > p.lambda_n)::INT
           AS alarms,
         greatest(r.pmax,
                  greatest(0, r.ph + (p.n::HUGEINT * seq.c - p.s
                                      - p.delta_n))) AS pmax
  FROM r JOIN seq ON seq.t = r.t + 1 CROSS JOIN p)
SELECT (SELECT n FROM p) AS n_days, (SELECT delta_n FROM p) AS delta_n,
       (SELECT lambda_n FROM p) AS lambda_n, alarms AS alarm_days,
       pmax::BIGINT AS p_max
FROM r WHERE t = (SELECT n FROM p)
"""


# ---------------------------------------------------------------------------
# Anderson-Darling vs fitted exponential
# ---------------------------------------------------------------------------


def q_ad_exponential_gaps(sf_dir: str):
    """AD GOF of complete gaps vs the MLE exponential (docstring
    above)."""
    hist = _gap_hist(sf_dir)
    ev = hist[hist["d"] > 0]
    g = [int(v) for v in ev["gap"]]
    d = [int(v) for v in ev["d"]]
    n = sum(d)
    s = sum(a * b for a, b in zip(g, d))
    lam = float(n) / float(s)
    # per cell (ranks a..b share F): forward weight SUM_{i=a..b}(2i-1)
    # = b^2 - (a-1)^2 pairs with ln F; the reverse-indexed term
    # SUM_i (2i-1) ln(1-F_(n+1-i)) re-indexes to weight
    # SUM_{j=a..b}(2(n+1-j)-1) = d*(2n - 2b + d) pairing with ln(1-F)
    sq = 0
    a = 1
    for gv, dv in zip(g, d):
        b = a + dv - 1
        w_f = b * b - (a - 1) * (a - 1)
        w_r = dv * (2 * n - 2 * b + dv)
        f = 1.0 - math.exp(-(lam * gv))
        t1 = w_f * math.log(f) * 1000000.0
        t2 = w_r * math.log(1.0 - f) * 1000000.0
        sq += (int(math.floor(t1 + 0.5)) if t1 >= 0
               else int(math.ceil(t1 - 0.5)))
        sq += (int(math.floor(t2 + 0.5)) if t2 >= 0
               else int(math.ceil(t2 - 0.5)))
        a = b + 1
    a2 = -float(n) - float(sq) / 1e6 / float(n)
    out = pd.DataFrame({"n": [n], "gap_sum": [s], "sq": [sq],
                        "a2_6": [_round6(np.array([a2]))[0]]})
    for col in ("n", "gap_sum", "sq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_AD_EXP = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
gp AS (
  SELECT (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id))
          - epoch_us(ts)) // 1000000 AS gap
  FROM p),
h AS (SELECT gap, count(*)::BIGINT AS d FROM gp
      WHERE gap IS NOT NULL GROUP BY 1),
t AS (SELECT sum(d)::BIGINT AS n, sum(gap * d)::BIGINT AS s FROM h),
c AS (
  SELECT gap, d, sum(d) OVER (ORDER BY gap)::BIGINT AS b, n, s
  FROM h CROSS JOIN t),
w AS (
  SELECT (b * b - (b - d) * (b - d))::BIGINT AS w_f,
         (d * (2 * n - 2 * b + d))::BIGINT AS w_r,
         1.0 - exp(-((CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
                     * CAST(gap AS DOUBLE))) AS f,
         n
  FROM c),
q AS (
  SELECT sum(CAST(round(w_f * ln(f) * 1000000.0) AS BIGINT)
             + CAST(round(w_r * ln(1.0 - f) * 1000000.0) AS BIGINT))
           ::BIGINT AS sq,
         max(n) AS n
  FROM w)
SELECT n, (SELECT s FROM t) AS gap_sum, sq,
       round(-CAST(n AS DOUBLE)
             - CAST(sq AS DOUBLE) / 1e6 / CAST(n AS DOUBLE), 6) AS a2_6
FROM q
"""


# ---------------------------------------------------------------------------
# Weekly cross-coherence
# ---------------------------------------------------------------------------


def q_cross_coherence_weekly(sf_dir: str):
    """Squared coherence of daily revenue vs order count at p=7
    (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // _US_PER_DAY)
        c = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame({"day": day, "c": c, "k": np.int64(1)})
        g = df.groupby("day", sort=False).agg(
            c=("c", "sum"), k=("k", "sum")).reset_index()
        for col in ("c", "k"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    daily = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("c", alias_name="c"),
                                         Sum("k", alias_name="k"))
               .to_pandas().sort_values("day").reset_index(drop=True))
    x = (daily["c"].to_numpy(np.int64) // 100000).astype(object)
    y = daily["k"].to_numpy(np.int64).astype(object)
    n = len(x)
    idx = np.arange(n) % 7
    cw = np.array(_PW[7][0], object)[idx]
    sw = np.array(_PW[7][1], object)[idx]
    sx, sy = int(x.sum()), int(y.sum())
    wc, ws = int(cw.sum()), int(sw.sum())
    a = n * int((x * cw).sum()) - sx * wc
    b = n * int((x * sw).sum()) - sx * ws
    cc = n * int((y * cw).sum()) - sy * wc
    dd = n * int((y * sw).sum()) - sy * ws
    af, bf, cf, df_ = float(a), float(b), float(cc), float(dd)
    coh = (((af * cf + bf * df_) * (af * cf + bf * df_)
            + (bf * cf - af * df_) * (bf * cf - af * df_))
           / ((af * af + bf * bf) * (cf * cf + df_ * df_)))
    out = pd.DataFrame({"n_days": [n], "a_x": [str(a)], "b_x": [str(b)],
                        "a_y": [str(cc)], "b_y": [str(dd)],
                        "coh6": [_round6(np.array([coh]))[0]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


def _coh_sql() -> str:
    cw = _PW[7][0]
    sw = _PW[7][1]
    cw_case = " ".join(f"WHEN {r} THEN {cw[r]}" for r in range(7))
    sw_case = " ".join(f"WHEN {r} THEN {sw[r]}" for r in range(7))
    return f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c,
         count(*)::BIGINT AS k
  FROM orders GROUP BY 1),
seq AS (
  SELECT c // 100000 AS x, k AS y,
         (row_number() OVER (ORDER BY day) - 1) % 7 AS r
  FROM daily),
ww AS (
  SELECT x, y,
         CASE r {cw_case} END::BIGINT AS cw,
         CASE r {sw_case} END::BIGINT AS sw
  FROM seq),
m AS (
  SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
         sum(y)::HUGEINT AS sy, sum(cw)::HUGEINT AS wc,
         sum(sw)::HUGEINT AS ws,
         sum(x::HUGEINT * cw) AS xc, sum(x::HUGEINT * sw) AS xs,
         sum(y::HUGEINT * cw) AS yc, sum(y::HUGEINT * sw) AS ys
  FROM ww),
f AS (
  SELECT n,
         n * xc - sx * wc AS a, n * xs - sx * ws AS b,
         n * yc - sy * wc AS cc, n * ys - sy * ws AS dd
  FROM m),
g AS (
  SELECT n, a, b, cc, dd,
         CAST(a AS DOUBLE) AS af, CAST(b AS DOUBLE) AS bf,
         CAST(cc AS DOUBLE) AS cf, CAST(dd AS DOUBLE) AS df_
  FROM f)
SELECT n::BIGINT AS n_days, CAST(a AS VARCHAR) AS a_x,
       CAST(b AS VARCHAR) AS b_x, CAST(cc AS VARCHAR) AS a_y,
       CAST(dd AS VARCHAR) AS b_y,
       round(((af * cf + bf * df_) * (af * cf + bf * df_)
              + (bf * cf - af * df_) * (bf * cf - af * df_))
             / ((af * af + bf * bf) * (cf * cf + df_ * df_)), 6)
         AS coh6
FROM g
"""


SQL_CROSS_COHERENCE = _coh_sql()


QUERIES100: dict[str, tuple] = {
    "page_hinkley_daily": (q_page_hinkley_daily, SQL_PAGE_HINKLEY),
    "ad_exponential_gaps": (q_ad_exponential_gaps, SQL_AD_EXP),
    "cross_coherence_weekly": (q_cross_coherence_weekly,
                               SQL_CROSS_COHERENCE),
}
