"""Sixty-ninth oracle-query batch — daily-series structure trio:

- higuchi_fd_daily: Higuchi fractal dimension of the daily order-
  revenue cents series over scales k in {1,2,4}.  Per (k, m-offset)
  the curve length's integer core a = SUM |c_j - c_{j-k}| groups the
  lag-k absolute diffs by j mod k (SQL: lag(c,k) grouped by
  (rn-1)%k); each L_m(k) = a*(n-1)/(M*k*k) is quantized to 1e-2
  (identical float expression — a*(n-1) stays an exact int64,
  ~3e15 at sf0.1; the 1e-2 scale keeps the quantized term below
  2^52, where floor(x+.5) and DuckDB round() agree — at 1e-6 the
  term hit 6.8e15 and they diverged on the integral-float lattice)
  and integer-summed to Lq(k).  With x = ln(1/k) equally log-spaced
  at {1,2,4}, the OLS slope collapses to the closed two-point form
  FD = (ln(Lq1/1e2) - ln(Lq4/(4e2))) / (2 ln 2) — no float sum.
  Probe sf0.001 (1094 days): FD = 2.00776 (a noisy near-white
  series reads ~2, correct).
- chow_break_daily: Chow structural-break F at the midpoint of the
  daily revenue series, y ~ a + b*t per segment.  Per-segment raw
  moments (n, St, St2, Sy, Sty int64; Syy overflows int64 at sf0.1 —
  carried as HUGEINT and reported as VARCHAR) reduce exactly; each
  SSR = (A*C - B^2)/(n*A) with centered A = n*St2 - St^2,
  B = n*Sty - St*Sy, C = n*Syy - Sy^2 evaluated in HUGEINT
  (A*C ~ 7e32 at sf0.1, inside int128), and
  F = ((SSR_p - SSR_a - SSR_b)/2) / ((SSR_a + SSR_b)/(n-4))
  finalizes identical-expression.  Probe sf0.001: F = 6.823287.
- granger_click_purchase: lag-1 Granger causality of daily click
  counts on daily purchase counts: restricted y_t ~ c + y_{t-1} vs
  unrestricted y_t ~ c + y_{t-1} + x_{t-1};
  F = (SSR_r - SSR_u)*(n-3)/SSR_u.  SSR_u comes from the 2-feature
  Cramer solve entirely in exact ints (the ols_two_feature shape):
  SSR_u = (Cyy*det - (M22*V1^2 - 2*M12*V1*V2 + M11*V2^2))/(n*det).
  Probe sf0.001 (30 event days, click 2..12, purchase 2..15/day):
  det = 59_370_656, F = 1.874448 — non-degenerate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Higuchi fractal dimension
# ---------------------------------------------------------------------------


def q_higuchi_fd_daily(sf_dir: str):
    """Higuchi FD of daily revenue cents at k in {1,2,4} (docstring
    above)."""
    y = _daily_cents(sf_dir)["c"].to_numpy(np.int64)
    n = len(y)
    lqs: dict[int, int] = {}
    for k in (1, 2, 4):
        lq = 0
        for m in range(k):
            idx = np.arange(m, n, k)
            a = int(np.abs(np.diff(y[idx])).sum())
            mm = len(idx) - 1
            # scale 1e-2, NOT 1e-6: the quantized term must stay below
            # 2^52 (at 1e-6 it hit 6.8e15 and floor(x+.5) diverged from
            # DuckDB round on the integral-float lattice)
            lq += int(math.floor(a * (n - 1) * 100.0 / (mm * k * k) + 0.5))
        lqs[k] = lq
    fd = (math.log(float(lqs[1]) / 100.0)
          - math.log(float(lqs[4]) / 400.0)) / (2.0 * math.log(2.0))
    out = pd.DataFrame({"n_days": [n], "lq1": [lqs[1]], "lq2": [lqs[2]],
                        "lq4": [lqs[4]],
                        "fd6": [_round6(np.array([fd]))[0]]})
    for col in ("n_days", "lq1", "lq2", "lq4"):
        out[col] = out[col].astype(np.int64)
    return out


_HIG_DAILY = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
seq AS (
  SELECT c, row_number() OVER (ORDER BY day) AS rn FROM daily),
nd AS (SELECT count(*)::BIGINT AS n FROM daily)
"""


def _hig_k_sql(k: int) -> str:
    return f"""
lk{k} AS (
  SELECT sum(q)::BIGINT AS lq FROM (
    SELECT CAST(round(CAST(sum(d) * (n - 1) AS DOUBLE) * 100.0
                      / (count(*) * {k * k})) AS BIGINT) AS q
    FROM (
      SELECT abs(c - lag(c, {k}) OVER (ORDER BY rn)) AS d,
             (rn - 1) % {k} AS m, rn
      FROM seq) CROSS JOIN nd
    WHERE d IS NOT NULL GROUP BY m, n))"""


SQL_HIGUCHI = (_HIG_DAILY + ","
               + ",".join(_hig_k_sql(k) for k in (1, 2, 4)) + """
SELECT n AS n_days, lk1.lq AS lq1, lk2.lq AS lq2, lk4.lq AS lq4,
       round((ln(CAST(lk1.lq AS DOUBLE) / 100.0)
              - ln(CAST(lk4.lq AS DOUBLE) / 400.0))
             / (2.0 * ln(2.0)), 6) AS fd6
FROM lk1 CROSS JOIN lk2 CROSS JOIN lk4 CROSS JOIN nd
""")


# ---------------------------------------------------------------------------
# Chow structural break
# ---------------------------------------------------------------------------


def _seg_moments(t: np.ndarray, y: np.ndarray):
    tt = [int(v) for v in t]
    yy = [int(v) for v in y]
    return (len(tt), sum(tt), sum(v * v for v in tt), sum(yy),
            sum(v * v for v in yy), sum(a * b for a, b in zip(tt, yy)))


def _ssr(m) -> float:
    n, st, st2, sy, syy, sty = m
    a = n * st2 - st * st
    b = n * sty - st * sy
    c = n * syy - sy * sy
    return float(a * c - b * b) / float(n * a)


def q_chow_break_daily(sf_dir: str):
    """Midpoint Chow break test on daily revenue (docstring above)."""
    y = _daily_cents(sf_dir)["c"].to_numpy(np.int64)
    n = len(y)
    t = np.arange(n, dtype=np.int64)
    h = n // 2
    ma = _seg_moments(t[:h], y[:h])
    mb = _seg_moments(t[h:], y[h:])
    mp = tuple(a + b for a, b in zip(ma, mb))
    sa, sb, sp = _ssr(ma), _ssr(mb), _ssr(mp)
    f = ((sp - sa - sb) / 2.0) / ((sa + sb) / (n - 4.0))
    out = pd.DataFrame({
        "n_days": [n], "na": [ma[0]], "ta": [ma[1]], "tta": [ma[2]],
        "ya": [ma[3]], "tya": [ma[5]], "yya_a": [str(ma[4])],
        "nb": [mb[0]], "tb": [mb[1]], "ttb": [mb[2]], "yb": [mb[3]],
        "tyb": [mb[5]], "yya_b": [str(mb[4])],
        "f6": [_round6(np.array([f]))[0]]})
    for col in ("n_days", "na", "ta", "tta", "ya", "tya",
                "nb", "tb", "ttb", "yb", "tyb"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CHOW = _HIG_DAILY + """,
seg AS (
  SELECT (rn - 1)::BIGINT AS t, c, (rn <= n // 2) AS first_half
  FROM seq CROSS JOIN nd),
m AS (
  SELECT first_half, count(*)::BIGINT AS ns, sum(t)::BIGINT AS st,
         sum(t * t)::BIGINT AS st2, sum(c)::BIGINT AS sy,
         sum(c::HUGEINT * c) AS syy, sum(t * c)::BIGINT AS sty
  FROM seg GROUP BY 1),
w AS (
  SELECT
    max(CASE WHEN first_half THEN ns END) AS na,
    max(CASE WHEN first_half THEN st END) AS ta,
    max(CASE WHEN first_half THEN st2 END) AS tta,
    max(CASE WHEN first_half THEN sy END) AS ya,
    max(CASE WHEN first_half THEN syy END) AS yya_a,
    max(CASE WHEN first_half THEN sty END) AS tya,
    max(CASE WHEN NOT first_half THEN ns END) AS nb,
    max(CASE WHEN NOT first_half THEN st END) AS tb,
    max(CASE WHEN NOT first_half THEN st2 END) AS ttb,
    max(CASE WHEN NOT first_half THEN sy END) AS yb,
    max(CASE WHEN NOT first_half THEN syy END) AS yya_b,
    max(CASE WHEN NOT first_half THEN sty END) AS tyb
  FROM m),
s AS (
  SELECT w.*, n,
    CAST((na::HUGEINT * tta - ta::HUGEINT * ta)
           * (na::HUGEINT * yya_a - ya::HUGEINT * ya)
         - (na::HUGEINT * tya - ta::HUGEINT * ya)
           * (na::HUGEINT * tya - ta::HUGEINT * ya) AS DOUBLE)
      / CAST(na::HUGEINT * (na::HUGEINT * tta - ta::HUGEINT * ta)
             AS DOUBLE) AS sa,
    CAST((nb::HUGEINT * ttb - tb::HUGEINT * tb)
           * (nb::HUGEINT * yya_b - yb::HUGEINT * yb)
         - (nb::HUGEINT * tyb - tb::HUGEINT * yb)
           * (nb::HUGEINT * tyb - tb::HUGEINT * yb) AS DOUBLE)
      / CAST(nb::HUGEINT * (nb::HUGEINT * ttb - tb::HUGEINT * tb)
             AS DOUBLE) AS sb,
    CAST((n::HUGEINT * (tta + ttb) - (ta + tb)::HUGEINT * (ta + tb))
           * (n::HUGEINT * (yya_a + yya_b)
              - (ya + yb)::HUGEINT * (ya + yb))
         - (n::HUGEINT * (tya + tyb) - (ta + tb)::HUGEINT * (ya + yb))
           * (n::HUGEINT * (tya + tyb) - (ta + tb)::HUGEINT * (ya + yb))
         AS DOUBLE)
      / CAST(n::HUGEINT * (n::HUGEINT * (tta + ttb)
                           - (ta + tb)::HUGEINT * (ta + tb))
             AS DOUBLE) AS sp
  FROM w CROSS JOIN nd)
SELECT n AS n_days, na, ta, tta, ya, tya, CAST(yya_a AS VARCHAR) AS yya_a,
       nb, tb, ttb, yb, tyb, CAST(yya_b AS VARCHAR) AS yya_b,
       round(((sp - sa - sb) / 2.0) / ((sa + sb) / (n - 4.0)), 6) AS f6
FROM s
"""


# ---------------------------------------------------------------------------
# Granger causality (clicks -> purchases, lag 1)
# ---------------------------------------------------------------------------


def q_granger_click_purchase(sf_dir: str):
    """Lag-1 Granger F of daily clicks on daily purchases (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist())
        df = pd.DataFrame({"day": day,
                           "x": (et == "click").astype(np.int64),
                           "y": (et == "purchase").astype(np.int64)})
        g = df.groupby("day", sort=False).sum().reset_index()
        for c in ("x", "y"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    daily = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("x", alias_name="x"),
                                         Sum("y", alias_name="y"))
               .to_pandas().sort_values("day"))
    x = daily["x"].to_numpy(np.int64)
    y = daily["y"].to_numpy(np.int64)
    z1 = [int(v) for v in y[:-1]]
    z2 = [int(v) for v in x[:-1]]
    tg = [int(v) for v in y[1:]]
    n = len(tg)
    s1, s2, sy = sum(z1), sum(z2), sum(tg)
    s11 = sum(v * v for v in z1)
    s22 = sum(v * v for v in z2)
    s12 = sum(a * b for a, b in zip(z1, z2))
    s1y = sum(a * b for a, b in zip(z1, tg))
    s2y = sum(a * b for a, b in zip(z2, tg))
    syy = sum(v * v for v in tg)
    m11 = n * s11 - s1 * s1
    m12 = n * s12 - s1 * s2
    m22 = n * s22 - s2 * s2
    v1 = n * s1y - s1 * sy
    v2 = n * s2y - s2 * sy
    cyy = n * syy - sy * sy
    det = m11 * m22 - m12 * m12
    ssr_u = float(cyy * det - (m22 * v1 * v1 - 2 * m12 * v1 * v2
                               + m11 * v2 * v2)) / float(n * det)
    ssr_r = float(m11 * cyy - v1 * v1) / float(n * m11)
    f = ((ssr_r - ssr_u) * (n - 3.0)) / ssr_u
    out = pd.DataFrame({"n_pts": [n], "s1": [s1], "s2": [s2], "sy": [sy],
                        "s11": [s11], "s22": [s22], "s12": [s12],
                        "s1y": [s1y], "s2y": [s2y], "syy": [syy],
                        "f6": [_round6(np.array([f]))[0]]})
    for col in ("n_pts", "s1", "s2", "sy", "s11", "s22", "s12",
                "s1y", "s2y", "syy"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GRANGER = f"""
WITH daily AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'purchase')::INT)::BIGINT AS y
  FROM events GROUP BY 1),
lagd AS (
  SELECT y AS tg, lag(y) OVER (ORDER BY day) AS z1,
         lag(x) OVER (ORDER BY day) AS z2
  FROM daily),
mo AS (
  SELECT count(*)::BIGINT AS n, sum(z1)::BIGINT AS s1,
         sum(z2)::BIGINT AS s2, sum(tg)::BIGINT AS sy,
         sum(z1 * z1)::BIGINT AS s11, sum(z2 * z2)::BIGINT AS s22,
         sum(z1 * z2)::BIGINT AS s12, sum(z1 * tg)::BIGINT AS s1y,
         sum(z2 * tg)::BIGINT AS s2y, sum(tg * tg)::BIGINT AS syy
  FROM lagd WHERE z1 IS NOT NULL),
c AS (
  SELECT mo.*,
         n::HUGEINT * s11 - s1::HUGEINT * s1 AS m11,
         n::HUGEINT * s12 - s1::HUGEINT * s2 AS m12,
         n::HUGEINT * s22 - s2::HUGEINT * s2 AS m22,
         n::HUGEINT * s1y - s1::HUGEINT * sy AS v1,
         n::HUGEINT * s2y - s2::HUGEINT * sy AS v2,
         n::HUGEINT * syy - sy::HUGEINT * sy AS cyy
  FROM mo),
s AS (
  SELECT c.*,
         CAST(cyy * (m11 * m22 - m12 * m12)
              - (m22 * v1 * v1 - 2 * m12 * v1 * v2 + m11 * v2 * v2)
              AS DOUBLE)
           / CAST(n * (m11 * m22 - m12 * m12) AS DOUBLE) AS ssr_u,
         CAST(m11 * cyy - v1 * v1 AS DOUBLE)
           / CAST(n * m11 AS DOUBLE) AS ssr_r
  FROM c)
SELECT n AS n_pts, s1, s2, sy, s11, s22, s12, s1y, s2y, syy,
       round(((ssr_r - ssr_u) * (n - 3.0)) / ssr_u, 6) AS f6
FROM s
"""


QUERIES69: dict[str, tuple] = {
    "higuchi_fd_daily": (q_higuchi_fd_daily, SQL_HIGUCHI),
    "chow_break_daily": (q_chow_break_daily, SQL_CHOW),
    "granger_click_purchase": (q_granger_click_purchase, SQL_GRANGER),
}
