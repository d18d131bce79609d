"""Eighty-third oracle-query batch — parametric survival fit / EDA
letter values / regression influence:

- weibull_fit_gaps: Weibull (shape, scale) fit to the complete
  inter-purchase gaps by median-rank regression: with plotting
  positions F_i = cum_i/(n+1) over the gap histogram support, the
  coordinates x = ln g and y = ln(-ln(1-F)) are quantized ONCE to
  1e-6 ints, and the count-weighted OLS runs entirely on exact
  integer moments (Sxx ~ 7.6e18 at sf0.1 — Python int / HUGEINT);
  shape = slope (exact-int ratio -> float), scale =
  exp(-(intercept)/slope) identical-expression.
- letter_values_order_value: Tukey letter-value summary of whole-
  dollar order totals — median M, fourths F, eighths E at classic
  depths (d_F = (floor(d_M)+1)/2, ...), carried as DOUBLED exact
  integers (half-integer depths average two order statistics);
  mid-F (x4), trimean (x8) and fourth-spread (x2) stay integers,
  with /2,/4,/8 float views.  All order statistics are rank lookups
  on the bounded dollar histogram both sides.
- cooks_distance_daily: top-5 influential days of the daily-revenue
  OLS trend: leverage h_i = 1/n + (n t_i - St)^2/(n A) and residual
  eq_i (the queries75 exact $100-quantized residuals) give
  D_i = eq^2 h / (2 s^2 (1-h)^2); each D is 1e-9-quantized so the
  top-5 ordering is an exact-int sort (tiebreak t).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries26 import _gap_hist
from scrapy_ray.pipelines.queries47 import _daily_cents
from scrapy_ray.pipelines.queries75 import _RESID_SQL, _resid_units

_US_PER_DAY = 86_400_000_000


def _rha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


# ---------------------------------------------------------------------------
# Weibull median-rank regression
# ---------------------------------------------------------------------------


def q_weibull_fit_gaps(sf_dir: str):
    """Weibull fit to complete gaps via quantized-coordinate exact OLS
    (docstring above)."""
    hist = _gap_hist(sf_dir)
    ev = hist[(hist["d"] > 0) & (hist["gap"] > 0)]
    g = ev["gap"].to_numpy(np.int64)
    d = [int(v) for v in ev["d"].to_numpy(np.int64)]
    cum = np.cumsum(ev["d"].to_numpy(np.int64))
    n = int(cum[-1])
    qx = [_rha(math.log(float(int(gv))) * 1e6) for gv in g]
    qy = [_rha(math.log(-math.log(1.0 - int(cv) / (n + 1.0))) * 1e6)
          for cv in cum]
    nw = sum(d)
    sx = sum(a * b for a, b in zip(d, qx))
    sy = sum(a * b for a, b in zip(d, qy))
    sxx = sum(a * b * b for a, b in zip(d, qx))
    sxy = sum(a * b * c for a, b, c in zip(d, qx, qy))
    slope = float(nw * sxy - sx * sy) / float(nw * sxx - sx * sx)
    intercept = (float(sy) - slope * float(sx)) / float(nw) / 1000000.0
    scale = math.exp(-(intercept) / slope)
    out = pd.DataFrame({"n": [nw], "sx": [sx], "sy": [sy],
                        "shape6": [_round6(np.array([slope]))[0]],
                        "scale6": [_round6(np.array([scale]))[0]]})
    for col in ("n", "sx", "sy"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_WEIBULL = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
gp AS (
  SELECT (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id))
          - epoch_us(ts)) // 1000000 AS gap
  FROM p),
h AS (SELECT gap, count(*)::BIGINT AS d FROM gp
      WHERE gap IS NOT NULL AND gap > 0 GROUP BY 1),
t AS (SELECT sum(d)::BIGINT AS n FROM h),
c AS (
  SELECT gap, d, sum(d) OVER (ORDER BY gap)::BIGINT AS cum, n
  FROM h CROSS JOIN t),
q AS (
  SELECT d,
         CAST(round(ln(CAST(gap AS DOUBLE)) * 1000000) AS BIGINT) AS qx,
         CAST(round(ln(-ln(1.0 - cum / (n + 1.0))) * 1000000) AS BIGINT)
           AS qy
  FROM c),
m AS (
  SELECT sum(d)::BIGINT AS nw, sum(d * qx)::BIGINT AS sx,
         sum(d * qy)::BIGINT AS sy,
         sum(d::HUGEINT * qx * qx) AS sxx,
         sum(d::HUGEINT * qx * qy) AS sxy
  FROM q),
f AS (
  SELECT nw, sx, sy,
         CAST(nw::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
           / CAST(nw::HUGEINT * sxx - sx::HUGEINT * sx AS DOUBLE)
           AS slope
  FROM m)
SELECT nw AS n, sx, sy,
       round(slope, 6) AS shape6,
       round(exp(-((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                   / CAST(nw AS DOUBLE) / 1000000.0) / slope), 6)
         AS scale6
FROM f
"""


# ---------------------------------------------------------------------------
# Letter values
# ---------------------------------------------------------------------------


def q_letter_values_order_value(sf_dir: str):
    """Tukey letter values of whole-dollar order totals as doubled
    exact ints (docstring above)."""
    from scrapy_ray.pipelines.queries import _pq
    from scrapy_ray.pipelines.queries47 import _strip
    import pyarrow as pa
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        d = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        df = pd.DataFrame({"d": d})
        g = df.groupby("d", sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("d").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("d"))
    dv = hist["d"].to_numpy(np.int64)
    cum = np.cumsum(hist["cnt"].to_numpy(np.int64))
    n = int(cum[-1])

    def elem(r: int) -> int:
        return int(dv[np.searchsorted(cum, r)])

    m1, m2r = (n + 1) // 2, (n + 2) // 2
    fd1, fd2 = (m1 + 1) // 2, (m1 + 2) // 2
    ed1, ed2 = (fd1 + 1) // 2, (fd1 + 2) // 2
    med2 = elem(m1) + elem(m2r)
    fl2 = elem(fd1) + elem(fd2)
    fu2 = elem(n + 1 - fd1) + elem(n + 1 - fd2)
    el2 = elem(ed1) + elem(ed2)
    eu2 = elem(n + 1 - ed1) + elem(n + 1 - ed2)
    midf4 = fl2 + fu2
    trimean8 = fl2 + 2 * med2 + fu2
    spread2 = fu2 - fl2
    out = pd.DataFrame({
        "n": [n], "med2": [med2], "fl2": [fl2], "fu2": [fu2],
        "el2": [el2], "eu2": [eu2],
        "median6": [_round6(np.array([med2 / 2.0]))[0]],
        "midf6": [_round6(np.array([midf4 / 4.0]))[0]],
        "trimean6": [_round6(np.array([trimean8 / 8.0]))[0]],
        "fspread6": [_round6(np.array([spread2 / 2.0]))[0]]})
    for col in ("n", "med2", "fl2", "fu2", "el2", "eu2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LETTER_VALUES = """
WITH b AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS d FROM orders),
h AS (SELECT d, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
c AS (SELECT d, sum(cnt) OVER (ORDER BY d)::BIGINT AS cum FROM h),
t AS (SELECT sum(cnt)::BIGINT AS n FROM h),
dep AS (
  SELECT n, (n + 1) // 2 AS m1, (n + 2) // 2 AS m2r,
         ((n + 1) // 2 + 1) // 2 AS fd1, ((n + 1) // 2 + 2) // 2 AS fd2,
         (((n + 1) // 2 + 1) // 2 + 1) // 2 AS ed1,
         (((n + 1) // 2 + 1) // 2 + 2) // 2 AS ed2
  FROM t),
lv AS (
  SELECT n,
    (SELECT min(d) FROM c WHERE cum >= m1)
      + (SELECT min(d) FROM c WHERE cum >= m2r) AS med2,
    (SELECT min(d) FROM c WHERE cum >= fd1)
      + (SELECT min(d) FROM c WHERE cum >= fd2) AS fl2,
    (SELECT min(d) FROM c WHERE cum >= n + 1 - fd1)
      + (SELECT min(d) FROM c WHERE cum >= n + 1 - fd2) AS fu2,
    (SELECT min(d) FROM c WHERE cum >= ed1)
      + (SELECT min(d) FROM c WHERE cum >= ed2) AS el2,
    (SELECT min(d) FROM c WHERE cum >= n + 1 - ed1)
      + (SELECT min(d) FROM c WHERE cum >= n + 1 - ed2) AS eu2
  FROM dep)
SELECT n, med2::BIGINT AS med2, fl2::BIGINT AS fl2, fu2::BIGINT AS fu2,
       el2::BIGINT AS el2, eu2::BIGINT AS eu2,
       round(med2 / 2.0, 6) AS median6,
       round((fl2 + fu2) / 4.0, 6) AS midf6,
       round((fl2 + 2 * med2 + fu2) / 8.0, 6) AS trimean6,
       round((fu2 - fl2) / 2.0, 6) AS fspread6
FROM lv
"""


# ---------------------------------------------------------------------------
# Cook's distance
# ---------------------------------------------------------------------------


def q_cooks_distance_daily(sf_dir: str):
    """Top-5 influential days by Cook's distance of the daily trend
    fit (docstring above)."""
    n, t, eq = _resid_units(sf_dir)
    st = sum(t)
    st2 = sum(v * v for v in t)
    a = n * st2 - st * st
    s2 = float(sum(v * v for v in eq)) / (n - 2.0)
    rows = []
    for ti, e in zip(t, eq):
        h = 1.0 / n + float((n * ti - st) ** 2) / float(n * a)
        di = float(e * e) * h / (2.0 * s2 * ((1.0 - h) * (1.0 - h)))
        rows.append((ti, e, _rha(di * 1e9)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    out = pd.DataFrame(rows[:5], columns=["t", "eq", "dq"])
    out["d6"] = _round6(out["dq"].to_numpy(np.float64) / 1e9)
    for col in ("t", "eq", "dq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_COOKS = _RESID_SQL + """,
mo AS (
  SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS st,
         sum(t * t)::BIGINT AS st2, sum(eq::HUGEINT * eq) AS se2
  FROM eqt),
f AS (
  SELECT t, eq, n, st,
         n::HUGEINT * st2 - st::HUGEINT * st AS a,
         CAST(se2 AS DOUBLE) / (n - 2.0) AS s2
  FROM eqt CROSS JOIN mo),
d AS (
  SELECT t, eq,
         CAST(round((CAST(eq::HUGEINT * eq AS DOUBLE)
                     * (1.0 / n + CAST((n * t - st)::HUGEINT
                                       * (n * t - st) AS DOUBLE)
                                  / CAST(n * a AS DOUBLE))
                     / (2.0 * s2
                        * ((1.0 - (1.0 / n
                                   + CAST((n * t - st)::HUGEINT
                                          * (n * t - st) AS DOUBLE)
                                     / CAST(n * a AS DOUBLE)))
                           * (1.0 - (1.0 / n
                                     + CAST((n * t - st)::HUGEINT
                                            * (n * t - st) AS DOUBLE)
                                       / CAST(n * a AS DOUBLE))))))
                    * 1000000000.0) AS BIGINT) AS dq
  FROM f)
SELECT t::BIGINT AS t, eq, dq,
       round(CAST(dq AS DOUBLE) / 1000000000.0, 6) AS d6
FROM d ORDER BY dq DESC, t LIMIT 5
"""


QUERIES83: dict[str, tuple] = {
    "weibull_fit_gaps": (q_weibull_fit_gaps, SQL_WEIBULL),
    "letter_values_order_value": (q_letter_values_order_value,
                                  SQL_LETTER_VALUES),
    "cooks_distance_daily": (q_cooks_distance_daily, SQL_COOKS),
}
