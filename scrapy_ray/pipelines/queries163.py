"""One-hundred-sixty-third oracle-query batch — the GAUSSIAN
ELIMINATION REPLAY device (no-pivot forward elimination + back
substitution over a flattened augmented LIST, one recursion level per
pivot; the driver replays the identical float operation order), used
for three classical fits no 2×2/3×3 adjugate could reach:

- trading_day_regression: monthly revenue (dollars) on [1, #Mondays,
  #Fridays, #weekend days] of each calendar month — the X'X / X'y
  normal equations are EXACT integers (calendar counts), the 4×4
  solve is the gauss replay; reports the four coefficients.
- cubic_spline_daily: the natural cubic spline through the 6 knots
  (days 1, 7, 13, 19, 25, n) of the daily dollar series — the
  interior second-derivative system is 4×4 with exact integer
  knot values; the spline is evaluated at probe days 10 and 22.
- hp_filter_daily: the Hodrick-Prescott trend (λ = 1600) of the
  30-day series — the full (I + λD'D) pentadiagonal 30×30 system
  solved by the same replay (29 elimination levels over a
  930-element augmented list); trend reported at days 5/15/25.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6


def _gauss_solve(a: list[list[float]], b: list[float]) -> list[float]:
    """No-pivot Gaussian elimination, EXACT float-op order mirrored by
    _gauss_sql: aug[r][c] -= aug[r][p]/aug[p][p]*aug[p][c]."""
    k = len(b)
    aug = [row[:] + [bv] for row, bv in zip(a, b)]
    for p in range(k - 1):
        for r in range(p + 1, k):
            f = aug[r][p] / aug[p][p]
            for c in range(k + 1):
                aug[r][c] = aug[r][c] - f * aug[p][c]
    xs: list[float] = []
    for r in range(k, 0, -1):
        dot = 0.0
        for c in range(r + 1, k + 1):
            dot = dot + aug[r - 1][c - 1] * xs[c - r - 1]
        xs.insert(0, (aug[r - 1][k] - dot) / aug[r - 1][r - 1])
    return xs


def _gauss_sql(k: int, sys_cte: str) -> str:
    """SQL for the same elimination: `{sys_cte}` must provide a
    flattened row-major k×(k+1) DOUBLE list column `aug`."""
    w = k + 1
    return f"""
elim AS (
  SELECT 0::BIGINT AS p, aug FROM {sys_cte}
  UNION ALL
  SELECT p + 1,
         [CASE WHEN (z - 1) // {w} > p
               THEN aug[z]
                    - aug[((z - 1) // {w}) * {w} + p + 1]
                      / aug[p * {w} + p + 1]
                      * aug[p * {w} + ((z - 1) % {w}) + 1]
               ELSE aug[z] END
          FOR z IN range(1, {k * w} + 1)]
  FROM elim WHERE p < {k - 1}),
fin AS (SELECT aug FROM elim WHERE p = {k - 1}),
back AS (
  SELECT {k + 1}::BIGINT AS r, []::DOUBLE[] AS xs, aug FROM fin
  UNION ALL
  SELECT r - 1,
         list_prepend(
           (aug[(r - 2) * {w} + {w}]
            - coalesce(list_aggregate(
                [aug[(r - 2) * {w} + c] * xs[c - r + 1]
                 FOR c IN range(r, {k} + 1)], 'sum'), 0.0))
           / aug[(r - 2) * {w} + r - 1],
           xs),
         aug
  FROM back WHERE r > 1),
sol AS (SELECT xs FROM back WHERE r = 1)"""


# ---------------------------------------------------------------------------
# Trading-day regression
# ---------------------------------------------------------------------------

_TD_FEATS = 4


def _month_day_counts(year: int, month: int) -> tuple[int, int, int]:
    """(#Mondays, #Fridays, #weekend days) of a calendar month."""
    import calendar

    mon = fri = we = 0
    for d in range(1, calendar.monthrange(year, month)[1] + 1):
        wd = calendar.weekday(year, month, d)
        mon += wd == 0
        fri += wd == 4
        we += wd >= 5
    return mon, fri, we


def q_trading_day_regression(sf_dir: str):
    """Monthly revenue on calendar-day composition (docstring)."""
    per = _pq(sf_dir, "orders",
              columns=["o_orderdate", "o_totalprice"])

    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from scrapy_ray.pipelines.queries47 import _strip

    def mpart(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = pc.month(t["o_orderdate"]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        # sum CENTS per month; floor to dollars ONCE after the global
        # aggregate (per-order flooring diverges from the oracle)
        g = pd.DataFrame({"ym": y * 100 + m, "c": c}) \
            .groupby("ym", sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    agg = (per.map_batches(mpart, batch_format="pyarrow")
              .groupby("ym").aggregate(Sum("c", alias_name="c"))
              .to_pandas().sort_values("ym").reset_index(drop=True))
    rows = []
    for _, r_ in agg.iterrows():
        ym = int(r_["ym"])
        mon, fri, we = _month_day_counts(ym // 100, ym % 100)
        rows.append((1, mon, fri, we, int(r_["c"]) // 100))
    k = _TD_FEATS
    xtx = [[sum(r_[i] * r_[j] for r_ in rows) for j in range(k)]
           for i in range(k)]
    xty = [sum(r_[i] * r_[4] for r_ in rows) for i in range(k)]
    beta = _gauss_solve([[float(v) for v in row] for row in xtx],
                        [float(v) for v in xty])
    r6 = _round6(np.array(beta))
    out = pd.DataFrame({"n_months": [len(rows)],
                        "b_intercept6": [r6[0]], "b_mon6": [r6[1]],
                        "b_fri6": [r6[2]], "b_weekend6": [r6[3]]})
    out["n_months"] = out["n_months"].astype(np.int64)
    return out


SQL_TRADING_DAY = f"""
WITH RECURSIVE mo AS (
  SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS c
  FROM orders GROUP BY 1, 2),
feat AS (
  SELECT mo.y, mo.m, mo.c,
    (SELECT count(*) FROM
       (SELECT unnest(generate_series(
          make_date(CAST(mo.y AS INT), CAST(mo.m AS INT), 1),
          last_day(make_date(CAST(mo.y AS INT), CAST(mo.m AS INT),
                             1)),
          INTERVAL 1 DAY)) AS d)
     WHERE isodow(d) = 1) AS mon,
    (SELECT count(*) FROM
       (SELECT unnest(generate_series(
          make_date(CAST(mo.y AS INT), CAST(mo.m AS INT), 1),
          last_day(make_date(CAST(mo.y AS INT), CAST(mo.m AS INT),
                             1)),
          INTERVAL 1 DAY)) AS d)
     WHERE isodow(d) = 5) AS fri,
    (SELECT count(*) FROM
       (SELECT unnest(generate_series(
          make_date(CAST(mo.y AS INT), CAST(mo.m AS INT), 1),
          last_day(make_date(CAST(mo.y AS INT), CAST(mo.m AS INT),
                             1)),
          INTERVAL 1 DAY)) AS d)
     WHERE isodow(d) >= 6) AS we
  FROM mo),
sys AS (
  SELECT [
    CAST(count(*) AS DOUBLE), CAST(sum(mon) AS DOUBLE),
    CAST(sum(fri) AS DOUBLE), CAST(sum(we) AS DOUBLE),
    CAST(sum(c) AS DOUBLE),
    CAST(sum(mon) AS DOUBLE), CAST(sum(mon * mon) AS DOUBLE),
    CAST(sum(mon * fri) AS DOUBLE), CAST(sum(mon * we) AS DOUBLE),
    CAST(sum(mon * c) AS DOUBLE),
    CAST(sum(fri) AS DOUBLE), CAST(sum(mon * fri) AS DOUBLE),
    CAST(sum(fri * fri) AS DOUBLE), CAST(sum(fri * we) AS DOUBLE),
    CAST(sum(fri * c) AS DOUBLE),
    CAST(sum(we) AS DOUBLE), CAST(sum(mon * we) AS DOUBLE),
    CAST(sum(fri * we) AS DOUBLE), CAST(sum(we * we) AS DOUBLE),
    CAST(sum(we * c) AS DOUBLE)] AS aug,
    count(*)::BIGINT AS nm
  FROM feat),
{_gauss_sql(4, "sys")}
SELECT (SELECT nm FROM sys) AS n_months,
       round(xs[1], 6) AS b_intercept6, round(xs[2], 6) AS b_mon6,
       round(xs[3], 6) AS b_fri6, round(xs[4], 6) AS b_weekend6
FROM sol
"""


# ---------------------------------------------------------------------------
# Natural cubic spline
# ---------------------------------------------------------------------------

_SP_PROBES = (10, 22)


def q_cubic_spline_daily(sf_dir: str):
    """Natural cubic spline through 6 knots of daily dollars."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    yv = [int(v) // 100 for v in _daily_cents(sf_dir).tolist()]
    n = len(yv)
    kx = [1, 7, 13, 19, 25, n]
    ky = [float(yv[d - 1]) for d in kx]
    nk = len(kx)
    h = [float(kx[i + 1] - kx[i]) for i in range(nk - 1)]
    # interior system for second derivatives M[1..4] (M0 = M5 = 0)
    a = [[0.0] * (nk - 2) for _ in range(nk - 2)]
    b = [0.0] * (nk - 2)
    for i in range(1, nk - 1):
        a[i - 1][i - 1] = 2.0 * (h[i - 1] + h[i])
        if i - 2 >= 0:
            a[i - 1][i - 2] = h[i - 1]
        if i <= nk - 3:
            a[i - 1][i] = h[i]
        b[i - 1] = 6.0 * ((ky[i + 1] - ky[i]) / h[i]
                          - (ky[i] - ky[i - 1]) / h[i - 1])
    mi = _gauss_solve(a, b)
    m = [0.0] + mi + [0.0]
    fits = []
    for p in _SP_PROBES:
        i = max(j for j in range(nk - 1) if kx[j] <= p)
        t1 = float(kx[i + 1] - p)
        t2 = float(p - kx[i])
        hi = h[i]
        val = (m[i] * t1 * t1 * t1 / (6.0 * hi)
               + m[i + 1] * t2 * t2 * t2 / (6.0 * hi)
               + (ky[i] / hi - m[i] * hi / 6.0) * t1
               + (ky[i + 1] / hi - m[i + 1] * hi / 6.0) * t2)
        fits.append(val)
    r6 = _round6(np.array(fits))
    out = pd.DataFrame({"n_days": [n], "fit10_6": [r6[0]],
                        "fit22_6": [r6[1]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_CUBIC_SPLINE = f"""
WITH RECURSIVE dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT)) // 100 AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
nn AS (SELECT max(t)::BIGINT AS n FROM seq),
kx AS (
  SELECT i, CASE i WHEN 1 THEN 1 WHEN 2 THEN 7 WHEN 3 THEN 13
                   WHEN 4 THEN 19 WHEN 5 THEN 25
                   ELSE (SELECT n FROM nn) END AS x
  FROM (SELECT unnest(range(1, 7)) AS i)),
kn AS (
  SELECT kx.i, kx.x, CAST(seq.y AS DOUBLE) AS y
  FROM kx JOIN seq ON seq.t = kx.x),
hh AS (
  SELECT a.i, CAST(b.x - a.x AS DOUBLE) AS h,
         a.x AS x0, b.x AS x1, a.y AS y0, b.y AS y1
  FROM kn a JOIN kn b ON b.i = a.i + 1),
sys AS (
  SELECT [
    2.0 * (h1.h + h2.h), h2.h, 0.0, 0.0,
    6.0 * ((k3.y - k2.y) / h2.h - (k2.y - k1.y) / h1.h),
    h2.h, 2.0 * (h2.h + h3.h), h3.h, 0.0,
    6.0 * ((k4.y - k3.y) / h3.h - (k3.y - k2.y) / h2.h),
    0.0, h3.h, 2.0 * (h3.h + h4.h), h4.h,
    6.0 * ((k5.y - k4.y) / h4.h - (k4.y - k3.y) / h3.h),
    0.0, 0.0, h4.h, 2.0 * (h4.h + h5.h),
    6.0 * ((k6.y - k5.y) / h5.h - (k5.y - k4.y) / h4.h)] AS aug
  FROM (SELECT h FROM hh WHERE i = 1) h1,
       (SELECT h FROM hh WHERE i = 2) h2,
       (SELECT h FROM hh WHERE i = 3) h3,
       (SELECT h FROM hh WHERE i = 4) h4,
       (SELECT h FROM hh WHERE i = 5) h5,
       (SELECT y FROM kn WHERE i = 1) k1,
       (SELECT y FROM kn WHERE i = 2) k2,
       (SELECT y FROM kn WHERE i = 3) k3,
       (SELECT y FROM kn WHERE i = 4) k4,
       (SELECT y FROM kn WHERE i = 5) k5,
       (SELECT y FROM kn WHERE i = 6) k6),
{_gauss_sql(4, "sys")},
mm AS (
  SELECT [0.0] || xs || [0.0] AS m FROM sol),
ev AS (
  SELECT p.p,
         (SELECT max(i) FROM kx WHERE x <= p.p) AS seg
  FROM (SELECT unnest([{_SP_PROBES[0]}, {_SP_PROBES[1]}]) AS p) p),
fit AS (
  SELECT ev.p,
         mm.m[ev.seg] * (hh.x1 - ev.p) * (hh.x1 - ev.p)
           * (hh.x1 - ev.p) / (6.0 * hh.h)
         + mm.m[ev.seg + 1] * (ev.p - hh.x0) * (ev.p - hh.x0)
           * (ev.p - hh.x0) / (6.0 * hh.h)
         + (hh.y0 / hh.h - mm.m[ev.seg] * hh.h / 6.0)
           * (hh.x1 - ev.p)
         + (hh.y1 / hh.h - mm.m[ev.seg + 1] * hh.h / 6.0)
           * (ev.p - hh.x0) AS v
  FROM ev JOIN hh ON hh.i = ev.seg CROSS JOIN mm)
SELECT (SELECT n FROM nn) AS n_days,
       round((SELECT v FROM fit WHERE p = {_SP_PROBES[0]}), 6)
         AS fit10_6,
       round((SELECT v FROM fit WHERE p = {_SP_PROBES[1]}), 6)
         AS fit22_6
FROM nn
"""


# ---------------------------------------------------------------------------
# Hodrick-Prescott filter
# ---------------------------------------------------------------------------

_HP_LAMBDA = 1600.0
_HP_PROBES = (5, 15, 25)


def q_hp_filter_daily(sf_dir: str):
    """HP trend (λ=1600) of the daily dollar series (docstring)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    yv = [float(int(v) // 100) for v in _daily_cents(sf_dir).tolist()]
    n = len(yv)
    # A = I + λ D'D (D = second difference operator, (n-2)×n)
    a = [[0.0] * n for _ in range(n)]
    for i in range(n):
        a[i][i] = 1.0
    lam = _HP_LAMBDA
    for r in range(n - 2):
        rows = (r, r + 1, r + 2)
        coef = (1.0, -2.0, 1.0)
        for i, ci in zip(rows, coef):
            for j, cj in zip(rows, coef):
                a[i][j] = a[i][j] + lam * ci * cj
    x = _gauss_solve(a, yv)
    r6 = _round6(np.array([x[p - 1] for p in _HP_PROBES]))
    out = pd.DataFrame({"n_days": [n], "trend5_6": [r6[0]],
                        "trend15_6": [r6[1]], "trend25_6": [r6[2]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


def _hp_sql() -> str:
    n = 30
    w = n + 1
    # build the flattened augmented matrix as SQL expressions over the
    # per-day value list ys (aug entries are literal combinations)
    entries = []
    lam = _HP_LAMBDA
    coef = {(0, 0): 1.0, (0, 1): -2.0, (0, 2): 1.0}
    for i in range(n):
        row = [0.0] * n
        row[i] = 1.0
        for r in range(max(0, i - 2), min(n - 2, i + 1)):
            ci = (1.0, -2.0, 1.0)[i - r]
            for dj in range(3):
                row[r + dj] += lam * ci * (1.0, -2.0, 1.0)[dj]
        for j in range(n):
            entries.append(repr(row[j]))
        entries.append(f"ys[{i + 1}]")
    aug = ", ".join(entries)
    return f"""
WITH RECURSIVE dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT)) // 100 AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
ylist AS (SELECT list(CAST(y AS DOUBLE) ORDER BY t) AS ys FROM seq),
sys AS (SELECT [{aug}] AS aug FROM ylist),
{_gauss_sql(n, "sys")}
SELECT (SELECT count(*) FROM seq)::BIGINT AS n_days,
       round(xs[{_HP_PROBES[0]}], 6) AS trend5_6,
       round(xs[{_HP_PROBES[1]}], 6) AS trend15_6,
       round(xs[{_HP_PROBES[2]}], 6) AS trend25_6
FROM sol
"""


SQL_HP_FILTER = _hp_sql()


QUERIES163: dict[str, tuple] = {
    "trading_day_regression": (q_trading_day_regression,
                               SQL_TRADING_DAY),
    "cubic_spline_daily": (q_cubic_spline_daily, SQL_CUBIC_SPLINE),
    "hp_filter_daily": (q_hp_filter_daily, SQL_HP_FILTER),
}
