"""One-hundred-twenty-third oracle-query batch — long-memory /
stationarity / extreme-value diagnostics of daily order revenue (the
queries47 _daily_cents device):

- kpss_daily: KPSS level-stationarity statistic with a Bartlett l=7
  long-run variance. Demeaned values clear to exact integers
  e_t = n·x_t − S; partial sums to P_t = n·C_t − t·S; the statistic
  collapses to eta = ΣP_t² / (n·B) with ΣP_t² an exact (HUGEINT) sum
  and B the weighted autocovariance combination written as ONE
  explicit left-associated float expression (exact binary weights
  1 − k/8) on exact integer G_k (the diebold_mariano device).
- dfa_daily: detrended fluctuation analysis at window sizes
  {4,8,16,32} on the $1000-quantized profile P_t = n·C_t − t·S.
  Per-window linear-detrend residual SS clears to
  ((s·Syy − Sy²)·c − (s·Sxy − Sx·Sy)²) / (s·c) with
  c = s·Sxx − Sx² — one double division per window, 1e-6-quantized
  before the exact per-size sum; alpha is the explicit 4-point
  ln-ln OLS slope (identical parenthesization both sides).
- gev_lmoments_weekly: GEV shape via L-moments of weekly revenue
  maxima (Hosking): B0/B1/B2 are exact order-statistic sums, the
  L-moment ratios and kappa = 7.8590c + 2.9554c² with
  c = 2/(3+t3) − ln2/ln3 finalize through identical float
  expressions (no Γ needed for the shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _US_PER_DAY, _daily_cents


def _rint(x: float) -> int:
    """round-half-away-from-zero to an exact Python int."""
    return int(np.sign(x) * np.floor(np.abs(x) + 0.5))


_KPSS_L = 7


# ---------------------------------------------------------------------------
# KPSS
# ---------------------------------------------------------------------------


def q_kpss_daily(sf_dir: str):
    """KPSS level-stationarity eta with Bartlett l=7 (docstring)."""
    cells = _daily_cents(sf_dir)
    x = [int(v) for v in cells["c"]]
    n = len(x)
    s = sum(x)
    e = [n * v - s for v in x]                 # exact n·(x_t − mean)
    # exact cleared partial sums and their square sum
    sp2 = 0
    run = 0
    for v in e:
        run += v
        sp2 += run * run
    # exact autocovariance numerators G_k
    g = []
    for k in range(_KPSS_L + 1):
        g.append(sum(e[t] * e[t + k] for t in range(n - k)))
    b = float(g[0])
    for k in range(1, _KPSS_L + 1):
        b = b + 2.0 * (1.0 - k / 8.0) * float(g[k])
    eta = float(sp2) / (float(n) * b)
    out = pd.DataFrame({"n_days": [n], "l_lag": [_KPSS_L],
                        "eta6": [_round6(np.array([eta]))[0]]})
    for col in ("n_days", "l_lag"):
        out[col] = out[col].astype(np.int64)
    return out


def _kpss_sql() -> str:
    gk = []
    for k in range(_KPSS_L + 1):
        gk.append(f"""
  SELECT {k} AS k, sum(CAST(a.e AS HUGEINT) * b.e) AS g
  FROM e a JOIN e b ON b.t = a.t + {k}""")
    b = " + ".join(
        ["CAST((SELECT g FROM gk WHERE k = 0) AS DOUBLE)"]
        + [f"2.0 * {1.0 - k / 8.0!r} * "
           f"CAST((SELECT g FROM gk WHERE k = {k}) AS DOUBLE)"
           for k in range(1, _KPSS_L + 1)])
    return f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
s AS (
  SELECT c AS v, row_number() OVER (ORDER BY day) AS t FROM daily),
ns AS (SELECT count(*)::BIGINT AS n, sum(v)::BIGINT AS sv FROM s),
e AS (
  SELECT t, CAST(n AS HUGEINT) * v - sv AS e
  FROM s CROSS JOIN ns),
gk AS ({" UNION ALL ".join(gk)}),
cs AS (
  SELECT t, sum(v) OVER (ORDER BY t) AS cv FROM s),
ps AS (
  SELECT sum((CAST(n AS HUGEINT) * cv - CAST(t AS HUGEINT) * sv)
             * (CAST(n AS HUGEINT) * cv - CAST(t AS HUGEINT) * sv))
           AS sp2
  FROM cs CROSS JOIN ns)
SELECT n AS n_days, {_KPSS_L}::BIGINT AS l_lag,
       round(CAST(sp2 AS DOUBLE) / (CAST(n AS DOUBLE) * ({b})), 6)
         AS eta6
FROM ns CROSS JOIN ps
"""


SQL_KPSS = _kpss_sql()


# ---------------------------------------------------------------------------
# DFA
# ---------------------------------------------------------------------------

_DFA_SIZES = [4, 8, 16, 32]


def q_dfa_daily(sf_dir: str):
    """DFA fluctuation F²(s) at four sizes + alpha (docstring)."""
    cells = _daily_cents(sf_dir)
    v = [int(c) // 100000 for c in cells["c"]]     # $1000 units
    n = len(v)
    s_all = sum(v)
    # cleared profile P_t = n·C_t − t·S (exact ints)
    p = []
    run = 0
    for t, val in enumerate(v, start=1):
        run += val
        p.append(n * run - t * s_all)
    f2 = {}
    for sz in _DFA_SIZES:
        nw = n // sz
        sx = sz * (sz + 1) // 2
        sxx = sz * (sz + 1) * (2 * sz + 1) // 6
        cst = sz * sxx - sx * sx
        sr = 0
        for w in range(nw):
            ys = p[w * sz:(w + 1) * sz]
            sy = sum(ys)
            syy = sum(y * y for y in ys)
            sxy = sum((i + 1) * y for i, y in enumerate(ys))
            rw = ((sz * syy - sy * sy) * cst
                  - (sz * sxy - sx * sy) * (sz * sxy - sx * sy))
            sr += _rint(float(rw) / float(sz * cst) * 1000000.0)
        f2[sz] = float(sr) / 1000000.0 / float(nw * sz)
    ls = [np.log(float(sz)) for sz in _DFA_SIZES]
    gs = [0.5 * np.log(f2[sz]) for sz in _DFA_SIZES]
    sl = ls[0] + ls[1] + ls[2] + ls[3]
    sg = gs[0] + gs[1] + gs[2] + gs[3]
    alpha = ((4.0 * (ls[0] * gs[0] + ls[1] * gs[1] + ls[2] * gs[2]
                     + ls[3] * gs[3]) - sl * sg)
             / (4.0 * (ls[0] * ls[0] + ls[1] * ls[1] + ls[2] * ls[2]
                       + ls[3] * ls[3]) - sl * sl))
    out = pd.DataFrame({
        "n_days": [n],
        "f2_4_6": [_round6(np.array([f2[4]]))[0]],
        "f2_8_6": [_round6(np.array([f2[8]]))[0]],
        "f2_16_6": [_round6(np.array([f2[16]]))[0]],
        "f2_32_6": [_round6(np.array([f2[32]]))[0]],
        "alpha6": [_round6(np.array([alpha]))[0]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_DFA = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
s AS (
  SELECT c // 100000 AS v, row_number() OVER (ORDER BY day) AS t
  FROM daily),
ns AS (SELECT count(*)::BIGINT AS n, sum(v)::BIGINT AS sv FROM s),
pr AS (
  SELECT t,
         CAST(n AS HUGEINT) * (sum(v) OVER (ORDER BY t))
           - CAST(t AS HUGEINT) * sv AS p
  FROM s CROSS JOIN ns),
ws AS (SELECT unnest([4, 8, 16, 32]) AS sz),
cells AS (
  SELECT ws.sz, (pr.t - 1) // ws.sz AS w,
         pr.t - ((pr.t - 1) // ws.sz) * ws.sz AS i, pr.p
  FROM pr CROSS JOIN ws CROSS JOIN ns
  WHERE (pr.t - 1) // ws.sz < ns.n // ws.sz),
wagg AS (
  SELECT sz, w, sum(CAST(i AS HUGEINT)) AS sx,
         sum(CAST(i AS HUGEINT) * i) AS sxx,
         sum(p) AS sy, sum(p * p) AS syy,
         sum(CAST(i AS HUGEINT) * p) AS sxy
  FROM cells GROUP BY 1, 2),
rw AS (
  SELECT sz,
         CAST(round(CAST((sz * syy - sy * sy) * (sz * sxx - sx * sx)
                         - (sz * sxy - sx * sy) * (sz * sxy - sx * sy)
                         AS DOUBLE)
                    / CAST(sz * (sz * sxx - sx * sx) AS DOUBLE)
                    * 1000000.0) AS HUGEINT) AS r6
  FROM wagg),
fs AS (
  SELECT sz, sum(r6) AS sr, count(*)::BIGINT AS nw FROM rw GROUP BY 1),
fv AS (
  SELECT sz,
         CAST(sr AS DOUBLE) / 1000000.0 / CAST(nw * sz AS DOUBLE) AS f2
  FROM fs),
pv AS (
  SELECT max(CASE WHEN sz = 4 THEN f2 END) AS f4,
         max(CASE WHEN sz = 8 THEN f2 END) AS f8,
         max(CASE WHEN sz = 16 THEN f2 END) AS f16,
         max(CASE WHEN sz = 32 THEN f2 END) AS f32
  FROM fv),
lg AS (
  SELECT f4, f8, f16, f32,
         ln(4.0) AS l1, ln(8.0) AS l2, ln(16.0) AS l3, ln(32.0) AS l4,
         0.5 * ln(f4) AS g1, 0.5 * ln(f8) AS g2,
         0.5 * ln(f16) AS g3, 0.5 * ln(f32) AS g4
  FROM pv)
SELECT (SELECT n FROM ns) AS n_days,
       round(f4, 6) AS f2_4_6, round(f8, 6) AS f2_8_6,
       round(f16, 6) AS f2_16_6, round(f32, 6) AS f2_32_6,
       round((4.0 * (l1 * g1 + l2 * g2 + l3 * g3 + l4 * g4)
              - (l1 + l2 + l3 + l4) * (g1 + g2 + g3 + g4))
             / (4.0 * (l1 * l1 + l2 * l2 + l3 * l3 + l4 * l4)
                - (l1 + l2 + l3 + l4) * (l1 + l2 + l3 + l4)), 6)
         AS alpha6
FROM lg
"""


# ---------------------------------------------------------------------------
# GEV shape via L-moments of weekly maxima
# ---------------------------------------------------------------------------


def q_gev_lmoments_weekly(sf_dir: str):
    """GEV kappa from L-moment ratios of weekly maxima (docstring)."""
    cells = _daily_cents(sf_dir)
    wk = cells.assign(wk=cells["day"].to_numpy(np.int64) // 7) \
        .groupby("wk")["c"].max()
    m = sorted(int(x) for x in wk)
    n = len(m)
    b0 = sum(m)
    b1 = sum((i - 1) * x for i, x in enumerate(m, start=1))
    b2 = sum((i - 1) * (i - 2) * x for i, x in enumerate(m, start=1))
    l1 = float(b0) / float(n)
    l2 = 2.0 * float(b1) / float(n * (n - 1)) - l1
    l3 = (6.0 * float(b2) / float(n * (n - 1) * (n - 2))
          - 6.0 * float(b1) / float(n * (n - 1)) + l1)
    t3 = l3 / l2
    c = 2.0 / (3.0 + t3) - np.log(2.0) / np.log(3.0)
    kappa = 7.8590 * c + 2.9554 * (c * c)
    out = pd.DataFrame({"n_weeks": [n],
                        "l1_6": [_round6(np.array([l1]))[0]],
                        "l2_6": [_round6(np.array([l2]))[0]],
                        "t3_6": [_round6(np.array([t3]))[0]],
                        "kappa6": [_round6(np.array([kappa]))[0]]})
    out["n_weeks"] = out["n_weeks"].astype(np.int64)
    return out


SQL_GEV_LMOMENTS = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
wk AS (SELECT day // 7 AS wk, max(c) AS m FROM daily GROUP BY 1),
r AS (
  SELECT m, row_number() OVER (ORDER BY m, wk) AS i FROM wk),
b AS (
  SELECT count(*)::BIGINT AS n, sum(m)::BIGINT AS b0,
         sum(CAST(i - 1 AS HUGEINT) * m) AS b1,
         sum(CAST(i - 1 AS HUGEINT) * (i - 2) * m) AS b2
  FROM r),
lm AS (
  SELECT n,
         CAST(b0 AS DOUBLE) / CAST(n AS DOUBLE) AS l1,
         2.0 * CAST(b1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
           - CAST(b0 AS DOUBLE) / CAST(n AS DOUBLE) AS l2,
         6.0 * CAST(b2 AS DOUBLE)
             / CAST(n * (n - 1) * (n - 2) AS DOUBLE)
           - 6.0 * CAST(b1 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
           + CAST(b0 AS DOUBLE) / CAST(n AS DOUBLE) AS l3
  FROM b),
tc AS (
  SELECT n, l1, l2, l3 / l2 AS t3,
         2.0 / (3.0 + l3 / l2) - ln(2.0) / ln(3.0) AS c
  FROM lm)
SELECT n AS n_weeks, round(l1, 6) AS l1_6, round(l2, 6) AS l2_6,
       round(t3, 6) AS t3_6,
       round(7.8590 * c + 2.9554 * (c * c), 6) AS kappa6
FROM tc
"""


QUERIES123: dict[str, tuple] = {
    "kpss_daily": (q_kpss_daily, SQL_KPSS),
    "dfa_daily": (q_dfa_daily, SQL_DFA),
    "gev_lmoments_weekly": (q_gev_lmoments_weekly, SQL_GEV_LMOMENTS),
}
