"""Seventy-fifth oracle-query batch — residual diagnostics of the daily
revenue OLS trend fit y ~ a + b*t.  Shared machinery: with exact
moments (n, St, St2, Sy, Sty) off the distributed daily-cents
aggregate, the scaled residual E_i = A*(n*y_i - Sy) - B*(n*t_i - St)
(A = n*St2 - St^2, B = n*Sty - St*Sy) is an EXACT integer (~2.6e23 at
sf0.1 — Python int / HUGEINT), and the per-day quantized residual
eq_i = round(E_i/(n*A)/10000)  [hundred-dollar units; round
half-away-from-zero] is identical both sides (float expression on the
exact-int cast; probe: byte-equal sums/min/max vs DuckDB at sf0.001).
The $100 quantization keeps z = eq^2 moments inside int128 at sf0.1
(in cents, Czz would graze the HUGEINT limit).  Squared cross-moment
products (V1^2 ~1e41) exceed int128, so the final R^2 assembles in
FLOAT from the individually-exact HUGEINT factors with textually
identical expressions both sides.

- white_het_daily: White heteroskedasticity test — regress z = eq^2
  on (t, t^2); LM = n*R^2 with
  R^2 = (M22*V1^2 - 2*M12*V1*V2 + M11*V2^2)/(Czz*det) via the
  2-feature Cramer moments (granger/ols_two_feature shape).  Probe
  sf0.001: LM = 1.27947 — non-degenerate.
- arch_lm_daily: Engle's ARCH(1) LM — regress z_t on z_{t-1};
  LM = (n-1)*r^2 with r^2 = B^2/(Saa_c*Sbb_c) from exact lagged
  moments.  Probe: LM = 2.608882.
- breusch_godfrey_daily: Breusch-Godfrey serial-correlation LM at lag
  1 — regress eq_t on (t, eq_{t-1}); LM = (n-1)*R^2 via the same
  2-feature Cramer assembly.  Probe: LM = 1.048621.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents

_US_PER_DAY = 86_400_000_000


def _resid_units(sf_dir: str):
    """-> (n, t list, eq list): exact quantized OLS residuals of the
    daily revenue trend in $100 units (docstring above)."""
    y = [int(v) for v in _daily_cents(sf_dir)["c"].to_numpy(np.int64)]
    n = len(y)
    t = list(range(n))
    st = sum(t)
    st2 = sum(v * v for v in t)
    sy = sum(y)
    sty = sum(a * b for a, b in zip(t, y))
    a = n * st2 - st * st
    b = n * sty - st * sy
    na = n * a
    eq = []
    for ti, yi in zip(t, y):
        e = a * (n * yi - sy) - b * (n * ti - st)
        x = float(e) / float(na) / 10000.0
        eq.append(int(math.floor(x + 0.5)) if x >= 0
                  else int(math.ceil(x - 0.5)))
    return n, t, eq


_RESID_SQL = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
seq AS (SELECT c, row_number() OVER (ORDER BY d) - 1 AS t FROM daily),
st AS (
  SELECT count(*)::HUGEINT AS n, sum(t)::HUGEINT AS st,
         sum(t * t)::HUGEINT AS st2, sum(c)::HUGEINT AS sy,
         sum(t * c)::HUGEINT AS sty
  FROM seq),
ab AS (SELECT n, st, sy, n * st2 - st * st AS a,
              n * sty - st * sy AS b
       FROM st),
eqt AS (
  SELECT t,
         CAST(round(CAST(a * (n * c - sy) - b * (n * t - st) AS DOUBLE)
                    / CAST(n * a AS DOUBLE) / 10000.0) AS BIGINT) AS eq
  FROM seq, ab)
"""


# ---------------------------------------------------------------------------
# White test
# ---------------------------------------------------------------------------


def q_white_het_daily(sf_dir: str):
    """White heteroskedasticity LM = n*R^2 of eq^2 on (t, t^2)
    (docstring above)."""
    n, t, eq = _resid_units(sf_dir)
    z = [v * v for v in eq]
    s1 = sum(t)
    s2 = sum(v * v for v in t)
    s11 = s2
    s22 = sum(v ** 4 for v in t)
    s12 = sum(v ** 3 for v in t)
    sz = sum(z)
    szz = sum(v * v for v in z)
    s1z = sum(a * b for a, b in zip(t, z))
    s2z = sum((a * a) * b for a, b in zip(t, z))
    m11 = n * s11 - s1 * s1
    m12 = n * s12 - s1 * s2
    m22 = n * s22 - s2 * s2
    v1 = n * s1z - s1 * sz
    v2 = n * s2z - s2 * sz
    czz = n * szz - sz * sz
    det = m11 * m22 - m12 * m12
    lm = float(n) * ((float(m22) * float(v1) * float(v1)
                      - 2.0 * float(m12) * float(v1) * float(v2)
                      + float(m11) * float(v2) * float(v2))
                     / (float(czz) * float(det)))
    # s2z (~1.5e21 at sf0.1) overflows an int64 output column — only
    # int64-safe moments are reported
    out = pd.DataFrame({"n_days": [n], "sz": [sz], "s1z": [s1z],
                        "lm6": [_round6(np.array([lm]))[0]]})
    for col in ("n_days", "sz", "s1z"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_WHITE = _RESID_SQL + """,
zm AS (
  SELECT count(*)::HUGEINT AS n, sum(t)::HUGEINT AS s1,
         sum(t * t)::HUGEINT AS s2,
         sum(t * t * t)::HUGEINT AS s12_r,
         sum(t::HUGEINT * t * t * t) AS s22_r,
         sum(eq::HUGEINT * eq) AS sz,
         sum((eq::HUGEINT * eq) * (eq::HUGEINT * eq)) AS szz,
         sum(t * (eq::HUGEINT * eq)) AS s1z,
         sum((t::HUGEINT * t) * (eq::HUGEINT * eq)) AS s2z
  FROM eqt),
c AS (
  SELECT n, sz, s1z, s2z,
         n * s2 - s1 * s1 AS m11,
         n * s12_r - s1 * s2 AS m12,
         n * s22_r - s2 * s2 AS m22,
         n * s1z - s1 * sz AS v1,
         n * s2z - s2 * sz AS v2,
         n * szz - sz * sz AS czz
  FROM zm)
SELECT n::BIGINT AS n_days, sz::BIGINT AS sz, s1z::BIGINT AS s1z,
       round(CAST(n AS DOUBLE)
             * ((CAST(m22 AS DOUBLE) * CAST(v1 AS DOUBLE)
                   * CAST(v1 AS DOUBLE)
                 - 2.0 * CAST(m12 AS DOUBLE) * CAST(v1 AS DOUBLE)
                   * CAST(v2 AS DOUBLE)
                 + CAST(m11 AS DOUBLE) * CAST(v2 AS DOUBLE)
                   * CAST(v2 AS DOUBLE))
                / (CAST(czz AS DOUBLE) * CAST(m11 * m22 - m12 * m12
                                              AS DOUBLE))), 6) AS lm6
FROM c
"""


# ---------------------------------------------------------------------------
# ARCH(1) LM
# ---------------------------------------------------------------------------


def q_arch_lm_daily(sf_dir: str):
    """Engle ARCH(1) LM on the squared quantized residuals (docstring
    above)."""
    n, t, eq = _resid_units(sf_dir)
    z = [v * v for v in eq]
    z0, z1 = z[:-1], z[1:]
    m = len(z1)
    sa = sum(z0)
    sb = sum(z1)
    saa = sum(v * v for v in z0)
    sbb = sum(v * v for v in z1)
    sab = sum(a * b for a, b in zip(z0, z1))
    bnum = m * sab - sa * sb
    aden = m * saa - sa * sa
    cden = m * sbb - sb * sb
    lm = float(m) * ((float(bnum) * float(bnum))
                     / (float(aden) * float(cden)))
    out = pd.DataFrame({"n_pairs": [m], "sa": [sa], "sb": [sb],
                        "lm6": [_round6(np.array([lm]))[0]]})
    for col in ("n_pairs", "sa", "sb"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ARCH = _RESID_SQL + """,
lz AS (
  SELECT (eq::HUGEINT * eq) AS z1,
         lag(eq::HUGEINT * eq) OVER (ORDER BY t) AS z0
  FROM eqt),
zm AS (
  SELECT count(*)::HUGEINT AS m, sum(z0) AS sa, sum(z1) AS sb,
         sum(z0 * z0) AS saa, sum(z1 * z1) AS sbb,
         sum(z0 * z1) AS sab
  FROM lz WHERE z0 IS NOT NULL)
SELECT m::BIGINT AS n_pairs, sa::BIGINT AS sa, sb::BIGINT AS sb,
       round(CAST(m AS DOUBLE)
             * ((CAST(m * sab - sa * sb AS DOUBLE)
                 * CAST(m * sab - sa * sb AS DOUBLE))
                / (CAST(m * saa - sa * sa AS DOUBLE)
                   * CAST(m * sbb - sb * sb AS DOUBLE))), 6) AS lm6
FROM zm
"""


# ---------------------------------------------------------------------------
# Breusch-Godfrey lag-1 LM
# ---------------------------------------------------------------------------


def q_breusch_godfrey_daily(sf_dir: str):
    """BG serial-correlation LM: eq_t on (t, eq_{t-1}) (docstring
    above)."""
    n, t, eq = _resid_units(sf_dir)
    e0, e1, tt = eq[:-1], eq[1:], t[1:]
    m = len(e1)
    s1 = sum(tt)
    s2 = sum(e0)
    sy = sum(e1)
    s11 = sum(v * v for v in tt)
    s22 = sum(v * v for v in e0)
    s12 = sum(a * b for a, b in zip(tt, e0))
    s1y = sum(a * b for a, b in zip(tt, e1))
    s2y = sum(a * b for a, b in zip(e0, e1))
    syy = sum(v * v for v in e1)
    m11 = m * s11 - s1 * s1
    m12 = m * s12 - s1 * s2
    m22 = m * s22 - s2 * s2
    v1 = m * s1y - s1 * sy
    v2 = m * s2y - s2 * sy
    cyy = m * syy - sy * sy
    det = m11 * m22 - m12 * m12
    lm = float(m) * ((float(m22) * float(v1) * float(v1)
                      - 2.0 * float(m12) * float(v1) * float(v2)
                      + float(m11) * float(v2) * float(v2))
                     / (float(cyy) * float(det)))
    out = pd.DataFrame({"n_pairs": [m], "s2": [s2], "s2y": [s2y],
                        "lm6": [_round6(np.array([lm]))[0]]})
    for col in ("n_pairs", "s2", "s2y"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BG = _RESID_SQL + """,
lz AS (
  SELECT t, eq AS e1, lag(eq) OVER (ORDER BY t) AS e0
  FROM eqt),
zm AS (
  SELECT count(*)::HUGEINT AS m, sum(t)::HUGEINT AS s1,
         sum(e0)::HUGEINT AS s2, sum(e1)::HUGEINT AS sy,
         sum(t * t)::HUGEINT AS s11, sum(e0::HUGEINT * e0) AS s22,
         sum(t * e0)::HUGEINT AS s12, sum(t * e1)::HUGEINT AS s1y,
         sum(e0::HUGEINT * e1) AS s2y, sum(e1::HUGEINT * e1) AS syy
  FROM lz WHERE e0 IS NOT NULL),
c AS (
  SELECT m, s2, s2y,
         m * s11 - s1 * s1 AS m11, m * s12 - s1 * s2 AS m12,
         m * s22 - s2 * s2 AS m22, m * s1y - s1 * sy AS v1,
         m * s2y - s2 * sy AS v2, m * syy - sy * sy AS cyy
  FROM zm)
SELECT m::BIGINT AS n_pairs, s2::BIGINT AS s2, s2y::BIGINT AS s2y,
       round(CAST(m AS DOUBLE)
             * ((CAST(m22 AS DOUBLE) * CAST(v1 AS DOUBLE)
                   * CAST(v1 AS DOUBLE)
                 - 2.0 * CAST(m12 AS DOUBLE) * CAST(v1 AS DOUBLE)
                   * CAST(v2 AS DOUBLE)
                 + CAST(m11 AS DOUBLE) * CAST(v2 AS DOUBLE)
                   * CAST(v2 AS DOUBLE))
                / (CAST(cyy AS DOUBLE) * CAST(m11 * m22 - m12 * m12
                                              AS DOUBLE))), 6) AS lm6
FROM c
"""


QUERIES75: dict[str, tuple] = {
    "white_het_daily": (q_white_het_daily, SQL_WHITE),
    "arch_lm_daily": (q_arch_lm_daily, SQL_ARCH),
    "breusch_godfrey_daily": (q_breusch_godfrey_daily, SQL_BG),
}
