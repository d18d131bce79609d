"""One-hundred-forty-fourth oracle-query batch — time-series
diagnostics beyond the existing ADF/KPSS/periodogram family:

- phillips_perron_daily: the Phillips-Perron Z_ρ and Z_τ unit-root
  tests on daily kilodollar order revenue (the dickey_fuller series).
  OLS level regression y_t = α + ρ y_{t−1} from exact integer sums;
  residuals are per-row quantized to 1e-6 (the dcca device) so every
  autocovariance γ_l is an exact HUGEINT sum of U_t·U_{t−l}; the
  Bartlett q=4 long-run variance and both Z statistics finalize
  through identical float expressions.
- approx_entropy_daily: ApEn(m=2, r = IQR//4) of daily event-value
  dollars. Match counts C_i are exact integers from pairwise
  max-coordinate comparisons; each ln(C_i/N_m) is quantized to 1e-9
  PER i so Φ² and Φ³ are integer nano-sums (no float sums), and
  ApEn = Φ² − Φ³ finalizes identically.
- spectral_entropy_daily: normalized spectral entropy of the daily
  event-value series. The trig kernel is quantized PER CELL
  (c9 = round(cos(2πkt/T)·1e9)) so the Fourier sums a_k, b_k are
  exact integers, powers are HUGEINT a²+b², and each frequency's
  −p·ln p term is again 1e-9-quantized before the integer sum.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries58 import _daily_cents as _orders_daily
from scrapy_ray.pipelines.queries143 import _daily_cents as _events_daily

_US_PER_DAY = 86400000000


def _rint9(x: float) -> int:
    """round(x·1e9) half-away-from-zero as an exact int."""
    return int(math.floor(abs(x) * 1e9 + 0.5)) * (1 if x >= 0 else -1)


# ---------------------------------------------------------------------------
# Phillips-Perron
# ---------------------------------------------------------------------------


def q_phillips_perron_daily(sf_dir: str):
    """PP Z_ρ / Z_τ on daily kilodollar revenue (docstring above)."""
    cells = _orders_daily(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    yv = np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)
    y = [int(v) for v in yv]
    x = y[:-1]
    z = y[1:]
    m = len(x)
    sx, sz = sum(x), sum(z)
    sxx = sum(v * v for v in x)
    sxz = sum(a * b for a, b in zip(x, z))
    num = m * sxz - sx * sz
    den = m * sxx - sx * sx
    rho = float(num) / float(den)
    alpha = (float(sz) - rho * float(sx)) / float(m)
    def rint(v: float) -> int:          # half-away-from-zero
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    # per-row 1e-6 quantized residuals (the dcca device)
    uu = [rint((float(b) - alpha - rho * float(a)) * 1e6)
          for a, b in zip(x, z)]
    g = [sum(uu[t] * uu[t - lag] for t in range(lag, m))
         for lag in range(5)]
    gf = [float(v) / 1e12 / float(m) for v in g]
    lam2 = gf[0] + 2.0 * (0.8 * gf[1] + 0.6 * gf[2] + 0.4 * gf[3]
                          + 0.2 * gf[4])
    dd = float(den) / (float(m) * float(m) * float(m))
    s2 = float(sum(u * u for u in uu)) / 1e12 / float(m - 2)
    se = math.sqrt(s2 * float(m) / float(den))
    t_rho = (rho - 1.0) / se
    z_rho = float(m) * (rho - 1.0) - 0.5 * (lam2 - gf[0]) / dd
    z_tau = (math.sqrt(gf[0] / lam2) * t_rho
             - (lam2 - gf[0]) / (2.0 * math.sqrt(lam2)
                                 * math.sqrt(dd)))
    r6 = _round6(np.array([rho, lam2, z_rho, z_tau]))
    out = pd.DataFrame({"m": [m], "rho6": [r6[0]], "lambda2_6": [r6[1]],
                        "zrho6": [r6[2]], "ztau6": [r6[3]]})
    out["m"] = out["m"].astype(np.int64)
    return out


SQL_PHILLIPS_PERRON = f"""
WITH dc0 AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d0 AS (
  SELECT CAST(round(c / 100000.0) AS BIGINT) AS y, day FROM dc0),
w AS (
  SELECT row_number() OVER (ORDER BY day) AS t, y AS x,
         lead(y) OVER (ORDER BY day) AS z
  FROM d0),
pr AS (
  SELECT t, x::HUGEINT AS x, z::HUGEINT AS z
  FROM w WHERE z IS NOT NULL),
s AS (
  SELECT count(*)::HUGEINT AS m, sum(x) AS sx, sum(z) AS sz,
         sum(x * x) AS sxx, sum(x * z) AS sxz
  FROM pr),
f AS (
  SELECT m, sx, sz, (m * sxz - sx * sz) AS num,
         (m * sxx - sx * sx) AS den
  FROM s),
g AS (
  SELECT m, den, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS rho,
         (CAST(sz AS DOUBLE)
          - CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
            * CAST(sx AS DOUBLE)) / CAST(m AS DOUBLE) AS alpha
  FROM f),
res AS (
  SELECT pr.t,
         CAST(round((CAST(pr.z AS DOUBLE) - g.alpha
                     - g.rho * CAST(pr.x AS DOUBLE)) * 1000000)
              AS HUGEINT) AS u
  FROM pr CROSS JOIN g),
gam AS (
  SELECT
    (SELECT sum(a.u * a.u) FROM res a) AS g0,
    (SELECT sum(a.u * b.u) FROM res a JOIN res b ON b.t = a.t - 1)
      AS g1,
    (SELECT sum(a.u * b.u) FROM res a JOIN res b ON b.t = a.t - 2)
      AS g2,
    (SELECT sum(a.u * b.u) FROM res a JOIN res b ON b.t = a.t - 3)
      AS g3,
    (SELECT sum(a.u * b.u) FROM res a JOIN res b ON b.t = a.t - 4)
      AS g4),
fin AS (
  SELECT g.m, g.rho,
         CAST(gam.g0 AS DOUBLE) / 1e12 / CAST(g.m AS DOUBLE) AS gf0,
         CAST(gam.g0 AS DOUBLE) / 1e12 / CAST(g.m AS DOUBLE)
         + 2.0 * (0.8 * CAST(gam.g1 AS DOUBLE) / 1e12
                        / CAST(g.m AS DOUBLE)
                  + 0.6 * CAST(gam.g2 AS DOUBLE) / 1e12
                        / CAST(g.m AS DOUBLE)
                  + 0.4 * CAST(gam.g3 AS DOUBLE) / 1e12
                        / CAST(g.m AS DOUBLE)
                  + 0.2 * CAST(gam.g4 AS DOUBLE) / 1e12
                        / CAST(g.m AS DOUBLE)) AS lam2,
         CAST(g.den AS DOUBLE)
           / (CAST(g.m AS DOUBLE) * CAST(g.m AS DOUBLE)
              * CAST(g.m AS DOUBLE)) AS dd,
         CAST(gam.g0 AS DOUBLE) / 1e12 / CAST(g.m - 2 AS DOUBLE)
           * CAST(g.m AS DOUBLE) / CAST(g.den AS DOUBLE) AS se2
  FROM g CROSS JOIN gam)
SELECT m::BIGINT AS m, round(rho, 6) AS rho6,
       round(lam2, 6) AS lambda2_6,
       round(CAST(m AS DOUBLE) * (rho - 1.0)
             - 0.5 * (lam2 - gf0) / dd, 6) AS zrho6,
       round(sqrt(gf0 / lam2) * ((rho - 1.0) / sqrt(se2))
             - (lam2 - gf0) / (2.0 * sqrt(lam2) * sqrt(dd)), 6)
         AS ztau6
FROM fin
"""


# ---------------------------------------------------------------------------
# Approximate entropy
# ---------------------------------------------------------------------------


def q_approx_entropy_daily(sf_dir: str):
    """ApEn(m=2, r=IQR//4) of daily event dollars (docstring)."""
    cents = _events_daily(sf_dir)
    y = [int(v) // 100 for v in cents.tolist()]
    n = len(y)
    ys = sorted(y)
    q25 = ys[math.ceil(0.25 * n) - 1]       # quantile_disc ranks
    q75 = ys[math.ceil(0.75 * n) - 1]
    r = (q75 - q25) // 4

    def phi_nano(m: int) -> tuple[int, int]:
        nm = n - m + 1
        tot = 0
        for i in range(nm):
            c = sum(1 for j in range(nm)
                    if max(abs(y[i + k] - y[j + k])
                           for k in range(m)) <= r)
            tot += _rint9(math.log(float(c) / float(nm)))
        return tot, nm

    s2, n2 = phi_nano(2)
    s3, n3 = phi_nano(3)
    apen = (float(s2) / 1e9 / float(n2)
            - float(s3) / 1e9 / float(n3))
    out = pd.DataFrame({"n": [n], "r": [r], "phi2_nano": [s2],
                        "phi3_nano": [s3],
                        "apen6": [_round6(np.array([apen]))[0]]})
    for col in ("n", "r", "phi2_nano", "phi3_nano"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_APPROX_ENTROPY = """
WITH dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT)) // 100 AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
par AS (
  SELECT count(*)::BIGINT AS n,
         (quantile_disc(y, 0.75) - quantile_disc(y, 0.25)) // 4 AS r
  FROM seq),
c2 AS (
  SELECT a.t, count(*)::BIGINT AS c
  FROM seq a JOIN seq a2 ON a2.t = a.t + 1
       CROSS JOIN par
       JOIN seq b ON abs(a.y - b.y) <= par.r
       JOIN seq b2 ON b2.t = b.t + 1 AND abs(a2.y - b2.y) <= par.r
  GROUP BY a.t),
c3 AS (
  SELECT a.t, count(*)::BIGINT AS c
  FROM seq a JOIN seq a2 ON a2.t = a.t + 1
       JOIN seq a3 ON a3.t = a.t + 2
       CROSS JOIN par
       JOIN seq b ON abs(a.y - b.y) <= par.r
       JOIN seq b2 ON b2.t = b.t + 1 AND abs(a2.y - b2.y) <= par.r
       JOIN seq b3 ON b3.t = b.t + 2 AND abs(a3.y - b3.y) <= par.r
  GROUP BY a.t),
p2 AS (
  SELECT sum(CAST(round(ln(CAST(c AS DOUBLE)
                          / CAST((SELECT n - 1 FROM par) AS DOUBLE))
                   * 1000000000) AS BIGINT))::BIGINT AS s,
         count(*)::BIGINT AS nm
  FROM c2),
p3 AS (
  SELECT sum(CAST(round(ln(CAST(c AS DOUBLE)
                          / CAST((SELECT n - 2 FROM par) AS DOUBLE))
                   * 1000000000) AS BIGINT))::BIGINT AS s,
         count(*)::BIGINT AS nm
  FROM c3)
SELECT par.n AS n, par.r::BIGINT AS r, p2.s AS phi2_nano,
       p3.s AS phi3_nano,
       round(CAST(p2.s AS DOUBLE) / 1e9 / CAST(p2.nm AS DOUBLE)
             - CAST(p3.s AS DOUBLE) / 1e9 / CAST(p3.nm AS DOUBLE), 6)
         AS apen6
FROM par CROSS JOIN p2 CROSS JOIN p3
"""


# ---------------------------------------------------------------------------
# Spectral entropy
# ---------------------------------------------------------------------------


def q_spectral_entropy_daily(sf_dir: str):
    """Normalized spectral entropy of daily dollars (docstring)."""
    cents = _events_daily(sf_dir)
    y = [int(v) // 100 for v in cents.tolist()]
    n = len(y)
    kmax = (n - 1) // 2
    powers = []
    for k in range(1, kmax + 1):
        a = sum(yy * _rint9(math.cos(2.0 * math.pi * float(k)
                                     * float(t) / float(n)))
                for t, yy in enumerate(y, start=1))
        b = sum(yy * _rint9(math.sin(2.0 * math.pi * float(k)
                                     * float(t) / float(n)))
                for t, yy in enumerate(y, start=1))
        powers.append(a * a + b * b)
    tot = sum(powers)
    e_nano = sum(_rint9(-(float(p) / float(tot))
                        * math.log(float(p) / float(tot)))
                 for p in powers)
    h = float(e_nano) / 1e9
    hnorm = h / math.log(float(kmax))
    out = pd.DataFrame({"n": [n], "kmax": [kmax],
                        "entropy_nano": [e_nano],
                        "hnorm6": [_round6(np.array([hnorm]))[0]]})
    for col in ("n", "kmax", "entropy_nano"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SPECTRAL_ENTROPY = """
WITH dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT)) // 100 AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
par AS (
  SELECT count(*)::BIGINT AS n, ((count(*) - 1) // 2)::BIGINT AS kmax
  FROM seq),
ks AS (
  SELECT unnest(range(1, kmax + 1)) AS k FROM par),
cells AS (
  SELECT ks.k, seq.t,
         CAST(seq.y AS HUGEINT)
         * CAST(round(cos(2.0 * pi() * CAST(ks.k AS DOUBLE)
                          * CAST(seq.t AS DOUBLE)
                          / CAST(par.n AS DOUBLE)) * 1000000000)
                AS BIGINT) AS ac,
         CAST(seq.y AS HUGEINT)
         * CAST(round(sin(2.0 * pi() * CAST(ks.k AS DOUBLE)
                          * CAST(seq.t AS DOUBLE)
                          / CAST(par.n AS DOUBLE)) * 1000000000)
                AS BIGINT) AS bc
  FROM ks CROSS JOIN seq CROSS JOIN par),
pw AS (
  SELECT k, sum(ac) * sum(ac) + sum(bc) * sum(bc) AS p
  FROM cells GROUP BY k),
tt AS (SELECT sum(p) AS tot FROM pw),
en AS (
  SELECT sum(CAST(round(-(CAST(p AS DOUBLE) / CAST(tot AS DOUBLE))
                        * ln(CAST(p AS DOUBLE) / CAST(tot AS DOUBLE))
                        * 1000000000) AS BIGINT))::BIGINT AS e
  FROM pw CROSS JOIN tt)
SELECT par.n AS n, par.kmax AS kmax, en.e AS entropy_nano,
       round(CAST(en.e AS DOUBLE) / 1e9
             / ln(CAST(par.kmax AS DOUBLE)), 6) AS hnorm6
FROM par CROSS JOIN en
"""


QUERIES144: dict[str, tuple] = {
    "phillips_perron_daily": (q_phillips_perron_daily,
                              SQL_PHILLIPS_PERRON),
    "approx_entropy_daily": (q_approx_entropy_daily,
                             SQL_APPROX_ENTROPY),
    "spectral_entropy_daily": (q_spectral_entropy_daily,
                               SQL_SPECTRAL_ENTROPY),
}
