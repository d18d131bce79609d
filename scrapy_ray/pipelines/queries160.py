"""One-hundred-sixtieth oracle-query batch — probit regression,
volatility filtering, and long-memory estimation:

- probit_2step_purchase: probit regression of the purchase indicator
  on event value (hundreds of dollars), fit with 3 Fisher-scoring
  steps replayed identically. Φ is the shared Abramowitz-Stegun
  26.2.17 polynomial (the bh_fdr device — DuckDB has no erf) and φ
  the explicit Gaussian density; every per-cell score/weight
  contribution is quantized to 1e-9 on the (cents, y) histogram
  before the integer sums, and the 2×2 Fisher solve is explicit
  adjugate float algebra.
- garch_filter_daily: a GARCH(1,1) volatility filter (ω = 1e-4,
  α = 0.1, β = 0.85) over daily-revenue returns quantized per day to
  1e-6; h₁ is the exact sample variance of the quantized returns,
  the 29-step h recursion replays in a recursive CTE, and the
  Gaussian log-likelihood accumulates as per-day 1e-9-quantized
  integer terms.
- gph_long_memory_daily: the Geweke/Porter-Hudak log-periodogram
  estimate of the fractional-d parameter: integer Fourier sums (the
  spectral-entropy device) give exact HUGEINT periodogram powers,
  ln I_k and ln(4sin²(πk/n)) are quantized per frequency, and the
  OLS slope over the m = 14 frequencies is exact integer algebra
  with one float finalization (d̂ = −slope/ ... reported as d6).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries147 import _phi_upper_p

_PB_ITERS = 3
_GA_OMEGA = 1e-4
_GA_ALPHA = 0.1
_GA_BETA = 0.85


def _r9(v: float) -> int:
    return int(math.floor(abs(v) * 1e9 + 0.5)) * (1 if v >= 0 else -1)


# ---------------------------------------------------------------------------
# Probit
# ---------------------------------------------------------------------------

# the A&S polynomial for the upper tail, as a SQL expression factory
def _sql_upper(zexpr: str) -> str:
    t = f"(1.0 / (1.0 + 0.2316419 * abs({zexpr})))"
    poly = (f"({t} * (0.319381530 + {t} * (-0.356563782 + {t} * "
            f"(1.781477937 + {t} * (-1.821255978 + {t} "
            f"* 1.330274429)))))")
    tail = (f"((exp(-abs({zexpr}) * abs({zexpr}) / 2.0) "
            f"/ sqrt(2.0 * pi())) * {poly})")
    return (f"(CASE WHEN {zexpr} >= 0.0 THEN {tail} "
            f"ELSE 1.0 - {tail} END)")


def q_probit_2step_purchase(sf_dir: str):
    """Probit purchase ~ value via 3 Fisher steps (docstring)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def cells(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"c": c,
                          "y": (et == "purchase").astype(np.int64),
                          "n": np.int64(1)}) \
            .groupby(["c", "y"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cel = (ds.map_batches(cells, batch_format="pyarrow")
             .groupby(["c", "y"]).aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    cc = cel["c"].to_numpy(np.int64)
    yy = cel["y"].to_numpy(np.int64)
    nn = cel["n"].to_numpy(np.int64)
    x = cc.astype(np.float64) / 1e4
    b0 = b1 = 0.0
    for _ in range(_PB_ITERS):
        sw = swx = swx2 = g0 = g1 = 0
        for xi, yi, ni in zip(x.tolist(), yy.tolist(), nn.tolist()):
            z = b0 + b1 * xi
            up = _phi_upper_p(z)
            phi_cdf = 1.0 - up
            pdf = math.exp(-z * z / 2.0) / math.sqrt(2.0 * math.pi)
            wq = pdf * pdf / (phi_cdf * (1.0 - phi_cdf))
            gq = pdf * (float(yi) - phi_cdf) \
                / (phi_cdf * (1.0 - phi_cdf))
            sw += ni * _r9(wq)
            swx += ni * _r9(wq * xi)
            swx2 += ni * _r9(wq * xi * xi)
            g0 += ni * _r9(gq)
            g1 += ni * _r9(gq * xi)
        fw, fx, fx2 = (float(sw) / 1e9, float(swx) / 1e9,
                       float(swx2) / 1e9)
        e0, e1 = float(g0) / 1e9, float(g1) / 1e9
        det = fw * fx2 - fx * fx
        b0 = b0 + (e0 * fx2 - e1 * fx) / det
        b1 = b1 + (fw * e1 - fx * e0) / det
    ll_u = 0
    for xi, yi, ni in zip(x.tolist(), yy.tolist(), nn.tolist()):
        z = b0 + b1 * xi
        up = _phi_upper_p(z)
        p = 1.0 - up if yi == 1 else up
        ll_u += ni * _r9(math.log(p))
    r6 = _round6(np.array([b0, b1, float(ll_u) / 1e9]))
    out = pd.DataFrame({"n": [int(nn.sum())], "b0_6": [r6[0]],
                        "b1_6": [r6[1]], "ll6": [r6[2]]})
    out["n"] = out["n"].astype(np.int64)
    return out


def _probit_iter_sql(i: int) -> str:
    prev = f"it{i - 1}" if i > 1 else "init"
    z = "(p.b0 + p.b1 * c.x)"
    up = _sql_upper(z)
    cdf = f"(1.0 - {up})"
    pdf = (f"(exp(-{z} * {z} / 2.0) / sqrt(2.0 * pi()))")
    wq = f"({pdf} * {pdf} / ({cdf} * (1.0 - {cdf})))"
    gq = (f"({pdf} * (CAST(c.y AS DOUBLE) - {cdf}) "
          f"/ ({cdf} * (1.0 - {cdf})))")
    return f"""
s{i} AS MATERIALIZED (
  SELECT
    sum(c.n * CAST(round({wq} * 1e9) AS BIGINT))::BIGINT AS sw,
    sum(c.n * CAST(round({wq} * c.x * 1e9) AS BIGINT))::BIGINT
      AS swx,
    sum(c.n * CAST(round({wq} * c.x * c.x * 1e9) AS BIGINT))
      ::BIGINT AS swx2,
    sum(c.n * CAST(round({gq} * 1e9) AS BIGINT))::BIGINT AS g0,
    sum(c.n * CAST(round({gq} * c.x * 1e9) AS BIGINT))::BIGINT
      AS g1
  FROM cells c CROSS JOIN {prev} p),
it{i} AS MATERIALIZED (
  SELECT p.b0 + ((CAST(s.g0 AS DOUBLE) / 1e9)
                 * (CAST(s.swx2 AS DOUBLE) / 1e9)
                 - (CAST(s.g1 AS DOUBLE) / 1e9)
                   * (CAST(s.swx AS DOUBLE) / 1e9))
               / ((CAST(s.sw AS DOUBLE) / 1e9)
                  * (CAST(s.swx2 AS DOUBLE) / 1e9)
                  - (CAST(s.swx AS DOUBLE) / 1e9)
                    * (CAST(s.swx AS DOUBLE) / 1e9)) AS b0,
         p.b1 + ((CAST(s.sw AS DOUBLE) / 1e9)
                 * (CAST(s.g1 AS DOUBLE) / 1e9)
                 - (CAST(s.swx AS DOUBLE) / 1e9)
                   * (CAST(s.g0 AS DOUBLE) / 1e9))
               / ((CAST(s.sw AS DOUBLE) / 1e9)
                  * (CAST(s.swx2 AS DOUBLE) / 1e9)
                  - (CAST(s.swx AS DOUBLE) / 1e9)
                    * (CAST(s.swx AS DOUBLE) / 1e9)) AS b1
  FROM {prev} p CROSS JOIN s{i} s)"""


def _probit_sql() -> str:
    z = "(p.b0 + p.b1 * c.x)"
    up = _sql_upper(z)
    return f"""
WITH cells AS MATERIALIZED (
  SELECT CAST(round(value * 100) AS BIGINT) AS cent,
         CAST(round(value * 100) AS BIGINT) / 1e4 AS x,
         (event_type = 'purchase')::INT AS y,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2, 3),
init AS (SELECT 0.0 AS b0, 0.0 AS b1),
{",".join(_probit_iter_sql(i) for i in range(1, _PB_ITERS + 1))},
ll AS (
  SELECT sum(c.n * CAST(round(ln(CASE WHEN c.y = 1
               THEN 1.0 - {up} ELSE {up} END) * 1e9) AS BIGINT))
           ::BIGINT AS u
  FROM cells c CROSS JOIN it{_PB_ITERS} p)
SELECT (SELECT sum(n) FROM cells)::BIGINT AS n,
       round(p.b0, 6) AS b0_6, round(p.b1, 6) AS b1_6,
       round(CAST(ll.u AS DOUBLE) / 1e9, 6) AS ll6
FROM it{_PB_ITERS} p CROSS JOIN ll
"""


SQL_PROBIT = _probit_sql()


# ---------------------------------------------------------------------------
# GARCH filter
# ---------------------------------------------------------------------------


def q_garch_filter_daily(sf_dir: str):
    """GARCH(1,1) filter over daily returns (docstring above)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    y = [int(v) // 100 for v in _daily_cents(sf_dir).tolist()]
    # per-day 1e-6-quantized simple returns (half-away rounding)
    r6 = [int(math.floor(abs((float(b) - float(a)) / float(a)) * 1e6
                         + 0.5))
          * (1 if b >= a else -1)
          for a, b in zip(y[:-1], y[1:])]
    rr = [float(v) / 1e6 for v in r6]
    m = len(rr)
    s1 = sum(r6)
    s2 = sum(v * v for v in r6)
    var = (float(m * s2 - s1 * s1) / 1e12) / (float(m) * float(m))
    h = var
    ll_u = _r9(-0.5 * (math.log(2.0 * math.pi * h)
                       + rr[0] * rr[0] / h))
    for t in range(1, m):
        h = _GA_OMEGA + _GA_ALPHA * rr[t - 1] * rr[t - 1] \
            + _GA_BETA * h
        ll_u += _r9(-0.5 * (math.log(2.0 * math.pi * h)
                            + rr[t] * rr[t] / h))
    r6o = _round6(np.array([h, float(ll_u) / 1e9]))
    out = pd.DataFrame({"m": [m], "h_final6": [r6o[0]],
                        "ll6": [r6o[1]]})
    out["m"] = out["m"].astype(np.int64)
    return out


SQL_GARCH = f"""
WITH RECURSIVE dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT)) // 100 AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
ret AS (
  SELECT t - 1 AS i,
         CAST(round((CAST(y AS DOUBLE)
                     - CAST(lag(y) OVER (ORDER BY t) AS DOUBLE))
                    / CAST(lag(y) OVER (ORDER BY t) AS DOUBLE)
                    * 1e6) AS BIGINT) AS r6
  FROM seq QUALIFY t > 1),
mm AS (
  SELECT count(*)::BIGINT AS m, sum(r6)::BIGINT AS s1,
         sum(r6 * r6)::BIGINT AS s2
  FROM ret),
v0 AS (
  SELECT m,
         (CAST(m * s2 - s1 * s1 AS DOUBLE) / 1e12)
         / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)) AS var
  FROM mm),
rec AS (
  SELECT 1::BIGINT AS i, v0.var AS h,
         CAST(round(-0.5 * (ln(2.0 * pi() * v0.var)
               + (CAST(r.r6 AS DOUBLE) / 1e6)
                 * (CAST(r.r6 AS DOUBLE) / 1e6) / v0.var) * 1e9)
              AS BIGINT) AS llu
  FROM v0 JOIN ret r ON r.i = 1
  UNION ALL
  SELECT nxt.i,
         {_GA_OMEGA} + {_GA_ALPHA} * (CAST(pr.r6 AS DOUBLE) / 1e6)
           * (CAST(pr.r6 AS DOUBLE) / 1e6) + {_GA_BETA} * rec.h,
         rec.llu + CAST(round(-0.5 * (
           ln(2.0 * pi() * ({_GA_OMEGA}
              + {_GA_ALPHA} * (CAST(pr.r6 AS DOUBLE) / 1e6)
                * (CAST(pr.r6 AS DOUBLE) / 1e6)
              + {_GA_BETA} * rec.h))
           + (CAST(nxt.r6 AS DOUBLE) / 1e6)
             * (CAST(nxt.r6 AS DOUBLE) / 1e6)
             / ({_GA_OMEGA}
                + {_GA_ALPHA} * (CAST(pr.r6 AS DOUBLE) / 1e6)
                  * (CAST(pr.r6 AS DOUBLE) / 1e6)
                + {_GA_BETA} * rec.h)) * 1e9) AS BIGINT)
  FROM rec
  JOIN ret pr ON pr.i = rec.i
  JOIN ret nxt ON nxt.i = rec.i + 1)
SELECT (SELECT m FROM mm) AS m, round(h, 6) AS h_final6,
       round(CAST(llu AS DOUBLE) / 1e9, 6) AS ll6
FROM rec WHERE i = (SELECT m FROM mm)
"""


# ---------------------------------------------------------------------------
# GPH long memory
# ---------------------------------------------------------------------------


def q_gph_long_memory_daily(sf_dir: str):
    """GPH log-periodogram d estimate (docstring above)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    y = [int(v) // 100 for v in _daily_cents(sf_dir).tolist()]
    n = len(y)
    m = (n - 1) // 2
    pts = []
    for k in range(1, m + 1):
        a = sum(yy * _r9(math.cos(2.0 * math.pi * float(k)
                                  * float(t) / float(n)))
                for t, yy in enumerate(y, start=1))
        b = sum(yy * _r9(math.sin(2.0 * math.pi * float(k)
                                  * float(t) / float(n)))
                for t, yy in enumerate(y, start=1))
        p = a * a + b * b
        li = _r9(math.log(float(p) / 1e18))
        s = math.sin(math.pi * float(k) / float(n))
        wi = _r9(math.log(4.0 * s * s))
        pts.append((wi, li))
    sw = sum(p_[0] for p_ in pts)
    sl = sum(p_[1] for p_ in pts)
    sww = sum(p_[0] * p_[0] for p_ in pts)
    swl = sum(p_[0] * p_[1] for p_ in pts)
    num = m * swl - sw * sl
    den = m * sww - sw * sw
    slope = float(num) / float(den)
    d = -slope
    r6 = _round6(np.array([slope, d]))
    out = pd.DataFrame({"m": [m], "slope6": [r6[0]], "d6": [r6[1]]})
    out["m"] = out["m"].astype(np.int64)
    return out


SQL_GPH = """
WITH dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT)) // 100 AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
par AS (
  SELECT count(*)::BIGINT AS n, ((count(*) - 1) // 2)::BIGINT AS m
  FROM seq),
ks AS (SELECT unnest(range(1, m + 1)) AS k FROM par),
cells AS (
  SELECT ks.k,
         CAST(seq.y AS HUGEINT)
         * CAST(round(cos(2.0 * pi() * CAST(ks.k AS DOUBLE)
                          * CAST(seq.t AS DOUBLE)
                          / CAST(par.n AS DOUBLE)) * 1e9)
                AS BIGINT) AS ac,
         CAST(seq.y AS HUGEINT)
         * CAST(round(sin(2.0 * pi() * CAST(ks.k AS DOUBLE)
                          * CAST(seq.t AS DOUBLE)
                          / CAST(par.n AS DOUBLE)) * 1e9)
                AS BIGINT) AS bc
  FROM ks CROSS JOIN seq CROSS JOIN par),
pw AS (
  SELECT k, sum(ac) * sum(ac) + sum(bc) * sum(bc) AS p
  FROM cells GROUP BY k),
pts AS (
  SELECT CAST(round(ln(4.0 * sin(pi() * CAST(k AS DOUBLE)
                                 / CAST((SELECT n FROM par)
                                        AS DOUBLE))
                        * sin(pi() * CAST(k AS DOUBLE)
                              / CAST((SELECT n FROM par)
                                     AS DOUBLE))) * 1e9) AS BIGINT)
           AS wi,
         CAST(round(ln(CAST(p AS DOUBLE) / 1e18) * 1e9) AS BIGINT)
           AS li
  FROM pw),
s AS (
  SELECT count(*)::BIGINT AS m, sum(wi)::BIGINT AS sw,
         sum(li)::BIGINT AS sl,
         sum(CAST(wi AS HUGEINT) * wi) AS sww,
         sum(CAST(wi AS HUGEINT) * li) AS swl
  FROM pts)
SELECT m,
       round(CAST(m * swl - CAST(sw AS HUGEINT) * sl AS DOUBLE)
             / CAST(m * sww - CAST(sw AS HUGEINT) * sw AS DOUBLE),
             6) AS slope6,
       round(-(CAST(m * swl - CAST(sw AS HUGEINT) * sl AS DOUBLE)
               / CAST(m * sww - CAST(sw AS HUGEINT) * sw
                      AS DOUBLE)), 6) AS d6
FROM s
"""


QUERIES160: dict[str, tuple] = {
    "probit_2step_purchase": (q_probit_2step_purchase, SQL_PROBIT),
    "garch_filter_daily": (q_garch_filter_daily, SQL_GARCH),
    "gph_long_memory_daily": (q_gph_long_memory_daily, SQL_GPH),
}
