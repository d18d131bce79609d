"""One-hundred-ninety-fourth oracle-query batch — distributional
shape tests:

- vonmises_kappa_tod: the von Mises fit of event time-of-day angles
  — C, S trig sums nano-quantized to integers, mean direction from
  atan2, concentration κ by Fisher's standard piecewise
  approximation (identical literal polynomial both sides).
- dagostino_k2_values: the D'Agostino–Pearson K² omnibus normality
  test on event values — third/fourth central moments cleared to
  exact HUGEINT/Python-int numerators (S⁴ stays under the HUGEINT
  ceiling through sf0.1), the skewness Z1 (Johnson SU) and
  kurtosis Z2 (Anscombe–Glynn, cbrt — shared libm) transforms as
  one identical float chain.
- shapiro_francia_daily: the Shapiro–Francia normality W′ of the 30
  daily revenues — Blom normal scores Φ⁻¹((i−3/8)/(n+1/4)) bisected
  ONCE against the shared A&S polynomial and embedded as 30
  literals in the SQL (the BCa device); W′ = corr²(scores, sorted
  values) with 1e-6-quantized cross terms. Asserts n = 30.
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
from scrapy_ray.pipelines.queries169 import _daily_xmy
from scrapy_ray.pipelines.queries178 import _phi, _phi_inv

_T_US = 86_400_000_000
_SF_N = 30
_BLOM = [_phi_inv((i - 0.375) / (_SF_N + 0.25))
         for i in range(1, _SF_N + 1)]


# ---------------------------------------------------------------------------
# von Mises
# ---------------------------------------------------------------------------


def q_vonmises_kappa_tod(sf_dir: str):
    """Fisher κ of time-of-day angles (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts"])

    def tpart(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ang = 2.0 * math.pi * ((us % _T_US).astype(np.float64)
                               / float(_T_US))
        co = np.cos(ang)
        si = np.sin(ang)

        def q9(x):
            return int((np.sign(x)
                        * np.floor(np.abs(x) * 1e9 + 0.5))
                       .astype(np.int64).sum())

        return pa.table({"k": pa.array([0], pa.int64()),
                         "c": pa.array([q9(co)], pa.int64()),
                         "s": pa.array([q9(si)], pa.int64()),
                         "n": pa.array([len(us)], pa.int64())})

    agg = (ds.map_batches(tpart, batch_format="pyarrow")
             .groupby("k").aggregate(Sum("c", alias_name="c"),
                                     Sum("s", alias_name="s"),
                                     Sum("n", alias_name="n"))
             .to_pandas())
    n = int(agg["n"].iloc[0])
    cb = float(int(agg["c"].iloc[0])) / 1e9 / n
    sb = float(int(agg["s"].iloc[0])) / 1e9 / n
    rb = math.sqrt(cb * cb + sb * sb)
    mu = math.atan2(sb, cb)
    if rb < 0.53:
        kap = 2.0 * rb + rb * rb * rb \
            + 5.0 * rb * rb * rb * rb * rb / 6.0
    elif rb < 0.85:
        kap = -0.4 + 1.39 * rb + 0.43 / (1.0 - rb)
    else:
        kap = 1.0 / (rb ** 3 - 4.0 * rb * rb + 3.0 * rb)
    r6 = _round6(np.array([rb, mu, kap]))
    out = pd.DataFrame({"n_events": [n], "rbar6": [r6[0]],
                        "mu6": [r6[1]], "kappa6": [r6[2]]})
    out["n_events"] = out["n_events"].astype(np.int64)
    return out


SQL_VONMISES = f"""
WITH t AS (
  SELECT 2.0 * pi() * (CAST(epoch_us(ts) % {_T_US} AS DOUBLE)
                       / {float(_T_US)!r}) AS ang
  FROM events),
s AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(CASE WHEN cos(ang) >= 0
               THEN floor(abs(cos(ang)) * 1e9 + 5e-1)
               ELSE -floor(abs(cos(ang)) * 1e9 + 5e-1) END
               AS BIGINT))::BIGINT AS c,
         sum(CAST(CASE WHEN sin(ang) >= 0
               THEN floor(abs(sin(ang)) * 1e9 + 5e-1)
               ELSE -floor(abs(sin(ang)) * 1e9 + 5e-1) END
               AS BIGINT))::BIGINT AS sq
  FROM t),
f AS (
  SELECT n, CAST(c AS DOUBLE) / 1e9 / n AS cb,
         CAST(sq AS DOUBLE) / 1e9 / n AS sb
  FROM s),
g AS (
  SELECT n, cb, sb, sqrt(cb * cb + sb * sb) AS rb FROM f)
SELECT n AS n_events, round(rb, 6) AS rbar6,
       round(atan2(sb, cb), 6) AS mu6,
       round(CASE WHEN rb < 0.53
               THEN 2.0 * rb + rb * rb * rb
                    + 5.0 * rb * rb * rb * rb * rb / 6.0
             WHEN rb < 0.85
               THEN -0.4 + 1.39 * rb + 0.43 / (1.0 - rb)
             ELSE 1.0 / (rb * rb * rb - 4.0 * rb * rb + 3.0 * rb)
             END, 6) AS kappa6
FROM g
"""


# ---------------------------------------------------------------------------
# D'Agostino K2
# ---------------------------------------------------------------------------


def q_dagostino_k2_values(sf_dir: str):
    """Omnibus K² on event values (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["value"])

    def mpart(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        ci = [int(x) for x in c]
        return pa.table({
            "n": pa.array([len(ci)], pa.int64()),
            "s1": pa.array([sum(ci)], pa.int64()),
            "s2": pa.array([str(sum(x * x for x in ci))],
                           pa.string()),
            "s3": pa.array([str(sum(x * x * x for x in ci))],
                           pa.string()),
            "s4": pa.array([str(sum(x * x * x * x for x in ci))],
                           pa.string())})

    parts = ds.map_batches(mpart, batch_format="pyarrow") \
        .to_pandas()
    n = int(parts["n"].sum())
    s1 = int(parts["s1"].sum())
    s2 = sum(int(v) for v in parts["s2"])
    s3 = sum(int(v) for v in parts["s3"])
    s4 = sum(int(v) for v in parts["s4"])
    m2n = n * s2 - s1 * s1
    m3n = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
    m4n = (n ** 3 * s4 - 4 * n * n * s1 * s3
           + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
    fn = float(n)
    m2 = float(m2n) / (fn * fn)
    m3 = float(m3n) / (fn * fn * fn)
    m4 = float(m4n) / (fn * fn * fn * fn)
    g1 = m3 / (m2 * math.sqrt(m2))
    b2 = m4 / (m2 * m2)
    nn = float(n)
    y = g1 * math.sqrt((nn + 1.0) * (nn + 3.0)
                       / (6.0 * (nn - 2.0)))
    beta2 = (3.0 * (nn * nn + 27.0 * nn - 70.0) * (nn + 1.0)
             * (nn + 3.0)
             / ((nn - 2.0) * (nn + 5.0) * (nn + 7.0)
                * (nn + 9.0)))
    w2 = -1.0 + math.sqrt(2.0 * (beta2 - 1.0))
    dd = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    al = math.sqrt(2.0 / (w2 - 1.0))
    z1 = dd * math.log(y / al + math.sqrt((y / al) * (y / al)
                                          + 1.0))
    eb = 3.0 * (nn - 1.0) / (nn + 1.0)
    vb = (24.0 * nn * (nn - 2.0) * (nn - 3.0)
          / ((nn + 1.0) * (nn + 1.0) * (nn + 3.0) * (nn + 5.0)))
    x = (b2 - eb) / math.sqrt(vb)
    sb1 = (6.0 * (nn * nn - 5.0 * nn + 2.0)
           / ((nn + 7.0) * (nn + 9.0))
           * math.sqrt(6.0 * (nn + 3.0) * (nn + 5.0)
                       / (nn * (nn - 2.0) * (nn - 3.0))))
    aa = 6.0 + 8.0 / sb1 * (2.0 / sb1
                            + math.sqrt(1.0 + 4.0 / (sb1 * sb1)))
    z2 = (((1.0 - 2.0 / (9.0 * aa))
           - math.cbrt((1.0 - 2.0 / aa)
                       / (1.0 + x * math.sqrt(2.0 / (aa - 4.0)))))
          / math.sqrt(2.0 / (9.0 * aa)))
    k2 = z1 * z1 + z2 * z2
    r6 = _round6(np.array([g1, b2, z1, z2, k2]))
    out = pd.DataFrame({"n_events": [n], "g1_6": [r6[0]],
                        "b2_6": [r6[1]], "z1_6": [r6[2]],
                        "z2_6": [r6[3]], "k2_6": [r6[4]]})
    out["n_events"] = out["n_events"].astype(np.int64)
    return out


SQL_DAGOSTINO = """
WITH mom AS (
  SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s1,
         sum(CAST(c AS HUGEINT) * c) AS s2,
         sum(CAST(c AS HUGEINT) * c * c) AS s3,
         sum(CAST(c AS HUGEINT) * c * c * c) AS s4
  FROM (SELECT CAST(round(value * 100) AS BIGINT) AS c
        FROM events)),
ms AS (
  SELECT n,
         CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS m2,
         CAST(CAST(n AS HUGEINT) * n * s3
              - 3 * n * CAST(s1 AS HUGEINT) * s2
              + 2 * CAST(s1 AS HUGEINT) * s1 * s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
              * CAST(n AS DOUBLE)) AS m3,
         CAST(CAST(n AS HUGEINT) * n * n * s4
              - 4 * CAST(n AS HUGEINT) * n
                * CAST(s1 AS HUGEINT) * s3
              + 6 * n * CAST(s1 AS HUGEINT) * s1 * s2
              - 3 * CAST(s1 AS HUGEINT) * s1 * s1 * s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
              * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS m4
  FROM mom),
gs AS (
  SELECT CAST(n AS DOUBLE) AS nn,
         m3 / (m2 * sqrt(m2)) AS g1, m4 / (m2 * m2) AS b2, n
  FROM ms),
z1c AS (
  SELECT nn, g1, b2, n,
         g1 * sqrt((nn + 1.0) * (nn + 3.0)
                   / (6.0 * (nn - 2.0))) AS y,
         -1.0 + sqrt(2.0 * ((3.0 * (nn * nn + 27.0 * nn - 70.0)
                             * (nn + 1.0) * (nn + 3.0)
                             / ((nn - 2.0) * (nn + 5.0)
                                * (nn + 7.0) * (nn + 9.0)))
                            - 1.0)) AS w2
  FROM gs),
z1f AS (
  SELECT nn, g1, b2, n,
         (1.0 / sqrt(ln(sqrt(w2))))
         * ln(y / sqrt(2.0 / (w2 - 1.0))
              + sqrt((y / sqrt(2.0 / (w2 - 1.0)))
                     * (y / sqrt(2.0 / (w2 - 1.0))) + 1.0)) AS z1
  FROM z1c),
z2c AS (
  SELECT nn, g1, b2, n, z1,
         (b2 - 3.0 * (nn - 1.0) / (nn + 1.0))
         / sqrt(24.0 * nn * (nn - 2.0) * (nn - 3.0)
                / ((nn + 1.0) * (nn + 1.0) * (nn + 3.0)
                   * (nn + 5.0))) AS x,
         6.0 + 8.0 / (6.0 * (nn * nn - 5.0 * nn + 2.0)
                      / ((nn + 7.0) * (nn + 9.0))
                      * sqrt(6.0 * (nn + 3.0) * (nn + 5.0)
                             / (nn * (nn - 2.0) * (nn - 3.0))))
               * (2.0 / (6.0 * (nn * nn - 5.0 * nn + 2.0)
                         / ((nn + 7.0) * (nn + 9.0))
                         * sqrt(6.0 * (nn + 3.0) * (nn + 5.0)
                                / (nn * (nn - 2.0)
                                   * (nn - 3.0))))
                  + sqrt(1.0 + 4.0
                         / ((6.0 * (nn * nn - 5.0 * nn + 2.0)
                             / ((nn + 7.0) * (nn + 9.0))
                             * sqrt(6.0 * (nn + 3.0) * (nn + 5.0)
                                    / (nn * (nn - 2.0)
                                       * (nn - 3.0))))
                            * (6.0 * (nn * nn - 5.0 * nn + 2.0)
                               / ((nn + 7.0) * (nn + 9.0))
                               * sqrt(6.0 * (nn + 3.0)
                                      * (nn + 5.0)
                                      / (nn * (nn - 2.0)
                                         * (nn - 3.0))))))) AS aa
  FROM z1f),
z2f AS (
  SELECT n, g1, b2, z1,
         ((1.0 - 2.0 / (9.0 * aa))
          - cbrt((1.0 - 2.0 / aa)
                 / (1.0 + x * sqrt(2.0 / (aa - 4.0)))))
         / sqrt(2.0 / (9.0 * aa)) AS z2
  FROM z2c)
SELECT n AS n_events, round(g1, 6) AS g1_6, round(b2, 6) AS b2_6,
       round(z1, 6) AS z1_6, round(z2, 6) AS z2_6,
       round(z1 * z1 + z2 * z2, 6) AS k2_6
FROM z2f
"""


# ---------------------------------------------------------------------------
# Shapiro-Francia
# ---------------------------------------------------------------------------


def q_shapiro_francia_daily(sf_dir: str):
    """W' against embedded Blom scores (docstring above)."""
    dly = _daily_xmy(sf_dir)
    y = sorted(int(v) for v in dly["y"])
    n = len(y)
    assert n == _SF_N, f"Blom table embedded for n={_SF_N}"
    sb = math.fsum(_BLOM)
    sbb = math.fsum(b * b for b in _BLOM)
    sx = sum(y)
    sxx = sum(v * v for v in y)
    sbx_q = sum(int(math.copysign(
        math.floor(abs(b * (v / 100.0)) * 1e6 + 0.5),
        b * v)) for b, v in zip(_BLOM, y))
    sbx = float(sbx_q) / 1e6
    sxd = float(sx) / 100.0
    sxxd = float(sxx) / 1e4
    num = n * sbx - sb * sxd
    den = (n * sbb - sb * sb) * (n * sxxd - sxd * sxd)
    w = (num * num) / den
    r6 = _round6(np.array([w]))[0]
    out = pd.DataFrame({"n_days": [n], "w6": [r6]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


_BLOM_LIT = "[" + ", ".join(repr(v) for v in _BLOM) + "]"
_SB_LIT = repr(math.fsum(_BLOM))
_SBB_LIT = repr(math.fsum(b * b for b in _BLOM))

SQL_SF = f"""
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
srt AS (
  SELECT y, row_number() OVER (ORDER BY y) AS i FROM dly),
bl AS (SELECT {_BLOM_LIT}::DOUBLE[] AS b),
terms AS (
  SELECT srt.i, srt.y,
         CAST(CASE WHEN (SELECT b FROM bl)[srt.i]
                        * (CAST(srt.y AS DOUBLE) / 100.0) >= 0
           THEN floor(abs((SELECT b FROM bl)[srt.i]
                          * (CAST(srt.y AS DOUBLE) / 100.0))
                      * 1e6 + 5e-1)
           ELSE -floor(abs((SELECT b FROM bl)[srt.i]
                           * (CAST(srt.y AS DOUBLE) / 100.0))
                       * 1e6 + 5e-1) END AS BIGINT) AS bxq
  FROM srt),
s AS (
  SELECT count(*)::BIGINT AS n, sum(bxq)::BIGINT AS sbxq,
         (SELECT sum(y) FROM srt)::BIGINT AS sx,
         (SELECT sum(CAST(y AS HUGEINT) * y) FROM srt) AS sxx
  FROM terms),
f AS (
  SELECT n,
         n * (CAST(sbxq AS DOUBLE) / 1e6)
         - {_SB_LIT} * (CAST(sx AS DOUBLE) / 100.0) AS num,
         (n * {_SBB_LIT} - {_SB_LIT} * {_SB_LIT})
         * (n * (CAST(sxx AS DOUBLE) / 1e4)
            - (CAST(sx AS DOUBLE) / 100.0)
              * (CAST(sx AS DOUBLE) / 100.0)) AS den
  FROM s)
SELECT n AS n_days, round((num * num) / den, 6) AS w6
FROM f
"""


QUERIES194: dict[str, tuple] = {
    "vonmises_kappa_tod": (q_vonmises_kappa_tod, SQL_VONMISES),
    "dagostino_k2_values": (q_dagostino_k2_values, SQL_DAGOSTINO),
    "shapiro_francia_daily": (q_shapiro_francia_daily, SQL_SF),
}
