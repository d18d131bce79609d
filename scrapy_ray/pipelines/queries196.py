"""One-hundred-ninety-sixth oracle-query batch — method-comparison
and robust location on the daily series:

- bland_altman_daily: Bland–Altman agreement between the daily click
  and view counts — bias = mean difference and the ±1.96·sd limits
  of agreement from exact integer difference moments.
- deming_regression_daily: Deming/total-least-squares (λ = 1)
  regression of views on clicks — the orthogonal slope
  (c_yy − c_xx + sqrt((c_yy − c_xx)² + 4c_xy²)) / (2c_xy) with
  every centered sum a HUGEINT/Python-int numerator, compared
  against the OLS slope from the same integers.
- weiszfeld_median_daily: the geometric (spatial) median of the 30
  daily (clicks, views) points by 10 Weiszfeld iterations — the
  (gx, gy) state requantized to 1e-9 each step and every 1/distance
  weight term quantized to 1e-9 BEFORE summing (order-free);
  coincident points (dist < 1e-9) are skipped by the same rule on
  both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries169 import _daily_xmy

_WZ_IT = 10


# ---------------------------------------------------------------------------
# Bland-Altman
# ---------------------------------------------------------------------------


def q_bland_altman_daily(sf_dir: str):
    """Limits of agreement clicks vs views (docstring above)."""
    dly = _daily_xmy(sf_dir)
    d = [int(a) - int(b) for a, b in zip(dly["x"], dly["m"])]
    n = len(d)
    s1 = sum(d)
    s2 = sum(v * v for v in d)
    bias = float(s1) / float(n)
    sd = math.sqrt(float(n * s2 - s1 * s1)
                   / (float(n) * float(n - 1)))
    lo = bias - 1.96 * sd
    hi = bias + 1.96 * sd
    outside = sum(1 for v in d if v < lo or v > hi)
    r6 = _round6(np.array([bias, sd, lo, hi]))
    out = pd.DataFrame({"n_days": [n], "n_outside": [outside],
                        "bias6": [r6[0]], "sd6": [r6[1]],
                        "loa_lo6": [r6[2]], "loa_hi6": [r6[3]]})
    for col in ("n_days", "n_outside"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BLAND = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'view')::INT)::BIGINT AS m
  FROM events GROUP BY 1),
d AS (SELECT x - m AS d FROM dly),
s AS (
  SELECT count(*)::BIGINT AS n, sum(d)::BIGINT AS s1,
         sum(CAST(d AS HUGEINT) * d) AS s2
  FROM d),
f AS (
  SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS bias,
         sqrt(CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sd
  FROM s),
o AS (
  SELECT (SELECT count(*) FROM d, f
          WHERE d.d < f.bias - 1.96 * f.sd
             OR d.d > f.bias + 1.96 * f.sd)::BIGINT AS outside)
SELECT f.n AS n_days, o.outside AS n_outside,
       round(f.bias, 6) AS bias6, round(f.sd, 6) AS sd6,
       round(f.bias - 1.96 * f.sd, 6) AS loa_lo6,
       round(f.bias + 1.96 * f.sd, 6) AS loa_hi6
FROM f, o
"""


# ---------------------------------------------------------------------------
# Deming regression
# ---------------------------------------------------------------------------


def q_deming_regression_daily(sf_dir: str):
    """Orthogonal (TLS) slope views ~ clicks (docstring)."""
    dly = _daily_xmy(sf_dir)
    x = [int(v) for v in dly["x"]]
    y = [int(v) for v in dly["m"]]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    syy = sum(v * v for v in y)
    sxy = sum(a * b for a, b in zip(x, y))
    cxx = n * sxx - sx * sx
    cyy = n * syy - sy * sy
    cxy = n * sxy - sx * sy
    b_tls = (float(cyy - cxx)
             + math.sqrt(float(cyy - cxx) * float(cyy - cxx)
                         + 4.0 * float(cxy) * float(cxy))) \
        / (2.0 * float(cxy))
    b_ols = float(cxy) / float(cxx)
    a_tls = (float(sy) - b_tls * float(sx)) / n
    r6 = _round6(np.array([b_tls, a_tls, b_ols]))
    out = pd.DataFrame({"n_days": [n], "b_tls6": [r6[0]],
                        "a_tls6": [r6[1]], "b_ols6": [r6[2]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_DEMING = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'view')::INT)::BIGINT AS y
  FROM events GROUP BY 1),
s AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM dly),
c AS (
  SELECT n, sx, sy,
         n * sxx - CAST(sx AS HUGEINT) * sx AS cxx,
         n * syy - CAST(sy AS HUGEINT) * sy AS cyy,
         n * sxy - CAST(sx AS HUGEINT) * sy AS cxy
  FROM s),
f AS (
  SELECT n, sx, sy, cxx, cxy,
         (CAST(cyy - cxx AS DOUBLE)
          + sqrt(CAST(cyy - cxx AS DOUBLE)
                 * CAST(cyy - cxx AS DOUBLE)
                 + 4.0 * CAST(cxy AS DOUBLE)
                   * CAST(cxy AS DOUBLE)))
         / (2.0 * CAST(cxy AS DOUBLE)) AS b_tls
  FROM c)
SELECT n AS n_days, round(b_tls, 6) AS b_tls6,
       round((CAST(sy AS DOUBLE) - b_tls * CAST(sx AS DOUBLE))
             / n, 6) AS a_tls6,
       round(CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE), 6)
         AS b_ols6
FROM f
"""


# ---------------------------------------------------------------------------
# Weiszfeld geometric median
# ---------------------------------------------------------------------------


def q_weiszfeld_median_daily(sf_dir: str):
    """10 Weiszfeld iterations on daily points (docstring)."""
    dly = _daily_xmy(sf_dir)
    pts = [(int(a), int(b)) for a, b in zip(dly["x"], dly["m"])]
    n = len(pts)
    gx = float(sum(p[0] for p in pts)) / n
    gy = float(sum(p[1] for p in pts)) / n
    gxq = int(math.floor(gx * 1e9 + 0.5))
    gyq = int(math.floor(gy * 1e9 + 0.5))
    for _ in range(_WZ_IT):
        cx = float(gxq) / 1e9
        cy = float(gyq) / 1e9
        swq = 0
        sxq = 0
        syq = 0
        for px, py in pts:
            dx = px - cx
            dy = py - cy
            dist = math.sqrt(dx * dx + dy * dy)
            if dist < 1e-9:
                continue
            w = 1.0 / dist
            swq += int(math.floor(w * 1e9 + 0.5))
            sxq += int(math.copysign(
                math.floor(abs(w * px) * 1e9 + 0.5), w * px))
            syq += int(math.copysign(
                math.floor(abs(w * py) * 1e9 + 0.5), w * py))
        gxq = int(math.floor(
            float(sxq) / float(swq) * 1e9 + 0.5))
        gyq = int(math.floor(
            float(syq) / float(swq) * 1e9 + 0.5))
    r6 = _round6(np.array([float(gxq) / 1e9, float(gyq) / 1e9]))
    out = pd.DataFrame({"n_days": [n], "gx6": [r6[0]],
                        "gy6": [r6[1]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_WEISZFELD = f"""
WITH RECURSIVE dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'view')::INT)::BIGINT AS m
  FROM events GROUP BY 1),
init AS (
  SELECT count(*)::BIGINT AS n,
         CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)
                    * 1e9 + 5e-1) AS BIGINT) AS gxq,
         CAST(floor(CAST(sum(m) AS DOUBLE) / count(*)
                    * 1e9 + 5e-1) AS BIGINT) AS gyq
  FROM dly),
wz AS (
  SELECT 0 AS it, n, gxq, gyq FROM init
  UNION ALL
  SELECT it + 1, n,
         CAST(floor(CAST(sxq AS DOUBLE) / CAST(swq AS DOUBLE)
                    * 1e9 + 5e-1) AS BIGINT),
         CAST(floor(CAST(syq AS DOUBLE) / CAST(swq AS DOUBLE)
                    * 1e9 + 5e-1) AS BIGINT)
  FROM (
    SELECT w.it, w.n, w.gxq, w.gyq,
           (SELECT sum(CAST(floor(
              1.0 / sqrt((d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                         * (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                         + (d.m - CAST(w.gyq AS DOUBLE) / 1e9)
                           * (d.m - CAST(w.gyq AS DOUBLE) / 1e9))
              * 1e9 + 5e-1) AS BIGINT))
            FROM dly d
            WHERE sqrt((d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                       * (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                       + (d.m - CAST(w.gyq AS DOUBLE) / 1e9)
                         * (d.m - CAST(w.gyq AS DOUBLE) / 1e9))
                  >= 1e-9) AS swq,
           (SELECT sum(CAST(CASE WHEN
              1.0 / sqrt((d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                         * (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                         + (d.m - CAST(w.gyq AS DOUBLE) / 1e9)
                           * (d.m - CAST(w.gyq AS DOUBLE) / 1e9))
              * d.x >= 0
              THEN floor(abs(1.0 / sqrt(
                (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                * (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                + (d.m - CAST(w.gyq AS DOUBLE) / 1e9)
                  * (d.m - CAST(w.gyq AS DOUBLE) / 1e9))
                * d.x) * 1e9 + 5e-1)
              ELSE -floor(abs(1.0 / sqrt(
                (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                * (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                + (d.m - CAST(w.gyq AS DOUBLE) / 1e9)
                  * (d.m - CAST(w.gyq AS DOUBLE) / 1e9))
                * d.x) * 1e9 + 5e-1) END AS BIGINT))
            FROM dly d
            WHERE sqrt((d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                       * (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                       + (d.m - CAST(w.gyq AS DOUBLE) / 1e9)
                         * (d.m - CAST(w.gyq AS DOUBLE) / 1e9))
                  >= 1e-9) AS sxq,
           (SELECT sum(CAST(CASE WHEN
              1.0 / sqrt((d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                         * (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                         + (d.m - CAST(w.gyq AS DOUBLE) / 1e9)
                           * (d.m - CAST(w.gyq AS DOUBLE) / 1e9))
              * d.m >= 0
              THEN floor(abs(1.0 / sqrt(
                (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                * (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                + (d.m - CAST(w.gyq AS DOUBLE) / 1e9)
                  * (d.m - CAST(w.gyq AS DOUBLE) / 1e9))
                * d.m) * 1e9 + 5e-1)
              ELSE -floor(abs(1.0 / sqrt(
                (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                * (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                + (d.m - CAST(w.gyq AS DOUBLE) / 1e9)
                  * (d.m - CAST(w.gyq AS DOUBLE) / 1e9))
                * d.m) * 1e9 + 5e-1) END AS BIGINT))
            FROM dly d
            WHERE sqrt((d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                       * (d.x - CAST(w.gxq AS DOUBLE) / 1e9)
                       + (d.m - CAST(w.gyq AS DOUBLE) / 1e9)
                         * (d.m - CAST(w.gyq AS DOUBLE) / 1e9))
                  >= 1e-9) AS syq
    FROM wz w WHERE w.it < {_WZ_IT}) q)
SELECT n AS n_days,
       round(CAST(gxq AS DOUBLE) / 1e9, 6) AS gx6,
       round(CAST(gyq AS DOUBLE) / 1e9, 6) AS gy6
FROM wz WHERE it = {_WZ_IT}
"""


QUERIES196: dict[str, tuple] = {
    "bland_altman_daily": (q_bland_altman_daily, SQL_BLAND),
    "deming_regression_daily": (q_deming_regression_daily,
                                SQL_DEMING),
    "weiszfeld_median_daily": (q_weiszfeld_median_daily,
                               SQL_WEISZFELD),
}
