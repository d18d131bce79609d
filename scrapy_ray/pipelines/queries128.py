"""One-hundred-twenty-eighth oracle-query batch — signal structure of
daily order revenue (the queries47 _daily_cents device):

- ssa_leading_daily: leading SSA (singular spectrum analysis)
  eigenvalue of the L=7 trajectory Gram matrix. The 7×7 Gram cells
  are EXACT integer window products on range-quantized values
  (divisor = max(1, max//500), data-derived so every SF stays in
  exact-double territory); the power iteration runs 3 steps with
  integer floor-renormalization (target ≤ ~100) replayed in a
  recursive CTE carrying the vector as a LIST; the Rayleigh quotient
  numerator/denominator are exact integer-valued doubles (< 2^53
  throughout, verified bounds in comments).
- hjorth_params_daily: Hjorth activity/mobility/complexity from
  cleared population variances of the $1000-quantized series and its
  first two differences — n·Σx² − (Σx)² exact integers, identical
  sqrt/ratio finalization.
- cusum_squares_daily: Brown-Durbin-Evans-style CUSUM of squares on
  the $1000-quantized series (uncentered, documented): the scan
  statistic max_r |n·C_r − r·T| is a PURE integer max with argmax
  tie to the smallest r; only the final normalization divides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _US_PER_DAY, _daily_cents

_SSA_L = 7
_SSA_ITERS = 3


# ---------------------------------------------------------------------------
# SSA leading eigenvalue
# ---------------------------------------------------------------------------


def q_ssa_leading_daily(sf_dir: str):
    """Leading SSA eigenvalue via integer power iteration (docstring)."""
    cells = _daily_cents(sf_dir)
    c = [int(x) for x in cells["c"]]
    div = max(1, max(c) // 500)
    x = [v // div for v in c]
    n = len(x)
    kk = n - _SSA_L + 1
    # exact Gram cells S[i][j] = sum_k x[i+k]*x[j+k], k = 0..K-1
    s = [[sum(x[i + k] * x[j + k] for k in range(kk))
          for j in range(_SSA_L)] for i in range(_SSA_L)]
    v = [1] * _SSA_L
    for _ in range(_SSA_ITERS):
        w = [sum(s[i][j] * v[j] for j in range(_SSA_L))
             for i in range(_SSA_L)]
        dv = max(w) // 100 + 1
        v = [t // dv for t in w]
    w = [sum(s[i][j] * v[j] for j in range(_SSA_L))
         for i in range(_SSA_L)]
    num = sum(a * b for a, b in zip(v, w))
    den = sum(a * a for a in v)
    lam = float(num) / float(den)
    out = pd.DataFrame({"n_days": [n], "divisor": [div],
                        "num": [num], "den": [den],
                        "lambda6": [_round6(np.array([lam]))[0]]})
    for col in ("n_days", "divisor", "num", "den"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SSA_LEADING = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
dv AS (SELECT greatest(1, max(c) // 500) AS div FROM daily),
s AS (
  SELECT c // (SELECT div FROM dv) AS v,
         row_number() OVER (ORDER BY d) AS t,
         count(*) OVER () AS n
  FROM daily),
grid AS (SELECT unnest(range(0, {_SSA_L})) AS i),
cells AS (
  SELECT gi.i, gj.i AS j, sum(a.v * b.v)::BIGINT AS s
  FROM grid gi CROSS JOIN grid gj
  JOIN s a ON a.t >= gi.i + 1
          AND a.t <= gi.i + (SELECT max(n) - {_SSA_L} + 1 FROM s)
  JOIN s b ON b.t = a.t + (gj.i - gi.i)
  GROUP BY 1, 2),
mat AS (
  SELECT list(sl ORDER BY i) AS m
  FROM (SELECT i, list(s ORDER BY j) AS sl FROM cells GROUP BY i)),
it AS (
  SELECT 0 AS k, [1, 1, 1, 1, 1, 1, 1]::BIGINT[] AS v FROM mat
  UNION ALL
  SELECT k + 1,
         -- '//' on DOUBLE is plain division in DuckDB — floor explicitly
         [CAST(floor(w / (floor(mx / 100) + 1)) AS BIGINT) FOR w IN wv]
  FROM (
    SELECT k, wv, list_max(wv) AS mx
    FROM (
      SELECT it.k,
             [list_inner_product(m[i + 1], v) FOR i IN range(0, {_SSA_L})]
               AS wv
      FROM it CROSS JOIN mat)
  ) WHERE k < {_SSA_ITERS}),
fin AS (
  SELECT v, [list_inner_product(m[i + 1], v)
             FOR i IN range(0, {_SSA_L})] AS w
  FROM it CROSS JOIN mat WHERE k = {_SSA_ITERS}),
ray AS (
  SELECT CAST(list_inner_product(v, w) AS BIGINT) AS num,
         CAST(list_inner_product(v, v) AS BIGINT) AS den
  FROM fin)
SELECT (SELECT max(n) FROM s)::BIGINT AS n_days,
       (SELECT div FROM dv)::BIGINT AS divisor, num, den,
       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS lambda6
FROM ray
"""


# ---------------------------------------------------------------------------
# Hjorth parameters
# ---------------------------------------------------------------------------


def q_hjorth_params_daily(sf_dir: str):
    """Hjorth activity / mobility / complexity (docstring above)."""
    cells = _daily_cents(sf_dir)
    x = [int(c) // 100000 for c in cells["c"]]
    d1 = [b - a for a, b in zip(x[:-1], x[1:])]
    d2 = [b - a for a, b in zip(d1[:-1], d1[1:])]

    def cleared(seq):
        n = len(seq)
        s = sum(seq)
        q = sum(v * v for v in seq)
        return n, n * q - s * s

    n0, a0 = cleared(x)
    n1, a1 = cleared(d1)
    n2, a2 = cleared(d2)
    act = float(a0) / (float(n0) * float(n0))
    v1 = float(a1) / (float(n1) * float(n1))
    v2 = float(a2) / (float(n2) * float(n2))
    mob = np.sqrt(v1 / act)
    comp = np.sqrt(v2 / v1) / mob
    out = pd.DataFrame({"n_days": [n0],
                        "activity6": [_round6(np.array([act]))[0]],
                        "mobility6": [_round6(np.array([mob]))[0]],
                        "complexity6": [_round6(np.array([comp]))[0]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_HJORTH = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS v
  FROM daily_src GROUP BY 1),
s0 AS (SELECT v, row_number() OVER (ORDER BY d) AS t FROM daily),
s1 AS (
  SELECT v - lag(v) OVER (ORDER BY t) AS v, t FROM s0 QUALIFY t > 1),
s2 AS (
  SELECT v - lag(v) OVER (ORDER BY t) AS v, t FROM s1 QUALIFY t > 2),
m AS (
  SELECT
    (SELECT count(*)::BIGINT FROM s0) AS n0,
    (SELECT count(*)::BIGINT FROM s1) AS n1,
    (SELECT count(*)::BIGINT FROM s2) AS n2,
    (SELECT CAST(count(*) AS HUGEINT)
            * sum(CAST(v AS HUGEINT) * v)
            - CAST(sum(v) AS HUGEINT) * sum(v) FROM s0) AS a0,
    (SELECT CAST(count(*) AS HUGEINT)
            * sum(CAST(v AS HUGEINT) * v)
            - CAST(sum(v) AS HUGEINT) * sum(v) FROM s1) AS a1,
    (SELECT CAST(count(*) AS HUGEINT)
            * sum(CAST(v AS HUGEINT) * v)
            - CAST(sum(v) AS HUGEINT) * sum(v) FROM s2) AS a2),
f AS (
  SELECT n0,
    CAST(a0 AS DOUBLE) / (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE))
      AS act,
    CAST(a1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
      AS v1,
    CAST(a2 AS DOUBLE) / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE))
      AS v2
  FROM m)
SELECT n0 AS n_days, round(act, 6) AS activity6,
       round(sqrt(v1 / act), 6) AS mobility6,
       round(sqrt(v2 / v1) / sqrt(v1 / act), 6) AS complexity6
FROM f
""".replace("daily_src", "orders")


# ---------------------------------------------------------------------------
# CUSUM of squares
# ---------------------------------------------------------------------------


def q_cusum_squares_daily(sf_dir: str):
    """Integer CUSUM-of-squares scan statistic (docstring above)."""
    cells = _daily_cents(sf_dir)
    x = [int(c) // 100000 for c in cells["c"]]
    n = len(x)
    sq = [v * v for v in x]
    tot = sum(sq)
    best = None
    run = 0
    for r, q in enumerate(sq, start=1):
        run += q
        dd = abs(n * run - r * tot)
        if best is None or dd > best[0]:
            best = (dd, r)
    dd, r_star = best
    stat = float(dd) / (float(n) * float(tot))
    out = pd.DataFrame({"n_days": [n], "r_star": [r_star],
                        "d_max": [dd],
                        "stat6": [_round6(np.array([stat]))[0]]})
    for col in ("n_days", "r_star", "d_max"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CUSUM_SQUARES = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS v
  FROM orders GROUP BY 1),
s AS (SELECT v, row_number() OVER (ORDER BY d) AS t FROM daily),
ns AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(v AS HUGEINT) * v)::HUGEINT AS tot
  FROM s),
cs AS (
  SELECT t AS r,
         sum(CAST(v AS HUGEINT) * v)
           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cr
  FROM s),
dd AS (
  SELECT r, abs(CAST(n AS HUGEINT) * cr - CAST(r AS HUGEINT) * tot)
           AS dd, n, tot
  FROM cs CROSS JOIN ns),
pick AS (
  SELECT r, dd, n, tot,
         row_number() OVER (ORDER BY dd DESC, r) AS rn
  FROM dd)
SELECT n AS n_days, r AS r_star, dd::BIGINT AS d_max,
       round(CAST(dd AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS stat6
FROM pick WHERE rn = 1
"""


QUERIES128: dict[str, tuple] = {
    "ssa_leading_daily": (q_ssa_leading_daily, SQL_SSA_LEADING),
    "hjorth_params_daily": (q_hjorth_params_daily, SQL_HJORTH),
    "cusum_squares_daily": (q_cusum_squares_daily, SQL_CUSUM_SQUARES),
}
