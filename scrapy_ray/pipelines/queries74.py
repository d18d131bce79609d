"""Seventy-fourth oracle-query batch — two-sample distribution toolkit
on the shared click/view per-cent histogram (one distributed
groupby((g,c)).Sum; everything downstream exact driver-side):

- cucconi_click_view: Cucconi combined location-scale test.  With
  DOUBLED midranks dr_b = 2*cum_prev + l + 1 (exact ints under ties)
  and contrary doubled ranks cdr_b = 2(N+1) - dr_b, the rank-square
  sums A = SUM h2*dr^2 and B = SUM h2*cdr^2 are exact int64
  (~1e15 at sf0.1); U = (3A - 2*n2(N+1)(2N+1)) / (2*sqrt(D)) with
  D = n1*n2*(N+1)*(2N+1)*(8N+11)/5 (the /5 kept in float — the
  product reaches ~3e24, Python int / HUGEINT), V symmetric with B,
  rho = 2(N^2-4)/((2N+1)(8N+11)) - 1, and
  C = (U^2 + V^2 - 2 rho U V)/(2(1 - rho^2)) — all
  identical-expression floats of exact integers.
- hist_divergences_click_view: four histogram divergences at once —
  total variation TV = SUM |h1*n2 - h2*n1| / (2 n1 n2) (ONE exact
  int numerator), overlapping coefficient
  OVL = SUM min(h1*n2, h2*n1) / (n1 n2) (exact int), Bhattacharyya
  coefficient BC = SUM sqrt(h1*h2) / sqrt(n1*n2) with each
  per-cell sqrt(h1*h2) 1e-6-quantized (sqrt is IEEE
  correctly-rounded — portable) and integer-summed, and Hellinger
  H = sqrt(1 - BC) identical-expression.
- decile_shift_click_view: the quantile shift function at
  q = 10%..90%: per-group exact disc quantiles (element at 1-based
  rank ceil(q*n_g), DuckDB quantile_disc semantics) read off the
  per-group cumsums of the same histogram; shift = view - click in
  exact cents.  A robust localized complement to the single-number
  Hodges-Lehmann shift (queries64).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries67 import _cv_hist

_DECILES = (10, 20, 30, 40, 50, 60, 70, 80, 90)


# ---------------------------------------------------------------------------
# Cucconi
# ---------------------------------------------------------------------------


def q_cucconi_click_view(sf_dir: str):
    """Cucconi combined location-scale C (docstring above)."""
    support, h1, h2 = _cv_hist(sf_dir)
    ell = h1 + h2
    nn = int(ell.sum())
    n1 = int(h1.sum())
    n2 = nn - n1
    cum = np.cumsum(ell)
    dr = 2 * (cum - ell) + ell + 1
    cdr = 2 * (nn + 1) - dr
    a = int(h2.astype(object).dot(dr.astype(object) ** 2))
    b = int(h2.astype(object).dot(cdr.astype(object) ** 2))
    d_big = n1 * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11)
    den = 2.0 * math.sqrt(float(d_big) / 5.0)
    u = float(3 * a - 2 * n2 * (nn + 1) * (2 * nn + 1)) / den
    v = float(3 * b - 2 * n2 * (nn + 1) * (2 * nn + 1)) / den
    rho = 2.0 * float(nn * nn - 4) \
        / float((2 * nn + 1) * (8 * nn + 11)) - 1.0
    c_stat = (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1.0 - rho * rho))
    out = pd.DataFrame({"n_click": [n1], "n_view": [n2],
                        "a_sq": [a], "b_sq": [b],
                        "u6": [_round6(np.array([u]))[0]],
                        "v6": [_round6(np.array([v]))[0]],
                        "c6": [_round6(np.array([c_stat]))[0]]})
    for col in ("n_click", "n_view", "a_sq", "b_sq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CUCCONI = """
WITH e AS (
  SELECT CAST(event_type = 'view' AS INT) AS g,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'view')),
cells AS (
  SELECT c, count(*) FILTER (WHERE g = 1)::BIGINT AS h2,
         count(*)::BIGINT AS l
  FROM e GROUP BY c),
st AS (SELECT sum(l)::BIGINT AS nn, sum(h2)::BIGINT AS n2 FROM cells),
w AS (
  SELECT h2, l, sum(l) OVER (ORDER BY c)::BIGINT AS cum, nn
  FROM cells, st),
ab AS (
  SELECT
    sum(h2 * (2 * (cum - l) + l + 1)::HUGEINT
           * (2 * (cum - l) + l + 1))::HUGEINT AS a_sq,
    sum(h2 * (2 * (nn + 1) - (2 * (cum - l) + l + 1))::HUGEINT
           * (2 * (nn + 1) - (2 * (cum - l) + l + 1)))::HUGEINT AS b_sq
  FROM w),
f AS (
  SELECT nn, n2, nn - n2 AS n1, a_sq, b_sq,
         2.0 * sqrt(CAST((nn - n2)::HUGEINT * n2 * (nn + 1)
                         * (2 * nn + 1) * (8 * nn + 11) AS DOUBLE)
                    / 5.0) AS den,
         2.0 * CAST(nn::HUGEINT * nn - 4 AS DOUBLE)
           / CAST((2 * nn + 1)::HUGEINT * (8 * nn + 11) AS DOUBLE) - 1.0
           AS rho
  FROM st, ab),
z AS (
  SELECT n1, n2, a_sq, b_sq, rho,
         CAST(3 * a_sq - 2 * n2::HUGEINT * (nn + 1) * (2 * nn + 1)
              AS DOUBLE) / den AS u,
         CAST(3 * b_sq - 2 * n2::HUGEINT * (nn + 1) * (2 * nn + 1)
              AS DOUBLE) / den AS v
  FROM f)
SELECT n1 AS n_click, n2 AS n_view, a_sq::BIGINT AS a_sq,
       b_sq::BIGINT AS b_sq,
       round(u, 6) AS u6, round(v, 6) AS v6,
       round((u * u + v * v - 2.0 * rho * u * v)
             / (2.0 * (1.0 - rho * rho)), 6) AS c6
FROM z
"""


# ---------------------------------------------------------------------------
# Histogram divergences
# ---------------------------------------------------------------------------


def q_hist_divergences_click_view(sf_dir: str):
    """TV / OVL / Bhattacharyya / Hellinger off one histogram
    (docstring above)."""
    support, h1, h2 = _cv_hist(sf_dir)
    n1, n2 = int(h1.sum()), int(h2.sum())
    a = h1 * n2
    b = h2 * n1
    tv_big = int(np.abs(a - b).sum())
    ovl_big = int(np.minimum(a, b).sum())
    bc_q = int(np.floor(np.sqrt((h1 * h2).astype(np.float64))
                        * 1000000.0 + 0.5).astype(np.int64).sum())
    tv = float(tv_big) / float(2 * n1 * n2)
    ovl = float(ovl_big) / float(n1 * n2)
    bc = float(bc_q) / 1000000.0 / math.sqrt(float(n1) * float(n2))
    hell = math.sqrt(1.0 - bc)
    out = pd.DataFrame({"n_click": [n1], "n_view": [n2],
                        "tv_big": [tv_big], "ovl_big": [ovl_big],
                        "bc_q": [bc_q],
                        "tv6": [_round6(np.array([tv]))[0]],
                        "ovl6": [_round6(np.array([ovl]))[0]],
                        "bc6": [_round6(np.array([bc]))[0]],
                        "hellinger6": [_round6(np.array([hell]))[0]]})
    for col in ("n_click", "n_view", "tv_big", "ovl_big", "bc_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HIST_DIVERGENCES = """
WITH e AS (
  SELECT CAST(event_type = 'view' AS INT) AS g,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'view')),
h AS (
  SELECT c, sum((g = 0)::INT)::BIGINT AS h1,
         sum((g = 1)::INT)::BIGINT AS h2
  FROM e GROUP BY 1),
t AS (SELECT sum(h1)::BIGINT AS n1, sum(h2)::BIGINT AS n2 FROM h),
u AS (
  SELECT sum(abs(h1 * n2 - h2 * n1))::BIGINT AS tv_big,
         sum(least(h1 * n2, h2 * n1))::BIGINT AS ovl_big,
         sum(CAST(round(sqrt(CAST(h1 * h2 AS DOUBLE)) * 1000000.0)
                  AS BIGINT))::BIGINT AS bc_q
  FROM h CROSS JOIN t)
SELECT n1 AS n_click, n2 AS n_view, tv_big, ovl_big, bc_q,
       round(CAST(tv_big AS DOUBLE)
             / CAST(2 * n1::HUGEINT * n2 AS DOUBLE), 6) AS tv6,
       round(CAST(ovl_big AS DOUBLE)
             / CAST(n1::HUGEINT * n2 AS DOUBLE), 6) AS ovl6,
       round(CAST(bc_q AS DOUBLE) / 1000000.0
             / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS bc6,
       round(sqrt(1.0 - CAST(bc_q AS DOUBLE) / 1000000.0
                        / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))),
             6) AS hellinger6
FROM u CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Decile shift function
# ---------------------------------------------------------------------------


def q_decile_shift_click_view(sf_dir: str):
    """Exact per-decile quantile shift view - click in cents (docstring
    above)."""
    support, h1, h2 = _cv_hist(sf_dir)
    c1 = np.cumsum(h1)
    c2 = np.cumsum(h2)
    n1, n2 = int(c1[-1]), int(c2[-1])
    rows = []
    for q in _DECILES:
        r1 = math.ceil(q / 100.0 * n1)
        r2 = math.ceil(q / 100.0 * n2)
        q1 = int(support[np.searchsorted(c1, r1)])
        q2 = int(support[np.searchsorted(c2, r2)])
        rows.append((q, q1, q2, q2 - q1))
    out = pd.DataFrame(rows, columns=["q_pct", "click_c", "view_c",
                                      "shift_c"])
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


# quantile_disc requires CONSTANT fractions — one UNION ALL branch per
# decile with the literal q (q/100.0 parses to the same double both
# sides)
SQL_DECILE_SHIFT = """
WITH e AS (
  SELECT CAST(event_type = 'view' AS INT) AS g,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'view')),
cq AS (
""" + "\n  UNION ALL\n".join(
    f"""  SELECT {q}::BIGINT AS q_pct,
         (SELECT quantile_disc(c, {q / 100.0!r}) FROM e WHERE g = 0)
           AS click_c,
         (SELECT quantile_disc(c, {q / 100.0!r}) FROM e WHERE g = 1)
           AS view_c"""
    for q in _DECILES) + """
)
SELECT q_pct, click_c, view_c, (view_c - click_c)::BIGINT AS shift_c
FROM cq ORDER BY q_pct
"""


QUERIES74: dict[str, tuple] = {
    "cucconi_click_view": (q_cucconi_click_view, SQL_CUCCONI),
    "hist_divergences_click_view": (q_hist_divergences_click_view,
                                    SQL_HIST_DIVERGENCES),
    "decile_shift_click_view": (q_decile_shift_click_view,
                                SQL_DECILE_SHIFT),
}
