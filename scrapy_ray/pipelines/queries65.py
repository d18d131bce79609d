"""Sixty-fifth oracle-query batch — turning-point randomness / random-walk
variance ratio / template-matching entropy, all on the daily-revenue
dollar series (the _daily_cents machinery):

- turning_points_daily: Kendall's turning-point randomness test — the
  count of strict interior local maxima/minima is an exact integer off
  one lag/lead scan (probe: zero neighbor ties at all scales, so the
  strict definition is tie-free here); E = 2(n−2)/3 and
  Var = (16n−29)/90 finalize identical-expression.
- variance_ratio_daily: Lo-MacKinlay variance ratio VR(q=5) on the
  consecutive-observation differences d_t.  With μ = D/n (D = Σd_t
  exact), the demeaned squares clear denominators: Σ(n·d_t − D)² and
  Σ(n·s_t − 5·D)² (s_t the overlapping 5-step difference) are exact
  integers — HUGEINT territory at sf0.1 ((n·d)² ~ 1.4e20), so the Ray
  side sums Python ints and the SQL squares through CAST(... AS
  HUGEINT); the n² factor cancels in the ratio and VR/z finalize
  identical-expression (float(huge int) == CAST(HUGEINT AS DOUBLE),
  both correctly rounded — working-notes parity rule).
- sample_entropy_daily: Richman-Moorman SampEn(m=2, Chebyshev) with a
  DATA-ADAPTIVE exact-integer tolerance r = (P90 − P10)//5 of the
  daily dollars (quantile_disc = element at 1-based rank ceil(q·n),
  the documented DuckDB rule).  Template-pair counts B (length 2) and
  A (length 3) over i<j are exact integers — Ray: three shifted
  boolean matrices on the O(days) driver-side series; SQL: rn<rn
  self-join (~3e6 pairs) — and SampEn = −ln(A/B) finalizes
  identical-expression (probe: A/B ≈ 0.29-0.31, far from the A=0
  degenerate edge).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents


def _daily_dollars(sf_dir: str) -> np.ndarray:
    """Daily revenue whole dollars, day-ordered: round(cents/100),
    half-away-from-zero (the foster_stuart/bartels convention)."""
    c = _daily_cents(sf_dir)["c"].to_numpy(np.int64).astype(np.float64)
    y = c / 100.0
    return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)


_SQL_DAILY = """
dc AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d0 AS (SELECT day, CAST(round(c / 100.0) AS BIGINT) AS y FROM dc)
"""


# ---------------------------------------------------------------------------
# Turning-point randomness test
# ---------------------------------------------------------------------------


def q_turning_points_daily(sf_dir: str):
    """Kendall turning-point test on daily revenue dollars (docstring
    above)."""
    y = _daily_dollars(sf_dir)
    n = len(y)
    mid, prv, nxt = y[1:-1], y[:-2], y[2:]
    tp = int((((mid > prv) & (mid > nxt))
              | ((mid < prv) & (mid < nxt))).sum())
    nf, tpf = float(n), float(tp)
    z = (tpf - 2.0 * (nf - 2.0) / 3.0) / math.sqrt((16.0 * nf - 29.0) / 90.0)
    out = pd.DataFrame({"n_days": [n], "tp_count": [tp],
                        "z6": _round6(np.array([z]))})
    for col in ("n_days", "tp_count"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_TURNING_POINTS = f"""
WITH {_SQL_DAILY},
w AS (
  SELECT y, lag(y) OVER (ORDER BY day) AS py,
         lead(y) OVER (ORDER BY day) AS ny
  FROM d0),
st AS (SELECT count(*)::BIGINT AS n FROM d0),
tp AS (
  SELECT sum(((y > py AND y > ny) OR (y < py AND y < ny))::INT)::BIGINT
           AS tp_count
  FROM w WHERE py IS NOT NULL AND ny IS NOT NULL)
SELECT n AS n_days, tp_count,
       round((CAST(tp_count AS DOUBLE)
              - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
             / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 6) AS z6
FROM st, tp
"""


# ---------------------------------------------------------------------------
# Lo-MacKinlay variance ratio
# ---------------------------------------------------------------------------


def q_variance_ratio_daily(sf_dir: str):
    """VR(5) of daily revenue differences, exact HUGEINT-class moments
    (docstring above)."""
    y = _daily_dollars(sf_dir)
    q = 5
    d1 = y[1:] - y[:-1]
    d5 = y[q:] - y[:-q]
    n = len(d1)
    nq = n - (q - 1)
    dd = int(y[-1]) - int(y[0])
    s1 = sum((n * int(v) - dd) ** 2 for v in d1)
    sq = sum((n * int(v) - q * dd) ** 2 for v in d5)
    nf, nqf = float(n), float(nq)
    s1f, sqf = float(s1), float(sq)
    vr = (sqf / (5.0 * nqf)) / (s1f / nf)
    z = (vr - 1.0) / math.sqrt(72.0 / (15.0 * nf))
    out = pd.DataFrame({"n_days": [len(y)], "n_diffs": [n], "nq": [nq],
                        "s1_d": [s1f], "sq_d": [sqf],
                        "vr6": _round6(np.array([vr])),
                        "z6": _round6(np.array([z]))})
    for col in ("n_days", "n_diffs", "nq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_VARIANCE_RATIO = f"""
WITH {_SQL_DAILY},
v AS (
  SELECT y - lag(y, 1) OVER (ORDER BY day) AS d1,
         y - lag(y, 5) OVER (ORDER BY day) AS d5
  FROM d0),
st AS (
  SELECT count(*)::BIGINT AS nd, (count(*) - 1)::BIGINT AS n FROM d0),
st2 AS (
  SELECT nd, n, n - 4 AS nq,
         (SELECT sum(d1)::BIGINT FROM v WHERE d1 IS NOT NULL) AS dd
  FROM st),
s AS (
  SELECT sum(CAST(n * d1 - dd AS HUGEINT)
             * CAST(n * d1 - dd AS HUGEINT)) AS s1,
         sum(CASE WHEN d5 IS NOT NULL
                  THEN CAST(n * d5 - 5 * dd AS HUGEINT)
                       * CAST(n * d5 - 5 * dd AS HUGEINT) END) AS sq
  FROM v, st2 WHERE d1 IS NOT NULL)
SELECT nd AS n_days, n AS n_diffs, nq,
       CAST(s1 AS DOUBLE) AS s1_d, CAST(sq AS DOUBLE) AS sq_d,
       round((CAST(sq AS DOUBLE) / (5.0 * CAST(nq AS DOUBLE)))
             / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS vr6,
       round(((CAST(sq AS DOUBLE) / (5.0 * CAST(nq AS DOUBLE)))
              / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) - 1.0)
             / sqrt(72.0 / (15.0 * CAST(n AS DOUBLE))), 6) AS z6
FROM st2, s
"""


# ---------------------------------------------------------------------------
# Sample entropy
# ---------------------------------------------------------------------------


def q_sample_entropy_daily(sf_dir: str):
    """SampEn(m=2) of daily revenue dollars with exact integer tolerance
    (docstring above)."""
    y = _daily_dollars(sf_dir)
    n = len(y)
    ys = np.sort(y)
    p10 = int(ys[int(math.ceil(0.10 * n)) - 1])
    p90 = int(ys[int(math.ceil(0.90 * n)) - 1])
    r = (p90 - p10) // 5
    mm = np.abs(y[:, None] - y[None, :]) <= r
    m2 = mm[:-2, :-2] & mm[1:-1, 1:-1]
    m3 = m2 & mm[2:, 2:]
    iu = np.triu_indices(n - 2, k=1)
    b_cnt = int(m2[iu].sum())
    a_cnt = int(m3[iu].sum())
    assert a_cnt > 0, "degenerate tolerance: no length-3 template matches"
    sampen = -np.log(float(a_cnt) / float(b_cnt))
    out = pd.DataFrame({"n_days": [n], "r_dollars": [r],
                        "b_cnt": [b_cnt], "a_cnt": [a_cnt],
                        "sampen6": _round6(np.array([sampen]))})
    for col in ("n_days", "r_dollars", "b_cnt", "a_cnt"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SAMPLE_ENTROPY = f"""
WITH {_SQL_DAILY},
d AS (SELECT y, row_number() OVER (ORDER BY day) AS rn FROM d0),
q AS (SELECT (quantile_disc(y, 0.90) - quantile_disc(y, 0.10)) // 5 AS r
      FROM d),
st AS (SELECT count(*)::BIGINT AS n FROM d),
v AS (SELECT rn, y, lead(y, 1) OVER (ORDER BY rn) AS y1,
             lead(y, 2) OVER (ORDER BY rn) AS y2
      FROM d),
t AS (SELECT v.* FROM v, st WHERE rn <= n - 2),
p AS (
  SELECT sum((abs(a.y - b.y) <= r AND abs(a.y1 - b.y1) <= r)::INT)::BIGINT
           AS b_cnt,
         sum((abs(a.y - b.y) <= r AND abs(a.y1 - b.y1) <= r
              AND abs(a.y2 - b.y2) <= r)::INT)::BIGINT AS a_cnt
  FROM t a, t b, q WHERE b.rn > a.rn)
SELECT n AS n_days, r AS r_dollars, b_cnt, a_cnt,
       round(-ln(CAST(a_cnt AS DOUBLE) / CAST(b_cnt AS DOUBLE)), 6)
         AS sampen6
FROM st, q, p
"""


QUERIES65: dict[str, tuple] = {
    "turning_points_daily": (q_turning_points_daily, SQL_TURNING_POINTS),
    "variance_ratio_daily": (q_variance_ratio_daily, SQL_VARIANCE_RATIO),
    "sample_entropy_daily": (q_sample_entropy_daily, SQL_SAMPLE_ENTROPY),
}
