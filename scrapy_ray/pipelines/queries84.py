"""Eighty-fourth oracle-query batch — burst detection / L-moments /
one-sample uniformity:

- kleinberg_burst_days: a 2-state Kleinberg-style burst model on
  daily event volume as an EXACT-INTEGER Viterbi: the Poisson
  log-cost difference needs only lambda - n*ln(lambda) (the ln n!
  term is state-independent and cancels), so per-day reduced costs
  rc_s = round(lambda_s*1e6) - n_t*round(ln(lambda_s)*1e6) are exact
  ints (lambda_0 = mean rate, lambda_1 = 2*lambda_0, up-transition
  cost round(ln(D)*1e6)); the DP recursion dp0/dp1 carries int64 and
  is replayed by a recursive CTE.  Output: final costs and the count
  of days where dp1 < dp0 (burst-dominant profile) — no float ever
  enters the DP.
- lmoments_order_value: exact sample L-moments l1..l4 and L-skew /
  L-kurtosis of whole-dollar order totals: the binomial-weighted
  sums B_r = SUM C(i-1,r) x_(i) collapse per histogram cell to
  x * (C(b,r+1) - C(a-1,r+1)) via the hockey-stick identity — exact
  ints (~1e25 at sf0.1, Python int / HUGEINT, VARCHAR outputs);
  b_r = B_r/(n*C(n-1,r)) and the lambda combinations finalize
  identical-expression.
- cvm_uniform_tod: one-sample Cramér-von Mises test of event
  time-of-day against Uniform(0, 86400) — the linear-uniformity
  complement of the circular Rayleigh test:
  W^2 = 1/(12n) + SUM_i ((2i-1)/(2n) - s_i/86400)^2 where the sum
  collapses per sod cell to a closed-form quadratic prefix sum of
  the integer sequence 86400*(2i-1) - 2n*s (exact, ~3e25 at sf0.1).
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

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Kleinberg burst DP
# ---------------------------------------------------------------------------


def q_kleinberg_burst_days(sf_dir: str):
    """Exact-integer 2-state burst Viterbi on daily event counts
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        df = pd.DataFrame({"day": day})
        g = df.groupby("day", sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    daily = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("n", alias_name="n"))
               .to_pandas().sort_values("day"))
    n = daily["n"].to_numpy(np.int64)
    dd = len(n)
    s = int(n.sum())
    lam0 = float(s) / float(dd)
    lam1 = 2.0 * lam0
    q0 = int(math.floor(lam0 * 1e6 + 0.5))
    q1 = int(math.floor(lam1 * 1e6 + 0.5))
    ql0 = int(math.floor(math.log(lam0) * 1e6 + 0.5))
    ql1 = int(math.floor(math.log(lam1) * 1e6 + 0.5))
    gamma = int(math.floor(math.log(float(dd)) * 1e6 + 0.5))
    dp0 = q0 - int(n[0]) * ql0
    dp1 = q1 - int(n[0]) * ql1 + gamma
    burst = 1 if dp1 < dp0 else 0
    for t in range(1, dd):
        rc0 = q0 - int(n[t]) * ql0
        rc1 = q1 - int(n[t]) * ql1
        nd0 = rc0 + min(dp0, dp1)
        nd1 = rc1 + min(dp1, dp0 + gamma)
        dp0, dp1 = nd0, nd1
        if dp1 < dp0:
            burst += 1
    out = pd.DataFrame({"n_days": [dd], "dp0": [dp0], "dp1": [dp1],
                        "burst_days": [burst]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_KLEINBERG = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1),
seq AS (SELECT n, row_number() OVER (ORDER BY day) AS t FROM daily),
c AS (
  SELECT count(*)::BIGINT AS dd, sum(n)::BIGINT AS s,
         CAST(round(CAST(sum(n) AS DOUBLE) / count(*) * 1000000)
              AS BIGINT) AS q0,
         CAST(round(2.0 * (CAST(sum(n) AS DOUBLE) / count(*)) * 1000000)
              AS BIGINT) AS q1,
         CAST(round(ln(CAST(sum(n) AS DOUBLE) / count(*)) * 1000000)
              AS BIGINT) AS ql0,
         CAST(round(ln(2.0 * (CAST(sum(n) AS DOUBLE) / count(*)))
                    * 1000000) AS BIGINT) AS ql1,
         CAST(round(ln(CAST(count(*) AS DOUBLE)) * 1000000) AS BIGINT)
           AS gamma
  FROM daily),
r AS (
  SELECT 1::BIGINT AS t,
         (q0 - seq.n * ql0)::BIGINT AS dp0,
         (q1 - seq.n * ql1 + gamma)::BIGINT AS dp1,
         CASE WHEN q1 - seq.n * ql1 + gamma < q0 - seq.n * ql0
              THEN 1 ELSE 0 END::BIGINT AS burst
  FROM seq, c WHERE seq.t = 1
  UNION ALL
  SELECT seq.t,
         (c.q0 - seq.n * c.ql0) + least(r.dp0, r.dp1) AS dp0,
         (c.q1 - seq.n * c.ql1)
           + least(r.dp1, r.dp0 + c.gamma) AS dp1,
         r.burst + CASE WHEN
             (c.q1 - seq.n * c.ql1) + least(r.dp1, r.dp0 + c.gamma)
             < (c.q0 - seq.n * c.ql0) + least(r.dp0, r.dp1)
           THEN 1 ELSE 0 END AS burst
  FROM r JOIN seq ON seq.t = r.t + 1 CROSS JOIN c)
SELECT (SELECT dd FROM c) AS n_days, dp0, dp1, burst AS burst_days
FROM r WHERE t = (SELECT dd FROM c)
"""


# ---------------------------------------------------------------------------
# L-moments
# ---------------------------------------------------------------------------


def q_lmoments_order_value(sf_dir: str):
    """Exact L-moments of whole-dollar order totals (docstring
    above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        d = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        df = pd.DataFrame({"d": d})
        g = df.groupby("d", sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("d").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("d"))
    dv = [int(v) for v in hist["d"].to_numpy(np.int64)]
    cnt = [int(v) for v in hist["cnt"].to_numpy(np.int64)]
    n = sum(cnt)

    def comb(m: int, k: int) -> int:
        if m < k:
            return 0
        r = 1
        for j in range(k):
            r *= m - j
        return r // math.factorial(k)

    b_sums = [0, 0, 0, 0]
    a = 1
    for x, c in zip(dv, cnt):
        b = a + c - 1
        for r in range(4):
            b_sums[r] += x * (comb(b, r + 1) - comb(a - 1, r + 1))
        a = b + 1
    d0 = n
    d1 = n * (n - 1)
    d2 = n * comb(n - 1, 2)
    d3 = n * comb(n - 1, 3)
    b0 = float(b_sums[0]) / float(d0)
    b1 = float(b_sums[1]) / float(d1)
    b2 = float(b_sums[2]) / float(d2)
    b3 = float(b_sums[3]) / float(d3)
    l1 = b0
    l2 = 2.0 * b1 - b0
    l3 = 6.0 * b2 - 6.0 * b1 + b0
    l4 = 20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0
    r6 = _round6(np.array([l1, l2, l3, l4, l3 / l2, l4 / l2]))
    out = pd.DataFrame({"n": [n],
                        "b0s": [str(b_sums[0])], "b1s": [str(b_sums[1])],
                        "b2s": [str(b_sums[2])], "b3s": [str(b_sums[3])],
                        "l1_6": [r6[0]], "l2_6": [r6[1]],
                        "l3_6": [r6[2]], "l4_6": [r6[3]],
                        "t3_6": [r6[4]], "t4_6": [r6[5]]})
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_LMOMENTS = """
WITH b AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS d FROM orders),
h AS (SELECT d, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
c AS (
  SELECT d, cnt,
         sum(cnt) OVER (ORDER BY d)::BIGINT AS cum
  FROM h),
t AS (SELECT sum(cnt)::BIGINT AS n FROM h),
e AS (
  SELECT d, cum AS hi, cum - cnt AS lo FROM c),
s AS (
  SELECT
    sum(d::HUGEINT * (hi - lo)) AS b0s,
    sum(d::HUGEINT * ((hi::HUGEINT * (hi - 1)) // 2
                      - (lo::HUGEINT * (lo - 1)) // 2)) AS b1s,
    sum(d::HUGEINT * ((hi::HUGEINT * (hi - 1) * (hi - 2)) // 6
                      - (lo::HUGEINT * (lo - 1) * (lo - 2)) // 6))
      AS b2s,
    sum(d::HUGEINT * ((hi::HUGEINT * (hi - 1) * (hi - 2) * (hi - 3))
                        // 24
                      - (lo::HUGEINT * (lo - 1) * (lo - 2) * (lo - 3))
                        // 24)) AS b3s
  FROM e),
f AS (
  SELECT n, b0s, b1s, b2s, b3s,
         CAST(b0s AS DOUBLE) / CAST(n AS DOUBLE) AS b0,
         CAST(b1s AS DOUBLE)
           / CAST(n::HUGEINT * (n - 1) AS DOUBLE) AS b1,
         CAST(b2s AS DOUBLE)
           / CAST(n::HUGEINT * (((n - 1)::HUGEINT * (n - 2)) // 2)
                  AS DOUBLE) AS b2,
         CAST(b3s AS DOUBLE)
           / CAST(n::HUGEINT
                  * (((n - 1)::HUGEINT * (n - 2) * (n - 3)) // 6)
                  AS DOUBLE) AS b3
  FROM s CROSS JOIN t)
SELECT n, CAST(b0s AS VARCHAR) AS b0s, CAST(b1s AS VARCHAR) AS b1s,
       CAST(b2s AS VARCHAR) AS b2s, CAST(b3s AS VARCHAR) AS b3s,
       round(b0, 6) AS l1_6,
       round(2.0 * b1 - b0, 6) AS l2_6,
       round(6.0 * b2 - 6.0 * b1 + b0, 6) AS l3_6,
       round(20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0, 6) AS l4_6,
       round((6.0 * b2 - 6.0 * b1 + b0) / (2.0 * b1 - b0), 6) AS t3_6,
       round((20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0)
             / (2.0 * b1 - b0), 6) AS t4_6
FROM f
"""


# ---------------------------------------------------------------------------
# One-sample CvM vs Uniform(0, 86400)
# ---------------------------------------------------------------------------


def q_cvm_uniform_tod(sf_dir: str):
    """One-sample CvM uniformity of time-of-day via closed-form cell
    sums (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts"])

    def hpart(t: pa.Table) -> pa.Table:
        sod = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 1_000_000) % 86400
        df = pd.DataFrame({"sod": sod})
        g = df.groupby("sod", sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("sod").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("sod"))
    sv = [int(v) for v in hist["sod"].to_numpy(np.int64)]
    cnt = [int(v) for v in hist["cnt"].to_numpy(np.int64)]
    n = sum(cnt)
    ss = 0
    a = 1
    for s, c in zip(sv, cnt):
        b = a + c - 1
        c0 = -86400 - 2 * n * s
        c1 = 172800
        si = (a + b) * (b - a + 1) // 2
        si2 = b * (b + 1) * (2 * b + 1) // 6 \
            - (a - 1) * a * (2 * a - 1) // 6
        ss += c * c0 * c0 + 2 * c0 * c1 * si + c1 * c1 * si2
        a = b + 1
    w2 = (float(ss) / float(4 * n * n * 86400 * 86400)
          + 1.0 / (12.0 * n))
    out = pd.DataFrame({"n": [n], "ss": [str(ss)],
                        "w2_6": [_round6(np.array([w2]))[0]]})
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_CVM_UNIFORM = """
WITH h AS (
  SELECT (epoch_us(ts) // 1000000) % 86400 AS sod,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
t AS (SELECT sum(cnt)::BIGINT AS n FROM h),
c AS (
  SELECT sod, cnt,
         sum(cnt) OVER (ORDER BY sod)::BIGINT AS hi
  FROM h),
e AS (
  SELECT cnt, hi, hi - cnt + 1 AS a, hi AS b,
         (-86400 - 2 * n * sod)::HUGEINT AS c0, n
  FROM c CROSS JOIN t),
s AS (
  SELECT sum(cnt::HUGEINT * c0 * c0
             + 2::HUGEINT * c0 * 172800
               * (((a + b)::HUGEINT * (b - a + 1)) // 2)
             + 172800::HUGEINT * 172800
               * ((b::HUGEINT * (b + 1) * (2 * b + 1)) // 6
                  - ((a - 1)::HUGEINT * a * (2 * a - 1)) // 6))
           AS ss,
         max(n) AS n
  FROM e)
SELECT n, CAST(ss AS VARCHAR) AS ss,
       round(CAST(ss AS DOUBLE)
             / CAST(4::HUGEINT * n * n * 86400 * 86400 AS DOUBLE)
             + 1.0 / (12.0 * n), 6) AS w2_6
FROM s
"""


QUERIES84: dict[str, tuple] = {
    "kleinberg_burst_days": (q_kleinberg_burst_days, SQL_KLEINBERG),
    "lmoments_order_value": (q_lmoments_order_value, SQL_LMOMENTS),
    "cvm_uniform_tod": (q_cvm_uniform_tod, SQL_CVM_UNIFORM),
}
