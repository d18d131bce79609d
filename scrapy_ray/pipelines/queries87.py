"""Eighty-seventh oracle-query batch — statistical process control /
digit-law conformance:

- p_chart_violations: Shewhart p-chart on the daily purchase
  proportion with EXACT integer 3-sigma limits: day t violates iff
  (x_t*N - n_t*P)^2 > 9*P*(N-P)*n_t (clears p-bar = P/N and the
  binomial sigma entirely — no float ever), split into above/below
  by the sign of x_t*N - n_t*P.
- xmr_chart_violations: XmR individuals chart on daily revenue cents:
  with S = SUM c, D days, M = SUM |moving range|, the 2.66*MRbar
  limit clears to the exact integer inequality
  100*|c_t*D - S|*(D-1) > 266*D*M (2.66 = 266/100 is an exact
  rational; LHS ~1e18 at sf0.1 — HUGEINT in SQL).
- benford_second_digit: second-significant-digit law on totalprice
  cents (c >= 10): observed counts per digit 0-9 via string
  extraction (substr(CAST(c AS VARCHAR),2,1) — identical to
  str(c)[1]); expected Benford-2nd probabilities are module-level
  float literals (the periodogram shared-literal precedent) embedded
  in BOTH sides; chi2 terms (o - N*p)^2/(N*p) quantized at 1e-6 and
  integer-summed.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000

# Benford second-digit probabilities (exact float literals shared with
# the SQL via repr)
_B2P = [sum(math.log10(1.0 + 1.0 / (10 * k + d)) for k in range(1, 10))
        for d in range(10)]


# ---------------------------------------------------------------------------
# p-chart
# ---------------------------------------------------------------------------


def q_p_chart_violations(sf_dir: str):
    """3-sigma p-chart violations via exact integer limits (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist())
        df = pd.DataFrame({"day": day, "n": np.int64(1),
                           "x": (et == "purchase").astype(np.int64)})
        g = df.groupby("day", sort=False).sum().reset_index()
        for c in ("n", "x"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    daily = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("n", alias_name="n"),
                                         Sum("x", alias_name="x"))
               .to_pandas())
    nt = [int(v) for v in daily["n"]]
    xt = [int(v) for v in daily["x"]]
    nn = sum(nt)
    pp = sum(xt)
    hi = lo = 0
    for n_d, x_d in zip(nt, xt):
        d = x_d * nn - n_d * pp
        if d * d > 9 * pp * (nn - pp) * n_d:
            if d > 0:
                hi += 1
            else:
                lo += 1
    out = pd.DataFrame({"n_days": [len(nt)], "n_events": [nn],
                        "n_purch": [pp], "above": [hi], "below": [lo]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_P_CHART = f"""
WITH daily AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         count(*)::BIGINT AS n,
         sum((event_type = 'purchase')::INT)::BIGINT AS x
  FROM events GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS nn, sum(x)::BIGINT AS pp,
             count(*)::BIGINT AS dd
      FROM daily),
v AS (
  SELECT dd, nn, pp,
         sum(((x * nn - n * pp)::HUGEINT * (x * nn - n * pp)
              > 9::HUGEINT * pp * (nn - pp) * n
              AND x * nn - n * pp > 0)::INT)::BIGINT AS above,
         sum(((x * nn - n * pp)::HUGEINT * (x * nn - n * pp)
              > 9::HUGEINT * pp * (nn - pp) * n
              AND x * nn - n * pp < 0)::INT)::BIGINT AS below
  FROM daily CROSS JOIN t GROUP BY 1, 2, 3)
SELECT dd AS n_days, nn AS n_events, pp AS n_purch, above, below
FROM v
"""


# ---------------------------------------------------------------------------
# XmR chart
# ---------------------------------------------------------------------------


def q_xmr_chart_violations(sf_dir: str):
    """XmR individuals-chart violations via the 266/100 exact rational
    limit (docstring above)."""
    c = [int(v) for v in _daily_cents(sf_dir)["c"].to_numpy(np.int64)]
    dd = len(c)
    s = sum(c)
    m = sum(abs(b - a) for a, b in zip(c[:-1], c[1:]))
    hi = lo = 0
    for v in c:
        d = v * dd - s
        if 100 * abs(d) * (dd - 1) > 266 * dd * m:
            if d > 0:
                hi += 1
            else:
                lo += 1
    out = pd.DataFrame({"n_days": [dd], "mr_sum": [m],
                        "above": [hi], "below": [lo]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_XMR = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
mr AS (
  SELECT sum(ad)::BIGINT AS m FROM (
    SELECT abs(c - lag(c) OVER (ORDER BY day)) AS ad FROM daily)
  WHERE ad IS NOT NULL),
t AS (SELECT sum(c)::BIGINT AS s, count(*)::BIGINT AS dd FROM daily),
v AS (
  SELECT dd, m,
         sum((100::HUGEINT * abs(c * dd - s) * (dd - 1)
              > 266::HUGEINT * dd * m
              AND c * dd - s > 0)::INT)::BIGINT AS above,
         sum((100::HUGEINT * abs(c * dd - s) * (dd - 1)
              > 266::HUGEINT * dd * m
              AND c * dd - s < 0)::INT)::BIGINT AS below
  FROM daily CROSS JOIN t CROSS JOIN mr GROUP BY 1, 2)
SELECT dd AS n_days, m AS mr_sum, above, below FROM v
"""


# ---------------------------------------------------------------------------
# Benford second digit
# ---------------------------------------------------------------------------


def q_benford_second_digit(sf_dir: str):
    """Second-significant-digit Benford chi-square on totalprice cents
    (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def dpart(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        c = c[c >= 10]
        digs = np.array([int(str(int(v))[1]) for v in c], np.int64)
        df = pd.DataFrame({"d": digs, "cnt": np.int64(1)})
        g = df.groupby("d", sort=False).sum().reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(dpart, batch_format="pyarrow")
              .groupby("d").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())
    obs = {int(d): int(c) for d, c in zip(hist["d"], hist["cnt"])}
    n = sum(obs.values())
    chi_q = 0
    for d in range(10):
        o = obs.get(d, 0)
        e = n * _B2P[d]
        t = (o - e) * (o - e) / e * 1000000.0
        chi_q += int(math.floor(t + 0.5))
    cols = {"n": n}
    for d in range(10):
        cols[f"obs{d}"] = obs.get(d, 0)
    out = pd.DataFrame({k: [v] for k, v in cols.items()})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    out["chi2_6"] = _round6(np.array([chi_q / 1e6]))[0]
    return out


SQL_BENFORD2 = ("""
WITH b AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                          AS VARCHAR), 2, 1) AS BIGINT) AS d
  FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 10),
h AS (SELECT d, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
t AS (SELECT sum(cnt)::BIGINT AS n FROM h),
p AS (
""" + "\n  UNION ALL\n".join(
    f"  SELECT {d}::BIGINT AS d, {_B2P[d]!r}::DOUBLE AS pr"
    for d in range(10)) + """
),
j AS (
  SELECT p.d, coalesce(h.cnt, 0)::BIGINT AS o, pr, n
  FROM p LEFT JOIN h ON h.d = p.d CROSS JOIN t),
q AS (
  SELECT max(n) AS n,
         sum(CAST(round((o - n * pr) * (o - n * pr) / (n * pr)
                        * 1000000.0) AS BIGINT))::BIGINT AS chi_q,
""" + ", ".join(
    f"max(CASE WHEN d = {d} THEN o END) AS obs{d}" for d in range(10))
+ """
  FROM j)
SELECT n, """ + ", ".join(f"obs{d}" for d in range(10)) + """,
       round(chi_q / 1000000.0, 6) AS chi2_6
FROM q
""")


QUERIES87: dict[str, tuple] = {
    "p_chart_violations": (q_p_chart_violations, SQL_P_CHART),
    "xmr_chart_violations": (q_xmr_chart_violations, SQL_XMR),
    "benford_second_digit": (q_benford_second_digit, SQL_BENFORD2),
}
