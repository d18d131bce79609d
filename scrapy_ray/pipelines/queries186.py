"""One-hundred-eighty-sixth oracle-query batch — ruin theory and
portfolio arithmetic on exact moment sums:

- lundberg_ruin_prob: the Cramér–Lundberg ruin probability with
  exponential claims in closed form — claims are purchase values,
  claim rate λ from the observation span, premium rate c loaded 10%
  above λμ, so ψ(u) = (1/1.1)·exp(−(1/μ − λ/c)·u) at u = 10·μ;
  λ, μ and the adjustment coefficient finalize identically from
  exact integer sums.
- markowitz_minvar_daily: the two-asset minimum-variance portfolio
  between the daily click-value and purchase-value streams —
  w* = (σ₂² − σ₁₂)/(σ₁² + σ₂² − 2σ₁₂) with every (co)variance
  cleared to HUGEINT numerators over daily cents; also the
  portfolio variance at w*.
- kelly_fraction_daily: the Kelly bet fraction on the daily up/down
  revenue game — p = up-day share, payoff odds b = mean up
  magnitude over mean down magnitude (exact cent sums),
  f* = p − (1−p)/b, plus the expected log-growth at f* from the
  same integers.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq, _ts_minmax_us
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries169 import _daily_xmy
from scrapy_ray.pipelines.queries176 import _type_value_stats

_LOAD = 1.1


# ---------------------------------------------------------------------------
# Cramér-Lundberg ruin
# ---------------------------------------------------------------------------


def q_lundberg_ruin_prob(sf_dir: str):
    """Closed-form exponential-claims ruin probability."""
    st = _type_value_stats(sf_dir)
    row = st[st["et"] == "purchase"].iloc[0]
    ncl = int(row["n"])
    sc = int(row["sc"])
    t0, t1 = _ts_minmax_us(sf_dir, "events")
    span_s = float(t1 - t0) / 1e6
    lam = float(ncl) / span_s
    mu = float(sc) / float(ncl) / 100.0
    c = _LOAD * lam * mu
    rr = 1.0 / mu - lam / c
    u = 10.0 * mu
    psi = (1.0 / _LOAD) * math.exp(-rr * u)
    r6 = _round6(np.array([lam * 3600.0, mu, rr, psi]))
    out = pd.DataFrame({"n_claims": [ncl],
                        "lambda_hr6": [r6[0]], "mu6": [r6[1]],
                        "adj_coef6": [r6[2]], "ruin_prob6": [r6[3]]})
    out["n_claims"] = out["n_claims"].astype(np.int64)
    return out


SQL_LUNDBERG = f"""
WITH cl AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sc
  FROM events WHERE event_type = 'purchase'),
sp AS (
  SELECT CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS DOUBLE)
           / 1e6 AS span_s
  FROM events),
f AS (
  SELECT cl.n,
         CAST(cl.n AS DOUBLE) / sp.span_s AS lam,
         CAST(cl.sc AS DOUBLE) / CAST(cl.n AS DOUBLE) / 100.0 AS mu
  FROM cl, sp),
g AS (
  SELECT n, lam, mu,
         1.0 / mu - lam / ({_LOAD} * lam * mu) AS rr
  FROM f)
SELECT n AS n_claims, round(lam * 3600.0, 6) AS lambda_hr6,
       round(mu, 6) AS mu6, round(rr, 6) AS adj_coef6,
       round((1.0 / {_LOAD}) * exp(-rr * (10.0 * mu)), 6)
         AS ruin_prob6
FROM g
"""


# ---------------------------------------------------------------------------
# Markowitz two-asset min variance
# ---------------------------------------------------------------------------


def q_markowitz_minvar_daily(sf_dir: str):
    """Min-variance weight between click and purchase streams."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type", "value"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({
            "day": day,
            "a": np.where(et == "click", c, 0),
            "b": np.where(et == "purchase", c, 0)}) \
            .groupby("day", sort=False).sum().reset_index()
        for col in ("a", "b"):
            g[col] = g[col].astype(np.int64)
        from scrapy_ray.pipelines.queries47 import _strip
        return _strip(g)

    from ray.data.aggregate import Sum

    dly = (ds.map_batches(dpart, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("a", alias_name="a"),
                                       Sum("b", alias_name="b"))
             .to_pandas())
    a = [int(v) for v in dly["a"]]
    b = [int(v) for v in dly["b"]]
    n = len(a)
    sa, sb = sum(a), sum(b)
    saa = sum(v * v for v in a)
    sbb = sum(v * v for v in b)
    sab = sum(x * y for x, y in zip(a, b))
    caa = n * saa - sa * sa
    cbb = n * sbb - sb * sb
    cab = n * sab - sa * sb
    w = float(cbb - cab) / float(caa + cbb - 2 * cab)
    pv = (w * w * float(caa) + (1.0 - w) * (1.0 - w) * float(cbb)
          + 2.0 * w * (1.0 - w) * float(cab)) \
        / (float(n) * float(n - 1)) / 1e4
    r6 = _round6(np.array([w, pv]))
    out = pd.DataFrame({"n_days": [n], "w_click6": [r6[0]],
                        "port_var6": [r6[1]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_MARKOWITZ = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CASE WHEN event_type = 'click'
             THEN CAST(round(value * 100) AS BIGINT)
             ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN event_type = 'purchase'
             THEN CAST(round(value * 100) AS BIGINT)
             ELSE 0 END)::BIGINT AS b
  FROM events GROUP BY 1),
s AS (
  SELECT count(*)::BIGINT AS n, sum(a)::BIGINT AS sa,
         sum(b)::BIGINT AS sb,
         sum(CAST(a AS HUGEINT) * a) AS saa,
         sum(CAST(b AS HUGEINT) * b) AS sbb,
         sum(CAST(a AS HUGEINT) * b) AS sab
  FROM dly),
c AS (
  SELECT n,
         n * saa - CAST(sa AS HUGEINT) * sa AS caa,
         n * sbb - CAST(sb AS HUGEINT) * sb AS cbb,
         n * sab - CAST(sa AS HUGEINT) * sb AS cab
  FROM s),
f AS (
  SELECT n, caa, cbb, cab,
         CAST(cbb - cab AS DOUBLE)
           / CAST(caa + cbb - 2 * cab AS DOUBLE) AS w
  FROM c)
SELECT n AS n_days, round(w, 6) AS w_click6,
       round((w * w * CAST(caa AS DOUBLE)
              + (1.0 - w) * (1.0 - w) * CAST(cbb AS DOUBLE)
              + 2.0 * w * (1.0 - w) * CAST(cab AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) / 1e4,
             6) AS port_var6
FROM f
"""


# ---------------------------------------------------------------------------
# Kelly fraction
# ---------------------------------------------------------------------------


def q_kelly_fraction_daily(sf_dir: str):
    """Kelly bet fraction on daily up/down moves (docstring)."""
    dly = _daily_xmy(sf_dir)
    y = [int(v) for v in dly["y"]]
    ups = []
    downs = []
    for prev, cur in zip(y[:-1], y[1:]):
        d = cur - prev
        if d > 0:
            ups.append(d)
        else:
            downs.append(-d)
    nu, nd = len(ups), len(downs)
    su, sd = sum(ups), sum(downs)
    p = float(nu) / float(nu + nd)
    bb = (float(su) / float(nu)) / (float(sd) / float(nd))
    f = p - (1.0 - p) / bb
    growth = p * math.log(1.0 + f * bb) \
        + (1.0 - p) * math.log(1.0 - f)
    r6 = _round6(np.array([p, bb, f, growth]))
    out = pd.DataFrame({"n_up": [nu], "n_down": [nd],
                        "p6": [r6[0]], "b6": [r6[1]],
                        "kelly6": [r6[2]], "growth6": [r6[3]]})
    for col in ("n_up", "n_down"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KELLY = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
d AS (
  SELECT y - lag(y) OVER (ORDER BY day) AS dv FROM dly),
s AS (
  SELECT sum((dv > 0)::INT)::BIGINT AS nu,
         sum((dv <= 0)::INT)::BIGINT AS nd,
         sum(CASE WHEN dv > 0 THEN dv ELSE 0 END)::BIGINT AS su,
         sum(CASE WHEN dv <= 0 THEN -dv ELSE 0 END)::BIGINT AS sd
  FROM d WHERE dv IS NOT NULL),
f AS (
  SELECT nu, nd,
         CAST(nu AS DOUBLE) / CAST(nu + nd AS DOUBLE) AS p,
         (CAST(su AS DOUBLE) / CAST(nu AS DOUBLE))
           / (CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE)) AS bb
  FROM s),
g AS (SELECT nu, nd, p, bb, p - (1.0 - p) / bb AS fk FROM f)
SELECT nu AS n_up, nd AS n_down, round(p, 6) AS p6,
       round(bb, 6) AS b6, round(fk, 6) AS kelly6,
       round(p * ln(1.0 + fk * bb)
             + (1.0 - p) * ln(1.0 - fk), 6) AS growth6
FROM g
"""


QUERIES186: dict[str, tuple] = {
    "lundberg_ruin_prob": (q_lundberg_ruin_prob, SQL_LUNDBERG),
    "markowitz_minvar_daily": (q_markowitz_minvar_daily,
                               SQL_MARKOWITZ),
    "kelly_fraction_daily": (q_kelly_fraction_daily, SQL_KELLY),
}
