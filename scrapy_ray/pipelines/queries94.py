"""Ninety-fourth oracle-query batch — causal-inference trio
(complementing DiD, CUPED, Mantel-Haenszel and the Simpson audit):

- propensity_strata_ate: stratified ATE of daily clicking on daily
  purchasing over (user, day) units, stratified into value-decile-
  like strata by the user's TOTAL event count that day (proxy
  propensity, 5 exact disc-quintile bins): ATE = SUM_s (n_s/N) *
  (p1_s - p0_s) with each per-stratum term quantized to 1e-9 and
  integer-summed (strata where either arm is empty are dropped on
  both sides, counted in the output).
- rdd_value_purchase: sharp regression discontinuity of the purchase
  indicator in the event value, cutoff = the exact disc median cent,
  bandwidth +/- $50 (literal): one-sided local linear fits
  y ~ a + b(x-c) from exact integer moments; the jump
  tau = a_right - a_left with a = (Sxx*Sy - Sx*Sxy)/(n*Sxx - Sx*Sx)
  per side (centered x keeps moments ~1e13, int64/HUGEINT) —
  identical-expression floats of exact ints.
- evalue_confounding: VanderWeele's E-value for the daily
  click->purchase risk ratio (the queries78 2x2): protective RRs
  flip to the reciprocal scale (the synthetic RR is < 1),
  E = RR* + sqrt(RR*(RR*-1)), and the CI E-value uses the bound
  nearer 1 (1.0 when the CI crosses 1) — identical-expression
  floats with matching CASE branches both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_US_PER_DAY = 86_400_000_000
_RDD_H = 5000  # +/- $50 in cents


# ---------------------------------------------------------------------------
# Stratified ATE
# ---------------------------------------------------------------------------


def q_propensity_strata_ate(sf_dir: str):
    """Stratified ATE over (user, day) units (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def fpart(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist())
        df = pd.DataFrame({"u": uid, "day": day,
                           "hc": (et == "click").astype(np.int64),
                           "hp": (et == "purchase").astype(np.int64),
                           "n": np.int64(1)})
        g = df.groupby(["u", "day"], sort=False).agg(
            hc=("hc", "max"), hp=("hp", "max"),
            n=("n", "sum")).reset_index()
        for c in ("hc", "hp", "n"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    units = (ds.map_batches(fpart, batch_format="pyarrow")
               .groupby(["u", "day"])
               .aggregate(Max("hc", alias_name="hc"),
                          Max("hp", alias_name="hp"),
                          Sum("n", alias_name="n"))
               .to_pandas())
    cnt = np.sort(units["n"].to_numpy(np.int64))
    nn = len(cnt)
    thr = [int(cnt[math.ceil(q / 100.0 * nn) - 1])
           for q in (20, 40, 60, 80)]
    nv = units["n"].to_numpy(np.int64)
    # side="right": stratum = # thresholds <= n, matching the SQL
    # (n >= t)::INT sum on boundary ties
    stratum = np.searchsorted(np.array(thr, np.int64), nv, side="right")
    hc = units["hc"].to_numpy(np.int64)
    hp = units["hp"].to_numpy(np.int64)
    ate_q = 0
    used = 0
    dropped = 0
    for s in range(5):
        m = stratum == s
        n_s = int(m.sum())
        if n_s == 0:
            # tied quintile thresholds can empty a stratum — absent on
            # both sides, not "dropped"
            continue
        n1 = int(hc[m].sum())
        n0 = n_s - n1
        if n1 == 0 or n0 == 0:
            dropped += 1
            continue
        x1 = int(hp[m & (hc == 1)].sum())
        x0 = int(hp[m & (hc == 0)].sum())
        term = (float(n_s) / float(nn)
                * (float(x1) / float(n1) - float(x0) / float(n0))
                * 1000000000.0)
        ate_q += int(math.floor(term + 0.5)) if term >= 0 \
            else int(math.ceil(term - 0.5))
        used += 1
    out = pd.DataFrame({"n_units": [nn], "n_strata_used": [used],
                        "n_strata_dropped": [dropped],
                        "ate_q": [ate_q],
                        "ate6": [_round6(np.array(
                            [ate_q / 1e9]))[0]]})
    for col in ("n_units", "n_strata_used", "n_strata_dropped",
                "ate_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_STRATA_ATE = f"""
WITH ud AS (
  SELECT user_id, CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         max((event_type = 'click')::INT) AS hc,
         max((event_type = 'purchase')::INT) AS hp,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
t AS (
  SELECT count(*)::BIGINT AS nn,
         quantile_disc(n, 0.2) AS t1, quantile_disc(n, 0.4) AS t2,
         quantile_disc(n, 0.6) AS t3, quantile_disc(n, 0.8) AS t4
  FROM ud),
su AS (
  SELECT (n >= t1)::INT + (n >= t2)::INT + (n >= t3)::INT
           + (n >= t4)::INT AS s,
         hc, hp, nn
  FROM ud CROSS JOIN t),
cell AS (
  SELECT s, count(*)::BIGINT AS n_s,
         sum(hc)::BIGINT AS n1,
         sum(CASE WHEN hc = 1 THEN hp ELSE 0 END)::BIGINT AS x1,
         sum(CASE WHEN hc = 0 THEN hp ELSE 0 END)::BIGINT AS x0,
         max(nn) AS nn
  FROM su GROUP BY 1),
q AS (
  SELECT nn,
         count(*) FILTER (WHERE n1 > 0 AND n_s - n1 > 0)::BIGINT
           AS used,
         count(*) FILTER (WHERE n1 = 0 OR n_s - n1 = 0)::BIGINT
           AS dropped,
         sum(CASE WHEN n1 > 0 AND n_s - n1 > 0 THEN
           CAST(round(CAST(n_s AS DOUBLE) / CAST(nn AS DOUBLE)
                      * (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                         - CAST(x0 AS DOUBLE)
                           / CAST(n_s - n1 AS DOUBLE))
                      * 1000000000.0) AS BIGINT)
           ELSE 0 END)::BIGINT AS ate_q
  FROM cell GROUP BY 1)
SELECT nn AS n_units, used AS n_strata_used,
       dropped AS n_strata_dropped, ate_q,
       round(ate_q / 1000000000.0, 6) AS ate6
FROM q
"""


# ---------------------------------------------------------------------------
# Regression discontinuity
# ---------------------------------------------------------------------------


def q_rdd_value_purchase(sf_dir: str):
    """Sharp RDD of purchase on value at the median cutoff (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["value", "event_type"])

    def hpart(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        p = (np.asarray(t["event_type"].to_pylist())
             == "purchase").astype(np.int64)
        df = pd.DataFrame({"c": c, "p": p, "n": np.int64(1)})
        g = df.groupby("c", sort=False).sum().reset_index()
        for col in ("p", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("c").aggregate(Sum("p", alias_name="p"),
                                      Sum("n", alias_name="n"))
              .to_pandas().sort_values("c"))
    c = hist["c"].to_numpy(np.int64)
    p = hist["p"].to_numpy(np.int64)
    nn = hist["n"].to_numpy(np.int64)
    cum = np.cumsum(nn)
    total = int(cum[-1])
    cut = int(c[np.searchsorted(cum, math.ceil(0.5 * total))])

    def side_fit(mask):
        x = (c[mask] - cut).astype(object)
        w = nn[mask].astype(object)
        y = p[mask].astype(object)
        n_s = int(sum(w))
        sx = int(sum(w * x))
        sy = int(sum(y))
        sxx = int(sum(w * x * x))
        sxy = int(sum(x * y))
        a = float(sxx * sy - sx * sxy) / float(n_s * sxx - sx * sx)
        return n_s, a

    left = (c >= cut - _RDD_H) & (c < cut)
    right = (c >= cut) & (c <= cut + _RDD_H)
    n_l, a_l = side_fit(left)
    n_r, a_r = side_fit(right)
    tau = a_r - a_l
    out = pd.DataFrame({"cut_c": [cut], "n_left": [n_l],
                        "n_right": [n_r],
                        "a_left6": [_round6(np.array([a_l]))[0]],
                        "a_right6": [_round6(np.array([a_r]))[0]],
                        "tau6": [_round6(np.array([tau]))[0]]})
    for col in ("cut_c", "n_left", "n_right"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RDD = f"""
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         (event_type = 'purchase')::INT AS p
  FROM events),
t AS (SELECT quantile_disc(c, 0.5) AS cut FROM e),
sides AS (
  SELECT (c >= cut)::INT AS rt, (c - cut)::BIGINT AS x, p
  FROM e CROSS JOIN t
  WHERE c >= cut - {_RDD_H} AND c <= cut + {_RDD_H}),
m AS (
  SELECT rt, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(p)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
         sum(x * p)::BIGINT AS sxy
  FROM sides GROUP BY 1),
a AS (
  SELECT rt,
         CAST(sxx::HUGEINT * sy - sx::HUGEINT * sxy AS DOUBLE)
           / CAST(n::HUGEINT * sxx - sx::HUGEINT * sx AS DOUBLE)
           AS av,
         n
  FROM m),
f AS (
  SELECT max(CASE WHEN rt = 0 THEN av END) AS a_l,
         max(CASE WHEN rt = 1 THEN av END) AS a_r,
         max(CASE WHEN rt = 0 THEN n END) AS n_l,
         max(CASE WHEN rt = 1 THEN n END) AS n_r
  FROM a)
SELECT (SELECT cut FROM t)::BIGINT AS cut_c, n_l AS n_left,
       n_r AS n_right,
       round(a_l, 6) AS a_left6, round(a_r, 6) AS a_right6,
       round(a_r - a_l, 6) AS tau6
FROM f
"""


# ---------------------------------------------------------------------------
# E-value
# ---------------------------------------------------------------------------


def q_evalue_confounding(sf_dir: str):
    """VanderWeele E-value for the daily click->purchase RR (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def fpart(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist())
        df = pd.DataFrame({"u": uid, "day": day,
                           "hc": (et == "click").astype(np.int64),
                           "hp": (et == "purchase").astype(np.int64)})
        g = df.groupby(["u", "day"], sort=False).max().reset_index()
        return _strip(g)

    flags = (ds.map_batches(fpart, batch_format="pyarrow")
               .groupby(["u", "day"])
               .aggregate(Max("hc", alias_name="hc"),
                          Max("hp", alias_name="hp"))
               .to_pandas())
    hc = flags["hc"].to_numpy(np.int64)
    hp = flags["hp"].to_numpy(np.int64)
    a = int(((hc == 1) & (hp == 1)).sum())
    b = int(((hc == 1) & (hp == 0)).sum())
    cc = int(((hc == 0) & (hp == 1)).sum())
    d = int(((hc == 0) & (hp == 0)).sum())
    rr = (float(a) / float(a + b)) / (float(cc) / float(cc + d))
    se = math.sqrt(1.0 / float(a) - 1.0 / float(a + b)
                   + 1.0 / float(cc) - 1.0 / float(cc + d))
    # protective RRs flip to the reciprocal scale (VanderWeele)
    rs = 1.0 / rr if rr < 1.0 else rr
    ev = rs + math.sqrt(rs * (rs - 1.0))
    bound = math.exp(math.log(rr) + 1.96 * se) if rr < 1.0 \
        else math.exp(math.log(rr) - 1.96 * se)
    crosses = bound >= 1.0 if rr < 1.0 else bound <= 1.0
    if crosses:
        ev_lo = 1.0
    else:
        bs = 1.0 / bound if rr < 1.0 else bound
        ev_lo = bs + math.sqrt(bs * (bs - 1.0))
    out = pd.DataFrame({"n11": [a], "n10": [b], "n01": [cc],
                        "n00": [d],
                        "rr6": [_round6(np.array([rr]))[0]],
                        "evalue6": [_round6(np.array([ev]))[0]],
                        "evalue_lo6": [_round6(np.array([ev_lo]))[0]]})
    for col in ("n11", "n10", "n01", "n00"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_EVALUE = f"""
WITH ud AS (
  SELECT user_id, CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         max((event_type = 'click')::INT) AS hc,
         max((event_type = 'purchase')::INT) AS hp
  FROM events GROUP BY 1, 2),
c AS (
  SELECT sum((hc = 1 AND hp = 1)::INT)::BIGINT AS a,
         sum((hc = 1 AND hp = 0)::INT)::BIGINT AS b,
         sum((hc = 0 AND hp = 1)::INT)::BIGINT AS cc,
         sum((hc = 0 AND hp = 0)::INT)::BIGINT AS d
  FROM ud),
f AS (
  SELECT a, b, cc, d,
         (CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
           / (CAST(cc AS DOUBLE) / CAST(cc + d AS DOUBLE)) AS rr,
         sqrt(1.0 / CAST(a AS DOUBLE) - 1.0 / CAST(a + b AS DOUBLE)
              + 1.0 / CAST(cc AS DOUBLE)
              - 1.0 / CAST(cc + d AS DOUBLE)) AS se
  FROM c),
g AS (
  SELECT f.*,
         CASE WHEN rr < 1.0 THEN 1.0 / rr ELSE rr END AS rs,
         CASE WHEN rr < 1.0 THEN exp(ln(rr) + 1.96 * se)
              ELSE exp(ln(rr) - 1.96 * se) END AS bound
  FROM f),
h AS (
  SELECT g.*,
         CASE WHEN rr < 1.0 THEN bound >= 1.0
              ELSE bound <= 1.0 END AS crosses,
         CASE WHEN rr < 1.0 THEN 1.0 / bound ELSE bound END AS bs
  FROM g)
SELECT a AS n11, b AS n10, cc AS n01, d AS n00,
       round(rr, 6) AS rr6,
       round(rs + sqrt(rs * (rs - 1.0)), 6) AS evalue6,
       round(CASE WHEN crosses THEN 1.0
                  ELSE bs + sqrt(bs * (bs - 1.0)) END, 6) AS evalue_lo6
FROM h
"""


QUERIES94: dict[str, tuple] = {
    "propensity_strata_ate": (q_propensity_strata_ate, SQL_STRATA_ATE),
    "rdd_value_purchase": (q_rdd_value_purchase, SQL_RDD),
    "evalue_confounding": (q_evalue_confounding, SQL_EVALUE),
}
