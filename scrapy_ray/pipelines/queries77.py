"""Seventy-seventh oracle-query batch — classifier gains table /
goodness-of-fit / circular statistics:

- gains_lift_deciles: the marketing gains/lift table of the
  value-score ranking against purchase outcome.  Bin thresholds are
  the nine exact disc deciles of value cents; bin(c) = # thresholds
  strictly below c (ties deterministic on both sides, no NTILE
  machinery).  Cumulative-from-top gain = cum_purch/total_purch and
  lift = cum_purch*total_n/(cum_n*total_purch) are exact-int
  rationals finalized identical-expression.
- ks_exponential_gaps: one-sample Kolmogorov-Smirnov goodness-of-fit
  of the COMPLETE inter-purchase gaps against the MLE-fitted
  exponential (lambda = n/SUM gap, an exact-int rational).  At every
  support point both one-sided gaps |F_n - F| and |F_n^- - F| enter
  the max; F = 1 - exp(-(lambda*g)) is an identical float expression
  (np.exp == DuckDB exp — the KM precedent) and the max is
  order-independent, so d6 compares raw (the pass-through-float
  rule).  Probe sf0.001: n=187, lambda = 5.57e-6.
- circular_rayleigh_events: circular statistics of the event
  time-of-day sod = epoch seconds mod 86400, angle = sod*2*pi/86400.
  Column-path cos/sin parity vs math.cos/sin was probed EXACT over
  the full 86400-value lattice; per distinct second the 1e-9
  quantized cos/sin ride the histogram as exact ints, giving exact
  C, S sums; R-bar = sqrt(cf^2+sf^2)/n, circular variance 1-R-bar
  and Rayleigh z = n*R-bar^2 finalize identical-expression.  The
  mean DIRECTION is deliberately omitted: atan2 showed 7/89 ULP
  mismatches vs DuckDB — not oracle-safe.  Probe sf0.001: n=1000,
  988 distinct seconds, R-bar = 0.01683, z = 0.2833 (near-uniform,
  as the synthetic timestamps should be).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries26 import _gap_hist
from scrapy_ray.pipelines.queries47 import _strip

_GL_QS = (10, 20, 30, 40, 50, 60, 70, 80, 90)


# ---------------------------------------------------------------------------
# Gains / lift deciles
# ---------------------------------------------------------------------------


def q_gains_lift_deciles(sf_dir: str):
    """Cumulative gains + lift by value decile (docstring above)."""
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
    n_tot = int(cum[-1])
    p_tot = int(p.sum())
    thr = np.array([c[np.searchsorted(cum, math.ceil(q / 100.0 * n_tot))]
                    for q in _GL_QS], np.int64)
    # bin = # thresholds strictly below c == searchsorted(thr, c, 'left')
    # (matches the SQL SUM of (c > t_q)::INT even when thresholds tie)
    bins = np.searchsorted(thr, c, side="left")
    df = pd.DataFrame({"b": bins, "n": nn, "p": p})
    g = df.groupby("b").sum().reindex(range(10), fill_value=0)
    gn = g["n"].to_numpy(np.int64)
    gp = g["p"].to_numpy(np.int64)
    # cumulative from the TOP bin (highest value) down
    order = np.arange(9, -1, -1)
    cn = np.cumsum(gn[order])
    cp = np.cumsum(gp[order])
    gain6 = _round6(np.array([float(int(a)) / float(p_tot) for a in cp]))
    lift6 = _round6(np.array(
        [float(int(a) * n_tot) / float(int(b) * p_tot)
         for a, b in zip(cp, cn)]))
    out = pd.DataFrame({"bin": order.astype(np.int64),
                        "n_bin": gn[order].astype(np.int64),
                        "purch_bin": gp[order].astype(np.int64),
                        "cum_n": cn.astype(np.int64),
                        "cum_purch": cp.astype(np.int64),
                        "gain6": gain6, "lift6": lift6})
    return out.reset_index(drop=True)


SQL_GAINS_LIFT = """
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         (event_type = 'purchase')::INT AS p
  FROM events),
th AS (
  SELECT """ + ", ".join(
    f"quantile_disc(c, {q / 100.0!r}) AS t{q}" for q in _GL_QS) + """
  FROM e),
bt AS (
  SELECT """ + " + ".join(f"(c > t{q})::INT" for q in _GL_QS) + """ AS b,
         p
  FROM e CROSS JOIN th),
g0 AS (
  SELECT b::BIGINT AS bin, count(*)::BIGINT AS n_bin,
         sum(p)::BIGINT AS purch_bin
  FROM bt GROUP BY 1),
g AS (
  -- all 10 bins present even if empty (mirrors the Python reindex)
  SELECT bn.bin, coalesce(n_bin, 0)::BIGINT AS n_bin,
         coalesce(purch_bin, 0)::BIGINT AS purch_bin
  FROM (SELECT unnest(range(0, 10))::BIGINT AS bin) bn
  LEFT JOIN g0 ON g0.bin = bn.bin),
t AS (SELECT sum(n_bin)::BIGINT AS n_tot, sum(purch_bin)::BIGINT AS p_tot
      FROM g),
cumt AS (
  SELECT bin, n_bin, purch_bin,
         sum(n_bin) OVER (ORDER BY bin DESC)::BIGINT AS cum_n,
         sum(purch_bin) OVER (ORDER BY bin DESC)::BIGINT AS cum_purch
  FROM g)
SELECT bin, n_bin, purch_bin, cum_n, cum_purch,
       round(CAST(cum_purch AS DOUBLE) / CAST(p_tot AS DOUBLE), 6)
         AS gain6,
       round(CAST(cum_purch * n_tot AS DOUBLE)
             / CAST(cum_n * p_tot AS DOUBLE), 6) AS lift6
FROM cumt CROSS JOIN t ORDER BY bin DESC
"""


# ---------------------------------------------------------------------------
# One-sample KS vs fitted exponential
# ---------------------------------------------------------------------------


def q_ks_exponential_gaps(sf_dir: str):
    """KS D of complete inter-purchase gaps vs MLE exponential
    (docstring above)."""
    hist = _gap_hist(sf_dir)
    ev = hist[hist["d"] > 0]
    g = ev["gap"].to_numpy(np.int64)
    d = ev["d"].to_numpy(np.int64)
    n = int(d.sum())
    s = int((g * d).sum())
    lam = float(n) / float(s)
    cum = np.cumsum(d)
    cdf = 1.0 - np.exp(-(lam * g.astype(np.float64)))
    fn = cum.astype(np.float64) / float(n)
    fp = (cum - d).astype(np.float64) / float(n)
    dstat = float(np.maximum(np.abs(fn - cdf), np.abs(fp - cdf)).max())
    out = pd.DataFrame({"n": [n], "gap_sum": [s],
                        "d6": [_round6(np.array([dstat]))[0]]})
    for col in ("n", "gap_sum"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KS_EXP = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
gp AS (
  SELECT (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id))
          - epoch_us(ts)) // 1000000 AS gap
  FROM p),
h AS (SELECT gap, count(*)::BIGINT AS d FROM gp
      WHERE gap IS NOT NULL GROUP BY 1),
t AS (SELECT sum(d)::BIGINT AS n, sum(gap * d)::BIGINT AS s FROM h),
c AS (
  SELECT gap, d, sum(d) OVER (ORDER BY gap)::BIGINT AS cum, n, s
  FROM h CROSS JOIN t),
u AS (
  SELECT greatest(
           abs(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE)
               - (1.0 - exp(-((CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
                              * CAST(gap AS DOUBLE))))),
           abs(CAST(cum - d AS DOUBLE) / CAST(n AS DOUBLE)
               - (1.0 - exp(-((CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
                              * CAST(gap AS DOUBLE)))))) AS term,
         n, s
  FROM c)
SELECT max(n) AS n, max(s) AS gap_sum, round(max(term), 6) AS d6
FROM u
"""


# ---------------------------------------------------------------------------
# Circular statistics / Rayleigh test
# ---------------------------------------------------------------------------


def q_circular_rayleigh_events(sf_dir: str):
    """Rayleigh uniformity test of event time-of-day (docstring
    above)."""
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
              .to_pandas())
    n = int(hist["cnt"].sum())
    c_sum = 0
    s_sum = 0
    for sod, cnt in zip(hist["sod"].to_numpy(np.int64),
                        hist["cnt"].to_numpy(np.int64)):
        a = int(sod) * (2.0 * math.pi / 86400.0)
        cv = math.cos(a) * 1000000000.0
        sv = math.sin(a) * 1000000000.0
        qc = int(math.floor(cv + 0.5)) if cv >= 0 \
            else int(math.ceil(cv - 0.5))
        qs = int(math.floor(sv + 0.5)) if sv >= 0 \
            else int(math.ceil(sv - 0.5))
        c_sum += int(cnt) * qc
        s_sum += int(cnt) * qs
    cf = float(c_sum) / 1000000000.0
    sf = float(s_sum) / 1000000000.0
    rbar = math.sqrt(cf * cf + sf * sf) / float(n)
    out = pd.DataFrame({"n": [n], "c_q": [c_sum], "s_q": [s_sum],
                        "rbar6": [_round6(np.array([rbar]))[0]],
                        "circvar6": [_round6(np.array([1.0 - rbar]))[0]],
                        "z6": [_round6(np.array(
                            [float(n) * (rbar * rbar)]))[0]]})
    for col in ("n", "c_q", "s_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CIRCULAR = """
WITH h AS (
  SELECT (epoch_us(ts) // 1000000) % 86400 AS sod,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
q AS (
  SELECT sum(cnt * CAST(round(cos(sod * (2.0 * pi() / 86400.0))
                              * 1000000000.0) AS BIGINT))::BIGINT AS c_q,
         sum(cnt * CAST(round(sin(sod * (2.0 * pi() / 86400.0))
                              * 1000000000.0) AS BIGINT))::BIGINT AS s_q,
         sum(cnt)::BIGINT AS n
  FROM h),
f AS (
  SELECT n, c_q, s_q,
         sqrt((CAST(c_q AS DOUBLE) / 1000000000.0)
                * (CAST(c_q AS DOUBLE) / 1000000000.0)
              + (CAST(s_q AS DOUBLE) / 1000000000.0)
                * (CAST(s_q AS DOUBLE) / 1000000000.0))
           / CAST(n AS DOUBLE) AS rbar
  FROM q)
SELECT n, c_q, s_q,
       round(rbar, 6) AS rbar6,
       round(1.0 - rbar, 6) AS circvar6,
       round(CAST(n AS DOUBLE) * (rbar * rbar), 6) AS z6
FROM f
"""


QUERIES77: dict[str, tuple] = {
    "gains_lift_deciles": (q_gains_lift_deciles, SQL_GAINS_LIFT),
    "ks_exponential_gaps": (q_ks_exponential_gaps, SQL_KS_EXP),
    "circular_rayleigh_events": (q_circular_rayleigh_events,
                                 SQL_CIRCULAR),
}
