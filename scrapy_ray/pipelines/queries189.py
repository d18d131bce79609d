"""One-hundred-eighty-ninth oracle-query batch — regret, sequential
detection, and generator auditing:

- hedge_experts_daily: the Hedge (multiplicative weights) algorithm
  over five daily-direction experts (always-up, always-down,
  momentum, contrarian, majority-so-far) with η = sqrt(8·ln5/T) —
  0/1 integer losses, weights requantized to 1e-12 each day, the
  algorithm's expected loss quantized 1e-9 per step; reports the
  cumulative regret against the best expert (exact integer expert
  losses).
- shiryaev_roberts_daily: the Shiryaev–Roberts change-detection
  statistic R_t = (1 + R_{t−1})·Λ_t on daily revenue dollars —
  pre-change N(μ̂, σ̂) from the first 15 days (integer-cleared
  moments), post-change mean μ̂ + σ̂; Λ is an identical float
  expression of exact integers, so the strictly sequential R chain
  is bit-stable without state quantization. Reports max R (log10),
  its day, and the first alarm day at A = 1e4.
- lcg_serial_correlation: the classical serial test of the repo's
  own multiplicative congruential family — a 4096-step orbit seeded
  from the total revenue cents, lag-1 serial correlation from
  HUGEINT-cleared sums carried IN the recursion state, and the 8×8
  successive-pair grid chi-square with exact (64c − n)² clearing.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries169 import _daily_xmy

_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_LCG_N = 4096
_SR_A = 1e4


# ---------------------------------------------------------------------------
# Hedge
# ---------------------------------------------------------------------------


def q_hedge_experts_daily(sf_dir: str):
    """Multiplicative weights over 5 direction experts."""
    dly = _daily_xmy(sf_dir)
    y = [int(v) for v in dly["y"]]
    outs = [1 if b > a else 0 for a, b in zip(y[:-1], y[1:])]
    t_n = len(outs)
    eta = math.sqrt(8.0 * math.log(5.0) / t_n)
    wq = [10 ** 12] * 5
    prev_o = 1
    ups = 0
    seen = 0
    algq = 0
    closs = [0] * 5
    for o in outs:
        preds = [1, 0, prev_o, 1 - prev_o,
                 1 if 2 * ups >= seen else 0]
        losses = [abs(p - o) for p in preds]
        sw = sum(wq)
        sl = sum(w for w, l in zip(wq, losses) if l == 1)
        alg = float(sl) / float(sw)
        algq += int(math.floor(alg * 1e9 + 0.5))
        nw = []
        for w, l in zip(wq, losses):
            if l == 1:
                v = (float(w) / 1e12) * math.exp(-eta) * 1e12
                nw.append(int(math.floor(v + 0.5)))
            else:
                nw.append(w)
        wq = nw
        for i in range(5):
            closs[i] += losses[i]
        prev_o = o
        ups += o
        seen += 1
    best = min(closs)
    alg_loss = float(algq) / 1e9
    regret = alg_loss - float(best)
    r6 = _round6(np.array([eta, alg_loss, regret]))
    out = pd.DataFrame({"t": [t_n], "best_expert_loss": [best],
                        "eta6": [r6[0]], "alg_loss6": [r6[1]],
                        "regret6": [r6[2]]})
    for col in ("t", "best_expert_loss"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HEDGE = f"""
WITH RECURSIVE dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
srt AS (SELECT row_number() OVER (ORDER BY day) AS t, y FROM dly),
outs AS (
  SELECT a.t - 1 AS t,
         CASE WHEN a.y > (SELECT y FROM srt b
                          WHERE b.t = a.t - 1)
              THEN 1 ELSE 0 END AS o
  FROM srt a WHERE a.t >= 2),
tn AS (SELECT count(*)::BIGINT AS t_n FROM outs),
eta AS (SELECT sqrt(8.0 * ln(5.0)
                    / CAST((SELECT t_n FROM tn) AS DOUBLE)) AS e),
sim AS (
  SELECT 0::BIGINT AS t,
         1000000000000::BIGINT AS w1, 1000000000000::BIGINT AS w2,
         1000000000000::BIGINT AS w3, 1000000000000::BIGINT AS w4,
         1000000000000::BIGINT AS w5,
         1::BIGINT AS prev_o, 0::BIGINT AS ups, 0::BIGINT AS seen,
         0::BIGINT AS algq,
         0::BIGINT AS c1, 0::BIGINT AS c2, 0::BIGINT AS c3,
         0::BIGINT AS c4, 0::BIGINT AS c5
  UNION ALL
  SELECT t + 1,
         CASE WHEN l1 = 1 THEN CAST(floor(
           (CAST(w1 AS DOUBLE) / 1e12)
           * exp(-(SELECT e FROM eta)) * 1e12 + 5e-1) AS BIGINT)
           ELSE w1 END,
         CASE WHEN l2 = 1 THEN CAST(floor(
           (CAST(w2 AS DOUBLE) / 1e12)
           * exp(-(SELECT e FROM eta)) * 1e12 + 5e-1) AS BIGINT)
           ELSE w2 END,
         CASE WHEN l3 = 1 THEN CAST(floor(
           (CAST(w3 AS DOUBLE) / 1e12)
           * exp(-(SELECT e FROM eta)) * 1e12 + 5e-1) AS BIGINT)
           ELSE w3 END,
         CASE WHEN l4 = 1 THEN CAST(floor(
           (CAST(w4 AS DOUBLE) / 1e12)
           * exp(-(SELECT e FROM eta)) * 1e12 + 5e-1) AS BIGINT)
           ELSE w4 END,
         CASE WHEN l5 = 1 THEN CAST(floor(
           (CAST(w5 AS DOUBLE) / 1e12)
           * exp(-(SELECT e FROM eta)) * 1e12 + 5e-1) AS BIGINT)
           ELSE w5 END,
         o, ups + o, seen + 1,
         algq + CAST(floor(
           CAST(l1 * w1 + l2 * w2 + l3 * w3 + l4 * w4 + l5 * w5
                AS DOUBLE)
           / CAST(w1 + w2 + w3 + w4 + w5 AS DOUBLE)
           * 1e9 + 5e-1) AS BIGINT),
         c1 + l1, c2 + l2, c3 + l3, c4 + l4, c5 + l5
  FROM (
    SELECT s.*, oo.o,
           abs(1 - oo.o) AS l1, abs(0 - oo.o) AS l2,
           abs(s.prev_o - oo.o) AS l3,
           abs((1 - s.prev_o) - oo.o) AS l4,
           abs((CASE WHEN 2 * s.ups >= s.seen THEN 1 ELSE 0 END)
               - oo.o) AS l5
    FROM sim s JOIN outs oo ON oo.t = s.t + 1
    WHERE s.t < (SELECT t_n FROM tn)) q),
fin AS (SELECT * FROM sim WHERE t = (SELECT t_n FROM tn))
SELECT t AS t, least(c1, c2, c3, c4, c5) AS best_expert_loss,
       round((SELECT e FROM eta), 6) AS eta6,
       round(CAST(algq AS DOUBLE) / 1e9, 6) AS alg_loss6,
       round(CAST(algq AS DOUBLE) / 1e9
             - CAST(least(c1, c2, c3, c4, c5) AS DOUBLE), 6)
         AS regret6
FROM fin
"""


# ---------------------------------------------------------------------------
# Shiryaev-Roberts
# ---------------------------------------------------------------------------


def q_shiryaev_roberts_daily(sf_dir: str):
    """Sequential SR change detection on daily revenue."""
    dly = _daily_xmy(sf_dir)
    y = [int(v) for v in dly["y"]]
    n = len(y)
    m = 15
    s1 = sum(y[:m])
    s2 = sum(v * v for v in y[:m])
    mu0 = float(s1) / float(m) / 100.0
    sd = math.sqrt(float(m * s2 - s1 * s1)
                   / (float(m) * float(m - 1))) / 100.0
    r = 0.0
    rmax = 0.0
    rmax_day = 0
    alarm = 0
    for t in range(n):
        x = float(y[t]) / 100.0
        # written exactly as the SQL: sd, not (mu0+sd)-mu0 — the
        # computed difference is not bitwise sd
        lam = math.exp(sd * (2.0 * x - mu0 - (mu0 + sd))
                       / (2.0 * sd * sd))
        r = (1.0 + r) * lam
        if r > rmax:
            rmax = r
            rmax_day = t + 1
        if alarm == 0 and r > _SR_A:
            alarm = t + 1
    r6 = _round6(np.array([mu0, sd, math.log10(rmax)]))
    out = pd.DataFrame({"n_days": [n], "rmax_day": [rmax_day],
                        "alarm_day": [alarm], "mu0_6": [r6[0]],
                        "sd6": [r6[1]], "log10_rmax6": [r6[2]]})
    for col in ("n_days", "rmax_day", "alarm_day"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SR = f"""
WITH RECURSIVE dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
srt AS (SELECT row_number() OVER (ORDER BY day) AS t, y FROM dly),
par AS (
  SELECT CAST(s1 AS DOUBLE) / 15 / 100.0 AS mu0,
         sqrt(CAST(15 * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
              / (15.0 * 14.0)) / 100.0 AS sd,
         (SELECT count(*) FROM srt)::BIGINT AS n
  FROM (SELECT sum(y)::BIGINT AS s1,
               sum(CAST(y AS HUGEINT) * y) AS s2
        FROM srt WHERE t <= 15)),
sim AS (
  SELECT 0::BIGINT AS t, 0e0 AS r, 0e0 AS rmax,
         0::BIGINT AS rmax_day, 0::BIGINT AS alarm,
         mu0, sd, n
  FROM par
  UNION ALL
  SELECT t + 1,
         (1e0 + r) * lam,
         CASE WHEN (1e0 + r) * lam > rmax
              THEN (1e0 + r) * lam ELSE rmax END,
         CASE WHEN (1e0 + r) * lam > rmax
              THEN t + 1 ELSE rmax_day END,
         CASE WHEN alarm = 0 AND (1e0 + r) * lam > {_SR_A!r}
              THEN t + 1 ELSE alarm END,
         mu0, sd, n
  FROM (
    SELECT s.*, exp((s.sd)
                    * (2.0 * (CAST((SELECT y FROM srt
                                    WHERE srt.t = s.t + 1)
                                   AS DOUBLE) / 100.0)
                       - s.mu0 - (s.mu0 + s.sd))
                    / (2.0 * s.sd * s.sd)) AS lam
    FROM sim s WHERE s.t < s.n) q)
SELECT n AS n_days, rmax_day, alarm_day, round(mu0, 6) AS mu0_6,
       round(sd, 6) AS sd6, round(log10(rmax), 6) AS log10_rmax6
FROM (SELECT *, alarm AS alarm_day FROM sim WHERE t = n)
"""


# ---------------------------------------------------------------------------
# LCG serial test
# ---------------------------------------------------------------------------


def q_lcg_serial_correlation(sf_dir: str):
    """Serial test of the multiplicative hash orbit (docstring)."""
    ds = _pq(sf_dir, "events", columns=["value"])

    def cpart(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        return pa.table({"k": pa.array([0], pa.int64()),
                         "sc": pa.array([int(c.sum())], pa.int64())})

    from ray.data.aggregate import Sum

    total = int(ds.map_batches(cpart, batch_format="pyarrow")
                  .groupby("k").aggregate(Sum("sc", alias_name="sc"))
                  .to_pandas()["sc"].iloc[0])
    x = total % _H_MOD
    n = _LCG_N
    sx = sxx = sxy = 0
    grid = [0] * 64
    prev = x
    first = x
    for i in range(n):
        nxt = (prev * _H_MULT + _H_STEP) % _H_MOD
        sx += prev
        sxx += prev * prev
        sxy += prev * nxt
        grid[(prev >> 29) * 8 + (nxt >> 29)] += 1
        prev = nxt
    # wrap the last pair to close the circle (pairs = n)
    last = prev
    corr_num = n * sxy - sx * (sx - first + last)
    # serial correlation over the n consecutive pairs (x_i, x_{i+1})
    sy = sx - first + last
    syy = sxx - first * first + last * last
    den = math.sqrt(float(n * sxx - sx * sx)) \
        * math.sqrt(float(n * syy - sy * sy))
    corr = float(corr_num) / den
    gs = sum((64 * c - n) ** 2 for c in grid)
    chi2 = float(gs) / (64.0 * n)
    r6 = _round6(np.array([corr, chi2]))
    out = pd.DataFrame({"n_steps": [n], "seed": [x],
                        "serial_corr6": [r6[0]],
                        "grid_chi2_6": [r6[1]]})
    for col in ("n_steps", "seed"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LCG = f"""
WITH RECURSIVE seed AS (
  SELECT sum(CAST(round(value * 100) AS BIGINT))::BIGINT
           % {_H_MOD} AS x
  FROM events),
orbit AS (
  SELECT 0::BIGINT AS i, x AS prev, x AS first,
         0::HUGEINT AS sx, 0::HUGEINT AS sxx, 0::HUGEINT AS sxy,
         [0::BIGINT FOR z IN range(1, 65)] AS grid
  FROM seed
  UNION ALL
  SELECT i + 1, nxt, first,
         sx + prev, sxx + CAST(prev AS HUGEINT) * prev,
         sxy + CAST(prev AS HUGEINT) * nxt,
         [CASE WHEN g = (prev >> 29) * 8 + (nxt >> 29) + 1
               THEN grid[g] + 1 ELSE grid[g] END
          FOR g IN range(1, 65)]
  FROM (SELECT o.*,
               CAST((o.prev::HUGEINT * {_H_MULT} + {_H_STEP})
                    % {_H_MOD} AS BIGINT) AS nxt
        FROM orbit o WHERE o.i < {_LCG_N}) q),
fin AS (SELECT * FROM orbit WHERE i = {_LCG_N}),
f AS (
  SELECT {_LCG_N}::BIGINT AS n, (SELECT x FROM seed) AS seed,
         sx, sxx, sxy, first, prev AS last, grid
  FROM fin),
g AS (
  SELECT n, seed, grid,
         CAST({_LCG_N} * sxy
              - sx * (sx - first + last) AS DOUBLE) AS num,
         sqrt(CAST({_LCG_N} * sxx - sx * sx AS DOUBLE))
         * sqrt(CAST({_LCG_N} * (sxx - CAST(first AS HUGEINT)
                                 * first
                                 + CAST(last AS HUGEINT) * last)
                     - (sx - first + last)
                       * (sx - first + last) AS DOUBLE)) AS den
  FROM f),
h AS (
  SELECT n, seed, num / den AS corr,
         (SELECT sum((64 * gg.g - {_LCG_N})
                     * (64 * gg.g - {_LCG_N}))
          FROM (SELECT unnest(grid) AS g) gg)::BIGINT AS gs
  FROM g)
SELECT n AS n_steps, seed, round(corr, 6) AS serial_corr6,
       round(CAST(gs AS DOUBLE) / (64.0 * {_LCG_N}), 6)
         AS grid_chi2_6
FROM h
"""


QUERIES189: dict[str, tuple] = {
    "hedge_experts_daily": (q_hedge_experts_daily, SQL_HEDGE),
    "shiryaev_roberts_daily": (q_shiryaev_roberts_daily, SQL_SR),
    "lcg_serial_correlation": (q_lcg_serial_correlation, SQL_LCG),
}
