"""One-hundred-seventy-second oracle-query batch — three iterative
numerical replays, each with order-safe integer-cleared sums:

- cox_ph_binary_gaps: Cox proportional hazards on inter-purchase gap
  days with the binary parity covariate (Breslow ties). With a
  binary x the partial likelihood collapses to the per-time risk
  table (d_t, d1_t, n0_t, n1_t) — the logrank device (queries50) —
  and each of the 3 Newton steps needs only Σd·w and Σd·w(1−w)
  with w = n1·e^β/(n0+n1·e^β); both per-time terms are
  nano-quantized to integers before summing (order-free), and β
  updates through one identical float expression per step. Reports
  β, the hazard ratio e^β and the inverse-Hessian SE at β̂.
- binomial_option_daily: a 20-step Cox–Ross–Rubinstein binomial
  tree on the daily revenue series — σ from 1e-9-quantized daily
  log-returns (integer variance clearing), S0 = last day, K =
  first day, r = 0, risk-neutral p = (1−e^−σ)/(e^σ−e^−σ). European
  call and AMERICAN put (early exercise via greatest()) by backward
  induction over a LIST state in a recursive CTE; node prices are
  S0·exp((2j−k)·σ) so no cumulative float products. Anchors use
  scientific-notation literals (the DECIMAL recursion-anchor rule).
- sinkhorn_ot_dow: entropic optimal transport (ε = 1, circular
  |i−j| day-of-week cost) between the click and purchase dow
  distributions — 20 Sinkhorn iterations as 40 half-steps in one
  recursive CTE. Every kernel-vector product quantizes its 7 TERMS
  to 1e-12 integers before summing, so the scalings are exact
  functions of integers and float sum order can never bite; the
  final transport cost and plan mass clear the same way.
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
from scrapy_ray.pipelines.queries169 import _daily_xmy

_US_PER_DAY = 86_400_000_000
_N_TREE = 20
_SK_IT = 20


def _q9(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) * 1e9 + 0.5), x)) \
        if x else 0


def _q12(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) * 1e12 + 0.5), x)) \
        if x else 0


# ---------------------------------------------------------------------------
# Cox proportional hazards (binary covariate, Breslow ties)
# ---------------------------------------------------------------------------


def _gap_risk_table(sf_dir: str) -> pd.DataFrame:
    """Distributed (gap-day, d0, d1) histogram of inter-purchase gaps
    by parity cohort — the queries50 logrank device."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_type", "event_id"])

    def gap_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        keep = et == "purchase"
        uid = (t["user_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64)[keep])
        ts = (t["ts"].cast(pa.int64())
              .to_numpy(zero_copy_only=False)[keep])
        eid = (t["event_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64)[keep])
        return pa.table({"user_id": pa.array(uid),
                         "ts": pa.array(ts),
                         "event_id": pa.array(eid),
                         "salt": pa.array(uid % 64)})

    def gaps_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        if len(ts) < 2:
            return pd.DataFrame(
                {"grp": pd.Series([], dtype=np.int64),
                 "gap": pd.Series([], dtype=np.int64),
                 "cnt": pd.Series([], dtype=np.int64)})
        same = uid[1:] == uid[:-1]
        gap = ((ts[1:] - ts[:-1]) // _US_PER_DAY)[same]
        grp = (uid[1:] % 2)[same]
        g = (pd.DataFrame({"grp": grp, "gap": gap})
             .groupby(["grp", "gap"]).size().rename("cnt")
             .reset_index())
        for col in ("grp", "gap", "cnt"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(gap_partial, batch_format="pyarrow")
               .groupby("salt")
               .map_groups(gaps_partition, batch_format="pandas")
               .groupby(["grp", "gap"])
               .aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    piv = (cells.pivot_table(index="gap", columns="grp",
                             values="cnt", aggfunc="sum",
                             fill_value=0)
                .reindex(columns=[0, 1], fill_value=0)
                .sort_index())
    return piv


def q_cox_ph_binary_gaps(sf_dir: str):
    """3-step Newton Cox PH on parity cohorts (docstring above)."""
    piv = _gap_risk_table(sf_dir)
    d0 = piv[0].to_numpy(np.int64)
    d1 = piv[1].to_numpy(np.int64)
    nj = (d0 + d1)[::-1].cumsum()[::-1]
    n1j = d1[::-1].cumsum()[::-1]
    n0j = nj - n1j
    dj = d0 + d1
    dd1 = int(d1.sum())
    n_gaps = int(dj.sum())
    n_times = len(piv)

    def sums(b: float) -> tuple[int, int]:
        e = math.exp(b)
        s1 = 0
        s2 = 0
        for d, r0, r1 in zip(dj, n0j, n1j):
            w = (float(r1) * e) / (float(r0) + float(r1) * e)
            s1 += _q9(float(d) * w)
            s2 += _q9(float(d) * w * (1.0 - w))
        return s1, s2

    b = 0.0
    for _ in range(3):
        s1, s2 = sums(b)
        b = b + (float(dd1) - float(s1) / 1e9) / (float(s2) / 1e9)
    _, s2f = sums(b)
    se = 1.0 / math.sqrt(float(s2f) / 1e9)
    r6 = _round6(np.array([b, math.exp(b), se]))
    out = pd.DataFrame({"n_gaps": [n_gaps], "d1_total": [dd1],
                        "n_times": [n_times], "beta6": [r6[0]],
                        "hr6": [r6[1]], "se6": [r6[2]]})
    for col in ("n_gaps", "d1_total", "n_times"):
        out[col] = out[col].astype(np.int64)
    return out


_COX_RISK = f"""
p AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type = 'purchase'),
g AS (
  SELECT user_id % 2 AS grp,
         CAST((epoch_us(ts) - epoch_us(prev)) // {_US_PER_DAY}
              AS BIGINT) AS gap
  FROM p WHERE prev IS NOT NULL),
c AS (
  SELECT gap,
         sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::BIGINT AS d0,
         sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::BIGINT AS d1
  FROM g GROUP BY 1),
r AS (
  SELECT gap, d0, d1, (d0 + d1) AS dj,
         sum(d0 + d1) OVER (ORDER BY gap DESC)::BIGINT AS nj,
         sum(d1) OVER (ORDER BY gap DESC)::BIGINT AS n1j
  FROM c),
rt AS (SELECT dj, nj - n1j AS n0j, n1j FROM r),
tot AS (SELECT sum(d1)::BIGINT AS dd1, sum(dj)::BIGINT AS n_gaps,
               count(*)::BIGINT AS n_times
        FROM r)
"""


def _cox_step(src: str, dst: str) -> str:
    return f"""
s_{dst} AS (
  SELECT sum(CAST(round(1e9 * (CAST(rt.dj AS DOUBLE)
           * ((CAST(rt.n1j AS DOUBLE) * exp({src}.b))
              / (CAST(rt.n0j AS DOUBLE)
                 + CAST(rt.n1j AS DOUBLE) * exp({src}.b)))))
           AS BIGINT))::BIGINT AS s1,
         sum(CAST(round(1e9 * (CAST(rt.dj AS DOUBLE)
           * ((CAST(rt.n1j AS DOUBLE) * exp({src}.b))
              / (CAST(rt.n0j AS DOUBLE)
                 + CAST(rt.n1j AS DOUBLE) * exp({src}.b)))
           * (1e0 - (CAST(rt.n1j AS DOUBLE) * exp({src}.b))
              / (CAST(rt.n0j AS DOUBLE)
                 + CAST(rt.n1j AS DOUBLE) * exp({src}.b)))))
           AS BIGINT))::BIGINT AS s2
  FROM rt, {src}),
{dst} AS (
  SELECT {src}.b + (CAST(tot.dd1 AS DOUBLE)
                    - CAST(s_{dst}.s1 AS DOUBLE) / 1e9)
                   / (CAST(s_{dst}.s2 AS DOUBLE) / 1e9) AS b
  FROM {src}, s_{dst}, tot)
"""


SQL_COX = f"""
WITH {_COX_RISK},
b0 AS (SELECT 0e0 AS b),
{_cox_step('b0', 'b1')},
{_cox_step('b1', 'b2')},
{_cox_step('b2', 'b3')},
s_fin AS (
  SELECT sum(CAST(round(1e9 * (CAST(rt.dj AS DOUBLE)
           * ((CAST(rt.n1j AS DOUBLE) * exp(b3.b))
              / (CAST(rt.n0j AS DOUBLE)
                 + CAST(rt.n1j AS DOUBLE) * exp(b3.b)))
           * (1e0 - (CAST(rt.n1j AS DOUBLE) * exp(b3.b))
              / (CAST(rt.n0j AS DOUBLE)
                 + CAST(rt.n1j AS DOUBLE) * exp(b3.b)))))
           AS BIGINT))::BIGINT AS s2
  FROM rt, b3)
SELECT tot.n_gaps, tot.dd1 AS d1_total, tot.n_times,
       round(b3.b, 6) AS beta6, round(exp(b3.b), 6) AS hr6,
       round(1e0 / sqrt(CAST(s_fin.s2 AS DOUBLE) / 1e9), 6) AS se6
FROM tot, b3, s_fin
"""


# ---------------------------------------------------------------------------
# CRR binomial option pricing
# ---------------------------------------------------------------------------


def q_binomial_option_daily(sf_dir: str):
    """20-step CRR tree on the daily revenue series (docstring)."""
    dly = _daily_xmy(sf_dir)
    y = [int(v) for v in dly["y"]]
    n_ret = len(y) - 1
    qs = [_q9(math.log(float(y[i + 1]) / y[i]))
          for i in range(n_ret)]
    sq = sum(qs)
    sqq = sum(q * q for q in qs)
    sg = math.sqrt(float(n_ret * sqq - sq * sq)
                   / n_ret / (n_ret - 1)) / 1e9
    s0 = float(y[-1]) / 1e2
    kk = float(y[0]) / 1e2
    p = (1.0 - math.exp(-sg)) / (math.exp(sg) - math.exp(-sg))
    n = _N_TREE
    cv = [max(s0 * math.exp((2 * j - n) * sg) - kk, 0.0)
          for j in range(n + 1)]
    pv = [max(kk - s0 * math.exp((2 * j - n) * sg), 0.0)
          for j in range(n + 1)]
    for it in range(1, n + 1):
        k = n - it
        cv = [p * cv[j + 1] + (1.0 - p) * cv[j]
              for j in range(k + 1)]
        pv = [max(kk - s0 * math.exp((2 * j - k) * sg),
                  p * pv[j + 1] + (1.0 - p) * pv[j])
              for j in range(k + 1)]
    r6 = _round6(np.array([sg, cv[0], pv[0]]))
    out = pd.DataFrame({"n_days": [len(y)], "sigma6": [r6[0]],
                        "call6": [r6[1]], "am_put6": [r6[2]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_BINOMIAL = f"""
WITH RECURSIVE dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
lr AS (
  SELECT CAST(round(1e9 * ln(CAST(y AS DOUBLE)
                             / lag(y) OVER (ORDER BY day)))
              AS BIGINT) AS q
  FROM dly),
sig AS (
  SELECT count(*)::BIGINT AS n, sum(q)::BIGINT AS sq,
         sum(CAST(q AS HUGEINT) * q) AS sqq
  FROM lr WHERE q IS NOT NULL),
par AS (
  SELECT (SELECT count(*) FROM dly)::BIGINT AS n_days,
         sqrt(CAST(n * sqq - CAST(sq AS HUGEINT) * sq AS DOUBLE)
              / n / (n - 1)) / 1e9 AS sg,
         (SELECT CAST(max(y) FILTER (day = (SELECT max(day)
                                            FROM dly)) AS DOUBLE)
          FROM dly) / 1e2 AS s0,
         (SELECT CAST(max(y) FILTER (day = (SELECT min(day)
                                            FROM dly)) AS DOUBLE)
          FROM dly) / 1e2 AS kk
  FROM sig),
pp AS (
  SELECT n_days, sg, s0, kk,
         (1e0 - exp(-sg)) / (exp(sg) - exp(-sg)) AS p
  FROM par),
tree AS (
  SELECT 0 AS it, n_days, sg, s0, kk, p,
         [greatest(s0 * exp(CAST(2 * (jj - 1) - {_N_TREE}
                                 AS DOUBLE) * sg) - kk, 0e0)
          FOR jj IN range(1, {_N_TREE} + 2)] AS cv,
         [greatest(kk - s0 * exp(CAST(2 * (jj - 1) - {_N_TREE}
                                      AS DOUBLE) * sg), 0e0)
          FOR jj IN range(1, {_N_TREE} + 2)] AS pv
  FROM pp
  UNION ALL
  SELECT it + 1, n_days, sg, s0, kk, p,
         [p * cv[m + 1] + (1e0 - p) * cv[m]
          FOR m IN range(1, {_N_TREE} + 1 - it)],
         [greatest(kk - s0 * exp(CAST(2 * (m - 1)
                                      - ({_N_TREE} - it - 1)
                                      AS DOUBLE) * sg),
                   p * pv[m + 1] + (1e0 - p) * pv[m])
          FOR m IN range(1, {_N_TREE} + 1 - it)]
  FROM tree WHERE it < {_N_TREE})
SELECT n_days, round(sg, 6) AS sigma6, round(cv[1], 6) AS call6,
       round(pv[1], 6) AS am_put6
FROM tree WHERE it = {_N_TREE}
"""


# ---------------------------------------------------------------------------
# Sinkhorn OT on day-of-week distributions
# ---------------------------------------------------------------------------


def q_sinkhorn_ot_dow(sf_dir: str):
    """20-iteration entropic OT, clicks vs purchases by dow."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dow = pc.day_of_week(t["ts"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = np.asarray(t["event_type"].to_pylist())
        g = pd.DataFrame({"dow": dow,
                          "c": (et == "click").astype(np.int64),
                          "p": (et == "purchase").astype(np.int64)}) \
            .groupby("dow", sort=False).sum().reset_index()
        for col in ("c", "p"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(dpart, batch_format="pyarrow")
              .groupby("dow").aggregate(Sum("c", alias_name="c"),
                                        Sum("p", alias_name="p"))
              .to_pandas().sort_values("dow"))
    cc = np.zeros(7, np.int64)
    pp = np.zeros(7, np.int64)
    cc[hist["dow"].to_numpy(np.int64)] = hist["c"].to_numpy(np.int64)
    pp[hist["dow"].to_numpy(np.int64)] = hist["p"].to_numpy(np.int64)
    tc, tp = int(cc.sum()), int(pp.sum())
    a = [float(int(v)) / float(tc) for v in cc]
    b = [float(int(v)) / float(tp) for v in pp]
    cost = [[min(abs(i - j), 7 - abs(i - j)) for j in range(7)]
            for i in range(7)]
    kf = [[math.exp(-float(cost[i][j])) for j in range(7)]
          for i in range(7)]
    u = [1.0] * 7
    v = [1.0] * 7
    for _ in range(_SK_IT):
        u = [a[i] / (float(sum(_q12(kf[i][j] * v[j])
                               for j in range(7))) / 1e12)
             for i in range(7)]
        v = [b[j] / (float(sum(_q12(kf[i][j] * u[i])
                               for i in range(7))) / 1e12)
             for j in range(7)]
    cost_q = sum(_q12(u[i] * kf[i][j] * v[j]) * cost[i][j]
                 for i in range(7) for j in range(7))
    mass_q = sum(_q12(u[i] * kf[i][j] * v[j])
                 for i in range(7) for j in range(7))
    r6 = _round6(np.array([float(cost_q) / 1e12,
                           float(mass_q) / 1e12]))
    out = pd.DataFrame({"n_clicks": [tc], "n_purchases": [tp],
                        "ot_cost6": [r6[0]], "plan_mass6": [r6[1]]})
    for col in ("n_clicks", "n_purchases"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SINKHORN = f"""
WITH RECURSIVE hist AS (
  SELECT isodow(CAST(ts AS DATE)) - 1 AS dow,
         sum((event_type = 'click')::INT)::BIGINT AS c,
         sum((event_type = 'purchase')::INT)::BIGINT AS p
  FROM events GROUP BY 1),
spine AS (SELECT unnest(range(0, 7)) AS dd),
dense AS (
  SELECT s.dd, coalesce(h.c, 0)::BIGINT AS c,
         coalesce(h.p, 0)::BIGINT AS p
  FROM spine s LEFT JOIN hist h ON h.dow = s.dd),
marg AS (
  SELECT list(CAST(c AS DOUBLE) ORDER BY dd) AS cl,
         list(CAST(p AS DOUBLE) ORDER BY dd) AS pl,
         sum(c)::BIGINT AS tc, sum(p)::BIGINT AS tp
  FROM dense),
par AS (
  SELECT tc, tp,
         [x / CAST(tc AS DOUBLE) FOR x IN cl] AS a,
         [x2 / CAST(tp AS DOUBLE) FOR x2 IN pl] AS b,
         [exp(-CAST(least(abs((ii - 1) // 7 - (ii - 1) % 7),
                          7 - abs((ii - 1) // 7 - (ii - 1) % 7))
                    AS DOUBLE))
          FOR ii IN range(1, 50)] AS kf,
         [least(abs((i2 - 1) // 7 - (i2 - 1) % 7),
                7 - abs((i2 - 1) // 7 - (i2 - 1) % 7))
          FOR i2 IN range(1, 50)] AS cst
  FROM marg),
sk AS (
  SELECT 0 AS it, tc, tp, a, b, kf, cst,
         [1e0 FOR z IN range(1, 8)] AS u,
         [1e0 FOR z2 IN range(1, 8)] AS v
  FROM par
  UNION ALL
  SELECT it + 1, tc, tp, a, b, kf, cst,
         CASE WHEN (it + 1) % 2 = 1 THEN
           [a[i] / (CAST(list_sum(
              [CAST(round(1e12 * kf[(i - 1) * 7 + jj] * v[jj])
                    AS BIGINT) FOR jj IN range(1, 8)]) AS DOUBLE)
              / 1e12)
            FOR i IN range(1, 8)]
         ELSE u END,
         CASE WHEN (it + 1) % 2 = 0 THEN
           [b[j] / (CAST(list_sum(
              [CAST(round(1e12 * kf[(i3 - 1) * 7 + j] * u[i3])
                    AS BIGINT) FOR i3 IN range(1, 8)]) AS DOUBLE)
              / 1e12)
            FOR j IN range(1, 8)]
         ELSE v END
  FROM sk WHERE it < {2 * _SK_IT}),
fin AS (SELECT * FROM sk WHERE it = {2 * _SK_IT}),
plan AS (
  SELECT tc, tp,
         list_sum([CAST(round(1e12 * u[(ii - 1) // 7 + 1]
                              * kf[ii] * v[(ii - 1) % 7 + 1])
                        AS BIGINT) * cst[ii]
                   FOR ii IN range(1, 50)]) AS cost_q,
         list_sum([CAST(round(1e12 * u[(i4 - 1) // 7 + 1]
                              * kf[i4] * v[(i4 - 1) % 7 + 1])
                        AS BIGINT)
                   FOR i4 IN range(1, 50)]) AS mass_q
  FROM fin)
SELECT tc AS n_clicks, tp AS n_purchases,
       round(CAST(cost_q AS DOUBLE) / 1e12, 6) AS ot_cost6,
       round(CAST(mass_q AS DOUBLE) / 1e12, 6) AS plan_mass6
FROM plan
"""


QUERIES172: dict[str, tuple] = {
    "cox_ph_binary_gaps": (q_cox_ph_binary_gaps, SQL_COX),
    "binomial_option_daily": (q_binomial_option_daily, SQL_BINOMIAL),
    "sinkhorn_ot_dow": (q_sinkhorn_ot_dow, SQL_SINKHORN),
}
