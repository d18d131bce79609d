"""One-hundred-fifty-second oracle-query batch — sequence decoding,
optimal changepoint detection, and conjugate Bayesian prediction:

- viterbi_updown_daily: Viterbi decoding of a 2-state HMM over the
  daily revenue up/down sequence. All − ln p costs are LITERAL
  INTEGER nano-units (no runtime ln at all), so the DP and its
  backtrack are pure integer; ties prefer the smaller previous
  state. The oracle carries per-state path strings through the
  recursion and counts '1's in the winner.
- pelt_changepoints_daily: EXACT optimal multi-changepoint
  segmentation (the PELT objective without pruning — T = 30 makes
  the full O(T²) DP cheap) of daily event dollars under L2 segment
  cost. Segment SSE clears to (len·Σy² − (Σy)²)/len and is
  quantized to WHOLE dollar² units (1e-3 units would cross the 2^52
  float-integer boundary at scale — the gehan lesson); penalty
  β = whole-series cost // 15 + 1 is data-derived. Wagner-Whitin
  LIST-state recursion + backward segment-count walk.
- gamma_poisson_posterior: Gamma(2,1)-Poisson conjugate update on
  daily counts of extreme events (value above the 0.999 quantile_disc
  of cents), and the negative-binomial posterior predictive
  P(X = 0..3) for the next day built by the exact term recurrence
  P(k+1) = P(k)·(r+k)/(k+1)·(1/(b+1)) — identical float chains.
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

# -ln p in nano-units for p = .8 / .2 / .7 / .3 (literal constants)
_C_STAY = 223143551
_C_SWITCH = 1609437912
_C_MATCH = 356674944
_C_MISS = 1203972804


# ---------------------------------------------------------------------------
# Viterbi
# ---------------------------------------------------------------------------


def q_viterbi_updown_daily(sf_dir: str):
    """Viterbi decode of the daily up/down sequence (docstring)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    y = [int(v) for v in _daily_cents(sf_dir).tolist()]
    obs = [1 if b > a else 0 for a, b in zip(y[:-1], y[1:])]
    # state 0 "bear" emits 0 with p=.7; state 1 "bull" emits 1 w/ .7
    def ec(state: int, o: int) -> int:
        return _C_MATCH if o == state else _C_MISS

    v = [ec(0, obs[0]), ec(1, obs[0])]
    paths = ["0", "1"]
    for o in obs[1:]:
        nv = []
        np_ = []
        for j in (0, 1):
            c0 = v[0] + (_C_STAY if j == 0 else _C_SWITCH)
            c1 = v[1] + (_C_SWITCH if j == 0 else _C_STAY)
            if c0 <= c1:
                nv.append(c0 + ec(j, o))
                np_.append(paths[0] + str(j))
            else:
                nv.append(c1 + ec(j, o))
                np_.append(paths[1] + str(j))
        v, paths = nv, np_
    win = 0 if v[0] <= v[1] else 1
    path = paths[win]
    out = pd.DataFrame({"n_obs": [len(obs)], "cost": [v[win]],
                        "final_state": [win],
                        "n_bull": [path.count("1")]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_VITERBI = f"""
WITH RECURSIVE dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
ob AS (
  SELECT t - 1 AS i,
         (CASE WHEN y > lag(y) OVER (ORDER BY t) THEN 1 ELSE 0 END)
           AS o
  FROM seq QUALIFY t > 1),
nn AS (SELECT max(i)::BIGINT AS n FROM ob),
rec AS (
  SELECT 1::BIGINT AS i,
         (CASE WHEN o = 0 THEN {_C_MATCH} ELSE {_C_MISS} END)
           ::BIGINT AS v0,
         (CASE WHEN o = 1 THEN {_C_MATCH} ELSE {_C_MISS} END)
           ::BIGINT AS v1,
         '0' AS p0, '1' AS p1
  FROM ob WHERE i = 1
  UNION ALL
  SELECT nxt.i,
    (CASE WHEN rec.v0 + {_C_STAY} <= rec.v1 + {_C_SWITCH}
          THEN rec.v0 + {_C_STAY} ELSE rec.v1 + {_C_SWITCH} END)
    + (CASE WHEN nxt.o = 0 THEN {_C_MATCH} ELSE {_C_MISS} END),
    (CASE WHEN rec.v0 + {_C_SWITCH} <= rec.v1 + {_C_STAY}
          THEN rec.v0 + {_C_SWITCH} ELSE rec.v1 + {_C_STAY} END)
    + (CASE WHEN nxt.o = 1 THEN {_C_MATCH} ELSE {_C_MISS} END),
    (CASE WHEN rec.v0 + {_C_STAY} <= rec.v1 + {_C_SWITCH}
          THEN rec.p0 ELSE rec.p1 END) || '0',
    (CASE WHEN rec.v0 + {_C_SWITCH} <= rec.v1 + {_C_STAY}
          THEN rec.p0 ELSE rec.p1 END) || '1'
  FROM rec JOIN ob nxt ON nxt.i = rec.i + 1),
fin AS (
  SELECT * FROM rec WHERE i = (SELECT n FROM nn))
SELECT (SELECT n FROM nn) AS n_obs,
       (CASE WHEN v0 <= v1 THEN v0 ELSE v1 END)::BIGINT AS cost,
       (CASE WHEN v0 <= v1 THEN 0 ELSE 1 END)::BIGINT AS final_state,
       length(replace(CASE WHEN v0 <= v1 THEN p0 ELSE p1 END,
                      '0', ''))::BIGINT AS n_bull
FROM fin
"""


# ---------------------------------------------------------------------------
# PELT / optimal segmentation
# ---------------------------------------------------------------------------


def q_pelt_changepoints_daily(sf_dir: str):
    """Exact optimal L2 segmentation of daily dollars (docstring)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    y = [int(v) // 100 for v in _daily_cents(sf_dir).tolist()]
    t_days = len(y)
    p = [0]
    q = [0]
    for v in y:
        p.append(p[-1] + v)
        q.append(q[-1] + v * v)

    def rint(v: float) -> int:
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    def cost(s: int, t: int) -> int:
        ln = t - s + 1
        num = ln * (q[t] - q[s - 1]) - (p[t] - p[s - 1]) ** 2
        return rint(float(num) / float(ln))

    beta = cost(1, t_days) // 15 + 1
    f = [0]
    for t in range(1, t_days + 1):
        f.append(min(f[s - 1] + cost(s, t) + beta
                     for s in range(1, t + 1)))
    n_seg = 0
    t = t_days
    last_cp = 0
    while t > 0:
        s_star = next(s for s in range(1, t + 1)
                      if f[s - 1] + cost(s, t) + beta == f[t])
        if n_seg == 0 and s_star > 1:
            last_cp = s_star - 1
        n_seg += 1
        t = s_star - 1
    out = pd.DataFrame({"t_days": [t_days], "beta": [beta],
                        "total_cost": [f[t_days]],
                        "n_segments": [n_seg],
                        "last_cp": [last_cp]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_PELT = """
WITH RECURSIVE dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT)) // 100 AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
pre AS (
  SELECT t, y,
         sum(y) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cp,
         sum(y * y) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW) AS cq
  FROM seq),
base AS (
  SELECT max(t)::BIGINT AS td,
         list_prepend(0::BIGINT, list(cp ORDER BY t)) AS pl,
         list_prepend(0::BIGINT, list(cq ORDER BY t)) AS ql
  FROM pre),
bt AS (
  SELECT td, pl, ql,
         (CAST(round(CAST(td * (ql[td + 1] - ql[1])
                          - (pl[td + 1] - pl[1])
                            * (pl[td + 1] - pl[1]) AS DOUBLE)
                     / CAST(td AS DOUBLE)) AS BIGINT) // 15 + 1)
           AS beta
  FROM base),
dp AS (
  SELECT 0::BIGINT AS t, [0::BIGINT] AS fs, td, pl, ql, beta
  FROM bt
  UNION ALL
  SELECT t + 1,
         list_append(fs, list_aggregate(
           [fs[s]
            + CAST(round(CAST((t + 2 - s)
                              * (ql[t + 2] - ql[s])
                              - (pl[t + 2] - pl[s])
                                * (pl[t + 2] - pl[s]) AS DOUBLE)
                         / CAST(t + 2 - s AS DOUBLE)) AS BIGINT)
            + beta
            FOR s IN range(1, t + 2)], 'min')),
         td, pl, ql, beta
  FROM dp WHERE t < td),
fin AS (
  SELECT fs, td, pl, ql, beta FROM dp
  WHERE t = (SELECT max(t) FROM dp)),
walk AS (
  SELECT td AS t, 0::BIGINT AS n, 0::BIGINT AS last_cp,
         fs, td, pl, ql, beta
  FROM fin
  UNION ALL
  SELECT pick.sv - 1, n + 1,
         CASE WHEN n = 0 AND pick.sv > 1 THEN pick.sv - 1
              ELSE last_cp END,
         fs, td, pl, ql, beta
  FROM walk, LATERAL (
    SELECT list_aggregate(
      [s FOR s IN range(1, t + 1)
       IF fs[s]
          + CAST(round(CAST((t + 1 - s) * (ql[t + 1] - ql[s])
                            - (pl[t + 1] - pl[s])
                              * (pl[t + 1] - pl[s]) AS DOUBLE)
                       / CAST(t + 1 - s AS DOUBLE)) AS BIGINT)
          + beta = fs[t + 1]], 'min') AS sv) pick
  WHERE t > 0)
SELECT fin.td AS t_days, fin.beta AS beta,
       fin.fs[fin.td + 1] AS total_cost,
       (SELECT max(n) FROM walk)::BIGINT AS n_segments,
       (SELECT max(last_cp) FROM walk)::BIGINT AS last_cp
FROM fin
"""


# ---------------------------------------------------------------------------
# Gamma-Poisson posterior predictive
# ---------------------------------------------------------------------------


def q_gamma_poisson_posterior(sf_dir: str):
    """Gamma(2,1)-Poisson update + NB predictive (docstring)."""
    ds = _pq(sf_dir, "events", columns=["ts", "value"])

    def hist(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"c": c, "n": np.int64(1)}) \
            .groupby("c", sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(hist, batch_format="pyarrow")
           .groupby("c").aggregate(Sum("n", alias_name="n"))
           .to_pandas().sort_values("c"))
    cv = h["c"].to_numpy(np.int64)
    cn = np.cumsum(h["n"].to_numpy(np.int64))
    ntot = int(cn[-1])
    thr = int(cv[np.searchsorted(cn, math.ceil(0.999 * ntot))])

    def dcount(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        m = c > thr
        g = pd.DataFrame({"day": day[m], "k": np.int64(1)}) \
            .groupby("day", sort=False).sum().reset_index()
        g["k"] = g["k"].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(dcount, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("k", alias_name="k"))
             .to_pandas())
    n_days = 30
    from scrapy_ray.pipelines.queries143 import _daily_cents

    n_days = len(_daily_cents(sf_dir))
    k_sum = int(agg["k"].sum()) if len(agg) else 0
    r = 2 + k_sum
    b = 1 + n_days
    p0 = (float(b) / float(b + 1)) ** r
    ps = [p0]
    for k in range(3):
        ps.append(ps[-1] * (float(r) + float(k)) / (float(k) + 1.0)
                  / (float(b) + 1.0))
    r6 = _round6(np.array(ps))
    out = pd.DataFrame({"r_post": [r], "b_post": [b],
                        "thr_cents": [thr],
                        "p0_6": [r6[0]], "p1_6": [r6[1]],
                        "p2_6": [r6[2]], "p3_6": [r6[3]]})
    for col in ("r_post", "b_post", "thr_cents"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GAMMA_POISSON = """
WITH r AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         date_trunc('day', ts) AS dy
  FROM events),
thr AS (SELECT quantile_disc(c, 0.999) AS t FROM r),
nd AS (SELECT count(DISTINCT dy)::BIGINT AS n FROM r),
ks AS (
  SELECT count(*)::BIGINT AS k FROM r CROSS JOIN thr
  WHERE r.c > thr.t),
par AS (
  SELECT (2 + ks.k)::BIGINT AS rp, (1 + nd.n)::BIGINT AS bp,
         thr.t::BIGINT AS t
  FROM ks CROSS JOIN nd CROSS JOIN thr),
p0 AS (
  SELECT rp, bp, t,
         power(CAST(bp AS DOUBLE) / CAST(bp + 1 AS DOUBLE),
               CAST(rp AS DOUBLE)) AS p0
  FROM par),
p1 AS (SELECT *, p0 * (CAST(rp AS DOUBLE) + 0.0) / 1.0
                 / (CAST(bp AS DOUBLE) + 1.0) AS p1 FROM p0),
p2 AS (SELECT *, p1 * (CAST(rp AS DOUBLE) + 1.0) / 2.0
                 / (CAST(bp AS DOUBLE) + 1.0) AS p2 FROM p1),
p3 AS (SELECT *, p2 * (CAST(rp AS DOUBLE) + 2.0) / 3.0
                 / (CAST(bp AS DOUBLE) + 1.0) AS p3 FROM p2)
SELECT rp AS r_post, bp AS b_post, t AS thr_cents,
       round(p0, 6) AS p0_6, round(p1, 6) AS p1_6,
       round(p2, 6) AS p2_6, round(p3, 6) AS p3_6
FROM p3
"""


QUERIES152: dict[str, tuple] = {
    "viterbi_updown_daily": (q_viterbi_updown_daily, SQL_VITERBI),
    "pelt_changepoints_daily": (q_pelt_changepoints_daily, SQL_PELT),
    "gamma_poisson_posterior": (q_gamma_poisson_posterior,
                                SQL_GAMMA_POISSON),
}
