"""One-hundred-eighty-third oracle-query batch — scheduling, queueing
approximation, and exponentiality testing:

- lpt_makespan_orders: Longest-Processing-Time-first over the top-60
  order totals onto 3 machines (least-loaded, machine-index
  tiebreak via load·4+idx encoding so list_min IS the rule), one
  recursion level per item; makespan vs the max(⌈Σ/3⌉, max item)
  lower bound. Pure integers.
- kingman_gg1_bound: the Kingman G/G/1 heavy-traffic waiting-time
  bound W_q ≈ ρ/(1−ρ)·(ca²+cs²)/2·E[S] with interarrival moments
  from the exact event-timestamp gap sums (minute-bucket internal
  gaps + driver boundary merge — the Greenwood device on raw
  timestamps) and service times defined as value milliseconds;
  every moment is an exact integer before one identical float
  finalization.
- moran_exponentiality_gaps: Moran's log-spacings test of the
  exponential hypothesis on inter-purchase gaps (seconds, pooled
  across users, zero gaps excluded and counted) — per-gap
  −ln(g/ḡ) terms nano-quantized before summing; the asymptotic z
  uses the Euler–Mascheroni mean and π²/6 − 1 variance literals.
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

_LPT_N = 60
_EULER = 0.5772156649015329
_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# LPT makespan
# ---------------------------------------------------------------------------


def q_lpt_makespan_orders(sf_dir: str):
    """LPT on 3 machines over top-60 orders (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def top_part(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        order = np.lexsort((ok, -c))[:_LPT_N]
        return pa.table({"k": pa.array(ok[order]),
                         "c": pa.array(c[order])})

    part = (ds.map_batches(top_part, batch_format="pyarrow")
              .to_pandas())
    part = part.sort_values(["c", "k"],
                            ascending=[False, True]).head(_LPT_N)
    items = [int(v) for v in part["c"]]
    loads = [0, 0, 0]
    for it in items:
        m = min(range(3), key=lambda b: (loads[b], b))
        loads[m] += it
    tot = sum(items)
    mk = max(loads)
    lb = max(-(-tot // 3), items[0])
    r6 = _round6(np.array([float(mk) / float(lb)]))[0]
    out = pd.DataFrame({"n_items": [len(items)], "makespan": [mk],
                        "lower_bound": [lb], "ratio6": [r6]})
    for col in ("n_items", "makespan", "lower_bound"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LPT = f"""
WITH RECURSIVE items AS (
  SELECT list(c ORDER BY c DESC, k) AS il,
         count(*)::BIGINT AS n, sum(c)::BIGINT AS tot,
         max(c)::BIGINT AS mx
  FROM (SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c
        FROM orders ORDER BY c DESC, k LIMIT {_LPT_N})),
lpt AS (
  SELECT 0::BIGINT AS i, il, n, tot, mx,
         [0::BIGINT, 0::BIGINT, 0::BIGINT] AS loads
  FROM items
  UNION ALL
  SELECT i + 1, il, n, tot, mx,
         [CASE WHEN b = (enc % 4) THEN loads[b] + il[i + 1]
               ELSE loads[b] END
          FOR b IN range(1, 4)]
  FROM (
    SELECT i, il, n, tot, mx, loads,
           list_min([loads[bb] * 4 + bb
                     FOR bb IN range(1, 4)]) AS enc
    FROM lpt WHERE i < n) f),
fin AS (SELECT * FROM lpt WHERE i = n),
g AS (
  SELECT n, list_max(loads) AS mk,
         greatest((tot + 2) // 3, mx) AS lb
  FROM fin)
SELECT n AS n_items, mk::BIGINT AS makespan, lb::BIGINT
         AS lower_bound,
       round(CAST(mk AS DOUBLE) / CAST(lb AS DOUBLE), 6) AS ratio6
FROM g
"""


# ---------------------------------------------------------------------------
# Kingman G/G/1 bound
# ---------------------------------------------------------------------------


def q_kingman_gg1_bound(sf_dir: str):
    """Kingman heavy-traffic W_q bound (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "value"])

    def bucketize(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        sv = (np.sign(v) * np.floor(np.abs(v) * 1000.0 + 0.5)) \
            .astype(np.int64)          # service ms-units
        return pa.table({"t": pa.array(us), "sv": pa.array(sv),
                         "bk": pa.array(us // 600_000_000)})

    def bsum(df: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(df["t"].to_numpy(np.int64))
        d = np.diff(t)
        sv = df["sv"].to_numpy(np.int64)
        return pd.DataFrame({
            "bk": [int(df["bk"].iloc[0])], "cnt": [len(t)],
            "mn": [int(t[0])], "mx": [int(t[-1])],
            "sg": [int(d.sum())],
            "sgg": [int((d.astype(object)
                         * d.astype(object)).sum())],
            "ss": [int(sv.sum())],
            "sss": [int((sv.astype(object)
                         * sv.astype(object)).sum())]})

    parts = (ds.map_batches(bucketize, batch_format="pyarrow")
               .groupby("bk").map_groups(bsum,
                                         batch_format="pandas")
               .to_pandas().sort_values("bk").reset_index(drop=True))
    n = int(parts["cnt"].sum())
    sg = sum(int(v) for v in parts["sg"])
    sgg = sum(int(v) for v in parts["sgg"])
    mxs = [int(v) for v in parts["mx"]]
    mns = [int(v) for v in parts["mn"]]
    for pmx, mn in zip(mxs[:-1], mns[1:]):
        g = mn - pmx
        sg += g
        sgg += g * g
    ss = int(parts["ss"].sum())
    sss = sum(int(v) for v in parts["sss"])
    m = n - 1                    # number of interarrival gaps
    ea = float(sg) / float(m)
    va = (float(m * sgg - sg * sg)
          / (float(m) * float(m - 1)))
    ca2 = va / (ea * ea)
    # service in microseconds: 1 value-millisecond unit = 1000 us
    es = float(ss) / float(n) * 1000.0
    vs = (float(n * sss - ss * ss)
          / (float(n) * float(n - 1))) * 1e6
    cs2 = vs / (es * es)
    rho = es / ea
    wq = rho / (1.0 - rho) * (ca2 + cs2) / 2.0 * es
    r6 = _round6(np.array([rho, ca2, cs2, wq / 1000.0]))
    out = pd.DataFrame({"n_events": [n], "rho6": [r6[0]],
                        "ca2_6": [r6[1]], "cs2_6": [r6[2]],
                        "wq_ms6": [r6[3]]})
    out["n_events"] = out["n_events"].astype(np.int64)
    return out


SQL_KINGMAN = """
WITH t AS (
  SELECT epoch_us(ts) AS t,
         CAST(round(value * 1000) AS BIGINT) AS sv
  FROM events),
g AS (
  SELECT t - lag(t) OVER (ORDER BY t) AS d FROM t),
ga AS (
  SELECT count(*)::BIGINT AS m, sum(d)::BIGINT AS sg,
         sum(CAST(d AS HUGEINT) * d) AS sgg
  FROM g WHERE d IS NOT NULL),
sa AS (
  SELECT count(*)::BIGINT AS n, sum(sv)::BIGINT AS ss,
         sum(CAST(sv AS HUGEINT) * sv) AS sss
  FROM t),
f AS (
  SELECT sa.n,
         CAST(ga.sg AS DOUBLE) / CAST(ga.m AS DOUBLE) AS ea,
         CAST(ga.m * ga.sgg - CAST(ga.sg AS HUGEINT) * ga.sg
              AS DOUBLE)
           / (CAST(ga.m AS DOUBLE) * CAST(ga.m - 1 AS DOUBLE))
           AS va,
         CAST(sa.ss AS DOUBLE) / CAST(sa.n AS DOUBLE) * 1000.0
           AS es,
         CAST(sa.n * sa.sss - CAST(sa.ss AS HUGEINT) * sa.ss
              AS DOUBLE)
           / (CAST(sa.n AS DOUBLE) * CAST(sa.n - 1 AS DOUBLE))
           * 1e6 AS vs
  FROM ga, sa),
k AS (
  SELECT n, es / ea AS rho, va / (ea * ea) AS ca2,
         vs / (es * es) AS cs2, es
  FROM f)
SELECT n AS n_events, round(rho, 6) AS rho6, round(ca2, 6)
         AS ca2_6,
       round(cs2, 6) AS cs2_6,
       round(rho / (1.0 - rho) * (ca2 + cs2) / 2.0 * es
             / 1000.0, 6) AS wq_ms6
FROM k
"""


# ---------------------------------------------------------------------------
# Moran exponentiality test
# ---------------------------------------------------------------------------


def q_moran_exponentiality_gaps(sf_dir: str):
    """Moran log-spacings test on purchase gaps (docstring)."""
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
        return pa.table({"u": pa.array(uid), "ts": pa.array(ts),
                         "e": pa.array(eid),
                         "sk": pa.array(uid % 64)})

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts", "e"], kind="mergesort")
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        g = ((ts[1:] - ts[:-1]) // 1_000_000)[same]
        gg = (pd.DataFrame({"g": g, "n": np.int64(1)})
              .groupby("g", sort=False).sum().reset_index())
        gg["n"] = gg["n"].astype(np.int64)
        return _strip(gg)

    hist = (ds.map_batches(gap_partial, batch_format="pyarrow")
              .groupby("sk").map_groups(gaps,
                                        batch_format="pandas")
              .groupby("g").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    gv = hist["g"].to_numpy(np.int64)
    nv = hist["n"].to_numpy(np.int64)
    zero = int(nv[gv == 0].sum()) if (gv == 0).any() else 0
    pos = gv > 0
    gv, nv = gv[pos], nv[pos]
    n = int(nv.sum())
    sg = int((gv.astype(object) * nv.astype(object)).sum())
    gbar = float(sg) / float(n)
    mq = 0
    for g, cnt in zip(gv.tolist(), nv.tolist()):
        term = -math.log(float(g) / gbar)
        mq += int(cnt) * int(math.copysign(
            math.floor(abs(term) * 1e9 + 0.5), term))
    m_stat = float(mq) / 1e9 / n
    z = (m_stat - _EULER) \
        * math.sqrt(n / (math.pi * math.pi / 6.0 - 1.0))
    r6 = _round6(np.array([gbar, m_stat, z]))
    out = pd.DataFrame({"n_gaps": [n], "n_zero_excl": [zero],
                        "mean_gap_s6": [r6[0]], "moran6": [r6[1]],
                        "z6": [r6[2]]})
    for col in ("n_gaps", "n_zero_excl"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MORAN_EXP = f"""
WITH p AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type = 'purchase'),
g AS (
  SELECT CAST((epoch_us(ts) - epoch_us(prev)) // 1000000
              AS BIGINT) AS g
  FROM p WHERE prev IS NOT NULL),
zc AS (SELECT count(*)::BIGINT AS zero FROM g WHERE g = 0),
gp AS (SELECT g FROM g WHERE g > 0),
s AS (
  SELECT count(*)::BIGINT AS n, sum(g)::BIGINT AS sg FROM gp),
mb AS (
  SELECT (SELECT n FROM s) AS n,
         CAST((SELECT sg FROM s) AS DOUBLE)
           / CAST((SELECT n FROM s) AS DOUBLE) AS gbar),
m AS (
  SELECT mb.n, mb.gbar,
         sum(CAST(CASE WHEN -ln(CAST(gp.g AS DOUBLE) / mb.gbar)
                            >= 0
             THEN floor(abs(-ln(CAST(gp.g AS DOUBLE) / mb.gbar))
                        * 1e9 + 5e-1)
             ELSE -floor(abs(-ln(CAST(gp.g AS DOUBLE) / mb.gbar))
                         * 1e9 + 5e-1) END
             AS BIGINT))::BIGINT AS mq
  FROM gp, mb GROUP BY mb.n, mb.gbar),
f AS (
  SELECT n, gbar,
         CAST(mq AS DOUBLE) / 1e9 / n AS m_stat
  FROM m)
SELECT n AS n_gaps, (SELECT zero FROM zc) AS n_zero_excl,
       round(gbar, 6) AS mean_gap_s6, round(m_stat, 6) AS moran6,
       round((m_stat - {_EULER!r})
             * sqrt(n / (pi() * pi() / 6.0 - 1.0)), 6) AS z6
FROM f
"""


QUERIES183: dict[str, tuple] = {
    "lpt_makespan_orders": (q_lpt_makespan_orders, SQL_LPT),
    "kingman_gg1_bound": (q_kingman_gg1_bound, SQL_KINGMAN),
    "moran_exponentiality_gaps": (q_moran_exponentiality_gaps,
                                  SQL_MORAN_EXP),
}
