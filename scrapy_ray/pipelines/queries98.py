"""Ninety-eighth oracle-query batch — paired sign test / k-related
binary homogeneity / queueing recursion:

- sign_test_click_view_daily: the paired sign test on daily click vs
  view counts: n+ = days click > view, n- = days click < view (ties
  dropped), continuity-corrected z = sign * (|2 n+ - m| - 1)/sqrt(m)
  — exact ints into one identical float.
- cochran_q_types: Cochran's Q across the three binary "did
  {click, view, purchase} that day" indicators over (user, day)
  blocks (per-USER indicators are degenerate — every user has every
  type, so k*SUM L - SUM L^2 = 0; user-days have ~3 events and real
  variation): with G_j = per-type block counts and L_b = per-block
  type counts,
  Q = (k-1)(k*SUM G^2 - (SUM G)^2)/(k*SUM L - SUM L^2) is one exact
  integer ratio (the k-sample extension of McNemar).
- lindley_queue_sim: Lindley waiting-time recursion over the first
  2000 purchase arrivals in global (ts, event_id) order (cap keeps
  the recursive-CTE oracle fast; documented): integer inter-arrival
  seconds, deterministic service = median interarrival // 2;
  W <- max(0, W + S - A) exact ints; reports total/max wait and
  busy-arrival count.  MATERIALIZED CTEs (the queries97 lesson).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_US_PER_DAY = 86_400_000_000
_LQ_CAP = 2000


# ---------------------------------------------------------------------------
# Sign test
# ---------------------------------------------------------------------------


def q_sign_test_click_view_daily(sf_dir: str):
    """Continuity-corrected paired sign test (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist())
        df = pd.DataFrame({"day": day,
                           "x": (et == "click").astype(np.int64),
                           "y": (et == "view").astype(np.int64)})
        g = df.groupby("day", sort=False).sum().reset_index()
        for c in ("x", "y"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    daily = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("x", alias_name="x"),
                                         Sum("y", alias_name="y"))
               .to_pandas())
    x = daily["x"].to_numpy(np.int64)
    y = daily["y"].to_numpy(np.int64)
    nplus = int((x > y).sum())
    nminus = int((x < y).sum())
    m = nplus + nminus
    d = 2 * nplus - m
    z = (0.0 if d == 0 else
         (1.0 if d > 0 else -1.0) * (abs(d) - 1.0) / math.sqrt(float(m)))
    out = pd.DataFrame({"n_days": [len(x)], "n_plus": [nplus],
                        "n_minus": [nminus],
                        "z6": [_round6(np.array([z]))[0]]})
    for col in ("n_days", "n_plus", "n_minus"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SIGN_TEST = f"""
WITH daily AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'view')::INT)::BIGINT AS y
  FROM events GROUP BY 1),
c AS (
  SELECT count(*)::BIGINT AS n_days,
         sum((x > y)::INT)::BIGINT AS np_,
         sum((x < y)::INT)::BIGINT AS nm_
  FROM daily)
SELECT n_days, np_ AS n_plus, nm_ AS n_minus,
       round(CASE WHEN 2 * np_ - (np_ + nm_) = 0 THEN 0.0
                  WHEN 2 * np_ - (np_ + nm_) > 0 THEN
                    (abs(2 * np_ - (np_ + nm_)) - 1.0)
                    / sqrt(CAST(np_ + nm_ AS DOUBLE))
                  ELSE -((abs(2 * np_ - (np_ + nm_)) - 1.0)
                         / sqrt(CAST(np_ + nm_ AS DOUBLE)))
             END, 6) AS z6
FROM c
"""


# ---------------------------------------------------------------------------
# Cochran's Q
# ---------------------------------------------------------------------------


def q_cochran_q_types(sf_dir: str):
    """Cochran's Q over ever-did-{click,view,purchase} indicators
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def upart(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist())
        df = pd.DataFrame({"u": uid, "day": day,
                           "c": (et == "click").astype(np.int64),
                           "v": (et == "view").astype(np.int64),
                           "p": (et == "purchase").astype(np.int64)})
        g = df.groupby(["u", "day"], sort=False).max().reset_index()
        return _strip(g)

    per = (ds.map_batches(upart, batch_format="pyarrow")
             .groupby(["u", "day"])
             .aggregate(Max("c", alias_name="c"),
                        Max("v", alias_name="v"),
                        Max("p", alias_name="p"))
             .to_pandas())
    g1 = int(per["c"].sum())
    g2 = int(per["v"].sum())
    g3 = int(per["p"].sum())
    ell = (per["c"] + per["v"] + per["p"]).to_numpy(np.int64)
    sl = int(ell.sum())
    sl2 = int((ell * ell).sum())
    k = 3
    num = (k - 1) * (k * (g1 * g1 + g2 * g2 + g3 * g3)
                     - (g1 + g2 + g3) ** 2)
    den = k * sl - sl2
    qstat = float(num) / float(den)
    out = pd.DataFrame({"n_blocks": [len(per)], "g_click": [g1],
                        "g_view": [g2], "g_purchase": [g3],
                        "q6": [_round6(np.array([qstat]))[0]]})
    for col in ("n_blocks", "g_click", "g_view", "g_purchase"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_COCHRAN_Q = f"""
WITH per AS (
  SELECT user_id, CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         max((event_type = 'click')::INT)::BIGINT AS c,
         max((event_type = 'view')::INT)::BIGINT AS v,
         max((event_type = 'purchase')::INT)::BIGINT AS p
  FROM events GROUP BY 1, 2),
t AS (
  SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS g1,
         sum(v)::BIGINT AS g2, sum(p)::BIGINT AS g3,
         sum(c + v + p)::BIGINT AS sl,
         sum((c + v + p) * (c + v + p))::BIGINT AS sl2
  FROM per)
SELECT n AS n_blocks, g1 AS g_click, g2 AS g_view, g3 AS g_purchase,
       round(CAST(2 * (3 * (g1 * g1 + g2 * g2 + g3 * g3)
                       - (g1 + g2 + g3) * (g1 + g2 + g3)) AS DOUBLE)
             / CAST(3 * sl - sl2 AS DOUBLE), 6) AS q6
FROM t
"""


# ---------------------------------------------------------------------------
# Lindley queue
# ---------------------------------------------------------------------------


def q_lindley_queue_sim(sf_dir: str):
    """Lindley W recursion over capped purchase arrivals (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_id", "event_type"])

    def ppart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        keep = et == "purchase"
        return pa.table({
            "ts_us": pa.array(t["ts"].cast(pa.int64())
                              .to_numpy(zero_copy_only=False)[keep]),
            "eid": pa.array(t["event_id"]
                            .to_numpy(zero_copy_only=False)[keep]
                            .astype(np.int64))})

    arr = (ds.map_batches(ppart, batch_format="pyarrow")
             .to_pandas().sort_values(["ts_us", "eid"])
             .head(_LQ_CAP))
    ts = arr["ts_us"].to_numpy(np.int64)
    a = (np.diff(ts) // 1_000_000).astype(np.int64)
    n = len(a)
    srt = np.sort(a)
    svc = int(srt[math.ceil(0.5 * n) - 1]) // 2
    w = 0
    s_wait = 0
    mx = 0
    busy = 0
    for av in a:
        w = max(0, w + svc - int(av))
        s_wait += w
        if w > mx:
            mx = w
        if w > 0:
            busy += 1
    out = pd.DataFrame({"n_arrivals": [n], "service_s": [svc],
                        "sum_wait_s": [s_wait], "max_wait_s": [mx],
                        "busy_arrivals": [busy]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_LINDLEY = f"""
WITH RECURSIVE pur AS MATERIALIZED (
  SELECT epoch_us(ts) AS ts_us, event_id
  FROM events WHERE event_type = 'purchase'
  ORDER BY ts, event_id LIMIT {_LQ_CAP}),
gaps AS MATERIALIZED (
  SELECT (ts_us - lag(ts_us) OVER (ORDER BY ts_us, event_id))
           // 1000000 AS a,
         row_number() OVER (ORDER BY ts_us, event_id) - 1 AS t
  FROM pur),
g2 AS MATERIALIZED (SELECT a, t FROM gaps WHERE t >= 1),
p AS MATERIALIZED (
  SELECT count(*)::BIGINT AS n,
         quantile_disc(a, 0.5) // 2 AS svc
  FROM g2),
r AS (
  SELECT 0::BIGINT AS t, 0::BIGINT AS w, 0::BIGINT AS s_wait,
         0::BIGINT AS mx, 0::BIGINT AS busy
  FROM p
  UNION ALL
  SELECT g2.t,
         greatest(0, r.w + p.svc - g2.a) AS w,
         r.s_wait + greatest(0, r.w + p.svc - g2.a) AS s_wait,
         greatest(r.mx, greatest(0, r.w + p.svc - g2.a)) AS mx,
         r.busy + (greatest(0, r.w + p.svc - g2.a) > 0)::INT AS busy
  FROM r JOIN g2 ON g2.t = r.t + 1 CROSS JOIN p)
SELECT (SELECT n FROM p) AS n_arrivals, (SELECT svc FROM p) AS service_s,
       s_wait AS sum_wait_s, mx AS max_wait_s, busy AS busy_arrivals
FROM r WHERE t = (SELECT n FROM p)
"""


QUERIES98: dict[str, tuple] = {
    "sign_test_click_view_daily": (q_sign_test_click_view_daily,
                                   SQL_SIGN_TEST),
    "cochran_q_types": (q_cochran_q_types, SQL_COCHRAN_Q),
    "lindley_queue_sim": (q_lindley_queue_sim, SQL_LINDLEY),
}
