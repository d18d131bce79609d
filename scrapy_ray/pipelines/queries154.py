"""One-hundred-fifty-fourth oracle-query batch — marketing/ops
analytics variants users actually run:

- time_decay_attribution: exponential time-decay attribution (the
  variant q_attribution_credit's first/last/linear family lacks).
  For every purchase, all same-user touches in the prior 7 days get
  weight 2^(−Δt/6h); weights are normalized per conversion and each
  touch's share is quantized to 1e-9 BEFORE the per-type integer
  sums (never-sum-floats). Touch pairing is a salted per-user
  partition pass; the oracle is a pair join with the identical
  power(2, −Δ/hl) expression.
- windowed_funnel_steps: the strict sequential windowed funnel —
  first signup, then the first view within 30 minutes AFTER it, then
  the first purchase within 30 minutes after that view. Pure integer
  stage counts per user (the existing funnel query has no per-step
  time windows).
- eoq_parts: economic order quantity for the top-5 parts by annual
  lineitem demand (integral quantities quantized exactly): EOQ =
  sqrt(2DK/h) with literal K = 100, h = 2, plus cycles/year D/EOQ —
  identical float finalization of exact integer demand.
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

_TD_HALFLIFE_US = 6 * 3600 * 1_000_000
_TD_WINDOW_US = 7 * 86400 * 1_000_000
_WF_STEP_US = 30 * 60 * 1_000_000


def _r9(v: float) -> int:
    return int(math.floor(abs(v) * 1e9 + 0.5)) * (1 if v >= 0 else -1)


# ---------------------------------------------------------------------------
# Time-decay attribution
# ---------------------------------------------------------------------------


def q_time_decay_attribution(sf_dir: str):
    """Exponential time-decay credit per touch type (docstring)."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"])

    def salt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u),
                         "ts": t["ts"].cast(pa.int64()),
                         "e": t["event_id"],
                         "g": t["event_type"],
                         "sk": pa.array(u % 64)})

    def credit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts", "e"], kind="mergesort")
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        g = df["g"].to_numpy()
        out: dict[str, int] = {}
        conv = 0
        # per partition: python loop over conversions only; touches
        # located via per-user extents + searchsorted
        uniq, first = np.unique(u, return_index=True)
        ext = {int(a): (int(b), int(c)) for a, b, c in
               zip(uniq, first, np.r_[first[1:], len(u)])}
        for i in np.flatnonzero(g == "purchase").tolist():
            uu = int(u[i])
            lo, hi = ext[uu]
            t0 = int(ts[i])
            j0 = int(np.searchsorted(ts[lo:hi],
                                     t0 - _TD_WINDOW_US)) + lo
            idx = [j for j in range(j0, hi)
                   if int(ts[j]) < t0]
            if not idx:
                continue
            conv += 1
            # quantize each weight FIRST so the normalizer is an
            # order-free INTEGER sum (a float tot would be
            # order-dependent in the SQL aggregate)
            w9s = [_r9(2.0 ** (-(float(t0 - int(ts[j])))
                               / float(_TD_HALFLIFE_US)))
                   for j in idx]
            tot9 = sum(w9s)
            for j, w9 in zip(idx, w9s):
                out[str(g[j])] = out.get(str(g[j]), 0) \
                    + _r9(float(w9) / float(tot9))
        rows = [("__conv__", conv)] + sorted(out.items())
        return pd.DataFrame(rows, columns=["g", "c"])

    agg = (ds.map_batches(salt, batch_format="pyarrow")
             .groupby("sk").map_groups(credit, batch_format="pandas")
             .to_pandas())
    g = agg.groupby("g")["c"].sum()
    conv = int(g.get("__conv__", 0))
    g = g.drop("__conv__", errors="ignore").sort_index()
    out = pd.DataFrame({
        "touch_type": g.index.tolist(),
        "credit6": _round6(g.to_numpy(np.int64) / 1e9),
        "n_conversions": np.int64(conv)})
    out["n_conversions"] = out["n_conversions"].astype(np.int64)
    return out.reset_index(drop=True)


SQL_TIME_DECAY = f"""
WITH p AS (
  SELECT user_id, epoch_us(ts) AS t0
  FROM events WHERE event_type = 'purchase'),
touch AS (
  SELECT user_id, epoch_us(ts) AS t, event_type AS g FROM events),
pairs AS (
  SELECT p.user_id, p.t0, touch.t, touch.g
  FROM p JOIN touch ON touch.user_id = p.user_id
  WHERE touch.t < p.t0 AND touch.t >= p.t0 - {_TD_WINDOW_US}),
w AS (
  SELECT user_id, t0, g,
         CAST(round(power(2.0, -CAST(t0 - t AS DOUBLE)
                               / {_TD_HALFLIFE_US}.0) * 1e9)
              AS BIGINT) AS w9
  FROM pairs),
norm AS (
  SELECT user_id, t0, sum(w9)::BIGINT AS tot9 FROM w GROUP BY 1, 2),
conv AS (SELECT count(*)::BIGINT AS n FROM norm),
cr AS (
  SELECT w.g,
         sum(CAST(round(CAST(w.w9 AS DOUBLE)
                        / CAST(norm.tot9 AS DOUBLE) * 1e9)
                  AS BIGINT))::BIGINT AS c
  FROM w JOIN norm USING (user_id, t0)
  GROUP BY w.g)
SELECT g AS touch_type,
       round(CAST(c AS DOUBLE) / 1e9, 6) AS credit6,
       conv.n AS n_conversions
FROM cr CROSS JOIN conv ORDER BY g
"""


# ---------------------------------------------------------------------------
# Windowed funnel
# ---------------------------------------------------------------------------


def q_windowed_funnel_steps(sf_dir: str):
    """Strict sequential 30-min windowed funnel (docstring above)."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_type"])

    def salt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u),
                         "ts": t["ts"].cast(pa.int64()),
                         "g": t["event_type"],
                         "sk": pa.array(u % 64)})

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts"], kind="mergesort")
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        g = df["g"].to_numpy()
        n_u = n_s = n_v = n_p = 0
        uniq, first = np.unique(u, return_index=True)
        bounds = np.r_[first, len(u)]
        for a, b in zip(bounds[:-1], bounds[1:]):
            n_u += 1
            gg = g[a:b]
            tt = ts[a:b]
            si = np.flatnonzero(gg == "signup")
            if not len(si):
                continue
            n_s += 1
            s0 = int(tt[si[0]])
            vi = [j for j in range(len(gg))
                  if gg[j] == "view" and s0 < int(tt[j])
                  <= s0 + _WF_STEP_US]
            if not vi:
                continue
            n_v += 1
            v0 = int(tt[vi[0]])
            pi = [j for j in range(len(gg))
                  if gg[j] == "purchase" and v0 < int(tt[j])
                  <= v0 + _WF_STEP_US]
            if pi:
                n_p += 1
        return pd.DataFrame({"n_users": [n_u], "n_signup": [n_s],
                             "n_view": [n_v], "n_purchase": [n_p]})

    agg = (ds.map_batches(salt, batch_format="pyarrow")
             .groupby("sk").map_groups(funnel, batch_format="pandas")
             .to_pandas().sum())
    n_u, n_s = int(agg["n_users"]), int(agg["n_signup"])
    n_v, n_p = int(agg["n_view"]), int(agg["n_purchase"])
    out = pd.DataFrame({
        "n_users": [n_u], "n_signup": [n_s], "n_view": [n_v],
        "n_purchase": [n_p],
        "conv6": [_round6(np.array(
            [float(n_p) / float(n_s)]))[0] if n_s else 0.0]})
    for col in ("n_users", "n_signup", "n_view", "n_purchase"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_WINDOWED_FUNNEL = f"""
WITH s0 AS (
  SELECT user_id, min(epoch_us(ts)) AS s
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
v0 AS (
  SELECT s0.user_id, min(epoch_us(e.ts)) AS v
  FROM s0 JOIN events e ON e.user_id = s0.user_id
  WHERE e.event_type = 'view' AND epoch_us(e.ts) > s0.s
    AND epoch_us(e.ts) <= s0.s + {_WF_STEP_US}
  GROUP BY s0.user_id),
p0 AS (
  SELECT v0.user_id
  FROM v0 JOIN events e ON e.user_id = v0.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v0.v
    AND epoch_us(e.ts) <= v0.v + {_WF_STEP_US}
  GROUP BY v0.user_id),
c AS (
  SELECT (SELECT count(DISTINCT user_id) FROM events)::BIGINT
           AS n_users,
         (SELECT count(*) FROM s0)::BIGINT AS n_signup,
         (SELECT count(*) FROM v0)::BIGINT AS n_view,
         (SELECT count(*) FROM p0)::BIGINT AS n_purchase)
SELECT n_users, n_signup, n_view, n_purchase,
       round(CAST(n_purchase AS DOUBLE)
             / CAST(n_signup AS DOUBLE), 6) AS conv6
FROM c
"""


# ---------------------------------------------------------------------------
# EOQ
# ---------------------------------------------------------------------------


def q_eoq_parts(sf_dir: str):
    """EOQ for the top-5 parts by annual demand (docstring)."""
    ds = _pq(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def dpart(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        qq = (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64)
        g = pd.DataFrame({"p": t["l_partkey"].to_numpy(
                              zero_copy_only=False).astype(np.int64),
                          "d": qq}) \
            .groupby("p", sort=False).sum().reset_index()
        g["d"] = g["d"].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(dpart, batch_format="pyarrow")
             .groupby("p").aggregate(Sum("d", alias_name="d"))
             .to_pandas().sort_values(["d", "p"],
                                      ascending=[False, True])
             .head(5).reset_index(drop=True))
    d = agg["d"].to_numpy(np.int64)
    eoq = np.array([math.sqrt(2.0 * float(x) * 100.0 / 2.0)
                    for x in d.tolist()])
    cyc = np.array([float(x) / e for x, e in zip(d.tolist(),
                                                 eoq.tolist())])
    out = pd.DataFrame({"partkey": agg["p"].to_numpy(np.int64),
                        "demand": d, "eoq6": _round6(eoq),
                        "cycles6": _round6(cyc)})
    for col in ("partkey", "demand"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_EOQ = """
WITH d AS (
  SELECT l_partkey AS p,
         sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS demand
  FROM lineitem GROUP BY 1
  ORDER BY demand DESC, p LIMIT 5)
SELECT p AS partkey, demand,
       round(sqrt(2.0 * CAST(demand AS DOUBLE) * 100.0 / 2.0), 6)
         AS eoq6,
       round(CAST(demand AS DOUBLE)
             / sqrt(2.0 * CAST(demand AS DOUBLE) * 100.0 / 2.0), 6)
         AS cycles6
FROM d
"""


QUERIES154: dict[str, tuple] = {
    "time_decay_attribution": (q_time_decay_attribution,
                               SQL_TIME_DECAY),
    "windowed_funnel_steps": (q_windowed_funnel_steps,
                              SQL_WINDOWED_FUNNEL),
    "eoq_parts": (q_eoq_parts, SQL_EOQ),
}
