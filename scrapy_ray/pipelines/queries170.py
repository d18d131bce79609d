"""One-hundred-seventieth oracle-query batch — exact-inference trio:

- fisher_exact_weekend_high: Fisher's EXACT test on the 2×2 table
  weekend × top-15-revenue day (rank by (rev DESC, day) — the
  deterministic tiebreak). Day counts are ≤30, so every
  hypergeometric term C(r1,k)·C(r0,c1−k) is an exact small integer
  (factorial()/HUGEINT `//` in SQL, math.comb driver-side); the
  one-sided tail and the standard two-sided (Σ of tables with
  pmf ≤ observed, compared on exact integer numerators — no float
  tolerance) finalize through ONE float division by C(30,15).
- coupon_collector_types: per-user coupon-collector waiting time —
  the 1-based position (ts, event_id order) of the event at which
  the user has seen all K=5 event types. Salted per-user partitions;
  only (n_complete, Σwait, max) integers leave each partition.
- greenwood_spacings_tod: the Greenwood uniformity statistic on
  time-of-day microseconds — Σ spacing² over the n+1 gaps of the
  sorted values in [0, 86.4e9), including both edges. Distributed as
  1440 minute-buckets (in-bucket sorted gap² sums, driver merges
  the ≤1440 boundary gaps with Python-int arithmetic — the total
  can exceed 2^63); n·G and the asymptotic z finalize identically.
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

_T_US = 86_400_000_000
_N_HIGH = 15


# ---------------------------------------------------------------------------
# Fisher exact
# ---------------------------------------------------------------------------


def q_fisher_exact_weekend_high(sf_dir: str):
    """Exact 2×2 Fisher test, weekend × top-revenue day (docstring)."""
    dly = _daily_xmy(sf_dir)
    rev = dly["y"].to_numpy(np.int64)
    day = dly["day"].to_numpy(np.int64)
    order = np.lexsort((day, -rev))
    high = np.zeros(len(dly), bool)
    high[order[:_N_HIGH]] = True
    wk = np.asarray(
        pd.to_datetime(day, unit="us").dayofweek >= 5)
    n = len(dly)
    r1 = int(wk.sum())
    r0 = n - r1
    c1 = _N_HIGH
    a = int((wk & high).sum())
    denom = math.comb(n, c1)
    lo = max(0, c1 - r0)
    hi = min(r1, c1)
    nums = {k: math.comb(r1, k) * math.comb(r0, c1 - k)
            for k in range(lo, hi + 1)}
    p_one = float(sum(v for k, v in nums.items() if k >= a)) \
        / float(denom)
    p_two = float(sum(v for v in nums.values() if v <= nums[a])) \
        / float(denom)
    r6 = _round6(np.array([p_one, p_two]))
    out = pd.DataFrame({"n_days": [n], "n_weekend": [r1],
                        "n_high": [c1], "a_weekend_high": [a],
                        "p_one6": [r6[0]], "p_two6": [r6[1]]})
    for col in ("n_days", "n_weekend", "n_high", "a_weekend_high"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_FISHER = f"""
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS rev
  FROM events GROUP BY 1),
rk AS (
  SELECT day, row_number() OVER (ORDER BY rev DESC, day) AS rnk
  FROM dly),
cell AS (
  SELECT count(*)::BIGINT AS n,
         sum((isodow(day) >= 6)::INT)::BIGINT AS r1,
         sum(((isodow(day) >= 6) AND rnk <= {_N_HIGH})::INT)::BIGINT
           AS a
  FROM rk),
terms AS (
  SELECT c.n, c.r1, c.a, k.k,
         (factorial(c.r1::INTEGER)
          // (factorial(k.k::INTEGER)
              * factorial((c.r1 - k.k)::INTEGER)))
         * (factorial((c.n - c.r1)::INTEGER)
            // (factorial(({_N_HIGH} - k.k)::INTEGER)
                * factorial((c.n - c.r1 - {_N_HIGH}
                             + k.k)::INTEGER)))
           AS num
  FROM cell c,
       LATERAL (SELECT unnest(range(
                  greatest(0, {_N_HIGH} - (c.n - c.r1)),
                  least(c.r1, {_N_HIGH}) + 1)) AS k) k),
obs AS (
  SELECT num AS num_a FROM terms WHERE k = (SELECT a FROM cell)),
agg AS (
  SELECT max(n) AS n, max(r1) AS r1, max(a) AS a,
         sum(CASE WHEN k >= (SELECT a FROM cell)
                  THEN num ELSE 0 END) AS s_one,
         sum(CASE WHEN num <= (SELECT num_a FROM obs)
                  THEN num ELSE 0 END) AS s_two,
         factorial(max(n)::INTEGER)
           // (factorial({_N_HIGH}::INTEGER)
               * factorial((max(n) - {_N_HIGH})::INTEGER)) AS denom
  FROM terms)
SELECT n::BIGINT AS n_days, r1::BIGINT AS n_weekend,
       {_N_HIGH}::BIGINT AS n_high, a::BIGINT AS a_weekend_high,
       round(CAST(s_one AS DOUBLE) / CAST(denom AS DOUBLE), 6)
         AS p_one6,
       round(CAST(s_two AS DOUBLE) / CAST(denom AS DOUBLE), 6)
         AS p_two6
FROM agg
"""


# ---------------------------------------------------------------------------
# Coupon collector
# ---------------------------------------------------------------------------


def q_coupon_collector_types(sf_dir: str):
    """Per-user all-K-types waiting position (docstring above)."""
    k = len(_pq(sf_dir, "events", columns=["event_type"])
            .unique("event_type"))
    ds = _pq(sf_dir, "events",
             columns=["ts", "event_id", "user_id", "event_type"])

    def salt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "u": pa.array(u),
            "ts": t["ts"].cast(pa.int64()),
            "e": t["event_id"], "et": t["event_type"],
            "sk": pa.array(u % 64)})

    def ppart(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts", "e"], kind="mergesort")
        df["pos"] = df.groupby("u", sort=False).cumcount() + 1
        fo = df.groupby(["u", "et"], sort=False)["pos"].min()
        per = fo.groupby(level=0).agg(["size", "max"])
        comp = per[per["size"] == k]
        return _strip(pd.DataFrame({
            "n_complete": [np.int64(len(comp))],
            "sum_wait": [np.int64(comp["max"].sum())],
            "max_wait": [np.int64(comp["max"].max())
                         if len(comp) else np.int64(0)]}))

    parts = (ds.map_batches(salt, batch_format="pyarrow")
               .groupby("sk").map_groups(ppart,
                                         batch_format="pandas")
               .to_pandas())
    n_complete = int(parts["n_complete"].sum())
    sum_wait = int(parts["sum_wait"].sum())
    max_wait = int(parts["max_wait"].max())
    mean6 = _round6(np.array([float(sum_wait) / n_complete]))[0]
    out = pd.DataFrame({"k_types": [k], "n_complete": [n_complete],
                        "mean_wait6": [mean6],
                        "max_wait": [max_wait]})
    for col in ("k_types", "n_complete", "max_wait"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_COUPON = """
WITH kk AS (SELECT count(DISTINCT event_type) AS k FROM events),
pos AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
fo AS (
  SELECT user_id, event_type, min(rn) AS f
  FROM pos GROUP BY 1, 2),
pu AS (
  SELECT user_id, count(*)::BIGINT AS nt, max(f)::BIGINT AS wait
  FROM fo GROUP BY 1),
cmp AS (SELECT wait FROM pu WHERE nt = (SELECT k FROM kk))
SELECT (SELECT k FROM kk)::BIGINT AS k_types,
       count(*)::BIGINT AS n_complete,
       round(CAST(sum(wait) AS DOUBLE) / count(*), 6) AS mean_wait6,
       max(wait)::BIGINT AS max_wait
FROM cmp
"""


# ---------------------------------------------------------------------------
# Greenwood spacings
# ---------------------------------------------------------------------------


def q_greenwood_spacings_tod(sf_dir: str):
    """Greenwood Σspacing² of time-of-day microseconds (docstring)."""
    ds = _pq(sf_dir, "events", columns=["ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tod = us % _T_US
        return pa.table({"tod": pa.array(tod),
                         "bk": pa.array(tod // 60_000_000)})

    def bsum(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["tod"].to_numpy(np.int64))
        d = np.diff(v)
        return pd.DataFrame({
            "bk": [int(df["bk"].iloc[0])], "cnt": [len(v)],
            "mn": [int(v[0])], "mx": [int(v[-1])],
            "ssq": [int((d.astype(object) * d.astype(object)).sum())
                    if len(d) else 0]})

    parts = (ds.map_batches(bucketize, batch_format="pyarrow")
               .groupby("bk").map_groups(bsum,
                                         batch_format="pandas")
               .to_pandas().sort_values("bk").reset_index(drop=True))
    n = int(parts["cnt"].sum())
    ssq = sum(int(v) for v in parts["ssq"])
    mns = [int(v) for v in parts["mn"]]
    mxs = [int(v) for v in parts["mx"]]
    ssq += mns[0] * mns[0]
    for prev_mx, mn in zip(mxs[:-1], mns[1:]):
        g = mn - prev_mx
        ssq += g * g
    last = _T_US - mxs[-1]
    ssq += last * last
    gn = float(n) * float(ssq) / (float(_T_US) * float(_T_US))
    z = (gn - 2.0) / math.sqrt(4.0 / n)
    r6 = _round6(np.array([gn, z]))
    out = pd.DataFrame({"n_events": [n], "gn6": [r6[0]],
                        "z6": [r6[1]]})
    out["n_events"] = out["n_events"].astype(np.int64)
    return out


SQL_GREENWOOD = f"""
WITH t AS (SELECT epoch_us(ts) % {_T_US} AS u FROM events),
o AS (SELECT u, lag(u) OVER (ORDER BY u) AS pu FROM t),
inner_sum AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(u - pu AS HUGEINT) * (u - pu)) AS ssq_in
  FROM o WHERE pu IS NOT NULL),
edges AS (SELECT min(u) AS mn, max(u) AS mx FROM t),
f AS (
  SELECT (SELECT n FROM inner_sum) + 1 AS n,
         (SELECT ssq_in FROM inner_sum)
         + CAST(mn AS HUGEINT) * mn
         + CAST({_T_US} - mx AS HUGEINT) * ({_T_US} - mx) AS ssq
  FROM edges),
g AS (
  SELECT n, CAST(n AS DOUBLE) * CAST(ssq AS DOUBLE)
            / (CAST({_T_US} AS DOUBLE) * CAST({_T_US} AS DOUBLE))
           AS gn
  FROM f)
SELECT n::BIGINT AS n_events, round(gn, 6) AS gn6,
       round((gn - 2.0) / sqrt(4.0 / n), 6) AS z6
FROM g
"""


QUERIES170: dict[str, tuple] = {
    "fisher_exact_weekend_high": (q_fisher_exact_weekend_high,
                                  SQL_FISHER),
    "coupon_collector_types": (q_coupon_collector_types, SQL_COUPON),
    "greenwood_spacings_tod": (q_greenwood_spacings_tod,
                               SQL_GREENWOOD),
}
