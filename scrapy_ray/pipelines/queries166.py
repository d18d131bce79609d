"""One-hundred-sixty-sixth oracle-query batch — count-model fitting
and collision analysis:

- session_count_geometric_fit: sessions-per-user (30-min-gap rule)
  histogram with the geometric MLE p̂ = n_users/Σk and the expected
  counts n·p(1−p)^{k−1} at k = 1..3 — identical float finalization
  of exact integer counts.
- birthday_collision_audit: distinct users hashed into 1024 buckets
  (the multiplicative hash family); exact colliding-pair count
  Σ c(c−1)/2 against the birthday expectation C(n,2)/1024 — the
  collision-analysis companion to the Bloom/consistent-hash audits.
- gamma_mom_gaps: Gamma(k, θ) method-of-moments fit to the
  inter-purchase gap seconds: k = mean²/s², θ = s²/mean with the
  sample variance cleared to (nΣg² − S²)/(n(n−1)) HUGEINT
  numerators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_GAP_US = 30 * 60 * 1_000_000
_US_PER_S = 1_000_000
_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_BD_BUCKETS = 1024


# ---------------------------------------------------------------------------
# Geometric fit of sessions per user
# ---------------------------------------------------------------------------


def q_session_count_geometric_fit(sf_dir: str):
    """Geometric MLE on sessions-per-user counts (docstring)."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % 64) \
            .astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].astype("int64").to_numpy()
        new_user = np.r_[True, u[1:] != u[:-1]]
        brk = new_user | (np.r_[0, np.diff(ts)] > _GAP_US)
        sid = np.cumsum(brk)
        per_user = pd.DataFrame({"u": u, "sid": sid}) \
            .groupby("u", sort=False)["sid"].nunique()
        g = per_user.reset_index(name="k") \
            .groupby("k").size().rename("n").reset_index()
        for c in ("k", "n"):
            g[c] = g[c].astype(np.int64)
        return g

    hist = (ds.map_batches(with_key, batch_format="pyarrow")
              .groupby("gkey").map_groups(counts,
                                          batch_format="pandas")
              .groupby("k").aggregate(Sum("n", alias_name="n"))
              .to_pandas().sort_values("k").reset_index(drop=True))
    kv = hist["k"].to_numpy(np.int64)
    nv = hist["n"].to_numpy(np.int64)
    n_users = int(nv.sum())
    tot_k = int((kv * nv).sum())
    p = float(n_users) / float(tot_k)
    mean = float(tot_k) / float(n_users)

    def cnt(k: int) -> int:
        m = kv == k
        return int(nv[m][0]) if m.any() else 0

    exp = [float(n_users) * p * (1.0 - p) ** (k - 1)
           for k in (1, 2, 3)]
    r6 = _round6(np.array([mean, p] + exp))
    out = pd.DataFrame({
        "n_users": [n_users], "c1": [cnt(1)], "c2": [cnt(2)],
        "c3": [cnt(3)], "mean6": [r6[0]], "p6": [r6[1]],
        "e1_6": [r6[2]], "e2_6": [r6[3]], "e3_6": [r6[4]]})
    for col in ("n_users", "c1", "c2", "c3"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GEOMETRIC_FIT = f"""
WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events),
b AS (
  SELECT user_id,
         (CASE WHEN prev IS NULL
               OR epoch_us(ts) - epoch_us(prev) > {_GAP_US}
               THEN 1 ELSE 0 END) AS brk
  FROM e),
k AS (
  SELECT user_id, sum(brk)::BIGINT AS k FROM b GROUP BY user_id),
h AS (SELECT k, count(*)::BIGINT AS n FROM k GROUP BY k),
s AS (
  SELECT sum(n)::BIGINT AS nu, sum(k * n)::BIGINT AS tk FROM h),
f AS (
  SELECT nu, tk, CAST(nu AS DOUBLE) / CAST(tk AS DOUBLE) AS p,
         CAST(tk AS DOUBLE) / CAST(nu AS DOUBLE) AS mean
  FROM s)
SELECT nu AS n_users,
       coalesce((SELECT n FROM h WHERE k = 1), 0)::BIGINT AS c1,
       coalesce((SELECT n FROM h WHERE k = 2), 0)::BIGINT AS c2,
       coalesce((SELECT n FROM h WHERE k = 3), 0)::BIGINT AS c3,
       round(mean, 6) AS mean6, round(p, 6) AS p6,
       round(CAST(nu AS DOUBLE) * p * power(1.0 - p, 0.0), 6)
         AS e1_6,
       round(CAST(nu AS DOUBLE) * p * power(1.0 - p, 1.0), 6)
         AS e2_6,
       round(CAST(nu AS DOUBLE) * p * power(1.0 - p, 2.0), 6)
         AS e3_6
FROM f
"""


# ---------------------------------------------------------------------------
# Birthday collisions
# ---------------------------------------------------------------------------


def q_birthday_collision_audit(sf_dir: str):
    """Hash-bucket colliding pairs vs birthday expectation."""
    from scrapy_ray.pipelines.queries159 import _distinct_users

    uu = _distinct_users(sf_dir).astype(np.uint64)
    pos = (((uu % np.uint64(_H_MOD)) * np.uint64(_H_MULT)
            + np.uint64(_H_STEP)) % np.uint64(_H_MOD)
           % np.uint64(_BD_BUCKETS)).astype(np.int64)
    c = np.bincount(pos, minlength=_BD_BUCKETS).astype(np.int64)
    pairs = int((c * (c - 1) // 2).sum())
    n = len(uu)
    expected = float(n) * float(n - 1) / 2.0 / float(_BD_BUCKETS)
    out = pd.DataFrame({
        "n_keys": [n], "n_occupied": [int((c > 0).sum())],
        "colliding_pairs": [pairs],
        "expected6": [_round6(np.array([expected]))[0]],
        "ratio6": [_round6(np.array([float(pairs)
                                     / expected]))[0]]})
    for col in ("n_keys", "n_occupied", "colliding_pairs"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BIRTHDAY = f"""
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
pos AS (
  SELECT CAST(((u::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT
               + {_H_STEP}) % {_H_MOD} % {_BD_BUCKETS} AS BIGINT)
           AS p
  FROM u),
c AS (SELECT p, count(*)::BIGINT AS c FROM pos GROUP BY p),
s AS (
  SELECT (SELECT count(*) FROM u)::BIGINT AS n,
         count(*)::BIGINT AS occ,
         sum(c * (c - 1) // 2)::BIGINT AS pairs
  FROM c)
SELECT n AS n_keys, occ AS n_occupied, pairs AS colliding_pairs,
       round(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0
             / {_BD_BUCKETS}.0, 6) AS expected6,
       round(CAST(pairs AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0
                / {_BD_BUCKETS}.0), 6) AS ratio6
FROM s
"""


# ---------------------------------------------------------------------------
# Gamma method of moments
# ---------------------------------------------------------------------------


def q_gamma_mom_gaps(sf_dir: str):
    """Gamma MoM fit to inter-purchase gap seconds (docstring)."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_type", "event_id"])

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        keep = et == "purchase"
        uid = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        ts = t["ts"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[keep]
        eid = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[keep]
        return pa.table({"u": pa.array(uid), "ts": pa.array(ts),
                         "e": pa.array(eid),
                         "sk": pa.array(uid % 64)})

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts", "e"], kind="mergesort")
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        g = ((ts[1:] - ts[:-1]) // _US_PER_S)[same]
        return pd.DataFrame({
            "n": [int(len(g))], "s": [int(g.sum())],
            "q": [int((g.astype(object) * g.astype(object)).sum())]})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("sk").map_groups(moments,
                                       batch_format="pandas")
             .to_pandas().sum())
    n = int(agg["n"])
    s = int(agg["s"])
    q = int(agg["q"])
    mean = float(s) / float(n)
    var = float(n * q - s * s) / (float(n) * float(n - 1))
    k = mean * mean / var
    theta = var / mean
    r6 = _round6(np.array([mean, k, theta]))
    out = pd.DataFrame({"n_gaps": [n], "mean_s6": [r6[0]],
                        "k6": [r6[1]], "theta6": [r6[2]]})
    out["n_gaps"] = out["n_gaps"].astype(np.int64)
    return out


SQL_GAMMA_MOM = f"""
WITH p AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type = 'purchase'),
g AS (
  SELECT (epoch_us(ts) - epoch_us(prev)) // {_US_PER_S} AS gap
  FROM p WHERE prev IS NOT NULL),
s AS (
  SELECT count(*)::BIGINT AS n, sum(gap)::BIGINT AS s,
         sum(CAST(gap AS HUGEINT) * gap) AS q
  FROM g),
f AS (
  SELECT n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS var
  FROM s)
SELECT n AS n_gaps, round(mean, 6) AS mean_s6,
       round(mean * mean / var, 6) AS k6,
       round(var / mean, 6) AS theta6
FROM f
"""


QUERIES166: dict[str, tuple] = {
    "session_count_geometric_fit": (q_session_count_geometric_fit,
                                    SQL_GEOMETRIC_FIT),
    "birthday_collision_audit": (q_birthday_collision_audit,
                                 SQL_BIRTHDAY),
    "gamma_mom_gaps": (q_gamma_mom_gaps, SQL_GAMMA_MOM),
}
