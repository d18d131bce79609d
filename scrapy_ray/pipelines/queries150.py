"""One-hundred-fiftieth oracle-query batch — sweep-line pair counting
and classic sequence DP, all pure integers:

- session_overlap_pairs: the number of PAIRS of 30-min-gap user
  sessions (the max_concurrent_sessions definition: active on
  [first_ts, last_ts], starts before ends at an instant) that overlap
  in time. Sweep line: each start contributes the number of sessions
  already active; within a tie group the contribution sum is
  permutation-invariant, so the ambiguous-order cumsum is safe here
  (it feeds a SUM, not a grouping — the CLAUDE cumsum rule).
  Distributed as the bucketed prefix scan with carry: local pair
  sums + offset × (#starts in bucket), driver combines O(buckets).
- max_subarray_daily: maximum-sum contiguous window of the
  MEAN-CENTERED daily revenue, centered exactly by clearing
  (z_t = n·y_t − S). Both sides scan all O(n²) prefix pairs with the
  (sum DESC, start, end) tiebreak — Kadane gives the same value but
  not the same canonical window.
- lis_daily: longest strictly-increasing subsequence of the daily
  revenue, the O(n²) DP replayed with a LIST-state recursive CTE
  (list comprehension argmax per level); reports the length and the
  smallest ending day achieving it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries47 import _strip

_GAP_US = 30 * 60 * 1_000_000


# ---------------------------------------------------------------------------
# Session overlap pairs
# ---------------------------------------------------------------------------


def q_session_overlap_pairs(sf_dir: str):
    """Count of overlapping session pairs (docstring above)."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % 64) \
            .astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def sessions_to_deltas(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        new_user = np.r_[True, u[1:] != u[:-1]]
        brk = new_user | (np.r_[0, np.diff(ts)] > _GAP_US)
        sid = np.cumsum(brk)
        s = pd.DataFrame({"sid": sid, "ts": ts})
        g = s.groupby("sid", sort=False)["ts"].agg(["min", "max"])
        d_ts = np.concatenate([g["min"].to_numpy(),
                               g["max"].to_numpy()])
        d = np.concatenate([np.ones(len(g), np.int64),
                            -np.ones(len(g), np.int64)])
        return pd.DataFrame({"ts": d_ts, "delta": d,
                             "bucket": d_ts // 3_600_000_000})

    def bucket_scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "delta"], ascending=[True, False],
                            kind="mergesort")
        delta = df["delta"].to_numpy()
        run = delta.cumsum()
        plus = delta == 1
        local_pairs = int((run[plus] - 1).sum())
        return pd.DataFrame({
            "bucket": [int(df["bucket"].iloc[0])],
            "total": [int(run[-1])],
            "n_plus": [int(plus.sum())],
            "local_pairs": [local_pairs]})

    parts = (ds.map_batches(with_key, batch_format="pyarrow")
               .groupby("gkey").map_groups(sessions_to_deltas,
                                           batch_format="pandas")
               .groupby("bucket").map_groups(bucket_scan,
                                             batch_format="pandas")
               .to_pandas().sort_values("bucket")
               .reset_index(drop=True))
    offsets = np.concatenate(
        [[0], parts["total"].to_numpy().cumsum()[:-1]])
    pairs = int(parts["local_pairs"].sum()
                + (offsets * parts["n_plus"].to_numpy()).sum())
    n_sessions = int(parts["n_plus"].sum())
    out = pd.DataFrame({"n_sessions": [n_sessions],
                        "n_overlap_pairs": [pairs]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_SESSION_OVERLAP = f"""
WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events),
b AS (
  SELECT user_id, ts,
         (CASE WHEN prev IS NULL
               OR epoch_us(ts) - epoch_us(prev) > {_GAP_US}
               THEN 1 ELSE 0 END) AS brk
  FROM e),
sid AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS s
  FROM b),
sess AS (
  SELECT min(ts) AS t0, max(ts) AS t1
  FROM sid GROUP BY user_id, s),
deltas AS (
  SELECT epoch_us(t0) AS ts, 1::BIGINT AS delta FROM sess
  UNION ALL
  SELECT epoch_us(t1), -1::BIGINT FROM sess),
sweep AS (
  SELECT delta,
         sum(delta) OVER (ORDER BY ts, delta DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS run
  FROM deltas)
SELECT (SELECT count(*) FROM sess)::BIGINT AS n_sessions,
       sum(CASE WHEN delta = 1 THEN run - 1 ELSE 0 END)::BIGINT
         AS n_overlap_pairs
FROM sweep
"""


# ---------------------------------------------------------------------------
# Max mean-centered subarray
# ---------------------------------------------------------------------------


def q_max_subarray_daily(sf_dir: str):
    """Max-sum window of cleared-centered daily revenue (docstring)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    y = [int(v) for v in _daily_cents(sf_dir).tolist()]
    n = len(y)
    s = sum(y)
    z = [n * v - s for v in y]
    pref = [0]
    for v in z:
        pref.append(pref[-1] + v)
    best = None
    for i in range(n):
        for j in range(i + 1, n + 1):
            cand = (-(pref[j] - pref[i]), i + 1, j)
            if best is None or cand < best:
                best = cand
    neg, start, end = best
    out = pd.DataFrame({"n_days": [n], "start_day": [start],
                        "end_day": [end], "best_sum": [-neg]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_MAX_SUBARRAY = """
WITH dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
tot AS (SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS s FROM seq),
z AS (
  SELECT t, tot.n * y - tot.s AS z FROM seq CROSS JOIN tot),
pref AS (
  SELECT t, sum(z) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) AS p
  FROM z),
pref0 AS (
  SELECT 0::BIGINT AS t, 0::BIGINT AS p
  UNION ALL SELECT t, p FROM pref),
pairs AS (
  SELECT a.t AS i, b.t AS j, b.p - a.p AS su
  FROM pref0 a JOIN pref0 b ON b.t > a.t),
pick AS (
  SELECT *, row_number() OVER (ORDER BY su DESC, i, j) AS rk
  FROM pairs)
SELECT (SELECT n FROM tot) AS n_days, (i + 1)::BIGINT AS start_day,
       j::BIGINT AS end_day, su::BIGINT AS best_sum
FROM pick WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# Longest increasing subsequence
# ---------------------------------------------------------------------------


def q_lis_daily(sf_dir: str):
    """LIS of daily revenue via DP (docstring above)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    y = [int(v) for v in _daily_cents(sf_dir).tolist()]
    n = len(y)
    lens: list[int] = []
    for i in range(n):
        prev = [lens[j] for j in range(i) if y[j] < y[i]]
        lens.append(1 + (max(prev) if prev else 0))
    lis = max(lens)
    end_day = 1 + lens.index(lis)
    out = pd.DataFrame({"n_days": [n], "lis_len": [lis],
                        "end_day": [end_day]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_LIS = """
WITH RECURSIVE dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
base AS (
  SELECT count(*)::BIGINT AS n, list(y ORDER BY t) AS ys FROM seq),
dp AS (
  SELECT 1::BIGINT AS i, [1::BIGINT] AS lens, n, ys FROM base
  UNION ALL
  SELECT i + 1,
         list_append(lens,
           1 + coalesce(list_aggregate(
                 [lens[j] FOR j IN range(1, CAST(i AS INT) + 1)
                  IF ys[j] < ys[i + 1]], 'max'), 0)),
         n, ys
  FROM dp WHERE i < n),
fin AS (SELECT lens, n FROM dp WHERE i = (SELECT max(i) FROM dp)),
m AS (SELECT list_aggregate(lens, 'max') AS lis, lens, n FROM fin)
SELECT n AS n_days, lis::BIGINT AS lis_len,
       list_position(lens, lis)::BIGINT AS end_day
FROM m
"""


QUERIES150: dict[str, tuple] = {
    "session_overlap_pairs": (q_session_overlap_pairs,
                              SQL_SESSION_OVERLAP),
    "max_subarray_daily": (q_max_subarray_daily, SQL_MAX_SUBARRAY),
    "lis_daily": (q_lis_daily, SQL_LIS),
}
