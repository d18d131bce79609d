"""Fourteenth oracle-query batch (round 4) — three query shapes the
registry did not yet cover:

- EXACT interpolated percentiles (SQL ``percentile_cont`` semantics)
  WITHOUT a global sort: a two-level distributed rank-selection — a
  4096-bucket histogram (mergeable Sum aggregate, ~KBs over the wire)
  locates the bracketing order statistics, then a second pruned pass
  gathers only the distinct values of the few buckets that contain the
  target ranks. Per-bucket gather size is bounded by the bucket's CENT
  WIDTH (range/4096), independent of row count — the shape that still
  works when ``orders`` is 10^12 rows, where ``ROW_NUMBER() OVER (ORDER
  BY ...)`` (the oracle's formulation) would be a full-data sort.
  Exactness: interpolation ``v[k] + frac*(v[k+1]-v[k])`` with
  frac = m/100 is carried as the INTEGER ``v[k]*(100-m) + v[k+1]*m``
  (centi-cents) — no float compare anywhere (CLAUDE.md rule);
- ORDERED string aggregation (``string_agg(... ORDER BY ...)``): each
  customer's order-status history concatenated in (o_orderdate,
  o_orderkey) order — the order-sensitive aggregate the engine had no
  entry for. Salted co-partition + in-partition pandas groupby (the
  CLAUDE.md salted-partition rule; ~1.5k single-customer map_groups
  dispatches cost 6x more, measured round 3);
- gaps-and-islands (activity streaks): per user, distinct active days
  compress into runs of consecutive days — islands counted and the
  longest measured in one co-partitioned vectorized pass; the oracle is
  the classic ``day - ROW_NUMBER()`` island id.

All DuckDB-oracle-checked on the same parquet inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents_np, _pq

_P = 64

# ---------------------------------------------------------------------------
# exact percentile_cont via distributed rank-selection
# ---------------------------------------------------------------------------

_PCT_Q100 = (50, 90, 99)
_PCT_NB = 4096


def q_percentile_cont_price(sf_dir: str):
    """p50/p90/p99 of orders.o_totalprice with ``percentile_cont``
    (linear-interpolation) semantics, exact, with NO global sort:

    pass 1 (pruned 1-column scan): per-batch (min, max, n) partials,
      combined driver-side (tiny);
    pass 2: per-batch 4096-bucket histogram partials ->
      groupby(bucket).sum — a mergeable aggregate whose total payload is
      <=4096 rows regardless of input size; a driver cumsum locates the
      bucket holding each target rank k and k+1;
    pass 3: re-scan filtered to the <=6 needed buckets only, grouped to
      (value, count) — per bucket at most ``ceil(range/4096)`` DISTINCT
      cent values survive, a bound set by the domain, not the row count;
      exact order statistics fall out of a driver-side walk.

    Interpolation is exact-integer: h = q100*(n-1)/100, k = floor(h),
    m = (q100*(n-1)) mod 100, reported value = v[k]*(100-m) + v[k+1]*m
    in centi-cents (BIGINT both sides)."""
    ds = _pq(sf_dir, "orders", ["o_totalprice"])

    def mm(t: pa.Table) -> pa.Table:
        c = _cents_np(t["o_totalprice"].to_numpy(zero_copy_only=False))
        if len(c) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(c.min())]),
                         "hi": pa.array([int(c.max())]),
                         "n": pa.array([len(c)])})

    parts = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    lo = int(parts["lo"].min())
    hi = int(parts["hi"].max())
    n = int(parts["n"].sum())
    width = max(1, (hi - lo + _PCT_NB) // _PCT_NB)   # cents per bucket

    def hist(t: pa.Table) -> pa.Table:
        c = _cents_np(t["o_totalprice"].to_numpy(zero_copy_only=False))
        b = (c - lo) // width
        cnt = np.bincount(b, minlength=1)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(cnt[nz].astype(np.int64))})

    hdf = (ds.map_batches(hist, batch_format="pyarrow")
             .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas().sort_values("bucket"))
    buckets = hdf["bucket"].to_numpy()
    counts = hdf["cnt"].to_numpy()
    cum = np.concatenate([[0], np.cumsum(counts)])   # rows before bucket i

    # global ranks we must materialize: k and min(k+1, n-1) per quantile
    want: dict[int, tuple[int, int]] = {}            # q100 -> (k, m)
    need_ranks: set[int] = set()
    for q in _PCT_Q100:
        k, m = divmod(q * (n - 1), 100)
        want[q] = (k, m)
        need_ranks.add(k)
        need_ranks.add(min(k + 1, n - 1))
    need_buckets = sorted({
        int(buckets[np.searchsorted(cum, r, side="right") - 1])
        for r in need_ranks})

    def gather(t: pa.Table) -> pa.Table:
        c = _cents_np(t["o_totalprice"].to_numpy(zero_copy_only=False))
        keep = np.isin((c - lo) // width, need_buckets)
        v, cnt = np.unique(c[keep], return_counts=True)
        return pa.table({"v": pa.array(v.astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    vdf = (ds.map_batches(gather, batch_format="pyarrow")
             .groupby("v").aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas().sort_values("v"))
    vals = vdf["v"].to_numpy()
    vcum = np.cumsum(vdf["cnt"].to_numpy())          # within gathered values

    def value_at(rank: int) -> int:
        # every asked rank's bucket is in need_buckets by construction, so
        # its values were gathered; local rank within the bucket indexes
        # the (value, count) run via one cumsum searchsorted
        i = int(np.searchsorted(cum, rank, side="right") - 1)
        b = int(buckets[i])
        start = int(cum[i])
        b_lo = lo + b * width
        in_b = (vals >= b_lo) & (vals < b_lo + width)
        lv = vals[in_b]
        lc = np.cumsum(vdf["cnt"].to_numpy()[in_b])
        return int(lv[np.searchsorted(lc, rank - start, side="right")])

    rows = []
    for q in _PCT_Q100:
        k, m = want[q]
        vk = value_at(k)
        vk1 = value_at(min(k + 1, n - 1))
        rows.append((q, vk, vk1, vk * (100 - m) + vk1 * m))
    df = pd.DataFrame(rows, columns=["q100", "lo_cents", "hi_cents",
                                     "interp_centicents"])
    for c in df.columns:
        df[c] = df[c].astype(np.int64)
    return df.sort_values("q100").reset_index(drop=True)


SQL_PERCENTILE_CONT = """
WITH v AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS c FROM orders),
s AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) - 1 AS rk FROM v),
n AS (SELECT COUNT(*)::BIGINT AS n FROM v),
p(q100) AS (VALUES (50), (90), (99)),
k AS (SELECT p.q100::BIGINT AS q100,
             (p.q100*(n.n-1))//100 AS k,
             (p.q100*(n.n-1))%100 AS m,
             n.n AS n
      FROM p, n)
SELECT k.q100 AS q100, lo.c AS lo_cents, hi.c AS hi_cents,
       (lo.c*(100-k.m) + hi.c*k.m)::BIGINT AS interp_centicents
FROM k
JOIN s lo ON lo.rk = k.k
JOIN s hi ON hi.rk = CASE WHEN k.k + 1 > k.n - 1 THEN k.n - 1 ELSE k.k + 1 END
ORDER BY q100
"""


# ---------------------------------------------------------------------------
# ordered string aggregation
# ---------------------------------------------------------------------------


def q_order_status_seq(sf_dir: str):
    """Per-customer order-status HISTORY: statuses concatenated in
    (o_orderdate, o_orderkey) order — ``string_agg(expr, ',' ORDER BY ...)``.
    Order-sensitive aggregation: the comma string is only correct if the
    per-group sort survives the shuffle, which the salted co-partition +
    in-partition stable sort guarantees (all rows of a customer land in
    one partition; o_orderkey uniqueness makes the order total)."""
    ds = _pq(sf_dir, "orders",
             ["o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["o_custkey"].to_numpy(zero_copy_only=False) % _P) \
            .astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort")
        g = df.groupby("o_custkey", sort=True)
        out = g["o_orderstatus"].agg(",".join).rename("status_seq") \
            .to_frame()
        out["n_orders"] = g.size()
        out = out.reset_index().rename(columns={"o_custkey": "custkey"})
        return out[["custkey", "status_seq", "n_orders"]]

    out = (ds.map_batches(with_key, batch_format="pyarrow")
             .groupby("gkey").map_groups(agg, batch_format="pandas")
             .to_pandas())
    out["custkey"] = out["custkey"].astype(np.int64)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("custkey").reset_index(drop=True)


SQL_ORDER_STATUS_SEQ = """
SELECT o_custkey::BIGINT AS custkey,
       string_agg(o_orderstatus, ',' ORDER BY o_orderdate, o_orderkey)
         AS status_seq,
       COUNT(*)::BIGINT AS n_orders
FROM orders GROUP BY o_custkey ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# gaps and islands: per-user activity streaks
# ---------------------------------------------------------------------------

_DAY_US = 86_400 * 1_000_000


def q_activity_streaks(sf_dir: str):
    """Per-user day-level activity streaks (gaps-and-islands): distinct
    active days compress into maximal runs of consecutive days; report
    active_days, n_streaks, longest_streak. One user-co-partitioned pass:
    batch-local (user, day) dedup BEFORE the shuffle (combiner — the
    shuffle carries at most one row per user-day per batch), then a
    vectorized boundary scan per partition."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def days(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // _DAY_US)
        ud = np.unique(np.stack([u, d], axis=1), axis=0)
        return pa.table({"user_id": pa.array(ud[:, 0]),
                         "day": pa.array(ud[:, 1]),
                         "gkey": pa.array((ud[:, 0] % _P).astype(np.int32))})

    def streaks(df: pd.DataFrame) -> pd.DataFrame:
        ud = np.unique(np.stack([df["user_id"].to_numpy(),
                                 df["day"].to_numpy()], axis=1), axis=0)
        u, d = ud[:, 0], ud[:, 1]
        new = np.empty(len(u), dtype=bool)
        new[0] = True
        new[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(u)]
        lens = ends - starts
        su = u[starts]
        res = pd.DataFrame({"user_id": su, "len": lens})
        g = res.groupby("user_id", sort=True)["len"]
        out = pd.DataFrame({"active_days": g.sum(), "n_streaks": g.size(),
                            "longest_streak": g.max()}).reset_index()
        return out

    out = (ds.map_batches(days, batch_format="pyarrow")
             .groupby("gkey").map_groups(streaks, batch_format="pandas")
             .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


SQL_ACTIVITY_STREAKS = f"""
WITH d AS (SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day
           FROM events),
i AS (SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
      FROM d),
s AS (SELECT user_id, grp, COUNT(*)::BIGINT AS len FROM i GROUP BY 1, 2)
SELECT user_id::BIGINT AS user_id, SUM(len)::BIGINT AS active_days,
       COUNT(*)::BIGINT AS n_streaks, MAX(len)::BIGINT AS longest_streak
FROM s GROUP BY user_id ORDER BY user_id
"""


QUERIES14: dict[str, tuple] = {
    "percentile_cont_price": (q_percentile_cont_price, SQL_PERCENTILE_CONT),
    "order_status_seq": (q_order_status_seq, SQL_ORDER_STATUS_SEQ),
    "activity_streaks": (q_activity_streaks, SQL_ACTIVITY_STREAKS),
}
