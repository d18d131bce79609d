"""Fifteenth oracle-query batch (round 4) — two more shapes:

- DENSE_RANK-with-ties top-k: every order whose total price is among the
  top-3 DISTINCT prices of its priority class. The scale shape is NOT a
  window shuffle: a per-batch top-3-distinct partial merges to a <=15-row
  threshold table (5 priorities x 3 prices), which rides back into a
  second filtered scan as a plain Python broadcast — the fact table is
  never shuffled at all (contrast q_top_orders_per_segment, the
  ROW_NUMBER variant, which co-partitions facts). Ties then fall out for
  free: any row matching one of the kept distinct prices is in;
- inter-event gap quantiles: per event_type, the median and p90 of the
  gaps (whole seconds) between a user's consecutive events of that type.
  A windowed LAG feeding a grouped quantile — computed as user-salted
  co-partitioned vectorized diffs emitting (type, gap_s, cnt) CELLS,
  then the queries5 histogram-walk to the DuckDB quantile_disc rank
  (1-based ceil(q*n)). The cell table is bounded by the distinct
  whole-second gap DOMAIN (time range), not by row count. The gap
  multiset of a sorted timestamp multiset is tie-order independent, so
  the contract is deterministic without an event_id tie rule.

Both DuckDB-oracle-checked on the same parquet inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents_np, _pq

_P = 64


# ---------------------------------------------------------------------------
# dense_rank <= 3 with ties, zero fact shuffle
# ---------------------------------------------------------------------------

_DR_K = 3


def q_dense_rank_top_prices(sf_dir: str):
    """Orders carrying one of the top-3 DISTINCT total prices of their
    priority class (DENSE_RANK() <= 3 — ties all kept). Phase 1: per-batch
    (priority, top-3 distinct price) partials -> groupby(priority) merge
    (<=15 rows ever shuffled). Phase 2: second pruned scan filters against
    the broadcast threshold map and labels each survivor with its dense
    rank by position in the kept distinct-price list."""
    cols = ["o_orderpriority", "o_orderkey", "o_totalprice"]
    ds = _pq(sf_dir, "orders", cols)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "priority": t["o_orderpriority"].to_pandas(),
            "pc": _cents_np(t["o_totalprice"].to_numpy(zero_copy_only=False)),
        })
        g = (df.drop_duplicates().sort_values("pc", ascending=False)
               .groupby("priority", sort=False).head(_DR_K))
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        top = np.sort(np.unique(df["pc"].to_numpy()))[::-1][:_DR_K]
        return pd.DataFrame({"priority": df["priority"].iloc[0],
                             "pc": top, "drank": np.arange(1, len(top) + 1)})

    thr = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("priority").map_groups(merge, batch_format="pandas")
             .to_pandas())
    # broadcast side: {priority: (sorted-desc prices, ranks)} — <=15 rows
    cut: dict[str, dict[int, int]] = {}
    for pri, sub in thr.groupby("priority"):
        cut[pri] = dict(zip(sub["pc"].astype(np.int64), sub["drank"]))

    def pick(t: pa.Table) -> pa.Table:
        pri = t["o_orderpriority"].to_pandas().to_numpy()
        pc_ = _cents_np(t["o_totalprice"].to_numpy(zero_copy_only=False))
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        drank = np.zeros(len(pc_), dtype=np.int64)
        for p, mp in cut.items():               # <=5 priorities x <=3 prices:
            pm = pri == p                       # a dozen vectorized compares,
            for c, r in mp.items():             # no per-row Python loop
                drank[pm & (pc_ == c)] = r
        keep = drank > 0
        return pa.table({"priority": pa.array(pri[keep]),
                         "orderkey": pa.array(key[keep].astype(np.int64)),
                         "price_cents": pa.array(pc_[keep]),
                         "drank": pa.array(drank[keep])})

    df = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    for c in ("orderkey", "price_cents", "drank"):
        df[c] = df[c].astype(np.int64)
    return (df.sort_values(["priority", "drank", "orderkey"])
              .reset_index(drop=True))


SQL_DENSE_RANK_TOP = """
WITH r AS (
  SELECT o_orderpriority AS priority, o_orderkey AS orderkey,
         CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
         DENSE_RANK() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC) AS drank
  FROM orders)
SELECT priority, orderkey, price_cents, drank::BIGINT AS drank
FROM r WHERE drank <= 3 ORDER BY priority, drank, orderkey
"""


# ---------------------------------------------------------------------------
# inter-event gap quantiles per event_type
# ---------------------------------------------------------------------------

_GAP_QS = (0.5, 0.9)


def q_inter_event_gap_stats(sf_dir: str):
    """Per event_type: count, median and p90 (DuckDB quantile_disc) of the
    whole-second gaps between a user's consecutive events of that type.
    User-salted co-partition -> vectorized boundary diff -> (event_type,
    gap_s) cell counts -> per-type cumulative-histogram walk. The per-row
    `pick` of quantile_disc is rank ceil(q*n), 1-based."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type", "ts"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % _P) \
            .astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts"],
                            kind="mergesort")
        u = df["user_id"].to_numpy()
        ty = df["event_type"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[1:] = (u[1:] == u[:-1]) & (ty[1:] == ty[:-1])
        gap_s = np.zeros(len(df), dtype=np.int64)
        gap_s[1:] = (ts[1:] - ts[:-1]) // 1_000_000
        out = pd.DataFrame({"event_type": ty[same], "gap_s": gap_s[same]})
        cells = (out.groupby(["event_type", "gap_s"]).size().rename("cnt")
                    .reset_index())
        # hand ARROW blocks to the downstream (type, gap_s) aggregate —
        # pandas blocks push the two-key groupby onto its slow path
        # (measured 21 s -> ~2 s at sf0.1; CLAUDE.md pandas-block rule)
        return pa.Table.from_pandas(cells, preserve_index=False) \
                       .replace_schema_metadata(None)

    cells = (ds.map_batches(with_key, batch_format="pyarrow")
               .groupby("gkey").map_groups(gaps, batch_format="pandas"))

    def walk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("gap_s", kind="mergesort")
        vals = df["gap_s"].to_numpy()
        cum = df["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        row = {"event_type": df["event_type"].iloc[0], "n_gaps": n}
        for q, name in zip(_GAP_QS, ("p50_s", "p90_s")):
            rank = int(np.ceil(q * n))          # 1-based quantile_disc rule
            row[name] = int(vals[int(np.searchsorted(cum, rank))])
        return pd.DataFrame([row])

    out = (cells.groupby(["event_type", "gap_s"])
                .aggregate(Sum("cnt", alias_name="cnt"))
                .groupby("event_type").map_groups(walk, batch_format="pandas")
                .to_pandas())
    for c in ("n_gaps", "p50_s", "p90_s"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_INTER_EVENT_GAPS = """
WITH o AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts) AS gap_us
  FROM events),
g AS (SELECT event_type, gap_us // 1000000 AS gap_s
      FROM o WHERE gap_us IS NOT NULL)
SELECT event_type, COUNT(*)::BIGINT AS n_gaps,
       quantile_disc(gap_s, 0.5)::BIGINT AS p50_s,
       quantile_disc(gap_s, 0.9)::BIGINT AS p90_s
FROM g GROUP BY event_type ORDER BY event_type
"""


QUERIES15: dict[str, tuple] = {
    "dense_rank_top_prices": (q_dense_rank_top_prices, SQL_DENSE_RANK_TOP),
    "inter_event_gap_stats": (q_inter_event_gap_stats, SQL_INTER_EVENT_GAPS),
}
