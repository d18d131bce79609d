"""Tenth oracle-query batch —

- GROUP BY CUBE over (status, priority): the ROLLUP pattern completed to
  all 2^k margins; ONE distributed fine-granularity groupby, every coarser
  level re-aggregated driver-side from the tiny cell table;
- grouped median absolute deviation (robust statistics): median AND MAD
  per group from ONE distributed value histogram — the MAD histogram is
  the median-centered FOLD of the value histogram, so the second quantile
  pass needs no second scan of the fact table;
- per-user latest-N events (recent-history feature extraction): mergeable
  row-level top-N — each batch pre-prunes to its own per-user newest N, so
  the shuffle carries O(N x users-per-batch) rows, never the event log.

All DuckDB-oracle-checked on the same parquet inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq

_P = 64


# ---------------------------------------------------------------------------
# GROUP BY CUBE
# ---------------------------------------------------------------------------


def q_revenue_cube(sf_dir: str):
    """CUBE(status, priority): cell + per-status + per-priority + grand
    total, 'ALL' as the rolled-up sentinel (same conventions as
    q_revenue_rollup, which covers the ROLLUP subset of margins). Scale
    shape: one distributed groupby at the finest granularity; all 2^k - 1
    coarser margins re-aggregate driver-side from the O(cells) table."""
    ds = _pq(sf_dir, "orders",
             ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "o_orderpriority": t["o_orderpriority"],
            "pc": _cents(t["o_totalprice"]),
        }).to_pandas()
        g = (df.groupby(["o_orderstatus", "o_orderpriority"])
               .agg(n_orders=("pc", "size"), sum_price_cents=("pc", "sum"))
               .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["o_orderstatus", "o_orderpriority"])
              .aggregate(Sum("n_orders", alias_name="n_orders"),
                         Sum("sum_price_cents", alias_name="sum_price_cents")))
    df = fine.to_pandas()   # tiny: one row per (status, priority) cell

    margins = [df]
    for keep, drop in (("o_orderstatus", "o_orderpriority"),
                       ("o_orderpriority", "o_orderstatus")):
        m = df.groupby(keep, as_index=False)[["n_orders", "sum_price_cents"]].sum()
        m[drop] = "ALL"
        margins.append(m)
    margins.append(pd.DataFrame({
        "o_orderstatus": ["ALL"], "o_orderpriority": ["ALL"],
        "n_orders": [df["n_orders"].sum()],
        "sum_price_cents": [df["sum_price_cents"].sum()]}))
    out = pd.concat(margins, ignore_index=True)
    for c in ("n_orders", "sum_price_cents"):
        out[c] = out[c].astype(np.int64)
    return (out[["o_orderstatus", "o_orderpriority", "n_orders",
                 "sum_price_cents"]]
            .sort_values(["o_orderstatus", "o_orderpriority"])
            .reset_index(drop=True))


SQL_REVENUE_CUBE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COUNT(*)::BIGINT AS n_orders,
       SUM(CAST(round(o_totalprice*100) AS BIGINT))::BIGINT AS sum_price_cents
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


# ---------------------------------------------------------------------------
# grouped median absolute deviation (one histogram, folded)
# ---------------------------------------------------------------------------


def _rank_disc(vals: np.ndarray, cnts: np.ndarray, q: float) -> int:
    """quantile_disc semantics on a (sorted values, counts) histogram:
    the element at 1-based rank ceil(q * n)."""
    n = int(cnts.sum())
    r = int(np.ceil(q * n))
    return int(vals[np.searchsorted(np.cumsum(cnts), r)])


def q_mad_order_value(sf_dir: str):
    """Median + median-absolute-deviation of order value per status, from
    ONE distributed histogram: per-batch (status, cents) partial counts ->
    one tiny groupby -> the driver takes the discrete median per group,
    then FOLDS the same histogram around it (|c - med| merges mirror-image
    cells) and takes the discrete median of the fold — MAD without a
    second pass over the fact table, exact integers end to end. The cell
    count is bounded by the value domain (the value_quantiles bound), so
    driver work is O(distinct cents), never O(rows)."""
    ds = _pq(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"s": t["o_orderstatus"],
                       "c": _cents(t["o_totalprice"])}).to_pandas()
        g = df.groupby(["s", "c"]).size().rename("cnt").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["s", "c"]).aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values(["s", "c"]))

    rows = []
    for s, g in hist.groupby("s", sort=True):
        vals = g["c"].to_numpy(dtype=np.int64)
        cnts = g["cnt"].to_numpy(dtype=np.int64)
        med = _rank_disc(vals, cnts, 0.5)
        folded = pd.DataFrame({"d": np.abs(vals - med), "cnt": cnts}) \
            .groupby("d")["cnt"].sum().reset_index().sort_values("d")
        mad = _rank_disc(folded["d"].to_numpy(dtype=np.int64),
                         folded["cnt"].to_numpy(dtype=np.int64), 0.5)
        rows.append({"o_orderstatus": s, "n_orders": int(cnts.sum()),
                     "median_cents": med, "mad_cents": mad})
    out = pd.DataFrame(rows)
    for c in ("n_orders", "median_cents", "mad_cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


SQL_MAD = """
WITH x AS (
  SELECT o_orderstatus AS s,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
m AS (SELECT s, quantile_disc(c, 0.5) AS med FROM x GROUP BY 1)
SELECT x.s AS o_orderstatus,
       COUNT(*)::BIGINT AS n_orders,
       ANY_VALUE(m.med)::BIGINT AS median_cents,
       quantile_disc(abs(x.c - m.med), 0.5)::BIGINT AS mad_cents
FROM x JOIN m USING (s)
GROUP BY x.s
ORDER BY x.s
"""


# ---------------------------------------------------------------------------
# per-user latest-N events (mergeable row-level top-N)
# ---------------------------------------------------------------------------

_LATEST_N = 3


def q_latest_events_per_user(sf_dir: str):
    """Each user's newest 3 events by (ts, event_id) — the recent-history
    feature-extraction primitive. Mergeable top-N at the ROW level: every
    batch prunes to its own per-user newest 3 BEFORE the shuffle (top-N of
    a union = top-N of per-part top-Ns), so the user-keyed exchange carries
    at most 3 x (users in batch) rows; the partition pass re-sorts the
    surviving few and assigns rn. Oracle = ROW_NUMBER window."""
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts"])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            ascending=[True, False, False], kind="mergesort")
        df = df.groupby("user_id", sort=False).head(_LATEST_N)
        df["gkey"] = (df["user_id"].to_numpy() % _P).astype(np.int32)
        return df

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            ascending=[True, False, False], kind="mergesort")
        df = df.groupby("user_id", sort=False).head(_LATEST_N).copy()
        df["rn"] = df.groupby("user_id", sort=False).cumcount() + 1
        return df[["user_id", "rn", "event_id", "ts"]]

    out = (ds.map_batches(prune, batch_format="pandas")
             .groupby("gkey").map_groups(finalize, batch_format="pandas")
             .to_pandas())
    for c in ("user_id", "rn", "event_id"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["user_id", "rn"]).reset_index(drop=True)


SQL_LATEST_EVENTS = f"""
WITH r AS (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, CAST(rn AS BIGINT) AS rn, event_id, ts
FROM r WHERE rn <= {_LATEST_N}
ORDER BY user_id, rn
"""


QUERIES10: dict[str, tuple] = {
    "revenue_cube": (q_revenue_cube, SQL_REVENUE_CUBE),
    "mad_order_value": (q_mad_order_value, SQL_MAD),
    "latest_events_per_user": (q_latest_events_per_user, SQL_LATEST_EVENTS),
}
