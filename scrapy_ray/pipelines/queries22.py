"""Twenty-second oracle-query batch — three analytic shapes not yet covered:

- ohlc_hourly: OHLC bars per (event_type, hour) — the arg-min/arg-max-by-
  ordered-key aggregate family (open = value of FIRST event by (ts,
  event_id), close = LAST, plus hi/lo/count/volume) computed in ONE pass:
  per-batch cell partials carry (first-key, first-value) / (last-key,
  last-value) witnesses, a salted groupby re-reduces the witnesses
  vectorized. No window function, no global sort; the shuffle is
  O(types × hours × blocks) witness cells.
- rolling_median_value: per-user 5-row rolling median of the value column
  (ROWS 4 PRECEDING) — the HOLISTIC window aggregate (median cannot be
  composed from sum/count partials). User-co-partitioned salted pass; the
  sliding windows are evaluated fully vectorized via a NaN-padded
  sliding_window_view + nanmedian (4 NaN pads between users make window
  boundaries user-local for free). Exactness: values are quantized to
  cents first, so 2×median is an exact integer (odd window → element,
  even window → sum of the two middles) — compared as `med_c2` BIGINT.
- assoc_rules_events: market-basket association rules over user baskets
  of event types — support / confidence / lift for every ordered type
  pair (Agrawal-style rule mining, the co-occurrence analytics shape).
  ONE user-co-partitioned pass: in-batch distinct (user, type) combiner,
  per-partition self-merge bounded by O(T² per user), pair cells + type
  marginals + the user total ride the same output as sentinel rows
  (the dsir_importance trick); the driver folds O(T²) cells.

Float finalization (conf6/lift6) uses identical expressions + round6
half-away both sides; everything else is exact int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from numpy.lib.stride_tricks import sliding_window_view

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_PARTS = 64          # salted co-partition count (CLAUDE.md salted rule)
_RM_WIN = 5          # rolling-median window (current row + 4 preceding)


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# OHLC hourly bars (arg-min/arg-max by ordered key, one pass)
# ---------------------------------------------------------------------------


def q_ohlc_hourly(sf_dir: str):
    """OHLC bars per (event_type, hour). Per-batch partial: sort the batch
    once by (ts, event_id), take first/last per cell as (key, value)
    witnesses plus min/max/count/sum; final reduce re-sorts the tiny
    witness cells per salted partition and keeps the global first/last —
    associative, so block boundaries never matter."""
    ds = _pq(sf_dir, "events", columns=["event_id", "ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pylist(),
            "hour": pc.floor_temporal(t["ts"], unit="hour").to_pandas(),
            "ts_us": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            "eid": t["event_id"].to_numpy(zero_copy_only=False),
            "c": _cents(t["value"]).to_numpy(zero_copy_only=False),
        })
        df = df.sort_values(["ts_us", "eid"], kind="mergesort")
        g = df.groupby(["event_type", "hour"], sort=False)
        out = g.agg(open_ts=("ts_us", "first"), open_eid=("eid", "first"),
                    open_c=("c", "first"),
                    close_ts=("ts_us", "last"), close_eid=("eid", "last"),
                    close_c=("c", "last"),
                    hi_c=("c", "max"), lo_c=("c", "min"),
                    n=("c", "size"), vol_c=("c", "sum")).reset_index()
        out["gkey"] = ((out["hour"].astype(np.int64) // 3_600_000_000)
                       % _PARTS).astype(np.int32)
        return _strip(out)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        keys = ["event_type", "hour"]
        a = df.sort_values(keys + ["open_ts", "open_eid"], kind="mergesort")
        first = ~a.duplicated(keys, keep="first")
        opens = a.loc[first, keys + ["open_c"]]
        b = df.sort_values(keys + ["close_ts", "close_eid"], kind="mergesort")
        last = ~b.duplicated(keys, keep="last")
        closes = b.loc[last, keys + ["close_c"]]
        aggs = (df.groupby(keys, sort=False)
                  .agg(hi_c=("hi_c", "max"), lo_c=("lo_c", "min"),
                       n=("n", "sum"), vol_c=("vol_c", "sum")).reset_index())
        out = aggs.merge(opens, on=keys).merge(closes, on=keys)
        return out[["event_type", "hour", "open_c", "hi_c", "lo_c",
                    "close_c", "n", "vol_c"]]

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("gkey").map_groups(final, batch_format="pandas")
             .to_pandas())
    for c in ("open_c", "hi_c", "lo_c", "close_c", "n", "vol_c"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


SQL_OHLC = """
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
w AS (
  SELECT event_type, hour, c,
         row_number() OVER (PARTITION BY event_type, hour
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, hour
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e)
SELECT event_type, hour,
       max(CASE WHEN rn_a = 1 THEN c END)::BIGINT AS open_c,
       max(c)::BIGINT AS hi_c, min(c)::BIGINT AS lo_c,
       max(CASE WHEN rn_d = 1 THEN c END)::BIGINT AS close_c,
       count(*)::BIGINT AS n, sum(c)::BIGINT AS vol_c
FROM w GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# per-user rolling median (holistic window aggregate)
# ---------------------------------------------------------------------------


def q_rolling_median_value(sf_dir: str):
    """Per-user rolling median of the last 5 event values (ROWS 4
    PRECEDING), order (ts, event_id). Holistic — no sum/count partial
    exists — so the pass is user-co-partitioned (salted); inside a
    partition every user's window stack is evaluated in ONE vectorized
    nanmedian over a NaN-padded sliding_window_view. Output `med_c2` =
    2 × median in cents (exact integer for both odd and even windows)."""
    ds = _pq(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "ts_us": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "c": _cents(t["value"]).to_numpy(zero_copy_only=False),
        })
        df["gkey"] = (df["user_id"] % _PARTS).astype(np.int32)
        return _strip(df)

    pad = _RM_WIN - 1

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        c = df["c"].to_numpy().astype(np.float64)
        n = len(df)
        starts = np.r_[True, u[1:] != u[:-1]]
        # padded layout: `pad` NaNs before every user's run — a window
        # ending at row i then never reaches a previous user's values
        pos = np.arange(n) + pad * np.cumsum(starts)
        padded = np.full(int(pos[-1]) + 1 if n else 0, np.nan)
        padded[pos] = c
        med = np.nanmedian(sliding_window_view(padded, _RM_WIN),
                           axis=1)[pos - pad]
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "user_id": u,
            "med_c2": np.rint(med * 2.0).astype(np.int64)})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("gkey").map_groups(roll, batch_format="pandas")
             .to_pandas())
    for c in ("event_id", "user_id", "med_c2"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_ROLLMED = f"""
SELECT event_id, user_id,
       CAST(round(median(CAST(round(value * 100) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN {_RM_WIN - 1} PRECEDING AND CURRENT ROW) * 2)
            AS BIGINT) AS med_c2
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# association rules over user event-type baskets
# ---------------------------------------------------------------------------


def q_assoc_rules_events(sf_dir: str):
    """Association rules on user baskets: for every ordered event-type
    pair (ante -> cons), supp = #users with both, conf = supp/n_ante,
    lift = conf/(n_cons/n_users). One user-co-partitioned pass: in-batch
    distinct (user, type) combiner; per partition a self-merge emits pair
    cells (bounded by types² per user) while type marginals and the user
    total ride along as sentinel rows; the driver folds the O(types²)
    cell table."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pylist(),
        }).drop_duplicates()
        df["gkey"] = (df["user_id"] % _PARTS).astype(np.int32)
        return _strip(df)

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        ut = df[["user_id", "event_type"]].drop_duplicates()
        p = ut.merge(ut, on="user_id", suffixes=("_a", "_b"))
        p = p[p["event_type_a"] != p["event_type_b"]]
        pairs = (p.groupby(["event_type_a", "event_type_b"], sort=False)
                  .size().reset_index(name="cnt")
                  .rename(columns={"event_type_a": "ante",
                                   "event_type_b": "cons"}))
        marg = (ut.groupby("event_type", sort=False)["user_id"]
                  .nunique().reset_index(name="cnt")
                  .rename(columns={"event_type": "ante"}))
        marg["cons"] = ""          # sentinel: per-type user count
        total = pd.DataFrame({"ante": [""], "cons": [""],
                              "cnt": [ut["user_id"].nunique()]})
        out = pd.concat([pairs, marg[["ante", "cons", "cnt"]], total],
                        ignore_index=True)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    raw = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("gkey").map_groups(cells, batch_format="pandas")
             .to_pandas())
    folded = (raw.groupby(["ante", "cons"], sort=False)["cnt"]
                 .sum().reset_index())
    nu = int(folded.loc[(folded["ante"] == "") & (folded["cons"] == ""),
                        "cnt"].iloc[0])
    marg = folded[(folded["cons"] == "") & (folded["ante"] != "")] \
        .set_index("ante")["cnt"]
    pairs = folded[(folded["ante"] != "") & (folded["cons"] != "")].copy()
    supp = pairs["cnt"].to_numpy().astype(np.int64)
    n_ante = marg.reindex(pairs["ante"]).to_numpy().astype(np.int64)
    n_cons = marg.reindex(pairs["cons"]).to_numpy().astype(np.int64)
    conf = supp.astype(np.float64) / n_ante
    lift = conf / (n_cons.astype(np.float64) / nu)
    out = pd.DataFrame({"ante": pairs["ante"].to_numpy(),
                        "cons": pairs["cons"].to_numpy(),
                        "supp": supp, "n_ante": n_ante, "n_cons": n_cons,
                        "conf6": _round6(conf), "lift6": _round6(lift)})
    return out.sort_values(["ante", "cons"]).reset_index(drop=True)


SQL_ASSOC = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT count(DISTINCT user_id) AS nu FROM events),
m AS (SELECT event_type, count(*)::BIGINT AS cnt FROM ut GROUP BY 1),
p AS (
  SELECT a.event_type AS ante, b.event_type AS cons, count(*)::BIGINT AS supp
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type <> b.event_type
  GROUP BY 1, 2)
SELECT ante, cons, supp, ma.cnt AS n_ante, mb.cnt AS n_cons,
       round(supp::DOUBLE / ma.cnt, 6) AS conf6,
       round((supp::DOUBLE / ma.cnt) / (mb.cnt::DOUBLE / nu), 6) AS lift6
FROM p JOIN m ma ON p.ante = ma.event_type
       JOIN m mb ON p.cons = mb.event_type
       CROSS JOIN n
ORDER BY ante, cons
"""


QUERIES22: dict[str, tuple] = {
    "ohlc_hourly": (q_ohlc_hourly, SQL_OHLC),
    "rolling_median_value": (q_rolling_median_value, SQL_ROLLMED),
    "assoc_rules_events": (q_assoc_rules_events, SQL_ASSOC),
}
