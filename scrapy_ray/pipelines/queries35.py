"""Thirty-fifth oracle-query batch — time-weighted aggregation /
confidence-adjusted ranking / marketing attribution:

- twap_user_value: per-user TIME-weighted average value (the irregular-
  series integral — TWAP in finance): each event's value weighted by
  the whole minutes until the user's next event. All-integer
  numerators (cents × floor-minute gaps; per-user magnitudes ≤ ~1e10 —
  int64-safe at any scale since both factors are domain-bounded);
  users need ≥2 events and a positive total weight. One user-salted
  shuffle, vectorized shift inside partitions (the event_transitions
  precedent); the quotient finalizes identical-expression round6.
- wilson_topk_days: days ranked by the Wilson-score LOWER bound of
  their purchase share (the "sort by confidence, not by rate"
  primitive — same math that ranks app-store reviews). (day, n, k)
  cells ride a salted O(days) shuffle; the bound is one fixed float
  expression from exact ints, written textually identically in SQL,
  and the top-10 is ordered on the 1e12-quantized integer bound —
  floats never order the result.
- attribution_credit: multi-touch attribution over user journeys —
  each purchase closes the segment of non-purchase events since the
  user's previous purchase; first-touch / last-touch credits are
  integer counts, linear credit gives round(1e6/k) integer units per
  event of a k-event segment (per-row quantization, exact integer
  sums — the never-sum-floats rule). Segment ids come from an
  exclusive purchase-count cumsum ordered by the FULL (ts, event_id)
  key (the max_concurrent_sessions tie lesson). One user-salted
  shuffle; per-partition partials are O(event types).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_Q35_SALT = 64
_US_PER_MIN = 60_000_000
_US_PER_DAY = 86_400_000_000
_WIL_TOP = 10
_LIN_SCALE = 10**6


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# TWAP
# ---------------------------------------------------------------------------


def q_twap_user_value(sf_dir: str):
    """Per-user time-weighted average value (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "user_id", "event_id",
                                        "value"])

    def salt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(u),
                         "ts": t["ts"].cast(pa.int64()),
                         "eid": t["event_id"],
                         "c": _cents(t["value"]),
                         "sk": pa.array(u % _Q35_SALT)})

    def twap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts", "eid"], kind="mergesort") \
            .reset_index(drop=True)
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        nxt_ts = np.r_[ts[1:], 0]
        same = np.r_[u[1:] == u[:-1], False]
        gap_min = np.where(same, (nxt_ts - ts) // _US_PER_MIN, 0)
        g = pd.DataFrame({"u": u, "num": c * gap_min, "w": gap_min,
                          "n": np.int64(1)}) \
            .groupby("u", sort=False).sum().reset_index()
        g = g[(g["n"] >= 2) & (g["w"] > 0)]
        out = pd.DataFrame({
            "user_id": g["u"].to_numpy(np.int64),
            "n_events": g["n"].to_numpy(np.int64),
            "w_total": g["w"].to_numpy(np.int64),
            "twap6": _round6(g["num"].to_numpy(np.float64)
                             / g["w"].to_numpy(np.float64))})
        return out

    res = (ds.map_batches(salt, batch_format="pyarrow")
           .groupby("sk").map_groups(twap, batch_format="pandas")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    for c in ("user_id", "n_events", "w_total"):
        res[c] = res[c].astype(np.int64)
    return res


SQL_TWAP = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tsu, event_id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
g AS (
  SELECT user_id, c,
         coalesce((lead(tsu) OVER (PARTITION BY user_id
                                   ORDER BY tsu, event_id) - tsu)
                  // {_US_PER_MIN}, 0) AS gap_min
  FROM e),
a AS (
  SELECT user_id, count(*)::BIGINT AS n_events,
         sum(gap_min)::BIGINT AS w_total,
         sum(c * gap_min)::BIGINT AS num
  FROM g GROUP BY 1)
SELECT user_id, n_events, w_total,
       round(CAST(num AS DOUBLE) / CAST(w_total AS DOUBLE), 6) AS twap6
FROM a WHERE n_events >= 2 AND w_total > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Wilson lower-bound ranking
# ---------------------------------------------------------------------------


def q_wilson_topk_days(sf_dir: str):
    """Top-10 days by Wilson lower bound of purchase share (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        k = (np.asarray(t["event_type"].to_pylist()) == "purchase") \
            .astype(np.int64)
        df = pd.DataFrame({"day": day, "n": np.int64(1), "k": k})
        g = df.groupby("day", sort=False)[["n", "k"]].sum().reset_index()
        for c in ("n", "k"):
            g[c] = g[c].astype(np.int64)
        g["sk"] = (g["day"] % _Q35_SALT).astype(np.int64)
        return _strip(g)

    def csum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", sort=False)[["n", "k"]].sum().reset_index()
        for c in ("n", "k"):
            g[c] = g[c].astype(np.int64)
        return g

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby("sk").map_groups(csum, batch_format="pandas")
               .to_pandas())
    n = cells["n"].to_numpy(np.float64)
    k = cells["k"].to_numpy(np.float64)
    p = k / n
    z2 = 1.96 * 1.96
    lb = (p + z2 / (2.0 * n)
          - 1.96 * np.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)) \
        / (1.0 + z2 / n)
    lbq = (np.sign(lb) * np.floor(np.abs(lb) * 1e12 + 0.5)).astype(np.int64)
    out = pd.DataFrame({"day": cells["day"].to_numpy(np.int64),
                        "n": cells["n"].to_numpy(np.int64),
                        "k": cells["k"].to_numpy(np.int64),
                        "lbq": lbq, "wilson_lb6": _round6(lb)})
    out = out.sort_values(["lbq", "day"], ascending=[False, True],
                          kind="mergesort").head(_WIL_TOP) \
        .drop(columns=["lbq"]).reset_index(drop=True)
    return out


SQL_WILSON = f"""
WITH c AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         count(*)::BIGINT AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
           AS k
  FROM events GROUP BY 1),
w AS (
  SELECT day, n, k,
         (CAST(k AS DOUBLE)/n + (1.96*1.96)/(2.0*n)
          - 1.96 * sqrt(((CAST(k AS DOUBLE)/n)*(1.0 - CAST(k AS DOUBLE)/n)
                          + (1.96*1.96)/(4.0*n)) / n))
           / (1.0 + (1.96*1.96)/n) AS lb
  FROM c)
SELECT day, n, k, round(lb, 6) AS wilson_lb6
FROM w
ORDER BY CAST(round(lb * 1e12) AS BIGINT) DESC, day
LIMIT {_WIL_TOP}
"""


# ---------------------------------------------------------------------------
# multi-touch attribution
# ---------------------------------------------------------------------------


def q_attribution_credit(sf_dir: str):
    """First/last/linear-touch credit per event type (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "user_id", "event_id",
                                        "event_type"])

    def salt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(u),
                         "ts": t["ts"].cast(pa.int64()),
                         "eid": t["event_id"],
                         "et": t["event_type"],
                         "sk": pa.array(u % _Q35_SALT)})

    def credit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts", "eid"], kind="mergesort") \
            .reset_index(drop=True)
        pf = (df["et"] == "purchase").astype(np.int64)
        cp = pf.groupby(df["u"]).cumsum()
        seg = (cp - pf).to_numpy(np.int64)
        npu = pf.groupby(df["u"]).transform("sum").to_numpy(np.int64)
        keep = (pf.to_numpy(np.int64) == 0) & (seg < npu)
        d = pd.DataFrame({"u": df["u"].to_numpy(np.int64)[keep],
                          "s": seg[keep],
                          "et": df["et"].to_numpy()[keep]})
        grp = d.groupby(["u", "s"], sort=False)
        rn = grp.cumcount().to_numpy() + 1
        kk = grp["et"].transform("size").to_numpy(np.int64)
        units = np.floor(_LIN_SCALE / kk + 0.5).astype(np.int64)
        agg = pd.DataFrame({"event_type": d["et"],
                            "first_touch": (rn == 1).astype(np.int64),
                            "last_touch": (rn == kk).astype(np.int64),
                            "linear_units": units}) \
            .groupby("event_type", sort=False).sum().reset_index()
        for c in ("first_touch", "last_touch", "linear_units"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    parts = (ds.map_batches(salt, batch_format="pyarrow")
             .groupby("sk").map_groups(credit, batch_format="pandas")
             .to_pandas())
    out = parts.groupby("event_type", sort=True).sum().reset_index()
    for c in ("first_touch", "last_touch", "linear_units"):
        out[c] = out[c].astype(np.int64)
    out["linear6"] = _round6(out["linear_units"].to_numpy(np.float64)
                             / float(_LIN_SCALE))
    return out


SQL_ATTR = f"""
WITH e AS (
  SELECT user_id AS u, event_type AS et, epoch_us(ts) AS tsu, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pf
  FROM events),
w AS (
  SELECT u, et, tsu, event_id, pf,
         CAST(sum(pf) OVER (PARTITION BY u ORDER BY tsu, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - pf
              AS BIGINT) AS s,
         CAST(sum(pf) OVER (PARTITION BY u) AS BIGINT) AS np
  FROM e),
closed AS (SELECT u, et, tsu, event_id, s FROM w
           WHERE pf = 0 AND s < np),
r AS (
  SELECT u, s, et,
         row_number() OVER (PARTITION BY u, s
                            ORDER BY tsu, event_id) AS rn,
         count(*) OVER (PARTITION BY u, s) AS kk
  FROM closed)
SELECT et AS event_type,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS first_touch,
       sum(CASE WHEN rn = kk THEN 1 ELSE 0 END)::BIGINT AS last_touch,
       sum(CAST(round({_LIN_SCALE}.0 / kk) AS BIGINT))::BIGINT
         AS linear_units,
       round(CAST(sum(CAST(round({_LIN_SCALE}.0 / kk) AS BIGINT))
                  AS DOUBLE) / {_LIN_SCALE}.0, 6) AS linear6
FROM r GROUP BY 1 ORDER BY 1
"""


QUERIES35: dict[str, tuple] = {
    "twap_user_value": (q_twap_user_value, SQL_TWAP),
    "wilson_topk_days": (q_wilson_topk_days, SQL_WILSON),
    "attribution_credit": (q_attribution_credit, SQL_ATTR),
}
