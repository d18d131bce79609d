"""Twenty-sixth oracle-query batch — survival / marketing / forecasting:

- survival_km_purchase_gaps: Kaplan–Meier survival over the inter-purchase
  gap durations with RIGHT-CENSORING (each user's open interval from the
  last purchase to the corpus horizon enters the risk set but never the
  event count) — the classic survival-analysis estimator. Exact integer
  machinery end-to-end: gap histograms give d_i and the at-risk counts by
  rank decomposition (no correlated subqueries, no global sort); the
  product Π(1 − d_i/n_i) is carried as an exact int64 CUMSUM of per-step
  ln-factors quantized to 1e-12 units (identical expression both sides) —
  the float-product-order hazard is gone by construction.
- rfm_segments: RFM (recency / frequency / monetary) quintile
  segmentation. Per-user triples in one user-co-partitioned pass;
  quintile thresholds are quantile_disc rank selections from mergeable
  value histograms (ties share a score — deterministic, no NTILE tie
  machinery needed); scores assigned in a stateless broadcast comparison;
  output = per-segment user counts + exact monetary sums.
- holt_linear_daily: Holt double-exponential smoothing (level + trend,
  α = β = 0.5) over each type's dense daily count series, plus the 7-day-
  ahead forecast. The float recurrence is replayed step-for-step by a
  recursive-CTE oracle with the textually identical expressions (the
  ewma_user_value precedent) — bit-equal before round6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries24 import _daily_cells

_PARTS = 64
_KM_SCALE = 1_000_000_000_000
_KM_FLOOR = -(10 ** 15)           # stands in for ln(0): exp -> exactly 0.0


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# Kaplan–Meier over inter-purchase gaps (right-censored)
# ---------------------------------------------------------------------------


def _gap_hist(sf_dir: str) -> pd.DataFrame:
    """Right-censored inter-purchase gap histogram: (gap_s, d, cnt) rows
    sorted by gap — the shared base of the KM / Nelson-Aalen / Greenwood
    / RMST family. Complete durations = consecutive-purchase diffs in
    (ts, event_id) order; censored = last purchase → global max event
    ts. One user-co-partitioned pass."""
    from scrapy_ray.pipelines.queries import _ts_minmax_us

    ds = _pq(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "event_type"])

    # global horizon for censoring — parquet footer stats, no Dataset pass
    mx_us = _ts_minmax_us(sf_dir, "events")[1]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            "eid": t["event_id"].to_numpy(zero_copy_only=False),
            "et": t["event_type"].to_pylist()})
        df = df[df["et"] == "purchase"].drop(columns="et")
        df["gkey"] = (df["user_id"] % _PARTS).astype(np.int32)
        return _strip(df)

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "eid"], kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        same = np.r_[u[1:] == u[:-1], False]
        comp = (ts[1:][same[:-1]] - ts[:-1][same[:-1]]) // 1_000_000
        last = np.r_[u[1:] != u[:-1], True]
        cens = (mx_us - ts[last]) // 1_000_000
        out = pd.DataFrame({
            "gap": np.concatenate([comp, cens]).astype(np.int64),
            "d": np.concatenate([np.ones(len(comp), np.int64),
                                 np.zeros(len(cens), np.int64)]),
            "cnt": np.ones(len(comp) + len(cens), np.int64)})
        g = out.groupby("gap", sort=False).agg(
            d=("d", "sum"), cnt=("cnt", "sum")).reset_index()
        return g

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("gkey").map_groups(gaps, batch_format="pandas")
              .to_pandas()
              .groupby("gap").sum().reset_index().sort_values("gap"))


def q_survival_km_purchase_gaps(sf_dir: str):
    """KM estimator over per-user inter-purchase gaps (seconds): d_i and
    the at-risk n_i (= #durations ≥ t_i) come from one cumsum over the
    merged _gap_hist histogram. surv6 = exp of the exact int64
    cumulative of quantized ln(1 − d/n) steps."""
    hist = _gap_hist(sf_dir)
    cnt = hist["cnt"].to_numpy().astype(np.int64)
    d = hist["d"].to_numpy().astype(np.int64)
    total = int(cnt.sum())
    below = np.concatenate([[0], np.cumsum(cnt[:-1])])
    n_risk = total - below
    ev = d > 0                       # KM steps only at event (complete) times
    t_s, d_i, n_i = hist["gap"].to_numpy()[ev], d[ev], n_risk[ev]
    frac = 1.0 - d_i.astype(np.float64) / n_i.astype(np.float64)
    with np.errstate(divide="ignore"):
        lx = np.log(frac) * _KM_SCALE
    units = np.where(d_i == n_i, float(_KM_FLOOR),
                     np.where(lx >= 0, np.floor(lx + 0.5),
                              np.ceil(lx - 0.5))).astype(np.int64)
    surv6 = _round6(np.exp(np.cumsum(units) / float(_KM_SCALE)))
    return pd.DataFrame({"t_s": t_s.astype(np.int64),
                         "d": d_i.astype(np.int64),
                         "n_risk": n_i.astype(np.int64),
                         "surv6": surv6})


SQL_KM = f"""
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
mx AS (SELECT max(ts) AS m FROM events),
g AS (
  SELECT user_id, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM p),
allg AS (
  SELECT (epoch_us(nxt) - epoch_us(ts)) // 1000000 AS gap, 1::BIGINT AS d
  FROM g WHERE nxt IS NOT NULL
  UNION ALL
  SELECT (epoch_us((SELECT m FROM mx)) - epoch_us(max(ts))) // 1000000,
         0::BIGINT
  FROM p GROUP BY user_id),
h AS (SELECT gap, sum(d)::BIGINT AS d, count(*)::BIGINT AS cnt
      FROM allg GROUP BY 1),
r AS (
  SELECT gap, d, cnt,
         (SELECT sum(cnt) FROM h)
           - (sum(cnt) OVER (ORDER BY gap) - cnt) AS n_risk
  FROM h),
u AS (
  SELECT gap AS t_s, d, n_risk::BIGINT AS n_risk,
         CASE WHEN d = n_risk THEN {_KM_FLOOR}
              ELSE CAST(round(ln(1.0 - d::DOUBLE / n_risk) * {_KM_SCALE})
                        AS BIGINT) END AS units
  FROM r WHERE d > 0)
SELECT t_s, d, n_risk,
       round(exp(sum(units) OVER (ORDER BY t_s) / {_KM_SCALE}.0), 6) AS surv6
FROM u ORDER BY t_s
"""


# ---------------------------------------------------------------------------
# RFM quintile segmentation
# ---------------------------------------------------------------------------


def q_rfm_segments(sf_dir: str):
    """RFM segmentation: per-user recency (days since last event, vs the
    corpus horizon), frequency (event count) and monetary (exact cents
    sum) in one user-co-partitioned pass; each measure scored 1–5 against
    its quantile_disc(0.2/0.4/0.6/0.8) thresholds (score = 1 + #thresholds
    strictly below the value — ties share a score); output = per-segment
    user counts + exact monetary totals."""
    from scrapy_ray.pipelines.queries import _ts_minmax_us

    ds = _pq(sf_dir, "events",
             columns=["ts", "user_id", "value"])
    mx_us = _ts_minmax_us(sf_dir, "events")[1]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            "c": _cents(t["value"]).to_numpy(zero_copy_only=False)})
        g = df.groupby("user_id", sort=False).agg(
            last_ts=("ts_us", "max"), f=("c", "size"), m=("c", "sum")) \
            .reset_index()
        g["gkey"] = (g["user_id"] % _PARTS).astype(np.int32)
        return _strip(g)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False).agg(
            last_ts=("last_ts", "max"), f=("f", "sum"), m=("m", "sum")) \
            .reset_index()
        g["r"] = (mx_us - g["last_ts"].to_numpy()) // 86_400_000_000
        return g[["user_id", "r", "f", "m"]]

    users = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("gkey").map_groups(finalize, batch_format="pandas")
               .to_pandas())

    def thr(v: np.ndarray) -> np.ndarray:
        # quantile_disc rule: element at 1-based rank ceil(q*n) with q*n
        # computed in FLOAT64 (mirrors DuckDB bit-for-bit, incl. artifacts
        # like 0.2*25 = 5.000000000000001 — the queries3 precedent)
        s = np.sort(v.astype(np.int64))
        n = len(s)
        return np.array([s[int(np.ceil(q * n)) - 1]
                         for q in (0.2, 0.4, 0.6, 0.8)], np.int64)

    tr, tf, tm = thr(users["r"].to_numpy()), thr(users["f"].to_numpy()), \
        thr(users["m"].to_numpy())

    def score(v: np.ndarray, t: np.ndarray) -> np.ndarray:
        return 1 + (v[:, None] > t[None, :]).sum(1).astype(np.int64)

    seg = pd.DataFrame({
        "r_score": score(users["r"].to_numpy().astype(np.int64), tr),
        "f_score": score(users["f"].to_numpy().astype(np.int64), tf),
        "m_score": score(users["m"].to_numpy().astype(np.int64), tm),
        "m": users["m"].to_numpy().astype(np.int64)})
    out = seg.groupby(["r_score", "f_score", "m_score"]).agg(
        n_users=("m", "size"), m_sum_c=("m", "sum")).reset_index()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["r_score", "f_score", "m_score"]) \
        .reset_index(drop=True)


SQL_RFM = """
WITH mx AS (SELECT max(ts) AS m FROM events),
u AS (
  SELECT user_id,
         (epoch_us((SELECT m FROM mx)) - epoch_us(max(ts)))
           // 86400000000 AS r,
         count(*)::BIGINT AS f,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS m
  FROM events GROUP BY 1),
t AS (
  SELECT quantile_disc(r, 0.2) AS r1, quantile_disc(r, 0.4) AS r2,
         quantile_disc(r, 0.6) AS r3, quantile_disc(r, 0.8) AS r4,
         quantile_disc(f, 0.2) AS f1, quantile_disc(f, 0.4) AS f2,
         quantile_disc(f, 0.6) AS f3, quantile_disc(f, 0.8) AS f4,
         quantile_disc(m, 0.2) AS m1, quantile_disc(m, 0.4) AS m2,
         quantile_disc(m, 0.6) AS m3, quantile_disc(m, 0.8) AS m4
  FROM u),
s AS (
  SELECT (1 + (r > r1)::INT + (r > r2)::INT + (r > r3)::INT
            + (r > r4)::INT)::BIGINT AS r_score,
         (1 + (f > f1)::INT + (f > f2)::INT + (f > f3)::INT
            + (f > f4)::INT)::BIGINT AS f_score,
         (1 + (m > m1)::INT + (m > m2)::INT + (m > m3)::INT
            + (m > m4)::INT)::BIGINT AS m_score,
         m
  FROM u CROSS JOIN t)
SELECT r_score, f_score, m_score, count(*)::BIGINT AS n_users,
       sum(m)::BIGINT AS m_sum_c
FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Holt double-exponential smoothing over daily counts
# ---------------------------------------------------------------------------


def q_holt_linear_daily(sf_dir: str):
    """Holt level+trend smoothing (α = β = 0.5) over each type's dense
    daily count series; init l₁ = y₁, b₁ = 0. The driver replays the
    recurrence over the domain-bounded O(days × types) cell matrix with
    numpy expressions textually identical to the recursive-CTE oracle —
    IEEE float64 step-for-step equality (the ewma precedent), so round6
    is decoration, not a tolerance."""
    mat, types = _daily_cells(sf_dir)
    y = mat.astype(np.float64)
    l = y[0].copy()
    b = np.zeros(len(types))
    for t in range(1, y.shape[0]):
        l_new = 0.5 * y[t] + 0.5 * (l + b)
        b = 0.5 * (l_new - l) + 0.5 * b
        l = l_new
    out = pd.DataFrame({"event_type": types,
                        "l6": _round6(l), "b6": _round6(b),
                        "fc7_6": _round6(l + 7.0 * b)})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_HOLT = """
WITH RECURSIVE
d AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
gd AS (
  SELECT row_number() OVER (ORDER BY day) AS t, day
  FROM (SELECT unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
        FROM span)),
g AS (
  SELECT gd.t, ty.event_type, coalesce(d.n, 0)::DOUBLE AS y
  FROM gd CROSS JOIN (SELECT DISTINCT event_type FROM d) ty
  LEFT JOIN d ON d.day = gd.day AND d.event_type = ty.event_type),
nd AS (SELECT max(t) AS dd FROM gd),
r AS (
  SELECT 1::BIGINT AS t, event_type, y AS l, 0.0::DOUBLE AS b
  FROM g WHERE t = 1
  UNION ALL
  SELECT g.t, g.event_type,
         0.5 * g.y + 0.5 * (r.l + r.b) AS l,
         0.5 * ((0.5 * g.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b AS b
  FROM r JOIN g ON g.event_type = r.event_type AND g.t = r.t + 1)
SELECT event_type, round(l, 6) AS l6, round(b, 6) AS b6,
       round(l + 7.0 * b, 6) AS fc7_6
FROM r WHERE t = (SELECT dd FROM nd) ORDER BY event_type
"""


QUERIES26: dict[str, tuple] = {
    "survival_km_purchase_gaps": (q_survival_km_purchase_gaps, SQL_KM),
    "rfm_segments": (q_rfm_segments, SQL_RFM),
    "holt_linear_daily": (q_holt_linear_daily, SQL_HOLT),
}
