"""Twenty-fourth oracle-query batch — sequential/robust statistics shapes:

- cusum_daily_drift: one-sided CUSUM change detection over the dense DAILY
  event-count series per type, S_t = max(0, S_{t-1} + (n_t·D − T)) (drift
  term = exact integer deviation from the type's mean daily rate, scaled
  by D so everything stays int64). The recurrence looks inherently serial,
  but max(0, s + x) steps compose as tropical-affine maps
  f(s) = max(b, s + a) — ASSOCIATIVE — so each time-block reduces
  independently (vectorized via the cumsum/running-min identity
  S_t = P_t − min(0, min_{j≤t} P_j)) to a 4-tuple (a, b, p, q) and the
  driver composes O(blocks) tuples per type: a distributed NONLINEAR
  prefix scan (the additive carry of max_concurrent_sessions generalized
  to a reset recurrence). Oracle = recursive CTE replaying the recurrence
  day by day.
- hampel_outliers: robust outlier counts per type — |c − median| > 3·MAD
  (both median and MAD as quantile_disc rank selections, so every
  comparison is exact int64). ONE data scan → O(types × distinct cents)
  cells; median, the |c − med| deviation histogram, MAD and the outlier
  count are all derived from the same cell table without rescanning.
- autocorr_daily_lag1: lag-1 autocorrelation of the dense daily count
  series per type (seasonality/burstiness diagnostic). Exact integer
  moments over the (n_{t-1}, n_t) pairs from the domain-bounded cell
  table; Pearson finalized with the identical float64 expression + round6
  both sides.

Everything on the shuffle is exact int64; floats appear only in the final
round6 expressions mirrored verbatim in the SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_CUSUM_BLOCKS = 64


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _daily_cells(sf_dir: str):
    """(day, event_type, n) exact counts + the dense day grid, shared by
    the two time-series queries. One scan; O(days × types) cells."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "day": pc.floor_temporal(t["ts"], unit="day").to_pandas(),
            "event_type": t["event_type"].to_pylist()})
        g = df.groupby(["day", "event_type"], sort=False) \
              .size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["day", "event_type"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    days = pd.date_range(cells["day"].min(), cells["day"].max(), freq="D",
                         unit="us")
    types = np.sort(cells["event_type"].unique())
    day_ix = pd.Series(np.arange(len(days)), index=days)
    mat = np.zeros((len(days), len(types)), np.int64)
    ti = pd.Series(np.arange(len(types)), index=types)
    mat[day_ix.reindex(cells["day"]).to_numpy(),
        ti.reindex(cells["event_type"]).to_numpy()] = cells["n"].to_numpy()
    return mat, types


# ---------------------------------------------------------------------------
# CUSUM drift detection (distributed tropical prefix scan)
# ---------------------------------------------------------------------------


def _block_tuple(x: np.ndarray) -> tuple[int, int, int, int]:
    """Reduce a block of increments to the tropical-affine composition
    f(s) = max(b, s + a) plus the block-max witnesses p (entry-independent)
    and q (entry-shift slope): exit = max(b, s+a); block max = max(p, s+q).
    Via the reset identity S_t = P_t − min(0, min_{j≤t} P_j)."""
    P = np.cumsum(x)
    rm = np.minimum.accumulate(P)
    b_vec = P - rm                    # trajectory for entry = -inf (resets)
    return int(P[-1]), int(b_vec[-1]), int(b_vec.max()), int(P.max())


def q_cusum_daily_drift(sf_dir: str):
    """Per-type one-sided CUSUM over daily counts: S_0 = 0,
    S_t = max(0, S_{t-1} + (n_t·D − T_type)) on the dense day grid
    (D days, T_type = total events of the type — so the drift term is the
    exact scaled deviation from the type's mean daily rate). Reports the
    peak statistic and the final state (both in count·D units). The day
    blocks reduce in parallel to (a, b, p, q) tuples; the driver composes
    O(blocks) tuples per type — block boundaries never change the result
    because max(0, s+x) maps compose associatively."""
    mat, types = _daily_cells(sf_dir)
    D = mat.shape[0]
    out_rows = []
    n_blocks = min(_CUSUM_BLOCKS, D)
    bounds = np.linspace(0, D, n_blocks + 1).astype(int)
    for j, ty in enumerate(types):
        T = int(mat[:, j].sum())
        x = mat[:, j].astype(np.int64) * D - T
        s, mx = 0, 0
        for k in range(n_blocks):
            lo, hi = bounds[k], bounds[k + 1]
            if hi <= lo:
                continue
            a, b, p, q = _block_tuple(x[lo:hi])
            mx = max(mx, p, s + q)
            s = max(b, s + a)
        out_rows.append((ty, mx, s))
    out = pd.DataFrame(out_rows, columns=["event_type", "peak_sd", "final_sd"])
    out["peak_sd"] = out["peak_sd"].astype(np.int64)
    out["final_sd"] = out["final_sd"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_CUSUM = """
WITH RECURSIVE
d AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
gd AS (
  SELECT row_number() OVER (ORDER BY day) AS t, day
  FROM (SELECT unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
        FROM span)),
grid AS (
  SELECT gd.t, gd.day, ty.event_type
  FROM gd CROSS JOIN (SELECT DISTINCT event_type FROM d) ty),
tot AS (SELECT event_type, sum(n)::BIGINT AS tt FROM d GROUP BY 1),
nd AS (SELECT max(t)::BIGINT AS dd FROM gd),
g AS (
  SELECT grid.t, grid.event_type,
         coalesce(d.n, 0) * nd.dd - tot.tt AS x
  FROM grid LEFT JOIN d ON d.day = grid.day AND d.event_type = grid.event_type
  JOIN tot ON tot.event_type = grid.event_type CROSS JOIN nd),
r AS (
  SELECT 0::BIGINT AS t, event_type, 0::BIGINT AS s, 0::BIGINT AS mx
  FROM (SELECT DISTINCT event_type FROM d)
  UNION ALL
  SELECT g.t, g.event_type,
         greatest(0, r.s + g.x) AS s,
         greatest(r.mx, greatest(0, r.s + g.x)) AS mx
  FROM r JOIN g ON g.event_type = r.event_type AND g.t = r.t + 1)
SELECT event_type, max(mx)::BIGINT AS peak_sd,
       max(CASE WHEN t = (SELECT dd FROM nd) THEN s END)::BIGINT AS final_sd
FROM r GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Hampel robust outliers (median/MAD rank selection, all-integer compare)
# ---------------------------------------------------------------------------


def q_hampel_outliers(sf_dir: str):
    """Per-type robust outlier count: |c − med| > 3·MAD with med and MAD
    as quantile_disc(0.5) rank selections (1-based rank ceil(n/2)) — every
    comparison exact int64. One scan shrinks events to
    (type, cent, count) cells; the deviation histogram, MAD and the
    outlier count are all re-derived from the SAME cells (no second
    scan). Driver folds the domain-bounded cell table."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pylist(),
            "c": _cents(t["value"]).to_numpy(zero_copy_only=False)})
        g = df.groupby(["event_type", "c"], sort=False) \
              .size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["event_type", "c"])
               .aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())

    def disc_median(vals: np.ndarray, cnts: np.ndarray) -> int:
        order = np.argsort(vals, kind="mergesort")
        v, k = vals[order], cnts[order]
        n = int(k.sum())
        rank = (n + 1) // 2           # ceil(0.5 * n), 1-based
        return int(v[np.searchsorted(np.cumsum(k), rank)])

    rows = []
    for ty, grp in cells.groupby("event_type", sort=True):
        v = grp["c"].to_numpy().astype(np.int64)
        k = grp["cnt"].to_numpy().astype(np.int64)
        med = disc_median(v, k)
        dev = np.abs(v - med)
        mad = disc_median(dev, k)
        n_out = int(k[dev > 3 * mad].sum())
        rows.append((ty, med, mad, n_out, int(k.sum())))
    out = pd.DataFrame(rows, columns=["event_type", "med_c", "mad_c",
                                      "n_outliers", "n"])
    for c in ("med_c", "mad_c", "n_outliers", "n"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_HAMPEL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
med AS (
  SELECT event_type, quantile_disc(c, 0.5)::BIGINT AS med_c
  FROM c GROUP BY 1),
d AS (
  SELECT c.event_type, abs(c.c - med.med_c) AS dev
  FROM c JOIN med USING (event_type)),
mad AS (
  SELECT event_type, quantile_disc(dev, 0.5)::BIGINT AS mad_c
  FROM d GROUP BY 1)
SELECT d.event_type, med.med_c, mad.mad_c,
       sum(CASE WHEN d.dev > 3 * mad.mad_c THEN 1 ELSE 0 END)::BIGINT
         AS n_outliers,
       count(*)::BIGINT AS n
FROM d JOIN mad USING (event_type) JOIN med USING (event_type)
GROUP BY 1, 2, 3 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# lag-1 autocorrelation of daily counts
# ---------------------------------------------------------------------------


def q_autocorr_daily_lag1(sf_dir: str):
    """Lag-1 Pearson autocorrelation of each type's dense daily count
    series (missing calendar days count zero — RANGE semantics). Integer
    moments (m, Sx, Sy, Sxy, Sxx, Syy) over the (n_{t-1}, n_t) pairs come
    straight from the domain-bounded cell matrix; the correlation is
    finalized with the identical float64 expression + round6 both sides."""
    mat, types = _daily_cells(sf_dir)
    if mat.shape[0] < 2:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "m": pd.Series([], dtype=np.int64),
                             "acf1_6": pd.Series([], dtype=np.float64)})
    x = mat[:-1].astype(np.int64)
    y = mat[1:].astype(np.int64)
    m = np.int64(x.shape[0])
    Sx, Sy = x.sum(0), y.sum(0)
    Sxy = (x * y).sum(0)
    Sxx, Syy = (x * x).sum(0), (y * y).sum(0)
    num = (m * Sxy - Sx * Sy).astype(np.float64)
    den = (np.sqrt((m * Sxx - Sx * Sx).astype(np.float64))
           * np.sqrt((m * Syy - Sy * Sy).astype(np.float64)))
    acf = _round6(num / den)
    out = pd.DataFrame({"event_type": types,
                        "m": np.full(len(types), m, np.int64),
                        "acf1_6": acf})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_ACF1 = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
grid AS (
  SELECT gd.day, ty.event_type
  FROM (SELECT unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
        FROM span) gd
  CROSS JOIN (SELECT DISTINCT event_type FROM d) ty),
g AS (
  SELECT grid.day, grid.event_type, coalesce(d.n, 0)::BIGINT AS n
  FROM grid LEFT JOIN d USING (day, event_type)),
p AS (
  SELECT event_type, n AS yv,
         lag(n) OVER (PARTITION BY event_type ORDER BY day) AS xv
  FROM g),
mo AS (
  SELECT event_type, count(*)::BIGINT AS m,
         sum(xv)::BIGINT AS sx, sum(yv)::BIGINT AS sy,
         sum(xv * yv)::BIGINT AS sxy,
         sum(xv * xv)::BIGINT AS sxx, sum(yv * yv)::BIGINT AS syy
  FROM p WHERE xv IS NOT NULL GROUP BY 1)
SELECT event_type, m,
       round((m * sxy - sx * sy)::DOUBLE
             / (sqrt((m * sxx - sx * sx)::DOUBLE)
                * sqrt((m * syy - sy * sy)::DOUBLE)), 6) AS acf1_6
FROM mo ORDER BY 1
"""


QUERIES24: dict[str, tuple] = {
    "cusum_daily_drift": (q_cusum_daily_drift, SQL_CUSUM),
    "hampel_outliers": (q_hampel_outliers, SQL_HAMPEL),
    "autocorr_daily_lag1": (q_autocorr_daily_lag1, SQL_ACF1),
}
