"""Thirty-seventh oracle-query batch — forecast evaluation / causal
inference / probability calibration:

- mase_seasonal_naive: MASE backtest of the seasonal-naive forecast
  ŷ_d = y_{d−7} on daily event counts — the standard scale-free
  forecast-accuracy metric (Hyndman & Koehler 2006). Both absolute-
  error sums (seasonal model errors and the one-step naive scale) are
  EXACT integers over the dense daily grid; MASE finalizes as one
  identical-expression float of four ints. Distributed part: the
  O(days) daily cell shuffle.
- did_estimator: difference-in-differences over the 2×2 (arm ×
  pre/post) design — arm = user_id % 2, period split at the
  footer-stats ts midpoint. Per-cell value-cent moments (n, Σc, Σc²)
  are integer partials combined in Python ints (cov_matrix
  discipline; HUGEINT in SQL); the DiD effect, its pooled standard
  error √(Σ s²_g/n_g) and the t statistic finalize identical-
  expression round6.
- ece_calibration: expected calibration error treating the global
  value-decile midpoint (b+0.5)/10 as predicted purchase probability
  vs the bin's realized purchase rate. Decile edges via the cent-
  histogram quantile_disc rank walk (PSI precedent); per-bin
  |acc−conf|·n contributions are quantized to 1e-12 units and
  integer-summed (never-sum-floats rule). Cells ride one salted
  O(cent-domain) shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq, _ts_minmax_us
from scrapy_ray.pipelines.queries8 import _round6

_US_PER_DAY = 86_400_000_000
_Q37_SALT = 64
_ECE_SCALE = 10**12


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# MASE
# ---------------------------------------------------------------------------


def q_mase_seasonal_naive(sf_dir: str):
    """Seasonal-naive MASE on daily counts (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day_idx": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    dc = (ds.map_batches(dpart, batch_format="pyarrow")
            .groupby("day_idx").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas().sort_values("day_idx").reset_index(drop=True))
    lo, hi = int(dc["day_idx"].min()), int(dc["day_idx"].max())
    y = np.zeros(hi - lo + 1, np.int64)
    y[dc["day_idx"].to_numpy(np.int64) - lo] = dc["cnt"].to_numpy(np.int64)
    e7 = np.abs(y[7:] - y[:-7])
    e1 = np.abs(y[1:] - y[:-1])
    n7, n1 = len(e7), len(e1)
    sae7, sae1 = int(e7.sum()), int(e1.sum())
    mase6 = _round6(np.array(
        [(float(sae7) / float(n7)) / (float(sae1) / float(n1))]))[0]
    out = pd.DataFrame({"n7": [n7], "n1": [n1], "sae7": [sae7],
                        "sae1": [sae1], "mase6": [mase6]})
    for c in ("n7", "n1", "sae7", "sae1"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_MASE = f"""
WITH dc AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
bounds AS (SELECT min(day_idx) AS lo, max(day_idx) AS hi FROM dc),
cal AS (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM bounds),
y AS (
  SELECT cal.day_idx, coalesce(dc.cnt, 0)::BIGINT AS y
  FROM cal LEFT JOIN dc ON dc.day_idx = cal.day_idx),
l AS (
  SELECT day_idx, y,
         lag(y, 7) OVER (ORDER BY day_idx) AS y7,
         lag(y, 1) OVER (ORDER BY day_idx) AS y1
  FROM y),
a AS (
  SELECT count(y7)::BIGINT AS n7, count(y1)::BIGINT AS n1,
         coalesce(sum(abs(y - y7)), 0)::BIGINT AS sae7,
         coalesce(sum(abs(y - y1)), 0)::BIGINT AS sae1
  FROM l)
SELECT n7, n1, sae7, sae1,
       round((CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE))
             / (CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 6) AS mase6
FROM a
"""


# ---------------------------------------------------------------------------
# difference-in-differences
# ---------------------------------------------------------------------------


def q_did_estimator(sf_dir: str):
    """2×2 DiD with pooled SE (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "user_id", "value"])
    lo_us, hi_us = _ts_minmax_us(sf_dir, "events")
    mid_us = lo_us + (hi_us - lo_us) // 2

    def cpart(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        arm = (u % 2).astype(np.int64)
        post = (ts > mid_us).astype(np.int64)
        df = pd.DataFrame({"arm": arm, "post": post, "n": np.int64(1),
                           "s": c, "s2": c * c})
        g = df.groupby(["arm", "post"], sort=False).sum().reset_index()
        for col in ("n", "s", "s2"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    parts = ds.map_batches(cpart, batch_format="pyarrow").to_pandas()
    cells = {}
    for _, r in parts.iterrows():
        key = (int(r["arm"]), int(r["post"]))
        c = cells.setdefault(key, [0, 0, 0])
        c[0] += int(r["n"])
        c[1] += int(r["s"])
        c[2] += int(r["s2"])
    mean = {k: float(s) / float(n) for k, (n, s, s2) in cells.items()}
    # deterministic accumulation order for the SE (SQL mirrors the same
    # four-term sum in cell order (0,0),(0,1),(1,0),(1,1))
    varterm = 0.0
    for key in ((0, 0), (0, 1), (1, 0), (1, 1)):
        n, s, s2 = cells[key]
        varterm += (float(n * s2 - s * s)
                    / (float(n) * float(n - 1))) / float(n)
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    se = float(np.sqrt(varterm))
    out = {"n00": cells[(0, 0)][0], "n01": cells[(0, 1)][0],
           "n10": cells[(1, 0)][0], "n11": cells[(1, 1)][0]}
    r6 = _round6(np.array([mean[(0, 0)], mean[(0, 1)], mean[(1, 0)],
                           mean[(1, 1)], did, se, did / se]))
    df = pd.DataFrame({**{k: [v] for k, v in out.items()},
                       "mean00_6": [r6[0]], "mean01_6": [r6[1]],
                       "mean10_6": [r6[2]], "mean11_6": [r6[3]],
                       "did6": [r6[4]], "se6": [r6[5]], "t6": [r6[6]]})
    for c in ("n00", "n01", "n10", "n11"):
        df[c] = df[c].astype(np.int64)
    return df


SQL_DID = """
WITH b AS (SELECT (epoch_us(min(ts))
                   + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2) AS mid
           FROM events),
e AS (
  SELECT (user_id % 2)::BIGINT AS arm,
         CASE WHEN epoch_us(ts) > (SELECT mid FROM b) THEN 1 ELSE 0 END
           AS post,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
g AS (
  SELECT arm, post, count(*)::HUGEINT AS n, sum(c)::HUGEINT AS s,
         sum(c*c)::HUGEINT AS s2
  FROM e GROUP BY 1, 2),
m AS (
  SELECT
    max(CASE WHEN arm=0 AND post=0 THEN n END) AS n00,
    max(CASE WHEN arm=0 AND post=1 THEN n END) AS n01,
    max(CASE WHEN arm=1 AND post=0 THEN n END) AS n10,
    max(CASE WHEN arm=1 AND post=1 THEN n END) AS n11,
    max(CASE WHEN arm=0 AND post=0 THEN CAST(s AS DOUBLE)/CAST(n AS DOUBLE) END) AS m00,
    max(CASE WHEN arm=0 AND post=1 THEN CAST(s AS DOUBLE)/CAST(n AS DOUBLE) END) AS m01,
    max(CASE WHEN arm=1 AND post=0 THEN CAST(s AS DOUBLE)/CAST(n AS DOUBLE) END) AS m10,
    max(CASE WHEN arm=1 AND post=1 THEN CAST(s AS DOUBLE)/CAST(n AS DOUBLE) END) AS m11,
    max(CASE WHEN arm=0 AND post=0 THEN
        CAST(n*s2 - s*s AS DOUBLE)/(CAST(n AS DOUBLE)*CAST(n-1 AS DOUBLE))
        / CAST(n AS DOUBLE) END) AS v00,
    max(CASE WHEN arm=0 AND post=1 THEN
        CAST(n*s2 - s*s AS DOUBLE)/(CAST(n AS DOUBLE)*CAST(n-1 AS DOUBLE))
        / CAST(n AS DOUBLE) END) AS v01,
    max(CASE WHEN arm=1 AND post=0 THEN
        CAST(n*s2 - s*s AS DOUBLE)/(CAST(n AS DOUBLE)*CAST(n-1 AS DOUBLE))
        / CAST(n AS DOUBLE) END) AS v10,
    max(CASE WHEN arm=1 AND post=1 THEN
        CAST(n*s2 - s*s AS DOUBLE)/(CAST(n AS DOUBLE)*CAST(n-1 AS DOUBLE))
        / CAST(n AS DOUBLE) END) AS v11
  FROM g)
SELECT n00::BIGINT AS n00, n01::BIGINT AS n01, n10::BIGINT AS n10,
       n11::BIGINT AS n11,
       round(m00, 6) AS mean00_6, round(m01, 6) AS mean01_6,
       round(m10, 6) AS mean10_6, round(m11, 6) AS mean11_6,
       round((m11 - m10) - (m01 - m00), 6) AS did6,
       round(sqrt(((v00 + v01) + v10) + v11), 6) AS se6,
       round(((m11 - m10) - (m01 - m00))
             / sqrt(((v00 + v01) + v10) + v11), 6) AS t6
FROM m
"""


# ---------------------------------------------------------------------------
# expected calibration error
# ---------------------------------------------------------------------------


def q_ece_calibration(sf_dir: str):
    """ECE of value-decile midpoints vs purchase rate (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def cpart(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        k = (np.asarray(t["event_type"].to_pylist()) == "purchase") \
            .astype(np.int64)
        df = pd.DataFrame({"c": c, "n": np.int64(1), "k": k})
        g = df.groupby("c", sort=False)[["n", "k"]].sum().reset_index()
        for col in ("n", "k"):
            g[col] = g[col].astype(np.int64)
        g["sk"] = (g["c"] % _Q37_SALT).astype(np.int64)
        return _strip(g)

    def csum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c", sort=False)[["n", "k"]].sum().reset_index()
        for col in ("n", "k"):
            g[col] = g[col].astype(np.int64)
        return g

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby("sk").map_groups(csum, batch_format="pandas")
               .to_pandas().sort_values("c").reset_index(drop=True))
    cv = cells["c"].to_numpy(np.int64)
    cn = cells["n"].to_numpy(np.int64)
    ck = cells["k"].to_numpy(np.int64)
    N = int(cn.sum())
    cum = np.cumsum(cn)
    edges = np.array(
        [cv[np.searchsorted(cum, int(np.ceil(q * N)), side="left")]
         for q in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)], np.int64)
    b = (cv[:, None] > edges[None, :]).sum(1)
    nb = np.zeros(10, np.int64)
    kb = np.zeros(10, np.int64)
    np.add.at(nb, b, cn)
    np.add.at(kb, b, ck)
    bins = np.arange(10, dtype=np.int64)
    acc = kb.astype(np.float64) / nb.astype(np.float64)
    conf = (bins.astype(np.float64) + 0.5) / 10.0
    contrib = np.abs(acc - conf) * nb.astype(np.float64) \
        / np.float64(N)
    units = np.floor(contrib * _ECE_SCALE + 0.5).astype(np.int64)
    ece6 = _round6(np.array([float(int(units.sum()))
                             / float(_ECE_SCALE)]))[0]
    out = pd.DataFrame({"bin": bins, "n": nb, "k": kb,
                        "acc6": _round6(acc), "conf6": _round6(conf),
                        "contrib_units": units})
    out["ece6"] = ece6
    return out


def _ece_sql() -> str:
    qs = ", ".join(f"quantile_disc(c, {q:.1f}) AS e{i}"
                   for i, q in enumerate(
                       (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)))
    gt = " + ".join(f"(CASE WHEN c > e{i} THEN 1 ELSE 0 END)"
                    for i in range(9))
    return f"""
WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS k
  FROM events),
e AS (SELECT {qs} FROM v),
bb AS (
  SELECT ({gt})::BIGINT AS bin, count(*)::BIGINT AS n,
         sum(k)::BIGINT AS k
  FROM v, e GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS ntot FROM bb),
c AS (
  SELECT bin, n, k,
         CAST(round(abs(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                        - (CAST(bin AS DOUBLE) + 0.5) / 10.0)
                    * CAST(n AS DOUBLE) / CAST(ntot AS DOUBLE)
                    * {_ECE_SCALE}) AS BIGINT) AS contrib_units
  FROM bb, t),
s AS (SELECT sum(contrib_units)::BIGINT AS su FROM c)
SELECT bin, n, k,
       round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc6,
       round((CAST(bin AS DOUBLE) + 0.5) / 10.0, 6) AS conf6,
       contrib_units,
       round(CAST((SELECT su FROM s) AS DOUBLE) / {_ECE_SCALE}.0, 6)
         AS ece6
FROM c ORDER BY bin
"""


SQL_ECE = _ece_sql()


QUERIES37: dict[str, tuple] = {
    "mase_seasonal_naive": (q_mase_seasonal_naive, SQL_MASE),
    "did_estimator": (q_did_estimator, SQL_DID),
    "ece_calibration": (q_ece_calibration, SQL_ECE),
}
