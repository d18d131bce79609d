"""Thirty-sixth oracle-query batch — multi-resolution / long-memory /
lead-lag time-series analysis over the daily event series:

- haar_energy_daily: unnormalized Haar wavelet DETAIL ENERGY per
  level of the (zero-padded to 2^L) daily event-count series. The
  level-ℓ detail for block j is a difference of two 2^(ℓ−1)-day block
  sums — every coefficient is an exact INTEGER read off one prefix-sum
  array, so no recursion and no float sums anywhere: energy_ℓ = Σ d²
  is an exact int both sides (HUGEINT in SQL, Python int driver-side);
  the normalized energy finalizes as energy/2^ℓ identical-expression.
  SQL needs only a prefix-sum CTE × a generate_series level/block grid.
- hurst_rs_daily: rescaled-range (R/S) analysis — Hurst exponent of
  the daily series over dyadic window sizes {8,16,32,64}. Within a
  block of size m the scaled cumulative deviation Q_k = m·P_k − k·S is
  integer, and R/S = (maxQ−minQ)/√(m·Σy²−S²) — the m's cancel, so the
  per-block ratio is one float expression over two exact ints. Block
  ratios are quantized to 1e-9 units and integer-summed (never-sum-
  floats rule); the log2–log2 slope across sizes is again computed
  from 1e-9-quantized points with integer moment sums, so the final
  hurst6 is one float division of exact integers.
- xcorr_click_purchase: lead-lag cross-correlation — Pearson corr of
  daily click counts vs purchase counts shifted by lag 0..14, each
  lag's moments (n, Σc, Σp, Σcp, Σcc, Σpp) exact integers over the
  overlap window; corr finalizes identical-expression round6. The
  distributed part of all three queries is the O(days) daily cell
  shuffle (autocorr/theil_sen precedent); scans are O(days) driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6

_US_PER_DAY = 86_400_000_000
_RS_SIZES = (8, 16, 32, 64)
_RS_SCALE = 10**9
_XC_MAXLAG = 14


def _daily_counts(sf_dir: str, flt=None) -> pd.DataFrame:
    """Dense (day_idx, cnt) daily series via the O(days) cell shuffle."""
    cols = ["ts"] if flt is None else ["ts", "event_type"]
    ds = _pq(sf_dir, "events", columns=cols)

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        if flt is not None:
            m = np.asarray(t["event_type"].to_pylist()) == flt
            day = day[m]
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day_idx": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    return (ds.map_batches(dpart, batch_format="pyarrow")
            .groupby("day_idx").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())


def _dense(dc: pd.DataFrame, lo: int, hi: int) -> np.ndarray:
    y = np.zeros(hi - lo + 1, np.int64)
    y[dc["day_idx"].to_numpy(np.int64) - lo] = dc["cnt"].to_numpy(np.int64)
    return y


# ---------------------------------------------------------------------------
# Haar wavelet energy
# ---------------------------------------------------------------------------


def q_haar_energy_daily(sf_dir: str):
    """Per-level Haar detail energy (docstring above)."""
    dc = _daily_counts(sf_dir)
    lo, hi = int(dc["day_idx"].min()), int(dc["day_idx"].max())
    y = _dense(dc, lo, hi)
    n = len(y)
    n2 = 1
    while n2 < n:
        n2 *= 2
    pad = np.zeros(n2, np.int64)
    pad[:n] = y
    P = np.r_[0, np.cumsum(pad)]           # prefix sums, exact ints
    rows = []
    lvl, h = 1, 1                          # h = half-block = 2^(lvl-1)
    while 2 * h <= n2:
        j = np.arange(n2 // (2 * h))
        d = ((P[(2 * j + 1) * h] - P[2 * j * h])
             - (P[(2 * j + 2) * h] - P[(2 * j + 1) * h]))
        energy = sum(int(x) * int(x) for x in d)   # Python ints (exact)
        rows.append((lvl, len(j), str(energy),
                     _round6(np.array([float(energy)
                                       / float(2 ** lvl)]))[0]))
        lvl, h = lvl + 1, 2 * h
    out = pd.DataFrame(rows, columns=["level", "n_pairs", "energy",
                                      "norm_energy6"])
    for c in ("level", "n_pairs"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_HAAR = f"""
WITH dc AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
bounds AS (
  SELECT min(day_idx) AS lo, max(day_idx) AS hi,
         CAST(pow(2.0, ceil(log2(CAST(max(day_idx) - min(day_idx) + 1
                                      AS DOUBLE)))) AS BIGINT) AS n2
  FROM dc),
cal AS (
  SELECT unnest(generate_series(0, n2 - 1)) AS i FROM bounds),
y AS (
  SELECT cal.i, coalesce(dc.cnt, 0)::BIGINT AS y
  FROM cal LEFT JOIN dc
    ON dc.day_idx = cal.i + (SELECT lo FROM bounds)),
p AS (
  SELECT i, CAST(sum(y) OVER (ORDER BY i) AS BIGINT) AS pf FROM y),
pp AS (  -- prefix array with P[0] = 0: P[k] = sum of first k values
  SELECT 0 AS k, 0::BIGINT AS pv
  UNION ALL SELECT i + 1 AS k, pf AS pv FROM p),
lv AS (
  SELECT unnest(generate_series(1,
           CAST(log2(CAST((SELECT n2 FROM bounds) AS DOUBLE)) AS BIGINT)))
         AS lvl),
blocks AS (
  SELECT lv.lvl, unnest(generate_series(0,
           (SELECT n2 FROM bounds) // CAST(pow(2.0, lv.lvl) AS BIGINT) - 1))
         AS j
  FROM lv),
coef AS (
  SELECT b.lvl, b.j,
         ((p1.pv - p0.pv) - (p2.pv - p1.pv)) AS d
  FROM blocks b
  JOIN pp p0 ON p0.k = (2*b.j)     * CAST(pow(2.0, b.lvl - 1) AS BIGINT)
  JOIN pp p1 ON p1.k = (2*b.j + 1) * CAST(pow(2.0, b.lvl - 1) AS BIGINT)
  JOIN pp p2 ON p2.k = (2*b.j + 2) * CAST(pow(2.0, b.lvl - 1) AS BIGINT))
SELECT lvl AS level, count(*)::BIGINT AS n_pairs,
       CAST(sum(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS VARCHAR)
         AS energy,
       round(CAST(sum(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS DOUBLE)
             / pow(2.0, lvl), 6) AS norm_energy6
FROM coef GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Hurst R/S
# ---------------------------------------------------------------------------


def q_hurst_rs_daily(sf_dir: str):
    """Hurst exponent by rescaled-range analysis (docstring above)."""
    dc = _daily_counts(sf_dir)
    lo, hi = int(dc["day_idx"].min()), int(dc["day_idx"].max())
    y = _dense(dc, lo, hi)
    N = len(y)
    rows = []
    pts = []
    for m in _RS_SIZES:
        if m > N:
            continue
        nb = N // m
        units_sum = 0
        n_valid = 0
        for b in range(nb):
            blk = y[b * m:(b + 1) * m]
            S = int(blk.sum())
            P = np.cumsum(blk).astype(np.int64)
            k = np.arange(1, m + 1, dtype=np.int64)
            Q = m * P - k * S
            dq = int(Q.max()) - int(Q.min())
            v = m * int((blk.astype(np.int64) ** 2).sum()) - S * S
            if v <= 0:
                continue
            rs = float(dq) / np.sqrt(float(v))
            units_sum += int(np.floor(rs * _RS_SCALE + 0.5))
            n_valid += 1
        if n_valid == 0:
            continue
        rows.append((m, n_valid, units_sum))
        rsm = float(units_sum) / (float(n_valid) * float(_RS_SCALE))
        pts.append((float(np.log2(float(m))), float(np.log2(rsm))))
    # quantized log-log points -> integer moment sums -> exact slope
    xq = [int(np.floor(abs(x) * _RS_SCALE + 0.5)) * (1 if x >= 0 else -1)
          for x, _ in pts]
    yq = [int(np.floor(abs(v) * _RS_SCALE + 0.5)) * (1 if v >= 0 else -1)
          for _, v in pts]
    np_ = len(pts)
    sx, sy = sum(xq), sum(yq)
    sxy = sum(a * b for a, b in zip(xq, yq))
    sxx = sum(a * a for a in xq)
    hurst6 = _round6(np.array(
        [float(np_ * sxy - sx * sy) / float(np_ * sxx - sx * sx)]))[0]
    out = pd.DataFrame(rows, columns=["m", "n_blocks", "rs_units"])
    for c in ("m", "n_blocks", "rs_units"):
        out[c] = out[c].astype(np.int64)
    out["hurst6"] = hurst6
    return out


SQL_HURST = f"""
WITH dc AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
bounds AS (SELECT min(day_idx) AS lo, max(day_idx) AS hi,
                  (max(day_idx) - min(day_idx) + 1)::BIGINT AS N FROM dc),
cal AS (SELECT unnest(generate_series(0, N - 1)) AS i FROM bounds),
y AS (
  SELECT cal.i, coalesce(dc.cnt, 0)::BIGINT AS y
  FROM cal LEFT JOIN dc ON dc.day_idx = cal.i + (SELECT lo FROM bounds)),
sz AS (SELECT unnest([{", ".join(str(m) for m in _RS_SIZES)}]) AS m),
blk AS (
  SELECT sz.m, y.i // sz.m AS b, (y.i % sz.m) + 1 AS k, y.y
  FROM y CROSS JOIN sz
  WHERE sz.m <= (SELECT N FROM bounds)
    AND y.i // sz.m < (SELECT N FROM bounds) // sz.m),
q AS (
  SELECT m, b, k, y,
         CAST(m * sum(y) OVER (PARTITION BY m, b ORDER BY k)
              - k * sum(y) OVER (PARTITION BY m, b) AS BIGINT) AS qv
  FROM blk),
bs AS (
  SELECT m, b,
         max(qv) - min(qv) AS dq,
         CAST(any_value(m) * sum(y*y) AS BIGINT)
           - CAST(sum(y) AS BIGINT) * CAST(sum(y) AS BIGINT) AS v
  FROM q GROUP BY 1, 2),
ru AS (
  SELECT m, b,
         CAST(round(CAST(dq AS DOUBLE) / sqrt(CAST(v AS DOUBLE))
                    * {_RS_SCALE}) AS BIGINT) AS u
  FROM bs WHERE v > 0),
agg AS (
  SELECT m, count(*)::BIGINT AS n_blocks, sum(u)::BIGINT AS rs_units
  FROM ru GROUP BY 1),
pts AS (
  SELECT m,
         CAST(round(log2(CAST(m AS DOUBLE)) * {_RS_SCALE}) AS BIGINT)
           AS xq,
         CAST(round(log2(CAST(rs_units AS DOUBLE)
                         / (CAST(n_blocks AS DOUBLE) * {_RS_SCALE}.0))
                    * {_RS_SCALE}) AS BIGINT) AS yq
  FROM agg),
sl AS (
  SELECT count(*)::HUGEINT AS np, sum(xq)::HUGEINT AS sx,
         sum(yq)::HUGEINT AS sy,
         sum(CAST(xq AS HUGEINT) * yq)::HUGEINT AS sxy,
         sum(CAST(xq AS HUGEINT) * xq)::HUGEINT AS sxx
  FROM pts)
SELECT agg.m, agg.n_blocks, agg.rs_units,
       round(CAST(np*sxy - sx*sy AS DOUBLE)
             / CAST(np*sxx - sx*sx AS DOUBLE), 6) AS hurst6
FROM agg, sl ORDER BY agg.m
"""


# ---------------------------------------------------------------------------
# cross-correlation lag scan
# ---------------------------------------------------------------------------


def q_xcorr_click_purchase(sf_dir: str):
    """Pearson corr of clicks vs lag-shifted purchases (docstring
    above)."""
    cc = _daily_counts(sf_dir, flt="click")
    pp = _daily_counts(sf_dir, flt="purchase")
    lo = min(int(cc["day_idx"].min()), int(pp["day_idx"].min()))
    hi = max(int(cc["day_idx"].max()), int(pp["day_idx"].max()))
    c = _dense(cc, lo, hi)
    p = _dense(pp, lo, hi)
    N = len(c)
    rows = []
    for lag in range(_XC_MAXLAG + 1):
        n = N - lag
        if n < 2:
            break
        a = c[:n].astype(object)           # Python ints: exact moments
        b = p[lag:].astype(object)
        sa, sb = int(sum(a)), int(sum(b))
        sab = int(sum(a * b))
        saa = int(sum(a * a))
        sbb = int(sum(b * b))
        num = n * sab - sa * sb
        d1 = n * saa - sa * sa
        d2 = n * sbb - sb * sb
        if d1 <= 0 or d2 <= 0:
            continue
        corr = float(num) / np.sqrt(float(d1) * float(d2))
        rows.append((lag, n, _round6(np.array([corr]))[0]))
    out = pd.DataFrame(rows, columns=["lag", "n_overlap", "corr6"])
    for col in ("lag", "n_overlap"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_XCORR = f"""
WITH dc AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
           AS c,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
           AS p
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
bounds AS (SELECT min(day_idx) AS lo, max(day_idx) AS hi,
                  (max(day_idx) - min(day_idx) + 1)::BIGINT AS N FROM dc),
cal AS (SELECT unnest(generate_series(0, N - 1)) AS i FROM bounds),
y AS (
  SELECT cal.i, coalesce(dc.c, 0)::BIGINT AS c, coalesce(dc.p, 0)::BIGINT
           AS p
  FROM cal LEFT JOIN dc ON dc.day_idx = cal.i + (SELECT lo FROM bounds)),
lags AS (SELECT unnest(generate_series(0, {_XC_MAXLAG})) AS lag),
m AS (
  SELECT l.lag, count(*)::HUGEINT AS n,
         sum(a.c)::HUGEINT AS sa, sum(b.p)::HUGEINT AS sb,
         sum(a.c * b.p)::HUGEINT AS sab, sum(a.c * a.c)::HUGEINT AS saa,
         sum(b.p * b.p)::HUGEINT AS sbb
  FROM lags l
  JOIN y a ON a.i < (SELECT N FROM bounds) - l.lag
  JOIN y b ON b.i = a.i + l.lag
  GROUP BY 1
  HAVING count(*) >= 2),
f AS (
  SELECT lag, n, n*sab - sa*sb AS num, n*saa - sa*sa AS d1,
         n*sbb - sb*sb AS d2
  FROM m WHERE n*saa - sa*sa > 0 AND n*sbb - sb*sb > 0)
SELECT lag, n::BIGINT AS n_overlap,
       round(CAST(num AS DOUBLE)
             / sqrt(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)), 6) AS corr6
FROM f ORDER BY lag
"""


QUERIES36: dict[str, tuple] = {
    "haar_energy_daily": (q_haar_energy_daily, SQL_HAAR),
    "hurst_rs_daily": (q_hurst_rs_daily, SQL_HURST),
    "xcorr_click_purchase": (q_xcorr_click_purchase, SQL_XCORR),
}
