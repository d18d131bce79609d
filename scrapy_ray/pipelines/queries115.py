"""One-hundred-fifteenth oracle-query batch — event-count scan /
dispersion statistics:

- kulldorff_scan_daily: Kulldorff temporal scan for the most anomalous
  purchase-rate window of 1..7 consecutive days: cases = purchases,
  baseline = all events; LLR(z) = c ln(c/n) + (C-c) ln((C-c)/(N-n))
  - C ln(C/N) for windows with elevated rate, 0 otherwise. All counts
  exact; the argmax orders by FLOOR-quantized LLR (exact int), then
  (start, len) — no float-tie ambiguity.
- allan_variance_counts: Allan variance of the event arrival RATE at
  tau in {1h, 6h, 1d}: bins are absolute epoch windows (empty bins
  count 0 via an explicit grid), the numerator SUM (c_{i+1}-c_i)^2 is
  an exact integer, AVAR = num / (2 (M-1) tau^2).
- taylor_law_types: Taylor's power law across the five event types —
  OLS slope of ln(daily-count variance) on ln(daily-count mean); the
  per-type (sum c, sum c^2) are exact (missing days contribute 0),
  ln-terms are 1e-6-quantized per type before the 5-point OLS sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_AV_TAUS = (3600, 21600, 86400)
_KS_MAXLEN = 7


def _qint(x: np.ndarray) -> np.ndarray:
    # mirrors SQL CAST(round(x * 1e6) AS BIGINT)
    return (np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5)).astype(np.int64)


# ---------------------------------------------------------------------------
# Kulldorff temporal scan
# ---------------------------------------------------------------------------


def q_kulldorff_scan_daily(sf_dir: str):
    """Most anomalous 1..7-day purchase window (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        d = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 86_400_000_000)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"d": d.astype(np.int64), "n": np.int64(1),
                           "c": (et == "purchase").astype(np.int64)})
        g = df.groupby("d", sort=False).sum().reset_index()
        for col in ("n", "c"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(cpart, batch_format="pyarrow")
              .groupby("d").aggregate(Sum("n", alias_name="n"),
                                      Sum("c", alias_name="c"))
              .to_pandas().sort_values("d"))
    d0, d1 = int(hist["d"].min()), int(hist["d"].max())
    nd = d1 - d0 + 1
    n = np.zeros(nd, np.int64)
    c = np.zeros(nd, np.int64)
    n[hist["d"].to_numpy(np.int64) - d0] = hist["n"].to_numpy(np.int64)
    c[hist["d"].to_numpy(np.int64) - d0] = hist["c"].to_numpy(np.int64)
    ncum = np.concatenate([[0], np.cumsum(n)])
    ccum = np.concatenate([[0], np.cumsum(c)])
    nn, cc = int(ncum[-1]), int(ccum[-1])
    best = None  # (-llr_q, start, len, wc, wn, llr)
    for ln_ in range(1, _KS_MAXLEN + 1):
        for s in range(0, nd - ln_ + 1):
            wn = int(ncum[s + ln_] - ncum[s])
            wc = int(ccum[s + ln_] - ccum[s])
            if (wc > 0 and wn > 0
                    and float(wc) / float(wn) > float(cc) / float(nn)):
                llr = (float(wc) * np.log(float(wc) / float(wn))
                       - float(cc) * np.log(float(cc) / float(nn)))
                if cc > wc:
                    llr += (float(cc - wc)
                            * np.log(float(cc - wc) / float(nn - wn)))
            else:
                llr = 0.0
            lq = int(np.floor(llr * 1e6))
            key = (-lq, d0 + s, ln_)
            if best is None or key < best[:3]:
                best = (key[0], key[1], key[2], wc, wn, llr)
    out = pd.DataFrame({
        "start_day": [best[1]], "len": [best[2]],
        "cases": [best[3]], "events": [best[4]],
        "llr6": [_round6(np.array([best[5]]))[0]]})
    for col in ("start_day", "len", "cases", "events"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KULLDORFF = f"""
WITH b AS (
  SELECT epoch_us(ts) // 86400000000 AS d, count(*)::BIGINT AS n,
         sum((event_type = 'purchase')::INT)::BIGINT AS c
  FROM events GROUP BY 1),
lim AS (SELECT min(d) AS d0, max(d) AS d1 FROM b),
grid AS (
  SELECT unnest(range((SELECT d0 FROM lim),
                      (SELECT d1 FROM lim) + 1)) AS d),
g AS (
  SELECT grid.d, coalesce(b.n, 0)::BIGINT AS n,
         coalesce(b.c, 0)::BIGINT AS c
  FROM grid LEFT JOIN b USING (d)),
tot AS (SELECT sum(n)::BIGINT AS nn, sum(c)::BIGINT AS cc FROM g),
win AS (
  SELECT g.d AS ds, l.len
  FROM g, (SELECT unnest(range(1, {_KS_MAXLEN + 1})) AS len) l
  WHERE g.d + l.len - 1 <= (SELECT d1 FROM lim)),
wagg AS (
  SELECT w.ds, w.len, sum(g.n)::BIGINT AS wn, sum(g.c)::BIGINT AS wc
  FROM win w JOIN g ON g.d >= w.ds AND g.d < w.ds + w.len
  GROUP BY 1, 2),
llr AS (
  SELECT ds, len, wc, wn,
         CASE WHEN wc > 0 AND wn > 0
                   AND CAST(wc AS DOUBLE) / CAST(wn AS DOUBLE)
                       > CAST(cc AS DOUBLE) / CAST(nn AS DOUBLE)
           THEN CAST(wc AS DOUBLE)
                  * ln(CAST(wc AS DOUBLE) / CAST(wn AS DOUBLE))
                - CAST(cc AS DOUBLE)
                  * ln(CAST(cc AS DOUBLE) / CAST(nn AS DOUBLE))
                + CASE WHEN cc > wc
                    THEN CAST(cc - wc AS DOUBLE)
                         * ln(CAST(cc - wc AS DOUBLE)
                              / CAST(nn - wn AS DOUBLE))
                    ELSE 0.0 END
           ELSE 0.0 END AS llr
  FROM wagg CROSS JOIN tot)
SELECT ds AS start_day, len, wc AS cases, wn AS events,
       round(llr, 6) AS llr6
FROM llr
ORDER BY CAST(floor(llr * 1000000.0) AS BIGINT) DESC, ds, len
LIMIT 1
"""


# ---------------------------------------------------------------------------
# Allan variance of arrival rate
# ---------------------------------------------------------------------------


def q_allan_variance_counts(sf_dir: str):
    """Allan variance at three taus (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts"])

    def cpart(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        frames = []
        for tau in _AV_TAUS:
            b = us // (tau * 1_000_000)
            df = pd.DataFrame({"tau_s": np.int64(tau),
                               "b": b.astype(np.int64),
                               "c": np.int64(1)})
            frames.append(df.groupby(["tau_s", "b"], sort=False)
                          .sum().reset_index())
        g = pd.concat(frames, ignore_index=True)
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(cpart, batch_format="pyarrow")
              .groupby(["tau_s", "b"]).aggregate(Sum("c", alias_name="c"))
              .to_pandas())
    rows = []
    for tau in _AV_TAUS:
        h = hist[hist["tau_s"] == tau].sort_values("b")
        b0, b1 = int(h["b"].min()), int(h["b"].max())
        m = b1 - b0 + 1
        cnt = np.zeros(m, np.int64)
        cnt[h["b"].to_numpy(np.int64) - b0] = h["c"].to_numpy(np.int64)
        d = np.diff(cnt)
        sd2 = int((d * d).sum())
        avar = (float(sd2)
                / (2.0 * float(m - 1) * float(tau) * float(tau)))
        rows.append((tau, m, sd2, _round6(np.array([avar]))[0]))
    out = pd.DataFrame(rows, columns=["tau_s", "m_bins", "sum_d2",
                                      "avar6"])
    for col in ("tau_s", "m_bins", "sum_d2"):
        out[col] = out[col].astype(np.int64)
    return out


def _allan_sql() -> str:
    branches = []
    for tau in _AV_TAUS:
        branches.append(f"""
  SELECT {tau}::BIGINT AS tau_s, m_bins, sum_d2,
         round(CAST(sum_d2 AS DOUBLE)
               / (2.0 * CAST(m_bins - 1 AS DOUBLE)
                  * CAST({tau} AS DOUBLE) * CAST({tau} AS DOUBLE)), 6)
           AS avar6
  FROM (
    SELECT count(*)::BIGINT AS m_bins,
           sum(CASE WHEN pc IS NULL THEN 0
                    ELSE (c - pc) * (c - pc) END)::BIGINT AS sum_d2
    FROM (
      SELECT c, lag(c) OVER (ORDER BY b) AS pc
      FROM (
        SELECT grid.b, coalesce(h.c, 0)::BIGINT AS c
        FROM (SELECT unnest(range(
                 (SELECT min(epoch_us(ts) // {tau * 1_000_000})
                  FROM events),
                 (SELECT max(epoch_us(ts) // {tau * 1_000_000})
                  FROM events) + 1)) AS b) grid
        LEFT JOIN (
          SELECT epoch_us(ts) // {tau * 1_000_000} AS b,
                 count(*)::BIGINT AS c
          FROM events GROUP BY 1) h USING (b))))""")
    return ("WITH u AS (" + " UNION ALL ".join(branches)
            + ") SELECT * FROM u ORDER BY tau_s")


SQL_ALLAN = _allan_sql()


# ---------------------------------------------------------------------------
# Taylor's power law across event types
# ---------------------------------------------------------------------------


def q_taylor_law_types(sf_dir: str):
    """Taylor's law slope across event types (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        d = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 86_400_000_000)
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "d": d.astype(np.int64), "c": np.int64(1)})
        g = df.groupby(["event_type", "d"], sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["event_type", "d"])
               .aggregate(Sum("c", alias_name="c"))
               .to_pandas())
    d0, d1 = int(cells["d"].min()), int(cells["d"].max())
    nd = d1 - d0 + 1
    per = cells.groupby("event_type", sort=True).agg(
        sc=("c", "sum"), sc2=("c", lambda s: (s.astype(np.int64) ** 2)
                              .sum())).reset_index()
    sc = per["sc"].to_numpy(np.int64)
    sc2 = per["sc2"].to_numpy(np.int64)
    mean = sc.astype(np.float64) / float(nd)
    var = ((sc2.astype(np.float64)
            - sc.astype(np.float64) * sc.astype(np.float64) / float(nd))
           / float(nd))
    x = np.log(mean)
    y = np.log(var)
    xq, yq = _qint(x), _qint(y)
    xyq, x2q = _qint(x * y), _qint(x * x)
    t = len(per)
    sx = float(int(xq.sum())) / 1000000.0
    sy = float(int(yq.sum())) / 1000000.0
    sxy = float(int(xyq.sum())) / 1000000.0
    sx2 = float(int(x2q.sum())) / 1000000.0
    tf = float(t)
    det = tf * sx2 - sx * sx
    slope = (tf * sxy - sx * sy) / det
    icpt = (sy * sx2 - sx * sxy) / det
    out = pd.DataFrame({"t_types": [t], "sxq": [int(xq.sum())],
                        "syq": [int(yq.sum())],
                        "slope6": [_round6(np.array([slope]))[0]],
                        "intercept6": [_round6(np.array([icpt]))[0]]})
    for col in ("t_types", "sxq", "syq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_TAYLOR = """
WITH b AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
lim AS (
  SELECT max(d) - min(d) + 1 AS nd
  FROM (SELECT epoch_us(ts) // 86400000000 AS d FROM events)),
agg AS (
  SELECT event_type, sum(c)::BIGINT AS sc, sum(c * c)::BIGINT AS sc2
  FROM b GROUP BY 1),
mv AS (
  SELECT event_type, sc, sc2,
         CAST(sc AS DOUBLE) / CAST(nd AS DOUBLE) AS mean,
         (CAST(sc2 AS DOUBLE)
          - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
            / CAST(nd AS DOUBLE)) / CAST(nd AS DOUBLE) AS var
  FROM agg CROSS JOIN lim),
q AS (
  SELECT CAST(round(ln(mean) * 1000000.0) AS BIGINT) AS xq,
         CAST(round(ln(var) * 1000000.0) AS BIGINT) AS yq,
         CAST(round(ln(mean) * ln(var) * 1000000.0) AS BIGINT) AS xyq,
         CAST(round(ln(mean) * ln(mean) * 1000000.0) AS BIGINT) AS x2q
  FROM mv),
s AS (
  SELECT count(*)::BIGINT AS t, sum(xq)::BIGINT AS sxq,
         sum(yq)::BIGINT AS syq, sum(xyq)::BIGINT AS sxyq,
         sum(x2q)::BIGINT AS sx2q
  FROM q),
f AS (
  SELECT t, sxq, syq,
         CAST(sxq AS DOUBLE) / 1000000.0 AS sx,
         CAST(syq AS DOUBLE) / 1000000.0 AS sy,
         CAST(sxyq AS DOUBLE) / 1000000.0 AS sxy,
         CAST(sx2q AS DOUBLE) / 1000000.0 AS sx2
  FROM s)
SELECT t AS t_types, sxq, syq,
       round((CAST(t AS DOUBLE) * sxy - sx * sy)
             / (CAST(t AS DOUBLE) * sx2 - sx * sx), 6) AS slope6,
       round((sy * sx2 - sx * sxy)
             / (CAST(t AS DOUBLE) * sx2 - sx * sx), 6) AS intercept6
FROM f
"""


QUERIES115: dict[str, tuple] = {
    "kulldorff_scan_daily": (q_kulldorff_scan_daily, SQL_KULLDORFF),
    "allan_variance_counts": (q_allan_variance_counts, SQL_ALLAN),
    "taylor_law_types": (q_taylor_law_types, SQL_TAYLOR),
}
