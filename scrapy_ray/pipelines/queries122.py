"""One-hundred-twenty-second oracle-query batch — dynamic-programming
sequence kernels, each replayed exactly in SQL:

- dtw_hourly_profiles: dynamic-time-warping distance between the
  24-point hourly click-count and purchase-count profiles. The DP is
  all-integer (|x_i − y_j| costs on exact counts); the oracle replays
  it cell-by-cell in a recursive CTE carrying the growing DP table as
  a LIST (576 steps).
- lcs_quarterly_updown: longest-common-subsequence length between the
  up/down sign sequences of quarterly order revenue and quarterly
  order counts (ties count as down — the `>` rule). Integer DP,
  replayed cell-by-cell in a recursive CTE like the DTW.
- levenshtein_updown_monthly: edit distance between the monthly
  up/down strings of revenue vs order count — the oracle is DuckDB's
  BUILT-IN levenshtein() (an independent implementation, not a
  replay), against a driver-side integer DP on distributed monthly
  aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries47 import _strip


# ---------------------------------------------------------------------------
# shared: per-period order (revenue cents, count) series
# ---------------------------------------------------------------------------


def _order_period_series(sf_dir: str, months_per: int) -> pd.DataFrame:
    """Distributed per-period exact (Σrevenue-cents, count) over orders;
    months_per=1 → monthly, 3 → quarterly. Sorted by period."""
    ds = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def ppart(df: pd.DataFrame) -> pd.DataFrame:
        y = df["o_orderdate"].dt.year.to_numpy(np.int64)
        mo = df["o_orderdate"].dt.month.to_numpy(np.int64)
        if months_per == 1:
            per = y * 12 + mo
        else:
            per = y * 4 + (mo - 1) // 3
        p = df["o_totalprice"].to_numpy()
        cents = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"per": per, "rev": cents, "cnt": np.int64(1)}) \
            .groupby("per", sort=False).sum().reset_index()
        for col in ("rev", "cnt"):
            g[col] = g[col].astype(np.int64)
        return g

    return (ds.map_batches(ppart, batch_format="pandas")
              .groupby("per").aggregate(Sum("rev", alias_name="rev"),
                                        Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("per").reset_index(drop=True))


def _updown(x: np.ndarray) -> np.ndarray:
    """Sign sequence of consecutive changes: 1 if strictly up else -1
    (ties are down — matches the SQL `>` rule). Length len(x)-1."""
    return np.where(x[1:] > x[:-1], np.int64(1), np.int64(-1))


# ---------------------------------------------------------------------------
# DTW on hourly profiles
# ---------------------------------------------------------------------------


def q_dtw_hourly_profiles(sf_dir: str):
    """Integer DTW distance between hourly click/purchase profiles."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def hpart(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].dt.hour.to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        g = pd.DataFrame({"h": h,
                          "c": (et == "click").astype(np.int64),
                          "p": (et == "purchase").astype(np.int64)}) \
            .groupby("h", sort=False).sum().reset_index()
        for col in ("c", "p"):
            g[col] = g[col].astype(np.int64)
        return g

    prof = (ds.map_batches(hpart, batch_format="pandas")
              .groupby("h").aggregate(Sum("c", alias_name="c"),
                                      Sum("p", alias_name="p"))
              .to_pandas())
    x = np.zeros(24, np.int64)
    y = np.zeros(24, np.int64)
    x[prof["h"].to_numpy(np.int64)] = prof["c"].to_numpy(np.int64)
    y[prof["h"].to_numpy(np.int64)] = prof["p"].to_numpy(np.int64)
    d = np.zeros((24, 24), np.int64)
    for i in range(24):
        for j in range(24):
            c = abs(int(x[i]) - int(y[j]))
            if i == 0 and j == 0:
                d[i, j] = c
            elif i == 0:
                d[i, j] = c + d[i, j - 1]
            elif j == 0:
                d[i, j] = c + d[i - 1, j]
            else:
                d[i, j] = c + min(d[i - 1, j], d[i, j - 1],
                                  d[i - 1, j - 1])
    out = pd.DataFrame({"n_click": [int(x.sum())],
                        "n_purchase": [int(y.sum())],
                        "dtw_dist": [int(d[23, 23])]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_DTW_HOURLY = """
WITH RECURSIVE hp AS (
  SELECT CAST(hour(ts) AS BIGINT) AS h,
         sum((event_type = 'click')::INT)::BIGINT AS c,
         sum((event_type = 'purchase')::INT)::BIGINT AS p
  FROM events GROUP BY 1),
grid AS (
  SELECT g.h, coalesce(hp.c, 0) AS c, coalesce(hp.p, 0) AS p
  FROM (SELECT unnest(range(0, 24)) AS h) g LEFT JOIN hp USING (h)),
xs AS (
  SELECT list(c ORDER BY h) AS x, list(p ORDER BY h) AS y FROM grid),
dp AS (
  SELECT 0 AS idx, [abs(x[1] - y[1])] AS d FROM xs
  UNION ALL
  SELECT idx + 1,
         list_append(d,
           abs(x[(idx + 1) // 24 + 1] - y[(idx + 1) % 24 + 1])
           + CASE
               WHEN (idx + 1) // 24 = 0 THEN d[idx + 1]
               WHEN (idx + 1) % 24 = 0 THEN d[idx - 22]
               ELSE least(d[idx - 22], d[idx + 1], d[idx - 23])
             END)
  FROM dp CROSS JOIN xs WHERE idx < 575)
SELECT (SELECT sum(c)::BIGINT FROM grid) AS n_click,
       (SELECT sum(p)::BIGINT FROM grid) AS n_purchase,
       d[576]::BIGINT AS dtw_dist
FROM dp WHERE idx = 575
"""


# ---------------------------------------------------------------------------
# LCS on quarterly up/down sequences
# ---------------------------------------------------------------------------


def q_lcs_quarterly_updown(sf_dir: str):
    """LCS length between quarterly revenue and count sign sequences."""
    per = _order_period_series(sf_dir, months_per=3)
    a = _updown(per["rev"].to_numpy(np.int64))
    b = _updown(per["cnt"].to_numpy(np.int64))
    m, n = len(a), len(b)
    c = np.zeros((m, n), np.int64)
    for i in range(m):
        for j in range(n):
            if a[i] == b[j]:
                c[i, j] = (c[i - 1, j - 1] if i > 0 and j > 0 else 0) + 1
            else:
                up = c[i - 1, j] if i > 0 else 0
                lf = c[i, j - 1] if j > 0 else 0
                c[i, j] = max(up, lf)
    out = pd.DataFrame({"m": [m], "n": [n],
                        "lcs_len": [int(c[m - 1, n - 1])]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_LCS_QUARTERLY = """
WITH RECURSIVE q AS (
  SELECT year(o_orderdate) * 4 + (month(o_orderdate) - 1) // 3 AS per,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev,
         count(*)::BIGINT AS cnt
  FROM orders GROUP BY 1),
sg AS (
  SELECT per,
         CASE WHEN rev > lag(rev) OVER (ORDER BY per)
              THEN 1 ELSE -1 END AS ra,
         CASE WHEN cnt > lag(cnt) OVER (ORDER BY per)
              THEN 1 ELSE -1 END AS ca,
         row_number() OVER (ORDER BY per) AS rn
  FROM q),
xs AS (
  SELECT list(ra ORDER BY per) AS a, list(ca ORDER BY per) AS b,
         count(*)::BIGINT AS m, count(*)::BIGINT AS n
  FROM sg WHERE rn > 1),
dp AS (
  SELECT 0 AS idx,
         [CASE WHEN a[1] = b[1] THEN 1 ELSE 0 END] AS d
  FROM xs
  UNION ALL
  SELECT idx + 1,
         list_append(d,
           CASE WHEN a[(idx + 1) // n + 1] = b[(idx + 1) % n + 1]
                THEN (CASE WHEN (idx + 1) // n > 0 AND (idx + 1) % n > 0
                           THEN d[idx + 1 - n] ELSE 0 END) + 1
                ELSE greatest(
                  CASE WHEN (idx + 1) // n > 0
                       THEN d[idx + 2 - n] ELSE 0 END,
                  CASE WHEN (idx + 1) % n > 0
                       THEN d[idx + 1] ELSE 0 END)
           END)
  FROM dp CROSS JOIN xs WHERE idx < m * n - 1)
SELECT xs.m, xs.n, dp.d[xs.m * xs.n]::BIGINT AS lcs_len
FROM dp CROSS JOIN xs WHERE dp.idx = xs.m * xs.n - 1
"""


# ---------------------------------------------------------------------------
# Levenshtein on monthly up/down strings (independent built-in oracle)
# ---------------------------------------------------------------------------


def q_levenshtein_updown_monthly(sf_dir: str):
    """Edit distance between monthly revenue/count sign strings."""
    per = _order_period_series(sf_dir, months_per=1)
    a = _updown(per["rev"].to_numpy(np.int64))
    b = _updown(per["cnt"].to_numpy(np.int64))
    m, n = len(a), len(b)
    prev = np.arange(n + 1, dtype=np.int64)
    for i in range(1, m + 1):
        cur = np.empty(n + 1, np.int64)
        cur[0] = i
        for j in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + cost)
        prev = cur
    out = pd.DataFrame({"len_a": [m], "len_b": [n],
                        "edit_dist": [int(prev[n])]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_LEVENSHTEIN_MONTHLY = """
WITH m AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS per,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev,
         count(*)::BIGINT AS cnt
  FROM orders GROUP BY 1),
d AS (
  SELECT per,
         CASE WHEN rev > lag(rev) OVER (ORDER BY per)
              THEN 'u' ELSE 'd' END AS ra,
         CASE WHEN cnt > lag(cnt) OVER (ORDER BY per)
              THEN 'u' ELSE 'd' END AS ca,
         row_number() OVER (ORDER BY per) AS rn
  FROM m),
s AS (
  SELECT string_agg(ra, '' ORDER BY per) AS sa,
         string_agg(ca, '' ORDER BY per) AS sb
  FROM d WHERE rn > 1)
SELECT length(sa)::BIGINT AS len_a, length(sb)::BIGINT AS len_b,
       levenshtein(sa, sb)::BIGINT AS edit_dist
FROM s
"""


QUERIES122: dict[str, tuple] = {
    "dtw_hourly_profiles": (q_dtw_hourly_profiles, SQL_DTW_HOURLY),
    "lcs_quarterly_updown": (q_lcs_quarterly_updown, SQL_LCS_QUARTERLY),
    "levenshtein_updown_monthly": (q_levenshtein_updown_monthly,
                                   SQL_LEVENSHTEIN_MONTHLY),
}
