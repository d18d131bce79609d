"""One-hundred-third oracle-query batch — symbolic series / forecasting
methods:

- sax_words_daily: SAX symbolization of daily revenue with exact disc
  quartile breakpoints (symbol = # thresholds <= c, the >=-side
  convention) and 3-symbol words; top-5 words by exact counts
  (tie -> word).
- croston_intermittent: Croston's method (alpha = 1/2) on the
  intermittent demand of the HIGHEST-VOLUME part (tie -> smallest
  partkey): demand-size and inter-demand-interval EWMAs replayed
  step-for-step (init z = first size, p = 1.0 — documented); the
  float recursion is textually identical in the recursive-CTE
  oracle; forecast per period = z/p.
- theta_forecast_daily: a simplified Theta-method one-step forecast
  of daily revenue (1e5-cent units): theta(0) = the exact-moment OLS
  trend, theta(2) line d_t = 2 y_t - (a + b t) smoothed by SES
  (alpha = 1/2, init s = d_1) replayed identically; forecast =
  (trend at n + s_final)/2.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# SAX words
# ---------------------------------------------------------------------------


def q_sax_words_daily(sf_dir: str):
    """Top-5 3-symbol SAX words of daily revenue (docstring above)."""
    c = _daily_cents(sf_dir)["c"].to_numpy(np.int64)
    srt = np.sort(c)
    n = len(c)
    thr = np.array([int(srt[math.ceil(q / 100.0 * n) - 1])
                    for q in (25, 50, 75)], np.int64)
    sym = np.searchsorted(thr, c, side="right")
    words: dict[str, int] = {}
    for i in range(n - 2):
        w = f"{sym[i]}{sym[i + 1]}{sym[i + 2]}"
        words[w] = words.get(w, 0) + 1
    top = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    out = pd.DataFrame(top, columns=["word", "cnt"])
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


SQL_SAX = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
t AS (
  SELECT quantile_disc(c, 0.25) AS t1, quantile_disc(c, 0.5) AS t2,
         quantile_disc(c, 0.75) AS t3
  FROM daily),
s AS (
  SELECT ((c >= t1)::INT + (c >= t2)::INT + (c >= t3)::INT) AS sym,
         row_number() OVER (ORDER BY day) AS rn
  FROM daily CROSS JOIN t),
w AS (
  SELECT CAST(sym AS VARCHAR)
           || CAST(lead(sym, 1) OVER (ORDER BY rn) AS VARCHAR)
           || CAST(lead(sym, 2) OVER (ORDER BY rn) AS VARCHAR) AS word
  FROM s QUALIFY lead(sym, 2) OVER (ORDER BY rn) IS NOT NULL)
SELECT word, count(*)::BIGINT AS cnt
FROM w GROUP BY 1 ORDER BY cnt DESC, word LIMIT 5
"""


# ---------------------------------------------------------------------------
# Croston
# ---------------------------------------------------------------------------


def q_croston_intermittent(sf_dir: str):
    """Croston alpha=1/2 on the top-volume part's demand (docstring
    above)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_shipdate", "l_quantity"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["l_shipdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // _US_PER_DAY)
        q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)
                     + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "part": t["l_partkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "day": day, "q": q})
        g = df.groupby(["part", "day"], sort=False)["q"].sum() \
              .reset_index()
        g["q"] = g["q"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby(["part", "day"])
               .aggregate(Sum("q", alias_name="q"))
               .to_pandas())
    tot = cells.groupby("part")["q"].sum().reset_index()
    tot = tot.sort_values(["q", "part"], ascending=[False, True])
    best = int(tot["part"].iloc[0])
    dem = cells[cells["part"] == best].sort_values("day")
    days = [int(v) for v in dem["day"]]
    qs = [int(v) for v in dem["q"]]
    z = float(qs[0])
    p = 1.0
    for j in range(1, len(qs)):
        z = 0.5 * qs[j] + 0.5 * z
        p = 0.5 * (days[j] - days[j - 1]) + 0.5 * p
    fc = z / p
    out = pd.DataFrame({"part": [best], "n_demands": [len(qs)],
                        "q_total": [sum(qs)],
                        "z6": [_round6(np.array([z]))[0]],
                        "p6": [_round6(np.array([p]))[0]],
                        "forecast6": [_round6(np.array([fc]))[0]]})
    for col in ("part", "n_demands", "q_total"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CROSTON = f"""
WITH RECURSIVE cells AS MATERIALIZED (
  SELECT l_partkey AS part,
         CAST(epoch_us(l_shipdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS q
  FROM lineitem GROUP BY 1, 2),
best AS MATERIALIZED (
  SELECT part FROM (
    SELECT part, sum(q) AS tq FROM cells GROUP BY 1)
  ORDER BY tq DESC, part LIMIT 1),
dem AS MATERIALIZED (
  SELECT cells.day, cells.q,
         row_number() OVER (ORDER BY cells.day) AS t,
         lag(cells.day) OVER (ORDER BY cells.day) AS pday
  FROM cells JOIN best ON best.part = cells.part),
nd AS MATERIALIZED (SELECT count(*)::BIGINT AS k,
                           sum(q)::BIGINT AS qt
                    FROM dem),
r AS (
  SELECT 1::BIGINT AS t, q::DOUBLE AS z, 1.0::DOUBLE AS p
  FROM dem WHERE t = 1
  UNION ALL
  SELECT dem.t,
         0.5 * dem.q + 0.5 * r.z AS z,
         0.5 * (dem.day - dem.pday) + 0.5 * r.p AS p
  FROM r JOIN dem ON dem.t = r.t + 1)
SELECT (SELECT part FROM best)::BIGINT AS part,
       (SELECT k FROM nd) AS n_demands, (SELECT qt FROM nd) AS q_total,
       round(z, 6) AS z6, round(p, 6) AS p6,
       round(z / p, 6) AS forecast6
FROM r WHERE t = (SELECT k FROM nd)
"""


# ---------------------------------------------------------------------------
# Theta forecast
# ---------------------------------------------------------------------------


def q_theta_forecast_daily(sf_dir: str):
    """Simplified Theta one-step forecast (docstring above)."""
    c = _daily_cents(sf_dir)["c"].to_numpy(np.int64)
    y = (c // 100000).astype(object)
    n = len(y)
    t = list(range(n))
    st = sum(t)
    st2 = sum(v * v for v in t)
    sy = int(sum(y))
    sty = sum(a * int(b) for a, b in zip(t, y))
    a_den = n * st2 - st * st
    b_num = n * sty - st * sy
    b = float(b_num) / float(a_den)
    a = (float(sy) - b * float(st)) / float(n)
    s = 2.0 * float(int(y[0])) - (a + b * 0.0)
    for i in range(1, n):
        d = 2.0 * float(int(y[i])) - (a + b * float(i))
        s = 0.5 * d + 0.5 * s
    fc = ((a + b * float(n)) + s) / 2.0
    out = pd.DataFrame({"n_days": [n],
                        "a6": [_round6(np.array([a]))[0]],
                        "b6": [_round6(np.array([b]))[0]],
                        "ses6": [_round6(np.array([s]))[0]],
                        "forecast6": [_round6(np.array([fc]))[0]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_THETA = f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
seq AS MATERIALIZED (
  SELECT (c // 100000)::BIGINT AS y,
         row_number() OVER (ORDER BY day) - 1 AS t
  FROM daily),
mo AS MATERIALIZED (
  SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS st,
         sum(t * t)::BIGINT AS st2, sum(y)::BIGINT AS sy,
         sum(t * y)::BIGINT AS sty
  FROM seq),
ab AS MATERIALIZED (
  SELECT n,
         CAST(n::HUGEINT * sty - st::HUGEINT * sy AS DOUBLE)
           / CAST(n::HUGEINT * st2 - st::HUGEINT * st AS DOUBLE) AS b,
         (CAST(sy AS DOUBLE)
          - (CAST(n::HUGEINT * sty - st::HUGEINT * sy AS DOUBLE)
             / CAST(n::HUGEINT * st2 - st::HUGEINT * st AS DOUBLE))
            * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) AS a
  FROM mo),
r AS (
  SELECT 0::BIGINT AS t,
         2.0 * seq.y - (ab.a + ab.b * 0.0) AS s
  FROM seq CROSS JOIN ab WHERE seq.t = 0
  UNION ALL
  SELECT seq.t,
         0.5 * (2.0 * seq.y - (ab.a + ab.b * CAST(seq.t AS DOUBLE)))
           + 0.5 * r.s AS s
  FROM r JOIN seq ON seq.t = r.t + 1 CROSS JOIN ab)
SELECT (SELECT n FROM ab) AS n_days,
       round((SELECT a FROM ab), 6) AS a6,
       round((SELECT b FROM ab), 6) AS b6,
       round(s, 6) AS ses6,
       round((((SELECT a FROM ab)
               + (SELECT b FROM ab)
                 * CAST((SELECT n FROM ab) AS DOUBLE)) + s) / 2.0, 6)
         AS forecast6
FROM r WHERE t = (SELECT n FROM ab) - 1
"""


QUERIES103: dict[str, tuple] = {
    "sax_words_daily": (q_sax_words_daily, SQL_SAX),
    "croston_intermittent": (q_croston_intermittent, SQL_CROSTON),
    "theta_forecast_daily": (q_theta_forecast_daily, SQL_THETA),
}
