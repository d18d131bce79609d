"""One-hundred-eleventh oracle-query batch — queueing theory on the
event stream, with exact-integer measured rates:

- mm1_event_queue: M/M/1 steady-state metrics treating purchases as
  jobs and all other events as unit service completions: rho = n_jobs
  / n_cap is a ratio of exact counts; L, Lq, W, Wq finalize through
  IDENTICAL float expressions of (n_jobs, n_cap, span_s) on both
  sides.
- erlang_b_hourly: Erlang-B blocking probability at c=4 trunks per
  hour-of-day, offered load a_h = clicks_h / views_h (exact integer
  counts); the standard recursion B_k = a*B/(k + a*B) is replayed
  step-for-step in a recursive CTE with the same IEEE ops order as
  the Python loop.
- erlang_c_dow: Erlang-C delay probability and mean wait (in service
  units) at c=6 agents per epoch-day-of-week, same recursion + the
  C = B*c/(c - a*(1-B)) finalization written identically both sides.

All counts stay int64; every float is a deterministic expression of
exact integers (repo float rule), rounded with half-away-from-zero
_round6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq, _ts_minmax_us
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _erlang_b(a: float, c: int) -> float:
    """B_c via the standard recursion — ops order mirrored in SQL."""
    b = 1.0
    for k in range(1, c + 1):
        b = a * b / (float(k) + a * b)
    return b


# ---------------------------------------------------------------------------
# M/M/1 from measured rates
# ---------------------------------------------------------------------------


def q_mm1_event_queue(sf_dir: str):
    """M/M/1 metrics from exact event counts (docstring above)."""
    mn, mx = _ts_minmax_us(sf_dir, "events")
    span = (mx - mn) // 1_000_000

    ds = _pq(sf_dir, "events", columns=["event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        j = int((et == "purchase").sum())
        return _strip(pd.DataFrame(
            {"jobs": [np.int64(j)], "cap": [np.int64(len(et) - j)]}))

    agg = (ds.map_batches(cpart, batch_format="pyarrow")
             .aggregate(Sum("jobs", alias_name="jobs"),
                        Sum("cap", alias_name="cap")))
    nj, nc = int(agg["jobs"]), int(agg["cap"])
    rho = float(nj) / float(nc)
    el = rho / (1.0 - rho)
    elq = rho * rho / (1.0 - rho)
    w = el * (float(span) / float(nj))
    wq = elq * (float(span) / float(nj))
    out = pd.DataFrame({
        "n_jobs": [nj], "n_cap": [nc], "span_s": [span],
        "rho6": [_round6(np.array([rho]))[0]],
        "l6": [_round6(np.array([el]))[0]],
        "lq6": [_round6(np.array([elq]))[0]],
        "w6": [_round6(np.array([w]))[0]],
        "wq6": [_round6(np.array([wq]))[0]]})
    for col in ("n_jobs", "n_cap", "span_s"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MM1 = """
WITH c AS (
  SELECT sum((event_type = 'purchase')::INT)::BIGINT AS nj,
         sum((event_type <> 'purchase')::INT)::BIGINT AS nc,
         (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS span
  FROM events),
f AS (
  SELECT nj, nc, span,
         CAST(nj AS DOUBLE) / CAST(nc AS DOUBLE) AS rho
  FROM c),
g AS (
  SELECT nj, nc, span, rho,
         rho / (1.0 - rho) AS el,
         rho * rho / (1.0 - rho) AS elq
  FROM f)
SELECT nj AS n_jobs, nc AS n_cap, span AS span_s,
       round(rho, 6) AS rho6,
       round(el, 6) AS l6,
       round(elq, 6) AS lq6,
       round(el * (CAST(span AS DOUBLE) / CAST(nj AS DOUBLE)), 6) AS w6,
       round(elq * (CAST(span AS DOUBLE) / CAST(nj AS DOUBLE)), 6) AS wq6
FROM g
"""


# ---------------------------------------------------------------------------
# shared hour / dow click-view histograms
# ---------------------------------------------------------------------------


def _click_view_hist(sf_dir: str, expr: str) -> pd.DataFrame:
    """Per-bin exact (clicks, views) counts; expr in {'hour', 'dow'}."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def gpart(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if expr == "hour":
            b = ((us // 1_000_000) % 86400) // 3600
        else:
            b = (us // 86_400_000_000) % 7
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "view")
        df = pd.DataFrame({
            "b": b[keep].astype(np.int64),
            "c": (et[keep] == "click").astype(np.int64),
            "v": (et[keep] == "view").astype(np.int64)})
        g = df.groupby("b", sort=False).sum().reset_index()
        for col in ("c", "v"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(gpart, batch_format="pyarrow")
              .groupby("b").aggregate(Sum("c", alias_name="c"),
                                      Sum("v", alias_name="v"))
              .to_pandas().sort_values("b").reset_index(drop=True))


# ---------------------------------------------------------------------------
# Erlang B per hour-of-day
# ---------------------------------------------------------------------------


def q_erlang_b_hourly(sf_dir: str):
    """Erlang-B blocking at c=4 per hour (docstring above)."""
    hist = _click_view_hist(sf_dir, "hour")
    rows = []
    for _, r in hist.iterrows():
        c, v = int(r["c"]), int(r["v"])
        assert v > 0, "degenerate hour: no views"
        a = float(c) / float(v)
        b4 = _erlang_b(a, 4)
        rows.append((int(r["b"]), c, v,
                     _round6(np.array([a]))[0],
                     _round6(np.array([b4]))[0]))
    out = pd.DataFrame(rows, columns=["hour", "clicks", "views",
                                      "a6", "block6"])
    for col in ("hour", "clicks", "views"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ERLANG_B = """
WITH RECURSIVE loads AS (
  SELECT ((epoch_us(ts) // 1000000) % 86400) // 3600 AS hour,
         sum((event_type = 'click')::INT)::BIGINT AS clicks,
         sum((event_type = 'view')::INT)::BIGINT AS views
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
a AS (
  SELECT hour, clicks, views,
         CAST(clicks AS DOUBLE) / CAST(views AS DOUBLE) AS a
  FROM loads),
eb AS (
  SELECT hour, a, 0 AS k, CAST(1.0 AS DOUBLE) AS b FROM a
  UNION ALL
  SELECT hour, a, k + 1,
         a * b / (CAST(k + 1 AS DOUBLE) + a * b)
  FROM eb WHERE k < 4)
SELECT l.hour, l.clicks, l.views,
       round(e.a, 6) AS a6, round(e.b, 6) AS block6
FROM eb e JOIN a l USING (hour)
WHERE e.k = 4 ORDER BY l.hour
"""


# ---------------------------------------------------------------------------
# Erlang C per day-of-week
# ---------------------------------------------------------------------------


def q_erlang_c_dow(sf_dir: str):
    """Erlang-C delay prob + mean wait at c=6 per epoch-dow
    (docstring above)."""
    hist = _click_view_hist(sf_dir, "dow")
    rows = []
    for _, r in hist.iterrows():
        c, v = int(r["c"]), int(r["v"])
        assert v > 0, "degenerate dow: no views"
        a = float(c) / float(v)
        assert a < 6.0, "offered load exceeds agent count"
        b6 = _erlang_b(a, 6)
        cw = b6 * 6.0 / (6.0 - a * (1.0 - b6))
        asa = cw / (6.0 - a)
        rows.append((int(r["b"]), c, v,
                     _round6(np.array([cw]))[0],
                     _round6(np.array([asa]))[0]))
    out = pd.DataFrame(rows, columns=["dow", "clicks", "views",
                                      "cwait6", "asa6"])
    for col in ("dow", "clicks", "views"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ERLANG_C = """
WITH RECURSIVE loads AS (
  SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
         sum((event_type = 'click')::INT)::BIGINT AS clicks,
         sum((event_type = 'view')::INT)::BIGINT AS views
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
a AS (
  SELECT dow, clicks, views,
         CAST(clicks AS DOUBLE) / CAST(views AS DOUBLE) AS a
  FROM loads),
eb AS (
  SELECT dow, a, 0 AS k, CAST(1.0 AS DOUBLE) AS b FROM a
  UNION ALL
  SELECT dow, a, k + 1,
         a * b / (CAST(k + 1 AS DOUBLE) + a * b)
  FROM eb WHERE k < 6),
cw AS (
  SELECT e.dow, l.clicks, l.views, e.a,
         e.b * 6.0 / (6.0 - e.a * (1.0 - e.b)) AS c_wait
  FROM eb e JOIN a l USING (dow)
  WHERE e.k = 6)
SELECT dow, clicks, views,
       round(c_wait, 6) AS cwait6,
       round(c_wait / (6.0 - a), 6) AS asa6
FROM cw ORDER BY dow
"""


QUERIES111: dict[str, tuple] = {
    "mm1_event_queue": (q_mm1_event_queue, SQL_MM1),
    "erlang_b_hourly": (q_erlang_b_hourly, SQL_ERLANG_B),
    "erlang_c_dow": (q_erlang_c_dow, SQL_ERLANG_C),
}
