"""Forty-fourth oracle-query batch — risk analytics / Markov limits /
extreme-value statistics:

- max_drawdown_daily: maximum drawdown (largest peak-to-trough fall)
  of the cumulative daily NET FLOW (purchase value minus error value —
  a signed series; raw value sums are all-positive and monotone, so
  their drawdown is identically zero) — the canonical risk scan.
  Daily sums are exact integer cents on one O(days) cell shuffle; the
  drawdown is an ALL-INTEGER running-max walk (max_t [max_{s≤t}P_s −
  P_t]), with peak/trough days reported (earliest-peak/earliest-trough
  tie rule encoded identically in the SQL window mirror).
- markov_stationary: stationary distribution of the event-type Markov
  chain by 32 power-iteration steps in INTEGER FIXED-POINT — the
  pagerank discipline applied to the transition matrix: transition
  counts are exact (user-co-partitioned chains, one shuffle), the
  iterate lives in 1e-12 units, and each step's mass transfer is
  u(a)·C[a,b] // rowsum(a) — floor division, bit-exact on both sides,
  NO float ever enters the recurrence. SQL replays the 32 steps as
  chained 5-row CTEs generated alongside the Python loop.
- gumbel_weekly_maxima: Gumbel fit of weekly block maxima of daily
  event counts per type (method of moments: β = σ√6/π,
  μ = mean − γβ, with π and Euler-γ as identical literal constants
  both sides). Block maxima are exact ints over the dense day grid
  (missing days count zero); moments are exact; β/μ finalize as one
  identical float expression round6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries24 import _daily_cells

_P = 64
_MK_ITERS = 32
_MK_SCALE = 10**9   # u*c stays well under int64 even at sf1
_US_PER_DAY = 86_400_000_000
_PI = 3.141592653589793
_EULER_GAMMA = 0.5772156649015329


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# maximum drawdown
# ---------------------------------------------------------------------------


def q_max_drawdown_daily(sf_dir: str):
    """All-integer maximum drawdown of cumulative daily value
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type", "value"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        sign = np.where(et == "purchase", 1,
                        np.where(et == "error", -1, 0)).astype(np.int64)
        df = pd.DataFrame({"day_idx": day, "s": sign * c})
        g = df.groupby("day_idx", sort=False)["s"].sum().reset_index()
        g["s"] = g["s"].astype(np.int64)
        return _strip(g)

    dc = (ds.map_batches(dpart, batch_format="pyarrow")
            .groupby("day_idx").aggregate(Sum("s", alias_name="s"))
            .to_pandas().sort_values("day_idx").reset_index(drop=True))
    lo, hi = int(dc["day_idx"].min()), int(dc["day_idx"].max())
    y = np.zeros(hi - lo + 1, np.int64)
    y[dc["day_idx"].to_numpy(np.int64) - lo] = dc["s"].to_numpy(np.int64)
    p = np.cumsum(y)
    runmax = np.maximum.accumulate(p)
    dd = runmax - p
    best = int(dd.max())
    # earliest trough with the max drawdown; its peak = earliest day
    # attaining that running max
    ti = int(np.argmax(dd))
    pi_ = int(np.argmax(p >= runmax[ti]))
    out = pd.DataFrame({
        "n_days": [len(y)], "final_cum": [int(p[-1])],
        "max_drawdown": [best],
        "peak_day": [lo + pi_], "trough_day": [lo + ti],
        "peak_cum": [int(p[pi_])], "trough_cum": [int(p[ti])]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_DRAWDOWN = f"""
WITH dc AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
         sum((CASE WHEN event_type = 'purchase' THEN 1
                   WHEN event_type = 'error' THEN -1 ELSE 0 END)
             * CAST(round(value * 100) AS BIGINT))::BIGINT AS s
  FROM events GROUP BY 1),
bounds AS (SELECT min(day_idx) AS lo, max(day_idx) AS hi FROM dc),
cal AS (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM bounds),
y AS (
  SELECT cal.day_idx, coalesce(dc.s, 0)::BIGINT AS s
  FROM cal LEFT JOIN dc ON dc.day_idx = cal.day_idx),
c AS (
  SELECT day_idx,
         sum(s) OVER (ORDER BY day_idx)::BIGINT AS p
  FROM y),
r AS (
  SELECT day_idx, p,
         max(p) OVER (ORDER BY day_idx)::BIGINT AS runmax
  FROM c),
dd AS (SELECT day_idx, p, runmax, (runmax - p)::BIGINT AS d FROM r),
best AS (SELECT max(d)::BIGINT AS mx FROM dd),
trough AS (
  SELECT min(day_idx)::BIGINT AS tday FROM dd, best WHERE d = best.mx),
tr AS (
  SELECT dd.day_idx, dd.p, dd.runmax FROM dd, trough
  WHERE dd.day_idx = trough.tday),
peak AS (
  SELECT min(dd.day_idx)::BIGINT AS pday FROM dd, tr
  WHERE dd.p >= tr.runmax),
stats AS (
  SELECT count(*)::BIGINT AS n_days,
         (SELECT p FROM dd ORDER BY day_idx DESC LIMIT 1)::BIGINT
           AS final_cum
  FROM dd)
SELECT stats.n_days, stats.final_cum, best.mx AS max_drawdown,
       peak.pday AS peak_day, trough.tday AS trough_day,
       (SELECT p FROM dd WHERE day_idx = peak.pday)::BIGINT AS peak_cum,
       tr.p AS trough_cum
FROM stats, best, trough, tr, peak
"""


# ---------------------------------------------------------------------------
# Markov stationary distribution
# ---------------------------------------------------------------------------


def q_markov_stationary(sf_dir: str):
    """Stationary distribution by integer fixed-point power iteration
    (docstring above)."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type", "ts",
                                "event_id"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % _P) \
            .astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        pairs = pd.DataFrame({"a": et[:-1][same], "b": et[1:][same]})
        g = pairs.groupby(["a", "b"], sort=False) \
                 .size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return g

    tm = (ds.map_batches(with_key, batch_format="pyarrow")
            .groupby("gkey").map_groups(transitions,
                                        batch_format="pandas")
            .groupby(["a", "b"]).aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    rowsum = tm.groupby("a")["c"].sum()
    types = np.sort(pd.concat([tm["a"], tm["b"]]).unique())
    k = len(types)
    u = {t: _MK_SCALE // k for t in types}
    cmap = {(a, b): int(c) for a, b, c in zip(tm["a"], tm["b"], tm["c"])}
    rmap = {a: int(v) for a, v in rowsum.items()}
    for _ in range(_MK_ITERS):
        nxt = {t: 0 for t in types}
        for (a, b), c in cmap.items():
            nxt[b] += u[a] * c // rmap[a]
        u = nxt
    total = sum(u.values())
    rows = [(t, u[t]) for t in types]
    out = pd.DataFrame(rows, columns=["event_type", "stat_units"])
    out["stat_units"] = out["stat_units"].astype(np.int64)
    out["p6"] = _round6(out["stat_units"].to_numpy(np.float64)
                        / float(total))
    out["total_units"] = np.int64(total)
    return out.sort_values("event_type").reset_index(drop=True)


def _markov_sql() -> str:
    ctes = [
        """o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events)""",
        """tm AS MATERIALIZED (
  SELECT event_type AS a, nxt AS b, count(*)::BIGINT AS c
  FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2)""",
        "rs AS MATERIALIZED (SELECT a, sum(c)::BIGINT AS r FROM tm GROUP BY 1)",
        """ty AS MATERIALIZED (
  SELECT a AS t FROM tm UNION SELECT b FROM tm)""",
        "kk AS (SELECT count(*)::BIGINT AS k FROM ty)",
        f"s0 AS MATERIALIZED (SELECT t, ({_MK_SCALE} // kk.k)::BIGINT AS u "
        f"FROM ty, kk)",
    ]
    prev = "s0"
    for i in range(1, _MK_ITERS + 1):
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT ty.t, coalesce(m.u, 0)::BIGINT AS u "
            f"FROM ty LEFT JOIN "
            f"(SELECT tm.b AS t, sum(p.u * tm.c // rs.r)::BIGINT AS u "
            f"FROM {prev} p JOIN tm ON tm.a = p.t "
            f"JOIN rs ON rs.a = p.t GROUP BY 1) m ON m.t = ty.t)")
        prev = f"s{i}"
    return (
        "WITH " + ",\n".join(ctes) + f""",
tot AS (SELECT sum(u)::BIGINT AS total FROM {prev})
SELECT p.t AS event_type, p.u AS stat_units,
       round(CAST(p.u AS DOUBLE) / CAST(tot.total AS DOUBLE), 6) AS p6,
       tot.total AS total_units
FROM {prev} p CROSS JOIN tot
ORDER BY p.t
""")


SQL_MARKOV = _markov_sql()


# ---------------------------------------------------------------------------
# Gumbel block maxima
# ---------------------------------------------------------------------------


def q_gumbel_weekly_maxima(sf_dir: str):
    """Method-of-moments Gumbel fit of weekly maxima per type
    (docstring above)."""
    mat, types = _daily_cells(sf_dir)
    n_days = mat.shape[0]
    n_weeks = n_days // 7
    if n_weeks < 2:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "n_weeks": pd.Series([], dtype=np.int64),
                             "s": pd.Series([], dtype=np.int64),
                             "s2": pd.Series([], dtype=np.int64),
                             "beta6": pd.Series([], dtype=np.float64),
                             "mu6": pd.Series([], dtype=np.float64)})
    wk = mat[:n_weeks * 7].reshape(n_weeks, 7, -1).max(axis=1) \
        .astype(np.int64)
    s = wk.sum(0)
    s2 = (wk * wk).sum(0)
    nf = float(n_weeks)
    mean = s.astype(np.float64) / nf
    var = (s2.astype(np.float64) - mean * s.astype(np.float64)) / nf
    beta = np.sqrt(var) * np.sqrt(6.0) / _PI
    mu = mean - _EULER_GAMMA * beta
    out = pd.DataFrame({"event_type": types,
                        "n_weeks": np.full(len(types), n_weeks, np.int64),
                        "s": s, "s2": s2,
                        "beta6": _round6(beta), "mu6": _round6(mu)})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_GUMBEL = f"""
WITH d AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
         event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
span AS (SELECT min(day_idx) AS d0, max(day_idx) AS d1 FROM d),
grid AS (
  SELECT gd.day_idx, ty.event_type
  FROM (SELECT unnest(generate_series(d0, d1)) AS day_idx FROM span) gd
  CROSS JOIN (SELECT DISTINCT event_type FROM d) ty),
g AS (
  SELECT grid.day_idx, grid.event_type, coalesce(d.n, 0)::BIGINT AS n,
         (grid.day_idx - span.d0) // 7 AS week,
         (span.d1 - span.d0 + 1) // 7 AS n_weeks
  FROM grid LEFT JOIN d USING (day_idx, event_type) CROSS JOIN span),
wk AS (
  SELECT event_type, week, max(n)::BIGINT AS mx,
         any_value(n_weeks) AS n_weeks
  FROM g WHERE week < n_weeks GROUP BY 1, 2),
mo AS (
  SELECT event_type, count(*)::BIGINT AS n_weeks,
         sum(mx)::BIGINT AS s, sum(mx * mx)::BIGINT AS s2
  FROM wk GROUP BY 1),
f AS (
  SELECT event_type, n_weeks, s, s2,
         CAST(s AS DOUBLE) / CAST(n_weeks AS DOUBLE) AS mean,
         (CAST(s2 AS DOUBLE)
          - (CAST(s AS DOUBLE) / CAST(n_weeks AS DOUBLE))
            * CAST(s AS DOUBLE)) / CAST(n_weeks AS DOUBLE) AS var
  FROM mo)
SELECT event_type, n_weeks, s, s2,
       round(sqrt(var) * sqrt(6.0) / {_PI!r}, 6) AS beta6,
       round(mean - {_EULER_GAMMA!r} * (sqrt(var) * sqrt(6.0)
                                        / {_PI!r}), 6) AS mu6
FROM f ORDER BY event_type
"""


QUERIES44: dict[str, tuple] = {
    "max_drawdown_daily": (q_max_drawdown_daily, SQL_DRAWDOWN),
    "markov_stationary": (q_markov_stationary, SQL_MARKOV),
    "gumbel_weekly_maxima": (q_gumbel_weekly_maxima, SQL_GUMBEL),
}
