"""One-hundred-sixty-ninth oracle-query batch — the causal-inference /
convergence-diagnostic trio:

- iv_wald_weekend_clicks: the instrumental-variable Wald estimator at
  the daily grain — instrument Z = weekend, treatment X = daily click
  count, outcome Y = daily revenue cents. Per-arm sums stay exact
  integers (clicks, cents, day counts); the ratio-of-differences
  finalizes through one identical float expression. (A user-level
  binary treatment is degenerate here: every synthetic user
  purchases, so any-purchase gives a zero first stage — probed
  before wiring, per the degeneracy rule.)
- sobel_mediation_daily: the Baron–Kenny product-of-coefficients
  mediation test on daily series X = clicks → M = views → Y =
  revenue cents. Path a from the simple OLS, path b from the
  two-regressor OLS via 2×2 normal equations with HUGEINT-cleared
  centered sums (Cxx = nΣx² − (Σx)², …); residual variances and the
  Sobel SE sqrt(b²·Var(a) + a²·Var(b)) finalize identically.
- gelman_rubin_chains: the R-hat convergence diagnostic treating the
  four user_id%4 groups as chains and their 30 daily mean values as
  draws. Every chain-day cell is quantized ONCE to integer
  micro-cents (ratio-of-ints rounded half-away), then both the
  within-chain variance numerators and the between-chain
  (m·T_j − G)² sum are pure integers (Python int / HUGEINT — the
  squares exceed 2^63); W, B and R-hat finalize identically.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _daily_xmy(sf_dir: str) -> pd.DataFrame:
    """Distributed per-day exact (clicks, views, revenue-cents) over
    events; 30 rows reach the driver."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type", "value"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"day": day,
                          "x": (et == "click").astype(np.int64),
                          "m": (et == "view").astype(np.int64),
                          "y": c}) \
            .groupby("day", sort=False).sum().reset_index()
        for col in ("x", "m", "y"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(dpart, batch_format="pyarrow")
              .groupby("day").aggregate(Sum("x", alias_name="x"),
                                        Sum("m", alias_name="m"),
                                        Sum("y", alias_name="y"))
              .to_pandas().sort_values("day").reset_index(drop=True))


# ---------------------------------------------------------------------------
# IV / Wald
# ---------------------------------------------------------------------------


def q_iv_wald_weekend_clicks(sf_dir: str):
    """Daily-grain Wald IV estimator (docstring above)."""
    dly = _daily_xmy(sf_dir)
    # day int64 from floor_temporal is epoch-days scaled in the ts
    # unit; recover the weekday via pandas on the epoch value
    days = pd.to_datetime(dly["day"].to_numpy(np.int64), unit="us")
    z = np.asarray(days.dayofweek >= 5)
    n1, n0 = int(z.sum()), int((~z).sum())
    sx1 = int(dly["x"].to_numpy(np.int64)[z].sum())
    sx0 = int(dly["x"].to_numpy(np.int64)[~z].sum())
    sy1 = int(dly["y"].to_numpy(np.int64)[z].sum())
    sy0 = int(dly["y"].to_numpy(np.int64)[~z].sum())
    fs = float(sx1) / n1 - float(sx0) / n0
    rf = float(sy1) / n1 - float(sy0) / n0
    wald = rf / fs
    r6 = _round6(np.array([fs, rf, wald]))
    out = pd.DataFrame({"n_weekend": [n1], "n_weekday": [n0],
                        "first_stage6": [r6[0]],
                        "reduced_form6": [r6[1]], "wald6": [r6[2]]})
    for col in ("n_weekend", "n_weekday"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_IV_WALD = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         (isodow(CAST(ts AS DATE)) >= 6)::INT AS z,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1, 2),
arms AS (
  SELECT z, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy
  FROM dly GROUP BY z),
w AS (
  SELECT max(CASE WHEN z = 1 THEN n END) AS n1,
         max(CASE WHEN z = 0 THEN n END) AS n0,
         max(CASE WHEN z = 1 THEN sx END) AS sx1,
         max(CASE WHEN z = 0 THEN sx END) AS sx0,
         max(CASE WHEN z = 1 THEN sy END) AS sy1,
         max(CASE WHEN z = 0 THEN sy END) AS sy0
  FROM arms),
f AS (
  SELECT n1, n0,
         CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0 AS fs,
         CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0 AS rf
  FROM w)
SELECT n1::BIGINT AS n_weekend, n0::BIGINT AS n_weekday,
       round(fs, 6) AS first_stage6, round(rf, 6) AS reduced_form6,
       round(rf / fs, 6) AS wald6
FROM f
"""


# ---------------------------------------------------------------------------
# Sobel mediation
# ---------------------------------------------------------------------------


def q_sobel_mediation_daily(sf_dir: str):
    """Baron–Kenny a·b with Sobel SE on daily X→M→Y (docstring)."""
    dly = _daily_xmy(sf_dir)
    n = len(dly)
    x = [int(v) for v in dly["x"]]
    m = [int(v) for v in dly["m"]]
    y = [int(v) for v in dly["y"]]
    sx, sm, sy = sum(x), sum(m), sum(y)
    sxx = sum(v * v for v in x)
    smm = sum(v * v for v in m)
    syy = sum(v * v for v in y)
    sxm = sum(a * b for a, b in zip(x, m))
    sxy = sum(a * b for a, b in zip(x, y))
    smy = sum(a * b for a, b in zip(m, y))
    cxx = n * sxx - sx * sx
    cmm = n * smm - sm * sm
    cyy = n * syy - sy * sy
    cxm = n * sxm - sx * sm
    cxy = n * sxy - sx * sy
    cmy = n * smy - sm * sy
    a = float(cxm) / float(cxx)
    rss1 = (float(cmm) - a * float(cxm)) / n
    s1sq = rss1 / (n - 2)
    var_a = s1sq * n / float(cxx)
    det = cxx * cmm - cxm * cxm
    b = float(cxx * cmy - cxm * cxy) / float(det)
    bx = float(cmm * cxy - cxm * cmy) / float(det)
    rss2 = (float(cyy) - bx * float(cxy) - b * float(cmy)) / n
    s2sq = rss2 / (n - 3)
    var_b = s2sq * n * float(cxx) / float(det)
    ab = a * b
    se = math.sqrt(b * b * var_a + a * a * var_b)
    r6 = _round6(np.array([a, b, ab, ab / se]))
    out = pd.DataFrame({"n_days": [n], "a6": [r6[0]], "b6": [r6[1]],
                        "indirect6": [r6[2]], "sobel_z6": [r6[3]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_SOBEL = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'view')::INT)::BIGINT AS m,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
s AS (
  SELECT count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(m)::BIGINT AS sm,
         sum(y)::BIGINT AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(m AS HUGEINT) * m) AS smm,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(x AS HUGEINT) * m) AS sxm,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(m AS HUGEINT) * y) AS smy
  FROM dly),
c AS (
  SELECT n,
         n * sxx - CAST(sx AS HUGEINT) * sx AS cxx,
         n * smm - CAST(sm AS HUGEINT) * sm AS cmm,
         n * syy - CAST(sy AS HUGEINT) * sy AS cyy,
         n * sxm - CAST(sx AS HUGEINT) * sm AS cxm,
         n * sxy - CAST(sx AS HUGEINT) * sy AS cxy,
         n * smy - CAST(sm AS HUGEINT) * sy AS cmy
  FROM s),
f1 AS (
  SELECT n, cxx, cmm, cyy, cxm, cxy, cmy,
         CAST(cxm AS DOUBLE) / CAST(cxx AS DOUBLE) AS a,
         cxx * cmm - cxm * cxm AS det
  FROM c),
f2 AS (
  SELECT n, cxx, cxy, cmy, cyy, a, det,
         (CAST(cmm AS DOUBLE) - a * CAST(cxm AS DOUBLE)) / n AS rss1,
         CAST(cxx * cmy - cxm * cxy AS DOUBLE)
           / CAST(det AS DOUBLE) AS b,
         CAST(cmm * cxy - cxm * cmy AS DOUBLE)
           / CAST(det AS DOUBLE) AS bx
  FROM f1),
f3 AS (
  SELECT n, a, b,
         rss1 / (n - 2) * n / CAST(cxx AS DOUBLE) AS var_a,
         (CAST(cyy AS DOUBLE) - bx * CAST(cxy AS DOUBLE)
          - b * CAST(cmy AS DOUBLE)) / n / (n - 3) * n
           * CAST(cxx AS DOUBLE) / CAST(det AS DOUBLE) AS var_b
  FROM f2)
SELECT n AS n_days, round(a, 6) AS a6, round(b, 6) AS b6,
       round(a * b, 6) AS indirect6,
       round(a * b / sqrt(b * b * var_a + a * a * var_b), 6)
         AS sobel_z6
FROM f3
"""


# ---------------------------------------------------------------------------
# Gelman-Rubin R-hat
# ---------------------------------------------------------------------------


def q_gelman_rubin_chains(sf_dir: str):
    """R-hat over user_id%4 chains of daily mean values (docstring)."""
    ds = _pq(sf_dir, "events", columns=["ts", "user_id", "value"])

    def cpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"ch": u % 4, "day": day, "sc": c,
                          "cnt": np.int64(1)}) \
            .groupby(["ch", "day"], sort=False).sum().reset_index()
        for col in ("sc", "cnt"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["ch", "day"])
               .aggregate(Sum("sc", alias_name="sc"),
                          Sum("cnt", alias_name="cnt"))
               .to_pandas().sort_values(["ch", "day"])
               .reset_index(drop=True))
    sc = cells["sc"].to_numpy(np.int64).astype(np.float64)
    cnt = cells["cnt"].to_numpy(np.int64).astype(np.float64)
    qv = 1e6 * sc / cnt
    q = (np.sign(qv) * np.floor(np.abs(qv) + 0.5)).astype(np.int64)
    cells["q"] = q
    m = int(cells["ch"].nunique())
    n = None
    s_w = 0
    tj = []
    for _, grp in cells.groupby("ch", sort=True):
        vals = [int(v) for v in grp["q"]]
        if n is None:
            n = len(vals)
        assert len(vals) == n
        t = sum(vals)
        s_w += n * sum(v * v for v in vals) - t * t
        tj.append(t)
    g_tot = sum(tj)
    s_b = sum((m * t - g_tot) ** 2 for t in tj)
    w = float(s_w) / (m * n * (n - 1))
    b_over_n = float(s_b) / ((m - 1) * m * m * n * n)
    var_plus = (n - 1) / float(n) * w + b_over_n
    rhat = math.sqrt(var_plus / w)
    out = pd.DataFrame({"m_chains": [m], "n_days": [n],
                        "rhat6": [_round6(np.array([rhat]))[0]]})
    for col in ("m_chains", "n_days"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GELMAN_RUBIN = """
WITH cells AS (
  SELECT user_id % 4 AS ch, CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sc,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
qc AS (
  SELECT ch, day,
         CAST(round(1e6 * sc / cnt) AS BIGINT) AS q
  FROM cells),
per AS (
  SELECT ch, count(*)::BIGINT AS n, sum(CAST(q AS HUGEINT)) AS t,
         sum(CAST(q AS HUGEINT) * q) AS qq
  FROM qc GROUP BY ch),
dims AS (
  SELECT count(*)::BIGINT AS m, max(n)::BIGINT AS n,
         sum(n * qq - t * t) AS s_w, sum(t) AS g
  FROM per),
sb AS (
  SELECT (SELECT sum((d.m * p.t - d.g) * (d.m * p.t - d.g))
          FROM per p) AS s_b, m, n, s_w
  FROM dims d),
f AS (
  SELECT m, n,
         CAST(s_w AS DOUBLE) / (m * n * (n - 1)) AS w,
         CAST(s_b AS DOUBLE) / ((m - 1) * m * m * n * n) AS bn
  FROM sb)
SELECT m AS m_chains, n AS n_days,
       round(sqrt((CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE) * w
                   + bn) / w), 6) AS rhat6
FROM f
"""


QUERIES169: dict[str, tuple] = {
    "iv_wald_weekend_clicks": (q_iv_wald_weekend_clicks, SQL_IV_WALD),
    "sobel_mediation_daily": (q_sobel_mediation_daily, SQL_SOBEL),
    "gelman_rubin_chains": (q_gelman_rubin_chains, SQL_GELMAN_RUBIN),
}
