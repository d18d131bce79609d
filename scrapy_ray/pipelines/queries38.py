"""Thirty-eighth oracle-query batch — classical-statistics / time-series
model fitting / corpus-law diagnostics:

- anova_value_by_type: one-way ANOVA F-test of value across event types.
  Per-group (n, Σc, Σc²) are exact integer-cents partials (one O(types)
  cell shuffle); the only order-sensitive float — each group's S²/n
  between-group term — is quantized to 1e-2 cents² units per group and
  integer-summed (never-sum-floats rule), so SSB/SSW/F finalize as one
  identical float expression of five integers both sides.
- ar2_yule_walker_daily: AR(2) fit per event type over the dense daily
  count series (missing days zero). The biased autocovariance numerators
  n²·A_k = n²·Σx_t·x_{t+k} − n·S·(H_k + T_k) + (n−k)·S² (k = 0, 1, 2)
  are EXACT int64 from lagged pair moments (H/T = head/tail sums), so
  r1, r2 and the Yule–Walker solution φ1 = r1(1−r2)/(1−r1²),
  φ2 = (r2−r1²)/(1−r1²) finalize identical-expression round6. Only the
  O(days × types) cell shuffle is distributed (`_daily_cells`).
- zipf_slope_words: Zipf's-law diagnostic — OLS slope of ln(count) on
  ln(rank) over the EXACT top-K vocabulary (count desc, word asc; the
  pmi top-K machinery). Per-rank ln terms (x, y, xy, x²) are quantized
  to 1e-9 units and integer-summed; each sum stays < 2^53 so the
  back-to-float cast is exact, and slope/intercept finalize as one
  identical float expression both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries24 import _daily_cells

_ANOVA_SCALE = 100          # 1e-2 cents² units for the S²/n group terms
_ZIPF_K = 64                # exact top-K vocabulary
_ZIPF_SCALE = 10**9         # 1e-9 units for the per-rank ln terms


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# one-way ANOVA
# ---------------------------------------------------------------------------


def q_anova_value_by_type(sf_dir: str):
    """One-way ANOVA F-test of value cents across event types
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def cpart(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": np.asarray(t["event_type"].to_pylist(),
                                     dtype=object),
            "n": np.int64(1), "s": c, "s2": c * c})
        g = df.groupby("event_type", sort=False).sum().reset_index()
        for col in ("n", "s", "s2"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    g = (ds.map_batches(cpart, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                      Sum("s2", alias_name="s2"))
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    # per-group between term S²/n, quantized (one fixed float expression)
    term = (s.astype(np.float64) * s.astype(np.float64)
            / n.astype(np.float64)) * np.float64(_ANOVA_SCALE)
    t_units = np.floor(term + 0.5).astype(np.int64)
    k = int(len(g))
    n_tot = int(n.sum())
    s_tot = int(s.sum())
    ss2 = int(g["s2"].to_numpy(np.int64).sum())
    t_sum = int(t_units.sum())
    g_units = int(np.floor(
        (np.float64(s_tot) * np.float64(s_tot) / np.float64(n_tot))
        * np.float64(_ANOVA_SCALE) + 0.5))
    num = (float(t_sum - g_units) / float(_ANOVA_SCALE)) / float(k - 1)
    den = ((float(ss2) - float(t_sum) / float(_ANOVA_SCALE))
           / float(n_tot - k))
    r6 = _round6(np.array([num, den, num / den]))
    out = pd.DataFrame({"event_type": g["event_type"], "n": n, "s": s,
                        "s2": g["s2"].to_numpy(np.int64),
                        "t_units": t_units})
    out["k"] = np.int64(k)
    out["msb6"] = r6[0]
    out["msw6"] = r6[1]
    out["f6"] = r6[2]
    return out.sort_values("event_type").reset_index(drop=True)


SQL_ANOVA = f"""
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
g AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
         sum(c * c)::BIGINT AS s2,
         CAST(round((CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE)) * {_ANOVA_SCALE})
              AS BIGINT) AS t_units
  FROM e GROUP BY 1),
tot AS (
  SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n_tot,
         sum(s)::BIGINT AS s_tot, sum(s2)::BIGINT AS ss2,
         sum(t_units)::BIGINT AS t_sum
  FROM g),
fin AS (
  SELECT k, n_tot, ss2, t_sum,
         CAST(round((CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
                     / CAST(n_tot AS DOUBLE)) * {_ANOVA_SCALE})
              AS BIGINT) AS g_units
  FROM tot),
f AS (
  SELECT k,
         round((CAST(t_sum - g_units AS DOUBLE) / {_ANOVA_SCALE}.0)
               / CAST(k - 1 AS DOUBLE), 6) AS msb6,
         round((CAST(ss2 AS DOUBLE)
                - CAST(t_sum AS DOUBLE) / {_ANOVA_SCALE}.0)
               / CAST(n_tot - k AS DOUBLE), 6) AS msw6,
         round(((CAST(t_sum - g_units AS DOUBLE) / {_ANOVA_SCALE}.0)
                / CAST(k - 1 AS DOUBLE))
               / ((CAST(ss2 AS DOUBLE)
                   - CAST(t_sum AS DOUBLE) / {_ANOVA_SCALE}.0)
                  / CAST(n_tot - k AS DOUBLE)), 6) AS f6
  FROM fin)
SELECT g.event_type, g.n, g.s, g.s2, g.t_units, f.k, f.msb6, f.msw6, f.f6
FROM g CROSS JOIN f
ORDER BY g.event_type
"""


# ---------------------------------------------------------------------------
# AR(2) Yule-Walker
# ---------------------------------------------------------------------------


def q_ar2_yule_walker_daily(sf_dir: str):
    """AR(2) Yule-Walker fit per event type on dense daily counts
    (docstring above)."""
    mat, types = _daily_cells(sf_dir)
    n = mat.shape[0]
    if n < 3:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "a0": pd.Series([], dtype=np.int64),
                             "a1": pd.Series([], dtype=np.int64),
                             "a2": pd.Series([], dtype=np.int64),
                             "phi1_6": pd.Series([], dtype=np.float64),
                             "phi2_6": pd.Series([], dtype=np.float64)})
    x = mat.astype(np.int64)
    nn = np.int64(n)
    S = x.sum(0)

    def a_k(k: int) -> np.ndarray:
        if k == 0:
            sxy, h, t = (x * x).sum(0), S, S
        else:
            sxy = (x[:-k] * x[k:]).sum(0)
            h, t = x[:-k].sum(0), x[k:].sum(0)
        return nn * nn * sxy - nn * S * (h + t) + (nn - k) * S * S

    a0, a1, a2 = a_k(0), a_k(1), a_k(2)
    r1 = a1.astype(np.float64) / a0.astype(np.float64)
    r2 = a2.astype(np.float64) / a0.astype(np.float64)
    phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    out = pd.DataFrame({"event_type": types,
                        "n": np.full(len(types), n, np.int64),
                        "a0": a0, "a1": a1, "a2": a2,
                        "phi1_6": _round6(phi1), "phi2_6": _round6(phi2)})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_AR2 = """
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
l AS (
  SELECT event_type, n AS yv,
         lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
         lag(n, 2) OVER (PARTITION BY event_type ORDER BY day) AS x2
  FROM g),
mo AS (
  SELECT event_type,
         count(*)::BIGINT AS nn, sum(yv)::BIGINT AS s,
         sum(yv * yv)::BIGINT AS sxx,
         sum(CASE WHEN x1 IS NOT NULL THEN x1 * yv END)::BIGINT AS sxy1,
         sum(CASE WHEN x1 IS NOT NULL THEN x1 END)::BIGINT AS h1,
         sum(CASE WHEN x1 IS NOT NULL THEN yv END)::BIGINT AS t1,
         sum(CASE WHEN x2 IS NOT NULL THEN x2 * yv END)::BIGINT AS sxy2,
         sum(CASE WHEN x2 IS NOT NULL THEN x2 END)::BIGINT AS h2,
         sum(CASE WHEN x2 IS NOT NULL THEN yv END)::BIGINT AS t2
  FROM l GROUP BY 1),
a AS (
  SELECT event_type, nn,
         (nn * nn * sxx - nn * s * (s + s) + nn * s * s)::BIGINT AS a0,
         (nn * nn * sxy1 - nn * s * (h1 + t1)
          + (nn - 1) * s * s)::BIGINT AS a1,
         (nn * nn * sxy2 - nn * s * (h2 + t2)
          + (nn - 2) * s * s)::BIGINT AS a2
  FROM mo),
r AS (
  SELECT event_type, nn, a0, a1, a2,
         CAST(a1 AS DOUBLE) / CAST(a0 AS DOUBLE) AS r1,
         CAST(a2 AS DOUBLE) / CAST(a0 AS DOUBLE) AS r2
  FROM a)
SELECT event_type, nn AS n, a0, a1, a2,
       round(r1 * (1.0 - r2) / (1.0 - r1 * r1), 6) AS phi1_6,
       round((r2 - r1 * r1) / (1.0 - r1 * r1), 6) AS phi2_6
FROM r ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Zipf slope
# ---------------------------------------------------------------------------


def q_zipf_slope_words(sf_dir: str):
    """Zipf rank-frequency OLS slope over the exact top-K vocabulary
    (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for s in t["text"].to_pylist():
            toks.extend(s.split())
        if not toks:
            return pa.table({"w": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        w, n = np.unique(np.asarray(toks), return_counts=True)
        return pa.table({"w": pa.array(w, pa.string()),
                         "n": pa.array(n.astype(np.int64))})

    ucnt = (ds.map_batches(uni_partial, batch_format="pyarrow")
              .groupby("w").aggregate(Sum("n", alias_name="n")))

    def top_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"w": t["w"].to_pylist(),
                           "n": t["n"].to_numpy(zero_copy_only=False)
                           .astype(np.int64)})
        df = df.sort_values(["n", "w"], ascending=[False, True])
        return _strip(df.head(_ZIPF_K))

    top = (ucnt.map_batches(top_partial, batch_format="pyarrow")
               .to_pandas()
               .sort_values(["n", "w"], ascending=[False, True])
               .head(_ZIPF_K).reset_index(drop=True))
    kk = int(len(top))
    rank = np.arange(1, kk + 1, dtype=np.int64)
    cnt = top["n"].to_numpy(np.int64)
    lx = np.log(rank.astype(np.float64))
    ly = np.log(cnt.astype(np.float64))
    scale = np.float64(_ZIPF_SCALE)
    x_u = np.floor(lx * scale + 0.5).astype(np.int64)
    y_u = np.floor(ly * scale + 0.5).astype(np.int64)
    xy_u = np.floor(lx * ly * scale + 0.5).astype(np.int64)
    xx_u = np.floor(lx * lx * scale + 0.5).astype(np.int64)
    sx = float(int(x_u.sum())) / float(_ZIPF_SCALE)
    sy = float(int(y_u.sum())) / float(_ZIPF_SCALE)
    sxy = float(int(xy_u.sum())) / float(_ZIPF_SCALE)
    sxx = float(int(xx_u.sum())) / float(_ZIPF_SCALE)
    slope = (float(kk) * sxy - sx * sy) / (float(kk) * sxx - sx * sx)
    intercept = (sy - slope * sx) / float(kk)
    r6 = _round6(np.array([slope, intercept]))
    out = pd.DataFrame({"rank": rank, "w": top["w"], "n": cnt,
                        "x_units": x_u, "y_units": y_u})
    out["slope6"] = r6[0]
    out["intercept6"] = r6[1]
    return out


SQL_ZIPF = f"""
WITH toks AS (
  SELECT regexp_extract_all(text, '\\S+') AS ts FROM documents),
ucnt AS (
  SELECT w, count(*)::BIGINT AS n
  FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY 1),
topk AS (
  SELECT w, n, row_number() OVER (ORDER BY n DESC, w) AS rank
  FROM ucnt ORDER BY n DESC, w LIMIT {_ZIPF_K}),
u AS (
  SELECT rank, w, n,
         CAST(round(ln(CAST(rank AS DOUBLE)) * {_ZIPF_SCALE})
              AS BIGINT) AS x_units,
         CAST(round(ln(CAST(n AS DOUBLE)) * {_ZIPF_SCALE})
              AS BIGINT) AS y_units,
         CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(n AS DOUBLE))
                    * {_ZIPF_SCALE}) AS BIGINT) AS xy_units,
         CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))
                    * {_ZIPF_SCALE}) AS BIGINT) AS xx_units
  FROM topk),
s AS (
  SELECT count(*)::BIGINT AS kk,
         CAST(sum(x_units) AS DOUBLE) / {_ZIPF_SCALE}.0 AS sx,
         CAST(sum(y_units) AS DOUBLE) / {_ZIPF_SCALE}.0 AS sy,
         CAST(sum(xy_units) AS DOUBLE) / {_ZIPF_SCALE}.0 AS sxy,
         CAST(sum(xx_units) AS DOUBLE) / {_ZIPF_SCALE}.0 AS sxx
  FROM u),
f AS (
  SELECT kk,
         (CAST(kk AS DOUBLE) * sxy - sx * sy)
           / (CAST(kk AS DOUBLE) * sxx - sx * sx) AS slope
  FROM s),
f2 AS (
  SELECT round(slope, 6) AS slope6,
         round((s.sy - f.slope * s.sx) / CAST(f.kk AS DOUBLE), 6)
           AS intercept6
  FROM f, s)
SELECT u.rank, u.w, u.n, u.x_units, u.y_units, f2.slope6, f2.intercept6
FROM u CROSS JOIN f2
ORDER BY u.rank
"""


QUERIES38: dict[str, tuple] = {
    "anova_value_by_type": (q_anova_value_by_type, SQL_ANOVA),
    "ar2_yule_walker_daily": (q_ar2_yule_walker_daily, SQL_AR2),
    "zipf_slope_words": (q_zipf_slope_words, SQL_ZIPF),
}
