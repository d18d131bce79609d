"""One-hundred-fourth oracle-query batch — cooperative game attribution
/ copula fitting / aggregation effects:

- shapley_features: exact Shapley (and Banzhaf) values of the three
  discretized features {valbin = round(value)//50, hour, dow} in the
  coalition game v(S) = training accuracy of the per-cell majority
  rule for purchase over the S-feature cross-product (bounded cells,
  <= 1848): every v(S) numerator SUM max(pos, n-pos) is an exact
  integer from ONE distributed pass over the 8 subsets, and the
  3-player Shapley weights are exact sixths — phi assembled
  identical-expression.
- copula_fit_daily: Gumbel and Clayton copula parameters from
  Kendall's tau-a of daily (click, purchase) counts: concordant /
  discordant pair counts are exact (O(30^2) pairs both sides);
  theta_gumbel = 1/(1-tau), theta_clayton = 2 tau/(1-tau).
- maup_corr_scales: the modifiable-areal-unit effect — Pearson
  correlation of click vs purchase volume at DAILY vs WEEKLY
  aggregation, both from exact integer moments; reports both r's
  and the gap.
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

_US_PER_DAY = 86_400_000_000
_SUBSETS = ((), ("v",), ("h",), ("d",), ("v", "h"), ("v", "d"),
            ("h", "d"), ("v", "h", "d"))


# ---------------------------------------------------------------------------
# Shapley feature attribution
# ---------------------------------------------------------------------------


def q_shapley_features(sf_dir: str):
    """Exact Shapley/Banzhaf of majority-rule coalition accuracies
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["value", "ts", "event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        v = (np.floor(t["value"].to_numpy(zero_copy_only=False) + 0.5)
             .astype(np.int64) // 50)
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = ((ts // 1_000_000) % 86400) // 3600
        d = (ts // _US_PER_DAY) % 7
        y = (np.asarray(t["event_type"].to_pylist())
             == "purchase").astype(np.int64)
        df = pd.DataFrame({"v": v, "h": h.astype(np.int64),
                           "d": d.astype(np.int64), "y": y,
                           "n": np.int64(1)})
        g = df.groupby(["v", "h", "d"], sort=False).agg(
            y=("y", "sum"), n=("n", "sum")).reset_index()
        for c in ("y", "n"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["v", "h", "d"])
               .aggregate(Sum("y", alias_name="y"),
                          Sum("n", alias_name="n"))
               .to_pandas())
    n_tot = int(cells["n"].sum())
    vnum: dict[tuple, int] = {}
    for sub in _SUBSETS:
        if sub:
            g = cells.groupby(list(sub)).agg(
                y=("y", "sum"), n=("n", "sum")).reset_index()
        else:
            g = pd.DataFrame({"y": [int(cells["y"].sum())],
                              "n": [n_tot]})
        vnum[tuple(sorted(sub))] = int(
            sum(max(int(a), int(b) - int(a))
                for a, b in zip(g["y"], g["n"])))

    def v(sub):
        return vnum[tuple(sorted(sub))]

    feats = ("v", "h", "d")
    rows = []
    for f in feats:
        others = [x for x in feats if x != f]
        # 3-player Shapley: weights 2,1,1,2 over the four marginal
        # contributions (in sixths)
        m0 = v((f,)) - v(())
        m1 = v(tuple(sorted((f, others[0])))) - v((others[0],))
        m2 = v(tuple(sorted((f, others[1])))) - v((others[1],))
        m3 = v(tuple(sorted((f, others[0], others[1])))) \
            - v(tuple(sorted((others[0], others[1]))))
        phi_num = 2 * m0 + m1 + m2 + 2 * m3          # / (6 n_tot)
        bz_num = m0 + m1 + m2 + m3                    # / (4 n_tot)
        rows.append((f, vnum[(f,)], phi_num, bz_num))
    out = pd.DataFrame(rows, columns=["feat", "v_single_num",
                                      "phi_num", "bz_num"])
    out["phi6"] = _round6(np.array(
        [float(v_) / float(6 * n_tot) for v_ in out["phi_num"]]))
    out["bz6"] = _round6(np.array(
        [float(v_) / float(4 * n_tot) for v_ in out["bz_num"]]))
    out["v_empty_num"] = np.int64(vnum[()])
    out["n"] = np.int64(n_tot)
    for col in ("v_single_num", "phi_num", "bz_num", "v_empty_num",
                "n"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values("feat").reset_index(drop=True)


SQL_SHAPLEY = f"""
WITH b AS (
  SELECT CAST(round(value) AS BIGINT) // 50 AS v,
         ((epoch_us(ts) // 1000000) % 86400) // 3600 AS h,
         (epoch_us(ts) // {_US_PER_DAY}) % 7 AS d,
         (event_type = 'purchase')::INT AS y
  FROM events),
t AS (SELECT count(*)::BIGINT AS n FROM b),
v0 AS (SELECT greatest(sum(y), count(*) - sum(y))::BIGINT AS q FROM b),
vv AS (SELECT sum(q)::BIGINT AS q FROM (
  SELECT greatest(sum(y), count(*) - sum(y)) AS q FROM b GROUP BY v)),
vh AS (SELECT sum(q)::BIGINT AS q FROM (
  SELECT greatest(sum(y), count(*) - sum(y)) AS q FROM b GROUP BY h)),
vd AS (SELECT sum(q)::BIGINT AS q FROM (
  SELECT greatest(sum(y), count(*) - sum(y)) AS q FROM b GROUP BY d)),
vvh AS (SELECT sum(q)::BIGINT AS q FROM (
  SELECT greatest(sum(y), count(*) - sum(y)) AS q FROM b GROUP BY v, h)),
vvd AS (SELECT sum(q)::BIGINT AS q FROM (
  SELECT greatest(sum(y), count(*) - sum(y)) AS q FROM b GROUP BY v, d)),
vhd AS (SELECT sum(q)::BIGINT AS q FROM (
  SELECT greatest(sum(y), count(*) - sum(y)) AS q FROM b GROUP BY h, d)),
vall AS (SELECT sum(q)::BIGINT AS q FROM (
  SELECT greatest(sum(y), count(*) - sum(y)) AS q FROM b
  GROUP BY v, h, d)),
f AS (
  SELECT 'd' AS feat, vd.q AS v_single_num,
         2 * (vd.q - v0.q) + (vvd.q - vv.q) + (vhd.q - vh.q)
           + 2 * (vall.q - vvh.q) AS phi_num,
         (vd.q - v0.q) + (vvd.q - vv.q) + (vhd.q - vh.q)
           + (vall.q - vvh.q) AS bz_num
  FROM v0, vv, vh, vd, vvh, vvd, vhd, vall
  UNION ALL
  SELECT 'h', vh.q,
         2 * (vh.q - v0.q) + (vvh.q - vv.q) + (vhd.q - vd.q)
           + 2 * (vall.q - vvd.q),
         (vh.q - v0.q) + (vvh.q - vv.q) + (vhd.q - vd.q)
           + (vall.q - vvd.q)
  FROM v0, vv, vh, vd, vvh, vvd, vhd, vall
  UNION ALL
  SELECT 'v', vv.q,
         2 * (vv.q - v0.q) + (vvh.q - vh.q) + (vvd.q - vd.q)
           + 2 * (vall.q - vhd.q),
         (vv.q - v0.q) + (vvh.q - vh.q) + (vvd.q - vd.q)
           + (vall.q - vhd.q)
  FROM v0, vv, vh, vd, vvh, vvd, vhd, vall)
SELECT feat, v_single_num, phi_num::BIGINT AS phi_num,
       bz_num::BIGINT AS bz_num,
       round(CAST(phi_num AS DOUBLE) / CAST(6 * n AS DOUBLE), 6)
         AS phi6,
       round(CAST(bz_num AS DOUBLE) / CAST(4 * n AS DOUBLE), 6) AS bz6,
       (SELECT q FROM v0) AS v_empty_num, n
FROM f CROSS JOIN t ORDER BY feat
"""


# ---------------------------------------------------------------------------
# Copula fit via Kendall tau
# ---------------------------------------------------------------------------


def q_copula_fit_daily(sf_dir: str):
    """Gumbel/Clayton parameters from daily Kendall tau-a (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist())
        df = pd.DataFrame({"day": day,
                           "x": (et == "click").astype(np.int64),
                           "y": (et == "purchase").astype(np.int64)})
        g = df.groupby("day", sort=False).sum().reset_index()
        for c in ("x", "y"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    daily = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("x", alias_name="x"),
                                         Sum("y", alias_name="y"))
               .to_pandas())
    x = [int(v) for v in daily["x"]]
    y = [int(v) for v in daily["y"]]
    n = len(x)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (x[j] - x[i]) * (y[j] - y[i])
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    pairs = n * (n - 1) // 2
    tau = float(conc - disc) / float(pairs)
    th_g = 1.0 / (1.0 - tau)
    th_c = 2.0 * tau / (1.0 - tau)
    out = pd.DataFrame({"n_days": [n], "conc": [conc], "disc": [disc],
                        "tau6": [_round6(np.array([tau]))[0]],
                        "gumbel6": [_round6(np.array([th_g]))[0]],
                        "clayton6": [_round6(np.array([th_c]))[0]]})
    for col in ("n_days", "conc", "disc"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_COPULA = f"""
WITH daily AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'purchase')::INT)::BIGINT AS y
  FROM events GROUP BY 1),
p AS (
  SELECT sum(((b.x - a.x) * (b.y - a.y) > 0)::INT)::BIGINT AS conc,
         sum(((b.x - a.x) * (b.y - a.y) < 0)::INT)::BIGINT AS disc
  FROM daily a JOIN daily b ON b.day > a.day),
t AS (SELECT count(*)::BIGINT AS n FROM daily),
f AS (
  SELECT n, conc, disc,
         CAST(conc - disc AS DOUBLE)
           / CAST(n * (n - 1) // 2 AS DOUBLE) AS tau
  FROM p CROSS JOIN t)
SELECT n AS n_days, conc, disc,
       round(tau, 6) AS tau6,
       round(1.0 / (1.0 - tau), 6) AS gumbel6,
       round(2.0 * tau / (1.0 - tau), 6) AS clayton6
FROM f
"""


# ---------------------------------------------------------------------------
# MAUP correlation across scales
# ---------------------------------------------------------------------------


def q_maup_corr_scales(sf_dir: str):
    """Daily vs weekly click/purchase correlation gap (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist())
        df = pd.DataFrame({"day": day,
                           "x": (et == "click").astype(np.int64),
                           "y": (et == "purchase").astype(np.int64)})
        g = df.groupby("day", sort=False).sum().reset_index()
        for c in ("x", "y"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    daily = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("x", alias_name="x"),
                                         Sum("y", alias_name="y"))
               .to_pandas())

    def corr(x, y):
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxx = sum(v * v for v in x)
        syy = sum(v * v for v in y)
        sxy = sum(a * b for a, b in zip(x, y))
        return (float(n * sxy - sx * sy)
                / math.sqrt(float(n * sxx - sx * sx)
                            * float(n * syy - sy * sy)))

    x = [int(v) for v in daily["x"]]
    y = [int(v) for v in daily["y"]]
    r_day = corr(x, y)
    wk = daily.copy()
    wk["w"] = wk["day"] // 7
    g = wk.groupby("w")[["x", "y"]].sum().reset_index()
    xw = [int(v) for v in g["x"]]
    yw = [int(v) for v in g["y"]]
    r_week = corr(xw, yw)
    out = pd.DataFrame({"n_days": [len(x)], "n_weeks": [len(xw)],
                        "r_day6": [_round6(np.array([r_day]))[0]],
                        "r_week6": [_round6(np.array([r_week]))[0]],
                        "gap6": [_round6(np.array(
                            [r_week - r_day]))[0]]})
    for col in ("n_days", "n_weeks"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MAUP = f"""
WITH daily AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'purchase')::INT)::BIGINT AS y
  FROM events GROUP BY 1),
md AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
         sum(y * y)::BIGINT AS syy, sum(x * y)::BIGINT AS sxy
  FROM daily),
wkly AS (
  SELECT day // 7 AS w, sum(x)::BIGINT AS x, sum(y)::BIGINT AS y
  FROM daily GROUP BY 1),
mw AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
         sum(y * y)::BIGINT AS syy, sum(x * y)::BIGINT AS sxy
  FROM wkly),
f AS (
  SELECT md.n AS nd, mw.n AS nw,
         CAST(md.n * md.sxy - md.sx * md.sy AS DOUBLE)
           / sqrt(CAST(md.n * md.sxx - md.sx * md.sx AS DOUBLE)
                  * CAST(md.n * md.syy - md.sy * md.sy AS DOUBLE))
           AS r_day,
         CAST(mw.n * mw.sxy - mw.sx * mw.sy AS DOUBLE)
           / sqrt(CAST(mw.n * mw.sxx - mw.sx * mw.sx AS DOUBLE)
                  * CAST(mw.n * mw.syy - mw.sy * mw.sy AS DOUBLE))
           AS r_week
  FROM md CROSS JOIN mw)
SELECT nd AS n_days, nw AS n_weeks,
       round(r_day, 6) AS r_day6, round(r_week, 6) AS r_week6,
       round(r_week - r_day, 6) AS gap6
FROM f
"""


QUERIES104: dict[str, tuple] = {
    "shapley_features": (q_shapley_features, SQL_SHAPLEY),
    "copula_fit_daily": (q_copula_fit_daily, SQL_COPULA),
    "maup_corr_scales": (q_maup_corr_scales, SQL_MAUP),
}
