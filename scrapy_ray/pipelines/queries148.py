"""One-hundred-forty-eighth oracle-query batch — boosting, actuarial
life tables, and rating-system replay:

- adaboost_stumps_purchase: 3 rounds of AdaBoost over value-threshold
  decision stumps for y = (event is a purchase). Sample weights live
  on the (cents, y) histogram as INTEGERS (initial 1e6 per row,
  re-quantized per cell after each multiplicative exp(±α) update), so
  every weighted-error threshold scan is an exact prefix-sum argmin
  with the (err, θ, polarity) tiebreak; ε and α finalize through
  identical float expressions. Each round also reports the running
  ensemble's exact-integer training-error count.
- actuarial_life_table: the classic grouped (actuarial) life table on
  the right-censored inter-purchase gaps (_gap_hist base: complete =
  consecutive purchases, censored = last purchase → horizon), 5-day
  intervals, effective exposure n' = n − c/2 carried DOUBLED so
  q_x = 2d/(2n − c) is a float of integers; survival is the KM-style
  exp of cumulative 1e-9-quantized ln(1 − q) units.
- elo_daily_types: an Elo rating replay — each day the two most
  active event types (count desc, name asc) play one match (winner =
  larger count, tie = draw 0.5), K = 20, logistic expectation
  1/(1+10^(Δ/400)); the 30-step float recursion replays with per-arm
  rating columns exactly like the UCB1 device.
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

_AB_ROUNDS = 3
_KM_SCALE = 10**9
_KM_FLOOR = -(10**15)
_LT_INTERVAL_S = 5 * 86400


# ---------------------------------------------------------------------------
# AdaBoost stumps
# ---------------------------------------------------------------------------


def q_adaboost_stumps_purchase(sf_dir: str):
    """3-round AdaBoost of value-threshold stumps (docstring)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def cpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"cent": c,
                          "pos": (et == "purchase").astype(np.int64),
                          "n": np.int64(1)}) \
            .groupby(["cent", "pos"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["cent", "pos"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas().sort_values(["cent", "pos"])
               .reset_index(drop=True))
    cent = cells["cent"].to_numpy(np.int64)
    pos = cells["pos"].to_numpy(np.int64)
    n = cells["n"].to_numpy(np.int64)
    w = n * 1000000                          # integer weights
    thetas = np.unique(cent)
    params = []
    scores = np.zeros(len(cells))            # running ensemble score
    for _ in range(_AB_ROUNDS):
        wp = np.where(pos == 1, w, 0)
        wn = np.where(pos == 0, w, 0)
        wpt, wnt = int(wp.sum()), int(wn.sum())
        # prefix sums at each distinct theta (inclusive of <= theta)
        idx = np.searchsorted(cent, thetas, side="right")
        cwp = np.concatenate([[0], np.cumsum(wp)])[idx]
        cwn = np.concatenate([[0], np.cumsum(wn)])[idx]
        err_p = cwn + (wpt - cwp)            # predict + when <= theta
        err_m = (wpt + wnt) - err_p
        best = None
        for arr, pol in ((err_p, 1), (err_m, -1)):
            k = int(np.lexsort((thetas, arr))[0])
            cand = (int(arr[k]), int(thetas[k]), -pol)
            if best is None or cand < best:
                best = cand
        errw, theta, negpol = best
        pol = -negpol
        eps = float(errw) / float(wpt + wnt)
        alpha = 0.5 * math.log((1.0 - eps) / eps)
        h = np.where(cent <= theta, pol, -pol)
        yy = np.where(pos == 1, 1, -1)
        correct = h == yy
        # integer re-quantized multiplicative update, per cell
        w = np.array([int(math.floor(float(ww)
                                     * math.exp(-alpha if c_ else alpha)
                                     + 0.5))
                      for ww, c_ in zip(w.tolist(), correct.tolist())],
                     dtype=np.int64)
        scores = scores + alpha * h
        pred = np.where(scores > 0.0, 1, -1)
        ens_err = int(n[pred != yy].sum())
        params.append((theta, pol, eps, alpha, ens_err))
    out = pd.DataFrame({
        "round": np.arange(1, _AB_ROUNDS + 1, dtype=np.int64),
        "theta": [p[0] for p in params],
        "pol": [p[1] for p in params],
        "eps6": _round6(np.array([p[2] for p in params])),
        "alpha6": _round6(np.array([p[3] for p in params])),
        "ens_err": [p[4] for p in params]})
    for col in ("round", "theta", "pol", "ens_err"):
        out[col] = out[col].astype(np.int64)
    return out


def _ab_round_sql(i: int) -> str:
    wtab = f"w{i}"
    return f"""
pre{i} AS (
  SELECT cent, pos, w,
         sum(CASE WHEN pos = 1 THEN w ELSE 0 END)
           OVER (ORDER BY cent, pos) AS cwp,
         sum(CASE WHEN pos = 0 THEN w ELSE 0 END)
           OVER (ORDER BY cent, pos) AS cwn,
         sum(CASE WHEN pos = 1 THEN w ELSE 0 END) OVER () AS wpt,
         sum(CASE WHEN pos = 0 THEN w ELSE 0 END) OVER () AS wnt
  FROM {wtab}),
th{i} AS (
  SELECT cent AS theta, max(cwp) AS cwp, max(cwn) AS cwn,
         max(wpt) AS wpt, max(wnt) AS wnt
  FROM pre{i} GROUP BY cent),
cand{i} AS (
  SELECT theta, 1 AS pol, (cwn + wpt - cwp)::BIGINT AS errw,
         (wpt + wnt)::BIGINT AS wt
  FROM th{i}
  UNION ALL
  SELECT theta, -1, (wpt + wnt - (cwn + wpt - cwp))::BIGINT,
         (wpt + wnt)::BIGINT
  FROM th{i}),
p{i} AS (
  SELECT theta, pol, errw, wt,
         CAST(errw AS DOUBLE) / CAST(wt AS DOUBLE) AS eps,
         0.5 * ln((1.0 - CAST(errw AS DOUBLE) / CAST(wt AS DOUBLE))
                  / (CAST(errw AS DOUBLE) / CAST(wt AS DOUBLE)))
           AS alpha
  FROM cand{i}
  ORDER BY errw, theta, pol DESC LIMIT 1),
w{i + 1} AS (
  SELECT c.cent, c.pos, c.n,
         CAST(floor(CAST(c.w AS DOUBLE)
              * exp(CASE WHEN (CASE WHEN c.cent <= p.theta
                               THEN p.pol ELSE -p.pol END)
                         = (CASE WHEN c.pos = 1 THEN 1 ELSE -1 END)
                    THEN -p.alpha ELSE p.alpha END) + 0.5)
              AS BIGINT) AS w
  FROM {wtab} c CROSS JOIN p{i} p)"""


def _ab_sql() -> str:
    rounds = ",".join(_ab_round_sql(i)
                      for i in range(1, _AB_ROUNDS + 1))
    ens = []
    for m in range(1, _AB_ROUNDS + 1):
        score = " + ".join(
            f"(SELECT alpha * (CASE WHEN c.cent <= theta THEN pol "
            f"ELSE -pol END) FROM p{k})" for k in range(1, m + 1))
        ens.append(f"""
e{m} AS (
  SELECT sum(CASE WHEN (CASE WHEN ({score}) > 0.0 THEN 1 ELSE -1 END)
                  <> (CASE WHEN c.pos = 1 THEN 1 ELSE -1 END)
             THEN c.n ELSE 0 END)::BIGINT AS ens_err
  FROM w1 c)""")
    selects = " UNION ALL ".join(
        f"SELECT {m} AS round, p.theta::BIGINT AS theta,"
        f" p.pol::BIGINT AS pol, round(p.eps, 6) AS eps6,"
        f" round(p.alpha, 6) AS alpha6, e{m}.ens_err"
        f" FROM p{m} p CROSS JOIN e{m}"
        for m in range(1, _AB_ROUNDS + 1))
    return f"""
WITH cells AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cent,
         (event_type = 'purchase')::INT AS pos,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
w1 AS (SELECT cent, pos, n, n * 1000000 AS w FROM cells),
{rounds},
{",".join(ens)}
{selects} ORDER BY round
"""


SQL_ADABOOST = _ab_sql()


# ---------------------------------------------------------------------------
# Actuarial life table
# ---------------------------------------------------------------------------


def q_actuarial_life_table(sf_dir: str):
    """Grouped life table on censored purchase gaps (docstring)."""
    from scrapy_ray.pipelines.queries26 import _gap_hist

    hist = _gap_hist(sf_dir)
    iv = (hist["gap"].to_numpy(np.int64) // _LT_INTERVAL_S)
    d = hist["d"].to_numpy(np.int64)
    cnt = hist["cnt"].to_numpy(np.int64)
    g = pd.DataFrame({"iv": iv, "d": d, "c": cnt - d}) \
        .groupby("iv").sum().sort_index()
    ivs = g.index.to_numpy(np.int64)
    dv = g["d"].to_numpy(np.int64)
    cv = g["c"].to_numpy(np.int64)
    tot = int((dv + cv).sum())
    entering = tot - np.concatenate([[0], np.cumsum(dv + cv)[:-1]])
    rows = []
    cum_units = 0
    for iv_, d_, c_, n_ in zip(ivs.tolist(), dv.tolist(),
                               cv.tolist(), entering.tolist()):
        n2 = 2 * n_ - c_                  # doubled effective exposure
        q = 2.0 * float(d_) / float(n2)
        if 2 * d_ >= n2:
            units = _KM_FLOOR
        else:
            lv = math.log(1.0 - q) * _KM_SCALE
            units = int(math.floor(lv + 0.5)) if lv >= 0 \
                else int(math.ceil(lv - 0.5))
        cum_units += units
        s6 = _round6(np.array([math.exp(float(cum_units)
                                        / float(_KM_SCALE))]))[0]
        rows.append((iv_, n_, d_, c_,
                     _round6(np.array([q]))[0], s6))
    out = pd.DataFrame(rows, columns=["interval", "n_enter", "d",
                                      "c", "q6", "s6"])
    for col in ("interval", "n_enter", "d", "c"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LIFE_TABLE = f"""
WITH p AS (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = 'purchase'),
mx AS (SELECT max(ts) AS m FROM events),
g AS (
  SELECT user_id, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM p),
allg AS (
  SELECT (epoch_us(nxt) - epoch_us(ts)) // 1000000 AS gap,
         1::BIGINT AS d
  FROM g WHERE nxt IS NOT NULL
  UNION ALL
  SELECT (epoch_us((SELECT m FROM mx)) - epoch_us(max(ts)))
           // 1000000,
         0::BIGINT
  FROM p GROUP BY user_id),
h AS (
  SELECT gap // {_LT_INTERVAL_S} AS iv, sum(d)::BIGINT AS d,
         sum(1 - d)::BIGINT AS c
  FROM allg GROUP BY 1),
r AS (
  SELECT iv, d, c,
         (SELECT sum(d + c) FROM h)
           - (sum(d + c) OVER (ORDER BY iv) - (d + c)) AS n_enter
  FROM h),
u AS (
  SELECT iv, n_enter::BIGINT AS n_enter, d, c,
         2.0 * CAST(d AS DOUBLE) / CAST(2 * n_enter - c AS DOUBLE)
           AS q,
         CASE WHEN 2 * d >= 2 * n_enter - c THEN {_KM_FLOOR}
              ELSE CAST(round(ln(1.0 - 2.0 * CAST(d AS DOUBLE)
                                 / CAST(2 * n_enter - c AS DOUBLE))
                              * {_KM_SCALE}) AS BIGINT)
         END AS units
  FROM r)
SELECT iv AS interval, n_enter, d, c, round(q, 6) AS q6,
       round(exp(sum(units) OVER (ORDER BY iv)
                 / {_KM_SCALE}.0), 6) AS s6
FROM u ORDER BY iv
"""


# ---------------------------------------------------------------------------
# Elo replay
# ---------------------------------------------------------------------------


def q_elo_daily_types(sf_dir: str):
    """Daily top-2 Elo replay over event types (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "ts"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = np.asarray(t["event_type"].to_pylist())
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"day": day, "g": et, "n": np.int64(1)}) \
            .groupby(["day", "g"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(dpart, batch_format="pyarrow")
             .groupby(["day", "g"]).aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    arms = sorted(agg["g"].unique().tolist())
    ai = {g_: i for i, g_ in enumerate(arms)}
    days = sorted(agg["day"].unique().tolist())
    byday: dict[int, list[tuple[int, int]]] = {}
    for _, r_ in agg.iterrows():
        byday.setdefault(int(r_["day"]), []).append(
            (ai[r_["g"]], int(r_["n"])))
    ratings = [1500.0] * len(arms)
    nmatch = 0
    for day in days:
        cells = sorted(byday[day], key=lambda t: (-t[1], t[0]))
        (i1, c1), (i2, c2) = cells[0], cells[1]
        u, v = (i1, i2) if i1 < i2 else (i2, i1)
        cu = c1 if u == i1 else c2
        cv = c2 if u == i1 else c1
        su = 1.0 if cu > cv else (0.0 if cu < cv else 0.5)
        eu = 1.0 / (1.0 + 10.0 ** ((ratings[v] - ratings[u]) / 400.0))
        ratings[u] = ratings[u] + 20.0 * (su - eu)
        ratings[v] = ratings[v] - 20.0 * (su - eu)
        nmatch += 1
    r6 = _round6(np.array(ratings))
    out = pd.DataFrame({"n_matches": [nmatch],
                        "r1_6": [r6[0]], "r2_6": [r6[1]],
                        "r3_6": [r6[2]], "r4_6": [r6[3]],
                        "r5_6": [r6[4]]})
    out["n_matches"] = out["n_matches"].astype(np.int64)
    return out


SQL_ELO = """
WITH RECURSIVE cells AS (
  SELECT date_trunc('day', ts) AS dy, event_type AS g,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
arms AS (
  SELECT g, row_number() OVER (ORDER BY g) AS ai
  FROM (SELECT DISTINCT g FROM cells)),
dayr AS (
  SELECT dy, row_number() OVER (ORDER BY dy) AS t
  FROM (SELECT DISTINCT dy FROM cells)),
rk AS (
  SELECT dayr.t, arms.ai, cells.n,
         row_number() OVER (PARTITION BY dayr.t
                            ORDER BY cells.n DESC, cells.g) AS r
  FROM cells JOIN arms USING (g) JOIN dayr USING (dy)),
match AS (
  SELECT a.t, least(a.ai, b.ai) AS u, greatest(a.ai, b.ai) AS v,
         CASE WHEN (CASE WHEN a.ai < b.ai THEN a.n ELSE b.n END)
                   > (CASE WHEN a.ai < b.ai THEN b.n ELSE a.n END)
              THEN 1.0
              WHEN (CASE WHEN a.ai < b.ai THEN a.n ELSE b.n END)
                   < (CASE WHEN a.ai < b.ai THEN b.n ELSE a.n END)
              THEN 0.0 ELSE 0.5 END AS su
  FROM rk a JOIN rk b ON a.t = b.t AND a.r = 1 AND b.r = 2),
td AS (SELECT max(t)::BIGINT AS tmax FROM match),
rec AS (
  -- 1500.0 would parse as DECIMAL(5,1) and round EVERY recursive
  -- rating to one decimal (the CLAUDE.md decimal-literal trap)
  SELECT 0::BIGINT AS t, 1.5e3 AS r1, 1.5e3 AS r2, 1.5e3 AS r3,
         1.5e3 AS r4, 1.5e3 AS r5
  UNION ALL
  SELECT m.t,
    rec.r1 + CASE WHEN m.u = 1 THEN d.delta
                  WHEN m.v = 1 THEN -d.delta ELSE 0.0 END,
    rec.r2 + CASE WHEN m.u = 2 THEN d.delta
                  WHEN m.v = 2 THEN -d.delta ELSE 0.0 END,
    rec.r3 + CASE WHEN m.u = 3 THEN d.delta
                  WHEN m.v = 3 THEN -d.delta ELSE 0.0 END,
    rec.r4 + CASE WHEN m.u = 4 THEN d.delta
                  WHEN m.v = 4 THEN -d.delta ELSE 0.0 END,
    rec.r5 + CASE WHEN m.u = 5 THEN d.delta
                  WHEN m.v = 5 THEN -d.delta ELSE 0.0 END
  FROM rec
  JOIN match m ON m.t = rec.t + 1,
  LATERAL (
    SELECT 20.0 * (m.su - 1.0 / (1.0 + power(10.0,
      ((CASE m.v WHEN 1 THEN rec.r1 WHEN 2 THEN rec.r2
                 WHEN 3 THEN rec.r3 WHEN 4 THEN rec.r4
                 ELSE rec.r5 END)
       - (CASE m.u WHEN 1 THEN rec.r1 WHEN 2 THEN rec.r2
                   WHEN 3 THEN rec.r3 WHEN 4 THEN rec.r4
                   ELSE rec.r5 END)) / 400.0))) AS delta) d
  WHERE rec.t < (SELECT tmax FROM td))
SELECT (SELECT tmax FROM td) AS n_matches,
       round(r1, 6) AS r1_6, round(r2, 6) AS r2_6,
       round(r3, 6) AS r3_6, round(r4, 6) AS r4_6,
       round(r5, 6) AS r5_6
FROM rec WHERE t = (SELECT tmax FROM td)
"""


QUERIES148: dict[str, tuple] = {
    "adaboost_stumps_purchase": (q_adaboost_stumps_purchase,
                                 SQL_ADABOOST),
    "actuarial_life_table": (q_actuarial_life_table, SQL_LIFE_TABLE),
    "elo_daily_types": (q_elo_daily_types, SQL_ELO),
}
