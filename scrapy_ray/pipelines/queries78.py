"""Seventy-eighth oracle-query batch — monotone calibration / directed
information / epidemiological effect:

- isotonic_purchase_rate: isotonic (monotone non-decreasing)
  regression of the purchase rate over the ten value-decile bins via
  the EXACT minimax characterization iso_i = max_{j<=i} min_{k>=i}
  avg(j..k) — each pooled average (P_k - P_{j-1})/(N_k - N_{j-1}) is
  quantized to 1e-9 once, and the max/min lattice runs on exact
  ints (10^3 combinations — a triple self-join in SQL), so the PAVA
  solution needs no iterative pooling on either side.  Bins reuse
  the gains/lift decile machinery (queries77).
- transfer_entropy_click_purchase: plug-in transfer entropy
  TE(X->Y) of daily click up-moves onto purchase up-moves
  (b_t = 1[count_t > count_{t-1}]): with exact joint counts
  c(y', y, x) over the 8 states and their marginals,
  TE = (1/n) SUM c * ln(c*c(y) / (c(y,x)*c(y',y))) — each log of an
  exact-int rational is 1e-12-quantized and integer-summed.  Probe
  sf0.001: all 8 cells populated (n=28), TE = 0.031752.
- risk_ratio_click_purchase_daily: relative risk of daily purchase
  given daily click over (user, day) units — the risk-scale
  complement of the Woolf odds ratio (queries54, same distributed
  2x2 build): RR = (a/(a+b))/(c/(c+d)), katz-log SE
  sqrt(1/a - 1/(a+b) + 1/c - 1/(c+d)), and the 95% log CI — all
  identical-expression floats of the four exact cell counts.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries77 import SQL_GAINS_LIFT, \
    q_gains_lift_deciles

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Isotonic purchase rate over value deciles
# ---------------------------------------------------------------------------


def q_isotonic_purchase_rate(sf_dir: str):
    """PAVA via the exact minimax lattice on decile bins (docstring
    above)."""
    bins = q_gains_lift_deciles(sf_dir).sort_values("bin")
    nb = bins["n_bin"].to_numpy(np.int64)
    pb = bins["purch_bin"].to_numpy(np.int64)
    cn = np.concatenate([[0], np.cumsum(nb)])
    cp = np.concatenate([[0], np.cumsum(pb)])
    q = {}
    for j in range(10):
        for k in range(j, 10):
            num = int(cp[k + 1] - cp[j])
            den = int(cn[k + 1] - cn[j])
            q[(j, k)] = int(math.floor(num * 1000000000.0 / den + 0.5))
    iso = []
    for i in range(10):
        iso.append(max(min(q[(j, k)] for k in range(i, 10))
                       for j in range(i + 1)))
    out = pd.DataFrame({"bin": np.arange(10, dtype=np.int64),
                        "n_bin": nb, "purch_bin": pb,
                        "iso_q": np.array(iso, np.int64)})
    out["iso6"] = _round6(out["iso_q"].to_numpy(np.float64)
                          / 1000000000.0)
    for col in ("bin", "n_bin", "purch_bin", "iso_q"):
        out[col] = out[col].astype(np.int64)
    return out


# reuse the gains CTE chain up to per-bin counts, then the minimax
_GAINS_BINS_SQL = SQL_GAINS_LIFT.split("t AS (SELECT")[0]

SQL_ISOTONIC = _GAINS_BINS_SQL + """
cum AS (
  SELECT bin, n_bin, purch_bin,
         sum(n_bin) OVER (ORDER BY bin)::BIGINT AS cn,
         sum(purch_bin) OVER (ORDER BY bin)::BIGINT AS cp
  FROM g),
cum0 AS (
  SELECT bin, cn, cp,
         coalesce(lag(cn) OVER (ORDER BY bin), 0) AS cn0,
         coalesce(lag(cp) OVER (ORDER BY bin), 0) AS cp0
  FROM cum),
pairs AS (
  SELECT j.bin AS jb, k.bin AS kb,
         CAST(round((k.cp - j.cp0) * 1000000000.0
                    / (k.cn - j.cn0)) AS BIGINT) AS q
  FROM cum0 j JOIN cum0 k ON k.bin >= j.bin),
minq AS (
  SELECT pairs.jb, i.bin AS ib, min(q) AS mq
  FROM pairs JOIN cum0 i ON pairs.jb <= i.bin AND pairs.kb >= i.bin
  GROUP BY 1, 2),
iso AS (SELECT ib AS bin, max(mq)::BIGINT AS iso_q FROM minq GROUP BY 1)
SELECT g.bin, g.n_bin, g.purch_bin, iso.iso_q,
       round(CAST(iso.iso_q AS DOUBLE) / 1000000000.0, 6) AS iso6
FROM g JOIN iso ON iso.bin = g.bin ORDER BY g.bin
"""


# ---------------------------------------------------------------------------
# Transfer entropy
# ---------------------------------------------------------------------------


def q_transfer_entropy_click_purchase(sf_dir: str):
    """Plug-in TE of click up-moves onto purchase up-moves (docstring
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
               .to_pandas().sort_values("day"))
    x = daily["x"].to_numpy(np.int64)
    y = daily["y"].to_numpy(np.int64)
    xb = (x[1:] > x[:-1]).astype(np.int64)
    yb = (y[1:] > y[:-1]).astype(np.int64)
    c3: dict[tuple, int] = {}
    for t in range(1, len(yb)):
        k = (int(yb[t]), int(yb[t - 1]), int(xb[t - 1]))
        c3[k] = c3.get(k, 0) + 1
    n = sum(c3.values())
    cy: dict[int, int] = {}
    cyx: dict[tuple, int] = {}
    cyy: dict[tuple, int] = {}
    for (a, b, cc), v in c3.items():
        cy[b] = cy.get(b, 0) + v
        cyx[(b, cc)] = cyx.get((b, cc), 0) + v
        cyy[(a, b)] = cyy.get((a, b), 0) + v
    s = 0
    for (a, b, cc), v in c3.items():
        lx = math.log(float(v * cy[b])
                      / float(cyx[(b, cc)] * cyy[(a, b)])) * 1e12
        s += v * (int(math.floor(lx + 0.5)) if lx >= 0
                  else int(math.ceil(lx - 0.5)))
    te6 = _round6(np.array([float(s) / (n * 1e12)]))[0]
    cols = {"n_trans": n}
    for a in (0, 1):
        for b in (0, 1):
            for cc in (0, 1):
                cols[f"c{a}{b}{cc}"] = c3.get((a, b, cc), 0)
    out = pd.DataFrame({k: [v] for k, v in cols.items()})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    out["te6"] = te6
    return out


SQL_TRANSFER_ENTROPY = f"""
WITH daily AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'purchase')::INT)::BIGINT AS y
  FROM events GROUP BY 1),
bits AS (
  SELECT (y > lag(y) OVER (ORDER BY day))::INT AS yb,
         (x > lag(x) OVER (ORDER BY day))::INT AS xb,
         row_number() OVER (ORDER BY day) AS rn
  FROM daily),
tr AS (
  SELECT yb AS a, lag(yb) OVER (ORDER BY rn) AS b,
         lag(xb) OVER (ORDER BY rn) AS c
  FROM bits WHERE rn >= 2),
c3 AS (
  SELECT a, b, c, count(*)::BIGINT AS v FROM tr
  WHERE b IS NOT NULL GROUP BY 1, 2, 3),
m_y AS (SELECT b, sum(v)::BIGINT AS cy FROM c3 GROUP BY 1),
m_yx AS (SELECT b, c, sum(v)::BIGINT AS cyx FROM c3 GROUP BY 1, 2),
m_yy AS (SELECT a, b, sum(v)::BIGINT AS cyy FROM c3 GROUP BY 1, 2),
s AS (
  SELECT sum(c3.v)::BIGINT AS n,
         sum(c3.v * CAST(round(ln(CAST(c3.v * cy AS DOUBLE)
                                  / CAST(cyx * cyy AS DOUBLE))
                               * 1000000000000) AS BIGINT))::BIGINT AS sq
  FROM c3
  JOIN m_y USING (b) JOIN m_yx USING (b, c) JOIN m_yy USING (a, b)),
cells AS (
  SELECT {", ".join(
    f"coalesce(max(CASE WHEN a = {a} AND b = {b} AND c = {c} "
    f"THEN v END), 0)::BIGINT AS c{a}{b}{c}"
    for a in (0, 1) for b in (0, 1) for c in (0, 1))}
  FROM c3)
SELECT n AS n_trans, {", ".join(
    f"c{a}{b}{c}" for a in (0, 1) for b in (0, 1) for c in (0, 1))},
       round(CAST(sq AS DOUBLE) / (n * 1000000000000.0), 6) AS te6
FROM s CROSS JOIN cells
"""


# ---------------------------------------------------------------------------
# Risk ratio
# ---------------------------------------------------------------------------


def q_risk_ratio_click_purchase_daily(sf_dir: str):
    """Relative risk + Katz log CI over (user, day) 2x2 (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def flag_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        uid = (t["user_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64))
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        df = pd.DataFrame({"user_id": uid, "day": day,
                           "hc": (et == "click").astype(np.int64),
                           "hp": (et == "purchase").astype(np.int64)})
        g = df.groupby(["user_id", "day"], sort=False).max().reset_index()
        return _strip(g)

    flags = (ds.map_batches(flag_partial, batch_format="pyarrow")
               .groupby(["user_id", "day"])
               .aggregate(Max("hc", alias_name="hc"),
                          Max("hp", alias_name="hp")))

    def cell_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "hc": t["hc"].to_numpy(zero_copy_only=False).astype(np.int64),
            "hp": t["hp"].to_numpy(zero_copy_only=False).astype(np.int64)})
        g = df.groupby(["hc", "hp"], sort=False).size().rename("cnt") \
              .reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    cells = (flags.map_batches(cell_partial, batch_format="pyarrow")
                  .groupby(["hc", "hp"])
                  .aggregate(Sum("cnt", alias_name="cnt"))
                  .to_pandas())
    cnt = {(int(r.hc), int(r.hp)): int(r.cnt)
           for r in cells.itertuples(index=False)}
    a = cnt.get((1, 1), 0)
    b = cnt.get((1, 0), 0)
    c = cnt.get((0, 1), 0)
    d = cnt.get((0, 0), 0)
    rr = (float(a) / float(a + b)) / (float(c) / float(c + d))
    lnrr = math.log(rr)
    se = math.sqrt(1.0 / float(a) - 1.0 / float(a + b)
                   + 1.0 / float(c) - 1.0 / float(c + d))
    r6 = _round6(np.array([rr, lnrr, se, lnrr - 1.96 * se,
                           lnrr + 1.96 * se]))
    out = pd.DataFrame({"n11": [a], "n10": [b], "n01": [c], "n00": [d],
                        "rr6": [r6[0]], "lnrr6": [r6[1]], "se6": [r6[2]],
                        "lo6": [r6[3]], "hi6": [r6[4]]})
    for col in ("n11", "n10", "n01", "n00"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RISK_RATIO = f"""
WITH ud AS (
  SELECT user_id, CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         max((event_type = 'click')::INT) AS hc,
         max((event_type = 'purchase')::INT) AS hp
  FROM events GROUP BY 1, 2),
c AS (
  SELECT sum((hc = 1 AND hp = 1)::INT)::BIGINT AS n11,
         sum((hc = 1 AND hp = 0)::INT)::BIGINT AS n10,
         sum((hc = 0 AND hp = 1)::INT)::BIGINT AS n01,
         sum((hc = 0 AND hp = 0)::INT)::BIGINT AS n00
  FROM ud),
f AS (
  SELECT n11, n10, n01, n00,
         (CAST(n11 AS DOUBLE) / CAST(n11 + n10 AS DOUBLE))
           / (CAST(n01 AS DOUBLE) / CAST(n01 + n00 AS DOUBLE)) AS rr,
         sqrt(1.0 / CAST(n11 AS DOUBLE) - 1.0 / CAST(n11 + n10 AS DOUBLE)
              + 1.0 / CAST(n01 AS DOUBLE)
              - 1.0 / CAST(n01 + n00 AS DOUBLE)) AS se
  FROM c)
SELECT n11, n10, n01, n00,
       round(rr, 6) AS rr6, round(ln(rr), 6) AS lnrr6,
       round(se, 6) AS se6,
       round(ln(rr) - 1.96 * se, 6) AS lo6,
       round(ln(rr) + 1.96 * se, 6) AS hi6
FROM f
"""


QUERIES78: dict[str, tuple] = {
    "isotonic_purchase_rate": (q_isotonic_purchase_rate, SQL_ISOTONIC),
    "transfer_entropy_click_purchase": (q_transfer_entropy_click_purchase,
                                        SQL_TRANSFER_ENTROPY),
    "risk_ratio_click_purchase_daily": (q_risk_ratio_click_purchase_daily,
                                        SQL_RISK_RATIO),
}
