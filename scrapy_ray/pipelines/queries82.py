"""Eighty-second oracle-query batch — population estimation / extreme
co-movement / nonparametric independence:

- capture_recapture_users: Chapman's capture-recapture estimate of
  the active-user population from two "capture occasions" — the
  first and second halves of the event-day span (split at
  (min_day+max_day+1)//2).  Per-user seen_A/seen_B flags ride one
  groupby(user).Max; N-hat = (nA+1)(nB+1)/(m+1) - 1 and its Chapman
  SE are identical-expression floats of the three exact counts.
- tail_dependence_click_purchase: empirical upper/lower tail
  dependence of daily click vs purchase counts: with exact disc
  p90/p10 thresholds per series, lambda_U = P(X > qx90 | Y > qy90)
  and lambda_L = P(X <= qx10 | Y <= qy10) — exact-int exceedance
  ratios.
- hoeffding_d_qty_discount: Hoeffding's D independence statistic on
  the bounded (quantity, discount-pct) cell matrix (the
  distance-corr cell build, ~550 cells) with midrank tie handling
  carried EXACTLY: doubled marginal midranks 2R = 2*cntless + tie +
  1, quadrupled concordance 4Q = 4 + 4A + 2B + (n_cell - 1) (A =
  both-strictly-less mass, B = tie-one-coordinate-less-other mass,
  from one cells x cells pass), and the three D-sums scaled by 16 so
  the numerator num16 = D2 - 2(n-2)D3 + (n-2)(n-3)D1 is one exact
  integer (~1e30 at sf0.1 — Python int / HUGEINT, reported as
  VARCHAR); D and 30D finalize identical-expression over
  16*n(n-1)(n-2)(n-3)(n-4).
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

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Capture-recapture
# ---------------------------------------------------------------------------


def q_capture_recapture_users(sf_dir: str):
    """Chapman population estimate from half-span capture occasions
    (docstring above)."""
    from scrapy_ray.pipelines.queries import _ts_minmax_us
    mn, mx = _ts_minmax_us(sf_dir, "events")
    mid = (mn // _US_PER_DAY + mx // _US_PER_DAY + 1) // 2

    ds = _pq(sf_dir, "events", columns=["user_id", "ts"])

    def flag_partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        df = pd.DataFrame({"user_id": uid,
                           "sa": (day < mid).astype(np.int64),
                           "sb": (day >= mid).astype(np.int64)})
        g = df.groupby("user_id", sort=False).max().reset_index()
        return _strip(g)

    flags = (ds.map_batches(flag_partial, batch_format="pyarrow")
               .groupby("user_id")
               .aggregate(Max("sa", alias_name="sa"),
                          Max("sb", alias_name="sb"))
               .to_pandas())
    sa = flags["sa"].to_numpy(np.int64)
    sb = flags["sb"].to_numpy(np.int64)
    na = int(sa.sum())
    nb = int(sb.sum())
    m = int((sa & sb).sum())
    nhat = float((na + 1) * (nb + 1)) / float(m + 1) - 1.0
    se = math.sqrt(float((na + 1) * (nb + 1) * (na - m) * (nb - m))
                   / float((m + 1) * (m + 1) * (m + 2)))
    out = pd.DataFrame({"n_a": [na], "n_b": [nb], "m_both": [m],
                        "nhat6": [_round6(np.array([nhat]))[0]],
                        "se6": [_round6(np.array([se]))[0]]})
    for col in ("n_a", "n_b", "m_both"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CAPTURE_RECAPTURE = f"""
WITH sp AS (
  SELECT (min(epoch_us(ts)) // {_US_PER_DAY}
          + max(epoch_us(ts)) // {_US_PER_DAY} + 1) // 2 AS mid
  FROM events),
f AS (
  SELECT user_id,
         max((epoch_us(ts) // {_US_PER_DAY} < mid)::INT) AS sa,
         max((epoch_us(ts) // {_US_PER_DAY} >= mid)::INT) AS sb
  FROM events CROSS JOIN sp GROUP BY 1),
c AS (
  SELECT sum(sa)::BIGINT AS na, sum(sb)::BIGINT AS nb,
         sum((sa = 1 AND sb = 1)::INT)::BIGINT AS m
  FROM f)
SELECT na AS n_a, nb AS n_b, m AS m_both,
       round(CAST((na + 1) * (nb + 1) AS DOUBLE)
             / CAST(m + 1 AS DOUBLE) - 1.0, 6) AS nhat6,
       round(sqrt(CAST((na + 1)::HUGEINT * (nb + 1) * (na - m) * (nb - m)
                       AS DOUBLE)
                  / CAST((m + 1)::HUGEINT * (m + 1) * (m + 2)
                         AS DOUBLE)), 6) AS se6
FROM c
"""


# ---------------------------------------------------------------------------
# Tail dependence
# ---------------------------------------------------------------------------


def q_tail_dependence_click_purchase(sf_dir: str):
    """Empirical upper/lower tail-dependence of daily click vs purchase
    counts (docstring above)."""
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
    x = daily["x"].to_numpy(np.int64)
    y = daily["y"].to_numpy(np.int64)
    n = len(x)
    xs = np.sort(x)
    ys = np.sort(y)
    qx90 = int(xs[math.ceil(0.9 * n) - 1])
    qy90 = int(ys[math.ceil(0.9 * n) - 1])
    qx10 = int(xs[math.ceil(0.1 * n) - 1])
    qy10 = int(ys[math.ceil(0.1 * n) - 1])
    ku = int((y > qy90).sum())
    mu = int(((x > qx90) & (y > qy90)).sum())
    kl = int((y <= qy10).sum())
    ml = int(((x <= qx10) & (y <= qy10)).sum())
    lu = float(mu) / float(ku)
    ll = float(ml) / float(kl)
    out = pd.DataFrame({"n_days": [n], "k_upper": [ku], "m_upper": [mu],
                        "k_lower": [kl], "m_lower": [ml],
                        "lambda_u6": [_round6(np.array([lu]))[0]],
                        "lambda_l6": [_round6(np.array([ll]))[0]]})
    for col in ("n_days", "k_upper", "m_upper", "k_lower", "m_lower"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_TAIL_DEP = f"""
WITH daily AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'purchase')::INT)::BIGINT AS y
  FROM events GROUP BY 1),
t AS (
  SELECT count(*)::BIGINT AS n,
         quantile_disc(x, 0.9) AS qx90, quantile_disc(y, 0.9) AS qy90,
         quantile_disc(x, 0.1) AS qx10, quantile_disc(y, 0.1) AS qy10
  FROM daily),
c AS (
  SELECT max(n) AS n,
         sum((y > qy90)::INT)::BIGINT AS ku,
         sum((x > qx90 AND y > qy90)::INT)::BIGINT AS mu,
         sum((y <= qy10)::INT)::BIGINT AS kl,
         sum((x <= qx10 AND y <= qy10)::INT)::BIGINT AS ml
  FROM daily CROSS JOIN t)
SELECT n AS n_days, ku AS k_upper, mu AS m_upper, kl AS k_lower,
       ml AS m_lower,
       round(CAST(mu AS DOUBLE) / CAST(ku AS DOUBLE), 6) AS lambda_u6,
       round(CAST(ml AS DOUBLE) / CAST(kl AS DOUBLE), 6) AS lambda_l6
FROM c
"""


# ---------------------------------------------------------------------------
# Hoeffding's D
# ---------------------------------------------------------------------------


def q_hoeffding_d_qty_discount(sf_dir: str):
    """Hoeffding's D with exact midrank tie handling on bounded cells
    (docstring above)."""
    ds = _pq(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def cpart(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = t["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64) * 100.0
        df = pd.DataFrame({"x": np.floor(q + 0.5).astype(np.int64),
                           "y": np.floor(d + 0.5).astype(np.int64),
                           "n": np.int64(1)})
        g = df.groupby(["x", "y"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["x", "y"]).aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    x = cells["x"].to_numpy(np.int64)
    y = cells["y"].to_numpy(np.int64)
    cn = cells["n"].to_numpy(np.int64)
    n = int(cn.sum())
    lt_x = (x[:, None] > x[None, :])
    eq_x = (x[:, None] == x[None, :])
    lt_y = (y[:, None] > y[None, :])
    eq_y = (y[:, None] == y[None, :])
    cntless_x = (lt_x * cn[None, :]).sum(axis=1)
    tie_x = (eq_x * cn[None, :]).sum(axis=1)
    cntless_y = (lt_y * cn[None, :]).sum(axis=1)
    tie_y = (eq_y * cn[None, :]).sum(axis=1)
    r2 = 2 * cntless_x + tie_x + 1
    s2 = 2 * cntless_y + tie_y + 1
    a = ((lt_x & lt_y) * cn[None, :]).sum(axis=1)
    b = (((eq_x & lt_y) | (lt_x & eq_y)) * cn[None, :]).sum(axis=1)
    q4 = 4 + 4 * a + 2 * b + (cn - 1)
    d1 = sum(int(c) * (int(q) - 4) * (int(q) - 8)
             for c, q in zip(cn, q4))
    d2 = sum(int(c) * (int(r) - 2) * (int(r) - 4)
             * (int(s) - 2) * (int(s) - 4)
             for c, r, s in zip(cn, r2, s2))
    d3 = sum(int(c) * (int(r) - 4) * (int(s) - 4) * (int(q) - 4)
             for c, r, s, q in zip(cn, r2, s2, q4))
    num16 = d2 - 2 * (n - 2) * d3 + (n - 2) * (n - 3) * d1
    den = 16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    dstat = float(num16) / float(den)
    out = pd.DataFrame({"n": [n], "num16": [str(num16)],
                        "d6": [_round6(np.array([dstat * 1000.0]))[0]],
                        "d30_6": [_round6(np.array(
                            [30.0 * dstat]))[0]]})
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_HOEFFDING = """
WITH cells AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_discount * 100.0) AS BIGINT) AS y,
         count(*)::BIGINT AS n
  FROM lineitem GROUP BY 1, 2),
t AS (SELECT sum(n)::BIGINT AS nt FROM cells),
rk AS (
  SELECT p.x, p.y, p.n,
         2 * sum(CASE WHEN q.x < p.x THEN q.n ELSE 0 END)
           + sum(CASE WHEN q.x = p.x THEN q.n ELSE 0 END) + 1 AS r2,
         2 * sum(CASE WHEN q.y < p.y THEN q.n ELSE 0 END)
           + sum(CASE WHEN q.y = p.y THEN q.n ELSE 0 END) + 1 AS s2,
         4 + 4 * sum(CASE WHEN q.x < p.x AND q.y < p.y
                     THEN q.n ELSE 0 END)
           + 2 * sum(CASE WHEN (q.x = p.x AND q.y < p.y)
                            OR (q.x < p.x AND q.y = p.y)
                     THEN q.n ELSE 0 END)
           + (p.n - 1) AS q4
  FROM cells p CROSS JOIN cells q
  GROUP BY p.x, p.y, p.n),
s AS (
  SELECT sum(n::HUGEINT * (q4 - 4) * (q4 - 8)) AS d1,
         sum(n::HUGEINT * (r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4))
           AS d2,
         sum(n::HUGEINT * (r2 - 4) * (s2 - 4) * (q4 - 4)) AS d3
  FROM rk),
f AS (
  SELECT nt,
         d2 - 2 * (nt - 2)::HUGEINT * d3
            + (nt - 2)::HUGEINT * (nt - 3) * d1 AS num16,
         16::HUGEINT * nt * (nt - 1) * (nt - 2) * (nt - 3) * (nt - 4)
           AS den
  FROM s CROSS JOIN t)
SELECT nt AS n, CAST(num16 AS VARCHAR) AS num16,
       round(CAST(num16 AS DOUBLE) / CAST(den AS DOUBLE) * 1000.0, 6)
         AS d6,
       round(30.0 * (CAST(num16 AS DOUBLE) / CAST(den AS DOUBLE)), 6)
         AS d30_6
FROM f
"""


QUERIES82: dict[str, tuple] = {
    "capture_recapture_users": (q_capture_recapture_users,
                                SQL_CAPTURE_RECAPTURE),
    "tail_dependence_click_purchase": (q_tail_dependence_click_purchase,
                                       SQL_TAIL_DEP),
    "hoeffding_d_qty_discount": (q_hoeffding_d_qty_discount,
                                 SQL_HOEFFDING),
}
