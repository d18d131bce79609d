"""One-hundred-thirty-first oracle-query batch — robust mode and
chaos/recurrence diagnostics:

- half_sample_mode_orders: the half-sample mode of order prices —
  repeatedly select the narrowest window holding ceil(len/2) of the
  current window's sorted values (tie → leftmost) until ≤2 remain.
  PURE integers throughout (widths are cent differences, ties break
  on start rank); the oracle replays the halving in a recursive CTE
  that re-scans the ranked base between (lo, hi) with an
  offset-join argmin per level. The level-1 shorth (mean of the
  first minimal half) rides along as one exact ratio.
- rqa_daily: recurrence quantification of $1000-quantized daily
  revenue (upper-triangle recurrence |v_i−v_j| ≤ eps,
  eps = range//50): recurrence rate, determinism (share of recurrent
  points on diagonal lines ≥2, i.e. with a recurrent (i−1,j−1) or
  (i+1,j+1) neighbor) and laminarity (vertical neighbor (i,j∓1))
  — all PURE integer counts, one division each.
- correlation_integral_daily: Grassberger-Procaccia correlation
  integrals C_1(eps), C_1(eps/2), C_2(eps) on the same series; the
  correlation-dimension estimate D2 = ln(C1/C1half)/ln 2 and the
  K2 entropy ln(C1/C2) finalize from exact pair counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip


# ---------------------------------------------------------------------------
# Half-sample mode
# ---------------------------------------------------------------------------


def q_half_sample_mode_orders(sf_dir: str):
    """Half-sample mode of order price cents (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"cents": c, "c": np.int64(1)}) \
            .groupby("cents", sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(hpart, batch_format="pyarrow")
           .groupby("cents").aggregate(Sum("c", alias_name="c"))
           .to_pandas().sort_values("cents").reset_index(drop=True))
    x = np.repeat(h["cents"].to_numpy(np.int64),
                  h["c"].to_numpy(np.int64))
    lo, hi = 0, len(x) - 1            # inclusive 0-based window
    levels = 0
    sh_sum = sh_cnt = 0
    while hi - lo + 1 > 2:
        ln = hi - lo + 1
        hh = (ln + 1) // 2
        starts = np.arange(lo, hi - hh + 2)
        widths = x[starts + hh - 1] - x[starts]
        i = int(starts[int(np.argmin(widths))])   # first min = leftmost
        lo, hi = i, i + hh - 1
        levels += 1
        if levels == 1:
            sh_sum = int(x[lo:hi + 1].sum())
            sh_cnt = hi - lo + 1
    mode = int((int(x[lo]) + int(x[hi])) // 2) if hi > lo else int(x[lo])
    shorth = float(sh_sum) / float(sh_cnt)
    out = pd.DataFrame({"n": [len(x)], "levels": [levels],
                        "mode_cents": [mode],
                        "shorth6": [_round6(np.array([shorth]))[0]]})
    for col in ("n", "levels", "mode_cents"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HALF_SAMPLE_MODE = """
WITH RECURSIVE s AS MATERIALIZED (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x,
         row_number() OVER (ORDER BY CAST(round(o_totalprice * 100)
                                          AS BIGINT)) AS rn
  FROM orders),
n AS (SELECT count(*)::BIGINT AS n FROM s),
-- the halving window lengths depend only on n, so the per-level
-- window size h is precomputable and every width join is an
-- EQUI-join (a LATERAL argmin with a data-dependent offset forced a
-- nested loop: 40 s at sf0.01)
-- nested ceil-halving has the closed form len_k = ceil(n / 2^k), so
-- the level table needs no second recursive CTE (two recursive CTEs
-- in one WITH RECURSIVE silently stopped the hsm recursion)
lvh AS (
  SELECT g.lv, (n.n + (1::BIGINT << g.lv) - 1) // (1::BIGINT << g.lv)
           AS h
  FROM (SELECT unnest(range(1, 41)) AS lv) g CROSS JOIN n
  WHERE (n.n + (1::BIGINT << (g.lv - 1)) - 1)
        // (1::BIGINT << (g.lv - 1)) > 2),
-- NOT MATERIALIZED: when the recursive term's LATERAL reads from a
-- MATERIALIZED CTE the recursion silently stops at the anchor
-- (plain scalar subqueries on the MATERIALIZED s are fine)
wid AS (
  SELECT l.lv, a.rn AS srn, b.x - a.x AS w, l.h
  FROM lvh l JOIN s a ON true JOIN s b ON b.rn = a.rn + l.h - 1),
hsm AS (
  SELECT 1::BIGINT AS lo, n.n AS hi, 0::BIGINT AS lv,
         0::BIGINT AS sh_sum, 0::BIGINT AS sh_cnt
  FROM n
  UNION ALL
  SELECT nxt.lo, nxt.hi, hsm.lv + 1,
         CASE WHEN hsm.lv = 0
              THEN (SELECT sum(x) FROM s
                    WHERE rn BETWEEN nxt.lo AND nxt.hi)
              ELSE hsm.sh_sum END,
         CASE WHEN hsm.lv = 0 THEN nxt.hi - nxt.lo + 1
              ELSE hsm.sh_cnt END
  FROM hsm, LATERAL (
    SELECT w.srn AS lo, w.srn + w.h - 1 AS hi
    FROM wid w
    WHERE w.lv = hsm.lv + 1 AND w.srn >= hsm.lo
      AND w.srn + w.h - 1 <= hsm.hi
    ORDER BY w.w, w.srn LIMIT 1) nxt
  WHERE hsm.hi - hsm.lo + 1 > 2),
fin AS (
  SELECT lo, hi, lv, sh_sum, sh_cnt,
         row_number() OVER (ORDER BY lv DESC) AS r
  FROM hsm)
SELECT (SELECT n FROM n) AS n, lv AS levels,
       CASE WHEN hi > lo
            THEN ((SELECT x FROM s WHERE rn = fin.lo)
                  + (SELECT x FROM s WHERE rn = fin.hi)) // 2
            ELSE (SELECT x FROM s WHERE rn = fin.lo) END AS mode_cents,
       round(CAST(sh_sum AS DOUBLE) / CAST(sh_cnt AS DOUBLE), 6)
         AS shorth6
FROM fin WHERE r = 1
"""


# ---------------------------------------------------------------------------
# shared recurrence machinery
# ---------------------------------------------------------------------------


def _daily_v_eps(sf_dir: str):
    cells = _daily_cents(sf_dir)
    v = cells["c"].to_numpy(np.int64) // 100000
    eps = int((int(v.max()) - int(v.min())) // 50)
    return v, eps


def _upper_rec(v: np.ndarray, eps: int) -> np.ndarray:
    n = len(v)
    m = np.abs(v[:, None] - v[None, :]) <= eps
    m &= np.triu(np.ones((n, n), bool), k=1)
    return m


# ---------------------------------------------------------------------------
# RQA
# ---------------------------------------------------------------------------


def q_rqa_daily(sf_dir: str):
    """Recurrence rate / determinism / laminarity (docstring above)."""
    v, eps = _daily_v_eps(sf_dir)
    n = len(v)
    m = _upper_rec(v, eps)
    n_rec = int(m.sum())
    diag = np.zeros_like(m)
    diag[1:, 1:] |= m[:-1, :-1]
    diag[:-1, :-1] |= m[1:, 1:]
    det_pts = int((m & diag).sum())
    vert = np.zeros_like(m)
    vert[:, 1:] |= m[:, :-1]
    vert[:, :-1] |= m[:, 1:]
    lam_pts = int((m & vert).sum())
    rr = float(2 * n_rec) / float(n * (n - 1))
    out = pd.DataFrame({
        "n_days": [n], "eps": [eps], "n_rec": [n_rec],
        "det_pts": [det_pts], "lam_pts": [lam_pts],
        "rr6": [_round6(np.array([rr]))[0]],
        "det6": [_round6(np.array([float(det_pts)
                                   / float(n_rec)]))[0]],
        "lam6": [_round6(np.array([float(lam_pts)
                                   / float(n_rec)]))[0]]})
    for col in ("n_days", "eps", "n_rec", "det_pts", "lam_pts"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RQA = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS v
  FROM orders GROUP BY 1),
s AS (SELECT v, row_number() OVER (ORDER BY d) AS t FROM daily),
ep AS (SELECT (max(v) - min(v)) // 50 AS eps FROM s),
r AS MATERIALIZED (
  SELECT a.t AS i, b.t AS j
  FROM s a JOIN s b ON b.t > a.t CROSS JOIN ep
  WHERE abs(b.v - a.v) <= ep.eps),
c AS (
  SELECT count(*)::BIGINT AS n_rec,
         sum((EXISTS (SELECT 1 FROM r r2
                      WHERE r2.i = r.i - 1 AND r2.j = r.j - 1)
              OR EXISTS (SELECT 1 FROM r r3
                         WHERE r3.i = r.i + 1 AND r3.j = r.j + 1))
             ::INT)::BIGINT AS det_pts,
         sum((EXISTS (SELECT 1 FROM r r4
                      WHERE r4.i = r.i AND r4.j = r.j - 1)
              OR EXISTS (SELECT 1 FROM r r5
                         WHERE r5.i = r.i AND r5.j = r.j + 1))
             ::INT)::BIGINT AS lam_pts
  FROM r),
nn AS (SELECT count(*)::BIGINT AS n FROM s)
SELECT n AS n_days, (SELECT eps FROM ep)::BIGINT AS eps, n_rec,
       det_pts, lam_pts,
       round(CAST(2 * n_rec AS DOUBLE)
             / CAST(n * (n - 1) AS DOUBLE), 6) AS rr6,
       round(CAST(det_pts AS DOUBLE) / CAST(n_rec AS DOUBLE), 6)
         AS det6,
       round(CAST(lam_pts AS DOUBLE) / CAST(n_rec AS DOUBLE), 6)
         AS lam6
FROM c CROSS JOIN nn
"""


# ---------------------------------------------------------------------------
# Correlation integral
# ---------------------------------------------------------------------------


def q_correlation_integral_daily(sf_dir: str):
    """C1(eps), C1(eps/2), C2(eps), D2 and K2 (docstring above)."""
    v, eps = _daily_v_eps(sf_dir)
    n = len(v)
    m = _upper_rec(v, eps)
    mh = _upper_rec(v, eps // 2)
    c1_n = int(m.sum())
    c1h_n = int(mh.sum())
    c2_n = int((m[:-1, :-1] & m[1:, 1:]).sum())
    pairs = n * (n - 1) // 2
    pairs2 = (n - 1) * (n - 2) // 2
    c1 = float(c1_n) / float(pairs)
    c1h = float(c1h_n) / float(pairs)
    c2 = float(c2_n) / float(pairs2)
    d2 = np.log(c1 / c1h) / np.log(2.0)
    k2 = np.log(c1 / c2)
    out = pd.DataFrame({
        "n_days": [n], "eps": [eps], "c1_n": [c1_n],
        "c1h_n": [c1h_n], "c2_n": [c2_n],
        "c1_6": [_round6(np.array([c1]))[0]],
        "d2_6": [_round6(np.array([d2]))[0]],
        "k2_6": [_round6(np.array([k2]))[0]]})
    for col in ("n_days", "eps", "c1_n", "c1h_n", "c2_n"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CORR_INTEGRAL = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS v
  FROM orders GROUP BY 1),
s AS (SELECT v, row_number() OVER (ORDER BY d) AS t FROM daily),
ep AS (SELECT (max(v) - min(v)) // 50 AS eps FROM s),
nn AS (SELECT count(*)::BIGINT AS n FROM s),
p AS (
  SELECT a.t AS i, b.t AS j, abs(b.v - a.v) AS w
  FROM s a JOIN s b ON b.t > a.t),
cnt AS (
  SELECT sum((w <= (SELECT eps FROM ep))::INT)::BIGINT AS c1_n,
         sum((w <= (SELECT eps FROM ep) // 2)::INT)::BIGINT AS c1h_n
  FROM p),
c2 AS (
  SELECT count(*)::BIGINT AS c2_n
  FROM p p1 JOIN p p2 ON p2.i = p1.i + 1 AND p2.j = p1.j + 1
            CROSS JOIN ep
  WHERE p1.w <= ep.eps AND p2.w <= ep.eps),
f AS (
  SELECT c1_n, c1h_n, c2_n, n,
         CAST(c1_n AS DOUBLE)
           / CAST(n * (n - 1) // 2 AS DOUBLE) AS c1,
         CAST(c1h_n AS DOUBLE)
           / CAST(n * (n - 1) // 2 AS DOUBLE) AS c1h,
         CAST(c2_n AS DOUBLE)
           / CAST((n - 1) * (n - 2) // 2 AS DOUBLE) AS c2
  FROM cnt CROSS JOIN c2 CROSS JOIN nn)
SELECT n AS n_days, (SELECT eps FROM ep)::BIGINT AS eps,
       c1_n, c1h_n, c2_n, round(c1, 6) AS c1_6,
       round(ln(c1 / c1h) / ln(2.0), 6) AS d2_6,
       round(ln(c1 / c2), 6) AS k2_6
FROM f
"""


QUERIES131: dict[str, tuple] = {
    "half_sample_mode_orders": (q_half_sample_mode_orders,
                                SQL_HALF_SAMPLE_MODE),
    "rqa_daily": (q_rqa_daily, SQL_RQA),
    "correlation_integral_daily": (q_correlation_integral_daily,
                                   SQL_CORR_INTEGRAL),
}
