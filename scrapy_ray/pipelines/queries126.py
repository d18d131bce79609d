"""One-hundred-twenty-sixth oracle-query batch — coding cost,
inequality decomposition, and piecewise trend:

- huffman_cost_event_types: exact Huffman total code cost of the
  event-type distribution. The total cost equals the sum of internal
  node weights, which is invariant to tie-breaking among optimal
  trees — so the oracle replays the 4 merges with a sorted-LIST state
  through chained CTEs (list_sort + slice + append), all integers.
  Entropy rides along from per-type 1e-9-quantized p·log2 p terms and
  efficiency = H/avg finalizes identically.
- theil_decomposition_segments: Theil T inequality of order prices
  decomposed within/between customer market segments. Per-row
  y·ln(y) terms are 1e-4-quantized (exact int sums ride the
  shuffle); per-segment within/between contributions are
  1e-9-quantized so the 5-term sums are exact and order-free;
  T_global computes independently from the global sums.
- segmented_regression_daily: two-piece OLS of $1000-quantized daily
  revenue on day index with the breakpoint chosen by exact argmin of
  the floor-quantized total SSE (the kulldorff device — no float
  ties). Both side SSEs clear to
  ((n·Syy−Sy²)(n·Sxx−Sx²)−(n·Sxy−Sx·Sy)²)/(n·(n·Sxx−Sx²)) on exact
  prefix/suffix integer sums.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq_
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip


def _rint(x: float) -> int:
    return int(np.sign(x) * np.floor(np.abs(x) + 0.5))


# ---------------------------------------------------------------------------
# Huffman cost
# ---------------------------------------------------------------------------


def q_huffman_cost_event_types(sf_dir: str):
    """Exact Huffman total bits for event types (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        g = pd.DataFrame({"t": et, "c": np.int64(1)}) \
            .groupby("t", sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    cn = (ds.map_batches(cpart, batch_format="pyarrow")
            .groupby("t").aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    c = sorted(int(x) for x in cn["c"])
    n = sum(c)
    total = 0
    s = list(c)
    while len(s) > 1:
        s.sort()
        m = s[0] + s[1]
        total += m
        s = s[2:] + [m]
    e9 = 0
    for ci in c:
        p = float(ci) / float(n)
        e9 += _rint(-(p * (np.log(p) / np.log(2.0))) * 1000000000.0)
    avg = float(total) / float(n)
    ent = float(e9) / 1000000000.0
    out = pd.DataFrame({"n_events": [n], "total_bits": [total],
                        "avg6": [_round6(np.array([avg]))[0]],
                        "entropy6": [_round6(np.array([ent]))[0]],
                        "eff6": [_round6(np.array([ent / avg]))[0]]})
    for col in ("n_events", "total_bits"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HUFFMAN = """
WITH c AS (
  SELECT event_type AS t, count(*)::BIGINT AS c FROM events GROUP BY 1),
tot AS (
  SELECT sum(c)::BIGINT AS n,
         sum(CAST(round(-((CAST(c AS DOUBLE)
               / CAST((SELECT sum(c) FROM c) AS DOUBLE))
               * (ln(CAST(c AS DOUBLE)
                     / CAST((SELECT sum(c) FROM c) AS DOUBLE))
                  / ln(2.0))) * 1000000000.0) AS BIGINT))::BIGINT AS e9
  FROM c),
l0 AS (SELECT list_sort(list(c)) AS s FROM c),
l1 AS (SELECT s[1] + s[2] AS t1,
              list_sort(list_append(s[3:], s[1] + s[2])) AS s FROM l0),
l2 AS (SELECT t1, s[1] + s[2] AS t2,
              list_sort(list_append(s[3:], s[1] + s[2])) AS s FROM l1),
l3 AS (SELECT t1, t2, s[1] + s[2] AS t3,
              list_sort(list_append(s[3:], s[1] + s[2])) AS s FROM l2),
l4 AS (SELECT t1 + t2 + t3 + s[1] + s[2] AS total FROM l3),
f AS (
  SELECT n, total,
         CAST(total AS DOUBLE) / CAST(n AS DOUBLE) AS avg,
         CAST(e9 AS DOUBLE) / 1000000000.0 AS ent
  FROM l4 CROSS JOIN tot)
SELECT n AS n_events, total::BIGINT AS total_bits, round(avg, 6) AS avg6,
       round(ent, 6) AS entropy6, round(ent / avg, 6) AS eff6
FROM f
"""


# ---------------------------------------------------------------------------
# Theil within/between decomposition
# ---------------------------------------------------------------------------


def q_theil_decomposition_segments(sf_dir: str):
    """Theil T of order prices split within/between segments."""
    cust = pq_.read_table(os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey", "c_mktsegment"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    segs = np.asarray(cust["c_mktsegment"].to_pylist())
    seg_names = sorted(set(segs))
    sidx = {s: i for i, s in enumerate(seg_names)}
    arr = np.zeros(int(ck.max()) + 1, np.int8)
    arr[ck] = np.array([sidx[s] for s in segs], np.int8)

    ds = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def tpart(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        y = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        yl = y.astype(np.float64) * np.log(y.astype(np.float64)) \
            * 10000.0
        r4 = (np.sign(yl) * np.floor(np.abs(yl) + 0.5)).astype(np.int64)
        g = pd.DataFrame({"g": arr[k].astype(np.int64), "n": np.int64(1), "y": y,
                          "s4": r4}) \
            .groupby("g", sort=False).sum().reset_index()
        for col in ("n", "y", "s4"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    pg = (ds.map_batches(tpart, batch_format="pyarrow")
            .groupby("g").aggregate(Sum("n", alias_name="n"),
                                    Sum("y", alias_name="y"),
                                    Sum("s4", alias_name="s4"))
            .to_pandas())
    n_all = int(pg["n"].sum())
    y_all = int(pg["y"].sum())
    s4_all = int(pg["s4"].sum())
    w9 = b9 = 0
    for _, r in pg.iterrows():
        ng, yg, s4g = int(r["n"]), int(r["y"]), int(r["s4"])
        tg = (float(s4g) / 10000.0 / float(yg)
              - np.log(float(yg) / float(ng)))
        w9 += _rint((float(yg) / float(y_all)) * tg * 1000000000.0)
        b9 += _rint((float(yg) / float(y_all))
                    * np.log((float(yg) / float(y_all))
                             / (float(ng) / float(n_all)))
                    * 1000000000.0)
    t_glob = (float(s4_all) / 10000.0 / float(y_all)
              - np.log(float(y_all) / float(n_all)))
    out = pd.DataFrame({
        "n_orders": [n_all],
        "t_global6": [_round6(np.array([t_glob]))[0]],
        "t_within6": [_round6(np.array([float(w9) / 1e9]))[0]],
        "t_between6": [_round6(np.array([float(b9) / 1e9]))[0]]})
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out


SQL_THEIL_DECOMP = """
WITH o AS (
  SELECT c_mktsegment AS seg,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey),
pg AS (
  SELECT seg, count(*)::BIGINT AS ng, sum(y)::BIGINT AS yg,
         sum(CAST(round(CAST(y AS DOUBLE) * ln(CAST(y AS DOUBLE))
                        * 10000.0) AS BIGINT))::BIGINT AS s4
  FROM o GROUP BY 1),
tot AS (
  SELECT sum(ng)::BIGINT AS n_all, sum(yg)::BIGINT AS y_all,
         sum(s4)::BIGINT AS s4_all
  FROM pg),
terms AS (
  SELECT
    sum(CAST(round((CAST(yg AS DOUBLE) / CAST(y_all AS DOUBLE))
          * (CAST(s4 AS DOUBLE) / 10000.0 / CAST(yg AS DOUBLE)
             - ln(CAST(yg AS DOUBLE) / CAST(ng AS DOUBLE)))
          * 1000000000.0) AS BIGINT))::BIGINT AS w9,
    sum(CAST(round((CAST(yg AS DOUBLE) / CAST(y_all AS DOUBLE))
          * ln((CAST(yg AS DOUBLE) / CAST(y_all AS DOUBLE))
               / (CAST(ng AS DOUBLE) / CAST(n_all AS DOUBLE)))
          * 1000000000.0) AS BIGINT))::BIGINT AS b9
  FROM pg CROSS JOIN tot)
SELECT n_all AS n_orders,
       round(CAST(s4_all AS DOUBLE) / 10000.0 / CAST(y_all AS DOUBLE)
             - ln(CAST(y_all AS DOUBLE) / CAST(n_all AS DOUBLE)), 6)
         AS t_global6,
       round(CAST(w9 AS DOUBLE) / 1000000000.0, 6) AS t_within6,
       round(CAST(b9 AS DOUBLE) / 1000000000.0, 6) AS t_between6
FROM terms CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# Segmented regression with exact breakpoint argmin
# ---------------------------------------------------------------------------


def q_segmented_regression_daily(sf_dir: str):
    """Two-piece OLS of daily revenue with floor-quantized SSE argmin."""
    cells = _daily_cents(sf_dir)
    v = [int(c) // 100000 for c in cells["c"]]
    n = len(v)

    def pref(seq):
        out = [0]
        for x in seq:
            out.append(out[-1] + x)
        return out

    cy = pref(v)
    cxy = pref(t * x for t, x in enumerate(v, start=1))
    cyy = pref(x * x for x in v)

    def sums(lo, hi):            # t in [lo, hi], 1-based inclusive
        m = hi - lo + 1
        sx = (lo + hi) * m // 2
        sxx = (hi * (hi + 1) * (2 * hi + 1)
               - (lo - 1) * lo * (2 * lo - 1)) // 6
        sy = cy[hi] - cy[lo - 1]
        sxy = cxy[hi] - cxy[lo - 1]
        syy = cyy[hi] - cyy[lo - 1]
        return m, sx, sxx, sy, sxy, syy

    def sse(lo, hi):
        m, sx, sxx, sy, sxy, syy = sums(lo, hi)
        num = ((m * syy - sy * sy) * (m * sxx - sx * sx)
               - (m * sxy - sx * sy) * (m * sxy - sx * sy))
        return float(num) / float(m * (m * sxx - sx * sx))

    best = None
    for k in range(3, n - 2):
        tot = sse(1, k) + sse(k + 1, n)
        fq = int(np.floor(tot * 1000.0))
        if best is None or (fq, k) < best[:2]:
            best = (fq, k, tot)
    _, k, tot = best

    def slope(lo, hi):
        m, sx, sxx, sy, sxy, _ = sums(lo, hi)
        return (float(m * sxy - sx * sy)
                / float(m * sxx - sx * sx))

    out = pd.DataFrame({
        "n_days": [n], "k_break": [k],
        "b_left6": [_round6(np.array([slope(1, k)]))[0]],
        "b_right6": [_round6(np.array([slope(k + 1, n)]))[0]],
        "sse6": [_round6(np.array([tot]))[0]]})
    for col in ("n_days", "k_break"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SEGMENTED_REG = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS v
  FROM orders GROUP BY 1),
s AS (SELECT v, row_number() OVER (ORDER BY d) AS t FROM daily),
ns AS (SELECT count(*)::BIGINT AS n, sum(CAST(v AS HUGEINT)) AS ty,
              sum(CAST(t AS HUGEINT) * v) AS txy,
              sum(CAST(v AS HUGEINT) * v) AS tyy
       FROM s),
pre AS (
  SELECT t AS k,
         sum(CAST(v AS HUGEINT)) OVER w AS py,
         sum(CAST(t AS HUGEINT) * v) OVER w AS pxy,
         sum(CAST(v AS HUGEINT) * v) OVER w AS pyy
  FROM s
  WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)),
cand AS (
  SELECT k, n,
         CAST(k AS HUGEINT) AS ml,
         CAST((1 + k) AS HUGEINT) * k // 2 AS sxl,
         CAST(k AS HUGEINT) * (k + 1) * (2 * k + 1) // 6 AS sxxl,
         py AS syl, pxy AS sxyl, pyy AS syyl,
         CAST(n - k AS HUGEINT) AS mr,
         CAST((k + 1 + n) AS HUGEINT) * (n - k) // 2 AS sxr,
         (CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1)
          - CAST(k AS HUGEINT) * (k + 1) * (2 * k + 1)) // 6 AS sxxr,
         ty - py AS syr, txy - pxy AS sxyr, tyy - pyy AS syyr
  FROM pre CROSS JOIN ns
  WHERE k >= 3 AND k <= n - 3),
sse AS (
  SELECT k, n,
         CAST((ml * syyl - syl * syl) * (ml * sxxl - sxl * sxl)
              - (ml * sxyl - sxl * syl) * (ml * sxyl - sxl * syl)
              AS DOUBLE)
           / CAST(ml * (ml * sxxl - sxl * sxl) AS DOUBLE)
         + CAST((mr * syyr - syr * syr) * (mr * sxxr - sxr * sxr)
                - (mr * sxyr - sxr * syr) * (mr * sxyr - sxr * syr)
                AS DOUBLE)
           / CAST(mr * (mr * sxxr - sxr * sxr) AS DOUBLE) AS tot,
         CAST(ml * sxyl - sxl * syl AS DOUBLE)
           / CAST(ml * sxxl - sxl * sxl AS DOUBLE) AS bl,
         CAST(mr * sxyr - sxr * syr AS DOUBLE)
           / CAST(mr * sxxr - sxr * sxr AS DOUBLE) AS br
  FROM cand),
pick AS (
  SELECT k, n, tot, bl, br,
         row_number() OVER (ORDER BY CAST(floor(tot * 1000.0)
                                          AS BIGINT), k) AS rn
  FROM sse)
SELECT n AS n_days, k AS k_break, round(bl, 6) AS b_left6,
       round(br, 6) AS b_right6, round(tot, 6) AS sse6
FROM pick WHERE rn = 1
"""


QUERIES126: dict[str, tuple] = {
    "huffman_cost_event_types": (q_huffman_cost_event_types,
                                 SQL_HUFFMAN),
    "theil_decomposition_segments": (q_theil_decomposition_segments,
                                     SQL_THEIL_DECOMP),
    "segmented_regression_daily": (q_segmented_regression_daily,
                                   SQL_SEGMENTED_REG),
}
