"""One-hundred-fortieth oracle-query batch — L1 classing, partition
skew, and kernel two-sample testing:

- optimal_2medians_orders: the EXACT optimal 1-D 2-medians split of
  dollar-quantized order prices — for every threshold, each class's
  L1 cost around its lower median (rank ceil(m/2)) comes from exact
  prefix sums; the oracle finds the per-class median rows with ASOF
  joins on the strictly-increasing cumulative counts; argmin by
  (total cost, threshold) is pure-integer.
- partition_balance_audit: skew audit of the repo's user_id % 64
  salting — per-cell loads, min/max, max/min ratio, and the
  uniformity chi-square (64·ΣO² − N²)/N from exact counts.
- mmd_poly_click_view: squared MMD between click and view values
  under the degree-2 polynomial kernel k(a,b) = (1 + ab/c)² with
  c = 1e8 — for a polynomial kernel the V-statistic collapses to
  exact moment expressions (μ, m2 per group), so the whole test is
  moments + identical float algebra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


# ---------------------------------------------------------------------------
# Optimal 2-medians
# ---------------------------------------------------------------------------


def q_optimal_2medians_orders(sf_dir: str):
    """Exact 1-D 2-medians of dollar prices (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        d = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64) // 100
        g = pd.DataFrame({"v": d, "n": np.int64(1), "s": d}) \
            .groupby("v", sort=False).sum().reset_index()
        for col in ("n", "s"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(hpart, batch_format="pyarrow")
           .groupby("v").aggregate(Sum("n", alias_name="n"),
                                   Sum("s", alias_name="s"))
           .to_pandas().sort_values("v").reset_index(drop=True))
    v = h["v"].to_numpy(np.int64)
    n_b = h["n"].to_numpy(np.int64)
    s_b = h["s"].to_numpy(np.int64)
    cn = np.cumsum(n_b)
    cs = np.cumsum(s_b)
    cb = cn - n_b                      # cum count BEFORE each bucket
    sb = cs - s_b
    nt, st = int(cn[-1]), int(cs[-1])

    def cost(lo_n, lo_s, hi_n, hi_s):
        """Vectorized exact L1 cost of bucket-aligned classes: classes
        split at bucket boundaries, so only the median bucket is ever
        cut — and its elements are AT the median (zero cost)."""
        m = hi_n - lo_n
        r = lo_n + (m + 1) // 2
        pos = np.searchsorted(cn, r)
        med = v[pos]
        return (med * (cb[pos] - lo_n) - (sb[pos] - lo_s)
                + (hi_s - cs[pos]) - med * (hi_n - cn[pos]))

    nb = len(v)
    i = np.arange(nb - 1)
    c1 = cost(np.int64(0), np.int64(0), cn[i], cs[i])
    c2 = cost(cn[i], cs[i], np.int64(nt), np.int64(st))
    tot = c1 + c2
    b = int(np.lexsort((v[i], tot))[0])
    out = pd.DataFrame({"threshold": [int(v[b])],
                        "n1": [int(cn[b])], "n2": [nt - int(cn[b])],
                        "l1_cost": [int(tot[b])]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_OPT_2MEDIANS = """
WITH r AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS v
  FROM orders),
h AS (SELECT v, count(*)::BIGINT AS n, sum(v)::BIGINT AS s
      FROM r GROUP BY 1),
p AS (
  SELECT v, n, s, sum(n) OVER w AS cn, sum(s) OVER w AS cs,
         sum(n) OVER w - n AS cb, sum(s) OVER w - s AS sb
  FROM h
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)),
tot AS (SELECT max(cn)::BIGINT AS nt, max(cs)::BIGINT AS st FROM p),
thr AS (
  SELECT p.v AS t, p.cn AS m1, p.cs AS s1,
         tot.nt AS nt, tot.st AS st
  FROM p CROSS JOIN tot WHERE p.cn < tot.nt),
m1 AS (
  SELECT thr.*, m.v AS med1, m.cb AS cb1, m.sb AS sb1,
         m.cn AS cn1, m.cs AS cs1
  FROM thr ASOF JOIN p m ON (thr.m1 + 1) // 2 - 1 >= m.cb),
m2 AS (
  SELECT m1.*, m.v AS med2, m.cb AS cb2, m.sb AS sb2,
         m.cn AS cn2, m.cs AS cs2
  FROM m1 ASOF JOIN p m
    ON m1.m1 + (m1.nt - m1.m1 + 1) // 2 - 1 >= m.cb),
cost AS (
  SELECT t, m1, nt,
         (med1 * cb1 - sb1 + (s1 - cs1) - med1 * (m1 - cn1))
         + (med2 * (cb2 - m1) - (sb2 - s1) + (st - cs2)
            - med2 * (nt - cn2)) AS c
  FROM m2),
pick AS (
  SELECT t, m1, nt, c, row_number() OVER (ORDER BY c, t) AS rn
  FROM cost)
SELECT t AS threshold, m1::BIGINT AS n1, (nt - m1)::BIGINT AS n2,
       c::BIGINT AS l1_cost
FROM pick WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Partition balance audit
# ---------------------------------------------------------------------------


def q_partition_balance_audit(sf_dir: str):
    """Chi-square skew audit of user_id % 64 (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id"])

    def cpart(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.DataFrame({"cell": u % 64, "c": np.int64(1)}) \
            .groupby("cell", sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(cpart, batch_format="pyarrow")
           .groupby("cell").aggregate(Sum("c", alias_name="c"))
           .to_pandas())
    o = np.zeros(64, np.int64)
    o[h["cell"].to_numpy(np.int64)] = h["c"].to_numpy(np.int64)
    n = int(o.sum())
    q = int((o * o).sum())
    chi2 = (64.0 * float(q) - float(n) * float(n)) / float(n)
    mx = int(o.max())
    n_empty = int((o == 0).sum())
    mn_pos = int(o[o > 0].min())      # sparse users empty some cells
    ratio = float(mx) / float(mn_pos)
    out = pd.DataFrame({"n_rows": [n], "n_empty": [n_empty],
                        "min_pos_load": [mn_pos], "max_load": [mx],
                        "chi2_6": [_round6(np.array([chi2]))[0]],
                        "ratio6": [_round6(np.array([ratio]))[0]]})
    for col in ("n_rows", "n_empty", "min_pos_load", "max_load"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PARTITION_BALANCE = """
WITH c AS (
  SELECT user_id % 64 AS cell, count(*)::BIGINT AS c
  FROM events GROUP BY 1),
g AS (
  SELECT g.cell, coalesce(c.c, 0) AS c
  FROM (SELECT unnest(range(0, 64)) AS cell) g
  LEFT JOIN c USING (cell)),
m AS (
  SELECT sum(c)::BIGINT AS n,
         sum(CAST(c AS HUGEINT) * c)::BIGINT AS q,
         max(c)::BIGINT AS mx,
         sum((c = 0)::INT)::BIGINT AS n_empty,
         min(CASE WHEN c > 0 THEN c END)::BIGINT AS mn_pos
  FROM g)
SELECT n AS n_rows, n_empty, mn_pos AS min_pos_load, mx AS max_load,
       round((64.0 * CAST(q AS DOUBLE)
              - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS chi2_6,
       round(CAST(mx AS DOUBLE) / CAST(mn_pos AS DOUBLE), 6)
         AS ratio6
FROM m
"""


# ---------------------------------------------------------------------------
# Polynomial-kernel MMD
# ---------------------------------------------------------------------------


def q_mmd_poly_click_view(sf_dir: str):
    """Degree-2 polynomial-kernel V-statistic MMD² (docstring)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def mpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        cols = {"g": pa.array([0], pa.int64())}
        for name, m in (("x", et == "click"), ("y", et == "view")):
            cc = c[m]
            cols[f"n{name}"] = pa.array([len(cc)], pa.int64())
            cols[f"s{name}"] = pa.array([int(cc.sum())], pa.int64())
            cols[f"q{name}"] = pa.array([int((cc * cc).sum())],
                                        pa.int64())
        return pa.table(cols)

    agg = (ds.map_batches(mpart, batch_format="pyarrow")
             .groupby("g").aggregate(
                 Sum("nx", alias_name="nx"), Sum("sx", alias_name="sx"),
                 Sum("qx", alias_name="qx"), Sum("ny", alias_name="ny"),
                 Sum("sy", alias_name="sy"), Sum("qy", alias_name="qy"))
             .to_pandas())
    nx, sx, qx, ny, sy, qy = (int(agg[c].iloc[0])
                              for c in ("nx", "sx", "qx", "ny", "sy",
                                        "qy"))
    cc = 100000000.0
    mux = float(sx) / float(nx)
    muy = float(sy) / float(ny)
    m2x = float(qx) / float(nx)
    m2y = float(qy) / float(ny)
    kxx = 1.0 + 2.0 * mux * mux / cc + m2x * m2x / (cc * cc)
    kyy = 1.0 + 2.0 * muy * muy / cc + m2y * m2y / (cc * cc)
    kxy = 1.0 + 2.0 * mux * muy / cc + m2x * m2y / (cc * cc)
    mmd2 = kxx + kyy - 2.0 * kxy
    out = pd.DataFrame({"nx": [nx], "ny": [ny],
                        "kxx6": [_round6(np.array([kxx]))[0]],
                        "kyy6": [_round6(np.array([kyy]))[0]],
                        "kxy6": [_round6(np.array([kxy]))[0]],
                        "mmd2_6": [_round6(np.array([mmd2]))[0]]})
    for col in ("nx", "ny"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MMD_POLY = """
WITH m AS (
  SELECT
    sum((event_type = 'click')::INT)::BIGINT AS nx,
    sum(CASE WHEN event_type = 'click'
             THEN CAST(round(value * 100) AS BIGINT)
             ELSE 0 END)::BIGINT AS sx,
    sum(CASE WHEN event_type = 'click'
             THEN CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                  * CAST(round(value * 100) AS BIGINT)
             ELSE 0 END)::BIGINT AS qx,
    sum((event_type = 'view')::INT)::BIGINT AS ny,
    sum(CASE WHEN event_type = 'view'
             THEN CAST(round(value * 100) AS BIGINT)
             ELSE 0 END)::BIGINT AS sy,
    sum(CASE WHEN event_type = 'view'
             THEN CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                  * CAST(round(value * 100) AS BIGINT)
             ELSE 0 END)::BIGINT AS qy
  FROM events),
f AS (
  SELECT nx, ny,
         CAST(sx AS DOUBLE) / CAST(nx AS DOUBLE) AS mux,
         CAST(sy AS DOUBLE) / CAST(ny AS DOUBLE) AS muy,
         CAST(qx AS DOUBLE) / CAST(nx AS DOUBLE) AS m2x,
         CAST(qy AS DOUBLE) / CAST(ny AS DOUBLE) AS m2y
  FROM m),
k AS (
  SELECT nx, ny,
         1.0 + 2.0 * mux * mux / 1e8
             + m2x * m2x / (1e8 * 1e8) AS kxx,
         1.0 + 2.0 * muy * muy / 1e8
             + m2y * m2y / (1e8 * 1e8) AS kyy,
         1.0 + 2.0 * mux * muy / 1e8
             + m2x * m2y / (1e8 * 1e8) AS kxy
  FROM f)
SELECT nx, ny, round(kxx, 6) AS kxx6, round(kyy, 6) AS kyy6,
       round(kxy, 6) AS kxy6,
       round(kxx + kyy - 2.0 * kxy, 6) AS mmd2_6
FROM k
"""


QUERIES140: dict[str, tuple] = {
    "optimal_2medians_orders": (q_optimal_2medians_orders,
                                SQL_OPT_2MEDIANS),
    "partition_balance_audit": (q_partition_balance_audit,
                                SQL_PARTITION_BALANCE),
    "mmd_poly_click_view": (q_mmd_poly_click_view, SQL_MMD_POLY),
}
