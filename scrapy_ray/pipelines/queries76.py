"""Seventy-sixth oracle-query batch — robust pairwise scale estimators
and the last missing TPC-H shape:

- qn_shamos_orders: Rousseeuw-Croux Qn, the Shamos median-of-
  |pairwise diffs|, and the Gini mean difference of o_totalprice at
  $100-bin resolution.  The |x_i - x_j| (i<j) distribution is the
  integer self-cross-correlation of the bounded $100-bin histogram
  (np.convolve on ~5000 dense bins / JOIN ... ON b2.b > b1.b GROUP BY
  delta in SQL; within-bin pairs land exactly at delta 0), so the
  rank-k elements — Qn at k = C(h,2), h = n//2+1; Shamos at
  (P+1)//2 — are EXACT integers and GMD = SUM delta*cnt / P an exact
  rational (P = n(n-1)/2 ~ 1.1e10 at sf0.1, int64).  qn6 applies the
  asymptotic consistency constant 2.2219 as a shared float literal.
  Probe sf0.001: qn_bins=672, shamos_bins=1470, GMD=$167420.65.
- biweight_midvar_orders: Tukey biweight midvariance of whole-dollar
  o_totalprice — med and MAD are exact disc-quantile ranks off the
  dollar histogram; per distinct dollar cell the weight terms
  (d-med)^2*(1-u^2)^4 (quantized 1e-3; <= 2.5e14 < 2^52) and
  (1-u^2)*(1-5u^2) (quantized 1e-9) are rounded ONCE per cell then
  integer-multiplied by the cell count — the numerator sum is exact
  (Python int / HUGEINT at sf0.1).  u = (d-med)/(9*mad), cells with
  |u| >= 1 drop on both sides.  Probe sf0.001: med=$253481,
  mad=$125946, biweight sd ~ $151k.
- tpch_q4_like: the order-priority checking query (TPC-H Q4 shape;
  the testdata lineitem has no commitdate/receiptdate, so "late" =
  EXISTS a lineitem with l_shipdate > o_orderdate + 60 days).
  EXISTS collapses to max(l_shipdate) per orderkey (monotone
  predicate), pre-aggregated on the lineitem side to one row per key,
  then the generic native Dataset.join (num_partitions=8 — the
  queries4 sizing) against orders and a per-priority count.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Max, Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Qn / Shamos / GMD
# ---------------------------------------------------------------------------


def q_qn_shamos_orders(sf_dir: str):
    """Qn, Shamos and Gini mean difference via histogram
    self-cross-correlation (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        b = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)
                     / 100.0).astype(np.int64)
        df = pd.DataFrame({"b": b})
        g = df.groupby("b", sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("b").aggregate(Sum("n", alias_name="n"))
              .to_pandas().sort_values("b"))
    b = hist["b"].to_numpy(np.int64)
    h = hist["n"].to_numpy(np.int64)
    n = int(h.sum())
    lo = int(b.min())
    length = int(b.max()) - lo + 1
    dense = np.zeros(length, np.int64)
    dense[b - lo] = h
    conv = np.convolve(dense, dense[::-1])
    p_pairs = n * (n - 1) // 2
    hh = n // 2 + 1
    k = hh * (hh - 1) // 2
    rank_sh = (p_pairs + 1) // 2
    cum = int((h * (h - 1) // 2).sum())
    gmd_s = 0
    qn_bins = 0 if cum >= k else None
    sh_bins = 0 if cum >= rank_sh else None
    mid = length - 1
    for d in range(1, length):
        c = int(conv[mid + d])
        if not c:
            continue
        cum += c
        gmd_s += d * c
        if qn_bins is None and cum >= k:
            qn_bins = d
        if sh_bins is None and cum >= rank_sh:
            sh_bins = d
    qn6 = _round6(np.array([2.2219 * (qn_bins * 100.0)]))[0]
    gmd6 = _round6(np.array([float(gmd_s) * 100.0 / float(p_pairs)]))[0]
    out = pd.DataFrame({"n": [n], "p_pairs": [p_pairs],
                        "qn_bins": [qn_bins], "shamos_bins": [sh_bins],
                        "gmd_s": [gmd_s], "qn6": [qn6],
                        "shamos6": [_round6(np.array(
                            [sh_bins * 100.0]))[0]],
                        "gmd6": [gmd6]})
    for col in ("n", "p_pairs", "qn_bins", "shamos_bins", "gmd_s"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_QN_SHAMOS = """
WITH h AS (
  SELECT CAST(floor(o_totalprice / 100.0) AS BIGINT) AS b,
         count(*)::BIGINT AS n
  FROM orders GROUP BY 1),
t AS (
  SELECT sum(n)::BIGINT AS nt,
         (sum(n)::BIGINT * (sum(n)::BIGINT - 1)) // 2 AS p_pairs,
         ((sum(n)::BIGINT // 2 + 1) * (sum(n)::BIGINT // 2)) // 2 AS k,
         ((sum(n)::BIGINT * (sum(n)::BIGINT - 1)) // 2 + 1) // 2
           AS rank_sh
  FROM h),
dall AS (
  SELECT 0::BIGINT AS d, sum(n * (n - 1) // 2)::BIGINT AS c FROM h
  UNION ALL
  SELECT b2.b - b1.b AS d, sum(b1.n * b2.n)::BIGINT AS c
  FROM h b1 JOIN h b2 ON b2.b > b1.b GROUP BY 1),
cumt AS (
  SELECT d, c, sum(c) OVER (ORDER BY d)::BIGINT AS cum FROM dall),
qn AS (SELECT min(d)::BIGINT AS qn_bins FROM cumt, t WHERE cum >= k),
sh AS (SELECT min(d)::BIGINT AS shamos_bins FROM cumt, t
       WHERE cum >= rank_sh),
g AS (SELECT sum(d * c)::BIGINT AS gmd_s FROM dall)
SELECT nt AS n, p_pairs, qn_bins, shamos_bins, gmd_s,
       round(2.2219 * (qn_bins * 100.0), 6) AS qn6,
       round(shamos_bins * 100.0, 6) AS shamos6,
       round(CAST(gmd_s AS DOUBLE) * 100.0 / CAST(p_pairs AS DOUBLE), 6)
         AS gmd6
FROM t, qn, sh, g
"""


# ---------------------------------------------------------------------------
# Biweight midvariance
# ---------------------------------------------------------------------------


def q_biweight_midvar_orders(sf_dir: str):
    """Tukey biweight midvariance on whole-dollar totalprice (docstring
    above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        d = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        df = pd.DataFrame({"d": d})
        g = df.groupby("d", sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("d").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("d"))
    d = hist["d"].to_numpy(np.int64)
    cnt = hist["cnt"].to_numpy(np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    med = int(d[np.searchsorted(cum, math.ceil(0.5 * n))])
    # MAD histogram: |d - med| cells merge symmetric values
    ad = np.abs(d - med)
    order = np.argsort(ad, kind="stable")
    ad_s, cnt_s = ad[order], cnt[order]
    mad = int(ad_s[np.searchsorted(np.cumsum(cnt_s),
                                   math.ceil(0.5 * n))])
    s1 = 0
    s2 = 0
    for dv, c in zip(d, cnt):
        u = float(int(dv) - med) / (9.0 * mad)
        if not abs(u) < 1.0:
            continue
        w2 = (1.0 - u * u) * (1.0 - u * u)
        q1 = int(math.floor(((int(dv) - med) * (int(dv) - med))
                            * (w2 * w2) * 1000.0 + 0.5))
        t2 = (1.0 - u * u) * (1.0 - 5.0 * (u * u)) * 1000000000.0
        q2 = int(math.floor(t2 + 0.5)) if t2 >= 0 \
            else int(math.ceil(t2 - 0.5))
        s1 += int(c) * q1
        s2 += int(c) * q2
    bwmv = (float(n) * (float(s1) / 1000.0)
            / ((float(s2) / 1000000000.0) * (float(s2) / 1000000000.0)))
    out = pd.DataFrame({"n": [n], "med_dollar": [med],
                        "mad_dollar": [mad],
                        "bwmv6": [_round6(np.array([bwmv]))[0]],
                        "bwsd6": [_round6(np.array(
                            [math.sqrt(bwmv)]))[0]]})
    for col in ("n", "med_dollar", "mad_dollar"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BIWEIGHT = """
WITH b AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS d FROM orders),
t AS (SELECT count(*)::BIGINT AS n, quantile_disc(d, 0.5) AS med FROM b),
m AS (SELECT quantile_disc(abs(d - med), 0.5) AS mad, max(n) AS n,
             max(med) AS med
      FROM b CROSS JOIN t),
cells AS (SELECT d, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
q AS (
  SELECT cells.cnt, m.n, m.med, m.mad,
         (CAST(d - med AS DOUBLE) / (9.0 * mad)) AS u,
         (d - med) AS dd
  FROM cells CROSS JOIN m),
s AS (
  SELECT max(n) AS n, max(med) AS med, max(mad) AS mad,
         sum(cnt * CAST(round((dd::HUGEINT * dd)
               * (((1.0 - u * u) * (1.0 - u * u))
                  * ((1.0 - u * u) * (1.0 - u * u))) * 1000.0)
               AS HUGEINT)) AS s1,
         sum(cnt * CAST(round((1.0 - u * u) * (1.0 - 5.0 * (u * u))
                              * 1000000000.0) AS HUGEINT)) AS s2
  FROM q WHERE abs(u) < 1.0),
f AS (
  SELECT n, med, mad,
         CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / 1000.0)
           / ((CAST(s2 AS DOUBLE) / 1000000000.0)
              * (CAST(s2 AS DOUBLE) / 1000000000.0)) AS bwmv
  FROM s)
SELECT n, med AS med_dollar, mad AS mad_dollar,
       round(bwmv, 6) AS bwmv6, round(sqrt(bwmv), 6) AS bwsd6
FROM f
"""


# ---------------------------------------------------------------------------
# TPC-H Q4-like
# ---------------------------------------------------------------------------


def q_tpch_q4_like(sf_dir: str):
    """Order-priority checking: count orders with a late lineitem
    (docstring above)."""
    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def li_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "ms": t["l_shipdate"].cast(pa.int64())
            .to_numpy(zero_copy_only=False)})
        g = df.groupby("o_orderkey", sort=False)["ms"].max().reset_index()
        g["ms"] = g["ms"].astype(np.int64)
        return _strip(g)

    per_order = (li.map_batches(li_partial, batch_format="pyarrow")
                   .groupby("o_orderkey")
                   .aggregate(Max("ms", alias_name="ms")))

    def cast_keys(t: pa.Table) -> pa.Table:
        idx = t.schema.get_field_index("o_orderkey")
        t = t.set_column(idx, "o_orderkey",
                         pc.cast(t["o_orderkey"], pa.int64()))
        return t.set_column(
            t.schema.get_field_index("o_orderdate"), "o_orderdate",
            pc.cast(t["o_orderdate"], pa.int64()))

    joined = orders.map_batches(cast_keys, batch_format="pyarrow").join(
        per_order, join_type="inner", num_partitions=8,
        on=("o_orderkey",))

    def prio_partial(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        ms = t["ms"].to_numpy(zero_copy_only=False)
        late = ms > od + 60 * _US_PER_DAY
        df = pd.DataFrame({
            "o_orderpriority":
                np.asarray(t["o_orderpriority"].to_pylist())[late],
            "order_count": np.int64(1)})
        g = df.groupby("o_orderpriority", sort=False).sum().reset_index()
        g["order_count"] = g["order_count"].astype(np.int64)
        return _strip(g)

    out = (joined.map_batches(prio_partial, batch_format="pyarrow")
                 .groupby("o_orderpriority")
                 .aggregate(Sum("order_count", alias_name="order_count"))
                 .to_pandas().sort_values("o_orderpriority")
                 .reset_index(drop=True))
    out["order_count"] = out["order_count"].astype(np.int64)
    return out


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY 1 ORDER BY 1
"""


QUERIES76: dict[str, tuple] = {
    "qn_shamos_orders": (q_qn_shamos_orders, SQL_QN_SHAMOS),
    "biweight_midvar_orders": (q_biweight_midvar_orders, SQL_BIWEIGHT),
    "tpch_q4_like": (q_tpch_q4_like, SQL_TPCH_Q4),
}
