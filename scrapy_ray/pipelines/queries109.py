"""One-hundred-ninth oracle-query batch — cluster separation / basket
affinity / quantizer design:

- ch_index_labels: the Calinski-Harabasz index on the once-quantized
  label centroids (queries108 machinery): within-SS = exact integer
  sum of point-to-own-centroid squared distances, between-SS = exact
  integer sum of n_l * ||cq_l - gq||^2 with the global centroid
  quantized the same way; CH = (B/(k-1))/(W/(n-k))
  identical-expression.
- part_pair_lift: top-5 part pairs by ORDER-BASKET lift (distinct
  from the event-based item CF): pair/marginal counts exact;
  lift quantized as (n * c_ab * 1e6) // (c_a * c_b) — an exact
  floor-div ordering (ties -> part pair asc); pairs with c_ab >= 3
  only (degenerate singletons excluded identically).
- lloyd_max_quantizer: 3 Lloyd-Max iterations for a 4-level scalar
  quantizer of whole-dollar order totals, entirely on the bounded
  dollar histogram: boundaries = integer midpoints (a+b)//2,
  new centroids = round(segment mean) quantized ONCE per iteration
  (identical float div of exact range sums); reports final
  centroids/boundaries and the exact distortion numerator.
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
from scrapy_ray.pipelines.queries108 import (_CENTROID_SQL, _centroids,
                                             _cents_vecs)


# ---------------------------------------------------------------------------
# Calinski-Harabasz
# ---------------------------------------------------------------------------


def q_ch_index_labels(sf_dir: str):
    """CH index on quantized centroids (docstring above)."""
    labels, cq, cnts = _centroids(sf_dir)
    ds = _pq(sf_dir, "embeddings",
             columns=["vec_id", "label", "embedding"])
    cmat = np.stack([cq[lv] for lv in labels])
    larr = np.array(labels, np.int64)

    def wpart(t: pa.Table) -> pa.Table:
        _, lab, qv = _cents_vecs(t)
        own = np.searchsorted(larr, lab)
        diff = qv - cmat[own]
        d2 = (diff * diff).sum(axis=1)
        return pa.table({"g": pa.array([0], pa.int64()),
                         "w": pa.array([int(d2.sum())], pa.int64())})

    agg = (ds.map_batches(wpart, batch_format="pyarrow")
             .groupby("g").aggregate(Sum("w", alias_name="w"))
             .to_pandas())
    w = int(agg["w"].iloc[0])
    n = sum(cnts.values())
    k = len(labels)
    # global centroid, quantized identically: round(sum of all qv / n)
    def gpart(t: pa.Table) -> pa.Table:
        _, _, qv = _cents_vecs(t)
        return pa.table({"g": pa.array([0], pa.int64()),
                         "s": pa.array([",".join(
                             map(str, qv.sum(axis=0)))], pa.string())})

    parts = ds.map_batches(gpart, batch_format="pyarrow").to_pandas()
    dim = cmat.shape[1]
    tot = np.zeros(dim, dtype=object)
    for row in parts["s"]:
        tot += np.array([int(x) for x in row.split(",")], object)
    gc = tot.astype(np.float64) / float(n)
    gq = np.where(gc >= 0, np.floor(gc + 0.5),
                  np.ceil(gc - 0.5)).astype(np.int64)
    b = sum(int(cnts[lv])
            * int(((cq[lv] - gq) ** 2).sum()) for lv in labels)
    ch = ((float(b) / (k - 1.0)) / (float(w) / (n - k * 1.0)))
    out = pd.DataFrame({"n": [n], "k": [k], "w_ss": [w], "b_ss": [b],
                        "ch6": [_round6(np.array([ch]))[0]]})
    for col in ("n", "k", "w_ss", "b_ss"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CH_INDEX = "WITH " + _CENTROID_SQL + """,
own AS (
  SELECT sum(d2)::BIGINT AS w FROM d2 WHERE tgt = own),
t AS (SELECT count(*)::BIGINT AS n,
             count(DISTINCT label)::BIGINT AS k
      FROM embeddings),
gcent AS (
  SELECT idx,
         CAST(round(CAST(sum(qv) AS DOUBLE) / count(DISTINCT vec_id))
              AS BIGINT) AS gq
  FROM ex GROUP BY 1),
nl AS (SELECT label, count(DISTINCT vec_id)::BIGINT AS n_l
       FROM ex GROUP BY 1),
bss AS (
  SELECT sum(nl.n_l * dd.d2)::BIGINT AS b FROM (
    SELECT cent.label, sum((cent.cq - gcent.gq)
                           * (cent.cq - gcent.gq))::BIGINT AS d2
    FROM cent JOIN gcent ON gcent.idx = cent.idx
    GROUP BY 1) dd
  JOIN nl ON nl.label = dd.label)
SELECT n, k, (SELECT w FROM own) AS w_ss, (SELECT b FROM bss) AS b_ss,
       round((CAST((SELECT b FROM bss) AS DOUBLE) / (k - 1.0))
             / (CAST((SELECT w FROM own) AS DOUBLE) / (n - k * 1.0)),
             6) AS ch6
FROM t
"""


# ---------------------------------------------------------------------------
# Part-pair lift
# ---------------------------------------------------------------------------


def q_part_pair_lift(sf_dir: str):
    """Top-5 order-basket part pairs by floor-quantized lift
    (docstring above)."""
    ds = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def ppart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o": t["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "p": t["l_partkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)}).drop_duplicates()
        return _strip(df)

    from ray.data.aggregate import Count
    pairs = (ds.map_batches(ppart, batch_format="pyarrow")
               .groupby(["o", "p"]).aggregate(Count())
               .to_pandas())[["o", "p"]]
    n_orders = pairs["o"].nunique()
    marg = pairs.groupby("p").size().to_dict()
    merged = pairs.merge(pairs, on="o")
    merged = merged[merged["p_x"] < merged["p_y"]]
    co = merged.groupby(["p_x", "p_y"]).size().reset_index(name="c")
    rows = []
    for a, b, c in zip(co["p_x"], co["p_y"], co["c"]):
        a, b, c = int(a), int(b), int(c)
        if c < 3:
            continue
        lq = (n_orders * c * 10 ** 6) // (marg[a] * marg[b])
        rows.append((a, b, c, lq))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    out = pd.DataFrame(rows[:5], columns=["part_a", "part_b", "c_ab",
                                          "lift_q"])
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_PART_LIFT = """
WITH pr AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
t AS (SELECT count(DISTINCT o)::BIGINT AS n FROM pr),
marg AS (SELECT p, count(*)::BIGINT AS c FROM pr GROUP BY 1),
co AS (
  SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS c_ab
  FROM pr a JOIN pr b ON b.o = a.o AND b.p > a.p
  GROUP BY 1, 2),
f AS (
  SELECT pa, pb, c_ab,
         ((t.n * c_ab * 1000000)
          // (ma.c * mb.c))::BIGINT AS lift_q
  FROM co JOIN marg ma ON ma.p = co.pa
  JOIN marg mb ON mb.p = co.pb CROSS JOIN t
  WHERE c_ab >= 3)
SELECT pa AS part_a, pb AS part_b, c_ab, lift_q
FROM f ORDER BY lift_q DESC, pa, pb LIMIT 5
"""


# ---------------------------------------------------------------------------
# Lloyd-Max quantizer
# ---------------------------------------------------------------------------

_LM_ITERS = 3


def q_lloyd_max_quantizer(sf_dir: str):
    """3 Lloyd-Max iterations on the dollar histogram (docstring
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
    cents = [int(d[np.searchsorted(cum, math.ceil(q / 1000.0 * n))])
             for q in (125, 375, 625, 875)]
    for _ in range(_LM_ITERS):
        bounds = [(cents[i] + cents[i + 1]) // 2 for i in range(3)]
        # side="left" puts d == bound in the LOWER segment, matching
        # the SQL CASE d <= b chain
        seg = np.searchsorted(np.array(bounds, np.int64), d,
                              side="left")
        new = []
        for s in range(4):
            m = seg == s
            ns = int(cnt[m].sum())
            ss = int((cnt[m] * d[m]).sum())
            c = float(ss) / float(ns)
            new.append(int(math.floor(c + 0.5)))
        cents = new
    bounds = [(cents[i] + cents[i + 1]) // 2 for i in range(3)]
    seg = np.searchsorted(np.array(bounds, np.int64), d, side="left")
    dist = 0
    for s in range(4):
        m = seg == s
        diff = d[m].astype(object) - cents[s]
        dist += int((cnt[m].astype(object) * diff * diff).sum())
    out = pd.DataFrame({
        "n": [n], "c1": [cents[0]], "c2": [cents[1]], "c3": [cents[2]],
        "c4": [cents[3]], "b1": [bounds[0]], "b2": [bounds[1]],
        "b3": [bounds[2]], "dist": [str(dist)]})
    for col in ("n", "c1", "c2", "c3", "c4", "b1", "b2", "b3"):
        out[col] = out[col].astype(np.int64)
    return out


def _lloyd_sql() -> str:
    head = """
WITH h AS MATERIALIZED (
  SELECT CAST(floor(o_totalprice) AS BIGINT) AS d,
         count(*)::BIGINT AS cnt
  FROM orders GROUP BY 1),
cum AS MATERIALIZED (
  SELECT d, cnt, sum(cnt) OVER (ORDER BY d)::BIGINT AS cum FROM h),
t AS (SELECT sum(cnt)::BIGINT AS n FROM h),
c0 AS (
  SELECT
    (SELECT min(d) FROM cum, t WHERE cum >= ceil(0.125 * n)) AS c1,
    (SELECT min(d) FROM cum, t WHERE cum >= ceil(0.375 * n)) AS c2,
    (SELECT min(d) FROM cum, t WHERE cum >= ceil(0.625 * n)) AS c3,
    (SELECT min(d) FROM cum, t WHERE cum >= ceil(0.875 * n)) AS c4)"""
    steps = []
    for i in range(1, _LM_ITERS + 1):
        steps.append(f""",
b{i} AS (SELECT (c1 + c2) // 2 AS b1, (c2 + c3) // 2 AS b2,
                (c3 + c4) // 2 AS b3
         FROM c{i-1}),
c{i} AS (
  SELECT
    CAST(round(CAST(sum(CASE WHEN d <= b1 THEN cnt * d END) AS DOUBLE)
               / sum(CASE WHEN d <= b1 THEN cnt END)) AS BIGINT) AS c1,
    CAST(round(CAST(sum(CASE WHEN d > b1 AND d <= b2 THEN cnt * d END)
                    AS DOUBLE)
               / sum(CASE WHEN d > b1 AND d <= b2 THEN cnt END))
         AS BIGINT) AS c2,
    CAST(round(CAST(sum(CASE WHEN d > b2 AND d <= b3 THEN cnt * d END)
                    AS DOUBLE)
               / sum(CASE WHEN d > b2 AND d <= b3 THEN cnt END))
         AS BIGINT) AS c3,
    CAST(round(CAST(sum(CASE WHEN d > b3 THEN cnt * d END) AS DOUBLE)
               / sum(CASE WHEN d > b3 THEN cnt END)) AS BIGINT) AS c4
  FROM h CROSS JOIN b{i})""")
    tail = f""",
bf AS (SELECT (c1 + c2) // 2 AS b1, (c2 + c3) // 2 AS b2,
              (c3 + c4) // 2 AS b3
       FROM c{_LM_ITERS}),
dd AS (
  SELECT sum(cnt::HUGEINT
             * (d - CASE WHEN d <= b1 THEN c.c1
                         WHEN d <= b2 THEN c.c2
                         WHEN d <= b3 THEN c.c3 ELSE c.c4 END)
             * (d - CASE WHEN d <= b1 THEN c.c1
                         WHEN d <= b2 THEN c.c2
                         WHEN d <= b3 THEN c.c3 ELSE c.c4 END))
           AS dist
  FROM h CROSS JOIN bf CROSS JOIN c{_LM_ITERS} c)
SELECT (SELECT n FROM t) AS n, c.c1, c.c2, c.c3, c.c4,
       bf.b1, bf.b2, bf.b3, CAST(dd.dist AS VARCHAR) AS dist
FROM c{_LM_ITERS} c CROSS JOIN bf CROSS JOIN dd"""
    return head + "".join(steps) + tail


SQL_LLOYD_MAX = _lloyd_sql()


QUERIES109: dict[str, tuple] = {
    "ch_index_labels": (q_ch_index_labels, SQL_CH_INDEX),
    "part_pair_lift": (q_part_pair_lift, SQL_PART_LIFT),
    "lloyd_max_quantizer": (q_lloyd_max_quantizer, SQL_LLOYD_MAX),
}
