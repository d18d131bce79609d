"""One-hundred-thirty-fourth oracle-query batch — relational market
analytics over customer/part/supplier:

- customer_part_jaccard_topk: top-5 customer pairs by Jaccard
  similarity of their purchased part sets. Candidate pairs are
  generated inside part-keyed salted partitions (same (cust, part)
  always lands in one partition, so in-partition dedup IS global
  dedup — the LSH candidate-gen device); per-customer set sizes ride
  out of the same partitions; the pair aggregation is a second
  salted stage emitting per-partition top-5 by 1e-9-quantized J with
  (c1, c2) tiebreak. Exact integer |∩| and sizes throughout.
- brand_share_shift: top-5 brand gainers of 1995→1996 revenue share
  (lineitem ⋈ part): exact per-(brand, year) cents; the share delta
  ordered by its 1e-9 quantization.
- supplier_share_trend: per-supplier OLS slope of yearly revenue
  share on year: shares 1e-9-quantized per (supplier, year), slope
  numerators cleared to exact ints over present years; top-5 by the
  1e-15-quantized slope.
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
from scrapy_ray.pipelines.queries47 import _strip


def _rint(x) -> np.ndarray:
    x = np.asarray(x, np.float64)
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def _orderkey_cust(sf_dir: str) -> np.ndarray:
    """o_orderkey -> o_custkey lookup array (orders is the small side
    relative to lineitem; broadcast once per task via closure)."""
    t = pq_.read_table(os.path.join(sf_dir, "orders.parquet"),
                       columns=["o_orderkey", "o_custkey"])
    ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    arr = np.zeros(int(ok.max()) + 1, np.int64)
    arr[ok] = ck
    return arr


# ---------------------------------------------------------------------------
# Customer-part Jaccard
# ---------------------------------------------------------------------------


def q_customer_part_jaccard_topk(sf_dir: str):
    """Top-5 customer pairs by part-set Jaccard (docstring above)."""
    o2c = _orderkey_cust(sf_dir)
    ds = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def cp(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = pd.DataFrame({"cust": o2c[ok], "part": pk}) \
            .drop_duplicates()
        df["gkey"] = (df["part"] % 256).astype(np.int32)
        return _strip(df)

    def pairs_sizes(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["cust", "part"])      # global dedup
        sz = df.groupby("cust", sort=False)["part"].size() \
            .reset_index(name="cnt")
        out_s = pd.DataFrame({"c1": sz["cust"].to_numpy(np.int64),
                              "c2": np.int64(-1),
                              "cnt": sz["cnt"].to_numpy(np.int64)})
        # vectorized within-part pair generation (the per-part Python
        # loop cost 16 s at sf0.1): sort by (part, cust); element at
        # global slot e pairs with the next (k − 1 − pos) slots of its
        # contiguous part run, so left indices are arange repeated by
        # that count and rights are consecutive offsets from each left
        srt = df.sort_values(["part", "cust"])
        pv = srt["part"].to_numpy(np.int64)
        cv = srt["cust"].to_numpy(np.int64)
        n = len(pv)
        out = out_s
        if n:
            new = np.empty(n, np.bool_)
            new[0] = True
            new[1:] = pv[1:] != pv[:-1]
            run_id = np.cumsum(new) - 1
            k = np.bincount(run_id)
            pos = np.arange(n) - np.repeat(np.cumsum(k) - k, k)
            left_rep = np.repeat(k, k) - 1 - pos
            total = int(left_rep.sum())
            if total:
                li = np.repeat(np.arange(n), left_rep)
                off = np.cumsum(left_rep) - left_rep
                ri = np.arange(total) - np.repeat(off, left_rep) \
                    + li + 1
                out_p = pd.DataFrame({"c1": cv[li], "c2": cv[ri],
                                      "cnt": np.int64(1)})
                out_p = out_p.groupby(["c1", "c2"], sort=False)["cnt"] \
                    .sum().reset_index()
                out_p["cnt"] = out_p["cnt"].astype(np.int64)
                out = pd.concat([out_s, out_p], ignore_index=True)
        return _strip(out)

    stage1 = (ds.map_batches(cp, batch_format="pyarrow")
                .groupby("gkey").map_groups(pairs_sizes,
                                            batch_format="pandas")
                .materialize())
    def only_sizes(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return _strip(df[df["c2"] == -1][["c1", "cnt"]])

    sizes_df = (stage1.map_batches(only_sizes, batch_format="pyarrow")
                .to_pandas().groupby("c1")["cnt"].sum())
    sizes = np.zeros(int(sizes_df.index.max()) + 1, np.int64)
    sizes[sizes_df.index.to_numpy(np.int64)] = \
        sizes_df.to_numpy(np.int64)

    def top5(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["c1", "c2"], sort=False)["cnt"].sum() \
            .reset_index()
        c = g["cnt"].to_numpy(np.int64)
        na = sizes[g["c1"].to_numpy(np.int64)]
        nb = sizes[g["c2"].to_numpy(np.int64)]
        jac = c.astype(np.float64) / (na + nb - c).astype(np.float64)
        g = g.assign(j9=_rint(jac * 1000000000.0), jac=jac)
        return _strip(g.sort_values(["j9", "c1", "c2"],
                                    ascending=[False, True, True])
                      .head(5))

    def salt2(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["c2"] >= 0]
        df["gk2"] = (df["c1"] % 64).astype(np.int32)
        return _strip(df)

    parts = (stage1.map_batches(salt2, batch_format="pyarrow")
             .groupby("gk2").map_groups(top5, batch_format="pandas")
             .to_pandas())
    top = parts.sort_values(["j9", "c1", "c2"],
                            ascending=[False, True, True]).head(5)
    out = pd.DataFrame({
        "c1": top["c1"].astype(np.int64).to_numpy(),
        "c2": top["c2"].astype(np.int64).to_numpy(),
        "inter": top["cnt"].astype(np.int64).to_numpy(),
        "j6": _round6(top["jac"].to_numpy())})
    return out.reset_index(drop=True)


SQL_CUST_JACCARD = """
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
sz AS (SELECT cust, count(*)::BIGINT AS n FROM cp GROUP BY 1),
pr AS (
  SELECT a.cust AS c1, b.cust AS c2, count(*)::BIGINT AS inter
  FROM cp a JOIN cp b ON b.part = a.part AND b.cust > a.cust
  GROUP BY 1, 2),
j AS (
  SELECT c1, c2, inter,
         CAST(inter AS DOUBLE)
           / CAST(s1.n + s2.n - inter AS DOUBLE) AS jac
  FROM pr JOIN sz s1 ON s1.cust = pr.c1
          JOIN sz s2 ON s2.cust = pr.c2)
SELECT c1, c2, inter, round(jac, 6) AS j6
FROM j
ORDER BY CAST(round(jac * 1000000000.0) AS BIGINT) DESC, c1, c2
LIMIT 5
"""


# ---------------------------------------------------------------------------
# Brand share shift
# ---------------------------------------------------------------------------


def _part_brand(sf_dir: str):
    t = pq_.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_brand"])
    pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    br = np.asarray(t["p_brand"].to_pylist())
    names = sorted(set(br))
    idx = {b: i for i, b in enumerate(names)}
    arr = np.zeros(int(pk.max()) + 1, np.int16)
    arr[pk] = np.array([idx[b] for b in br], np.int16)
    return arr, names


def q_brand_share_shift(sf_dir: str):
    """Top-5 brand 1995->1996 revenue-share gainers (docstring)."""
    arr, names = _part_brand(sf_dir)
    ds = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_extendedprice", "l_shipdate"])

    def bpart(df: pd.DataFrame) -> pd.DataFrame:
        y = df["l_shipdate"].dt.year.to_numpy(np.int64)
        m = (y == 1995) | (y == 1996)
        pk = df["l_partkey"].to_numpy(np.int64)[m]
        p = df["l_extendedprice"].to_numpy()[m]
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"b": arr[pk].astype(np.int64),
                          "y": y[m], "c": c}) \
            .groupby(["b", "y"], sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    agg = (ds.map_batches(bpart, batch_format="pandas")
             .groupby(["b", "y"]).aggregate(Sum("c", alias_name="c"))
             .to_pandas())
    t95 = int(agg[agg["y"] == 1995]["c"].sum())
    t96 = int(agg[agg["y"] == 1996]["c"].sum())
    rows = []
    # only brands present in the filtered lineitem rows (mirrors the
    # SQL join, which never sees zero-revenue brands)
    for bi in sorted(int(b) for b in agg["b"].unique()):
        name = names[bi]
        r95 = int(agg[(agg["b"] == bi) & (agg["y"] == 1995)]["c"].sum())
        r96 = int(agg[(agg["b"] == bi) & (agg["y"] == 1996)]["c"].sum())
        s95 = float(r95) / float(t95)
        s96 = float(r96) / float(t96)
        d9 = int(_rint(np.array([(s96 - s95) * 1000000000.0]))[0])
        rows.append((name, r95, r96, s95, s96, s96 - s95, d9))
    rows.sort(key=lambda r: (-r[6], r[0]))
    top = rows[:5]
    out = pd.DataFrame({
        "brand": [r[0] for r in top],
        "rev95": [r[1] for r in top], "rev96": [r[2] for r in top],
        "share95_6": _round6(np.array([r[3] for r in top])),
        "share96_6": _round6(np.array([r[4] for r in top])),
        "delta6": _round6(np.array([r[5] for r in top]))})
    for col in ("rev95", "rev96"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BRAND_SHIFT = """
WITH li AS (
  SELECT p.p_brand AS brand, year(l_shipdate) AS y,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l_shipdate) IN (1995, 1996)),
g AS (
  SELECT brand,
         sum(CASE WHEN y = 1995 THEN c ELSE 0 END)::BIGINT AS r95,
         sum(CASE WHEN y = 1996 THEN c ELSE 0 END)::BIGINT AS r96
  FROM li GROUP BY 1),
t AS (SELECT sum(r95)::BIGINT AS t95, sum(r96)::BIGINT AS t96 FROM g),
s AS (
  SELECT brand, r95, r96,
         CAST(r95 AS DOUBLE) / CAST(t95 AS DOUBLE) AS s95,
         CAST(r96 AS DOUBLE) / CAST(t96 AS DOUBLE) AS s96
  FROM g CROSS JOIN t)
SELECT brand, r95 AS rev95, r96 AS rev96, round(s95, 6) AS share95_6,
       round(s96, 6) AS share96_6, round(s96 - s95, 6) AS delta6
FROM s
ORDER BY CAST(round((s96 - s95) * 1000000000.0) AS BIGINT) DESC, brand
LIMIT 5
"""


# ---------------------------------------------------------------------------
# Supplier share trend
# ---------------------------------------------------------------------------


def q_supplier_share_trend(sf_dir: str):
    """Top-5 suppliers by yearly-revenue-share OLS slope (docstring)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_suppkey", "l_extendedprice", "l_shipdate"])

    def spart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        y = pc.year(t["l_shipdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"s": t["l_suppkey"].to_numpy(
                              zero_copy_only=False).astype(np.int64),
                          "y": y, "c": c}) \
            .groupby(["s", "y"], sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(spart, batch_format="pyarrow")
             .groupby(["s", "y"]).aggregate(Sum("c", alias_name="c"))
             .to_pandas())
    tot = agg.groupby("y")["c"].sum()
    sh9 = _rint(agg["c"].to_numpy(np.int64).astype(np.float64)
                / tot.reindex(agg["y"]).to_numpy(np.int64)
                .astype(np.float64) * 1000000000.0)
    agg = agg.assign(sh9=sh9)
    rows = []
    for sk, grp in agg.groupby("s"):
        yy = grp["y"].to_numpy(np.int64)
        y9 = grp["sh9"].to_numpy(np.int64)
        n = len(yy)
        if n < 2:
            continue
        sx = int(yy.sum())
        sx2 = int((yy * yy).sum())
        sy = int(y9.sum())
        sxy = int((yy * y9).sum())
        num = n * sxy - sx * sy
        den = n * sx2 - sx * sx
        slope = float(num) / 1000000000.0 / float(den)
        q15 = int(_rint(np.array([slope * 1e15]))[0])
        rows.append((int(sk), n, slope, q15))
    rows.sort(key=lambda r: (-r[3], r[0]))
    top = rows[:5]
    out = pd.DataFrame({
        "suppkey": [r[0] for r in top],
        "n_years": [r[1] for r in top],
        "slope9": [float(np.sign(r[2])
                         * np.floor(np.abs(r[2]) * 1e9 + 0.5) / 1e9)
                   for r in top]})
    for col in ("suppkey", "n_years"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SUPPLIER_TREND = """
WITH li AS (
  SELECT l_suppkey AS s, year(l_shipdate) AS y,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
           AS c
  FROM lineitem GROUP BY 1, 2),
t AS (SELECT y, sum(c)::BIGINT AS tc FROM li GROUP BY 1),
sh AS (
  SELECT li.s, li.y,
         CAST(round(CAST(li.c AS DOUBLE) / CAST(t.tc AS DOUBLE)
                    * 1000000000.0) AS BIGINT) AS sh9
  FROM li JOIN t USING (y)),
ols AS (
  SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS sx,
         sum(CAST(y AS HUGEINT) * y)::BIGINT AS sx2,
         sum(sh9)::BIGINT AS sy,
         sum(CAST(y AS HUGEINT) * sh9)::BIGINT AS sxy
  FROM sh GROUP BY 1 HAVING count(*) >= 2),
sl AS (
  SELECT s, n,
         CAST(CAST(n AS HUGEINT) * sxy
              - CAST(sx AS HUGEINT) * sy AS DOUBLE) / 1000000000.0
           / CAST(CAST(n AS HUGEINT) * sx2
                  - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS slope
  FROM ols)
SELECT s AS suppkey, n AS n_years, round(slope, 9) AS slope9
FROM sl
ORDER BY CAST(round(slope * 1e15) AS BIGINT) DESC, s
LIMIT 5
"""


QUERIES134: dict[str, tuple] = {
    "customer_part_jaccard_topk": (q_customer_part_jaccard_topk,
                                   SQL_CUST_JACCARD),
    "brand_share_shift": (q_brand_share_shift, SQL_BRAND_SHIFT),
    "supplier_share_trend": (q_supplier_share_trend,
                             SQL_SUPPLIER_TREND),
}
