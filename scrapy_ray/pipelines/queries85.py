"""Eighty-fifth oracle-query batch — economic decomposition / price
indices / spectral structure:

- shift_share_segments: shift-share decomposition of 1995 -> 1996
  revenue growth by customer market segment (broadcast customer dim,
  the queries.py `_broadcast_lookup` join — no fact shuffle):
  national-share NS = R1*(T2-T1)/T1 and competitive-shift
  CS = R2 - R1*T2/T1 per segment, identical-expression floats of the
  exact per-(segment, year) cents sums.
- price_index_parts: Laspeyres / Paasche / Fisher price indices
  between SHIPDATE-years 1995 and 1996 over parts (shipdate-year
  avoids the lineitem-orders fact-fact join; parts present in both
  years with positive quantity).  p_y*q_y = rev_y exactly, so the
  Laspeyres denominator and Paasche numerator are exact cent sums;
  the cross terms SUM rev2*qty1/qty2 quantize per part at 1e-4
  (products ~3e14 < 2^52) and integer-sum; Fisher = sqrt(L*P)
  identical-expression.
- adjacency_spectral_radius: lambda_1 estimate of the quadratic doc
  graph via 4 EXACT integer power iterations x <- A^T x from x0 = 1
  (x_k = # length-k in-walks — bounded by the small max in-degree,
  no normalization needed) and the l2 Rayleigh quotient
  <x4, x3>/<x3, x3> (the l1 ratio is exactly 3 by out-regularity —
  degenerate; the inner products weight by in-degree structure;
  probe sf0.001: 2.939130).  Inner products pair x4 with x3 inside
  the same salted dst partitions — exact int64 partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import (_broadcast_lookup, _cents,
                                          _cents_np, _nrows, _pq)
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_Y1, _Y2 = 1995, 1996
_US_PER_DAY = 86_400_000_000


def _year_np(ts_us: np.ndarray) -> np.ndarray:
    # derive calendar year via pandas (vectorized); timestamps are UTC µs
    return pd.to_datetime(ts_us, unit="us").year.to_numpy()


# ---------------------------------------------------------------------------
# Shift-share
# ---------------------------------------------------------------------------


def q_shift_share_segments(sf_dir: str):
    """1995->1996 revenue shift-share by market segment (docstring
    above)."""
    dim_ref = _broadcast_lookup(sf_dir, "customer", "c_custkey",
                                ["c_mktsegment"])
    ds = _pq(sf_dir, "orders",
             columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def jpart(df: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(dim_ref)
        # pandas batches carry datetime64[ns] — use .dt.year directly
        yr = df["o_orderdate"].dt.year.to_numpy()
        df = df[(yr == _Y1) | (yr == _Y2)].copy()
        if not len(df):
            return pd.DataFrame({"c_mktsegment": pd.Series([], object),
                                 "y": pd.Series([], np.int64),
                                 "rc": pd.Series([], np.int64)})
        df["y"] = df["o_orderdate"].dt.year.to_numpy().astype(np.int64)
        df["rc"] = _cents_np(df["o_totalprice"].to_numpy())
        j = df.join(dim, on="o_custkey", how="inner")
        g = j.groupby(["c_mktsegment", "y"])["rc"].sum().reset_index()
        g["rc"] = g["rc"].astype(np.int64)
        g["y"] = g["y"].astype(np.int64)
        return g

    cells = (ds.map_batches(jpart, batch_format="pandas")
               .groupby(["c_mktsegment", "y"])
               .aggregate(Sum("rc", alias_name="rc"))
               .to_pandas())
    piv = cells.pivot_table(index="c_mktsegment", columns="y",
                            values="rc", aggfunc="sum",
                            fill_value=0).reset_index()
    r1 = piv[_Y1].to_numpy(np.int64)
    r2 = piv[_Y2].to_numpy(np.int64)
    t1 = int(r1.sum())
    t2 = int(r2.sum())
    ns = [float(int(a)) * float(t2 - t1) / float(t1) for a in r1]
    cs = [float(int(b)) - float(int(a)) * float(t2) / float(t1)
          for a, b in zip(r1, r2)]
    out = pd.DataFrame({"c_mktsegment": piv["c_mktsegment"],
                        "r1_c": r1, "r2_c": r2,
                        "ns6": _round6(np.array(ns)),
                        "cs6": _round6(np.array(cs))})
    for col in ("r1_c", "r2_c"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


SQL_SHIFT_SHARE = f"""
WITH r AS (
  SELECT c_mktsegment, year(o_orderdate) AS y,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rc
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE year(o_orderdate) IN ({_Y1}, {_Y2})
  GROUP BY 1, 2),
p AS (
  SELECT c_mktsegment,
         coalesce(max(CASE WHEN y = {_Y1} THEN rc END), 0) AS r1,
         coalesce(max(CASE WHEN y = {_Y2} THEN rc END), 0) AS r2
  FROM r GROUP BY 1),
t AS (SELECT sum(r1)::BIGINT AS t1, sum(r2)::BIGINT AS t2 FROM p)
SELECT c_mktsegment, r1::BIGINT AS r1_c, r2::BIGINT AS r2_c,
       round(CAST(r1 AS DOUBLE) * CAST(t2 - t1 AS DOUBLE)
             / CAST(t1 AS DOUBLE), 6) AS ns6,
       round(CAST(r2 AS DOUBLE)
             - CAST(r1 AS DOUBLE) * CAST(t2 AS DOUBLE)
               / CAST(t1 AS DOUBLE), 6) AS cs6
FROM p CROSS JOIN t ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Price indices
# ---------------------------------------------------------------------------


def q_price_index_parts(sf_dir: str):
    """Laspeyres / Paasche / Fisher between shipdate-years 1995/1996
    (docstring above)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_shipdate", "l_extendedprice",
                      "l_discount", "l_quantity"])

    def ppart(t: pa.Table) -> pa.Table:
        yr = _year_np(t["l_shipdate"].cast(pa.int64())
                      .to_numpy(zero_copy_only=False))
        keep = (yr == _Y1) | (yr == _Y2)
        if not keep.any():
            return pa.table({"part": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "rc": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = pd.DataFrame({
            "part": t["l_partkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)[keep],
            "y": yr[keep].astype(np.int64),
            "rc": _cents(rev).to_numpy(zero_copy_only=False)[keep],
            "q": np.floor(t["l_quantity"]
                          .to_numpy(zero_copy_only=False)[keep]
                          + 0.5).astype(np.int64)})
        g = df.groupby(["part", "y"], sort=False).sum().reset_index()
        for c in ("rc", "q"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(ppart, batch_format="pyarrow")
               .groupby(["part", "y"])
               .aggregate(Sum("rc", alias_name="rc"),
                          Sum("q", alias_name="q"))
               .to_pandas())
    c1 = cells[cells["y"] == _Y1].set_index("part")
    c2 = cells[cells["y"] == _Y2].set_index("part")
    both = c1.join(c2, how="inner", lsuffix="_1", rsuffix="_2")
    both = both[(both["q_1"] > 0) & (both["q_2"] > 0)]
    n_parts = len(both)
    sr1 = int(both["rc_1"].sum())
    sr2 = int(both["rc_2"].sum())
    ln_q = int(np.floor(both["rc_2"].to_numpy(np.float64)
                        * both["q_1"].to_numpy(np.float64) * 10000.0
                        / both["q_2"].to_numpy(np.float64) + 0.5)
               .astype(np.int64).sum())
    pd_q = int(np.floor(both["rc_1"].to_numpy(np.float64)
                        * both["q_2"].to_numpy(np.float64) * 10000.0
                        / both["q_1"].to_numpy(np.float64) + 0.5)
               .astype(np.int64).sum())
    lasp = float(ln_q) / 10000.0 / float(sr1)
    paas = float(sr2) / (float(pd_q) / 10000.0)
    fisher = np.sqrt(lasp * paas)
    out = pd.DataFrame({"n_parts": [n_parts], "sr1": [sr1],
                        "sr2": [sr2], "ln_q": [ln_q], "pd_q": [pd_q],
                        "laspeyres6": [_round6(np.array([lasp]))[0]],
                        "paasche6": [_round6(np.array([paas]))[0]],
                        "fisher6": [_round6(np.array([fisher]))[0]]})
    for col in ("n_parts", "sr1", "sr2", "ln_q", "pd_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PRICE_INDEX = f"""
WITH py AS (
  SELECT l_partkey AS part, year(l_shipdate) AS y,
         sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                  AS BIGINT))::BIGINT AS rc,
         sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS q
  FROM lineitem WHERE year(l_shipdate) IN ({_Y1}, {_Y2})
  GROUP BY 1, 2),
b AS (
  SELECT a.part, a.rc AS rc1, a.q AS q1, c.rc AS rc2, c.q AS q2
  FROM py a JOIN py c ON c.part = a.part AND a.y = {_Y1}
                     AND c.y = {_Y2}
  WHERE a.q > 0 AND c.q > 0),
s AS (
  SELECT count(*)::BIGINT AS n_parts, sum(rc1)::BIGINT AS sr1,
         sum(rc2)::BIGINT AS sr2,
         sum(CAST(round(rc2 * CAST(q1 AS DOUBLE) * 10000.0 / q2)
                  AS BIGINT))::BIGINT AS ln_q,
         sum(CAST(round(rc1 * CAST(q2 AS DOUBLE) * 10000.0 / q1)
                  AS BIGINT))::BIGINT AS pd_q
  FROM b)
SELECT n_parts, sr1, sr2, ln_q, pd_q,
       round(CAST(ln_q AS DOUBLE) / 10000.0 / CAST(sr1 AS DOUBLE), 6)
         AS laspeyres6,
       round(CAST(sr2 AS DOUBLE) / (CAST(pd_q AS DOUBLE) / 10000.0), 6)
         AS paasche6,
       round(sqrt((CAST(ln_q AS DOUBLE) / 10000.0
                   / CAST(sr1 AS DOUBLE))
                  * (CAST(sr2 AS DOUBLE)
                     / (CAST(pd_q AS DOUBLE) / 10000.0))), 6)
         AS fisher6
FROM s
"""


# ---------------------------------------------------------------------------
# Spectral radius
# ---------------------------------------------------------------------------


def q_adjacency_spectral_radius(sf_dir: str):
    """Rayleigh-quotient lambda_1 estimate from exact integer power
    iterations (docstring above)."""
    n = _nrows(sf_dir, "documents")
    ds = _pq(sf_dir, "documents", ["doc_id"])

    def init(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(ids),
                         "x": pa.array(np.ones(len(ids), np.int64))})

    ranks = ds.map_batches(init, batch_format="pyarrow")

    def contribs(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        dsts = [(node * node + c) % n for c in (1, 2, 3)]
        return pa.table({"node": pa.array(np.concatenate(dsts)),
                         "x": pa.array(np.concatenate([x, x, x]))})

    for _ in range(3):
        ranks = (ranks.map_batches(contribs, batch_format="pyarrow")
                      .groupby("node").aggregate(Sum("x", alias_name="x")))

    # final step + Rayleigh inside salted dst partitions: x3 node rows
    # co-partition with their incoming contributions, so x4 pairs with
    # x3 locally
    def scatter(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = [node]
        val = [x]
        tag = [np.zeros(len(node), np.int64)]     # node rows carry x3
        for c in (1, 2, 3):
            key.append((node * node + c) % n)
            val.append(x)
            tag.append(np.ones(len(node), np.int64))
        allk = np.concatenate(key)
        return pa.table({"key": pa.array(allk),
                         "val": pa.array(np.concatenate(val)),
                         "tag": pa.array(np.concatenate(tag)),
                         "gkey": pa.array((allk % 256).astype(np.int32))})

    def rayleigh(df: pd.DataFrame) -> pd.DataFrame:
        node = df[df["tag"] == 0]
        ctb = df[df["tag"] == 1]
        x4 = ctb.groupby("key")["val"].sum()
        x3 = pd.Series(node["val"].to_numpy(np.int64),
                       index=node["key"].to_numpy(np.int64))
        common = x4.index.intersection(x3.index)
        num = int((x4.loc[common].to_numpy(np.int64)
                   * x3.loc[common].to_numpy(np.int64)).sum())
        den = int((x3.to_numpy(np.int64) ** 2).sum())
        return pd.DataFrame({"num": [num], "den": [den]})

    parts = (ranks.map_batches(scatter, batch_format="pyarrow")
                  .groupby("gkey").map_groups(rayleigh,
                                              batch_format="pandas")
                  .to_pandas())
    num = int(parts["num"].sum())
    den = int(parts["den"].sum())
    lam = float(num) / float(den)
    out = pd.DataFrame({"num": [num], "den": [den],
                        "lambda6": [_round6(np.array([lam]))[0]]})
    for col in ("num", "den"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SPECTRAL = """
WITH nd AS (SELECT count(*)::BIGINT AS n FROM documents),
e AS (
  SELECT d.doc_id AS u, (d.doc_id * d.doc_id + c.c) % nd.n AS v
  FROM documents d, (SELECT unnest([1, 2, 3]) AS c) c JOIN nd ON true),
x1 AS (SELECT v AS node, count(*)::BIGINT AS x FROM e GROUP BY 1),
x2 AS (SELECT e.v AS node, sum(x1.x)::BIGINT AS x
       FROM e JOIN x1 ON x1.node = e.u GROUP BY 1),
x3 AS (SELECT e.v AS node, sum(x2.x)::BIGINT AS x
       FROM e JOIN x2 ON x2.node = e.u GROUP BY 1),
x4 AS (SELECT e.v AS node, sum(x3.x)::BIGINT AS x
       FROM e JOIN x3 ON x3.node = e.u GROUP BY 1),
r AS (
  SELECT (SELECT sum(x4.x * x3.x)::BIGINT
          FROM x4 JOIN x3 ON x3.node = x4.node) AS num,
         (SELECT sum(x * x)::BIGINT FROM x3) AS den)
SELECT num, den,
       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS lambda6
FROM r
"""


QUERIES85: dict[str, tuple] = {
    "shift_share_segments": (q_shift_share_segments, SQL_SHIFT_SHARE),
    "price_index_parts": (q_price_index_parts, SQL_PRICE_INDEX),
    "adjacency_spectral_radius": (q_adjacency_spectral_radius,
                                  SQL_SPECTRAL),
}
