"""Eighteenth oracle-query batch — the remaining expressible TPC-H
shapes (the testdata lacks l_shipmode/commitdate/receiptdate and
p_container, so Q12/Q21 cannot be stated faithfully; Q2/Q11/Q16/Q20 need
partsupp, which the driver does not generate):

- Q14 promo revenue: broadcast-dim CASE aggregate over a shipdate month.
  The classic output is a float ratio; per the repo's no-float-sum-compare
  rule the query emits the exact integer-cents NUMERATOR and DENOMINATOR
  instead (promo_rev_c / total_rev_c) — the ratio is a trivial driver-side
  division for a consumer, and the compare stays exact.
- Q19 disjunctive-predicate scan: three OR'd (brand, size-range,
  quantity-range) classes. Parts are classified driver-side into a class
  code (tiny dim), the code array is broadcast, and each lineitem batch
  tests the per-class quantity window vectorized — the disjunction never
  materializes a join, and the scan stays zero-shuffle.
- Q17 small-quantity-order revenue: per-part average-quantity correlated
  filter, restricted to one brand. Two passes over a 2/3-column pruned
  lineitem read: pass 1 computes per-part integer (sum_qty, cnt) partials
  per batch and combines them with a Ray groupby over the tiny partial
  stream (scale-safe: the shuffle payload is |branded parts| x batches
  rows, never O(fact)); pass 2 applies the EXACT integer form of the
  classic predicate — qty < 0.2*avg(qty)  <=>  5*cnt*qty < sum_qty —
  so no float-division tie can diverge from the oracle.

All three: pruned reads, broadcast small sides via ray.put, per-batch
int64 partials, exact integer-cents compares (BIGINT in the oracle).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _nrows, _pq

_Q14_LO = pd.Timestamp("1996-03-01")
_Q14_HI = pd.Timestamp("1996-04-01")


def _part_arrays(sf_dir: str, columns: list[str]):
    import pyarrow.parquet as pq_
    t = pq_.read_table(os.path.join(sf_dir, "part.parquet"), columns=columns)
    return t


def q_tpch_q14_like(sf_dir: str):
    """TPC-H Q14 (promo revenue) — exact integer numerator/denominator."""
    part = _part_arrays(sf_dir, ["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    promo = pc.equal(part["p_type"], pa.scalar("PROMO")) \
        .to_numpy(zero_copy_only=False)
    o = np.argsort(pk, kind="stable")
    dim_ref = ray.put((pk[o], promo[o]))

    ds = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        k, pr = ray.get(dim_ref) if isinstance(dim_ref, ray.ObjectRef) \
            else dim_ref
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(_Q14_LO)),
                       pc.less(t["l_shipdate"], pa.scalar(_Q14_HI)))
        t = t.filter(keep)
        if len(t) == 0:
            return pa.table({"promo_rev_c": pa.array([], pa.int64()),
                             "total_rev_c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_promo = pr[np.searchsorted(k, lp)]
        rc = _cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"]))) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "promo_rev_c": pa.array([int(rc[is_promo].sum())]),
            "total_rev_c": pa.array([int(rc.sum())]),
            "n": pa.array([np.int64(len(t))]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # per-batch int64 partials; global combine is a tiny exact sum (at
    # 100 TB: tree-aggregate the partial rows — same one-pass shape)
    return pd.DataFrame({
        "promo_rev_c": [np.int64(parts["promo_rev_c"].sum())],
        "total_rev_c": [np.int64(parts["total_rev_c"].sum())],
        "n": [np.int64(parts["n"].sum())],
    })


SQL_TPCH_Q14 = """
SELECT
  coalesce(sum(CASE WHEN p_type = 'PROMO'
       THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
       ELSE 0 END), 0)::BIGINT AS promo_rev_c,
  coalesce(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
       AS BIGINT)), 0)::BIGINT AS total_rev_c,
  count(*)::BIGINT AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
"""


# (brand, max p_size, qty lo, qty hi) — three disjunctive classes
_Q19_CLASSES = [("Brand#12", 15, 1.0, 21.0),
                ("Brand#23", 20, 10.0, 30.0),
                ("Brand#19", 25, 20.0, 40.0)]


def q_tpch_q19_like(sf_dir: str):
    """TPC-H Q19 (discounted revenue, disjunctive predicate classes)."""
    part = _part_arrays(sf_dir, ["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    brand = part["p_brand"].to_numpy(zero_copy_only=False)
    size = part["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    cls = np.full(len(pk), -1, dtype=np.int8)
    for i, (b, hi, _ql, _qh) in enumerate(_Q19_CLASSES):
        cls[(brand == b) & (size >= 1) & (size <= hi)] = i
    o = np.argsort(pk, kind="stable")
    dim_ref = ray.put((pk[o], cls[o]))
    qlo = np.array([c[2] for c in _Q19_CLASSES])
    qhi = np.array([c[3] for c in _Q19_CLASSES])

    ds = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_quantity", "l_extendedprice",
                      "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        k, c = ray.get(dim_ref) if isinstance(dim_ref, ray.ObjectRef) \
            else dim_ref
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ci = c[np.searchsorted(k, lp)].astype(np.int64)
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        hit = ci >= 0
        ci0 = np.where(hit, ci, 0)
        keep = hit & (q >= qlo[ci0]) & (q <= qhi[ci0])
        rc = _cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"]))) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"revenue_c": pa.array([int(rc[keep].sum())]),
                         "n": pa.array([int(keep.sum())])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"revenue_c": [np.int64(parts["revenue_c"].sum())],
                         "n": [np.int64(parts["n"].sum())]})


def _q19_sql() -> str:
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {hi} "
        f"AND l_quantity BETWEEN {ql} AND {qh})"
        for b, hi, ql, qh in _Q19_CLASSES)
    return f"""
SELECT coalesce(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
         AS BIGINT)), 0)::BIGINT AS revenue_c,
       count(*)::BIGINT AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {ors}
"""


SQL_TPCH_Q19 = _q19_sql()

_Q17_BRAND = "Brand#13"


def q_tpch_q17_like(sf_dir: str):
    """TPC-H Q17 (small-quantity-order revenue) with the exact-integer
    predicate 5*cnt*qty < sum_qty (== qty < 0.2*avg(qty), no float ties)."""
    part = _part_arrays(sf_dir, ["p_partkey", "p_brand"])
    mask = pc.equal(part["p_brand"], pa.scalar(_Q17_BRAND)) \
        .to_numpy(zero_copy_only=False)
    bpk = np.sort(part["p_partkey"].to_numpy(zero_copy_only=False)
                  .astype(np.int64)[mask])
    bpk_ref = ray.put(bpk)

    def _qint(t: pa.Table) -> np.ndarray:
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        return (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64)

    def _branded(t: pa.Table) -> tuple[pa.Table, np.ndarray]:
        k = ray.get(bpk_ref) if isinstance(bpk_ref, ray.ObjectRef) else bpk_ref
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(k, lp)
        keep = (pos < len(k)) & (k[np.minimum(pos, len(k) - 1)] == lp)
        return t.filter(pa.array(keep)), lp[keep]

    # pass 1: per-part integer (sum_qty, cnt) — per-batch partial groupby,
    # combined by a Ray groupby over the TINY partial stream (payload is
    # |branded parts| x batches rows, never O(fact) — scale-safe)
    ds1 = _pq(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        t, lp = _branded(t)
        if len(t) == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "sq": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        qi = _qint(t)
        order = np.argsort(lp, kind="stable")
        lp, qi = lp[order], qi[order]
        starts = np.flatnonzero(np.r_[True, lp[1:] != lp[:-1]])
        ends = np.r_[starts[1:], len(lp)]
        csum = np.r_[0, np.cumsum(qi)]
        return pa.table({"pk": pa.array(lp[starts]),
                         "sq": pa.array(csum[ends] - csum[starts]),
                         "cnt": pa.array((ends - starts).astype(np.int64))})

    g = (ds1.map_batches(partial, batch_format="pyarrow")
         .groupby("pk").aggregate(Sum("sq"), Sum("cnt")).to_pandas())
    gk = g["pk"].to_numpy().astype(np.int64)
    o = np.argsort(gk, kind="stable")
    stats_ref = ray.put((gk[o],
                         g["sum(sq)"].to_numpy().astype(np.int64)[o],
                         g["sum(cnt)"].to_numpy().astype(np.int64)[o]))

    # pass 2: qualify rows with 5*cnt*qty < sum_qty, sum price cents
    ds2 = _pq(sf_dir, "lineitem",
              columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def qualify(t: pa.Table) -> pa.Table:
        t, lp = _branded(t)
        if len(t) == 0:
            return pa.table({"sum_price_c": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        k, sq, cnt = ray.get(stats_ref) \
            if isinstance(stats_ref, ray.ObjectRef) else stats_ref
        pos = np.searchsorted(k, lp)
        qi = _qint(t)
        keep = 5 * cnt[pos] * qi < sq[pos]
        pcents = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        return pa.table({"sum_price_c": pa.array([int(pcents[keep].sum())]),
                         "n_rows": pa.array([int(keep.sum())])})

    parts = ds2.map_batches(qualify, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"sum_price_c": [np.int64(parts["sum_price_c"].sum())],
                         "n_rows": [np.int64(parts["n_rows"].sum())]})


SQL_TPCH_Q17 = f"""
WITH g AS (
  SELECT l_partkey AS pk,
         sum(CAST(round(l_quantity) AS BIGINT)) AS sq,
         count(*)::BIGINT AS cnt
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{_Q17_BRAND}'
  GROUP BY 1)
SELECT coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0)::BIGINT
         AS sum_price_c,
       count(*)::BIGINT AS n_rows
FROM lineitem l JOIN g ON g.pk = l.l_partkey
WHERE 5 * g.cnt * CAST(round(l.l_quantity) AS BIGINT) < g.sq
"""


# ---------------------------------------------------------------------------
# Q10: returned-item revenue, top-20 customers
# ---------------------------------------------------------------------------

_Q10_LO = pd.Timestamp("1996-10-01")
_Q10_HI = pd.Timestamp("1997-01-01")


def q_tpch_q10_like(sf_dir: str):
    """TPC-H Q10 (returned-item revenue): top-20 customers by revenue from
    RETURNED lineitems of orders in a 3-month window, enriched with
    customer name / account balance / nation.

    Plan (no O(fact) driver structure anywhere):
    1. one streaming pass over orders builds a mergeable Bloom over the
       WINDOWED orderkeys and keeps the windowed (o_orderkey, o_custkey)
       Dataset (~1/26 of orders) — the window rides the bloom build;
    2. lineitem pruned to 4 columns, filtered returnflag='R' AND
       bloom(l_orderkey), per-batch partial groupby(l_orderkey), then the
       small groupby Sum -> per-order revenue (bloom FPs still present);
    3. native Dataset.join per-order-revenue x windowed-orders (inner, on
       orderkey) — kills the FPs EXACTLY (an FP key is outside the window
       by construction) and carries o_custkey, the attribute a semi-join
       cannot: this is the general fact-fact edge, per queries4's measured
       native-join notes;
    4. groupby(o_custkey) Sum -> per-customer revenue; per-block partial
       top-20 (exact after the groupby: one row per key globally) + tiny
       driver merge;
    5. only the 20 WINNERS are enriched with the customer/nation dims
       (driver-side dim reads — 20 rows, never the fact tables).
    """
    import pyarrow.parquet as pq_

    from scrapy_ray.state.bloom import BloomFilter

    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])
    bloom_cap = max(1024, _nrows(sf_dir, "orders") // 8)

    def window_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(_Q10_LO)),
            pc.less(t["o_orderdate"], pa.scalar(_Q10_HI))))
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(t["o_custkey"], pa.int64())})

    windowed = orders.map_batches(window_filter, batch_format="pyarrow")

    def order_bloom(t: pa.Table) -> pa.Table:
        bf = BloomFilter(bloom_cap, 12)
        bf.add_many(t["o_orderkey"].to_numpy(zero_copy_only=False)
                    .astype(np.uint64))
        return pa.table({"words": pa.array([bf.words.tobytes()],
                                           type=pa.binary())})

    merged_bf = BloomFilter(bloom_cap, 12)
    for b in windowed.map_batches(order_bloom, batch_format="pyarrow") \
                     .iter_batches(batch_size=None, batch_format="pyarrow"):
        for w in b["words"].to_pylist():
            merged_bf.words |= np.frombuffer(w, dtype=np.uint64)
    bloom_ref = ray.put(merged_bf)

    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                      "l_discount"])

    def li_partial(t: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) \
            else bloom_ref
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        keep = bf.contains_many(
            t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64))
        t = t.filter(pa.array(keep))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = pa.table({"o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                       "rc": _cents(rev)}).to_pandas()
        g = df.groupby("o_orderkey").agg(revenue_c=("rc", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    per_order = (li.map_batches(li_partial, batch_format="pyarrow")
                   .groupby("o_orderkey")
                   .aggregate(Sum("revenue_c", alias_name="revenue_c")))

    joined = windowed.join(per_order, join_type="inner", num_partitions=8,
                           on=("o_orderkey",))

    def cust_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"c_custkey": t["o_custkey"],
                       "revenue_c": t["revenue_c"]}).to_pandas()
        g = df.groupby("c_custkey").agg(revenue_c=("revenue_c", "sum")) \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    per_cust = (joined.map_batches(cust_partial, batch_format="pyarrow")
                      .groupby("c_custkey")
                      .aggregate(Sum("revenue_c", alias_name="revenue_c")))

    def part_top(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("revenue_c", "descending"),
                                            ("c_custkey", "ascending")])[:20]
        return t.take(idx)

    parts = list(per_cust.map_batches(part_top, batch_format="pyarrow")
                         .iter_batches(batch_size=None,
                                       batch_format="pyarrow"))
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"c_custkey": pa.array([], pa.int64()),
         "revenue_c": pa.array([], pa.int64())})
    idx = pc.sort_indices(merged, sort_keys=[("revenue_c", "descending"),
                                             ("c_custkey", "ascending")])[:20]
    top = merged.take(idx)

    # enrich ONLY the winners (20 rows) with the customer/nation dims
    import pyarrow.parquet as pq2
    cust = pq2.read_table(os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey", "c_name", "c_acctbal",
                                   "c_nationkey"])
    nation = pq2.read_table(os.path.join(sf_dir, "nation.parquet"),
                            columns=["n_nationkey", "n_name"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    co = np.argsort(ck, kind="stable")
    pos = co[np.searchsorted(ck[co],
                             top["c_custkey"].to_numpy(zero_copy_only=False))]
    nk = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)[pos]
    nnk = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    no = np.argsort(nnk, kind="stable")
    npos = no[np.searchsorted(nnk[no], nk)]
    return pa.table({
        "c_custkey": top["c_custkey"],
        "c_name": cust["c_name"].take(pa.array(pos)),
        "revenue_c": top["revenue_c"],
        "acctbal_c": _cents(cust["c_acctbal"].take(pa.array(pos))),
        "n_name": nation["n_name"].take(pa.array(npos)),
    })


SQL_TPCH_Q10 = """
WITH rev AS (
  SELECT o_custkey AS c_custkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           ::BIGINT AS revenue_c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
  GROUP BY 1)
SELECT r.c_custkey, c.c_name, r.revenue_c,
       CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c, n.n_name
FROM rev r
JOIN customer c ON c.c_custkey = r.c_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY r.revenue_c DESC, r.c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q8: national market share by year
# ---------------------------------------------------------------------------

_Q8_LO = pd.Timestamp("1995-01-01")
_Q8_HI = pd.Timestamp("1997-01-01")
_Q8_TYPE = "ECONOMY"


def q_tpch_q8_like(sf_dir: str):
    """TPC-H Q8 (national market share): for orders from customers of the
    alphabetically-first region over 1995-1996 and lineitems of one part
    type, the per-YEAR exact integer numerator (revenue via suppliers of
    the region's alphabetically-first nation) and denominator (all
    suppliers) of the market-share ratio — the ratio itself is a trivial
    division for a consumer; emitting both keeps the compare exact.

    Same no-fact-shuffle plan as Q5 (queries17): part-type keys and the
    supplier->nation map are broadcast dims; the orders fact edge is the
    coded Bloom where the CODE IS THE ORDER YEAR (region membership and
    the window fold into the build, so non-qualifying orders never leave
    the probe); unique hits aggregate per (year, is_target_supplier),
    the ~fpr multi-hit remainder resolves exactly via chunked pruned
    probes. Only shuffle: a groupby over 2 years x 2 flags + ambiguous
    partials."""
    import pyarrow.parquet as pq_

    from scrapy_ray.pipelines.bloomjoin import (build_coded_blooms,
                                                probe_codes, resolve_exact)

    region = pq_.read_table(os.path.join(sf_dir, "region.parquet"))
    nation = pq_.read_table(os.path.join(sf_dir, "nation.parquet"))
    rk = sorted(zip(region["r_name"].to_pylist(),
                    region["r_regionkey"].to_pylist()))[0][1]
    reg_nations = sorted(
        (n, int(k)) for k, n, g in zip(nation["n_nationkey"].to_pylist(),
                                       nation["n_name"].to_pylist(),
                                       nation["n_regionkey"].to_pylist())
        if int(g) == int(rk))
    cust_nat_codes = np.array(sorted(k for _, k in reg_nations),
                              dtype=np.int64)
    tgt_nation = reg_nations[0][1]      # alphabetically-first nation

    supp = pq_.read_table(os.path.join(sf_dir, "supplier.parquet"),
                          columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk, kind="stable")
    supp_ref = ray.put((sk[so], sn[so]))

    part = _part_arrays(sf_dir, ["p_partkey", "p_type"])
    tpk = np.sort(part["p_partkey"].to_numpy(zero_copy_only=False)
                  .astype(np.int64)[
                      pc.equal(part["p_type"], pa.scalar(_Q8_TYPE))
                      .to_numpy(zero_copy_only=False)])
    tpk_ref = ray.put(tpk)

    cust = pq_.read_table(os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    co = np.argsort(ck, kind="stable")
    cust_ref = ray.put((ck[co], cn[co]))

    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])
    years = np.array([1995, 1996], dtype=np.int64)

    def order_code(t: pa.Table) -> np.ndarray:
        """Order YEAR for qualifying orders (region customer AND inside
        the two-year window), -1 otherwise."""
        k, n = ray.get(cust_ref) if isinstance(cust_ref, ray.ObjectRef) \
            else cust_ref
        oc = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = n[np.searchsorted(k, oc)]
        yr = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ind = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(_Q8_LO)),
                      pc.less(t["o_orderdate"], pa.scalar(_Q8_HI))) \
            .to_numpy(zero_copy_only=False)
        return np.where(ind & np.isin(nat, cust_nat_codes), yr, -1)

    cap = max(1024, _nrows(sf_dir, "orders") // 6)
    blooms_ref = ray.put(build_coded_blooms(orders, "o_orderkey", order_code,
                                            years, cap))

    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_suppkey",
                      "l_extendedprice", "l_discount"])

    _EMPTY18 = {"kind": pa.array([], pa.int32()),
                "key": pa.array([], pa.int64()),
                "is_tgt": pa.array([], pa.int32()),
                "revenue_c": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}

    def li_partial(t: pa.Table) -> pa.Table:
        tp = ray.get(tpk_ref) if isinstance(tpk_ref, ray.ObjectRef) \
            else tpk_ref
        skk, snn = ray.get(supp_ref) if isinstance(supp_ref, ray.ObjectRef) \
            else supp_ref
        bfs = ray.get(blooms_ref) if isinstance(blooms_ref, ray.ObjectRef) \
            else blooms_ref
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(tp, lp)
        keep = (pos < len(tp)) & (tp[np.minimum(pos, len(tp) - 1)] == lp)
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return pa.table(_EMPTY18)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_tgt = (snn[np.searchsorted(skk, ls)] == tgt_nation) \
            .astype(np.int32)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        one, yr_code, amb = probe_codes(bfs, years, ok)
        rc = _cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"]))) \
            .to_numpy(zero_copy_only=False)
        frames = []
        if one.any():
            g = pd.DataFrame({"key": yr_code[one], "is_tgt": is_tgt[one],
                              "rc": rc[one]}) \
                .groupby(["key", "is_tgt"]) \
                .agg(revenue_c=("rc", "sum"), n=("rc", "count")).reset_index()
            g.insert(0, "kind", np.int32(0))
            frames.append(g)
        if amb.any():
            g = pd.DataFrame({"key": ok[amb], "is_tgt": is_tgt[amb],
                              "rc": rc[amb]}) \
                .groupby(["key", "is_tgt"]) \
                .agg(revenue_c=("rc", "sum"), n=("rc", "count")).reset_index()
            g.insert(0, "kind", np.int32(1))
            frames.append(g)
        if not frames:
            return pa.table(_EMPTY18)
        g = pd.concat(frames, ignore_index=True)
        return pa.table({"kind": pa.array(g["kind"].to_numpy(np.int32)),
                         "key": pa.array(g["key"].to_numpy(np.int64)),
                         "is_tgt": pa.array(g["is_tgt"].to_numpy(np.int32)),
                         "revenue_c": pa.array(g["revenue_c"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    agg = (li.map_batches(li_partial, batch_format="pyarrow")
             .groupby(["kind", "key", "is_tgt"]).aggregate(
                 Sum("revenue_c", alias_name="revenue_c"),
                 Sum("n", alias_name="n")))

    acc: dict[int, list] = {int(y): [0, 0, 0] for y in years}   # tgt, tot, n
    amb_rows: list[tuple] = []
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        for kind, key, tgt, rv, n in zip(
                b["kind"].to_pylist(), b["key"].to_pylist(),
                b["is_tgt"].to_pylist(), b["revenue_c"].to_pylist(),
                b["n"].to_pylist()):
            if kind == 0:
                a = acc[key]
                a[0] += rv if tgt else 0
                a[1] += rv
                a[2] += n
            else:
                amb_rows.append((key, tgt, rv, n))

    if amb_rows:
        amb_keys = sorted({k for k, _, _, _ in amb_rows})
        code_of = resolve_exact(orders, "o_orderkey", order_code, amb_keys)
        for key, tgt, rv, n in amb_rows:
            yr = code_of.get(key, -1)
            if yr in acc:
                a = acc[yr]
                a[0] += rv if tgt else 0
                a[1] += rv
                a[2] += n

    ys = sorted(acc)
    return pa.table({
        "o_year": pa.array(ys, pa.int64()),
        "tgt_rev_c": pa.array([acc[y][0] for y in ys], pa.int64()),
        "total_rev_c": pa.array([acc[y][1] for y in ys], pa.int64()),
        "n": pa.array([acc[y][2] for y in ys], pa.int64()),
    })


SQL_TPCH_Q8 = f"""
WITH reg AS (SELECT r_regionkey FROM region ORDER BY r_name LIMIT 1),
nat AS (SELECT n_nationkey, n_name FROM nation, reg
        WHERE n_regionkey = reg.r_regionkey),
tgt AS (SELECT n_nationkey FROM nat ORDER BY n_name LIMIT 1),
base AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS rc,
         s_nationkey
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey  = o_custkey
  JOIN supplier ON s_suppkey  = l_suppkey
  JOIN part     ON p_partkey  = l_partkey
  JOIN nat      ON nat.n_nationkey = c_nationkey
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
    AND p_type = '{_Q8_TYPE}')
SELECT y.o_year,
       coalesce(sum(CASE WHEN s_nationkey = (SELECT n_nationkey FROM tgt)
                         THEN rc ELSE 0 END), 0)::BIGINT AS tgt_rev_c,
       coalesce(sum(rc), 0)::BIGINT AS total_rev_c,
       count(base.o_year)::BIGINT AS n
FROM (VALUES (1995), (1996)) AS y(o_year)
LEFT JOIN base ON base.o_year = y.o_year
GROUP BY y.o_year ORDER BY y.o_year
"""


QUERIES18: dict[str, tuple] = {
    "tpch_q14_like": (q_tpch_q14_like, SQL_TPCH_Q14),
    "tpch_q19_like": (q_tpch_q19_like, SQL_TPCH_Q19),
    "tpch_q17_like": (q_tpch_q17_like, SQL_TPCH_Q17),
    "tpch_q10_like": (q_tpch_q10_like, SQL_TPCH_Q10),
    "tpch_q8_like": (q_tpch_q8_like, SQL_TPCH_Q8),
}
