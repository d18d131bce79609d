"""Fourth oracle-query batch (round 3): multi-fact joins built on the
reusable coded-Bloom join core (pipelines/bloomjoin.py)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.bloomjoin import (build_coded_blooms, probe_codes,
                                            resolve_exact)
from scrapy_ray.pipelines.queries import _cents, _i64, _nrows, _pq


def q_volume_shipping(sf_dir: str):
    """TPC-H Q7-shaped two-fact, two-dimension-chain join: revenue shipped
    between the two (alphabetically first) nations, grouped by
    (supp_nation, cust_nation, ship year). The supplier chain is a true
    broadcast dim (s_suppkey -> nation); the customer chain crosses TWO
    fact tables (lineitem -> orders -> customer), resolved WITHOUT an
    O(fact) shuffle via nation-coded Blooms over qualifying orderkeys
    (bloomjoin.py): zero-hit lineitem rows drop (semi-join miss — the
    order's customer is in neither nation), unique hits resolve
    immediately, the ~fpr multi-hit remainder is resolved exactly with
    chunked probes of orders. Only a tiny (2 x 2 x years + ambiguous)
    groupby shuffles."""
    import pyarrow.parquet as pq_

    nation = pq_.read_table(os.path.join(sf_dir, "nation.parquet"))
    nd = sorted(zip(nation["n_name"].to_pylist(),
                    nation["n_nationkey"].to_pylist()))[:2]
    names = {int(k): n for n, k in nd}
    codes = np.array(sorted(names), dtype=np.int64)

    supp = pq_.read_table(os.path.join(sf_dir, "supplier.parquet"),
                          columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk, kind="stable")
    supp_ref = ray.put((sk[so], sn[so]))

    cust = pq_.read_table(os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    co = np.argsort(ck, kind="stable")
    cust_ref = ray.put((ck[co], cn[co]))
    code_set = set(int(c) for c in codes)

    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def order_code(t: pa.Table) -> np.ndarray:
        k, n = ray.get(cust_ref) if isinstance(cust_ref, ray.ObjectRef) else cust_ref
        oc = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = n[np.searchsorted(k, oc)]
        return np.where(np.isin(nat, codes), nat, -1)

    # qualifying orders ~ 2/|nations| of the table
    cap = max(1024, _nrows(sf_dir, "orders") // max(2, len(nation) // 2))
    blooms = build_coded_blooms(orders, "o_orderkey", order_code, codes, cap)
    blooms_ref = ray.put(blooms)

    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount", "l_shipdate"])

    def li_partial(t: pa.Table) -> pa.Table:
        skk, snn = ray.get(supp_ref) if isinstance(supp_ref, ray.ObjectRef) else supp_ref
        bfs = ray.get(blooms_ref) if isinstance(blooms_ref, ray.ObjectRef) else blooms_ref
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_nat = snn[np.searchsorted(skk, ls)]
        keep = np.isin(s_nat, codes)
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return pa.table({"kind": pa.array([], pa.int32()),
                             "s_code": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64()),
                             "l_year": pa.array([], pa.int64()),
                             "revenue_c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        s_nat = s_nat[keep]
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        one, c_code, amb = probe_codes(bfs, codes, ok)
        year = pc.year(t["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        rc = _cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"]))) \
            .to_numpy(zero_copy_only=False)
        parts = []
        res = one & (s_nat != c_code)        # cross-nation only
        if res.any():
            df = pd.DataFrame({"s_code": s_nat[res], "key": c_code[res],
                               "l_year": year[res], "rc": rc[res]})
            g = df.groupby(["s_code", "key", "l_year"]).agg(
                revenue_c=("rc", "sum"), n=("rc", "count")).reset_index()
            g.insert(0, "kind", np.int32(0))
            parts.append(g)
        if amb.any():
            df = pd.DataFrame({"s_code": s_nat[amb], "key": ok[amb],
                               "l_year": year[amb], "rc": rc[amb]})
            g = df.groupby(["s_code", "key", "l_year"]).agg(
                revenue_c=("rc", "sum"), n=("rc", "count")).reset_index()
            g.insert(0, "kind", np.int32(1))
            parts.append(g)
        if not parts:
            return pa.table({"kind": pa.array([], pa.int32()),
                             "s_code": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64()),
                             "l_year": pa.array([], pa.int64()),
                             "revenue_c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = pd.concat(parts, ignore_index=True)
        return pa.table({"kind": pa.array(g["kind"].to_numpy(np.int32)),
                         "s_code": pa.array(g["s_code"].to_numpy(np.int64)),
                         "key": pa.array(g["key"].to_numpy(np.int64)),
                         "l_year": pa.array(g["l_year"].to_numpy(np.int64)),
                         "revenue_c": pa.array(g["revenue_c"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    agg = (li.map_batches(li_partial, batch_format="pyarrow")
             .groupby(["kind", "s_code", "key", "l_year"]).aggregate(
                 Sum("revenue_c", alias_name="revenue_c"), Sum("n", alias_name="n")))

    acc: dict[tuple, list] = {}
    amb_rows: list[tuple] = []
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        for kind, sc, key, yr, rv, n in zip(
                b["kind"].to_pylist(), b["s_code"].to_pylist(),
                b["key"].to_pylist(), b["l_year"].to_pylist(),
                b["revenue_c"].to_pylist(), b["n"].to_pylist()):
            if kind == 0:
                a = acc.setdefault((sc, key, yr), [0, 0])
                a[0] += rv
                a[1] += n
            else:
                amb_rows.append((sc, key, yr, rv, n))

    if amb_rows:
        amb_keys = sorted({k for _, k, _, _, _ in amb_rows})
        code_of = resolve_exact(orders, "o_orderkey", order_code, amb_keys)
        for sc, key, yr, rv, n in amb_rows:
            cc = code_of.get(key, -1)
            if cc in code_set and cc != sc:
                a = acc.setdefault((sc, cc, yr), [0, 0])
                a[0] += rv
                a[1] += n

    rows = sorted(acc)
    return pa.table({
        "supp_nation": pa.array([names[s] for s, _, _ in rows], pa.string()),
        "cust_nation": pa.array([names[c] for _, c, _ in rows], pa.string()),
        "l_year": pa.array([y for _, _, y in rows], pa.int64()),
        "revenue_c": pa.array([acc[r][0] for r in rows], pa.int64()),
        "n": pa.array([acc[r][1] for r in rows], pa.int64()),
    })


SQL_VOLUME_SHIPPING = """
WITH nn AS (SELECT n_nationkey, n_name FROM nation ORDER BY n_name LIMIT 2)
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate)::BIGINT AS l_year,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT
           AS revenue_c,
       count(*)::BIGINT AS n
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nn sn ON sn.n_nationkey = s_nationkey
JOIN nn cn ON cn.n_nationkey = c_nationkey
WHERE s_nationkey <> c_nationkey
GROUP BY 1, 2, 3
"""


def q_native_join_revenue_by_status(sf_dir: str):
    """The GENERAL fact-to-fact equi-join via Ray Data's native hash join
    (``Dataset.join``, ray>=2.49): revenue per order status from
    orders x lineitem, pre-aggregated per orderkey on the lineitem side
    (shrinks the join's right input to one row per key — the same
    partial-aggregate discipline as everywhere else). The coded-Bloom
    pushdown (bloomjoin.py) is the optimized special case when the joined
    attribute is a small CODE; this is the fallback that works for any
    payload.

    Measured (sf0.1, 32 CPUs): the native join runs ~11s at
    num_partitions=8 (13s @4, 79s @32 — aggregator actors oversubscribe)
    vs ~5s for the bloom-pushdown shape on the HARDER 3-table
    revenue_by_region chain — which is why this repo's hot joins use
    broadcast dims / coded Blooms and the native join is the generic
    fallback."""
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = pa.table({"o_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                       "rc": _cents(rev)}).to_pandas()
        g = df.groupby("o_orderkey").agg(revenue_c=("rc", "sum"),
                                         n=("rc", "count")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    per_order = (li.map_batches(li_partial, batch_format="pyarrow")
                   .groupby("o_orderkey").aggregate(
                       Sum("revenue_c", alias_name="revenue_c"),
                       Sum("n", alias_name="n")))

    def cast_keys(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("o_orderkey"), "o_orderkey",
                            pc.cast(t["o_orderkey"], pa.int64()))

    joined = orders.map_batches(cast_keys, batch_format="pyarrow").join(
        per_order, join_type="inner", num_partitions=8, on=("o_orderkey",))

    def status_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"o_orderstatus": t["o_orderstatus"],
                       "revenue_c": t["revenue_c"], "n": t["n"]}).to_pandas()
        g = df.groupby("o_orderstatus").agg(revenue_c=("revenue_c", "sum"),
                                            n=("n", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = (joined.map_batches(status_partial, batch_format="pyarrow")
                 .groupby("o_orderstatus").aggregate(
                     Sum("revenue_c", alias_name="revenue_c"),
                     Sum("n", alias_name="n")))
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["revenue_c", "n"])


SQL_NATIVE_JOIN = """
SELECT o_orderstatus,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT
           AS revenue_c,
       count(*)::BIGINT AS n
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


QUERIES4: dict[str, tuple] = {
    "volume_shipping": (q_volume_shipping, SQL_VOLUME_SHIPPING),
    "native_join_revenue_by_status": (q_native_join_revenue_by_status, SQL_NATIVE_JOIN),
}
