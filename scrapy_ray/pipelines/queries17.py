"""Seventeenth oracle-query batch (round 4 finale) — TPC-H Q5 PROPER:

local-supplier volume. Revenue of lineitems whose SUPPLIER and CUSTOMER
sit in the SAME nation of one region, over a one-year order window,
grouped by nation — the classic 6-table join (lineitem x orders x
customer x supplier x nation x region) with the correlated
``c_nationkey = s_nationkey`` constraint that neither q_revenue_by_region
(no supplier side) nor q_volume_shipping (cross-nation pairs) exercises.

Shape: both dimension chains broadcast (supplier -> nation;
customer -> nation -> region composed driver-side); the orders hop — the
fact-to-fact edge — is the reusable nation-coded-Bloom semi-join
(pipelines/bloomjoin.py): the order_code fn folds the REGION membership
AND the date window into the bloom build, so zero-hit lineitem rows drop
as semi-join misses, unique hits resolve the customer nation immediately
(kept only when it equals the supplier nation), and the ~fpr multi-hit
remainder is resolved exactly via chunked pruned probes. The only shuffle
is a groupby over |nations| + |ambiguous| partial rows — no O(fact)
shuffle anywhere.

DuckDB-oracle-checked on the same parquet tables.
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

_Q5_LO = pd.Timestamp("1996-01-01")
_Q5_HI = pd.Timestamp("1997-01-01")


def q_tpch_q5_like(sf_dir: str):
    """TPC-H Q5 (local supplier volume) over the alphabetically-first
    region; see module docstring for the no-fact-shuffle plan."""
    import pyarrow.parquet as pq_

    from scrapy_ray.pipelines.bloomjoin import (build_coded_blooms,
                                                probe_codes, resolve_exact)

    region = pq_.read_table(os.path.join(sf_dir, "region.parquet"))
    nation = pq_.read_table(os.path.join(sf_dir, "nation.parquet"))
    rk = sorted(zip(region["r_name"].to_pylist(),
                    region["r_regionkey"].to_pylist()))[0][1]
    names = {int(k): n for k, n, g in zip(nation["n_nationkey"].to_pylist(),
                                          nation["n_name"].to_pylist(),
                                          nation["n_regionkey"].to_pylist())
             if int(g) == int(rk)}
    codes = np.array(sorted(names), dtype=np.int64)
    code_set = set(int(c) for c in codes)

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

    orders = _pq(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_code(t: pa.Table) -> np.ndarray:
        """Customer nation code for qualifying orders (region member AND
        inside the date window), -1 otherwise — region + window membership
        ride the bloom build, so misses never leave the probe."""
        k, n = ray.get(cust_ref) if isinstance(cust_ref, ray.ObjectRef) \
            else cust_ref
        oc = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = n[np.searchsorted(k, oc)]
        ind = pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(_Q5_LO)),
                      pc.less(t["o_orderdate"], pa.scalar(_Q5_HI))) \
            .to_numpy(zero_copy_only=False)
        return np.where(ind & np.isin(nat, codes), nat, -1)

    cap = max(1024, _nrows(sf_dir, "orders") // max(2, 2 * len(codes)))
    blooms_ref = ray.put(build_coded_blooms(orders, "o_orderkey", order_code,
                                            codes, cap))

    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"])

    _EMPTY = {"kind": pa.array([], pa.int32()),
              "s_code": pa.array([], pa.int64()),
              "key": pa.array([], pa.int64()),
              "revenue_c": pa.array([], pa.int64()),
              "n": pa.array([], pa.int64())}

    def li_partial(t: pa.Table) -> pa.Table:
        skk, snn = ray.get(supp_ref) if isinstance(supp_ref, ray.ObjectRef) \
            else supp_ref
        bfs = ray.get(blooms_ref) if isinstance(blooms_ref, ray.ObjectRef) \
            else blooms_ref
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_nat = snn[np.searchsorted(skk, ls)]
        keep = np.isin(s_nat, codes)     # supplier must be local to region
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return pa.table(_EMPTY)
        s_nat = s_nat[keep]
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        one, c_code, amb = probe_codes(bfs, codes, ok)
        rc = _cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"]))) \
            .to_numpy(zero_copy_only=False)
        parts = []
        res = one & (c_code == s_nat)    # Q5: SAME nation both sides
        if res.any():
            df = pd.DataFrame({"s_code": s_nat[res], "key": c_code[res],
                               "rc": rc[res]})
            g = df.groupby(["s_code", "key"]).agg(
                revenue_c=("rc", "sum"), n=("rc", "count")).reset_index()
            g.insert(0, "kind", np.int32(0))
            parts.append(g)
        if amb.any():
            df = pd.DataFrame({"s_code": s_nat[amb], "key": ok[amb],
                               "rc": rc[amb]})
            g = df.groupby(["s_code", "key"]).agg(
                revenue_c=("rc", "sum"), n=("rc", "count")).reset_index()
            g.insert(0, "kind", np.int32(1))
            parts.append(g)
        if not parts:
            return pa.table(_EMPTY)
        g = pd.concat(parts, ignore_index=True)
        return pa.table({"kind": pa.array(g["kind"].to_numpy(np.int32)),
                         "s_code": pa.array(g["s_code"].to_numpy(np.int64)),
                         "key": pa.array(g["key"].to_numpy(np.int64)),
                         "revenue_c": pa.array(g["revenue_c"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    agg = (li.map_batches(li_partial, batch_format="pyarrow")
             .groupby(["kind", "s_code", "key"]).aggregate(
                 Sum("revenue_c", alias_name="revenue_c"),
                 Sum("n", alias_name="n")))

    acc: dict[int, list] = {}
    amb_rows: list[tuple] = []
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        for kind, sc, key, rv, n in zip(
                b["kind"].to_pylist(), b["s_code"].to_pylist(),
                b["key"].to_pylist(), b["revenue_c"].to_pylist(),
                b["n"].to_pylist()):
            if kind == 0:
                a = acc.setdefault(sc, [0, 0])
                a[0] += rv
                a[1] += n
            else:
                amb_rows.append((sc, key, rv, n))

    if amb_rows:
        amb_keys = sorted({k for _, k, _, _ in amb_rows})
        code_of = resolve_exact(orders, "o_orderkey", order_code, amb_keys)
        for sc, key, rv, n in amb_rows:
            if code_of.get(key, -1) == sc and sc in code_set:
                a = acc.setdefault(sc, [0, 0])
                a[0] += rv
                a[1] += n

    rows = sorted(acc)
    return pa.table({
        "n_name": pa.array([names[k] for k in rows], pa.string()),
        "revenue_c": pa.array([acc[k][0] for k in rows], pa.int64()),
        "n": pa.array([acc[k][1] for k in rows], pa.int64()),
    })


SQL_TPCH_Q5 = """
WITH reg AS (SELECT r_regionkey FROM region ORDER BY r_name LIMIT 1),
nat AS (SELECT n_nationkey, n_name FROM nation, reg
        WHERE n_regionkey = reg.r_regionkey)
SELECT nat.n_name AS n_name,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
          )::BIGINT AS revenue_c,
       count(*)::BIGINT AS n
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey  = o_custkey
JOIN supplier ON s_suppkey  = l_suppkey
JOIN nat      ON nat.n_nationkey = c_nationkey
             AND s_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY nat.n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# exact covariance moment matrix (one pass, arbitrary-precision finalize)
# ---------------------------------------------------------------------------

_COV_COLS = ("q", "p", "d", "t")   # quantity(units), price(dollars),
_COV_PAIRS = [(a, b) for i, a in enumerate(_COV_COLS)   # discount, tax (cents)
              for b in _COV_COLS[i:]]


def q_cov_matrix_lineitem(sf_dir: str):
    """EXACT population-covariance NUMERATORS ``n*sum(xy) - sum(x)*sum(y)``
    for every pair of four lineitem measures — the one-pass moment-matrix
    build (10 upper-triangle pairs incl. variances). Integer end to end:
    per-batch int64 partial sums of values and cross products (one tiny
    row per batch; magnitudes fit int64 per batch by the dollars/cents
    unit choice), combined driver-side in PYTHON ints (arbitrary
    precision — the n*sum(xy) finalization overflows int64 at bench scale
    exactly like DuckDB's HUGEINT path), emitted as decimal STRINGS so the
    compare is exact at any magnitude. The same one-pass shape at 100 TB
    tree-aggregates the per-batch partial rows instead of driver-summing
    them; nothing else changes."""
    ds = _pq(sf_dir, "lineitem",
             ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        def r(col: str, scale: float) -> np.ndarray:
            y = t[col].to_numpy(zero_copy_only=False).astype(np.float64) * scale
            return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)

        v = {"q": r("l_quantity", 1.0), "p": r("l_extendedprice", 1.0),
             "d": r("l_discount", 100.0), "t": r("l_tax", 100.0)}
        row = {"n": np.int64(len(t))}
        for c in _COV_COLS:
            row[f"s_{c}"] = v[c].sum()
        for a, b in _COV_PAIRS:
            row[f"s_{a}{b}"] = (v[a] * v[b]).sum()
        return pa.table({k: pa.array([int(x)]) for k, x in row.items()})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # exact combine: Python ints (per-batch partials fit int64; the global
    # finalization does not — same reason DuckDB promotes to HUGEINT)
    n = int(parts["n"].sum())
    s = {c: sum(int(x) for x in parts[f"s_{c}"]) for c in _COV_COLS}
    rows = []
    for a, b in _COV_PAIRS:
        sxy = sum(int(x) for x in parts[f"s_{a}{b}"])
        rows.append((a, b, str(n * sxy - s[a] * s[b]), n))
    df = pd.DataFrame(rows, columns=["col_x", "col_y", "cov_num", "n"])
    df["n"] = df["n"].astype(np.int64)
    return df.sort_values(["col_x", "col_y"]).reset_index(drop=True)


def _cov_sql() -> str:
    sel = ["COUNT(*)::HUGEINT AS n"]
    for c in _COV_COLS:
        sel.append(f"sum({c})::HUGEINT AS s_{c}")
    for a, b in _COV_PAIRS:
        sel.append(f"sum({a}*{b})::HUGEINT AS s_{a}{b}")
    unions = []
    for a, b in _COV_PAIRS:
        unions.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
            f"CAST(n*s_{a}{b} - s_{a}*s_{b} AS VARCHAR) AS cov_num, "
            f"n::BIGINT AS n FROM s")
    return f"""
WITH b AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
                  CAST(round(l_extendedprice) AS BIGINT) AS p,
                  CAST(round(l_discount*100) AS BIGINT) AS d,
                  CAST(round(l_tax*100) AS BIGINT) AS t
           FROM lineitem),
s AS (SELECT {", ".join(sel)} FROM b)
{" UNION ALL ".join(unions)}
ORDER BY col_x, col_y
"""


SQL_COV_MATRIX = _cov_sql()


QUERIES17: dict[str, tuple] = {
    "tpch_q5_like": (q_tpch_q5_like, SQL_TPCH_Q5),
    "cov_matrix_lineitem": (q_cov_matrix_lineitem, SQL_COV_MATRIX),
}
