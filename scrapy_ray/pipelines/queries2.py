"""Second oracle-query batch — deepens SURVEY.md §2.8/§2.9 coverage: window
functions, CASE-bucketed aggregates, BETWEEN/date predicates, anti-joins,
multi-hop dimension joins, HAVING, and embedding near-dup pairs.

Same conventions as pipelines/queries.py (integer-cent exact sums, identical
column names, broadcast small sides, partial aggregation before shuffles).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _cents_np, _i64, _nrows, _pq


# ---------------------------------------------------------------- window fn

def q_window_running_sum(sf_dir: str):
    """Running per-user sum (window function §2.9): groupby(key).map_groups
    over ts-sorted groups — exact int64 cents, so the distributed cumsum
    byte-matches DuckDB's window frame."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        vc = _cents_np(g["value"].to_numpy())
        return pd.DataFrame({"user_id": g["user_id"], "event_id": g["event_id"],
                             "run_sum_c": np.cumsum(vc)})

    out = ds.groupby("user_id").map_groups(run, batch_format="pandas")
    return _i64(pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None),
                ["run_sum_c"])


SQL_WINDOW = """
SELECT user_id, event_id,
       (sum(CAST(round(value * 100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING))::BIGINT AS run_sum_c
FROM events
"""


# ---------------------------------------------------------------- case-when agg

def q_case_bucket_orders(sf_dir: str):
    """CASE-WHEN bucketing + two-key grouped count (vectorized np.select)."""
    ds = _pq(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])

    def bucket(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        b = np.select([p < 50_000, p < 150_000], ["small", "medium"], "large")
        df = pd.DataFrame({"o_orderstatus": t["o_orderstatus"].to_pylist(),
                           "price_bucket": b})
        g = df.groupby(["o_orderstatus", "price_bucket"]).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = ds.map_batches(bucket, batch_format="pyarrow") \
            .groupby(["o_orderstatus", "price_bucket"]).aggregate(Sum("n", alias_name="n"))
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["n"])


SQL_CASE = """
SELECT o_orderstatus,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
       count(*)::BIGINT AS n
FROM orders GROUP BY 1, 2
"""


# ---------------------------------------------------------------- between / predicates

def q_between_dates(sf_dir: str):
    """BETWEEN + equality predicates pushed into a vectorized batch filter."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_shipdate", "l_returnflag", "l_linestatus", "l_quantity"])
    lo, hi = pd.Timestamp("1994-01-01"), pd.Timestamp("1995-12-31")

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                            pc.less_equal(t["l_shipdate"], pa.scalar(hi))),
                    pc.equal(t["l_returnflag"], "R"))
        t = t.filter(m)
        df = pa.table({"l_linestatus": t["l_linestatus"],
                       "qc": _cents(t["l_quantity"])}).to_pandas()
        return pa.Table.from_pandas(
            df.groupby("l_linestatus").agg(sum_qty_c=("qc", "sum"),
                                           n=("qc", "count")).reset_index(),
            preserve_index=False).replace_schema_metadata(None)

    out = ds.map_batches(f, batch_format="pyarrow").groupby("l_linestatus").aggregate(
        Sum("sum_qty_c", alias_name="sum_qty_c"), Sum("n", alias_name="n"))
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["sum_qty_c", "n"])


SQL_BETWEEN = """
SELECT l_linestatus, sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS sum_qty_c,
       count(*)::BIGINT AS n
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1995-12-31'
  AND l_returnflag = 'R'
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------- anti-join

def q_customers_without_orders(sf_dir: str):
    """Anti-join (NOT EXISTS) = broadcast key set + vectorized negated
    membership filter (SURVEY §2.4: semi/anti join pattern). Keyed on
    'no large order' so the result is non-empty at every sf; result is
    concatenated into a fixed-schema Table (an empty Dataset would lose its
    schema through pandas)."""
    import pyarrow.parquet as pq_

    o = pq_.read_table(os.path.join(sf_dir, "orders.parquet"),
                       columns=["o_custkey", "o_totalprice"])
    big = o.filter(pc.greater_equal(o["o_totalprice"], 200_000.0))
    keys_ref = ray.put(pc.unique(big["o_custkey"]))
    ds = _pq(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def f(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        return t.filter(pc.invert(pc.is_in(t["c_custkey"], value_set=keys)))

    out = ds.map_batches(f, batch_format="pyarrow")
    parts = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    schema = pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())])
    return (pa.concat_tables([p.cast(schema) for p in parts])
            if parts else schema.empty_table())


SQL_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice >= 200000)
"""


# ---------------------------------------------------------------- multi-hop dim join

def q_revenue_by_region(sf_dir: str):
    """TPC-H Q5-shaped multi-hop dimension chain, de-unioned (round-3 rework
    per VERDICT item 5: Dataset.union upstream of a groupby costs 6-10s of
    fusion-breaking overhead, and the union shape shuffled BOTH fact tables
    on l_orderkey). New shape — region-coded Bloom pushdown, mirroring
    tpch_q3_like:

    1. True dims (customer→nation→region) compose driver-side into a
       (sorted custkey, region code) pair — broadcast once.
    2. One streaming pass over orders builds a mergeable Bloom PER REGION
       over its orderkeys (partial blooms per batch, OR-merged tiny).
    3. One streaming pass over lineitem probes each row against the R
       blooms: exactly-one-hit rows are resolved immediately (the true
       region's bloom always hits, so a unique hit IS the answer) and
       pre-aggregate to (r_code, revenue, n) partials in-batch; multi-hit
       rows (Bloom false positives, ~(R-1)*fpr of rows) emit per-orderkey
       partials instead.
    4. The only shuffle left is a groupby over ~R + |ambiguous keys| rows;
       ambiguous keys are then resolved EXACTLY in driver-bounded chunks
       (each chunk = one pruned 2-column probe of orders) and folded in.

    No O(fact) shuffle, no O(fact) driver state; exact output (Bloom FPs
    are verified, never guessed). Built on the reusable coded-Bloom join
    core (pipelines/bloomjoin.py — also used by volume_shipping)."""
    import pyarrow.parquet as pq_

    from scrapy_ray.pipelines.bloomjoin import (build_coded_blooms, probe_codes,
                                                resolve_exact)

    region = pq_.read_table(os.path.join(sf_dir, "region.parquet"))
    nation = pq_.read_table(os.path.join(sf_dir, "nation.parquet"))
    cust = pq_.read_table(os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey", "c_nationkey"])
    r_of_n = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    rnames = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    ckeys = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ccodes = np.array([r_of_n[n] for n in cust["c_nationkey"].to_pylist()], dtype=np.int64)
    order_sorted = np.argsort(ckeys, kind="stable")
    dim_ref = ray.put((ckeys[order_sorted], ccodes[order_sorted]))
    codes = np.array(sorted(rnames), dtype=np.int64)          # all region codes

    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def order_code(t: pa.Table) -> np.ndarray:
        sk, sc = ray.get(dim_ref) if isinstance(dim_ref, ray.ObjectRef) else dim_ref
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return sc[np.searchsorted(sk, ck)]

    bloom_cap = max(1024, _nrows(sf_dir, "orders") // max(1, len(codes)))
    blooms_ref = ray.put(build_coded_blooms(orders, "o_orderkey", order_code,
                                            codes, bloom_cap))

    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(t: pa.Table) -> pa.Table:
        """Emit (kind=0, key=r_code) partials for bloom-resolved rows and
        (kind=1, key=l_orderkey) partials for ambiguous (multi-hit) rows."""
        bfs = ray.get(blooms_ref) if isinstance(blooms_ref, ray.ObjectRef) else blooms_ref
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        one, code, amb = probe_codes(bfs, codes, ok)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        rc = _cents(rev).to_numpy(zero_copy_only=False)
        parts = []
        if one.any():
            df = pd.DataFrame({"key": code[one], "rc": rc[one]})
            g = df.groupby("key").agg(revenue_c=("rc", "sum"), n=("rc", "count")).reset_index()
            g.insert(0, "kind", np.int32(0))
            parts.append(g)
        if amb.any():
            df = pd.DataFrame({"key": ok[amb], "rc": rc[amb]})
            g = df.groupby("key").agg(revenue_c=("rc", "sum"), n=("rc", "count")).reset_index()
            g.insert(0, "kind", np.int32(1))
            parts.append(g)
        if not parts:
            return pa.table({"kind": pa.array([], pa.int32()), "key": pa.array([], pa.int64()),
                             "revenue_c": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        g = pd.concat(parts, ignore_index=True)
        return pa.table({"kind": pa.array(g["kind"].to_numpy(np.int32)),
                         "key": pa.array(g["key"].to_numpy(np.int64)),
                         "revenue_c": pa.array(g["revenue_c"].to_numpy(np.int64)),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    agg = (li.map_batches(li_partial, batch_format="pyarrow")
             .groupby(["kind", "key"]).aggregate(
                 Sum("revenue_c", alias_name="revenue_c"), Sum("n", alias_name="n")))

    rev_of = {int(c): 0 for c in codes}
    n_of = {int(c): 0 for c in codes}
    amb_rev: dict[int, tuple[int, int]] = {}
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        for kind, key, rv, n in zip(b["kind"].to_pylist(), b["key"].to_pylist(),
                                    b["revenue_c"].to_pylist(), b["n"].to_pylist()):
            if kind == 0:
                rev_of[key] += rv
                n_of[key] += n
            else:
                amb_rev[key] = (rv, n)

    if amb_rev:
        code_of = resolve_exact(orders, "o_orderkey", order_code, sorted(amb_rev))
        for key, c in code_of.items():
            rv, n = amb_rev[key]
            rev_of[c] += rv
            n_of[c] += n

    out_names = [rnames[int(c)] for c in codes if n_of[int(c)] > 0]
    return pa.table({
        "r_name": pa.array(out_names, pa.string()),
        "revenue_c": pa.array([rev_of[int(c)] for c in codes if n_of[int(c)] > 0], pa.int64()),
        "n": pa.array([n_of[int(c)] for c in codes if n_of[int(c)] > 0], pa.int64()),
    })


SQL_REGION = """
SELECT r_name,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT AS revenue_c,
       count(*)::BIGINT AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------- having

def q_heavy_users_having(sf_dir: str):
    """GROUP BY + HAVING = filter applied after the distributed aggregate."""
    ds = _pq(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.groupby("user_id").size().reset_index(name="n"),
                                    preserve_index=False).replace_schema_metadata(None)

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("user_id").aggregate(
        Sum("n", alias_name="n"))
    t = _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["n"])
    return t.filter(pc.greater_equal(t["n"], 15))


SQL_HAVING = """
SELECT user_id, count(*)::BIGINT AS n FROM events
GROUP BY user_id HAVING count(*) >= 15
"""


# ---------------------------------------------------------------- embedding near-dup

_ND_TAU = 0.35


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs, brute-force (oracle-checkable):
    broadcast the full normalized matrix (embeddings table is the small side
    by design), per-batch blocked matmul emits pairs with cos >= tau.
    The LSH-bucketed scale path is q_embedding_neardup_lsh."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    E = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    ref = ray.put((ids, En))

    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def pairs(tt: pa.Table) -> pa.Table:
        all_ids, all_en = ray.get(ref)
        vid = tt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Eb = np.stack(tt["embedding"].to_pylist()).astype(np.float64)
        Ebn = Eb / np.linalg.norm(Eb, axis=1, keepdims=True)
        S = Ebn @ all_en.T
        sims = np.sign(S) * np.floor(np.abs(S) * 1e4 + 0.5) / 1e4
        ii, jj = np.nonzero(sims >= _ND_TAU)
        a, b = vid[ii], all_ids[jj]
        keep = a < b          # each unordered pair once
        return pa.table({"vec_a": pa.array(a[keep], type=pa.int64()),
                         "vec_b": pa.array(b[keep], type=pa.int64()),
                         "cos_sim": pa.array(sims[ii, jj][keep], type=pa.float64())})

    out = ds.map_batches(pairs, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)


SQL_EMB_ND = f"""
SELECT vec_a, vec_b, cos_sim FROM (
  SELECT a.vec_id::BIGINT AS vec_a, b.vec_id::BIGINT AS vec_b,
         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
WHERE cos_sim >= {_ND_TAU}
"""


def q_embedding_neardup_lsh(sf_dir: str, n_tables: int = 16, n_planes: int = 3,
                            n_vec_buckets: int = 16):
    """Random-hyperplane LSH near-dup (the scale path: bucket by sign
    signature, compare only within buckets — no all-pairs matmul). Multiple
    OR-ed hash tables are what gives recall: a cos=0.35 pair agrees with one
    3-plane table w.p. ~(1-θ/π)^3≈0.23, and with >=1 of 16 tables w.p.
    ~0.98 (single-table recall was measured at 0.02 — the classic AND-only
    mistake). Rows-only; recall vs brute force pinned in
    tests/test_training.py.

    SLIM SHUFFLE + BUCKETED GATHER (rounds 3-4, VERDICT items 6 and r3-3):
    only (table, bucket, vec_id, gkey) rows — ~24 bytes — move through the
    exchange, and NOTHING O(corpus) is broadcast or driver-resident: the
    bucketize pass normalizes vectors and persists them once to a
    vec_id-bucketed scratch parquet layout (side effect; the groupby
    barrier orders writes before reads), then each salted verify partition
    reads back only the vec_id buckets ITS candidate groups touch. Salted
    ~256-partition verify (not one Ray group per (table,bucket)) for the
    same per-group-dispatch reason as the MinHash LSH candidate stage."""
    import shutil
    import tempfile
    import uuid

    import pyarrow.parquet as pq_

    pf = pq_.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first["embedding"][0])
    del pf, first
    rng = np.random.default_rng(11)
    planes = rng.standard_normal((n_tables, dim, n_planes))
    p_ref = ray.put(planes)

    scratch = tempfile.mkdtemp(prefix="emb_lsh_", dir="/tmp")
    for b in range(n_vec_buckets):
        os.makedirs(os.path.join(scratch, f"bucket={b}"), exist_ok=True)

    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def bucketize(tt: pa.Table) -> pa.Table:
        P = ray.get(p_ref) if isinstance(p_ref, ray.ObjectRef) else p_ref
        E = np.stack(tt["embedding"].to_pylist()).astype(np.float64)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        vid = pc.cast(tt["vec_id"], pa.int64()).to_numpy(zero_copy_only=False)
        # side effect: persist this block's NORMALIZED vectors bucketed by
        # vec_id hash — the verify stage gathers per bucket, never a
        # whole-corpus broadcast
        bkt = (vid % n_vec_buckets).astype(np.int32)
        st = pa.table({"vec_id": pa.array(vid, type=pa.int64()),
                       "vn": pa.array(list(En), type=pa.list_(pa.float64()))})
        for b in np.unique(bkt):
            pq_.write_table(st.filter(pa.array(bkt == b)), os.path.join(
                scratch, f"bucket={int(b)}", f"{uuid.uuid4().hex}.parquet"))
        n = len(En)
        keys = np.empty((P.shape[0], n), dtype=np.uint64)
        for tab in range(P.shape[0]):
            sig = ((En @ P[tab]) > 0).astype(np.uint64)
            key = np.zeros(n, dtype=np.uint64)
            for b in range(sig.shape[1]):
                key = (key << np.uint64(1)) | sig[:, b]
            keys[tab] = key
        tabs = np.repeat(np.arange(P.shape[0], dtype=np.int32), n)
        gkey = (((keys.ravel() * np.uint64(n_tables) + tabs.astype(np.uint64))
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(56)).astype(np.int32)
        return pa.table({
            "table": pa.array(tabs),
            "bucket": pa.array(keys.ravel(), type=pa.uint64()),
            "vec_id": pa.array(np.tile(vid, P.shape[0]), type=pa.int64()),
            "gkey": pa.array(gkey)})

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series(dtype=np.int64),
                              "vec_b": pd.Series(dtype=np.int64),
                              "cos_sim": pd.Series(dtype=np.float64)})
        if len(g) < 2:
            return empty
        g = g.sort_values(["table", "bucket", "vec_id"], kind="mergesort")
        tab = g["table"].to_numpy()
        buc = g["bucket"].to_numpy()
        ids = g["vec_id"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (tab[1:] != tab[:-1]) | (buc[1:] != buc[:-1])
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(g)]
        sizes = ends - starts
        if not (sizes >= 2).any():
            return empty
        # gather ONLY this partition's vectors from the touched buckets
        need = np.unique(np.concatenate(
            [ids[s:e] for s, e in zip(starts[sizes >= 2], ends[sizes >= 2])]))
        rows_id, rows_vn = [], []
        for b in np.unique(need % n_vec_buckets):
            bt = pq_.read_table(os.path.join(scratch, f"bucket={int(b)}"),
                                columns=["vec_id", "vn"])
            bt = bt.filter(pc.is_in(bt["vec_id"],
                                    value_set=pa.array(need, type=pa.int64())))
            rows_id.append(bt["vec_id"].to_numpy(zero_copy_only=False))
            rows_vn.append(np.stack(bt["vn"].to_pylist())
                           if len(bt) else np.empty((0, dim)))
        gid = np.concatenate(rows_id).astype(np.int64)
        gvn = np.concatenate(rows_vn, axis=0)
        order = np.argsort(gid, kind="stable")
        gid, gvn = gid[order], gvn[order]
        out_a, out_b, out_s = [], [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            sub = ids[s:e]
            En = gvn[np.searchsorted(gid, sub)]
            S = En @ En.T
            sims = np.sign(S) * np.floor(np.abs(S) * 1e4 + 0.5) / 1e4
            ii, jj = np.triu_indices(len(sub), k=1)
            keep = sims[ii, jj] >= _ND_TAU
            out_a.append(np.minimum(sub[ii[keep]], sub[jj[keep]]))
            out_b.append(np.maximum(sub[ii[keep]], sub[jj[keep]]))
            out_s.append(sims[ii, jj][keep])
        return pd.DataFrame({
            "vec_a": np.concatenate(out_a).astype(np.int64),
            "vec_b": np.concatenate(out_b).astype(np.int64),
            "cos_sim": np.concatenate(out_s)})

    try:
        out = bucketed.groupby("gkey").map_groups(partition_pairs,
                                                  batch_format="pandas")
        df = out.to_pandas().drop_duplicates(["vec_a", "vec_b"], ignore_index=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return pa.Table.from_pandas(df.sort_values(["vec_a", "vec_b"], ignore_index=True),
                                preserve_index=False).replace_schema_metadata(None)


def q_embedding_lsh_recall(sf_dir: str):
    """Driver-visible LSH quality (round 3, VERDICT item 7): recall and
    false-positive count of the hyperplane-LSH pair set against the exact
    brute-force pair set, computed in-pipeline; the pytest bars (recall
    >= 0.8, zero false positives) are asserted HERE so a silent quality
    regression fails the query itself."""
    bf = q_embedding_neardup(sf_dir)
    lsh = q_embedding_neardup_lsh(sf_dir)
    bf_pairs = set(zip(bf["vec_a"].to_pylist(), bf["vec_b"].to_pylist()))
    lsh_pairs = set(zip(lsh["vec_a"].to_pylist(), lsh["vec_b"].to_pylist()))
    fp = len(lsh_pairs - bf_pairs)
    recall = len(lsh_pairs & bf_pairs) / max(1, len(bf_pairs))
    assert fp == 0, f"LSH emitted unverified pairs: {fp}"
    assert recall >= 0.8, f"LSH recall collapsed: {recall}"
    r4 = np.sign(recall) * np.floor(abs(recall) * 1e4 + 0.5) / 1e4
    return pa.table({"n_true_pairs": pa.array([len(bf_pairs)], pa.int64()),
                     "n_lsh_pairs": pa.array([len(lsh_pairs)], pa.int64()),
                     "n_false_pos": pa.array([fp], pa.int64()),
                     "recall": pa.array([float(r4)], pa.float64())})


QUERIES2: dict[str, tuple] = {
    "window_running_sum": (q_window_running_sum, SQL_WINDOW),
    "case_bucket_orders": (q_case_bucket_orders, SQL_CASE),
    "between_dates": (q_between_dates, SQL_BETWEEN),
    "customers_without_orders": (q_customers_without_orders, SQL_ANTI),
    "revenue_by_region": (q_revenue_by_region, SQL_REGION),
    "heavy_users_having": (q_heavy_users_having, SQL_HAVING),
    "embedding_neardup": (q_embedding_neardup, SQL_EMB_ND),
    "embedding_neardup_lsh": (q_embedding_neardup_lsh, None),
    "embedding_lsh_recall": (q_embedding_lsh_recall, None),
}


# ---------------------------------------------------------------- as-of join

def q_asof_purchase_last_view(sf_dir: str):
    """As-of join (brief's custom-operator list; Ray Data has no native
    as-of): for each purchase event, the most recent STRICTLY-earlier view
    by the same user. Pattern: partition by key, sort by ts within group,
    ``pd.merge_asof`` per group (ray_guide 'As-of / range join'). Documented
    partitioning assumption: all rows of one user fit one group. Output
    carries the matched ts (not event_id) so exact-ts ties are unambiguous."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        v = g[g["event_type"] == "view"].sort_values(["ts", "event_id"])
        if len(p) == 0:
            return pd.DataFrame({"purchase_event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "last_view_ts": pd.Series(dtype="datetime64[us]")})
        if len(v) == 0:
            return pd.DataFrame({"purchase_event_id": p["event_id"].to_numpy(),
                                 "user_id": p["user_id"].to_numpy(),
                                 "last_view_ts": pd.Series([pd.NaT] * len(p),
                                                           dtype="datetime64[us]")})
        j = pd.merge_asof(p[["event_id", "user_id", "ts"]],
                          v[["ts"]].assign(last_view_ts=v["ts"].to_numpy()),
                          on="ts", direction="backward", allow_exact_matches=False)
        return pd.DataFrame({"purchase_event_id": j["event_id"].to_numpy(),
                             "user_id": j["user_id"].to_numpy(),
                             "last_view_ts": j["last_view_ts"].astype("datetime64[us]")})

    out = ds.groupby("user_id").map_groups(asof, batch_format="pandas")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)
    return _i64(t, ["purchase_event_id", "user_id"])


SQL_ASOF = """
SELECT p.event_id::BIGINT AS purchase_event_id, p.user_id::BIGINT AS user_id,
       v.ts AS last_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts < p.ts
"""

QUERIES2["asof_purchase_last_view"] = (q_asof_purchase_last_view, SQL_ASOF)


# ---------------------------------------------------------------- range join

def q_range_join_clicks_before_error(sf_dir: str):
    """Range (interval) join: for every 'error' event, count same-user
    'click' events in the strictly-preceding 10-minute window. Per-key
    sorted groups + numpy searchsorted (no all-pairs); the SQL oracle is the
    literal inequality join."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def rj(g: pd.DataFrame) -> pd.DataFrame:
        err = g[g["event_type"] == "error"].sort_values(["ts", "event_id"])
        clk = g[g["event_type"] == "click"].sort_values("ts")
        if len(err) == 0:
            return pd.DataFrame({"error_event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "n_clicks_10m": pd.Series(dtype="int64")})
        cts = clk["ts"].to_numpy()
        ets = err["ts"].to_numpy()
        lo = np.searchsorted(cts, ets - np.timedelta64(10, "m"), side="left")
        hi = np.searchsorted(cts, ets, side="left")   # strict: click.ts < error.ts
        return pd.DataFrame({"error_event_id": err["event_id"].to_numpy(),
                             "user_id": err["user_id"].to_numpy(),
                             "n_clicks_10m": (hi - lo).astype(np.int64)})

    out = ds.groupby("user_id").map_groups(rj, batch_format="pandas")
    return _i64(pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None),
                ["error_event_id", "user_id", "n_clicks_10m"])


SQL_RANGE = """
SELECT e.event_id::BIGINT AS error_event_id, e.user_id::BIGINT AS user_id,
       count(c.event_id)::BIGINT AS n_clicks_10m
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id
 AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts < e.ts
GROUP BY e.event_id, e.user_id
"""

QUERIES2["range_join_clicks_before_error"] = (q_range_join_clicks_before_error, SQL_RANGE)
