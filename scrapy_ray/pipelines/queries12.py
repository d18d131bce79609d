"""Twelfth oracle-query batch (round 4 tail) —

- column profiling (the data-engineering audit every ingestion runs):
  per-column null counts / min / max / distinct over orders, one pass,
  exact integers;
- correlated scalar subquery shape: orders strictly above their OWN
  customer's average order value — decorrelated into ONE key-co-partitioned
  shuffle where the per-customer aggregate and the filter both run
  (customers scale with the fact table, so nothing broadcasts);
- INTERSECT / EXCEPT set semantics over derived key sets: users with >= 10
  purchases AND >= 10 errors but NOT >= 10 signups — per-type membership
  bits ride one user-co-partitioned shuffle;
- exact R-S similarity join (two-TABLE near-dup, not a self-join): a small
  probe set joined against the full corpus by shingle-Jaccard — probe sets
  broadcast once, length-filtered integer-exact verify per corpus batch,
  zero shuffles (the decontamination shape).

All DuckDB-oracle-checked on the same parquet inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Max, Min, Sum

from scrapy_ray.pipelines.queries import _cents, _pq

_P = 64


# ---------------------------------------------------------------------------
# column profiling
# ---------------------------------------------------------------------------


def q_profile_orders(sf_dir: str):
    """Per-column audit of orders: n_nulls, min, max (stringified for type
    uniformity), n_distinct — ONE distributed pass computing per-batch
    partials for nulls/min/max and in-batch-deduped hash partials for the
    exact distinct counts (the distinct_users_per_type shape per column).
    The profile table is O(columns)."""
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    ds = _pq(sf_dir, "orders", cols)

    def partial(t: pa.Table) -> pa.Table:
        names, nulls, mins, maxs = [], [], [], []
        for c in cols:
            col = t[c]
            names.append(c)
            nulls.append(int(pc.sum(pc.is_null(col)).as_py() or 0))
            # stringify via the SAME rule as the oracle: numeric columns
            # are compared numerically then cast to VARCHAR
            if pa.types.is_floating(col.type):
                v = _cents(col)
                mins.append(str(int(pc.min(v).as_py())))
                maxs.append(str(int(pc.max(v).as_py())))
            elif pa.types.is_integer(col.type):
                mins.append(str(int(pc.min(col).as_py())))
                maxs.append(str(int(pc.max(col).as_py())))
            else:
                mins.append(str(pc.min(col).as_py()))
                maxs.append(str(pc.max(col).as_py()))
        return pa.table({"column": pa.array(names, type=pa.string()),
                         "n_nulls": pa.array(nulls, type=pa.int64()),
                         "vmin": pa.array(mins, type=pa.string()),
                         "vmax": pa.array(maxs, type=pa.string())})

    prof = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("column").aggregate(
                  Sum("n_nulls", alias_name="n_nulls"),
                  Min("vmin", alias_name="vmin"),
                  Max("vmax", alias_name="vmax"))
              .to_pandas())
    # numeric columns need NUMERIC min/max, not lexicographic — recompute
    # the reduce numerically from the per-batch numeric partials
    numeric = {"o_orderkey", "o_custkey", "o_totalprice"}

    def num_partial(t: pa.Table) -> pa.Table:
        names, mins, maxs = [], [], []
        for c in cols:
            if c not in numeric:
                continue
            v = _cents(t[c]) if pa.types.is_floating(t[c].type) else t[c]
            names.append(c)
            mins.append(int(pc.min(v).as_py()))
            maxs.append(int(pc.max(v).as_py()))
        return pa.table({"column": pa.array(names, type=pa.string()),
                         "nmin": pa.array(mins, type=pa.int64()),
                         "nmax": pa.array(maxs, type=pa.int64())})

    nums = (ds.map_batches(num_partial, batch_format="pyarrow")
              .groupby("column").aggregate(Min("nmin", alias_name="nmin"),
                                           Max("nmax", alias_name="nmax"))
              .to_pandas().set_index("column"))

    # exact distinct per column: in-batch dedup -> (column, value-hash)
    # shuffle of O(distinct) cells -> count
    from scrapy_ray.functions.hashing import hash64

    def distinct_partial(t: pa.Table) -> pa.Table:
        names, hs = [], []
        for c in cols:
            if pa.types.is_floating(t[c].type):
                vals = [str(x) for x in
                        np.unique(_cents(t[c]).to_numpy(zero_copy_only=False))]
            else:
                vals = [str(x) for x in set(t[c].to_pylist())]
            names += [c] * len(vals)
            hs += list(hash64(vals).view(np.int64))
        return pa.table({"column": pa.array(names, type=pa.string()),
                         "h": pa.array(np.array(hs, dtype=np.int64))})

    from ray.data.aggregate import Count
    dcnt = (ds.map_batches(distinct_partial, batch_format="pyarrow")
              .groupby(["column", "h"]).aggregate(Count(alias_name="_n"))
              .groupby("column").aggregate(Count(alias_name="n_distinct"))
              .to_pandas().set_index("column"))

    out = prof.set_index("column")
    for c in cols:
        if c in numeric:
            out.loc[c, "vmin"] = str(int(nums.loc[c, "nmin"]))
            out.loc[c, "vmax"] = str(int(nums.loc[c, "nmax"]))
    out["n_distinct"] = dcnt["n_distinct"]
    out = out.reset_index()
    for c in ("n_nulls", "n_distinct"):
        out[c] = out[c].astype(np.int64)
    return (out[["column", "n_nulls", "vmin", "vmax", "n_distinct"]]
            .sort_values("column").reset_index(drop=True))


def _profile_sql() -> str:
    parts = []
    for c, numeric in (("o_orderkey", True), ("o_custkey", True),
                       ("o_orderstatus", False), ("o_totalprice", "cents"),
                       ("o_orderpriority", False)):
        if numeric == "cents":
            expr = f"CAST(round({c}*100) AS BIGINT)"
        elif numeric:
            expr = f"{c}::BIGINT"
        else:
            expr = c
        parts.append(f"""
SELECT '{c}' AS "column",
       COUNT(*) FILTER (WHERE {c} IS NULL)::BIGINT AS n_nulls,
       MIN({expr})::VARCHAR AS vmin, MAX({expr})::VARCHAR AS vmax,
       COUNT(DISTINCT {expr})::BIGINT AS n_distinct
FROM orders""")
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


SQL_PROFILE = _profile_sql()


# ---------------------------------------------------------------------------
# correlated scalar subquery (decorrelated): above own-customer average
# ---------------------------------------------------------------------------


def q_orders_above_customer_avg(sf_dir: str):
    """Orders whose value strictly exceeds their OWN customer's average
    order value — the correlated-subquery shape, decorrelated; the
    predicate is the integer cross-multiplication cents * n > sum (no
    float average exists on either side). Output: per customer, how many
    of their orders beat their average.

    Scale shape: customers scale WITH the fact table, so the per-customer
    aggregate is NOT a broadcastable small side — instead every customer's
    rows land in one salted partition (ONE shuffle of the raw (key, cents)
    pairs) where the aggregate and the filter both run; the driver only
    sees the O(qualifying customers) result."""
    ds = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def rows(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "gkey": pa.array((k % _P).astype(np.int32)),
            "k": pa.array(k),
            "c": _cents(t["o_totalprice"]),
        })

    def above_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k")["c"].agg(["size", "sum"])
        n = df["k"].map(g["size"]).to_numpy()
        s = df["k"].map(g["sum"]).to_numpy()
        m = df["c"].to_numpy() * n > s
        hit = df.loc[m].groupby("k").size().reset_index(name="n_above_avg")
        return hit.rename(columns={"k": "o_custkey"})

    out = (ds.map_batches(rows, batch_format="pyarrow")
             .groupby("gkey").map_groups(above_partition,
                                         batch_format="pandas")
             .to_pandas())
    if "o_custkey" not in out.columns:
        out = pd.DataFrame({"o_custkey": pd.Series(dtype=np.int64),
                            "n_above_avg": pd.Series(dtype=np.int64)})
    for c in ("o_custkey", "n_above_avg"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_custkey").reset_index(drop=True)


SQL_ABOVE_AVG = """
WITH o AS (SELECT o_custkey::BIGINT AS k,
                  CAST(round(o_totalprice*100) AS BIGINT) AS c FROM orders),
m AS (SELECT k, COUNT(*)::BIGINT AS n, SUM(c)::BIGINT AS s FROM o GROUP BY 1)
SELECT o.k AS o_custkey, COUNT(*)::BIGINT AS n_above_avg
FROM o JOIN m ON m.k = o.k
WHERE o.c * m.n > m.s
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# INTERSECT / EXCEPT over derived key sets
# ---------------------------------------------------------------------------


_SO_K = 10


def q_user_set_ops(sf_dir: str):
    """(users with >= 10 purchases INTERSECT users with >= 10 errors)
    EXCEPT users with >= 10 signups — classic set semantics over derived
    key sets (the threshold makes each set selective; every user does
    everything at least once on this testdata). Distributed as exact
    (user, type) counts riding ONE user-co-partitioned shuffle: per-batch
    partials, in-partition count finalize -> threshold -> membership bits
    -> bitwise set algebra, all inside the partition. No user set ever
    assembles off the shuffle."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])
    bits = {"purchase": 1, "error": 2, "signup": 4}

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"u": pc.cast(t["user_id"], pa.int64()),
                       "ty": t["event_type"]}).to_pandas()
        df["bit"] = df["ty"].map(bits).fillna(0).astype(np.int64)
        df = df[df["bit"] > 0]
        g = df.groupby(["u", "bit"]).size().reset_index(name="n")
        g["gkey"] = (g["u"] % _P).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    def set_algebra(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["u", "bit"], as_index=False)["n"].sum()
        g = g[g["n"] >= _SO_K]
        f = g.groupby("u")["bit"].agg(
            lambda s: int(np.bitwise_or.reduce(s.to_numpy()))).reset_index()
        keep = ((f["bit"] & 3) == 3) & ((f["bit"] & 4) == 0)
        return pd.DataFrame({"user_id": f.loc[keep, "u"].astype(np.int64)})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("gkey").map_groups(set_algebra, batch_format="pandas")
             .to_pandas())
    if "user_id" not in out.columns:   # every partition empty
        out = pd.DataFrame({"user_id": pd.Series(dtype=np.int64)})
    out["user_id"] = out["user_id"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


SQL_USER_SET_OPS = f"""
WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
           FROM events GROUP BY 1, 2)
SELECT user_id::BIGINT AS user_id FROM (
  SELECT user_id FROM c WHERE event_type = 'purchase' AND n >= {_SO_K}
  INTERSECT
  SELECT user_id FROM c WHERE event_type = 'error' AND n >= {_SO_K}
  EXCEPT
  SELECT user_id FROM c WHERE event_type = 'signup' AND n >= {_SO_K})
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# R-S MinHash LSH join (two-table near-dup)
# ---------------------------------------------------------------------------

# the probe set: a deterministic slice of documents standing in for an
# external query table (e.g. a benchmark set being decontaminated against
# the corpus); R-S semantics = pairs (probe, corpus) with corpus != probe id
_RS_NQ = 40
_RS_NUM, _RS_DEN = 1, 2


def q_rs_simjoin(sf_dir: str):
    """Two-TABLE EXACT similarity join (R-S, not a self-join): a small
    probe set (doc_id < 40, standing in for a benchmark being
    decontaminated against the corpus) joined against the FULL corpus at
    shingle-Jaccard >= 0.5. The asymmetry is the whole design: the probe
    side's shingle sets are O(probe set) and broadcast once; every corpus
    batch verifies its docs against the length-compatible probes
    integer-exactly, emitting O(matches). One corpus read, ZERO shuffles —
    the decontamination shape (cf. q_benchmark_decontaminate for the
    n-gram-overlap variant). An LSH banding prefilter would trade recall
    for candidate count (q_minhash_lsh_neardup is that path, recall-
    pinned); this query is the exact contract, so the oracle replays it
    directly."""
    import ray

    from scrapy_ray.functions.sketch import shingle_hash_set

    import os as _os

    import pyarrow.parquet as pq_
    pt = pq_.read_table(_os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"],
                        filters=[("doc_id", "<", _RS_NQ)])
    p_ids = pt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    p_sets = [shingle_hash_set(s) for s in pt["text"].to_pylist()]
    p_sizes = np.array([s.size for s in p_sets], dtype=np.int64)
    probe_ref = ray.put((p_ids, p_sets, p_sizes))

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def join_batch(t: pa.Table) -> pa.Table:
        ids_p, sets_p, sz_p = (ray.get(probe_ref)
                               if isinstance(probe_ref, ray.ObjectRef)
                               else probe_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_p, out_c, out_j = [], [], []
        for did, txt in zip(ids, t["text"].to_pylist()):
            B = shingle_hash_set(txt)
            nb = B.size
            if nb == 0:
                continue
            # length filter: J >= num/den forces num*max(|A|,|B|) <=
            # den*min(|A|,|B|) — prunes most probes before any intersect
            lo = np.minimum(sz_p, nb)
            hi = np.maximum(sz_p, nb)
            for pi in np.flatnonzero((_RS_NUM * hi <= _RS_DEN * lo)
                                     & (ids_p != did)):
                A = sets_p[pi]
                k = np.intersect1d(A, B, assume_unique=True).size
                if (_RS_DEN + _RS_NUM) * k < _RS_NUM * (A.size + nb):
                    continue
                out_p.append(int(ids_p[pi]))
                out_c.append(int(did))
                out_j.append(k / (A.size + nb - k))
        j4 = (np.sign(out_j) * np.floor(np.abs(out_j) * 1e4 + 0.5) / 1e4
              if out_j else np.array([], dtype=np.float64))
        return pa.table({"probe_id": pa.array(out_p, type=pa.int64()),
                         "corpus_id": pa.array(out_c, type=pa.int64()),
                         "jaccard": pa.array(np.asarray(j4, dtype=np.float64),
                                             type=pa.float64())})

    out = pa.concat_tables(list(
        ds.map_batches(join_batch, batch_format="pyarrow")
          .iter_batches(batch_size=None, batch_format="pyarrow"))).to_pandas()
    for c in ("probe_id", "corpus_id"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["probe_id", "corpus_id"])
               .reset_index(drop=True))


SQL_RS_JOIN = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, sg FROM (
    SELECT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS sg
    FROM toks, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i) r(i)
    WHERE len(ts) >= 3
    UNION ALL
    SELECT doc_id, array_to_string(ts, ' ') FROM toks
    WHERE len(ts) > 0 AND len(ts) < 3
  )
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_id AS probe_id, c.doc_id AS corpus_id, count(*) AS i
  FROM sh p JOIN sh c ON p.sg = c.sg
  WHERE p.doc_id < {_RS_NQ} AND c.doc_id <> p.doc_id
  GROUP BY 1, 2
)
SELECT probe_id::BIGINT AS probe_id, corpus_id::BIGINT AS corpus_id,
       round(i::DOUBLE / (x.n + y.n - i), 4) AS jaccard
FROM inter JOIN sz x ON x.doc_id = probe_id JOIN sz y ON y.doc_id = corpus_id
WHERE {_RS_DEN + _RS_NUM} * i >= {_RS_NUM} * (x.n + y.n)
ORDER BY probe_id, corpus_id
"""


QUERIES12: dict[str, tuple] = {
    "profile_orders": (q_profile_orders, SQL_PROFILE),
    "orders_above_customer_avg": (q_orders_above_customer_avg, SQL_ABOVE_AVG),
    "user_set_ops": (q_user_set_ops, SQL_USER_SET_OPS),
    "rs_simjoin": (q_rs_simjoin, SQL_RS_JOIN),
}
