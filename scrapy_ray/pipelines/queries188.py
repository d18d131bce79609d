"""One-hundred-eighty-eighth oracle-query batch — data-profiling /
dependency-discovery audits (the TANE/metadata family every catalog
tool runs), all exact distinct-count arithmetic:

- fd_mining_orders: single-attribute functional dependencies A → B
  over five derived orders attributes (status, priority, month,
  price kilo-bucket, custkey%100) — A → B holds iff
  #distinct(A) = #distinct(A,B); reports every ordered pair with
  its distinct counts and holds flag (the |X| = 1 level of TANE).
- fk_integrity_audit: referential-integrity orphan counts for the
  three schema relationships (orders→customer, lineitem→orders,
  lineitem→part) — distinct child keys, orphan keys (anti-join),
  and orphan child ROWS per relationship.
- key_discovery_lineitem: candidate-key discovery on lineitem —
  uniqueness audits of (l_orderkey), (l_orderkey, l_linenumber),
  (l_partkey, l_suppkey), (l_orderkey, l_partkey) via exact
  distinct-vs-row counts and the max duplication factor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq, _nrows
from scrapy_ray.pipelines.queries47 import _strip


# ---------------------------------------------------------------------------
# Functional dependency mining
# ---------------------------------------------------------------------------

_FD_ATTRS = ("status", "prio", "mon", "kb", "ck")


def q_fd_mining_orders(sf_dir: str):
    """Level-1 TANE over derived orders attributes (docstring)."""
    ds = _pq(sf_dir, "orders",
             columns=["o_orderstatus", "o_orderpriority",
                      "o_orderdate", "o_totalprice", "o_custkey"])

    def derive(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({
            "status": t["o_orderstatus"].to_pylist(),
            "prio": t["o_orderpriority"].to_pylist(),
            "mon": (pc.month(t["o_orderdate"])
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)),
            "kb": np.sign(c) * (np.abs(c) // 10_000_000),
            "ck": (t["o_custkey"].to_numpy(zero_copy_only=False)
                   .astype(np.int64) % 100),
            "one": np.int64(1)})
        g = g.groupby(list(_FD_ATTRS), sort=False).sum() \
            .reset_index()
        g["one"] = g["one"].astype(np.int64)
        for col in ("mon", "kb", "ck"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(derive, batch_format="pyarrow")
               .groupby(list(_FD_ATTRS))
               .aggregate(Sum("one", alias_name="n"))
               .to_pandas())
    rows = []
    for a in _FD_ATTRS:
        na = cells.groupby(a).ngroups
        for b in _FD_ATTRS:
            if a == b:
                continue
            nab = cells.groupby([a, b]).ngroups
            rows.append({"lhs": a, "rhs": b,
                         "n_lhs": na, "n_pair": nab,
                         "holds": 1 if na == nab else 0})
    out = pd.DataFrame(rows).sort_values(["lhs", "rhs"]) \
        .reset_index(drop=True)
    for col in ("n_lhs", "n_pair", "holds"):
        out[col] = out[col].astype(np.int64)
    return out


_FD_EXPR = {
    "status": "o_orderstatus",
    "prio": "o_orderpriority",
    "mon": "month(o_orderdate)",
    "kb": ("CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)"
           " >= 0 THEN CAST(round(o_totalprice * 100) AS BIGINT)"
           " // 10000000 ELSE"
           " -((-CAST(round(o_totalprice * 100) AS BIGINT))"
           " // 10000000) END"),
    "ck": "o_custkey % 100",
}

_FD_PAIRS = " UNION ALL ".join(
    f"""SELECT '{a}' AS lhs, '{b}' AS rhs,
  (SELECT count(DISTINCT {_FD_EXPR[a]}) FROM orders)::BIGINT
    AS n_lhs,
  (SELECT count(*) FROM (SELECT DISTINCT {_FD_EXPR[a]},
                                {_FD_EXPR[b]} FROM orders))::BIGINT
    AS n_pair"""
    for a in _FD_ATTRS for b in _FD_ATTRS if a != b)

SQL_FD = f"""
WITH pairs AS ({_FD_PAIRS})
SELECT lhs, rhs, n_lhs, n_pair,
       (CASE WHEN n_lhs = n_pair THEN 1 ELSE 0 END)::BIGINT
         AS holds
FROM pairs ORDER BY lhs, rhs
"""


# ---------------------------------------------------------------------------
# FK integrity audit
# ---------------------------------------------------------------------------


def q_fk_integrity_audit(sf_dir: str):
    """Orphan counts for the three FK relationships (docstring)."""
    rows = []

    def audit(name: str, child_tbl: str, child_col: str,
              parent_tbl: str, parent_col: str):
        import os
        import pyarrow.parquet as pq_

        # parent side is the SMALL side — one driver column read,
        # broadcast into the salted partitions (a global Ray
        # groupby over child keys measured 18 s vs ~2 s salted)
        parents = np.unique(
            pq_.read_table(
                os.path.join(sf_dir, f"{parent_tbl}.parquet"),
                columns=[parent_col])
            .column(0).to_numpy(zero_copy_only=False)
            .astype(np.int64))
        cds = _pq(sf_dir, child_tbl, columns=[child_col])

        def ckeys(t: pa.Table) -> pa.Table:
            k = t[child_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            g = pd.DataFrame({"k": k, "n": np.int64(1)}) \
                .groupby("k", sort=False).sum().reset_index()
            g["n"] = g["n"].astype(np.int64)
            g["pk"] = g["k"].to_numpy(np.int64) % 64
            return _strip(g)

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("k", sort=False)["n"].sum() \
                .reset_index()
            orph = ~np.isin(g["k"].to_numpy(np.int64), parents)
            return _strip(pd.DataFrame({
                "nk": [np.int64(len(g))],
                "nok": [np.int64(int(orph.sum()))],
                "nor": [np.int64(int(
                    g["n"].to_numpy(np.int64)[orph].sum()))]}))

        part = (cds.map_batches(ckeys, batch_format="pyarrow")
                   .groupby("pk")
                   .map_groups(merge, batch_format="pandas")
                   .to_pandas())
        rows.append({
            "rel": name,
            "n_child_keys": int(part["nk"].sum()),
            "n_orphan_keys": int(part["nok"].sum()),
            "n_orphan_rows": int(part["nor"].sum())})

    audit("lineitem_orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey")
    audit("lineitem_part", "lineitem", "l_partkey",
          "part", "p_partkey")
    audit("orders_customer", "orders", "o_custkey",
          "customer", "c_custkey")
    out = pd.DataFrame(rows).sort_values("rel") \
        .reset_index(drop=True)
    for col in ("n_child_keys", "n_orphan_keys", "n_orphan_rows"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_FK = """
WITH a1 AS (
  SELECT 'lineitem_orders' AS rel,
         (SELECT count(DISTINCT l_orderkey)
          FROM lineitem)::BIGINT AS n_child_keys,
         (SELECT count(*) FROM (
            SELECT DISTINCT l_orderkey FROM lineitem) c
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = c.l_orderkey))
           ::BIGINT AS n_orphan_keys,
         (SELECT count(*) FROM lineitem c
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = c.l_orderkey))
           ::BIGINT AS n_orphan_rows),
a2 AS (
  SELECT 'lineitem_part',
         (SELECT count(DISTINCT l_partkey) FROM lineitem)::BIGINT,
         (SELECT count(*) FROM (
            SELECT DISTINCT l_partkey FROM lineitem) c
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = c.l_partkey))
           ::BIGINT,
         (SELECT count(*) FROM lineitem c
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = c.l_partkey))
           ::BIGINT),
a3 AS (
  SELECT 'orders_customer',
         (SELECT count(DISTINCT o_custkey) FROM orders)::BIGINT,
         (SELECT count(*) FROM (
            SELECT DISTINCT o_custkey FROM orders) c
          WHERE NOT EXISTS (SELECT 1 FROM customer k
                            WHERE k.c_custkey = c.o_custkey))
           ::BIGINT,
         (SELECT count(*) FROM orders c
          WHERE NOT EXISTS (SELECT 1 FROM customer k
                            WHERE k.c_custkey = c.o_custkey))
           ::BIGINT)
SELECT * FROM a1 UNION ALL SELECT * FROM a2
UNION ALL SELECT * FROM a3
ORDER BY rel
"""


# ---------------------------------------------------------------------------
# Candidate key discovery
# ---------------------------------------------------------------------------


def q_key_discovery_lineitem(sf_dir: str):
    """Uniqueness audits of candidate lineitem keys (docstring)."""
    n = _nrows(sf_dir, "lineitem")
    ds = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_suppkey",
                      "l_linenumber"])

    cands = {
        "ok": ("l_orderkey",),
        "ok_ln": ("l_orderkey", "l_linenumber"),
        "pk_sk": ("l_partkey", "l_suppkey"),
        "ok_pk": ("l_orderkey", "l_partkey"),
    }

    def counts(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"]
            .to_numpy(zero_copy_only=False).astype(np.int64),
            "l_partkey": t["l_partkey"]
            .to_numpy(zero_copy_only=False).astype(np.int64),
            "l_suppkey": t["l_suppkey"]
            .to_numpy(zero_copy_only=False).astype(np.int64),
            "l_linenumber": t["l_linenumber"]
            .to_numpy(zero_copy_only=False).astype(np.int64)})
        # distinct counts are not mergeable from per-batch scalars —
        # emit per-batch grouped INTEGER composite keys (a<<32|b is
        # injective at these key ranges; string keys cost 20x)
        out = []
        for name, cols in cands.items():
            if len(cols) == 1:
                key = df[cols[0]].to_numpy(np.int64)
            else:
                key = (df[cols[0]].to_numpy(np.int64) << 32) \
                    | df[cols[1]].to_numpy(np.int64)
            g = (pd.DataFrame({"key": key, "n": np.int64(1)})
                 .groupby("key", sort=False).sum().reset_index())
            g["n"] = g["n"].astype(np.int64)
            g.insert(0, "cand", name)
            out.append(g)
        cells = pd.concat(out, ignore_index=True)
        cells["pk"] = cells["key"].to_numpy(np.int64) % 64
        return _strip(cells)

    from ray.data.aggregate import Max

    def merge_partition(df: pd.DataFrame) -> pd.DataFrame:
        # same key → same pk partition, so merging (cand, key)
        # inside the salted partition is exact; a global Ray
        # groupby over the ~4x|rows| tiny cells measured 24 s vs
        # ~2 s for 64 salted pandas merges (the CLAUDE salting rule)
        g = (df.groupby(["cand", "key"], sort=False)["n"].sum()
             .reset_index()
             .groupby("cand", sort=False)["n"]
             .agg(nd="size", mx="max").reset_index())
        for col in ("nd", "mx"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(counts, batch_format="pyarrow")
             .groupby("pk")
             .map_groups(merge_partition, batch_format="pandas")
             .groupby("cand")
             .aggregate(Sum("nd", alias_name="nd"),
                        Max("mx", alias_name="mx"))
             .to_pandas())
    rows = []
    for _, r in agg.iterrows():
        nd = int(r["nd"])
        rows.append({"cand": r["cand"], "n_rows": n,
                     "n_distinct": nd,
                     "max_dup": int(r["mx"]),
                     "is_key": 1 if nd == n else 0})
    out = pd.DataFrame(rows).sort_values("cand") \
        .reset_index(drop=True)
    for col in ("n_rows", "n_distinct", "max_dup", "is_key"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KEYS = """
WITH c1 AS (
  SELECT 'ok' AS cand, count(*)::BIGINT AS n_rows,
         count(DISTINCT l_orderkey)::BIGINT AS n_distinct,
         (SELECT max(c) FROM (SELECT count(*) AS c FROM lineitem
                              GROUP BY l_orderkey))::BIGINT
           AS max_dup
  FROM lineitem),
c2 AS (
  SELECT 'ok_ln', count(*)::BIGINT,
         (SELECT count(*) FROM (SELECT DISTINCT l_orderkey,
            l_linenumber FROM lineitem))::BIGINT,
         (SELECT max(c) FROM (SELECT count(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber))::BIGINT
  FROM lineitem),
c3 AS (
  SELECT 'pk_sk', count(*)::BIGINT,
         (SELECT count(*) FROM (SELECT DISTINCT l_partkey,
            l_suppkey FROM lineitem))::BIGINT,
         (SELECT max(c) FROM (SELECT count(*) AS c FROM lineitem
            GROUP BY l_partkey, l_suppkey))::BIGINT
  FROM lineitem),
c4 AS (
  SELECT 'ok_pk', count(*)::BIGINT,
         (SELECT count(*) FROM (SELECT DISTINCT l_orderkey,
            l_partkey FROM lineitem))::BIGINT,
         (SELECT max(c) FROM (SELECT count(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_partkey))::BIGINT
  FROM lineitem),
u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
      UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4)
SELECT cand, n_rows, n_distinct, max_dup,
       (CASE WHEN n_distinct = n_rows THEN 1 ELSE 0 END)::BIGINT
         AS is_key
FROM u ORDER BY cand
"""


QUERIES188: dict[str, tuple] = {
    "fd_mining_orders": (q_fd_mining_orders, SQL_FD),
    "fk_integrity_audit": (q_fk_integrity_audit, SQL_FK),
    "key_discovery_lineitem": (q_key_discovery_lineitem, SQL_KEYS),
}
