"""Twentieth oracle-query batch — Q2/Q9 close out ALL 22 TPC-H plan
families, plus two ops the suite lacked: a one-pass Poisson-bootstrap
confidence interval (resampling statistics over an unbounded stream) and
grouped percent_rank/cume_dist windows without a global sort.

partsupp is absent from the testdata, so Q2/Q9 derive the supply relation
the same way Q16/Q20 did — the DISTINCT (l_partkey, l_suppkey) pairs
actually shipped — and ps_supplycost becomes a deterministic integer
function of the pair, ``cost_c = (pk*1009 + sk*9176) % 100000 + 1``,
replayed verbatim in the oracle SQL (both sides compute the identical
derived column, so the join/argmin/profit PLAN SHAPES stay faithful).

- Q2  min-cost supplier per part in a region: the correlated-min argmin
  decorrelates into ONE distributed groupby-min over an integer-packed
  (cost, suppkey) word — no joinback pass; winners enriched driver-side.
- Q9  product-type profit by (supplier nation, order year): the
  orders⋈lineitem fact-fact edge rides the coded-Bloom core where the
  CODE IS THE ORDER YEAR (the Q8 machinery); part-name filter and the
  supplier→nation map are broadcast dims; only O(nations × years +
  ambiguous) rows ever shuffle.
- bootstrap_mean_value: B=32 Poisson(1) bootstrap replicas of mean order
  value in ONE streaming pass — per-row replica weights derive from a
  mirrored multiplicative hash through the exact Poisson inverse CDF, so
  the full resample set is deterministic and partitioning-invariant;
  only 32 (sum, count) cells ever shuffle. (Poissonization of the
  multinomial bootstrap — the standard trick for resampling a stream
  whose length you don't know; Chamandy et al., "Estimating Uncertainty
  for Massive Data Streams".)
- percent_rank_orders: per-status PERCENT_RANK + CUME_DIST for every row
  with NO global sort — the gini/ntile value-histogram rank
  decomposition: one groupby over O(statuses × distinct cents) cells,
  ranks broadcast back into a stateless labeling pass.

All money exact integer cents (`_cents`), outer sums ::BIGINT in the
oracle, float finalization via identical expressions + round6 half-away
both sides, identical column names both sides.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Min, Sum

from scrapy_ray.pipelines.queries import _cents, _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6

_COST_MOD = 100000
_PACK = 1 << 40          # (cost_c, suppkey) packed word: cost_c * 2^40 + sk
                         # cost_c < 2^17 so the word < 2^57; assumes
                         # suppkey < 2^40 (documented; true at any TPC-H sf)


def _get(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _int_units(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Half-away-from-zero round to int64 (matches DuckDB round())."""
    x = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def _cost_c(pk: np.ndarray, sk: np.ndarray) -> np.ndarray:
    """Deterministic ps_supplycost surrogate in integer cents — replayed
    verbatim in the oracle SQL."""
    return (pk * 1009 + sk * 9176) % _COST_MOD + 1


# ---------------------------------------------------------------------------
# Q2: min-cost supplier per part in a region (correlated min -> packed argmin)
# ---------------------------------------------------------------------------

_Q2_TYPE = "STANDARD"


def q_tpch_q2_like(sf_dir: str):
    """TPC-H Q2 (minimum-cost supplier), adapted: the supply relation is
    the distinct shipped (l_partkey, l_suppkey) pairs and supplycost is
    the deterministic `_cost_c` surrogate (partsupp absent — same
    substitution as Q16/Q20); parts are filtered by p_type (stands in for
    the original size+LIKE '%BRASS' predicate) and suppliers by membership
    in the alphabetically-first region.

    Plan shape: the original's correlated `cost = (SELECT min(cost) ...)`
    decorrelates into ONE distributed groupby-min over the integer word
    cost_c * 2^40 + suppkey — min of the word IS (min cost, then smallest
    suppkey) lexicographically, so the argmin needs no joinback pass.
    Part keys and region-supplier keys are broadcast dims (supplier is
    TPC-H's smallest fact-adjacent table); in-batch pair dedup + per-part
    partial min shrink the shuffle to O(parts) cells; winners-only
    enrichment driver-side."""
    import pyarrow.parquet as pq_

    region = pq_.read_table(os.path.join(sf_dir, "region.parquet"))
    nation = pq_.read_table(os.path.join(sf_dir, "nation.parquet"))
    rk = sorted(zip(region["r_name"].to_pylist(),
                    region["r_regionkey"].to_pylist()))[0][1]
    nat_name = {int(k): n for k, n in zip(nation["n_nationkey"].to_pylist(),
                                          nation["n_name"].to_pylist())}
    reg_nat = {int(k) for k, g in zip(nation["n_nationkey"].to_pylist(),
                                      nation["n_regionkey"].to_pylist())
               if int(g) == int(rk)}

    supp = pq_.read_table(os.path.join(sf_dir, "supplier.parquet"),
                          columns=["s_suppkey", "s_name", "s_nationkey"])
    sk_all = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn_all = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    in_reg = np.isin(sn_all, np.fromiter(reg_nat, np.int64, len(reg_nat)))
    rs_keys = np.sort(sk_all[in_reg])

    part = pq_.read_table(os.path.join(sf_dir, "part.parquet"),
                          columns=["p_partkey", "p_type"])
    pmask = pc.equal(part["p_type"], pa.scalar(_Q2_TYPE)) \
        .to_numpy(zero_copy_only=False)
    pkeys = np.sort(part["p_partkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)[pmask])

    _EMPTY = pd.DataFrame({"p_partkey": pd.Series([], dtype=np.int64),
                           "cost_c": pd.Series([], dtype=np.int64),
                           "s_suppkey": pd.Series([], dtype=np.int64),
                           "s_name": pd.Series([], dtype=object),
                           "n_name": pd.Series([], dtype=object)})
    if len(rs_keys) == 0 or len(pkeys) == 0:
        return _EMPTY
    dims_ref = ray.put((pkeys, rs_keys))

    ds = _pq(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def partial(t: pa.Table) -> pa.Table:
        pk_q, sk_q = _get(dims_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(pk_q, lp)
        keep = (pos < len(pk_q)) & (pk_q[np.minimum(pos, len(pk_q) - 1)] == lp)
        spos = np.searchsorted(sk_q, ls)
        keep &= (spos < len(sk_q)) & (sk_q[np.minimum(spos, len(sk_q) - 1)] == ls)
        if not keep.any():
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "comb": pa.array([], pa.int64())})
        u = np.unique(np.stack([lp[keep], ls[keep]], axis=1), axis=0)
        comb = _cost_c(u[:, 0], u[:, 1]) * _PACK + u[:, 1]
        # per-batch per-part partial min before the shuffle
        order = np.lexsort((comb, u[:, 0]))
        upk, ucomb = u[:, 0][order], comb[order]
        first = np.flatnonzero(np.r_[True, upk[1:] != upk[:-1]])
        return pa.table({"p_partkey": pa.array(upk[first]),
                         "comb": pa.array(ucomb[first])})

    g = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("p_partkey").aggregate(Min("comb", alias_name="comb"))
           .to_pandas())
    if len(g) == 0:
        return _EMPTY
    comb = g["comb"].to_numpy().astype(np.int64)
    win_sk = comb % _PACK
    # winners-only enrichment from the already-loaded supplier dim
    so = np.argsort(sk_all, kind="stable")
    pos = so[np.searchsorted(sk_all[so], win_sk)]
    out = pd.DataFrame({
        "p_partkey": g["p_partkey"].to_numpy().astype(np.int64),
        "cost_c": comb // _PACK,
        "s_suppkey": win_sk,
        "s_name": np.asarray(supp["s_name"].to_pylist(), dtype=object)[pos],
        "n_name": np.asarray([nat_name[int(n)] for n in sn_all[pos]],
                             dtype=object)})
    return out.sort_values("p_partkey").reset_index(drop=True)


SQL_TPCH_Q2 = f"""
WITH rs AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_regionkey = (SELECT r_regionkey FROM region
                       ORDER BY r_name LIMIT 1)),
pairs AS (
  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN rs ON rs.s_suppkey = l_suppkey
  WHERE p_type = '{_Q2_TYPE}'),
best AS (
  SELECT pk, min(((pk * 1009 + sk * 9176) % {_COST_MOD} + 1) * {_PACK} + sk)
             AS comb
  FROM pairs GROUP BY 1)
SELECT pk::BIGINT AS p_partkey,
       (comb // {_PACK})::BIGINT AS cost_c,
       (comb % {_PACK})::BIGINT AS s_suppkey,
       s_name, n_name
FROM best JOIN rs ON rs.s_suppkey = comb % {_PACK}
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year (year-coded Bloom fact edge)
# ---------------------------------------------------------------------------

_Q9_TOKEN = "widget"


def _order_years(sf_dir: str) -> np.ndarray:
    """Order-year domain from the parquet footer min/max statistics — no
    data pass (the coded-Bloom code set must be known up front)."""
    import pyarrow.parquet as pq_

    md = pq_.read_metadata(os.path.join(sf_dir, "orders.parquet"))
    idx = md.schema.to_arrow_schema().get_field_index("o_orderdate")
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:     # stats absent: wide fallback
            return np.arange(1992, 2006, dtype=np.int64)
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return np.arange(lo.year, hi.year + 1, dtype=np.int64)


def q_tpch_q9_like(sf_dir: str):
    """TPC-H Q9 (product-type profit), adapted: profit per lineitem is
    cents(extendedprice * (1 - discount)) - cost_c * round(quantity) with
    the `_cost_c` supplycost surrogate (partsupp absent), for parts whose
    name contains a token, grouped by (supplier nation, order year).

    Plan shape (the faithful part): the orders⋈lineitem edge needed only
    for YEAR rides the coded-Bloom core where the code IS the order year
    (the Q8 machinery) — no fact ever shuffles; part keys and the
    supplier→nation map are broadcast dims; unique Bloom hits aggregate
    per (nation, year) in-batch and the ~fpr multi-hit remainder resolves
    exactly via chunked pruned probes of orders. Only shuffle: a groupby
    over O(nations × years + ambiguous partial) rows."""
    import pyarrow.parquet as pq_

    from scrapy_ray.pipelines.bloomjoin import (build_coded_blooms,
                                                probe_codes, resolve_exact)

    nation = pq_.read_table(os.path.join(sf_dir, "nation.parquet"))
    nat_name = {int(k): n for k, n in zip(nation["n_nationkey"].to_pylist(),
                                          nation["n_name"].to_pylist())}

    supp = pq_.read_table(os.path.join(sf_dir, "supplier.parquet"),
                          columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk, kind="stable")
    supp_ref = ray.put((sk[so], sn[so]))

    part = pq_.read_table(os.path.join(sf_dir, "part.parquet"),
                          columns=["p_partkey", "p_name"])
    pm = pc.match_substring(part["p_name"], pattern=_Q9_TOKEN) \
        .to_numpy(zero_copy_only=False)
    pkeys = np.sort(part["p_partkey"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)[pm])
    _EMPTY = pd.DataFrame({"n_name": pd.Series([], dtype=object),
                           "o_year": pd.Series([], dtype=np.int64),
                           "profit_c": pd.Series([], dtype=np.int64)})
    if len(pkeys) == 0:
        return _EMPTY
    pkeys_ref = ray.put(pkeys)

    years = _order_years(sf_dir)
    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def order_code(t: pa.Table) -> np.ndarray:
        return pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)

    cap = max(1024, _nrows(sf_dir, "orders") // max(1, len(years) - 2))
    blooms_ref = ray.put(build_coded_blooms(orders, "o_orderkey", order_code,
                                            years, cap))

    li = _pq(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                      "l_extendedprice", "l_discount"])

    _EMPTY_P = {"kind": pa.array([], pa.int32()),
                "key": pa.array([], pa.int64()),
                "nat": pa.array([], pa.int64()),
                "profit_c": pa.array([], pa.int64())}

    def li_partial(t: pa.Table) -> pa.Table:
        pk_q = _get(pkeys_ref)
        skk, snn = _get(supp_ref)
        bfs = _get(blooms_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(pk_q, lp)
        keep = (pos < len(pk_q)) & (pk_q[np.minimum(pos, len(pk_q) - 1)] == lp)
        t = t.filter(pa.array(keep))
        if len(t) == 0:
            return pa.table(_EMPTY_P)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = snn[np.searchsorted(skk, ls)]
        rev = _cents(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"]))) \
            .to_numpy(zero_copy_only=False)
        profit = rev - _cost_c(lp, ls) * _int_units(t["l_quantity"])
        one, code, amb = probe_codes(bfs, years, ok)
        frames = []
        if one.any():
            g = pd.DataFrame({"key": code[one], "nat": nat[one],
                              "profit_c": profit[one]}) \
                .groupby(["key", "nat"], sort=False)["profit_c"].sum() \
                .reset_index()
            g.insert(0, "kind", np.int32(0))
            frames.append(g)
        if amb.any():
            g = pd.DataFrame({"key": ok[amb], "nat": nat[amb],
                              "profit_c": profit[amb]}) \
                .groupby(["key", "nat"], sort=False)["profit_c"].sum() \
                .reset_index()
            g.insert(0, "kind", np.int32(1))
            frames.append(g)
        g = pd.concat(frames, ignore_index=True)
        g["key"] = g["key"].astype(np.int64)
        g["nat"] = g["nat"].astype(np.int64)
        g["profit_c"] = g["profit_c"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    agg = (li.map_batches(li_partial, batch_format="pyarrow")
             .groupby(["kind", "key", "nat"])
             .aggregate(Sum("profit_c", alias_name="profit_c")))

    acc: dict[tuple[int, int], int] = {}
    amb_rows: list[tuple[int, int, int]] = []
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        for kind, key, nat, p in zip(
                b["kind"].to_pylist(), b["key"].to_pylist(),
                b["nat"].to_pylist(), b["profit_c"].to_pylist()):
            if kind == 0:
                k = (nat, key)
                acc[k] = acc.get(k, 0) + p
            else:
                amb_rows.append((key, nat, p))

    if amb_rows:
        amb_keys = sorted({k for k, _, _ in amb_rows})
        year_of = resolve_exact(orders, "o_orderkey", order_code, amb_keys)
        for key, nat, p in amb_rows:
            y = year_of.get(key)
            if y is None:       # orderkey absent from orders: inner-join drop
                continue
            k = (nat, y)
            acc[k] = acc.get(k, 0) + p

    if not acc:
        return _EMPTY
    rows = sorted(((nat_name[n], y, p) for (n, y), p in acc.items()),
                  key=lambda r: (r[0], r[1]))
    return pd.DataFrame({"n_name": [r[0] for r in rows],
                         "o_year": np.array([r[1] for r in rows], np.int64),
                         "profit_c": np.array([r[2] for r in rows], np.int64)})


SQL_TPCH_Q9 = f"""
SELECT n_name,
       year(o_orderdate)::BIGINT AS o_year,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           - ((l_partkey * 1009 + l_suppkey * 9176) % {_COST_MOD} + 1)
             * CAST(round(l_quantity) AS BIGINT))::BIGINT AS profit_c
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN part ON p_partkey = l_partkey
WHERE p_name LIKE '%{_Q9_TOKEN}%'
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Poisson bootstrap: B replica means of order value in ONE pass
# ---------------------------------------------------------------------------

_BOOT_B = 32
_BOOT_MOD = 4294967296           # 2^32
_BOOT_MULT = 2654435761          # Knuth multiplicative constant
_BOOT_STEP = 40503               # per-replica offset multiplier
_BOOT_KMAX = 8
# Poisson(1) inverse-CDF thresholds, computed once in float64 and embedded
# in the SQL via repr() (17 sig digits round-trips the exact double)
_BOOT_CDF = np.cumsum([math.exp(-1.0) / math.factorial(k)
                       for k in range(_BOOT_KMAX)])


def q_bootstrap_mean_value(sf_dir: str):
    """One-pass Poisson bootstrap of mean order value: every row gets a
    deterministic Poisson(1) weight per replica b — u = (hash(key, b) +
    0.5) / 2^32 through the exact inverse CDF — which Poissonizes the
    multinomial bootstrap (Chamandy et al.), so B resamples of an
    unbounded stream cost ONE scan and a 32-cell shuffle: per-batch
    partial (sum_c, n) per replica, exact int64 all the way. The replica
    means (round6, identical float expression both sides) are the
    bootstrap distribution; a consumer reads the CI straight off them.
    Deterministic and partitioning-invariant by construction; the hash,
    the CDF constants, and the weight CASE are replayed verbatim in the
    oracle SQL."""
    ds = _pq(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    bs = np.arange(_BOOT_B, dtype=np.uint64)

    def partial(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        h = ((ok % np.uint64(_BOOT_MOD))[:, None] * np.uint64(_BOOT_MULT)
             + (bs + np.uint64(1)) * np.uint64(_BOOT_STEP)) \
            % np.uint64(_BOOT_MOD)
        u = (h.astype(np.float64) + 0.5) / float(_BOOT_MOD)
        w = np.digitize(u.ravel(), _BOOT_CDF).reshape(u.shape) \
            .astype(np.int64)                      # Poisson(1) inverse CDF
        return pa.table({"b": pa.array(bs.astype(np.int64)),
                         "sum_c": pa.array((w * cents[:, None]).sum(axis=0)),
                         "n": pa.array(w.sum(axis=0))})

    g = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("b").aggregate(Sum("sum_c", alias_name="sum_c"),
                                   Sum("n", alias_name="n"))
           .to_pandas().sort_values("b").reset_index(drop=True))
    sum_c = g["sum_c"].to_numpy().astype(np.int64)
    n = g["n"].to_numpy().astype(np.int64)
    mean_v = np.where(n > 0, _round6(sum_c / np.maximum(n, 1) / 100.0), 0.0)
    return pd.DataFrame({"b": g["b"].to_numpy().astype(np.int64),
                         "sum_c": sum_c, "n": n, "mean_v": mean_v})


_BOOT_CASE = " ".join(
    f"WHEN u < {float(c)!r} THEN {k}" for k, c in enumerate(_BOOT_CDF))

SQL_BOOTSTRAP_MEAN = f"""
WITH h0 AS (
  SELECT b,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         (((o_orderkey::UBIGINT % {_BOOT_MOD}) * {_BOOT_MULT}::UBIGINT
           + ((b + 1) * {_BOOT_STEP})::UBIGINT) % {_BOOT_MOD})::DOUBLE
         AS h
  FROM orders CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS b)),
w AS (
  SELECT b, cents,
         CASE {_BOOT_CASE} ELSE {_BOOT_KMAX} END AS wt
  FROM (SELECT b, cents, (h + 0.5) / {_BOOT_MOD} AS u FROM h0)),
agg AS (
  SELECT b, sum(wt * cents)::BIGINT AS sum_c, sum(wt)::BIGINT AS n
  FROM w GROUP BY 1)
SELECT b::BIGINT AS b, sum_c, n,
       CASE WHEN n > 0 THEN round(sum_c / n / 100.0, 6) ELSE 0.0 END AS mean_v
FROM agg ORDER BY b
"""


# ---------------------------------------------------------------------------
# grouped percent_rank / cume_dist without a global sort
# ---------------------------------------------------------------------------


def q_percent_rank_orders(sf_dir: str):
    """PERCENT_RANK and CUME_DIST of every order's value within its status
    group, with NO global sort: one groupby over O(statuses × distinct
    cents) value-histogram cells (the gini/ntile rank decomposition —
    bounded by the price domain, not the row count), exclusive/inclusive
    cumulative counts walked per group driver-side, then a broadcast
    stateless second pass labels every row. percent_rank = count(<v) /
    (n-1) and cume_dist = count(<=v) / n finalize from identical integers
    via the identical float expression both sides."""
    ds = _pq(sf_dir, "orders",
             columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def cells(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "st": np.asarray(t["o_orderstatus"].to_pylist(), dtype=object),
            "total_c": _cents(t["o_totalprice"])
            .to_numpy(zero_copy_only=False)})
        g = df.groupby(["st", "total_c"], sort=False).size() \
            .reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    hist = (ds.map_batches(cells, batch_format="pyarrow")
              .groupby(["st", "total_c"])
              .aggregate(Sum("cnt", alias_name="cnt")).to_pandas())

    lut: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    for st, grp in hist.groupby("st", sort=False):
        grp = grp.sort_values("total_c")
        v = grp["total_c"].to_numpy().astype(np.int64)
        c = grp["cnt"].to_numpy().astype(np.int64)
        n = int(c.sum())
        lt = np.r_[0, np.cumsum(c)[:-1]]           # count strictly below
        le = np.cumsum(c)                          # count <=
        pr = _round6(lt / (n - 1)) if n > 1 else np.zeros(len(v))
        cd = _round6(le / n)
        lut[st] = (v, pr, cd)
    lut_ref = ray.put(lut)

    def label(t: pa.Table) -> pa.Table:
        m = _get(lut_ref)
        st = np.asarray(t["o_orderstatus"].to_pylist(), dtype=object)
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        pr = np.empty(len(st), np.float64)
        cd = np.empty(len(st), np.float64)
        for s in np.unique(st):
            mask = st == s
            v, prs, cds = m[s]
            idx = np.searchsorted(v, cents[mask])
            pr[mask] = prs[idx]
            cd[mask] = cds[idx]
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_orderstatus": t["o_orderstatus"],
            "total_c": pa.array(cents),
            "pr": pa.array(pr), "cd": pa.array(cd)})

    return ds.map_batches(label, batch_format="pyarrow")


SQL_PERCENT_RANK = """
SELECT o_orderkey, o_orderstatus,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_c,
       round(percent_rank() OVER (
           PARTITION BY o_orderstatus
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)), 6) AS pr,
       round(cume_dist() OVER (
           PARTITION BY o_orderstatus
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)), 6) AS cd
FROM orders ORDER BY o_orderkey
"""


QUERIES20: dict[str, tuple] = {
    "tpch_q2_like": (q_tpch_q2_like, SQL_TPCH_Q2),
    "tpch_q9_like": (q_tpch_q9_like, SQL_TPCH_Q9),
    "bootstrap_mean_value": (q_bootstrap_mean_value, SQL_BOOTSTRAP_MEAN),
    "percent_rank_orders": (q_percent_rank_orders, SQL_PERCENT_RANK),
}
