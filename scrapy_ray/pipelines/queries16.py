"""Sixteenth oracle-query batch (round 4) — the GROUPED generalization of
queries14's exact percentile_cont rank-selection:

- per-group interpolated percentiles (p50/p90) of order value by order
  priority, exact, with NO global or per-group sort: one tiny
  (group, min, max, n) aggregate, one mergeable (group, bucket) histogram
  whose payload is bounded by groups x 4096 regardless of row count, and
  one pruned gather of the few (group, value) cells that bracket each
  group's target ranks. The per-group interpolation is carried as exact
  integer centi-cents exactly like the ungrouped query — no float compare.

DuckDB-oracle-checked on the same parquet inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents_np, _pq

_GQ100 = (50, 90)
_NB = 4096


def q_grouped_percentile_cont(sf_dir: str):
    """percentile_cont(0.50/0.90) of o_totalprice per o_orderpriority —
    grouped exact rank-selection (see queries14.q_percentile_cont_price
    for the ungrouped derivation; here every driver-side structure is
    bounded by n_groups x 4096 histogram cells + the gathered bracketing
    cells, never by row count)."""
    ds = _pq(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def mm(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t["o_orderpriority"].to_pandas(),
            "c": _cents_np(t["o_totalprice"].to_numpy(zero_copy_only=False)),
        })
        a = df.groupby("g")["c"].agg(["min", "max", "size"]).reset_index()
        return pa.Table.from_pandas(
            a.rename(columns={"min": "lo", "max": "hi", "size": "n"}),
            preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    meta = (parts.groupby("g")
                 .agg(lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum")))
    glo = meta["lo"].to_dict()
    gwidth = {g: max(1, (int(r["hi"]) - int(r["lo"]) + _NB) // _NB)
              for g, r in meta.iterrows()}

    def hist(t: pa.Table) -> pa.Table:
        gs = t["o_orderpriority"].to_pandas().to_numpy()
        c = _cents_np(t["o_totalprice"].to_numpy(zero_copy_only=False))
        outs = []
        for g in np.unique(gs):
            m = gs == g
            b = (c[m] - glo[g]) // gwidth[g]
            cnt = np.bincount(b, minlength=1)
            nz = np.flatnonzero(cnt)
            outs.append(pd.DataFrame({"g": g, "bucket": nz.astype(np.int64),
                                      "cnt": cnt[nz].astype(np.int64)}))
        return pa.Table.from_pandas(pd.concat(outs), preserve_index=False) \
                       .replace_schema_metadata(None)

    hdf = (ds.map_batches(hist, batch_format="pyarrow")
             .groupby(["g", "bucket"]).aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())

    # per group: locate the bucket of every needed rank (k and k+1 per q)
    need: dict[str, set[int]] = {}          # group -> needed bucket ids
    plan: dict[str, list[tuple[int, int, int]]] = {}  # g -> [(q, k, m)]
    cums: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for g, sub in hdf.groupby("g"):
        sub = sub.sort_values("bucket")
        buckets = sub["bucket"].to_numpy()
        cum = np.concatenate([[0], np.cumsum(sub["cnt"].to_numpy())])
        cums[g] = (buckets, cum)
        n = int(cum[-1])
        need[g] = set()
        plan[g] = []
        for q in _GQ100:
            k, m = divmod(q * (n - 1), 100)
            plan[g].append((q, k, m))
            for r in (k, min(k + 1, n - 1)):
                need[g].add(int(buckets[
                    np.searchsorted(cum, r, side="right") - 1]))
    need_l = {g: np.array(sorted(b), dtype=np.int64) for g, b in need.items()}

    def gather(t: pa.Table) -> pa.Table:
        gs = t["o_orderpriority"].to_pandas().to_numpy()
        c = _cents_np(t["o_totalprice"].to_numpy(zero_copy_only=False))
        outs = []
        for g in np.unique(gs):
            m = gs == g
            cm = c[m]
            keep = np.isin((cm - glo[g]) // gwidth[g], need_l[g])
            v, cnt = np.unique(cm[keep], return_counts=True)
            outs.append(pd.DataFrame({"g": g, "v": v.astype(np.int64),
                                      "cnt": cnt.astype(np.int64)}))
        return pa.Table.from_pandas(pd.concat(outs), preserve_index=False) \
                       .replace_schema_metadata(None)

    vdf = (ds.map_batches(gather, batch_format="pyarrow")
             .groupby(["g", "v"]).aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())

    rows = []
    for g, sub in vdf.groupby("g"):
        sub = sub.sort_values("v")
        vals = sub["v"].to_numpy()
        vcnt = sub["cnt"].to_numpy()
        buckets, cum = cums[g]

        def value_at(rank: int) -> int:
            i = int(np.searchsorted(cum, rank, side="right") - 1)
            b_lo = glo[g] + int(buckets[i]) * gwidth[g]
            in_b = (vals >= b_lo) & (vals < b_lo + gwidth[g])
            lc = np.cumsum(vcnt[in_b])
            return int(vals[in_b][
                np.searchsorted(lc, rank - int(cum[i]), side="right")])

        n = int(cum[-1])
        for q, k, m in plan[g]:
            vk = value_at(k)
            vk1 = value_at(min(k + 1, n - 1))
            rows.append((g, q, vk * (100 - m) + vk1 * m))
    df = pd.DataFrame(rows, columns=["priority", "q100", "interp_centicents"])
    for c in ("q100", "interp_centicents"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values(["priority", "q100"]).reset_index(drop=True)


SQL_GROUPED_PERCENTILE_CONT = """
WITH v AS (SELECT o_orderpriority AS priority,
                  CAST(round(o_totalprice*100) AS BIGINT) AS c FROM orders),
s AS (SELECT priority, c,
             ROW_NUMBER() OVER (PARTITION BY priority ORDER BY c) - 1 AS rk
      FROM v),
n AS (SELECT priority, COUNT(*)::BIGINT AS n FROM v GROUP BY priority),
p(q100) AS (VALUES (50), (90)),
k AS (SELECT n.priority, p.q100::BIGINT AS q100,
             (p.q100*(n.n-1))//100 AS k, (p.q100*(n.n-1))%100 AS m, n.n AS n
      FROM p, n)
SELECT k.priority AS priority, k.q100 AS q100,
       (lo.c*(100-k.m) + hi.c*k.m)::BIGINT AS interp_centicents
FROM k
JOIN s lo ON lo.priority = k.priority AND lo.rk = k.k
JOIN s hi ON hi.priority = k.priority
         AND hi.rk = CASE WHEN k.k + 1 > k.n - 1 THEN k.n - 1 ELSE k.k + 1 END
ORDER BY priority, q100
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier(s) by windowed revenue, ties kept
# ---------------------------------------------------------------------------

_Q15_LO = pd.Timestamp("1996-01-01")
_Q15_HI = pd.Timestamp("1996-04-01")


def q_tpch_q15_like(sf_dir: str):
    """TPC-H Q15 shape (top_supplier view): per-supplier revenue over a
    3-month shipdate window, then the supplier(s) achieving the GLOBAL
    max (ties kept — the aggregate-of-aggregate scalar + tie filter).
    Shape: in-batch combiner (per-batch per-supplier partial sums) ->
    groupby(suppkey).sum — the shuffled payload is O(suppliers per batch),
    never O(lineitem rows); the max and tie filter touch only the
    O(suppliers) aggregate; winner names come from a broadcast-probed
    pruned supplier read. Revenue is exact integer cents with the
    identical per-row quantization expression both sides."""
    import pyarrow.compute as pc

    ds = _pq(sf_dir, "lineitem",
             ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(_Q15_LO)),
                    pc.less(t["l_shipdate"], pa.scalar(_Q15_HI)))
        t = t.filter(m)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "s_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
            "r": _cents_np(price * (1.0 - disc)),
        })
        g = df.groupby("s_suppkey")["r"].sum().rename("r").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    rev = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("s_suppkey").aggregate(Sum("r", alias_name="total_cents"))
             .to_pandas())   # O(suppliers) — the dimension cardinality
    best = int(rev["total_cents"].max())
    win = rev[rev["total_cents"] == best]
    win_keys = set(int(k) for k in win["s_suppkey"])

    sup = _pq(sf_dir, "supplier", ["s_suppkey", "s_name"])

    def probe(t: pa.Table) -> pa.Table:
        keep = np.isin(t["s_suppkey"].to_numpy(zero_copy_only=False),
                       list(win_keys))
        return t.filter(pa.array(keep))

    names = sup.map_batches(probe, batch_format="pyarrow").to_pandas()
    out = names.merge(win, on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["total_cents"] = out["total_cents"].astype(np.int64)
    return (out[["s_suppkey", "s_name", "total_cents"]]
            .sort_values("s_suppkey").reset_index(drop=True))


SQL_TPCH_Q15 = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
            )::BIGINT AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey::BIGINT AS s_suppkey, s.s_name, r.total_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.total_cents = (SELECT MAX(total_cents) FROM rev)
ORDER BY s_suppkey
"""


QUERIES16: dict[str, tuple] = {
    "grouped_percentile_cont": (q_grouped_percentile_cont,
                                SQL_GROUPED_PERCENTILE_CONT),
    "tpch_q15_like": (q_tpch_q15_like, SQL_TPCH_Q15),
}
