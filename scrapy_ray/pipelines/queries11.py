"""Eleventh oracle-query batch (round 4): classic decision-support shapes
the suite didn't cover yet, each in its scale-honest distributed form —

- TPC-H Q4 shape: EXISTS semi-join (orders with >=1 qualifying lineitem)
  counted by priority — co-partitioned semi-join, partial counts, no
  key-set ever assembles on the driver;
- TPC-H Q18 shape: large-volume orders (grouped HAVING over the fact)
  joined back to dimensions — the filtered key set is the SMALL side by
  construction, so the join-back is two pruned broadcast probes;
- TPC-H Q22 shape: a global scalar subquery (above-average balance,
  integer cross-multiplied so no float threshold exists on either side)
  composed with a left count-join ("at most K orders") and a grouped sum;
- UNPIVOT / melt (the inverse of q_event_type_pivot): zero-shuffle
  vectorized column->row explosion;
- per-group z-score standardization (the feature-normalization primitive):
  exact integer moments ride one tiny shuffle, identical float expression
  finalizes on both sides;
- ordered per-user behavior signature (string_agg ORDER BY): one
  user-co-partitioned pass builds signatures, a tiny groupby counts them;
- equi-width value histogram (bin = cents // width): in-batch partial
  counts -> one O(bins) shuffle.

All DuckDB-oracle-checked on the same parquet inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _i64, _pq
from scrapy_ray.pipelines.queries8 import _round6

_P = 64


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi-join counted by priority
# ---------------------------------------------------------------------------

_Q4_DISC = 0.09


def q_exists_discounted_orders(sf_dir: str):
    """Orders having >=1 lineitem with l_discount > 0.09, counted per
    o_orderpriority (the Q4 EXISTS shape). Distributed semi-join without a
    driver key set: both sides emit (orderkey % P)-salted rows (lineitem
    side pre-deduped per batch), ONE groupby co-locates them, and each
    partition emits tiny per-priority partial counts; the driver sums
    O(priorities) cells."""
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_discount"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def li_keys(t: pa.Table) -> pa.Table:
        k = t.filter(pc.greater(t["l_discount"], _Q4_DISC))["l_orderkey"]
        ks = np.unique(k.to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({
            "gkey": pa.array((ks % _P).astype(np.int32)),
            "okey": pa.array(ks),
            "prio": pa.array([""] * len(ks), type=pa.string()),
            "side": pa.array(np.zeros(len(ks), dtype=np.int8)),
        })

    def o_rows(t: pa.Table) -> pa.Table:
        ks = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "gkey": pa.array((ks % _P).astype(np.int32)),
            "okey": pa.array(ks),
            "prio": pc.cast(t["o_orderpriority"], pa.string()),
            "side": pa.array(np.ones(len(ks), dtype=np.int8)),
        })

    both = li.map_batches(li_keys, batch_format="pyarrow").union(
        orders.map_batches(o_rows, batch_format="pyarrow"))

    def semi_partition(g: pd.DataFrame) -> pd.DataFrame:
        have = pd.unique(g.loc[g["side"] == 0, "okey"])
        o = g.loc[g["side"] == 1]
        hit = o.loc[o["okey"].isin(have)]
        out = hit.groupby("prio").size().reset_index(name="n")
        return out

    part = (both.groupby("gkey")
                .map_groups(semi_partition, batch_format="pandas")
                .groupby("prio").aggregate(Sum("n", alias_name="n_orders")))
    out = part.to_pandas().rename(columns={"prio": "o_orderpriority"})
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_EXISTS_DISCOUNTED = f"""
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > {_Q4_DISC})
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders joined back to dimensions
# ---------------------------------------------------------------------------

_Q18_MINQTY = 300


def q_large_volume_orders(sf_dir: str):
    """Orders whose total lineitem quantity exceeds 300, with customer name
    (the Q18 HAVING-then-join-back shape). The grouped HAVING makes the
    surviving key set SMALL by construction, so the join-back is two
    broadcast probes (orders, then customer) — never a fact-fact shuffle.
    Quantities are integer-valued; exact int64 sums both sides."""
    import ray

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"o": t["l_orderkey"],
                       "q": pc.cast(pc.round(t["l_quantity"]), pa.int64())}
                      ).to_pandas()
        g = df.groupby("o", as_index=False)["q"].sum()
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    def having(t: pa.Table) -> pa.Table:   # distributed HAVING — only the
        return t.filter(pc.greater(t["sum_qty"], _Q18_MINQTY))  # tiny
        # surviving key set ever reaches the driver

    big = (li.map_batches(qty_partial, batch_format="pyarrow")
             .groupby("o").aggregate(Sum("q", alias_name="sum_qty"))
             .map_batches(having, batch_format="pyarrow")
             .to_pandas())
    okeys = ray.put(np.sort(big["o"].to_numpy(dtype=np.int64)))

    def probe_orders(t: pa.Table) -> pa.Table:
        ks = ray.get(okeys) if isinstance(okeys, ray.ObjectRef) else okeys
        col = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = t.filter(pa.array(np.isin(col, ks)))   # vectorized probe
        return pa.table({"o_orderkey": pc.cast(hit["o_orderkey"], pa.int64()),
                         "o_custkey": pc.cast(hit["o_custkey"], pa.int64())})

    om = (_pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])
          .map_batches(probe_orders, batch_format="pyarrow").to_pandas())
    ckeys = ray.put(np.sort(om["o_custkey"].to_numpy(dtype=np.int64)))

    def probe_cust(t: pa.Table) -> pa.Table:
        ks = ray.get(ckeys) if isinstance(ckeys, ray.ObjectRef) else ckeys
        col = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = t.filter(pa.array(np.isin(col, ks)))
        return pa.table({"c_custkey": pc.cast(hit["c_custkey"], pa.int64()),
                         "c_name": pc.cast(hit["c_name"], pa.string())})

    cm = (_pq(sf_dir, "customer", ["c_custkey", "c_name"])
          .map_batches(probe_cust, batch_format="pyarrow").to_pandas())
    out = (big.rename(columns={"o": "o_orderkey"})
              .merge(om, on="o_orderkey").merge(cm, left_on="o_custkey",
                                                right_on="c_custkey"))
    out = out[["c_name", "o_orderkey", "sum_qty"]]
    for c in ("o_orderkey", "sum_qty"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["sum_qty", "o_orderkey"],
                            ascending=[False, True])
               .reset_index(drop=True))


SQL_LARGE_VOLUME = f"""
WITH q AS (
  SELECT l_orderkey, SUM(CAST(round(l_quantity) AS BIGINT)) AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > {_Q18_MINQTY})
SELECT c.c_name, o.o_orderkey::BIGINT AS o_orderkey, q.sum_qty::BIGINT AS sum_qty
FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY sum_qty DESC, o_orderkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: global scalar subquery + left count-join + grouped sum
# ---------------------------------------------------------------------------

_Q22_MAX_ORDERS = 5


def q_rich_inactive_customers(sf_dir: str):
    """Customers with above-average positive balance and fewer than 5
    orders, summed per market segment (the Q22 shape). The global average
    is never a float: both sides test cents * n_pos > sum_cents (integer
    cross-multiplication). The per-customer order count rides a
    (custkey % P)-salted co-partition with the customer rows — no
    customer key set on the driver; the driver sums O(segments) cells."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])
    orders = _pq(sf_dir, "orders", ["o_custkey"])

    # pass 1: exact global scalars over positive balances (tiny aggregate)
    def bal_partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"]).to_numpy(zero_copy_only=False)
        pos = cents[cents > 0]
        return pa.table({"n": pa.array([len(pos)], type=pa.int64()),
                         "s": pa.array([int(pos.sum())], type=pa.int64())})

    tot = (cust.map_batches(bal_partial, batch_format="pyarrow")
               .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s")))
    n_pos, s_cents = int(tot["n"]), int(tot["s"])

    # pass 2: co-partition order counts with customer rows
    def o_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"k": pc.cast(t["o_custkey"], pa.int64())}).to_pandas()
        g = df.groupby("k").size().reset_index(name="cnt")
        ks = g["k"].to_numpy()
        return pa.table({
            "gkey": pa.array((ks % _P).astype(np.int32)),
            "k": pa.array(ks, type=pa.int64()),
            "cnt": pa.array(g["cnt"].to_numpy(), type=pa.int64()),
            "seg": pa.array([""] * len(g), type=pa.string()),
            "cents": pa.array(np.zeros(len(g), dtype=np.int64)),
            "side": pa.array(np.zeros(len(g), dtype=np.int8)),
        })

    def c_rows(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"]).to_numpy(zero_copy_only=False)
        ks = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # the global-average predicate, integer-exact
        m = (cents > 0) & (cents * n_pos > s_cents)
        ks, cents = ks[m], cents[m]
        segs = [s for s, keep in zip(t["c_mktsegment"].to_pylist(), m) if keep]
        return pa.table({
            "gkey": pa.array((ks % _P).astype(np.int32)),
            "k": pa.array(ks, type=pa.int64()),
            "cnt": pa.array(np.zeros(len(ks), dtype=np.int64)),
            "seg": pa.array(segs, type=pa.string()),
            "cents": pa.array(cents, type=pa.int64()),
            "side": pa.array(np.ones(len(ks), dtype=np.int8)),
        })

    both = orders.map_batches(o_partial, batch_format="pyarrow").union(
        cust.map_batches(c_rows, batch_format="pyarrow"))

    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        cnts = (g.loc[g["side"] == 0].groupby("k")["cnt"].sum())
        c = g.loc[g["side"] == 1]
        nord = c["k"].map(cnts).fillna(0).astype(np.int64)
        keep = c.loc[(nord < _Q22_MAX_ORDERS).to_numpy()]
        out = keep.groupby("seg").agg(n_cust=("k", "size"),
                                      bal_cents=("cents", "sum")).reset_index()
        return out

    part = (both.groupby("gkey")
                .map_groups(join_partition, batch_format="pandas")
                .groupby("seg").aggregate(Sum("n_cust", alias_name="n_cust"),
                                          Sum("bal_cents", alias_name="bal_cents")))
    out = part.to_pandas().rename(columns={"seg": "c_mktsegment"})
    for c in ("n_cust", "bal_cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


SQL_RICH_INACTIVE = f"""
WITH pos AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal*100) AS BIGINT) AS cents
  FROM customer WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0),
tot AS (SELECT COUNT(*) AS n, SUM(cents) AS s FROM pos),
cnt AS (SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY 1),
j AS (SELECT p.*, COALESCE(cnt.c, 0) AS nord
      FROM pos p LEFT JOIN cnt ON cnt.o_custkey = p.c_custkey),
rich AS (SELECT j.* FROM j, tot
         WHERE j.cents * tot.n > tot.s AND j.nord < {_Q22_MAX_ORDERS})
SELECT c_mktsegment, COUNT(*)::BIGINT AS n_cust,
       SUM(cents)::BIGINT AS bal_cents
FROM rich GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# UNPIVOT / melt (inverse of q_event_type_pivot)
# ---------------------------------------------------------------------------


def q_unpivot_orders(sf_dir: str):
    """Melt each order row into (o_orderkey, measure, value) rows for two
    integer measures — the UNPIVOT relational op. Pure zero-shuffle
    vectorized tile/repeat inside map_batches."""
    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def melt(t: pa.Table) -> pa.Table:
        ks = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        cust = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ks)
        return pa.table({
            "o_orderkey": pa.array(np.repeat(ks, 2)),
            "measure": pa.array(np.tile(np.array(["custkey", "price_cents"],
                                                 dtype=object), n)),
            "value": pa.array(np.column_stack([cust, price]).ravel(),
                              type=pa.int64()),
        })

    return _i64(pa.concat_tables(list(
        ds.map_batches(melt, batch_format="pyarrow")
          .iter_batches(batch_size=None, batch_format="pyarrow"))),
        ["o_orderkey", "value"])


SQL_UNPIVOT = """
SELECT o_orderkey::BIGINT AS o_orderkey, name AS measure, value::BIGINT AS value
FROM (SELECT o_orderkey,
             o_custkey::BIGINT AS custkey,
             CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
      FROM orders)
UNPIVOT (value FOR name IN (custkey, price_cents))
"""


# ---------------------------------------------------------------------------
# per-group z-score standardization (feature normalization)
# ---------------------------------------------------------------------------


def q_zscore_doclen_by_lang(sf_dir: str):
    """Per-language z-score of document length: exact int64 moments
    (n, sum, sum of squares) ride ONE tiny shuffle, get broadcast back,
    and a stateless second pass standardizes every row — the classic
    two-pass feature-normalization shape (no per-group sort, no
    materialization). Float finalization is the IDENTICAL expression on
    both sides, round6 half-away-from-zero."""
    ds = _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def moments(t: pa.Table) -> pa.Table:
        df = pa.table({"lang": t["lang"],
                       "x": pc.cast(t["n_chars"], pa.int64())}).to_pandas()
        df["x2"] = df["x"] * df["x"]
        g = df.groupby("lang").agg(n=("x", "size"), s=("x", "sum"),
                                   s2=("x2", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    mom = (ds.map_batches(moments, batch_format="pyarrow")
             .groupby("lang").aggregate(Sum("n", alias_name="n"),
                                        Sum("s", alias_name="s"),
                                        Sum("s2", alias_name="s2"))
             .to_pandas())
    lut = {r["lang"]: (int(r["n"]), int(r["s"]), int(r["s2"]))
           for _, r in mom.iterrows()}

    def standardize(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = np.array([lut[la][0] for la in langs], dtype=np.float64)
        s = np.array([lut[la][1] for la in langs], dtype=np.float64)
        s2 = np.array([lut[la][2] for la in langs], dtype=np.float64)
        mean = s / n
        std = np.sqrt(s2 / n - (s / n) * (s / n))
        z = _round6((x - mean) / std)
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "lang": pc.cast(t["lang"], pa.string()),
                         "z6": pa.array(z, type=pa.float64())})

    out = pa.concat_tables(list(
        ds.map_batches(standardize, batch_format="pyarrow")
          .iter_batches(batch_size=None, batch_format="pyarrow"))).to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


# identical float expression: sqrt(s2/n - (s/n)^2), z = (x - s/n)/std
SQL_ZSCORE = """
WITH m AS (
  SELECT lang, COUNT(*)::BIGINT AS n, SUM(n_chars::BIGINT)::BIGINT AS s,
         SUM(n_chars::BIGINT * n_chars::BIGINT)::BIGINT AS s2
  FROM documents GROUP BY 1)
SELECT d.doc_id::BIGINT AS doc_id, d.lang,
       round((d.n_chars::DOUBLE - m.s::DOUBLE / m.n) /
             sqrt(m.s2::DOUBLE / m.n - (m.s::DOUBLE / m.n) * (m.s::DOUBLE / m.n)), 6) AS z6
FROM documents d JOIN m ON m.lang = d.lang
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# ordered per-user behavior signature (string_agg ORDER BY)
# ---------------------------------------------------------------------------


def q_behavior_signatures(sf_dir: str):
    """Each user's chronologically-ordered event-type-initial string (the
    behavior signature), then users counted per signature — ordered
    string aggregation, the inverse-cardinality cousin of sessionization.
    One user-co-partitioned pass builds signatures; the signature->count
    groupby is O(distinct signatures)."""
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % _P).astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        df["ch"] = df["event_type"].str[0]
        s = df.groupby("user_id")["ch"].agg("".join)
        out = s.value_counts().rename_axis("sig").reset_index(name="n_users")
        return out

    part = (ds.map_batches(with_key, batch_format="pyarrow")
              .groupby("gkey").map_groups(sigs, batch_format="pandas")
              .groupby("sig").aggregate(Sum("n_users", alias_name="n_users")))
    out = part.to_pandas()
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("sig").reset_index(drop=True)


SQL_BEHAVIOR_SIGS = """
WITH s AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS sig
  FROM events GROUP BY user_id)
SELECT sig, COUNT(*)::BIGINT AS n_users FROM s GROUP BY sig ORDER BY sig
"""


# ---------------------------------------------------------------------------
# equi-width value histogram
# ---------------------------------------------------------------------------

_HIST_WIDTH_CENTS = 5_000_00   # $5000 bins


def q_histogram_order_value(sf_dir: str):
    """Equi-width histogram of order value (bin = cents // width): in-batch
    partial counts shrink the shuffle to O(bins x batches); one tiny
    groupby finalizes. The equi-DEPTH cousins are q_value_quantiles /
    q_ntile_orders."""
    ds = _pq(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        bins = cents // _HIST_WIDTH_CENTS
        v, c = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(v, type=pa.int64()),
                         "n": pa.array(c, type=pa.int64())})

    part = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bin").aggregate(Sum("n", alias_name="n")))
    out = part.to_pandas()
    out["lo_cents"] = out["bin"] * _HIST_WIDTH_CENTS
    for c in ("bin", "n", "lo_cents"):
        out[c] = out[c].astype(np.int64)
    return (out[["bin", "lo_cents", "n"]]
            .sort_values("bin").reset_index(drop=True))


SQL_HISTOGRAM = f"""
SELECT (CAST(round(o_totalprice*100) AS BIGINT) // {_HIST_WIDTH_CENTS})::BIGINT AS bin,
       ((CAST(round(o_totalprice*100) AS BIGINT) // {_HIST_WIDTH_CENTS})
        * {_HIST_WIDTH_CENTS})::BIGINT AS lo_cents,
       COUNT(*)::BIGINT AS n
FROM orders GROUP BY 1, 2 ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Spearman rank correlation per group (no global sort)
# ---------------------------------------------------------------------------


def q_spearman_price_date_by_status(sf_dir: str):
    """Spearman correlation of (order value, order date) per status WITHOUT
    a global sort: pass A builds per-status value histograms for both
    variables (O(distinct values) cells — the value_quantiles bound); the
    driver turns them into integer average-rank lookups (rank2 =
    2*counts_below + cnt + 1, doubled to stay integral under ties) and
    broadcasts the sorted arrays; pass B maps every row to (rx2, ry2) by
    searchsorted and accumulates exact int64 Pearson moments per status.
    Float finalization is the identical expression on both sides, round6.
    int64 bound: sum(rank2^2) <= n*(2n)^2 — fine to ~1e6 rows/group; past
    that the moments switch to float partials (documented trade)."""
    ds = _pq(sf_dir, "orders", ["o_orderstatus", "o_totalprice", "o_orderdate"])
    day_us = 86_400 * 1_000_000

    def hist_partial(t: pa.Table) -> pa.Table:
        s = t["o_orderstatus"].to_pylist()
        x = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        y = (t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // day_us)
        df = pd.DataFrame({"s": s + s,
                           "which": np.r_[np.zeros(len(x), np.int8),
                                          np.ones(len(y), np.int8)],
                           "v": np.r_[x, y]})
        g = df.groupby(["s", "which", "v"]).size().reset_index(name="cnt")
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
              .groupby(["s", "which", "v"]).aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())

    import ray

    # per (status, which): sorted values + rank2 of each value
    lut: dict[tuple, tuple] = {}
    for (s, w), g in hist.groupby(["s", "which"], sort=True):
        g = g.sort_values("v")
        vals = g["v"].to_numpy(dtype=np.int64)
        cnts = g["cnt"].to_numpy(dtype=np.int64)
        below = np.r_[0, np.cumsum(cnts)[:-1]]
        lut[(s, int(w))] = (vals, 2 * below + cnts + 1)   # doubled avg rank
    lut_ref = ray.put(lut)

    def moments(t: pa.Table) -> pa.Table:
        lu = ray.get(lut_ref) if not isinstance(lut_ref, dict) else lut_ref
        s = np.asarray(t["o_orderstatus"].to_pylist(), dtype=object)
        x = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        y = (t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // day_us)
        rows = []
        for sv in np.unique(s):
            m = s == sv
            vx, rx = lu[(sv, 0)]
            vy, ry = lu[(sv, 1)]
            rx2 = rx[np.searchsorted(vx, x[m])]
            ry2 = ry[np.searchsorted(vy, y[m])]
            rows.append((sv, int(m.sum()), int(rx2.sum()), int(ry2.sum()),
                         int((rx2 * ry2).sum()), int((rx2 * rx2).sum()),
                         int((ry2 * ry2).sum())))
        return pa.table({
            "s": pa.array([r[0] for r in rows], type=pa.string()),
            **{k: pa.array([r[i] for r in rows], type=pa.int64())
               for i, k in enumerate(("n", "sx", "sy", "sxy", "sxx", "syy"), 1)},
        })

    agg = (ds.map_batches(moments, batch_format="pyarrow")
             .groupby("s").aggregate(*[Sum(k, alias_name=k) for k in
                                       ("n", "sx", "sy", "sxy", "sxx", "syy")])
             .to_pandas())
    n = agg["n"].astype(np.float64)
    sx, sy = agg["sx"].astype(np.float64), agg["sy"].astype(np.float64)
    sxy = agg["sxy"].astype(np.float64)
    sxx, syy = agg["sxx"].astype(np.float64), agg["syy"].astype(np.float64)
    out = pd.DataFrame({
        "o_orderstatus": agg["s"],
        "n_orders": agg["n"].astype(np.int64),
        "spearman6": _round6((n * sxy - sx * sy)
                             / (np.sqrt(n * sxx - sx * sx)
                                * np.sqrt(n * syy - sy * sy))),
    })
    return out.sort_values("o_orderstatus").reset_index(drop=True)


SQL_SPEARMAN = """
WITH b AS (
  SELECT o_orderstatus AS s,
         CAST(round(o_totalprice*100) AS BIGINT) AS x,
         epoch_us(o_orderdate) // 86400000000 AS y
  FROM orders),
r AS (
  SELECT s,
         2*RANK() OVER (PARTITION BY s ORDER BY x)
           + COUNT(*) OVER (PARTITION BY s, x) - 1 AS rx2,
         2*RANK() OVER (PARTITION BY s ORDER BY y)
           + COUNT(*) OVER (PARTITION BY s, y) - 1 AS ry2
  FROM b),
m AS (
  SELECT s, COUNT(*)::BIGINT AS n,
         SUM(rx2)::BIGINT AS sx, SUM(ry2)::BIGINT AS sy,
         SUM(rx2*ry2)::BIGINT AS sxy,
         SUM(rx2*rx2)::BIGINT AS sxx, SUM(ry2*ry2)::BIGINT AS syy
  FROM r GROUP BY 1)
SELECT s AS o_orderstatus, n AS n_orders,
       round((n::DOUBLE*sxy - sx::DOUBLE*sy)
             / (sqrt(n::DOUBLE*sxx - sx::DOUBLE*sx)
                * sqrt(n::DOUBLE*syy - sy::DOUBLE*sy)), 6) AS spearman6
FROM m ORDER BY 1
"""


# ---------------------------------------------------------------------------
# daily new users + cumulative (growth accounting)
# ---------------------------------------------------------------------------


def q_daily_new_users(sf_dir: str):
    """First-seen day per user -> daily new-user counts -> running
    cumulative total. One user-keyed Min shuffle, one O(days) count
    shuffle, driver cumsum over O(days) rows — the user set never
    assembles anywhere."""
    from ray.data.aggregate import Min

    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    day_us = 86_400 * 1_000_000

    def first_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"u": pc.cast(t["user_id"], pa.int64()),
                       "ts": t["ts"].cast(pa.int64())}).to_pandas()
        g = df.groupby("u", as_index=False)["ts"].min()
        return pa.Table.from_pandas(g, preserve_index=False) \
                       .replace_schema_metadata(None)

    first = (ds.map_batches(first_partial, batch_format="pyarrow")
               .groupby("u").aggregate(Min("ts", alias_name="ft")))

    def day_partial(t: pa.Table) -> pa.Table:
        d = t["ft"].to_numpy(zero_copy_only=False) // day_us
        v, c = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(v, type=pa.int64()),
                         "new_users": pa.array(c, type=pa.int64())})

    daily = (first.map_batches(day_partial, batch_format="pyarrow")
                  .groupby("day").aggregate(Sum("new_users",
                                               alias_name="new_users"))
                  .to_pandas().sort_values("day"))
    daily["cum_users"] = daily["new_users"].cumsum()
    for c in ("day", "new_users", "cum_users"):
        daily[c] = daily[c].astype(np.int64)
    return daily.reset_index(drop=True)


SQL_DAILY_NEW_USERS = """
WITH f AS (SELECT user_id, min(ts) AS ft FROM events GROUP BY 1),
c AS (SELECT epoch_us(ft) // 86400000000 AS day,
             COUNT(*)::BIGINT AS new_users FROM f GROUP BY 1)
SELECT day::BIGINT AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM c ORDER BY day
"""


QUERIES11: dict[str, tuple] = {
    "exists_discounted_orders": (q_exists_discounted_orders,
                                 SQL_EXISTS_DISCOUNTED),
    "large_volume_orders": (q_large_volume_orders, SQL_LARGE_VOLUME),
    "rich_inactive_customers": (q_rich_inactive_customers, SQL_RICH_INACTIVE),
    "unpivot_orders": (q_unpivot_orders, SQL_UNPIVOT),
    "zscore_doclen_by_lang": (q_zscore_doclen_by_lang, SQL_ZSCORE),
    "behavior_signatures": (q_behavior_signatures, SQL_BEHAVIOR_SIGS),
    "histogram_order_value": (q_histogram_order_value, SQL_HISTOGRAM),
    "spearman_price_date_by_status": (q_spearman_price_date_by_status,
                                      SQL_SPEARMAN),
    "daily_new_users": (q_daily_new_users, SQL_DAILY_NEW_USERS),
}
