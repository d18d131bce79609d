"""Oracle-checked operator queries over the driver testdata (SURVEY.md §5.2.3).

Every entry implements one operator family from SURVEY.md §2 as an idiomatic
Ray Data pipeline over ``{sf_dir}/*.parquet`` and carries the equivalent
DuckDB SQL; the driver runs both at sf0.01 and compares row-count + schema +
order-insensitive value-hash (CORRECTNESS_r{N}.json). Conventions:

- every computed/aggregate column is named identically in Ray and SQL;
- float SUMs are never compared directly: a distributed partial+final sum
  differs from DuckDB's serial sum in the last ulps (fp addition is not
  associative), so every summed measure is quantized PER ROW to integer
  "cents" (``round(x*100)`` — the same IEEE ops on both sides give identical
  int64s) and summed exactly; derived means divide two exact integers.
  Pass-through floats (min/max/top-k values) are compared raw — they are the
  identical input doubles on both sides;
- counts are cast to int64 on both sides;
- scale-honesty: reads prune columns, big-table aggregations pre-aggregate
  inside ``map_batches`` before the shuffle, dimension joins broadcast the
  small side via ``ray.put`` (never a corpus shuffle).

Registry: ``QUERIES[name] -> (fn(sf_dir) -> Dataset|Table|DataFrame, sql|None)``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

_R = 4  # float rounding decimals, both sides


def _pq(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    path = os.path.join(sf_dir, f"{table}.parquet")
    # The driver's testdata carries b'pandas' schema metadata whose payload
    # makes pa.Schema unhashable — every ReadParquet task then logs "Failed
    # to hash the schemas (for deduplication): unhashable type: 'dict'" and
    # the executor loses schema dedup. Pass the footer schema stripped of
    # metadata (one driver-side footer read) so blocks hash clean.
    import pyarrow.parquet as pq_
    sch = pq_.read_schema(path).remove_metadata()
    if columns is not None:
        # the reader applies the given schema to column-pruned batches —
        # it must be the pruned schema, in selection order
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, schema=sch, columns=columns)


def _nrows(sf_dir: str, table: str) -> int:
    """Row count from parquet footer metadata — no Dataset pass (a full
    ``ds.count()`` costs ~3s of per-pipeline overhead at any data size)."""
    import pyarrow.parquet as pq_
    return pq_.read_metadata(os.path.join(sf_dir, f"{table}.parquet")).num_rows


def _ts_minmax_us(sf_dir: str, table: str, col: str = "ts") -> tuple[int, int]:
    """Exact (min, max) of a timestamp column in epoch-microseconds from
    parquet footer row-group statistics — no Dataset pass (the _nrows
    trick extended to column stats; plain-encoded timestamps carry exact
    min/max)."""
    import pandas as pd_
    import pyarrow.parquet as pq_
    md = pq_.read_metadata(os.path.join(sf_dir, f"{table}.parquet"))
    ci = md.schema.to_arrow_schema().get_field_index(col)
    mins, maxs = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        assert st is not None and st.has_min_max, f"{col} stats missing"
        mins.append(st.min)
        maxs.append(st.max)
    return (int(pd_.Timestamp(min(mins)).value // 1000),
            int(pd_.Timestamp(max(maxs)).value // 1000))


def _round(t: pa.Table, cols: list[str]) -> pa.Table:
    # half_towards_infinity == "round half away from zero" == DuckDB's ROUND
    for c in cols:
        i = t.schema.get_field_index(c)
        t = t.set_column(i, c, pc.round(pc.cast(t[c], pa.float64()), ndigits=_R,
                                        round_mode="half_towards_infinity"))
    return t


def _i64(t: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        i = t.schema.get_field_index(c)
        t = t.set_column(i, c, pc.cast(t[c], pa.int64()))
    return t


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Per-row exact quantization: round(x*100) as int64. SQL equivalent:
    CAST(round(col * 100) AS BIGINT). Identical IEEE double ops on both
    sides -> identical integers -> exact associative sums."""
    return pc.cast(pc.round(pc.multiply(pc.cast(col, pa.float64()), pa.scalar(100.0)),
                            ndigits=0, round_mode="half_towards_infinity"), pa.int64())


def _cents_np(x: np.ndarray) -> np.ndarray:
    """numpy twin of _cents: half-away-from-zero (DuckDB round), NOT
    np.round's banker's rounding — CLAUDE.md hard rule."""
    y = np.asarray(x, dtype=np.float64) * 100.0
    return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)


# ---------------------------------------------------------------- filters/projections

def q_filter_project_lang(sf_dir: str):
    """M7/M10-style vectorized filter + projection (prune at the read)."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], "en")), batch_format="pyarrow")


SQL_FILTER = "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'"


def q_scalar_string_fns(sf_dir: str):
    """M5/M6/§2.8 string kernels: length, regex token count, upper — all
    pyarrow.compute (RE2), matching DuckDB's RE2 semantics."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars_calc": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            "n_tokens": pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
            "n_the": pc.cast(pc.count_substring_regex(t["text"], r"\bthe\b"), pa.int64()),
            "lang_upper": pc.utf8_upper(t["lang"]),
        })

    return ds.map_batches(f, batch_format="pyarrow")


SQL_SCALAR = """
SELECT doc_id,
       length(text)::BIGINT AS n_chars_calc,
       array_length(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens,
       array_length(regexp_extract_all(text, '\\bthe\\b'))::BIGINT AS n_the,
       upper(lang) AS lang_upper
FROM documents
"""


# ---------------------------------------------------------------- aggregations

def q_groupby_count_source(sf_dir: str):
    """A1-style groupby-count (shuffle on a low-cardinality key)."""
    ds = _pq(sf_dir, "documents", columns=["source"])
    out = ds.groupby("source").aggregate(Count(alias_name="n"))
    t = _i64(out.take_all_as_arrow() if hasattr(out, "take_all_as_arrow") else
             pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["n"])
    return t


SQL_GROUPBY_COUNT = "SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source"


def q_grouped_agg_user_value(sf_dir: str):
    """A2-style grouped agg with explicit partial+final combine: per-batch
    partials inside map_batches shrink the shuffle to one row per (key,
    batch) before the small groupby (SURVEY §2.5, ray_guide 'Aggregation at
    scale')."""
    ds = _pq(sf_dir, "events", columns=["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"user_id": t["user_id"], "vc": _cents(t["value"]),
                       "v": t["value"]}).to_pandas()
        g = df.groupby("user_id").agg(s=("vc", "sum"), c=("vc", "count"),
                                      mn=("v", "min"), mx=("v", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    part = ds.map_batches(partial, batch_format="pyarrow")
    out = part.groupby("user_id").aggregate(
        Sum("s", alias_name="value_sum_c"), Sum("c", alias_name="n"),
        Min("mn", alias_name="value_min"), Max("mx", alias_name="value_max"))
    t = pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None)
    t = t.append_column("value_mean_c", pc.round(
        pc.divide(pc.cast(t["value_sum_c"], pa.float64()), pc.cast(t["n"], pa.float64())),
        ndigits=_R, round_mode="half_towards_infinity"))
    return _i64(t, ["n", "value_sum_c"]).select(
        ["user_id", "n", "value_sum_c", "value_mean_c", "value_min", "value_max"])


SQL_GROUPED_AGG = """
SELECT user_id, count(*)::BIGINT AS n,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value_sum_c,
       round(sum(CAST(round(value * 100) AS BIGINT))::BIGINT / count(*), 4) AS value_mean_c,
       min(value) AS value_min,
       max(value) AS value_max
FROM events GROUP BY user_id
"""


def q_tpch_q1_like(sf_dir: str):
    """TPC-H Q1-shaped pricing summary: filter + multi-key groupby with
    partial+final aggregation (the headline wide aggregate)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_returnflag", "l_linestatus", "l_quantity",
                      "l_extendedprice", "l_discount", "l_shipdate"])

    cutoff = pd.Timestamp("1998-09-02")

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cutoff)))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = pa.table({
            "l_returnflag": t["l_returnflag"], "l_linestatus": t["l_linestatus"],
            "q": _cents(t["l_quantity"]), "p": _cents(t["l_extendedprice"]),
            "r": _cents(rev),
        }).to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"]).agg(
            sq=("q", "sum"), sp=("p", "sum"), sr=("r", "sum"), c=("q", "count")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    part = ds.map_batches(partial, batch_format="pyarrow")
    out = part.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sq", alias_name="sum_qty_c"), Sum("sp", alias_name="sum_base_price_c"),
        Sum("sr", alias_name="sum_revenue_c"), Sum("c", alias_name="count_order"))
    t = pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None)
    return _i64(t, ["sum_qty_c", "sum_base_price_c", "sum_revenue_c", "count_order"])


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS sum_qty_c,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_base_price_c,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT AS sum_revenue_c,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_ts_bucket_hourly(sf_dir: str):
    """§2.8 date fns: event-time bucketing (tumbling hour window, §2.9)."""
    ds = _pq(sf_dir, "events", columns=["ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        df = pa.table({"hour": hour, "vc": _cents(t["value"])}).to_pandas()
        g = df.groupby("hour").agg(s=("vc", "sum"), c=("vc", "count")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = ds.map_batches(bucket, batch_format="pyarrow").groupby("hour").aggregate(
        Sum("s", alias_name="value_sum_c"), Sum("c", alias_name="n"))
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["value_sum_c", "n"])


SQL_TS_BUCKET = """
SELECT date_trunc('hour', ts) AS hour,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value_sum_c,
       count(*)::BIGINT AS n
FROM events GROUP BY 1
"""


def q_json_extract_props(sf_dir: str):
    """§2.8 json fns: parse the props JSON column, bucket k, grouped count
    (Arrow 16 has no JSON-path kernel -> per-batch python json.loads,
    documented; DuckDB uses its json extension)."""
    import json as _json

    ds = _pq(sf_dir, "events", columns=["props"])

    def f(t: pa.Table) -> pa.Table:
        ks = np.array([_json.loads(p)["k"] for p in t["props"].to_pylist()], dtype=np.int64)
        dec = ks // 10
        df = pd.DataFrame({"k_decile": dec})
        g = df.groupby("k_decile").size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = ds.map_batches(f, batch_format="pyarrow").groupby("k_decile").aggregate(
        Sum("n", alias_name="n"))
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["n"])


SQL_JSON = """
SELECT (json_extract(props, '$.k')::BIGINT // 10) AS k_decile, count(*)::BIGINT AS n
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------- sort/limit/topk

def q_topk_orders(sf_dir: str):
    """O3 top-k: sort desc + limit with deterministic tiebreak."""
    ds = _pq(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None)


SQL_TOPK = """
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------- dedup / distinct / set ops

def q_dedup_first_event_per_user(sf_dir: str):
    """A4/D1 exact dedup: first row per key = hash-partition + per-group
    first ([S:scrapy/dupefilters.py] semantics as a batch op)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["ts", "event_id"]).head(1)

    out = ds.groupby("user_id").map_groups(first, batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None).select(["user_id", "event_id", "ts"])


SQL_DEDUP_FIRST = """
SELECT user_id, event_id, ts FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn = 1
"""


def q_distinct_langs(sf_dir: str):
    """D-distinct: Dataset.unique on one column."""
    vals = _pq(sf_dir, "documents", columns=["lang"]).unique("lang")
    return pa.table({"lang": pa.array(sorted(vals), type=pa.string())})


SQL_DISTINCT = "SELECT DISTINCT lang FROM documents"


def q_union_filtered(sf_dir: str):
    """D4 union of two filtered streams + grouped count over the union."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "lang"])
    en = docs.map_batches(lambda t: t.filter(pc.equal(t["lang"], "en")),
                          batch_format="pyarrow")
    fr = docs.map_batches(lambda t: t.filter(pc.equal(t["lang"], "fr")),
                          batch_format="pyarrow")
    out = en.union(fr).groupby("lang").aggregate(Count(alias_name="n"))
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["n"])


SQL_UNION = """
SELECT lang, count(*)::BIGINT AS n FROM (
  SELECT doc_id, lang FROM documents WHERE lang = 'en'
  UNION ALL
  SELECT doc_id, lang FROM documents WHERE lang = 'fr') GROUP BY lang
"""


# ---------------------------------------------------------------- joins

def _broadcast_lookup(sf_dir: str, table: str, key: str, cols: list[str]):
    """Read a small dimension table driver-side, ray.put once (SURVEY §2.4:
    broadcast-small-side join — no shuffle of the fact table)."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=[key] + cols)
    return ray.put(t.to_pandas().set_index(key))


def q_join_orders_customer(sf_dir: str):
    """J1-style broadcast hash join: orders ⋈ customer (dim), grouped by
    market segment."""
    dim_ref = _broadcast_lookup(sf_dir, "customer", "c_custkey", ["c_mktsegment"])
    ds = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def join_partial(df: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(dim_ref)
        df["pc"] = _cents_np(df["o_totalprice"].to_numpy())
        j = df.join(dim, on="o_custkey", how="inner")
        return j.groupby("c_mktsegment").agg(n=("pc", "count"),
                                             total=("pc", "sum")).reset_index()

    part = ds.map_batches(join_partial, batch_format="pandas")
    out = part.groupby("c_mktsegment").aggregate(
        Sum("n", alias_name="n_orders"), Sum("total", alias_name="total_price_c"))
    t = pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None)
    return _i64(t, ["total_price_c", "n_orders"])


SQL_JOIN_OC = """
SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS total_price_c
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_join_lineitem_part_brand(sf_dir: str):
    """Second broadcast join: lineitem ⋈ part, per-brand quantity."""
    dim_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", ["p_brand"])
    ds = _pq(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def join_partial(df: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(dim_ref)
        df["qc"] = _cents_np(df["l_quantity"].to_numpy())
        j = df.join(dim, on="l_partkey", how="inner")
        return j.groupby("p_brand").agg(q=("qc", "sum"), c=("qc", "count")).reset_index()

    part = ds.map_batches(join_partial, batch_format="pandas")
    out = part.groupby("p_brand").aggregate(
        Sum("q", alias_name="sum_qty_c"), Sum("c", alias_name="n_items"))
    t = pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None)
    return _i64(t, ["sum_qty_c", "n_items"])


SQL_JOIN_LP = """
SELECT p_brand, sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS sum_qty_c,
       count(*)::BIGINT AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_tpch_q3_like(sf_dir: str):
    """3-way join + groupby + top-k via Bloom semi-join pushdown, fully
    distributed: only the TRUE dim (customer segment keys) is broadcast;
    orders (a fact table) is NOT collected driver-side. One streaming pass
    over orders builds mergeable partial Blooms over the BUILDING orderkeys
    (OR-merged into one small filter); the Bloom pre-prunes lineitem BEFORE
    the groupby(l_orderkey) shuffle (~5x less exchange volume). Per-block
    partial top-k bounds the driver merge, and Bloom false positives are
    removed by EXACT chunked verification probes of orders down the revenue
    order until the top 10 are confirmed — never an O(fact) driver
    structure."""
    import pyarrow.parquet as pq_

    from scrapy_ray.state.bloom import BloomFilter

    cust = pq_.read_table(os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey", "c_mktsegment"])
    bldg = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))
    ckeys = pc.cast(pc.unique(bldg["c_custkey"]), pa.int64())
    if isinstance(ckeys, pa.ChunkedArray):
        ckeys = ckeys.combine_chunks()
    ckeys_ref = ray.put(ckeys)

    orders = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    bloom_cap = max(1024, _nrows(sf_dir, "orders") // 4)   # BUILDING ≈ 1/5 of orders

    def order_bloom(t: pa.Table) -> pa.Table:
        keys = ray.get(ckeys_ref) if isinstance(ckeys_ref, ray.ObjectRef) else ckeys_ref
        t = t.filter(pc.is_in(pc.cast(t["o_custkey"], pa.int64()), value_set=keys))
        bf = BloomFilter(bloom_cap, 12)
        bf.add_many(t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64))
        return pa.table({"words": pa.array([bf.words.tobytes()], type=pa.binary())})

    merged = BloomFilter(bloom_cap, 12)
    for b in orders.map_batches(order_bloom, batch_format="pyarrow") \
                   .iter_batches(batch_size=None, batch_format="pyarrow"):
        for w in b["words"].to_pylist():
            merged.words |= np.frombuffer(w, dtype=np.uint64)
    bloom_ref = ray.put(merged)

    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(t: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        keep = bf.contains_many(
            t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64))
        t = t.filter(pa.array(keep))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = pa.table({"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                       "rev": _cents(rev)}).to_pandas()
        g = df.groupby("l_orderkey").agg(revenue_c=("rev", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = (li.map_batches(li_partial, batch_format="pyarrow")
             .groupby("l_orderkey").aggregate(Sum("revenue_c", alias_name="revenue_c")))

    # Per-block partial top-200, tiny driver merge. Safe bound: a global
    # top-10 key can be outranked within its block only by other true keys
    # (<=9 globally) plus Bloom false positives (expected ~p*|keys| ~ tens
    # TOTAL at 12 bits/key) — nowhere near 200.
    def part_top(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("revenue_c", "descending"),
                                            ("l_orderkey", "ascending")])[:200]
        return t.take(idx)

    parts = list(agg.map_batches(part_top, batch_format="pyarrow")
                    .iter_batches(batch_size=None, batch_format="pyarrow"))
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"l_orderkey": pa.array([], pa.int64()), "revenue_c": pa.array([], pa.int64())})
    idx = pc.sort_indices(merged, sort_keys=[("revenue_c", "descending"),
                                             ("l_orderkey", "ascending")])
    cands = merged.take(idx)

    # Exact verification of the candidate keys (removes Bloom false
    # positives): targeted distributed scans of orders, chunk by chunk down
    # the revenue order until 10 verified survive — each chunk is one
    # pruned 2-column scan, never an O(fact) driver structure.
    def verified_keys(chunk_keys: pa.Array) -> set:
        ref = ray.put(chunk_keys)

        def probe(t: pa.Table) -> pa.Table:
            ks = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            ck = ray.get(ckeys_ref) if isinstance(ckeys_ref, ray.ObjectRef) else ckeys_ref
            t = t.filter(pc.and_(
                pc.is_in(pc.cast(t["o_orderkey"], pa.int64()), value_set=ks),
                pc.is_in(pc.cast(t["o_custkey"], pa.int64()), value_set=ck)))
            return pa.table({"k": pc.cast(t["o_orderkey"], pa.int64())})

        hits = list(orders.map_batches(probe, batch_format="pyarrow")
                          .iter_batches(batch_size=None, batch_format="pyarrow"))
        return set(pa.concat_tables(hits)["k"].to_pylist()) if hits else set()

    keep_keys: list[int] = []
    keep_rev: list[int] = []
    pos, chunk = 0, 256
    while len(keep_keys) < 10 and pos < len(cands):
        sl = cands.slice(pos, chunk)
        ok = verified_keys(pc.cast(sl["l_orderkey"], pa.int64()).combine_chunks())
        for k, r in zip(sl["l_orderkey"].to_pylist(), sl["revenue_c"].to_pylist()):
            if k in ok and len(keep_keys) < 10:
                keep_keys.append(k)
                keep_rev.append(r)
        pos += chunk
    return pa.table({"l_orderkey": pa.array(keep_keys, type=pa.int64()),
                     "revenue_c": pa.array(keep_rev, type=pa.int64())})


SQL_TPCH_Q3 = """
SELECT l_orderkey,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))::BIGINT AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue_c DESC, l_orderkey LIMIT 10
"""


# ---------------------------------------------------------------- explode / flatten

def q_explode_top_tokens(sf_dir: str):
    """§2.8 array fns: vectorized token explode (split_pattern_regex +
    list_flatten — the M4 link-explode shape) + grouped count + top-k."""
    ds = _pq(sf_dir, "documents", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(t["text"]), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        df = pd.DataFrame({"token": flat.to_pandas()})
        return pa.Table.from_pandas(df.groupby("token").size().reset_index(name="n"),
                                    preserve_index=False).replace_schema_metadata(None)

    out = ds.map_batches(explode, batch_format="pyarrow").groupby("token").aggregate(
        Sum("n", alias_name="n"))
    top = out.sort(["n", "token"], descending=[True, False]).limit(20)
    return _i64(pa.Table.from_pandas(top.to_pandas()).replace_schema_metadata(None), ["n"])


SQL_EXPLODE = """
SELECT token, count(*)::BIGINT AS n FROM (
  SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


# ---------------------------------------------------------------- registry

QUERIES: dict[str, tuple] = {
    "filter_project_lang": (q_filter_project_lang, SQL_FILTER),
    "scalar_string_fns": (q_scalar_string_fns, SQL_SCALAR),
    "groupby_count_source": (q_groupby_count_source, SQL_GROUPBY_COUNT),
    "grouped_agg_user_value": (q_grouped_agg_user_value, SQL_GROUPED_AGG),
    "tpch_q1_like": (q_tpch_q1_like, SQL_TPCH_Q1),
    "ts_bucket_hourly": (q_ts_bucket_hourly, SQL_TS_BUCKET),
    "json_extract_props": (q_json_extract_props, SQL_JSON),
    "topk_orders": (q_topk_orders, SQL_TOPK),
    "dedup_first_event_per_user": (q_dedup_first_event_per_user, SQL_DEDUP_FIRST),
    "distinct_langs": (q_distinct_langs, SQL_DISTINCT),
    "union_filtered": (q_union_filtered, SQL_UNION),
    "join_orders_customer": (q_join_orders_customer, SQL_JOIN_OC),
    "join_lineitem_part_brand": (q_join_lineitem_part_brand, SQL_JOIN_LP),
    "tpch_q3_like": (q_tpch_q3_like, SQL_TPCH_Q3),
    "explode_top_tokens": (q_explode_top_tokens, SQL_EXPLODE),
}
