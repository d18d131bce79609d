"""Third oracle-query batch (round 2) — widens SURVEY.md §2.6/§2.8 coverage:
deterministic hash sampling, exact distributed quantiles, per-group top-k,
and pivot-style conditional aggregation.

Same conventions as pipelines/queries.py (integer-cent exact sums, identical
column names both sides, broadcast small sides, partial aggregation before
shuffles).
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

from scrapy_ray.pipelines.queries import _cents, _i64, _pq

# ---------------------------------------------------------------- hash sample

_SAMPLE_MULT = 2_654_435_761          # Knuth multiplicative hash constant
_SAMPLE_MOD = 1 << 32
_SAMPLE_PCT = 10


def q_hash_sample_events(sf_dir: str):
    """O4 deterministic sampling at scale: a multiplicative hash of the key
    selects ~10% of rows identically on any partitioning / engine (unlike
    seeded RNG sampling, which depends on block layout). Grouped count per
    event_type keeps the oracle compact."""
    ds = _pq(sf_dir, "events", columns=["event_id", "event_type"])

    def f(t: pa.Table) -> pa.Table:
        # uint64 with an explicit pre-reduction mod 2^32: the product then
        # fits uint64 exactly (no wrap), so numpy and DuckDB UBIGINT agree
        # at any event_id scale (int64 multiply would wrap silently where
        # DuckDB raises on BIGINT overflow — a latent scale divergence)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((eid % np.uint64(_SAMPLE_MOD)) * np.uint64(_SAMPLE_MULT)) % np.uint64(_SAMPLE_MOD)
        keep = h % np.uint64(100) < np.uint64(_SAMPLE_PCT)
        t = t.filter(pa.array(keep))
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist()})
        return pa.Table.from_pandas(
            df.groupby("event_type").size().reset_index(name="n"),
            preserve_index=False).replace_schema_metadata(None)

    out = ds.map_batches(f, batch_format="pyarrow").groupby("event_type").aggregate(
        Sum("n", alias_name="n"))
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["n"])


SQL_HASH_SAMPLE = f"""
SELECT event_type, count(*)::BIGINT AS n FROM events
WHERE (((event_id::UBIGINT % {_SAMPLE_MOD}) * {_SAMPLE_MULT}) % {_SAMPLE_MOD}) % 100 < {_SAMPLE_PCT}
GROUP BY event_type
"""


# ---------------------------------------------------------------- exact quantiles

_QS = (0.5, 0.9, 0.99)


def q_value_quantiles(sf_dir: str):
    """Exact distributed quantiles without a global sort: per-batch value
    counts on integer cents (partial agg) -> one small merged histogram ->
    walk the cumulative counts. Matches DuckDB quantile_disc exactly
    (element at 1-based rank ceil(q*n)) because cents are discrete."""
    ds = _pq(sf_dir, "events", columns=["value"])

    def counts(t: pa.Table) -> pa.Table:
        vc = _cents(t["value"]).to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(vc, return_counts=True)
        return pa.table({"value_c": pa.array(vals, type=pa.int64()),
                         "n": pa.array(cnts.astype(np.int64))})

    hist = ds.map_batches(counts, batch_format="pyarrow").groupby("value_c").aggregate(
        Sum("n", alias_name="n"))
    h = hist.to_pandas().sort_values("value_c", ignore_index=True)
    cum = h["n"].cumsum().to_numpy()
    total = int(cum[-1])
    qs, out_v = [], []
    for q in _QS:
        rank = int(np.ceil(q * total))          # 1-based, quantile_disc rule
        idx = int(np.searchsorted(cum, rank, side="left"))
        qs.append(q)
        out_v.append(int(h["value_c"].iloc[idx]))
    return pa.table({"q": pa.array(qs, type=pa.float64()),
                     "value_c": pa.array(out_v, type=pa.int64())})


SQL_QUANTILES = f"""
SELECT unnest([{", ".join(str(q) for q in _QS)}]) AS q,
       unnest(quantile_disc(CAST(round(value * 100) AS BIGINT),
                            [{", ".join(str(q) for q in _QS)}]))::BIGINT AS value_c
FROM events
"""


# ---------------------------------------------------------------- per-group top-k

_GK = 3


def q_top_orders_per_segment(sf_dir: str):
    """O3 per-GROUP top-k: top 3 orders by totalprice per market segment.
    Broadcast the customer->segment dim; per-batch partial top-k per
    segment, final exact top-k per group — no global sort."""
    from scrapy_ray.pipelines.queries import _broadcast_lookup

    dim_ref = _broadcast_lookup(sf_dir, "customer", "c_custkey", ["c_mktsegment"])
    ds = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(dim_ref)
        j = df.join(dim, on="o_custkey", how="inner")
        j = j.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        return (j.groupby("c_mktsegment").head(_GK)
                 [["c_mktsegment", "o_orderkey", "o_totalprice"]])

    part = ds.map_batches(partial, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True]).head(_GK)

    out = part.groupby("c_mktsegment").map_groups(final, batch_format="pandas")
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)
    return _i64(t, ["o_orderkey"]).select(["c_mktsegment", "o_orderkey", "o_totalprice"])


SQL_GROUP_TOPK = f"""
SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey::BIGINT AS o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey)
WHERE rn <= {_GK}
"""


# ---------------------------------------------------------------- pivot

_ETYPES = ("click", "error", "purchase", "signup", "view")


def q_event_type_pivot(sf_dir: str):
    """Pivot / conditional aggregation: one row per user with per-type
    event counts as columns (pandas crosstab partials -> groupby sum)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(zero_copy_only=False),
                           "event_type": t["event_type"].to_pylist()})
        x = pd.crosstab(df["user_id"], df["event_type"])
        for et in _ETYPES:
            if et not in x.columns:
                x[et] = 0
        x = x[list(_ETYPES)].reset_index()
        x.columns = ["user_id"] + [f"n_{et}" for et in _ETYPES]
        return pa.Table.from_pandas(x, preserve_index=False).replace_schema_metadata(None)

    aggs = [Sum(f"n_{et}", alias_name=f"n_{et}") for et in _ETYPES]
    out = ds.map_batches(partial, batch_format="pyarrow").groupby("user_id").aggregate(*aggs)
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None),
                [f"n_{et}" for et in _ETYPES])


SQL_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click,
       count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------- training mix

_MIX_MIN_TOKENS = 40
_MIX_PCT = 50


def q_training_mix(sf_dir: str):
    """Flagship composed data-prep pipeline — the canonical LLM training-mix
    shape in ONE streaming Ray pipeline with ONE SQL oracle:

        quality filter (min tokens) -> exact dedup (md5, keep min doc_id)
        -> deterministic 50% hash sample -> per-language doc/token counts.

    Every stage is the scale-safe form used elsewhere: vectorized per-batch
    predicates, partial dedup inside the batch before the hash shuffle,
    arg-min row kept per content hash, block-layout-independent sampling."""
    import hashlib

    ds = _pq(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def stage1(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
        t = t.append_column("n_tokens", n_tok)
        t = t.filter(pc.greater_equal(t["n_tokens"], _MIX_MIN_TOKENS))
        hs = [hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        df = pd.DataFrame({"h": hs,
                           "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                           "lang": t["lang"].to_pylist(),
                           "n_tokens": t["n_tokens"].to_numpy(zero_copy_only=False)})
        # partial dedup inside the batch before the shuffle
        df = df.sort_values("doc_id", kind="mergesort").drop_duplicates("h")
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("doc_id", kind="mergesort").head(1)

    deduped = (ds.map_batches(stage1, batch_format="pyarrow")
                 .groupby("h").map_groups(keep_min, batch_format="pandas"))

    def stage3(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((ids * _SAMPLE_MULT) % _SAMPLE_MOD) % 100 < _MIX_PCT
        t = t.filter(pa.array(keep))
        df = pd.DataFrame({"lang": t["lang"].to_pylist(),
                           "n_tokens": t["n_tokens"].to_numpy(zero_copy_only=False)})
        g = df.groupby("lang").agg(n_docs=("n_tokens", "count"),
                                   total_tokens=("n_tokens", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = (deduped.map_batches(stage3, batch_format="pyarrow")
                  .groupby("lang").aggregate(Sum("n_docs", alias_name="n_docs"),
                                             Sum("total_tokens", alias_name="total_tokens")))
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["n_docs", "total_tokens"])


SQL_TRAINING_MIX = f"""
WITH q AS (
  SELECT doc_id, lang,
         array_length(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens,
         md5(text) AS h
  FROM documents
  WHERE array_length(regexp_extract_all(text, '\\S+')) >= {_MIX_MIN_TOKENS}),
d AS (
  SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang,
         arg_min(n_tokens, doc_id) AS n_tokens
  FROM q GROUP BY h),
s AS (
  SELECT * FROM d
  WHERE ((doc_id * {_SAMPLE_MULT}) % {_SAMPLE_MOD}) % 100 < {_MIX_PCT})
SELECT lang, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
FROM s GROUP BY lang
"""


# ------------------------------------------------------- stratified sampling

# target sampling rate (percent) per language — the "training mix" knob:
# downsample dominant languages, keep the rest
_STRAT_RATES = {"en": 40, "de": 80, "fr": 80, "es": 100, "zh": 100}
_STRAT_DEFAULT = 100


def q_stratified_sample_by_lang(sf_dir: str):
    """Training-mix resampling: deterministic per-language hash sampling —
    each doc kept iff hash(doc_id) lands under its language's target rate.
    Same uint64 mod-2^32 multiplicative hash as q_hash_sample_events, so
    the kept set is identical on any engine/partitioning; grouped counts
    keep the oracle compact (per-lang kept vs total)."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "lang"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids % np.uint64(_SAMPLE_MOD)) * np.uint64(_SAMPLE_MULT)) \
            % np.uint64(_SAMPLE_MOD) % np.uint64(100)
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        rates = np.array([_STRAT_RATES.get(x, _STRAT_DEFAULT) for x in langs],
                         dtype=np.uint64)
        kept = (h < rates).astype(np.int64)
        df = pd.DataFrame({"lang": langs, "kept": kept})
        g = df.groupby("lang").agg(n_total=("kept", "count"),
                                   n_kept=("kept", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = ds.map_batches(f, batch_format="pyarrow").groupby("lang").aggregate(
        Sum("n_total", alias_name="n_total"), Sum("n_kept", alias_name="n_kept"))
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["n_total", "n_kept"])


_STRAT_CASE = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_STRAT_RATES.items()))
SQL_STRATIFIED = f"""
SELECT lang, count(*)::BIGINT AS n_total,
       sum(CASE WHEN (((doc_id::UBIGINT % {_SAMPLE_MOD}) * {_SAMPLE_MULT})
                 % {_SAMPLE_MOD}) % 100
                < (CASE lang {_STRAT_CASE} ELSE {_STRAT_DEFAULT} END)
           THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM documents GROUP BY lang
"""


# ------------------------------------------------------- per-group sample

_GROUP_SAMPLE_K = 5


def q_group_sample_docs(sf_dir: str):
    """Deterministic uniform-ish per-group sample: the K docs with the
    smallest multiplicative hash of doc_id per language — the distributed
    form is per-batch partial top-K-smallest + a tiny final merge (same
    shape as per-group top-k), and the sample is identical on any
    partitioning, unlike reservoir/seeded-RNG sampling. Oracle replays it
    with a ROW_NUMBER window."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids % np.uint64(_SAMPLE_MOD)) * np.uint64(_SAMPLE_MULT)) % np.uint64(_SAMPLE_MOD)
        df = pd.DataFrame({"lang": t["lang"].to_pylist(),
                           "doc_id": ids.astype(np.int64), "h": h.astype(np.int64)})
        return pa.Table.from_pandas(
            df.sort_values(["h", "doc_id"]).groupby("lang").head(_GROUP_SAMPLE_K),
            preserve_index=False).replace_schema_metadata(None)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["h", "doc_id"]).head(_GROUP_SAMPLE_K)

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("lang").map_groups(final, batch_format="pandas"))
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False).replace_schema_metadata(None)
    return _i64(t.select(["lang", "doc_id", "h"]), ["doc_id", "h"])


SQL_GROUP_SAMPLE = f"""
WITH h AS (
  SELECT lang, doc_id,
         (((doc_id::UBIGINT % {_SAMPLE_MOD}) * {_SAMPLE_MULT}) % {_SAMPLE_MOD})::BIGINT AS h
  FROM documents),
r AS (
  SELECT lang, doc_id, h,
         row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
  FROM h)
SELECT lang, doc_id::BIGINT AS doc_id, h FROM r WHERE rn <= {_GROUP_SAMPLE_K}
"""


# ------------------------------------------------------- token-budget sample

_BUDGET_TOKENS = 2_000


def q_token_budget_sample(sf_dir: str):
    """Token-budgeted per-language sampling (the LLM data-mix primitive:
    "take ~N tokens per language, deterministically"): docs are virtually
    ordered by (hash, doc_id) per language and taken while the running
    token total stays under the budget — the LAST doc may cross it (the
    greedy rule every mix pipeline uses).

    Distributed shape: NO global sort — one pass emits per-(lang,
    hash-bucket) token partials; the driver merges the tiny histogram,
    walks it to a per-lang BUCKET threshold, and resolves only the single
    boundary bucket's docs exactly (a second pruned pass). Same
    partial-histogram trick as q_value_quantiles. Output: per-lang kept
    doc/token totals."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    nb = 256   # hash buckets per lang; boundary bucket resolved exactly

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids % np.uint64(_SAMPLE_MOD)) * np.uint64(_SAMPLE_MULT)) % np.uint64(_SAMPLE_MOD)
        bkt = (h // np.uint64(_SAMPLE_MOD // nb)).astype(np.int64)
        ntok = np.array([len(s.split()) for s in t["text"].to_pylist()], dtype=np.int64)
        df = pd.DataFrame({"lang": t["lang"].to_pylist(), "bkt": bkt,
                           "tok": ntok})
        g = df.groupby(["lang", "bkt"]).agg(tok=("tok", "sum"),
                                            n=("tok", "count")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["lang", "bkt"]).aggregate(
                  Sum("tok", alias_name="tok"), Sum("n", alias_name="n"))
              .to_pandas().sort_values(["lang", "bkt"], ignore_index=True))

    # per-lang walk: full buckets below the threshold, boundary bucket id
    state: dict[str, dict] = {}
    for lang, grp in hist.groupby("lang"):
        cum_t, cum_n = 0, 0
        boundary = None
        for _, row in grp.iterrows():
            if cum_t >= _BUDGET_TOKENS:
                break
            if cum_t + row["tok"] >= _BUDGET_TOKENS:
                boundary = int(row["bkt"])
                break
            cum_t += int(row["tok"])
            cum_n += int(row["n"])
        state[lang] = {"tok": cum_t, "n": cum_n, "boundary": boundary}

    # resolve boundary buckets exactly: only those (lang, bkt) docs re-read
    bpairs = [(lang, s["boundary"]) for lang, s in state.items()
              if s["boundary"] is not None]
    if bpairs:
        bref = ray.put(set(bpairs))

        def boundary_docs(t: pa.Table) -> pa.Table:
            bp = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            h = ((ids % np.uint64(_SAMPLE_MOD)) * np.uint64(_SAMPLE_MULT)) % np.uint64(_SAMPLE_MOD)
            bkt = (h // np.uint64(_SAMPLE_MOD // nb)).astype(np.int64)
            langs = t["lang"].to_pylist()
            keep = np.array([(lang, int(b)) in bp for lang, b in zip(langs, bkt)])
            if not keep.any():
                return pa.table({"lang": pa.array([], pa.string()),
                                 "h": pa.array([], pa.int64()),
                                 "doc_id": pa.array([], pa.int64()),
                                 "tok": pa.array([], pa.int64())})
            ntok = np.array([len(s.split()) for s, k in
                             zip(t["text"].to_pylist(), keep) if k], dtype=np.int64)
            return pa.table({
                "lang": pa.array([x for x, k in zip(langs, keep) if k], pa.string()),
                "h": pa.array(h[keep].astype(np.int64)),
                "doc_id": pa.array(ids[keep].astype(np.int64)),
                "tok": pa.array(ntok)})

        bd = pa.concat_tables(list(
            ds.map_batches(boundary_docs, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow"))).to_pandas()
        for lang, grp in bd.groupby("lang"):
            s = state[lang]
            for _, row in grp.sort_values(["h", "doc_id"]).iterrows():
                if s["tok"] >= _BUDGET_TOKENS:
                    break
                s["tok"] += int(row["tok"])     # greedy: last doc may cross
                s["n"] += 1

    langs = sorted(state)
    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_docs": pa.array([state[x]["n"] for x in langs], pa.int64()),
        "n_tokens": pa.array([state[x]["tok"] for x in langs], pa.int64()),
    })


SQL_TOKEN_BUDGET = f"""
WITH t AS (
  SELECT lang, doc_id,
         (((doc_id::UBIGINT % {_SAMPLE_MOD}) * {_SAMPLE_MULT}) % {_SAMPLE_MOD})::BIGINT AS h,
         len(regexp_extract_all(text, '\\S+'))::BIGINT AS tok
  FROM documents),
r AS (
  SELECT lang, tok,
         sum(tok) OVER (PARTITION BY lang ORDER BY h, doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT lang, count(*)::BIGINT AS n_docs, sum(tok)::BIGINT AS n_tokens
FROM r WHERE cum - tok < {_BUDGET_TOKENS}
GROUP BY lang
"""


# ------------------------------------------------------- sliding window

_SLIDE_MIN = 15
_WINDOW_MIN = 60


def q_sliding_window_counts(sf_dir: str):
    """Sliding event-time window aggregate (the streaming-window custom op
    from the brief's list; Ray Data has no native windows): 60-minute
    windows sliding every 15 minutes. Each event explodes into the
    WINDOW/SLIDE = 4 windows containing it inside the batch (pure
    vectorized arithmetic on epoch microseconds), partials pre-aggregate
    per (window_start) in-batch, one small groupby finishes. Same shape at
    any scale — the explode factor is the constant 4."""
    ds = _pq(sf_dir, "events", columns=["ts", "value"])
    slide_us = _SLIDE_MIN * 60 * 1_000_000
    k = _WINDOW_MIN // _SLIDE_MIN

    def f(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (us // slide_us) * slide_us
        from scrapy_ray.pipelines.queries import _cents_np
        vc = _cents_np(t["value"].to_numpy(zero_copy_only=False))
        starts = np.concatenate([base - i * slide_us for i in range(k)])
        vals = np.tile(vc, k)
        df = pd.DataFrame({"ws": starts, "vc": vals})
        g = df.groupby("ws").agg(n=("vc", "count"), value_sum_c=("vc", "sum")).reset_index()
        return pa.table({"window_start": pa.array(g["ws"].to_numpy(), pa.int64()).cast(
                             pa.timestamp("us")),
                         "n": pa.array(g["n"].to_numpy(np.int64)),
                         "value_sum_c": pa.array(g["value_sum_c"].to_numpy(np.int64))})

    out = ds.map_batches(f, batch_format="pyarrow").groupby("window_start").aggregate(
        Sum("n", alias_name="n"), Sum("value_sum_c", alias_name="value_sum_c"))
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None), ["n", "value_sum_c"])


SQL_SLIDING = f"""
SELECT time_bucket(INTERVAL '{_SLIDE_MIN} minutes', ts)
         - (k.k * INTERVAL '{_SLIDE_MIN} minutes') AS window_start,
       count(*)::BIGINT AS n,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value_sum_c
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
GROUP BY 1
"""


# ------------------------------------------------------- text normalization

def q_normalize_text(sf_dir: str):
    """Document normalization pass (the canonical-form step before exact
    dedup): lowercase + collapse internal whitespace + trim, emitted as an
    md5 so the oracle row stays small. Pure vectorized map (pyarrow RE2
    kernels + hashlib)."""
    import hashlib

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t["text"])
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim_whitespace(s)
        hs = [hashlib.md5(x.encode()).hexdigest() for x in s.to_pylist()]
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "norm_len": pc.cast(pc.utf8_length(s), pa.int64()),
                         "norm_md5": pa.array(hs, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


SQL_NORMALIZE = """
SELECT doc_id,
       length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))::BIGINT AS norm_len,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_md5
FROM documents
"""


# ------------------------------------------------------- inverted index stats

def q_token_postings_stats(sf_dir: str):
    """Inverted-index build shape (token -> postings): per-batch partial
    (token, df, tf) after in-batch dedup of (doc, token), then one
    groupby(token) — exactly the shuffle an index build performs; emitting
    (df, tf_total, min/max doc) keeps the oracle scalar. At 100 TB the same
    pipeline writes postings lists instead of stats."""
    from ray.data.aggregate import Max, Min

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [s.split() for s in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        row = np.repeat(np.arange(len(toks)), lens)
        flat = np.concatenate([np.asarray(x, dtype=object) for x in toks]) \
            if len(toks) else np.array([], dtype=object)
        df = pd.DataFrame({"doc": ids[row], "token": flat})
        g = df.groupby(["doc", "token"]).size().reset_index(name="tf")
        p = g.groupby("token").agg(df_=("doc", "nunique"), tf=("tf", "sum"),
                                   dmin=("doc", "min"), dmax=("doc", "max")).reset_index()
        return pa.table({"token": pa.array(p["token"], pa.string()),
                         "df": pa.array(p["df_"].to_numpy(np.int64)),
                         "tf": pa.array(p["tf"].to_numpy(np.int64)),
                         "dmin": pa.array(p["dmin"].to_numpy(np.int64)),
                         "dmax": pa.array(p["dmax"].to_numpy(np.int64))})

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("token").aggregate(
        Sum("df", alias_name="df"), Sum("tf", alias_name="tf"),
        Min("dmin", alias_name="min_doc"), Max("dmax", alias_name="max_doc"))
    return _i64(pa.Table.from_pandas(out.to_pandas()).replace_schema_metadata(None),
                ["df", "tf", "min_doc", "max_doc"])


SQL_POSTINGS = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents)
SELECT token, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS tf,
       min(doc_id)::BIGINT AS min_doc, max(doc_id)::BIGINT AS max_doc
FROM tok GROUP BY token
"""


QUERIES3: dict[str, tuple] = {
    "hash_sample_events": (q_hash_sample_events, SQL_HASH_SAMPLE),
    "stratified_sample_by_lang": (q_stratified_sample_by_lang, SQL_STRATIFIED),
    "normalize_text": (q_normalize_text, SQL_NORMALIZE),
    "sliding_window_counts": (q_sliding_window_counts, SQL_SLIDING),
    "group_sample_docs": (q_group_sample_docs, SQL_GROUP_SAMPLE),
    "token_budget_sample": (q_token_budget_sample, SQL_TOKEN_BUDGET),
    "token_postings_stats": (q_token_postings_stats, SQL_POSTINGS),
    "value_quantiles": (q_value_quantiles, SQL_QUANTILES),
    "top_orders_per_segment": (q_top_orders_per_segment, SQL_GROUP_TOPK),
    "event_type_pivot": (q_event_type_pivot, SQL_PIVOT),
    "training_mix": (q_training_mix, SQL_TRAINING_MIX),
}
