"""Eighth oracle-query batch (round 3 tail): language-model scoring,
grouped exact count-distinct, native anti-join, and distributed BPE
tokenizer training —

- bigram LM cross-entropy per document (the CCNet/Wenzek et al. perplexity
  quality-filter shape): the LM is trained distributed from exact integer
  bigram counts and the score finalized in float64 via the identical
  expression on both sides;
- grouped exact COUNT(DISTINCT): the two-level aggregate (partial in-batch
  dedup -> user-co-partitioned exact dedup -> tiny per-type cells);
- customers-without-orders via Ray Data's native ``left_anti`` hash join
  (the generic distributed anti-join; the engine's J4 and the coded-Bloom
  semi-joins are this repo's optimized special cases);
- BPE merge-table training (Sennrich et al.): corpus -> word-frequency
  table once, then one pair-count shuffle + distributed argmax per merge —
  the tokenizer-training primitive of an LLM data pipeline (rows-only;
  pinned against a single-process reference BPE in pytest).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from scrapy_ray.functions.hashing import hash64
from scrapy_ray.pipelines.queries import _cents, _pq

_P = 64


def _round6(x: np.ndarray | pd.Series) -> np.ndarray:
    # half-away-from-zero at 6 dp — DuckDB's round()
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


# ---------------------------------------------------------------------------
# grouped exact count-distinct
# ---------------------------------------------------------------------------


def q_distinct_users_per_type(sf_dir: str):
    """Exact per-type distinct-user counts (grouped COUNT(DISTINCT)) plus
    total event counts in the same pass. Two-level shape: in-batch dedup
    shrinks the shuffle to O(cells) rows each carrying its event
    multiplicity, ONE user-co-partitioned salted groupby finishes the
    global (type, user) dedup and emits per-partition (type, n_users,
    n_events) partials, and the driver sums the tiny O(P x types) cell
    table. The full user set never assembles in one place — each partition
    holds only its user residue class."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pylist(),
        })
        g = (df.groupby(["user_id", "event_type"], sort=False)
               .size().reset_index(name="ev"))
        g["gkey"] = (g["user_id"] % _P).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        cell = (df.groupby(["event_type", "user_id"], sort=False)["ev"]
                  .sum().reset_index())
        out = cell.groupby("event_type", sort=False).agg(
            n_users=("user_id", "size"), n_events=("ev", "sum")).reset_index()
        return out

    parts = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("gkey").map_groups(per_partition, batch_format="pandas")
               .to_pandas())
    out = parts.groupby("event_type", sort=True).sum().reset_index()
    for c in ("n_users", "n_events"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_DISTINCT_USERS = """
SELECT event_type,
       count(DISTINCT user_id)::BIGINT AS n_users,
       count(*)::BIGINT AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# bigram LM cross-entropy (perplexity quality scoring)
# ---------------------------------------------------------------------------


def q_bigram_cross_entropy(sf_dir: str):
    """Per-document bigram-LM cross-entropy in bits/token — the
    perplexity-based quality score of CCNet-style corpus filtering, with
    the LM trained ON the corpus itself (MLE, so every probability is
    positive by construction and no smoothing constant has to be mirrored).

    Distributed shape: ONE shuffle keyed by hash(w1) co-locates every
    bigram sharing a context word, so the context count C(w1) AND the
    bigram count C(w1,w2) are both computed inside the same partition —
    the same ride-the-shuffle trick as q_tfidf_top_terms' df. Each
    (doc, w1, w2) cell then computes its addend
    ``mult * (log2(C1) - log2(C12))`` there, and a second O(cells)
    shuffle keyed by doc_id sums addends per document.

    Float discipline (CLAUDE rule): counts are exact int64 end to end;
    the addend multiset is IDENTICAL on both sides (per (doc,w1,w2) cell,
    same expression on the same integers), only the summation order is
    engine-chosen — the entropy-query caveat, bounded ~1e-13 against a
    0.5e-6 rounding boundary."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def emit_bigrams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        did_l, w1_l, w2_l = [], [], []
        for did, txt in zip(ids, t["text"].to_pylist()):
            ws = txt.split()
            if len(ws) < 2:
                continue
            did_l.append(np.full(len(ws) - 1, did, dtype=np.int64))
            w1_l.extend(ws[:-1])
            w2_l.extend(ws[1:])
        if not did_l:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "mult": pa.array([], pa.int64()),
                             "gkey": pa.array([], pa.int32())})
        df = pd.DataFrame({"doc_id": np.concatenate(did_l),
                           "w1": w1_l, "w2": w2_l})
        g = (df.groupby(["doc_id", "w1", "w2"], sort=False)
               .size().reset_index(name="mult"))
        g["gkey"] = (hash64(g["w1"].to_numpy()) % _P).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def score_cells(df: pd.DataFrame) -> pd.DataFrame:
        # all rows sharing w1 are here: C1 and C12 are GLOBAL counts
        c12 = df.groupby(["w1", "w2"], sort=False)["mult"].transform("sum")
        c1 = df.groupby("w1", sort=False)["mult"].transform("sum")
        mult = df["mult"].to_numpy(dtype=np.int64)
        addend = mult.astype(np.float64) * (
            np.log2(c1.to_numpy(dtype=np.float64))
            - np.log2(c12.to_numpy(dtype=np.float64)))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "mult": mult,
            "addend": addend,
            "gkey": (df["doc_id"].to_numpy(dtype=np.int64) % _P
                     ).astype(np.int32),
        })

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False).agg(
            n_bigrams=("mult", "sum"), s=("addend", "sum")).reset_index()
        g["xent6"] = _round6(g["s"] / g["n_bigrams"])
        return g[["doc_id", "n_bigrams", "xent6"]]

    out = (ds.map_batches(emit_bigrams, batch_format="pyarrow")
             .groupby("gkey").map_groups(score_cells, batch_format="pandas")
             .groupby("gkey").map_groups(finalize, batch_format="pandas")
             .to_pandas())
    for c in ("doc_id", "n_bigrams"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


# identical integer counts, identical per-cell float expression, identical
# rounding; docs with <2 tokens drop out of both sides by construction
SQL_BIGRAM_XENT = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents
),
bg AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts))) AS i) r(i)
  WHERE len(ts) >= 2
),
dbg AS (
  SELECT doc_id, w1, w2, count(*)::BIGINT AS mult FROM bg GROUP BY 1, 2, 3
),
c12 AS (SELECT w1, w2, sum(mult)::BIGINT AS c12 FROM dbg GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY 1)
SELECT d.doc_id::BIGINT AS doc_id,
       sum(d.mult)::BIGINT AS n_bigrams,
       round(sum(d.mult::DOUBLE * (log2(c1.c1::DOUBLE) - log2(c12.c12::DOUBLE)))
             / sum(d.mult), 6) AS xent6
FROM dbg d
JOIN c12 ON c12.w1 = d.w1 AND c12.w2 = d.w2
JOIN c1 ON c1.w1 = d.w1
GROUP BY d.doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# native distributed anti-join
# ---------------------------------------------------------------------------


def q_native_anti_join_customers(sf_dir: str):
    """Customers with no URGENT order via Ray Data's native ``left_anti``
    hash join — the fully-distributed anti-join that works when NEITHER
    side fits a broadcast (queries2's ``customers_without_orders`` is the
    broadcast-key-set variant of the same relational op; the engine-side
    twin is J4, candidate links ANTI-JOIN url-seen shards). Keyed on
    '1-URGENT' because in this testdata every customer has SOME order at
    every sf — the urgency predicate keeps the result non-empty. The
    build side is pre-shrunk to in-batch-deduped custkeys so the shuffle
    carries O(distinct keys), not O(orders). num_partitions=8 per the
    measured native-join sweet spot (queries4.py: aggregator actors
    oversubscribe at 32)."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def dedup_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        k = np.unique(t["o_custkey"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({"o_custkey": pa.array(k, pa.int64())})

    def prep_cust(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "c_name": t["c_name"],
            "acctbal_cents": _cents(t["c_acctbal"]),
        })

    joined = (cust.map_batches(prep_cust, batch_format="pyarrow")
                  .join(orders.map_batches(dedup_keys, batch_format="pyarrow"),
                        join_type="left_anti", num_partitions=8,
                        on=("c_custkey",), right_on=("o_custkey",)))
    parts = list(joined.iter_batches(batch_size=None, batch_format="pyarrow"))
    schema = pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                        ("acctbal_cents", pa.int64())])
    t = (pa.concat_tables([p.select(schema.names).cast(schema) for p in parts])
         if parts else schema.empty_table())
    out = t.to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


SQL_CUST_NO_ORDERS = """
SELECT c_custkey::BIGINT AS c_custkey, c_name,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# distributed BPE tokenizer training
# ---------------------------------------------------------------------------

_BPE_MERGES = 12
_BPE_CACHE: dict[str, "pd.DataFrame"] = {}


def _word_counts_ds(sf_dir: str):
    """documents -> (word, n) frequency table with initial char symbol
    lists — the ONE corpus-scale pass; every merge iteration afterwards
    runs over this compressed table (O(distinct words), the classic BPE
    economics)."""
    import ray.data  # noqa: F401  (Dataset ops below)

    ds = _pq(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            c.update(txt.split())
        words = list(c.keys())
        return pa.table({
            "word": pa.array(words, pa.string()),
            "n": pa.array([c[w] for w in words], pa.int64()),
            "gkey": pa.array((hash64(words) % _P).astype(np.int32))
            if words else pa.array([], pa.int32()),
        })

    def merge_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", sort=False)["n"].sum().reset_index()
        g["syms"] = [list(w) for w in g["word"]]
        return g[["word", "n", "syms"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("gkey").map_groups(merge_counts, batch_format="pandas"))


def _pair_partials(t: pa.Table) -> pa.Table:
    """Adjacent-symbol pair counts weighted by word frequency, aggregated
    in-batch so the shuffle carries O(distinct pairs) partials."""
    from collections import Counter
    c: Counter = Counter()
    ns = t["n"].to_numpy(zero_copy_only=False)
    for syms, n in zip(t["syms"].to_pylist(), ns):
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += int(n)
    if not c:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64()),
                         "gkey": pa.array([], pa.int32())})
    ka = [k[0] for k in c]
    kb = [k[1] for k in c]
    key = [a + "\x00" + b for a, b in zip(ka, kb)]
    return pa.table({"a": pa.array(ka, pa.string()),
                     "b": pa.array(kb, pa.string()),
                     "c": pa.array(list(c.values()), pa.int64()),
                     "gkey": pa.array((hash64(key) % _P).astype(np.int32))})


def _partition_argmax(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby(["a", "b"], sort=False)["c"].sum().reset_index()
    g = g.sort_values(["c", "a", "b"], ascending=[False, True, True],
                      kind="mergesort")
    return g.head(1)


def q_bpe_train_merges(sf_dir: str):
    """Distributed BPE tokenizer training (Sennrich et al. 2016): learn the
    first 12 merge rules over the corpus vocabulary. The corpus is read
    ONCE into a word-frequency table (the compressed representation BPE
    iterates on); each merge is one pair-count shuffle — in-batch Counter
    partials, salted groupby sum, per-partition argmax, driver argmax over
    <= 64 candidate rows (a distributed argmax, same shape as pagerank's
    per-iteration reduction) — followed by a vectorless but
    word-table-local merge-apply map. The word table is materialized per
    iteration so lineage doesn't replay the whole chain. Tie-break:
    (count desc, left asc, right asc) — pinned against a single-process
    reference BPE in tests/test_queries8.py. Rows-only (SQL cannot rewrite
    symbol sequences); the merge table itself is the deliverable.

    Results memoize per sf_dir (training is deterministic), so the encode
    query reuses the merge table instead of re-running 12 shuffles."""
    hit = _BPE_CACHE.get(sf_dir)
    if hit is not None:
        return hit.copy()
    words = _word_counts_ds(sf_dir).materialize()

    steps, lefts, rights, counts = [], [], [], []
    for step in range(_BPE_MERGES):
        cand = (words.map_batches(_pair_partials, batch_format="pyarrow")
                     .groupby("gkey").map_groups(_partition_argmax,
                                                 batch_format="pandas")
                     .to_pandas())
        if len(cand) == 0:
            break
        cand = cand.sort_values(["c", "a", "b"],
                                ascending=[False, True, True],
                                kind="mergesort")
        a, b, c = (cand.iloc[0]["a"], cand.iloc[0]["b"],
                   int(cand.iloc[0]["c"]))

        def apply_merge(t: pa.Table, a=a, b=b) -> pa.Table:
            merged = a + b
            out = []
            for syms in t["syms"].to_pylist():
                i, res = 0, []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            return pa.table({"word": t["word"], "n": t["n"],
                             "syms": pa.array(out, pa.list_(pa.string()))})

        words = words.map_batches(apply_merge,
                                  batch_format="pyarrow").materialize()
        steps.append(step)
        lefts.append(a)
        rights.append(b)
        counts.append(c)

    out = pd.DataFrame({
        "step": pd.Series(steps, dtype=np.int64),
        "left": lefts, "right": rights,
        "merged": [l + r for l, r in zip(lefts, rights)],
        "pair_count": pd.Series(counts, dtype=np.int64),
    })
    _BPE_CACHE[sf_dir] = out
    return out.copy()


# ---------------------------------------------------------------------------
# retention cohorts
# ---------------------------------------------------------------------------


def q_retention_cohorts(sf_dir: str):
    """Weekly retention-cohort matrix: users grouped by their first-activity
    week (cohort), counted at each later week they return — the classic
    growth-analytics triangle (funnel chains stages, sessionize cuts gaps;
    a cohort matrix pivots users on their own start time). ONE
    user-co-partitioned pass computes each user's cohort AND offsets
    together (the per-user min never leaves the partition that owns the
    user); the driver sums tiny O(weeks^2) cells. Week = epoch-day // 7 on
    exact integer microseconds — mirrored in SQL as epoch_us // 86400e6 // 7."""
    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        wk = (us // 86_400_000_000) // 7
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "wk": wk,
        }).drop_duplicates()
        df["gkey"] = (df["user_id"] % _P).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def cohort_cells(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "wk"])
        cw = df.groupby("user_id", sort=False)["wk"].transform("min")
        cells = pd.DataFrame({"cohort_week": cw, "offset_weeks": df["wk"] - cw})
        out = (cells.groupby(["cohort_week", "offset_weeks"], sort=False)
                    .size().reset_index(name="n_users"))
        return out

    parts = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("gkey").map_groups(cohort_cells, batch_format="pandas")
               .to_pandas())
    out = (parts.groupby(["cohort_week", "offset_weeks"], sort=True)["n_users"]
                .sum().reset_index())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


SQL_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) // 86400000000) // 7 AS wk
  FROM events
),
c AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY 1)
SELECT c.cw::BIGINT AS cohort_week,
       (uw.wk - c.cw)::BIGINT AS offset_weeks,
       count(*)::BIGINT AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# DSIR-style importance weights (data-mixing / reweighting)
# ---------------------------------------------------------------------------


def q_dsir_importance(sf_dir: str):
    """Per-document importance weight for target-distribution resampling
    (the DSIR shape, Xie et al. 2023: weight = mean log-likelihood ratio of
    the doc's unigrams under a target LM vs the raw LM; here target =
    lang='en' docs, raw = the whole corpus, add-1 smoothing over the raw
    vocabulary). DSIR hashes unigrams into fixed buckets purely to bound
    the count table — the bucketed variant is this exact pipeline with
    word -> hash64(word) % B; exact words keep the query SQL-replayable.

    One corpus read, two shuffles: the hash(w1)-keyed shuffle computes the
    per-word target/raw counts AND each (doc, word) cell's addend in the
    same partition (counts ride the shuffle), plus one sentinel row per
    partition carrying (V, Tt, Tr) partials — the global scalars arrive
    with the data instead of a second corpus pass. The doc-keyed shuffle
    sums addends; the driver folds in the scalar constant and rounds.
    Float discipline: identical addend multiset both sides, identical
    final expression on identical integers, round6 half-away."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text", "lang"])

    def emit_cells(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = t["lang"].to_pylist()
        did_l, w_l, tgt_l = [], [], []
        for did, lang, txt in zip(ids, langs, t["text"].to_pylist()):
            ws = txt.split()
            if not ws:
                continue
            did_l.append(np.full(len(ws), did, dtype=np.int64))
            w_l.extend(ws)
            tgt_l.append(np.full(len(ws), 1 if lang == "en" else 0,
                                 dtype=np.int64))
        if not did_l:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "word": pa.array([], pa.string()),
                             "mult": pa.array([], pa.int64()),
                             "tgt": pa.array([], pa.int64()),
                             "gkey": pa.array([], pa.int32())})
        df = pd.DataFrame({"doc_id": np.concatenate(did_l), "word": w_l,
                           "tgt": np.concatenate(tgt_l)})
        g = (df.groupby(["doc_id", "word", "tgt"], sort=False)
               .size().reset_index(name="mult"))
        g["gkey"] = (hash64(g["word"].to_numpy()) % _P).astype(np.int32)
        return pa.Table.from_pandas(
            g[["doc_id", "word", "mult", "tgt", "gkey"]],
            preserve_index=False).replace_schema_metadata(None)

    def word_partition(df: pd.DataFrame) -> pd.DataFrame:
        # this partition owns its words globally (hash-partitioned by word)
        ct = (df["mult"] * df["tgt"]).groupby(df["word"]).transform("sum")
        cr = df.groupby("word", sort=False)["mult"].transform("sum")
        mult = df["mult"].to_numpy(dtype=np.int64)
        addend = mult.astype(np.float64) * (
            np.log2(ct.to_numpy(dtype=np.float64) + 1.0)
            - np.log2(cr.to_numpy(dtype=np.float64) + 1.0))
        cells = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "mult": mult, "addend": addend,
            "v": np.zeros(len(df), dtype=np.int64),
            "st": np.zeros(len(df), dtype=np.int64),
            "sr": np.zeros(len(df), dtype=np.int64),
        })
        # sentinel: this partition's scalar partials (V, Tt, Tr)
        per_word = df.groupby("word", sort=False)["mult"].sum()
        sent = pd.DataFrame({
            "doc_id": [np.int64(-1)], "mult": [np.int64(0)],
            "addend": [0.0],
            "v": [np.int64(len(per_word))],
            "st": [np.int64((df["mult"] * df["tgt"]).sum())],
            "sr": [np.int64(df["mult"].sum())],
        })
        out = pd.concat([cells, sent], ignore_index=True)
        out["gkey"] = (out["doc_id"].to_numpy() % _P).astype(np.int32)
        return out

    def doc_partials(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False).agg(
            n_tokens=("mult", "sum"), s=("addend", "sum"),
            v=("v", "sum"), st=("st", "sum"), sr=("sr", "sum")).reset_index()
        return g

    parts = (ds.map_batches(emit_cells, batch_format="pyarrow")
               .groupby("gkey").map_groups(word_partition, batch_format="pandas")
               .groupby("gkey").map_groups(doc_partials, batch_format="pandas")
               .to_pandas())
    sent = parts[parts["doc_id"] < 0]
    v, tt, tr = (float(sent["v"].sum()), float(sent["st"].sum()),
                 float(sent["sr"].sum()))
    const = np.log2(tt + v) - np.log2(tr + v)
    out = parts[parts["doc_id"] >= 0].copy()
    out["dsir6"] = _round6(out["s"] / out["n_tokens"] - const)
    for c in ("doc_id", "n_tokens"):
        out[c] = out[c].astype(np.int64)
    return (out[["doc_id", "n_tokens", "dsir6"]]
            .sort_values("doc_id").reset_index(drop=True))


SQL_DSIR = """
WITH toks AS (
  SELECT doc_id, lang, regexp_extract_all(text, '\\S+') AS ts FROM documents
),
w AS (SELECT doc_id, lang, unnest(ts) AS word FROM toks),
cell AS (
  SELECT doc_id, word, count(*)::BIGINT AS mult,
         max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS tgt
  FROM w GROUP BY 1, 2
),
wc AS (
  SELECT word, sum(mult)::BIGINT AS cr, sum(mult * tgt)::BIGINT AS ct
  FROM cell GROUP BY 1
),
scal AS (
  SELECT count(*)::BIGINT AS v, sum(cr)::BIGINT AS tr, sum(ct)::BIGINT AS tt
  FROM wc
)
SELECT c.doc_id::BIGINT AS doc_id, sum(c.mult)::BIGINT AS n_tokens,
       round(sum(c.mult::DOUBLE * (log2((wc.ct + 1)::DOUBLE)
                                   - log2((wc.cr + 1)::DOUBLE)))
             / sum(c.mult)
             - (log2((s.tt + s.v)::DOUBLE) - log2((s.tr + s.v)::DOUBLE)),
             6) AS dsir6
FROM cell c JOIN wc USING (word) CROSS JOIN scal s
GROUP BY c.doc_id, s.tt, s.tr, s.v ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# BPE encode (apply trained merges to the corpus)
# ---------------------------------------------------------------------------


def bpe_encode_word(word: str, ranks: dict) -> list[str]:
    """Standard rank-greedy BPE encode of one word: repeatedly merge the
    adjacent pair with the lowest merge rank until none applies."""
    syms = list(word)
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_i < 0:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def q_bpe_encode_tokens(sf_dir: str):
    """Tokenize the corpus with the trained BPE merge table — the APPLY
    half of tokenizer training (the model-broadcast pattern: train once,
    ``ray.put`` the tiny rank table, every encode task reads the same
    copy; per-batch word memoization keeps the hot path off repeat words).
    Output is per-document token counts before/after BPE plus the
    compression ratio. Rows-only: SQL cannot replay sequence rewriting —
    pinned against a reference encode in tests/test_queries8.py."""
    import ray

    merges = q_bpe_train_merges(sf_dir)
    ranks = {(l, r): i for i, (l, r) in
             enumerate(zip(merges["left"], merges["right"]))}
    ranks_ref = ray.put(ranks)

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def encode(t: pa.Table) -> pa.Table:
        rk = ray.get(ranks_ref) if isinstance(ranks_ref, ray.ObjectRef) \
            else ranks_ref
        memo: dict[str, int] = {}
        ids, n_words, n_bpe = [], [], []
        for did, txt in zip(
                t["doc_id"].to_numpy(zero_copy_only=False), t["text"].to_pylist()):
            ws = txt.split()
            tot = 0
            for w in ws:
                k = memo.get(w)
                if k is None:
                    k = memo[w] = len(bpe_encode_word(w, rk))
                tot += k
            ids.append(int(did))
            n_words.append(len(ws))
            n_bpe.append(tot)
        nw = np.asarray(n_words, dtype=np.int64)
        nb = np.asarray(n_bpe, dtype=np.int64)
        ratio = np.divide(nb, nw, out=np.zeros_like(nb, dtype=np.float64),
                          where=nw > 0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(nw),
            "n_bpe_tokens": pa.array(nb),
            "bpe_ratio6": pa.array(_round6(ratio)),
        })

    out = ds.map_batches(encode, batch_format="pyarrow").to_pandas()
    for c in ("doc_id", "n_words", "n_bpe_tokens"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# ---------------------------------------------------------------------------


def q_event_transitions(sf_dir: str):
    """Global Markov transition matrix of event types: order each user's
    events by (ts, event_id) — the deterministic total order both sides
    share — and count (prev_type -> next_type) transitions, finalizing
    row-normalized probabilities. The sequence-analytics primitive under
    next-event prediction and behavior modeling (funnel matches one fixed
    pattern; this counts ALL adjacent pairs). One user-co-partitioned
    shuffle; in-partition sort + vectorized shift recovers each user's
    chain; the driver sums the tiny O(types^2) matrix. Probabilities are
    finalized from exact integer counts via the identical expression both
    sides, round6."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % _P).astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        pairs = pd.DataFrame({"prev_type": et[:-1][same],
                              "next_type": et[1:][same]})
        return (pairs.groupby(["prev_type", "next_type"], sort=False)
                     .size().reset_index(name="n"))

    parts = (ds.map_batches(with_key, batch_format="pyarrow")
               .groupby("gkey").map_groups(transitions, batch_format="pandas")
               .to_pandas())
    out = (parts.groupby(["prev_type", "next_type"], sort=True)["n"]
                .sum().reset_index())
    row_tot = out.groupby("prev_type")["n"].transform("sum")
    out["p6"] = _round6(out["n"].astype(np.float64)
                        / row_tot.astype(np.float64))
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


SQL_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
c AS (
  SELECT event_type AS prev_type, next_type, count(*)::BIGINT AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       round(n::DOUBLE / sum(n) OVER (PARTITION BY prev_type), 6) AS p6
FROM c ORDER BY prev_type, next_type
"""


# ---------------------------------------------------------------------------
# grouped OLS trend (linear regression from exact integer moments)
# ---------------------------------------------------------------------------


def q_ols_trend_by_type(sf_dir: str):
    """Per-event-type OLS fit of value (exact cents) against time (epoch
    day) — 'is this metric trending, and how fast', the regression member
    of the moment-aggregate family (corr gives direction strength; OLS
    gives slope + intercept in units). Same discipline as
    q_corr_price_day: int64 moment partials (n, Sx, Sy, Sxy, Sxx)
    accumulate in map_batches — day ~2e4 and cents ~1e4 keep every sum
    far under 2^63 — and slope/intercept are finalized in float64 from
    identical integers via the identical expression both sides, round6."""
    ds = _pq(sf_dir, "events", ["event_type", "value", "ts"])

    def moments(t: pa.Table) -> pa.Table:
        x = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 86_400_000_000)
        y = _cents(t["value"]).to_numpy()
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "n": 1, "sx": x, "sy": y, "sxy": x * y,
                           "sxx": x * x})
        g = df.groupby("event_type", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=True).sum().reset_index()
        n = g["n"].astype(np.float64)
        sx = g["sx"].astype(np.float64)
        sy = g["sy"].astype(np.float64)
        sxy = g["sxy"].astype(np.float64)
        sxx = g["sxx"].astype(np.float64)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return pd.DataFrame({
            "event_type": g["event_type"],
            "n_events": g["n"].astype(np.int64),
            "slope6": _round6(slope),
            "intercept6": _round6(intercept),
        })

    out = (ds.map_batches(moments, batch_format="pyarrow")
             .groupby("event_type").map_groups(finalize,
                                               batch_format="pandas")
             .to_pandas())
    out["n_events"] = out["n_events"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_OLS = """
WITH m AS (
  SELECT event_type,
         count(*)::BIGINT AS n,
         sum(epoch_us(ts) // 86400000000)::BIGINT AS sx,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sy,
         sum((epoch_us(ts) // 86400000000)
             * CAST(round(value * 100) AS BIGINT))::BIGINT AS sxy,
         sum((epoch_us(ts) // 86400000000)
             * (epoch_us(ts) // 86400000000))::BIGINT AS sxx
  FROM events GROUP BY 1
)
SELECT event_type, n AS n_events,
       round((n::DOUBLE * sxy - sx::DOUBLE * sy)
             / (n::DOUBLE * sxx - sx::DOUBLE * sx), 6) AS slope6,
       round((sy::DOUBLE - ((n::DOUBLE * sxy - sx::DOUBLE * sy)
                            / (n::DOUBLE * sxx - sx::DOUBLE * sx))
                           * sx::DOUBLE) / n::DOUBLE, 6) AS intercept6
FROM m ORDER BY event_type
"""


QUERIES8: dict[str, tuple] = {
    "distinct_users_per_type": (q_distinct_users_per_type, SQL_DISTINCT_USERS),
    "bigram_cross_entropy": (q_bigram_cross_entropy, SQL_BIGRAM_XENT),
    "native_anti_join_customers": (q_native_anti_join_customers, SQL_CUST_NO_ORDERS),
    "bpe_train_merges": (q_bpe_train_merges, None),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION),
    "dsir_importance": (q_dsir_importance, SQL_DSIR),
    "bpe_encode_tokens": (q_bpe_encode_tokens, None),
    "event_transitions": (q_event_transitions, SQL_TRANSITIONS),
    "ols_trend_by_type": (q_ols_trend_by_type, SQL_OLS),
}
