"""Fifth oracle-query batch (round 3, cont.): LLM-corpus hygiene operators
— paragraph-level exact dedup with document reassembly (the Dolma/C4-style
"drop repeated paragraphs corpus-wide" pass), PII redaction (regex scrub +
per-kind counts), and a ROLLUP aggregate (distributed fine-grained cells +
driver-side rollup of the tiny cell table).

All three are oracle-checked against DuckDB on the same parquet inputs.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq

# ---------------------------------------------------------------------------
# paragraph (chunk) level exact dedup
# ---------------------------------------------------------------------------

_CHUNK_TOKENS = 8          # synthetic docs are single-line token soup; a
                           # "paragraph" is a disjoint 8-token window (the
                           # operator shape — explode -> corpus-wide
                           # keep-first -> reassemble — is what matters)
_IDX_BASE = 100_000        # rank = doc_id*_IDX_BASE + chunk_idx; docs are
                           # far below 100k chunks, doc_ids far below 9e13
_N_PARTS = 256             # salted coarse partitions (per-group dispatch over
                           # millions of tiny chunk groups is the measured
                           # hot spot — see training.py sig_bands)


def q_paragraph_dedup(sf_dir: str):
    """Corpus-wide paragraph-level exact dedup + reassembly: explode docs
    into disjoint 8-token chunks, keep only the FIRST occurrence of each
    distinct chunk (min (doc_id, chunk_idx) across the whole corpus), then
    rebuild each document from its surviving chunks in order.

    Scale shape: two hash shuffles, no driver state — (1) chunks shuffle by
    a salted chunk-hash key, keep-first resolved vectorized inside each of
    ~256 coarse partitions; (2) survivors shuffle by a coarse doc key and
    reassemble vectorized. Documents losing every chunk drop entirely
    (both sides). At 100 TB each partition holds 1/256 of distinct chunks —
    block-sized; skew on a mega-duplicated chunk is bounded because only
    (chunk, min-rank) survives the in-partition groupby.
    """
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        chunks: list[str] = []
        n_per = np.empty(len(ids), dtype=np.int64)
        for i, s in enumerate(texts):
            toks = s.split(" ")
            n = (len(toks) + _CHUNK_TOKENS - 1) // _CHUNK_TOKENS
            n_per[i] = n
            for g in range(n):
                chunks.append(" ".join(toks[g * _CHUNK_TOKENS:(g + 1) * _CHUNK_TOKENS]))
        ids_r = np.repeat(ids, n_per)
        idx_r = np.concatenate([np.arange(n) for n in n_per]) if len(ids) else np.empty(0, np.int64)
        gkey = (pl.Series(chunks).hash(seed=42).to_numpy() % _N_PARTS).astype(np.int32) \
            if chunks else np.empty(0, np.int32)
        return pa.table({
            "doc_id": pa.array(ids_r),
            "chunk_idx": pa.array(idx_r.astype(np.int64)),
            "chunk": pa.array(chunks, type=pa.string()),
            "n_chunks": pa.array(np.repeat(n_per, n_per)),
            "rnk": pa.array(ids_r * _IDX_BASE + idx_r),
            "gkey": pa.array(gkey),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.groupby("chunk")["rnk"].transform("min") == df["rnk"]
        out = df.loc[keep, ["doc_id", "chunk_idx", "chunk", "n_chunks"]].copy()
        out["dkey"] = (out["doc_id"] % _N_PARTS).astype(np.int32)
        return out

    survivors = exploded.groupby("gkey").map_groups(keep_first, batch_format="pandas")

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "chunk_idx"], kind="mergesort")
        g = df.groupby("doc_id")
        out = g.agg(dedup_text=("chunk", " ".join),
                    n_chunks=("n_chunks", "first"),
                    n_kept=("chunk", "size")).reset_index()
        return out

    out = survivors.groupby("dkey").map_groups(reassemble, batch_format="pandas")
    df = out.to_pandas()
    for c in ("doc_id", "n_chunks", "n_kept"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values("doc_id").reset_index(drop=True)


SQL_PARAGRAPH_DEDUP = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), chunks AS (
  SELECT doc_id, gs.g AS chunk_idx,
         array_to_string(ts[(gs.g*8+1):(gs.g*8+8)], ' ') AS chunk,
         CAST(ceil(len(ts)/8.0) AS BIGINT) AS n_chunks,
         doc_id*100000 + gs.g AS rnk
  FROM toks, LATERAL (
    SELECT unnest(generate_series(0, CAST(ceil(len(ts)/8.0) AS INT) - 1)) AS g
  ) gs
), keep AS (
  SELECT chunk, min(rnk) AS krnk FROM chunks GROUP BY chunk
)
SELECT c.doc_id,
       string_agg(c.chunk, ' ' ORDER BY c.chunk_idx) AS dedup_text,
       any_value(c.n_chunks) AS n_chunks,
       COUNT(*)::BIGINT AS n_kept
FROM chunks c JOIN keep k ON c.chunk = k.chunk AND c.rnk = k.krnk
GROUP BY c.doc_id
ORDER BY c.doc_id
"""

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns chosen to behave identically under Python re and DuckDB's RE2
# (ASCII classes, \b, bounded quantifiers only).
_PAT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PAT_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PAT_PHONE = r"\b\d{3}-\d{4}\b"

_RE_EMAIL = re.compile(_PAT_EMAIL)
_RE_IP = re.compile(_PAT_IP)
_RE_PHONE = re.compile(_PAT_PHONE)


def q_pii_redact(sf_dir: str):
    """PII redaction pass (the CCNet/Dolma-style scrub before training):
    mask emails, IPv4 addresses and phone-shaped numbers, emitting the
    redacted text plus per-kind match counts. The synthetic token-soup
    corpus contains no organic PII, so both sides append a deterministic
    doc_id-derived contact line first — the regexes are exercised on every
    row and the oracle replays the identical construction.

    Pure map (compiled regexes, pandas vectorized str ops) — embarrassingly
    parallel, no shuffle; the scale cost is exactly one pass over text.
    """
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def red(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype(np.int64)
        aug = (df["text"] + " contact user" + did.astype(str)
               + "@mail.example.com from 10." + (did % 200).astype(str)
               + ".3.7 call 555-" + (1000 + did % 9000).astype(str))
        n_emails = aug.str.count(_RE_EMAIL)
        s1 = aug.str.replace(_RE_EMAIL, "<EMAIL>", regex=True)
        n_ips = s1.str.count(_RE_IP)
        s2 = s1.str.replace(_RE_IP, "<IP>", regex=True)
        n_phones = s2.str.count(_RE_PHONE)
        s3 = s2.str.replace(_RE_PHONE, "<PHONE>", regex=True)
        return pd.DataFrame({
            "doc_id": did,
            "n_emails": n_emails.astype(np.int64),
            "n_ips": n_ips.astype(np.int64),
            "n_phones": n_phones.astype(np.int64),
            "redacted": s3,
        })

    df = ds.map_batches(red, batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


SQL_PII_REDACT = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@mail.example.com from 10.'
              || (doc_id % 200) || '.3.7 call 555-' || (1000 + doc_id % 9000) AS a
  FROM documents
), e AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
         regexp_replace(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s1
  FROM aug
), i AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(s1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
         regexp_replace(s1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS s2
  FROM e
)
SELECT doc_id, n_emails, n_ips,
       CAST(len(regexp_extract_all(s2, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
       regexp_replace(s2, '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
FROM i
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# ROLLUP aggregate
# ---------------------------------------------------------------------------


def q_revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(status, priority) over orders: revenue + counts at
    three granularities (cell, per-status, grand total), 'ALL' as the
    rolled-up sentinel. Scale shape: ONE distributed groupby at the finest
    granularity; coarser levels are re-aggregated driver-side from the tiny
    cell table (|statuses| x |priorities| rows) — the standard rollup
    optimization, no second pass over the fact table.
    """
    ds = _pq(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "o_orderpriority": t["o_orderpriority"],
            "pc": _cents(t["o_totalprice"]),
        }).to_pandas()
        g = (df.groupby(["o_orderstatus", "o_orderpriority"])
               .agg(n_orders=("pc", "size"), sum_price_cents=("pc", "sum"))
               .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    fine = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["o_orderstatus", "o_orderpriority"])
              .aggregate(Sum("n_orders", alias_name="n_orders"),
                         Sum("sum_price_cents", alias_name="sum_price_cents")))
    df = fine.to_pandas()   # tiny: one row per (status, priority) cell

    lvl1 = (df.groupby("o_orderstatus", as_index=False)[["n_orders", "sum_price_cents"]]
              .sum())
    lvl1["o_orderpriority"] = "ALL"
    total = pd.DataFrame({"o_orderstatus": ["ALL"], "o_orderpriority": ["ALL"],
                          "n_orders": [df["n_orders"].sum()],
                          "sum_price_cents": [df["sum_price_cents"].sum()]})
    out = pd.concat([df, lvl1, total], ignore_index=True)
    for c in ("n_orders", "sum_price_cents"):
        out[c] = out[c].astype(np.int64)
    return (out[["o_orderstatus", "o_orderpriority", "n_orders", "sum_price_cents"]]
            .sort_values(["o_orderstatus", "o_orderpriority"]).reset_index(drop=True))


SQL_REVENUE_ROLLUP = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COUNT(*)::BIGINT AS n_orders,
       SUM(CAST(round(o_totalprice*100) AS BIGINT))::BIGINT AS sum_price_cents
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------


def q_tfidf_top_terms(sf_dir: str):
    """Top-3 TF-IDF terms per document (score = tf * ln(N/df)), the
    classic retrieval / keyword-extraction kernel. Scores are quantized to
    integer micros on BOTH sides (floats never compared raw; ranking also
    uses the quantized integer, so selection can't diverge on a last-ulp
    ln() difference between numpy and DuckDB).

    Scale shape: explode -> (doc,term,tf) partials in-batch ->
    groupby(term) gives df as the group size AND attaches it to each
    posting (one shuffle, salted to ~256 coarse partitions) ->
    groupby(doc) top-3 (second shuffle, salted). No driver state; the df
    side is never materialized separately — it rides the postings.
    """
    from scrapy_ray.pipelines.queries import _nrows

    n_docs = _nrows(sf_dir, "documents")
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def postings(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        rows_doc, rows_term, rows_tf = [], [], []
        for d, s in zip(ids, texts):
            vals, counts = np.unique(s.split(" "), return_counts=True)
            rows_doc.append(np.full(len(vals), d))
            rows_term.append(vals)
            rows_tf.append(counts)
        doc = np.concatenate(rows_doc) if rows_doc else np.empty(0, np.int64)
        term = np.concatenate(rows_term) if rows_term else np.empty(0, "U1")
        tf = np.concatenate(rows_tf).astype(np.int64) if rows_tf else np.empty(0, np.int64)
        gkey = (pl.Series(term.tolist()).hash(seed=42).to_numpy() % _N_PARTS).astype(np.int32) \
            if len(term) else np.empty(0, np.int32)
        return pa.table({"doc_id": pa.array(doc), "term": pa.array(term.tolist()),
                         "tf": pa.array(tf), "gkey": pa.array(gkey)})

    post = ds.map_batches(postings, batch_format="pyarrow")

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        # postings are distinct per (doc, term), so df == term group size
        out = df[["doc_id", "term", "tf"]].copy()
        out["df"] = df.groupby("term")["term"].transform("size").astype(np.int64)
        out["dkey"] = (out["doc_id"] % _N_PARTS).astype(np.int32)
        return out

    scored = post.groupby("gkey").map_groups(attach_df, batch_format="pandas")

    def top3(df: pd.DataFrame) -> pd.DataFrame:
        s = df["tf"].to_numpy() * np.log(float(n_docs) / df["df"].to_numpy())
        # half-away-from-zero quantization (scores are >= 0 here)
        df = df.assign(score_micro=np.floor(s * 1e6 + 0.5).astype(np.int64))
        df = df.sort_values(["doc_id", "score_micro", "term"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("doc_id").head(3)[
            ["doc_id", "term", "tf", "df", "score_micro"]]

    out = scored.groupby("dkey").map_groups(top3, batch_format="pandas")
    df = out.to_pandas()
    for c in ("doc_id", "tf", "df", "score_micro"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values(["doc_id", "term"]).reset_index(drop=True)


SQL_TFIDF_TOP_TERMS = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
), dfq AS (
  SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         CAST(round(1000000.0 * tf.tf *
              ln((SELECT COUNT(*) FROM documents)::DOUBLE / dfq.df)) AS BIGINT)
           AS score_micro
  FROM tf JOIN dfq USING (term)
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score_micro DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tf, df, score_micro
FROM ranked WHERE rn <= 3
ORDER BY doc_id, term
"""

# ---------------------------------------------------------------------------
# grouped quantiles
# ---------------------------------------------------------------------------

_GQ = (0.25, 0.5, 0.9)


def q_grouped_quantiles(sf_dir: str):
    """Per-language discrete quantiles of document length — the grouped
    variant of value_quantiles (queries3.py): same histogram-merge shape,
    no global sort. map_batches emits (lang, n_chars, count) partials; one
    distributed groupby sums the cells; a per-lang map_groups over the
    TINY cell table walks the cumulative histogram to the DuckDB
    quantile_disc rank (1-based ceil(q*n)). Values stay integers end to
    end."""
    ds = _pq(sf_dir, "documents", ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"lang": t["lang"], "n_chars": t["n_chars"]}).to_pandas()
        g = df.groupby(["lang", "n_chars"]).size().rename("cnt").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    cells = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["lang", "n_chars"])
               .aggregate(Sum("cnt", alias_name="cnt")))

    def qdisc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("n_chars", kind="mergesort")
        vals = df["n_chars"].to_numpy()
        cum = df["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        rows = []
        for q in _GQ:
            rank = int(np.ceil(q * n))          # 1-based, DuckDB quantile_disc
            idx = int(np.searchsorted(cum, rank))
            rows.append({"lang": df["lang"].iloc[0], "q": q,
                         "n_chars_q": int(vals[idx])})
        return pd.DataFrame(rows)

    out = cells.groupby("lang").map_groups(qdisc, batch_format="pandas")
    df = out.to_pandas()
    df["n_chars_q"] = df["n_chars_q"].astype(np.int64)
    return df.sort_values(["lang", "q"]).reset_index(drop=True)


SQL_GROUPED_QUANTILES = """
WITH g AS (
  SELECT lang,
         quantile_disc(n_chars, 0.25)::BIGINT AS q25,
         quantile_disc(n_chars, 0.5)::BIGINT  AS q50,
         quantile_disc(n_chars, 0.9)::BIGINT  AS q90
  FROM documents GROUP BY lang
)
SELECT lang, CAST(0.25 AS DOUBLE) AS q, q25 AS n_chars_q FROM g
UNION ALL SELECT lang, CAST(0.5 AS DOUBLE), q50 FROM g
UNION ALL SELECT lang, CAST(0.9 AS DOUBLE), q90 FROM g
ORDER BY lang, q
"""


# ---------------------------------------------------------------------------
# edit-distance nearest neighbor (within-language blocking)
# ---------------------------------------------------------------------------

_ED_PREFIX = 32     # compare 32-char prefixes (docs are all longer)
_ED_STRIDE = 10     # bounded oracle subset: doc_id % 10 == 0 (all-pairs
                    # within a language is quadratic BY DEFINITION — like
                    # token_jaccard_pairs, the subset makes the exact oracle
                    # feasible; LSH/SimHash are this repo's scale paths)


def _lev_block(prefixes: list[str]) -> np.ndarray:
    """All-pairs Levenshtein over one blocking group, DP vectorized ACROSS
    pairs (numpy row sweep: 2*L^2 vector ops total, no per-pair loop).
    Returns a condensed (n*(n-1)/2,) distance array in triu order."""
    n = len(prefixes)
    L = _ED_PREFIX
    codes = np.zeros((n, L), dtype=np.int32)
    lens = np.empty(n, dtype=np.int32)
    for i, s in enumerate(prefixes):
        b = [ord(c) for c in s[:L]]
        lens[i] = len(b)
        codes[i, :len(b)] = b
    ii, jj = np.triu_indices(n, k=1)
    A, B = codes[ii], codes[jj]
    P = len(ii)
    prev = np.tile(np.arange(L + 1, dtype=np.int32), (P, 1))
    full = np.empty((P,), dtype=np.int32)
    # all prefixes are full-length on this corpus (min doc length > 32);
    # guard anyway: variable-length pairs take a scalar fallback below
    uniform = bool((lens == L).all())
    for i in range(1, L + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (A[:, i - 1][:, None] != B).astype(np.int32)
        ins_del = prev[:, 1:] + 1
        for j in range(1, L + 1):
            cur[:, j] = np.minimum(np.minimum(ins_del[:, j - 1], cur[:, j - 1] + 1),
                                   sub[:, j - 1])
        prev = cur
    full = prev[:, L]
    if not uniform:
        for k in range(P):
            la, lb = int(lens[ii[k]]), int(lens[jj[k]])
            if la == L and lb == L:
                continue
            a, b = prefixes[ii[k]][:la], prefixes[jj[k]][:lb]
            d = list(range(lb + 1))
            for x in range(1, la + 1):
                nd = [x] + [0] * lb
                for y in range(1, lb + 1):
                    nd[y] = min(d[y] + 1, nd[y - 1] + 1,
                                d[y - 1] + (a[x - 1] != b[y - 1]))
                d = nd
            full[k] = d[lb]
    return full


def q_edit_distance_nn(sf_dir: str):
    """Edit-distance nearest neighbor per document (within-language
    blocking): for each sampled doc, the same-language doc whose 32-char
    prefix has the smallest Levenshtein distance (ties -> smallest
    doc_id). A fuzzy-dedup modality the MinHash/SimHash family can't
    express (character-level edits, not token overlap).

    Scale shape: blocking key (lang) bounds each group; the all-pairs DP
    inside a block is vectorized across pairs. Like token_jaccard_pairs,
    the oracle subset (doc_id % 10 == 0) keeps the exact quadratic oracle
    feasible — at scale the same blocking runs per LSH bucket instead of
    per language."""
    ds = _pq(sf_dir, "documents", ["doc_id", "lang", "text"])

    def sample(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(ids % _ED_STRIDE == 0))
        pref = pa.array([s[:_ED_PREFIX] for s in t["text"].to_pylist()])
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"], "p": pref})

    def nn_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n < 2:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "nn_doc_id": pd.Series(dtype=np.int64),
                                 "dist": pd.Series(dtype=np.int64)})
        dist = _lev_block(df["p"].tolist())
        ids = df["doc_id"].to_numpy().astype(np.int64)
        ii, jj = np.triu_indices(n, k=1)
        # symmetric NN, vectorized: mirror the condensed pairs, lexsort by
        # (row, dist, neighbor id), take the first entry per row
        rows = np.concatenate([ii, jj])
        nbrs = np.concatenate([jj, ii])
        d2 = np.concatenate([dist, dist]).astype(np.int64)
        order = np.lexsort((ids[nbrs], d2, rows))
        rows_s = rows[order]
        first = np.empty(len(rows_s), dtype=bool)
        first[0] = True
        first[1:] = rows_s[1:] != rows_s[:-1]
        sel = order[first]
        return pd.DataFrame({"doc_id": ids[rows[sel]],
                             "nn_doc_id": ids[nbrs[sel]],
                             "dist": d2[sel]})

    out = (ds.map_batches(sample, batch_format="pyarrow")
             .groupby("lang").map_groups(nn_block, batch_format="pandas"))
    df = out.to_pandas()
    for c in ("doc_id", "nn_doc_id", "dist"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values("doc_id").reset_index(drop=True)


SQL_EDIT_DISTANCE_NN = """
WITH s AS (
  SELECT doc_id, lang, substr(text, 1, 32) AS p
  FROM documents WHERE doc_id % 10 = 0
), pairs AS (
  SELECT a.doc_id AS doc_id, b.doc_id AS nn_doc_id,
         levenshtein(a.p, b.p)::BIGINT AS dist
  FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id <> b.doc_id
), r AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY dist, nn_doc_id) AS rn
  FROM pairs
)
SELECT doc_id, nn_doc_id, dist FROM r WHERE rn = 1 ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

_WS_K = 20
_WS_MULT = 2654435761
_WS_MOD = 4294967296        # 2^32; pre-reduce before multiplying so the
                            # product fits uint64 exactly (same latent-
                            # overflow discipline as hash_sample_events)


def q_weighted_sample_docs(sf_dir: str):
    """Deterministic weighted sampling WITHOUT replacement (data-mixing
    primitive): the Efraimidis–Spirakis exponential trick with a hash in
    place of the RNG — key = -ln(u)/w with u derived from a multiplicative
    hash of doc_id and w = n_chars; the K smallest keys are the sample.
    Longer documents are proportionally more likely to be picked, and the
    result is identical on any partitioning.

    Scale shape: per-batch partial top-K on the key, then a final top-K
    over the tiny partials (K rows per batch) — same partial/final shape
    as ann_cosine_topk; the full corpus is never sorted. Keys are float64
    but derive from integer hashes spread over [0,1) — cross-engine
    ln() last-ulp noise cannot reorder keys that differ by >=1e-9."""
    ds = _pq(sf_dir, "documents", ["doc_id", "n_chars"])

    def _keys(ids: np.ndarray, w: np.ndarray) -> np.ndarray:
        h = ((ids.astype(np.uint64) % np.uint64(_WS_MOD)) * np.uint64(_WS_MULT)) \
            % np.uint64(_WS_MOD)
        u = (h.astype(np.float64) + 1.0) / float(_WS_MOD)
        return -np.log(u) / w.astype(np.float64)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = _keys(ids, w)
        order = np.lexsort((ids, key))[:_WS_K]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "n_chars": pa.array(w[order]),
                         "key": pa.array(key[order])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    order = np.lexsort((parts["doc_id"].to_numpy(), parts["key"].to_numpy()))[:_WS_K]
    out = parts.iloc[order][["doc_id", "n_chars"]].reset_index(drop=True)
    for c in ("doc_id", "n_chars"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_WEIGHTED_SAMPLE = f"""
WITH k AS (
  SELECT doc_id, n_chars,
         -ln(((((doc_id::UBIGINT % {_WS_MOD}) * {_WS_MULT}) % {_WS_MOD})::DOUBLE + 1.0)
             / {_WS_MOD}) / n_chars AS key
  FROM documents
)
SELECT doc_id, n_chars FROM k
ORDER BY key, doc_id LIMIT {_WS_K}
"""


# ---------------------------------------------------------------------------
# iterative PageRank (integer fixed-point)
# ---------------------------------------------------------------------------

_PR_ITERS = 3
_PR_DEG = 3          # synthetic out-degree (edges derived from doc_id — the
                     # corpus tables carry no edge list; the derivation is
                     # replayed identically in the oracle)
_PR_SCALE = 1_000_000


def q_pagerank_docs(sf_dir: str):
    """Iterative PageRank over a deterministic doc-id-derived link graph
    (each doc links to (doc_id*31+c) mod N for c in 1..3) — the one
    operator category the rest of the suite doesn't cover: an ITERATIVE
    distributed computation, one hash shuffle per iteration (contribution
    scatter -> groupby(dst) sum), exactly the BSP PageRank shape.

    Everything is integer fixed-point (ranks in micros, damping as
    *85 // 100, contributions as rank // outdeg), so numpy and DuckDB
    agree bit-for-bit — no float summation-order divergence. Every node
    also emits a zero self-contribution so rank mass lands on nodes with
    no in-links without a union against the node list."""
    from scrapy_ray.pipelines.queries import _nrows

    n = _nrows(sf_dir, "documents")

    def init(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(ids),
                         "pr": pa.array(np.full(len(ids), _PR_SCALE, np.int64))})

    ranks = _pq(sf_dir, "documents", ["doc_id"]).map_batches(
        init, batch_format="pyarrow")

    def contribs(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        pr = t["pr"].to_numpy(zero_copy_only=False).astype(np.int64)
        share = pr // _PR_DEG
        dsts = [(node * 31 + c) % n for c in range(1, _PR_DEG + 1)]
        return pa.table({
            "node": pa.array(np.concatenate(dsts + [node])),
            "contrib": pa.array(np.concatenate(
                [share] * _PR_DEG + [np.zeros(len(node), np.int64)])),
        })

    def damp(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": t["node"],
                         "pr": pa.array(150_000 + (s * 85) // 100)})

    for _ in range(_PR_ITERS):
        ranks = (ranks.map_batches(contribs, batch_format="pyarrow")
                      .groupby("node").aggregate(Sum("contrib", alias_name="s"))
                      .map_batches(damp, batch_format="pyarrow"))

    df = ranks.to_pandas().rename(columns={"node": "doc_id"})
    for c in ("doc_id", "pr"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values("doc_id").reset_index(drop=True)


def _pr_sql() -> str:
    head = f"""
WITH r0 AS (
  SELECT doc_id AS node, {_PR_SCALE}::BIGINT AS pr FROM documents
), e AS (
  SELECT doc_id AS src,
         (doc_id*31 + c.c) % (SELECT COUNT(*) FROM documents) AS dst
  FROM documents, (SELECT unnest([1, 2, 3]) AS c) c
)"""
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(f""", s{i} AS (
  SELECT node, SUM(contrib)::BIGINT AS s FROM (
    SELECT e.dst AS node, r{i-1}.pr // {_PR_DEG} AS contrib
    FROM e JOIN r{i-1} ON e.src = r{i-1}.node
    UNION ALL SELECT node, 0 FROM r{i-1}
  ) GROUP BY node
), r{i} AS (
  SELECT node, 150000 + (s * 85) // 100 AS pr FROM s{i}
)""")
    return (head + "".join(steps) +
            f"\nSELECT node AS doc_id, pr FROM r{_PR_ITERS} ORDER BY doc_id")


SQL_PAGERANK = _pr_sql()


QUERIES5 = {
    "paragraph_dedup": (q_paragraph_dedup, SQL_PARAGRAPH_DEDUP),
    "pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "revenue_rollup": (q_revenue_rollup, SQL_REVENUE_ROLLUP),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    "grouped_quantiles": (q_grouped_quantiles, SQL_GROUPED_QUANTILES),
    "edit_distance_nn": (q_edit_distance_nn, SQL_EDIT_DISTANCE_NN),
    "weighted_sample_docs": (q_weighted_sample_docs, SQL_WEIGHTED_SAMPLE),
    "pagerank_docs": (q_pagerank_docs, SQL_PAGERANK),
}
