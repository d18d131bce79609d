"""Web-text quality operators for LLM training-data curation (round 3 —
widens the training-data suite beyond the dedup/similarity family):

- Gopher-style repetition statistics (Rae et al. 2021 §A1.1: documents
  dominated by a few tokens / bigrams are low-quality): per-doc top-unigram
  and top-bigram fractions, fully oracle-checked against DuckDB.
- Benchmark decontamination (the n-gram-overlap check every serious LLM
  pipeline runs before training): flag corpus documents whose word-3-gram
  sets overlap a held-out "benchmark" document set above a threshold.

Both are single streaming passes with per-batch vectorized pandas/numpy
kernels and tiny/broadcast side state — no shuffle at all (the per-doc
grouping happens inside the batch because a doc's text is one row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from scrapy_ray.pipelines.queries import _pq

_R4 = 1e4


def _round4(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) * _R4 + 0.5) / _R4


# ---------------------------------------------------------------- repetition

def q_gopher_repetition(sf_dir: str):
    """Per-doc repetition stats: token count, distinct tokens, top-unigram
    count/fraction, top-bigram count/fraction. Pure map (no shuffle): each
    doc is one row, so the 'grouping' is an in-batch pandas explode +
    groupby over (row, token). Docs with <2 tokens are excluded (no bigram
    is defined), matching the SQL."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [s.split() for s in t["text"].to_pylist()]
        keep = np.array([len(ts) >= 2 for ts in toks])
        if not keep.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_distinct": pa.array([], pa.int64()),
                             "top_tok_n": pa.array([], pa.int64()),
                             "top_tok_ratio": pa.array([], pa.float64()),
                             "top_bg_n": pa.array([], pa.int64()),
                             "top_bg_ratio": pa.array([], pa.float64())})
        ids = ids[keep]
        toks = [ts for ts, k in zip(toks, keep) if k]
        lens = np.array([len(ts) for ts in toks], dtype=np.int64)
        row = np.repeat(np.arange(len(toks)), lens)
        flat = pd.Series(np.concatenate([np.asarray(ts, dtype=object) for ts in toks]))
        cnt = pd.DataFrame({"r": row, "tok": flat}).groupby(["r", "tok"]).size()
        per = cnt.groupby(level=0).agg(["max", "count"])
        top_n = per["max"].to_numpy(np.int64)
        n_distinct = per["count"].to_numpy(np.int64)
        bgs = [np.asarray([a + " " + b for a, b in zip(ts[:-1], ts[1:])], dtype=object)
               for ts in toks]
        brow = np.repeat(np.arange(len(toks)), lens - 1)
        bflat = pd.Series(np.concatenate(bgs))
        btop = (pd.DataFrame({"r": brow, "bg": bflat}).groupby(["r", "bg"]).size()
                .groupby(level=0).max().to_numpy(np.int64))
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tokens": pa.array(lens),
            "n_distinct": pa.array(n_distinct),
            "top_tok_n": pa.array(top_n),
            "top_tok_ratio": pa.array(_round4(top_n / lens), type=pa.float64()),
            "top_bg_n": pa.array(btop),
            "top_bg_ratio": pa.array(_round4(btop / (lens - 1)), type=pa.float64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


SQL_GOPHER_REPETITION = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents
  WHERE len(regexp_extract_all(text, '\\S+')) >= 2),
tok AS (
  SELECT doc_id, unnest(ts) AS tok FROM t),
cnt AS (
  SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
uni AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_distinct,
         max(c)::BIGINT AS top_tok_n
  FROM cnt GROUP BY doc_id),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS g
  FROM t),
bcnt AS (
  SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
btop AS (
  SELECT doc_id, max(c)::BIGINT AS top_bg_n FROM bcnt GROUP BY doc_id)
SELECT u.doc_id, u.n_tokens, u.n_distinct, u.top_tok_n,
       round(u.top_tok_n::DOUBLE / u.n_tokens, 4) AS top_tok_ratio,
       b.top_bg_n,
       round(b.top_bg_n::DOUBLE / (u.n_tokens - 1), 4) AS top_bg_ratio
FROM uni u JOIN btop b USING (doc_id)
"""


# ---------------------------------------------------------------- decontamination

_DECON_BENCH = 16      # doc_id < 16 plays the held-out benchmark set
_DECON_NGRAM = 3


def q_benchmark_decontaminate(sf_dir: str):
    """Benchmark decontamination: distinct word-3-gram sets per corpus doc,
    overlap against the union of the benchmark docs' 3-grams (docs with
    doc_id < 16 stand in for the eval set), overlap ratio per doc. The
    benchmark n-gram set is tiny and broadcast once via ray.put; the corpus
    side is one streaming pass. At 100 TB the same shape holds — the
    benchmark side stays small by definition."""
    import os

    import pyarrow.parquet as pq_

    bt = pq_.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"],
                        filters=[("doc_id", "<", _DECON_BENCH)])
    bench: set[str] = set()
    for s in bt["text"].to_pylist():
        ts = s.split()
        bench.update(" ".join(ts[i:i + _DECON_NGRAM])
                     for i in range(len(ts) - _DECON_NGRAM + 1))
    b_ref = ray.put(bench)

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def overlap(t: pa.Table) -> pa.Table:
        bset = ray.get(b_ref) if isinstance(b_ref, ray.ObjectRef) else b_ref
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = ids >= _DECON_BENCH
        ids = ids[keep]
        texts = [s for s, k in zip(t["text"].to_pylist(), keep) if k]
        n_sh = np.empty(len(texts), dtype=np.int64)
        n_ov = np.empty(len(texts), dtype=np.int64)
        ok = np.ones(len(texts), dtype=bool)
        for i, s in enumerate(texts):
            ts = s.split()
            gs = {" ".join(ts[j:j + _DECON_NGRAM])
                  for j in range(len(ts) - _DECON_NGRAM + 1)}
            if not gs:
                ok[i] = False
                continue
            n_sh[i] = len(gs)
            n_ov[i] = len(gs & bset)
        ids, n_sh, n_ov = ids[ok], n_sh[ok], n_ov[ok]
        return pa.table({
            "doc_id": pa.array(ids),
            "n_shingles": pa.array(n_sh),
            "n_overlap": pa.array(n_ov),
            "overlap_ratio": pa.array(_round4(n_ov / n_sh), type=pa.float64()),
        })

    return ds.map_batches(overlap, batch_format="pyarrow")


SQL_DECONTAMINATE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(ts) - {_DECON_NGRAM - 2}),
                       i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS gs
  FROM t WHERE len(ts) >= {_DECON_NGRAM}),
bench AS (
  SELECT list_distinct(flatten(list(gs))) AS bg FROM sh
  WHERE doc_id < {_DECON_BENCH})
SELECT s.doc_id,
       len(s.gs)::BIGINT AS n_shingles,
       len(list_intersect(s.gs, b.bg))::BIGINT AS n_overlap,
       round(len(list_intersect(s.gs, b.bg))::DOUBLE / len(s.gs), 4) AS overlap_ratio
FROM sh s, bench b
WHERE s.doc_id >= {_DECON_BENCH}
"""


TEXTQUAL_QUERIES: dict[str, tuple] = {
    "gopher_repetition": (q_gopher_repetition, SQL_GOPHER_REPETITION),
    "benchmark_decontaminate": (q_benchmark_decontaminate, SQL_DECONTAMINATE),
}
