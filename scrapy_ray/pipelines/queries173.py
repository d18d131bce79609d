"""One-hundred-seventy-third oracle-query batch — corpus-similarity /
dictionary-compression IR kernels over the documents table:

- corpus_bleu2_sources: corpus-level BLEU-2 of source src1 against
  src0 as reference — modified (clipped) unigram and bigram
  precisions Σmin(c_cand, c_ref)/Σc_cand on exact integer counts,
  with the corpus brevity penalty exp(1 − r/c); finalizes through
  one identical float expression (the MT-eval metric as a
  distributed count join).
- multi_pattern_match_top8: total non-overlapping substring
  occurrences and containing-doc counts of the 8 globally
  most-frequent words, scanned as raw patterns over every document
  (two-pass: distributed top-k vocabulary, then a broadcast pattern
  scan; Python str.count and SQL replace()-length division share
  the greedy left-to-right non-overlap semantics).
- front_coding_bigrams: the dictionary-compression audit — sorted
  distinct corpus bigrams front-coded against their predecessor;
  Σ adjacent-LCP bytes saved vs raw dictionary bytes (the classic
  term-dictionary layout every search engine ships).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_REF, _CAND = "src0", "src1"


def _doc_tokens(t: pa.Table):
    ids = t["source"].to_pylist() if "source" in t.schema.names \
        else [None] * t.num_rows
    for src, txt in zip(ids, t["text"].to_pylist()):
        yield src, txt.split()


# ---------------------------------------------------------------------------
# Corpus BLEU-2
# ---------------------------------------------------------------------------


def q_corpus_bleu2_sources(sf_dir: str):
    """Clipped-precision corpus BLEU-2, src1 vs src0 (docstring)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def grams(t: pa.Table) -> pa.Table:
        rows: dict[tuple, list] = {}
        for src, ws in _doc_tokens(t):
            if src not in (_REF, _CAND):
                continue
            side = 1 if src == _CAND else 0
            for w in ws:
                k = ("u", w)
                cell = rows.setdefault(k, [0, 0])
                cell[side] += 1
            for w1, w2 in zip(ws[:-1], ws[1:]):
                k = ("b", w1 + " " + w2)
                cell = rows.setdefault(k, [0, 0])
                cell[side] += 1
        return pa.table({
            "kind": pa.array([k[0] for k in rows], pa.string()),
            "g": pa.array([k[1] for k in rows], pa.string()),
            "c0": pa.array([v[0] for v in rows.values()], pa.int64()),
            "c1": pa.array([v[1] for v in rows.values()], pa.int64()),
        })

    agg = (ds.map_batches(grams, batch_format="pyarrow")
             .groupby(["kind", "g"])
             .aggregate(Sum("c0", alias_name="c0"),
                        Sum("c1", alias_name="c1"))
             .to_pandas())
    stats = {}
    for kind, grp in agg.groupby("kind"):
        c0 = grp["c0"].to_numpy(np.int64)
        c1 = grp["c1"].to_numpy(np.int64)
        stats[kind] = (int(np.minimum(c0, c1).sum()), int(c1.sum()),
                       int(c0.sum()))
    clip1, c_tok, r_tok = stats["u"]
    clip2, cb, _ = stats["b"]
    p1 = float(clip1) / float(c_tok)
    p2 = float(clip2) / float(cb)
    bp = 1.0 if c_tok >= r_tok \
        else math.exp(1.0 - float(r_tok) / float(c_tok))
    bleu = bp * math.exp(0.5 * (math.log(p1) + math.log(p2)))
    r6 = _round6(np.array([p1, p2, bleu]))
    out = pd.DataFrame({"c_tokens": [c_tok], "r_tokens": [r_tok],
                        "p1_6": [r6[0]], "p2_6": [r6[1]],
                        "bleu2_6": [r6[2]]})
    for col in ("c_tokens", "r_tokens"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BLEU2 = rf"""
WITH d2 AS (
  SELECT source, regexp_extract_all(text, '\S+') AS tk
  FROM documents WHERE source IN ('{_REF}', '{_CAND}')),
ug AS (
  SELECT t.t AS g,
         sum((source = '{_REF}')::INT)::BIGINT AS c0,
         sum((source = '{_CAND}')::INT)::BIGINT AS c1
  FROM d2, LATERAL unnest(tk) AS t(t) GROUP BY 1),
bg AS (
  SELECT b.b AS g,
         sum((source = '{_REF}')::INT)::BIGINT AS c0,
         sum((source = '{_CAND}')::INT)::BIGINT AS c1
  FROM d2,
       LATERAL unnest([tk[kk] || ' ' || tk[kk + 1]
                       FOR kk IN range(1, len(tk))]) AS b(b)
  GROUP BY 1),
s AS (
  SELECT (SELECT sum(least(c0, c1)) FROM ug)::BIGINT AS clip1,
         (SELECT sum(c1) FROM ug)::BIGINT AS c_tok,
         (SELECT sum(c0) FROM ug)::BIGINT AS r_tok,
         (SELECT sum(least(c0, c1)) FROM bg)::BIGINT AS clip2,
         (SELECT sum(c1) FROM bg)::BIGINT AS cb),
f AS (
  SELECT c_tok, r_tok,
         CAST(clip1 AS DOUBLE) / CAST(c_tok AS DOUBLE) AS p1,
         CAST(clip2 AS DOUBLE) / CAST(cb AS DOUBLE) AS p2,
         CASE WHEN c_tok >= r_tok THEN 1e0
              ELSE exp(1e0 - CAST(r_tok AS DOUBLE)
                       / CAST(c_tok AS DOUBLE)) END AS bp
  FROM s)
SELECT c_tok AS c_tokens, r_tok AS r_tokens,
       round(p1, 6) AS p1_6, round(p2, 6) AS p2_6,
       round(bp * exp(5e-1 * (ln(p1) + ln(p2))), 6) AS bleu2_6
FROM f
"""


# ---------------------------------------------------------------------------
# Multi-pattern substring counts
# ---------------------------------------------------------------------------


def q_multi_pattern_match_top8(sf_dir: str):
    """Occurrences of the top-8 words as substrings (docstring)."""
    ds1 = _pq(sf_dir, "documents", columns=["text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for _, ws in _doc_tokens(t):
            for w in ws:
                cnt[w] = cnt.get(w, 0) + 1
        return pa.table({"w": pa.array(list(cnt), pa.string()),
                         "c": pa.array(list(cnt.values()),
                                       pa.int64())})

    vocab = (ds1.map_batches(tok_counts, batch_format="pyarrow")
                .groupby("w").aggregate(Sum("c", alias_name="c"))
                .to_pandas())
    vocab = vocab.sort_values(["c", "w"],
                              ascending=[False, True]).head(8)
    pats = vocab["w"].tolist()

    ds2 = _pq(sf_dir, "documents", columns=["text"])

    def scan(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        occ = []
        docs = []
        for p in pats:
            o = 0
            d = 0
            for txt in texts:
                c = txt.count(p)
                o += c
                d += 1 if c else 0
            occ.append(o)
            docs.append(d)
        return pa.table({"pattern": pa.array(pats, pa.string()),
                         "occ": pa.array(occ, pa.int64()),
                         "docs": pa.array(docs, pa.int64())})

    out = (ds2.map_batches(scan, batch_format="pyarrow")
              .groupby("pattern")
              .aggregate(Sum("occ", alias_name="total_occ"),
                         Sum("docs", alias_name="n_docs"))
              .to_pandas().sort_values("pattern")
              .reset_index(drop=True))
    for col in ("total_occ", "n_docs"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MULTI_PATTERN = r"""
WITH tc AS (
  SELECT t.t AS w, count(*)::BIGINT AS c
  FROM documents,
       LATERAL unnest(regexp_extract_all(text, '\S+')) AS t(t)
  GROUP BY 1),
top8 AS (SELECT w FROM tc ORDER BY c DESC, w LIMIT 8)
SELECT t8.w AS pattern,
       sum((length(text) - length(replace(text, t8.w, '')))
           // length(t8.w))::BIGINT AS total_occ,
       sum((position(t8.w IN text) > 0)::INT)::BIGINT AS n_docs
FROM documents, top8 t8
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Front coding of the bigram dictionary
# ---------------------------------------------------------------------------


def q_front_coding_bigrams(sf_dir: str):
    """Σ adjacent-LCP savings over the sorted bigram dictionary."""
    ds = _pq(sf_dir, "documents", columns=["text"])

    def bigrams(t: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for _, ws in _doc_tokens(t):
            for w1, w2 in zip(ws[:-1], ws[1:]):
                seen.add(w1 + " " + w2)
        return pa.table({"g": pa.array(sorted(seen), pa.string())})

    terms = sorted(set(
        ds.map_batches(bigrams, batch_format="pyarrow")
          .unique("g")))
    raw = sum(len(g) for g in terms)
    saved = 0
    for prev, cur in zip(terms[:-1], terms[1:]):
        k = 0
        m = min(len(prev), len(cur))
        while k < m and prev[k] == cur[k]:
            k += 1
        saved += k
    r6 = _round6(np.array([float(saved) / float(raw)]))
    out = pd.DataFrame({"n_terms": [len(terms)],
                        "raw_bytes": [raw], "saved_bytes": [saved],
                        "ratio6": [r6[0]]})
    for col in ("n_terms", "raw_bytes", "saved_bytes"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_FRONT_CODING = r"""
WITH d2 AS (SELECT regexp_extract_all(text, '\S+') AS tk
            FROM documents),
bgd AS (
  SELECT DISTINCT b.b AS g
  FROM d2,
       LATERAL unnest([tk[kk] || ' ' || tk[kk + 1]
                       FOR kk IN range(1, len(tk))]) AS b(b)),
o AS (SELECT g, lag(g) OVER (ORDER BY g) AS pg FROM bgd),
l AS (
  SELECT length(g)::BIGINT AS lg,
         CASE WHEN pg IS NULL THEN 0 ELSE
           coalesce(list_sum(
             [1 FOR k IN range(1, least(length(pg),
                                        length(g)) + 1)
              IF substring(pg, 1, k) = substring(g, 1, k)]), 0)
         END::BIGINT AS lcp
  FROM o)
SELECT count(*)::BIGINT AS n_terms, sum(lg)::BIGINT AS raw_bytes,
       sum(lcp)::BIGINT AS saved_bytes,
       round(CAST(sum(lcp) AS DOUBLE)
             / CAST(sum(lg) AS DOUBLE), 6) AS ratio6
FROM l
"""


QUERIES173: dict[str, tuple] = {
    "corpus_bleu2_sources": (q_corpus_bleu2_sources, SQL_BLEU2),
    "multi_pattern_match_top8": (q_multi_pattern_match_top8,
                                 SQL_MULTI_PATTERN),
    "front_coding_bigrams": (q_front_coding_bigrams,
                             SQL_FRONT_CODING),
}
