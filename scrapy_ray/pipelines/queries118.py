"""One-hundred-eighteenth oracle-query batch — information-retrieval
scoring over the documents table:

- dirichlet_lm_topk: query-likelihood retrieval with Dirichlet
  smoothing (mu=300). The query is data-derived: the 3 most frequent
  corpus words (count desc, word asc). Per (doc, word) log term
  ln((tf + mu*cf/C)/(dl + mu)) is 1e-9-quantized, the doc score is
  the exact int sum, top-10 by (score desc, doc_id asc).
- rake_keywords: RAKE keyword extraction with a data-derived stopword
  list (the top-2 corpus words). Candidate phrases are maximal
  stopword-free runs; word score = degree/freq over all phrase
  occurrences (exact int ratio, 1e-6-quantized once); phrase score =
  exact sum of member-word quantized scores; top-10 phrases by
  (score desc, phrase asc).
- err_by_source: Expected Reciprocal Rank @10 per source with the
  ndcg_by_source relevance device (rel = doc_id % 4, ranking by
  n_chars desc, doc_id). The cascade products stay EXACT integers:
  R_r = N_r/16 with N_r = 2^rel - 1, and the prefix product of
  (16 - N_i) factors is reconstructed from window counts of each
  factor value (9/13/15/16) via integer-valued double powers
  (< 2^53, exact); per-rank terms are 1e-9-quantized before the sum.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_DLM_MU = 300.0
_ERR_K = 10


def _corpus_word_counts(sf_dir: str) -> pd.DataFrame:
    ds = _pq(sf_dir, "documents", columns=["text"])

    def wpart(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            c.update(txt.split())
        df = pd.DataFrame({"w": list(c.keys()),
                           "cf": np.array(list(c.values()), np.int64)})
        return _strip(df)

    return (ds.map_batches(wpart, batch_format="pyarrow")
              .groupby("w").aggregate(Sum("cf", alias_name="cf"))
              .to_pandas())


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query likelihood
# ---------------------------------------------------------------------------


def q_dirichlet_lm_topk(sf_dir: str):
    """Top-10 docs by Dirichlet query likelihood (docstring above)."""
    cw = _corpus_word_counts(sf_dir)
    ctot = int(cw["cf"].sum())
    cw = cw.sort_values(["cf", "w"], ascending=[False, True],
                        kind="mergesort").head(3)
    qws = list(cw["w"])
    cfs = {w: int(c) for w, c in zip(cw["w"], cw["cf"])}

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def spart(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = []
        for did, txt in zip(ids, t["text"].to_pylist()):
            toks = txt.split()
            dl = len(toks)
            c = Counter(toks)
            sq = 0
            for w in qws:
                term = np.log((float(c.get(w, 0))
                               + _DLM_MU * float(cfs[w]) / float(ctot))
                              / (float(dl) + _DLM_MU))
                sq += int(np.sign(term)
                          * np.floor(abs(term) * 1e9 + 0.5))
            rows.append((int(did), sq))
        rows.sort(key=lambda x: (-x[1], x[0]))
        top = rows[:10]
        return pa.table({"doc_id": pa.array([x[0] for x in top],
                                            pa.int64()),
                         "sq": pa.array([x[1] for x in top],
                                        pa.int64())})

    parts = ds.map_batches(spart, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["sq", "doc_id"], ascending=[False, True],
                              kind="mergesort").head(10)
    out = pd.DataFrame({
        "doc_id": parts["doc_id"].astype(np.int64).to_numpy(),
        "sq": parts["sq"].astype(np.int64).to_numpy()})
    out["score6"] = _round6(out["sq"].to_numpy(np.float64) / 1e9)
    return out.reset_index(drop=True)


SQL_DIRICHLET_LM = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents),
cw AS (SELECT w, count(*)::BIGINT AS cf FROM tok GROUP BY 1),
ctot AS (SELECT sum(cf)::BIGINT AS c FROM cw),
qw AS (SELECT w, cf FROM cw ORDER BY cf DESC, w LIMIT 3),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
tf AS (
  SELECT t.doc_id, t.w, count(*)::BIGINT AS tf
  FROM tok t JOIN qw USING (w) GROUP BY 1, 2),
sc AS (
  SELECT dl.doc_id,
         sum(CAST(round(ln((CAST(coalesce(tf.tf, 0) AS DOUBLE)
                            + 300.0 * CAST(qw.cf AS DOUBLE)
                              / CAST(ctot.c AS DOUBLE))
                           / (CAST(dl.dl AS DOUBLE) + 300.0))
                        * 1000000000.0) AS BIGINT))::BIGINT AS sq
  FROM dl CROSS JOIN qw CROSS JOIN ctot
  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.w = qw.w
  GROUP BY 1)
SELECT doc_id, sq,
       round(CAST(sq AS DOUBLE) / 1000000000.0, 6) AS score6
FROM sc ORDER BY sq DESC, doc_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# RAKE keywords
# ---------------------------------------------------------------------------


def q_rake_keywords(sf_dir: str):
    """Top-10 RAKE phrases (docstring above)."""
    cw = _corpus_word_counts(sf_dir)
    stops = set(cw.sort_values(["cf", "w"], ascending=[False, True],
                               kind="mergesort").head(2)["w"])

    def doc_phrases(txt: str) -> list[list[str]]:
        phrases, cur = [], []
        for w in txt.split():
            if w in stops:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
        return phrases

    ds = _pq(sf_dir, "documents", columns=["text"])

    def wstat(t: pa.Table) -> pa.Table:
        freq: Counter = Counter()
        deg: Counter = Counter()
        for txt in t["text"].to_pylist():
            for ph in doc_phrases(txt):
                for w in ph:
                    freq[w] += 1
                    deg[w] += len(ph)
        ws = sorted(freq)
        return pa.table({"w": pa.array(ws, pa.string()),
                         "freq": pa.array([freq[w] for w in ws],
                                          pa.int64()),
                         "deg": pa.array([deg[w] for w in ws],
                                         pa.int64())})

    wdf = (ds.map_batches(wstat, batch_format="pyarrow")
             .groupby("w").aggregate(Sum("freq", alias_name="freq"),
                                     Sum("deg", alias_name="deg"))
             .to_pandas())
    score = {w: int(np.floor(float(int(d)) / float(int(f)) * 1e6 + 0.5))
             for w, f, d in zip(wdf["w"], wdf["freq"], wdf["deg"])}

    ds2 = _pq(sf_dir, "documents", columns=["text"])

    def pscore(t: pa.Table) -> pa.Table:
        cells: Counter = Counter()
        sq: dict[str, int] = {}
        for txt in t["text"].to_pylist():
            for ph in doc_phrases(txt):
                key = " ".join(ph)
                cells[key] += 1
                if key not in sq:
                    sq[key] = sum(score[w] for w in ph)
        ks = sorted(cells)
        return pa.table({"phrase": pa.array(ks, pa.string()),
                         "occ": pa.array([cells[k] for k in ks],
                                         pa.int64()),
                         "sq": pa.array([sq[k] for k in ks], pa.int64())})

    pdf = (ds2.map_batches(pscore, batch_format="pyarrow")
              .groupby("phrase")
              .aggregate(Sum("occ", alias_name="occ"),
                         Sum("sq", alias_name="sqs"))
              .to_pandas())
    # sq is identical across occurrences of the same phrase — groupby
    # summed it once per PARTIAL cell, so recompute the canonical value
    # driver-side from the phrase string itself (cheap, <= vocab^runs)
    pdf["sq"] = [sum(score[w] for w in p.split())
                 for p in pdf["phrase"]]
    pdf = pdf.sort_values(["sq", "phrase"], ascending=[False, True],
                          kind="mergesort").head(10)
    out = pd.DataFrame({"phrase": pdf["phrase"].to_numpy(),
                        "occ": pdf["occ"].astype(np.int64).to_numpy(),
                        "sq": pdf["sq"].astype(np.int64).to_numpy()})
    out["score6"] = _round6(out["sq"].to_numpy(np.float64) / 1e6)
    return out.reset_index(drop=True)


SQL_RAKE = """
WITH tok AS (
  SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
  FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws
        FROM documents)),
stop AS (
  SELECT w FROM (SELECT w, count(*) AS c FROM tok GROUP BY 1
                 ORDER BY c DESC, w LIMIT 2)),
nst AS (
  SELECT doc_id, pos, w,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS isl
  FROM tok WHERE w NOT IN (SELECT w FROM stop)),
ph AS (
  SELECT doc_id, isl, count(*)::BIGINT AS plen,
         string_agg(w, ' ' ORDER BY pos) AS phrase
  FROM nst GROUP BY 1, 2),
wstat AS (
  SELECT n.w, count(*)::BIGINT AS freq, sum(ph.plen)::BIGINT AS deg
  FROM nst n JOIN ph USING (doc_id, isl) GROUP BY 1),
wq AS (
  SELECT w, CAST(round(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)
                       * 1000000.0) AS BIGINT) AS sq
  FROM wstat),
ps AS (
  SELECT n.doc_id, n.isl, ph.phrase, sum(wq.sq)::BIGINT AS sq
  FROM nst n JOIN wq USING (w) JOIN ph USING (doc_id, isl)
  GROUP BY 1, 2, 3),
agg AS (
  SELECT phrase, count(*)::BIGINT AS occ, min(sq)::BIGINT AS sq
  FROM ps GROUP BY 1)
SELECT phrase, occ, sq,
       round(CAST(sq AS DOUBLE) / 1000000.0, 6) AS score6
FROM agg ORDER BY sq DESC, phrase LIMIT 10
"""


# ---------------------------------------------------------------------------
# Expected Reciprocal Rank
# ---------------------------------------------------------------------------


def q_err_by_source(sf_dir: str):
    """ERR@10 per source, exact cascade products (docstring above)."""
    ds = _pq(sf_dir, "documents",
             columns=["doc_id", "source", "n_chars"])

    def topp(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(
                               zero_copy_only=False).astype(np.int64),
                           "source": np.asarray(t["source"].to_pylist()),
                           "n_chars": t["n_chars"].to_numpy(
                               zero_copy_only=False).astype(np.int64)})
        top = (df.sort_values(["source", "n_chars", "doc_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
               .groupby("source", sort=False).head(_ERR_K))
        return _strip(top)

    parts = ds.map_batches(topp, batch_format="pyarrow").to_pandas()
    rows = []
    for src in sorted(parts["source"].unique()):
        t = (parts[parts["source"] == src]
             .sort_values(["n_chars", "doc_id"],
                          ascending=[False, True], kind="mergesort")
             .head(_ERR_K))
        rel = (t["doc_id"].to_numpy(np.int64) % 4)
        nr = (2 ** rel - 1).astype(np.int64)
        errq = 0
        prod = 1  # exact prefix product of (16 - N_i)
        for r, n in enumerate(nr, start=1):
            term = (float(int(n) * prod)
                    / (float(r) * float(16 ** r)))
            errq += int(np.floor(term * 1e9 + 0.5))
            prod *= 16 - int(n)
        rows.append((src, len(t), errq))
    out = pd.DataFrame(rows, columns=["source", "n_ranked", "errq"])
    out["err6"] = _round6(out["errq"].to_numpy(np.float64) / 1e9)
    for col in ("n_ranked", "errq"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


SQL_ERR = f"""
WITH rk AS (
  SELECT source, doc_id,
         CAST(pow(2.0, doc_id % 4) AS BIGINT) - 1 AS n_r,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS r
  FROM documents),
w AS (SELECT source, r, n_r, 16 - n_r AS m_r FROM rk
      WHERE r <= {_ERR_K}),
cnt AS (
  SELECT source, r, n_r,
         coalesce(sum((m_r = 9)::INT) OVER (PARTITION BY source
           ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS a,
         coalesce(sum((m_r = 13)::INT) OVER (PARTITION BY source
           ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS b,
         coalesce(sum((m_r = 15)::INT) OVER (PARTITION BY source
           ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS c,
         coalesce(sum((m_r = 16)::INT) OVER (PARTITION BY source
           ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS d
  FROM w),
term AS (
  SELECT source, r,
         CAST(round(CAST(n_r * CAST(round(pow(9.0, a) * pow(13.0, b)
                                          * pow(15.0, c) * pow(16.0, d))
                                    AS BIGINT) AS DOUBLE)
                    / (CAST(r AS DOUBLE) * pow(16.0, r))
                    * 1000000000.0) AS BIGINT) AS tq
  FROM cnt)
SELECT source, count(*)::BIGINT AS n_ranked, sum(tq)::BIGINT AS errq,
       round(CAST(sum(tq) AS DOUBLE) / 1000000000.0, 6) AS err6
FROM term GROUP BY 1 ORDER BY source
"""


QUERIES118: dict[str, tuple] = {
    "dirichlet_lm_topk": (q_dirichlet_lm_topk, SQL_DIRICHLET_LM),
    "rake_keywords": (q_rake_keywords, SQL_RAKE),
    "err_by_source": (q_err_by_source, SQL_ERR),
}
