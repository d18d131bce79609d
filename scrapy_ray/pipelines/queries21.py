"""Twenty-first oracle-query batch — two training-corpus analytics ops:

- pmi_top_collocations: pointwise mutual information over the bigram
  distribution restricted to the exact top-K vocabulary — the classic
  collocation-mining pass (Church & Hanks). Two bounded shuffles: a
  wordcount groupby (O(vocab) cells, partial-top-K merged exactly on the
  already-aggregated disjoint cells) and a bigram-cell groupby bounded by
  O(K²); marginals and the total come from the tiny cell table itself, so
  the PMI is self-consistent on the restricted sub-distribution (stated,
  and replayed identically in SQL).
- train_valid_test_split: deterministic 80/10/10 corpus split via a
  mirrored multiplicative hash of doc_id — the data-mixing primitive every
  training pipeline needs; ONE scan, O(splits × langs) cells, per-split
  doc and char counts; disjointness and totality hold by construction
  (each doc lands in exactly one bucket).

Float finalization (the PMI log) uses identical expressions + round6
half-away both sides; everything else is exact int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6

_PMI_K = 48          # top-K vocabulary (exact, count-desc then word-asc)
_PMI_MIN = 3         # report pairs with c12 >= 3

_TVT_MOD = 4294967296
_TVT_MULT = 2654435761


def _get(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


# ---------------------------------------------------------------------------
# PMI collocations over the top-K vocabulary
# ---------------------------------------------------------------------------


def q_pmi_top_collocations(sf_dir: str):
    """Top-K-vocabulary PMI collocations. Pass 1 is the canonical
    wordcount (per-batch partial counts -> groupby(word) -> exact top-K
    by (count desc, word asc), merged from per-block partial top-Ks of
    the ALREADY-AGGREGATED disjoint cells — exact, no full sort). Pass 2
    emits bigram cells only when BOTH words are in the broadcast top-K
    set — the shuffle is bounded by O(K²) regardless of corpus size.
    PMI = ln(c12 * T / (c1 * c2)) over the restricted bigram
    sub-distribution (marginals from the cell table itself)."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for s in t["text"].to_pylist():
            toks.extend(s.split())
        if not toks:
            return pa.table({"w": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        w, n = np.unique(np.asarray(toks), return_counts=True)
        return pa.table({"w": pa.array(w, pa.string()),
                         "n": pa.array(n.astype(np.int64))})

    ucnt = (ds.map_batches(uni_partial, batch_format="pyarrow")
              .groupby("w").aggregate(Sum("n", alias_name="n")))

    def top_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"w": t["w"].to_pylist(),
                           "n": t["n"].to_numpy(zero_copy_only=False)
                           .astype(np.int64)})
        df = df.sort_values(["n", "w"], ascending=[False, True])
        return pa.Table.from_pandas(df.head(_PMI_K), preserve_index=False) \
            .replace_schema_metadata(None)

    parts = (ucnt.map_batches(top_partial, batch_format="pyarrow")
                 .to_pandas()
                 .sort_values(["n", "w"], ascending=[False, True])
                 .head(_PMI_K))
    top = np.sort(np.asarray(parts["w"].to_list()))
    _EMPTY = pd.DataFrame({"w1": pd.Series([], dtype=object),
                           "w2": pd.Series([], dtype=object),
                           "c12": pd.Series([], dtype=np.int64),
                           "c1": pd.Series([], dtype=np.int64),
                           "c2": pd.Series([], dtype=np.int64),
                           "pmi6": pd.Series([], dtype=np.float64)})
    if len(top) == 0:
        return _EMPTY
    top_ref = ray.put(top)

    _EMPTY_BG = {"w1": pa.array([], pa.string()),
                 "w2": pa.array([], pa.string()),
                 "c12": pa.array([], pa.int64())}

    def bg_partial(t: pa.Table) -> pa.Table:
        tk = _get(top_ref)
        w1_l: list[str] = []
        w2_l: list[str] = []
        for s in t["text"].to_pylist():
            ts = s.split()
            if len(ts) >= 2:
                w1_l.extend(ts[:-1])
                w2_l.extend(ts[1:])
        if not w1_l:
            return pa.table(_EMPTY_BG)
        w1 = np.asarray(w1_l)
        w2 = np.asarray(w2_l)
        p1 = np.searchsorted(tk, w1)
        p2 = np.searchsorted(tk, w2)
        keep = ((p1 < len(tk)) & (tk[np.minimum(p1, len(tk) - 1)] == w1)
                & (p2 < len(tk)) & (tk[np.minimum(p2, len(tk) - 1)] == w2))
        if not keep.any():
            return pa.table(_EMPTY_BG)
        # count pairs vectorized on the top-K index grid (K² cells max)
        code = p1[keep] * len(tk) + p2[keep]
        uc, cnt = np.unique(code, return_counts=True)
        return pa.table({"w1": pa.array(tk[uc // len(tk)], pa.string()),
                         "w2": pa.array(tk[uc % len(tk)], pa.string()),
                         "c12": pa.array(cnt.astype(np.int64))})

    cells = (ds.map_batches(bg_partial, batch_format="pyarrow")
               .groupby(["w1", "w2"]).aggregate(Sum("c12", alias_name="c12"))
               .to_pandas())
    if len(cells) == 0:
        return _EMPTY
    c12 = cells["c12"].to_numpy().astype(np.int64)
    T = int(c12.sum())
    c1 = cells.groupby("w1")["c12"].transform("sum").to_numpy().astype(np.int64)
    c2 = cells.groupby("w2")["c12"].transform("sum").to_numpy().astype(np.int64)
    pmi6 = _round6(np.log((c12.astype(np.float64) * T)
                          / (c1.astype(np.float64) * c2)))
    out = pd.DataFrame({"w1": cells["w1"], "w2": cells["w2"],
                        "c12": c12, "c1": c1, "c2": c2, "pmi6": pmi6})
    out = out[out["c12"] >= _PMI_MIN]
    return out.sort_values(["w1", "w2"]).reset_index(drop=True)


SQL_PMI = f"""
WITH toks AS (
  SELECT regexp_extract_all(text, '\\S+') AS ts FROM documents),
ucnt AS (
  SELECT w, count(*)::BIGINT AS n
  FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY 1),
topk AS (SELECT w FROM ucnt ORDER BY n DESC, w LIMIT {_PMI_K}),
bg AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts))) AS i) r(i)
  WHERE len(ts) >= 2),
c12t AS (
  SELECT w1, w2, count(*)::BIGINT AS c12
  FROM bg
  WHERE w1 IN (SELECT w FROM topk) AND w2 IN (SELECT w FROM topk)
  GROUP BY 1, 2),
m AS (SELECT sum(c12)::BIGINT AS t FROM c12t),
lm AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM c12t GROUP BY 1),
rm AS (SELECT w2, sum(c12)::BIGINT AS c2 FROM c12t GROUP BY 1)
SELECT c12t.w1, c12t.w2, c12, c1, c2,
       round(ln(c12::DOUBLE * t / (c1::DOUBLE * c2)), 6) AS pmi6
FROM c12t JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN m
WHERE c12 >= {_PMI_MIN}
ORDER BY w1, w2
"""


# ---------------------------------------------------------------------------
# deterministic train/valid/test split
# ---------------------------------------------------------------------------


def q_train_valid_test_split(sf_dir: str):
    """Deterministic 80/10/10 corpus split: bucket = mirrored
    multiplicative hash of doc_id mod 10 (train < 8, valid = 8, test = 9)
    — every doc lands in exactly one split on any partitioning. ONE scan
    emitting per-batch (split, lang) partial doc/char counts; the shuffle
    is O(splits × langs) cells."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    names = np.array(["train", "valid", "test"], dtype=object)

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids % np.uint64(_TVT_MOD)) * np.uint64(_TVT_MULT)) \
            % np.uint64(_TVT_MOD)
        bucket = (h % np.uint64(10)).astype(np.int64)
        split = names[np.where(bucket < 8, 0, np.where(bucket == 8, 1, 2))]
        df = pd.DataFrame({
            "split": split,
            "lang": np.asarray(t["lang"].to_pylist(), dtype=object),
            "n_docs": np.ones(len(ids), np.int64),
            "n_chars": t["n_chars"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        g = df.groupby(["split", "lang"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["split", "lang"])
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("n_chars", alias_name="n_chars"))
             .to_pandas().sort_values(["split", "lang"])
             .reset_index(drop=True))
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out


SQL_TVT_SPLIT = f"""
WITH b AS (
  SELECT CASE
           WHEN ((doc_id::UBIGINT % {_TVT_MOD}) * {_TVT_MULT}::UBIGINT)
                % {_TVT_MOD} % 10 < 8 THEN 'train'
           WHEN ((doc_id::UBIGINT % {_TVT_MOD}) * {_TVT_MULT}::UBIGINT)
                % {_TVT_MOD} % 10 = 8 THEN 'valid'
           ELSE 'test' END AS split,
         lang, n_chars
  FROM documents)
SELECT split, lang, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS n_chars
FROM b GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES21: dict[str, tuple] = {
    "pmi_top_collocations": (q_pmi_top_collocations, SQL_PMI),
    "train_valid_test_split": (q_train_valid_test_split, SQL_TVT_SPLIT),
}
