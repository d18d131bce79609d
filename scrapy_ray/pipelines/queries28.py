"""Twenty-eighth oracle-query batch — IR rank fusion / drift monitoring /
text readability:

- rrf_fusion_docs: Reciprocal Rank Fusion (Cormack et al.) of two
  document rankings (by n_chars and by whitespace token count, both desc
  with doc_id tiebreak) — the IR ensemble primitive. Neither ranking is
  computed with a global sort: each uses the value-histogram rank
  decomposition (counts-above broadcast) + tie ranks inside equal-value
  runs resolved in value-co-partitioned partitions; the fused score
  1/(60+r₁) + 1/(60+r₂) is identical-expression both sides and the
  final top-20 is taken on micro-quantized integer scores (the bm25
  precedent) so ranking ties cannot flip on float noise.
- psi_value_drift: Population Stability Index of the event `value`
  distribution between the first and second half of the time range (the
  ML-ops drift monitor). Decile bin edges = quantile_disc rank walks on
  the BASE half's cent histogram; exact bin counts both halves; per-bin
  (pB−pA)·ln(pB/pA) contributions quantized to 1e-12 int units and summed
  exactly.
- readability_by_lang: Flesch-style readability proxy per language —
  words, sentence marks, and vowel-group "syllables" counted with the
  SAME regex semantics both sides (DuckDB RE2 `regexp_extract_all`
  mirrored by compiled Python regexes); exact integer sums ride one
  O(langs) shuffle; the score finalizes identical-expression.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6

_RRF_K = 60
_RRF_TOP = 20
_PSI_SCALE = 1_000_000_000_000
_PARTS = 64


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# Reciprocal Rank Fusion
# ---------------------------------------------------------------------------


def _global_ranks(ds, col: str) -> "ray.data.Dataset":
    """Unique 1-based rank of every doc under (metric desc, doc_id asc)
    WITHOUT a global sort: value histogram → counts-above per distinct
    value (broadcast); tie rank inside an equal-value run resolved in a
    value-co-partitioned pass (doc_id order)."""
    def hpart(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    hist = (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("v").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("v", ascending=False))
    vals = hist["v"].to_numpy().astype(np.int64)          # desc
    cnt = hist["cnt"].to_numpy().astype(np.int64)
    above = np.concatenate([[0], np.cumsum(cnt[:-1])])    # ranks above
    ref = ray.put((vals[::-1], above[::-1]))              # asc for searchsorted

    def salt(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"], "v": pa.array(v),
                         "gkey": pa.array((v % _PARTS).astype(np.int32))})

    def tie_rank(df: pd.DataFrame) -> pd.DataFrame:
        keys, abv = ray.get(ref)
        df = df.sort_values(["v", "doc_id"], kind="mergesort")
        tie = df.groupby("v").cumcount().to_numpy()
        base = abv[np.searchsorted(keys, df["v"].to_numpy())]
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "rank": (base + tie + 1).astype(np.int64)})

    return (ds.map_batches(salt, batch_format="pyarrow")
              .groupby("gkey").map_groups(tie_rank, batch_format="pandas"))


def q_rrf_fusion_docs(sf_dir: str):
    """RRF of two rankings (n_chars desc, token count desc; doc_id
    tiebreak): score = 1/(60+r1) + 1/(60+r2); global top-20 by
    (micro-quantized score desc, doc_id asc) via per-block partial
    top-k."""
    docs = _pq(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def metrics(t: pa.Table) -> pa.Table:
        toks = np.array([len(s.split()) for s in t["text"].to_pylist()],
                        np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_chars": t["n_chars"].cast(pa.int64()),
                         "n_tokens": pa.array(toks)})

    m = docs.map_batches(metrics, batch_format="pyarrow")

    def lab1(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "r1": t["rank"]})

    def lab2(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "r2": t["rank"]})

    r1 = _global_ranks(m, "n_chars").map_batches(lab1, batch_format="pyarrow")
    r2 = _global_ranks(m, "n_tokens").map_batches(lab2, batch_format="pyarrow")
    joined = r1.join(r2, join_type="inner", num_partitions=8,
                     on=("doc_id",))

    def topk_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"doc_id": t["doc_id"], "r1": t["r1"],
                       "r2": t["r2"]}).to_pandas()
        score = 1.0 / (_RRF_K + df["r1"].to_numpy()) \
            + 1.0 / (_RRF_K + df["r2"].to_numpy())
        # micro-quantized rank key, half-away like SQL round()
        df["score_q"] = np.floor(score * 1e12 + 0.5).astype(np.int64)
        df["rrf6"] = _round6(score)
        df = df.sort_values(["score_q", "doc_id"],
                            ascending=[False, True], kind="mergesort")
        return _strip(df.head(_RRF_TOP))

    parts = joined.map_batches(topk_partial, batch_format="pyarrow") \
        .to_pandas()
    out = parts.sort_values(["score_q", "doc_id"],
                            ascending=[False, True], kind="mergesort") \
        .head(_RRF_TOP)[["doc_id", "r1", "r2", "rrf6"]].reset_index(drop=True)
    for c in ("doc_id", "r1", "r2"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_RRF = f"""
WITH m AS (
  SELECT doc_id, n_chars::BIGINT AS n_chars,
         len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens
  FROM documents),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r1,
         row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS r2
  FROM m),
s AS (
  SELECT doc_id, r1::BIGINT AS r1, r2::BIGINT AS r2,
         1.0 / ({_RRF_K} + r1) + 1.0 / ({_RRF_K} + r2) AS score,
         CAST(round((1.0 / ({_RRF_K} + r1) + 1.0 / ({_RRF_K} + r2)) * 1e12)
              AS BIGINT) AS score_q
  FROM r)
SELECT doc_id, r1, r2, round(score, 6) AS rrf6
FROM s ORDER BY score_q DESC, doc_id LIMIT {_RRF_TOP}
"""


# ---------------------------------------------------------------------------
# PSI drift between time halves
# ---------------------------------------------------------------------------


def q_psi_value_drift(sf_dir: str):
    """PSI of event values: base = first half of the time range, current =
    second half (split at the midpoint of [min ts, max ts], exact integer
    microseconds). Decile edges from the base half's cent histogram
    (quantile_disc rank walk, float ceil(q·n) mirrored); exact bin counts
    both halves; per-bin contributions quantized to 1e-12 units."""
    from scrapy_ray.pipelines.queries import _ts_minmax_us

    ds = _pq(sf_dir, "events", columns=["ts", "value"])
    # ts min/max from parquet footer stats — no Dataset pass
    lo_us, hi_us = _ts_minmax_us(sf_dir, "events")
    mid_us = lo_us + (hi_us - lo_us) // 2

    from scrapy_ray.pipelines.queries import _cents

    def hpart(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        half = (ts > mid_us).astype(np.int64)
        df = pd.DataFrame({"half": half, "c": c})
        g = df.groupby(["half", "c"], sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby(["half", "c"]).aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    base = cells[cells["half"] == 0].sort_values("c")
    cur = cells[cells["half"] == 1].sort_values("c")
    bv = base["c"].to_numpy().astype(np.int64)
    bc = base["cnt"].to_numpy().astype(np.int64)
    nb = int(bc.sum())
    cum = np.cumsum(bc)
    # decile edges: base-half quantile_disc at q = 0.1 .. 0.9
    edges = np.array(
        [bv[np.searchsorted(cum, int(np.ceil(q * nb)), side="left")]
         for q in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)], np.int64)

    def bincounts(v: np.ndarray, cnt: np.ndarray) -> np.ndarray:
        b = (v[:, None] > edges[None, :]).sum(1)   # bin 0..9: #edges below
        out = np.zeros(10, np.int64)
        np.add.at(out, b, cnt)
        return out

    ba = bincounts(bv, bc)
    cc_ = bincounts(cur["c"].to_numpy().astype(np.int64),
                    cur["cnt"].to_numpy().astype(np.int64))
    na, nc = int(ba.sum()), int(cc_.sum())
    # Laplace-style guard: bins are non-empty on the base side by
    # construction (deciles); a zero current bin would send ln to -inf —
    # add 1 to every bin count on BOTH sides (mirrored in SQL)
    pa_ = (ba + 1).astype(np.float64) / (na + 10)
    pc_ = (cc_ + 1).astype(np.float64) / (nc + 10)
    contrib = (pc_ - pa_) * np.log(pc_ / pa_)
    x = contrib * _PSI_SCALE
    units = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)) \
        .astype(np.int64)
    return pd.DataFrame({
        "bin": np.arange(10, dtype=np.int64),
        "n_base": ba, "n_cur": cc_,
        "psi_contrib6": _round6(units / float(_PSI_SCALE)),
    })


def _psi_sql() -> str:
    qs = ", ".join(f"quantile_disc(c, {q:.1f}) AS e{i}"
                   for i, q in enumerate(
                       (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9), 1))
    bin_expr = " + ".join(f"(c > e{i})::INT" for i in range(1, 10))
    return f"""
WITH b AS (
  SELECT (epoch_us(ts) > (SELECT min(epoch_us(ts))
            + (max(epoch_us(ts)) - min(epoch_us(ts))) // 2 FROM events))::INT
           AS half,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
e AS (SELECT {qs} FROM b WHERE half = 0),
binned AS (
  SELECT half, ({bin_expr})::BIGINT AS bin FROM b CROSS JOIN e),
g AS (SELECT bin FROM (SELECT unnest(generate_series(0, 9)) AS bin)),
h AS (
  SELECT g.bin,
         coalesce(sum(CASE WHEN half = 0 THEN 1 END), 0)::BIGINT AS n_base,
         coalesce(sum(CASE WHEN half = 1 THEN 1 END), 0)::BIGINT AS n_cur
  FROM g LEFT JOIN binned ON binned.bin = g.bin GROUP BY 1),
t AS (SELECT sum(n_base)::BIGINT AS na, sum(n_cur)::BIGINT AS nc FROM h)
SELECT bin, n_base, n_cur,
       round(CAST(round((((n_cur + 1)::DOUBLE / (nc + 10)
                          - (n_base + 1)::DOUBLE / (na + 10))
                  * ln(((n_cur + 1)::DOUBLE / (nc + 10))
                       / ((n_base + 1)::DOUBLE / (na + 10))))
                  * {_PSI_SCALE}) AS BIGINT) / {_PSI_SCALE}.0, 6)
         AS psi_contrib6
FROM h CROSS JOIN t ORDER BY bin
"""


SQL_PSI = _psi_sql()


# ---------------------------------------------------------------------------
# readability by language
# ---------------------------------------------------------------------------

_RE_WORD = re.compile(r"\S+")
_RE_SENT = re.compile(r"[.!?]")
_RE_SYL = re.compile(r"[aeiouyAEIOUY]+")


def q_readability_by_lang(sf_dir: str):
    """Flesch-style readability per language: words (\\S+ runs), sentence
    marks ([.!?]), vowel-group syllable proxy ([aeiouyAEIOUY]+ runs) —
    the SAME regexes evaluated by DuckDB RE2 in the oracle. Exact integer
    sums in one O(langs) shuffle; score = 206.835 − 1.015·(W/S) −
    84.6·(Y/W) with sentence count floored at 1 per doc, identical
    expression both sides."""
    ds = _pq(sf_dir, "documents", columns=["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        rows = []
        for s, lg in zip(t["text"].to_pylist(), langs):
            w = len(_RE_WORD.findall(s))
            sn = max(len(_RE_SENT.findall(s)), 1)
            y = len(_RE_SYL.findall(s))
            rows.append((lg, w, sn, y))
        df = pd.DataFrame(rows, columns=["lang", "w", "s", "y"])
        g = df.groupby("lang", sort=False).agg(
            w=("w", "sum"), s=("s", "sum"), y=("y", "sum"),
            n=("w", "size")).reset_index()
        for c in ("w", "s", "y", "n"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("lang")
             .aggregate(Sum("w", alias_name="w"), Sum("s", alias_name="s"),
                        Sum("y", alias_name="y"), Sum("n", alias_name="n"))
             .to_pandas().sort_values("lang").reset_index(drop=True))
    for c in ("w", "s", "y", "n"):
        out[c] = out[c].astype(np.int64)
    w = out["w"].to_numpy().astype(np.float64)
    s = out["s"].to_numpy().astype(np.float64)
    y = out["y"].to_numpy().astype(np.float64)
    out["flesch6"] = _round6(206.835 - 1.015 * (w / s) - 84.6 * (y / w))
    return out


SQL_READ = """
WITH d AS (
  SELECT lang,
         len(regexp_extract_all(text, '\\S+'))::BIGINT AS w,
         greatest(len(regexp_extract_all(text, '[.!?]')), 1)::BIGINT AS s,
         len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))::BIGINT AS y
  FROM documents),
g AS (
  SELECT lang, sum(w)::BIGINT AS w, sum(s)::BIGINT AS s,
         sum(y)::BIGINT AS y, count(*)::BIGINT AS n
  FROM d GROUP BY 1)
SELECT lang, w, s, y, n,
       round(206.835 - 1.015 * (w::DOUBLE / s)
             - 84.6 * (y::DOUBLE / w), 6) AS flesch6
FROM g ORDER BY lang
"""


QUERIES28: dict[str, tuple] = {
    "rrf_fusion_docs": (q_rrf_fusion_docs, SQL_RRF),
    "psi_value_drift": (q_psi_value_drift, SQL_PSI),
    "readability_by_lang": (q_readability_by_lang, SQL_READ),
}
