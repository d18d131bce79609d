"""One-hundred-twelfth oracle-query batch — lexical-richness constants
over the documents table (classic quantitative-linguistics estimators;
the freq-of-freq ingredients V, V1, V2, N are exact integers computed
per document, so every constant is a deterministic float expression of
exact ints, 1e-6-quantized per doc before the cross-doc sum — repo
float rule):

- honore_brunet_by_source: per-source means of Honoré's
  R = 100·ln(N)/(1 − V1/V) (docs with V1 == V are excluded — R is a
  pole there; the eligible count is reported) and Brunet's
  W = N^(V^−0.165) (all docs).
- sichel_hapax_by_source: per-source means of Sichel's S = V2/V and
  the hapax ratio V1/V, plus the exact corpus sums of V1/V2/V.
- herdan_guiraud_by_source: per-source BIGRAM-vocabulary constants
  Herdan C = ln(V)/ln(N) and Guiraud R = V/√N from the exact
  per-source (V, N) of the bigram distribution (same exact-count
  device as chao1_bigram_richness in queries58, different
  estimators).

Tokenizer: .split() on the Ray side == regexp '\\S+' in SQL (repo
rule).
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

_LXQ = 1_000_000  # per-doc quantization scale


def _doc_freqfreq(t: pa.Table) -> pd.DataFrame:
    """Per-doc exact (n, v, v1, v2) unigram freq-of-freq stats."""
    rows = []
    for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        c = Counter(txt.split())
        n = sum(c.values())
        if n == 0:
            continue
        v = len(c)
        v1 = sum(1 for x in c.values() if x == 1)
        v2 = sum(1 for x in c.values() if x == 2)
        rows.append((s, n, v, v1, v2))
    return pd.DataFrame(rows, columns=["source", "n", "v", "v1", "v2"])


def _qint(x: np.ndarray) -> np.ndarray:
    # mirrors SQL CAST(round(x * 1e6) AS BIGINT) (half-away-from-zero)
    return (np.sign(x) * np.floor(np.abs(x) * _LXQ + 0.5)).astype(np.int64)


# ---------------------------------------------------------------------------
# Honoré R + Brunet W
# ---------------------------------------------------------------------------


def q_honore_brunet_by_source(sf_dir: str):
    """Per-source mean Honoré R / Brunet W (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def dpart(t: pa.Table) -> pa.Table:
        df = _doc_freqfreq(t)
        n = df["n"].to_numpy(np.float64)
        v = df["v"].to_numpy(np.float64)
        v1 = df["v1"].to_numpy(np.float64)
        elig = df["v1"].to_numpy(np.int64) < df["v"].to_numpy(np.int64)
        hon = np.where(elig,
                       100.0 * np.log(n) / (1.0 - v1 / v), 0.0)
        bru = np.power(n, np.power(v, -0.165))
        g = pd.DataFrame({"source": df["source"],
                          "n_docs": np.int64(1),
                          "n_elig": elig.astype(np.int64),
                          "hq": _qint(hon), "bq": _qint(bru)}) \
            .groupby("source", sort=False).sum().reset_index()
        for col in ("n_docs", "n_elig", "hq", "bq"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    sv = (ds.map_batches(dpart, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_elig", alias_name="n_elig"),
                       Sum("hq", alias_name="hq"),
                       Sum("bq", alias_name="bq"))
            .to_pandas().sort_values("source").reset_index(drop=True))
    hon6 = np.empty(len(sv))
    bru6 = np.empty(len(sv))
    for i in range(len(sv)):
        hon6[i] = (float(int(sv["hq"][i])) / 1000000.0
                   / float(int(sv["n_elig"][i])))
        bru6[i] = (float(int(sv["bq"][i])) / 1000000.0
                   / float(int(sv["n_docs"][i])))
    out = pd.DataFrame({"source": sv["source"],
                        "n_docs": sv["n_docs"].astype(np.int64),
                        "n_elig": sv["n_elig"].astype(np.int64),
                        "honore6": _round6(hon6),
                        "brunet6": _round6(bru6)})
    return out


SQL_HONORE_BRUNET = """
WITH tok AS (
  SELECT doc_id, source, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents),
wc AS (
  SELECT doc_id, source, w, count(*)::BIGINT AS c
  FROM tok GROUP BY 1, 2, 3),
d AS (
  SELECT doc_id, source, sum(c)::BIGINT AS n, count(*)::BIGINT AS v,
         sum((c = 1)::INT)::BIGINT AS v1
  FROM wc GROUP BY 1, 2),
q AS (
  SELECT source, 1::BIGINT AS n_docs, (v1 < v)::BIGINT AS n_elig,
         CASE WHEN v1 < v THEN CAST(round(
           100.0 * ln(CAST(n AS DOUBLE))
           / (1.0 - CAST(v1 AS DOUBLE) / CAST(v AS DOUBLE))
           * 1000000.0) AS BIGINT) ELSE 0 END AS hq,
         CAST(round(pow(CAST(n AS DOUBLE),
                        pow(CAST(v AS DOUBLE), -0.165))
                    * 1000000.0) AS BIGINT) AS bq
  FROM d),
s AS (
  SELECT source, sum(n_docs)::BIGINT AS n_docs,
         sum(n_elig)::BIGINT AS n_elig,
         sum(hq)::BIGINT AS hq, sum(bq)::BIGINT AS bq
  FROM q GROUP BY 1)
SELECT source, n_docs, n_elig,
       round(CAST(hq AS DOUBLE) / 1000000.0
             / CAST(n_elig AS DOUBLE), 6) AS honore6,
       round(CAST(bq AS DOUBLE) / 1000000.0
             / CAST(n_docs AS DOUBLE), 6) AS brunet6
FROM s ORDER BY source
"""


# ---------------------------------------------------------------------------
# Sichel S + hapax ratio
# ---------------------------------------------------------------------------


def q_sichel_hapax_by_source(sf_dir: str):
    """Per-source mean Sichel S / hapax ratio (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def dpart(t: pa.Table) -> pa.Table:
        df = _doc_freqfreq(t)
        v = df["v"].to_numpy(np.float64)
        g = pd.DataFrame({"source": df["source"],
                          "n_docs": np.int64(1),
                          "sv1": df["v1"].to_numpy(np.int64),
                          "sv2": df["v2"].to_numpy(np.int64),
                          "sv": df["v"].to_numpy(np.int64),
                          "sq": _qint(df["v2"].to_numpy(np.float64) / v),
                          "hq": _qint(df["v1"].to_numpy(np.float64) / v)}) \
            .groupby("source", sort=False).sum().reset_index()
        for col in ("n_docs", "sv1", "sv2", "sv", "sq", "hq"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    sv = (ds.map_batches(dpart, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("sv1", alias_name="sv1"),
                       Sum("sv2", alias_name="sv2"),
                       Sum("sv", alias_name="sv"),
                       Sum("sq", alias_name="sq"),
                       Sum("hq", alias_name="hq"))
            .to_pandas().sort_values("source").reset_index(drop=True))
    si6 = np.empty(len(sv))
    ha6 = np.empty(len(sv))
    for i in range(len(sv)):
        si6[i] = (float(int(sv["sq"][i])) / 1000000.0
                  / float(int(sv["n_docs"][i])))
        ha6[i] = (float(int(sv["hq"][i])) / 1000000.0
                  / float(int(sv["n_docs"][i])))
    out = pd.DataFrame({"source": sv["source"],
                        "n_docs": sv["n_docs"].astype(np.int64),
                        "sum_v1": sv["sv1"].astype(np.int64),
                        "sum_v2": sv["sv2"].astype(np.int64),
                        "sum_v": sv["sv"].astype(np.int64),
                        "sichel6": _round6(si6),
                        "hapax6": _round6(ha6)})
    return out


SQL_SICHEL_HAPAX = """
WITH tok AS (
  SELECT doc_id, source, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents),
wc AS (
  SELECT doc_id, source, w, count(*)::BIGINT AS c
  FROM tok GROUP BY 1, 2, 3),
d AS (
  SELECT doc_id, source, count(*)::BIGINT AS v,
         sum((c = 1)::INT)::BIGINT AS v1,
         sum((c = 2)::INT)::BIGINT AS v2
  FROM wc GROUP BY 1, 2),
q AS (
  SELECT source, v1, v2, v,
         CAST(round(CAST(v2 AS DOUBLE) / CAST(v AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS sq,
         CAST(round(CAST(v1 AS DOUBLE) / CAST(v AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS hq
  FROM d),
s AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(v1)::BIGINT AS sum_v1, sum(v2)::BIGINT AS sum_v2,
         sum(v)::BIGINT AS sum_v,
         sum(sq)::BIGINT AS sq, sum(hq)::BIGINT AS hq
  FROM q GROUP BY 1)
SELECT source, n_docs, sum_v1, sum_v2, sum_v,
       round(CAST(sq AS DOUBLE) / 1000000.0
             / CAST(n_docs AS DOUBLE), 6) AS sichel6,
       round(CAST(hq AS DOUBLE) / 1000000.0
             / CAST(n_docs AS DOUBLE), 6) AS hapax6
FROM s ORDER BY source
"""


# ---------------------------------------------------------------------------
# Herdan C + Guiraud R on the per-source bigram distribution
# ---------------------------------------------------------------------------


def q_herdan_guiraud_by_source(sf_dir: str):
    """Per-source bigram Herdan C / Guiraud R (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def wpart(t: pa.Table) -> pa.Table:
        src_l: list[str] = []
        tok_l: list[str] = []
        for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            ts = txt.split()
            if len(ts) < 2:
                continue
            src_l.extend([s] * (len(ts) - 1))
            tok_l.extend(x + " " + y for x, y in zip(ts[:-1], ts[1:]))
        if not tok_l:
            return pa.table({"source": pa.array([], pa.string()),
                             "w": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({"source": src_l, "w": tok_l, "n": np.int64(1)})
        g = df.groupby(["source", "w"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(wpart, batch_format="pyarrow")
               .groupby(["source", "w"])
               .aggregate(Sum("n", alias_name="n")))

    def spart(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"source": t["source"].to_pylist(),
                           "toks": n, "vocab": np.int64(1)})
        g = df.groupby("source", sort=False).sum().reset_index()
        for col in ("toks", "vocab"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    sv = (cells.map_batches(spart, batch_format="pyarrow")
               .groupby("source")
               .aggregate(Sum("toks", alias_name="toks"),
                          Sum("vocab", alias_name="vocab"))
               .to_pandas().sort_values("source").reset_index(drop=True))
    he6 = np.empty(len(sv))
    gu6 = np.empty(len(sv))
    for i in range(len(sv)):
        nn, vv = float(int(sv["toks"][i])), float(int(sv["vocab"][i]))
        he6[i] = np.log(vv) / np.log(nn)
        gu6[i] = vv / np.sqrt(nn)
    out = pd.DataFrame({"source": sv["source"],
                        "toks": sv["toks"].astype(np.int64),
                        "vocab": sv["vocab"].astype(np.int64),
                        "herdan6": _round6(he6),
                        "guiraud6": _round6(gu6)})
    return out


SQL_HERDAN_GUIRAUD = """
WITH toks AS (
  SELECT source, regexp_extract_all(text, '\\S+') AS ts FROM documents),
bg AS (
  SELECT source, ts[i] || ' ' || ts[i + 1] AS w
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts))) AS i) r(i)
  WHERE len(ts) >= 2),
cn AS (
  SELECT source, w, count(*)::BIGINT AS n FROM bg GROUP BY 1, 2),
sv AS (
  SELECT source, sum(n)::BIGINT AS toks, count(*)::BIGINT AS vocab
  FROM cn GROUP BY 1)
SELECT source, toks, vocab,
       round(ln(CAST(vocab AS DOUBLE)) / ln(CAST(toks AS DOUBLE)), 6)
         AS herdan6,
       round(CAST(vocab AS DOUBLE) / sqrt(CAST(toks AS DOUBLE)), 6)
         AS guiraud6
FROM sv ORDER BY source
"""


QUERIES112: dict[str, tuple] = {
    "honore_brunet_by_source": (q_honore_brunet_by_source,
                                SQL_HONORE_BRUNET),
    "sichel_hapax_by_source": (q_sichel_hapax_by_source, SQL_SICHEL_HAPAX),
    "herdan_guiraud_by_source": (q_herdan_guiraud_by_source,
                                 SQL_HERDAN_GUIRAUD),
}
