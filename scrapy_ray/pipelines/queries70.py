"""Seventieth oracle-query batch — retrieval AP / bigram stylometric
richness / combined location-scale rank test:

- avg_precision_by_source: tie-free average precision of the
  (n_chars DESC, doc_id) ranking per source, relevance = the MRR
  mirrored multiplicative hash (doc_id-decorrelated from source;
  queries39 constants).  Per relevant doc the AP term
  cum_rel/rank is quantized to 1e-9 (cum_rel*1e9/rank stays below
  2^52 at every sf) and integer-summed per source, so ap_q is exact
  and ap6 = ap_q/(R*1e9) finalizes identical-expression.  The Ray
  side is a 20-group groupby(source).map_groups with an in-group
  vectorized sort — few LARGE groups (the salting rule targets many
  tiny ones); per-group local sort only, no global sort.
- lexical_extras_by_source: the stylometric richness trio that
  complements Yule's K (queries48) and Chao1/Good-Turing
  (queries58), on the same per-source BIGRAM tf aggregate (unigram
  vocab saturates at ~31 words — the known synthetic degeneracy):
  Honore's R = 100 ln N / (1 - V1/V), Brunet's W reported as
  ln W = V^-0.165 * ln N (pow/ln parity probed exact vs DuckDB over
  the live value range), Sichel's S = V2/V.  All from the exact
  int64 (toks, vocab, f1, f2) reduction; probe sf0.001 src0:
  V=712, N=1508, V1=272, V2=233 — all three well-defined.
- lepage_click_view: Lepage combined test L = z_W^2 + z_AB^2 on the
  shared click/view per-cent histogram — the location component is
  the tie-corrected Wilcoxon rank-sum via exact DOUBLED midranks
  (dr_b = 2*cum_prev + l + 1; 2W and D = 2W - m(N+1) exact ints;
  z_W^2 = 3*D^2*N*(N-1) / (m*nv*((N+1)*N*(N-1) - SUM(l^3-l))) is ONE
  float division of exact HUGEINT-range ints), the scale component
  reuses the Ansari-Bradley closed-form tie-block machinery
  (queries64) with its 1e-6/1e-3 quantized block rationals, and
  L = z_W^2 + z_AB^2 finalizes identical-expression.  Probe
  sf0.001: z_W^2 = 0.523529, z_AB^2 = 0.005634, L = 0.529163.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries39 import _MRR_MOD, _MRR_MULT
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries64 import _f_sql
from scrapy_ray.pipelines.queries67 import _cv_hist


# ---------------------------------------------------------------------------
# Average precision per source
# ---------------------------------------------------------------------------


def q_avg_precision_by_source(sf_dir: str):
    """Tie-free AP of the n_chars ranking per source, hash relevance
    (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def ap_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True])
        ids = g["doc_id"].to_numpy(np.int64)
        h = ((ids.astype(np.uint64) % np.uint64(_MRR_MOD))
             * np.uint64(_MRR_MULT)) % np.uint64(_MRR_MOD)
        rel = (h % np.uint64(7) == 0).astype(np.int64)
        rank = np.arange(1, len(g) + 1, dtype=np.int64)
        cumrel = np.cumsum(rel)
        terms = np.floor(cumrel.astype(np.float64) * 1000000000.0
                         / rank + 0.5).astype(np.int64)
        ap_q = int(terms[rel == 1].sum())
        n_rel = int(rel.sum())
        ap6 = _round6(np.array(
            [float(ap_q) / float(n_rel) / 1000000000.0]))[0] \
            if n_rel else 0.0
        return pd.DataFrame({
            "source": [g["source"].iloc[0]],
            "n_docs": [np.int64(len(g))], "n_rel": [np.int64(n_rel)],
            "ap_q": [np.int64(ap_q)], "ap6": [ap6]})

    out = (ds.groupby("source")
             .map_groups(ap_group, batch_format="pandas")
             .to_pandas().sort_values("source").reset_index(drop=True))
    for col in ("n_docs", "n_rel", "ap_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_AVG_PRECISION = f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rnk,
         (((doc_id::UBIGINT % {_MRR_MOD}) * {_MRR_MULT}::UBIGINT)
          % {_MRR_MOD} % 7 = 0)::INT AS rel
  FROM documents),
cr AS (
  SELECT source, rnk, rel,
         sum(rel) OVER (PARTITION BY source ORDER BY rnk)::BIGINT
           AS cumrel
  FROM ranked),
g AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(rel)::BIGINT AS n_rel,
         sum(CASE WHEN rel = 1
             THEN CAST(round(cumrel * 1000000000.0 / rnk) AS BIGINT)
             ELSE 0 END)::BIGINT AS ap_q
  FROM cr GROUP BY 1)
SELECT source, n_docs, n_rel, ap_q,
       round(CAST(ap_q AS DOUBLE) / CAST(n_rel AS DOUBLE)
             / 1000000000.0, 6) AS ap6
FROM g ORDER BY source
"""


# ---------------------------------------------------------------------------
# Honore / Brunet / Sichel per source (bigrams)
# ---------------------------------------------------------------------------


def q_lexical_extras_by_source(sf_dir: str):
    """Honore R / ln Brunet W / Sichel S of the per-source bigram
    distribution (docstring above)."""
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
                           "toks": n, "vocab": np.int64(1),
                           "f1": (n == 1).astype(np.int64),
                           "f2": (n == 2).astype(np.int64)})
        g = df.groupby("source", sort=False).sum().reset_index()
        for col in ("toks", "vocab", "f1", "f2"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    sv = (cells.map_batches(spart, batch_format="pyarrow")
               .groupby("source")
               .aggregate(Sum("toks", alias_name="toks"),
                          Sum("vocab", alias_name="vocab"),
                          Sum("f1", alias_name="f1"),
                          Sum("f2", alias_name="f2"))
               .to_pandas().sort_values("source").reset_index(drop=True))
    tk = sv["toks"].to_numpy(np.int64)
    v = sv["vocab"].to_numpy(np.int64)
    f1 = sv["f1"].to_numpy(np.int64)
    f2 = sv["f2"].to_numpy(np.int64)
    honore = np.array([100.0 * math.log(float(int(a)))
                       / (1.0 - float(int(b)) / float(int(c)))
                       for a, b, c in zip(tk, f1, v)])
    lnw = np.array([math.pow(float(int(c)), -0.165)
                    * math.log(float(int(a)))
                    for a, c in zip(tk, v)])
    sichel = np.array([float(int(b)) / float(int(c))
                       for b, c in zip(f2, v)])
    out = pd.DataFrame({"source": sv["source"], "toks": tk, "vocab": v,
                        "f1": f1, "f2": f2,
                        "honore6": _round6(honore),
                        "lnw6": _round6(lnw),
                        "sichel6": _round6(sichel)})
    for col in ("toks", "vocab", "f1", "f2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LEXICAL_EXTRAS = """
WITH toks AS (
  SELECT doc_id, source, unnest(regexp_extract_all(text, '\\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS i
  FROM documents),
bg AS (
  SELECT a.source, a.w || ' ' || b.w AS bw
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
tf AS (SELECT source, bw, count(*)::BIGINT AS f FROM bg GROUP BY 1, 2),
m AS (
  SELECT source, sum(f)::BIGINT AS toks, count(*)::BIGINT AS vocab,
         sum((f = 1)::INT)::BIGINT AS f1,
         sum((f = 2)::INT)::BIGINT AS f2
  FROM tf GROUP BY source)
SELECT source, toks, vocab, f1, f2,
       round(100.0 * ln(CAST(toks AS DOUBLE))
             / (1.0 - CAST(f1 AS DOUBLE) / CAST(vocab AS DOUBLE)), 6)
         AS honore6,
       round(pow(CAST(vocab AS DOUBLE), -0.165)
             * ln(CAST(toks AS DOUBLE)), 6) AS lnw6,
       round(CAST(f2 AS DOUBLE) / CAST(vocab AS DOUBLE), 6) AS sichel6
FROM m ORDER BY source
"""


# ---------------------------------------------------------------------------
# Lepage combined location-scale test
# ---------------------------------------------------------------------------


def q_lepage_click_view(sf_dir: str):
    """Lepage L = z_W^2 + z_AB^2 on click vs view values (docstring
    above)."""
    support, h1, h2 = _cv_hist(sf_dir)
    ell = h1 + h2
    nn = int(ell.sum())
    m = int(h1.sum())
    nv = nn - m
    cum = np.cumsum(ell)
    # Wilcoxon component on exact doubled midranks
    dr = 2 * (cum - ell) + ell + 1
    w2 = int(h1.dot(dr))
    tsum = int((ell.astype(object) ** 3 - ell.astype(object)).sum())
    d = w2 - m * (nn + 1)
    zw2 = float(3 * d * d * nn * (nn - 1)) \
        / float(m * nv * ((nn + 1) * nn * (nn - 1) - tsum))
    # Ansari-Bradley component (queries64 machinery verbatim)
    t0 = (nn + 1) // 2

    def f(x: np.ndarray) -> np.ndarray:
        lm = np.minimum(x, t0)
        base = lm * (lm + 1) // 2
        extra = np.where(
            x > t0,
            (x - t0) * (nn + 1) - (x * (x + 1) // 2 - t0 * (t0 + 1) // 2),
            np.int64(0))
        return base + extra

    sb = f(cum) - f(cum - ell)
    sums = int(f(np.array([nn], np.int64))[0])
    ellf = ell.astype(np.float64)
    t_units = int(np.floor(
        (h1 * sb).astype(np.float64) / ellf * 1e6 + 0.5).sum())
    sq_units = int(np.floor(
        (sb * sb).astype(np.float64) / ellf * 1e3 + 0.5).sum())
    mf, nvf, nf = float(m), float(nv), float(nn)
    tt = t_units / 1e6
    ss = float(sums)
    sq = sq_units / 1e3
    e_t = (mf * ss) / nf
    var_t = ((mf * nvf) / (nf * (nf - 1.0))) * (sq - ((ss * ss) / nf))
    zab2 = ((tt - e_t) * (tt - e_t)) / var_t
    lep = zw2 + zab2
    out = pd.DataFrame({"n_click": [m], "n_view": [nv], "w2": [w2],
                        "tsum": [tsum], "t_units": [t_units],
                        "sq_units": [sq_units],
                        "zw2_6": [_round6(np.array([zw2]))[0]],
                        "zab2_6": [_round6(np.array([zab2]))[0]],
                        "l6": [_round6(np.array([lep]))[0]]})
    for col in ("n_click", "n_view", "w2", "tsum", "t_units", "sq_units"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LEPAGE = f"""
WITH e AS (
  SELECT CAST(event_type = 'view' AS INT) AS g,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'view')),
cells AS (
  SELECT c, count(*) FILTER (WHERE g = 0)::BIGINT AS h1,
         count(*)::BIGINT AS l
  FROM e GROUP BY c),
st AS (
  SELECT sum(h1)::BIGINT AS m, sum(l)::BIGINT AS nn,
         (sum(l) + 1) // 2 AS t0
  FROM cells),
w AS (
  SELECT h1, l, sum(l) OVER (ORDER BY c)::BIGINT AS cum, t0, nn
  FROM cells, st),
wil AS (
  SELECT sum(h1 * (2 * (cum - l) + l + 1))::BIGINT AS w2,
         sum(l * l * l - l)::BIGINT AS tsum
  FROM w),
blk AS (
  SELECT h1, l,
         ({_f_sql('cum')} - {_f_sql('(cum - l)')})::BIGINT AS sb
  FROM w),
agg AS (
  SELECT sum(CAST(round(((h1 * sb) / l) * 1000000.0) AS BIGINT))::BIGINT
           AS t_units,
         sum(CAST(round(((sb * sb) / l) * 1000.0) AS BIGINT))::BIGINT
           AS sq_units
  FROM blk),
fs AS (SELECT {_f_sql('nn')}::BIGINT AS sums, m, nn, nn - m AS nv
       FROM st),
z AS (
  SELECT m, nv, nn, w2, tsum, t_units, sq_units, sums,
    CAST(3::HUGEINT * (w2 - m * (nn + 1)) * (w2 - m * (nn + 1))
         * nn * (nn - 1) AS DOUBLE)
      / CAST(m::HUGEINT * nv
             * ((nn + 1)::HUGEINT * nn * (nn - 1) - tsum) AS DOUBLE)
      AS zw2,
    ((CAST(t_units AS DOUBLE) / 1000000.0
      - (CAST(m AS DOUBLE) * CAST(sums AS DOUBLE)) / CAST(nn AS DOUBLE))
     * (CAST(t_units AS DOUBLE) / 1000000.0
        - (CAST(m AS DOUBLE) * CAST(sums AS DOUBLE))
          / CAST(nn AS DOUBLE)))
    / (((CAST(m AS DOUBLE) * CAST(nv AS DOUBLE))
        / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))
       * (CAST(sq_units AS DOUBLE) / 1000.0
          - ((CAST(sums AS DOUBLE) * CAST(sums AS DOUBLE))
             / CAST(nn AS DOUBLE)))) AS zab2
  FROM fs, agg, wil)
SELECT m AS n_click, nv AS n_view, w2, tsum, t_units, sq_units,
       round(zw2, 6) AS zw2_6, round(zab2, 6) AS zab2_6,
       round(zw2 + zab2, 6) AS l6
FROM z
"""


QUERIES70: dict[str, tuple] = {
    "avg_precision_by_source": (q_avg_precision_by_source,
                                SQL_AVG_PRECISION),
    "lexical_extras_by_source": (q_lexical_extras_by_source,
                                 SQL_LEXICAL_EXTRAS),
    "lepage_click_view": (q_lepage_click_view, SQL_LEPAGE),
}
