"""Ninety-sixth oracle-query batch — corpus-linguistics trio:

- word_burstiness: Church-Gale burstiness cf/df per word (collection
  frequency over document frequency — bursty words concentrate in
  few docs): quantized EXACTLY as q = cf*1e9 // df (floor division,
  both sides); top-10 by (q DESC, cf DESC, word).
- keyness_loglik: Dunning log-likelihood keyness of words between
  source groups A = src0..src9 and B = src10..src19 (numeric suffix
  parse both sides): G2 = 2*[a*ln(a(N_A+N_B)/((a+b)N_A)) + b*(...)]
  with each ln term quantized at 1e-9 BEFORE the multiply by the
  exact count (zero counts contribute 0 identically); top-10 by
  (|g2q| DESC, word) with the A-leaning sign from the exact
  cross-product a*N_B - b*N_A.
- mattr_docs: MATTR (moving-average type-token ratio, window w=20):
  every document contributes one distinct-type count per window
  (incremental sliding distinct in the Ray tasks; a per-(doc,start)
  grouped join in SQL), so MATTR = SUM distinct / (w * n_windows)
  is one exact integer ratio.
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

_MATTR_W = 20


# ---------------------------------------------------------------------------
# Word burstiness
# ---------------------------------------------------------------------------


def q_word_burstiness(sf_dir: str):
    """Top-10 bursty words by exact floor-quantized cf/df (docstring
    above)."""
    ds = _pq(sf_dir, "documents", columns=["text"])

    def wpart(t: pa.Table) -> pa.Table:
        w_l: list[str] = []
        cf_l: list[int] = []
        df_l: list[int] = []
        for txt in t["text"].to_pylist():
            toks = txt.split()
            cnt: dict[str, int] = {}
            for w in toks:
                cnt[w] = cnt.get(w, 0) + 1
            for w, c in cnt.items():
                w_l.append(w)
                cf_l.append(c)
                df_l.append(1)
        if not w_l:
            return pa.table({"w": pa.array([], pa.string()),
                             "cf": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        df = pd.DataFrame({"w": w_l, "cf": np.array(cf_l, np.int64),
                           "df": np.array(df_l, np.int64)})
        g = df.groupby("w", sort=False).sum().reset_index()
        for c in ("cf", "df"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    tf = (ds.map_batches(wpart, batch_format="pyarrow")
            .groupby("w").aggregate(Sum("cf", alias_name="cf"),
                                    Sum("df", alias_name="df"))
            .to_pandas())
    tf["q"] = (tf["cf"].to_numpy(np.int64) * 10 ** 9
               // tf["df"].to_numpy(np.int64))
    top = tf.sort_values(["q", "cf", "w"],
                         ascending=[False, False, True]).head(10)
    out = pd.DataFrame({"word": top["w"],
                        "cf": top["cf"].astype(np.int64),
                        "df": top["df"].astype(np.int64),
                        "q": top["q"].astype(np.int64)})
    return out.reset_index(drop=True)


SQL_WORD_BURSTINESS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents),
dw AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
tf AS (
  SELECT w, sum(c)::BIGINT AS cf, count(*)::BIGINT AS df
  FROM dw GROUP BY 1)
SELECT w AS word, cf, df, (cf * 1000000000 // df)::BIGINT AS q
FROM tf ORDER BY q DESC, cf DESC, w LIMIT 10
"""


# ---------------------------------------------------------------------------
# Keyness (Dunning LLR)
# ---------------------------------------------------------------------------


def q_keyness_loglik(sf_dir: str):
    """Top-10 keyness words between source halves (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def wpart(t: pa.Table) -> pa.Table:
        w_l: list[str] = []
        g_l: list[int] = []
        for src, txt in zip(t["source"].to_pylist(),
                            t["text"].to_pylist()):
            grp = 0 if int(src[3:]) < 10 else 1
            for w in txt.split():
                w_l.append(w)
                g_l.append(grp)
        if not w_l:
            return pa.table({"w": pa.array([], pa.string()),
                             "a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        df = pd.DataFrame({"w": w_l, "g": np.array(g_l, np.int64)})
        df["a"] = (df["g"] == 0).astype(np.int64)
        df["b"] = (df["g"] == 1).astype(np.int64)
        g = df.groupby("w", sort=False)[["a", "b"]].sum().reset_index()
        for c in ("a", "b"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    tf = (ds.map_batches(wpart, batch_format="pyarrow")
            .groupby("w").aggregate(Sum("a", alias_name="a"),
                                    Sum("b", alias_name="b"))
            .to_pandas())
    a = tf["a"].to_numpy(np.int64)
    b = tf["b"].to_numpy(np.int64)
    na = int(a.sum())
    nb = int(b.sum())
    g2q = []
    for av, bv in zip(a, b):
        av, bv = int(av), int(bv)
        t = 0
        if av:
            lx = math.log(float(av * (na + nb))
                          / float((av + bv) * na)) * 1e9
            t += av * (int(math.floor(lx + 0.5)) if lx >= 0
                       else int(math.ceil(lx - 0.5)))
        if bv:
            lx = math.log(float(bv * (na + nb))
                          / float((av + bv) * nb)) * 1e9
            t += bv * (int(math.floor(lx + 0.5)) if lx >= 0
                       else int(math.ceil(lx - 0.5)))
        g2q.append(2 * t)
    tf["g2q"] = np.array(g2q, np.int64)
    tf["sgn"] = np.sign(a * nb - b * na).astype(np.int64)
    tf["absq"] = np.abs(tf["g2q"].to_numpy(np.int64))
    top = tf.sort_values(["absq", "w"],
                         ascending=[False, True]).head(10)
    out = pd.DataFrame({"word": top["w"],
                        "a": top["a"].astype(np.int64),
                        "b": top["b"].astype(np.int64),
                        "g2q": top["g2q"].astype(np.int64),
                        "sgn": top["sgn"].astype(np.int64)})
    return out.reset_index(drop=True)


SQL_KEYNESS = """
WITH toks AS (
  SELECT (CAST(substr(source, 4) AS INT) < 10)::INT AS ga,
         unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents),
tf AS (
  SELECT w, sum(ga)::BIGINT AS a, sum(1 - ga)::BIGINT AS b
  FROM toks GROUP BY 1),
t AS (SELECT sum(a)::BIGINT AS na, sum(b)::BIGINT AS nb FROM tf),
g AS (
  SELECT w, a, b,
         2 * (CASE WHEN a > 0 THEN
                a * CAST(round(ln(CAST(a * (na + nb) AS DOUBLE)
                                  / CAST((a + b) * na AS DOUBLE))
                               * 1000000000) AS BIGINT)
              ELSE 0 END
              + CASE WHEN b > 0 THEN
                b * CAST(round(ln(CAST(b * (na + nb) AS DOUBLE)
                                  / CAST((a + b) * nb AS DOUBLE))
                               * 1000000000) AS BIGINT)
              ELSE 0 END) AS g2q,
         CASE WHEN a * nb > b * na THEN 1
              WHEN a * nb < b * na THEN -1 ELSE 0 END AS sgn
  FROM tf CROSS JOIN t)
SELECT w AS word, a, b, g2q::BIGINT AS g2q, sgn::BIGINT AS sgn
FROM g ORDER BY abs(g2q) DESC, w LIMIT 10
"""


# ---------------------------------------------------------------------------
# MATTR
# ---------------------------------------------------------------------------


def q_mattr_docs(sf_dir: str):
    """Moving-average TTR, window w=20, exact integer ratio (docstring
    above)."""
    ds = _pq(sf_dir, "documents", columns=["text"])

    def mpart(t: pa.Table) -> pa.Table:
        n_win = 0
        s_dist = 0
        for txt in t["text"].to_pylist():
            toks = txt.split()
            if len(toks) < _MATTR_W:
                continue
            cnt: dict[str, int] = {}
            dist = 0
            for i, w in enumerate(toks):
                if cnt.get(w, 0) == 0:
                    dist += 1
                cnt[w] = cnt.get(w, 0) + 1
                if i >= _MATTR_W:
                    old = toks[i - _MATTR_W]
                    cnt[old] -= 1
                    if cnt[old] == 0:
                        dist -= 1
                if i >= _MATTR_W - 1:
                    n_win += 1
                    s_dist += dist
        return pa.table({"g": pa.array([0], pa.int64()),
                         "n_win": pa.array([n_win], pa.int64()),
                         "s_dist": pa.array([s_dist], pa.int64())})

    agg = (ds.map_batches(mpart, batch_format="pyarrow")
             .groupby("g")
             .aggregate(Sum("n_win", alias_name="n_win"),
                        Sum("s_dist", alias_name="s_dist"))
             .to_pandas())
    n_win = int(agg["n_win"].iloc[0])
    s_dist = int(agg["s_dist"].iloc[0])
    mattr = float(s_dist) / float(_MATTR_W * n_win)
    out = pd.DataFrame({"n_windows": [n_win], "sum_distinct": [s_dist],
                        "mattr6": [_round6(np.array([mattr]))[0]]})
    for col in ("n_windows", "sum_distinct"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MATTR = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS i
  FROM documents),
dl AS (SELECT doc_id, max(i)::BIGINT AS len FROM toks GROUP BY 1),
starts AS (
  SELECT toks.doc_id, toks.i AS start
  FROM toks JOIN dl ON dl.doc_id = toks.doc_id
  WHERE toks.i <= dl.len - {_MATTR_W} + 1),
wins AS (
  SELECT starts.doc_id, starts.start,
         count(DISTINCT toks.w)::BIGINT AS dist
  FROM starts JOIN toks ON toks.doc_id = starts.doc_id
    AND toks.i BETWEEN starts.start AND starts.start + {_MATTR_W - 1}
  GROUP BY 1, 2),
s AS (SELECT count(*)::BIGINT AS n_win, sum(dist)::BIGINT AS s_dist
      FROM wins)
SELECT n_win AS n_windows, s_dist AS sum_distinct,
       round(CAST(s_dist AS DOUBLE)
             / CAST({_MATTR_W} * n_win AS DOUBLE), 6) AS mattr6
FROM s
"""


QUERIES96: dict[str, tuple] = {
    "word_burstiness": (q_word_burstiness, SQL_WORD_BURSTINESS),
    "keyness_loglik": (q_keyness_loglik, SQL_KEYNESS),
    "mattr_docs": (q_mattr_docs, SQL_MATTR),
}
