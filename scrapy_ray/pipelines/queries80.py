"""Eightieth oracle-query batch — graph keyword extraction / inventory
classification / high-breakdown robust slope:

- textrank_keywords: TextRank over the word co-occurrence graph —
  undirected edges = symmetrized bigram counts (self-loops dropped),
  weighted PageRank r <- 0.15 + 0.85 * SUM_j w_ij * r_j / wdeg_j run
  as INTEGER fixed-point (micros; per-pair contribution w*r // wdeg
  floors deterministically, the katz/pagerank discipline), 3
  iterations; top-10 words by (rank DESC, word).  The edge aggregate
  is distributed (the chao1 bigram shuffle); the iteration runs on
  vocab-sized state (the BPE ≤64-row-driver-argmax precedent — graph
  state is vocabulary-bounded, not corpus-bounded).  NOTE the
  synthetic vocab saturates at ~31 words, so the graph is small but
  the rank ordering is still count-driven and non-degenerate.
- abc_analysis_parts: ABC inventory classification of parts by
  lineitem revenue (exact cents): parts ranked by (revenue DESC,
  partkey), class A while cum*5 <= total*4 (<= 80%), B while
  cum*20 <= total*19 (<= 95%), else C — boundary decisions are exact
  integer comparisons, no float shares until the reported share6.
- siegel_slope_daily: Siegel repeated-medians slope of daily revenue
  (50% breakdown, vs the single-median Theil-Sen already in the
  suite): med_i = exact disc median over j != i of the 1e-2-quantized
  pairwise slope (y_j - y_i)*100/(t_j - t_i) (the 1e-2 scale keeps
  quantized slopes ~1e12 << 2^52 at sf0.1), final slope = disc
  median of the medians.  O(n^2) = 1.2e6 pairs on the O(days)
  driver-side series / a self-join in SQL; quantile_disc's
  ceil(q*n) rank rule mirrors the Python rank walk.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000
_TR_SCALE = 1_000_000
_TR_ITERS = 3


# ---------------------------------------------------------------------------
# TextRank keywords
# ---------------------------------------------------------------------------


def q_textrank_keywords(sf_dir: str):
    """TextRank top-10 keywords via integer fixed-point over the
    symmetrized bigram graph (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["text"])

    def wpart(t: pa.Table) -> pa.Table:
        a_l: list[str] = []
        b_l: list[str] = []
        for txt in t["text"].to_pylist():
            ts = txt.split()
            for x, y in zip(ts[:-1], ts[1:]):
                if x == y:
                    continue
                a_l.append(x)
                b_l.append(y)
        if not a_l:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "w": pa.array([], pa.int64())})
        df = pd.DataFrame({"a": a_l, "b": b_l, "w": np.int64(1)})
        g = df.groupby(["a", "b"], sort=False).sum().reset_index()
        g["w"] = g["w"].astype(np.int64)
        return _strip(g)

    edges = (ds.map_batches(wpart, batch_format="pyarrow")
               .groupby(["a", "b"]).aggregate(Sum("w", alias_name="w"))
               .to_pandas())
    # symmetrize on the driver: vocabulary-bounded state
    wmap: dict[tuple, int] = {}
    for a, b, w in zip(edges["a"], edges["b"], edges["w"]):
        k = (a, b) if a < b else (b, a)
        wmap[k] = wmap.get(k, 0) + int(w)
    adj: dict[str, dict[str, int]] = {}
    for (a, b), w in wmap.items():
        adj.setdefault(a, {})[b] = w
        adj.setdefault(b, {})[a] = w
    wdeg = {v: sum(nb.values()) for v, nb in adj.items()}
    rank = {v: _TR_SCALE for v in adj}
    for _ in range(_TR_ITERS):
        rank = {v: _TR_SCALE * 15 // 100
                + 85 * sum(w * rank[u] // wdeg[u]
                           for u, w in adj[v].items()) // 100
                for v in adj}
    top = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = pd.DataFrame(top, columns=["word", "rank_q"])
    out["rank_q"] = out["rank_q"].astype(np.int64)
    return out


def _textrank_sql() -> str:
    head = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w,
         generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS i
  FROM documents),
bg AS (
  SELECT a.w AS wa, b.w AS wb, count(*)::BIGINT AS w
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE a.w <> b.w GROUP BY 1, 2),
e AS (
  SELECT least(wa, wb) AS a, greatest(wa, wb) AS b, sum(w)::BIGINT AS w
  FROM bg GROUP BY 1, 2),
ud AS (SELECT a AS u, b AS v, w FROM e UNION ALL SELECT b, a, w FROM e),
wd AS (SELECT u, sum(w)::BIGINT AS wdeg FROM ud GROUP BY 1),
r0 AS (SELECT u AS node, {S}::BIGINT AS r FROM wd)"""
    steps = []
    for i in range(1, _TR_ITERS + 1):
        steps.append(f""",
r{i} AS (
  SELECT ud.v AS node,
         {{S}} * 15 // 100
           + 85 * sum(ud.w * r{i-1}.r // wd.wdeg) // 100 AS r
  FROM ud JOIN r{i-1} ON r{i-1}.node = ud.u
  JOIN wd ON wd.u = ud.u
  GROUP BY 1)""")
    tail = f"""
SELECT node AS word, r::BIGINT AS rank_q FROM r{_TR_ITERS}
ORDER BY r DESC, node LIMIT 10"""
    return (head + "".join(steps) + tail).replace("{S}", str(_TR_SCALE))


SQL_TEXTRANK = _textrank_sql()


# ---------------------------------------------------------------------------
# ABC analysis
# ---------------------------------------------------------------------------


def q_abc_analysis_parts(sf_dir: str):
    """ABC classification of parts by revenue, exact-int boundaries
    (docstring above)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_extendedprice", "l_discount"])

    def rpart(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = pd.DataFrame({
            "part": t["l_partkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "rc": _cents(rev).to_numpy(zero_copy_only=False)})
        g = df.groupby("part", sort=False)["rc"].sum().reset_index()
        g["rc"] = g["rc"].astype(np.int64)
        return _strip(g)

    per_part = (ds.map_batches(rpart, batch_format="pyarrow")
                  .groupby("part").aggregate(Sum("rc", alias_name="rc"))
                  .to_pandas())
    per_part = per_part.sort_values(["rc", "part"],
                                    ascending=[False, True])
    rc = per_part["rc"].to_numpy(np.int64)
    total = int(rc.sum())
    cum = np.cumsum(rc)
    cls = np.where(cum * 5 <= total * 4, "A",
                   np.where(cum * 20 <= total * 19, "B", "C"))
    df = pd.DataFrame({"abc": cls, "n_parts": np.int64(1), "rc": rc})
    g = df.groupby("abc").sum().reset_index().sort_values("abc")
    g["share6"] = _round6(np.array(
        [float(int(v)) / float(total) for v in g["rc"]]))
    out = pd.DataFrame({"abc": g["abc"],
                        "n_parts": g["n_parts"].astype(np.int64),
                        "revenue_c": g["rc"].astype(np.int64),
                        "share6": g["share6"]}).reset_index(drop=True)
    return out


SQL_ABC = """
WITH pr AS (
  SELECT l_partkey AS part,
         sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                  AS BIGINT))::BIGINT AS rc
  FROM lineitem GROUP BY 1),
t AS (SELECT sum(rc)::BIGINT AS total FROM pr),
c AS (
  SELECT rc, sum(rc) OVER (ORDER BY rc DESC, part)::BIGINT AS cum, total
  FROM pr CROSS JOIN t),
k AS (
  SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
              WHEN cum * 20 <= total * 19 THEN 'B'
              ELSE 'C' END AS abc,
         rc, total
  FROM c)
SELECT abc, count(*)::BIGINT AS n_parts, sum(rc)::BIGINT AS revenue_c,
       round(CAST(sum(rc) AS DOUBLE) / CAST(max(total) AS DOUBLE), 6)
         AS share6
FROM k GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Siegel repeated-medians slope
# ---------------------------------------------------------------------------


def q_siegel_slope_daily(sf_dir: str):
    """Siegel repeated-medians slope on quantized pairwise slopes
    (docstring above)."""
    y = _daily_cents(sf_dir)["c"].to_numpy(np.int64).astype(np.float64)
    n = len(y)
    t = np.arange(n, dtype=np.float64)
    meds = np.empty(n, np.int64)
    for i in range(n):
        dy = np.delete(y, i) - y[i]
        dt = np.delete(t, i) - t[i]
        s = dy * 100.0 / dt
        q = np.where(s >= 0, np.floor(s + 0.5),
                     np.ceil(s - 0.5)).astype(np.int64)
        q.sort()
        meds[i] = q[math.ceil(0.5 * len(q)) - 1]
    meds.sort()
    final = int(meds[math.ceil(0.5 * n) - 1])
    out = pd.DataFrame({"n_days": [n], "slope_q": [final],
                        "slope6": [_round6(np.array(
                            [final / 100.0]))[0]]})
    for col in ("n_days", "slope_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SIEGEL = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
seq AS (SELECT c, row_number() OVER (ORDER BY day) - 1 AS t FROM daily),
sl AS (
  SELECT a.t AS i,
         CAST(round(CAST(b.c - a.c AS DOUBLE) * 100.0
                    / (b.t - a.t)) AS BIGINT) AS s
  FROM seq a JOIN seq b ON b.t <> a.t),
med AS (SELECT i, quantile_disc(s, 0.5) AS m FROM sl GROUP BY 1),
f AS (SELECT count(*)::BIGINT AS n, quantile_disc(m, 0.5)::BIGINT AS mm
      FROM med)
SELECT n AS n_days, mm AS slope_q,
       round(CAST(mm AS DOUBLE) / 100.0, 6) AS slope6
FROM f
"""


QUERIES80: dict[str, tuple] = {
    "textrank_keywords": (q_textrank_keywords, SQL_TEXTRANK),
    "abc_analysis_parts": (q_abc_analysis_parts, SQL_ABC),
    "siegel_slope_daily": (q_siegel_slope_daily, SQL_SIEGEL),
}
