"""One-hundred-thirty-second oracle-query batch — walk census,
positional retrieval, and long-range-dependence testing:

- closed_walks_docs: traces of A¹..A⁴ on the directed quadratic doc
  graph (u → (u²+c) % n, c ∈ 1..3; the +c targets are always
  distinct). trace(A^k) counts (start, c-sequence) tuples returning
  to the start, so the Ray side enumerates all 3^k compositions
  VECTORIZED per batch (zero shuffles — counts only) while the
  oracle chains k equi-joins over the edge set. The truncated
  Estrada index n + t1 + t2/2 + t3/6 + t4/24 finalizes identically.
- proximity_search_docs: positional co-occurrence of the two most
  frequent corpus words (count desc, word asc): docs containing
  both, docs where they appear within 5 token positions, and the
  total number of such close pairs — all exact integer counts.
- lo_modified_rs_daily: Lo's modified rescaled-range test on daily
  revenue cents — the range of cleared partial sums P_t = n·C_t − t·S
  (exact ints) over the Bartlett q=7 long-run variance built from the
  same exact G_k device as kpss_daily; the classic (q=0) R/S
  statistic rides along.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _US_PER_DAY, _daily_cents
from scrapy_ray.pipelines.queries118 import _corpus_word_counts

_RS_Q = 7


# ---------------------------------------------------------------------------
# Closed walks / truncated Estrada
# ---------------------------------------------------------------------------


def q_closed_walks_docs(sf_dir: str):
    """trace(A^1..A^4) + truncated Estrada (docstring above)."""
    n = _nrows(sf_dir, "documents")
    ds = _pq(sf_dir, "documents", columns=["doc_id"])

    def wpart(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        traces = []
        frontier = [u]                 # walk endpoints after k steps
        for _ in range(4):
            nxt = []
            for e in frontier:
                for c in (1, 2, 3):
                    nxt.append((e * e + c) % n)
            frontier = nxt
            traces.append(np.int64(sum(int((e == u).sum())
                                       for e in frontier)))
        return pa.table({"g": pa.array([0], pa.int64()),
                         "t1": pa.array([traces[0]], pa.int64()),
                         "t2": pa.array([traces[1]], pa.int64()),
                         "t3": pa.array([traces[2]], pa.int64()),
                         "t4": pa.array([traces[3]], pa.int64())})

    agg = (ds.map_batches(wpart, batch_format="pyarrow")
             .groupby("g").aggregate(Sum("t1", alias_name="t1"),
                                     Sum("t2", alias_name="t2"),
                                     Sum("t3", alias_name="t3"),
                                     Sum("t4", alias_name="t4"))
             .to_pandas())
    t1, t2, t3, t4 = (int(agg[c].iloc[0]) for c in
                      ("t1", "t2", "t3", "t4"))
    ee = (float(n) + float(t1) + float(t2) / 2.0 + float(t3) / 6.0
          + float(t4) / 24.0)
    out = pd.DataFrame({"n_nodes": [n], "t1": [t1], "t2": [t2],
                        "t3": [t3], "t4": [t4],
                        "estrada4_6": [_round6(np.array([ee]))[0]]})
    for col in ("n_nodes", "t1", "t2", "t3", "t4"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CLOSED_WALKS = """
WITH nd AS (SELECT count(*)::BIGINT AS n FROM documents),
e AS (
  SELECT d.doc_id AS u, (d.doc_id * d.doc_id + c.c) % nd.n AS v
  FROM documents d, (SELECT unnest([1, 2, 3]) AS c) c JOIN nd ON true),
t1 AS (SELECT count(*)::BIGINT AS t FROM e WHERE u = v),
t2 AS (
  SELECT count(*)::BIGINT AS t
  FROM e a JOIN e b ON b.u = a.v WHERE b.v = a.u),
t3 AS (
  SELECT count(*)::BIGINT AS t
  FROM e a JOIN e b ON b.u = a.v JOIN e c ON c.u = b.v
  WHERE c.v = a.u),
t4 AS (
  SELECT count(*)::BIGINT AS t
  FROM e a JOIN e b ON b.u = a.v JOIN e c ON c.u = b.v
         JOIN e d2 ON d2.u = c.v
  WHERE d2.v = a.u)
SELECT nd.n AS n_nodes, t1.t AS t1, t2.t AS t2, t3.t AS t3,
       t4.t AS t4,
       round(CAST(nd.n AS DOUBLE) + CAST(t1.t AS DOUBLE)
             + CAST(t2.t AS DOUBLE) / 2.0
             + CAST(t3.t AS DOUBLE) / 6.0
             + CAST(t4.t AS DOUBLE) / 24.0, 6) AS estrada4_6
FROM nd CROSS JOIN t1 CROSS JOIN t2 CROSS JOIN t3 CROSS JOIN t4
"""


# ---------------------------------------------------------------------------
# Proximity search
# ---------------------------------------------------------------------------


def q_proximity_search_docs(sf_dir: str):
    """Window-5 co-occurrence of the top-2 corpus words (docstring)."""
    cw = _corpus_word_counts(sf_dir)
    top = list(cw.sort_values(["cf", "w"], ascending=[False, True],
                              kind="mergesort").head(2)["w"])
    w1, w2 = top[0], top[1]

    ds = _pq(sf_dir, "documents", columns=["text"])

    def ppart(t: pa.Table) -> pa.Table:
        both = within = pairs = 0
        for txt in t["text"].to_pylist():
            ws = txt.split()
            p1 = [i for i, w in enumerate(ws) if w == w1]
            p2 = [i for i, w in enumerate(ws) if w == w2]
            if not p1 or not p2:
                continue
            both += 1
            cnt = 0
            a1 = np.array(p1, np.int64)
            for j in p2:
                cnt += int((np.abs(a1 - j) <= 5).sum())
            pairs += cnt
            if cnt:
                within += 1
        return pa.table({"g": pa.array([0], pa.int64()),
                         "both": pa.array([both], pa.int64()),
                         "within": pa.array([within], pa.int64()),
                         "pairs": pa.array([pairs], pa.int64())})

    agg = (ds.map_batches(ppart, batch_format="pyarrow")
             .groupby("g").aggregate(Sum("both", alias_name="both"),
                                     Sum("within", alias_name="within"),
                                     Sum("pairs", alias_name="pairs"))
             .to_pandas())
    out = pd.DataFrame({"w1": [w1], "w2": [w2],
                        "docs_both": [int(agg["both"].iloc[0])],
                        "docs_within5": [int(agg["within"].iloc[0])],
                        "pairs_within5": [int(agg["pairs"].iloc[0])]})
    for col in ("docs_both", "docs_within5", "pairs_within5"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PROXIMITY = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts
  FROM documents),
words AS (
  SELECT ts[i] AS w
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) r(i)),
cw AS (SELECT w, count(*)::BIGINT AS cf FROM words GROUP BY 1),
top2 AS (
  SELECT w, row_number() OVER (ORDER BY cf DESC, w) AS r
  FROM cw QUALIFY r <= 2),
pos AS (
  SELECT t.doc_id, t.ts[i] AS w, i
  FROM toks t, LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) r(i)
  WHERE t.ts[i] IN (SELECT w FROM top2)),
p1 AS (SELECT doc_id, i FROM pos
       WHERE w = (SELECT w FROM top2 WHERE r = 1)),
p2 AS (SELECT doc_id, i FROM pos
       WHERE w = (SELECT w FROM top2 WHERE r = 2)),
per AS (
  SELECT p1.doc_id,
         sum((abs(p1.i - p2.i) <= 5)::INT)::BIGINT AS cnt
  FROM p1 JOIN p2 USING (doc_id) GROUP BY 1)
SELECT (SELECT w FROM top2 WHERE r = 1) AS w1,
       (SELECT w FROM top2 WHERE r = 2) AS w2,
       (SELECT count(*) FROM per)::BIGINT AS docs_both,
       (SELECT sum((cnt > 0)::INT) FROM per)::BIGINT AS docs_within5,
       (SELECT sum(cnt) FROM per)::BIGINT AS pairs_within5
"""


# ---------------------------------------------------------------------------
# Lo's modified R/S
# ---------------------------------------------------------------------------


def q_lo_modified_rs_daily(sf_dir: str):
    """Lo's modified R/S with Bartlett q=7 (docstring above)."""
    cells = _daily_cents(sf_dir)
    x = [int(v) for v in cells["c"]]
    n = len(x)
    s = sum(x)
    e = [n * v - s for v in x]
    run = 0
    mx = mn = 0                        # P_0 = 0 included in the range
    for v in e:
        run += v
        mx = max(mx, run)
        mn = min(mn, run)
    g = []
    for k in range(_RS_Q + 1):
        g.append(sum(e[t] * e[t + k] for t in range(n - k)))
    b = float(g[0])
    for k in range(1, _RS_Q + 1):
        b = b + 2.0 * (1.0 - k / 8.0) * float(g[k])
    rng = float(mx - mn) / float(n)
    nf = float(n)
    q_lo = rng / (np.sqrt(nf) * np.sqrt(b / (nf * nf * nf)))
    q_cl = rng / (np.sqrt(nf)
                  * np.sqrt(float(g[0]) / (nf * nf * nf)))
    out = pd.DataFrame({"n_days": [n], "q_lag": [_RS_Q],
                        "range_scaled": [mx - mn],
                        "q_lo6": [_round6(np.array([q_lo]))[0]],
                        "q_classic6": [_round6(np.array([q_cl]))[0]]})
    for col in ("n_days", "q_lag", "range_scaled"):
        out[col] = out[col].astype(np.int64)
    return out


def _lo_rs_sql() -> str:
    gk = []
    for k in range(_RS_Q + 1):
        gk.append(f"""
  SELECT {k} AS k, sum(CAST(a.e AS HUGEINT) * b.e) AS g
  FROM e a JOIN e b ON b.t = a.t + {k}""")
    b = " + ".join(
        ["CAST((SELECT g FROM gk WHERE k = 0) AS DOUBLE)"]
        + [f"2.0 * {1.0 - k / 8.0!r} * "
           f"CAST((SELECT g FROM gk WHERE k = {k}) AS DOUBLE)"
           for k in range(1, _RS_Q + 1)])
    return f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
s AS (
  SELECT c AS v, row_number() OVER (ORDER BY day) AS t FROM daily),
ns AS (SELECT count(*)::BIGINT AS n, sum(v)::BIGINT AS sv FROM s),
e AS (
  SELECT t, CAST(n AS HUGEINT) * v - sv AS e
  FROM s CROSS JOIN ns),
gk AS ({" UNION ALL ".join(gk)}),
cs AS (
  SELECT greatest(max(p), 0) - least(min(p), 0) AS rng_scaled
  FROM (
    SELECT sum(e) OVER (ORDER BY t) AS p FROM e)),
f AS (
  SELECT n, rng_scaled,
         CAST(rng_scaled AS DOUBLE) / CAST(n AS DOUBLE) AS rng,
         ({b}) AS b,
         CAST((SELECT g FROM gk WHERE k = 0) AS DOUBLE) AS g0
  FROM ns CROSS JOIN cs)
SELECT n AS n_days, {_RS_Q}::BIGINT AS q_lag,
       rng_scaled::BIGINT AS range_scaled,
       round(rng / (sqrt(CAST(n AS DOUBLE))
             * sqrt(b / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                         * CAST(n AS DOUBLE)))), 6) AS q_lo6,
       round(rng / (sqrt(CAST(n AS DOUBLE))
             * sqrt(g0 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * CAST(n AS DOUBLE)))), 6) AS q_classic6
FROM f
"""


SQL_LO_RS = _lo_rs_sql()


QUERIES132: dict[str, tuple] = {
    "closed_walks_docs": (q_closed_walks_docs, SQL_CLOSED_WALKS),
    "proximity_search_docs": (q_proximity_search_docs, SQL_PROXIMITY),
    "lo_modified_rs_daily": (q_lo_modified_rs_daily, SQL_LO_RS),
}
