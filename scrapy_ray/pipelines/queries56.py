"""Fifty-sixth oracle-query batch — single-frequency spectral mass /
robust quantile shape / directed-graph dyads:

- weekly_periodogram_power: the periodogram ordinate of daily
  kilodollar revenue at the weekly frequency 1/7 — with period-7
  weights there are only SEVEN distinct cos/sin values, embedded as
  1e-9-unit integer LITERALS in both the Ray code and the SQL (the
  SPRT embedded-literal discipline), so Sc = sum y_t*cw[t%7] and
  Ss are exact integers, mean-centering rides the d_t = n*y_t - S
  trick (Dc = n*Sc - S*W with W = sum of weights over the actual day
  index pattern), and both the ordinate
  I(1/7) = (Dc^2+Ds^2)/(n^3*1e18) and the variance share
  2*(Dc^2+Ds^2)/(1e18*n*sum d^2) are single floats of exact integers
  (Dc ~ 1.4e20 at sf1 -> Python int / HUGEINT).
- bowley_moors_order_value: robust quantile-based shape — Bowley
  (quartile) skewness and Moors (octile) kurtosis of order value in
  dollars, all eight octiles walked from ONE bounded (dollar, count)
  histogram at the DuckDB quantile_disc rank convention; two float
  divisions of exact integers.
- graph_reciprocity_docs: directed reciprocity + full dyad census of
  the quadratic doc graph u -> (u^2+c) mod N, c in 1..3 (self-loops
  dropped, parallel edges deduped — the degree_assortativity graph):
  mutual/asymmetric/null dyad counts are exact integers (probed
  non-degenerate: 10 mutual dyads at every scale); reciprocity
  r = mutual_directed/edges identical-expression.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000
_WP_SCALE = 10**9
# period-7 cosine/sine weights as exact integer literals (units 1e-9)
_CW = [int(math.floor(abs(math.cos(2.0 * math.pi * r / 7.0))
                      * _WP_SCALE + 0.5))
       * (1 if math.cos(2.0 * math.pi * r / 7.0) >= 0 else -1)
       for r in range(7)]
_SW = [int(math.floor(abs(math.sin(2.0 * math.pi * r / 7.0))
                      * _WP_SCALE + 0.5))
       * (1 if math.sin(2.0 * math.pi * r / 7.0) >= 0 else -1)
       for r in range(7)]


# ---------------------------------------------------------------------------
# weekly periodogram
# ---------------------------------------------------------------------------


def q_weekly_periodogram_power(sf_dir: str):
    """Periodogram ordinate + variance share at frequency 1/7 on daily
    kilodollar revenue (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    yv = np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)
    y = [int(v) for v in yv]
    n = len(y)
    s = sum(y)
    sc = sum(v * _CW[t % 7] for t, v in enumerate(y))
    ss = sum(v * _SW[t % 7] for t, v in enumerate(y))
    wc = sum(_CW[t % 7] for t in range(n))
    ws = sum(_SW[t % 7] for t in range(n))
    dc = n * sc - s * wc                     # centered, exact
    dsn = n * ss - s * ws
    d = [n * v - s for v in y]
    g0 = sum(v * v for v in d)               # n^2 * sum (y-mean)^2
    i7 = (float(dc * dc + dsn * dsn)
          / (float(n) * float(n) * float(n) * 1e18))
    share = (2.0 * float(dc * dc + dsn * dsn)
             / (1e18 * float(n) * float(g0)))
    r6 = _round6(np.array([i7, share]))
    out = pd.DataFrame({"n_days": [n], "i7_6": [r6[0]],
                        "share7_6": [r6[1]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


_WP_CW_SQL = "[" + ", ".join(str(v) for v in _CW) + "]"
_WP_SW_SQL = "[" + ", ".join(str(v) for v in _SW) + "]"

SQL_WEEKLY_PERIODOGRAM = f"""
WITH dc0 AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d0 AS (
  SELECT CAST(round(c / 100000.0) AS BIGINT) AS y,
         (row_number() OVER (ORDER BY day) - 1) AS t
  FROM dc0),
w AS (
  SELECT y, t,
         ({_WP_CW_SQL})[CAST(t % 7 AS INT) + 1]::HUGEINT AS cw,
         ({_WP_SW_SQL})[CAST(t % 7 AS INT) + 1]::HUGEINT AS sw
  FROM d0),
st AS (
  SELECT count(*)::HUGEINT AS n, sum(y)::HUGEINT AS s,
         sum(y::HUGEINT * cw) AS sc, sum(y::HUGEINT * sw) AS ss,
         sum(cw)::HUGEINT AS wc, sum(sw)::HUGEINT AS ws
  FROM w),
dd AS (
  SELECT st.n, (st.n * sc - st.s * wc) AS dc,
         (st.n * ss - st.s * ws) AS dsn,
         (SELECT sum((n2.n * y - n2.s) * (n2.n * y - n2.s))
          FROM d0, st AS n2) AS g0
  FROM st)
SELECT n::BIGINT AS n_days,
       round(CAST(dc * dc + dsn * dsn AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                * CAST(n AS DOUBLE) * 1e18), 6) AS i7_6,
       round(2.0 * CAST(dc * dc + dsn * dsn AS DOUBLE)
             / (1e18 * CAST(n AS DOUBLE) * CAST(g0 AS DOUBLE)), 6)
         AS share7_6
FROM dd
"""


# ---------------------------------------------------------------------------
# Bowley / Moors
# ---------------------------------------------------------------------------


def q_bowley_moors_order_value(sf_dir: str):
    """Bowley skewness + Moors kurtosis from the exact dollar octiles
    (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        y = (t["o_totalprice"].to_numpy(zero_copy_only=False)
             .astype(np.float64))
        d = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        u, cnt = np.unique(d, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "cnt": pa.array(cnt.astype(np.int64))})

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby("v").aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas()).sort_values("v")   # bounded by dollar range
    vals = cells["v"].to_numpy(np.int64)
    cum = cells["cnt"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    e = {}
    for i in range(1, 8):
        rank = int(math.ceil(i / 8.0 * n))
        e[i] = int(vals[int(np.searchsorted(cum, rank))])
    bowley = (float(e[6] - 2 * e[4] + e[2])
              / float(e[6] - e[2]))
    moors = (float((e[7] - e[5]) + (e[3] - e[1]))
             / float(e[6] - e[2]))
    r6 = _round6(np.array([bowley, moors]))
    out = pd.DataFrame({
        "n": [n], "e1": [e[1]], "e2": [e[2]], "e3": [e[3]], "e4": [e[4]],
        "e5": [e[5]], "e6": [e[6]], "e7": [e[7]],
        "bowley6": [r6[0]], "moors6": [r6[1]]})
    for col in ("n", "e1", "e2", "e3", "e4", "e5", "e6", "e7"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BOWLEY = """
WITH d AS (
  SELECT CAST(round(o_totalprice) AS BIGINT) AS v FROM orders),
q AS (
  SELECT count(*)::BIGINT AS n,
         quantile_disc(v, 0.125)::BIGINT AS e1,
         quantile_disc(v, 0.25)::BIGINT AS e2,
         quantile_disc(v, 0.375)::BIGINT AS e3,
         quantile_disc(v, 0.5)::BIGINT AS e4,
         quantile_disc(v, 0.625)::BIGINT AS e5,
         quantile_disc(v, 0.75)::BIGINT AS e6,
         quantile_disc(v, 0.875)::BIGINT AS e7
  FROM d)
SELECT n, e1, e2, e3, e4, e5, e6, e7,
       round(CAST(e6 - 2 * e4 + e2 AS DOUBLE)
             / CAST(e6 - e2 AS DOUBLE), 6) AS bowley6,
       round(CAST((e7 - e5) + (e3 - e1) AS DOUBLE)
             / CAST(e6 - e2 AS DOUBLE), 6) AS moors6
FROM q
"""


# ---------------------------------------------------------------------------
# reciprocity / dyad census
# ---------------------------------------------------------------------------


def q_graph_reciprocity_docs(sf_dir: str):
    """Directed reciprocity + dyad census of the quadratic doc graph
    (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["doc_id"])
    nn = _nrows(sf_dir, "documents")    # parquet footer, no Dataset pass

    def edges(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us, vs = [], []
        for cc in (1, 2, 3):
            v = (u * u + cc) % nn
            keep = v != u
            us.append(u[keep])
            vs.append(v[keep])
        uu = np.concatenate(us)
        vv = np.concatenate(vs)
        # dedup parallel edges within the block; the groupby below
        # finishes the global dedup
        key = pd.DataFrame({"u": uu, "v": vv}).drop_duplicates()
        # canonical dyad key + direction flag: min->max with a bit for
        # each direction present
        a = key["u"].to_numpy(np.int64)
        b = key["v"].to_numpy(np.int64)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        fwd = (a < b)
        out = pd.DataFrame({"lo": lo, "hi": hi,
                            "f": fwd.astype(np.int64),
                            "r": (~fwd).astype(np.int64)})
        g = out.groupby(["lo", "hi"], sort=False).max().reset_index()
        for col in ("lo", "hi", "f", "r"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    from ray.data.aggregate import Max
    dyads = (ds.map_batches(edges, batch_format="pyarrow")
               .groupby(["lo", "hi"])
               .aggregate(Max("f", alias_name="f"),
                          Max("r", alias_name="r"))
               .to_pandas())
    f = dyads["f"].to_numpy(np.int64)
    r = dyads["r"].to_numpy(np.int64)
    mutual = int(((f == 1) & (r == 1)).sum())
    asym = int(len(dyads)) - mutual
    edges_total = int(f.sum()) + int(r.sum())
    null = nn * (nn - 1) // 2 - mutual - asym
    rec = float(2 * mutual) / float(edges_total)
    out = pd.DataFrame({"n_nodes": [nn], "n_edges": [edges_total],
                        "mutual": [mutual], "asym": [asym],
                        "null_dyads": [null],
                        "reciprocity6": [_round6(np.array([rec]))[0]]})
    for col in ("n_nodes", "n_edges", "mutual", "asym", "null_dyads"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RECIPROCITY = """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
e AS (
  SELECT DISTINCT doc_id AS u,
         (doc_id * doc_id + c) % nn.n AS v
  FROM documents, nn, (SELECT unnest([1, 2, 3]) AS c)
  WHERE doc_id != (doc_id * doc_id + c) % nn.n),
dy AS (
  SELECT least(u, v) AS lo, greatest(u, v) AS hi,
         max((u < v)::INT)::BIGINT AS f,
         max((u > v)::INT)::BIGINT AS r
  FROM e GROUP BY 1, 2),
agg AS (
  SELECT count(*)::BIGINT AS n_dyads,
         sum(CASE WHEN f = 1 AND r = 1 THEN 1 ELSE 0 END)::BIGINT
           AS mutual,
         (sum(f) + sum(r))::BIGINT AS n_edges
  FROM dy)
SELECT nn.n AS n_nodes, agg.n_edges, agg.mutual,
       (agg.n_dyads - agg.mutual)::BIGINT AS asym,
       (nn.n * (nn.n - 1) // 2 - agg.n_dyads)::BIGINT AS null_dyads,
       round(CAST(2 * agg.mutual AS DOUBLE)
             / CAST(agg.n_edges AS DOUBLE), 6) AS reciprocity6
FROM agg, nn
"""


QUERIES56: dict[str, tuple] = {
    "weekly_periodogram_power": (q_weekly_periodogram_power,
                                 SQL_WEEKLY_PERIODOGRAM),
    "bowley_moors_order_value": (q_bowley_moors_order_value, SQL_BOWLEY),
    "graph_reciprocity_docs": (q_graph_reciprocity_docs,
                               SQL_RECIPROCITY),
}
