"""One-hundred-seventy-fourth oracle-query batch — network-flow and
space-time interaction kernels, all cleared to exact integers:

- max_flow_tripartite: maximum flow through the S → top-5 sources →
  langs → T network (arc caps: source supply = ⌊3/4·docs⌋, cell
  caps = (source, lang) doc counts, lang demand = ⌊3/4·docs⌋). With
  5+5 interior nodes, max-flow = min-cut is computed by EXACT
  enumeration of all 1024 (source-side, lang-side) cut masks — both
  sides replay the same integer enumeration, so the LP needs no
  augmenting-path machinery; the canonical argmin cut is reported.
- hall_matching_srclang: maximum bipartite matching between the 5
  langs and the 20 sources over edges with cell count ≥ the median
  nonzero cell — via Hall/König duality: matching = |L| − max over
  the 32 lang subsets of (|S| − |N(S)|), with per-source adjacency
  packed into 5-bit masks and popcounts via comprehensions.
- knox_spacetime: the Knox space-time interaction test on events —
  pairs close in time (≤10 min) AND in value (≤100 cents), vs the
  independence expectation N_t·N_s/C(n,2). Time-close pairs count
  through 10-minute buckets with adjacent-bucket cross terms
  (numpy broadcast per bucket inside salted partitions); value-close
  pairs collapse onto the exact cents histogram with prefix-sum
  window counting. All three pair counts are exact integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_W_US = 600_000_000
_D_CENTS = 100


def _srclang_cells(sf_dir: str) -> pd.DataFrame:
    ds = _pq(sf_dir, "documents", columns=["source", "lang"])

    def cpart(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({"source": t["source"].to_pylist(),
                           "lang": t["lang"].to_pylist(),
                           "one": np.int64(1)})
             .groupby(["source", "lang"], sort=False).sum()
             .reset_index())
        g["one"] = g["one"].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(cpart, batch_format="pyarrow")
              .groupby(["source", "lang"])
              .aggregate(Sum("one", alias_name="c"))
              .to_pandas())


# ---------------------------------------------------------------------------
# Tripartite max flow by min-cut enumeration
# ---------------------------------------------------------------------------


def q_max_flow_tripartite(sf_dir: str):
    """Max flow = exact min cut over 1024 masks (docstring above)."""
    cells = _srclang_cells(sf_dir)
    top5 = (cells.groupby("source")["c"].sum().reset_index()
            .sort_values(["c", "source"], ascending=[False, True])
            .head(5)["source"].tolist())
    langs = sorted(cells["lang"].unique().tolist())
    nl = len(langs)
    sub = cells[cells["source"].isin(top5)]
    cm = np.zeros((5, nl), np.int64)
    for _, r in sub.iterrows():
        cm[top5.index(r["source"]), langs.index(r["lang"])] = \
            int(r["c"])
    s_cap = (cm.sum(axis=1) * 3) // 4
    t_cap = (cm.sum(axis=0) * 3) // 4
    best = None
    for am in range(32):
        for bm in range(1 << nl):
            cut = 0
            for i in range(5):
                if (am >> i) & 1:
                    cut += int(s_cap[i])
            for j in range(nl):
                if (bm >> j) & 1:
                    cut += int(t_cap[j])
            for i in range(5):
                if not (am >> i) & 1:
                    for j in range(nl):
                        if not (bm >> j) & 1:
                            cut += int(cm[i, j])
            key = (cut, am, bm)
            if best is None or key < best:
                best = key
    flow, am, bm = best
    out = pd.DataFrame({"max_flow": [flow], "cut_src_mask": [am],
                        "cut_lang_mask": [bm],
                        "total_cells": [int(cm.sum())]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_MAX_FLOW = """
WITH cells AS (
  SELECT source, lang, count(*)::BIGINT AS c
  FROM documents GROUP BY 1, 2),
top5 AS (
  SELECT source, row_number() OVER
           (ORDER BY sum(c) DESC, source) AS si
  FROM cells GROUP BY source
  ORDER BY sum(c) DESC, source LIMIT 5),
langs AS (
  SELECT lang, row_number() OVER (ORDER BY lang) AS lj
  FROM (SELECT DISTINCT lang FROM cells)),
dense AS (
  SELECT t.si, l.lj, coalesce(c.c, 0)::BIGINT AS c
  FROM top5 t CROSS JOIN langs l
  LEFT JOIN cells c ON c.source = t.source AND c.lang = l.lang),
nl AS (SELECT count(*)::BIGINT AS nl FROM langs),
vecs AS (
  SELECT (SELECT list(c ORDER BY si * 100 + lj) FROM dense) AS cm,
         (SELECT list(s ORDER BY si)
          FROM (SELECT si, (sum(c) * 3) // 4 AS s
                FROM dense GROUP BY si)) AS sl,
         (SELECT list(t ORDER BY lj)
          FROM (SELECT lj, (sum(c) * 3) // 4 AS t
                FROM dense GROUP BY lj)) AS tl,
         (SELECT nl FROM nl) AS nl),
cuts AS (
  SELECT a.am, b.bm,
         coalesce(list_sum([sl[i] FOR i IN range(1, 6)
                            IF ((a.am >> (i - 1)) & 1) = 1]), 0)
         + coalesce(list_sum([tl[j] FOR j IN range(1, nl + 1)
                              IF ((b.bm >> (j - 1)) & 1) = 1]), 0)
         + coalesce(list_sum(
             [cm[ii] FOR ii IN range(1, 5 * nl + 1)
              IF ((a.am >> ((ii - 1) // nl)) & 1) = 0
                 AND ((b.bm >> ((ii - 1) % nl)) & 1) = 0]), 0)
           AS cut
  FROM vecs,
       LATERAL (SELECT unnest(range(0, 32)) AS am) a,
       LATERAL (SELECT unnest(range(0, 1 << nl)) AS bm) b),
best AS (SELECT * FROM cuts ORDER BY cut, am, bm LIMIT 1)
SELECT best.cut::BIGINT AS max_flow, best.am::BIGINT AS cut_src_mask,
       best.bm::BIGINT AS cut_lang_mask,
       (SELECT sum(c) FROM dense)::BIGINT AS total_cells
FROM best
"""


# ---------------------------------------------------------------------------
# Hall / König maximum matching
# ---------------------------------------------------------------------------


def q_hall_matching_srclang(sf_dir: str):
    """Max matching via Hall deficiency over lang subsets."""
    cells = _srclang_cells(sf_dir)
    nz = cells[cells["c"] > 0]["c"].to_numpy(np.int64)
    thr = int(np.sort(nz)[(len(nz) + 1) // 2 - 1])  # lower median
    langs = sorted(cells["lang"].unique().tolist())
    nl = len(langs)
    edges = cells[cells["c"] >= thr]
    adj: dict[str, int] = {}
    for _, r in edges.iterrows():
        adj[r["source"]] = adj.get(r["source"], 0) \
            | (1 << langs.index(r["lang"]))
    masks = list(adj.values())
    best = None
    for m in range(1 << nl):
        pc = bin(m).count("1")
        ns = sum(1 for a in masks if a & m)
        d = pc - ns
        key = (-d, m)
        if best is None or key < best:
            best = key
    maxdef, mmask = -best[0], best[1]
    out = pd.DataFrame({"threshold": [thr],
                        "n_edges": [len(edges)],
                        "max_matching": [nl - maxdef],
                        "max_deficiency": [maxdef],
                        "worst_mask": [mmask]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_HALL = """
WITH cells AS (
  SELECT source, lang, count(*)::BIGINT AS c
  FROM documents GROUP BY 1, 2),
thr AS (SELECT quantile_disc(c, 0.5) AS t FROM cells WHERE c > 0),
langs AS (
  SELECT lang, row_number() OVER (ORDER BY lang) AS lj
  FROM (SELECT DISTINCT lang FROM cells)),
nl AS (SELECT count(*)::BIGINT AS nl FROM langs),
edges AS (
  SELECT c.source, l.lj
  FROM cells c JOIN langs l ON l.lang = c.lang
  WHERE c.c >= (SELECT t FROM thr)),
adj AS (
  SELECT source, sum(1 << (lj - 1))::BIGINT AS am
  FROM edges GROUP BY source),
defs AS (
  SELECT m.m,
         coalesce(list_sum([1 FOR b IN range(0, n2.nl)
                            IF ((m.m >> b) & 1) = 1]), 0)
         - (SELECT count(*) FROM adj
            WHERE (adj.am & m.m) <> 0) AS d
  FROM nl n2,
       LATERAL (SELECT unnest(range(0, 1 << n2.nl)) AS m) m),
best AS (SELECT * FROM defs ORDER BY d DESC, m LIMIT 1)
SELECT (SELECT t FROM thr)::BIGINT AS threshold,
       (SELECT count(*) FROM edges)::BIGINT AS n_edges,
       ((SELECT nl FROM nl) - best.d)::BIGINT AS max_matching,
       best.d::BIGINT AS max_deficiency,
       best.m::BIGINT AS worst_mask
FROM best
"""


# ---------------------------------------------------------------------------
# Knox space-time interaction
# ---------------------------------------------------------------------------


def q_knox_spacetime(sf_dir: str):
    """Knox close-pair counts and independence ratio (docstring)."""
    ds = _pq(sf_dir, "events", columns=["ts", "value"])

    def bucketize(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        bk = us // _W_US
        own = pa.table({"t": pa.array(us), "c": pa.array(c),
                        "bk": pa.array(bk),
                        "pk": pa.array(bk % 64),
                        "own": pa.array(np.ones(len(us), np.int8))})
        nxt = pa.table({"t": pa.array(us), "c": pa.array(c),
                        "bk": pa.array(bk - 1),
                        "pk": pa.array((bk - 1) % 64),
                        "own": pa.array(np.zeros(len(us), np.int8))})
        return pa.concat_tables([own, nxt])

    def pair_count(df: pd.DataFrame) -> pd.DataFrame:
        nt = 0
        nb = 0
        for _, g in df.groupby("bk", sort=False):
            to = g[g["own"] == 1]["t"].to_numpy(np.int64)
            co = g[g["own"] == 1]["c"].to_numpy(np.int64)
            tn = g[g["own"] == 0]["t"].to_numpy(np.int64)
            cn = g[g["own"] == 0]["c"].to_numpy(np.int64)
            if len(to) > 1:
                dt = to[None, :] - to[:, None]
                close = np.triu(np.abs(dt) <= _W_US, k=1)
                nt += int(close.sum())
                dv = np.abs(co[None, :] - co[:, None]) <= _D_CENTS
                nb += int((close & dv).sum())
            if len(to) and len(tn):
                dt = tn[None, :] - to[:, None]
                close = (dt >= 0) & (dt <= _W_US)
                # cross-bucket: next-bucket ts are strictly greater
                # buckets, so every pair is ordered and distinct
                nt += int(close.sum())
                dv = np.abs(cn[None, :] - co[:, None]) <= _D_CENTS
                nb += int((close & dv).sum())
        return pd.DataFrame({"nt": [np.int64(nt)],
                             "nb": [np.int64(nb)]})

    parts = (ds.map_batches(bucketize, batch_format="pyarrow")
               .groupby("pk").map_groups(pair_count,
                                         batch_format="pandas")
               .to_pandas())
    nt = int(parts["nt"].sum())
    nb = int(parts["nb"].sum())

    ds2 = _pq(sf_dir, "events", columns=["value"])

    def chist(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"c": c, "n": np.int64(1)}) \
            .groupby("c", sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    hist = (ds2.map_batches(chist, batch_format="pyarrow")
               .groupby("c").aggregate(Sum("n", alias_name="n"))
               .to_pandas().sort_values("c").reset_index(drop=True))
    cv = hist["c"].to_numpy(np.int64)
    nv = hist["n"].to_numpy(np.int64)
    n = int(nv.sum())
    pref = np.concatenate([[0], np.cumsum(nv)])
    hi = np.searchsorted(cv, cv + _D_CENTS, side="right")
    lo = np.arange(1, len(cv) + 1)
    ns = int((nv * (pref[hi] - pref[lo])).sum()) \
        + int((nv * (nv - 1) // 2).sum())
    npairs = n * (n - 1) // 2
    exp = float(nt) * float(ns) / float(npairs)
    r6 = _round6(np.array([exp, float(nb) / exp]))
    out = pd.DataFrame({"n_events": [n], "nt_pairs": [nt],
                        "ns_pairs": [ns], "both_pairs": [nb],
                        "expected6": [r6[0]], "ratio6": [r6[1]]})
    for col in ("n_events", "nt_pairs", "ns_pairs", "both_pairs"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KNOX = f"""
WITH e AS (
  SELECT epoch_us(ts) AS t,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
tp AS (
  -- b.t <= a.t + W keeps both predicates simple so DuckDB's IEJoin
  -- applies (the b.t - a.t <= W form nested-loops: 40 s vs 0.2 s)
  SELECT count(*)::BIGINT AS nt,
         sum((abs(a.c - b.c) <= {_D_CENTS})::INT)::BIGINT AS nb
  FROM e a, e b
  WHERE b.t > a.t AND b.t <= a.t + {_W_US}),
dup AS (SELECT t, count(*)::BIGINT AS k FROM e
        GROUP BY t HAVING count(*) > 1),
teq AS (
  -- equal-timestamp pairs (zero groups in current testdata, exact
  -- anyway): unordered close pairs = (ordered incl. self - k) / 2
  SELECT coalesce(sum(k * (k - 1) // 2), 0)::BIGINT AS nt,
         ((SELECT coalesce(sum((abs(a.c - b.c)
                                <= {_D_CENTS})::INT), 0)
           FROM e a JOIN dup d ON a.t = d.t
                    JOIN e b ON b.t = a.t)
          - coalesce(sum(k), 0)) // 2 AS nb
  FROM dup),
ch AS (SELECT c, count(*)::BIGINT AS n FROM e GROUP BY c),
ns AS (
  SELECT (SELECT coalesce(sum(a.n * b.n), 0)
          FROM ch a, ch b
          WHERE b.c > a.c AND b.c - a.c <= {_D_CENTS})::BIGINT
         + (SELECT sum(n * (n - 1) // 2) FROM ch)::BIGINT AS ns),
tot AS (SELECT count(*)::BIGINT AS n FROM e),
f AS (
  SELECT tot.n,
         ((SELECT nt FROM tp) + (SELECT nt FROM teq))::BIGINT
           AS nt0,
         ((SELECT nb FROM tp) + (SELECT nb FROM teq))::BIGINT
           AS nb0,
         (SELECT ns FROM ns)::BIGINT AS ns
  FROM tot)
SELECT n AS n_events, nt0 AS nt_pairs, ns AS ns_pairs,
       nb0 AS both_pairs,
       round(CAST(nt0 AS DOUBLE) * CAST(ns AS DOUBLE)
             / CAST(n * (n - 1) // 2 AS DOUBLE), 6) AS expected6,
       round(CAST(nb0 AS DOUBLE)
             / (CAST(nt0 AS DOUBLE) * CAST(ns AS DOUBLE)
                / CAST(n * (n - 1) // 2 AS DOUBLE)), 6) AS ratio6
FROM f
"""


QUERIES174: dict[str, tuple] = {
    "max_flow_tripartite": (q_max_flow_tripartite, SQL_MAX_FLOW),
    "hall_matching_srclang": (q_hall_matching_srclang, SQL_HALL),
    "knox_spacetime": (q_knox_spacetime, SQL_KNOX),
}
