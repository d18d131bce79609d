"""One-hundred-eighty-seventh oracle-query batch — social choice and
link-based similarity:

- schulze_method_types: the Schulze (beatpath) election over the 5
  event types with days as ballots (rank by daily count desc, type
  asc). Pairwise wins d[a][b] are exact integers; widest paths via
  a 5-level max–min Floyd–Warshall LIST replay; the winner is the
  canonical type beating or tying every beatpath comparison.
- simrank_sources: SimRank (C = 0.8, 10 iterations) on the top-5
  source graph thresholded at the lower-median pair weight —
  neighbor-pair sums gated by adjacency bitmasks, the 25-entry
  similarity state requantized to 1e-12 integers every iteration
  (zero-degree guard), reporting the most-similar off-diagonal pair
  and the mean off-diagonal similarity.
- plackett_luce_types: the Plackett–Luce ranking model fit by 3
  Hunter MM iterations on the daily rankings — stage choice sets as
  5-bit masks (120 rows), support weights carried as five explicit
  integer-quantized COLUMNS (no nested-list indexing anywhere),
  per-stage reciprocal terms quantized 1e-12 pre-sum; outputs the
  normalized support per type.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries179 import _overlap_graph, _SQL_GRAPH

_SR_C = 0.8
_SR_IT = 10
_PL_IT = 3


def _daily_rankings(sf_dir: str) -> tuple[list, list[list[int]]]:
    """(sorted type names, per-day ranking as 1-based type indices
    ordered by count desc, type asc), from the distributed daily
    type-count cells."""
    from ray.data.aggregate import Sum
    from scrapy_ray.pipelines.queries47 import _strip

    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist())
        g = pd.DataFrame({"day": day, "et": et,
                          "n": np.int64(1)}) \
            .groupby(["day", "et"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby(["day", "et"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    names = sorted(cells["et"].unique().tolist())
    idx = {n: i + 1 for i, n in enumerate(names)}
    ranks = []
    for _, grp in cells.groupby("day", sort=True):
        grp = grp.sort_values(["n", "et"],
                              ascending=[False, True])
        r = [idx[e] for e in grp["et"]]
        for nm in names:                   # absent types rank last
            if idx[nm] not in r:
                r.append(idx[nm])
        ranks.append(r)
    return names, ranks


# ---------------------------------------------------------------------------
# Schulze method
# ---------------------------------------------------------------------------


def q_schulze_method_types(sf_dir: str):
    """Beatpath winner over daily type rankings (docstring)."""
    names, ranks = _daily_rankings(sf_dir)
    k = len(names)
    d = [[0] * (k + 1) for _ in range(k + 1)]
    for r in ranks:
        for pi in range(k):
            for pj in range(pi + 1, k):
                d[r[pi]][r[pj]] += 1
    p = [[0] * (k + 1) for _ in range(k + 1)]
    for a in range(1, k + 1):
        for b in range(1, k + 1):
            if a != b and d[a][b] > d[b][a]:
                p[a][b] = d[a][b]
    for m in range(1, k + 1):
        for a in range(1, k + 1):
            for b in range(1, k + 1):
                if a != b and m not in (a, b):
                    p[a][b] = max(p[a][b], min(p[a][m], p[m][b]))
    winners = [a for a in range(1, k + 1)
               if all(p[a][b] >= p[b][a]
                      for b in range(1, k + 1) if b != a)]
    wname = names[min(winners) - 1]
    psum = sum(p[a][b] for a in range(1, k + 1)
               for b in range(1, k + 1))
    out = pd.DataFrame({"winner": [wname],
                        "n_winners": [len(winners)],
                        "p_sum": [psum], "n_ballots": [len(ranks)]})
    for col in ("n_winners", "p_sum", "n_ballots"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SCHULZE = """
WITH RECURSIVE cells AS (
  SELECT CAST(ts AS DATE) AS day, event_type AS et,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
types AS (
  SELECT et, row_number() OVER (ORDER BY et) AS ti
  FROM (SELECT DISTINCT et FROM cells)),
days AS (SELECT DISTINCT day FROM cells),
dense AS (
  SELECT d.day, t.et, t.ti, coalesce(c.n, 0)::BIGINT AS n
  FROM days d CROSS JOIN types t
  LEFT JOIN cells c ON c.day = d.day AND c.et = t.et),
rk AS (
  SELECT day, ti,
         row_number() OVER (PARTITION BY day
                            ORDER BY n DESC, et) AS pos
  FROM dense),
dmat AS (
  SELECT a.ti AS i, b.ti AS j, count(*)::BIGINT AS d
  FROM rk a JOIN rk b ON a.day = b.day AND a.pos < b.pos
  GROUP BY 1, 2),
k AS (SELECT count(*)::BIGINT AS k FROM types),
p0 AS (
  SELECT (SELECT list(
            CASE WHEN (z - 1) // 5 = (z - 1) % 5 THEN 0::BIGINT
            WHEN coalesce((SELECT d FROM dmat
                           WHERE i = (z - 1) // 5 + 1
                             AND j = (z - 1) % 5 + 1), 0)
                 > coalesce((SELECT d FROM dmat
                             WHERE i = (z - 1) % 5 + 1
                               AND j = (z - 1) // 5 + 1), 0)
            THEN coalesce((SELECT d FROM dmat
                           WHERE i = (z - 1) // 5 + 1
                             AND j = (z - 1) % 5 + 1), 0)
            ELSE 0::BIGINT END ORDER BY z)
          FROM (SELECT unnest(range(1, 26)) AS z)) AS p),
fw AS (
  SELECT 0 AS m, p FROM p0
  UNION ALL
  SELECT m + 1,
         [CASE WHEN (z - 1) // 5 = (z - 1) % 5
                    OR (z - 1) // 5 = m OR (z - 1) % 5 = m
               THEN p[z]
               ELSE greatest(p[z],
                             least(p[((z - 1) // 5) * 5 + m + 1],
                                   p[m * 5 + ((z - 1) % 5) + 1]))
               END
          FOR z IN range(1, 26)]
  FROM fw WHERE m < 5),
fin AS (SELECT p FROM fw WHERE m = 5),
wins AS (
  SELECT a.a AS a
  FROM (SELECT unnest(range(1, 6)) AS a) a, fin
  WHERE NOT EXISTS (
    SELECT 1 FROM (SELECT unnest(range(1, 6)) AS b) b, fin f2
    WHERE b.b <> a.a
      AND f2.p[(a.a - 1) * 5 + b.b]
          < f2.p[(b.b - 1) * 5 + a.a])),
f AS (
  SELECT (SELECT min(a) FROM wins) AS wa,
         (SELECT count(*) FROM wins)::BIGINT AS nw,
         (SELECT list_sum(p) FROM fin)::BIGINT AS psum,
         (SELECT count(DISTINCT day) FROM cells)::BIGINT AS nb)
SELECT (SELECT et FROM types WHERE ti = f.wa) AS winner,
       nw AS n_winners, psum AS p_sum, nb AS n_ballots
FROM f
"""


# ---------------------------------------------------------------------------
# SimRank
# ---------------------------------------------------------------------------


def q_simrank_sources(sf_dir: str):
    """SimRank on the thresholded source graph (docstring)."""
    w = _overlap_graph(sf_dir)
    pw = sorted(int(w[i, j]) for i in range(5)
                for j in range(i + 1, 5))
    thr = pw[(len(pw) + 1) // 2 - 1]
    adj = [[1 if i != j and int(w[i, j]) >= thr else 0
            for j in range(5)] for i in range(5)]
    deg = [sum(r) for r in adj]
    sq = [[10 ** 12 if i == j else 0 for j in range(5)]
          for i in range(5)]
    for _ in range(_SR_IT):
        nxt = [[0] * 5 for _ in range(5)]
        for a in range(5):
            for b in range(5):
                if a == b:
                    nxt[a][b] = 10 ** 12
                elif deg[a] == 0 or deg[b] == 0:
                    nxt[a][b] = 0
                else:
                    s = 0
                    for u in range(5):
                        for v in range(5):
                            if adj[a][u] and adj[b][v]:
                                s += sq[u][v]
                    val = (_SR_C / (deg[a] * deg[b])) \
                        * (float(s) / 1e12) * 1e12
                    nxt[a][b] = int(math.floor(val + 0.5))
        sq = nxt
    best = None
    tot = 0
    for i in range(5):
        for j in range(5):
            if i < j:
                tot += sq[i][j]
                key = (-sq[i][j], i + 1, j + 1)
                if best is None or key < best:
                    best = key
    r6 = _round6(np.array([-best[0] / 1e12,
                           float(tot) / 10.0 / 1e12]))
    out = pd.DataFrame({"threshold": [thr], "top_i": [best[1]],
                        "top_j": [best[2]], "top_sim6": [r6[0]],
                        "mean_sim6": [r6[1]]})
    for col in ("threshold", "top_i", "top_j"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SIMRANK = f"""
WITH RECURSIVE {_SQL_GRAPH},
pw AS (SELECT quantile_disc(w, 0.5) AS thr
       FROM edges WHERE i < j),
adj AS (
  SELECT (SELECT list(
            CASE WHEN a.i <> b.i
                 AND coalesce((SELECT w FROM edges e
                               WHERE e.i = a.i AND e.j = b.i), 0)
                     >= (SELECT thr FROM pw)
                 THEN 1 ELSE 0 END ORDER BY a.i * 10 + b.i)
          FROM (SELECT si AS i FROM top5) a,
               (SELECT si AS i FROM top5) b) AS am),
degs AS (
  SELECT am,
         [list_sum([am[(dd - 1) * 5 + uu] FOR uu IN range(1, 6)])
          FOR dd IN range(1, 6)] AS dl
  FROM adj),
sim AS (
  SELECT 0 AS it, am, dl,
         [CASE WHEN (z - 1) // 5 = (z - 1) % 5
               THEN 1000000000000::BIGINT ELSE 0::BIGINT END
          FOR z IN range(1, 26)] AS sq
  FROM degs
  UNION ALL
  SELECT it + 1, am, dl,
         [CASE WHEN (ij - 1) // 5 = (ij - 1) % 5
               THEN 1000000000000::BIGINT
          WHEN dl[(ij - 1) // 5 + 1] = 0
               OR dl[(ij - 1) % 5 + 1] = 0 THEN 0::BIGINT
          ELSE CAST(floor(
            ({_SR_C} / (dl[(ij - 1) // 5 + 1]
                        * dl[(ij - 1) % 5 + 1]))
            * (CAST(list_sum(
                 [CASE WHEN am[((ij - 1) // 5) * 5
                              + ((uv - 1) // 5) + 1] = 1
                       AND am[((ij - 1) % 5) * 5
                              + ((uv - 1) % 5) + 1] = 1
                  THEN sq[uv] ELSE 0 END
                  FOR uv IN range(1, 26)]) AS DOUBLE) / 1e12)
            * 1e12 + 5e-1) AS BIGINT)
          END
          FOR ij IN range(1, 26)]
  FROM sim WHERE it < {_SR_IT}),
fin AS (SELECT sq FROM sim WHERE it = {_SR_IT}),
pairs AS (
  SELECT (z - 1) // 5 + 1 AS i, (z - 1) % 5 + 1 AS j, sq[z] AS s
  FROM fin, (SELECT unnest(range(1, 26)) AS z) z
  WHERE (z - 1) // 5 + 1 < (z - 1) % 5 + 1),
best AS (SELECT * FROM pairs ORDER BY s DESC, i, j LIMIT 1)
SELECT (SELECT thr FROM pw)::BIGINT AS threshold,
       best.i::BIGINT AS top_i, best.j::BIGINT AS top_j,
       round(CAST(best.s AS DOUBLE) / 1e12, 6) AS top_sim6,
       round(CAST((SELECT sum(s) FROM pairs) AS DOUBLE)
             / 10.0 / 1e12, 6) AS mean_sim6
FROM best
"""


# ---------------------------------------------------------------------------
# Plackett-Luce
# ---------------------------------------------------------------------------


def q_plackett_luce_types(sf_dir: str):
    """3 Hunter MM iterations on daily rankings (docstring)."""
    names, ranks = _daily_rankings(sf_dir)
    k = len(names)
    stages = []                    # choice-set bitmasks
    for r in ranks:
        for s in range(k - 1):
            stages.append(sum(1 << (t - 1) for t in r[s:]))
    c = [0] * (k + 1)
    for r in ranks:
        for t in r[:-1]:
            c[t] += 1
    wq = [10 ** 12] * k            # quantized, un-normalized
    sq_tot = k * 10 ** 12
    for _ in range(_PL_IT):
        dterm = [0] * (k + 1)
        for m in stages:
            ssum = sum(wq[t] for t in range(k) if (m >> t) & 1)
            term = int(math.floor(
                1e12 / (float(ssum) / float(sq_tot)) + 0.5))
            for t in range(k):
                if (m >> t) & 1:
                    dterm[t + 1] += term
        nw = [0] * k
        for t in range(k):
            val = (float(c[t + 1])
                   / (float(dterm[t + 1]) / 1e12)) * 1e12
            nw[t] = int(math.floor(val + 0.5))
        wq = nw
        sq_tot = sum(wq)
    rows = []
    for t in range(k):
        rows.append({"et": names[t],
                     "w6": _round6(np.array(
                         [float(wq[t]) / float(sq_tot)]))[0]})
    out = pd.DataFrame(rows).sort_values("et") \
        .reset_index(drop=True)
    return out


def _pl_iter_sql(i: int) -> str:
    prev = f"pw{i - 1}" if i > 1 else "pw0"
    ssum = " + ".join(
        f"(CASE WHEN ((st.m >> {t}) & 1) = 1 THEN p.w{t + 1} "
        f"ELSE 0 END)" for t in range(5))
    terms = []
    for t in range(5):
        terms.append(f"""
    sum(CASE WHEN ((st.m >> {t}) & 1) = 1
        THEN CAST(floor(1e12 / (CAST({ssum} AS DOUBLE)
                                / CAST(p.sq AS DOUBLE)) + 5e-1)
                  AS BIGINT) ELSE 0 END)::BIGINT AS d{t + 1}""")
    news = []
    for t in range(5):
        news.append(f"""
    CAST(floor((CAST(cc.c{t + 1} AS DOUBLE)
                / (CAST(dd.d{t + 1} AS DOUBLE) / 1e12)) * 1e12
               + 5e-1) AS BIGINT) AS w{t + 1}""")
    newsum = " + ".join(
        f"CAST(floor((CAST(cc.c{t + 1} AS DOUBLE)"
        f" / (CAST(dd.d{t + 1} AS DOUBLE) / 1e12)) * 1e12"
        f" + 5e-1) AS BIGINT)" for t in range(5))
    return f"""
pd{i} AS MATERIALIZED (
  SELECT {",".join(terms)}
  FROM stages st CROSS JOIN {prev} p),
pw{i} AS MATERIALIZED (
  SELECT {",".join(news)}, ({newsum}) AS sq
  FROM pd{i} dd CROSS JOIN counts cc)"""


SQL_PLACKETT = f"""
WITH cells AS (
  SELECT CAST(ts AS DATE) AS day, event_type AS et,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
types AS (
  SELECT et, row_number() OVER (ORDER BY et) AS ti
  FROM (SELECT DISTINCT et FROM cells)),
days AS (SELECT DISTINCT day FROM cells),
dense AS (
  SELECT d.day, t.et, t.ti, coalesce(c.n, 0)::BIGINT AS n
  FROM days d CROSS JOIN types t
  LEFT JOIN cells c ON c.day = d.day AND c.et = t.et),
rk AS (
  SELECT day, ti,
         row_number() OVER (PARTITION BY day
                            ORDER BY n DESC, et) AS pos
  FROM dense),
stages AS MATERIALIZED (
  SELECT a.day, a.pos AS s,
         sum(1 << (b.ti - 1))::BIGINT AS m
  FROM rk a JOIN rk b ON b.day = a.day AND b.pos >= a.pos
  WHERE a.pos <= 4
  GROUP BY a.day, a.pos),
counts AS MATERIALIZED (
  SELECT {", ".join(
    f"sum((ti = {t + 1} AND pos <= 4)::INT)::BIGINT AS c{t + 1}"
    for t in range(5))}
  FROM rk),
pw0 AS (SELECT {", ".join(
    f"1000000000000::BIGINT AS w{t + 1}" for t in range(5))},
        5000000000000::BIGINT AS sq),
{_pl_iter_sql(1)},
{_pl_iter_sql(2)},
{_pl_iter_sql(3)}
SELECT t.et,
       round(CAST(CASE t.ti {"".join(
         f"WHEN {t + 1} THEN p.w{t + 1} " for t in range(5))}END
                  AS DOUBLE) / CAST(p.sq AS DOUBLE), 6) AS w6
FROM types t CROSS JOIN pw3 p
ORDER BY t.et
"""


QUERIES187: dict[str, tuple] = {
    "schulze_method_types": (q_schulze_method_types, SQL_SCHULZE),
    "simrank_sources": (q_simrank_sources, SQL_SIMRANK),
    "plackett_luce_types": (q_plackett_luce_types, SQL_PLACKETT),
}
