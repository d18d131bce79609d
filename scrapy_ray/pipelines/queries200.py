"""Two-hundredth oracle-query batch — crawl-allocation fairness,
trust propagation, and sampling-table mechanics:

- jains_fairness_users: Jain's fairness index J = (Σx)²/(n·Σx²)
  of the per-user event allocation AND the per-source doc
  allocation (the host-politeness fairness metric) — both pure
  integer numerators, one float division each.
- trustrank_sources: personalized PageRank (d = 0.85, 20
  iterations) on the weighted top-5 source overlap graph with the
  restart mass on the top-3 sources by doc count — transition
  weights and the rank state quantized to 1e-12 every iteration
  (the SimRank device); reports every source's final trust.
- walker_alias_audit: Walker's alias-method table construction for
  the event-type distribution in EXACT integer units (w_i = K·c_i
  against a per-slot capacity of Σc) — small/large stacks popped in
  ascending index order, 4 deterministic pairing steps, and an
  in-query reconstruction check that every outcome's total units
  equal K·c_i exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries176 import _type_value_stats
from scrapy_ray.pipelines.queries179 import _overlap_graph, _SQL_GRAPH

_TR_D = 0.85
_TR_IT = 20


# ---------------------------------------------------------------------------
# Jain's fairness
# ---------------------------------------------------------------------------


def q_jains_fairness_users(sf_dir: str):
    """Fairness of user-event and source-doc allocations."""
    from ray.data.aggregate import Sum
    from scrapy_ray.pipelines.queries47 import _strip

    ds = _pq(sf_dir, "events", columns=["user_id"])

    def upart(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = pd.DataFrame({"u": u, "n": np.int64(1)}) \
            .groupby("u", sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    users = (ds.map_batches(upart, batch_format="pyarrow")
               .groupby("u").aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    rows = []
    for name, counts in (
            ("users", [int(v) for v in users["n"]]),
            ("sources", None)):
        if counts is None:
            from scrapy_ray.pipelines.queries174 import \
                _srclang_cells
            cells = _srclang_cells(sf_dir)
            counts = [int(v) for v in
                      cells.groupby("source")["c"].sum()]
        n = len(counts)
        s1 = sum(counts)
        s2 = sum(v * v for v in counts)
        j = float(s1 * s1) / (float(n) * float(s2))
        rows.append({"entity": name, "n": n,
                     "j6": _round6(np.array([j]))[0]})
    out = pd.DataFrame(rows).sort_values("entity") \
        .reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_JAIN = """
WITH uc AS (
  SELECT count(*)::BIGINT AS c FROM events GROUP BY user_id),
us AS (
  SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s1,
         sum(CAST(c AS HUGEINT) * c) AS s2
  FROM uc),
sc AS (
  SELECT count(*)::BIGINT AS c FROM documents GROUP BY source),
ss AS (
  SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s1,
         sum(CAST(c AS HUGEINT) * c) AS s2
  FROM sc)
SELECT 'sources' AS entity, n,
       round(CAST(CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)), 6) AS j6
FROM ss
UNION ALL
SELECT 'users', n,
       round(CAST(CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)), 6)
FROM us
ORDER BY entity
"""


# ---------------------------------------------------------------------------
# TrustRank
# ---------------------------------------------------------------------------


def q_trustrank_sources(sf_dir: str):
    """Personalized PageRank with top-3 seeds (docstring)."""
    from scrapy_ray.pipelines.queries174 import _srclang_cells

    w = _overlap_graph(sf_dir)
    cells = _srclang_cells(sf_dir)
    top5 = (cells.groupby("source")["c"].sum().reset_index()
            .sort_values(["c", "source"], ascending=[False, True])
            .head(5))
    names = top5["source"].tolist()
    rowsum = [int(w[i].sum()) for i in range(5)]
    pq_ = [[int(math.floor(int(w[i, j]) / rowsum[i] * 1e12 + 0.5))
            for j in range(5)] for i in range(5)]
    seed = [1, 1, 1, 0, 0]       # top-3 by the top5 ordering
    sq = sum(seed)
    rv = [int(math.floor(s / sq * 1e12 + 0.5)) for s in seed]
    r = rv[:]
    for _ in range(_TR_IT):
        nr = []
        for j in range(5):
            flow = sum(int(math.floor(
                (r[i] / 1e12) * (pq_[i][j] / 1e12) * 1e12 + 0.5))
                for i in range(5))
            val = (1.0 - _TR_D) * (rv[j] / 1e12) \
                + _TR_D * (flow / 1e12)
            nr.append(int(math.floor(val * 1e12 + 0.5)))
        r = nr
    out = pd.DataFrame({
        "source": names,
        "seed": np.asarray(seed, np.int64),
        "trust6": _round6(np.array([v / 1e12 for v in r]))})
    out = out.sort_values("source").reset_index(drop=True)
    out["seed"] = out["seed"].astype(np.int64)
    return out


SQL_TRUSTRANK = f"""
WITH RECURSIVE {_SQL_GRAPH},
wm AS (
  SELECT (SELECT list(coalesce(e.w, 0) ORDER BY a.i * 10 + b.i)
          FROM (SELECT si AS i FROM top5) a
          CROSS JOIN (SELECT si AS i FROM top5) b
          LEFT JOIN edges e ON e.i = a.i AND e.j = b.i) AS wl),
pm AS (
  SELECT [CAST(floor(CAST(wl[(zz - 1) // 5 * 5 + (zz - 1) % 5 + 1]
                          AS DOUBLE)
                     / CAST(list_sum(
                         [wl[((zz - 1) // 5) * 5 + kk]
                          FOR kk IN range(1, 6)]) AS DOUBLE)
                     * 1e12 + 5e-1) AS BIGINT)
          FOR zz IN range(1, 26)] AS p,
         [CASE WHEN ss <= 3
               THEN CAST(floor(1e0 / 3 * 1e12 + 5e-1) AS BIGINT)
               ELSE 0::BIGINT END
          FOR ss IN range(1, 6)] AS rv
  FROM wm),
tr AS (
  SELECT 0 AS it, p, rv, rv AS r FROM pm
  UNION ALL
  SELECT it + 1, p, rv,
         [CAST(floor(((1.0 - {_TR_D}) * (rv[j] / 1e12)
                      + {_TR_D} * (CAST(list_sum(
                          [CAST(floor((r[i2] / 1e12)
                                      * (p[(i2 - 1) * 5 + j]
                                         / 1e12)
                                      * 1e12 + 5e-1) AS BIGINT)
                           FOR i2 IN range(1, 6)]) AS DOUBLE)
                         / 1e12)) * 1e12 + 5e-1) AS BIGINT)
          FOR j IN range(1, 6)]
  FROM tr WHERE it < {_TR_IT}),
fin AS (SELECT r FROM tr WHERE it = {_TR_IT}),
vals AS (
  SELECT t.source, t.si, fin.r[t.si] AS r,
         CASE WHEN t.si <= 3 THEN 1 ELSE 0 END AS seed
  FROM top5 t, fin)
SELECT source, seed::BIGINT AS seed,
       round(CAST(r AS DOUBLE) / 1e12, 6) AS trust6
FROM vals ORDER BY source
"""


# ---------------------------------------------------------------------------
# Walker alias table
# ---------------------------------------------------------------------------


def q_walker_alias_audit(sf_dir: str):
    """Integer alias-table construction + reconstruction check."""
    st = _type_value_stats(sf_dir)
    st = st.sort_values("et").reset_index(drop=True)
    names = st["et"].tolist()
    c = [int(v) for v in st["n"]]
    k = len(c)
    total = sum(c)
    w = [k * v for v in c]
    small = [i for i in range(k) if w[i] < total]
    large = [i for i in range(k) if w[i] >= total]
    prim = [0] * k
    alias = [-1] * k
    units = [0] * k
    steps = 0
    while small and large:
        s = min(small)
        small.remove(s)
        lg = min(large)
        large.remove(lg)
        prim[s] = s
        alias[s] = lg
        units[s] = w[s]
        w[lg] -= total - w[s]
        if w[lg] < total:
            small.append(lg)
        else:
            large.append(lg)
        steps += 1
    for i in small + large:
        prim[i] = i
        alias[i] = i
        units[i] = total
    recon = [0] * k
    for slot in range(k):
        recon[prim[slot]] += units[slot]
        recon[alias[slot]] += total - units[slot]
    ok = 1 if all(recon[i] == k * c[i] for i in range(k)) else 0
    chks = sum((slot + 1) * (alias[slot] + 1)
               for slot in range(k))
    out = pd.DataFrame({"k": [k], "total": [total],
                        "steps": [steps],
                        "alias_checksum": [chks], "ok": [ok]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_ALIAS = f"""
WITH RECURSIVE tc AS (
  SELECT event_type AS et, count(*)::BIGINT AS c
  FROM events GROUP BY 1),
base AS (
  SELECT (SELECT list(c ORDER BY et) FROM tc) AS cl,
         (SELECT count(*) FROM tc)::BIGINT AS k,
         (SELECT sum(c) FROM tc)::BIGINT AS total),
init AS (
  SELECT k, total,
         [k * cw FOR cw IN cl] AS w,
         [ii FOR ii IN range(1, k + 1)
          IF cl[ii] * k < total] AS small,
         [jj FOR jj IN range(1, k + 1)
          IF cl[jj] * k >= total] AS large,
         [0::BIGINT FOR z1 IN range(1, k + 1)] AS units,
         [-1 FOR z2 IN range(1, k + 1)] AS alias,
         0::BIGINT AS steps
  FROM base),
walk AS (
  SELECT * FROM init
  UNION ALL
  SELECT k, total,
         [CASE WHEN wi = lg THEN w[wi] - (total - w[s])
               ELSE w[wi] END FOR wi IN range(1, k + 1)],
         [x FOR x IN small IF x <> s]
           || CASE WHEN w[lg] - (total - w[s]) < total
                   THEN [lg] ELSE [] END,
         [y FOR y IN large IF y <> lg]
           || CASE WHEN w[lg] - (total - w[s]) >= total
                   THEN [lg] ELSE [] END,
         [CASE WHEN ui = s THEN w[s] ELSE units[ui] END
          FOR ui IN range(1, k + 1)],
         [CASE WHEN ai = s THEN lg ELSE alias[ai] END
          FOR ai IN range(1, k + 1)],
         steps + 1
  FROM (
    SELECT wk.*, list_min(wk.small) AS s,
           list_min(wk.large) AS lg
    FROM walk wk
    WHERE len(wk.small) > 0 AND len(wk.large) > 0) q),
fin AS (
  SELECT * FROM walk
  ORDER BY steps DESC LIMIT 1),
-- leftovers become self-alias full slots
slots AS (
  SELECT k, total, steps,
         [CASE WHEN alias[si] = -1 THEN si ELSE alias[si] END
          FOR si IN range(1, k + 1)] AS al,
         [CASE WHEN alias[ui2] = -1 THEN total
               ELSE units[ui2] END
          FOR ui2 IN range(1, k + 1)] AS un
  FROM fin),
recon AS (
  SELECT s.k, s.total, s.steps, s.al,
         [CAST(list_sum(
            [CASE WHEN oi = sl THEN s.un[sl] ELSE 0 END
             FOR sl IN range(1, s.k + 1)]) AS BIGINT)
          + CAST(list_sum(
            [CASE WHEN s.al[sl2] = oi
                  THEN s.total - s.un[sl2] ELSE 0 END
             FOR sl2 IN range(1, s.k + 1)]) AS BIGINT)
          FOR oi IN range(1, s.k + 1)] AS rc
  FROM slots s),
chk AS (
  SELECT r.k, r.total, r.steps,
         CASE WHEN list_sum(
           [CASE WHEN r.rc[ci] = r.k * b.cl[ci]
                 THEN 0 ELSE 1 END
            FOR ci IN range(1, r.k + 1)]) = 0
         THEN 1 ELSE 0 END AS ok,
         list_sum([sl3 * r.al[sl3]
                   FOR sl3 IN range(1, r.k + 1)]) AS chks
  FROM recon r, base b)
SELECT k, total, steps, chks::BIGINT AS alias_checksum,
       ok::BIGINT AS ok
FROM chk
"""


QUERIES200: dict[str, tuple] = {
    "jains_fairness_users": (q_jains_fairness_users, SQL_JAIN),
    "trustrank_sources": (q_trustrank_sources, SQL_TRUSTRANK),
    "walker_alias_audit": (q_walker_alias_audit, SQL_ALIAS),
}
