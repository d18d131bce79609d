"""One-hundred-eighty-first oracle-query batch — route inspection,
voting power, and interval coverage:

- chinese_postman_sources: the route-inspection (Chinese postman)
  cost on the top-5 source overlap graph MINUS its lightest edge
  (min weight, (i,j) tiebreak) — the removal leaves exactly two
  odd-degree vertices, so the optimal augmentation is the shortest
  path between them: a 5-level Floyd–Warshall relaxation replay on
  the flattened integer cost matrix; total = Σ remaining edges +
  that path. Pure integers.
- banzhaf_power_sources: the Banzhaf power index of the weighted
  voting game (weights = top-5 source doc counts, quota =
  ⌊total/2⌋+1): per player, swings counted over all 16 coalitions
  of the others; the normalized index finalizes from integer swing
  counts.
- session_coverage_union: Klee's measure on the time axis — total
  microseconds covered by ≥1 user session (30-min-gap
  sessionization, the queries166 device). Sessions reduce to
  (start, end) intervals inside salted partitions; the global
  gaps-and-islands merge (new island iff start strictly exceeds the
  running max end; tie-total ORDER BY start, end, user) runs over
  the few-thousand intervals, and coverage is exact integer
  microseconds against the global span.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries179 import _overlap_graph, _SQL_GRAPH

_GAP_US = 30 * 60 * 1_000_000
_INF = 1 << 40


# ---------------------------------------------------------------------------
# Chinese postman
# ---------------------------------------------------------------------------


def q_chinese_postman_sources(sf_dir: str):
    """Postman cost on K5 minus the lightest edge (docstring)."""
    w = _overlap_graph(sf_dir)
    best = None
    for i in range(5):
        for j in range(i + 1, 5):
            key = (int(w[i, j]), i + 1, j + 1)
            if best is None or key < best:
                best = key
    _, ei, ej = best
    d = [[_INF] * 5 for _ in range(5)]
    total = 0
    for i in range(5):
        d[i][i] = 0
        for j in range(5):
            if i < j and not (i + 1 == ei and j + 1 == ej):
                total += int(w[i, j])
            if i != j and not ((i + 1, j + 1) == (ei, ej)
                               or (j + 1, i + 1) == (ei, ej)):
                d[i][j] = int(w[i, j])
    for k in range(5):
        for i in range(5):
            for j in range(5):
                if d[i][k] + d[k][j] < d[i][j]:
                    d[i][j] = d[i][k] + d[k][j]
    sp = d[ei - 1][ej - 1]
    out = pd.DataFrame({"removed_i": [ei], "removed_j": [ej],
                        "edges_cost": [total], "augment": [sp],
                        "postman_cost": [total + sp]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_POSTMAN = f"""
WITH RECURSIVE {_SQL_GRAPH},
light AS (
  SELECT i, j, w FROM edges WHERE i < j
  ORDER BY w, i, j LIMIT 1),
dm AS (
  SELECT (SELECT list(
            CASE WHEN (z - 1) // 5 = (z - 1) % 5 THEN 0::BIGINT
            WHEN ((z - 1) // 5 + 1 = (SELECT i FROM light)
                  AND (z - 1) % 5 + 1 = (SELECT j FROM light))
              OR ((z - 1) // 5 + 1 = (SELECT j FROM light)
                  AND (z - 1) % 5 + 1 = (SELECT i FROM light))
              THEN {_INF}::BIGINT
            ELSE coalesce((SELECT w FROM edges e
                           WHERE e.i = (z - 1) // 5 + 1
                             AND e.j = (z - 1) % 5 + 1),
                          {_INF})::BIGINT END ORDER BY z)
          FROM (SELECT unnest(range(1, 26)) AS z)) AS d,
         (SELECT sum(w) // 2 FROM edges)
         - (SELECT w FROM light) AS total),
fw AS (
  SELECT 0 AS k, d, total FROM dm
  UNION ALL
  SELECT k + 1,
         [least(d[z],
                d[((z - 1) // 5) * 5 + k + 1]
                + d[k * 5 + ((z - 1) % 5) + 1])
          FOR z IN range(1, 26)],
         total
  FROM fw WHERE k < 5),
fin AS (SELECT * FROM fw WHERE k = 5)
SELECT (SELECT i FROM light)::BIGINT AS removed_i,
       (SELECT j FROM light)::BIGINT AS removed_j,
       fin.total::BIGINT AS edges_cost,
       fin.d[((SELECT i FROM light) - 1) * 5
             + (SELECT j FROM light)]::BIGINT AS augment,
       (fin.total
        + fin.d[((SELECT i FROM light) - 1) * 5
                + (SELECT j FROM light)])::BIGINT AS postman_cost
FROM fin
"""


# ---------------------------------------------------------------------------
# Banzhaf power
# ---------------------------------------------------------------------------


def q_banzhaf_power_sources(sf_dir: str):
    """Banzhaf swings of the doc-count voting game (docstring)."""
    from scrapy_ray.pipelines.queries174 import _srclang_cells

    cells = _srclang_cells(sf_dir)
    t5 = (cells.groupby("source")["c"].sum().reset_index()
          .sort_values(["c", "source"], ascending=[False, True])
          .head(5))
    names = t5["source"].tolist()
    wts = [int(v) for v in t5["c"]]
    q = sum(wts) // 2 + 1
    swings = []
    for i in range(5):
        others = [wts[j] for j in range(5) if j != i]
        s = 0
        for mask in range(16):
            tot = sum(others[b] for b in range(4)
                      if (mask >> b) & 1)
            if tot < q <= tot + wts[i]:
                s += 1
        swings.append(s)
    tot_sw = sum(swings)
    out = pd.DataFrame({
        "source": names,
        "weight": np.asarray(wts, np.int64),
        "swings": np.asarray(swings, np.int64),
        "banzhaf6": _round6(np.array(
            [float(s) / float(tot_sw) for s in swings]))})
    out = out.sort_values("source").reset_index(drop=True)
    for col in ("weight", "swings"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BANZHAF = """
WITH t5 AS (
  SELECT source, count(*)::BIGINT AS w,
         row_number() OVER (ORDER BY count(*) DESC, source) AS si
  FROM documents GROUP BY source
  ORDER BY count(*) DESC, source LIMIT 5),
qv AS (SELECT sum(w) // 2 + 1 AS q,
              (SELECT list(w ORDER BY si) FROM t5) AS wl
       FROM t5),
-- per-player OTHER-weights list (wl[x] with loop var x is a
-- single-level capture; wl[oth[b]] would be the forbidden nested
-- list-of-list indexing)
players AS (
  SELECT p.si, p.source, p.w, qv.q,
         [qv.wl[x] FOR x IN [1, 2, 3, 4, 5] IF x <> p.si] AS ow
  FROM t5 p, qv),
coal AS (
  SELECT p.si, p.source, p.w, p.q,
         list_sum([CASE WHEN ((m.m >> (b - 1)) & 1) = 1
                        THEN p.ow[b] ELSE 0 END
                   FOR b IN range(1, 5)]) AS ctot
  FROM players p, (SELECT unnest(range(0, 16)) AS m) m),
sw AS (
  SELECT si, source, w,
         sum((ctot < q AND q <= ctot + w)::INT)::BIGINT AS swings
  FROM coal GROUP BY si, source, w),
tot AS (SELECT sum(swings)::BIGINT AS ts FROM sw)
SELECT source, w AS weight, swings,
       round(CAST(swings AS DOUBLE)
             / CAST((SELECT ts FROM tot) AS DOUBLE), 6)
         AS banzhaf6
FROM sw ORDER BY source
"""


# ---------------------------------------------------------------------------
# Session coverage union
# ---------------------------------------------------------------------------


def q_session_coverage_union(sf_dir: str):
    """Klee union of session intervals (docstring above)."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_id"])

    def salt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u),
                         "ts": t["ts"].cast(pa.int64()),
                         "e": t["event_id"],
                         "sk": pa.array(u % 64)})

    def sess(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts", "e"], kind="mergesort")
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        brk = np.r_[True, (u[1:] != u[:-1])
                    | (np.diff(ts) > _GAP_US)]
        sid = np.cumsum(brk)
        g = pd.DataFrame({"sid": sid, "u": u, "ts": ts}) \
            .groupby("sid", sort=False) \
            .agg(u=("u", "first"), st=("ts", "min"),
                 en=("ts", "max")).reset_index(drop=True)
        for col in ("u", "st", "en"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    ivals = (ds.map_batches(salt, batch_format="pyarrow")
               .groupby("sk").map_groups(sess,
                                         batch_format="pandas")
               .to_pandas()
               .sort_values(["st", "en", "u"])
               .reset_index(drop=True))
    n_sessions = len(ivals)
    covered = 0
    islands = 0
    cur_s = cur_e = None
    for st, en in zip(ivals["st"], ivals["en"]):
        st, en = int(st), int(en)
        if cur_e is None or st > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = st, en
            islands += 1
        else:
            cur_e = max(cur_e, en)
    if cur_e is not None:
        covered += cur_e - cur_s
    span = int(ivals["en"].max()) - int(ivals["st"].min())
    r6 = _round6(np.array([float(covered) / float(span)]))[0]
    out = pd.DataFrame({"n_sessions": [n_sessions],
                        "n_islands": [islands],
                        "covered_us": [covered],
                        "span_us": [span],
                        "coverage6": [r6]})
    for col in ("n_sessions", "n_islands", "covered_us",
                "span_us"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_COVERAGE = f"""
WITH ev AS (
  SELECT user_id AS u, epoch_us(ts) AS t,
         CASE WHEN epoch_us(ts)
                   - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                   > {_GAP_US}
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events),
sid AS (
  SELECT u, t,
         sum(brk) OVER (PARTITION BY u ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS s
  FROM ev),
ivals AS (
  SELECT u, min(t) AS st, max(t) AS en
  FROM sid GROUP BY u, s),
marked AS (
  SELECT st, en,
         CASE WHEN st > coalesce(max(en) OVER (
                ORDER BY st, en, u
                ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM ivals),
grp AS (
  SELECT st, en,
         sum(new_island) OVER (ORDER BY st, en, rid
                               ROWS UNBOUNDED PRECEDING) AS g
  FROM (SELECT m.st, m.en, m.new_island,
               row_number() OVER (ORDER BY m.st, m.en) AS rid
        FROM marked m)),
isl AS (
  SELECT g, min(st) AS s, max(en) AS e FROM grp GROUP BY g),
f AS (
  SELECT (SELECT count(*) FROM ivals)::BIGINT AS n_sessions,
         (SELECT count(*) FROM isl)::BIGINT AS n_islands,
         (SELECT sum(e - s) FROM isl)::BIGINT AS covered_us,
         ((SELECT max(en) FROM ivals)
          - (SELECT min(st) FROM ivals))::BIGINT AS span_us)
SELECT n_sessions, n_islands, covered_us, span_us,
       round(CAST(covered_us AS DOUBLE)
             / CAST(span_us AS DOUBLE), 6) AS coverage6
FROM f
"""


QUERIES181: dict[str, tuple] = {
    "chinese_postman_sources": (q_chinese_postman_sources,
                                SQL_POSTMAN),
    "banzhaf_power_sources": (q_banzhaf_power_sources, SQL_BANZHAF),
    "session_coverage_union": (q_session_coverage_union,
                               SQL_COVERAGE),
}
