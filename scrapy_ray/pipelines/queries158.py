"""One-hundred-fifty-eighth oracle-query batch — scheduling DP, Bloom
filter auditing, and cache-replacement simulation (systems ops the
crawl engine itself leans on):

- weighted_interval_sched: optimal weighted interval scheduling over
  the top-200 user sessions (30-min-gap definition, weight = event
  count). Jobs sort by (end, start, user); the compatible
  predecessor p(i) is the last job with end < start_i (an ASOF join
  in the oracle) and the DP M[i] = max(M[i-1], w_i + M[p(i)])
  replays with a LIST state. Pure integers.
- bloom_fpr_audit: build a 65536-bit, 4-hash Bloom filter of the
  EVEN user_ids (deterministic multiplicative hashes), probe with
  the odd ones, and report the exact false-positive count next to
  the theoretical (1 − (1−1/m)^{kn})^k rate — the engine's own
  URL-seen machinery, audited as a query.
- lru_vs_opt_cache: LRU vs Belady-OPT page-replacement replay
  (cache size 8, pages = user_id) over the first 600 events in
  event_id order. OPT carries (page, next-use) pairs — next-use
  indices precomputed with lead() — and evicts the first-position
  max; the whole two-policy simulation runs as one 600-level
  LIST-state recursion in the oracle. Exact integer hit counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries47 import _strip

_WIS_TOP = 200
_GAP_US = 30 * 60 * 1_000_000
_BL_M = 65536
_BL_K = 4
_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_LRU_N = 600
_LRU_K = 8


# ---------------------------------------------------------------------------
# Weighted interval scheduling
# ---------------------------------------------------------------------------


def q_weighted_interval_sched(sf_dir: str):
    """Optimal weighted interval scheduling on sessions (docstring)."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % 64) \
            .astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def sess(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].astype("int64").to_numpy()
        new_user = np.r_[True, u[1:] != u[:-1]]
        brk = new_user | (np.r_[0, np.diff(ts)] > _GAP_US)
        sid = np.cumsum(brk)
        s = pd.DataFrame({"sid": sid, "ts": ts, "u": u})
        g = s.groupby("sid", sort=False).agg(
            st=("ts", "min"), en=("ts", "max"), w=("ts", "size"),
            u=("u", "first")).reset_index(drop=True)
        for c in ("st", "en", "w", "u"):
            g[c] = g[c].astype(np.int64)
        return g

    sessions = (ds.map_batches(with_key, batch_format="pyarrow")
                  .groupby("gkey").map_groups(sess,
                                              batch_format="pandas")
                  .to_pandas())
    top = sessions.sort_values(["w", "st", "u"],
                               ascending=[False, True, True]) \
        .head(_WIS_TOP)
    jobs = top.sort_values(["en", "st", "u"]).reset_index(drop=True)
    st = jobs["st"].to_numpy(np.int64)
    en = jobs["en"].to_numpy(np.int64)
    w = jobs["w"].to_numpy(np.int64)
    n = len(jobs)
    m = [0]
    for i in range(n):
        # p(i): last job (in end order) with en < st[i]
        p = int(np.searchsorted(en[:i], st[i], side="left"))
        m.append(max(m[i], int(w[i]) + m[p]))
    out = pd.DataFrame({"n_jobs": [n], "total_weight": [int(w.sum())],
                        "opt_weight": [m[n]]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_WIS = f"""
WITH RECURSIVE e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events),
b AS (
  SELECT user_id, ts,
         (CASE WHEN prev IS NULL
               OR epoch_us(ts) - epoch_us(prev) > {_GAP_US}
               THEN 1 ELSE 0 END) AS brk
  FROM e),
sid AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS s
  FROM b),
sess AS (
  SELECT user_id AS u, epoch_us(min(ts)) AS st,
         epoch_us(max(ts)) AS en, count(*)::BIGINT AS w
  FROM sid GROUP BY user_id, s),
top AS (
  SELECT * FROM sess ORDER BY w DESC, st, u LIMIT {_WIS_TOP}),
jobs AS (
  SELECT row_number() OVER (ORDER BY en, st, u) AS i, st, en, w
  FROM top),
pred AS (
  -- p(i) = COUNT of jobs with en < st (ASOF would pick an arbitrary
  -- row among tied ends; the DP needs the LAST compatible index)
  SELECT j.i, j.w,
         (SELECT count(*) FROM jobs p WHERE p.en < j.st) AS p
  FROM jobs j),
base AS (
  SELECT count(*)::BIGINT AS n, sum(w)::BIGINT AS tw,
         list_prepend(0::BIGINT, list(w ORDER BY i)) AS ws,
         list_prepend(0::BIGINT, list(p ORDER BY i)) AS ps
  FROM pred),
dp AS (
  SELECT 0::BIGINT AS i, [0::BIGINT] AS m, n, tw, ws, ps FROM base
  UNION ALL
  SELECT i + 1,
         list_append(m, greatest(m[i + 1],
                                 ws[i + 2] + m[ps[i + 2] + 1])),
         n, tw, ws, ps
  FROM dp WHERE i < n)
SELECT n AS n_jobs, tw AS total_weight,
       m[CAST(n AS INT) + 1] AS opt_weight
FROM dp WHERE i = (SELECT max(i) FROM dp)
"""


# ---------------------------------------------------------------------------
# Bloom FPR audit
# ---------------------------------------------------------------------------


def q_bloom_fpr_audit(sf_dir: str):
    """4-hash Bloom of even users probed by odd users (docstring)."""
    import math

    from scrapy_ray.pipelines.queries8 import _round6

    ds = _pq(sf_dir, "events", columns=["user_id"])

    def users(t: pa.Table) -> pa.Table:
        u = np.unique(t["user_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({"u": pa.array(u)})

    uu = np.unique((ds.map_batches(users, batch_format="pyarrow")
                    .to_pandas())["u"].to_numpy(np.int64))
    members = uu[uu % 2 == 0].astype(np.uint64)
    probes = uu[uu % 2 == 1].astype(np.uint64)
    bits = np.zeros(_BL_M, bool)
    for j in range(1, _BL_K + 1):
        pos = (((members % np.uint64(_H_MOD)) * np.uint64(_H_MULT)
                + np.uint64(j * _H_STEP)) % np.uint64(_H_MOD)
               % np.uint64(_BL_M)).astype(np.int64)
        bits[pos] = True
    hit = np.ones(len(probes), bool)
    for j in range(1, _BL_K + 1):
        pos = (((probes % np.uint64(_H_MOD)) * np.uint64(_H_MULT)
                + np.uint64(j * _H_STEP)) % np.uint64(_H_MOD)
               % np.uint64(_BL_M)).astype(np.int64)
        hit &= bits[pos]
    n_m, n_p = len(members), len(probes)
    fp = int(hit.sum())
    theo = (1.0 - (1.0 - 1.0 / float(_BL_M))
            ** (float(_BL_K) * float(n_m))) ** _BL_K
    out = pd.DataFrame({
        "n_members": [n_m], "n_probes": [n_p], "n_bits_set":
            [int(bits.sum())], "false_pos": [fp],
        "fpr6": [_round6(np.array([float(fp) / float(n_p)]))[0]],
        "theory6": [_round6(np.array([theo]))[0]]})
    for col in ("n_members", "n_probes", "n_bits_set", "false_pos"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BLOOM_FPR = f"""
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
members AS (SELECT u FROM u WHERE u % 2 = 0),
probes AS (SELECT u FROM u WHERE u % 2 = 1),
bits AS (
  SELECT DISTINCT
    CAST(((u::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT
          + (j.j * {_H_STEP})::UBIGINT) % {_H_MOD} % {_BL_M}
         AS BIGINT) AS pos
  FROM members, (SELECT unnest([1, 2, 3, 4]) AS j) j),
pr AS (
  SELECT p.u,
    CAST(((p.u::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT
          + (j.j * {_H_STEP})::UBIGINT) % {_H_MOD} % {_BL_M}
         AS BIGINT) AS pos
  FROM probes p, (SELECT unnest([1, 2, 3, 4]) AS j) j),
hits AS (
  SELECT pr.u
  FROM pr JOIN bits ON bits.pos = pr.pos
  GROUP BY pr.u HAVING count(*) = {_BL_K}),
c AS (
  SELECT (SELECT count(*) FROM members)::BIGINT AS n_m,
         (SELECT count(*) FROM probes)::BIGINT AS n_p,
         (SELECT count(*) FROM bits)::BIGINT AS nb,
         (SELECT count(*) FROM hits)::BIGINT AS fp)
SELECT n_m AS n_members, n_p AS n_probes, nb AS n_bits_set,
       fp AS false_pos,
       round(CAST(fp AS DOUBLE) / CAST(n_p AS DOUBLE), 6) AS fpr6,
       round(power(1.0 - power(1.0 - 1.0 / {_BL_M}.0,
                               {_BL_K}.0 * CAST(n_m AS DOUBLE)),
                   {_BL_K}.0), 6) AS theory6
FROM c
"""


# ---------------------------------------------------------------------------
# LRU vs Belady OPT
# ---------------------------------------------------------------------------


def q_lru_vs_opt_cache(sf_dir: str):
    """LRU vs OPT replay, cache size 8, first 600 events (docstring)."""
    ds = _pq(sf_dir, "events", columns=["event_id", "user_id"])

    def pick(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = eid < _LRU_N
        return pa.table({
            "e": pa.array(eid[keep]),
            "p": pa.array(t["user_id"].to_numpy(
                zero_copy_only=False).astype(np.int64)[keep])})

    seq = (ds.map_batches(pick, batch_format="pyarrow")
             .to_pandas().sort_values("e").reset_index(drop=True))
    pages = seq["p"].tolist()
    n = len(pages)
    # next-use index per position (n if none)
    last: dict[int, int] = {}
    nxt = [n] * n
    for i in range(n - 1, -1, -1):
        nxt[i] = last.get(pages[i], n)
        last[pages[i]] = i
    lru: list[int] = []
    lru_hits = 0
    op: list[int] = []
    onu: list[int] = []
    opt_hits = 0
    for i, pg in enumerate(pages):
        if pg in lru:
            lru_hits += 1
            lru.remove(pg)
        lru.insert(0, pg)
        lru = lru[:_LRU_K]
        if pg in op:
            opt_hits += 1
            onu[op.index(pg)] = nxt[i]
        else:
            if len(op) == _LRU_K:
                vi = onu.index(max(onu))    # first max next-use
                op.pop(vi)
                onu.pop(vi)
            op.append(pg)
            onu.append(nxt[i])
    out = pd.DataFrame({"n_requests": [n], "lru_hits": [lru_hits],
                        "opt_hits": [opt_hits]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_LRU_OPT = f"""
WITH RECURSIVE seq AS (
  SELECT row_number() OVER (ORDER BY event_id) AS t,
         user_id AS p
  FROM events WHERE event_id < {_LRU_N}),
nn AS (SELECT count(*)::BIGINT AS n FROM seq),
nu AS (
  SELECT t, p,
         coalesce(lead(t) OVER (PARTITION BY p ORDER BY t),
                  (SELECT n FROM nn) + 1) - 1 AS nxt
  FROM seq),
sim AS (
  SELECT 0::BIGINT AS t, []::BIGINT[] AS lru, 0::BIGINT AS lh,
         []::BIGINT[] AS op, []::BIGINT[] AS onu, 0::BIGINT AS oh
  UNION ALL
  SELECT r.t,
         -- LRU: move-to-front, trim to k
         (list_prepend(r.p,
                       list_filter(sim.lru,
                                   y -> y <> r.p)))[1:{_LRU_K}],
         sim.lh + (list_position(sim.lru, r.p) > 0)::BIGINT,
         CASE WHEN list_position(sim.op, r.p) > 0
              THEN sim.op
              WHEN len(sim.op) = {_LRU_K}
              THEN list_append(
                [sim.op[i] FOR i IN range(1, {_LRU_K} + 1)
                 IF i <> list_position(sim.onu,
                                       list_aggregate(sim.onu,
                                                      'max'))],
                r.p)
              ELSE list_append(sim.op, r.p) END,
         CASE WHEN list_position(sim.op, r.p) > 0
              THEN [CASE WHEN i = list_position(sim.op, r.p)
                         THEN r.nxt ELSE sim.onu[i] END
                    FOR i IN range(1, len(sim.onu) + 1)]
              WHEN len(sim.op) = {_LRU_K}
              THEN list_append(
                [sim.onu[i] FOR i IN range(1, {_LRU_K} + 1)
                 IF i <> list_position(sim.onu,
                                       list_aggregate(sim.onu,
                                                      'max'))],
                r.nxt)
              ELSE list_append(sim.onu, r.nxt) END,
         sim.oh + (list_position(sim.op, r.p) > 0)::BIGINT
  FROM sim JOIN nu r ON r.t = sim.t + 1)
SELECT (SELECT n FROM nn) AS n_requests, lh AS lru_hits,
       oh AS opt_hits
FROM sim WHERE t = (SELECT n FROM nn)
"""


QUERIES158: dict[str, tuple] = {
    "weighted_interval_sched": (q_weighted_interval_sched, SQL_WIS),
    "bloom_fpr_audit": (q_bloom_fpr_audit, SQL_BLOOM_FPR),
    "lru_vs_opt_cache": (q_lru_vs_opt_cache, SQL_LRU_OPT),
}
