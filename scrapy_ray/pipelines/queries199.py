"""One-hundred-ninety-ninth oracle-query batch — distributed-systems
machinery replays (LSM compaction, leader election, epidemic
gossip), all exact integers:

- lsm_write_amplification: a leveled LSM replay — the event stream
  flushes a 4096-key memtable into L1; when level i exceeds 4^i
  memtable units it merges into level i+1 (bytes written = merged
  size), cascading through 4 levels. One recursion level per flush
  with the cascade as chained subquery stages; reports total bytes
  written and the write amplification.
- leader_election_rounds: randomized-timeout leader election with
  16 nodes — per round r node k draws timeout h(k·1000 + r) % 1024
  from the multiplicative family; the round elects iff the minimum
  is UNIQUE and the runner-up gap is ≥ 32 ticks. First winning
  round, its leader and gap.
- gossip_rounds: push gossip over 64 nodes — each informed node i
  pushes to h(i·64 + t) % 64 in round t, the informed set carried
  as a 64-bit BITMASK through the recursion (the existential OR is
  Σ_b 2^b·[any informed i targets b], never a double-counting
  sum). Rounds to full dissemination and informed counts at rounds
  1, 2, 4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq, _nrows
from scrapy_ray.pipelines.queries8 import _round6

_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_LSM_F = 4096
_LSM_T = 4
_LSM_LV = 4
_EL_N = 16
_EL_TICKS = 1024
_EL_GAP = 32
_GO_N = 64
_GO_TMAX = 24


def _h(idx: int) -> int:
    return ((idx % _H_MOD) * _H_MULT + _H_STEP) % _H_MOD


# ---------------------------------------------------------------------------
# LSM write amplification
# ---------------------------------------------------------------------------


def q_lsm_write_amplification(sf_dir: str):
    """Leveled-compaction replay over event inserts (docstring)."""
    n = _nrows(sf_dir, "events")
    nf = -(-n // _LSM_F)
    caps = [_LSM_T ** i * _LSM_F for i in range(1, _LSM_LV + 1)]
    lv = [0] * _LSM_LV
    written = 0
    merges = 0
    for _ in range(nf):
        lv[0] += _LSM_F
        written += _LSM_F
        for i in range(_LSM_LV - 1):
            if lv[i] > caps[i]:
                written += lv[i] + lv[i + 1]
                lv[i + 1] += lv[i]
                lv[i] = 0
                merges += 1
    wa = float(written) / float(nf * _LSM_F)
    out = pd.DataFrame({"n_keys": [n], "n_flushes": [nf],
                        "n_merges": [merges],
                        "total_written": [written],
                        "wa6": [_round6(np.array([wa]))[0]]})
    for col in ("n_keys", "n_flushes", "n_merges",
                "total_written"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LSM = f"""
WITH RECURSIVE nn AS (
  SELECT count(*)::BIGINT AS n,
         (count(*) + {_LSM_F} - 1) // {_LSM_F} AS nf
  FROM events),
sim AS (
  SELECT 0::BIGINT AS f, n, nf, 0::BIGINT AS l1, 0::BIGINT AS l2,
         0::BIGINT AS l3, 0::BIGINT AS l4, 0::BIGINT AS written,
         0::BIGINT AS merges
  FROM nn
  UNION ALL
  SELECT f + 1, n, nf,
         CASE WHEN a1 > {_LSM_T * _LSM_F} THEN 0 ELSE a1 END,
         CASE WHEN b2 > {_LSM_T ** 2 * _LSM_F} THEN 0
              ELSE b2 END,
         CASE WHEN c3 > {_LSM_T ** 3 * _LSM_F} THEN 0
              ELSE c3 END,
         CASE WHEN c3 > {_LSM_T ** 3 * _LSM_F}
              THEN l4 + c3 ELSE l4 END,
         written + {_LSM_F}
         + CASE WHEN a1 > {_LSM_T * _LSM_F}
                THEN a1 + l2 ELSE 0 END
         + CASE WHEN b2 > {_LSM_T ** 2 * _LSM_F}
                THEN b2 + l3 ELSE 0 END
         + CASE WHEN c3 > {_LSM_T ** 3 * _LSM_F}
                THEN c3 + l4 ELSE 0 END,
         merges
         + CASE WHEN a1 > {_LSM_T * _LSM_F} THEN 1 ELSE 0 END
         + CASE WHEN b2 > {_LSM_T ** 2 * _LSM_F}
                THEN 1 ELSE 0 END
         + CASE WHEN c3 > {_LSM_T ** 3 * _LSM_F}
                THEN 1 ELSE 0 END
  FROM (
    SELECT s.*, a1, b2,
           CASE WHEN b2 > {_LSM_T ** 2 * _LSM_F}
                THEN s.l3 + b2 ELSE s.l3 END AS c3
    FROM (
      SELECT s0.*, a1,
             CASE WHEN a1 > {_LSM_T * _LSM_F}
                  THEN s0.l2 + a1 ELSE s0.l2 END AS b2
      FROM (SELECT sim.*, sim.l1 + {_LSM_F} AS a1
            FROM sim WHERE sim.f < sim.nf) s0) s) q)
SELECT n AS n_keys, nf AS n_flushes, merges AS n_merges,
       written AS total_written,
       round(CAST(written AS DOUBLE)
             / CAST(nf * {_LSM_F} AS DOUBLE), 6) AS wa6
FROM sim WHERE f = nf
"""


# ---------------------------------------------------------------------------
# Leader election
# ---------------------------------------------------------------------------


def q_leader_election_rounds(sf_dir: str):
    """Randomized-timeout election replay (docstring above)."""
    n = _nrows(sf_dir, "events")
    seed = n % 1000                     # data-coupled round offset
    win = 0
    leader = 0
    gap = 0
    for r in range(1, 201):
        ts = [(_h((k + 1) * 1000 + seed + r) % _EL_TICKS, k + 1)
              for k in range(_EL_N)]
        ts.sort()
        if ts[0][0] != ts[1][0] and ts[1][0] - ts[0][0] >= _EL_GAP:
            win, leader, gap = r, ts[0][1], ts[1][0] - ts[0][0]
            break
    r = win
    out = pd.DataFrame({"seed": [seed], "win_round": [r],
                        "leader": [leader], "gap": [gap]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_ELECTION = f"""
WITH seed AS (SELECT count(*)::BIGINT % 1000 AS s FROM events),
draws AS (
  SELECT r.r, k.k,
         CAST((((k.k + 1) * 1000 + (SELECT s FROM seed) + r.r)
               ::UBIGINT % {_H_MOD} * {_H_MULT}::UBIGINT
               + {_H_STEP}) % {_H_MOD} % {_EL_TICKS} AS BIGINT)
           AS t
  FROM (SELECT unnest(range(1, 201)) AS r) r,
       (SELECT unnest(range(0, {_EL_N})) AS k) k),
rk AS (
  SELECT r, k, t,
         row_number() OVER (PARTITION BY r ORDER BY t, k) AS pos
  FROM draws),
rounds AS (
  SELECT a.r, a.t AS t1, b.t AS t2, a.k AS leader
  FROM rk a JOIN rk b ON b.r = a.r AND b.pos = 2
  WHERE a.pos = 1),
win AS (
  SELECT r, leader, t2 - t1 AS gap
  FROM rounds
  WHERE t1 <> t2 AND t2 - t1 >= {_EL_GAP}
  ORDER BY r LIMIT 1)
SELECT (SELECT s FROM seed) AS seed,
       coalesce((SELECT r FROM win), 0)::BIGINT AS win_round,
       coalesce((SELECT leader + 1 FROM win), 0)::BIGINT
         AS leader,
       coalesce((SELECT gap FROM win), 0)::BIGINT AS gap
"""


# ---------------------------------------------------------------------------
# Gossip
# ---------------------------------------------------------------------------


def q_gossip_rounds(sf_dir: str):
    """Push-gossip dissemination replay (docstring above)."""
    n = _nrows(sf_dir, "events")
    start = n % _GO_N
    mask = 1 << start
    counts = {}
    full = 0
    for t in range(1, _GO_TMAX + 1):
        add = 0
        for i in range(_GO_N):
            if (mask >> i) & 1:
                tgt = _h(i * _GO_N + t) % _GO_N
                add |= 1 << tgt
        mask |= add
        counts[t] = bin(mask).count("1")
        if counts[t] == _GO_N and full == 0:
            full = t
    out = pd.DataFrame({
        "start_node": [start], "full_round": [full],
        "informed_r1": [counts.get(1, 0)],
        "informed_r2": [counts.get(2, 0)],
        "informed_r4": [counts.get(4, 0)]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_GOSSIP = f"""
WITH RECURSIVE st AS (
  SELECT count(*)::BIGINT % {_GO_N} AS start FROM events),
sim AS (
  SELECT 0 AS t, (1::HUGEINT << start) AS mask,
         []::BIGINT[] AS hist
  FROM st
  UNION ALL
  SELECT t + 1,
         nmask,
         list_append(hist,
           list_sum([CASE WHEN ((nmask >> bb) & 1) = 1
                     THEN 1 ELSE 0 END
                     FOR bb IN range(0, {_GO_N})]))
  FROM (
    SELECT t, hist,
           mask | list_sum(
             [CASE WHEN list_sum(
                [CASE WHEN ((mask >> ii) & 1) = 1
                      AND CAST(((ii * {_GO_N} + t + 1)
                                ::UBIGINT % {_H_MOD}
                                * {_H_MULT}::UBIGINT + {_H_STEP})
                               % {_H_MOD} % {_GO_N} AS BIGINT)
                          = b2
                 THEN 1 ELSE 0 END
                 FOR ii IN range(0, {_GO_N})]) > 0
              THEN (1::HUGEINT << b2) ELSE 0::HUGEINT END
              FOR b2 IN range(0, {_GO_N})]) AS nmask
    FROM sim WHERE t < {_GO_TMAX}) q),
fin AS (SELECT hist FROM sim WHERE t = {_GO_TMAX}),
fr AS (
  SELECT coalesce(list_min(
           [tt FOR tt IN range(1, {_GO_TMAX} + 1)
            IF hist[tt] = {_GO_N}]), 0) AS full_round
  FROM fin)
SELECT (SELECT start FROM st) AS start_node,
       fr.full_round::BIGINT AS full_round,
       fin.hist[1]::BIGINT AS informed_r1,
       fin.hist[2]::BIGINT AS informed_r2,
       fin.hist[4]::BIGINT AS informed_r4
FROM fin, fr
"""


QUERIES199: dict[str, tuple] = {
    "lsm_write_amplification": (q_lsm_write_amplification, SQL_LSM),
    "leader_election_rounds": (q_leader_election_rounds,
                               SQL_ELECTION),
    "gossip_rounds": (q_gossip_rounds, SQL_GOSSIP),
}
