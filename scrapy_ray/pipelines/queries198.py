"""One-hundred-ninety-eighth oracle-query batch — database-internals
audits (rank joins, learned indexes, zonemaps):

- fagin_ta_audit: Fagin's Threshold Algorithm stopping point for the
  top-5 docs under score = n_chars + token count — after p
  round-robin sorted accesses the seen set is {d : min(r1, r2) ≤ p}
  and TA stops when ≥5 seen docs score ≥ T(p) = v1(p) + v2(p); the
  minimal p is found by evaluating the predicate at every p ≤ 300
  (no sequential state), plus the exact top-5 identity checksum.
- learned_index_epsilon: the single-segment learned index over the
  sorted hashed user ids — OLS of position on key with
  HUGEINT/Python-int cleared sums (keys ~2³² make Ckk ~1e22), and
  the ε bound = max |position − prediction| that a PGM-style index
  would store, 1e-6-quantized.
- zonemap_pruning_audit: min-max zonemap effectiveness — zones =
  event_id/4096 blocks with per-zone value-cents min/max
  (distributed groupby), probed by 20 literal 2.5-dollar ranges;
  a zone is pruned when max < lo or min > hi. Exact pruned counts
  and the average pruned share.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Min, Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_TA_K = 5
_TA_PMAX = 300
_ZM_BLOCK = 4096
_ZM_PROBES = [(j * 500, j * 500 + 250) for j in range(1, 21)]


# ---------------------------------------------------------------------------
# Fagin TA
# ---------------------------------------------------------------------------


def q_fagin_ta_audit(sf_dir: str):
    """TA stopping point for top-5 by chars+tokens (docstring)."""
    ds = _pq(sf_dir, "documents",
             columns=["doc_id", "text", "n_chars"])

    def feats(t: pa.Table) -> pa.Table:
        toks = [len(s.split()) for s in t["text"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "nc": t["n_chars"],
            "tk": pa.array(toks, pa.int64())})

    df = (ds.map_batches(feats, batch_format="pyarrow")
            .to_pandas())
    did = df["doc_id"].to_numpy(np.int64)
    nc = df["nc"].to_numpy(np.int64)
    tk = df["tk"].to_numpy(np.int64)
    score = nc + tk
    r1 = np.empty(len(df), np.int64)
    r1[np.lexsort((did, -nc))] = np.arange(1, len(df) + 1)
    r2 = np.empty(len(df), np.int64)
    r2[np.lexsort((did, -tk))] = np.arange(1, len(df) + 1)
    v1 = np.sort(nc)[::-1]
    v2 = np.sort(tk)[::-1]
    rmin = np.minimum(r1, r2)
    p_stop = 0
    for p in range(1, min(_TA_PMAX, len(df)) + 1):
        t_p = int(v1[p - 1]) + int(v2[p - 1])
        cnt = int(((rmin <= p) & (score >= t_p)).sum())
        if cnt >= _TA_K:
            p_stop = p
            break
    n_seen = int((rmin <= p_stop).sum()) if p_stop else 0
    order = np.lexsort((did, -score))[:_TA_K]
    out = pd.DataFrame({
        "p_stop": [p_stop], "n_seen": [n_seen],
        "top5_id_sum": [int(did[order].sum())],
        "top5_min_score": [int(score[order].min())]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_FAGIN = rf"""
WITH d AS (
  SELECT doc_id, n_chars AS nc,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS tk
  FROM documents),
rk AS (
  SELECT doc_id, nc, tk, nc + tk AS score,
         row_number() OVER (ORDER BY nc DESC, doc_id) AS r1,
         row_number() OVER (ORDER BY tk DESC, doc_id) AS r2
  FROM d),
v1 AS (SELECT nc, row_number() OVER (ORDER BY nc DESC) AS p
       FROM d),
v2 AS (SELECT tk, row_number() OVER (ORDER BY tk DESC) AS p
       FROM d),
ps AS (
  SELECT p.p,
         (SELECT nc FROM v1 WHERE v1.p = p.p)
         + (SELECT tk FROM v2 WHERE v2.p = p.p) AS t_p
  FROM (SELECT unnest(range(1, {_TA_PMAX} + 1)) AS p) p
  WHERE p.p <= (SELECT count(*) FROM d)),
cnts AS (
  SELECT ps.p,
         (SELECT count(*) FROM rk
          WHERE least(rk.r1, rk.r2) <= ps.p
            AND rk.score >= ps.t_p) AS cnt
  FROM ps),
stop_ AS (
  SELECT coalesce(min(p), 0)::BIGINT AS p_stop
  FROM cnts WHERE cnt >= {_TA_K}),
seen AS (
  SELECT CASE WHEN (SELECT p_stop FROM stop_) = 0 THEN 0
         ELSE (SELECT count(*) FROM rk
               WHERE least(r1, r2)
                     <= (SELECT p_stop FROM stop_)) END
           ::BIGINT AS n_seen),
top5 AS (
  SELECT sum(doc_id)::BIGINT AS ids, min(score)::BIGINT AS ms
  FROM (SELECT doc_id, score FROM rk
        ORDER BY score DESC, doc_id LIMIT {_TA_K}))
SELECT (SELECT p_stop FROM stop_) AS p_stop,
       (SELECT n_seen FROM seen) AS n_seen,
       top5.ids AS top5_id_sum, top5.ms AS top5_min_score
FROM top5
"""


# ---------------------------------------------------------------------------
# Learned index epsilon
# ---------------------------------------------------------------------------


def q_learned_index_epsilon(sf_dir: str):
    """Max error of the rank-on-key line (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id"])
    uids = np.asarray(sorted(int(u) for u in ds.unique("user_id")),
                      np.int64)
    h = ((uids.astype(np.uint64) % np.uint64(_H_MOD))
         * np.uint64(_H_MULT) + np.uint64(_H_STEP)) \
        % np.uint64(_H_MOD)
    keys = [int(v) for v in np.unique(h.astype(np.int64))]
    n = len(keys)
    sk = sum(keys)
    skk = sum(k * k for k in keys)
    sp = n * (n - 1) // 2
    skp = sum(k * i for i, k in enumerate(keys))
    ckk = n * skk - sk * sk
    ckp = n * skp - sk * sp
    b = float(ckp) / float(ckk)
    a = (float(sp) - b * float(sk)) / n
    eps_max = 0
    eps_sum = 0
    for i, k in enumerate(keys):
        e = abs(float(i) - (a + b * float(k)))
        q = int(math.floor(e * 1e6 + 0.5))
        eps_max = max(eps_max, q)
        eps_sum += q
    r6 = _round6(np.array([b * 1e9, float(eps_max) / 1e6,
                           float(eps_sum) / 1e6 / n]))
    out = pd.DataFrame({"n_keys": [n], "slope_e9_6": [r6[0]],
                        "eps_max6": [r6[1]], "eps_mean6": [r6[2]]})
    out["n_keys"] = out["n_keys"].astype(np.int64)
    return out


SQL_LEARNED = f"""
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
hid AS (
  SELECT DISTINCT CAST(((u::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT
                        + {_H_STEP}) % {_H_MOD} AS BIGINT) AS h
  FROM u),
rk AS (
  SELECT h, row_number() OVER (ORDER BY h) - 1 AS p FROM hid),
s AS (
  SELECT count(*)::BIGINT AS n, sum(h)::BIGINT AS sk,
         sum(CAST(h AS HUGEINT) * h) AS skk,
         sum(p)::BIGINT AS sp,
         sum(CAST(h AS HUGEINT) * p) AS skp
  FROM rk),
c AS (
  SELECT n, sk, sp,
         n * skk - CAST(sk AS HUGEINT) * sk AS ckk,
         n * skp - CAST(sk AS HUGEINT) * sp AS ckp
  FROM s),
f AS (
  SELECT n,
         CAST(ckp AS DOUBLE) / CAST(ckk AS DOUBLE) AS b,
         (CAST(sp AS DOUBLE)
          - CAST(ckp AS DOUBLE) / CAST(ckk AS DOUBLE)
            * CAST(sk AS DOUBLE)) / n AS a
  FROM c),
e AS (
  SELECT f.n,
         CAST(floor(abs(CAST(rk.p AS DOUBLE)
                        - (f.a + f.b * CAST(rk.h AS DOUBLE)))
                    * 1e6 + 5e-1) AS BIGINT) AS q
  FROM rk, f),
g AS (
  SELECT n, max(q)::BIGINT AS mq, sum(q)::BIGINT AS sq
  FROM e GROUP BY n)
SELECT n AS n_keys,
       round((SELECT b FROM f) * 1e9, 6) AS slope_e9_6,
       round(CAST(mq AS DOUBLE) / 1e6, 6) AS eps_max6,
       round(CAST(sq AS DOUBLE) / 1e6 / n, 6) AS eps_mean6
FROM g
"""


# ---------------------------------------------------------------------------
# Zonemap pruning
# ---------------------------------------------------------------------------


def q_zonemap_pruning_audit(sf_dir: str):
    """Min-max zone pruning over literal probes (docstring)."""
    ds = _pq(sf_dir, "events", columns=["event_id", "value"])

    def zpart(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = (pd.DataFrame({"z": eid // _ZM_BLOCK, "c": c})
             .groupby("z", sort=False)["c"]
             .agg(zmin="min", zmax="max").reset_index())
        for col in ("z", "zmin", "zmax"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    zones = (ds.map_batches(zpart, batch_format="pyarrow")
               .groupby("z")
               .aggregate(Min("zmin", alias_name="zmin"),
                          Max("zmax", alias_name="zmax"))
               .to_pandas())
    zmin = zones["zmin"].to_numpy(np.int64)
    zmax = zones["zmax"].to_numpy(np.int64)
    nz = len(zones)
    pruned_tot = 0
    for lo, hi in _ZM_PROBES:
        pruned_tot += int(((zmax < lo) | (zmin > hi)).sum())
    share = float(pruned_tot) / (len(_ZM_PROBES) * nz)
    out = pd.DataFrame({
        "n_zones": [nz], "n_probes": [len(_ZM_PROBES)],
        "total_pruned": [pruned_tot],
        "avg_pruned_share6": [_round6(np.array([share]))[0]]})
    for col in ("n_zones", "n_probes", "total_pruned"):
        out[col] = out[col].astype(np.int64)
    return out


_PROBE_ROWS = " UNION ALL ".join(
    f"SELECT {lo} AS lo, {hi} AS hi" for lo, hi in _ZM_PROBES)

SQL_ZONEMAP = f"""
WITH zones AS (
  SELECT event_id // {_ZM_BLOCK} AS z,
         min(CAST(round(value * 100) AS BIGINT))::BIGINT AS zmin,
         max(CAST(round(value * 100) AS BIGINT))::BIGINT AS zmax
  FROM events GROUP BY 1),
probes AS ({_PROBE_ROWS}),
f AS (
  SELECT (SELECT count(*) FROM zones)::BIGINT AS nz,
         (SELECT count(*) FROM probes)::BIGINT AS np_,
         (SELECT count(*) FROM zones, probes
          WHERE zones.zmax < probes.lo
             OR zones.zmin > probes.hi)::BIGINT AS pruned)
SELECT nz AS n_zones, np_ AS n_probes, pruned AS total_pruned,
       round(CAST(pruned AS DOUBLE)
             / CAST(np_ * nz AS DOUBLE), 6) AS avg_pruned_share6
FROM f
"""


QUERIES198: dict[str, tuple] = {
    "fagin_ta_audit": (q_fagin_ta_audit, SQL_FAGIN),
    "learned_index_epsilon": (q_learned_index_epsilon, SQL_LEARNED),
    "zonemap_pruning_audit": (q_zonemap_pruning_audit, SQL_ZONEMAP),
}
