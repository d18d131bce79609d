"""One-hundred-ninetieth oracle-query batch — embedding-space audits
(the projection/sketch tooling of a vector store), float-robust via
1e-4 quantization of identically-computed similarities (the ann
round4 precedent — numpy matmul and DuckDB list kernels agree to
~1e-13, far inside the grain):

- jl_projection_audit: Johnson–Lindenstrauss distortion — project
  the 64-d embeddings to 8 dims with a deterministic ±1 hash matrix
  (/√8) and measure ‖Rx−Ry‖²/‖x−y‖² over the 100 consecutive-id
  pairs; reported as EXACT integer sums of 1e-4-quantized per-pair
  ratios (sum and max), so no float aggregate crosses the oracle.
- srp_cosine_audit: signed-random-projection (SimHash-for-angles)
  accuracy — 64 hash hyperplanes, per-pair sign-agreement counts
  (exact integers), estimated angle cos(π(1−a/K)) vs the true
  cosine; total absolute error in 1e-4 units.
- mmr_selection_embeddings: Maximal Marginal Relevance (λ = 1/2)
  replay — query = normalized mean of the first 16 vectors,
  candidates vec_id < 256, five greedy picks by argmax of
  (rel_q4 − red_q4) on 1e-4-quantized cosines with vec_id
  tiebreak (integer argmax, bit-robust).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq

_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_JL_K = 8
_SRP_K = 64
_N_PAIRS = 100
_MMR_CAND = 256
_MMR_QN = 16
_MMR_PICK = 5
_D = 64


def _sign(idx: int) -> int:
    return 1 if ((idx % _H_MOD) * _H_MULT + _H_STEP) % _H_MOD \
        < 2147483648 else -1


def _read_vecs(sf_dir: str, max_id: int) -> tuple[np.ndarray,
                                                  np.ndarray]:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_

    t = pq_.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t["vec_id"], max_id))
    ids = t["vec_id"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    e = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], e[order]


def _q4(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) * 1e4 + 0.5), x))


# ---------------------------------------------------------------------------
# JL distortion
# ---------------------------------------------------------------------------


def q_jl_projection_audit(sf_dir: str):
    """JL ±1 hash projection distortion over id pairs (docstring)."""
    ids, e = _read_vecs(sf_dir, 2 * _N_PAIRS)
    r = np.array([[_sign(d * _JL_K + j) for j in range(_JL_K)]
                  for d in range(_D)], np.float64)
    # explicit left-to-right per-dimension accumulation (NOT a BLAS
    # matmul, whose blocked summation order differs from the oracle's
    # sequential list_sum fold — ADVICE r4: a value landing on a .5e-4
    # quantization boundary could otherwise round apart)
    proj = np.zeros((e.shape[0], _JL_K), np.float64)
    for d in range(_D):
        proj += e[:, d:d + 1] * r[d]
    proj /= math.sqrt(_JL_K)
    s_q = 0
    mx_q = None
    for i in range(_N_PAIRS):
        a, b = 2 * i, 2 * i + 1
        num = float(((proj[a] - proj[b]) ** 2).sum())
        den = float(((e[a] - e[b]) ** 2).sum())
        q = _q4(num / den)
        s_q += q
        mx_q = q if mx_q is None else max(mx_q, q)
    out = pd.DataFrame({"n_pairs": [_N_PAIRS],
                        "sum_dist_q4": [s_q],
                        "max_dist_q4": [mx_q]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


_SIGN_SQL = (lambda idx:
             f"(CASE WHEN (({idx}) % {_H_MOD} * {_H_MULT}"
             f" + {_H_STEP}) % {_H_MOD} < 2147483648"
             f" THEN 1 ELSE -1 END)")

SQL_JL = f"""
WITH pv AS (
  SELECT vec_id, embedding::DOUBLE[] AS e
  FROM embeddings WHERE vec_id < {2 * _N_PAIRS}),
proj AS (
  SELECT vec_id, e,
         [list_sum([e[d] * {_SIGN_SQL(f"(d - 1) * {_JL_K} + jj - 1")}
                    FOR d IN range(1, {_D} + 1)])
          / sqrt({_JL_K}::DOUBLE)
          FOR jj IN range(1, {_JL_K} + 1)] AS p
  FROM pv),
pairs AS (
  SELECT a.vec_id AS ia,
         list_sum([(a.p[j2] - b.p[j2]) * (a.p[j2] - b.p[j2])
                   FOR j2 IN range(1, {_JL_K} + 1)]) AS num,
         list_sum([(a.e[d2] - b.e[d2]) * (a.e[d2] - b.e[d2])
                   FOR d2 IN range(1, {_D} + 1)]) AS den
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 2 = 0),
q AS (
  SELECT CAST(CASE WHEN num / den >= 0
           THEN floor(abs(num / den) * 1e4 + 5e-1)
           ELSE -floor(abs(num / den) * 1e4 + 5e-1) END
           AS BIGINT) AS dq
  FROM pairs)
SELECT count(*)::BIGINT AS n_pairs, sum(dq)::BIGINT AS sum_dist_q4,
       max(dq)::BIGINT AS max_dist_q4
FROM q
"""


# ---------------------------------------------------------------------------
# SRP cosine audit
# ---------------------------------------------------------------------------


def q_srp_cosine_audit(sf_dir: str):
    """Sign-agreement angle estimation vs true cosine (docstring)."""
    ids, e = _read_vecs(sf_dir, 2 * _N_PAIRS)
    h = np.array([[_sign(1_000_000 + k * _D + d)
                   for k in range(_SRP_K)] for d in range(_D)],
                 np.float64)
    # sequential accumulation, same rationale as q_jl_projection_audit:
    # sign(s) near 0 must not flip on BLAS reassociation noise
    s = np.zeros((e.shape[0], _SRP_K), np.float64)
    for d in range(_D):
        s += e[:, d:d + 1] * h[d]   # (n, K) projections
    err_q = 0
    agree_tot = 0
    for i in range(_N_PAIRS):
        a, b = 2 * i, 2 * i + 1
        agree = int(((s[a] >= 0) == (s[b] >= 0)).sum())
        agree_tot += agree
        est = math.cos(math.pi * (1.0 - agree / _SRP_K))
        na = math.sqrt(float((e[a] * e[a]).sum()))
        nb = math.sqrt(float((e[b] * e[b]).sum()))
        true = float((e[a] * e[b]).sum()) / (na * nb)
        err_q += _q4(abs(est - true))
    out = pd.DataFrame({"n_pairs": [_N_PAIRS],
                        "agree_total": [agree_tot],
                        "sum_abs_err_q4": [err_q]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_SRP = f"""
WITH pv AS (
  SELECT vec_id, embedding::DOUBLE[] AS e
  FROM embeddings WHERE vec_id < {2 * _N_PAIRS}),
proj AS (
  SELECT vec_id, e,
         [list_sum([e[d] * {_SIGN_SQL(
             f"1000000 + (kk - 1) * {_D} + d - 1")}
                    FOR d IN range(1, {_D} + 1)])
          FOR kk IN range(1, {_SRP_K} + 1)] AS s
  FROM pv),
pairs AS (
  SELECT a.vec_id AS ia,
         list_sum([CASE WHEN (a.s[k2] >= 0) = (b.s[k2] >= 0)
                   THEN 1 ELSE 0 END
                   FOR k2 IN range(1, {_SRP_K} + 1)]) AS agree,
         list_sum([a.e[d2] * b.e[d2]
                   FOR d2 IN range(1, {_D} + 1)])
         / (sqrt(list_sum([a.e[d3] * a.e[d3]
                           FOR d3 IN range(1, {_D} + 1)]))
            * sqrt(list_sum([b.e[d4] * b.e[d4]
                             FOR d4 IN range(1, {_D} + 1)])))
           AS truec
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 2 = 0),
q AS (
  SELECT agree,
         CAST(floor(abs(cos(pi() * (1.0 - CAST(agree AS DOUBLE)
                                    / {_SRP_K})) - truec)
                    * 1e4 + 5e-1) AS BIGINT) AS eq
  FROM pairs)
SELECT count(*)::BIGINT AS n_pairs,
       sum(agree)::BIGINT AS agree_total,
       sum(eq)::BIGINT AS sum_abs_err_q4
FROM q
"""


# ---------------------------------------------------------------------------
# MMR selection
# ---------------------------------------------------------------------------


def q_mmr_selection_embeddings(sf_dir: str):
    """Greedy MMR picks on quantized cosines (docstring above)."""
    ids, e = _read_vecs(sf_dir, _MMR_CAND)
    en = e / np.linalg.norm(e, axis=1, keepdims=True)
    qv = e[:_MMR_QN].mean(axis=0)
    qv = qv / np.linalg.norm(qv)
    rel = {int(ids[i]): _q4(float((en[i] * qv).sum()))
           for i in range(len(ids))}
    selected: list[int] = []
    sel_rows = []
    for rank in range(1, _MMR_PICK + 1):
        best = None
        for i in range(len(ids)):
            vid = int(ids[i])
            if vid in selected:
                continue
            red = None
            for s in selected:
                si = int(np.where(ids == s)[0][0])
                rq = _q4(float((en[i] * en[si]).sum()))
                red = rq if red is None else max(red, rq)
            score = rel[vid] - (red if red is not None else 0)
            key = (-score, vid)
            if best is None or key < best:
                best = (key[0], vid, score)
        selected.append(best[1])
        sel_rows.append({"rank": rank, "vec_id": best[1],
                         "score_q4": best[2]})
    out = pd.DataFrame(sel_rows)
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


def _mmr_step_sql(i: int) -> str:
    prevs = " UNION ALL ".join(
        f"SELECT vec_id, s FROM pick{j}" for j in range(1, i))
    sel = f"(SELECT vec_id FROM ({prevs}))" if i > 1 else "(NULL)"
    red = (f"""coalesce((SELECT max(CAST(CASE WHEN
      list_cosine_similarity(c.en, p.en) >= 0
      THEN floor(abs(list_cosine_similarity(c.en, p.en))
                 * 1e4 + 5e-1)
      ELSE -floor(abs(list_cosine_similarity(c.en, p.en))
                  * 1e4 + 5e-1) END AS BIGINT))
      FROM ({prevs} ) pp JOIN cand p ON p.vec_id = pp.vec_id), 0)"""
           if i > 1 else "0")
    return f"""
pick{i} AS MATERIALIZED (
  SELECT c.vec_id, c.rel - {red} AS s
  FROM cand c
  WHERE c.vec_id NOT IN {sel} OR {1 if i == 1 else 0} = 1
  ORDER BY c.rel - {red} DESC, c.vec_id LIMIT 1)"""


SQL_MMR = f"""
WITH pv AS (
  SELECT vec_id, embedding::DOUBLE[] AS e
  FROM embeddings WHERE vec_id < {_MMR_CAND}),
qvec AS (
  SELECT list(av ORDER BY d) AS q
  FROM (SELECT d.d AS d, avg(e[d.d]) AS av
        FROM pv, (SELECT unnest(range(1, {_D} + 1)) AS d) d
        WHERE vec_id < {_MMR_QN} GROUP BY d.d)),
cand AS MATERIALIZED (
  SELECT p.vec_id,
         [p.e[dn] / sqrt(list_sum([p.e[dm] * p.e[dm]
                                   FOR dm IN range(1, {_D} + 1)]))
          FOR dn IN range(1, {_D} + 1)] AS en,
         CAST(CASE WHEN list_cosine_similarity(
                p.e, (SELECT q FROM qvec)) >= 0
           THEN floor(abs(list_cosine_similarity(
                p.e, (SELECT q FROM qvec))) * 1e4 + 5e-1)
           ELSE -floor(abs(list_cosine_similarity(
                p.e, (SELECT q FROM qvec))) * 1e4 + 5e-1) END
           AS BIGINT) AS rel
  FROM pv p),
{_mmr_step_sql(1)},
{_mmr_step_sql(2)},
{_mmr_step_sql(3)},
{_mmr_step_sql(4)},
{_mmr_step_sql(5)},
allp AS (
  SELECT 1 AS rank, vec_id, s FROM pick1
  UNION ALL SELECT 2, vec_id, s FROM pick2
  UNION ALL SELECT 3, vec_id, s FROM pick3
  UNION ALL SELECT 4, vec_id, s FROM pick4
  UNION ALL SELECT 5, vec_id, s FROM pick5)
SELECT rank::BIGINT AS rank, vec_id::BIGINT AS vec_id,
       s::BIGINT AS score_q4
FROM allp ORDER BY rank
"""


QUERIES190: dict[str, tuple] = {
    "jl_projection_audit": (q_jl_projection_audit, SQL_JL),
    "srp_cosine_audit": (q_srp_cosine_audit, SQL_SRP),
    "mmr_selection_embeddings": (q_mmr_selection_embeddings,
                                 SQL_MMR),
}
