"""Thirty-ninth oracle-query batch — spectral analysis / rank
correlation / retrieval evaluation:

- pca_power_iteration: top principal component of the lineitem
  (quantity, price-dollars, discount-centipct) CORRELATION matrix via
  24 fixed power iterations. The 3×3 covariance NUMERATORS
  n·Σxy − Σx·Σy are exact (per-batch int64 moment partials, Python-int
  combine — the cov_matrix discipline); each is cast to float64
  (Python float(int) == DuckDB CAST(HUGEINT AS DOUBLE) — both
  correctly rounded, verified incl. the 2^53+1 tie), normalized to
  correlations r_ij = c_ij/(√c_ii·√c_jj) (covariance would be
  degenerate — price variance dwarfs the rest), and the iteration
  v ← Cv/‖Cv‖ is replayed step-for-step by a recursive CTE with
  textually identical float expressions (holt precedent). Sign
  canonicalized on the price component; the explained-variance ratio
  λ/tr(C) finalizes identical-expression round6.
- kendall_tau_qty_discount: exact Kendall τ-b between l_quantity and
  l_discount from the (quantity, discount-bp) cell matrix — O(50×11)
  cells on one tiny shuffle, concordant/discordant/tie counts as exact
  int64 over cell PAIRS (driver O(cells²) numpy; SQL mirrors with a
  cells self-join, never a row-pair join), τ finalized as one identical
  float expression of four integers.
- mrr_first_relevant: mean reciprocal rank of the first relevant doc
  (relevance = mirrored multiplicative hash of doc_id ≡ 0 mod 7 — a
  plain doc_id % k would correlate with the source assignment) per
  source, ranked by (n_chars DESC, doc_id ASC)
  — NO global sort: pass 1 finds each source's best relevant doc as a
  packed-integer distributed argmax (tpch_q2 discipline), pass 2 counts
  strictly-better docs per source (rank = count + 1). RR is quantized
  exactly as (2·10¹² + rank) // (2·rank) — pure integer half-away
  rounding of 10¹²/rank — and the MRR over sources is an exact integer
  sum divided once (never-sum-floats rule).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6

_PCA_ITERS = 24
_MRR_PACK = 2**42           # > any doc_id; packs (n_chars, -doc_id)
_MRR_SCALE = 10**12
_MRR_MOD = 4294967296
_MRR_MULT = 2654435761


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# PCA power iteration
# ---------------------------------------------------------------------------

_PCA_COLS = ("q", "p", "d")
_PCA_PAIRS = [(a, b) for i, a in enumerate(_PCA_COLS)
              for b in _PCA_COLS[i:]]


def q_pca_power_iteration(sf_dir: str):
    """Top principal component via fixed-step power iteration on the
    exact covariance numerator matrix (docstring above)."""
    ds = _pq(sf_dir, "lineitem",
             ["l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        def r(col: str, scale: float) -> np.ndarray:
            y = t[col].to_numpy(zero_copy_only=False).astype(np.float64) \
                * scale
            return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)

        v = {"q": r("l_quantity", 1.0), "p": r("l_extendedprice", 1.0),
             "d": r("l_discount", 100.0)}
        row = {"n": np.int64(len(t))}
        for c in _PCA_COLS:
            row[f"s_{c}"] = v[c].sum()
        for a, b in _PCA_PAIRS:
            row[f"s_{a}{b}"] = (v[a] * v[b]).sum()
        return pa.table({k: pa.array([int(x)]) for k, x in row.items()})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    s = {c: sum(int(x) for x in parts[f"s_{c}"]) for c in _PCA_COLS}
    c = {}
    for a, b in _PCA_PAIRS:
        sxy = sum(int(x) for x in parts[f"s_{a}{b}"])
        c[a + b] = float(n * sxy - s[a] * s[b])
    # correlation matrix (identical-expression floats of the exact
    # integer numerators) — covariance would be degenerate: the price
    # variance dwarfs the other two, collapsing the eigvec to (0,1,0)
    sdq = math.sqrt(c["qq"])
    sdp = math.sqrt(c["pp"])
    sdd = math.sqrt(c["dd"])
    cqq = c["qq"] / (sdq * sdq)
    cqp = c["qp"] / (sdq * sdp)
    cqd = c["qd"] / (sdq * sdd)
    cpp = c["pp"] / (sdp * sdp)
    cpd = c["pd"] / (sdp * sdd)
    cdd = c["dd"] / (sdd * sdd)
    vq = 1.0 / math.sqrt(3.0)
    vp = 1.0 / math.sqrt(3.0)
    vd = 1.0 / math.sqrt(3.0)
    for _ in range(_PCA_ITERS):
        wq = cqq * vq + cqp * vp + cqd * vd
        wp = cqp * vq + cpp * vp + cpd * vd
        wd = cqd * vq + cpd * vp + cdd * vd
        nrm = math.sqrt(wq * wq + wp * wp + wd * wd)
        vq, vp, vd = wq / nrm, wp / nrm, wd / nrm
    wq = cqq * vq + cqp * vp + cqd * vd
    wp = cqp * vq + cpp * vp + cpd * vd
    wd = cqd * vq + cpd * vp + cdd * vd
    lam = vq * wq + vp * wp + vd * wd
    evr = lam / ((cqq + cpp) + cdd)
    if vp < 0.0:
        vq, vp, vd = -vq, -vp, -vd
    r6 = _round6(np.array([vq, vp, vd, evr]))
    out = pd.DataFrame({"n": [n], "iters": [_PCA_ITERS],
                        "vq6": [r6[0]], "vp6": [r6[1]], "vd6": [r6[2]],
                        "evr6": [r6[3]]})
    out["n"] = out["n"].astype(np.int64)
    out["iters"] = out["iters"].astype(np.int64)
    return out


SQL_PCA = f"""
WITH RECURSIVE
b AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(round(l_extendedprice) AS BIGINT) AS p,
             CAST(round(l_discount * 100) AS BIGINT) AS d
      FROM lineitem),
s AS (SELECT count(*)::HUGEINT AS n,
             sum(q)::HUGEINT AS sq, sum(p)::HUGEINT AS sp,
             sum(d)::HUGEINT AS sd,
             sum(q * q)::HUGEINT AS sqq, sum(q * p)::HUGEINT AS sqp,
             sum(q * d)::HUGEINT AS sqd, sum(p * p)::HUGEINT AS spp,
             sum(p * d)::HUGEINT AS spd, sum(d * d)::HUGEINT AS sdd
      FROM b),
c0 AS (SELECT n::BIGINT AS n,
             CAST(n * sqq - sq * sq AS DOUBLE) AS nqq,
             CAST(n * sqp - sq * sp AS DOUBLE) AS nqp,
             CAST(n * sqd - sq * sd AS DOUBLE) AS nqd,
             CAST(n * spp - sp * sp AS DOUBLE) AS npp,
             CAST(n * spd - sp * sd AS DOUBLE) AS npd,
             CAST(n * sdd - sd * sd AS DOUBLE) AS ndd
      FROM s),
c AS (SELECT n,
             nqq / (sqrt(nqq) * sqrt(nqq)) AS cqq,
             nqp / (sqrt(nqq) * sqrt(npp)) AS cqp,
             nqd / (sqrt(nqq) * sqrt(ndd)) AS cqd,
             npp / (sqrt(npp) * sqrt(npp)) AS cpp,
             npd / (sqrt(npp) * sqrt(ndd)) AS cpd,
             ndd / (sqrt(ndd) * sqrt(ndd)) AS cdd
      FROM c0),
r AS (
  SELECT 0 AS i, 1.0 / sqrt(3.0) AS vq, 1.0 / sqrt(3.0) AS vp,
         1.0 / sqrt(3.0) AS vd
  UNION ALL
  SELECT i + 1, wq / nrm, wp / nrm, wd / nrm
  FROM (
    SELECT i, wq, wp, wd, sqrt(wq * wq + wp * wp + wd * wd) AS nrm
    FROM (
      SELECT r.i,
             c.cqq * r.vq + c.cqp * r.vp + c.cqd * r.vd AS wq,
             c.cqp * r.vq + c.cpp * r.vp + c.cpd * r.vd AS wp,
             c.cqd * r.vq + c.cpd * r.vp + c.cdd * r.vd AS wd
      FROM r, c WHERE r.i < {_PCA_ITERS}))),
fin AS (
  SELECT vq, vp, vd,
         c.cqq * vq + c.cqp * vp + c.cqd * vd AS wq,
         c.cqp * vq + c.cpp * vp + c.cpd * vd AS wp,
         c.cqd * vq + c.cpd * vp + c.cdd * vd AS wd,
         c.cqq AS cqq, c.cpp AS cpp, c.cdd AS cdd, c.n AS n
  FROM r, c WHERE r.i = {_PCA_ITERS})
SELECT n, {_PCA_ITERS}::BIGINT AS iters,
       round(CASE WHEN vp < 0.0 THEN -vq ELSE vq END, 6) AS vq6,
       round(CASE WHEN vp < 0.0 THEN -vp ELSE vp END, 6) AS vp6,
       round(CASE WHEN vp < 0.0 THEN -vd ELSE vd END, 6) AS vd6,
       round((vq * wq + vp * wp + vd * wd) / ((cqq + cpp) + cdd), 6)
         AS evr6
FROM fin
"""


# ---------------------------------------------------------------------------
# Kendall tau-b
# ---------------------------------------------------------------------------


def q_kendall_tau_qty_discount(sf_dir: str):
    """Exact Kendall tau-b from the (quantity, discount-bp) cell matrix
    (docstring above)."""
    ds = _pq(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def cpart(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = t["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64) * 10000.0
        qi = np.floor(q + 0.5).astype(np.int64)
        di = np.floor(d + 0.5).astype(np.int64)
        df = pd.DataFrame({"q": qi, "d": di, "n": np.int64(1)})
        g = df.groupby(["q", "d"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["q", "d"]).aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    q = cells["q"].to_numpy(np.int64)
    d = cells["d"].to_numpy(np.int64)
    cn = cells["n"].to_numpy(np.int64)
    lt_q = q[:, None] < q[None, :]
    lt_d = d[:, None] < d[None, :]
    gt_d = d[:, None] > d[None, :]
    pair_n = cn[:, None] * cn[None, :]
    nc = int(pair_n[lt_q & lt_d].sum())
    nd = int(pair_n[lt_q & gt_d].sum())
    n = int(cn.sum())
    n0 = n * (n - 1) // 2
    tq = pd.Series(cn).groupby(pd.Series(q)).sum().to_numpy(np.int64)
    td = pd.Series(cn).groupby(pd.Series(d)).sum().to_numpy(np.int64)
    n1 = int((tq * (tq - 1) // 2).sum())
    n2 = int((td * (td - 1) // 2).sum())
    tau = float(nc - nd) / (math.sqrt(float(n0 - n1))
                            * math.sqrt(float(n0 - n2)))
    out = pd.DataFrame({"n": [n], "nc": [nc], "nd": [nd],
                        "n1": [n1], "n2": [n2],
                        "tau6": [_round6(np.array([tau]))[0]]})
    for col in ("n", "nc", "nd", "n1", "n2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KENDALL = """
WITH e AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_discount * 10000) AS BIGINT) AS d
  FROM lineitem),
cells AS (SELECT q, d, count(*)::BIGINT AS n FROM e GROUP BY 1, 2),
conc AS (
  SELECT coalesce(sum(c1.n * c2.n), 0)::BIGINT AS nc
  FROM cells c1 JOIN cells c2 ON c1.q < c2.q AND c1.d < c2.d),
disc AS (
  SELECT coalesce(sum(c1.n * c2.n), 0)::BIGINT AS nd
  FROM cells c1 JOIN cells c2 ON c1.q < c2.q AND c1.d > c2.d),
tot AS (SELECT sum(n)::BIGINT AS n FROM cells),
tiex AS (
  SELECT sum(t * (t - 1) // 2)::BIGINT AS n1
  FROM (SELECT sum(n)::BIGINT AS t FROM cells GROUP BY q)),
tiey AS (
  SELECT sum(t * (t - 1) // 2)::BIGINT AS n2
  FROM (SELECT sum(n)::BIGINT AS t FROM cells GROUP BY d))
SELECT n, nc, nd, n1, n2,
       round(CAST(nc - nd AS DOUBLE)
             / (sqrt(CAST(n * (n - 1) // 2 - n1 AS DOUBLE))
                * sqrt(CAST(n * (n - 1) // 2 - n2 AS DOUBLE))), 6) AS tau6
FROM conc, disc, tot, tiex, tiey
"""


# ---------------------------------------------------------------------------
# MRR
# ---------------------------------------------------------------------------


def q_mrr_first_relevant(sf_dir: str):
    """Mean reciprocal rank of the first relevant doc per source
    (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    _E1 = {"source": pa.array([], pa.string()),
           "packed": pa.array([], pa.int64())}

    def best_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids.astype(np.uint64) % np.uint64(_MRR_MOD))
             * np.uint64(_MRR_MULT)) % np.uint64(_MRR_MOD)
        rel = h % np.uint64(7) == 0
        if not rel.any():
            return pa.table(_E1)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(t["source"].to_pylist(), dtype=object)[rel]
        packed = nc[rel] * np.int64(_MRR_PACK) - ids[rel]
        df = pd.DataFrame({"source": src, "packed": packed})
        g = df.groupby("source", sort=False)["packed"].max().reset_index()
        g["packed"] = g["packed"].astype(np.int64)
        return _strip(g)

    best = (ds.map_batches(best_partial, batch_format="pyarrow")
              .groupby("source").aggregate(Max("packed",
                                               alias_name="packed"))
              .to_pandas())
    if len(best) == 0:
        return pd.DataFrame({"source": pd.Series([], dtype=object),
                             "best_chars": pd.Series([], dtype=np.int64),
                             "best_doc": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64),
                             "rr_units": pd.Series([], dtype=np.int64),
                             "mrr6": pd.Series([], dtype=np.float64)})
    packed = best["packed"].to_numpy(np.int64)
    bn = (packed + _MRR_PACK - 1) // _MRR_PACK
    bid = bn * _MRR_PACK - packed
    bmap = {s: (int(a), int(b))
            for s, a, b in zip(best["source"], bn, bid)}

    _E2 = {"source": pa.array([], pa.string()),
           "cnt": pa.array([], pa.int64())}

    def cnt_partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bn_v = np.array([bmap.get(s, (-1, -1))[0] for s in src], np.int64)
        bid_v = np.array([bmap.get(s, (-1, -1))[1] for s in src], np.int64)
        better = (bn_v >= 0) & ((nc > bn_v) | ((nc == bn_v) & (ids < bid_v)))
        if not better.any():
            return pa.table(_E2)
        df = pd.DataFrame({"source": src[better], "cnt": np.int64(1)})
        g = df.groupby("source", sort=False)["cnt"].sum().reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    cnts = (ds.map_batches(cnt_partial, batch_format="pyarrow")
              .groupby("source").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())
    cmap = {s: int(c) for s, c in zip(cnts["source"], cnts["cnt"])}
    rows = []
    for s in sorted(bmap):
        b_n, b_id = bmap[s]
        rank = cmap.get(s, 0) + 1
        rr_u = (2 * _MRR_SCALE + rank) // (2 * rank)
        rows.append((s, b_n, b_id, rank, rr_u))
    out = pd.DataFrame(rows, columns=["source", "best_chars", "best_doc",
                                      "rank", "rr_units"])
    su = int(out["rr_units"].sum())
    ns = int(len(out))
    out["mrr6"] = _round6(np.array(
        [(float(su) / float(ns)) / float(_MRR_SCALE)]))[0]
    for col in ("best_chars", "best_doc", "rank", "rr_units"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


SQL_MRR = f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents),
fr AS (
  SELECT source, min(rnk)::BIGINT AS rank
  FROM ranked
  WHERE ((doc_id::UBIGINT % {_MRR_MOD}) * {_MRR_MULT}::UBIGINT)
        % {_MRR_MOD} % 7 = 0
  GROUP BY 1),
u AS (
  SELECT fr.source, r2.n_chars AS best_chars, r2.doc_id AS best_doc,
         fr.rank,
         (2 * {_MRR_SCALE} + fr.rank) // (2 * fr.rank) AS rr_units
  FROM fr JOIN ranked r2 ON r2.source = fr.source AND r2.rnk = fr.rank),
m AS (SELECT sum(rr_units)::BIGINT AS su, count(*)::BIGINT AS ns FROM u)
SELECT u.source, u.best_chars, u.best_doc, u.rank, u.rr_units,
       round((CAST(m.su AS DOUBLE) / CAST(m.ns AS DOUBLE))
             / {_MRR_SCALE}.0, 6) AS mrr6
FROM u CROSS JOIN m
ORDER BY u.source
"""


QUERIES39: dict[str, tuple] = {
    "pca_power_iteration": (q_pca_power_iteration, SQL_PCA),
    "kendall_tau_qty_discount": (q_kendall_tau_qty_discount, SQL_KENDALL),
    "mrr_first_relevant": (q_mrr_first_relevant, SQL_MRR),
}
