"""One-hundred-thirty-fifth oracle-query batch — exact geometry of the
embedding set (the queries108/116 1e-3-quantized integer-distance
device; the full quantized matrix is ≤ 2000×64 and broadcasts via
closure):

- medoid_embeddings: the exact 1-medoid (argmin of total squared
  distance, vec_id tiebreak) and the exact diameter pair — PURE
  integers end to end.
- dunn_index_labels: Dunn cluster-validity index — min inter-label
  over max intra-label distance; both extremes are exact integers,
  the final sqrt ratio finalizes identically.
- hubness_embeddings: k=5 reverse-neighbor counts N_k with exact
  (d2, vec_id) neighbor ordering; max hub, antihub count, and the
  moment skewness of N_k from cleared integer sums.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq_
from ray.data.aggregate import Max, Min, Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6


def _full_q(sf_dir: str):
    """(sorted vec_ids, labels, quantized int64 matrix)."""
    full = pq_.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "label", "embedding"])
    vid = full["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vid)
    vid = vid[order]
    lab = full["label"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)[order]
    emb = np.stack(full["embedding"].to_pylist())[order]
    qm = (np.sign(emb) * np.floor(np.abs(emb.astype(np.float64))
                                  * 1000.0 + 0.5)).astype(np.int64)
    return vid, lab, qm


def _batch_q(t: pa.Table):
    bv = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    be = np.stack(t["embedding"].to_pylist())
    bq = (np.sign(be) * np.floor(np.abs(be.astype(np.float64))
                                 * 1000.0 + 0.5)).astype(np.int64)
    return bv, bq


def _d2(bq: np.ndarray, qm: np.ndarray) -> np.ndarray:
    return ((bq[:, None, :] - qm[None, :, :]) ** 2).sum(axis=2)


# ---------------------------------------------------------------------------
# Medoid + diameter
# ---------------------------------------------------------------------------


def q_medoid_embeddings(sf_dir: str):
    """Exact medoid and diameter pair (docstring above)."""
    vid, _, qm = _full_q(sf_dir)

    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def mpart(t: pa.Table) -> pa.Table:
        bv, bq = _batch_q(t)
        d2 = _d2(bq, qm)
        tot = d2.sum(axis=1)
        # local diameter candidate (ordered pair, va < vb)
        va = np.repeat(bv, len(vid))
        vb = np.tile(vid, len(bv))
        dd = d2.ravel()
        m = va < vb
        if m.any():
            dd_m, va_m, vb_m = dd[m], va[m], vb[m]
            best = np.lexsort((vb_m, va_m, -dd_m))[0]
            drow = (int(dd_m[best]), int(va_m[best]), int(vb_m[best]))
        else:
            drow = (-1, -1, -1)
        return pa.table({
            "vec_id": pa.array(np.concatenate((bv, [-1]))),
            "tot": pa.array(np.concatenate((tot, [0]))),
            "dd": pa.array([0] * len(bv) + [drow[0]], pa.int64()),
            "da": pa.array([0] * len(bv) + [drow[1]], pa.int64()),
            "db": pa.array([0] * len(bv) + [drow[2]], pa.int64())})

    parts = (ds.map_batches(mpart, batch_format="pyarrow")
             .to_pandas())
    pts = parts[parts["vec_id"] >= 0]
    med = pts.sort_values(["tot", "vec_id"]).iloc[0]
    dm = parts[parts["vec_id"] < 0]
    dm = dm.sort_values(["dd", "da", "db"],
                        ascending=[False, True, True]).iloc[0]
    out = pd.DataFrame({"medoid_id": [int(med["vec_id"])],
                        "tot_d2": [int(med["tot"])],
                        "diam_va": [int(dm["da"])],
                        "diam_vb": [int(dm["db"])],
                        "diam_d2": [int(dm["dd"])]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_MEDOID = """
WITH ex AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000.0)
              AS BIGINT) AS qv
  FROM embeddings),
d2 AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         sum((a.qv - b.qv) * (a.qv - b.qv))::BIGINT AS d2
  FROM ex a JOIN ex b ON a.idx = b.idx AND a.vec_id <> b.vec_id
  GROUP BY 1, 2),
med AS (
  SELECT va, sum(d2)::BIGINT AS tot,
         row_number() OVER (ORDER BY sum(d2), va) AS r
  FROM d2 GROUP BY 1),
diam AS (
  SELECT va, vb, d2,
         row_number() OVER (ORDER BY d2 DESC, va, vb) AS r
  FROM d2 WHERE va < vb)
SELECT (SELECT va FROM med WHERE r = 1) AS medoid_id,
       (SELECT tot FROM med WHERE r = 1) AS tot_d2,
       (SELECT va FROM diam WHERE r = 1) AS diam_va,
       (SELECT vb FROM diam WHERE r = 1) AS diam_vb,
       (SELECT d2 FROM diam WHERE r = 1) AS diam_d2
"""


# ---------------------------------------------------------------------------
# Dunn index
# ---------------------------------------------------------------------------


def q_dunn_index_labels(sf_dir: str):
    """Dunn index: min inter / max intra distance (docstring)."""
    vid, lab, qm = _full_q(sf_dir)
    ds = _pq(sf_dir, "embeddings",
             columns=["vec_id", "label", "embedding"])

    def dpart(t: pa.Table) -> pa.Table:
        bv, bq = _batch_q(t)
        bl = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = _d2(bq, qm)
        same = bl[:, None] == lab[None, :]
        noself = bv[:, None] != vid[None, :]
        intra = d2[same & noself]
        inter = d2[~same]
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "mx_intra": pa.array([int(intra.max()) if len(intra)
                                  else -1], pa.int64()),
            "mn_inter": pa.array([int(inter.min()) if len(inter)
                                  else 2 ** 62], pa.int64())})

    agg = (ds.map_batches(dpart, batch_format="pyarrow")
             .groupby("g").aggregate(Max("mx_intra",
                                         alias_name="mx_intra"),
                                     Min("mn_inter",
                                         alias_name="mn_inter"))
             .to_pandas())
    mx = int(agg["mx_intra"].iloc[0])
    mn = int(agg["mn_inter"].iloc[0])
    dunn = np.sqrt(float(mn)) / np.sqrt(float(mx))
    out = pd.DataFrame({"max_intra_d2": [mx], "min_inter_d2": [mn],
                        "dunn6": [_round6(np.array([dunn]))[0]]})
    for col in ("max_intra_d2", "min_inter_d2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_DUNN = """
WITH ex AS MATERIALIZED (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS idx,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000.0)
              AS BIGINT) AS qv
  FROM embeddings),
d2 AS (
  SELECT a.vec_id AS va, a.label AS la, b.label AS lb,
         sum((a.qv - b.qv) * (a.qv - b.qv))::BIGINT AS d2
  FROM ex a JOIN ex b ON a.idx = b.idx AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id, a.label, b.label),
m AS (
  SELECT max(CASE WHEN la = lb THEN d2 END)::BIGINT AS mx,
         min(CASE WHEN la <> lb THEN d2 END)::BIGINT AS mn
  FROM d2)
SELECT mx AS max_intra_d2, mn AS min_inter_d2,
       round(sqrt(CAST(mn AS DOUBLE)) / sqrt(CAST(mx AS DOUBLE)), 6)
         AS dunn6
FROM m
"""


# ---------------------------------------------------------------------------
# Hubness
# ---------------------------------------------------------------------------


def q_hubness_embeddings(sf_dir: str):
    """k=5 reverse-neighbor counts and their skewness (docstring)."""
    vid, _, qm = _full_q(sf_dir)
    n = len(vid)
    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def hpart(t: pa.Table) -> pa.Table:
        bv, bq = _batch_q(t)
        d2 = _d2(bq, qm)
        pos = np.searchsorted(vid, bv)
        # sentinel must survive the *4096 composite in int64 — 2^50
        # (any real d2 is <= ~2.3e9)
        d2[np.arange(len(bv)), pos] = np.int64(2 ** 50)   # no self
        # exact (d2, vec_id-order) composite — vid is ascending so the
        # column index IS the vid tiebreak order
        comp = d2 * np.int64(4096) + np.arange(n, dtype=np.int64)
        nn = np.argpartition(comp, 5, axis=1)[:, :5]
        ids = vid[nn.ravel()]
        g = pd.DataFrame({"nb": ids, "c": np.int64(1)}) \
            .groupby("nb", sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        from scrapy_ray.pipelines.queries47 import _strip
        return _strip(g)

    cnt = (ds.map_batches(hpart, batch_format="pyarrow")
             .groupby("nb").aggregate(Sum("c", alias_name="c"))
             .to_pandas())
    c_map = np.zeros(n, np.int64)
    pos = np.searchsorted(vid, cnt["nb"].to_numpy(np.int64))
    c_map[pos] = cnt["c"].to_numpy(np.int64)
    s1 = int(c_map.sum())
    s2 = int((c_map * c_map).sum())
    s3 = int((c_map * c_map * c_map).sum())
    a2 = n * s2 - s1 * s1
    a3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
    nf = float(n)
    skew = ((float(a3) / (nf * nf * nf))
            / np.power(float(a2) / (nf * nf), 1.5))
    out = pd.DataFrame({
        "n": [n], "k": [5], "max_hub": [int(c_map.max())],
        "n_antihubs": [int((c_map == 0).sum())],
        "skew6": [_round6(np.array([skew]))[0]]})
    for col in ("n", "k", "max_hub", "n_antihubs"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HUBNESS = """
WITH ex AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000.0)
              AS BIGINT) AS qv
  FROM embeddings),
d2 AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         sum((a.qv - b.qv) * (a.qv - b.qv))::BIGINT AS d2
  FROM ex a JOIN ex b ON a.idx = b.idx AND a.vec_id <> b.vec_id
  GROUP BY 1, 2),
nn AS (
  SELECT vb FROM (
    SELECT va, vb, row_number() OVER (PARTITION BY va
                                      ORDER BY d2, vb) AS rn
    FROM d2)
  WHERE rn <= 5),
cc AS (
  SELECT e.vec_id, coalesce(h.c, 0) AS c
  FROM (SELECT DISTINCT vec_id FROM embeddings) e
  LEFT JOIN (SELECT vb, count(*)::BIGINT AS c FROM nn GROUP BY 1) h
    ON h.vb = e.vec_id),
m AS (
  SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s1,
         sum(CAST(c AS HUGEINT) * c)::BIGINT AS s2,
         sum(CAST(c AS HUGEINT) * c * c)::BIGINT AS s3,
         max(c)::BIGINT AS mx, sum((c = 0)::INT)::BIGINT AS n_anti
  FROM cc),
f AS (
  SELECT n, mx, n_anti,
         CAST(CAST(n AS HUGEINT) * s2
              - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) AS a2,
         CAST(CAST(n AS HUGEINT) * n * s3
              - 3 * CAST(n AS HUGEINT) * s1 * s2
              + 2 * CAST(s1 AS HUGEINT) * s1 * s1 AS DOUBLE) AS a3
  FROM m)
SELECT n, 5::BIGINT AS k, mx AS max_hub, n_anti AS n_antihubs,
       round((a3 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * CAST(n AS DOUBLE)))
             / pow(a2 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 1.5),
             6) AS skew6
FROM f
"""


QUERIES135: dict[str, tuple] = {
    "medoid_embeddings": (q_medoid_embeddings, SQL_MEDOID),
    "dunn_index_labels": (q_dunn_index_labels, SQL_DUNN),
    "hubness_embeddings": (q_hubness_embeddings, SQL_HUBNESS),
}
