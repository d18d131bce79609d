"""One-hundred-eighth oracle-query batch — clustering quality on
once-quantized label centroids.  Shared machinery: embeddings are
quantized per component (qx = round(x*1000), exact ints); per-label
component sums S_l are exact ints, and each centroid is quantized ONCE
as cq_l = round(S_l/n_l) per component (identical float division both
sides) — every point-to-centroid squared distance is then an EXACT
int64 (<= 64*(8e3)^2 ~ 4e9 per point-pair).

- rocchio_centroid_accuracy: nearest-centroid (Rocchio)
  classification of every embedding against the label centroids —
  exact integer argmin (tie -> smallest label); training accuracy
  from exact counts.
- simplified_silhouette_labels: the centroid-based silhouette
  s = (b - a)/max(a, b) per point (a = dist to own centroid, b = min
  other; sqrt'd floats of exact ints), 1e-9-quantized per point and
  integer-summed -> exact mean numerator.
- davies_bouldin_labels: Davies-Bouldin index with sigma_l =
  sqrt(SUM d2 / n_l) (floats of exact ints) and quantized per-label
  max-ratio terms round(max_m (s_l+s_m)/d(c_l,c_m) * 1e9)
  integer-summed over the 8 labels.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _cents_vecs(t: pa.Table):
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
    qv = np.floor(emb.astype(np.float64) * 1000.0 + 0.5).astype(np.int64)
    return vid, lab, qv


def _centroids(sf_dir: str):
    """-> (labels sorted, {label: quantized centroid int vector},
    {label: n})."""
    ds = _pq(sf_dir, "embeddings",
             columns=["vec_id", "label", "embedding"])

    def spart(t: pa.Table) -> pa.Table:
        _, lab, qv = _cents_vecs(t)
        rows_l, rows_s, rows_n = [], [], []
        for lv in np.unique(lab):
            m = lab == lv
            rows_l.append(int(lv))
            rows_s.append(",".join(map(str, qv[m].sum(axis=0))))
            rows_n.append(int(m.sum()))
        return pa.table({"lab": pa.array(rows_l, pa.int64()),
                         "s": pa.array(rows_s, pa.string()),
                         "n": pa.array(rows_n, pa.int64())})

    parts = ds.map_batches(spart, batch_format="pyarrow").to_pandas()
    sums: dict[int, np.ndarray] = {}
    cnts: dict[int, int] = {}
    for lab, s, n in zip(parts["lab"], parts["s"], parts["n"]):
        v = np.array([int(x) for x in s.split(",")], object)
        lab = int(lab)
        sums[lab] = sums.get(lab, 0) + v
        cnts[lab] = cnts.get(lab, 0) + int(n)
    labels = sorted(sums)
    cq = {}
    for lv in labels:
        sv = sums[lv].astype(np.float64)
        c = sv / float(cnts[lv])
        cq[lv] = np.where(c >= 0, np.floor(c + 0.5),
                          np.ceil(c - 0.5)).astype(np.int64)
    return labels, cq, cnts


_CENTROID_SQL = """
ex AS MATERIALIZED (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS idx,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000.0)
              AS BIGINT) AS qv
  FROM embeddings),
cent AS MATERIALIZED (
  SELECT label, idx,
         CAST(round(CAST(sum(qv) AS DOUBLE) / count(DISTINCT vec_id))
              AS BIGINT) AS cq
  FROM ex GROUP BY 1, 2),
d2 AS MATERIALIZED (
  SELECT ex.vec_id, ex.label AS own, cent.label AS tgt,
         sum((ex.qv - cent.cq) * (ex.qv - cent.cq))::BIGINT AS d2
  FROM ex JOIN cent ON cent.idx = ex.idx
  GROUP BY 1, 2, 3)
"""


# ---------------------------------------------------------------------------
# Rocchio accuracy
# ---------------------------------------------------------------------------


def q_rocchio_centroid_accuracy(sf_dir: str):
    """Nearest-centroid classification accuracy (docstring above)."""
    labels, cq, _ = _centroids(sf_dir)
    ds = _pq(sf_dir, "embeddings",
             columns=["vec_id", "label", "embedding"])
    cmat = np.stack([cq[lv] for lv in labels])
    larr = np.array(labels, np.int64)

    def apart(t: pa.Table) -> pa.Table:
        _, lab, qv = _cents_vecs(t)
        # exact distances to every centroid
        d2 = ((qv[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
        pick = larr[np.argmin(d2, axis=1)]   # ties -> first = min label
        return pa.table({"g": pa.array([0], pa.int64()),
                         "n": pa.array([len(lab)], pa.int64()),
                         "ok": pa.array([int((pick == lab).sum())],
                                        pa.int64())})

    agg = (ds.map_batches(apart, batch_format="pyarrow")
             .groupby("g").aggregate(Sum("n", alias_name="n"),
                                     Sum("ok", alias_name="ok"))
             .to_pandas())
    n = int(agg["n"].iloc[0])
    ok = int(agg["ok"].iloc[0])
    out = pd.DataFrame({"n": [n], "correct": [ok],
                        "acc6": [_round6(np.array(
                            [float(ok) / float(n)]))[0]]})
    for col in ("n", "correct"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ROCCHIO = "WITH " + _CENTROID_SQL + """,
pick AS (
  SELECT vec_id, own, tgt AS pred FROM (
    SELECT vec_id, own, tgt,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, tgt) AS rn
    FROM d2)
  WHERE rn = 1),
c AS (SELECT count(*)::BIGINT AS n,
             sum((pred = own)::INT)::BIGINT AS ok
      FROM pick)
SELECT n, ok AS correct,
       round(CAST(ok AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc6
FROM c
"""


# ---------------------------------------------------------------------------
# Simplified silhouette
# ---------------------------------------------------------------------------


def q_simplified_silhouette_labels(sf_dir: str):
    """Centroid silhouette mean, per-point quantized (docstring
    above)."""
    labels, cq, _ = _centroids(sf_dir)
    ds = _pq(sf_dir, "embeddings",
             columns=["vec_id", "label", "embedding"])
    cmat = np.stack([cq[lv] for lv in labels])
    larr = np.array(labels, np.int64)

    def spart(t: pa.Table) -> pa.Table:
        _, lab, qv = _cents_vecs(t)
        d2 = ((qv[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2) \
            .astype(np.float64)
        d = np.sqrt(d2)
        own_idx = np.searchsorted(larr, lab)
        a = d[np.arange(len(lab)), own_idx]
        dm = d.copy()
        dm[np.arange(len(lab)), own_idx] = np.inf
        b = dm.min(axis=1)
        s = (b - a) / np.maximum(a, b)
        sq = np.where(s >= 0, np.floor(s * 1e9 + 0.5),
                      np.ceil(s * 1e9 - 0.5)).astype(np.int64)
        return pa.table({"g": pa.array([0], pa.int64()),
                         "n": pa.array([len(lab)], pa.int64()),
                         "sq": pa.array([int(sq.sum())], pa.int64())})

    agg = (ds.map_batches(spart, batch_format="pyarrow")
             .groupby("g").aggregate(Sum("n", alias_name="n"),
                                     Sum("sq", alias_name="sq"))
             .to_pandas())
    n = int(agg["n"].iloc[0])
    sq = int(agg["sq"].iloc[0])
    out = pd.DataFrame({"n": [n], "sq": [sq],
                        "sil6": [_round6(np.array(
                            [sq / (n * 1e9)]))[0]]})
    for col in ("n", "sq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SILHOUETTE = "WITH " + _CENTROID_SQL + """,
ab AS (
  SELECT vec_id,
         max(CASE WHEN tgt = own THEN sqrt(CAST(d2 AS DOUBLE)) END)
           AS a,
         min(CASE WHEN tgt <> own THEN sqrt(CAST(d2 AS DOUBLE)) END)
           AS b
  FROM d2 GROUP BY 1),
q AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(round((b - a) / greatest(a, b) * 1000000000.0)
                  AS BIGINT))::BIGINT AS sq
  FROM ab)
SELECT n, sq,
       round(CAST(sq AS DOUBLE) / (n * 1000000000.0), 6) AS sil6
FROM q
"""


# ---------------------------------------------------------------------------
# Davies-Bouldin
# ---------------------------------------------------------------------------


def q_davies_bouldin_labels(sf_dir: str):
    """DB index with quantized per-label max ratios (docstring
    above)."""
    labels, cq, cnts = _centroids(sf_dir)
    ds = _pq(sf_dir, "embeddings",
             columns=["vec_id", "label", "embedding"])
    cmat = np.stack([cq[lv] for lv in labels])
    larr = np.array(labels, np.int64)

    def wpart(t: pa.Table) -> pa.Table:
        _, lab, qv = _cents_vecs(t)
        own_idx = np.searchsorted(larr, lab)
        diff = qv - cmat[own_idx]
        d2 = (diff * diff).sum(axis=1)
        df = pd.DataFrame({"lab": lab, "s": d2})
        g = df.groupby("lab", sort=False)["s"].sum().reset_index()
        g["s"] = g["s"].astype(np.int64)
        return _strip(g)

    within = (ds.map_batches(wpart, batch_format="pyarrow")
                .groupby("lab").aggregate(Sum("s", alias_name="s"))
                .to_pandas().set_index("lab"))
    sig = {lv: math.sqrt(float(int(within.loc[lv]["s"]))
                         / float(cnts[lv])) for lv in labels}
    dbq = 0
    for li in labels:
        best = None
        for lj in labels:
            if lj == li:
                continue
            dd = cmat[labels.index(li)] - cmat[labels.index(lj)]
            dcc = math.sqrt(float(int((dd.astype(object)
                                       * dd.astype(object)).sum())))
            r = (sig[li] + sig[lj]) / dcc
            if best is None or r > best:
                best = r
        dbq += int(math.floor(best * 1e9 + 0.5))
    db = dbq / (len(labels) * 1e9)
    out = pd.DataFrame({"k": [len(labels)], "dbq": [dbq],
                        "db6": [_round6(np.array([db]))[0]]})
    for col in ("k", "dbq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_DAVIES_BOULDIN = "WITH " + _CENTROID_SQL + """,
sig AS (
  SELECT own AS lab,
         sqrt(CAST(sum(CASE WHEN tgt = own THEN d2 ELSE 0 END)
                   AS DOUBLE)
              / count(DISTINCT vec_id)) AS s
  FROM d2 GROUP BY 1),
cd AS (
  SELECT a.label AS li, b.label AS lj,
         sqrt(CAST(sum((a.cq - b.cq) * (a.cq - b.cq)) AS DOUBLE)) AS d
  FROM cent a JOIN cent b ON b.idx = a.idx AND b.label <> a.label
  GROUP BY 1, 2),
rr AS (
  SELECT cd.li,
         max((sa.s + sb.s) / cd.d) AS r
  FROM cd JOIN sig sa ON sa.lab = cd.li
  JOIN sig sb ON sb.lab = cd.lj
  GROUP BY 1),
q AS (
  SELECT count(*)::BIGINT AS k,
         sum(CAST(round(r * 1000000000.0) AS BIGINT))::BIGINT AS dbq
  FROM rr)
SELECT k, dbq,
       round(CAST(dbq AS DOUBLE) / (k * 1000000000.0), 6) AS db6
FROM q
"""


QUERIES108: dict[str, tuple] = {
    "rocchio_centroid_accuracy": (q_rocchio_centroid_accuracy,
                                  SQL_ROCCHIO),
    "simplified_silhouette_labels": (q_simplified_silhouette_labels,
                                     SQL_SILHOUETTE),
    "davies_bouldin_labels": (q_davies_bouldin_labels,
                              SQL_DAVIES_BOULDIN),
}
