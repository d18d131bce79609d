"""Thirtieth oracle-query batch — graph-structure analytics / seasonal
anomaly detection:

- clustering_coeff_docs: LOCAL clustering coefficient C(u) = 2·tri(u) /
  (deg(u)·(deg(u)−1)) for every node of the deterministic doc link graph
  (doc → (31·doc + c) % N, c ∈ 1..3 — the graph pagerank / triangle /
  kcore walk). Three salted hash shuffles, never a driver adjacency:
  (1) node-keyed adjacency gather (dedup + full degree local to the
  group), (2) pair-keyed wedge closure where degree sentinels, edge
  presence rows and wedges ride ONE stream, (3) node-keyed (deg, tri)
  sum. Unlike ``triangle_count_docs`` (per-node triangle counts only,
  found once from the smallest vertex), every triangle here credits all
  three corners via its three wedge closures, and every node appears in
  the output with its degree and coefficient.
- adamic_adar_linkpred: Adamic–Adar link prediction — for every
  non-adjacent distance-2 pair, score = Σ_{w ∈ common(u,v)} 1/ln(deg w),
  top-20 by (score desc, u, v). The per-wedge weight is computed INSIDE
  the node-keyed adjacency group (degree is local there) and quantized to
  1e-12 integer units, so pair scores are exact int64 sums — summation
  order cannot reorder the top-k; existing edges are killed in the pair
  group by edge-presence rows on the same stream (no driver edge set).
  Wedges per center are deg·(deg−1)/2 ≤ 15 by construction; on skewed
  real graphs a degree cutoff would bound the same emission.
- seasonal_dow_anomaly: day-of-week seasonal baseline over daily event
  counts; a day is anomalous iff |cnt − μ_dow| > 2·σ_dow, evaluated as
  the EXACT integer predicate (n·cnt − s)² > 4·(n·s2 − s²) (population
  moments; Python-int arbitrary precision on the O(days) driver table, so
  no int64 overflow at any count scale — DuckDB promotes to HUGEINT).
  Weekday = (epoch_days + 3) % 7 on BOTH sides (no locale/dow-function
  mismatch). One O(days)-cell shuffle; μ/σ finalize identical-expression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6

_Q = 1_000_000_000_000
_G_PARTS = 128
_AA_TOP = 20
_US_PER_DAY = 86_400_000_000


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# shared graph stages
# ---------------------------------------------------------------------------


def _edge_rows(n: int):
    """map_batches fn: raw directed edges (u, (31u+c)%n), self-loops
    dropped, both orientations emitted so the node-keyed group sees the
    FULL adjacency; keyed by node."""
    def gen(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.repeat(ids, 3)
        v = (31 * u + np.tile(np.array([1, 2, 3], np.int64), len(ids))) % n
        keep = u != v
        u, v = u[keep], v[keep]
        w = np.concatenate([u, v])
        nbr = np.concatenate([v, u])
        return pa.table({"w": pa.array(w), "nbr": pa.array(nbr),
                         "gkey": pa.array((w % _G_PARTS).astype(np.int32))})
    return gen


def _adj_partition(mode: str):
    """Salted node-keyed partition: per node — dedup neighbors (full
    degree is local), emit on ONE stream:
      degree sentinels (p1=node, p2=-1, center=-2, val=deg)
      edge-presence rows (p1=node, p2=nbr>node, center=-1, val=0)
      wedge rows (p1<p2 = neighbor pair, center=node,
                  val = 0 (cc) | round(1e12/ln(deg)) (aa))
    """
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["w", "nbr"]).sort_values(["w", "nbr"])
        w = df["w"].to_numpy()
        nbr = df["nbr"].to_numpy()
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        ends = np.r_[starts[1:], len(w)]
        p1l, p2l, cl, vl = [], [], [], []
        for s, e in zip(starts, ends):
            node = int(w[s])
            nb = nbr[s:e]
            d = len(nb)
            # degree sentinel
            p1l.append(np.array([node], np.int64))
            p2l.append(np.array([-1], np.int64))
            cl.append(np.array([-2], np.int64))
            vl.append(np.array([d], np.int64))
            # edge-presence rows: each undirected edge once, from its
            # smaller endpoint
            up = nb[nb > node]
            if len(up):
                p1l.append(np.full(len(up), node, np.int64))
                p2l.append(up)
                cl.append(np.full(len(up), -1, np.int64))
                vl.append(np.zeros(len(up), np.int64))
            if d >= 2:
                ii, jj = np.triu_indices(d, k=1)
                if mode == "aa":
                    x = _Q / np.log(float(d))
                    units = np.int64(np.floor(x + 0.5))
                else:
                    units = np.int64(0)
                p1l.append(nb[ii])
                p2l.append(nb[jj])
                cl.append(np.full(len(ii), node, np.int64))
                vl.append(np.full(len(ii), units, np.int64))
        p1 = np.concatenate(p1l)
        p2 = np.concatenate(p2l)
        return pd.DataFrame({
            "p1": p1, "p2": p2, "center": np.concatenate(cl),
            "val": np.concatenate(vl),
            "pkey": ((p1 * 31 + p2) % _G_PARTS).astype(np.int32)})
    return fn


def _graph_pair_stream(sf_dir: str, mode: str):
    n = _nrows(sf_dir, "documents")
    return (_pq(sf_dir, "documents", ["doc_id"])
            .map_batches(_edge_rows(n), batch_format="pyarrow")
            .groupby("gkey")
            .map_groups(_adj_partition(mode), batch_format="pandas")
            .groupby("pkey"))


# ---------------------------------------------------------------------------
# local clustering coefficient
# ---------------------------------------------------------------------------


def q_clustering_coeff_docs(sf_dir: str):
    """Per-node local clustering coefficient (docstring above)."""
    def closure(df: pd.DataFrame) -> pd.DataFrame:
        deg = df[df["center"] == -2]
        edges = df[df["center"] == -1][["p1", "p2"]]
        wedges = df[df["center"] >= 0]
        out = [pd.DataFrame({"node": deg["p1"].to_numpy(np.int64),
                             "deg": deg["val"].to_numpy(np.int64),
                             "tri": np.zeros(len(deg), np.int64)})]
        if len(wedges) and len(edges):
            closed = wedges.merge(edges, on=["p1", "p2"], how="inner")
            if len(closed):
                out.append(pd.DataFrame({
                    "node": closed["center"].to_numpy(np.int64),
                    "deg": np.zeros(len(closed), np.int64),
                    "tri": np.ones(len(closed), np.int64)}))
        return pd.concat(out, ignore_index=True)

    agg = (_graph_pair_stream(sf_dir, "cc")
           .map_groups(closure, batch_format="pandas")
           .groupby("node")
           .aggregate(Sum("deg", alias_name="deg"),
                      Sum("tri", alias_name="tri")))

    def finalize(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        tri = t["tri"].to_numpy(zero_copy_only=False).astype(np.int64)
        c6 = np.where(deg >= 2,
                      _round6(2.0 * tri / (deg * np.maximum(deg - 1, 1))),
                      0.0)
        return pa.table({"doc_id": pa.array(node), "deg": pa.array(deg),
                         "tri": pa.array(tri), "c6": pa.array(c6)})

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_CLUSTER = """
WITH n AS (SELECT count(*) AS cnt FROM documents),
e0 AS (
  SELECT d.doc_id AS u, (31 * d.doc_id + c.c) % n.cnt AS v
  FROM documents d, n, (SELECT unnest([1, 2, 3]) AS c) c),
e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM e0 WHERE u <> v),
adj AS (SELECT a AS w, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT w, count(*)::BIGINT AS d FROM adj GROUP BY 1),
tri AS (
  SELECT a1.w AS node, count(*)::BIGINT AS t
  FROM adj a1
  JOIN adj a2 ON a1.w = a2.w AND a1.nbr < a2.nbr
  JOIN e ON e.a = a1.nbr AND e.b = a2.nbr
  GROUP BY 1)
SELECT d0.doc_id, deg.d AS deg, coalesce(tri.t, 0)::BIGINT AS tri,
       CASE WHEN deg.d >= 2
            THEN round(2.0 * coalesce(tri.t, 0) / (deg.d * (deg.d - 1)), 6)
            ELSE 0.0 END AS c6
FROM documents d0
JOIN deg ON deg.w = d0.doc_id
LEFT JOIN tri ON tri.node = d0.doc_id
ORDER BY d0.doc_id
"""


# ---------------------------------------------------------------------------
# Adamic–Adar link prediction
# ---------------------------------------------------------------------------


def q_adamic_adar_linkpred(sf_dir: str):
    """Top-20 predicted links by Adamic–Adar (docstring above)."""
    def closure(df: pd.DataFrame) -> pd.DataFrame:
        edges = df[df["center"] == -1][["p1", "p2"]]
        wedges = df[df["center"] >= 0]
        if not len(wedges):
            return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64),
                                 "common": pd.Series([], dtype=np.int64),
                                 "score_units": pd.Series([], dtype=np.int64)})
        m = wedges.merge(edges.assign(is_edge=1), on=["p1", "p2"],
                         how="left")
        m = m[m["is_edge"].isna()]
        g = m.groupby(["p1", "p2"], sort=False).agg(
            score_units=("val", "sum"), common=("val", "size")).reset_index()
        out = pd.DataFrame({"u": g["p1"].to_numpy(np.int64),
                            "v": g["p2"].to_numpy(np.int64),
                            "common": g["common"].to_numpy(np.int64),
                            "score_units": g["score_units"]
                            .to_numpy(np.int64)})
        # per-partition partial top-k (pair groups are disjoint by key)
        return out.sort_values(["score_units", "u", "v"],
                               ascending=[False, True, True],
                               kind="mergesort").head(_AA_TOP)

    parts = (_graph_pair_stream(sf_dir, "aa")
             .map_groups(closure, batch_format="pandas")
             .to_pandas())
    top = parts.sort_values(["score_units", "u", "v"],
                            ascending=[False, True, True],
                            kind="mergesort").head(_AA_TOP) \
        .reset_index(drop=True)
    for c in ("u", "v", "common", "score_units"):
        top[c] = top[c].astype(np.int64)
    top["aa6"] = _round6(top["score_units"].to_numpy() / float(_Q))
    return top


SQL_AA = f"""
WITH n AS (SELECT count(*) AS cnt FROM documents),
e0 AS (
  SELECT d.doc_id AS u, (31 * d.doc_id + c.c) % n.cnt AS v
  FROM documents d, n, (SELECT unnest([1, 2, 3]) AS c) c),
e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM e0 WHERE u <> v),
adj AS (SELECT a AS w, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT w, count(*)::BIGINT AS d FROM adj GROUP BY 1),
wedge AS (
  SELECT a1.nbr AS u, a2.nbr AS v,
         CAST(round({_Q} / ln(deg.d)) AS BIGINT) AS units
  FROM adj a1
  JOIN adj a2 ON a1.w = a2.w AND a1.nbr < a2.nbr
  JOIN deg ON deg.w = a1.w),
cand AS (
  SELECT u, v, count(*)::BIGINT AS common, sum(units)::BIGINT AS score_units
  FROM wedge
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = wedge.u AND e.b = wedge.v)
  GROUP BY 1, 2)
SELECT u, v, common, score_units,
       round(score_units / {_Q}.0, 6) AS aa6
FROM cand ORDER BY score_units DESC, u, v LIMIT {_AA_TOP}
"""


# ---------------------------------------------------------------------------
# day-of-week seasonal anomaly
# ---------------------------------------------------------------------------


def q_seasonal_dow_anomaly(sf_dir: str):
    """Anomalous days vs the day-of-week baseline (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day_idx": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    days = (ds.map_batches(dpart, batch_format="pyarrow")
              .groupby("day_idx").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("day_idx").reset_index(drop=True))
    day_idx = days["day_idx"].to_numpy().astype(np.int64)
    cnt = days["cnt"].to_numpy().astype(np.int64)
    dow = (day_idx + 3) % 7                       # Monday = 0, both sides
    rows = []
    for d in range(7):
        sel = dow == d
        if not sel.any():
            continue
        x = [int(v) for v in cnt[sel]]            # Python ints: exact
        n_, s_ = len(x), sum(x)
        s2_ = sum(v * v for v in x)
        var_num = n_ * s2_ - s_ * s_              # n² · σ²
        mu6 = float(_round6(np.array([s_ / n_]))[0])
        sd6 = float(_round6(np.array([np.sqrt(float(var_num)) / n_]))[0])
        for di, v in zip(day_idx[sel], x):
            lhs = (n_ * v - s_) ** 2
            if lhs > 4 * var_num:                 # exact integer predicate
                rows.append((int(di), d, v, mu6, sd6))
    out = pd.DataFrame(rows, columns=["day_idx", "dow", "cnt", "mu6", "sd6"])
    for c in ("day_idx", "dow", "cnt"):
        out[c] = out[c].astype(np.int64)
    for c in ("mu6", "sd6"):
        out[c] = out[c].astype(np.float64)
    return out.sort_values("day_idx").reset_index(drop=True)


SQL_DOW = f"""
WITH d AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx
  FROM events),
dc AS (SELECT day_idx, count(*)::BIGINT AS cnt FROM d GROUP BY 1),
dw AS (SELECT day_idx, ((day_idx + 3) % 7)::BIGINT AS dow, cnt FROM dc),
m AS (
  SELECT dow, count(*)::BIGINT AS n, sum(cnt)::BIGINT AS s,
         sum(cnt * cnt)::BIGINT AS s2
  FROM dw GROUP BY 1)
SELECT day_idx, dw.dow, cnt,
       round(s::DOUBLE / n, 6) AS mu6,
       round(sqrt((n * s2 - s * s)::DOUBLE) / n, 6) AS sd6
FROM dw JOIN m USING (dow)
WHERE (n * cnt - s)::HUGEINT * (n * cnt - s) > 4::HUGEINT * (n * s2 - s * s)
ORDER BY day_idx
"""


QUERIES30: dict[str, tuple] = {
    "clustering_coeff_docs": (q_clustering_coeff_docs, SQL_CLUSTER),
    "adamic_adar_linkpred": (q_adamic_adar_linkpred, SQL_AA),
    "seasonal_dow_anomaly": (q_seasonal_dow_anomaly, SQL_DOW),
}
