"""Seventy-third oracle-query batch — degree-structure trio on the
quadratic doc graph u -> (u^2+c) mod N, c = 1..3 (the assortativity /
Moran graph; no self-loops at any sf — probed).  All three queries
reduce the graph DISTRIBUTED to two tiny exact histograms and do only
driver-side integer math:

  stage A: edge rows keyed by DESTINATION co-partition with node
  marker rows (salted 256 ways), so each partition computes the exact
  total degree deg(v) = 3 + in-deg(v) of its nodes locally and emits
  edge rows now carrying deg_v plus (node, deg) rows;
  stage B: re-key edges by SOURCE with the (node, deg) rows, attach
  deg_u, and reduce straight to the (deg_u, deg_v) PAIR-cell counts —
  the degree support is tiny (6 values at sf0.001: 3/7/13/17/23/27),
  so <= ~40 cells and a <= ~8-row degree histogram reach the driver.

- rich_club_docs: rich-club coefficient phi(k) = 2*E_k/(N_k*(N_k-1))
  for the fixed grid k in {3,6,9,12}: N_k = # nodes with deg > k off
  the degree histogram, E_k = # directed edges with min(deg_u,deg_v)
  > k off the pair cells (the directed edge count IS the undirected
  count here — each unordered link appears once as u -> v).  Exact
  ints; phi identical-expression.  Probe sf0.001: k=6 -> N=306,
  E=918, phi=0.019672; k=9 -> N=18, E=2, phi=0.013072.
- knn_degree_docs: Pastor-Satorras average-nearest-neighbor-degree
  function knn(d): per degree class d, the mean total degree of
  neighbors over BOTH edge directions (undirected neighbor relation)
  = exact rational sum_nb/cnt off the pair cells.  Probe sf0.001:
  knn(3)=11.78 > knn(7)=8.07 > knn(27)=5.30 — decreasing
  (disassortative, consistent with degree_assortativity_docs).
- powerlaw_alpha_docs: discrete power-law MLE on the in-degree tail
  ind >= kmin = 4 (in-deg support {0,4,10,14,20,24} at sf0.001):
  alpha = 1 + n_tail / SUM ln(k/(kmin-0.5)).  Each distinct-k log is
  1e-9-quantized with math.log (libm parity) and multiplied by the
  exact class count, so s_units is an exact int and
  alpha = 1 + n_tail*1e9/s_units finalizes identical-expression.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_RC_KS = (3, 6, 9, 12)
_PL_KMIN = 4


def _deg_structs(sf_dir: str):
    """-> (pair_cells, deg_hist): exact (deg_u, deg_v, cnt) cells of the
    directed quadratic graph and the (deg, cnt) total-degree histogram,
    via the two salted co-partition passes described in the module
    docstring."""
    n = _nrows(sf_dir, "documents")
    ds = _pq(sf_dir, "documents", columns=["doc_id"])

    def scatter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = [ids]
        other = [np.full(len(ids), -1, np.int64)]      # node marker rows
        for c in (1, 2, 3):
            key.append((ids * ids + c) % n)
            other.append(ids)
        allk = np.concatenate(key)
        return pa.table({"key": pa.array(allk),
                         "other": pa.array(np.concatenate(other)),
                         "gkey": pa.array((allk % 256).astype(np.int32))})

    def attach_dst(df: pd.DataFrame) -> pd.DataFrame:
        key = df["key"].to_numpy(np.int64)
        other = df["other"].to_numpy(np.int64)
        is_edge = other >= 0
        # deg(v) = 3 + # edge rows keyed v, complete within the partition
        ind = pd.Series(key[is_edge]).value_counts()
        nodes = key[~is_edge]
        deg = pd.Series(np.full(len(nodes), 3, np.int64), index=nodes) \
            .add(ind.reindex(nodes).fillna(0).astype(np.int64),
                 fill_value=0).astype(np.int64)
        dv = deg.reindex(key[is_edge]).to_numpy(np.int64)
        out = pd.DataFrame({
            "u": np.concatenate([other[is_edge],
                                 np.full(len(nodes), -1, np.int64)]),
            "v": np.concatenate([key[is_edge], nodes]),
            "dv": np.concatenate([dv, deg.to_numpy(np.int64)])})
        out["gkey2"] = (np.where(out["u"] >= 0, out["u"], out["v"])
                        % 256).astype(np.int32)
        return out

    def attach_src(df: pd.DataFrame) -> pd.DataFrame:
        is_edge = df["u"].to_numpy(np.int64) >= 0
        nodes = df[~is_edge]
        dmap = pd.Series(nodes["dv"].to_numpy(np.int64),
                         index=nodes["v"].to_numpy(np.int64))
        e = df[is_edge]
        du = dmap.reindex(e["u"].to_numpy(np.int64)).to_numpy(np.int64)
        out = pd.DataFrame({"du": du, "dv": e["dv"].to_numpy(np.int64),
                            "cnt": np.int64(1)})
        g = out.groupby(["du", "dv"], sort=False).sum().reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    cells = (ds.map_batches(scatter, batch_format="pyarrow")
               .groupby("gkey").map_groups(attach_dst,
                                           batch_format="pandas")
               .groupby("gkey2").map_groups(attach_src,
                                            batch_format="pandas")
               .to_pandas()
               .groupby(["du", "dv"]).sum().reset_index())

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        key = df["key"].to_numpy(np.int64)
        other = df["other"].to_numpy(np.int64)
        is_edge = other >= 0
        ind = pd.Series(key[is_edge]).value_counts()
        nodes = key[~is_edge]
        deg = pd.Series(np.full(len(nodes), 3, np.int64), index=nodes) \
            .add(ind.reindex(nodes).fillna(0).astype(np.int64),
                 fill_value=0).astype(np.int64)
        out = pd.DataFrame({"deg": deg.to_numpy(np.int64),
                            "cnt": np.int64(1)})
        g = out.groupby("deg", sort=False).sum().reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    deg_hist = (ds.map_batches(scatter, batch_format="pyarrow")
                  .groupby("gkey").map_groups(deg_part,
                                              batch_format="pandas")
                  .to_pandas()
                  .groupby("deg").sum().reset_index().sort_values("deg"))
    return cells, deg_hist


_GRAPH_SQL = """
WITH nd AS (SELECT count(*)::BIGINT AS n FROM documents),
e AS (
  SELECT d.doc_id AS u, (d.doc_id * d.doc_id + c.c) % nd.n AS v
  FROM documents d, (SELECT unnest([1, 2, 3]) AS c) c JOIN nd ON true),
indeg AS (SELECT v AS node, count(*)::BIGINT AS ind FROM e GROUP BY 1),
deg AS (
  SELECT d.doc_id AS node, 3 + coalesce(ind, 0) AS deg
  FROM documents d LEFT JOIN indeg ON indeg.node = d.doc_id)
"""


# ---------------------------------------------------------------------------
# Rich club
# ---------------------------------------------------------------------------


def q_rich_club_docs(sf_dir: str):
    """Rich-club phi(k) over the fixed k grid (docstring above)."""
    cells, deg_hist = _deg_structs(sf_dir)
    du = cells["du"].to_numpy(np.int64)
    dv = cells["dv"].to_numpy(np.int64)
    cnt = cells["cnt"].to_numpy(np.int64)
    m = np.minimum(du, dv)
    dh = deg_hist["deg"].to_numpy(np.int64)
    dc = deg_hist["cnt"].to_numpy(np.int64)
    rows = []
    for k in _RC_KS:
        nk = int(dc[dh > k].sum())
        ek = int(cnt[m > k].sum())
        phi = float(2 * ek) / float(nk * (nk - 1))
        rows.append((k, nk, ek, _round6(np.array([phi]))[0]))
    out = pd.DataFrame(rows, columns=["k", "n_k", "e_k", "phi6"])
    for col in ("k", "n_k", "e_k"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RICH_CLUB = _GRAPH_SQL + """,
em AS (
  SELECT least(du.deg, dv.deg) AS m
  FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
ks AS (SELECT unnest([{ks}]) AS k),
f AS (
  SELECT k,
         (SELECT count(*)::BIGINT FROM deg WHERE deg > k) AS n_k,
         (SELECT count(*)::BIGINT FROM em WHERE m > k) AS e_k
  FROM ks)
SELECT k::BIGINT AS k, n_k, e_k,
       round(CAST(2 * e_k AS DOUBLE)
             / CAST(n_k::HUGEINT * (n_k - 1) AS DOUBLE), 6) AS phi6
FROM f ORDER BY k
""".replace("{ks}", ", ".join(str(k) for k in _RC_KS))


# ---------------------------------------------------------------------------
# knn(d) — average nearest-neighbor degree
# ---------------------------------------------------------------------------


def q_knn_degree_docs(sf_dir: str):
    """Average neighbor degree per degree class, undirected (docstring
    above)."""
    cells, _ = _deg_structs(sf_dir)
    du = cells["du"].to_numpy(np.int64)
    dv = cells["dv"].to_numpy(np.int64)
    cnt = cells["cnt"].to_numpy(np.int64)
    df = pd.DataFrame({"deg": np.concatenate([du, dv]),
                       "nb": np.concatenate([dv, du]),
                       "cnt": np.concatenate([cnt, cnt])})
    df["s"] = df["nb"] * df["cnt"]
    g = df.groupby("deg").agg(cnt=("cnt", "sum"),
                              sum_nb=("s", "sum")).reset_index() \
          .sort_values("deg")
    knn6 = _round6(np.array([float(int(s)) / float(int(c))
                             for s, c in zip(g["sum_nb"], g["cnt"])]))
    out = pd.DataFrame({"deg": g["deg"].astype(np.int64),
                        "cnt": g["cnt"].astype(np.int64),
                        "sum_nb": g["sum_nb"].astype(np.int64),
                        "knn6": knn6}).reset_index(drop=True)
    return out


SQL_KNN_DEGREE = _GRAPH_SQL + """,
ud AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
j AS (
  SELECT du.deg AS deg, dv.deg AS nbd
  FROM ud JOIN deg du ON du.node = ud.u JOIN deg dv ON dv.node = ud.v),
g AS (
  SELECT deg, count(*)::BIGINT AS cnt, sum(nbd)::BIGINT AS sum_nb
  FROM j GROUP BY 1)
SELECT deg::BIGINT AS deg, cnt, sum_nb,
       round(CAST(sum_nb AS DOUBLE) / CAST(cnt AS DOUBLE), 6) AS knn6
FROM g ORDER BY deg
"""


# ---------------------------------------------------------------------------
# Discrete power-law MLE on in-degree tail
# ---------------------------------------------------------------------------


def q_powerlaw_alpha_docs(sf_dir: str):
    """Discrete power-law alpha MLE on in-deg >= kmin (docstring
    above)."""
    _, deg_hist = _deg_structs(sf_dir)
    ind = deg_hist["deg"].to_numpy(np.int64) - 3      # total deg = 3+in
    cnt = deg_hist["cnt"].to_numpy(np.int64)
    keep = ind >= _PL_KMIN
    n_tail = int(cnt[keep].sum())
    s_units = sum(int(c) * int(math.floor(
        math.log(float(int(k)) / (_PL_KMIN - 0.5)) * 1e9 + 0.5))
        for k, c in zip(ind[keep], cnt[keep]))
    alpha = 1.0 + float(n_tail) * 1000000000.0 / float(s_units)
    out = pd.DataFrame({"kmin": [_PL_KMIN], "n_tail": [n_tail],
                        "s_units": [s_units],
                        "alpha6": [_round6(np.array([alpha]))[0]]})
    for col in ("kmin", "n_tail", "s_units"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_POWERLAW = _GRAPH_SQL + f""",
ih AS (
  SELECT deg - 3 AS ind, count(*)::BIGINT AS cnt
  FROM deg GROUP BY 1),
t AS (
  SELECT sum(cnt)::BIGINT AS n_tail,
         sum(cnt * CAST(round(ln(CAST(ind AS DOUBLE) / {_PL_KMIN - 0.5})
                              * 1000000000) AS BIGINT))::BIGINT
           AS s_units
  FROM ih WHERE ind >= {_PL_KMIN})
SELECT {_PL_KMIN}::BIGINT AS kmin, n_tail, s_units,
       round(1.0 + CAST(n_tail AS DOUBLE) * 1000000000.0
                   / CAST(s_units AS DOUBLE), 6) AS alpha6
FROM t
"""


QUERIES73: dict[str, tuple] = {
    "rich_club_docs": (q_rich_club_docs, SQL_RICH_CLUB),
    "knn_degree_docs": (q_knn_degree_docs, SQL_KNN_DEGREE),
    "powerlaw_alpha_docs": (q_powerlaw_alpha_docs, SQL_POWERLAW),
}
