"""Sixty-sixth oracle-query batch — graph spatial autocorrelation /
attenuated walk centrality / stratified causal effect:

- moran_geary_docs: Moran's I and Geary's C of the n_chars value over
  the deterministic quadratic doc graph u -> (u^2+c) mod N, c = 1..3
  (the assortativity graph — the 31u stride graph is 3-in-regular and
  would zero the spatial structure; probe at sf0.001: I = -0.0593,
  C = 1.035, in-degree spread 4..24).  ONE shuffle: edge rows keyed by
  destination carry x_u, node rows carry x_v, and each salted
  partition joins locally and emits exact int64 moment partials
  (|E|, SUM x_u*x_v, SUM x_u, SUM x_v, SUM (x_u-x_v)^2, n, SUM x,
  SUM x^2).  Denominators clear exactly: with z_u = n*x_u - S,
  SUM_E z_u z_v = n^2*Sexy - n*S*(Sexu+Sexv) + E*S^2 and
  SUM z^2 = n^2*Sxx - n*S^2 are exact Python ints (HUGEINT territory
  at sf0.1: n^2*Sexy ~ 3e19), the n^2 factors cancel in the ratios,
  and I = (n/E)*num/den, C = ((n-1)*n^2/(2E))*G/den finalize
  identical-expression (float(huge int) == CAST(HUGEINT AS DOUBLE),
  the working-notes parity rule).
- katz_centrality_docs: Katz centrality x <- 1 + alpha*A^T x on the
  quadratic graph, all integer fixed-point (ranks in micros,
  alpha = 0.20 as (s*20)//100, beta = SCALE) — the pagerank BSP shape
  (one contribution scatter -> groupby(dst) Sum per iteration, a zero
  self-contribution keeping in-degree-0 nodes alive) but WITHOUT the
  out-degree normalization, so rank mass tracks raw in-walk counts.
  3 iterations; oracle replays the chained-CTE fixed point (probe:
  13 distinct ranks, spread 1.0e6..7.88e6 — the stride graph would be
  uniform-degenerate here, the quadratic one is not).
- mantel_haenszel_purchase: Mantel-Haenszel common odds ratio of
  exposure = user_id%2 on outcome = "any purchase that day", stratified
  by DAY over (user, day) units with >= 1 event (probe: 30 strata at
  sf0.001, min n_k = 11, zero strata with a*d = 0).  Per-user-day
  outcome flags ride one groupby((user,day)) Max aggregate; per-day
  2x2 cells reduce via int64 cell partials.  MH's per-stratum float
  terms a_k*d_k/n_k would be a forbidden float sum — instead each term
  is quantized to 1e-6 units (round(a*d*1e6/n) half-away-from-zero;
  a*d*1e6 <= ~2e12 is float-exact) and integer-summed, so
  OR = num_q/den_q and ln(OR) finalize identical-expression.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Sum

from scrapy_ray.pipelines.queries import _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Moran's I + Geary's C
# ---------------------------------------------------------------------------


def q_moran_geary_docs(sf_dir: str):
    """Moran's I / Geary's C of n_chars over the quadratic doc graph
    (docstring above)."""
    n_docs = _nrows(sf_dir, "documents")
    ds = _pq(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def scatter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = [ids]
        xu = [np.full(len(ids), -1, np.int64)]    # node-row marker
        xv = [x]                                  # node rows carry x_v
        for cc in (1, 2, 3):
            key.append((ids * ids + cc) % n_docs)
            xu.append(x)                          # edge rows carry x_u
            xv.append(np.zeros(len(ids), np.int64))
        allk = np.concatenate(key)
        return pa.table({"key": pa.array(allk),
                         "xu": pa.array(np.concatenate(xu)),
                         "xv": pa.array(np.concatenate(xv)),
                         "gkey": pa.array((allk % 256).astype(np.int32))})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        nd = df[df["xu"] < 0]
        e = df[df["xu"] >= 0]
        xv_map = pd.Series(nd["xv"].to_numpy(np.int64),
                           index=nd["key"].to_numpy(np.int64))
        xu = e["xu"].to_numpy(np.int64)
        xv = xv_map.reindex(e["key"].to_numpy(np.int64)).to_numpy(np.int64)
        xn = nd["xv"].to_numpy(np.int64)
        return pd.DataFrame({
            "e": [np.int64(len(e))],
            "sexy": [int((xu * xv).sum())],
            "sexu": [int(xu.sum())], "sexv": [int(xv.sum())],
            "g": [int(((xu - xv) ** 2).sum())],
            "n": [np.int64(len(nd))], "s": [int(xn.sum())],
            "sxx": [int((xn * xn).sum())]})

    parts = (ds.map_batches(scatter, batch_format="pyarrow")
               .groupby("gkey").map_groups(resolve, batch_format="pandas")
               .to_pandas())
    n = int(parts["n"].sum())
    s = sum(int(v) for v in parts["s"])
    sxx = sum(int(v) for v in parts["sxx"])
    e = int(parts["e"].sum())
    sexy = sum(int(v) for v in parts["sexy"])
    sexu = sum(int(v) for v in parts["sexu"])
    sexv = sum(int(v) for v in parts["sexv"])
    g = sum(int(v) for v in parts["g"])
    num = n * n * sexy - n * s * (sexu + sexv) + e * s * s
    den = n * n * sxx - n * s * s
    moran = (float(n) / float(e)) * (float(num) / float(den))
    geary = (float(n - 1) * float(n) * float(n) / (2.0 * float(e))) \
        * (float(g) / float(den))
    out = pd.DataFrame({"n_nodes": [n], "n_edges": [e], "s_x": [s],
                        "s_xx": [sxx], "se_xy": [sexy], "se_xu": [sexu],
                        "se_xv": [sexv], "g_sum": [g],
                        "i6": [_round6(np.array([moran]))[0]],
                        "c6": [_round6(np.array([geary]))[0]]})
    for col in ("n_nodes", "n_edges", "s_x", "s_xx", "se_xy", "se_xu",
                "se_xv", "g_sum"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MORAN_GEARY = """
WITH nd AS (SELECT count(*)::BIGINT AS n FROM documents),
edges AS (
  SELECT d.doc_id AS u, (d.doc_id * d.doc_id + s.cc) % nd.n AS v
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS cc) s
  JOIN nd ON true),
x AS (SELECT doc_id, n_chars AS x FROM documents),
nm AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
              sum(x * x)::BIGINT AS sxx
       FROM x),
em AS (
  SELECT count(*)::BIGINT AS e, sum(xu.x * xv.x)::BIGINT AS sexy,
         sum(xu.x)::BIGINT AS sexu, sum(xv.x)::BIGINT AS sexv,
         sum((xu.x - xv.x) * (xu.x - xv.x))::BIGINT AS g
  FROM edges
  JOIN x xu ON xu.doc_id = edges.u
  JOIN x xv ON xv.doc_id = edges.v)
SELECT n AS n_nodes, e AS n_edges, s AS s_x, sxx AS s_xx, sexy AS se_xy,
       sexu AS se_xu, sexv AS se_xv, g AS g_sum,
       round(CAST(n AS DOUBLE) / CAST(e AS DOUBLE)
             * CAST(CAST(n AS HUGEINT) * n * sexy
                    - CAST(n AS HUGEINT) * s * (sexu + sexv)
                    + CAST(e AS HUGEINT) * s * s AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * n * sxx
                    - CAST(n AS HUGEINT) * s * s AS DOUBLE), 6) AS i6,
       round(CAST(n - 1 AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
             / (2.0 * CAST(e AS DOUBLE))
             * CAST(g AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * n * sxx
                    - CAST(n AS HUGEINT) * s * s AS DOUBLE), 6) AS c6
FROM nm, em
"""


# ---------------------------------------------------------------------------
# Katz centrality
# ---------------------------------------------------------------------------

_KATZ_ITERS = 3
_KATZ_SCALE = 1_000_000


def q_katz_centrality_docs(sf_dir: str):
    """Integer fixed-point Katz centrality over the quadratic doc graph
    (docstring above)."""
    n = _nrows(sf_dir, "documents")

    def init(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(ids),
                         "pr": pa.array(np.full(len(ids), _KATZ_SCALE,
                                                np.int64))})

    ranks = _pq(sf_dir, "documents", ["doc_id"]).map_batches(
        init, batch_format="pyarrow")

    def contribs(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        pr = t["pr"].to_numpy(zero_copy_only=False).astype(np.int64)
        dsts = [(node * node + c) % n for c in (1, 2, 3)]
        return pa.table({
            "node": pa.array(np.concatenate(dsts + [node])),
            "contrib": pa.array(np.concatenate(
                [pr] * 3 + [np.zeros(len(node), np.int64)]))})

    def update(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": t["node"],
                         "pr": pa.array(_KATZ_SCALE + (s * 20) // 100)})

    for _ in range(_KATZ_ITERS):
        ranks = (ranks.map_batches(contribs, batch_format="pyarrow")
                      .groupby("node")
                      .aggregate(Sum("contrib", alias_name="s"))
                      .map_batches(update, batch_format="pyarrow"))

    df = ranks.to_pandas().rename(columns={"node": "doc_id",
                                           "pr": "katz"})
    for c in ("doc_id", "katz"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values("doc_id").reset_index(drop=True)


def _katz_sql() -> str:
    head = f"""
WITH nd AS (SELECT count(*)::BIGINT AS n FROM documents),
e AS (
  SELECT d.doc_id AS src, (d.doc_id * d.doc_id + c.c) % nd.n AS dst
  FROM documents d, (SELECT unnest([1, 2, 3]) AS c) c JOIN nd ON true
), r0 AS (
  SELECT doc_id AS node, {_KATZ_SCALE}::BIGINT AS pr FROM documents
)"""
    steps = []
    for i in range(1, _KATZ_ITERS + 1):
        steps.append(f""", s{i} AS (
  SELECT node, SUM(contrib)::BIGINT AS s FROM (
    SELECT e.dst AS node, r{i-1}.pr AS contrib
    FROM e JOIN r{i-1} ON e.src = r{i-1}.node
    UNION ALL SELECT node, 0 FROM r{i-1}
  ) GROUP BY node
), r{i} AS (
  SELECT node, {_KATZ_SCALE} + (s * 20) // 100 AS pr FROM s{i}
)""")
    return (head + "".join(steps)
            + f"\nSELECT node AS doc_id, pr AS katz FROM r{_KATZ_ITERS}"
            " ORDER BY doc_id")


SQL_KATZ = _katz_sql()


# ---------------------------------------------------------------------------
# Mantel-Haenszel stratified odds ratio
# ---------------------------------------------------------------------------


def q_mantel_haenszel_purchase(sf_dir: str):
    """MH common odds ratio of user-parity exposure on daily purchase,
    day-stratified with 1e-6-quantized per-stratum terms (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def flag_partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        df = pd.DataFrame({"user_id": uid, "day": day,
                           "outc": (et == "purchase").astype(np.int64)})
        g = df.groupby(["user_id", "day"], sort=False).max().reset_index()
        return _strip(g)

    flags = (ds.map_batches(flag_partial, batch_format="pyarrow")
               .groupby(["user_id", "day"])
               .aggregate(Max("outc", alias_name="outc")))

    def cell_partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = t["day"].to_numpy(zero_copy_only=False).astype(np.int64)
        outc = t["outc"].to_numpy(zero_copy_only=False).astype(np.int64)
        exp = uid % 2
        df = pd.DataFrame({
            "day": day,
            "a": ((exp == 1) & (outc == 1)).astype(np.int64),
            "b": ((exp == 1) & (outc == 0)).astype(np.int64),
            "c": ((exp == 0) & (outc == 1)).astype(np.int64),
            "d": ((exp == 0) & (outc == 0)).astype(np.int64)})
        g = df.groupby("day", sort=False).sum().reset_index()
        return _strip(g)

    cells = (flags.map_batches(cell_partial, batch_format="pyarrow")
                  .groupby("day")
                  .aggregate(Sum("a", alias_name="a"),
                             Sum("b", alias_name="b"),
                             Sum("c", alias_name="c"),
                             Sum("d", alias_name="d"))
                  .to_pandas())
    a = cells["a"].to_numpy(np.int64)
    b = cells["b"].to_numpy(np.int64)
    c = cells["c"].to_numpy(np.int64)
    d = cells["d"].to_numpy(np.int64)
    nn = (a + b + c + d).astype(np.float64)
    num_q = int(np.floor(a.astype(np.float64) * d * 1e6 / nn + 0.5)
                .astype(np.int64).sum())
    den_q = int(np.floor(b.astype(np.float64) * c * 1e6 / nn + 0.5)
                .astype(np.int64).sum())
    orr = float(num_q) / float(den_q)
    out = pd.DataFrame({"n_strata": [len(cells)],
                        "a_tot": [int(a.sum())], "b_tot": [int(b.sum())],
                        "c_tot": [int(c.sum())], "d_tot": [int(d.sum())],
                        "num_q": [num_q], "den_q": [den_q],
                        "or6": [_round6(np.array([orr]))[0]],
                        "lnor6": [_round6(np.array([math.log(orr)]))[0]]})
    for col in ("n_strata", "a_tot", "b_tot", "c_tot", "d_tot",
                "num_q", "den_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MANTEL_HAENSZEL = f"""
WITH ud AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day, user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS outc
  FROM events GROUP BY 1, 2),
cells AS (
  SELECT day,
         sum(CASE WHEN user_id % 2 = 1 AND outc = 1 THEN 1 ELSE 0 END)
           ::BIGINT AS a,
         sum(CASE WHEN user_id % 2 = 1 AND outc = 0 THEN 1 ELSE 0 END)
           ::BIGINT AS b,
         sum(CASE WHEN user_id % 2 = 0 AND outc = 1 THEN 1 ELSE 0 END)
           ::BIGINT AS c,
         sum(CASE WHEN user_id % 2 = 0 AND outc = 0 THEN 1 ELSE 0 END)
           ::BIGINT AS d
  FROM ud GROUP BY 1),
q AS (
  SELECT count(*)::BIGINT AS n_strata,
         sum(a)::BIGINT AS a_tot, sum(b)::BIGINT AS b_tot,
         sum(c)::BIGINT AS c_tot, sum(d)::BIGINT AS d_tot,
         sum(CAST(round(a * d * 1000000.0 / (a + b + c + d)) AS BIGINT))
           ::BIGINT AS num_q,
         sum(CAST(round(b * c * 1000000.0 / (a + b + c + d)) AS BIGINT))
           ::BIGINT AS den_q
  FROM cells)
SELECT n_strata, a_tot, b_tot, c_tot, d_tot, num_q, den_q,
       round(CAST(num_q AS DOUBLE) / CAST(den_q AS DOUBLE), 6) AS or6,
       round(ln(CAST(num_q AS DOUBLE) / CAST(den_q AS DOUBLE)), 6)
         AS lnor6
FROM q
"""


QUERIES66: dict[str, tuple] = {
    "moran_geary_docs": (q_moran_geary_docs, SQL_MORAN_GEARY),
    "katz_centrality_docs": (q_katz_centrality_docs, SQL_KATZ),
    "mantel_haenszel_purchase": (q_mantel_haenszel_purchase,
                                 SQL_MANTEL_HAENSZEL),
}
