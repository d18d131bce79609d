"""Eighty-eighth oracle-query batch — social-choice ranking / paired-
comparison fitting / inequality:

Shared machinery: the source-vs-source DOMINANCE MATRIX over document
n_chars — wins_ij = # cross pairs (a from i, b from j) with
n_chars_a > n_chars_b — computed WITHOUT the O((sum support)^2) cross
join: per-source EXCLUSIVE cumulative counts on the merged support
grid (20 x |support| rows), then wins_ij = SUM h_i(v) * cumex_j(v) —
exact int64 (~3e6^2 pair mass bounded by n_i*n_j ~ 9e6 at sf0.1).

- copeland_source_ranking: doubled Copeland score 2*#beaten + #tied
  (exact ints; a full-score source is the Condorcet winner flag) and
  the Borda total-wins count W_i, per source.
- bradley_terry_sources: Bradley-Terry strengths by 3 minorization-
  maximization iterations p_i <- W_i*1e9 / SUM_j round((n_ij+n_ji)
  *1e9/(p_i+p_j)): each pair term is quantized BEFORE the sum so the
  per-source reduction is an order-free integer sum (float-sum-order
  immunity in the SQL replay), p floats identical-expression.
- hoover_index_customers: Hoover/Robin-Hood index of order revenue
  across customers — H = SUM |n*r_i - T| / (2*n*T): ONE exact
  integer numerator off the per-customer revenue aggregate
  (n*r_i ~ 1e16 at sf0.1, int64-safe; customers with no orders
  excluded — documented).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _wins_matrix(sf_dir: str):
    """-> (sources sorted, wins dict {(i,j): int}, n dict) via merged-
    support exclusive cumulatives (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "n_chars"])

    def hpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"src": t["source"].to_pylist(),
                           "v": t["n_chars"].to_numpy(
                               zero_copy_only=False).astype(np.int64),
                           "h": np.int64(1)})
        g = df.groupby(["src", "v"], sort=False).sum().reset_index()
        g["h"] = g["h"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby(["src", "v"]).aggregate(Sum("h", alias_name="h"))
               .to_pandas())
    sources = sorted(cells["src"].unique())
    support = np.sort(cells["v"].unique().astype(np.int64))
    hmat = {s: np.zeros(len(support), np.int64) for s in sources}
    for s, v, h in zip(cells["src"], cells["v"], cells["h"]):
        hmat[s][np.searchsorted(support, int(v))] = int(h)
    cumex = {s: np.concatenate([[0], np.cumsum(hmat[s][:-1])])
             for s in sources}
    wins = {}
    for i in sources:
        for j in sources:
            if i == j:
                continue
            wins[(i, j)] = int(hmat[i].dot(cumex[j]))
    n_src = {s: int(hmat[s].sum()) for s in sources}
    return sources, wins, n_src


_WINS_SQL = """
WITH h AS (
  SELECT source AS src, n_chars AS v, count(*)::BIGINT AS h
  FROM documents GROUP BY 1, 2),
sup AS (SELECT DISTINCT v FROM h),
srcs AS (SELECT DISTINCT src FROM h),
grid AS (
  SELECT s.src, sup.v, coalesce(h.h, 0)::BIGINT AS h
  FROM srcs s CROSS JOIN sup LEFT JOIN h
    ON h.src = s.src AND h.v = sup.v),
cg AS (
  SELECT src, v,
         (sum(h) OVER (PARTITION BY src ORDER BY v) - h)::BIGINT
           AS cumex
  FROM grid),
wins AS (
  SELECT hi.src AS i, cg.src AS j, sum(hi.h * cg.cumex)::BIGINT AS w
  FROM h hi JOIN cg ON cg.v = hi.v AND cg.src <> hi.src
  GROUP BY 1, 2)
"""


# ---------------------------------------------------------------------------
# Copeland / Borda / Condorcet
# ---------------------------------------------------------------------------


def q_copeland_source_ranking(sf_dir: str):
    """Doubled Copeland + Borda wins per source (docstring above)."""
    sources, wins, _ = _wins_matrix(sf_dir)
    rows = []
    k = len(sources)
    for i in sources:
        cop2 = 0
        borda = 0
        for j in sources:
            if i == j:
                continue
            wij, wji = wins[(i, j)], wins[(j, i)]
            borda += wij
            if wij > wji:
                cop2 += 2
            elif wij == wji:
                cop2 += 1
        rows.append((i, borda, cop2, 1 if cop2 == 2 * (k - 1) else 0))
    out = pd.DataFrame(rows, columns=["source", "borda_w", "copeland2",
                                      "condorcet"])
    for col in ("borda_w", "copeland2", "condorcet"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


SQL_COPELAND = _WINS_SQL + """,
k AS (SELECT count(*)::BIGINT AS k FROM srcs),
sc AS (
  SELECT a.i AS source, sum(a.w)::BIGINT AS borda_w,
         sum(CASE WHEN a.w > b.w THEN 2
                  WHEN a.w = b.w THEN 1 ELSE 0 END)::BIGINT
           AS copeland2
  FROM wins a JOIN wins b ON b.i = a.j AND b.j = a.i
  GROUP BY 1)
SELECT source, borda_w, copeland2,
       (copeland2 = 2 * (k - 1))::BIGINT AS condorcet
FROM sc CROSS JOIN k ORDER BY source
"""


# ---------------------------------------------------------------------------
# Bradley-Terry
# ---------------------------------------------------------------------------

_BT_ITERS = 3


def q_bradley_terry_sources(sf_dir: str):
    """3-iteration MM Bradley-Terry strengths with quantized pair
    denominators (docstring above)."""
    sources, wins, _ = _wins_matrix(sf_dir)
    w_tot = {i: sum(wins[(i, j)] for j in sources if j != i)
             for i in sources}
    p = {i: 1.0 for i in sources}
    for _ in range(_BT_ITERS):
        dsum = {}
        for i in sources:
            dsum[i] = sum(
                int(np.floor((wins[(i, j)] + wins[(j, i)])
                             * 1000000000.0 / (p[i] + p[j]) + 0.5))
                for j in sources if j != i)
        p = {i: float(w_tot[i]) * 1000000000.0 / float(dsum[i])
             for i in sources}
    out = pd.DataFrame(
        {"source": sources,
         "w_tot": [w_tot[i] for i in sources],
         "p6": _round6(np.array([p[i] for i in sources]))})
    out["w_tot"] = out["w_tot"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


def _bt_sql() -> str:
    head = _WINS_SQL + """,
pairs AS (
  SELECT a.i, a.j, a.w + b.w AS nij
  FROM wins a JOIN wins b ON b.i = a.j AND b.j = a.i),
wt AS (SELECT i AS src, sum(w)::BIGINT AS w_tot FROM wins GROUP BY 1),
p0 AS (SELECT src, 1.0::DOUBLE AS p FROM wt)"""
    steps = []
    for t in range(1, _BT_ITERS + 1):
        steps.append(f""",
d{t} AS (
  SELECT pairs.i AS src,
         sum(CAST(round(pairs.nij * 1000000000.0
                        / (pi.p + pj.p)) AS BIGINT))::BIGINT AS ds
  FROM pairs JOIN p{t-1} pi ON pi.src = pairs.i
  JOIN p{t-1} pj ON pj.src = pairs.j
  GROUP BY 1),
p{t} AS (
  SELECT wt.src,
         CAST(wt.w_tot AS DOUBLE) * 1000000000.0
           / CAST(d{t}.ds AS DOUBLE) AS p
  FROM wt JOIN d{t} ON d{t}.src = wt.src)""")
    tail = f"""
SELECT wt.src AS source, wt.w_tot, round(p{_BT_ITERS}.p, 6) AS p6
FROM wt JOIN p{_BT_ITERS} ON p{_BT_ITERS}.src = wt.src
ORDER BY source"""
    return head + "".join(steps) + tail


SQL_BRADLEY_TERRY = _bt_sql()


# ---------------------------------------------------------------------------
# Hoover index
# ---------------------------------------------------------------------------


def q_hoover_index_customers(sf_dir: str):
    """Hoover index of revenue across ordering customers (docstring
    above)."""
    ds = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def rpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cust": t["o_custkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "rc": _cents(t["o_totalprice"]).to_numpy(
                zero_copy_only=False)})
        g = df.groupby("cust", sort=False)["rc"].sum().reset_index()
        g["rc"] = g["rc"].astype(np.int64)
        return _strip(g)

    per = (ds.map_batches(rpart, batch_format="pyarrow")
             .groupby("cust").aggregate(Sum("rc", alias_name="rc"))
             .to_pandas())
    r = [int(v) for v in per["rc"]]
    n = len(r)
    t = sum(r)
    num = sum(abs(n * v - t) for v in r)
    hoover = float(num) / float(2 * n * t)
    out = pd.DataFrame({"n_cust": [n], "total_c": [t], "num": [num],
                        "hoover6": [_round6(np.array([hoover]))[0]]})
    for col in ("n_cust", "total_c", "num"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HOOVER = """
WITH per AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rc
  FROM orders GROUP BY 1),
t AS (SELECT count(*)::BIGINT AS n, sum(rc)::BIGINT AS tot FROM per),
s AS (
  SELECT max(n) AS n, max(tot) AS tot,
         sum(abs(n * rc - tot))::BIGINT AS num
  FROM per CROSS JOIN t)
SELECT n AS n_cust, tot AS total_c, num,
       round(CAST(num AS DOUBLE) / CAST(2 * n::HUGEINT * tot AS DOUBLE),
             6) AS hoover6
FROM s
"""


QUERIES88: dict[str, tuple] = {
    "copeland_source_ranking": (q_copeland_source_ranking, SQL_COPELAND),
    "bradley_terry_sources": (q_bradley_terry_sources, SQL_BRADLEY_TERRY),
    "hoover_index_customers": (q_hoover_index_customers, SQL_HOOVER),
}
