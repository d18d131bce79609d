"""One-hundred-seventy-ninth oracle-query batch — spectral graph
theory on the source lang-profile overlap graph, and the Heckman
selection model:

- spanning_trees_sources: the Matrix-Tree theorem on the 5-node
  graph whose nodes are the top-5 sources and edge weights
  w_ij = Σ_lang min(c_i,lang, c_j,lang). Both the UNWEIGHTED
  spanning-tree count and the weighted tree sum Σ_T Π_e w_e are
  determinants of the reduced Laplacian, computed by the
  fraction-free BAREISS elimination — every intermediate is an
  exact integer and every division is exact (truncation == floor
  when the quotient is whole), replayed as a 3-level LIST recursion.
- effective_resistance_sources: R_eff between the top two sources —
  ground node 5, solve L_red x = e1 − e2 with the shared
  no-pivot Gauss replay (queries163 device), R = x1 − x2.
- heckman_selection_users: the Heckman two-step — selection =
  "user purchased in the first TWO days" (probed: 8/15, 97/150,
  859/1500 — a ≥1-purchase-in-week-1 margin is degenerate at
  sf0.001), instrument x = first-2-day event count / 10, outcome
  y = ln(post-day-2 value dollars). Step 1: 3-iteration Fisher
  probit over (x, sel) cells (the queries160 device, nano-quantized
  scores); step 2: OLS of y on (1, x, λ) where λ = φ/Φ is the
  inverse Mills ratio per x-cell, normal equations accumulated from
  1e-9-quantized per-cell terms and solved by the Gauss replay.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Sum

from scrapy_ray.pipelines.queries import _pq, _ts_minmax_us
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries147 import _phi_upper_p
from scrapy_ray.pipelines.queries160 import _r9, _sql_upper
from scrapy_ray.pipelines.queries163 import _gauss_solve, _gauss_sql
from scrapy_ray.pipelines.queries174 import _srclang_cells

_US_PER_DAY = 86_400_000_000
_HK_DAYS = 2
_HK_ITERS = 3


# ---------------------------------------------------------------------------
# shared: top-5 source overlap graph
# ---------------------------------------------------------------------------


def _overlap_graph(sf_dir: str) -> np.ndarray:
    """5×5 integer weight matrix w_ij = Σ_lang min(c_i, c_j) over the
    top-5 sources (count desc, source asc), langs ordered asc."""
    cells = _srclang_cells(sf_dir)
    top5 = (cells.groupby("source")["c"].sum().reset_index()
            .sort_values(["c", "source"], ascending=[False, True])
            .head(5)["source"].tolist())
    langs = sorted(cells["lang"].unique().tolist())
    cm = np.zeros((5, len(langs)), np.int64)
    sub = cells[cells["source"].isin(top5)]
    for _, r in sub.iterrows():
        cm[top5.index(r["source"]), langs.index(r["lang"])] = \
            int(r["c"])
    w = np.zeros((5, 5), np.int64)
    for i in range(5):
        for j in range(5):
            if i != j:
                w[i, j] = int(np.minimum(cm[i], cm[j]).sum())
    return w


_SQL_GRAPH = """
cells AS (
  SELECT source, lang, count(*)::BIGINT AS c
  FROM documents GROUP BY 1, 2),
top5 AS (
  SELECT source, row_number() OVER
           (ORDER BY sum(c) DESC, source) AS si
  FROM cells GROUP BY source
  ORDER BY sum(c) DESC, source LIMIT 5),
langs AS (
  SELECT lang, row_number() OVER (ORDER BY lang) AS lj
  FROM (SELECT DISTINCT lang FROM cells)),
dense AS (
  SELECT t.si, l.lj, coalesce(c.c, 0)::BIGINT AS c
  FROM top5 t CROSS JOIN langs l
  LEFT JOIN cells c ON c.source = t.source AND c.lang = l.lang),
edges AS (
  SELECT a.si AS i, b.si AS j,
         sum(least(a.c, b.c))::BIGINT AS w
  FROM dense a JOIN dense b ON a.lj = b.lj AND a.si <> b.si
  GROUP BY 1, 2),
deg AS (SELECT i, sum(w)::BIGINT AS d FROM edges GROUP BY i)
"""


# ---------------------------------------------------------------------------
# Matrix-Tree via Bareiss
# ---------------------------------------------------------------------------


def _bareiss_det(m: list[list[int]]) -> int:
    n = len(m)
    m = [r[:] for r in m]
    prev = 1
    for p in range(n - 1):
        for r in range(p + 1, n):
            for c in range(p + 1, n):
                m[r][c] = (m[r][c] * m[p][p]
                           - m[r][p] * m[p][c]) // prev
        prev = m[p][p]
    return m[n - 1][n - 1]


def q_spanning_trees_sources(sf_dir: str):
    """Weighted + unweighted Matrix-Tree counts (docstring)."""
    w = _overlap_graph(sf_dir)
    lw = [[0] * 4 for _ in range(4)]
    l1 = [[0] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            if i == j:
                lw[i][j] = int(w[i].sum())
                l1[i][j] = int((w[i] > 0).sum())
            else:
                lw[i][j] = -int(w[i, j])
                l1[i][j] = -1 if w[i, j] > 0 else 0
    out = pd.DataFrame({
        "n_nodes": [5],
        "trees_unweighted": [_bareiss_det(l1)],
        "tree_weight": [_bareiss_det(lw)],
        "total_weight": [int(w.sum()) // 2]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_SPANNING = f"""
WITH RECURSIVE {_SQL_GRAPH},
lmat AS (
  SELECT
    (SELECT list(CASE WHEN a.i = b.i THEN
                   (SELECT d FROM deg WHERE deg.i = a.i)
                 ELSE -coalesce((SELECT w FROM edges e
                                 WHERE e.i = a.i AND e.j = b.i),
                                0) END
                 ORDER BY a.i * 10 + b.i)
     FROM (SELECT si AS i FROM top5 WHERE si <= 4) a,
          (SELECT si AS i FROM top5 WHERE si <= 4) b) AS lw,
    (SELECT list(CASE WHEN a.i = b.i THEN
                   (SELECT count(*) FROM edges e
                    WHERE e.i = a.i AND e.w > 0)
                 ELSE CASE WHEN coalesce((SELECT w FROM edges e
                                          WHERE e.i = a.i
                                            AND e.j = b.i), 0) > 0
                           THEN -1 ELSE 0 END END
                 ORDER BY a.i * 10 + b.i)
     FROM (SELECT si AS i FROM top5 WHERE si <= 4) a,
          (SELECT si AS i FROM top5 WHERE si <= 4) b) AS l1,
    (SELECT sum(w) // 2 FROM edges) AS tw),
bar AS (
  SELECT 0 AS p, lw AS mw, l1 AS m1,
         1::BIGINT AS pw, 1::BIGINT AS p1, tw
  FROM lmat
  UNION ALL
  SELECT p + 1,
         [CASE WHEN (z - 1) // 4 + 1 > p + 1
                    AND (z - 1) % 4 + 1 > p + 1
               THEN (mw[z] * mw[p * 4 + p + 1]
                     - mw[((z - 1) // 4) * 4 + p + 1]
                       * mw[p * 4 + ((z - 1) % 4) + 1]) // pw
               ELSE mw[z] END
          FOR z IN range(1, 17)],
         [CASE WHEN (z2 - 1) // 4 + 1 > p + 1
                    AND (z2 - 1) % 4 + 1 > p + 1
               THEN (m1[z2] * m1[p * 4 + p + 1]
                     - m1[((z2 - 1) // 4) * 4 + p + 1]
                       * m1[p * 4 + ((z2 - 1) % 4) + 1]) // p1
               ELSE m1[z2] END
          FOR z2 IN range(1, 17)],
         mw[p * 4 + p + 1], m1[p * 4 + p + 1], tw
  FROM bar WHERE p < 3)
SELECT 5::BIGINT AS n_nodes, m1[16]::BIGINT AS trees_unweighted,
       mw[16]::BIGINT AS tree_weight, tw::BIGINT AS total_weight
FROM bar WHERE p = 3
"""


# ---------------------------------------------------------------------------
# Effective resistance
# ---------------------------------------------------------------------------


def q_effective_resistance_sources(sf_dir: str):
    """R_eff(top1, top2) via the Gauss replay (docstring)."""
    w = _overlap_graph(sf_dir)
    lred = [[0.0] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(4):
            if i == j:
                lred[i][j] = float(int(w[i].sum()))
            else:
                lred[i][j] = float(-int(w[i, j]))
    b = [1.0, -1.0, 0.0, 0.0]
    xs = _gauss_solve(lred, b)
    reff = xs[0] - xs[1]
    r6 = _round6(np.array([reff, xs[0], xs[1]]))
    out = pd.DataFrame({"n_nodes": [5],
                        "total_weight": [int(w.sum()) // 2],
                        "reff12_6": [r6[0]], "x1_6": [r6[1]],
                        "x2_6": [r6[2]]})
    for col in ("n_nodes", "total_weight"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_REFF = f"""
WITH RECURSIVE {_SQL_GRAPH},
sys AS (
  SELECT (SELECT list(
            CASE WHEN (z - 1) % 5 + 1 = 5 THEN
              CASE (z - 1) // 5 + 1 WHEN 1 THEN 1e0
                   WHEN 2 THEN -1e0 ELSE 0e0 END
            WHEN (z - 1) // 5 + 1 = (z - 1) % 5 + 1 THEN
              CAST((SELECT d FROM deg
                    WHERE deg.i = (z - 1) // 5 + 1) AS DOUBLE)
            ELSE -CAST(coalesce(
                   (SELECT w FROM edges e
                    WHERE e.i = (z - 1) // 5 + 1
                      AND e.j = (z - 1) % 5 + 1), 0) AS DOUBLE)
            END ORDER BY z)
          FROM (SELECT unnest(range(1, 21)) AS z)) AS aug),
{_gauss_sql(4, "sys")}
SELECT 5::BIGINT AS n_nodes,
       (SELECT sum(w) // 2 FROM edges)::BIGINT AS total_weight,
       round(xs[1] - xs[2], 6) AS reff12_6,
       round(xs[1], 6) AS x1_6, round(xs[2], 6) AS x2_6
FROM sol
"""


# ---------------------------------------------------------------------------
# Heckman two-step
# ---------------------------------------------------------------------------


def q_heckman_selection_users(sf_dir: str):
    """Heckman selection model (docstring above)."""
    dmin_us, _ = _ts_minmax_us(sf_dir, "events")
    dmin_day = dmin_us // _US_PER_DAY
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_type", "value"])

    def upart(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        day = (t["ts"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // _US_PER_DAY) \
            - dmin_day
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        early = day < _HK_DAYS
        g = (pd.DataFrame({
            "u": u,
            "w1": early.astype(np.int64),
            "sel": (early & (et == "purchase")).astype(np.int64),
            "yc": np.where(~early, c, 0)})
            .groupby("u", sort=False)
            .agg(w1=("w1", "sum"), sel=("sel", "max"),
                 yc=("yc", "sum")).reset_index())
        for col in ("w1", "sel", "yc"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    users = (ds.map_batches(upart, batch_format="pyarrow")
               .groupby("u")
               .aggregate(Sum("w1", alias_name="w1"),
                          Max("sel", alias_name="sel"),
                          Sum("yc", alias_name="yc"))
               .to_pandas())
    n_users = len(users)
    n_sel = int(users["sel"].sum())
    # probit cells (x-count, sel)
    pc = (users.groupby(["w1", "sel"]).size().rename("n")
          .reset_index())
    b0 = b1 = 0.0
    for _ in range(_HK_ITERS):
        sw = swx = swx2 = g0 = g1 = 0
        for w1, yi, ni in zip(pc["w1"], pc["sel"], pc["n"]):
            xi = int(w1) / 10
            z = b0 + b1 * xi
            up = _phi_upper_p(z)
            cdf = 1.0 - up
            pdf = math.exp(-z * z / 2.0) / math.sqrt(2.0 * math.pi)
            wq = pdf * pdf / (cdf * (1.0 - cdf))
            gq = pdf * (float(int(yi)) - cdf) / (cdf * (1.0 - cdf))
            ni = int(ni)
            sw += ni * _r9(wq)
            swx += ni * _r9(wq * xi)
            swx2 += ni * _r9(wq * xi * xi)
            g0 += ni * _r9(gq)
            g1 += ni * _r9(gq * xi)
        fw, fx, fx2 = (float(sw) / 1e9, float(swx) / 1e9,
                       float(swx2) / 1e9)
        e0, e1 = float(g0) / 1e9, float(g1) / 1e9
        det = fw * fx2 - fx * fx
        b0 = b0 + (e0 * fx2 - e1 * fx) / det
        b1 = b1 + (fw * e1 - fx * e0) / det
    # stage 2 cells: selected users with positive outcome, by w1
    obs = users[(users["sel"] == 1) & (users["yc"] > 0)]
    oc = []
    for w1, grp in obs.groupby("w1"):
        syq = sum(_r9(math.log(float(int(yc)) / 1e2))
                  for yc in grp["yc"])
        oc.append((int(w1), len(grp), syq))
    a11 = a12 = a13 = a22 = a23 = a33 = 0
    r1 = r2 = r3 = 0
    for w1, m, syq in oc:
        xi = w1 / 10
        z = b0 + b1 * xi
        up = _phi_upper_p(z)
        cdf = 1.0 - up
        pdf = math.exp(-z * z / 2.0) / math.sqrt(2.0 * math.pi)
        lam = pdf / cdf
        fm = float(m)
        a11 += _r9(fm)
        a12 += _r9(fm * xi)
        a13 += _r9(fm * lam)
        a22 += _r9(fm * xi * xi)
        a23 += _r9(fm * xi * lam)
        a33 += _r9(fm * lam * lam)
        sy = float(syq) / 1e9
        r1 += _r9(sy)
        r2 += _r9(xi * sy)
        r3 += _r9(lam * sy)
    aug_a = [[a11, a12, a13], [a12, a22, a23], [a13, a23, a33]]
    xs = _gauss_solve([[float(v) / 1e9 for v in row]
                       for row in aug_a],
                      [float(r1) / 1e9, float(r2) / 1e9,
                       float(r3) / 1e9])
    r6 = _round6(np.array([b0, b1, xs[0], xs[1], xs[2]]))
    out = pd.DataFrame({"n_users": [n_users], "n_sel": [n_sel],
                        "a6": [r6[0]], "b6": [r6[1]],
                        "beta0_6": [r6[2]], "beta_x6": [r6[3]],
                        "beta_lam6": [r6[4]]})
    for col in ("n_users", "n_sel"):
        out[col] = out[col].astype(np.int64)
    return out


def _hk_iter_sql(i: int) -> str:
    prev = f"hit{i - 1}" if i > 1 else "hinit"
    z = "(p.b0 + p.b1 * c.x)"
    up = _sql_upper(z)
    cdf = f"(1.0 - {up})"
    pdf = f"(exp(-{z} * {z} / 2.0) / sqrt(2.0 * pi()))"
    wq = f"({pdf} * {pdf} / ({cdf} * (1.0 - {cdf})))"
    gq = (f"({pdf} * (CAST(c.y AS DOUBLE) - {cdf}) "
          f"/ ({cdf} * (1.0 - {cdf})))")
    return f"""
hs{i} AS MATERIALIZED (
  SELECT
    sum(c.n * CAST(round({wq} * 1e9) AS BIGINT))::BIGINT AS sw,
    sum(c.n * CAST(round({wq} * c.x * 1e9) AS BIGINT))::BIGINT
      AS swx,
    sum(c.n * CAST(round({wq} * c.x * c.x * 1e9) AS BIGINT))
      ::BIGINT AS swx2,
    sum(c.n * CAST(round({gq} * 1e9) AS BIGINT))::BIGINT AS g0,
    sum(c.n * CAST(round({gq} * c.x * 1e9) AS BIGINT))::BIGINT
      AS g1
  FROM hcells c CROSS JOIN {prev} p),
hit{i} AS MATERIALIZED (
  SELECT p.b0 + ((CAST(s.g0 AS DOUBLE) / 1e9)
                 * (CAST(s.swx2 AS DOUBLE) / 1e9)
                 - (CAST(s.g1 AS DOUBLE) / 1e9)
                   * (CAST(s.swx AS DOUBLE) / 1e9))
               / ((CAST(s.sw AS DOUBLE) / 1e9)
                  * (CAST(s.swx2 AS DOUBLE) / 1e9)
                  - (CAST(s.swx AS DOUBLE) / 1e9)
                    * (CAST(s.swx AS DOUBLE) / 1e9)) AS b0,
         p.b1 + ((CAST(s.sw AS DOUBLE) / 1e9)
                 * (CAST(s.g1 AS DOUBLE) / 1e9)
                 - (CAST(s.swx AS DOUBLE) / 1e9)
                   * (CAST(s.g0 AS DOUBLE) / 1e9))
               / ((CAST(s.sw AS DOUBLE) / 1e9)
                  * (CAST(s.swx2 AS DOUBLE) / 1e9)
                  - (CAST(s.swx AS DOUBLE) / 1e9)
                    * (CAST(s.swx AS DOUBLE) / 1e9)) AS b1
  FROM {prev} p CROSS JOIN hs{i} s)"""


_Z_FIN = "(p.b0 + p.b1 * o.x)"
_UP_FIN = _sql_upper(_Z_FIN)
_CDF_FIN = f"(1.0 - {_UP_FIN})"
_PDF_FIN = f"(exp(-{_Z_FIN} * {_Z_FIN} / 2.0) / sqrt(2.0 * pi()))"
_LAM_FIN = f"({_PDF_FIN} / {_CDF_FIN})"

SQL_HECKMAN = f"""
WITH RECURSIVE d0 AS (
  SELECT min(CAST(ts AS DATE)) AS dmin FROM events),
usr AS (
  SELECT user_id,
         sum((CAST(ts AS DATE) - (SELECT dmin FROM d0)
              < {_HK_DAYS})::INT)::BIGINT AS w1,
         max(((CAST(ts AS DATE) - (SELECT dmin FROM d0)
               < {_HK_DAYS})
              AND event_type = 'purchase')::INT)::BIGINT AS sel,
         sum(CASE WHEN CAST(ts AS DATE) - (SELECT dmin FROM d0)
                       >= {_HK_DAYS}
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE 0 END)::BIGINT AS yc
  FROM events GROUP BY user_id),
hcells AS MATERIALIZED (
  SELECT CAST(w1 AS DOUBLE) / 10 AS x, sel AS y,
         count(*)::BIGINT AS n
  FROM usr GROUP BY 1, 2),
hinit AS (SELECT 0.0 AS b0, 0.0 AS b1),
{_hk_iter_sql(1)},
{_hk_iter_sql(2)},
{_hk_iter_sql(3)},
ocells AS MATERIALIZED (
  SELECT CAST(w1 AS DOUBLE) / 10 AS x, count(*)::BIGINT AS m,
         sum(CAST(round(1e9 * ln(CAST(yc AS DOUBLE) / 1e2))
                  AS BIGINT))::BIGINT AS syq
  FROM usr WHERE sel = 1 AND yc > 0 GROUP BY 1),
ne AS MATERIALIZED (
  SELECT
    sum(CAST(round(CAST(o.m AS DOUBLE) * 1e9) AS BIGINT))
      ::BIGINT AS a11,
    sum(CAST(round(CAST(o.m AS DOUBLE) * o.x * 1e9) AS BIGINT))
      ::BIGINT AS a12,
    sum(CAST(round(CAST(o.m AS DOUBLE) * {_LAM_FIN} * 1e9)
             AS BIGINT))::BIGINT AS a13,
    sum(CAST(round(CAST(o.m AS DOUBLE) * o.x * o.x * 1e9)
             AS BIGINT))::BIGINT AS a22,
    sum(CAST(round(CAST(o.m AS DOUBLE) * o.x * {_LAM_FIN} * 1e9)
             AS BIGINT))::BIGINT AS a23,
    sum(CAST(round(CAST(o.m AS DOUBLE) * {_LAM_FIN} * {_LAM_FIN}
                   * 1e9) AS BIGINT))::BIGINT AS a33,
    sum(CAST(round((CAST(o.syq AS DOUBLE) / 1e9) * 1e9)
             AS BIGINT))::BIGINT AS r1,
    sum(CAST(round(o.x * (CAST(o.syq AS DOUBLE) / 1e9) * 1e9)
             AS BIGINT))::BIGINT AS r2,
    sum(CAST(round({_LAM_FIN} * (CAST(o.syq AS DOUBLE) / 1e9)
                   * 1e9) AS BIGINT))::BIGINT AS r3
  FROM ocells o CROSS JOIN hit3 p),
sys AS (
  SELECT [CAST(a11 AS DOUBLE) / 1e9, CAST(a12 AS DOUBLE) / 1e9,
          CAST(a13 AS DOUBLE) / 1e9, CAST(r1 AS DOUBLE) / 1e9,
          CAST(a12 AS DOUBLE) / 1e9, CAST(a22 AS DOUBLE) / 1e9,
          CAST(a23 AS DOUBLE) / 1e9, CAST(r2 AS DOUBLE) / 1e9,
          CAST(a13 AS DOUBLE) / 1e9, CAST(a23 AS DOUBLE) / 1e9,
          CAST(a33 AS DOUBLE) / 1e9, CAST(r3 AS DOUBLE) / 1e9]
           AS aug
  FROM ne),
{_gauss_sql(3, "sys")}
SELECT (SELECT count(*) FROM usr)::BIGINT AS n_users,
       (SELECT sum(sel) FROM usr)::BIGINT AS n_sel,
       round(p.b0, 6) AS a6, round(p.b1, 6) AS b6,
       round(xs[1], 6) AS beta0_6, round(xs[2], 6) AS beta_x6,
       round(xs[3], 6) AS beta_lam6
FROM sol, hit3 p
"""


QUERIES179: dict[str, tuple] = {
    "spanning_trees_sources": (q_spanning_trees_sources,
                               SQL_SPANNING),
    "effective_resistance_sources": (q_effective_resistance_sources,
                                     SQL_REFF),
    "heckman_selection_users": (q_heckman_selection_users,
                                SQL_HECKMAN),
}
