"""Seventy-first oracle-query batch — ordinal/nominal association on
the orders priority x status contingency table (5x3, all cells
populated at every sf; ONE distributed (priority, status, cnt) cell
aggregate feeds each query, everything downstream is exact driver-side
integer arithmetic on <= 15 cells):

- gamma_somers_priority_status: Goodman-Kruskal gamma, Somers'
  D(status|priority) and D(priority|status), and Stuart's tau-c.
  Concordant/discordant pair counts C and D are exact int64 sums over
  the 15x15 cell self-join (each unordered pair counted once via the
  strict b.r > a.r AND b.c > a.c / b.c < a.c predicates; ordinal
  order = lexicographic on both axes — Python str compare == SQL
  VARCHAR compare, both byte order).  Ties-on-one-axis T_X/T_Y come
  from row/col marginal squares minus cell squares over 2.  All four
  statistics are single float divisions of exact ints
  (tau-c = (C-D)*2m/(N^2(m-1)), m = 3).
- gk_lambda_priority_status: Goodman-Kruskal lambda PRE measures —
  lambda(status|priority) = (SUM_i max_j n_ij - max_col)/(N -
  max_col), the transpose, and the symmetric lambda — all exact
  integer ratios (max of cell counts per row/col, no argmax
  tie-sensitivity: the VALUE of the max is used, not its position).
- cramers_v_priority_status: chi-square of independence via the
  identity chi2 = N*(SUM n_ij^2/(row_i*col_j) - 1) with per-cell
  terms quantized to 1e-12 and integer-summed (15 cells; term
  magnitude ~1e10 at sf0.1, far below 2^52), then Cramer's V =
  sqrt(chi2/(N*(m-1))) and Tschuprow's T = sqrt(chi2/(N*sqrt(8)))
  finalize identical-expression (sqrt is IEEE-correctly-rounded —
  fully portable).
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


def _ps_cells(sf_dir: str) -> pd.DataFrame:
    """Distributed (priority, status, cnt) contingency cells."""
    ds = _pq(sf_dir, "orders", columns=["o_orderpriority",
                                        "o_orderstatus"])

    def cpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"r": t["o_orderpriority"].to_pylist(),
                           "c": t["o_orderstatus"].to_pylist()})
        g = df.groupby(["r", "c"], sort=False).size() \
              .reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(cpart, batch_format="pyarrow")
              .groupby(["r", "c"]).aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values(["r", "c"]).reset_index(drop=True))


_PS_CELLS_SQL = """
WITH cells AS (
  SELECT o_orderpriority AS r, o_orderstatus AS c, count(*)::BIGINT AS n
  FROM orders GROUP BY 1, 2)
"""


# ---------------------------------------------------------------------------
# gamma / Somers' D / Stuart tau-c
# ---------------------------------------------------------------------------


def q_gamma_somers_priority_status(sf_dir: str):
    """Gamma, Somers' D both ways, Stuart tau-c (docstring above)."""
    cells = _ps_cells(sf_dir)
    rows = [(str(r), str(c), int(n))
            for r, c, n in zip(cells["r"], cells["c"], cells["cnt"])]
    n_tot = sum(n for _, _, n in rows)
    conc = sum(n1 * n2 for r1, c1, n1 in rows for r2, c2, n2 in rows
               if r2 > r1 and c2 > c1)
    disc = sum(n1 * n2 for r1, c1, n1 in rows for r2, c2, n2 in rows
               if r2 > r1 and c2 < c1)
    row_tot: dict[str, int] = {}
    col_tot: dict[str, int] = {}
    for r, c, n in rows:
        row_tot[r] = row_tot.get(r, 0) + n
        col_tot[c] = col_tot.get(c, 0) + n
    sq = sum(n * n for _, _, n in rows)
    tx = (sum(v * v for v in row_tot.values()) - sq) // 2
    ty = (sum(v * v for v in col_tot.values()) - sq) // 2
    m = min(len(row_tot), len(col_tot))
    gamma = float(conc - disc) / float(conc + disc)
    dyx = float(conc - disc) / float(conc + disc + ty)
    dxy = float(conc - disc) / float(conc + disc + tx)
    tauc = float((conc - disc) * 2 * m) / float(n_tot * n_tot * (m - 1))
    out = pd.DataFrame({"n": [n_tot], "c_pairs": [conc],
                        "d_pairs": [disc], "tx": [tx], "ty": [ty],
                        "gamma6": [_round6(np.array([gamma]))[0]],
                        "dyx6": [_round6(np.array([dyx]))[0]],
                        "dxy6": [_round6(np.array([dxy]))[0]],
                        "tauc6": [_round6(np.array([tauc]))[0]]})
    for col in ("n", "c_pairs", "d_pairs", "tx", "ty"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GAMMA_SOMERS = _PS_CELLS_SQL + """,
t AS (SELECT sum(n)::BIGINT AS n_tot, sum(n * n)::BIGINT AS sq
      FROM cells),
cd AS (
  SELECT
    sum(CASE WHEN b.r > a.r AND b.c > a.c THEN a.n * b.n ELSE 0 END)
      ::BIGINT AS conc,
    sum(CASE WHEN b.r > a.r AND b.c < a.c THEN a.n * b.n ELSE 0 END)
      ::BIGINT AS disc
  FROM cells a CROSS JOIN cells b),
mr AS (SELECT sum(s * s)::BIGINT AS rsq, count(*)::BIGINT AS nr
       FROM (SELECT sum(n)::BIGINT AS s FROM cells GROUP BY r)),
mc AS (SELECT sum(s * s)::BIGINT AS csq, count(*)::BIGINT AS nc
       FROM (SELECT sum(n)::BIGINT AS s FROM cells GROUP BY c)),
f AS (
  SELECT n_tot, conc, disc,
         (rsq - sq) // 2 AS tx, (csq - sq) // 2 AS ty,
         least(nr, nc) AS m
  FROM t, cd, mr, mc)
SELECT n_tot AS n, conc AS c_pairs, disc AS d_pairs, tx, ty,
       round(CAST(conc - disc AS DOUBLE)
             / CAST(conc + disc AS DOUBLE), 6) AS gamma6,
       round(CAST(conc - disc AS DOUBLE)
             / CAST(conc + disc + ty AS DOUBLE), 6) AS dyx6,
       round(CAST(conc - disc AS DOUBLE)
             / CAST(conc + disc + tx AS DOUBLE), 6) AS dxy6,
       round(CAST((conc - disc) * 2 * m AS DOUBLE)
             / CAST(n_tot::HUGEINT * n_tot * (m - 1) AS DOUBLE), 6)
         AS tauc6
FROM f
"""


# ---------------------------------------------------------------------------
# Goodman-Kruskal lambda
# ---------------------------------------------------------------------------


def q_gk_lambda_priority_status(sf_dir: str):
    """GK lambda PRE measures, both directions + symmetric (docstring
    above)."""
    cells = _ps_cells(sf_dir)
    rows = [(str(r), str(c), int(n))
            for r, c, n in zip(cells["r"], cells["c"], cells["cnt"])]
    n_tot = sum(n for _, _, n in rows)
    row_max: dict[str, int] = {}
    col_max: dict[str, int] = {}
    row_tot: dict[str, int] = {}
    col_tot: dict[str, int] = {}
    for r, c, n in rows:
        row_max[r] = max(row_max.get(r, 0), n)
        col_max[c] = max(col_max.get(c, 0), n)
        row_tot[r] = row_tot.get(r, 0) + n
        col_tot[c] = col_tot.get(c, 0) + n
    srm = sum(row_max.values())
    scm = sum(col_max.values())
    mr = max(row_tot.values())
    mc = max(col_tot.values())
    lyx = float(srm - mc) / float(n_tot - mc)
    lxy = float(scm - mr) / float(n_tot - mr)
    lsym = float(srm + scm - mr - mc) / float(2 * n_tot - mr - mc)
    out = pd.DataFrame({"n": [n_tot], "srm": [srm], "scm": [scm],
                        "max_row": [mr], "max_col": [mc],
                        "lyx6": [_round6(np.array([lyx]))[0]],
                        "lxy6": [_round6(np.array([lxy]))[0]],
                        "lsym6": [_round6(np.array([lsym]))[0]]})
    for col in ("n", "srm", "scm", "max_row", "max_col"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GK_LAMBDA = _PS_CELLS_SQL + """,
t AS (SELECT sum(n)::BIGINT AS n_tot FROM cells),
rm AS (SELECT sum(mx)::BIGINT AS srm
       FROM (SELECT max(n) AS mx FROM cells GROUP BY r)),
cm AS (SELECT sum(mx)::BIGINT AS scm
       FROM (SELECT max(n) AS mx FROM cells GROUP BY c)),
rt AS (SELECT max(s)::BIGINT AS mr
       FROM (SELECT sum(n) AS s FROM cells GROUP BY r)),
ct AS (SELECT max(s)::BIGINT AS mc
       FROM (SELECT sum(n) AS s FROM cells GROUP BY c))
SELECT n_tot AS n, srm, scm, mr AS max_row, mc AS max_col,
       round(CAST(srm - mc AS DOUBLE) / CAST(n_tot - mc AS DOUBLE), 6)
         AS lyx6,
       round(CAST(scm - mr AS DOUBLE) / CAST(n_tot - mr AS DOUBLE), 6)
         AS lxy6,
       round(CAST(srm + scm - mr - mc AS DOUBLE)
             / CAST(2 * n_tot - mr - mc AS DOUBLE), 6) AS lsym6
FROM t, rm, cm, rt, ct
"""


# ---------------------------------------------------------------------------
# Cramer's V / Tschuprow's T
# ---------------------------------------------------------------------------


def q_cramers_v_priority_status(sf_dir: str):
    """Chi-square independence -> Cramer's V + Tschuprow's T (docstring
    above)."""
    cells = _ps_cells(sf_dir)
    rows = [(str(r), str(c), int(n))
            for r, c, n in zip(cells["r"], cells["c"], cells["cnt"])]
    n_tot = sum(n for _, _, n in rows)
    row_tot: dict[str, int] = {}
    col_tot: dict[str, int] = {}
    for r, c, n in rows:
        row_tot[r] = row_tot.get(r, 0) + n
        col_tot[c] = col_tot.get(c, 0) + n
    m = min(len(row_tot), len(col_tot))
    s_q = sum(int(math.floor(n * n * 1e12
                             / (row_tot[r] * col_tot[c]) + 0.5))
              for r, c, n in rows)
    chi2 = float(n_tot) * (float(s_q) / 1e12 - 1.0)
    v = math.sqrt((float(s_q) / 1e12 - 1.0) / (m - 1.0))
    tsch = math.sqrt((float(s_q) / 1e12 - 1.0)
                     / math.sqrt(float((len(row_tot) - 1)
                                       * (len(col_tot) - 1))))
    out = pd.DataFrame({"n": [n_tot], "s_q": [s_q],
                        "chi2_6": [_round6(np.array([chi2]))[0]],
                        "v6": [_round6(np.array([v]))[0]],
                        "t6": [_round6(np.array([tsch]))[0]]})
    for col in ("n", "s_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CRAMERS_V = _PS_CELLS_SQL + """,
t AS (SELECT sum(n)::BIGINT AS n_tot FROM cells),
rt AS (SELECT r, sum(n)::BIGINT AS s FROM cells GROUP BY r),
ct AS (SELECT c, sum(n)::BIGINT AS s FROM cells GROUP BY c),
dims AS (SELECT (SELECT count(*) FROM rt)::BIGINT AS nr,
                (SELECT count(*) FROM ct)::BIGINT AS nc),
q AS (
  SELECT sum(CAST(round(cells.n * cells.n * 1000000000000.0
                        / (rt.s * ct.s)) AS BIGINT))::BIGINT AS s_q
  FROM cells JOIN rt USING (r) JOIN ct USING (c))
SELECT n_tot AS n, s_q,
       round(CAST(n_tot AS DOUBLE)
             * (CAST(s_q AS DOUBLE) / 1000000000000.0 - 1.0), 6)
         AS chi2_6,
       round(sqrt((CAST(s_q AS DOUBLE) / 1000000000000.0 - 1.0)
                  / (least(nr, nc) - 1.0)), 6) AS v6,
       round(sqrt((CAST(s_q AS DOUBLE) / 1000000000000.0 - 1.0)
                  / sqrt(CAST((nr - 1) * (nc - 1) AS DOUBLE))), 6) AS t6
FROM t, q, dims
"""


QUERIES71: dict[str, tuple] = {
    "gamma_somers_priority_status": (q_gamma_somers_priority_status,
                                     SQL_GAMMA_SOMERS),
    "gk_lambda_priority_status": (q_gk_lambda_priority_status,
                                  SQL_GK_LAMBDA),
    "cramers_v_priority_status": (q_cramers_v_priority_status,
                                  SQL_CRAMERS_V),
}
