"""Sixty-seventh oracle-query batch — distribution-distance trio on the
click-vs-view value distributions, completing the ECDF-test family
(KS / CvM / AD / Kuiper already exist) with the *integral* metrics:

- wasserstein_click_view: exact 1-D earth-mover distance
  W1 = integral |F1 - F2| dt over the per-cent histogram support.  The
  whole statistic is ONE exact integer: with common-denominator ECDFs
  (c1*n2 vs c2*n1) and integer support gaps,
  w1_big = SUM |c1*n2 - c2*n1| * gap  (bound at sf0.1:
  range 5e4 cents x n1*n2 ~ 4e8 = 2e13 — int64-safe), and
  W1 dollars = w1_big / (n1*n2*100) finalizes identical-expression.
  Probe sf0.001: n1=210, n2=188, W1 = $4.506044.
- energy_distance_click_view: Szekely's two-sample energy distance
  E = 2 E|X-Y| - E|X-X'| - E|Y-Y'|.  In 1-D every term is an ECDF
  integral — E|X-Y| = integral F1(1-F2) + F2(1-F1) dt — so instead of
  the O(V^2) cross-histogram the three raw moments are O(V) exact
  integers off the same cumsums:
  exy = SUM gap*(c1*(n2-c2) + c2*(n1-c1)), exx = SUM gap*c1*(n1-c1),
  eyy = SUM gap*c2*(n2-c2); E dollars finalizes identical-expression
  with the 2.0 factors applied at float time.  Probe: E = $0.260421.
- cliffs_delta_click_view: ordinal effect size delta = (#(x>y) -
  #(x<y)) / (n1*n2) and Vargha-Delaney A = (#(x>y) + ties/2)/(n1*n2).
  gt = SUM h1_i * (c2_i - h2_i) (views strictly below each click
  cell), lt symmetric, ties = SUM h1_i*h2_i — all exact int64.
  Probe: gt=18909, lt=20567, ties=4, delta=-0.041996, A=0.479002
  (ties nearly empty but both sides handle them; the dense sf0.01
  support 3310 cells exercises collisions).

All three share one bounded per-cent histogram (value <= ~$500 ->
<= 50k cells), reduced distributed via groupby((g,c)).Sum — the same
shape as q_cramer_von_mises_click_view (queries55) — then finalized
on the tiny driver-side support table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _cv_hist(sf_dir: str):
    """Distributed per-cent click/view histogram -> (support, h1, h2)
    driver-side arrays (bounded by the value range; same shape as the
    CvM/AD/Kuiper queries)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def hpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        keep = (et == "click") | (et == "view")
        if not keep.any():
            return pa.table({"g": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        g = (et[keep] == "view").astype(np.int64)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)[keep]
        df = pd.DataFrame({"g": g, "c": c})
        out = df.groupby(["g", "c"], sort=False).size() \
                .reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype(np.int64)
        return _strip(out)

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby(["g", "c"]).aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    support = np.sort(cells["c"].unique().astype(np.int64))
    h = np.zeros((2, len(support)), np.int64)
    for gi in (0, 1):
        sub = cells[cells["g"] == gi]
        pos = np.searchsorted(support, sub["c"].to_numpy().astype(np.int64))
        h[gi, pos] = sub["cnt"].to_numpy().astype(np.int64)
    return support, h[0], h[1]


_CV_BASE_SQL = """
WITH b AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         (event_type = 'view')::INT AS g
  FROM events WHERE event_type IN ('click', 'view')),
h AS (
  SELECT c, sum((g = 0)::INT)::BIGINT AS h1,
         sum((g = 1)::INT)::BIGINT AS h2
  FROM b GROUP BY 1),
cum AS (
  SELECT c, h1, h2,
         CAST(sum(h1) OVER (ORDER BY c) AS BIGINT) AS c1,
         CAST(sum(h2) OVER (ORDER BY c) AS BIGINT) AS c2,
         lead(c) OVER (ORDER BY c) AS cn
  FROM h),
t AS (SELECT sum(h1)::BIGINT AS n1, sum(h2)::BIGINT AS n2,
             count(*)::BIGINT AS n_support FROM h)
"""


# ---------------------------------------------------------------------------
# 1-D Wasserstein (earth-mover) distance
# ---------------------------------------------------------------------------


def q_wasserstein_click_view(sf_dir: str):
    """Exact 1-D W1 distance between click and view value cents
    (docstring above)."""
    support, h1, h2 = _cv_hist(sf_dir)
    c1 = np.cumsum(h1)
    c2 = np.cumsum(h2)
    n1, n2 = int(c1[-1]), int(c2[-1])
    gaps = np.diff(support)
    w1_big = int(np.abs(c1[:-1] * n2 - c2[:-1] * n1).dot(gaps))
    w1d = float(w1_big) / float(n1 * n2 * 100)
    out = pd.DataFrame({"n1": [n1], "n2": [n2],
                        "n_support": [len(support)],
                        "w1_big": [w1_big],
                        "w1d6": [_round6(np.array([w1d]))[0]]})
    for col in ("n1", "n2", "n_support", "w1_big"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_WASSERSTEIN = _CV_BASE_SQL + """,
u AS (
  SELECT sum(abs(c1 * n2 - c2 * n1)::HUGEINT * (cn - c))::BIGINT AS w1_big
  FROM cum CROSS JOIN t WHERE cn IS NOT NULL)
SELECT n1, n2, n_support, w1_big,
       round(CAST(w1_big AS DOUBLE)
             / CAST(n1::HUGEINT * n2 * 100 AS DOUBLE), 6) AS w1d6
FROM u CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Energy distance
# ---------------------------------------------------------------------------


def q_energy_distance_click_view(sf_dir: str):
    """Szekely two-sample energy distance via exact ECDF integrals
    (docstring above)."""
    support, h1, h2 = _cv_hist(sf_dir)
    c1 = np.cumsum(h1)
    c2 = np.cumsum(h2)
    n1, n2 = int(c1[-1]), int(c2[-1])
    gaps = np.diff(support)
    a1, a2 = c1[:-1], c2[:-1]
    exy = int((a1 * (n2 - a2) + a2 * (n1 - a1)).dot(gaps))
    exx = int((a1 * (n1 - a1)).dot(gaps))
    eyy = int((a2 * (n2 - a2)).dot(gaps))
    e = (2.0 * float(exy) / float(n1 * n2)
         - 2.0 * float(exx) / float(n1 * n1)
         - 2.0 * float(eyy) / float(n2 * n2)) / 100.0
    out = pd.DataFrame({"n1": [n1], "n2": [n2], "exy": [exy],
                        "exx": [exx], "eyy": [eyy],
                        "e6": [_round6(np.array([e]))[0]]})
    for col in ("n1", "n2", "exy", "exx", "eyy"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ENERGY = _CV_BASE_SQL + """,
u AS (
  SELECT
    sum((c1 * (n2 - c2) + c2 * (n1 - c1))::HUGEINT * (cn - c))::BIGINT
      AS exy,
    sum((c1 * (n1 - c1))::HUGEINT * (cn - c))::BIGINT AS exx,
    sum((c2 * (n2 - c2))::HUGEINT * (cn - c))::BIGINT AS eyy
  FROM cum CROSS JOIN t WHERE cn IS NOT NULL)
SELECT n1, n2, exy, exx, eyy,
       round((2.0 * CAST(exy AS DOUBLE) / CAST(n1::HUGEINT * n2 AS DOUBLE)
              - 2.0 * CAST(exx AS DOUBLE)
                / CAST(n1::HUGEINT * n1 AS DOUBLE)
              - 2.0 * CAST(eyy AS DOUBLE)
                / CAST(n2::HUGEINT * n2 AS DOUBLE)) / 100.0, 6) AS e6
FROM u CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Cliff's delta / Vargha-Delaney A
# ---------------------------------------------------------------------------


def q_cliffs_delta_click_view(sf_dir: str):
    """Cliff's delta + Vargha-Delaney A from exact dominance counts
    (docstring above)."""
    support, h1, h2 = _cv_hist(sf_dir)
    c1 = np.cumsum(h1)
    c2 = np.cumsum(h2)
    n1, n2 = int(c1[-1]), int(c2[-1])
    gt = int(h1.dot(c2 - h2))
    lt = int(h2.dot(c1 - h1))
    ties = int(h1.dot(h2))
    delta = float(gt - lt) / float(n1 * n2)
    a = (float(gt) + 0.5 * float(ties)) / float(n1 * n2)
    out = pd.DataFrame({"n1": [n1], "n2": [n2], "gt_n": [gt],
                        "lt_n": [lt], "ties_n": [ties],
                        "delta6": [_round6(np.array([delta]))[0]],
                        "a6": [_round6(np.array([a]))[0]]})
    for col in ("n1", "n2", "gt_n", "lt_n", "ties_n"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CLIFFS = _CV_BASE_SQL + """,
u AS (
  SELECT sum(h1 * (c2 - h2))::BIGINT AS gt_n,
         sum(h2 * (c1 - h1))::BIGINT AS lt_n,
         sum(h1 * h2)::BIGINT AS ties_n
  FROM cum)
SELECT n1, n2, gt_n, lt_n, ties_n,
       round(CAST(gt_n - lt_n AS DOUBLE)
             / CAST(n1::HUGEINT * n2 AS DOUBLE), 6) AS delta6,
       round((CAST(gt_n AS DOUBLE) + 0.5 * CAST(ties_n AS DOUBLE))
             / CAST(n1::HUGEINT * n2 AS DOUBLE), 6) AS a6
FROM u CROSS JOIN t
"""


QUERIES67: dict[str, tuple] = {
    "wasserstein_click_view": (q_wasserstein_click_view, SQL_WASSERSTEIN),
    "energy_distance_click_view": (q_energy_distance_click_view,
                                   SQL_ENERGY),
    "cliffs_delta_click_view": (q_cliffs_delta_click_view, SQL_CLIFFS),
}
