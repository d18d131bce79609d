"""One-hundred-ninety-fifth oracle-query batch — economic-structure
kernels:

- economic_complexity_sources: the Hidalgo–Hausmann method of
  reflections on the source × lang RCA matrix (RCA ≥ 1 decided by
  exact integer cross-multiplication c_sl·c_·· ≥ c_s··c_·l) — 8
  alternating diversity/ubiquity reflections with 1e-9
  requantization; reports the top-3 sources by the final (even)
  reflection.
- leontief_requirements_types: Leontief total output multipliers of
  the event-type "economy" — A = 0.5 × the transition-probability
  matrix (quantized once to 1e-12), solve (I−A)x = 1 with the
  shared no-pivot Gauss replay; one multiplier row per type.
- fwl_partialling_audit: the Frisch–Waugh–Lovell theorem as an
  in-query audit — the views coefficient from the direct
  two-regressor OLS (HUGEINT-cleared normal equations, the
  queries169 device) vs the coefficient from regressing
  x-residualized y on x-residualized m (1e-6-quantized residual
  products); reports both, the difference, and an agreement flag.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries163 import _gauss_solve, _gauss_sql
from scrapy_ray.pipelines.queries169 import _daily_xmy
from scrapy_ray.pipelines.queries174 import _srclang_cells
from scrapy_ray.pipelines.queries178 import _transition_counts

_ECI_IT = 8


# ---------------------------------------------------------------------------
# Economic complexity
# ---------------------------------------------------------------------------


def q_economic_complexity_sources(sf_dir: str):
    """Method of reflections over the RCA matrix (docstring)."""
    cells = _srclang_cells(sf_dir)
    sources = sorted(cells["source"].unique().tolist())
    langs = sorted(cells["lang"].unique().tolist())
    ns, nl = len(sources), len(langs)
    c = np.zeros((ns, nl), np.int64)
    for _, r in cells.iterrows():
        c[sources.index(r["source"]), langs.index(r["lang"])] = \
            int(r["c"])
    tot = int(c.sum())
    rs = c.sum(axis=1)
    rl = c.sum(axis=0)
    m = np.zeros((ns, nl), np.int64)
    for i in range(ns):
        for j in range(nl):
            if int(c[i, j]) * tot >= int(rs[i]) * int(rl[j]):
                m[i, j] = 1
    ks0 = m.sum(axis=1)
    kl0 = m.sum(axis=0)
    ks = [int(v) * 10 ** 9 for v in ks0]
    kl = [int(v) * 10 ** 9 for v in kl0]
    for _ in range(_ECI_IT):
        nks = []
        for i in range(ns):
            s = sum(kl[j] for j in range(nl) if m[i, j])
            nks.append(int(math.floor(
                (float(s) / 1e9) / float(ks0[i]) * 1e9 + 0.5)))
        nkl = []
        for j in range(nl):
            s = sum(ks[i] for i in range(ns) if m[i, j])
            nkl.append(int(math.floor(
                (float(s) / 1e9) / float(kl0[j]) * 1e9 + 0.5)))
        ks, kl = nks, nkl
    order = sorted(range(ns), key=lambda i: (-ks[i], sources[i]))
    rows = []
    for rank, i in enumerate(order[:3], start=1):
        rows.append({"rank": rank, "source": sources[i],
                     "k6": _round6(np.array(
                         [float(ks[i]) / 1e9]))[0],
                     "diversity": int(ks0[i])})
    out = pd.DataFrame(rows)
    for col in ("rank", "diversity"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ECI = f"""
WITH RECURSIVE cells AS (
  SELECT source, lang, count(*)::BIGINT AS c
  FROM documents GROUP BY 1, 2),
src AS (
  SELECT source, row_number() OVER (ORDER BY source) AS si
  FROM (SELECT DISTINCT source FROM cells)),
lng AS (
  SELECT lang, row_number() OVER (ORDER BY lang) AS lj
  FROM (SELECT DISTINCT lang FROM cells)),
tot AS (SELECT sum(c)::BIGINT AS t FROM cells),
rsum AS (SELECT source, sum(c)::BIGINT AS r FROM cells
         GROUP BY source),
lsum AS (SELECT lang, sum(c)::BIGINT AS r FROM cells
         GROUP BY lang),
dims AS (SELECT (SELECT count(*) FROM src)::BIGINT AS ns,
                (SELECT count(*) FROM lng)::BIGINT AS nl),
mmat AS (
  SELECT (SELECT list(
            CASE WHEN coalesce((SELECT c FROM cells c2
                   WHERE c2.source = s.source
                     AND c2.lang = l.lang), 0)
                 * (SELECT t FROM tot)
                 >= (SELECT r FROM rsum WHERE source = s.source)
                    * (SELECT r FROM lsum WHERE lang = l.lang)
                 THEN 1 ELSE 0 END
            ORDER BY s.si * 100 + l.lj)
          FROM src s CROSS JOIN lng l) AS m,
         (SELECT nl FROM dims) AS nl,
         (SELECT ns FROM dims) AS ns),
base AS (
  SELECT m, nl, ns,
         [list_sum([m[(si0 - 1) * nl + jj] FOR jj
                    IN range(1, nl + 1)])
          FOR si0 IN range(1, ns + 1)] AS ks0,
         [list_sum([m[(ii0 - 1) * nl + lj0] FOR ii0
                    IN range(1, ns + 1)])
          FOR lj0 IN range(1, nl + 1)] AS kl0
  FROM mmat),
refl AS (
  SELECT 0 AS it, m, nl, ns, ks0, kl0,
         [k * 1000000000 FOR k IN ks0] AS ks,
         [k2 * 1000000000 FOR k2 IN kl0] AS kl
  FROM base
  UNION ALL
  SELECT it + 1, m, nl, ns, ks0, kl0,
         [CAST(floor((CAST(list_sum(
             [CASE WHEN m[(si - 1) * nl + jj2] = 1
                   THEN kl[jj2] ELSE 0 END
              FOR jj2 IN range(1, nl + 1)]) AS DOUBLE) / 1e9)
             / CAST(ks0[si] AS DOUBLE) * 1e9 + 5e-1) AS BIGINT)
          FOR si IN range(1, ns + 1)],
         [CAST(floor((CAST(list_sum(
             [CASE WHEN m[(ii - 1) * nl + lj] = 1
                   THEN ks[ii] ELSE 0 END
              FOR ii IN range(1, ns + 1)]) AS DOUBLE) / 1e9)
             / CAST(kl0[lj] AS DOUBLE) * 1e9 + 5e-1) AS BIGINT)
          FOR lj IN range(1, nl + 1)]
  FROM refl WHERE it < {_ECI_IT}),
fin AS (SELECT ks, ks0 FROM refl WHERE it = {_ECI_IT}),
vals AS (
  SELECT s.source, s.si, fin.ks[s.si] AS k,
         fin.ks0[s.si] AS dv
  FROM src s, fin),
rk AS (
  SELECT source, k, dv,
         row_number() OVER (ORDER BY k DESC, source) AS rank
  FROM vals)
SELECT rank::BIGINT AS rank, source,
       round(CAST(k AS DOUBLE) / 1e9, 6) AS k6,
       dv::BIGINT AS diversity
FROM rk WHERE rank <= 3 ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Leontief
# ---------------------------------------------------------------------------


def q_leontief_requirements_types(sf_dir: str):
    """(I - 0.5P)^-1 · 1 multipliers via Gauss replay."""
    names, cm = _transition_counts(sf_dir)
    k = len(names)
    rows = cm.sum(axis=1)
    aq = [[int(math.floor(cm[i][j] / rows[i] * 0.5 * 1e12 + 0.5))
           for j in range(k)] for i in range(k)]
    a = [[(1.0 if i == j else 0.0) - float(aq[i][j]) / 1e12
          for j in range(k)] for i in range(k)]
    xs = _gauss_solve(a, [1.0] * k)
    out = pd.DataFrame({"et": names,
                        "multiplier6": _round6(np.array(xs))})
    out = out.sort_values("et").reset_index(drop=True)
    return out


SQL_LEONTIEF = f"""
WITH RECURSIVE tr AS (
  SELECT a, b, count(*)::BIGINT AS n
  FROM (
    SELECT lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS a,
           event_type AS b
    FROM events)
  WHERE a IS NOT NULL GROUP BY a, b),
types AS (
  SELECT s, row_number() OVER (ORDER BY s) AS ti
  FROM (SELECT DISTINCT a AS s FROM tr
        UNION SELECT DISTINCT b FROM tr)),
rows_ AS (SELECT a, sum(n)::BIGINT AS r FROM tr GROUP BY a),
sys AS (
  SELECT (SELECT list(
            CASE WHEN (z - 1) % 6 + 1 = 6 THEN 1e0
            WHEN (z - 1) // 6 = (z - 1) % 6 THEN
              1e0 - CAST(floor(
                CAST(coalesce((SELECT n FROM tr
                  JOIN types x ON x.s = tr.a
                  JOIN types y ON y.s = tr.b
                  WHERE x.ti = (z - 1) // 6 + 1
                    AND y.ti = (z - 1) % 6 + 1), 0) AS DOUBLE)
                / CAST((SELECT r FROM rows_
                        JOIN types x2 ON x2.s = rows_.a
                        WHERE x2.ti = (z - 1) // 6 + 1)
                       AS DOUBLE)
                * 0.5 * 1e12 + 5e-1) AS BIGINT) / 1e12
            ELSE
              0e0 - CAST(floor(
                CAST(coalesce((SELECT n FROM tr
                  JOIN types x3 ON x3.s = tr.a
                  JOIN types y3 ON y3.s = tr.b
                  WHERE x3.ti = (z - 1) // 6 + 1
                    AND y3.ti = (z - 1) % 6 + 1), 0) AS DOUBLE)
                / CAST((SELECT r FROM rows_
                        JOIN types x4 ON x4.s = rows_.a
                        WHERE x4.ti = (z - 1) // 6 + 1)
                       AS DOUBLE)
                * 0.5 * 1e12 + 5e-1) AS BIGINT) / 1e12
            END ORDER BY z)
          FROM (SELECT unnest(range(1, 31)) AS z)) AS aug),
{_gauss_sql(5, "sys")}
SELECT t.s AS et, round(sol.xs[t.ti], 6) AS multiplier6
FROM types t, sol ORDER BY t.s
"""


# ---------------------------------------------------------------------------
# Frisch-Waugh-Lovell audit
# ---------------------------------------------------------------------------


def q_fwl_partialling_audit(sf_dir: str):
    """Direct vs partialled-out views coefficient (docstring)."""
    dly = _daily_xmy(sf_dir)
    n = len(dly)
    x = [int(v) for v in dly["x"]]
    mm = [int(v) for v in dly["m"]]
    y = [int(v) for v in dly["y"]]
    sx, sm, sy = sum(x), sum(mm), sum(y)
    sxx = sum(v * v for v in x)
    sxm = sum(a * b for a, b in zip(x, mm))
    sxy = sum(a * b for a, b in zip(x, y))
    smm = sum(v * v for v in mm)
    smy = sum(a * b for a, b in zip(mm, y))
    cxx = n * sxx - sx * sx
    cxm = n * sxm - sx * sm
    cxy = n * sxy - sx * sy
    cmm = n * smm - sm * sm
    cmy = n * smy - sm * sy
    det = cxx * cmm - cxm * cxm
    b_direct = float(cxx * cmy - cxm * cxy) / float(det)
    # partial out x from m and from y, then simple OLS
    am = float(cxm) / float(cxx)
    ay = float(cxy) / float(cxx)
    mbar = float(sm) / n
    xbar = float(sx) / n
    ybar = float(sy) / n
    srr = 0
    sry = 0
    for xi, mi, yi in zip(x, mm, y):
        rm = (mi - mbar) - am * (xi - xbar)
        ry = (yi - ybar) - ay * (xi - xbar)
        srr += int(math.copysign(
            math.floor(abs(rm * rm) * 1e6 + 0.5), rm * rm))
        sry += int(math.copysign(
            math.floor(abs(rm * ry) * 1e6 + 0.5), rm * ry))
    b_fwl = float(sry) / float(srr)
    diff = b_direct - b_fwl
    r6 = _round6(np.array([b_direct, b_fwl, diff]))
    out = pd.DataFrame({"n_days": [n], "b_direct6": [r6[0]],
                        "b_fwl6": [r6[1]], "diff6": [r6[2]],
                        "agree": [1 if abs(diff) < 1e-3 else 0]})
    for col in ("n_days", "agree"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_FWL = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'view')::INT)::BIGINT AS m,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
s AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(m)::BIGINT AS sm, sum(y)::BIGINT AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * m) AS sxm,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(m AS HUGEINT) * m) AS smm,
         sum(CAST(m AS HUGEINT) * y) AS smy
  FROM dly),
c AS (
  SELECT n,
         n * sxx - CAST(sx AS HUGEINT) * sx AS cxx,
         n * sxm - CAST(sx AS HUGEINT) * sm AS cxm,
         n * sxy - CAST(sx AS HUGEINT) * sy AS cxy,
         n * smm - CAST(sm AS HUGEINT) * sm AS cmm,
         n * smy - CAST(sm AS HUGEINT) * sy AS cmy,
         sx, sm, sy
  FROM s),
d AS (
  SELECT n, sx, sm, sy, cxx, cxm, cxy, cmm, cmy,
         CAST(cxx * cmy - cxm * cxy AS DOUBLE)
           / CAST(cxx * cmm - cxm * cxm AS DOUBLE) AS b_direct,
         CAST(cxm AS DOUBLE) / CAST(cxx AS DOUBLE) AS am,
         CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE) AS ay,
         CAST(sm AS DOUBLE) / n AS mbar,
         CAST(sx AS DOUBLE) / n AS xbar,
         CAST(sy AS DOUBLE) / n AS ybar
  FROM c),
res AS (
  SELECT d.n, d.b_direct,
         sum(CAST(CASE WHEN rm * rm >= 0
               THEN floor(abs(rm * rm) * 1e6 + 5e-1)
               ELSE -floor(abs(rm * rm) * 1e6 + 5e-1) END
               AS BIGINT))::BIGINT AS srr,
         sum(CAST(CASE WHEN rm * ry >= 0
               THEN floor(abs(rm * ry) * 1e6 + 5e-1)
               ELSE -floor(abs(rm * ry) * 1e6 + 5e-1) END
               AS BIGINT))::BIGINT AS sry
  FROM (
    SELECT d.n, d.b_direct,
           (dly.m - d.mbar) - d.am * (dly.x - d.xbar) AS rm,
           (dly.y - d.ybar) - d.ay * (dly.x - d.xbar) AS ry
    FROM dly, d) q, d
  GROUP BY d.n, d.b_direct),
f AS (
  SELECT n, b_direct,
         CAST(sry AS DOUBLE) / CAST(srr AS DOUBLE) AS b_fwl
  FROM res)
SELECT n AS n_days, round(b_direct, 6) AS b_direct6,
       round(b_fwl, 6) AS b_fwl6,
       round(b_direct - b_fwl, 6) AS diff6,
       (CASE WHEN abs(b_direct - b_fwl) < 1e-3
             THEN 1 ELSE 0 END)::BIGINT AS agree
FROM f
"""


QUERIES195: dict[str, tuple] = {
    "economic_complexity_sources": (q_economic_complexity_sources,
                                    SQL_ECI),
    "leontief_requirements_types": (q_leontief_requirements_types,
                                    SQL_LEONTIEF),
    "fwl_partialling_audit": (q_fwl_partialling_audit, SQL_FWL),
}
