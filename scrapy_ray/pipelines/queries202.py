"""Two-hundred-second oracle-query batch — matrix-association
kernels:

- correspondence_axis_dowtype: the first correspondence-analysis
  axis of the dow × type contingency table — standardized residuals
  S = (P − rcᵀ)/√(rcᵀ) from exact counts, first eigenvalue of SᵀS
  by 20 power iterations with the 5-vector state requantized to
  1e-12 (the PCA device); reports σ₁ and its share of the total
  inertia (= χ²/n, computed from the same integers).
- rv_coefficient_halves: the RV matrix-correlation between the
  first-half and second-half-of-month dow × type count matrices —
  RV = <X1ᵀX1, X2ᵀX2>_F / (‖X1ᵀX1‖·‖X2ᵀX2‖) with every Frobenius
  product a pure integer (HUGEINT / Python int).
- mantel_matrices_sources: the Mantel correlation between two
  similarity matrices on the top-5 sources — the lang-profile
  overlap weights (batch 179) and the pairwise distinct-bigram
  intersection counts — Pearson over the 10 off-diagonal pairs
  from exact integer sums.
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
from scrapy_ray.pipelines.queries179 import _overlap_graph

_CA_IT = 20


def _dowtype_cells(sf_dir: str, split_half: bool) -> pd.DataFrame:
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dow = pc.day_of_week(t["ts"]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist())
        df = pd.DataFrame({"dow": dow, "et": et,
                           "day": day, "n": np.int64(1)})
        g = df.groupby(["dow", "et", "day"], sort=False) \
            .sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby(["dow", "et", "day"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    if split_half:
        days = sorted(cells["day"].unique().tolist())
        first = set(days[:15])
        cells["half"] = [1 if d in first else 2
                         for d in cells["day"]]
    return cells


# ---------------------------------------------------------------------------
# Correspondence analysis axis
# ---------------------------------------------------------------------------


def q_correspondence_axis_dowtype(sf_dir: str):
    """First CA axis via requantized power iteration (docstring)."""
    cells = _dowtype_cells(sf_dir, split_half=False)
    dows = sorted(cells["dow"].unique().tolist())
    ets = sorted(cells["et"].unique().tolist())
    nr, nc = len(dows), len(ets)
    m = np.zeros((nr, nc), np.int64)
    for _, r in cells.iterrows():
        m[dows.index(r["dow"]), ets.index(r["et"])] += int(r["n"])
    n = int(m.sum())
    ri = m.sum(axis=1)
    cj = m.sum(axis=0)
    s = [[(m[i, j] / n - (ri[i] / n) * (cj[j] / n))
          / math.sqrt((ri[i] / n) * (cj[j] / n))
          for j in range(nc)] for i in range(nr)]
    inertia = sum(s[i][j] * s[i][j]
                  for i in range(nr) for j in range(nc))
    # power iteration on SᵀS (nc x nc), requantized state
    vq = [10 ** 12 // nc] * nc
    for _ in range(_CA_IT):
        v = [x / 1e12 for x in vq]
        sv = [sum(s[i][j] * v[j] for j in range(nc))
              for i in range(nr)]
        w = [sum(s[i][j] * sv[i] for i in range(nr))
             for j in range(nc)]
        nrm = math.sqrt(sum(x * x for x in w))
        vq = [int(math.copysign(
            math.floor(abs(x / nrm) * 1e12 + 0.5), x))
            for x in w]
    v = [x / 1e12 for x in vq]
    sv = [sum(s[i][j] * v[j] for j in range(nc))
          for i in range(nr)]
    lam = sum(x * x for x in sv)
    sigma1 = math.sqrt(lam)
    r6 = _round6(np.array([sigma1, lam / inertia, inertia * n]))
    out = pd.DataFrame({"n_events": [n], "sigma1_6": [r6[0]],
                        "axis_share6": [r6[1]], "chi2_6": [r6[2]]})
    out["n_events"] = out["n_events"].astype(np.int64)
    return out


SQL_CA = f"""
WITH RECURSIVE cells AS (
  SELECT isodow(CAST(ts AS DATE)) - 1 AS dow, event_type AS et,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
dows AS (SELECT dow, row_number() OVER (ORDER BY dow) AS di
         FROM (SELECT DISTINCT dow FROM cells)),
ets AS (SELECT et, row_number() OVER (ORDER BY et) AS ej
        FROM (SELECT DISTINCT et FROM cells)),
dims AS (SELECT (SELECT count(*) FROM dows)::BIGINT AS nr,
                (SELECT count(*) FROM ets)::BIGINT AS nc,
                (SELECT sum(n) FROM cells)::BIGINT AS n),
mm AS (
  SELECT (SELECT list(coalesce(c.n, 0) ORDER BY d.di * 100 + e.ej)
          FROM dows d CROSS JOIN ets e
          LEFT JOIN cells c ON c.dow = d.dow AND c.et = e.et)
           AS ml,
         (SELECT list(r ORDER BY di)
          FROM (SELECT d2.di, sum(coalesce(c2.n, 0))::BIGINT AS r
                FROM dows d2 CROSS JOIN ets e2
                LEFT JOIN cells c2 ON c2.dow = d2.dow
                                  AND c2.et = e2.et
                GROUP BY d2.di)) AS rl,
         (SELECT list(cc ORDER BY ej)
          FROM (SELECT e3.ej, sum(coalesce(c3.n, 0))::BIGINT AS cc
                FROM dows d3 CROSS JOIN ets e3
                LEFT JOIN cells c3 ON c3.dow = d3.dow
                                  AND c3.et = e3.et
                GROUP BY e3.ej)) AS cl,
         (SELECT nr FROM dims) AS nr, (SELECT nc FROM dims) AS nc,
         (SELECT n FROM dims) AS n),
smat AS (
  SELECT nr, nc, n, rl, cl,
         [(ml[z] / CAST(n AS DOUBLE)
           - (rl[(z - 1) // nc + 1] / CAST(n AS DOUBLE))
             * (cl[(z - 1) % nc + 1] / CAST(n AS DOUBLE)))
          / sqrt((rl[(z - 1) // nc + 1] / CAST(n AS DOUBLE))
                 * (cl[(z - 1) % nc + 1] / CAST(n AS DOUBLE)))
          FOR z IN range(1, nr * nc + 1)] AS s
  FROM mm),
inert AS (
  SELECT nr, nc, n, s,
         list_sum([s[z2] * s[z2]
                   FOR z2 IN range(1, nr * nc + 1)]) AS inertia
  FROM smat),
pit AS (
  SELECT 0 AS it, nr, nc, n, s, inertia,
         [(1000000000000 // nc)::BIGINT
          FOR z3 IN range(1, nc + 1)] AS vq
  FROM inert
  UNION ALL
  SELECT it + 1, nr, nc, n, s, inertia,
         [CAST(CASE WHEN w_j >= 0
            THEN floor(abs(w_j / nrm) * 1e12 + 5e-1)
            ELSE -floor(abs(w_j / nrm) * 1e12 + 5e-1) END
            AS BIGINT)
          FOR w_j IN wl]
  FROM (
    SELECT it, nr, nc, n, s, inertia, vq,
           [list_sum([s[(ii - 1) * nc + jj]
                      * list_sum([s[(ii - 1) * nc + j2]
                                  * (vq[j2] / 1e12)
                                  FOR j2 IN range(1, nc + 1)])
                      FOR ii IN range(1, nr + 1)])
            FOR jj IN range(1, nc + 1)] AS wl
    FROM pit WHERE it < {_CA_IT}) q0,
  LATERAL (
    SELECT sqrt(list_sum([w2 * w2 FOR w2 IN q0.wl])) AS nrm) q1),
fin AS (SELECT * FROM pit WHERE it = {_CA_IT}),
lamc AS (
  SELECT n, inertia,
         list_sum([sv * sv FOR sv IN
           [list_sum([s[(i4 - 1) * nc + j4] * (vq[j4] / 1e12)
                      FOR j4 IN range(1, nc + 1)])
            FOR i4 IN range(1, nr + 1)]]) AS lam
  FROM fin)
SELECT n AS n_events, round(sqrt(lam), 6) AS sigma1_6,
       round(lam / inertia, 6) AS axis_share6,
       round(inertia * n, 6) AS chi2_6
FROM lamc
"""


# ---------------------------------------------------------------------------
# RV coefficient
# ---------------------------------------------------------------------------


def q_rv_coefficient_halves(sf_dir: str):
    """RV between half-month dow×type matrices (docstring)."""
    cells = _dowtype_cells(sf_dir, split_half=True)
    dows = sorted(cells["dow"].unique().tolist())
    ets = sorted(cells["et"].unique().tolist())
    nr, nc = len(dows), len(ets)
    x1 = np.zeros((nr, nc), dtype=object)
    x2 = np.zeros((nr, nc), dtype=object)
    for _, r in cells.iterrows():
        tgt = x1 if int(r["half"]) == 1 else x2
        tgt[dows.index(r["dow"]), ets.index(r["et"])] += \
            int(r["n"])

    def gram(x):
        return [[sum(int(x[i, a]) * int(x[i, b])
                     for i in range(nr))
                 for b in range(nc)] for a in range(nc)]

    s1 = gram(x1)
    s2 = gram(x2)
    dot = sum(s1[a][b] * s2[a][b]
              for a in range(nc) for b in range(nc))
    n1 = sum(s1[a][b] * s1[a][b]
             for a in range(nc) for b in range(nc))
    n2 = sum(s2[a][b] * s2[a][b]
             for a in range(nc) for b in range(nc))
    rv = float(dot) / (math.sqrt(float(n1))
                       * math.sqrt(float(n2)))
    out = pd.DataFrame({"nr": [nr], "nc": [nc],
                        "rv6": [_round6(np.array([rv]))[0]]})
    for col in ("nr", "nc"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RV = """
WITH days AS (
  SELECT day, row_number() OVER (ORDER BY day) AS dn
  FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)),
cells AS (
  SELECT isodow(CAST(ts AS DATE)) - 1 AS dow, event_type AS et,
         CASE WHEN d.dn <= 15 THEN 1 ELSE 2 END AS half,
         count(*)::BIGINT AS n
  FROM events e JOIN days d ON d.day = CAST(e.ts AS DATE)
  GROUP BY 1, 2, 3),
g AS (
  SELECT a.et AS ea, b.et AS eb, a.half,
         sum(a.n * b.n)::HUGEINT AS s
  FROM cells a JOIN cells b
    ON b.dow = a.dow AND b.half = a.half
  GROUP BY 1, 2, 3),
ets AS (SELECT DISTINCT et FROM cells),
pair AS (
  -- dense (ea, eb) spine: a gram entry present in only one half
  -- must still contribute its square to that half's norm
  SELECT a.et AS ea, b.et AS eb,
         coalesce((SELECT s FROM g WHERE g.ea = a.et
                   AND g.eb = b.et AND g.half = 1),
                  0::HUGEINT) AS s1,
         coalesce((SELECT s FROM g WHERE g.ea = a.et
                   AND g.eb = b.et AND g.half = 2),
                  0::HUGEINT) AS s2
  FROM ets a CROSS JOIN ets b),
f AS (
  SELECT sum(s1 * s2) AS dot, sum(s1 * s1) AS n1,
         sum(s2 * s2) AS n2,
         (SELECT count(DISTINCT dow) FROM cells)::BIGINT AS nr,
         (SELECT count(DISTINCT et) FROM cells)::BIGINT AS nc
  FROM pair)
SELECT nr, nc,
       round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(n1 AS DOUBLE))
                * sqrt(CAST(n2 AS DOUBLE))), 6) AS rv6
FROM f
"""


# ---------------------------------------------------------------------------
# Mantel test
# ---------------------------------------------------------------------------


def q_mantel_matrices_sources(sf_dir: str):
    """Mantel r between two source-similarity matrices."""
    import os
    import pyarrow.parquet as pq_

    w = _overlap_graph(sf_dir)
    from scrapy_ray.pipelines.queries174 import _srclang_cells

    cells = _srclang_cells(sf_dir)
    top5 = (cells.groupby("source")["c"].sum().reset_index()
            .sort_values(["c", "source"], ascending=[False, True])
            .head(5)["source"].tolist())
    t = pq_.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["source", "text"])
    sets: dict[str, set] = {s: set() for s in top5}
    for src, txt in zip(t["source"].to_pylist(),
                        t["text"].to_pylist()):
        if src in sets:
            ws = txt.split()
            sets[src].update(ws[i] + " " + ws[i + 1]
                             for i in range(len(ws) - 1))
    a = []
    b = []
    for i in range(5):
        for j in range(i + 1, 5):
            a.append(int(w[i, j]))
            b.append(len(sets[top5[i]] & sets[top5[j]]))
    n = len(a)
    sa, sb = sum(a), sum(b)
    saa = sum(v * v for v in a)
    sbb = sum(v * v for v in b)
    sab = sum(x * y for x, y in zip(a, b))
    num = n * sab - sa * sb
    den = math.sqrt(float(n * saa - sa * sa)) \
        * math.sqrt(float(n * sbb - sb * sb))
    r = float(num) / den
    out = pd.DataFrame({"n_pairs": [n],
                        "mantel_r6": [_round6(np.array([r]))[0]]})
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out


SQL_MANTEL = r"""
WITH cells AS (
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
ov AS (
  SELECT a.si AS i, b.si AS j,
         sum(least(a.c, b.c))::BIGINT AS w
  FROM dense a JOIN dense b ON a.lj = b.lj AND a.si < b.si
  GROUP BY 1, 2),
d5 AS (
  SELECT t.si, regexp_extract_all(d.text, '\S+') AS tk
  FROM documents d JOIN top5 t ON t.source = d.source),
sh AS (
  SELECT DISTINCT d5.si, bg.b AS s
  FROM d5,
       LATERAL unnest([d5.tk[kk] || ' ' || d5.tk[kk + 1]
                       FOR kk IN range(1, len(d5.tk))])
         AS bg(b)),
inter AS (
  SELECT a.si AS i, b.si AS j, count(*)::BIGINT AS x
  FROM sh a JOIN sh b ON b.s = a.s AND b.si > a.si
  GROUP BY 1, 2),
pairs AS (
  SELECT ov.w AS a, coalesce(inter.x, 0)::BIGINT AS b
  FROM ov LEFT JOIN inter ON inter.i = ov.i AND inter.j = ov.j),
s AS (
  SELECT count(*)::BIGINT AS n, sum(a)::BIGINT AS sa,
         sum(b)::BIGINT AS sb,
         sum(CAST(a AS HUGEINT) * a) AS saa,
         sum(CAST(b AS HUGEINT) * b) AS sbb,
         sum(CAST(a AS HUGEINT) * b) AS sab
  FROM pairs)
SELECT n AS n_pairs,
       round(CAST(n * sab - CAST(sa AS HUGEINT) * sb AS DOUBLE)
             / (sqrt(CAST(n * saa - CAST(sa AS HUGEINT) * sa
                          AS DOUBLE))
                * sqrt(CAST(n * sbb - CAST(sb AS HUGEINT) * sb
                            AS DOUBLE))), 6) AS mantel_r6
FROM s
"""


QUERIES202: dict[str, tuple] = {
    "correspondence_axis_dowtype": (q_correspondence_axis_dowtype,
                                    SQL_CA),
    "rv_coefficient_halves": (q_rv_coefficient_halves, SQL_RV),
    "mantel_matrices_sources": (q_mantel_matrices_sources,
                                SQL_MANTEL),
}
