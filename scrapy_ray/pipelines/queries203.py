"""Two-hundred-third oracle-query batch — clustering diagnostics:

- cophenetic_corr_sources: the cophenetic correlation of
  single-linkage agglomeration on the top-5 source overlap
  SIMILARITIES — 4 merges picked by max cross-cluster similarity
  with the pair encoded w·256 + (255 − (i·16+j)) so list_max IS
  the (max w, min (i,j)) rule; cophenetic heights are exact
  integers and the Pearson against the original weights clears to
  integer sums.
- hopkins_statistic_daily: the Hopkins clusterability statistic on
  the daily (clicks, views) points with INTEGER hash probes drawn
  uniformly inside the bounding box (squared-distance variant —
  documented — keeps every nearest-neighbor distance an exact
  integer); H = Σu/(Σu + Σw) in one division.
- hartigan_rule_daily: Hartigan's elbow rule H(2) =
  (W2/W3 − 1)(n − 3) from EXACT optimal 1-D 2- and 3-partitions of
  the sorted daily cents (contiguity of optimal 1-D clusters makes
  both exhaustive: 29 splits and 406 split pairs), interval SSE
  from prefix sums with identical float finalization and min-split
  tiebreaks.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries169 import _daily_xmy
from scrapy_ray.pipelines.queries179 import _overlap_graph, _SQL_GRAPH

_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503


# ---------------------------------------------------------------------------
# Cophenetic correlation
# ---------------------------------------------------------------------------


def q_cophenetic_corr_sources(sf_dir: str):
    """Single-linkage cophenetic r on overlap sims (docstring)."""
    w = _overlap_graph(sf_dir)
    lab = list(range(5))
    coph = [[0] * 5 for _ in range(5)]
    for _ in range(4):
        best = None
        for i in range(5):
            for j in range(i + 1, 5):
                if lab[i] != lab[j]:
                    key = int(w[i, j]) * 256 \
                        + (255 - (i * 16 + j))
                    if best is None or key > best[0]:
                        best = (key, i, j)
        _, bi, bj = best
        h = int(w[bi, bj])
        la, lb = lab[bi], lab[bj]
        for i in range(5):
            for j in range(i + 1, 5):
                if coph[i][j] == 0 and \
                        {lab[i], lab[j]} == {la, lb}:
                    coph[i][j] = h
        for i in range(5):
            if lab[i] == lb:
                lab[i] = la
    a = []
    b = []
    for i in range(5):
        for j in range(i + 1, 5):
            a.append(int(w[i, j]))
            b.append(coph[i][j])
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
                        "coph_sum": [sb],
                        "coph_r6": [_round6(np.array([r]))[0]]})
    for col in ("n_pairs", "coph_sum"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_COPHENETIC = f"""
WITH RECURSIVE {_SQL_GRAPH},
wm AS (
  SELECT (SELECT list(coalesce(e.w, 0) ORDER BY a.i * 10 + b.i)
          FROM (SELECT si AS i FROM top5) a
          CROSS JOIN (SELECT si AS i FROM top5) b
          LEFT JOIN edges e ON e.i = a.i AND e.j = b.i) AS wl),
agg AS (
  SELECT 0 AS step, wl,
         [ll - 1 FOR ll IN range(1, 6)] AS lab,
         [0::BIGINT FOR z IN range(1, 26)] AS coph
  FROM wm
  UNION ALL
  SELECT step + 1, wl,
         [CASE WHEN lab[m] = lb THEN la ELSE lab[m] END
          FOR m IN range(1, 6)],
         [CASE WHEN coph[z2] = 0
                    AND (z2 - 1) // 5 + 1 < (z2 - 1) % 5 + 1
                    AND ((lab[(z2 - 1) // 5 + 1] = la
                          AND lab[(z2 - 1) % 5 + 1] = lb)
                         OR (lab[(z2 - 1) // 5 + 1] = lb
                             AND lab[(z2 - 1) % 5 + 1] = la))
               THEN hh ELSE coph[z2] END
          FOR z2 IN range(1, 26)]
  FROM (
    SELECT q0.*,
           q0.best // 256 AS hh,
           q0.lab[(255 - q0.best % 256) // 16 + 1] AS la,
           q0.lab[(255 - q0.best % 256) % 16 + 1] AS lb
    FROM (
      SELECT step, wl, lab, coph,
             list_max([wl[zz] * 256
                       + (255 - (((zz - 1) // 5) * 16
                                 + ((zz - 1) % 5)))
                       FOR zz IN range(1, 26)
                       IF (zz - 1) // 5 + 1 < (zz - 1) % 5 + 1
                          AND lab[(zz - 1) // 5 + 1]
                              <> lab[(zz - 1) % 5 + 1]])
               AS best
      FROM agg WHERE step < 4) q0) q1),
fin AS (SELECT wl, coph FROM agg WHERE step = 4),
pairs AS (
  SELECT wl[(p - 1) // 5 * 5 + (p - 1) % 5 + 1] AS a,
         coph[p] AS b
  FROM fin, (SELECT unnest(range(1, 26)) AS p) pp
  WHERE (p - 1) // 5 + 1 < (p - 1) % 5 + 1),
s AS (
  SELECT count(*)::BIGINT AS n, sum(a)::BIGINT AS sa,
         sum(b)::BIGINT AS sb,
         sum(CAST(a AS HUGEINT) * a) AS saa,
         sum(CAST(b AS HUGEINT) * b) AS sbb,
         sum(CAST(a AS HUGEINT) * b) AS sab
  FROM pairs)
SELECT n AS n_pairs, sb AS coph_sum,
       round(CAST(n * sab - CAST(sa AS HUGEINT) * sb AS DOUBLE)
             / (sqrt(CAST(n * saa - CAST(sa AS HUGEINT) * sa
                          AS DOUBLE))
                * sqrt(CAST(n * sbb - CAST(sb AS HUGEINT) * sb
                            AS DOUBLE))), 6) AS coph_r6
FROM s
"""


# ---------------------------------------------------------------------------
# Hopkins statistic
# ---------------------------------------------------------------------------


def q_hopkins_statistic_daily(sf_dir: str):
    """Squared-distance Hopkins with integer hash probes."""
    dly = _daily_xmy(sf_dir)
    xs = [int(v) for v in dly["x"]]
    ys = [int(v) for v in dly["m"]]
    n = len(xs)
    xmin, xmax = min(xs), max(xs)
    ymin, ymax = min(ys), max(ys)

    def h(i: int) -> int:
        return ((i % _H_MOD) * _H_MULT + _H_STEP) % _H_MOD

    su = 0
    for j in range(1, n + 1):
        px = xmin + h(2 * j) % (xmax - xmin + 1)
        py = ymin + h(2 * j + 1) % (ymax - ymin + 1)
        su += min((px - a) ** 2 + (py - b) ** 2
                  for a, b in zip(xs, ys))
    sw = 0
    for j in range(n):
        sw += min((xs[j] - xs[i]) ** 2 + (ys[j] - ys[i]) ** 2
                  for i in range(n) if i != j)
    hst = float(su) / float(su + sw)
    out = pd.DataFrame({"n_points": [n], "sum_u": [su],
                        "sum_w": [sw],
                        "hopkins6": [_round6(np.array([hst]))[0]]})
    for col in ("n_points", "sum_u", "sum_w"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HOPKINS = f"""
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'view')::INT)::BIGINT AS y
  FROM events GROUP BY 1),
bb AS (
  SELECT min(x) AS xmin, max(x) AS xmax, min(y) AS ymin,
         max(y) AS ymax, count(*)::BIGINT AS n
  FROM dly),
probes AS (
  SELECT j.j,
         bb.xmin + CAST((2 * j.j * {_H_MULT} + {_H_STEP})
                        % {_H_MOD} AS BIGINT)
                   % (bb.xmax - bb.xmin + 1) AS px,
         bb.ymin + CAST(((2 * j.j + 1) * {_H_MULT} + {_H_STEP})
                        % {_H_MOD} AS BIGINT)
                   % (bb.ymax - bb.ymin + 1) AS py
  FROM bb, unnest(range(1, bb.n + 1)) AS j(j)
  WHERE j.j <= bb.n),
su AS (
  SELECT sum(m)::BIGINT AS su
  FROM (SELECT p.j,
               min((p.px - d.x) * (p.px - d.x)
                   + (p.py - d.y) * (p.py - d.y)) AS m
        FROM probes p, dly d GROUP BY p.j)),
sw AS (
  SELECT sum(m)::BIGINT AS sw
  FROM (SELECT a.day,
               min((a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y)) AS m
        FROM dly a JOIN dly b ON a.day <> b.day
        GROUP BY a.day))
SELECT (SELECT n FROM bb) AS n_points,
       (SELECT su FROM su) AS sum_u, (SELECT sw FROM sw) AS sum_w,
       round(CAST((SELECT su FROM su) AS DOUBLE)
             / CAST((SELECT su FROM su)
                    + (SELECT sw FROM sw) AS DOUBLE), 6)
         AS hopkins6
"""


# ---------------------------------------------------------------------------
# Hartigan's rule
# ---------------------------------------------------------------------------


def q_hartigan_rule_daily(sf_dir: str):
    """H(2) from exact optimal 1-D partitions (docstring)."""
    dly = _daily_xmy(sf_dir)
    y = sorted(int(v) for v in dly["y"])
    n = len(y)
    pre = [0]
    pre2 = [0]
    for v in y:
        pre.append(pre[-1] + v)
        pre2.append(pre2[-1] + v * v)

    def sse(lo: int, hi: int) -> float:
        # interval [lo, hi) 0-based
        m = hi - lo
        s = pre[hi] - pre[lo]
        ss = pre2[hi] - pre2[lo]
        return (float(m * ss - s * s) / float(m)) / 100.0

    w1 = sse(0, n)
    w2 = None
    for s1 in range(1, n):
        cost = sse(0, s1) + sse(s1, n)
        if w2 is None or cost < w2:
            w2 = cost
    w3 = None
    for s1 in range(1, n - 1):
        for s2 in range(s1 + 1, n):
            cost = sse(0, s1) + sse(s1, s2) + sse(s2, n)
            if w3 is None or cost < w3:
                w3 = cost
    h2 = (w2 / w3 - 1.0) * (n - 3)
    # report W's in 1e8-scaled units: raw values are ~3e10 where a
    # single double ulp (~4e-6) exceeds the 1e-6 rounding grain
    r6 = _round6(np.array([w1 / 1e8, w2 / 1e8, w3 / 1e8, h2]))
    out = pd.DataFrame({"n_days": [n], "w1_6": [r6[0]],
                        "w2_6": [r6[1]], "w3_6": [r6[2]],
                        "hartigan2_6": [r6[3]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_HARTIGAN = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
srt AS (SELECT y, row_number() OVER (ORDER BY y) AS i FROM dly),
pre AS (
  SELECT i, y,
         sum(y) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS p,
         sum(CAST(y AS HUGEINT) * y)
           OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS p2
  FROM srt),
n AS (SELECT count(*)::BIGINT AS n FROM srt),
iv AS (
  -- SSE of [lo+1 .. hi] (1-based inclusive) for every interval
  SELECT lo.l AS lo, hi.h AS hi,
         (CAST((hi.h - lo.l)
               * ((SELECT p2 FROM pre WHERE i = hi.h)
                  - coalesce((SELECT p2 FROM pre
                              WHERE i = lo.l), 0))
               - ((SELECT p FROM pre WHERE i = hi.h)
                  - coalesce((SELECT p FROM pre
                              WHERE i = lo.l), 0))::HUGEINT
                 * ((SELECT p FROM pre WHERE i = hi.h)
                    - coalesce((SELECT p FROM pre
                                WHERE i = lo.l), 0))
               AS DOUBLE)
          / CAST(hi.h - lo.l AS DOUBLE)) / 100.0 AS sse
  FROM (SELECT unnest(range(0, (SELECT n FROM n) + 1)) AS l) lo,
       (SELECT unnest(range(1, (SELECT n FROM n) + 1)) AS h) hi
  WHERE hi.h > lo.l),
w1 AS (SELECT sse AS w FROM iv, n
       WHERE lo = 0 AND hi = n.n),
w2 AS (
  SELECT min(a.sse + b.sse) AS w
  FROM iv a JOIN iv b ON b.lo = a.hi, n
  WHERE a.lo = 0 AND b.hi = n.n),
w3 AS (
  SELECT min(a.sse + b.sse + c.sse) AS w
  FROM iv a JOIN iv b ON b.lo = a.hi
       JOIN iv c ON c.lo = b.hi, n
  WHERE a.lo = 0 AND c.hi = n.n AND b.hi < n.n AND a.hi >= 1)
SELECT (SELECT n FROM n) AS n_days,
       round((SELECT w FROM w1) / 1e8, 6) AS w1_6,
       round((SELECT w FROM w2) / 1e8, 6) AS w2_6,
       round((SELECT w FROM w3) / 1e8, 6) AS w3_6,
       round(((SELECT w FROM w2) / (SELECT w FROM w3) - 1.0)
             * ((SELECT n FROM n) - 3), 6) AS hartigan2_6
"""


QUERIES203: dict[str, tuple] = {
    "cophenetic_corr_sources": (q_cophenetic_corr_sources,
                                SQL_COPHENETIC),
    "hopkins_statistic_daily": (q_hopkins_statistic_daily,
                                SQL_HOPKINS),
    "hartigan_rule_daily": (q_hartigan_rule_daily, SQL_HARTIGAN),
}
