"""One-hundred-ninety-first oracle-query batch — the remaining
classical nonparametric tests, all integer-cleared:

- kendalls_w_types: Kendall's coefficient of concordance over the
  30 daily tie-free rankings of the 5 event types (count desc, type
  asc) — S = Σ(R_j − m(n+1)/2)² is a pure integer, W = 12S/(m²(n³−n))
  and χ² = m(n−1)W finalize in one division each.
- bowker_symmetry_types: the McNemar–Bowker symmetry test on the
  event-type transition matrix (per-user consecutive pairs) —
  Σ_{a<b}(n_ab − n_ba)²/(n_ab + n_ba) with per-pair terms
  nano-quantized before summing (zero-denominator pairs skipped and
  counted; df adjusts).
- quade_test_types: the Quade test (range-weighted Friedman) on the
  daily type counts — day weights Q_i = rank of the daily count
  range (ties by day), S_ij = Q_i·(r_ij − 3) all integers, and
  F = (m−1)·ΣS_j² / (m·A − ΣS_j²) from two exact integer sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries187 import _daily_rankings
from scrapy_ray.pipelines.queries178 import _transition_counts


def _daily_count_cells(sf_dir: str) -> pd.DataFrame:
    """(day, et, n) dense cells via the queries187 machinery's
    distributed aggregation (absent types get 0)."""
    from ray.data.aggregate import Sum
    from scrapy_ray.pipelines.queries47 import _strip

    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist())
        g = pd.DataFrame({"day": day, "et": et,
                          "n": np.int64(1)}) \
            .groupby(["day", "et"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby(["day", "et"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    names = sorted(cells["et"].unique().tolist())
    days = sorted(cells["day"].unique().tolist())
    dense = pd.MultiIndex.from_product(
        [days, names], names=["day", "et"]).to_frame(index=False)
    dense = dense.merge(cells, on=["day", "et"], how="left") \
        .fillna({"n": 0})
    dense["n"] = dense["n"].astype(np.int64)
    return dense


# ---------------------------------------------------------------------------
# Kendall's W
# ---------------------------------------------------------------------------


def q_kendalls_w_types(sf_dir: str):
    """Concordance of the daily type rankings (docstring)."""
    names, ranks = _daily_rankings(sf_dir)
    k = len(names)
    m = len(ranks)
    rsum = [0] * (k + 1)
    for r in ranks:
        for pos, t in enumerate(r, start=1):
            rsum[t] += pos
    mean2 = m * (k + 1)            # 2x the mean rank sum
    s4 = sum((2 * rsum[t] - mean2) ** 2 for t in range(1, k + 1))
    # S = s4/4; W = 12S / (m^2 (k^3 - k)) = 3*s4 / (m^2 (k^3-k))
    w = 3.0 * float(s4) / float(m * m * (k ** 3 - k))
    chi2 = float(m * (k - 1)) * w
    r6 = _round6(np.array([w, chi2]))
    out = pd.DataFrame({"m_days": [m], "k_types": [k],
                        "s4": [s4], "w6": [r6[0]],
                        "chi2_6": [r6[1]]})
    for col in ("m_days", "k_types", "s4"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KENDALL_W = """
WITH cells AS (
  SELECT CAST(ts AS DATE) AS day, event_type AS et,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
types AS (
  SELECT et, row_number() OVER (ORDER BY et) AS ti
  FROM (SELECT DISTINCT et FROM cells)),
days AS (SELECT DISTINCT day FROM cells),
dense AS (
  SELECT d.day, t.et, t.ti, coalesce(c.n, 0)::BIGINT AS n
  FROM days d CROSS JOIN types t
  LEFT JOIN cells c ON c.day = d.day AND c.et = t.et),
rk AS (
  SELECT day, ti,
         row_number() OVER (PARTITION BY day
                            ORDER BY n DESC, et) AS pos
  FROM dense),
dims AS (
  SELECT (SELECT count(*) FROM days)::BIGINT AS m,
         (SELECT count(*) FROM types)::BIGINT AS k),
rs AS (SELECT ti, sum(pos)::BIGINT AS r FROM rk GROUP BY ti),
s AS (
  SELECT sum((2 * r - (SELECT m * (k + 1) FROM dims))
             * (2 * r - (SELECT m * (k + 1) FROM dims)))::BIGINT
           AS s4
  FROM rs),
f AS (
  SELECT d.m, d.k, s.s4,
         3.0 * CAST(s.s4 AS DOUBLE)
           / CAST(d.m * d.m * (d.k * d.k * d.k - d.k) AS DOUBLE)
           AS w
  FROM dims d, s)
SELECT m AS m_days, k AS k_types, s4,
       round(w, 6) AS w6,
       round(CAST(m * (k - 1) AS DOUBLE) * w, 6) AS chi2_6
FROM f
"""


# ---------------------------------------------------------------------------
# Bowker symmetry
# ---------------------------------------------------------------------------


def q_bowker_symmetry_types(sf_dir: str):
    """Bowker symmetry chi-square on transitions (docstring)."""
    import math

    names, cm = _transition_counts(sf_dir)
    k = len(names)
    chi_q = 0
    used = 0
    skipped = 0
    for a in range(k):
        for b in range(a + 1, k):
            nab = int(cm[a, b])
            nba = int(cm[b, a])
            if nab + nba == 0:
                skipped += 1
                continue
            used += 1
            term = float((nab - nba) ** 2) / float(nab + nba)
            chi_q += int(math.floor(term * 1e9 + 0.5))
    out = pd.DataFrame({"df": [used], "n_skipped": [skipped],
                        "chi2_6": [_round6(np.array(
                            [float(chi_q) / 1e9]))[0]]})
    for col in ("df", "n_skipped"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BOWKER = """
WITH tr AS (
  SELECT a, b, count(*)::BIGINT AS n
  FROM (
    SELECT lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS a,
           event_type AS b
    FROM events)
  WHERE a IS NOT NULL GROUP BY a, b),
types AS (SELECT DISTINCT a AS s FROM tr
          UNION SELECT DISTINCT b FROM tr),
pairs AS (
  SELECT x.s AS a, y.s AS b,
         coalesce((SELECT n FROM tr
                   WHERE tr.a = x.s AND tr.b = y.s), 0) AS nab,
         coalesce((SELECT n FROM tr
                   WHERE tr.a = y.s AND tr.b = x.s), 0) AS nba
  FROM types x JOIN types y ON x.s < y.s),
q AS (
  SELECT sum(CASE WHEN nab + nba > 0 THEN 1 ELSE 0 END)::BIGINT
           AS used,
         sum(CASE WHEN nab + nba = 0 THEN 1 ELSE 0 END)::BIGINT
           AS skipped,
         sum(CASE WHEN nab + nba > 0 THEN
               CAST(floor(CAST((nab - nba) * (nab - nba)
                               AS DOUBLE)
                          / CAST(nab + nba AS DOUBLE)
                          * 1e9 + 5e-1) AS BIGINT)
             ELSE 0 END)::BIGINT AS chi_q
  FROM pairs)
SELECT used AS df, skipped AS n_skipped,
       round(CAST(chi_q AS DOUBLE) / 1e9, 6) AS chi2_6
FROM q
"""


# ---------------------------------------------------------------------------
# Quade test
# ---------------------------------------------------------------------------


def q_quade_test_types(sf_dir: str):
    """Range-weighted Friedman (Quade) on daily counts."""
    dense = _daily_count_cells(sf_dir)
    days = sorted(dense["day"].unique().tolist())
    names = sorted(dense["et"].unique().tolist())
    k = len(names)
    m = len(days)
    piv = dense.pivot(index="day", columns="et",
                      values="n").loc[days, names]
    counts = piv.to_numpy(np.int64)
    rngs = counts.max(axis=1) - counts.min(axis=1)
    qrank = np.zeros(m, np.int64)
    order = np.lexsort((np.arange(m), rngs))
    for pos, i in enumerate(order, start=1):
        qrank[i] = pos
    a_sum = 0
    sj = [0] * k
    for i in range(m):
        row = counts[i]
        rr = np.zeros(k, np.int64)
        ro = np.lexsort((np.arange(k), row))
        for pos, j in enumerate(ro, start=1):
            rr[j] = pos
        for j in range(k):
            s_ij = int(qrank[i]) * (int(rr[j]) * 2 - (k + 1))
            # doubled centered rank keeps integers for even k+1
            a_sum += s_ij * s_ij
            sj[j] += s_ij
    b4 = sum(v * v for v in sj)
    f = (float(m - 1) * float(b4)
         / (float(m) * float(a_sum) - float(b4)))
    r6 = _round6(np.array([f]))[0]
    out = pd.DataFrame({"m_days": [m], "k_types": [k],
                        "a_sum": [a_sum], "b_sum": [b4],
                        "f6": [r6]})
    for col in ("m_days", "k_types", "a_sum", "b_sum"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_QUADE = """
WITH cells AS (
  SELECT CAST(ts AS DATE) AS day, event_type AS et,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
types AS (SELECT DISTINCT et FROM cells),
days AS (SELECT DISTINCT day FROM cells),
dense AS (
  SELECT d.day, t.et, coalesce(c.n, 0)::BIGINT AS n
  FROM days d CROSS JOIN types t
  LEFT JOIN cells c ON c.day = d.day AND c.et = t.et),
rng AS (
  SELECT day, max(n) - min(n) AS rg FROM dense GROUP BY day),
qr AS (
  SELECT day, row_number() OVER (ORDER BY rg, day) AS q
  FROM rng),
rr AS (
  SELECT day, et,
         row_number() OVER (PARTITION BY day
                            ORDER BY n, et) AS r
  FROM dense),
dims AS (
  SELECT (SELECT count(*) FROM days)::BIGINT AS m,
         (SELECT count(*) FROM types)::BIGINT AS k),
sij AS (
  SELECT rr.et,
         qr.q * (rr.r * 2 - ((SELECT k FROM dims) + 1)) AS s
  FROM rr JOIN qr ON qr.day = rr.day),
agg AS (
  SELECT sum(s * s)::BIGINT AS a_sum FROM sij),
sjs AS (SELECT et, sum(s)::BIGINT AS sj FROM sij GROUP BY et),
b AS (SELECT sum(sj * sj)::BIGINT AS b4 FROM sjs)
SELECT (SELECT m FROM dims) AS m_days,
       (SELECT k FROM dims) AS k_types,
       (SELECT a_sum FROM agg) AS a_sum,
       (SELECT b4 FROM b) AS b_sum,
       round(CAST(((SELECT m FROM dims) - 1) AS DOUBLE)
             * CAST((SELECT b4 FROM b) AS DOUBLE)
             / (CAST((SELECT m FROM dims) AS DOUBLE)
                * CAST((SELECT a_sum FROM agg) AS DOUBLE)
                - CAST((SELECT b4 FROM b) AS DOUBLE)), 6) AS f6
FROM (SELECT 1)
"""


QUERIES191: dict[str, tuple] = {
    "kendalls_w_types": (q_kendalls_w_types, SQL_KENDALL_W),
    "bowker_symmetry_types": (q_bowker_symmetry_types, SQL_BOWKER),
    "quade_test_types": (q_quade_test_types, SQL_QUADE),
}
