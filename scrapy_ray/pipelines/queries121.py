"""One-hundred-twenty-first oracle-query batch — post-hoc multiple
comparisons after the one-way layout (event-type groups of value):

- tukey_hsd_value_types: all 10 pairwise Tukey HSD q statistics
  between event-type mean value cents. Per-group (n, Σcents, Σcents²)
  are exact ints; the within SS per group clears to
  (n·Q − S²)/n — one double division, 1e-6-quantized (HUGEINT) before
  the exact cross-group sum; MSE and every q finalize through
  identical float expressions.
- dunn_posthoc_types: Dunn's rank post-hoc (Kruskal-Wallis follow-up)
  for all pairs. Doubled midranks off the global value-cents
  histogram keep per-group rank sums exact integers; the tie
  correction Σ(t³−t) is an exact (object-int) sum; z_ij finalizes as
  |Rbar_i − Rbar_j| / sqrt(V·(1/n_i + 1/n_j)) with
  V = N(N+1)/12 − T/(12(N−1)).
- bartlett_variance_types: Bartlett's homogeneity-of-variance T.
  Per-group sample variance clears to (n·Q − S²)/(n(n−1)), quantized
  once at 1e-6; the pooled variance numerator Σ(n_i−1)·s6_i is an
  exact integer; the Σ(n_i−1)·ln(s²) and Σ1/(n_i−1) float sums are
  per-group-quantized (1e-6 / 1e-15) so the 5-term sums are exact and
  order-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _rint(x: float) -> int:
    """round-half-away-from-zero of a double, as an exact Python int
    (matches DuckDB round())."""
    return int(np.sign(x) * np.floor(np.abs(x) + 0.5))


def _type_moments(sf_dir: str) -> pd.DataFrame:
    """Per-event-type exact (n, Σcents, Σcents²), type-sorted."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def mpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        df = pd.DataFrame({"t": et, "n": np.int64(1), "s": cents,
                           "q": cents * cents})
        g = df.groupby("t", sort=False).sum().reset_index()
        for col in ("n", "s", "q"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(mpart, batch_format="pyarrow")
              .groupby("t").aggregate(Sum("n", alias_name="n"),
                                      Sum("s", alias_name="s"),
                                      Sum("q", alias_name="q"))
              .to_pandas().sort_values("t").reset_index(drop=True))


# ---------------------------------------------------------------------------
# Tukey HSD
# ---------------------------------------------------------------------------


def q_tukey_hsd_value_types(sf_dir: str):
    """Pairwise Tukey HSD q statistics (docstring above)."""
    g = _type_moments(sf_dir)
    ts = list(g["t"])
    n = [int(x) for x in g["n"]]
    s = [int(x) for x in g["s"]]
    q = [int(x) for x in g["q"]]
    k = len(ts)
    nn = sum(n)
    # within SS per group, one double division, quantized once
    ssw6 = 0
    for i in range(k):
        a = n[i] * q[i] - s[i] * s[i]          # exact python int
        ssw6 += _rint(float(a) / float(n[i]) * 1000000.0)
    mse = float(ssw6) / 1000000.0 / float(nn - k)
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            mi = float(s[i]) / float(n[i])
            mj = float(s[j]) / float(n[j])
            qs = abs(mi - mj) / np.sqrt(
                mse / 2.0 * (1.0 / float(n[i]) + 1.0 / float(n[j])))
            rows.append((ts[i], ts[j], n[i], n[j],
                         _round6(np.array([qs]))[0]))
    out = pd.DataFrame(rows, columns=["t1", "t2", "n1", "n2", "q6"])
    for col in ("n1", "n2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_TUKEY_HSD = """
WITH g AS (
  SELECT event_type AS t, count(*)::BIGINT AS n,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS s,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
             * CAST(round(value * 100) AS BIGINT)) AS q
  FROM events GROUP BY 1),
tot AS (SELECT sum(n)::BIGINT AS nn, count(*)::BIGINT AS k FROM g),
aq AS (
  SELECT sum(CAST(round(
           CAST(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s AS DOUBLE)
           / CAST(n AS DOUBLE) * 1000000.0) AS HUGEINT)) AS ssw6
  FROM g),
ms AS (
  SELECT CAST(ssw6 AS DOUBLE) / 1000000.0 / CAST(nn - k AS DOUBLE) AS mse
  FROM aq CROSS JOIN tot)
SELECT g1.t AS t1, g2.t AS t2, g1.n AS n1, g2.n AS n2,
       round(abs(CAST(g1.s AS DOUBLE) / CAST(g1.n AS DOUBLE)
                 - CAST(g2.s AS DOUBLE) / CAST(g2.n AS DOUBLE))
             / sqrt(mse / 2.0 * (1.0 / CAST(g1.n AS DOUBLE)
                                 + 1.0 / CAST(g2.n AS DOUBLE))), 6) AS q6
FROM g g1 JOIN g g2 ON g1.t < g2.t CROSS JOIN ms
ORDER BY t1, t2
"""


# ---------------------------------------------------------------------------
# Dunn's post-hoc
# ---------------------------------------------------------------------------


def q_dunn_posthoc_types(sf_dir: str):
    """Dunn's rank-based pairwise z statistics (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])
    types = ["click", "error", "purchase", "signup", "view"]

    def hpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        cols = {"cents": cents}
        for i, ty in enumerate(types):
            cols[f"c{i}"] = (et == ty).astype(np.int64)
        df = pd.DataFrame(cols)
        g = df.groupby("cents", sort=False).sum().reset_index()
        for i in range(len(types)):
            g[f"c{i}"] = g[f"c{i}"].astype(np.int64)
        return _strip(g)

    aggs = [Sum(f"c{i}", alias_name=f"c{i}") for i in range(len(types))]
    h = (ds.map_batches(hpart, batch_format="pyarrow")
           .groupby("cents").aggregate(*aggs)
           .to_pandas().sort_values("cents").reset_index(drop=True))
    cs = [h[f"c{i}"].to_numpy(np.int64) for i in range(len(types))]
    tot = np.sum(cs, axis=0)
    cum = np.concatenate(([0], np.cumsum(tot)[:-1]))
    dd = 2 * cum + tot + 1                       # doubled midranks
    n = [int(c.sum()) for c in cs]
    nn = sum(n)
    # exact doubled rank sums and tie correction (object math)
    d = [int((c.astype(object) * dd.astype(object)).sum()) for c in cs]
    to = tot.astype(object)
    tie = int(((to ** 3) - to).sum())
    vv = (float(nn * (nn + 1)) / 12.0
          - float(tie) / (12.0 * float(nn - 1)))
    rows = []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            rbi = float(d[i]) / (2.0 * float(n[i]))
            rbj = float(d[j]) / (2.0 * float(n[j]))
            z = abs(rbi - rbj) / np.sqrt(
                vv * (1.0 / float(n[i]) + 1.0 / float(n[j])))
            rows.append((types[i], types[j], n[i], n[j],
                         _round6(np.array([z]))[0]))
    out = pd.DataFrame(rows, columns=["t1", "t2", "n1", "n2", "z6"])
    for col in ("n1", "n2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_DUNN_POSTHOC = """
WITH cn AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type AS t,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
tt AS (SELECT cents, sum(c)::BIGINT AS tot FROM cn GROUP BY 1),
mr AS (
  SELECT cents,
         2 * coalesce(sum(tot) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + tot + 1 AS dd
  FROM tt),
pg AS (
  SELECT cn.t, sum(cn.c)::BIGINT AS n,
         sum(CAST(cn.c AS HUGEINT) * mr.dd) AS d
  FROM cn JOIN mr USING (cents) GROUP BY 1),
gt AS (
  SELECT sum(tot)::BIGINT AS nn,
         sum(CAST(tot AS HUGEINT) * CAST(tot AS HUGEINT)
             * CAST(tot AS HUGEINT) - CAST(tot AS HUGEINT)) AS tie
  FROM tt),
vf AS (
  SELECT nn,
         CAST(CAST(nn AS HUGEINT) * (nn + 1) AS DOUBLE) / 12.0
           - CAST(tie AS DOUBLE) / (12.0 * CAST(nn - 1 AS DOUBLE)) AS vv
  FROM gt)
SELECT p1.t AS t1, p2.t AS t2, p1.n AS n1, p2.n AS n2,
       round(abs(CAST(p1.d AS DOUBLE) / (2.0 * CAST(p1.n AS DOUBLE))
                 - CAST(p2.d AS DOUBLE) / (2.0 * CAST(p2.n AS DOUBLE)))
             / sqrt(vv * (1.0 / CAST(p1.n AS DOUBLE)
                          + 1.0 / CAST(p2.n AS DOUBLE))), 6) AS z6
FROM pg p1 JOIN pg p2 ON p1.t < p2.t CROSS JOIN vf
ORDER BY t1, t2
"""


# ---------------------------------------------------------------------------
# Bartlett's test
# ---------------------------------------------------------------------------


def q_bartlett_variance_types(sf_dir: str):
    """Bartlett homogeneity-of-variance statistic (docstring above)."""
    g = _type_moments(sf_dir)
    n = [int(x) for x in g["n"]]
    s = [int(x) for x in g["s"]]
    q = [int(x) for x in g["q"]]
    k = len(n)
    nn = sum(n)
    num = 0          # Σ (n_i-1)·s6_i   (exact int)
    sg = 0           # Σ round((n_i-1)·ln(s²_q)·1e6)
    si = 0           # Σ round(1/(n_i-1)·1e15)
    for i in range(k):
        a = n[i] * q[i] - s[i] * s[i]
        s6 = _rint(float(a) / (float(n[i]) * float(n[i] - 1))
                   * 1000000.0)
        num += (n[i] - 1) * s6
        sg += _rint(float(n[i] - 1)
                    * np.log(float(s6) / 1000000.0) * 1000000.0)
        si += _rint(1.0 / float(n[i] - 1) * 1000000000000000.0)
    sp2 = float(num) / 1000000.0 / float(nn - k)
    cf = 1.0 + (float(si) / 1000000000000000.0
                - 1.0 / float(nn - k)) / (3.0 * float(k - 1))
    tstat = (float(nn - k) * np.log(sp2)
             - float(sg) / 1000000.0) / cf
    out = pd.DataFrame({"k": [k], "n_total": [nn],
                        "sp2_6": [_round6(np.array([sp2]))[0]],
                        "t6": [_round6(np.array([tstat]))[0]]})
    for col in ("k", "n_total"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BARTLETT = """
WITH g AS (
  SELECT event_type AS t, count(*)::BIGINT AS n,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS s,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
             * CAST(round(value * 100) AS BIGINT)) AS q
  FROM events GROUP BY 1),
pa AS (
  SELECT t, n,
         CAST(round(
           CAST(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
           * 1000000.0) AS HUGEINT) AS s6
  FROM g),
ag AS (
  SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
         sum(CAST(n - 1 AS HUGEINT) * s6) AS num,
         sum(CAST(round(CAST(n - 1 AS DOUBLE)
               * ln(CAST(s6 AS DOUBLE) / 1000000.0)
               * 1000000.0) AS BIGINT))::BIGINT AS sg,
         sum(CAST(round(1.0 / CAST(n - 1 AS DOUBLE)
               * 1000000000000000.0) AS BIGINT))::BIGINT AS si
  FROM pa),
f AS (
  SELECT k, nn, sg,
         CAST(num AS DOUBLE) / 1000000.0 / CAST(nn - k AS DOUBLE) AS sp2,
         1.0 + (CAST(si AS DOUBLE) / 1000000000000000.0
                - 1.0 / CAST(nn - k AS DOUBLE))
               / (3.0 * CAST(k - 1 AS DOUBLE)) AS cf
  FROM ag)
SELECT k, nn AS n_total, round(sp2, 6) AS sp2_6,
       round((CAST(nn - k AS DOUBLE) * ln(sp2)
              - CAST(sg AS DOUBLE) / 1000000.0) / cf, 6) AS t6
FROM f
"""


QUERIES121: dict[str, tuple] = {
    "tukey_hsd_value_types": (q_tukey_hsd_value_types, SQL_TUKEY_HSD),
    "dunn_posthoc_types": (q_dunn_posthoc_types, SQL_DUNN_POSTHOC),
    "bartlett_variance_types": (q_bartlett_variance_types, SQL_BARTLETT),
}
