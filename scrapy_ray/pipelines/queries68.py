"""Sixty-eighth oracle-query batch — extreme-value tail trio on order
totalprice, complementing the Gumbel block-maxima fit (queries44) with
the order-statistics and peaks-over-threshold estimators:

- hill_tail_orders: Hill tail-index estimator over the top k=100 order
  statistics: H = (1/k) SUM ln(x_(i)/x_(k+1)), alpha = 1/H.  The top
  101 cents values reduce via per-block vectorized partial top-k
  (np.partition) -> tiny driver merge (k * n_blocks rows) — no global
  sort shuffle.  Each log term is quantized to 1e-6 nats
  (round half-away-from-zero; all terms >= 0 by construction) and
  integer-summed, so hill_q is exact and H/alpha finalize
  identical-expression.  Probe sf0.001: x_(101) cents = 46_598_032,
  hill_q = 3_469_653, alpha = 28.82; sf0.01: alpha = 332.2 (the
  bounded-uniform totalprice is thin-tailed — large alpha expected,
  statistic still discriminative).
- pickands_tail_orders: Pickands xi from x_(25), x_(50), x_(100):
  xi = ln((x25-x50)/(x50-x100)) / ln(2).  Same top-101 gather; the
  three order statistics are exact ints (probe: strictly decreasing
  at both sf — no zero denominator), xi finalizes
  identical-expression.  Probe sf0.001: xi = -0.572420; sf0.01:
  xi = -0.694557 (negative = finite right endpoint, correct for a
  bounded distribution).
- gpd_tail_orders: GPD method-of-moments fit to excesses over the
  exact 95th-percentile dollar threshold (quantile_disc semantics:
  element at 1-based rank ceil(0.95*n), computed from the bounded
  floor-dollar histogram — DuckDB quantile_disc matches per the
  working notes).  Excess moments S1 = SUM (d-u), S2 = SUM (d-u)^2
  ride the histogram as exact ints; xi = (1 - mbar^2/s2)/2 and
  sigma = mbar*(1 + mbar^2/s2)/2 finalize identical-expression with
  sample variance s2 = (ne*S2 - S1^2)/(ne*(ne-1)) cast from exact
  integers (HUGEINT territory at sf0.1: ne*S2 ~ 1e16).  Probe
  sf0.001: u=$472457, ne=75, xi=-1.194, sigma=31810; sf0.01:
  xi=-0.971, sigma=24070.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_TOPK = 101


def _top_cents(sf_dir: str) -> np.ndarray:
    """Top-_TOPK o_totalprice cents, descending — per-block partial
    top-k (np.partition), then a tiny driver merge."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(c) > _TOPK:
            c = np.partition(c, len(c) - _TOPK)[-_TOPK:]
        return pa.table({"c": pa.array(np.sort(c)[::-1])})

    allc = (ds.map_batches(part, batch_format="pyarrow")
              .to_pandas()["c"].to_numpy(np.int64))
    return np.sort(allc)[::-1][:_TOPK]


# ---------------------------------------------------------------------------
# Hill estimator
# ---------------------------------------------------------------------------


def q_hill_tail_orders(sf_dir: str):
    """Hill tail index over the top-100 order values (docstring
    above)."""
    c = _top_cents(sf_dir)
    k = _TOPK - 1
    ck = int(c[k])
    # math.log (libm), not np.log — the ln-parity rule vs DuckDB; k=100
    # scalar calls are free.  All terms >= 0, so half-away == floor(x+.5).
    hill_q = sum(int(math.floor(math.log(float(int(v)) / float(ck))
                                * 1e6 + 0.5)) for v in c[:k])
    hill6 = _round6(np.array([float(hill_q) / 100000000.0]))[0]
    alpha6 = _round6(np.array([100000000.0 / float(hill_q)]))[0]
    out = pd.DataFrame({"k": [k], "ck": [ck], "hill_q": [hill_q],
                        "hill6": [hill6], "alpha6": [alpha6]})
    for col in ("k", "ck", "hill_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HILL = f"""
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders ORDER BY 1 DESC LIMIT {_TOPK}),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC) AS rn FROM c),
kv AS (SELECT c AS ck FROM r WHERE rn = {_TOPK}),
t AS (
  SELECT sum(CAST(round(ln(CAST(r.c AS DOUBLE) / CAST(kv.ck AS DOUBLE))
                        * 1000000) AS BIGINT))::BIGINT AS hill_q
  FROM r CROSS JOIN kv WHERE rn <= {_TOPK - 1})
SELECT {_TOPK - 1}::BIGINT AS k, ck, hill_q,
       round(CAST(hill_q AS DOUBLE) / 100000000.0, 6) AS hill6,
       round(100000000.0 / CAST(hill_q AS DOUBLE), 6) AS alpha6
FROM t CROSS JOIN kv
"""


# ---------------------------------------------------------------------------
# Pickands estimator
# ---------------------------------------------------------------------------


def q_pickands_tail_orders(sf_dir: str):
    """Pickands xi from the 25/50/100-th order statistics (docstring
    above)."""
    c = _top_cents(sf_dir)
    x25, x50, x100 = int(c[24]), int(c[49]), int(c[99])
    xi = math.log(float(x25 - x50) / float(x50 - x100)) / math.log(2.0)
    out = pd.DataFrame({"x25": [x25], "x50": [x50], "x100": [x100],
                        "xi6": [_round6(np.array([xi]))[0]]})
    for col in ("x25", "x50", "x100"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PICKANDS = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders ORDER BY 1 DESC LIMIT 101),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC) AS rn FROM c),
x AS (
  SELECT max(CASE WHEN rn = 25 THEN c END) AS x25,
         max(CASE WHEN rn = 50 THEN c END) AS x50,
         max(CASE WHEN rn = 100 THEN c END) AS x100
  FROM r)
SELECT x25, x50, x100,
       round(ln(CAST(x25 - x50 AS DOUBLE) / CAST(x50 - x100 AS DOUBLE))
             / ln(2.0), 6) AS xi6
FROM x
"""


# ---------------------------------------------------------------------------
# GPD peaks-over-threshold
# ---------------------------------------------------------------------------


def q_gpd_tail_orders(sf_dir: str):
    """GPD method-of-moments fit to excesses over the exact p95 dollar
    threshold (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        d = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        df = pd.DataFrame({"d": d})
        out = df.groupby("d", sort=False).size().reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype(np.int64)
        return _strip(out)

    hist = (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("d").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("d"))
    d = hist["d"].to_numpy(np.int64)
    cnt = hist["cnt"].to_numpy(np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    rank = math.ceil(0.95 * n)
    u = int(d[np.searchsorted(cum, rank)])
    tail = d > u
    y = d[tail] - u
    w = cnt[tail]
    ne = int(w.sum())
    s1 = int((w * y).sum())
    s2 = int((w * y * y).sum())
    mbar = float(s1) / float(ne)
    v = float(ne * s2 - s1 * s1) / float(ne * (ne - 1))
    xi = 0.5 * (1.0 - mbar * mbar / v)
    sigma = 0.5 * mbar * (1.0 + mbar * mbar / v)
    out = pd.DataFrame({"n": [n], "u_dollar": [u], "ne": [ne],
                        "ex1": [s1], "ex2": [s2],
                        "xi6": [_round6(np.array([xi]))[0]],
                        "sigma6": [_round6(np.array([sigma]))[0]]})
    for col in ("n", "u_dollar", "ne", "ex1", "ex2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GPD = """
WITH b AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS d FROM orders),
t AS (SELECT count(*)::BIGINT AS n, quantile_disc(d, 0.95) AS u FROM b),
e AS (
  SELECT count(*)::BIGINT AS ne, sum(d - u)::BIGINT AS ex1,
         sum((d - u) * (d - u))::BIGINT AS ex2,
         max(n) AS n, max(u) AS u
  FROM b CROSS JOIN t WHERE d > u),
q AS (
  SELECT n, u, ne, ex1, ex2,
         CAST(ex1 AS DOUBLE) / CAST(ne AS DOUBLE) AS mbar,
         CAST(ne::HUGEINT * ex2 - ex1::HUGEINT * ex1 AS DOUBLE)
           / CAST(ne::HUGEINT * (ne - 1) AS DOUBLE) AS v
  FROM e)
SELECT n, u AS u_dollar, ne, ex1, ex2,
       round(0.5 * (1.0 - mbar * mbar / v), 6) AS xi6,
       round(0.5 * mbar * (1.0 + mbar * mbar / v), 6) AS sigma6
FROM q
"""


QUERIES68: dict[str, tuple] = {
    "hill_tail_orders": (q_hill_tail_orders, SQL_HILL),
    "pickands_tail_orders": (q_pickands_tail_orders, SQL_PICKANDS),
    "gpd_tail_orders": (q_gpd_tail_orders, SQL_GPD),
}
