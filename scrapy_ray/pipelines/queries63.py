"""Sixty-third oracle-query batch — cyclic ECDF distance / rank-based
randomness / record statistics:

- kuiper_test_click_view: two-sample Kuiper V = D⁺ + D⁻ between the
  click and view value distributions — the cyclic-sensitive sibling of
  ks_test on the SAME merged per-cent histogram.  Both one-sided
  suprema are exact int64 maxima of c1·n2 − c2·n1 over the merged
  support (the signed gap, not its absolute value), so V's numerator
  is an exact integer and V finalizes as one float division.
- bartels_rank_daily_revenue: Bartels' rank von Neumann ratio on daily
  revenue dollars.  Doubled average ranks r' = 2·rank + ties − 1 are
  exact INTEGERS under ties (friedman discipline); the doubling
  cancels in RVN = n·Σ(r'ᵢ−r'ᵢ₊₁)² / (n·Σr'² − (Σr')²), so both
  numerator and denominator are exact int64 and RVN is one float of
  two exact integers.  z uses the classic no-ties asymptotic variance
  4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²) identical-expression (ties in
  daily dollar totals are rare; the ranks themselves are tie-exact).
- foster_stuart_records_daily: Foster–Stuart records test on the same
  series — upper/lower record counts U/L (strict, i ≥ 2), trend
  statistic d = U−L and dispersion s = U+L, exact integers off one
  running-max/min scan.  Record indicators at distinct i are
  independent with P = 1/i, so Var(d) = Σ2/i and
  E(s) = Σ2/i, Var(s) = Σ(2/i − 4/i²); each harmonic term is
  quantized to 1e-12 units and integer-summed (float-sum-order
  immunity), z_d and z_s identical-expression.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Kuiper two-sample
# ---------------------------------------------------------------------------


def q_kuiper_test_click_view(sf_dir: str):
    """Two-sample Kuiper V from the merged per-cent histogram (docstring
    above)."""
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
        out = df.groupby(["g", "c"], sort=False).size().reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype(np.int64)
        return _strip(out)

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby(["g", "c"]).aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    merged = np.sort(cells["c"].unique().astype(np.int64))
    h = np.zeros((2, len(merged)), np.int64)
    for gi in (0, 1):
        sub = cells[cells["g"] == gi]
        pos = np.searchsorted(merged, sub["c"].to_numpy().astype(np.int64))
        h[gi, pos] = sub["cnt"].to_numpy().astype(np.int64)
    c1 = np.cumsum(h[0])
    c2 = np.cumsum(h[1])
    n1, n2 = int(c1[-1]), int(c2[-1])
    gap = c1 * n2 - c2 * n1
    dplus = int(np.max(gap))
    dminus = int(np.max(-gap))
    v6 = _round6(np.array([(dplus + dminus) / float(n1 * n2)]))
    out = pd.DataFrame({"n1": [n1], "n2": [n2],
                        "dplus_num": [dplus], "dminus_num": [dminus],
                        "v6": [v6[0]]})
    for col in ("n1", "n2", "dplus_num", "dminus_num"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KUIPER = """
WITH b AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         (event_type = 'view')::INT AS g
  FROM events WHERE event_type IN ('click', 'view')),
h AS (
  SELECT c, sum((g = 0)::INT)::BIGINT AS h1, sum((g = 1)::INT)::BIGINT AS h2
  FROM b GROUP BY 1),
cum AS (
  SELECT c, CAST(sum(h1) OVER (ORDER BY c) AS BIGINT) AS c1,
         CAST(sum(h2) OVER (ORDER BY c) AS BIGINT) AS c2
  FROM h),
t AS (SELECT sum(h1)::BIGINT AS n1, sum(h2)::BIGINT AS n2 FROM h)
SELECT n1, n2,
       max(c1 * n2 - c2 * n1)::BIGINT AS dplus_num,
       max(c2 * n1 - c1 * n2)::BIGINT AS dminus_num,
       round((max(c1 * n2 - c2 * n1) + max(c2 * n1 - c1 * n2))::DOUBLE
             / (n1 * n2), 6) AS v6
FROM cum CROSS JOIN t GROUP BY n1, n2
"""


# ---------------------------------------------------------------------------
# Bartels rank von Neumann
# ---------------------------------------------------------------------------


def q_bartels_rank_daily_revenue(sf_dir: str):
    """Bartels rank von Neumann randomness test on daily revenue dollars
    (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    y = (np.sign(c / 100.0)
         * np.floor(np.abs(c / 100.0) + 0.5)).astype(np.int64)
    n = len(y)
    # doubled average ranks under ties: r' = 2*(#less) + (#eq) + 1
    vals, inv, counts = np.unique(y, return_inverse=True,
                                  return_counts=True)
    less = np.concatenate(([0], np.cumsum(counts)[:-1]))
    r2 = (2 * less[inv] + counts[inv] + 1).astype(np.int64)
    d = r2[:-1] - r2[1:]
    num = int((d * d).sum())
    sr = int(r2.sum())
    sr2 = int((r2.astype(object) * r2.astype(object)).sum())
    den = n * sr2 - sr * sr
    rvn = float(n * num) / float(den)
    varr = (4.0 * float((n - 2) * (5 * n * n - 2 * n - 9))
            / float(5 * n * (n + 1) * (n - 1) * (n - 1)))
    z = (rvn - 2.0) / math.sqrt(varr)
    r6 = _round6(np.array([rvn, z]))
    out = pd.DataFrame({"n_days": [n], "num": [num], "den": [den],
                        "rvn6": [r6[0]], "z6": [r6[1]]})
    for col in ("n_days", "num", "den"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BARTELS = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d AS (SELECT day, CAST(round(c / 100.0) AS BIGINT) AS y FROM dc),
rk AS (
  SELECT day, (2 * rank() OVER (ORDER BY y)
               + count(*) OVER (PARTITION BY y) - 1)::BIGINT AS r
  FROM d),
sq AS (SELECT r, lead(r) OVER (ORDER BY day) AS rn FROM rk),
s AS (
  SELECT count(*)::BIGINT AS n, sum(r)::BIGINT AS sr,
         sum(r * r)::BIGINT AS sr2,
         coalesce(sum((r - rn) * (r - rn))
                    FILTER (WHERE rn IS NOT NULL), 0)::BIGINT AS num
  FROM sq)
SELECT n AS n_days, num, (n * sr2 - sr * sr)::BIGINT AS den,
       round(CAST(n * num AS DOUBLE)
             / CAST(n * sr2 - sr * sr AS DOUBLE), 6) AS rvn6,
       round((CAST(n * num AS DOUBLE)
              / CAST(n * sr2 - sr * sr AS DOUBLE) - 2.0)
             / sqrt(4.0 * CAST((n - 2) * (5 * n * n - 2 * n - 9) AS DOUBLE)
                    / CAST(5 * n * (n + 1) * (n - 1) * (n - 1) AS DOUBLE)),
             6) AS z6
FROM s
"""


# ---------------------------------------------------------------------------
# Foster-Stuart records
# ---------------------------------------------------------------------------


def q_foster_stuart_records_daily(sf_dir: str):
    """Foster-Stuart upper/lower record counts + trend/dispersion z on
    daily revenue dollars (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    y = (np.sign(c / 100.0)
         * np.floor(np.abs(c / 100.0) + 0.5)).astype(np.int64)
    n = len(y)
    pmax = np.maximum.accumulate(y)[:-1]
    pmin = np.minimum.accumulate(y)[:-1]
    u = int((y[1:] > pmax).sum())
    lo = int((y[1:] < pmin).sum())
    i = np.arange(2, n + 1, dtype=np.float64)
    vd_units = int(np.floor(2e12 / i + 0.5).astype(np.int64).sum())
    vs_t = 2e12 / i - 4e12 / (i * i)
    vs_units = int(np.floor(vs_t + 0.5).astype(np.int64).sum())
    zd = float(u - lo) / math.sqrt(float(vd_units) / 1e12)
    zs = ((float(u + lo) - float(vd_units) / 1e12)
          / math.sqrt(float(vs_units) / 1e12))
    r6 = _round6(np.array([zd, zs]))
    out = pd.DataFrame({"n_days": [n], "u_records": [u],
                        "l_records": [lo], "d_stat": [u - lo],
                        "s_stat": [u + lo], "vd_units": [vd_units],
                        "vs_units": [vs_units],
                        "zd6": [r6[0]], "zs6": [r6[1]]})
    for col in ("n_days", "u_records", "l_records", "d_stat", "s_stat",
                "vd_units", "vs_units"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_FOSTER_STUART = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d AS (SELECT day, CAST(round(c / 100.0) AS BIGINT) AS y FROM dc),
w AS (
  SELECT y,
         max(y) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax,
         min(y) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmin,
         row_number() OVER (ORDER BY day) AS i
  FROM d),
nn AS (SELECT count(*)::BIGINT AS n FROM d),
cnt AS (
  SELECT sum((y > pmax)::INT)::BIGINT AS u,
         sum((y < pmin)::INT)::BIGINT AS l,
         sum(CAST(round(2e12 / i) AS BIGINT))::BIGINT AS vd_units,
         sum(CAST(round(2e12 / i - 4e12 / (i * i)) AS BIGINT))::BIGINT
           AS vs_units
  FROM w WHERE i >= 2)
SELECT nn.n AS n_days, cnt.u AS u_records, cnt.l AS l_records,
       (cnt.u - cnt.l)::BIGINT AS d_stat,
       (cnt.u + cnt.l)::BIGINT AS s_stat,
       cnt.vd_units, cnt.vs_units,
       round(CAST(cnt.u - cnt.l AS DOUBLE)
             / sqrt(CAST(cnt.vd_units AS DOUBLE) / 1e12), 6) AS zd6,
       round((CAST(cnt.u + cnt.l AS DOUBLE)
              - CAST(cnt.vd_units AS DOUBLE) / 1e12)
             / sqrt(CAST(cnt.vs_units AS DOUBLE) / 1e12), 6) AS zs6
FROM nn, cnt
"""


QUERIES63: dict[str, tuple] = {
    "kuiper_test_click_view": (q_kuiper_test_click_view, SQL_KUIPER),
    "bartels_rank_daily_revenue": (q_bartels_rank_daily_revenue,
                                   SQL_BARTELS),
    "foster_stuart_records_daily": (q_foster_stuart_records_daily,
                                    SQL_FOSTER_STUART),
}
