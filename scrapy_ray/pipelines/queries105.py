"""One-hundred-fifth oracle-query batch — partial rank dependence /
lognormal survival fit / extremal clustering:

- kendall_partial_tau_daily: Kendall partial tau of daily clicks vs
  purchases CONTROLLING for views:
  tau_xy.z = (t_xy - t_xz*t_yz)/sqrt((1-t_xz^2)(1-t_yz^2)) with each
  tau-a from exact concordant/discordant pair counts (O(days^2)
  pairs both sides).
- lognormal_fit_gaps: lognormal AFT fit to the complete inter-
  purchase gaps — each ln(gap) is quantized ONCE at 1e-6, so the
  count-weighted moments are exact ints; mu, sigma and the fitted
  median exp(mu) finalize identical-expression.
- extremal_index_daily: the runs-method extremal index of daily
  revenue exceedances over the exact p95: theta-hat = #clusters /
  #exceedances where clusters are separated by >= 2 consecutive
  non-exceedance days — pure gaps-and-islands integers.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries26 import _gap_hist
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Kendall partial tau
# ---------------------------------------------------------------------------


def q_kendall_partial_tau_daily(sf_dir: str):
    """Partial tau of clicks vs purchases given views (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist())
        df = pd.DataFrame({"day": day,
                           "x": (et == "click").astype(np.int64),
                           "y": (et == "purchase").astype(np.int64),
                           "z": (et == "view").astype(np.int64)})
        g = df.groupby("day", sort=False).sum().reset_index()
        for c in ("x", "y", "z"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    daily = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("x", alias_name="x"),
                                         Sum("y", alias_name="y"),
                                         Sum("z", alias_name="z"))
               .to_pandas())
    x = [int(v) for v in daily["x"]]
    y = [int(v) for v in daily["y"]]
    z = [int(v) for v in daily["z"]]
    n = len(x)
    pairs = n * (n - 1) // 2

    def tau(a, b):
        c = d = 0
        for i in range(n):
            for j in range(i + 1, n):
                s = (a[j] - a[i]) * (b[j] - b[i])
                if s > 0:
                    c += 1
                elif s < 0:
                    d += 1
        return c - d

    txy = tau(x, y)
    txz = tau(x, z)
    tyz = tau(y, z)
    fxy = float(txy) / float(pairs)
    fxz = float(txz) / float(pairs)
    fyz = float(tyz) / float(pairs)
    pt = (fxy - fxz * fyz) / math.sqrt((1.0 - fxz * fxz)
                                       * (1.0 - fyz * fyz))
    out = pd.DataFrame({"n_days": [n], "txy": [txy], "txz": [txz],
                        "tyz": [tyz],
                        "tau_xy6": [_round6(np.array([fxy]))[0]],
                        "ptau6": [_round6(np.array([pt]))[0]]})
    for col in ("n_days", "txy", "txz", "tyz"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PARTIAL_TAU = f"""
WITH daily AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'purchase')::INT)::BIGINT AS y,
         sum((event_type = 'view')::INT)::BIGINT AS z
  FROM events GROUP BY 1),
p AS (
  SELECT
    sum(((b.x - a.x) * (b.y - a.y) > 0)::INT
        - ((b.x - a.x) * (b.y - a.y) < 0)::INT)::BIGINT AS txy,
    sum(((b.x - a.x) * (b.z - a.z) > 0)::INT
        - ((b.x - a.x) * (b.z - a.z) < 0)::INT)::BIGINT AS txz,
    sum(((b.y - a.y) * (b.z - a.z) > 0)::INT
        - ((b.y - a.y) * (b.z - a.z) < 0)::INT)::BIGINT AS tyz
  FROM daily a JOIN daily b ON b.day > a.day),
t AS (SELECT count(*)::BIGINT AS n,
             (count(*) * (count(*) - 1)) // 2 AS pairs
      FROM daily),
f AS (
  SELECT n, txy, txz, tyz,
         CAST(txy AS DOUBLE) / CAST(pairs AS DOUBLE) AS fxy,
         CAST(txz AS DOUBLE) / CAST(pairs AS DOUBLE) AS fxz,
         CAST(tyz AS DOUBLE) / CAST(pairs AS DOUBLE) AS fyz
  FROM p CROSS JOIN t)
SELECT n AS n_days, txy, txz, tyz,
       round(fxy, 6) AS tau_xy6,
       round((fxy - fxz * fyz)
             / sqrt((1.0 - fxz * fxz) * (1.0 - fyz * fyz)), 6) AS ptau6
FROM f
"""


# ---------------------------------------------------------------------------
# Lognormal fit
# ---------------------------------------------------------------------------


def q_lognormal_fit_gaps(sf_dir: str):
    """Lognormal MoM/MLE fit via once-quantized ln gaps (docstring
    above)."""
    hist = _gap_hist(sf_dir)
    ev = hist[(hist["d"] > 0) & (hist["gap"] > 0)]
    g = [int(v) for v in ev["gap"]]
    d = [int(v) for v in ev["d"]]
    n = sum(d)
    ql = [int(math.floor(math.log(float(gv)) * 1e6 + 0.5)) for gv in g]
    s1 = sum(a * b for a, b in zip(d, ql))
    s2 = sum(a * b * b for a, b in zip(d, ql))
    mu = float(s1) / float(n) / 1000000.0
    var = (float(n * s2 - s1 * s1)
           / float(n * (n - 1))) / 1e12
    sigma = math.sqrt(var)
    med = math.exp(mu)
    out = pd.DataFrame({"n": [n], "s1": [s1],
                        "mu6": [_round6(np.array([mu]))[0]],
                        "sigma6": [_round6(np.array([sigma]))[0]],
                        "median6": [_round6(np.array([med]))[0]]})
    for col in ("n", "s1"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LOGNORMAL = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
gp AS (
  SELECT (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id))
          - epoch_us(ts)) // 1000000 AS gap
  FROM p),
h AS (SELECT gap, count(*)::BIGINT AS d FROM gp
      WHERE gap IS NOT NULL AND gap > 0 GROUP BY 1),
q AS (
  SELECT d,
         CAST(round(ln(CAST(gap AS DOUBLE)) * 1000000) AS BIGINT) AS ql
  FROM h),
m AS (
  SELECT sum(d)::BIGINT AS n, sum(d * ql)::BIGINT AS s1,
         sum(d::HUGEINT * ql * ql) AS s2
  FROM q),
f AS (
  SELECT n, s1,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mu,
         (CAST(n::HUGEINT * s2 - s1::HUGEINT * s1 AS DOUBLE)
          / CAST(n::HUGEINT * (n - 1) AS DOUBLE)) / 1e12 AS var
  FROM m)
SELECT n, s1, round(mu, 6) AS mu6,
       round(sqrt(var), 6) AS sigma6,
       round(exp(mu), 6) AS median6
FROM f
"""


# ---------------------------------------------------------------------------
# Extremal index
# ---------------------------------------------------------------------------


def q_extremal_index_daily(sf_dir: str):
    """Runs-method extremal index of p95 exceedances (docstring
    above)."""
    c = _daily_cents(sf_dir)["c"].to_numpy(np.int64)
    srt = np.sort(c)
    n = len(c)
    u = int(srt[math.ceil(0.95 * n) - 1])
    exc = c > u
    n_exc = int(exc.sum())
    clusters = 0
    gap_run = 2          # >= r at series start counts as a separator
    for f in exc:
        if f:
            if gap_run >= 2:
                clusters += 1
            gap_run = 0
        else:
            gap_run += 1
    theta = float(clusters) / float(n_exc)
    out = pd.DataFrame({"n_days": [n], "u_c": [u], "n_exc": [n_exc],
                        "n_clusters": [clusters],
                        "theta6": [_round6(np.array([theta]))[0]]})
    for col in ("n_days", "u_c", "n_exc", "n_clusters"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_EXTREMAL = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
t AS (SELECT count(*)::BIGINT AS n, quantile_disc(c, 0.95) AS u
      FROM daily),
e AS (
  SELECT rn FROM (
    SELECT row_number() OVER (ORDER BY day) AS rn, c, u
    FROM daily CROSS JOIN t)
  WHERE c > u),
flags AS (
  -- a new cluster starts when the previous exceedance is >= 3 rows
  -- back (i.e. >= 2 non-exceedance days between) or absent
  SELECT CASE WHEN lag(rn) OVER (ORDER BY rn) IS NULL
                OR rn - lag(rn) OVER (ORDER BY rn) >= 3
              THEN 1 ELSE 0 END AS is_new
  FROM e),
cl AS (
  SELECT count(*)::BIGINT AS n_exc, sum(is_new)::BIGINT AS n_clusters
  FROM flags)
SELECT (SELECT n FROM t) AS n_days, (SELECT u FROM t) AS u_c,
       n_exc, n_clusters,
       round(CAST(n_clusters AS DOUBLE) / CAST(n_exc AS DOUBLE), 6)
         AS theta6
FROM cl
"""


QUERIES105: dict[str, tuple] = {
    "kendall_partial_tau_daily": (q_kendall_partial_tau_daily,
                                  SQL_PARTIAL_TAU),
    "lognormal_fit_gaps": (q_lognormal_fit_gaps, SQL_LOGNORMAL),
    "extremal_index_daily": (q_extremal_index_daily, SQL_EXTREMAL),
}
