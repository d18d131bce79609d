"""Two-hundred-fourth oracle-query batch — the multiple-testing
completions on the shared per-day click-share p-value device
(queries147's A&S z→p, nano-quantized to integers):

- storey_pi0_daily: Storey's null-proportion estimate
  π̂₀ = #{p > λ}/((1−λ)m) at λ = 1/2 — a pure integer count over
  the quantized p-values, one division.
- simes_test_daily: the Simes global p-value min_k m·p_(k)/k —
  identical float terms over the sorted integer p-values with a
  min-k tiebreak.
- higher_criticism_daily: the Donoho–Jin HC⁺ statistic
  max_{k ≤ m/2} √m·(k/m − p_(k))/√(p_(k)(1−p_(k))) over p-values
  strictly inside (0, 1) (the same guard both sides); reports the
  max, its k, and the count of usable p-values.
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
from scrapy_ray.pipelines.queries147 import _phi_upper_p
from scrapy_ray.pipelines.queries160 import _r9


def _day_p9s(sf_dir: str) -> list[int]:
    """Sorted nano-quantized per-day click-share upper-tail
    p-values (the queries147 BH device)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "ts"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = np.asarray(t["event_type"].to_pylist())
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"day": day,
                          "x": (et == "click").astype(np.int64),
                          "n": np.int64(1)}) \
            .groupby("day", sort=False).sum().reset_index()
        for col in ("x", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(dpart, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("x", alias_name="x"),
                                       Sum("n", alias_name="n"))
             .to_pandas())
    xx = agg["x"].to_numpy(np.int64)
    nn = agg["n"].to_numpy(np.int64)
    xt, nt = int(xx.sum()), int(nn.sum())
    phat = float(xt) / float(nt)
    p9s = []
    for x_, n_ in zip(xx.tolist(), nn.tolist()):
        z = ((float(x_) - float(n_) * phat)
             / math.sqrt(float(n_) * phat * (1.0 - phat)))
        p9s.append(_r9(_phi_upper_p(z)))
    return sorted(p9s)


_SQL_P9 = """
d AS (
  SELECT date_trunc('day', ts) AS dy,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1),
tot AS (SELECT sum(x)::BIGINT AS xt, sum(n)::BIGINT AS nt FROM d),
z AS (
  SELECT (CAST(x AS DOUBLE)
          - CAST(n AS DOUBLE) * (CAST(xt AS DOUBLE)
                                 / CAST(nt AS DOUBLE)))
         / sqrt(CAST(n AS DOUBLE)
                * (CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE))
                * (1.0 - CAST(xt AS DOUBLE)
                   / CAST(nt AS DOUBLE))) AS z
  FROM d CROSS JOIN tot),
p9 AS (
  SELECT CAST(round(
    CASE WHEN z >= 0.0 THEN
      (exp(-abs(z) * abs(z) / 2.0) / sqrt(2.0 * pi()))
      * ((1.0 / (1.0 + 0.2316419 * abs(z)))
         * (0.319381530
            + (1.0 / (1.0 + 0.2316419 * abs(z)))
              * (-0.356563782
                 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                   * (1.781477937
                      + (1.0 / (1.0 + 0.2316419 * abs(z)))
                        * (-1.821255978
                           + (1.0 / (1.0 + 0.2316419 * abs(z)))
                             * 1.330274429)))))
    ELSE
      1.0 - (exp(-abs(z) * abs(z) / 2.0) / sqrt(2.0 * pi()))
      * ((1.0 / (1.0 + 0.2316419 * abs(z)))
         * (0.319381530
            + (1.0 / (1.0 + 0.2316419 * abs(z)))
              * (-0.356563782
                 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                   * (1.781477937
                      + (1.0 / (1.0 + 0.2316419 * abs(z)))
                        * (-1.821255978
                           + (1.0 / (1.0 + 0.2316419 * abs(z)))
                             * 1.330274429)))))
    END * 1e9) AS BIGINT) AS p
  FROM z),
rk AS (
  SELECT p, row_number() OVER (ORDER BY p) AS k,
         (SELECT count(*) FROM p9)::BIGINT AS m
  FROM p9)
"""


# ---------------------------------------------------------------------------
# Storey pi0
# ---------------------------------------------------------------------------


def q_storey_pi0_daily(sf_dir: str):
    """π̂₀ at λ = 1/2 over quantized p-values (docstring)."""
    p9s = _day_p9s(sf_dir)
    m = len(p9s)
    above = sum(1 for p in p9s if p > 500_000_000)
    pi0 = float(above) / (0.5 * m)
    out = pd.DataFrame({"m": [m], "n_above": [above],
                        "pi0_6": [_round6(np.array(
                            [min(pi0, 1.0)]))[0]]})
    for col in ("m", "n_above"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_STOREY = f"""
WITH {_SQL_P9},
s AS (
  SELECT max(m) AS m,
         sum((p > 500000000)::INT)::BIGINT AS above
  FROM rk)
SELECT m, above AS n_above,
       round(least(CAST(above AS DOUBLE)
                   / (0.5 * CAST(m AS DOUBLE)), 1.0), 6) AS pi0_6
FROM s
"""


# ---------------------------------------------------------------------------
# Simes test
# ---------------------------------------------------------------------------


def q_simes_test_daily(sf_dir: str):
    """Global Simes p = min m·p_(k)/k (docstring above)."""
    p9s = _day_p9s(sf_dir)
    m = len(p9s)
    best = None
    for k, p in enumerate(p9s, start=1):
        v = m * (p / 1e9) / k
        key = (v, k)
        if best is None or key < best:
            best = key
    out = pd.DataFrame({"m": [m], "k_star": [best[1]],
                        "simes_p6": [_round6(np.array(
                            [best[0]]))[0]]})
    for col in ("m", "k_star"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SIMES = f"""
WITH {_SQL_P9},
v AS (
  SELECT k, m, m * (p / 1e9) / k AS v FROM rk),
best AS (SELECT * FROM v ORDER BY v, k LIMIT 1)
SELECT m, k::BIGINT AS k_star, round(v, 6) AS simes_p6
FROM best
"""


# ---------------------------------------------------------------------------
# Higher criticism
# ---------------------------------------------------------------------------


def q_higher_criticism_daily(sf_dir: str):
    """Donoho-Jin HC+ over interior p-values (docstring)."""
    p9s = _day_p9s(sf_dir)
    m = len(p9s)
    best = None
    usable = 0
    for k, p9 in enumerate(p9s, start=1):
        if not (0 < p9 < 10 ** 9) or 2 * k > m:
            continue
        usable += 1
        p = p9 / 1e9
        hc = math.sqrt(float(m)) * (k / float(m) - p) \
            / math.sqrt(p * (1.0 - p))
        key = (-hc, k)
        if best is None or key < best:
            best = key
    out = pd.DataFrame({"m": [m], "n_usable": [usable],
                        "k_star": [best[1]],
                        "hc6": [_round6(np.array([-best[0]]))[0]]})
    for col in ("m", "n_usable", "k_star"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HC = f"""
WITH {_SQL_P9},
hv AS (
  SELECT k, m,
         sqrt(CAST(m AS DOUBLE))
         * (k / CAST(m AS DOUBLE) - p / 1e9)
         / sqrt((p / 1e9) * (1.0 - p / 1e9)) AS hc
  FROM rk
  WHERE p > 0 AND p < 1000000000 AND 2 * k <= m),
best AS (SELECT * FROM hv ORDER BY hc DESC, k LIMIT 1),
u AS (SELECT count(*)::BIGINT AS usable FROM hv)
SELECT best.m, u.usable AS n_usable, best.k::BIGINT AS k_star,
       round(best.hc, 6) AS hc6
FROM best, u
"""


QUERIES204: dict[str, tuple] = {
    "storey_pi0_daily": (q_storey_pi0_daily, SQL_STOREY),
    "simes_test_daily": (q_simes_test_daily, SQL_SIMES),
    "higher_criticism_daily": (q_higher_criticism_daily, SQL_HC),
}
