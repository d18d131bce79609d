"""One-hundred-thirty-ninth oracle-query batch — statistical quality
control and finite-population estimation:

- acceptance_sampling_oc: the OC point of the single sampling plan
  (n=50, c=2) at the observed defect rate p = errors/events — Pa is
  the explicit three-term binomial sum with literal integer
  coefficients (1, 50, 1225) and identical float powers; AOQ = p·Pa.
- german_tank_orders: the serial-number (German tank) estimator
  N̂ = m + m/k − 1 from the deterministic o_orderkey % 7 = 3 sample
  (k sampled keys, maximum m), with the exact true maximum and the
  relative error.
- process_capability_orders: Cp / Cpk of dollar-quantized order
  prices against data-derived spec limits LSL/USL =
  quantile_disc(0.005 / 0.995) (the exact ceil(q·n)-rank rule);
  σ from the cleared sample variance (dollar units keep Σx² inside
  int64 at every SF — cents² would overflow).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


# ---------------------------------------------------------------------------
# Acceptance sampling OC
# ---------------------------------------------------------------------------


def q_acceptance_sampling_oc(sf_dir: str):
    """OC / AOQ at the observed error rate (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        return pa.table({"g": pa.array([0], pa.int64()),
                         "n": pa.array([len(et)], pa.int64()),
                         "d": pa.array([int((et == "error").sum())],
                                       pa.int64())})

    agg = (ds.map_batches(cpart, batch_format="pyarrow")
             .groupby("g").aggregate(Sum("n", alias_name="n"),
                                     Sum("d", alias_name="d"))
             .to_pandas())
    n = int(agg["n"].iloc[0])
    d = int(agg["d"].iloc[0])
    p = float(d) / float(n)
    qq = 1.0 - p
    pa_ = (np.power(qq, 50.0)
           + 50.0 * p * np.power(qq, 49.0)
           + 1225.0 * p * p * np.power(qq, 48.0))
    aoq = p * pa_
    out = pd.DataFrame({"n_events": [n], "n_defects": [d],
                        "p6": [_round6(np.array([p]))[0]],
                        "pa6": [_round6(np.array([pa_]))[0]],
                        "aoq6": [_round6(np.array([aoq]))[0]]})
    for col in ("n_events", "n_defects"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ACCEPTANCE = """
WITH m AS (
  SELECT count(*)::BIGINT AS n,
         sum((event_type = 'error')::INT)::BIGINT AS d
  FROM events),
f AS (
  SELECT n, d, CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS q
  FROM m),
g AS (
  SELECT n, d, p,
         pow(q, 50.0) + 50.0 * p * pow(q, 49.0)
           + 1225.0 * p * p * pow(q, 48.0) AS pa
  FROM f)
SELECT n AS n_events, d AS n_defects, round(p, 6) AS p6,
       round(pa, 6) AS pa6, round(p * pa, 6) AS aoq6
FROM g
"""


# ---------------------------------------------------------------------------
# German tank estimator
# ---------------------------------------------------------------------------


def q_german_tank_orders(sf_dir: str):
    """Serial-number estimator from the %7=3 key sample (docstring)."""
    ds = _pq(sf_dir, "orders", columns=["o_orderkey"])

    def kpart(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        samp = k[k % 7 == 3]
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "k": pa.array([len(samp)], pa.int64()),
            "m": pa.array([int(samp.max()) if len(samp) else -1],
                          pa.int64()),
            "tm": pa.array([int(k.max())], pa.int64())})

    parts = (ds.map_batches(kpart, batch_format="pyarrow")
             .to_pandas())
    kk = int(parts["k"].sum())
    m = int(parts["m"].max())
    tm = int(parts["tm"].max())
    est = float(m) + float(m) / float(kk) - 1.0
    err = (est - float(tm)) / float(tm)
    out = pd.DataFrame({"k_sample": [kk], "m_max": [m],
                        "true_max": [tm],
                        "est6": [_round6(np.array([est]))[0]],
                        "err6": [_round6(np.array([err]))[0]]})
    for col in ("k_sample", "m_max", "true_max"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GERMAN_TANK = """
WITH s AS (
  SELECT count(*)::BIGINT AS k, max(o_orderkey)::BIGINT AS m
  FROM orders WHERE o_orderkey % 7 = 3),
t AS (SELECT max(o_orderkey)::BIGINT AS tm FROM orders),
f AS (
  SELECT k, m, tm,
         CAST(m AS DOUBLE) + CAST(m AS DOUBLE) / CAST(k AS DOUBLE)
           - 1.0 AS est
  FROM s CROSS JOIN t)
SELECT k AS k_sample, m AS m_max, tm AS true_max,
       round(est, 6) AS est6,
       round((est - CAST(tm AS DOUBLE)) / CAST(tm AS DOUBLE), 6)
         AS err6
FROM f
"""


# ---------------------------------------------------------------------------
# Process capability
# ---------------------------------------------------------------------------


def q_process_capability_orders(sf_dir: str):
    """Cp / Cpk of dollar-quantized order prices (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        dd = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64) // 100
        g = pd.DataFrame({"d": dd, "n": np.int64(1), "s": dd,
                          "q": dd * dd}) \
            .groupby("d", sort=False).sum().reset_index()
        for col in ("n", "s", "q"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(hpart, batch_format="pyarrow")
           .groupby("d").aggregate(Sum("n", alias_name="n"),
                                   Sum("s", alias_name="s"),
                                   Sum("q", alias_name="q"))
           .to_pandas().sort_values("d").reset_index(drop=True))
    vals = h["d"].to_numpy(np.int64)
    cnt = h["n"].to_numpy(np.int64)
    n = int(cnt.sum())
    s = int(h["s"].sum())
    qsum = int(h["q"].sum())
    cum = np.cumsum(cnt)

    def qdisc(q: float) -> int:       # DuckDB quantile_disc rule
        rank = int(np.ceil(np.float64(q) * np.float64(n)))
        return int(vals[int(np.searchsorted(cum, rank))])

    lsl = qdisc(0.005)
    usl = qdisc(0.995)
    mu = float(s) / float(n)
    sig = np.sqrt(float(n * qsum - s * s)
                  / (float(n) * float(n - 1)))
    cp = (float(usl) - float(lsl)) / (6.0 * sig)
    cpk = min(float(usl) - mu, mu - float(lsl)) / (3.0 * sig)
    out = pd.DataFrame({"n": [n], "lsl": [lsl], "usl": [usl],
                        "cp6": [_round6(np.array([cp]))[0]],
                        "cpk6": [_round6(np.array([cpk]))[0]]})
    for col in ("n", "lsl", "usl"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PROCESS_CAP = """
WITH r AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS d
  FROM orders),
m AS (
  SELECT count(*)::BIGINT AS n, sum(d)::BIGINT AS s,
         sum(CAST(d AS HUGEINT) * d)::BIGINT AS q,
         quantile_disc(d, 0.005)::BIGINT AS lsl,
         quantile_disc(d, 0.995)::BIGINT AS usl
  FROM r),
f AS (
  SELECT n, s, lsl, usl,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         sqrt(CAST(CAST(n AS HUGEINT) * q
                   - CAST(s AS HUGEINT) * s AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sig
  FROM m)
SELECT n, lsl, usl,
       round((CAST(usl AS DOUBLE) - CAST(lsl AS DOUBLE))
             / (6.0 * sig), 6) AS cp6,
       round(least(CAST(usl AS DOUBLE) - mu, mu - CAST(lsl AS DOUBLE))
             / (3.0 * sig), 6) AS cpk6
FROM f
"""


QUERIES139: dict[str, tuple] = {
    "acceptance_sampling_oc": (q_acceptance_sampling_oc,
                               SQL_ACCEPTANCE),
    "german_tank_orders": (q_german_tank_orders, SQL_GERMAN_TANK),
    "process_capability_orders": (q_process_capability_orders,
                                  SQL_PROCESS_CAP),
}
