"""One-hundred-first oracle-query batch — count-model fitting /
reliability growth:

- negbin_fit_user_counts: negative-binomial method-of-moments fit to
  events-per-user: with exact (n, S, SUM k^2), m = S/n and the sample
  variance are identical floats, p-hat = m/s2 and
  r-hat = m^2/(s2 - m) (overdispersion is real here — probed s2 > m).
- zip_fit_purchase_counts: zero-inflated-Poisson MoM fit to
  purchases per (user, day) unit (zeros = active days without a
  purchase): lambda-hat = (s2 + m^2 - m)/m and
  pi-hat = (s2 - m)/(s2 + m^2 - m), identical floats of exact
  moments.
- crow_amsaa_errors: Crow-AMSAA (power-law NHPP) reliability-growth
  MLE on error events: beta-hat = n_f / SUM ln(T/t_i) with failure
  offsets t_i seconds from the first event and horizon T = span;
  each ln of an exact-int ratio is 1e-6-quantized and
  integer-summed (t_i = 0 failures excluded identically — they sit
  at the observation start where the NHPP likelihood is undefined).
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

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Negative binomial MoM
# ---------------------------------------------------------------------------


def q_negbin_fit_user_counts(sf_dir: str):
    """NB method-of-moments on events-per-user (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id"])

    def upart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "k": np.int64(1)})
        g = df.groupby("u", sort=False).sum().reset_index()
        g["k"] = g["k"].astype(np.int64)
        return _strip(g)

    per = (ds.map_batches(upart, batch_format="pyarrow")
             .groupby("u").aggregate(Sum("k", alias_name="k"))
             .to_pandas())
    k = [int(v) for v in per["k"]]
    n = len(k)
    s = sum(k)
    s2s = sum(v * v for v in k)
    m = float(s) / float(n)
    var = float(n * s2s - s * s) / float(n * (n - 1))
    p_hat = m / var
    r_hat = m * m / (var - m)
    out = pd.DataFrame({"n_users": [n], "s": [s], "s2": [s2s],
                        "mean6": [_round6(np.array([m]))[0]],
                        "var6": [_round6(np.array([var]))[0]],
                        "p6": [_round6(np.array([p_hat]))[0]],
                        "r6": [_round6(np.array([r_hat]))[0]]})
    for col in ("n_users", "s", "s2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_NEGBIN = """
WITH per AS (
  SELECT user_id, count(*)::BIGINT AS k FROM events GROUP BY 1),
t AS (
  SELECT count(*)::BIGINT AS n, sum(k)::BIGINT AS s,
         sum(k * k)::BIGINT AS s2
  FROM per),
f AS (
  SELECT n, s, s2,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         CAST(n::HUGEINT * s2 - s::HUGEINT * s AS DOUBLE)
           / CAST(n::HUGEINT * (n - 1) AS DOUBLE) AS var
  FROM t)
SELECT n AS n_users, s, s2,
       round(m, 6) AS mean6, round(var, 6) AS var6,
       round(m / var, 6) AS p6,
       round(m * m / (var - m), 6) AS r6
FROM f
"""


# ---------------------------------------------------------------------------
# Zero-inflated Poisson MoM
# ---------------------------------------------------------------------------


def q_zip_fit_purchase_counts(sf_dir: str):
    """ZIP MoM on purchases per (user, day) unit (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def upart(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        p = (np.asarray(t["event_type"].to_pylist())
             == "purchase").astype(np.int64)
        df = pd.DataFrame({"u": uid, "day": day, "x": p})
        g = df.groupby(["u", "day"], sort=False)["x"].sum().reset_index()
        g["x"] = g["x"].astype(np.int64)
        return _strip(g)

    per = (ds.map_batches(upart, batch_format="pyarrow")
             .groupby(["u", "day"]).aggregate(Sum("x", alias_name="x"))
             .to_pandas())
    x = [int(v) for v in per["x"]]
    n = len(x)
    s = sum(x)
    s2s = sum(v * v for v in x)
    zeros = sum(1 for v in x if v == 0)
    m = float(s) / float(n)
    var = float(n * s2s - s * s) / float(n * (n - 1))
    lam = (var + m * m - m) / m
    pi = (var - m) / (var + m * m - m)
    out = pd.DataFrame({"n_units": [n], "s": [s], "zeros": [zeros],
                        "mean6": [_round6(np.array([m]))[0]],
                        "var6": [_round6(np.array([var]))[0]],
                        "lambda6": [_round6(np.array([lam]))[0]],
                        "pi6": [_round6(np.array([pi]))[0]]})
    for col in ("n_units", "s", "zeros"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ZIP = f"""
WITH per AS (
  SELECT user_id, CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         sum((event_type = 'purchase')::INT)::BIGINT AS x
  FROM events GROUP BY 1, 2),
t AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
         sum(x * x)::BIGINT AS s2,
         sum((x = 0)::INT)::BIGINT AS zeros
  FROM per),
f AS (
  SELECT n, s, zeros,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         CAST(n::HUGEINT * s2 - s::HUGEINT * s AS DOUBLE)
           / CAST(n::HUGEINT * (n - 1) AS DOUBLE) AS var
  FROM t)
SELECT n AS n_units, s, zeros,
       round(m, 6) AS mean6, round(var, 6) AS var6,
       round((var + m * m - m) / m, 6) AS lambda6,
       round((var - m) / (var + m * m - m), 6) AS pi6
FROM f
"""


# ---------------------------------------------------------------------------
# Crow-AMSAA
# ---------------------------------------------------------------------------


def q_crow_amsaa_errors(sf_dir: str):
    """Power-law NHPP beta MLE on error events (docstring above)."""
    from scrapy_ray.pipelines.queries import _ts_minmax_us
    mn, mx = _ts_minmax_us(sf_dir, "events")
    span_s = (mx - mn) // 1_000_000

    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def epart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        keep = et == "error"
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)[keep]
        off = (ts - mn) // 1_000_000
        off = off[off > 0]
        q = np.floor(np.log(float(span_s) / off.astype(np.float64))
                     * 1e6 + 0.5).astype(np.int64)
        return pa.table({"g": pa.array([0], pa.int64()),
                         "nf": pa.array([len(off)], pa.int64()),
                         "sq": pa.array([int(q.sum())], pa.int64())})

    agg = (ds.map_batches(epart, batch_format="pyarrow")
             .groupby("g").aggregate(Sum("nf", alias_name="nf"),
                                     Sum("sq", alias_name="sq"))
             .to_pandas())
    nf = int(agg["nf"].iloc[0])
    sq = int(agg["sq"].iloc[0])
    beta = float(nf) * 1000000.0 / float(sq)
    out = pd.DataFrame({"n_failures": [nf], "span_s": [span_s],
                        "sq": [sq],
                        "beta6": [_round6(np.array([beta]))[0]]})
    for col in ("n_failures", "span_s", "sq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CROW_AMSAA = """
WITH sp AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
            FROM events),
f AS (
  SELECT (epoch_us(ts) - mn) // 1000000 AS t_s,
         (mx - mn) // 1000000 AS span_s
  FROM events CROSS JOIN sp WHERE event_type = 'error'),
q AS (
  SELECT count(*)::BIGINT AS nf, max(span_s) AS span_s,
         sum(CAST(round(ln(CAST(span_s AS DOUBLE) / t_s) * 1000000)
                  AS BIGINT))::BIGINT AS sq
  FROM f WHERE t_s > 0)
SELECT nf AS n_failures, span_s, sq,
       round(CAST(nf AS DOUBLE) * 1000000.0 / CAST(sq AS DOUBLE), 6)
         AS beta6
FROM q
"""


QUERIES101: dict[str, tuple] = {
    "negbin_fit_user_counts": (q_negbin_fit_user_counts, SQL_NEGBIN),
    "zip_fit_purchase_counts": (q_zip_fit_purchase_counts, SQL_ZIP),
    "crow_amsaa_errors": (q_crow_amsaa_errors, SQL_CROW_AMSAA),
}
