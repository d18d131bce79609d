"""One-hundred-sixty-seventh oracle-query batch — the experimentation
platform trio every A/B stack runs:

- ratio_metric_delta_se: the delta-method standard error of the
  ratio metric R = Σrevenue/Σevents across users. Per-user moment
  sums (Σx, Σy, Σx², Σy², Σxy) are exact integers gathered through
  salted partitions; user-level (co)variances clear to
  (nΣ· − Σ·Σ·)/(n(n−1)) HUGEINT numerators and the SE finalizes
  through one identical expression.
- ab_power_sample_size: the required per-arm n to detect a 5%
  relative lift in purchase rate at α = 0.05 two-sided, power 0.8
  (literal z constants 1.959964/0.841621), from the exact observed
  baseline rate; both sides take the identical ceil.
- srm_check_parity: the sample-ratio-mismatch guardrail — distinct
  users split by id parity vs the designed 50/50, the 1-df
  chi-square (a−b)²/(a+b) exact-integer-numerator.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_Z_A = 1.959964
_Z_B = 0.841621
_MDE_REL = 1.05


# ---------------------------------------------------------------------------
# Delta-method ratio metric
# ---------------------------------------------------------------------------


def q_ratio_metric_delta_se(sf_dir: str):
    """Delta-method SE of revenue-per-event (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "value"])

    def salt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u), "c": pa.array(c),
                         "sk": pa.array(u % 64)})

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("u", sort=False)["c"] \
            .agg(x="sum", y="size").reset_index()
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        return pd.DataFrame({
            "n": [len(g)], "sx": [int(x.sum())], "sy": [int(y.sum())],
            "sxx": [int((x.astype(object) * x.astype(object)).sum())],
            "syy": [int((y * y).sum())],
            "sxy": [int((x * y).sum())]})

    agg = (ds.map_batches(salt, batch_format="pyarrow")
             .groupby("sk").map_groups(moments,
                                       batch_format="pandas")
             .to_pandas().sum())
    n = int(agg["n"])
    sx, sy = int(agg["sx"]), int(agg["sy"])
    sxx, syy, sxy = int(agg["sxx"]), int(agg["syy"]), int(agg["sxy"])
    r = float(sx) / float(sy)
    vx = float(n * sxx - sx * sx) / (float(n) * float(n - 1))
    vy = float(n * syy - sy * sy) / (float(n) * float(n - 1))
    cxy = float(n * sxy - sx * sy) / (float(n) * float(n - 1))
    ybar = float(sy) / float(n)
    se = math.sqrt((vx - 2.0 * r * cxy + r * r * vy) / float(n)) \
        / ybar
    r6 = _round6(np.array([r / 100.0, se / 100.0]))
    out = pd.DataFrame({"n_users": [n],
                        "ratio_dollars6": [r6[0]],
                        "se_dollars6": [r6[1]]})
    out["n_users"] = out["n_users"].astype(np.int64)
    return out


SQL_RATIO_DELTA = """
WITH per_user AS (
  SELECT user_id,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS x,
         count(*)::BIGINT AS y
  FROM events GROUP BY user_id),
s AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM per_user),
f AS (
  SELECT n, CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
         CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS vx,
         CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS vy,
         CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS cxy,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar
  FROM s)
SELECT n AS n_users, round(r / 100.0, 6) AS ratio_dollars6,
       round(sqrt((vx - 2.0 * r * cxy + r * r * vy)
                  / CAST(n AS DOUBLE)) / ybar / 100.0, 6)
         AS se_dollars6
FROM f
"""


# ---------------------------------------------------------------------------
# Power / sample size
# ---------------------------------------------------------------------------


def q_ab_power_sample_size(sf_dir: str):
    """Per-arm n for a 5% relative purchase-rate lift (docstring)."""
    ds = _pq(sf_dir, "events", columns=["event_type"])

    def counts(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "p": pa.array([int((et == "purchase").sum())], pa.int64()),
            "n": pa.array([len(et)], pa.int64())})

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(counts, batch_format="pyarrow")
             .groupby("k").aggregate(Sum("p", alias_name="p"),
                                     Sum("n", alias_name="n"))
             .to_pandas())
    np_, nn = int(agg["p"].iloc[0]), int(agg["n"].iloc[0])
    p1 = float(np_) / float(nn)
    p2 = p1 * _MDE_REL
    pbar = (p1 + p2) / 2.0
    num = (_Z_A * math.sqrt(2.0 * pbar * (1.0 - pbar))
           + _Z_B * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
    n_arm = int(math.ceil(num * num / ((p2 - p1) * (p2 - p1))))
    r6 = _round6(np.array([p1, p2]))
    out = pd.DataFrame({"n_events": [nn], "p1_6": [r6[0]],
                        "p2_6": [r6[1]], "n_per_arm": [n_arm]})
    for col in ("n_events", "n_per_arm"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_AB_POWER = f"""
WITH s AS (
  SELECT sum((event_type = 'purchase')::INT)::BIGINT AS p,
         count(*)::BIGINT AS n
  FROM events),
f AS (
  SELECT n, CAST(p AS DOUBLE) / CAST(n AS DOUBLE) AS p1,
         CAST(p AS DOUBLE) / CAST(n AS DOUBLE) * {_MDE_REL} AS p2
  FROM s),
g AS (
  SELECT n, p1, p2, (p1 + p2) / 2.0 AS pbar FROM f)
SELECT n AS n_events, round(p1, 6) AS p1_6, round(p2, 6) AS p2_6,
       CAST(ceil(({_Z_A} * sqrt(2.0 * pbar * (1.0 - pbar))
                  + {_Z_B} * sqrt(p1 * (1.0 - p1)
                                  + p2 * (1.0 - p2)))
                 * ({_Z_A} * sqrt(2.0 * pbar * (1.0 - pbar))
                    + {_Z_B} * sqrt(p1 * (1.0 - p1)
                                    + p2 * (1.0 - p2)))
                 / ((p2 - p1) * (p2 - p1))) AS BIGINT) AS n_per_arm
FROM g
"""


# ---------------------------------------------------------------------------
# Sample ratio mismatch
# ---------------------------------------------------------------------------


def q_srm_check_parity(sf_dir: str):
    """SRM chi-square of the user-id parity split (docstring)."""
    from scrapy_ray.pipelines.queries159 import _distinct_users

    uu = _distinct_users(sf_dir)
    a = int((uu % 2 == 0).sum())
    b = len(uu) - a
    chi2 = float((a - b) * (a - b)) / float(a + b)
    out = pd.DataFrame({
        "n_even": [a], "n_odd": [b],
        "chi2_6": [_round6(np.array([chi2]))[0]],
        "srm_flag": [1 if chi2 > 3.841 else 0]})
    for col in ("n_even", "n_odd", "srm_flag"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SRM = """
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
s AS (
  SELECT sum((u % 2 = 0)::INT)::BIGINT AS a,
         sum((u % 2 = 1)::INT)::BIGINT AS b
  FROM u)
SELECT a AS n_even, b AS n_odd,
       round(CAST((a - b) * (a - b) AS DOUBLE)
             / CAST(a + b AS DOUBLE), 6) AS chi2_6,
       (CASE WHEN CAST((a - b) * (a - b) AS DOUBLE)
                  / CAST(a + b AS DOUBLE) > 3.841
             THEN 1 ELSE 0 END)::BIGINT AS srm_flag
FROM s
"""


QUERIES167: dict[str, tuple] = {
    "ratio_metric_delta_se": (q_ratio_metric_delta_se,
                              SQL_RATIO_DELTA),
    "ab_power_sample_size": (q_ab_power_sample_size, SQL_AB_POWER),
    "srm_check_parity": (q_srm_check_parity, SQL_SRM),
}
