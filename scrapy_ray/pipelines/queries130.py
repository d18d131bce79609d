"""One-hundred-thirtieth oracle-query batch — tree induction, survey
weighting, and ANOVA effect sizes:

- cart_depth2_purchase: a depth-2 CART on ONE feature (event value
  cents) predicting purchase. Each split minimizes the weighted Gini
  impurity y_l(n_l−y_l)/n_l + y_r(n_r−y_r)/n_r over all histogram
  thresholds, floor-quantized at 1e-6 with smallest-threshold
  tiebreak (the kulldorff device); the two child splits re-run the
  same scan on their half. Leaf predictions are majority (ties →
  0); training accuracy is an exact-integer ratio.
- kish_ess_users: Kish design effect and effective sample size of
  per-user event-count weights — deff = n·Σw²/(Σw)², a pure
  exact-integer ratio (per-user weights aggregated in salted
  partitions, only Σw/Σw² cross partitions).
- effect_sizes_anova_types: eta², omega², epsilon² and Cohen's f²
  for value-by-event-type, from the queries121 _type_moments exact
  sums with the same once-quantized within/between SS device.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries26 import _PARTS
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries121 import _rint, _type_moments


# ---------------------------------------------------------------------------
# depth-2 CART
# ---------------------------------------------------------------------------


def _best_split(vals: np.ndarray, cnt: np.ndarray, yc: np.ndarray):
    """Best x<=theta split of a (value, count, y-count) histogram by
    floor-quantized Gini impurity; returns (theta, fq) or None. vals
    ascending; candidates are all but the last distinct value."""
    if len(vals) < 2:
        return None
    nl = np.cumsum(cnt)[:-1]
    yl = np.cumsum(yc)[:-1]
    n = int(cnt.sum())
    y = int(yc.sum())
    nr = n - nl
    yr = y - yl
    imp = (yl * (nl - yl) / nl.astype(np.float64)
           + yr * (nr - yr) / nr.astype(np.float64))
    fq = np.floor(imp * 1000000.0)
    i = int(np.argmin(fq))          # first min = smallest theta
    return int(vals[i]), imp[i]


def q_cart_depth2_purchase(sf_dir: str):
    """Depth-2 single-feature CART (docstring above)."""
    from ray.data.aggregate import Sum
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def hpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"cents": cents, "c": np.int64(1),
                          "y": (et == "purchase").astype(np.int64)}) \
            .groupby("cents", sort=False).sum().reset_index()
        for col in ("c", "y"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(hpart, batch_format="pyarrow")
           .groupby("cents").aggregate(Sum("c", alias_name="c"),
                                       Sum("y", alias_name="y"))
           .to_pandas().sort_values("cents").reset_index(drop=True))
    vals = h["cents"].to_numpy(np.int64)
    cnt = h["c"].to_numpy(np.int64)
    yc = h["y"].to_numpy(np.int64)
    t_root, _ = _best_split(vals, cnt, yc)
    lm = vals <= t_root
    t_left, _ = _best_split(vals[lm], cnt[lm], yc[lm])
    t_right, _ = _best_split(vals[~lm], cnt[~lm], yc[~lm])
    correct = 0
    total = int(cnt.sum())
    leaves = []
    for lo_m in [lm & (vals <= t_left), lm & (vals > t_left),
                 (~lm) & (vals <= t_right), (~lm) & (vals > t_right)]:
        nn = int(cnt[lo_m].sum())
        yy = int(yc[lo_m].sum())
        pred1 = 2 * yy > nn          # majority, ties -> 0
        correct += yy if pred1 else nn - yy
        leaves.append((nn, yy))
    acc = float(correct) / float(total)
    out = pd.DataFrame({
        "theta_root": [t_root], "theta_left": [t_left],
        "theta_right": [t_right], "n_total": [total],
        "correct": [correct],
        "acc6": [_round6(np.array([acc]))[0]]})
    for col in ("theta_root", "theta_left", "theta_right", "n_total",
                "correct"):
        out[col] = out[col].astype(np.int64)
    return out


def _cart_scan_sql(src: str, name: str) -> str:
    """SQL for one split scan over histogram CTE `src` (cents,c,y)."""
    return f"""
{name}_pre AS (
  SELECT cents,
         sum(c) OVER (ORDER BY cents) AS nl,
         sum(y) OVER (ORDER BY cents) AS yl,
         (SELECT sum(c) FROM {src}) AS n,
         (SELECT sum(y) FROM {src}) AS y,
         row_number() OVER (ORDER BY cents DESC) AS rd
  FROM {src}),
{name}_imp AS (
  SELECT cents,
         CAST(yl * (nl - yl) AS DOUBLE) / CAST(nl AS DOUBLE)
         + CAST((y - yl) * ((n - nl) - (y - yl)) AS DOUBLE)
           / CAST(n - nl AS DOUBLE) AS imp
  FROM {name}_pre WHERE rd > 1),
{name} AS (
  SELECT cents AS theta FROM {name}_imp
  ORDER BY CAST(floor(imp * 1000000.0) AS BIGINT), cents LIMIT 1)"""


SQL_CART = f"""
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         count(*)::BIGINT AS c,
         sum((event_type = 'purchase')::INT)::BIGINT AS y
  FROM events GROUP BY 1),
{_cart_scan_sql('h', 'root')},
hl AS (SELECT * FROM h WHERE cents <= (SELECT theta FROM root)),
hr AS (SELECT * FROM h WHERE cents > (SELECT theta FROM root)),
{_cart_scan_sql('hl', 'lsp')},
{_cart_scan_sql('hr', 'rsp')},
leaf AS (
  SELECT CASE WHEN cents <= (SELECT theta FROM root)
              THEN CASE WHEN cents <= (SELECT theta FROM lsp)
                        THEN 0 ELSE 1 END
              ELSE CASE WHEN cents <= (SELECT theta FROM rsp)
                        THEN 2 ELSE 3 END END AS lf,
         c, y
  FROM h),
lagg AS (
  SELECT lf, sum(c)::BIGINT AS nn, sum(y)::BIGINT AS yy
  FROM leaf GROUP BY 1),
acc AS (
  SELECT sum(CASE WHEN 2 * yy > nn THEN yy ELSE nn - yy END)::BIGINT
           AS correct,
         sum(nn)::BIGINT AS total
  FROM lagg)
SELECT (SELECT theta FROM root) AS theta_root,
       (SELECT theta FROM lsp) AS theta_left,
       (SELECT theta FROM rsp) AS theta_right,
       total AS n_total, correct,
       round(CAST(correct AS DOUBLE) / CAST(total AS DOUBLE), 6) AS acc6
FROM acc
"""


# ---------------------------------------------------------------------------
# Kish ESS
# ---------------------------------------------------------------------------


def q_kish_ess_users(sf_dir: str):
    """Kish design effect of per-user event-count weights."""
    ds = _pq(sf_dir, "events", columns=["user_id"])

    def upart(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.DataFrame({"user_id": u, "w": np.int64(1)}) \
            .groupby("user_id", sort=False).sum().reset_index()
        g["w"] = g["w"].astype(np.int64)
        g["gkey"] = (g["user_id"] % _PARTS).astype(np.int32)
        return _strip(g)

    def ufin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False)["w"].sum()
        w = g.to_numpy(np.int64)
        return pd.DataFrame({"n": [np.int64(len(w))],
                             "sw": [np.int64(w.sum())],
                             "sw2": [np.int64((w * w).sum())]})

    parts = (ds.map_batches(upart, batch_format="pyarrow")
               .groupby("gkey").map_groups(ufin, batch_format="pandas")
               .to_pandas())
    n = int(parts["n"].sum())
    sw = int(parts["sw"].sum())
    sw2 = int(parts["sw2"].sum())
    deff = float(n * sw2) / float(sw * sw)
    ess = float(sw * sw) / float(sw2)
    out = pd.DataFrame({"n_users": [n], "sw": [sw], "sw2": [sw2],
                        "deff6": [_round6(np.array([deff]))[0]],
                        "ess6": [_round6(np.array([ess]))[0]]})
    for col in ("n_users", "sw", "sw2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KISH = """
WITH u AS (
  SELECT user_id, count(*)::BIGINT AS w FROM events GROUP BY 1),
m AS (
  SELECT count(*)::BIGINT AS n, sum(w)::BIGINT AS sw,
         sum(CAST(w AS HUGEINT) * w)::BIGINT AS sw2
  FROM u)
SELECT n AS n_users, sw, sw2,
       round(CAST(CAST(n AS HUGEINT) * sw2 AS DOUBLE)
             / CAST(CAST(sw AS HUGEINT) * sw AS DOUBLE), 6) AS deff6,
       round(CAST(CAST(sw AS HUGEINT) * sw AS DOUBLE)
             / CAST(sw2 AS DOUBLE), 6) AS ess6
FROM m
"""


# ---------------------------------------------------------------------------
# ANOVA effect sizes
# ---------------------------------------------------------------------------


def q_effect_sizes_anova_types(sf_dir: str):
    """eta² / omega² / epsilon² / f² for value by event type."""
    g = _type_moments(sf_dir)
    n = [int(x) for x in g["n"]]
    s = [int(x) for x in g["s"]]
    q = [int(x) for x in g["q"]]
    k = len(n)
    nn = sum(n)
    ss_all = sum(s)
    ssw6 = 0
    ssb6 = -_rint(float(ss_all * ss_all) / float(nn) * 1000000.0)
    for i in range(k):
        a = n[i] * q[i] - s[i] * s[i]
        ssw6 += _rint(float(a) / float(n[i]) * 1000000.0)
        ssb6 += _rint(float(s[i] * s[i]) / float(n[i]) * 1000000.0)
    ssw = float(ssw6) / 1000000.0
    ssb = float(ssb6) / 1000000.0
    msw = ssw / float(nn - k)
    eta2 = ssb / (ssb + ssw)
    omega2 = (ssb - float(k - 1) * msw) / ((ssb + ssw) + msw)
    eps2 = (ssb - float(k - 1) * msw) / (ssb + ssw)
    f2 = eta2 / (1.0 - eta2)
    out = pd.DataFrame({
        "k": [k], "n_total": [nn],
        "eta2_6": [_round6(np.array([eta2]))[0]],
        "omega2_6": [_round6(np.array([omega2]))[0]],
        "eps2_6": [_round6(np.array([eps2]))[0]],
        "f2_6": [_round6(np.array([f2]))[0]]})
    for col in ("k", "n_total"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_EFFECT_SIZES = """
WITH g AS (
  SELECT event_type AS t, count(*)::BIGINT AS n,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS s,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
             * CAST(round(value * 100) AS BIGINT)) AS q
  FROM events GROUP BY 1),
tot AS (
  SELECT sum(n)::BIGINT AS nn, count(*)::BIGINT AS k,
         sum(s)::BIGINT AS ss
  FROM g),
aq AS (
  SELECT
    sum(CAST(round(
      CAST(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s AS DOUBLE)
      / CAST(n AS DOUBLE) * 1000000.0) AS HUGEINT)) AS ssw6,
    sum(CAST(round(
      CAST(CAST(s AS HUGEINT) * s AS DOUBLE)
      / CAST(n AS DOUBLE) * 1000000.0) AS HUGEINT)) AS sb6
  FROM g),
f AS (
  SELECT k, nn,
         CAST(ssw6 AS DOUBLE) / 1000000.0 AS ssw,
         CAST(sb6 - CAST(round(
             CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE)
             / CAST(nn AS DOUBLE) * 1000000.0) AS HUGEINT) AS DOUBLE)
           / 1000000.0 AS ssb
  FROM aq CROSS JOIN tot),
f2 AS (
  SELECT k, nn, ssw, ssb, ssw / CAST(nn - k AS DOUBLE) AS msw
  FROM f)
SELECT k, nn AS n_total,
       round(ssb / (ssb + ssw), 6) AS eta2_6,
       round((ssb - CAST(k - 1 AS DOUBLE) * msw)
             / ((ssb + ssw) + msw), 6) AS omega2_6,
       round((ssb - CAST(k - 1 AS DOUBLE) * msw) / (ssb + ssw), 6)
         AS eps2_6,
       round((ssb / (ssb + ssw))
             / (1.0 - ssb / (ssb + ssw)), 6) AS f2_6
FROM f2
"""


QUERIES130: dict[str, tuple] = {
    "cart_depth2_purchase": (q_cart_depth2_purchase, SQL_CART),
    "kish_ess_users": (q_kish_ess_users, SQL_KISH),
    "effect_sizes_anova_types": (q_effect_sizes_anova_types,
                                 SQL_EFFECT_SIZES),
}
