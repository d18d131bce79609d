"""Fifty-second oracle-query batch — ordered within-block trend / paired
nonparametric location / conditioned correlation:

- page_trend_event_types: Page's L trend test for an ordered alternative
  across the k event types (alphabetical scores 1..k, the
  cochran_armitage convention), reusing the Friedman doubled-rank
  machinery (queries51.friedman_rank_sums — identical grid, identical
  salted rank partitions). L' = sum_j j*R'_j is exact (doubled); the
  classic no-ties moments mu_L = b*k*(k+1)^2/4 and
  var_L = b*k^2*(k+1)*(k^2-1)/144 finalize identical-expression with
  doubled L (2*mu, 4*var); the tie mass is REPORTED alongside so the
  no-ties z is honest (ties are impossible-rare on cents totals —
  probed 0 at all scales).
- wilcoxon_signed_rank_click_view: Wilcoxon signed-rank test on paired
  per-user totals, click cents minus view cents. Zero diffs drop
  (standard); |diff| ranks use the exact doubled-average-rank identity
  (2*rank() + count_eq - 1); W'+ = doubled positive-rank sum is exact;
  the tie-corrected variance 24*var = n(n+1)(2n+1) - T/2 stays integer
  because T = sum(t^3-t) is always divisible by 2 (t-1,t,t+1 are three
  consecutive integers). z = ((2W' - n(n+1))/4) / sqrt(V/24), one float
  expression of exact integers. The per-user diff table aggregates
  distributed; the driver ranks only the O(users) aggregate (the
  Lorenz-decile precedent).
- partial_corr_lineitem: partial correlations among extended price
  (whole dollars — cents^2 sums would pass int64 per block, the
  jarque_bera unit lesson), quantity, and discount-percent: one
  distributed pass carries the ten exact integer moments, pairwise
  r's and all three partials r_xy.z = (r_xy - r_xz*r_yz) /
  sqrt((1-r_xz^2)(1-r_yz^2)) finalize identical-expression
  (HUGEINT mirrors — Sxx ~ 6e16 at sf1 still fits int64; crosses do
  too; SQL casts keep parity).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries51 import friedman_rank_sums


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# Page's L
# ---------------------------------------------------------------------------


def q_page_trend_event_types(sf_dir: str):
    """Page's L trend test across alphabetically-scored event types
    (docstring above)."""
    types, vals = friedman_rank_sums(sf_dir)
    k = len(types)
    b = vals["__b"]
    ties = vals["__ties"]
    lp = sum((i + 1) * vals[t] for i, t in enumerate(types))  # doubled L
    mu2 = b * k * (k + 1) * (k + 1) // 2          # 2*mu_L (exact: /4*2)
    var4 = b * k * k * (k + 1) * (k * k - 1) // 36  # 16*var/4 = 4*var
    # z = (L - mu)/sd = ((L' - 2mu)/2) / sqrt(var) = (L' - mu2)/sqrt(4var)
    z = float(lp - mu2) / math.sqrt(float(var4))
    out = pd.DataFrame({"b_users": [b], "k_types": [k], "ties": [ties],
                        "l2": [lp], "mu2": [mu2],
                        "z6": [_round6(np.array([z]))[0]]})
    for col in ("b_users", "k_types", "ties", "l2", "mu2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PAGE = """
WITH c AS (
  SELECT user_id, event_type,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS tot
  FROM events GROUP BY 1, 2),
grid AS (
  SELECT u.user_id, t.event_type, coalesce(c.tot, 0)::BIGINT AS tot
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
  LEFT JOIN c USING (user_id, event_type)),
r AS (
  SELECT user_id, event_type, tot,
         (2 * rank() OVER (PARTITION BY user_id ORDER BY tot)
          + count(*) OVER (PARTITION BY user_id, tot) - 1)::BIGINT AS r2
  FROM grid),
rj AS (
  SELECT event_type, sum(r2)::BIGINT AS rsum,
         dense_rank() OVER (ORDER BY event_type)::BIGINT AS w
  FROM r GROUP BY event_type),
tie AS (
  SELECT coalesce(sum(t * t * t - t), 0)::BIGINT AS ties
  FROM (SELECT user_id, tot, count(*)::BIGINT AS t
        FROM grid GROUP BY 1, 2)),
dims AS (
  SELECT (SELECT count(DISTINCT user_id) FROM events)::BIGINT AS b,
         (SELECT count(DISTINCT event_type) FROM events)::BIGINT AS k,
         (SELECT sum(w * rsum) FROM rj)::BIGINT AS l2,
         tie.ties
  FROM tie),
f AS (
  SELECT b, k, ties, l2,
         (b * k * (k + 1) * (k + 1) // 2)::BIGINT AS mu2,
         (b * k * k * (k + 1) * (k * k - 1) // 36)::BIGINT AS var4
  FROM dims)
SELECT b AS b_users, k AS k_types, ties, l2, mu2,
       round(CAST(l2 - mu2 AS DOUBLE) / sqrt(CAST(var4 AS DOUBLE)), 6)
         AS z6
FROM f
"""


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank
# ---------------------------------------------------------------------------


def q_wilcoxon_signed_rank_click_view(sf_dir: str):
    """Wilcoxon signed-rank z on per-user click-minus-view cents totals
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def diff_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        keep = (et == "click") | (et == "view")
        if not keep.any():
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        uid = (t["user_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64)[keep])
        v = t["value"].to_numpy(zero_copy_only=False)[keep]
        c = (np.sign(v * 100.0)
             * np.floor(np.abs(v * 100.0) + 0.5)).astype(np.int64)
        sgn = np.where(et[keep] == "click", np.int64(1), np.int64(-1))
        df = pd.DataFrame({"user_id": uid, "d": c * sgn})
        g = df.groupby("user_id", sort=False)["d"].sum().reset_index()
        g["d"] = g["d"].astype(np.int64)
        return _strip(g)

    diffs = (ds.map_batches(diff_partial, batch_format="pyarrow")
               .groupby("user_id").aggregate(Sum("d", alias_name="d"))
               .to_pandas())          # O(users) aggregate only
    d = diffs["d"].to_numpy(np.int64)
    d = d[d != 0]
    n = int(len(d))
    ad = np.abs(d)
    order = np.sort(ad)
    # doubled average rank per distinct |d|: 2*#less + m + 1
    uniq, first = np.unique(order, return_index=True)
    m = np.diff(np.append(first, n))
    idx = np.searchsorted(uniq, ad)
    r2 = 2 * first[idx] + m[idx] + 1               # vectorized
    w2 = int(r2[d > 0].sum())
    tt = sum(int(mm) ** 3 - int(mm) for mm in m)
    v24 = n * (n + 1) * (2 * n + 1) - tt // 2
    num4 = 2 * w2 - n * (n + 1)
    z = (float(num4) / 4.0) / math.sqrt(float(v24) / 24.0)
    out = pd.DataFrame({"n_pairs": [n], "w2_pos": [w2], "ties": [tt],
                        "v24": [v24],
                        "z6": [_round6(np.array([z]))[0]]})
    for col in ("n_pairs", "w2_pos", "ties", "v24"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_WILCOXON = """
WITH d0 AS (
  SELECT user_id,
         sum(CASE WHEN event_type = 'click'
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE -CAST(round(value * 100) AS BIGINT) END)::BIGINT
           AS d
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY 1),
d AS (SELECT d, abs(d)::BIGINT AS ad FROM d0 WHERE d != 0),
r AS (
  SELECT d,
         (2 * rank() OVER (ORDER BY ad)
          + count(*) OVER (PARTITION BY ad) - 1)::BIGINT AS r2
  FROM d),
tie AS (
  SELECT coalesce(sum(t * t * t - t), 0)::BIGINT AS tt
  FROM (SELECT ad, count(*)::BIGINT AS t FROM d GROUP BY 1
        HAVING count(*) > 1)),
agg AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN d > 0 THEN r2 ELSE 0 END)::BIGINT AS w2
  FROM r),
f AS (
  SELECT n, w2, tie.tt,
         (n * (n + 1) * (2 * n + 1) - tie.tt // 2)::BIGINT AS v24,
         (2 * w2 - n * (n + 1))::BIGINT AS num4
  FROM agg, tie)
SELECT n AS n_pairs, w2 AS w2_pos, tt AS ties, v24,
       round((CAST(num4 AS DOUBLE) / 4.0)
             / sqrt(CAST(v24 AS DOUBLE) / 24.0), 6) AS z6
FROM f
"""


# ---------------------------------------------------------------------------
# partial correlation
# ---------------------------------------------------------------------------


def q_partial_corr_lineitem(sf_dir: str):
    """Partial correlations among price dollars / quantity / discount
    percent from one exact-moment pass (docstring above)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_extendedprice", "l_quantity", "l_discount"])

    def mom_partial(t: pa.Table) -> pa.Table:
        p = (t["l_extendedprice"].to_numpy(zero_copy_only=False)
             .astype(np.float64))
        x = (np.sign(p) * np.floor(np.abs(p) + 0.5)).astype(np.int64)
        y = (t["l_quantity"].to_numpy(zero_copy_only=False)
             .astype(np.float64))
        y = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        dc = (t["l_discount"].to_numpy(zero_copy_only=False)
              .astype(np.float64) * 100.0)
        z = (np.sign(dc) * np.floor(np.abs(dc) + 0.5)).astype(np.int64)
        return pa.table({
            "n": pa.array([np.int64(len(x))]),
            "sx": pa.array([np.int64(x.sum())]),
            "sy": pa.array([np.int64(y.sum())]),
            "sz": pa.array([np.int64(z.sum())]),
            "sxx": pa.array([np.int64((x * x).sum())]),
            "syy": pa.array([np.int64((y * y).sum())]),
            "szz": pa.array([np.int64((z * z).sum())]),
            "sxy": pa.array([np.int64((x * y).sum())]),
            "sxz": pa.array([np.int64((x * z).sum())]),
            "syz": pa.array([np.int64((y * z).sum())])})

    p = ds.map_batches(mom_partial, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    s = {c: sum(int(v) for v in p[c]) for c in
         ("sx", "sy", "sz", "sxx", "syy", "szz", "sxy", "sxz", "syz")}

    def r_of(sab, sa, sb, saa, sbb):
        num = n * sab - sa * sb
        den = math.sqrt(float(n * saa - sa * sa)) \
            * math.sqrt(float(n * sbb - sb * sb))
        return float(num) / den

    rxy = r_of(s["sxy"], s["sx"], s["sy"], s["sxx"], s["syy"])
    rxz = r_of(s["sxz"], s["sx"], s["sz"], s["sxx"], s["szz"])
    ryz = r_of(s["syz"], s["sy"], s["sz"], s["syy"], s["szz"])

    def pc(rab, rac, rbc):
        return ((rab - rac * rbc)
                / math.sqrt((1.0 - rac * rac) * (1.0 - rbc * rbc)))

    r6 = _round6(np.array([rxy, rxz, ryz,
                           pc(rxy, rxz, ryz),     # price~qty | discount
                           pc(rxz, rxy, ryz),     # price~disc | qty
                           pc(ryz, rxy, rxz)]))   # qty~disc | price
    out = pd.DataFrame({"n": [n], "r_pq6": [r6[0]], "r_pd6": [r6[1]],
                        "r_qd6": [r6[2]], "pc_pq_d6": [r6[3]],
                        "pc_pd_q6": [r6[4]], "pc_qd_p6": [r6[5]]})
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_PARTIAL = """
WITH v AS (
  SELECT CAST(round(l_extendedprice) AS BIGINT) AS x,
         CAST(round(l_quantity) AS BIGINT) AS y,
         CAST(round(l_discount * 100) AS BIGINT) AS z
  FROM lineitem),
m AS (
  SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
         sum(y)::HUGEINT AS sy, sum(z)::HUGEINT AS sz,
         sum(x * x)::HUGEINT AS sxx, sum(y * y)::HUGEINT AS syy,
         sum(z * z)::HUGEINT AS szz, sum(x * y)::HUGEINT AS sxy,
         sum(x * z)::HUGEINT AS sxz, sum(y * z)::HUGEINT AS syz
  FROM v),
r AS (
  SELECT n,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rxy,
         CAST(n * sxz - sx * sz AS DOUBLE)
           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS rxz,
         CAST(n * syz - sy * sz AS DOUBLE)
           / (sqrt(CAST(n * syy - sy * sy AS DOUBLE))
              * sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS ryz
  FROM m)
SELECT n::BIGINT AS n,
       round(rxy, 6) AS r_pq6, round(rxz, 6) AS r_pd6,
       round(ryz, 6) AS r_qd6,
       round((rxy - rxz * ryz)
             / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
         AS pc_pq_d6,
       round((rxz - rxy * ryz)
             / sqrt((1.0 - rxy * rxy) * (1.0 - ryz * ryz)), 6)
         AS pc_pd_q6,
       round((ryz - rxy * rxz)
             / sqrt((1.0 - rxy * rxy) * (1.0 - rxz * rxz)), 6)
         AS pc_qd_p6
FROM r
"""


QUERIES52: dict[str, tuple] = {
    "page_trend_event_types": (q_page_trend_event_types, SQL_PAGE),
    "wilcoxon_signed_rank_click_view": (q_wilcoxon_signed_rank_click_view,
                                        SQL_WILCOXON),
    "partial_corr_lineitem": (q_partial_corr_lineitem, SQL_PARTIAL),
}
