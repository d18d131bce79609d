"""Seventy-second oracle-query batch — survival-analysis extras on the
right-censored inter-purchase gap histogram (shared `_gap_hist` base
from queries26's Kaplan-Meier; one user-co-partitioned distributed
pass, everything downstream exact driver-side arithmetic):

- nelson_aalen_gaps: Nelson-Aalen cumulative hazard
  H(t) = SUM_{t_i<=t} d_i/n_i with each step quantized to 1e-12 and
  integer-cumsummed (the KM ln-step discipline applied to the hazard),
  plus the Fleming-Harrington survival exp(-H) — identical-expression
  floats of the exact cumulative.
- greenwood_km_ci: Greenwood variance of the KM estimator,
  Var = S(t)^2 * SUM d/(n*(n-d)), with the per-step rational
  quantized to 1e-12 and integer-cumsummed; S(t) reuses the exact KM
  ln-step cumulative; se and the plain 95% CI (S -/+ 1.96*se)
  finalize identical-expression.  Steps where d = n_risk (S hits 0,
  Greenwood term divides by zero) are excluded from the OUTPUT rows
  (WHERE d < n_risk both sides) — the CI path is reported where
  defined (probe: such a step exists at every sf — it is the final
  complete gap).
- rmst_purchase_gaps: restricted mean survival time to tau = the
  exact p90 duration (quantile_disc rank rule on the merged
  histogram).  RMST = SUM S_{i-1} * (min(t_i,tau) - min(t_{i-1},tau))
  + S_k * (tau - min(t_k,tau)); each term is quantized to 1e-6
  (S values are identical-expression exps of the exact KM
  cumulative; interval lengths are exact ints; term <= tau*1e6
  ~ 4e11 << 2^52) and integer-summed — no float-sum-order
  dependence.  Output: n_durations, tau_s, rmst_q, rmst6.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries26 import _KM_FLOOR, _KM_SCALE, _gap_hist


def _risk(hist: pd.DataFrame):
    cnt = hist["cnt"].to_numpy().astype(np.int64)
    d = hist["d"].to_numpy().astype(np.int64)
    total = int(cnt.sum())
    below = np.concatenate([[0], np.cumsum(cnt[:-1])])
    n_risk = total - below
    return hist["gap"].to_numpy().astype(np.int64), d, n_risk, cnt, total


# ---------------------------------------------------------------------------
# Nelson-Aalen
# ---------------------------------------------------------------------------


def q_nelson_aalen_gaps(sf_dir: str):
    """Nelson-Aalen cumulative hazard + Fleming-Harrington survival
    (docstring above)."""
    gap, d, n_risk, _, _ = _risk(_gap_hist(sf_dir))
    ev = d > 0
    t_s, d_i, n_i = gap[ev], d[ev], n_risk[ev]
    units = np.floor(d_i.astype(np.float64) / n_i.astype(np.float64)
                     * _KM_SCALE + 0.5).astype(np.int64)
    cum = np.cumsum(units)
    h6 = _round6(cum / float(_KM_SCALE))
    sfh6 = _round6(np.exp(-(cum / float(_KM_SCALE))))
    out = pd.DataFrame({"t_s": t_s.astype(np.int64),
                        "d": d_i.astype(np.int64),
                        "n_risk": n_i.astype(np.int64),
                        "h6": h6, "surv_fh6": sfh6})
    return out


SQL_NELSON_AALEN = f"""
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
mx AS (SELECT max(ts) AS m FROM events),
g AS (
  SELECT user_id, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM p),
allg AS (
  SELECT (epoch_us(nxt) - epoch_us(ts)) // 1000000 AS gap, 1::BIGINT AS d
  FROM g WHERE nxt IS NOT NULL
  UNION ALL
  SELECT (epoch_us((SELECT m FROM mx)) - epoch_us(max(ts))) // 1000000,
         0::BIGINT
  FROM p GROUP BY user_id),
h AS (SELECT gap, sum(d)::BIGINT AS d, count(*)::BIGINT AS cnt
      FROM allg GROUP BY 1),
r AS (
  SELECT gap, d, cnt,
         (SELECT sum(cnt) FROM h)
           - (sum(cnt) OVER (ORDER BY gap) - cnt) AS n_risk
  FROM h),
u AS (
  SELECT gap AS t_s, d, n_risk::BIGINT AS n_risk,
         CAST(round(d::DOUBLE / n_risk * {_KM_SCALE}) AS BIGINT) AS units
  FROM r WHERE d > 0)
SELECT t_s, d, n_risk,
       round(sum(units) OVER (ORDER BY t_s) / {_KM_SCALE}.0, 6) AS h6,
       round(exp(-(sum(units) OVER (ORDER BY t_s) / {_KM_SCALE}.0)), 6)
         AS surv_fh6
FROM u ORDER BY t_s
"""


# ---------------------------------------------------------------------------
# Greenwood variance / CI
# ---------------------------------------------------------------------------


def q_greenwood_km_ci(sf_dir: str):
    """Greenwood SE and plain 95% CI of the KM curve (docstring
    above)."""
    gap, d, n_risk, _, _ = _risk(_gap_hist(sf_dir))
    ev = d > 0
    t_s, d_i, n_i = gap[ev], d[ev], n_risk[ev]
    frac = 1.0 - d_i.astype(np.float64) / n_i.astype(np.float64)
    with np.errstate(divide="ignore"):
        lx = np.log(frac) * _KM_SCALE
    ln_units = np.where(d_i == n_i, float(_KM_FLOOR),
                        np.where(lx >= 0, np.floor(lx + 0.5),
                                 np.ceil(lx - 0.5))).astype(np.int64)
    ln_cum = np.cumsum(ln_units)
    with np.errstate(divide="ignore"):
        gw = np.where(
            d_i == n_i, 0.0,
            d_i.astype(np.float64)
            / (n_i.astype(np.float64) * (n_i - d_i).astype(np.float64))
            * _KM_SCALE)
    gw_units = np.floor(gw + 0.5).astype(np.int64)
    gw_cum = np.cumsum(gw_units)
    keep = d_i < n_i
    s_val = np.exp(ln_cum[keep] / float(_KM_SCALE))
    se = s_val * np.sqrt(gw_cum[keep] / float(_KM_SCALE))
    out = pd.DataFrame({"t_s": t_s[keep].astype(np.int64),
                        "d": d_i[keep].astype(np.int64),
                        "n_risk": n_i[keep].astype(np.int64),
                        "se6": _round6(se),
                        "lo6": _round6(s_val - 1.96 * se),
                        "hi6": _round6(s_val + 1.96 * se)})
    return out


SQL_GREENWOOD = f"""
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
mx AS (SELECT max(ts) AS m FROM events),
g AS (
  SELECT user_id, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM p),
allg AS (
  SELECT (epoch_us(nxt) - epoch_us(ts)) // 1000000 AS gap, 1::BIGINT AS d
  FROM g WHERE nxt IS NOT NULL
  UNION ALL
  SELECT (epoch_us((SELECT m FROM mx)) - epoch_us(max(ts))) // 1000000,
         0::BIGINT
  FROM p GROUP BY user_id),
h AS (SELECT gap, sum(d)::BIGINT AS d, count(*)::BIGINT AS cnt
      FROM allg GROUP BY 1),
r AS (
  SELECT gap, d, cnt,
         (SELECT sum(cnt) FROM h)
           - (sum(cnt) OVER (ORDER BY gap) - cnt) AS n_risk
  FROM h),
u AS (
  SELECT gap AS t_s, d, n_risk::BIGINT AS n_risk,
         CASE WHEN d = n_risk THEN {_KM_FLOOR}
              ELSE CAST(round(ln(1.0 - d::DOUBLE / n_risk) * {_KM_SCALE})
                        AS BIGINT) END AS ln_units,
         CASE WHEN d = n_risk THEN 0
              ELSE CAST(round(d::DOUBLE / (n_risk::DOUBLE * (n_risk - d))
                              * {_KM_SCALE}) AS BIGINT) END AS gw_units
  FROM r WHERE d > 0),
c AS (
  SELECT t_s, d, n_risk,
         exp(sum(ln_units) OVER (ORDER BY t_s) / {_KM_SCALE}.0) AS s_val,
         sum(gw_units) OVER (ORDER BY t_s) / {_KM_SCALE}.0 AS gw
  FROM u)
SELECT t_s, d, n_risk,
       round(s_val * sqrt(gw), 6) AS se6,
       round(s_val - 1.96 * (s_val * sqrt(gw)), 6) AS lo6,
       round(s_val + 1.96 * (s_val * sqrt(gw)), 6) AS hi6
FROM c WHERE d < n_risk ORDER BY t_s
"""


# ---------------------------------------------------------------------------
# Restricted mean survival time
# ---------------------------------------------------------------------------


def q_rmst_purchase_gaps(sf_dir: str):
    """RMST to the exact p90 duration (docstring above)."""
    gap, d, n_risk, cnt, total = _risk(_gap_hist(sf_dir))
    rank = math.ceil(0.9 * total)
    tau = int(gap[np.searchsorted(np.cumsum(cnt), rank)])
    ev = d > 0
    t_s, d_i, n_i = gap[ev], d[ev], n_risk[ev]
    frac = 1.0 - d_i.astype(np.float64) / n_i.astype(np.float64)
    with np.errstate(divide="ignore"):
        lx = np.log(frac) * _KM_SCALE
    ln_units = np.where(d_i == n_i, float(_KM_FLOOR),
                        np.where(lx >= 0, np.floor(lx + 0.5),
                                 np.ceil(lx - 0.5))).astype(np.int64)
    ln_cum = np.cumsum(ln_units)
    s_prev = np.exp(np.concatenate([[0], ln_cum[:-1]])
                    / float(_KM_SCALE))            # S before each step
    t_prev = np.concatenate([[0], t_s[:-1]])
    seg = (np.minimum(t_s, tau) - np.minimum(t_prev, tau)) \
        .astype(np.float64)
    terms = np.floor(s_prev * seg * 1000000.0 + 0.5).astype(np.int64)
    s_last = math.exp(float(ln_cum[-1]) / float(_KM_SCALE))
    tail = int(math.floor(s_last * float(tau - min(int(t_s[-1]), tau))
                          * 1000000.0 + 0.5))
    rmst_q = int(terms.sum()) + tail
    rmst6 = _round6(np.array([float(rmst_q) / 1000000.0]))[0]
    out = pd.DataFrame({"n_durations": [total], "tau_s": [tau],
                        "rmst_q": [rmst_q], "rmst6": [rmst6]})
    for col in ("n_durations", "tau_s", "rmst_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RMST = f"""
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
mx AS (SELECT max(ts) AS m FROM events),
g AS (
  SELECT user_id, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM p),
allg AS (
  SELECT (epoch_us(nxt) - epoch_us(ts)) // 1000000 AS gap, 1::BIGINT AS d
  FROM g WHERE nxt IS NOT NULL
  UNION ALL
  SELECT (epoch_us((SELECT m FROM mx)) - epoch_us(max(ts))) // 1000000,
         0::BIGINT
  FROM p GROUP BY user_id),
h AS (SELECT gap, sum(d)::BIGINT AS d, count(*)::BIGINT AS cnt
      FROM allg GROUP BY 1),
tot AS (SELECT sum(cnt)::BIGINT AS total FROM h),
tau AS (
  SELECT min(gap)::BIGINT AS tau, max(total) AS total FROM (
    SELECT gap, sum(cnt) OVER (ORDER BY gap) AS cum, total
    FROM h CROSS JOIN tot)
  WHERE cum >= ceil(0.9 * total)),
r AS (
  SELECT gap, d, cnt,
         (SELECT sum(cnt) FROM h)
           - (sum(cnt) OVER (ORDER BY gap) - cnt) AS n_risk
  FROM h),
u AS (
  SELECT gap AS t_s, d, n_risk::BIGINT AS n_risk,
         CASE WHEN d = n_risk THEN {_KM_FLOOR}
              ELSE CAST(round(ln(1.0 - d::DOUBLE / n_risk) * {_KM_SCALE})
                        AS BIGINT) END AS ln_units
  FROM r WHERE d > 0),
c AS (
  SELECT t_s,
         sum(ln_units) OVER (ORDER BY t_s) AS ln_cum,
         coalesce(sum(ln_units) OVER (
           ORDER BY t_s ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS ln_prev,
         coalesce(lag(t_s) OVER (ORDER BY t_s), 0) AS t_prev
  FROM u),
body AS (
  SELECT sum(CAST(round(exp(ln_prev / {_KM_SCALE}.0)
                        * CAST(least(t_s, tau) - least(t_prev, tau)
                               AS DOUBLE)
                        * 1000000.0) AS BIGINT))::BIGINT AS terms
  FROM c CROSS JOIN tau),
tail AS (
  SELECT CAST(round(exp(max_lncum / {_KM_SCALE}.0)
                    * CAST(tau - least(max_t, tau) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS tail_q
  FROM (SELECT max(t_s) AS max_t,
               (SELECT ln_cum FROM c ORDER BY t_s DESC LIMIT 1)
                 AS max_lncum
        FROM c) CROSS JOIN tau)
SELECT total AS n_durations, tau AS tau_s,
       (terms + tail_q)::BIGINT AS rmst_q,
       round(CAST(terms + tail_q AS DOUBLE) / 1000000.0, 6) AS rmst6
FROM body, tail, tau
"""


QUERIES72: dict[str, tuple] = {
    "nelson_aalen_gaps": (q_nelson_aalen_gaps, SQL_NELSON_AALEN),
    "greenwood_km_ci": (q_greenwood_km_ci, SQL_GREENWOOD),
    "rmst_purchase_gaps": (q_rmst_purchase_gaps, SQL_RMST),
}
