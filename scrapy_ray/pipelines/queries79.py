"""Seventy-ninth oracle-query batch — financial risk statistics of the
daily order-revenue series (all off the one distributed daily-cents
aggregate; driver-side exact integer machinery):

- sortino_omega_daily: on the day-over-day revenue changes
  d_t = c_t - c_{t-1} (exact cents): Omega(0) = SUM gains / SUM
  losses (two exact int64 sums) and the Sortino ratio
  (SUM d / n) / sqrt(SUM_{d<0} d^2 / n) — the downside second moment
  rides Python int / HUGEINT (d^2 ~ 4e18 at sf0.1 overflows int64)
  and never reaches an output column; ratios finalize
  identical-expression.
- ulcer_index_daily: UI = sqrt(mean of squared percent drawdowns
  from the running peak).  peak_t is a window running max; the
  per-day squared-percent term (100*(peak-c)/peak)^2 is quantized to
  1e-6 (bounded by 1e10 << 2^52) and integer-summed, so the mean
  under the sqrt is exact.  Also reports the max drawdown percent
  (an exact-int argmax of (peak-c)*1e9/peak quantized — pass-through
  max).
- kupiec_var_backtest: Kupiec proportion-of-failures LR test of the
  p = 5% VaR: u = exact disc 5th percentile of daily cents, x =
  # days strictly below u (histogram cumsum), and
  LR = -2[(n-x) ln(1-p) + x ln p - (n-x) ln(1-x/n) - x ln(x/n)] —
  pure identical-expression floats of the two exact ints.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents

_US_PER_DAY = 86_400_000_000

_DAILY_SQL = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1)
"""


# ---------------------------------------------------------------------------
# Sortino / Omega
# ---------------------------------------------------------------------------


def q_sortino_omega_daily(sf_dir: str):
    """Omega(0) and Sortino of day-over-day revenue changes (docstring
    above)."""
    c = [int(v) for v in _daily_cents(sf_dir)["c"].to_numpy(np.int64)]
    d = [b - a for a, b in zip(c[:-1], c[1:])]
    n = len(d)
    sd = sum(d)
    gains = sum(v for v in d if v > 0)
    losses = sum(-v for v in d if v < 0)
    neg2 = sum(v * v for v in d if v < 0)
    omega = float(gains) / float(losses)
    sortino = (float(sd) / float(n)) / math.sqrt(float(neg2) / float(n))
    out = pd.DataFrame({"n_diffs": [n], "sum_d": [sd],
                        "sum_gain": [gains], "sum_loss": [losses],
                        "omega6": [_round6(np.array([omega]))[0]],
                        "sortino6": [_round6(np.array([sortino]))[0]]})
    for col in ("n_diffs", "sum_d", "sum_gain", "sum_loss"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SORTINO_OMEGA = _DAILY_SQL + """,
dd AS (
  SELECT c - lag(c) OVER (ORDER BY day) AS d FROM daily),
m AS (
  SELECT count(*)::BIGINT AS n, sum(d)::BIGINT AS sd,
         sum(CASE WHEN d > 0 THEN d ELSE 0 END)::BIGINT AS gains,
         sum(CASE WHEN d < 0 THEN -d ELSE 0 END)::BIGINT AS losses,
         sum(CASE WHEN d < 0 THEN d::HUGEINT * d ELSE 0 END) AS neg2
  FROM dd WHERE d IS NOT NULL)
SELECT n AS n_diffs, sd AS sum_d, gains AS sum_gain, losses AS sum_loss,
       round(CAST(gains AS DOUBLE) / CAST(losses AS DOUBLE), 6)
         AS omega6,
       round((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt(CAST(neg2 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         AS sortino6
FROM m
"""


# ---------------------------------------------------------------------------
# Ulcer index
# ---------------------------------------------------------------------------


def q_ulcer_index_daily(sf_dir: str):
    """Ulcer index + max drawdown percent of the daily series
    (docstring above)."""
    c = _daily_cents(sf_dir)["c"].to_numpy(np.int64)
    n = len(c)
    peak = np.maximum.accumulate(c)
    s_q = 0
    mdd_q = 0
    for pv, cv in zip(peak, c):
        x = 100.0 * float(int(pv) - int(cv)) / float(int(pv))
        s_q += int(math.floor(x * x * 1000000.0 + 0.5))
        dq = int(math.floor(x * 1000000000.0 + 0.5))
        if dq > mdd_q:
            mdd_q = dq
    ui = math.sqrt(float(s_q) / (n * 1000000.0))
    out = pd.DataFrame({"n_days": [n], "s_q": [s_q], "mdd_q": [mdd_q],
                        "ui6": [_round6(np.array([ui]))[0]],
                        "mdd6": [_round6(np.array(
                            [float(mdd_q) / 1e9]))[0]]})
    for col in ("n_days", "s_q", "mdd_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ULCER = _DAILY_SQL + """,
pk AS (
  SELECT c, max(c) OVER (ORDER BY day
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS peak
  FROM daily),
t AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(round((100.0 * CAST(peak - c AS DOUBLE)
                         / CAST(peak AS DOUBLE))
                        * (100.0 * CAST(peak - c AS DOUBLE)
                           / CAST(peak AS DOUBLE))
                        * 1000000.0) AS BIGINT))::BIGINT AS s_q,
         max(CAST(round((100.0 * CAST(peak - c AS DOUBLE)
                         / CAST(peak AS DOUBLE))
                        * 1000000000.0) AS BIGINT))::BIGINT AS mdd_q
  FROM pk)
SELECT n AS n_days, s_q, mdd_q,
       round(sqrt(CAST(s_q AS DOUBLE) / (n * 1000000.0)), 6) AS ui6,
       round(CAST(mdd_q AS DOUBLE) / 1000000000.0, 6) AS mdd6
FROM t
"""


# ---------------------------------------------------------------------------
# Kupiec POF test
# ---------------------------------------------------------------------------


def q_kupiec_var_backtest(sf_dir: str):
    """Kupiec LR test of the 5% VaR exception count (docstring
    above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64)
    srt = np.sort(c)
    n = len(c)
    u = int(srt[math.ceil(0.05 * n) - 1])
    x = int((c < u).sum())
    fx = float(x) / float(n)
    lr = -2.0 * ((n - x) * math.log(0.95) + x * math.log(0.05)
                 - (n - x) * math.log(1.0 - fx) - x * math.log(fx))
    out = pd.DataFrame({"n_days": [n], "var_c": [u], "exceptions": [x],
                        "lr6": [_round6(np.array([lr]))[0]]})
    for col in ("n_days", "var_c", "exceptions"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KUPIEC = _DAILY_SQL + """,
t AS (SELECT count(*)::BIGINT AS n, quantile_disc(c, 0.05) AS u
      FROM daily),
x AS (SELECT count(*)::BIGINT AS x, max(n) AS n, max(u) AS u
      FROM daily CROSS JOIN t WHERE c < u)
SELECT n AS n_days, u AS var_c, x AS exceptions,
       round(-2.0 * ((n - x) * ln(0.95) + x * ln(0.05)
                     - (n - x) * ln(1.0 - CAST(x AS DOUBLE)
                                          / CAST(n AS DOUBLE))
                     - x * ln(CAST(x AS DOUBLE) / CAST(n AS DOUBLE))),
             6) AS lr6
FROM x
"""


QUERIES79: dict[str, tuple] = {
    "sortino_omega_daily": (q_sortino_omega_daily, SQL_SORTINO_OMEGA),
    "ulcer_index_daily": (q_ulcer_index_daily, SQL_ULCER),
    "kupiec_var_backtest": (q_kupiec_var_backtest, SQL_KUPIEC),
}
