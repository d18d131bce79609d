"""Eighty-first oracle-query batch — state-space filtering / volatility
bands / drawdown spells on the daily revenue series:

- kalman_level_daily: a 1-D local-level Kalman filter (Q = 1e16,
  R = 1e18 cents^2 literals) replayed step-for-step: the float
  recurrence l' = l + K(y-l), P' = (1-K)(P+Q), K = (P+Q)/((P+Q)+R)
  is textually identical in the Python loop and the recursive-CTE
  oracle (the holt_linear_daily idiom) — bit-equal before round6.
  Reports the final level/variance/gain.
- bollinger_breach_daily: 20-day trailing Bollinger band breaches
  WITHOUT any float sigma: c > mean + 2*sd over the window w
  (sample sd) iff (c*w - S) > 0 AND (c*w - S)^2 * (w-1) >
  4*w*(w*S2 - S^2) — pure exact-integer inequalities ((c*w-S)^2 ~
  8e23 at sf0.1 — Python int / HUGEINT), symmetric for the lower
  band; counts over all days with a full window.
- underwater_duration_daily: drawdown spells — days strictly below
  the running peak — as gaps-and-islands: longest spell, number of
  spells, and peak-touch day count, all exact ints (SQL groups
  consecutive underwater days by rn - row_number() within the
  underwater subset).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents

_US_PER_DAY = 86_400_000_000
_KQ = 1e16
_KR = 1e18
_BW = 20

_DAILY_SQL = f"""
WITH {{rec}}daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
seq AS (SELECT c, row_number() OVER (ORDER BY day) AS rn FROM daily)
"""


# ---------------------------------------------------------------------------
# Kalman local-level filter
# ---------------------------------------------------------------------------


def q_kalman_level_daily(sf_dir: str):
    """Local-level Kalman filter replay (docstring above)."""
    y = _daily_cents(sf_dir)["c"].to_numpy(np.int64).astype(np.float64)
    n = len(y)
    lvl = y[0]
    p = 1000000.0
    k = 0.0
    for t in range(1, n):
        k = (p + _KQ) / ((p + _KQ) + _KR)
        lvl = lvl + k * (y[t] - lvl)
        p = (1.0 - k) * (p + _KQ)
    out = pd.DataFrame({"n_days": [np.int64(n)],
                        "level6": [_round6(np.array([lvl]))[0]],
                        "p6": [_round6(np.array([p]))[0]],
                        "k6": [_round6(np.array([k]))[0]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_KALMAN = _DAILY_SQL.replace("{rec}", "RECURSIVE ") + f""",
g AS (SELECT rn AS t, c::DOUBLE AS y FROM seq),
nd AS (SELECT max(t) AS dd FROM g),
r AS (
  SELECT 1::BIGINT AS t, y AS l, 1000000.0::DOUBLE AS p,
         0.0::DOUBLE AS k
  FROM g WHERE t = 1
  UNION ALL
  SELECT g.t,
         r.l + ((r.p + {_KQ!r}) / ((r.p + {_KQ!r}) + {_KR!r}))
               * (g.y - r.l) AS l,
         (1.0 - ((r.p + {_KQ!r}) / ((r.p + {_KQ!r}) + {_KR!r})))
           * (r.p + {_KQ!r}) AS p,
         ((r.p + {_KQ!r}) / ((r.p + {_KQ!r}) + {_KR!r})) AS k
  FROM r JOIN g ON g.t = r.t + 1)
SELECT (SELECT dd FROM nd)::BIGINT AS n_days,
       round(l, 6) AS level6, round(p, 6) AS p6, round(k, 6) AS k6
FROM r WHERE t = (SELECT dd FROM nd)
"""


# ---------------------------------------------------------------------------
# Bollinger breaches
# ---------------------------------------------------------------------------


def q_bollinger_breach_daily(sf_dir: str):
    """20-day Bollinger breaches via exact integer inequalities
    (docstring above)."""
    c = [int(v) for v in _daily_cents(sf_dir)["c"].to_numpy(np.int64)]
    n = len(c)
    w = _BW
    up = lo = 0
    n_eval = 0
    s = sum(c[:w])
    s2 = sum(v * v for v in c[:w])
    for i in range(w - 1, n):
        if i >= w:
            s += c[i] - c[i - w]
            s2 += c[i] * c[i] - c[i - w] * c[i - w]
        n_eval += 1
        d = c[i] * w - s
        rhs = 4 * w * (w * s2 - s * s)
        if d > 0 and d * d * (w - 1) > rhs:
            up += 1
        elif d < 0 and d * d * (w - 1) > rhs:
            lo += 1
    out = pd.DataFrame({"n_eval": [n_eval], "upper_breach": [up],
                        "lower_breach": [lo]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_BOLLINGER = _DAILY_SQL.replace("{rec}", "") + f""",
wsum AS (
  SELECT c, rn,
         sum(c) OVER (ORDER BY rn ROWS BETWEEN {_BW - 1} PRECEDING
                      AND CURRENT ROW)::BIGINT AS s,
         sum(c::HUGEINT * c) OVER (ORDER BY rn
                                   ROWS BETWEEN {_BW - 1} PRECEDING
                                   AND CURRENT ROW) AS s2
  FROM seq),
e AS (
  SELECT (c * {_BW} - s)::HUGEINT AS d,
         4::HUGEINT * {_BW} * ({_BW}::HUGEINT * s2 - s::HUGEINT * s)
           AS rhs
  FROM wsum WHERE rn >= {_BW})
SELECT count(*)::BIGINT AS n_eval,
       sum((d > 0 AND d * d * {_BW - 1} > rhs)::INT)::BIGINT
         AS upper_breach,
       sum((d < 0 AND d * d * {_BW - 1} > rhs)::INT)::BIGINT
         AS lower_breach
FROM e
"""


# ---------------------------------------------------------------------------
# Underwater durations
# ---------------------------------------------------------------------------


def q_underwater_duration_daily(sf_dir: str):
    """Drawdown spell statistics, gaps-and-islands (docstring
    above)."""
    c = _daily_cents(sf_dir)["c"].to_numpy(np.int64)
    peak = np.maximum.accumulate(c)
    uw = c < peak
    longest = cur = spells = 0
    prev = False
    for f in uw:
        if f:
            cur = cur + 1 if prev else 1
            if cur == 1:
                spells += 1
            longest = max(longest, cur)
        else:
            cur = 0
        prev = bool(f)
    out = pd.DataFrame({"n_days": [len(c)],
                        "peak_days": [int((~uw).sum())],
                        "n_spells": [spells],
                        "longest_spell": [longest]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_UNDERWATER = _DAILY_SQL.replace("{rec}", "") + """,
pk AS (
  SELECT rn, c,
         max(c) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING)::BIGINT
           AS peak
  FROM seq),
uw AS (SELECT rn FROM pk WHERE c < peak),
runs AS (
  SELECT rn - row_number() OVER (ORDER BY rn) AS grp FROM uw),
sp AS (SELECT count(*)::BIGINT AS len FROM runs GROUP BY grp)
SELECT (SELECT count(*)::BIGINT FROM pk) AS n_days,
       (SELECT count(*)::BIGINT FROM pk WHERE c >= peak) AS peak_days,
       coalesce((SELECT count(*)::BIGINT FROM sp), 0) AS n_spells,
       coalesce((SELECT max(len)::BIGINT FROM sp), 0) AS longest_spell
"""


QUERIES81: dict[str, tuple] = {
    "kalman_level_daily": (q_kalman_level_daily, SQL_KALMAN),
    "bollinger_breach_daily": (q_bollinger_breach_daily, SQL_BOLLINGER),
    "underwater_duration_daily": (q_underwater_duration_daily,
                                  SQL_UNDERWATER),
}
