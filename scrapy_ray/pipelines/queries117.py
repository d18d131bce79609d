"""One-hundred-seventeenth oracle-query batch — signal analysis of the
daily order-revenue series (row-sequence of observed days, exact
integer cents via the queries47 _daily_cents device):

- peak_prominence_daily: the top-5 strict interior peaks by 1-D
  topographic prominence — for each peak, the nearest strictly-higher
  sample on each side bounds a valley; prominence = height - max(left
  valley min, right valley min), window-bounded at the series edges
  (documented variant for the global max). All exact integer cents;
  ordering (prominence DESC, t ASC) is exact.
- lz78_complexity_daily: the LZ78 phrase count of the binary up/down
  sequence of daily revenue changes, replayed symbol-by-symbol in a
  recursive CTE carrying (pos, phrase, dict); the trailing partial
  phrase counts. Normalized complexity phrases*log2(n)/n finalizes
  identically.
- diebold_mariano_daily: DM test comparing naive (lag-1) vs
  seasonal-naive (lag-7) squared-error forecasts of $1000-quantized
  daily revenue, with a Bartlett/Newey-West L=7 long-run variance.
  Centered cross-products are cleared to exact integers
  (T*d_t - S)(T*d_{t+k} - S) — HUGEINT in SQL, unbounded ints in
  Python — and the Bartlett weights 1-k/8 are exact binary doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents

_US_PER_DAY = 86_400_000_000
_DM_L = 7


# ---------------------------------------------------------------------------
# peak prominence
# ---------------------------------------------------------------------------


def q_peak_prominence_daily(sf_dir: str):
    """Top-5 daily-revenue peaks by prominence (docstring above)."""
    dc = _daily_cents(sf_dir)
    r = dc["c"].to_numpy(np.int64)
    days = dc["day"].to_numpy(np.int64)
    n = len(r)
    rows = []
    for i in range(1, n - 1):
        if not (r[i] > r[i - 1] and r[i] > r[i + 1]):
            continue
        higher_l = np.nonzero(r[:i] > r[i])[0]
        lo = int(higher_l[-1]) + 1 if len(higher_l) else 0
        lmin = int(r[lo:i].min())
        higher_r = np.nonzero(r[i + 1:] > r[i])[0]
        hi = (i + 1 + int(higher_r[0])) if len(higher_r) else n
        rmin = int(r[i + 1:hi].min())
        rows.append((int(r[i]) - max(lmin, rmin), i, int(days[i]),
                     int(r[i])))
    rows.sort(key=lambda x: (-x[0], x[1]))
    top = rows[:5]
    out = pd.DataFrame({"t": [x[1] for x in top],
                        "day": [x[2] for x in top],
                        "height_cents": [x[3] for x in top],
                        "prom_cents": [x[0] for x in top]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_PEAK_PROMINENCE = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
s AS (
  SELECT day, c, row_number() OVER (ORDER BY day) - 1 AS t FROM daily),
nd AS (SELECT max(t) AS tmax FROM s),
pk AS (
  SELECT t, day, c FROM (
    SELECT t, day, c,
           lag(c) OVER (ORDER BY t) AS pc,
           lead(c) OVER (ORDER BY t) AS nc
    FROM s)
  WHERE pc IS NOT NULL AND nc IS NOT NULL AND c > pc AND c > nc),
lb AS (
  SELECT p.t, coalesce(max(s.t), -1) AS lt
  FROM pk p LEFT JOIN s ON s.t < p.t AND s.c > p.c GROUP BY 1),
rb AS (
  SELECT p.t, coalesce(min(s.t), (SELECT tmax + 1 FROM nd)) AS rt
  FROM pk p LEFT JOIN s ON s.t > p.t AND s.c > p.c GROUP BY 1),
lm AS (
  SELECT p.t, min(s.c) AS lmin
  FROM pk p JOIN lb USING (t) JOIN s ON s.t > lb.lt AND s.t < p.t
  GROUP BY 1),
rm AS (
  SELECT p.t, min(s.c) AS rmin
  FROM pk p JOIN rb USING (t) JOIN s ON s.t < rb.rt AND s.t > p.t
  GROUP BY 1)
SELECT p.t, p.day, p.c AS height_cents,
       p.c - greatest(lm.lmin, rm.rmin) AS prom_cents
FROM pk p JOIN lm USING (t) JOIN rm USING (t)
ORDER BY prom_cents DESC, p.t LIMIT 5
"""


# ---------------------------------------------------------------------------
# LZ78 complexity
# ---------------------------------------------------------------------------


def q_lz78_complexity_daily(sf_dir: str):
    """LZ78 phrase count of the up/down sequence (docstring above)."""
    dc = _daily_cents(sf_dir)
    r = dc["c"].to_numpy(np.int64)
    sym = "".join("1" if r[i] > r[i - 1] else "0"
                  for i in range(1, len(r)))
    n = len(sym)
    seen: set[str] = set()
    phrase = ""
    cnt = 0
    for ch in sym:
        cand = phrase + ch
        if cand in seen:
            phrase = cand
        else:
            seen.add(cand)
            cnt += 1
            phrase = ""
    phrases = cnt + (1 if phrase else 0)
    c_norm = (float(phrases) * (np.log(float(n)) / np.log(2.0))
              / float(n))
    out = pd.DataFrame({"n_symbols": [n], "n_phrases": [phrases],
                        "cnorm6": [_round6(np.array([c_norm]))[0]]})
    for col in ("n_symbols", "n_phrases"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LZ78 = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
s AS (
  SELECT day, c, row_number() OVER (ORDER BY day) - 1 AS t FROM daily),
sym AS (
  SELECT string_agg(CASE WHEN c > pc THEN '1' ELSE '0' END, ''
                    ORDER BY t) AS str
  FROM (SELECT t, c, lag(c) OVER (ORDER BY t) AS pc FROM s)
  WHERE pc IS NOT NULL),
lz(pos, phrase, dict, cnt) AS (
  SELECT 1, '', '', 0
  UNION ALL
  SELECT pos + 1,
         CASE WHEN instr(',' || dict || ',',
                         ',' || phrase || substr(str, pos, 1) || ',') > 0
              THEN phrase || substr(str, pos, 1) ELSE '' END,
         CASE WHEN instr(',' || dict || ',',
                         ',' || phrase || substr(str, pos, 1) || ',') > 0
              THEN dict
              ELSE dict || ',' || phrase || substr(str, pos, 1) END,
         CASE WHEN instr(',' || dict || ',',
                         ',' || phrase || substr(str, pos, 1) || ',') > 0
              THEN cnt ELSE cnt + 1 END
  FROM lz, sym WHERE pos <= len(str)),
fin AS (
  SELECT len(str) AS n,
         (SELECT cnt + (phrase <> '')::INT FROM lz, sym
          WHERE pos = len(str) + 1) AS phrases
  FROM sym)
SELECT n AS n_symbols, phrases AS n_phrases,
       round(CAST(phrases AS DOUBLE)
             * (ln(CAST(n AS DOUBLE)) / ln(2.0))
             / CAST(n AS DOUBLE), 6) AS cnorm6
FROM fin
"""


# ---------------------------------------------------------------------------
# Diebold-Mariano
# ---------------------------------------------------------------------------


def q_diebold_mariano_daily(sf_dir: str):
    """DM test naive vs seasonal-naive on $1000-quantized revenue
    (docstring above)."""
    dc = _daily_cents(sf_dir)
    v = [int(x) // 100000 for x in dc["c"]]
    n = len(v)
    d = [(v[t] - v[t - 1]) ** 2 - (v[t] - v[t - 7]) ** 2
         for t in range(7, n)]
    big_t = len(d)
    s = sum(d)
    cen = [big_t * x - s for x in d]
    g = [sum(cen[t] * cen[t + k] for t in range(big_t - k))
         for k in range(_DM_L + 1)]
    tf = float(big_t)
    gf = [float(x) / (tf * tf * tf) for x in g]
    var = gf[0]
    for k in range(1, _DM_L + 1):
        var += 2.0 * (1.0 - float(k) / 8.0) * gf[k]
    dbar = float(s) / tf
    dm = dbar / np.sqrt(var / tf)
    out = pd.DataFrame({"t_n": [big_t], "s_d": [s],
                        "dbar6": [_round6(np.array([dbar]))[0]],
                        "dm6": [_round6(np.array([dm]))[0]]})
    for col in ("t_n", "s_d"):
        out[col] = out[col].astype(np.int64)
    return out


def _dm_sql() -> str:
    gk = []
    for k in range(_DM_L + 1):
        gk.append(f"""
  SELECT {k} AS k,
         sum((CAST(tt AS HUGEINT) * CAST(a.d AS HUGEINT)
              - CAST(sd AS HUGEINT))
             * (CAST(tt AS HUGEINT) * CAST(b.d AS HUGEINT)
                - CAST(sd AS HUGEINT))) AS g
  FROM dd a JOIN dd b ON b.td = a.td + {k} CROSS JOIN ns""")
    w = " + ".join(
        ["CAST((SELECT g FROM gk WHERE k = 0) AS DOUBLE) / t3"]
        + [f"2.0 * {1.0 - k / 8.0!r} * "
           f"(CAST((SELECT g FROM gk WHERE k = {k}) AS DOUBLE) / t3)"
           for k in range(1, _DM_L + 1)])
    return f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
s AS (
  SELECT c // 100000 AS v, row_number() OVER (ORDER BY day) - 1 AS t
  FROM daily),
dd AS (
  SELECT t - 7 AS td,
         (v - lag(v, 1) OVER (ORDER BY t))
           * (v - lag(v, 1) OVER (ORDER BY t))
         - (v - lag(v, 7) OVER (ORDER BY t))
           * (v - lag(v, 7) OVER (ORDER BY t)) AS d
  FROM s QUALIFY t >= 7),
ns AS (SELECT count(*)::BIGINT AS tt, sum(d)::BIGINT AS sd FROM dd),
gk AS ({" UNION ALL ".join(gk)}),
f AS (
  SELECT tt, sd,
         CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)
           AS t3
  FROM ns)
SELECT tt AS t_n, sd AS s_d,
       round(CAST(sd AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS dbar6,
       round((CAST(sd AS DOUBLE) / CAST(tt AS DOUBLE))
             / sqrt(({w}) / CAST(tt AS DOUBLE)), 6) AS dm6
FROM f
"""


SQL_DIEBOLD_MARIANO = _dm_sql()


QUERIES117: dict[str, tuple] = {
    "peak_prominence_daily": (q_peak_prominence_daily,
                              SQL_PEAK_PROMINENCE),
    "lz78_complexity_daily": (q_lz78_complexity_daily, SQL_LZ78),
    "diebold_mariano_daily": (q_diebold_mariano_daily,
                              SQL_DIEBOLD_MARIANO),
}
