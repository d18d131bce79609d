"""One-hundred-sixty-eighth oracle-query batch — classical stringology
on the daily orders up/down string (first 365 order days; length-364
binary string, long enough that naive drivers would hurt but the
enumeration oracle stays bounded at n(n+1)/2 ≈ 66k substrings):

- distinct_substrings_updown: the number of DISTINCT substrings via
  the suffix-array + adjacent-LCP identity n(n+1)/2 − ΣLCP; the
  max adjacent LCP equals the longest-repeated-substring length and
  is cross-checked by the oracle's count(*)≥2 enumeration.
- longest_palindrome_updown: longest palindromic substring length
  and the palindromic complexity (count of distinct palindromic
  substrings — ≤ n+1 by the Eertree theorem) via center expansion;
  the oracle filters the substring enumeration on sub = reverse(sub).
- border_period_updown: KMP failure-function border chain — the
  longest proper border, the smallest period n − border, the number
  of borders (= length of the failure chain), and a periodicity flag
  (period divides n strictly); the oracle enumerates prefix=suffix
  matches directly.

The daily revenue series is aggregated distributed (day-grain exact
cents groupby); only the ≤365-value series reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries122 import _updown

_CAP_DAYS = 365


def _order_daily_updown(sf_dir: str) -> str:
    """Up/down string of daily order revenue over the first 365 order
    days (ties are down — the `>` rule), built from a distributed
    day-grain exact-cents aggregate."""
    ds = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = pc.cast(pc.floor_temporal(t["o_orderdate"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"day": day, "rev": c}) \
            .groupby("day", sort=False).sum().reset_index()
        g["rev"] = g["rev"].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(dpart, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("rev", alias_name="rev"))
             .to_pandas().sort_values("day").head(_CAP_DAYS))
    return "".join("u" if v > 0 else "d"
                   for v in _updown(agg["rev"].to_numpy(np.int64)))


_SQL_S = f"""
dly AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev
  FROM orders GROUP BY 1),
r AS (SELECT day, rev, row_number() OVER (ORDER BY day) AS rn
      FROM dly),
d AS (
  SELECT CASE WHEN rev > lag(rev) OVER (ORDER BY day)
              THEN 'u' ELSE 'd' END AS ra, rn
  FROM (SELECT * FROM r WHERE rn <= {_CAP_DAYS})),
s AS (SELECT string_agg(ra, '' ORDER BY rn) AS s FROM d WHERE rn > 1)
"""

_SQL_SUBS = """
subs AS (
  SELECT substr(s.s, i.i, l.l) AS sub, l.l AS l
  FROM s,
       LATERAL (SELECT unnest(range(1, length(s.s) + 1)) AS i) i,
       LATERAL (SELECT unnest(range(1, length(s.s) - i.i + 2))
                AS l) l)
"""


# ---------------------------------------------------------------------------
# Distinct substrings (suffix array + LCP)
# ---------------------------------------------------------------------------


def q_distinct_substrings_updown(sf_dir: str):
    """Distinct-substring count via suffix array + LCP (docstring)."""
    s = _order_daily_updown(sf_dir)
    n = len(s)
    sa = sorted(range(n), key=lambda i: s[i:])
    lcps = []
    for a, b in zip(sa, sa[1:]):
        x, y = s[a:], s[b:]
        k = 0
        m = min(len(x), len(y))
        while k < m and x[k] == y[k]:
            k += 1
        lcps.append(k)
    total = n * (n + 1) // 2
    n_distinct = total - sum(lcps)
    max_lcp = max(lcps) if lcps else 0
    out = pd.DataFrame({"n": [n], "total_subs": [total],
                        "n_distinct": [n_distinct],
                        "max_repeat_len": [max_lcp]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_DISTINCT_SUBS = f"""
WITH {_SQL_S}, {_SQL_SUBS},
rep AS (
  SELECT l FROM subs GROUP BY sub, l HAVING count(*) >= 2)
SELECT (SELECT length(s) FROM s)::BIGINT AS n,
       (SELECT count(*) FROM subs)::BIGINT AS total_subs,
       (SELECT count(DISTINCT sub) FROM subs)::BIGINT AS n_distinct,
       coalesce((SELECT max(l) FROM rep), 0)::BIGINT
         AS max_repeat_len
"""


# ---------------------------------------------------------------------------
# Palindromic complexity
# ---------------------------------------------------------------------------


def q_longest_palindrome_updown(sf_dir: str):
    """Longest palindromic substring + palindromic complexity."""
    s = _order_daily_updown(sf_dir)
    n = len(s)
    best = 0
    seen: set[str] = set()
    for c in range(n):
        r = 0
        while c - r >= 0 and c + r < n and s[c - r] == s[c + r]:
            seen.add(s[c - r:c + r + 1])
            best = max(best, 2 * r + 1)
            r += 1
        r = 0
        while c - r >= 0 and c + 1 + r < n \
                and s[c - r] == s[c + 1 + r]:
            seen.add(s[c - r:c + 2 + r])
            best = max(best, 2 * r + 2)
            r += 1
    out = pd.DataFrame({"n": [n], "max_palin_len": [best],
                        "n_distinct_palin": [len(seen)]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_PALINDROME = f"""
WITH {_SQL_S}, {_SQL_SUBS},
pal AS (SELECT sub, l FROM subs WHERE sub = reverse(sub))
SELECT (SELECT length(s) FROM s)::BIGINT AS n,
       coalesce((SELECT max(l) FROM pal), 0)::BIGINT
         AS max_palin_len,
       (SELECT count(DISTINCT sub) FROM pal)::BIGINT
         AS n_distinct_palin
"""


# ---------------------------------------------------------------------------
# Border / period (KMP failure chain)
# ---------------------------------------------------------------------------


def q_border_period_updown(sf_dir: str):
    """KMP border chain: longest border, smallest period, #borders."""
    s = _order_daily_updown(sf_dir)
    n = len(s)
    fail = np.zeros(n + 1, np.int64)
    k = 0
    for i in range(1, n):
        while k > 0 and s[i] != s[k]:
            k = int(fail[k])
        if s[i] == s[k]:
            k += 1
        fail[i + 1] = k
    borders = []
    b = int(fail[n])
    while b > 0:
        borders.append(b)
        b = int(fail[b])
    longest = borders[0] if borders else 0
    period = n - longest
    out = pd.DataFrame({
        "n": [n], "longest_border": [longest],
        "smallest_period": [period], "n_borders": [len(borders)],
        "periodic_flag": [1 if (period < n and n % period == 0)
                          else 0]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_BORDER = f"""
WITH {_SQL_S},
bord AS (
  SELECT k.k AS k
  FROM s, LATERAL (SELECT unnest(range(1, length(s.s))) AS k) k
  WHERE substr(s.s, 1, k.k)
        = substr(s.s, length(s.s) - k.k + 1, k.k)),
agg AS (
  SELECT (SELECT length(s) FROM s) AS n,
         coalesce(max(k), 0) AS lb, count(*) AS nb
  FROM bord)
SELECT n::BIGINT AS n, lb::BIGINT AS longest_border,
       (n - lb)::BIGINT AS smallest_period, nb::BIGINT AS n_borders,
       (CASE WHEN (n - lb) < n AND n % (n - lb) = 0
             THEN 1 ELSE 0 END)::BIGINT AS periodic_flag
FROM agg
"""


QUERIES168: dict[str, tuple] = {
    "distinct_substrings_updown": (q_distinct_substrings_updown,
                                   SQL_DISTINCT_SUBS),
    "longest_palindrome_updown": (q_longest_palindrome_updown,
                                  SQL_PALINDROME),
    "border_period_updown": (q_border_period_updown, SQL_BORDER),
}
