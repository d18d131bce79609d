"""One-hundred-forty-fifth oracle-query batch — string-distance
algorithms checked against INDEPENDENT implementations (DuckDB
built-ins where they exist, a structurally different SQL scan where
not — the levenshtein_updown_monthly pattern, not a replay):

- damerau_updown_monthly: FULL (unrestricted) Damerau-Levenshtein
  distance between the monthly revenue/count up-down sign strings,
  via the Lowrance-Wagner alphabet-indexed DP. DuckDB's
  damerau_levenshtein is the unrestricted variant too (probed:
  CA→ABC = 2, not OSA's 3), so the oracle is its built-in.
- jaro_winkler_topk_names: top-10 customer names by Jaro-Winkler
  similarity to the data-derived probe name of custkey
  max(c_custkey)//2 (standard p=0.1, 4-char prefix cap; probed
  MARTHA/MARHTA = 0.9611... matches the textbook value). Scratch
  match-window/transposition implementation vs the built-in,
  compared at 6dp with (jw6 DESC, custkey) ordering.
- lcs_substring_updown: the longest common SUBSTRING (contiguous —
  lcs_quarterly_updown is the subsequence) of the monthly up/down
  strings: O(mn) DP on the Ray side; the oracle enumerates all
  substrings of one string and probes the other with strpos —
  a structurally different computation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries122 import _order_period_series, _updown


# ---------------------------------------------------------------------------
# Full Damerau-Levenshtein
# ---------------------------------------------------------------------------


def _damerau_full(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (Lowrance-Wagner)."""
    m, n = len(a), len(b)
    maxd = m + n
    d = [[maxd] * (n + 2) for _ in range(m + 2)]
    for i in range(m + 1):
        d[i + 1][1] = i
    for j in range(n + 1):
        d[1][j + 1] = j
    da: dict[str, int] = {}
    for i in range(1, m + 1):
        db = 0
        for j in range(1, n + 1):
            k = da.get(b[j - 1], 0)
            l_ = db
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l_] + (i - k - 1) + 1 + (j - l_ - 1))
        da[a[i - 1]] = i
    return d[m + 1][n + 1]


def q_damerau_updown_monthly(sf_dir: str):
    """Full DL distance between monthly sign strings (docstring)."""
    per = _order_period_series(sf_dir, months_per=1)
    a = _updown(per["rev"].to_numpy(np.int64))
    b = _updown(per["cnt"].to_numpy(np.int64))
    out = pd.DataFrame({"len_a": [len(a)], "len_b": [len(b)],
                        "dl_dist": [_damerau_full(a, b)]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_DAMERAU_MONTHLY = """
WITH m AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS per,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev,
         count(*)::BIGINT AS cnt
  FROM orders GROUP BY 1),
d AS (
  SELECT per,
         CASE WHEN rev > lag(rev) OVER (ORDER BY per)
              THEN 'u' ELSE 'd' END AS ra,
         CASE WHEN cnt > lag(cnt) OVER (ORDER BY per)
              THEN 'u' ELSE 'd' END AS ca,
         row_number() OVER (ORDER BY per) AS rn
  FROM m),
s AS (
  SELECT string_agg(ra, '' ORDER BY per) AS sa,
         string_agg(ca, '' ORDER BY per) AS sb
  FROM d WHERE rn > 1)
SELECT length(sa)::BIGINT AS len_a, length(sb)::BIGINT AS len_b,
       damerau_levenshtein(sa, sb)::BIGINT AS dl_dist
FROM s
"""


# ---------------------------------------------------------------------------
# Jaro-Winkler top-k
# ---------------------------------------------------------------------------


def _jaro_winkler(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    w = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i in range(l1):
        lo = max(0, i - w)
        hi = min(l2, i + w + 1)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    jaro = (float(m) / float(l1) + float(m) / float(l2)
            + float(m - t) / float(m)) / 3.0
    p = 0
    for i in range(min(4, l1, l2)):
        if s1[i] == s2[i]:
            p += 1
        else:
            break
    return jaro + float(p) * 0.1 * (1.0 - jaro)


def q_jaro_winkler_topk_names(sf_dir: str):
    """Top-10 customers by JW similarity to the probe (docstring)."""
    probe_df = _pq(sf_dir, "customer", columns=["c_custkey"]) \
        .max("c_custkey")
    probe = f"Customer#{int(probe_df) // 2:09d}"

    def jw(t: pa.Table) -> pa.Table:
        keys = t["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        names = t["c_name"].to_pylist()
        sims = np.array([_jaro_winkler(nm, probe) for nm in names])
        df = pd.DataFrame({"c_custkey": keys,
                           "jw6": _round6(sims)})
        # partial top-k inside the task keeps the shuffle tiny
        df = df.sort_values(["jw6", "c_custkey"],
                            ascending=[False, True]).head(10)
        return _strip(df)

    res = (_pq(sf_dir, "customer", columns=["c_custkey", "c_name"])
           .map_batches(jw, batch_format="pyarrow").to_pandas())
    res = res.sort_values(["jw6", "c_custkey"],
                          ascending=[False, True]).head(10) \
        .reset_index(drop=True)
    res["c_custkey"] = res["c_custkey"].astype(np.int64)
    return res


SQL_JARO_WINKLER = """
WITH probe AS (
  SELECT 'Customer#' || lpad(CAST(max(c_custkey) // 2 AS VARCHAR),
                             9, '0') AS p
  FROM customer),
s AS (
  SELECT c_custkey,
         round(jaro_winkler_similarity(c_name, probe.p), 6) AS jw6
  FROM customer CROSS JOIN probe)
SELECT c_custkey, jw6 FROM s
ORDER BY jw6 DESC, c_custkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# Longest common substring
# ---------------------------------------------------------------------------


def q_lcs_substring_updown(sf_dir: str):
    """Longest common substring of the monthly sign strings."""
    per = _order_period_series(sf_dir, months_per=1)
    a = _updown(per["rev"].to_numpy(np.int64))
    b = _updown(per["cnt"].to_numpy(np.int64))
    m, n = len(a), len(b)
    best = 0
    prev = [0] * (n + 1)
    for i in range(1, m + 1):
        cur = [0] * (n + 1)
        for j in range(1, n + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    out = pd.DataFrame({"len_a": [m], "len_b": [n],
                        "lcs_len": [best]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_LCS_SUBSTRING = """
WITH m AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS per,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev,
         count(*)::BIGINT AS cnt
  FROM orders GROUP BY 1),
d AS (
  SELECT per,
         CASE WHEN rev > lag(rev) OVER (ORDER BY per)
              THEN 'u' ELSE 'd' END AS ra,
         CASE WHEN cnt > lag(cnt) OVER (ORDER BY per)
              THEN 'u' ELSE 'd' END AS ca,
         row_number() OVER (ORDER BY per) AS rn
  FROM m),
s AS (
  SELECT string_agg(ra, '' ORDER BY per) AS sa,
         string_agg(ca, '' ORDER BY per) AS sb
  FROM d WHERE rn > 1),
subs AS (
  SELECT DISTINCT substr(sa, i.i, l.l) AS sub, l.l
  FROM s,
       LATERAL (SELECT unnest(range(1, length(sa) + 1)) AS i) i,
       LATERAL (SELECT unnest(range(1, length(sa) - i.i + 2)) AS l) l),
hits AS (
  SELECT max(l)::BIGINT AS best
  FROM subs CROSS JOIN s WHERE strpos(sb, sub) > 0)
SELECT length(sa)::BIGINT AS len_a, length(sb)::BIGINT AS len_b,
       coalesce(hits.best, 0)::BIGINT AS lcs_len
FROM s CROSS JOIN hits
"""


QUERIES145: dict[str, tuple] = {
    "damerau_updown_monthly": (q_damerau_updown_monthly,
                               SQL_DAMERAU_MONTHLY),
    "jaro_winkler_topk_names": (q_jaro_winkler_topk_names,
                                SQL_JARO_WINKLER),
    "lcs_substring_updown": (q_lcs_substring_updown,
                             SQL_LCS_SUBSTRING),
}
