"""One-hundred-sixty-second oracle-query batch — string/compression
algorithmics:

- bwt_rle_updown: the Burrows-Wheeler transform of the monthly
  revenue up/down string (+ '$' sentinel, so rotation sorting is
  tie-free): all rotations sorted lexicographically, BWT = last
  column; reports the BWT's RLE run count against the original's —
  the compressibility gain BWT exists to create. Pure string ops.
- longest_repeat_updown: the longest substring occurring at least
  twice in the monthly sign string (the single-string counterpart of
  lcs_substring_updown), by exhaustive substring enumeration with a
  (length DESC, substring) argmax; also reports the lexicographically
  smallest maximal repeat.
- rle_event_stream: run-length encoding of the GLOBAL chronological
  event-type stream ((ts, event_id) order). Distributed as a
  segmented scan: each hour bucket reduces to (first/last run type +
  length, interior max, run count), and the driver merges the ~720
  bucket summaries — run counts, the longest run (which may span
  buckets), and the RLE compression ratio, all exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries122 import _order_period_series, _updown


def _runs(s: str) -> int:
    return 1 + sum(1 for a, b in zip(s, s[1:]) if a != b) if s else 0


# ---------------------------------------------------------------------------
# BWT + RLE
# ---------------------------------------------------------------------------


def q_bwt_rle_updown(sf_dir: str):
    """BWT of the monthly sign string + RLE gain (docstring)."""
    per = _order_period_series(sf_dir, months_per=1)
    s = "".join("u" if v > 0 else "d"
                for v in _updown(per["rev"].to_numpy(np.int64))) + "$"
    n = len(s)
    rots = sorted(s[i:] + s[:i] for i in range(n))
    bwt = "".join(r[-1] for r in rots)
    out = pd.DataFrame({
        "n": [n], "orig_runs": [_runs(s)], "bwt_runs": [_runs(bwt)],
        "bwt_prefix": [bwt[:10]]})
    for col in ("n", "orig_runs", "bwt_runs"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BWT = """
WITH m AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS per,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
           AS rev
  FROM orders GROUP BY 1),
d AS (
  SELECT per,
         CASE WHEN rev > lag(rev) OVER (ORDER BY per)
              THEN 'u' ELSE 'd' END AS ra,
         row_number() OVER (ORDER BY per) AS rn
  FROM m),
s AS (
  SELECT string_agg(ra, '' ORDER BY per) || '$' AS s
  FROM d WHERE rn > 1),
rot AS (
  SELECT substr(s.s, i.i) || substr(s.s, 1, i.i - 1) AS r
  FROM s, LATERAL (SELECT unnest(range(1, length(s.s) + 1)) AS i) i),
bwt AS (
  SELECT string_agg(substr(r, length(r), 1), '' ORDER BY r) AS b
  FROM rot),
runs AS (
  SELECT
    (SELECT 1 + sum(CASE WHEN substr(s, i, 1)
                              <> substr(s, i + 1, 1)
                    THEN 1 ELSE 0 END)
     FROM s, LATERAL (SELECT unnest(range(1, length(s.s))) AS i) i)
      AS orig_runs,
    (SELECT 1 + sum(CASE WHEN substr(b, i, 1)
                              <> substr(b, i + 1, 1)
                    THEN 1 ELSE 0 END)
     FROM bwt, LATERAL (SELECT unnest(range(1, length(bwt.b)))
                        AS i) i) AS bwt_runs)
SELECT length(s.s)::BIGINT AS n, runs.orig_runs::BIGINT AS orig_runs,
       runs.bwt_runs::BIGINT AS bwt_runs,
       substr(bwt.b, 1, 10) AS bwt_prefix
FROM s CROSS JOIN bwt CROSS JOIN runs
"""


# ---------------------------------------------------------------------------
# Longest repeated substring
# ---------------------------------------------------------------------------


def q_longest_repeat_updown(sf_dir: str):
    """Longest substring occurring ≥2 times (docstring above)."""
    per = _order_period_series(sf_dir, months_per=1)
    s = "".join("u" if v > 0 else "d"
                for v in _updown(per["rev"].to_numpy(np.int64)))
    n = len(s)
    cnt: dict[str, int] = {}
    for i in range(n):
        for ln in range(1, n - i + 1):
            sub = s[i:i + ln]
            cnt[sub] = cnt.get(sub, 0) + 1
    reps = [(len(k), k) for k, v in cnt.items() if v >= 2]
    best_len = max(l_ for l_, _ in reps) if reps else 0
    best = min(k for l_, k in reps if l_ == best_len) if reps else ""
    out = pd.DataFrame({"n": [n], "max_repeat_len": [best_len],
                        "repeat": [best]})
    for col in ("n", "max_repeat_len"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LONGEST_REPEAT = """
WITH m AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS per,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
           AS rev
  FROM orders GROUP BY 1),
d AS (
  SELECT per,
         CASE WHEN rev > lag(rev) OVER (ORDER BY per)
              THEN 'u' ELSE 'd' END AS ra,
         row_number() OVER (ORDER BY per) AS rn
  FROM m),
s AS (SELECT string_agg(ra, '' ORDER BY per) AS s
      FROM d WHERE rn > 1),
subs AS (
  SELECT substr(s.s, i.i, l.l) AS sub, l.l
  FROM s,
       LATERAL (SELECT unnest(range(1, length(s.s) + 1)) AS i) i,
       LATERAL (SELECT unnest(range(1, length(s.s) - i.i + 2))
                AS l) l),
rep AS (
  SELECT sub, l, count(*) AS c FROM subs GROUP BY sub, l
  HAVING count(*) >= 2),
mx AS (SELECT max(l) AS ml FROM rep)
SELECT (SELECT length(s) FROM s)::BIGINT AS n,
       coalesce(mx.ml, 0)::BIGINT AS max_repeat_len,
       coalesce((SELECT min(sub) FROM rep WHERE l = mx.ml), '')
         AS repeat
FROM mx
"""


# ---------------------------------------------------------------------------
# RLE of the global event stream
# ---------------------------------------------------------------------------


def q_rle_event_stream(sf_dir: str):
    """Segmented-scan RLE of the chronological type stream."""
    ds = _pq(sf_dir, "events",
             columns=["ts", "event_id", "event_type"])

    def bucketize(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"ts": pa.array(ts),
                         "e": t["event_id"],
                         "g": t["event_type"],
                         "bk": pa.array(ts // 3_600_000_000)})

    def bucket_summary(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "e"], kind="mergesort")
        g = df["g"].to_numpy()
        n = len(g)
        brk = np.r_[True, g[1:] != g[:-1]]
        starts = np.flatnonzero(brk)
        lens = np.diff(np.r_[starts, n])
        interior = int(lens[1:-1].max()) if len(lens) > 2 else 0
        return pd.DataFrame({
            "bk": [int(df["bk"].iloc[0])], "n": [n],
            "nruns": [len(starts)],
            "ftype": [str(g[0])], "flen": [int(lens[0])],
            "ltype": [str(g[-1])], "llen": [int(lens[-1])],
            "interior_max": [interior],
            "single": [1 if len(lens) == 1 else 0]})

    parts = (ds.map_batches(bucketize, batch_format="pyarrow")
               .groupby("bk").map_groups(bucket_summary,
                                         batch_format="pandas")
               .to_pandas().sort_values("bk").reset_index(drop=True))
    total_n = int(parts["n"].sum())
    n_runs = 0
    max_run = 0
    cur_type = None
    cur_len = 0
    for _, b in parts.iterrows():
        if b["single"]:
            if cur_type == b["ftype"]:
                cur_len += int(b["n"])
            else:
                if cur_type is not None:
                    n_runs += 1
                    max_run = max(max_run, cur_len)
                cur_type, cur_len = b["ftype"], int(b["n"])
            continue
        # first run of the bucket
        if cur_type == b["ftype"]:
            cur_len += int(b["flen"])
        else:
            if cur_type is not None:
                n_runs += 1
                max_run = max(max_run, cur_len)
            cur_type, cur_len = b["ftype"], int(b["flen"])
        n_runs += 1
        max_run = max(max_run, cur_len)
        # interior runs
        n_runs += int(b["nruns"]) - 2
        max_run = max(max_run, int(b["interior_max"]))
        # open the bucket's last run
        cur_type, cur_len = b["ltype"], int(b["llen"])
    if cur_type is not None:
        n_runs += 1
        max_run = max(max_run, cur_len)
    out = pd.DataFrame({
        "n_events": [total_n], "n_runs": [n_runs],
        "max_run": [max_run],
        "ratio6": [_round6(np.array([float(n_runs)
                                     / float(total_n)]))[0]]})
    for col in ("n_events", "n_runs", "max_run"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RLE_STREAM = """
WITH s AS (
  SELECT event_type AS g,
         lag(event_type) OVER (ORDER BY ts, event_id) AS pg,
         row_number() OVER (ORDER BY ts, event_id) AS t
  FROM events),
b AS (
  SELECT t, g,
         (CASE WHEN pg IS NULL OR g <> pg THEN 1 ELSE 0 END) AS brk
  FROM s),
rid AS (
  SELECT g, sum(brk) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS r
  FROM b),
runs AS (SELECT r, count(*)::BIGINT AS len FROM rid GROUP BY r)
SELECT (SELECT count(*) FROM s)::BIGINT AS n_events,
       (SELECT count(*) FROM runs)::BIGINT AS n_runs,
       (SELECT max(len) FROM runs)::BIGINT AS max_run,
       round(CAST((SELECT count(*) FROM runs) AS DOUBLE)
             / CAST((SELECT count(*) FROM s) AS DOUBLE), 6)
         AS ratio6
"""


QUERIES162: dict[str, tuple] = {
    "bwt_rle_updown": (q_bwt_rle_updown, SQL_BWT),
    "longest_repeat_updown": (q_longest_repeat_updown,
                              SQL_LONGEST_REPEAT),
    "rle_event_stream": (q_rle_event_stream, SQL_RLE_STREAM),
}
