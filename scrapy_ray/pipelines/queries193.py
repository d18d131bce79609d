"""One-hundred-ninety-third oracle-query batch — universal codes and
event-time watermarking:

- fibonacci_coding_gaps: Fibonacci (Zeckendorf) universal-code cost
  of the hashed-id posting gaps (the batch-171 substrate) — bits(g)
  = index of the largest Fibonacci ≤ g, plus the terminator '1';
  also the total Zeckendorf term count. The greedy walks a 47-entry
  literal Fibonacci table as a set-based recursion (every gap row
  advances together through the levels).
- elias_fano_postings: the Elias–Fano encoding size of the sorted
  hashed-id set over the 2³² universe — low_bits =
  max(0, ⌊log2(U/n)⌋) via integer msb (no float log), size =
  n·low + n + (U >> low) + 1 exact bits; compared with the Rice
  cost from batch 171's machinery is left to the reader — this
  query reports the EF structure itself.
- watermark_lateness_audit: streaming out-of-order lateness — the
  raw stream is perfectly ordered (probed: zero inversions), so
  arrival time is MODELED as ts + (h(event_id) % 600 s) hash
  jitter; processing in (arrival, id) order with watermark =
  max event-time seen − 300 s counts late events and the max
  lateness. Distributed as arrival buckets with a broadcast
  incoming-prefix-max per bucket (two passes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_WM_JIT_S = 600
_WM_LATE_US = 300_000_000
_WM_BK_US = 600_000_000

_FIBS = [1, 2]
while _FIBS[-1] < (1 << 33):
    _FIBS.append(_FIBS[-1] + _FIBS[-2])


def _hashed_gaps(sf_dir: str) -> np.ndarray:
    ds = _pq(sf_dir, "events", columns=["user_id"])
    uids = np.asarray(sorted(int(u) for u in ds.unique("user_id")),
                      np.int64)
    h = ((uids.astype(np.uint64) % np.uint64(_H_MOD))
         * np.uint64(_H_MULT) + np.uint64(_H_STEP)) \
        % np.uint64(_H_MOD)
    hid = np.unique(h.astype(np.int64))
    return hid


# ---------------------------------------------------------------------------
# Fibonacci coding
# ---------------------------------------------------------------------------


def q_fibonacci_coding_gaps(sf_dir: str):
    """Zeckendorf code bits over posting gaps (docstring)."""
    hid = _hashed_gaps(sf_dir)
    gaps = np.diff(hid)
    total_bits = 0
    total_terms = 0
    for g in gaps.tolist():
        g = int(g)
        bits = 0
        for i in range(len(_FIBS) - 1, -1, -1):
            if _FIBS[i] <= g:
                bits = i + 1
                break
        terms = 0
        rem = g
        for i in range(len(_FIBS) - 1, -1, -1):
            if _FIBS[i] <= rem:
                rem -= _FIBS[i]
                terms += 1
        total_bits += bits + 1
        total_terms += terms
    out = pd.DataFrame({"n_gaps": [len(gaps)],
                        "total_bits": [total_bits],
                        "total_terms": [total_terms],
                        "bits_per_gap6": [_round6(np.array(
                            [float(total_bits) / len(gaps)]))[0]]})
    for col in ("n_gaps", "total_bits", "total_terms"):
        out[col] = out[col].astype(np.int64)
    return out


_FIB_LIST = "[" + ", ".join(f"{v}::BIGINT" for v in _FIBS) + "]"

SQL_FIB = f"""
WITH RECURSIVE u AS (SELECT DISTINCT user_id AS u FROM events),
hid AS (
  SELECT DISTINCT CAST(((u::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT
                        + {_H_STEP}) % {_H_MOD} AS BIGINT) AS h
  FROM u),
gaps AS (
  SELECT h - lag(h) OVER (ORDER BY h) AS g FROM hid),
gg AS (SELECT g FROM gaps WHERE g IS NOT NULL),
fb AS (SELECT {_FIB_LIST} AS fl),
-- greedy Zeckendorf as a set-based recursion over fib levels
walk AS (
  SELECT g, {len(_FIBS) - 1} AS i, g AS rem, 0::BIGINT AS terms,
         0::BIGINT AS bits
  FROM gg
  UNION ALL
  SELECT g, i - 1,
         CASE WHEN (SELECT fl FROM fb)[i + 1] <= rem
              THEN rem - (SELECT fl FROM fb)[i + 1] ELSE rem END,
         terms + CASE WHEN (SELECT fl FROM fb)[i + 1] <= rem
                      THEN 1 ELSE 0 END,
         CASE WHEN bits = 0 AND (SELECT fl FROM fb)[i + 1] <= g
              THEN i + 1 ELSE bits END
  FROM walk WHERE i >= 0),
fin AS (SELECT g, terms, bits FROM walk WHERE i = -1),
s AS (
  SELECT count(*)::BIGINT AS n,
         sum(bits + 1)::BIGINT AS total_bits,
         sum(terms)::BIGINT AS total_terms
  FROM fin)
SELECT n AS n_gaps, total_bits, total_terms,
       round(CAST(total_bits AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS bits_per_gap6
FROM s
"""


# ---------------------------------------------------------------------------
# Elias-Fano
# ---------------------------------------------------------------------------


def q_elias_fano_postings(sf_dir: str):
    """Exact Elias-Fano size of the sorted hashed ids."""
    hid = _hashed_gaps(sf_dir)
    n = len(hid)
    univ = _H_MOD
    ratio = univ // n
    low = max(0, int(ratio).bit_length() - 1)
    size = n * low + n + (univ >> low) + 1
    raw = n * 32
    out = pd.DataFrame({"n_ids": [n], "low_bits": [low],
                        "ef_bits": [size], "raw_bits": [raw],
                        "ratio6": [_round6(np.array(
                            [float(size) / float(raw)]))[0]]})
    for col in ("n_ids", "low_bits", "ef_bits", "raw_bits"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_EF = f"""
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
hid AS (
  SELECT DISTINCT CAST(((u::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT
                        + {_H_STEP}) % {_H_MOD} AS BIGINT) AS h
  FROM u),
n AS (SELECT count(*)::BIGINT AS n FROM hid),
f AS (
  SELECT n,
         greatest(0, length(bin({_H_MOD}::BIGINT // n)) - 1)
           AS low
  FROM n)
SELECT n AS n_ids, low::BIGINT AS low_bits,
       (n * low + n + ({_H_MOD}::BIGINT >> low) + 1)::BIGINT
         AS ef_bits,
       (n * 32)::BIGINT AS raw_bits,
       round(CAST(n * low + n + ({_H_MOD}::BIGINT >> low) + 1
                  AS DOUBLE) / CAST(n * 32 AS DOUBLE), 6)
         AS ratio6
FROM f
"""


# ---------------------------------------------------------------------------
# Watermark lateness
# ---------------------------------------------------------------------------


def q_watermark_lateness_audit(sf_dir: str):
    """Hash-jittered arrival lateness vs watermark (docstring)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_id"])

    def jitter(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = ((eid.astype(np.uint64) % np.uint64(_H_MOD))
             * np.uint64(_H_MULT) + np.uint64(_H_STEP)) \
            % np.uint64(_H_MOD)
        arr = us + (h % np.uint64(_WM_JIT_S)).astype(np.int64) \
            * 1_000_000
        return pa.table({"t": pa.array(us), "e": pa.array(eid),
                         "arr": pa.array(arr),
                         "bk": pa.array(arr // _WM_BK_US)})

    # pass 1: per-bucket max event-time -> incoming prefix maxes
    bmax = (ds.map_batches(jitter, batch_format="pyarrow")
              .groupby("bk").aggregate(Max("t", alias_name="mt"))
              .to_pandas().sort_values("bk")
              .reset_index(drop=True))
    inc: dict[int, int] = {}
    run = -(1 << 62)
    for _, r in bmax.iterrows():
        inc[int(r["bk"])] = run
        run = max(run, int(r["mt"]))

    def late_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["arr", "e"], kind="mergesort")
        t = df["t"].to_numpy(np.int64)
        wm_inc = inc[int(df["bk"].iloc[0])]
        prior = np.concatenate(
            [[wm_inc], np.maximum.accumulate(t)[:-1]])
        prior = np.maximum(prior, wm_inc)
        late = t < prior - _WM_LATE_US
        lateness = np.where(late, prior - _WM_LATE_US - t, 0)
        return pd.DataFrame({
            "n": [np.int64(len(t))],
            "n_late": [np.int64(int(late.sum()))],
            "max_late_us": [np.int64(int(lateness.max())
                                     if len(lateness) else 0)]})

    parts = (ds.map_batches(jitter, batch_format="pyarrow")
               .groupby("bk")
               .map_groups(late_in_bucket, batch_format="pandas")
               .to_pandas())
    n = int(parts["n"].sum())
    n_late = int(parts["n_late"].sum())
    mx = int(parts["max_late_us"].max())
    out = pd.DataFrame({
        "n_events": [n], "n_late": [n_late],
        "max_late_s6": [_round6(np.array([mx / 1e6]))[0]],
        "late_share6": [_round6(np.array(
            [float(n_late) / n]))[0]]})
    for col in ("n_events", "n_late"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_WATERMARK = f"""
WITH e AS (
  SELECT epoch_us(ts) AS t, event_id AS e,
         epoch_us(ts)
         + CAST(((event_id::UBIGINT % {_H_MOD})
                 * {_H_MULT}::UBIGINT + {_H_STEP})
                % {_H_MOD} % {_WM_JIT_S} AS BIGINT)
           * 1000000 AS arr
  FROM events),
w AS (
  SELECT t, arr,
         max(t) OVER (ORDER BY arr, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS wm
  FROM e),
l AS (
  SELECT t,
         CASE WHEN wm IS NOT NULL
                   AND t < wm - {_WM_LATE_US}
              THEN wm - {_WM_LATE_US} - t ELSE 0 END AS lateness,
         (wm IS NOT NULL AND t < wm - {_WM_LATE_US}) AS late
  FROM w)
SELECT count(*)::BIGINT AS n_events,
       sum(late::INT)::BIGINT AS n_late,
       round(CAST(max(lateness) AS DOUBLE) / 1e6, 6)
         AS max_late_s6,
       round(CAST(sum(late::INT) AS DOUBLE) / count(*), 6)
         AS late_share6
FROM l
"""


QUERIES193: dict[str, tuple] = {
    "fibonacci_coding_gaps": (q_fibonacci_coding_gaps, SQL_FIB),
    "elias_fano_postings": (q_elias_fano_postings, SQL_EF),
    "watermark_lateness_audit": (q_watermark_lateness_audit,
                                 SQL_WATERMARK),
}
