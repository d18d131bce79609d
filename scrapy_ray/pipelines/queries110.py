"""One-hundred-tenth oracle-query batch — point-process / spatial
statistics on the event stream:

- morisita_index_grid: Morisita's index of dispersion over the FIXED
  264-quadrat grid (value//50 in 0..10) x hour-of-day:
  I = Q * SUM n(n-1) / (N(N-1)) — all exact integers (empty quadrats
  contribute 0; Q = 264 literal).
- ripley_k_events: 1-D Ripley's K of event timestamps at h in
  {60, 300, 3600} seconds: the unordered pair counts
  #{|t_i - t_j| <= h} are exact (vectorized searchsorted on the
  sorted seconds / an rid-ordered self-join in SQL — tie-order
  independent), K(h) = T * 2 * pairs / (n(n-1))
  identical-expression.
- clark_evans_events: the 1-D Clark-Evans aggregation ratio —
  observed mean nearest-neighbour gap over the Poisson expectation
  T/(2n), which clears to CE = 2 * SUM nn / T: one exact integer sum
  of per-event min(prev-gap, next-gap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_US_PER_DAY = 86_400_000_000
_RK_HS = (60, 300, 3600)


# ---------------------------------------------------------------------------
# Morisita index
# ---------------------------------------------------------------------------


def q_morisita_index_grid(sf_dir: str):
    """Morisita I over the fixed (valbin, hour) grid (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["value", "ts"])

    def gpart(t: pa.Table) -> pa.Table:
        v = (np.floor(t["value"].to_numpy(zero_copy_only=False) + 0.5)
             .astype(np.int64) // 50)
        h = ((t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
              // 1_000_000) % 86400) // 3600
        df = pd.DataFrame({"v": v, "h": h.astype(np.int64),
                           "n": np.int64(1)})
        g = df.groupby(["v", "h"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(gpart, batch_format="pyarrow")
               .groupby(["v", "h"]).aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    n_tot = int(cells["n"].sum())
    s2 = sum(int(v) * (int(v) - 1) for v in cells["n"])
    q = 264
    mi = float(q * s2) / float(n_tot * (n_tot - 1))
    out = pd.DataFrame({"n": [n_tot], "q": [q],
                        "occupied": [len(cells)], "s2": [s2],
                        "morisita6": [_round6(np.array([mi]))[0]]})
    for col in ("n", "q", "occupied", "s2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MORISITA = """
WITH cells AS (
  SELECT CAST(round(value) AS BIGINT) // 50 AS v,
         ((epoch_us(ts) // 1000000) % 86400) // 3600 AS h,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
t AS (
  SELECT sum(n)::BIGINT AS n_tot, count(*)::BIGINT AS occupied,
         sum(n * (n - 1))::BIGINT AS s2
  FROM cells)
SELECT n_tot AS n, 264::BIGINT AS q, occupied, s2,
       round(CAST(264 * s2 AS DOUBLE)
             / CAST(n_tot::HUGEINT * (n_tot - 1) AS DOUBLE), 6)
         AS morisita6
FROM t
"""


# ---------------------------------------------------------------------------
# Ripley's K (1-D)
# ---------------------------------------------------------------------------


def q_ripley_k_events(sf_dir: str):
    """1-D Ripley K at three scales, exact pair counts (docstring
    above)."""
    from scrapy_ray.pipelines.queries import _ts_minmax_us
    mn, mx = _ts_minmax_us(sf_dir, "events")
    span = (mx - mn) // 1_000_000

    ds = _pq(sf_dir, "events", columns=["ts"])

    def spart(t: pa.Table) -> pa.Table:
        s = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 1_000_000)
        df = pd.DataFrame({"s": s})
        g = df.groupby("s", sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(spart, batch_format="pyarrow")
              .groupby("s").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("s"))
    sv = hist["s"].to_numpy(np.int64)
    cnt = hist["cnt"].to_numpy(np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    rows = []
    for h in _RK_HS:
        # unordered pairs with |diff| <= h: same-second pairs C(c,2)
        # + cross pairs c_i * (count in (s_i, s_i + h])
        hi = np.searchsorted(sv, sv + h, side="right")
        upto = cum[hi - 1]
        cross = int(cnt.dot(upto - cum))
        same = int((cnt * (cnt - 1) // 2).sum())
        pairs = same + cross
        k = float(span) * 2.0 * float(pairs) / float(n * (n - 1))
        rows.append((h, pairs, _round6(np.array([k]))[0]))
    out = pd.DataFrame(rows, columns=["h_s", "pairs", "k6"])
    for col in ("h_s", "pairs"):
        out[col] = out[col].astype(np.int64)
    return out


def _ripley_sql() -> str:
    branches = []
    for h in _RK_HS:
        branches.append(f"""
  SELECT {h}::BIGINT AS h_s,
         coalesce((SELECT sum(a.cnt * b.cnt)::BIGINT
          FROM hh a JOIN hh b
            ON b.s > a.s AND b.s <= a.s + {h}), 0)
         + coalesce((SELECT sum(cnt * (cnt - 1) // 2)::BIGINT FROM hh),
                    0) AS pairs""")
    return f"""
WITH hh AS MATERIALIZED (
  SELECT epoch_us(ts) // 1000000 AS s, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
sp AS (
  SELECT (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS span,
         count(*)::BIGINT AS n
  FROM events),
u AS ({" UNION ALL ".join(branches)})
SELECT h_s, pairs,
       round(CAST(span AS DOUBLE) * 2.0 * CAST(pairs AS DOUBLE)
             / CAST(n::HUGEINT * (n - 1) AS DOUBLE), 6) AS k6
FROM u CROSS JOIN sp ORDER BY h_s
"""


SQL_RIPLEY = _ripley_sql()


# ---------------------------------------------------------------------------
# Clark-Evans (1-D)
# ---------------------------------------------------------------------------


def q_clark_evans_events(sf_dir: str):
    """1-D Clark-Evans ratio CE = 2*SUM nn / T (docstring above)."""
    from scrapy_ray.pipelines.queries import _ts_minmax_us
    mn, mx = _ts_minmax_us(sf_dir, "events")
    span = (mx - mn) // 1_000_000

    ds = _pq(sf_dir, "events", columns=["ts"])

    def spart(t: pa.Table) -> pa.Table:
        s = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 1_000_000)
        df = pd.DataFrame({"s": s})
        g = df.groupby("s", sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(spart, batch_format="pyarrow")
              .groupby("s").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("s"))
    sv = [int(v) for v in hist["s"]]
    cnt = [int(v) for v in hist["cnt"]]
    n = sum(cnt)
    snn = 0
    for i, (s, c) in enumerate(zip(sv, cnt)):
        if c >= 2:
            continue  # a same-second neighbour -> nn gap 0
        prev_gap = s - sv[i - 1] if i > 0 else None
        next_gap = sv[i + 1] - s if i + 1 < len(sv) else None
        if prev_gap is None:
            nn = next_gap
        elif next_gap is None:
            nn = prev_gap
        else:
            nn = min(prev_gap, next_gap)
        snn += nn
    ce = 2.0 * float(snn) / float(span)
    out = pd.DataFrame({"n": [n], "span_s": [span], "nn_sum": [snn],
                        "ce6": [_round6(np.array([ce]))[0]]})
    for col in ("n", "span_s", "nn_sum"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CLARK_EVANS = """
WITH hh AS (
  SELECT epoch_us(ts) // 1000000 AS s, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
g AS (
  SELECT s, cnt,
         s - lag(s) OVER (ORDER BY s) AS pg,
         lead(s) OVER (ORDER BY s) - s AS ng
  FROM hh),
nn AS (
  SELECT sum(CASE WHEN cnt >= 2 THEN 0
                  WHEN pg IS NULL THEN ng
                  WHEN ng IS NULL THEN pg
                  ELSE least(pg, ng) END)::BIGINT AS snn,
         sum(cnt)::BIGINT AS n
  FROM g),
sp AS (
  SELECT (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS span
  FROM events)
SELECT n, span AS span_s, snn AS nn_sum,
       round(2.0 * CAST(snn AS DOUBLE) / CAST(span AS DOUBLE), 6)
         AS ce6
FROM nn CROSS JOIN sp
"""


QUERIES110: dict[str, tuple] = {
    "morisita_index_grid": (q_morisita_index_grid, SQL_MORISITA),
    "ripley_k_events": (q_ripley_k_events, SQL_RIPLEY),
    "clark_evans_events": (q_clark_evans_events, SQL_CLARK_EVANS),
}
