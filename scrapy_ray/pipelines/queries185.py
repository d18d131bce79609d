"""One-hundred-eighty-fifth oracle-query batch — time-series-DB
compression, visibility networks, and exact geometry:

- gorilla_timestamp_bits: the Gorilla-style delta-of-delta encoding
  cost of the global event-timestamp stream — the first two
  timestamps cost 64 bits each, every later one costs by |ΔΔ|
  bucket (0→1, ≤63→9, ≤255→12, ≤2047→16, else 36 bits; symmetric
  buckets, documented deviation from the paper's asymmetric ones).
  Distributed as 10-minute buckets exporting internal ΔΔ-bit sums
  plus their two head and two tail timestamps; the driver stitches
  the ≤2 crossing positions per bucket with a running last-two
  window. Also reports LEB128 varint bytes of the Δ stream and the
  ΔΔ=0 (regular-cadence) count.
- visibility_graph_daily: the Lacasa natural visibility graph of
  the 30-day revenue series — edge (i,j) iff every k between
  satisfies y_k·(j−i) < y_i·(j−k) + y_j·(k−i) (strict, exact
  integer cross-multiplication); reports edges, max degree,
  density.
- min_enclosing_circle_daily: the EXACT minimum enclosing circle of
  the distinct daily (clicks, views) points by candidate
  enumeration — all C(n,2) diameter circles (containment via the
  integer (2p−a−b)² ≤ (a−b)² predicate) and all C(n,3)
  circumcircles (containment via the orientation-normalized
  INCIRCLE determinant in exact integers, Python int / HUGEINT);
  candidates ranked by identically-computed float r² with a
  canonical id tiebreak.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries169 import _daily_xmy

_GOR_BK_US = 600_000_000


def _dd_bits(dd: int) -> int:
    a = abs(dd)
    if a == 0:
        return 1
    if a <= 63:
        return 9
    if a <= 255:
        return 12
    if a <= 2047:
        return 16
    return 36


def _varint_bytes(g: int) -> int:
    return (max(g.bit_length(), 1) + 6) // 7


# ---------------------------------------------------------------------------
# Gorilla timestamp compression
# ---------------------------------------------------------------------------


def q_gorilla_timestamp_bits(sf_dir: str):
    """Delta-of-delta bit cost of the ts stream (docstring)."""
    ds = _pq(sf_dir, "events", columns=["ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"t": pa.array(us),
                         "bk": pa.array(us // _GOR_BK_US)})

    def bsum(df: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(df["t"].to_numpy(np.int64))
        n = len(t)
        bits = 0
        zeros = 0
        vbytes = 0
        if n >= 2:
            d = np.diff(t)
            vbytes = sum(_varint_bytes(int(g)) for g in d)
        if n >= 3:
            dd = t[2:] - 2 * t[1:-1] + t[:-2]
            for v in dd.tolist():
                bits += _dd_bits(int(v))
                zeros += 1 if v == 0 else 0
        return pd.DataFrame({
            "bk": [int(df["bk"].iloc[0])], "cnt": [n],
            "mn1": [int(t[0])],
            "mn2": [int(t[1]) if n >= 2 else -1],
            "mx1": [int(t[-1])],
            "mx2": [int(t[-2]) if n >= 2 else -1],
            "bits": [bits], "zeros": [zeros], "vb": [vbytes]})

    parts = (ds.map_batches(bucketize, batch_format="pyarrow")
               .groupby("bk").map_groups(bsum,
                                         batch_format="pandas")
               .to_pandas().sort_values("bk").reset_index(drop=True))
    n = int(parts["cnt"].sum())
    bits = sum(int(v) for v in parts["bits"])
    zeros = sum(int(v) for v in parts["zeros"])
    vbytes = sum(int(v) for v in parts["vb"])
    prev: list[int] = []          # last ≤2 global timestamps
    pos = 0
    for _, r in parts.iterrows():
        cnt = int(r["cnt"])
        head = [int(r["mn1"])] + ([int(r["mn2"])] if cnt >= 2
                                  else [])
        for hi, e in enumerate(head):
            pos += 1
            # only the FIRST head element's delta crosses the
            # bucket boundary — the mn1→mn2 delta is already in
            # the bucket-internal varint sum
            if pos <= 2:
                bits += 64
                if pos == 2 and hi == 0:
                    vbytes += _varint_bytes(e - prev[-1])
            else:
                dd = e - 2 * prev[-1] + prev[-2]
                bits += _dd_bits(dd)
                zeros += 1 if dd == 0 else 0
                if hi == 0:
                    vbytes += _varint_bytes(e - prev[-1])
            prev = (prev + [e])[-2:]
        pos += cnt - len(head)
        if cnt >= 2:
            prev = [int(r["mx2"]), int(r["mx1"])]
        # cnt == 1: head consumed the only element; prev already set
    raw_bits = 64 * n
    r6 = _round6(np.array([float(bits) / n,
                           float(bits) / float(raw_bits)]))
    out = pd.DataFrame({"n_ts": [n], "total_bits": [bits],
                        "zeros_dd": [zeros],
                        "varint_bytes": [vbytes],
                        "bits_per_ts6": [r6[0]],
                        "vs_raw6": [r6[1]]})
    for col in ("n_ts", "total_bits", "zeros_dd", "varint_bytes"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GORILLA = """
WITH t AS (
  SELECT epoch_us(ts) AS t,
         row_number() OVER (ORDER BY ts) AS rn
  FROM events),
l AS (
  SELECT t, rn, lag(t, 1) OVER (ORDER BY rn) AS p1,
         lag(t, 2) OVER (ORDER BY rn) AS p2
  FROM t),
enc AS (
  SELECT rn,
         CASE WHEN rn <= 2 THEN 64
              ELSE CASE WHEN abs(t - 2 * p1 + p2) = 0 THEN 1
                   WHEN abs(t - 2 * p1 + p2) <= 63 THEN 9
                   WHEN abs(t - 2 * p1 + p2) <= 255 THEN 12
                   WHEN abs(t - 2 * p1 + p2) <= 2047 THEN 16
                   ELSE 36 END END AS bits,
         CASE WHEN rn > 2 AND t - 2 * p1 + p2 = 0
              THEN 1 ELSE 0 END AS z,
         CASE WHEN rn >= 2 THEN
           (greatest(length(bin(t - p1))
                     - CASE WHEN t - p1 = 0 THEN 0 ELSE 0 END, 1)
            + 6) // 7
         ELSE 0 END AS vb
  FROM l)
SELECT count(*)::BIGINT AS n_ts, sum(bits)::BIGINT AS total_bits,
       sum(z)::BIGINT AS zeros_dd,
       sum(vb)::BIGINT AS varint_bytes,
       round(CAST(sum(bits) AS DOUBLE) / count(*), 6)
         AS bits_per_ts6,
       round(CAST(sum(bits) AS DOUBLE)
             / CAST(64 * count(*) AS DOUBLE), 6) AS vs_raw6
FROM enc
"""


# ---------------------------------------------------------------------------
# Visibility graph
# ---------------------------------------------------------------------------


def q_visibility_graph_daily(sf_dir: str):
    """Natural visibility graph of daily revenue (docstring)."""
    dly = _daily_xmy(sf_dir)
    y = [int(v) for v in dly["y"]]
    n = len(y)
    deg = [0] * n
    edges = 0
    for i in range(n):
        for j in range(i + 1, n):
            ok = True
            for k in range(i + 1, j):
                if y[k] * (j - i) >= y[i] * (j - k) \
                        + y[j] * (k - i):
                    ok = False
                    break
            if ok:
                edges += 1
                deg[i] += 1
                deg[j] += 1
    dens = _round6(np.array(
        [float(edges) / (n * (n - 1) // 2)]))[0]
    out = pd.DataFrame({"n_days": [n], "n_edges": [edges],
                        "max_degree": [max(deg)],
                        "density6": [dens]})
    for col in ("n_days", "n_edges", "max_degree"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_VISIBILITY = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
srt AS (SELECT row_number() OVER (ORDER BY day) AS i, y FROM dly),
cand AS (
  SELECT a.i AS i, b.i AS j, a.y AS yi, b.y AS yj
  FROM srt a JOIN srt b ON b.i > a.i),
vis AS (
  SELECT c.i, c.j
  FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM srt k
    WHERE k.i > c.i AND k.i < c.j
      AND k.y * (c.j - c.i)
          >= c.yi * (c.j - k.i) + c.yj * (k.i - c.i))),
deg AS (
  SELECT v, count(*)::BIGINT AS d
  FROM (SELECT i AS v FROM vis UNION ALL SELECT j FROM vis)
  GROUP BY v),
f AS (
  SELECT (SELECT count(*) FROM srt)::BIGINT AS n,
         (SELECT count(*) FROM vis)::BIGINT AS e,
         (SELECT max(d) FROM deg)::BIGINT AS md)
SELECT n AS n_days, e AS n_edges, md AS max_degree,
       round(CAST(e AS DOUBLE)
             / CAST(n * (n - 1) // 2 AS DOUBLE), 6) AS density6
FROM f
"""


# ---------------------------------------------------------------------------
# Minimum enclosing circle
# ---------------------------------------------------------------------------


def q_min_enclosing_circle_daily(sf_dir: str):
    """Exact MEC of distinct daily (clicks, views) points."""
    dly = _daily_xmy(sf_dir)
    pts = sorted({(int(a), int(b))
                  for a, b in zip(dly["x"], dly["m"])})
    n = len(pts)

    def contains_pair(a, b, p) -> bool:
        ex = 2 * p[0] - a[0] - b[0]
        ey = 2 * p[1] - a[1] - b[1]
        dx = a[0] - b[0]
        dy = a[1] - b[1]
        return ex * ex + ey * ey <= dx * dx + dy * dy

    def orient(a, b, c) -> int:
        return (b[0] - a[0]) * (c[1] - a[1]) \
            - (b[1] - a[1]) * (c[0] - a[0])

    def incircle_ok(a, b, c, d) -> bool:
        # a,b,c CCW; inside-or-on iff det >= 0
        m = []
        for p in (a, b, c):
            m.append([p[0] - d[0], p[1] - d[1],
                      (p[0] - d[0]) ** 2 + (p[1] - d[1]) ** 2])
        det = (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
               - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
               + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))
        return det >= 0

    best = None
    cid = 0
    for i in range(n):
        for j in range(i + 1, n):
            cid += 1
            a, b = pts[i], pts[j]
            if all(contains_pair(a, b, p) for p in pts):
                d2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
                r2 = float(d2) / 4.0
                key = (r2, 2, cid)
                if best is None or key < best:
                    best = key
    cid = 0
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                cid += 1
                a, b, c = pts[i], pts[j], pts[k]
                o = orient(a, b, c)
                if o == 0:
                    continue
                if o < 0:
                    b, c = c, b
                if all(incircle_ok(a, b, c, p) for p in pts):
                    d1 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
                    d2_ = (b[0] - c[0]) ** 2 + (b[1] - c[1]) ** 2
                    d3 = (c[0] - a[0]) ** 2 + (c[1] - a[1]) ** 2
                    r2 = float(d1 * d2_ * d3) / (4.0 * float(o * o))
                    key = (r2, 3, cid)
                    if best is None or key < best:
                        best = key
    r6 = _round6(np.array([best[0]]))[0]
    out = pd.DataFrame({"n_points": [n], "kind": [best[1]],
                        "r2_6": [r6]})
    for col in ("n_points", "kind"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MEC = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'view')::INT)::BIGINT AS m
  FROM events GROUP BY 1),
pts AS (
  SELECT x, m, row_number() OVER (ORDER BY x, m) AS i
  FROM (SELECT DISTINCT x, m FROM dly)),
prc AS (
  -- pair candidates with exact containment
  SELECT a.i AS ia, b.i AS ib,
         row_number() OVER (ORDER BY a.i, b.i) AS cid,
         ((a.x - b.x) * (a.x - b.x)
          + (a.m - b.m) * (a.m - b.m)) AS d2
  FROM pts a JOIN pts b ON b.i > a.i),
pok AS (
  SELECT p.cid, p.d2
  FROM prc p
  WHERE NOT EXISTS (
    SELECT 1 FROM pts q, pts a, pts b
    WHERE a.i = p.ia AND b.i = p.ib
      AND (2 * q.x - a.x - b.x) * (2 * q.x - a.x - b.x)
          + (2 * q.m - a.m - b.m) * (2 * q.m - a.m - b.m)
          > (a.x - b.x) * (a.x - b.x)
            + (a.m - b.m) * (a.m - b.m))),
trc AS (
  SELECT a.i AS ia, b.i AS ib, c.i AS ic,
         row_number() OVER (ORDER BY a.i, b.i, c.i) AS cid,
         a.x AS ax, a.m AS ay, b.x AS bx, b.m AS by_,
         c.x AS cx, c.m AS cy,
         (b.x - a.x) * (c.m - a.m)
         - (b.m - a.m) * (c.x - a.x) AS o
  FROM pts a JOIN pts b ON b.i > a.i JOIN pts c ON c.i > b.i),
trn AS (
  -- orientation-normalized (swap b,c when clockwise)
  SELECT cid, ax, ay,
         CASE WHEN o < 0 THEN cx ELSE bx END AS bx,
         CASE WHEN o < 0 THEN cy ELSE by_ END AS by_,
         CASE WHEN o < 0 THEN bx ELSE cx END AS cx,
         CASE WHEN o < 0 THEN by_ ELSE cy END AS cy,
         abs(o) AS o
  FROM trc WHERE o <> 0),
tok AS (
  SELECT t.cid,
         CAST((t.ax - t.bx) * (t.ax - t.bx)
              + (t.ay - t.by_) * (t.ay - t.by_) AS HUGEINT)
         * ((t.bx - t.cx) * (t.bx - t.cx)
            + (t.by_ - t.cy) * (t.by_ - t.cy))
         * ((t.cx - t.ax) * (t.cx - t.ax)
            + (t.cy - t.ay) * (t.cy - t.ay)) AS dnum,
         t.o AS o
  FROM trn t
  WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE CAST(t.ax - q.x AS HUGEINT)
          * ((t.by_ - q.m) * ((t.cx - q.x) * (t.cx - q.x)
                              + (t.cy - q.m) * (t.cy - q.m))
             - ((t.bx - q.x) * (t.bx - q.x)
                + (t.by_ - q.m) * (t.by_ - q.m))
               * (t.cy - q.m))
          - CAST(t.ay - q.m AS HUGEINT)
            * ((t.bx - q.x) * ((t.cx - q.x) * (t.cx - q.x)
                               + (t.cy - q.m) * (t.cy - q.m))
               - ((t.bx - q.x) * (t.bx - q.x)
                  + (t.by_ - q.m) * (t.by_ - q.m))
                 * (t.cx - q.x))
          + CAST((t.ax - q.x) * (t.ax - q.x)
                 + (t.ay - q.m) * (t.ay - q.m) AS HUGEINT)
            * ((t.bx - q.x) * (t.cy - q.m)
               - (t.by_ - q.m) * (t.cx - q.x)) < 0)),
cand AS (
  SELECT CAST(d2 AS DOUBLE) / 4.0 AS r2, 2 AS kind, cid FROM pok
  UNION ALL
  SELECT CAST(dnum AS DOUBLE) / (4.0 * CAST(o * o AS DOUBLE)),
         3, cid
  FROM tok),
best AS (SELECT * FROM cand ORDER BY r2, kind, cid LIMIT 1)
SELECT (SELECT count(*) FROM pts)::BIGINT AS n_points,
       kind::BIGINT AS kind, round(r2, 6) AS r2_6
FROM best
"""


QUERIES185: dict[str, tuple] = {
    "gorilla_timestamp_bits": (q_gorilla_timestamp_bits,
                               SQL_GORILLA),
    "visibility_graph_daily": (q_visibility_graph_daily,
                               SQL_VISIBILITY),
    "min_enclosing_circle_daily": (q_min_enclosing_circle_daily,
                                   SQL_MEC),
}
