"""Sixty-first oracle-query batch — full-spectrum period detection /
seasonal exponential smoothing / rank-list similarity:

- dominant_period_scan: periodogram scan of daily kilodollar revenue
  over candidate periods p = 2..30.  The cos/sin weights for every
  (p, t mod p) are computed ONCE at module import, quantized to 1e-9
  integer units, and embedded into BOTH the Ray code and the SQL as
  the same literal table (the SPRT / weekly_periodogram discipline
  extended to 464 literals) — zero libm-parity exposure.  Per-period
  weighted sums are exact int64; mean-centering rides
  Dc = n·Sc − S·Wc (Python int / HUGEINT; Dc² ≲ 5e35 at sf0.1); the
  dominant period is the exact-integer argmax (ties → smaller p), and
  the normalized spectral entropy over the 29 ordinates quantizes each
  q·ln(1/q) term to 1e-12 units (js_divergence discipline).
- holt_winters_weekly: additive Holt-Winters (α=0.3, β=0.2, γ=0.4,
  m=7) over each event type's dense daily count series.  Init at t=7:
  level = fully-parenthesized 7-day mean, trend = 0, seasonals
  s_i = y_i − level; the recursion (with the rolling 7-slot seasonal
  buffer shifted each step) is replayed by a recursive CTE whose float
  expressions are TEXTUALLY identical to the numpy step (holt_linear
  precedent, 2 states → 9 states); next-day forecast
  fc = l + b + s_head.
- rbo_chars_vs_hash: Rank-Biased Overlap (Webber et al., p = 0.9,
  depth 50) between two document rankings — by n_chars and by the
  mirrored multiplicative hash (train_valid_test discipline), ties →
  doc_id.  Overlap counts X_d are exact integers off per-block partial
  top-50s (dense_rank discipline, no global sort on the Ray side);
  the depth coefficients (1−p)p^{d−1}/d are module-level float
  literals shared verbatim with the SQL, each term quantized to 1e-12
  units and integer-summed.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries24 import _daily_cells
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000
_W_SCALE = 10**9

# period-scan weight literals: one source of truth for BOTH sides
_PERIODS = tuple(range(2, 31))
_PW: dict[int, tuple[list[int], list[int]]] = {
    p: ([int(math.floor(math.cos(2.0 * math.pi * r / p) * _W_SCALE
                        + 0.5)) if math.cos(2.0 * math.pi * r / p) >= 0
         else -int(math.floor(-math.cos(2.0 * math.pi * r / p) * _W_SCALE
                              + 0.5)) for r in range(p)],
        [int(math.floor(math.sin(2.0 * math.pi * r / p) * _W_SCALE
                        + 0.5)) if math.sin(2.0 * math.pi * r / p) >= 0
         else -int(math.floor(-math.sin(2.0 * math.pi * r / p) * _W_SCALE
                              + 0.5)) for r in range(p)])
    for p in _PERIODS
}

# RBO depth coefficients (1-p)p^(d-1)/d, p = 0.9, shared verbatim
_RBO_P = 0.9
_RBO_DEPTH = 50
_RBO_COEF: list[float] = []
_pw = 1.0
for _d in range(1, _RBO_DEPTH + 1):
    _RBO_COEF.append(0.1 * _pw / float(_d))
    _pw = _pw * _RBO_P


# ---------------------------------------------------------------------------
# dominant period scan
# ---------------------------------------------------------------------------


def q_dominant_period_scan(sf_dir: str):
    """Periodogram argmax over periods 2..30 + spectral entropy
    (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    y = (np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)) \
        .astype(np.int64)
    n = len(y)
    s = int(y.sum())
    idx = np.arange(n, dtype=np.int64)
    nums: list[int] = []
    for p in _PERIODS:
        cw = np.array(_PW[p][0], np.int64)
        sw = np.array(_PW[p][1], np.int64)
        r = idx % p
        sc = int((y * cw[r]).sum())
        ss = int((y * sw[r]).sum())
        wc = int(cw[r].sum())
        ws = int(sw[r].sum())
        dc = n * sc - s * wc
        dsn = n * ss - s * ws
        nums.append(dc * dc + dsn * dsn)
    total = sum(nums)
    best_i = max(range(len(_PERIODS)), key=lambda i: (nums[i], -i))
    best_p = _PERIODS[best_i]
    hu = 0
    for v in nums:
        if v > 0:
            q = float(v) / float(total)
            hu += int(math.floor(q * math.log(1.0 / q) * 1e12 + 0.5))
    hnorm = float(hu) / 1e12 / math.log(float(len(_PERIODS)))
    share = float(nums[best_i]) / float(total)
    r6 = _round6(np.array([share, hnorm]))
    out = pd.DataFrame({"n_days": [n], "best_p": [best_p],
                        "best_num": [str(nums[best_i])],
                        "share6": [r6[0]], "h_norm6": [r6[1]]})
    for col in ("n_days", "best_p"):
        out[col] = out[col].astype(np.int64)
    return out


_W_ROWS = ",\n    ".join(
    f"({p}, {r}, {_PW[p][0][r]}, {_PW[p][1][r]})"
    for p in _PERIODS for r in range(p))

SQL_PERIOD_SCAN = f"""
WITH wt (p, r, cw, sw) AS (VALUES
    {_W_ROWS}),
dc0 AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d0 AS (
  SELECT CAST(round(c / 100000.0) AS BIGINT) AS y,
         (row_number() OVER (ORDER BY day) - 1)::BIGINT AS i
  FROM dc0),
st AS (SELECT count(*)::HUGEINT AS n, sum(y)::HUGEINT AS s FROM d0),
ps AS (
  SELECT wt.p, sum(d0.y::HUGEINT * wt.cw) AS sc,
         sum(d0.y::HUGEINT * wt.sw) AS ss,
         sum(wt.cw::HUGEINT) AS wc, sum(wt.sw::HUGEINT) AS ws
  FROM d0 JOIN wt ON wt.r = d0.i % wt.p GROUP BY 1),
nm AS (
  SELECT p, (st.n * sc - st.s * wc) * (st.n * sc - st.s * wc)
            + (st.n * ss - st.s * ws) * (st.n * ss - st.s * ws) AS num
  FROM ps, st),
tt AS (SELECT sum(num) AS total FROM nm),
hh AS (
  SELECT sum(CASE WHEN num > 0 THEN CAST(round(
           (CAST(num AS DOUBLE) / CAST(total AS DOUBLE))
           * ln(1.0 / (CAST(num AS DOUBLE) / CAST(total AS DOUBLE)))
           * 1000000000000.0) AS BIGINT) ELSE 0 END)::BIGINT AS hu
  FROM nm, tt),
bst AS (SELECT p, num FROM nm ORDER BY num DESC, p LIMIT 1)
SELECT st.n::BIGINT AS n_days, bst.p AS best_p,
       CAST(bst.num AS VARCHAR) AS best_num,
       round(CAST(bst.num AS DOUBLE) / CAST(tt.total AS DOUBLE), 6)
         AS share6,
       round(CAST(hh.hu AS DOUBLE) / 1000000000000.0
             / ln({float(len(_PERIODS))!r}), 6) AS h_norm6
FROM st, bst, tt, hh
"""


# ---------------------------------------------------------------------------
# Holt-Winters weekly
# ---------------------------------------------------------------------------


def q_holt_winters_weekly(sf_dir: str):
    """Additive Holt-Winters (m=7) per event type over the dense daily
    grid, recursive-CTE-replayed (docstring above)."""
    mat, types = _daily_cells(sf_dir)
    y = mat.astype(np.float64)
    ell = ((((((y[0] + y[1]) + y[2]) + y[3]) + y[4]) + y[5]) + y[6]) / 7.0
    b = np.zeros(len(types))
    buf = [y[i] - ell for i in range(7)]      # s1..s7 (s1 is 7 steps old)
    for t in range(7, y.shape[0]):
        lnew = 0.3 * (y[t] - buf[0]) + 0.7 * (ell + b)
        b = 0.2 * (lnew - ell) + 0.8 * b
        snew = 0.4 * (y[t] - lnew) + 0.6 * buf[0]
        ell = lnew
        buf = buf[1:] + [snew]
    fc = ell + b + buf[0]
    out = pd.DataFrame({"event_type": types, "l6": _round6(ell),
                        "b6": _round6(b), "fc1_6": _round6(fc)})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_HOLT_WINTERS = """
WITH RECURSIVE
d AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
span AS (SELECT min(day) AS dmin, max(day) AS dmax FROM d),
gd AS (
  SELECT row_number() OVER (ORDER BY day) AS t, day
  FROM (SELECT unnest(generate_series(dmin, dmax, INTERVAL '1 day'))
          AS day
        FROM span)),
g AS (
  SELECT gd.t, ty.event_type, coalesce(d.n, 0)::DOUBLE AS y
  FROM gd CROSS JOIN (SELECT DISTINCT event_type FROM d) ty
  LEFT JOIN d ON d.day = gd.day AND d.event_type = ty.event_type),
nd AS (SELECT max(t) AS dd FROM gd),
init AS (
  SELECT event_type,
         ((((((max(CASE WHEN t = 1 THEN y END)
              + max(CASE WHEN t = 2 THEN y END))
              + max(CASE WHEN t = 3 THEN y END))
              + max(CASE WHEN t = 4 THEN y END))
              + max(CASE WHEN t = 5 THEN y END))
              + max(CASE WHEN t = 6 THEN y END))
              + max(CASE WHEN t = 7 THEN y END)) / 7.0 AS l0,
         max(CASE WHEN t = 1 THEN y END) AS y1,
         max(CASE WHEN t = 2 THEN y END) AS y2,
         max(CASE WHEN t = 3 THEN y END) AS y3,
         max(CASE WHEN t = 4 THEN y END) AS y4,
         max(CASE WHEN t = 5 THEN y END) AS y5,
         max(CASE WHEN t = 6 THEN y END) AS y6,
         max(CASE WHEN t = 7 THEN y END) AS y7
  FROM g WHERE t <= 7 GROUP BY event_type),
r AS (
  SELECT 7::BIGINT AS t, event_type, l0 AS l, 0.0::DOUBLE AS b,
         y1 - l0 AS s1, y2 - l0 AS s2, y3 - l0 AS s3, y4 - l0 AS s4,
         y5 - l0 AS s5, y6 - l0 AS s6, y7 - l0 AS s7
  FROM init
  UNION ALL
  SELECT g.t, g.event_type,
         0.3 * (g.y - r.s1) + 0.7 * (r.l + r.b) AS l,
         0.2 * ((0.3 * (g.y - r.s1) + 0.7 * (r.l + r.b)) - r.l)
           + 0.8 * r.b AS b,
         r.s2 AS s1, r.s3 AS s2, r.s4 AS s3, r.s5 AS s4, r.s6 AS s5,
         r.s7 AS s6,
         0.4 * (g.y - (0.3 * (g.y - r.s1) + 0.7 * (r.l + r.b)))
           + 0.6 * r.s1 AS s7
  FROM r JOIN g ON g.event_type = r.event_type AND g.t = r.t + 1)
SELECT event_type, round(l, 6) AS l6, round(b, 6) AS b6,
       round(l + b + s1, 6) AS fc1_6
FROM r WHERE t = (SELECT dd FROM nd) ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# rank-biased overlap
# ---------------------------------------------------------------------------

_RBO_MULT = 2654435761
_RBO_MOD = 2**32


def q_rbo_chars_vs_hash(sf_dir: str):
    """RBO(p=0.9, depth 50) between the n_chars ranking and the
    multiplicative-hash ranking of documents (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "n_chars"])
    k = _RBO_DEPTH

    def topp(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (did * _RBO_MULT) % _RBO_MOD
        df = pd.DataFrame({"doc_id": did, "nc": nc, "h": h})
        a = df.sort_values(["nc", "doc_id"],
                           ascending=[False, True]).head(k)
        b = df.sort_values(["h", "doc_id"],
                           ascending=[False, True]).head(k)
        a = a.assign(lst=np.int64(0))
        b = b.assign(lst=np.int64(1))
        return _strip(pd.concat([a, b], ignore_index=True))

    parts = (ds.map_batches(topp, batch_format="pyarrow").to_pandas())
    a = (parts[parts["lst"] == 0]
         .sort_values(["nc", "doc_id"], ascending=[False, True])
         .head(k)["doc_id"].to_numpy(np.int64))
    b = (parts[parts["lst"] == 1]
         .sort_values(["h", "doc_id"], ascending=[False, True])
         .head(k)["doc_id"].to_numpy(np.int64))
    sa: set[int] = set()
    sb: set[int] = set()
    units = 0
    x50 = 0
    for d in range(1, k + 1):
        sa.add(int(a[d - 1]))
        sb.add(int(b[d - 1]))
        xd = len(sa & sb)
        units += int(math.floor(
            _RBO_COEF[d - 1] * float(xd) * 1e12 + 0.5))
        if d == k:
            x50 = xd
    rbo = float(units) / 1e12
    out = pd.DataFrame({"depth": [k], "x_final": [x50],
                        "rbo_units": [units],
                        "rbo6": [_round6(np.array([rbo]))[0]]})
    for col in ("depth", "x_final", "rbo_units"):
        out[col] = out[col].astype(np.int64)
    return out


_RBO_ROWS = ",\n    ".join(
    f"({d}, {_RBO_COEF[d - 1]!r})" for d in range(1, _RBO_DEPTH + 1))

SQL_RBO = f"""
WITH co (d, coef) AS (VALUES
    {_RBO_ROWS}),
docs AS (
  SELECT doc_id, n_chars,
         (doc_id * {_RBO_MULT}) % {_RBO_MOD} AS h
  FROM documents),
ra AS (
  SELECT doc_id, row_number()
           OVER (ORDER BY n_chars DESC, doc_id) AS r
  FROM docs QUALIFY r <= {_RBO_DEPTH}),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY h DESC, doc_id) AS r
  FROM docs QUALIFY r <= {_RBO_DEPTH}),
xd AS (
  SELECT co.d, co.coef,
         (SELECT count(*) FROM ra JOIN rb USING (doc_id)
          WHERE ra.r <= co.d AND rb.r <= co.d)::BIGINT AS x
  FROM co),
f AS (
  SELECT sum(CAST(round(coef * CAST(x AS DOUBLE) * 1000000000000.0)
                  AS BIGINT))::BIGINT AS units,
         max(CASE WHEN d = {_RBO_DEPTH} THEN x END)::BIGINT AS x_final
  FROM xd)
SELECT {_RBO_DEPTH} AS depth, x_final, units AS rbo_units,
       round(CAST(units AS DOUBLE) / 1000000000000.0, 6) AS rbo6
FROM f
"""


QUERIES61: dict[str, tuple] = {
    "dominant_period_scan": (q_dominant_period_scan, SQL_PERIOD_SCAN),
    "holt_winters_weekly": (q_holt_winters_weekly, SQL_HOLT_WINTERS),
    "rbo_chars_vs_hash": (q_rbo_chars_vs_hash, SQL_RBO),
}
