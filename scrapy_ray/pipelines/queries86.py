"""Eighty-sixth oracle-query batch — factorial variance decomposition /
marginal homogeneity / concordance correlation:

- twoway_ss_priority_status: two-way sum-of-squares decomposition of
  order totalprice cents over priority x status WITHOUT any float
  sums: every SS rides the pure-integer device
  q(S, m) = (S^2 * 1e6) // m (Python // == DuckDB // on HUGEINT;
  S^2*1e6 ~ 2e29 at sf0.1, inside int128), so SS_rows/cols/cells/
  interaction/error are exact integers in 1e-6 cent^2 units
  (VARCHAR outputs); the interaction F finalizes
  identical-expression with df = (4, 2, 8, n-15).
- stuart_maxwell_transitions: Stuart-Maxwell marginal-homogeneity
  chi-square of the within-user event-type transition table
  restricted to the top-3 types (picked by global count DESC, name —
  deterministic): with d_i = row_i - col_i and the closed-form 2x2
  inverse, chi2 = (V22 d1^2 - 2 V12 d1 d2 + V11 d2^2) /
  (V11 V22 - V12^2) — one float division of exact ints.  Transitions
  order by the full (ts, event_id) key inside user-salted partitions
  (the burstiness discipline).
- lin_ccc_daily: Lin's concordance correlation between daily click
  and view counts — multiplied through by n^2 the whole statistic is
  ONE exact integer ratio: 2(n Sxy - Sx Sy) /
  (n Sxx - Sx^2 + n Syy - Sy^2 + (Sx - Sy)^2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Two-way SS decomposition
# ---------------------------------------------------------------------------


def q_twoway_ss_priority_status(sf_dir: str):
    """Exact-integer two-way SS decomposition (docstring above)."""
    ds = _pq(sf_dir, "orders",
             columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    # block-partial sums of cents^2 can overflow int64 (2.5e15 per row),
    # so each square ships as a (hi, lo) = divmod(c^2, 1e9) pair whose
    # component sums stay int64-safe; syy reassembles exactly per cell
    def cpart2(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        hi, lo = np.divmod(c * c, np.int64(10 ** 9))
        df = pd.DataFrame({"r": t["o_orderpriority"].to_pylist(),
                           "c": t["o_orderstatus"].to_pylist(),
                           "s": c, "hi": hi, "lo": lo,
                           "n": np.int64(1)})
        g = df.groupby(["r", "c"], sort=False).agg(
            s=("s", "sum"), hi=("hi", "sum"), lo=("lo", "sum"),
            n=("n", "sum")).reset_index()
        for col in ("s", "hi", "lo", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart2, batch_format="pyarrow")
               .groupby(["r", "c"])
               .aggregate(Sum("s", alias_name="s"),
                          Sum("hi", alias_name="hi"),
                          Sum("lo", alias_name="lo"),
                          Sum("n", alias_name="n"))
               .to_pandas())
    rows = [(str(r), str(c), int(s), int(h) * 10 ** 9 + int(lo), int(n))
            for r, c, s, h, lo, n in zip(cells["r"], cells["c"],
                                         cells["s"], cells["hi"],
                                         cells["lo"], cells["n"])]
    n = sum(v[4] for v in rows)
    s = sum(v[2] for v in rows)
    syy = sum(v[3] for v in rows)
    grand_q = (s * s * 1000000) // n
    sst_q = syy * 1000000 - grand_q
    rt: dict[str, list] = {}
    ct: dict[str, list] = {}
    for r, c, sv, _, nv in rows:
        rt.setdefault(r, [0, 0])
        rt[r][0] += sv
        rt[r][1] += nv
        ct.setdefault(c, [0, 0])
        ct[c][0] += sv
        ct[c][1] += nv
    ssr_q = sum((v[0] * v[0] * 1000000) // v[1]
                for v in rt.values()) - grand_q
    ssc_q = sum((v[0] * v[0] * 1000000) // v[1]
                for v in ct.values()) - grand_q
    sscell_q = sum((v[2] * v[2] * 1000000) // v[4]
                   for v in rows) - grand_q
    ssint_q = sscell_q - ssr_q - ssc_q
    sse_q = sst_q - sscell_q
    df_e = n - len(rt) * len(ct)
    f_int = ((float(ssint_q) / float((len(rt) - 1) * (len(ct) - 1)))
             / (float(sse_q) / float(df_e)))
    out = pd.DataFrame({"n": [n], "sst_q": [str(sst_q)],
                        "ssr_q": [str(ssr_q)], "ssc_q": [str(ssc_q)],
                        "ssint_q": [str(ssint_q)],
                        "sse_q": [str(sse_q)],
                        "f_int6": [_round6(np.array([f_int]))[0]]})
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_TWOWAY_SS = """
WITH b AS (
  SELECT o_orderpriority AS r, o_orderstatus AS c,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders),
cells AS (
  SELECT r, c, sum(v)::HUGEINT AS s, sum(v::HUGEINT * v) AS syy,
         count(*)::BIGINT AS n
  FROM b GROUP BY 1, 2),
t AS (
  SELECT sum(s) AS s, sum(syy) AS syy, sum(n)::BIGINT AS n,
         count(DISTINCT r)::BIGINT AS nr,
         count(DISTINCT c)::BIGINT AS nc
  FROM cells),
g AS (SELECT (s * s * 1000000) // n AS grand_q, n, nr, nc,
             syy * 1000000 AS syyq
      FROM t),
rq AS (SELECT sum((s * s * 1000000) // n) AS q
       FROM (SELECT sum(s) AS s, sum(n) AS n FROM cells GROUP BY r)),
cq AS (SELECT sum((s * s * 1000000) // n) AS q
       FROM (SELECT sum(s) AS s, sum(n) AS n FROM cells GROUP BY c)),
cel AS (SELECT sum((s * s * 1000000) // n) AS q FROM cells),
f AS (
  SELECT n, nr, nc,
         syyq - grand_q AS sst_q,
         rq.q - grand_q AS ssr_q,
         cq.q - grand_q AS ssc_q,
         cel.q - grand_q - (rq.q - grand_q) - (cq.q - grand_q)
           AS ssint_q,
         (syyq - grand_q) - (cel.q - grand_q) AS sse_q
  FROM g, rq, cq, cel)
SELECT n, CAST(sst_q AS VARCHAR) AS sst_q,
       CAST(ssr_q AS VARCHAR) AS ssr_q,
       CAST(ssc_q AS VARCHAR) AS ssc_q,
       CAST(ssint_q AS VARCHAR) AS ssint_q,
       CAST(sse_q AS VARCHAR) AS sse_q,
       round((CAST(ssint_q AS DOUBLE)
              / CAST((nr - 1)::HUGEINT * (nc - 1) AS DOUBLE))
             / (CAST(sse_q AS DOUBLE)
                / CAST(n - nr * nc AS DOUBLE)), 6) AS f_int6
FROM f
"""


# ---------------------------------------------------------------------------
# Stuart-Maxwell
# ---------------------------------------------------------------------------

_SM_PARTS = 64


def q_stuart_maxwell_transitions(sf_dir: str):
    """Stuart-Maxwell chi-square on the top-3-type transition table
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                        "event_type"])

    def epart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": t["ts"].cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "eid": t["event_id"].to_numpy(zero_copy_only=False),
            "et": t["event_type"].to_pylist()})
        df["gkey"] = (df["user_id"] % _SM_PARTS).astype(np.int32)
        return _strip(df)

    def trans(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "eid"], kind="mergesort")
        u = df["user_id"].to_numpy()
        et = df["et"].to_numpy()
        same = u[1:] == u[:-1]
        out = pd.DataFrame({"f": et[:-1][same], "t": et[1:][same],
                            "cnt": np.int64(1)})
        g = out.groupby(["f", "t"], sort=False).sum().reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    tab = (ds.map_batches(epart, batch_format="pyarrow")
             .groupby("gkey").map_groups(trans, batch_format="pandas")
             .to_pandas()
             .groupby(["f", "t"]).sum().reset_index())
    tot: dict[str, int] = {}
    for f, t, c in zip(tab["f"], tab["t"], tab["cnt"]):
        tot[f] = tot.get(f, 0) + int(c)
        tot[t] = tot.get(t, 0) + int(c)
    top3 = sorted(tot, key=lambda k: (-tot[k], k))[:3]
    tmap = {(f, t): int(c)
            for f, t, c in zip(tab["f"], tab["t"], tab["cnt"])
            if f in top3 and t in top3}

    def cell(i, j):
        return tmap.get((top3[i], top3[j]), 0)

    row = [sum(cell(i, j) for j in range(3)) for i in range(3)]
    col = [sum(cell(i, j) for i in range(3)) for j in range(3)]
    d1 = row[0] - col[0]
    d2 = row[1] - col[1]
    v11 = row[0] + col[0] - 2 * cell(0, 0)
    v22 = row[1] + col[1] - 2 * cell(1, 1)
    v12 = -(cell(0, 1) + cell(1, 0))
    num = v22 * d1 * d1 - 2 * v12 * d1 * d2 + v11 * d2 * d2
    den = v11 * v22 - v12 * v12
    chi2 = float(num) / float(den)
    cols = {"t1": top3[0], "t2": top3[1], "t3": top3[2]}
    for i in range(3):
        for j in range(3):
            cols[f"n{i}{j}"] = cell(i, j)
    out = pd.DataFrame({k: [v] for k, v in cols.items()})
    for i in range(3):
        for j in range(3):
            out[f"n{i}{j}"] = out[f"n{i}{j}"].astype(np.int64)
    out["chi2_6"] = _round6(np.array([chi2]))[0]
    return out


SQL_STUART_MAXWELL = """
WITH seqd AS (
  SELECT user_id, event_type AS f,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS t
  FROM events),
tr AS (SELECT f, t, count(*)::BIGINT AS cnt FROM seqd
       WHERE t IS NOT NULL GROUP BY 1, 2),
tot AS (
  SELECT k, sum(c)::BIGINT AS c FROM (
    SELECT f AS k, sum(cnt) AS c FROM tr GROUP BY 1
    UNION ALL
    SELECT t AS k, sum(cnt) AS c FROM tr GROUP BY 1)
  GROUP BY 1),
top3 AS (
  SELECT k, row_number() OVER (ORDER BY c DESC, k) AS rk
  FROM tot QUALIFY rk <= 3),
m AS (
  SELECT a.rk - 1 AS i, b.rk - 1 AS j,
         coalesce((SELECT cnt FROM tr
                   WHERE tr.f = a.k AND tr.t = b.k), 0)::BIGINT AS n
  FROM top3 a CROSS JOIN top3 b),
piv AS (
  SELECT
    max(CASE WHEN i = 0 AND j = 0 THEN n END) AS n00,
    max(CASE WHEN i = 0 AND j = 1 THEN n END) AS n01,
    max(CASE WHEN i = 0 AND j = 2 THEN n END) AS n02,
    max(CASE WHEN i = 1 AND j = 0 THEN n END) AS n10,
    max(CASE WHEN i = 1 AND j = 1 THEN n END) AS n11,
    max(CASE WHEN i = 1 AND j = 2 THEN n END) AS n12,
    max(CASE WHEN i = 2 AND j = 0 THEN n END) AS n20,
    max(CASE WHEN i = 2 AND j = 1 THEN n END) AS n21,
    max(CASE WHEN i = 2 AND j = 2 THEN n END) AS n22
  FROM m),
lbl AS (
  SELECT max(CASE WHEN rk = 1 THEN k END) AS t1,
         max(CASE WHEN rk = 2 THEN k END) AS t2,
         max(CASE WHEN rk = 3 THEN k END) AS t3
  FROM top3),
f AS (
  SELECT piv.*,
         (n00 + n01 + n02) - (n00 + n10 + n20) AS d1,
         (n10 + n11 + n12) - (n01 + n11 + n21) AS d2,
         (n00 + n01 + n02) + (n00 + n10 + n20) - 2 * n00 AS v11,
         (n10 + n11 + n12) + (n01 + n11 + n21) - 2 * n11 AS v22,
         -(n01 + n10) AS v12
  FROM piv)
SELECT t1, t2, t3, n00, n01, n02, n10, n11, n12, n20, n21, n22,
       round(CAST(v22::HUGEINT * d1 * d1 - 2::HUGEINT * v12 * d1 * d2
                  + v11::HUGEINT * d2 * d2 AS DOUBLE)
             / CAST(v11::HUGEINT * v22 - v12::HUGEINT * v12 AS DOUBLE),
             6) AS chi2_6
FROM f CROSS JOIN lbl
"""


# ---------------------------------------------------------------------------
# Lin's CCC
# ---------------------------------------------------------------------------


def q_lin_ccc_daily(sf_dir: str):
    """Lin concordance correlation of daily click vs view counts
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist())
        df = pd.DataFrame({"day": day,
                           "x": (et == "click").astype(np.int64),
                           "y": (et == "view").astype(np.int64)})
        g = df.groupby("day", sort=False).sum().reset_index()
        for c in ("x", "y"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    daily = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("x", alias_name="x"),
                                         Sum("y", alias_name="y"))
               .to_pandas())
    x = [int(v) for v in daily["x"]]
    y = [int(v) for v in daily["y"]]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    syy = sum(v * v for v in y)
    sxy = sum(a * b for a, b in zip(x, y))
    num = 2 * (n * sxy - sx * sy)
    den = (n * sxx - sx * sx) + (n * syy - sy * sy) + (sx - sy) ** 2
    ccc = float(num) / float(den)
    out = pd.DataFrame({"n_days": [n], "sx": [sx], "sy": [sy],
                        "num": [num], "den": [den],
                        "ccc6": [_round6(np.array([ccc]))[0]]})
    for col in ("n_days", "sx", "sy", "num", "den"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LIN_CCC = f"""
WITH daily AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'view')::INT)::BIGINT AS y
  FROM events GROUP BY 1),
m AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
         sum(y * y)::BIGINT AS syy, sum(x * y)::BIGINT AS sxy
  FROM daily)
SELECT n AS n_days, sx, sy,
       (2 * (n * sxy - sx * sy))::BIGINT AS num,
       ((n * sxx - sx * sx) + (n * syy - sy * sy)
        + (sx - sy) * (sx - sy))::BIGINT AS den,
       round(CAST(2 * (n * sxy - sx * sy) AS DOUBLE)
             / CAST((n * sxx - sx * sx) + (n * syy - sy * sy)
                    + (sx - sy) * (sx - sy) AS DOUBLE), 6) AS ccc6
FROM m
"""


QUERIES86: dict[str, tuple] = {
    "twoway_ss_priority_status": (q_twoway_ss_priority_status,
                                  SQL_TWOWAY_SS),
    "stuart_maxwell_transitions": (q_stuart_maxwell_transitions,
                                   SQL_STUART_MAXWELL),
    "lin_ccc_daily": (q_lin_ccc_daily, SQL_LIN_CCC),
}
