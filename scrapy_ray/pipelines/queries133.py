"""One-hundred-thirty-third oracle-query batch — 1-D classing and
distribution-shape diagnostics of order prices:

- jenks_3breaks_orders: EXACT Jenks natural breaks into 3 classes on
  dollar-quantized prices with $100-bucket boundaries — a full scan
  of all boundary pairs on prefix sums. Per-class SSD clears to
  (n·Q − S²)/n (HUGEINT numerators, one division per class); the
  argmin is on floor-quantized total SSE with (t1, t2) tiebreak.
- lorenz_asymmetry_orders: the Lorenz asymmetry coefficient
  F(μ) + L(μ). The below-mean count/sum use the EXACT integer
  comparison cents·n < S (no float mean test); the interpolation δ
  and both coordinates finalize through identical float expressions.
- kde_mode_orders: PURE-integer kernel-smoothed mode — the $100
  bucket histogram convolved with the fixed integer kernel
  [1,2,3,2,1]; argmax with smallest-bucket tiebreak.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _dollar_hist(sf_dir: str) -> pd.DataFrame:
    """$100-bucket histogram of order prices with exact per-bucket
    (count, Σdollars, Σdollars²); dollars = cents // 100."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        d = c // 100
        g = pd.DataFrame({"b": d // 100, "n": np.int64(1), "s": d,
                          "q": d * d}) \
            .groupby("b", sort=False).sum().reset_index()
        for col in ("n", "s", "q"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("b").aggregate(Sum("n", alias_name="n"),
                                      Sum("s", alias_name="s"),
                                      Sum("q", alias_name="q"))
              .to_pandas().sort_values("b").reset_index(drop=True))


# ---------------------------------------------------------------------------
# Jenks 3-class natural breaks
# ---------------------------------------------------------------------------


def q_jenks_3breaks_orders(sf_dir: str):
    """Exact 3-class Jenks breaks (docstring above).

    The boundary-pair scan runs in TWO stages so no O(B²) Python-object
    bigint matrix is ever built (the first cut took 71 s at sf0.01):
    a blocked float64 sweep bounds every pair's total SSE to within
    ~qt·eps ≈ tens of units (the SSE scale is ~1e15), then only the
    pairs within a safety margin of the float minimum are re-evaluated
    EXACTLY (Python bigint numerators, the same CAST(HUGEINT AS DOUBLE)
    finalization as the oracle) and the floor-quantized (tot, t1, t2)
    argmin is taken over that tiny candidate set."""
    h = _dollar_hist(sf_dir)
    b = h["b"].to_numpy(np.int64)
    cn = np.cumsum(h["n"].to_numpy(np.int64))
    cs = np.cumsum(h["s"].to_numpy(np.int64))
    cq = np.cumsum(h["q"].to_numpy(np.int64))
    nb = len(b)
    nt, st, qt = int(cn[-1]), int(cs[-1]), int(cq[-1])

    fn_, fs_, fq_ = (cn.astype(np.float64), cs.astype(np.float64),
                     cq.astype(np.float64))
    fnt, fst, fqt = float(nt), float(st), float(qt)
    # float error per class is bounded by ~4·eps·(n·q)/n = 4·eps·qt
    # (tens of units at sf0.1 where SSE ~1e15); ×3 classes, doubled for
    # slack, +2 covers floor-quantization near-ties
    margin = 24.0 * 2.3e-16 * fqt + 2.0
    cand_i: list[np.ndarray] = []
    cand_j: list[np.ndarray] = []
    cand_t: list[np.ndarray] = []
    best = np.inf
    j_idx = np.arange(nb)
    for lo in range(0, nb - 1, 256):
        hi = min(lo + 256, nb - 1)
        n1 = fn_[lo:hi, None]
        s1 = fs_[lo:hi, None]
        q1 = fq_[lo:hi, None]
        n2 = fn_[None, :] - n1
        s2 = fs_[None, :] - s1
        q2 = fq_[None, :] - q1
        n3 = fnt - fn_[None, :]
        s3 = fst - fs_[None, :]
        q3 = fqt - fq_[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            tot = ((n1 * q1 - s1 * s1) / n1
                   + (n2 * q2 - s2 * s2) / n2
                   + (n3 * q3 - s3 * s3) / n3)
        valid = (j_idx[None, :] > np.arange(lo, hi)[:, None]) \
            & (j_idx[None, :] < nb - 1)
        tot = np.where(valid, tot, np.inf)
        blk_min = float(tot.min())
        best = min(best, blk_min)
        ii, jj = np.nonzero(tot <= best + margin)
        if len(ii):
            cand_i.append(ii + lo)
            cand_j.append(jj)
            cand_t.append(tot[ii, jj])
    ci = np.concatenate(cand_i)
    cj = np.concatenate(cand_j)
    ct = np.concatenate(cand_t)
    keep = ct <= best + margin
    ci, cj = ci[keep], cj[keep]

    import math

    def exact_tot(i: int, j: int) -> float:
        n1, s1, q1 = int(cn[i]), int(cs[i]), int(cq[i])
        n2 = int(cn[j]) - n1
        s2 = int(cs[j]) - s1
        q2 = int(cq[j]) - q1
        n3, s3, q3 = nt - int(cn[j]), st - int(cs[j]), qt - int(cq[j])
        return (float(n1 * q1 - s1 * s1) / float(n1)
                + float(n2 * q2 - s2 * s2) / float(n2)
                + float(n3 * q3 - s3 * s3) / float(n3))

    key = None
    i = j = 0
    total = np.inf
    for ii, jj in zip(ci.tolist(), cj.tolist()):
        t = exact_tot(ii, jj)
        k = (math.floor(t), int(b[ii]), int(b[jj]))
        if key is None or k < key:
            key, i, j, total = k, ii, jj, t
    t1, t2 = int(b[i]), int(b[j])
    out = pd.DataFrame({
        "t1_bucket": [t1], "t2_bucket": [t2],
        "n1": [int(cn[i])], "n2": [int(cn[j] - cn[i])],
        "n3": [nt - int(cn[j])],
        "sse6": [_round6(np.array([total]))[0]]})
    for col in ("t1_bucket", "t2_bucket", "n1", "n2", "n3"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_JENKS = """
WITH r AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS d
  FROM orders),
h AS (
  SELECT d // 100 AS b, count(*)::BIGINT AS n, sum(d)::BIGINT AS s,
         sum(CAST(d AS HUGEINT) * d)::BIGINT AS q
  FROM r GROUP BY 1),
p AS (
  SELECT b, sum(n) OVER w AS cn, sum(s) OVER w AS cs,
         sum(q) OVER w AS cq,
         row_number() OVER (ORDER BY b) AS rn,
         count(*) OVER () AS nb
  FROM h
  WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)),
tot AS (SELECT max(cn)::BIGINT AS nt, max(cs)::BIGINT AS st,
               max(cq)::BIGINT AS qt
        FROM p),
pairs AS (
  SELECT a.b AS t1, b2.b AS t2, a.cn AS n1,
         b2.cn - a.cn AS n2, nt - b2.cn AS n3,
         CAST(CAST(a.cn AS HUGEINT) * a.cq
              - CAST(a.cs AS HUGEINT) * a.cs AS DOUBLE)
           / CAST(a.cn AS DOUBLE)
         + CAST(CAST(b2.cn - a.cn AS HUGEINT) * (b2.cq - a.cq)
                - CAST(b2.cs - a.cs AS HUGEINT) * (b2.cs - a.cs)
                AS DOUBLE)
           / CAST(b2.cn - a.cn AS DOUBLE)
         + CAST(CAST(nt - b2.cn AS HUGEINT) * (qt - b2.cq)
                - CAST(st - b2.cs AS HUGEINT) * (st - b2.cs)
                AS DOUBLE)
           / CAST(nt - b2.cn AS DOUBLE) AS tot
  FROM p a JOIN p b2 ON b2.rn > a.rn AND b2.rn < a.nb
       CROSS JOIN tot),
pick AS (
  SELECT *, row_number() OVER (ORDER BY CAST(floor(tot) AS BIGINT),
                               t1, t2) AS r
  FROM pairs)
SELECT t1 AS t1_bucket, t2 AS t2_bucket, n1::BIGINT AS n1,
       n2::BIGINT AS n2, n3::BIGINT AS n3, round(tot, 6) AS sse6
FROM pick WHERE r = 1
"""


# ---------------------------------------------------------------------------
# Lorenz asymmetry
# ---------------------------------------------------------------------------


def q_lorenz_asymmetry_orders(sf_dir: str):
    """Lorenz asymmetry coefficient F(μ)+L(μ) (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"cents": c, "n": np.int64(1)}) \
            .groupby("cents", sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(hpart, batch_format="pyarrow")
           .groupby("cents").aggregate(Sum("n", alias_name="n"))
           .to_pandas().sort_values("cents").reset_index(drop=True))
    v = h["cents"].to_numpy(np.int64)
    cnt = h["n"].to_numpy(np.int64)
    n = int(cnt.sum())
    s = int((v.astype(object) * cnt.astype(object)).sum())
    below = v.astype(object) * n < s          # exact: x·n < S ⇔ x < μ
    m = int(cnt[np.asarray(below, bool)].sum())
    lm = int((v.astype(object)
              * cnt.astype(object))[np.asarray(below, bool)].sum())
    xm = int(v[np.asarray(below, bool)].max())
    xm1 = int(v[~np.asarray(below, bool)].min())
    mu = float(s) / float(n)
    delta = (mu - float(xm)) / (float(xm1) - float(xm))
    ff = (float(m) + delta) / float(n)
    ll = (float(lm) + delta * float(xm1)) / float(s)
    lac = ff + ll
    out = pd.DataFrame({"n": [n], "m_below": [m],
                        "f6": [_round6(np.array([ff]))[0]],
                        "l6": [_round6(np.array([ll]))[0]],
                        "lac6": [_round6(np.array([lac]))[0]]})
    for col in ("n", "m_below"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LORENZ_ASYM = """
WITH r AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders),
t AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s FROM r),
bl AS (
  SELECT sum((CAST(x AS HUGEINT) * n < s)::INT)::BIGINT AS m,
         sum(CASE WHEN CAST(x AS HUGEINT) * n < s THEN x
                  ELSE 0 END)::BIGINT AS lm,
         max(CASE WHEN CAST(x AS HUGEINT) * n < s THEN x END)
           ::BIGINT AS xm,
         min(CASE WHEN CAST(x AS HUGEINT) * n >= s THEN x END)
           ::BIGINT AS xm1
  FROM r CROSS JOIN t),
f AS (
  SELECT n, s, m, lm, xm, xm1,
         (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - CAST(xm AS DOUBLE))
           / (CAST(xm1 AS DOUBLE) - CAST(xm AS DOUBLE)) AS delta
  FROM t CROSS JOIN bl)
SELECT n, m AS m_below,
       round((CAST(m AS DOUBLE) + delta) / CAST(n AS DOUBLE), 6)
         AS f6,
       round((CAST(lm AS DOUBLE) + delta * CAST(xm1 AS DOUBLE))
             / CAST(s AS DOUBLE), 6) AS l6,
       round((CAST(m AS DOUBLE) + delta) / CAST(n AS DOUBLE)
             + (CAST(lm AS DOUBLE) + delta * CAST(xm1 AS DOUBLE))
               / CAST(s AS DOUBLE), 6) AS lac6
FROM f
"""


# ---------------------------------------------------------------------------
# Kernel-smoothed mode
# ---------------------------------------------------------------------------


def q_kde_mode_orders(sf_dir: str):
    """[1,2,3,2,1]-smoothed histogram mode (docstring above)."""
    h = _dollar_hist(sf_dir)
    b = h["b"].to_numpy(np.int64)
    cnt = h["n"].to_numpy(np.int64)
    full = np.zeros(int(b.max()) + 3, np.int64)
    full[b] = cnt
    pad = np.concatenate((np.zeros(2, np.int64), full,
                          np.zeros(2, np.int64)))
    sm = (pad[:-4] + 2 * pad[1:-3] + 3 * pad[2:-2] + 2 * pad[3:-1]
          + pad[4:])
    k = int(np.argmax(sm))            # first max = smallest bucket
    out = pd.DataFrame({"mode_bucket": [k], "smoothed": [int(sm[k])],
                        "raw_cnt": [int(full[k])]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_KDE_MODE = """
WITH r AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 10000 AS b
  FROM orders),
h AS (SELECT b, count(*)::BIGINT AS n FROM r GROUP BY 1),
grid AS (
  SELECT g.b, coalesce(h.n, 0) AS n
  FROM (SELECT unnest(range(0, (SELECT max(b) + 3 FROM h))) AS b) g
  LEFT JOIN h USING (b)),
sm AS (
  SELECT b,
         coalesce(lag(n, 2) OVER w, 0)
         + 2 * coalesce(lag(n, 1) OVER w, 0)
         + 3 * n
         + 2 * coalesce(lead(n, 1) OVER w, 0)
         + coalesce(lead(n, 2) OVER w, 0) AS s, n
  FROM grid WINDOW w AS (ORDER BY b)),
pick AS (
  SELECT b, s, n, row_number() OVER (ORDER BY s DESC, b) AS r
  FROM sm)
SELECT b AS mode_bucket, s::BIGINT AS smoothed, n::BIGINT AS raw_cnt
FROM pick WHERE r = 1
"""


QUERIES133: dict[str, tuple] = {
    "jenks_3breaks_orders": (q_jenks_3breaks_orders, SQL_JENKS),
    "lorenz_asymmetry_orders": (q_lorenz_asymmetry_orders,
                                SQL_LORENZ_ASYM),
    "kde_mode_orders": (q_kde_mode_orders, SQL_KDE_MODE),
}
