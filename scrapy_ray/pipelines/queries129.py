"""One-hundred-twenty-ninth oracle-query batch — spatial hotspots,
tax progressivity, and detrended cross-correlation:

- getis_ord_docs: top-5 Getis-Ord G* hotspot z-scores of n_chars on
  the quadratic doc graph ((id²+c) % n, c ∈ 1..3, self-inclusive
  star neighborhood). The numerator clears to n·Σ_{N*(i)}x − W_i·S
  (exact int, W_i = 1+indegree); ordering is by floor-quantized z
  with doc_id tiebreak (the kulldorff device); the z denominator
  finalizes through identical float expressions on exact n·Q − S².
- suits_index_tax: Suits progressivity index of per-row tax burden
  (round(price·tax·100) cents) against price, accumulated over $100
  price buckets: the trapezoid sum K = ΣΔX·(Y_k + Y_{k−1}) is an
  exact (HUGEINT) integer and S = 1 − K/(X_n·Y_n) is one float
  expression.
- dcca_daily: detrended cross-correlation coefficient rho_DCCA at
  window sizes 8 and 16 between daily revenue ($1000-quantized) and
  daily order count, on cleared profiles P_t = n·C_t − t·S. The
  per-window detrended (co)variance clears to
  ((s·Spq − Sp·Sq)·c − (s·Sxp − Sx·Sp)(s·Sxq − Sx·Sq))/(s·c) —
  1e-6-quantized per window (signed), exact sums per size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _US_PER_DAY, _strip


def _rint(x: float) -> int:
    return int(np.sign(x) * np.floor(np.abs(x) + 0.5))


# ---------------------------------------------------------------------------
# Getis-Ord G*
# ---------------------------------------------------------------------------


def q_getis_ord_docs(sf_dir: str):
    """Top-5 G* hotspots on the quadratic doc graph (docstring)."""
    n = _nrows(sf_dir, "documents")
    ds = _pq(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def mpart(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"g": pa.array([0], pa.int64()),
                         "s": pa.array([int(x.sum())], pa.int64()),
                         "q": pa.array([int((x * x).sum())], pa.int64())})

    mm = (ds.map_batches(mpart, batch_format="pyarrow")
            .groupby("g").aggregate(Sum("s", alias_name="s"),
                                    Sum("q", alias_name="q"))
            .to_pandas())
    s_tot, q_tot = int(mm["s"].iloc[0]), int(mm["q"].iloc[0])
    sxf = np.sqrt(float(n * q_tot - s_tot * s_tot)) / float(n)

    def scatter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = [ids]
        val = [x]
        tag = [np.zeros(len(ids), np.int64)]       # own value
        for cc in (1, 2, 3):
            key.append((ids * ids + cc) % n)
            val.append(x)
            tag.append(np.ones(len(ids), np.int64))
        allk = np.concatenate(key)
        return pa.table({"key": pa.array(allk),
                         "val": pa.array(np.concatenate(val)),
                         "tag": pa.array(np.concatenate(tag)),
                         "gkey": pa.array((allk % 256)
                                          .astype(np.int32))})

    def gstar(df: pd.DataFrame) -> pd.DataFrame:
        own = df[df["tag"] == 0]
        inn = df[df["tag"] == 1].groupby("key")["val"] \
            .agg(["sum", "count"])
        keys = own["key"].to_numpy(np.int64)
        xo = own["val"].to_numpy(np.int64)
        sin = inn["sum"].reindex(keys).fillna(0).to_numpy(np.int64)
        deg = inn["count"].reindex(keys).fillna(0).to_numpy(np.int64)
        sxs = xo + sin
        w = 1 + deg
        num = (n * sxs - w * s_tot).astype(np.float64)
        nw = (n * w - w * w).astype(np.float64)
        z = (num / float(n)) / (sxf * np.sqrt(nw / float(n - 1)))
        fq = np.floor(z * 1000000.0)
        d = pd.DataFrame({"doc_id": keys, "w": w, "fq": fq, "z": z})
        return d.sort_values(["fq", "doc_id"],
                             ascending=[False, True]).head(5)

    parts = (ds.map_batches(scatter, batch_format="pyarrow")
               .groupby("gkey").map_groups(gstar, batch_format="pandas")
               .to_pandas())
    top = parts.sort_values(["fq", "doc_id"],
                            ascending=[False, True]).head(5)
    out = pd.DataFrame({"doc_id": top["doc_id"].astype(np.int64),
                        "w": top["w"].astype(np.int64),
                        "z6": _round6(top["z"].to_numpy())})
    return out.reset_index(drop=True)


SQL_GETIS_ORD = """
WITH nd AS (SELECT count(*)::BIGINT AS n FROM documents),
m AS (
  SELECT sum(n_chars)::BIGINT AS st,
         sum(CAST(n_chars AS HUGEINT) * n_chars)::BIGINT AS qt
  FROM documents),
e AS (
  SELECT (d.doc_id * d.doc_id + c.c) % nd.n AS v, d.n_chars AS x
  FROM documents d, (SELECT unnest([1, 2, 3]) AS c) c JOIN nd ON true),
zin AS (
  SELECT v AS doc_id, sum(x)::BIGINT AS sin, count(*)::BIGINT AS deg
  FROM e GROUP BY 1),
st AS (
  SELECT d.doc_id, d.n_chars + coalesce(zin.sin, 0) AS sxs,
         1 + coalesce(zin.deg, 0) AS w
  FROM documents d LEFT JOIN zin ON zin.doc_id = d.doc_id),
z AS (
  SELECT doc_id, w,
         (CAST(nd.n * sxs - w * m.st AS DOUBLE) / CAST(nd.n AS DOUBLE))
         / ((sqrt(CAST(CAST(nd.n AS HUGEINT) * m.qt
                       - CAST(m.st AS HUGEINT) * m.st
                       AS DOUBLE)) / CAST(nd.n AS DOUBLE))
            * sqrt(CAST(nd.n * w - w * w AS DOUBLE)
                   / CAST(nd.n - 1 AS DOUBLE))) AS z
  FROM st CROSS JOIN nd CROSS JOIN m)
SELECT doc_id, w::BIGINT AS w, round(z, 6) AS z6
FROM z
ORDER BY CAST(floor(z * 1000000.0) AS BIGINT) DESC, doc_id
LIMIT 5
"""


# ---------------------------------------------------------------------------
# Suits index
# ---------------------------------------------------------------------------


def q_suits_index_tax(sf_dir: str):
    """Suits progressivity index of tax burden vs price (docstring)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_extendedprice", "l_tax"])

    def bpart(t: pa.Table) -> pa.Table:
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        tx = t["l_tax"].to_numpy(zero_copy_only=False)
        pc = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        bt = p * tx * 100.0
        tc = (np.sign(bt) * np.floor(np.abs(bt) + 0.5)).astype(np.int64)
        g = pd.DataFrame({"b": pc // 10000, "px": pc, "ty": tc}) \
            .groupby("b", sort=False).sum().reset_index()
        for col in ("px", "ty"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(bpart, batch_format="pyarrow")
           .groupby("b").aggregate(Sum("px", alias_name="px"),
                                   Sum("ty", alias_name="ty"))
           .to_pandas().sort_values("b").reset_index(drop=True))
    px = [int(v) for v in h["px"]]
    ty = [int(v) for v in h["ty"]]
    xk = yk = 0
    kk = 0
    for dx, dy in zip(px, ty):
        x1, y1 = xk + dx, yk + dy
        kk += (x1 - xk) * (y1 + yk)
        xk, yk = x1, y1
    suits = 1.0 - float(kk) / (float(xk) * float(yk))
    out = pd.DataFrame({"n_buckets": [len(px)], "x_tot": [xk],
                        "y_tot": [yk],
                        "suits6": [_round6(np.array([suits]))[0]]})
    for col in ("n_buckets", "x_tot", "y_tot"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SUITS = """
WITH r AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(round(l_extendedprice * l_tax * 100) AS BIGINT) AS tc
  FROM lineitem),
h AS (
  SELECT pc // 10000 AS b, sum(pc)::BIGINT AS px, sum(tc)::BIGINT AS ty
  FROM r GROUP BY 1),
c AS (
  SELECT b, px, ty,
         sum(px) OVER (ORDER BY b) AS xk,
         sum(ty) OVER (ORDER BY b) AS yk
  FROM h),
k AS (
  SELECT sum(CAST(px AS HUGEINT) * (yk + (yk - ty))) AS kk,
         max(xk)::BIGINT AS x_tot, max(yk)::BIGINT AS y_tot,
         count(*)::BIGINT AS nb
  FROM c)
SELECT nb AS n_buckets, x_tot, y_tot,
       round(1.0 - CAST(kk AS DOUBLE)
             / (CAST(x_tot AS DOUBLE) * CAST(y_tot AS DOUBLE)), 6)
         AS suits6
FROM k
"""


# ---------------------------------------------------------------------------
# DCCA
# ---------------------------------------------------------------------------

_DCCA_SIZES = [8, 16]


def _daily_rev_cnt(sf_dir: str) -> pd.DataFrame:
    """Per-day exact (revenue cents, order count), day-sorted."""
    ds = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // _US_PER_DAY)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"day": day, "c": c, "cnt": np.int64(1)}) \
            .groupby("day", sort=False).sum().reset_index()
        for col in ("c", "cnt"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(dpart, batch_format="pyarrow")
              .groupby("day").aggregate(Sum("c", alias_name="c"),
                                        Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("day").reset_index(drop=True))


def q_dcca_daily(sf_dir: str):
    """rho_DCCA at s=8,16 between revenue and order count."""
    cells = _daily_rev_cnt(sf_dir)
    xv = [int(c) // 100000 for c in cells["c"]]
    yv = [int(c) for c in cells["cnt"]]
    n = len(xv)

    def profile(v):
        s_all = sum(v)
        out = []
        run = 0
        for t, val in enumerate(v, start=1):
            run += val
            out.append(n * run - t * s_all)
        return out

    p = profile(xv)
    q = profile(yv)
    rho = {}
    for sz in _DCCA_SIZES:
        nw = n // sz
        sx = sz * (sz + 1) // 2
        sxx = sz * (sz + 1) * (2 * sz + 1) // 6
        cst = sz * sxx - sx * sx
        sxy6 = sxx6 = syy6 = 0
        for w in range(nw):
            ps = p[w * sz:(w + 1) * sz]
            qs = q[w * sz:(w + 1) * sz]
            sp, sq = sum(ps), sum(qs)
            spq = sum(a * b for a, b in zip(ps, qs))
            spp = sum(a * a for a in ps)
            sqq = sum(a * a for a in qs)
            sxp = sum((i + 1) * a for i, a in enumerate(ps))
            sxq = sum((i + 1) * a for i, a in enumerate(qs))
            den = float(sz * cst)
            rxy = ((sz * spq - sp * sq) * cst
                   - (sz * sxp - sx * sp) * (sz * sxq - sx * sq))
            rxx = ((sz * spp - sp * sp) * cst
                   - (sz * sxp - sx * sp) * (sz * sxp - sx * sp))
            ryy = ((sz * sqq - sq * sq) * cst
                   - (sz * sxq - sx * sq) * (sz * sxq - sx * sq))
            sxy6 += _rint(float(rxy) / den * 1000000.0)
            sxx6 += _rint(float(rxx) / den * 1000000.0)
            syy6 += _rint(float(ryy) / den * 1000000.0)
        fxy = float(sxy6) / 1000000.0 / float(nw * sz)
        fxx = float(sxx6) / 1000000.0 / float(nw * sz)
        fyy = float(syy6) / 1000000.0 / float(nw * sz)
        rho[sz] = fxy / (np.sqrt(fxx) * np.sqrt(fyy))
    out = pd.DataFrame({"n_days": [n],
                        "rho8_6": [_round6(np.array([rho[8]]))[0]],
                        "rho16_6": [_round6(np.array([rho[16]]))[0]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_DCCA = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100000 AS x,
         count(*)::BIGINT AS y
  FROM orders GROUP BY 1),
s AS (
  SELECT x, y, row_number() OVER (ORDER BY d) AS t FROM daily),
ns AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx_all,
              sum(y)::BIGINT AS sy_all
       FROM s),
pr AS (
  SELECT t,
         CAST(n AS HUGEINT) * (sum(x) OVER (ORDER BY t))
           - CAST(t AS HUGEINT) * sx_all AS p,
         CAST(n AS HUGEINT) * (sum(y) OVER (ORDER BY t))
           - CAST(t AS HUGEINT) * sy_all AS q
  FROM s CROSS JOIN ns),
ws AS (SELECT unnest([8, 16]) AS sz),
cells AS (
  SELECT ws.sz, (pr.t - 1) // ws.sz AS w,
         pr.t - ((pr.t - 1) // ws.sz) * ws.sz AS i, pr.p, pr.q
  FROM pr CROSS JOIN ws CROSS JOIN ns
  WHERE (pr.t - 1) // ws.sz < ns.n // ws.sz),
wagg AS (
  SELECT sz, w, sum(CAST(i AS HUGEINT)) AS sx,
         sum(CAST(i AS HUGEINT) * i) AS sxx,
         sum(p) AS sp, sum(q) AS sq,
         sum(p * q) AS spq, sum(p * p) AS spp, sum(q * q) AS sqq,
         sum(CAST(i AS HUGEINT) * p) AS sxp,
         sum(CAST(i AS HUGEINT) * q) AS sxq
  FROM cells GROUP BY 1, 2),
rw AS (
  SELECT sz,
         CAST(round(CAST((sz * spq - sp * sq) * (sz * sxx - sx * sx)
                         - (sz * sxp - sx * sp) * (sz * sxq - sx * sq)
                         AS DOUBLE)
                    / CAST(sz * (sz * sxx - sx * sx) AS DOUBLE)
                    * 1000000.0) AS HUGEINT) AS rxy6,
         CAST(round(CAST((sz * spp - sp * sp) * (sz * sxx - sx * sx)
                         - (sz * sxp - sx * sp) * (sz * sxp - sx * sp)
                         AS DOUBLE)
                    / CAST(sz * (sz * sxx - sx * sx) AS DOUBLE)
                    * 1000000.0) AS HUGEINT) AS rxx6,
         CAST(round(CAST((sz * sqq - sq * sq) * (sz * sxx - sx * sx)
                         - (sz * sxq - sx * sq) * (sz * sxq - sx * sq)
                         AS DOUBLE)
                    / CAST(sz * (sz * sxx - sx * sx) AS DOUBLE)
                    * 1000000.0) AS HUGEINT) AS ryy6
  FROM wagg),
fs AS (
  SELECT sz, sum(rxy6) AS sxy, sum(rxx6) AS sxx6, sum(ryy6) AS syy6,
         count(*)::BIGINT AS nw
  FROM rw GROUP BY 1),
fv AS (
  SELECT sz,
         (CAST(sxy AS DOUBLE) / 1000000.0 / CAST(nw * sz AS DOUBLE))
         / (sqrt(CAST(sxx6 AS DOUBLE) / 1000000.0
                 / CAST(nw * sz AS DOUBLE))
            * sqrt(CAST(syy6 AS DOUBLE) / 1000000.0
                   / CAST(nw * sz AS DOUBLE))) AS rho
  FROM fs)
SELECT (SELECT n FROM ns) AS n_days,
       round(max(CASE WHEN sz = 8 THEN rho END), 6) AS rho8_6,
       round(max(CASE WHEN sz = 16 THEN rho END), 6) AS rho16_6
FROM fv
"""


QUERIES129: dict[str, tuple] = {
    "getis_ord_docs": (q_getis_ord_docs, SQL_GETIS_ORD),
    "suits_index_tax": (q_suits_index_tax, SQL_SUITS),
    "dcca_daily": (q_dcca_daily, SQL_DCCA),
}
