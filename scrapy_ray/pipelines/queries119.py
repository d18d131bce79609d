"""One-hundred-nineteenth oracle-query batch — econometric estimators:

- panel_fe_value_hour: within (fixed-effects) estimator of event value
  cents on hour-of-day with user fixed effects. Per-user demeaned
  cross/sum-of-squares terms clear to exact-integer numerators
  (n*Sxy - Sx*Sy, n*Sx2 - Sx^2) over the per-user n, and are
  1e-6-quantized after the single /n before the cross-user exact sum.
- oaxaca_blinder_segments: two-fold Oaxaca-Blinder decomposition of
  the mean order-price gap between BUILDING and MACHINERY customers,
  explained by customer account balance: per-group OLS slopes from
  exact (HUGEINT-cleared) sums; explained = b_A (xbar_A - xbar_B),
  unexplained = gap - explained, all identical float expressions.
- price_elasticity_parts: log-log OLS of per-part total quantity on
  average unit price (elasticity): per-part exact (sum qty, sum
  cents), ln terms 1e-6-quantized per part before the OLS sums (the
  taylor_law device on the parts axis).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _qint(x: np.ndarray) -> np.ndarray:
    # mirrors SQL CAST(round(x * 1e6) AS BIGINT)
    return (np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5)).astype(np.int64)


# ---------------------------------------------------------------------------
# panel fixed effects
# ---------------------------------------------------------------------------


def q_panel_fe_value_hour(sf_dir: str):
    """Within estimator of value on hour, user FE (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "value"])

    def upart(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (((t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 1_000_000) % 86400) // 3600).astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False)
        y = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        df = pd.DataFrame({"u": u, "n": np.int64(1), "sx": h, "sy": y,
                           "sxy": h * y, "sx2": h * h})
        g = df.groupby("u", sort=False).sum().reset_index()
        for col in ("n", "sx", "sy", "sxy", "sx2"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    per = (ds.map_batches(upart, batch_format="pyarrow")
             .groupby("u").aggregate(Sum("n", alias_name="n"),
                                     Sum("sx", alias_name="sx"),
                                     Sum("sy", alias_name="sy"),
                                     Sum("sxy", alias_name="sxy"),
                                     Sum("sx2", alias_name="sx2"))
             .to_pandas())
    n = per["n"].to_numpy(np.int64)
    sx = per["sx"].to_numpy(np.int64)
    sy = per["sy"].to_numpy(np.int64)
    sxy = per["sxy"].to_numpy(np.int64)
    sx2 = per["sx2"].to_numpy(np.int64)
    num = (n * sxy - sx * sy).astype(np.float64) / n.astype(np.float64)
    den = (n * sx2 - sx * sx).astype(np.float64) / n.astype(np.float64)
    su = int(_qint(num).sum())
    sv = int(_qint(den).sum())
    slope = float(su) / float(sv)
    out = pd.DataFrame({"n_users": [len(per)], "n_obs": [int(n.sum())],
                        "su": [su], "sv": [sv],
                        "fe_slope6": [_round6(np.array([slope]))[0]]})
    for col in ("n_users", "n_obs", "su", "sv"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PANEL_FE = """
WITH e AS (
  SELECT user_id AS u,
         ((epoch_us(ts) // 1000000) % 86400) // 3600 AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events),
per AS (
  SELECT u, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
         sum(x * x)::BIGINT AS sx2
  FROM e GROUP BY 1),
q AS (
  SELECT n,
         CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n AS DOUBLE) * 1000000.0) AS BIGINT) AS uq,
         CAST(round(CAST(n * sx2 - sx * sx AS DOUBLE)
                    / CAST(n AS DOUBLE) * 1000000.0) AS BIGINT) AS vq
  FROM per),
s AS (
  SELECT count(*)::BIGINT AS n_users, sum(n)::BIGINT AS n_obs,
         sum(uq)::BIGINT AS su, sum(vq)::BIGINT AS sv
  FROM q)
SELECT n_users, n_obs, su, sv,
       round(CAST(su AS DOUBLE) / CAST(sv AS DOUBLE), 6) AS fe_slope6
FROM s
"""


# ---------------------------------------------------------------------------
# Oaxaca-Blinder
# ---------------------------------------------------------------------------


def q_oaxaca_blinder_segments(sf_dir: str):
    """Two-fold OB decomposition, BUILDING vs MACHINERY (docstring
    above)."""
    import os
    import pyarrow.parquet as pq_
    cust = pq_.read_table(os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey", "c_mktsegment",
                                   "c_acctbal"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    seg = np.asarray(cust["c_mktsegment"].to_pylist())
    bal = cust["c_acctbal"].to_numpy(zero_copy_only=False)
    balc = (np.sign(bal) * np.floor(np.abs(bal) * 100.0 + 0.5)) \
        .astype(np.int64)
    gmap = {int(k): (0 if s == "BUILDING" else 1, int(b))
            for k, s, b in zip(ck, seg, balc)
            if s in ("BUILDING", "MACHINERY")}

    ds = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def gpart(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        y = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        rows = {0: [0, 0, 0, 0, 0], 1: [0, 0, 0, 0, 0]}
        for kk, yy in zip(k, y):
            gx = gmap.get(int(kk))
            if gx is None:
                continue
            g, x = gx
            r = rows[g]
            r[0] += 1
            r[1] += x
            r[2] += int(yy)
            r[3] += x * int(yy)
            r[4] += x * x
        return pa.table({"g": pa.array([0, 1], pa.int64()),
                         "n": pa.array([rows[0][0], rows[1][0]],
                                       pa.int64()),
                         "sx": pa.array([rows[0][1], rows[1][1]],
                                        pa.int64()),
                         "sy": pa.array([rows[0][2], rows[1][2]],
                                        pa.int64()),
                         "sxy": pa.array([rows[0][3], rows[1][3]],
                                         pa.int64()),
                         "sx2": pa.array([rows[0][4], rows[1][4]],
                                         pa.int64())})

    agg = (ds.map_batches(gpart, batch_format="pyarrow")
             .groupby("g").aggregate(Sum("n", alias_name="n"),
                                     Sum("sx", alias_name="sx"),
                                     Sum("sy", alias_name="sy"),
                                     Sum("sxy", alias_name="sxy"),
                                     Sum("sx2", alias_name="sx2"))
             .to_pandas().sort_values("g").reset_index(drop=True))
    st = {int(r["g"]): tuple(int(r[c])
                             for c in ("n", "sx", "sy", "sxy", "sx2"))
          for _, r in agg.iterrows()}
    na, sxa, sya, sxya, sx2a = st[0]
    nb, sxb, syb, sxyb, sx2b = st[1]
    ba = (float(na * sxya - sxa * sya)
          / float(na * sx2a - sxa * sxa))
    gap = float(sya) / float(na) - float(syb) / float(nb)
    xa = float(sxa) / float(na)
    xb = float(sxb) / float(nb)
    explained = ba * (xa - xb)
    unexplained = gap - explained
    out = pd.DataFrame({
        "n_a": [na], "n_b": [nb],
        "gap6": [_round6(np.array([gap]))[0]],
        "explained6": [_round6(np.array([explained]))[0]],
        "unexplained6": [_round6(np.array([unexplained]))[0]]})
    for col in ("n_a", "n_b"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_OAXACA = """
WITH j AS (
  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END AS g,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS x,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
per AS (
  SELECT g, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
         sum(x * x)::BIGINT AS sx2
  FROM j GROUP BY 1),
a AS (SELECT * FROM per WHERE g = 0),
b AS (SELECT * FROM per WHERE g = 1),
f AS (
  SELECT a.n AS na, b.n AS nb,
         CAST(CAST(a.n AS HUGEINT) * CAST(a.sxy AS HUGEINT)
              - CAST(a.sx AS HUGEINT) * CAST(a.sy AS HUGEINT)
              AS DOUBLE)
         / CAST(CAST(a.n AS HUGEINT) * CAST(a.sx2 AS HUGEINT)
                - CAST(a.sx AS HUGEINT) * CAST(a.sx AS HUGEINT)
                AS DOUBLE) AS ba,
         CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE)
           - CAST(b.sy AS DOUBLE) / CAST(b.n AS DOUBLE) AS gap,
         CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE) AS xa,
         CAST(b.sx AS DOUBLE) / CAST(b.n AS DOUBLE) AS xb
  FROM a CROSS JOIN b)
SELECT na AS n_a, nb AS n_b, round(gap, 6) AS gap6,
       round(ba * (xa - xb), 6) AS explained6,
       round(gap - ba * (xa - xb), 6) AS unexplained6
FROM f
"""


# ---------------------------------------------------------------------------
# price elasticity across parts
# ---------------------------------------------------------------------------


def q_price_elasticity_parts(sf_dir: str):
    """Log-log quantity-on-price OLS across parts (docstring above)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def ppart(t: pa.Table) -> pa.Table:
        k = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        qv = (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64)
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        pc = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        df = pd.DataFrame({"k": k, "sq": qv, "sp": pc})
        g = df.groupby("k", sort=False).sum().reset_index()
        for col in ("sq", "sp"):
            g[col] = g[col].astype(np.int64)
        # ~20k part groups: the salted-partition rule (cohort_ltv lesson)
        # — a direct groupby("k") Aggregate measured 7.3 s vs ~1 s salted
        g["gkey"] = (g["k"] % 64).astype(np.int32)
        return _strip(g)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # exact per-part sums, then this partition's quantized ln-term
        # partial OLS sums (parts are disjoint across partitions, so the
        # per-part ln quantization happens exactly once per part)
        g = df.groupby("k", sort=False)[["sq", "sp"]].sum()
        sq = g["sq"].to_numpy(np.int64)
        sp = g["sp"].to_numpy(np.int64)
        x = np.log(sp.astype(np.float64) / sq.astype(np.float64))
        y = np.log(sq.astype(np.float64))
        return pd.DataFrame({
            "np": [np.int64(len(sq))],
            "sxq": [np.int64(_qint(x).sum())],
            "syq": [np.int64(_qint(y).sum())],
            "sxyq": [np.int64(_qint(x * y).sum())],
            "sx2q": [np.int64(_qint(x * x).sum())]})

    s = (ds.map_batches(ppart, batch_format="pyarrow")
           .groupby("gkey").map_groups(finish, batch_format="pandas")
           .to_pandas())
    n = int(s["np"].sum())
    sx = float(int(s["sxq"].sum())) / 1000000.0
    sy = float(int(s["syq"].sum())) / 1000000.0
    sxy = float(int(s["sxyq"].sum())) / 1000000.0
    sx2 = float(int(s["sx2q"].sum())) / 1000000.0
    nf = float(n)
    det = nf * sx2 - sx * sx
    slope = (nf * sxy - sx * sy) / det
    icpt = (sy * sx2 - sx * sxy) / det
    out = pd.DataFrame({"n_parts": [n],
                        "sxq": [int(s["sxq"].sum())],
                        "syq": [int(s["syq"].sum())],
                        "elasticity6": [_round6(np.array([slope]))[0]],
                        "intercept6": [_round6(np.array([icpt]))[0]]})
    for col in ("n_parts", "sxq", "syq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ELASTICITY = """
WITH per AS (
  SELECT l_partkey,
         sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sq,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
           AS sp
  FROM lineitem GROUP BY 1),
q AS (
  SELECT CAST(round(ln(CAST(sp AS DOUBLE) / CAST(sq AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS xq,
         CAST(round(ln(CAST(sq AS DOUBLE)) * 1000000.0) AS BIGINT)
           AS yq,
         CAST(round(ln(CAST(sp AS DOUBLE) / CAST(sq AS DOUBLE))
                    * ln(CAST(sq AS DOUBLE)) * 1000000.0) AS BIGINT)
           AS xyq,
         CAST(round(ln(CAST(sp AS DOUBLE) / CAST(sq AS DOUBLE))
                    * ln(CAST(sp AS DOUBLE) / CAST(sq AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS x2q
  FROM per),
s AS (
  SELECT count(*)::BIGINT AS n, sum(xq)::BIGINT AS sxq,
         sum(yq)::BIGINT AS syq, sum(xyq)::BIGINT AS sxyq,
         sum(x2q)::BIGINT AS sx2q
  FROM q),
f AS (
  SELECT n, sxq, syq,
         CAST(sxq AS DOUBLE) / 1000000.0 AS sx,
         CAST(syq AS DOUBLE) / 1000000.0 AS sy,
         CAST(sxyq AS DOUBLE) / 1000000.0 AS sxy,
         CAST(sx2q AS DOUBLE) / 1000000.0 AS sx2
  FROM s)
SELECT n AS n_parts, sxq, syq,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sx2 - sx * sx), 6)
         AS elasticity6,
       round((sy * sx2 - sx * sxy)
             / (CAST(n AS DOUBLE) * sx2 - sx * sx), 6) AS intercept6
FROM f
"""


QUERIES119: dict[str, tuple] = {
    "panel_fe_value_hour": (q_panel_fe_value_hour, SQL_PANEL_FE),
    "oaxaca_blinder_segments": (q_oaxaca_blinder_segments, SQL_OAXACA),
    "price_elasticity_parts": (q_price_elasticity_parts,
                               SQL_ELASTICITY),
}
