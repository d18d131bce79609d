"""One-hundred-twenty-seventh oracle-query batch — ordinal agreement,
canonical correlation, and covariance shrinkage:

- weighted_kappa_priority: quadratic-weighted Cohen's kappa between
  consecutive order priorities per customer (ordinal ranks 1..5 from
  the priority's leading digit). kappa_w = 1 − N·Σw_ij·O_ij /
  Σw_ij·r_i·c_j is a PURE exact-integer ratio — one float division.
- cca_lineitem: first canonical correlation between (quantity,
  price-dollars) and (discount%, tax%). The n-cleared covariance
  blocks are exact integers; the 2×2 eigenproblem for
  A⁻¹·B·D⁻¹·Bᵗ finalizes through explicit scalar float formulas
  (adjugate products, trace/det, quadratic root) written identically
  on both sides — the pca_power_iteration device at degree 4.
- ledoit_wolf_lineitem: Ledoit-Wolf shrinkage intensity toward μI on
  the UNCENTERED 4×4 second-moment matrix of (qty, price-k$,
  disc%, tax%) — documented variant that keeps the 4th-moment term
  b̄² = (ΣQ_ij − n·Σs_ij²)/n² exact: Q_ij = Σ_k (x_ki·x_kj)² are
  exact integer sums; the 16-term Frobenius float chains are written
  in the same row-major left-associated order on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries26 import _PARTS
from scrapy_ray.pipelines.queries47 import _strip

_V4 = ["q", "p", "d", "t"]          # qty, price, discount, tax


# ---------------------------------------------------------------------------
# Quadratic-weighted kappa
# ---------------------------------------------------------------------------


def q_weighted_kappa_priority(sf_dir: str):
    """Quadratic-weighted kappa of consecutive priorities (docstring)."""
    ds = _pq(sf_dir, "orders",
             columns=["o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"])

    def ppart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cust": t["o_custkey"].to_numpy(zero_copy_only=False),
            "ok": t["o_orderkey"].to_numpy(zero_copy_only=False),
            "dt": t["o_orderdate"].cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "pr": np.asarray([int(s[0]) for s in
                              t["o_orderpriority"].to_pylist()],
                             np.int64)})
        df["gkey"] = (df["cust"] % _PARTS).astype(np.int32)
        return _strip(df)

    def pcount(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cust", "dt", "ok"], kind="mergesort")
        u = df["cust"].to_numpy()
        pr = df["pr"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        i, j = pr[:-1][same], pr[1:][same]
        g = pd.DataFrame({"i": i, "j": j, "c": np.int64(1)}) \
            .groupby(["i", "j"], sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    o = (ds.map_batches(ppart, batch_format="pyarrow")
           .groupby("gkey").map_groups(pcount, batch_format="pandas")
           .to_pandas()
           .groupby(["i", "j"]).sum().reset_index())
    nn = int(o["c"].sum())
    iv = o["i"].to_numpy(np.int64)
    jv = o["j"].to_numpy(np.int64)
    cv = o["c"].to_numpy(np.int64)
    swo = int((((iv - jv) ** 2) * cv).sum())
    r = {k: int(cv[iv == k].sum()) for k in range(1, 6)}
    c = {k: int(cv[jv == k].sum()) for k in range(1, 6)}
    swe = sum((a - b) ** 2 * r[a] * c[b]
              for a in range(1, 6) for b in range(1, 6))
    kappa = 1.0 - float(nn * swo) / float(swe)
    out = pd.DataFrame({"n_pairs": [nn], "swo": [swo], "swe": [swe],
                        "kappa6": [_round6(np.array([kappa]))[0]]})
    for col in ("n_pairs", "swo", "swe"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_WEIGHTED_KAPPA = """
WITH seq AS (
  SELECT CAST(o_orderpriority[1] AS BIGINT) AS i,
         lead(CAST(o_orderpriority[1] AS BIGINT))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS j
  FROM orders),
o AS (
  SELECT i, j, count(*)::BIGINT AS c FROM seq
  WHERE j IS NOT NULL GROUP BY 1, 2),
m AS (
  SELECT sum(c)::BIGINT AS nn,
         sum((i - j) * (i - j) * c)::BIGINT AS swo
  FROM o),
rm AS (SELECT i, sum(c)::BIGINT AS r FROM o GROUP BY 1),
cm AS (SELECT j, sum(c)::BIGINT AS cc FROM o GROUP BY 1),
e AS (
  SELECT sum((rm.i - cm.j) * (rm.i - cm.j)
             * CAST(rm.r AS HUGEINT) * cm.cc)::HUGEINT AS swe
  FROM rm CROSS JOIN cm)
SELECT nn AS n_pairs, swo, swe::BIGINT AS swe,
       round(1.0 - CAST(CAST(nn AS HUGEINT) * swo AS DOUBLE)
                   / CAST(swe AS DOUBLE), 6) AS kappa6
FROM m CROSS JOIN e
"""


# ---------------------------------------------------------------------------
# shared lineitem moment pass
# ---------------------------------------------------------------------------


def _li_vals(t: pa.Table, price_div: int) -> dict[str, np.ndarray]:
    q = t["l_quantity"].to_numpy(zero_copy_only=False)
    p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
    d = t["l_discount"].to_numpy(zero_copy_only=False)
    tx = t["l_tax"].to_numpy(zero_copy_only=False)
    return {
        "q": (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64),
        "p": ((np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5))
              .astype(np.int64) // price_div),
        "d": (np.sign(d) * np.floor(np.abs(d) * 100.0 + 0.5))
        .astype(np.int64),
        "t": (np.sign(tx) * np.floor(np.abs(tx) * 100.0 + 0.5))
        .astype(np.int64)}


def _li_moments(sf_dir: str, price_div: int, fourth: bool) -> dict:
    """Exact n, Σx_i, Σx_i·x_j (and optionally Σ(x_i·x_j)²)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_quantity", "l_extendedprice", "l_discount",
                      "l_tax"])
    pairs = [(a, b) for ai, a in enumerate(_V4)
             for b in _V4[ai:]]

    def mpart(t: pa.Table) -> pa.Table:
        v = _li_vals(t, price_div)
        cols = {"g": pa.array([0], pa.int64()),
                "n": pa.array([len(v["q"])], pa.int64())}
        for a in _V4:
            cols[f"s_{a}"] = pa.array([int(v[a].sum())], pa.int64())
        for a, b in pairs:
            ab = v[a] * v[b]
            cols[f"p_{a}{b}"] = pa.array([int(ab.sum())], pa.int64())
            if fourth:
                cols[f"q_{a}{b}"] = pa.array([int((ab * ab).sum())],
                                             pa.int64())
        return pa.table(cols)

    aggs = [Sum(c, alias_name=c)
            for c in (["n"] + [f"s_{a}" for a in _V4]
                      + [f"p_{a}{b}" for a, b in pairs]
                      + ([f"q_{a}{b}" for a, b in pairs]
                         if fourth else []))]
    agg = (ds.map_batches(mpart, batch_format="pyarrow")
             .groupby("g").aggregate(*aggs).to_pandas())
    return {c: int(agg[c].iloc[0]) for c in agg.columns if c != "g"}


_LI_MOMENT_SQL = """
  SELECT count(*)::BIGINT AS n,
         {cols}
  FROM (
    SELECT CAST(round(l_quantity) AS BIGINT) AS q,
           CAST(round(l_extendedprice * 100) AS BIGINT) // {pdiv} AS p,
           CAST(round(l_discount * 100) AS BIGINT) AS d,
           CAST(round(l_tax * 100) AS BIGINT) AS t
    FROM lineitem)
"""


def _li_moment_cols(fourth: bool) -> str:
    pairs = [(a, b) for ai, a in enumerate(_V4) for b in _V4[ai:]]
    cols = [f"sum({a})::BIGINT AS s_{a}" for a in _V4]
    for a, b in pairs:
        cols.append(f"sum(CAST({a} AS HUGEINT) * {b}) AS p_{a}{b}")
        if fourth:
            cols.append(f"sum(CAST({a} AS HUGEINT) * {b}"
                        f" * {a} * {b}) AS q_{a}{b}")
    return ",\n         ".join(cols)


# ---------------------------------------------------------------------------
# CCA
# ---------------------------------------------------------------------------


def q_cca_lineitem(sf_dir: str):
    """First canonical correlation (docstring above)."""
    m = _li_moments(sf_dir, price_div=100, fourth=False)
    n = m["n"]

    def cc(a: str, b: str) -> float:   # n-cleared covariance, exact int
        key = f"p_{a}{b}" if f"p_{a}{b}" in m else f"p_{b}{a}"
        return float(n * m[key] - m[f"s_{a}"] * m[f"s_{b}"])

    a11, a12, a22 = cc("q", "q"), cc("q", "p"), cc("p", "p")
    d11, d12, d22 = cc("d", "d"), cc("d", "t"), cc("t", "t")
    b11, b12 = cc("q", "d"), cc("q", "t")
    b21, b22 = cc("p", "d"), cc("p", "t")
    det_a = a11 * a22 - a12 * a12
    det_d = d11 * d22 - d12 * d12
    det_b = b11 * b22 - b12 * b21
    # E = adj(A)·B ; F = E·adj(D) ; G = F·Bᵗ
    e11 = a22 * b11 - a12 * b21
    e12 = a22 * b12 - a12 * b22
    e21 = a11 * b21 - a12 * b11
    e22 = a11 * b22 - a12 * b12
    f11 = e11 * d22 - e12 * d12
    f12 = e12 * d11 - e11 * d12
    f21 = e21 * d22 - e22 * d12
    f22 = e22 * d11 - e21 * d12
    g11 = f11 * b11 + f12 * b12
    g22 = f21 * b21 + f22 * b22
    tr = (g11 + g22) / (det_a * det_d)
    det_m = (det_b * det_b) / (det_a * det_d)
    lam = (tr + np.sqrt(tr * tr - 4.0 * det_m)) / 2.0
    rho = np.sqrt(lam)
    out = pd.DataFrame({"n_rows": [n],
                        "lambda6": [_round6(np.array([lam]))[0]],
                        "rho6": [_round6(np.array([rho]))[0]]})
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out


SQL_CCA = f"""
WITH s AS ({_LI_MOMENT_SQL.format(cols=_li_moment_cols(False),
                                  pdiv=100)}),
c AS (
  SELECT n,
    CAST(CAST(n AS HUGEINT) * p_qq - CAST(s_q AS HUGEINT) * s_q
         AS DOUBLE) AS a11,
    CAST(CAST(n AS HUGEINT) * p_qp - CAST(s_q AS HUGEINT) * s_p
         AS DOUBLE) AS a12,
    CAST(CAST(n AS HUGEINT) * p_pp - CAST(s_p AS HUGEINT) * s_p
         AS DOUBLE) AS a22,
    CAST(CAST(n AS HUGEINT) * p_dd - CAST(s_d AS HUGEINT) * s_d
         AS DOUBLE) AS d11,
    CAST(CAST(n AS HUGEINT) * p_dt - CAST(s_d AS HUGEINT) * s_t
         AS DOUBLE) AS d12,
    CAST(CAST(n AS HUGEINT) * p_tt - CAST(s_t AS HUGEINT) * s_t
         AS DOUBLE) AS d22,
    CAST(CAST(n AS HUGEINT) * p_qd - CAST(s_q AS HUGEINT) * s_d
         AS DOUBLE) AS b11,
    CAST(CAST(n AS HUGEINT) * p_qt - CAST(s_q AS HUGEINT) * s_t
         AS DOUBLE) AS b12,
    CAST(CAST(n AS HUGEINT) * p_pd - CAST(s_p AS HUGEINT) * s_d
         AS DOUBLE) AS b21,
    CAST(CAST(n AS HUGEINT) * p_pt - CAST(s_p AS HUGEINT) * s_t
         AS DOUBLE) AS b22
  FROM s),
e AS (
  SELECT n, b11, b12, b21, b22,
         a11 * a22 - a12 * a12 AS det_a,
         d11 * d22 - d12 * d12 AS det_d,
         b11 * b22 - b12 * b21 AS det_b,
         a22 * b11 - a12 * b21 AS e11,
         a22 * b12 - a12 * b22 AS e12,
         a11 * b21 - a12 * b11 AS e21,
         a11 * b22 - a12 * b12 AS e22,
         d11, d12, d22
  FROM c),
f AS (
  SELECT n, det_a, det_d, det_b, b11, b12, b21, b22,
         e11 * d22 - e12 * d12 AS f11,
         e12 * d11 - e11 * d12 AS f12,
         e21 * d22 - e22 * d12 AS f21,
         e22 * d11 - e21 * d12 AS f22
  FROM e),
g AS (
  SELECT n,
         ((f11 * b11 + f12 * b12) + (f21 * b21 + f22 * b22))
           / (det_a * det_d) AS tr,
         (det_b * det_b) / (det_a * det_d) AS det_m
  FROM f)
SELECT n AS n_rows,
       round((tr + sqrt(tr * tr - 4.0 * det_m)) / 2.0, 6) AS lambda6,
       round(sqrt((tr + sqrt(tr * tr - 4.0 * det_m)) / 2.0), 6) AS rho6
FROM g
"""


# ---------------------------------------------------------------------------
# Ledoit-Wolf shrinkage
# ---------------------------------------------------------------------------


def q_ledoit_wolf_lineitem(sf_dir: str):
    """LW shrinkage intensity on uncentered moments (docstring)."""
    m = _li_moments(sf_dir, price_div=100000, fourth=True)
    n = m["n"]
    nf = float(n)

    def sij(a: str, b: str) -> float:
        key = f"p_{a}{b}" if f"p_{a}{b}" in m else f"p_{b}{a}"
        return float(m[key]) / nf

    mu = (sij("q", "q") + sij("p", "p") + sij("d", "d")
          + sij("t", "t")) / 4.0
    d2 = 0.0
    ss = 0.0
    sq_tot = 0
    for a in _V4:
        for b in _V4:
            s = sij(a, b)
            dev = s - mu if a == b else s
            d2 = d2 + dev * dev
            ss = ss + s * s
            key = f"q_{a}{b}" if f"q_{a}{b}" in m else f"q_{b}{a}"
            sq_tot += m[key]
    bbar2 = (float(sq_tot) - nf * ss) / (nf * nf)
    b2 = min(bbar2, d2)
    delta = b2 / d2
    s11 = sij("q", "q")
    shrunk11 = (1.0 - delta) * s11 + delta * mu
    out = pd.DataFrame({
        "n_rows": [n], "mu6": [_round6(np.array([mu]))[0]],
        "d2_6": [_round6(np.array([d2]))[0]],
        "b2_6": [_round6(np.array([b2]))[0]],
        "delta6": [_round6(np.array([delta]))[0]],
        "shrunk_qq6": [_round6(np.array([shrunk11]))[0]]})
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out


def _lw_sql() -> str:
    def skey(a, b):
        return f"p_{a}{b}" if _V4.index(a) <= _V4.index(b) \
            else f"p_{b}{a}"

    def qkey(a, b):
        return f"q_{a}{b}" if _V4.index(a) <= _V4.index(b) \
            else f"q_{b}{a}"

    sdefs = [f"CAST({skey(a, b)} AS DOUBLE) / CAST(n AS DOUBLE)"
             f" AS s_{a}{b}" for ai, a in enumerate(_V4)
             for b in _V4[ai:]]
    mu = ("(s_qq + s_pp + s_dd + s_tt) / 4.0")
    d2_terms, ss_terms, sq_terms = [], [], []
    for a in _V4:
        for b in _V4:
            s = f"s_{skey(a, b)[2:]}"
            dev = f"({s} - mu)" if a == b else s
            d2_terms.append(f"{dev} * {dev}")
            ss_terms.append(f"{s} * {s}")
            sq_terms.append(qkey(a, b))
    return f"""
WITH s AS ({_LI_MOMENT_SQL.format(cols=_li_moment_cols(True),
                                  pdiv=100000)}),
sm AS (
  SELECT n, {", ".join(sdefs)}
  FROM s),
mm AS (SELECT *, {mu} AS mu FROM sm),
agg AS (
  SELECT n, mu, s_qq,
         {" + ".join(d2_terms)} AS d2,
         {" + ".join(ss_terms)} AS ss,
         CAST((SELECT {" + ".join(sq_terms)} FROM s) AS DOUBLE)
           AS sq_tot
  FROM mm),
f AS (
  SELECT n, mu, s_qq, d2,
         least((sq_tot - CAST(n AS DOUBLE) * ss)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), d2) AS b2
  FROM agg)
SELECT n AS n_rows, round(mu, 6) AS mu6, round(d2, 6) AS d2_6,
       round(b2, 6) AS b2_6, round(b2 / d2, 6) AS delta6,
       round((1.0 - b2 / d2) * s_qq + (b2 / d2) * mu, 6)
         AS shrunk_qq6
FROM f
"""


SQL_LEDOIT_WOLF = _lw_sql()


QUERIES127: dict[str, tuple] = {
    "weighted_kappa_priority": (q_weighted_kappa_priority,
                                SQL_WEIGHTED_KAPPA),
    "cca_lineitem": (q_cca_lineitem, SQL_CCA),
    "ledoit_wolf_lineitem": (q_ledoit_wolf_lineitem, SQL_LEDOIT_WOLF),
}
