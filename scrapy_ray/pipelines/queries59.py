"""Fifty-ninth oracle-query batch — nonlinear dependence / cointegration /
partial autocorrelation:

- distance_corr_qty_discount: Székely's distance correlation between
  l_quantity and l_discount, EXACT on the bounded (quantity, discount-pct)
  cell matrix (~550 cells).  Uses the factored identity
  dCov² = S1 − 2·S2 + S3: the double sum Σ c_p c_q |Δx||Δy| stays int64
  (values ≤ 49·10 per pair), the per-cell row sums S_a(p) = Σ_q c_q|Δx|
  and totals T_a are exact, and the n⁶-scaled numerators
  N = n⁴·ab − 2n³·Σ_p c_p S_a(p) S_b(p) + n²·T_a·T_b combine as Python
  ints (HUGEINT in SQL — N_xx ≈ 5e36 at sf0.1, inside HUGEINT; sf1
  would overflow, documented bound).  N's emitted as decimal strings
  (cov_matrix discipline); dCor = sqrt(N_xy/sqrt(N_xx·N_yy)) one
  identical float expression.
- engle_granger_rev_orders: Engle–Granger cointegration test between
  daily kilodollar revenue (y) and daily order count (x), days-present
  series.  Stage 1 OLS y = α + βx from exact integer moments (β, α
  identical float expressions); residuals quantized to 1e-6 units via
  the SAME float expression + round-half-away on both sides
  (ru = round(1e6·(y − (α + β·x))), the _cents rounding precedent).
  Stage 2 runs the Dickey–Fuller regression on the exact integer ru
  series — five moments ride Python int / HUGEINT, ρ̂ and the EG tau
  statistic finalize identical-expression (queries58 DF machinery).
- pacf_daily_revenue: partial autocorrelation of daily kilodollar
  revenue at lags 1..5 via the Durbin–Levinson recursion.  The lag
  autocovariance numerators g_0..g_5 are exact integers off the
  d_t = n·y_t − S centering (ljung_box machinery); r_k = g_k/g_0 and
  the unrolled DL recursion are replayed with TEXTUALLY identical,
  fully-parenthesized float expressions in the SQL CTE chain (holt /
  huber replay discipline), so φ11..φ55 match bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# distance correlation
# ---------------------------------------------------------------------------


def q_distance_corr_qty_discount(sf_dir: str):
    """Exact distance correlation from the (quantity, discount-pct) cell
    matrix (docstring above)."""
    ds = _pq(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def cpart(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = t["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64) * 100.0
        xi = np.floor(q + 0.5).astype(np.int64)
        yi = np.floor(d + 0.5).astype(np.int64)
        df = pd.DataFrame({"x": xi, "y": yi, "n": np.int64(1)})
        g = df.groupby(["x", "y"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["x", "y"]).aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    x = cells["x"].to_numpy(np.int64)
    y = cells["y"].to_numpy(np.int64)
    cn = cells["n"].to_numpy(np.int64)
    n = int(cn.sum())
    # per-cell marginal row sums S_a(p) = sum_q c_q |x_p - x_q| (int64:
    # <= n * 49) and same for y; pairwise |d| matrices are ~550x550
    ax = np.abs(x[:, None] - x[None, :])
    ay = np.abs(y[:, None] - y[None, :])
    sa = (ax * cn[None, :]).sum(axis=1)          # S_a per cell
    sb = (ay * cn[None, :]).sum(axis=1)
    ta = int((cn * sa).sum())
    tb = int((cn * sb).sum())
    pair_n = cn[:, None] * cn[None, :]
    ab = int((pair_n * ax * ay).sum())           # <= ~1e15 at sf0.1
    aa = int((pair_n * ax * ax).sum())
    bb = int((pair_n * ay * ay).sum())
    # cross terms sum_p c_p S_a(p) S_b(p) exceed int64 -> Python ints
    sab = sum(int(c) * int(u) * int(v) for c, u, v in zip(cn, sa, sb))
    saa = sum(int(c) * int(u) * int(u) for c, u in zip(cn, sa))
    sbb = sum(int(c) * int(v) * int(v) for c, v in zip(cn, sb))
    nxy = n**4 * ab - 2 * n**3 * sab + n**2 * ta * tb
    nxx = n**4 * aa - 2 * n**3 * saa + n**2 * ta * ta
    nyy = n**4 * bb - 2 * n**3 * sbb + n**2 * tb * tb
    dcor = math.sqrt(float(nxy) / math.sqrt(float(nxx) * float(nyy)))
    out = pd.DataFrame({"n": [n], "nxy": [str(nxy)], "nxx": [str(nxx)],
                        "nyy": [str(nyy)],
                        "dcor6": [_round6(np.array([dcor]))[0]]})
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_DCOR = """
WITH e AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y
  FROM lineitem),
cells AS (SELECT x, y, count(*)::HUGEINT AS n FROM e GROUP BY 1, 2),
tot AS (SELECT sum(n) AS n FROM cells),
sax AS (
  SELECT u.x AS x, sum(c.n * abs(u.x - c.x)) AS s
  FROM (SELECT DISTINCT x FROM cells) u, cells c GROUP BY 1),
say AS (
  SELECT u.y AS y, sum(c.n * abs(u.y - c.y)) AS s
  FROM (SELECT DISTINCT y FROM cells) u, cells c GROUP BY 1),
m AS (
  SELECT sum(c.n * sx.s) AS ta, sum(c.n * sy.s) AS tb,
         sum(c.n * sx.s * sy.s) AS sab,
         sum(c.n * sx.s * sx.s) AS saa,
         sum(c.n * sy.s * sy.s) AS sbb
  FROM cells c JOIN sax sx ON c.x = sx.x JOIN say sy ON c.y = sy.y),
dbl AS (
  SELECT sum(p.n * q.n * abs(p.x - q.x) * abs(p.y - q.y)) AS ab,
         sum(p.n * q.n * abs(p.x - q.x) * abs(p.x - q.x)) AS aa,
         sum(p.n * q.n * abs(p.y - q.y) * abs(p.y - q.y)) AS bb
  FROM cells p, cells q),
nn AS (
  SELECT tot.n AS n,
         tot.n * tot.n * tot.n * tot.n * ab
           - 2 * tot.n * tot.n * tot.n * sab + tot.n * tot.n * ta * tb
           AS nxy,
         tot.n * tot.n * tot.n * tot.n * aa
           - 2 * tot.n * tot.n * tot.n * saa + tot.n * tot.n * ta * ta
           AS nxx,
         tot.n * tot.n * tot.n * tot.n * bb
           - 2 * tot.n * tot.n * tot.n * sbb + tot.n * tot.n * tb * tb
           AS nyy
  FROM tot, m, dbl)
SELECT CAST(n AS BIGINT) AS n, CAST(nxy AS VARCHAR) AS nxy,
       CAST(nxx AS VARCHAR) AS nxx, CAST(nyy AS VARCHAR) AS nyy,
       round(sqrt(CAST(nxy AS DOUBLE)
                  / sqrt(CAST(nxx AS DOUBLE) * CAST(nyy AS DOUBLE))), 6)
         AS dcor6
FROM nn
"""


# ---------------------------------------------------------------------------
# Engle-Granger cointegration
# ---------------------------------------------------------------------------


def _daily_kd_n(sf_dir: str) -> tuple[list[int], list[int]]:
    """Per-day (kilodollar revenue, order count), sorted by day."""
    ds = _pq(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["o_orderdate"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // _US_PER_DAY)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c = (np.sign(p * 100.0)
             * np.floor(np.abs(p * 100.0) + 0.5)).astype(np.int64)
        df = pd.DataFrame({"day": day, "c": c, "n": np.int64(1)})
        g = df.groupby("day", sort=False).sum().reset_index()
        for col in ("c", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby("day")
               .aggregate(Sum("c", alias_name="c"),
                          Sum("n", alias_name="n"))
               .to_pandas().sort_values("day").reset_index(drop=True))
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    yv = np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)
    return [int(v) for v in yv], [int(v) for v in cells["n"]]


def q_engle_granger_rev_orders(sf_dir: str):
    """Engle-Granger two-step cointegration test, daily revenue vs daily
    order count (docstring above)."""
    y, x = _daily_kd_n(sf_dir)
    m = len(y)
    sx = sum(x)
    sy = sum(y)
    sxx = sum(v * v for v in x)
    sxy = sum(a * b for a, b in zip(x, y))
    bnum = m * sxy - sx * sy
    bden = m * sxx - sx * sx
    beta = float(bnum) / float(bden)
    alpha = (float(sy) - beta * float(sx)) / float(m)
    # residuals in exact 1e-6 units (identical float expr + round both
    # sides); DF regression on the ru series
    ru = []
    for xv, yv in zip(x, y):
        v = (float(yv) - (alpha + beta * float(xv))) * 1000000.0
        ru.append(int(math.copysign(math.floor(abs(v) + 0.5), v)))
    rx = ru[:-1]
    rd = [b - a for a, b in zip(ru[:-1], ru[1:])]
    k = len(rx)
    s1 = sum(rx)
    s2 = sum(rd)
    s11 = sum(v * v for v in rx)
    s12 = sum(a * b for a, b in zip(rx, rd))
    s22 = sum(v * v for v in rd)
    num = k * s12 - s1 * s2
    den = k * s11 - s1 * s1
    a2 = k * s22 - s2 * s2
    rho = float(num) / float(den)
    sse = (float(a2) - float(num) * float(num) / float(den)) / float(k)
    tau = rho / math.sqrt((sse / float(k - 2)) * float(k) / float(den))
    r6 = _round6(np.array([beta, alpha, rho, tau]))
    out = pd.DataFrame({"m": [m], "beta6": [r6[0]], "alpha6": [r6[1]],
                        "rho6": [r6[2]], "eg_tau6": [r6[3]]})
    out["m"] = out["m"].astype(np.int64)
    return out


SQL_ENGLE_GRANGER = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c,
         count(*)::BIGINT AS x
  FROM orders GROUP BY 1),
d0 AS (
  SELECT CAST(round(c / 100000.0) AS BIGINT) AS y, x, day FROM dc),
s AS (
  SELECT count(*)::HUGEINT AS m, sum(x)::HUGEINT AS sx,
         sum(y)::HUGEINT AS sy, sum(x * x)::HUGEINT AS sxx,
         sum(x * y)::HUGEINT AS sxy
  FROM d0),
ols AS (
  SELECT m, CAST(m * sxy - sx * sy AS DOUBLE)
            / CAST(m * sxx - sx * sx AS DOUBLE) AS beta, sx, sy
  FROM s),
ab AS (
  SELECT m, beta,
         (CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
           / CAST(m AS DOUBLE) AS alpha
  FROM ols),
res AS (
  SELECT day,
         CAST(round((CAST(y AS DOUBLE)
                     - (alpha + beta * CAST(x AS DOUBLE)))
                    * 1000000.0) AS BIGINT) AS ru
  FROM d0, ab),
pr AS (
  SELECT ru::HUGEINT AS rx,
         (lead(ru) OVER (ORDER BY day) - ru)::HUGEINT AS rd
  FROM res QUALIFY lead(ru) OVER (ORDER BY day) IS NOT NULL),
t AS (
  SELECT count(*)::HUGEINT AS k, sum(rx) AS s1, sum(rd) AS s2,
         sum(rx * rx) AS s11, sum(rx * rd) AS s12, sum(rd * rd) AS s22
  FROM pr),
f AS (
  SELECT k, (k * s12 - s1 * s2) AS num, (k * s11 - s1 * s1) AS den,
         (k * s22 - s2 * s2) AS a2
  FROM t),
g AS (
  SELECT k, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS rho, den,
         (CAST(a2 AS DOUBLE)
          - CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
            / CAST(den AS DOUBLE)) / CAST(k AS DOUBLE) AS sse
  FROM f)
SELECT ab.m::BIGINT AS m, round(ab.beta, 6) AS beta6,
       round(ab.alpha, 6) AS alpha6, round(g.rho, 6) AS rho6,
       round(g.rho / sqrt((g.sse / CAST(g.k - 2 AS DOUBLE))
                          * CAST(g.k AS DOUBLE)
                          / CAST(g.den AS DOUBLE)), 6) AS eg_tau6
FROM ab, g
"""


# ---------------------------------------------------------------------------
# PACF via Durbin-Levinson
# ---------------------------------------------------------------------------


def q_pacf_daily_revenue(sf_dir: str):
    """PACF lags 1..5 of daily kilodollar revenue via the Durbin-Levinson
    recursion on exact autocovariance integers (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    yv = np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)
    y = [int(v) for v in yv]
    n = len(y)
    s = sum(y)
    d = [n * v - s for v in y]
    g0 = sum(v * v for v in d)
    g = [sum(d[t] * d[t - k] for t in range(k, n)) for k in range(1, 6)]
    r1, r2, r3, r4, r5 = (float(v) / float(g0) for v in g)
    # Durbin-Levinson, fully parenthesized — mirrored textually in SQL
    p11 = r1
    p22 = (r2 - p11 * r1) / (1.0 - p11 * r1)
    p21 = p11 - p22 * p11
    p33 = (r3 - (p21 * r2 + p22 * r1)) / (1.0 - (p21 * r1 + p22 * r2))
    p31 = p21 - p33 * p22
    p32 = p22 - p33 * p21
    p44 = ((r4 - ((p31 * r3 + p32 * r2) + p33 * r1))
           / (1.0 - ((p31 * r1 + p32 * r2) + p33 * r3)))
    p41 = p31 - p44 * p33
    p42 = p32 - p44 * p32
    p43 = p33 - p44 * p31
    p55 = ((r5 - (((p41 * r4 + p42 * r3) + p43 * r2) + p44 * r1))
           / (1.0 - (((p41 * r1 + p42 * r2) + p43 * r3) + p44 * r4)))
    r6 = _round6(np.array([p11, p22, p33, p44, p55]))
    out = pd.DataFrame({"n_days": [n], "pacf1_6": [r6[0]],
                        "pacf2_6": [r6[1]], "pacf3_6": [r6[2]],
                        "pacf4_6": [r6[3]], "pacf5_6": [r6[4]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_PACF = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d0 AS (
  SELECT CAST(round(c / 100000.0) AS BIGINT) AS y,
         row_number() OVER (ORDER BY day) AS i
  FROM dc),
st AS (SELECT count(*)::HUGEINT AS n, sum(y)::HUGEINT AS s FROM d0),
dd AS (SELECT i, (st.n * y - st.s) AS d FROM d0, st),
lg AS (
  SELECT d, lag(d, 1) OVER (ORDER BY i) AS d1,
         lag(d, 2) OVER (ORDER BY i) AS d2,
         lag(d, 3) OVER (ORDER BY i) AS d3,
         lag(d, 4) OVER (ORDER BY i) AS d4,
         lag(d, 5) OVER (ORDER BY i) AS d5
  FROM dd),
gg AS (
  SELECT sum(d * d) AS g0, sum(d * d1) AS g1, sum(d * d2) AS g2,
         sum(d * d3) AS g3, sum(d * d4) AS g4, sum(d * d5) AS g5
  FROM lg),
rr AS (
  SELECT CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r1,
         CAST(g2 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r2,
         CAST(g3 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r3,
         CAST(g4 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r4,
         CAST(g5 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r5
  FROM gg),
l1 AS (SELECT *, r1 AS p11 FROM rr),
l2 AS (
  SELECT *, (r2 - p11 * r1) / (1.0 - p11 * r1) AS p22 FROM l1),
l2b AS (SELECT *, p11 - p22 * p11 AS p21 FROM l2),
l3 AS (
  SELECT *, (r3 - (p21 * r2 + p22 * r1))
            / (1.0 - (p21 * r1 + p22 * r2)) AS p33
  FROM l2b),
l3b AS (
  SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32 FROM l3),
l4 AS (
  SELECT *, (r4 - ((p31 * r3 + p32 * r2) + p33 * r1))
            / (1.0 - ((p31 * r1 + p32 * r2) + p33 * r3)) AS p44
  FROM l3b),
l4b AS (
  SELECT *, p31 - p44 * p33 AS p41, p32 - p44 * p32 AS p42,
         p33 - p44 * p31 AS p43
  FROM l4),
l5 AS (
  SELECT *, (r5 - (((p41 * r4 + p42 * r3) + p43 * r2) + p44 * r1))
            / (1.0 - (((p41 * r1 + p42 * r2) + p43 * r3) + p44 * r4))
            AS p55
  FROM l4b)
SELECT st.n::BIGINT AS n_days, round(p11, 6) AS pacf1_6,
       round(p22, 6) AS pacf2_6, round(p33, 6) AS pacf3_6,
       round(p44, 6) AS pacf4_6, round(p55, 6) AS pacf5_6
FROM l5, st
"""


QUERIES59: dict[str, tuple] = {
    "distance_corr_qty_discount": (q_distance_corr_qty_discount, SQL_DCOR),
    "engle_granger_rev_orders": (q_engle_granger_rev_orders,
                                 SQL_ENGLE_GRANGER),
    "pacf_daily_revenue": (q_pacf_daily_revenue, SQL_PACF),
}
