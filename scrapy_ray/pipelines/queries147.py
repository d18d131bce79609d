"""One-hundred-forty-seventh oracle-query batch — GLM fitting, local
regression, and multiple-testing control:

- poisson_regression_hour: Poisson GLM of hourly purchase counts on
  the hour index, fit with 6 IRLS/Newton steps replayed identically
  (short chained CTEs — the logreg device). Every per-hour
  contribution (μ, μh, μh², y−μ, (y−μ)h, and the deviance terms) is
  quantized to 1e-9 BEFORE the 24-cell sums, so iteration state stays
  deterministic; the 2×2 solve is explicit adjugate float algebra.
- lowess_daily: one-pass LOWESS (tricube weights, q = 12 nearest by
  |Δday| with the q-th-smallest distance as bandwidth — ties include
  all points at distance h, where the tricube weight is 0 anyway) on
  daily event dollars, reporting the fitted values at days 5/15/25.
  Per-(target, neighbor) quantized r9(w) and r9(w·y) make the five
  weighted-OLS sums exact integers.
- bh_fdr_daily_clicks: Benjamini-Hochberg at q = 0.10 over the 30
  per-day one-sided z-tests of click share vs the global rate. The
  normal CDF is the Abramowitz-Stegun 26.2.17 polynomial written
  IDENTICALLY on both sides (DuckDB has no erf), p-values quantized
  to 1e-9, and the BH step-up comparison p9·m·10 ≤ k·1e9 is pure
  integer.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _r9(v: float) -> int:
    return int(math.floor(abs(v) * 1e9 + 0.5)) * (1 if v >= 0 else -1)


def _hourly_counts(sf_dir: str, etype: str) -> np.ndarray:
    ds = _pq(sf_dir, "events", columns=["event_type", "ts"])

    def hpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = np.asarray(t["event_type"].to_pylist())
        m = et == etype
        hr = pc.hour(t["ts"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)[m]
        g = pd.DataFrame({"h": hr, "n": np.int64(1)}) \
            .groupby("h", sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(hpart, batch_format="pyarrow")
             .groupby("h").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    y = np.zeros(24, np.int64)
    y[agg["h"].to_numpy(np.int64)] = agg["n"].to_numpy(np.int64)
    return y


# ---------------------------------------------------------------------------
# Poisson regression
# ---------------------------------------------------------------------------

_PR_ITERS = 6


def q_poisson_regression_hour(sf_dir: str):
    """Poisson GLM purchase-counts ~ hour via IRLS (docstring)."""
    y = _hourly_counts(sf_dir, "purchase")
    tot = int(y.sum())
    b0 = math.log(float(tot) / 24.0)
    b1 = 0.0
    for _ in range(_PR_ITERS):
        s0 = s1 = s2 = g0 = g1 = 0
        for h in range(24):
            mu = math.exp(b0 + b1 * float(h))
            s0 += _r9(mu)
            s1 += _r9(mu) * h
            s2 += _r9(mu) * h * h
            g0 += _r9(float(int(y[h])) - mu)
            g1 += _r9(float(int(y[h])) - mu) * h
        f0, f1, f2 = (float(s0) / 1e9, float(s1) / 1e9,
                      float(s2) / 1e9)
        e0, e1 = float(g0) / 1e9, float(g1) / 1e9
        det = f0 * f2 - f1 * f1
        b0 = b0 + (e0 * f2 - e1 * f1) / det
        b1 = b1 + (f0 * e1 - f1 * e0) / det
    dev_u = 0
    for h in range(24):
        mu = math.exp(b0 + b1 * float(h))
        yv = float(int(y[h]))
        term = (yv * math.log(yv / mu) if yv > 0 else 0.0) \
            - (yv - mu)
        dev_u += _r9(2.0 * term)
    r6 = _round6(np.array([b0, b1, float(dev_u) / 1e9]))
    out = pd.DataFrame({"n": [tot], "b0_6": [r6[0]], "b1_6": [r6[1]],
                        "deviance6": [r6[2]]})
    out["n"] = out["n"].astype(np.int64)
    return out


def _pr_iter_sql(i: int) -> str:
    prev = f"it{i - 1}" if i > 1 else "init"
    return f"""
c{i} AS (
  SELECT
    sum(CAST(round(exp(p.b0 + p.b1 * h.h) * 1e9) AS BIGINT))
      ::BIGINT AS s0,
    sum(CAST(round(exp(p.b0 + p.b1 * h.h) * 1e9) AS BIGINT) * h.h)
      ::BIGINT AS s1,
    sum(CAST(round(exp(p.b0 + p.b1 * h.h) * 1e9) AS BIGINT)
        * h.h * h.h)::BIGINT AS s2,
    sum(CAST(round((h.y - exp(p.b0 + p.b1 * h.h)) * 1e9) AS BIGINT))
      ::BIGINT AS g0,
    sum(CAST(round((h.y - exp(p.b0 + p.b1 * h.h)) * 1e9) AS BIGINT)
        * h.h)::BIGINT AS g1
  FROM hourly h CROSS JOIN {prev} p),
it{i} AS (
  SELECT p.b0 + ((CAST(c.g0 AS DOUBLE) / 1e9)
                 * (CAST(c.s2 AS DOUBLE) / 1e9)
                 - (CAST(c.g1 AS DOUBLE) / 1e9)
                   * (CAST(c.s1 AS DOUBLE) / 1e9))
               / ((CAST(c.s0 AS DOUBLE) / 1e9)
                  * (CAST(c.s2 AS DOUBLE) / 1e9)
                  - (CAST(c.s1 AS DOUBLE) / 1e9)
                    * (CAST(c.s1 AS DOUBLE) / 1e9)) AS b0,
         p.b1 + ((CAST(c.s0 AS DOUBLE) / 1e9)
                 * (CAST(c.g1 AS DOUBLE) / 1e9)
                 - (CAST(c.s1 AS DOUBLE) / 1e9)
                   * (CAST(c.g0 AS DOUBLE) / 1e9))
               / ((CAST(c.s0 AS DOUBLE) / 1e9)
                  * (CAST(c.s2 AS DOUBLE) / 1e9)
                  - (CAST(c.s1 AS DOUBLE) / 1e9)
                    * (CAST(c.s1 AS DOUBLE) / 1e9)) AS b1
  FROM {prev} p CROSS JOIN c{i} c)"""


SQL_POISSON_REG = ("""
WITH hr AS (
  SELECT extract(hour FROM ts)::BIGINT AS h, count(*)::BIGINT AS y
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
hourly AS (
  SELECT g.h, CAST(coalesce(hr.y, 0) AS DOUBLE) AS y
  FROM (SELECT unnest(range(0, 24)) AS h) g
  LEFT JOIN hr USING (h)),
init AS (
  SELECT ln((SELECT sum(y) FROM hourly) / 24.0) AS b0, 0.0 AS b1),"""
    + ",".join(_pr_iter_sql(i) for i in range(1, _PR_ITERS + 1))
    + f""",
dev AS (
  SELECT sum(CAST(round(2.0 * (CASE WHEN h.y > 0
               THEN h.y * ln(h.y / exp(p.b0 + p.b1 * h.h))
               ELSE 0.0 END
               - (h.y - exp(p.b0 + p.b1 * h.h))) * 1e9) AS BIGINT))
           ::BIGINT AS d
  FROM hourly h CROSS JOIN it{_PR_ITERS} p)
SELECT (SELECT sum(y) FROM hourly)::BIGINT AS n,
       round(p.b0, 6) AS b0_6, round(p.b1, 6) AS b1_6,
       round(CAST(dev.d AS DOUBLE) / 1e9, 6) AS deviance6
FROM it{_PR_ITERS} p CROSS JOIN dev
""")


# ---------------------------------------------------------------------------
# LOWESS
# ---------------------------------------------------------------------------

_LW_Q = 12
_LW_PROBES = (5, 15, 25)


def q_lowess_daily(sf_dir: str):
    """Tricube LOWESS fits at probe days (docstring above)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    cents = _daily_cents(sf_dir)
    yv = [int(v) // 100 for v in cents.tolist()]
    n = len(yv)
    rows = []
    for t in _LW_PROBES:
        d = sorted((abs(t - j), j) for j in range(1, n + 1))
        h = d[_LW_Q - 1][0]
        sw = swx = swx2 = swy = swxy = 0
        for j in range(1, n + 1):
            dj = abs(t - j)
            if dj > h:
                continue
            u = float(dj) / float(h)
            w = (1.0 - u * u * u) ** 3
            w9 = _r9(w)
            wy9 = _r9(w * float(yv[j - 1]))
            sw += w9
            swx += w9 * j
            swx2 += w9 * j * j
            swy += wy9
            swxy += wy9 * j
        fw, fx, fx2 = float(sw), float(swx), float(swx2)
        fy, fxy = float(swy), float(swxy)
        det = fw * fx2 - fx * fx
        a = (fy * fx2 - fx * fxy) / det
        b = (fw * fxy - fx * fy) / det
        rows.append((t, h, _round6(np.array([a + b * float(t)]))[0]))
    out = pd.DataFrame(rows, columns=["day", "bandwidth", "fit6"])
    for col in ("day", "bandwidth"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LOWESS = f"""
WITH dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT)) // 100 AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS j, y FROM dd),
probes AS (SELECT unnest([{", ".join(str(p) for p in _LW_PROBES)}])
             AS t),
bw AS (
  -- the q-th smallest |Δday| (a nested count(*) inside quantile_disc
  -- is rejected, so rank with row_number instead)
  SELECT t, d AS h FROM (
    SELECT p.t, abs(p.t - s.j) AS d,
           row_number() OVER (PARTITION BY p.t
                              ORDER BY abs(p.t - s.j), s.j) AS rn
    FROM probes p CROSS JOIN seq s)
  WHERE rn = {_LW_Q}),
cells AS (
  SELECT bw.t, bw.h, s.j, s.y,
         CAST(round(power(1.0 - power(CAST(abs(bw.t - s.j) AS DOUBLE)
                                      / CAST(bw.h AS DOUBLE), 3), 3)
                    * 1e9) AS BIGINT) AS w9,
         CAST(round(power(1.0 - power(CAST(abs(bw.t - s.j) AS DOUBLE)
                                      / CAST(bw.h AS DOUBLE), 3), 3)
                    * CAST(s.y AS DOUBLE) * 1e9) AS BIGINT) AS wy9
  FROM bw JOIN seq s ON abs(bw.t - s.j) <= bw.h),
sums AS (
  SELECT t, max(h)::BIGINT AS h,
         sum(w9)::BIGINT AS sw, sum(w9 * j)::BIGINT AS swx,
         sum(w9 * j * j)::BIGINT AS swx2, sum(wy9)::BIGINT AS swy,
         sum(wy9 * j)::BIGINT AS swxy
  FROM cells GROUP BY t)
SELECT t AS day, h AS bandwidth,
       round((CAST(swy AS DOUBLE) * CAST(swx2 AS DOUBLE)
              - CAST(swx AS DOUBLE) * CAST(swxy AS DOUBLE))
             / (CAST(sw AS DOUBLE) * CAST(swx2 AS DOUBLE)
                - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE))
             + (CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
                - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
               / (CAST(sw AS DOUBLE) * CAST(swx2 AS DOUBLE)
                  - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE))
               * CAST(t AS DOUBLE), 6) AS fit6
FROM sums ORDER BY t
"""


# ---------------------------------------------------------------------------
# Benjamini-Hochberg
# ---------------------------------------------------------------------------


def _phi_upper_p(z: float) -> float:
    """One-sided upper p = 1 − Φ(z), Abramowitz-Stegun 26.2.17 —
    the identical polynomial runs in the SQL oracle."""
    az = abs(z)
    t = 1.0 / (1.0 + 0.2316419 * az)
    poly = t * (0.319381530
                + t * (-0.356563782
                       + t * (1.781477937
                              + t * (-1.821255978
                                     + t * 1.330274429))))
    tail = (math.exp(-az * az / 2.0)
            / math.sqrt(2.0 * math.pi)) * poly
    return tail if z >= 0.0 else 1.0 - tail


def q_bh_fdr_daily_clicks(sf_dir: str):
    """BH(q=0.10) over per-day click-share z-tests (docstring)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "ts"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = np.asarray(t["event_type"].to_pylist())
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"day": day,
                          "x": (et == "click").astype(np.int64),
                          "n": np.int64(1)}) \
            .groupby("day", sort=False).sum().reset_index()
        for col in ("x", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(dpart, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("x", alias_name="x"),
                                       Sum("n", alias_name="n"))
             .to_pandas().sort_values("day"))
    xx = agg["x"].to_numpy(np.int64)
    nn = agg["n"].to_numpy(np.int64)
    xt, nt = int(xx.sum()), int(nn.sum())
    phat = float(xt) / float(nt)
    p9s = []
    for x_, n_ in zip(xx.tolist(), nn.tolist()):
        z = ((float(x_) - float(n_) * phat)
             / math.sqrt(float(n_) * phat * (1.0 - phat)))
        p9s.append(_r9(_phi_upper_p(z)))
    m = len(p9s)
    p9s.sort()
    k_star = 0
    for k in range(1, m + 1):
        if p9s[k - 1] * m * 10 <= k * 10 ** 9:   # p ≤ k·0.1/m
            k_star = k
    out = pd.DataFrame({
        "m": [m], "n_reject": [k_star],
        "p9_at_k": [p9s[k_star - 1] if k_star else -1]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_BH_FDR = """
WITH d AS (
  SELECT date_trunc('day', ts) AS dy,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1),
tot AS (SELECT sum(x)::BIGINT AS xt, sum(n)::BIGINT AS nt FROM d),
z AS (
  SELECT (CAST(x AS DOUBLE)
          - CAST(n AS DOUBLE) * (CAST(xt AS DOUBLE)
                                 / CAST(nt AS DOUBLE)))
         / sqrt(CAST(n AS DOUBLE)
                * (CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE))
                * (1.0 - CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE)))
           AS z
  FROM d CROSS JOIN tot),
p AS (
  SELECT CAST(round(
    CASE WHEN z >= 0.0 THEN
      (exp(-abs(z) * abs(z) / 2.0) / sqrt(2.0 * pi()))
      * ((1.0 / (1.0 + 0.2316419 * abs(z)))
         * (0.319381530
            + (1.0 / (1.0 + 0.2316419 * abs(z)))
              * (-0.356563782
                 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                   * (1.781477937
                      + (1.0 / (1.0 + 0.2316419 * abs(z)))
                        * (-1.821255978
                           + (1.0 / (1.0 + 0.2316419 * abs(z)))
                             * 1.330274429)))))
    ELSE
      1.0 - (exp(-abs(z) * abs(z) / 2.0) / sqrt(2.0 * pi()))
      * ((1.0 / (1.0 + 0.2316419 * abs(z)))
         * (0.319381530
            + (1.0 / (1.0 + 0.2316419 * abs(z)))
              * (-0.356563782
                 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                   * (1.781477937
                      + (1.0 / (1.0 + 0.2316419 * abs(z)))
                        * (-1.821255978
                           + (1.0 / (1.0 + 0.2316419 * abs(z)))
                             * 1.330274429)))))
    END * 1e9) AS BIGINT) AS p9
  FROM z),
rk AS (
  SELECT p9, row_number() OVER (ORDER BY p9) AS k,
         count(*) OVER () AS m
  FROM p),
sel AS (
  SELECT max(k)::BIGINT AS k_star, max(m)::BIGINT AS m
  FROM rk WHERE p9 * m * 10 <= k * 1000000000)
SELECT coalesce(sel.m, (SELECT max(m) FROM rk))::BIGINT AS m,
       coalesce(sel.k_star, 0)::BIGINT AS n_reject,
       coalesce((SELECT p9 FROM rk WHERE k = sel.k_star), -1)
         ::BIGINT AS p9_at_k
FROM sel
"""


QUERIES147: dict[str, tuple] = {
    "poisson_regression_hour": (q_poisson_regression_hour,
                                SQL_POISSON_REG),
    "lowess_daily": (q_lowess_daily, SQL_LOWESS),
    "bh_fdr_daily_clicks": (q_bh_fdr_daily_clicks, SQL_BH_FDR),
}
