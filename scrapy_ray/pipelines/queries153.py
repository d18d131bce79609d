"""One-hundred-fifty-third oracle-query batch — modern rank
correlation, two-sample runs, and categorical forecast skill:

- chatterjee_xi_orders: Chatterjee's ξ correlation (2020) between
  order price and order date, in the TIES form
  ξ = 1 − n·Σ|r_{i+1} − r_i| / (2·Σ l_i(n − l_i)) with
  r_i = #{y_j ≤ y_i} and l_i = #{y_j ≥ y_i}, rows ordered by
  (price cents, orderkey) — the paper breaks x-ties at random; the
  deterministic orderkey tiebreak is documented and identical on
  both sides. Every term is an exact integer; only the final ratio
  is float.
- wald_wolfowitz_click_view: the two-sample runs test — click and
  view values pooled and sorted by (cents, type, event_id), runs of
  the type label counted exactly, and the z statistic
  (R − E)/sqrt(V) finalized identically from integer n1, n2, R
  (the value-tie order is fixed by the documented composite sort).
- forecast_skill_scores: Heidke, Peirce and Gilbert skill scores of
  the rule "value > global median ⇒ purchase" against the true
  purchase label, from the exact 2×2 confusion counts; the Gilbert
  a_random = (a+b)(a+c)/n keeps HUGEINT numerators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


# ---------------------------------------------------------------------------
# Chatterjee xi
# ---------------------------------------------------------------------------


def q_chatterjee_xi_orders(sf_dir: str):
    """Chatterjee's ξ of (price → date), ties form (docstring)."""
    ds = _pq(sf_dir, "orders",
             columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def part(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        d = t["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        k = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return _strip(pd.DataFrame({"c": c, "d": d, "k": k}))

    df = (ds.map_batches(part, batch_format="pyarrow")
            .to_pandas().sort_values(["c", "k"]).reset_index(drop=True))
    d = df["d"].to_numpy(np.int64)
    n = len(d)
    # r_i = #{y_j <= y_i}, l_i = #{y_j >= y_i} over the WHOLE sample
    order = np.argsort(d, kind="mergesort")
    ds_ = d[order]
    uniq, counts = np.unique(ds_, return_counts=True)
    cum = np.cumsum(counts)
    pos = np.searchsorted(uniq, d)
    r = cum[pos]
    l_ = n - (cum[pos] - counts[pos])
    num = int(np.abs(np.diff(r.astype(np.int64))).sum()) * n
    den = 2 * int((l_.astype(object) * (n - l_).astype(object)).sum())
    xi = 1.0 - float(num) / float(den)
    out = pd.DataFrame({"n": [n], "num": [num], "den": [den],
                        "xi6": [_round6(np.array([xi]))[0]]})
    for col in ("n", "num", "den"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CHATTERJEE = """
WITH r AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         epoch_us(o_orderdate) AS d
  FROM orders),
hd AS (SELECT d, count(*)::BIGINT AS t FROM r GROUP BY d),
hc AS (
  SELECT d, t,
         sum(t) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum
  FROM hd),
tot AS (SELECT sum(t)::BIGINT AS n FROM hd),
rk AS (
  SELECT r.k, r.c, hc.cum AS rr,
         tot.n - (hc.cum - hc.t) AS ll, tot.n
  FROM r JOIN hc USING (d) CROSS JOIN tot),
srt AS (
  SELECT rr, ll, n,
         lead(rr) OVER (ORDER BY c, k) AS rnext
  FROM rk),
s AS (
  SELECT max(n)::BIGINT AS n,
         (sum(abs(rnext - rr)) FILTER (WHERE rnext IS NOT NULL)
          * max(n))::BIGINT AS num,
         (2 * sum(CAST(ll AS HUGEINT) * (n - ll)))::BIGINT AS den
  FROM srt)
SELECT n, num, den,
       round(1.0 - CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
         AS xi6
FROM s
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs
# ---------------------------------------------------------------------------


def q_wald_wolfowitz_click_view(sf_dir: str):
    """Two-sample runs test on pooled sorted values (docstring)."""
    ds = _pq(sf_dir, "events",
             columns=["event_type", "value", "event_id"])

    def part(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        m = (et == "click") | (et == "view")
        v = t["value"].to_numpy(zero_copy_only=False)[m]
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        e = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[m]
        return _strip(pd.DataFrame({"c": c, "g": et[m], "e": e}))

    df = (ds.map_batches(part, batch_format="pyarrow")
            .to_pandas().sort_values(["c", "g", "e"])
            .reset_index(drop=True))
    g = (df["g"].to_numpy() == "click").astype(np.int64)
    n1 = int(g.sum())
    n2 = len(g) - n1
    runs = 1 + int((g[1:] != g[:-1]).sum())
    nn = float(n1 + n2)
    e = 1.0 + 2.0 * float(n1) * float(n2) / nn
    v = (2.0 * float(n1) * float(n2)
         * (2.0 * float(n1) * float(n2) - nn)
         / (nn * nn * (nn - 1.0)))
    z = (float(runs) - e) / v**0.5
    out = pd.DataFrame({"n_click": [n1], "n_view": [n2],
                        "runs": [runs],
                        "z6": [_round6(np.array([z]))[0]]})
    for col in ("n_click", "n_view", "runs"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_WALD_WOLFOWITZ = """
WITH r AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c, event_type AS g,
         event_id AS e
  FROM events WHERE event_type IN ('click', 'view')),
s AS (
  SELECT g, lag(g) OVER (ORDER BY c, g, e) AS pg FROM r),
q AS (
  SELECT sum((g = 'click')::INT)::BIGINT AS n1,
         sum((g = 'view')::INT)::BIGINT AS n2,
         (1 + sum(CASE WHEN pg IS NOT NULL AND g <> pg
                       THEN 1 ELSE 0 END))::BIGINT AS runs
  FROM s)
SELECT n1 AS n_click, n2 AS n_view, runs,
       round((CAST(runs AS DOUBLE)
              - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 / CAST(n1 + n2 AS DOUBLE)))
             / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                    * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                       - CAST(n1 + n2 AS DOUBLE))
                    / (CAST(n1 + n2 AS DOUBLE)
                       * CAST(n1 + n2 AS DOUBLE)
                       * (CAST(n1 + n2 AS DOUBLE) - 1.0))), 6) AS z6
FROM q
"""


# ---------------------------------------------------------------------------
# Forecast skill scores
# ---------------------------------------------------------------------------


def q_forecast_skill_scores(sf_dir: str):
    """Heidke / Peirce / Gilbert skill of value>median ⇒ purchase."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def hist(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"c": c, "n": np.int64(1)}) \
            .groupby("c", sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(hist, batch_format="pyarrow")
           .groupby("c").aggregate(Sum("n", alias_name="n"))
           .to_pandas().sort_values("c"))
    cv = h["c"].to_numpy(np.int64)
    cn = np.cumsum(h["n"].to_numpy(np.int64))
    ntot = int(cn[-1])
    med = int(cv[np.searchsorted(cn, (ntot + 1) // 2)])

    def cells(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({
            "f": (c > med).astype(np.int64),
            "o": (et == "purchase").astype(np.int64),
            "n": np.int64(1)}) \
            .groupby(["f", "o"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cel = (ds.map_batches(cells, batch_format="pyarrow")
             .groupby(["f", "o"]).aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    m = {(int(r_["f"]), int(r_["o"])): int(r_["n"])
         for _, r_ in cel.iterrows()}
    a = m.get((1, 1), 0)            # hit
    b = m.get((1, 0), 0)            # false alarm
    c_ = m.get((0, 1), 0)           # miss
    d = m.get((0, 0), 0)            # correct negative
    n = a + b + c_ + d
    hss = (2.0 * float(a * d - b * c_)
           / float((a + c_) * (c_ + d) + (a + b) * (b + d)))
    pss = (float(a * d - b * c_)
           / float((a + c_) * (b + d)))
    ar = float((a + b) * (a + c_)) / float(n)
    gss = (float(a) - ar) / (float(a + b + c_) - ar)
    r6 = _round6(np.array([hss, pss, gss]))
    out = pd.DataFrame({"hits": [a], "false_alarms": [b],
                        "misses": [c_], "corr_neg": [d],
                        "hss6": [r6[0]], "pss6": [r6[1]],
                        "gss6": [r6[2]]})
    for col in ("hits", "false_alarms", "misses", "corr_neg"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SKILL_SCORES = """
WITH r AS (
  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
med AS (SELECT quantile_disc(c, 0.5) AS m FROM r),
cells AS (
  SELECT sum(((c > med.m) AND g = 'purchase')::INT)::BIGINT AS a,
         sum(((c > med.m) AND g <> 'purchase')::INT)::BIGINT AS b,
         sum(((c <= med.m) AND g = 'purchase')::INT)::BIGINT AS cc,
         sum(((c <= med.m) AND g <> 'purchase')::INT)::BIGINT AS d
  FROM r CROSS JOIN med),
f AS (
  SELECT a, b, cc, d, (a + b + cc + d) AS n,
         CAST(CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * cc
              AS DOUBLE) AS det,
         CAST(CAST(a + b AS HUGEINT) * (a + cc) AS DOUBLE)
           / CAST(a + b + cc + d AS DOUBLE) AS ar
  FROM cells)
SELECT a AS hits, b AS false_alarms, cc AS misses, d AS corr_neg,
       round(2.0 * det
             / CAST(CAST(a + cc AS HUGEINT) * (cc + d)
                    + CAST(a + b AS HUGEINT) * (b + d) AS DOUBLE),
             6) AS hss6,
       round(det / CAST(CAST(a + cc AS HUGEINT) * (b + d)
                        AS DOUBLE), 6) AS pss6,
       round((CAST(a AS DOUBLE) - ar)
             / (CAST(a + b + cc AS DOUBLE) - ar), 6) AS gss6
FROM f
"""


QUERIES153: dict[str, tuple] = {
    "chatterjee_xi_orders": (q_chatterjee_xi_orders, SQL_CHATTERJEE),
    "wald_wolfowitz_click_view": (q_wald_wolfowitz_click_view,
                                  SQL_WALD_WOLFOWITZ),
    "forecast_skill_scores": (q_forecast_skill_scores,
                              SQL_SKILL_SCORES),
}
