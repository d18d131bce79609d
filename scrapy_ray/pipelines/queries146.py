"""One-hundred-forty-sixth oracle-query batch — stratified-table
homogeneity, weighted survival comparison, and jackknife resampling:

- breslow_day_daily: Breslow-Day homogeneity of the odds ratio across
  the 30 day-strata for the 2×2 (click/view) × (value above the
  global click+view median) tables. The common OR is Mantel-Haenszel
  with per-stratum 1e-9-quantized a·d/t and b·c/t contributions; each
  stratum's expected cell solves the BD quadratic
  (1−ψ)E² + [(n0−m1)+ψ(n1+m1)]E − ψ·n1·m1 = 0 with the root picked
  INSIDE the feasible cell range (identical CASE both sides), and the
  (a−E)²/V terms are 1e-6-quantized before the integer sum. Strata
  with a degenerate margin are excluded by the same HAVING filter.
- gehan_wilcoxon_gaps: the Gehan-Breslow generalized Wilcoxon test on
  the logrank_purchase_gaps setup (parity cohorts, uncensored gap
  days). With weights w_j = n_j the score U = Σ (n_j·d1j − d_j·n1j)
  is a PURE INTEGER — no quantization at all on the numerator; the
  variance Σ n_j²·v_j uses the standard hypergeometric v_j quantized
  per event time to 1e-6.
- jackknife_gini_orders: delete-1 jackknife standard error of the
  Gini coefficient of order prices. Deleting any one of c tied
  occurrences of a value gives the SAME leave-one-out Gini
  (P_k − k·v is constant inside a tie run), so the whole jackknife
  collapses to one pass over the cents histogram: W' = W − S + P0 −
  k0·v with exact integer prefix sums, per-value G_(k) quantized to
  1e-9, and SE² = (n−1)/n · Σc·(g−ḡ)² from integer moment sums.
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

_US_PER_DAY = 86_400_000_000


def _rint(v: float, scale: float) -> int:
    return int(math.floor(abs(v) * scale + 0.5)) \
        * (1 if v >= 0 else -1)


# ---------------------------------------------------------------------------
# Breslow-Day
# ---------------------------------------------------------------------------


def q_breslow_day_daily(sf_dir: str):
    """BD homogeneity of daily click/view high-value ORs (docstring)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "ts", "value"])

    def hist(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        m = (et == "click") | (et == "view")
        v = t["value"].to_numpy(zero_copy_only=False)[m]
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
        import pyarrow.compute as pc

        et = np.asarray(t["event_type"].to_pylist())
        m = (et == "click") | (et == "view")
        v = t["value"].to_numpy(zero_copy_only=False)[m]
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)[m]
        g = pd.DataFrame({
            "day": day,
            "clk": (et[m] == "click").astype(np.int64),
            "hi": (c > med).astype(np.int64),
            "n": np.int64(1)}) \
            .groupby(["day", "clk", "hi"], sort=False).sum() \
            .reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cel = (ds.map_batches(cells, batch_format="pyarrow")
             .groupby(["day", "clk", "hi"])
             .aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    piv: dict[int, list[int]] = {}
    for _, r in cel.iterrows():
        piv.setdefault(int(r["day"]), [0, 0, 0, 0])[
            int(r["clk"]) * 2 + int(r["hi"])] = int(r["n"])
    s1 = s2 = 0
    strata = []
    for day in sorted(piv):
        d_, c_, b_, a_ = piv[day]   # [view-lo, view-hi, clk-lo, clk-hi]
        n1, n0 = a_ + b_, c_ + d_
        m1 = a_ + c_
        t_ = n1 + n0
        if n1 == 0 or n0 == 0 or m1 == 0 or m1 == t_:
            continue
        s1 += _rint(float(a_) * float(d_) / float(t_), 1e9)
        s2 += _rint(float(b_) * float(c_) / float(t_), 1e9)
        strata.append((a_, n1, n0, m1))
    psi = float(s1) / float(s2)
    x2_u = 0
    for a_, n1, n0, m1 in strata:
        qa = 1.0 - psi
        qb = float(n0 - m1) + psi * float(n1 + m1)
        qc = -psi * float(n1) * float(m1)
        disc = math.sqrt(qb * qb - 4.0 * qa * qc)
        e1 = (-qb + disc) / (2.0 * qa)
        e2 = (-qb - disc) / (2.0 * qa)
        lo = float(max(0, m1 - n0))
        hi = float(min(n1, m1))
        e = e1 if (e1 >= lo and e1 <= hi) else e2
        vinv = (1.0 / e + 1.0 / (float(n1) - e)
                + 1.0 / (float(m1) - e)
                + 1.0 / (float(n0 - m1) + e))
        x2_u += _rint((float(a_) - e) * (float(a_) - e) * vinv, 1e6)
    x2 = float(x2_u) / 1e6
    out = pd.DataFrame({
        "n_strata": [len(strata)], "median_cents": [med],
        "psi6": [_round6(np.array([psi]))[0]],
        "x2_6": [_round6(np.array([x2]))[0]]})
    for col in ("n_strata", "median_cents"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BRESLOW_DAY = """
WITH r AS (
  SELECT date_trunc('day', ts) AS dy, event_type AS g,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'view')),
med AS (SELECT quantile_disc(c, 0.5) AS m FROM r),
cells AS (
  SELECT dy,
    sum(((g = 'click') AND c > med.m)::INT)::BIGINT AS a,
    sum(((g = 'click') AND c <= med.m)::INT)::BIGINT AS b,
    sum(((g = 'view') AND c > med.m)::INT)::BIGINT AS cc,
    sum(((g = 'view') AND c <= med.m)::INT)::BIGINT AS d
  FROM r CROSS JOIN med GROUP BY dy
  HAVING (a + b) > 0 AND (cc + d) > 0 AND (a + cc) > 0
     AND (a + cc) < (a + b + cc + d)),
mh AS (
  SELECT
    sum(CAST(round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
             / CAST(a + b + cc + d AS DOUBLE) * 1e9) AS BIGINT))
      ::BIGINT AS s1,
    sum(CAST(round(CAST(b AS DOUBLE) * CAST(cc AS DOUBLE)
             / CAST(a + b + cc + d AS DOUBLE) * 1e9) AS BIGINT))
      ::BIGINT AS s2,
    count(*)::BIGINT AS ns
  FROM cells),
psi AS (
  SELECT CAST(s1 AS DOUBLE) / CAST(s2 AS DOUBLE) AS p, ns FROM mh),
bd AS (
  SELECT cells.a, (cells.a + cells.b) AS n1,
         (cells.cc + cells.d) AS n0, (cells.a + cells.cc) AS m1,
         psi.p
  FROM cells CROSS JOIN psi),
ee AS (
  SELECT a, n1, n0, m1, p,
         (1.0 - p) AS qa,
         (CAST(n0 - m1 AS DOUBLE) + p * CAST(n1 + m1 AS DOUBLE))
           AS qb,
         -p * CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE) AS qc
  FROM bd),
ef AS (
  SELECT a, n1, n0, m1,
         CASE WHEN (-qb + sqrt(qb * qb - 4.0 * qa * qc))
                   / (2.0 * qa)
                   >= CAST(greatest(0, m1 - n0) AS DOUBLE)
              AND (-qb + sqrt(qb * qb - 4.0 * qa * qc))
                   / (2.0 * qa)
                   <= CAST(least(n1, m1) AS DOUBLE)
              THEN (-qb + sqrt(qb * qb - 4.0 * qa * qc)) / (2.0 * qa)
              ELSE (-qb - sqrt(qb * qb - 4.0 * qa * qc)) / (2.0 * qa)
         END AS e
  FROM ee),
terms AS (
  SELECT sum(CAST(round(
           (CAST(a AS DOUBLE) - e) * (CAST(a AS DOUBLE) - e)
           * (1.0 / e + 1.0 / (CAST(n1 AS DOUBLE) - e)
              + 1.0 / (CAST(m1 AS DOUBLE) - e)
              + 1.0 / (CAST(n0 - m1 AS DOUBLE) + e)) * 1e6)
           AS BIGINT))::BIGINT AS x2u
  FROM ef)
SELECT psi.ns AS n_strata, med.m::BIGINT AS median_cents,
       round(psi.p, 6) AS psi6,
       round(CAST(terms.x2u AS DOUBLE) / 1e6, 6) AS x2_6
FROM psi CROSS JOIN terms CROSS JOIN med
"""


# ---------------------------------------------------------------------------
# Gehan-Breslow generalized Wilcoxon
# ---------------------------------------------------------------------------


def q_gehan_wilcoxon_gaps(sf_dir: str):
    """Gehan-weighted two-sample test on purchase gaps (docstring)."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_type", "event_id"])

    def gap_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        keep = et == "purchase"
        uid = (t["user_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64)[keep])
        ts = (t["ts"].cast(pa.int64())
              .to_numpy(zero_copy_only=False)[keep])
        eid = (t["event_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64)[keep])
        return pa.table({"user_id": pa.array(uid), "ts": pa.array(ts),
                         "event_id": pa.array(eid),
                         "salt": pa.array(uid % 64)})

    def gaps_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        if len(ts) < 2:
            return pd.DataFrame({"grp": pd.Series([], dtype=np.int64),
                                 "gap": pd.Series([], dtype=np.int64),
                                 "cnt": pd.Series([], dtype=np.int64)})
        same = uid[1:] == uid[:-1]
        gap = ((ts[1:] - ts[:-1]) // _US_PER_DAY)[same]
        grp = (uid[1:] % 2)[same]
        g = (pd.DataFrame({"grp": grp, "gap": gap})
             .groupby(["grp", "gap"]).size().rename("cnt")
             .reset_index())
        for col in ("grp", "gap", "cnt"):
            g[col] = g[col].astype(np.int64)
        return g

    cells = (ds.map_batches(gap_partial, batch_format="pyarrow")
               .groupby("salt")
               .map_groups(gaps_partition, batch_format="pandas")
               .groupby(["grp", "gap"])
               .aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    piv = (cells.pivot_table(index="gap", columns="grp", values="cnt",
                             aggfunc="sum", fill_value=0)
                .reindex(columns=[0, 1], fill_value=0)
                .sort_index())
    d0 = piv[0].to_numpy(np.int64)
    d1 = piv[1].to_numpy(np.int64)
    n0 = d0[::-1].cumsum()[::-1]
    n1 = d1[::-1].cumsum()[::-1]
    u = 0
    v_u = 0
    for dd0, dd1, r0, r1 in zip(d0, d1, n0, n1):
        dj = int(dd0) + int(dd1)
        nj = int(r0) + int(r1)
        n1j = int(r1)
        u += nj * int(dd1) - dj * n1j        # Gehan U: pure integer
        if nj > 1:
            vt = (float(dj) * (float(n1j) / float(nj))
                  * (1.0 - float(n1j) / float(nj))
                  * (float(nj) - float(dj)) / (float(nj) - 1.0))
            # quantize the SMALL vt, then scale by integer nj² exactly
            # — quantizing nj²·vt directly crosses 2^52 at sf0.1 where
            # floor(x+0.5) ties-to-even diverges from round(x) by 1
            v_u += nj * nj * _rint(vt, 1e6)
    v = float(v_u) / 1e6
    z = float(u) / math.sqrt(v)
    out = pd.DataFrame({"n_gaps_even": [int(d0.sum())],
                        "n_gaps_odd": [int(d1.sum())],
                        "u_gehan": [u], "v_units": [v_u],
                        "z6": [_round6(np.array([z]))[0]]})
    for col in ("n_gaps_even", "n_gaps_odd", "u_gehan", "v_units"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GEHAN = f"""
WITH p AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type = 'purchase'),
g AS (
  SELECT user_id % 2 AS grp,
         CAST((epoch_us(ts) - epoch_us(prev)) // {_US_PER_DAY}
              AS BIGINT) AS gap
  FROM p WHERE prev IS NOT NULL),
c AS (
  SELECT gap,
         sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::BIGINT AS d0,
         sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::BIGINT AS d1
  FROM g GROUP BY 1),
r AS (
  SELECT gap, d0, d1, (d0 + d1) AS dj,
         sum(d0 + d1) OVER (ORDER BY gap DESC)::BIGINT AS nj,
         sum(d1) OVER (ORDER BY gap DESC)::BIGINT AS n1j
  FROM c),
q AS (
  SELECT sum(d0)::BIGINT AS n0s, sum(d1)::BIGINT AS n1s,
         sum(nj * d1 - dj * n1j)::BIGINT AS u,
         sum(CASE WHEN nj > 1 THEN
           nj * nj * CAST(round((CAST(dj AS DOUBLE)
                * (CAST(n1j AS DOUBLE) / CAST(nj AS DOUBLE))
                * (1.0 - CAST(n1j AS DOUBLE) / CAST(nj AS DOUBLE))
                * (CAST(nj AS DOUBLE) - CAST(dj AS DOUBLE))
                / (CAST(nj AS DOUBLE) - 1.0)) * 1000000)
             AS BIGINT) ELSE 0 END)::BIGINT AS v_u
  FROM r)
SELECT n0s AS n_gaps_even, n1s AS n_gaps_odd, u AS u_gehan,
       v_u AS v_units,
       round(CAST(u AS DOUBLE)
             / sqrt(CAST(v_u AS DOUBLE) / 1e6), 6) AS z6
FROM q
"""


# ---------------------------------------------------------------------------
# Jackknife Gini
# ---------------------------------------------------------------------------


def q_jackknife_gini_orders(sf_dir: str):
    """Delete-1 jackknife SE of the Gini of order prices (docstring)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hist(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"v": c, "n": np.int64(1)}) \
            .groupby("v", sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(hist, batch_format="pyarrow")
           .groupby("v").aggregate(Sum("n", alias_name="n"))
           .to_pandas().sort_values("v").reset_index(drop=True))
    v = [int(x) for x in h["v"].tolist()]
    c = [int(x) for x in h["n"].tolist()]
    n = sum(c)
    s = sum(vv * cc for vv, cc in zip(v, c))
    # W = sum of rank*value; per tie-run of c copies starting at k0
    w = 0
    k0 = 1
    pref = 0
    runs = []
    for vv, cc in zip(v, c):
        w += vv * (cc * k0 + cc * (cc - 1) // 2)
        pref += vv * cc
        runs.append((vv, cc, k0, pref - vv * (cc - 1)))
        # p0 = prefix through FIRST occurrence = pref - v*(c-1)
        k0 += cc
    gini = 2.0 * float(w) / (float(n) * float(s)) \
        - (float(n) + 1.0) / float(n)
    sg = 0
    sg2 = 0
    for vv, cc, k0_, p0 in runs:
        wp = w - k0_ * vv - (s - p0)        # constant across the run
        sp = s - vv
        gk = (2.0 * float(wp) / (float(n - 1) * float(sp))
              - float(n) / float(n - 1))
        g9 = _rint(gk, 1e9)
        sg += cc * g9
        sg2 += cc * g9 * g9
    nb = len(runs)
    se2 = (float(n - 1) / float(n)
           * (float(n * sg2 - sg * sg))
           / (float(n) * float(n)) / 1e18)
    se = math.sqrt(se2)
    out = pd.DataFrame({
        "n": [n], "n_values": [nb],
        "gini6": [_round6(np.array([gini]))[0]],
        "se6": [_round6(np.array([se]))[0]]})
    for col in ("n", "n_values"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_JACKKNIFE_GINI = """
WITH r AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
h AS (SELECT v, count(*)::BIGINT AS c FROM r GROUP BY v),
p1 AS (
  SELECT v, c,
         sum(c) OVER w - c + 1 AS k0,
         sum(CAST(v AS HUGEINT) * c) OVER w - v * (c - 1) AS p0
  FROM h
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)),
p AS (
  SELECT v, c, k0, p0,
         sum(CAST(v AS HUGEINT)
             * (c * k0 + c * (c - 1) // 2)) OVER () AS wtot,
         sum(CAST(v AS HUGEINT) * c) OVER () AS s,
         sum(c) OVER () AS n
  FROM p1),
g AS (
  SELECT n, s, wtot, count(*) OVER () AS nb, c,
         CAST(round((2.0 * CAST(wtot - k0 * v - (s - p0) AS DOUBLE)
                     / (CAST(n - 1 AS DOUBLE)
                        * CAST(s - v AS DOUBLE))
                     - CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE))
                    * 1e9) AS BIGINT) AS g9
  FROM p),
agg AS (
  SELECT max(n)::BIGINT AS n, max(nb)::BIGINT AS nb,
         max(CAST(wtot AS DOUBLE)) AS w, max(CAST(s AS DOUBLE)) AS s,
         sum(CAST(c AS HUGEINT) * g9) AS sg,
         sum(CAST(c AS HUGEINT) * g9 * g9) AS sg2
  FROM g)
SELECT n, nb AS n_values,
       round(2.0 * w / (CAST(n AS DOUBLE) * s)
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)
         AS gini6,
       round(sqrt(CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE)
                  * CAST(n * sg2 - sg * sg AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e18),
             6) AS se6
FROM agg
"""


QUERIES146: dict[str, tuple] = {
    "breslow_day_daily": (q_breslow_day_daily, SQL_BRESLOW_DAY),
    "gehan_wilcoxon_gaps": (q_gehan_wilcoxon_gaps, SQL_GEHAN),
    "jackknife_gini_orders": (q_jackknife_gini_orders,
                              SQL_JACKKNIFE_GINI),
}
