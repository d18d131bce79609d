"""Forty-ninth oracle-query batch — robust variance homogeneity / paired
proportions / ordered-trend testing, exact integer cores throughout:

- brown_forsythe_value_by_type: Brown-Forsythe robust test of variance
  homogeneity of event value across event types — one-way ANOVA on the
  absolute deviations z = |c - median_g(c)| from each group's MEDIAN
  (cents). The cell trick: a (event_type, cents, count) histogram
  aggregate is bounded by the VALUE RANGE in cents (not the row count
  — the percentile_cont rank-selection argument), so one distributed
  cell shuffle yields BOTH the exact quantile_disc medians (cumulative
  rank walk, 1-based ceil(0.5*n)) and the exact integer deviation
  moments (n, Σz, Σz²) per group. The finalize reuses the ANOVA
  quantized S²/n group-term idiom (queries38) verbatim: per-group
  between terms quantized to 1e-2 cents² units and integer-summed, so
  MSB/MSW/F are one identical float expression of integers both sides.
- mcnemar_click_purchase_daily: McNemar's paired test on (user, day)
  units — "clicked that day" vs "purchased that day" (per-USER any-
  flags are degenerate on the synthetic corpus: all users have both).
  One groupby((user, day)) max-flag aggregate, then the 2x2 discordant
  cells b = click-only, c = purchase-only and the continuity-corrected
  chi² = (|b-c|-1)²/(b+c) — exact integers with a single float
  division.
- cochran_armitage_segment_orders: Cochran-Armitage trend test of the
  proportion of ACTIVE customers (>= 10 lifetime orders) across market
  segments scored 1..5 alphabetically (dense_rank mirror in SQL). The
  per-customer order counts ride a custkey-partial shuffle; the counts
  map (bounded by CUSTOMER cardinality, the small dim side) is
  broadcast via ray.put and each customer block tags outcome + score
  locally — customers with zero orders stay in by construction. The
  z-statistic is exact-rational: with per-score (n_g, r_g) integers,
  num = N·Σwr - R·Σwn and v = R(N-R)(N·Σw²n - (Σwn)²) are exact
  (Python ints / HUGEINT — v passes 3e21 at sf1), and
  z = num / sqrt(v/N) finalizes identical-expression.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Max, Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_US_PER_DAY = 86_400_000_000
_BF_SCALE = 100          # 1e-2 cents² units for the S²/n group terms
_CA_MIN_ORDERS = 10      # "active customer" outcome threshold


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# Brown-Forsythe
# ---------------------------------------------------------------------------


def q_brown_forsythe_value_by_type(sf_dir: str):
    """Brown-Forsythe variance-homogeneity F on |c - median_g| deviations
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def cell_partial(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": np.asarray(t["event_type"].to_pylist(),
                                     dtype=object),
            "c": c.astype(np.int64)})
        g = df.groupby(["event_type", "c"], sort=False).size() \
              .rename("cnt").reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    # bounded by (types x value-range-in-cents), NOT by row count
    cells = (ds.map_batches(cell_partial, batch_format="pyarrow")
               .groupby(["event_type", "c"])
               .aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    rows = []
    for et, grp in cells.groupby("event_type", sort=True):
        grp = grp.sort_values("c", kind="mergesort")
        vals = grp["c"].to_numpy(np.int64)
        cnt = grp["cnt"].to_numpy(np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])
        med = int(vals[int(np.searchsorted(cum, int(math.ceil(0.5 * n))))])
        z = np.abs(vals - med)
        s1 = sum(int(a) * int(b) for a, b in zip(cnt, z))
        s2 = sum(int(a) * int(b) * int(b) for a, b in zip(cnt, z))
        rows.append({"event_type": et, "med": med, "n": n,
                     "s": s1, "s2": s2})
    g = pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)
    n = g["n"].to_numpy(np.int64)
    s = g["s"].to_numpy(np.int64)
    term = (s.astype(np.float64) * s.astype(np.float64)
            / n.astype(np.float64)) * np.float64(_BF_SCALE)
    t_units = np.floor(term + 0.5).astype(np.int64)
    k = int(len(g))
    n_tot = int(n.sum())
    s_tot = int(s.sum())
    ss2 = int(g["s2"].to_numpy(np.int64).sum())
    t_sum = int(t_units.sum())
    g_units = int(np.floor(
        (np.float64(s_tot) * np.float64(s_tot) / np.float64(n_tot))
        * np.float64(_BF_SCALE) + 0.5))
    num = (float(t_sum - g_units) / float(_BF_SCALE)) / float(k - 1)
    den = ((float(ss2) - float(t_sum) / float(_BF_SCALE))
           / float(n_tot - k))
    r6 = _round6(np.array([num, den, num / den]))
    out = pd.DataFrame({"event_type": g["event_type"],
                        "med": g["med"].astype(np.int64), "n": n, "s": s,
                        "s2": g["s2"].astype(np.int64),
                        "t_units": t_units})
    out["k"] = np.int64(k)
    out["msb6"] = r6[0]
    out["msw6"] = r6[1]
    out["f6"] = r6[2]
    return out


SQL_BF = f"""
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
med AS (
  SELECT event_type, quantile_disc(c, 0.5)::BIGINT AS med
  FROM e GROUP BY 1),
z AS (
  SELECT e.event_type, med.med, abs(e.c - med.med)::BIGINT AS z
  FROM e JOIN med USING (event_type)),
g AS (
  SELECT event_type, any_value(med) AS med, count(*)::BIGINT AS n,
         sum(z)::BIGINT AS s, sum(z * z)::BIGINT AS s2,
         CAST(round((CAST(sum(z) AS DOUBLE) * CAST(sum(z) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE)) * {_BF_SCALE})
              AS BIGINT) AS t_units
  FROM z GROUP BY 1),
tot AS (
  SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS n_tot,
         sum(s)::BIGINT AS s_tot, sum(s2)::BIGINT AS ss2,
         sum(t_units)::BIGINT AS t_sum
  FROM g),
fin AS (
  SELECT k, n_tot, ss2, t_sum,
         CAST(round((CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE)
                     / CAST(n_tot AS DOUBLE)) * {_BF_SCALE})
              AS BIGINT) AS g_units
  FROM tot),
f AS (
  SELECT k,
         round((CAST(t_sum - g_units AS DOUBLE) / {_BF_SCALE}.0)
               / CAST(k - 1 AS DOUBLE), 6) AS msb6,
         round((CAST(ss2 AS DOUBLE)
                - CAST(t_sum AS DOUBLE) / {_BF_SCALE}.0)
               / CAST(n_tot - k AS DOUBLE), 6) AS msw6,
         round(((CAST(t_sum - g_units AS DOUBLE) / {_BF_SCALE}.0)
                / CAST(k - 1 AS DOUBLE))
               / ((CAST(ss2 AS DOUBLE)
                   - CAST(t_sum AS DOUBLE) / {_BF_SCALE}.0)
                  / CAST(n_tot - k AS DOUBLE)), 6) AS f6
  FROM fin)
SELECT g.event_type, g.med, g.n, g.s, g.s2, g.t_units,
       f.k, f.msb6, f.msw6, f.f6
FROM g CROSS JOIN f
ORDER BY g.event_type
"""


# ---------------------------------------------------------------------------
# McNemar
# ---------------------------------------------------------------------------


def q_mcnemar_click_purchase_daily(sf_dir: str):
    """McNemar continuity-corrected chi² on paired (user, day) click /
    purchase indicators (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def flag_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        keep = (et == "click") | (et == "purchase")
        if not keep.any():
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "day": pa.array([], pa.int64()),
                             "hc": pa.array([], pa.int64()),
                             "hp": pa.array([], pa.int64())})
        uid = (t["user_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64)[keep])
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)[keep]
        etk = et[keep]
        df = pd.DataFrame({"user_id": uid, "day": day,
                           "hc": (etk == "click").astype(np.int64),
                           "hp": (etk == "purchase").astype(np.int64)})
        g = df.groupby(["user_id", "day"], sort=False).max().reset_index()
        return _strip(g)

    flags = (ds.map_batches(flag_partial, batch_format="pyarrow")
               .groupby(["user_id", "day"])
               .aggregate(Max("hc", alias_name="hc"),
                          Max("hp", alias_name="hp")))

    def cell_partial(t: pa.Table) -> pa.Table:
        hc = t["hc"].to_numpy(zero_copy_only=False).astype(np.int64)
        hp = t["hp"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"hc": hc, "hp": hp})
        g = df.groupby(["hc", "hp"], sort=False).size().rename("cnt") \
              .reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    cells = (flags.map_batches(cell_partial, batch_format="pyarrow")
                  .groupby(["hc", "hp"])
                  .aggregate(Sum("cnt", alias_name="cnt"))
                  .to_pandas())
    cnt = {(int(r.hc), int(r.hp)): int(r.cnt)
           for r in cells.itertuples(index=False)}
    b = cnt.get((1, 0), 0)          # click-only days
    c = cnt.get((0, 1), 0)          # purchase-only days
    d = abs(b - c) - 1
    chi2 = float(d * d) / float(b + c)
    out = pd.DataFrame({"n_click_only": [b], "n_purchase_only": [c],
                        "n_both": [cnt.get((1, 1), 0)],
                        "chi2_6": [_round6(np.array([chi2]))[0]]})
    for col in ("n_click_only", "n_purchase_only", "n_both"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MCNEMAR = f"""
WITH u AS (
  SELECT user_id, CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2),
cells AS (
  SELECT sum(CASE WHEN hc = 1 AND hp = 0 THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN hc = 0 AND hp = 1 THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN hc = 1 AND hp = 1 THEN 1 ELSE 0 END)::BIGINT
           AS n_both
  FROM u)
SELECT b AS n_click_only, c AS n_purchase_only, n_both,
       round(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
             / CAST(b + c AS DOUBLE), 6) AS chi2_6
FROM cells
"""


# ---------------------------------------------------------------------------
# Cochran-Armitage
# ---------------------------------------------------------------------------


def q_cochran_armitage_segment_orders(sf_dir: str):
    """Cochran-Armitage trend z across alphabetically-scored market
    segments (docstring above)."""
    orders = _pq(sf_dir, "orders", columns=["o_custkey"])

    def ocount_partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, n = np.unique(ck, return_counts=True)
        return pa.table({"custkey": pa.array(u),
                         "k": pa.array(n.astype(np.int64))})

    oc = (orders.map_batches(ocount_partial, batch_format="pyarrow")
                .groupby("custkey").aggregate(Sum("k", alias_name="k"))
                .to_pandas())
    # active-key set is bounded by CUSTOMER cardinality (dim side) —
    # broadcast once via ray.put, sorted for vectorized membership
    kk = oc["k"].to_numpy(np.int64)
    active = np.sort(oc["custkey"].to_numpy(np.int64)
                     [kk >= _CA_MIN_ORDERS])
    active_ref = ray.put(active)

    cust = _pq(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    class Tag:
        def __init__(self):
            self.active = ray.get(active_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = (t["c_custkey"].to_numpy(zero_copy_only=False)
                  .astype(np.int64))
            seg = np.asarray(t["c_mktsegment"].to_pylist(), dtype=object)
            idx = np.searchsorted(self.active, ck)
            idx[idx >= len(self.active)] = 0
            r = ((len(self.active) > 0)
                 & (self.active[idx] == ck)).astype(np.int64)
            df = pd.DataFrame({"segment": seg, "n": np.int64(1), "r": r})
            g = df.groupby("segment", sort=False).sum().reset_index()
            for col in ("n", "r"):
                g[col] = g[col].astype(np.int64)
            return _strip(g)

    g = (cust.map_batches(Tag, concurrency=2, batch_format="pyarrow")
             .groupby("segment")
             .aggregate(Sum("n", alias_name="n"), Sum("r", alias_name="r"))
             .to_pandas()).sort_values("segment").reset_index(drop=True)
    w = np.arange(1, len(g) + 1, dtype=np.int64)    # alphabetical scores
    n_g = [int(x) for x in g["n"]]
    r_g = [int(x) for x in g["r"]]
    n = sum(n_g)
    rr = sum(r_g)
    swr = sum(int(a) * b for a, b in zip(w, r_g))
    swn = sum(int(a) * b for a, b in zip(w, n_g))
    sw2n = sum(int(a) * int(a) * b for a, b in zip(w, n_g))
    num = n * swr - rr * swn                          # exact ints
    v = rr * (n - rr) * (n * sw2n - swn * swn)
    z = float(num) / math.sqrt(float(v) / float(n))
    out = pd.DataFrame({"segment": g["segment"], "w": w,
                        "n_seg": np.array(n_g, np.int64),
                        "r_seg": np.array(r_g, np.int64)})
    out["n_total"] = np.int64(n)
    out["r_total"] = np.int64(rr)
    out["z6"] = _round6(np.array([z]))[0]
    return out


SQL_CA = f"""
WITH oc AS (
  SELECT o_custkey AS custkey, count(*)::BIGINT AS k
  FROM orders GROUP BY 1),
cu AS (
  SELECT c_mktsegment AS segment,
         CASE WHEN coalesce(oc.k, 0) >= {_CA_MIN_ORDERS}
              THEN 1 ELSE 0 END AS r
  FROM customer LEFT JOIN oc ON c_custkey = oc.custkey),
g AS (
  SELECT segment, count(*)::BIGINT AS n_seg, sum(r)::BIGINT AS r_seg
  FROM cu GROUP BY 1),
sc AS (
  SELECT segment, n_seg, r_seg,
         dense_rank() OVER (ORDER BY segment)::BIGINT AS w
  FROM g),
tot AS (
  SELECT sum(n_seg)::HUGEINT AS n, sum(r_seg)::HUGEINT AS rr,
         sum(w * r_seg)::HUGEINT AS swr, sum(w * n_seg)::HUGEINT AS swn,
         sum(w * w * n_seg)::HUGEINT AS sw2n
  FROM sc),
f AS (
  SELECT n, rr, (n * swr - rr * swn) AS num,
         (rr * (n - rr) * (n * sw2n - swn * swn)) AS v
  FROM tot)
SELECT sc.segment, sc.w, sc.n_seg, sc.r_seg,
       f.n::BIGINT AS n_total, f.rr::BIGINT AS r_total,
       round(CAST(f.num AS DOUBLE)
             / sqrt(CAST(f.v AS DOUBLE) / CAST(f.n AS DOUBLE)), 6) AS z6
FROM sc CROSS JOIN f
ORDER BY sc.segment
"""


QUERIES49: dict[str, tuple] = {
    "brown_forsythe_value_by_type": (q_brown_forsythe_value_by_type,
                                     SQL_BF),
    "mcnemar_click_purchase_daily": (q_mcnemar_click_purchase_daily,
                                     SQL_MCNEMAR),
    "cochran_armitage_segment_orders": (q_cochran_armitage_segment_orders,
                                        SQL_CA),
}
