"""One-hundred-second oracle-query batch — CRM / pricing analytics:

- segment_migration_matrix: customer revenue-quintile migration from
  1995 to 1996 — per-year exact disc quintile thresholds, segment =
  # thresholds <= r (boundary convention matching the SQL >= sums,
  the queries94 lesson), 5x5 exact transition counts over customers
  active in BOTH years, plus Cohen's kappa of segment stability
  (po, pe from exact ints).
- cohort_ltv_curve: cumulative lifetime value of the 1995 first-
  order cohort by month offset 0..11 (calendar-month index
  year*12+month): exact cents per offset, running cumulative, and
  the per-customer average (identical-expression float).
- price_dispersion_parts: top-5 parts by within-part unit-price
  dispersion — unit price quantized ONCE per lineitem
  (round(ep*100/qty)), per-part relative variance
  cv2q = ((n*S2 - S^2)*1e9) // S^2 an exact floor-div integer
  (HUGEINT intermediates), exact ordering.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Min, Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_Y1, _Y2 = 1995, 1996


# ---------------------------------------------------------------------------
# Segment migration
# ---------------------------------------------------------------------------


def q_segment_migration_matrix(sf_dir: str):
    """5x5 revenue-quintile migration counts + kappa (docstring
    above)."""
    ds = _pq(sf_dir, "orders",
             columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def rpart(df: pd.DataFrame) -> pd.DataFrame:
        yr = df["o_orderdate"].dt.year.to_numpy()
        keep = (yr == _Y1) | (yr == _Y2)
        df = df[keep]
        if not len(df):
            return pd.DataFrame({"cust": pd.Series([], np.int64),
                                 "y": pd.Series([], np.int64),
                                 "rc": pd.Series([], np.int64)})
        from scrapy_ray.pipelines.queries import _cents_np
        g = pd.DataFrame({
            "cust": df["o_custkey"].to_numpy().astype(np.int64),
            "y": df["o_orderdate"].dt.year.to_numpy().astype(np.int64),
            "rc": _cents_np(df["o_totalprice"].to_numpy())})
        out = g.groupby(["cust", "y"])["rc"].sum().reset_index()
        out["rc"] = out["rc"].astype(np.int64)
        return out

    per = (ds.map_batches(rpart, batch_format="pandas")
             .groupby(["cust", "y"]).aggregate(Sum("rc", alias_name="rc"))
             .to_pandas())

    def seg_of(sub: pd.DataFrame) -> dict:
        r = np.sort(sub["rc"].to_numpy(np.int64))
        n = len(r)
        thr = np.array([int(r[math.ceil(q / 100.0 * n) - 1])
                        for q in (20, 40, 60, 80)], np.int64)
        return {int(c): int(np.searchsorted(thr, int(v), side="right"))
                for c, v in zip(sub["cust"], sub["rc"])}

    s1 = seg_of(per[per["y"] == _Y1])
    s2 = seg_of(per[per["y"] == _Y2])
    both = sorted(set(s1) & set(s2))
    mat = np.zeros((5, 5), np.int64)
    for c in both:
        mat[s1[c], s2[c]] += 1
    n = len(both)
    diag = int(np.trace(mat))
    row = mat.sum(axis=1)
    col = mat.sum(axis=0)
    pe_num = int((row * col).sum())
    kappa = (float(diag * n - pe_num)) / float(n * n - pe_num)
    rows = [(i, j, int(mat[i, j])) for i in range(5) for j in range(5)]
    out = pd.DataFrame(rows, columns=["from_seg", "to_seg", "cnt"])
    out["n_both"] = n
    out["kappa6"] = _round6(np.array([kappa]))[0]
    for col_ in ("from_seg", "to_seg", "cnt", "n_both"):
        out[col_] = out[col_].astype(np.int64)
    return out


SQL_SEGMENT_MIGRATION = f"""
WITH per AS (
  SELECT o_custkey AS cust, year(o_orderdate) AS y,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rc
  FROM orders WHERE year(o_orderdate) IN ({_Y1}, {_Y2})
  GROUP BY 1, 2),
th AS (
  SELECT y, quantile_disc(rc, 0.2) AS t1, quantile_disc(rc, 0.4) AS t2,
         quantile_disc(rc, 0.6) AS t3, quantile_disc(rc, 0.8) AS t4
  FROM per GROUP BY 1),
seg AS (
  SELECT cust, per.y,
         (rc >= t1)::INT + (rc >= t2)::INT + (rc >= t3)::INT
           + (rc >= t4)::INT AS s
  FROM per JOIN th ON th.y = per.y),
m AS (
  SELECT a.s AS from_seg, b.s AS to_seg, count(*)::BIGINT AS cnt
  FROM seg a JOIN seg b ON b.cust = a.cust
  WHERE a.y = {_Y1} AND b.y = {_Y2}
  GROUP BY 1, 2),
grid AS (
  SELECT i.i AS from_seg, j.j AS to_seg,
         coalesce(m.cnt, 0)::BIGINT AS cnt
  FROM (SELECT unnest(range(0, 5)) AS i) i
  CROSS JOIN (SELECT unnest(range(0, 5)) AS j) j
  LEFT JOIN m ON m.from_seg = i.i AND m.to_seg = j.j),
t AS (
  SELECT sum(cnt)::BIGINT AS n,
         sum(CASE WHEN from_seg = to_seg THEN cnt ELSE 0 END)::BIGINT
           AS diag
  FROM grid),
marg AS (
  SELECT sum(r.rs * c.cs)::BIGINT AS pe_num FROM
    (SELECT from_seg, sum(cnt) AS rs FROM grid GROUP BY 1) r
  JOIN (SELECT to_seg, sum(cnt) AS cs FROM grid GROUP BY 1) c
    ON c.to_seg = r.from_seg)
SELECT from_seg::BIGINT AS from_seg, to_seg::BIGINT AS to_seg, cnt,
       n AS n_both,
       round(CAST(diag * n - pe_num AS DOUBLE)
             / CAST(n * n - pe_num AS DOUBLE), 6) AS kappa6
FROM grid CROSS JOIN t CROSS JOIN marg
ORDER BY from_seg, to_seg
"""


# ---------------------------------------------------------------------------
# Cohort LTV
# ---------------------------------------------------------------------------


def q_cohort_ltv_curve(sf_dir: str):
    """Monthly LTV curve of the 1995 first-order cohort (docstring
    above)."""
    ds = _pq(sf_dir, "orders",
             columns=["o_custkey", "o_orderdate", "o_totalprice"])

    # two-stage: true first month needs a global reduction per customer;
    # ~140k (cust, month) groups — salt to 64 partitions and finish the
    # groupby vectorized inside the partition (the incremental_user_state
    # lesson; a direct 2-key groupby measured 27.6 s vs ~3 s salted)
    def base(df: pd.DataFrame) -> pd.DataFrame:
        from scrapy_ray.pipelines.queries import _cents_np
        mi = (df["o_orderdate"].dt.year.to_numpy() * 12
              + df["o_orderdate"].dt.month.to_numpy()).astype(np.int64)
        g = pd.DataFrame({
            "cust": df["o_custkey"].to_numpy().astype(np.int64),
            "mi": mi,
            "rc": _cents_np(df["o_totalprice"].to_numpy())})
        out = g.groupby(["cust", "mi"])["rc"].sum().reset_index()
        out["rc"] = out["rc"].astype(np.int64)
        out["gkey"] = (out["cust"] % 64).astype(np.int32)
        return out

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cust", "mi"])["rc"].sum().reset_index()
        g["rc"] = g["rc"].astype(np.int64)
        return g

    cm = (ds.map_batches(base, batch_format="pandas")
            .groupby("gkey").map_groups(finish, batch_format="pandas")
            .to_pandas())
    fm = cm.groupby("cust")["mi"].min().rename("fm")
    cm = cm.join(fm, on="cust")
    # first-order year from mi = y*12 + m (m in 1..12 -> y = (mi-1)//12)
    cm["fy"] = (cm["fm"] - 1) // 12
    cohort = cm[cm["fy"] == _Y1]
    n_cohort = cohort["cust"].nunique()
    cohort = cohort.copy()
    cohort["off"] = (cohort["mi"] - cohort["fm"]).astype(np.int64)
    cohort = cohort[cohort["off"] <= 11]
    g = cohort.groupby("off")["rc"].sum().reindex(range(12),
                                                  fill_value=0)
    rc = g.to_numpy(np.int64)
    cum = np.cumsum(rc)
    avg6 = _round6(np.array([float(int(v)) / float(n_cohort)
                             for v in cum]))
    out = pd.DataFrame({"off_m": np.arange(12, dtype=np.int64),
                        "revenue_c": rc.astype(np.int64),
                        "cum_c": cum.astype(np.int64),
                        "avg_cum6": avg6})
    out["n_cohort"] = np.int64(n_cohort)
    return out


SQL_COHORT_LTV = f"""
WITH cm AS (
  SELECT o_custkey AS cust,
         (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS mi,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rc
  FROM orders GROUP BY 1, 2),
fm AS (SELECT cust, min(mi)::BIGINT AS fm FROM cm GROUP BY 1),
coh AS (
  SELECT cm.cust, cm.mi - fm.fm AS off_m, cm.rc
  FROM cm JOIN fm ON fm.cust = cm.cust
  WHERE (fm.fm - 1) // 12 = {_Y1} AND cm.mi - fm.fm <= 11),
nc AS (SELECT count(DISTINCT cust)::BIGINT AS n_cohort FROM coh),
g AS (
  SELECT o.o AS off_m, coalesce(sum(coh.rc), 0)::BIGINT AS revenue_c
  FROM (SELECT unnest(range(0, 12)) AS o) o
  LEFT JOIN coh ON coh.off_m = o.o
  GROUP BY 1),
c AS (
  SELECT off_m, revenue_c,
         sum(revenue_c) OVER (ORDER BY off_m)::BIGINT AS cum_c
  FROM g)
SELECT off_m::BIGINT AS off_m, revenue_c, cum_c,
       round(CAST(cum_c AS DOUBLE) / CAST(n_cohort AS DOUBLE), 6)
         AS avg_cum6,
       n_cohort
FROM c CROSS JOIN nc ORDER BY off_m
"""


# ---------------------------------------------------------------------------
# Price dispersion
# ---------------------------------------------------------------------------


def q_price_dispersion_parts(sf_dir: str):
    """Top-5 parts by quantized within-part unit-price dispersion
    (docstring above)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_partkey", "l_extendedprice", "l_quantity"])

    def ppart(t: pa.Table) -> pa.Table:
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        up = np.floor(ep * 100.0 / q + 0.5).astype(np.int64)
        df = pd.DataFrame({
            "part": t["l_partkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n": np.int64(1), "s": up, "s2": up * up})
        g = df.groupby("part", sort=False).sum().reset_index()
        for c in ("n", "s", "s2"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    per = (ds.map_batches(ppart, batch_format="pyarrow")
             .groupby("part").aggregate(Sum("n", alias_name="n"),
                                        Sum("s", alias_name="s"),
                                        Sum("s2", alias_name="s2"))
             .to_pandas())
    rows = []
    for p, n, s, s2 in zip(per["part"], per["n"], per["s"], per["s2"]):
        n, s, s2 = int(n), int(s), int(s2)
        if n < 2:
            continue
        cv2q = ((n * s2 - s * s) * 1000000000) // (s * s)
        rows.append((int(p), n, cv2q))
    rows.sort(key=lambda r: (-r[2], r[0]))
    out = pd.DataFrame(rows[:5], columns=["part", "n_lines", "cv2q"])
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_PRICE_DISPERSION = """
WITH u AS (
  SELECT l_partkey AS part,
         CAST(round(l_extendedprice * 100.0 / l_quantity) AS BIGINT)
           AS up
  FROM lineitem),
m AS (
  SELECT part, count(*)::BIGINT AS n, sum(up)::BIGINT AS s,
         sum(up::HUGEINT * up) AS s2
  FROM u GROUP BY 1),
f AS (
  SELECT part, n,
         ((n::HUGEINT * s2 - s::HUGEINT * s) * 1000000000)
           // (s::HUGEINT * s) AS cv2q
  FROM m WHERE n >= 2)
SELECT part, n AS n_lines, cv2q::BIGINT AS cv2q
FROM f ORDER BY cv2q DESC, part LIMIT 5
"""


QUERIES102: dict[str, tuple] = {
    "segment_migration_matrix": (q_segment_migration_matrix,
                                 SQL_SEGMENT_MIGRATION),
    "cohort_ltv_curve": (q_cohort_ltv_curve, SQL_COHORT_LTV),
    "price_dispersion_parts": (q_price_dispersion_parts,
                               SQL_PRICE_DISPERSION),
}
