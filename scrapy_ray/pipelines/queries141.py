"""One-hundred-forty-first oracle-query batch — multivariate and
rank-based two-sample/trend tests, all driven off exact integer
histograms (no float sums ever cross the shuffle):

- hotelling_t2_click_view: two-sample Hotelling T² on the 2-D feature
  (value cents, hour-of-day) for click vs view events. Per-group
  moment sums (n, Σx, Σy, Σx², Σy², Σxy) are exact integers; the
  pooled SSCP entries clear to (n·Σx² − (Σx)²)/n with HUGEINT
  numerators; T² finalizes through one identical 2×2-inverse float
  expression on both sides, plus the exact-F transform for p=2.
- conover_scale_click_view: the squared-rank (Conover) scale test.
  Deviations are the PURE-integer |2·cents − med2_g| around each
  group's doubled median (odd n: 2·middle; even n: sum of the two
  middles — always an exact integer). Doubled midranks
  D = 2·cnt_less + t + 1 come from the combined deviation histogram;
  T = Σ_click D², E and Var use HUGEINT ΣD⁴ sums, z finalizes
  identically.
- cuzick_trend_priority: Cuzick's trend test of order price across
  the ordinal priority scores 1..5. With doubled midranks the rank
  mean is EXACTLY N+1, so E[T] = (N+1)·Σnᵢlᵢ is an integer;
  Var = Σ(l−l̄)²·Σ(D−D̄)²/(N−1) with the score variance cleared to
  (N·Σl² − (Σl)²)/N and the rank variance the exact integer
  ΣD²·cnt − N(N+1)².
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _cents_hist(sf_dir: str, table: str, group_col: str, val_col: str,
                keep: tuple[str, ...] | None = None) -> pd.DataFrame:
    """Exact (group, cents) histogram of a money column — ONE small
    shuffle (distinct groups × distinct cents), all counts integer."""
    ds = _pq(sf_dir, table, columns=[group_col, val_col])

    def hpart(t: pa.Table) -> pa.Table:
        g = np.asarray(t[group_col].to_pylist())
        v = t[val_col].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        df = pd.DataFrame({"g": g, "c": c, "n": np.int64(1)})
        if keep is not None:
            df = df[df["g"].isin(keep)]
        out = df.groupby(["g", "c"], sort=False).sum().reset_index()
        out["n"] = out["n"].astype(np.int64)
        return _strip(out)

    return (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby(["g", "c"]).aggregate(Sum("n", alias_name="n"))
              .to_pandas())


# ---------------------------------------------------------------------------
# Hotelling T²
# ---------------------------------------------------------------------------


def q_hotelling_t2_click_view(sf_dir: str):
    """Two-sample Hotelling T² on (cents, hour) — docstring above."""
    ds = _pq(sf_dir, "events", columns=["event_type", "ts", "value"])

    def mpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        x = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        y = pc.hour(t["ts"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cols: dict = {"k": pa.array([0], pa.int64())}
        for tag, m in (("a", et == "click"), ("b", et == "view")):
            xx, yy = x[m], y[m]
            cols[f"n{tag}"] = pa.array([len(xx)], pa.int64())
            cols[f"sx{tag}"] = pa.array([int(xx.sum())], pa.int64())
            cols[f"sy{tag}"] = pa.array([int(yy.sum())], pa.int64())
            cols[f"xx{tag}"] = pa.array([int((xx * xx).sum())],
                                        pa.int64())
            cols[f"yy{tag}"] = pa.array([int((yy * yy).sum())],
                                        pa.int64())
            cols[f"xy{tag}"] = pa.array([int((xx * yy).sum())],
                                        pa.int64())
        return pa.table(cols)

    fields = [f"{p}{t}" for t in ("a", "b")
              for p in ("n", "sx", "sy", "xx", "yy", "xy")]
    agg = (ds.map_batches(mpart, batch_format="pyarrow")
             .groupby("k")
             .aggregate(*[Sum(f, alias_name=f) for f in fields])
             .to_pandas())
    g = {f: int(agg[f].iloc[0]) for f in fields}
    n1, n2 = g["na"], g["nb"]
    # pooled SSCP entries: Σ(x−x̄)(y−ȳ) = (n·Σxy − Σx·Σy)/n, exact
    # numerators (Python bigints), ONE float division each
    axx = (float(n1 * g["xxa"] - g["sxa"] * g["sxa"]) / float(n1)
           + float(n2 * g["xxb"] - g["sxb"] * g["sxb"]) / float(n2))
    ayy = (float(n1 * g["yya"] - g["sya"] * g["sya"]) / float(n1)
           + float(n2 * g["yyb"] - g["syb"] * g["syb"]) / float(n2))
    axy = (float(n1 * g["xya"] - g["sxa"] * g["sya"]) / float(n1)
           + float(n2 * g["xyb"] - g["sxb"] * g["syb"]) / float(n2))
    dof = float(n1 + n2 - 2)
    sxx, syy, sxy = axx / dof, ayy / dof, axy / dof
    d1 = (float(g["sxa"]) / float(n1) - float(g["sxb"]) / float(n2))
    d2 = (float(g["sya"]) / float(n1) - float(g["syb"]) / float(n2))
    det = sxx * syy - sxy * sxy
    quad = (d1 * d1 * syy - 2.0 * d1 * d2 * sxy + d2 * d2 * sxx) / det
    t2 = float(n1) * float(n2) / float(n1 + n2) * quad
    f = (float(n1 + n2 - 2) - 1.0) / (2.0 * float(n1 + n2 - 2)) * t2
    out = pd.DataFrame({"n1": [n1], "n2": [n2],
                        "t2_6": [_round6(np.array([t2]))[0]],
                        "f_6": [_round6(np.array([f]))[0]]})
    for col in ("n1", "n2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HOTELLING_T2 = """
WITH m AS (
  SELECT
    sum((event_type = 'click')::INT)::BIGINT AS na,
    sum(CASE WHEN event_type = 'click'
             THEN CAST(round(value * 100) AS BIGINT) END)::BIGINT
      AS sxa,
    sum(CASE WHEN event_type = 'click'
             THEN extract(hour FROM ts) END)::BIGINT AS sya,
    sum(CASE WHEN event_type = 'click'
             THEN CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT) END)::BIGINT
      AS xxa,
    sum(CASE WHEN event_type = 'click'
             THEN extract(hour FROM ts) * extract(hour FROM ts)
        END)::BIGINT AS yya,
    sum(CASE WHEN event_type = 'click'
             THEN CAST(round(value * 100) AS BIGINT)
                  * extract(hour FROM ts) END)::BIGINT AS xya,
    sum((event_type = 'view')::INT)::BIGINT AS nb,
    sum(CASE WHEN event_type = 'view'
             THEN CAST(round(value * 100) AS BIGINT) END)::BIGINT
      AS sxb,
    sum(CASE WHEN event_type = 'view'
             THEN extract(hour FROM ts) END)::BIGINT AS syb,
    sum(CASE WHEN event_type = 'view'
             THEN CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT) END)::BIGINT
      AS xxb,
    sum(CASE WHEN event_type = 'view'
             THEN extract(hour FROM ts) * extract(hour FROM ts)
        END)::BIGINT AS yyb,
    sum(CASE WHEN event_type = 'view'
             THEN CAST(round(value * 100) AS BIGINT)
                  * extract(hour FROM ts) END)::BIGINT AS xyb
  FROM events),
a AS (
  SELECT na, nb,
    CAST(CAST(na AS HUGEINT) * xxa - CAST(sxa AS HUGEINT) * sxa
         AS DOUBLE) / CAST(na AS DOUBLE)
    + CAST(CAST(nb AS HUGEINT) * xxb - CAST(sxb AS HUGEINT) * sxb
           AS DOUBLE) / CAST(nb AS DOUBLE) AS axx,
    CAST(CAST(na AS HUGEINT) * yya - CAST(sya AS HUGEINT) * sya
         AS DOUBLE) / CAST(na AS DOUBLE)
    + CAST(CAST(nb AS HUGEINT) * yyb - CAST(syb AS HUGEINT) * syb
           AS DOUBLE) / CAST(nb AS DOUBLE) AS ayy,
    CAST(CAST(na AS HUGEINT) * xya - CAST(sxa AS HUGEINT) * sya
         AS DOUBLE) / CAST(na AS DOUBLE)
    + CAST(CAST(nb AS HUGEINT) * xyb - CAST(sxb AS HUGEINT) * syb
           AS DOUBLE) / CAST(nb AS DOUBLE) AS axy,
    CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)
      - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE) AS d1,
    CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
      - CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE) AS d2
  FROM m),
s AS (
  SELECT na, nb, d1, d2,
         axx / CAST(na + nb - 2 AS DOUBLE) AS sxx,
         ayy / CAST(na + nb - 2 AS DOUBLE) AS syy,
         axy / CAST(na + nb - 2 AS DOUBLE) AS sxy
  FROM a),
t AS (
  SELECT na, nb,
         CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
           / CAST(na + nb AS DOUBLE)
         * ((d1 * d1 * syy - 2.0 * d1 * d2 * sxy + d2 * d2 * sxx)
            / (sxx * syy - sxy * sxy)) AS t2
  FROM s)
SELECT na AS n1, nb AS n2, round(t2, 6) AS t2_6,
       round((CAST(na + nb - 2 AS DOUBLE) - 1.0)
             / (2.0 * CAST(na + nb - 2 AS DOUBLE)) * t2, 6) AS f_6
FROM t
"""


# ---------------------------------------------------------------------------
# Conover squared-rank scale test
# ---------------------------------------------------------------------------


def q_conover_scale_click_view(sf_dir: str):
    """Squared-rank scale test click vs view — docstring above."""
    h = _cents_hist(sf_dir, "events", "event_type", "value",
                    keep=("click", "view"))

    def med2(cnt: pd.Series) -> int:
        """Doubled median of a cents histogram: odd n → 2·mid, even n
        → sum of the two middles (always exact integer)."""
        c = cnt.index.to_numpy(np.int64)
        n_ = cnt.to_numpy(np.int64)
        order = np.argsort(c)
        c, n_ = c[order], n_[order]
        cum = np.cumsum(n_)
        n = int(cum[-1])
        lo = int(c[np.searchsorted(cum, (n + 1) // 2)])
        hi = int(c[np.searchsorted(cum, n // 2 + 1)])
        return lo + hi

    piv = h.pivot_table(index="c", columns="g", values="n",
                        aggfunc="sum", fill_value=0)
    m2 = {g: med2(piv[g][piv[g] > 0]) for g in ("click", "view")}
    rows = []
    for g in ("click", "view"):
        cc = piv.index.to_numpy(np.int64)
        nn = piv[g].to_numpy(np.int64)
        mask = nn > 0
        rows.append(pd.DataFrame({"g": g,
                                  "d": np.abs(2 * cc[mask] - m2[g]),
                                  "n": nn[mask]}))
    dh = (pd.concat(rows).groupby(["g", "d"], sort=False)["n"].sum()
          .reset_index())
    # combined deviation histogram -> doubled midranks
    comb = dh.groupby("d")["n"].sum().sort_index()
    dv = comb.index.to_numpy(np.int64)
    tv = comb.to_numpy(np.int64)
    cl = np.cumsum(tv) - tv
    D = 2 * cl + tv + 1                   # doubled midrank per value
    dmap = dict(zip(dv.tolist(), D.tolist()))
    N = int(tv.sum())
    sd2 = sum(int(t_) * int(dmap[int(d_)]) ** 2
              for d_, t_ in zip(dv.tolist(), tv.tolist()))
    sd4 = sum(int(t_) * int(dmap[int(d_)]) ** 4
              for d_, t_ in zip(dv.tolist(), tv.tolist()))
    cl_rows = dh[dh["g"] == "click"]
    t_stat = sum(int(n_) * int(dmap[int(d_)]) ** 2
                 for d_, n_ in zip(cl_rows["d"].tolist(),
                                   cl_rows["n"].tolist()))
    n1 = int(cl_rows["n"].sum())
    n2 = N - n1
    # float(n1)*float(sd2), NOT float(n1*sd2): sd2 < 2^53 through
    # sf0.1 so both are exact, but this matches the SQL's
    # CAST(n1)*CAST(sd2) form bit-for-bit at any scale
    e = float(n1) * float(sd2) / float(N)
    var = (float(n1) * float(n2)
           * float(N * sd4 - sd2 * sd2)
           / (float(N) * float(N) * float(N - 1)))
    z = (float(t_stat) - e) / var**0.5
    out = pd.DataFrame({"n1": [n1], "n2": [n2], "t_d2": [t_stat],
                        "z6": [_round6(np.array([z]))[0]]})
    for col in ("n1", "n2", "t_d2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CONOVER_SCALE = """
WITH r AS (
  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'view')),
med AS (
  SELECT g,
         min(CASE WHEN rn = (n + 1) // 2 THEN c END)
         + min(CASE WHEN rn = n // 2 + 1 THEN c END) AS m2
  FROM (SELECT g, c, row_number() OVER (PARTITION BY g ORDER BY c)
               AS rn, count(*) OVER (PARTITION BY g) AS n
        FROM r)
  GROUP BY g),
dev AS (
  SELECT r.g, abs(2 * r.c - med.m2) AS d
  FROM r JOIN med USING (g)),
h AS (SELECT d, count(*)::BIGINT AS t FROM dev GROUP BY d),
dr AS (
  SELECT d, t,
         2 * (sum(t) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) - t) + t + 1 AS dd
  FROM h),
tot AS (
  SELECT sum(t)::BIGINT AS n,
         sum(CAST(t AS HUGEINT) * dd * dd) AS sd2,
         sum(CAST(t AS HUGEINT) * dd * dd * dd * dd) AS sd4
  FROM dr),
grp AS (
  SELECT sum(CASE WHEN dev.g = 'click' THEN 1 ELSE 0 END)::BIGINT
           AS n1,
         count(*)::BIGINT AS nn,
         sum(CASE WHEN dev.g = 'click'
                  THEN CAST(dr.dd AS HUGEINT) * dr.dd
                  ELSE 0 END) AS t_stat
  FROM dev JOIN dr ON dev.d = dr.d)
SELECT grp.n1 AS n1, (grp.nn - grp.n1)::BIGINT AS n2,
       CAST(grp.t_stat AS BIGINT) AS t_d2,
       round((CAST(grp.t_stat AS DOUBLE)
              - CAST(grp.n1 AS DOUBLE) * CAST(tot.sd2 AS DOUBLE)
                / CAST(tot.n AS DOUBLE))
             / sqrt(CAST(grp.n1 AS DOUBLE)
                    * CAST(grp.nn - grp.n1 AS DOUBLE)
                    * CAST(tot.n * tot.sd4 - tot.sd2 * tot.sd2
                           AS DOUBLE)
                    / (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)
                       * CAST(tot.n - 1 AS DOUBLE))), 6) AS z6
FROM grp CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# Cuzick trend test
# ---------------------------------------------------------------------------


def q_cuzick_trend_priority(sf_dir: str):
    """Cuzick's trend test across priority scores — docstring above."""
    h = _cents_hist(sf_dir, "orders", "o_orderpriority",
                    "o_totalprice")
    h = h.assign(l=h["g"].str.slice(0, 1).astype(np.int64))
    comb = h.groupby("c")["n"].sum().sort_index()
    cv = comb.index.to_numpy(np.int64)
    tv = comb.to_numpy(np.int64)
    cl = np.cumsum(tv) - tv
    D = 2 * cl + tv + 1
    dmap = dict(zip(cv.tolist(), D.tolist()))
    N = int(tv.sum())
    t_stat = sum(int(n_) * int(l_) * int(dmap[int(c_)])
                 for c_, l_, n_ in zip(h["c"].tolist(), h["l"].tolist(),
                                       h["n"].tolist()))
    sl = int((h["l"] * h["n"]).sum())
    sll = int((h["l"] * h["l"] * h["n"]).sum())
    e = (N + 1) * sl
    sb = sum(int(t_) * int(dmap[int(c_)]) ** 2
             for c_, t_ in zip(cv.tolist(), tv.tolist())) \
        - N * (N + 1) ** 2
    sa = float(N * sll - sl * sl) / float(N)
    var = sa * float(sb) / float(N - 1)
    z = float(t_stat - e) / var**0.5
    out = pd.DataFrame({"n": [N], "t_d": [t_stat], "e_d": [e],
                        "z6": [_round6(np.array([z]))[0]]})
    for col in ("n", "t_d", "e_d"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CUZICK_TREND = """
WITH r AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS l,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders),
h AS (SELECT c, count(*)::BIGINT AS t FROM r GROUP BY c),
dr AS (
  SELECT c, t,
         2 * (sum(t) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) - t) + t + 1 AS dd
  FROM h),
tot AS (
  SELECT sum(t)::BIGINT AS n,
         sum(CAST(t AS HUGEINT) * dd * dd) AS sq
  FROM dr),
j AS (
  SELECT sum(CAST(r.l AS HUGEINT) * dr.dd) AS t_stat,
         sum(r.l)::BIGINT AS sl,
         sum(r.l * r.l)::BIGINT AS sll
  FROM r JOIN dr ON r.c = dr.c),
f AS (
  SELECT tot.n AS n, CAST(j.t_stat AS BIGINT) AS t_d,
         (tot.n + 1) * j.sl AS e_d,
         CAST(tot.n * j.sll - CAST(j.sl AS HUGEINT) * j.sl AS DOUBLE)
           / CAST(tot.n AS DOUBLE) AS sa,
         CAST(tot.sq - CAST(tot.n AS HUGEINT) * (tot.n + 1)
              * (tot.n + 1) AS DOUBLE) AS sb
  FROM tot CROSS JOIN j)
SELECT n, t_d, e_d::BIGINT AS e_d,
       round(CAST(t_d - e_d AS DOUBLE)
             / sqrt(sa * sb / CAST(n - 1 AS DOUBLE)), 6) AS z6
FROM f
"""


QUERIES141: dict[str, tuple] = {
    "hotelling_t2_click_view": (q_hotelling_t2_click_view,
                                SQL_HOTELLING_T2),
    "conover_scale_click_view": (q_conover_scale_click_view,
                                 SQL_CONOVER_SCALE),
    "cuzick_trend_priority": (q_cuzick_trend_priority,
                              SQL_CUZICK_TREND),
}
