"""Sixtieth oracle-query batch — histogram-based outlier scoring /
nonparametric changepoint / robust trimmed-mean testing:

- hbos_order_outliers: HBOS (Histogram-Based Outlier Score, Goldstein &
  Dengel 2012) over three order features — $500 price bucket,
  day-of-week ((epoch_days+3)%7, the seasonal_dow convention) and order
  priority.  Feature histograms are exact counts off one tiny
  (feature, bin) partial aggregate; each order's score
  Σ_f ln(N/cnt_f) is quantized PER FEATURE to 1e-9 units (terms ≥ 0,
  zipf ln-parity) so the total is an exact int64 and the top-20 ranking
  (score desc, orderkey asc) cannot flip on float association.  The
  scoring pass is stateless with the ≤1.1k-entry histograms broadcast;
  per-block partial top-20, driver merges O(blocks×20).
- pettitt_changepoint_daily: Pettitt's nonparametric changepoint test
  on daily kilodollar revenue.  The textbook U_t = Σ_{i≤t,j>t}
  sgn(y_j−y_i) collapses to the prefix sum of W_i = #{y_j>y_i} −
  #{y_j<y_i} (within-prefix pairs cancel by antisymmetry), so both
  sides run in O(days) off the value rank decomposition — no O(n²)
  pair join.  K = max|U_t| and the changepoint day are exact integers;
  the significance exponent λ = 6K²/(n³+n²) finalizes
  identical-expression (exp() deliberately avoided — libm parity).
- yuen_trimmed_ttest: Yuen's 20%-trimmed-mean t-test of click vs
  purchase event value.  Trimmed sums, winsorized sums and winsorized
  sums-of-squares are EXACT integers off one (group, cent) histogram
  (ks_test machinery): window overlap counts min/max arithmetic on the
  cumulative histogram, boundary order statistics by the quantile_disc
  rank walk, tails replaced at g = n//5 per side.  n·SSw − Wsum² rides
  Python int / HUGEINT; t and the Welch–Satterthwaite df finalize
  identical-expression.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000
_LN_SCALE = 10**9


# ---------------------------------------------------------------------------
# HBOS outliers
# ---------------------------------------------------------------------------


def _hbos_bins(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    p = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
    cents = (np.sign(p * 100.0)
             * np.floor(np.abs(p * 100.0) + 0.5)).astype(np.int64)
    pb = cents // 50000
    day = (t["o_orderdate"].cast(pa.int64())
           .to_numpy(zero_copy_only=False) // _US_PER_DAY)
    dow = (day + 3) % 7
    pr = np.asarray(t["o_orderpriority"].to_pylist())
    return pb, dow, pr


def q_hbos_order_outliers(sf_dir: str):
    """Top-20 HBOS outlier orders over (price bucket, dow, priority)
    histograms (docstring above)."""
    cols = ["o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority"]
    ds = _pq(sf_dir, "orders", cols)

    def hpart(t: pa.Table) -> pa.Table:
        pb, dow, pr = _hbos_bins(t)
        frames = [
            pd.DataFrame({"f": np.int64(0), "b": pb.astype(str)}),
            pd.DataFrame({"f": np.int64(1), "b": dow.astype(str)}),
            pd.DataFrame({"f": np.int64(2), "b": pr}),
        ]
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby(["f", "b"], sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby(["f", "b"]).aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    n = int(cells.loc[cells["f"] == 0, "cnt"].sum())

    def _units(cnt: np.ndarray) -> np.ndarray:
        ln = np.log(float(n) / cnt.astype(np.float64))
        return np.floor(ln * _LN_SCALE + 0.5).astype(np.int64)

    lut = []
    for fi in (0, 1):                       # integer-binned features
        sub = cells[cells["f"] == fi]
        keys = sub["b"].to_numpy().astype(np.int64)
        order = np.argsort(keys)
        lut.append((keys[order],
                    _units(sub["cnt"].to_numpy(np.int64)[order])))
    sub = cells[cells["f"] == 2]
    lut.append({b: int(u) for b, u in
                zip(sub["b"], _units(sub["cnt"].to_numpy(np.int64)))})
    import ray
    lut_ref = ray.put(lut)

    def score(t: pa.Table) -> pa.Table:
        lu = ray.get(lut_ref)
        pb, dow, pr = _hbos_bins(t)
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        su = (lu[0][1][np.searchsorted(lu[0][0], pb)]
              + lu[1][1][np.searchsorted(lu[1][0], dow)]
              + pd.Series(pr).map(lu[2]).to_numpy(np.int64))
        df = pd.DataFrame({"o_orderkey": key, "su": su})
        df = df.sort_values(["su", "o_orderkey"],
                            ascending=[False, True]).head(20)
        return _strip(df)

    parts = (ds.map_batches(score, batch_format="pyarrow")
               .to_pandas())
    out = (parts.sort_values(["su", "o_orderkey"],
                             ascending=[False, True]).head(20)
           .reset_index(drop=True))
    for col in ("o_orderkey", "su"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HBOS = f"""
WITH b AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) // 50000 AS pb,
         (CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) + 3) % 7
           AS dow,
         o_orderpriority AS pr
  FROM orders),
tot AS (SELECT count(*)::BIGINT AS n FROM b),
h1 AS (SELECT pb, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
h2 AS (SELECT dow, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
h3 AS (SELECT pr, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
s AS (
  SELECT b.o_orderkey,
         CAST(round(ln(CAST(tot.n AS DOUBLE) / CAST(h1.cnt AS DOUBLE))
                    * {_LN_SCALE}.0) AS BIGINT)
         + CAST(round(ln(CAST(tot.n AS DOUBLE) / CAST(h2.cnt AS DOUBLE))
                      * {_LN_SCALE}.0) AS BIGINT)
         + CAST(round(ln(CAST(tot.n AS DOUBLE) / CAST(h3.cnt AS DOUBLE))
                      * {_LN_SCALE}.0) AS BIGINT) AS su
  FROM b JOIN h1 USING (pb) JOIN h2 USING (dow) JOIN h3 USING (pr), tot)
SELECT o_orderkey, su FROM s ORDER BY su DESC, o_orderkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# Pettitt changepoint
# ---------------------------------------------------------------------------


def q_pettitt_changepoint_daily(sf_dir: str):
    """Pettitt changepoint K, day and significance exponent on daily
    kilodollar revenue (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    y = (np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)) \
        .astype(np.int64)
    days = cells["day"].to_numpy(np.int64)
    n = len(y)
    vals, cnt = np.unique(y, return_counts=True)
    cum = np.cumsum(cnt)
    pos = np.searchsorted(vals, y)
    less = np.where(pos > 0, cum[pos - 1], 0)
    greater = n - cum[pos]
    w = greater - less
    u = np.cumsum(w)[:-1]                 # U_t for t = 1..n-1
    kmax = int(np.max(np.abs(u)))
    tstar = int(days[int(np.argmax(np.abs(u)))])
    nf = float(n)
    lam = (6.0 * float(kmax) * float(kmax)
           / (nf * nf * nf + nf * nf))
    out = pd.DataFrame({"n": [n], "kmax": [kmax], "tstar": [tstar],
                        "lam6": [_round6(np.array([lam]))[0]]})
    for col in ("n", "kmax", "tstar"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PETTITT = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d0 AS (SELECT day, CAST(round(c / 100000.0) AS BIGINT) AS y FROM dc),
st AS (SELECT count(*)::BIGINT AS n FROM d0),
rk AS (
  SELECT day,
         (count(*) OVER () - count(*) OVER (ORDER BY y))::BIGINT AS gt,
         (count(*) OVER (ORDER BY y)
          - count(*) OVER (PARTITION BY y))::BIGINT AS lt
  FROM d0),
ww AS (SELECT day, gt - lt AS w FROM rk),
u AS (SELECT day, sum(w) OVER (ORDER BY day)::BIGINT AS ut FROM ww),
uu AS (SELECT day, ut FROM u WHERE day < (SELECT max(day) FROM u)),
k AS (SELECT max(abs(ut))::BIGINT AS kmax FROM uu),
t0 AS (SELECT min(day) AS tstar FROM uu, k WHERE abs(ut) = kmax)
SELECT n, kmax, tstar,
       round(6.0 * CAST(kmax AS DOUBLE) * CAST(kmax AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS lam6
FROM st, k, t0
"""


# ---------------------------------------------------------------------------
# Yuen trimmed t-test
# ---------------------------------------------------------------------------


def q_yuen_trimmed_ttest(sf_dir: str):
    """Yuen 20%-trimmed t-test of click vs purchase value from one
    (group, cent) histogram (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def hpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        keep = (et == "click") | (et == "purchase")
        if not keep.any():
            return pa.table({"g": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64())})
        g = (et[keep] == "purchase").astype(np.int64)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)[keep]
        df = pd.DataFrame({"g": g, "c": c})
        out = df.groupby(["g", "c"], sort=False).size().reset_index(name="m")
        out["m"] = out["m"].astype(np.int64)
        return _strip(out)

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby(["g", "c"]).aggregate(Sum("m", alias_name="m"))
               .to_pandas())
    stats = {}
    for gi in (0, 1):
        sub = cells[cells["g"] == gi].sort_values("c")
        v = sub["c"].to_numpy(np.int64)
        m = sub["m"].to_numpy(np.int64)
        cum = np.cumsum(m)
        n = int(cum[-1])
        tr = n // 5
        lo, hi = tr + 1, n - tr
        start = cum - m + 1
        inw = np.maximum(
            0, np.minimum(cum, hi) - np.maximum(start, lo) + 1)
        vlo = int(v[np.searchsorted(cum, lo)])
        vhi = int(v[np.searchsorted(cum, hi)])
        tsum = int((inw * v).sum())
        tss = sum(int(a) * int(b) * int(b) for a, b in zip(inw, v))
        wsum = tsum + tr * (vlo + vhi)
        wss = tss + tr * (vlo * vlo + vhi * vhi)
        h = n - 2 * tr
        a2 = n * wss - wsum * wsum            # exact (Python int)
        d = float(a2) / (float(n) * float(h) * float(h - 1))
        tm = float(tsum) / float(h)
        stats[gi] = (n, tr, h, vlo, vhi, tm, d)
    n1, tr1, h1, vlo1, vhi1, tm1, d1 = stats[0]
    n2, tr2, h2, vlo2, vhi2, tm2, d2 = stats[1]
    tstat = (tm1 - tm2) / math.sqrt(d1 + d2)
    df_w = ((d1 + d2) * (d1 + d2)
            / (d1 * d1 / float(h1 - 1) + d2 * d2 / float(h2 - 1)))
    r6 = _round6(np.array([tm1, tm2, tstat, df_w]))
    out = pd.DataFrame({"n1": [n1], "n2": [n2], "h1": [h1], "h2": [h2],
                        "tm1_6": [r6[0]], "tm2_6": [r6[1]],
                        "t6": [r6[2]], "df6": [r6[3]]})
    for col in ("n1", "n2", "h1", "h2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_YUEN = """
WITH e AS (
  SELECT CAST(event_type = 'purchase' AS INT) AS g,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'purchase')),
cells AS (SELECT g, c, count(*)::BIGINT AS m FROM e GROUP BY 1, 2),
w AS (
  SELECT g, c, m,
         sum(m) OVER (PARTITION BY g ORDER BY c) AS cum,
         sum(m) OVER (PARTITION BY g) AS n
  FROM cells),
p AS (
  SELECT *, n // 5 AS tr,
         GREATEST(0, LEAST(cum, n - (n // 5))
                     - GREATEST(cum - m + 1, (n // 5) + 1) + 1) AS inw
  FROM w),
os AS (
  SELECT g, min(n)::HUGEINT AS n, min(tr)::HUGEINT AS tr,
         min(CASE WHEN cum >= tr + 1 THEN c END)::HUGEINT AS vlo,
         min(CASE WHEN cum >= n - tr THEN c END)::HUGEINT AS vhi,
         sum(inw * c)::HUGEINT AS tsum,
         sum(inw::HUGEINT * c * c) AS tss
  FROM p GROUP BY g),
f AS (
  SELECT g, n, tr, n - 2 * tr AS h,
         tsum + tr * (vlo + vhi) AS wsum,
         tss + tr * (vlo * vlo + vhi * vhi) AS wss, tsum
  FROM os),
d AS (
  SELECT g, n, h,
         CAST(tsum AS DOUBLE) / CAST(h AS DOUBLE) AS tm,
         CAST(n * wss - wsum * wsum AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(h AS DOUBLE)
              * CAST(h - 1 AS DOUBLE)) AS dv
  FROM f)
SELECT a.n::BIGINT AS n1, b.n::BIGINT AS n2,
       a.h::BIGINT AS h1, b.h::BIGINT AS h2,
       round(a.tm, 6) AS tm1_6, round(b.tm, 6) AS tm2_6,
       round((a.tm - b.tm) / sqrt(a.dv + b.dv), 6) AS t6,
       round((a.dv + b.dv) * (a.dv + b.dv)
             / (a.dv * a.dv / CAST(a.h - 1 AS DOUBLE)
                + b.dv * b.dv / CAST(b.h - 1 AS DOUBLE)), 6) AS df6
FROM d a, d b WHERE a.g = 0 AND b.g = 1
"""


QUERIES60: dict[str, tuple] = {
    "hbos_order_outliers": (q_hbos_order_outliers, SQL_HBOS),
    "pettitt_changepoint_daily": (q_pettitt_changepoint_daily, SQL_PETTITT),
    "yuen_trimmed_ttest": (q_yuen_trimmed_ttest, SQL_YUEN),
}
