"""Fifty-fourth oracle-query batch — reliability / HAC variance / 2x2
association:

- icc_value_by_user: one-way random-effects intraclass correlation
  ICC(1) of event value within users (are a user's event values more
  alike than strangers'?). Per-user exact (n, S1) moments stay inside
  user-salted partitions — each emits ONE row of quantized
  S1^2/n between-terms (the ANOVA idiom at user cardinality, the HHI
  zero-driver-state discipline) plus exact n and n^2 sums; SS2 is one
  global exact sum. MSB, MSW, the unbalanced-design group size
  k0 = (N - sum n_g^2/N)/(G-1) and ICC finalize identical-expression.
- neweywest_daily_revenue: Newey-West (Bartlett, L=7) long-run
  variance of daily kilodollar revenue. With d_t = n*y_t - S exact
  (the Ljung-Box centering), every lag autocovariance numerator g_k is
  exact, and lrv = [(L+1)*g0 + 2*sum_k (L+1-k)*g_k] / ((L+1)*n^3) is
  ONE float of two exact integers (numerator ~2e20 -> Python
  int/HUGEINT); the lrv/gamma0 inflation ratio rides the same ints.
- odds_ratio_click_purchase_daily: 2x2 association of "clicked" vs
  "purchased" per (user, day) over user-days with ANY event (the full
  grid, unlike mcnemar's discordant-only view): exact cells, odds
  ratio, Woolf SE = sqrt(1/a+1/b+1/c+1/d) and z = lnOR/SE — ln on an
  exact-integer ratio (zipf ln-parity precedent), no exp anywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents

_US_PER_DAY = 86_400_000_000
_ICC_SCALE = 100         # 1e-2 cents² units (ANOVA convention)
_NW_LAGS = 7


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# ICC(1)
# ---------------------------------------------------------------------------


def q_icc_value_by_user(sf_dir: str):
    """One-way random-effects ICC(1) of event value within users
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "value"])

    def cell_partial(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uid = (t["user_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64))
        df = pd.DataFrame({"user_id": uid, "n": np.int64(1), "s1": c,
                           "s2": c * c})
        g = df.groupby("user_id", sort=False).sum().reset_index()
        for col in ("n", "s1", "s2"):
            g[col] = g[col].astype(np.int64)
        g["salt"] = (g["user_id"] % 64).astype(np.int64)
        return _strip(g)

    def reduce_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False)[["n", "s1", "s2"]] \
              .sum().reset_index()
        n = g["n"].to_numpy(np.int64)
        s1 = g["s1"].to_numpy(np.int64)
        term = (s1.astype(np.float64) * s1.astype(np.float64)
                / n.astype(np.float64)) * np.float64(_ICC_SCALE)
        t_units = np.floor(term + 0.5).astype(np.int64)
        out = pd.DataFrame({
            "gg": [np.int64(len(g))],
            "nn": [np.int64(n.sum())],
            "n2": [np.int64((n * n).sum())],
            "s": [np.int64(s1.sum())],
            "ss2": [np.int64(g["s2"].to_numpy(np.int64).sum())],
            "tu": [np.int64(t_units.sum())]})
        return out

    parts = (ds.map_batches(cell_partial, batch_format="pyarrow")
               .groupby("salt")
               .map_groups(reduce_partition, batch_format="pandas")
               .to_pandas())
    gg = int(parts["gg"].sum())
    nn = int(parts["nn"].sum())
    n2 = int(parts["n2"].sum())
    s = int(parts["s"].sum())
    ss2 = int(parts["ss2"].sum())
    tu = int(parts["tu"].sum())
    g_units = int(np.floor(
        (np.float64(s) * np.float64(s) / np.float64(nn))
        * np.float64(_ICC_SCALE) + 0.5))
    msb = ((float(tu - g_units) / float(_ICC_SCALE)) / float(gg - 1))
    msw = ((float(ss2) - float(tu) / float(_ICC_SCALE))
           / float(nn - gg))
    k0 = ((float(nn) - float(n2) / float(nn)) / float(gg - 1))
    icc = (msb - msw) / (msb + (k0 - 1.0) * msw)
    r6 = _round6(np.array([msb, msw, k0, icc]))
    out = pd.DataFrame({"n_events": [nn], "g_users": [gg], "n2sum": [n2],
                        "msb6": [r6[0]], "msw6": [r6[1]], "k0_6": [r6[2]],
                        "icc6": [r6[3]]})
    for col in ("n_events", "g_users", "n2sum"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ICC = f"""
WITH e AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c FROM events),
g AS (
  SELECT user_id, count(*)::BIGINT AS n, sum(c)::BIGINT AS s1,
         sum(c * c)::BIGINT AS s2,
         CAST(round((CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE)) * {_ICC_SCALE})
              AS BIGINT) AS tu
  FROM e GROUP BY 1),
tot AS (
  SELECT count(*)::BIGINT AS gg, sum(n)::BIGINT AS nn,
         sum(n * n)::BIGINT AS n2, sum(s1)::BIGINT AS s,
         sum(s2)::BIGINT AS ss2, sum(tu)::BIGINT AS tu
  FROM g),
fin AS (
  SELECT gg, nn, n2, ss2, tu,
         CAST(round((CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(nn AS DOUBLE)) * {_ICC_SCALE})
              AS BIGINT) AS g_units
  FROM tot),
f AS (
  SELECT gg, nn, n2,
         (CAST(tu - g_units AS DOUBLE) / {_ICC_SCALE}.0)
           / CAST(gg - 1 AS DOUBLE) AS msb,
         (CAST(ss2 AS DOUBLE) - CAST(tu AS DOUBLE) / {_ICC_SCALE}.0)
           / CAST(nn - gg AS DOUBLE) AS msw,
         (CAST(nn AS DOUBLE) - CAST(n2 AS DOUBLE) / CAST(nn AS DOUBLE))
           / CAST(gg - 1 AS DOUBLE) AS k0
  FROM fin)
SELECT nn AS n_events, gg AS g_users, n2 AS n2sum,
       round(msb, 6) AS msb6, round(msw, 6) AS msw6,
       round(k0, 6) AS k0_6,
       round((msb - msw) / (msb + (k0 - 1.0) * msw), 6) AS icc6
FROM f
"""


# ---------------------------------------------------------------------------
# Newey-West
# ---------------------------------------------------------------------------


def q_neweywest_daily_revenue(sf_dir: str):
    """Newey-West (Bartlett, L=7) long-run variance of daily kilodollar
    revenue (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    yv = np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)
    y = [int(v) for v in yv]
    n = len(y)
    s = sum(y)
    d = [n * v - s for v in y]
    g0 = sum(v * v for v in d)
    gs = [sum(d[t] * d[t - k] for t in range(k, n))
          for k in range(1, _NW_LAGS + 1)]
    ll = _NW_LAGS
    num = (ll + 1) * g0 + 2 * sum((ll + 1 - k) * g
                                  for k, g in enumerate(gs, start=1))
    den = (ll + 1) * n * n * n
    lrv = float(num) / float(den)
    g0f = float(g0) / float(n * n * n)
    r6 = _round6(np.array([lrv, lrv / g0f]))
    out = pd.DataFrame({"n_days": [n], "l_lags": [ll],
                        "lrv6": [r6[0]], "ratio6": [r6[1]]})
    for col in ("n_days", "l_lags"):
        out[col] = out[col].astype(np.int64)
    return out


_NW_LAG_COLS = ",\n         ".join(
    f"lag(d, {k}) OVER (ORDER BY i) AS d{k}"
    for k in range(1, _NW_LAGS + 1))
_NW_G_COLS = ",\n         ".join(
    f"sum(d * d{k}) AS g{k}" for k in range(1, _NW_LAGS + 1))
_NW_NUM = " + ".join(
    f"2 * {_NW_LAGS + 1 - k} * g{k}" for k in range(1, _NW_LAGS + 1))

SQL_NW = f"""
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
  SELECT d,
         {_NW_LAG_COLS}
  FROM dd),
g AS (
  SELECT sum(d * d) AS g0,
         {_NW_G_COLS}
  FROM lg),
f AS (
  SELECT st.n,
         ({_NW_LAGS + 1} * g.g0 + {_NW_NUM}) AS num,
         ({_NW_LAGS + 1} * st.n * st.n * st.n) AS den,
         g.g0
  FROM st, g)
SELECT n::BIGINT AS n_days, {_NW_LAGS} AS l_lags,
       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS lrv6,
       round((CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
             / (CAST(g0 AS DOUBLE) / CAST(n * n * n AS DOUBLE)), 6)
         AS ratio6
FROM f
"""


# ---------------------------------------------------------------------------
# odds ratio
# ---------------------------------------------------------------------------


def q_odds_ratio_click_purchase_daily(sf_dir: str):
    """2x2 odds ratio + Woolf SE over (user, day) click/purchase flags
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def flag_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        uid = (t["user_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64))
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        df = pd.DataFrame({"user_id": uid, "day": day,
                           "hc": (et == "click").astype(np.int64),
                           "hp": (et == "purchase").astype(np.int64)})
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
    n11 = cnt.get((1, 1), 0)
    n10 = cnt.get((1, 0), 0)
    n01 = cnt.get((0, 1), 0)
    n00 = cnt.get((0, 0), 0)
    lnor = math.log(float(n11 * n00) / float(n10 * n01))
    se = math.sqrt(1.0 / float(n11) + 1.0 / float(n10)
                   + 1.0 / float(n01) + 1.0 / float(n00))
    r6 = _round6(np.array([float(n11 * n00) / float(n10 * n01),
                           lnor, se, lnor / se]))
    out = pd.DataFrame({"n11": [n11], "n10": [n10], "n01": [n01],
                        "n00": [n00], "or6": [r6[0]], "lnor6": [r6[1]],
                        "se6": [r6[2]], "z6": [r6[3]]})
    for col in ("n11", "n10", "n01", "n00"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ODDS = f"""
WITH u AS (
  SELECT user_id, CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
  FROM events GROUP BY 1, 2),
cells AS (
  SELECT sum(CASE WHEN hc = 1 AND hp = 1 THEN 1 ELSE 0 END)::BIGINT
           AS n11,
         sum(CASE WHEN hc = 1 AND hp = 0 THEN 1 ELSE 0 END)::BIGINT
           AS n10,
         sum(CASE WHEN hc = 0 AND hp = 1 THEN 1 ELSE 0 END)::BIGINT
           AS n01,
         sum(CASE WHEN hc = 0 AND hp = 0 THEN 1 ELSE 0 END)::BIGINT
           AS n00
  FROM u),
f AS (
  SELECT n11, n10, n01, n00,
         ln(CAST(n11 * n00 AS DOUBLE) / CAST(n10 * n01 AS DOUBLE))
           AS lnor,
         sqrt(1.0 / CAST(n11 AS DOUBLE) + 1.0 / CAST(n10 AS DOUBLE)
              + 1.0 / CAST(n01 AS DOUBLE) + 1.0 / CAST(n00 AS DOUBLE))
           AS se
  FROM cells)
SELECT n11, n10, n01, n00,
       round(CAST(n11 * n00 AS DOUBLE) / CAST(n10 * n01 AS DOUBLE), 6)
         AS or6,
       round(lnor, 6) AS lnor6, round(se, 6) AS se6,
       round(lnor / se, 6) AS z6
FROM f
"""


QUERIES54: dict[str, tuple] = {
    "icc_value_by_user": (q_icc_value_by_user, SQL_ICC),
    "neweywest_daily_revenue": (q_neweywest_daily_revenue, SQL_NW),
    "odds_ratio_click_purchase_daily": (q_odds_ratio_click_purchase_daily,
                                        SQL_ODDS),
}
