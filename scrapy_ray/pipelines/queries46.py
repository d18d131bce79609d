"""Forty-sixth oracle-query batch — count overdispersion / inequality
deciles / sequential testing:

- fano_overdispersion_by_type: Fano factor (variance-to-mean ratio of
  DAILY counts) and the chi-square index of dispersion per event type,
  over the full day x type grid (absent cells count 0 — cross join,
  not inner). Both statistics finalize identical-expression from three
  exact integers per type (n, S1, S2): Fano = (n*S2-S1^2)/(n*S1),
  D = (n*S2-S1^2)/S1. Fano = 1 is Poisson; the synthetic stream reads
  0.8-1.7 across types (probed — non-degenerate).
- lorenz_decile_shares: the Lorenz curve as exact decile rows —
  customers ranked by revenue (ntile(10) over (revenue, custkey); the
  full ORDER BY key makes tie assignment deterministic, CLAUDE.md
  cumsum rule), per-decile exact cent sums, cumulative cents, and
  share/cumulative-share of total. Per-customer totals reduce inside
  custkey-salted partitions; the driver only sorts the O(customers)
  aggregated intermediate (the same reduced-cells shape the DP/edit-
  distance queries collect; scale path = distributed sort + two-pass
  rank offsets, documented).
- sprt_conversion_days: Wald's sequential probability ratio test
  trajectory for the daily purchase-conversion rate, H0 p=0.18 vs
  H1 p=0.22, alpha=beta=0.05. The log-likelihood-ratio increments
  ln(p1/p0), ln((1-p1)/(1-p0)) and the decision boundary ln(19) are
  EMBEDDED 1e-12-unit integer literals (identical in Ray and SQL), so
  llr_t = k_t*L1U + (n_t-k_t)*L0U and the boundary comparison are
  exact integer arithmetic — zero float-accumulation risk; only the
  display column divides once by 1e12. Cumulative (n_t, k_t) come
  from integer day-cell sums ordered by the unique day key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents_np, _pq
from scrapy_ray.pipelines.queries8 import _round6

_P = 64
_US_PER_DAY = 86_400_000_000
# SPRT literals: round(ln(.22/.18)*1e12), round(ln(.78/.82)*1e12),
# round(ln(19)*1e12)  (alpha = beta = 0.05 -> A = ln((1-b)/a) = ln 19)
_L1U = 200670695462
_L0U = -50010420575
_AU = 2944438979166


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# Fano factor / index of dispersion
# ---------------------------------------------------------------------------


def q_fano_overdispersion_by_type(sf_dir: str):
    """Fano factor + dispersion index of daily counts per event type
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "day": day, "c": np.int64(1)})
        g = df.groupby(["event_type", "day"], sort=False)["c"] \
            .sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby(["event_type", "day"])
               .aggregate(Sum("c", alias_name="c"))
               .to_pandas())
    days = np.sort(cells["day"].unique())
    piv = cells.pivot_table(index="event_type", columns="day", values="c",
                            aggfunc="sum", fill_value=0) \
        .reindex(columns=days, fill_value=0).sort_index()
    v = piv.to_numpy(np.int64)
    n = int(v.shape[1])
    s1 = v.sum(1)
    s2 = (v * v).sum(1)
    num = (n * s2 - s1 * s1).astype(np.float64)
    fano6 = _round6(num / (np.float64(n) * s1.astype(np.float64)))
    disp6 = _round6(num / s1.astype(np.float64))
    out = pd.DataFrame({"event_type": piv.index.to_numpy(object),
                        "n_days": np.int64(n),
                        "total": s1.astype(np.int64),
                        "sum_sq": s2.astype(np.int64),
                        "fano6": fano6, "disp6": disp6})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_FANO = f"""
WITH dc AS (
  SELECT event_type,
         CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
days AS (SELECT DISTINCT day FROM dc),
types AS (SELECT DISTINCT event_type FROM dc),
grid AS (
  SELECT t.event_type, d.day, coalesce(dc.c, 0)::BIGINT AS c
  FROM types t CROSS JOIN days d
  LEFT JOIN dc ON dc.event_type = t.event_type AND dc.day = d.day),
s AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS s1,
         sum(c * c)::BIGINT AS s2
  FROM grid GROUP BY 1)
SELECT event_type, n AS n_days, s1 AS total, s2 AS sum_sq,
       round(CAST(n * s2 - s1 * s1 AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE)), 6) AS fano6,
       round(CAST(n * s2 - s1 * s1 AS DOUBLE)
             / CAST(s1 AS DOUBLE), 6) AS disp6
FROM s ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Lorenz decile shares
# ---------------------------------------------------------------------------


def q_lorenz_decile_shares(sf_dir: str):
    """Exact Lorenz-curve decile table of customer revenue (docstring
    above)."""
    ds = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def cpart(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = _cents_np(t["o_totalprice"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"custkey": k, "c": c})
        g = df.groupby("custkey", sort=False)["c"].sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        g["gkey"] = (g["custkey"] % _P).astype(np.int32)
        return _strip(g)

    def spart(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("custkey", sort=False)["c"].sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g[["custkey", "c"]]

    cr = (ds.map_batches(cpart, batch_format="pyarrow")
            .groupby("gkey").map_groups(spart, batch_format="pandas")
            .to_pandas())
    cr = cr.sort_values(["c", "custkey"], kind="mergesort") \
        .reset_index(drop=True)
    ncust = len(cr)
    # ntile(10): first (n mod 10) buckets get ceil(n/10) rows
    base, extra = divmod(ncust, 10)
    sizes = np.full(10, base, np.int64)
    sizes[:extra] += 1
    dec = np.repeat(np.arange(1, 11, dtype=np.int64), sizes)
    c = cr["c"].to_numpy(np.int64)
    df = pd.DataFrame({"decile": dec, "c": c})
    g = df.groupby("decile")["c"].agg(["count", "sum"]).reset_index()
    cents = g["sum"].to_numpy(np.int64)
    cum = np.cumsum([int(x) for x in cents])
    tot = float(int(cum[-1]))
    out = pd.DataFrame({
        "decile": g["decile"].astype(np.int64),
        "n_cust": g["count"].astype(np.int64),
        "cents": cents,
        "cum_cents": np.asarray(cum, np.int64),
        "share6": _round6(cents.astype(np.float64) / tot),
        "cum_share6": _round6(np.asarray(cum, np.float64) / tot)})
    return out


SQL_LORENZ = """
WITH cr AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d AS (
  SELECT c, ntile(10) OVER (ORDER BY c, o_custkey) AS decile FROM cr),
g AS (
  SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n_cust,
         sum(c)::BIGINT AS cents
  FROM d GROUP BY 1),
w AS (
  SELECT decile, n_cust, cents,
         sum(cents) OVER (ORDER BY decile)::BIGINT AS cum_cents,
         sum(cents) OVER ()::BIGINT AS tot
  FROM g)
SELECT decile, n_cust, cents, cum_cents,
       round(CAST(cents AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share6,
       round(CAST(cum_cents AS DOUBLE) / CAST(tot AS DOUBLE), 6)
         AS cum_share6
FROM w ORDER BY decile
"""


# ---------------------------------------------------------------------------
# SPRT trajectory
# ---------------------------------------------------------------------------


def q_sprt_conversion_days(sf_dir: str):
    """Wald SPRT trajectory of the daily purchase rate (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        k = (np.asarray(t["event_type"].to_pylist(), object)
             == "purchase").astype(np.int64)
        df = pd.DataFrame({"day": day, "n": np.int64(1), "k": k})
        g = df.groupby("day", sort=False)[["n", "k"]].sum().reset_index()
        for col in ("n", "k"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(dpart, batch_format="pyarrow")
               .groupby("day")
               .aggregate(Sum("n", alias_name="n"),
                          Sum("k", alias_name="k"))
               .to_pandas()).sort_values("day").reset_index(drop=True)
    n_cum = np.cumsum([int(x) for x in cells["n"]])
    k_cum = np.cumsum([int(x) for x in cells["k"]])
    units = np.array([int(k) * _L1U + (int(n) - int(k)) * _L0U
                      for n, k in zip(n_cum, k_cum)], np.int64)
    state = np.where(units >= _AU, "accept_h1",
                     np.where(units <= -_AU, "accept_h0", "continue"))
    out = pd.DataFrame({
        "day": cells["day"].to_numpy(np.int64),
        "n": cells["n"].to_numpy(np.int64),
        "k": cells["k"].to_numpy(np.int64),
        "n_cum": np.asarray(n_cum, np.int64),
        "k_cum": np.asarray(k_cum, np.int64),
        "llr_units": units,
        "llr6": _round6(units.astype(np.float64) / 1e12),
        "state": state.astype(object)})
    return out


SQL_SPRT = f"""
WITH dk AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         count(*)::BIGINT AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
           AS k
  FROM events GROUP BY 1),
c AS (
  SELECT day, n, k,
         sum(n) OVER (ORDER BY day)::BIGINT AS n_cum,
         sum(k) OVER (ORDER BY day)::BIGINT AS k_cum
  FROM dk),
u AS (
  SELECT day, n, k, n_cum, k_cum,
         (k_cum * {_L1U} + (n_cum - k_cum) * ({_L0U}))::BIGINT
           AS llr_units
  FROM c)
SELECT day, n, k, n_cum, k_cum, llr_units,
       round(CAST(llr_units AS DOUBLE) / 1000000000000.0, 6) AS llr6,
       CASE WHEN llr_units >= {_AU} THEN 'accept_h1'
            WHEN llr_units <= -{_AU} THEN 'accept_h0'
            ELSE 'continue' END AS state
FROM u ORDER BY day
"""


QUERIES46: dict[str, tuple] = {
    "fano_overdispersion_by_type": (q_fano_overdispersion_by_type,
                                    SQL_FANO),
    "lorenz_decile_shares": (q_lorenz_decile_shares, SQL_LORENZ),
    "sprt_conversion_days": (q_sprt_conversion_days, SQL_SPRT),
}
