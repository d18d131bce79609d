"""Forty-fifth oracle-query batch — normality testing / corpus-
linguistic dispersion / market concentration:

- jarque_bera_value: Jarque–Bera normality test of order value in
  HECTODOLLARS (v = round(price/100) — dollars⁴ already overflows
  int64 PER ROW at max price ~1.4e5, silently in numpy and loudly in
  DuckDB; the hectodollar 4th power is ≤5e12/row) combined in Python
  ints; the central-moment numerators A2 = n·S2−S1², A3, A4 are exact,
  and skewness/kurtosis/JB finalize as one identical float expression
  (A3/(A2·√A2), A4/A2²−3 — the n powers cancel exactly).
- word_dispersion_dp: Gries' deviation-of-proportions DP for the exact
  top-K words — the standard corpus-linguistics dispersion measure
  DP_w = ½·Σ_i |v_wi/V_w − s_i| across sources. Absent (word, source)
  cells contribute |0 − s_i| (cross join, not inner); per-cell terms
  are quantized to 1e-12 units and integer-summed per word
  (never-sum-floats).
- hhi_revenue_concentration: Herfindahl–Hirschman index of revenue
  concentration across customers (per-customer DOLLAR totals — Σc² in
  cents overflows int64 already at sf0.001; HHI is scale-invariant so
  the dollar quantization only defines the measure). Totals live
  only inside the custkey-salted partitions; each partition emits ONE
  partial row (Σc², Σc, n_customers) — zero driver state proportional
  to customers; HHI and the normalized HHI finalize identical-
  expression from three exact integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_P = 64
_DP_K = 32
_DP_SCALE = 10**12


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# Jarque-Bera
# ---------------------------------------------------------------------------


def q_jarque_bera_value(sf_dir: str):
    """Jarque-Bera normality test from exact power sums (docstring
    above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def ppart(t: pa.Table) -> pa.Table:
        y = t["o_totalprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64) / 100.0
        d = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        return pa.table({"n": pa.array([np.int64(len(d))]),
                         "s1": pa.array([int(d.sum())]),
                         "s2": pa.array([int((d * d).sum())]),
                         "s3": pa.array([int((d * d * d).sum())]),
                         "s4": pa.array([int((d * d * d * d).sum())])})

    parts = ds.map_batches(ppart, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    s1 = sum(int(x) for x in parts["s1"])
    s2 = sum(int(x) for x in parts["s2"])
    s3 = sum(int(x) for x in parts["s3"])
    s4 = sum(int(x) for x in parts["s4"])
    # exact central-moment numerators (n-powers cancel in g1/g2);
    # HUGEINT bound: n³·S4 stays under 1.7e38 through sf0.1 — at sf1
    # the SQL mirror would need a dollar→decadollar unit drop.
    a2 = n * s2 - s1 * s1
    a3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
    a4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
          + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
    nf = float(n)
    g1 = float(a3) / (float(a2) * np.sqrt(float(a2)))
    g2 = float(a4) / (float(a2) * float(a2)) - 3.0
    jb = (nf / 6.0) * (g1 * g1 + (g2 * g2) / 4.0)
    r6 = _round6(np.array([g1, g2, jb]))
    out = pd.DataFrame({"n": [n], "s1": [s1], "s2": [s2],
                        "skew6": [r6[0]], "exkurt6": [r6[1]],
                        "jb6": [r6[2]]})
    for col in ("n", "s1", "s2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_JB = """
WITH d AS (
  SELECT CAST(round(o_totalprice / 100.0) AS BIGINT) AS v FROM orders),
s AS (
  SELECT count(*)::HUGEINT AS n, sum(v)::HUGEINT AS s1,
         sum(v * v)::HUGEINT AS s2,
         sum(v * v * v)::HUGEINT AS s3,
         sum(v * v * v * v)::HUGEINT AS s4
  FROM d),
a AS (
  SELECT n, s1, s2,
         (n * s2 - s1 * s1) AS a2,
         (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1) AS a3,
         (n * n * n * s4 - 4 * n * n * s1 * s3
          + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1) AS a4
  FROM s),
f AS (
  SELECT n::BIGINT AS n, s1::BIGINT AS s1, s2::BIGINT AS s2,
         CAST(a3 AS DOUBLE)
           / (CAST(a2 AS DOUBLE) * sqrt(CAST(a2 AS DOUBLE))) AS g1,
         CAST(a4 AS DOUBLE)
           / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) - 3.0 AS g2
  FROM a)
SELECT n, s1, s2, round(g1, 6) AS skew6, round(g2, 6) AS exkurt6,
       round((CAST(n AS DOUBLE) / 6.0)
             * (g1 * g1 + (g2 * g2) / 4.0), 6) AS jb6
FROM f
"""


# ---------------------------------------------------------------------------
# Gries DP dispersion
# ---------------------------------------------------------------------------


def q_word_dispersion_dp(sf_dir: str):
    """Gries' DP dispersion of the top-K words across sources
    (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def wpart(t: pa.Table) -> pa.Table:
        src_l: list[str] = []
        tok_l: list[str] = []
        for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            ts = txt.split()
            src_l.extend([s] * len(ts))
            tok_l.extend(ts)
        if not tok_l:
            return pa.table({"w": pa.array([], pa.string()),
                             "source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({"w": tok_l, "source": src_l,
                           "n": np.int64(1)})
        g = df.groupby(["w", "source"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(wpart, batch_format="pyarrow")
               .groupby(["w", "source"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    # exact top-K words by (count desc, word asc)
    wt = cells.groupby("w")["n"].sum().reset_index() \
        .sort_values(["n", "w"], ascending=[False, True]).head(_DP_K)
    top = set(wt["w"])
    st = cells.groupby("source")["n"].sum()
    tot = int(st.sum())
    sources = np.sort(st.index.to_numpy())
    sizes = st.reindex(sources).to_numpy(np.int64)
    piv = cells[cells["w"].isin(top)].pivot_table(
        index="w", columns="source", values="n", aggfunc="sum",
        fill_value=0).reindex(columns=sources, fill_value=0).sort_index()
    v = piv.to_numpy(np.int64)
    vw = v.sum(1)
    # per-(word, source) |v/V − s| quantized, summed as ints
    term = np.abs(v.astype(np.float64) / vw.astype(np.float64)[:, None]
                  - sizes.astype(np.float64) / float(tot))
    units = np.floor(term * np.float64(_DP_SCALE) + 0.5).astype(np.int64)
    dp6 = _round6(0.5 * (units.sum(1).astype(np.float64)
                         / np.float64(_DP_SCALE)))
    out = pd.DataFrame({"w": piv.index.to_numpy(object),
                        "total": vw,
                        "dp_units": units.sum(1).astype(np.int64),
                        "dp6": dp6})
    return out.sort_values("w").reset_index(drop=True)


SQL_DP = f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents),
cells AS (
  SELECT w, source, count(*)::BIGINT AS n FROM toks GROUP BY 1, 2),
topk AS (
  SELECT w, sum(n)::BIGINT AS total
  FROM cells GROUP BY 1 ORDER BY total DESC, w LIMIT {_DP_K}),
st AS (SELECT source, sum(n)::BIGINT AS sz FROM cells GROUP BY 1),
tot AS (SELECT sum(sz)::BIGINT AS t FROM st),
grid AS (
  SELECT topk.w, topk.total, st.source, st.sz,
         coalesce(cells.n, 0)::BIGINT AS v
  FROM topk CROSS JOIN st
  LEFT JOIN cells ON cells.w = topk.w AND cells.source = st.source),
u AS (
  SELECT w, total,
         sum(CAST(round(abs(CAST(v AS DOUBLE) / CAST(total AS DOUBLE)
                            - CAST(sz AS DOUBLE)
                              / CAST(tot.t AS DOUBLE))
                        * {_DP_SCALE}) AS BIGINT))::BIGINT AS dp_units
  FROM grid, tot GROUP BY 1, 2)
SELECT w, total, dp_units,
       round(0.5 * (CAST(dp_units AS DOUBLE) / {_DP_SCALE}.0), 6) AS dp6
FROM u ORDER BY w
"""


# ---------------------------------------------------------------------------
# HHI revenue concentration
# ---------------------------------------------------------------------------


def q_hhi_revenue_concentration(sf_dir: str):
    """Herfindahl-Hirschman concentration of revenue across customers
    (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def cpart(t: pa.Table) -> pa.Table:
        y = t["o_totalprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"custkey": k, "c": c})
        g = df.groupby("custkey", sort=False)["c"].sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        g["gkey"] = (g["custkey"] % _P).astype(np.int32)
        return _strip(g)

    def hpart(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("custkey", sort=False)["c"].sum()
        c = g.to_numpy(np.int64)
        return pd.DataFrame({"ncust": [np.int64(len(c))],
                             "s": [int(c.sum())],
                             "s2": [int((c * c).sum())]})

    parts = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby("gkey").map_groups(hpart, batch_format="pandas")
               .to_pandas())
    ncust = int(parts["ncust"].sum())
    s = sum(int(x) for x in parts["s"])
    s2 = sum(int(x) for x in parts["s2"])
    hhi = float(s2) / (float(s) * float(s))
    kf = float(ncust)
    hhin = (hhi - 1.0 / kf) / (1.0 - 1.0 / kf)
    r6 = _round6(np.array([hhi, hhin]))
    out = pd.DataFrame({"n_customers": [ncust], "total_dollars": [s],
                        "sum_sq": [s2], "hhi6": [r6[0]],
                        "hhi_norm6": [r6[1]]})
    for col in ("n_customers", "total_dollars", "sum_sq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HHI = """
WITH cr AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
s AS (
  SELECT count(*)::BIGINT AS ncust, sum(c)::BIGINT AS s,
         sum(c * c)::BIGINT AS s2
  FROM cr),
f AS (
  SELECT ncust, s, s2,
         CAST(s2 AS DOUBLE) / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
           AS hhi
  FROM s)
SELECT ncust AS n_customers, s AS total_dollars, s2 AS sum_sq,
       round(hhi, 6) AS hhi6,
       round((hhi - 1.0 / CAST(ncust AS DOUBLE))
             / (1.0 - 1.0 / CAST(ncust AS DOUBLE)), 6) AS hhi_norm6
FROM f
"""


QUERIES45: dict[str, tuple] = {
    "jarque_bera_value": (q_jarque_bera_value, SQL_JB),
    "word_dispersion_dp": (q_word_dispersion_dp, SQL_DP),
    "hhi_revenue_concentration": (q_hhi_revenue_concentration, SQL_HHI),
}
