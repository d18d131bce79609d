"""One-hundred-sixty-first oracle-query batch — GROUPING SETS
coverage, conversion-latency quantiles, and the G-test:

- grouping_sets_orders: the GROUPING SETS surface beyond the
  existing cube/rollup — revenue cents and counts for the explicit
  sets (status), (priority), (status, year) — expressed on the Ray
  side as three independent aggregates over one shared scan stream,
  tagged and unioned, exactly as a SQL engine lowers it.
- time_to_convert_quantiles: per user, the gap from FIRST signup to
  the first LATER purchase; exact p25/p50/p75 of the gap seconds via
  quantile_disc ranks (ceil(q·n)) on the gap histogram — the everyday
  product-analytics query, all integers.
- g_test_dow_type: the log-likelihood-ratio (G) test of independence
  for day-of-week × event-type — the chisq_event_mix companion with
  the G statistic: per-cell 2·O·ln(O·N/(R·C)) quantized to 1e-9 and
  integer-summed.
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


# ---------------------------------------------------------------------------
# GROUPING SETS
# ---------------------------------------------------------------------------


def q_grouping_sets_orders(sf_dir: str):
    """Revenue/count for three explicit grouping sets (docstring)."""
    ds = _pq(sf_dir, "orders",
             columns=["o_orderstatus", "o_orderpriority",
                      "o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        st = np.asarray(t["o_orderstatus"].to_pylist())
        pr = np.asarray(t["o_orderpriority"].to_pylist())
        yr = pc.year(t["o_orderdate"]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        # partial-aggregate the FINEST grain once; the three sets
        # roll up from it
        g = pd.DataFrame({"st": st, "pr": pr, "yr": yr, "c": c,
                          "n": np.int64(1)}) \
            .groupby(["st", "pr", "yr"], sort=False) \
            .sum().reset_index()
        for col in ("c", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    fine = (ds.map_batches(part, batch_format="pyarrow")
              .groupby(["st", "pr", "yr"])
              .aggregate(Sum("c", alias_name="c"),
                         Sum("n", alias_name="n"))
              .to_pandas())
    s1 = fine.groupby("st")[["c", "n"]].sum().reset_index()
    s1 = pd.DataFrame({"set_name": "status", "k1": s1["st"],
                       "k2": "", "sum_cents": s1["c"],
                       "n_orders": s1["n"]})
    s2 = fine.groupby("pr")[["c", "n"]].sum().reset_index()
    s2 = pd.DataFrame({"set_name": "priority", "k1": s2["pr"],
                       "k2": "", "sum_cents": s2["c"],
                       "n_orders": s2["n"]})
    s3 = fine.groupby(["st", "yr"])[["c", "n"]].sum().reset_index()
    s3 = pd.DataFrame({"set_name": "status_year", "k1": s3["st"],
                       "k2": s3["yr"].astype(str),
                       "sum_cents": s3["c"], "n_orders": s3["n"]})
    out = pd.concat([s1, s2, s3], ignore_index=True) \
        .sort_values(["set_name", "k1", "k2"]).reset_index(drop=True)
    for col in ("sum_cents", "n_orders"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GROUPING_SETS = """
WITH r AS (
  SELECT o_orderstatus AS st, o_orderpriority AS pr,
         year(o_orderdate) AS yr,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders),
g AS (
  SELECT 'status' AS set_name, st AS k1, '' AS k2,
         sum(c)::BIGINT AS sum_cents, count(*)::BIGINT AS n_orders
  FROM r GROUP BY st
  UNION ALL
  SELECT 'priority', pr, '', sum(c)::BIGINT, count(*)::BIGINT
  FROM r GROUP BY pr
  UNION ALL
  SELECT 'status_year', st, CAST(yr AS VARCHAR), sum(c)::BIGINT,
         count(*)::BIGINT
  FROM r GROUP BY st, yr)
SELECT * FROM g ORDER BY set_name, k1, k2
"""


# ---------------------------------------------------------------------------
# Time to convert
# ---------------------------------------------------------------------------


def q_time_to_convert_quantiles(sf_dir: str):
    """p25/50/75 of first-signup → first-later-purchase (docstring)."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_type"])

    def salt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u),
                         "ts": t["ts"].cast(pa.int64()),
                         "g": t["event_type"],
                         "sk": pa.array(u % 64)})

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in df.groupby("u", sort=False):
            g = grp["g"].to_numpy()
            ts = grp["ts"].to_numpy(np.int64)
            si = ts[g == "signup"]
            if not len(si):
                continue
            s0 = int(si.min())
            pi = ts[(g == "purchase") & (ts > s0)]
            if len(pi):
                out.append((int(pi.min()) - s0) // 1_000_000)
        return pd.DataFrame({"gap": pd.Series(out, dtype=np.int64),
                             "n": np.ones(len(out), np.int64)})

    hist = (ds.map_batches(salt, batch_format="pyarrow")
              .groupby("sk").map_groups(gaps, batch_format="pandas")
              .groupby("gap").aggregate(Sum("n", alias_name="n"))
              .to_pandas().sort_values("gap").reset_index(drop=True))
    gv = hist["gap"].to_numpy(np.int64)
    cn = np.cumsum(hist["n"].to_numpy(np.int64))
    n = int(cn[-1])

    def qd(q: float) -> int:
        return int(gv[np.searchsorted(cn, math.ceil(q * n))])

    out = pd.DataFrame({"n_converted": [n], "p25_s": [qd(0.25)],
                        "p50_s": [qd(0.5)], "p75_s": [qd(0.75)]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_TIME_TO_CONVERT = """
WITH s0 AS (
  SELECT user_id, min(epoch_us(ts)) AS s
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
p0 AS (
  SELECT s0.user_id,
         (min(epoch_us(e.ts)) - s0.s) // 1000000 AS gap
  FROM s0 JOIN events e ON e.user_id = s0.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s0.s
  GROUP BY s0.user_id, s0.s)
SELECT count(*)::BIGINT AS n_converted,
       quantile_disc(gap, 0.25)::BIGINT AS p25_s,
       quantile_disc(gap, 0.5)::BIGINT AS p50_s,
       quantile_disc(gap, 0.75)::BIGINT AS p75_s
FROM p0
"""


# ---------------------------------------------------------------------------
# G-test
# ---------------------------------------------------------------------------


def q_g_test_dow_type(sf_dir: str):
    """G-test of dow × event-type independence (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def cells(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dow = pc.day_of_week(t["ts"]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t["event_type"].to_pylist())
        g = pd.DataFrame({"d": dow, "g": et, "n": np.int64(1)}) \
            .groupby(["d", "g"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cel = (ds.map_batches(cells, batch_format="pyarrow")
             .groupby(["d", "g"]).aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    n = int(cel["n"].sum())
    rsum = cel.groupby("d")["n"].sum()
    csum = cel.groupby("g")["n"].sum()
    g_u = 0
    for _, r_ in cel.iterrows():
        o = int(r_["n"])
        rr = int(rsum[r_["d"]])
        c_ = int(csum[r_["g"]])
        g_u += _r9(2.0 * float(o)
                   * math.log(float(o) * float(n)
                              / (float(rr) * float(c_))))
    dof = (len(rsum) - 1) * (len(csum) - 1)
    out = pd.DataFrame({"n": [n], "dof": [dof],
                        "g6": [_round6(np.array([float(g_u)
                                                 / 1e9]))[0]]})
    for col in ("n", "dof"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_G_TEST = """
WITH cells AS (
  SELECT isodow(ts) - 1 AS d, event_type AS g, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
tot AS (SELECT sum(n)::BIGINT AS nt FROM cells),
m AS (
  SELECT c.d, c.g, c.n,
         sum(c.n) OVER (PARTITION BY c.d) AS rs,
         sum(c.n) OVER (PARTITION BY c.g) AS cs
  FROM cells c),
gs AS (
  SELECT sum(CAST(round(2.0 * CAST(n AS DOUBLE)
               * ln(CAST(n AS DOUBLE) * (SELECT nt FROM tot)
                    / (CAST(rs AS DOUBLE) * CAST(cs AS DOUBLE)))
               * 1e9) AS BIGINT))::BIGINT AS gu,
         count(DISTINCT d)::BIGINT AS nr,
         count(DISTINCT g)::BIGINT AS nc
  FROM m)
SELECT (SELECT nt FROM tot) AS n,
       ((nr - 1) * (nc - 1))::BIGINT AS dof,
       round(CAST(gu AS DOUBLE) / 1e9, 6) AS g6
FROM gs
"""


QUERIES161: dict[str, tuple] = {
    "grouping_sets_orders": (q_grouping_sets_orders,
                             SQL_GROUPING_SETS),
    "time_to_convert_quantiles": (q_time_to_convert_quantiles,
                                  SQL_TIME_TO_CONVERT),
    "g_test_dow_type": (q_g_test_dow_type, SQL_G_TEST),
}
