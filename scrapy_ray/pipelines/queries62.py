"""Sixty-second oracle-query batch — completing the ECDF-distance test
trio / inter-event temporal structure / seasonal trend testing:

- anderson_darling_click_view: two-sample Anderson-Darling A² between
  the click and view value distributions (the tail-weighted sibling of
  ks_test / cramer_von_mises on the SAME merged per-cent histogram).
  At each interior support point the scaled ECDF gap
  D_j = N·M1_j − n1·B_j is an exact integer (the two groups' gaps are
  exact negatives, so one D carries both terms) and
  A² = Σ_j l_j·D_j²/(n1·n2·B_j·(N−B_j)); each term is ONE fixed float
  expression of exact integers, quantized to 1e-9 units and
  integer-summed (terms ≥ 0).
- burstiness_memory_gaps: Goh-Barabási burstiness
  B = (σ−μ)/(σ+μ) = (√A − Σg)/(√A + Σg) with A = nΣg² − (Σg)² exact
  (Python int / HUGEINT), and the memory coefficient M = Pearson r of
  consecutive within-user gap pairs from exact integer moments — gaps
  in whole seconds between a user's consecutive events ordered by the
  full (ts, event_id) key (the cumsum tie rule), computed vectorized
  inside user-salted partitions (inter_event_gap machinery).
- seasonal_mann_kendall_dow: Hirsch-Slack seasonal Mann-Kendall on
  daily revenue dollars — the MK S and tie-corrected 18·Var are
  computed WITHIN each day-of-week season ((epoch_days+3)%7, the
  seasonal_dow convention) and summed; continuity-corrected z
  identical-expression.  Pairs only form within a season (O(7·(n/7)²)
  on the O(days) aggregate; SQL self-join mirror).
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
_P = 64


# ---------------------------------------------------------------------------
# Anderson-Darling two-sample
# ---------------------------------------------------------------------------


def q_anderson_darling_click_view(sf_dir: str):
    """Two-sample Anderson-Darling A² from the merged per-cent histogram
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def hpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        keep = (et == "click") | (et == "view")
        if not keep.any():
            return pa.table({"g": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64())})
        g = (et[keep] == "view").astype(np.int64)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)[keep]
        df = pd.DataFrame({"g": g, "c": c})
        out = df.groupby(["g", "c"], sort=False).size().reset_index(name="m")
        out["m"] = out["m"].astype(np.int64)
        return _strip(out)

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby(["g", "c"]).aggregate(Sum("m", alias_name="m"))
               .to_pandas())
    merged = np.sort(cells["c"].unique().astype(np.int64))
    h = np.zeros((2, len(merged)), np.int64)
    for gi in (0, 1):
        sub = cells[cells["g"] == gi]
        pos = np.searchsorted(merged, sub["c"].to_numpy().astype(np.int64))
        h[gi, pos] = sub["m"].to_numpy().astype(np.int64)
    ell = h[0] + h[1]
    m1 = np.cumsum(h[0])
    bb = np.cumsum(ell)
    n1, nn = int(m1[-1]), int(bb[-1])
    n2 = nn - n1
    # interior support points only (B_L = N has a zero denominator)
    ell_i = ell[:-1].astype(np.float64)
    d = (nn * m1[:-1] - n1 * bb[:-1]).astype(np.float64)
    b = bb[:-1].astype(np.float64)
    terms = ((ell_i * (d * d))
             / ((float(n1) * float(n2)) * (b * (float(nn) - b))))
    units = int(np.floor(terms * 1e9 + 0.5).astype(np.int64).sum())
    a2 = float(units) / 1e9
    out = pd.DataFrame({"n1": [n1], "n2": [n2],
                        "support": [len(merged)],
                        "a2_units": [units],
                        "a2_6": [_round6(np.array([a2]))[0]]})
    for col in ("n1", "n2", "support", "a2_units"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_AD = """
WITH e AS (
  SELECT CAST(event_type = 'view' AS INT) AS g,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'view')),
cells AS (
  SELECT c, count(*) FILTER (WHERE g = 0)::BIGINT AS h1,
         count(*)::BIGINT AS l
  FROM e GROUP BY c),
w AS (
  SELECT c, l, sum(h1) OVER (ORDER BY c) AS m1,
         sum(l) OVER (ORDER BY c) AS b
  FROM cells),
st AS (SELECT sum(h1)::BIGINT AS n1, sum(l)::BIGINT AS nn,
              count(*)::BIGINT AS support
       FROM cells),
tm AS (
  SELECT sum(CAST(round(
           (CAST(l AS DOUBLE)
            * (CAST(nn * m1 - n1 * b AS DOUBLE)
               * CAST(nn * m1 - n1 * b AS DOUBLE)))
           / ((CAST(n1 AS DOUBLE) * CAST(nn - n1 AS DOUBLE))
              * (CAST(b AS DOUBLE) * (CAST(nn AS DOUBLE)
                                      - CAST(b AS DOUBLE))))
           * 1000000000.0) AS BIGINT))::BIGINT AS units
  FROM w, st WHERE b < nn)
SELECT n1, nn - n1 AS n2, support, units AS a2_units,
       round(CAST(units AS DOUBLE) / 1000000000.0, 6) AS a2_6
FROM st, tm
"""


# ---------------------------------------------------------------------------
# burstiness + memory
# ---------------------------------------------------------------------------


def q_burstiness_memory_gaps(sf_dir: str):
    """Burstiness B and memory coefficient M of within-user inter-event
    gaps (docstring above)."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % _P) \
            .astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[1:] = u[1:] == u[:-1]
        gap = np.zeros(len(df), np.int64)
        gap[1:] = (ts[1:] - ts[:-1]) // 1_000_000
        g = gap[same]
        uu = u[same]
        pair = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            pair[1:] = uu[1:] == uu[:-1]
        a = g[:-1][pair[1:]] if len(g) > 1 else g[:0]
        b = g[1:][pair[1:]] if len(g) > 1 else g[:0]
        return pd.DataFrame({
            "n": [np.int64(len(g))], "sg": [g.sum()],
            "sg2": [(g * g).sum()],
            "m": [np.int64(len(a))], "sa": [a.sum()], "sb": [b.sum()],
            "sab": [(a * b).sum()], "sa2": [(a * a).sum()],
            "sb2": [(b * b).sum()]})

    parts = (ds.map_batches(with_key, batch_format="pyarrow")
               .groupby("gkey")
               .map_groups(moments, batch_format="pandas")
               .to_pandas())
    n = int(parts["n"].sum())
    sg = int(parts["sg"].sum())
    sg2 = sum(int(v) for v in parts["sg2"])
    m = int(parts["m"].sum())
    sa = int(parts["sa"].sum())
    sb = int(parts["sb"].sum())
    sab = sum(int(v) for v in parts["sab"])
    sa2 = sum(int(v) for v in parts["sa2"])
    sb2 = sum(int(v) for v in parts["sb2"])
    a2 = n * sg2 - sg * sg
    burst = ((math.sqrt(float(a2)) - float(sg))
             / (math.sqrt(float(a2)) + float(sg)))
    num = m * sab - sa * sb
    dena = m * sa2 - sa * sa
    denb = m * sb2 - sb * sb
    mem = float(num) / (math.sqrt(float(dena)) * math.sqrt(float(denb)))
    r6 = _round6(np.array([burst, mem]))
    out = pd.DataFrame({"n_gaps": [n], "n_pairs": [m],
                        "burstiness6": [r6[0]], "memory6": [r6[1]]})
    for col in ("n_gaps", "n_pairs"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BURSTINESS = """
WITH g1 AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts))
            OVER (PARTITION BY user_id ORDER BY ts, event_id))
           // 1000000 AS gap,
         row_number()
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
  FROM events),
g2 AS (SELECT user_id, gap::HUGEINT AS gap, i FROM g1 WHERE i >= 2),
pr AS (
  SELECT a.gap AS ga, b.gap AS gb
  FROM g2 a JOIN g2 b ON a.user_id = b.user_id AND b.i = a.i + 1),
s1 AS (
  SELECT count(*)::HUGEINT AS n, sum(gap) AS sg, sum(gap * gap) AS sg2
  FROM g2),
s2 AS (
  SELECT count(*)::HUGEINT AS m, sum(ga) AS sa, sum(gb) AS sb,
         sum(ga * gb) AS sab, sum(ga * ga) AS sa2, sum(gb * gb) AS sb2
  FROM pr)
SELECT s1.n::BIGINT AS n_gaps, s2.m::BIGINT AS n_pairs,
       round((sqrt(CAST(s1.n * s1.sg2 - s1.sg * s1.sg AS DOUBLE))
              - CAST(s1.sg AS DOUBLE))
             / (sqrt(CAST(s1.n * s1.sg2 - s1.sg * s1.sg AS DOUBLE))
                + CAST(s1.sg AS DOUBLE)), 6) AS burstiness6,
       round(CAST(s2.m * s2.sab - s2.sa * s2.sb AS DOUBLE)
             / (sqrt(CAST(s2.m * s2.sa2 - s2.sa * s2.sa AS DOUBLE))
                * sqrt(CAST(s2.m * s2.sb2 - s2.sb * s2.sb AS DOUBLE))),
             6) AS memory6
FROM s1, s2
"""


# ---------------------------------------------------------------------------
# seasonal Mann-Kendall
# ---------------------------------------------------------------------------


def q_seasonal_mann_kendall_dow(sf_dir: str):
    """Hirsch-Slack seasonal MK over day-of-week seasons on daily
    revenue dollars (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    y = (np.sign(c / 100.0)
         * np.floor(np.abs(c / 100.0) + 0.5)).astype(np.int64)
    days = cells["day"].to_numpy(np.int64)
    dow = (days + 3) % 7
    s_tot = 0
    var18 = 0
    for w in range(7):
        yw = y[dow == w]
        nw = len(yw)
        diff = np.sign(yw[None, :] - yw[:, None])
        s_tot += int(np.triu(diff, 1).sum())
        _, counts = np.unique(yw, return_counts=True)
        ties = counts[counts > 1].astype(object)
        var18 += (nw * (nw - 1) * (2 * nw + 5)
                  - int(sum(t * (t - 1) * (2 * t + 5) for t in ties)))
    if s_tot > 0:
        z = (float(s_tot) - 1.0) / math.sqrt(float(var18) / 18.0)
    elif s_tot < 0:
        z = (float(s_tot) + 1.0) / math.sqrt(float(var18) / 18.0)
    else:
        z = 0.0
    out = pd.DataFrame({"n_days": [len(y)], "s_stat": [s_tot],
                        "var18": [var18],
                        "z6": [_round6(np.array([z]))[0]]})
    for col in ("n_days", "s_stat", "var18"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SEASONAL_MK = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d AS (
  SELECT CAST(round(c / 100.0) AS BIGINT) AS y, day,
         (day + 3) % 7 AS dow
  FROM dc),
nn AS (SELECT count(*)::BIGINT AS n FROM d),
sp AS (
  SELECT coalesce(sum(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END), 0)::BIGINT
           AS s
  FROM d a JOIN d b ON a.dow = b.dow AND b.day > a.day),
szn AS (
  SELECT dow, count(*)::BIGINT AS nw FROM d GROUP BY 1),
tie AS (
  SELECT coalesce(sum(cnt * (cnt - 1) * (2 * cnt + 5)), 0)::BIGINT AS tt
  FROM (SELECT count(*)::BIGINT AS cnt FROM d GROUP BY dow, y
        HAVING count(*) > 1)),
vv AS (
  SELECT (SELECT sum(nw * (nw - 1) * (2 * nw + 5))::BIGINT FROM szn)
         - tie.tt AS var18
  FROM tie)
SELECT nn.n AS n_days, sp.s AS s_stat, vv.var18,
       CASE WHEN sp.s > 0 THEN
              round((CAST(sp.s AS DOUBLE) - 1.0)
                    / sqrt(CAST(vv.var18 AS DOUBLE) / 18.0), 6)
            WHEN sp.s < 0 THEN
              round((CAST(sp.s AS DOUBLE) + 1.0)
                    / sqrt(CAST(vv.var18 AS DOUBLE) / 18.0), 6)
            ELSE 0.0 END AS z6
FROM nn, sp, vv
"""


QUERIES62: dict[str, tuple] = {
    "anderson_darling_click_view": (q_anderson_darling_click_view, SQL_AD),
    "burstiness_memory_gaps": (q_burstiness_memory_gaps, SQL_BURSTINESS),
    "seasonal_mann_kendall_dow": (q_seasonal_mann_kendall_dow,
                                  SQL_SEASONAL_MK),
}
