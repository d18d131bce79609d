"""Sixty-fourth oracle-query batch — ordered-alternative trend / rank
scale test / robust shift estimation:

- jonckheere_priority_price: Jonckheere-Terpstra test for an ordered
  location trend of o_totalprice across the five naturally ordered
  o_orderpriority levels (1-URGENT < ... < 5-LOW).  2*JT =
  Σ_{i<j} Σ_v h_j(v)*(2*cumlt_i(v) + h_i(v)) is an exact int64 off the
  per-group per-cent price histogram (ties count once — the
  Mann-Whitney U2 discipline applied to all 10 ordered group pairs);
  the tie-corrected three-term variance (Hollander-Wolfe) is built
  from exact integer group/tie-block sums and z finalizes
  identical-expression.
- ansari_bradley_click_view: Ansari-Bradley scale test between click
  and view values on the SAME merged per-cent histogram as the
  KS/CvM/AD/Kuiper family.  AB scores min(r, N+1-r) are summed over
  each tie block in CLOSED FORM (f(m) = Σ_{r<=m} min(r, N+1-r), one
  triangular-number expression — no rank explosion), so the block
  score sum S_b is an exact integer; the statistic T = Σ h1_b*S_b/l_b
  and the score-square sum Σ S_b²/l_b are per-block rationals of
  exact integers, 1e-6-/1e-3-quantized and integer-summed
  (float-sum-order immunity); E[T] = m*ΣS/N and the tie-exact
  variance finalize identical-expression.
- hodges_lehmann_click_view: Hodges-Lehmann estimator of the
  click-view location shift — the median of all n1*n2 pairwise
  differences — on whole-dollar values.  The difference distribution
  is the integer cross-correlation of the two bounded dollar
  histograms (np.convolve on int64 / CROSS JOIN GROUP BY delta in
  SQL, ≤ ~560² cells), so the doubled median (low+high rank elements)
  is an exact integer; no O(n1*n2) pair materialization anywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


def _dollars(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """round(x) as int64, half-away-from-zero (the _cents twin at whole
    units). SQL equivalent: CAST(round(col) AS BIGINT)."""
    return pc.cast(pc.round(pc.cast(col, pa.float64()), ndigits=0,
                            round_mode="half_towards_infinity"), pa.int64())


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered trend
# ---------------------------------------------------------------------------


def q_jonckheere_priority_price(sf_dir: str):
    """Jonckheere-Terpstra ordered-trend test of o_totalprice across
    o_orderpriority levels (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        p = np.asarray(t["o_orderpriority"].to_pylist())
        g = p.astype("U1").astype(np.int64)
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": g, "c": c})
        out = df.groupby(["g", "c"], sort=False).size().reset_index(name="m")
        out["m"] = out["m"].astype(np.int64)
        return _strip(out)

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby(["g", "c"]).aggregate(Sum("m", alias_name="m"))
               .to_pandas())
    merged = np.sort(cells["c"].unique().astype(np.int64))
    k = 5
    h = np.zeros((k, len(merged)), np.int64)
    for gi in range(1, k + 1):
        sub = cells[cells["g"] == gi]
        pos = np.searchsorted(merged, sub["c"].to_numpy().astype(np.int64))
        h[gi - 1, pos] = sub["m"].to_numpy().astype(np.int64)
    cumlt = np.concatenate(
        [np.zeros((k, 1), np.int64), np.cumsum(h, axis=1)[:, :-1]], axis=1)
    jt2 = 0
    for i in range(k):
        for j in range(i + 1, k):
            jt2 += int((h[j] * (2 * cumlt[i] + h[i])).sum())
    n = [int(x) for x in h.sum(axis=1)]
    nn = sum(n)
    ell = h.sum(axis=0)
    # exact Python-int tie/group sums (HUGEINT territory is impossible
    # here but the discipline costs nothing)
    sum_n2 = sum(x * x for x in n)
    tg1 = sum(x * (x - 1) * (2 * x + 5) for x in n)
    tg2 = sum(x * (x - 1) * (x - 2) for x in n)
    tg3 = sum(x * (x - 1) for x in n)
    le = ell.astype(object)
    tu1 = int(((le * (le - 1)) * (2 * le + 5)).sum())
    tu2 = int(((le * (le - 1)) * (le - 2)).sum())
    tu3 = int((le * (le - 1)).sum())
    v1 = nn * (nn - 1) * (2 * nn + 5) - tg1 - tu1
    v2 = tg2 * tu2
    v3 = tg3 * tu3
    num4 = 2 * jt2 - (nn * nn - sum_n2)
    nf = float(nn)
    var = (float(v1) / 72.0
           + float(v2) / (36.0 * nf * (nf - 1.0) * (nf - 2.0))
           + float(v3) / (8.0 * nf * (nf - 1.0)))
    z = float(num4) / (4.0 * math.sqrt(var))
    out = pd.DataFrame({"n_total": [nn], "jt2": [jt2], "num4": [num4],
                        "v1": [v1], "v2": [v2], "v3": [v3],
                        "z6": _round6(np.array([z]))})
    for col in ("n_total", "jt2", "num4", "v1", "v2", "v3"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_JONCKHEERE = """
WITH b AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders),
cells AS (
  SELECT c,
         count(*) FILTER (WHERE g = 1)::BIGINT AS h1,
         count(*) FILTER (WHERE g = 2)::BIGINT AS h2,
         count(*) FILTER (WHERE g = 3)::BIGINT AS h3,
         count(*) FILTER (WHERE g = 4)::BIGINT AS h4,
         count(*) FILTER (WHERE g = 5)::BIGINT AS h5,
         count(*)::BIGINT AS l
  FROM b GROUP BY c),
w AS (
  SELECT h1, h2, h3, h4, h5,
         coalesce(sum(h1) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS u1,
         coalesce(sum(h2) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS u2,
         coalesce(sum(h3) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS u3,
         coalesce(sum(h4) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS u4
  FROM cells),
jt AS (
  SELECT sum(  h2 * (2 * u1 + h1) + h3 * (2 * u1 + h1)
             + h4 * (2 * u1 + h1) + h5 * (2 * u1 + h1)
             + h3 * (2 * u2 + h2) + h4 * (2 * u2 + h2)
             + h5 * (2 * u2 + h2)
             + h4 * (2 * u3 + h3) + h5 * (2 * u3 + h3)
             + h5 * (2 * u4 + h4))::BIGINT AS jt2
  FROM w),
st AS (
  SELECT sum(h1)::BIGINT AS n1, sum(h2)::BIGINT AS n2,
         sum(h3)::BIGINT AS n3, sum(h4)::BIGINT AS n4,
         sum(h5)::BIGINT AS n5, sum(l)::BIGINT AS nn,
         sum(l * (l - 1) * (2 * l + 5))::BIGINT AS tu1,
         sum(l * (l - 1) * (l - 2))::BIGINT AS tu2,
         sum(l * (l - 1))::BIGINT AS tu3
  FROM cells),
fin AS (
  SELECT nn, jt2,
         (  n1 * (n1 - 1) * (2 * n1 + 5) + n2 * (n2 - 1) * (2 * n2 + 5)
          + n3 * (n3 - 1) * (2 * n3 + 5) + n4 * (n4 - 1) * (2 * n4 + 5)
          + n5 * (n5 - 1) * (2 * n5 + 5))::BIGINT AS tg1,
         (  n1 * (n1 - 1) * (n1 - 2) + n2 * (n2 - 1) * (n2 - 2)
          + n3 * (n3 - 1) * (n3 - 2) + n4 * (n4 - 1) * (n4 - 2)
          + n5 * (n5 - 1) * (n5 - 2))::BIGINT AS tg2,
         (  n1 * (n1 - 1) + n2 * (n2 - 1) + n3 * (n3 - 1)
          + n4 * (n4 - 1) + n5 * (n5 - 1))::BIGINT AS tg3,
         (n1 * n1 + n2 * n2 + n3 * n3 + n4 * n4 + n5 * n5)::BIGINT AS sn2,
         tu1, tu2, tu3
  FROM st, jt)
SELECT nn AS n_total, jt2,
       (2 * jt2 - (nn * nn - sn2))::BIGINT AS num4,
       (nn * (nn - 1) * (2 * nn + 5) - tg1 - tu1)::BIGINT AS v1,
       (tg2 * tu2)::BIGINT AS v2,
       (tg3 * tu3)::BIGINT AS v3,
       round(CAST(2 * jt2 - (nn * nn - sn2) AS DOUBLE)
             / (4.0 * sqrt(
                 CAST(nn * (nn - 1) * (2 * nn + 5) - tg1 - tu1 AS DOUBLE)
                   / 72.0
                 + CAST(tg2 * tu2 AS DOUBLE)
                   / (36.0 * CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)
                      * (CAST(nn AS DOUBLE) - 2.0))
                 + CAST(tg3 * tu3 AS DOUBLE)
                   / (8.0 * CAST(nn AS DOUBLE)
                      * (CAST(nn AS DOUBLE) - 1.0)))), 6) AS z6
FROM fin
"""


# ---------------------------------------------------------------------------
# Ansari-Bradley scale test
# ---------------------------------------------------------------------------


def q_ansari_bradley_click_view(sf_dir: str):
    """Ansari-Bradley two-sample scale test between click and view
    values (docstring above)."""
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
    nn = int(ell.sum())
    m = int(h[0].sum())
    nv = nn - m
    t0 = (nn + 1) // 2

    def f(x: np.ndarray) -> np.ndarray:
        # f(m) = sum_{r=1..m} min(r, N+1-r), exact int64 closed form
        lm = np.minimum(x, t0)
        base = lm * (lm + 1) // 2
        extra = np.where(
            x > t0,
            (x - t0) * (nn + 1) - (x * (x + 1) // 2 - t0 * (t0 + 1) // 2),
            np.int64(0))
        return base + extra

    cum = np.cumsum(ell)
    sb = f(cum) - f(cum - ell)
    sums = int(f(np.array([nn], np.int64))[0])
    ellf = ell.astype(np.float64)
    t_units = int(np.floor(
        (h[0] * sb).astype(np.float64) / ellf * 1e6 + 0.5).sum())
    sq_units = int(np.floor(
        (sb * sb).astype(np.float64) / ellf * 1e3 + 0.5).sum())
    mf, nvf, nf = float(m), float(nv), float(nn)
    tt = t_units / 1e6
    ss = float(sums)
    sq = sq_units / 1e3
    e_t = (mf * ss) / nf
    var_t = ((mf * nvf) / (nf * (nf - 1.0))) * (sq - ((ss * ss) / nf))
    z = (tt - e_t) / math.sqrt(var_t)
    out = pd.DataFrame({"n_click": [m], "n_view": [nv], "sums": [sums],
                        "t_units": [t_units], "sq_units": [sq_units],
                        "z6": _round6(np.array([z]))})
    for col in ("n_click", "n_view", "sums", "t_units", "sq_units"):
        out[col] = out[col].astype(np.int64)
    return out


def _f_sql(mexpr: str) -> str:
    """Inline SQL rendering of f(m) = Σ_{r<=m} min(r, N+1-r) with t0 and
    nn in scope (exact integer arithmetic, // division on even products)."""
    return (f"((least({mexpr}, t0) * (least({mexpr}, t0) + 1)) // 2"
            f" + CASE WHEN {mexpr} > t0 THEN ({mexpr} - t0) * (nn + 1)"
            f" - (({mexpr} * ({mexpr} + 1)) // 2 - (t0 * (t0 + 1)) // 2)"
            f" ELSE 0 END)")


SQL_ANSARI_BRADLEY = f"""
WITH e AS (
  SELECT CAST(event_type = 'view' AS INT) AS g,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'view')),
cells AS (
  SELECT c, count(*) FILTER (WHERE g = 0)::BIGINT AS h1,
         count(*)::BIGINT AS l
  FROM e GROUP BY c),
st AS (
  SELECT sum(h1)::BIGINT AS m, sum(l)::BIGINT AS nn,
         (sum(l) + 1) // 2 AS t0
  FROM cells),
w AS (
  SELECT h1, l, sum(l) OVER (ORDER BY c)::BIGINT AS cum, t0, nn
  FROM cells, st),
blk AS (
  SELECT h1, l,
         ({_f_sql('cum')} - {_f_sql('(cum - l)')})::BIGINT AS sb
  FROM w),
agg AS (
  SELECT sum(CAST(round(((h1 * sb) / l) * 1000000.0) AS BIGINT))::BIGINT
           AS t_units,
         sum(CAST(round(((sb * sb) / l) * 1000.0) AS BIGINT))::BIGINT
           AS sq_units
  FROM blk),
fs AS (SELECT {_f_sql('nn')}::BIGINT AS sums, m, nn, nn - m AS nv
       FROM st)
SELECT m AS n_click, nv AS n_view, sums, t_units, sq_units,
       round((CAST(t_units AS DOUBLE) / 1000000.0
              - (CAST(m AS DOUBLE) * CAST(sums AS DOUBLE))
                / CAST(nn AS DOUBLE))
             / sqrt(((CAST(m AS DOUBLE) * CAST(nv AS DOUBLE))
                     / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))
                    * (CAST(sq_units AS DOUBLE) / 1000.0
                       - ((CAST(sums AS DOUBLE) * CAST(sums AS DOUBLE))
                          / CAST(nn AS DOUBLE)))), 6) AS z6
FROM fs, agg
"""


# ---------------------------------------------------------------------------
# Hodges-Lehmann shift estimator
# ---------------------------------------------------------------------------


def q_hodges_lehmann_click_view(sf_dir: str):
    """Hodges-Lehmann click-view shift: exact median of all pairwise
    whole-dollar differences via histogram cross-correlation (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def hpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        keep = (et == "click") | (et == "view")
        if not keep.any():
            return pa.table({"g": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64())})
        g = (et[keep] == "view").astype(np.int64)
        d = _dollars(t["value"]).to_numpy(zero_copy_only=False)[keep]
        df = pd.DataFrame({"g": g, "d": d})
        out = df.groupby(["g", "d"], sort=False).size().reset_index(name="m")
        out["m"] = out["m"].astype(np.int64)
        return _strip(out)

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby(["g", "d"]).aggregate(Sum("m", alias_name="m"))
               .to_pandas())
    dmax = int(cells["d"].max())
    hc = np.zeros(dmax + 1, np.int64)
    hv = np.zeros(dmax + 1, np.int64)
    for gi, arr in ((0, hc), (1, hv)):
        sub = cells[cells["g"] == gi]
        arr[sub["d"].to_numpy().astype(np.int64)] = \
            sub["m"].to_numpy().astype(np.int64)
    # conv[k] counts pairs with delta = click - view = k - dmax
    conv = np.convolve(hc, hv[::-1])
    cum = np.cumsum(conv)
    n1, n2 = int(hc.sum()), int(hv.sum())
    p = n1 * n2
    r1, r2 = (p + 1) // 2, (p + 2) // 2
    d1 = int(np.searchsorted(cum, r1)) - dmax
    d2 = int(np.searchsorted(cum, r2)) - dmax
    hl2 = d1 + d2
    out = pd.DataFrame({"n1": [n1], "n2": [n2], "p_pairs": [p],
                        "hl2_dollars": [hl2],
                        "hl_6": _round6(np.array([hl2 / 2.0]))})
    for col in ("n1", "n2", "p_pairs", "hl2_dollars"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HODGES_LEHMANN = """
WITH e AS (
  SELECT (event_type = 'view')::INT AS g, CAST(round(value) AS BIGINT) AS d
  FROM events WHERE event_type IN ('click', 'view')),
h1 AS (SELECT d, count(*)::BIGINT AS c FROM e WHERE g = 0 GROUP BY 1),
h2 AS (SELECT d, count(*)::BIGINT AS c FROM e WHERE g = 1 GROUP BY 1),
dd AS (
  SELECT h1.d - h2.d AS delta, sum(h1.c * h2.c)::BIGINT AS cnt
  FROM h1 CROSS JOIN h2 GROUP BY 1),
st AS (SELECT (SELECT sum(c) FROM h1)::BIGINT AS n1,
              (SELECT sum(c) FROM h2)::BIGINT AS n2),
w AS (SELECT delta, sum(cnt) OVER (ORDER BY delta)::BIGINT AS cum FROM dd),
sel AS (SELECT
  (SELECT min(delta) FROM w, st WHERE cum >= (n1 * n2 + 1) // 2) AS d1,
  (SELECT min(delta) FROM w, st WHERE cum >= (n1 * n2 + 2) // 2) AS d2)
SELECT n1, n2, (n1 * n2)::BIGINT AS p_pairs,
       (d1 + d2)::BIGINT AS hl2_dollars,
       round((d1 + d2) / 2.0, 6) AS hl_6
FROM st, sel
"""


QUERIES64: dict[str, tuple] = {
    "jonckheere_priority_price": (q_jonckheere_priority_price,
                                  SQL_JONCKHEERE),
    "ansari_bradley_click_view": (q_ansari_bradley_click_view,
                                  SQL_ANSARI_BRADLEY),
    "hodges_lehmann_click_view": (q_hodges_lehmann_click_view,
                                  SQL_HODGES_LEHMANN),
}
