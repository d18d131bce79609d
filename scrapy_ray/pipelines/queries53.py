"""Fifty-third oracle-query batch — median-based k-group location /
standardized effect size / sequence-dependence testing:

- mood_median_value_by_type: Mood's median test of event value across
  event types — counts above/below the GLOBAL median (cents; values
  equal to the median drop, standard), chi-square over the 2xk
  contingency table. One (event_type, cents, count) cell shuffle
  (bounded by the value range — the brown_forsythe argument) yields
  the global quantile_disc median AND the per-type above/below counts;
  per-cell (O-E)^2/E terms are floats of exact integers, quantized to
  1e-9 units and integer-summed over the 2k cells.
- cohens_d_click_purchase: Cohen's d and Hedges' g for click vs
  purchase event value — exact integer-cents moments (n, S1, S2) per
  group in one pass; pooled variance, d, and the small-sample
  correction J = 1 - 3/(4*df - 1) finalize identical-expression.
- markov_dependence_chi2: chi-square test of first-order sequence
  dependence — observed transition counts vs the independence
  expectation r_a*c_b/T over the O(types^2) cells
  (queries51.transition_cells, shared machinery), per-cell terms
  1e-9-quantized and integer-summed; Cramer's V alongside.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries51 import transition_cells

_MM_SCALE = 10**9        # 1e-9 units for per-cell chi² terms


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# Mood's median test
# ---------------------------------------------------------------------------


def q_mood_median_value_by_type(sf_dir: str):
    """Mood's median chi² across event types (docstring above)."""
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

    cells = (ds.map_batches(cell_partial, batch_format="pyarrow")
               .groupby(["event_type", "c"])
               .aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())          # bounded by value range x types
    hist = cells.groupby("c")["cnt"].sum().sort_index()
    cum = hist.cumsum()
    n_all = int(cum.iloc[-1])
    rank = int(math.ceil(0.5 * n_all))
    med = int(hist.index[int(np.searchsorted(cum.to_numpy(), rank))])
    above = cells[cells["c"] > med].groupby("event_type")["cnt"].sum()
    below = cells[cells["c"] < med].groupby("event_type")["cnt"].sum()
    types = sorted(set(cells["event_type"]))
    a = np.array([int(above.get(t, 0)) for t in types], np.int64)
    bl = np.array([int(below.get(t, 0)) for t in types], np.int64)
    ra = int(a.sum())
    rb = int(bl.sum())
    nn = ra + rb
    chi_u = 0
    for oa, ob, t in zip(a, bl, types):
        col = int(oa) + int(ob)
        for obs, row in ((int(oa), ra), (int(ob), rb)):
            e = float(row) * float(col) / float(nn)
            term = ((float(obs) - e) * (float(obs) - e) / e
                    * float(_MM_SCALE))
            chi_u += int(math.floor(term + 0.5))
    chi2 = float(chi_u) / float(_MM_SCALE)
    out = pd.DataFrame({"event_type": types, "n_above": a, "n_below": bl})
    out["med"] = np.int64(med)
    out["chi2_6"] = _round6(np.array([chi2]))[0]
    out["df"] = np.int64(len(types) - 1)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_MOOD = f"""
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
m AS (SELECT quantile_disc(c, 0.5)::BIGINT AS med FROM e),
g AS (
  SELECT event_type,
         sum(CASE WHEN c > med THEN 1 ELSE 0 END)::BIGINT AS n_above,
         sum(CASE WHEN c < med THEN 1 ELSE 0 END)::BIGINT AS n_below
  FROM e, m GROUP BY 1),
tot AS (
  SELECT sum(n_above)::BIGINT AS ra, sum(n_below)::BIGINT AS rb,
         count(*)::BIGINT AS k
  FROM g),
terms AS (
  SELECT
    CAST(round((CAST(n_above AS DOUBLE)
                - CAST(ra AS DOUBLE) * CAST(n_above + n_below AS DOUBLE)
                  / CAST(ra + rb AS DOUBLE))
               * (CAST(n_above AS DOUBLE)
                  - CAST(ra AS DOUBLE)
                    * CAST(n_above + n_below AS DOUBLE)
                    / CAST(ra + rb AS DOUBLE))
               / (CAST(ra AS DOUBLE) * CAST(n_above + n_below AS DOUBLE)
                  / CAST(ra + rb AS DOUBLE)) * {_MM_SCALE})
         AS BIGINT)
    + CAST(round((CAST(n_below AS DOUBLE)
                  - CAST(rb AS DOUBLE)
                    * CAST(n_above + n_below AS DOUBLE)
                    / CAST(ra + rb AS DOUBLE))
                 * (CAST(n_below AS DOUBLE)
                    - CAST(rb AS DOUBLE)
                      * CAST(n_above + n_below AS DOUBLE)
                      / CAST(ra + rb AS DOUBLE))
                 / (CAST(rb AS DOUBLE)
                    * CAST(n_above + n_below AS DOUBLE)
                    / CAST(ra + rb AS DOUBLE)) * {_MM_SCALE})
           AS BIGINT) AS tu
  FROM g, tot),
chi AS (SELECT sum(tu)::BIGINT AS chi_u FROM terms)
SELECT g.event_type, g.n_above, g.n_below, m.med,
       round(CAST(chi.chi_u AS DOUBLE) / {_MM_SCALE}.0, 6) AS chi2_6,
       (tot.k - 1)::BIGINT AS df
FROM g, m, chi, tot
ORDER BY g.event_type
"""


# ---------------------------------------------------------------------------
# Cohen's d / Hedges' g
# ---------------------------------------------------------------------------


def q_cohens_d_click_purchase(sf_dir: str):
    """Cohen's d + Hedges' g for click vs purchase value cents
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def mom_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rows = []
        for grp in ("click", "purchase"):
            x = c[et == grp]
            rows.append({"grp": grp, "n": np.int64(len(x)),
                         "s1": np.int64(x.sum()),
                         "s2": np.int64((x * x).sum())})
        return _strip(pd.DataFrame(rows))

    g = (ds.map_batches(mom_partial, batch_format="pyarrow")
           .groupby("grp")
           .aggregate(Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
                      Sum("s2", alias_name="s2"))
           .to_pandas()).set_index("grp")
    n1, s11, s21 = (int(g.loc["click", c]) for c in ("n", "s1", "s2"))
    n2, s12, s22 = (int(g.loc["purchase", c]) for c in ("n", "s1", "s2"))
    df = n1 + n2 - 2
    # pooled SS = Σ(x-m)² per group, exact numerators: n*S2 - S1²
    ss1 = n1 * s21 - s11 * s11          # = n1² * var-biased... /n1 below
    ss2 = n2 * s22 - s12 * s12
    sp2 = (float(ss1) / float(n1) + float(ss2) / float(n2)) / float(df)
    d = ((float(s11) / float(n1) - float(s12) / float(n2))
         / math.sqrt(sp2))
    j = 1.0 - 3.0 / (4.0 * float(df) - 1.0)
    r6 = _round6(np.array([d, j * d]))
    out = pd.DataFrame({"n_click": [n1], "n_purchase": [n2],
                        "s1_click": [s11], "s1_purchase": [s12],
                        "d6": [r6[0]], "g6": [r6[1]]})
    for col in ("n_click", "n_purchase", "s1_click", "s1_purchase"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_COHEN = """
WITH e AS (
  SELECT event_type AS grp, CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'purchase')),
g AS (
  SELECT grp, count(*)::HUGEINT AS n, sum(c)::HUGEINT AS s1,
         sum(c * c)::HUGEINT AS s2
  FROM e GROUP BY 1),
p AS (
  SELECT
    (SELECT n FROM g WHERE grp = 'click') AS n1,
    (SELECT s1 FROM g WHERE grp = 'click') AS s11,
    (SELECT s2 FROM g WHERE grp = 'click') AS s21,
    (SELECT n FROM g WHERE grp = 'purchase') AS n2,
    (SELECT s1 FROM g WHERE grp = 'purchase') AS s12,
    (SELECT s2 FROM g WHERE grp = 'purchase') AS s22),
f AS (
  SELECT n1, n2, s11, s12, (n1 + n2 - 2) AS df,
         (CAST(n1 * s21 - s11 * s11 AS DOUBLE) / CAST(n1 AS DOUBLE)
          + CAST(n2 * s22 - s12 * s12 AS DOUBLE) / CAST(n2 AS DOUBLE))
         / CAST(n1 + n2 - 2 AS DOUBLE) AS sp2
  FROM p)
SELECT n1::BIGINT AS n_click, n2::BIGINT AS n_purchase,
       s11::BIGINT AS s1_click, s12::BIGINT AS s1_purchase,
       round((CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s12 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / sqrt(sp2), 6) AS d6,
       round((1.0 - 3.0 / (4.0 * CAST(df AS DOUBLE) - 1.0))
             * ((CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(s12 AS DOUBLE) / CAST(n2 AS DOUBLE))
                / sqrt(sp2)), 6) AS g6
FROM f
"""


# ---------------------------------------------------------------------------
# Markov dependence chi²
# ---------------------------------------------------------------------------


def q_markov_dependence_chi2(sf_dir: str):
    """Chi-square test of first-order sequence dependence + Cramer's V
    (docstring above)."""
    cells = transition_cells(sf_dir)
    nn = cells["n"].to_numpy(np.int64)
    t_all = int(nn.sum())
    ra = cells.groupby("a")["n"].transform("sum").to_numpy(np.int64)
    cb = cells.groupby("b")["n"].transform("sum").to_numpy(np.int64)
    # absent (a,b) cells: E > 0, O = 0 — contribute E to chi². All E
    # share the denominator T, so Σ_present E = (Σ ra*cb)/T exactly and
    # the missing mass T - Σ_present E = (T² - Σ ra*cb)/T is ONE float
    # of exact integers (never-sum-floats rule), quantized once.
    chi_u = 0
    src = 0
    for o, r, c in zip(nn, ra, cb):
        e = float(int(r)) * float(int(c)) / float(t_all)
        term = ((float(int(o)) - e) * (float(int(o)) - e) / e
                * float(_MM_SCALE))
        chi_u += int(math.floor(term + 0.5))
        src += int(r) * int(c)
    miss = (float(t_all * t_all - src) / float(t_all)) * float(_MM_SCALE)
    chi_u += int(math.floor(abs(miss) + 0.5) * (1 if miss >= 0 else -1))
    k = int(pd.unique(pd.concat([cells["a"], cells["b"]])).shape[0])
    chi2 = float(chi_u) / float(_MM_SCALE)
    v = math.sqrt(chi2 / (float(t_all) * (float(k) - 1.0)))
    r6 = _round6(np.array([chi2, v]))
    out = pd.DataFrame({"t_pairs": [t_all], "k_types": [k],
                        "n_cells": [len(cells)], "chi_units": [chi_u],
                        "chi2_6": [r6[0]], "v6": [r6[1]]})
    for col in ("t_pairs", "k_types", "n_cells", "chi_units"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MARKOV_CHI = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
c AS (
  SELECT event_type AS a, nxt AS b, count(*)::BIGINT AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
r AS (
  SELECT a, b, n, sum(n) OVER (PARTITION BY a)::BIGINT AS ra,
         sum(n) OVER (PARTITION BY b)::BIGINT AS cb,
         (SELECT sum(n) FROM c)::BIGINT AS t
  FROM c),
terms AS (
  SELECT t,
         CAST(round((CAST(n AS DOUBLE)
                     - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
                       / CAST(t AS DOUBLE))
                    * (CAST(n AS DOUBLE)
                       - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
                         / CAST(t AS DOUBLE))
                    / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)
                       / CAST(t AS DOUBLE)) * {_MM_SCALE})
              AS BIGINT) AS tu,
         (ra * cb)::BIGINT AS rc
  FROM r),
agg AS (
  SELECT max(t)::BIGINT AS t_pairs, count(*)::BIGINT AS n_cells,
         (sum(tu)
          + CAST(round(CAST(max(t) * max(t) - sum(rc) AS DOUBLE)
                       / CAST(max(t) AS DOUBLE)
                       * {_MM_SCALE}) AS BIGINT))::BIGINT AS chi_u
  FROM terms),
k AS (
  SELECT count(*)::BIGINT AS k FROM (
    SELECT a FROM c UNION SELECT b FROM c))
SELECT agg.t_pairs, k.k AS k_types, agg.n_cells, agg.chi_u AS chi_units,
       round(CAST(agg.chi_u AS DOUBLE) / {_MM_SCALE}.0, 6) AS chi2_6,
       round(sqrt((CAST(agg.chi_u AS DOUBLE) / {_MM_SCALE}.0)
                  / (CAST(agg.t_pairs AS DOUBLE)
                     * (CAST(k.k AS DOUBLE) - 1.0))), 6) AS v6
FROM agg, k
"""


QUERIES53: dict[str, tuple] = {
    "mood_median_value_by_type": (q_mood_median_value_by_type, SQL_MOOD),
    "cohens_d_click_purchase": (q_cohens_d_click_purchase, SQL_COHEN),
    "markov_dependence_chi2": (q_markov_dependence_chi2, SQL_MARKOV_CHI),
}
