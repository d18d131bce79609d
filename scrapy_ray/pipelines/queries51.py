"""Fifty-first oracle-query batch — within-block rank testing / extreme
outlier ratios / information-theoretic sequence summaries:

- friedman_event_value_ranks: Friedman test (+ tie correction +
  Kendall's W concordance) of per-user event-type value totals —
  blocks = users, treatments = the k event types, response = exact
  cents totals with ABSENT (user, type) cells = 0. The doubled-rank
  trick keeps ranking exact under ties: the doubled average rank
  r' = 2*(#less) + (#equal) + 1 is an INTEGER (SQL mirror:
  2*rank() + count_eq - 1), so the per-type rank sums R'_j and
  sum_j R'_j^2 = 4*sum R_j^2 are exact, and
  chi2 = 3*sum R'^2/(b*k*(k+1)) - 3*b*(k+1) plus the tie correction
  C = 1 - sum(t^3-t)/(b*k*(k^2-1)) finalize identical-expression.
  Per-user tie mass is computed cellwise: sum over groups of t^3-t
  equals sum over CELLS of (m^2-1) with m the cell value's
  multiplicity. The (user,type) cells aggregate distributed, then
  rank inside user-salted partitions (vectorized k x k broadcasting —
  never per-user map_groups).
- dixon_q_order_value: Dixon's Q ratios for the smallest and largest
  order value (dollars) — Q_low = (x(2)-x(1))/(x(n)-x(1)),
  Q_high = (x(n)-x(n-1))/(x(n)-x(1)) from the four extreme ORDER
  STATISTICS only: each block contributes its two smallest and two
  largest (np.partition), the driver merges O(blocks) candidates.
  SQL mirrors with ORDER BY ... LIMIT 1 OFFSET 1 subqueries.
- markov_entropy_rate: entropy rate of the user event-type Markov
  chain, H = sum_ab (n_ab/T) * ln(r_a/n_ab) over the O(types^2)
  transition-count cells (event_transitions pairing semantics:
  per-user (ts, event_id) order, salted-partition vectorized shift).
  Per-cell terms are floats of exact integers by the same expression
  both sides, quantized to 1e-9 units and integer-summed (the zipf
  ln-parity precedent; r_a = n_ab makes the term exactly 0).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_ME_SCALE = 10**9        # 1e-9 units for entropy terms (zipf precedent)
_FR_SALT = 64


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# Friedman + Kendall's W
# ---------------------------------------------------------------------------


def friedman_rank_sums(sf_dir: str) -> tuple[list[str], dict]:
    """Shared within-block doubled-rank machinery: per-type doubled rank
    sums R'_j plus block count and tie mass over the users x event-types
    cents-total grid. Used by the Friedman test here and Page's trend
    test (queries52)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def cell_partial(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": (t["user_id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64)),
            "event_type": np.asarray(t["event_type"].to_pylist(),
                                     dtype=object),
            "tot": c.astype(np.int64)})
        g = df.groupby(["user_id", "event_type"], sort=False)["tot"] \
              .sum().reset_index()
        g["tot"] = g["tot"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cell_partial, batch_format="pyarrow")
               .groupby(["user_id", "event_type"])
               .aggregate(Sum("tot", alias_name="tot"))
               .materialize())       # feeds the type list AND the ranks

    def uniq_types(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": pa.array(
            sorted(set(t["event_type"].to_pylist())))})

    # block-level unique scan of the materialized cells — no extra shuffle
    types = sorted(set(cells.map_batches(uniq_types,
                                         batch_format="pyarrow")
                       .to_pandas()["event_type"]))
    k = len(types)

    def rank_partition(df: pd.DataFrame) -> pd.DataFrame:
        piv = (df.pivot_table(index="user_id", columns="event_type",
                              values="tot", aggfunc="sum", fill_value=0)
                 .reindex(columns=types, fill_value=0))
        x = piv.to_numpy(np.int64)                       # users x k
        less = (x[:, None, :] < x[:, :, None]).sum(-1)   # per (u, i)
        eq = (x[:, None, :] == x[:, :, None]).sum(-1)    # incl. self
        r2 = 2 * less + eq + 1                           # doubled avg rank
        ties = int((eq * eq - 1).sum())                  # Σ_cells m²-1
        rows = [{"key": t, "val": int(r2[:, i].sum())}
                for i, t in enumerate(types)]
        rows.append({"key": "__b", "val": int(x.shape[0])})
        rows.append({"key": "__ties", "val": ties})
        out = pd.DataFrame(rows)
        out["val"] = out["val"].astype(np.int64)
        return out

    def with_salt(t: pa.Table) -> pa.Table:
        s = (t["user_id"].to_numpy(zero_copy_only=False)
             .astype(np.int64) % _FR_SALT)
        return t.append_column("salt", pa.array(s))

    agg = (cells.map_batches(with_salt, batch_format="pyarrow")
                .groupby("salt")
                .map_groups(rank_partition, batch_format="pandas")
                .groupby("key").aggregate(Sum("val", alias_name="val"))
                .to_pandas())
    vals = {r.key: int(r.val) for r in agg.itertuples(index=False)}
    return types, vals


def q_friedman_event_value_ranks(sf_dir: str):
    """Friedman chi² (tie-corrected) + Kendall's W on per-user type
    value totals (docstring above)."""
    types, vals = friedman_rank_sums(sf_dir)
    k = len(types)
    b = vals["__b"]
    ties = vals["__ties"]
    sr2sq = sum(vals[t] * vals[t] for t in types)
    chi2 = (3.0 * float(sr2sq) / float(b * k * (k + 1))
            - 3.0 * float(b * (k + 1)))
    cc = 1.0 - float(ties) / float(b * k * (k * k - 1))
    chi2a = chi2 / cc
    w = chi2a / float(b * (k - 1))
    r6 = _round6(np.array([chi2, chi2a, w]))
    out = pd.DataFrame({"b_users": [b], "k_types": [k], "ties": [ties],
                        "sr2sq": [sr2sq], "chi2_6": [r6[0]],
                        "chi2adj_6": [r6[1]], "w6": [r6[2]]})
    for col in ("b_users", "k_types", "ties", "sr2sq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_FRIEDMAN = """
WITH c AS (
  SELECT user_id, event_type,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS tot
  FROM events GROUP BY 1, 2),
grid AS (
  SELECT u.user_id, t.event_type, coalesce(c.tot, 0)::BIGINT AS tot
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
  LEFT JOIN c USING (user_id, event_type)),
r AS (
  SELECT user_id, event_type, tot,
         (2 * rank() OVER (PARTITION BY user_id ORDER BY tot)
          + count(*) OVER (PARTITION BY user_id, tot) - 1)::BIGINT AS r2
  FROM grid),
rj AS (
  SELECT event_type, sum(r2)::BIGINT AS rsum FROM r GROUP BY 1),
tie AS (
  SELECT coalesce(sum(t * t * t - t), 0)::BIGINT AS ties
  FROM (SELECT user_id, tot, count(*)::BIGINT AS t
        FROM grid GROUP BY 1, 2)),
dims AS (
  SELECT (SELECT count(DISTINCT user_id) FROM events)::BIGINT AS b,
         (SELECT count(DISTINCT event_type) FROM events)::BIGINT AS k,
         (SELECT sum(rsum * rsum) FROM rj)::BIGINT AS sr2sq,
         tie.ties
  FROM tie),
f AS (
  SELECT b, k, ties, sr2sq,
         (3.0 * CAST(sr2sq AS DOUBLE) / CAST(b * k * (k + 1) AS DOUBLE)
          - 3.0 * CAST(b * (k + 1) AS DOUBLE)) AS chi2,
         (1.0 - CAST(ties AS DOUBLE)
                / CAST(b * k * (k * k - 1) AS DOUBLE)) AS cc
  FROM dims)
SELECT b AS b_users, k AS k_types, ties, sr2sq,
       round(chi2, 6) AS chi2_6,
       round(chi2 / cc, 6) AS chi2adj_6,
       round((chi2 / cc) / CAST(b * (k - 1) AS DOUBLE), 6) AS w6
FROM f
"""


# ---------------------------------------------------------------------------
# Dixon's Q
# ---------------------------------------------------------------------------


def q_dixon_q_order_value(sf_dir: str):
    """Dixon's Q ratios from the four extreme order statistics of order
    value dollars (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def ext_partial(t: pa.Table) -> pa.Table:
        y = (t["o_totalprice"].to_numpy(zero_copy_only=False)
             .astype(np.float64))
        d = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        if len(d) == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # multiplicity-preserving extreme candidates: the global x(1),
        # x(2) [x(n-1), x(n)] are among the union-with-multiplicity of
        # per-block two smallest [largest]; blocks of <= 4 rows emit all
        # rows so overlapping slots are never double-counted
        if len(d) <= 4:
            cand = np.sort(d)
        else:
            p = np.partition(d, [1, len(d) - 2])
            cand = np.concatenate([p[:2], p[-2:]])
        out = pa.table({"v": pa.array(cand.astype(np.int64)),
                        "n": pa.array(np.zeros(len(cand), np.int64))})
        # row count rides a sentinel row so the merge keeps exact n
        return pa.concat_tables([
            out, pa.table({"v": pa.array([np.int64(0)]),
                           "n": pa.array([np.int64(len(d))])})])

    parts = ds.map_batches(ext_partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    cand = np.sort(parts.loc[parts["n"] == 0, "v"].to_numpy(np.int64))
    x1, x2 = int(cand[0]), int(cand[1])
    xn1, xn = int(cand[-2]), int(cand[-1])
    rng = float(xn - x1)
    qlo = float(x2 - x1) / rng
    qhi = float(xn - xn1) / rng
    r6 = _round6(np.array([qlo, qhi]))
    out = pd.DataFrame({"n": [n], "x1": [x1], "x2": [x2], "xn1": [xn1],
                        "xn": [xn], "qlow6": [r6[0]], "qhigh6": [r6[1]]})
    for col in ("n", "x1", "x2", "xn1", "xn"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_DIXON = """
WITH d AS (
  SELECT CAST(round(o_totalprice) AS BIGINT) AS v FROM orders),
s AS (
  SELECT (SELECT count(*) FROM d)::BIGINT AS n,
         (SELECT v FROM d ORDER BY v LIMIT 1)::BIGINT AS x1,
         (SELECT v FROM d ORDER BY v LIMIT 1 OFFSET 1)::BIGINT AS x2,
         (SELECT v FROM d ORDER BY v DESC LIMIT 1 OFFSET 1)::BIGINT
           AS xn1,
         (SELECT v FROM d ORDER BY v DESC LIMIT 1)::BIGINT AS xn)
SELECT n, x1, x2, xn1, xn,
       round(CAST(x2 - x1 AS DOUBLE) / CAST(xn - x1 AS DOUBLE), 6)
         AS qlow6,
       round(CAST(xn - xn1 AS DOUBLE) / CAST(xn - x1 AS DOUBLE), 6)
         AS qhigh6
FROM s
"""


# ---------------------------------------------------------------------------
# Markov entropy rate
# ---------------------------------------------------------------------------

_ME_SALT = 64


def transition_cells(sf_dir: str) -> pd.DataFrame:
    """Exact (prev, next, count) transition cells of the user event-type
    chain — event_transitions pairing semantics (per-user (ts, event_id)
    order), user-salted partitions with vectorized shift. Shared by
    markov_entropy_rate and the Markov-dependence chi² (queries53)."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "event_type", "ts", "event_id"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False)
             .astype(np.int64) % _ME_SALT)
        return t.append_column("gkey", pa.array(g))

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        pairs = pd.DataFrame({"a": et[:-1][same], "b": et[1:][same]})
        g = pairs.groupby(["a", "b"], sort=False).size() \
                 .reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    return (ds.map_batches(with_key, batch_format="pyarrow")
              .groupby("gkey")
              .map_groups(transitions, batch_format="pandas")
              .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n"))
              .to_pandas())


def q_markov_entropy_rate(sf_dir: str):
    """Entropy rate of the event-type Markov chain from exact transition
    counts (docstring above)."""
    cells = transition_cells(sf_dir)
    nn = cells["n"].to_numpy(np.int64)
    t_pairs = int(nn.sum())
    rowt = cells.groupby("a")["n"].transform("sum").to_numpy(np.int64)
    h_u = 0
    for c, r in zip(nn, rowt):
        term = ((float(int(c)) / float(t_pairs))
                * math.log(float(int(r)) / float(int(c)))
                * float(_ME_SCALE))
        h_u += int(math.floor(term + 0.5))     # terms >= 0 (r >= c)
    h = float(h_u) / float(_ME_SCALE)
    out = pd.DataFrame({"t_pairs": [t_pairs], "n_cells": [len(cells)],
                        "h_units": [h_u],
                        "h6": [_round6(np.array([h]))[0]]})
    for col in ("t_pairs", "n_cells", "h_units"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ENTROPY = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
c AS (
  SELECT event_type AS a, nxt AS b, count(*)::BIGINT AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
r AS (
  SELECT a, b, n, sum(n) OVER (PARTITION BY a)::BIGINT AS rt,
         (SELECT sum(n) FROM c)::BIGINT AS t
  FROM c),
q AS (
  SELECT max(t)::BIGINT AS t_pairs, count(*)::BIGINT AS n_cells,
         sum(CAST(round((CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
                        * ln(CAST(rt AS DOUBLE) / CAST(n AS DOUBLE))
                        * {_ME_SCALE}.0) AS BIGINT))::BIGINT AS h_u
  FROM r)
SELECT t_pairs, n_cells, h_u AS h_units,
       round(CAST(h_u AS DOUBLE) / {_ME_SCALE}.0, 6) AS h6
FROM q
"""


QUERIES51: dict[str, tuple] = {
    "friedman_event_value_ranks": (q_friedman_event_value_ranks,
                                   SQL_FRIEDMAN),
    "dixon_q_order_value": (q_dixon_q_order_value, SQL_DIXON),
    "markov_entropy_rate": (q_markov_entropy_rate, SQL_ENTROPY),
}
