"""Fiftieth oracle-query batch — survival-curve comparison / scale
reliability / stylometry:

- logrank_purchase_gaps: two-sample log-rank test comparing the
  distribution of per-user inter-purchase gaps (days) between even- and
  odd-id user cohorts. All gaps are uncensored, so the risk set at time
  t is simply "gaps >= t" — reverse cumulative sums over the
  (group, gap-day) COUNT CELLS, which are bounded by the gap range in
  days, not the row count. Per-event-time O-E and hypergeometric
  variance terms are floats of exact integers evaluated by the same
  expression both sides, quantized per row to 1e-6 units
  (never-sum-floats rule; int64-safe through sf1 where the 1e-12 SPRT
  unit would overflow), and integer-summed; rows with n_j <= 1 carry a
  zero variance term (0/0 guard, standard).
- cronbach_alpha_event_types: Cronbach's alpha treating the k=5 event
  types as scale items and per-user type counts as item scores (users
  with >= 1 event; missing (user, type) cells are zero, which leaves
  every integer moment unchanged). Sample variances share the
  N(N-1) denominator, so sum_i var_i / var_total reduces to the EXACT
  integer ratio A/B with A = sum_i (N*S2_i - S1_i^2) and
  B = N*S2_tot - S1_tot^2; alpha = k/(k-1) * (1 - A/B) is one float
  expression of integers. The (user, type) count table is materialized
  once (tiny: users x k) and feeds both the per-type and the per-user
  aggregate — the CLAUDE lazy-double-execution rule.
- burrows_delta_sources: Burrows' Delta authorship distance between
  every source pair over the exact top-K=32 corpus vocabulary
  (count desc, word asc — the zipf selection). Relative frequencies
  c/N_s are quantized to 1e-12-unit integers u (identical double
  expression both sides), so the across-source moments Su, Su2 and
  D_w = S*Su2 - Su^2 are exact (Python ints / HUGEINT — Su2 ~ 1.8e22);
  |z_s1,w - z_s2,w| = |u1-u2| / sqrt(D_w / (S*(S-1))) is a float of
  exact integers, quantized per (pair, word) to 1e-6 units and
  integer-summed over the FIXED top-K words; delta = sum / K.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6

_US_PER_DAY = 86_400_000_000
_LR_SCALE = 10**6        # 1e-6 units for per-event-time log-rank terms
_BD_K = 32               # exact top-K vocabulary
_BD_USCALE = 10**12      # 1e-12 units for relative frequencies
_BD_TSCALE = 10**6       # 1e-6 units for per-(pair, word) z-terms


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# log-rank
# ---------------------------------------------------------------------------


def q_logrank_purchase_gaps(sf_dir: str):
    """Two-sample log-rank z on inter-purchase gap days, parity cohorts
    (docstring above)."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_type", "event_id"])

    def gap_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        keep = et == "purchase"
        uid = (t["user_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64)[keep])
        ts = (t["ts"].cast(pa.int64())
              .to_numpy(zero_copy_only=False)[keep])
        eid = (t["event_id"].to_numpy(zero_copy_only=False)
               .astype(np.int64)[keep])
        return pa.table({"user_id": pa.array(uid), "ts": pa.array(ts),
                         "event_id": pa.array(eid),
                         "salt": pa.array(uid % 64)})

    def gaps_partition(df: pd.DataFrame) -> pd.DataFrame:
        # salted partition: recover user boundaries vectorized (the
        # CLAUDE salted-groupby rule — never one map_groups per user)
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        if len(ts) < 2:
            return pd.DataFrame({"grp": pd.Series([], dtype=np.int64),
                                 "gap": pd.Series([], dtype=np.int64),
                                 "cnt": pd.Series([], dtype=np.int64)})
        same = uid[1:] == uid[:-1]
        gap = ((ts[1:] - ts[:-1]) // _US_PER_DAY)[same]
        grp = (uid[1:] % 2)[same]
        g = (pd.DataFrame({"grp": grp, "gap": gap})
             .groupby(["grp", "gap"]).size().rename("cnt").reset_index())
        for col in ("grp", "gap", "cnt"):
            g[col] = g[col].astype(np.int64)
        return g

    cells = (ds.map_batches(gap_partial, batch_format="pyarrow")
               .groupby("salt")
               .map_groups(gaps_partition, batch_format="pandas")
               .groupby(["grp", "gap"])
               .aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    piv = (cells.pivot_table(index="gap", columns="grp", values="cnt",
                             aggfunc="sum", fill_value=0)
                .reindex(columns=[0, 1], fill_value=0)
                .sort_index())
    d0 = piv[0].to_numpy(np.int64)
    d1 = piv[1].to_numpy(np.int64)
    # risk sets: gaps >= t (all uncensored) — reverse cumulative sums
    n0 = d0[::-1].cumsum()[::-1]
    n1 = d1[::-1].cumsum()[::-1]
    oe_u = 0
    v_u = 0
    for a1, dd0, dd1, r0, r1 in zip(piv.index, d0, d1, n0, n1):
        dj = int(dd0) + int(dd1)
        nj = int(r0) + int(r1)
        n1j = int(r1)
        oe = float(dd1) - float(dj) * float(n1j) / float(nj)
        oe_u += int(math.floor(abs(oe * _LR_SCALE) + 0.5)
                    * (1 if oe >= 0 else -1))
        if nj > 1:
            vt = (float(dj) * (float(n1j) / float(nj))
                  * (1.0 - float(n1j) / float(nj))
                  * (float(nj) - float(dj)) / (float(nj) - 1.0))
            v_u += int(math.floor(vt * _LR_SCALE + 0.5))
    oe = float(oe_u) / float(_LR_SCALE)
    v = float(v_u) / float(_LR_SCALE)
    z = oe / math.sqrt(v)
    r6 = _round6(np.array([oe, z]))
    out = pd.DataFrame({"n_gaps_even": [int(d0.sum())],
                        "n_gaps_odd": [int(d1.sum())],
                        "n_times": [int(len(piv))],
                        "oe_units": [oe_u], "v_units": [v_u],
                        "oe6": [r6[0]], "z6": [r6[1]]})
    for col in ("n_gaps_even", "n_gaps_odd", "n_times", "oe_units",
                "v_units"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LOGRANK = f"""
WITH p AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type = 'purchase'),
g AS (
  SELECT user_id % 2 AS grp,
         CAST((epoch_us(ts) - epoch_us(prev)) // {_US_PER_DAY}
              AS BIGINT) AS gap
  FROM p WHERE prev IS NOT NULL),
c AS (
  SELECT gap,
         sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::BIGINT AS d0,
         sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::BIGINT AS d1
  FROM g GROUP BY 1),
r AS (
  SELECT gap, d0, d1, (d0 + d1) AS dj,
         sum(d0 + d1) OVER (ORDER BY gap DESC)::BIGINT AS nj,
         sum(d1) OVER (ORDER BY gap DESC)::BIGINT AS n1j
  FROM c),
t AS (
  SELECT d0, d1, dj, nj, n1j,
         (CAST(d1 AS DOUBLE)
          - CAST(dj AS DOUBLE) * CAST(n1j AS DOUBLE)
            / CAST(nj AS DOUBLE)) AS oe,
         CASE WHEN nj > 1 THEN
           CAST(dj AS DOUBLE) * (CAST(n1j AS DOUBLE) / CAST(nj AS DOUBLE))
           * (1.0 - CAST(n1j AS DOUBLE) / CAST(nj AS DOUBLE))
           * (CAST(nj AS DOUBLE) - CAST(dj AS DOUBLE))
           / (CAST(nj AS DOUBLE) - 1.0)
         ELSE 0.0 END AS vt
  FROM r),
q AS (
  SELECT sum(d0)::BIGINT AS n0, sum(d1)::BIGINT AS n1,
         count(*)::BIGINT AS n_times,
         sum(CAST(round(oe * {_LR_SCALE}) AS BIGINT))::BIGINT AS oe_u,
         sum(CAST(round(vt * {_LR_SCALE}) AS BIGINT))::BIGINT AS v_u
  FROM t)
SELECT n0 AS n_gaps_even, n1 AS n_gaps_odd, n_times,
       oe_u AS oe_units, v_u AS v_units,
       round(CAST(oe_u AS DOUBLE) / {_LR_SCALE}.0, 6) AS oe6,
       round((CAST(oe_u AS DOUBLE) / {_LR_SCALE}.0)
             / sqrt(CAST(v_u AS DOUBLE) / {_LR_SCALE}.0), 6) AS z6
FROM q
"""


# ---------------------------------------------------------------------------
# Cronbach's alpha
# ---------------------------------------------------------------------------


def q_cronbach_alpha_event_types(sf_dir: str):
    """Cronbach's alpha over per-user event-type counts, exact integer
    A/B ratio (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_type"])

    def cnt_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": (t["user_id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64)),
            "event_type": np.asarray(t["event_type"].to_pylist(),
                                     dtype=object)})
        g = df.groupby(["user_id", "event_type"], sort=False).size() \
              .rename("k").reset_index()
        g["k"] = g["k"].astype(np.int64)
        return _strip(g)

    counts = (ds.map_batches(cnt_partial, batch_format="pyarrow")
                .groupby(["user_id", "event_type"])
                .aggregate(Sum("k", alias_name="k"))
                .materialize())           # feeds TWO aggregates below

    def item_partial(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "s1": k, "s2": k * k})
        g = df.groupby("event_type", sort=False).sum().reset_index()
        for col in ("s1", "s2"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    items = (counts.map_batches(item_partial, batch_format="pyarrow")
                   .groupby("event_type")
                   .aggregate(Sum("s1", alias_name="s1"),
                              Sum("s2", alias_name="s2"))
                   .to_pandas())

    def tot_partial(t: pa.Table) -> pa.Table:
        tt = t["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"nu": pa.array([np.int64(len(tt))]),
                         "s1t": pa.array([np.int64(tt.sum())]),
                         "s2t": pa.array([np.int64((tt * tt).sum())])})

    totals = (counts.groupby("user_id")
                    .aggregate(Sum("k", alias_name="t"))
                    .map_batches(tot_partial, batch_format="pyarrow")
                    .to_pandas())
    nu = int(totals["nu"].sum())
    s1t = int(totals["s1t"].sum())
    s2t = int(totals["s2t"].sum())
    k = int(len(items))
    a = sum(nu * int(r.s2) - int(r.s1) * int(r.s1)
            for r in items.itertuples(index=False))
    b = nu * s2t - s1t * s1t
    alpha = (float(k) / (float(k) - 1.0)) * (1.0 - float(a) / float(b))
    out = pd.DataFrame({"n_users": [nu], "k_items": [k], "a": [a],
                        "b": [b],
                        "alpha6": [_round6(np.array([alpha]))[0]]})
    for col in ("n_users", "k_items", "a", "b"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CRONBACH = """
WITH c AS (
  SELECT user_id, event_type, count(*)::BIGINT AS k
  FROM events GROUP BY 1, 2),
n AS (SELECT count(DISTINCT user_id)::BIGINT AS nu FROM events),
pt AS (
  SELECT event_type, sum(k)::BIGINT AS s1, sum(k * k)::BIGINT AS s2
  FROM c GROUP BY 1),
tu AS (SELECT user_id, sum(k)::BIGINT AS t FROM c GROUP BY 1),
tt AS (
  SELECT sum(t)::BIGINT AS s1t, sum(t * t)::BIGINT AS s2t FROM tu),
f AS (
  SELECT n.nu, (SELECT count(*) FROM pt)::BIGINT AS k,
         (SELECT sum(n2.nu * s2 - s1 * s1) FROM pt, n AS n2)::BIGINT AS a,
         (n.nu * tt.s2t - tt.s1t * tt.s1t)::BIGINT AS b
  FROM n, tt)
SELECT nu AS n_users, k AS k_items, a, b,
       round((CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
             * (1.0 - CAST(a AS DOUBLE) / CAST(b AS DOUBLE)), 6)
         AS alpha6
FROM f
"""


# ---------------------------------------------------------------------------
# Burrows' Delta
# ---------------------------------------------------------------------------


def q_burrows_delta_sources(sf_dir: str):
    """Burrows' Delta stylometric distance between source pairs over the
    exact top-K vocabulary (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        src: list[str] = []
        wrd: list[str] = []
        for sname, s in zip(t["source"].to_pylist(),
                            t["text"].to_pylist()):
            for w in s.split():
                src.append(sname)
                wrd.append(w)
        if not src:
            return pa.table({"source": pa.array([], pa.string()),
                             "w": pa.array([], pa.string()),
                             "f": pa.array([], pa.int64())})
        df = pd.DataFrame({"source": src, "w": wrd})
        g = (df.groupby(["source", "w"], sort=False).size()
               .rename("f").reset_index())
        g["f"] = g["f"].astype(np.int64)
        return _strip(g)

    tf = (ds.map_batches(tf_partial, batch_format="pyarrow")
            .groupby(["source", "w"])
            .aggregate(Sum("f", alias_name="f"))
            .materialize())     # feeds top-K, totals AND the K x S matrix

    def top_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"w": t["w"].to_pylist(),
                           "f": (t["f"].to_numpy(zero_copy_only=False)
                                 .astype(np.int64))})
        g = df.groupby("w", sort=False)["f"].sum().reset_index()
        g = g.sort_values(["f", "w"], ascending=[False, True])
        return _strip(g.head(_BD_K))

    # distributed top-K (zipf idiom): per-block candidates, tiny driver cut
    topc = (tf.groupby("w").aggregate(Sum("f", alias_name="f"))
              .map_batches(top_partial, batch_format="pyarrow")
              .to_pandas())
    top = (topc.sort_values(["f", "w"], ascending=[False, True])
               .head(_BD_K)["w"].tolist())
    tot = (tf.groupby("source").aggregate(Sum("f", alias_name="f"))
             .to_pandas().set_index("source")["f"])
    sources = sorted(tot.index.tolist())
    ss = len(sources)
    # u matrix gather: only K x S rows leave the cluster
    topset = set(top)

    def matrix_partial(t: pa.Table) -> pa.Table:
        w = np.asarray(t["w"].to_pylist(), dtype=object)
        keep = np.fromiter((x in topset for x in w), dtype=bool,
                           count=len(w))
        return pa.table({"source": pa.array(
                             np.asarray(t["source"].to_pylist(),
                                        dtype=object)[keep]),
                         "w": pa.array(w[keep]),
                         "f": pa.array(
                             t["f"].to_numpy(zero_copy_only=False)
                             .astype(np.int64)[keep])})

    sub = (tf.map_batches(matrix_partial, batch_format="pyarrow")
             .to_pandas())
    cmap = {(r.source, r.w): int(r.f) for r in sub.itertuples(index=False)}
    u = {}
    for w in top:
        for s in sources:
            x = (float(cmap.get((s, w), 0)) / float(int(tot[s]))
                 * float(_BD_USCALE))
            u[(s, w)] = int(math.floor(x + 0.5))
    dw = {}
    for w in top:
        su = sum(u[(s, w)] for s in sources)
        su2 = sum(u[(s, w)] * u[(s, w)] for s in sources)
        dw[w] = ss * su2 - su * su
    rows = []
    for i in range(ss):
        for j in range(i + 1, ss):
            t_units = 0
            for w in top:
                term = (float(abs(u[(sources[i], w)]
                                  - u[(sources[j], w)]))
                        / math.sqrt(float(dw[w])
                                    / float(ss * (ss - 1))))
                t_units += int(math.floor(term * _BD_TSCALE + 0.5))
            delta = (float(t_units) / float(len(top))) / float(_BD_TSCALE)
            rows.append({"s1": sources[i], "s2": sources[j],
                         "t_units": t_units, "delta6": delta})
    out = pd.DataFrame(rows)
    out["t_units"] = out["t_units"].astype(np.int64)
    out["delta6"] = _round6(out["delta6"].to_numpy(np.float64))
    return out.sort_values(["s1", "s2"]).reset_index(drop=True)


SQL_BURROWS = f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents),
tf AS (
  SELECT source, w, count(*)::BIGINT AS f FROM toks GROUP BY 1, 2),
top AS (
  SELECT w FROM (
    SELECT w, sum(f) AS n FROM tf GROUP BY 1
    ORDER BY n DESC, w LIMIT {_BD_K})),
tot AS (SELECT source, sum(f)::BIGINT AS nt FROM tf GROUP BY 1),
ss AS (SELECT count(*)::BIGINT AS s FROM tot),
u AS (
  SELECT tot.source, top.w,
         CAST(round(CAST(coalesce(tf.f, 0) AS DOUBLE)
                    / CAST(tot.nt AS DOUBLE) * {_BD_USCALE}.0)
              AS HUGEINT) AS u
  FROM tot CROSS JOIN top
  LEFT JOIN tf ON tf.source = tot.source AND tf.w = top.w),
d AS (
  SELECT w, (ss.s * sum(u * u) - sum(u) * sum(u)) AS dw, ss.s
  FROM u, ss GROUP BY w, ss.s),
pairs AS (
  SELECT a.source AS s1, b.source AS s2, a.w,
         abs(a.u - b.u) AS du
  FROM u a JOIN u b ON a.w = b.w AND a.source < b.source),
terms AS (
  SELECT p.s1, p.s2,
         CAST(round(CAST(p.du AS DOUBLE)
                    / sqrt(CAST(d.dw AS DOUBLE)
                           / CAST(d.s * (d.s - 1) AS DOUBLE))
                    * {_BD_TSCALE}) AS BIGINT) AS tu
  FROM pairs p JOIN d ON p.w = d.w),
agg AS (
  SELECT s1, s2, sum(tu)::BIGINT AS t_units, count(*)::BIGINT AS kk
  FROM terms GROUP BY 1, 2)
SELECT s1, s2, t_units,
       round((CAST(t_units AS DOUBLE) / CAST(kk AS DOUBLE))
             / {_BD_TSCALE}.0, 6) AS delta6
FROM agg ORDER BY s1, s2
"""


QUERIES50: dict[str, tuple] = {
    "logrank_purchase_gaps": (q_logrank_purchase_gaps, SQL_LOGRANK),
    "cronbach_alpha_event_types": (q_cronbach_alpha_event_types,
                                   SQL_CRONBACH),
    "burrows_delta_sources": (q_burrows_delta_sources, SQL_BURROWS),
}
