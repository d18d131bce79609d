"""One-hundred-thirty-eighth oracle-query batch — actuarial methods
(probed first: per-user credibility is degenerate on this data —
between-user variance < within noise, â < 0 — so the credibility
risks are EVENT TYPES, which are genuinely heterogeneous; a
chain-ladder triangle was rejected because synthetic ship dates are
independent of order dates):

- panjer_aggregate_loss: Panjer recursion for the compound-Poisson
  aggregate of daily purchase "claims" — λ = purchases/observed-days
  (exact ratio), severities bucketed to min(20, 1 + cents//5000)
  $50-units with exact count ratios; the float recursion
  g_s = (λ/s)·Σ j·f_j·g_{s−j} is replayed step-for-step in a
  recursive CTE carrying (g LIST, running CDF), like the Erlang
  device.
- buhlmann_credibility_types: Bühlmann-Straub credibility over
  event-type risks: within variance ŝ² and hypothetical-mean
  variance â from the once-quantized ANOVA SS devices; per-type
  Z_i = n_i/(n_i + ŝ²/â) and the credibility premium
  Z·X̄_i + (1−Z)·m̂ finalize identically.
- ecomor_reinsurance: ECOMOR(5) and largest-claims statistics over
  purchase values — Σ top-5 − 5·(6th largest) and the top-5 share of
  total — PURE integers until the one share division. Top values by
  (cents desc, event_id asc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq, _ts_minmax_us
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries121 import _rint, _type_moments

_PANJER_SMAX = 40
_PANJER_JMAX = 20


# ---------------------------------------------------------------------------
# Panjer recursion
# ---------------------------------------------------------------------------


def q_panjer_aggregate_loss(sf_dir: str):
    """Compound-Poisson aggregate-loss CDF via Panjer (docstring)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value", "ts"])
    mn_us, mx_us = _ts_minmax_us(sf_dir, "events")
    n_days = (mx_us // 86_400_000_000) - (mn_us // 86_400_000_000) + 1

    def ppart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        m = et == "purchase"
        u = np.minimum(_PANJER_JMAX, 1 + cents[m] // 5000)
        g = pd.DataFrame({"j": u, "c": np.int64(1)}) \
            .groupby("j", sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        from scrapy_ray.pipelines.queries47 import _strip
        return _strip(g)

    h = (ds.map_batches(ppart, batch_format="pyarrow")
           .groupby("j").aggregate(Sum("c", alias_name="c"))
           .to_pandas().sort_values("j").reset_index(drop=True))
    cnt = np.zeros(_PANJER_JMAX + 1, np.int64)
    cnt[h["j"].to_numpy(np.int64)] = h["c"].to_numpy(np.int64)
    n_cl = int(cnt.sum())
    lam = float(n_cl) / float(n_days)
    f = [float(int(c)) / float(n_cl) for c in cnt]   # f[0] unused (=0)
    g = [np.exp(-lam)]
    cdf = [g[0]]
    for s_ in range(1, _PANJER_SMAX + 1):
        acc = 0.0
        for j in range(1, min(s_, _PANJER_JMAX) + 1):
            acc = acc + float(j) * f[j] * g[s_ - j]
        gs = (lam / float(s_)) * acc
        g.append(gs)
        cdf.append(cdf[-1] + gs)
    out = pd.DataFrame({
        "n_claims": [n_cl], "n_days": [int(n_days)],
        "lam6": [_round6(np.array([lam]))[0]],
        "g0_6": [_round6(np.array([g[0]]))[0]],
        "cdf10_6": [_round6(np.array([cdf[10]]))[0]],
        "cdf20_6": [_round6(np.array([cdf[20]]))[0]],
        "cdf40_6": [_round6(np.array([cdf[40]]))[0]]})
    for col in ("n_claims", "n_days"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PANJER = f"""
WITH RECURSIVE sp AS (
  SELECT max(epoch_us(ts)) // 86400000000
         - min(epoch_us(ts)) // 86400000000 + 1 AS n_days
  FROM events),
cl AS (
  SELECT least({_PANJER_JMAX},
               1 + CAST(round(value * 100) AS BIGINT) // 5000) AS j
  FROM events WHERE event_type = 'purchase'),
nc AS (SELECT count(*)::BIGINT AS n FROM cl),
fh AS (
  SELECT g.j, CAST(coalesce(c.c, 0) AS DOUBLE)
                / CAST((SELECT n FROM nc) AS DOUBLE) AS f
  FROM (SELECT unnest(range(1, {_PANJER_JMAX} + 1)) AS j) g
  LEFT JOIN (SELECT j, count(*)::BIGINT AS c FROM cl GROUP BY 1) c
    USING (j)),
fv AS (SELECT list(f ORDER BY j) AS f FROM fh),
lm AS (
  SELECT CAST((SELECT n FROM nc) AS DOUBLE)
           / CAST((SELECT n_days FROM sp) AS DOUBLE) AS lam),
pj AS (
  SELECT 0 AS s, [exp(-lam)] AS g, exp(-lam) AS cdf
  FROM lm
  UNION ALL
  SELECT s + 1,
         list_append(g,
           (lam / CAST(s + 1 AS DOUBLE))
           * list_sum([CAST(j AS DOUBLE) * f[j] * g[s + 2 - j]
                       FOR j IN range(1,
                                      least(s + 1, {_PANJER_JMAX})
                                      + 1)])),
         cdf + (lam / CAST(s + 1 AS DOUBLE))
               * list_sum([CAST(j AS DOUBLE) * f[j] * g[s + 2 - j]
                           FOR j IN range(1,
                                          least(s + 1,
                                                {_PANJER_JMAX}) + 1)])
  FROM pj CROSS JOIN fv CROSS JOIN lm
  WHERE s < {_PANJER_SMAX})
SELECT (SELECT n FROM nc) AS n_claims,
       (SELECT n_days FROM sp)::BIGINT AS n_days,
       round((SELECT lam FROM lm), 6) AS lam6,
       round(g[1], 6) AS g0_6,
       round((SELECT cdf FROM pj WHERE s = 10), 6) AS cdf10_6,
       round((SELECT cdf FROM pj WHERE s = 20), 6) AS cdf20_6,
       round((SELECT cdf FROM pj WHERE s = 40), 6) AS cdf40_6
FROM pj WHERE s = {_PANJER_SMAX}
"""


# ---------------------------------------------------------------------------
# Bühlmann-Straub credibility
# ---------------------------------------------------------------------------


def q_buhlmann_credibility_types(sf_dir: str):
    """Credibility premiums per event-type risk (docstring above)."""
    g = _type_moments(sf_dir)
    ts = list(g["t"])
    n = [int(x) for x in g["n"]]
    s = [int(x) for x in g["s"]]
    q = [int(x) for x in g["q"]]
    k = len(n)
    nn = sum(n)
    ss = sum(s)
    ssw6 = 0
    ssb6 = -_rint(float(ss * ss) / float(nn) * 1000000.0)
    sn2 = 0
    for i in range(k):
        ssw6 += _rint(float(n[i] * q[i] - s[i] * s[i])
                      / float(n[i]) * 1000000.0)
        ssb6 += _rint(float(s[i] * s[i]) / float(n[i]) * 1000000.0)
        sn2 += n[i] * n[i]
    s2 = float(ssw6) / 1000000.0 / float(nn - k)
    a = ((float(ssb6) / 1000000.0 - float(k - 1) * s2)
         / (float(nn) - float(sn2) / float(nn)))
    mhat = float(ss) / float(nn)
    rows = []
    for i in range(k):
        z = float(n[i]) / (float(n[i]) + s2 / a)
        xb = float(s[i]) / float(n[i])
        prem = z * xb + (1.0 - z) * mhat
        rows.append((ts[i], n[i], _round6(np.array([z]))[0],
                     _round6(np.array([xb]))[0],
                     _round6(np.array([prem]))[0]))
    out = pd.DataFrame(rows, columns=["t", "n", "z6", "xbar6",
                                      "premium6"])
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_BUHLMANN = """
WITH g AS (
  SELECT event_type AS t, count(*)::BIGINT AS n,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS s,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
             * CAST(round(value * 100) AS BIGINT)) AS q
  FROM events GROUP BY 1),
tot AS (
  SELECT sum(n)::BIGINT AS nn, count(*)::BIGINT AS k,
         sum(s)::BIGINT AS ss,
         sum(CAST(n AS HUGEINT) * n)::BIGINT AS sn2
  FROM g),
aq AS (
  SELECT
    sum(CAST(round(
      CAST(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s AS DOUBLE)
      / CAST(n AS DOUBLE) * 1000000.0) AS HUGEINT)) AS ssw6,
    sum(CAST(round(
      CAST(CAST(s AS HUGEINT) * s AS DOUBLE)
      / CAST(n AS DOUBLE) * 1000000.0) AS HUGEINT)) AS sb6
  FROM g),
f AS (
  SELECT k, nn, ss, sn2,
         CAST(ssw6 AS DOUBLE) / 1000000.0 / CAST(nn - k AS DOUBLE)
           AS s2,
         (CAST(sb6 - CAST(round(
              CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE)
              / CAST(nn AS DOUBLE) * 1000000.0) AS HUGEINT) AS DOUBLE)
            / 1000000.0
          - CAST(k - 1 AS DOUBLE)
            * (CAST(ssw6 AS DOUBLE) / 1000000.0
               / CAST(nn - k AS DOUBLE)))
         / (CAST(nn AS DOUBLE)
            - CAST(sn2 AS DOUBLE) / CAST(nn AS DOUBLE)) AS a
  FROM aq CROSS JOIN tot)
SELECT g.t, g.n,
       round(CAST(g.n AS DOUBLE)
             / (CAST(g.n AS DOUBLE) + f.s2 / f.a), 6) AS z6,
       round(CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS xbar6,
       round((CAST(g.n AS DOUBLE)
              / (CAST(g.n AS DOUBLE) + f.s2 / f.a))
             * (CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
             + (1.0 - CAST(g.n AS DOUBLE)
                      / (CAST(g.n AS DOUBLE) + f.s2 / f.a))
               * (CAST(f.ss AS DOUBLE) / CAST(f.nn AS DOUBLE)), 6)
         AS premium6
FROM g CROSS JOIN f ORDER BY g.t
"""


# ---------------------------------------------------------------------------
# ECOMOR / largest claims
# ---------------------------------------------------------------------------


def q_ecomor_reinsurance(sf_dir: str):
    """ECOMOR(5) and top-5 share of purchase claims (docstring)."""
    ds = _pq(sf_dir, "events",
             columns=["event_id", "event_type", "value"])

    def tpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = et == "purchase"
        c, e = cents[m], eid[m]
        order = np.lexsort((e, -c))[:6]
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "tot": pa.array([int(c.sum())], pa.int64()),
            "n": pa.array([int(m.sum())], pa.int64()),
            "top_c": pa.array([c[order].tolist()],
                              pa.list_(pa.int64())),
            "top_e": pa.array([e[order].tolist()],
                              pa.list_(pa.int64()))})

    parts = (ds.map_batches(tpart, batch_format="pyarrow")
             .to_pandas())
    tot = int(parts["tot"].sum())
    n = int(parts["n"].sum())
    cs = np.concatenate([np.asarray(x, np.int64)
                         for x in parts["top_c"]])
    es = np.concatenate([np.asarray(x, np.int64)
                         for x in parts["top_e"]])
    order = np.lexsort((es, -cs))[:6]
    top = cs[order]
    top5 = int(top[:5].sum())
    sixth = int(top[5])
    ecomor = top5 - 5 * sixth
    share = float(top5) / float(tot)
    out = pd.DataFrame({
        "n_claims": [n], "total_cents": [tot], "top5_sum": [top5],
        "sixth": [sixth], "ecomor5": [ecomor],
        "share6": [_round6(np.array([share]))[0]]})
    for col in ("n_claims", "total_cents", "top5_sum", "sixth",
                "ecomor5"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ECOMOR = """
WITH cl AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'),
t AS (SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS tot FROM cl),
r AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, event_id) AS rn
  FROM cl),
k AS (
  SELECT sum(CASE WHEN rn <= 5 THEN c ELSE 0 END)::BIGINT AS top5,
         max(CASE WHEN rn = 6 THEN c END)::BIGINT AS sixth
  FROM r WHERE rn <= 6)
SELECT t.n AS n_claims, t.tot AS total_cents, k.top5 AS top5_sum,
       k.sixth, (k.top5 - 5 * k.sixth)::BIGINT AS ecomor5,
       round(CAST(k.top5 AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
         AS share6
FROM t CROSS JOIN k
"""


QUERIES138: dict[str, tuple] = {
    "panjer_aggregate_loss": (q_panjer_aggregate_loss, SQL_PANJER),
    "buhlmann_credibility_types": (q_buhlmann_credibility_types,
                                   SQL_BUHLMANN),
    "ecomor_reinsurance": (q_ecomor_reinsurance, SQL_ECOMOR),
}
