"""One-hundred-forty-ninth oracle-query batch — social choice,
apportionment, and optimal stopping:

- kemeny_ranking_types: the exact Kemeny-Young consensus ranking of
  the top-4 event types over the 30 daily count-rankings. The
  pairwise preference matrix is exact integer day counts; all 24
  candidate permutations are enumerated (4-way distinct cross join in
  SQL, itertools on the Ray side) and the (cost, lexicographic perm)
  argmin is pure integer.
- apportionment_sources: 100 parliamentary seats allocated to the 20
  document sources by doc count under BOTH D'Hondt (top-100 of the
  divisor table votes/j with (quotient DESC, source, j) ordering —
  identical float quotients both sides) and Hare largest-remainder
  (base = votes·S // total and remainder votes·S mod total: pure
  integers). With S = 100 the seat counts ARE percent shares, so the
  Gallagher disproportionality index between the two methods is
  sqrt(Σd²/2) of integer differences.
- secretary_stopping_daily: the 1/e-rule optimal-stopping replay on
  the 30-day event-revenue sequence — skip the first 11 days, accept
  the first day beating the observation maximum (else the last day);
  reports the chosen day, its value and true rank. All integers.
"""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_KM_TOP = 4
_AP_SEATS = 100
_SEC_SKIP = 11


# ---------------------------------------------------------------------------
# Kemeny-Young
# ---------------------------------------------------------------------------


def q_kemeny_ranking_types(sf_dir: str):
    """Exact Kemeny consensus of daily type rankings (docstring)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "ts"])

    def dpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = np.asarray(t["event_type"].to_pylist())
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.int64()).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"day": day, "g": et, "n": np.int64(1)}) \
            .groupby(["day", "g"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    agg = (ds.map_batches(dpart, batch_format="pyarrow")
             .groupby(["day", "g"]).aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    tot = agg.groupby("g")["n"].sum().reset_index() \
        .sort_values(["n", "g"], ascending=[False, True])
    top = sorted(tot["g"].head(_KM_TOP).tolist())
    sub = agg[agg["g"].isin(top)]
    # pairwise: p[u][v] = #days u ranked above v by (count desc, name)
    p = {(u, v): 0 for u in top for v in top if u != v}
    for _, grp in sub.groupby("day"):
        order = grp.sort_values(["n", "g"],
                                ascending=[False, True])["g"].tolist()
        for i, u in enumerate(order):
            for v in order[i + 1:]:
                p[(u, v)] += 1
    best = None
    for perm in itertools.permutations(top):
        cost = sum(p[(v, u)]
                   for i, u in enumerate(perm)
                   for v in perm[i + 1:])
        cand = (cost, perm)
        if best is None or cand < best:
            best = cand
    cost, perm = best
    out = pd.DataFrame({"rank1": [perm[0]], "rank2": [perm[1]],
                        "rank3": [perm[2]], "rank4": [perm[3]],
                        "kemeny_cost": [cost]})
    out["kemeny_cost"] = out["kemeny_cost"].astype(np.int64)
    return out


SQL_KEMENY = f"""
WITH cells AS (
  SELECT date_trunc('day', ts) AS dy, event_type AS g,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
top4 AS (
  SELECT g FROM (
    SELECT g, sum(n) AS tot FROM cells GROUP BY g
    ORDER BY tot DESC, g LIMIT {_KM_TOP})),
r AS (
  SELECT dy, g,
         row_number() OVER (PARTITION BY dy ORDER BY n DESC, g)
           AS pos
  FROM cells WHERE g IN (SELECT g FROM top4)),
pref AS (
  SELECT a.g AS u, b.g AS v, count(*)::BIGINT AS p
  FROM r a JOIN r b ON a.dy = b.dy AND a.pos < b.pos
  GROUP BY 1, 2),
t AS (
  SELECT g, row_number() OVER (ORDER BY g) AS i FROM top4),
perms AS (
  SELECT a.g AS g1, b.g AS g2, c.g AS g3, d.g AS g4
  FROM t a, t b, t c, t d
  WHERE a.i <> b.i AND a.i <> c.i AND a.i <> d.i
    AND b.i <> c.i AND b.i <> d.i AND c.i <> d.i),
cost AS (
  SELECT g1, g2, g3, g4,
    coalesce((SELECT p FROM pref WHERE u = g2 AND v = g1), 0)
    + coalesce((SELECT p FROM pref WHERE u = g3 AND v = g1), 0)
    + coalesce((SELECT p FROM pref WHERE u = g4 AND v = g1), 0)
    + coalesce((SELECT p FROM pref WHERE u = g3 AND v = g2), 0)
    + coalesce((SELECT p FROM pref WHERE u = g4 AND v = g2), 0)
    + coalesce((SELECT p FROM pref WHERE u = g4 AND v = g3), 0)
      AS c
  FROM perms)
SELECT g1 AS rank1, g2 AS rank2, g3 AS rank3, g4 AS rank4,
       c::BIGINT AS kemeny_cost
FROM cost ORDER BY c, g1, g2, g3, g4 LIMIT 1
"""


# ---------------------------------------------------------------------------
# Apportionment
# ---------------------------------------------------------------------------


def q_apportionment_sources(sf_dir: str):
    """D'Hondt vs Hare 100-seat apportionment (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source"])

    def spart(t: pa.Table) -> pa.Table:
        src = np.asarray(t["source"].to_pylist())
        g = pd.DataFrame({"g": src, "n": np.int64(1)}) \
            .groupby("g", sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    votes = (ds.map_batches(spart, batch_format="pyarrow")
               .groupby("g").aggregate(Sum("n", alias_name="n"))
               .to_pandas().sort_values("g").reset_index(drop=True))
    srcs = votes["g"].tolist()
    v = [int(x) for x in votes["n"].tolist()]
    total = sum(v)
    # D'Hondt: top-S of the divisor table
    divs = [(float(v[i]) / float(j), srcs[i], j, i)
            for i in range(len(v))
            for j in range(1, _AP_SEATS + 1)]
    divs.sort(key=lambda r_: (-r_[0], r_[1], r_[2]))
    dh = [0] * len(v)
    for _, _, _, i in divs[:_AP_SEATS]:
        dh[i] += 1
    # Hare largest remainder: exact integers
    base = [vi * _AP_SEATS // total for vi in v]
    rem = [vi * _AP_SEATS % total for vi in v]
    left = _AP_SEATS - sum(base)
    order = sorted(range(len(v)), key=lambda i: (-rem[i], srcs[i]))
    hare = list(base)
    for i in order[:left]:
        hare[i] += 1
    gal = math.sqrt(sum((a - b) ** 2 for a, b in zip(dh, hare))
                    / 2.0)
    top5 = sorted(range(len(v)),
                  key=lambda i: (-v[i], srcs[i]))[:5]
    out = pd.DataFrame({
        "source": [srcs[i] for i in top5],
        "votes": [v[i] for i in top5],
        "dhondt": [dh[i] for i in top5],
        "hare": [hare[i] for i in top5],
        "gallagher6": [_round6(np.array([gal]))[0]] * 5})
    for col in ("votes", "dhondt", "hare"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_APPORTIONMENT = f"""
WITH votes AS (
  SELECT source AS g, count(*)::BIGINT AS v
  FROM documents GROUP BY 1),
tot AS (SELECT sum(v)::BIGINT AS t, count(*)::BIGINT AS np_
        FROM votes),
divtab AS (
  SELECT g, v, j.j,
         CAST(v AS DOUBLE) / CAST(j.j AS DOUBLE) AS q
  FROM votes, (SELECT unnest(range(1, {_AP_SEATS} + 1)) AS j) j),
dh AS (
  SELECT g, count(*)::BIGINT AS seats
  FROM (SELECT g, q, row_number() OVER (ORDER BY q DESC, g, j)
               AS rk
        FROM divtab)
  WHERE rk <= {_AP_SEATS} GROUP BY g),
hare0 AS (
  SELECT votes.g, votes.v,
         (votes.v * {_AP_SEATS}) // tot.t AS base,
         (votes.v * {_AP_SEATS}) % tot.t AS rem
  FROM votes CROSS JOIN tot),
left_ AS (
  SELECT ({_AP_SEATS} - sum(base))::BIGINT AS k FROM hare0),
hare AS (
  SELECT g, v, base
         + CASE WHEN row_number() OVER (ORDER BY rem DESC, g)
                     <= (SELECT k FROM left_)
                THEN 1 ELSE 0 END AS seats
  FROM hare0),
joined AS (
  SELECT votes.g, votes.v, coalesce(dh.seats, 0) AS s1,
         hare.seats AS s2
  FROM votes LEFT JOIN dh ON votes.g = dh.g
       JOIN hare ON votes.g = hare.g),
gal AS (
  SELECT sqrt(CAST(sum((s1 - s2) * (s1 - s2)) AS DOUBLE) / 2.0)
           AS gal
  FROM joined)
SELECT g AS source, v AS votes, s1::BIGINT AS dhondt,
       s2::BIGINT AS hare, round(gal.gal, 6) AS gallagher6
FROM joined CROSS JOIN gal
ORDER BY v DESC, g LIMIT 5
"""


# ---------------------------------------------------------------------------
# Secretary stopping
# ---------------------------------------------------------------------------


def q_secretary_stopping_daily(sf_dir: str):
    """1/e-rule stopping on daily revenue (docstring above)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    y = [int(v) for v in _daily_cents(sf_dir).tolist()]
    n = len(y)
    obs_max = max(y[:_SEC_SKIP])
    chosen = n                       # default: forced to take last
    for t in range(_SEC_SKIP + 1, n + 1):
        if y[t - 1] > obs_max:
            chosen = t
            break
    val = y[chosen - 1]
    rank = 1 + sum(1 for v in y if v > val)
    out = pd.DataFrame({"n_days": [n], "skip": [_SEC_SKIP],
                        "chosen_day": [chosen], "value": [val],
                        "rank": [rank],
                        "is_best": [1 if rank == 1 else 0]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_SECRETARY = f"""
WITH dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) AS t, y FROM dd),
obs AS (
  SELECT max(y)::BIGINT AS m FROM seq WHERE t <= {_SEC_SKIP}),
pick AS (
  SELECT coalesce(min(t), (SELECT max(t) FROM seq))::BIGINT AS t
  FROM seq CROSS JOIN obs
  WHERE t > {_SEC_SKIP} AND y > obs.m),
ch AS (
  SELECT pick.t AS chosen, seq.y AS val
  FROM pick JOIN seq ON seq.t = pick.t)
SELECT (SELECT max(t) FROM seq)::BIGINT AS n_days,
       {_SEC_SKIP}::BIGINT AS skip, ch.chosen AS chosen_day,
       ch.val::BIGINT AS value,
       (1 + (SELECT count(*) FROM seq WHERE y > ch.val))::BIGINT
         AS rank,
       (CASE WHEN (SELECT count(*) FROM seq WHERE y > ch.val) = 0
             THEN 1 ELSE 0 END)::BIGINT AS is_best
FROM ch
"""


QUERIES149: dict[str, tuple] = {
    "kemeny_ranking_types": (q_kemeny_ranking_types, SQL_KEMENY),
    "apportionment_sources": (q_apportionment_sources,
                              SQL_APPORTIONMENT),
    "secretary_stopping_daily": (q_secretary_stopping_daily,
                                 SQL_SECRETARY),
}
