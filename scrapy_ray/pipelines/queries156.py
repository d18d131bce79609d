"""One-hundred-fifty-sixth oracle-query batch — tensor factorization,
wavelet energy, and categorical graph mixing:

- cp_rank1_dow_hour_type: rank-1 CP (PARAFAC) decomposition of the
  (day-of-week × hour × event-type) COUNT tensor via two ALS cycles.
  The first mode update is a pure-integer contraction (v = w = 1
  init); every later contraction quantizes the per-cell contribution
  X·v·w to 1e-6 units before the integer sums, and factor
  normalization is one float sqrt of the quantized-int norm. Reports
  the leading-value estimate and each mode's argmax loading.
- db4_energy_daily: single-level Daubechies-4 wavelet decomposition
  of the 30-day revenue series (periodic boundary). The four D4 taps
  (1±√3)/(4√2) enter as 1e-12-quantized integer constants on both
  sides, so each approximation/detail coefficient is an exact
  integer combination; energies are HUGEINT sums of squares.
- lang_assortativity_docs: the categorical assortativity coefficient
  of document language over the stride-graph edges
  u → (31u+c) mod N: r = (Σe_ii − Σa_i·b_i)/(1 − Σa_i·b_i) with the
  mixing matrix in exact edge counts (cleared to integer algebra:
  r = (E·Σm_ii − Σr_i·c_i)/(E² − Σr_i·c_i)).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_D4_SCALE = 10**12
_SQ3 = math.sqrt(3.0)
_D4 = [int(math.floor(abs(x) * _D4_SCALE + 0.5))
       * (1 if x >= 0 else -1)
       for x in ((1.0 + _SQ3) / (4.0 * math.sqrt(2.0)),
                 (3.0 + _SQ3) / (4.0 * math.sqrt(2.0)),
                 (3.0 - _SQ3) / (4.0 * math.sqrt(2.0)),
                 (1.0 - _SQ3) / (4.0 * math.sqrt(2.0)))]


def _r6i(v: float) -> int:
    return int(math.floor(abs(v) * 1e6 + 0.5)) * (1 if v >= 0 else -1)


# ---------------------------------------------------------------------------
# CP rank-1
# ---------------------------------------------------------------------------


def q_cp_rank1_dow_hour_type(sf_dir: str):
    """Two-cycle rank-1 ALS on the (dow, hour, type) tensor."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dow = pc.day_of_week(t["ts"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hr = pc.hour(t["ts"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = np.asarray(t["event_type"].to_pylist())
        g = pd.DataFrame({"d": dow, "h": hr, "g": et,
                          "n": np.int64(1)}) \
            .groupby(["d", "h", "g"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["d", "h", "g"])
               .aggregate(Sum("n", alias_name="n")).to_pandas())
    arms = sorted(cells["g"].unique().tolist())
    gi = {g_: i for i, g_ in enumerate(arms)}
    x = np.zeros((7, 24, len(arms)), np.int64)
    for _, r_ in cells.iterrows():
        x[int(r_["d"]), int(r_["h"]), gi[r_["g"]]] = int(r_["n"])

    def norm(vec: list[int]) -> list[float]:
        nrm = math.sqrt(float(sum(q * q for q in vec)))
        return [float(q) / nrm for q in vec]

    # cycle 1: v = w = 1  ->  u contraction is EXACT integer
    u_i = [int(x[d].sum()) for d in range(7)]
    u = norm([q * 1000000 for q in u_i])
    v_i = [sum(_r6i(float(int(x[d, h, t_])) * u[d])
               for d in range(7) for t_ in range(len(arms)))
           for h in range(24)]
    v = norm(v_i)
    w_i = [sum(_r6i(float(int(x[d, h, t_])) * u[d] * v[h])
               for d in range(7) for h in range(24))
           for t_ in range(len(arms))]
    w = norm(w_i)
    # cycle 2
    u_i = [sum(_r6i(float(int(x[d, h, t_])) * v[h] * w[t_])
               for h in range(24) for t_ in range(len(arms)))
           for d in range(7)]
    u = norm(u_i)
    v_i = [sum(_r6i(float(int(x[d, h, t_])) * u[d] * w[t_])
               for d in range(7) for t_ in range(len(arms)))
           for h in range(24)]
    v = norm(v_i)
    w_i = [sum(_r6i(float(int(x[d, h, t_])) * u[d] * v[h])
               for d in range(7) for h in range(24))
           for t_ in range(len(arms))]
    lam = math.sqrt(float(sum(q * q for q in w_i))) / 1e6
    w = norm(w_i)
    top_d = max(range(7), key=lambda d: (u[d], -d))
    top_h = max(range(24), key=lambda h: (v[h], -h))
    top_t = max(range(len(arms)), key=lambda t_: (w[t_], -t_))
    out = pd.DataFrame({
        "lambda6": [_round6(np.array([lam]))[0]],
        "top_dow": [top_d], "top_hour": [top_h],
        "top_type": [arms[top_t]],
        "u_top6": [_round6(np.array([u[top_d]]))[0]],
        "v_top6": [_round6(np.array([v[top_h]]))[0]],
        "w_top6": [_round6(np.array([w[top_t]]))[0]]})
    for col in ("top_dow", "top_hour"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CP_RANK1 = """
WITH cells AS (
  SELECT isodow(ts) - 1 AS d, extract(hour FROM ts) AS h,
         event_type AS g, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2, 3),
arms AS MATERIALIZED (
  SELECT g, row_number() OVER (ORDER BY g) - 1 AS ti
  FROM (SELECT DISTINCT g FROM cells)),
u1q AS MATERIALIZED (
  SELECT d AS i, (sum(n) * 1000000)::BIGINT AS q
  FROM cells GROUP BY 1),
u1n AS MATERIALIZED (SELECT sqrt(sum(CAST(q AS HUGEINT) * q)::DOUBLE) AS nrm
        FROM u1q),
u1 AS MATERIALIZED (SELECT i, CAST(q AS DOUBLE) / u1n.nrm AS f
       FROM u1q CROSS JOIN u1n),
v1q AS MATERIALIZED (
  SELECT c.h AS i,
         sum(CAST(round(CAST(c.n AS DOUBLE) * u.f * 1e6) AS BIGINT))
           ::BIGINT AS q
  FROM cells c JOIN u1 u ON u.i = c.d GROUP BY 1),
v1n AS MATERIALIZED (SELECT sqrt(sum(CAST(q AS HUGEINT) * q)::DOUBLE) AS nrm
        FROM v1q),
v1 AS MATERIALIZED (SELECT i, CAST(q AS DOUBLE) / v1n.nrm AS f
       FROM v1q CROSS JOIN v1n),
w1q AS MATERIALIZED (
  SELECT a.ti AS i,
         sum(CAST(round(CAST(c.n AS DOUBLE) * u.f * v.f * 1e6)
                  AS BIGINT))::BIGINT AS q
  FROM cells c JOIN arms a ON a.g = c.g
       JOIN u1 u ON u.i = c.d JOIN v1 v ON v.i = c.h
  GROUP BY 1),
w1n AS MATERIALIZED (SELECT sqrt(sum(CAST(q AS HUGEINT) * q)::DOUBLE) AS nrm
        FROM w1q),
w1 AS MATERIALIZED (SELECT i, CAST(q AS DOUBLE) / w1n.nrm AS f
       FROM w1q CROSS JOIN w1n),
u2q AS MATERIALIZED (
  SELECT c.d AS i,
         sum(CAST(round(CAST(c.n AS DOUBLE) * v.f * w.f * 1e6)
                  AS BIGINT))::BIGINT AS q
  FROM cells c JOIN arms a ON a.g = c.g
       JOIN v1 v ON v.i = c.h JOIN w1 w ON w.i = a.ti
  GROUP BY 1),
u2n AS MATERIALIZED (SELECT sqrt(sum(CAST(q AS HUGEINT) * q)::DOUBLE) AS nrm
        FROM u2q),
u2 AS MATERIALIZED (SELECT i, CAST(q AS DOUBLE) / u2n.nrm AS f
       FROM u2q CROSS JOIN u2n),
v2q AS MATERIALIZED (
  SELECT c.h AS i,
         sum(CAST(round(CAST(c.n AS DOUBLE) * u.f * w.f * 1e6)
                  AS BIGINT))::BIGINT AS q
  FROM cells c JOIN arms a ON a.g = c.g
       JOIN u2 u ON u.i = c.d JOIN w1 w ON w.i = a.ti
  GROUP BY 1),
v2n AS MATERIALIZED (SELECT sqrt(sum(CAST(q AS HUGEINT) * q)::DOUBLE) AS nrm
        FROM v2q),
v2 AS MATERIALIZED (SELECT i, CAST(q AS DOUBLE) / v2n.nrm AS f
       FROM v2q CROSS JOIN v2n),
w2q AS MATERIALIZED (
  SELECT a.ti AS i,
         sum(CAST(round(CAST(c.n AS DOUBLE) * u.f * v.f * 1e6)
                  AS BIGINT))::BIGINT AS q
  FROM cells c JOIN arms a ON a.g = c.g
       JOIN u2 u ON u.i = c.d JOIN v2 v ON v.i = c.h
  GROUP BY 1),
w2n AS MATERIALIZED (SELECT sqrt(sum(CAST(q AS HUGEINT) * q)::DOUBLE) AS nrm
        FROM w2q),
w2 AS MATERIALIZED (SELECT i, CAST(q AS DOUBLE) / w2n.nrm AS f
       FROM w2q CROSS JOIN w2n),
tops AS (
  SELECT
    (SELECT i FROM u2 ORDER BY f DESC, i LIMIT 1) AS top_d,
    (SELECT i FROM v2 ORDER BY f DESC, i LIMIT 1) AS top_h,
    (SELECT i FROM w2 ORDER BY f DESC, i LIMIT 1) AS top_t)
SELECT round(w2n.nrm / 1e6, 6) AS lambda6,
       tops.top_d::BIGINT AS top_dow, tops.top_h::BIGINT AS top_hour,
       (SELECT g FROM arms WHERE ti = tops.top_t) AS top_type,
       round((SELECT f FROM u2 WHERE i = tops.top_d), 6) AS u_top6,
       round((SELECT f FROM v2 WHERE i = tops.top_h), 6) AS v_top6,
       round((SELECT f FROM w2 WHERE i = tops.top_t), 6) AS w_top6
FROM w2n CROSS JOIN tops
"""


# ---------------------------------------------------------------------------
# Daubechies-4 energy
# ---------------------------------------------------------------------------


def q_db4_energy_daily(sf_dir: str):
    """Single-level D4 wavelet energy split (docstring above)."""
    from scrapy_ray.pipelines.queries143 import _daily_cents

    y = [int(v) // 100 for v in _daily_cents(sf_dir).tolist()]
    n = len(y)
    h0, h1, h2, h3 = _D4
    g0, g1, g2, g3 = h3, -h2, h1, -h0
    ea = 0
    ed = 0
    for k in range(n // 2):
        idx = [(2 * k + j) % n for j in range(4)]
        a = (h0 * y[idx[0]] + h1 * y[idx[1]]
             + h2 * y[idx[2]] + h3 * y[idx[3]])
        d = (g0 * y[idx[0]] + g1 * y[idx[1]]
             + g2 * y[idx[2]] + g3 * y[idx[3]])
        ea += a * a
        ed += d * d
    frac = float(ea) / float(ea + ed)
    out = pd.DataFrame({
        "n_days": [n], "n_coef": [n // 2],
        "approx_frac6": [_round6(np.array([frac]))[0]]})
    for col in ("n_days", "n_coef"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_DB4_ENERGY = f"""
WITH dd AS (
  SELECT date_trunc('day', ts) AS dy,
         sum(CAST(round(value * 100) AS BIGINT)) // 100 AS y
  FROM events GROUP BY 1),
seq AS (
  SELECT row_number() OVER (ORDER BY dy) - 1 AS t, y FROM dd),
nn AS (SELECT count(*)::BIGINT AS n FROM seq),
ks AS (SELECT unnest(range((SELECT n FROM nn) // 2)) AS k),
co AS (
  SELECT ks.k,
         {_D4[0]}::HUGEINT * y0.y + {_D4[1]}::HUGEINT * y1.y
         + {_D4[2]}::HUGEINT * y2.y + {_D4[3]}::HUGEINT * y3.y AS a,
         {_D4[3]}::HUGEINT * y0.y - {_D4[2]}::HUGEINT * y1.y
         + {_D4[1]}::HUGEINT * y2.y - {_D4[0]}::HUGEINT * y3.y AS d
  FROM ks
  JOIN seq y0 ON y0.t = (2 * ks.k) % (SELECT n FROM nn)
  JOIN seq y1 ON y1.t = (2 * ks.k + 1) % (SELECT n FROM nn)
  JOIN seq y2 ON y2.t = (2 * ks.k + 2) % (SELECT n FROM nn)
  JOIN seq y3 ON y3.t = (2 * ks.k + 3) % (SELECT n FROM nn)),
e AS (SELECT sum(a * a) AS ea, sum(d * d) AS ed FROM co)
SELECT (SELECT n FROM nn) AS n_days,
       ((SELECT n FROM nn) // 2)::BIGINT AS n_coef,
       round(CAST(e.ea AS DOUBLE)
             / CAST(e.ea + e.ed AS DOUBLE), 6) AS approx_frac6
FROM e
"""


# ---------------------------------------------------------------------------
# Categorical assortativity
# ---------------------------------------------------------------------------


def q_lang_assortativity_docs(sf_dir: str):
    """Categorical lang assortativity on the stride graph."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "lang"])
    n = _nrows(sf_dir, "documents")

    def lmap(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lg = np.asarray(t["lang"].to_pylist())
        rows = []
        for c in (1, 2, 3):
            rows.append(pd.DataFrame({
                "u": ids, "v": (31 * ids + c) % n, "lu": lg}))
        return _strip(pd.concat(rows, ignore_index=True))

    edges = (ds.map_batches(lmap, batch_format="pyarrow")
               .to_pandas())
    langs = (_pq(sf_dir, "documents", columns=["doc_id", "lang"])
             .to_pandas().sort_values("doc_id"))
    lv = langs["lang"].to_numpy()
    edges["lv"] = lv[edges["v"].to_numpy(np.int64)]
    mix = edges.groupby(["lu", "lv"]).size().rename("n").reset_index()
    e_tot = int(mix["n"].sum())
    diag = int(mix[mix["lu"] == mix["lv"]]["n"].sum())
    ri = mix.groupby("lu")["n"].sum()
    ci = mix.groupby("lv")["n"].sum()
    cats = sorted(set(ri.index) | set(ci.index))
    sab = sum(int(ri.get(c_, 0)) * int(ci.get(c_, 0)) for c_ in cats)
    r = (float(e_tot * diag - sab)
         / float(e_tot * e_tot - sab))
    out = pd.DataFrame({"n_edges": [e_tot], "n_same": [diag],
                        "r6": [_round6(np.array([r]))[0]]})
    for col in ("n_edges", "n_same"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LANG_ASSORT = """
WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
e AS (
  SELECT d.doc_id AS u, (31 * d.doc_id + c.c) % nn.n AS v, d.lang
    AS lu
  FROM documents d CROSS JOIN nn,
       (SELECT unnest([1, 2, 3]) AS c) c),
m AS (
  SELECT e.lu, d2.lang AS lv, count(*)::BIGINT AS n
  FROM e JOIN documents d2 ON d2.doc_id = e.v
  GROUP BY 1, 2),
agg AS (
  SELECT sum(n)::BIGINT AS et,
         sum(CASE WHEN lu = lv THEN n ELSE 0 END)::BIGINT AS diag
  FROM m),
marg AS (
  SELECT coalesce(r.lu, c.lv) AS g, coalesce(r.rn, 0) AS rn,
         coalesce(c.cn, 0) AS cn
  FROM (SELECT lu, sum(n) AS rn FROM m GROUP BY lu) r
  FULL OUTER JOIN (SELECT lv, sum(n) AS cn FROM m GROUP BY lv) c
    ON r.lu = c.lv),
sab AS (
  SELECT sum(CAST(rn AS HUGEINT) * cn)::BIGINT AS s FROM marg)
SELECT agg.et AS n_edges, agg.diag AS n_same,
       round(CAST(CAST(agg.et AS HUGEINT) * agg.diag - sab.s
                  AS DOUBLE)
             / CAST(CAST(agg.et AS HUGEINT) * agg.et - sab.s
                    AS DOUBLE), 6) AS r6
FROM agg CROSS JOIN sab
"""


QUERIES156: dict[str, tuple] = {
    "cp_rank1_dow_hour_type": (q_cp_rank1_dow_hour_type, SQL_CP_RANK1),
    "db4_energy_daily": (q_db4_energy_daily, SQL_DB4_ENERGY),
    "lang_assortativity_docs": (q_lang_assortativity_docs,
                                SQL_LANG_ASSORT),
}
