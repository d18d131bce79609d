"""One-hundred-seventy-eighth oracle-query batch — mixing diagnostics,
probabilistic record linkage, and the BCa bootstrap:

- markov_mixing_tv: total-variation mixing of the per-user event-type
  Markov chain — the 5×5 transition matrix quantized once to 1e-12,
  then P^t replayed for t = 1..16 with per-term pre-sum quantization
  (the Sinkhorn device: every product is an exact integer before any
  sum, so float order can never bite). Reports the classical pairwise
  d̄(t) = max_{i,i'} TV(P^t(i,·), P^t(i',·)) at t = 1, 2, 4, 8 and
  the first t with d̄ < 0.05 (compared as integers vs 1e11).
- fellegi_sunter_weights: record-linkage match weights log2(m/u) for
  three customer fields (mktsegment, balance sign, balance kilo-
  bucket) with "same nation" as ground truth — every m and u is a
  ratio of EXACT pair counts computed from grouped C(n,2) sums
  (within-agree / within vs cross-agree / cross), no pair join.
- bca_bootstrap_mean: the bias-corrected-and-accelerated bootstrap
  CI of mean order value on top of the existing deterministic
  Poisson-bootstrap replicas (queries20) — z0 from the replica-below-
  observed count through an EMBEDDED Φ⁻¹(k/32) literal table
  (bisected once against the shared A&S polynomial and repr()-spliced
  into the SQL), acceleration a from HUGEINT-cleared third central
  moments (the jackknife closed form for the mean), adjusted levels
  through the A&S Φ, endpoints by rank ceil(α·B) over (mean, b).
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
from scrapy_ray.pipelines.queries20 import (_BOOT_B,
                                            q_bootstrap_mean_value,
                                            SQL_BOOTSTRAP_MEAN)
from scrapy_ray.pipelines.queries147 import _phi_upper_p

_MIX_T = 16
_MIX_THRESH_Q = 100_000_000_000          # 2*TV*1e12 < this  (TV<0.05)


# ---------------------------------------------------------------------------
# Markov mixing (pairwise TV decay)
# ---------------------------------------------------------------------------


def _transition_counts(sf_dir: str) -> tuple[list, np.ndarray]:
    """(sorted type names, 5x5 transition count matrix), distributed
    per-user consecutive pairs in (ts, event_id) order."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"])

    def salt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u),
                         "ts": t["ts"].cast(pa.int64()),
                         "e": t["event_id"], "et": t["event_type"],
                         "sk": pa.array(u % 64)})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts", "e"], kind="mergesort")
        u = df["u"].to_numpy(np.int64)
        et = df["et"].to_numpy()
        same = u[1:] == u[:-1]
        g = (pd.DataFrame({"a": et[:-1][same], "b": et[1:][same],
                           "n": np.int64(1)})
             .groupby(["a", "b"], sort=False).sum().reset_index())
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(salt, batch_format="pyarrow")
               .groupby("sk").map_groups(pairs,
                                         batch_format="pandas")
               .groupby(["a", "b"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    names = sorted(set(cells["a"]) | set(cells["b"]))
    k = len(names)
    idx = {n: i for i, n in enumerate(names)}
    cm = np.zeros((k, k), np.int64)
    for _, r in cells.iterrows():
        cm[idx[r["a"]], idx[r["b"]]] = int(r["n"])
    return names, cm


def q_markov_mixing_tv(sf_dir: str):
    """Pairwise-TV mixing decay of P^t (docstring above)."""
    names, cm = _transition_counts(sf_dir)
    k = len(cm)
    rows = cm.sum(axis=1)
    qp = [[int(math.floor(cm[i][j] / rows[i] * 1e12 + 0.5))
           for j in range(k)] for i in range(k)]
    qm = [r[:] for r in qp]

    def dbar(m) -> int:
        best = 0
        for i in range(k):
            for i2 in range(i + 1, k):
                s = sum(abs(m[i][j] - m[i2][j]) for j in range(k))
                best = max(best, s)
        return best

    dbars = []
    for _ in range(_MIX_T):
        dbars.append(dbar(qm))
        nxt = [[0] * k for _ in range(k)]
        for i in range(k):
            for j in range(k):
                s = 0
                for kk in range(k):
                    s += int(math.floor(
                        (qm[i][kk] / 1e12) * (qp[kk][j] / 1e12)
                        * 1e12 + 0.5))
                nxt[i][j] = s
        qm = nxt
    # dbars[t-1] is d-bar AT step t (qm held P^t when appended)
    mix_t = 0
    for t, d in enumerate(dbars, start=1):
        if d < _MIX_THRESH_Q:
            mix_t = t
            break
    r6 = _round6(np.array([dbars[0] / 2e12, dbars[1] / 2e12,
                           dbars[3] / 2e12, dbars[7] / 2e12]))
    out = pd.DataFrame({"n_states": [k], "tv1_6": [r6[0]],
                        "tv2_6": [r6[1]], "tv4_6": [r6[2]],
                        "tv8_6": [r6[3]], "mix_t": [mix_t]})
    for col in ("n_states", "mix_t"):
        out[col] = out[col].astype(np.int64)
    return out


_PAIR_A = [1, 1, 1, 1, 2, 2, 2, 3, 3, 4]
_PAIR_B = [2, 3, 4, 5, 3, 4, 5, 4, 5, 5]

SQL_MIXING = f"""
WITH RECURSIVE tr AS (
  SELECT a, b, count(*)::BIGINT AS n
  FROM (
    SELECT lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS a,
           event_type AS b
    FROM events)
  WHERE a IS NOT NULL GROUP BY a, b),
states AS (
  SELECT s, row_number() OVER (ORDER BY s) AS si
  FROM (SELECT DISTINCT a AS s FROM tr
        UNION SELECT DISTINCT b FROM tr)),
rows_ AS (SELECT a, sum(n)::BIGINT AS r FROM tr GROUP BY a),
dense AS (
  SELECT sa.si AS i, sb.si AS j,
         CAST(floor(CAST(coalesce(t.n, 0) AS DOUBLE)
                    / CAST(r.r AS DOUBLE) * 1e12 + 5e-1)
              AS BIGINT) AS q
  FROM states sa CROSS JOIN states sb
  JOIN rows_ r ON r.a = sa.s
  LEFT JOIN tr t ON t.a = sa.s AND t.b = sb.s),
k AS (SELECT count(*)::BIGINT AS k FROM states),
pv AS (
  SELECT (SELECT list(q ORDER BY i * 100 + j) FROM dense) AS qp,
         (SELECT k FROM k) AS k,
         {_PAIR_A} AS pa, {_PAIR_B} AS pb),
sim AS (
  SELECT 0 AS t, qp, qp AS qm, k, pa, pb,
         []::BIGINT[] AS dbars
  FROM pv
  UNION ALL
  SELECT t + 1, qp,
         CASE WHEN t + 1 < {_MIX_T} THEN
           [CAST(list_sum([CAST(floor(
              (qm[((ij - 1) // k) * k + kk] / 1e12)
              * (qp[(kk - 1) * k + ((ij - 1) % k) + 1] / 1e12)
              * 1e12 + 5e-1) AS BIGINT)
              FOR kk IN range(1, k + 1)]) AS BIGINT)
            FOR ij IN range(1, k * k + 1)]
         ELSE qm END,
         k, pa, pb,
         list_append(dbars,
           list_max([CAST(list_sum(
             [abs(qm[(pa[pp] - 1) * k + jj]
                  - qm[(pb[pp] - 1) * k + jj])
              FOR jj IN range(1, k + 1)]) AS BIGINT)
             FOR pp IN range(1, len(pa) + 1)
             IF pa[pp] <= k AND pb[pp] <= k]))
  FROM sim WHERE t < {_MIX_T}),
fin AS (SELECT * FROM sim WHERE t = {_MIX_T}),
mt AS (
  SELECT coalesce(list_min(
           [tt FOR tt IN range(1, {_MIX_T} + 1)
            IF dbars[tt] < {_MIX_THRESH_Q}]), 0) AS mix_t
  FROM fin)
SELECT fin.k AS n_states,
       round(fin.dbars[1] / 2e12, 6) AS tv1_6,
       round(fin.dbars[2] / 2e12, 6) AS tv2_6,
       round(fin.dbars[4] / 2e12, 6) AS tv4_6,
       round(fin.dbars[8] / 2e12, 6) AS tv8_6,
       mt.mix_t::BIGINT AS mix_t
FROM fin, mt
"""


# ---------------------------------------------------------------------------
# Fellegi-Sunter
# ---------------------------------------------------------------------------


def q_fellegi_sunter_weights(sf_dir: str):
    """log2(m/u) match weights, same-nation truth (docstring)."""
    ds = _pq(sf_dir, "customer",
             columns=["c_nationkey", "c_mktsegment", "c_acctbal"])

    def fpart(t: pa.Table) -> pa.Table:
        nat = t["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        seg = np.asarray(t["c_mktsegment"].to_pylist(), dtype=object)
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = (np.sign(bal) * np.floor(np.abs(bal) * 100.0 + 0.5)) \
            .astype(np.int64)
        pos = (cents > 0).astype(np.int64)
        # DuckDB integer // TRUNCATES toward zero (numpy floors) —
        # mirror the truncation explicitly for negative balances
        kb = (np.sign(cents) * (np.abs(cents) // 100_000)) \
            .astype(np.int64)
        g = (pd.DataFrame({"nat": nat, "seg": seg.astype(str),
                           "pos": pos, "kb": kb,
                           "n": np.int64(1)})
             .groupby(["nat", "seg", "pos", "kb"], sort=False)
             .sum().reset_index())
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(fpart, batch_format="pyarrow")
               .groupby(["nat", "seg", "pos", "kb"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())

    def c2(v: int) -> int:
        return v * (v - 1) // 2

    ntot = int(cells["n"].sum())
    tot_pairs = c2(ntot)
    within = sum(c2(int(v)) for v in
                 cells.groupby("nat")["n"].sum())
    cross = tot_pairs - within
    rows = []
    for field in ("seg", "pos", "kb"):
        agree_all = sum(c2(int(v)) for v in
                        cells.groupby(field)["n"].sum())
        agree_within = sum(
            c2(int(v)) for v in
            cells.groupby(["nat", field])["n"].sum())
        agree_cross = agree_all - agree_within
        m = float(agree_within) / float(within)
        u = float(agree_cross) / float(cross)
        w = math.log2(m / u)
        r6 = _round6(np.array([m, u, w]))
        rows.append({"field": field, "m6": r6[0], "u6": r6[1],
                     "weight6": r6[2]})
    out = pd.DataFrame(rows).sort_values("field") \
        .reset_index(drop=True)
    return out


SQL_FS = """
WITH cells AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         (CAST(round(c_acctbal * 100) AS BIGINT) > 0)::INT AS pos,
         CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS kb,
         count(*)::BIGINT AS n
  FROM customer GROUP BY 1, 2, 3, 4),
tot AS (
  SELECT sum(n)::BIGINT AS ntot,
         (sum(n) * (sum(n) - 1) // 2)::BIGINT AS tot_pairs
  FROM cells),
wn AS (
  SELECT sum(g * (g - 1) // 2)::BIGINT AS within
  FROM (SELECT sum(n)::BIGINT AS g FROM cells GROUP BY nat)),
fields AS (
  SELECT 'kb' AS field,
         (SELECT sum(g * (g - 1) // 2)
          FROM (SELECT sum(n)::BIGINT AS g FROM cells
                GROUP BY kb))::BIGINT AS agree_all,
         (SELECT sum(g * (g - 1) // 2)
          FROM (SELECT sum(n)::BIGINT AS g FROM cells
                GROUP BY nat, kb))::BIGINT AS agree_within
  UNION ALL
  SELECT 'pos',
         (SELECT sum(g * (g - 1) // 2)
          FROM (SELECT sum(n)::BIGINT AS g FROM cells
                GROUP BY pos))::BIGINT,
         (SELECT sum(g * (g - 1) // 2)
          FROM (SELECT sum(n)::BIGINT AS g FROM cells
                GROUP BY nat, pos))::BIGINT
  UNION ALL
  SELECT 'seg',
         (SELECT sum(g * (g - 1) // 2)
          FROM (SELECT sum(n)::BIGINT AS g FROM cells
                GROUP BY seg))::BIGINT,
         (SELECT sum(g * (g - 1) // 2)
          FROM (SELECT sum(n)::BIGINT AS g FROM cells
                GROUP BY nat, seg))::BIGINT),
f AS (
  SELECT field,
         CAST(agree_within AS DOUBLE)
           / CAST((SELECT within FROM wn) AS DOUBLE) AS m,
         CAST(agree_all - agree_within AS DOUBLE)
           / CAST((SELECT tot_pairs FROM tot)
                  - (SELECT within FROM wn) AS DOUBLE) AS u
  FROM fields)
SELECT field, round(m, 6) AS m6, round(u, 6) AS u6,
       round(log2(m / u), 6) AS weight6
FROM f ORDER BY field
"""


# ---------------------------------------------------------------------------
# BCa bootstrap
# ---------------------------------------------------------------------------


def _phi(z: float) -> float:
    return 1.0 - _phi_upper_p(z)


def _phi_inv(p: float) -> float:
    lo, hi = -10.0, 10.0
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if _phi(mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


_Z0_TAB = [_phi_inv(k / _BOOT_B) for k in range(1, _BOOT_B)]
_Z_LO = -1.959964
_Z_HI = 1.959964


def q_bca_bootstrap_mean(sf_dir: str):
    """BCa CI of mean order value over the Poisson replicas."""
    reps = q_bootstrap_mean_value(sf_dir)
    means = reps["mean_v"].to_numpy(np.float64)
    bs = reps["b"].to_numpy(np.int64)

    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    # acceleration moments in WHOLE DOLLARS (a is scale-invariant;
    # cents-cubed sums would graze the HUGEINT ceiling at sf0.1)
    def mpart(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        d = (np.sign(p) * np.floor(np.abs(p) + 0.5)) \
            .astype(np.int64)
        di = [int(v) for v in d]
        return pa.table({
            "n": pa.array([len(di)], pa.int64()),
            "s1c": pa.array([int(c.sum())], pa.int64()),
            "s1d": pa.array([sum(di)], pa.int64()),
            "s2d": pa.array([str(sum(v * v for v in di))],
                            pa.string()),
            "s3d": pa.array([str(sum(v * v * v for v in di))],
                            pa.string())})

    parts = (ds.map_batches(mpart, batch_format="pyarrow")
               .to_pandas())
    n = int(parts["n"].sum())
    s1c = int(parts["s1c"].sum())
    s1 = sum(int(v) for v in parts["s1d"])
    s2 = sum(int(v) for v in parts["s2d"])
    s3 = sum(int(v) for v in parts["s3d"])
    obs = float(s1c) / float(n) / 100.0
    kcnt = int((means < obs).sum())
    kcl = min(max(kcnt, 1), _BOOT_B - 1)
    z0 = _Z0_TAB[kcl - 1]
    m2num = n * s2 - s1 * s1
    m3num = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
    d2 = float(m2num) / n
    d3 = float(m3num) / (float(n) * float(n))
    a = d3 / (6.0 * (d2 * math.sqrt(d2)))
    lo_w = z0 + _Z_LO
    hi_w = z0 + _Z_HI
    a_lo = _phi(z0 + lo_w / (1.0 - a * lo_w))
    a_hi = _phi(z0 + hi_w / (1.0 - a * hi_w))
    order = np.lexsort((bs, means))
    sm = means[order]

    def at(alpha: float) -> float:
        r = min(max(int(math.ceil(alpha * _BOOT_B)), 1), _BOOT_B)
        return float(sm[r - 1])

    r6 = _round6(np.array([obs, z0, a, at(a_lo), at(a_hi)]))
    out = pd.DataFrame({"n_orders": [n], "k_below": [kcnt],
                        "obs_mean6": [r6[0]], "z0_6": [r6[1]],
                        "a6": [r6[2]], "ci_lo6": [r6[3]],
                        "ci_hi6": [r6[4]]})
    for col in ("n_orders", "k_below"):
        out[col] = out[col].astype(np.int64)
    return out


def _phi_sql(z: str) -> str:
    """A&S 26.2.17 Φ(z) as a SQL expression (identical polynomial)."""
    t = f"(1.0 / (1.0 + 0.2316419 * abs({z})))"
    poly = (f"({t} * (0.319381530 + {t} * (-0.356563782 + {t} "
            f"* (1.781477937 + {t} * (-1.821255978 + {t} "
            f"* 1.330274429)))))")
    tail = (f"((exp(-abs({z}) * abs({z}) / 2.0) "
            f"/ sqrt(2.0 * pi())) * {poly})")
    return (f"(CASE WHEN {z} >= 0.0 THEN 1.0 - {tail} "
            f"ELSE {tail} END)")


SQL_BCA = f"""
WITH reps AS (SELECT * FROM ({SQL_BOOTSTRAP_MEAN}) q),
mom AS (
  SELECT count(*)::BIGINT AS n,
         sum(c)::BIGINT AS s1c,
         sum(d)::BIGINT AS s1,
         sum(CAST(d AS HUGEINT) * d) AS s2,
         sum(CAST(d AS HUGEINT) * d * d) AS s3
  FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
               CAST(round(o_totalprice) AS BIGINT) AS d
        FROM orders)),
obs AS (
  SELECT n, s1, s2, s3,
         CAST(s1c AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS obs
  FROM mom),
kc AS (
  SELECT least(greatest((SELECT count(*) FROM reps, obs
                         WHERE reps.mean_v < obs.obs), 1),
               {_BOOT_B - 1}) AS kcl,
         (SELECT count(*) FROM reps, obs
          WHERE reps.mean_v < obs.obs)::BIGINT AS kcnt),
z0t AS (SELECT [{", ".join(repr(v) for v in _Z0_TAB)}]::DOUBLE[]
          AS zt),
acc AS (
  SELECT n, obs,
         CAST(n * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
           / n AS d2,
         CAST(CAST(n AS HUGEINT) * n * s3
              - 3 * n * CAST(s1 AS HUGEINT) * s2
              + 2 * CAST(s1 AS HUGEINT) * s1 * s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS d3
  FROM obs),
par AS (
  SELECT acc.n, acc.obs, kc.kcnt,
         z0t.zt[kc.kcl] AS z0,
         acc.d3 / (6.0 * (acc.d2 * sqrt(acc.d2))) AS a
  FROM acc, kc, z0t),
lv AS (
  SELECT n, obs, kcnt, z0, a,
         {_phi_sql(f"(z0 + (z0 + {_Z_LO}) / (1.0 - a * (z0 + {_Z_LO})))")} AS a_lo,
         {_phi_sql(f"(z0 + (z0 + {_Z_HI}) / (1.0 - a * (z0 + {_Z_HI})))")} AS a_hi
  FROM par),
rk AS (
  SELECT mean_v, row_number() OVER (ORDER BY mean_v, b) AS r
  FROM reps)
SELECT lv.n AS n_orders, lv.kcnt AS k_below,
       round(lv.obs, 6) AS obs_mean6, round(lv.z0, 6) AS z0_6,
       round(lv.a, 6) AS a6,
       round((SELECT mean_v FROM rk WHERE r =
              least(greatest(CAST(ceil(lv.a_lo * {_BOOT_B})
                                  AS BIGINT), 1), {_BOOT_B})), 6)
         AS ci_lo6,
       round((SELECT mean_v FROM rk WHERE r =
              least(greatest(CAST(ceil(lv.a_hi * {_BOOT_B})
                                  AS BIGINT), 1), {_BOOT_B})), 6)
         AS ci_hi6
FROM lv
"""


QUERIES178: dict[str, tuple] = {
    "markov_mixing_tv": (q_markov_mixing_tv, SQL_MIXING),
    "fellegi_sunter_weights": (q_fellegi_sunter_weights, SQL_FS),
    "bca_bootstrap_mean": (q_bca_bootstrap_mean, SQL_BCA),
}
