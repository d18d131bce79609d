"""One-hundred-seventh oracle-query batch — EM / HMM / clustering
agreement:

- poisson_mixture_em: 3 EM iterations for a two-component Poisson
  mixture on per-(user,day) event counts, run on the BOUNDED count
  histogram: per support value the responsibility (computed with
  identical exp/ln float expressions from the current parameters) is
  quantized ONCE to 1e-12, so the M-step weighted sums are exact
  integers and the updated (lambda1, lambda2, pi) are identical
  floats.  Init lambda1 = m/2, lambda2 = 2m, pi = 0.5.
- hmm_forward_daily: the forward algorithm for a 2-state HMM with
  literal parameters (A = [[.9,.1],[.2,.8]], Bernoulli emissions
  p(up|s0) = .3, p(up|s1) = .7, uniform start) on the daily-revenue
  up/down indicator — per-step normalized alphas replayed by a
  recursive CTE and the log-likelihood accumulated as an exact
  integer sum of 1e-9-quantized ln c_t.
- ari_nmi_labels: Adjusted Rand Index and quantized NMI between the
  stored embedding `label` and the deterministic hash bucketing
  vec_id*2654435761 mod 2^32 mod 8: pair-count binomials are exact
  ints (HUGEINT), ARI = (I - E)/(M - E) identical-expression; NMI
  terms 1e-12-quantized.
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

_US_PER_DAY = 86_400_000_000
_EM_ITERS = 3
_HASH_K = 8
_MOD = 4294967296
_MULT = 2654435761


# ---------------------------------------------------------------------------
# Poisson mixture EM
# ---------------------------------------------------------------------------


def q_poisson_mixture_em(sf_dir: str):
    """3-iteration EM on the bounded per-(user,day) count histogram
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts"])

    def upart(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        df = pd.DataFrame({"u": uid, "day": day, "k": np.int64(1)})
        g = df.groupby(["u", "day"], sort=False).sum().reset_index()
        g["k"] = g["k"].astype(np.int64)
        return _strip(g)

    units = (ds.map_batches(upart, batch_format="pyarrow")
               .groupby(["u", "day"]).aggregate(Sum("k", alias_name="k"))
               .to_pandas())
    hist = units.groupby("k").size().reset_index(name="cnt")
    xs = [int(v) for v in hist["k"]]
    cnt = [int(v) for v in hist["cnt"]]
    n = sum(cnt)
    s = sum(a * b for a, b in zip(xs, cnt))
    m = float(s) / float(n)
    lam1 = m / 2.0
    lam2 = 2.0 * m
    pi = 0.5
    for _ in range(_EM_ITERS):
        sr = 0
        srx = 0
        for x, c in zip(xs, cnt):
            l1 = math.log(pi) - lam1 + x * math.log(lam1)
            l2 = math.log(1.0 - pi) - lam2 + x * math.log(lam2)
            r = 1.0 / (1.0 + math.exp(l2 - l1))
            rq = int(math.floor(r * 1e12 + 0.5))
            sr += c * rq
            srx += c * rq * x
        lam1 = float(srx) / float(sr)
        lam2 = float(s * 10 ** 12 - srx) / float(n * 10 ** 12 - sr)
        pi = float(sr) / float(n * 10 ** 12)
    out = pd.DataFrame({"n_units": [n], "support": [len(xs)],
                        "lam1_6": [_round6(np.array([lam1]))[0]],
                        "lam2_6": [_round6(np.array([lam2]))[0]],
                        "pi6": [_round6(np.array([pi]))[0]]})
    for col in ("n_units", "support"):
        out[col] = out[col].astype(np.int64)
    return out


def _em_sql() -> str:
    head = f"""
WITH per AS MATERIALIZED (
  SELECT user_id, CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day,
         count(*)::BIGINT AS k
  FROM events GROUP BY 1, 2),
h AS MATERIALIZED (
  SELECT k AS x, count(*)::BIGINT AS cnt FROM per GROUP BY 1),
t AS MATERIALIZED (
  SELECT sum(cnt)::BIGINT AS n, sum(x * cnt)::BIGINT AS s FROM h),
p0 AS (
  SELECT (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0 AS lam1,
         2.0 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS lam2,
         0.5::DOUBLE AS pi
  FROM t)"""
    steps = []
    for i in range(1, _EM_ITERS + 1):
        steps.append(f""",
e{i} AS (
  SELECT sum(cnt * CAST(round(
           (1.0 / (1.0 + exp((ln(1.0 - pi) - lam2 + x * ln(lam2))
                             - (ln(pi) - lam1 + x * ln(lam1)))))
           * 1e12) AS BIGINT))::BIGINT AS sr,
         sum(cnt * CAST(round(
           (1.0 / (1.0 + exp((ln(1.0 - pi) - lam2 + x * ln(lam2))
                             - (ln(pi) - lam1 + x * ln(lam1)))))
           * 1e12) AS BIGINT) * x)::BIGINT AS srx
  FROM h CROSS JOIN p{i-1}),
p{i} AS (
  SELECT CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE) AS lam1,
         CAST(s::HUGEINT * 1000000000000 - srx AS DOUBLE)
           / CAST(n::HUGEINT * 1000000000000 - sr AS DOUBLE) AS lam2,
         CAST(sr AS DOUBLE)
           / CAST(n::HUGEINT * 1000000000000 AS DOUBLE) AS pi
  FROM e{i} CROSS JOIN t)"""
                     )
    tail = f"""
SELECT (SELECT n FROM t) AS n_units,
       (SELECT count(*)::BIGINT FROM h) AS support,
       round(lam1, 6) AS lam1_6, round(lam2, 6) AS lam2_6,
       round(pi, 6) AS pi6
FROM p{_EM_ITERS}"""
    return head + "".join(steps) + tail


SQL_POISSON_EM = _em_sql()


# ---------------------------------------------------------------------------
# HMM forward
# ---------------------------------------------------------------------------


def q_hmm_forward_daily(sf_dir: str):
    """2-state HMM forward log-likelihood on daily up/down (docstring
    above)."""
    from scrapy_ray.pipelines.queries47 import _daily_cents
    c = _daily_cents(sf_dir)["c"].to_numpy(np.int64)
    up = (c[1:] > c[:-1]).astype(np.int64)
    a0, a1 = 0.5, 0.5
    llq = 0
    ups = int(up.sum())
    for o in up:
        e0 = 0.3 if o == 1 else 0.7
        e1 = 0.7 if o == 1 else 0.3
        b0 = (a0 * 0.9 + a1 * 0.2) * e0
        b1 = (a0 * 0.1 + a1 * 0.8) * e1
        ct = b0 + b1
        a0 = b0 / ct
        a1 = b1 / ct
        lx = math.log(ct) * 1e9
        llq += (int(math.floor(lx + 0.5)) if lx >= 0
                else int(math.ceil(lx - 0.5)))
    out = pd.DataFrame({"n_obs": [len(up)], "n_up": [ups],
                        "llq": [llq],
                        "ll6": [_round6(np.array([llq / 1e9]))[0]],
                        "a0_6": [_round6(np.array([a0]))[0]]})
    for col in ("n_obs", "n_up", "llq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HMM = f"""
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
ud AS MATERIALIZED (
  SELECT (c > lag(c) OVER (ORDER BY day))::INT AS o,
         row_number() OVER (ORDER BY day) - 1 AS t
  FROM daily QUALIFY t >= 1),
nd AS MATERIALIZED (SELECT count(*)::BIGINT AS n,
                           sum(o)::BIGINT AS ups
                    FROM ud),
r AS (
  SELECT 0::BIGINT AS t, 0.5::DOUBLE AS a0, 0.5::DOUBLE AS a1,
         0::BIGINT AS llq
  FROM nd
  UNION ALL
  SELECT ud.t,
         ((r.a0 * 0.9 + r.a1 * 0.2)
          * (CASE WHEN ud.o = 1 THEN 0.3 ELSE 0.7 END))
         / ((r.a0 * 0.9 + r.a1 * 0.2)
            * (CASE WHEN ud.o = 1 THEN 0.3 ELSE 0.7 END)
            + (r.a0 * 0.1 + r.a1 * 0.8)
              * (CASE WHEN ud.o = 1 THEN 0.7 ELSE 0.3 END)) AS a0,
         ((r.a0 * 0.1 + r.a1 * 0.8)
          * (CASE WHEN ud.o = 1 THEN 0.7 ELSE 0.3 END))
         / ((r.a0 * 0.9 + r.a1 * 0.2)
            * (CASE WHEN ud.o = 1 THEN 0.3 ELSE 0.7 END)
            + (r.a0 * 0.1 + r.a1 * 0.8)
              * (CASE WHEN ud.o = 1 THEN 0.7 ELSE 0.3 END)) AS a1,
         r.llq + CAST(round(ln(
             (r.a0 * 0.9 + r.a1 * 0.2)
               * (CASE WHEN ud.o = 1 THEN 0.3 ELSE 0.7 END)
             + (r.a0 * 0.1 + r.a1 * 0.8)
               * (CASE WHEN ud.o = 1 THEN 0.7 ELSE 0.3 END))
             * 1000000000.0) AS BIGINT) AS llq
  FROM r JOIN ud ON ud.t = r.t + 1)
SELECT (SELECT n FROM nd) AS n_obs, (SELECT ups FROM nd) AS n_up,
       llq, round(llq / 1000000000.0, 6) AS ll6,
       round(a0, 6) AS a0_6
FROM r WHERE t = (SELECT n FROM nd)
"""


# ---------------------------------------------------------------------------
# ARI / NMI
# ---------------------------------------------------------------------------


def q_ari_nmi_labels(sf_dir: str):
    """ARI + quantized NMI between label and a hash bucketing
    (docstring above)."""
    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "label"])

    def cpart(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        b = (((vid % np.uint64(_MOD)) * np.uint64(_MULT))
             % np.uint64(_MOD)) % np.uint64(_HASH_K)
        df = pd.DataFrame({
            "lab": t["label"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "b": b.astype(np.int64), "n": np.int64(1)})
        g = df.groupby(["lab", "b"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["lab", "b"]).aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    n = int(cells["n"].sum())
    row = cells.groupby("lab")["n"].sum()
    col = cells.groupby("b")["n"].sum()

    def c2(v: int) -> int:
        return v * (v - 1) // 2

    s_ij = sum(c2(int(v)) for v in cells["n"])
    s_a = sum(c2(int(v)) for v in row)
    s_b = sum(c2(int(v)) for v in col)
    cn2 = c2(n)
    exp = float(s_a * s_b) / float(cn2)
    mx = (float(s_a) + float(s_b)) / 2.0
    ari = (float(s_ij) - exp) / (mx - exp)
    # quantized NMI
    miq = 0
    for lab, b, cnt in zip(cells["lab"], cells["b"], cells["n"]):
        cnt = int(cnt)
        lx = math.log(float(cnt * n)
                      / float(int(row[lab]) * int(col[b]))) * 1e12
        miq += cnt * (int(math.floor(lx + 0.5)) if lx >= 0
                      else int(math.ceil(lx - 0.5)))
    ha = sum(int(v) * int(math.floor(
        math.log(float(n) / float(int(v))) * 1e12 + 0.5)) for v in row)
    hb = sum(int(v) * int(math.floor(
        math.log(float(n) / float(int(v))) * 1e12 + 0.5)) for v in col)
    nmi = float(miq) / math.sqrt(float(ha) * float(hb))
    out = pd.DataFrame({"n": [n], "s_ij": [s_ij],
                        "ari6": [_round6(np.array([ari]))[0]],
                        "nmi6": [_round6(np.array([nmi]))[0]]})
    for col_ in ("n", "s_ij"):
        out[col_] = out[col_].astype(np.int64)
    return out


SQL_ARI_NMI = f"""
WITH b AS (
  SELECT label AS lab,
         ((vec_id::UBIGINT % {_MOD}) * {_MULT}::UBIGINT) % {_MOD}
           % {_HASH_K} AS bk
  FROM embeddings),
c AS (SELECT lab, bk, count(*)::BIGINT AS n FROM b GROUP BY 1, 2),
t AS (SELECT sum(n)::BIGINT AS nt FROM c),
rt AS (SELECT lab, sum(n)::BIGINT AS r FROM c GROUP BY 1),
ct AS (SELECT bk, sum(n)::BIGINT AS cl FROM c GROUP BY 1),
s AS (
  SELECT sum((c.n * (c.n - 1)) // 2)::BIGINT AS s_ij,
         sum(c.n * CAST(round(ln(CAST(c.n * nt AS DOUBLE)
                                 / CAST(rt.r * ct.cl AS DOUBLE))
                              * 1000000000000) AS BIGINT))::BIGINT
           AS miq
  FROM c JOIN rt USING (lab) JOIN ct USING (bk) CROSS JOIN t),
sa AS (SELECT sum((r * (r - 1)) // 2)::BIGINT AS s_a,
              sum(r * CAST(round(ln(CAST(nt AS DOUBLE) / r)
                                 * 1000000000000) AS BIGINT))::BIGINT
                AS ha
       FROM rt CROSS JOIN t),
sb AS (SELECT sum((cl * (cl - 1)) // 2)::BIGINT AS s_b,
              sum(cl * CAST(round(ln(CAST(nt AS DOUBLE) / cl)
                                  * 1000000000000) AS BIGINT))::BIGINT
                AS hb
       FROM ct CROSS JOIN t),
f AS (
  SELECT nt, s_ij, miq, ha, hb, s_a, s_b,
         CAST(s_a::HUGEINT * s_b AS DOUBLE)
           / CAST((nt::HUGEINT * (nt - 1)) // 2 AS DOUBLE) AS expp,
         (CAST(s_a AS DOUBLE) + CAST(s_b AS DOUBLE)) / 2.0 AS mx
  FROM s, sa, sb, t)
SELECT nt AS n, s_ij,
       round((CAST(s_ij AS DOUBLE) - expp) / (mx - expp), 6) AS ari6,
       round(CAST(miq AS DOUBLE)
             / sqrt(CAST(ha AS DOUBLE) * CAST(hb AS DOUBLE)), 6)
         AS nmi6
FROM f
"""


QUERIES107: dict[str, tuple] = {
    "poisson_mixture_em": (q_poisson_mixture_em, SQL_POISSON_EM),
    "hmm_forward_daily": (q_hmm_forward_daily, SQL_HMM),
    "ari_nmi_labels": (q_ari_nmi_labels, SQL_ARI_NMI),
}
