"""Ninety-third oracle-query batch — shrinkage / psychometrics:

- eb_beta_binomial_users: method-of-moments empirical-Bayes beta
  prior for per-user purchase rates: per-user rates quantized ONCE
  (pq = round(x*1e9/n)), so the count-weighted rate moments
  SUM n*pq, SUM n*pq^2 are exact ints (~1e22, Python int / HUGEINT)
  and pbar = X/N, s2, M = pbar(1-pbar)/s2 - 1, alpha, beta all
  finalize identical-expression; reports the top-5 users by the
  1e-9-quantized posterior mean (x+alpha)/(n+alpha+beta) — an
  exact-int ordering (tie -> user_id).
- james_stein_segments: James-Stein shrinkage of the five segment
  mean order values toward the unweighted grand mean — segment means
  quantized ONCE (mq = round(S*1e6/n)), so the spread
  D_q = SUM(k*mq_i - SUM mq)^2 and the inverse-size sum
  round(1e12/n_i) are exact ints (no float sums over segments);
  pooled sigma^2 uses the (hi,lo) divmod shipping for cents^2; the
  shrink factor and per-segment shrunk means finalize
  identical-expression.
- split_half_reliability: Spearman-Brown split-half reliability of
  per-user engagement value — each user's events in (ts, event_id)
  order split into even/odd positions (user-salted partitions, exact
  cents sums), Pearson r across users from exact integer moments
  (HUGEINT), SB = 2r/(1+r).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_US_PER_DAY = 86_400_000_000
_SH_PARTS = 64


# ---------------------------------------------------------------------------
# Empirical-Bayes beta-binomial
# ---------------------------------------------------------------------------


def q_eb_beta_binomial_users(sf_dir: str):
    """MoM beta prior + top-5 shrunk purchase rates (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_type"])

    def upart(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = (np.asarray(t["event_type"].to_pylist())
             == "purchase").astype(np.int64)
        df = pd.DataFrame({"u": uid, "x": p, "n": np.int64(1)})
        g = df.groupby("u", sort=False).sum().reset_index()
        for c in ("x", "n"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    per = (ds.map_batches(upart, batch_format="pyarrow")
             .groupby("u").aggregate(Sum("x", alias_name="x"),
                                     Sum("n", alias_name="n"))
             .to_pandas())
    u = per["u"].to_numpy(np.int64)
    x = per["x"].to_numpy(np.int64)
    n = per["n"].to_numpy(np.int64)
    big_x = int(x.sum())
    big_n = int(n.sum())
    pq = np.floor(x.astype(np.float64) * 1e9 / n + 0.5).astype(np.int64)
    s1 = int(n.astype(object).dot(pq.astype(object)))
    s2 = int(n.astype(object).dot((pq.astype(object)) ** 2))
    pbar = float(big_x) / float(big_n)
    s2f = (float(s2) / 1e18 - 2.0 * pbar * (float(s1) / 1e9)
           + pbar * pbar * float(big_n)) / float(big_n)
    m_str = pbar * (1.0 - pbar) / s2f - 1.0
    alpha = pbar * m_str
    beta = (1.0 - pbar) * m_str
    post = np.floor((x + alpha) * 1e9 / (n + alpha + beta) + 0.5) \
        .astype(np.int64)
    order = np.lexsort((u, -post))[:5]
    top = pd.DataFrame({"user_id": u[order], "post_q": post[order]})
    r6 = _round6(np.array([pbar, m_str, alpha, beta]))
    out = top.reset_index(drop=True)
    out["pbar6"] = r6[0]
    out["m6"] = r6[1]
    out["alpha6"] = r6[2]
    out["beta6"] = r6[3]
    for col in ("user_id", "post_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_EB_BETA = """
WITH per AS (
  SELECT user_id AS u, sum((event_type = 'purchase')::INT)::BIGINT AS x,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1),
q AS (
  SELECT u, x, n,
         CAST(round(x * 1000000000.0 / n) AS BIGINT) AS pq
  FROM per),
t AS (
  SELECT sum(x)::BIGINT AS bx, sum(n)::BIGINT AS bn,
         sum(n::HUGEINT * pq) AS s1, sum(n::HUGEINT * pq * pq) AS s2
  FROM q),
f AS (
  SELECT bx, bn,
         CAST(bx AS DOUBLE) / CAST(bn AS DOUBLE) AS pbar,
         (CAST(s2 AS DOUBLE) / 1e18
          - 2.0 * (CAST(bx AS DOUBLE) / CAST(bn AS DOUBLE))
            * (CAST(s1 AS DOUBLE) / 1e9)
          + (CAST(bx AS DOUBLE) / CAST(bn AS DOUBLE))
            * (CAST(bx AS DOUBLE) / CAST(bn AS DOUBLE))
            * CAST(bn AS DOUBLE)) / CAST(bn AS DOUBLE) AS s2f
  FROM t),
ab AS (
  SELECT pbar, pbar * (1.0 - pbar) / s2f - 1.0 AS m_str FROM f),
ab2 AS (
  SELECT pbar, m_str, pbar * m_str AS alpha,
         (1.0 - pbar) * m_str AS beta
  FROM ab),
post AS (
  SELECT per.u AS user_id,
         CAST(round((per.x + alpha) * 1000000000.0
                    / (per.n + alpha + beta)) AS BIGINT) AS post_q,
         pbar, m_str, alpha, beta
  FROM per CROSS JOIN ab2)
SELECT user_id, post_q, round(pbar, 6) AS pbar6, round(m_str, 6) AS m6,
       round(alpha, 6) AS alpha6, round(beta, 6) AS beta6
FROM post ORDER BY post_q DESC, user_id LIMIT 5
"""


# ---------------------------------------------------------------------------
# James-Stein
# ---------------------------------------------------------------------------


def q_james_stein_segments(sf_dir: str):
    """JS shrinkage of segment mean order values (docstring above)."""
    import ray
    from scrapy_ray.pipelines.queries import _broadcast_lookup, _cents_np

    dim_ref = _broadcast_lookup(sf_dir, "customer", "c_custkey",
                                ["c_mktsegment"])
    ds = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def jpart(df: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(dim_ref)
        c = _cents_np(df["o_totalprice"].to_numpy())
        hi, lo = np.divmod(c * c, np.int64(10 ** 9))
        df2 = pd.DataFrame({"o_custkey": df["o_custkey"], "s": c,
                            "hi": hi, "lo": lo, "n": np.int64(1)})
        j = df2.join(dim, on="o_custkey", how="inner")
        g = j.groupby("c_mktsegment").agg(
            s=("s", "sum"), hi=("hi", "sum"), lo=("lo", "sum"),
            n=("n", "sum")).reset_index()
        for col in ("s", "hi", "lo", "n"):
            g[col] = g[col].astype(np.int64)
        return g

    seg = (ds.map_batches(jpart, batch_format="pandas")
             .groupby("c_mktsegment")
             .aggregate(Sum("s", alias_name="s"),
                        Sum("hi", alias_name="hi"),
                        Sum("lo", alias_name="lo"),
                        Sum("n", alias_name="n"))
             .to_pandas().sort_values("c_mktsegment")
             .reset_index(drop=True))
    k = len(seg)
    s_l = [int(v) for v in seg["s"]]
    n_l = [int(v) for v in seg["n"]]
    syy = [int(h) * 10 ** 9 + int(lo)
           for h, lo in zip(seg["hi"], seg["lo"])]
    big_n = sum(n_l)
    mq = [int(math.floor(s * 1000000.0 / n + 0.5))
          for s, n in zip(s_l, n_l)]
    smq = sum(mq)
    d_q = sum((k * m - smq) ** 2 for m in mq)
    invq = sum(int(math.floor(1e12 / n + 0.5)) for n in n_l)
    ssw = sum(y - (s * s) // n for y, s, n in zip(syy, s_l, n_l))
    sig2 = float(ssw) / float(big_n - k)
    mbar = float(smq) / (k * 1000000.0)
    dd = float(d_q) / (float(k * k) * 1e12)
    cfac = 1.0 - (k - 3.0) * sig2 * (float(invq) / 1e12 / k) / dd
    shrunk = [mbar + cfac * (m / 1000000.0 - mbar) for m in mq]
    out = pd.DataFrame({"c_mktsegment": seg["c_mktsegment"],
                        "n_seg": n_l, "mq": mq,
                        "mean6": _round6(np.array(
                            [m / 1000000.0 for m in mq])),
                        "shrunk6": _round6(np.array(shrunk))})
    out["c6"] = _round6(np.array([cfac]))[0]
    for col in ("n_seg", "mq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_JAMES_STEIN = """
WITH j AS (
  SELECT c_mktsegment,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders JOIN customer ON c_custkey = o_custkey),
seg AS (
  SELECT c_mktsegment, sum(c)::BIGINT AS s,
         sum(c::HUGEINT * c) AS syy, count(*)::BIGINT AS n
  FROM j GROUP BY 1),
q AS (
  SELECT c_mktsegment, s, syy, n,
         CAST(round(s * 1000000.0 / n) AS BIGINT) AS mq,
         CAST(round(1e12 / n) AS BIGINT) AS iq,
         syy - (s::HUGEINT * s) // n AS ssw_part
  FROM seg),
t AS (
  SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS bn,
         sum(mq)::BIGINT AS smq, sum(iq)::BIGINT AS invq,
         sum(ssw_part) AS ssw
  FROM q),
dq AS (
  SELECT sum((k * mq - smq)::HUGEINT * (k * mq - smq)) AS d_q
  FROM q CROSS JOIN t),
f AS (
  SELECT k, smq, invq,
         CAST(ssw AS DOUBLE) / CAST(bn - k AS DOUBLE) AS sig2,
         CAST(smq AS DOUBLE) / (k * 1000000.0) AS mbar,
         CAST(d_q AS DOUBLE) / (CAST(k * k AS DOUBLE) * 1e12) AS dd
  FROM t CROSS JOIN dq),
cf AS (
  SELECT k, mbar,
         1.0 - (k - 3.0) * sig2 * (CAST(invq AS DOUBLE) / 1e12 / k)
             / dd AS cfac
  FROM f)
SELECT q.c_mktsegment, q.n AS n_seg, q.mq,
       round(q.mq / 1000000.0, 6) AS mean6,
       round(mbar + cfac * (q.mq / 1000000.0 - mbar), 6) AS shrunk6,
       round(cfac, 6) AS c6
FROM q CROSS JOIN cf ORDER BY q.c_mktsegment
"""


# ---------------------------------------------------------------------------
# Split-half reliability
# ---------------------------------------------------------------------------


def q_split_half_reliability(sf_dir: str):
    """Spearman-Brown split-half reliability of per-user value
    (docstring above)."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])

    def epart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "ts_us": t["ts"].cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "eid": t["event_id"].to_numpy(zero_copy_only=False),
            "c": _cents(t["value"]).to_numpy(zero_copy_only=False)})
        df["gkey"] = (df["u"] % _SH_PARTS).astype(np.int32)
        return _strip(df)

    def halves(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts_us", "eid"], kind="mergesort")
        u = df["u"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        pos = np.arange(len(u))
        starts = np.concatenate([[0], np.flatnonzero(u[1:] != u[:-1]) + 1])
        rel = pos - np.repeat(starts, np.diff(
            np.concatenate([starts, [len(u)]])))
        even = (rel % 2 == 0).astype(np.int64)
        out = pd.DataFrame({"u": u, "ev": c * even,
                            "od": c * (1 - even)})
        g = out.groupby("u", sort=False).sum().reset_index()
        for col in ("ev", "od"):
            g[col] = g[col].astype(np.int64)
        return g

    per = (ds.map_batches(epart, batch_format="pyarrow")
             .groupby("gkey").map_groups(halves, batch_format="pandas")
             .to_pandas())
    a = [int(v) for v in per["ev"]]
    b = [int(v) for v in per["od"]]
    n = len(a)
    sa, sb = sum(a), sum(b)
    saa = sum(v * v for v in a)
    sbb = sum(v * v for v in b)
    sab = sum(x * y for x, y in zip(a, b))
    num = n * sab - sa * sb
    r = float(num) / math.sqrt(float(n * saa - sa * sa)
                               * float(n * sbb - sb * sb))
    sb_rel = 2.0 * r / (1.0 + r)
    out = pd.DataFrame({"n_users": [n], "sa": [sa], "sb": [sb],
                        "r6": [_round6(np.array([r]))[0]],
                        "sb6": [_round6(np.array([sb_rel]))[0]]})
    for col in ("n_users", "sa", "sb"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SPLIT_HALF = """
WITH e AS (
  SELECT user_id AS u,
         CAST(round(value * 100) AS BIGINT) AS c,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS rel
  FROM events),
per AS (
  SELECT u, sum(CASE WHEN rel % 2 = 0 THEN c ELSE 0 END)::BIGINT AS ev,
         sum(CASE WHEN rel % 2 = 1 THEN c ELSE 0 END)::BIGINT AS od
  FROM e GROUP BY 1),
m AS (
  SELECT count(*)::BIGINT AS n, sum(ev)::BIGINT AS sa,
         sum(od)::BIGINT AS sb, sum(ev::HUGEINT * ev) AS saa,
         sum(od::HUGEINT * od) AS sbb, sum(ev::HUGEINT * od) AS sab
  FROM per),
f AS (
  SELECT n, sa, sb,
         CAST(n::HUGEINT * sab - sa::HUGEINT * sb AS DOUBLE)
           / sqrt(CAST(n::HUGEINT * saa - sa::HUGEINT * sa AS DOUBLE)
                  * CAST(n::HUGEINT * sbb - sb::HUGEINT * sb
                         AS DOUBLE)) AS r
  FROM m)
SELECT n AS n_users, sa, sb, round(r, 6) AS r6,
       round(2.0 * r / (1.0 + r), 6) AS sb6
FROM f
"""


QUERIES93: dict[str, tuple] = {
    "eb_beta_binomial_users": (q_eb_beta_binomial_users, SQL_EB_BETA),
    "james_stein_segments": (q_james_stein_segments, SQL_JAMES_STEIN),
    "split_half_reliability": (q_split_half_reliability, SQL_SPLIT_HALF),
}
