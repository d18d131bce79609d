"""Ninety-fifth oracle-query batch — circular statistics completion
(with the Rayleigh test and linear CvM already in the suite):

- mardia_circular_linear: Mardia's circular-linear correlation
  between event value and time-of-day angle: cos/sin are quantized
  ONCE per second of day into a driver-built 86400-entry int table
  (math.cos/sin — column-path parity vs DuckDB probed exact over the
  full lattice in batch 77) and broadcast to tasks; all nine moment
  sums are exact ints (the qc^2 ~ 1e18-per-row products ship as
  floor-divmod (hi,lo) pairs so block partials stay int64);
  r_xc, r_xs, r_cs and R^2 = (r_xc^2 + r_xs^2 - 2 r_xc r_xs r_cs)
  / (1 - r_cs^2) assemble identical-expression.
- kuiper_uniform_tod: one-sample Kuiper V of time-of-day vs
  Uniform(0,86400) — the rotation-invariant circular GOF test: both
  one-sided suprema are EXACT integers on the common lattice,
  D+s = max(86400*cum - n*s), D-s = max(n*s - 86400*(cum-cnt));
  V = (D+s + D-s)/(86400 n).
- watson_u2_tod: Watson's U^2 (the circular-invariant CvM):
  U^2 = W^2 - n*(Fbar - 1/2)^2 with the W^2 integer core from the
  batch-84 closed-form cell sums and the correction
  (SUM s - 43200 n)^2/(86400^2 n) exact.
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

_B = 1_000_000_000


def _sod_hist(sf_dir: str) -> pd.DataFrame:
    ds = _pq(sf_dir, "events", columns=["ts"])

    def hpart(t: pa.Table) -> pa.Table:
        sod = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 1_000_000) % 86400
        df = pd.DataFrame({"sod": sod})
        g = df.groupby("sod", sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("sod").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("sod"))


# ---------------------------------------------------------------------------
# Mardia circular-linear correlation
# ---------------------------------------------------------------------------


def _trig_tables():
    qc = np.empty(86400, np.int64)
    qs = np.empty(86400, np.int64)
    for s in range(86400):
        a = s * (2.0 * math.pi / 86400.0)
        cv = math.cos(a) * 1000000000.0
        sv = math.sin(a) * 1000000000.0
        qc[s] = math.floor(cv + 0.5) if cv >= 0 else math.ceil(cv - 0.5)
        qs[s] = math.floor(sv + 0.5) if sv >= 0 else math.ceil(sv - 0.5)
    return qc, qs


def q_mardia_circular_linear(sf_dir: str):
    """Mardia R^2 of value vs time-of-day angle (docstring above)."""
    qc_t, qs_t = _trig_tables()
    ds = _pq(sf_dir, "events", columns=["value", "ts"])

    def mpart(t: pa.Table) -> pa.Table:
        x = _cents(t["value"]).to_numpy(zero_copy_only=False)
        sod = ((t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 1_000_000) % 86400)
        qc = qc_t[sod]
        qs = qs_t[sod]
        cols = {"n": np.int64(len(x)), "sx": int(x.sum()),
                "sxx": int((x * x).sum()),
                "sc": int(qc.sum()), "ss_": int(qs.sum()),
                "sxc": int(x.dot(qc)), "sxs": int(x.dot(qs))}
        out = {"g": pa.array([0], pa.int64())}
        for k, v in cols.items():
            out[k] = pa.array([v], pa.int64())
        for name, arr in (("cc", qc * qc), ("ssq", qs * qs),
                          ("cs", qc * qs)):
            hi, lo = np.divmod(arr, np.int64(_B))
            out[f"{name}_hi"] = pa.array([int(hi.sum())], pa.int64())
            out[f"{name}_lo"] = pa.array([int(lo.sum())], pa.int64())
        return pa.table(out)

    aggs = [Sum(c, alias_name=c)
            for c in ("n", "sx", "sxx", "sc", "ss_", "sxc", "sxs",
                      "cc_hi", "cc_lo", "ssq_hi", "ssq_lo",
                      "cs_hi", "cs_lo")]
    m = (ds.map_batches(mpart, batch_format="pyarrow")
           .groupby("g").aggregate(*aggs).to_pandas())
    g = {c: int(m[c].iloc[0]) for c in m.columns if c != "g"}
    n = g["n"]
    scc = g["cc_hi"] * _B + g["cc_lo"]
    sss = g["ssq_hi"] * _B + g["ssq_lo"]
    scs = g["cs_hi"] * _B + g["cs_lo"]

    def corr(na, nb, saa, sbb, sab):
        return float(n * sab - na * nb) \
            / math.sqrt(float(n * saa - na * na)
                        * float(n * sbb - nb * nb))

    r_xc = corr(g["sx"], g["sc"], g["sxx"], scc, g["sxc"])
    r_xs = corr(g["sx"], g["ss_"], g["sxx"], sss, g["sxs"])
    r_cs = corr(g["sc"], g["ss_"], scc, sss, scs)
    r2 = (r_xc * r_xc + r_xs * r_xs - 2.0 * r_xc * r_xs * r_cs) \
        / (1.0 - r_cs * r_cs)
    out = pd.DataFrame({"n": [n], "sxc": [g["sxc"]], "sxs": [g["sxs"]],
                        "rxc6": [_round6(np.array([r_xc]))[0]],
                        "rxs6": [_round6(np.array([r_xs]))[0]],
                        "rcs6": [_round6(np.array([r_cs]))[0]],
                        "r2_6": [_round6(np.array([r2]))[0]]})
    for col in ("n", "sxc", "sxs"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MARDIA = """
WITH b AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS x,
         CAST(round(cos(((epoch_us(ts) // 1000000) % 86400)
                        * (2.0 * pi() / 86400.0)) * 1000000000.0)
              AS BIGINT) AS qc,
         CAST(round(sin(((epoch_us(ts) // 1000000) % 86400)
                        * (2.0 * pi() / 86400.0)) * 1000000000.0)
              AS BIGINT) AS qs
  FROM events),
m AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(x::HUGEINT * x) AS sxx, sum(qc)::BIGINT AS sc,
         sum(qs)::BIGINT AS ss_, sum(x::HUGEINT * qc) AS sxc,
         sum(x::HUGEINT * qs) AS sxs, sum(qc::HUGEINT * qc) AS scc,
         sum(qs::HUGEINT * qs) AS sss, sum(qc::HUGEINT * qs) AS scs
  FROM b),
r AS (
  SELECT n, sxc, sxs,
    CAST(n::HUGEINT * sxc - sx::HUGEINT * sc AS DOUBLE)
      / sqrt(CAST(n::HUGEINT * sxx - sx::HUGEINT * sx AS DOUBLE)
             * CAST(n::HUGEINT * scc - sc::HUGEINT * sc AS DOUBLE))
      AS r_xc,
    CAST(n::HUGEINT * sxs - sx::HUGEINT * ss_ AS DOUBLE)
      / sqrt(CAST(n::HUGEINT * sxx - sx::HUGEINT * sx AS DOUBLE)
             * CAST(n::HUGEINT * sss - ss_::HUGEINT * ss_ AS DOUBLE))
      AS r_xs,
    CAST(n::HUGEINT * scs - sc::HUGEINT * ss_ AS DOUBLE)
      / sqrt(CAST(n::HUGEINT * scc - sc::HUGEINT * sc AS DOUBLE)
             * CAST(n::HUGEINT * sss - ss_::HUGEINT * ss_ AS DOUBLE))
      AS r_cs
  FROM m)
SELECT n, sxc::BIGINT AS sxc, sxs::BIGINT AS sxs,
       round(r_xc, 6) AS rxc6, round(r_xs, 6) AS rxs6,
       round(r_cs, 6) AS rcs6,
       round((r_xc * r_xc + r_xs * r_xs - 2.0 * r_xc * r_xs * r_cs)
             / (1.0 - r_cs * r_cs), 6) AS r2_6
FROM r
"""


# ---------------------------------------------------------------------------
# Kuiper one-sample vs uniform
# ---------------------------------------------------------------------------


def q_kuiper_uniform_tod(sf_dir: str):
    """One-sample Kuiper V of time-of-day vs Uniform (docstring
    above)."""
    hist = _sod_hist(sf_dir)
    s = hist["sod"].to_numpy(np.int64)
    cnt = hist["cnt"].to_numpy(np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    dplus = int((86400 * cum - n * s).max())
    dminus = int((n * s - 86400 * (cum - cnt)).max())
    v = float(dplus + dminus) / float(86400 * n)
    out = pd.DataFrame({"n": [n], "dplus_s": [dplus],
                        "dminus_s": [dminus],
                        "v6": [_round6(np.array([v]))[0]]})
    for col in ("n", "dplus_s", "dminus_s"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KUIPER_UNIFORM = """
WITH h AS (
  SELECT (epoch_us(ts) // 1000000) % 86400 AS sod,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
t AS (SELECT sum(cnt)::BIGINT AS n FROM h),
c AS (
  SELECT sod, cnt, sum(cnt) OVER (ORDER BY sod)::BIGINT AS cum, n
  FROM h CROSS JOIN t),
u AS (
  SELECT max(86400 * cum - n * sod)::BIGINT AS dplus_s,
         max(n * sod - 86400 * (cum - cnt))::BIGINT AS dminus_s,
         max(n) AS n
  FROM c)
SELECT n, dplus_s, dminus_s,
       round(CAST(dplus_s + dminus_s AS DOUBLE)
             / CAST(86400 * n AS DOUBLE), 6) AS v6
FROM u
"""


# ---------------------------------------------------------------------------
# Watson U^2
# ---------------------------------------------------------------------------


def q_watson_u2_tod(sf_dir: str):
    """Watson's circular U^2 of time-of-day (docstring above)."""
    hist = _sod_hist(sf_dir)
    sv = [int(v) for v in hist["sod"]]
    cnt = [int(v) for v in hist["cnt"]]
    n = sum(cnt)
    ss = 0
    a = 1
    for s, c in zip(sv, cnt):
        b = a + c - 1
        c0 = -86400 - 2 * n * s
        c1 = 172800
        si = (a + b) * (b - a + 1) // 2
        si2 = b * (b + 1) * (2 * b + 1) // 6 \
            - (a - 1) * a * (2 * a - 1) // 6
        ss += c * c0 * c0 + 2 * c0 * c1 * si + c1 * c1 * si2
        a = b + 1
    sum_s = sum(s * c for s, c in zip(sv, cnt))
    w2 = (float(ss) / float(4 * n * n * 86400 * 86400)
          + 1.0 / (12.0 * n))
    corr = (float((sum_s - 43200 * n) ** 2)
            / ((86400.0 * 86400.0) * float(n)))
    u2 = w2 - corr
    out = pd.DataFrame({"n": [n], "sum_s": [sum_s],
                        "w2_6": [_round6(np.array([w2]))[0]],
                        "u2_6": [_round6(np.array([u2]))[0]]})
    for col in ("n", "sum_s"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_WATSON_U2 = """
WITH h AS (
  SELECT (epoch_us(ts) // 1000000) % 86400 AS sod,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
t AS (SELECT sum(cnt)::BIGINT AS n,
             sum(sod * cnt)::BIGINT AS sum_s
      FROM h),
c AS (
  SELECT sod, cnt,
         sum(cnt) OVER (ORDER BY sod)::BIGINT AS hi
  FROM h),
e AS (
  SELECT cnt, hi, hi - cnt + 1 AS a, hi AS b,
         (-86400 - 2 * n * sod)::HUGEINT AS c0, n
  FROM c CROSS JOIN t),
s AS (
  SELECT sum(cnt::HUGEINT * c0 * c0
             + 2::HUGEINT * c0 * 172800
               * (((a + b)::HUGEINT * (b - a + 1)) // 2)
             + 172800::HUGEINT * 172800
               * ((b::HUGEINT * (b + 1) * (2 * b + 1)) // 6
                  - ((a - 1)::HUGEINT * a * (2 * a - 1)) // 6))
           AS ss,
         max(n) AS n
  FROM e),
f AS (
  SELECT s.n, sum_s,
         CAST(ss AS DOUBLE)
           / CAST(4::HUGEINT * s.n * s.n * 86400 * 86400 AS DOUBLE)
           + 1.0 / (12.0 * s.n) AS w2,
         CAST((sum_s - 43200 * s.n)::HUGEINT
              * (sum_s - 43200 * s.n) AS DOUBLE)
           / ((86400.0 * 86400.0) * CAST(s.n AS DOUBLE))
           AS corr
  FROM s CROSS JOIN t)
SELECT n, sum_s, round(w2, 6) AS w2_6, round(w2 - corr, 6) AS u2_6
FROM f
"""


QUERIES95: dict[str, tuple] = {
    "mardia_circular_linear": (q_mardia_circular_linear, SQL_MARDIA),
    "kuiper_uniform_tod": (q_kuiper_uniform_tod, SQL_KUIPER_UNIFORM),
    "watson_u2_tod": (q_watson_u2_tod, SQL_WATSON_U2),
}
