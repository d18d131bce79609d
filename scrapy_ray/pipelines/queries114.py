"""One-hundred-fourteenth oracle-query batch — meta-analysis over the
event stream. Each epoch day is a "study": treatment arm = click
events, control arm = view events, outcome = value >= 50. Per-study
exact 2x2 counts (x1, n1, x0, n0) give the log risk ratio
y = ln((x1/n1)/(x0/n0)) and its variance var = 1/x1 - 1/n1 + 1/x0 -
1/n0 — deterministic float expressions of exact ints, written
identically on both sides. Days with a zero or full cell are excluded
(y would be infinite); the study count is reported. Per-study terms
are 1e-6-quantized BEFORE the cross-study sum (repo float-sum rule):

- fixed_effect_meta_daily: inverse-variance pooled log-RR, Cochran's
  Q = SUM w y^2 - (SUM w y)^2 / SUM w, and I^2 = max(0, (Q-df)/Q).
- dsl_random_effects_daily: DerSimonian-Laird tau^2 = max(0, Q-df) /
  (SUM w - SUM w^2 / SUM w), then the random-effects pooled estimate
  with per-study weights 1/(var + tau^2) (re-quantized second pass).
- egger_bias_daily: Egger's small-study-bias regression — OLS of the
  standardized effect z = y/se on precision 1/se; the intercept is
  the bias indicator, the slope the precision-adjusted effect.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_MQ = 1_000_000


def _qint(x: np.ndarray) -> np.ndarray:
    # mirrors SQL CAST(round(x * 1e6) AS BIGINT)
    return (np.sign(x) * np.floor(np.abs(x) * _MQ + 0.5)).astype(np.int64)


def _study_table(sf_dir: str) -> pd.DataFrame:
    """Eligible per-day studies with exact (x1, n1, x0, n0) and the
    derived float y, var (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type", "value"])

    def cpart(t: pa.Table) -> pa.Table:
        d = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 86_400_000_000)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        hi = t["value"].to_numpy(zero_copy_only=False) >= 50
        ck, vw = et == "click", et == "view"
        df = pd.DataFrame({"d": d.astype(np.int64),
                           "x1": (ck & hi).astype(np.int64),
                           "n1": ck.astype(np.int64),
                           "x0": (vw & hi).astype(np.int64),
                           "n0": vw.astype(np.int64)})
        g = df.groupby("d", sort=False).sum().reset_index()
        for col in ("x1", "n1", "x0", "n0"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    s = (ds.map_batches(cpart, batch_format="pyarrow")
           .groupby("d").aggregate(Sum("x1", alias_name="x1"),
                                   Sum("n1", alias_name="n1"),
                                   Sum("x0", alias_name="x0"),
                                   Sum("n0", alias_name="n0"))
           .to_pandas())
    keep = ((s["x1"] > 0) & (s["x1"] < s["n1"])
            & (s["x0"] > 0) & (s["x0"] < s["n0"]))
    s = s[keep].reset_index(drop=True)
    x1 = s["x1"].to_numpy(np.float64)
    n1 = s["n1"].to_numpy(np.float64)
    x0 = s["x0"].to_numpy(np.float64)
    n0 = s["n0"].to_numpy(np.float64)
    s["y"] = np.log((x1 / n1) / (x0 / n0))
    s["var"] = 1.0 / x1 - 1.0 / n1 + 1.0 / x0 - 1.0 / n0
    return s


_SQL_STUDIES = """
st AS (
  SELECT epoch_us(ts) // 86400000000 AS d,
         sum((event_type = 'click' AND value >= 50)::INT)::BIGINT AS x1,
         sum((event_type = 'click')::INT)::BIGINT AS n1,
         sum((event_type = 'view' AND value >= 50)::INT)::BIGINT AS x0,
         sum((event_type = 'view')::INT)::BIGINT AS n0
  FROM events GROUP BY 1),
el AS (
  SELECT x1, n1, x0, n0,
         ln((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))
            / (CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE))) AS y,
         1.0 / CAST(x1 AS DOUBLE) - 1.0 / CAST(n1 AS DOUBLE)
         + 1.0 / CAST(x0 AS DOUBLE) - 1.0 / CAST(n0 AS DOUBLE) AS var
  FROM st WHERE x1 > 0 AND x1 < n1 AND x0 > 0 AND x0 < n0)
"""


# ---------------------------------------------------------------------------
# fixed-effect pooling + heterogeneity
# ---------------------------------------------------------------------------


def q_fixed_effect_meta_daily(sf_dir: str):
    """Inverse-variance fixed-effect meta-analysis (docstring above)."""
    s = _study_table(sf_dir)
    w = 1.0 / s["var"].to_numpy(np.float64)
    y = s["y"].to_numpy(np.float64)
    k = len(s)
    sw = int(_qint(w).sum())
    swy = int(_qint(w * y).sum())
    swy2 = int(_qint(w * y * y).sum())
    pooled = float(swy) / float(sw)
    q = (float(swy2) - float(swy) * float(swy) / float(sw)) / 1000000.0
    i2 = max(0.0, (q - float(k - 1)) / q)
    out = pd.DataFrame({"k": [k], "sw": [sw], "swy": [swy],
                        "pooled6": [_round6(np.array([pooled]))[0]],
                        "q6": [_round6(np.array([q]))[0]],
                        "i2_6": [_round6(np.array([i2]))[0]]})
    for col in ("k", "sw", "swy"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_FIXED_EFFECT = f"""
WITH {_SQL_STUDIES},
qt AS (
  SELECT CAST(round(1.0 / var * 1000000.0) AS BIGINT) AS wq,
         CAST(round(1.0 / var * y * 1000000.0) AS BIGINT) AS wyq,
         CAST(round(1.0 / var * y * y * 1000000.0) AS BIGINT) AS wy2q
  FROM el),
agg AS (
  SELECT count(*)::BIGINT AS k, sum(wq)::BIGINT AS sw,
         sum(wyq)::BIGINT AS swy, sum(wy2q)::BIGINT AS swy2
  FROM qt),
f AS (
  SELECT k, sw, swy,
         CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE) AS pooled,
         (CAST(swy2 AS DOUBLE)
          - CAST(swy AS DOUBLE) * CAST(swy AS DOUBLE)
            / CAST(sw AS DOUBLE)) / 1000000.0 AS q
  FROM agg)
SELECT k, sw, swy, round(pooled, 6) AS pooled6, round(q, 6) AS q6,
       round(greatest(0.0, (q - CAST(k - 1 AS DOUBLE)) / q), 6) AS i2_6
FROM f
"""


# ---------------------------------------------------------------------------
# DerSimonian-Laird random effects
# ---------------------------------------------------------------------------


def q_dsl_random_effects_daily(sf_dir: str):
    """DSL tau^2 + random-effects pooled log-RR (docstring above)."""
    s = _study_table(sf_dir)
    var = s["var"].to_numpy(np.float64)
    y = s["y"].to_numpy(np.float64)
    w = 1.0 / var
    k = len(s)
    sw = int(_qint(w).sum())
    swy = int(_qint(w * y).sum())
    swy2 = int(_qint(w * y * y).sum())
    sw2 = int(_qint(w * w).sum())
    q = (float(swy2) - float(swy) * float(swy) / float(sw)) / 1000000.0
    c = (float(sw) / 1000000.0
         - float(sw2) / float(sw))
    tau2 = max(0.0, q - float(k - 1)) / c
    ws = 1.0 / (var + tau2)
    sws = int(_qint(ws).sum())
    swsy = int(_qint(ws * y).sum())
    pooled_re = float(swsy) / float(sws)
    out = pd.DataFrame({"k": [k], "sws": [sws], "swsy": [swsy],
                        "tau2_6": [_round6(np.array([tau2]))[0]],
                        "pooled_re6": [_round6(np.array([pooled_re]))[0]]})
    for col in ("k", "sws", "swsy"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_DSL_RANDOM = f"""
WITH {_SQL_STUDIES},
qt AS (
  SELECT var, y,
         CAST(round(1.0 / var * 1000000.0) AS BIGINT) AS wq,
         CAST(round(1.0 / var * y * 1000000.0) AS BIGINT) AS wyq,
         CAST(round(1.0 / var * y * y * 1000000.0) AS BIGINT) AS wy2q,
         CAST(round(1.0 / var * (1.0 / var) * 1000000.0) AS BIGINT)
           AS w2q
  FROM el),
agg AS (
  SELECT count(*)::BIGINT AS k, sum(wq)::BIGINT AS sw,
         sum(wyq)::BIGINT AS swy, sum(wy2q)::BIGINT AS swy2,
         sum(w2q)::BIGINT AS sw2
  FROM qt),
t AS (
  SELECT k,
         greatest(0.0,
           (CAST(swy2 AS DOUBLE)
            - CAST(swy AS DOUBLE) * CAST(swy AS DOUBLE)
              / CAST(sw AS DOUBLE)) / 1000000.0
           - CAST(k - 1 AS DOUBLE))
         / (CAST(sw AS DOUBLE) / 1000000.0
            - CAST(sw2 AS DOUBLE) / CAST(sw AS DOUBLE)) AS tau2
  FROM agg),
re AS (
  SELECT t.k, t.tau2,
         sum(CAST(round(1.0 / (qt.var + t.tau2) * 1000000.0)
                  AS BIGINT))::BIGINT AS sws,
         sum(CAST(round(1.0 / (qt.var + t.tau2) * qt.y * 1000000.0)
                  AS BIGINT))::BIGINT AS swsy
  FROM qt CROSS JOIN t GROUP BY 1, 2)
SELECT k, sws, swsy, round(tau2, 6) AS tau2_6,
       round(CAST(swsy AS DOUBLE) / CAST(sws AS DOUBLE), 6)
         AS pooled_re6
FROM re
"""


# ---------------------------------------------------------------------------
# Egger's regression test
# ---------------------------------------------------------------------------


def q_egger_bias_daily(sf_dir: str):
    """Egger small-study-bias OLS (docstring above)."""
    s = _study_table(sf_dir)
    se = np.sqrt(s["var"].to_numpy(np.float64))
    y = s["y"].to_numpy(np.float64)
    z = y / se
    p = 1.0 / se
    k = len(s)
    sz = int(_qint(z).sum())
    sp = int(_qint(p).sum())
    sp2 = int(_qint(p * p).sum())
    spz = int(_qint(p * z).sum())
    szf = float(sz) / 1000000.0
    spf = float(sp) / 1000000.0
    sp2f = float(sp2) / 1000000.0
    spzf = float(spz) / 1000000.0
    kf = float(k)
    det = kf * sp2f - spf * spf
    b0 = (szf * sp2f - spf * spzf) / det
    b1 = (kf * spzf - spf * szf) / det
    out = pd.DataFrame({"k": [k], "sz": [sz], "sp": [sp],
                        "intercept6": [_round6(np.array([b0]))[0]],
                        "slope6": [_round6(np.array([b1]))[0]]})
    for col in ("k", "sz", "sp"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_EGGER = f"""
WITH {_SQL_STUDIES},
qt AS (
  SELECT CAST(round(y / sqrt(var) * 1000000.0) AS BIGINT) AS zq,
         CAST(round(1.0 / sqrt(var) * 1000000.0) AS BIGINT) AS pq,
         CAST(round(1.0 / sqrt(var) * (1.0 / sqrt(var)) * 1000000.0)
              AS BIGINT) AS p2q,
         CAST(round(1.0 / sqrt(var) * (y / sqrt(var)) * 1000000.0)
              AS BIGINT) AS pzq
  FROM el),
agg AS (
  SELECT count(*)::BIGINT AS k, sum(zq)::BIGINT AS sz,
         sum(pq)::BIGINT AS sp, sum(p2q)::BIGINT AS sp2,
         sum(pzq)::BIGINT AS spz
  FROM qt),
f AS (
  SELECT k, sz, sp,
         CAST(sz AS DOUBLE) / 1000000.0 AS szf,
         CAST(sp AS DOUBLE) / 1000000.0 AS spf,
         CAST(sp2 AS DOUBLE) / 1000000.0 AS sp2f,
         CAST(spz AS DOUBLE) / 1000000.0 AS spzf
  FROM agg)
SELECT k, sz, sp,
       round((szf * sp2f - spf * spzf)
             / (CAST(k AS DOUBLE) * sp2f - spf * spf), 6) AS intercept6,
       round((CAST(k AS DOUBLE) * spzf - spf * szf)
             / (CAST(k AS DOUBLE) * sp2f - spf * spf), 6) AS slope6
FROM f
"""


QUERIES114: dict[str, tuple] = {
    "fixed_effect_meta_daily": (q_fixed_effect_meta_daily,
                                SQL_FIXED_EFFECT),
    "dsl_random_effects_daily": (q_dsl_random_effects_daily,
                                 SQL_DSL_RANDOM),
    "egger_bias_daily": (q_egger_bias_daily, SQL_EGGER),
}
