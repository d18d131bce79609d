"""Fifty-seventh oracle-query batch — inequality indices / segregation
indices / rule-classifier evaluation, exact integer cores throughout:

- theil_atkinson_order_value: three inequality indices of order value
  in whole dollars — Theil T, Theil L (mean log deviation) and
  Atkinson(eps=1) — from ONE bounded (dollar, count) histogram (cells
  bounded by the fixed price range, not row count).  The log terms are
  quantized per CELL to 1e-6 units (round half-away, terms >= 0 since
  v >= 1 dollar), so QT = sum cnt*round(1e6*v*ln v) and
  QL = sum cnt*round(1e6*ln v) are exact integers (Python int /
  HUGEINT at scale) and each index is a single identical float
  expression of (QT, QL, n, S) on both sides.
- duncan_segregation_dow: Duncan's dissimilarity index D between
  click and purchase events across day-of-week cells, with the
  isolation index P*(a,a) and interaction index P*(a,b).  With exact
  per-dow integer counts (a_d, b_d), the D numerator
  sum |a_d*B - b_d*A| is EXACT (HUGEINT), finalized by one float
  division; the two exposure indices quantize each of the seven cell
  terms to 1e-9 units and integer-sum.
- confusion_metrics_purchase: full confusion-matrix evaluation of the
  fixed rule "predict purchase iff value-cents > global median" —
  the median comes from a bounded (cents, label, count) histogram at
  the DuckDB quantile_disc rank convention (ceil(0.5*n), 1-based),
  TP/FP/FN/TN are exact integers from the same histogram, and
  precision / recall / F1 / balanced accuracy / Youden's J / Matthews
  correlation are identical float expressions (the MCC numerator
  tp*tn - fp*fn rides HUGEINT; float(python_int) == CAST(HUGEINT AS
  DOUBLE) per the round-4 parity note).
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
_TH_SCALE = 10**6        # 1e-6 units for per-cell v*ln(v) / ln(v) terms
_SEG_SCALE = 10**9       # 1e-9 units for per-dow exposure terms


# ---------------------------------------------------------------------------
# Theil / Atkinson inequality
# ---------------------------------------------------------------------------


def q_theil_atkinson_order_value(sf_dir: str):
    """Theil T / Theil L / Atkinson(1) of order value in dollars from one
    bounded histogram (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hpart(t: pa.Table) -> pa.Table:
        y = (t["o_totalprice"].to_numpy(zero_copy_only=False)
             .astype(np.float64))
        d = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        u, cnt = np.unique(d, return_counts=True)
        return pa.table({"v": pa.array(u),
                         "cnt": pa.array(cnt.astype(np.int64))})

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby("v").aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())                 # bounded by the dollar range
    n = 0
    s = 0
    qt = 0
    ql = 0
    for v, cnt in zip(cells["v"].to_numpy(np.int64),
                      cells["cnt"].to_numpy(np.int64)):
        v = int(v)
        cnt = int(cnt)
        n += cnt
        s += v * cnt
        # terms >= 0 (v >= 1 dollar): floor(x+0.5) == round half-away
        qt += cnt * int(math.floor(
            math.log(float(v)) * float(v) * float(_TH_SCALE) + 0.5))
        ql += cnt * int(math.floor(
            math.log(float(v)) * float(_TH_SCALE) + 0.5))
    theil_t = (float(qt) / (1e6 * float(s))
               + math.log(float(n) / float(s)))
    theil_l = (math.log(float(s) / float(n))
               - float(ql) / (1e6 * float(n)))
    atkinson = (1.0 - math.exp(float(ql) / (1e6 * float(n)))
                * float(n) / float(s))
    r6 = _round6(np.array([theil_t, theil_l, atkinson]))
    out = pd.DataFrame({"n": [n], "s_dollars": [s],
                        "theil_t6": [r6[0]], "theil_l6": [r6[1]],
                        "atkinson6": [r6[2]]})
    for col in ("n", "s_dollars"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_THEIL = f"""
WITH d AS (
  SELECT CAST(round(o_totalprice) AS BIGINT) AS v FROM orders),
h AS (SELECT v, count(*)::BIGINT AS cnt FROM d GROUP BY 1),
q AS (
  SELECT sum(cnt)::BIGINT AS n, sum(v * cnt)::BIGINT AS s,
         sum(cnt * CAST(round(ln(CAST(v AS DOUBLE)) * CAST(v AS DOUBLE)
                              * {_TH_SCALE}.0) AS BIGINT)) AS qt,
         sum(cnt * CAST(round(ln(CAST(v AS DOUBLE))
                              * {_TH_SCALE}.0) AS BIGINT)) AS ql
  FROM h)
SELECT n, s AS s_dollars,
       round(CAST(qt AS DOUBLE) / (1e6 * CAST(s AS DOUBLE))
             + ln(CAST(n AS DOUBLE) / CAST(s AS DOUBLE)), 6) AS theil_t6,
       round(ln(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             - CAST(ql AS DOUBLE) / (1e6 * CAST(n AS DOUBLE)), 6)
         AS theil_l6,
       round(1.0 - exp(CAST(ql AS DOUBLE) / (1e6 * CAST(n AS DOUBLE)))
             * CAST(n AS DOUBLE) / CAST(s AS DOUBLE), 6) AS atkinson6
FROM q
"""


# ---------------------------------------------------------------------------
# Duncan segregation indices
# ---------------------------------------------------------------------------


def q_duncan_segregation_dow(sf_dir: str):
    """Duncan D + isolation/interaction exposure of click vs purchase
    across day-of-week cells (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64())
               .to_numpy(zero_copy_only=False) // _US_PER_DAY)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        df = pd.DataFrame({"dow": (day % 7).astype(np.int64),
                           "a": (et == "click").astype(np.int64),
                           "b": (et == "purchase").astype(np.int64)})
        g = df.groupby("dow", sort=False)[["a", "b"]].sum().reset_index()
        for col in ("dow", "a", "b"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    g = (ds.map_batches(dpart, batch_format="pyarrow")
           .groupby("dow")
           .aggregate(Sum("a", alias_name="a"), Sum("b", alias_name="b"))
           .to_pandas())                     # 7 rows
    a = [int(v) for v in g["a"].to_numpy(np.int64)]
    b = [int(v) for v in g["b"].to_numpy(np.int64)]
    at = sum(a)
    bt = sum(b)
    dnum = sum(abs(ai * bt - bi * at) for ai, bi in zip(a, b))
    qa = 0
    qi = 0
    for ai, bi in zip(a, b):
        # exposure terms in [0,1]: floor(x+0.5) == round half-away
        qa += int(math.floor((float(ai) / float(at))
                             * (float(ai) / float(ai + bi))
                             * float(_SEG_SCALE) + 0.5))
        qi += int(math.floor((float(ai) / float(at))
                             * (float(bi) / float(ai + bi))
                             * float(_SEG_SCALE) + 0.5))
    d = float(dnum) / (2.0 * float(at) * float(bt))
    r6 = _round6(np.array([d, float(qa) / 1e9, float(qi) / 1e9]))
    out = pd.DataFrame({"n_dow": [len(a)], "a_total": [at],
                        "b_total": [bt], "d6": [r6[0]],
                        "iso_a6": [r6[1]], "int_ab6": [r6[2]]})
    for col in ("n_dow", "a_total", "b_total"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_DUNCAN = f"""
WITH e AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) % 7 AS dow,
         (event_type = 'click')::INT AS ai,
         (event_type = 'purchase')::INT AS bi
  FROM events),
g AS (
  SELECT dow, sum(ai)::BIGINT AS a, sum(bi)::BIGINT AS b
  FROM e GROUP BY 1),
t AS (SELECT sum(a)::BIGINT AS at, sum(b)::BIGINT AS bt FROM g),
q AS (
  SELECT count(*)::BIGINT AS n_dow, max(at)::BIGINT AS at,
         max(bt)::BIGINT AS bt,
         sum(abs(a::HUGEINT * bt - b::HUGEINT * at)) AS dnum,
         sum(CAST(round((CAST(a AS DOUBLE) / CAST(at AS DOUBLE))
                        * (CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
                        * {_SEG_SCALE}.0) AS BIGINT))::BIGINT AS qa,
         sum(CAST(round((CAST(a AS DOUBLE) / CAST(at AS DOUBLE))
                        * (CAST(b AS DOUBLE) / CAST(a + b AS DOUBLE))
                        * {_SEG_SCALE}.0) AS BIGINT))::BIGINT AS qi
  FROM g, t)
SELECT n_dow, at AS a_total, bt AS b_total,
       round(CAST(dnum AS DOUBLE)
             / (2.0 * CAST(at AS DOUBLE) * CAST(bt AS DOUBLE)), 6) AS d6,
       round(CAST(qa AS DOUBLE) / 1000000000.0, 6) AS iso_a6,
       round(CAST(qi AS DOUBLE) / 1000000000.0, 6) AS int_ab6
FROM q
"""


# ---------------------------------------------------------------------------
# confusion-matrix metrics of the fixed median rule
# ---------------------------------------------------------------------------


def q_confusion_metrics_purchase(sf_dir: str):
    """Precision/recall/F1/balanced-accuracy/Youden/MCC of the rule
    "purchase iff value-cents > global median" (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def cpart(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        df = pd.DataFrame({"c": c, "y": (et == "purchase")
                           .astype(np.int64)})
        g = df.groupby(["c", "y"], sort=False).size() \
              .rename("cnt").reset_index()
        for col in ("c", "y", "cnt"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    # bounded by 2 x the cents value range, not by row count
    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["c", "y"]).aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas()).sort_values("c", kind="mergesort")
    cs = cells["c"].to_numpy(np.int64)
    ys = cells["y"].to_numpy(np.int64)
    cnt = cells["cnt"].to_numpy(np.int64)
    n = int(cnt.sum())
    # quantile_disc median: element at 1-based rank ceil(0.5*n) over c asc
    uc = np.unique(cs)
    tot_by_c = pd.DataFrame({"c": cs, "cnt": cnt}) \
        .groupby("c", sort=True)["cnt"].sum()
    cum = tot_by_c.to_numpy(np.int64).cumsum()
    med = int(uc[int(np.searchsorted(cum, int(math.ceil(0.5 * n))))])
    hi = cs > med
    tp = int(cnt[hi & (ys == 1)].sum())
    fp = int(cnt[hi & (ys == 0)].sum())
    fn = int(cnt[~hi & (ys == 1)].sum())
    tn = int(cnt[~hi & (ys == 0)].sum())
    precision = float(tp) / float(tp + fp)
    recall = float(tp) / float(tp + fn)
    f1 = (2.0 * float(tp)
          / (2.0 * float(tp) + float(fp) + float(fn)))
    bacc = (float(tp) / float(tp + fn)
            + float(tn) / float(tn + fp)) / 2.0
    youden = (float(tp) / float(tp + fn)
              + float(tn) / float(tn + fp) - 1.0)
    mcc = (float(tp * tn - fp * fn)
           / math.sqrt(float(tp + fp) * float(tp + fn)
                       * float(tn + fp) * float(tn + fn)))
    r6 = _round6(np.array([precision, recall, f1, bacc, youden, mcc]))
    out = pd.DataFrame({
        "med_cents": [med], "tp": [tp], "fp": [fp], "fn": [fn],
        "tn": [tn], "precision6": [r6[0]], "recall6": [r6[1]],
        "f16": [r6[2]], "bacc6": [r6[3]], "youden6": [r6[4]],
        "mcc6": [r6[5]]})
    for col in ("med_cents", "tp", "fp", "fn", "tn"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CONFUSION = """
WITH d AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         (event_type = 'purchase')::INT AS y
  FROM events),
m AS (SELECT quantile_disc(c, 0.5)::BIGINT AS med FROM d),
cf AS (
  SELECT max(med)::BIGINT AS med,
         sum(CASE WHEN y = 1 AND c > med THEN 1 ELSE 0 END)::BIGINT AS tp,
         sum(CASE WHEN y = 0 AND c > med THEN 1 ELSE 0 END)::BIGINT AS fp,
         sum(CASE WHEN y = 1 AND c <= med THEN 1 ELSE 0 END)::BIGINT AS fn,
         sum(CASE WHEN y = 0 AND c <= med THEN 1 ELSE 0 END)::BIGINT AS tn
  FROM d, m)
SELECT med AS med_cents, tp, fp, fn, tn,
       round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
         AS precision6,
       round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) AS recall6,
       round(2.0 * CAST(tp AS DOUBLE)
             / (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
                + CAST(fn AS DOUBLE)), 6) AS f16,
       round((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
              + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE)) / 2.0, 6)
         AS bacc6,
       round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
             + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE) - 1.0, 6)
         AS youden6,
       round(CAST(tp::HUGEINT * tn - fp::HUGEINT * fn AS DOUBLE)
             / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                    * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)),
             6) AS mcc6
FROM cf
"""


QUERIES57: dict[str, tuple] = {
    "theil_atkinson_order_value": (q_theil_atkinson_order_value,
                                   SQL_THEIL),
    "duncan_segregation_dow": (q_duncan_segregation_dow, SQL_DUNCAN),
    "confusion_metrics_purchase": (q_confusion_metrics_purchase,
                                   SQL_CONFUSION),
}
