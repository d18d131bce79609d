"""Eighty-ninth oracle-query batch — classic ML baselines, all exact:

- one_r_classifier: Holte's 1R on orders — predict "totalprice above
  the exact disc median" from each single feature (priority, status,
  day-of-week = epoch-day mod 7); per category the majority rule's
  error count is min(above, below) (tie -> predict below, same
  errors); the winning feature minimizes total errors (name
  tiebreak).  Pure exact integers end-to-end.
- batch_perceptron_purchase: 3 epochs of the BATCH perceptron on
  events (y = +/-1 for purchase, x = (1, dollars, hour)): per epoch
  w += SUM_{y*(w.x) <= 0} y*x — integer weights, integer dots
  (~1e15 at sf0.1), integer mistake counts; each epoch is one
  distributed aggregate with the previous weights broadcast; the
  oracle replays epochs as chained scalar-aggregate CTEs.
- fisher_lda_purchase: Fisher's linear discriminant on (dollars,
  hour) with the 2x2 within-class scatter solved EXACTLY: scaled by
  n0*n1, Sw entries and mean-difference d are exact ints (~1e20 at
  sf0.1), w = adj(Sw).d exact (~1e32, int128-safe with the
  dollar/hour feature scale); training confusion counts use the
  identical float score/threshold comparison per row (no float
  sums — only per-row compares of identically-computed floats).
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


# ---------------------------------------------------------------------------
# 1R
# ---------------------------------------------------------------------------


def q_one_r_classifier(sf_dir: str):
    """Holte's 1R over priority/status/day-of-week (docstring above)."""
    ds = _pq(sf_dir, "orders",
             columns=["o_orderpriority", "o_orderstatus", "o_orderdate",
                      "o_totalprice"])

    def cpart(t: pa.Table) -> pa.Table:
        d = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        df = pd.DataFrame({"d": d})
        g = df.groupby("d", sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(cpart, batch_format="pyarrow")
              .groupby("d").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("d"))
    cum = np.cumsum(hist["cnt"].to_numpy(np.int64))
    n = int(cum[-1])
    med = int(hist["d"].to_numpy(np.int64)[
        np.searchsorted(cum, math.ceil(0.5 * n))])

    def fpart(t: pa.Table) -> pa.Table:
        d = np.floor(t["o_totalprice"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        above = (d > med).astype(np.int64)
        dow = ((t["o_orderdate"].cast(pa.int64())
                .to_numpy(zero_copy_only=False) // _US_PER_DAY) % 7)
        frames = []
        for fname, cat in (
                ("priority",
                 np.asarray(t["o_orderpriority"].to_pylist(), object)),
                ("status",
                 np.asarray(t["o_orderstatus"].to_pylist(), object)),
                ("dow", dow.astype(str).astype(object))):
            frames.append(pd.DataFrame({"feat": fname, "cat": cat,
                                        "ab": above,
                                        "n": np.int64(1)}))
        df = pd.concat(frames)
        g = df.groupby(["feat", "cat"], sort=False).sum().reset_index()
        for c in ("ab", "n"):
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(fpart, batch_format="pyarrow")
               .groupby(["feat", "cat"])
               .aggregate(Sum("ab", alias_name="ab"),
                          Sum("n", alias_name="n"))
               .to_pandas())
    cells["err"] = np.minimum(cells["ab"].to_numpy(np.int64),
                              (cells["n"] - cells["ab"])
                              .to_numpy(np.int64))
    g = cells.groupby("feat").agg(n_cats=("cat", "count"),
                                  errors=("err", "sum")).reset_index()
    g = g.sort_values("feat").reset_index(drop=True)
    best = g.sort_values(["errors", "feat"]).iloc[0]["feat"]
    g["best"] = (g["feat"] == best).astype(np.int64)
    for c in ("n_cats", "errors"):
        g[c] = g[c].astype(np.int64)
    g["median_dollar"] = np.int64(med)
    return g


SQL_ONE_R = f"""
WITH b AS (
  SELECT o_orderpriority AS pr, o_orderstatus AS st,
         CAST((epoch_us(o_orderdate) // {_US_PER_DAY}) % 7 AS VARCHAR)
           AS dow,
         CAST(floor(o_totalprice) AS BIGINT) AS d
  FROM orders),
t AS (SELECT quantile_disc(d, 0.5) AS med FROM b),
f AS (
  SELECT 'priority' AS feat, pr AS cat, (d > med)::INT AS ab
  FROM b CROSS JOIN t
  UNION ALL
  SELECT 'status', st, (d > med)::INT FROM b CROSS JOIN t
  UNION ALL
  SELECT 'dow', dow, (d > med)::INT FROM b CROSS JOIN t),
c AS (
  SELECT feat, cat, sum(ab)::BIGINT AS ab, count(*)::BIGINT AS n
  FROM f GROUP BY 1, 2),
e AS (
  SELECT feat, count(*)::BIGINT AS n_cats,
         sum(least(ab, n - ab))::BIGINT AS errors
  FROM c GROUP BY 1),
bst AS (SELECT feat AS bf FROM e ORDER BY errors, feat LIMIT 1)
SELECT feat, n_cats, errors, (feat = bf)::BIGINT AS best,
       (SELECT med FROM t)::BIGINT AS median_dollar
FROM e CROSS JOIN bst ORDER BY feat
"""


# ---------------------------------------------------------------------------
# Batch perceptron
# ---------------------------------------------------------------------------

_BP_EPOCHS = 3


def _bp_feats(t: pa.Table):
    v = np.floor(t["value"].to_numpy(zero_copy_only=False) + 0.5) \
        .astype(np.int64)
    sod = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
           // 1_000_000) % 86400
    h = (sod // 3600).astype(np.int64)
    y = np.where(np.asarray(t["event_type"].to_pylist()) == "purchase",
                 np.int64(1), np.int64(-1))
    return v, h, y


def q_batch_perceptron_purchase(sf_dir: str):
    """3-epoch batch perceptron with exact integer weights (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["value", "ts", "event_type"])
    w = (0, 0, 0)
    mistakes = []
    for _ in range(_BP_EPOCHS):
        w0, w1, w2 = w

        def epart(t: pa.Table, w0=w0, w1=w1, w2=w2) -> pa.Table:
            v, h, y = _bp_feats(t)
            dot = w0 + w1 * v + w2 * h
            mis = y * dot <= 0
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "m": pa.array([int(mis.sum())], pa.int64()),
                "u0": pa.array([int(y[mis].sum())], pa.int64()),
                "u1": pa.array([int((y[mis] * v[mis]).sum())],
                               pa.int64()),
                "u2": pa.array([int((y[mis] * h[mis]).sum())],
                               pa.int64())})

        agg = (ds.map_batches(epart, batch_format="pyarrow")
                 .groupby("g")
                 .aggregate(Sum("m", alias_name="m"),
                            Sum("u0", alias_name="u0"),
                            Sum("u1", alias_name="u1"),
                            Sum("u2", alias_name="u2"))
                 .to_pandas())
        mistakes.append(int(agg["m"].iloc[0]))
        w = (w0 + int(agg["u0"].iloc[0]),
             w1 + int(agg["u1"].iloc[0]),
             w2 + int(agg["u2"].iloc[0]))
    out = pd.DataFrame({"w0": [w[0]], "w1": [w[1]], "w2": [w[2]],
                        "m1": [mistakes[0]], "m2": [mistakes[1]],
                        "m3": [mistakes[2]]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


def _bp_sql() -> str:
    head = """
WITH b AS (
  SELECT CAST(round(value) AS BIGINT) AS v,
         ((epoch_us(ts) // 1000000) % 86400) // 3600 AS h,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS y
  FROM events),
w0 AS (SELECT 0::BIGINT AS w0, 0::BIGINT AS w1, 0::BIGINT AS w2)"""
    steps = []
    for t in range(1, _BP_EPOCHS + 1):
        steps.append(f""",
e{t} AS (
  SELECT count(*) FILTER (WHERE y * (w0 + w1 * v + w2 * h) <= 0)
           ::BIGINT AS m,
         coalesce(sum(y) FILTER (
           WHERE y * (w0 + w1 * v + w2 * h) <= 0), 0)::BIGINT AS u0,
         coalesce(sum(y * v) FILTER (
           WHERE y * (w0 + w1 * v + w2 * h) <= 0), 0)::BIGINT AS u1,
         coalesce(sum(y * h) FILTER (
           WHERE y * (w0 + w1 * v + w2 * h) <= 0), 0)::BIGINT AS u2
  FROM b CROSS JOIN w{t-1}),
w{t} AS (
  SELECT w{t-1}.w0 + e{t}.u0 AS w0, w{t-1}.w1 + e{t}.u1 AS w1,
         w{t-1}.w2 + e{t}.u2 AS w2
  FROM w{t-1} CROSS JOIN e{t})""")
    tail = f"""
SELECT w{_BP_EPOCHS}.w0, w{_BP_EPOCHS}.w1, w{_BP_EPOCHS}.w2,
       e1.m AS m1, e2.m AS m2, e3.m AS m3
FROM w{_BP_EPOCHS} CROSS JOIN e1 CROSS JOIN e2 CROSS JOIN e3"""
    return head + "".join(steps) + tail


SQL_BATCH_PERCEPTRON = _bp_sql()


# ---------------------------------------------------------------------------
# Fisher LDA
# ---------------------------------------------------------------------------


def q_fisher_lda_purchase(sf_dir: str):
    """Exact-integer Fisher LDA on (dollars, hour) (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["value", "ts", "event_type"])

    def mpart(t: pa.Table) -> pa.Table:
        v, h, y = _bp_feats(t)
        cls = (y > 0).astype(np.int64)
        df = pd.DataFrame({"cls": cls, "n": np.int64(1), "sx": v,
                           "ss": h, "sxx": v * v, "sss": h * h,
                           "sxs": v * h})
        g = df.groupby("cls", sort=False).sum().reset_index()
        for c in g.columns:
            g[c] = g[c].astype(np.int64)
        return _strip(g)

    m = (ds.map_batches(mpart, batch_format="pyarrow")
           .groupby("cls")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sx", alias_name="sx"),
                      Sum("ss", alias_name="ss"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("sss", alias_name="sss"),
                      Sum("sxs", alias_name="sxs"))
           .to_pandas().set_index("cls"))
    g0 = {k: int(m.loc[0][k]) for k in m.columns}
    g1 = {k: int(m.loc[1][k]) for k in m.columns}
    n0, n1 = g0["n"], g1["n"]
    sw11 = n1 * (n0 * g0["sxx"] - g0["sx"] ** 2) \
        + n0 * (n1 * g1["sxx"] - g1["sx"] ** 2)
    sw22 = n1 * (n0 * g0["sss"] - g0["ss"] ** 2) \
        + n0 * (n1 * g1["sss"] - g1["ss"] ** 2)
    sw12 = n1 * (n0 * g0["sxs"] - g0["sx"] * g0["ss"]) \
        + n0 * (n1 * g1["sxs"] - g1["sx"] * g1["ss"])
    dx = n0 * g1["sx"] - n1 * g0["sx"]
    dsod = n0 * g1["ss"] - n1 * g0["ss"]
    w1 = sw22 * dx - sw12 * dsod
    w2 = sw11 * dsod - sw12 * dx
    w1f, w2f = float(w1), float(w2)
    thr = (w1f * float(n1 * g0["sx"] + n0 * g1["sx"])
           + w2f * float(n1 * g0["ss"] + n0 * g1["ss"])) \
        / (2.0 * float(n0) * float(n1))

    def cpart(t: pa.Table, w1f=w1f, w2f=w2f, thr=thr) -> pa.Table:
        v, h, y = _bp_feats(t)
        score = w1f * v + w2f * h
        pred1 = score > thr
        act1 = y > 0
        return pa.table({
            "g": pa.array([0], pa.int64()),
            "tp": pa.array([int((pred1 & act1).sum())], pa.int64()),
            "fp": pa.array([int((pred1 & ~act1).sum())], pa.int64()),
            "fn": pa.array([int((~pred1 & act1).sum())], pa.int64()),
            "tn": pa.array([int((~pred1 & ~act1).sum())], pa.int64())})

    cm = (ds.map_batches(cpart, batch_format="pyarrow")
            .groupby("g")
            .aggregate(Sum("tp", alias_name="tp"),
                       Sum("fp", alias_name="fp"),
                       Sum("fn", alias_name="fn"),
                       Sum("tn", alias_name="tn"))
            .to_pandas())
    tp, fp = int(cm["tp"].iloc[0]), int(cm["fp"].iloc[0])
    fn, tn = int(cm["fn"].iloc[0]), int(cm["tn"].iloc[0])
    acc = float(tp + tn) / float(tp + fp + fn + tn)
    out = pd.DataFrame({"n0": [n0], "n1": [n1],
                        "w1": [str(w1)], "w2": [str(w2)],
                        "tp": [tp], "fp": [fp], "fn": [fn], "tn": [tn],
                        "acc6": [_round6(np.array([acc]))[0]]})
    for col in ("n0", "n1", "tp", "fp", "fn", "tn"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_FISHER_LDA = """
WITH b AS (
  SELECT CAST(round(value) AS BIGINT) AS v,
         ((epoch_us(ts) // 1000000) % 86400) // 3600 AS h,
         (event_type = 'purchase')::INT AS cls
  FROM events),
m AS (
  SELECT cls, count(*)::BIGINT AS n, sum(v)::BIGINT AS sx,
         sum(h)::BIGINT AS ss, sum(v * v)::BIGINT AS sxx,
         sum(h * h)::BIGINT AS sss, sum(v * h)::BIGINT AS sxs
  FROM b GROUP BY 1),
p AS (
  SELECT
    max(CASE WHEN cls = 0 THEN n END) AS n0,
    max(CASE WHEN cls = 1 THEN n END) AS n1,
    max(CASE WHEN cls = 0 THEN sx END) AS sx0,
    max(CASE WHEN cls = 1 THEN sx END) AS sx1,
    max(CASE WHEN cls = 0 THEN ss END) AS ss0,
    max(CASE WHEN cls = 1 THEN ss END) AS ss1,
    max(CASE WHEN cls = 0 THEN sxx END) AS sxx0,
    max(CASE WHEN cls = 1 THEN sxx END) AS sxx1,
    max(CASE WHEN cls = 0 THEN sss END) AS sss0,
    max(CASE WHEN cls = 1 THEN sss END) AS sss1,
    max(CASE WHEN cls = 0 THEN sxs END) AS sxs0,
    max(CASE WHEN cls = 1 THEN sxs END) AS sxs1
  FROM m),
wv AS (
  SELECT p.*,
    (n1::HUGEINT * (n0::HUGEINT * sxx0 - sx0::HUGEINT * sx0)
     + n0::HUGEINT * (n1::HUGEINT * sxx1 - sx1::HUGEINT * sx1))
      AS sw11,
    (n1::HUGEINT * (n0::HUGEINT * sss0 - ss0::HUGEINT * ss0)
     + n0::HUGEINT * (n1::HUGEINT * sss1 - ss1::HUGEINT * ss1))
      AS sw22,
    (n1::HUGEINT * (n0::HUGEINT * sxs0 - sx0::HUGEINT * ss0)
     + n0::HUGEINT * (n1::HUGEINT * sxs1 - sx1::HUGEINT * ss1))
      AS sw12,
    (n0::HUGEINT * sx1 - n1::HUGEINT * sx0) AS dx,
    (n0::HUGEINT * ss1 - n1::HUGEINT * ss0) AS dsod
  FROM p),
wf AS (
  SELECT wv.*,
         sw22 * dx - sw12 * dsod AS w1,
         sw11 * dsod - sw12 * dx AS w2
  FROM wv),
thr AS (
  SELECT wf.*,
         (CAST(w1 AS DOUBLE)
            * CAST(n1::HUGEINT * sx0 + n0::HUGEINT * sx1 AS DOUBLE)
          + CAST(w2 AS DOUBLE)
            * CAST(n1::HUGEINT * ss0 + n0::HUGEINT * ss1 AS DOUBLE))
         / (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS t
  FROM wf),
cm AS (
  SELECT
    sum((CAST(w1 AS DOUBLE) * v + CAST(w2 AS DOUBLE) * h > t
         AND cls = 1)::INT)::BIGINT AS tp,
    sum((CAST(w1 AS DOUBLE) * v + CAST(w2 AS DOUBLE) * h > t
         AND cls = 0)::INT)::BIGINT AS fp,
    sum((NOT (CAST(w1 AS DOUBLE) * v + CAST(w2 AS DOUBLE) * h > t)
         AND cls = 1)::INT)::BIGINT AS fn,
    sum((NOT (CAST(w1 AS DOUBLE) * v + CAST(w2 AS DOUBLE) * h > t)
         AND cls = 0)::INT)::BIGINT AS tn,
    max(n0) AS n0, max(n1) AS n1,
    max(w1) AS w1, max(w2) AS w2
  FROM b CROSS JOIN thr)
SELECT n0, n1, CAST(w1 AS VARCHAR) AS w1, CAST(w2 AS VARCHAR) AS w2,
       tp, fp, fn, tn,
       round(CAST(tp + tn AS DOUBLE)
             / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS acc6
FROM cm
"""


QUERIES89: dict[str, tuple] = {
    "one_r_classifier": (q_one_r_classifier, SQL_ONE_R),
    "batch_perceptron_purchase": (q_batch_perceptron_purchase,
                                  SQL_BATCH_PERCEPTRON),
    "fisher_lda_purchase": (q_fisher_lda_purchase, SQL_FISHER_LDA),
}
