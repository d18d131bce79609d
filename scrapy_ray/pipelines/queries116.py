"""One-hundred-sixteenth oracle-query batch — calibrated prediction /
rank inference:

- split_conformal_orders: split-conformal prediction of order price
  from the priority-class mean: fold0 (o_orderkey%3=0) fits
  once-quantized per-priority mean cents, fold1 calibrates — q_hat is
  the ceil((n_cal+1)*0.9)-th smallest |residual| (EXACT integer-cents
  rank selection), fold2 measures empirical coverage of
  mu +- q_hat. Everything is exact ints until the final coverage
  ratio.
- knn_loo_accuracy: leave-one-out 3-NN classification of embedding
  labels with exact integer distances on 1e3-quantized components
  (the queries108 device); neighbour order is the total order
  (d2, vec_id), the vote is majority-of-3 with ties to the smallest
  label.
- brunner_munzel_click_view: the Brunner-Munzel rank test between
  click and view values (scipy formulation): doubled combined and
  within-group midranks are exact ints off the value-cents histogram,
  the rank variances S_i^2 clear to A_i / (4 n_i^2 (n_i-1)) with A_i
  an exact (HUGEINT) sum, and the common-language effect
  p_hat = (SUM D_2 - n2(n2+1)) / (2 n1 n2) is an exact-int ratio.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip


# ---------------------------------------------------------------------------
# split-conformal coverage
# ---------------------------------------------------------------------------


def q_split_conformal_orders(sf_dir: str):
    """Split-conformal coverage on order prices (docstring above)."""
    ds = _pq(sf_dir, "orders",
             columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def tpart(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        m = (k % 3) == 0
        df = pd.DataFrame({"pri": np.asarray(
                               t["o_orderpriority"].to_pylist())[m],
                           "s": cents[m], "n": np.int64(1)})
        g = df.groupby("pri", sort=False).sum().reset_index()
        for col in ("s", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    mu_df = (ds.map_batches(tpart, batch_format="pyarrow")
               .groupby("pri").aggregate(Sum("s", alias_name="s"),
                                         Sum("n", alias_name="n"))
               .to_pandas())
    mu = {r["pri"]: int(np.floor(abs(float(int(r["s"])) / float(int(r["n"])))
                                 + 0.5)
                        * (1 if r["s"] >= 0 else -1))
          for _, r in mu_df.iterrows()}

    def rpart(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        pri = t["o_orderpriority"].to_pylist()
        fold = (k % 3).astype(np.int64)
        mus = np.array([mu[x] for x in pri], np.int64)
        res = np.abs(cents - mus)
        m = fold > 0
        df = pd.DataFrame({"fold": fold[m], "res": res[m],
                           "c": np.int64(1)})
        g = df.groupby(["fold", "res"], sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        # near-distinct residual cents => ~row-count cells: the
        # salted-partition rule (direct 2-key Aggregate measured ~2.5 s
        # slower at sf0.1)
        g["gkey"] = (g["res"] % 64).astype(np.int32)
        return _strip(g)

    def rfinish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["fold", "res"], sort=False)["c"].sum() \
            .reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    cells = (ds.map_batches(rpart, batch_format="pyarrow")
               .groupby("gkey").map_groups(rfinish, batch_format="pandas")
               .to_pandas())
    cal = cells[cells["fold"] == 1].sort_values("res")
    n_cal = int(cal["c"].sum())
    # ceil((n_cal+1)*9/10) with positive operands — DuckDB // truncates
    # toward zero, so the negate-floor-negate trick would diverge
    k_rank = (9 * (n_cal + 1) + 9) // 10
    cum = cal["c"].to_numpy(np.int64).cumsum()
    qhat = int(cal["res"].to_numpy(np.int64)[
        int(np.searchsorted(cum, k_rank, side="left"))])
    tst = cells[cells["fold"] == 2]
    n_test = int(tst["c"].sum())
    covered = int(tst[tst["res"] <= qhat]["c"].sum())
    cov = float(covered) / float(n_test)
    out = pd.DataFrame({"n_cal": [n_cal], "n_test": [n_test],
                        "k_rank": [k_rank], "qhat_cents": [qhat],
                        "covered": [covered],
                        "coverage6": [_round6(np.array([cov]))[0]]})
    for col in ("n_cal", "n_test", "k_rank", "qhat_cents", "covered"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SPLIT_CONFORMAL = """
WITH o AS (
  SELECT o_orderkey % 3 AS fold, o_orderpriority AS pri,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
mu AS (
  SELECT pri, CAST(round(CAST(sum(cents) AS DOUBLE) / count(*))
              AS BIGINT) AS m
  FROM o WHERE fold = 0 GROUP BY 1),
r AS (
  SELECT o.fold, abs(o.cents - mu.m) AS res
  FROM o JOIN mu USING (pri) WHERE o.fold > 0),
nc AS (SELECT count(*)::BIGINT AS n_cal FROM r WHERE fold = 1),
k AS (SELECT n_cal, (9 * (n_cal + 1) + 9) // 10 AS k_rank FROM nc),
qh AS (
  SELECT res AS qhat FROM (
    SELECT res, row_number() OVER (ORDER BY res) AS rn
    FROM r WHERE fold = 1) x JOIN k ON x.rn = k.k_rank),
t AS (
  SELECT count(*)::BIGINT AS n_test,
         sum((res <= (SELECT qhat FROM qh))::INT)::BIGINT AS covered
  FROM r WHERE fold = 2)
SELECT k.n_cal, t.n_test, k.k_rank, (SELECT qhat FROM qh) AS qhat_cents,
       t.covered,
       round(CAST(t.covered AS DOUBLE) / CAST(t.n_test AS DOUBLE), 6)
         AS coverage6
FROM k CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# leave-one-out 3-NN accuracy
# ---------------------------------------------------------------------------


def q_knn_loo_accuracy(sf_dir: str):
    """LOO 3-NN label accuracy, exact int distances (docstring
    above)."""
    import pyarrow.parquet as pq_
    import os
    # the full quantized matrix is tiny (<= 2000 x 64 int64) — load it
    # once driver-side and broadcast via closure capture
    full = pq_.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "label", "embedding"])
    vid = full["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vid)
    vid = vid[order]
    lab = full["label"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)[order]
    emb = np.stack(full["embedding"].to_pylist())[order]
    qm = (np.sign(emb) * np.floor(np.abs(emb.astype(np.float64))
                                  * 1000.0 + 0.5)).astype(np.int64)
    n = len(vid)

    ds = _pq(sf_dir, "embeddings",
             columns=["vec_id", "label", "embedding"])

    def apart(t: pa.Table) -> pa.Table:
        bv = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bl = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        be = np.stack(t["embedding"].to_pylist())
        bq = (np.sign(be) * np.floor(np.abs(be.astype(np.float64))
                                     * 1000.0 + 0.5)).astype(np.int64)
        # exact int distances batch x full
        d2 = ((bq[:, None, :] - qm[None, :, :]) ** 2).sum(axis=2)
        pos = np.searchsorted(vid, bv)
        d2[np.arange(len(bv)), pos] = np.iinfo(np.int64).max // (n + 1)
        key = d2 * np.int64(n) + np.arange(n, dtype=np.int64)[None, :]
        top3 = np.argsort(key, axis=1)[:, :3]
        l3 = lab[top3]
        # majority of 3, ties -> smallest label
        pred = np.where(l3[:, 0] == l3[:, 1], l3[:, 0],
                        np.where(l3[:, 0] == l3[:, 2], l3[:, 0],
                                 np.where(l3[:, 1] == l3[:, 2], l3[:, 1],
                                          l3.min(axis=1))))
        return pa.table({"g": pa.array([0], pa.int64()),
                         "n": pa.array([len(bv)], pa.int64()),
                         "ok": pa.array([int((pred == bl).sum())],
                                        pa.int64())})

    agg = (ds.map_batches(apart, batch_format="pyarrow")
             .groupby("g").aggregate(Sum("n", alias_name="n"),
                                     Sum("ok", alias_name="ok"))
             .to_pandas())
    nn = int(agg["n"].iloc[0])
    ok = int(agg["ok"].iloc[0])
    out = pd.DataFrame({"n": [nn], "correct": [ok],
                        "acc6": [_round6(np.array(
                            [float(ok) / float(nn)]))[0]]})
    for col in ("n", "correct"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KNN_LOO = """
WITH ex AS MATERIALIZED (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS idx,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000.0)
              AS BIGINT) AS qv
  FROM embeddings),
d2 AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb, b.label AS lb,
         sum((a.qv - b.qv) * (a.qv - b.qv))::BIGINT AS d2
  FROM ex a JOIN ex b ON a.idx = b.idx AND a.vec_id <> b.vec_id
  GROUP BY 1, 2, 3),
top3 AS (
  SELECT va, lb FROM (
    SELECT va, lb, row_number() OVER (PARTITION BY va
                                      ORDER BY d2, vb) AS rn
    FROM d2)
  WHERE rn <= 3),
vote AS (
  SELECT va, lb AS pred FROM (
    SELECT va, lb, count(*) AS c,
           row_number() OVER (PARTITION BY va
                              ORDER BY count(*) DESC, lb) AS rn
    FROM top3 GROUP BY 1, 2)
  WHERE rn = 1),
c AS (
  SELECT count(*)::BIGINT AS n,
         sum((v.pred = e.label)::INT)::BIGINT AS ok
  FROM vote v JOIN (SELECT DISTINCT vec_id, label FROM embeddings) e
    ON e.vec_id = v.va)
SELECT n, ok AS correct,
       round(CAST(ok AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc6
FROM c
"""


# ---------------------------------------------------------------------------
# Brunner-Munzel
# ---------------------------------------------------------------------------


def q_brunner_munzel_click_view(sf_dir: str):
    """Brunner-Munzel W + common-language effect between click and
    view values (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def hpart(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        keep = (et == "click") | (et == "view")
        df = pd.DataFrame({"cents": cents[keep],
                           "c1": (et[keep] == "click").astype(np.int64),
                           "c2": (et[keep] == "view").astype(np.int64)})
        g = df.groupby("cents", sort=False).sum().reset_index()
        for col in ("c1", "c2"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(hpart, batch_format="pyarrow")
           .groupby("cents").aggregate(Sum("c1", alias_name="c1"),
                                       Sum("c2", alias_name="c2"))
           .to_pandas().sort_values("cents").reset_index(drop=True))
    c1 = [int(x) for x in h["c1"]]
    c2 = [int(x) for x in h["c2"]]
    n1, n2 = sum(c1), sum(c2)
    nn = n1 + n2
    # doubled midranks per cell
    sd = [0, 0]       # SUM of doubled combined midranks per group
    aa = [0, 0]       # A_i HUGEINT-class sums (python ints)
    cumt = cum1 = cum2 = 0
    cells = []
    for i in range(len(h)):
        tot = c1[i] + c2[i]
        dd = 2 * cumt + tot + 1
        d1 = 2 * cum1 + c1[i] + 1
        d2_ = 2 * cum2 + c2[i] + 1
        cells.append((c1[i], c2[i], dd, d1, d2_))
        sd[0] += c1[i] * dd
        sd[1] += c2[i] * dd
        cumt += tot
        cum1 += c1[i]
        cum2 += c2[i]
    for (cc1, cc2, dd, d1, d2_) in cells:
        if cc1:
            t1 = n1 * (dd - d1) - sd[0] + n1 * (n1 + 1)
            aa[0] += cc1 * t1 * t1
        if cc2:
            t2 = n2 * (dd - d2_) - sd[1] + n2 * (n2 + 1)
            aa[1] += cc2 * t2 * t2
    rb1 = float(sd[0]) / (2.0 * float(n1))
    rb2 = float(sd[1]) / (2.0 * float(n2))
    s1 = float(aa[0]) / (4.0 * float(n1) * float(n1) * float(n1 - 1))
    s2 = float(aa[1]) / (4.0 * float(n2) * float(n2) * float(n2 - 1))
    w = (float(n1) * float(n2) * (rb1 - rb2)
         / (float(nn) * np.sqrt(float(n1) * s1 + float(n2) * s2)))
    phat = (float(sd[1] - n2 * (n2 + 1))
            / (2.0 * float(n1) * float(n2)))
    out = pd.DataFrame({"n1": [n1], "n2": [n2],
                        "sd1": [sd[0]], "sd2": [sd[1]],
                        "phat6": [_round6(np.array([phat]))[0]],
                        "w6": [_round6(np.array([w]))[0]]})
    for col in ("n1", "n2", "sd1", "sd2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BRUNNER_MUNZEL = """
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         sum((event_type = 'click')::INT)::BIGINT AS c1,
         sum((event_type = 'view')::INT)::BIGINT AS c2
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
mr AS (
  SELECT cents, c1, c2,
         2 * coalesce(sum(c1 + c2) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (c1 + c2) + 1 AS dd,
         2 * coalesce(sum(c1) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c1 + 1 AS d1,
         2 * coalesce(sum(c2) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c2 + 1 AS d2
  FROM h),
ns AS (
  SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2,
         sum(c1 * dd)::BIGINT AS sd1, sum(c2 * dd)::BIGINT AS sd2
  FROM mr),
av AS (
  SELECT sum(CAST(c1 AS HUGEINT)
             * CAST(n1 * (dd - d1) - sd1 + n1 * (n1 + 1) AS HUGEINT)
             * CAST(n1 * (dd - d1) - sd1 + n1 * (n1 + 1) AS HUGEINT))
           AS a1,
         sum(CAST(c2 AS HUGEINT)
             * CAST(n2 * (dd - d2) - sd2 + n2 * (n2 + 1) AS HUGEINT)
             * CAST(n2 * (dd - d2) - sd2 + n2 * (n2 + 1) AS HUGEINT))
           AS a2
  FROM mr CROSS JOIN ns),
f AS (
  SELECT n1, n2, sd1, sd2,
         CAST(sd1 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE)) AS rb1,
         CAST(sd2 AS DOUBLE) / (2.0 * CAST(n2 AS DOUBLE)) AS rb2,
         CAST(a1 AS DOUBLE) / (4.0 * CAST(n1 AS DOUBLE)
           * CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)) AS s1,
         CAST(a2 AS DOUBLE) / (4.0 * CAST(n2 AS DOUBLE)
           * CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE)) AS s2
  FROM ns CROSS JOIN av)
SELECT n1, n2, sd1, sd2,
       round(CAST(sd2 - n2 * (n2 + 1) AS DOUBLE)
             / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
         AS phat6,
       round(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * (rb1 - rb2)
             / (CAST(n1 + n2 AS DOUBLE)
                * sqrt(CAST(n1 AS DOUBLE) * s1
                       + CAST(n2 AS DOUBLE) * s2)), 6) AS w6
FROM f
"""


QUERIES116: dict[str, tuple] = {
    "split_conformal_orders": (q_split_conformal_orders,
                               SQL_SPLIT_CONFORMAL),
    "knn_loo_accuracy": (q_knn_loo_accuracy, SQL_KNN_LOO),
    "brunner_munzel_click_view": (q_brunner_munzel_click_view,
                                  SQL_BRUNNER_MUNZEL),
}
