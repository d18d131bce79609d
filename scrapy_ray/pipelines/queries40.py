"""Fortieth oracle-query batch — iterative ML training / sequential
pattern mining / inter-rater agreement:

- logreg_purchase_gd: DISTRIBUTED TRAINING of a binary classifier
  (purchase vs rest from value-dollars and hour-of-day) by 8 full-batch
  gradient-descent steps. Each step is one map_batches pass emitting
  per-batch int64 partial sums of per-row gradient contributions
  (p − y)·x_j quantized to 1e-9 units with half-away sign-rounding —
  the never-sum-floats rule applied to SGD, so the gradient is an exact
  integer on any partitioning and the weight trajectory is bitwise
  reproducible. The sigmoid is the ALGEBRAIC (Elliott) one,
  p = 0.5 + 0.5·z/(1+|z|): +,*,/,abs only — np.exp and libm exp may
  disagree by 1 ulp, so no transcendental enters the recurrence. SQL
  replays all 8 steps as chained CTEs with textually identical float
  expressions. The pruned 3-column read is materialized once and
  re-scanned per step (at 100 TB this is the standard cached-features
  multi-epoch pattern; the gradient itself never leaves O(features)).
- seq_pattern_pairs: support (distinct users) of every ordered
  event-type pattern "a … then … b" — a ≺ b holds iff the user's first
  (ts, event_id)-key of type a precedes their last key of type b.
  Per-batch combiner shrinks rows to per-(user, type) first/last
  partials; a user-salted co-partition merges them and counts all
  O(types²) pairs vectorized (U×T×T indicator tensor per partition,
  exact lexicographic compares — us-timestamps < 2^53 are float-exact).
  Only O(types²) cells shuffle; SQL mirrors with two rank-1 windows
  and a per-user join.
- kappa_event_vs_user_mode: Cohen's κ between each event's actual type
  and its user's MODAL type (behavioral-predictability agreement).
  The (user, type) count cells are built once; each user's mode
  (count desc, type asc) is resolved inside the salted partition and
  the contingency cells (actual, predicted) come from the same cells —
  no join-back, no driver user state. po/pe/κ finalize as one identical
  float expression of exact integers (Σ row·col marginal products stay
  within int64 at any tested scale, HUGEINT-safe in SQL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_P = 64                  # user-salt partitions (repo convention)
_LR_ITERS = 8
_LR_RATE = 0.5
_GRAD_SCALE = 1_000_000_000
_US_PER_HOUR = 3_600_000_000


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _signround(v: np.ndarray) -> np.ndarray:
    """Half-away-from-zero to int64 (DuckDB round parity)."""
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


# ---------------------------------------------------------------------------
# logistic-regression-style GD training
# ---------------------------------------------------------------------------


def q_logreg_purchase_gd(sf_dir: str):
    """8-step full-batch GD with exact quantized gradients (docstring
    above)."""
    ds = _pq(sf_dir, "events",
             columns=["ts", "event_type", "value"]).materialize()

    def feat(t: pa.Table):
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hr = (tu // _US_PER_HOUR) % 24
        x1 = c.astype(np.float64) / 10000.0
        x2 = hr.astype(np.float64) / 24.0
        y = (np.asarray(t["event_type"].to_pylist(), dtype=object)
             == "purchase").astype(np.float64)
        return x1, x2, y

    w0 = 0.0
    w1 = 0.0
    w2 = 0.0
    n = None
    for _ in range(_LR_ITERS):
        cw0, cw1, cw2 = w0, w1, w2

        def gpart(t: pa.Table) -> pa.Table:
            x1, x2, y = feat(t)
            z = (cw0 + cw1 * x1) + cw2 * x2
            p = 0.5 + 0.5 * (z / (1.0 + np.abs(z)))
            d = p - y
            return pa.table({
                "n": pa.array([np.int64(len(y))]),
                "g0": pa.array([int(_signround(
                    d * float(_GRAD_SCALE)).sum())]),
                "g1": pa.array([int(_signround(
                    (d * x1) * float(_GRAD_SCALE)).sum())]),
                "g2": pa.array([int(_signround(
                    (d * x2) * float(_GRAD_SCALE)).sum())])})

        parts = ds.map_batches(gpart, batch_format="pyarrow").to_pandas()
        n = int(parts["n"].sum())
        g0 = sum(int(x) for x in parts["g0"])
        g1 = sum(int(x) for x in parts["g1"])
        g2 = sum(int(x) for x in parts["g2"])
        nf = float(n)
        w0 = w0 - _LR_RATE * ((float(g0) / float(_GRAD_SCALE)) / nf)
        w1 = w1 - _LR_RATE * ((float(g1) / float(_GRAD_SCALE)) / nf)
        w2 = w2 - _LR_RATE * ((float(g2) / float(_GRAD_SCALE)) / nf)

    fw0, fw1, fw2 = w0, w1, w2

    def ppart(t: pa.Table) -> pa.Table:
        x1, x2, _ = feat(t)
        z = (fw0 + fw1 * x1) + fw2 * x2
        return pa.table({"c": pa.array([int((z > 0.0).sum())])})

    npos = int(ds.map_batches(ppart, batch_format="pyarrow")
                 .to_pandas()["c"].sum())
    r6 = _round6(np.array([w0, w1, w2]))
    out = pd.DataFrame({"n": [n], "iters": [_LR_ITERS],
                        "w0_6": [r6[0]], "w1_6": [r6[1]], "w2_6": [r6[2]],
                        "n_pred_pos": [npos]})
    for col in ("n", "iters", "n_pred_pos"):
        out[col] = out[col].astype(np.int64)
    return out


def _logreg_sql() -> str:
    def grad(wcte: str, gname: str) -> str:
        z = f"((w.w0 + w.w1 * x1) + w.w2 * x2)"
        p = f"(0.5 + 0.5 * ({z} / (1.0 + abs({z}))))"
        d = f"({p} - y)"
        return (
            f"{gname} AS (SELECT\n"
            f"  sum(CAST(round({d} * {_GRAD_SCALE}.0) AS BIGINT))::BIGINT"
            f" AS g0,\n"
            f"  sum(CAST(round(({d} * x1) * {_GRAD_SCALE}.0) AS BIGINT))"
            f"::BIGINT AS g1,\n"
            f"  sum(CAST(round(({d} * x2) * {_GRAD_SCALE}.0) AS BIGINT))"
            f"::BIGINT AS g2\n"
            f"  FROM fx, {wcte} w)")

    def step(wprev: str, gname: str, wnext: str) -> str:
        upd = ", ".join(
            f"w.w{j} - {_LR_RATE} * ((CAST(g.g{j} AS DOUBLE) / "
            f"{_GRAD_SCALE}.0) / CAST(nn.n AS DOUBLE)) AS w{j}"
            for j in range(3))
        return f"{wnext} AS (SELECT {upd} FROM {wprev} w, {gname} g, nn)"

    ctes = [
        "feats AS (SELECT CAST(round(value * 100) AS BIGINT) AS c,\n"
        f"  (epoch_us(ts) // {_US_PER_HOUR}) % 24 AS hr,\n"
        "  CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y\n"
        "  FROM events)",
        "fx AS (SELECT CAST(c AS DOUBLE) / 10000.0 AS x1,\n"
        "  CAST(hr AS DOUBLE) / 24.0 AS x2, y FROM feats)",
        "nn AS (SELECT count(*)::BIGINT AS n FROM fx)",
        "w0c AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)",
    ]
    prev = "w0c"
    for i in range(1, _LR_ITERS + 1):
        ctes.append(grad(prev, f"gr{i}"))
        ctes.append(step(prev, f"gr{i}", f"w{i}c"))
        prev = f"w{i}c"
    zfin = "((w.w0 + w.w1 * x1) + w.w2 * x2)"
    ctes.append(
        f"pred AS (SELECT sum(CASE WHEN {zfin} > 0.0 THEN 1 ELSE 0 END)"
        f"::BIGINT AS n_pred_pos FROM fx, {prev} w)")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT nn.n, {_LR_ITERS}::BIGINT AS iters,
       round(w.w0, 6) AS w0_6, round(w.w1, 6) AS w1_6,
       round(w.w2, 6) AS w2_6, pred.n_pred_pos
FROM {prev} w, nn, pred
""")


SQL_LOGREG = _logreg_sql()


# ---------------------------------------------------------------------------
# sequential pattern pairs
# ---------------------------------------------------------------------------


def q_seq_pattern_pairs(sf_dir: str):
    """Support of ordered event-type patterns a ... then ... b
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                        "event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "event_type": np.asarray(t["event_type"].to_pylist(),
                                     dtype=object),
            "tu": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            "eid": t["event_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        df = df.sort_values(["user_id", "event_type", "tu", "eid"],
                            kind="mergesort")
        g = df.groupby(["user_id", "event_type"], sort=False)
        f = g.first().reset_index().rename(
            columns={"tu": "mn_tu", "eid": "mn_eid"})
        l = g.last().reset_index().rename(
            columns={"tu": "mx_tu", "eid": "mx_eid"})
        out = f.merge(l, on=["user_id", "event_type"])
        out["gkey"] = (out["user_id"] % _P).astype(np.int32)
        return _strip(out)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # merge per-batch partials to global per-(user,type) first/last
        df = df.sort_values(["user_id", "event_type", "mn_tu", "mn_eid"],
                            kind="mergesort")
        g = df.groupby(["user_id", "event_type"], sort=False)
        mn = g[["mn_tu", "mn_eid"]].first()
        df2 = df.sort_values(["user_id", "event_type", "mx_tu", "mx_eid"],
                             kind="mergesort")
        mx = df2.groupby(["user_id", "event_type"],
                         sort=False)[["mx_tu", "mx_eid"]].last()
        m = mn.join(mx).reset_index()
        types = np.sort(m["event_type"].unique())
        users = m["user_id"].unique()
        ti = pd.Series(np.arange(len(types)), index=types)
        ui = pd.Series(np.arange(len(users)), index=users)
        U, T = len(users), len(types)
        mn_tu = np.full((U, T), np.inf)
        mn_eid = np.full((U, T), np.inf)
        mx_tu = np.full((U, T), -np.inf)
        mx_eid = np.full((U, T), -np.inf)
        r = ui.reindex(m["user_id"]).to_numpy()
        c = ti.reindex(m["event_type"]).to_numpy()
        mn_tu[r, c] = m["mn_tu"].to_numpy(np.float64)
        mn_eid[r, c] = m["mn_eid"].to_numpy(np.float64)
        mx_tu[r, c] = m["mx_tu"].to_numpy(np.float64)
        mx_eid[r, c] = m["mx_eid"].to_numpy(np.float64)
        a_tu = mn_tu[:, :, None]
        b_tu = mx_tu[:, None, :]
        sup = ((a_tu < b_tu)
               | ((a_tu == b_tu)
                  & (mn_eid[:, :, None] < mx_eid[:, None, :]))).sum(0)
        ai, bi = np.nonzero(sup)
        return pd.DataFrame({"a": types[ai], "b": types[bi],
                             "support": sup[ai, bi].astype(np.int64)})

    out = (ds.map_batches(cpart, batch_format="pyarrow")
             .groupby("gkey").map_groups(pairs, batch_format="pandas")
             .groupby(["a", "b"])
             .aggregate(Sum("support", alias_name="support"))
             .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    out["support"] = out["support"].astype(np.int64)
    return out


SQL_SEQ_PAIRS = """
WITH k AS (
  SELECT user_id, event_type, epoch_us(ts) AS tu, event_id FROM events),
fo AS (
  SELECT user_id, event_type, tu, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY tu, event_id) AS rn
  FROM k),
lo AS (
  SELECT user_id, event_type, tu, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY tu DESC, event_id DESC) AS rn
  FROM k),
fmin AS (SELECT user_id, event_type AS a, tu AS ats, event_id AS aeid
         FROM fo WHERE rn = 1),
lmax AS (SELECT user_id, event_type AS b, tu AS bts, event_id AS beid
         FROM lo WHERE rn = 1)
SELECT a, b, count(*)::BIGINT AS support
FROM fmin JOIN lmax USING (user_id)
WHERE ats < bts OR (ats = bts AND aeid < beid)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Cohen's kappa
# ---------------------------------------------------------------------------


def q_kappa_event_vs_user_mode(sf_dir: str):
    """Cohen's kappa: event type vs the user's modal type (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "event_type": np.asarray(t["event_type"].to_pylist(),
                                     dtype=object),
            "cnt": np.int64(1)})
        g = df.groupby(["user_id", "event_type"], sort=False) \
              .sum().reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        g["gkey"] = (g["user_id"] % _P).astype(np.int32)
        return _strip(g)

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        uc = df.groupby(["user_id", "event_type"],
                        sort=False)["cnt"].sum().reset_index()
        md = uc.sort_values(["user_id", "cnt", "event_type"],
                            ascending=[True, False, True],
                            kind="mergesort") \
               .groupby("user_id", sort=False).first().reset_index() \
               .rename(columns={"event_type": "predicted"})
        j = uc.merge(md[["user_id", "predicted"]], on="user_id")
        out = j.groupby(["event_type", "predicted"],
                        sort=False)["cnt"].sum().reset_index() \
            .rename(columns={"event_type": "actual"})
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    cc = (ds.map_batches(cpart, batch_format="pyarrow")
            .groupby("gkey").map_groups(cells, batch_format="pandas")
            .groupby(["actual", "predicted"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas().sort_values(["actual", "predicted"])
            .reset_index(drop=True))
    cnt = cc["cnt"].to_numpy(np.int64)
    n = int(cnt.sum())
    diag = int(cnt[(cc["actual"] == cc["predicted"]).to_numpy()].sum())
    rm = cc.groupby("actual")["cnt"].sum()
    cm = cc.groupby("predicted")["cnt"].sum()
    pe_num = sum(int(rm[t]) * int(cm[t]) for t in rm.index
                 if t in cm.index)
    nf = float(n)
    po = float(diag) / nf
    pe = float(pe_num) / (nf * nf)
    r6 = _round6(np.array([po, pe, (po - pe) / (1.0 - pe)]))
    out = cc.copy()
    out["cnt"] = out["cnt"].astype(np.int64)
    out["po6"] = r6[0]
    out["pe6"] = r6[1]
    out["kappa6"] = r6[2]
    return out


SQL_KAPPA = """
WITH uc AS (
  SELECT user_id, event_type, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
md AS (
  SELECT user_id, event_type AS predicted
  FROM (SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type) AS rn
        FROM uc)
  WHERE rn = 1),
cells AS (
  SELECT uc.event_type AS actual, md.predicted,
         sum(uc.cnt)::BIGINT AS cnt
  FROM uc JOIN md USING (user_id) GROUP BY 1, 2),
tot AS (SELECT sum(cnt)::BIGINT AS n FROM cells),
dg AS (SELECT coalesce(sum(cnt), 0)::BIGINT AS d
       FROM cells WHERE actual = predicted),
rm AS (SELECT actual AS t, sum(cnt)::BIGINT AS r FROM cells GROUP BY 1),
cm AS (SELECT predicted AS t, sum(cnt)::BIGINT AS c FROM cells GROUP BY 1),
pe AS (SELECT coalesce(sum(r * c), 0)::BIGINT AS pn
       FROM rm JOIN cm USING (t)),
f AS (
  SELECT round(CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po6,
         round(CAST(pn AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe6,
         round((CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
                - CAST(pn AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               / (1.0 - CAST(pn AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
           AS kappa6
  FROM dg, tot, pe)
SELECT cells.actual, cells.predicted, cells.cnt, f.po6, f.pe6, f.kappa6
FROM cells CROSS JOIN f
ORDER BY cells.actual, cells.predicted
"""


QUERIES40: dict[str, tuple] = {
    "logreg_purchase_gd": (q_logreg_purchase_gd, SQL_LOGREG),
    "seq_pattern_pairs": (q_seq_pattern_pairs, SQL_SEQ_PAIRS),
    "kappa_event_vs_user_mode": (q_kappa_event_vs_user_mode, SQL_KAPPA),
}
