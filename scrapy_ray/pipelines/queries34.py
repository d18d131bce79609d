"""Thirty-fourth oracle-query batch — experimentation / IR evaluation /
changepoint detection:

- cuped_adjusted_ab: CUPED variance reduction (Deng et al., WSDM'13) —
  the standard online-experimentation estimator. Per-user pre-period
  covariate X (value cents, ts ≤ mid) and post-period metric Y
  (ts > mid), arms g = user_id % 2. θ = cov(X,Y)/var(X) from EXACT
  integer moments (per-user rows stay distributed: user-salted
  partitions emit int64 partial moment rows, driver combines in
  PYTHON ints — the cov_matrix discipline), adjusted arm mean =
  μ_Y(g) − θ·(μ_X(g) − μ_X). ρ² (the variance-reduction fraction) from
  the same exact numerators; floats finalize identical-expression.
- ndcg_by_source: NDCG@10 per source, ranking documents by
  (n_chars DESC, doc_id) with deterministic graded relevance
  rel = doc_id % 4. Gain terms (2^rel−1)/log2(pos+1) are quantized
  PER TERM to 1e-9 units and summed as integers (the repo's
  never-sum-floats rule); NDCG finalizes as one float division of the
  two exact integer sums. Distributed: per-partition per-source
  top-10 partials → tiny final merge; ideal DCG from O(sources×4)
  relevance-count cells — no global sort.
- binseg_changepoint_daily: first step of binary segmentation on the
  daily event-count series — the split day maximizing the between-
  segment sum of squares, argmax over t of A(t)²/(n_L·n_R) with
  A = n_R·S_L − n_L·S_R, ranked on the scaled integer score
  (A²·10¹²)//(n_L·n_R) (the decision-stump discipline — no float ever
  orders the result; Python/HUGEINT exact). Distributed part is the
  O(days) daily-cell shuffle; the scan is O(days) driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq, _ts_minmax_us
from scrapy_ray.pipelines.queries8 import _round6

_Q34_SALT = 64
_NDCG_K = 10
_NDCG_SCALE = 10**9
_BSEG_K = 10**12
_US_PER_DAY = 86_400_000_000


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# CUPED
# ---------------------------------------------------------------------------


def q_cuped_adjusted_ab(sf_dir: str):
    """CUPED-adjusted arm means (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "user_id", "value"])
    lo_us, hi_us = _ts_minmax_us(sf_dir, "events")
    mid_us = lo_us + (hi_us - lo_us) // 2

    def upart(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        post = ts > mid_us
        df = pd.DataFrame({"u": u, "x": np.where(post, 0, c),
                           "y": np.where(post, c, 0)})
        g = df.groupby("u", sort=False)[["x", "y"]].sum().reset_index()
        for col in ("x", "y"):
            g[col] = g[col].astype(np.int64)
        g["sk"] = (g["u"] % _Q34_SALT).astype(np.int64)
        return _strip(g)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("u", sort=False)[["x", "y"]].sum().reset_index()
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        grp = (g["u"].to_numpy(np.int64) % 2)
        rows = []
        for a in (0, 1):
            xm, ym = x[grp == a], y[grp == a]
            rows.append((a, len(xm), int(xm.sum()), int(ym.sum()),
                         int((xm * xm).sum()), int((xm * ym).sum()),
                         int((ym * ym).sum())))
        return pd.DataFrame(rows, columns=["grp", "n", "sx", "sy",
                                           "sxx", "sxy", "syy"])

    parts = (ds.map_batches(upart, batch_format="pyarrow")
             .groupby("sk").map_groups(moments, batch_format="pandas")
             .to_pandas())
    # exact combine (Python ints — n·Sxy overflows int64 at scale)
    agg = {a: {c: 0 for c in ("n", "sx", "sy", "sxx", "sxy", "syy")}
           for a in (0, 1)}
    for _, r in parts.iterrows():
        for c in agg[int(r["grp"])]:
            agg[int(r["grp"])][c] += int(r[c])
    n = agg[0]["n"] + agg[1]["n"]
    sx = agg[0]["sx"] + agg[1]["sx"]
    sy = agg[0]["sy"] + agg[1]["sy"]
    sxx = agg[0]["sxx"] + agg[1]["sxx"]
    sxy = agg[0]["sxy"] + agg[1]["sxy"]
    syy = agg[0]["syy"] + agg[1]["syy"]
    cov_num = n * sxy - sx * sy            # exact big ints
    varx_num = n * sxx - sx * sx
    vary_num = n * syy - sy * sy
    theta = float(cov_num) / float(varx_num)
    rho2 = (float(cov_num) * float(cov_num)
            / (float(varx_num) * float(vary_num)))
    mean_x_all = float(sx) / float(n)
    rows = []
    for a in (0, 1):
        g = agg[a]
        mean_y = float(g["sy"]) / float(g["n"])
        adj = mean_y - theta * (float(g["sx"]) / float(g["n"]) - mean_x_all)
        rows.append((a, g["n"],
                     _round6(np.array([mean_y]))[0],
                     _round6(np.array([adj]))[0],
                     _round6(np.array([theta]))[0],
                     _round6(np.array([rho2]))[0]))
    out = pd.DataFrame(rows, columns=["grp", "n_users", "mean_y6",
                                      "adj_mean6", "theta6", "rho2_6"])
    for c in ("grp", "n_users"):
        out[c] = out[c].astype(np.int64)
    return out


def _cuped_sql(sf_dir: str) -> str:
    return """
WITH b AS (SELECT (epoch_us(min(ts))
                   + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2) AS mid
           FROM events),
u AS (
  SELECT user_id AS u,
         sum(CASE WHEN epoch_us(ts) > (SELECT mid FROM b) THEN 0
             ELSE CAST(round(value * 100) AS BIGINT) END)::BIGINT AS x,
         sum(CASE WHEN epoch_us(ts) > (SELECT mid FROM b)
             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT
           AS y
  FROM events GROUP BY 1),
g AS (
  SELECT (u % 2)::BIGINT AS grp, count(*)::HUGEINT AS n,
         sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
         sum(x*x)::HUGEINT AS sxx, sum(x*y)::HUGEINT AS sxy,
         sum(y*y)::HUGEINT AS syy
  FROM u GROUP BY 1),
t AS (
  SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy, sum(sxx) AS sxx,
         sum(sxy) AS sxy, sum(syy) AS syy
  FROM g),
f AS (
  SELECT CAST(n*sxy - sx*sy AS DOUBLE)
           / CAST(n*sxx - sx*sx AS DOUBLE) AS theta,
         CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
           / (CAST(n*sxx - sx*sx AS DOUBLE)
              * CAST(n*syy - sy*sy AS DOUBLE)) AS rho2,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mxall
  FROM t)
SELECT g.grp, g.n::BIGINT AS n_users,
       round(CAST(g.sy AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS mean_y6,
       round(CAST(g.sy AS DOUBLE) / CAST(g.n AS DOUBLE)
             - f.theta * (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE)
                          - f.mxall), 6) AS adj_mean6,
       round(f.theta, 6) AS theta6, round(f.rho2, 6) AS rho2_6
FROM g, f ORDER BY g.grp
"""


# ---------------------------------------------------------------------------
# NDCG@10
# ---------------------------------------------------------------------------


def q_ndcg_by_source(sf_dir: str):
    """NDCG@10 per source (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def topp(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(
                               zero_copy_only=False).astype(np.int64),
                           "source": np.asarray(t["source"].to_pylist()),
                           "n_chars": t["n_chars"].to_numpy(
                               zero_copy_only=False).astype(np.int64)})
        # partial per-source top-10 + relevance-count cells ride together:
        top = (df.sort_values(["source", "n_chars", "doc_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
               .groupby("source", sort=False).head(_NDCG_K))
        top = top.assign(rel=(top["doc_id"] % 4).astype(np.int64),
                         kind=np.int64(0))
        rc = df.assign(rel=(df["doc_id"] % 4).astype(np.int64)) \
            .groupby(["source", "rel"], sort=False).size() \
            .reset_index(name="cnt")
        rc = rc.assign(doc_id=np.int64(0), n_chars=np.int64(0),
                       kind=np.int64(1))
        cols = ["source", "doc_id", "n_chars", "rel", "cnt", "kind"]
        top = top.assign(cnt=np.int64(1))
        return _strip(pd.concat([top[cols], rc[cols]], ignore_index=True))

    parts = ds.map_batches(topp, batch_format="pyarrow").to_pandas()
    tops = parts[parts["kind"] == 0]
    cells = parts[parts["kind"] == 1] \
        .groupby(["source", "rel"], sort=False)["cnt"].sum().reset_index()
    rows = []
    for src in sorted(cells["source"].unique()):
        t = (tops[tops["source"] == src]
             .sort_values(["n_chars", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(_NDCG_K))
        pos = np.arange(1, len(t) + 1, dtype=np.float64)
        gain = (np.power(2.0, t["rel"].to_numpy(np.float64)) - 1.0) \
            / np.log2(pos + 1.0)
        gq = (np.sign(gain) * np.floor(np.abs(gain) * _NDCG_SCALE + 0.5)) \
            .astype(np.int64)
        dcg_q = int(gq.sum())
        c = cells[cells["source"] == src]
        rel_cnt = np.zeros(4, np.int64)
        rel_cnt[c["rel"].to_numpy(np.int64)] = c["cnt"].to_numpy(np.int64)
        ideal = np.repeat(np.arange(3, -1, -1),
                          rel_cnt[::-1])[:_NDCG_K].astype(np.float64)
        ipos = np.arange(1, len(ideal) + 1, dtype=np.float64)
        igain = (np.power(2.0, ideal) - 1.0) / np.log2(ipos + 1.0)
        iq = (np.sign(igain) * np.floor(np.abs(igain) * _NDCG_SCALE + 0.5)) \
            .astype(np.int64)
        idcg_q = int(iq.sum())
        # a source whose docs are all rel-0 has IDCG 0 -> define NDCG 0
        ndcg6 = 0.0 if idcg_q == 0 else \
            _round6(np.array([float(dcg_q) / float(idcg_q)]))[0]
        rows.append((src, dcg_q, idcg_q, ndcg6))
    out = pd.DataFrame(rows, columns=["source", "dcg_q", "idcg_q", "ndcg6"])
    for c in ("dcg_q", "idcg_q"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_NDCG = f"""
WITH d AS (
  SELECT doc_id, source, n_chars, (doc_id % 4)::BIGINT AS rel
  FROM documents),
rk AS (
  SELECT source, rel,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS pos
  FROM d),
dcg AS (
  SELECT source,
         sum(CAST(round((pow(2.0, rel) - 1.0) / log2(pos + 1.0)
                        * {_NDCG_SCALE}) AS BIGINT))::BIGINT AS dcg_q
  FROM rk WHERE pos <= {_NDCG_K} GROUP BY 1),
irk AS (
  SELECT source, rel,
         row_number() OVER (PARTITION BY source
                            ORDER BY rel DESC, doc_id) AS pos
  FROM d),
idcg AS (
  SELECT source,
         sum(CAST(round((pow(2.0, rel) - 1.0) / log2(pos + 1.0)
                        * {_NDCG_SCALE}) AS BIGINT))::BIGINT AS idcg_q
  FROM irk WHERE pos <= {_NDCG_K} GROUP BY 1)
SELECT dcg.source, dcg_q, idcg_q,
       CASE WHEN idcg_q = 0 THEN 0.0
            ELSE round(CAST(dcg_q AS DOUBLE) / CAST(idcg_q AS DOUBLE), 6)
       END AS ndcg6
FROM dcg JOIN idcg ON dcg.source = idcg.source
ORDER BY dcg.source
"""


# ---------------------------------------------------------------------------
# binary-segmentation changepoint
# ---------------------------------------------------------------------------


def q_binseg_changepoint_daily(sf_dir: str):
    """Best single mean-shift split of daily event counts (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["ts"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day_idx": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    dc = (ds.map_batches(dpart, batch_format="pyarrow")
            .groupby("day_idx").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas().sort_values("day_idx").reset_index(drop=True))
    lo = int(dc["day_idx"].min())
    hi = int(dc["day_idx"].max())
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    y = np.zeros(len(grid), np.int64)
    y[dc["day_idx"].to_numpy(np.int64) - lo] = dc["cnt"].to_numpy(np.int64)
    cs = np.cumsum(y)
    N = len(grid)
    S = int(cs[-1])
    best = None
    for i in range(N - 1):                 # split after grid[i]
        n_l = i + 1
        n_r = N - n_l
        s_l = int(cs[i])
        a = n_r * s_l - n_l * (S - s_l)
        score = (a * a * _BSEG_K) // (n_l * n_r)
        if best is None or score > best[0]:
            best = (score, int(grid[i]), n_l, s_l)
    _, split_day, n_l, s_l = best
    n_r = N - n_l
    s_r = S - s_l
    a = n_r * s_l - n_l * s_r
    out = pd.DataFrame({
        "split_day": [split_day], "n_left": [n_l], "n_right": [n_r],
        "sum_left": [s_l], "sum_right": [s_r],
        "mean_left6": [_round6(np.array([float(s_l) / float(n_l)]))[0]],
        "mean_right6": [_round6(np.array([float(s_r) / float(n_r)]))[0]],
        "bss6": [_round6(np.array(
            [float(a) * float(a)
             / (float(n_l) * float(n_r)) / float(N)]))[0]]})
    for c in ("split_day", "n_left", "n_right", "sum_left", "sum_right"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_BINSEG = f"""
WITH dc AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
bounds AS (SELECT min(day_idx) AS lo, max(day_idx) AS hi FROM dc),
cal AS (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM bounds),
y AS (
  SELECT cal.day_idx, coalesce(dc.cnt, 0)::BIGINT AS y
  FROM cal LEFT JOIN dc ON dc.day_idx = cal.day_idx),
t AS (SELECT count(*)::BIGINT AS N, sum(y)::BIGINT AS S FROM y),
cum AS (
  SELECT day_idx,
         CAST(row_number() OVER (ORDER BY day_idx) AS BIGINT) AS nl,
         CAST(sum(y) OVER (ORDER BY day_idx) AS BIGINT) AS sl
  FROM y),
sc AS (
  SELECT day_idx, nl, sl, N, S,
         (CAST((N - nl)*sl - nl*(S - sl) AS HUGEINT)
            * CAST((N - nl)*sl - nl*(S - sl) AS HUGEINT) * {_BSEG_K})
           // (CAST(nl AS HUGEINT) * (N - nl)) AS score
  FROM cum, t WHERE nl < N)
SELECT day_idx AS split_day, nl AS n_left, (N - nl)::BIGINT AS n_right,
       sl AS sum_left, (S - sl)::BIGINT AS sum_right,
       round(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE), 6) AS mean_left6,
       round(CAST(S - sl AS DOUBLE) / CAST(N - nl AS DOUBLE), 6)
         AS mean_right6,
       round(CAST((N - nl)*sl - nl*(S - sl) AS DOUBLE)
             * CAST((N - nl)*sl - nl*(S - sl) AS DOUBLE)
             / (CAST(nl AS DOUBLE) * CAST(N - nl AS DOUBLE))
             / CAST(N AS DOUBLE), 6) AS bss6
FROM sc ORDER BY score DESC, day_idx LIMIT 1
"""


QUERIES34: dict[str, tuple] = {
    "cuped_adjusted_ab": (q_cuped_adjusted_ab, _cuped_sql("")),
    "ndcg_by_source": (q_ndcg_by_source, SQL_NDCG),
    "binseg_changepoint_daily": (q_binseg_changepoint_daily, SQL_BINSEG),
}
