"""Ninety-first oracle-query batch — classifier-evaluation suite
extensions, all off bounded histograms:

- delong_auc_se: DeLong standard error of the value->purchase AUC.
  With per-cent cells (pos_h, neg_h) and tie-aware rank weights
  w = 2*cumneg_ex + tieneg (per positive) / u = 2*cumpos_ex + tiepos
  (per negative), W = SUM pos_h*w = SUM neg_h*u = 2*nn*m*AUC is ONE
  exact integer, and the structural-component variances clear
  denominators exactly: a10 = SUM pos_h*(m*w - W)^2 (~2e22 at sf0.1,
  Python int / HUGEINT), s10 = (a10/(m-1))/(4 nn^2 m^2), symmetric
  s01; SE = sqrt(s10/m + s01/nn) identical-expression.
- mi_feature_ranking: mutual information of purchase with each of
  three discretized features (value // 50 dollars, hour-of-day,
  day-of-week): per 2-D cell the term c * round(ln(c*n/(r*t))*1e12)
  is an exact int (plug-in MI, zero cells skipped identically);
  features ranked by the exact quantized MI (tie by name).
- cost_optimal_threshold: minimum-cost decision threshold on value
  cents for cost(FP)=1, cost(FN)=5 (module literals): cost(th) =
  #neg >= th + 5 * #pos < th scanned over the support plus the
  predict-nothing sentinel — exact integer argmin, tie -> smallest
  threshold.
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

_FP_COST, _FN_COST = 1, 5


def _pn_hist(sf_dir: str):
    """(support, pos_h, neg_h) per-cent value histogram by purchase
    label."""
    ds = _pq(sf_dir, "events", columns=["value", "event_type"])

    def hpart(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        p = (np.asarray(t["event_type"].to_pylist())
             == "purchase").astype(np.int64)
        df = pd.DataFrame({"c": c, "p": p, "n": np.int64(1)})
        g = df.groupby("c", sort=False).sum().reset_index()
        for col in ("p", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("c").aggregate(Sum("p", alias_name="p"),
                                      Sum("n", alias_name="n"))
              .to_pandas().sort_values("c"))
    c = hist["c"].to_numpy(np.int64)
    pos = hist["p"].to_numpy(np.int64)
    neg = (hist["n"] - hist["p"]).to_numpy(np.int64)
    return c, pos, neg


# ---------------------------------------------------------------------------
# DeLong SE
# ---------------------------------------------------------------------------


def q_delong_auc_se(sf_dir: str):
    """AUC + DeLong SE with exact cleared-denominator components
    (docstring above)."""
    c, pos, neg = _pn_hist(sf_dir)
    m = int(pos.sum())
    nn = int(neg.sum())
    cumn_ex = np.concatenate([[0], np.cumsum(neg[:-1])])
    cump_ex = np.concatenate([[0], np.cumsum(pos[:-1])])
    w = 2 * cumn_ex + neg
    u = 2 * cump_ex + pos
    big_w = int(pos.dot(w))
    a10 = sum(int(p) * (m * int(wv) - big_w) ** 2
              for p, wv in zip(pos, w) if p)
    a01 = sum(int(q) * (nn * int(uv) - big_w) ** 2
              for q, uv in zip(neg, u) if q)
    auc = float(big_w) / float(2 * nn * m)
    s10 = (float(a10) / (m - 1.0)) / float(4 * nn * nn * m * m)
    s01 = (float(a01) / (nn - 1.0)) / float(4 * nn * nn * m * m)
    se = math.sqrt(s10 / m + s01 / nn)
    out = pd.DataFrame({"n_pos": [m], "n_neg": [nn], "w_sum": [big_w],
                        "a10": [str(a10)], "a01": [str(a01)],
                        "auc6": [_round6(np.array([auc]))[0]],
                        "se6": [_round6(np.array([se]))[0]]})
    for col in ("n_pos", "n_neg", "w_sum"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_DELONG = """
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         (event_type = 'purchase')::INT AS p
  FROM events),
h AS (
  SELECT c, sum(p)::BIGINT AS pos,
         sum(1 - p)::BIGINT AS neg
  FROM e GROUP BY 1),
t AS (SELECT sum(pos)::BIGINT AS m, sum(neg)::BIGINT AS nn FROM h),
cw AS (
  SELECT pos, neg,
         2 * (sum(neg) OVER (ORDER BY c) - neg) + neg AS w,
         2 * (sum(pos) OVER (ORDER BY c) - pos) + pos AS u
  FROM h),
ww AS (SELECT sum(pos * w)::BIGINT AS big_w FROM cw),
a AS (
  SELECT
    sum(pos * (m::HUGEINT * w - big_w) * (m::HUGEINT * w - big_w))
      AS a10,
    sum(neg * (nn::HUGEINT * u - big_w) * (nn::HUGEINT * u - big_w))
      AS a01
  FROM cw CROSS JOIN t CROSS JOIN ww),
f AS (
  SELECT m, nn, big_w, a10, a01,
         (CAST(a10 AS DOUBLE) / (m - 1.0))
           / CAST(4 * nn::HUGEINT * nn * m * m AS DOUBLE) AS s10,
         (CAST(a01 AS DOUBLE) / (nn - 1.0))
           / CAST(4 * nn::HUGEINT * nn * m * m AS DOUBLE) AS s01
  FROM t, ww, a)
SELECT m AS n_pos, nn AS n_neg, big_w AS w_sum,
       CAST(a10 AS VARCHAR) AS a10, CAST(a01 AS VARCHAR) AS a01,
       round(CAST(big_w AS DOUBLE) / CAST(2 * nn::HUGEINT * m AS DOUBLE),
             6) AS auc6,
       round(sqrt(s10 / m + s01 / nn), 6) AS se6
FROM f
"""


# ---------------------------------------------------------------------------
# MI feature ranking
# ---------------------------------------------------------------------------


def q_mi_feature_ranking(sf_dir: str):
    """Quantized plug-in MI of purchase vs three discretized features
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["value", "ts", "event_type"])

    def fpart(t: pa.Table) -> pa.Table:
        v = np.floor(t["value"].to_numpy(zero_copy_only=False) + 0.5) \
            .astype(np.int64) // 50
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = ((ts // 1_000_000) % 86400) // 3600
        dow = (ts // 86_400_000_000) % 7
        y = (np.asarray(t["event_type"].to_pylist())
             == "purchase").astype(np.int64)
        frames = []
        for fname, cat in (("valbin", v), ("hour", h), ("dow", dow)):
            frames.append(pd.DataFrame({"feat": fname,
                                        "cat": cat.astype(np.int64),
                                        "y": y, "n": np.int64(1)}))
        df = pd.concat(frames)
        g = df.groupby(["feat", "cat", "y"], sort=False).sum() \
              .reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(fpart, batch_format="pyarrow")
               .groupby(["feat", "cat", "y"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    out_rows = []
    for feat in ("dow", "hour", "valbin"):
        sub = cells[cells["feat"] == feat]
        n = int(sub["n"].sum())
        rt = sub.groupby("cat")["n"].sum().to_dict()
        ctt = sub.groupby("y")["n"].sum().to_dict()
        mi_q = 0
        for cat, y, cnt in zip(sub["cat"], sub["y"], sub["n"]):
            cnt = int(cnt)
            lx = math.log(float(cnt * n)
                          / float(rt[cat] * ctt[y])) * 1e12
            mi_q += cnt * (int(math.floor(lx + 0.5)) if lx >= 0
                           else int(math.ceil(lx - 0.5)))
        out_rows.append((feat, len(sub), mi_q,
                         _round6(np.array([mi_q / (n * 1e12)]))[0]))
    df = pd.DataFrame(out_rows, columns=["feat", "n_cells", "mi_q",
                                         "mi6"])
    rank = df.sort_values(["mi_q", "feat"],
                          ascending=[False, True]).reset_index()
    rmap = {f: i + 1 for i, f in enumerate(rank["feat"])}
    df["rank"] = df["feat"].map(rmap)
    for col in ("n_cells", "mi_q", "rank"):
        df[col] = df[col].astype(np.int64)
    return df.sort_values("feat").reset_index(drop=True)


SQL_MI_RANKING = """
WITH b AS (
  SELECT CAST(round(value) AS BIGINT) // 50 AS valbin,
         ((epoch_us(ts) // 1000000) % 86400) // 3600 AS hour,
         (epoch_us(ts) // 86400000000) % 7 AS dow,
         (event_type = 'purchase')::INT AS y
  FROM events),
f AS (
  SELECT 'valbin' AS feat, valbin AS cat, y FROM b
  UNION ALL SELECT 'hour', hour, y FROM b
  UNION ALL SELECT 'dow', dow, y FROM b),
c AS (SELECT feat, cat, y, count(*)::BIGINT AS n FROM f GROUP BY 1, 2, 3),
tt AS (SELECT feat, sum(n)::BIGINT AS nt FROM c GROUP BY 1),
rt AS (SELECT feat, cat, sum(n)::BIGINT AS r FROM c GROUP BY 1, 2),
ct AS (SELECT feat, y, sum(n)::BIGINT AS t FROM c GROUP BY 1, 2),
mi AS (
  SELECT c.feat, count(*)::BIGINT AS n_cells, max(tt.nt) AS nt,
         sum(c.n * CAST(round(ln(CAST(c.n * tt.nt AS DOUBLE)
                                 / CAST(rt.r * ct.t AS DOUBLE))
                              * 1000000000000) AS BIGINT))::BIGINT
           AS mi_q
  FROM c JOIN tt USING (feat) JOIN rt USING (feat, cat)
  JOIN ct USING (feat, y)
  GROUP BY 1),
rk AS (
  SELECT feat, row_number() OVER (ORDER BY mi_q DESC, feat) AS rank
  FROM mi)
SELECT mi.feat, n_cells, mi_q,
       round(CAST(mi_q AS DOUBLE) / (nt * 1000000000000.0), 6) AS mi6,
       rk.rank::BIGINT AS rank
FROM mi JOIN rk ON rk.feat = mi.feat ORDER BY mi.feat
"""


# ---------------------------------------------------------------------------
# Cost-optimal threshold
# ---------------------------------------------------------------------------


def q_cost_optimal_threshold(sf_dir: str):
    """Minimum-cost threshold scan, exact integer argmin (docstring
    above)."""
    c, pos, neg = _pn_hist(sf_dir)
    m = int(pos.sum())
    nn = int(neg.sum())
    # predict purchase iff value cents >= th; candidate th = each
    # support value and the predict-nothing sentinel max+1
    cump_ex = np.concatenate([[0], np.cumsum(pos[:-1])])
    cumn_ex = np.concatenate([[0], np.cumsum(neg[:-1])])
    best = None
    for i in range(len(c)):
        th = int(c[i])
        fp = nn - int(cumn_ex[i])
        fn = int(cump_ex[i])
        cost = _FP_COST * fp + _FN_COST * fn
        if best is None or cost < best[0] or \
                (cost == best[0] and th < best[1]):
            best = (cost, th, fp, fn)
    th = int(c[-1]) + 1
    cost = _FN_COST * m
    if cost < best[0] or (cost == best[0] and th < best[1]):
        best = (cost, th, 0, m)
    out = pd.DataFrame({"n_pos": [m], "n_neg": [nn],
                        "best_th_c": [best[1]], "fp": [best[2]],
                        "fn": [best[3]], "cost": [best[0]]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_COST_THRESHOLD = f"""
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         (event_type = 'purchase')::INT AS p
  FROM events),
h AS (SELECT c, sum(p)::BIGINT AS pos, sum(1 - p)::BIGINT AS neg
      FROM e GROUP BY 1),
t AS (SELECT sum(pos)::BIGINT AS m, sum(neg)::BIGINT AS nn,
             max(c) AS mx
      FROM h),
cum AS (
  SELECT c,
         (sum(pos) OVER (ORDER BY c) - pos)::BIGINT AS cump_ex,
         (sum(neg) OVER (ORDER BY c) - neg)::BIGINT AS cumn_ex
  FROM h),
cand AS (
  SELECT c AS th, nn - cumn_ex AS fp, cump_ex AS fn,
         {_FP_COST} * (nn - cumn_ex) + {_FN_COST} * cump_ex AS cost
  FROM cum CROSS JOIN t
  UNION ALL
  SELECT mx + 1, 0, m, {_FN_COST} * m FROM t)
SELECT (SELECT m FROM t) AS n_pos, (SELECT nn FROM t) AS n_neg,
       th::BIGINT AS best_th_c, fp::BIGINT AS fp, fn::BIGINT AS fn,
       cost::BIGINT AS cost
FROM cand ORDER BY cost, th LIMIT 1
"""


QUERIES91: dict[str, tuple] = {
    "delong_auc_se": (q_delong_auc_se, SQL_DELONG),
    "mi_feature_ranking": (q_mi_feature_ranking, SQL_MI_RANKING),
    "cost_optimal_threshold": (q_cost_optimal_threshold,
                               SQL_COST_THRESHOLD),
}
