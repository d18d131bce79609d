"""Ninetieth oracle-query batch — time-series motif discovery / curve
elbow / preferential-attachment fit:

- matrix_profile_daily: a w=7 matrix profile over the daily revenue
  series quantized to $1000 units (v = c // 100000 — floor division,
  identical both sides; squared distances then stay int64:
  d2 <= 7*(2e5)^2 ~ 2.8e11).  Exact integer squared distances over
  all non-overlapping window pairs (|i-j| >= 7); the DISCORD is the
  window whose nearest-neighbor distance is largest and the MOTIF the
  closest pair — both exact-integer argmins/argmaxes with index
  tiebreaks.  O(n^2 w) ~ 8e6 integer ops on the O(days) series /
  a 4e6-row three-way join in SQL.
- kneedle_lorenz_elbow: the Kneedle elbow of the customer-revenue
  Lorenz curve — the rank maximizing the unnormalized chord cross
  product |cum_i * n - i * T| (exact int64, ~2e16 at sf0.1; cum is
  tie-order-invariant because equal revenues add equal steps).
- yule_simon_fit_orders: Yule-Simon (preferential attachment) fit to
  the orders-per-customer distribution by method of moments:
  rho-hat = mean/(mean-1) = S/(S-n) — one exact integer ratio — plus
  the observed vs predicted P(k=1) = rho/(rho+1) comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000
_MP_W = 7


# ---------------------------------------------------------------------------
# Matrix profile
# ---------------------------------------------------------------------------


def q_matrix_profile_daily(sf_dir: str):
    """Exact-integer w=7 matrix profile discord + motif (docstring
    above)."""
    c = _daily_cents(sf_dir)["c"].to_numpy(np.int64)
    v = c // 100000
    n = len(v)
    nw = n - _MP_W + 1
    wins = np.lib.stride_tricks.sliding_window_view(v, _MP_W) \
        .astype(np.int64)
    nn = np.full(nw, np.iinfo(np.int64).max, np.int64)
    motif = None
    for i in range(nw):
        j0 = i + _MP_W
        if j0 >= nw:
            break
        diff = wins[j0:] - wins[i]
        d2 = (diff * diff).sum(axis=1)
        jmin = int(np.argmin(d2))
        dmin = int(d2[jmin])
        if dmin < nn[i]:
            nn[i] = dmin
        sub = np.minimum(nn[j0:], d2)
        nn[j0:] = sub
        if motif is None or dmin < motif[0] or \
                (dmin == motif[0] and (i, j0 + jmin) < motif[1:]):
            motif = (dmin, i, j0 + jmin)
    discord_i = int(np.argmax(nn))
    out = pd.DataFrame({"n_windows": [nw],
                        "discord_i": [discord_i],
                        "discord_d2": [int(nn[discord_i])],
                        "motif_i": [motif[1]], "motif_j": [motif[2]],
                        "motif_d2": [motif[0]]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_MATRIX_PROFILE = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
seq AS (
  SELECT c // 100000 AS v,
         row_number() OVER (ORDER BY day) - 1 AS t
  FROM daily),
nd AS (SELECT max(t) + 1 AS n FROM seq),
w AS (SELECT t AS i FROM seq, nd WHERE t <= n - {_MP_W}),
pr AS (
  SELECT a.i, b.i AS j FROM w a JOIN w b ON b.i >= a.i + {_MP_W}),
d AS (
  SELECT pr.i, pr.j,
         sum((x.v - y.v) * (x.v - y.v))::BIGINT AS d2
  FROM pr
  JOIN seq x ON x.t BETWEEN pr.i AND pr.i + {_MP_W - 1}
  JOIN seq y ON y.t = x.t - pr.i + pr.j
  GROUP BY 1, 2),
bi AS (SELECT i AS k, d2 FROM d UNION ALL SELECT j AS k, d2 FROM d),
nn AS (SELECT k, min(d2)::BIGINT AS nnd FROM bi GROUP BY 1),
disc AS (SELECT k AS discord_i, nnd AS discord_d2 FROM nn
         ORDER BY nnd DESC, k LIMIT 1),
mot AS (SELECT i AS motif_i, j AS motif_j, d2 AS motif_d2 FROM d
        ORDER BY d2, i, j LIMIT 1)
SELECT (SELECT count(*)::BIGINT FROM w) AS n_windows,
       discord_i::BIGINT AS discord_i, discord_d2,
       motif_i::BIGINT AS motif_i, motif_j::BIGINT AS motif_j,
       motif_d2
FROM disc CROSS JOIN mot
"""


# ---------------------------------------------------------------------------
# Kneedle elbow of the Lorenz curve
# ---------------------------------------------------------------------------


def q_kneedle_lorenz_elbow(sf_dir: str):
    """Kneedle elbow rank of the customer-revenue Lorenz curve
    (docstring above)."""
    from scrapy_ray.pipelines.queries import _cents

    ds = _pq(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def rpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cust": t["o_custkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "rc": _cents(t["o_totalprice"]).to_numpy(
                zero_copy_only=False)})
        g = df.groupby("cust", sort=False)["rc"].sum().reset_index()
        g["rc"] = g["rc"].astype(np.int64)
        return _strip(g)

    per = (ds.map_batches(rpart, batch_format="pyarrow")
             .groupby("cust").aggregate(Sum("rc", alias_name="rc"))
             .to_pandas())
    r = np.sort(per["rc"].to_numpy(np.int64))
    n = len(r)
    t = int(r.sum())
    cum = np.cumsum(r)
    i = np.arange(1, n + 1, dtype=np.int64)
    cross = np.abs(cum * n - i * t)
    k = int(np.argmax(cross))
    share = float(int(cum[k])) / float(t)
    out = pd.DataFrame({"n_cust": [n], "total_c": [t],
                        "elbow_rank": [k + 1],
                        "elbow_cum": [int(cum[k])],
                        "cross_v": [int(cross[k])],
                        "share6": [_round6(np.array([share]))[0]]})
    for col in ("n_cust", "total_c", "elbow_rank", "elbow_cum",
                "cross_v"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KNEEDLE = """
WITH per AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rc
  FROM orders GROUP BY 1),
t AS (SELECT count(*)::BIGINT AS n, sum(rc)::BIGINT AS tot FROM per),
c AS (
  SELECT row_number() OVER (ORDER BY rc, o_custkey) AS i,
         sum(rc) OVER (ORDER BY rc, o_custkey)::BIGINT AS cum
  FROM per),
x AS (
  SELECT i, cum, abs(cum * n - i * tot)::BIGINT AS crossv, n, tot
  FROM c CROSS JOIN t)
SELECT n AS n_cust, tot AS total_c, i::BIGINT AS elbow_rank,
       cum AS elbow_cum, crossv AS cross_v,
       round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share6
FROM x ORDER BY crossv DESC, i LIMIT 1
"""


# ---------------------------------------------------------------------------
# Yule-Simon fit
# ---------------------------------------------------------------------------


def q_yule_simon_fit_orders(sf_dir: str):
    """Yule-Simon rho by method of moments on orders-per-customer
    (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_custkey"])

    def cpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cust": t["o_custkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "k": np.int64(1)})
        g = df.groupby("cust", sort=False).sum().reset_index()
        g["k"] = g["k"].astype(np.int64)
        return _strip(g)

    per = (ds.map_batches(cpart, batch_format="pyarrow")
             .groupby("cust").aggregate(Sum("k", alias_name="k"))
             .to_pandas())
    k = per["k"].to_numpy(np.int64)
    n = len(k)
    s = int(k.sum())
    n1 = int((k == 1).sum())
    rho = float(s) / float(s - n)
    p1_pred = rho / (rho + 1.0)
    p1_obs = float(n1) / float(n)
    out = pd.DataFrame({"n_cust": [n], "n_orders": [s], "n_k1": [n1],
                        "rho6": [_round6(np.array([rho]))[0]],
                        "p1_pred6": [_round6(np.array([p1_pred]))[0]],
                        "p1_obs6": [_round6(np.array([p1_obs]))[0]]})
    for col in ("n_cust", "n_orders", "n_k1"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_YULE_SIMON = """
WITH per AS (
  SELECT o_custkey, count(*)::BIGINT AS k FROM orders GROUP BY 1),
t AS (
  SELECT count(*)::BIGINT AS n, sum(k)::BIGINT AS s,
         sum((k = 1)::INT)::BIGINT AS n1
  FROM per)
SELECT n AS n_cust, s AS n_orders, n1 AS n_k1,
       round(CAST(s AS DOUBLE) / CAST(s - n AS DOUBLE), 6) AS rho6,
       round((CAST(s AS DOUBLE) / CAST(s - n AS DOUBLE))
             / (CAST(s AS DOUBLE) / CAST(s - n AS DOUBLE) + 1.0), 6)
         AS p1_pred6,
       round(CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p1_obs6
FROM t
"""


QUERIES90: dict[str, tuple] = {
    "matrix_profile_daily": (q_matrix_profile_daily, SQL_MATRIX_PROFILE),
    "kneedle_lorenz_elbow": (q_kneedle_lorenz_elbow, SQL_KNEEDLE),
    "yule_simon_fit_orders": (q_yule_simon_fit_orders, SQL_YULE_SIMON),
}
