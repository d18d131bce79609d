"""Forty-eighth oracle-query batch — randomness / serial-correlation /
lexical-richness testing, exact integer cores throughout:

- runs_test_daily_revenue: Wald-Wolfowitz runs test of randomness on
  the daily-revenue series (dollars) vs its median. Median follows the
  DuckDB quantile_disc convention (element at 1-based rank ceil(q*n));
  days equal to the median are dropped (standard treatment). n1/n2/R
  are exact integers from one ordered scan; the normal approximation
  mu = 1 + 2*n1*n2/m and var = 2*n1*n2*(2*n1*n2-m) / (m^2*(m-1))
  finalize identical-expression from exact integer products.
- ljung_box_daily_revenue: Ljung-Box portmanteau Q at lags 1..7 on
  daily revenue in KILODOLLARS (same unit as durbin_watson — dollar
  units would overflow HUGEINT in the d^2 sums at sf1). The mean-
  centering trick: d_t = n*y_t - S is an EXACT integer with
  sum(d)=0, so every autocovariance numerator g_k = sum d_t d_{t-k}
  and g_0 = sum d_t^2 is exact (Python ints / HUGEINT — g_0 ~ 2.5e19
  at sf0.1, past int64); r_k = g_k/g_0 and
  Q = n(n+2) * (r1^2/(n-1) + ... + r7^2/(n-7)) finalize as the same
  left-associated float expression on both sides (r_k^2 is written
  x*x, never pow, for bit parity).
- yule_k_by_source: Yule's K lexical-richness characteristic per
  document source, K = 1e4 * (S2 - N) / N^2 with N = total tokens and
  S2 = sum of squared type frequencies — both exact integers from a
  distributed (source, word) term-frequency aggregate (block-partial
  unique counts -> groupby sum, the zipf/heaps idiom) followed by a
  per-source moment aggregate. Tokenizer is .split() ≡ SQL '\\S+'
  (CLAUDE rule). Degeneracy probed at sf0.001: the ~31-word synthetic
  vocabulary still yields source-distinct K (328.88..335.03).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test
# ---------------------------------------------------------------------------


def q_runs_test_daily_revenue(sf_dir: str):
    """Runs test of daily-revenue randomness about the median
    (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    y = (np.sign(c / 100.0)
         * np.floor(np.abs(c / 100.0) + 0.5)).astype(np.int64)
    n = len(y)
    med = int(np.sort(y)[int(math.ceil(0.5 * n)) - 1])   # quantile_disc
    up = (y[y != med] > med)
    m = int(up.size)
    n1 = int(up.sum())
    n2 = m - n1
    runs = 1 + int((up[1:] != up[:-1]).sum())
    p2 = 2 * n1 * n2                                     # exact ints
    mu = float(p2) / float(m) + 1.0
    var = float(p2 * (p2 - m)) / float(m * m * (m - 1))
    z = (float(runs) - mu) / math.sqrt(var)
    r6 = _round6(np.array([mu, z]))
    out = pd.DataFrame({"n_kept": [m], "n_above": [n1], "n_below": [n2],
                        "runs": [runs], "mu6": [r6[0]], "z6": [r6[1]]})
    for col in ("n_kept", "n_above", "n_below", "runs"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RUNS = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d AS (SELECT day, CAST(round(c / 100.0) AS BIGINT) AS y FROM dc),
m AS (SELECT quantile_disc(y, 0.5) AS med FROM d),
s AS (SELECT day, y > med AS up FROM d, m WHERE y != med),
w AS (SELECT up, lag(up) OVER (ORDER BY day) AS prev FROM s),
agg AS (
  SELECT count(*)::BIGINT AS m,
         sum(CASE WHEN up THEN 1 ELSE 0 END)::BIGINT AS n1,
         (1 + sum(CASE WHEN prev IS NOT NULL AND up != prev
                       THEN 1 ELSE 0 END))::BIGINT AS r
  FROM w),
f AS (
  SELECT m, n1, (m - n1) AS n2, r, 2 * n1 * (m - n1) AS p2 FROM agg)
SELECT m AS n_kept, n1 AS n_above, n2 AS n_below, r AS runs,
       round(CAST(p2 AS DOUBLE) / CAST(m AS DOUBLE) + 1.0, 6) AS mu6,
       round((CAST(r AS DOUBLE)
              - (CAST(p2 AS DOUBLE) / CAST(m AS DOUBLE) + 1.0))
             / sqrt(CAST(p2 * (p2 - m) AS DOUBLE)
                    / CAST(m * m * (m - 1) AS DOUBLE)), 6) AS z6
FROM f
"""


# ---------------------------------------------------------------------------
# Ljung-Box
# ---------------------------------------------------------------------------

_LB_LAGS = 7


def q_ljung_box_daily_revenue(sf_dir: str):
    """Ljung-Box Q(7) on daily kilodollar revenue, exact integer
    autocovariance numerators (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    yv = np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)
    y = [int(v) for v in yv]                  # kilodollars, exact
    n = len(y)
    s = sum(y)
    d = [n * v - s for v in y]                # exact, sum(d) == 0
    g0 = sum(v * v for v in d)
    gs = [sum(d[t] * d[t - k] for t in range(k, n))
          for k in range(1, _LB_LAGS + 1)]
    r = [float(g) / float(g0) for g in gs]
    acc = 0.0
    for k in range(_LB_LAGS):                 # left-associated, as in SQL
        acc = acc + (r[k] * r[k]) / float(n - (k + 1))
    q = float(n) * (float(n) + 2.0) * acc
    r6 = _round6(np.array([r[0], r[1], r[2], q]))
    out = pd.DataFrame({"n_days": [n], "lags": [_LB_LAGS],
                        "r1_6": [r6[0]], "r2_6": [r6[1]], "r3_6": [r6[2]],
                        "q6": [r6[3]]})
    for col in ("n_days", "lags"):
        out[col] = out[col].astype(np.int64)
    return out


_LB_LAG_COLS = ",\n         ".join(
    f"lag(d, {k}) OVER (ORDER BY i) AS d{k}"
    for k in range(1, _LB_LAGS + 1))
_LB_G_COLS = ",\n         ".join(
    f"sum(d * d{k}) AS g{k}" for k in range(1, _LB_LAGS + 1))
_LB_Q_TERMS = "\n             + ".join(
    f"(CAST(g{k} AS DOUBLE) / CAST(g0 AS DOUBLE))"
    f" * (CAST(g{k} AS DOUBLE) / CAST(g0 AS DOUBLE))"
    f" / (CAST(n AS DOUBLE) - {float(k)})"
    for k in range(1, _LB_LAGS + 1))

SQL_LB = f"""
WITH dc AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d0 AS (
  SELECT CAST(round(c / 100000.0) AS BIGINT) AS y,
         row_number() OVER (ORDER BY day) AS i
  FROM dc),
st AS (SELECT count(*)::HUGEINT AS n, sum(y)::HUGEINT AS s FROM d0),
dd AS (SELECT i, (st.n * y - st.s) AS d FROM d0, st),
lg AS (
  SELECT d,
         {_LB_LAG_COLS}
  FROM dd),
g AS (
  SELECT sum(d * d) AS g0,
         {_LB_G_COLS}
  FROM lg),
f AS (SELECT st.n, g.* FROM st, g)
SELECT n::BIGINT AS n_days, {_LB_LAGS} AS lags,
       round(CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE), 6) AS r1_6,
       round(CAST(g2 AS DOUBLE) / CAST(g0 AS DOUBLE), 6) AS r2_6,
       round(CAST(g3 AS DOUBLE) / CAST(g0 AS DOUBLE), 6) AS r3_6,
       round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
             * ({_LB_Q_TERMS}), 6) AS q6
FROM f
"""


# ---------------------------------------------------------------------------
# Yule's K per source
# ---------------------------------------------------------------------------


def q_yule_k_by_source(sf_dir: str):
    """Yule's K lexical richness per source, exact integer moments
    (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        src: list[str] = []
        wrd: list[str] = []
        for sname, s in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for w in s.split():
                src.append(sname)
                wrd.append(w)
        if not src:
            return pa.table({"source": pa.array([], pa.string()),
                             "w": pa.array([], pa.string()),
                             "f": pa.array([], pa.int64())})
        df = pd.DataFrame({"source": src, "w": wrd})
        g = (df.groupby(["source", "w"], sort=False).size()
               .rename("f").reset_index())
        g["f"] = g["f"].astype(np.int64)
        return _strip(g)

    tf = (ds.map_batches(tf_partial, batch_format="pyarrow")
            .groupby(["source", "w"]).aggregate(Sum("f", alias_name="f")))

    def moments(t: pa.Table) -> pa.Table:
        f = t["f"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"source": t["source"].to_pylist(),
                           "n": f, "s2": f * f, "v": np.int64(1)})
        g = df.groupby("source", sort=False).sum().reset_index()
        for col in ("n", "s2", "v"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    agg = (tf.map_batches(moments, batch_format="pyarrow")
             .groupby("source")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("s2", alias_name="s2"),
                        Sum("v", alias_name="v_types"))
             .to_pandas()).sort_values("source").reset_index(drop=True)
    n = agg["n"].to_numpy(np.int64)
    s2 = agg["s2"].to_numpy(np.int64)
    k6 = _round6(np.array(
        [10000.0 * float(int(b) - int(a)) / (float(int(a)) * float(int(a)))
         for a, b in zip(n, s2)]))
    out = pd.DataFrame({"source": agg["source"],
                        "v_types": agg["v_types"].astype(np.int64),
                        "n_tokens": n, "s2": s2, "k6": k6})
    return out


SQL_YULE = """
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents),
tf AS (
  SELECT source, w, count(*)::BIGINT AS f FROM toks GROUP BY 1, 2),
m AS (
  SELECT source, count(*)::BIGINT AS v_types, sum(f)::BIGINT AS n,
         sum(f * f)::BIGINT AS s2
  FROM tf GROUP BY source)
SELECT source, v_types, n AS n_tokens, s2,
       round(10000.0 * CAST(s2 - n AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS k6
FROM m ORDER BY source
"""


QUERIES48: dict[str, tuple] = {
    "runs_test_daily_revenue": (q_runs_test_daily_revenue, SQL_RUNS),
    "ljung_box_daily_revenue": (q_ljung_box_daily_revenue, SQL_LB),
    "yule_k_by_source": (q_yule_k_by_source, SQL_YULE),
}
