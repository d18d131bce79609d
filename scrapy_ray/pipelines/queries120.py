"""One-hundred-twentieth oracle-query batch — calibration and
concentration diagnostics:

- hosmer_lemeshow_purchase: Hosmer-Lemeshow goodness-of-calibration of
  a held-out purchase-probability model. Train half (even event_ids)
  fits the purchase rate per value bin (value//50), ONCE-quantized to
  1e-6 units; test half (odd ids, bins seen in train only) is split
  into 10 ntile groups ordered by (pq, event_id); the HL statistic
  sums (O*1e6 - Eq)^2 / (1e6 * Eq * (1 - Eq/(1e6*ng))) over groups
  with 0 < Eq < 1e6*ng (poles excluded, count reported), each group
  term 1e-6-quantized before the exact sum.
- tail_bound_audit_orders: observed P(price >= k*mean) vs the Markov
  (1/k) and Chebyshev (sigma^2/((k-1)^2 mu^2)) bounds at k in
  {2,4,8}. Moments are exact integer cent sums (HUGEINT for the
  square sum); the mean threshold test uses the exact integer
  inequality 100*n*cents >= k*100*S (no float mean).
- good_turing_smoothing_bigrams: corpus-level Good-Turing table on
  the bigram distribution — rows r=1..4 (where N_r > 0) carry the
  smoothed count r* = (r+1) N_{r+1}/N_r, and the r=0 row carries the
  unseen mass P0 = N_1/N (n_r column = total token count there).
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
# Hosmer-Lemeshow
# ---------------------------------------------------------------------------


def q_hosmer_lemeshow_purchase(sf_dir: str):
    """HL calibration statistic (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_id", "value",
                                        "event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = t["value"].to_numpy(zero_copy_only=False)
        vb = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64) \
            // 50
        y = (np.asarray(t["event_type"].to_pylist())
             == "purchase").astype(np.int64)
        fold = (eid % 2).astype(np.int64)
        df = pd.DataFrame({"fold": fold, "vb": vb, "eid": eid,
                           "x": y, "n": np.int64(1)})
        # train cells aggregate; test rows pass through untouched
        tr = df[df["fold"] == 0].groupby("vb", sort=False) \
            .agg(x=("x", "sum"), n=("n", "sum")).reset_index()
        tr = tr.assign(fold=np.int64(0), eid=np.int64(0))
        te = df[df["fold"] == 1][["fold", "vb", "eid", "x", "n"]]
        out = pd.concat([tr[["fold", "vb", "eid", "x", "n"]], te],
                        ignore_index=True)
        for col in out.columns:
            out[col] = out[col].astype(np.int64)
        return _strip(out)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["fold", "vb", "eid"])
               .aggregate(Sum("x", alias_name="x"),
                          Sum("n", alias_name="n"))
               .to_pandas())
    tr = cells[cells["fold"] == 0]
    pq_map = {int(r["vb"]): int(np.floor(float(int(r["x"]))
                                         / float(int(r["n"]))
                                         * 1e6 + 0.5))
              for _, r in tr.iterrows()}
    te = cells[cells["fold"] == 1].copy()
    te = te[te["vb"].isin(pq_map)].copy()
    te["pq"] = te["vb"].map(pq_map).astype(np.int64)
    te = te.sort_values(["pq", "eid"], kind="mergesort") \
        .reset_index(drop=True)
    n = len(te)
    # ntile(10): first (n % 10) groups get n//10 + 1 rows
    base, extra = divmod(n, 10)
    sizes = [base + 1] * extra + [base] * (10 - extra)
    hlq = 0
    used = 0
    pos = 0
    for sz in sizes:
        grp = te.iloc[pos:pos + sz]
        pos += sz
        ng = len(grp)
        if ng == 0:
            continue
        o = int(grp["x"].sum())
        eq = int(grp["pq"].sum())
        if eq <= 0 or eq >= 1_000_000 * ng:
            continue
        used += 1
        num = float(o * 1_000_000 - eq)
        term = (num * num
                / (1_000_000.0 * float(eq)
                   * (1.0 - float(eq) / (1_000_000.0 * float(ng)))))
        hlq += int(np.floor(term * 1e6 + 0.5))
    hl = float(hlq) / 1e6
    out = pd.DataFrame({"n_test": [n], "groups_used": [used],
                        "hlq": [hlq],
                        "hl6": [_round6(np.array([hl]))[0]]})
    for col in ("n_test", "groups_used", "hlq"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HOSMER_LEMESHOW = """
WITH e AS (
  SELECT event_id, CAST(round(value) AS BIGINT) // 50 AS vb,
         (event_type = 'purchase')::INT AS y
  FROM events),
tr AS (
  SELECT vb, CAST(round(CAST(sum(y) AS DOUBLE) / count(*)
                        * 1000000.0) AS BIGINT) AS pq
  FROM e WHERE event_id % 2 = 0 GROUP BY 1),
te AS (
  SELECT e.event_id, e.y, tr.pq,
         ntile(10) OVER (ORDER BY tr.pq, e.event_id) AS g
  FROM e JOIN tr USING (vb) WHERE e.event_id % 2 = 1),
ga AS (
  SELECT g, count(*)::BIGINT AS ng, sum(y)::BIGINT AS o,
         sum(pq)::BIGINT AS eq
  FROM te GROUP BY 1),
t AS (
  SELECT g, ng, o, eq,
         CASE WHEN eq > 0 AND eq < 1000000 * ng THEN
           CAST(round(
             CAST(o * 1000000 - eq AS DOUBLE)
             * CAST(o * 1000000 - eq AS DOUBLE)
             / (1000000.0 * CAST(eq AS DOUBLE)
                * (1.0 - CAST(eq AS DOUBLE)
                   / (1000000.0 * CAST(ng AS DOUBLE))))
             * 1000000.0) AS BIGINT)
         ELSE NULL END AS tq
  FROM ga)
SELECT (SELECT count(*)::BIGINT FROM te) AS n_test,
       count(tq)::BIGINT AS groups_used,
       sum(tq)::BIGINT AS hlq,
       round(CAST(sum(tq) AS DOUBLE) / 1000000.0, 6) AS hl6
FROM t
"""


# ---------------------------------------------------------------------------
# Markov / Chebyshev tail audit
# ---------------------------------------------------------------------------


def q_tail_bound_audit_orders(sf_dir: str):
    """Observed tails vs Markov/Chebyshev bounds (docstring above)."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def mpart(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        return _strip(pd.DataFrame({"cents": c, "n": np.int64(1)})
                      .groupby("cents", sort=False).sum().reset_index()
                      .astype(np.int64))

    h = (ds.map_batches(mpart, batch_format="pyarrow")
           .groupby("cents").aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    cv = [int(x) for x in h["cents"]]
    cn = [int(x) for x in h["n"]]
    n = sum(cn)
    s = sum(c * m for c, m in zip(cv, cn))
    s2 = sum(c * c * m for c, m in zip(cv, cn))     # python int, exact
    mu = float(s) / float(n)
    var = (float(s2) - float(s) * float(s) / float(n)) / float(n)
    rows = []
    for k in (2, 4, 8):
        # exact integer threshold test: cents >= k*mean <=>
        # n*cents >= k*S
        ex = sum(m for c, m in zip(cv, cn) if n * c >= k * s)
        obs = float(ex) / float(n)
        markov = 1.0 / float(k)
        cheb = var / (float((k - 1) * (k - 1)) * mu * mu)
        rows.append((k, ex, _round6(np.array([obs]))[0],
                     _round6(np.array([markov]))[0],
                     _round6(np.array([cheb]))[0]))
    out = pd.DataFrame(rows, columns=["k", "n_exceed", "obs6",
                                      "markov6", "cheb6"])
    for col in ("k", "n_exceed"):
        out[col] = out[col].astype(np.int64)
    return out


def _tail_sql() -> str:
    branches = []
    for k in (2, 4, 8):
        branches.append(f"""
  SELECT {k}::BIGINT AS k,
         (SELECT sum((n * cents >= {k} * s)::INT)::BIGINT
          FROM h CROSS JOIN mo) AS n_exceed""")
    return f"""
WITH h AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
mo AS (
  SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
         sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS s2
  FROM h),
f AS (
  SELECT n, s,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         (CAST(s2 AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
            / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS var
  FROM mo),
u AS ({" UNION ALL ".join(branches)})
SELECT u.k, u.n_exceed,
       round(CAST(u.n_exceed AS DOUBLE) / CAST(f.n AS DOUBLE), 6)
         AS obs6,
       round(1.0 / CAST(u.k AS DOUBLE), 6) AS markov6,
       round(f.var / (CAST((u.k - 1) * (u.k - 1) AS DOUBLE)
                      * f.mu * f.mu), 6) AS cheb6
FROM u CROSS JOIN f ORDER BY u.k
"""


SQL_TAIL_BOUNDS = _tail_sql()


# ---------------------------------------------------------------------------
# Good-Turing smoothing table
# ---------------------------------------------------------------------------


def q_good_turing_smoothing_bigrams(sf_dir: str):
    """Corpus bigram Good-Turing r* table + P0 (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["text"])

    def wpart(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            ts = txt.split()
            c.update(x + " " + y for x, y in zip(ts[:-1], ts[1:]))
        df = pd.DataFrame({"w": list(c.keys()),
                           "n": np.array(list(c.values()), np.int64)})
        return _strip(df)

    cnts = (ds.map_batches(wpart, batch_format="pyarrow")
              .groupby("w").aggregate(Sum("n", alias_name="n")))

    def fpart(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = int(n.sum())
        cols = {"g": pa.array([0], pa.int64()),
                "tot": pa.array([tot], pa.int64())}
        for r in range(1, 6):
            cols[f"f{r}"] = pa.array([int((n == r).sum())], pa.int64())
        return pa.table(cols)

    agg = (cnts.map_batches(fpart, batch_format="pyarrow")
               .groupby("g")
               .aggregate(Sum("tot", alias_name="tot"),
                          *[Sum(f"f{r}", alias_name=f"f{r}")
                            for r in range(1, 6)])
               .to_pandas())
    tot = int(agg["tot"].iloc[0])
    f = {r: int(agg[f"f{r}"].iloc[0]) for r in range(1, 6)}
    rows = [(0, tot, _round6(np.array(
        [float(f[1]) / float(tot)]))[0])]
    for r in range(1, 5):
        if f[r] > 0:
            rstar = float((r + 1) * f[r + 1]) / float(f[r])
            rows.append((r, f[r], _round6(np.array([rstar]))[0]))
    out = pd.DataFrame(rows, columns=["r", "n_r", "stat6"])
    for col in ("r", "n_r"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GOOD_TURING = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts
  FROM documents),
bg AS (
  SELECT ts[i] || ' ' || ts[i + 1] AS w
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts))) AS i) r(i)
  WHERE len(ts) >= 2),
cn AS (SELECT w, count(*)::BIGINT AS n FROM bg GROUP BY 1),
ff AS (
  SELECT sum(n)::BIGINT AS tot,
         sum((n = 1)::INT)::BIGINT AS f1,
         sum((n = 2)::INT)::BIGINT AS f2,
         sum((n = 3)::INT)::BIGINT AS f3,
         sum((n = 4)::INT)::BIGINT AS f4,
         sum((n = 5)::INT)::BIGINT AS f5
  FROM cn),
u AS (
  SELECT 0::BIGINT AS r, tot AS n_r,
         round(CAST(f1 AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS stat6
  FROM ff
  UNION ALL
  SELECT 1, f1, round(CAST(2 * f2 AS DOUBLE) / CAST(f1 AS DOUBLE), 6)
  FROM ff WHERE f1 > 0
  UNION ALL
  SELECT 2, f2, round(CAST(3 * f3 AS DOUBLE) / CAST(f2 AS DOUBLE), 6)
  FROM ff WHERE f2 > 0
  UNION ALL
  SELECT 3, f3, round(CAST(4 * f4 AS DOUBLE) / CAST(f3 AS DOUBLE), 6)
  FROM ff WHERE f3 > 0
  UNION ALL
  SELECT 4, f4, round(CAST(5 * f5 AS DOUBLE) / CAST(f4 AS DOUBLE), 6)
  FROM ff WHERE f4 > 0)
SELECT r, n_r, stat6 FROM u ORDER BY r
"""


QUERIES120: dict[str, tuple] = {
    "hosmer_lemeshow_purchase": (q_hosmer_lemeshow_purchase,
                                 SQL_HOSMER_LEMESHOW),
    "tail_bound_audit_orders": (q_tail_bound_audit_orders,
                                SQL_TAIL_BOUNDS),
    "good_turing_smoothing_bigrams": (q_good_turing_smoothing_bigrams,
                                      SQL_GOOD_TURING),
}
