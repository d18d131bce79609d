"""One-hundred-fifty-seventh oracle-query batch — a classic DP and
two deterministic privacy mechanisms (the hash-noise device):

- optimal_bst_words: Knuth's optimal binary search tree over the
  top-8 corpus words (alphabetical key order, integer frequency
  weights). The O(n³) interval DP runs over a FLATTENED 9×9 cost
  LIST in a recursive CTE — one level per interval length, nested
  list comprehensions for the root argmin — every cost an exact
  integer.
- krr_private_histogram: a k-randomized-response (k = 5) privatized
  event-type histogram with DETERMINISTIC hash noise (the bootstrap
  hash family on event_id): keep the true type when h1 < 2³¹, else
  report category h2 mod 5; the unbiased reconstruction
  ĉ = (obs − 0.1·n)/0.5 is an identical float expression of exact
  integer observed counts, reported next to the true counts.
- exp_mechanism_median: the exponential mechanism for a private
  median of order cents — utility −|cum_rank − n/2| per distinct
  value, Gumbel noise −ln(−ln(U)) from the value hash, ε = 0.01;
  the argmax of ε·u/2 + g is deterministic and both sides report
  the chosen value and its true rank distance.
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

_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503


# ---------------------------------------------------------------------------
# Optimal BST
# ---------------------------------------------------------------------------


def q_optimal_bst_words(sf_dir: str):
    """Knuth optimal BST over the top-8 corpus words (docstring)."""
    ds = _pq(sf_dir, "documents", columns=["text"])

    def wpart(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for s in t["text"].to_pylist():
            for w in s.split():
                cnt[w] = cnt.get(w, 0) + 1
        g = pd.DataFrame(sorted(cnt.items()), columns=["w", "n"])
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    wc = (ds.map_batches(wpart, batch_format="pyarrow")
            .groupby("w").aggregate(Sum("n", alias_name="n"))
            .to_pandas().sort_values(["n", "w"],
                                     ascending=[False, True]))
    top = wc.head(8)
    keys = sorted(top["w"].tolist())
    freq = {r_["w"]: int(r_["n"]) for _, r_ in top.iterrows()}
    p = [freq[k] for k in keys]
    n = len(p)
    pre = [0]
    for v in p:
        pre.append(pre[-1] + v)
    e = [[0] * (n + 2) for _ in range(n + 2)]
    for ln in range(1, n + 1):
        for i in range(1, n - ln + 2):
            j = i + ln - 1
            w_ = pre[j] - pre[i - 1]
            e[i][j] = min(e[i][r - 1] + e[r + 1][j] + w_
                          for r in range(i, j + 1))
    total = e[1][n]
    nf = sum(p)
    out = pd.DataFrame({
        "n_keys": [n], "total_freq": [nf], "opt_cost": [total],
        "avg_depth6": [_round6(np.array([float(total)
                                         / float(nf)]))[0]]})
    for col in ("n_keys", "total_freq", "opt_cost"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_OPTIMAL_BST = r"""
WITH RECURSIVE words AS (
  SELECT w, count(*)::BIGINT AS n
  FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w
        FROM documents)
  GROUP BY w),
top8 AS (
  SELECT w, n FROM words ORDER BY n DESC, w LIMIT 8),
keys AS (
  SELECT w, n, row_number() OVER (ORDER BY w) AS i FROM top8),
base AS (
  -- pr[m+1] = prefix sum of the first m freqs (pr = [0, c1..cn])
  SELECT count(*)::BIGINT AS nk, sum(n)::BIGINT AS nf,
         list_prepend(0::BIGINT, list(c ORDER BY i)) AS pr
  FROM (SELECT i, n,
               sum(n) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW) AS c
        FROM keys)),
dp AS (
  -- e flattened at z = (i-1)*9 + j + 1, i in 1..9, j in 0..8;
  -- interval length L = j - i + 1 = (z-1)%9 - (z-1)//9
  SELECT 0::BIGINT AS ln,
         [0::BIGINT FOR z IN range(1, 100)] AS e, nk, nf, pr
  FROM base
  UNION ALL
  SELECT ln + 1,
         [CASE WHEN ((z - 1) % 9) - ((z - 1) // 9) = ln + 1
                    AND ((z - 1) // 9) + 1 <= nk
                    AND ((z - 1) % 9) <= nk
               THEN list_aggregate(
                 [e[((z - 1) // 9) * 9 + r]
                  + e[r * 9 + ((z - 1) % 9) + 1]
                  + (pr[((z - 1) % 9) + 1]
                     - pr[((z - 1) // 9) + 1])
                  FOR r IN range((z - 1) // 9 + 1, (z - 1) % 9 + 1)],
                 'min')
               ELSE e[z] END
          FOR z IN range(1, 100)],
         nk, nf, pr
  FROM dp WHERE ln < nk)
SELECT nk AS n_keys, nf AS total_freq,
       e[0 * 9 + CAST(nk AS INT) + 1] AS opt_cost,
       round(CAST(e[0 * 9 + CAST(nk AS INT) + 1] AS DOUBLE)
             / CAST(nf AS DOUBLE), 6) AS avg_depth6
FROM dp WHERE ln = (SELECT max(ln) FROM dp)
"""


# ---------------------------------------------------------------------------
# k-RR private histogram
# ---------------------------------------------------------------------------


def q_krr_private_histogram(sf_dir: str):
    """k-randomized-response histogram + reconstruction (docstring)."""
    import pyarrow.parquet as pq_

    ds = _pq(sf_dir, "events", columns=["event_id", "event_type"])
    # GLOBAL arm order (a batch-local unique() could renumber arms if
    # a batch ever missed a type)
    arms_g = sorted(set(
        pq_.read_table(f"{sf_dir}/events.parquet",
                       columns=["event_type"])["event_type"]
        .to_pylist()))

    def rr(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        et = np.asarray(t["event_type"].to_pylist())
        arms = np.array(arms_g)
        h1 = ((eid % np.uint64(_H_MOD)) * np.uint64(_H_MULT)
              + np.uint64(_H_STEP)) % np.uint64(_H_MOD)
        h2 = ((eid % np.uint64(_H_MOD)) * np.uint64(_H_MULT)
              + np.uint64(2 * _H_STEP)) % np.uint64(_H_MOD)
        keep = h1 < np.uint64(_H_MOD // 2)
        # map true types through arm index for the replacement draw
        rep = arms[(h2 % np.uint64(len(arms))).astype(np.int64)]
        reported = np.where(keep, et, rep)
        g = pd.DataFrame({"true_t": et, "rep_t": reported,
                          "n": np.int64(1)}) \
            .groupby(["true_t", "rep_t"], sort=False).sum() \
            .reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cel = (ds.map_batches(rr, batch_format="pyarrow")
             .groupby(["true_t", "rep_t"])
             .aggregate(Sum("n", alias_name="n")).to_pandas())
    true_c = cel.groupby("true_t")["n"].sum().sort_index()
    obs_c = cel.groupby("rep_t")["n"].sum().sort_index()
    n = int(cel["n"].sum())
    arms = sorted(set(true_c.index) | set(obs_c.index))
    rows = []
    for a in arms:
        tc = int(true_c.get(a, 0))
        oc = int(obs_c.get(a, 0))
        est = (float(oc) - 0.1 * float(n)) / 0.5
        rows.append((a, tc, oc, _round6(np.array([est]))[0]))
    out = pd.DataFrame(rows, columns=["event_type", "true_n",
                                      "obs_n", "est6"])
    for col in ("true_n", "obs_n"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KRR_HISTOGRAM = f"""
WITH arms AS (
  SELECT g, row_number() OVER (ORDER BY g) - 1 AS ai
  FROM (SELECT DISTINCT event_type AS g FROM events)),
k AS (SELECT count(*)::UBIGINT AS k FROM arms),
r AS (
  SELECT event_type AS true_t,
         CASE WHEN ((event_id::UBIGINT % {_H_MOD})
                    * {_H_MULT}::UBIGINT + {_H_STEP})
                   % {_H_MOD} < {_H_MOD // 2}
              THEN event_type
              ELSE (SELECT g FROM arms WHERE ai =
                    CAST(((event_id::UBIGINT % {_H_MOD})
                          * {_H_MULT}::UBIGINT + {2 * _H_STEP})
                         % {_H_MOD} % (SELECT k FROM k) AS BIGINT))
         END AS rep_t
  FROM events),
tc AS (SELECT true_t AS g, count(*)::BIGINT AS n FROM r GROUP BY 1),
oc AS (SELECT rep_t AS g, count(*)::BIGINT AS n FROM r GROUP BY 1),
nt AS (SELECT count(*)::BIGINT AS n FROM r)
SELECT a.g AS event_type, coalesce(tc.n, 0)::BIGINT AS true_n,
       coalesce(oc.n, 0)::BIGINT AS obs_n,
       round((CAST(coalesce(oc.n, 0) AS DOUBLE)
              - 0.1 * CAST(nt.n AS DOUBLE)) / 0.5, 6) AS est6
FROM arms a
LEFT JOIN tc ON tc.g = a.g
LEFT JOIN oc ON oc.g = a.g
CROSS JOIN nt
ORDER BY a.g
"""


# ---------------------------------------------------------------------------
# Exponential-mechanism median
# ---------------------------------------------------------------------------


def q_exp_mechanism_median(sf_dir: str):
    """DP median of order cents via the exponential mechanism."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def hist(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        c = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"v": c, "n": np.int64(1)}) \
            .groupby("v", sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(hist, batch_format="pyarrow")
           .groupby("v").aggregate(Sum("n", alias_name="n"))
           .to_pandas().sort_values("v").reset_index(drop=True))
    v = h["v"].to_numpy(np.int64)
    cn = np.cumsum(h["n"].to_numpy(np.int64))
    n = int(cn[-1])
    hh = ((v.astype(np.uint64) % np.uint64(_H_MOD))
          * np.uint64(_H_MULT) + np.uint64(_H_STEP)) \
        % np.uint64(_H_MOD)
    u = (hh.astype(np.float64) + 0.5) / float(_H_MOD)
    g = -np.log(-np.log(u))
    util = -np.abs(cn.astype(np.float64) - float(n) / 2.0)
    score = 0.01 * util / 2.0 + g
    k = int(np.lexsort((v, -score))[0])
    true_med = int(v[np.searchsorted(cn, (n + 1) // 2)])
    chosen = int(v[k])
    rank_dist = int(abs(int(cn[k]) - n // 2))
    out = pd.DataFrame({
        "chosen_cents": [chosen], "true_median_cents": [true_med],
        "rank_dist": [rank_dist],
        "score6": [_round6(np.array([float(score[k])]))[0]]})
    for col in ("chosen_cents", "true_median_cents", "rank_dist"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_EXP_MEDIAN = f"""
WITH h AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         count(*)::BIGINT AS n
  FROM orders GROUP BY 1),
c AS (
  SELECT v, n,
         sum(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum,
         sum(n) OVER () AS nt
  FROM h),
s AS (
  SELECT v, cum, nt,
         0.01 * (-abs(CAST(cum AS DOUBLE)
                      - CAST(nt AS DOUBLE) / 2.0)) / 2.0
         + (-ln(-ln((CAST(((v::UBIGINT % {_H_MOD})
                           * {_H_MULT}::UBIGINT + {_H_STEP})
                          % {_H_MOD} AS DOUBLE) + 0.5)
                    / {_H_MOD}))) AS score
  FROM c),
pick AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, v) AS rk FROM s),
med AS (
  SELECT min(v) AS m FROM c WHERE cum >= (nt + 1) // 2)
SELECT p.v::BIGINT AS chosen_cents, med.m::BIGINT
         AS true_median_cents,
       abs(p.cum - p.nt // 2)::BIGINT AS rank_dist,
       round(p.score, 6) AS score6
FROM pick p CROSS JOIN med WHERE p.rk = 1
"""


QUERIES157: dict[str, tuple] = {
    "optimal_bst_words": (q_optimal_bst_words, SQL_OPTIMAL_BST),
    "krr_private_histogram": (q_krr_private_histogram,
                              SQL_KRR_HISTOGRAM),
    "exp_mechanism_median": (q_exp_mechanism_median, SQL_EXP_MEDIAN),
}
