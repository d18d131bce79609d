"""Ninety-second oracle-query batch — coding theory / MCMC diagnostics
/ corpus coverage:

- shannon_code_length: total Shannon-code cost of the corpus unigram
  stream — per word k_w = ceil(-log2(c_w/n)) computed EXACTLY as the
  smallest k with c_w * 2^k >= n (an integer power search joined
  against a 0..40 powers table in SQL — no log2 float anywhere);
  total bits = SUM c_w * k_w exact, reported next to the quantized
  entropy bound SUM c*round(ln(n/c)*1e12)/(n ln2 1e12).
- batch_means_ess: the batch-means effective-sample-size estimate of
  the daily revenue series: B = 16 equal blocks of length L = n//B
  (tail truncated identically both sides); with block sums S_b and
  their total S', the lag-free variance ratio clears denominators —
  ESS = n_used * (L * SUM(B*S_b - S')^2) / ((B-1) * B *
  SUM(B*x_i - S')^2 / ... ) assembled as identical float of three
  exact integers (centered squares ride Python int / HUGEINT).
- vocab_coverage_k: the number of distinct words (by frequency rank,
  ties broken by word) needed to cover 50/90/99% of all tokens —
  exact integer rank walks (cum * 100 >= n * pct).
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

_BM_B = 16


def _word_freqs(sf_dir: str) -> pd.DataFrame:
    ds = _pq(sf_dir, "documents", columns=["text"])

    def wpart(t: pa.Table) -> pa.Table:
        words: list[str] = []
        for txt in t["text"].to_pylist():
            words.extend(txt.split())
        if not words:
            return pa.table({"w": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        df = pd.DataFrame({"w": words, "c": np.int64(1)})
        g = df.groupby("w", sort=False).sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(wpart, batch_format="pyarrow")
              .groupby("w").aggregate(Sum("c", alias_name="c"))
              .to_pandas())


# ---------------------------------------------------------------------------
# Shannon code length
# ---------------------------------------------------------------------------


def q_shannon_code_length(sf_dir: str):
    """Exact Shannon code cost + quantized entropy bound (docstring
    above)."""
    tf = _word_freqs(sf_dir)
    c = [int(v) for v in tf["c"]]
    n = sum(c)
    bits = 0
    for cv in c:
        k = 0
        while cv << k < n:
            k += 1
        bits += cv * k
    hq = 0
    for cv in c:
        lx = math.log(float(n) / float(cv)) * 1e12
        hq += cv * int(math.floor(lx + 0.5))
    h_bits = float(hq) / (float(n) * math.log(2.0) * 1e12)
    out = pd.DataFrame({"n_tokens": [n], "vocab": [len(c)],
                        "total_bits": [bits],
                        "avg_bits6": [_round6(np.array(
                            [float(bits) / float(n)]))[0]],
                        "entropy_bits6": [_round6(np.array(
                            [h_bits]))[0]]})
    for col in ("n_tokens", "vocab", "total_bits"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SHANNON_CODE = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents),
tf AS (SELECT w, count(*)::BIGINT AS c FROM toks GROUP BY 1),
t AS (SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS v FROM tf),
pw AS (SELECT unnest(range(0, 41))::BIGINT AS k),
kk AS (
  SELECT tf.w, tf.c, min(pw.k)::BIGINT AS k
  FROM tf CROSS JOIN t JOIN pw ON tf.c * (1::BIGINT << pw.k) >= t.n
  GROUP BY 1, 2),
s AS (
  SELECT sum(c * k)::BIGINT AS bits,
         sum(c * CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
                            * 1000000000000) AS BIGINT))::BIGINT AS hq
  FROM kk CROSS JOIN t)
SELECT n AS n_tokens, v AS vocab, bits AS total_bits,
       round(CAST(bits AS DOUBLE) / CAST(n AS DOUBLE), 6) AS avg_bits6,
       round(CAST(hq AS DOUBLE)
             / (CAST(n AS DOUBLE) * ln(2.0) * 1000000000000.0), 6)
         AS entropy_bits6
FROM s CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Batch-means ESS
# ---------------------------------------------------------------------------


def q_batch_means_ess(sf_dir: str):
    """Batch-means effective sample size of daily revenue (docstring
    above)."""
    c = [int(v) for v in _daily_cents(sf_dir)["c"].to_numpy(np.int64)]
    n = len(c)
    ell = n // _BM_B
    used = c[:ell * _BM_B]
    nu = len(used)
    sb = [sum(used[b * ell:(b + 1) * ell]) for b in range(_BM_B)]
    sp = sum(sb)
    # overall variance (of the used prefix) and batch-mean variance,
    # both with denominators cleared
    a_all = sum((nu * v - sp) ** 2 for v in used)
    a_bm = sum((_BM_B * v - sp) ** 2 for v in sb)
    # sigma2_hat = a_all/(nu^2(nu-1)); var(mean)_bm = a_bm/(B^3 L^2
    # (B-1)); ESS = sigma2_hat/var_mean collapses (nu = B*L) to
    # a_all*B*(B-1) / ((nu-1)*a_bm)
    ess = (float(a_all) * float(_BM_B * (_BM_B - 1))) \
        / (float(nu - 1) * float(a_bm))
    out = pd.DataFrame({"n_used": [nu], "n_blocks": [_BM_B],
                        "block_len": [ell], "sp": [sp],
                        "a_bm": [str(a_bm)],
                        "ess6": [_round6(np.array([ess]))[0]]})
    for col in ("n_used", "n_blocks", "block_len", "sp"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_BATCH_MEANS = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
seq AS (SELECT c, row_number() OVER (ORDER BY day) - 1 AS t FROM daily),
nd AS (SELECT count(*)::BIGINT AS n FROM daily),
lim AS (SELECT (n // {_BM_B}) AS ell, (n // {_BM_B}) * {_BM_B} AS nu
        FROM nd),
used AS (SELECT c, t // ell AS b, nu FROM seq CROSS JOIN lim
         WHERE t < nu),
bs AS (SELECT b, sum(c)::BIGINT AS sb FROM used GROUP BY 1),
tot AS (SELECT sum(sb)::BIGINT AS sp FROM bs),
aa AS (
  SELECT sum((nu::HUGEINT * c - sp) * (nu::HUGEINT * c - sp)) AS a_all
  FROM used CROSS JOIN tot),
ab AS (
  SELECT sum(({_BM_B}::HUGEINT * sb - sp)
             * ({_BM_B}::HUGEINT * sb - sp)) AS a_bm
  FROM bs CROSS JOIN tot)
SELECT nu AS n_used, {_BM_B}::BIGINT AS n_blocks, ell AS block_len,
       sp, CAST(a_bm AS VARCHAR) AS a_bm,
       round(CAST(a_all AS DOUBLE) * {_BM_B * (_BM_B - 1)}.0
             / (CAST(nu - 1 AS DOUBLE) * CAST(a_bm AS DOUBLE)), 6)
         AS ess6
FROM lim, tot, aa, ab
"""


# ---------------------------------------------------------------------------
# Vocabulary coverage
# ---------------------------------------------------------------------------


def q_vocab_coverage_k(sf_dir: str):
    """Distinct-word ranks covering 50/90/99% of tokens (docstring
    above)."""
    tf = _word_freqs(sf_dir).sort_values(["c", "w"],
                                         ascending=[False, True])
    c = tf["c"].to_numpy(np.int64)
    n = int(c.sum())
    cum = np.cumsum(c)
    ks = {}
    for pct in (50, 90, 99):
        ks[pct] = int(np.searchsorted(cum * 100, n * pct) + 1)
    out = pd.DataFrame({"n_tokens": [n], "vocab": [len(c)],
                        "k50": [ks[50]], "k90": [ks[90]],
                        "k99": [ks[99]]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_VOCAB_COVERAGE = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents),
tf AS (SELECT w, count(*)::BIGINT AS c FROM toks GROUP BY 1),
t AS (SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS v FROM tf),
r AS (
  SELECT row_number() OVER (ORDER BY c DESC, w) AS rk,
         sum(c) OVER (ORDER BY c DESC, w)::BIGINT AS cum
  FROM tf)
SELECT n AS n_tokens, v AS vocab,
       (SELECT min(rk)::BIGINT FROM r, t WHERE cum * 100 >= n * 50)
         AS k50,
       (SELECT min(rk)::BIGINT FROM r, t WHERE cum * 100 >= n * 90)
         AS k90,
       (SELECT min(rk)::BIGINT FROM r, t WHERE cum * 100 >= n * 99)
         AS k99
FROM t
"""


QUERIES92: dict[str, tuple] = {
    "shannon_code_length": (q_shannon_code_length, SQL_SHANNON_CODE),
    "batch_means_ess": (q_batch_means_ess, SQL_BATCH_MEANS),
    "vocab_coverage_k": (q_vocab_coverage_k, SQL_VOCAB_COVERAGE),
}
