"""Fifty-eighth oracle-query batch — ordinal time-series complexity /
vocabulary richness estimation / unit-root testing:

- permutation_entropy_daily: Bandt-Pompe permutation entropy of order 3
  on the daily revenue series (kilodollar integers).  Each consecutive
  triple maps to one of six ordinal patterns under the time-tiebreak
  rank rule rank_i = #{j: y_j < y_i} + #{j < i: y_j = y_i} — a pure
  integer comparison expression mirrored as CASE sums in SQL — so the
  pattern histogram is exact; the entropy terms (c/m)·ln(m/c) >= 0 are
  quantized per CELL (<= 6 cells) to 1e-6 units and the normalized
  PE = H/ln(6) finalizes identical-expression.
- chao1_bigram_richness: per-source vocabulary richness of the BIGRAM
  vocabulary (the heaps_law tokenizer: any-whitespace split, adjacent
  pairs) — V, N, hapax f1, doubleton f2 are exact integers off one
  (source, bigram) postings shuffle + a count-histogram pass; the
  bias-corrected Chao1 estimator V + f1(f1-1)/(2(f2+1)) and the
  Good-Turing unseen-mass f1/N finalize as single float expressions.
  (Unigram vocab saturates on the synthetic corpus — probed; bigrams
  keep f1/f2 in the hundreds per source at sf0.01.)
- dickey_fuller_daily: Dickey-Fuller unit-root regression
  Δy_t = α + ρ·y_{t-1} + ε on daily revenue in KILODOLLARS (keeps
  Sx² inside HUGEINT at any plausible scale).  The five moments
  (Sx, Sd, Sxx, Sxd, Sdd) ride exact integers; num = m·Sxd − Sx·Sd,
  den = m·Sxx − Sx², A = m·Sdd − Sd² are exact (Python int /
  HUGEINT), and ρ̂, α̂, SSE and the DF t-statistic
  t = ρ̂ / sqrt((SSE/(m−2))·m/den) are identical float expressions of
  those integers on both sides.
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
_PE_SCALE = 10**6


# ---------------------------------------------------------------------------
# permutation entropy
# ---------------------------------------------------------------------------


def q_permutation_entropy_daily(sf_dir: str):
    """Order-3 permutation entropy of daily kilodollar revenue
    (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    y = (np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)) \
        .astype(np.int64)
    a = y[:-2]
    b = y[1:-1]
    c2 = y[2:]
    ra = (b < a).astype(np.int64) + (c2 < a).astype(np.int64)
    rb = ((a < b).astype(np.int64) + (c2 < b).astype(np.int64)
          + (a == b).astype(np.int64))
    rc = ((a < c2).astype(np.int64) + (b < c2).astype(np.int64)
          + (a == c2).astype(np.int64) + (b == c2).astype(np.int64))
    pat = ra * 9 + rb * 3 + rc
    _, cnt = np.unique(pat, return_counts=True)
    m = int(cnt.sum())
    hu = 0
    for cv in cnt:
        cv = int(cv)
        # terms >= 0 (m >= cv): floor(x+0.5) == round half-away
        hu += int(math.floor((float(cv) / float(m))
                             * math.log(float(m) / float(cv))
                             * float(_PE_SCALE) + 0.5))
    pe = float(hu) / float(_PE_SCALE) / math.log(6.0)
    out = pd.DataFrame({"n_triples": [m], "n_patterns": [len(cnt)],
                        "h_units": [hu],
                        "pe6": [_round6(np.array([pe]))[0]]})
    for col in ("n_triples", "n_patterns", "h_units"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PERM_ENTROPY = f"""
WITH dc0 AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d0 AS (
  SELECT CAST(round(c / 100000.0) AS BIGINT) AS y, day FROM dc0),
w AS (
  SELECT y AS a,
         lead(y, 1) OVER (ORDER BY day) AS b,
         lead(y, 2) OVER (ORDER BY day) AS c2
  FROM d0),
p AS (
  SELECT ((b < a)::INT + (c2 < a)::INT) * 9
         + ((a < b)::INT + (c2 < b)::INT + (a = b)::INT) * 3
         + ((a < c2)::INT + (b < c2)::INT + (a = c2)::INT
            + (b = c2)::INT) AS pat
  FROM w WHERE b IS NOT NULL AND c2 IS NOT NULL),
cnts AS (SELECT pat, count(*)::BIGINT AS cnt FROM p GROUP BY 1),
tot AS (
  SELECT sum(cnt)::BIGINT AS m, count(*)::BIGINT AS k FROM cnts),
h AS (
  SELECT sum(CAST(round((CAST(cnt AS DOUBLE) / CAST(m AS DOUBLE))
                        * ln(CAST(m AS DOUBLE) / CAST(cnt AS DOUBLE))
                        * {_PE_SCALE}.0) AS BIGINT))::BIGINT AS hu
  FROM cnts, tot)
SELECT m AS n_triples, k AS n_patterns, hu AS h_units,
       round(CAST(hu AS DOUBLE) / {_PE_SCALE}.0 / ln(6.0), 6) AS pe6
FROM tot, h
"""


# ---------------------------------------------------------------------------
# Chao1 / Good-Turing richness
# ---------------------------------------------------------------------------


def q_chao1_bigram_richness(sf_dir: str):
    """Per-source Chao1 + Good-Turing unseen mass of the bigram
    vocabulary (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def wpart(t: pa.Table) -> pa.Table:
        src_l: list[str] = []
        tok_l: list[str] = []
        for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            ts = txt.split()
            if len(ts) < 2:
                continue
            src_l.extend([s] * (len(ts) - 1))
            tok_l.extend(x + " " + y for x, y in zip(ts[:-1], ts[1:]))
        if not tok_l:
            return pa.table({"source": pa.array([], pa.string()),
                             "w": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({"source": src_l, "w": tok_l, "n": np.int64(1)})
        g = df.groupby(["source", "w"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(wpart, batch_format="pyarrow")
               .groupby(["source", "w"])
               .aggregate(Sum("n", alias_name="n")))

    def spart(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"source": t["source"].to_pylist(),
                           "toks": n, "vocab": np.int64(1),
                           "f1": (n == 1).astype(np.int64),
                           "f2": (n == 2).astype(np.int64)})
        g = df.groupby("source", sort=False).sum().reset_index()
        for col in ("toks", "vocab", "f1", "f2"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    sv = (cells.map_batches(spart, batch_format="pyarrow")
               .groupby("source")
               .aggregate(Sum("toks", alias_name="toks"),
                          Sum("vocab", alias_name="vocab"),
                          Sum("f1", alias_name="f1"),
                          Sum("f2", alias_name="f2"))
               .to_pandas().sort_values("source").reset_index(drop=True))
    v = sv["vocab"].to_numpy(np.int64)
    f1 = sv["f1"].to_numpy(np.int64)
    f2 = sv["f2"].to_numpy(np.int64)
    tk = sv["toks"].to_numpy(np.int64)
    chao1 = np.empty(len(sv))
    gt = np.empty(len(sv))
    for i in range(len(sv)):
        chao1[i] = (float(int(v[i]))
                    + float(int(f1[i])) * float(int(f1[i]) - 1)
                    / (2.0 * float(int(f2[i]) + 1)))
        gt[i] = float(int(f1[i])) / float(int(tk[i]))
    out = pd.DataFrame({"source": sv["source"], "toks": tk, "vocab": v,
                        "f1": f1, "f2": f2,
                        "chao16": _round6(chao1),
                        "gt_unseen6": _round6(gt)})
    for col in ("toks", "vocab", "f1", "f2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CHAO1 = """
WITH toks AS (
  SELECT source, regexp_extract_all(text, '\\S+') AS ts FROM documents),
bg AS (
  SELECT source, ts[i] || ' ' || ts[i + 1] AS w
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts))) AS i) r(i)
  WHERE len(ts) >= 2),
cn AS (
  SELECT source, w, count(*)::BIGINT AS n FROM bg GROUP BY 1, 2),
sv AS (
  SELECT source, sum(n)::BIGINT AS toks, count(*)::BIGINT AS vocab,
         sum((n = 1)::INT)::BIGINT AS f1,
         sum((n = 2)::INT)::BIGINT AS f2
  FROM cn GROUP BY 1)
SELECT source, toks, vocab, f1, f2,
       round(CAST(vocab AS DOUBLE)
             + CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE)
             / (2.0 * CAST(f2 + 1 AS DOUBLE)), 6) AS chao16,
       round(CAST(f1 AS DOUBLE) / CAST(toks AS DOUBLE), 6) AS gt_unseen6
FROM sv ORDER BY source
"""


# ---------------------------------------------------------------------------
# Dickey-Fuller
# ---------------------------------------------------------------------------


def q_dickey_fuller_daily(sf_dir: str):
    """DF unit-root t-statistic on daily kilodollar revenue
    (docstring above)."""
    cells = _daily_cents(sf_dir)
    c = cells["c"].to_numpy(np.int64).astype(np.float64)
    yv = np.sign(c / 1e5) * np.floor(np.abs(c / 1e5) + 0.5)
    y = [int(v) for v in yv]
    x = y[:-1]
    d = [b - a for a, b in zip(y[:-1], y[1:])]
    m = len(x)
    sx = sum(x)
    sd = sum(d)
    sxx = sum(v * v for v in x)
    sxd = sum(a * b for a, b in zip(x, d))
    sdd = sum(v * v for v in d)
    num = m * sxd - sx * sd
    den = m * sxx - sx * sx
    a2 = m * sdd - sd * sd
    rho = float(num) / float(den)
    alpha = (float(sd) - rho * float(sx)) / float(m)
    sse = ((float(a2) - float(num) * float(num) / float(den))
           / float(m))
    tstat = rho / math.sqrt((sse / float(m - 2)) * float(m)
                            / float(den))
    r6 = _round6(np.array([rho, alpha, tstat]))
    out = pd.DataFrame({"m": [m], "rho6": [r6[0]], "alpha6": [r6[1]],
                        "tstat6": [r6[2]]})
    out["m"] = out["m"].astype(np.int64)
    return out


SQL_DICKEY_FULLER = f"""
WITH dc0 AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
d0 AS (
  SELECT CAST(round(c / 100000.0) AS BIGINT) AS y, day FROM dc0),
w AS (
  SELECT y AS x, lead(y) OVER (ORDER BY day) AS ynext FROM d0),
pr AS (
  SELECT x::HUGEINT AS x, (ynext - x)::HUGEINT AS d
  FROM w WHERE ynext IS NOT NULL),
s AS (
  SELECT count(*)::HUGEINT AS m, sum(x) AS sx, sum(d) AS sd,
         sum(x * x) AS sxx, sum(x * d) AS sxd, sum(d * d) AS sdd
  FROM pr),
f AS (
  SELECT m, sx, sd, (m * sxd - sx * sd) AS num,
         (m * sxx - sx * sx) AS den, (m * sdd - sd * sd) AS a2
  FROM s),
g AS (
  SELECT m, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS rho, den,
         (CAST(sd AS DOUBLE) - CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
          * CAST(sx AS DOUBLE)) / CAST(m AS DOUBLE) AS alpha,
         (CAST(a2 AS DOUBLE)
          - CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
            / CAST(den AS DOUBLE)) / CAST(m AS DOUBLE) AS sse
  FROM f)
SELECT m::BIGINT AS m, round(rho, 6) AS rho6, round(alpha, 6) AS alpha6,
       round(rho / sqrt((sse / CAST(m - 2 AS DOUBLE)) * CAST(m AS DOUBLE)
                        / CAST(den AS DOUBLE)), 6) AS tstat6
FROM g
"""


QUERIES58: dict[str, tuple] = {
    "permutation_entropy_daily": (q_permutation_entropy_daily,
                                  SQL_PERM_ENTROPY),
    "chao1_bigram_richness": (q_chao1_bigram_richness, SQL_CHAO1),
    "dickey_fuller_daily": (q_dickey_fuller_daily, SQL_DICKEY_FULLER),
}
