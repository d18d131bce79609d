"""One-hundred-ninety-seventh oracle-query batch — sketch accuracy
and succinct-index mechanics over text:

- minhash_jaccard_audit: MinHash (K = 64) estimation accuracy on the
  100 consecutive-doc-id pairs — shingles are word bigrams, the
  shingle hash is the Java-style polynomial Σord(c)·31^i mod 2³²
  evaluated against a LITERAL power table (mod distributes, so the
  power-sum equals the sequential Horner loop), the K-family is
  affine (h0 + k·step)·mult. Exact integer match counts vs exact
  Jaccard; total |est − J| in 1e-4 units.
- rabin_karp_collisions: distinct 8-char text windows vs distinct
  20-bit polynomial hashes — distinct STRINGS count through
  salted-by-h0 partitions, distinct hash values through per-batch
  2²⁰-bit BITMAPS OR-merged on the driver (128 KB per batch beats
  a million-group shuffle); the birthday expectation
  M(1 − exp(dw·ln(1−1/M))) finalizes identically.
- fm_backward_search: the FM-index count query — BWT of the daily
  up/down string + '$' via full rotation sort, then the 3-step
  backward search for 'udd' maintaining [lo, hi) with prefix-rank
  counts; the in-query `ok` column asserts equality with the direct
  overlapping-occurrence count.
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
from scrapy_ray.pipelines.queries168 import _order_daily_updown, _SQL_S

_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_MH_K = 64
_MH_PAIRS = 100
_RK_W = 8
_RK_M = 1 << 20
_POWS = [pow(31, j, _H_MOD) for j in range(40)]
_FM_PAT = "udd"


def _poly_hash(s: str) -> int:
    total = 0
    ln = len(s)
    for i, ch in enumerate(s):
        total += ord(ch) * _POWS[ln - 1 - i]
    return total % _H_MOD


# ---------------------------------------------------------------------------
# MinHash audit
# ---------------------------------------------------------------------------


def q_minhash_jaccard_audit(sf_dir: str):
    """MinHash K=64 vs exact Jaccard over doc pairs (docstring)."""
    import os
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_

    t = pq_.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    t = t.filter(pc.less(t["doc_id"], 2 * _MH_PAIRS))
    docs = {}
    for did, txt in zip(t["doc_id"].to_pylist(),
                        t["text"].to_pylist()):
        ws = txt.split()
        docs[int(did)] = {ws[i] + " " + ws[i + 1]
                          for i in range(len(ws) - 1)}
    err_q = 0
    match_tot = 0
    for p in range(_MH_PAIRS):
        a, b = docs[2 * p], docs[2 * p + 1]
        inter = len(a & b)
        union = len(a | b)
        jac = float(inter) / float(union)
        ha = [_poly_hash(s) for s in a]
        hb = [_poly_hash(s) for s in b]
        matches = 0
        for k in range(_MH_K):
            ma = min(((h + k * _H_STEP) * _H_MULT) % _H_MOD
                     for h in ha)
            mb = min(((h + k * _H_STEP) * _H_MULT) % _H_MOD
                     for h in hb)
            if ma == mb:
                matches += 1
        match_tot += matches
        est = float(matches) / _MH_K
        err_q += int(math.floor(abs(est - jac) * 1e4 + 0.5))
    out = pd.DataFrame({"n_pairs": [_MH_PAIRS],
                        "match_total": [match_tot],
                        "sum_abs_err_q4": [err_q]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


_POW_LIST = "[" + ", ".join(f"{v}::BIGINT" for v in _POWS) + "]"

SQL_MINHASH = rf"""
WITH d2 AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tk
  FROM documents WHERE doc_id < {2 * _MH_PAIRS}),
sh AS (
  SELECT DISTINCT doc_id,
         b.b AS s
  FROM d2,
       LATERAL unnest([tk[kk] || ' ' || tk[kk + 1]
                       FOR kk IN range(1, len(tk))]) AS b(b)),
hs AS (
  SELECT doc_id, s,
         list_sum([ord(substring(s, ii, 1))
                   * {_POW_LIST}[length(s) - ii + 1]
                   FOR ii IN range(1, length(s) + 1)])
           % {_H_MOD} AS h0
  FROM sh),
mh AS (
  SELECT doc_id, k.k,
         min(CAST(((h0 + k.k * {_H_STEP})::UBIGINT
                   * {_H_MULT}) % {_H_MOD} AS BIGINT)) AS mv
  FROM hs, (SELECT unnest(range(0, {_MH_K})) AS k) k
  GROUP BY doc_id, k.k),
pm AS (
  SELECT a.doc_id // 2 AS p,
         sum((a.mv = b.mv)::INT)::BIGINT AS matches
  FROM mh a JOIN mh b ON b.doc_id = a.doc_id + 1 AND b.k = a.k
  WHERE a.doc_id % 2 = 0
  GROUP BY 1),
jac AS (
  SELECT a.doc_id // 2 AS p,
         count(DISTINCT CASE WHEN b.s IS NOT NULL
                             THEN a.s END)::BIGINT AS inter,
         count(DISTINCT a.s)::BIGINT AS na
  FROM sh a LEFT JOIN sh b
    ON b.doc_id = a.doc_id + 1 AND b.s = a.s
  WHERE a.doc_id % 2 = 0
  GROUP BY 1),
nb AS (
  SELECT doc_id // 2 AS p, count(DISTINCT s)::BIGINT AS nb
  FROM sh WHERE doc_id % 2 = 1 GROUP BY 1),
f AS (
  SELECT pm.p, pm.matches,
         CAST(j.inter AS DOUBLE)
           / CAST(j.na + nb.nb - j.inter AS DOUBLE) AS jacc
  FROM pm JOIN jac j ON j.p = pm.p JOIN nb ON nb.p = pm.p)
SELECT count(*)::BIGINT AS n_pairs,
       sum(matches)::BIGINT AS match_total,
       sum(CAST(floor(abs(CAST(matches AS DOUBLE) / {_MH_K}
                          - jacc) * 1e4 + 5e-1)
                AS BIGINT))::BIGINT AS sum_abs_err_q4
FROM f
"""


# ---------------------------------------------------------------------------
# Rabin-Karp collisions
# ---------------------------------------------------------------------------


def q_rabin_karp_collisions(sf_dir: str):
    """Distinct windows vs distinct 20-bit hashes (docstring)."""
    ds = _pq(sf_dir, "documents", columns=["text"])

    def windows(t: pa.Table) -> pa.Table:
        wins: set[str] = set()
        for txt in t["text"].to_pylist():
            for i in range(len(txt) - _RK_W + 1):
                wins.add(txt[i:i + _RK_W])
        if not wins:
            return pa.table({"w": pa.array([], pa.string()),
                             "pk": pa.array([], pa.int64()),
                             "h0": pa.array([], pa.int64()),
                             "bm": pa.array([], pa.binary())})
        ws = sorted(wins)
        h0 = np.array([_poly_hash(w) for w in ws], np.int64)
        bitmap = np.zeros(_RK_M // 8, np.uint8)
        h20 = h0 % _RK_M
        np.bitwise_or.at(bitmap, h20 // 8,
                         (1 << (h20 % 8)).astype(np.uint8))
        return pa.table({
            "w": pa.array(ws, pa.string()),
            "pk": pa.array(h0 % 64, pa.int64()),
            "h0": pa.array(h0),
            "bm": pa.array([bitmap.tobytes()]
                           + [None] * (len(ws) - 1),
                           pa.binary())})

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        return _strip(pd.DataFrame({
            "dw": [np.int64(df["w"].nunique())]}))

    raw = ds.map_batches(windows, batch_format="pyarrow")
    parts = (raw.groupby("pk")
                .map_groups(merge_part, batch_format="pandas")
                .to_pandas())
    dw = int(parts["dw"].sum())
    bm_all = np.zeros(_RK_M // 8, np.uint8)
    for row in raw.select_columns(["bm"]).take_all():
        if row["bm"] is not None:
            bm_all |= np.frombuffer(row["bm"], np.uint8)
    dh = int(np.unpackbits(bm_all).sum())
    m = float(_RK_M)
    exp_dh = m * (1.0 - math.exp(dw * math.log(1.0 - 1.0 / m)))
    out = pd.DataFrame({
        "n_windows": [dw], "n_hashes": [dh],
        "collisions": [dw - dh],
        "expected_hashes6": [_round6(np.array([exp_dh]))[0]]})
    for col in ("n_windows", "n_hashes", "collisions"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RABIN = f"""
WITH w AS (
  SELECT DISTINCT substring(text, ii, {_RK_W}) AS w
  FROM documents,
       LATERAL (SELECT unnest(range(1, length(text)
                                    - {_RK_W} + 2)) AS ii) i),
h AS (
  SELECT w,
         (list_sum([ord(substring(w, jj, 1))
                    * {_POW_LIST}[{_RK_W} - jj + 1]
                    FOR jj IN range(1, {_RK_W} + 1)])
          % {_H_MOD}) % {_RK_M} AS h20
  FROM w),
s AS (
  SELECT count(*)::BIGINT AS dw,
         count(DISTINCT h20)::BIGINT AS dh
  FROM h)
SELECT dw AS n_windows, dh AS n_hashes,
       (dw - dh)::BIGINT AS collisions,
       round({float(_RK_M)!r}
             * (1.0 - exp(dw * ln(1.0 - 1.0
                                  / {float(_RK_M)!r}))), 6)
         AS expected_hashes6
FROM s
"""


# ---------------------------------------------------------------------------
# FM backward search
# ---------------------------------------------------------------------------


def q_fm_backward_search(sf_dir: str):
    """FM count of 'udd' via BWT backward search (docstring)."""
    s = _order_daily_updown(sf_dir) + "$"
    n = len(s)
    rots = sorted(s[i:] + s[:i] for i in range(n))
    bwt = "".join(r[-1] for r in rots)
    alpha = sorted(set(s))
    cc = {}
    run = 0
    for ch in alpha:
        cc[ch] = run
        run += s.count(ch)
    lo, hi = 0, n
    for ch in reversed(_FM_PAT):
        lo = cc[ch] + bwt[:lo].count(ch)
        hi = cc[ch] + bwt[:hi].count(ch)
        if lo >= hi:
            break
    fm_count = max(0, hi - lo)
    direct = sum(1 for i in range(len(s) - len(_FM_PAT))
                 if s[i:i + len(_FM_PAT)] == _FM_PAT)
    out = pd.DataFrame({"n": [n], "fm_count": [fm_count],
                        "direct_count": [direct],
                        "ok": [1 if fm_count == direct else 0]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


def _occ(prefix_len: str, ch: str) -> str:
    return (f"(length(substring(bwt, 1, {prefix_len}))"
            f" - length(replace(substring(bwt, 1, {prefix_len}),"
            f" '{ch}', '')))")


def _fm_steps() -> str:
    steps = []
    prev = "st0"
    for i, ch in enumerate(reversed(_FM_PAT), start=1):
        steps.append(f"""
st{i} AS (
  SELECT bwt, cd, cu,
         (CASE WHEN '{ch}' = 'd' THEN cd ELSE cu END)
         + {_occ(f"{prev}.lo", ch)} AS lo,
         (CASE WHEN '{ch}' = 'd' THEN cd ELSE cu END)
         + {_occ(f"{prev}.hi", ch)} AS hi
  FROM {prev})""")
        prev = f"st{i}"
    return ",".join(steps)


SQL_FM = f"""
WITH {_SQL_S},
sd AS (SELECT s.s || '$' AS sd FROM s),
rots AS (
  SELECT substring(sd, i.i, length(sd) - i.i + 1)
         || substring(sd, 1, i.i - 1) AS rot
  FROM sd, LATERAL (SELECT unnest(range(1, length(sd) + 1))
                    AS i) i),
bw AS (
  SELECT string_agg(substring(rot, length(rot), 1), ''
                    ORDER BY rot) AS bwt
  FROM rots),
cs AS (
  SELECT bw.bwt,
         1 AS cd,      -- '$' < 'd' < 'u'; C['d'] = count('$') = 1
         1 + (length(sd.sd)
              - length(replace(sd.sd, 'd', ''))) AS cu,
         length(sd.sd) AS n, sd.sd AS sd
  FROM bw, sd),
st0 AS (SELECT bwt, cd, cu, 0 AS lo, n AS hi, n, sd FROM cs),
{_fm_steps()},
f AS (
  SELECT st0.n, st0.sd,
         greatest(0, st{len(_FM_PAT)}.hi
                     - st{len(_FM_PAT)}.lo) AS fm_count
  FROM st0, st{len(_FM_PAT)}),
dir AS (
  SELECT count(*)::BIGINT AS direct
  FROM f, LATERAL (SELECT unnest(range(1, f.n
                                       - {len(_FM_PAT)} + 1))
                   AS p) p
  WHERE substring(f.sd, p.p, {len(_FM_PAT)}) = '{_FM_PAT}')
SELECT f.n::BIGINT AS n, f.fm_count::BIGINT AS fm_count,
       dir.direct AS direct_count,
       (CASE WHEN f.fm_count = dir.direct THEN 1 ELSE 0 END)
         ::BIGINT AS ok
FROM f, dir
"""


QUERIES197: dict[str, tuple] = {
    "minhash_jaccard_audit": (q_minhash_jaccard_audit, SQL_MINHASH),
    "rabin_karp_collisions": (q_rabin_karp_collisions, SQL_RABIN),
    "fm_backward_search": (q_fm_backward_search, SQL_FM),
}
