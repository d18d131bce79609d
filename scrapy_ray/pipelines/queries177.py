"""One-hundred-seventy-seventh oracle-query batch — coding-theory /
MT-eval kernels, all pure-integer (or single-float-finalize):

- crc32_updown: CRC-32 (IEEE reflected, poly 0xEDB88320, init/final
  0xFFFFFFFF) of the ASCII bytes of the 364-char daily orders
  up/down string, replayed bit-by-bit — one recursion level per bit
  (≈2900 levels, scalar state; DuckDB xor()/shifts mirror the
  Python loop exactly).
- hamming74_audit: Hamming(7,4) error-correction replay over every
  user id — encode the low nibble, flip one deterministic bit (two
  when u%5=0: the uncorrectable case), decode by syndrome, and
  count exact singles/doubles/correct/miscorrected. Pure bit
  algebra on both sides.
- chrf2_sources: the chrF-style character-bigram F1 between source
  src1 (candidate) and src0 (reference) — clipped character-bigram
  precision AND recall on exact integer counts (the recall
  counterpart of batch 173's BLEU-2), F1 finalized identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries168 import _order_daily_updown

_CRC_POLY = 0xEDB88320
_REF, _CAND = "src0", "src1"


# ---------------------------------------------------------------------------
# CRC-32
# ---------------------------------------------------------------------------


def q_crc32_updown(sf_dir: str):
    """Bitwise CRC-32 of the daily up/down string (docstring)."""
    s = _order_daily_updown(sf_dir)
    crc = 0xFFFFFFFF
    for ch in s:
        crc ^= ord(ch)
        for _ in range(8):
            if crc & 1:
                crc = (crc >> 1) ^ _CRC_POLY
            else:
                crc >>= 1
    crc ^= 0xFFFFFFFF
    out = pd.DataFrame({"n": [len(s)], "crc32": [crc]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


from scrapy_ray.pipelines.queries168 import _SQL_S  # noqa: E402

SQL_CRC32 = f"""
WITH RECURSIVE {_SQL_S},
-- 256-entry reflected CRC table in 8 SET-BASED levels (all 256
-- rows advance together), then one recursion level per byte —
-- 372 levels total instead of 2912 bit levels (~10x faster)
tblgen AS (
  SELECT k.k AS k, k.k::BIGINT AS v, 0 AS j
  FROM (SELECT unnest(range(0, 256)) AS k) k
  UNION ALL
  SELECT k,
         CASE WHEN v % 2 = 1 THEN xor(v // 2, {_CRC_POLY})
              ELSE v // 2 END,
         j + 1
  FROM tblgen WHERE j < 8),
tbl AS (SELECT list(v ORDER BY k) AS t FROM tblgen WHERE j = 8),
bytes AS (
  SELECT 0::BIGINT AS i, 4294967295::BIGINT AS crc,
         length(s.s)::BIGINT AS n, s.s AS s, tbl.t AS t
  FROM s, tbl
  UNION ALL
  SELECT i + 1,
         xor(t[(xor(crc, ord(substring(s, i + 1, 1))) & 255) + 1],
             crc // 256),
         n, s, t
  FROM bytes WHERE i < n)
SELECT n, xor(crc, 4294967295)::BIGINT AS crc32
FROM bytes WHERE i = n
"""


# ---------------------------------------------------------------------------
# Hamming(7,4)
# ---------------------------------------------------------------------------


def q_hamming74_audit(sf_dir: str):
    """Hamming(7,4) single/double error replay (docstring)."""
    ds = _pq(sf_dir, "events", columns=["user_id"])
    uids = np.asarray(sorted(int(u) for u in ds.unique("user_id")),
                      np.int64)
    d3 = (uids >> 0) & 1
    d5 = (uids >> 1) & 1
    d6 = (uids >> 2) & 1
    d7 = (uids >> 3) & 1
    p1 = d3 ^ d5 ^ d7
    p2 = d3 ^ d6 ^ d7
    p4 = d5 ^ d6 ^ d7
    cw = (p1 << 0) | (p2 << 1) | (d3 << 2) | (p4 << 3) \
        | (d5 << 4) | (d6 << 5) | (d7 << 6)
    f1 = ((uids >> 4) % 7) + 1
    dbl = (uids % 5) == 0
    f2 = ((uids >> 6) % 7) + 1
    f2 = np.where(f2 == f1, (f1 % 7) + 1, f2)
    rx = cw ^ (1 << (f1 - 1))
    rx = np.where(dbl, rx ^ (1 << (f2 - 1)), rx)
    c = [(rx >> k) & 1 for k in range(7)]
    s1 = c[0] ^ c[2] ^ c[4] ^ c[6]
    s2 = c[1] ^ c[2] ^ c[5] ^ c[6]
    s4 = c[3] ^ c[4] ^ c[5] ^ c[6]
    syn = s1 + 2 * s2 + 4 * s4
    corr = np.where(syn > 0, rx ^ (1 << (syn - 1)), rx)
    dec = ((corr >> 2) & 1) | (((corr >> 4) & 1) << 1) \
        | (((corr >> 5) & 1) << 2) | (((corr >> 6) & 1) << 3)
    orig = uids & 15
    ok = dec == orig
    out = pd.DataFrame({
        "n_users": [len(uids)],
        "n_double": [int(dbl.sum())],
        "n_ok": [int(ok.sum())],
        "n_bad": [int((~ok).sum())]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_HAMMING = """
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
enc AS (
  SELECT u,
         (u >> 0) & 1 AS d3, (u >> 1) & 1 AS d5,
         (u >> 2) & 1 AS d6, (u >> 3) & 1 AS d7
  FROM u),
cw AS (
  SELECT u, d3, d5, d6, d7,
         (xor(xor(d3, d5), d7) << 0)
         | (xor(xor(d3, d6), d7) << 1) | (d3 << 2)
         | (xor(xor(d5, d6), d7) << 3) | (d5 << 4)
         | (d6 << 5) | (d7 << 6) AS c
  FROM enc),
flip AS (
  SELECT u, d3, d5, d6, d7,
         ((u >> 4) % 7) + 1 AS f1, (u % 5 = 0) AS dbl,
         CASE WHEN ((u >> 6) % 7) + 1 = ((u >> 4) % 7) + 1
              THEN ((((u >> 4) % 7) + 1) % 7) + 1
              ELSE ((u >> 6) % 7) + 1 END AS f2,
         c
  FROM cw),
rx AS (
  SELECT u, d3, d5, d6, d7,
         CASE WHEN dbl
              THEN xor(xor(c, 1 << (f1 - 1)), 1 << (f2 - 1))
              ELSE xor(c, 1 << (f1 - 1)) END AS r,
         dbl
  FROM flip),
syn AS (
  SELECT u, d3, d5, d6, d7, r, dbl,
         xor(xor(xor((r >> 0) & 1, (r >> 2) & 1),
                 (r >> 4) & 1), (r >> 6) & 1)
         + 2 * xor(xor(xor((r >> 1) & 1, (r >> 2) & 1),
                       (r >> 5) & 1), (r >> 6) & 1)
         + 4 * xor(xor(xor((r >> 3) & 1, (r >> 4) & 1),
                       (r >> 5) & 1), (r >> 6) & 1) AS s
  FROM rx),
dec AS (
  SELECT u, dbl,
         CASE WHEN s > 0 THEN xor(r, 1 << (s - 1)) ELSE r END
           AS corr,
         (d3 << 0) | (d5 << 1) | (d6 << 2) | (d7 << 3) AS orig
  FROM syn),
fin AS (
  SELECT dbl,
         (((corr >> 2) & 1) | (((corr >> 4) & 1) << 1)
          | (((corr >> 5) & 1) << 2)
          | (((corr >> 6) & 1) << 3)) = orig AS ok
  FROM dec)
SELECT count(*)::BIGINT AS n_users,
       sum(dbl::INT)::BIGINT AS n_double,
       sum(ok::INT)::BIGINT AS n_ok,
       sum((NOT ok)::INT)::BIGINT AS n_bad
FROM fin
"""


# ---------------------------------------------------------------------------
# chrF (character-bigram F1)
# ---------------------------------------------------------------------------


def q_chrf2_sources(sf_dir: str):
    """Char-bigram clipped F1, src1 vs src0 (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def grams(t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {}
        for src, txt in zip(t["source"].to_pylist(),
                            t["text"].to_pylist()):
            if src not in (_REF, _CAND):
                continue
            side = 1 if src == _CAND else 0
            for i in range(len(txt) - 1):
                g = txt[i:i + 2]
                cell = rows.setdefault(g, [0, 0])
                cell[side] += 1
        return pa.table({
            "g": pa.array(list(rows), pa.string()),
            "c0": pa.array([v[0] for v in rows.values()], pa.int64()),
            "c1": pa.array([v[1] for v in rows.values()], pa.int64()),
        })

    agg = (ds.map_batches(grams, batch_format="pyarrow")
             .groupby("g").aggregate(Sum("c0", alias_name="c0"),
                                     Sum("c1", alias_name="c1"))
             .to_pandas())
    c0 = agg["c0"].to_numpy(np.int64)
    c1 = agg["c1"].to_numpy(np.int64)
    clip = int(np.minimum(c0, c1).sum())
    tc, tr = int(c1.sum()), int(c0.sum())
    p = float(clip) / float(tc)
    r = float(clip) / float(tr)
    f1 = 2.0 * p * r / (p + r)
    r6 = _round6(np.array([p, r, f1]))
    out = pd.DataFrame({"cand_bigrams": [tc], "ref_bigrams": [tr],
                        "clipped": [clip], "p6": [r6[0]],
                        "r6": [r6[1]], "f1_6": [r6[2]]})
    for col in ("cand_bigrams", "ref_bigrams", "clipped"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CHRF = f"""
WITH d2 AS (
  SELECT source, text FROM documents
  WHERE source IN ('{_REF}', '{_CAND}')),
bg AS (
  SELECT substring(text, kk, 2) AS g, source
  FROM d2,
       LATERAL (SELECT unnest(range(1, length(text))) AS kk) k),
cnt AS (
  SELECT g,
         sum((source = '{_REF}')::INT)::BIGINT AS c0,
         sum((source = '{_CAND}')::INT)::BIGINT AS c1
  FROM bg GROUP BY g),
s AS (
  SELECT sum(least(c0, c1))::BIGINT AS clip,
         sum(c1)::BIGINT AS tc, sum(c0)::BIGINT AS tr
  FROM cnt),
f AS (
  SELECT tc, tr, clip,
         CAST(clip AS DOUBLE) / CAST(tc AS DOUBLE) AS p,
         CAST(clip AS DOUBLE) / CAST(tr AS DOUBLE) AS r
  FROM s)
SELECT tc AS cand_bigrams, tr AS ref_bigrams, clip AS clipped,
       round(p, 6) AS p6, round(r, 6) AS r6,
       round(2e0 * p * r / (p + r), 6) AS f1_6
FROM f
"""


QUERIES177: dict[str, tuple] = {
    "crc32_updown": (q_crc32_updown, SQL_CRC32),
    "hamming74_audit": (q_hamming74_audit, SQL_HAMMING),
    "chrf2_sources": (q_chrf2_sources, SQL_CHRF),
}
