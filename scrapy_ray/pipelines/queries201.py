"""Two-hundred-first oracle-query batch — source-coding theory on
the event streams:

- package_merge_codes: the length-limited (L = 4) optimal prefix
  code for the event-type distribution via package-merge. Every
  item carries a UNIQUE encoding weight·256 + id (originals id
  1..k, the p-th package of a level id k+p — pairing happens on the
  already-sorted previous level, so ids are deterministic and the
  sort is tie-free on both sides). Per-symbol code lengths come
  from counters carried with each item; the unrestricted Huffman
  cost is replayed the same way (merged node id = k + step) and the
  scaled Kraft sum Σ2^(L−l) is reported.
- tunstall_code_audit: the Tunstall variable-to-fixed code — expand
  the max-probability leaf twice (5 → 13 leaves) with leaf
  probabilities compared EXACTLY by num·total^(3−d) cross
  multiplication (HUGEINT) and lid tiebreak; expected phrase
  length and bits/symbol of 4-bit codewords.
- kt_code_length_updown: the Krichevsky–Trofimov universal code
  length of the daily up/down string — per-step
  −log2((c_t + 1/2)/(t + 1)) terms from window-cumsum symbol
  counts, nano-quantized before summing; redundancy vs n·H(p̂).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries168 import _order_daily_updown, _SQL_S
from scrapy_ray.pipelines.queries176 import _type_value_stats

_PM_L = 4
_K = 5


# ---------------------------------------------------------------------------
# Package-merge
# ---------------------------------------------------------------------------


def q_package_merge_codes(sf_dir: str):
    """Length-limited Huffman via package-merge (docstring)."""
    st = _type_value_stats(sf_dir).sort_values("et") \
        .reset_index(drop=True)
    names = st["et"].tolist()
    c = [int(v) for v in st["n"]]
    k = len(c)

    def originals():
        return [(c[i] * 256 + (i + 1),
                 [1 if j == i else 0 for j in range(k)])
                for i in range(k)]

    level = sorted(originals())
    for _ in range(_PM_L - 1):
        packages = []
        for p in range(len(level) // 2):
            a, b = level[2 * p], level[2 * p + 1]
            w = a[0] // 256 + b[0] // 256
            cnt = [a[1][j] + b[1][j] for j in range(k)]
            packages.append((w * 256 + (k + p + 1), cnt))
        level = sorted(originals() + packages)
    lens = [0] * k
    for enc, cnt in level[:2 * (k - 1)]:
        for j in range(k):
            lens[j] += cnt[j]
    total_bits = sum(c[i] * lens[i] for i in range(k))
    kraft = sum(1 << (_PM_L - lens[i]) for i in range(k))
    nodes = sorted(originals())
    hl = [0] * k
    step = 0
    while len(nodes) > 1:
        a, b = nodes[0], nodes[1]
        step += 1
        w = a[0] // 256 + b[0] // 256
        cnt = [a[1][j] + b[1][j] for j in range(k)]
        for j in range(k):
            hl[j] += cnt[j]
        nodes = sorted(nodes[2:] + [(w * 256 + (k + step), cnt)])
    huff_bits = sum(c[i] * hl[i] for i in range(k))
    out = pd.DataFrame({
        "k": [k], "lmax": [max(lens)],
        "total_bits": [total_bits], "huff_bits": [huff_bits],
        "kraft_scaled": [kraft]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


def _struct(enc_expr: str, cnt_exprs: list[str]) -> str:
    fields = ", ".join(f"'c{j + 1}': {e}"
                       for j, e in enumerate(cnt_exprs))
    return f"{{'enc': {enc_expr}, {fields}}}"


def _pm_sql() -> str:
    k = _K
    orig = ("[" + _struct(
        "cl[oo] * 256 + oo",
        [f"CASE WHEN oo = {j + 1} THEN 1 ELSE 0 END"
         for j in range(k)])
        + " FOR oo IN range(1, 6)]")
    pack = ("[" + _struct(
        "((lv[2 * pp - 1].enc // 256)"
        " + (lv[2 * pp].enc // 256)) * 256 + (5 + pp)",
        [f"lv[2 * pp - 1].c{j + 1} + lv[2 * pp].c{j + 1}"
         for j in range(k)])
        + " FOR pp IN range(1, len(lv) // 2 + 1)]")
    steps = []
    for lvl in range(2, _PM_L + 1):
        steps.append(f"""
lv{lvl} AS (
  SELECT cl, list_sort({orig} || {pack}) AS lv
  FROM lv{lvl - 1})""")
    sel_lens = ", ".join(
        f"list_sum([lv[tt{j}].c{j + 1} FOR tt{j} IN range(1, 9)])"
        f" AS l{j + 1}" for j in range(k))
    hmerge = _struct(
        "((nodes[1].enc // 256) + (nodes[2].enc // 256)) * 256"
        " + (5 + st + 1)",
        [f"nodes[1].c{j + 1} + nodes[2].c{j + 1}"
         for j in range(k)])
    horig = ("[" + _struct(
        "cl[hh] * 256 + hh",
        [f"CASE WHEN hh = {j + 1} THEN 1 ELSE 0 END"
         for j in range(k)])
        + " FOR hh IN range(1, 6)]")
    hupd = ", ".join(
        f"h{j + 1} + nodes[1].c{j + 1} + nodes[2].c{j + 1}"
        for j in range(k))
    hcols = ", ".join(f"0::BIGINT AS h{j + 1}" for j in range(k))
    return f"""
WITH RECURSIVE tc AS (
  SELECT event_type AS et, count(*)::BIGINT AS c
  FROM events GROUP BY 1),
base AS (
  SELECT (SELECT list(c ORDER BY et) FROM tc) AS cl),
lv1 AS (SELECT cl, list_sort({orig}) AS lv FROM base),
{",".join(steps)},
sel AS (SELECT cl, {sel_lens} FROM lv{_PM_L}),
huff AS (
  SELECT cl, 0::BIGINT AS st, {hcols},
         list_sort({horig}) AS nodes
  FROM base
  UNION ALL
  SELECT cl, st + 1, {hupd},
         list_sort([nodes[zz] FOR zz IN range(3, len(nodes) + 1)]
                   || [{hmerge}])
  FROM huff WHERE len(nodes) > 1),
hf AS (SELECT * FROM huff WHERE len(nodes) = 1)
SELECT 5::BIGINT AS k,
       greatest(sel.l1, sel.l2, sel.l3, sel.l4, sel.l5)::BIGINT
         AS lmax,
       (sel.cl[1] * sel.l1 + sel.cl[2] * sel.l2
        + sel.cl[3] * sel.l3 + sel.cl[4] * sel.l4
        + sel.cl[5] * sel.l5)::BIGINT AS total_bits,
       (hf.cl[1] * hf.h1 + hf.cl[2] * hf.h2 + hf.cl[3] * hf.h3
        + hf.cl[4] * hf.h4 + hf.cl[5] * hf.h5)::BIGINT
         AS huff_bits,
       ((1 << ({_PM_L} - sel.l1)) + (1 << ({_PM_L} - sel.l2))
        + (1 << ({_PM_L} - sel.l3)) + (1 << ({_PM_L} - sel.l4))
        + (1 << ({_PM_L} - sel.l5)))::BIGINT AS kraft_scaled
FROM sel, hf
"""


SQL_PACKAGE_MERGE = _pm_sql()


# ---------------------------------------------------------------------------
# Tunstall
# ---------------------------------------------------------------------------


def q_tunstall_code_audit(sf_dir: str):
    """Two Tunstall expansions, exact comparisons (docstring)."""
    st = _type_value_stats(sf_dir).sort_values("et") \
        .reset_index(drop=True)
    c = [int(v) for v in st["n"]]
    k = len(c)
    total = sum(c)
    leaves = [(c[i], 1, i + 1) for i in range(k)]
    next_id = k + 1
    for _ in range(2):
        best = None
        for idx, (num, d, lid) in enumerate(leaves):
            key = (-(num * total ** (3 - d)), lid)
            if best is None or key < best[0]:
                best = (key, idx)
        num, d, _ = leaves[best[1]]
        del leaves[best[1]]
        for i in range(k):
            leaves.append((num * c[i], d + 1, next_id))
            next_id += 1
    nl = len(leaves)
    num_sum = sum(num * total ** (3 - d) * d
                  for num, d, _ in leaves)
    den = total ** 3
    epl = float(num_sum) / float(den)
    bits = 4.0 / epl
    r6 = _round6(np.array([epl, bits]))
    out = pd.DataFrame({"n_leaves": [nl],
                        "epl6": [r6[0]], "bits_per_sym6": [r6[1]]})
    out["n_leaves"] = out["n_leaves"].astype(np.int64)
    return out


def _tun_sql() -> str:
    def step(i: int) -> str:
        prev = f"t{i - 1}"
        return f"""
b{i} AS (
  SELECT {prev}.cl, {prev}.k, {prev}.total, {prev}.next_id,
         {prev}.leaves,
         (SELECT l.lid
          FROM (SELECT unnest({prev}.leaves) AS l)
          ORDER BY l.num * (CASE l.d
                    WHEN 1 THEN {prev}.total::HUGEINT
                                * {prev}.total
                    WHEN 2 THEN {prev}.total::HUGEINT
                    ELSE 1::HUGEINT END) DESC, l.lid
          LIMIT 1) AS blid
  FROM {prev}),
t{i} AS (
  SELECT cl, k, total, next_id + k AS next_id,
         [l2 FOR l2 IN leaves IF l2.lid <> blid]
         || [{{'num': bnum * cl[jj{i}]::HUGEINT, 'd': bd + 1,
               'lid': next_id + jj{i} - 1}}
             FOR jj{i} IN range(1, k + 1)] AS leaves
  FROM (
    SELECT b{i}.*,
           (SELECT l.num FROM (SELECT unnest(b{i}.leaves) AS l)
            WHERE l.lid = b{i}.blid) AS bnum,
           (SELECT l.d FROM (SELECT unnest(b{i}.leaves) AS l)
            WHERE l.lid = b{i}.blid) AS bd
    FROM b{i}) q{i})"""

    return f"""
WITH tc AS (
  SELECT event_type AS et, count(*)::BIGINT AS c
  FROM events GROUP BY 1),
base AS (
  SELECT (SELECT list(c ORDER BY et) FROM tc) AS cl,
         (SELECT count(*) FROM tc)::BIGINT AS k,
         (SELECT sum(c) FROM tc)::BIGINT AS total),
t0 AS (
  SELECT cl, k, total, k + 1 AS next_id,
         [{{'num': cl[ii]::HUGEINT, 'd': 1, 'lid': ii}}
          FOR ii IN range(1, k + 1)] AS leaves
  FROM base),
{step(1)},
{step(2)},
f AS (
  SELECT (SELECT count(*)
          FROM (SELECT unnest(t2.leaves) AS l))::BIGINT
           AS n_leaves,
         (SELECT sum(l.num * (CASE l.d
                    WHEN 1 THEN t2.total::HUGEINT * t2.total
                    WHEN 2 THEN t2.total::HUGEINT
                    ELSE 1::HUGEINT END) * l.d)
          FROM (SELECT unnest(t2.leaves) AS l)) AS num_sum,
         t2.total::HUGEINT * t2.total * t2.total AS den
  FROM t2)
SELECT n_leaves,
       round(CAST(num_sum AS DOUBLE) / CAST(den AS DOUBLE), 6)
         AS epl6,
       round(4.0 / (CAST(num_sum AS DOUBLE)
                    / CAST(den AS DOUBLE)), 6) AS bits_per_sym6
FROM f
"""


SQL_TUNSTALL = _tun_sql()


# ---------------------------------------------------------------------------
# KT code length
# ---------------------------------------------------------------------------


def q_kt_code_length_updown(sf_dir: str):
    """KT universal code length of the up/down string (docstring)."""
    s = _order_daily_updown(sf_dir)
    n = len(s)
    cu = 0
    cd = 0
    klq = 0
    for t, ch in enumerate(s):
        c = cu if ch == "u" else cd
        term = -math.log2((c + 0.5) / (t + 1.0))
        klq += int(math.floor(term * 1e9 + 0.5))
        if ch == "u":
            cu += 1
        else:
            cd += 1
    p = cu / n
    if 0 < p < 1:
        ent = n * (-(p * math.log2(p)
                     + (1.0 - p) * math.log2(1.0 - p)))
    else:
        ent = 0.0
    kl = float(klq) / 1e9
    r6 = _round6(np.array([kl, ent, kl - ent]))
    out = pd.DataFrame({"n": [n], "n_up": [cu],
                        "kt_bits6": [r6[0]],
                        "entropy_bits6": [r6[1]],
                        "redundancy6": [r6[2]]})
    for col in ("n", "n_up"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KT = f"""
WITH {_SQL_S},
ch AS (
  SELECT substring(s.s, i.i, 1) AS c, i.i AS pos
  FROM s, LATERAL (SELECT unnest(range(1, length(s.s) + 1))
                   AS i) i),
runs AS (
  SELECT pos, c,
         count(*) FILTER (c = 'u') OVER (
           ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING) AS cu,
         count(*) FILTER (c = 'd') OVER (
           ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING) AS cd
  FROM ch),
terms AS (
  SELECT pos,
         CAST(floor(-log2((CAST(CASE WHEN c = 'u'
                 THEN coalesce(cu, 0)
                 ELSE coalesce(cd, 0) END AS DOUBLE) + 0.5)
                 / CAST(pos AS DOUBLE)) * 1e9 + 5e-1)
              AS BIGINT) AS q
  FROM runs),
agg AS (
  SELECT (SELECT length(s) FROM s)::BIGINT AS n,
         (SELECT count(*) FROM ch WHERE c = 'u')::BIGINT AS nu,
         sum(q)::BIGINT AS klq
  FROM terms),
f AS (
  SELECT n, nu, CAST(klq AS DOUBLE) / 1e9 AS kl,
         CAST(nu AS DOUBLE) / CAST(n AS DOUBLE) AS p
  FROM agg)
SELECT n, nu AS n_up, round(kl, 6) AS kt_bits6,
       round(CASE WHEN p > 0 AND p < 1
             THEN n * (-(p * log2(p) + (1.0 - p) * log2(1.0 - p)))
             ELSE 0.0 END, 6) AS entropy_bits6,
       round(kl - CASE WHEN p > 0 AND p < 1
             THEN n * (-(p * log2(p) + (1.0 - p) * log2(1.0 - p)))
             ELSE 0.0 END, 6) AS redundancy6
FROM f
"""


QUERIES201: dict[str, tuple] = {
    "package_merge_codes": (q_package_merge_codes,
                            SQL_PACKAGE_MERGE),
    "tunstall_code_audit": (q_tunstall_code_audit, SQL_TUNSTALL),
    "kt_code_length_updown": (q_kt_code_length_updown, SQL_KT),
}
