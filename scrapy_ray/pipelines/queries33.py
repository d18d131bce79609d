"""Thirty-third oracle-query batch — supervised split learning /
multivariate regression / distribution normalization:

- decision_stump_price: the CART decision-stump primitive — the best
  single threshold on l_extendedprice separating returnflag 'R' rows,
  by exact between-group sum of squares (equivalently maximal Gini /
  variance drop for a 0/1 target): argmax over thresholds t of
  A(t)² / (n_L·n_R) with A = N·pos_L − n_L·P. The threshold scan is
  (cent → n, pos) cell aggregation (salted in-partition sums — shuffle
  bounded by the price-cent domain); the argmax runs driver-side over
  the O(domain) cumulative table in PYTHON ints (A² needs ~74 bits at
  bench scale, exactly like DuckDB's HUGEINT path), ranked on the
  scaled integer score (A²·10¹²)//(n_L·n_R) so no float ever orders
  the result. The reported bss6 finalizes identical-expression float.
- ols_two_feature: multiple linear regression price ~ quantity +
  discount(bp) + intercept, solved EXACTLY from one pass of integer
  moment partials (the cov_matrix discipline: per-batch int64 partial
  rows, driver Python-int combine) via Cramer's rule on the 3×3 normal
  matrix — determinants are exact big ints both sides (HUGEINT in SQL),
  betas/r² finalize as identical-expression float divisions, round6.
- quantile_normalize_chars: per-source quantile normalization of
  n_chars onto the GLOBAL distribution — the batch-effect correction
  primitive. Rank r within source (ties broken by doc_id), target
  global rank tr = (r·N + m−1)//m (all-integer ceil of r/m·N, the
  quantile_disc discipline), normalized value = global value at rank
  tr. Distributed as ONE (source,val)-salted doc shuffle (within-cell
  ranks need cell co-location) + an O(domain) cell broadcast; nothing
  driver-side is O(docs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_Q33_SALT = 64
_STUMP_K = 10**12


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _get(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _hnp(x: np.ndarray, scale: float) -> np.ndarray:
    """Half-away-from-zero round(x*scale) -> int64 (DuckDB round)."""
    y = x.astype(np.float64) * scale
    return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)


# ---------------------------------------------------------------------------
# decision stump
# ---------------------------------------------------------------------------


def q_decision_stump_price(sf_dir: str):
    """Best single price split for returnflag 'R' (docstring above)."""
    ds = _pq(sf_dir, "lineitem", columns=["l_extendedprice", "l_returnflag"])

    def cpart(t: pa.Table) -> pa.Table:
        cent = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        pos = (np.asarray(t["l_returnflag"].to_pylist()) == "R") \
            .astype(np.int64)
        df = pd.DataFrame({"cent": cent, "pos": pos})
        g = df.groupby("cent", sort=False).agg(n=("pos", "size"),
                                               pos=("pos", "sum")) \
            .reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["pos"] = g["pos"].astype(np.int64)
        g["sk"] = (g["cent"] % _Q33_SALT).astype(np.int64)
        return _strip(g)

    def csum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cent", sort=False)[["n", "pos"]].sum().reset_index()
        for c in ("n", "pos"):
            g[c] = g[c].astype(np.int64)
        return g

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby("sk").map_groups(csum, batch_format="pandas")
               .to_pandas().sort_values("cent").reset_index(drop=True))
    cent = cells["cent"].to_numpy().astype(np.int64)
    nl = np.cumsum(cells["n"].to_numpy().astype(np.int64))
    pl = np.cumsum(cells["pos"].to_numpy().astype(np.int64))
    N = int(nl[-1])
    P = int(pl[-1])
    # exact integer argmax (Python ints — A² overflows int64 at scale)
    best = None
    for i in range(len(cent) - 1):          # nl < N: last cent excluded
        a = N * int(pl[i]) - int(nl[i]) * P
        b = int(nl[i]) * (N - int(nl[i]))
        score = (a * a * _STUMP_K) // b
        if best is None or score > best[0]:
            best = (score, int(cent[i]), int(nl[i]), int(pl[i]))
    _, thr, n_left, pos_left = best
    a = N * pos_left - n_left * P
    bss6 = _round6(np.array(
        [float(a) * float(a) / (float(n_left) * float(N - n_left))
         / float(N)]))[0]
    out = pd.DataFrame({"thr_cent": [thr], "n_left": [n_left],
                        "pos_left": [pos_left], "n_right": [N - n_left],
                        "pos_right": [P - pos_left], "bss6": [bss6]})
    for c in ("thr_cent", "n_left", "pos_left", "n_right", "pos_right"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_STUMP = f"""
WITH c AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cent,
         count(*)::BIGINT AS n,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS pos
  FROM lineitem GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS N, sum(pos)::BIGINT AS P FROM c),
cum AS (
  SELECT cent,
         CAST(sum(n)   OVER (ORDER BY cent) AS BIGINT) AS nl,
         CAST(sum(pos) OVER (ORDER BY cent) AS BIGINT) AS pl
  FROM c),
sc AS (
  SELECT cent, nl, pl, N, P,
         (CAST(N*pl - nl*P AS HUGEINT) * CAST(N*pl - nl*P AS HUGEINT)
            * {_STUMP_K}) // (CAST(nl AS HUGEINT) * (N - nl)) AS score
  FROM cum, t WHERE nl < N)
SELECT cent AS thr_cent, nl AS n_left, pl AS pos_left,
       (N - nl)::BIGINT AS n_right, (P - pl)::BIGINT AS pos_right,
       round(CAST(N*pl - nl*P AS DOUBLE) * CAST(N*pl - nl*P AS DOUBLE)
             / (CAST(nl AS DOUBLE) * CAST(N - nl AS DOUBLE))
             / CAST(N AS DOUBLE), 6) AS bss6
FROM sc ORDER BY score DESC, cent LIMIT 1
"""


# ---------------------------------------------------------------------------
# two-feature OLS via Cramer
# ---------------------------------------------------------------------------


def q_ols_two_feature(sf_dir: str):
    """price ~ quantity + discount_bp + 1 via exact Cramer (docstring
    above). Units: y = round(extendedprice) dollars, x1 = quantity
    units, x2 = round(discount*1e4) basis points — per-batch products
    fit int64 with slack; Syy ≤ ~7e15 at bench scale."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_extendedprice", "l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        y = _hnp(t["l_extendedprice"].to_numpy(zero_copy_only=False), 1.0)
        q = _hnp(t["l_quantity"].to_numpy(zero_copy_only=False), 1.0)
        b = _hnp(t["l_discount"].to_numpy(zero_copy_only=False), 1e4)
        row = {"n": len(t), "sq": q.sum(), "sb": b.sum(), "sy": y.sum(),
               "sqq": (q * q).sum(), "sqb": (q * b).sum(),
               "sbb": (b * b).sum(), "sqy": (q * y).sum(),
               "sby": (b * y).sum(), "syy": (y * y).sum()}
        return pa.table({k: pa.array([int(v)], pa.int64())
                         for k, v in row.items()})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    m = {c: sum(int(x) for x in parts[c]) for c in parts.columns}
    n, sq, sb, sy = m["n"], m["sq"], m["sb"], m["sy"]
    sqq, sqb, sbb = m["sqq"], m["sqb"], m["sbb"]
    sqy, sby, syy = m["sqy"], m["sby"], m["syy"]
    det = (n * (sqq * sbb - sqb * sqb) - sq * (sq * sbb - sqb * sb)
           + sb * (sq * sqb - sqq * sb))
    det0 = (sy * (sqq * sbb - sqb * sqb) - sq * (sqy * sbb - sqb * sby)
            + sb * (sqy * sqb - sqq * sby))
    det1 = (n * (sqy * sbb - sqb * sby) - sy * (sq * sbb - sqb * sb)
            + sb * (sq * sby - sqy * sb))
    det2 = (n * (sqq * sby - sqy * sqb) - sq * (sq * sby - sqy * sb)
            + sy * (sq * sqb - sqq * sb))
    b0 = float(det0) / float(det)
    b1 = float(det1) / float(det)
    b2 = float(det2) / float(det)
    sse = float(syy) - (b0 * float(sy) + b1 * float(sqy) + b2 * float(sby))
    sst = float(syy) - float(sy) * float(sy) / float(n)
    r2 = 1.0 - sse / sst
    arr = _round6(np.array([b0, b1, b2, r2]))
    out = pd.DataFrame({"n": [n], "beta0_6": [arr[0]], "beta1_6": [arr[1]],
                        "beta2_6": [arr[2]], "r2_6": [arr[3]]})
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_OLS2 = """
WITH b AS (
  SELECT CAST(round(l_extendedprice) AS BIGINT) AS y,
         CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_discount * 10000) AS BIGINT) AS d
  FROM lineitem),
s AS (
  SELECT count(*)::HUGEINT AS n, sum(q)::HUGEINT AS sq,
         sum(d)::HUGEINT AS sb, sum(y)::HUGEINT AS sy,
         sum(q*q)::HUGEINT AS sqq, sum(q*d)::HUGEINT AS sqb,
         sum(d*d)::HUGEINT AS sbb, sum(q*y)::HUGEINT AS sqy,
         sum(d*y)::HUGEINT AS sby, sum(y*y)::HUGEINT AS syy
  FROM b),
d AS (
  SELECT *,
    n*(sqq*sbb - sqb*sqb) - sq*(sq*sbb - sqb*sb) + sb*(sq*sqb - sqq*sb)
      AS det,
    sy*(sqq*sbb - sqb*sqb) - sq*(sqy*sbb - sqb*sby) + sb*(sqy*sqb - sqq*sby)
      AS det0,
    n*(sqy*sbb - sqb*sby) - sy*(sq*sbb - sqb*sb) + sb*(sq*sby - sqy*sb)
      AS det1,
    n*(sqq*sby - sqy*sqb) - sq*(sq*sby - sqy*sb) + sy*(sq*sqb - sqq*sb)
      AS det2
  FROM s),
f AS (
  SELECT n, syy, sy, sqy, sby,
         CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS b0,
         CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS b1,
         CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS b2
  FROM d),
g AS (
  SELECT n, b0, b1, b2,
         CAST(syy AS DOUBLE)
           - (b0 * CAST(sy AS DOUBLE) + b1 * CAST(sqy AS DOUBLE)
              + b2 * CAST(sby AS DOUBLE)) AS sse,
         CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
           AS sst
  FROM f)
SELECT n::BIGINT AS n, round(b0, 6) AS beta0_6, round(b1, 6) AS beta1_6,
       round(b2, 6) AS beta2_6, round(1.0 - sse / sst, 6) AS r2_6
FROM g
"""


# ---------------------------------------------------------------------------
# quantile normalization
# ---------------------------------------------------------------------------


def q_quantile_normalize_chars(sf_dir: str):
    """Per-source quantile normalization of n_chars onto the global
    distribution (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    # pass A: (source, val) cell counts — O(sources × val-domain)
    def cellp(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": np.asarray(t["source"].to_pylist()),
                           "val": t["n_chars"].to_numpy(
                               zero_copy_only=False).astype(np.int64)})
        g = df.groupby(["source", "val"], sort=False).size() \
            .reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cellp, batch_format="pyarrow").to_pandas()
             .groupby(["source", "val"], sort=False)["cnt"].sum()
             .reset_index())
    sources = sorted(cells["source"].unique())
    sidx = {s: i for i, s in enumerate(sources)}
    vmax = int(cells["val"].max()) + 1
    cells["key"] = (cells["source"].map(sidx).to_numpy().astype(np.int64)
                    * vmax + cells["val"].to_numpy().astype(np.int64))
    cells = cells.sort_values("key").reset_index(drop=True)
    ckey = cells["key"].to_numpy().astype(np.int64)
    ccnt = cells["cnt"].to_numpy().astype(np.int64)
    skey = cells["source"].map(sidx).to_numpy().astype(np.int64)
    # base rank of each cell inside its source (cum counts below it)
    src_starts = np.flatnonzero(np.r_[True, skey[1:] != skey[:-1]])
    base = np.empty(len(ccnt), np.int64)
    for s0, s1 in zip(src_starts, np.r_[src_starts[1:], len(ccnt)]):
        base[s0:s1] = np.r_[0, np.cumsum(ccnt[s0:s1])[:-1]]
    msz = np.empty(len(ccnt), np.int64)
    for s0, s1 in zip(src_starts, np.r_[src_starts[1:], len(ccnt)]):
        msz[s0:s1] = ccnt[s0:s1].sum()
    # global value -> cumulative count (for rank -> value lookup)
    gl = cells.groupby("val", sort=True)["cnt"].sum().reset_index()
    gvals = gl["val"].to_numpy().astype(np.int64)
    gcum = np.cumsum(gl["cnt"].to_numpy().astype(np.int64))
    N = int(gcum[-1])
    lut = ray.put((sidx, vmax, ckey, base, msz, gvals, gcum, N))

    # pass B: (source,val)-salted within-cell ranks + vectorized lookup
    def salt(t: pa.Table) -> pa.Table:
        si, vm, *_ = _get(lut)
        src = np.asarray(t["source"].to_pylist())
        val = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.array([si[s] for s in src], np.int64) * vm + val
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "n_chars": t["n_chars"],
                         "key": pa.array(key),
                         "pk": pa.array((key % _Q33_SALT))})

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        _, _, ck, bs, ms, gv, gc, n_tot = _get(lut)
        df = df.sort_values(["key", "doc_id"], kind="mergesort") \
            .reset_index(drop=True)
        w = df.groupby("key", sort=False).cumcount().to_numpy() + 1
        ci = np.searchsorted(ck, df["key"].to_numpy(np.int64))
        r = bs[ci] + w
        m = ms[ci]
        tr = (r * n_tot + m - 1) // m
        qn = gv[np.searchsorted(gc, tr, side="left")]
        out = df[["doc_id", "source", "n_chars"]].copy()
        out["qnorm"] = qn.astype(np.int64)
        return out

    res = (ds.map_batches(salt, batch_format="pyarrow")
           .groupby("pk").map_groups(norm, batch_format="pandas")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for c in ("doc_id", "n_chars", "qnorm"):
        res[c] = res[c].astype(np.int64)
    return res


SQL_QNORM = """
WITH g AS (
  SELECT n_chars, row_number() OVER (ORDER BY n_chars, doc_id) AS gr
  FROM documents),
nn AS (SELECT count(*)::BIGINT AS N FROM documents),
s AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS r,
         count(*) OVER (PARTITION BY source) AS m
  FROM documents),
s2 AS (
  SELECT doc_id, source, n_chars,
         (r * (SELECT N FROM nn) + m - 1) // m AS tr
  FROM s)
SELECT s2.doc_id, s2.source, s2.n_chars, g.n_chars AS qnorm
FROM s2 JOIN g ON g.gr = s2.tr
ORDER BY s2.doc_id
"""


QUERIES33: dict[str, tuple] = {
    "decision_stump_price": (q_decision_stump_price, SQL_STUMP),
    "ols_two_feature": (q_ols_two_feature, SQL_OLS2),
    "quantile_normalize_chars": (q_quantile_normalize_chars, SQL_QNORM),
}
