"""One-hundred-seventy-first oracle-query batch — the index-layout /
sketch systems trio (mirrors of machinery a storage engine runs,
as oracle-checked queries):

- ams_f2_users: the Alon–Matias–Szegedy F2 (second frequency moment)
  sketch over user_id event counts, replayed EXACTLY both sides.
  Sixteen ±1 estimators from the mirrored multiplicative hash family
  (sign_j(u) = [h(u·) + (j+1)·step < 2³¹]); each S_j is a plain
  integer sum over events (linearity — no per-user state), the
  estimate is ΣS_j²/16, and the exact F2 = Σc_u² rides a salted
  per-user pass; the relative error is reported in-query.
- rice_golomb_postings: posting-list delta compression over the
  DISTINCT hashed user ids (docID reassignment into 2³² space with
  the same hash family): total Rice-coded bits (g>>k) + 1 + k for
  every k in 0..24, the argmin k*, Elias-gamma total bits
  (2·msb(g)+1, msb via bit_length / length(bin()) — no float log2),
  and the 32-bit fixed-width baseline. All pure integers.
- morton_locality: the Z-order (Morton) layout audit — occupied
  cells of the 64×64 (time-of-day-bucket × user_id%64) grid walked
  in Morton order vs row-major order, comparing total Manhattan
  jump between consecutive cells (the locality argument for
  space-filling-curve clustering). Bit interleave is an explicit
  12-term shift/mask sum on both sides.
"""

from __future__ import annotations

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
_AMS_K = 16
_T_US = 86_400_000_000
_GRID = 64


# ---------------------------------------------------------------------------
# AMS F2 sketch
# ---------------------------------------------------------------------------


def q_ams_f2_users(sf_dir: str):
    """AMS F2 sketch vs exact Σc_u² (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id"])

    def partials(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64) % np.uint64(_H_MOD)
        base = (u * np.uint64(_H_MULT)) % np.uint64(_H_MOD)
        js = []
        ss = []
        for j in range(_AMS_K):
            h = (base + np.uint64((j + 1) * _H_STEP)) \
                % np.uint64(_H_MOD)
            sign = np.where(h < np.uint64(2147483648),
                            np.int64(1), np.int64(-1))
            js.append(j)
            ss.append(int(sign.sum()))
        return pa.table({"j": pa.array(js, pa.int64()),
                         "s": pa.array(ss, pa.int64()),
                         "n": pa.array([len(u)] + [0] * (_AMS_K - 1),
                                       pa.int64())})

    sk = (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("j").aggregate(Sum("s", alias_name="s"),
                                    Sum("n", alias_name="n"))
            .to_pandas())
    n_events = int(sk["n"].sum())
    s = sk["s"].to_numpy(np.int64)
    est_num = int((s.astype(object) * s.astype(object)).sum())

    def csq(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("u", sort=False)["one"].sum() \
            .to_numpy(np.int64)
        return pd.DataFrame({"f2": [np.int64((c * c).sum())]})

    ds2 = _pq(sf_dir, "events", columns=["user_id"])

    def salt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u),
                         "one": pa.array(np.ones(len(u), np.int64)),
                         "sk": pa.array(u % 64)})

    f2 = int(ds2.map_batches(salt, batch_format="pyarrow")
                .groupby("sk").map_groups(
                    lambda df: _strip(csq(df)),
                    batch_format="pandas")
                .to_pandas()["f2"].sum())
    est = float(est_num) / _AMS_K
    rel = (est - float(f2)) / float(f2)
    r6 = _round6(np.array([est, rel]))
    out = pd.DataFrame({"n_events": [n_events], "f2_exact": [f2],
                        "f2_est6": [r6[0]], "rel_err6": [r6[1]]})
    for col in ("n_events", "f2_exact"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_AMS_F2 = f"""
WITH ev AS (
  SELECT ((user_id::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT)
           % {_H_MOD} AS base
  FROM events),
signs AS (
  SELECT j.j,
         sum(CASE WHEN (ev.base + (j.j + 1) * {_H_STEP})
                       % {_H_MOD} < 2147483648
                  THEN 1 ELSE -1 END)::BIGINT AS s
  FROM ev, LATERAL (SELECT unnest(range(0, {_AMS_K})) AS j) j
  GROUP BY j.j),
est AS (
  SELECT sum(CAST(s AS HUGEINT) * s) AS num FROM signs),
cu AS (SELECT count(*)::BIGINT AS c FROM events GROUP BY user_id),
ex AS (SELECT sum(CAST(c AS HUGEINT) * c) AS f2,
              sum(c)::BIGINT AS n
       FROM cu),
f AS (
  SELECT n, CAST(f2 AS BIGINT) AS f2,
         CAST((SELECT num FROM est) AS DOUBLE) / {_AMS_K} AS est
  FROM ex)
SELECT n AS n_events, f2 AS f2_exact, round(est, 6) AS f2_est6,
       round((est - CAST(f2 AS DOUBLE)) / CAST(f2 AS DOUBLE), 6)
         AS rel_err6
FROM f
"""


# ---------------------------------------------------------------------------
# Rice / Golomb posting compression
# ---------------------------------------------------------------------------


def q_rice_golomb_postings(sf_dir: str):
    """Optimal Rice parameter over hashed-id posting gaps."""
    ds = _pq(sf_dir, "events", columns=["user_id"])
    uids = np.asarray(sorted(ds.unique("user_id")), np.int64)
    h = ((uids.astype(np.uint64) % np.uint64(_H_MOD))
         * np.uint64(_H_MULT) + np.uint64(_H_STEP)) \
        % np.uint64(_H_MOD)
    hid = np.unique(h.astype(np.int64))
    g = np.diff(hid)
    n = len(hid)
    best_k, best_bits = 0, None
    for k in range(25):
        bits = int((g >> k).sum()) + len(g) * (1 + k)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    msb = np.array([int(v).bit_length() - 1 for v in g], np.int64)
    gamma_bits = int((2 * msb + 1).sum())
    out = pd.DataFrame({"n_ids": [n], "k_star": [best_k],
                        "rice_bits_min": [best_bits],
                        "gamma_bits": [gamma_bits],
                        "fixed_bits": [(n - 1) * 32]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_RICE = f"""
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
hid AS (
  SELECT DISTINCT CAST(((u::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT
                        + {_H_STEP}) % {_H_MOD} AS BIGINT) AS h
  FROM u),
gaps AS (
  SELECT h - lag(h) OVER (ORDER BY h) AS g FROM hid),
gg AS (SELECT g FROM gaps WHERE g IS NOT NULL),
rice AS (
  SELECT k.k,
         (sum(gg.g >> k.k) + count(*) * (1 + k.k))::BIGINT AS bits
  FROM gg, LATERAL (SELECT unnest(range(0, 25)) AS k) k
  GROUP BY k.k),
best AS (
  SELECT k, bits FROM rice
  ORDER BY bits, k LIMIT 1),
gamma AS (
  SELECT sum(2 * (length(bin(g)) - 1) + 1)::BIGINT AS bits
  FROM gg),
n AS (SELECT count(*)::BIGINT AS n FROM hid)
SELECT n.n AS n_ids, best.k::BIGINT AS k_star,
       best.bits AS rice_bits_min,
       gamma.bits AS gamma_bits,
       ((n.n - 1) * 32)::BIGINT AS fixed_bits
FROM n, best, gamma
"""


# ---------------------------------------------------------------------------
# Morton locality
# ---------------------------------------------------------------------------


def _morton(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    code = np.zeros(len(x), np.int64)
    for b in range(6):
        code |= (((x >> b) & 1) << (2 * b)) \
            | (((y >> b) & 1) << (2 * b + 1))
    return code


def q_morton_locality(sf_dir: str):
    """Morton vs row-major walk cost over occupied cells."""
    ds = _pq(sf_dir, "events", columns=["ts", "user_id"])

    def cells(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = (us % _T_US) // (_T_US // _GRID)
        y = u % _GRID
        g = pd.DataFrame({"x": x, "y": y, "one": np.int64(1)}) \
            .groupby(["x", "y"], sort=False).sum().reset_index()
        g["one"] = g["one"].astype(np.int64)
        return _strip(g)

    occ = (ds.map_batches(cells, batch_format="pyarrow")
             .groupby(["x", "y"]).aggregate(Sum("one",
                                                alias_name="one"))
             .to_pandas())
    x = occ["x"].to_numpy(np.int64)
    y = occ["y"].to_numpy(np.int64)

    def walk_cost(order: np.ndarray) -> int:
        xo, yo = x[order], y[order]
        return int((np.abs(np.diff(xo))
                    + np.abs(np.diff(yo))).sum())

    mc = walk_cost(np.argsort(_morton(x, y)))
    rc = walk_cost(np.lexsort((x, y)))
    r6 = _round6(np.array([float(mc) / float(rc)]))
    out = pd.DataFrame({"n_cells": [len(occ)], "morton_cost": [mc],
                        "rowmajor_cost": [rc], "ratio6": [r6[0]]})
    for col in ("n_cells", "morton_cost", "rowmajor_cost"):
        out[col] = out[col].astype(np.int64)
    return out


_MORTON_SQL = " + ".join(
    f"(((x >> {b}) & 1) << {2 * b}) + (((y >> {b}) & 1) << {2 * b + 1})"
    for b in range(6))

SQL_MORTON = f"""
WITH occ AS (
  SELECT DISTINCT
         (epoch_us(ts) % {_T_US}) // ({_T_US} // {_GRID}) AS x,
         user_id % {_GRID} AS y
  FROM events),
coded AS (SELECT x, y, {_MORTON_SQL} AS code FROM occ),
mw AS (
  SELECT abs(x - lag(x) OVER (ORDER BY code))
         + abs(y - lag(y) OVER (ORDER BY code)) AS c
  FROM coded),
rw AS (
  SELECT abs(x - lag(x) OVER (ORDER BY y, x))
         + abs(y - lag(y) OVER (ORDER BY y, x)) AS c
  FROM coded),
f AS (
  SELECT (SELECT count(*) FROM occ)::BIGINT AS n_cells,
         (SELECT sum(c) FROM mw)::BIGINT AS mc,
         (SELECT sum(c) FROM rw)::BIGINT AS rc)
SELECT n_cells, mc AS morton_cost, rc AS rowmajor_cost,
       round(CAST(mc AS DOUBLE) / CAST(rc AS DOUBLE), 6) AS ratio6
FROM f
"""


QUERIES171: dict[str, tuple] = {
    "ams_f2_users": (q_ams_f2_users, SQL_AMS_F2),
    "rice_golomb_postings": (q_rice_golomb_postings, SQL_RICE),
    "morton_locality": (q_morton_locality, SQL_MORTON),
}
