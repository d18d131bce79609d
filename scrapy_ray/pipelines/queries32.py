"""Thirty-second oracle-query batch — collaborative filtering / weighted
holistic aggregates / seasonal decomposition:

- item_cooccurrence_cf: the classic item-item collaborative-filtering
  primitive over purchase baskets — parts bought by the same customer,
  ranked by cosine similarity c12/√(c1·c2) of their customer sets,
  top-20. The lineitem⋈orders edge is a native Dataset.join; baskets
  dedup + pair emission + part marginals all ride ONE customer-salted
  shuffle (marginal rows are (part, −1) sentinels on the pair stream);
  similarity is ranked on a micro-quantized integer key (the rrf/bm25
  precedent) so float noise cannot reorder the top-k. Per-customer pair
  emission is O(basket²) — bounded at this schema's basket sizes; on
  heavy-tailed baskets the standard cap (drop/cap super-customers, log
  the count) applies.
- weighted_median_price_by_status: quantity-weighted median extended
  price per linestatus — the weighted-quantile holistic aggregate.
  (status, price-cent) weight cells bound the shuffle by the price
  domain; the median is the smallest cent whose cumulative weight
  reaches (W+1)//2 — an ALL-INTEGER threshold (no float ceil(q·W) at
  any weight scale), mirrored verbatim in SQL window form.
- stl_weekly_decomposition: STL-lite decomposition of the dense daily
  event-count series into trend (centered 7-day moving average),
  day-of-week seasonal (mean of detrended), and residual. All
  intermediates are integers (detrended is scaled by 7: 7y − T7), so
  the three reported floats finalize from exact ints with textually
  identical expressions both sides; interior-window days only (count
  window = 7). The distributed part is the O(days) daily-count cell
  shuffle (domain-bounded, the autocorr/theil_sen precedent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_CF_TOP = 20
_CF_SALT = 64
_US_PER_DAY = 86_400_000_000


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _get(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


# ---------------------------------------------------------------------------
# item-item co-occurrence CF
# ---------------------------------------------------------------------------


_CF_PACK = 1 << 31          # partkey < 2^31: (p1, p2) packs into one int64


def _cf_baskets(sf_dir: str):
    li = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    od = _pq(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j = li.join(od, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def cp_partial(t: pa.Table) -> pa.Table:
        cust = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        assert part.size == 0 or int(part.max()) < _CF_PACK
        df = pd.DataFrame({"cust": cust, "part": part}) \
            .drop_duplicates(["cust", "part"])
        return _strip(df)

    # Materialize the (cust, part) edge table ONCE — both CF passes
    # (marginals, pair codes) consume it; without this the lazy join
    # would execute twice (measured 8.1 s -> 4.4 s warm at sf0.1).
    # O(edges) object-store residency; Ray spills to disk at scale.
    return j.map_batches(cp_partial, batch_format="pyarrow").materialize()


def q_item_cooccurrence_cf(sf_dir: str):
    """Top-20 part pairs by customer-set cosine (docstring above).
    Pass 1: part-salted exact distinct-customer counts -> O(parts)
    broadcast (dim-sized). Pass 2: customer-salted basket dedup emits
    PACKED pair codes (one int64 per pair — halves the shuffle payload);
    pair-hash partitions count codes vectorized (np.unique), score with
    the broadcast marginals, and keep a partial top-20 each — the driver
    merges O(partitions × 20) rows, never the O(Σ basket²) pair table."""
    m = _cf_baskets(sf_dir)

    # pass 1: marginals (part -> distinct customers), part-salted dedup
    def psalt(t: pa.Table) -> pa.Table:
        part = t["part"].to_numpy(zero_copy_only=False)
        return pa.table({"cust": t["cust"], "part": t["part"],
                         "mk": pa.array((part % _CF_SALT).astype(np.int64))})

    def pcount(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["cust", "part"]).groupby("part", sort=False) \
            .size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return g

    marg = (m.map_batches(psalt, batch_format="pyarrow")
            .groupby("mk").map_groups(pcount, batch_format="pandas")
            .to_pandas())
    order = np.argsort(marg["part"].to_numpy().astype(np.int64),
                       kind="stable")
    mkeys = marg["part"].to_numpy().astype(np.int64)[order]
    mvals = marg["c"].to_numpy().astype(np.int64)[order]
    marg_ref = ray.put((mkeys, mvals))

    # pass 2: pair codes from customer-co-partitioned baskets
    def csalt(t: pa.Table) -> pa.Table:
        cust = t["cust"].to_numpy(zero_copy_only=False)
        return pa.table({"cust": t["cust"], "part": t["part"],
                         "ck": pa.array((cust % _CF_SALT).astype(np.int64))})

    def pair_codes(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["cust", "part"]).sort_values(["cust", "part"])
        cust = df["cust"].to_numpy()
        part = df["part"].to_numpy()
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        ends = np.r_[starts[1:], len(cust)]
        codes = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ps = part[s:e]                             # sorted basket
            ii, jj = np.triu_indices(len(ps), k=1)
            codes.append(ps[ii] * _CF_PACK + ps[jj])
        code = np.concatenate(codes) if codes else np.array([], np.int64)
        return pd.DataFrame({"code": code,
                             "pk": (code % _CF_SALT).astype(np.int64)})

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        mk, mv = _get(marg_ref)
        code, c12 = np.unique(df["code"].to_numpy(np.int64),
                              return_counts=True)
        if not len(code):
            return pd.DataFrame({
                "p1": pd.Series([], dtype=np.int64),
                "p2": pd.Series([], dtype=np.int64),
                "c12": pd.Series([], dtype=np.int64),
                "c1": pd.Series([], dtype=np.int64),
                "c2": pd.Series([], dtype=np.int64),
                "simq": pd.Series([], dtype=np.int64),
                "sim6": pd.Series([], dtype=np.float64)})
        p1 = code // _CF_PACK
        p2 = code % _CF_PACK
        c12 = c12.astype(np.int64)
        c1 = mv[np.searchsorted(mk, p1)]
        c2 = mv[np.searchsorted(mk, p2)]
        sim = c12 / np.sqrt(c1.astype(np.float64) * c2)
        simq = (np.sign(sim) * np.floor(np.abs(sim) * 1e12 + 0.5)) \
            .astype(np.int64)
        out = pd.DataFrame({"p1": p1, "p2": p2, "c12": c12, "c1": c1,
                            "c2": c2, "simq": simq, "sim6": _round6(sim)})
        return out.sort_values(["simq", "p1", "p2"],
                               ascending=[False, True, True],
                               kind="mergesort").head(_CF_TOP)

    parts = (m.map_batches(csalt, batch_format="pyarrow")
             .groupby("ck").map_groups(pair_codes, batch_format="pandas")
             .groupby("pk").map_groups(score_topk, batch_format="pandas")
             .to_pandas())
    out = parts.sort_values(["simq", "p1", "p2"],
                            ascending=[False, True, True], kind="mergesort") \
        .head(_CF_TOP).drop(columns=["simq"]).reset_index(drop=True)
    for c in ("p1", "p2", "c12", "c1", "c2"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_CF = f"""
WITH b AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
m AS (SELECT part, count(*)::BIGINT AS c FROM b GROUP BY 1),
p AS (
  SELECT b1.part AS p1, b2.part AS p2, count(*)::BIGINT AS c12
  FROM b b1 JOIN b b2 ON b1.cust = b2.cust AND b1.part < b2.part
  GROUP BY 1, 2),
s AS (
  SELECT p1, p2, c12, m1.c AS c1, m2.c AS c2,
         c12 / sqrt(m1.c::DOUBLE * m2.c) AS sim,
         CAST(round(c12 / sqrt(m1.c::DOUBLE * m2.c) * 1e12) AS BIGINT)
           AS simq
  FROM p JOIN m m1 ON m1.part = p.p1 JOIN m m2 ON m2.part = p.p2)
SELECT p1, p2, c12, c1, c2, round(sim, 6) AS sim6
FROM s ORDER BY simq DESC, p1, p2 LIMIT {_CF_TOP}
"""


# ---------------------------------------------------------------------------
# weighted median
# ---------------------------------------------------------------------------


def q_weighted_median_price_by_status(sf_dir: str):
    """Quantity-weighted median extended price per linestatus (docstring
    above)."""
    ds = _pq(sf_dir, "lineitem",
             columns=["l_linestatus", "l_extendedprice", "l_quantity"])

    def cpart(t: pa.Table) -> pa.Table:
        st = np.asarray(t["l_linestatus"].to_pylist())
        cent = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        w = _cents(t["l_quantity"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"status": st, "cent": cent, "w": w})
        g = df.groupby(["status", "cent"], sort=False)["w"].sum() \
            .reset_index()
        g["w"] = g["w"].astype(np.int64)
        g["sk"] = (g["cent"] % _CF_SALT).astype(np.int64)
        return _strip(g)

    # Salted coarse partitions + in-partition pandas sum — Ray's sort-based
    # multi-key aggregate over ~1M (status, cent) cells costs 6.8 s at
    # sf0.1; this shape is the CLAUDE.md salted-partition rule (3.3 s).
    def csum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["status", "cent"], sort=False)["w"].sum() \
            .reset_index()
        g["w"] = g["w"].astype(np.int64)
        return g

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby("sk").map_groups(csum, batch_format="pandas")
               .to_pandas())
    rows = []
    for st in sorted(cells["status"].unique()):
        sub = cells[cells["status"] == st].sort_values("cent")
        cent = sub["cent"].to_numpy().astype(np.int64)
        w = sub["w"].to_numpy().astype(np.int64)
        W = int(w.sum())
        thr = (W + 1) // 2                         # all-integer threshold
        cum = np.cumsum(w)
        med = int(cent[np.searchsorted(cum, thr, side="left")])
        rows.append((st, W, med))
    out = pd.DataFrame(rows, columns=["status", "w_total", "med_cent"])
    for c in ("w_total", "med_cent"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_WMED = """
WITH c AS (
  SELECT l_linestatus AS status,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cent,
         sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS w
  FROM lineitem GROUP BY 1, 2),
t AS (SELECT status, sum(w)::BIGINT AS W FROM c GROUP BY 1),
cum AS (
  SELECT status, cent,
         CAST(sum(w) OVER (PARTITION BY status ORDER BY cent) AS BIGINT)
           AS cw
  FROM c)
SELECT t.status, t.W AS w_total, min(cum.cent)::BIGINT AS med_cent
FROM cum JOIN t ON cum.status = t.status
WHERE cw >= (W + 1) // 2
GROUP BY 1, 2 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# STL-lite weekly decomposition
# ---------------------------------------------------------------------------


def q_stl_weekly_decomposition(sf_dir: str):
    """Trend / day-of-week seasonal / residual of daily event counts
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["ts"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day_idx": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    dc = (ds.map_batches(dpart, batch_format="pyarrow")
            .groupby("day_idx").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas().sort_values("day_idx").reset_index(drop=True))
    lo = int(dc["day_idx"].min())
    hi = int(dc["day_idx"].max())
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    y = np.zeros(len(grid), np.int64)
    y[dc["day_idx"].to_numpy().astype(np.int64) - lo] = \
        dc["cnt"].to_numpy().astype(np.int64)
    if len(grid) < 7:
        return pd.DataFrame({
            "day_idx": pd.Series([], dtype=np.int64),
            "dow": pd.Series([], dtype=np.int64),
            "y": pd.Series([], dtype=np.int64),
            "trend6": pd.Series([], dtype=np.float64),
            "seasonal6": pd.Series([], dtype=np.float64),
            "resid6": pd.Series([], dtype=np.float64)})
    # centered 7-day sums on interior days (full windows only)
    cs = np.concatenate([[0], np.cumsum(y)])
    t7 = cs[7:] - cs[:-7]                          # sum over [d-3, d+3]
    days_i = grid[3:len(grid) - 3]
    y_i = y[3:len(grid) - 3]
    dow = (days_i + 3) % 7
    det = 7 * y_i - t7                             # detrended, scaled by 7
    snum = np.zeros(7, dtype=np.int64)
    ncnt = np.zeros(7, dtype=np.int64)
    np.add.at(snum, dow, det)
    np.add.at(ncnt, dow, 1)
    sn = snum[dow].astype(np.float64)
    nn = ncnt[dow].astype(np.float64)
    trend6 = _round6(t7 / 7.0)
    seasonal6 = _round6(sn / (7.0 * nn))
    resid6 = _round6(y_i - t7 / 7.0 - sn / (7.0 * nn))
    return pd.DataFrame({"day_idx": days_i, "dow": dow.astype(np.int64),
                         "y": y_i, "trend6": trend6,
                         "seasonal6": seasonal6, "resid6": resid6})


SQL_STL = f"""
WITH dc AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
bounds AS (SELECT min(day_idx) AS lo, max(day_idx) AS hi FROM dc),
cal AS (
  SELECT unnest(generate_series(lo, hi)) AS day_idx FROM bounds),
y AS (
  SELECT cal.day_idx, coalesce(dc.cnt, 0)::BIGINT AS y
  FROM cal LEFT JOIN dc ON dc.day_idx = cal.day_idx),
w AS (
  SELECT day_idx, y,
         CAST(sum(y) OVER (ORDER BY day_idx
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS t7,
         count(*) OVER (ORDER BY day_idx
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nw
  FROM y),
i AS (
  SELECT day_idx, y, t7, ((day_idx + 3) % 7)::BIGINT AS dow
  FROM w WHERE nw = 7),
s AS (
  SELECT dow, sum(7 * y - t7)::BIGINT AS snum, count(*)::BIGINT AS n
  FROM i GROUP BY 1)
SELECT i.day_idx, i.dow, i.y,
       round(t7 / 7.0, 6) AS trend6,
       round(snum / (7.0 * n), 6) AS seasonal6,
       round(y - t7 / 7.0 - snum / (7.0 * n), 6) AS resid6
FROM i JOIN s ON s.dow = i.dow ORDER BY i.day_idx
"""


QUERIES32: dict[str, tuple] = {
    "item_cooccurrence_cf": (q_item_cooccurrence_cf, SQL_CF),
    "weighted_median_price_by_status": (q_weighted_median_price_by_status,
                                        SQL_WMED),
    "stl_weekly_decomposition": (q_stl_weekly_decomposition, SQL_STL),
}
