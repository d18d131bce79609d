"""Twenty-fifth oracle-query batch:

- mutual_info_source_lang: the mutual information I(source; lang) over the
  documents table — the information-theoretic DEPENDENCE scalar
  (complements js_divergence_sources' pairwise drift). Exact (source,
  lang) contingency cells from one scan; each cell's contribution
  (n/N)·ln(n·N/(n_s·n_l)) is finalized with the identical float64
  expression both sides, QUANTIZED per cell to 1e-12 integer units and
  summed exactly — float summation order cannot perturb the total.
- linear_interp_fill_daily: per-user daily grid with LINEAR interpolation
  between observations (the mathematically-real sibling of
  resample_ffill_daily's forward fill). Observation = last event value of
  the (user, day) by (ts, event_id); interior missing days interpolate
  prev + (next − prev)·gap/len from exact integer cents and day offsets;
  identical expression + round6 both sides. User-co-partitioned; inside a
  partition the prev/next observation indices come from one vectorized
  searchsorted over each user's dense day range.
- apriori_frequent_itemsets: frequent event-type itemsets of size 1–3
  at 25% user support (Agrawal/Srikant Apriori). The Ray side actually
  PRUNES: triple candidates are generated only from frequent pairs
  (downward closure), so the counting pass is bounded by surviving
  candidates; the SQL oracle brute-forces all triples — by the Apriori
  property the outputs are identical, which is exactly what the check
  pins. Support threshold compared as supp·4 ≥ n_users (integer
  cross-multiply, no float).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_PARTS = 64
_MI_SCALE = 1_000_000_000_000


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# mutual information I(source; lang)
# ---------------------------------------------------------------------------


def q_mutual_info_source_lang(sf_dir: str):
    """I(source; lang) in nats from the exact contingency table. One scan
    → O(sources × langs) cells; marginals and N come from the cell table;
    per-cell contributions quantized to 1e-12 units and summed as int64."""
    ds = _pq(sf_dir, "documents", columns=["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": t["source"].to_pylist(),
                           "lang": t["lang"].to_pylist()})
        g = df.groupby(["source", "lang"], sort=False) \
              .size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["source", "lang"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    n = cells["n"].to_numpy().astype(np.int64)
    N = int(n.sum())
    ns = cells.groupby("source")["n"].transform("sum").to_numpy().astype(np.int64)
    nl = cells.groupby("lang")["n"].transform("sum").to_numpy().astype(np.int64)
    contrib = (n.astype(np.float64) / N) \
        * np.log(n.astype(np.float64) * N / (ns.astype(np.float64) * nl))
    x = contrib * _MI_SCALE
    units = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)) \
        .astype(np.int64)
    mi6 = _round6(np.array([units.sum() / float(_MI_SCALE)]))
    return pd.DataFrame({"mi6": mi6,
                         "n_cells": np.array([len(cells)], np.int64),
                         "n_docs": np.array([N], np.int64)})


SQL_MI = f"""
WITH cells AS (
  SELECT source, lang, count(*)::BIGINT AS n FROM documents GROUP BY 1, 2),
tots AS (SELECT sum(n)::BIGINT AS nn, count(*)::BIGINT AS n_cells FROM cells),
ms AS (SELECT source, sum(n)::BIGINT AS ns FROM cells GROUP BY 1),
ml AS (SELECT lang, sum(n)::BIGINT AS nl FROM cells GROUP BY 1),
u AS (
  SELECT CAST(round((cells.n::DOUBLE / nn)
              * ln(cells.n::DOUBLE * nn / (ns::DOUBLE * nl))
              * {_MI_SCALE}) AS BIGINT) AS units
  FROM cells JOIN ms USING (source) JOIN ml USING (lang) CROSS JOIN tots)
SELECT round(sum(units)::BIGINT / {_MI_SCALE}.0, 6) AS mi6,
       (SELECT n_cells FROM tots) AS n_cells,
       (SELECT nn FROM tots) AS n_docs
FROM u
"""


# ---------------------------------------------------------------------------
# per-user daily linear interpolation fill
# ---------------------------------------------------------------------------


def q_linear_interp_fill_daily(sf_dir: str):
    """Per-user dense daily series between the user's first and last
    observation day; observed days carry the day's LAST event value (by
    ts, event_id); interior days linearly interpolate between bracketing
    observations. filled_c6 = round6 of the identical expression both
    sides (prev + (next − prev)·gap/len on exact integer cents/days)."""
    ds = _pq(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "day": pc.floor_temporal(t["ts"], unit="day").to_pandas(),
            "ts_us": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            "eid": t["event_id"].to_numpy(zero_copy_only=False),
            "c": _cents(t["value"]).to_numpy(zero_copy_only=False)})
        df = df.sort_values(["ts_us", "eid"], kind="mergesort")
        # per-(user, day) last-by-(ts, eid) witness — associative under a
        # later re-reduce because the witness key rides along
        g = df.groupby(["user_id", "day"], sort=False) \
              .agg(ts_us=("ts_us", "last"), eid=("eid", "last"),
                   c=("c", "last")).reset_index()
        g["gkey"] = (g["user_id"] % _PARTS).astype(np.int32)
        return _strip(g)

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        # final witness reduce (batch partials may split a (user, day))
        df = df.sort_values(["user_id", "day", "ts_us", "eid"],
                            kind="mergesort")
        df = df[~df.duplicated(["user_id", "day"], keep="last")]
        out_user, out_day, out_val = [], [], []
        for uid, grp in df.groupby("user_id", sort=False):
            days = grp["day"].to_numpy().astype("datetime64[D]").astype(np.int64)
            c = grp["c"].to_numpy().astype(np.int64)
            dense = np.arange(days[0], days[-1] + 1, dtype=np.int64)
            # bracketing observation for every dense day (vectorized)
            nxt = np.searchsorted(days, dense, side="left")
            prv = np.searchsorted(days, dense, side="right") - 1
            obs = days[prv] == dense
            pd_, nd_ = days[prv], days[nxt]
            pc_, nc_ = c[prv].astype(np.float64), c[nxt].astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                interp = pc_ + (nc_ - pc_) * (dense - pd_).astype(np.float64) \
                    / (nd_ - pd_).astype(np.float64)
            val = np.where(obs, c[prv].astype(np.float64), interp)
            out_user.append(np.full(len(dense), uid, np.int64))
            out_day.append(dense)
            out_val.append(_round6(val))
        return pd.DataFrame({
            "user_id": np.concatenate(out_user),
            "day": np.concatenate(out_day).astype("datetime64[D]")
            .astype("datetime64[us]"),
            "filled_c6": np.concatenate(out_val)})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("gkey").map_groups(fill, batch_format="pandas")
             .to_pandas())
    out["user_id"] = out["user_id"].astype(np.int64)
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


SQL_INTERP = """
WITH o AS (
  SELECT user_id, day, c FROM (
    SELECT user_id, date_trunc('day', ts) AS day,
           CAST(round(value * 100) AS BIGINT) AS c,
           row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1),
span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM o GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL '1 day')) AS day
  FROM span),
j AS (
  SELECT g.user_id, g.day, o.c
  FROM grid g LEFT JOIN o ON o.user_id = g.user_id AND o.day = g.day),
f AS (
  SELECT user_id, day, c,
    last_value(c IGNORE NULLS) OVER w_p AS pc,
    last_value(CASE WHEN c IS NOT NULL THEN day END IGNORE NULLS)
      OVER w_p AS pd,
    first_value(c IGNORE NULLS) OVER w_n AS nc,
    first_value(CASE WHEN c IS NOT NULL THEN day END IGNORE NULLS)
      OVER w_n AS nd
  FROM j
  WINDOW
    w_p AS (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_n AS (PARTITION BY user_id ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, day,
       round(CASE WHEN c IS NOT NULL THEN c::DOUBLE
             ELSE pc + (nc - pc) * date_diff('day', pd, day)::DOUBLE
                  / date_diff('day', pd, nd) END, 6) AS filled_c6
FROM f ORDER BY user_id, day
"""


# ---------------------------------------------------------------------------
# Apriori frequent itemsets (size 1-3, 25% user support)
# ---------------------------------------------------------------------------


def q_apriori_frequent_itemsets(sf_dir: str):
    """Frequent event-type itemsets at 25% user support, sizes 1–3. The
    distributed side applies the downward-closure pruning: triple
    candidates are generated ONLY from surviving frequent pairs and
    broadcast into the counting pass; the SQL oracle counts every triple
    unpruned — Apriori guarantees identical output, which the compare
    pins. Threshold as supp·4 ≥ n_users, exact integers."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pylist()}).drop_duplicates()
        df["gkey"] = (df["user_id"] % _PARTS).astype(np.int32)
        return _strip(df)

    def pair_cells(df: pd.DataFrame) -> pd.DataFrame:
        ut = df[["user_id", "event_type"]].drop_duplicates()
        singles = (ut.groupby("event_type", sort=False)
                     .size().reset_index(name="cnt"))
        singles["kind"] = np.int64(1)
        singles = singles.rename(columns={"event_type": "a"})
        singles["b"] = ""
        p = ut.merge(ut, on="user_id", suffixes=("_a", "_b"))
        p = p[p["event_type_a"] < p["event_type_b"]]
        pairs = (p.groupby(["event_type_a", "event_type_b"], sort=False)
                  .size().reset_index(name="cnt")
                  .rename(columns={"event_type_a": "a", "event_type_b": "b"}))
        pairs["kind"] = np.int64(2)
        tot = pd.DataFrame({"a": [""], "b": [""], "cnt":
                            [ut["user_id"].nunique()], "kind": [0]})
        out = pd.concat([singles[["a", "b", "cnt", "kind"]],
                         pairs[["a", "b", "cnt", "kind"]], tot],
                        ignore_index=True)
        out["cnt"] = out["cnt"].astype(np.int64)
        out["kind"] = out["kind"].astype(np.int64)
        return out

    base = ds.map_batches(partial, batch_format="pyarrow")
    cells = (base.groupby("gkey").map_groups(pair_cells,
                                             batch_format="pandas")
                 .to_pandas()
                 .groupby(["a", "b", "kind"])["cnt"].sum().reset_index())
    nu = int(cells.loc[cells["kind"] == 0, "cnt"].iloc[0])
    f1 = cells[(cells["kind"] == 1) & (cells["cnt"] * 4 >= nu)]
    f2 = cells[(cells["kind"] == 2) & (cells["cnt"] * 4 >= nu)]
    freq_pairs = set(zip(f2["a"], f2["b"]))
    freq_singles = set(f1["a"])
    # downward-closure candidate triples from frequent pairs only
    cand = sorted({tuple(sorted({a, b, c}))
                   for (a, b) in freq_pairs for c in freq_singles
                   if c not in (a, b)
                   and (min(a, c), max(a, c)) in freq_pairs
                   and (min(b, c), max(b, c)) in freq_pairs})
    rows = [(a, np.int64(1), int(s)) for a, s in zip(f1["a"], f1["cnt"])]
    rows += [(f"{a},{b}", np.int64(2), int(s))
             for a, b, s in zip(f2["a"], f2["b"], f2["cnt"])]
    if cand:
        cand_set = set(cand)

        def triple_cells(df: pd.DataFrame) -> pd.DataFrame:
            ut = df[["user_id", "event_type"]].drop_duplicates()
            counts: dict[tuple, int] = {}
            for _, grp in ut.groupby("user_id", sort=False):
                tys = sorted(grp["event_type"])
                for tri in combinations(tys, 3):
                    if tri in cand_set:
                        counts[tri] = counts.get(tri, 0) + 1
            if not counts:
                return pd.DataFrame({"tri": pd.Series([], dtype=object),
                                     "cnt": pd.Series([], dtype=np.int64)})
            ks, vs = zip(*sorted(counts.items()))
            return pd.DataFrame({"tri": [",".join(k) for k in ks],
                                 "cnt": np.array(vs, np.int64)})

        tri = (base.groupby("gkey").map_groups(triple_cells,
                                               batch_format="pandas")
                   .to_pandas().groupby("tri")["cnt"].sum().reset_index())
        tri = tri[tri["cnt"] * 4 >= nu]
        rows += [(t, np.int64(3), int(s))
                 for t, s in zip(tri["tri"], tri["cnt"])]
    out = pd.DataFrame(rows, columns=["itemset", "size", "supp"])
    out["size"] = out["size"].astype(np.int64)
    out["supp"] = out["supp"].astype(np.int64)
    return out.sort_values(["size", "itemset"]).reset_index(drop=True)


SQL_APRIORI = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT count(DISTINCT user_id) AS n FROM ut),
s1 AS (SELECT event_type AS a, count(*)::BIGINT AS supp FROM ut GROUP BY 1),
s2 AS (
  SELECT a.event_type AS a, b.event_type AS b, count(*)::BIGINT AS supp
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2),
s3 AS (
  SELECT a.event_type AS a, b.event_type AS b, c.event_type AS c,
         count(*)::BIGINT AS supp
  FROM ut a
  JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  JOIN ut c ON b.user_id = c.user_id AND b.event_type < c.event_type
  GROUP BY 1, 2, 3)
SELECT itemset, size, supp FROM (
  SELECT a AS itemset, 1::BIGINT AS size, supp
  FROM s1 CROSS JOIN nu WHERE supp * 4 >= n
  UNION ALL
  SELECT a || ',' || b, 2::BIGINT, supp
  FROM s2 CROSS JOIN nu WHERE supp * 4 >= n
  UNION ALL
  SELECT a || ',' || b || ',' || c, 3::BIGINT, supp
  FROM s3 CROSS JOIN nu WHERE supp * 4 >= n)
ORDER BY size, itemset
"""


QUERIES25: dict[str, tuple] = {
    "mutual_info_source_lang": (q_mutual_info_source_lang, SQL_MI),
    "linear_interp_fill_daily": (q_linear_interp_fill_daily, SQL_INTERP),
    "apriori_frequent_itemsets": (q_apriori_frequent_itemsets, SQL_APRIORI),
}
