"""Thirty-first oracle-query batch — parametric hypothesis testing / robust
regression:

- welch_ttest_click_purchase: Welch's unequal-variance t-test between the
  ``value`` distributions of click vs purchase events. ONE scan emits
  per-batch integer-cents moment partials (n, Σc, Σc²) — O(blocks × 2)
  rows combined at the driver with Python-int arbitrary precision (the
  cov_matrix discipline, so Σc² cannot overflow at any row count); the
  t statistic and Welch–Satterthwaite df finalize from the exact integer
  moments with textually identical float expressions both sides, round6.
- theil_sen_daily: Theil–Sen robust trend estimator over the daily event
  count series — the median of all pairwise slopes. The distributed part
  is the O(days)-cell count shuffle (domain-bounded, the autocorr/holt
  precedent); the O(days²) pairwise slopes and the median live on the
  driver's tiny cell table. Median = DuckDB quantile_disc semantics
  (1-based rank ceil(q·n) of the ascending sort — CLAUDE.md rule),
  mirrored exactly; slopes are identical IEEE divisions both sides.
- phrase_search_top_bigram: inverted-index-style phrase search — the
  globally most frequent bigram over the exact top-K vocabulary (bigram
  cell shuffle bounded O(K²), the pmi discipline) followed by a
  shuffle-free positional search scan emitting (doc_id, n_occ) for every
  matching document.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_US_PER_DAY = 86_400_000_000


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# Welch's t-test
# ---------------------------------------------------------------------------


def q_welch_ttest_click_purchase(sf_dir: str):
    """Welch t between click (group 0) and purchase (group 1) values
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def mpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        keep = (et == "click") | (et == "purchase")
        g = (et[keep] == "purchase").astype(np.int64)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)[keep]
        rows = {"g": [], "n": [], "s": [], "s2": []}
        for gi in (0, 1):
            x = c[g == gi]
            rows["g"].append(gi)
            rows["n"].append(len(x))
            # int64 is safe inside one batch (|c| <= ~1e7 cents, batch <=
            # ~1e5 rows); the overflow-proof part is the Python-int combine
            # at the driver
            rows["s"].append(int(x.sum()))
            rows["s2"].append(int((x * x).sum()))
        return pa.table({"g": pa.array(rows["g"], pa.int64()),
                         "n": pa.array(rows["n"], pa.int64()),
                         "s": pa.array(rows["s"], pa.int64()),
                         "s2": pa.array(rows["s2"], pa.int64())})

    parts = ds.map_batches(mpart, batch_format="pyarrow").to_pandas()
    mom = {}
    for gi in (0, 1):
        sub = parts[parts["g"] == gi]
        mom[gi] = (int(sub["n"].sum()),
                   int(sub["s"].sum()),
                   sum(int(v) for v in sub["s2"]))   # Python-int exact
    n1, s1, q1 = mom[0]
    n2, s2_, q2 = mom[1]
    # identical float expressions both sides (cents units; t and df are
    # scale-invariant)
    m1 = np.float64(s1) / n1
    m2 = np.float64(s2_) / n2
    v1 = (np.float64(q1) - np.float64(s1) * s1 / n1) / (n1 - 1)
    v2 = (np.float64(q2) - np.float64(s2_) * s2_ / n2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t_ = (m1 - m2) / np.sqrt(se2)
    df_ = se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                       + (v2 / n2) * (v2 / n2) / (n2 - 1))
    return pd.DataFrame({
        "n1": np.array([n1], np.int64), "n2": np.array([n2], np.int64),
        "mean1_6": _round6(np.array([m1])),
        "mean2_6": _round6(np.array([m2])),
        "t6": _round6(np.array([t_])), "df6": _round6(np.array([df_]))})


SQL_WELCH = """
WITH b AS (
  SELECT (event_type = 'purchase')::INT AS g,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'purchase')),
m AS (
  SELECT g, count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
         sum(c * c)::BIGINT AS s2
  FROM b GROUP BY 1),
w AS (
  SELECT max(CASE WHEN g = 0 THEN n END)::BIGINT AS n1,
         max(CASE WHEN g = 0 THEN s END)::BIGINT AS s1,
         max(CASE WHEN g = 0 THEN s2 END)::BIGINT AS q1,
         max(CASE WHEN g = 1 THEN n END)::BIGINT AS n2,
         max(CASE WHEN g = 1 THEN s END)::BIGINT AS s2_,
         max(CASE WHEN g = 1 THEN s2 END)::BIGINT AS q2
  FROM m),
f AS (
  SELECT n1, n2,
         s1::DOUBLE / n1 AS m1, s2_::DOUBLE / n2 AS m2,
         (q1::DOUBLE - s1::DOUBLE * s1 / n1) / (n1 - 1) AS v1,
         (q2::DOUBLE - s2_::DOUBLE * s2_ / n2) / (n2 - 1) AS v2
  FROM w),
g AS (SELECT *, v1 / n1 + v2 / n2 AS se2 FROM f)
SELECT n1, n2, round(m1, 6) AS mean1_6, round(m2, 6) AS mean2_6,
       round((m1 - m2) / sqrt(se2), 6) AS t6,
       round(se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                          + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df6
FROM g
"""


# ---------------------------------------------------------------------------
# Theil–Sen robust slope
# ---------------------------------------------------------------------------


def q_theil_sen_daily(sf_dir: str):
    """Median-of-pairwise-slopes trend of daily event counts (docstring
    above)."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "events", columns=["ts"])

    def dpart(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // _US_PER_DAY)
        u, c = np.unique(day, return_counts=True)
        return pa.table({"day_idx": pa.array(u.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    days = (ds.map_batches(dpart, batch_format="pyarrow")
              .groupby("day_idx").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values("day_idx").reset_index(drop=True))
    d = days["day_idx"].to_numpy().astype(np.int64)
    c = days["cnt"].to_numpy().astype(np.int64)
    ii, jj = np.triu_indices(len(d), k=1)
    slopes = (c[jj] - c[ii]).astype(np.float64) / (d[jj] - d[ii])
    slopes.sort()
    m = len(slopes)
    med = slopes[int(np.ceil(0.5 * m)) - 1]       # quantile_disc rank walk
    return pd.DataFrame({"n_pairs": np.array([m], np.int64),
                         "slope6": _round6(np.array([med]))})


SQL_THEIL = f"""
WITH d AS (
  SELECT CAST(epoch_us(ts) // {_US_PER_DAY} AS BIGINT) AS day_idx,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1),
p AS (
  SELECT (b.cnt - a.cnt)::DOUBLE / (b.day_idx - a.day_idx) AS slope
  FROM d a JOIN d b ON a.day_idx < b.day_idx)
SELECT count(*)::BIGINT AS n_pairs, round(quantile_disc(slope, 0.5), 6) AS slope6
FROM p
"""


# ---------------------------------------------------------------------------
# phrase search (inverted bigram postings)
# ---------------------------------------------------------------------------

_PS_K = 64


def q_phrase_search_top_bigram(sf_dir: str):
    """Phrase search: pick the globally most frequent bigram over the
    exact top-K vocabulary (count desc, then lexicographic — the pmi
    boundedness discipline: the bigram cell shuffle is O(K²) regardless
    of corpus size), then run the positional search scan for that exact
    two-token phrase — shuffle-free, each doc counts its adjacent-pair
    occurrences locally. Output: one row per matching doc
    (doc_id, w1, w2, n_occ)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for s in t["text"].to_pylist():
            toks.extend(s.split())
        if not toks:
            return pa.table({"w": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        w, n = np.unique(np.asarray(toks), return_counts=True)
        return pa.table({"w": pa.array(w, pa.string()),
                         "n": pa.array(n.astype(np.int64))})

    ucnt = (_pq(sf_dir, "documents", columns=["text"])
            .map_batches(uni_partial, batch_format="pyarrow")
            .groupby("w").aggregate(Sum("n", alias_name="n")))

    def top_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"w": t["w"].to_pylist(),
                           "n": t["n"].to_numpy(zero_copy_only=False)
                           .astype(np.int64)})
        return _strip(df.sort_values(["n", "w"], ascending=[False, True])
                      .head(_PS_K))

    parts = (ucnt.map_batches(top_partial, batch_format="pyarrow")
                 .to_pandas()
                 .sort_values(["n", "w"], ascending=[False, True])
                 .head(_PS_K))
    top = np.sort(np.asarray(parts["w"].to_list()))
    top_ref = _ray.put(top)

    def bg_partial(t: pa.Table) -> pa.Table:
        tk = _ray.get(top_ref) if isinstance(top_ref, _ray.ObjectRef) \
            else top_ref
        w1_l: list[str] = []
        w2_l: list[str] = []
        for s in t["text"].to_pylist():
            ts = s.split()
            if len(ts) >= 2:
                w1_l.extend(ts[:-1])
                w2_l.extend(ts[1:])
        if not w1_l:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        w1 = np.asarray(w1_l)
        w2 = np.asarray(w2_l)
        p1 = np.searchsorted(tk, w1)
        p2 = np.searchsorted(tk, w2)
        keep = ((p1 < len(tk)) & (tk[np.minimum(p1, len(tk) - 1)] == w1)
                & (p2 < len(tk)) & (tk[np.minimum(p2, len(tk) - 1)] == w2))
        if not keep.any():
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        code = p1[keep] * len(tk) + p2[keep]
        u, c = np.unique(code, return_counts=True)
        return pa.table({"w1": pa.array(tk[u // len(tk)], pa.string()),
                         "w2": pa.array(tk[u % len(tk)], pa.string()),
                         "n": pa.array(c.astype(np.int64))})

    bcnt = (ds.map_batches(bg_partial, batch_format="pyarrow")
              .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
              .to_pandas()
              .sort_values(["n", "w1", "w2"],
                           ascending=[False, True, True], kind="mergesort"))
    bw1, bw2 = str(bcnt.iloc[0]["w1"]), str(bcnt.iloc[0]["w2"])

    def search(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_id, out_n = [], []
        for i, s in enumerate(t["text"].to_pylist()):
            ts = s.split()
            cnt = sum(1 for a, b in zip(ts[:-1], ts[1:])
                      if a == bw1 and b == bw2)
            if cnt:
                out_id.append(int(ids[i]))
                out_n.append(cnt)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "w1": pa.array([bw1] * len(out_id), pa.string()),
            "w2": pa.array([bw2] * len(out_id), pa.string()),
            "n_occ": pa.array(out_n, pa.int64())})

    return ds.map_batches(search, batch_format="pyarrow")


SQL_PHRASE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents),
u AS (SELECT unnest(ts) AS w FROM toks),
cnt AS (SELECT w, count(*)::BIGINT AS n FROM u GROUP BY 1),
topk AS (SELECT w FROM cnt ORDER BY n DESC, w LIMIT {_PS_K}),
pos AS (SELECT doc_id, unnest(range(1, len(ts))) AS i, ts FROM toks),
bg AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2 FROM pos),
bcnt AS (
  SELECT w1, w2, count(*)::BIGINT AS n FROM bg
  WHERE w1 IN (SELECT w FROM topk) AND w2 IN (SELECT w FROM topk)
  GROUP BY 1, 2),
best AS (SELECT w1, w2 FROM bcnt ORDER BY n DESC, w1, w2 LIMIT 1)
SELECT b.doc_id, b.w1, b.w2, count(*)::BIGINT AS n_occ
FROM bg b JOIN best ON b.w1 = best.w1 AND b.w2 = best.w2
GROUP BY 1, 2, 3 ORDER BY 1
"""


QUERIES31: dict[str, tuple] = {
    "welch_ttest_click_purchase": (q_welch_ttest_click_purchase, SQL_WELCH),
    "theil_sen_daily": (q_theil_sen_daily, SQL_THEIL),
    "phrase_search_top_bigram": (q_phrase_search_top_bigram, SQL_PHRASE),
}
