"""Tenth oracle-query batch —

- GROUP BY CUBE over (status, priority): the ROLLUP pattern completed to
  all 2^k margins; ONE distributed fine-granularity groupby, every coarser
  level re-aggregated driver-side from the tiny cell table;
- grouped median absolute deviation (robust statistics): median AND MAD
  per group from ONE distributed value histogram — the MAD histogram is
  the median-centered FOLD of the value histogram, so the second quantile
  pass needs no second scan of the fact table;
- per-user latest-N events (recent-history feature extraction): mergeable
  row-level top-N — each batch pre-prunes to its own per-user newest N, so
  the shuffle carries O(N x users-per-batch) rows, never the event log.

All DuckDB-oracle-checked on the same parquet inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_P = 64


# ---------------------------------------------------------------------------
# GROUP BY CUBE
# ---------------------------------------------------------------------------


def q_revenue_cube(sf_dir: str):
    """CUBE(status, priority): cell + per-status + per-priority + grand
    total, 'ALL' as the rolled-up sentinel (same conventions as
    q_revenue_rollup, which covers the ROLLUP subset of margins). Scale
    shape: one distributed groupby at the finest granularity; all 2^k - 1
    coarser margins re-aggregate driver-side from the O(cells) table."""
    ds = _pq(sf_dir, "orders",
             ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "o_orderpriority": t["o_orderpriority"],
            "pc": _cents(t["o_totalprice"]),
        }).to_pandas()
        g = (df.groupby(["o_orderstatus", "o_orderpriority"])
               .agg(n_orders=("pc", "size"), sum_price_cents=("pc", "sum"))
               .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    fine = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["o_orderstatus", "o_orderpriority"])
              .aggregate(Sum("n_orders", alias_name="n_orders"),
                         Sum("sum_price_cents", alias_name="sum_price_cents")))
    df = fine.to_pandas()   # tiny: one row per (status, priority) cell

    margins = [df]
    for keep, drop in (("o_orderstatus", "o_orderpriority"),
                       ("o_orderpriority", "o_orderstatus")):
        m = df.groupby(keep, as_index=False)[["n_orders", "sum_price_cents"]].sum()
        m[drop] = "ALL"
        margins.append(m)
    margins.append(pd.DataFrame({
        "o_orderstatus": ["ALL"], "o_orderpriority": ["ALL"],
        "n_orders": [df["n_orders"].sum()],
        "sum_price_cents": [df["sum_price_cents"].sum()]}))
    out = pd.concat(margins, ignore_index=True)
    for c in ("n_orders", "sum_price_cents"):
        out[c] = out[c].astype(np.int64)
    return (out[["o_orderstatus", "o_orderpriority", "n_orders",
                 "sum_price_cents"]]
            .sort_values(["o_orderstatus", "o_orderpriority"])
            .reset_index(drop=True))


SQL_REVENUE_CUBE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COUNT(*)::BIGINT AS n_orders,
       SUM(CAST(round(o_totalprice*100) AS BIGINT))::BIGINT AS sum_price_cents
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


# ---------------------------------------------------------------------------
# grouped median absolute deviation (one histogram, folded)
# ---------------------------------------------------------------------------


def _rank_disc(vals: np.ndarray, cnts: np.ndarray, q: float) -> int:
    """quantile_disc semantics on a (sorted values, counts) histogram:
    the element at 1-based rank ceil(q * n)."""
    n = int(cnts.sum())
    r = int(np.ceil(q * n))
    return int(vals[np.searchsorted(np.cumsum(cnts), r)])


def q_mad_order_value(sf_dir: str):
    """Median + median-absolute-deviation of order value per status, from
    ONE distributed histogram: per-batch (status, cents) partial counts ->
    one tiny groupby -> the driver takes the discrete median per group,
    then FOLDS the same histogram around it (|c - med| merges mirror-image
    cells) and takes the discrete median of the fold — MAD without a
    second pass over the fact table, exact integers end to end. The cell
    count is bounded by the value domain (the value_quantiles bound), so
    driver work is O(distinct cents), never O(rows)."""
    ds = _pq(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"s": t["o_orderstatus"],
                       "c": _cents(t["o_totalprice"])}).to_pandas()
        g = df.groupby(["s", "c"]).size().rename("cnt").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    hist = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["s", "c"]).aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas().sort_values(["s", "c"]))

    rows = []
    for s, g in hist.groupby("s", sort=True):
        vals = g["c"].to_numpy(dtype=np.int64)
        cnts = g["cnt"].to_numpy(dtype=np.int64)
        med = _rank_disc(vals, cnts, 0.5)
        folded = pd.DataFrame({"d": np.abs(vals - med), "cnt": cnts}) \
            .groupby("d")["cnt"].sum().reset_index().sort_values("d")
        mad = _rank_disc(folded["d"].to_numpy(dtype=np.int64),
                         folded["cnt"].to_numpy(dtype=np.int64), 0.5)
        rows.append({"o_orderstatus": s, "n_orders": int(cnts.sum()),
                     "median_cents": med, "mad_cents": mad})
    out = pd.DataFrame(rows)
    for c in ("n_orders", "median_cents", "mad_cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


SQL_MAD = """
WITH x AS (
  SELECT o_orderstatus AS s,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
m AS (SELECT s, quantile_disc(c, 0.5) AS med FROM x GROUP BY 1)
SELECT x.s AS o_orderstatus,
       COUNT(*)::BIGINT AS n_orders,
       ANY_VALUE(m.med)::BIGINT AS median_cents,
       quantile_disc(abs(x.c - m.med), 0.5)::BIGINT AS mad_cents
FROM x JOIN m USING (s)
GROUP BY x.s
ORDER BY x.s
"""


# ---------------------------------------------------------------------------
# per-user latest-N events (mergeable row-level top-N)
# ---------------------------------------------------------------------------

_LATEST_N = 3


def q_latest_events_per_user(sf_dir: str):
    """Each user's newest 3 events by (ts, event_id) — the recent-history
    feature-extraction primitive. Mergeable top-N at the ROW level: every
    batch prunes to its own per-user newest 3 BEFORE the shuffle (top-N of
    a union = top-N of per-part top-Ns), so the user-keyed exchange carries
    at most 3 x (users in batch) rows; the partition pass re-sorts the
    surviving few and assigns rn. Oracle = ROW_NUMBER window."""
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts"])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            ascending=[True, False, False], kind="mergesort")
        df = df.groupby("user_id", sort=False).head(_LATEST_N)
        df["gkey"] = (df["user_id"].to_numpy() % _P).astype(np.int32)
        return df

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            ascending=[True, False, False], kind="mergesort")
        df = df.groupby("user_id", sort=False).head(_LATEST_N).copy()
        df["rn"] = df.groupby("user_id", sort=False).cumcount() + 1
        return df[["user_id", "rn", "event_id", "ts"]]

    out = (ds.map_batches(prune, batch_format="pandas")
             .groupby("gkey").map_groups(finalize, batch_format="pandas")
             .to_pandas())
    for c in ("user_id", "rn", "event_id"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["user_id", "rn"]).reset_index(drop=True)


SQL_LATEST_EVENTS = f"""
WITH r AS (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, CAST(rn AS BIGINT) AS rn, event_id, ts
FROM r WHERE rn <= {_LATEST_N}
ORDER BY user_id, rn
"""


# ---------------------------------------------------------------------------
# BM25 query scoring (retrieval ranking over the corpus)
# ---------------------------------------------------------------------------

_BM25_QUERY = ("window", "merge", "stream")
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_TOPK = 20


def q_bm25_topk(sf_dir: str):
    """BM25 top-k for a fixed term query — the retrieval-scoring primitive
    (tfidf_top_terms is per-doc keywords; this ranks docs against a query).
    Two scans, NO shuffle: pass 1 is a per-batch partial aggregate of
    (N, total tokens, df per query term) reduced driver-side to a handful
    of integers; pass 2 broadcasts those constants in the closure, scores
    every doc vectorized (exact int tf/dl into ONE float64 expression
    mirrored verbatim in SQL) and keeps a per-batch partial top-k, so the
    driver sees O(k x blocks) rows. Scores micro-quantized to round6 so
    ranking compares identical integers on both sides; ties break doc_id."""
    import pyarrow.compute as pc

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])
    terms = _BM25_QUERY

    def stats_partial(t: pa.Table) -> pa.Table:
        toks = [x.split() for x in t["text"].to_pylist()]
        row = {"n": [len(toks)],
               "sl": [int(sum(len(ws) for ws in toks))]}
        for i, q in enumerate(terms):
            row[f"df{i}"] = [int(sum(1 for ws in toks if q in ws))]
        return pa.table(row)

    st = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas().sum()
    n_docs, sum_len = int(st["n"]), int(st["sl"])
    dfs = [int(st[f"df{i}"]) for i in range(len(terms))]
    avg_dl = sum_len / n_docs                      # float64 of exact ints
    idfs = [np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0) for d in dfs]

    def score(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [x.split() for x in t["text"].to_pylist()]
        dl = np.array([len(ws) for ws in toks], dtype=np.int64)
        s = np.zeros(len(ids), dtype=np.float64)
        denom_norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avg_dl)
        for q, idf in zip(terms, idfs):
            tf = np.array([ws.count(q) for ws in toks], dtype=np.int64)
            s += idf * (tf * (_BM25_K1 + 1.0)) / (tf + denom_norm)
        s6 = np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6
        df = pd.DataFrame({"doc_id": ids, "score6": s6})
        df = df.sort_values(["score6", "doc_id"],
                            ascending=[False, True]).head(_BM25_TOPK)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    part = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = (part.sort_values(["score6", "doc_id"], ascending=[False, True])
               .head(_BM25_TOPK).reset_index(drop=True))
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "doc_id", "score6"]]


def _bm25_sql() -> str:
    k1, b, k = _BM25_K1, _BM25_B, _BM25_TOPK
    tf_cols = ",\n         ".join(
        f"array_length(list_filter(toks, x -> x = '{q}'))::BIGINT AS tf{i}"
        for i, q in enumerate(_BM25_QUERY))
    df_cols = ", ".join(
        f"(SELECT COUNT(*) FILTER (WHERE tf{i} > 0) FROM tf)::BIGINT AS df{i}"
        for i in range(len(_BM25_QUERY)))
    score_terms = " + ".join(
        f"ln((s.n - s.df{i} + 0.5) / (s.df{i} + 0.5) + 1.0)"
        f" * (tf.tf{i} * ({k1} + 1.0))"
        f" / (tf.tf{i} + {k1} * (1.0 - {b} + {b} * tf.dl / (s.sl::DOUBLE / s.n)))"
        for i in range(len(_BM25_QUERY)))
    return f"""
WITH p AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
),
tf AS (
  SELECT doc_id, array_length(toks)::BIGINT AS dl,
         {tf_cols}
  FROM p
),
s AS (
  SELECT (SELECT COUNT(*) FROM p)::BIGINT AS n,
         (SELECT SUM(array_length(toks)) FROM p)::BIGINT AS sl,
         {df_cols}
),
sc AS (
  SELECT tf.doc_id,
         round({score_terms}, 6) AS score6
  FROM tf, s
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score6 DESC, doc_id) AS BIGINT) AS rank,
       doc_id, score6
FROM sc ORDER BY score6 DESC, doc_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# K-hop BFS distances (frontier expansion as a query — the crawl shape)
# ---------------------------------------------------------------------------

_BFS_K = 3
_BFS_SEEDS = 4      # seed set = doc_id < 4


def q_khop_bfs_distance(sf_dir: str):
    """BFS distances from a seed set over the suite's deterministic doc
    graph (doc -> (doc*31+c) mod N, c=1..3; same derivation as pagerank/cc)
    up to 3 hops — frontier expansion as a QUERY, i.e. the crawl engine's
    wave shape expressed in pure Dataset ops: one hash shuffle per hop.
    State rides the stream pagerank-style — every reached row re-emits
    itself and only exact-frontier rows (dist == hop-1) emit neighbors, so
    there is NO Dataset.union (the measured 6-10 s fusion breaker); the
    per-hop groupby(node).min keeps BFS layering exact. All integers; the
    oracle is a UNION-deduped recursive CTE taking MIN(dist)."""
    from ray.data.aggregate import Min

    from scrapy_ray.pipelines.queries import _nrows

    n = _nrows(sf_dir, "documents")

    def init(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids < _BFS_SEEDS]
        return pa.table({"node": pa.array(ids),
                         "dist": pa.array(np.zeros(len(ids), np.int64))})

    dist = _pq(sf_dir, "documents", ["doc_id"]).map_batches(
        init, batch_format="pyarrow")

    def expand(hop: int):
        def f(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
            fr = node[d == hop - 1]
            nbrs = [(fr * 31 + c) % n for c in range(1, 4)]
            return pa.table({
                "node": pa.array(np.concatenate([node] + nbrs)),
                "dist": pa.array(np.concatenate(
                    [d] + [np.full(len(fr), hop, np.int64)] * 3)),
            })
        return f

    for hop in range(1, _BFS_K + 1):
        dist = (dist.map_batches(expand(hop), batch_format="pyarrow")
                    .groupby("node").aggregate(Min("dist", alias_name="dist")))

    df = dist.to_pandas().rename(columns={"node": "doc_id"})
    for c in ("doc_id", "dist"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values("doc_id").reset_index(drop=True)


SQL_KHOP_BFS = f"""
WITH RECURSIVE walk AS (
  SELECT doc_id AS node, 0 AS dist FROM documents WHERE doc_id < {_BFS_SEEDS}
  UNION
  SELECT (w.node * 31 + c.c) % (SELECT COUNT(*) FROM documents),
         w.dist + 1
  FROM walk w, (SELECT unnest([1, 2, 3]) AS c) c
  WHERE w.dist < {_BFS_K}
)
SELECT node AS doc_id, MIN(dist)::BIGINT AS dist
FROM walk GROUP BY node ORDER BY node
"""


# ---------------------------------------------------------------------------
# within-doc consecutive-repetition collapse (C4/Dolma de-repetition rewrite)
# ---------------------------------------------------------------------------

_RC_CHUNK = 8    # tokens per chunk (paragraph stand-in, as paragraph_dedup)


def q_collapse_repeated_chunks(sf_dir: str):
    """De-repetition REWRITE (the C4 rule paragraph_dedup does not cover:
    that pass dedups across the corpus; this one collapses consecutive
    repeats WITHIN a document and rewrites the text). Documents split into
    disjoint 8-token chunks; a chunk equal to its immediate predecessor is
    dropped; the doc reassembles from survivors. Pure per-doc map — NO
    shuffle at all, the cheapest possible distributed shape. The synthetic
    corpus has no natural repeats, so a deterministic doc_id-derived run of
    (doc_id % 3 + 1) identical 8-token chunks is prepended and the oracle
    replays the identical injection + LAG-collapse + string_agg in SQL
    (the pii_redact pattern). Output carries md5 of the rewritten text so
    the hash compare pins the full rewrite without shipping long strings."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def collapse(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        n_chunks, n_dropped, digests = [], [], []
        for i, s in enumerate(texts):
            rep_tok = f"rep{int(ids[i]) % 7}"
            rep_chunk = " ".join([rep_tok] * _RC_CHUNK)
            # .split() (any-whitespace) matches the oracle's \S+ tokenizer;
            # .split(" ") would emit empty tokens on runs of spaces/tabs
            toks = ([rep_tok] * (_RC_CHUNK * (int(ids[i]) % 3 + 1))
                    + s.split())
            chunks = [" ".join(toks[g:g + _RC_CHUNK])
                      for g in range(0, len(toks), _RC_CHUNK)]
            kept = [c for g, c in enumerate(chunks)
                    if g == 0 or c != chunks[g - 1]]
            n_chunks.append(len(chunks))
            n_dropped.append(len(chunks) - len(kept))
            digests.append(hashlib.md5(" ".join(kept).encode()).hexdigest())
            assert rep_chunk in chunks[0]  # injection sanity
        return pa.table({
            "doc_id": pa.array(ids),
            "n_chunks": pa.array(n_chunks, type=pa.int64()),
            "n_dropped": pa.array(n_dropped, type=pa.int64()),
            "text_md5": pa.array(digests, type=pa.string()),
        })

    out = ds.map_batches(collapse, batch_format="pyarrow").to_pandas()
    for c in ("doc_id", "n_chunks", "n_dropped"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_COLLAPSE_REPEATS = f"""
WITH inj AS (
  SELECT doc_id,
         list_concat(
           list_transform(generate_series(1, {_RC_CHUNK} * (doc_id % 3 + 1)),
                          x -> 'rep' || (doc_id % 7)::VARCHAR),
           regexp_extract_all(text, '\\S+')) AS toks
  FROM documents
),
ch AS (
  SELECT doc_id, g.g AS g,
         array_to_string(toks[g.g * {_RC_CHUNK} + 1 :
                              g.g * {_RC_CHUNK} + {_RC_CHUNK}], ' ') AS chunk
  FROM inj, LATERAL (
    SELECT unnest(generate_series(
        0, CAST(ceil(array_length(toks) / {_RC_CHUNK}.0) AS BIGINT) - 1)) AS g
  ) g
),
k AS (
  SELECT doc_id, g, chunk,
         lag(chunk) OVER (PARTITION BY doc_id ORDER BY g) AS prev
  FROM ch
)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_chunks,
       COUNT(*) FILTER (WHERE prev = chunk)::BIGINT AS n_dropped,
       md5(string_agg(chunk, ' ' ORDER BY g)
           FILTER (WHERE prev IS NULL OR prev <> chunk)) AS text_md5
FROM k GROUP BY doc_id ORDER BY doc_id
"""


QUERIES10: dict[str, tuple] = {
    "revenue_cube": (q_revenue_cube, SQL_REVENUE_CUBE),
    "mad_order_value": (q_mad_order_value, SQL_MAD),
    "latest_events_per_user": (q_latest_events_per_user, SQL_LATEST_EVENTS),
    "bm25_topk": (q_bm25_topk, _bm25_sql()),
    "khop_bfs_distance": (q_khop_bfs_distance, SQL_KHOP_BFS),
    "collapse_repeated_chunks": (q_collapse_repeated_chunks,
                                 SQL_COLLAPSE_REPEATS),
}


# ---------------------------------------------------------------------------
# bounded window frames: ROWS (moving average) + RANGE (time window)
# ---------------------------------------------------------------------------


def q_window_frames_user_value(sf_dir: str):
    """The two bounded window-frame types the suite's running-sum/ntile
    family doesn't cover, in one user-co-partitioned pass:

    - ROWS frame: 4-event moving average of value cents per user
      (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) — windowed cumsum diffs,
      fully vectorized; float finalization is the explicit
      round(sum/cnt, 6) expression on BOTH sides (never SQL avg(), whose
      internal summation need not match);
    - RANGE frame: exact integer sum of the user's value cents in the
      trailing ONE HOUR including ties (RANGE BETWEEN INTERVAL 1 HOUR
      PRECEDING AND CURRENT ROW) — per-user searchsorted over the sorted
      ts array + cumsum diffs; tied timestamps all join the frame exactly
      as SQL RANGE semantics require.

    One hash shuffle total; each partition scans its users' rows once."""
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % _P).astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    hour_us = 3_600 * 1_000_000

    def frames(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        c = (np.sign(df["value"].to_numpy() * 100.0)
             * np.floor(np.abs(df["value"].to_numpy() * 100.0) + 0.5)) \
            .astype(np.int64)
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        bounds = np.r_[starts, len(u)]
        ma6 = np.empty(len(u), np.float64)
        s1h = np.empty(len(u), np.int64)
        for a, b in zip(bounds[:-1], bounds[1:]):
            cc = c[a:b]
            cum = np.concatenate([[0], np.cumsum(cc)])
            idx = np.arange(b - a)
            lo = np.maximum(0, idx - 3)
            w = cum[idx + 1] - cum[lo]
            cnt = idx + 1 - lo
            # half-away-from-zero like the DuckDB round() oracle (repo rule);
            # np.round is half-to-even and would diverge on an exact 6dp tie
            ma6[a:b] = _round6(w.astype(np.float64) / cnt)
            tlo = np.searchsorted(ts[a:b], ts[a:b] - hour_us, side="left")
            # RANGE frame end: include ALL rows tied with the current ts
            thi = np.searchsorted(ts[a:b], ts[a:b], side="right")
            s1h[a:b] = cum[thi] - cum[tlo]
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(),
                             "user_id": u, "ma4_cents6": ma6,
                             "sum_1h_cents": s1h})

    out = (ds.map_batches(with_key, batch_format="pyarrow")
             .groupby("gkey").map_groups(frames, batch_format="pandas")
             .to_pandas())
    for c in ("event_id", "user_id", "sum_1h_cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_WINDOW_FRAMES = """
WITH x AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
w AS (
  SELECT event_id, user_id,
         sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS s4,
         count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n4,
         sum(c) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                            AND CURRENT ROW) AS s1h
  FROM x
)
SELECT event_id, user_id,
       round(s4::DOUBLE / n4, 6) AS ma4_cents6,
       s1h::BIGINT AS sum_1h_cents
FROM w ORDER BY event_id
"""

QUERIES10["window_frames_user_value"] = (q_window_frames_user_value,
                                         SQL_WINDOW_FRAMES)


# ---------------------------------------------------------------------------
# HITS hubs & authorities (iterative, integer-exact)
# ---------------------------------------------------------------------------

_HITS_ITERS = 2


def q_hits_docs(sf_dir: str):
    """Kleinberg's HITS over the suite's deterministic doc graph — the
    second iterative BSP algorithm beside PageRank, adding the half-step
    PageRank doesn't have: the hub update is a GATHER
    (h(u) = sum of a over u's successors), expressed as a co-partitioned
    pair join — a-values and edge stubs ride ONE keyed stream (no
    Dataset.union), the per-key pass hands each stub its a-value, a second
    groupby sums per source. The authority update stays scatter-shaped
    with zero self-contributions keeping in-linkless nodes alive. Two
    unnormalized iterations in exact int64 (out-degree 3 keeps magnitudes
    tiny), bit-equal to the chained-CTE DuckDB oracle; h and a meet only
    in the O(N) output merge."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from scrapy_ray.pipelines.queries import _nrows

    n = _nrows(sf_dir, "documents")

    def init(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(ids),
                         "h": pa.array(np.ones(len(ids), np.int64))})

    h_ds = _pq(sf_dir, "documents", ["doc_id"]).map_batches(
        init, batch_format="pyarrow")

    def scatter_a(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        dsts = [(node * 31 + c) % n for c in range(1, 4)]
        return pa.table({
            "node": pa.array(np.concatenate(dsts + [node])),
            "v": pa.array(np.concatenate(
                [h] * 3 + [np.zeros(len(node), np.int64)])),
        })

    def pair_stream(t: pa.Table) -> pa.Table:
        """(node, a) -> ONE stream keyed by edge target: a type-0 value row
        per node plus a type-1 stub per in-edge (src carried)."""
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        dsts = [(node * 31 + c) % n for c in range(1, 4)]
        return pa.table({
            "key": pa.array(np.concatenate([node] + dsts)),
            "src": pa.array(np.concatenate(
                [np.full(len(node), -1, np.int64)] + [node] * 3)),
            "val": pa.array(np.concatenate(
                [a] + [np.zeros(len(node), np.int64)] * 3)),
        })

    def gather_h(df: pd.DataFrame) -> pd.DataFrame:
        # exactly one type-0 row per key holds a(key); every stub gets it.
        # Vectorized: sort by (key, src) puts the type-0 row (src=-1) first
        # in each key run, then forward-fill its value over the run.
        df = df.sort_values(["key", "src"], kind="mergesort")
        k = df["key"].to_numpy()
        src = df["src"].to_numpy()
        val = df["val"].to_numpy()
        run_start = np.r_[True, k[1:] != k[:-1]]
        aval = val[np.maximum.accumulate(
            np.where(run_start, np.arange(len(k)), 0))]
        stubs = src >= 0
        return pd.DataFrame({"node": src[stubs].astype(np.int64),
                             "v": aval[stubs].astype(np.int64)})

    a_ds = None
    for _ in range(_HITS_ITERS):
        a_ds = (h_ds.map_batches(scatter_a, batch_format="pyarrow")
                    .groupby("node").aggregate(Sum("v", alias_name="a")))
        a_ds = a_ds.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "a": pc.cast(t["a"], pa.int64())}),
            batch_format="pyarrow")
        h_ds = (a_ds.map_batches(pair_stream, batch_format="pyarrow")
                    .groupby("key").map_groups(gather_h,
                                               batch_format="pandas")
                    .groupby("node").aggregate(Sum("v", alias_name="h")))
        h_ds = h_ds.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "h": pc.cast(t["h"], pa.int64())}),
            batch_format="pyarrow")

    hd = h_ds.to_pandas().set_index("node")["h"]
    ad = a_ds.to_pandas().set_index("node")["a"]
    out = pd.DataFrame({"doc_id": sorted(ad.index),
                        "hub": [int(hd[i]) for i in sorted(ad.index)],
                        "authority": [int(ad[i]) for i in sorted(ad.index)]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.reset_index(drop=True)


def _hits_sql() -> str:
    head = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
e AS (
  SELECT doc_id AS src, (doc_id*31 + c.c) % (SELECT n FROM nn) AS dst
  FROM documents, (SELECT unnest([1, 2, 3]) AS c) c
),
h0 AS (SELECT doc_id AS node, 1::BIGINT AS h FROM documents)"""
    steps = []
    for i in range(1, _HITS_ITERS + 1):
        steps.append(f""", a{i} AS (
  SELECT node, SUM(v)::BIGINT AS a FROM (
    SELECT e.dst AS node, h{i-1}.h AS v FROM e JOIN h{i-1} ON e.src = h{i-1}.node
    UNION ALL SELECT node, 0 FROM h{i-1}
  ) GROUP BY node
), h{i} AS (
  SELECT e.src AS node, SUM(a{i}.a)::BIGINT AS h
  FROM e JOIN a{i} ON e.dst = a{i}.node GROUP BY e.src
)""")
    k = _HITS_ITERS
    return (head + "".join(steps) + f"""
SELECT h{k}.node AS doc_id, h{k}.h AS hub, a{k}.a AS authority
FROM h{k} JOIN a{k} USING (node) ORDER BY doc_id""")


QUERIES10["hits_docs"] = (q_hits_docs, _hits_sql())


# ---------------------------------------------------------------------------
# customer distribution (TPC-H Q13 shape: histogram of group sizes)
# ---------------------------------------------------------------------------


def q_custdist(sf_dir: str):
    """How many customers placed exactly k orders, INCLUDING k=0 — the
    TPC-H Q13 left-join-then-histogram shape, without the join: per-batch
    partial order counts shrink the shuffle to O(custkeys), a second tiny
    groupby histograms the counts, and the zero bucket is pure arithmetic
    (total customers - customers with any order) — the LEFT JOIN's only
    contribution collapses to one subtraction, so no customer row ever
    shuffles."""
    from ray.data.aggregate import Count, Sum

    from scrapy_ray.pipelines.queries import _nrows

    n_cust = _nrows(sf_dir, "customer")
    ds = _pq(sf_dir, "orders", ["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"c": t["o_custkey"]}).to_pandas()
        g = df.groupby("c").size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    per_cust = (ds.map_batches(partial, batch_format="pyarrow")
                  .groupby("c").aggregate(Sum("n", alias_name="n_orders")))

    def hist_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"n_orders": t["n_orders"]}).to_pandas()
        g = df.groupby("n_orders").size().rename("custdist").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    hist = (per_cust.map_batches(hist_partial, batch_format="pyarrow")
                    .groupby("n_orders")
                    .aggregate(Sum("custdist", alias_name="custdist"))
                    .to_pandas())
    n_with_orders = int(hist["custdist"].sum())
    zero = n_cust - n_with_orders
    if zero:
        hist = pd.concat([hist, pd.DataFrame({"n_orders": [0],
                                              "custdist": [zero]})],
                         ignore_index=True)
    for c in ("n_orders", "custdist"):
        hist[c] = hist[c].astype(np.int64)
    return (hist.sort_values(["custdist", "n_orders"],
                             ascending=[False, False])
            .reset_index(drop=True))


SQL_CUSTDIST = """
WITH co AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey)::BIGINT AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT n_orders, COUNT(*)::BIGINT AS custdist
FROM co GROUP BY n_orders
ORDER BY custdist DESC, n_orders DESC
"""

QUERIES10["custdist"] = (q_custdist, SQL_CUSTDIST)
