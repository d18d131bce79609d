"""Sixth oracle-query batch (round 3, cont.): three operator families the
training-data suite did not yet cover —

- exact substring-span dedup (the "Deduplicating Training Data" pass):
  overlapping token 8-grams, cross-document duplicate detection, per-doc
  duplicated-span coverage via interval union;
- deterministic training-shard export: hash-derived shard assignment +
  intra-shard shuffle order (the write-side primitive of a corpus build);
- k-means over embeddings in integer fixed-point (broadcast centroids,
  per-block partial-sum combiner, tiny driver reduce — the canonical
  distributed-ML iteration shape, bit-exact against a chained-CTE oracle);
- corpus snapshot diff: full-outer hash-diff of two crawl snapshots
  (added / removed / changed / unchanged), co-partitioned by doc key —
  the one join modality (full outer) the suite did not yet cover;
- cross-source n-gram overlap matrix (contamination analytics between
  corpus sources).

All are oracle-checked against DuckDB on the same parquet inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq

# ---------------------------------------------------------------------------
# exact substring-span dedup
# ---------------------------------------------------------------------------

_NG = 8        # overlapping 8-token shingles, stride 1
_N_PARTS = 256  # salted coarse partitions (per-group dispatch over millions
                # of tiny shingle groups is the measured hot spot)


def q_substring_span_dedup(sf_dir: str):
    """Per-document duplicated-substring coverage: explode every doc into
    overlapping token 8-grams (stride 1), mark an 8-gram DUPLICATED when it
    occurs in >= 2 distinct documents corpus-wide, then report per doc the
    number of duplicated-gram start positions and the token coverage of the
    union of their [pos, pos+8) spans (the spans a span-removal pass would
    cut).

    Scale shape: two hash shuffles, no driver state beyond the per-doc
    output — (1) shingles shuffle by a salted shingle-hash key; the >=2
    distinct-doc test resolves vectorized inside each of ~256 coarse
    partitions (only occurrences of duplicated shingles survive);
    (2) survivors shuffle by a coarse doc key; interval-union coverage is
    computed vectorized (sorted-gap form, no per-doc Python loop). A
    mega-duplicated shingle contributes O(occurrences) rows but they spread
    across doc partitions in stage 2.
    """
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        ngs: list[str] = []
        n_per = np.empty(len(ids), dtype=np.int64)
        for i, s in enumerate(texts):
            toks = s.split(" ")
            n = max(0, len(toks) - _NG + 1)
            n_per[i] = n
            for p in range(n):
                ngs.append(" ".join(toks[p:p + _NG]))
        ids_r = np.repeat(ids, n_per)
        pos_r = (np.concatenate([np.arange(n) for n in n_per])
                 if len(ids) else np.empty(0, np.int64))
        gkey = ((pl.Series(ngs).hash(seed=42).to_numpy() % _N_PARTS)
                .astype(np.int32) if ngs else np.empty(0, np.int32))
        return pa.table({
            "doc_id": pa.array(ids_r),
            "pos": pa.array(pos_r.astype(np.int64)),
            "ng": pa.array(ngs, type=pa.string()),
            "gkey": pa.array(gkey),
        })

    def mark_dups(df: pd.DataFrame) -> pd.DataFrame:
        nd = df.groupby("ng")["doc_id"].transform("nunique")
        out = df.loc[nd >= 2, ["doc_id", "pos"]].copy()
        out["dkey"] = (out["doc_id"] % _N_PARTS).astype(np.int32)
        return out

    def coverage(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        d = df["doc_id"].to_numpy()
        p = df["pos"].to_numpy()
        # first start of each doc-run covers _NG tokens; every later start
        # adds min(gap, _NG) — the sorted-gap form of interval union
        contrib = np.empty(len(p), dtype=np.int64)
        if len(p):
            contrib[0] = _NG
            gap = p[1:] - p[:-1]
            contrib[1:] = np.where(d[1:] == d[:-1],
                                   np.minimum(gap, _NG), _NG)
        df = df.assign(contrib=contrib)
        g = df.groupby("doc_id")
        return g.agg(n_dup_starts=("pos", "size"),
                     dup_cov=("contrib", "sum")).reset_index()

    dup_pos = (ds.map_batches(explode, batch_format="pyarrow")
                 .groupby("gkey").map_groups(mark_dups, batch_format="pandas"))
    stats = (dup_pos.groupby("dkey").map_groups(coverage, batch_format="pandas")
             .to_pandas())
    if stats.empty:
        stats = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "n_dup_starts": pd.Series(dtype=np.int64),
                              "dup_cov": pd.Series(dtype=np.int64)})

    def base_rows(t: pa.Table) -> pa.Table:
        nt = np.array([len(s.split(" ")) for s in t["text"].to_pylist()],
                      dtype=np.int64)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pa.array(nt)})

    base = ds.map_batches(base_rows, batch_format="pyarrow").to_pandas()
    out = base.merge(stats, on="doc_id", how="left")
    for c in ("n_dup_starts", "dup_cov"):
        out[c] = out[c].fillna(0).astype(np.int64)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["dup_permille"] = (1000 * out["dup_cov"]) // out["n_tokens"]
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_SUBSTRING_SPAN_DEDUP = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), base AS (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens FROM toks
), ngrams AS (
  SELECT doc_id, gs.p AS pos,
         array_to_string(ts[(gs.p+1):(gs.p+{_NG})], ' ') AS ng
  FROM toks, LATERAL (
    SELECT unnest(generate_series(0, len(ts) - {_NG})) AS p
  ) gs
  WHERE len(ts) >= {_NG}
), dupng AS (
  SELECT ng FROM ngrams GROUP BY ng HAVING COUNT(DISTINCT doc_id) >= 2
), dstarts AS (
  SELECT n.doc_id, n.pos FROM ngrams n JOIN dupng d USING (ng)
), starts AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_starts
  FROM dstarts GROUP BY doc_id
), covered AS (
  SELECT s.doc_id, CAST(COUNT(DISTINCT s.pos + o.o) AS BIGINT) AS dup_cov
  FROM dstarts s, LATERAL (
    SELECT unnest(generate_series(0, {_NG} - 1)) AS o
  ) o
  GROUP BY s.doc_id
)
SELECT b.doc_id, b.n_tokens,
       COALESCE(s.n_dup_starts, 0)::BIGINT AS n_dup_starts,
       COALESCE(c.dup_cov, 0)::BIGINT AS dup_cov,
       (1000 * COALESCE(c.dup_cov, 0)) // b.n_tokens AS dup_permille
FROM base b
LEFT JOIN starts s USING (doc_id)
LEFT JOIN covered c USING (doc_id)
ORDER BY b.doc_id
"""

# ---------------------------------------------------------------------------
# deterministic training-shard export
# ---------------------------------------------------------------------------

_N_SHARDS = 16


def q_train_shard_export(sf_dir: str):
    """Write-side primitive of a corpus build: assign every document a
    training shard and a deterministic intra-shard shuffle position. The
    multiplicative hash (uint64 with an explicit mod 2^32, mirrored
    unsigned in SQL — the ADVICE r2 overflow rule) gives an
    engine/partitioning-independent pseudo-random order; ranking is
    per-shard (a local sort inside each shard group), never a global sort.
    At 100 TB each shard group is written as its own file sequence and the
    rank is the within-file record order — resumable per shard.
    """
    ds = _pq(sf_dir, "documents", ["doc_id"])

    def hsh(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = ids.astype(np.uint64)
        h = ((u % np.uint64(2 ** 32)) * np.uint64(2654435761)) % np.uint64(2 ** 32)
        return pa.table({
            "doc_id": pa.array(ids),
            "h": pa.array(h.astype(np.int64)),
            "shard": pa.array((h % np.uint64(_N_SHARDS)).astype(np.int64)),
        })

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "doc_id"], kind="mergesort").copy()
        df["pos"] = np.arange(len(df), dtype=np.int64)
        return df

    out = (ds.map_batches(hsh, batch_format="pyarrow")
             .groupby("shard").map_groups(rank, batch_format="pandas")
             .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["shard", "pos"]).reset_index(drop=True)


SQL_TRAIN_SHARD_EXPORT = f"""
WITH h AS (
  SELECT doc_id,
         CAST(((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761)
              % 4294967296 AS BIGINT) AS h
  FROM documents
)
SELECT doc_id, h, CAST(h % {_N_SHARDS} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % {_N_SHARDS}
                               ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM h
ORDER BY shard, pos
"""

# ---------------------------------------------------------------------------
# k-means over embeddings (integer fixed-point Lloyd iterations)
# ---------------------------------------------------------------------------

_KM_K = 8      # clusters; init = the first K vectors by vec_id
_KM_T = 2      # assignment passes (T-1 centroid updates between them)
_KM_D = 64     # embedding dim (asserted against the data)
_KM_Q = 1_000_000  # fixed-point scale: ei = floor(float64(e) * Q)


def _kmeans_eint(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    E = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    assert E.shape[1] == _KM_D
    # floor (not round): unambiguous across numpy / DuckDB rounding modes
    return ids, np.floor(E * _KM_Q).astype(np.int64)


def _km_assign_stats(cent: np.ndarray):
    """Per-block partial (count, sum-vector) rows for one Lloyd pass."""
    def f(t: pa.Table) -> pa.Table:
        _, Ei = _kmeans_eint(t)
        d2 = ((Ei[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)  # first-min ties == ORDER BY dist, j
        cnt = np.bincount(a, minlength=_KM_K).astype(np.int64)
        sums = np.zeros((_KM_K, _KM_D), dtype=np.int64)
        np.add.at(sums, a, Ei)
        return pa.table({
            "j": pa.array(np.arange(_KM_K, dtype=np.int64)),
            "cnt": pa.array(cnt),
            "s": pa.array(list(sums), type=pa.list_(pa.int64())),
        })
    return f


def _kmeans_centroids(sf_dir: str, ds) -> np.ndarray:
    """Train the fixed-point Lloyd centroids (seed = first K vectors, T-1
    update passes). Shared by q_kmeans_embeddings and q_semdedup_embeddings
    so both match the same chained-CTE oracle prefix."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq_

    seed_t = pq_.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
    seed_t = seed_t.filter(pc.less(seed_t["vec_id"], _KM_K))
    seed_t = seed_t.sort_by("vec_id")
    _, cent = _kmeans_eint(seed_t)

    for _ in range(_KM_T - 1):
        part = ds.map_batches(_km_assign_stats(cent),
                              batch_format="pyarrow").to_pandas()
        cnt = np.zeros(_KM_K, dtype=np.int64)
        sums = np.zeros((_KM_K, _KM_D), dtype=np.int64)
        for j, c, s in zip(part["j"], part["cnt"], part["s"]):
            cnt[j] += c
            sums[j] += np.asarray(s, dtype=np.int64)
        new = cent.copy()
        nz = cnt > 0
        new[nz] = np.floor(sums[nz].astype(np.float64)
                           / cnt[nz, None].astype(np.float64)).astype(np.int64)
        cent = new
    return cent


def q_kmeans_embeddings(sf_dir: str):
    """Lloyd's k-means in integer fixed-point — the broadcast-model +
    partial-sum-combiner iteration shape: each pass is ONE map_batches over
    the corpus (no shuffle at all); every block emits k partial
    (count, sum-vector) rows; the driver reduces a k x dim table (a few KB)
    and recomputes centroids. Quantization (floor(e*1e6) as int64) makes
    distances and argmins exact integers, so the assignment is bit-exact
    against the chained-CTE DuckDB oracle — no float-associativity drift.
    Centroid update mirrors floor(double(sum)/count) on both sides (exact:
    |sum| << 2^53 and true quotients are >= 1/count away from integers
    when fractional). Empty clusters keep their previous centroid. The
    centroid matrix is captured in the batch-fn closure (4 KB; at real
    model sizes this becomes ray.put + fetch-in-__init__, as lang-id does).
    """
    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])

    def final_assign(cent: np.ndarray):
        def f(t: pa.Table) -> pa.Table:
            ids, Ei = _kmeans_eint(t)
            d2 = ((Ei[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            return pa.table({
                "vec_id": pa.array(ids),
                "cluster": pa.array(a.astype(np.int64)),
                "dist": pa.array(d2[np.arange(len(a)), a]),
            })
        return f

    cent = _kmeans_centroids(sf_dir, ds)

    out = ds.map_batches(final_assign(cent), batch_format="pyarrow").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("vec_id").reset_index(drop=True)


def _kmeans_sql_prefix() -> str:
    """CTE chain through `af` (the final (vec_id, j, dist, rn) assignment
    ranking). Reused verbatim by SQL_KMEANS and the SemDeDup oracle so both
    replay the identical fixed-point Lloyd iterations."""
    k, d, q = _KM_K, _KM_D, _KM_Q
    sql = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {q}) AS BIGINT)) AS ei
  FROM embeddings
), ed AS (
  SELECT vec_id, g.d, ei[g.d] AS v
  FROM e, LATERAL (SELECT unnest(generate_series(1, {d})) AS d) g
), c0 AS (
  SELECT vec_id AS j, d, v FROM ed WHERE vec_id < {k}
)"""
    prev = "c0"
    for it in range(1, _KM_T):
        sql += f""", d{it} AS (
  SELECT ed.vec_id, c.j, SUM((ed.v - c.v) * (ed.v - c.v)) AS dist
  FROM ed JOIN {prev} c USING (d) GROUP BY ed.vec_id, c.j
), a{it} AS (
  SELECT vec_id, j,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
  FROM d{it}
), m{it} AS (
  SELECT vec_id, j FROM a{it} WHERE rn = 1
), cs{it} AS (
  SELECT m.j, ed.d,
         CAST(floor(CAST(SUM(ed.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
  FROM m{it} m JOIN ed USING (vec_id) GROUP BY m.j, ed.d
), c{it} AS (
  SELECT p.j, p.d, COALESCE(s.v, p.v) AS v
  FROM {prev} p LEFT JOIN cs{it} s ON s.j = p.j AND s.d = p.d
)"""
        prev = f"c{it}"
    sql += f""", df AS (
  SELECT ed.vec_id, c.j, SUM((ed.v - c.v) * (ed.v - c.v)) AS dist
  FROM ed JOIN {prev} c USING (d) GROUP BY ed.vec_id, c.j
), af AS (
  SELECT vec_id, j, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
  FROM df
)"""
    return sql


def _kmeans_sql() -> str:
    return _kmeans_sql_prefix() + """
SELECT vec_id, CAST(j AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist
FROM af WHERE rn = 1 ORDER BY vec_id"""


SQL_KMEANS = _kmeans_sql()


# ---------------------------------------------------------------------------
# corpus snapshot diff (full-outer hash-diff)
# ---------------------------------------------------------------------------


def q_corpus_snapshot_diff(sf_dir: str):
    """Diff two crawl snapshots of the same corpus: classify every URL/doc
    as added (new only), removed (old only), changed (both, content hash
    differs) or unchanged. The two snapshots are derived deterministically
    from the documents table in-query (old drops doc_id%10==7, new drops
    doc_id%10==3 and rewrites text for doc_id%5==0) so the oracle replays
    the exact same construction in SQL.

    Scale shape: ONE read; both sides' (doc_id, side, content-hash) rows
    are emitted from the same pass (a real diff reads two snapshot roots —
    same shape, two reads), co-partitioned by a coarse doc key, and the
    full-outer resolution happens vectorized inside each partition. No
    driver state; the output is the per-doc verdict a re-crawl scheduler
    would consume. Content equality is hash-based (polars xxhash64, seed
    42): a 2^-64 collision risk replaces shipping full text through the
    shuffle.
    """
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def both_sides(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = pl.Series("t", t["text"].to_pylist())
        old_keep = ids % 10 != 7
        new_keep = ids % 10 != 3
        suffix = pl.Series("s", np.where(ids % 5 == 0, " v2", ""))
        h_old = txt.hash(seed=42).to_numpy().astype(np.int64)
        h_new = (txt + suffix).hash(seed=42).to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids[old_keep], ids[new_keep]])),
            "side": pa.array(np.concatenate([
                np.zeros(old_keep.sum(), np.int8),
                np.ones(new_keep.sum(), np.int8)])),
            "h": pa.array(np.concatenate([h_old[old_keep], h_new[new_keep]])),
            "dkey": pa.array(np.concatenate(
                [ids[old_keep] % _N_PARTS,
                 ids[new_keep] % _N_PARTS]).astype(np.int32)),
        })

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["side"] == 0][["doc_id", "h"]]
        n = df[df["side"] == 1][["doc_id", "h"]]
        m = o.merge(n, on="doc_id", how="outer", suffixes=("_o", "_n"))
        status = np.where(
            m["h_o"].isna(), "added",
            np.where(m["h_n"].isna(), "removed",
                     np.where(m["h_o"] == m["h_n"], "unchanged", "changed")))
        return pd.DataFrame({"doc_id": m["doc_id"].astype(np.int64),
                             "status": status})

    out = (ds.map_batches(both_sides, batch_format="pyarrow")
             .groupby("dkey").map_groups(classify, batch_format="pandas")
             .to_pandas())
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_CORPUS_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 7
), new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 10 != 3
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text = n.text THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# cross-source n-gram overlap matrix
# ---------------------------------------------------------------------------


def q_source_ngram_overlap(sf_dir: str):
    """Contamination analytics between corpus sources: for every ordered
    source pair (a < b), the number of distinct token 8-grams they share.
    The diagnostic a mixture designer reads before weighting sources.

    Scale shape: shingles shuffle once by a salted shingle-hash key; inside
    each of ~256 partitions the per-shingle distinct source set collapses
    vectorized and each multi-source shingle emits its source pairs; a
    final tiny groupby-sum over (src_a, src_b) cells (|sources|^2 rows)
    yields the matrix. No driver state beyond the matrix itself.
    """
    ds = _pq(sf_dir, "documents", ["text", "source"])

    def explode(t: pa.Table) -> pa.Table:
        srcs = t["source"].to_pylist()
        texts = t["text"].to_pylist()
        ngs: list[str] = []
        n_per = np.empty(len(srcs), dtype=np.int64)
        for i, s in enumerate(texts):
            toks = s.split(" ")
            n = max(0, len(toks) - _NG + 1)
            n_per[i] = n
            for p in range(n):
                ngs.append(" ".join(toks[p:p + _NG]))
        src_r = np.repeat(np.asarray(srcs, dtype=object), n_per)
        gkey = ((pl.Series(ngs).hash(seed=42).to_numpy() % _N_PARTS)
                .astype(np.int32) if ngs else np.empty(0, np.int32))
        return pa.table({
            "ng": pa.array(ngs, type=pa.string()),
            "source": pa.array(list(src_r), type=pa.string()),
            "gkey": pa.array(gkey),
        })

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        u = df[["ng", "source"]].drop_duplicates()
        # multi-source shingles only; emit each (a<b) pair once per shingle
        j = u.merge(u, on="ng", suffixes=("_a", "_b"))
        j = j[j["source_a"] < j["source_b"]]
        g = j.groupby(["source_a", "source_b"]).size().reset_index(name="n")
        return g

    cells = (ds.map_batches(explode, batch_format="pyarrow")
               .groupby("gkey").map_groups(pair_counts, batch_format="pandas")
               .to_pandas())
    out = (cells.groupby(["source_a", "source_b"], as_index=False)["n"].sum()
           .rename(columns={"n": "shared_ngrams"}))
    out["shared_ngrams"] = out["shared_ngrams"].astype(np.int64)
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


SQL_SOURCE_NGRAM_OVERLAP = f"""
WITH toks AS (
  SELECT source, string_split(text, ' ') AS ts FROM documents
), ngrams AS (
  SELECT DISTINCT source, array_to_string(ts[(gs.p+1):(gs.p+{_NG})], ' ') AS ng
  FROM toks, LATERAL (
    SELECT unnest(generate_series(0, len(ts) - {_NG})) AS p
  ) gs
  WHERE len(ts) >= {_NG}
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS shared_ngrams
FROM ngrams a JOIN ngrams b ON a.ng = b.ng AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# per-group winsorization (outlier clipping at grouped quantile thresholds)
# ---------------------------------------------------------------------------

_WZ_LO, _WZ_HI = 0.05, 0.95


def q_winsorize_doclen(sf_dir: str):
    """Outlier handling for a training mix: clip every document's length
    feature to its language's [p05, p95] band and flag the clipped rows.
    Composition of two suite shapes: grouped histogram-merge quantiles
    (queries5) produce per-lang thresholds WITHOUT a global sort, the tiny
    threshold table broadcasts into a stateless clip pass. Ranks mirror
    DuckDB quantile_disc (1-based ceil(q*n))."""
    from ray.data.aggregate import Sum

    ds = _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"lang": t["lang"], "n_chars": t["n_chars"]}).to_pandas()
        g = df.groupby(["lang", "n_chars"]).size().rename("cnt").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    cells = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["lang", "n_chars"])
               .aggregate(Sum("cnt", alias_name="cnt")))

    def thresholds(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("n_chars", kind="mergesort")
        vals = df["n_chars"].to_numpy()
        cum = df["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        pick = lambda q: int(vals[int(np.searchsorted(cum, int(np.ceil(q * n))))])
        return pd.DataFrame({"lang": [df["lang"].iloc[0]],
                             "lo": [pick(_WZ_LO)], "hi": [pick(_WZ_HI)]})

    th = cells.groupby("lang").map_groups(thresholds, batch_format="pandas") \
        .to_pandas()  # |langs| rows — the broadcast side

    lo = dict(zip(th["lang"], th["lo"].astype(np.int64)))
    hi = dict(zip(th["lang"], th["hi"].astype(np.int64)))

    def clip(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        l = np.array([lo[s] for s in langs], dtype=np.int64)
        h = np.array([hi[s] for s in langs], dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(t["doc_id"].to_numpy(zero_copy_only=False)
                               .astype(np.int64)),
            "lang": t["lang"],
            "n_chars": pa.array(x),
            "clipped": pa.array(np.clip(x, l, h)),
            "is_outlier": pa.array(((x < l) | (x > h)).astype(np.int64)),
        })

    out = ds.map_batches(clip, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_WINSORIZE_DOCLEN = f"""
WITH th AS (
  SELECT lang,
         quantile_disc(n_chars, {_WZ_LO}) AS lo,
         quantile_disc(n_chars, {_WZ_HI}) AS hi
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars,
       CAST(least(greatest(d.n_chars, t.lo), t.hi) AS BIGINT) AS clipped,
       CAST(d.n_chars < t.lo OR d.n_chars > t.hi AS BIGINT) AS is_outlier
FROM documents d JOIN th t USING (lang)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# global NTILE without a global sort
# ---------------------------------------------------------------------------

_NT_K = 8


def q_ntile_orders(sf_dir: str):
    """Global NTILE(8) over orders by (price-cents, orderkey) WITHOUT a
    global sort: (1) a distributed value histogram yields counts-below per
    distinct cents value (value-domain-bounded table, the value_quantiles
    bound); (2) rows shuffle ONCE by a salted value key and the tie rank
    inside each distinct-value run is the orderkey order — global rank =
    below[value] + tie. The counts-below arrays broadcast via ray.put
    (searchsorted lookup in-task). Bucket arithmetic mirrors SQL NTILE
    (first N%k buckets one row larger)."""
    import ray
    from ray.data.aggregate import Sum

    from scrapy_ray.pipelines.queries import _cents

    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"])
        gkey = (c.to_numpy() % _N_PARTS).astype(np.int32)
        return pa.table({"o_orderkey": t["o_orderkey"], "cents": c,
                         "gkey": pa.array(gkey)})

    rows = ds.map_batches(to_cents, batch_format="pyarrow")

    def hpart(t: pa.Table) -> pa.Table:
        df = pa.table({"cents": t["cents"]}).to_pandas()
        g = df.groupby("cents").size().rename("cnt").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    hist = (rows.map_batches(hpart, batch_format="pyarrow")
                .groupby("cents").aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas().sort_values("cents"))
    cnt = hist["cnt"].to_numpy(dtype=np.int64)
    n_total = int(cnt.sum())
    below = np.concatenate([[0], np.cumsum(cnt[:-1])])
    ref = ray.put((hist["cents"].to_numpy(dtype=np.int64), below))

    size, rem = divmod(n_total, _NT_K)
    cutoff = rem * (size + 1)

    def rank_tile(df: pd.DataFrame) -> pd.DataFrame:
        keys, blw = ray.get(ref)
        df = df.sort_values(["cents", "o_orderkey"], kind="mergesort")
        tie = df.groupby("cents").cumcount().to_numpy()
        r0 = blw[np.searchsorted(keys, df["cents"].to_numpy())] + tie
        if size:
            tile = np.where(r0 < cutoff, r0 // (size + 1),
                            rem + (r0 - cutoff) // size)
        else:
            tile = r0
        return pd.DataFrame({"o_orderkey": df["o_orderkey"].to_numpy(),
                             "cents": df["cents"].to_numpy(),
                             "tile": (tile + 1).astype(np.int64)})

    out = (rows.groupby("gkey").map_groups(rank_tile, batch_format="pandas")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_orderkey").reset_index(drop=True)


SQL_NTILE_ORDERS = f"""
SELECT o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(NTILE({_NT_K}) OVER (
            ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
            AS BIGINT) AS tile
FROM orders
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# windowed dedup (burst collapse)
# ---------------------------------------------------------------------------

_WD_GAP_US = 10 * 60 * 1_000_000   # 10-minute burst window


def q_windowed_dedup_events(sf_dir: str):
    """Burst collapse: within each (user, event_type) stream keep only the
    events that START a burst — gap from the previous event > 10 min (or
    first). The event-log twin of paragraph dedup: repeated signals inside
    a window collapse to one. One hash shuffle on the composite key; the
    per-group rule is a vectorized timestamp diff (no per-row loop), tie
    order (ts, event_id) fixed for determinism."""
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"],
                            kind="mergesort")
        t = df["ts"].astype("int64").to_numpy()
        u = df["user_id"].to_numpy()
        e = df["event_type"].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[1:] = (u[1:] == u[:-1]) & (e[1:] == e[:-1]) \
                & (t[1:] - t[:-1] <= _WD_GAP_US)
        return df.loc[~same, ["event_id", "user_id", "event_type", "ts"]]

    def with_key(t: pa.Table) -> pa.Table:
        gkey = (t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                % _N_PARTS).astype(np.int32)
        return t.append_column("gkey", pa.array(gkey))

    out = (ds.map_batches(with_key, batch_format="pyarrow")
             .groupby("gkey").map_groups(keep_first, batch_format="pandas")
             .to_pandas())
    for c in ("event_id", "user_id"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


SQL_WINDOWED_DEDUP = """
WITH g AS (
  SELECT event_id, user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS pt
  FROM events
)
SELECT event_id, user_id, event_type, ts
FROM g
WHERE pt IS NULL OR ts - pt > INTERVAL 10 MINUTE
ORDER BY event_id
"""


QUERIES6 = {
    "substring_span_dedup": (q_substring_span_dedup, SQL_SUBSTRING_SPAN_DEDUP),
    "train_shard_export": (q_train_shard_export, SQL_TRAIN_SHARD_EXPORT),
    "kmeans_embeddings": (q_kmeans_embeddings, SQL_KMEANS),
    "corpus_snapshot_diff": (q_corpus_snapshot_diff, SQL_CORPUS_SNAPSHOT_DIFF),
    "source_ngram_overlap": (q_source_ngram_overlap, SQL_SOURCE_NGRAM_OVERLAP),
    "winsorize_doclen": (q_winsorize_doclen, SQL_WINSORIZE_DOCLEN),
    "ntile_orders": (q_ntile_orders, SQL_NTILE_ORDERS),
    "windowed_dedup_events": (q_windowed_dedup_events, SQL_WINDOWED_DEDUP),
}
