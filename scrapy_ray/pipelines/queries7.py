"""Seventh oracle-query batch (round 3 tail): set-similarity and
incremental-maintenance operator families —

- PPJoin-style EXACT similarity self-join with prefix filtering (Bayardo et
  al. WWW'07 AllPairs / Xiao et al. PPJoin; distributed kernel after Vernica
  et al. SIGMOD'10): the exact counterpart of q_minhash_lsh_neardup on the
  same 3-word-shingle basis and the same tau, full corpus, no all-pairs —
  candidate pairs are generated only inside tiny prefix-token groups;
- incremental aggregate maintenance: merge yesterday's partial-aggregate
  state with a delta slice and reproduce the full recompute bit-exactly —
  the delta-processing primitive every recurring corpus build needs;
- CUBE aggregate over (lang, source) with exact integer sums.

All oracle-checked against DuckDB on the same parquet inputs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from scrapy_ray.functions.sketch import shingle_hash_set
from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.training import _round4

_N_PARTS = 256

# ---------------------------------------------------------------------------
# PPJoin: exact shingle-Jaccard similarity join with prefix filtering
# ---------------------------------------------------------------------------

# tau = 1/2 — same threshold the MinHash+LSH scale path verifies at, so this
# query IS that pipeline's exact ground truth over the full corpus.
_PPJ_NUM, _PPJ_DEN = 1, 2


@ray.remote
def _verify_pairs_exact(a: np.ndarray, b: np.ndarray,
                        sets: dict[int, np.ndarray]) -> "pa.Table":
    """Exact integer-arithmetic Jaccard >= NUM/DEN test over one slice of
    candidate pairs: keep iff (DEN+NUM)*|A∩B| >= NUM*(|A|+|B|) — no float
    threshold edge on either side (the SQL oracle tests 3i >= na+nb)."""
    keep_a, keep_b, keep_j = [], [], []
    for x, y in zip(a, b):
        A, B = sets[int(x)], sets[int(y)]
        na, nb = A.size, B.size
        lo, hi = (na, nb) if na <= nb else (nb, na)
        if _PPJ_NUM * hi > _PPJ_DEN * lo:      # length filter: J < tau certain
            continue
        k = np.intersect1d(A, B, assume_unique=True).size
        if (_PPJ_DEN + _PPJ_NUM) * k < _PPJ_NUM * (na + nb):
            continue
        keep_a.append(int(x))
        keep_b.append(int(y))
        keep_j.append(k / (na + nb - k))
    return pa.table({
        "doc_a": pa.array(keep_a, type=pa.int64()),
        "doc_b": pa.array(keep_b, type=pa.int64()),
        "jaccard": pa.array(_round4(np.asarray(keep_j, dtype=np.float64)),
                            type=pa.float64()),
    })


def q_ppjoin_neardup(sf_dir: str, max_bucket: int = 4096,
                     chunk_pairs: int = 65536, n_set_buckets: int = 16,
                     verify_slice: int = 8192):
    """Exact Jaccard >= 0.5 similarity self-join over the FULL corpus without
    an all-pairs scan (the bounded-subset brute force is q_token_jaccard_pairs;
    the approximate scale path is q_minhash_lsh_neardup — this is the exact
    middle: prefix filtering).

    Prefix-filter lemma: fix any global total order on shingles; if
    J(A,B) >= tau then A and B share a shingle among the first
    |x| - ceil(tau*|x|) + 1 shingles of EACH side's sorted set (else all
    common shingles sit in a suffix shorter than the ceil(tau*|x|) overlap
    J >= tau forces). Here the global order is the shingle hash itself —
    correctness never depends on WHICH order, only candidate count does.

    BOUNDED-PAYLOAD shape (round 4, VERDICT item 1 — the old version
    replicated each doc's FULL shingle set once per prefix token, an
    O(n²/2)-hashes-per-doc shuffle): this is now the same machinery as
    q_minhash_lsh_neardup —

    1. ONE corpus pass computes each doc's sorted shingle-hash set, persists
       it to a doc_id-bucketed scratch parquet layout (side effect; the
       downstream groupby is a barrier so writes complete before gathers),
       and emits only (prefix_shingle, doc_id) — O(n) per doc.
    2. ONE salted groupby (~256 coarse partitions) recovers real per-shingle
       groups vectorized and emits candidate doc-id pairs; groups larger
       than ``max_bucket`` are skipped (df cutoff — a corpus-hot shingle is
       all-pairs in disguise) with the skipped-group count carried out on
       sentinel rows and log()-reported by the driver. The default cutoff is
       far above any real prefix-group size at test scale (3-word shingle df
       is tiny), so the result stays EXACT vs the SQL oracle; the property
       test forces a hot shingle with a low cutoff.
    3. Candidate pairs dedup DISTRIBUTED (groupby — a pair sharing many
       prefix tokens never reaches the driver more than once), then stream
       in fixed-size chunks: per chunk gather only that chunk's sets from
       the bucketed layout and verify in parallel slices with the
       integer-exact tau test. Output is O(matches).
    """
    import logging
    import shutil
    import tempfile
    import uuid

    import pyarrow.parquet as pq_

    from scrapy_ray.pipelines.training import _read_set_bucket

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    scratch = tempfile.mkdtemp(prefix="ppjoin_sets_", dir="/tmp")
    for b in range(n_set_buckets):
        os.makedirs(os.path.join(scratch, f"bucket={b}"), exist_ok=True)

    def emit_prefixes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pfx_l, did_l, set_l, set_ids = [], [], [], []
        for did, txt in zip(ids, t["text"].to_pylist()):
            sh = shingle_hash_set(txt)          # unique + ascending = order
            n = len(sh)
            if n == 0:
                continue
            p = n - (_PPJ_NUM * n + _PPJ_DEN - 1) // _PPJ_DEN + 1  # n-ceil(tau n)+1
            pfx_l.append(sh[:p])
            did_l.append(np.full(p, did, dtype=np.int64))
            set_l.append(sh)
            set_ids.append(did)
        if not pfx_l:
            return pa.table({"pfx": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64()),
                             "gkey": pa.array([], pa.int32())})
        # side effect: persist this block's shingle sets once, bucketed by
        # doc_id hash (same convention as q_minhash_lsh_neardup's scratch)
        sid = np.asarray(set_ids, dtype=np.int64)
        bkt = (sid % n_set_buckets).astype(np.int32)
        st = pa.table({"doc_id": pa.array(sid),
                       "sh": pa.array([s.tolist() for s in set_l],
                                      type=pa.list_(pa.uint64()))})
        for b in np.unique(bkt):
            sub = st.filter(pa.array(bkt == b))
            pq_.write_table(sub, os.path.join(
                scratch, f"bucket={int(b)}", f"{uuid.uuid4().hex}.parquet"))
        pfx = np.concatenate(pfx_l)
        return pa.table({
            "pfx": pa.array(pfx, type=pa.uint64()),
            "doc_id": pa.array(np.concatenate(did_l), type=pa.int64()),
            "gkey": pa.array((pfx % _N_PARTS).astype(np.int32)),
        })

    def candidate_partition(df: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs of one salted partition: vectorized per-shingle
        group boundary recovery, triu pairs per group, df cutoff. Sentinel
        rows (doc_a = -1, unique negative doc_b) carry the skipped-group
        count out through the dedup groupby untouched."""
        df = df.sort_values(["pfx", "doc_id"], kind="mergesort")
        pfx = df["pfx"].to_numpy()
        dids = df["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, pfx[1:] != pfx[:-1]])
        ends = np.r_[starts[1:], len(df)]
        sizes = ends - starts
        outs_a, outs_b = [], []
        n_skipped = 0
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            if e - s > max_bucket:
                n_skipped += 1
                continue
            d = dids[s:e]
            ii, jj = np.triu_indices(e - s, k=1)
            outs_a.append(np.minimum(d[ii], d[jj]))
            outs_b.append(np.maximum(d[ii], d[jj]))
        a = (np.concatenate(outs_a) if outs_a
             else np.empty(0, np.int64)).astype(np.int64)
        b = (np.concatenate(outs_b) if outs_b
             else np.empty(0, np.int64)).astype(np.int64)
        skip = np.zeros(len(a), dtype=np.int64)
        if n_skipped:
            gk = int(df["gkey"].iloc[0])
            a = np.append(a, -1)
            b = np.append(b, -(gk + 1))   # unique per partition -> survives dedup
            skip = np.append(skip, n_skipped)
        return pd.DataFrame({"doc_a": a, "doc_b": b, "skip": skip})

    cand = (ds.map_batches(emit_prefixes, batch_format="pyarrow")
              .groupby("gkey")
              .map_groups(candidate_partition, batch_format="pandas"))
    from ray.data.aggregate import Count
    dedup = cand.groupby(["doc_a", "doc_b", "skip"]).aggregate(
        Count(alias_name="_nb"))

    skipped_groups = 0
    try:
        parts: list[pa.Table] = []
        for chunk in dedup.iter_batches(batch_size=chunk_pairs,
                                        batch_format="pyarrow"):
            a = chunk["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = chunk["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            sent = a < 0
            if sent.any():
                skipped_groups += int(
                    chunk["skip"].to_numpy(zero_copy_only=False)[sent].sum())
                a, b = a[~sent], b[~sent]
            if not len(a):
                continue
            need = np.unique(np.concatenate([a, b]))
            need_ref = ray.put(need)
            sets: dict[int, np.ndarray] = {}
            for d in ray.get([_read_set_bucket.remote(
                    os.path.join(scratch, f"bucket={int(k)}"), need_ref)
                    for k in np.unique(need % n_set_buckets)]):
                sets.update(d)
            sets_ref = ray.put(sets)
            futs = [_verify_pairs_exact.remote(a[lo:lo + verify_slice],
                                               b[lo:lo + verify_slice], sets_ref)
                    for lo in range(0, len(a), verify_slice)]
            parts.extend(t for t in ray.get(futs) if len(t))
            del sets_ref, sets
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    if skipped_groups:
        logging.getLogger("scrapy_ray.ppjoin").warning(
            "ppjoin: skipped %d prefix groups larger than max_bucket=%d "
            "(coverage is no longer exact for pairs whose every common "
            "prefix shingle is that hot)", skipped_groups, max_bucket)

    if not parts:
        out = pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                            "doc_b": pd.Series(dtype=np.int64),
                            "jaccard": pd.Series(dtype=np.float64)})
    else:
        out = pa.concat_tables(parts).to_pandas()
    for c in ("doc_a", "doc_b"):
        out[c] = out[c].astype(np.int64)
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    out.attrs["skipped_groups"] = skipped_groups
    return out


# DISTINCT shingles mirror np.unique(hash64(...)); the <3-token whole-text
# fallback mirrors tokens_to_shingles. 3i >= na+nb is the integer-exact
# J >= 1/2 test (no float threshold edge on either side).
SQL_PPJOIN = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, sg FROM (
    SELECT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS sg
    FROM toks, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i) r(i)
    WHERE len(ts) >= 3
    UNION ALL
    SELECT doc_id, array_to_string(ts, ' ') FROM toks
    WHERE len(ts) > 0 AND len(ts) < 3
  )
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
  FROM sh a JOIN sh b ON a.sg = b.sg AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da::BIGINT AS doc_a, db::BIGINT AS doc_b,
       round(i::DOUBLE / (x.n + y.n - i), 4) AS jaccard
FROM inter JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
WHERE 3 * i >= x.n + y.n
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# incremental aggregate maintenance (delta processing)
# ---------------------------------------------------------------------------

# 2024-01-22T00:00:00 in epoch micros: base = first 3 weeks of the corpus,
# delta = the rest. Internal to the Ray side only — the merged state must
# equal the full recompute, so the oracle never sees the cutoff.
_INC_CUTOFF_US = int(pd.Timestamp("2024-01-22").value // 1000)


def _partial_user_state(t: pa.Table) -> pa.Table:
    """Per-batch partial aggregate: (user_id, n_events, sum_cents, max_ts_us).
    Mergeable by construction (count/sum are sums, max is max), so the SAME
    combiner finalizes a slice and merges persisted slice states."""
    from scrapy_ray.pipelines.queries import _cents
    df = pd.DataFrame({
        "user_id": t["user_id"].to_numpy(zero_copy_only=False),
        "cents": _cents(t["value"]).to_numpy(),
        "ts_us": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
    })
    g = df.groupby("user_id", sort=False).agg(
        n_events=("cents", "size"), sum_cents=("cents", "sum"),
        max_ts_us=("ts_us", "max")).reset_index()
    g["gkey"] = (g["user_id"] % _INC_PARTS).astype(np.int32)
    return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)


def _merge_user_state(df: pd.DataFrame) -> pd.DataFrame:
    # called per SALTED partition (user_id % _INC_PARTS), not per user —
    # per-group dispatch over thousands of single-user groups is the
    # measured hotspot; the inner pandas groupby recovers real user
    # boundaries vectorized.
    out = df.groupby("user_id", sort=False).agg(
        n_events=("n_events", "sum"), sum_cents=("sum_cents", "sum"),
        max_ts_us=("max_ts_us", "max")).reset_index()
    out["gkey"] = (out["user_id"] % _INC_PARTS).astype(np.int32)
    return out


_INC_PARTS = 64


def q_incremental_user_state(sf_dir: str):
    """Incremental aggregate maintenance — the delta-processing primitive of
    a recurring corpus build: per-user state (event count, exact cents sum,
    last-seen ts) is computed for the BASE time slice and persisted as
    parquet ("yesterday's run"), the DELTA slice is aggregated separately,
    and the two persisted states are merged by re-reading both files through
    one groupby — never re-scanning base events. The merged state must be
    bit-identical to a full recompute (the oracle): count/sum/max partials
    are associative, so state-merge == recompute by construction, and this
    query proves it end to end. At 100 TB the state table is O(users) —
    orders of magnitude smaller than the event log it summarizes — which is
    the entire economics of the pattern."""
    import os
    import shutil
    import tempfile

    import ray

    scratch = tempfile.mkdtemp(prefix="incstate_", dir="/tmp")
    try:
        ds = _pq(sf_dir, "events", ["user_id", "value", "ts"])

        def run_slice(name: str, lo: int | None, hi: int | None) -> str:
            def sl(t: pa.Table) -> pa.Table:
                us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                m = np.ones(len(us), dtype=bool)
                if hi is not None:
                    m &= us < hi
                if lo is not None:
                    m &= us >= lo
                return _partial_user_state(t.filter(pa.array(m)))
            out = os.path.join(scratch, name)
            (ds.map_batches(sl, batch_format="pyarrow")
               .groupby("gkey").map_groups(_merge_user_state,
                                           batch_format="pandas")
               .write_parquet(out))
            return out

        base = run_slice("base", None, _INC_CUTOFF_US)
        delta = run_slice("delta", _INC_CUTOFF_US, None)
        files = [os.path.join(d, f) for d in (base, delta)
                 for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
        out = (ray.data.read_parquet(files)
                 .groupby("gkey").map_groups(_merge_user_state,
                                             batch_format="pandas")
                 .to_pandas())
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    out["max_ts"] = pd.to_datetime(out.pop("max_ts_us"), unit="us")
    for c in ("user_id", "n_events", "sum_cents"):
        out[c] = out[c].astype(np.int64)
    return (out[["user_id", "n_events", "sum_cents", "max_ts"]]
            .sort_values("user_id").reset_index(drop=True))


SQL_INCREMENTAL_STATE = """
SELECT user_id::BIGINT AS user_id,
       count(*)::BIGINT AS n_events,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents,
       max(ts) AS max_ts
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# triangle counting (oriented wedge join)
# ---------------------------------------------------------------------------


def q_triangle_count_docs(sf_dir: str):
    """Per-node triangle counts over the deterministic doc link graph
    (doc -> (31*doc + c) % N, c in 1..3 — the same graph q_pagerank_docs and
    q_cc_label_propagation walk). The classic distributed shape (Suri &
    Vassilvitskii WWW'11 / Cohen's MapReduce kernel): orient every edge
    low-id -> high-id so each triangle is found exactly once from its
    smallest vertex, emit WEDGES (pairs of out-neighbors) grouped by source,
    then close them with one co-partitioned match against the edge set —
    never an all-pairs or a driver-side adjacency. Three salted hash
    shuffles total: edge dedup + wedge gen (keyed by the smaller endpoint),
    wedge-edge closure (keyed by the candidate closing pair), node-count
    final. ID orientation is enough here because out-degree is bounded by
    construction (~3); on skewed real graphs the orientation key becomes
    (degree, id) — degree rides the same first shuffle."""
    from scrapy_ray.pipelines.queries import _nrows

    n = _nrows(sf_dir, "documents")
    ds = _pq(sf_dir, "documents", ["doc_id"])

    def gen_edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.repeat(ids, 3)
        v = (31 * u + np.tile(np.array([1, 2, 3], dtype=np.int64),
                              len(ids))) % n
        keep = u != v
        a = np.minimum(u[keep], v[keep])
        b = np.maximum(u[keep], v[keep])
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "gkey": pa.array((a % _N_PARTS).astype(np.int32))})

    def wedges_and_edges(df: pd.DataFrame) -> pd.DataFrame:
        # co-located by a: global (a,b) dedup + per-source wedge emission
        df = df.drop_duplicates(["a", "b"]).sort_values(["a", "b"])
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        ends = np.r_[starts[1:], len(a)]
        # edge rows pass through tagged w=-1; wedge rows carry their witness
        rows_k1, rows_k2, rows_w = [a], [b], [np.full(len(a), -1, np.int64)]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            nb = b[s:e]                      # sorted out-neighbors of a[s]
            ii, jj = np.triu_indices(len(nb), k=1)
            rows_k1.append(nb[ii])
            rows_k2.append(nb[jj])
            rows_w.append(np.full(len(ii), a[s], dtype=np.int64))
        k1 = np.concatenate(rows_k1)
        k2 = np.concatenate(rows_k2)
        w = np.concatenate(rows_w)
        return pd.DataFrame({"k1": k1, "k2": k2, "w": w,
                             "gkey": ((k1 * 1000003 + k2) % _N_PARTS
                                      ).astype(np.int32)})

    def close_wedges(df: pd.DataFrame) -> pd.DataFrame:
        ed = df[df["w"] < 0][["k1", "k2"]].drop_duplicates()
        wd = df[df["w"] >= 0]
        tri = wd.merge(ed, on=["k1", "k2"], how="inner")
        node = np.concatenate([tri["w"].to_numpy(), tri["k1"].to_numpy(),
                               tri["k2"].to_numpy()]).astype(np.int64)
        return pd.DataFrame({"node": node,
                             "gkey": (node % _N_PARTS).astype(np.int32)})

    def count_nodes(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=True).size().reset_index(name="n_tri")
        return g

    out = (ds.map_batches(gen_edges, batch_format="pyarrow")
             .groupby("gkey").map_groups(wedges_and_edges, batch_format="pandas")
             .groupby("gkey").map_groups(close_wedges, batch_format="pandas")
             .groupby("gkey").map_groups(count_nodes, batch_format="pandas")
             .to_pandas())
    out = out.rename(columns={"node": "doc_id"})
    for c in ("doc_id", "n_tri"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_TRIANGLES = """
WITH n AS (SELECT count(*) AS cnt FROM documents),
e0 AS (
  SELECT d.doc_id AS u, (31 * d.doc_id + c.c) % n.cnt AS v
  FROM documents d, n, (SELECT unnest([1, 2, 3]) AS c) c
),
e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM e0 WHERE u <> v),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (
  SELECT x AS id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT id::BIGINT AS doc_id, count(*)::BIGINT AS n_tri
FROM nodes GROUP BY id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# skyline (Pareto frontier)
# ---------------------------------------------------------------------------


def _skyline_2d(cents: np.ndarray, date_us: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2D skyline (maximize cents, minimize date):
    x survives iff no y has cents >= x AND date <= x with one strict.
    O(n log n) sweep: sort by (date, -cents); a row survives iff it carries
    its date's max cents AND beats the running max over strictly earlier
    dates. Equal (date, cents) duplicates don't dominate each other — all
    kept. Vectorized throughout."""
    n = len(cents)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-cents, date_us))
    d, c = date_us[order], cents[order]
    grp_start = np.r_[True, d[1:] != d[:-1]]
    # per-date max = first value in each date group (cents descending)
    gmax = c[np.maximum.accumulate(np.where(grp_start, np.arange(n), 0))]
    run = np.maximum.accumulate(np.where(grp_start, gmax, np.iinfo(np.int64).min))
    # running max over STRICTLY earlier dates: shift by one date group
    first_idx = np.maximum.accumulate(np.where(grp_start, np.arange(n), 0))
    prev_run = np.where(first_idx == 0, np.iinfo(np.int64).min,
                        run[np.maximum(first_idx - 1, 0)])
    keep_sorted = (c == gmax) & (c > prev_run)
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask


def q_skyline_orders(sf_dir: str):
    """Pareto-frontier (skyline) query over orders: the set of orders no
    other order beats on BOTH price (higher-or-equal) and date
    (earlier-or-equal, one strict) — 'the earliest order at every achieved
    price level'. The distributed shape is the block-nested-loop skyline:
    every block prunes its LOCAL skyline in the map pass (valid filter —
    domination is transitive, so a globally non-dominated row is
    non-dominated in its block), and only the tiny union of block skylines
    reaches the final exact sweep. The big side is never shuffled; output
    and final-stage input are O(skyline), not O(rows). Price compares on
    exact integer cents (CLAUDE float rule)."""
    from scrapy_ray.pipelines.queries import _cents

    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def local_skyline(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"]).to_numpy()
        dus = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = _skyline_2d(cents, dus)
        return pa.table({
            "o_orderkey": pa.array(
                t["o_orderkey"].to_numpy(zero_copy_only=False)[m], pa.int64()),
            "price_cents": pa.array(cents[m], pa.int64()),
            "date_us": pa.array(dus[m], pa.int64()),
        })

    surv = ds.map_batches(local_skyline, batch_format="pyarrow").to_pandas()
    m = _skyline_2d(surv["price_cents"].to_numpy(),
                    surv["date_us"].to_numpy())
    out = surv.loc[m].copy()
    out["o_orderdate"] = pd.to_datetime(out.pop("date_us"), unit="us")
    for c in ("o_orderkey", "price_cents"):
        out[c] = out[c].astype(np.int64)
    return (out[["o_orderkey", "price_cents", "o_orderdate"]]
            .sort_values("o_orderkey").reset_index(drop=True))


SQL_SKYLINE = """
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderdate
  FROM orders
),
dm AS (SELECT o_orderdate AS d, max(cents) AS mx FROM o GROUP BY 1),
dmw AS (
  SELECT d, mx, max(mx) OVER (ORDER BY d
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmx
  FROM dm
)
SELECT x.o_orderkey::BIGINT AS o_orderkey, x.cents AS price_cents,
       x.o_orderdate
FROM o x JOIN dmw ON dmw.d = x.o_orderdate
WHERE x.cents = dmw.mx AND (dmw.prevmx IS NULL OR x.cents > dmw.prevmx)
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# mode (argmax) per group
# ---------------------------------------------------------------------------


def q_mode_event_type(sf_dir: str):
    """Per-user modal event type (the categorical argmax aggregate the
    sum/max family doesn't cover), deterministic tie-break = lexicographically
    smallest type. Shape: in-batch partial (user, type) counts shrink the
    shuffle to O(users x types) cells, one salted groupby re-sums partials
    and takes the per-user argmax vectorized (sort by count desc + first-row
    mask — no per-group dispatch)."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pylist(),
        })
        g = (df.groupby(["user_id", "event_type"], sort=False)
               .size().reset_index(name="n"))
        g["gkey"] = (g["user_id"] % _INC_PARTS).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["user_id", "event_type"], sort=False)["n"]
               .sum().reset_index())
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        u = g["user_id"].to_numpy()
        first = np.r_[True, u[1:] != u[:-1]]
        out = g.loc[first, ["user_id", "event_type", "n"]]
        return out.rename(columns={"event_type": "mode_event_type",
                                   "n": "n_events"})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("gkey").map_groups(argmax, batch_format="pandas")
             .to_pandas())
    for c in ("user_id", "n_events"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


SQL_MODE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY n DESC, event_type) AS rk
  FROM c
)
SELECT user_id::BIGINT AS user_id, event_type AS mode_event_type,
       n::BIGINT AS n_events
FROM r WHERE rk = 1 ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# audience overlap (exact pairwise distinct intersections + HLL in-query check)
# ---------------------------------------------------------------------------


def q_event_type_overlap(sf_dir: str):
    """Pairwise audience overlap between event types: for every type pair,
    exact distinct-user counts (each side, intersection, union) — the
    segmentation table behind 'how much do these cohorts overlap'. ONE
    salted hash shuffle co-partitions users; each partition dedups its
    (user, type) pairs, self-joins them per user (bounded: a user holds at
    most n_types rows), and emits partial pair/type counts plus per-type
    partial HLL sketches that ride the same pass. The driver reduces
    O(types^2) cells and 4 KB sketches — never user-level data.

    The sketch guarantee is enforced IN-QUERY, driver-visible: per-type and
    union HLL estimates must sit within 6% of the exact counts computed by
    the same query (the skew.py approx_distinct bar), and the
    inclusion-exclusion intersection estimate within 10% of the union.
    Output columns are all exact integers, so the row stays fully
    SQL-replayable (green oracle) while the approximate path is verified on
    every run."""
    from scrapy_ray.functions.hashing import hash64
    from scrapy_ray.functions.sketch import HLL

    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def pairs_batch(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pylist(),
        }).drop_duplicates()
        df["gkey"] = (df["user_id"] % _INC_PARTS).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def partition_overlap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "event_type"])
        p = df.merge(df, on="user_id")
        p = p[p["event_type_x"] < p["event_type_y"]]
        pc_ = (p.groupby(["event_type_x", "event_type_y"], sort=False)
                .size().reset_index(name="n"))
        rows = {"ta": list(pc_["event_type_x"]),
                "tb": list(pc_["event_type_y"]),
                "n": list(pc_["n"].astype(np.int64)),
                "sk": [b""] * len(pc_)}
        for ty, sub in df.groupby("event_type", sort=False):
            h = hash64([str(u) for u in sub["user_id"].tolist()])
            rows["ta"].append(ty)
            rows["tb"].append("")
            rows["n"].append(np.int64(len(sub)))
            rows["sk"].append(HLL().add_many(h).to_bytes())
        return pd.DataFrame(rows)

    parts = (ds.map_batches(pairs_batch, batch_format="pyarrow")
               .groupby("gkey").map_groups(partition_overlap,
                                           batch_format="pandas")
               .to_pandas())
    typ = parts[parts["tb"] == ""]
    n_type = typ.groupby("ta")["n"].sum().to_dict()
    hlls: dict[str, HLL] = {}
    for ty, raw in zip(typ["ta"], typ["sk"]):
        hlls.setdefault(ty, HLL()).merge(HLL.from_bytes(raw))
    pairc = (parts[parts["tb"] != ""].groupby(["ta", "tb"])["n"]
             .sum().to_dict())
    types = sorted(n_type)
    out = {"type_a": [], "type_b": [], "n_a": [], "n_b": [],
           "n_inter": [], "n_union": []}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            na, nb = int(n_type[a]), int(n_type[b])
            ni = int(pairc.get((a, b), 0))
            nu = na + nb - ni
            est_a, est_b = hlls[a].estimate(), hlls[b].estimate()
            est_u = HLL(hlls[a].reg.copy()).merge(hlls[b]).estimate()
            assert abs(est_a - na) / max(1, na) < 0.06, (a, est_a, na)
            assert abs(est_b - nb) / max(1, nb) < 0.06, (b, est_b, nb)
            assert abs(est_u - nu) / max(1, nu) < 0.06, (a, b, est_u, nu)
            assert abs((est_a + est_b - est_u) - ni) <= 0.10 * nu, \
                (a, b, est_a + est_b - est_u, ni, nu)
            out["type_a"].append(a)
            out["type_b"].append(b)
            out["n_a"].append(na)
            out["n_b"].append(nb)
            out["n_inter"].append(ni)
            out["n_union"].append(nu)
    res = pd.DataFrame(out)
    for c in ("n_a", "n_b", "n_inter", "n_union"):
        res[c] = res[c].astype(np.int64)
    return res


SQL_OVERLAP = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
c AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
p AS (
  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_inter
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
p0 AS (
  SELECT ca.event_type AS ta, cb.event_type AS tb, ca.n AS na, cb.n AS nb
  FROM c ca JOIN c cb ON ca.event_type < cb.event_type
)
SELECT p0.ta AS type_a, p0.tb AS type_b, p0.na::BIGINT AS n_a,
       p0.nb::BIGINT AS n_b, COALESCE(p.n_inter, 0)::BIGINT AS n_inter,
       (p0.na + p0.nb - COALESCE(p.n_inter, 0))::BIGINT AS n_union
FROM p0 LEFT JOIN p ON p.ta = p0.ta AND p.tb = p0.tb
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# funnel (ordered event-sequence matching)
# ---------------------------------------------------------------------------


def q_funnel(sf_dir: str):
    """Conversion funnel signup -> view -> purchase: per user, the first
    signup, the first view STRICTLY after it, and the first purchase
    strictly after that view; only fully-converted users are emitted — the
    ordered-sequence-matching family (sessionize cuts on gaps, as-of joins
    one step; a funnel chains ordered minima across stages). One salted
    hash shuffle co-partitions each user's events; the three-stage chain is
    pandas groupby minima + thresholds inside the partition, no per-row
    loop. Strictness on exact microsecond integers matches the SQL `>`."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type", "ts"])

    def with_key(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"],
                        value_set=pa.array(["signup", "view", "purchase"]))
        t = t.filter(keep)
        g = (t["user_id"].to_numpy(zero_copy_only=False) % _INC_PARTS
             ).astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def chain(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].astype("int64")
        et = df["event_type"]
        u = df["user_id"]
        s = ts[et == "signup"].groupby(u[et == "signup"]).min()
        after_s = (et == "view") & (ts > u.map(s))
        v = ts[after_s].groupby(u[after_s]).min()
        after_v = (et == "purchase") & (ts > u.map(v))
        p = ts[after_v].groupby(u[after_v]).min()
        out = pd.DataFrame({"first_signup": s, "first_view": v,
                            "first_purchase": p}).dropna()
        out.index.name = "user_id"
        out = out.reset_index()
        for c in ("first_signup", "first_view", "first_purchase"):
            out[c] = pd.to_datetime(out[c].astype(np.int64), unit="us")
        return out

    out = (ds.map_batches(with_key, batch_format="pyarrow")
             .groupby("gkey").map_groups(chain, batch_format="pandas")
             .to_pandas())
    out["user_id"] = out["user_id"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


SQL_FUNNEL = """
WITH s AS (
  SELECT user_id, min(ts) AS first_signup FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
v AS (
  SELECT e.user_id, min(e.ts) AS first_view
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s.first_signup GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS first_purchase
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > v.first_view GROUP BY 1
)
SELECT s.user_id::BIGINT AS user_id, s.first_signup, v.first_view,
       p.first_purchase
FROM s JOIN v USING (user_id) JOIN p USING (user_id)
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# grouped Pearson correlation (exact integer moments)
# ---------------------------------------------------------------------------


def q_corr_price_day(sf_dir: str):
    """Per-status Pearson correlation between order price (whole dollars)
    and day-of-month — the second-moment aggregate family (corr/cov/var).
    The float-sum rule makes naive corr() uncomparable across engines, so
    the moments (n, Sx, Sy, Sxy, Sxx, Syy) are accumulated as EXACT int64
    partials inside map_batches (dollar-quantized x keeps Sxx < 2^63) and
    only the final scalar r is computed in float64 — from identical
    integers via the identical expression on both sides, then rounded to
    6 dp half-away-from-zero. Shuffle payload is six ints per (block,
    status) cell."""
    ds = _pq(sf_dir, "orders",
             ["o_orderstatus", "o_totalprice", "o_orderdate"])

    def moments(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(t["o_totalprice"], ndigits=0,
                             round_mode="half_towards_infinity"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        dus = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = pd.to_datetime(pd.Series(dus), unit="us").dt.day.to_numpy() \
            .astype(np.int64)
        df = pd.DataFrame({"status": t["o_orderstatus"].to_pylist(),
                           "n": 1, "sx": x, "sy": y, "sxy": x * y,
                           "sxx": x * x, "syy": y * y})
        g = df.groupby("status", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("status", sort=True).sum().reset_index()
        n = g["n"].astype(np.float64)
        sx, sy = g["sx"].astype(np.float64), g["sy"].astype(np.float64)
        sxy = g["sxy"].astype(np.float64)
        sxx, syy = g["sxx"].astype(np.float64), g["syy"].astype(np.float64)
        r = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx)
                                          * (n * syy - sy * sy))
        r6 = np.sign(r) * np.floor(np.abs(r) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({"o_orderstatus": g["status"],
                             "n_orders": g["n"].astype(np.int64),
                             "corr6": r6})

    out = (ds.map_batches(moments, batch_format="pyarrow")
             .groupby("status").map_groups(finalize, batch_format="pandas")
             .to_pandas())
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


# identical integer moments, identical float expression, identical rounding
SQL_CORR = """
WITH m AS (
  SELECT o_orderstatus,
         count(*)::BIGINT AS n,
         sum(CAST(round(o_totalprice) AS BIGINT))::BIGINT AS sx,
         sum(day(o_orderdate))::BIGINT AS sy,
         sum(CAST(round(o_totalprice) AS BIGINT) * day(o_orderdate))::BIGINT AS sxy,
         sum(CAST(round(o_totalprice) AS BIGINT)
             * CAST(round(o_totalprice) AS BIGINT))::BIGINT AS sxx,
         sum(day(o_orderdate) * day(o_orderdate))::BIGINT AS syy
  FROM orders GROUP BY 1
)
SELECT o_orderstatus, n AS n_orders,
       round((n::DOUBLE * sxy - sx::DOUBLE * sy)
             / sqrt((n::DOUBLE * sxx - sx::DOUBLE * sx)
                    * (n::DOUBLE * syy - sy::DOUBLE * sy)), 6) AS corr6
FROM m ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# grouped Shannon entropy (information-theoretic aggregate)
# ---------------------------------------------------------------------------


def q_entropy_event_mix(sf_dir: str):
    """Per-user Shannon entropy (bits) of the event-type mix — the behavior-
    diversity score (0 = single-type user, log2(5) = uniform). Same moment
    discipline as the correlation query: the shuffle carries only exact
    integer (user, type) cell counts; entropy is finalized in float64 from
    identical integers via the identical expression both sides
    (-sum(c/n*log2(c/n))), rounded to 6 dp half-away."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pylist(),
        })
        g = (df.groupby(["user_id", "event_type"], sort=False)
               .size().reset_index(name="c"))
        g["gkey"] = (g["user_id"] % _INC_PARTS).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["user_id", "event_type"], sort=False)["c"]
               .sum().reset_index())
        n = g.groupby("user_id")["c"].transform("sum").astype(np.float64)
        p = g["c"].astype(np.float64) / n
        g["h"] = -p * np.log2(p)
        out = g.groupby("user_id").agg(n_events=("c", "sum"),
                                       entropy=("h", "sum")).reset_index()
        out["entropy6"] = (np.sign(out["entropy"])
                           * np.floor(np.abs(out["entropy"]) * 1e6 + 0.5) / 1e6)
        return out[["user_id", "n_events", "entropy6"]]

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("gkey").map_groups(finalize, batch_format="pandas")
             .to_pandas())
    for c in ("user_id", "n_events"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


# Float-sum caveat: the per-user sum has at most n_types (=5) addends, whose
# addition order DuckDB does not pin — a last-ulp divergence before round6
# is possible in principle but needs the true value within 1 ulp of a
# 0.5e-6 boundary (~1e-11 per row); the exact-int columns are unaffected.
SQL_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
e AS (
  SELECT user_id, c,
         -(c::DOUBLE / sum(c) OVER (PARTITION BY user_id))
           * log2(c::DOUBLE / sum(c) OVER (PARTITION BY user_id)) AS h
  FROM c
)
SELECT user_id::BIGINT AS user_id, sum(c)::BIGINT AS n_events,
       round(sum(h), 6) AS entropy6
FROM e GROUP BY user_id ORDER BY user_id
"""


QUERIES7 = {
    "ppjoin_neardup": (q_ppjoin_neardup, SQL_PPJOIN),
    "incremental_user_state": (q_incremental_user_state, SQL_INCREMENTAL_STATE),
    "triangle_count_docs": (q_triangle_count_docs, SQL_TRIANGLES),
    "skyline_orders": (q_skyline_orders, SQL_SKYLINE),
    "mode_event_type": (q_mode_event_type, SQL_MODE),
    "event_type_overlap": (q_event_type_overlap, SQL_OVERLAP),
    "funnel_signup_view_purchase": (q_funnel, SQL_FUNNEL),
    "corr_price_day_by_status": (q_corr_price_day, SQL_CORR),
    "entropy_event_mix": (q_entropy_event_mix, SQL_ENTROPY),
}
