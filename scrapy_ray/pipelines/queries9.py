"""Ninth oracle-query batch: stateful sequential scans and statistical
testing —

- per-user EWMA (alpha = 1/2) over the deterministic (ts, event_id) event
  order: an inherently SEQUENTIAL recurrence (each value depends on the
  previous state) — the family running totals/windows can't express.
  Mirrored step-for-step against a DuckDB RECURSIVE CTE: both sides run
  the identical float64 recurrence on identical integer cents in the
  identical order, so the final state matches bit-for-bit before round6;
- chi-square divergence of the event-type mix between two user cohorts
  (A/B-shaped statistical test): exact integer contingency cells ride the
  shuffle, the statistic finalizes in float64 from identical integers via
  the identical expression both sides;
- SemDeDup (cluster-then-dedup semantic dedup, Abbas et al. 2023): the
  suite's fixed-point k-means supplies clusters, near-dup removal happens
  only within a cluster — integer-exact cosine test, keep-min-id rule;
- greedy sequence packing (tokenize-and-pack): the pretraining write-side
  operator — fixed token budget, first-fit scan per hash shard, RECURSIVE
  CTE oracle replaying the identical prefix-scan-with-resets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_P = 64


# ---------------------------------------------------------------------------
# per-user EWMA (sequential stateful scan)
# ---------------------------------------------------------------------------


def q_ewma_user_value(sf_dir: str):
    """Final exponentially-weighted moving average (alpha = 1/2) of each
    user's event values: s_1 = c_1; s_k = (s_{k-1} + c_k) / 2, over exact
    integer cents in the deterministic (ts, event_id) order. One
    user-co-partitioned shuffle; the recurrence runs inside the partition
    (a sequential dependence has no vectorized form — the loop is the
    operator; at 100 TB each partition scans only its own users' rows
    once). The oracle replays the identical recurrence with a RECURSIVE
    CTE, so every intermediate float64 state is bit-identical and round6
    touches equal numbers."""
    ds = _pq(sf_dir, "events", ["user_id", "value", "ts", "event_id"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % _P).astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        c = (np.sign(df["value"].to_numpy() * 100.0)
             * np.floor(np.abs(df["value"].to_numpy() * 100.0) + 0.5))
        users, ns, ewmas = [], [], []
        i, n = 0, len(u)
        while i < n:
            j = i
            s = c[i]
            while j + 1 < n and u[j + 1] == u[i]:
                j += 1
                s = (s + c[j]) / 2.0
            users.append(u[i])
            ns.append(j - i + 1)
            ewmas.append(s)
            i = j + 1
        return pd.DataFrame({"user_id": np.asarray(users, dtype=np.int64),
                             "n_events": np.asarray(ns, dtype=np.int64),
                             "ewma6": _round6(np.asarray(ewmas))})

    out = (ds.map_batches(with_key, batch_format="pyarrow")
             .groupby("gkey").map_groups(scan, batch_format="pandas")
             .to_pandas())
    for c in ("user_id", "n_events"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


SQL_EWMA = """
WITH RECURSIVE e AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS c,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rk
  FROM events
),
mx AS (SELECT user_id, max(rk) AS n FROM e GROUP BY 1),
r AS (
  SELECT user_id, rk, c::DOUBLE AS s FROM e WHERE rk = 1
  UNION ALL
  SELECT e.user_id, e.rk, (r.s + e.c::DOUBLE) / 2.0
  FROM r JOIN e ON e.user_id = r.user_id AND e.rk = r.rk + 1
)
SELECT r.user_id::BIGINT AS user_id, mx.n::BIGINT AS n_events,
       round(r.s, 6) AS ewma6
FROM r JOIN mx ON mx.user_id = r.user_id AND mx.n = r.rk
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# chi-square cohort divergence (statistical testing)
# ---------------------------------------------------------------------------


def q_chisq_event_mix(sf_dir: str):
    """Pearson chi-square statistic for 'do even- and odd-id user cohorts
    draw event types from the same distribution?' — the A/B-test aggregate.
    The contingency table (cohort x type) accumulates as exact int64 cells
    inside map_batches (the shuffle carries O(2 x types) integers); the
    statistic sum((obs - exp)^2 / exp) finalizes in float64 from identical
    integers via the identical expression both sides. Returns one row per
    type (its contribution) so the output is a table, not a scalar."""
    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def cells(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cohort": (t["user_id"].to_numpy(zero_copy_only=False) % 2
                       ).astype(np.int64),
            "event_type": t["event_type"].to_pylist(),
        })
        g = (df.groupby(["cohort", "event_type"], sort=False)
               .size().reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = (ds.map_batches(cells, batch_format="pyarrow").to_pandas()
               .groupby(["cohort", "event_type"], sort=True)["n"]
               .sum().reset_index())
    piv = parts.pivot(index="event_type", columns="cohort",
                      values="n").fillna(0).astype(np.int64)
    o0 = piv[0].to_numpy(dtype=np.float64)
    o1 = piv[1].to_numpy(dtype=np.float64)
    r0, r1 = o0.sum(), o1.sum()
    tot = r0 + r1
    colt = o0 + o1
    e0 = r0 * colt / tot
    e1 = r1 * colt / tot
    d0, d1 = o0 - e0, o1 - e1
    chi = d0 * d0 / e0 + d1 * d1 / e1
    out = pd.DataFrame({
        "event_type": piv.index,
        "n_cohort0": piv[0].to_numpy(dtype=np.int64),
        "n_cohort1": piv[1].to_numpy(dtype=np.int64),
        "chisq6": _round6(chi),
    })
    return out.reset_index(drop=True)


SQL_CHISQ = """
WITH c AS (
  SELECT (user_id % 2)::BIGINT AS cohort, event_type,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT event_type,
         sum(CASE WHEN cohort = 0 THEN n ELSE 0 END)::BIGINT AS o0,
         sum(CASE WHEN cohort = 1 THEN n ELSE 0 END)::BIGINT AS o1
  FROM c GROUP BY 1
),
t AS (
  SELECT sum(o0)::BIGINT AS r0, sum(o1)::BIGINT AS r1,
         sum(o0 + o1)::BIGINT AS tot
  FROM p
),
e AS (
  -- expected counts: identical (r * col) / tot evaluation order as the
  -- Ray side; (obs-exp)^2 is spelled d*d (pow() need not bit-match x*x)
  SELECT p.event_type, p.o0, p.o1,
         t.r0::DOUBLE * (p.o0 + p.o1)::DOUBLE / t.tot::DOUBLE AS e0,
         t.r1::DOUBLE * (p.o0 + p.o1)::DOUBLE / t.tot::DOUBLE AS e1
  FROM p CROSS JOIN t
)
SELECT event_type, o0 AS n_cohort0, o1 AS n_cohort1,
       round((o0::DOUBLE - e0) * (o0::DOUBLE - e0) / e0
             + (o1::DOUBLE - e1) * (o1::DOUBLE - e1) / e1, 6) AS chisq6
FROM e ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Gini coefficient per group (inequality aggregate, histogram-rank form)
# ---------------------------------------------------------------------------


def q_gini_order_value(sf_dir: str):
    """Per-status Gini coefficient of order value — the
    inequality/concentration aggregate (0 = all orders equal, →1 = one
    order holds all the value). The textbook formula needs ranks over a
    GLOBAL per-group sort; this uses the value-HISTOGRAM decomposition
    instead (the ntile_orders trick): for a value v with count c and
    cumulative count b below it, its rows occupy ranks b+1..b+c whose sum
    is c*b + c(c+1)/2 — tie order never matters because tied rows carry
    the same value. So the shuffle moves O(distinct cents) exact integer
    cells, never rows, and no global sort exists. Rank-sum magnitude is
    n^2*x_max (~1e18 at sf0.1) — int64-safe here; at 1e8+ rows per group
    the rank sums need int128/python-int accumulation (documented bound).
    Finalization float64, identical expression both sides, round6."""
    ds = _pq(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def cells(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "s": t["o_orderstatus"].to_pylist(),
            "v": _cents(t["o_totalprice"]).to_numpy(),
        })
        g = df.groupby(["s", "v"], sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("v", sort=True)["c"].sum().reset_index())
        v = g["v"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        b = np.concatenate([[0], np.cumsum(c)[:-1]])
        n = int(c.sum())
        sx = int((v * c).sum())
        sr = int((v * (c * b + c * (c + 1) // 2)).sum())
        gini6 = _round6(np.array([(2.0 * float(sr)
                                   - float(n + 1) * float(sx))
                                  / (float(n) * float(sx))]))[0]
        return pd.DataFrame({"o_orderstatus": [df["s"].iloc[0]],
                             "n_orders": [np.int64(n)],
                             "gini6": [gini6]})

    out = (ds.map_batches(cells, batch_format="pyarrow")
             .groupby("s").map_groups(gini, batch_format="pandas")
             .to_pandas())
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


SQL_GINI = """
WITH x AS (
  SELECT o_orderstatus AS s,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
h AS (SELECT s, v, count(*)::BIGINT AS c FROM x GROUP BY 1, 2),
k AS (
  SELECT s, v, c,
         COALESCE(sum(c) OVER (PARTITION BY s ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS b
  FROM h
),
a AS (
  SELECT s, sum(c)::BIGINT AS n, sum(v * c)::BIGINT AS sx,
         sum(v * (c * b + c * (c + 1) // 2))::BIGINT AS sr
  FROM k GROUP BY 1
)
SELECT s AS o_orderstatus, n AS n_orders,
       round((2 * sr::DOUBLE - (n + 1)::DOUBLE * sx::DOUBLE)
             / (n::DOUBLE * sx::DOUBLE), 6) AS gini6
FROM a ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# max concurrent sessions (sweep line = distributed prefix scan with carry)
# ---------------------------------------------------------------------------


def q_max_concurrent_sessions(sf_dir: str):
    """Peak number of simultaneously-active user sessions (30-min-gap
    sessions, active on [first_ts, last_ts] inclusive) and the earliest
    instant it is reached — the sweep-line/max-overlap query, and the one
    shape in this suite that needs a GLOBAL PREFIX SCAN rather than a
    keyed aggregate. Classic two-phase parallel scan: sessions emit
    (+1 at start, -1 at end) deltas; deltas hash into hour buckets where
    each bucket computes (sum, local peak over its +1 rows, earliest peak
    ts) over its (ts, delta desc)-sorted slice; the driver prefix-sums the
    O(buckets) carry totals and combines — no global sort, driver work
    O(hours). Tie rule mirrored in SQL: at one instant starts apply before
    ends (delta DESC), so back-to-back sessions overlap at the boundary;
    within-tie identity order provably cannot change the peak value or its
    timestamp. All-integer output — no float discipline needed."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % _P).astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def sessions_to_deltas(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        new_user = np.r_[True, u[1:] != u[:-1]]
        brk = new_user | (np.r_[0, np.diff(ts)] > 30 * 60 * 1_000_000)
        sid = np.cumsum(brk)
        s = pd.DataFrame({"sid": sid, "ts": ts})
        g = s.groupby("sid", sort=False)["ts"].agg(["min", "max"])
        d_ts = np.concatenate([g["min"].to_numpy(), g["max"].to_numpy()])
        d = np.concatenate([np.ones(len(g), np.int64),
                            -np.ones(len(g), np.int64)])
        return pd.DataFrame({"ts": d_ts, "delta": d,
                             "bucket": d_ts // 3_600_000_000})

    def bucket_scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "delta"], ascending=[True, False],
                            kind="mergesort")
        run = df["delta"].to_numpy().cumsum()
        plus = df["delta"].to_numpy() == 1
        if plus.any():
            peak = int(run[plus].max())
            tss = df["ts"].to_numpy()
            peak_ts = int(tss[plus & (run == peak)].min())
        else:
            # ends-only bucket (sessions close, none open): no peak
            # candidate here — peak_ts=-1 marks it; the driver must MASK
            # these rows out, never add the sentinel to an offset (int64
            # min + offset silently wraps in numpy)
            peak, peak_ts = 0, -1
        return pd.DataFrame({"bucket": [int(df["bucket"].iloc[0])],
                             "total": [int(run[-1])],
                             "peak": [peak], "peak_ts": [peak_ts]})

    parts = (ds.map_batches(with_key, batch_format="pyarrow")
               .groupby("gkey").map_groups(sessions_to_deltas,
                                           batch_format="pandas")
               .groupby("bucket").map_groups(bucket_scan,
                                             batch_format="pandas")
               .to_pandas()
               .sort_values("bucket").reset_index(drop=True))
    offsets = np.concatenate([[0], parts["total"].to_numpy().cumsum()[:-1]])
    valid = parts["peak_ts"].to_numpy() >= 0   # buckets that saw a +1
    cand = offsets[valid] + parts["peak"].to_numpy()[valid]
    gmax = int(cand.max())
    vidx = np.flatnonzero(valid)
    first_b = int(vidx[np.flatnonzero(cand == gmax)[0]])
    peak_ts = int(parts["peak_ts"].iloc[first_b])
    return pd.DataFrame({
        "max_concurrent": pd.Series([gmax], dtype=np.int64),
        "first_peak_ts": [pd.to_datetime(peak_ts, unit="us")],
    })


SQL_MAX_CONCURRENT = """
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  -- (ts, event_id) in the cumsum too: a tied-ts row must not be split
  -- across the session boundary by unspecified within-tie order
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
),
sess AS (SELECT user_id, sid, min(ts) AS st, max(ts) AS en
         FROM s GROUP BY 1, 2),
d AS (
  SELECT st AS ts, 1 AS delta FROM sess
  UNION ALL
  SELECT en, -1 FROM sess
),
r AS (
  SELECT ts, delta,
         sum(delta) OVER (ORDER BY ts, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM d
),
p AS (SELECT ts, run FROM r WHERE delta = 1)
SELECT (SELECT max(run) FROM p)::BIGINT AS max_concurrent,
       (SELECT min(ts) FROM p
        WHERE run = (SELECT max(run) FROM p)) AS first_peak_ts
"""


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup = k-means clusters -> within-cluster cosine
# near-dup -> keep lowest vec_id (Abbas et al. 2023)
# ---------------------------------------------------------------------------

_SD_Q = 2000          # fixed-point scale for the cosine test (see below)
_SD_NUM, _SD_DEN = 7, 20   # tau = 7/20 = 0.35, the suite's near-dup bar


def q_semdedup_embeddings(sf_dir: str):
    """SemDeDup: cluster the embedding table with the suite's fixed-point
    k-means (broadcast centroids, zero-shuffle passes), then within each
    cluster drop every vector that has a SMALLER-vec_id near-duplicate
    (cos >= 0.35) — pairwise comparison happens only inside a cluster, so
    the all-pairs matmul the brute near-dup needs never forms; at 100 TB
    the per-cluster Gram matrix is the bounded working set (clusters are
    capped by k, and a skewed cluster salts into sub-blocks exactly like
    the LSH buckets). ONE groupby(cluster) shuffle carries (vec_id, ei)
    rows; driver work is O(1). The cosine test is exact integer
    arithmetic — with ei = floor(e * 2000) (unit-norm input, so
    |dot| <~ Q^2 = 4e6), `cos >= 7/20` becomes `dot > 0 AND
    400*dot^2 >= 49*|a|^2*|b|^2`, all magnitudes < 2^63 — so the kept set
    is bit-exact against the chained-CTE DuckDB oracle with no float
    discipline at all."""
    from scrapy_ray.pipelines.queries6 import _kmeans_centroids, _kmeans_eint

    ds = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = _kmeans_centroids(sf_dir, ds)

    def assign(t: pa.Table) -> pa.Table:
        ids, Ei = _kmeans_eint(t)          # Q=1e6 ints: assignment metric
        d2 = ((Ei[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        E = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        V = np.floor(E * _SD_Q).astype(np.int64)   # Q=2e3 ints: cosine test
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster": pa.array(a.astype(np.int64)),
            "ei": pa.array(list(V), type=pa.list_(pa.int64())),
        })

    def cluster_dedup(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy().astype(np.int64)
        o = np.argsort(ids, kind="mergesort")  # keep-min-id needs id order
        ids = ids[o]
        V = np.stack([np.asarray(v, dtype=np.int64)
                      for v in df["ei"].to_numpy()[o]])
        G = V @ V.T                      # |dot| <~ Q^2 = 4e6
        n2 = np.diag(G).copy()
        cond = (G > 0) & (_SD_DEN ** 2 * G * G
                          >= _SD_NUM ** 2 * np.outer(n2, n2))
        removed = np.tril(cond, k=-1).any(axis=1)  # a smaller-id near-dup
        return pd.DataFrame({
            "vec_id": ids,
            "cluster": np.full(len(ids), int(df["cluster"].iloc[0]),
                               dtype=np.int64),
            "kept": (~removed).astype(np.int64),
        })

    out = (ds.map_batches(assign, batch_format="pyarrow")
             .groupby("cluster").map_groups(cluster_dedup,
                                            batch_format="pandas")
             .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("vec_id").reset_index(drop=True)


def _semdedup_sql() -> str:
    from scrapy_ray.pipelines.queries6 import _kmeans_sql_prefix
    return _kmeans_sql_prefix() + f""", asn AS (
  SELECT vec_id, j FROM af WHERE rn = 1
), e2 AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {_SD_Q}) AS BIGINT)) AS ei
  FROM embeddings
), ed2 AS (
  SELECT vec_id, g.d, ei[g.d] AS v
  FROM e2, LATERAL (SELECT unnest(generate_series(1, 64)) AS d) g
), nrm AS (
  SELECT vec_id, SUM(v * v)::BIGINT AS n2 FROM ed2 GROUP BY 1
), pr AS (
  SELECT a.vec_id AS i, b.vec_id AS jv, SUM(da.v * db.v)::BIGINT AS dot
  FROM asn a JOIN asn b ON a.j = b.j AND b.vec_id < a.vec_id
  JOIN ed2 da ON da.vec_id = a.vec_id
  JOIN ed2 db ON db.vec_id = b.vec_id AND db.d = da.d
  GROUP BY a.vec_id, b.vec_id
), dup AS (
  SELECT DISTINCT p.i AS vec_id
  FROM pr p JOIN nrm na ON na.vec_id = p.i
            JOIN nrm nb ON nb.vec_id = p.jv
  WHERE p.dot > 0
    AND {_SD_DEN * _SD_DEN} * p.dot * p.dot >= {_SD_NUM * _SD_NUM} * na.n2 * nb.n2
)
SELECT a.vec_id, CAST(a.j AS BIGINT) AS cluster,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM asn a LEFT JOIN dup d USING (vec_id) ORDER BY a.vec_id"""


# ---------------------------------------------------------------------------
# greedy sequence packing (tokenize-and-pack, the pretraining write-side op)
# ---------------------------------------------------------------------------

_PACK_L = 256   # token budget per packed training sequence
_PACK_S = 16    # hash shards; packing is sequential WITHIN a shard only


def q_pack_sequences(sf_dir: str):
    """Pack documents into fixed-budget training sequences (greedy
    first-fit in deterministic order): docs hash into {_PACK_S} shards
    (same Knuth multiplicative hash as train_shard_export), are ordered by
    (h, doc_id) within the shard, and fill sequences of <= 256 whitespace
    tokens — a doc that would overflow starts the next sequence (oversized
    docs truncate to the budget so one always fits). The greedy fill is a
    prefix scan with resets — inherently sequential, like the EWMA — so
    the distributed contract is sequential-per-shard, embarrassingly
    parallel across shards: ONE tokenize map + ONE groupby(shard) shuffle,
    each partition scans only its own rows once. The oracle replays the
    identical recurrence per shard with a RECURSIVE CTE."""
    import pyarrow.compute as pc

    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = ((ids.astype(np.uint64) % np.uint64(2 ** 32))
             * np.uint64(2654435761)) % np.uint64(2 ** 32)
        ntok = pc.count_substring_regex(t["text"], r"\S+") \
                 .to_numpy().astype(np.int64)
        ntok = np.minimum(ntok, _PACK_L)
        return pa.table({
            "doc_id": pa.array(ids),
            "h": pa.array(h.astype(np.int64)),
            "shard": pa.array((h % np.uint64(_PACK_S)).astype(np.int64)),
            "ntok": pa.array(ntok),
        })

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", "doc_id"], kind="mergesort")
        nt = df["ntok"].to_numpy()
        seq = np.empty(len(nt), np.int64)
        off = np.empty(len(nt), np.int64)
        s, fill = 0, 0
        for k in range(len(nt)):       # the scan IS the operator (see doc)
            if fill + nt[k] > _PACK_L:
                s += 1
                fill = 0
            seq[k] = s
            off[k] = fill
            fill += nt[k]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy().astype(np.int64),
            "shard": df["shard"].to_numpy().astype(np.int64),
            "seq_id": seq, "seq_off": off,
            "ntok": nt.astype(np.int64),
        })

    out = (ds.map_batches(tok, batch_format="pyarrow")
             .groupby("shard").map_groups(pack, batch_format="pandas")
             .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["shard", "seq_id", "seq_off", "doc_id"]) \
              .reset_index(drop=True)


SQL_PACK = f"""
WITH RECURSIVE t AS (
  SELECT doc_id,
         CAST(((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761)
              % 4294967296 AS BIGINT) AS h,
         LEAST(array_length(regexp_extract_all(text, '\\S+')),
               {_PACK_L})::BIGINT AS ntok
  FROM documents
),
base AS (
  SELECT doc_id, ntok, CAST(h % {_PACK_S} AS BIGINT) AS shard,
         row_number() OVER (PARTITION BY h % {_PACK_S}
                            ORDER BY h, doc_id) AS rk
  FROM t
),
r AS (
  SELECT shard, rk, doc_id, ntok,
         0::BIGINT AS seq_id, 0::BIGINT AS seq_off
  FROM base WHERE rk = 1
  UNION ALL
  SELECT b.shard, b.rk, b.doc_id, b.ntok,
         CASE WHEN r.seq_off + r.ntok + b.ntok > {_PACK_L}
              THEN r.seq_id + 1 ELSE r.seq_id END,
         CASE WHEN r.seq_off + r.ntok + b.ntok > {_PACK_L}
              THEN 0 ELSE r.seq_off + r.ntok END
  FROM r JOIN base b ON b.shard = r.shard AND b.rk = r.rk + 1
)
SELECT doc_id, shard, seq_id, seq_off, ntok
FROM r ORDER BY shard, seq_id, seq_off, doc_id
"""


QUERIES9: dict[str, tuple] = {
    "ewma_user_value": (q_ewma_user_value, SQL_EWMA),
    "chisq_event_mix": (q_chisq_event_mix, SQL_CHISQ),
    "gini_order_value": (q_gini_order_value, SQL_GINI),
    "max_concurrent_sessions": (q_max_concurrent_sessions, SQL_MAX_CONCURRENT),
    "semdedup_embeddings": (q_semdedup_embeddings, _semdedup_sql()),
    "pack_sequences": (q_pack_sequences, SQL_PACK),
}
