"""Thirteenth oracle-query batch (round 4 tail) —

- WEIGHTED single-source shortest paths (Bellman-Ford as BSP): the
  weighted upgrade of q_khop_bfs_distance over the same deterministic doc
  graph, one hash shuffle per relaxation round, state rides the stream
  (no Dataset.union). Semantics are exactly "minimum-weight path using at
  most R edges" — R bounded rounds need no convergence detection and the
  recursive-CTE oracle replays the bound verbatim;
- SCD2 validity intervals (the slowly-changing-dimension build every
  warehouse maintains): per user, consecutive runs of the same event_type
  compress into [valid_from, valid_to) intervals with event counts and a
  current flag — one user-co-partitioned pass, vectorized shift compare;
  LAG/LEAD window oracle with the full (ts, event_id) tie-break rule.

All DuckDB-oracle-checked on the same parquet inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Min

from scrapy_ray.pipelines.queries import _nrows, _pq

_P = 64

# ---------------------------------------------------------------------------
# weighted SSSP (Bellman-Ford BSP, hop-bounded)
# ---------------------------------------------------------------------------

_SSSP_SEEDS = 10
_SSSP_R = 6


def _edge_w(u: np.ndarray, c: int) -> np.ndarray:
    """Deterministic integer weight of the edge u -> (u*31+c) % N."""
    return 1 + (u * 7 + c) % 5


def q_sssp_weighted(sf_dir: str):
    """Minimum-WEIGHT distance from the seed set (doc_id < 10) over the
    suite's deterministic doc graph (doc -> (doc*31+c) mod N, c=1..3;
    weight 1+(doc*7+c)%5), over paths of at most 6 edges. Bellman-Ford as
    BSP: each round every settled row re-emits itself and its three
    relaxations; ONE groupby(node).min per round keeps the frontier exact
    — same no-union shape as q_khop_bfs_distance, now with weights (the
    relaxation order independence is what lets rounds be bulk-synchronous).
    Integer-exact; hop-bounded rounds make the contract closed-form, so
    the oracle replays it with a hop-bounded recursive CTE."""
    n = _nrows(sf_dir, "documents")

    def init(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids < _SSSP_SEEDS]
        return pa.table({"node": pa.array(ids),
                         "dist": pa.array(np.zeros(len(ids), np.int64))})

    dist = _pq(sf_dir, "documents", ["doc_id"]).map_batches(
        init, batch_format="pyarrow")

    def relax(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        outs_n = [node]
        outs_d = [d]
        for c in range(1, 4):
            outs_n.append((node * 31 + c) % n)
            outs_d.append(d + _edge_w(node, c))
        return pa.table({"node": pa.array(np.concatenate(outs_n)),
                         "dist": pa.array(np.concatenate(outs_d))})

    for _ in range(_SSSP_R):
        dist = (dist.map_batches(relax, batch_format="pyarrow")
                    .groupby("node").aggregate(Min("dist", alias_name="dist")))

    df = dist.to_pandas().rename(columns={"node": "doc_id"})
    for c in ("doc_id", "dist"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values("doc_id").reset_index(drop=True)


def _sssp_sql(sf_dir: str) -> str:
    # N is baked per scale by oracle construction time — the driver calls
    # oracle_sql() fresh per run, but the SQL string must be static; use a
    # scalar subquery for N instead.
    return f"""
WITH RECURSIVE nn AS (SELECT COUNT(*) AS n FROM documents),
reach(node, dist, hops) AS (
  SELECT doc_id::BIGINT, 0::BIGINT, 0 FROM documents
  WHERE doc_id < {_SSSP_SEEDS}
  UNION
  SELECT ((r.node * 31 + c.c) % nn.n)::BIGINT,
         r.dist + 1 + (r.node * 7 + c.c) % 5,
         r.hops + 1
  FROM reach r, nn, (VALUES (1), (2), (3)) c(c)
  WHERE r.hops < {_SSSP_R}
)
SELECT node AS doc_id, MIN(dist)::BIGINT AS dist
FROM reach GROUP BY node ORDER BY doc_id
"""


SQL_SSSP = _sssp_sql("")


# ---------------------------------------------------------------------------
# SCD2 validity intervals
# ---------------------------------------------------------------------------


def q_scd2_user_status(sf_dir: str):
    """Slowly-changing-dimension (type 2) build: each user's event_type
    stream compresses into validity intervals — consecutive runs of one
    type become (user_id, status, valid_from, valid_to, n_events,
    is_current), valid_to exclusive = the next interval's start (-1 on the
    open current interval). One user-co-partitioned pass; run boundaries
    are a vectorized shift compare over the (ts, event_id)-sorted stream
    (the full tie-break key — CLAUDE.md cumsum rule)."""
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % _P).astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def intervals(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        ty = df["event_type"].to_numpy()
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        new[1:] = (u[1:] != u[:-1]) | (ty[1:] != ty[:-1])
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(df)]
        vu = u[starts]
        vfrom = ts[starts]
        # valid_to = next interval's start within the same user, else -1
        nxt = np.r_[vfrom[1:], -1]
        same_user = np.r_[vu[1:] == vu[:-1], False]
        vto = np.where(same_user, nxt, -1)
        return pd.DataFrame({
            "user_id": vu.astype(np.int64),
            "status": ty[starts],
            "valid_from": vfrom.astype(np.int64),
            "valid_to": vto.astype(np.int64),
            "n_events": (ends - starts).astype(np.int64),
            "is_current": (~same_user).astype(np.int64),
        })

    out = (ds.map_batches(with_key, batch_format="pyarrow")
             .groupby("gkey").map_groups(intervals, batch_format="pandas")
             .to_pandas())
    for c in ("user_id", "valid_from", "valid_to", "n_events", "is_current"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["user_id", "valid_from"])
               .reset_index(drop=True))


SQL_SCD2 = """
WITH o AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         LAG(event_type) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
b AS (
  SELECT *, COUNT(*) FILTER (WHERE prev IS NULL OR prev <> event_type)
            OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS UNBOUNDED PRECEDING) AS grp
  FROM o),
i AS (
  SELECT user_id, grp, ANY_VALUE(event_type) AS status,
         MIN(ts_us)::BIGINT AS valid_from, COUNT(*)::BIGINT AS n_events
  FROM b GROUP BY user_id, grp)
SELECT user_id::BIGINT AS user_id, status, valid_from,
       COALESCE(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY grp),
                -1)::BIGINT AS valid_to,
       n_events,
       (CASE WHEN LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY grp)
             IS NULL THEN 1 ELSE 0 END)::BIGINT AS is_current
FROM i ORDER BY user_id, valid_from
"""


# ---------------------------------------------------------------------------
# time-series resample + forward fill
# ---------------------------------------------------------------------------

_DAY_US = 86_400 * 1_000_000


def q_resample_ffill_daily(sf_dir: str):
    """Per-user DAILY resample with forward fill: for every day in the
    user's [first-event-day, last-event-day] range, the value (cents) of
    the latest event strictly before the end of that day — the gap-filling
    primitive time-series features need. One user-co-partitioned pass;
    per user the fill is one searchsorted over the (ts, event_id)-sorted
    stream (the sort order makes the tie rule exact: last index among
    equal timestamps = highest event_id, the same DESC pick the oracle's
    ROW_NUMBER takes). Output is O(users x days), never joined wide on
    the Ray side."""
    ds = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def with_key(t: pa.Table) -> pa.Table:
        g = (t["user_id"].to_numpy(zero_copy_only=False) % _P).astype(np.int32)
        return t.append_column("gkey", pa.array(g))

    def ffill(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        c = (np.sign(df["value"].to_numpy() * 100.0)
             * np.floor(np.abs(df["value"].to_numpy() * 100.0) + 0.5)) \
            .astype(np.int64)
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        bounds = np.r_[starts, len(u)]
        out_u, out_d, out_c = [], [], []
        for a, b in zip(bounds[:-1], bounds[1:]):
            t_u = ts[a:b]
            d0, d1 = t_u[0] // _DAY_US, t_u[-1] // _DAY_US
            days = np.arange(d0, d1 + 1, dtype=np.int64)
            idx = np.searchsorted(t_u, (days + 1) * _DAY_US, side="left") - 1
            out_u.append(np.full(len(days), u[a], dtype=np.int64))
            out_d.append(days)
            out_c.append(c[a:b][idx])
        return pd.DataFrame({"user_id": np.concatenate(out_u),
                             "day": np.concatenate(out_d),
                             "ffill_cents": np.concatenate(out_c)})

    out = (ds.map_batches(with_key, batch_format="pyarrow")
             .groupby("gkey").map_groups(ffill, batch_format="pandas")
             .to_pandas())
    for c in ("user_id", "day", "ffill_cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


SQL_RESAMPLE_FFILL = f"""
WITH b AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value*100) AS BIGINT) AS c
  FROM events),
r AS (SELECT user_id, MIN(ts_us) // {_DAY_US} AS d0,
             MAX(ts_us) // {_DAY_US} AS d1 FROM b GROUP BY 1),
g AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM r),
q AS (
  SELECT g.user_id, g.day, b.c,
         ROW_NUMBER() OVER (PARTITION BY g.user_id, g.day
                            ORDER BY b.ts_us DESC, b.event_id DESC) AS rn
  FROM g JOIN b ON b.user_id = g.user_id
              AND b.ts_us < (g.day + 1) * {_DAY_US})
SELECT user_id::BIGINT AS user_id, day::BIGINT AS day,
       c::BIGINT AS ffill_cents
FROM q WHERE rn = 1 ORDER BY user_id, day
"""


QUERIES13: dict[str, tuple] = {
    "sssp_weighted": (q_sssp_weighted, SQL_SSSP),
    "scd2_user_status": (q_scd2_user_status, SQL_SCD2),
    "resample_ffill_daily": (q_resample_ffill_daily, SQL_RESAMPLE_FFILL),
}
