"""queries9 pins. The sweep-line query's ends-only-bucket path (an hour
bucket where sessions only CLOSE, none open) is the regression target: the
bucket emits no peak candidate (peak_ts=-1 sentinel) and the driver must
mask those rows out of the offset+peak combine rather than add a sentinel
to an int64 offset (which wraps silently in numpy). The synthetic corpus
below forces such a bucket; DuckDB replays the identical window SQL."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp: str, rows: list[tuple[int, str, int]]) -> str:
    """rows = (user_id, ts iso string, event_id)."""
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    df["ts"] = pd.to_datetime(df["ts"])
    df["event_type"] = "view"
    df["value"] = 1.0
    df["props"] = "{}"
    t = pa.Table.from_pandas(
        df[["event_id", "ts", "user_id", "event_type", "value", "props"]],
        preserve_index=False)
    t = t.set_column(1, "ts", t["ts"].cast(pa.timestamp("us")))
    pq.write_table(t, os.path.join(tmp, "events.parquet"))
    return tmp


def test_max_concurrent_ends_only_bucket(ray_session, tmp_path):
    """Hour bucket 1 contains ONLY session ends (two sessions straddle the
    boundary, nothing starts in it); the global peak is in bucket 0. Before
    the sentinel fix this wrapped int64 and could hijack gmax/peak_ts."""
    from scrapy_ray.pipelines.queries9 import (SQL_MAX_CONCURRENT,
                                               q_max_concurrent_sessions)
    from scrapy_ray.pipelines.oracle import compare, duckdb_run

    rows = [
        # users 1 and 2: sessions 00:50 -> 01:10 (30-min-gap chain), so
        # their -1 deltas land in hour bucket 1, which has no +1 at all.
        (1, "2024-01-01 00:50:00", 1),
        (1, "2024-01-01 01:10:00", 2),
        (2, "2024-01-01 00:55:00", 3),
        (2, "2024-01-01 01:05:00", 4),
        # user 3: point session inside bucket 0 -> peak of 3 at 00:58.
        (3, "2024-01-01 00:58:00", 5),
        # user 4: lone later session so the table spans several buckets.
        (4, "2024-01-01 05:00:00", 6),
    ]
    sf = _write_events(str(tmp_path), rows)
    out = q_max_concurrent_sessions(sf)
    assert int(out["max_concurrent"].iloc[0]) == 3
    assert out["first_peak_ts"].iloc[0] == pd.Timestamp("2024-01-01 00:58:00")
    ok, msg = compare(out, duckdb_run(sf, SQL_MAX_CONCURRENT))
    assert ok, msg


def test_semdedup_drops_are_real_neardups(ray_session):
    """Every vec SemDeDup drops must have a smaller-id near-dup in the SAME
    cluster per the brute-force float pair list (the integer predicate is a
    quantization of the same tau=0.35 bar, so integer-dups are a subset of
    pairs at a slightly looser float bar), and something must actually be
    dropped on the planted-near-dup corpus."""
    import numpy as np
    import pyarrow.parquet as pq

    from scrapy_ray.pipelines.queries9 import q_semdedup_embeddings

    sf = "/root/testdata/sf0.001"
    out = q_semdedup_embeddings(sf)
    dropped = set(out.loc[out["kept"] == 0, "vec_id"])
    assert dropped, "planted near-dups should force drops"
    cluster = dict(zip(out["vec_id"], out["cluster"]))

    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    E = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = En @ En.T
    pos = {int(v): k for k, v in enumerate(ids)}
    # quantization slack: floor(e*2000) moves the cosine by at most ~0.012
    # (error <= (||a||_1 + ||b||_1)/Q on the dot, ~0.4% on the norms)
    for v in dropped:
        partners = [u for u in ids
                    if u < v and cluster[int(u)] == cluster[v]
                    and S[pos[v], pos[int(u)]] >= 0.35 - 0.02]
        assert partners, f"dropped vec {v} has no same-cluster near-dup"

    # kept vectors: no kept smaller-id integer-near-dup in the same cluster
    # is implied by the oracle equality (test_queries.py); here assert the
    # keep-min rule: the smallest vec_id of every cluster is always kept
    mins = out.groupby("cluster")["vec_id"].min()
    kept = set(out.loc[out["kept"] == 1, "vec_id"])
    assert set(mins) <= kept
    assert out["kept"].dtype == np.int64


def test_pack_sequences_invariants(ray_session):
    """Greedy-packing invariants on the real corpus: per-sequence token
    sums never exceed the budget, offsets are the exclusive running sum in
    emission order, and packing is GREEDY — the first doc of every
    non-first sequence would have overflowed the previous sequence."""
    from scrapy_ray.pipelines.queries9 import _PACK_L, q_pack_sequences

    out = q_pack_sequences("/root/testdata/sf0.001")
    assert (out["ntok"] <= _PACK_L).all()
    for (_, _), g in out.groupby(["shard", "seq_id"]):
        assert g["ntok"].sum() <= _PACK_L
        off = 0
        for _, row in g.iterrows():
            assert row["seq_off"] == off
            off += row["ntok"]
    for _, g in out.groupby("shard"):
        fills = g.groupby("seq_id")["ntok"].sum()
        firsts = g.drop_duplicates("seq_id").set_index("seq_id")["ntok"]
        for s in fills.index[1:]:
            assert fills[s - 1] + firsts[s] > _PACK_L, \
                f"seq {s} not greedy: {fills[s-1]} + {firsts[s]} fits"


def test_max_concurrent_all_buckets_valid(ray_session, tmp_path):
    """No ends-only bucket: the masked combine must reduce to the plain
    offsets+peaks argmax (back-to-back sessions overlap at the boundary
    instant by the starts-before-ends tie rule)."""
    from scrapy_ray.pipelines.queries9 import (SQL_MAX_CONCURRENT,
                                               q_max_concurrent_sessions)
    from scrapy_ray.pipelines.oracle import compare, duckdb_run

    rows = [
        (1, "2024-01-01 00:10:00", 1),
        # user 2 session ends exactly when user 5 session starts: tie
        # instant counts both (starts sort before ends).
        (2, "2024-01-01 00:20:00", 2),
        (2, "2024-01-01 01:20:00", 3),
        (5, "2024-01-01 01:20:00", 4),
        (3, "2024-01-01 01:30:00", 5),
    ]
    sf = _write_events(str(tmp_path), rows)
    out = q_max_concurrent_sessions(sf)
    ok, msg = compare(out, duckdb_run(sf, SQL_MAX_CONCURRENT))
    assert ok, msg


def test_window_distinct_users_exact_vs_duckdb(ray_session):
    """The sliding-window distinct query's EXACT column must equal a
    DuckDB recomputation of the same 6h/1h window definition, and every
    row's in-query HLL bound held (the query itself asserts <6%)."""
    import duckdb

    from scrapy_ray.pipelines.skew import q_window_distinct_users

    sf = "/root/testdata/sf0.001"
    out = q_window_distinct_users(sf)
    import numpy as np
    bound = np.maximum(0.06, 1.5 / np.sqrt(np.maximum(
        out["exact_distinct"].to_numpy(), 1)))
    assert (out["rel_err"].to_numpy() < bound).all()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM read_parquet('{sf}/events.parquet')")
    want = con.execute("""
        SELECT to_timestamp((epoch_us(ts) // 3600000000 - k.k) * 3600)
                   ::TIMESTAMP AS window_start,
               count(DISTINCT user_id)::BIGINT AS exact_distinct
        FROM events, (SELECT unnest(generate_series(0, 5)) AS k) k
        GROUP BY 1 ORDER BY 1
    """).fetchdf()
    got = out[["window_start", "exact_distinct"]].reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["window_start"].to_numpy()
            == want["window_start"].to_numpy()).all()
    assert (got["exact_distinct"].to_numpy()
            == want["exact_distinct"].to_numpy()).all()
