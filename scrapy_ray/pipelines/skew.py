"""Skew-aware aggregation (SURVEY.md §2.5 A2, [B:north_star "hot domains
rebalanced via salted groupby-aggregate shuffles"]).

A bare ``groupby(hot_key)`` sends every row of a hot key to ONE reduce task.
``salted_count`` splits each key into ``n_salt`` sub-keys (partial counts
shuffle evenly), then merges the tiny salted partials — the two-phase
(partial + final) aggregate. The oracle SQL is just GROUP BY: salting only
changes the physical plan, never the result."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def salted_count(ds: ray.data.Dataset, key: str, n_salt: int = 8) -> pa.Table:
    """Count rows per key with salt-spread partials."""

    def partial(t: pa.Table) -> pa.Table:
        ks = t[key].to_pylist()
        salt = np.arange(len(ks), dtype=np.int64) % n_salt
        df = pd.DataFrame({key: ks, "salt": salt})
        g = df.groupby([key, "salt"]).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    salted = ds.map_batches(partial, batch_format="pyarrow")
    # stage 1: merge per (key, salt) — the shuffle sees n_salt sub-keys per
    # hot key; stage 2: collapse salts per key (tiny).
    merged = salted.groupby([key, "salt"]).aggregate(Sum("n", alias_name="n"))
    final = merged.groupby(key).aggregate(Sum("n", alias_name="n"))
    t = pa.Table.from_pandas(final.to_pandas())
    i = t.schema.get_field_index("n")
    return t.set_column(i, "n", pa.compute.cast(t["n"], pa.int64()))


def q_salted_count_event_type(sf_dir: str):
    """events.event_type is low-cardinality/hot by construction — the exact
    shape where an unsalted groupby funnels everything into 5 reducers."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type"])
    return salted_count(ds, "event_type", n_salt=8)


SQL_SALTED = "SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY event_type"

SKEW_QUERIES = {
    "salted_count_event_type": (q_salted_count_event_type, SQL_SALTED),
}


def q_approx_distinct_users(sf_dir: str):
    """A3 approximate-distinct at scale: one 4 KB HLL sketch per batch
    (map_batches), merged in a tiny final stage — the pattern that replaces
    the exact URL-seen count at 10^10 keys. Rows-only (sketch estimates are
    not SQL-replayable); accuracy vs exact COUNT(DISTINCT) is pinned in
    tests/test_training.py."""
    import pyarrow as pa

    from scrapy_ray.functions.hashing import hash64
    from scrapy_ray.functions.sketch import HLL

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        h = hash64([str(u) for u in t["user_id"].to_pylist()])
        return pa.table({"sketch": pa.array([HLL().add_many(h).to_bytes()],
                                            type=pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow")
    merged = HLL()
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for raw in b["sketch"].to_pylist():
            merged.merge(HLL.from_bytes(raw))
    return pa.table({"approx_distinct_users": pa.array([int(round(merged.estimate()))],
                                                       type=pa.int64())})


SKEW_QUERIES["approx_distinct_users"] = (q_approx_distinct_users, None)
