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
    not SQL-replayable), but DRIVER-VISIBLE (round 3, VERDICT item 7): the
    output row carries (estimate, exact, rel_err) — the exact count comes
    from the same pass via per-batch partial distinct sets merged in the
    final stage — and the HLL error bound (<6%, the pytest bar) is asserted
    in-query, so a sketch regression fails the query itself. The exact side
    is verification machinery (O(distinct) driver memory, fine at test
    scale); the production scale path is the sketch alone."""
    import pyarrow as pa

    from scrapy_ray.functions.hashing import hash64
    from scrapy_ray.functions.sketch import HLL

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id"])

    def sketch(t: pa.Table) -> pa.Table:
        import numpy as np
        uniq = np.unique(np.asarray(t["user_id"].to_pylist(), dtype=np.int64))
        h = hash64([str(u) for u in uniq.tolist()])
        return pa.table({"sketch": pa.array([HLL().add_many(h).to_bytes()],
                                            type=pa.binary()),
                         "uniq": pa.array([uniq.tolist()],
                                          type=pa.list_(pa.int64()))})

    parts = ds.map_batches(sketch, batch_format="pyarrow")
    merged = HLL()
    exact_set: set[int] = set()
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for raw, uq in zip(b["sketch"].to_pylist(), b["uniq"].to_pylist()):
            merged.merge(HLL.from_bytes(raw))
            exact_set.update(uq)
    est = int(round(merged.estimate()))
    exact = len(exact_set)
    rel_err = abs(est - exact) / max(1, exact)
    assert rel_err < 0.06, f"HLL error bound violated: {rel_err}"
    r4 = float(int(rel_err * 1e4 + 0.5) / 1e4)
    return pa.table({"approx_distinct_users": pa.array([est], type=pa.int64()),
                     "exact_distinct_users": pa.array([exact], type=pa.int64()),
                     "rel_err": pa.array([r4], type=pa.float64())})


SKEW_QUERIES["approx_distinct_users"] = (q_approx_distinct_users, None)
