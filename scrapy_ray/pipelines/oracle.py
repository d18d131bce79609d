"""Driver-compare harness used by tests: run a QUERIES entry and its DuckDB
oracle side-by-side the same way the graft driver does (row-count + schema +
order-insensitive value compare) — SURVEY.md §5.2.3."""

from __future__ import annotations

import os

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duckdb_run(sf_dir: str, sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    raise TypeError(type(result))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(ray_result, oracle_df: pd.DataFrame) -> tuple[bool, str]:
    a = normalize(to_pandas(ray_result))
    b = normalize(oracle_df)
    if len(a) != len(b):
        return False, f"row count {len(a)} != {len(b)}"
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    # The driver hashes VALUES, so int64 1234 vs float64 1234.0 is a
    # mismatch (round-1 lesson: DuckDB sum(BIGINT)->HUGEINT->float64 in
    # pandas). Mirror that: dtype KINDS must agree per column.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if (ka in "iu") != (kb in "iu") or (ka == "f") != (kb == "f"):
            return False, f"dtype kind mismatch on {c}: {a[c].dtype} vs {b[c].dtype}"
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        return False, str(e)[:500]
    return True, "ok"
