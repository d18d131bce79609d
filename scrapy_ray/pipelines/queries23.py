"""Twenty-third oracle-query batch — three more analytics shapes:

- trending_daily_topk: per day, the top-3 event types by TRAILING-7-day
  count (RANGE window + per-window top-k, the "trending" analytics shape).
  One scan emits (day, type) partial counts; the shuffle is O(days × types)
  cells; the trailing sums and per-day rankings are resolved on the tiny
  domain-bounded cell table (dense day grid → vectorized cumsum diff —
  RANGE semantics, not ROWS, so calendar gaps are handled).
- js_divergence_sources: Jensen–Shannon divergence between the unigram
  word distributions of every source pair — the corpus-drift /
  domain-shift diagnostic. Word counts per source ride ONE hash(word)
  shuffle; per-word pair contributions are finalized with the identical
  float64 expression both sides, then QUANTIZED per word to 1e-12 units
  and summed as exact int64 (the _cents philosophy applied to an
  information-theoretic sum — no float-summation-order hazard).
- type_cardinality_distribution: how many users have exactly k distinct
  event types (the inverse/cardinality histogram). In-batch (user, type)
  dedup combiner → user-co-partitioned exact distinct counts → O(types)
  histogram cells.

All counts exact int64; js6 finalized as round6(sum_units / 1e12 / 2)
computed from the same exact integer on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum

from scrapy_ray.functions.hashing import hash64
from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6

_PARTS = 64
_TREND_K = 3
_TREND_DAYS = 7
_JS_SCALE = 1_000_000_000_000  # 1e-12 quantization units


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# trending: per-day top-k types by trailing-7-day count
# ---------------------------------------------------------------------------


def q_trending_daily_topk(sf_dir: str):
    """Per-day top-3 event types by trailing-7-day event count. The heavy
    scan shrinks to O(days × types) exact cells in one groupby; trailing
    RANGE sums come from a dense per-type day grid (missing calendar days
    count zero) via one cumsum diff; per-day ranking (cnt7 desc, type asc)
    is vectorized on the cell table. Days with fewer than 3 active types
    still rank all types (zero-count cells included via the grid), exactly
    like the SQL grid CROSS JOIN."""
    ds = _pq(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "day": pc.floor_temporal(t["ts"], unit="day").to_pandas(),
            "event_type": t["event_type"].to_pylist()})
        g = df.groupby(["day", "event_type"], sort=False) \
              .size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["day", "event_type"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    days_obs = np.sort(cells["day"].unique())
    types = np.sort(cells["event_type"].unique())
    # dense calendar grid covering the observed span (RANGE semantics)
    dense = pd.date_range(days_obs[0], days_obs[-1], freq="D",
                          unit=days_obs[0].unit if hasattr(days_obs[0], "unit")
                          else "us")
    day_ix = pd.Series(np.arange(len(dense)), index=dense)
    mat = np.zeros((len(dense), len(types)), np.int64)
    ti = pd.Series(np.arange(len(types)), index=types)
    mat[day_ix.reindex(cells["day"]).to_numpy(),
        ti.reindex(cells["event_type"]).to_numpy()] = cells["n"].to_numpy()
    cs = np.cumsum(mat, axis=0)
    trail = cs.copy()
    trail[_TREND_DAYS:] -= cs[:-_TREND_DAYS]
    # rank only on OBSERVED days (the SQL grid is distinct observed days)
    obs_rows = day_ix.reindex(days_obs).to_numpy()
    sub = trail[obs_rows]                      # days_obs × types
    order = np.argsort(-sub, axis=1, kind="stable")  # ties → type asc
    rk = np.arange(1, len(types) + 1)
    k = min(_TREND_K, len(types))
    out = pd.DataFrame({
        "day": np.repeat(days_obs, k),
        "event_type": types[order[:, :k].ravel()],
        "cnt7": np.take_along_axis(sub, order[:, :k], axis=1).ravel(),
        "rk": np.tile(rk[:k], len(days_obs)).astype(np.int64)})
    return out.sort_values(["day", "rk"]).reset_index(drop=True)


SQL_TRENDING = f"""
WITH d AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
grid AS (
  SELECT * FROM (SELECT DISTINCT day FROM d)
  CROSS JOIN (SELECT DISTINCT event_type FROM d)),
g AS (
  SELECT grid.day, grid.event_type, coalesce(d.n, 0) AS n
  FROM grid LEFT JOIN d USING (day, event_type)),
w AS (
  SELECT day, event_type,
         sum(n) OVER (PARTITION BY event_type ORDER BY day
                      RANGE BETWEEN INTERVAL '{_TREND_DAYS - 1} days'
                      PRECEDING AND CURRENT ROW) AS cnt7
  FROM g),
r AS (
  SELECT *, row_number() OVER (PARTITION BY day
                               ORDER BY cnt7 DESC, event_type) AS rk
  FROM w)
SELECT day, event_type, cnt7::BIGINT AS cnt7, rk::BIGINT AS rk
FROM r WHERE rk <= {_TREND_K} ORDER BY day, rk
"""


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence between source unigram distributions
# ---------------------------------------------------------------------------


def q_js_divergence_sources(sf_dir: str):
    """JS divergence between the unigram distributions of every source
    pair (src_a < src_b). ONE tokenize scan → per-batch (word, source)
    partial counts → hash(word) shuffle → per-word pair contributions
    p·ln(p/m) + q·ln(q/m) computed word-locally (totals broadcast),
    quantized per word to 1e-12 units (identical float64 expression +
    round both sides) and summed as exact int64 across partitions —
    summation order cannot perturb the result. js6 = round6 of the exact
    unit sum / 1e12 / 2."""
    ds = _pq(sf_dir, "documents", columns=["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        ws: list[str] = []
        ss: list[str] = []
        for txt, src in zip(t["text"].to_pylist(), t["source"].to_pylist()):
            toks = txt.split()
            ws.extend(toks)
            ss.extend([src] * len(toks))
        if not ws:
            return pa.table({"w": pa.array([], pa.string()),
                             "source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({"w": np.asarray(ws, object),
                           "source": np.asarray(ss, object)})
        g = df.groupby(["w", "source"], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    wc = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["w", "source"]).aggregate(Sum("n", alias_name="n")))

    # tiny per-source totals (O(sources)) — broadcast into the unit pass
    tot = (wc.groupby("source").aggregate(Sum("n", alias_name="tot"))
             .to_pandas())
    sources = np.sort(tot["source"].to_numpy())
    totals = tot.set_index("source")["tot"].astype(np.int64)
    pairs = [(a, b) for i, a in enumerate(sources) for b in sources[i + 1:]]
    if not pairs:
        return pd.DataFrame({"src_a": pd.Series([], dtype=object),
                             "src_b": pd.Series([], dtype=object),
                             "js6": pd.Series([], dtype=np.float64)})
    tot_map = {s: int(totals[s]) for s in sources}

    def salt(t: pa.Table) -> pa.Table:
        # all (w, source) cells of a word MUST share a partition — the
        # pair contribution needs both counts; batch boundaries don't cut
        gk = (hash64(t["w"].to_pylist()) % np.uint64(256)).astype(np.int32)
        return t.append_column("gkey", pa.array(gk))

    def units(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(index="w", columns="source", values="n",
                             aggfunc="sum", fill_value=0)
        rows = []
        for a, b in pairs:
            na = piv[a].to_numpy().astype(np.float64) if a in piv.columns \
                else np.zeros(len(piv))
            nb = piv[b].to_numpy().astype(np.float64) if b in piv.columns \
                else np.zeros(len(piv))
            p = na / tot_map[a]
            q = nb / tot_map[b]
            m = (p + q) / 2.0
            with np.errstate(divide="ignore", invalid="ignore"):
                contrib = (np.where(p > 0, p * np.log(p / m), 0.0)
                           + np.where(q > 0, q * np.log(q / m), 0.0))
            # half-away-from-zero (DuckDB round), NOT np.rint half-even
            x = contrib * _JS_SCALE
            u = np.where(x >= 0, np.floor(x + 0.5),
                         np.ceil(x - 0.5)).astype(np.int64)
            rows.append(pd.DataFrame({"src_a": a, "src_b": b,
                                      "units": u[u != 0]}))
        allr = pd.concat(rows, ignore_index=True) if rows else \
            pd.DataFrame({"src_a": [], "src_b": [], "units": []})
        g = allr.groupby(["src_a", "src_b"], sort=False)["units"] \
                .sum().reset_index()
        g["units"] = g["units"].astype(np.int64)
        return g

    cells = (wc.map_batches(salt, batch_format="pyarrow")
               .groupby("gkey").map_groups(units, batch_format="pandas")
               .to_pandas()
               .groupby(["src_a", "src_b"])["units"].sum().reset_index())
    # pairs with zero net units (identical distributions) still appear
    full = pd.DataFrame(pairs, columns=["src_a", "src_b"])
    cells = full.merge(cells, on=["src_a", "src_b"], how="left") \
                .fillna({"units": 0})
    js6 = _round6(cells["units"].to_numpy().astype(np.int64)
                  / float(_JS_SCALE) / 2.0)
    out = pd.DataFrame({"src_a": cells["src_a"], "src_b": cells["src_b"],
                        "js6": js6})
    return out.sort_values(["src_a", "src_b"]).reset_index(drop=True)


SQL_JS = f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents),
wc AS (SELECT w, source, count(*)::BIGINT AS n FROM toks GROUP BY 1, 2),
tot AS (SELECT source, sum(n)::BIGINT AS tot FROM wc GROUP BY 1),
pr AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM tot a JOIN tot b ON a.source < b.source),
j AS (
  SELECT pr.src_a, pr.src_b, vw.w,
         coalesce(ca.n, 0)::DOUBLE / ta.tot AS p,
         coalesce(cb.n, 0)::DOUBLE / tb.tot AS q
  FROM pr
  JOIN (SELECT DISTINCT w FROM wc) vw ON true
  LEFT JOIN wc ca ON ca.w = vw.w AND ca.source = pr.src_a
  LEFT JOIN wc cb ON cb.w = vw.w AND cb.source = pr.src_b
  JOIN tot ta ON ta.source = pr.src_a
  JOIN tot tb ON tb.source = pr.src_b),
u AS (
  SELECT src_a, src_b,
         CAST(round((CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0))
                          ELSE 0.0 END
                   + CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0))
                          ELSE 0.0 END) * {_JS_SCALE}) AS BIGINT) AS units
  FROM j)
SELECT src_a, src_b,
       round(sum(units)::BIGINT / {_JS_SCALE}.0 / 2.0, 6) AS js6
FROM u GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# distinct-cardinality distribution
# ---------------------------------------------------------------------------


def q_type_cardinality_distribution(sf_dir: str):
    """How many users have exactly k distinct event types — the inverse
    (cardinality) histogram. In-batch (user, type) dedup combiner →
    user-co-partitioned exact per-user distinct counts → O(types)
    histogram cells summed in a tiny groupby."""
    ds = _pq(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pylist()}).drop_duplicates()
        df["gkey"] = (df["user_id"] % _PARTS).astype(np.int32)
        return _strip(df)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        ut = df[["user_id", "event_type"]].drop_duplicates()
        k = ut.groupby("user_id", sort=False).size()
        g = k.value_counts().rename_axis("n_types").reset_index(name="n_users")
        g["n_types"] = g["n_types"].astype(np.int64)
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("gkey").map_groups(hist, batch_format="pandas")
             .to_pandas()
             .groupby("n_types")["n_users"].sum().reset_index())
    out["n_types"] = out["n_types"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("n_types").reset_index(drop=True)


SQL_TYPE_CARD = """
WITH k AS (
  SELECT user_id, count(DISTINCT event_type)::BIGINT AS n_types
  FROM events GROUP BY 1)
SELECT n_types, count(*)::BIGINT AS n_users
FROM k GROUP BY 1 ORDER BY 1
"""


QUERIES23: dict[str, tuple] = {
    "trending_daily_topk": (q_trending_daily_topk, SQL_TRENDING),
    "js_divergence_sources": (q_js_divergence_sources, SQL_JS),
    "type_cardinality_distribution": (q_type_cardinality_distribution,
                                      SQL_TYPE_CARD),
}
