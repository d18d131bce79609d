"""Twenty-seventh oracle-query batch — forensic QA / hypothesis testing /
iterative graph peeling:

- benford_price_digits: Benford's-law first-significant-digit audit of
  order totals (the forensic data-quality screen). Digit extracted from
  the decimal STRING of the integer cents both sides (never via float
  log10 — boundary values like 10^k would misround); O(9) exact cells;
  expected Benford mass and the per-digit chi-square contribution
  finalized with identical expressions + round6.
- mannwhitney_click_vs_view: Mann–Whitney U comparing the value
  distributions of two event types WITHOUT ranking rows: 2U = Σ 2·[x>y] +
  Σ [x=y] computed exactly from the merged per-cent histograms (one
  window-free cumsum on the Ray side, one window over O(distinct cents)
  on the SQL side); the normal z-statistic is finalized from the same
  exact integers, identical expression both sides.
- kcore_docs: 3-core decomposition of the suite's deterministic doc graph
  (undirected view of doc → (doc·31+c) mod N, c = 1..3) — iterative
  peeling with SHRINKING state: each round keeps nodes with ≥ 3 alive
  distinct neighbors. Two keyed shuffles per round, NO Dataset.union
  (labels and scatter rows ride one stream, the hits_docs pattern); the
  in/out neighbor double-count is resolved exactly because a node's OUT
  neighbors are closed-form computable in-partition (incoming scatters
  that are also out-neighbors defer to the gather side). The oracle is a
  chained CTE unrolled to the same fixed round count; the Ray side
  asserts the fixpoint was reached within those rounds, so both sides
  provably computed the same core.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6

_KCORE_K = 3
_KCORE_ROUNDS = 8


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------


def q_benford_price_digits(sf_dir: str):
    """First-significant-digit distribution of o_totalprice cents vs the
    Benford expectation log10(1 + 1/d); per-digit chi-square contribution
    (n_d − N·p_d)²/(N·p_d). Digits via the decimal string of the exact
    integer cents (no float log); one scan → 9 cells."""
    ds = _pq(sf_dir, "orders", columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        first = pd.Series(c).astype(str).str[0].astype(np.int64)
        g = first.value_counts().rename_axis("digit").reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("digit").aggregate(Sum("n", alias_name="n"))
               .to_pandas().sort_values("digit").reset_index(drop=True))
    n = cells["n"].to_numpy().astype(np.int64)
    N = int(n.sum())
    d = cells["digit"].to_numpy().astype(np.int64)
    benford = np.log10(1.0 + 1.0 / d)
    chi = (n.astype(np.float64) - N * benford) ** 2 / (N * benford)
    return pd.DataFrame({"digit": d, "n": n,
                         "obs_p6": _round6(n.astype(np.float64) / N),
                         "benford_p6": _round6(benford),
                         "chi2_6": _round6(chi)})


SQL_BENFORD = """
WITH c AS (
  SELECT CAST(left(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                        AS VARCHAR), 1) AS BIGINT) AS digit
  FROM orders),
h AS (SELECT digit, count(*)::BIGINT AS n FROM c GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS nn FROM h)
SELECT digit, n,
       round(n::DOUBLE / nn, 6) AS obs_p6,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_p6,
       round(pow(n::DOUBLE - nn * log10(1.0 + 1.0 / digit), 2)
             / (nn * log10(1.0 + 1.0 / digit)), 6) AS chi2_6
FROM h CROSS JOIN t ORDER BY digit
"""


# ---------------------------------------------------------------------------
# Mann–Whitney U (click vs view values)
# ---------------------------------------------------------------------------


def q_mannwhitney_click_vs_view(sf_dir: str):
    """Mann–Whitney U for H0: click values ~ view values. 2U (exact
    int64, ties count once) from the merged per-cent histograms — no row
    ranking, no global sort; z finalized identical-expression both
    sides."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "et": t["event_type"].to_pylist(),
            "c": _cents(t["value"]).to_numpy(zero_copy_only=False)})
        df = df[df["et"].isin(("click", "view"))]
        g = df.groupby(["et", "c"], sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["et", "c"]).aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    piv = cells.pivot_table(index="c", columns="et", values="cnt",
                            aggfunc="sum", fill_value=0).sort_index()
    ca = piv["click"].to_numpy().astype(np.int64) if "click" in piv else \
        np.zeros(len(piv), np.int64)
    cb = piv["view"].to_numpy().astype(np.int64) if "view" in piv else \
        np.zeros(len(piv), np.int64)
    cum_b_below = np.concatenate([[0], np.cumsum(cb[:-1])])
    u2 = int((ca * (2 * cum_b_below + cb)).sum())
    na, nb = int(ca.sum()), int(cb.sum())
    z = (u2 - na * nb) / (2.0 * np.sqrt(na * nb * (na + nb + 1) / 12.0))
    return pd.DataFrame({"u2": np.array([u2], np.int64),
                         "n_click": np.array([na], np.int64),
                         "n_view": np.array([nb], np.int64),
                         "z6": _round6(np.array([z]))})


SQL_MWU = """
WITH c AS (
  SELECT event_type AS et, CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'view')),
h AS (
  SELECT c,
         sum(CASE WHEN et = 'click' THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN et = 'view' THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM c GROUP BY 1),
w AS (
  SELECT ca, cb,
         coalesce(sum(cb) OVER (ORDER BY c
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_b_below
  FROM h),
s AS (
  SELECT sum(ca * (2 * cum_b_below + cb))::BIGINT AS u2,
         sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb
  FROM w)
SELECT u2, na AS n_click, nb AS n_view,
       round((u2 - na * nb)
             / (2.0 * sqrt(na * nb * (na + nb + 1) / 12.0)), 6) AS z6
FROM s
"""


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling)
# ---------------------------------------------------------------------------


def q_kcore_docs(sf_dir: str):
    """3-core of the undirected doc graph. Labels (node, alive) iterate
    through _KCORE_ROUNDS peel rounds; each round is two keyed shuffles
    with labels and scatter rows riding one stream (no union):

      pass 1 (key = node w): alive u's scatter their id to out-neighbors;
        at w we count DISTINCT alive in-neighbors that are NOT also
        out-neighbors of w (closed-form check — those defer to pass 2, so
        overlap neighbors are never double-counted) and emit back-rows
        (u, alive_w) for u's out-degree.
      pass 2 (key = node u): deg = in_contrib + Σ alive(out-nbr);
        alive' = alive ∧ deg ≥ k.

    The fixpoint must land within the unrolled round count — asserted —
    so the chained-CTE oracle (same fixed unroll) provably computed the
    same core."""
    n = _nrows(sf_dir, "documents")

    def init(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(ids),
                         "alive": pa.array(np.ones(len(ids), np.int64))})

    labels = _pq(sf_dir, "documents", ["doc_id"]).map_batches(
        init, batch_format="pyarrow")

    def out_nbrs(ids: np.ndarray) -> list[np.ndarray]:
        return [(ids * 31 + c) % n for c in (1, 2, 3)]

    def scatter(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        alive = t["alive"].to_numpy(zero_copy_only=False).astype(np.int64)
        au = node[alive == 1]
        tgts, srcs = [], []
        for v in out_nbrs(au):
            keep = v != au                      # drop self-loops
            tgts.append(v[keep])
            srcs.append(au[keep])
        nd = np.concatenate([node] + tgts)
        return pa.table({
            "node": pa.array(nd),
            # src = -1 marks a label row; alive rides on label rows only
            "src": pa.array(np.concatenate(
                [np.full(len(node), -1, np.int64)] + srcs)),
            "alive": pa.array(np.concatenate(
                [alive] + [np.zeros(len(s), np.int64) for s in srcs])),
            # salted co-partition key (64 coarse groups, CLAUDE.md rule)
            "gkey": pa.array((nd % 64).astype(np.int32))})

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["src"] == -1]
        sc = df[df["src"] >= 0][["node", "src"]].drop_duplicates()
        alive_map = dict(zip(lab["node"], lab["alive"]))
        w = sc["node"].to_numpy()
        u = sc["src"].to_numpy()
        # incoming u that is ALSO an out-neighbor of w defers to pass 2
        ow = np.stack(out_nbrs(w), 1) if len(w) else \
            np.zeros((0, 3), np.int64)
        overlap = (ow == u[:, None]).any(1) if len(w) else \
            np.zeros(0, bool)
        inc = pd.DataFrame({"node": w[~overlap]}) \
            .groupby("node").size().rename("in_contrib").reset_index()
        out = lab[["node", "alive"]].merge(inc, on="node", how="left") \
            .fillna({"in_contrib": 0})
        out["in_contrib"] = out["in_contrib"].astype(np.int64)
        out["src"] = np.int64(-1)
        # back rows: u learns alive(w) for each of its out-neighbors w
        back = pd.DataFrame({
            "node": u, "alive": np.zeros(len(u), np.int64),
            "in_contrib": np.array(
                [alive_map.get(x, 0) for x in w], np.int64),
            "src": np.full(len(u), -2, np.int64)})
        res = pd.concat([out, back], ignore_index=True)
        res["gkey"] = (res["node"].to_numpy() % 64).astype(np.int32)
        return res

    def pass2(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["src"] == -1]
        gain = df[df["src"] == -2].groupby("node")["in_contrib"] \
            .sum().rename("out_contrib").reset_index()
        m = lab.merge(gain, on="node", how="left") \
            .fillna({"out_contrib": 0})
        deg = m["in_contrib"].to_numpy() + m["out_contrib"].to_numpy()
        alive = ((m["alive"].to_numpy() == 1)
                 & (deg >= _KCORE_K)).astype(np.int64)
        return pd.DataFrame({"node": m["node"].to_numpy().astype(np.int64),
                             "alive": alive})

    import ray.data

    prev_alive = None
    fixpoint_at = None
    for rnd in range(_KCORE_ROUNDS):
        labels = (labels.map_batches(scatter, batch_format="pyarrow")
                        .groupby("gkey").map_groups(pass1,
                                                    batch_format="pandas")
                        .groupby("gkey").map_groups(pass2,
                                                    batch_format="pandas"))
        # the labels table IS the iterated state (O(nodes), the standard
        # label-propagation shape) — materialize per round to cut lineage
        cur = labels.to_pandas()
        cur["node"] = cur["node"].astype(np.int64)
        cur["alive"] = cur["alive"].astype(np.int64)
        cur = cur.sort_values("node").reset_index(drop=True)
        labels = ray.data.from_arrow(_strip(cur))
        a = int(cur["alive"].sum())
        if prev_alive is not None and a == prev_alive:
            fixpoint_at = rnd
            break
        prev_alive = a
    # both sides must have converged inside the unroll budget
    assert fixpoint_at is not None and fixpoint_at < _KCORE_ROUNDS, \
        "k-core did not reach fixpoint within the unrolled rounds"
    out = cur[cur["alive"] == 1][["node"]].rename(columns={"node": "doc_id"})
    return out.sort_values("doc_id").reset_index(drop=True)


def _kcore_sql() -> str:
    base = """
WITH raw AS (
  SELECT doc_id AS u,
         (doc_id * 31 + c.c) % (SELECT count(*) FROM documents) AS v
  FROM documents, (SELECT unnest([1, 2, 3]) AS c) c),
e AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
  FROM raw WHERE u <> v),
und AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
a0 AS (SELECT doc_id AS node FROM documents)"""
    step = """,
a{i} AS (
  SELECT und.x AS node
  FROM und
  JOIN a{p} s ON und.x = s.node
  JOIN a{p} t ON und.y = t.node
  GROUP BY 1 HAVING count(*) >= {k})"""
    parts = [base]
    for i in range(1, _KCORE_ROUNDS + 1):
        parts.append(step.format(i=i, p=i - 1, k=_KCORE_K))
    parts.append(f"\nSELECT node AS doc_id FROM a{_KCORE_ROUNDS} "
                 f"ORDER BY doc_id")
    return "".join(parts)


SQL_KCORE = _kcore_sql()


QUERIES27: dict[str, tuple] = {
    "benford_price_digits": (q_benford_price_digits, SQL_BENFORD),
    "mannwhitney_click_vs_view": (q_mannwhitney_click_vs_view, SQL_MWU),
    "kcore_docs": (q_kcore_docs, SQL_KCORE),
}
