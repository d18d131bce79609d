"""One-hundred-sixth oracle-query batch — greedy selection methods for
data curation, all on EXACT integers:

- gonzalez_kcenter_embeddings: the Gonzalez 2-approximation k-center
  sweep (k=5) on embeddings quantized ONCE per component
  (qv = round(x*1000) — squared distances then stay exact int64,
  <= 64*(4e6)^2 ~ 1e15): seed = min vec_id, then argmax of the
  min-distance-to-centers (tie -> min vec_id); reports each center
  and the final covering radius.  Ray side: per-block integer
  distance partials with the centers broadcast; SQL: chained CTEs
  over the exploded (vec_id, idx, qv) table.
- herding_coreset_embeddings: kernel-herding selection (k=5, linear
  kernel) with cleared denominators: step t picks
  argmax (t+1)*<M, x> - N*<S, x> (M = sum of all quantized vectors,
  S = sum of selected; all exact ints at the 1e3 scale; tie -> min
  vec_id) — the classic mean-matching coreset.
- greedy_max_coverage_parts: 5-step greedy maximum coverage — each
  round picks the part covering the most NOT-yet-covered orders
  (exact distinct counts, tie -> smallest part); reports per-round
  marginal gain and cumulative coverage, the standard (1-1/e)
  submodular baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count, Sum

from scrapy_ray.pipelines.queries import _nrows, _pq
from scrapy_ray.pipelines.queries47 import _strip

_K = 5


def _qvec(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
    qv = np.floor(emb.astype(np.float64) * 1000.0 + 0.5).astype(np.int64)
    return vid, qv


# ---------------------------------------------------------------------------
# Gonzalez k-center
# ---------------------------------------------------------------------------


def q_gonzalez_kcenter_embeddings(sf_dir: str):
    """Gonzalez k-center sweep on integer-quantized embeddings
    (docstring above)."""
    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    centers: list[tuple[int, np.ndarray]] = []

    def far_partial(t: pa.Table, cs=None) -> pa.Table:
        vid, qv = _qvec(t)
        mind = np.full(len(vid), np.iinfo(np.int64).max, np.int64)
        for _, cq in cs:
            diff = qv - cq[None, :]
            d = (diff * diff).sum(axis=1)
            mind = np.minimum(mind, d)
        i = int(np.lexsort((vid, -mind))[0])
        return pa.table({"g": pa.array([0], pa.int64()),
                         "vec_id": pa.array([int(vid[i])], pa.int64()),
                         "d": pa.array([int(mind[i])], pa.int64())})

    def get_vec(target: int) -> np.ndarray:
        def pick(t: pa.Table) -> pa.Table:
            vid, qv = _qvec(t)
            m = vid == target
            if not m.any():
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "qv": pa.array([], pa.string())})
            return pa.table({
                "vec_id": pa.array([target], pa.int64()),
                "qv": pa.array([",".join(map(str, qv[m][0]))],
                               pa.string())})
        df = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        return np.array([int(x) for x in df["qv"].iloc[0].split(",")],
                        np.int64)

    first = int(_pq(sf_dir, "embeddings", ["vec_id"])
                .map_batches(lambda t: pa.table(
                    {"g": pa.array([0], pa.int64()),
                     "m": pa.array([int(t["vec_id"].to_numpy(
                         zero_copy_only=False).min())], pa.int64())}),
                    batch_format="pyarrow")
                .groupby("g").min("m").to_pandas()["min(m)"].iloc[0])
    centers.append((first, get_vec(first)))
    rows = [(1, first, 0)]
    radius = 0
    for r in range(2, _K + 1):
        parts = (ds.map_batches(
            lambda t, cs=list(centers): far_partial(t, cs),
            batch_format="pyarrow").to_pandas())
        parts = parts.sort_values(["d", "vec_id"],
                                  ascending=[False, True])
        nxt = int(parts["vec_id"].iloc[0])
        dmax = int(parts["d"].iloc[0])
        centers.append((nxt, get_vec(nxt)))
        rows.append((r, nxt, dmax))
    # final covering radius with all K centers
    parts = (ds.map_batches(
        lambda t, cs=list(centers): far_partial(t, cs),
        batch_format="pyarrow").to_pandas())
    radius = int(parts["d"].max())
    out = pd.DataFrame(rows, columns=["round", "center_id", "d_at_pick"])
    out["final_radius"] = np.int64(radius)
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


def _kcenter_sql() -> str:
    head = """
WITH ex AS MATERIALIZED (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS idx,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000.0)
              AS BIGINT) AS qv
  FROM embeddings),
c1 AS (SELECT min(vec_id)::BIGINT AS cid FROM embeddings)"""
    steps = []
    prev_min = None
    for r in range(1, _K):
        dist = f"""
dd{r} AS (
  SELECT p.vec_id, sum((p.qv - c.qv) * (p.qv - c.qv))::BIGINT AS d
  FROM ex p JOIN (SELECT idx, qv FROM ex
                  WHERE vec_id = (SELECT cid FROM c{r})) c
    ON c.idx = p.idx
  GROUP BY 1)"""
        if r == 1:
            mind = f"md{r} AS (SELECT vec_id, d FROM dd{r})"
        else:
            mind = f"""md{r} AS (
  SELECT md{r-1}.vec_id, least(md{r-1}.d, dd{r}.d) AS d
  FROM md{r-1} JOIN dd{r} ON dd{r}.vec_id = md{r-1}.vec_id)"""
        pick = f"""c{r+1} AS (
  SELECT vec_id AS cid, d FROM md{r} ORDER BY d DESC, vec_id LIMIT 1)"""
        steps.append(",\n" + dist + ",\n" + mind + ",\n" + pick)
        prev_min = f"md{r}"
    # final radius with all K centers
    steps.append(f""",
ddK AS (
  SELECT p.vec_id, sum((p.qv - c.qv) * (p.qv - c.qv))::BIGINT AS d
  FROM ex p JOIN (SELECT idx, qv FROM ex
                  WHERE vec_id = (SELECT cid FROM c{_K})) c
    ON c.idx = p.idx
  GROUP BY 1),
mdK AS (
  SELECT {prev_min}.vec_id, least({prev_min}.d, ddK.d) AS d
  FROM {prev_min} JOIN ddK ON ddK.vec_id = {prev_min}.vec_id),
rad AS (SELECT max(d)::BIGINT AS r FROM mdK)""")
    sel = ["SELECT 1::BIGINT AS round, (SELECT cid FROM c1) AS center_id,"
           " 0::BIGINT AS d_at_pick, (SELECT r FROM rad) AS final_radius"]
    for r in range(2, _K + 1):
        sel.append(f"SELECT {r}, (SELECT cid FROM c{r}),"
                   f" (SELECT d FROM c{r}), (SELECT r FROM rad)")
    return head + "".join(steps) + "\n" + "\nUNION ALL\n".join(sel) \
        + "\nORDER BY round"


SQL_KCENTER = _kcenter_sql()


# ---------------------------------------------------------------------------
# Herding coreset
# ---------------------------------------------------------------------------


def q_herding_coreset_embeddings(sf_dir: str):
    """Kernel-herding coreset (k=5) with cleared denominators
    (docstring above)."""
    n = _nrows(sf_dir, "embeddings")
    ds = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def sum_partial(t: pa.Table) -> pa.Table:
        _, qv = _qvec(t)
        s = qv.sum(axis=0)
        return pa.table({"g": pa.array([0], pa.int64()),
                         "m": pa.array([",".join(map(str, s))],
                                       pa.string())})

    parts = ds.map_batches(sum_partial, batch_format="pyarrow") \
        .to_pandas()
    dim = len(parts["m"].iloc[0].split(","))
    m_vec = np.zeros(dim, dtype=object)
    for row in parts["m"]:
        m_vec += np.array([int(x) for x in row.split(",")], object)
    m_vec = m_vec.astype(np.int64)

    s_vec = np.zeros(dim, np.int64)
    chosen: list[int] = []
    rows = []
    for t_step in range(_K):
        coef = t_step + 1

        def score_partial(t: pa.Table, coef=coef,
                          s_vec=s_vec.copy(),
                          excl=tuple(chosen)) -> pa.Table:
            vid, qv = _qvec(t)
            sc = coef * qv.dot(m_vec) - n * qv.dot(s_vec)
            keep = ~np.isin(vid, np.array(excl, np.int64))
            if not keep.any():
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "sc": pa.array([], pa.int64())})
            vid, sc = vid[keep], sc[keep]
            i = int(np.lexsort((vid, -sc))[0])
            return pa.table({"vec_id": pa.array([int(vid[i])],
                                                pa.int64()),
                             "sc": pa.array([int(sc[i])], pa.int64())})

        parts = ds.map_batches(score_partial,
                               batch_format="pyarrow").to_pandas()
        parts = parts.sort_values(["sc", "vec_id"],
                                  ascending=[False, True])
        nxt = int(parts["vec_id"].iloc[0])
        sc = int(parts["sc"].iloc[0])
        chosen.append(nxt)
        rows.append((t_step + 1, nxt, sc))
        # add the chosen vector to S

        def pick(t: pa.Table, target=nxt) -> pa.Table:
            vid, qv = _qvec(t)
            m = vid == target
            if not m.any():
                return pa.table({"qv": pa.array([], pa.string())})
            return pa.table({"qv": pa.array(
                [",".join(map(str, qv[m][0]))], pa.string())})

        df = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        s_vec = s_vec + np.array(
            [int(x) for x in df["qv"].iloc[0].split(",")], np.int64)
    out = pd.DataFrame(rows, columns=["step", "vec_id", "score"])
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


def _herding_sql() -> str:
    head = """
WITH ex AS MATERIALIZED (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS idx,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000.0)
              AS BIGINT) AS qv
  FROM embeddings),
nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
mv AS MATERIALIZED (
  SELECT idx, sum(qv)::BIGINT AS m FROM ex GROUP BY 1),
dm AS MATERIALIZED (
  SELECT p.vec_id, sum(p.qv * mv.m)::BIGINT AS dotm
  FROM ex p JOIN mv ON mv.idx = p.idx GROUP BY 1)"""
    steps = []
    for t in range(1, _K + 1):
        if t == 1:
            dots = "0"
            excl = ""
        else:
            prev = ", ".join(f"(SELECT vec_id FROM p{j})"
                             for j in range(1, t))
            excl = f"WHERE dm.vec_id NOT IN ({prev})"
            dots = f"""(SELECT sum(p.qv * sv.qv)
  FROM ex p JOIN sv{t-1} sv ON sv.idx = p.idx
  WHERE p.vec_id = dm.vec_id)"""
        steps.append(f""",
p{t} AS (
  SELECT dm.vec_id,
         ({t} * dm.dotm - nn.n * coalesce({dots}, 0))::BIGINT AS sc
  FROM dm CROSS JOIN nn {excl}
  ORDER BY sc DESC, dm.vec_id LIMIT 1)""")
        sel_ids = ", ".join(f"(SELECT vec_id FROM p{j})"
                            for j in range(1, t + 1))
        steps.append(f""",
sv{t} AS (
  SELECT idx, sum(qv)::BIGINT AS qv FROM ex
  WHERE vec_id IN ({sel_ids}) GROUP BY 1)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {t}::BIGINT AS step, (SELECT vec_id FROM p{t}) AS vec_id,"
        f" (SELECT sc FROM p{t}) AS score" for t in range(1, _K + 1))
    return head + "".join(steps) + "\n" + sel + "\nORDER BY step"


SQL_HERDING = _herding_sql()


# ---------------------------------------------------------------------------
# Greedy max coverage
# ---------------------------------------------------------------------------


def q_greedy_max_coverage_parts(sf_dir: str):
    """5-step greedy max coverage of orders by parts (docstring
    above)."""
    ds = _pq(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def ppart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o": t["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "p": t["l_partkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)}).drop_duplicates()
        return _strip(df)

    pairs = (ds.map_batches(ppart, batch_format="pyarrow")
               .groupby(["o", "p"]).aggregate(Count())
               .to_pandas())
    covered: set = set()
    chosen: list[int] = []
    rows = []
    for r in range(1, _K + 1):
        sub = pairs[~pairs["o"].isin(covered)
                    & ~pairs["p"].isin(chosen)]
        g = sub.groupby("p")["o"].nunique().reset_index()
        g = g.sort_values(["o", "p"], ascending=[False, True])
        best = int(g["p"].iloc[0])
        gain = int(g["o"].iloc[0])
        newly = set(pairs[pairs["p"] == best]["o"]) - covered
        covered |= newly
        chosen.append(best)
        rows.append((r, best, gain, len(covered)))
    out = pd.DataFrame(rows, columns=["round", "part", "gain",
                                      "cum_covered"])
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


def _coverage_sql() -> str:
    head = """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)"""
    steps = []
    for r in range(1, _K + 1):
        if r == 1:
            flt = ""
        else:
            prev_p = ", ".join(f"(SELECT p FROM g{j})"
                               for j in range(1, r))
            flt = (f"WHERE pairs.p NOT IN ({prev_p}) "
                   f"AND pairs.o NOT IN (SELECT o FROM covset{r-1})")
        steps.append(f""",
g{r} AS (
  SELECT pairs.p, count(DISTINCT pairs.o)::BIGINT AS gain
  FROM pairs {flt}
  GROUP BY 1 ORDER BY gain DESC, p LIMIT 1),
covset{r} AS MATERIALIZED (
  SELECT DISTINCT o FROM pairs
  WHERE p IN ({", ".join(f"(SELECT p FROM g{j})"
                         for j in range(1, r + 1))})),
cov{r} AS (SELECT count(*)::BIGINT AS cum FROM covset{r})""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {r}::BIGINT AS round, (SELECT p FROM g{r}) AS part,"
        f" (SELECT gain FROM g{r}) AS gain,"
        f" (SELECT cum FROM cov{r}) AS cum_covered"
        for r in range(1, _K + 1))
    return head + "".join(steps) + "\n" + sel + "\nORDER BY round"


SQL_MAX_COVERAGE = _coverage_sql()


QUERIES106: dict[str, tuple] = {
    "gonzalez_kcenter_embeddings": (q_gonzalez_kcenter_embeddings,
                                    SQL_KCENTER),
    "herding_coreset_embeddings": (q_herding_coreset_embeddings,
                                   SQL_HERDING),
    "greedy_max_coverage_parts": (q_greedy_max_coverage_parts,
                                  SQL_MAX_COVERAGE),
}
