"""Forty-third oracle-query batch — graph mixing / causal audit /
corpus similarity matrix:

- degree_assortativity_docs: in-degree assortativity (Pearson r of
  (din(u), din(v)) over directed edges) of a deterministic QUADRATIC
  doc graph u → (u²+c) mod N, c = 1..3 (the pagerank stride graph is a
  bijection per c — exactly 3-in-regular, zero degree variance, r
  undefined; the quadratic map collides and spreads in-degrees). In-degrees and per-edge endpoint degrees
  resolve over TWO salted same-stream shuffles (degree rows and edge
  rows ride together — no broadcast node map, kcore discipline);
  the five Pearson moments are exact int64 partials combined in Python
  ints, r finalizes identical-expression round6.
- simpsons_paradox_audit: Simpson's-paradox check of the arm
  (user_id % 2) purchase-rate comparison, pooled vs per hour-of-day
  stratum (hour // 6). ALL-INTEGER query: every rate comparison is the
  cross-multiplied sign sign(k1·n0 − k0·n1) — no float ever enters;
  a stratum is flagged when its direction strictly opposes the pooled
  direction. One O(strata × arms) cell shuffle.
- source_tf_cosine: source-pair similarity matrix — cosine of unigram
  term-frequency vectors for every source pair. Pair numerators
  Σ_w c_a·c_b ride the word-co-partitioned shuffle as vectorized outer
  products (O(sources²) cells per partition, never a row join); the
  diagonal self-pairs of the same outer product ARE the norms Σc², so
  one stage yields numerators and norms together. Each pair's cosine
  is one identical float expression of three exact integers — no float
  sum anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# degree assortativity
# ---------------------------------------------------------------------------


def q_degree_assortativity_docs(sf_dir: str):
    """In-degree assortativity over the synthetic doc graph (docstring
    above)."""
    n_docs = _nrows(sf_dir, "documents")
    ds = _pq(sf_dir, "documents", columns=["doc_id"])

    # pass 1: key by DESTINATION — group = one dst doc; its in-degree is
    # the number of edge rows; emit each edge back out keyed by source
    # with din(v) attached, plus a degree row for the dst node itself.
    def scatter1(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = [ids]
        src = [np.full(len(ids), -1, np.int64)]   # node marker
        for cc in (1, 2, 3):
            key.append((ids * ids + cc) % n_docs)
            src.append(ids)
        allk = np.concatenate(key)
        return pa.table({"key": pa.array(allk),
                         "src": pa.array(np.concatenate(src)),
                         "gkey": pa.array((allk % 256).astype(np.int32))})

    def resolve1(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["src"] >= 0]
        din = e.groupby("key", sort=False).size()
        nodes = df.loc[df["src"] < 0, "key"]
        node_din = din.reindex(nodes, fill_value=0).astype(np.int64)
        # edge rows re-keyed by source u, carrying din(v)
        ev = pd.DataFrame({
            "key": e["src"].to_numpy(np.int64),
            "val": din.reindex(e["key"]).to_numpy(np.int64),
            "kind": np.int64(1)})
        nd = pd.DataFrame({"key": nodes.to_numpy(np.int64),
                           "val": node_din.to_numpy(np.int64),
                           "kind": np.int64(0)})
        out = pd.concat([nd, ev], ignore_index=True)
        out["gkey"] = (out["key"] % 256).astype(np.int32)
        return out

    # pass 2: key by SOURCE — attach din(u) to its 3 out-edges and
    # reduce to the five Pearson moment partials per partition.
    def resolve2(df: pd.DataFrame) -> pd.DataFrame:
        nd = df[df["kind"] == 0][["key", "val"]] \
            .rename(columns={"val": "din_u"})
        e = df[df["kind"] == 1]
        j = e.merge(nd, on="key")
        x = j["din_u"].to_numpy(np.int64)
        y = j["val"].to_numpy(np.int64)
        return pd.DataFrame({
            "m": [np.int64(len(j))], "sx": [int(x.sum())],
            "sy": [int(y.sum())], "sxy": [int((x * y).sum())],
            "sxx": [int((x * x).sum())], "syy": [int((y * y).sum())]})

    parts = (ds.map_batches(scatter1, batch_format="pyarrow")
               .groupby("gkey").map_groups(resolve1,
                                           batch_format="pandas")
               .groupby("gkey").map_groups(resolve2,
                                           batch_format="pandas")
               .to_pandas())
    m = int(parts["m"].sum())
    sx = sum(int(v) for v in parts["sx"])
    sy = sum(int(v) for v in parts["sy"])
    sxy = sum(int(v) for v in parts["sxy"])
    sxx = sum(int(v) for v in parts["sxx"])
    syy = sum(int(v) for v in parts["syy"])
    r = (float(m * sxy - sx * sy)
         / (np.sqrt(float(m * sxx - sx * sx))
            * np.sqrt(float(m * syy - sy * sy))))
    out = pd.DataFrame({"m": [m], "sx": [sx], "sy": [sy], "sxy": [sxy],
                        "sxx": [sxx], "syy": [syy],
                        "r6": [_round6(np.array([r]))[0]]})
    for col in ("m", "sx", "sy", "sxy", "sxx", "syy"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_ASSORT = """
WITH nd AS (SELECT count(*)::BIGINT AS n FROM documents),
edges AS (
  SELECT d.doc_id AS u, (d.doc_id * d.doc_id + s.cc) % nd.n AS v
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS cc) s
  JOIN nd ON true),
deg AS (
  SELECT d.doc_id AS node,
         coalesce(e.c, 0)::BIGINT AS din
  FROM documents d
  LEFT JOIN (SELECT v, count(*)::BIGINT AS c FROM edges GROUP BY 1) e
    ON e.v = d.doc_id),
ed AS (
  SELECT du.din AS x, dv.din AS y
  FROM edges
  JOIN deg du ON du.node = edges.u
  JOIN deg dv ON dv.node = edges.v),
mo AS (
  SELECT count(*)::BIGINT AS m, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
  FROM ed)
SELECT m, sx, sy, sxy, sxx, syy,
       round(CAST(m * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6) AS r6
FROM mo
"""


# ---------------------------------------------------------------------------
# Simpson's paradox audit
# ---------------------------------------------------------------------------

_US_PER_HOUR = 3_600_000_000


def q_simpsons_paradox_audit(sf_dir: str):
    """All-integer pooled-vs-stratified direction audit (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = (np.asarray(t["event_type"].to_pylist(), dtype=object)
             == "purchase").astype(np.int64)
        df = pd.DataFrame({"stratum": ((tu // _US_PER_HOUR) % 24) // 6,
                           "arm": u % 2, "n": np.int64(1), "k": y})
        g = df.groupby(["stratum", "arm"], sort=False).sum().reset_index()
        for col in ("stratum", "arm", "n", "k"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["stratum", "arm"])
               .aggregate(Sum("n", alias_name="n"),
                          Sum("k", alias_name="k"))
               .to_pandas())
    piv = cells.pivot_table(index="stratum", columns="arm",
                            values=["n", "k"], aggfunc="sum",
                            fill_value=0).sort_index()
    n0 = piv[("n", 0)].to_numpy(np.int64)
    n1 = piv[("n", 1)].to_numpy(np.int64)
    k0 = piv[("k", 0)].to_numpy(np.int64)
    k1 = piv[("k", 1)].to_numpy(np.int64)
    dirs = np.sign(k1 * n0 - k0 * n1).astype(np.int64)
    pn0, pn1 = int(n0.sum()), int(n1.sum())
    pk0, pk1 = int(k0.sum()), int(k1.sum())
    pdir = int(np.sign(pk1 * pn0 - pk0 * pn1))
    out = pd.DataFrame({"stratum": piv.index.to_numpy(np.int64),
                        "n0": n0, "k0": k0, "n1": n1, "k1": k1,
                        "dir": dirs})
    out["pooled_dir"] = np.int64(pdir)
    out["reversal"] = ((dirs != 0) & (dirs == -pdir)).astype(np.int64)
    return out.sort_values("stratum").reset_index(drop=True)


SQL_SIMPSON = f"""
WITH e AS (
  SELECT ((epoch_us(ts) // {_US_PER_HOUR}) % 24) // 6 AS stratum,
         (user_id % 2)::BIGINT AS arm,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
g AS (
  SELECT stratum,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
         sum(CASE WHEN arm = 0 THEN y ELSE 0 END)::BIGINT AS k0,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN arm = 1 THEN y ELSE 0 END)::BIGINT AS k1
  FROM e GROUP BY 1),
p AS (
  SELECT sign(sum(k1) * sum(n0) - sum(k0) * sum(n1))::BIGINT AS pdir
  FROM g)
SELECT g.stratum::BIGINT AS stratum, g.n0, g.k0, g.n1, g.k1,
       sign(g.k1 * g.n0 - g.k0 * g.n1)::BIGINT AS dir,
       p.pdir AS pooled_dir,
       (CASE WHEN sign(g.k1 * g.n0 - g.k0 * g.n1) <> 0
             AND sign(g.k1 * g.n0 - g.k0 * g.n1) = -p.pdir
             THEN 1 ELSE 0 END)::BIGINT AS reversal
FROM g CROSS JOIN p
ORDER BY g.stratum
"""


# ---------------------------------------------------------------------------
# source TF cosine matrix
# ---------------------------------------------------------------------------


def q_source_tf_cosine(sf_dir: str):
    """Source-pair cosine similarity of unigram TF vectors (docstring
    above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def wpart(t: pa.Table) -> pa.Table:
        src_l: list[str] = []
        tok_l: list[str] = []
        for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            ts = txt.split()
            src_l.extend([s] * len(ts))
            tok_l.extend(ts)
        if not tok_l:
            return pa.table({"w": pa.array([], pa.string()),
                             "source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({"w": tok_l, "source": src_l,
                           "n": np.int64(1)})
        g = df.groupby(["w", "source"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(wpart, batch_format="pyarrow")
               .groupby(["w", "source"])
               .aggregate(Sum("n", alias_name="n")))

    def pairprod(df: pd.DataFrame) -> pd.DataFrame:
        # per word: outer product of its per-source counts
        outs = []
        for _, grp in df.groupby("w", sort=False):
            s = grp["source"].to_numpy()
            c = grp["n"].to_numpy(np.int64)
            if len(s) < 1:
                continue
            ai, bi = np.meshgrid(np.arange(len(s)), np.arange(len(s)),
                                 indexing="ij")
            # <= keeps the diagonal: the (a, a) self-pair numerator IS
            # Σc², i.e. the norm — one stage yields pairs AND norms.
            keep = s[ai] <= s[bi]
            if not keep.any():
                continue
            outs.append(pd.DataFrame({
                "a": s[ai[keep]], "b": s[bi[keep]],
                "num": c[ai[keep]] * c[bi[keep]]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object),
                                 "num": pd.Series([], dtype=np.int64)})
        out = pd.concat(outs, ignore_index=True)
        g = out.groupby(["a", "b"], sort=False)["num"].sum().reset_index()
        g["num"] = g["num"].astype(np.int64)
        return g

    def wkey(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(t["w"].to_pylist(), dtype=object)) % 64
        return t.append_column("gkey", pa.array(h.astype(np.int32)))

    allp = (cells.map_batches(wkey, batch_format="pyarrow")
                 .groupby("gkey").map_groups(pairprod,
                                             batch_format="pandas")
                 .groupby(["a", "b"])
                 .aggregate(Sum("num", alias_name="num"))
                 .to_pandas())
    diag = allp[allp["a"] == allp["b"]]
    nmap = {s: int(v) for s, v in zip(diag["a"], diag["num"])}
    nums = allp[allp["a"] < allp["b"]].reset_index(drop=True)
    num = nums["num"].to_numpy(np.int64)
    na = np.array([nmap[s] for s in nums["a"]], np.int64)
    nb = np.array([nmap[s] for s in nums["b"]], np.int64)
    cos = (num.astype(np.float64)
           / (np.sqrt(na.astype(np.float64))
              * np.sqrt(nb.astype(np.float64))))
    out = pd.DataFrame({"a": nums["a"], "b": nums["b"], "num": num,
                        "na2": na, "nb2": nb, "cos6": _round6(cos)})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


SQL_TF_COSINE = """
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents),
cells AS (
  SELECT w, source, count(*)::BIGINT AS n FROM toks GROUP BY 1, 2),
nums AS (
  SELECT c1.source AS a, c2.source AS b,
         sum(c1.n * c2.n)::BIGINT AS num
  FROM cells c1 JOIN cells c2
    ON c1.w = c2.w AND c1.source < c2.source
  GROUP BY 1, 2),
norms AS (
  SELECT source, sum(n * n)::BIGINT AS n2 FROM cells GROUP BY 1)
SELECT nums.a, nums.b, nums.num, pa.n2 AS na2, pb.n2 AS nb2,
       round(CAST(nums.num AS DOUBLE)
             / (sqrt(CAST(pa.n2 AS DOUBLE))
                * sqrt(CAST(pb.n2 AS DOUBLE))), 6) AS cos6
FROM nums
JOIN norms pa ON pa.source = nums.a
JOIN norms pb ON pb.source = nums.b
ORDER BY nums.a, nums.b
"""


QUERIES43: dict[str, tuple] = {
    "degree_assortativity_docs": (q_degree_assortativity_docs,
                                  SQL_ASSORT),
    "simpsons_paradox_audit": (q_simpsons_paradox_audit, SQL_SIMPSON),
    "source_tf_cosine": (q_source_tf_cosine, SQL_TF_COSINE),
}
