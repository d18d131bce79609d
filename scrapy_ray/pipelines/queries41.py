"""Forty-first oracle-query batch — nonparametric k-group testing /
community quality / robust estimation:

- kruskal_wallis_value_by_type: Kruskal–Wallis H test of value across
  event types with tie correction — the rank-based ANOVA sibling.
  Average ranks come from the merged per-cent histogram (MWU rank-
  decomposition discipline; NO global sort): doubled rank sums
  2R_g = Σ n_gv·(2·cum_before + t_v + 1) are EXACT int64; each group's
  H contribution (12/(N(N+1)))·R_g²/n_g is quantized to 1e-6 units and
  integer-summed (never-sum-floats; R_g² via Python int == HUGEINT,
  cast correctly rounded), the tie term Σ(t³−t) is exact, and
  H/C finalizes identical-expression round6.
- modularity_by_lang: directed modularity Q of the LANGUAGE partition
  over the deterministic doc graph (u → (u·31+c) mod N, c=1..3 — the
  pagerank_docs graph; lang, not source — source = doc_id%20 makes
  every within-source edge impossible by the stride arithmetic, so its
  diagonal is identically zero): Q = Σ_c [e_cc/m − (out_c/m)(in_c/m)]. Node
  labels and edge endpoints ride ONE doc_id-keyed shuffle (kcore
  same-stream discipline) to resolve destination communities without a
  broadcast node map; the O(sources²) community cells are exact ints
  and per-community contributions are 1e-12-quantized before the sum.
- huber_location_value: Huber M-estimator of location for value cents
  by 4 fixed IRLS steps — robust-statistics ESTIMATION (hampel covers
  detection). Start μ = mean, scale k = population σ (both
  identical-expression floats of exact integer moments); each step is
  one pass emitting per-batch int64 partials of w and w·x quantized at
  1e-9 / 1e-4 units (w = min(1, k/|r|) uses only /, abs — no
  transcendentals), so the weighted mean trajectory is bitwise
  reproducible; SQL replays the steps as chained CTEs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6

_KW_SCALE = 1_000_000            # 1e-6 units for per-group H contributions
_MOD_SCALE = 10**12              # 1e-12 units for per-community Q terms
_HUB_ITERS = 4
_HUB_WX_SCALE = 10_000           # 1e-4 cent units for Σ w·x
_HUB_W_SCALE = 1_000_000_000     # 1e-9 units for Σ w


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _signround(v: np.ndarray) -> np.ndarray:
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


# ---------------------------------------------------------------------------
# Kruskal-Wallis
# ---------------------------------------------------------------------------


def q_kruskal_wallis_value_by_type(sf_dir: str):
    """Kruskal-Wallis H with tie correction from (type, cent) cells
    (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def cpart(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": np.asarray(t["event_type"].to_pylist(),
                                     dtype=object),
            "c": c, "n": np.int64(1)})
        g = df.groupby(["event_type", "c"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["event_type", "c"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas().sort_values(["c", "event_type"])
               .reset_index(drop=True))
    # global per-cent histogram + exclusive cumulative counts
    h = cells.groupby("c", sort=True)["n"].sum()
    cb = h.cumsum().shift(1, fill_value=0)
    cells["cb"] = cb.reindex(cells["c"]).to_numpy(np.int64)
    cells["t"] = h.reindex(cells["c"]).to_numpy(np.int64)
    cells["rterm"] = cells["n"].to_numpy(np.int64) \
        * (2 * cells["cb"].to_numpy(np.int64)
           + cells["t"].to_numpy(np.int64) + 1)
    g = cells.groupby("event_type", sort=True).agg(
        ng=("n", "sum"), r2g=("rterm", "sum")).reset_index()
    n = int(h.sum())
    nf = float(n)
    st = int(sum(int(t) ** 3 - int(t) for t in h))
    units = []
    for _, row in g.iterrows():
        r2 = int(row["r2g"])
        contrib = ((12.0 / (nf * (nf + 1.0)))
                   * (float(r2 * r2) / (4.0 * float(int(row["ng"])))))
        units.append(int(np.floor(contrib * float(_KW_SCALE) + 0.5)))
    hstat = (float(sum(units)) / float(_KW_SCALE)) - 3.0 * (nf + 1.0)
    ccor = 1.0 - float(st) / (nf * nf * nf - nf)
    r6 = _round6(np.array([hstat, ccor, hstat / ccor]))
    out = pd.DataFrame({"event_type": g["event_type"],
                        "ng": g["ng"].to_numpy(np.int64),
                        "r2g": g["r2g"].to_numpy(np.int64),
                        "contrib_units": np.array(units, np.int64)})
    out["h6"] = r6[0]
    out["c6"] = r6[1]
    out["hc6"] = r6[2]
    return out.sort_values("event_type").reset_index(drop=True)


SQL_KRUSKAL = f"""
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events),
g AS (SELECT event_type, c, count(*)::BIGINT AS n FROM v GROUP BY 1, 2),
h AS (SELECT c, sum(n)::BIGINT AS t FROM g GROUP BY 1),
hh AS (
  SELECT c, t,
         coalesce(sum(t) OVER (ORDER BY c
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0)::BIGINT AS cb
  FROM h),
r2 AS (
  SELECT g.event_type, sum(g.n)::BIGINT AS ng,
         sum(g.n * (2 * hh.cb + hh.t + 1))::BIGINT AS r2g
  FROM g JOIN hh USING (c) GROUP BY 1),
nn AS (SELECT sum(n)::BIGINT AS n FROM g),
ct AS (SELECT sum(t * t * t - t)::HUGEINT AS st FROM h),
u AS (
  SELECT event_type, ng, r2g,
         CAST(round((12.0 / (CAST(nn.n AS DOUBLE)
                             * (CAST(nn.n AS DOUBLE) + 1.0)))
                    * (CAST(r2g::HUGEINT * r2g::HUGEINT AS DOUBLE)
                       / (4.0 * CAST(ng AS DOUBLE)))
                    * {_KW_SCALE}.0) AS BIGINT) AS contrib_units
  FROM r2, nn),
f AS (
  SELECT (CAST(sum(u.contrib_units) AS DOUBLE) / {_KW_SCALE}.0)
         - 3.0 * (CAST(nn.n AS DOUBLE) + 1.0) AS hstat,
         1.0 - CAST(ct.st AS DOUBLE)
               / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
                  * CAST(nn.n AS DOUBLE) - CAST(nn.n AS DOUBLE)) AS ccor
  FROM u, nn, ct GROUP BY nn.n, ct.st)
SELECT u.event_type, u.ng, u.r2g, u.contrib_units,
       round(f.hstat, 6) AS h6, round(f.ccor, 6) AS c6,
       round(f.hstat / f.ccor, 6) AS hc6
FROM u CROSS JOIN f
ORDER BY u.event_type
"""


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------


def q_modularity_by_lang(sf_dir: str):
    """Directed modularity of the language partition over the synthetic
    doc graph (docstring above)."""
    n_docs = _nrows(sf_dir, "documents")
    ds = _pq(sf_dir, "documents", columns=["doc_id", "lang"])

    def scatter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(t["lang"].to_pylist(), dtype=object)
        # node rows carry the label; edge rows carry the src community
        # keyed by the DESTINATION doc — one shuffle resolves both.
        key = [ids]
        lab = [src]
        kind = [np.zeros(len(ids), np.int64)]
        for cc in (1, 2, 3):
            key.append((ids * 31 + cc) % n_docs)
            lab.append(src)
            kind.append(np.ones(len(ids), np.int64))
        allk = np.concatenate(key)
        return pa.table({"key": pa.array(allk),
                         "lab": pa.array(np.concatenate(lab), pa.string()),
                         "kind": pa.array(np.concatenate(kind)),
                         "gkey": pa.array((allk % 256).astype(np.int32))})

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        # salted partition: recover real doc boundaries vectorized —
        # node rows (kind 0) give each key's community; edge rows
        # (kind 1) carry the source community keyed by destination.
        node = df[df["kind"] == 0][["key", "lab"]] \
            .rename(columns={"lab": "dst_comm"})
        edges = df[df["kind"] == 1]
        g = edges.groupby(["key", "lab"], sort=False) \
                 .size().reset_index(name="cnt")
        j = g.merge(node, on="key")
        out = j.groupby(["lab", "dst_comm"], sort=False)["cnt"] \
               .sum().reset_index() \
               .rename(columns={"lab": "src_comm"})
        out["cnt"] = out["cnt"].astype(np.int64)
        return out[["src_comm", "dst_comm", "cnt"]]

    cells = (ds.map_batches(scatter, batch_format="pyarrow")
               .groupby("gkey").map_groups(resolve, batch_format="pandas")
               .groupby(["src_comm", "dst_comm"])
               .aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas().sort_values(["src_comm", "dst_comm"])
               .reset_index(drop=True))
    cnt = cells["cnt"].to_numpy(np.int64)
    m = int(cnt.sum())
    mf = float(m)
    comms = np.sort(pd.concat([cells["src_comm"],
                               cells["dst_comm"]]).unique())
    out_s = cells.groupby("src_comm")["cnt"].sum()
    in_s = cells.groupby("dst_comm")["cnt"].sum()
    diag = {(a, b): int(c) for a, b, c
            in zip(cells["src_comm"], cells["dst_comm"], cnt)}
    units = []
    for comm in comms:
        e = diag.get((comm, comm), 0)
        oc = int(out_s.get(comm, 0))
        ic = int(in_s.get(comm, 0))
        term = (float(e) / mf
                - (float(oc) / mf) * (float(ic) / mf))
        units.append(int(np.sign(term)
                         * np.floor(abs(term) * float(_MOD_SCALE) + 0.5)))
    q6 = _round6(np.array([float(sum(units)) / float(_MOD_SCALE)]))[0]
    outdf = pd.DataFrame({
        "comm": comms,
        "e_in": np.array([diag.get((c, c), 0) for c in comms], np.int64),
        "out_deg": np.array([int(out_s.get(c, 0)) for c in comms],
                            np.int64),
        "in_deg": np.array([int(in_s.get(c, 0)) for c in comms], np.int64),
        "term_units": np.array(units, np.int64)})
    outdf["m"] = np.int64(m)
    outdf["q6"] = q6
    return outdf.sort_values("comm").reset_index(drop=True)


def _mod_sql(n_docs_expr: str = "(SELECT count(*) FROM documents)") -> str:
    return f"""
WITH nd AS (SELECT count(*)::BIGINT AS n FROM documents),
edges AS (
  SELECT d1.lang AS src_comm, d2.lang AS dst_comm
  FROM documents d1
  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS cc) s
  JOIN nd ON true
  JOIN documents d2 ON d2.doc_id = (d1.doc_id * 31 + s.cc) % nd.n),
cells AS (
  SELECT src_comm, dst_comm, count(*)::BIGINT AS cnt
  FROM edges GROUP BY 1, 2),
m AS (SELECT sum(cnt)::BIGINT AS m FROM cells),
comms AS (
  SELECT src_comm AS comm FROM cells
  UNION SELECT dst_comm FROM cells),
od AS (SELECT src_comm AS comm, sum(cnt)::BIGINT AS o FROM cells
       GROUP BY 1),
idg AS (SELECT dst_comm AS comm, sum(cnt)::BIGINT AS i FROM cells
        GROUP BY 1),
dg AS (SELECT src_comm AS comm, cnt AS e FROM cells
       WHERE src_comm = dst_comm),
u AS (
  SELECT comms.comm,
         coalesce(dg.e, 0)::BIGINT AS e_in,
         coalesce(od.o, 0)::BIGINT AS out_deg,
         coalesce(idg.i, 0)::BIGINT AS in_deg,
         CAST(round((CAST(coalesce(dg.e, 0) AS DOUBLE)
                     / CAST(m.m AS DOUBLE)
                     - (CAST(coalesce(od.o, 0) AS DOUBLE)
                        / CAST(m.m AS DOUBLE))
                       * (CAST(coalesce(idg.i, 0) AS DOUBLE)
                          / CAST(m.m AS DOUBLE)))
                    * {_MOD_SCALE}.0) AS BIGINT) AS term_units,
         m.m
  FROM comms
  LEFT JOIN dg USING (comm) LEFT JOIN od USING (comm)
  LEFT JOIN idg USING (comm) CROSS JOIN m),
f AS (SELECT round(CAST(sum(term_units) AS DOUBLE) / {_MOD_SCALE}.0, 6)
        AS q6 FROM u)
SELECT u.comm, u.e_in, u.out_deg, u.in_deg, u.term_units, u.m, f.q6
FROM u CROSS JOIN f
ORDER BY u.comm
"""


SQL_MODULARITY = _mod_sql()


# ---------------------------------------------------------------------------
# Huber M-estimator
# ---------------------------------------------------------------------------


def q_huber_location_value(sf_dir: str):
    """Huber location by 4 fixed IRLS steps with exact quantized
    weighted sums (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["value"]).materialize()

    def mpart(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([np.int64(len(c))]),
                         "s": pa.array([int(c.sum())]),
                         "s2": pa.array([int((c * c).sum())])})

    mo = ds.map_batches(mpart, batch_format="pyarrow").to_pandas()
    n = int(mo["n"].sum())
    s = sum(int(x) for x in mo["s"])
    s2 = sum(int(x) for x in mo["s2"])
    nf = float(n)
    mu = float(s) / nf
    sig = np.sqrt((float(s2) - (float(s) / nf) * float(s)) / nf)
    mean0 = mu
    for _ in range(_HUB_ITERS):
        cmu = mu

        def wpart(t: pa.Table) -> pa.Table:
            c = _cents(t["value"]).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            r = np.abs(c - cmu)
            w = np.where(r <= sig, 1.0, sig / r)
            return pa.table({
                "sw": pa.array([int(_signround(
                    w * float(_HUB_W_SCALE)).sum())]),
                "swx": pa.array([int(_signround(
                    (w * c) * float(_HUB_WX_SCALE)).sum())])})

        parts = ds.map_batches(wpart, batch_format="pyarrow").to_pandas()
        sw = sum(int(x) for x in parts["sw"])
        swx = sum(int(x) for x in parts["swx"])
        mu = ((float(swx) / float(_HUB_WX_SCALE))
              / (float(sw) / float(_HUB_W_SCALE)))
    r6 = _round6(np.array([mean0, float(sig), mu]))
    out = pd.DataFrame({"n": [n], "iters": [_HUB_ITERS],
                        "mean6": [r6[0]], "sigma6": [r6[1]],
                        "huber6": [r6[2]]})
    for col in ("n", "iters"):
        out[col] = out[col].astype(np.int64)
    return out


def _huber_sql() -> str:
    ctes = [
        "v AS (SELECT CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE)"
        " AS c FROM events)",
        "mo AS (SELECT count(*)::BIGINT AS n, sum(CAST(c AS BIGINT))"
        "::BIGINT AS s, sum(CAST(c AS BIGINT) * CAST(c AS BIGINT))"
        "::BIGINT AS s2 FROM v)",
        "st AS (SELECT CAST(n AS DOUBLE) AS nf,"
        " CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu0,"
        " sqrt((CAST(s2 AS DOUBLE) - (CAST(s AS DOUBLE)"
        " / CAST(n AS DOUBLE)) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE))"
        " AS sig FROM mo)",
        "m0 AS (SELECT mu0 AS mu FROM st)",
    ]
    prev = "m0"
    for i in range(1, _HUB_ITERS + 1):
        w = ("CASE WHEN abs(c - m.mu) <= st.sig THEN 1.0 "
             "ELSE st.sig / abs(c - m.mu) END")
        ctes.append(
            f"g{i} AS (SELECT "
            f"sum(CAST(round(({w}) * {_HUB_W_SCALE}.0) AS BIGINT))::BIGINT"
            f" AS sw, "
            f"sum(CAST(round((({w}) * c) * {_HUB_WX_SCALE}.0) AS BIGINT))"
            f"::BIGINT AS swx "
            f"FROM v, {prev} m, st)")
        ctes.append(
            f"m{i} AS (SELECT (CAST(swx AS DOUBLE) / {_HUB_WX_SCALE}.0)"
            f" / (CAST(sw AS DOUBLE) / {_HUB_W_SCALE}.0) AS mu"
            f" FROM g{i})")
        prev = f"m{i}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT mo.n, {_HUB_ITERS}::BIGINT AS iters,
       round(st.mu0, 6) AS mean6, round(st.sig, 6) AS sigma6,
       round(m.mu, 6) AS huber6
FROM {prev} m, mo, st
""")


SQL_HUBER = _huber_sql()


QUERIES41: dict[str, tuple] = {
    "kruskal_wallis_value_by_type": (q_kruskal_wallis_value_by_type,
                                     SQL_KRUSKAL),
    "modularity_by_lang": (q_modularity_by_lang, SQL_MODULARITY),
    "huber_location_value": (q_huber_location_value, SQL_HUBER),
}
