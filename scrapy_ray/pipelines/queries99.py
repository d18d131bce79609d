"""Ninety-ninth oracle-query batch — iterative anomaly extraction /
entropy discretization / local spatial association:

- esd_anomalies_daily: 5 rounds of ESD-style anomaly extraction from
  the daily revenue series — each round recomputes the exact disc
  median of the REMAINING days and removes the argmax |c - med|
  (scale-free within a round, so no MAD is needed for the ordering;
  tie -> earliest day).  Pure integer comparisons; the oracle chains
  5 CTE rounds with EXCEPT-style exclusion.
- mdlp_first_cut_value: the first MDLP/C4.5 entropy cut of value
  cents against the purchase label: for every candidate threshold the
  weighted class-entropy sum a*ln(nL/a) + b*ln(nL/b) + c*ln(nR/c) +
  d*ln(nR/d) (zero counts contribute 0) is quantized at 1e-9 into
  ONE exact int, and the cut is its exact argmin (tie -> smallest
  threshold).
- lisa_hotspots_docs: local Moran's I hotspots on the quadratic doc
  graph — with cleared z_u = n*x_u - S (exact ints) the local
  statistic li_v = z_v * SUM_{u->v} z_u is an exact int64 (~4e17 at
  sf0.1); top-5 by (li DESC, doc_id) = the strongest positive
  spatial-association nodes.  The in-neighbor z-sum rides the same
  one-shuffle scatter as the global Moran query.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _nrows, _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _daily_cents, _strip

_US_PER_DAY = 86_400_000_000
_ESD_K = 5


# ---------------------------------------------------------------------------
# ESD anomalies
# ---------------------------------------------------------------------------


def q_esd_anomalies_daily(sf_dir: str):
    """5-round median-deviation anomaly extraction (docstring above)."""
    c = [int(v) for v in _daily_cents(sf_dir)["c"].to_numpy(np.int64)]
    remaining = list(range(len(c)))
    rows = []
    for r in range(1, _ESD_K + 1):
        vals = sorted(c[t] for t in remaining)
        med = vals[math.ceil(0.5 * len(vals)) - 1]
        best = None
        for t in remaining:
            dev = abs(c[t] - med)
            if best is None or dev > best[0] or \
                    (dev == best[0] and t < best[1]):
                best = (dev, t)
        rows.append((r, best[1], c[best[1]], best[0]))
        remaining.remove(best[1])
    out = pd.DataFrame(rows, columns=["round", "t", "c", "dev"])
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


def _esd_sql() -> str:
    head = f"""
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // {_US_PER_DAY} AS BIGINT) AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
  FROM orders GROUP BY 1),
rem0 AS (SELECT c, row_number() OVER (ORDER BY day) - 1 AS t
         FROM daily)"""
    steps = []
    for r in range(1, _ESD_K + 1):
        steps.append(f""",
med{r} AS (SELECT quantile_disc(c, 0.5) AS m FROM rem{r-1}),
pick{r} AS (
  SELECT {r}::BIGINT AS round, t, c, abs(c - m)::BIGINT AS dev
  FROM rem{r-1} CROSS JOIN med{r}
  ORDER BY abs(c - m) DESC, t LIMIT 1),
rem{r} AS (
  SELECT rem{r-1}.c, rem{r-1}.t FROM rem{r-1}
  WHERE rem{r-1}.t <> (SELECT t FROM pick{r}))""")
    tail = ("\n" + "\nUNION ALL\n".join(
        f"SELECT round, t, c, dev FROM pick{r}"
        for r in range(1, _ESD_K + 1)) + "\nORDER BY round")
    return head + "".join(steps) + tail


SQL_ESD = _esd_sql()


# ---------------------------------------------------------------------------
# MDLP first cut
# ---------------------------------------------------------------------------


def q_mdlp_first_cut_value(sf_dir: str):
    """Entropy-minimizing first cut of value vs purchase (docstring
    above)."""
    ds = _pq(sf_dir, "events", columns=["value", "event_type"])

    def hpart(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        p = (np.asarray(t["event_type"].to_pylist())
             == "purchase").astype(np.int64)
        df = pd.DataFrame({"c": c, "p": p, "n": np.int64(1)})
        g = df.groupby("c", sort=False).sum().reset_index()
        for col in ("p", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    hist = (ds.map_batches(hpart, batch_format="pyarrow")
              .groupby("c").aggregate(Sum("p", alias_name="p"),
                                      Sum("n", alias_name="n"))
              .to_pandas().sort_values("c"))
    c = hist["c"].to_numpy(np.int64)
    pos = hist["p"].to_numpy(np.int64)
    cnt = hist["n"].to_numpy(np.int64)
    cump = np.cumsum(pos)
    cumn = np.cumsum(cnt)
    n = int(cumn[-1])
    npos = int(cump[-1])

    def ent_q(a: int, b: int) -> int:
        # each class term quantized SEPARATELY at 1e-9 (matches the SQL
        # per-CASE rounds); terms are >= 0
        q = 0
        if a:
            q += int(math.floor(a * math.log(float(a + b) / float(a))
                                * 1000000000.0 + 0.5))
        if b:
            q += int(math.floor(b * math.log(float(a + b) / float(b))
                                * 1000000000.0 + 0.5))
        return q

    best = None
    for i in range(len(c) - 1):
        a = int(cump[i])
        nl = int(cumn[i])
        b = nl - a
        cc = npos - a
        d = (n - nl) - cc
        wq = ent_q(a, b) + ent_q(cc, d)
        th = int(c[i])
        if best is None or wq < best[0] or \
                (wq == best[0] and th < best[1]):
            best = (wq, th)
    base_q = ent_q(npos, n - npos)
    out = pd.DataFrame({"n": [n], "n_pos": [npos],
                        "cut_c": [best[1]], "wq": [best[0]],
                        "base_q": [base_q],
                        "gain6": [_round6(np.array(
                            [(base_q - best[0]) / (n * 1e9)]))[0]]})
    for col in ("n", "n_pos", "cut_c", "wq", "base_q"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MDLP = """
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         (event_type = 'purchase')::INT AS p
  FROM events),
h AS (SELECT c, sum(p)::BIGINT AS pos, count(*)::BIGINT AS n
      FROM e GROUP BY 1),
t AS (SELECT sum(pos)::BIGINT AS npos, sum(n)::BIGINT AS nt,
             max(c) AS mx
      FROM h),
cum AS (
  SELECT c, sum(pos) OVER (ORDER BY c)::BIGINT AS a,
         sum(n) OVER (ORDER BY c)::BIGINT AS nl
  FROM h),
w AS (
  SELECT c AS th,
         (CASE WHEN a > 0 THEN
            CAST(round(a * ln(CAST(nl AS DOUBLE) / a) * 1000000000.0)
                 AS BIGINT) ELSE 0 END
          + CASE WHEN nl - a > 0 THEN
            CAST(round((nl - a) * ln(CAST(nl AS DOUBLE) / (nl - a))
                       * 1000000000.0) AS BIGINT) ELSE 0 END
          + CASE WHEN npos - a > 0 THEN
            CAST(round((npos - a) * ln(CAST(nt - nl AS DOUBLE)
                                       / (npos - a))
                       * 1000000000.0) AS BIGINT) ELSE 0 END
          + CASE WHEN (nt - nl) - (npos - a) > 0 THEN
            CAST(round(((nt - nl) - (npos - a))
                       * ln(CAST(nt - nl AS DOUBLE)
                            / ((nt - nl) - (npos - a)))
                       * 1000000000.0) AS BIGINT) ELSE 0 END) AS wq
  FROM cum CROSS JOIN t WHERE c < mx),
bq AS (
  SELECT (CASE WHEN npos > 0 THEN
            CAST(round(npos * ln(CAST(nt AS DOUBLE) / npos)
                       * 1000000000.0) AS BIGINT) ELSE 0 END
          + CASE WHEN nt - npos > 0 THEN
            CAST(round((nt - npos) * ln(CAST(nt AS DOUBLE)
                                        / (nt - npos))
                       * 1000000000.0) AS BIGINT) ELSE 0 END) AS base_q,
         npos, nt
  FROM t)
SELECT nt AS n, npos AS n_pos, th AS cut_c, wq, base_q,
       round(CAST(base_q - wq AS DOUBLE) / (nt * 1000000000.0), 6)
         AS gain6
FROM w CROSS JOIN bq ORDER BY wq, th LIMIT 1
"""


# ---------------------------------------------------------------------------
# LISA hotspots
# ---------------------------------------------------------------------------


def q_lisa_hotspots_docs(sf_dir: str):
    """Top-5 local Moran's I hotspots on the quadratic graph
    (docstring above)."""
    n = _nrows(sf_dir, "documents")
    ds = _pq(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def spart(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"g": pa.array([0], pa.int64()),
                         "s": pa.array([int(x.sum())], pa.int64())})

    s_tot = int((ds.map_batches(spart, batch_format="pyarrow")
                   .groupby("g").aggregate(Sum("s", alias_name="s"))
                   .to_pandas())["s"].iloc[0])

    def scatter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = n * x - s_tot
        key = [ids]
        zin = [np.zeros(len(ids), np.int64)]
        zown = [z]
        tag = [np.zeros(len(ids), np.int64)]
        for cc in (1, 2, 3):
            key.append((ids * ids + cc) % n)
            zin.append(z)
            zown.append(np.zeros(len(ids), np.int64))
            tag.append(np.ones(len(ids), np.int64))
        allk = np.concatenate(key)
        return pa.table({"key": pa.array(allk),
                         "zin": pa.array(np.concatenate(zin)),
                         "zown": pa.array(np.concatenate(zown)),
                         "tag": pa.array(np.concatenate(tag)),
                         "gkey": pa.array((allk % 256).astype(np.int32))})

    def local_i(df: pd.DataFrame) -> pd.DataFrame:
        node = df[df["tag"] == 0]
        ctb = df[df["tag"] == 1]
        zin = ctb.groupby("key")["zin"].sum()
        keys = node["key"].to_numpy(np.int64)
        zown = node["zown"].to_numpy(np.int64)
        zi = zin.reindex(keys).fillna(0).to_numpy(np.int64)
        li = zown * zi
        d = pd.DataFrame({"doc_id": keys, "li": li})
        return d.sort_values(["li", "doc_id"],
                             ascending=[False, True]).head(5)

    parts = (ds.map_batches(scatter, batch_format="pyarrow")
               .groupby("gkey").map_groups(local_i,
                                           batch_format="pandas")
               .to_pandas())
    top = parts.sort_values(["li", "doc_id"],
                            ascending=[False, True]).head(5)
    out = pd.DataFrame({"doc_id": top["doc_id"].astype(np.int64),
                        "li": top["li"].astype(np.int64)})
    return out.reset_index(drop=True)


SQL_LISA = """
WITH nd AS (SELECT count(*)::BIGINT AS n FROM documents),
s AS (SELECT sum(n_chars)::BIGINT AS st FROM documents),
z AS (
  SELECT doc_id, (nd.n * n_chars - s.st)::BIGINT AS z
  FROM documents CROSS JOIN nd CROSS JOIN s),
e AS (
  SELECT d.doc_id AS u, (d.doc_id * d.doc_id + c.c) % nd.n AS v
  FROM documents d, (SELECT unnest([1, 2, 3]) AS c) c JOIN nd ON true),
zin AS (
  SELECT e.v AS doc_id, sum(z.z)::BIGINT AS zi
  FROM e JOIN z ON z.doc_id = e.u GROUP BY 1),
li AS (
  SELECT z.doc_id, (z.z * coalesce(zin.zi, 0))::BIGINT AS li
  FROM z LEFT JOIN zin ON zin.doc_id = z.doc_id)
SELECT doc_id, li FROM li ORDER BY li DESC, doc_id LIMIT 5
"""


QUERIES99: dict[str, tuple] = {
    "esd_anomalies_daily": (q_esd_anomalies_daily, SQL_ESD),
    "mdlp_first_cut_value": (q_mdlp_first_cut_value, SQL_MDLP),
    "lisa_hotspots_docs": (q_lisa_hotspots_docs, SQL_LISA),
}
