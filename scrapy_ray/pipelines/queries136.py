"""One-hundred-thirty-sixth oracle-query batch — product growth
accounting and corpus shingle profiling:

- user_flow_daily: daily growth accounting over events (the events
  table spans ~one month, so DAYS are the non-degenerate grain —
  probed before wiring): for every day d after the first, DAU plus
  the exact decomposition retained (active d−1 and d) + new
  (first-ever day = d) + resurrected (active d, inactive d−1, seen
  before), and churned-into-d (active d−1, not d).
  DAU ≡ retained+new+resurrected holds exactly by construction.
  Distinct (user, day) actives come out of user-salted partitions.
- dau_wau_weekly: per-epoch-week WAU, Σ-of-daily-DAU, observed days,
  and the stickiness ratio avg-DAU/WAU — exact integers with one
  final division per week.
- shingle_uniqueness_profile: corpus 8-gram (word) shingle document
  frequencies — occurrences, distinct shingles, and the df ∈ {1},
  {2..5}, {6+} bucket counts (df over distinct docs); the unique
  fraction finalizes as one division. Shingles are salted by the
  repo's seeded hash64 so the df groupby never sees a giant
  string-keyed Aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries26 import _PARTS
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.functions.hashing import hash64


# ---------------------------------------------------------------------------
# shared distinct (user, month[, day]) extraction
# ---------------------------------------------------------------------------


def _um_part(t: pa.Table) -> pa.Table:
    u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    day = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
           // 86_400_000_000)
    df = pd.DataFrame({"u": u, "d": day.astype(np.int64)}) \
        .drop_duplicates()
    df["gkey"] = (df["u"] % _PARTS).astype(np.int32)
    return _strip(df)


# ---------------------------------------------------------------------------
# Growth accounting
# ---------------------------------------------------------------------------


def q_user_flow_daily(sf_dir: str):
    """Daily retained/new/resurrected/churned (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts"])

    def flow(df: pd.DataFrame) -> pd.DataFrame:
        a = df[["u", "d"]].drop_duplicates() \
            .sort_values(["u", "d"], kind="mergesort")
        u = a["u"].to_numpy(np.int64)
        m = a["d"].to_numpy(np.int64)
        firstrow = np.concatenate(([True], u[1:] != u[:-1]))
        prev_act = np.concatenate(([False],
                                   (u[1:] == u[:-1])
                                   & (m[1:] == m[:-1] + 1)))
        next_act = np.concatenate(((u[1:] == u[:-1])
                                   & (m[1:] == m[:-1] + 1), [False]))
        # first active month per user, aligned to every row
        fm = m[np.maximum.accumulate(
            np.where(firstrow, np.arange(len(m)), 0))]
        rows = []
        # contributions keyed by output month
        rows.append(pd.DataFrame({"mo": m[prev_act], "cat": 0,
                                  "c": np.int64(1)}))       # retained
        rows.append(pd.DataFrame({"mo": m[firstrow], "cat": 1,
                                  "c": np.int64(1)}))       # new
        res = (~prev_act) & (~firstrow) & (m > fm)
        rows.append(pd.DataFrame({"mo": m[res], "cat": 2,
                                  "c": np.int64(1)}))       # resurrected
        rows.append(pd.DataFrame({"mo": m[~next_act] + 1, "cat": 3,
                                  "c": np.int64(1)}))       # churned into
        rows.append(pd.DataFrame({"mo": m, "cat": 4,
                                  "c": np.int64(1)}))       # mau
        g = pd.concat(rows, ignore_index=True) \
            .groupby(["mo", "cat"], sort=False)["c"].sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    agg = (ds.map_batches(_um_part, batch_format="pyarrow")
             .groupby("gkey").map_groups(flow, batch_format="pandas")
             .to_pandas()
             .groupby(["mo", "cat"]).sum().reset_index())
    piv = agg.pivot_table(index="mo", columns="cat", values="c",
                          fill_value=0, aggfunc="sum")
    # the grid bounds come from ACTIVE days (cat 4) — the churned-into
    # contribution extends one day past the last active day
    act = agg[agg["cat"] == 4]["mo"]
    gmin, gmax = int(act.min()), int(act.max())
    months = [m for m in piv.index if gmin < m <= gmax]
    out = pd.DataFrame({
        "day": months,
        "dau": [int(piv.at[m, 4]) if 4 in piv.columns else 0
                for m in months],
        "retained": [int(piv.at[m, 0]) if 0 in piv.columns else 0
                     for m in months],
        "new_u": [int(piv.at[m, 1]) if 1 in piv.columns else 0
                  for m in months],
        "resurrected": [int(piv.at[m, 2]) if 2 in piv.columns else 0
                        for m in months],
        "churned": [int(piv.at[m, 3]) if 3 in piv.columns else 0
                    for m in months]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out.sort_values("day").reset_index(drop=True)


SQL_USER_FLOW = """
WITH a AS (
  SELECT DISTINCT user_id AS u,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS m
  FROM events),
fm AS (SELECT u, min(m) AS f FROM a GROUP BY 1),
g AS (SELECT min(m) AS gmin, max(m) AS gmax FROM a),
fl AS (
  SELECT a.u, a.m, fm.f,
         (p.u IS NOT NULL)::INT AS prev_act,
         (nx.u IS NOT NULL)::INT AS next_act
  FROM a JOIN fm USING (u)
  LEFT JOIN a p ON p.u = a.u AND p.m = a.m - 1
  LEFT JOIN a nx ON nx.u = a.u AND nx.m = a.m + 1),
contrib AS (
  SELECT m AS mo, 0 AS cat FROM fl WHERE prev_act = 1
  UNION ALL SELECT m, 1 FROM fl WHERE m = f
  UNION ALL SELECT m, 2 FROM fl
            WHERE prev_act = 0 AND m > f
  UNION ALL SELECT m + 1, 3 FROM fl WHERE next_act = 0
  UNION ALL SELECT m, 4 FROM fl),
c AS (
  SELECT mo, cat, count(*)::BIGINT AS c FROM contrib GROUP BY 1, 2)
SELECT mo AS day,
       coalesce(max(CASE WHEN cat = 4 THEN c END), 0)::BIGINT AS dau,
       coalesce(max(CASE WHEN cat = 0 THEN c END), 0)::BIGINT
         AS retained,
       coalesce(max(CASE WHEN cat = 1 THEN c END), 0)::BIGINT
         AS new_u,
       coalesce(max(CASE WHEN cat = 2 THEN c END), 0)::BIGINT
         AS resurrected,
       coalesce(max(CASE WHEN cat = 3 THEN c END), 0)::BIGINT
         AS churned
FROM c CROSS JOIN g
WHERE mo > g.gmin AND mo <= g.gmax
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# DAU/MAU
# ---------------------------------------------------------------------------


def q_dau_wau_weekly(sf_dir: str):
    """Weekly stickiness avg-DAU / WAU (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id", "ts"])

    def dm(df: pd.DataFrame) -> pd.DataFrame:
        ud = df[["u", "d"]].drop_duplicates()
        wk = ud["d"].to_numpy(np.int64) // 7
        dau = pd.DataFrame({"mo": wk, "d": ud["d"].to_numpy(np.int64),
                            "c": np.int64(1)}) \
            .groupby(["mo", "d"], sort=False)["c"].sum().reset_index()
        day_rows = pd.DataFrame({"mo": dau["mo"], "key": dau["d"],
                                 "tag": np.int64(0), "c": dau["c"]})
        uw = pd.DataFrame({"u": ud["u"].to_numpy(np.int64),
                           "w": wk}).drop_duplicates()
        wau = uw.groupby("w", sort=False)["u"].size().reset_index(
            name="c")
        mau_rows = pd.DataFrame({"mo": wau["w"].to_numpy(np.int64),
                                 "key": np.int64(-1),
                                 "tag": np.int64(1),
                                 "c": wau["c"].astype(np.int64)})
        out = pd.concat([day_rows, mau_rows], ignore_index=True)
        for col in ("mo", "key", "tag", "c"):
            out[col] = out[col].astype(np.int64)
        return out

    agg = (ds.map_batches(_um_part, batch_format="pyarrow")
             .groupby("gkey").map_groups(dm, batch_format="pandas")
             .to_pandas())
    days = agg[agg["tag"] == 0].groupby(["mo", "key"])["c"].sum()
    mau = agg[agg["tag"] == 1].groupby("mo")["c"].sum()
    rows = []
    for mo in sorted(mau.index):
        dvals = days.loc[[mo]]
        sum_dau = int(dvals.sum())
        n_days = int(len(dvals))
        mv = int(mau.loc[mo])
        stick = float(sum_dau) / float(n_days) / float(mv)
        rows.append((int(mo), mv, sum_dau, n_days,
                     _round6(np.array([stick]))[0]))
    out = pd.DataFrame(rows, columns=["week", "wau", "sum_dau",
                                      "n_days", "stick6"])
    for col in ("week", "wau", "sum_dau", "n_days"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_DAU_MAU = """
WITH ud AS (
  SELECT DISTINCT user_id AS u,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
  FROM events),
dau AS (
  SELECT d // 7 AS w, d, count(DISTINCT u)::BIGINT AS dau
  FROM ud GROUP BY 1, 2),
wau AS (
  SELECT d // 7 AS w, count(DISTINCT u)::BIGINT AS wau
  FROM ud GROUP BY 1),
dm AS (
  SELECT w, sum(dau)::BIGINT AS sum_dau, count(*)::BIGINT AS n_days
  FROM dau GROUP BY 1)
SELECT wau.w AS week, wau.wau, dm.sum_dau, dm.n_days,
       round(CAST(dm.sum_dau AS DOUBLE) / CAST(dm.n_days AS DOUBLE)
             / CAST(wau.wau AS DOUBLE), 6) AS stick6
FROM wau JOIN dm USING (w) ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Shingle uniqueness
# ---------------------------------------------------------------------------


def q_shingle_uniqueness_profile(sf_dir: str):
    """8-gram shingle df buckets (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["doc_id", "text"])

    def spart(t: pa.Table) -> pa.Table:
        shs, occs = [], 0
        for txt in t["text"].to_pylist():
            ws = txt.split()
            doc_shs = {" ".join(ws[i:i + 8])
                       for i in range(len(ws) - 7)}
            occs += max(0, len(ws) - 7)
            shs.extend(doc_shs)
        df = pd.DataFrame({"sh": shs, "c": np.int64(1)})
        g = df.groupby("sh", sort=False)["c"].sum().reset_index()
        g["c"] = g["c"].astype(np.int64)
        g["gkey"] = (hash64(g["sh"].to_numpy()) % 64).astype(np.int32)
        g["occ"] = np.int64(0)
        g.loc[g.index[:1], "occ"] = np.int64(occs)
        return _strip(g)

    def buckets(df: pd.DataFrame) -> pd.DataFrame:
        dfc = df.groupby("sh", sort=False)["c"].sum()
        v = dfc.to_numpy(np.int64)
        return pd.DataFrame({
            "occ": [np.int64(df["occ"].sum())],
            "dist": [np.int64(len(v))],
            "df1": [np.int64((v == 1).sum())],
            "df2_5": [np.int64(((v >= 2) & (v <= 5)).sum())],
            "df6p": [np.int64((v >= 6).sum())]})

    agg = (ds.map_batches(spart, batch_format="pyarrow")
             .groupby("gkey").map_groups(buckets, batch_format="pandas")
             .to_pandas())
    occ = int(agg["occ"].sum())
    dist = int(agg["dist"].sum())
    df1 = int(agg["df1"].sum())
    df25 = int(agg["df2_5"].sum())
    df6 = int(agg["df6p"].sum())
    out = pd.DataFrame({
        "n_occurrences": [occ], "n_distinct": [dist], "df1": [df1],
        "df2_5": [df25], "df6p": [df6],
        "uniq_frac6": [_round6(np.array([float(df1)
                                         / float(dist)]))[0]]})
    for col in ("n_occurrences", "n_distinct", "df1", "df2_5", "df6p"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SHINGLE_UNIQ = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts
  FROM documents),
sh AS (
  SELECT doc_id, array_to_string(ts[i:i + 7], ' ') AS sh
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts) - 6)) AS i) r(i)
  WHERE len(ts) >= 8),
occ AS (SELECT count(*)::BIGINT AS n FROM sh),
dfc AS (
  SELECT sh, count(DISTINCT doc_id)::BIGINT AS df
  FROM sh GROUP BY 1),
b AS (
  SELECT count(*)::BIGINT AS dist,
         sum((df = 1)::INT)::BIGINT AS df1,
         sum((df BETWEEN 2 AND 5)::INT)::BIGINT AS df2_5,
         sum((df >= 6)::INT)::BIGINT AS df6p
  FROM dfc)
SELECT occ.n AS n_occurrences, b.dist AS n_distinct, b.df1,
       b.df2_5, b.df6p,
       round(CAST(b.df1 AS DOUBLE) / CAST(b.dist AS DOUBLE), 6)
         AS uniq_frac6
FROM occ CROSS JOIN b
"""


QUERIES136: dict[str, tuple] = {
    "user_flow_daily": (q_user_flow_daily, SQL_USER_FLOW),
    "dau_wau_weekly": (q_dau_wau_weekly, SQL_DAU_MAU),
    "shingle_uniqueness_profile": (q_shingle_uniqueness_profile,
                                   SQL_SHINGLE_UNIQ),
}
