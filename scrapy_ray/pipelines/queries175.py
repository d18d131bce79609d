"""One-hundred-seventy-fifth oracle-query batch — outlier geometry,
hash-table mechanics, and bandit elimination:

- lof_daily_points: the Local Outlier Factor (k = 3) on the 30 daily
  (click-count, view-count) points. Squared Euclidean distances
  are exact integers, so the k-distance and the tie-inclusive
  neighborhood N_k need no tiebreak; each lrd = |N|/Σreach is a
  ratio of exact integers quantized ONCE to 1e-9, making the final
  LOF averages order-free integer sums. Reports the top-3 LOF days.
- cuckoo_hash_audit: a 2-choice cuckoo hash insertion replay — the
  first ≤256 user ids (ascending) into a 512-slot table, hash pair
  from the mirrored multiplicative family, displaced keys walk to
  their alternate slot, 64-hop chains declare failure. One hop per
  recursion level with (slots LIST, pending, hops) state; reports
  inserted / evictions / failures / longest chain.
- successive_halving_sources: the successive-halving bandit over the
  20 document sources — "pulls" are the first-k docs by doc_id, the
  reward is n_chars, budgets 4 → 8 → 16 with survivors 10 → 5 → 1.
  Equal budgets per round make every comparison a pure integer
  prefix-sum comparison (sum desc, source asc); the winner and each
  round's survivor count are reported.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries169 import _daily_xmy

_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_CK_SLOTS = 512
_CK_KEYS = 256
_CK_MAXHOP = 64
_SH_BUDGETS = (4, 8, 16)
_SH_KEEP = (10, 5, 1)


# ---------------------------------------------------------------------------
# Local Outlier Factor
# ---------------------------------------------------------------------------


def q_lof_daily_points(sf_dir: str):
    """LOF(k=3) on daily (clicks, views) points (docstring)."""
    dly = _daily_xmy(sf_dir)
    x = dly["x"].to_numpy(np.int64)
    m = dly["m"].to_numpy(np.int64)
    day = np.arange(1, len(dly) + 1, dtype=np.int64)
    n = len(dly)
    d2 = (x[:, None] - x[None, :]) ** 2 + (m[:, None] - m[None, :]) ** 2
    kdist = np.zeros(n, np.int64)
    neigh: list[np.ndarray] = []
    for i in range(n):
        d = np.delete(d2[i], i)
        idx = np.delete(np.arange(n), i)
        kdist[i] = np.sort(d)[2]
        neigh.append(idx[d <= kdist[i]])
    lrd_q = np.zeros(n, np.int64)
    for i in range(n):
        reach = sum(int(max(kdist[o], d2[i, o])) for o in neigh[i])
        lrd = float(len(neigh[i])) / float(reach)
        lrd_q[i] = int(np.floor(lrd * 1e9 + 0.5))
    lof = np.zeros(n, np.float64)
    for i in range(n):
        s = sum(int(lrd_q[o]) for o in neigh[i])
        lof[i] = (float(s) / float(lrd_q[i])) / len(neigh[i])
    order = np.lexsort((day, -lof))[:3]
    r6 = _round6(lof[order])
    out = pd.DataFrame({"rank": np.arange(1, 4, dtype=np.int64),
                        "day_idx": day[order],
                        "lof6": r6})
    for col in ("rank", "day_idx"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LOF = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum((event_type = 'click')::INT)::BIGINT AS x,
         sum((event_type = 'view')::INT)::BIGINT AS m
  FROM events GROUP BY 1),
pts AS (
  SELECT row_number() OVER (ORDER BY day) AS i, x, m FROM dly),
d2 AS (
  SELECT a.i AS i, b.i AS j,
         ((a.x - b.x) * (a.x - b.x)
          + (a.m - b.m) * (a.m - b.m))::BIGINT AS d
  FROM pts a JOIN pts b ON a.i <> b.i),
kd AS (
  SELECT i, max(d) AS kdist
  FROM (SELECT i, d, row_number() OVER
          (PARTITION BY i ORDER BY d, j) AS rn
        FROM d2)
  WHERE rn <= 3 GROUP BY i),
nb AS (
  SELECT d2.i, d2.j, d2.d
  FROM d2 JOIN kd ON kd.i = d2.i
  WHERE d2.d <= kd.kdist),
lrd AS (
  SELECT nb.i,
         CAST(round(1e9 * (CAST(count(*) AS DOUBLE)
           / CAST(sum(greatest(kdo.kdist, nb.d)) AS DOUBLE)))
           AS BIGINT) AS lq
  FROM nb JOIN kd kdo ON kdo.i = nb.j
  GROUP BY nb.i),
lof AS (
  SELECT nb.i,
         (CAST(sum(lo.lq) AS DOUBLE)
          / CAST(lp.lq AS DOUBLE)) / count(*) AS lof
  FROM nb JOIN lrd lo ON lo.i = nb.j
          JOIN lrd lp ON lp.i = nb.i
  GROUP BY nb.i, lp.lq)
SELECT row_number() OVER (ORDER BY lof DESC, i) AS rank,
       i::BIGINT AS day_idx, round(lof, 6) AS lof6
FROM lof ORDER BY lof DESC, i LIMIT 3
"""


# ---------------------------------------------------------------------------
# Cuckoo hash replay
# ---------------------------------------------------------------------------


def _ck_h(u: int, j: int) -> int:
    return ((u % _H_MOD) * _H_MULT + j * _H_STEP) % _H_MOD \
        % _CK_SLOTS


def q_cuckoo_hash_audit(sf_dir: str):
    """2-choice cuckoo insertion replay (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["user_id"])
    keys = sorted(int(u) for u in ds.unique("user_id"))[:_CK_KEYS]
    slots = [0] * _CK_SLOTS
    inserted = 0
    evictions = 0
    failures = 0
    max_chain = 0
    for k in keys:
        pend = k
        pos = _ck_h(pend, 1)
        hops = 0
        while True:
            if slots[pos] == 0:
                slots[pos] = pend
                inserted += 1
                break
            if hops >= _CK_MAXHOP:
                failures += 1
                break
            out = slots[pos]
            slots[pos] = pend
            pend = out
            evictions += 1
            hops += 1
            h1o = _ck_h(pend, 1)
            pos = _ck_h(pend, 2) if pos == h1o else h1o
        max_chain = max(max_chain, hops)
    load6 = _round6(np.array([float(inserted) / _CK_SLOTS]))[0]
    out = pd.DataFrame({"n_keys": [len(keys)],
                        "inserted": [inserted],
                        "evictions": [evictions],
                        "failures": [failures],
                        "max_chain": [max_chain],
                        "load6": [load6]})
    for col in ("n_keys", "inserted", "evictions", "failures",
                "max_chain"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CUCKOO = f"""
WITH RECURSIVE ks AS (
  SELECT list(u ORDER BY u) AS kl, count(*)::BIGINT AS nk
  FROM (SELECT DISTINCT user_id AS u FROM events
        ORDER BY u LIMIT {_CK_KEYS})),
sim AS (
  SELECT 0 AS step, kl, nk,
         [0::BIGINT FOR z IN range(1, {_CK_SLOTS} + 1)] AS slots,
         1::BIGINT AS nxt,          -- next key index to load
         CAST(NULL AS BIGINT) AS pend,
         CAST(NULL AS BIGINT) AS pos,
         0::BIGINT AS hops, 0::BIGINT AS inserted,
         0::BIGINT AS evictions, 0::BIGINT AS failures,
         0::BIGINT AS max_chain
  FROM ks
  UNION ALL
  SELECT step + 1, kl, nk,
         -- comprehensions cannot correlate through LATERAL (the
         -- PELT lesson), so every new_* expression inlines over p1
         CASE WHEN slots[ap] = 0 THEN
           [CASE WHEN si = ap THEN ak ELSE slots[si] END
            FOR si IN range(1, {_CK_SLOTS} + 1)]
         WHEN ah >= {_CK_MAXHOP} THEN slots
         ELSE
           [CASE WHEN s2 = ap THEN ak ELSE slots[s2] END
            FOR s2 IN range(1, {_CK_SLOTS} + 1)]
         END AS slots,
         CASE WHEN slots[ap] = 0 OR ah >= {_CK_MAXHOP}
              THEN nxt + 1 ELSE nxt END,
         CASE WHEN slots[ap] = 0 OR ah >= {_CK_MAXHOP}
              THEN NULL ELSE slots[ap] END,
         CASE WHEN slots[ap] = 0 OR ah >= {_CK_MAXHOP}
              THEN NULL
         ELSE CASE WHEN ap =
                CAST(((slots[ap]::UBIGINT % {_H_MOD})
                      * {_H_MULT}::UBIGINT + {_H_STEP})
                     % {_H_MOD} % {_CK_SLOTS} AS BIGINT) + 1
              THEN CAST(((slots[ap]::UBIGINT % {_H_MOD})
                         * {_H_MULT}::UBIGINT + {2 * _H_STEP})
                        % {_H_MOD} % {_CK_SLOTS} AS BIGINT) + 1
              ELSE CAST(((slots[ap]::UBIGINT % {_H_MOD})
                         * {_H_MULT}::UBIGINT + {_H_STEP})
                        % {_H_MOD} % {_CK_SLOTS} AS BIGINT) + 1
              END
         END,
         CASE WHEN slots[ap] = 0 OR ah >= {_CK_MAXHOP}
              THEN 0 ELSE ah + 1 END,
         CASE WHEN slots[ap] = 0
              THEN inserted + 1 ELSE inserted END,
         CASE WHEN slots[ap] <> 0 AND ah < {_CK_MAXHOP}
              THEN evictions + 1 ELSE evictions END,
         CASE WHEN slots[ap] <> 0 AND ah >= {_CK_MAXHOP}
              THEN failures + 1 ELSE failures END,
         greatest(max_chain,
                  CASE WHEN slots[ap] = 0 OR ah >= {_CK_MAXHOP}
                       THEN ah ELSE ah + 1 END)
  FROM (
    SELECT step, kl, nk,
           CASE WHEN pend IS NULL THEN kl[nxt] ELSE pend END AS ak,
           CASE WHEN pend IS NULL THEN
             CAST(((kl[nxt]::UBIGINT % {_H_MOD})
                   * {_H_MULT}::UBIGINT + {_H_STEP})
                  % {_H_MOD} % {_CK_SLOTS} AS BIGINT) + 1
           ELSE pos END AS ap,
           CASE WHEN pend IS NULL THEN 0 ELSE hops END AS ah,
           nxt, slots, inserted, evictions, failures, max_chain
    FROM sim WHERE nxt <= nk OR pend IS NOT NULL) p1),
fin AS (
  SELECT * FROM sim
  ORDER BY step DESC LIMIT 1)
SELECT nk AS n_keys, inserted, evictions, failures, max_chain,
       round(CAST(inserted AS DOUBLE) / {_CK_SLOTS}, 6) AS load6
FROM fin
"""


# ---------------------------------------------------------------------------
# Successive halving
# ---------------------------------------------------------------------------


def q_successive_halving_sources(sf_dir: str):
    """Successive-halving over sources on n_chars prefix sums."""
    ds = _pq(sf_dir, "documents",
             columns=["source", "doc_id", "n_chars"])

    def firstk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id").head(max(_SH_BUDGETS))
        return _strip(pd.DataFrame({
            "source": [df["source"].iloc[0]] * len(df),
            "rk": np.arange(1, len(df) + 1, dtype=np.int64),
            "nc": df["n_chars"].to_numpy(np.int64)}))

    rows = (ds.groupby("source")
              .map_groups(firstk, batch_format="pandas")
              .to_pandas())
    alive = sorted(rows["source"].unique().tolist())
    surv = []
    final_sum = 0
    for budget, keep in zip(_SH_BUDGETS, _SH_KEEP):
        sub = rows[(rows["source"].isin(alive))
                   & (rows["rk"] <= budget)]
        sums = sub.groupby("source")["nc"].sum().reset_index()
        sums = sums.sort_values(["nc", "source"],
                                ascending=[False, True])
        alive = sums.head(keep)["source"].tolist()
        surv.append(len(alive))
        final_sum = int(sums["nc"].iloc[0])
    winner = alive[0]
    mean6 = _round6(np.array([
        float(final_sum) / _SH_BUDGETS[-1]]))[0]
    out = pd.DataFrame({"winner": [winner],
                        "r1_alive": [surv[0]],
                        "r2_alive": [surv[1]],
                        "r3_alive": [surv[2]],
                        "winner_mean6": [mean6]})
    for col in ("r1_alive", "r2_alive", "r3_alive"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HALVING = f"""
WITH ranked AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY doc_id) AS rk
  FROM documents),
p1 AS (
  SELECT source, sum(n_chars)::BIGINT AS s
  FROM ranked WHERE rk <= {_SH_BUDGETS[0]} GROUP BY source
  ORDER BY s DESC, source LIMIT {_SH_KEEP[0]}),
p2 AS (
  SELECT r.source, sum(r.n_chars)::BIGINT AS s
  FROM ranked r JOIN p1 ON p1.source = r.source
  WHERE r.rk <= {_SH_BUDGETS[1]} GROUP BY r.source
  ORDER BY s DESC, r.source LIMIT {_SH_KEEP[1]}),
p3 AS (
  SELECT r.source, sum(r.n_chars)::BIGINT AS s
  FROM ranked r JOIN p2 ON p2.source = r.source
  WHERE r.rk <= {_SH_BUDGETS[2]} GROUP BY r.source
  ORDER BY s DESC, r.source LIMIT {_SH_KEEP[2]})
SELECT p3.source AS winner,
       (SELECT count(*) FROM p1)::BIGINT AS r1_alive,
       (SELECT count(*) FROM p2)::BIGINT AS r2_alive,
       (SELECT count(*) FROM p3)::BIGINT AS r3_alive,
       round(CAST(p3.s AS DOUBLE) / {_SH_BUDGETS[2]}, 6)
         AS winner_mean6
FROM p3
"""


QUERIES175: dict[str, tuple] = {
    "lof_daily_points": (q_lof_daily_points, SQL_LOF),
    "cuckoo_hash_audit": (q_cuckoo_hash_audit, SQL_CUCKOO),
    "successive_halving_sources": (q_successive_halving_sources,
                                   SQL_HALVING),
}
