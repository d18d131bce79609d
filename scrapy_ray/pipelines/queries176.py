"""One-hundred-seventy-sixth oracle-query batch — protocol / queueing
replays in exact (or once-quantized) arithmetic:

- mva_closed_network: exact Mean Value Analysis of a closed queueing
  network — the 3 busiest event types as stations, per-visit demand
  D_k = mean dollars per event (quantized once to 1e-6), N = 20
  circulating customers. The MVA recursion R_k = D_k(1+Q_k),
  X = n/ΣR, Q_k = X·R_k replays with per-level 1e-9 requantization
  of the Q state, so both sides walk identical integers; reports
  throughput, bottleneck station and its queue length.
- shamir_secret_sharing: a (3,5) Shamir split of the total revenue
  cents over GF(2³¹−1) — polynomial coefficients from the mirrored
  multiplicative hash, shares at x = 1..5, reconstruction from
  shares {1,3,5} by Lagrange interpolation at 0 with modular
  inverses via Fermat modpow (a^(p−2), 31-step square-and-multiply
  recursion in SQL; products stay < p² < 2^63). The in-query
  `ok` column asserts recon == secret.
- luhn_checksum_users: the share of user ids whose decimal digits
  pass the Luhn mod-10 check (double every second digit from the
  right, sum the digit sums) — pure digit arithmetic both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_P = 2147483647
_H_MOD = 4294967296
_H_MULT = 2654435761
_H_STEP = 40503
_MVA_N = 20


def _type_value_stats(sf_dir: str) -> pd.DataFrame:
    """Distributed (event_type, Σcents, count) over events."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def tpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"et": et, "sc": c, "n": np.int64(1)}) \
            .groupby("et", sort=False).sum().reset_index()
        for col in ("sc", "n"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(tpart, batch_format="pyarrow")
              .groupby("et").aggregate(Sum("sc", alias_name="sc"),
                                       Sum("n", alias_name="n"))
              .to_pandas())


# ---------------------------------------------------------------------------
# Mean Value Analysis
# ---------------------------------------------------------------------------


def q_mva_closed_network(sf_dir: str):
    """Exact MVA over the 3 busiest event types (docstring above)."""
    st = _type_value_stats(sf_dir)
    st = st.sort_values(["n", "et"],
                        ascending=[False, True]).head(3)
    st = st.sort_values("et").reset_index(drop=True)
    names = st["et"].tolist()
    dq = []
    for _, r in st.iterrows():
        d = float(int(r["sc"])) / float(int(r["n"])) / 1e2
        dq.append(int(np.floor(d * 1e6 + 0.5)))
    dk = [float(q) / 1e6 for q in dq]
    qk = [0.0, 0.0, 0.0]
    x = 0.0
    for n in range(1, _MVA_N + 1):
        rk = [dk[k] * (1.0 + qk[k]) for k in range(3)]
        rq = [int(np.floor(r * 1e9 + 0.5)) for r in rk]
        x = float(n) / (float(rq[0] + rq[1] + rq[2]) / 1e9)
        qk = [x * (float(rq[k]) / 1e9) for k in range(3)]
    # bottleneck: max demand, ties by station name ascending
    bidx = min(range(3), key=lambda k: (-dq[k], names[k]))
    r6 = _round6(np.array([x, qk[bidx]]))
    out = pd.DataFrame({"n_customers": [_MVA_N],
                        "bottleneck": [names[bidx]],
                        "throughput6": [r6[0]],
                        "bneck_queue6": [r6[1]]})
    out["n_customers"] = out["n_customers"].astype(np.int64)
    return out


SQL_MVA = f"""
WITH RECURSIVE st AS (
  SELECT event_type AS et,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sc,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1
  ORDER BY n DESC, et LIMIT 3),
dm AS (
  SELECT list(CAST(round(1e6 * (CAST(sc AS DOUBLE)
                / CAST(n AS DOUBLE) / 1e2)) AS BIGINT)
              ORDER BY et) AS dq,
         list(et ORDER BY et) AS nm
  FROM st),
mva AS (
  SELECT 0 AS n, dq, nm,
         [0e0, 0e0, 0e0] AS qk, 0e0 AS x
  FROM dm
  UNION ALL
  SELECT n + 1, dq, nm,
         [CAST(n + 1 AS DOUBLE)
          / (CAST(list_sum([CAST(round(1e9 *
               (CAST(dq[kk] AS DOUBLE) / 1e6 * (1e0 + qk[kk])))
               AS BIGINT) FOR kk IN range(1, 4)]) AS DOUBLE) / 1e9)
          * (CAST(CAST(round(1e9 *
               (CAST(dq[k2] AS DOUBLE) / 1e6 * (1e0 + qk[k2])))
               AS BIGINT) AS DOUBLE) / 1e9)
          FOR k2 IN range(1, 4)] AS qk,
         CAST(n + 1 AS DOUBLE)
         / (CAST(list_sum([CAST(round(1e9 *
              (CAST(dq[k3] AS DOUBLE) / 1e6 * (1e0 + qk[k3])))
              AS BIGINT) FOR k3 IN range(1, 4)]) AS DOUBLE) / 1e9)
           AS x
  FROM mva WHERE n < {_MVA_N}),
fin AS (SELECT * FROM mva WHERE n = {_MVA_N}),
bn AS (
  SELECT b.b AS bi FROM fin,
       LATERAL (SELECT unnest(range(1, 4)) AS b) b
  ORDER BY fin.dq[b.b] DESC, fin.nm[b.b] LIMIT 1)
SELECT {_MVA_N}::BIGINT AS n_customers,
       fin.nm[bn.bi] AS bottleneck,
       round(fin.x, 6) AS throughput6,
       round(fin.qk[bn.bi], 6) AS bneck_queue6
FROM fin, bn
"""


# ---------------------------------------------------------------------------
# Shamir secret sharing
# ---------------------------------------------------------------------------


def q_shamir_secret_sharing(sf_dir: str):
    """(3,5) Shamir over GF(2^31-1) with Fermat inverses."""
    ds = _pq(sf_dir, "events", columns=["value"])

    def cpart(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        return pa.table({"k": pa.array([0], pa.int64()),
                         "sc": pa.array([int(c.sum())], pa.int64())})

    total = int(ds.map_batches(cpart, batch_format="pyarrow")
                  .groupby("k").aggregate(Sum("sc", alias_name="sc"))
                  .to_pandas()["sc"].iloc[0])
    s = total % _P
    a1 = ((1 % _H_MOD) * _H_MULT + _H_STEP) % _H_MOD % _P
    a2 = ((2 % _H_MOD) * _H_MULT + _H_STEP) % _H_MOD % _P
    shares = [(s + a1 * x + a2 * x * x) % _P for x in (1, 2, 3, 4, 5)]
    xs = (1, 3, 5)
    recon = 0
    for i, xi in enumerate(xs):
        num = 1
        den = 1
        for j, xj in enumerate(xs):
            if i == j:
                continue
            num = (num * xj) % _P
            den = (den * ((xj - xi) % _P)) % _P
        lam = (num * pow(den, _P - 2, _P)) % _P
        recon = (recon + shares[xi - 1] * lam) % _P
    out = pd.DataFrame({"secret": [s], "share1": [shares[0]],
                        "share3": [shares[2]],
                        "share5": [shares[4]],
                        "recon": [recon],
                        "ok": [1 if recon == s else 0]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_SHAMIR = f"""
WITH RECURSIVE tot AS (
  SELECT sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sc
  FROM events),
par AS (
  SELECT sc % {_P} AS s,
         (1 * {_H_MULT} + {_H_STEP}) % {_H_MOD} % {_P} AS a1,
         (2 * {_H_MULT} + {_H_STEP}) % {_H_MOD} % {_P} AS a2
  FROM tot),
sh AS (
  SELECT s, a1, a2,
         [(s + a1 * xx + a2 * xx * xx) % {_P}
          FOR xx IN range(1, 6)] AS shares
  FROM par),
-- Lagrange at 0 for x-set (1,3,5): lam_i = num_i * inv(den_i);
-- dens are 8, p-4, 8 (mod p), nums are 15, 5, 3
mp AS (
  SELECT den, 1::BIGINT AS acc, den::BIGINT AS base,
         ({_P} - 2)::BIGINT AS e
  FROM (SELECT unnest([8::BIGINT, {_P} - 4, 8::BIGINT]) AS den)
  UNION ALL
  SELECT den,
         CASE WHEN e % 2 = 1 THEN (acc * base) % {_P}
              ELSE acc END,
         (base * base) % {_P},
         e // 2
  FROM mp WHERE e > 0),
inv AS (
  SELECT den, max(acc) FILTER (e = 0) AS iv
  FROM mp GROUP BY den),
lam AS (
  SELECT
    (15 * (SELECT iv FROM inv WHERE den = 8)) % {_P} AS l1,
    (5 * (SELECT iv FROM inv WHERE den = {_P} - 4)) % {_P} AS l3,
    (3 * (SELECT iv FROM inv WHERE den = 8)) % {_P} AS l5),
f AS (
  SELECT sh.s, sh.shares,
         ((sh.shares[1] * lam.l1) % {_P}
          + (sh.shares[3] * lam.l3) % {_P}
          + (sh.shares[5] * lam.l5) % {_P}) % {_P} AS recon
  FROM sh, lam)
SELECT s::BIGINT AS secret, shares[1]::BIGINT AS share1,
       shares[3]::BIGINT AS share3, shares[5]::BIGINT AS share5,
       recon::BIGINT AS recon,
       (CASE WHEN recon = s THEN 1 ELSE 0 END)::BIGINT AS ok
FROM f
"""


# ---------------------------------------------------------------------------
# Luhn checksum
# ---------------------------------------------------------------------------


def _luhn_ok(u: int) -> bool:
    total = 0
    dbl = False
    while True:
        d = u % 10
        if dbl:
            d *= 2
            if d > 9:
                d -= 9
        total += d
        u //= 10
        dbl = not dbl
        if u == 0:
            break
    return total % 10 == 0


def q_luhn_checksum_users(sf_dir: str):
    """Share of user ids passing the Luhn check (docstring)."""
    ds = _pq(sf_dir, "events", columns=["user_id"])
    uids = [int(u) for u in ds.unique("user_id")]
    n = len(uids)
    valid = sum(1 for u in uids if _luhn_ok(u))
    r6 = _round6(np.array([float(valid) / float(n)]))[0]
    out = pd.DataFrame({"n_users": [n], "n_valid": [valid],
                        "share6": [r6]})
    for col in ("n_users", "n_valid"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_LUHN = """
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
d AS (
  SELECT u, length(CAST(u AS VARCHAR)) AS ln,
         CAST(u AS VARCHAR) AS s
  FROM u),
l AS (
  SELECT u,
         list_sum(
           [CASE WHEN (ln - pp) % 2 = 1 THEN
              CASE WHEN 2 * CAST(substring(s, pp, 1) AS INT) > 9
                   THEN 2 * CAST(substring(s, pp, 1) AS INT) - 9
                   ELSE 2 * CAST(substring(s, pp, 1) AS INT) END
            ELSE CAST(substring(s, pp, 1) AS INT) END
            FOR pp IN range(1, ln + 1)]) AS tot
  FROM d)
SELECT count(*)::BIGINT AS n_users,
       sum((tot % 10 = 0)::INT)::BIGINT AS n_valid,
       round(CAST(sum((tot % 10 = 0)::INT) AS DOUBLE)
             / count(*), 6) AS share6
FROM l
"""


QUERIES176: dict[str, tuple] = {
    "mva_closed_network": (q_mva_closed_network, SQL_MVA),
    "shamir_secret_sharing": (q_shamir_secret_sharing, SQL_SHAMIR),
    "luhn_checksum_users": (q_luhn_checksum_users, SQL_LUHN),
}
