"""One-hundred-eighty-fourth oracle-query batch — online algorithms
and placement balance:

- rendezvous_hashing_balance: highest-random-weight (rendezvous)
  placement of every user onto 8 servers — server = argmax of the
  mirrored multiplicative hash h(u·, s·), ties impossible by
  construction folded into the argmax key (h·8 + s). Reports
  max/min loads and the uniform chi-square, side by side with the
  naive user_id%8 placement's chi-square.
- prophet_inequality_daily: the prophet-inequality threshold rule
  on the chronological daily revenue sequence — stop at the first
  day ≥ the lower-median threshold (else the last day); reports the
  realized fraction of the prophet's max and whether the 1/2 bound
  held on this instance (the guarantee is in expectation — the
  flag is an observed audit, not an assertion).
- ski_rental_sessions: the break-even ski-rental strategy replayed
  over every user session — rent for B seconds then buy (B = the
  lower-median session length), cost len if len < B else 2B,
  against OPT = min(len, B); lengths are INCLUSIVE seconds (+1,
  so singleton sessions cost 1 and the median B is never zero); the aggregate competitive ratio and
  the ≤2 bound flag. Session lengths ride the salted-partition
  sessionization device; all sums are exact integers.
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
_N_SRV = 8
_GAP_US = 30 * 60 * 1_000_000


# ---------------------------------------------------------------------------
# Rendezvous hashing
# ---------------------------------------------------------------------------


def q_rendezvous_hashing_balance(sf_dir: str):
    """HRW vs mod placement balance over users (docstring)."""
    ds = _pq(sf_dir, "events", columns=["user_id"])
    uids = np.asarray(sorted(int(u) for u in ds.unique("user_id")),
                      np.uint64)
    n = len(uids)
    best = np.zeros(n, np.int64)
    best_key = np.full(n, -1, np.int64)
    for s in range(1, _N_SRV + 1):
        h = ((uids % np.uint64(_H_MOD)) * np.uint64(_H_MULT)
             + np.uint64(s * _H_STEP)) % np.uint64(_H_MOD)
        key = (h.astype(np.int64) * _N_SRV) + s
        upd = key > best_key
        best_key[upd] = key[upd]
        best[upd] = s
    hrw = np.bincount(best, minlength=_N_SRV + 1)[1:]
    mod = np.bincount((uids % np.uint64(_N_SRV)).astype(np.int64),
                      minlength=_N_SRV)
    def chi2(loads: np.ndarray) -> float:
        # exact clearing: Σ(c − n/8)²/(n/8) = Σ(8c − n)² / (8n)
        s = sum((8 * int(v) - n) ** 2 for v in loads)
        return float(s) / (8.0 * n)

    r6 = _round6(np.array([chi2(hrw), chi2(mod)]))
    out = pd.DataFrame({"n_users": [n],
                        "hrw_max": [int(hrw.max())],
                        "hrw_min": [int(hrw.min())],
                        "hrw_chi2_6": [r6[0]],
                        "mod_chi2_6": [r6[1]]})
    for col in ("n_users", "hrw_max", "hrw_min"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_RENDEZVOUS = f"""
WITH u AS (SELECT DISTINCT user_id AS u FROM events),
keys AS (
  SELECT u.u, s.s,
         CAST(((u.u::UBIGINT % {_H_MOD}) * {_H_MULT}::UBIGINT
               + s.s * {_H_STEP}) % {_H_MOD} AS BIGINT)
           * {_N_SRV} + s.s AS key
  FROM u, (SELECT unnest(range(1, {_N_SRV} + 1)) AS s) s),
pick AS (
  SELECT u, max(key) % {_N_SRV} AS srv0 FROM keys GROUP BY u),
hrw AS (
  SELECT CASE WHEN srv0 = 0 THEN {_N_SRV} ELSE srv0 END AS srv,
         count(*)::BIGINT AS c
  FROM pick GROUP BY 1),
spine AS (SELECT unnest(range(1, {_N_SRV} + 1)) AS srv),
hl AS (
  SELECT sp.srv, coalesce(h.c, 0)::BIGINT AS c
  FROM spine sp LEFT JOIN hrw h ON h.srv = sp.srv),
ml AS (
  SELECT sp.srv, coalesce(m.c, 0)::BIGINT AS c
  FROM spine sp LEFT JOIN (
    SELECT CAST(u % {_N_SRV} AS BIGINT) + 1 AS srv,
           count(*)::BIGINT AS c
    FROM u GROUP BY 1) m ON m.srv = sp.srv),
nn AS (SELECT count(*)::BIGINT AS n FROM u),
f AS (
  SELECT (SELECT n FROM nn) AS n,
         (SELECT max(c) FROM hl) AS hmax,
         (SELECT min(c) FROM hl) AS hmin,
         -- exact clearing: chi2 = Σ(8c − n)² / (8n)
         (SELECT sum(({_N_SRV} * c - (SELECT n FROM nn))
                     * ({_N_SRV} * c - (SELECT n FROM nn)))
          FROM hl)::BIGINT AS hs,
         (SELECT sum(({_N_SRV} * c - (SELECT n FROM nn))
                     * ({_N_SRV} * c - (SELECT n FROM nn)))
          FROM ml)::BIGINT AS ms)
SELECT n AS n_users, hmax::BIGINT AS hrw_max,
       hmin::BIGINT AS hrw_min,
       round(CAST(hs AS DOUBLE) / (8.0 * n), 6) AS hrw_chi2_6,
       round(CAST(ms AS DOUBLE) / (8.0 * n), 6) AS mod_chi2_6
FROM f
"""


# ---------------------------------------------------------------------------
# Prophet inequality
# ---------------------------------------------------------------------------


def q_prophet_inequality_daily(sf_dir: str):
    """Median-threshold stopping vs the prophet max (docstring)."""
    dly = _daily_xmy(sf_dir)
    yc = [int(v) for v in dly["y"]]
    n = len(yc)
    thr = sorted(yc)[(n + 1) // 2 - 1]
    alg = yc[-1]
    stop_day = n
    for i, v in enumerate(yc):
        if v >= thr:
            alg = v
            stop_day = i + 1
            break
    opt = max(yc)
    ratio = float(alg) / float(opt)
    out = pd.DataFrame({"n_days": [n], "threshold": [thr],
                        "stop_day": [stop_day], "alg": [alg],
                        "opt": [opt],
                        "ratio6": [_round6(np.array([ratio]))[0]],
                        "half_ok": [1 if 2 * alg >= opt else 0]})
    for col in ("n_days", "threshold", "stop_day", "alg", "opt",
                "half_ok"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_PROPHET = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
srt AS (SELECT row_number() OVER (ORDER BY day) AS t, y FROM dly),
thr AS (SELECT quantile_disc(y, 0.5) AS thr,
               count(*)::BIGINT AS n, max(y)::BIGINT AS opt
        FROM srt),
stopd AS (
  SELECT coalesce(min(t), (SELECT n FROM thr)) AS sd
  FROM srt WHERE y >= (SELECT thr FROM thr)),
f AS (
  SELECT (SELECT n FROM thr) AS n, (SELECT thr FROM thr) AS thr,
         (SELECT sd FROM stopd) AS sd,
         (SELECT y FROM srt
          WHERE t = (SELECT sd FROM stopd)) AS alg,
         (SELECT opt FROM thr) AS opt)
SELECT n AS n_days, thr::BIGINT AS threshold, sd::BIGINT
         AS stop_day,
       alg::BIGINT AS alg, opt AS opt,
       round(CAST(alg AS DOUBLE) / CAST(opt AS DOUBLE), 6)
         AS ratio6,
       (CASE WHEN 2 * alg >= opt THEN 1 ELSE 0 END)::BIGINT
         AS half_ok
FROM f
"""


# ---------------------------------------------------------------------------
# Ski rental
# ---------------------------------------------------------------------------


def q_ski_rental_sessions(sf_dir: str):
    """Break-even ski rental over session lengths (docstring)."""
    ds = _pq(sf_dir, "events",
             columns=["user_id", "ts", "event_id"])

    def salt(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"u": pa.array(u),
                         "ts": t["ts"].cast(pa.int64()),
                         "e": t["event_id"],
                         "sk": pa.array(u % 64)})

    def sess(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "ts", "e"], kind="mergesort")
        u = df["u"].to_numpy(np.int64)
        ts = df["ts"].to_numpy(np.int64)
        brk = np.r_[True, (u[1:] != u[:-1])
                    | (np.diff(ts) > _GAP_US)]
        sid = np.cumsum(brk)
        g = pd.DataFrame({"sid": sid, "ts": ts}) \
            .groupby("sid", sort=False) \
            .agg(st=("ts", "min"), en=("ts", "max"))
        # inclusive seconds (+1): singleton sessions are length 1,
        # so the median buy price can never be zero
        ln = ((g["en"] - g["st"]) // 1_000_000 + 1) \
            .to_numpy(np.int64)
        h = (pd.DataFrame({"ln": ln, "n": np.int64(1)})
             .groupby("ln", sort=False).sum().reset_index())
        h["n"] = h["n"].astype(np.int64)
        return _strip(h)

    hist = (ds.map_batches(salt, batch_format="pyarrow")
              .groupby("sk").map_groups(sess,
                                        batch_format="pandas")
              .groupby("ln").aggregate(Sum("n", alias_name="n"))
              .to_pandas().sort_values("ln")
              .reset_index(drop=True))
    lv = [int(v) for v in hist["ln"]]
    nv = [int(v) for v in hist["n"]]
    n = sum(nv)
    # lower median via the histogram (rank ceil(n/2), 1-based)
    rank = (n + 1) // 2
    acc = 0
    b = lv[-1]
    for ln, cnt in zip(lv, nv):
        acc += cnt
        if acc >= rank:
            b = ln
            break
    alg = 0
    opt = 0
    for ln, cnt in zip(lv, nv):
        alg += cnt * (ln if ln < b else 2 * b)
        opt += cnt * min(ln, b)
    ratio = float(alg) / float(opt)
    out = pd.DataFrame({"n_sessions": [n], "buy_b": [b],
                        "alg_cost": [alg], "opt_cost": [opt],
                        "ratio6": [_round6(np.array([ratio]))[0]],
                        "bound_ok": [1 if alg <= 2 * opt else 0]})
    for col in ("n_sessions", "buy_b", "alg_cost", "opt_cost",
                "bound_ok"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SKI = f"""
WITH ev AS (
  SELECT user_id AS u, epoch_us(ts) AS t,
         CASE WHEN epoch_us(ts)
                   - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                   > {_GAP_US}
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events),
sid AS (
  SELECT u, t,
         sum(brk) OVER (PARTITION BY u ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS s
  FROM ev),
lens AS (
  SELECT (max(t) - min(t)) // 1000000 + 1 AS ln
  FROM sid GROUP BY u, s),
bb AS (SELECT quantile_disc(ln, 0.5) AS b,
              count(*)::BIGINT AS n
       FROM lens),
cost AS (
  SELECT sum(CASE WHEN ln < (SELECT b FROM bb) THEN ln
                  ELSE 2 * (SELECT b FROM bb) END)::BIGINT AS alg,
         sum(least(ln, (SELECT b FROM bb)))::BIGINT AS opt
  FROM lens)
SELECT (SELECT n FROM bb) AS n_sessions,
       (SELECT b FROM bb)::BIGINT AS buy_b,
       alg AS alg_cost, opt AS opt_cost,
       round(CAST(alg AS DOUBLE) / CAST(opt AS DOUBLE), 6)
         AS ratio6,
       (CASE WHEN alg <= 2 * opt THEN 1 ELSE 0 END)::BIGINT
         AS bound_ok
FROM cost
"""


QUERIES184: dict[str, tuple] = {
    "rendezvous_hashing_balance": (q_rendezvous_hashing_balance,
                                   SQL_RENDEZVOUS),
    "prophet_inequality_daily": (q_prophet_inequality_daily,
                                 SQL_PROPHET),
    "ski_rental_sessions": (q_ski_rental_sessions, SQL_SKI),
}
