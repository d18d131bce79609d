"""One-hundred-twenty-fourth oracle-query batch — survival concordance
and absorbing-chain analytics over the events table:

- harrell_c_gaps: Harrell's concordance index for time-to-first-
  purchase (from each user's first event; censored at the corpus
  horizon), risk score = the user's click count, over the
  user_id % 10 = 0 cohort (keeps the oracle's pair join quadratic in
  a 10%-cohort only; the Ray side is O(n log n) via a descending-time
  risk histogram, no pair materialization). Comparable pairs are
  T_i < T_j with subject i an event; C = (2·conc + ties)/(2·pairs)
  — all exact integers until the one final division.
- markov_absorption_times: the empirical event-type chain with
  {click, signup, view} transient and {purchase, error} absorbing.
  Expected steps to absorption t = A⁻¹·n and absorption
  probabilities b = A⁻¹·r (A = diag(n_i) − C_tt) are solved by
  Cramer's rule on EXACT integer 3×3 determinants — one float
  division per output cell; b_purchase + b_error = 1 is an exact
  invariant of the construction.
- cuminc_competing_events: Aalen-Johansen cumulative incidence of
  first-purchase vs first-error (whichever comes first after the
  user's first event; ties break to purchase). The overall-survival
  prefix product reuses the KM quantized-ln-units device
  (queries26); each CIF increment S(t−)·d_k/n is 1e-9-quantized so
  the running CIF sums are exact integer cumsums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy_ray.pipelines.queries import _pq, _ts_minmax_us
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries26 import _KM_FLOOR, _KM_SCALE, _PARTS
from scrapy_ray.pipelines.queries47 import _strip, _US_PER_DAY

_TRANS = ["click", "signup", "view"]          # transient, alphabetical
_ABS = ["purchase", "error"]


# ---------------------------------------------------------------------------
# Harrell's C
# ---------------------------------------------------------------------------


def _user_survival(sf_dir: str, decimate: int | None) -> pd.DataFrame:
    """Per-user (first-event us, first-purchase us, first-error us,
    click count) via salted user partitions."""
    ds = _pq(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "event_type"])

    def upart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": t["ts"].cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "et": np.asarray(t["event_type"].to_pylist())})
        if decimate is not None:
            df = df[df["user_id"] % decimate == 0]
        big = np.int64(2 ** 62)
        df = df.assign(
            tp=np.where(df["et"] == "purchase", df["ts_us"], big),
            te=np.where(df["et"] == "error", df["ts_us"], big),
            r=(df["et"] == "click").astype(np.int64))
        g = df.groupby("user_id", sort=False).agg(
            t0=("ts_us", "min"), tp=("tp", "min"), te=("te", "min"),
            r=("r", "sum")).reset_index()
        g["gkey"] = (g["user_id"] % _PARTS).astype(np.int32)
        for col in ("t0", "tp", "te", "r"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    def ufin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False).agg(
            t0=("t0", "min"), tp=("tp", "min"), te=("te", "min"),
            r=("r", "sum")).reset_index()
        return g

    return (ds.map_batches(upart, batch_format="pyarrow")
              .groupby("gkey").map_groups(ufin, batch_format="pandas")
              .to_pandas())


def q_harrell_c_gaps(sf_dir: str):
    """Harrell's C for time-to-purchase vs click-count risk score."""
    mx_us = _ts_minmax_us(sf_dir, "events")[1]
    u = _user_survival(sf_dir, decimate=10)
    big = np.int64(2 ** 62)
    tp = u["tp"].to_numpy(np.int64)
    t0 = u["t0"].to_numpy(np.int64)
    d = (tp != big).astype(np.int64)
    tt = np.where(d == 1, (tp - t0) // _US_PER_DAY,
                  (mx_us - t0) // _US_PER_DAY)
    r = u["r"].to_numpy(np.int64)
    # descending-time sweep with a risk-value histogram: hist holds all
    # users with strictly larger T
    order = np.argsort(tt, kind="mergesort")
    tt_s, d_s, r_s = tt[order], d[order], r[order]
    maxr = int(r.max()) if len(r) else 0
    hist = np.zeros(maxr + 1, np.int64)
    conc = ties = m = 0
    i = len(tt_s)
    while i > 0:
        j = i
        while j > 0 and tt_s[j - 1] == tt_s[i - 1]:
            j -= 1
        tot = int(hist.sum())
        if tot:
            rs = r_s[j:i][d_s[j:i] == 1]
            if len(rs):
                cum = np.concatenate(([0], np.cumsum(hist)))
                conc += int(cum[rs].sum())
                ties += int(hist[rs].sum())
                m += len(rs) * tot
        np.add.at(hist, r_s[j:i], 1)
        i = j
    c6 = _round6(np.array([float(2 * conc + ties) / float(2 * m)]))[0]
    out = pd.DataFrame({"n_users": [len(u)], "n_pairs": [m],
                        "conc": [conc], "ties": [ties], "c6": [c6]})
    for col in ("n_users", "n_pairs", "conc", "ties"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_HARRELL_C = f"""
WITH mx AS (SELECT max(ts) AS m FROM events),
b AS (
  SELECT user_id, min(ts) AS t0,
         min(ts) FILTER (WHERE event_type = 'purchase') AS tp,
         count(*) FILTER (WHERE event_type = 'click')::BIGINT AS r
  FROM events WHERE user_id % 10 = 0 GROUP BY 1),
u AS (
  SELECT user_id, r,
         CASE WHEN tp IS NOT NULL
              THEN (epoch_us(tp) - epoch_us(t0)) // {_US_PER_DAY}
              ELSE (epoch_us((SELECT m FROM mx)) - epoch_us(t0))
                   // {_US_PER_DAY} END AS tt,
         (tp IS NOT NULL)::INT AS d
  FROM b),
p AS (
  SELECT sum((a.r > b2.r)::INT)::BIGINT AS conc,
         sum((a.r = b2.r)::INT)::BIGINT AS ties,
         count(*)::BIGINT AS m
  FROM u a JOIN u b2 ON a.tt < b2.tt WHERE a.d = 1)
SELECT (SELECT count(*) FROM u)::BIGINT AS n_users, m AS n_pairs,
       conc, ties,
       round(CAST(2 * conc + ties AS DOUBLE)
             / CAST(2 * m AS DOUBLE), 6) AS c6
FROM p
"""


# ---------------------------------------------------------------------------
# Absorbing Markov chain
# ---------------------------------------------------------------------------


def _det3(m) -> object:
    """Exact 3x3 determinant (works on ints and on SQL strings via the
    string builder below)."""
    return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))


def _det3_sql(m: list[list[str]]) -> str:
    def mul2(a, b, c, d):
        return f"({a} * {b} - {c} * {d})"
    return (f"({m[0][0]} * {mul2(m[1][1], m[2][2], m[1][2], m[2][1])}"
            f" - {m[0][1]} * {mul2(m[1][0], m[2][2], m[1][2], m[2][0])}"
            f" + {m[0][2]} * {mul2(m[1][0], m[2][1], m[1][1], m[2][0])})")


def _replace_col(a, k, v):
    return [[v[i] if j == k else a[i][j] for j in range(3)]
            for i in range(3)]


def q_markov_absorption_times(sf_dir: str):
    """Expected steps + absorption split of the event-type chain."""
    ds = _pq(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "event_type"])
    all_states = _TRANS + _ABS

    def tpart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts_us": t["ts"].cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "eid": t["event_id"].to_numpy(zero_copy_only=False),
            "et": np.asarray(t["event_type"].to_pylist())})
        df["gkey"] = (df["user_id"] % _PARTS).astype(np.int32)
        return _strip(df)

    def tcount(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "eid"],
                            kind="mergesort")
        u = df["user_id"].to_numpy()
        et = df["et"].to_numpy()
        same = u[1:] == u[:-1]
        frm, to = et[:-1][same], et[1:][same]
        row = {}
        for f in _TRANS:
            mf = frm == f
            for tn in all_states:
                row[f"c_{f}_{tn}"] = np.int64((mf & (to == tn)).sum())
        return pd.DataFrame([row])

    parts = (ds.map_batches(tpart, batch_format="pyarrow")
               .groupby("gkey").map_groups(tcount, batch_format="pandas")
               .to_pandas())
    c = {k: int(parts[k].sum()) for k in parts.columns}
    n = {f: sum(c[f"c_{f}_{tn}"] for tn in all_states) for f in _TRANS}
    a = [[(n[f] if f == g else 0) - c[f"c_{f}_{g}"] for g in _TRANS]
         for f in _TRANS]
    det = _det3(a)
    nvec = [n[f] for f in _TRANS]
    rp = [c[f"c_{f}_purchase"] for f in _TRANS]
    re = [c[f"c_{f}_error"] for f in _TRANS]
    rows = []
    for i, f in enumerate(_TRANS):
        steps = float(_det3(_replace_col(a, i, nvec))) / float(det)
        pp = float(_det3(_replace_col(a, i, rp))) / float(det)
        pe = float(_det3(_replace_col(a, i, re))) / float(det)
        rows.append((f, n[f], _round6(np.array([steps]))[0],
                     _round6(np.array([pp]))[0],
                     _round6(np.array([pe]))[0]))
    out = pd.DataFrame(rows, columns=["state", "n_out", "steps6",
                                      "p_purchase6", "p_error6"])
    out["n_out"] = out["n_out"].astype(np.int64)
    return out


def _markov_sql() -> str:
    all_states = _TRANS + _ABS
    cnt = []
    for f in _TRANS:
        for tn in all_states:
            cnt.append(f"sum((f = '{f}' AND t = '{tn}')::INT)::BIGINT"
                       f" AS c_{f}_{tn}")
    nexp = {f: "(" + " + ".join(f"c_{f}_{tn}" for tn in all_states) + ")"
            for f in _TRANS}
    a = [[(f"({nexp[f]} - c_{f}_{g})" if f == g else f"(0 - c_{f}_{g})")
          for g in _TRANS] for f in _TRANS]
    ah = [[f"CAST({e} AS HUGEINT)" for e in row] for row in a]
    det = _det3_sql(ah)
    nvec = [f"CAST({nexp[f]} AS HUGEINT)" for f in _TRANS]
    rp = [f"CAST(c_{f}_purchase AS HUGEINT)" for f in _TRANS]
    re = [f"CAST(c_{f}_error AS HUGEINT)" for f in _TRANS]
    sel = []
    for i, f in enumerate(_TRANS):
        st = _det3_sql(_replace_col(ah, i, nvec))
        pp = _det3_sql(_replace_col(ah, i, rp))
        pe = _det3_sql(_replace_col(ah, i, re))
        sel.append(f"""
  SELECT '{f}' AS state, {nexp[f]}::BIGINT AS n_out,
         round(CAST({st} AS DOUBLE) / CAST({det} AS DOUBLE), 6)
           AS steps6,
         round(CAST({pp} AS DOUBLE) / CAST({det} AS DOUBLE), 6)
           AS p_purchase6,
         round(CAST({pe} AS DOUBLE) / CAST({det} AS DOUBLE), 6)
           AS p_error6
  FROM cc""")
    return f"""
WITH seq AS (
  SELECT event_type AS f,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS t
  FROM events),
cc AS (SELECT {", ".join(cnt)} FROM seq WHERE t IS NOT NULL)
{" UNION ALL ".join(sel)}
ORDER BY state
"""


SQL_MARKOV_ABSORPTION = _markov_sql()


# ---------------------------------------------------------------------------
# Competing-risk cumulative incidence (Aalen-Johansen)
# ---------------------------------------------------------------------------


def q_cuminc_competing_events(sf_dir: str):
    """Aalen-Johansen CIF of first purchase vs first error."""
    mx_us = _ts_minmax_us(sf_dir, "events")[1]
    u = _user_survival(sf_dir, decimate=None)
    big = np.int64(2 ** 62)
    t0 = u["t0"].to_numpy(np.int64)
    tp = u["tp"].to_numpy(np.int64)
    te = u["te"].to_numpy(np.int64)
    cause1 = (tp != big) & (tp <= te)
    cause2 = (te != big) & (te < tp)
    tt = np.where(cause1, (tp - t0) // _US_PER_DAY,
                  np.where(cause2, (te - t0) // _US_PER_DAY,
                           (mx_us - t0) // _US_PER_DAY))
    h = pd.DataFrame({"gap": tt, "d1": cause1.astype(np.int64),
                      "d2": cause2.astype(np.int64),
                      "cnt": np.int64(1)}) \
        .groupby("gap").sum().reset_index().sort_values("gap")
    cnt = h["cnt"].to_numpy(np.int64)
    d1 = h["d1"].to_numpy(np.int64)
    d2 = h["d2"].to_numpy(np.int64)
    total = int(cnt.sum())
    below = np.concatenate(([0], np.cumsum(cnt[:-1])))
    n_risk = total - below
    d = d1 + d2
    ev = d > 0
    gap_e, d1e, d2e, de, ne = (h["gap"].to_numpy(np.int64)[ev], d1[ev],
                               d2[ev], d[ev], n_risk[ev])
    frac = 1.0 - de.astype(np.float64) / ne.astype(np.float64)
    with np.errstate(divide="ignore"):
        lx = np.log(frac) * _KM_SCALE
    units = np.where(de == ne, float(_KM_FLOOR),
                     np.where(lx >= 0, np.floor(lx + 0.5),
                              np.ceil(lx - 0.5))).astype(np.int64)
    cum_before = np.concatenate(([0], np.cumsum(units)[:-1]))
    s_prev = np.exp(cum_before / float(_KM_SCALE))
    t1 = s_prev * (d1e.astype(np.float64) / ne.astype(np.float64)) \
        * 1000000000.0
    t2 = s_prev * (d2e.astype(np.float64) / ne.astype(np.float64)) \
        * 1000000000.0
    q1 = np.where(t1 >= 0, np.floor(t1 + 0.5),
                  np.ceil(t1 - 0.5)).astype(np.int64)
    q2 = np.where(t2 >= 0, np.floor(t2 + 0.5),
                  np.ceil(t2 - 0.5)).astype(np.int64)
    cif1 = _round6(np.cumsum(q1) / 1000000000.0)
    cif2 = _round6(np.cumsum(q2) / 1000000000.0)
    out = pd.DataFrame({"t_d": gap_e, "d_purchase": d1e,
                        "d_error": d2e, "n_risk": ne,
                        "cif_p6": cif1, "cif_e6": cif2})
    for col in ("t_d", "d_purchase", "d_error", "n_risk"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_CUMINC = f"""
WITH mx AS (SELECT max(ts) AS m FROM events),
b AS (
  SELECT user_id, min(ts) AS t0,
         min(ts) FILTER (WHERE event_type = 'purchase') AS tp,
         min(ts) FILTER (WHERE event_type = 'error') AS te
  FROM events GROUP BY 1),
u AS (
  SELECT
    CASE
      WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
        THEN (epoch_us(tp) - epoch_us(t0)) // {_US_PER_DAY}
      WHEN te IS NOT NULL AND (tp IS NULL OR te < tp)
        THEN (epoch_us(te) - epoch_us(t0)) // {_US_PER_DAY}
      ELSE (epoch_us((SELECT m FROM mx)) - epoch_us(t0))
           // {_US_PER_DAY} END AS gap,
    (tp IS NOT NULL AND (te IS NULL OR tp <= te))::INT AS d1,
    (te IS NOT NULL AND (tp IS NULL OR te < tp))::INT AS d2
  FROM b),
h AS (
  SELECT gap, sum(d1)::BIGINT AS d1, sum(d2)::BIGINT AS d2,
         count(*)::BIGINT AS cnt
  FROM u GROUP BY 1),
r AS (
  SELECT gap, d1, d2, cnt,
         (SELECT sum(cnt) FROM h)
           - (sum(cnt) OVER (ORDER BY gap) - cnt) AS n_risk
  FROM h),
e AS (
  SELECT gap, d1, d2, (d1 + d2) AS d, n_risk::BIGINT AS n_risk,
         CASE WHEN d1 + d2 = n_risk THEN {_KM_FLOOR}
              ELSE CAST(round(ln(1.0 - (d1 + d2)::DOUBLE / n_risk)
                              * {_KM_SCALE}) AS BIGINT) END AS units
  FROM r WHERE d1 + d2 > 0),
s AS (
  SELECT gap, d1, d2, n_risk,
         exp(coalesce(sum(units) OVER (ORDER BY gap
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / {_KM_SCALE}.0) AS s_prev
  FROM e),
q AS (
  SELECT gap, d1, d2, n_risk,
         CAST(round(s_prev * (d1::DOUBLE / n_risk) * 1000000000.0)
              AS BIGINT) AS q1,
         CAST(round(s_prev * (d2::DOUBLE / n_risk) * 1000000000.0)
              AS BIGINT) AS q2
  FROM s)
SELECT gap AS t_d, d1 AS d_purchase, d2 AS d_error, n_risk,
       round(sum(q1) OVER (ORDER BY gap) / 1000000000.0, 6) AS cif_p6,
       round(sum(q2) OVER (ORDER BY gap) / 1000000000.0, 6) AS cif_e6
FROM q ORDER BY t_d
"""


QUERIES124: dict[str, tuple] = {
    "harrell_c_gaps": (q_harrell_c_gaps, SQL_HARRELL_C),
    "markov_absorption_times": (q_markov_absorption_times,
                                SQL_MARKOV_ABSORPTION),
    "cuminc_competing_events": (q_cuminc_competing_events, SQL_CUMINC),
}
