"""One-hundred-eightieth oracle-query batch — irregular-sampling
spectral analysis, all-pairs min cuts, and serially-correlated
regression:

- lomb_scargle_events: the Lomb–Scargle periodogram of event VALUES
  at their irregular TIMESTAMPS (the tool for unevenly-sampled
  series — a plain DFT needs a regular grid) at four trial periods
  (6 h, 12 h, 24 h, 7 d). Two passes: the τ phase from Σsin(2ωt),
  Σcos(2ωt) (per-event terms nano-quantized to integers), then the
  centered projections Σd·cos(ω(t−τ)) quantized at 1e-6 (d ≤ 100
  dollars keeps terms under 2^52) and the cos²/sin² norms at 1e-9;
  the normalized power finalizes identically.
- gomory_hu_sources: all-pairs s–t min cuts on the 5-node source
  overlap graph (batch-179 weights) by exact enumeration of the 8
  separating subsets per pair — 10 rows (i, j, mincut), plus each
  side's canonical cut mask.
- cochrane_orcutt_daily: the Cochrane–Orcutt AR(1) correction of
  the daily-revenue-on-time OLS — stage-1 slope from exact integer
  sums, ρ from 1e-6-quantized residual lag products (dollar units
  keep e_t·e_{t−1} under 2^52), then OLS on the ρ-differenced
  series with 1e-6-quantized terms.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq, _ts_minmax_us
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries169 import _daily_xmy
from scrapy_ray.pipelines.queries179 import _overlap_graph, _SQL_GRAPH

_LS_PERIODS = (21600, 43200, 86400, 604800)


# ---------------------------------------------------------------------------
# Lomb-Scargle
# ---------------------------------------------------------------------------


def q_lomb_scargle_events(sf_dir: str):
    """Two-pass quantized Lomb-Scargle at 4 periods (docstring)."""
    dmin_us, _ = _ts_minmax_us(sf_dir, "events")
    ds = _pq(sf_dir, "events", columns=["ts", "value"])

    def pass_a(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        tsec = (us - dmin_us).astype(np.float64) / 1e6
        rows = {"p": [], "c2": [], "s2": []}
        for per in _LS_PERIODS:
            w = 2.0 * math.pi / per
            rows["p"].append(per)
            rows["c2"].append(int(np.floor(
                np.cos(2.0 * w * tsec) * 1e9 + 0.5).sum()))
            rows["s2"].append(int((np.sign(np.sin(2.0 * w * tsec))
                                   * np.floor(np.abs(
                                       np.sin(2.0 * w * tsec))
                                       * 1e9 + 0.5))
                                  .astype(np.int64).sum()))
        return pa.table({
            "p": pa.array(rows["p"], pa.int64()),
            "c2": pa.array(rows["c2"], pa.int64()),
            "s2": pa.array(rows["s2"], pa.int64()),
            "n": pa.array([t.num_rows] + [0] * 3, pa.int64()),
            "sc": pa.array([int(c.sum())] + [0] * 3, pa.int64()),
            "scc": pa.array([int((c * c).sum())] + [0] * 3,
                            pa.int64())})

    a = (ds.map_batches(pass_a, batch_format="pyarrow")
           .groupby("p").aggregate(Sum("c2", alias_name="c2"),
                                   Sum("s2", alias_name="s2"),
                                   Sum("n", alias_name="n"),
                                   Sum("sc", alias_name="sc"),
                                   Sum("scc", alias_name="scc"))
           .to_pandas().sort_values("p").reset_index(drop=True))
    n = int(a["n"].sum())
    sc = int(a["sc"].sum())
    scc = int(a["scc"].sum())
    ybar = float(sc) / float(n) / 100.0
    var = (float(n * scc - sc * sc)
           / (float(n) * float(n)) / 1e4)
    taus = {}
    for _, r in a.iterrows():
        per = int(r["p"])
        w = 2.0 * math.pi / per
        taus[per] = math.atan2(float(int(r["s2"])) / 1e9,
                               float(int(r["c2"])) / 1e9) \
            / (2.0 * w)

    def pass_b(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)) \
            .astype(np.int64)
        tsec = (us - dmin_us).astype(np.float64) / 1e6
        d = c.astype(np.float64) / 100.0 - ybar

        def q(x: np.ndarray, scale: float) -> int:
            return int((np.sign(x)
                        * np.floor(np.abs(x) * scale + 0.5))
                       .astype(np.int64).sum())

        rows = {"p": [], "ct": [], "st": [], "cc": [], "ss": []}
        for per in _LS_PERIODS:
            w = 2.0 * math.pi / per
            ang = w * (tsec - taus[per])
            co = np.cos(ang)
            si = np.sin(ang)
            rows["p"].append(per)
            rows["ct"].append(q(d * co, 1e6))
            rows["st"].append(q(d * si, 1e6))
            rows["cc"].append(q(co * co, 1e9))
            rows["ss"].append(q(si * si, 1e9))
        return pa.table({k: pa.array(vv, pa.int64())
                         for k, vv in rows.items()})

    b = (ds.map_batches(pass_b, batch_format="pyarrow")
           .groupby("p").aggregate(Sum("ct", alias_name="ct"),
                                   Sum("st", alias_name="st"),
                                   Sum("cc", alias_name="cc"),
                                   Sum("ss", alias_name="ss"))
           .to_pandas().sort_values("p").reset_index(drop=True))
    powers = []
    for _, r in b.iterrows():
        ct = float(int(r["ct"])) / 1e6
        st = float(int(r["st"])) / 1e6
        cc = float(int(r["cc"])) / 1e9
        ss = float(int(r["ss"])) / 1e9
        p_raw = 0.5 * (ct * ct / cc + st * st / ss)
        powers.append(p_raw / var)
    out = pd.DataFrame({
        "period_s": np.asarray(_LS_PERIODS, np.int64),
        "power6": _round6(np.array(powers))})
    out["period_s"] = out["period_s"].astype(np.int64)
    return out


def _ls_sql() -> str:
    rows = []
    for per in _LS_PERIODS:
        w = f"(2.0 * pi() / {per})"
        t = "(CAST(epoch_us(ts) - dmin AS DOUBLE) / 1e6)"
        rows.append(f"""
SELECT {per}::BIGINT AS p,
  sum(CAST(floor(cos(2.0 * {w} * {t}) * 1e9 + 5e-1)
           AS BIGINT))::BIGINT AS c2,
  sum(CAST(CASE WHEN sin(2.0 * {w} * {t}) >= 0
            THEN floor(abs(sin(2.0 * {w} * {t})) * 1e9 + 5e-1)
            ELSE -floor(abs(sin(2.0 * {w} * {t})) * 1e9 + 5e-1)
            END AS BIGINT))::BIGINT AS s2
FROM events, dm""")
    passa = " UNION ALL ".join(rows)
    rows_b = []
    for per in _LS_PERIODS:
        w = f"(2.0 * pi() / {per})"
        t = "(CAST(epoch_us(ts) - dmin AS DOUBLE) / 1e6)"
        tau = f"(SELECT tau FROM taus WHERE p = {per})"
        ang = f"({w} * ({t} - {tau}))"
        d = ("(CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE)"
             " / 100.0 - (SELECT ybar FROM stats))")
        qd = (lambda expr, sc:
              f"sum(CAST(CASE WHEN {expr} >= 0 "
              f"THEN floor(abs({expr}) * {sc} + 5e-1) "
              f"ELSE -floor(abs({expr}) * {sc} + 5e-1) END "
              f"AS BIGINT))::BIGINT")
        rows_b.append(f"""
SELECT {per}::BIGINT AS p,
  {qd(f'({d} * cos({ang}))', '1e6')} AS ct,
  {qd(f'({d} * sin({ang}))', '1e6')} AS st,
  {qd(f'(cos({ang}) * cos({ang}))', '1e9')} AS cc,
  {qd(f'(sin({ang}) * sin({ang}))', '1e9')} AS ss
FROM events, dm""")
    passb = " UNION ALL ".join(rows_b)
    return f"""
WITH dm AS (SELECT epoch_us(min(ts)) AS dmin FROM events),
stats AS (
  SELECT count(*)::BIGINT AS n,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sc,
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
             * CAST(round(value * 100) AS BIGINT)) AS scc,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
           / count(*) / 100.0 AS ybar
  FROM events),
pa_ AS ({passa}),
taus AS (
  SELECT p,
         atan2(CAST(s2 AS DOUBLE) / 1e9, CAST(c2 AS DOUBLE) / 1e9)
           / (2.0 * (2.0 * pi() / p)) AS tau
  FROM pa_),
pb AS ({passb}),
vr AS (
  SELECT CAST(n * scc - CAST(sc AS HUGEINT) * sc AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e4 AS var
  FROM stats)
SELECT p AS period_s,
       round((0.5 * ((CAST(ct AS DOUBLE) / 1e6)
                     * (CAST(ct AS DOUBLE) / 1e6)
                     / (CAST(cc AS DOUBLE) / 1e9)
                     + (CAST(st AS DOUBLE) / 1e6)
                       * (CAST(st AS DOUBLE) / 1e6)
                       / (CAST(ss AS DOUBLE) / 1e9)))
             / (SELECT var FROM vr), 6) AS power6
FROM pb ORDER BY p
"""


SQL_LOMB = _ls_sql()


# ---------------------------------------------------------------------------
# Gomory-Hu (all-pairs s-t min cuts)
# ---------------------------------------------------------------------------


def q_gomory_hu_sources(sf_dir: str):
    """All-pairs min cuts by separating-subset enumeration."""
    w = _overlap_graph(sf_dir)
    rows = []
    for s in range(5):
        for t in range(s + 1, 5):
            rest = [k for k in range(5) if k not in (s, t)]
            best = None
            for mask in range(8):
                side = {s} | {rest[b] for b in range(3)
                              if (mask >> b) & 1}
                cut = sum(int(w[i, j]) for i in side
                          for j in range(5) if j not in side)
                smask = sum(1 << k for k in side)
                key = (cut, smask)
                if best is None or key < best:
                    best = key
            rows.append({"i": s + 1, "j": t + 1,
                         "mincut": best[0], "cut_mask": best[1]})
    out = pd.DataFrame(rows)
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_GOMORY_HU = f"""
WITH {_SQL_GRAPH},
wmat AS (
  SELECT (SELECT list(coalesce(e.w, 0) ORDER BY a.i * 10 + b.i)
          FROM (SELECT si AS i FROM top5) a
          CROSS JOIN (SELECT si AS i FROM top5) b
          LEFT JOIN edges e ON e.i = a.i AND e.j = b.i) AS wm),
pairs AS (
  SELECT s.s, t.t,
         [x FOR x IN [1, 2, 3, 4, 5]
          IF x <> s.s AND x <> t.t] AS rn
  FROM (SELECT unnest(range(1, 6)) AS s) s,
       (SELECT unnest(range(1, 6)) AS t) t
  WHERE t.t > s.s),
cuts AS (
  SELECT p.s, p.t, m.m,
         -- side = {{s}} plus the masked subset of the other nodes
         (1 << (p.s - 1))
         | list_sum([CASE WHEN ((m.m >> (r - 1)) & 1) = 1
                     THEN 1 << (rn[r] - 1) ELSE 0 END
                     FOR r IN range(1, 4)]) AS smask
  FROM pairs p,
       (SELECT unnest(range(0, 8)) AS m) m),
vals AS (
  SELECT c.s, c.t, c.smask,
         list_sum([CASE WHEN ((c.smask >> ((z - 1) // 5)) & 1) = 1
                        AND ((c.smask >> ((z - 1) % 5)) & 1) = 0
                   THEN w.wm[z] ELSE 0 END
                   FOR z IN range(1, 26)]) AS cut
  FROM cuts c, wmat w),
best AS (
  SELECT s, t, cut, smask,
         row_number() OVER (PARTITION BY s, t
                            ORDER BY cut, smask) AS rnk
  FROM vals)
SELECT s::BIGINT AS i, t::BIGINT AS j, cut::BIGINT AS mincut,
       smask::BIGINT AS cut_mask
FROM best WHERE rnk = 1 ORDER BY i, j
"""


# ---------------------------------------------------------------------------
# Cochrane-Orcutt
# ---------------------------------------------------------------------------


def q_cochrane_orcutt_daily(sf_dir: str):
    """AR(1)-corrected daily revenue-on-time OLS (docstring)."""
    dly = _daily_xmy(sf_dir)
    yc = [int(v) for v in dly["y"]]
    n = len(yc)
    ts = list(range(1, n + 1))
    st = sum(ts)
    stt = sum(t * t for t in ts)
    sy = sum(yc)
    sty = sum(t * y for t, y in zip(ts, yc))
    b = float(n * sty - st * sy) / float(n * stt - st * st)
    aa = (float(sy) - b * float(st)) / n
    yd = [c / 100.0 for c in yc]
    bd = b / 100.0
    ad = aa / 100.0
    e = [yd[i] - ad - bd * ts[i] for i in range(n)]

    def q6(x: float) -> int:
        return int(math.copysign(math.floor(abs(x) * 1e6 + 0.5), x))

    num = sum(q6(e[i] * e[i - 1]) for i in range(1, n))
    den = sum(q6(e[i - 1] * e[i - 1]) for i in range(1, n))
    rho = float(num) / float(den)
    sx = sxx = sxy = sy2 = 0
    for i in range(1, n):
        xs_ = ts[i] - rho * ts[i - 1]
        ys_ = yd[i] - rho * yd[i - 1]
        sx += q6(xs_)
        sxx += q6(xs_ * xs_)
        sxy += q6(xs_ * ys_)
        sy2 += q6(ys_)
    m = n - 1
    fx, fxx = float(sx) / 1e6, float(sxx) / 1e6
    fxy, fy = float(sxy) / 1e6, float(sy2) / 1e6
    b_co = (m * fxy - fx * fy) / (m * fxx - fx * fx)
    a_co = (fy - b_co * fx) / m
    r6 = _round6(np.array([bd, rho, b_co, a_co]))
    out = pd.DataFrame({"n_days": [n], "b_ols6": [r6[0]],
                        "rho6": [r6[1]], "b_co6": [r6[2]],
                        "a_co6": [r6[3]]})
    out["n_days"] = out["n_days"].astype(np.int64)
    return out


SQL_COCHRANE = """
WITH dly AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
  FROM events GROUP BY 1),
srt AS (
  SELECT row_number() OVER (ORDER BY day) AS t, y FROM dly),
s1 AS (
  SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS st,
         sum(t * t)::BIGINT AS stt, sum(y)::BIGINT AS sy,
         sum(CAST(t AS HUGEINT) * y) AS sty
  FROM srt),
ols AS (
  SELECT n,
         CAST(n * sty - CAST(st AS HUGEINT) * sy AS DOUBLE)
           / CAST(n * stt - CAST(st AS HUGEINT) * st AS DOUBLE)
           AS b
  FROM s1),
ab AS (
  SELECT ols.n, ols.b,
         (CAST(s1.sy AS DOUBLE) - ols.b * CAST(s1.st AS DOUBLE))
           / ols.n AS a
  FROM ols, s1),
res AS (
  SELECT t,
         CAST(y AS DOUBLE) / 100.0
         - (SELECT a FROM ab) / 100.0
         - (SELECT b FROM ab) / 100.0 * t AS e
  FROM srt),
lagd AS (
  SELECT t, e, lag(e) OVER (ORDER BY t) AS pe FROM res),
rho0 AS (
  SELECT sum(CAST(CASE WHEN e * pe >= 0
               THEN floor(abs(e * pe) * 1e6 + 5e-1)
               ELSE -floor(abs(e * pe) * 1e6 + 5e-1) END
               AS BIGINT))::BIGINT AS num,
         sum(CAST(floor(pe * pe * 1e6 + 5e-1)
                  AS BIGINT))::BIGINT AS den
  FROM lagd WHERE pe IS NOT NULL),
rho AS (SELECT CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS r
        FROM rho0),
tr AS (
  SELECT s.t - (SELECT r FROM rho) * (s.t - 1) AS xs,
         CAST(s.y AS DOUBLE) / 100.0
         - (SELECT r FROM rho)
           * CAST(pp.y AS DOUBLE) / 100.0 AS ys
  FROM srt s JOIN srt pp ON pp.t = s.t - 1),
q AS (
  SELECT count(*)::BIGINT AS m,
         sum(CAST(CASE WHEN xs >= 0
               THEN floor(abs(xs) * 1e6 + 5e-1)
               ELSE -floor(abs(xs) * 1e6 + 5e-1) END
               AS BIGINT))::BIGINT AS sx,
         sum(CAST(CASE WHEN xs * xs >= 0
               THEN floor(abs(xs * xs) * 1e6 + 5e-1)
               ELSE -floor(abs(xs * xs) * 1e6 + 5e-1) END
               AS BIGINT))::BIGINT AS sxx,
         sum(CAST(CASE WHEN xs * ys >= 0
               THEN floor(abs(xs * ys) * 1e6 + 5e-1)
               ELSE -floor(abs(xs * ys) * 1e6 + 5e-1) END
               AS BIGINT))::BIGINT AS sxy,
         sum(CAST(CASE WHEN ys >= 0
               THEN floor(abs(ys) * 1e6 + 5e-1)
               ELSE -floor(abs(ys) * 1e6 + 5e-1) END
               AS BIGINT))::BIGINT AS sy2
  FROM tr),
f AS (
  SELECT (SELECT n FROM s1) AS n,
         (SELECT b FROM ab) / 100.0 AS bd,
         (SELECT r FROM rho) AS rho,
         (m * (CAST(sxy AS DOUBLE) / 1e6)
          - (CAST(sx AS DOUBLE) / 1e6)
            * (CAST(sy2 AS DOUBLE) / 1e6))
         / (m * (CAST(sxx AS DOUBLE) / 1e6)
            - (CAST(sx AS DOUBLE) / 1e6)
              * (CAST(sx AS DOUBLE) / 1e6)) AS b_co,
         m, sx, sy2
  FROM q)
SELECT n AS n_days, round(bd, 6) AS b_ols6, round(rho, 6) AS rho6,
       round(b_co, 6) AS b_co6,
       round((CAST(sy2 AS DOUBLE) / 1e6
              - b_co * (CAST(sx AS DOUBLE) / 1e6)) / m, 6)
         AS a_co6
FROM f
"""


QUERIES180: dict[str, tuple] = {
    "lomb_scargle_events": (q_lomb_scargle_events, SQL_LOMB),
    "gomory_hu_sources": (q_gomory_hu_sources, SQL_GOMORY_HU),
    "cochrane_orcutt_daily": (q_cochrane_orcutt_daily, SQL_COCHRANE),
}
