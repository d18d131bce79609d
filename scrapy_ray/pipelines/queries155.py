"""One-hundred-fifty-fifth oracle-query batch — bootstrap medians,
grid mutual information, and regional specialization:

- bootstrap_median_ci: the one-pass deterministic Poisson bootstrap
  (the q_bootstrap_mean_value hash device, constants replayed
  verbatim) applied to the MEDIAN of order prices: per replica the
  lower weighted median (rank (W+1)//2 over the weighted cents
  histogram) is an exact integer; reports the median / min / max of
  the 32 replicate medians as the percentile CI summary.
- mic_lite_qty_discount: a MIC-style grid scan of (quantity,
  discount) — all 16 quantile_disc-cut grids kx, ky ∈ {2..5},
  I(X;Y) per grid from exact cell counts with per-cell
  1e-9-quantized n·ln(N·n/(r·c)) terms, normalized by ln(min(k)),
  argmax by (score, kx, ky). Everything runs on the ≤ 550-cell
  (quantity, discount) value histogram, never the row stream.
- location_quotients_docs: top-5 (source, lang) location quotients
  LQ = (n_sl/n_s)/(n_l/N) among cells with n ≥ 5 — the regional-
  specialization statistic; ordering by 1e-9-quantized LQ with
  (source, lang) tiebreak.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip
from scrapy_ray.pipelines.queries20 import (_BOOT_B, _BOOT_CASE,
                                            _BOOT_CDF, _BOOT_KMAX,
                                            _BOOT_MOD, _BOOT_MULT,
                                            _BOOT_STEP)


def _r9(v: float) -> int:
    return int(math.floor(abs(v) * 1e9 + 0.5)) * (1 if v >= 0 else -1)


# ---------------------------------------------------------------------------
# Bootstrap median
# ---------------------------------------------------------------------------


def q_bootstrap_median_ci(sf_dir: str):
    """Poisson-bootstrap weighted medians of order price (docstring).

    Two-stage distributed quantile refinement: a single (b, cents)
    shuffle is ~B × distinct-cents ≈ 4.8M near-unique cells (24.8 s
    measured), so stage 1 shuffles only (b, $100-bucket) weight
    totals (~5k × 32 cells), the driver locates each replica's
    median bucket and within-bucket rank, and stage 2 re-scans ONLY
    rows in the union of target buckets (the Poisson weights are a
    pure hash — recomputed identically in both passes)."""
    ds = _pq(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    bs = np.arange(_BOOT_B, dtype=np.uint64)

    def weights(ok: np.ndarray) -> np.ndarray:
        h = ((ok % np.uint64(_BOOT_MOD))[:, None]
             * np.uint64(_BOOT_MULT)
             + (bs + np.uint64(1)) * np.uint64(_BOOT_STEP)) \
            % np.uint64(_BOOT_MOD)
        u = (h.astype(np.float64) + 0.5) / float(_BOOT_MOD)
        return np.digitize(u.ravel(), _BOOT_CDF).reshape(u.shape) \
            .astype(np.int64)

    def coarse(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        w = weights(ok)
        # bincount over (bucket, replica) codes — a pandas frame of
        # rows×32 cost ~20 s at sf0.1
        ubk, inv = np.unique(cents // 10000, return_inverse=True)
        keys = inv[:, None] * _BOOT_B + np.arange(_BOOT_B)[None, :]
        ws = np.bincount(keys.ravel(), weights=w.ravel(),
                         minlength=len(ubk) * _BOOT_B) \
            .astype(np.int64)
        bb = np.tile(np.arange(_BOOT_B, dtype=np.int64), len(ubk))
        bkk = np.repeat(ubk, _BOOT_B)
        return pa.table({"b": pa.array(bb), "bk": pa.array(bkk),
                         "w": pa.array(ws)})

    def merge_cells(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["b", "bk"], sort=False)["w"].sum() \
            .reset_index()
        g["w"] = g["w"].astype(np.int64)
        return _strip(g)

    def salt_cells(t: pa.Table) -> pa.Table:
        b = t["b"].to_numpy(zero_copy_only=False)
        bk = t["bk"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "pk", pa.array(((b * 31 + bk) % 32).astype(np.int32)))

    # a direct 160k-group Ray aggregate measured 22.5 s — salt to 32
    # coarse partitions and merge with in-partition pandas (CLAUDE
    # salted-partition rule), then finish the tiny merge driver-side
    cells = (ds.map_batches(coarse, batch_format="pyarrow",
                            batch_size=65536)
               .map_batches(salt_cells, batch_format="pyarrow")
               .groupby("pk")
               .map_groups(merge_cells, batch_format="pandas")
               .to_pandas()
               .groupby(["b", "bk"])["w"].sum().reset_index()
               .sort_values(["b", "bk"]).reset_index(drop=True))
    targets: dict[int, tuple[int, int]] = {}   # b -> (bucket, rank)
    for b, grp in cells.groupby("b"):
        bk = grp["bk"].to_numpy(np.int64)
        wv = grp["w"].to_numpy(np.int64)
        cum = np.cumsum(wv)
        rank = (int(cum[-1]) + 1) // 2
        i = int(np.searchsorted(cum, rank))
        targets[int(b)] = (int(bk[i]),
                           rank - (int(cum[i - 1]) if i else 0))
    tbks = sorted({t_[0] for t_ in targets.values()})

    def fine(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = (np.sign(p) * np.floor(np.abs(p) * 100.0 + 0.5)) \
            .astype(np.int64)
        keep = np.isin(cents // 10000, np.array(tbks, np.int64))
        ok, cents = ok[keep], cents[keep]
        if not len(ok):
            return pa.table({"b": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        w = weights(ok)
        df = pd.DataFrame({
            "b": np.tile(bs.astype(np.int64), len(cents)),
            "c": np.repeat(cents, _BOOT_B),
            "w": w.ravel()})
        df = df[df["w"] > 0]
        # keep only rows in THIS replica's target bucket
        tb = np.array([targets[int(x)][0] for x in df["b"].tolist()],
                      np.int64)
        df = df[(df["c"].to_numpy(np.int64) // 10000) == tb]
        g = df.groupby(["b", "c"], sort=False)["w"].sum() \
            .reset_index()
        g["w"] = g["w"].astype(np.int64)
        return _strip(g)

    fine_cells = (ds.map_batches(fine, batch_format="pyarrow",
                                 batch_size=65536)
                    .to_pandas()
                    .groupby(["b", "c"])["w"].sum().reset_index()
                    .sort_values(["b", "c"])
                    .reset_index(drop=True))
    meds = []
    for b, grp in fine_cells.groupby("b"):
        cv = grp["c"].to_numpy(np.int64)
        wv = grp["w"].to_numpy(np.int64)
        cum = np.cumsum(wv)
        meds.append(int(cv[np.searchsorted(cum, targets[int(b)][1])]))
    meds.sort()
    nb = len(meds)
    med_of_med = meds[(nb + 1) // 2 - 1]
    out = pd.DataFrame({"n_replicas": [nb],
                        "median_of_medians": [med_of_med],
                        "ci_lo": [meds[0]], "ci_hi": [meds[-1]]})
    for col in out.columns:
        out[col] = out[col].astype(np.int64)
    return out


SQL_BOOT_MEDIAN = f"""
WITH h0 AS (
  SELECT b,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         (((o_orderkey::UBIGINT % {_BOOT_MOD})
           * {_BOOT_MULT}::UBIGINT
           + ((b + 1) * {_BOOT_STEP})::UBIGINT) % {_BOOT_MOD})::DOUBLE
         AS h
  FROM orders CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS b)),
w AS (
  SELECT b, cents,
         CASE {_BOOT_CASE} ELSE {_BOOT_KMAX} END AS wt
  FROM (SELECT b, cents, (h + 0.5) / {_BOOT_MOD} AS u FROM h0)),
hist AS (
  SELECT b, cents, sum(wt)::BIGINT AS w
  FROM w WHERE wt > 0 GROUP BY 1, 2),
cum AS (
  SELECT b, cents, w,
         sum(w) OVER (PARTITION BY b ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cw,
         sum(w) OVER (PARTITION BY b) AS wt
  FROM hist),
med AS (
  SELECT b, min(cents) AS m
  FROM cum WHERE cw >= (wt + 1) // 2 GROUP BY b),
s AS (
  SELECT count(*)::BIGINT AS nb, list(m ORDER BY m) AS ms FROM med)
SELECT nb AS n_replicas,
       ms[(nb + 1) // 2]::BIGINT AS median_of_medians,
       ms[1]::BIGINT AS ci_lo, ms[nb]::BIGINT AS ci_hi
FROM s
"""


# ---------------------------------------------------------------------------
# MIC-lite
# ---------------------------------------------------------------------------

_MIC_KS = (2, 3, 4, 5)


def q_mic_lite_qty_discount(sf_dir: str):
    """MIC-style grid scan on (quantity, discount) (docstring)."""
    ds = _pq(sf_dir, "lineitem", columns=["l_quantity", "l_discount"])

    def hpart(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        qi = (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64)
        di = (np.sign(d) * np.floor(np.abs(d) * 100.0 + 0.5)) \
            .astype(np.int64)
        g = pd.DataFrame({"x": qi, "y": di, "n": np.int64(1)}) \
            .groupby(["x", "y"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    h = (ds.map_batches(hpart, batch_format="pyarrow")
           .groupby(["x", "y"]).aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    n_tot = int(h["n"].sum())

    def cuts(vals: np.ndarray, wts: np.ndarray, k: int) -> list[int]:
        order = np.argsort(vals)
        v, w_ = vals[order], wts[order]
        grp = pd.DataFrame({"v": v, "w": w_}).groupby("v").sum()
        vv = grp.index.to_numpy(np.int64)
        cum = np.cumsum(grp["w"].to_numpy(np.int64))
        return [int(vv[np.searchsorted(
            cum, math.ceil(float(i) / float(k) * n_tot))])
            for i in range(1, k)]

    xs = h["x"].to_numpy(np.int64)
    ys = h["y"].to_numpy(np.int64)
    ns = h["n"].to_numpy(np.int64)
    best = None
    for kx in _MIC_KS:
        cx = cuts(xs, ns, kx)
        # bin = #cuts strictly below x (cut values are data values)
        bx = np.array([sum(1 for c_ in cx if c_ < int(x_))
                       for x_ in xs], dtype=np.int64)
        for ky in _MIC_KS:
            cy = cuts(ys, ns, ky)
            by = np.array([sum(1 for c_ in cy if c_ < int(y_))
                           for y_ in ys], dtype=np.int64)
            cell = pd.DataFrame({"bx": bx, "by": by, "n": ns}) \
                .groupby(["bx", "by"])["n"].sum()
            r = cell.groupby(level=0).sum()
            c = cell.groupby(level=1).sum()
            i9 = 0
            for (bx_, by_), nij in cell.items():
                ri, cj = int(r[bx_]), int(c[by_])
                i9 += _r9(float(nij) / float(n_tot)
                          * math.log(float(n_tot) * float(nij)
                                     / (float(ri) * float(cj))))
            score9 = _r9(float(i9) / 1e9
                         / math.log(float(min(kx, ky))))
            cand = (-score9, kx, ky, i9)
            if best is None or cand < best:
                best = cand
    s9, kx, ky, i9 = -best[0], best[1], best[2], best[3]
    out = pd.DataFrame({"kx": [kx], "ky": [ky], "i_nano": [i9],
                        "mic6": [_round6(np.array([s9 / 1e9]))[0]]})
    for col in ("kx", "ky", "i_nano"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_MIC_LITE = """
WITH h AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y,
         count(*)::BIGINT AS n
  FROM lineitem GROUP BY 1, 2),
tot AS (SELECT sum(n)::BIGINT AS nt FROM h),
ks AS (SELECT unnest([2, 3, 4, 5]) AS k),
xcut AS (
  SELECT ks.k, i.i,
         (SELECT min(v) FROM (
            SELECT x AS v,
                   sum(n) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) AS cum
            FROM (SELECT x, sum(n) AS n FROM h GROUP BY x))
          WHERE cum >= ceil(CAST(i.i AS DOUBLE) / ks.k
                            * (SELECT nt FROM tot))) AS cut
  FROM ks, LATERAL (SELECT unnest(range(1, ks.k)) AS i) i),
ycut AS (
  SELECT ks.k, i.i,
         (SELECT min(v) FROM (
            SELECT y AS v,
                   sum(n) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) AS cum
            FROM (SELECT y, sum(n) AS n FROM h GROUP BY y))
          WHERE cum >= ceil(CAST(i.i AS DOUBLE) / ks.k
                            * (SELECT nt FROM tot))) AS cut
  FROM ks, LATERAL (SELECT unnest(range(1, ks.k)) AS i) i),
binned AS (
  SELECT kx.k AS kx, ky.k AS ky, h.n,
         (SELECT count(*) FROM xcut
          WHERE xcut.k = kx.k AND xcut.cut < h.x) AS bx,
         (SELECT count(*) FROM ycut
          WHERE ycut.k = ky.k AND ycut.cut < h.y) AS by_
  FROM h CROSS JOIN ks kx CROSS JOIN ks ky),
cells AS (
  SELECT kx, ky, bx, by_, sum(n)::BIGINT AS nij
  FROM binned GROUP BY 1, 2, 3, 4),
marg AS (
  SELECT c.kx, c.ky, c.bx, c.by_, c.nij,
         sum(c.nij) OVER (PARTITION BY c.kx, c.ky, c.bx) AS ri,
         sum(c.nij) OVER (PARTITION BY c.kx, c.ky, c.by_) AS cj
  FROM cells c),
mi AS (
  SELECT kx, ky,
         sum(CAST(round(CAST(nij AS DOUBLE)
                        / (SELECT nt FROM tot)
                        * ln((SELECT nt FROM tot)::DOUBLE
                             * CAST(nij AS DOUBLE)
                             / (CAST(ri AS DOUBLE)
                                * CAST(cj AS DOUBLE)))
                        * 1e9) AS BIGINT))::BIGINT AS i9
  FROM marg GROUP BY 1, 2),
sc AS (
  SELECT kx, ky, i9,
         CAST(round(CAST(i9 AS DOUBLE) / 1e9
                    / ln(CAST(least(kx, ky) AS DOUBLE)) * 1e9)
              AS BIGINT) AS s9
  FROM mi)
SELECT kx::BIGINT AS kx, ky::BIGINT AS ky, i9 AS i_nano,
       round(CAST(s9 AS DOUBLE) / 1e9, 6) AS mic6
FROM sc ORDER BY s9 DESC, kx, ky LIMIT 1
"""


# ---------------------------------------------------------------------------
# Location quotients
# ---------------------------------------------------------------------------


def q_location_quotients_docs(sf_dir: str):
    """Top-5 (source, lang) location quotients (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "lang"])

    def cpart(t: pa.Table) -> pa.Table:
        g = pd.DataFrame({"s": np.asarray(t["source"].to_pylist()),
                          "l": np.asarray(t["lang"].to_pylist()),
                          "n": np.int64(1)}) \
            .groupby(["s", "l"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["s", "l"])
               .aggregate(Sum("n", alias_name="n")).to_pandas())
    n_tot = int(cells["n"].sum())
    ns = cells.groupby("s")["n"].sum()
    nl = cells.groupby("l")["n"].sum()
    rows = []
    for _, r_ in cells.iterrows():
        n_ = int(r_["n"])
        if n_ < 5:
            continue
        lq = (float(n_) * float(n_tot)
              / (float(int(ns[r_["s"]])) * float(int(nl[r_["l"]]))))
        rows.append((str(r_["s"]), str(r_["l"]), n_, _r9(lq), lq))
    rows.sort(key=lambda t: (-t[3], t[0], t[1]))
    top = rows[:5]
    out = pd.DataFrame({
        "source": [t[0] for t in top],
        "lang": [t[1] for t in top],
        "n": [t[2] for t in top],
        "lq6": _round6(np.array([t[4] for t in top]))})
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_LOCATION_QUOTIENTS = """
WITH cells AS (
  SELECT source AS s, lang AS l, count(*)::BIGINT AS n
  FROM documents GROUP BY 1, 2),
tot AS (SELECT sum(n)::BIGINT AS nt FROM cells),
m AS (
  SELECT c.s, c.l, c.n,
         sum(c.n) OVER (PARTITION BY c.s) AS ns,
         sum(c.n) OVER (PARTITION BY c.l) AS nl
  FROM cells c),
lq AS (
  SELECT s, l, n,
         CAST(n AS DOUBLE) * (SELECT nt FROM tot)
           / (CAST(ns AS DOUBLE) * CAST(nl AS DOUBLE)) AS lq
  FROM m WHERE n >= 5)
SELECT s AS source, l AS lang, n, round(lq, 6) AS lq6
FROM (SELECT *, CAST(round(lq * 1e9) AS BIGINT) AS lq9 FROM lq)
ORDER BY lq9 DESC, s, l LIMIT 5
"""


QUERIES155: dict[str, tuple] = {
    "bootstrap_median_ci": (q_bootstrap_median_ci, SQL_BOOT_MEDIAN),
    "mic_lite_qty_discount": (q_mic_lite_qty_discount, SQL_MIC_LITE),
    "location_quotients_docs": (q_location_quotients_docs,
                                SQL_LOCATION_QUOTIENTS),
}
