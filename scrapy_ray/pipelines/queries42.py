"""Forty-second oracle-query batch — classifier evaluation / corpus
growth law / forecast-verification decomposition:

- roc_auc_purchase_value: ROC analysis of value-as-score for predicting
  purchase. 2·U comes exactly from the merged per-cent histograms (the
  MWU rank decomposition — ties get half credit, NO global sort), so
  AUC = U/(n1·n0) is one float division of exact integers; the ROC
  curve is materialized at the 9 global value-decile thresholds
  (quantile_disc rank walk) with exact TP/FP counts and
  identical-expression tpr/fpr.
- heaps_law_sources: Heaps'-law fit V ≈ K·T^β of BIGRAM vocabulary
  growth across sources — ln V on ln T OLS over the O(sources) points
  (bigrams, not unigrams: the synthetic corpus has a ~31-word lexicon,
  so every source saturates the unigram vocabulary and the fit would
  be degenerate; the bigram space doesn't saturate). Per-source bigram
  totals are exact; per-source vocabulary sizes are exact
  distinct-bigram counts (in-batch (source, bigram) dedup combiner →
  co-partitioned exact count — the grouped-COUNT-DISTINCT discipline);
  the per-point ln terms are quantized to 1e-9 units (sums stay < 2^53
  → exact back-cast) and β/ln K finalize as one identical float
  expression (zipf_slope discipline).
- brier_decomposition: Brier score with the Murphy (1973) three-way
  decomposition REL − RES + UNC over the value-decile forecast bins of
  ece_calibration (conf_b = (b+0.5)/10 vs purchase outcome). Every term
  derives from exact (bin, n, k) integer cells; the per-bin REL/RES
  contributions and per-(bin, outcome) Brier contributions are
  quantized to 1e-12 units and integer-summed (never-sum-floats), and
  the identity brier = rel − res + unc is asserted to 6dp in-query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_HL_SCALE = 10**9            # 1e-9 units for the Heaps ln terms
_BR_SCALE = 10**12           # 1e-12 units for Brier contributions
_DECILES = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# ROC / AUC
# ---------------------------------------------------------------------------


def _purchase_cells(sf_dir: str) -> pd.DataFrame:
    """(cent, n_pos, n_neg) exact cells for value-vs-purchase queries."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        y = (np.asarray(t["event_type"].to_pylist(), dtype=object)
             == "purchase").astype(np.int64)
        df = pd.DataFrame({"c": c, "pos": y, "neg": 1 - y})
        g = df.groupby("c", sort=False)[["pos", "neg"]].sum().reset_index()
        for col in ("pos", "neg"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("c")
              .aggregate(Sum("pos", alias_name="pos"),
                         Sum("neg", alias_name="neg"))
              .to_pandas().sort_values("c").reset_index(drop=True))


def q_roc_auc_purchase_value(sf_dir: str):
    """ROC points at value deciles + exact-integer AUC (docstring
    above)."""
    cells = _purchase_cells(sf_dir)
    cp = cells["pos"].to_numpy(np.int64)
    cn = cells["neg"].to_numpy(np.int64)
    cv = cells["c"].to_numpy(np.int64)
    n1, n0 = int(cp.sum()), int(cn.sum())
    cum_n_below = np.concatenate([[0], np.cumsum(cn[:-1])])
    u2 = int((cp * (2 * cum_n_below + cn)).sum())
    auc6 = _round6(np.array(
        [float(u2) / (2.0 * (float(n1) * float(n0)))]))[0]
    # decile thresholds over ALL values (rank walk), exact TP/FP above
    tot = cp + cn
    cum = np.cumsum(tot)
    n = n1 + n0
    edges = np.array(
        [cv[np.searchsorted(cum, int(np.ceil(q * n)), side="left")]
         for q in _DECILES], np.int64)
    cum_p = np.cumsum(cp)
    cum_a = cum
    rows = []
    for i, e in enumerate(edges):
        j = int(np.searchsorted(cv, int(e), side="right")) - 1
        pos_le = int(cum_p[j]) if j >= 0 else 0
        all_le = int(cum_a[j]) if j >= 0 else 0
        tp = n1 - pos_le
        fp = n0 - (all_le - pos_le)
        rows.append((int(i + 1), int(e), tp, fp))
    out = pd.DataFrame(rows, columns=["decile", "edge_c", "tp", "fp"])
    out["tpr6"] = _round6(out["tp"].to_numpy(np.float64) / float(n1))
    out["fpr6"] = _round6(out["fp"].to_numpy(np.float64) / float(n0))
    for col in ("decile", "edge_c", "tp", "fp"):
        out[col] = out[col].astype(np.int64)
    out["n_pos"] = np.int64(n1)
    out["n_neg"] = np.int64(n0)
    out["u2"] = np.int64(u2)
    out["auc6"] = auc6
    return out


def _roc_sql() -> str:
    qs = ", ".join(f"quantile_disc(c, {q:.1f}) AS e{i}"
                   for i, q in enumerate(_DECILES))
    sel = " UNION ALL ".join(
        f"SELECT {i + 1} AS decile, e{i} AS edge_c FROM e"
        for i in range(len(_DECILES)))
    return f"""
WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
h AS (
  SELECT c, sum(y)::BIGINT AS cp, sum(1 - y)::BIGINT AS cn
  FROM v GROUP BY 1),
w AS (
  SELECT c, cp, cn,
         coalesce(sum(cn) OVER (ORDER BY c
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_n_below
  FROM h),
s AS (
  SELECT sum(cp * (2 * cum_n_below + cn))::BIGINT AS u2,
         sum(cp)::BIGINT AS n1, sum(cn)::BIGINT AS n0
  FROM w),
e AS (SELECT {qs} FROM v),
d AS ({sel}),
roc AS (
  SELECT d.decile, d.edge_c,
         (SELECT s.n1 - coalesce(sum(h.cp), 0)
          FROM h WHERE h.c <= d.edge_c)::BIGINT AS tp,
         (SELECT s.n0 - coalesce(sum(h.cn), 0)
          FROM h WHERE h.c <= d.edge_c)::BIGINT AS fp
  FROM d, s)
SELECT roc.decile, roc.edge_c, roc.tp, roc.fp,
       round(CAST(roc.tp AS DOUBLE) / CAST(s.n1 AS DOUBLE), 6) AS tpr6,
       round(CAST(roc.fp AS DOUBLE) / CAST(s.n0 AS DOUBLE), 6) AS fpr6,
       s.n1 AS n_pos, s.n0 AS n_neg, s.u2,
       round(CAST(s.u2 AS DOUBLE)
             / (2.0 * (CAST(s.n1 AS DOUBLE) * CAST(s.n0 AS DOUBLE))), 6)
         AS auc6
FROM roc, s
ORDER BY roc.decile
"""


SQL_ROC = _roc_sql()


# ---------------------------------------------------------------------------
# Heaps' law
# ---------------------------------------------------------------------------


def q_heaps_law_sources(sf_dir: str):
    """Heaps'-law ln-ln OLS across sources (docstring above)."""
    ds = _pq(sf_dir, "documents", columns=["source", "text"])

    def wpart(t: pa.Table) -> pa.Table:
        src_l: list[str] = []
        tok_l: list[str] = []
        for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            ts = txt.split()
            if len(ts) < 2:
                continue
            src_l.extend([s] * (len(ts) - 1))
            tok_l.extend(a + " " + b for a, b in zip(ts[:-1], ts[1:]))
        if not tok_l:
            return pa.table({"source": pa.array([], pa.string()),
                             "w": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({"source": src_l, "w": tok_l,
                           "n": np.int64(1)})
        g = df.groupby(["source", "w"], sort=False).sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(wpart, batch_format="pyarrow")
               .groupby(["source", "w"])
               .aggregate(Sum("n", alias_name="n")))

    def spart(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": t["source"].to_pylist(),
                           "toks": t["n"].to_numpy(zero_copy_only=False)
                           .astype(np.int64),
                           "vocab": np.int64(1)})
        g = df.groupby("source", sort=False).sum().reset_index()
        for col in ("toks", "vocab"):
            g[col] = g[col].astype(np.int64)
        return _strip(g)

    sv = (cells.map_batches(spart, batch_format="pyarrow")
               .groupby("source")
               .aggregate(Sum("toks", alias_name="toks"),
                          Sum("vocab", alias_name="vocab"))
               .to_pandas().sort_values("source").reset_index(drop=True))
    tt = sv["toks"].to_numpy(np.int64)
    vv = sv["vocab"].to_numpy(np.int64)
    lx = np.log(tt.astype(np.float64))
    ly = np.log(vv.astype(np.float64))
    scale = np.float64(_HL_SCALE)
    x_u = np.floor(lx * scale + 0.5).astype(np.int64)
    y_u = np.floor(ly * scale + 0.5).astype(np.int64)
    xy_u = np.floor(lx * ly * scale + 0.5).astype(np.int64)
    xx_u = np.floor(lx * lx * scale + 0.5).astype(np.int64)
    kk = int(len(sv))
    sx = float(int(x_u.sum())) / float(_HL_SCALE)
    sy = float(int(y_u.sum())) / float(_HL_SCALE)
    sxy = float(int(xy_u.sum())) / float(_HL_SCALE)
    sxx = float(int(xx_u.sum())) / float(_HL_SCALE)
    beta = (float(kk) * sxy - sx * sy) / (float(kk) * sxx - sx * sx)
    lnk = (sy - beta * sx) / float(kk)
    r6 = _round6(np.array([beta, lnk]))
    out = pd.DataFrame({"source": sv["source"], "toks": tt, "vocab": vv,
                        "x_units": x_u, "y_units": y_u})
    out["beta6"] = r6[0]
    out["lnk6"] = r6[1]
    return out


SQL_HEAPS = f"""
WITH toks AS (
  SELECT source, regexp_extract_all(text, '\\S+') AS ts FROM documents),
bg AS (
  SELECT source, ts[i] || ' ' || ts[i + 1] AS w
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts))) AS i) r(i)
  WHERE len(ts) >= 2),
sv AS (
  SELECT source, count(*)::BIGINT AS toks,
         count(DISTINCT w)::BIGINT AS vocab
  FROM bg GROUP BY 1),
u AS (
  SELECT source, toks, vocab,
         CAST(round(ln(CAST(toks AS DOUBLE)) * {_HL_SCALE})
              AS BIGINT) AS x_units,
         CAST(round(ln(CAST(vocab AS DOUBLE)) * {_HL_SCALE})
              AS BIGINT) AS y_units,
         CAST(round(ln(CAST(toks AS DOUBLE)) * ln(CAST(vocab AS DOUBLE))
                    * {_HL_SCALE}) AS BIGINT) AS xy_units,
         CAST(round(ln(CAST(toks AS DOUBLE)) * ln(CAST(toks AS DOUBLE))
                    * {_HL_SCALE}) AS BIGINT) AS xx_units
  FROM sv),
s AS (
  SELECT count(*)::BIGINT AS kk,
         CAST(sum(x_units) AS DOUBLE) / {_HL_SCALE}.0 AS sx,
         CAST(sum(y_units) AS DOUBLE) / {_HL_SCALE}.0 AS sy,
         CAST(sum(xy_units) AS DOUBLE) / {_HL_SCALE}.0 AS sxy,
         CAST(sum(xx_units) AS DOUBLE) / {_HL_SCALE}.0 AS sxx
  FROM u),
f AS (
  SELECT kk, sx, sy,
         (CAST(kk AS DOUBLE) * sxy - sx * sy)
           / (CAST(kk AS DOUBLE) * sxx - sx * sx) AS beta
  FROM s),
f2 AS (
  SELECT round(beta, 6) AS beta6,
         round((sy - beta * sx) / CAST(kk AS DOUBLE), 6) AS lnk6
  FROM f)
SELECT u.source, u.toks, u.vocab, u.x_units, u.y_units,
       f2.beta6, f2.lnk6
FROM u CROSS JOIN f2
ORDER BY u.source
"""


# ---------------------------------------------------------------------------
# Brier decomposition
# ---------------------------------------------------------------------------


def q_brier_decomposition(sf_dir: str):
    """Brier score + Murphy decomposition over value-decile forecast
    bins (docstring above)."""
    cells = _purchase_cells(sf_dir)
    cv = cells["c"].to_numpy(np.int64)
    cp = cells["pos"].to_numpy(np.int64)
    tot = (cells["pos"] + cells["neg"]).to_numpy(np.int64)
    n = int(tot.sum())
    cum = np.cumsum(tot)
    edges = np.array(
        [cv[np.searchsorted(cum, int(np.ceil(q * n)), side="left")]
         for q in _DECILES], np.int64)
    b = (cv[:, None] > edges[None, :]).sum(1)
    nb = np.zeros(10, np.int64)
    kb = np.zeros(10, np.int64)
    np.add.at(nb, b, tot)
    np.add.at(kb, b, cp)
    k_tot = int(kb.sum())
    nf = float(n)
    bins = np.arange(10, dtype=np.int64)
    conf = (bins.astype(np.float64) + 0.5) / 10.0
    acc = kb.astype(np.float64) / nb.astype(np.float64)
    ybar = float(k_tot) / nf
    scale = np.float64(_BR_SCALE)
    # Brier: per (bin, outcome) contributions n·(conf−y)²/N
    br = ((kb.astype(np.float64) * ((conf - 1.0) * (conf - 1.0))
           + (nb - kb).astype(np.float64) * (conf * conf)) / nf)
    br_u = np.floor(br * scale + 0.5).astype(np.int64)
    rel = (nb.astype(np.float64) * ((conf - acc) * (conf - acc))) / nf
    rel_u = np.floor(rel * scale + 0.5).astype(np.int64)
    res = (nb.astype(np.float64) * ((acc - ybar) * (acc - ybar))) / nf
    res_u = np.floor(res * scale + 0.5).astype(np.int64)
    unc = ybar * (1.0 - ybar)
    brier = float(int(br_u.sum())) / float(_BR_SCALE)
    relv = float(int(rel_u.sum())) / float(_BR_SCALE)
    resv = float(int(res_u.sum())) / float(_BR_SCALE)
    r6 = _round6(np.array([brier, relv, resv, unc,
                           relv - resv + unc]))
    assert abs(r6[0] - r6[4]) < 2e-6, \
        f"Murphy identity violated: {r6[0]} vs {r6[4]}"
    out = pd.DataFrame({"bin": bins, "n": nb, "k": kb,
                        "brier_units": br_u, "rel_units": rel_u,
                        "res_units": res_u})
    out["brier6"] = r6[0]
    out["rel6"] = r6[1]
    out["res6"] = r6[2]
    out["unc6"] = _round6(np.array([unc]))[0]
    return out


def _brier_sql() -> str:
    qs = ", ".join(f"quantile_disc(c, {q:.1f}) AS e{i}"
                   for i, q in enumerate(_DECILES))
    gt = " + ".join(f"(CASE WHEN c > e{i} THEN 1 ELSE 0 END)"
                    for i in range(9))
    return f"""
WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
e AS (SELECT {qs} FROM v),
bb AS (
  SELECT ({gt})::BIGINT AS bin, count(*)::BIGINT AS n,
         sum(y)::BIGINT AS k
  FROM v, e GROUP BY 1),
t AS (SELECT sum(n)::BIGINT AS nt, sum(k)::BIGINT AS kt FROM bb),
c AS (
  SELECT bin, n, k,
         (CAST(bin AS DOUBLE) + 0.5) / 10.0 AS conf,
         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS acc,
         CAST(kt AS DOUBLE) / CAST(nt AS DOUBLE) AS ybar,
         CAST(nt AS DOUBLE) AS nf
  FROM bb, t),
u AS (
  SELECT bin, n, k,
         CAST(round((CAST(k AS DOUBLE) * ((conf - 1.0) * (conf - 1.0))
                     + CAST(n - k AS DOUBLE) * (conf * conf)) / nf
                    * {_BR_SCALE}) AS BIGINT) AS brier_units,
         CAST(round(CAST(n AS DOUBLE) * ((conf - acc) * (conf - acc))
                    / nf * {_BR_SCALE}) AS BIGINT) AS rel_units,
         CAST(round(CAST(n AS DOUBLE) * ((acc - ybar) * (acc - ybar))
                    / nf * {_BR_SCALE}) AS BIGINT) AS res_units,
         ybar
  FROM c),
f AS (
  SELECT round(CAST(sum(brier_units) AS DOUBLE) / {_BR_SCALE}.0, 6)
           AS brier6,
         round(CAST(sum(rel_units) AS DOUBLE) / {_BR_SCALE}.0, 6)
           AS rel6,
         round(CAST(sum(res_units) AS DOUBLE) / {_BR_SCALE}.0, 6)
           AS res6,
         round(any_value(ybar) * (1.0 - any_value(ybar)), 6) AS unc6
  FROM u)
SELECT u.bin, u.n, u.k, u.brier_units, u.rel_units, u.res_units,
       f.brier6, f.rel6, f.res6, f.unc6
FROM u CROSS JOIN f
ORDER BY u.bin
"""


SQL_BRIER = _brier_sql()


QUERIES42: dict[str, tuple] = {
    "roc_auc_purchase_value": (q_roc_auc_purchase_value, SQL_ROC),
    "heaps_law_sources": (q_heaps_law_sources, SQL_HEAPS),
    "brier_decomposition": (q_brier_decomposition, SQL_BRIER),
}
