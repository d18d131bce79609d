"""Twenty-ninth oracle-query batch — hypothesis testing / ML classification
/ data-quality auditing:

- ks_test_click_view: two-sample Kolmogorov–Smirnov statistic between the
  ``value`` distributions of click vs view events. No row ever gets a
  rank: both ECDFs come from ONE merged per-cent histogram (the
  mannwhitney precedent), and D = max|F1 − F2| is carried as the EXACT
  integer numerator max|c1·n2 − c2·n1| over the merged support — the
  float division happens once, at finalize, identical-expression both
  sides. The cell shuffle is bounded by the distinct-cent domain, not by
  row count; c·n products stay inside int64 up to ~3e9 rows per side.
- naive_bayes_lang: multinomial Naive Bayes trained and evaluated over the
  documents table (predict ``lang`` from whitespace tokens) — the classic
  counts-based text classifier as a distributed pipeline. The vocabulary
  is restricted to the EXACT top-K tokens by (count desc, token asc)
  (per-block partial top-K over the already-aggregated disjoint cells —
  the pmi precedent) with every other token mapped to a single OOV
  bucket, so the broadcast model is O(K × langs) REGARDLESS of corpus
  size. Laplace-smoothed log-likelihoods ln((c+1)/(t+V)) and log-priors
  are quantized to 1e-12 integer units (the js_divergence precedent), so
  every document score is an exact int64 sum — summation order and float
  associativity cannot flip an argmax; ties break lang-ascending on both
  sides. Output is the confusion matrix (true_lang, pred_lang, n).
- dq_expectations: a Great-Expectations-style data-quality audit — seven
  checks across four tables (FK integrity orders→customer, key
  uniqueness, numeric range, positivity, doc n_chars↔len(text)
  consistency, categorical domain, NOT NULL), each one row
  (check, n_checked, n_violations). One fused counting pass per table
  (all of a table's checks ride the same scan as O(blocks) partial
  cells); the FK probe broadcasts the customer key side (the dim table —
  the np.isin broadcast-probe precedent); the uniqueness check is an
  exact distinct via salted in-partition nunique, O(salt) cells out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _cents, _pq
from scrapy_ray.pipelines.queries8 import _round6

_Q = 1_000_000_000_000          # 1e-12 quantization units for log terms
_NB_K = 256                     # top-K vocabulary (exact), +1 OOV bucket
_NB_OOV = "<oov>"
_DQ_SALT = 256


def _get(ref):
    return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref


def _strip(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _qln(x: np.ndarray) -> np.ndarray:
    """ln(x) quantized to 1e-12 integer units, half-away-from-zero (the
    DuckDB CAST(round(ln(x) * 1e12) AS BIGINT) twin)."""
    y = np.log(np.asarray(x, dtype=np.float64)) * _Q
    return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)


# ---------------------------------------------------------------------------
# two-sample Kolmogorov–Smirnov
# ---------------------------------------------------------------------------


def q_ks_test_click_view(sf_dir: str):
    """KS two-sample D between click and view ``value`` distributions.
    Per-batch (group, cent) partial histograms -> one bounded groupby ->
    driver walks the merged support: D numerator = max|c1*n2 - c2*n1|
    (exact int64), D = numerator/(n1*n2) finalized identically both
    sides."""
    ds = _pq(sf_dir, "events", columns=["event_type", "value"])

    def hpart(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        keep = (et == "click") | (et == "view")
        if not keep.any():
            return pa.table({"g": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        g = (et[keep] == "view").astype(np.int64)
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)[keep]
        df = pd.DataFrame({"g": g, "c": c})
        out = df.groupby(["g", "c"], sort=False).size().reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype(np.int64)
        return _strip(out)

    cells = (ds.map_batches(hpart, batch_format="pyarrow")
               .groupby(["g", "c"]).aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    merged = np.sort(cells["c"].unique().astype(np.int64))
    h = np.zeros((2, len(merged)), np.int64)
    for gi in (0, 1):
        sub = cells[cells["g"] == gi]
        pos = np.searchsorted(merged, sub["c"].to_numpy().astype(np.int64))
        h[gi, pos] = sub["cnt"].to_numpy().astype(np.int64)
    c1 = np.cumsum(h[0])
    c2 = np.cumsum(h[1])
    n1, n2 = int(c1[-1]), int(c2[-1])
    d_num = int(np.max(np.abs(c1 * n2 - c2 * n1)))
    return pd.DataFrame({
        "n1": np.array([n1], np.int64), "n2": np.array([n2], np.int64),
        "d_num": np.array([d_num], np.int64),
        "d6": _round6(np.array([d_num / float(n1 * n2)])),
    })


SQL_KS = """
WITH b AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         (event_type = 'view')::INT AS g
  FROM events WHERE event_type IN ('click', 'view')),
h AS (
  SELECT c, sum((g = 0)::INT)::BIGINT AS h1, sum((g = 1)::INT)::BIGINT AS h2
  FROM b GROUP BY 1),
cum AS (
  SELECT c, CAST(sum(h1) OVER (ORDER BY c) AS BIGINT) AS c1,
         CAST(sum(h2) OVER (ORDER BY c) AS BIGINT) AS c2
  FROM h),
t AS (SELECT sum(h1)::BIGINT AS n1, sum(h2)::BIGINT AS n2 FROM h)
SELECT n1, n2, max(abs(c1 * n2 - c2 * n1))::BIGINT AS d_num,
       round(max(abs(c1 * n2 - c2 * n1))::DOUBLE / (n1 * n2), 6) AS d6
FROM cum CROSS JOIN t GROUP BY n1, n2
"""


# ---------------------------------------------------------------------------
# multinomial Naive Bayes language classifier
# ---------------------------------------------------------------------------


def q_naive_bayes_lang(sf_dir: str):
    """Train-and-evaluate multinomial NB (predict lang from tokens).
    Pass 1: exact top-K vocabulary (count desc, token asc) via per-block
    partial top-K on aggregated disjoint cells. Pass 2: (lang, token)
    occurrence counts with non-vocab tokens folded into OOV, plus per-lang
    doc counts riding as sentinel rows — one bounded groupby. Driver
    builds the O(K × langs) quantized-log model and broadcasts it. Pass 3:
    stateless scoring scan — exact int64 accumulation, argmax ties break
    lang-ascending. Output: confusion matrix (true_lang, pred_lang, n)."""
    ds = _pq(sf_dir, "documents", columns=["text", "lang"])

    def uni_partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for s in t["text"].to_pylist():
            toks.extend(s.split())
        if not toks:
            return pa.table({"w": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        w, n = np.unique(np.asarray(toks), return_counts=True)
        return pa.table({"w": pa.array(w, pa.string()),
                         "n": pa.array(n.astype(np.int64))})

    ucnt = (_pq(sf_dir, "documents", columns=["text"])
            .map_batches(uni_partial, batch_format="pyarrow")
            .groupby("w").aggregate(Sum("n", alias_name="n")))

    def top_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"w": t["w"].to_pylist(),
                           "n": t["n"].to_numpy(zero_copy_only=False)
                           .astype(np.int64)})
        df = df.sort_values(["n", "w"], ascending=[False, True])
        return _strip(df.head(_NB_K))

    parts = (ucnt.map_batches(top_partial, batch_format="pyarrow")
                 .to_pandas()
                 .sort_values(["n", "w"], ascending=[False, True])
                 .head(_NB_K))
    vocab = np.sort(np.asarray(parts["w"].to_list()))     # searchsorted keys
    vocab_ref = ray.put(vocab)

    def map_toks(texts: list[str], vb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Flatten token occurrences to vocab indices (len(vb) == OOV) and
        per-doc occurrence counts."""
        toks: list[str] = []
        lens = np.empty(len(texts), np.int64)
        for i, s in enumerate(texts):
            ts = s.split()
            lens[i] = len(ts)
            toks.extend(ts)
        if not toks:
            return np.array([], np.int64), lens
        w = np.asarray(toks)
        p = np.searchsorted(vb, w)
        hit = (p < len(vb)) & (vb[np.minimum(p, len(vb) - 1)] == w)
        idx = np.where(hit, p, len(vb)).astype(np.int64)
        return idx, lens

    def lt_partial(t: pa.Table) -> pa.Table:
        vb = _get(vocab_ref)
        langs = np.asarray(t["lang"].to_pylist())
        idx, lens = map_toks(t["text"].to_pylist(), vb)
        doc_of = np.repeat(np.arange(len(langs)), lens)
        rows = {"lang": [], "tid": [], "cnt": []}
        # (lang, tid) occurrence cells, vectorized per distinct lang
        for lg in np.unique(langs):
            sel = idx[langs[doc_of] == lg] if len(idx) else np.array([], np.int64)
            cnt = np.bincount(sel, minlength=len(vb) + 1).astype(np.int64)
            nz = np.nonzero(cnt)[0]
            rows["lang"].extend([lg] * len(nz))
            rows["tid"].extend(nz.tolist())
            rows["cnt"].extend(cnt[nz].tolist())
            # sentinel tid=-1: doc count for the prior
            rows["lang"].append(lg)
            rows["tid"].append(-1)
            rows["cnt"].append(int((langs == lg).sum()))
        return pa.table({"lang": pa.array(rows["lang"], pa.string()),
                         "tid": pa.array(rows["tid"], pa.int64()),
                         "cnt": pa.array(rows["cnt"], pa.int64())})

    cells = (ds.map_batches(lt_partial, batch_format="pyarrow")
               .groupby(["lang", "tid"]).aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    langs = np.sort(cells["lang"].unique())
    L, V = len(langs), len(vocab) + 1
    cmat = np.zeros((L, V), np.int64)
    nd = np.zeros(L, np.int64)
    for li, lg in enumerate(langs):
        sub = cells[cells["lang"] == lg]
        tid = sub["tid"].to_numpy().astype(np.int64)
        cnt = sub["cnt"].to_numpy().astype(np.int64)
        prior_mask = tid == -1
        nd[li] = int(cnt[prior_mask].sum())
        cmat[li, tid[~prior_mask]] = cnt[~prior_mask]
    tlang = cmat.sum(axis=1)
    # u[l, v] = qln((c+1)/(t_l+V)); prior pu[l] = qln(nd_l / n_docs)
    u = _qln((cmat + 1.0) / (tlang[:, None] + float(V)))
    pu = _qln(nd / float(nd.sum()))
    model_ref = ray.put((vocab, u, pu, langs))

    def classify(t: pa.Table) -> pa.Table:
        vb, um, pr, lg = _get(model_ref)
        texts = t["text"].to_pylist()
        true_l = np.asarray(t["lang"].to_pylist())
        idx, lens = map_toks(texts, vb)
        doc_of = np.repeat(np.arange(len(texts)), lens)
        scores = np.tile(pr[:, None], (1, len(texts)))      # int64 (L, n)
        for li in range(len(lg)):
            if len(idx):
                np.add.at(scores[li], doc_of, um[li, idx])
        pred = lg[np.argmax(scores, axis=0)]                # ties -> lang asc
        df = pd.DataFrame({"true_lang": true_l, "pred_lang": pred})
        out = df.groupby(["true_lang", "pred_lang"], sort=False) \
            .size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return _strip(out)

    out = (ds.map_batches(classify, batch_format="pyarrow")
             .groupby(["true_lang", "pred_lang"])
             .aggregate(Sum("n", alias_name="n"))
             .to_pandas()
             .sort_values(["true_lang", "pred_lang"]).reset_index(drop=True))
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_NB = f"""
WITH toks AS (
  SELECT doc_id, lang AS true_lang,
         unnest(regexp_extract_all(text, '\\S+')) AS tok
  FROM documents),
cnt AS (SELECT tok, count(*)::BIGINT AS n FROM toks GROUP BY 1),
topk AS (SELECT tok FROM cnt ORDER BY n DESC, tok LIMIT {_NB_K}),
m AS (
  SELECT doc_id, true_lang,
         CASE WHEN tok IN (SELECT tok FROM topk) THEN tok
              ELSE '{_NB_OOV}' END AS tok
  FROM toks),
langs AS (SELECT DISTINCT lang FROM documents),
vsz AS (SELECT count(*)::BIGINT + 1 AS v FROM topk),
tc AS (SELECT true_lang AS lang, tok, count(*)::BIGINT AS c
       FROM m GROUP BY 1, 2),
tl AS (SELECT lang, sum(c)::BIGINT AS t FROM tc GROUP BY 1),
vocabx AS (SELECT tok FROM topk UNION ALL SELECT '{_NB_OOV}'),
u AS (
  SELECT l.lang, vx.tok,
         CAST(round(ln((coalesce(tc.c, 0) + 1)::DOUBLE
                       / (tl.t + vz.v)::DOUBLE) * {_Q}) AS BIGINT) AS u
  FROM langs l
  CROSS JOIN vocabx vx
  CROSS JOIN vsz vz
  JOIN tl ON tl.lang = l.lang
  LEFT JOIN tc ON tc.lang = l.lang AND tc.tok = vx.tok),
prior AS (
  SELECT lang,
         CAST(round(ln(count(*)::DOUBLE
                       / (SELECT count(*) FROM documents)) * {_Q}) AS BIGINT)
           AS pu
  FROM documents GROUP BY 1),
sc AS (
  SELECT m.doc_id, m.true_lang, u.lang, prior.pu + sum(u.u) AS score
  FROM m JOIN u USING (tok) JOIN prior ON prior.lang = u.lang
  GROUP BY 1, 2, 3, prior.pu),
pred AS (
  SELECT doc_id, true_lang, lang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM sc)
SELECT true_lang, pred_lang, count(*)::BIGINT AS n
FROM pred WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# data-quality expectation suite
# ---------------------------------------------------------------------------


def q_dq_expectations(sf_dir: str):
    """Seven-check DQ audit, one fused counting scan per table. Violation
    partials are O(blocks) cells summed at the driver; the FK probe
    broadcasts the customer key vector (dim side); orderkey uniqueness is
    an exact distinct via salted in-partition nunique."""
    import os

    import pyarrow.parquet as pq_

    # dim-side key vector, broadcast once (np.isin probe precedent)
    ckeys = np.sort(pq_.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey"])["c_custkey"].to_numpy())
    ckeys_ref = ray.put(ckeys)

    # ONE orders pipeline: FK + positivity violation partials ride the
    # uniqueness shuffle as sentinel rows (salt -1/-2 carry the per-batch
    # counts; real salts carry in-batch-unique orderkeys for the exact
    # distinct)
    def orders_partial(t: pa.Table) -> pa.Table:
        ck = _get(ckeys_ref)
        okey = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price_c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        fk_viol = int((~np.isin(okey, ck)).sum())
        pos_viol = int((price_c <= 0).sum())
        k = np.unique(t["o_orderkey"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({
            "k": pa.array(np.concatenate([k, [fk_viol, pos_viol]])),
            "salt": pa.array(np.concatenate(
                [(k % _DQ_SALT), [-1, -2]]).astype(np.int64))})

    def orders_reduce(df: pd.DataFrame) -> pd.DataFrame:
        salt = int(df["salt"].iloc[0])
        if salt < 0:    # sentinel group: per-batch violation counts
            return pd.DataFrame({"salt": np.array([salt], np.int64),
                                 "v": np.array([df["k"].sum()], np.int64)})
        return pd.DataFrame({"salt": np.array([salt], np.int64),
                             "v": np.array([df["k"].nunique()], np.int64)})

    ored = (_pq(sf_dir, "orders",
                columns=["o_custkey", "o_totalprice", "o_orderkey"])
            .map_batches(orders_partial, batch_format="pyarrow")
            .groupby("salt").map_groups(orders_reduce, batch_format="pandas")
            .to_pandas())
    nuniq = int(ored[ored["salt"] >= 0]["v"].sum())
    fk_viol = int(ored[ored["salt"] == -1]["v"].sum())
    pos_viol = int(ored[ored["salt"] == -2]["v"].sum())
    from scrapy_ray.pipelines.queries import _nrows
    n_orders = _nrows(sf_dir, "orders")
    o_cells = pd.DataFrame({
        "check": ["orders_custkey_fk", "orders_price_positive"],
        "n_checked": np.array([n_orders] * 2, np.int64),
        "n_violations": np.array([fk_viol, pos_viol], np.int64)})
    u_cells = pd.DataFrame({
        "check": ["orders_orderkey_unique"],
        "n_checked": np.array([n_orders], np.int64),
        "n_violations": np.array([n_orders - nuniq], np.int64)})

    def lineitem_checks(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        viol = int(((q < 1) | (q > 50)).sum())
        return pa.table({
            "check": pa.array(["lineitem_qty_range"]),
            "n_checked": pa.array([len(q)], pa.int64()),
            "n_violations": pa.array([viol], pa.int64())})

    l_cells = _pq(sf_dir, "lineitem", columns=["l_quantity"]) \
        .map_batches(lineitem_checks, batch_format="pyarrow").to_pandas()

    def docs_checks(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        viol = int(sum(1 for s, n in zip(texts, nch) if len(s) != n))
        return pa.table({
            "check": pa.array(["documents_nchars_consistent"]),
            "n_checked": pa.array([len(texts)], pa.int64()),
            "n_violations": pa.array([viol], pa.int64())})

    d_cells = _pq(sf_dir, "documents", columns=["text", "n_chars"]) \
        .map_batches(docs_checks, batch_format="pyarrow").to_pandas()

    _ALLOWED = np.array(["click", "error", "purchase", "signup", "view"])

    def events_checks(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist())
        dom_viol = int((~np.isin(et, _ALLOWED)).sum())
        null_viol = int(t["user_id"].null_count)
        return pa.table({
            "check": pa.array(["events_type_domain", "events_user_notnull"]),
            "n_checked": pa.array([len(et)] * 2, pa.int64()),
            "n_violations": pa.array([dom_viol, null_viol], pa.int64())})

    e_cells = _pq(sf_dir, "events", columns=["event_type", "user_id"]) \
        .map_batches(events_checks, batch_format="pyarrow").to_pandas()

    allp = pd.concat([o_cells, u_cells, l_cells, d_cells, e_cells],
                     ignore_index=True)
    out = allp.groupby("check", sort=True).agg(
        n_checked=("n_checked", "sum"),
        n_violations=("n_violations", "sum")).reset_index()
    for c in ("n_checked", "n_violations"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_DQ = """
SELECT * FROM (
  SELECT 'documents_nchars_consistent' AS "check",
         count(*)::BIGINT AS n_checked,
         sum((length(text) != n_chars)::INT)::BIGINT AS n_violations
  FROM documents
  UNION ALL
  SELECT 'events_type_domain', count(*)::BIGINT,
         sum((event_type NOT IN
              ('click', 'error', 'purchase', 'signup', 'view'))::INT)::BIGINT
  FROM events
  UNION ALL
  SELECT 'events_user_notnull', count(*)::BIGINT,
         sum((user_id IS NULL)::INT)::BIGINT
  FROM events
  UNION ALL
  SELECT 'lineitem_qty_range', count(*)::BIGINT,
         sum((l_quantity < 1 OR l_quantity > 50)::INT)::BIGINT
  FROM lineitem
  UNION ALL
  SELECT 'orders_custkey_fk', count(*)::BIGINT,
         sum((o_custkey NOT IN (SELECT c_custkey FROM customer))::INT)::BIGINT
  FROM orders
  UNION ALL
  SELECT 'orders_orderkey_unique', count(*)::BIGINT,
         (count(*) - count(DISTINCT o_orderkey))::BIGINT
  FROM orders
  UNION ALL
  SELECT 'orders_price_positive', count(*)::BIGINT,
         sum((round(o_totalprice * 100) <= 0)::INT)::BIGINT
  FROM orders
) ORDER BY "check"
"""


QUERIES29: dict[str, tuple] = {
    "ks_test_click_view": (q_ks_test_click_view, SQL_KS),
    "naive_bayes_lang": (q_naive_bayes_lang, SQL_NB),
    "dq_expectations": (q_dq_expectations, SQL_DQ),
}
