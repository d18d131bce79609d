"""Tests for the training-data operator suite: sketch kernels vs brute-force
definitions, LSH recall, IVF recall, determinism of rows-only ops."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from scrapy_ray.functions.hashing import hash64
from scrapy_ray.functions.sketch import (band_keys, hamming64, minhash_many,
                                         minhash_signature, shingle_hash_set,
                                         simhash64, token_hash_set)

SF = "/root/testdata/sf0.001"


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter) if (a.size or b.size) else 0.0


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(3)
    base = rng.integers(0, 2**61, size=400, dtype=np.uint64)
    a = np.unique(base)
    for frac in (0.9, 0.5, 0.2):
        keep = rng.random(len(a)) < frac
        b = np.unique(np.concatenate([a[keep], rng.integers(0, 2**61, size=80, dtype=np.uint64)]))
        true_j = _jaccard(a, b)
        sa = minhash_signature(a, n_perm=256)
        sb = minhash_signature(b, n_perm=256)
        est = (sa == sb).mean()
        assert abs(est - true_j) < 0.12, (true_j, est)


def test_minhash_identical_and_disjoint():
    a = np.unique(np.arange(100, dtype=np.uint64) * 7919)
    assert (minhash_signature(a) == minhash_signature(a.copy())).all()
    b = np.unique(np.arange(100, dtype=np.uint64) * 7919 + 3)
    est = (minhash_signature(a, 128) == minhash_signature(b, 128)).mean()
    assert est < 0.1


def test_band_keys_shape_and_collision():
    sets = [np.unique(np.random.default_rng(i).integers(0, 2**61, 50, dtype=np.uint64))
            for i in range(4)]
    sigs = minhash_many(sets, n_perm=64)
    keys = band_keys(sigs, n_bands=8)
    assert keys.shape == (4, 8)
    # identical docs collide in every band
    k2 = band_keys(minhash_many([sets[0], sets[0].copy()]), n_bands=8)
    assert (k2[0] == k2[1]).all()


def test_simhash_locality():
    toks = [f"w{i}" for i in range(200)]
    a = np.unique(hash64(toks))
    near = np.unique(hash64(toks[:190] + [f"x{i}" for i in range(10)]))
    far = np.unique(hash64([f"z{i}" for i in range(200)]))
    ha, hn, hf = simhash64(a), simhash64(near), simhash64(far)
    d_near = hamming64(np.array([ha], dtype=np.uint64), np.array([hn], dtype=np.uint64))[0]
    d_far = hamming64(np.array([ha], dtype=np.uint64), np.array([hf], dtype=np.uint64))[0]
    assert d_near < d_far
    assert d_near <= 12
    assert simhash64(a) == simhash64(a.copy())


def test_shingle_sets():
    s = shingle_hash_set("a b c d", k=3)
    assert len(s) == 2        # "a b c", "b c d"
    assert len(shingle_hash_set("a b", k=3)) == 1
    assert len(shingle_hash_set("", k=3)) == 0


def test_lsh_recall_vs_exact(ray_session):
    """LSH candidate generation + verify must recover >=90% of the true
    shingle-Jaccard >= tau pairs on the testdata subset."""
    import pyarrow.parquet as pq

    from scrapy_ray.pipelines.training import q_minhash_lsh_neardup

    tau = 0.5
    got = q_minhash_lsh_neardup(SF, tau=tau)
    got_pairs = set(zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist()))

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sets = {int(i): shingle_hash_set(s)
            for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    truth = set()
    ids = sorted(sets)
    for a, b in itertools.combinations(ids, 2):
        if _jaccard(sets[a], sets[b]) >= tau:
            truth.add((a, b))
    assert truth, "testdata should contain shingle near-dups"
    recall = len(got_pairs & truth) / len(truth)
    assert recall >= 0.9, (recall, len(truth), len(got_pairs))
    # no false positives: every reported pair truly passes tau (verified step)
    assert got_pairs <= truth


def test_ppjoin_exact_vs_brute_force(ray_session):
    """PPJoin prefix filtering is EXACT: its pair set must equal the O(n^2)
    brute-force shingle-Jaccard >= tau truth (no misses, no false positives)
    — the end-to-end check of the prefix-filter lemma. By transitivity with
    test_lsh_recall_vs_exact, LSH pairs are a subset of PPJoin pairs."""
    import pyarrow.parquet as pq

    from scrapy_ray.pipelines.queries7 import _PPJ_DEN, _PPJ_NUM, q_ppjoin_neardup

    got = q_ppjoin_neardup(SF)
    got_pairs = set(zip(got["doc_a"].tolist(), got["doc_b"].tolist()))

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sets = {int(i): shingle_hash_set(s)
            for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    truth = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        A, B = sets[a], sets[b]
        k = np.intersect1d(A, B, assume_unique=True).size
        # integer-exact J >= num/den, same predicate as the query
        if (_PPJ_DEN + _PPJ_NUM) * k >= _PPJ_NUM * (A.size + B.size):
            truth.add((a, b))
    assert truth, "testdata should contain shingle near-dups"
    assert got_pairs == truth, (len(got_pairs), len(truth),
                                got_pairs ^ truth)
    # the df cutoff never fired at test scale — exactness is unconditional
    assert got.attrs["skipped_groups"] == 0


def test_ppjoin_hot_group_cutoff(ray_session, tmp_path):
    """Property test for the max_bucket df cutoff: a forced corpus-hot
    shingle (30 identical docs) makes every prefix group exceed a low
    cutoff — groups are skipped AND reported; the default cutoff keeps the
    result exact on the same corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrapy_ray.pipelines.queries7 import q_ppjoin_neardup

    d = tmp_path / "hot"
    d.mkdir()
    n = 30
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(["alpha beta gamma delta"] * n),
    }), str(d / "documents.parquet"))

    full = q_ppjoin_neardup(str(d))
    assert len(full) == n * (n - 1) // 2          # all identical -> all pairs
    assert (full["jaccard"] == 1.0).all()
    assert full.attrs["skipped_groups"] == 0

    cut = q_ppjoin_neardup(str(d), max_bucket=10)
    # every prefix group holds all 30 docs -> all skipped, none verified
    assert len(cut) == 0
    assert cut.attrs["skipped_groups"] > 0


def test_ivf_recall_vs_brute_force(ray_session):
    from scrapy_ray.pipelines.training import q_ann_cosine_topk, q_ann_ivf_topk

    bf = q_ann_cosine_topk(SF)
    ivf = q_ann_ivf_topk(SF)
    bf_pairs = set(zip(bf["query_id"].to_pylist(), bf["neighbor_id"].to_pylist()))
    ivf_pairs = set(zip(ivf["query_id"].to_pylist(), ivf["neighbor_id"].to_pylist()))
    recall = len(bf_pairs & ivf_pairs) / len(bf_pairs)
    assert recall >= 0.5, recall  # nprobe=4/16 buckets on random vectors


def test_embedding_lsh_recall_vs_brute(ray_session):
    """Hyperplane-LSH near-dup must recover most of the brute-force pairs
    (8 planes -> only sign-identical buckets compared)."""
    from scrapy_ray.pipelines.queries2 import q_embedding_neardup, q_embedding_neardup_lsh

    bf = q_embedding_neardup(SF)
    lsh = q_embedding_neardup_lsh(SF)
    bf_pairs = set(zip(bf["vec_a"].to_pylist(), bf["vec_b"].to_pylist()))
    lsh_pairs = set(zip(lsh["vec_a"].to_pylist(), lsh["vec_b"].to_pylist()))
    assert bf_pairs, "brute force should find near-dup pairs at tau=0.35"
    assert lsh_pairs <= bf_pairs          # no false positives (verified in-bucket)
    recall = len(lsh_pairs) / len(bf_pairs)
    assert recall >= 0.8, (recall, len(bf_pairs))  # 16 tables x 3 planes


def test_rows_only_ops_deterministic(ray_session):
    from scrapy_ray.pipelines.oracle import normalize, to_pandas
    from scrapy_ray.pipelines.training import q_lang_id_trigram, q_simhash64

    a = normalize(to_pandas(q_simhash64(SF)))
    b = normalize(to_pandas(q_simhash64(SF)))
    assert a.equals(b)
    la = normalize(to_pandas(q_lang_id_trigram(SF)))
    lb = normalize(to_pandas(q_lang_id_trigram(SF)))
    assert la.equals(lb)


def test_hll_accuracy_and_merge():
    from scrapy_ray.functions.sketch import HLL

    rng = np.random.default_rng(5)
    for true_n in (100, 5_000, 200_000):
        # full uint64 range — register index uses the TOP p bits
        keys = rng.integers(0, 2**64, size=true_n, dtype=np.uint64)
        keys = np.unique(keys)
        h = HLL().add_many(keys)
        err = abs(h.estimate() - len(keys)) / len(keys)
        assert err < 0.06, (true_n, h.estimate())
        # merge of two halves == one pass
        a = HLL().add_many(keys[: len(keys) // 2])
        b = HLL().add_many(keys[len(keys) // 2:])
        assert abs(a.merge(b).estimate() - h.estimate()) < 1e-9
        # serialization round-trip
        assert HLL.from_bytes(h.to_bytes()).estimate() == h.estimate()


def test_approx_distinct_users_vs_exact(ray_session):
    import duckdb

    from scrapy_ray.pipelines.skew import q_approx_distinct_users

    est = q_approx_distinct_users(SF)["approx_distinct_users"][0].as_py()
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.06, (est, exact)


def test_trigram_langid_separates_real_signal(tmp_path, ray_session):
    """The synthetic documents table carries no language signal (same token
    soup under every label — accuracy there is chance by construction).
    This pins that the classifier itself works: three fake 'languages' with
    distinct character distributions classify at >0.95."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrapy_ray.pipelines.training import TrigramLangId, train_trigram_profiles

    alphabets = {"aa": "aeioubcdfg", "bb": "xyzwvqrstk", "cc": "0123456789"}
    rng = random.Random(7)
    rows = {"doc_id": [], "text": [], "lang": []}
    for i in range(300):
        lang = list(alphabets)[i % 3]
        text = " ".join("".join(rng.choice(alphabets[lang]) for _ in range(6))
                        for _ in range(30))
        rows["doc_id"].append(i)
        rows["text"].append(text)
        rows["lang"].append(lang)
    d = str(tmp_path)
    pq.write_table(pa.table(rows), f"{d}/documents.parquet")

    m = TrigramLangId(train_trigram_profiles(d))
    t = pq.read_table(f"{d}/documents.parquet")
    out = m(t)
    acc = sum(a == b for a, b in zip(out["lang_pred"].to_pylist(),
                                     out["lang_true"].to_pylist())) / len(out)
    assert acc > 0.95, acc


def _ref_components(pairs, all_ids):
    """Independent reference clustering: BFS over adjacency."""
    from collections import defaultdict, deque
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    keep = {}
    for start in sorted(all_ids):
        if start in keep:
            continue
        comp, q = [], deque([start])
        seen = {start}
        while q:
            x = q.popleft()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    q.append(y)
        m = min(comp)
        for x in comp:
            keep[x] = (m, len(comp))
    return keep


def test_connected_components_keep_vs_reference():
    from scrapy_ray.pipelines.training import connected_components_keep

    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(0, 500, size=300, dtype=np.int64))
    n_pairs = 120
    a = rng.choice(ids, n_pairs)
    b = rng.choice(ids, n_pairs)
    m = a != b
    a, b = a[m], b[m]
    got = connected_components_keep(a, b, ids)
    ref = _ref_components(list(zip(a.tolist(), b.tolist())), ids.tolist())
    for d, k, s in zip(got["doc_id"].to_pylist(), got["keep_doc"].to_pylist(),
                       got["cluster_size"].to_pylist()):
        assert ref[d] == (k, s), (d, k, s, ref[d])
    assert len(got) == len(ids)


def test_minhash_lsh_keep_collapses_corpus(ray_session):
    """The LSH keep mapping must (a) equal an independent clustering of the
    SAME verified pair list, (b) cover every doc, (c) leave a kept corpus
    with no surviving verified near-dup pair."""
    import pyarrow.parquet as pq

    from scrapy_ray.pipelines.training import q_minhash_lsh_keep, q_minhash_lsh_neardup

    tau = 0.5
    pairs = q_minhash_lsh_neardup(SF, tau=tau)
    keep = q_minhash_lsh_keep(SF, tau=tau)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    all_ids = sorted(t["doc_id"].to_pylist())
    assert keep["doc_id"].to_pylist() == all_ids
    plist = list(zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()))
    ref = _ref_components(plist, all_ids)
    got = dict(zip(keep["doc_id"].to_pylist(), keep["keep_doc"].to_pylist()))
    assert all(got[d] == ref[d][0] for d in all_ids)
    kept = {d for d, k in got.items() if d == k}
    assert all(not (a in kept and b in kept) for a, b in plist)
    assert len(kept) < len(all_ids), "testdata has near-dups; some must collapse"


def test_minhash_lsh_keep_distributed_route_identical(ray_session):
    """Forcing the distributed hash-min CC route (driver_pair_limit=0) must
    produce the SAME keep mapping as the union-find fast path — the routing
    threshold changes execution shape only, never the result."""
    from scrapy_ray.pipelines.training import q_minhash_lsh_keep

    fast = q_minhash_lsh_keep(SF, tau=0.5)
    dist = q_minhash_lsh_keep(SF, tau=0.5, driver_pair_limit=0)
    assert fast.column_names == dist.column_names
    assert fast.sort_by("doc_id").equals(dist.sort_by("doc_id"))


def test_ivf_physical_layout_prunes_io(ray_session):
    """The inverted file must exist on disk and the probe plan must read
    strictly fewer bucket dirs than n_clusters (I/O pruning, not just
    skipped dot products)."""
    import os

    from scrapy_ray.pipelines.training import build_ivf_layout, ivf_probe_plan

    C, root = build_ivf_layout(SF)
    n_buckets = len([d for d in os.listdir(root) if d.startswith("bucket=")])
    assert n_buckets == len(C)
    _C, q_ids, _Qn, probe, files = ivf_probe_plan(SF)
    assert probe.shape == (len(q_ids), 4)
    probed = {os.path.basename(os.path.dirname(f)) for f in files}
    assert 0 < len(probed) < n_buckets, (len(probed), n_buckets)


def test_ann_ivf_recall_query(ray_session):
    from scrapy_ray.pipelines.training import q_ann_ivf_recall

    t = q_ann_ivf_recall(SF)
    rec = t["recall"].to_pylist()
    assert len(rec) > 0
    assert all(0.0 <= r <= 1.0 for r in rec)
    assert float(np.mean(rec)) >= 0.5


def test_embedding_lsh_recall_query(ray_session):
    from scrapy_ray.pipelines.queries2 import q_embedding_lsh_recall

    t = q_embedding_lsh_recall(SF)
    assert len(t) == 1
    assert t["n_false_pos"].to_pylist() == [0]
    assert t["recall"].to_pylist()[0] >= 0.8


def test_misra_gries_bounds_and_merge():
    """MG guarantees under forced decrements (k << distinct): every key with
    freq > n/(k+1) present; stored count underestimates by <= err; merge of
    halves obeys the same bounds."""
    from collections import Counter

    from scrapy_ray.functions.sketch import MisraGries

    rng = np.random.default_rng(21)
    zipf = rng.zipf(1.5, size=50_000)
    keys = zipf[zipf < 5000]
    truth = Counter(keys.tolist())
    n = len(keys)
    k = 32
    mg = MisraGries(k).add_many(keys)
    assert len(mg.counters) <= k
    assert mg.err > 0, "test must exercise decrements"
    for key, c in mg.counters.items():
        assert c <= truth[key] <= c + mg.err, (key, c, truth[key], mg.err)
    thresh = n / (k + 1)
    for key, f in truth.items():
        if f > thresh:
            assert key in mg.counters, (key, f, thresh)
    a = MisraGries(k).add_many(keys[: n // 2])
    b = MisraGries(k).add_many(keys[n // 2:])
    m = a.merge(b)
    for key, c in m.counters.items():
        assert c <= truth[key] <= c + m.err
    for key, f in truth.items():
        if f > thresh:
            assert key in m.counters


def test_heavy_hitters_users_query(ray_session):
    from scrapy_ray.pipelines.skew import q_heavy_hitters_users

    t = q_heavy_hitters_users(SF)
    assert len(t) == 10
    est = t["est_n"].to_pylist()
    exact = t["exact_n"].to_pylist()
    assert all(e <= x for e, x in zip(est, exact))
    assert est == sorted(est, reverse=True)


def test_countmin_bounds_and_merge():
    """CM guarantees under forced collisions (w << distinct keys): estimates
    never undercount; overcount within the e/w additive bound; merge of
    halves equals the whole (exact array identity — merge is element-add)."""
    import math
    from collections import Counter

    from scrapy_ray.functions.sketch import CountMin

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 5000, size=40_000)
    truth = Counter(keys.tolist())
    w, d = 128, 4                       # tiny width -> real collisions
    cm = CountMin(w, d).add_many(keys)
    qk = np.array(sorted(truth), dtype=np.int64)
    est = cm.estimate(qk)
    tru = np.array([truth[int(x)] for x in qk])
    assert (est >= tru).all()
    assert (est > tru).any(), "test must exercise collisions"
    assert (est - tru).max() <= math.ceil(math.e / w * cm.n)
    a = CountMin(w, d).add_many(keys[:20_000])
    b = CountMin(w, d).add_many(keys[20_000:])
    m = a.merge(b)
    assert (m.M == cm.M).all() and m.n == cm.n


def test_countmin_users_query(ray_session):
    from scrapy_ray.pipelines.skew import q_countmin_user_counts

    t = q_countmin_user_counts(SF)
    assert t.num_rows == 10
    est = np.array(t["est_n"].to_pylist())
    tru = np.array(t["exact_n"].to_pylist())
    assert (est >= tru).all()


def test_cc_hashmin_matches_union_find(ray_session):
    """Distributed hash-min propagation == driver union-find on a random
    deterministic edge set, including singletons."""
    import numpy as np
    import pyarrow as pa

    from scrapy_ray.pipelines.training import (cc_hashmin_labels,
                                               connected_components_keep)

    rng = np.random.RandomState(7)
    n = 60
    a = rng.randint(0, n, 40).astype(np.int64)
    b = rng.randint(0, n, 40).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    ids = np.arange(n, dtype=np.int64)
    want = connected_components_keep(a, b, ids).to_pandas()
    got = cc_hashmin_labels(pa.table({"doc_a": a, "doc_b": b}), ids)
    assert want.to_dict("list") == got.to_dict("list")


def test_cc_hashmin_path_graph_diameter(ray_session):
    """Worst case for label propagation: a path graph needs diameter
    rounds — the fixed-point loop must run them all (and the two
    singletons must keep themselves)."""
    import numpy as np
    import pyarrow as pa

    from scrapy_ray.pipelines.training import cc_hashmin_labels

    edges = pa.table({"doc_a": pa.array(np.arange(11, dtype=np.int64)),
                      "doc_b": pa.array(np.arange(1, 12, dtype=np.int64))})
    lab = cc_hashmin_labels(edges, np.arange(14, dtype=np.int64))
    assert (lab["keep_doc"].to_numpy()[:12] == 0).all()
    assert lab["keep_doc"].to_numpy()[12:].tolist() == [12, 13]
    assert (lab["cluster_size"].to_numpy()[:12] == 12).all()


def test_kll_accuracy_merge_and_determinism():
    """KLL sketch: rank error < 1% on a lognormal stream at k=256; merge of
    split sketches stays within the bound; identical input -> identical
    sketch (deterministic compaction, repo hard rule)."""
    from scrapy_ray.functions.sketch import KLL

    rng = np.random.RandomState(11)
    xs = (rng.lognormal(6, 2, 150_000) * 100).astype(np.int64)
    exact = np.sort(xs)

    def worst_err(s):
        w = 0.0
        for q in (0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99):
            est = s.quantile(q)
            r = np.searchsorted(exact, est, side="right")
            w = max(w, abs(r - np.ceil(q * len(xs))) / len(xs))
        return w

    whole = KLL(256)
    for c in np.array_split(xs, 23):
        whole.add_many(c)
    assert worst_err(whole) < 0.01
    # state is tiny relative to the stream
    assert sum(len(lv) for lv in whole.levels) < 2_000

    a, b = KLL(256), KLL(256)
    for c in np.array_split(xs[:90_000], 11):
        a.add_many(c)
    for c in np.array_split(xs[90_000:], 7):
        b.add_many(c)
    m = a.merge(b)
    assert m.n == len(xs)
    assert worst_err(m) < 0.01

    # determinism: same chunking -> bit-identical level state
    r1, r2 = KLL(64), KLL(64)
    for c in np.array_split(xs[:40_000], 9):
        r1.add_many(c)
        r2.add_many(c)
    assert all((x == y).all() for x, y in zip(r1.levels, r2.levels))

    # serde round trip preserves quantiles
    lv, n = m.serialize()
    r = KLL.deserialize(lv, n)
    assert all(r.quantile(q) == m.quantile(q) for q in (0.1, 0.5, 0.9))
