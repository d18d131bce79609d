"""Property test for the coded-Bloom fact-to-fact join core: on random
key->code assignments, unique-hit resolution + exact ambiguity resolution
must reconstruct the true code for EVERY probed key (Bloom FPs corrected,
never guessed)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def test_coded_bloom_join_exact(ray_session):
    from scrapy_ray.pipelines.bloomjoin import (build_coded_blooms, probe_codes,
                                                resolve_exact)

    rng = np.random.default_rng(13)
    n_build, n_codes = 5000, 5
    keys = np.arange(n_build, dtype=np.int64) * 7 + 3
    true_code = rng.integers(0, n_codes, size=n_build).astype(np.int64)
    codes = np.arange(n_codes, dtype=np.int64)
    build_tab = pa.table({"k": pa.array(keys), "c": pa.array(true_code)})
    build = ray.data.from_arrow(build_tab)

    def code_fn(t: pa.Table) -> np.ndarray:
        return t["c"].to_numpy(zero_copy_only=False).astype(np.int64)

    # deliberately undersized bloom -> plenty of false positives to resolve
    blooms = build_coded_blooms(build, "k", code_fn, codes, cap=400)
    probe_keys = rng.choice(keys, size=3000)
    one, code, amb = probe_codes(blooms, codes, probe_keys)
    # zero-hit impossible: every probed key exists in exactly one code
    assert (one | amb).all()
    # unique hits are always CORRECT (true bloom always fires)
    truth = dict(zip(keys.tolist(), true_code.tolist()))
    assert all(code[i] == truth[int(probe_keys[i])]
               for i in np.flatnonzero(one))
    assert amb.any(), "undersized bloom should produce ambiguous hits"
    resolved = resolve_exact(build, "k", code_fn,
                             sorted({int(k) for k in probe_keys[amb]}),
                             chunk=512)
    assert all(resolved[int(k)] == truth[int(k)] for k in probe_keys[amb])
