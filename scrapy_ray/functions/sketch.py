"""Similarity-sketch kernels for the training-data dedup suite (SURVEY.md
§2.7 D5 extension point, driver round-1 mandate): MinHash, SimHash, banding.

All vectorized numpy over 64-bit token hashes (functions/hashing.hash64);
deterministic (fixed permutation seeds), mergeable, and unit-tested against
brute-force definitions in tests/test_training.py.
"""

from __future__ import annotations

import numpy as np

from scrapy_ray.functions.hashing import hash64

_MERSENNE = np.uint64((1 << 61) - 1)
_SEED = 1234567


def _perms(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(_SEED)
    a = rng.integers(1, 1 << 61, size=n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(token_hashes: np.ndarray, n_perm: int = 64) -> np.ndarray:
    """(t,) uint64 token hashes -> (n_perm,) uint64 MinHash signature.

    h_i = min over tokens of (a_i * h + b_i) mod (2^61 - 1) — the classic
    universal-hash permutation family (Broder '97)."""
    a, b = _perms(n_perm)
    h = token_hashes.astype(np.uint64) & _MERSENNE
    # (n_perm, t): cheap at doc scale; modular mul in uint64 with M61 wraps ok
    vals = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_many(token_sets: list[np.ndarray], n_perm: int = 64) -> np.ndarray:
    """list of per-doc token-hash arrays -> (n_docs, n_perm) signatures."""
    out = np.empty((len(token_sets), n_perm), dtype=np.uint64)
    a, b = _perms(n_perm)
    for i, h in enumerate(token_sets):
        if len(h) == 0:
            out[i] = _MERSENNE
            continue
        hh = h.astype(np.uint64) & _MERSENNE
        out[i] = ((a[:, None] * hh[None, :] + b[:, None]) % _MERSENNE).min(axis=1)
    return out


def band_keys(signatures: np.ndarray, n_bands: int = 8) -> np.ndarray:
    """(n, n_perm) signatures -> (n, n_bands) uint64 band bucket keys.
    Docs sharing any band key are LSH candidates."""
    n, p = signatures.shape
    rows = p // n_bands
    sig = signatures[:, : n_bands * rows].reshape(n, n_bands, rows)
    mix = np.uint64(0x9E3779B97F4A7C15)
    key = np.zeros((n, n_bands), dtype=np.uint64)
    for r in range(rows):
        key = (key ^ sig[:, :, r]) * mix
        key ^= key >> np.uint64(29)
    return key


def simhash64(token_hashes: np.ndarray) -> int:
    """Charikar SimHash over 64-bit token hashes -> 64-bit fingerprint."""
    if len(token_hashes) == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    score = (2 * bits - 1).sum(axis=0)
    fp = np.uint64(0)
    for j in range(64):
        if score[j] > 0:
            fp |= np.uint64(1) << np.uint64(j)
    return int(fp)


def simhash_many(token_sets: list[np.ndarray]) -> np.ndarray:
    return np.array([simhash64(h) for h in token_sets], dtype=np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x).astype(np.int64)
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)


def token_hash_set(text: str) -> np.ndarray:
    """Whitespace tokens -> unique 64-bit hashes (the doc's 'shingle' set;
    unigram shingles fit the word-soup testdata — window-n shingles are a
    parameter away via tokens_to_shingles)."""
    toks = list(dict.fromkeys(text.split()))
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return np.unique(hash64(toks))


def tokens_to_shingles(tokens: list[str], k: int = 3) -> list[str]:
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]


def shingle_hash_set(text: str, k: int = 3) -> np.ndarray:
    """k-word shingles -> unique 64-bit hashes. Shingling (vs unigram sets)
    is what makes near-dup detection sequence-sensitive: bag-of-words-similar
    but differently-ordered documents stop colliding."""
    sh = tokens_to_shingles(text.split(), k)
    if not sh:
        return np.empty(0, dtype=np.uint64)
    return np.unique(hash64(sh))
