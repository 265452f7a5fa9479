"""Content hashing + near-dup sketches (sha256 invariant, MinHash, SimHash).

sha256 implements the north-rule per-row invariant (content sha256 equality
in→out).  MinHash / SimHash / shingles power the dedup + linking stages; all
are seed-fixed and vectorized with numpy so retried tasks emit identical
bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_HASH = np.uint64((1 << 32) - 1)


def sha256_hex(texts) -> list[str]:
    """Vector sha256 hex of utf-8 text (the per-row content invariant)."""
    return [hashlib.sha256((t or "").encode("utf-8")).hexdigest() for t in texts]


def char_ngrams(text: str, n: int = 3) -> set[str]:
    """Character n-gram shingles over whitespace-normalized text."""
    t = " ".join((text or "").split())
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def word_ngrams(text: str, n: int = 2) -> set[str]:
    toks = (text or "").split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _stable_h32(s: str) -> int:
    """Stable 32-bit hash of a string (md5-based; Python hash() is salted)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:4], "little")


class MinHasher:
    """num_perm universal-hash MinHash over shingle sets.

    h_i(x) = (a_i * x + b_i) mod p  (p = 2^61-1), truncated to 32 bits —
    the classic Broder construction; parameters drawn from a fixed seed so
    every actor / retried task computes identical signatures.
    """

    def __init__(self, num_perm: int = 64, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        # a, b drawn from [1, 2^32) so a*x with 32-bit x stays < 2^64 —
        # drawing up to 2^61 would overflow uint64 BEFORE the Mersenne
        # reduction, silently computing (a*x mod 2^64 + b) mod p instead of
        # the Broder universal hash and weakening the collision guarantees.
        self.a = rng.integers(1, 1 << 32, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, 1 << 32, size=num_perm, dtype=np.uint64)

    def signature(self, shingles: set[str], h32_cache: dict | None = None) -> np.ndarray:
        """Signature of a shingle set.  ``h32_cache`` (e.g. held by an
        actor) memoizes shingle→hash32 — shingles repeat heavily across
        documents, and md5-per-shingle dominates otherwise.  Cached and
        uncached paths produce identical signatures."""
        if not shingles:
            return np.full(self.num_perm, _MAX_HASH, dtype=np.uint64)
        if h32_cache is None:
            x = np.array([_stable_h32(s) for s in shingles], dtype=np.uint64)
        else:
            vals = []
            for s in shingles:
                v = h32_cache.get(s)
                if v is None:
                    v = _stable_h32(s)
                    h32_cache[s] = v
                vals.append(v)
            x = np.array(vals, dtype=np.uint64)
        # (P, S) matrix of permuted hashes → min over shingles
        hv = (np.outer(self.a, x) + self.b[:, None]) % np.uint64(_MERSENNE)
        return (hv & _MAX_HASH).min(axis=1)

    def band_keys(self, sig: np.ndarray, num_bands: int) -> list[str]:
        """LSH band keys 'band_idx:hash(band rows)' for bucket groupby."""
        rows = self.num_perm // num_bands
        keys = []
        for b in range(num_bands):
            band = sig[b * rows : (b + 1) * rows]
            h = hashlib.md5(band.tobytes()).hexdigest()[:16]
            keys.append(f"{b}:{h}")
        return keys


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (md5 token hashes, unweighted)."""
    toks = (text or "").lower().split()
    if not toks:
        return 0
    v = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in toks:
        h = np.uint64(
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
        )
        bits = (h >> shifts) & np.uint64(1)
        v += np.where(bits == 1, 1, -1)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
