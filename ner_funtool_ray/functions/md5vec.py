"""Vectorized MD5 over batches of SHORT byte strings (≤ 55 bytes).

Several oracle-checked operators need *the same* per-value hash on both
engines: DuckDB exposes ``md5_number_lower/upper(s)`` (little-endian
uint64 of digest bytes [8:16] / [0:8]); the Ray side previously called
``hashlib.md5`` per row in a Python loop (flagged in review).  Messages
up to 55 bytes fit a single 64-byte MD5 block after padding, so the
whole digest can be computed as ~64 rounds of numpy uint32 arithmetic
over the entire batch at once — no per-row Python.

Used by: deterministic sampling (``sample_documents``), md5-derived
embeddings/hyperplanes (``stages/link.py``, ``stages/similarity.py``).
Falls back to ``hashlib`` per element for messages longer than 55 bytes
(cannot happen for the fixed-key constructions above; guarded anyway).
"""

from __future__ import annotations

import hashlib

import numpy as np

# Per-round shift amounts and sine-derived constants from RFC 1321.
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_K = np.array(
    [int(abs(np.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
# message-word index per round
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16)]
    + [(3 * i + 5) % 16 for i in range(16)]
    + [(7 * i) % 16 for i in range(16)],
    dtype=np.int64,
)


def _digest_words(msgs: list[bytes]) -> np.ndarray:
    """(N, 4) uint32 array of the MD5 state words (A, B, C, D) per message.

    All messages must be ≤ 55 bytes (single padded block)."""
    n = len(msgs)
    block = np.zeros((n, 64), dtype=np.uint8)
    lens = np.empty(n, dtype=np.uint64)
    for i, m in enumerate(msgs):  # cheap: byte copy only, no hashing
        ln = len(m)
        block[i, :ln] = np.frombuffer(m, dtype=np.uint8)
        block[i, ln] = 0x80
        lens[i] = ln
    block[:, 56:64] = (lens * 8)[:, None].view(np.uint8).reshape(n, 8)
    M = block.view(np.uint32).reshape(n, 16)  # little-endian words

    A = np.full(n, 0x67452301, dtype=np.uint32)
    B = np.full(n, 0xEFCDAB89, dtype=np.uint32)
    C = np.full(n, 0x98BADCFE, dtype=np.uint32)
    D = np.full(n, 0x10325476, dtype=np.uint32)
    a, b, c, d = A.copy(), B.copy(), C.copy(), D.copy()
    with np.errstate(over="ignore"):
        for i in range(64):
            if i < 16:
                f = (b & c) | (~b & d)
            elif i < 32:
                f = (d & b) | (~d & c)
            elif i < 48:
                f = b ^ c ^ d
            else:
                f = c ^ (b | ~d)
            tmp = f + a + _K[i] + M[:, _G[i]]
            a = d
            d = c
            c = b
            s = int(_S[i])
            b = b + ((tmp << np.uint32(s)) | (tmp >> np.uint32(32 - s)))
        A += a
        B += b
        C += c
        D += d
    return np.stack([A, B, C, D], axis=1)


def md5_number_lower_batch(msgs: list[bytes | str]) -> np.ndarray:
    """uint64 array: DuckDB ``md5_number_lower`` (digest bytes[8:16], LE)
    per message — i.e. C | (D << 32) of the final state."""
    enc = [m.encode() if isinstance(m, str) else m for m in msgs]
    short = all(len(m) <= 55 for m in enc)
    if short:
        w = _digest_words(enc).astype(np.uint64)
        return w[:, 2] | (w[:, 3] << np.uint64(32))
    return np.array(
        [
            int.from_bytes(hashlib.md5(m).digest()[8:16], "little")
            for m in enc
        ],
        dtype=np.uint64,
    )


def md5_number_upper_batch(msgs: list[bytes | str]) -> np.ndarray:
    """uint64 array: DuckDB ``md5_number_upper`` (digest bytes[0:8], LE)
    per message — i.e. A | (B << 32) of the final state."""
    enc = [m.encode() if isinstance(m, str) else m for m in msgs]
    short = all(len(m) <= 55 for m in enc)
    if short:
        w = _digest_words(enc).astype(np.uint64)
        return w[:, 0] | (w[:, 1] << np.uint64(32))
    return np.array(
        [
            int.from_bytes(hashlib.md5(m).digest()[:8], "little")
            for m in enc
        ],
        dtype=np.uint64,
    )


def md5_unit_batch(keys: list[str]) -> np.ndarray:
    """float64 array in [-1, 1): ``md5_number_lower(key)/2^64*2 - 1``.

    The shared engine/SQL recipe for deterministic pseudo-random reals
    (hyperplane components, hash embeddings): DuckDB computes the
    identical value as ``md5_number_lower(k) / 18446744073709551616.0
    * 2.0 - 1.0`` (uint64→float64 rounds identically on both engines)."""
    u = md5_number_lower_batch(keys)
    return u.astype(np.float64) / 2.0**64 * 2.0 - 1.0


def md5_planes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """(n_planes, dim) float64 hyperplanes with md5-derived components —
    the SQL-reproducible replacement for seeded gaussian planes.  Key
    format ``plane:{seed}:{j}:{l}`` is mirrored by ``_planes_sql_cte``."""
    keys = [
        f"plane:{seed}:{j}:{l}" for j in range(n_planes) for l in range(dim)
    ]
    return md5_unit_batch(keys).reshape(n_planes, dim)


def planes_sql_cte(n_planes: int, dim: int, seed: int = 42) -> str:
    """DuckDB CTE body producing (j, l, p) rows equal to :func:`md5_planes`."""
    return (
        "SELECT j, l, md5_number_lower('plane:" + str(seed) + ":' || j || ':' || l)"
        " / 18446744073709551616.0 * 2.0 - 1.0 AS p"
        f" FROM (SELECT unnest(range({n_planes})) AS j)"
        f" CROSS JOIN (SELECT unnest(range({dim})) AS l)"
    )
