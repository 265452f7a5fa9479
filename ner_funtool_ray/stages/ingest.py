"""P0 ingest: deterministic row ids + the content-sha256 invariant.

Stateless ``map_batches`` over zero-copy Arrow batches.  ``content_sha256``
is the per-row invariant the north rule requires to survive every downstream
stage; ``row_id`` is a pure function of (repo, path, commit) so retried
tasks emit identical ids (no global counters — SURVEY.md §4).

SQL twin of row_id (DuckDB): ``md5_number_lower(repo || '\\x00' || path ||
'\\x00' || commit)`` reinterpreted as signed int64 — see tests for the
byte-order parity check.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data

from ner_funtool_ray.functions.hashing import sha256_hex


def stable_id64(*parts: str) -> int:
    """Signed int64 from the lower 8 bytes (little-endian) of md5 — matches
    DuckDB ``md5_number_lower`` so oracles can reproduce ids."""
    h = hashlib.md5("\x00".join(parts).encode("utf-8")).digest()
    v = int.from_bytes(h[8:16], "little")
    return v - (1 << 64) if v >= (1 << 63) else v


def _ingest_batch(batch: pa.Table) -> pa.Table:
    repo = batch["repo"].to_pylist()
    path = batch["path"].to_pylist()
    commit = batch["commit"].to_pylist()
    content = batch["content"].to_pylist()
    row_id = pa.array(
        [stable_id64(r, p, c) for r, p, c in zip(repo, path, commit)],
        type=pa.int64(),
    )
    sha = pa.array(sha256_hex(content), type=pa.string())
    return batch.append_column("row_id", row_id).append_column(
        "content_sha256", sha
    )


def ingest(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    """(repo, path, commit, lang, content) → + (row_id, content_sha256)."""
    return corpus.map_batches(_ingest_batch, batch_format="pyarrow")
