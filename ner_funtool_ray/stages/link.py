"""P5 entity linking: mention surface → candidate entity (SURVEY §7.1 P5).

Blocking: char-3gram MinHash band keys over normalized surfaces — mention
and candidate entity share ≥1 band key ⇒ candidate pair.  Scoring: cosine
between deterministic char-ngram hash embeddings (seeded, library-free).

Ray shape: the entity catalog is the SMALL side → an inverted
band-key→entities index is built once driver-side, ``ray.put``, and read in
each actor's ``__init__`` (broadcast join; SURVEY §2.5).  Mentions stream
through ``map_batches`` with zero shuffle.  For catalogs too big to
broadcast, the documented alternative is the symmetric shuffle:
explode both sides to (band_key, row) and ``groupby(band_key)`` —
same semantics, one exchange; the blocking key and its skew handling
(salt band keys whose bucket exceeds a count cap) stay identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ner_funtool_ray.functions.hashing import MinHasher, char_ngrams

EMB_DIM = 64


def surface_embedding(surface: str, dim: int = EMB_DIM) -> np.ndarray:
    """Deterministic char-ngram hash embedding: sum of per-gram md5-derived
    vectors (component l of gram g = ``md5_unit('emb:'+g+':'+l)``),
    L2-normalized.  Similar surfaces share ngrams → nearby vectors
    (stand-in for learned alias embeddings, FIXTURES F4).  The md5-unit
    construction (functions/md5vec.py) is reproducible in DuckDB via
    ``md5_number_lower``, which makes the linking pipeline SQL-oracle
    checkable (round-2 review item: seeded numpy gaussians were not)."""
    from ner_funtool_ray.functions.md5vec import md5_unit_batch

    grams = sorted(char_ngrams(surface.lower(), 3))
    if not grams:
        return np.zeros(dim)
    keys = [f"emb:{g}:{l}" for g in grams for l in range(dim)]
    v = md5_unit_batch(keys).reshape(len(grams), dim).sum(axis=0)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def build_entity_index(
    entities: list[str],
    num_perm: int = 32,
    num_bands: int = 16,
    seed: int = 5,
) -> dict:
    """Entity catalog → {band_key: [(entity, embedding)]} inverted index +
    hashing params (the broadcast small side)."""
    hasher = MinHasher(num_perm=num_perm, seed=seed)
    index: dict[str, list[tuple[str, np.ndarray]]] = {}
    for ent in sorted(set(entities)):
        sig = hasher.signature(char_ngrams(ent.lower(), 3))
        emb = surface_embedding(ent)
        for key in hasher.band_keys(sig, num_bands):
            index.setdefault(key, []).append((ent, emb))
    return {
        "index": index,
        "num_perm": num_perm,
        "num_bands": num_bands,
        "seed": seed,
    }


class EntityLinker:
    """Actor: holds the broadcast entity index; per batch links mention
    surfaces → (linked_entity, link_score); below-threshold → NIL ('')."""

    def __init__(self, index_ref, threshold: float = 0.85,
                 surface_col: str = "surface"):
        payload = ray.get(index_ref) if not isinstance(index_ref, dict) else index_ref
        self.index = payload["index"]
        self.hasher = MinHasher(
            num_perm=payload["num_perm"], seed=payload["seed"]
        )
        self.num_bands = payload["num_bands"]
        self.threshold = threshold
        self.surface_col = surface_col
        self._cache: dict[str, tuple[str, float]] = {}

    def link_one(self, surface: str) -> tuple[str, float]:
        cached = self._cache.get(surface)
        if cached is not None:
            return cached
        norm = surface.lower().strip()
        sig = self.hasher.signature(char_ngrams(norm, 3))
        cands: dict[str, np.ndarray] = {}
        for key in self.hasher.band_keys(sig, self.num_bands):
            for ent, emb in self.index.get(key, ()):
                cands[ent] = emb
        best, best_score = "", 0.0
        if cands:
            emb = surface_embedding(norm)
            for ent in sorted(cands):
                score = float(emb @ cands[ent])
                if score > best_score:
                    best, best_score = ent, score
        if best_score < self.threshold:
            best, best_score = "", 0.0
        result = (best, round(best_score, 6))
        self._cache[surface] = result
        return result

    def __call__(self, batch: pa.Table) -> pa.Table:
        links = [self.link_one(s) for s in batch[self.surface_col].to_pylist()]
        return batch.append_column(
            "linked_entity", pa.array([e for e, _ in links], type=pa.string())
        ).append_column(
            "link_score", pa.array([s for _, s in links], type=pa.float64())
        )


# Per-worker linker cache for the task-pool path (keyed by the broadcast
# index ref): rebuilding from the ray.get'd payload is a dict copy — cheap
# enough that a dedicated actor pool only added spin-up latency.  The
# surface→link memo lives on the cached linker, so it still amortizes
# across every batch a worker processes.
_LINKER_CACHE: dict = {}


def _link_batch(batch: pa.Table, index_ref, threshold: float) -> pa.Table:
    key = (index_ref.hex(), threshold)
    linker = _LINKER_CACHE.get(key)
    if linker is None:
        linker = EntityLinker(index_ref, threshold=threshold)
        _LINKER_CACHE[key] = linker
    return linker(batch)


def link_mentions(
    mentions: "ray.data.Dataset",
    entities: list[str],
    threshold: float = 0.85,
    batch_size: int = 2048,
    concurrency=None,  # kept for API compat; task pool ignores it
) -> "ray.data.Dataset":
    """Broadcast-index linking stage (no shuffle).  ``entities`` is the
    canonical catalog (e.g. the gazetteer's canonical surfaces)."""
    index_ref = ray.put(build_entity_index(entities))
    return mentions.map_batches(
        _link_batch,
        fn_kwargs={"index_ref": index_ref, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=batch_size,
    )
