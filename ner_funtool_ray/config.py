"""Engine configuration: gazetteer, aliases, pipeline knobs.

The reference drives everything through ``tf.flags`` (`run_bert_crf.py:40-153`);
our equivalent is this module plus :class:`PipelineConfig`.

The gazetteer/alias tables are the *small side data* of the KG pipeline —
broadcast into actors (SURVEY.md §2.5 J1), never shuffled.  They are defined
over the synthetic documents vocabulary so DuckDB oracles can reproduce the
mention/triple extraction exactly (SQL twins in ``__ray_entry__``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# term → entity type, over the driver testdata `documents` vocabulary.
GAZETTEER: dict[str, str] = {
    "spark": "SYSTEM",
    "join": "OPERATION",
    "scan": "OPERATION",
    "filter": "OPERATION",
    "merge": "OPERATION",
    "sort": "OPERATION",
    "group": "OPERATION",
    "agg": "OPERATION",
    "query": "OPERATION",
    "hash": "OPERATION",
    "order": "OPERATION",
    "dup": "OPERATION",
    "row": "DATAOBJ",
    "column": "DATAOBJ",
    "table": "DATAOBJ",
    "line": "DATAOBJ",
    "key": "DATAOBJ",
    "value": "DATAOBJ",
    "data": "DATAOBJ",
    "part": "DATAOBJ",
    "batch": "DATAOBJ",
    "stream": "DATAOBJ",
    "window": "DATAOBJ",
    "vector": "DATAOBJ",
    "customer": "TABLE",
}

# The gazetteer feeds a regex with \b anchors on BOTH engines (Python re in
# the Ray path, RE2 in the DuckDB oracle).  RE2's \b is ASCII-only while
# Python's is Unicode-aware, and a metacharacter in a term would need
# engine-specific escaping — restrict terms to ASCII word characters so the
# two engines cannot diverge (validated at import).
import re as _re

_BAD = [t for t in GAZETTEER if not _re.fullmatch(r"[A-Za-z0-9_]+", t)]
if _BAD:  # explicit raise — an assert would vanish under `python -O`
    raise ValueError(
        f"gazetteer terms must be ASCII word chars (\\b parity): {_BAD}"
    )

# surface → canonical surface (alias merge during canonicalization).
ALIASES: dict[str, str] = {
    "agg": "aggregate",
    "dup": "duplicate",
    "col": "column",
}


@dataclass
class PipelineConfig:
    """Knobs for the KG pipeline stages (scale-facing defaults).

    batch sizes are rows-per-batch for map_batches; concurrency is the actor
    pool size for stateful stages (tokenizer/model).  Defaults target a
    32-CPU node; on a cluster, concurrency scales with total cores.
    """

    max_seq_len: int = 128          # truncation cap (run_bert_crf.py:379-381)
    tag_batch_size: int = 256       # rows per model batch
    tag_concurrency: int | tuple = 4  # model actor pool size
    encode_batch_size: int = 1024
    # NOTE: on a fused actor stage, batch_size also sets TASK granularity
    # against pre-fusion input rows — 2048 collapsed the sf0.1 gazetteer
    # scan to 2-3 tasks on 32 CPUs.  256 docs (~256 KB text) per regex
    # batch keeps per-call overhead negligible while giving the scheduler
    # enough tasks to fill the pool at any corpus size.
    mention_batch_size: int = 256
    triple_partitions: int = 16     # output partitions (hash(subj) % N)
    salt_buckets: int = 8           # sub-buckets for hot subjects
    minhash_perm: int = 64
    minhash_bands: int = 16
    seed: int = 42
    gazetteer: dict[str, str] = field(default_factory=lambda: dict(GAZETTEER))
    aliases: dict[str, str] = field(default_factory=lambda: dict(ALIASES))
