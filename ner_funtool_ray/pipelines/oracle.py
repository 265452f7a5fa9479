"""Single-process oracle for the model-path KG pipeline (SURVEY §7.2 item 2).

Recomputes the ENTIRE model path — corpus derivation, ingest, sentence
split, BiLSTM+CRF tagging, span decode, canonicalization, triple
aggregation — serially with plain pandas/pyarrow, sharing only the leaf
*functions* (model, decoders, splitters) with the Ray stages, never the
Dataset machinery.  The north-rule triple P/R target (≥ 0.95 vs reference
semantics) is exact-equality by construction here: the Ray pipeline and
this oracle must emit IDENTICAL triple sets (tested).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd
import pyarrow.parquet as pq

from ner_funtool_ray.config import ALIASES
from ner_funtool_ray.functions.spans import decode_bmes
from ner_funtool_ray.functions.text import split_sentences
from ner_funtool_ray.stages.ingest import stable_id64
from ner_funtool_ray.stages.tag import NerTagger


def serial_model_triples(sf_dir: str, max_seq_len: int = 128) -> pd.DataFrame:
    """documents.parquet → (subj, pred, obj, weight), fully serial."""
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    ).to_pylist()
    tagger = NerTagger(max_seq_len=max_seq_len)

    appears: Counter[tuple[str, str]] = Counter()
    doc_entities: dict[int, set[str]] = {}
    # serial loop: one doc at a time (the shape the reference's scripts use)
    for row in docs:
        repo = f"repos/{row['source']}"
        path = f"src/doc_{row['doc_id']}.txt"
        commit = hashlib.sha256(f"commit:{row['doc_id']}".encode()).hexdigest()[:40]
        row_id = stable_id64(repo, path, commit)
        ents: set[str] = set()
        sents = split_sentences(row["text"] or "")
        if sents:
            import pyarrow as pa

            out = tagger(pa.table({"sentence": sents}))
            for sent, tags in zip(sents, out["pred_tags"].to_pylist()):
                for _typ, surface, _s, _e in decode_bmes(sent, tags):
                    norm = surface.lower().strip()
                    canon = ALIASES.get(norm, norm)
                    ent = f"ent:{canon}"
                    appears[(ent, repo)] += 1
                    ents.add(ent)
        doc_entities[row_id] = ents

    cooccur: Counter[tuple[str, str]] = Counter()
    for ents in doc_entities.values():
        ordered = sorted(ents)
        for i, a in enumerate(ordered):
            for b in ordered[i + 1 :]:
                cooccur[(a, b)] += 1

    rows = [
        {"subj": s, "pred": "appears_in", "obj": o, "weight": w}
        for (s, o), w in appears.items()
    ] + [
        {"subj": a, "pred": "cooccurs_with", "obj": b, "weight": w}
        for (a, b), w in cooccur.items()
    ]
    return pd.DataFrame(rows, columns=["subj", "pred", "obj", "weight"])


def triple_set_pr(
    got: pd.DataFrame, expect: pd.DataFrame
) -> tuple[float, float]:
    """Triple-set precision/recall over (subj, pred, obj, weight) tuples —
    the driver-facing P/R ≥ 0.95 harness."""
    g = set(map(tuple, got[["subj", "pred", "obj", "weight"]].itertuples(index=False)))
    e = set(map(tuple, expect[["subj", "pred", "obj", "weight"]].itertuples(index=False)))
    if not g or not e:
        return (0.0, 0.0) if g != e else (1.0, 1.0)
    inter = len(g & e)
    return inter / len(g), inter / len(e)
