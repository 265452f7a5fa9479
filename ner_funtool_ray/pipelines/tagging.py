"""Model-path pipelines: numpy BiLSTM+CRF / cascade tagging over the corpus
(SURVEY §3.3 Ray restatement) + metric pipelines.

``read_parquet → ingest → sentence split → NerTagger actor pool → span
decode → canonicalize → triples`` — the serving path of the reference
(`predict_bert_crf.py` dev_offline / `infer_offline.py`) re-expressed as a
streaming Dataset pipeline; metrics follow `tag_evaluating` /
`entity_evaluating` semantics as distributed aggregates.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from ner_funtool_ray.corpus import corpus_from_documents
from ner_funtool_ray.metrics.entity_metrics import entity_metrics
from ner_funtool_ray.metrics.tag_metrics import tag_report
from ner_funtool_ray.stages.canonicalize import canonicalize
from ner_funtool_ray.stages.decode import decode_mentions
from ner_funtool_ray.stages.gazetteer import gold_tag_sentences
from ner_funtool_ray.stages.ingest import ingest
from ner_funtool_ray.stages.materialize import all_triples
from ner_funtool_ray.stages.sentence import split_to_sentences
from ner_funtool_ray.stages.tag import tag_sentences
from ner_funtool_ray.utils import pa_from_pandas

MAX_SEQ_LEN = 128


def tagged_sentences(
    sf_dir: str,
    cascade: bool = False,
    model: str = "bilstm",
    concurrency=None,
    use_crf: bool = True,
) -> "ray.data.Dataset":
    """sf documents → sentence rows + pred_tags (model actor pool).

    ``model``: ``bilstm`` (T2, lstm_crf) or ``bert`` (T3/T4 numpy
    transformer, the reference's bert_crf / cascade_bert_crf configs)."""
    # fine READ split (no shuffle): the model actor pool's task
    # parallelism is gated by upstream block count — the default 10-block
    # mid-table split left 20 of 30 actors idle (measured; the
    # scaled_model_triples job hit the same wall).  ~80 docs/task keeps
    # per-task model time ~0.3 s, well above scheduling overhead.
    sents = split_to_sentences(
        ingest(corpus_from_documents(sf_dir, rows_per_block=80))
    )
    return tag_sentences(
        sents,
        cascade=cascade,
        model=model,
        max_seq_len=MAX_SEQ_LEN,
        concurrency=concurrency,
        use_crf=use_crf,
    )


def model_mentions(
    sf_dir: str,
    cascade: bool = False,
    model: str = "bilstm",
    use_crf: bool = True,
) -> "ray.data.Dataset":
    """Model-detected mentions with provenance + canonical entity ids."""
    mentions = decode_mentions(
        tagged_sentences(sf_dir, cascade, model, use_crf=use_crf)
    )
    return canonicalize(mentions)


def model_triples(
    sf_dir: str, cascade: bool = False, model: str = "bilstm"
) -> "ray.data.Dataset":
    return all_triples(model_mentions(sf_dir, cascade, model))


def scaled_model_triples(
    sf_dir: str, replication: int = 64, cascade: bool = False
) -> "ray.data.Dataset":
    """Scaling-benchmark job: the model-path pipeline over a ×replication
    corpus (each input row replicated with distinct doc ids).  Replication
    happens inside map_batches — one disk read, honest downstream compute —
    so the job is dominated by BiLSTM+CRF inference + the triple shuffles,
    i.e. the parts that must scale with cluster size."""
    import pyarrow as pa

    from ner_funtool_ray.corpus import _derive_batch
    from ner_funtool_ray.sources.io import read_parquet_auto

    base = read_parquet_auto(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        rows_per_block=25,  # many read blocks → the fused replicate→tag
        # chain gets fine-grained tasks (~200) that fill every core
    )

    def replicate(batch: pa.Table) -> pa.Table:
        tables = []
        for r in range(replication):
            t = batch.set_column(
                batch.schema.get_field_index("doc_id"),
                "doc_id",
                pa.compute.add(batch["doc_id"], 10_000_000 * r),
            )
            tables.append(t)
        return pa.concat_tables(tables)

    corpus = base.map_batches(replicate, batch_format="pyarrow").map_batches(
        _derive_batch, batch_format="pyarrow"
    )
    # batch_size counts PRE-replicate rows (the fused chain replicates
    # inside the task); fixed-size actor pool (cpus-2) skips autoscale
    # ramp-up, leaving two cores for the task-based stages.
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # ~60/40 split between the model actor pool and the task stages
    # (decode/partials/sorts) that stream concurrently with it — a pool of
    # cpus-2 starves the task stages and serializes the pipeline tail.
    pool = max(2, round(cpus * 0.6))
    mentions = canonicalize(
        decode_mentions(
            tag_sentences(
                split_to_sentences(ingest(corpus)),
                cascade=cascade,
                max_seq_len=MAX_SEQ_LEN,
                # 64 source rows/task (~78 tasks at x96): measured optimum —
                # halving to 32 ADDED ~27 s at 30 CPUs (per-task fused-chain
                # overhead beats the wave-quantization saving)
                batch_size=64,
                concurrency=(pool, pool),
            )
        )
    )
    # raised cap: the x96 summary (~4M rows) driver-assembles in ~2s,
    # replacing two all-to-all barriers whose fixed latency is the
    # dominant non-compute phase of this job (r2 Amdahl attribution)
    return all_triples(mentions, driver_cap=5_000_000)


def _tag_pairs(sf_dir: str, cascade: bool = False) -> "ray.data.Dataset":
    """Aligned (gold_tag, pred_tag) char rows: gold = gazetteer BMES tags,
    pred = model tags; both truncated to MAX_SEQ_LEN (gold/pred stay in the
    same row → positional zip, no shuffle — SURVEY §2.5 J3)."""
    tagged = tagged_sentences(sf_dir, cascade)
    both = gold_tag_sentences(tagged, max_seq_len=MAX_SEQ_LEN)

    def flatten(batch: pa.Table) -> pa.Table:
        golds: list[str] = []
        preds: list[str] = []
        for g, p in zip(
            batch["gold_tags"].to_pylist(), batch["pred_tags"].to_pylist()
        ):
            n = min(len(g), len(p))
            golds.extend(g[:n])
            preds.extend(p[:n])
        return pa.table(
            {
                "gold_tag": pa.array(golds, type=pa.string()),
                "pred_tag": pa.array(preds, type=pa.string()),
            }
        )

    return both.map_batches(flatten, batch_format="pyarrow")


def predict_interactive(
    texts: list[str],
    cascade: bool = False,
    model: str = "bilstm",
    max_seq_len: int = MAX_SEQ_LEN,
) -> list[list[tuple[str, str, int, int]]]:
    """Serving-path convenience: texts → per-text typed spans, in-process
    (the reference's one-sentence-at-a-time predict loop,
    `predict_bert_crf.py:226-267` / `infer_online.py:242-309`, without the
    gRPC hop — the model runs in-process; batch serving uses the actor-pool
    stage instead)."""
    import pyarrow as pa

    from ner_funtool_ray.functions.spans import decode_bmes
    from ner_funtool_ray.functions.text import split_sentences
    from ner_funtool_ray.stages.tag import _TAGGER_CLASSES

    tagger = _TAGGER_CLASSES[(model, cascade)](max_seq_len=max_seq_len)
    results: list[list[tuple[str, str, int, int]]] = []
    for text in texts:
        sents = split_sentences(text) or [""]
        out = tagger(pa.table({"sentence": sents}))
        spans: list[tuple[str, str, int, int]] = []
        offset = 0
        for sent, tags in zip(sents, out["pred_tags"].to_pylist()):
            spans.extend(
                (typ, surf, s, e) for typ, surf, s, e in decode_bmes(sent, tags)
            )
            offset += len(sent)
        results.append(spans)
    return results


def tag_metrics_report(
    sf_dir: str, cascade: bool = False, remove_o: bool = True
) -> pd.DataFrame:
    """Per-tag (tag, precision, recall, f1, support) + avg/total row,
    model-vs-gazetteer — reference ``Metrics`` math (tag_evaluating.py)."""
    return tag_report(_tag_pairs(sf_dir, cascade), remove_o=remove_o)


def wol_sentence_losses(sf_dir: str, concurrency=None) -> "ray.data.Dataset":
    """T5 surface: sentence rows + ``wol_loss`` — the WOL weighted CE
    (`run_bert_wol.py:575-589` rule, eval-time) of the cascade BMEO
    logits against gazetteer-gold labels.  Actor-pool stage like
    ``tag_sentences`` (weights once per actor)."""
    import ray

    from ner_funtool_ray.stages.tag import WolScorer

    # fine read split for the same pool-starvation reason as
    # tagged_sentences (model actor pool behind a 10-block default read)
    sents = split_to_sentences(
        ingest(corpus_from_documents(sf_dir, rows_per_block=80))
    )
    both = gold_tag_sentences(sents, max_seq_len=MAX_SEQ_LEN)
    if concurrency is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        n = max(1, cpus - 2)
        concurrency = (n, n)
    return both.map_batches(
        WolScorer,
        fn_constructor_kwargs={"max_seq_len": MAX_SEQ_LEN},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )


def wol_loss_report(sf_dir: str) -> pd.DataFrame:
    """One-row WOL eval report: sentence count + mean weighted loss.
    The mean is computed from per-block partial sums merged in sorted
    order on the driver (block count is bounded), so the float total is
    deterministic run-to-run."""
    scored = wol_sentence_losses(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        v = np.asarray(batch["wol_loss"], dtype=np.float64)
        return pa.table(
            {
                "s": pa.array([float(v.sum())]),
                "n": pa.array([len(v)], type=pa.int64()),
            }
        )

    parts = scored.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    total = float(sum(sorted(parts["s"].tolist())))
    return pd.DataFrame(
        {"n_sentences": [n], "mean_wol_loss": [total / n if n else 0.0]}
    )


def entity_metrics_report(sf_dir: str, cascade: bool = False) -> pd.DataFrame:
    """One-row (precision, recall, f1) at entity level, model-vs-gazetteer —
    reference ``entity_metrics`` math (entity_evaluating.py:60-81)."""
    tagged = gold_tag_sentences(
        tagged_sentences(sf_dir, cascade), max_seq_len=MAX_SEQ_LEN
    )

    def project(batch: pa.Table) -> pa.Table:
        chars = [
            (t or "")[:MAX_SEQ_LEN] for t in batch["sentence"].to_pylist()
        ]
        return pa.table(
            {
                "chars": pa.array(chars, type=pa.string()),
                "gold_tags": batch["gold_tags"],
                "pred_tags": batch["pred_tags"],
            }
        )

    p, r, f1 = entity_metrics(tagged.map_batches(project, batch_format="pyarrow"))
    return pd.DataFrame({"precision": [p], "recall": [r], "f1": [f1]})


def ensemble_mentions(sf_dir: str, n_buckets: int = 16) -> "ray.data.Dataset":
    """Model-ensemble diagnostics → per ``entity_type``:
    ``(entity_type, n_bilstm, n_bert, n_agree)`` where ``n_agree`` counts
    spans BOTH model paths emit with the same (row, sentence, offsets,
    type) — the inter-model agreement audit a serving ensemble publishes
    (with the repo's seeded stand-in weights the agreement is small by
    construction; the report's SHAPE, not its magnitude, is the
    contract, which is why this is the rows-only surface).

    Distributed intersection: both mention tables hash-bucket by
    ``row_id`` (a span lives in exactly one bucket), the per-bucket
    inner merge on (row_id, sent_id, start, end, entity_type) counts the
    agreed spans, and the per-type partials merge in one tiny groupby —
    mention tables are corpus-mention-sized, never joined on the
    driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    cols = ["row_id", "sent_id", "start", "end", "surface", "entity_type"]

    def side(kind: int):
        def f(batch: pa.Table) -> pa.Table:
            df = batch.select(cols).to_pandas()
            df["kind"] = np.int8(kind)
            df["bucket"] = (
                df["row_id"].to_numpy().astype(np.uint64)
                % np.uint64(n_buckets)
            ).astype(np.int64)
            return pa_from_pandas(df, preserve_index=False)

        return f

    # materialize each side BEFORE the union: the two model actor pools
    # would otherwise start concurrently and can starve each other of
    # CPUs at low core counts (observed deadlock at num_cpus=8)
    a = (
        model_mentions(sf_dir)
        .map_batches(side(0), batch_format="pyarrow")
        .materialize()
    )
    b = (
        model_mentions(sf_dir, model="bert")
        .map_batches(side(1), batch_format="pyarrow")
        .materialize()
    )

    key = ["row_id", "sent_id", "start", "end", "entity_type"]

    def agree(group: pd.DataFrame) -> pa.Table:
        x = group[group["kind"] == 0].drop_duplicates(key)
        y = group[group["kind"] == 1].drop_duplicates(key)
        m = x[key].merge(y[key], on=key, how="inner")
        parts = []
        for df, col in ((x, "n_bilstm"), (y, "n_bert"), (m, "n_agree")):
            c = (
                df.groupby("entity_type", sort=False)
                .size()
                .rename(col)
                .reset_index()
            )
            parts.append(c.set_index("entity_type"))
        out = (
            pd.concat(parts, axis=1)
            .fillna(0)
            .astype(np.int64)
            .reset_index()
        )
        return pa_from_pandas(out, preserve_index=False)

    from ner_funtool_ray.stages.groupagg import bucketed_group_sum

    per_bucket = (
        a.union(b).groupby("bucket").map_groups(agree, batch_format="pandas")
    )
    return bucketed_group_sum(
        per_bucket,
        ["entity_type"],
        sum_cols={"n_bilstm": "n_bilstm", "n_bert": "n_bert",
                  "n_agree": "n_agree"},
        count_col=None,
        driver_cap=2_000_000,
    )

def siamese_sentence_sims(
    sf_dir: str, concurrency=None
) -> "ray.data.Dataset":
    """Neighbor-sentence similarity via the twin-tower siamese ALBERT
    (`bert/modeling_google_albert.py:282` AlbertModelSiamese — shared
    encoder, per-tower pooler): every pair of CONSECUTIVE sentence rows
    within a read block scored to ``sim_ppm`` (integer cosine ×1e6, so
    the result hashes stably).  The corpus splits to one sentence per
    document, so this is an adjacent-document similarity profile — the
    sentence-pair scoring surface the siamese model exists for, driven
    over a deterministic pairing (fixed ``rows_per_block`` read order).
    Output (row_id_a, row_id_b, sim_ppm).  Rows-only: model scoring is
    not SQL-expressible; the scorer itself is batch-composition-parity
    tested.  Actor-pool stage like ``tag_sentences`` (weights once per
    actor)."""
    import ray

    from ner_funtool_ray.stages.tag import SiameseSimilarityScorer

    sents = split_to_sentences(
        ingest(corpus_from_documents(sf_dir, rows_per_block=80))
    )

    def pairize(t: pa.Table) -> pa.Table:
        rid = t["row_id"].to_pylist()
        sent = t["sentence"].to_pylist()
        return pa.table(
            {
                "row_id_a": pa.array(rid[:-1], type=pa.int64()),
                "row_id_b": pa.array(rid[1:], type=pa.int64()),
                "text_a": pa.array(sent[:-1], type=pa.string()),
                "text_b": pa.array(sent[1:], type=pa.string()),
            }
        )

    # batch_size=None → whole blocks, so a doc's sentence run is never
    # split mid-pair by the default batch size
    pairs = sents.map_batches(pairize, batch_format="pyarrow", batch_size=None)
    if concurrency is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        n = max(1, cpus - 2)
        concurrency = (n, n)
    return pairs.map_batches(
        SiameseSimilarityScorer,
        fn_constructor_kwargs={"max_seq_len": MAX_SEQ_LEN},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    ).select_columns(["row_id_a", "row_id_b", "sim_ppm"])

def bm25_siamese_rerank(
    sf_dir: str,
    terms: tuple[str, ...] = ("data", "join", "merge"),
    k_bm25: int = 50,
    k: int = 10,
    concurrency=None,
) -> pd.DataFrame:
    """Two-stage neural retrieval: exact-integer BM25 recall (top
    ``k_bm25``) re-ranked by the siamese twin-tower pair scorer — the
    standard retrieve-then-rerank pipeline, with the reranker's query
    tower fed ``" ".join(terms)`` and the doc tower the candidate text.

    Scale shape: the corpus STREAMS through both stages (BM25's two
    passes, then a broadcast candidate-id filter — only the ≤``k_bm25``
    survivor rows reach the model pool); the final sort is over
    ``k_bm25`` rows on the driver.  Deterministic end-to-end (integer
    BM25 + bit-deterministic sim_ppm; ties broken by doc_id).
    Rows-only: model scoring is not SQL-expressible."""
    import ray

    from ner_funtool_ray.pipelines.curation import bm25_search
    from ner_funtool_ray.sources.io import read_parquet_auto
    from ner_funtool_ray.stages.tag import SiameseSimilarityScorer

    cand = bm25_search(sf_dir, terms=terms, k=k_bm25).to_pandas()
    score_by_id = dict(zip(cand["doc_id"], cand["score"]))
    ids_ref = ray.put(score_by_id)
    query = " ".join(terms)

    def pick(t: pa.Table) -> pa.Table:
        lut = ray.get(ids_ref)
        ids = t["doc_id"].to_pylist()
        keep = [i for i, d in enumerate(ids) if d in lut]
        sub = t.take(pa.array(keep, type=pa.int64()))
        return pa.table(
            {
                "doc_id": sub["doc_id"].cast(pa.int64()),
                "bm25_score": pa.array(
                    [lut[d] for d in sub["doc_id"].to_pylist()],
                    type=pa.int64(),
                ),
                "text_a": pa.array(
                    [query] * sub.num_rows, type=pa.string()
                ),
                "text_b": sub["text"].cast(pa.string()),
            }
        )

    docs = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    scored = docs.map_batches(pick, batch_format="pyarrow").map_batches(
        SiameseSimilarityScorer,
        fn_constructor_kwargs={"max_seq_len": MAX_SEQ_LEN},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency or 2,
    )
    out = scored.select_columns(
        ["doc_id", "bm25_score", "sim_ppm"]
    ).to_pandas()
    out = out.sort_values(
        ["sim_ppm", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return out.reset_index(drop=True)
