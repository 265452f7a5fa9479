"""P2+P3 fused encode+tag actor stage (SURVEY §2.4 T1-T4, §7.3).

One actor class holds vocab + model weights (loaded ONCE in ``__init__``)
and does per-batch: char→id encode (``sentence2id`` semantics), dynamic
pad-to-batch-max (``pad_sequences`` semantics, `data_preprocess.py:228-242`),
numpy BiLSTM(+cascade) forward, CRF Viterbi decode, id→tag mapping.
Encode and tag are fused so the wide fixed-width id columns never
materialize in the object store (SURVEY §7.3 last bullet).

The same class doubles as the single-process oracle: call it directly on a
pyarrow table — batch-invariance of the model (tested) makes Ray-vs-serial
parity exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ner_funtool_ray.functions.spans import trans_label_row
from ner_funtool_ray.model.bilstm_crf import (
    BiLstmCrf,
    CascadeTagger,
    init_weights,
    load_weights,
)
from ner_funtool_ray.model.vocabs import (
    BMEO,
    CASCADE_ATTRS,
    TAGS,
    default_char_vocab,
)

_UNK_ID = 1  # SPECIALS index of <UNK>


class NerTagger:
    """map_batches callable: sentence rows → + pred_tags (list<string>).

    Stateful actor-pool stage: weights/vocabs built or loaded once per
    actor.  ``weights_path`` loads an .npz checkpoint (FIXTURES.md F5);
    otherwise seed-fixed weights are generated — identical in every actor.
    """

    def __init__(
        self,
        weights_path: str | None = None,
        max_seq_len: int = 128,
        seed: int = 7,
        text_col: str = "sentence",
        out_col: str = "pred_tags",
        use_crf: bool = True,
    ):
        self.char2id = default_char_vocab()
        # vectorized encode: codepoint → id lookup table (BMP; astral →
        # UNK), built once per actor.  Replaces the per-char dict.get loop.
        self._lut = np.full(0x10000, _UNK_ID, dtype=np.int32)
        for ch, idx in self.char2id.items():
            cp = ord(ch) if len(ch) == 1 else None
            if cp is not None and cp < 0x10000:
                self._lut[cp] = idx
        self.id2tag = dict(enumerate(TAGS))
        self.max_seq_len = max_seq_len
        self.text_col = text_col
        self.out_col = out_col
        if weights_path:
            w = load_weights(weights_path)
        else:
            w = init_weights(
                vocab_size=len(self.char2id),
                emb_dim=32,
                hidden=48,
                n_tags=len(TAGS),
                seed=seed,
            )
        # use_crf=False → softmax-argmax decode (`use_crf` flag,
        # `run_multitask_bert_crf.py:71-76` / lstm_crf_layer softmax branch)
        self.model = BiLstmCrf(w, use_crf=use_crf)

    def _encode(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        ids = [
            [self.char2id.get(c, _UNK_ID) for c in (t or "")[: self.max_seq_len]]
            for t in texts
        ]
        lengths = np.array([len(s) for s in ids], dtype=np.int32)
        S = max(1, int(lengths.max()) if len(lengths) else 1)
        mat = np.zeros((len(ids), S), dtype=np.int32)
        for i, s in enumerate(ids):
            mat[i, : len(s)] = s
        return mat, lengths

    def _decode_ids(self, paths: np.ndarray, lengths: np.ndarray) -> list[list[str]]:
        return [
            [self.id2tag[int(t)] for t in paths[i, : int(lengths[i])]]
            for i in range(paths.shape[0])
        ]

    def _encode_one(self, text: str) -> np.ndarray:
        """char→id via the codepoint LUT (vectorized; astral chars → UNK,
        matching dict.get fallback since the vocab is BMP-only)."""
        t = (text or "")[: self.max_seq_len]
        if not t:
            return np.empty(0, dtype=np.int32)
        cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        return self._lut[np.minimum(cps, 0xFFFF) * (cps < 0x10000)]

    def _predict_texts(self, texts: list[str], chunk: int = 128):
        """Length-bucketed chunked inference: sort by length, run the model
        on ≤chunk-row slices (cache-friendly; padding = slice max, not batch
        max — SURVEY §7.3 length-bucketing item), scatter back to input
        order.  Returns (per-row tag-id lists, lengths)."""
        ids = [self._encode_one(t) for t in texts]
        lengths = np.array([len(s) for s in ids], dtype=np.int32)
        order = np.argsort(lengths, kind="stable")
        out_paths: list[np.ndarray | None] = [None] * len(ids)
        for lo in range(0, len(order), chunk):
            sel = order[lo : lo + chunk]
            sl = lengths[sel]
            S = max(1, int(sl.max()) if len(sl) else 1)
            mat = np.zeros((len(sel), S), dtype=np.int32)
            for k, row in enumerate(sel):
                mat[k, : lengths[row]] = ids[row]
            paths = self.model.predict(mat, sl)
            for k, row in enumerate(sel):
                out_paths[row] = paths[k]
        return out_paths, lengths

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if not texts:
            return batch.append_column(
                self.out_col, pa.array([], type=pa.list_(pa.string()))
            )
        paths, lengths = self._predict_texts(texts)
        tags = [
            [self.id2tag[int(t)] for t in paths[i][: int(lengths[i])]]
            for i in range(len(texts))
        ]
        return batch.append_column(
            self.out_col, pa.array(tags, type=pa.list_(pa.string()))
        )


class CascadeNerTagger(NerTagger):
    """Cascade variant: BMEO head (CRF) + attr head (argmax), combined via
    ``trans_label`` O-propagation (`run_multitask_bert_crf.py:632-650`,
    `ner_utils.py:9-39`).  Emits pred_tags plus the raw bmeo/attr streams."""

    def __init__(self, weights_path: str | None = None, max_seq_len: int = 128,
                 seed: int = 23, text_col: str = "sentence",
                 out_col: str = "pred_tags"):
        super().__init__(None, max_seq_len, seed, text_col, out_col)
        if weights_path:
            w = load_weights(weights_path)
        else:
            w = init_weights(
                vocab_size=len(self.char2id),
                emb_dim=32,
                hidden=48,
                n_tags=len(BMEO),
                n_attrs=len(CASCADE_ATTRS),
                seed=seed,
            )
        self.model = CascadeTagger(w)
        self.id2bmeo = dict(enumerate(BMEO))
        self.id2attr = dict(enumerate(CASCADE_ATTRS))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        lst = pa.list_(pa.string())
        if not texts:
            for c in ("bmeo_tags", "attr_tags", self.out_col):
                batch = batch.append_column(c, pa.array([], type=lst))
            return batch
        # length-bucketed chunks, like NerTagger._predict_texts (cache-
        # friendly; results identical by model batch-invariance)
        mat, lengths = self._encode(texts)
        order = np.argsort(lengths, kind="stable")
        bmeo_rows: list = [None] * len(texts)
        attr_rows: list = [None] * len(texts)
        chunk = 128
        for lo in range(0, len(order), chunk):
            sel = order[lo : lo + chunk]
            sl = lengths[sel]
            S = max(1, int(sl.max()) if len(sl) else 1)
            sub = mat[sel][:, :S]
            b_ids, a_ids = self.model.predict_cascade(sub, sl)
            for k, row in enumerate(sel):
                bmeo_rows[row] = b_ids[k]
                attr_rows[row] = a_ids[k]
        bmeo = [
            [self.id2bmeo[int(t)] for t in bmeo_rows[i][: int(lengths[i])]]
            for i in range(len(texts))
        ]
        attr = [
            [self.id2attr[int(t)] for t in attr_rows[i][: int(lengths[i])]]
            for i in range(len(texts))
        ]
        combined = [trans_label_row(b, a) for b, a in zip(bmeo, attr)]
        batch = batch.append_column("bmeo_tags", pa.array(bmeo, type=lst))
        batch = batch.append_column("attr_tags", pa.array(attr, type=lst))
        return batch.append_column(self.out_col, pa.array(combined, type=lst))


class WolScorer(CascadeNerTagger):
    """T5 eval surface (`run_bert_wol.py:575-589`): per-sentence WOL
    weighted cross-entropy of the cascade BMEO logits against
    gazetteer-gold BMEO labels, appended as a ``wol_loss`` float column.

    The weighting is the reference's exact ``masks_of_entity + 0.5``
    rule (`model/wol.py`); positions beyond each row's true length are
    masked out of both sums so the score is independent of chunk padding
    (batch-invariance → exact Ray-vs-serial parity; the reference's
    training-time formula skips that mask, a train-only quirk documented
    in ``model/wol.py``).  Consumes rows carrying ``sentence`` +
    ``gold_tags`` (``stages/gazetteer.gold_tag_sentences`` output)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ner_funtool_ray.model.wol import wol_weighted_ce

        texts = batch[self.text_col].to_pylist()
        if not texts:
            return batch.append_column(
                "wol_loss", pa.array([], type=pa.float64())
            )
        golds = batch["gold_tags"].to_pylist()
        bmeo2id = {t: i for i, t in enumerate(BMEO)}
        mat, lengths = self._encode(texts)
        losses = np.zeros(len(texts), dtype=np.float64)
        order = np.argsort(lengths, kind="stable")
        chunk = 128
        for lo in range(0, len(order), chunk):
            sel = order[lo : lo + chunk]
            sl = lengths[sel]
            S = max(1, int(sl.max()) if len(sl) else 1)
            sub = mat[sel][:, :S]
            logits = self.model.logits(sub, sl)  # BMEO head
            labels = np.zeros((len(sel), S), dtype=np.int64)
            for k, row in enumerate(sel):
                g = golds[row][: int(sl[k])]
                labels[k, : len(g)] = [
                    bmeo2id.get((t or "O").split("-")[0], 0) for t in g
                ]
            losses[sel] = wol_weighted_ce(
                logits, labels, o_index=0, lengths=sl
            )
        return batch.append_column("wol_loss", pa.array(losses))


class BertNerTagger:
    """T3 actor: sentence rows → + pred_tags via the numpy TRANSFORMER
    encoder + CRF head (`run_bert_crf.py:505-542` structure), consuming
    wordpiece features (M1-M6 semantics):

    - each char is one "word"; its wordpiece first piece carries the tag,
      continuation pieces are ``X`` (`run_bert_crf.py:367-377`);
    - ``[CLS]``/``[SEP]`` wrap with their own label ids; Viterbi runs over
      the full special-augmented tag space, then predictions are realigned
      to chars by taking each char's FIRST-piece tag and stripping
      CLS/SEP/X (`predict_bert_crf.py:158-173` semantics);
    - dynamic pad-to-chunk-max (the reference pads to a fixed 128; padding
      is masked either way, and attention is O(S²) so chunk-local padding
      is the scale-correct choice — documented deviation).

    Stateful actor-pool stage: tokenizer vocab + transformer weights built
    (or ``.npz``-loaded) once per actor; ``predict`` is a pure function of
    the weights, so Ray-vs-serial parity is exact.
    """

    def __init__(
        self,
        weights_path: str | None = None,
        max_seq_len: int = 128,
        seed: int = 11,
        text_col: str = "sentence",
        out_col: str = "pred_tags",
        use_albert: bool = False,
        use_lstm: bool = False,
        use_crf: bool = True,
    ):
        from ner_funtool_ray.functions.tokenization import FullTokenizer
        from ner_funtool_ray.model.transformer import (
            AlbertCrf,
            BertBilstmCrf,
            BertCrf,
            init_albert_weights,
            init_bert_bilstm_weights,
            init_transformer_weights,
        )
        from ner_funtool_ray.model.vocabs import (
            BERT_TAGS,
            default_wordpiece_vocab,
        )

        if use_albert and use_lstm:
            raise ValueError(
                "use_albert and use_lstm are mutually exclusive "
                "(mirrors run_bert_crf.py:89 vs run_multitask_bert_crf.py:71)"
            )
        self.vocab = default_wordpiece_vocab()
        self.tokenizer = FullTokenizer(self.vocab)
        self.label_list = list(BERT_TAGS)
        self.id2tag = dict(enumerate(self.label_list))
        self.max_seq_len = max_seq_len
        self.text_col = text_col
        self.out_col = out_col
        # encoder variant flags mirror the reference's:
        # ``use_albert`` (`run_bert_crf.py:89`) swaps in the
        # ALBERT-structured encoder (shared layer group + factorized
        # embeddings); ``use_lstm`` (`run_multitask_bert_crf.py:71-76`)
        # stacks the BiLSTM head (`lstm_crf_layer.py` crf_only=False)
        if use_albert:
            model_cls, init_fn = AlbertCrf, init_albert_weights
        elif use_lstm:
            model_cls, init_fn = BertBilstmCrf, init_bert_bilstm_weights
        else:
            model_cls, init_fn = BertCrf, init_transformer_weights
        if weights_path:
            w = load_weights(weights_path)
        else:
            w = init_fn(
                vocab_size=len(self.vocab),
                n_tags=len(self.label_list),
                max_position=max_seq_len + 2,
                seed=seed,
            )
        self.model = model_cls(w, use_crf=use_crf)
        self._cls = self.vocab["[CLS]"]
        self._sep = self.vocab["[SEP]"]
        # char → piece-id list memo: single chars tokenize deterministically
        # and repeat constantly (tokenize-per-char measured ~35% of stage
        # time before caching); built lazily per actor
        self._piece_cache: dict[str, list[int]] = {}

    def _char_piece_ids(self, ch: str) -> list[int]:
        ids = self._piece_cache.get(ch)
        if ids is None:
            ids = self.tokenizer.convert_tokens_to_ids(
                self.tokenizer.tokenize(ch)
            )
            self._piece_cache[ch] = ids
        return ids

    def _encode_one(self, text: str) -> tuple[list[int], list[int]]:
        """chars → (piece ids incl CLS/SEP, per-char first-piece position
        or −1 for chars that produce no piece, e.g. whitespace)."""
        cap = self.max_seq_len - 2
        ids: list[int] = []
        first: list[int] = []
        for ch in text or "":
            piece_ids = self._char_piece_ids(ch)
            if not piece_ids:
                first.append(-1)
                continue
            if len(ids) + len(piece_ids) > cap:
                break
            first.append(len(ids))
            ids.extend(piece_ids)
        return [self._cls] + ids + [self._sep], first

    def _model_tags(self, texts: list[str]) -> list[list[str]]:
        encoded = [self._encode_one(t) for t in texts]
        lengths = np.array([len(e[0]) for e in encoded], dtype=np.int32)
        order = np.argsort(lengths, kind="stable")
        paths: list[np.ndarray | None] = [None] * len(texts)
        chunk = 64  # attention is O(S²) — smaller chunks than the BiLSTM
        for lo in range(0, len(order), chunk):
            sel = order[lo : lo + chunk]
            sl = lengths[sel]
            S = max(2, int(sl.max()) if len(sl) else 2)
            mat = np.zeros((len(sel), S), dtype=np.int32)
            mask = np.zeros((len(sel), S), dtype=np.int32)
            for k, row in enumerate(sel):
                ids = encoded[row][0]
                mat[k, : len(ids)] = ids
                mask[k, : len(ids)] = 1
            out = self.model.predict(mat, mask)
            for k, row in enumerate(sel):
                paths[row] = out[k]
        tags_out: list[list[str]] = []
        for (ids, first), path in zip(encoded, paths):
            row_tags: list[str] = []
            for pos in first:
                if pos < 0:
                    row_tags.append("O")
                    continue
                lab = self.id2tag[int(path[1 + pos])]  # +1 skips [CLS]
                # specials can win the argmax at a real position — they
                # carry no span semantics, realign to O (M10 strip rule)
                row_tags.append(
                    lab if lab not in ("X", "[CLS]", "[SEP]") else "O"
                )
            tags_out.append(row_tags)
        return tags_out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        lst = pa.list_(pa.string())
        if not texts:
            return batch.append_column(self.out_col, pa.array([], type=lst))
        return batch.append_column(
            self.out_col, pa.array(self._model_tags(texts), type=lst)
        )


class BertCascadeNerTagger(BertNerTagger):
    """T4 actor: shared transformer encoder → BMEO-CRF head + attr-argmax
    head, combined via ``trans_label`` O-propagation
    (`run_multitask_bert_crf.py:606-653`, `ner_utils.py:9-39`).  Emits
    pred_tags plus the raw bmeo/attr streams like :class:`CascadeNerTagger`."""

    def __init__(self, weights_path: str | None = None, max_seq_len: int = 128,
                 seed: int = 17, text_col: str = "sentence",
                 out_col: str = "pred_tags"):
        # seed 17 picked from a sweep: it yields a rich mention stream from
        # the stand-in weights (seeds vary 45-327 non-O tags on the same
        # fixture; a sparse head exercises little of the decode path)
        from ner_funtool_ray.model.transformer import (
            BertCascade,
            init_transformer_weights,
        )
        from ner_funtool_ray.model.vocabs import BERT_BMEO, CASCADE_ATTRS

        super().__init__(None, max_seq_len, seed, text_col, out_col)
        self.bmeo_list = list(BERT_BMEO)
        self.id2bmeo = dict(enumerate(self.bmeo_list))
        self.id2attr = dict(enumerate(CASCADE_ATTRS))
        if weights_path:
            w = load_weights(weights_path)
        else:
            w = init_transformer_weights(
                vocab_size=len(self.vocab),
                n_tags=len(self.bmeo_list),
                n_attrs=len(CASCADE_ATTRS),
                max_position=max_seq_len + 2,
                seed=seed,
            )
        self.model = BertCascade(w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        lst = pa.list_(pa.string())
        if not texts:
            for c in ("bmeo_tags", "attr_tags", self.out_col):
                batch = batch.append_column(c, pa.array([], type=lst))
            return batch
        encoded = [self._encode_one(t) for t in texts]
        lengths = np.array([len(e[0]) for e in encoded], dtype=np.int32)
        order = np.argsort(lengths, kind="stable")
        b_paths: list = [None] * len(texts)
        a_paths: list = [None] * len(texts)
        chunk = 64
        for lo in range(0, len(order), chunk):
            sel = order[lo : lo + chunk]
            sl = lengths[sel]
            S = max(2, int(sl.max()) if len(sl) else 2)
            mat = np.zeros((len(sel), S), dtype=np.int32)
            mask = np.zeros((len(sel), S), dtype=np.int32)
            for k, row in enumerate(sel):
                ids = encoded[row][0]
                mat[k, : len(ids)] = ids
                mask[k, : len(ids)] = 1
            b_ids, a_ids = self.model.predict_cascade(mat, mask)
            for k, row in enumerate(sel):
                b_paths[row] = b_ids[k]
                a_paths[row] = a_ids[k]
        bmeo_out: list[list[str]] = []
        attr_out: list[list[str]] = []
        comb_out: list[list[str]] = []
        for (ids, first), bp, ap in zip(encoded, b_paths, a_paths):
            b_row: list[str] = []
            a_row: list[str] = []
            for pos in first:
                if pos < 0:
                    b_row.append("O")
                    a_row.append("O")
                    continue
                b = self.id2bmeo[int(bp[1 + pos])]
                b_row.append(b if b not in ("X", "[CLS]", "[SEP]") else "O")
                a_row.append(self.id2attr[int(ap[1 + pos])])
            bmeo_out.append(b_row)
            attr_out.append(a_row)
            comb_out.append(trans_label_row(b_row, a_row))
        batch = batch.append_column("bmeo_tags", pa.array(bmeo_out, type=lst))
        batch = batch.append_column("attr_tags", pa.array(attr_out, type=lst))
        return batch.append_column(self.out_col, pa.array(comb_out, type=lst))


class AlbertNerTagger(BertNerTagger):
    """T3 encoder variant: ALBERT-structured (``use_albert``,
    `run_bert_crf.py:89` / `bert/modeling_albert.py`) — shared layer
    group, factorized embeddings, same CRF head and realign rules."""

    def __init__(
        self,
        weights_path: str | None = None,
        max_seq_len: int = 128,
        seed: int = 13,
        text_col: str = "sentence",
        out_col: str = "pred_tags",
    ):
        super().__init__(
            weights_path, max_seq_len, seed, text_col, out_col,
            use_albert=True,
        )


class BertBilstmNerTagger(BertNerTagger):
    """T3 stacked variant: transformer encoder → BiLSTM → CRF
    (``use_lstm``, `run_multitask_bert_crf.py:71-76` /
    `layers/lstm_crf_layer.py` ``crf_only=False``)."""

    def __init__(
        self,
        weights_path: str | None = None,
        max_seq_len: int = 128,
        seed: int = 17,
        text_col: str = "sentence",
        out_col: str = "pred_tags",
    ):
        super().__init__(
            weights_path, max_seq_len, seed, text_col, out_col,
            use_lstm=True,
        )


class SiameseSimilarityScorer(BertNerTagger):
    """Sentence-PAIR actor: rows with two text columns → + ``sim_ppm``,
    the cosine similarity of the twin-tower pooled vectors as an integer
    part-per-million (hash-stable across batch compositions).  Model is
    the `modeling_google_albert.py:282` AlbertModelSiamese twin: shared
    ALBERT encoder, per-tower tanh pooler.  Each tower's chunk pads to
    its own max length — masked positions are inert and the pooler reads
    only the [CLS] position, so the score is independent of batching."""

    def __init__(
        self,
        weights_path: str | None = None,
        max_seq_len: int = 128,
        seed: int = 13,
        a_col: str = "text_a",
        b_col: str = "text_b",
        out_col: str = "sim_ppm",
    ):
        from ner_funtool_ray.functions.tokenization import FullTokenizer
        from ner_funtool_ray.model.transformer import (
            AlbertSiamese,
            init_albert_siamese_weights,
        )
        from ner_funtool_ray.model.vocabs import default_wordpiece_vocab

        self.vocab = default_wordpiece_vocab()
        self.tokenizer = FullTokenizer(self.vocab)
        self.max_seq_len = max_seq_len
        self.a_col = a_col
        self.b_col = b_col
        self.out_col = out_col
        if weights_path:
            w = load_weights(weights_path)
        else:
            w = init_albert_siamese_weights(
                vocab_size=len(self.vocab),
                max_position=max_seq_len + 2,
                seed=seed,
            )
        self.model = AlbertSiamese(w)
        self._cls = self.vocab["[CLS]"]
        self._sep = self.vocab["[SEP]"]
        self._piece_cache = {}

    _CHUNK = 64  # same O(S²) heap bound as the tagger stages

    def _pad_tower(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        # FIXED-shape padding (every chunk is (_CHUNK, max_seq_len) — rows
        # beyond the input are all-masked dummies): GEMM blocking varies
        # with matrix shape, so dynamic padding moved scores by ±1 ppm
        # depending on batch composition.  Fixed shapes make the integer
        # score bit-deterministic, and mirror the reference's own
        # pad-to-max_seq_length (`run_bert_crf.py:380-388`).
        S = self.max_seq_len
        mat = np.zeros((self._CHUNK, S), dtype=np.int32)
        mask = np.zeros((self._CHUNK, S), dtype=np.int32)
        for k, t in enumerate(texts):
            ids = self._encode_one(t)[0]
            mat[k, : len(ids)] = ids
            mask[k, : len(ids)] = 1
        return mat, mask

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch[self.a_col].to_pylist()
        b = batch[self.b_col].to_pylist()
        if not a:
            return batch.append_column(
                self.out_col, pa.array([], type=pa.int64())
            )
        out = np.empty(len(a), dtype=np.int64)
        for lo in range(0, len(a), self._CHUNK):
            n = len(a[lo : lo + self._CHUNK])
            ids1, m1 = self._pad_tower(a[lo : lo + self._CHUNK])
            ids2, m2 = self._pad_tower(b[lo : lo + self._CHUNK])
            sims = self.model.similarity(ids1, m1, ids2, m2)[:n]
            out[lo : lo + n] = np.rint(sims * 1_000_000).astype(np.int64)
        return batch.append_column(self.out_col, pa.array(out))


_TAGGER_CLASSES = {
    ("bilstm", False): NerTagger,
    ("bilstm", True): CascadeNerTagger,
    ("bert", False): BertNerTagger,
    ("bert", True): BertCascadeNerTagger,
    ("albert", False): AlbertNerTagger,
    ("bert_lstm", False): BertBilstmNerTagger,
}


def tag_sentences(
    sentences: "ray.data.Dataset",
    cascade: bool = False,
    model: str = "bilstm",
    weights_path: str | None = None,
    batch_size: int = 256,
    concurrency=None,
    max_seq_len: int = 128,
    use_crf: bool = True,
    bundle: str | None = None,
) -> "ray.data.Dataset":
    """Actor-pool tagging stage.  ``model`` selects the encoder family:
    ``bilstm`` (T2, `model_lstm_crf.py`) or ``bert`` (T3/T4 transformer,
    `run_bert_crf.py:505-542` / `run_multitask_bert_crf.py:572-653`);
    ``cascade`` selects the BMEO+attr two-head variant; ``bundle`` runs
    an exported K7 bundle directory instead (each actor loads the
    sha-checked bundle once in ``__init__``).  concurrency ×
    num_cpus sizes the pool (default: autoscale to cluster CPUs);
    batch_size bounds the (B, S) dense matrices per actor heap."""
    if concurrency is None:
        # FIXED pool size (min == max): autoscaling from 1 actor made the
        # wall time bimodal (2× spread run-to-run) because scale-up
        # decisions lag queue pressure; the model stage dominates its
        # pipelines, so claim the node minus headroom for the raylet and
        # the task stages up front.
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        n = max(1, cpus - 2)
        concurrency = (n, n)
    if bundle is not None:
        from ner_funtool_ray.model.export import BundleTagger

        return sentences.map_batches(
            BundleTagger,
            fn_constructor_kwargs={"bundle": bundle},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    cls = _TAGGER_CLASSES[(model, cascade)]
    kwargs = {"weights_path": weights_path, "max_seq_len": max_seq_len}
    if not use_crf:
        # softmax-argmax decode (the reference's use_crf=False branch);
        # the cascade heads already define their own decode split
        if cascade:
            raise ValueError(
                "use_crf=False applies to the single-head taggers only"
            )
        kwargs["use_crf"] = False
    return sentences.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
