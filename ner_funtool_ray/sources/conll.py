"""CoNLL-style TSV sources (SURVEY §2.1 S1-S3, S14).

Reference parser semantics (`run_bert_crf.py:242-293` `_read_data` /
`public_tools/data_preprocess.py:18-74` `read_corpus`): one ``char\\ttag``
per line, blank line = sentence boundary.  Multitask variant (S2,
`run_multitask_bert_crf.py:258-320`) splits composite tags into boundary +
attr streams (single-part tags → attr 'O').

Ray shape: whole files are read as binary (``read_binary_files`` with
paths) and split inside ``map_batches`` — sentence boundaries never cross
block boundaries because the file is the unit of work.  For corpora bigger
than one file per task, pre-shard to many files (the layout the reference's
data dirs already use).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ner_funtool_ray.functions.spans import split_label


def parse_conll_text(text: str) -> list[tuple[list[str], list[str]]]:
    """One file's text → [(chars, tags)] sentence records."""
    sentences: list[tuple[list[str], list[str]]] = []
    chars: list[str] = []
    tags: list[str] = []
    for line in text.split("\n"):
        line = line.rstrip("\r")
        if not line.strip():
            if chars:
                sentences.append((chars, tags))
                chars, tags = [], []
            continue
        parts = line.split("\t")
        if len(parts) == 1:  # resume_ner-style space-separated (S14)
            parts = line.split()
        if len(parts) >= 2:
            chars.append(parts[0])
            tags.append(parts[-1])
    if chars:
        sentences.append((chars, tags))
    return sentences


def _files_to_sentences(batch: pa.Table, multitask: bool) -> pa.Table:
    lst = pa.list_(pa.string())
    paths: list[str] = []
    sent_ids: list[int] = []
    chars_col: list[list[str]] = []
    tags_col: list[list[str]] = []
    bmeo_col: list[list[str]] = []
    attr_col: list[list[str]] = []
    for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
        text = data.decode("utf-8", errors="replace")
        for i, (chars, tags) in enumerate(parse_conll_text(text)):
            paths.append(path)
            sent_ids.append(i)
            chars_col.append(chars)
            tags_col.append(tags)
            if multitask:
                pairs = [split_label(t) for t in tags]
                bmeo_col.append([b for b, _ in pairs])
                attr_col.append([a for _, a in pairs])
    cols = {
        "path": pa.array(paths, type=pa.string()),
        "sent_id": pa.array(sent_ids, type=pa.int64()),
        "chars": pa.array(chars_col, type=lst),
        "tags": pa.array(tags_col, type=lst),
    }
    if multitask:
        cols["bmeo_tags"] = pa.array(bmeo_col, type=lst)
        cols["attr_tags"] = pa.array(attr_col, type=lst)
    return pa.table(cols)


def read_conll(paths, multitask: bool = False) -> "ray.data.Dataset":
    """CoNLL file(s) → sentence rows (path, sent_id, chars, tags[, bmeo_tags,
    attr_tags])."""
    files = ray.data.read_binary_files(paths, include_paths=True)
    return files.map_batches(
        _files_to_sentences, fn_kwargs={"multitask": multitask},
        batch_format="pyarrow",
    )


def infer_tag_vocab(sentences: "ray.data.Dataset") -> dict[str, int]:
    """Schema inference path (`read_corpus(save_tags=True)`,
    `data_preprocess.py:64-73`): distinct tags over the corpus → tag2label
    with 'O' first (id 0), rest sorted — derived via a flat_map +
    ``unique`` (small result, driver-side dict)."""

    def tags_only(batch: pa.Table) -> pa.Table:
        flat = [t for row in batch["tags"].to_pylist() for t in row]
        return pa.table({"tag": pa.array(sorted(set(flat)), type=pa.string())})

    distinct = sentences.map_batches(tags_only, batch_format="pyarrow").unique("tag")
    ordered = ["O"] + sorted(t for t in distinct if t != "O")
    return {t: i for i, t in enumerate(ordered)}


def write_conll(table: pa.Table, path: str, chars_col: str = "chars",
                tags_col: str = "tags") -> None:
    """Sentence rows → CoNLL TSV file (inverse of parse; test fixture aid)."""
    with open(path, "w", encoding="utf-8") as f:
        for chars, tags in zip(
            table[chars_col].to_pylist(), table[tags_col].to_pylist()
        ):
            for c, t in zip(chars, tags):
                f.write(f"{c}\t{t}\n")
            f.write("\n")
