"""TF1 tensor-bundle checkpoint interop — no TensorFlow dependency.

A user of the reference toolkit holds trained TF1 checkpoints
(`predict_bert_crf.py:127-128` ``saver.restore(sess, ckpt)``;
`train_lstm_crf.py:267-269` ``saver.save``) — this module makes those
weights loadable by the engine's numpy model families (and lets the engine
write checkpoints TF1 can restore), so the engine is a drop-in predictor
for existing reference models.

A TF ``Saver`` V2 checkpoint at ``prefix`` is two files:

- ``prefix.index`` — a LevelDB-format SSTable mapping tensor names to
  serialized ``BundleEntryProto`` records (dtype, shape, shard, offset,
  size, crc32c); key ``""`` holds the ``BundleHeaderProto``.
- ``prefix.data-00000-of-00001`` — concatenated little-endian raw tensor
  bytes addressed by the entries.

Both formats are public (LevelDB ``table_format.md``; TF
``tensor_bundle.proto`` / ``tensor_bundle.cc``) and implemented here from
the published specs: the SSTable reader/writer handles prefix-compressed
blocks, restart arrays, the 48-byte footer with the 0xdb4775248b80fb57
magic and masked-crc32c block trailers (crc32c reused from
`sources/tfrecord.py`); the protobuf wire codec is hand-rolled varint /
length-delimited / fixed32 for exactly the bundle messages.

Scope: single-shard, unsliced, no-compression checkpoints — what
``tf.train.Saver`` writes by default for the reference's model sizes.
Sharded/sliced/snappy inputs raise with a clear message.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ner_funtool_ray.sources.tfrecord import (
    _masked_crc,
    _read_varint,
    _varint,
)

_TABLE_MAGIC = 0xDB4775248B80FB57
_FOOTER_LEN = 48
_BLOCK_TRAILER_LEN = 5  # 1-byte compression type + 4-byte masked crc32c

# TF DataType enum (types.proto) <-> numpy, for the dtypes the reference
# models use (float32 weights, int32/int64 steps/ids, float64 for tests)
_DTYPE_TO_NP = {
    1: np.dtype("float32"),
    2: np.dtype("float64"),
    3: np.dtype("int32"),
    9: np.dtype("int64"),
}
_NP_TO_DTYPE = {v: k for k, v in _DTYPE_TO_NP.items()}


# ---------------------------------------------------------------------------
# protobuf wire codec (just what BundleHeaderProto / BundleEntryProto need)
# ---------------------------------------------------------------------------


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) — value is int for varint /
    fixed32 / fixed64, bytes for length-delimited."""
    pos, n = 0, len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:  # fixed32
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        elif wire == 1:  # fixed64
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        yield field, wire, val


def _encode_shape(shape: tuple[int, ...]) -> bytes:
    # TensorShapeProto { repeated Dim dim = 2; }  Dim { int64 size = 1; }
    out = b""
    for d in shape:
        dim = _tag(1, 0) + _varint(int(d))
        out += _tag(2, 2) + _varint(len(dim)) + dim
    return out


def _decode_shape(buf: bytes) -> tuple[int, ...]:
    dims: list[int] = []
    for field, _, val in _iter_fields(buf):
        if field == 2:  # dim
            size = 0
            for f2, _, v2 in _iter_fields(val):
                if f2 == 1:
                    size = v2
            dims.append(size)
        elif field == 3 and val:  # unknown_rank
            raise ValueError("unknown-rank tensor shape in checkpoint")
    return tuple(dims)


def _encode_entry(
    dtype: int, shape: tuple[int, ...], offset: int, size: int, crc: int
) -> bytes:
    # BundleEntryProto { DataType dtype=1; TensorShapeProto shape=2;
    #   int32 shard_id=3; int64 offset=4; int64 size=5; fixed32 crc32c=6; }
    out = _tag(1, 0) + _varint(dtype)
    sh = _encode_shape(shape)
    out += _tag(2, 2) + _varint(len(sh)) + sh
    if offset:
        out += _tag(4, 0) + _varint(offset)
    out += _tag(5, 0) + _varint(size)
    out += _tag(6, 5) + struct.pack("<I", crc)
    return out


def _decode_entry(buf: bytes) -> dict:
    e = {"dtype": 0, "shape": (), "shard_id": 0, "offset": 0, "size": 0,
         "crc32c": 0}
    for field, wire, val in _iter_fields(buf):
        if field == 1:
            e["dtype"] = val
        elif field == 2:
            e["shape"] = _decode_shape(val)
        elif field == 3:
            e["shard_id"] = val
        elif field == 4:
            e["offset"] = val
        elif field == 5:
            e["size"] = val
        elif field == 6:
            e["crc32c"] = val
        elif field == 7:
            raise ValueError(
                "sliced tensor checkpoints are not supported (partitioned "
                "variables); re-save unpartitioned"
            )
    return e


def _encode_header(num_shards: int = 1) -> bytes:
    # BundleHeaderProto { int32 num_shards=1; Endianness endianness=2;
    #   VersionDef version=3; }  VersionDef { int32 producer=1; }
    version = _tag(1, 0) + _varint(1)
    return (
        _tag(1, 0) + _varint(num_shards)
        + _tag(3, 2) + _varint(len(version)) + version
    )


def _decode_header(buf: bytes) -> dict:
    h = {"num_shards": 1, "endianness": 0}
    for field, _, val in _iter_fields(buf):
        if field == 1:
            h["num_shards"] = val
        elif field == 2:
            h["endianness"] = val
    return h


# ---------------------------------------------------------------------------
# LevelDB table (SSTable) reader / writer — uncompressed blocks
# ---------------------------------------------------------------------------


def _block_emit(contents: bytes) -> bytes:
    """Block contents + trailer: type byte 0 (no compression) + masked
    crc32c over contents+type (leveldb ``table_builder.cc`` layout)."""
    return contents + b"\x00" + struct.pack(
        "<I", _masked_crc(contents + b"\x00")
    )


def _build_block(entries: list[tuple[bytes, bytes]],
                 restart_interval: int = 16) -> bytes:
    """Prefix-compressed block: [shared][non_shared][value_len]
    [key_delta][value]... + restart offsets + count."""
    out = bytearray()
    restarts = []
    prev_key = b""
    for i, (key, value) in enumerate(entries):
        if i % restart_interval == 0:
            restarts.append(len(out))
            shared = 0
        else:
            shared = 0
            m = min(len(prev_key), len(key))
            while shared < m and prev_key[shared] == key[shared]:
                shared += 1
        out += _varint(shared)
        out += _varint(len(key) - shared)
        out += _varint(len(value))
        out += key[shared:]
        out += value
        prev_key = key
    if not restarts:
        restarts = [0]
    for r in restarts:
        out += struct.pack("<I", r)
    out += struct.pack("<I", len(restarts))
    return bytes(out)


def _parse_block(block: bytes) -> list[tuple[bytes, bytes]]:
    if len(block) < 4:
        raise ValueError("truncated table block")
    n_restarts = struct.unpack_from("<I", block, len(block) - 4)[0]
    data_end = len(block) - 4 - 4 * n_restarts
    if data_end < 0:
        raise ValueError("corrupt restart array in table block")
    entries: list[tuple[bytes, bytes]] = []
    pos, key = 0, b""
    while pos < data_end:
        shared, pos = _read_varint(block, pos)
        non_shared, pos = _read_varint(block, pos)
        value_len, pos = _read_varint(block, pos)
        key = key[:shared] + block[pos:pos + non_shared]
        pos += non_shared
        value = block[pos:pos + value_len]
        pos += value_len
        entries.append((key, value))
    return entries


def _read_raw_block(data: bytes, offset: int, size: int) -> bytes:
    contents = data[offset:offset + size]
    trailer = data[offset + size:offset + size + _BLOCK_TRAILER_LEN]
    if len(contents) != size or len(trailer) != _BLOCK_TRAILER_LEN:
        raise ValueError("truncated block in checkpoint index")
    comp = trailer[0]
    stored = struct.unpack("<I", trailer[1:])[0]
    if stored != _masked_crc(contents + bytes([comp])):
        raise ValueError("block checksum mismatch in checkpoint index")
    if comp == 0:
        return contents
    raise ValueError(
        f"compressed checkpoint index blocks (type {comp}) are not "
        "supported; TF writes bundle indexes uncompressed"
    )


def _read_table(path: str) -> dict[bytes, bytes]:
    """All key/value pairs of an SSTable (bundle indexes are small —
    one entry per tensor)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < _FOOTER_LEN:
        raise ValueError(f"{path}: too short for an SSTable footer")
    footer = data[-_FOOTER_LEN:]
    magic = struct.unpack("<Q", footer[40:])[0]
    if magic != _TABLE_MAGIC:
        raise ValueError(f"{path}: bad table magic {magic:#x}")
    pos = 0
    _, pos = _read_varint(footer, pos)   # metaindex offset
    _, pos = _read_varint(footer, pos)   # metaindex size
    index_off, pos = _read_varint(footer, pos)
    index_size, pos = _read_varint(footer, pos)
    out: dict[bytes, bytes] = {}
    for _, handle in _parse_block(_read_raw_block(data, index_off,
                                                  index_size)):
        hpos = 0
        off, hpos = _read_varint(handle, hpos)
        size, hpos = _read_varint(handle, hpos)
        for key, value in _parse_block(_read_raw_block(data, off, size)):
            out[key] = value
    return out


def _write_table(path: str, entries: list[tuple[bytes, bytes]],
                 block_size: int = 4096) -> None:
    """SSTable with uncompressed blocks; ``entries`` must be key-sorted."""
    buf = bytearray()
    index_entries: list[tuple[bytes, bytes]] = []
    pending: list[tuple[bytes, bytes]] = []
    pending_bytes = 0

    def flush():
        nonlocal pending, pending_bytes
        if not pending:
            return
        contents = _build_block(pending)
        handle = _varint(len(buf)) + _varint(len(contents))
        # index key: the block's last key is a valid separator
        index_entries.append((pending[-1][0], handle))
        buf.extend(_block_emit(contents))
        pending, pending_bytes = [], 0

    for key, value in entries:
        pending.append((key, value))
        pending_bytes += len(key) + len(value) + 8
        if pending_bytes >= block_size:
            flush()
    flush()

    meta_contents = _build_block([])
    meta_handle = _varint(len(buf)) + _varint(len(meta_contents))
    buf.extend(_block_emit(meta_contents))
    index_contents = _build_block(index_entries)
    index_handle = _varint(len(buf)) + _varint(len(index_contents))
    buf.extend(_block_emit(index_contents))
    footer = meta_handle + index_handle
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", _TABLE_MAGIC)
    buf.extend(footer)
    with open(path, "wb") as f:
        f.write(bytes(buf))


# ---------------------------------------------------------------------------
# checkpoint read / write
# ---------------------------------------------------------------------------


def _data_path(prefix: str, shard: int = 0, num_shards: int = 1) -> str:
    return f"{prefix}.data-{shard:05d}-of-{num_shards:05d}"


def write_tf_checkpoint(prefix: str, tensors: dict[str, np.ndarray]) -> None:
    """Write ``tensors`` as a single-shard TF1 V2 checkpoint at ``prefix``
    (creates ``prefix.index`` + ``prefix.data-00000-of-00001``)."""
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    names = sorted(tensors)
    data = bytearray()
    entries: list[tuple[bytes, bytes]] = [(b"", _encode_header())]
    for name in names:
        arr = np.asarray(tensors[name])
        shape = arr.shape  # before ascontiguousarray (it promotes 0-d)
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in _NP_TO_DTYPE:
            arr = arr.astype(np.float32)
        raw = arr.astype(arr.dtype.newbyteorder("<")).tobytes()
        entry = _encode_entry(
            dtype=_NP_TO_DTYPE[arr.dtype],
            shape=shape,
            offset=len(data),
            size=len(raw),
            crc=_masked_crc(raw),
        )
        data.extend(raw)
        entries.append((name.encode("utf-8"), entry))
    with open(_data_path(prefix), "wb") as f:
        f.write(bytes(data))
    _write_table(f"{prefix}.index", entries)


def read_tf_checkpoint(
    prefix: str, verify_crc: bool = True
) -> dict[str, np.ndarray]:
    """Load every tensor of a TF1 V2 checkpoint into numpy arrays."""
    table = _read_table(f"{prefix}.index")
    header = _decode_header(table.pop(b"", b""))
    if header["num_shards"] != 1:
        raise ValueError(
            f"multi-shard checkpoint ({header['num_shards']} shards) not "
            "supported; merge shards first"
        )
    if header["endianness"] != 0:
        raise ValueError("big-endian checkpoint not supported")
    with open(_data_path(prefix), "rb") as f:
        data = f.read()
    out: dict[str, np.ndarray] = {}
    for key, value in table.items():
        e = _decode_entry(value)
        if e["dtype"] not in _DTYPE_TO_NP:
            raise ValueError(
                f"tensor {key!r}: unsupported TF dtype {e['dtype']}"
            )
        raw = data[e["offset"]:e["offset"] + e["size"]]
        if len(raw) != e["size"]:
            raise ValueError(f"tensor {key!r}: data file truncated")
        if verify_crc and e["crc32c"] and _masked_crc(raw) != e["crc32c"]:
            raise ValueError(f"tensor {key!r}: data checksum mismatch")
        arr = np.frombuffer(raw, dtype=_DTYPE_TO_NP[e["dtype"]])
        out[key.decode("utf-8")] = arr.reshape(e["shape"]).copy()
    return out


# ---------------------------------------------------------------------------
# name mapping: reference TF graphs -> engine weight dicts
# ---------------------------------------------------------------------------

# reference BiLSTM+CRF graph (`model_lstm_crf.py:23-56`): variable scopes
# embedding_layer / encoder (bidirectional_dynamic_rnn) / projection; the
# engine's numpy LSTM already follows TF's i,g,f,o gate order and
# forget_bias=1.0, so kernels map 1:1
_BILSTM_NAME_MAP = {
    "embedding_layer/embedding_matrix": "embedding",
    "encoder/bidirectional_rnn/fw/lstm_cell/kernel": "lstm_fw_kernel",
    "encoder/bidirectional_rnn/fw/lstm_cell/bias": "lstm_fw_bias",
    "encoder/bidirectional_rnn/bw/lstm_cell/kernel": "lstm_bw_kernel",
    "encoder/bidirectional_rnn/bw/lstm_cell/bias": "lstm_bw_bias",
    "projection/dense/kernel": "proj_w",
    "projection/dense/bias": "proj_b",
    "projection/transitions": "crf_trans",
}


def bilstm_weights_from_tf(prefix: str) -> dict[str, np.ndarray]:
    """TF1 checkpoint of the reference BiLSTM+CRF graph → engine weight
    dict consumable by ``model/bilstm_crf.py:NerTagger``.

    Optimizer slots (``.../Adam``, ``.../Momentum``) and ``global_step``
    are skipped; a missing model variable raises by name."""
    tensors = read_tf_checkpoint(prefix)
    out: dict[str, np.ndarray] = {}
    for tf_name, ours in _BILSTM_NAME_MAP.items():
        if tf_name not in tensors:
            if ours == "crf_trans":
                # softmax variant (use_crf=False) has no transitions
                continue
            raise KeyError(
                f"checkpoint missing variable {tf_name!r} (wanted for "
                f"{ours!r}); found: {sorted(tensors)[:8]}..."
            )
        out[ours] = tensors[tf_name].astype(np.float32)
    return out


def _bert_layer_map(i: int) -> dict[str, str]:
    p = f"bert/encoder/layer_{i}/"
    return {
        p + "attention/self/query/kernel": f"l{i}_q_w",
        p + "attention/self/query/bias": f"l{i}_q_b",
        p + "attention/self/key/kernel": f"l{i}_k_w",
        p + "attention/self/key/bias": f"l{i}_k_b",
        p + "attention/self/value/kernel": f"l{i}_v_w",
        p + "attention/self/value/bias": f"l{i}_v_b",
        p + "attention/output/dense/kernel": f"l{i}_ao_w",
        p + "attention/output/dense/bias": f"l{i}_ao_b",
        p + "attention/output/LayerNorm/gamma": f"l{i}_attn_ln_g",
        p + "attention/output/LayerNorm/beta": f"l{i}_attn_ln_b",
        p + "intermediate/dense/kernel": f"l{i}_ff1_w",
        p + "intermediate/dense/bias": f"l{i}_ff1_b",
        p + "output/dense/kernel": f"l{i}_ff2_w",
        p + "output/dense/bias": f"l{i}_ff2_b",
        p + "output/LayerNorm/gamma": f"l{i}_out_ln_g",
        p + "output/LayerNorm/beta": f"l{i}_out_ln_b",
    }


_BERT_EMB_MAP = {
    "bert/embeddings/word_embeddings": "word_emb",
    "bert/embeddings/position_embeddings": "pos_emb",
    "bert/embeddings/token_type_embeddings": "type_emb",
    "bert/embeddings/LayerNorm/gamma": "emb_ln_g",
    "bert/embeddings/LayerNorm/beta": "emb_ln_b",
}

_BERT_HEAD_MAP = {
    "projection/dense/kernel": "proj_w",
    "projection/dense/bias": "proj_b",
    "projection/transitions": "crf_trans",
}


def bert_weights_from_tf(
    prefix: str, n_heads: int
) -> dict[str, np.ndarray]:
    """TF1 BERT(+CRF head) checkpoint → engine transformer weight dict
    (`model/transformer.py:init_transformer_weights` layout).

    Layer count is inferred from the ``bert/encoder/layer_N`` names;
    ``n_heads`` must be supplied (BERT checkpoints don't carry it — it
    lives in ``bert_config.json``).  The task head
    (`model_bert_crf.py:47-56` projection scope) maps when present, so a
    bare pretrained BERT imports too (head initialised separately)."""
    tensors = read_tf_checkpoint(prefix)
    n_layers = 0
    while f"bert/encoder/layer_{n_layers}/attention/self/query/kernel" \
            in tensors:
        n_layers += 1
    if n_layers == 0:
        raise KeyError(
            "no bert/encoder/layer_0 variables found; not a BERT checkpoint"
        )
    name_map = dict(_BERT_EMB_MAP)
    for i in range(n_layers):
        name_map.update(_bert_layer_map(i))
    out: dict[str, np.ndarray] = {
        "n_layers": np.array(n_layers),
        "n_heads": np.array(n_heads),
    }
    for tf_name, ours in name_map.items():
        if tf_name not in tensors:
            raise KeyError(f"checkpoint missing variable {tf_name!r}")
        out[ours] = tensors[tf_name].astype(np.float32)
    for tf_name, ours in _BERT_HEAD_MAP.items():
        if tf_name in tensors:
            out[ours] = tensors[tf_name].astype(np.float32)
    return out


__all__ = [
    "read_tf_checkpoint",
    "write_tf_checkpoint",
    "bilstm_weights_from_tf",
    "bert_weights_from_tf",
]
