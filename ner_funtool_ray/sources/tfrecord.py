"""TFRecord interop (SURVEY §2.1 S9 / §2.2 K1) — pure numpy/stdlib.

The reference round-trips encoded features through TFRecord files:
`run_bert_crf.py:436-467` serializes ``tf.train.Example`` records whose
``Int64List`` features are the fixed-width ``input_ids / input_mask /
segment_ids / label_ids`` vectors, and `run_bert_crf.py:470-502` reads
them back as the Estimator input.  Ray Data ships ``read_tfrecords`` /
``write_tfrecords`` but they hard-depend on the ``crc32c`` wheel, which
is absent here — so this module implements the two PUBLIC formats they
wrap, from their specifications:

- the TFRecord framing (little-endian u64 length, masked-CRC32C of the
  length, payload, masked-CRC32C of the payload; mask =
  ``((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff``);
- the ``Example``/``Features``/``Feature`` protobuf messages
  (Int64List / FloatList / BytesList), encoded packed and parsed both
  packed and unpacked.

CRC32C (Castagnoli, reflected poly 0x82F63B78) is table-driven
slice-by-8, verified against the RFC 3720 check vector.  A user of the
reference can point ``read_tfrecords`` at their existing training
shards and get a Ray ``Dataset`` of the same feature columns; the write
path emits one ``part-<sha>.tfrecord`` per block (deterministic names —
the resumable-output layout)."""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa

import ray.data

__all__ = [
    "crc32c",
    "encode_example",
    "decode_example",
    "write_tfrecord_file",
    "read_tfrecord_file",
    "write_tfrecords",
    "read_tfrecords",
]


# --- CRC32C (slice-by-8) ----------------------------------------------------

def _build_tables() -> np.ndarray:
    poly = np.uint32(0x82F63B78)
    t = np.zeros((8, 256), dtype=np.uint32)
    for i in range(256):
        crc = np.uint32(i)
        for _ in range(8):
            crc = (crc >> np.uint32(1)) ^ (
                poly if crc & np.uint32(1) else np.uint32(0)
            )
        t[0, i] = crc
    for k in range(1, 8):
        for i in range(256):
            prev = t[k - 1, i]
            t[k, i] = (prev >> np.uint32(8)) ^ t[0, prev & np.uint32(0xFF)]
    return t


_T = _build_tables()
_TL = [[int(x) for x in row] for row in _T]  # plain-int tables (faster loop)


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli) of ``data`` — slice-by-8 table walk."""
    crc = 0xFFFFFFFF
    n = len(data)
    i = 0
    t = _TL
    while n - i >= 8:
        crc ^= (
            data[i]
            | data[i + 1] << 8
            | data[i + 2] << 16
            | data[i + 3] << 24
        )
        crc = (
            t[7][crc & 0xFF]
            ^ t[6][(crc >> 8) & 0xFF]
            ^ t[5][(crc >> 16) & 0xFF]
            ^ t[4][crc >> 24]
            ^ t[3][data[i + 4]]
            ^ t[2][data[i + 5]]
            ^ t[1][data[i + 6]]
            ^ t[0][data[i + 7]]
        )
        i += 8
    t0 = t[0]
    while i < n:
        crc = (crc >> 8) ^ t0[(crc ^ data[i]) & 0xFF]
        i += 1
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return ((c >> 15 | c << 17) + 0xA282EAD8) & 0xFFFFFFFF


# --- minimal protobuf codec for tf.train.Example ----------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _ld(field: int, payload: bytes) -> bytes:
    """length-delimited field (wire type 2)."""
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _encode_feature(value) -> bytes:
    """One ``Feature``: int64_list (field 3) for integer sequences,
    float_list (field 2) for floats, bytes_list (field 1) for bytes/str."""
    if isinstance(value, (bytes, str)):
        value = [value]
    value = list(value)
    if value and isinstance(value[0], (bytes, str)):
        body = b"".join(
            _ld(1, v.encode() if isinstance(v, str) else v) for v in value
        )
        return _ld(1, body)
    if value and isinstance(value[0], (float, np.floating)):
        body = _ld(1, struct.pack(f"<{len(value)}f", *value))
        return _ld(2, body)
    body = _ld(1, b"".join(_varint(int(v) & 0xFFFFFFFFFFFFFFFF)
                           for v in value))
    return _ld(3, body)


def encode_example(features: dict) -> bytes:
    """``tf.train.Example`` bytes for one feature dict — the exact
    message `run_bert_crf.py:456-466` writes (Features map of
    Int64List values; float/bytes lists supported for generality).
    Keys are emitted in sorted order (deterministic bytes)."""
    entries = b"".join(
        _ld(1, _ld(1, k.encode()) + _ld(2, _encode_feature(v)))
        for k, v in sorted(features.items())
    )
    return _ld(1, entries)


def _decode_int64_list(buf: bytes) -> list[int]:
    out: list[int] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # packed
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            while pos < end:
                v, pos = _read_varint(buf, pos)
                out.append(v - (1 << 64) if v >= 1 << 63 else v)
        elif field == 1 and wire == 0:  # unpacked
            v, pos = _read_varint(buf, pos)
            out.append(v - (1 << 64) if v >= 1 << 63 else v)
        else:
            raise ValueError(f"unexpected Int64List field {field}/{wire}")
    return out


def _decode_float_list(buf: bytes) -> list[float]:
    out: list[float] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # packed fixed32s
            ln, pos = _read_varint(buf, pos)
            out.extend(struct.unpack(f"<{ln // 4}f", buf[pos : pos + ln]))
            pos += ln
        elif field == 1 and wire == 5:
            out.append(struct.unpack("<f", buf[pos : pos + 4])[0])
            pos += 4
        else:
            raise ValueError(f"unexpected FloatList field {field}/{wire}")
    return out


def _decode_bytes_list(buf: bytes) -> list[bytes]:
    out: list[bytes] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        if tag != (1 << 3 | 2):
            raise ValueError("unexpected BytesList field")
        ln, pos = _read_varint(buf, pos)
        out.append(buf[pos : pos + ln])
        pos += ln
    return out


def _decode_feature(buf: bytes):
    pos = 0
    tag, pos = _read_varint(buf, pos)
    field, wire = tag >> 3, tag & 7
    if wire != 2:
        raise ValueError("Feature kinds are length-delimited")
    ln, pos = _read_varint(buf, pos)
    body = buf[pos : pos + ln]
    if field == 3:
        return _decode_int64_list(body)
    if field == 2:
        return _decode_float_list(body)
    if field == 1:
        return _decode_bytes_list(body)
    raise ValueError(f"unknown Feature kind {field}")


def decode_example(buf: bytes) -> dict:
    """Parse one ``Example`` message into {name: list} (int64 / float /
    bytes lists)."""
    pos = 0
    tag, pos = _read_varint(buf, pos)
    if tag != (1 << 3 | 2):
        raise ValueError("not an Example (features field missing)")
    ln, pos = _read_varint(buf, pos)
    feats = buf[pos : pos + ln]
    out: dict = {}
    pos = 0
    while pos < len(feats):
        tag, pos = _read_varint(feats, pos)
        if tag != (1 << 3 | 2):
            raise ValueError("Features map entries are field 1")
        ln, pos = _read_varint(feats, pos)
        entry = feats[pos : pos + ln]
        pos += ln
        epos = 0
        key = None
        val = None
        while epos < len(entry):
            etag, epos = _read_varint(entry, epos)
            eln, epos = _read_varint(entry, epos)
            body = entry[epos : epos + eln]
            epos += eln
            if etag >> 3 == 1:
                key = body.decode()
            elif etag >> 3 == 2:
                val = _decode_feature(body)
        out[key] = val
    return out


# --- file framing ------------------------------------------------------------

def write_tfrecord_file(path: str, examples: list[dict]) -> int:
    """Serialize feature dicts as framed ``Example`` records; returns
    the record count."""
    with open(path, "wb") as f:
        for ex in examples:
            payload = encode_example(ex)
            ln = struct.pack("<Q", len(payload))
            f.write(ln)
            f.write(struct.pack("<I", _masked_crc(ln)))
            f.write(payload)
            f.write(struct.pack("<I", _masked_crc(payload)))
    return len(examples)


def _iter_records(buf: bytes, verify_crc: bool = True):
    pos = 0
    n = len(buf)
    while pos < n:
        (ln,) = struct.unpack_from("<Q", buf, pos)
        (lcrc,) = struct.unpack_from("<I", buf, pos + 8)
        if verify_crc and _masked_crc(buf[pos : pos + 8]) != lcrc:
            raise ValueError(f"TFRecord length CRC mismatch at byte {pos}")
        payload = buf[pos + 12 : pos + 12 + ln]
        (pcrc,) = struct.unpack_from("<I", buf, pos + 12 + ln)
        if verify_crc and _masked_crc(payload) != pcrc:
            raise ValueError(f"TFRecord payload CRC mismatch at byte {pos}")
        yield payload
        pos += 16 + ln


def read_tfrecord_file(path: str, verify_crc: bool = True) -> list[dict]:
    with open(path, "rb") as f:
        buf = f.read()
    return [decode_example(p) for p in _iter_records(buf, verify_crc)]


# --- Ray Data plumbing -------------------------------------------------------

def write_tfrecords(
    ds: "ray.data.Dataset", out_dir: str, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Distributed K1: each block serializes its rows to ONE
    ``part-<sha256(payload)[:16]>.tfrecord`` in ``out_dir`` — the
    content-addressed resumable layout (a rerun rewrites identical
    bytes to identical names).  Returns the manifest Dataset
    (path, n_records); consume it to drive the write."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        cols = columns or batch.column_names
        rows = [
            {c: batch[c][i].as_py() for c in cols}
            for i in range(batch.num_rows)
        ]
        blob = bytearray()
        for ex in rows:
            payload = encode_example(ex)
            ln = struct.pack("<Q", len(payload))
            blob += ln
            blob += struct.pack("<I", _masked_crc(ln))
            blob += payload
            blob += struct.pack("<I", _masked_crc(payload))
        name = hashlib.sha256(bytes(blob)).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.tfrecord")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(bytes(blob))
        os.replace(tmp, path)  # atomic: a crashed task leaves no partial
        return pa.table(
            {
                "path": pa.array([path], type=pa.string()),
                "n_records": pa.array([len(rows)], type=pa.int64()),
            }
        )

    return ds.map_batches(write_block, batch_format="pyarrow")


def read_tfrecords(
    paths: str | list[str], verify_crc: bool = True
) -> "ray.data.Dataset":
    """Distributed S9: ``read_binary_files`` (one task per shard, the
    streaming read) → per-file Example parse into list columns.  Int64
    features come back as ``list<int64>`` (`run_bert_crf.py:473-478`
    casts to int32 in the model input — the taggers do the same)."""

    def parse(batch: pa.Table) -> pa.Table:
        out_rows: list[dict] = []
        for blob in batch["bytes"].to_pylist():
            for payload in _iter_records(blob, verify_crc):
                out_rows.append(decode_example(payload))
        if not out_rows:
            return pa.table({})
        keys = sorted(out_rows[0])
        cols = {}
        for k in keys:
            v0 = out_rows[0][k]
            if v0 and isinstance(v0[0], bytes):
                typ = pa.list_(pa.binary())
            elif v0 and isinstance(v0[0], float):
                typ = pa.list_(pa.float32())
            else:
                typ = pa.list_(pa.int64())
            cols[k] = pa.array([r[k] for r in out_rows], type=typ)
        return pa.table(cols)

    files = ray.data.read_binary_files(paths)
    return files.map_batches(parse, batch_format="pyarrow")


def roundtrip_doc_features(sf_dir: str) -> "ray.data.Dataset":
    """Oracle-backed S9/K1 surface: project the documents table to
    int64 features (doc_id, n_chars), serialize through real TFRecord
    files (write → fresh read in a unique scratch dir), and return the
    read-back table — identity by construction, so the DuckDB twin is
    the plain projection.  Proves the full serialize → frame → CRC →
    parse path over Ray blocks."""
    import tempfile

    from ner_funtool_ray.sources.io import read_parquet_auto

    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_feats(b: pa.Table) -> pa.Table:
        lst = pa.list_(pa.int64())
        return pa.table(
            {
                "doc_id": pa.array(
                    [[v] for v in b["doc_id"].to_pylist()], type=lst
                ),
                "n_chars": pa.array(
                    [[len(t or "")] for t in b["text"].to_pylist()], type=lst
                ),
            }
        )

    out_dir = tempfile.mkdtemp(prefix="ner_funtool_tfrec_")
    feats = ds.map_batches(to_feats, batch_format="pyarrow")
    write_tfrecords(feats, out_dir).materialize()  # drive the write

    def flatten(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    [v[0] for v in b["doc_id"].to_pylist()], type=pa.int64()
                ),
                "n_chars": pa.array(
                    [v[0] for v in b["n_chars"].to_pylist()], type=pa.int64()
                ),
            }
        )

    return read_tfrecords(out_dir).map_batches(flatten, batch_format="pyarrow")
