"""TFRecord interop (S9/K1): CRC32C against published check vectors,
Example protobuf round-trips (packed + unpacked parsing, all three list
kinds), file framing with corruption detection, the distributed Ray
write→read path, and the oracle-twin identity of the query surface."""

import struct

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ner_funtool_ray.sources.tfrecord import (
    crc32c,
    decode_example,
    encode_example,
    read_tfrecord_file,
    read_tfrecords,
    roundtrip_doc_features,
    write_tfrecord_file,
    write_tfrecords,
)

SF = "/root/testdata/sf0.001"


def test_crc32c_check_vectors():
    # RFC 3720 / iSCSI published vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(b"") == 0
    assert crc32c(bytes(range(32))) == 0x46DD794E
    # slice-by-8 boundary lengths agree with the byte-at-a-time tail
    for n in (1, 7, 8, 9, 15, 16, 17, 64):
        data = bytes((i * 7 + 3) % 256 for i in range(n))
        ref = 0xFFFFFFFF
        for b in data:  # independent byte-at-a-time reference
            ref ^= b
            for _ in range(8):
                ref = (ref >> 1) ^ (0x82F63B78 if ref & 1 else 0)
        assert crc32c(data) == ref ^ 0xFFFFFFFF, n


def test_example_round_trip_reference_shape():
    """The exact record shape run_bert_crf.py:456-466 writes: four
    fixed-width Int64List features."""
    ex = {
        "input_ids": list(range(128)),
        "input_mask": [1] * 100 + [0] * 28,
        "segment_ids": [0] * 128,
        "label_ids": [5, 0, 34] + [0] * 125,
    }
    assert decode_example(encode_example(ex)) == ex


def test_example_round_trip_kinds_and_negatives():
    ex = {"f": [1.5, -2.25], "s": [b"abc", b""], "i": [-1, 0, 1 << 40]}
    out = decode_example(encode_example(ex))
    assert out["i"] == [-1, 0, 1 << 40]  # two's-complement varint
    assert out["s"] == [b"abc", b""]
    assert out["f"] == pytest.approx([1.5, -2.25])


def test_unpacked_int64_parsing():
    """proto2-style unpacked repeated int64 (tag+varint per element)
    must parse to the same list as the packed encoding."""
    # Int64List{value: [7, 300]} unpacked: (field1,varint)=tag 0x08
    unpacked = b"\x08\x07\x08\xac\x02"
    feature = b"\x1a" + bytes([len(unpacked)]) + unpacked  # field 3 LD
    entry = b"\x0a\x01k" + b"\x12" + bytes([len(feature)]) + feature
    example = b"\x0a" + bytes([len(entry) + 2]) + b"\x0a" + bytes(
        [len(entry)]
    ) + entry
    # build the Features wrapper properly: Example.features(field1) LD
    feats = b"\x0a" + bytes([len(entry)]) + entry
    example = b"\x0a" + bytes([len(feats)]) + feats
    assert decode_example(example) == {"k": [7, 300]}


def test_file_framing_and_corruption_detection(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    exs = [{"a": [i, i + 1]} for i in range(10)]
    assert write_tfrecord_file(path, exs) == 10
    assert read_tfrecord_file(path) == exs
    blob = bytearray(open(path, "rb").read())
    (ln,) = struct.unpack_from("<Q", blob, 0)
    blob[12 + ln] ^= 0xFF  # first record's stored payload CRC
    bad = str(tmp_path / "bad.tfrecord")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="CRC mismatch"):
        read_tfrecord_file(bad)
    # verify_crc=False skips the guard; payload bytes are intact
    assert read_tfrecord_file(bad, verify_crc=False) == exs


def test_ray_write_read_round_trip(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    lst = pa.list_(pa.int64())
    t = pa.table(
        {
            "doc_id": pa.array([[i] for i in range(200)], type=lst),
            "vals": pa.array([[i, i * i] for i in range(200)], type=lst),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    manifest = write_tfrecords(ds, out).to_pandas()
    assert manifest["n_records"].sum() == 200
    assert all(p.endswith(".tfrecord") for p in manifest["path"])
    back = read_tfrecords(out).to_pandas().sort_values(
        by="doc_id", key=lambda s: s.map(lambda v: v[0])
    )
    assert len(back) == 200
    assert [v[0] for v in back["doc_id"]] == list(range(200))
    assert list(back["vals"].iloc[3]) == [3, 9]


def test_content_addressed_shards_are_rerun_stable(ray_session, tmp_path):
    """Same data → same shard names (the resumable-output property):
    writing twice into the same dir leaves exactly one file set."""
    out = str(tmp_path / "stable")
    lst = pa.list_(pa.int64())
    t = pa.table({"a": pa.array([[1], [2], [3]], type=lst)})
    ds = ray.data.from_arrow(t)
    m1 = sorted(write_tfrecords(ds, out).to_pandas()["path"])
    m2 = sorted(write_tfrecords(ds, out).to_pandas()["path"])
    assert m1 == m2
    import os

    assert sorted(
        os.path.join(out, f) for f in os.listdir(out)
    ) == m1


def test_roundtrip_doc_features_is_identity(ray_session):
    from ner_funtool_ray.sources.io import read_parquet_auto

    got = roundtrip_doc_features(SF).to_pandas().sort_values("doc_id")
    src = read_parquet_auto(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    exp = (
        src.assign(n_chars=src["text"].str.len())[["doc_id", "n_chars"]]
        .sort_values("doc_id")
    )
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_chars"].tolist() == exp["n_chars"].tolist()
