"""Multimodal column plumbing (training-data ops): opaque binary payloads +
typed metadata, processed by actor-pool map_batches stages.

The image/audio codec libraries are not available in this container, so the
actual decode is STUBBED (clearly marked): ``decode_image`` raises
``NotImplementedError`` unless PIL is importable, and the pipeline defaults
to :class:`FakeImageCodec` — a deterministic stand-in that parses the
synthetic header produced by :func:`make_fake_image`.  Everything around the
stub — Arrow ``binary`` schema, small-batch sizing for large payloads,
actor signature, feature/resize output layout — is real and tested.

Scale note: binary payloads dominate block size; callers should lower
``batch_size`` (default 64 here vs 2048 for text) and rely on Arrow
``large_binary`` for >2 GiB blocks.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

MAGIC = b"FIMG"  # fake image header: MAGIC | u16 width | u16 height | pixels


def make_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic synthetic 'image': header + seeded u8 pixel payload."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return MAGIC + struct.pack("<HH", width, height) + pixels.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode path — requires an image codec library (not in this
    container).  Gated behind an import-try per the environment rules."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use FakeImageCodec for the plumbing path"
        ) from exc
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(payload)))


class FakeImageCodec:
    """Deterministic stand-in codec for the stubbed decode step."""

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:4] != MAGIC:
            raise ValueError("bad magic")
        w, h = struct.unpack("<HH", payload[4:8])
        return np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8).reshape(h, w)

    def resize(self, img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
        # nearest-neighbor — deterministic, library-free
        ys = (np.arange(out_h) * img.shape[0] // out_h).clip(0, img.shape[0] - 1)
        xs = (np.arange(out_w) * img.shape[1] // out_w).clip(0, img.shape[1] - 1)
        return img[np.ix_(ys, xs)]

    def encode(self, img: np.ndarray) -> bytes:
        h, w = img.shape
        return MAGIC + struct.pack("<HH", w, h) + img.astype(np.uint8).tobytes()


class ImageFeatures:
    """Actor-pool stage: (id, payload binary, …) → + (width, height,
    mean_intensity, phash) feature columns.  Codec constructed once per
    actor; per-batch work is numpy over decoded arrays."""

    def __init__(self, codec=None, payload_col: str = "payload"):
        self.codec = codec or FakeImageCodec()
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, means, phashes = [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            img = self.codec.decode(payload)
            h, w = img.shape
            widths.append(w)
            heights.append(h)
            means.append(float(img.mean()))
            small = self.codec.resize(img, 8, 8).astype(np.float64)
            bits = (small > small.mean()).flatten()
            phashes.append(
                int(bits.astype(np.uint64) @ (1 << np.arange(64, dtype=np.uint64)))
            )
        return (
            batch.append_column("width", pa.array(widths, type=pa.int32()))
            .append_column("height", pa.array(heights, type=pa.int32()))
            .append_column("mean_intensity", pa.array(means, type=pa.float64()))
            .append_column(
                "phash", pa.array(np.array(phashes, dtype=np.uint64))
            )
        )


class ImageResize:
    """Actor-pool stage: resize payloads to (out_w, out_h); output stays an
    opaque binary column (same layout as input — composable)."""

    def __init__(self, out_w: int = 32, out_h: int = 32, codec=None,
                 payload_col: str = "payload"):
        self.codec = codec or FakeImageCodec()
        self.out_w = out_w
        self.out_h = out_h
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [
            self.codec.encode(
                self.codec.resize(self.codec.decode(p), self.out_w, self.out_h)
            )
            for p in batch[self.payload_col].to_pylist()
        ]
        idx = batch.schema.get_field_index(self.payload_col)
        return batch.set_column(
            idx, self.payload_col, pa.array(out, type=pa.binary())
        )


def image_features(
    ds: "ray.data.Dataset", batch_size: int = 64, concurrency=(1, 4)
) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageFeatures, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def image_resize(
    ds: "ray.data.Dataset", out_w: int = 32, out_h: int = 32,
    batch_size: int = 64, concurrency=(1, 4),
) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthesize_image_table(n: int = 100, seed: int = 42) -> pa.Table:
    """Deterministic (img_id, payload, format) fixture table."""
    rng = np.random.default_rng(seed)
    ids, payloads = [], []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        ids.append(i)
        payloads.append(make_fake_image(w, h, seed=seed * 100003 + i))
    return pa.table(
        {
            "img_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "format": pa.array(["fimg"] * n, type=pa.string()),
        }
    )
