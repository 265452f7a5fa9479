"""Multimodal column plumbing (training-data ops): opaque binary payloads +
typed metadata, processed by actor-pool map_batches stages.

Image decode is REAL for PNG: the in-repo pure-python codec
(``functions/png.py``, stdlib zlib — full filter/CRC handling) backs
:class:`PngCodec`, and the stages default to :class:`AutoImageCodec`,
which magic-sniffs PNG vs the synthetic FIMG format.  Other image formats
(JPEG et al.) and the audio/video codecs gate behind an import-try
(``decode_image`` raises ``NotImplementedError`` without PIL);
:class:`FakeImageCodec`/:class:`FakeAudioCodec` are the deterministic
stand-ins for those paths.  Everything around the codecs — Arrow
``binary`` schema, small-batch sizing for large payloads, actor
signature, feature/resize output layout — is real and tested.

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
    """Real decode path.  PNG payloads decode via the in-repo pure-python
    codec (``functions/png.py`` — stdlib zlib, no external library); other
    formats gate on PIL, which is absent in this container."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from ner_funtool_ray.functions.png import decode_png

        return decode_png(payload)
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "non-PNG image codec not available in this environment; "
            "PNG decodes natively, or use FakeImageCodec for plumbing"
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


class PngCodec:
    """Real (non-fake) image codec: pure-python PNG from
    ``functions/png.py``.  Same decode/resize/encode surface as
    :class:`FakeImageCodec`, so every image stage composes with real PNG
    payloads.  Color images collapse to luma for the feature path (the
    integer BT.601-ish average keeps everything deterministic)."""

    def decode(self, payload: bytes) -> np.ndarray:
        from ner_funtool_ray.functions.png import decode_png

        img = decode_png(payload)
        if img.ndim == 3:  # RGB(A) → luma for the grayscale feature path
            img = (
                img[:, :, :3].astype(np.uint32).sum(axis=2) // 3
            ).astype(np.uint8)
        return img

    # nearest-neighbor resize — identical semantics to FakeImageCodec
    resize = FakeImageCodec.resize

    def encode(self, img: np.ndarray) -> bytes:
        from ner_funtool_ray.functions.png import encode_png

        return encode_png(img.astype(np.uint8))


class AutoImageCodec:
    """Magic-sniffing codec: PNG payloads take the real pure-python PNG
    path, FIMG payloads the deterministic fake path.  Default for the
    image stages so mixed-format corpora decode without configuration.
    Encode emits PNG (the real, externally readable format)."""

    def __init__(self) -> None:
        self._png = PngCodec()
        self._fake = FakeImageCodec()

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return self._png.decode(payload)
        if payload[:4] == MAGIC:
            return self._fake.decode(payload)
        raise ValueError(
            f"unrecognized image payload (first bytes {payload[:8]!r})"
        )

    resize = FakeImageCodec.resize

    def encode(self, img: np.ndarray) -> bytes:
        return self._png.encode(img)


class ImageFeatures:
    """Actor-pool stage: (id, payload binary, …) → + (width, height,
    mean_intensity, phash) feature columns.  Codec constructed once per
    actor; per-batch work is numpy over decoded arrays."""

    def __init__(self, codec=None, payload_col: str = "payload"):
        self.codec = codec or AutoImageCodec()
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
        self.codec = codec or AutoImageCodec()
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


# --- audio -----------------------------------------------------------------

AUDIO_MAGIC = b"FAUD"  # header: MAGIC | u32 sample_rate | u32 n | i16 samples


def make_fake_audio(n_samples: int, sample_rate: int = 16000, seed: int = 0) -> bytes:
    """Deterministic synthetic 'audio': header + seeded i16 PCM payload."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(-20000, 20000, size=n_samples, dtype=np.int16)
    return (
        AUDIO_MAGIC
        + struct.pack("<II", sample_rate, n_samples)
        + samples.tobytes()
    )


class FakeAudioCodec:
    """Deterministic stand-in for the stubbed audio decode (no soundfile/
    librosa in this container; the real decode would gate on import like
    ``decode_image``)."""

    def decode(self, payload: bytes) -> tuple[np.ndarray, int]:
        if payload[:4] != AUDIO_MAGIC:
            raise ValueError("bad magic")
        sr, n = struct.unpack("<II", payload[4:12])
        return np.frombuffer(payload[12 : 12 + 2 * n], dtype=np.int16), sr


class AudioFeatures:
    """Actor-pool stage: (id, payload binary) → + (sample_rate,
    duration_sec, rms, zero_cross_rate, peak).  Codec per actor; per-batch
    numpy over decoded PCM."""

    def __init__(self, codec=None, payload_col: str = "payload"):
        self.codec = codec or FakeAudioCodec()
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        srs, durs, rmss, zcrs, peaks = [], [], [], [], []
        for payload in batch[self.payload_col].to_pylist():
            pcm, sr = self.codec.decode(payload)
            x = pcm.astype(np.float64)
            srs.append(sr)
            durs.append(len(x) / sr if sr else 0.0)
            rmss.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
            zcrs.append(
                float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
            )
            peaks.append(int(np.abs(pcm).max()) if len(pcm) else 0)
        return (
            batch.append_column("sample_rate", pa.array(srs, type=pa.int32()))
            .append_column("duration_sec", pa.array(durs, type=pa.float64()))
            .append_column("rms", pa.array(rmss, type=pa.float64()))
            .append_column("zero_cross_rate", pa.array(zcrs, type=pa.float64()))
            .append_column("peak", pa.array(peaks, type=pa.int32()))
        )


class AudioWindowFeatures:
    """Actor-pool flat-map stage: one row per fixed-size PCM window with
    per-window RMS — the windowed feature-extract shape (batched model
    inference would consume these windows).  Output explodes rows, so
    callers keep batch_size small like every binary-payload stage."""

    def __init__(self, window: int = 1024, codec=None, id_col: str = "audio_id",
                 payload_col: str = "payload"):
        self.window = window
        self.codec = codec or FakeAudioCodec()
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, wins, rmss = [], [], []
        for aid, payload in zip(
            batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()
        ):
            pcm, _sr = self.codec.decode(payload)
            n_full = len(pcm) // self.window
            if n_full:
                x = (
                    pcm[: n_full * self.window]
                    .astype(np.float64)
                    .reshape(n_full, self.window)
                )
                w_rms = np.sqrt((x * x).mean(axis=1))
                ids.extend([aid] * n_full)
                wins.extend(range(n_full))
                rmss.extend(float(v) for v in w_rms)
        return pa.table(
            {
                self.id_col: pa.array(ids, type=pa.int64()),
                "win_idx": pa.array(wins, type=pa.int64()),
                "rms": pa.array(rmss, type=pa.float64()),
            }
        )


# --- video -----------------------------------------------------------------

VIDEO_MAGIC = b"FVID"  # header: MAGIC | u16 w | u16 h | u16 n_frames | frames


def make_fake_video(n_frames: int, width: int, height: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    frames = rng.integers(
        0, 256, size=n_frames * width * height, dtype=np.uint8
    )
    return (
        VIDEO_MAGIC
        + struct.pack("<HHH", width, height, n_frames)
        + frames.tobytes()
    )


class FakeVideoCodec:
    """Deterministic stand-in for the stubbed video decode."""

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:4] != VIDEO_MAGIC:
            raise ValueError("bad magic")
        w, h, n = struct.unpack("<HHH", payload[4:10])
        return np.frombuffer(
            payload[10 : 10 + n * w * h], dtype=np.uint8
        ).reshape(n, h, w)


class VideoFrameSample:
    """Actor-pool flat-map stage: uniformly sample ``n_samples`` frames per
    video and emit each as a FIMG image payload row — composable with
    :class:`ImageFeatures`/`ImageResize` downstream (frame-sample →
    feature-extract is the standard video pipeline shape)."""

    def __init__(self, n_samples: int = 4, codec=None, id_col: str = "video_id",
                 payload_col: str = "payload"):
        self.n_samples = n_samples
        self.codec = codec or FakeVideoCodec()
        self.img_codec = FakeImageCodec()
        self.id_col = id_col
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, fidx, payloads = [], [], []
        for vid, payload in zip(
            batch[self.id_col].to_pylist(), batch[self.payload_col].to_pylist()
        ):
            frames = self.codec.decode(payload)
            n = frames.shape[0]
            k = min(self.n_samples, n)
            # deterministic uniform sampling (first frame of each k-section)
            take = (np.arange(k) * n) // k
            for i in take:
                vids.append(vid)
                fidx.append(int(i))
                payloads.append(self.img_codec.encode(frames[i]))
        return pa.table(
            {
                self.id_col: pa.array(vids, type=pa.int64()),
                "frame_idx": pa.array(fidx, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def audio_features(ds, batch_size: int = 64, concurrency=(1, 4)):
    return ds.map_batches(
        AudioFeatures, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def video_frame_sample(ds, n_samples: int = 4, batch_size: int = 16,
                       concurrency=(1, 4)):
    # video payloads are the largest: smallest default batch of any stage
    return ds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"n_samples": n_samples},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# --- multimodal × dedup composition ----------------------------------------


def image_neardup_clusters(
    images: "ray.data.Dataset",
    max_hamming: int = 3,
    id_col: str = "image_id",
    batch_size: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Perceptual near-duplicate IMAGE clustering: the multimodal feature
    stage (decode → 8×8 resize → 64-bit phash) composed with the dedup
    family's banded Hamming join and distributed connected components —
    the same 4×16-bit band blocking as SimHash text dedup, so only images
    sharing a band ever pair, and the shuffle carries (id, phash) rows,
    never image payloads.  Returns (doc_id → image id, cluster_id)."""
    import pandas as pd

    from ner_funtool_ray.functions.hashing import hamming64
    from ner_funtool_ray.stages.dedup import _crc_bucket, clusters_from_pairs_ds

    feats = images.map_batches(
        ImageFeatures, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    ).select_columns([id_col, "phash"])

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col]).astype(np.int64)
        ph = np.asarray(batch["phash"]).astype(np.uint64)
        out_ids = np.repeat(ids, 4)
        out_ph = np.repeat(ph, 4)
        bands = np.tile(np.arange(4, dtype=np.uint64), len(ids))
        keys = [
            f"{int(b)}:{int((h >> (b * np.uint64(16))) & np.uint64(0xFFFF))}"
            for b, h in zip(bands, out_ph)
        ]
        return pa.table(
            {
                id_col: pa.array(out_ids, type=pa.int64()),
                "phash": pa.array(out_ph),
                "band_key": pa.array(keys, type=pa.string()),
                "bucket": pa.array(_crc_bucket(keys, 64)),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pa.Table:
        a_out, b_out = [], []
        counts = group["band_key"].value_counts()
        multi = counts[counts > 1].index
        if len(multi):
            for _k, sub in group[group["band_key"].isin(multi)].groupby(
                "band_key", sort=False
            ):
                rows = sub.drop_duplicates(id_col).sort_values(id_col)
                ids = rows[id_col].to_numpy()
                hs = rows["phash"].to_numpy()
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        if hamming64(int(hs[i]), int(hs[j])) <= max_hamming:
                            a_out.append(int(ids[i]))
                            b_out.append(int(ids[j]))
        return pa.table(
            {
                "a": pa.array(a_out, type=pa.int64()),
                "b": pa.array(b_out, type=pa.int64()),
            }
        )

    pairs = (
        feats.map_batches(band_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return clusters_from_pairs_ds(pairs)
