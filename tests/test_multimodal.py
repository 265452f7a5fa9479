"""Multimodal plumbing: binary schema survives the pipeline, features are
deterministic, resize output is composable, real decode is stubbed."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ner_funtool_ray.stages.multimodal import (
    FakeImageCodec,
    decode_image,
    image_features,
    image_resize,
    make_fake_image,
    synthesize_image_table,
)


def test_codec_roundtrip():
    c = FakeImageCodec()
    img = c.decode(make_fake_image(16, 9, seed=3))
    assert img.shape == (9, 16)
    assert c.decode(c.encode(img)).tolist() == img.tolist()


def test_decode_stub_raises_without_codec_lib():
    with pytest.raises((NotImplementedError, Exception)):
        decode_image(make_fake_image(4, 4))


def test_image_features_pipeline():
    tbl = synthesize_image_table(n=50, seed=42)
    out = (
        image_features(ray.data.from_arrow(tbl), batch_size=16)
        .to_pandas()
        .sort_values("img_id")
        .reset_index(drop=True)
    )
    assert len(out) == 50
    assert {"width", "height", "mean_intensity", "phash"} <= set(out.columns)
    # deterministic: same input → same features
    out2 = (
        image_features(ray.data.from_arrow(tbl), batch_size=16)
        .to_pandas()
        .sort_values("img_id")
        .reset_index(drop=True)
    )
    assert out["phash"].tolist() == out2["phash"].tolist()
    # features consistent with the codec
    c = FakeImageCodec()
    img0 = c.decode(tbl["payload"][0].as_py())
    assert out.loc[0, "width"] == img0.shape[1]
    assert out.loc[0, "mean_intensity"] == pytest.approx(img0.mean())


def test_image_resize_pipeline_composable():
    tbl = synthesize_image_table(n=20, seed=1)
    resized = image_resize(ray.data.from_arrow(tbl), out_w=8, out_h=8, batch_size=8)
    feats = image_features(resized, batch_size=8).to_pandas()
    assert (feats["width"] == 8).all() and (feats["height"] == 8).all()
    # binary column type preserved through the stage
    sch = resized.schema()
    assert sch.base_schema.field("payload").type == pa.binary()


def test_audio_roundtrip_and_features():
    from ner_funtool_ray.stages.multimodal import (
        AudioFeatures,
        FakeAudioCodec,
        make_fake_audio,
    )

    payload = make_fake_audio(16000, sample_rate=16000, seed=3)
    pcm, sr = FakeAudioCodec().decode(payload)
    assert sr == 16000 and len(pcm) == 16000
    tbl = pa.table(
        {
            "audio_id": [0, 1],
            "payload": pa.array(
                [payload, make_fake_audio(4000, 8000, seed=4)], type=pa.binary()
            ),
        }
    )
    out = AudioFeatures()(tbl)
    assert out["duration_sec"].to_pylist() == [1.0, 0.5]
    assert all(v > 0 for v in out["rms"].to_pylist())
    assert all(0 < v < 1 for v in out["zero_cross_rate"].to_pylist())


def test_audio_window_features_rowcount():
    from ner_funtool_ray.stages.multimodal import (
        AudioWindowFeatures,
        make_fake_audio,
    )

    tbl = pa.table(
        {
            "audio_id": [7],
            "payload": pa.array([make_fake_audio(5000, seed=1)], type=pa.binary()),
        }
    )
    out = AudioWindowFeatures(window=1024)(tbl)
    assert out.num_rows == 4  # 5000 // 1024 full windows
    assert out["win_idx"].to_pylist() == [0, 1, 2, 3]


def test_video_frame_sample_composes_with_image_features():
    import ray.data

    from ner_funtool_ray.stages.multimodal import (
        FakeVideoCodec,
        image_features,
        make_fake_video,
        video_frame_sample,
    )

    payload = make_fake_video(10, 16, 12, seed=5)
    frames = FakeVideoCodec().decode(payload)
    assert frames.shape == (10, 12, 16)
    tbl = pa.table(
        {
            "video_id": [0, 1],
            "payload": pa.array(
                [payload, make_fake_video(3, 8, 8, seed=6)], type=pa.binary()
            ),
        }
    )
    sampled = video_frame_sample(ray.data.from_arrow(tbl), n_samples=4)
    feats = image_features(sampled).to_pandas().sort_values(
        ["video_id", "frame_idx"]
    )
    # video 0: 4 uniform frames (0,2,5,7); video 1: capped at its 3 frames
    assert list(feats["video_id"]) == [0, 0, 0, 0, 1, 1, 1]
    assert list(feats["frame_idx"])[:4] == [0, 2, 5, 7]
    assert set(feats[feats.video_id == 0]["width"]) == {16}
    assert set(feats[feats.video_id == 1]["height"]) == {8}


def test_video_frame_sample_deterministic():
    from ner_funtool_ray.stages.multimodal import VideoFrameSample, make_fake_video

    tbl = pa.table(
        {
            "video_id": [0],
            "payload": pa.array([make_fake_video(20, 8, 8, seed=9)], type=pa.binary()),
        }
    )
    a = VideoFrameSample(n_samples=5)(tbl)
    b = VideoFrameSample(n_samples=5)(tbl)
    assert a.equals(b)


def test_image_neardup_clusters_groups_identical_payloads():
    import pyarrow as pa
    import ray.data

    from ner_funtool_ray.stages.multimodal import (
        image_neardup_clusters,
        make_fake_image,
    )

    dup = make_fake_image(64, 48, seed=1)
    other = make_fake_image(64, 48, seed=9)
    third = make_fake_image(32, 32, seed=5)
    tbl = pa.table(
        {
            "image_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "payload": pa.array([dup, dup, other, third], type=pa.binary()),
        }
    )
    out = image_neardup_clusters(ray.data.from_arrow(tbl)).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl.get(0) == cl.get(1) == 0  # identical payloads cluster
    # unrelated images either absent (singletons) or in other clusters
    assert cl.get(2) != 0 or 2 not in cl
