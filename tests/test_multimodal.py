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
