"""Multimodal plumbing: schema, actor-pool stages, deterministic stubs."""
import numpy as np
import pyarrow as pa
import pytest

from entitydisambiguation_ray.stages.multimodal import (
    FEATURE_DIM,
    MEDIA_BATCH_SIZE,
    MEDIA_SCHEMA,
    FrameSampleStage,
    ImageFeatureStage,
    byte_entropy_batch,
    synth_media_batch,
)


def test_media_schema_and_determinism():
    t = synth_media_batch(range(9))
    assert t.schema.equals(MEDIA_SCHEMA)
    assert t.num_rows == 9
    t2 = synth_media_batch(range(9))
    assert t.equals(t2)
    kinds = set(t.column("kind").to_pylist())
    assert kinds == {"image", "audio", "video"}
    for p, k in zip(t.column("payload").to_pylist(), t.column("kind").to_pylist()):
        assert p[:4] == {"image": b"IMGF", "audio": b"AUDF", "video": b"VIDF"}[k]


def test_image_feature_stage_batch_level():
    t = synth_media_batch(range(12))
    imgs = t.filter(pa.compute.equal(t.column("kind"), "image"))
    stage = ImageFeatureStage()
    out = stage(imgs)
    assert out.num_rows == imgs.num_rows
    feat = out.column("feature")
    assert feat.type == pa.list_(pa.float32(), FEATURE_DIM)
    # deterministic
    assert stage(imgs).equals(out)
    mi = out.column("mean_intensity").to_pylist()
    assert all(0 <= m <= 255 for m in mi)


def test_strict_mode_raises_without_pil():
    with pytest.raises(NotImplementedError):
        ImageFeatureStage(strict=True)
    with pytest.raises(NotImplementedError):
        FrameSampleStage(strict=True)


def test_frame_sampling():
    t = synth_media_batch(range(6))
    av = t.filter(pa.compute.is_in(t.column("kind"),
                                   value_set=pa.array(["audio", "video"])))
    out = FrameSampleStage(n_samples=4)(av)
    assert out.num_rows == av.num_rows * 4
    # offsets strictly increasing per media, never into the magic header
    import pandas as pd

    df = out.to_pandas()
    for _, g in df.groupby("media_id"):
        offs = g.sort_values("frame_idx")["byte_offset"].tolist()
        assert offs == sorted(offs) and offs[0] >= 4


def test_byte_entropy_drops_payload():
    t = synth_media_batch(range(5))
    out = byte_entropy_batch(t)
    assert "payload" not in out.column_names
    ents = out.column("byte_entropy").to_pylist()
    # uniform random bytes → entropy close to 8 bits
    assert all(7.5 < e <= 8.0 for e in ents)


def test_media_pipeline_on_ray(ray_session):
    import ray.data as rd

    ds = rd.range(60).map_batches(
        lambda b: synth_media_batch(b["id"]), batch_format="numpy",
        batch_size=MEDIA_BATCH_SIZE,
    )
    imgs = ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("kind"), "image")),
        batch_format="pyarrow")
    feats = imgs.map_batches(ImageFeatureStage, batch_format="pyarrow",
                             batch_size=MEDIA_BATCH_SIZE, concurrency=2)
    df = feats.to_pandas()
    assert len(df) == 20
    assert all(len(v) == FEATURE_DIM for v in df["feature"])
    ent = ds.map_batches(byte_entropy_batch, batch_format="pyarrow",
                         batch_size=MEDIA_BATCH_SIZE).to_pandas()
    assert len(ent) == 60 and "payload" not in ent.columns
