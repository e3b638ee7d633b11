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
        # all three kinds are REAL containers now
        if k == "image":
            assert bytes(p[:2]) == b"P6"
        elif k == "audio":
            assert bytes(p[:4]) == b"RIFF" and bytes(p[8:12]) == b"WAVE"
        else:
            assert bytes(p[:4]) == b"RIFF" and bytes(p[8:12]) == b"AVI "


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


def test_strict_mode_semantics():
    from entitydisambiguation_ray.stages.multimodal import encode_ppm

    # strict stage DECODES real PPM natively (no PIL needed) ...
    stage = ImageFeatureStage(strict=True)
    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    t = pa.table({
        "media_id": ["a"], "kind": ["image"],
        "payload": [encode_ppm(img)], "width": [16], "height": [16],
    })
    out = stage(t)
    assert out.num_rows == 1
    # ... and refuses a format that genuinely needs PIL
    bad = pa.table({
        "media_id": ["b"], "kind": ["image"],
        "payload": [b"\x89PNG fake"], "width": [8], "height": [8],
    })
    with pytest.raises(NotImplementedError):
        stage(bad)
    # strict frame sampling DECODES uncompressed AVI natively...
    from entitydisambiguation_ray.stages.multimodal import encode_avi

    frames = np.zeros((3, 8, 8, 3), dtype=np.uint8)
    avi_row = pa.table({
        "media_id": ["v"], "kind": ["video"],
        "payload": [encode_avi(frames)]})
    assert FrameSampleStage(strict=True)(avi_row).num_rows == 4
    # ...and refuses video formats that genuinely need PyAV
    fake_row = pa.table({
        "media_id": ["w"], "kind": ["video"],
        "payload": [b"VIDF" + b"\x00" * 64]})
    with pytest.raises(NotImplementedError):
        FrameSampleStage(strict=True)(fake_row)


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
    assert all(7.0 < e <= 8.0 for e in ents)


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


# ------------------------------------------------------- real codec kernels

def test_ppm_roundtrip_exact():
    from entitydisambiguation_ray.stages.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (23, 31, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # header comments + extra whitespace per the Netpbm spec
    raw = encode_ppm(img)
    body = raw.split(b"\n", 3)
    commented = b"P6\n# a comment\n  31 23\n# more\n255\n" + body[3]
    assert np.array_equal(decode_ppm(commented), img)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(img)[:-10])  # truncated raster


def test_wav_roundtrip_exact():
    from entitydisambiguation_ray.stages.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32768, 1000).astype(np.int16)
    arr, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and np.array_equal(arr[:, 0], mono)
    stereo = rng.integers(-32768, 32768, (500, 2)).astype(np.int16)
    arr2, _ = decode_wav(encode_wav(stereo, 8000))
    assert np.array_equal(arr2, stereo)


def test_audio_feature_stage_real_decode(ray_session):
    import ray.data as rd

    from entitydisambiguation_ray.stages.multimodal import AudioFeatureStage

    ds = rd.range(30).map_batches(
        lambda b: synth_media_batch(b["id"]), batch_format="numpy",
        batch_size=MEDIA_BATCH_SIZE)
    audio = ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("kind"), "audio")),
        batch_format="pyarrow")
    out = audio.map_batches(AudioFeatureStage, batch_format="pyarrow",
                            batch_size=MEDIA_BATCH_SIZE,
                            concurrency=2).to_pandas()
    assert len(out) == 10
    # duration recomputed from REAL sample counts matches the metadata
    meta = ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("kind"), "audio")),
        batch_format="pyarrow").to_pandas()[["media_id", "duration_s"]]
    j = out.merge(meta, on="media_id", suffixes=("", "_meta"))
    assert np.allclose(j["duration_s"], j["duration_s_meta"], atol=1e-6)
    # band energies are a distribution; white noise spreads across bands
    assert all(abs(sum(v) - 1.0) < 1e-3 for v in out["band_energy"])
    assert (out["rms"] > 0).all() and out["zero_crossing_rate"].between(
        0.3, 0.7).all()  # white noise crosses ~half the time
    # strict mode refuses non-WAV audio
    bad = pa.table({"media_id": ["x"], "payload": [b"AUDF fake"]})
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(strict=True)(bad)


def test_audio_feature_stage_empty_batch():
    """Zero-row batch must yield a correctly-typed empty table, not crash
    in np.concatenate (ADVICE r4: future Ray versions may pass empties)."""
    from entitydisambiguation_ray.stages.multimodal import AudioFeatureStage

    empty = pa.table({"media_id": pa.array([], pa.string()),
                      "payload": pa.array([], pa.binary())})
    out = AudioFeatureStage()(empty)
    assert out.num_rows == 0
    assert out.column("band_energy").type == pa.list_(
        pa.float32(), AudioFeatureStage.N_BANDS)


def test_image_stage_decodes_real_ppm_pixels():
    """The feature output must derive from the REAL pixels: a constant
    image gives exactly its constant as mean intensity."""
    from entitydisambiguation_ray.stages.multimodal import encode_ppm

    img = np.full((20, 20, 3), 77, dtype=np.uint8)
    t = pa.table({"media_id": ["c"], "kind": ["image"],
                  "payload": [encode_ppm(img)],
                  "width": [20], "height": [20]})
    out = ImageFeatureStage()(t)
    assert out.column("mean_intensity").to_pylist() == [77.0]


def test_avi_roundtrip_exact():
    """encode_avi → decode_avi is the identity on frames and fps, for
    both padded (w%4 != 0) and unpadded widths."""
    from entitydisambiguation_ray.stages.multimodal import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.default_rng(5)
    for w in (16, 10, 33):  # 10/33: DIB rows need 4-byte padding
        frames = rng.integers(0, 256, (5, 12, w, 3), dtype=np.uint8)
        payload = encode_avi(frames, fps=24)
        got, fps = decode_avi(payload)
        assert fps == 24
        np.testing.assert_array_equal(got, frames)


def test_frame_stage_decodes_real_avi_pixels():
    """The frame digest must derive from the DECODED pixels: it equals
    sha1 over the original RGB frame bytes, picked evenly across the
    movi chunk list."""
    import hashlib

    from entitydisambiguation_ray.stages.multimodal import (
        FrameSampleStage,
        encode_avi,
    )

    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, (8, 9, 11, 3), dtype=np.uint8)
    t = pa.table({"media_id": ["v0"], "kind": ["video"],
                  "payload": [encode_avi(frames, fps=10)]})
    out = FrameSampleStage(n_samples=4)(t).to_pandas()
    assert len(out) == 4
    # even sampling over 8 frames with n=4 -> source frames 0,2,4,6
    want = [hashlib.sha1(frames[i].tobytes()).hexdigest()[:16]
            for i in (0, 2, 4, 6)]
    assert out["frame_digest"].tolist() == want
    assert out["byte_offset"].is_monotonic_increasing
