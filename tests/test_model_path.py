"""The weight-bearing model path, executed in CI (round-3 gap A1).

torch / FlagEmbedding are absent in this sandbox, so the stand-in is the
engine-authored numpy transformer (``encoder="np_transformer"``,
functions/encoder.py) — real weights (~1.2 MB), real batched padded+masked
inference, an fp16 toggle — run through the SAME actor-pool decisions
stage the BGE encoder would use (load-once-per-actor in
Disambiguator.__init__, batched encode per batch, num_gpus plumbing;
reference semantics being shaped: vectorization.py:219-313)."""
import numpy as np
import pytest

from entitydisambiguation_ray.config import EngineConfig
from entitydisambiguation_ray.functions.encoder import (
    NpTransformerEncoder,
    make_encoder,
)


def test_deterministic_across_instances():
    a = make_encoder("np_transformer", dim=256)
    b = make_encoder("np_transformer", dim=256)
    texts = ["diabetes mellitus", "血红蛋白 检测", "ray data", ""]
    assert np.array_equal(a.encode(texts), b.encode(texts))


def test_batch_size_invariance():
    """Padded batched inference must give the same vector regardless of
    which batch a text rides in (the padding/mask correctness check a real
    transformer deployment needs)."""
    enc = make_encoder("np_transformer", dim=128)
    texts = ["a", "a b c d e f g h", "糖尿病 慢性 代谢 疾病", "x y", "q"]
    whole = enc.encode(texts)
    singles = np.vstack([enc.encode([t]) for t in texts])
    assert np.allclose(whole, singles, atol=1e-5)


def test_output_contract_normalized():
    enc = make_encoder("np_transformer", dim=512)
    mat = enc.encode(["hello world", "unrelated text entirely"])
    assert mat.shape == (2, 512) and mat.dtype == np.float32
    assert np.allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-5)
    # similar texts score higher than unrelated ones
    m = enc.encode(["diabetes chronic disease", "diabetes chronic illness",
                    "parquet shuffle backpressure"])
    sim_close = float(m[0] @ m[1])
    sim_far = float(m[0] @ m[2])
    assert sim_close > sim_far


def test_fp16_toggle_close_to_fp32():
    f32 = make_encoder("np_transformer", dim=256)
    f16 = make_encoder("np_transformer_fp16", dim=256)
    texts = ["alpha beta gamma", "blood pressure measurement"]
    a, b = f32.encode(texts), f16.encode(texts)
    assert b.dtype == np.float32  # outputs always float32
    # fp16 compute drifts but must stay directionally identical
    cos = (a * b).sum(axis=1)
    assert (cos > 0.99).all()


def test_truncation_at_max_len():
    enc = make_encoder("np_transformer", dim=128)
    long = " ".join(f"tok{i}" for i in range(200))
    trunc = " ".join(f"tok{i}" for i in range(NpTransformerEncoder.MAX_LEN))
    assert np.allclose(enc.encode([long]), enc.encode([trunc]), atol=1e-6)


def test_model_actor_pool_decisions(ray_session):
    """The full decisions stage with the weight-bearing encoder on an
    actor pool: weights load once per actor (__init__), inference is
    batched, num_gpus plumbs through with 0 GPUs."""
    from entitydisambiguation_ray.pipelines.kg import (
        decisions_stage,
        extract_stage,
        mentions_stage,
        synth_pages_dataset,
        triples_stage,
        unique_mentions_stage,
    )

    cfg = EngineConfig(encoder="np_transformer")
    ments = unique_mentions_stage(mentions_stage(
        triples_stage(extract_stage(synth_pages_dataset(48, seed=42)))))
    out = decisions_stage(ments, cfg, concurrency=(1, 2), use_actors=True,
                          num_gpus=0).to_pandas()
    assert len(out) > 0
    assert set(out["decision"]) <= {"merge", "create", "ambiguous"}
    assert out["bge_score"].between(-1.0001, 1.0001).all()
    # run-to-run determinism through the distributed stage
    out2 = decisions_stage(ments, cfg, concurrency=(1, 2), use_actors=True,
                           num_gpus=0).to_pandas()
    a = out.sort_values("sig").reset_index(drop=True)
    b = out2.sort_values("sig").reset_index(drop=True)
    assert a.equals(b)


def test_model_pipeline_end_to_end(ray_session):
    """Whole KG pipeline under the weight-bearing encoder — the config a
    BGE-M3 user would run, minus the weights."""
    from entitydisambiguation_ray.pipelines.kg import (
        run_kg_pipeline,
        synth_pages_dataset,
    )

    cfg = EngineConfig(encoder="np_transformer")
    out = run_kg_pipeline(synth_pages_dataset(60, seed=7), cfg=cfg)
    assert out["edges"].count() > 0
    assert len(out["decisions_df"]) > 0 if "decisions_df" in out else True


def test_unknown_encoder_rejected():
    with pytest.raises(ValueError, match="unknown encoder"):
        make_encoder("gpt")
