"""Real-model integration hooks (A1 BGE encoder / A2 CrossEncoder).

The heavyweight models are absent in this sandbox; these tests SKIP cleanly
here and run end-to-end wherever FlagEmbedding / sentence-transformers and
their weights are available (matching the reference's load-in-init
semantics, vectorization.py:219-313 and disambiguation.py:67-118).  The
gating tests (clean loud failure without the packages) always run.
"""
import numpy as np
import pytest

from entitydisambiguation_ray.config import EngineConfig


def _mentions_ds(n=32):
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.kg import (
        extract_stage,
        mentions_stage,
        synth_pages_dataset,
        triples_stage,
        unique_mentions_stage,
    )

    pages = synth_pages_dataset(n, seed=42)
    return unique_mentions_stage(mentions_stage(
        triples_stage(extract_stage(pages))))


# --------------------------------------------------------------- gating

def test_bge_encoder_gates_cleanly_when_absent():
    from entitydisambiguation_ray.functions.encoder import make_encoder

    try:
        import FlagEmbedding  # noqa: F401
        pytest.skip("FlagEmbedding installed — gating test is for absence")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="FlagEmbedding"):
        make_encoder("bge")


def test_cross_encoder_gates_cleanly_when_absent():
    from entitydisambiguation_ray.functions.scoring import comprehensive_score

    try:
        import sentence_transformers  # noqa: F401
        pytest.skip("sentence-transformers installed — gating test is for "
                    "absence")
    except ImportError:
        pass
    cfg = EngineConfig(reranker="cross_encoder")
    # load failure must escape LOUDLY (config error), not degrade silently
    with pytest.raises(RuntimeError, match="sentence-transformers"):
        comprehensive_score("a", [], "t", "a", "b", [], "t", "b", 0.5, cfg)


# --------------------------------------------------------------- real-model runs (skip here)

def test_bge_actor_pool_decisions(ray_session):
    """encoder='bge' through the batched actor-pool decisions stage:
    load-once-per-actor in Disambiguator.__init__, batched encode."""
    pytest.importorskip("FlagEmbedding")
    from entitydisambiguation_ray.pipelines.kg import decisions_stage

    cfg = EngineConfig(encoder="bge")
    out = decisions_stage(_mentions_ds(), cfg, concurrency=(1, 2),
                          use_actors=True).to_pandas()
    assert len(out) > 0
    assert set(out["decision"]) <= {"merge", "create", "ambiguous"}
    # BGE-M3 dense output is L2-normalized → bge scores live in [-1, 1]
    assert out["bge_score"].between(-1.0, 1.0001).all()


def test_bge_encoder_batched_normalized():
    pytest.importorskip("FlagEmbedding")
    from entitydisambiguation_ray.functions.encoder import make_encoder

    enc = make_encoder("bge")
    mat = enc.encode(["diabetes mellitus", "糖尿病", "ray data pipelines"])
    assert mat.shape[0] == 3
    norms = np.linalg.norm(mat, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-3)


def test_real_cross_encoder_scoring(ray_session):
    """reranker='cross_encoder': model loads once per process, raw scores
    pass through the reference's [-6.5, 7.7] → [0, 1] clamp."""
    pytest.importorskip("sentence_transformers")
    from entitydisambiguation_ray.functions.scoring import comprehensive_score
    from entitydisambiguation_ray.pipelines.kg import decisions_stage

    cfg = EngineConfig(reranker="cross_encoder")
    s = comprehensive_score(
        "diabetes", [], "disease", "diabetes chronic glucose disease",
        "diabetes mellitus", [], "disease",
        "diabetes mellitus chronic glucose disease", 0.9, cfg)
    assert 0.0 <= s.cross_encoder_score <= 1.0
    out = decisions_stage(_mentions_ds(16), cfg, concurrency=(1, 2),
                          use_actors=True).to_pandas()
    assert len(out) > 0


def test_gpu_plumbing_signature(ray_session):
    """num_gpus threads through to the actor pool (runs with 0 GPUs here —
    Ray accepts num_gpus=0 without reserving anything)."""
    from entitydisambiguation_ray.pipelines.kg import decisions_stage

    out = decisions_stage(_mentions_ds(8), EngineConfig(),
                          concurrency=(1, 1), use_actors=True,
                          num_gpus=0).to_pandas()
    assert len(out) > 0
