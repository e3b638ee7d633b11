"""Blocked candidate generation (scale path): agreement with the exact
global path, salt invariance, and skew splitting."""
import pandas as pd
import pytest

from entitydisambiguation_ray.sources.seed import build_seed_entities
from entitydisambiguation_ray.stages.candidates import block_of, blocked_decisions


@pytest.fixture(scope="module")
def mention_inputs(ray_session):
    from entitydisambiguation_ray.pipelines.kg import (
        mentions_stage,
        synth_pages_dataset,
        triples_stage,
        extract_stage,
        unique_mentions_stage,
    )

    pages = synth_pages_dataset(150, seed=42)
    triples = triples_stage(extract_stage(pages)).materialize()
    return unique_mentions_stage(mentions_stage(triples)).materialize()


def test_block_of():
    assert block_of("糖尿病", "疾病") == "疾病|糖"
    assert block_of("Diabetes", None) == "∅|d"
    assert block_of("", "疾病") == "疾病|∅"


def test_blocked_agreement_with_global(mention_inputs):
    from entitydisambiguation_ray.pipelines.kg import decisions_stage

    exact = decisions_stage(mention_inputs).to_pandas().set_index("sig")
    blocked = blocked_decisions(
        mention_inputs, build_seed_entities()).to_pandas().set_index("sig")
    assert set(exact.index) == set(blocked.index)
    joined = exact[["decision", "canonical_id"]].join(
        blocked[["decision", "canonical_id"]], rsuffix="_b")
    agree = (joined["canonical_id"] == joined["canonical_id_b"]).mean()
    # blocking is an approximation of global retrieval; on the fixture
    # corpus the scoring-relevant candidates co-locate, so agreement is high
    assert agree >= 0.95, agree
    # every merge the blocked path produces is one the exact path produced
    merged_b = joined[joined["decision_b"] == "merge"]
    assert (merged_b["decision"] == "merge").mean() >= 0.95


def test_salting_invariance(mention_inputs):
    """Forcing heavy salting must not change any decision (replicated KB
    slice per sub-block ⇒ same candidates)."""
    base = blocked_decisions(
        mention_inputs, build_seed_entities(),
        salt_threshold=10**9).to_pandas().sort_values("sig").reset_index(drop=True)
    salted = blocked_decisions(
        mention_inputs, build_seed_entities(),
        salt_threshold=5).to_pandas().sort_values("sig").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, salted)


def test_local_matches_distributed(mention_inputs):
    """blocked_decisions_local (driver short-circuit) and the distributed
    blocked_decisions share kernels and must agree exactly."""
    from entitydisambiguation_ray.stages.candidates import (
        blocked_decisions_local,
    )

    dist = (blocked_decisions(mention_inputs, build_seed_entities())
            .to_pandas().sort_values("sig").reset_index(drop=True))
    loc = (blocked_decisions_local(mention_inputs.to_pandas(),
                                   build_seed_entities())
           .sort_values("sig").reset_index(drop=True))
    pd.testing.assert_frame_equal(dist, loc)
