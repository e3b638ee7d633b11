"""Distributed round-2 (token-groupby dataflow) must agree exactly with the
driver-side token-index implementation."""
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def raw_decisions(ray_session):
    """Pre-round-2 decisions from a real pipeline run, plus planted
    near-duplicate creates so both round-2 implementations have real merge
    edges to find."""
    import json

    from entitydisambiguation_ray.config import EngineConfig
    from entitydisambiguation_ray.functions.hashing import generate_entity_id
    from entitydisambiguation_ray.pipelines.kg import (
        run_kg_pipeline,
        synth_pages_dataset,
    )

    cfg = EngineConfig(round2_dedup=False)
    out = run_kg_pipeline(synth_pages_dataset(250, seed=42), cfg=cfg)
    dec = out["decisions_df"]

    def planted(sig, occ, name):
        return {
            "sig": sig, "first_occ": occ, "name": name, "type": "药物",
            "aliases_json": json.dumps(["osimertinib", "AZD9291"],
                                       ensure_ascii=False),
            "definition": "第三代EGFR抑制剂靶向药物", "attributes": "{}",
            "decision": "create", "match_id": None, "match_name": None,
            "bge_score": 0.0, "cross_encoder_score": 0.0,
            "fuzz_score": 0.0, "levenshtein_score": 0.0,
            "final_score": 0.0, "confidence": 1.0, "reasoning": "",
            "canonical_id": generate_entity_id(name, "药物"),
        }

    extra = pd.DataFrame([
        planted("zz_sA", "zz1|000001|a", "奥希替尼"),
        planted("zz_sB", "zz2|000001|a", "奥希替尼片"),
        planted("zz_sC", "zz3|000001|a", "奥希替尼胶囊"),
    ])
    return pd.concat([dec, extra], ignore_index=True)


def test_distributed_round2_matches_driver(ray_session, raw_decisions):
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.kg import (
        apply_merge_edges,
        round2_canonicalize,
    )
    from entitydisambiguation_ray.pipelines.round2 import (
        distributed_round2_edges,
    )

    driver = round2_canonicalize(raw_decisions).sort_values("sig") \
        .reset_index(drop=True)
    edges = distributed_round2_edges(
        rd.from_pandas(raw_decisions.reset_index(drop=True)), nparts=8)
    dist = apply_merge_edges(
        raw_decisions, list(zip(edges["a"], edges["b"]))) \
        .sort_values("sig").reset_index(drop=True)
    pd.testing.assert_frame_equal(driver, dist)


def test_distributed_round2_merges_planted_pair(ray_session):
    import json

    import ray.data as rd

    from entitydisambiguation_ray.functions.hashing import generate_entity_id
    from entitydisambiguation_ray.pipelines.round2 import (
        distributed_round2_edges,
    )

    def row(sig, occ, name, etype, aliases):
        return {
            "sig": sig, "first_occ": occ, "name": name, "type": etype,
            "aliases_json": json.dumps(aliases, ensure_ascii=False),
            "definition": "第三代EGFR抑制剂靶向药物", "attributes": "{}",
            "decision": "create", "match_id": None, "match_name": None,
            "bge_score": 0.0, "cross_encoder_score": 0.0, "fuzz_score": 0.0,
            "levenshtein_score": 0.0, "final_score": 0.0,
            "confidence": 1.0, "reasoning": "",
            "canonical_id": generate_entity_id(name, etype),
        }

    dec = pd.DataFrame([
        row("sA", "u1|000001|a", "奥希替尼", "药物", ["osimertinib", "AZD9291"]),
        row("sB", "u2|000001|a", "奥希替尼片", "药物", ["osimertinib", "AZD9291"]),
        row("sC", "u3|000001|a", "肾上腺", "器官", ["adrenal gland"]),
    ])
    edges = distributed_round2_edges(rd.from_pandas(dec), nparts=4)
    pairs = set(map(tuple, edges.values))
    ida = generate_entity_id("奥希替尼", "药物")
    idb = generate_entity_id("奥希替尼片", "药物")
    assert (ida, idb) in pairs and (idb, ida) in pairs
    assert not any(generate_entity_id("肾上腺", "器官") in p for p in pairs)
