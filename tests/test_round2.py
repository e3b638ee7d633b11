"""Round-2 canonicalization: created-vs-created merges via union-find with
first-occurrence representatives (pipelines/kg.round2_canonicalize)."""
import json

import pandas as pd
import pytest

from entitydisambiguation_ray.functions.hashing import generate_entity_id
from entitydisambiguation_ray.pipelines.kg import round2_canonicalize


def _dec_row(sig, occ, name, etype, aliases, definition, attrs,
             decision="create"):
    return {
        "sig": sig, "first_occ": occ, "name": name, "type": etype,
        "aliases_json": json.dumps(aliases, ensure_ascii=False),
        "definition": definition, "attributes": attrs,
        "decision": decision, "match_id": None, "match_name": None,
        "bge_score": 0.0, "cross_encoder_score": 0.0, "fuzz_score": 0.0,
        "levenshtein_score": 0.0, "final_score": 0.0, "confidence": 1.0,
        "reasoning": "", "canonical_id": generate_entity_id(name, etype),
    }


def test_round2_merges_near_identical_creates(ray_session):
    aliases = ["osimertinib", "AZD9291"]
    definition = "第三代EGFR抑制剂靶向药物"
    attrs = '{"适应症": ["肺癌"]}'
    rows = [
        # B occurs EARLIER in the corpus than A → B is the representative
        _dec_row("sigA", "https://x/p2|000003|a", "奥希替尼", "药物",
                 aliases, definition, attrs),
        _dec_row("sigB", "https://x/p1|000001|a", "奥希替尼片", "药物",
                 aliases, definition, attrs),
        # unrelated create stays untouched
        _dec_row("sigC", "https://x/p3|000001|a", "完全无关实体", "器官",
                 [], None, "{}"),
    ]
    df = pd.DataFrame(rows)
    out = round2_canonicalize(df)
    a = out.loc[out["sig"] == "sigA", "canonical_id"].iloc[0]
    b = out.loc[out["sig"] == "sigB", "canonical_id"].iloc[0]
    c = out.loc[out["sig"] == "sigC", "canonical_id"].iloc[0]
    assert a == b == generate_entity_id("奥希替尼片", "药物")
    assert c == generate_entity_id("完全无关实体", "器官")


def test_round2_noop_when_dissimilar(ray_session):
    rows = [
        _dec_row("s1", "u|000001|a", "阿帕替尼", "药物", ["apatinib"],
                 "抗血管生成药", "{}"),
        _dec_row("s2", "u|000002|a", "肾上腺", "器官", ["adrenal gland"],
                 "内分泌器官", "{}"),
    ]
    out = round2_canonicalize(pd.DataFrame(rows))
    assert out["canonical_id"].tolist() == [
        generate_entity_id("阿帕替尼", "药物"),
        generate_entity_id("肾上腺", "器官"),
    ]


def test_round2_parallel_fanout_identical(ray_session, monkeypatch):
    """The warm-task fan-out of BOTH round-2 passes (KB payload prep and
    mention scoring) must be byte-identical to the driver-serial path —
    chunking is placement only (round-5 scaling work)."""
    import numpy as np

    import entitydisambiguation_ray.pipelines.kg as kg

    rng = np.random.default_rng(13)
    vocab = ["奥希替尼", "吉非替尼", "阿帕替尼", "曲妥珠单抗", "贝伐珠单抗",
             "帕博利珠单抗", "纳武利尤单抗", "卡瑞利珠单抗"]
    rows = []
    for i in range(900):
        base = vocab[i % len(vocab)]
        # thirds: exact dup names (merge mass), suffixed variants
        # (near-merges), unique tails (non-merges)
        if i % 3 == 0:
            name = base
        elif i % 3 == 1:
            name = base + "片"
        else:
            name = f"{base}变体{i:04d}"
        rows.append(_dec_row(
            f"sig{i:05d}", f"https://x/p{i % 97}|{i:06d}|a", name, "药物",
            [f"alias{i % 11}"], "第三代EGFR抑制剂靶向药物",
            '{"适应症": ["肺癌"]}'))
    df = pd.DataFrame(rows)

    monkeypatch.setattr(kg, "ROUND2_FANOUT_MIN", 10**9)  # force serial
    serial = kg.round2_canonicalize(df)
    monkeypatch.setattr(kg, "ROUND2_FANOUT_MIN", 100)    # force fan-out
    parallel = kg.round2_canonicalize(df)
    pd.testing.assert_frame_equal(serial, parallel)
    # the fixture actually merges something (the test has teeth)
    assert (serial["canonical_id"].nunique()
            < serial["canonical_id"].size)
