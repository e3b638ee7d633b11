"""J1-J4 smart-search semantics (disambiguation.py:168-224): dual-path
candidate generation, type-priority name-dedup merge, cosine threshold,
top-k truncation."""
import numpy as np
import pytest

from entitydisambiguation_ray.config import EngineConfig
from entitydisambiguation_ray.stages.disambiguate import KnowledgeBase


def _ents(rows):
    return [
        {"id": f"e{i}", "name": n, "type": t, "aliases": [],
         "definition": None, "attributes": "{}", "source": None,
         "create_time": None}
        for i, (n, t) in enumerate(rows)
    ]


def test_typed_path_priority_and_name_dedup():
    kb = KnowledgeBase(entities=_ents([
        ("甲药", "药物"), ("乙药", "药物"), ("丙病", "疾病"),
    ]))
    # query identical to 甲药 → cosine 1.0 on the typed path
    vec = kb.matrix[0]
    cands = kb.candidates(vec, "药物", top_k=5)
    ids = [kb.rows[i]["id"] for i, _ in cands]
    # typed results first (e0 exact, e1 same type), 丙病 reachable only via
    # the vector path overlay — and each name appears exactly once
    assert ids[0] == "e0"
    assert len(ids) == len(set(ids))
    assert set(ids) >= {"e0", "e1"}
    # typed-path scores are cosine (1.0 for the identical entity)
    assert cands[0][1] == pytest.approx(1.0, abs=1e-5)


def test_type_path_threshold_excludes_low_cosine():
    # disambiguation.py:193 — cosine must exceed 0.1 on the typed path
    kb = KnowledgeBase(entities=_ents([("甲药", "药物"), ("完全无关实体名称", "药物")]))
    vec = kb.matrix[0]
    cos = float(kb.matrix[1] @ vec)
    assert abs(cos) < 0.1  # unrelated hash embeddings ≈ orthogonal
    cands = kb.candidates(vec, "药物", top_k=5)
    typed_scores = dict(cands)
    # e1 can still appear via the VECTOR overlay (IndexFlatIP returns top-k
    # unconditionally, vectorization.py:627) but never with a typed cosine
    # above the threshold failing bar — its score is the raw IP
    for i, s in cands:
        if kb.rows[i]["id"] == "e1":
            assert s == pytest.approx(cos, abs=1e-6)


def test_top_k_truncation_and_untyped_path():
    rows = [(f"名称{i}", "药物") for i in range(30)]
    kb = KnowledgeBase(entities=_ents(rows))
    vec = kb.matrix[7]
    # untyped query → pure vector path, exactly top_k results
    cands = kb.candidates(vec, None, top_k=10)
    assert len(cands) == 10
    assert kb.rows[cands[0][0]]["name"] == "名称7"
    # typed query also truncates to top_k
    assert len(kb.candidates(vec, "药物", top_k=10)) == 10


def test_empty_kb():
    kb = KnowledgeBase(entities=[])
    assert kb.candidates(np.zeros(1024, dtype=np.float32), "药物", 5) == []
