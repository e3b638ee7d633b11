"""KB persistence (S13), incremental add (A4), stats (G4), router (S15)."""
import numpy as np
import pytest

from entitydisambiguation_ray.stages.disambiguate import KnowledgeBase
from entitydisambiguation_ray.state.kbstore import (
    KBRouter,
    kb_add,
    kb_stats,
    load_kb,
    save_kb,
)


def test_save_load_roundtrip(tmp_path):
    kb = KnowledgeBase()
    prefix = str(tmp_path / "data" / "kb_index_default")
    save_kb(kb, prefix)
    kb2 = load_kb(prefix)
    assert len(kb2.rows) == len(kb.rows)
    assert np.allclose(kb2.matrix, kb.matrix)
    # search behaves identically after reload
    vec = kb.encoder.encode(["糖尿病 diabetes DM"])[0]
    assert kb.candidates(vec, "疾病", 5) == kb2.candidates(vec, "疾病", 5)


def test_incremental_add():
    kb = KnowledgeBase()
    n0 = len(kb.rows)
    kb_add(kb, {"id": "drug_x1", "name": "测试新药", "type": "药物",
                "aliases": ["testdrug"], "definition": "测试用药物",
                "attributes": "{}"})
    assert len(kb.rows) == n0 + 1
    assert kb.matrix.shape[0] == n0 + 1
    # the new entity is retrievable as its own best match
    vec = kb.encoder.encode(["测试新药 testdrug 测试用药物"])[0]
    top = kb.candidates(vec, "药物", 3)
    assert kb.rows[top[0][0]]["id"] == "drug_x1"


def test_kb_stats():
    kb = KnowledgeBase()
    s = kb_stats(kb)
    assert s["entities"] == len(kb.rows)
    assert s["dim"] == 1024
    assert s["types"]["疾病"] > 0
    assert sum(s["types"].values()) == s["entities"]


def test_router():
    kb_a = KnowledgeBase()
    kb_b = KnowledgeBase(entities=[])
    router = KBRouter({"default": kb_a, "empty": kb_b}, "default")
    assert router.resolve() is kb_a
    assert router.resolve("empty") is kb_b
    assert router.keys() == ["default", "empty"]
    assert router.counts()["empty"] == 0
    with pytest.raises(KeyError):
        router.resolve("nope")
    with pytest.raises(ValueError):
        KBRouter({"a": kb_a}, "missing")
