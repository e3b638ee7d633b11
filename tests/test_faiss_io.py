"""FAISS flat-index artifact interop (state/faiss_io.py) against the
reference's SHIPPED artifacts (/root/reference/data/faiss_index.index +
.mapping — ground truth written by real faiss via vectorization.py:557-560)
plus round-trip and KB-integration coverage."""
import os

import numpy as np
import pytest

from entitydisambiguation_ray.state.faiss_io import (
    kb_from_faiss,
    kb_to_faiss,
    read_faiss_artifacts,
    read_faiss_flat,
    write_faiss_artifacts,
    write_faiss_flat,
)

REF_PREFIX = "/root/reference/data/faiss_index"


@pytest.mark.skipif(not os.path.exists(REF_PREFIX + ".index"),
                    reason="reference artifact not present")
def test_read_reference_shipped_artifact():
    mat, ids, metric = read_faiss_artifacts(REF_PREFIX)
    assert metric == "ip"  # IndexFlatIP (vectorization.py:516)
    assert mat.shape == (4, 1024)  # 4 example entities, BGE-M3 dim 1024
    assert mat.dtype == np.float32
    assert ids == ["entity1", "entity2", "entity3", "entity4"]
    # BGE-M3 dense vectors are L2-normalized — the shipped vectors must be
    norms = np.linalg.norm(mat, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-3)


@pytest.mark.skipif(not os.path.exists(REF_PREFIX + ".index"),
                    reason="reference artifact not present")
def test_reference_artifact_rewrites_byte_identical(tmp_path):
    """Reading the shipped index and re-writing it must reproduce the file
    byte for byte (same legacy IxFI layout faiss wrote)."""
    mat, ids, _ = read_faiss_artifacts(REF_PREFIX)
    out = str(tmp_path / "rt")
    write_faiss_artifacts(out, mat, ids, metric="ip")
    with open(REF_PREFIX + ".index", "rb") as f:
        ref_bytes = f.read()
    with open(out + ".index", "rb") as f:
        got_bytes = f.read()
    assert got_bytes == ref_bytes


def test_flat_roundtrip_both_metrics(tmp_path):
    rng = np.random.default_rng(5)
    mat = rng.standard_normal((7, 16)).astype(np.float32)
    for metric in ("ip", "l2"):
        p = str(tmp_path / f"m_{metric}.index")
        write_faiss_flat(p, mat, metric=metric)
        got, m2 = read_faiss_flat(p)
        assert m2 == metric
        assert np.array_equal(got, mat)


def test_artifact_validation(tmp_path):
    rng = np.random.default_rng(6)
    mat = rng.standard_normal((3, 8)).astype(np.float32)
    with pytest.raises(ValueError):
        write_faiss_artifacts(str(tmp_path / "x"), mat, ["a", "b"])
    with pytest.raises(ValueError):
        write_faiss_flat(str(tmp_path / "y.index"), mat, metric="cosine")
    # unsupported fourcc
    bad = tmp_path / "bad.index"
    bad.write_bytes(b"IvFl" + b"\x00" * 64)
    with pytest.raises(ValueError, match="unsupported"):
        read_faiss_flat(str(bad))


def test_kb_export_import_roundtrip(tmp_path):
    """KB → faiss artifacts → KB preserves ids, vectors (no re-encoding)
    and candidate retrieval results."""
    from entitydisambiguation_ray.config import DEFAULT_CONFIG
    from entitydisambiguation_ray.stages.disambiguate import KnowledgeBase

    kb = KnowledgeBase(cfg=DEFAULT_CONFIG)
    prefix = str(tmp_path / "kbx")
    kb_to_faiss(kb, prefix)
    # entity rows as a migrating user would have them (entities table)
    ents = [{k: r[k] for k in ("id", "name", "type", "aliases",
                               "definition", "attributes")}
            for r in kb.rows]
    kb2 = kb_from_faiss(prefix, ents, cfg=DEFAULT_CONFIG)
    assert [r["id"] for r in kb2.rows] == [r["id"] for r in kb.rows]
    assert np.array_equal(kb2.matrix, kb.matrix)
    q = kb.matrix[3]
    assert kb.candidates(q, None, 5) == kb2.candidates(q, None, 5)


def test_kb_from_faiss_missing_entity_rows(tmp_path):
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((2, 8)).astype(np.float32)
    prefix = str(tmp_path / "mm")
    write_faiss_artifacts(prefix, mat, ["e1", "e2"])
    with pytest.raises(ValueError, match="missing"):
        kb_from_faiss(prefix, [{"id": "e1", "name": "a", "type": None,
                                "aliases": [], "definition": "",
                                "attributes": None}])


@pytest.mark.skipif(
    not pytest.importorskip("importlib").util.find_spec("faiss"),
    reason="real faiss not installed")
def test_cross_check_with_real_faiss(tmp_path):  # pragma: no cover
    import faiss

    rng = np.random.default_rng(8)
    mat = rng.standard_normal((5, 12)).astype(np.float32)
    idx = faiss.IndexFlatIP(12)
    idx.add(mat)
    p = str(tmp_path / "real.index")
    faiss.write_index(idx, p)
    got, metric = read_faiss_flat(p)
    assert metric == "ip" and np.array_equal(got, mat)
    p2 = str(tmp_path / "ours.index")
    write_faiss_flat(p2, mat, metric="ip")
    idx2 = faiss.read_index(p2)
    assert idx2.ntotal == 5 and idx2.d == 12
