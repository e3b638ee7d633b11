"""FAISS flat-index artifact interop (S13 migration path).

The reference persists its vector index as ``faiss_index_{key}.index``
(``faiss.write_index`` of an ``IndexFlatIP``) plus ``..._{key}.mapping``
(a pickled ``{position: entity_id}`` dict) — services/vectorization.py:
536-591 — and ships a 4-vector example under ``data/``.  A migrating user
needs their existing artifacts readable WITHOUT rebuilding, and exports
readable by their existing faiss tooling.

``faiss`` itself is not installed in this environment, so the flat-index
file format is implemented directly from its public on-disk layout
(faiss/impl/index_read.cpp / index_write.cpp — BSD-licensed public
format):

    fourcc (4 bytes)          "IxFI" = IndexFlatIP, "IxF2" = IndexFlatL2
                              (legacy float storage, written by every
                              faiss version ≥0.x and still read by all);
                              "IxFl" = current unified flat codes format
    header                    d:int32, ntotal:int64, dummy:int64 ×2
                              (=1<<20), is_trained:uint8, metric:int32
                              (0 = inner product, 1 = L2)
    vector payload            size:uint64 then data — float32[size] for
                              legacy fourccs, uint8[size] (=ntotal*d*4
                              bytes of float32 codes) for "IxFl"

Writes use the legacy layout (maximally compatible).  When the real
``faiss`` package IS importable, a cross-check test validates both
directions against it (skipped otherwise; the shipped reference artifact
serves as the ground-truth fixture either way).
"""
from __future__ import annotations

import os
import pickle
import struct

import numpy as np

_DUMMY = 1 << 20  # faiss io_macros legacy header filler

_LEGACY_FOURCC = {b"IxFI": "ip", b"IxF2": "l2"}
_METRIC_CODE = {"ip": 0, "l2": 1}


def read_faiss_flat(path: str) -> tuple[np.ndarray, str]:
    """Read a faiss IndexFlat file → ((ntotal, d) float32 matrix, metric).

    Supports the legacy float fourccs ("IxFI"/"IxF2") and the current
    unified "IxFl" codes layout."""
    with open(path, "rb") as f:
        data = f.read()
    fourcc = data[:4]
    off = 4
    d, = struct.unpack_from("<i", data, off)
    off += 4
    ntotal, = struct.unpack_from("<q", data, off)
    off += 8
    off += 16  # two legacy dummy int64s
    off += 1  # is_trained (flat indexes are always trained)
    metric_code, = struct.unpack_from("<i", data, off)
    off += 4
    if fourcc in _LEGACY_FOURCC:
        metric = _LEGACY_FOURCC[fourcc]
        size, = struct.unpack_from("<Q", data, off)
        off += 8
        if size != ntotal * d:
            raise ValueError(
                f"corrupt flat index: vector size {size} != "
                f"ntotal*d = {ntotal * d}")
        mat = np.frombuffer(data, dtype="<f4", count=size, offset=off)
    elif fourcc == b"IxFl":
        metric = "ip" if metric_code == 0 else "l2"
        size, = struct.unpack_from("<Q", data, off)
        off += 8
        if size != ntotal * d * 4:
            raise ValueError(
                f"corrupt flat-codes index: byte size {size} != "
                f"ntotal*d*4 = {ntotal * d * 4}")
        mat = np.frombuffer(data, dtype="<f4", count=ntotal * d, offset=off)
    else:
        raise ValueError(
            f"unsupported faiss index type {fourcc!r} — only flat indexes "
            "(IndexFlatIP/IndexFlatL2) are interoperable; the reference "
            "persists IndexFlatIP (vectorization.py:516)")
    return mat.reshape(ntotal, d).copy(), metric


def write_faiss_flat(path: str, matrix: np.ndarray,
                     metric: str = "ip") -> None:
    """Write an (n, d) matrix as a faiss-readable legacy IndexFlat file
    (atomic: tmp + rename)."""
    if metric not in _METRIC_CODE:
        raise ValueError(f"metric must be 'ip' or 'l2', got {metric!r}")
    mat = np.ascontiguousarray(matrix, dtype="<f4")
    if mat.ndim != 2:
        raise ValueError(f"matrix must be 2-D, got shape {mat.shape}")
    n, d = mat.shape
    fourcc = b"IxFI" if metric == "ip" else b"IxF2"
    buf = bytearray()
    buf += fourcc
    buf += struct.pack("<i", d)
    buf += struct.pack("<q", n)
    buf += struct.pack("<qq", _DUMMY, _DUMMY)
    buf += struct.pack("<b", 1)  # is_trained
    buf += struct.pack("<i", _METRIC_CODE[metric])
    buf += struct.pack("<Q", n * d)
    buf += mat.tobytes(order="C")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(buf))
    os.replace(tmp, path)


def read_faiss_artifacts(prefix: str) -> tuple[np.ndarray, list[str], str]:
    """Reference artifact pair ``{prefix}.index`` + ``{prefix}.mapping`` →
    (matrix, ids-in-position-order, metric).  The mapping pickle is the
    reference's ``{position: entity_id}`` dict (vectorization.py:559)."""
    mat, metric = read_faiss_flat(prefix + ".index")
    with open(prefix + ".mapping", "rb") as f:
        mapping = pickle.load(f)
    if not isinstance(mapping, dict):
        raise ValueError(
            f"mapping file {prefix + '.mapping'!r} is not a position→id "
            f"dict (got {type(mapping).__name__})")
    if len(mapping) != mat.shape[0]:
        raise ValueError(
            f"mapping has {len(mapping)} entries but index holds "
            f"{mat.shape[0]} vectors")
    ids = [str(mapping[i]) for i in range(mat.shape[0])]
    return mat, ids, metric


def write_faiss_artifacts(prefix: str, matrix: np.ndarray,
                          ids: list[str], metric: str = "ip") -> None:
    """Write the reference's artifact pair — importable by its
    ``load_index`` (vectorization.py:565-591) with real faiss."""
    if len(ids) != len(matrix):
        raise ValueError(f"{len(ids)} ids for {len(matrix)} vectors")
    write_faiss_flat(prefix + ".index", matrix, metric=metric)
    tmp = prefix + ".mapping.tmp"
    with open(tmp, "wb") as f:
        pickle.dump({i: str(e) for i, e in enumerate(ids)}, f)
    os.replace(tmp, prefix + ".mapping")


def kb_to_faiss(kb, prefix: str) -> None:
    """Export a KnowledgeBase's embedding matrix + entity ids as reference
    faiss artifacts (the inverse of ``kb_from_faiss``)."""
    write_faiss_artifacts(prefix, kb.matrix,
                          [r["id"] for r in kb.rows], metric="ip")


def kb_from_faiss(prefix: str, entities: list[dict], cfg=None):
    """Build a KnowledgeBase from reference faiss artifacts + entity rows.

    The index holds only vectors; entity metadata (name/type/aliases/...)
    comes from ``entities`` (e.g. an exported entities table), matched to
    the index by id.  Vectors are used AS STORED — no re-encoding, so a
    migrating user keeps their original BGE-M3 embeddings."""
    from ..config import DEFAULT_CONFIG
    from ..stages.disambiguate import KnowledgeBase

    mat, ids, metric = read_faiss_artifacts(prefix)
    if metric != "ip":
        raise ValueError(
            "reference KBs use inner-product indexes (IndexFlatIP); got "
            f"an {metric!r} index")
    by_id = {str(e["id"]): e for e in entities}
    missing = [i for i in ids if i not in by_id]
    if missing:
        raise ValueError(
            f"{len(missing)} index ids missing from the entities rows "
            f"(first: {missing[:3]})")
    rows = [by_id[i] for i in ids]
    return KnowledgeBase(entities=rows, cfg=cfg or DEFAULT_CONFIG,
                         matrix=mat)
