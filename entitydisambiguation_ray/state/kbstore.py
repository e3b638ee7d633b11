"""Knowledge-base persistence, incremental add, stats, multi-KB routing.

Reference parity:
- **S13** (FAISS index save/load, vectorization.py:536-591): the engine's
  index is derived state — a numpy matrix + row metadata per KB — persisted
  as ``{prefix}_{key}.npz`` + ``{prefix}_{key}.rows.json`` (replacing the
  reference's ``.index`` + pickled ``.mapping`` pair; JSON over pickle for
  cross-version stability).
- **A4** (incremental add, vectorization.py:691-732): ``KnowledgeBase.add``
  appends one entity + its vector; unlike the reference, persisting is the
  caller's explicit choice rather than a full re-write per add.
- **G4** (index stats, vectorization.py:734-765): ``kb_stats``.
- **S15** (multi-DB router, database_factory.py:100-151): ``KBRouter`` maps
  db_key → KnowledgeBase with default-key resolution and validation; each
  key is an independent output namespace.
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.textbuild import embed_text, rerank_text
from ..stages.disambiguate import KnowledgeBase


def kb_add(kb: KnowledgeBase, row: dict) -> None:
    """A4: incremental entity add (content dict with id/name/type/aliases/
    definition/attributes).  Applies the same M11 defensive alias parse as
    the KnowledgeBase constructor."""
    from ..stages.disambiguate import _parse_aliases

    row = dict(row)
    row["aliases"] = _parse_aliases(row.get("aliases"))
    row.setdefault("source", None)
    row.setdefault("create_time", None)
    row["rerank_text"] = rerank_text(row["name"], row["aliases"],
                                     row.get("definition"))
    from ..functions.scoring import MentionPre

    row["_pre"] = MentionPre(row["name"], row["aliases"], row.get("type"),
                             row["rerank_text"])
    vec = kb.encoder.encode([embed_text(row["name"], row["aliases"],
                                        row.get("definition"),
                                        row.get("attributes"))])
    kb.rows.append(row)
    kb.matrix = np.vstack([kb.matrix, vec]) if kb.matrix.size else vec
    kb.norms = np.append(kb.norms, np.linalg.norm(vec))
    kb.types = np.append(kb.types, row.get("type") or "")
    t = row.get("type")
    if t:
        idx = len(kb.rows) - 1
        prev = kb.by_type.get(t)
        kb.by_type[t] = (np.append(prev, idx) if prev is not None
                         else np.array([idx], dtype=np.int64))


def save_kb(kb: KnowledgeBase, prefix: str) -> None:
    """S13: persist matrix + row metadata (atomic-enough: tmp + rename)."""
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    np.savez_compressed(prefix + ".npz.tmp.npz", matrix=kb.matrix)
    os.replace(prefix + ".npz.tmp.npz", prefix + ".npz")
    rows = [
        {k: (v.isoformat() if hasattr(v, "isoformat") else v)
         for k, v in r.items()
         # derived per-actor fields (rerank text, precomputed string
         # forms) are rebuilt at load time, never persisted
         if k != "rerank_text" and not k.startswith("_")}
        for r in kb.rows
    ]
    tmp = prefix + ".rows.json.tmp"
    with open(tmp, "w") as f:
        json.dump(rows, f, ensure_ascii=False)
    os.replace(tmp, prefix + ".rows.json")


def load_kb(prefix: str, cfg: EngineConfig = DEFAULT_CONFIG) -> KnowledgeBase:
    with open(prefix + ".rows.json") as f:
        rows = json.load(f)
    matrix = np.load(prefix + ".npz")["matrix"]
    # pass the persisted matrix into the constructor so the KB is NOT
    # re-encoded on load (the point of persisting the index)
    return KnowledgeBase(entities=rows, cfg=cfg, matrix=matrix)


def kb_stats(kb: KnowledgeBase) -> dict:
    """G4: index stats."""
    return {
        "entities": len(kb.rows),
        "dim": int(kb.matrix.shape[1]) if kb.matrix.size else kb.cfg.embedding_dim,
        "types": {t: int(len(v)) for t, v in sorted(kb.by_type.items())},
        "encoder": kb.cfg.encoder,
    }


class KBRouter:
    """S15: db_key → KnowledgeBase registry with default-key resolution."""

    def __init__(self, kbs: dict[str, KnowledgeBase], default_key: str):
        if default_key not in kbs:
            raise ValueError(f"default key {default_key!r} not registered")
        self.kbs = dict(kbs)
        self.default_key = default_key

    def resolve(self, db_key: str | None = None) -> KnowledgeBase:
        key = db_key or self.default_key
        kb = self.kbs.get(key)
        if kb is None:
            raise KeyError(
                f"unknown database key {key!r}; known: {sorted(self.kbs)}")
        return kb

    def keys(self) -> list[str]:
        return sorted(self.kbs)

    def counts(self) -> dict[str, int]:
        """G3: per-DB entity counts (database_factory.py:121-148)."""
        return {k: len(kb.rows) for k, kb in sorted(self.kbs.items())}
