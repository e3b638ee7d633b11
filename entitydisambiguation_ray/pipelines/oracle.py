"""Sequential oracle: the reference's online one-at-a-time semantics.

A single-process, pure-Python re-implementation of the reference's request
loop (SURVEY.md §5.1): mentions are processed strictly in corpus order
(url, sent_idx, subj-before-obj); each ``auto_decide`` sees the KB state
left by all previous decisions (services/disambiguation.py:120-166 + the
upstream's write-back closing the loop, SURVEY.md §3.2 note); CREATE inserts
the new entity into the KB and the index (vectorization.py:691-732
incremental add).  AMBIGUOUS mutates nothing (human-review bucket), but for
graph materialization its mentions canonicalize to the same deterministic
generated id the pipeline uses.

The oracle shares every scoring/search function with the distributed
pipeline (KnowledgeBase.candidates, comprehensive_score, make_decision,
extract_text, extract_triples, the mention dictionary), so any P/R gap
measured against it isolates the ORDER semantics — exactly the batch-vs-
online delta SURVEY.md §7.4 calls out — rather than implementation drift.
"""
from __future__ import annotations

from collections.abc import Iterable

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.extract import extract_text
from ..functions.hashing import generate_entity_id, mention_signature
from ..functions.scoring import (
    CREATE,
    MERGE,
    comprehensive_score,
    make_decision,
)
from ..functions.svo import extract_triples
from ..functions.textbuild import embed_text, rerank_text
from ..sources.seed import kb_vocab
from ..stages.disambiguate import KnowledgeBase


class OnlineOracle:
    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.kb = KnowledgeBase(cfg=cfg)
        self.dict = kb_vocab(cfg)[0]
        self.decisions: list[dict] = []
        self._canon_by_sig: dict[str, str] = {}

    def _mention(self, surface: str) -> dict:
        entry = self.dict.get(surface)
        if entry is not None:
            name, etype = entry.name, entry.type
            aliases = list(entry.aliases)
            definition, attributes = entry.definition, entry.attributes
        else:
            name, etype, aliases, definition, attributes = (
                surface, None, [], None, "{}")
        etext = embed_text(name, aliases, definition, attributes)
        return {
            "name": name, "type": etype, "aliases": aliases,
            "definition": definition, "attributes": attributes,
            "rerank_text": rerank_text(name, aliases, definition),
            "embed_text": etext,
            "sig": mention_signature(etext, etype),
        }

    def _kb_add(self, m: dict, entity_id: str):
        # shared incremental-add bookkeeping (state/kbstore.kb_add —
        # vstack matrix, norms/types append, by_type index); one copy of
        # the KB-mutation invariants for oracle and engine alike
        from ..state.kbstore import kb_add

        kb_add(self.kb, {
            "id": entity_id, "name": m["name"], "type": m["type"],
            "aliases": list(m["aliases"]), "definition": m["definition"],
            "attributes": m["attributes"], "source": "oracle-created",
        })

    def decide(self, surface: str) -> str:
        """Process one mention occurrence online; returns canonical id."""
        m = self._mention(surface)
        vec = self.kb.encoder.encode([m["embed_text"]])[0]
        cands = self.kb.candidates(vec, m["type"], self.cfg.faiss_top_k)
        if not cands:
            decision, best, best_row = CREATE, None, None
        else:
            best = None
            best_row = None
            for i, bge in cands:
                row = self.kb.rows[i]
                s = comprehensive_score(
                    m["name"], m["aliases"], m["type"], m["rerank_text"],
                    row["name"], row["aliases"], row["type"], row["rerank_text"],
                    bge, self.cfg)
                if best is None or s.final_score > best.final_score:
                    best, best_row = s, row
            decision = make_decision(best.final_score, cfg=self.cfg)
        if decision == MERGE:
            canonical = best_row["id"]
        else:
            canonical = generate_entity_id(m["name"], m["type"])
            if decision == CREATE and not any(
                r["id"] == canonical for r in self.kb.rows
            ):
                self._kb_add(m, canonical)
        self.decisions.append({
            "sig": m["sig"], "name": m["name"], "type": m["type"],
            "decision": decision,
            "final_score": best.final_score if best else 0.0,
            "canonical_id": canonical,
        })
        self._canon_by_sig[m["sig"]] = canonical
        return canonical

    def run(self, pages: Iterable[dict]) -> list[tuple[str, str, str]]:
        """pages (dict rows with url/html, pre-sorted by url) → canonical
        triple set [(src_id, rel_type, dst_id), ...]."""
        triples_out: list[tuple[str, str, str]] = []
        for page in pages:
            text = extract_text(page["html"])
            for subj, rel, obj, sent_idx in extract_triples(text):
                src = self.decide(subj)
                dst = self.decide(obj)
                triples_out.append((src, rel, dst))
        return triples_out


def precision_recall(
    predicted: set[tuple], golden: set[tuple]
) -> tuple[float, float]:
    if not predicted or not golden:
        return (0.0, 0.0)
    tp = len(predicted & golden)
    return tp / len(predicted), tp / len(golden)
