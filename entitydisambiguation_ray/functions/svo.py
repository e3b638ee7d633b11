"""Deterministic sentence splitting + SVO/OpenIE-pattern triple extraction.

The reference has no triple extractor (the north rule adds it); semantics are
engine-defined and shared verbatim between the distributed pipeline and the
sequential oracle, so extraction can never diverge between the two.

Rules:
- sentences: extracted text is split per line, then on sentence-final
  punctuation (。！？ for Chinese; . ! ? for English, where '.' only splits
  when followed by whitespace/EOL to spare abbreviations/decimals);
- predicates: a fixed bilingual lexicon, matched longest-first at the
  EARLIEST position in the sentence; subject = trimmed text before, object =
  trimmed text after;
- a triple is rejected when subject or object is empty or longer than 80
  characters (boilerplate guard);
- predicate surfaces are canonicalized to stable relation ids (the
  ``rel_type`` written to the edges table, mirroring the reference's
  ``[:RELATIONSHIP {type}]`` property, neo4j_database.py:402-435).
"""
from __future__ import annotations

import re
from collections.abc import Iterator

# canonical relation id → surface forms (zh + en).  Longest-first matching.
PREDICATES: dict[str, list[str]] = {
    "treats": ["治疗", " treats "],
    "causes": ["引起", "导致", " causes "],
    "contains": ["包含", " contains "],
    "located_in": ["位于", " is located in "],
    "part_of": ["属于", " is part of "],
    "inhibits": ["抑制", " inhibits "],
    "interacts_with": ["相互作用于", " interacts with "],
    "is_a": ["是一种", " is a "],
}

_SURFACE_TO_REL: list[tuple[str, str]] = sorted(
    ((surf, rel) for rel, surfs in PREDICATES.items() for surf in surfs),
    key=lambda x: -len(x[0]),
)

_RE_SENT_SPLIT = re.compile(r"[。！？!?]|\.(?=\s|$)")
_RE_TRIM = re.compile(r"^[\s,，、:：;；\"'“”]+|[\s,，、:：;；\"'“”]+$")

MAX_ARG_LEN = 80


def split_sentences(text: str) -> list[str]:
    """Deterministic sentence segmentation over extracted text."""
    out = []
    for line in text.split("\n"):
        for sent in _RE_SENT_SPLIT.split(line):
            sent = sent.strip()
            if sent:
                out.append(sent)
    return out


def _trim(arg: str) -> str:
    return _RE_TRIM.sub("", arg)


def extract_triples(text: str) -> Iterator[tuple[str, str, str, int]]:
    """Yield (subj, rel_type, obj, sent_idx) from extracted page text."""
    for idx, sent in enumerate(split_sentences(text)):
        best_pos = -1
        best_surf = ""
        best_rel = ""
        for surf, rel in _SURFACE_TO_REL:
            pos = sent.find(surf)
            if pos >= 0 and (best_pos < 0 or pos < best_pos
                             or (pos == best_pos and len(surf) > len(best_surf))):
                best_pos, best_surf, best_rel = pos, surf, rel
        if best_pos <= 0:
            continue
        subj = _trim(sent[:best_pos])
        obj = _trim(sent[best_pos + len(best_surf):])
        if not subj or not obj:
            continue
        if len(subj) > MAX_ARG_LEN or len(obj) > MAX_ARG_LEN:
            continue
        yield subj, best_rel, obj, idx
