"""The two entity→text builders.

The reference deliberately uses TWO different text representations
(conformance-critical asymmetry, SURVEY.md §2.2 M1/M2):

- ``rerank_text`` (M1, disambiguation.py:427-437): name + aliases +
  definition — NO attributes.  Fed to the CrossEncoder.
- ``embed_text``  (M2, vectorization.py:345-366): name + aliases +
  definition + one ``"{key}: {', '.join(values)}"`` segment per attribute.
  Fed to the embedding model.

Both join segments with a single space.  Do not unify them.
"""
from __future__ import annotations

import json
from collections.abc import Mapping, Sequence
from typing import Any


def rerank_text(
    name: str,
    aliases: Sequence[str] | None,
    definition: str | None,
) -> str:
    """M1 — disambiguation.py:427-437."""
    parts = [name]
    if aliases:
        parts.extend(aliases)
    if definition:
        parts.append(definition)
    return " ".join(parts)


def embed_text(
    name: str,
    aliases: Sequence[str] | None,
    definition: str | None,
    attributes: Mapping[str, Any] | str | None,
) -> str:
    """M2 — vectorization.py:345-366.  ``attributes`` may arrive as a JSON
    string (the storage representation, neo4j_database.py:163) or a dict."""
    parts = [name]
    if aliases:
        parts.extend(aliases)
    if definition:
        parts.append(definition)
    attrs = attributes
    if isinstance(attrs, str):
        try:
            attrs = json.loads(attrs) if attrs else None
        except (ValueError, TypeError):
            attrs = None
    if attrs:
        for key, value in attrs.items():
            if isinstance(value, list):
                parts.append(f"{key}: {', '.join(str(v) for v in value)}")
            else:
                parts.append(f"{key}: {value}")
    return " ".join(parts)
