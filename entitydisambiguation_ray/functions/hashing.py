"""Stable hashing and deterministic id generation.

The reference generates ids as ``{prefix}_{YYYYmmddHHMMSS}_{abs(hash(name)) %
10000:04d}`` (neo4j_database.py:473-488) — Python's ``hash`` is process-salted
and the timestamp is wall-clock, so ids are NOT reproducible across processes
or retries.  SURVEY.md §1.2 / §2.2 M12 mandates a deliberate semantic fix:
sha1-based, fully deterministic ids that are idempotent under task retries and
identical at any parallelism level.
"""
from __future__ import annotations

import hashlib

from ..config import DEFAULT_PREFIX, TYPE_PREFIX


def sha1_hex(text: str) -> str:
    return hashlib.sha1(text.encode("utf-8")).hexdigest()


def sha256_bytes(text: str) -> bytes:
    return hashlib.sha256(text.encode("utf-8")).digest()


def stable_hash64(text: str) -> int:
    """First 8 bytes of sha1 as an unsigned 64-bit int (partitioning keys)."""
    return int.from_bytes(hashlib.sha1(text.encode("utf-8")).digest()[:8], "big")


def type_prefix(entity_type: str | None) -> str:
    """Reference prefix map (neo4j_database.py:475-485): known Chinese type →
    english prefix, unknown type → 'other'... no: unknown → 'entity';
    the literal '其他' maps to 'other'."""
    if not entity_type:
        return DEFAULT_PREFIX
    return TYPE_PREFIX.get(entity_type, DEFAULT_PREFIX)


def generate_entity_id(name: str, entity_type: str | None = None) -> str:
    """Deterministic replacement for neo4j_database.py:473-488:
    ``{prefix}_{sha1(name)[:12]}`` (documented deviation, SURVEY.md M12)."""
    return f"{type_prefix(entity_type)}_{sha1_hex(name)[:12]}"


def mention_signature(embed_text: str, entity_type: str | None) -> str:
    """Dedup key for identical disambiguation tasks: two mentions with the
    same embedding text (M2) and type receive identical candidates and
    scores, so they are disambiguated once (hot-key collapse)."""
    return sha1_hex(f"{entity_type or ''}\x00{embed_text}")[:20]
