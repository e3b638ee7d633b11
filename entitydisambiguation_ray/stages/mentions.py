"""Mention building: triples → entity mentions (dictionary-enriched).

The dictionary half of "dictionary-plus-embedding candidate generation"
(north star): every subject/object surface becomes a mention; surfaces found
in the mention dictionary are enriched with type/aliases/definition/
attributes, unknown surfaces become bare untyped mentions.

The mention signature (``functions/hashing.mention_signature``) is a pure
function of the mention content, so identical disambiguation tasks collapse
to one unit of work — this is both the exact-dedup operator (SURVEY.md §2.7)
and the hot-key skew answer: "United States"-class mentions appearing on 20%
of pages become ONE scoring task instead of millions.

Implemented as a callable class → Ray actor pool: the dictionary is built
once per actor in ``__init__`` (it is deterministic and cheap, so workers
rebuild it locally instead of shipping it through the object store; a
user-supplied external dictionary would be broadcast via ``ray.put`` and
passed as an object ref in ``fn_constructor_kwargs`` instead).
"""
from __future__ import annotations

import json

import pyarrow as pa

from ..functions.hashing import mention_signature
from ..functions.textbuild import embed_text, rerank_text
from ..sources.seed import (
    build_seed_entities,
    build_vocab,
    kb_cache_key,
    kb_vocab,
)

MENTION_SCHEMA = pa.schema(
    [
        ("sig", pa.string()),
        ("url", pa.string()),
        ("sent_idx", pa.int32()),
        ("role", pa.string()),  # subj | obj
        ("first_occ", pa.string()),  # sortable corpus position "url|sent|role"
        ("name", pa.string()),
        ("type", pa.string()),
        ("aliases_json", pa.string()),
        ("definition", pa.string()),
        ("attributes", pa.string()),
        ("rerank_text", pa.string()),
        ("embed_text", pa.string()),
    ]
)


class MentionBuilder:
    """triples(url, subj, pred, obj, sent_idx) → mentions."""

    def __init__(self, mention_dict=None):
        if mention_dict is None:
            mention_dict = build_vocab(build_seed_entities())[0]
        self.dict = mention_dict
        # per-surface memo of the fully-built mention row (hot surfaces
        # repeat millions of times at scale; build each once per actor)
        self._memo: dict[str, tuple] = {}

    def _mention_for(self, surface: str) -> tuple:
        row = self._memo.get(surface)
        if row is None:
            entry = self.dict.get(surface)
            if entry is not None:
                name, etype = entry.name, entry.type
                aliases = list(entry.aliases)
                definition, attributes = entry.definition, entry.attributes
            else:
                name, etype, aliases, definition, attributes = (
                    surface, None, [], None, "{}")
            rtext = rerank_text(name, aliases, definition)
            etext = embed_text(name, aliases, definition, attributes)
            sig = mention_signature(etext, etype)
            row = (sig, name, etype, json.dumps(aliases, ensure_ascii=False),
                   definition, attributes, rtext, etext)
            self._memo[surface] = row
        return row

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in MENTION_SCHEMA.names}
        url_col = batch.column("url").to_pylist()
        subj_col = batch.column("subj").to_pylist()
        obj_col = batch.column("obj").to_pylist()
        sent_col = batch.column("sent_idx").to_pylist()
        for url, subj, obj, sent_idx in zip(url_col, subj_col, obj_col,
                                            sent_col):
            for role, surface in (("subj", subj), ("obj", obj)):
                (sig, name, etype, aliases_json, definition, attributes,
                 rtext, etext) = self._mention_for(surface)
                cols["sig"].append(sig)
                cols["url"].append(url)
                cols["sent_idx"].append(sent_idx)
                cols["role"].append(role)
                # "a" < "b": subj precedes obj at the same sentence position
                cols["first_occ"].append(
                    f"{url}|{sent_idx:06d}|{'a' if role == 'subj' else 'b'}")
                cols["name"].append(name)
                cols["type"].append(etype)
                cols["aliases_json"].append(aliases_json)
                cols["definition"].append(definition)
                cols["attributes"].append(attributes)
                cols["rerank_text"].append(rtext)
                cols["embed_text"].append(etext)
        return pa.table(cols, schema=MENTION_SCHEMA)


def unique_mentions_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: keep the min-``first_occ`` row per sig
    (pre-aggregation before the global dedup — SURVEY.md §4).  Rows of a sig
    are content-identical except ``first_occ``; keeping the corpus-earliest
    occurrence makes the downstream round-2 canonical representative match
    the online oracle's "first create wins" semantics order-freely."""
    best: dict[str, int] = {}
    sigs = batch.column("sig").to_pylist()
    if "first_occ" in batch.column_names:
        occs = batch.column("first_occ").to_pylist()
        for i, (s, o) in enumerate(zip(sigs, occs)):
            j = best.get(s)
            if j is None or o < occs[j]:
                best[s] = i
    else:
        for i, s in enumerate(sigs):
            best.setdefault(s, i)
    return batch.take(sorted(best.values()))


_BUILDERS: dict[tuple | None, MentionBuilder] = {}


def get_builder(cfg=None) -> MentionBuilder:
    """Process-global builder: the dictionary is built once per WORKER
    PROCESS and shared by every task that runs there.  Running mention
    building as stateless tasks over warm workers avoids spawning dedicated
    actor processes (each of which pays a fresh interpreter + package import
    — measured to dominate wall time at high concurrency); an actor pool
    remains the right shape only when state is too big to rebuild per worker
    (e.g. a model), which this dictionary is not.

    Keyed by ``kb_cache_key(cfg)`` (path + file fingerprint) so incremental
    runs (KB = a prior run's entities table) build their dictionary from
    the same KB the disambiguator searches, even when a chained run
    rewrites the same path in-session."""
    key = kb_cache_key(cfg)
    b = _BUILDERS.get(key)
    if b is None:
        if len(_BUILDERS) > 4:
            _BUILDERS.clear()
        b = MentionBuilder(kb_vocab(cfg)[0])
        _BUILDERS[key] = b
    return b


def build_mentions_batch(batch: pa.Table, *, cfg=None) -> pa.Table:
    return get_builder(cfg)(batch)


def surface_sig(surface: str, mention_dict) -> str:
    """Recompute a surface's signature without materializing the mention —
    used by the edge-rewrite stage so triples never need a join back to the
    mentions table."""
    entry = mention_dict.get(surface)
    if entry is not None:
        etext = embed_text(entry.name, entry.aliases, entry.definition,
                           entry.attributes)
        return mention_signature(etext, entry.type)
    return mention_signature(embed_text(surface, [], None, None), None)
