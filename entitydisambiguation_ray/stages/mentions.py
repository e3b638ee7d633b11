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
        """Vectorized: per-batch work is one unique() over surfaces, one
        ``_mention_for`` per UNIQUE surface (memoized across batches), and
        Arrow gathers — the former per-row Python loop appended 12 columns
        per mention in a triples-proportional stage, the exact hot-path
        shape the engine forbids.  Row order (subj then obj per triple,
        interleaved) and every value are byte-identical to the loop."""
        import numpy as np
        import pyarrow.compute as pc

        n = batch.num_rows
        subj = batch.column("subj").combine_chunks()
        obj = batch.column("obj").combine_chunks()
        # interleave subj/obj into one surface array in original row order
        surf_all = pa.chunked_array([subj, obj])
        interleave = np.empty(2 * n, dtype=np.int64)
        interleave[0::2] = np.arange(n)           # subj row i → position 2i
        interleave[1::2] = np.arange(n) + n       # obj  row i → position 2i+1
        surf = surf_all.take(pa.array(interleave)).combine_chunks()
        uniq = pc.unique(surf)
        rows = [self._mention_for(s) for s in uniq.to_pylist()]
        code = pc.index_in(surf, value_set=uniq)  # (2n,) int32 codes
        per_field = list(zip(*rows))  # 8 tuples of len(uniq)
        (sigs, names, etypes, aliases_j, defs, attrs, rtexts,
         etexts) = [pa.array(list(f), pa.string()) for f in per_field]

        def gather(arr: pa.Array) -> pa.Array:
            return pc.take(arr, code)

        rep2 = pa.array(np.repeat(np.arange(n), 2))
        url2 = pc.take(batch.column("url"), rep2)
        sent2 = pc.take(batch.column("sent_idx"), rep2)
        role = pa.array(["subj", "obj"] * n, pa.string())
        # "a" < "b": subj precedes obj at the same sentence position
        role_letter = pa.array(["a", "b"] * n, pa.string())
        sent_pad = pc.utf8_lpad(pc.cast(sent2, pa.string()), 6, "0")
        first_occ = pc.binary_join_element_wise(
            pc.cast(url2, pa.string()), sent_pad, role_letter, "|")
        return pa.table({
            "sig": gather(sigs),
            "url": url2,
            "sent_idx": pc.cast(sent2, pa.int32()),
            "role": role,
            "first_occ": first_occ,
            "name": gather(names),
            "type": gather(etypes),
            "aliases_json": gather(aliases_j),
            "definition": gather(defs),
            "attributes": gather(attrs),
            "rerank_text": gather(rtexts),
            "embed_text": gather(etexts),
        }, schema=MENTION_SCHEMA)


def unique_mentions_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: keep the min-``first_occ`` row per sig
    (pre-aggregation before the global dedup — SURVEY.md §4).  Rows of a sig
    are content-identical except ``first_occ``; keeping the corpus-earliest
    occurrence makes the downstream round-2 canonical representative match
    the online oracle's "first create wins" semantics order-freely."""
    import numpy as np
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return batch
    if "first_occ" in batch.column_names:
        # vectorized keep-min-occ-per-sig (C-speed groupby idxmin; ties
        # resolve to the earliest row index, same as the strict-< loop
        # this replaced)
        import pandas as pd

        df = pd.DataFrame({
            "sig": batch.column("sig").to_pandas(),
            "occ": batch.column("first_occ").to_pandas(),
        })
        keep = df.groupby("sig", sort=False)["occ"].idxmin().to_numpy()
    else:
        code = pc.index_in(batch.column("sig"),
                           value_set=pc.unique(batch.column("sig"))) \
            .to_numpy(zero_copy_only=False)
        # first row index per code
        _, keep = np.unique(code, return_index=True)
    keep.sort()
    return batch.take(pa.array(keep))


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
