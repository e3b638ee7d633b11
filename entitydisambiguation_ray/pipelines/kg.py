"""End-to-end Ray-Data-native KG-construction pipeline.

pages → extract text → SVO triples → mentions (dictionary-enriched) →
unique-mention collapse (combiner + groupby) → disambiguation (actor pool)
→ canonicalization → graph materialization (entities / edges / decisions).

Dataflow (SURVEY.md §3.2 → Ray mapping):

    read/synthesize pages                (streamed blocks)
      map_batches(extract_text_batch)    stateless tasks, html dropped early
      map_batches(triples_batch)         stateless tasks
      map_batches(MentionBuilder)        actor pool (dictionary state)
      map_batches(unique_mentions_partial)  per-batch combiner
      groupby(sig).map_groups(first)     THE wide shuffle — over unique sigs
                                         only, already skew-collapsed because
                                         hot mentions share one sig
      map_batches(Disambiguator)         actor pool (KB + encoder state)
      [broadcast canonical map]          sig → canonical_id (small side)
      map_batches(edge rewrite)          stateless tasks
      groupby(edge_key).map_groups(first)  exact edge dedup
      write_parquet                      partitioned sinks

Nothing materializes the full input: pages stream through extraction;
only the decisions table (≈ distinct mentions, small by construction) is
collected on the driver to build the broadcast canonical map.  At KB sizes
where that map no longer fits, swap the broadcast for a shuffle hash join
on ``sig`` (documented fallback, same semantics).
"""
from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..sources.pages import make_pages_batch
from ..sources.seed import build_seed_entities, build_vocab, seed_entities_table
from ..stages.disambiguate import Disambiguator, disambiguate_batch
from ..stages.extract import extract_text_batch, triples_batch
from ..stages.mentions import (
    MentionBuilder,
    build_mentions_batch,
    surface_sig,
    unique_mentions_partial,
)
from ..stages.partition import dedup_first


def synth_pages_dataset(n_pages: int, seed: int = 42,
                        fillers: list[str] | None = None,
                        override_num_blocks: int | None = None) -> rd.Dataset:
    """Deterministic distributed page synthesis (order-free per index)."""
    ds = rd.range(n_pages, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: make_pages_batch(b["id"], seed=seed, fillers=fillers),
        batch_format="numpy",
        batch_size=DEFAULT_CONFIG.extract_batch_size,
    )


def extract_stage(pages: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    return pages.map_batches(
        extract_text_batch, batch_format="pyarrow",
        batch_size=cfg.extract_batch_size, zero_copy_batch=True,
    )


def triples_stage(extracted: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    return extracted.map_batches(
        triples_batch, batch_format="pyarrow",
        batch_size=cfg.extract_batch_size, zero_copy_batch=True,
    )


def mentions_stage(triples: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG,
                   concurrency: int | tuple | None = None) -> rd.Dataset:
    """Stateless tasks over warm workers; the dictionary is a process-global
    built once per worker (stages/mentions.get_builder rationale)."""
    return triples.map_batches(
        build_mentions_batch, batch_format="pyarrow",
        batch_size=cfg.score_batch_size,
    )


_MENTION_CONTENT_COLS = [
    "sig", "name", "type", "aliases_json", "definition", "attributes",
    "rerank_text", "embed_text",
]


def unique_mentions_stage(mentions: rd.Dataset, exact: bool = True,
                          coalesce: int = 16) -> rd.Dataset:
    """Unique-mention collapse (exact dedup, SURVEY.md §2.7).

    Projects to the content columns FIRST (url/sent_idx/role never reach the
    shuffle — measured to halve the exchange volume), then:

    - ``exact=True`` (default): per-batch combiner + coarse hash-partitioned
      shuffle dedup (stages/partition.py) — P partitions, one vectorized
      dedup kernel each.
    - ``exact=False``: shuffle-free combiner chain (per-batch dedup →
      coalescing repartition → per-block dedup).  Leaves residual cross-block
      duplicates (identical rows, dropped deterministically when the driver
      collects decisions) — only worth it when duplicate mass is dominated
      by a small hot dictionary rather than a saturated id space."""
    partial = mentions.select_columns(_MENTION_CONTENT_COLS).map_batches(
        unique_mentions_partial, batch_format="pyarrow", zero_copy_batch=True,
    )
    if exact:
        return dedup_first(partial, "sig", nparts=64)
    coalesced = partial.repartition(coalesce)
    return coalesced.map_batches(
        unique_mentions_partial, batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    )


def decisions_stage(unique_mentions: rd.Dataset,
                    cfg: EngineConfig = DEFAULT_CONFIG,
                    concurrency: int | tuple | None = None,
                    use_actors: bool = False) -> rd.Dataset:
    """Default: stateless tasks with a process-global Disambiguator (cheap
    deterministic KB).  ``use_actors=True`` switches to a dedicated actor
    pool — required when the encoder/reranker is a real model whose load
    cost must be amortized explicitly (SURVEY.md A1/A2)."""
    if use_actors:
        return unique_mentions.map_batches(
            Disambiguator, batch_format="pyarrow",
            batch_size=cfg.score_batch_size,
            concurrency=concurrency or (1, 4),
            fn_constructor_kwargs={"cfg": cfg},
        )
    import functools

    return unique_mentions.map_batches(
        functools.partial(disambiguate_batch, cfg=cfg),
        batch_format="pyarrow", batch_size=cfg.score_batch_size,
    )


class EdgeRewriter:
    """triples → edges with canonical subj/obj ids.

    The canonical map (sig → canonical_id) is the small side: shipped once
    via ``ray.put`` (broadcast hash join, SURVEY.md §2.4).  Deserialized
    once per worker process and memoized by object-ref id, so stateless
    tasks over warm workers pay the fetch exactly once."""

    _CACHE: dict[str, object] = {}

    def __init__(self, canonical_ref=None, canonical_map=None):
        if canonical_ref is not None:
            key = canonical_ref.hex()
            cached = EdgeRewriter._CACHE.get(key)
            if cached is None:
                cached = ray.get(canonical_ref)
                EdgeRewriter._CACHE.clear()
                EdgeRewriter._CACHE[key] = cached
            self.map = cached
        else:
            self.map = canonical_map or {}
        self.dict = build_vocab(build_seed_entities())[0]
        self._sig_memo: dict[str, str] = {}

    def _canon(self, surface: str) -> str:
        c = self._sig_memo.get(surface)
        if c is None:
            sig = surface_sig(surface, self.dict)
            c = self.map.get(sig, "")
            self._sig_memo[surface] = c
        return c

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = [self._canon(s) for s in batch.column("subj").to_pylist()]
        dst = [self._canon(s) for s in batch.column("obj").to_pylist()]
        rel = batch.column("pred")
        return pa.table(
            {
                "src_id": pa.array(src, type=pa.string()),
                "dst_id": pa.array(dst, type=pa.string()),
                "rel_type": rel,
                "url": batch.column("url"),
                "sent_idx": batch.column("sent_idx"),
            }
        )


_REWRITERS: dict[str, EdgeRewriter] = {}


def rewrite_edges_batch(batch: pa.Table, *, canonical_ref) -> pa.Table:
    """Stateless-task wrapper with a process-global rewriter per map ref."""
    key = canonical_ref.hex()
    rw = _REWRITERS.get(key)
    if rw is None:
        _REWRITERS.clear()
        rw = EdgeRewriter(canonical_ref=canonical_ref)
        _REWRITERS[key] = rw
    return rw(batch)


def _edge_key(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    key = pc.binary_join_element_wise(
        batch.column("src_id"), batch.column("dst_id"),
        batch.column("rel_type"), "\x1f",
    )
    return batch.append_column("edge_key", key)


def _dedup_partial_edges(batch: pa.Table) -> pa.Table:
    seen: set[str] = set()
    keep = []
    col = batch.column("edge_key")
    for i in range(batch.num_rows):
        k = col[i].as_py()
        if k not in seen:
            seen.add(k)
            keep.append(i)
    return batch.take(keep)


def run_kg_pipeline(pages: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG,
                    concurrency: int | tuple = (1, 4)) -> dict:
    """Full pipeline.  Returns dict of result Datasets / frames:
    ``triples`` (url-level provenance edges), ``edges`` (deduped canonical
    triples), ``decisions`` (unique-mention audit log = the reference's
    DisambiguationHistory, SURVEY.md S10), ``entities`` (canonical entity
    table: seed KB + created)."""
    extracted = extract_stage(pages, cfg)
    triples = triples_stage(extracted, cfg)
    # Two consumers read `triples` (mention path and edge-rewrite path);
    # pin the post-extraction dataset (orders of magnitude smaller than the
    # html input — SURVEY.md §7.4 "keep html out of post-extract stages")
    # instead of re-running extraction per consumer.  The checkpointing mode
    # (state/checkpoint.py) writes triples to partitioned parquet and reads
    # them back, which also makes this the resume point.
    triples = triples.materialize()
    mentions = mentions_stage(triples, cfg, concurrency)
    uniq = unique_mentions_stage(mentions)
    if cfg.candidate_gen == "blocked":
        from ..stages.candidates import blocked_decisions

        decisions = blocked_decisions(uniq, build_seed_entities(), cfg)
    else:
        decisions = decisions_stage(uniq, cfg, concurrency)

    # decisions is small by construction (distinct mentions); collect the
    # canonical map and created-entity rows on the driver.  Residual
    # duplicate sigs from the shuffle-free unique stage are identical rows —
    # drop deterministically.
    dec_df = decisions.to_pandas()
    dec_df = (dec_df.sort_values("sig", kind="mergesort")
              .drop_duplicates("sig").reset_index(drop=True))
    canonical_map = dict(zip(dec_df["sig"], dec_df["canonical_id"]))
    map_ref = ray.put(canonical_map)

    import functools

    edges_raw = triples.map_batches(
        functools.partial(rewrite_edges_batch, canonical_ref=map_ref),
        batch_format="pyarrow", batch_size=cfg.score_batch_size,
    )
    edges = (
        edges_raw.map_batches(_edge_key, batch_format="pyarrow",
                              zero_copy_batch=True)
        .select_columns(["edge_key", "src_id", "dst_id", "rel_type"])
        .map_batches(_dedup_partial_edges, batch_format="pyarrow",
                     zero_copy_batch=True)
    )
    edges = dedup_first(edges, "edge_key", nparts=64).select_columns(
        ["src_id", "dst_id", "rel_type"])

    # entities table: seed KB ∪ created entities (dedup by canonical_id,
    # deterministic first-by-sig — the reference's MERGE-upsert last-wins
    # semantics collapse to first-wins under a stable sort, SURVEY.md S6)
    created = dec_df[dec_df["decision"] != "merge"]
    created = created.sort_values("sig").drop_duplicates("canonical_id")
    seed_df = pd.DataFrame(seed_entities_table())
    created_df = pd.DataFrame(
        {
            "id": created["canonical_id"],
            "name": created["name"],
            "type": created["type"],
            "aliases": created["aliases_json"].map(
                lambda s: json.loads(s) if isinstance(s, str) else []),
            "definition": created["definition"],
            "attributes": created["attributes"],
            "source": "pipeline-created",
            "create_time": pd.Timestamp("2024-06-01"),
        }
    )
    entities = pd.concat([seed_df, created_df], ignore_index=True)
    entities = entities.drop_duplicates("id", keep="first")

    return {
        "extracted": extracted,
        "triples": triples,
        "mentions": mentions,
        "decisions": decisions,
        "decisions_df": dec_df,
        "edges": edges,
        "entities_df": entities,
    }
