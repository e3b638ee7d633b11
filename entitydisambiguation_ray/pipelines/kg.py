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
from ..stages.disambiguate import Disambiguator
from ..stages.extract import extract_text_batch, triples_batch
from ..stages.mentions import MentionBuilder, surface_sig, unique_mentions_partial


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
                   concurrency: int | tuple = (1, 4)) -> rd.Dataset:
    return triples.map_batches(
        MentionBuilder, batch_format="pyarrow",
        batch_size=cfg.score_batch_size, concurrency=concurrency,
    )


def unique_mentions_stage(mentions: rd.Dataset) -> rd.Dataset:
    """Combiner + global first-per-sig (exact dedup, SURVEY.md §2.7)."""
    partial = mentions.map_batches(
        unique_mentions_partial, batch_format="pyarrow", zero_copy_batch=True,
    )
    return partial.groupby("sig").map_groups(
        lambda df: df.head(1), batch_format="pandas",
    )


def decisions_stage(unique_mentions: rd.Dataset,
                    cfg: EngineConfig = DEFAULT_CONFIG,
                    concurrency: int | tuple = (1, 4)) -> rd.Dataset:
    return unique_mentions.map_batches(
        Disambiguator, batch_format="pyarrow",
        batch_size=cfg.score_batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"cfg": cfg},
    )


class EdgeRewriter:
    """triples → edges with canonical subj/obj ids.

    The canonical map (sig → canonical_id) is the small side: shipped once
    via ``ray.put`` and resolved in ``__init__`` (broadcast hash join,
    SURVEY.md §2.4)."""

    def __init__(self, canonical_ref=None, canonical_map=None):
        self.map = (ray.get(canonical_ref) if canonical_ref is not None
                    else canonical_map) or {}
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
        src = [self._canon(s.as_py()) for s in batch.column("subj")]
        dst = [self._canon(s.as_py()) for s in batch.column("obj")]
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
    decisions = decisions_stage(uniq, cfg, concurrency)

    # decisions is small by construction (distinct mentions); collect the
    # canonical map and created-entity rows on the driver
    dec_df = decisions.to_pandas()
    canonical_map = dict(zip(dec_df["sig"], dec_df["canonical_id"]))
    map_ref = ray.put(canonical_map)

    edges_raw = triples.map_batches(
        EdgeRewriter, batch_format="pyarrow",
        batch_size=cfg.score_batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"canonical_ref": map_ref},
    )
    edges = (
        edges_raw.map_batches(_edge_key, batch_format="pyarrow",
                              zero_copy_batch=True)
        .select_columns(["edge_key", "src_id", "dst_id", "rel_type"])
        .map_batches(_dedup_partial_edges, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("edge_key")
        .map_groups(lambda df: df.head(1), batch_format="pandas")
        .select_columns(["src_id", "dst_id", "rel_type"])
    )

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
