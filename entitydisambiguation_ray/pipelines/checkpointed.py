"""Checkpointed, resumable KG-construction run (north rule: killed runs
resume from the last committed partition).

The heavy, input-proportional stage — page synthesis/read → extraction →
triple extraction — is partitioned into ``nparts`` contiguous page-index
ranges; each partition's triples are written to partitioned parquet and
committed with a lineage manifest (state/checkpoint.py).  A killed run
re-runs only uncommitted partitions; because every operator is
deterministic (stable ids / hashes / seeded synthesis), re-running is
idempotent and the final tables are byte-identical to an uninterrupted run.

Downstream stages (mentions → decisions → edges) consume the committed
triples parquet and are committed as whole-stage outputs: they are
KB-proportional, orders of magnitude smaller than the input.
"""
from __future__ import annotations

import hashlib
import os

import ray.data as rd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..state.checkpoint import CheckpointStore, partition_files, run_partitioned_stage
from .kg import extract_stage, triples_stage


def run_checkpointed_kg(
    run_dir: str, n_pages: int, seed: int = 42, nparts: int = 8,
    cfg: EngineConfig = DEFAULT_CONFIG, concurrency=(1, 8),
) -> dict:
    """Resumable end-to-end run; returns {"edges_dir", "decisions_dir",
    "triples_dirs", "store"}."""
    store = CheckpointStore(run_dir)
    # the fingerprint covers EVERYTHING that shapes the outputs: input
    # parameters AND the engine config — resuming under a different config
    # must refuse, not silently reuse stale partitions
    cfg_digest = hashlib.sha1(repr(cfg).encode()).hexdigest()[:8]
    fingerprint = hashlib.sha1(
        f"synth:{n_pages}:{seed}:{nparts}:{cfg_digest}".encode()
    ).hexdigest()[:16]
    per = (n_pages + nparts - 1) // nparts

    def make_triples_partition(p: int) -> rd.Dataset:
        lo, hi = p * per, min((p + 1) * per, n_pages)
        pages = _page_range(lo, hi, seed)
        return triples_stage(extract_stage(pages, cfg), cfg)

    triples_dirs = run_partitioned_stage(
        store, "triples", nparts, make_triples_partition, fingerprint)

    # downstream from committed triples (single-commit stages)
    edges_dir = store.part_dir("edges", 0)
    decisions_dir = store.part_dir("decisions", 0)
    if not (store.is_committed("edges", 0) and store.is_committed("decisions", 0)):
        triples = rd.read_parquet(partition_files(triples_dirs))
        out = _downstream(triples, cfg, concurrency)

        def make_decisions(p: int) -> rd.Dataset:
            return out["decisions"]

        run_partitioned_stage(store, "decisions", 1, make_decisions, fingerprint)

        def make_edges(p: int) -> rd.Dataset:
            return out["edges"]

        run_partitioned_stage(store, "edges", 1, make_edges, fingerprint)
    return {
        "edges_dir": edges_dir,
        "decisions_dir": decisions_dir,
        "triples_dirs": triples_dirs,
        "store": store,
    }


def _page_range(lo: int, hi: int, seed: int) -> rd.Dataset:
    """Deterministic page synthesis for an index sub-range."""
    from ..sources.pages import make_pages_batch

    ds = rd.range(hi - lo)
    return ds.map_batches(
        lambda b, lo=lo, seed=seed: make_pages_batch(b["id"] + lo, seed=seed),
        batch_format="numpy", batch_size=DEFAULT_CONFIG.extract_batch_size,
    )


def _downstream(triples: rd.Dataset, cfg: EngineConfig, concurrency) -> dict:
    """mentions → unique → decisions → edges over a triples Dataset —
    delegates to the SAME shared stages as the in-memory pipeline
    (kg.make_decisions / kg.canonicalize_and_rewrite), so candidate-gen
    mode, round-2 semantics and the broadcast-vs-join canonical rewrite
    cannot drift between the two runners."""
    from .kg import canonicalize_and_rewrite, make_decisions

    decisions = make_decisions(triples, cfg, concurrency)
    out = canonicalize_and_rewrite(triples, decisions, cfg)
    edges = out["edges"].sort(["src_id", "dst_id", "rel_type"])
    # decisions sink (sorted for determinism) — the distributed
    # canonicalization already leaves a Dataset; the driver path rebuilds one
    if "decisions_df" in out:
        decisions_sorted = rd.from_pandas(
            out["decisions_df"].sort_values("sig").reset_index(drop=True))
    else:
        decisions_sorted = out["decisions_ds"].sort("sig")
    return {"decisions": decisions_sorted, "edges": edges}


def run_checkpointed_kg_from_warc(
    run_dir: str, warc_path: str, nparts: int = 8,
    cfg: EngineConfig = DEFAULT_CONFIG, concurrency=(1, 8),
) -> dict:
    """Resumable run over RAW Common-Crawl WARC archives (sources/warc.py)
    — the ingest the north star's parquet page table is derived from.
    Partition unit = a contiguous slice of the archive list (archives are
    independently parseable and retryable), fingerprinted per partition
    like the parquet runner."""
    from ..sources.warc import read_warc_pages

    store = CheckpointStore(run_dir)
    cfg_digest = hashlib.sha1(repr(cfg).encode()).hexdigest()[:8]
    if os.path.isdir(warc_path):
        files = sorted(
            os.path.join(warc_path, f) for f in os.listdir(warc_path)
            if ".warc" in f)
    else:
        files = [warc_path]
    if not files:
        raise ValueError(f"no warc files under {warc_path!r}")
    nparts = min(nparts, len(files))
    per = (len(files) + nparts - 1) // nparts
    slices = [files[p * per:(p + 1) * per] for p in range(nparts)]

    def fp_of(fs):
        parts = [f"{f}:{os.path.getsize(f)}:{int(os.path.getmtime(f))}"
                 for f in fs]
        return hashlib.sha1(
            ("|".join(parts) + ":" + cfg_digest).encode()).hexdigest()[:16]

    fingerprint = fp_of(files)

    def make_partition(p: int) -> rd.Dataset:
        pages = read_warc_pages(slices[p])
        return triples_stage(extract_stage(pages, cfg), cfg)

    triples_dirs = run_partitioned_stage(
        store, "triples", nparts, make_partition, fingerprint)
    edges_dir = store.part_dir("edges", 0)
    decisions_dir = store.part_dir("decisions", 0)
    if not (store.is_committed("edges", 0)
            and store.is_committed("decisions", 0)):
        triples = rd.read_parquet(partition_files(triples_dirs))
        out = _downstream(triples, cfg, concurrency)
        run_partitioned_stage(store, "decisions", 1,
                              lambda p: out["decisions"], fingerprint)
        run_partitioned_stage(store, "edges", 1,
                              lambda p: out["edges"], fingerprint)
    return {"edges_dir": edges_dir, "decisions_dir": decisions_dir,
            "triples_dirs": triples_dirs, "store": store}


def run_checkpointed_kg_from_parquet(
    run_dir: str, pages_path: str, nparts: int = 8,
    cfg: EngineConfig = DEFAULT_CONFIG, concurrency=(1, 8),
    columns=("url", "html"),
) -> dict:
    """Resumable run over an EXTERNAL parquet page table (the input_hint
    contract: columns url, warc_ts, html, text, lang).

    Partitioning unit = input file (directory inputs) or row-group range
    (single file), fingerprinted by (path, size, mtime) per partition so a
    changed input refuses to resume.  Only ``url`` and ``html`` are read —
    column pruning at the source."""
    store = CheckpointStore(run_dir)
    cfg_digest = hashlib.sha1(repr(cfg).encode()).hexdigest()[:8]

    if os.path.isdir(pages_path):
        files = sorted(
            os.path.join(pages_path, f) for f in os.listdir(pages_path)
            if f.endswith(".parquet"))
    else:
        files = [pages_path]
    if not files:
        raise ValueError(f"no parquet files under {pages_path!r}")
    # partition = contiguous slice of the file list
    nparts = min(nparts, len(files))
    per = (len(files) + nparts - 1) // nparts
    slices = [files[p * per:(p + 1) * per] for p in range(nparts)]

    def fp_of(fs):
        parts = [f"{f}:{os.path.getsize(f)}:{int(os.path.getmtime(f))}"
                 for f in fs]
        return hashlib.sha1(
            ("|".join(parts) + ":" + cfg_digest).encode()).hexdigest()[:16]

    fingerprint = fp_of(files)

    def make_partition(p: int) -> rd.Dataset:
        pages = rd.read_parquet(slices[p], columns=list(columns))
        return triples_stage(extract_stage(pages, cfg), cfg)

    triples_dirs = run_partitioned_stage(
        store, "triples", nparts, make_partition, fingerprint)

    edges_dir = store.part_dir("edges", 0)
    decisions_dir = store.part_dir("decisions", 0)
    if not (store.is_committed("edges", 0)
            and store.is_committed("decisions", 0)):
        triples = rd.read_parquet(partition_files(triples_dirs))
        out = _downstream(triples, cfg, concurrency)
        run_partitioned_stage(store, "decisions", 1,
                              lambda p: out["decisions"], fingerprint)
        run_partitioned_stage(store, "edges", 1,
                              lambda p: out["edges"], fingerprint)
    return {
        "edges_dir": edges_dir,
        "decisions_dir": decisions_dir,
        "triples_dirs": triples_dirs,
        "store": store,
    }
