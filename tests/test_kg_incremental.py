"""Incremental KB mode (cfg.kb_path / run_kg_incremental): the batch
equivalent of the reference's KB growing across /auto-decide requests
(services/disambiguation.py:120-166 — each request searches the index the
previous requests extended).  Run N+1 disambiguates against run N's emitted
entities table; mentions of entities created in an earlier batch MERGE into
them instead of re-creating."""
import ray.data as rd

from entitydisambiguation_ray.config import DEFAULT_CONFIG
from entitydisambiguation_ray.pipelines.kg import (
    run_kg_incremental,
    run_kg_pipeline,
    synth_pages_dataset,
    write_graph_outputs,
)
from entitydisambiguation_ray.pipelines.oracle import OnlineOracle, precision_recall
from entitydisambiguation_ray.sources.pages import make_page, make_pages_batch
from entitydisambiguation_ray.sources.seed import build_seed_entities

N1, N2 = 60, 60


def pages_slice(start: int, n: int) -> rd.Dataset:
    return rd.range(n).map_batches(
        lambda b: make_pages_batch(b["id"] + start, seed=42),
        batch_format="numpy",
        batch_size=DEFAULT_CONFIG.extract_batch_size,
    )


import pytest


@pytest.fixture(scope="module")
def chain(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("kg_incr")
    out1 = run_kg_pipeline(synth_pages_dataset(N1, seed=42))
    paths = write_graph_outputs(out1, str(tmp / "run1"))
    out2 = run_kg_incremental(pages_slice(N1, N2), paths["entities"])
    return out1, out2, paths


def test_incremental_merges_into_prior_entities(chain):
    out1, out2, _ = chain
    seed_ids = {e.id for e in build_seed_entities()}
    created1 = set(out1["entities_df"]["id"]) - seed_ids
    assert created1, "batch 1 created no entities — test corpus too small"

    dec2 = out2["decisions_df"]
    merged_into_prior = set(
        dec2.loc[dec2["decision"] == "merge", "match_id"]) & created1
    # the synthetic corpus repeats unknown surfaces across pages, so batch 2
    # MUST re-see some batch-1-created entity and merge into it
    assert merged_into_prior, (
        "no batch-2 mention merged into a batch-1-created entity — "
        "the incremental KB was not actually searched")

    # updated KB = prior ∪ new: every batch-1 entity survives into batch 2's
    # entities table under the same id (reference MERGE-upsert semantics)
    ids2 = set(out2["entities_df"]["id"])
    assert set(out1["entities_df"]["id"]) <= ids2
    assert out2["entities_df"]["id"].is_unique


def test_incremental_chain_matches_sequential_oracle(chain):
    """Chained batch runs ≈ the online oracle over the full page stream
    (same ≥0.95 P/R gate as the single-batch flagship test)."""
    out1, out2, _ = chain
    pred = set()
    for out in (out1, out2):
        e = out["edges"].to_pandas()
        pred |= set(zip(e["src_id"], e["rel_type"], e["dst_id"]))
    gold = set(OnlineOracle().run(make_page(i) for i in range(N1 + N2)))
    p, r = precision_recall(pred, gold)
    assert p >= 0.95, f"precision {p}"
    assert r >= 0.95, f"recall {r}"


def test_incremental_distributed_canonicalize_matches_driver(chain):
    """kb_path composes with canonicalize='distributed': same canonical
    edge set as the driver path when chained off the same prior KB."""
    import dataclasses

    _, drv, paths = chain
    cfg_dist = dataclasses.replace(
        DEFAULT_CONFIG, kb_path=paths["entities"], canonicalize="distributed")
    dist = run_kg_pipeline(pages_slice(N1, N2), cfg_dist)
    e1 = drv["edges"].to_pandas()
    e2 = dist["edges"].to_pandas()
    s1 = set(zip(e1["src_id"], e1["rel_type"], e1["dst_id"]))
    s2 = set(zip(e2["src_id"], e2["rel_type"], e2["dst_id"]))
    assert s1 == s2
    assert set(dist["entities_ds"].to_pandas()["id"]) == set(
        drv["entities_df"]["id"])


def test_kb_memo_invalidated_when_path_rewritten(chain, tmp_path):
    """Rewriting the entities table at the SAME path in-session must serve
    the new KB, not a stale memo (kb_cache_key fingerprints the files)."""
    import dataclasses
    import shutil

    from entitydisambiguation_ray.sources.seed import kb_entities

    out1, out2, paths = chain
    p = tmp_path / "entities"
    shutil.copytree(paths["entities"], p)
    cfg = dataclasses.replace(DEFAULT_CONFIG, kb_path=str(p))
    n1 = len(kb_entities(cfg))
    # overwrite with run 2's (larger) entities table at the same path
    shutil.rmtree(p)
    from entitydisambiguation_ray.pipelines.kg import write_graph_outputs

    write_graph_outputs(out2, str(tmp_path))  # writes {tmp_path}/entities
    n2 = len(kb_entities(cfg))
    assert n2 > n1, "stale KB served after in-place rewrite"
