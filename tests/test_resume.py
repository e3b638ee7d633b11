"""Kill/resume: a failed run resumes from committed partitions and the final
tables are byte-identical to an uninterrupted run (SURVEY.md §5.6)."""
import os

import pandas as pd
import pytest


def _edges_df(run):
    import ray.data as rd

    from entitydisambiguation_ray.state.checkpoint import partition_files

    return (rd.read_parquet(partition_files([run["edges_dir"]])).to_pandas()
            .sort_values(["src_id", "dst_id", "rel_type"])
            .reset_index(drop=True))


@pytest.mark.parametrize("canonicalize", ["auto", "distributed"])
def test_kill_resume_byte_identical(ray_session, tmp_path, monkeypatch,
                                    canonicalize):
    """Both canonicalization modes must survive a mid-run kill with
    byte-identical final tables (a real SIGKILL variant at 150k pages with
    canonicalize=distributed is recorded in BASELINE.md — 4/10 partitions
    committed at kill, resume + fresh runs byte-identical)."""
    import dataclasses

    from entitydisambiguation_ray.config import DEFAULT_CONFIG
    from entitydisambiguation_ray.pipelines import checkpointed as cp

    cfg = dataclasses.replace(DEFAULT_CONFIG, canonicalize=canonicalize)
    N = 60
    # uninterrupted reference run
    ref = cp.run_checkpointed_kg(str(tmp_path / "ref"), N, nparts=4, cfg=cfg)
    ref_edges = _edges_df(ref)
    assert len(ref_edges) > 0

    # interrupted run: fail while building partition 2
    real_page_range = cp._page_range

    def failing_page_range(lo, hi, seed):
        if lo >= 30:  # partitions 2,3
            raise RuntimeError("simulated kill")
        return real_page_range(lo, hi, seed)

    monkeypatch.setattr(cp, "_page_range", failing_page_range)
    with pytest.raises(RuntimeError):
        cp.run_checkpointed_kg(str(tmp_path / "killed"), N, nparts=4,
                               cfg=cfg)
    store = cp.CheckpointStore(str(tmp_path / "killed"))
    committed = store.committed_parts("triples")
    assert committed == [0, 1]  # first two partitions survived the kill

    # resume with the failure removed → completes, skipping committed parts
    monkeypatch.setattr(cp, "_page_range", real_page_range)
    resumed = cp.run_checkpointed_kg(str(tmp_path / "killed"), N, nparts=4,
                                     cfg=cfg)
    assert store.committed_parts("triples") == [0, 1, 2, 3]
    res_edges = _edges_df(resumed)
    pd.testing.assert_frame_equal(res_edges, ref_edges)


def test_external_parquet_input(ray_session, tmp_path):
    """The input_hint contract: a parquet page table drives the same
    pipeline, checkpointed per input file, identical output to the direct
    path."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines import checkpointed as cp
    from entitydisambiguation_ray.pipelines.kg import (
        run_kg_pipeline,
        synth_pages_dataset,
    )
    from entitydisambiguation_ray.state.checkpoint import partition_files

    pages_dir = str(tmp_path / "pages")
    synth_pages_dataset(200, seed=42).repartition(4).write_parquet(pages_dir)

    run = cp.run_checkpointed_kg_from_parquet(
        str(tmp_path / "run"), pages_dir, nparts=2)
    ext = (rd.read_parquet(partition_files([run["edges_dir"]])).to_pandas()
           .sort_values(["src_id", "dst_id", "rel_type"])
           .reset_index(drop=True))

    direct = (run_kg_pipeline(synth_pages_dataset(200, seed=42))["edges"]
              .to_pandas().sort_values(["src_id", "dst_id", "rel_type"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(ext, direct)
