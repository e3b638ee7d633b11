"""Dataset-resident flagship canonicalization (round-3 #1): the
distributed path must be byte-identical to the driver path."""
from __future__ import annotations

import pandas as pd
import pytest


def _run(mode: str, n_pages: int = 150):
    from entitydisambiguation_ray.config import EngineConfig
    from entitydisambiguation_ray.pipelines.kg import (
        run_kg_pipeline,
        synth_pages_dataset,
    )

    cfg = EngineConfig(canonicalize=mode)
    pages = synth_pages_dataset(n_pages, seed=42)
    return run_kg_pipeline(pages, cfg=cfg)


def _edges_df(out) -> pd.DataFrame:
    return (out["edges"].to_pandas()
            .sort_values(["src_id", "dst_id", "rel_type"], kind="mergesort")
            .reset_index(drop=True))


def _dec_df(out) -> pd.DataFrame:
    df = (out["decisions_df"] if "decisions_df" in out
          else out["decisions_ds"].to_pandas())
    return df.sort_values("sig", kind="mergesort").reset_index(drop=True)


def _ents_df(out) -> pd.DataFrame:
    df = (out["entities_df"] if "entities_df" in out
          else out["entities_ds"].to_pandas())
    return df.sort_values("id", kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("broadcast_max", [2_000_000, 1])
def test_distributed_canonicalize_matches_driver(ray_session, broadcast_max):
    """broadcast_max=1 forces BOTH modes onto the shuffle-join edge rewrite
    (the beyond-broadcast scale path); the default exercises the broadcast
    rewrite in both."""
    from entitydisambiguation_ray.config import EngineConfig
    from entitydisambiguation_ray.pipelines.kg import (
        run_kg_pipeline,
        synth_pages_dataset,
    )

    def _run(mode, n_pages=150):
        cfg = EngineConfig(canonicalize=mode,
                           canonical_map_broadcast_max=broadcast_max)
        return run_kg_pipeline(synth_pages_dataset(n_pages, seed=42), cfg=cfg)

    drv = _run("driver")
    dist = _run("distributed")
    assert "decisions_ds" in dist and "entities_ds" in dist

    pd.testing.assert_frame_equal(_edges_df(drv), _edges_df(dist))

    d1, d2 = _dec_df(drv), _dec_df(dist)
    assert list(d1.columns) == list(d2.columns)
    pd.testing.assert_frame_equal(d1, d2)

    e1, e2 = _ents_df(drv), _ents_df(dist)
    # create_time round-trips through Arrow on the distributed side; compare
    # values, not pandas dtype microseconds-vs-nanoseconds
    e1["create_time"] = pd.to_datetime(e1["create_time"])
    e2["create_time"] = pd.to_datetime(e2["create_time"])
    # aliases is a list column: compare as tuples
    e1["aliases"] = e1["aliases"].map(tuple)
    e2["aliases"] = e2["aliases"].map(tuple)
    pd.testing.assert_frame_equal(e1[sorted(e1.columns)],
                                  e2[sorted(e2.columns)],
                                  check_dtype=False)


def test_auto_mode_switches(ray_session):
    """auto resolves to driver below the threshold and distributed above."""
    from entitydisambiguation_ray.config import EngineConfig
    from entitydisambiguation_ray.pipelines.kg import (
        run_kg_pipeline,
        synth_pages_dataset,
    )

    pages = synth_pages_dataset(60, seed=42)
    out_drv = run_kg_pipeline(pages, cfg=EngineConfig(canonicalize="auto"))
    assert "decisions_df" in out_drv  # small corpus → driver

    pages = synth_pages_dataset(60, seed=42)
    out_dist = run_kg_pipeline(
        pages, cfg=EngineConfig(canonicalize="auto",
                                canonicalize_driver_max=1))
    assert "decisions_ds" in out_dist  # forced tiny threshold → distributed


def test_bad_mode_rejected(ray_session):
    from entitydisambiguation_ray.config import EngineConfig
    from entitydisambiguation_ray.pipelines.kg import canonicalize_and_rewrite

    import ray.data as rd

    with pytest.raises(ValueError, match="canonicalize"):
        canonicalize_and_rewrite(rd.from_items([{"a": 1}]),
                                 rd.from_items([{"a": 1}]),
                                 EngineConfig(canonicalize="nope"))
