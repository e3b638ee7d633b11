"""Union-find invariants + checkpoint/resume semantics."""
import itertools
import os
import random

import pytest

from entitydisambiguation_ray.state.checkpoint import (
    CheckpointStore,
    PartitionManifest,
)
from entitydisambiguation_ray.state.unionfind import UnionFind, driver_components


def test_unionfind_basic():
    uf = UnionFind()
    uf.union("b", "a")
    uf.union("c", "b")
    uf.union("x", "y")
    comp = uf.components()
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"


def test_unionfind_edge_order_invariance():
    edges = [("a", "b"), ("b", "c"), ("d", "e"), ("c", "d"), ("f", "g")]
    base = driver_components(edges)
    rng = random.Random(3)
    for _ in range(10):
        shuffled = edges[:]
        rng.shuffle(shuffled)
        assert driver_components(shuffled) == base
    # canonical is always the smallest member
    assert base["e"] == "a" and base["g"] == "f"


def test_distributed_components_matches_driver(ray_session):
    import ray.data as rd

    from entitydisambiguation_ray.state.unionfind import distributed_components

    rng = random.Random(11)
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    gold = driver_components(edges)
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    out = distributed_components(ds, nparts=8).to_pandas()
    got = dict(zip(out["node"], out["canonical"]))
    for n, c in gold.items():
        assert got[n] == c, n


def test_distributed_components_driver_free(ray_session, monkeypatch):
    """The Dataset-resident path must never collect labels or edges to the
    driver: to_pandas / iter_rows / take_all are poisoned for the duration
    of the call.  Graph shaped to need several propagation rounds."""
    import ray.data as rd

    from entitydisambiguation_ray.state.unionfind import distributed_components

    rng = random.Random(7)
    edges = []
    # chains of length 8 (multi-round convergence) + random extra edges
    for c in range(20):
        ns = [f"c{c:02d}x{i:02d}" for i in range(8)]
        edges += list(zip(ns, ns[1:]))
    nodes = [a for a, _ in edges]
    edges += [(rng.choice(nodes), rng.choice(nodes)) for _ in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    gold = driver_components(edges)
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])

    def poisoned(self, *a, **k):
        raise AssertionError("driver-side collect inside "
                             "distributed_components")

    monkeypatch.setattr(rd.Dataset, "to_pandas", poisoned)
    monkeypatch.setattr(rd.Dataset, "iter_rows", poisoned)
    monkeypatch.setattr(rd.Dataset, "take_all", poisoned)
    out_ds = distributed_components(ds, nparts=8)
    monkeypatch.undo()
    out = out_ds.to_pandas()
    got = dict(zip(out["node"], out["canonical"]))
    assert len(got) == len(gold)
    for n, c in gold.items():
        assert got[n] == c, n


def test_checkpoint_commit_and_resume(tmp_path):
    store = CheckpointStore(str(tmp_path / "run1"))
    assert store.committed_parts("stage1") == []
    assert not store.is_committed("stage1", 0)
    m = PartitionManifest(stage="stage1", part=0, input_fingerprint="abc",
                          rows=10, files=["f.parquet"], wall_s=0.1,
                          counters={"rows": 10})
    store.commit(m)
    assert store.is_committed("stage1", 0)
    assert store.committed_parts("stage1") == [0]
    back = store.read_manifest("stage1", 0)
    assert back.rows == 10 and back.input_fingerprint == "abc"


def test_checkpoint_clear_uncommitted(tmp_path):
    store = CheckpointStore(str(tmp_path / "run2"))
    # committed partition 0, crash-debris partition 1
    os.makedirs(store.part_dir("s", 0))
    os.makedirs(store.part_dir("s", 1))
    store.commit(PartitionManifest("s", 0, "x", 1, [], 0.0, {}))
    store.clear_uncommitted("s", 2)
    assert os.path.isdir(store.part_dir("s", 0))
    assert not os.path.isdir(store.part_dir("s", 1))


def test_run_partitioned_stage_resumes(ray_session, tmp_path):
    import ray.data as rd

    from entitydisambiguation_ray.state.checkpoint import run_partitioned_stage

    store = CheckpointStore(str(tmp_path / "run3"))
    calls = []

    def make(p):
        calls.append(p)
        return rd.range(10).map_batches(
            lambda b: {"v": b["id"] + p * 10}, batch_format="numpy")

    dirs = run_partitioned_stage(store, "nums", 3, make, "fp1")
    assert len(dirs) == 3 and calls == [0, 1, 2]
    # resume: nothing re-runs
    calls.clear()
    dirs2 = run_partitioned_stage(store, "nums", 3, make, "fp1")
    assert dirs2 == dirs and calls == []
    # drop one manifest → only that partition re-runs, output equal
    os.remove(os.path.join(store.run_dir, "_manifests", "nums",
                           "part-00001.json"))
    calls.clear()
    run_partitioned_stage(store, "nums", 3, make, "fp1")
    assert calls == [1]
    from entitydisambiguation_ray.state.checkpoint import partition_files

    total = rd.read_parquet(partition_files(dirs)).count()
    assert total == 30


def test_fingerprint_mismatch_refuses_resume(ray_session, tmp_path):
    """Resuming a run dir with changed input params must fail loudly, not
    silently reuse stale partitions."""
    import ray.data as rd

    from entitydisambiguation_ray.state.checkpoint import run_partitioned_stage

    store = CheckpointStore(str(tmp_path / "runfp"))

    def make(p):
        return rd.range(5)

    run_partitioned_stage(store, "s", 2, make, "fp-A")
    with pytest.raises(ValueError, match="different input"):
        run_partitioned_stage(store, "s", 2, make, "fp-B")


def test_components_auto_paths_identical(ray_session):
    """components_auto's bounded driver path and the Dataset-resident
    propagation must produce the identical (node, canonical) mapping."""
    import numpy as np
    import ray.data as rd

    from entitydisambiguation_ray.state.unionfind import (
        components_auto,
        distributed_components,
    )

    rng = np.random.default_rng(3)
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = [(nodes[int(rng.integers(0, 60))], nodes[int(rng.integers(0, 60))])
             for _ in range(80)]  # includes self-loops by chance
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    ds = ds.materialize()
    via_driver = (components_auto(ds, nparts=8, driver_max=10**6)
                  .to_pandas().sort_values("node").reset_index(drop=True))
    via_dist = (components_auto(ds, nparts=8, driver_max=0)
                .to_pandas().sort_values("node").reset_index(drop=True))
    ref = (distributed_components(ds, nparts=8)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert via_driver.equals(via_dist)
    assert via_driver.equals(ref)


def test_components_auto_empty(ray_session):
    import ray.data as rd

    from entitydisambiguation_ray.state.unionfind import components_auto

    ds = rd.from_items([]).materialize()
    assert components_auto(ds, nparts=4).count() == 0
