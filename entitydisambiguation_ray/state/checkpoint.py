"""Per-partition lineage manifests + resumable runs (north rule: "every
stage emits per-partition lineage manifests and counters to a checkpoint
store so a killed run resumes from the last committed partition").

Layout for a checkpointed run rooted at ``run_dir``::

    run_dir/
      <stage>/part-00000/...parquet      (stage output, one dir per partition)
      _manifests/<stage>/part-00000.json (commit record, written AFTER data)

A partition is **committed** iff its manifest exists; manifests are written
atomically (tmp + rename) after the partition's parquet files are fully
written, so a kill at any point leaves either no manifest (partition re-runs)
or a complete partition (skipped on resume).  Deterministic partition
contents (stable ids, stable hashes — SURVEY.md M12/M13) make re-running an
uncommitted partition idempotent.
"""
from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass


@dataclass
class PartitionManifest:
    stage: str
    part: int
    input_fingerprint: str
    rows: int
    files: list[str]
    wall_s: float
    counters: dict


class CheckpointStore:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)

    def _manifest_path(self, stage: str, part: int) -> str:
        return os.path.join(self.run_dir, "_manifests", stage,
                            f"part-{part:05d}.json")

    def part_dir(self, stage: str, part: int) -> str:
        return os.path.join(self.run_dir, stage, f"part-{part:05d}")

    def is_committed(self, stage: str, part: int) -> bool:
        return os.path.exists(self._manifest_path(stage, part))

    def committed_parts(self, stage: str) -> list[int]:
        d = os.path.join(self.run_dir, "_manifests", stage)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[5:10]) for f in os.listdir(d)
            if f.startswith("part-") and f.endswith(".json")
        )

    def commit(self, manifest: PartitionManifest):
        path = self._manifest_path(manifest.stage, manifest.part)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(manifest), f)
        os.replace(tmp, path)  # atomic commit point

    def read_manifest(self, stage: str, part: int) -> PartitionManifest:
        with open(self._manifest_path(stage, part)) as f:
            return PartitionManifest(**json.load(f))

    def clear_uncommitted(self, stage: str, nparts: int):
        """Remove data dirs for partitions without a manifest (crash debris)."""
        for p in range(nparts):
            if not self.is_committed(stage, p):
                d = self.part_dir(stage, p)
                if os.path.isdir(d):
                    shutil.rmtree(d)


def partition_files(dirs: list[str]) -> list[str]:
    """Explicit parquet file list for a set of partition dirs —
    ``ray.data.read_parquet`` treats a LIST of paths as files, so expand
    directories driver-side (cheap: one listdir per partition)."""
    out = []
    for d in dirs:
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                out.append(os.path.join(d, f))
    return out


def _serialize_fs_probe():
    """Work around a Ray/fsspec thread-safety bug hit by concurrent
    read/write path resolution: ``path_util._is_http_filesystem`` attempts
    ``from fsspec.implementations.http import HTTPFileSystem`` on EVERY
    call; when aiohttp is absent that import fails and is retried each
    time, and two driver threads resolving paths concurrently can observe
    a partially-initialized module — an ImportError ("cannot import name
    HTTPFileSystem") that escapes Ray's ``except ModuleNotFoundError``
    (reproduced deterministically with 4 threads × read_parquet).  The
    probe is wrapped with a process-wide lock once; semantics unchanged."""
    import threading

    try:
        import ray.data.datasource.path_util as _pu
    except ImportError:  # pragma: no cover - ray layout change
        return
    if getattr(_pu._is_http_filesystem, "_ed_ray_locked", False):
        return
    lock = threading.Lock()
    orig = _pu._is_http_filesystem

    def locked(fs):
        with lock:
            return orig(fs)

    locked._ed_ray_locked = True
    _pu._is_http_filesystem = locked


def run_partitioned_stage(
    store: CheckpointStore, stage: str, nparts: int,
    make_partition_ds, input_fingerprint: str,
    overlap: int = 2,
) -> list[str]:
    """Execute a stage partition-by-partition with commit manifests.

    ``make_partition_ds(part) -> ray.data.Dataset`` builds the partition's
    output; committed partitions are skipped entirely (their parquet is
    reused).  Returns the list of partition dirs (committed + newly built).

    At cluster scale each partition is itself a distributed Dataset write —
    the commit unit is the partition, the parallel unit is the block.

    ``overlap``: number of partition executions in flight at once (driver
    threads; Ray Data executions compose).  A strictly sequential loop pays
    each execution's ramp-up + drain underutilization ``nparts`` times;
    overlapping two pipelines keeps the cluster saturated across partition
    boundaries while the commit unit (one manifest per partition, written
    atomically AFTER its parquet) is unchanged — a kill still leaves every
    partition either fully committed or re-runnable."""

    def run_one(p: int) -> str:
        pdir = store.part_dir(stage, p)
        t0 = time.perf_counter()
        ds = make_partition_ds(p)
        os.makedirs(pdir, exist_ok=True)
        ds.write_parquet(pdir)
        files = sorted(os.listdir(pdir))
        import pyarrow.parquet as pq

        pq_files = [f for f in files if f.endswith(".parquet")]
        rows = sum(pq.read_metadata(os.path.join(pdir, f)).num_rows
                   for f in pq_files)
        bytes_out = sum(os.path.getsize(os.path.join(pdir, f))
                        for f in pq_files)
        store.commit(PartitionManifest(
            stage=stage, part=p, input_fingerprint=input_fingerprint,
            rows=rows, files=files,
            wall_s=round(time.perf_counter() - t0, 3),
            counters={"rows": rows, "bytes_out": bytes_out,
                      "n_files": len(pq_files),
                      **_stats_counters(ds)},
        ))
        return pdir

    store.clear_uncommitted(stage, nparts)
    dirs: list[str] = [""] * nparts
    todo = []
    for p in range(nparts):
        if store.is_committed(stage, p):
            committed = store.read_manifest(stage, p)
            if committed.input_fingerprint != input_fingerprint:
                raise ValueError(
                    f"checkpoint dir {store.run_dir!r} stage {stage!r} "
                    f"part {p} was committed for a different input "
                    f"({committed.input_fingerprint} != {input_fingerprint}); "
                    "resuming would silently mix corpora — use a fresh "
                    "run dir (or delete the stale checkpoint)")
            dirs[p] = store.part_dir(stage, p)
        else:
            todo.append(p)
    if todo:
        if overlap <= 1 or len(todo) == 1:
            for p in todo:
                dirs[p] = run_one(p)
        else:
            _serialize_fs_probe()
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=overlap) as pool:
                for p, pdir in zip(todo, pool.map(run_one, todo)):
                    dirs[p] = pdir
    return dirs


def _stats_counters(ds) -> dict:
    """Execution metrics for the lineage manifest, parsed from the executed
    Dataset's ``stats()`` report (north rule: per-partition lineage +
    METRICS): peak per-task heap and the object-store memory the stage's
    output blocks occupied.  Best-effort — an unparsable stats format
    degrades to no extra counters, never a failed commit."""
    import re

    try:
        txt = ds.stats()
    except Exception:
        return {}
    out: dict = {}
    try:
        peaks = [float(m) for m in re.findall(
            r"Peak heap memory usage \(MiB\): [0-9.]+ min, ([0-9.]+) max",
            txt)]
        if peaks:
            out["peak_heap_mib_max"] = max(peaks)
        sizes = [int(m) for m in re.findall(
            r"Output size bytes per block: [^\n]*?(?<![0-9])([0-9]+) total",
            txt)]
        if sizes:
            # max across operators = the widest materialized exchange of
            # the stage (the last operator is the parquet Write, whose
            # output blocks are tiny result stubs)
            out["peak_stage_bytes_object_store"] = max(sizes)
        blocks = [int(m) for m in re.findall(
            r"(\d+) blocks? produced in", txt)]
        if blocks:
            out["output_blocks"] = max(blocks)
    except Exception:
        pass
    return out
