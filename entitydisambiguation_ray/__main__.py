"""Job entry point — the script a cluster operator submits:

    ray job submit --working-dir . -- python -m entitydisambiguation_ray \
        --pages 100000 --out /data/kg_run --nparts 64

Runs the checkpointed KG-construction pipeline (resume-safe: re-submitting
the same command after a kill skips committed partitions), writes the graph
tables + a run-metrics JSON, and prints one summary line.

Locally (no cluster) it runs under ``ray.init(address="local")``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="entitydisambiguation_ray")
    ap.add_argument("--pages", type=int, default=20000,
                    help="synthetic corpus size (replace with --input-parquet "
                         "for real page tables)")
    ap.add_argument("--input-parquet", default=None,
                    help="directory/file of pages parquet "
                         "(url, warc_ts, html, text, lang); overrides --pages")
    ap.add_argument("--out", required=True, help="run/checkpoint directory")
    ap.add_argument("--nparts", type=int, default=16,
                    help="checkpoint partitions for the extraction stage")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--blocked", action="store_true",
                    help="use blocked candidate generation (scale path)")
    args = ap.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(include_dashboard=False, logging_level="ERROR",
                      log_to_driver=False)
        if address == "local":
            # num_cpus is only legal when STARTING a local cluster; when
            # connecting to an existing one (ray job submit) the cluster
            # defines its resources
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=address, **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import dataclasses

    from entitydisambiguation_ray.config import get_config
    from entitydisambiguation_ray.pipelines.checkpointed import run_checkpointed_kg
    from entitydisambiguation_ray.state.checkpoint import partition_files

    cfg = get_config()  # ED_RAY_* env overrides apply
    if args.blocked:
        cfg = dataclasses.replace(cfg, candidate_gen="blocked")
    t0 = time.perf_counter()
    if args.input_parquet:
        from entitydisambiguation_ray.pipelines.checkpointed import (
            run_checkpointed_kg_from_parquet,
        )

        run = run_checkpointed_kg_from_parquet(
            args.out, args.input_parquet, nparts=args.nparts, cfg=cfg)
    else:
        run = run_checkpointed_kg(args.out, args.pages, seed=args.seed,
                                  nparts=args.nparts, cfg=cfg)
    wall = time.perf_counter() - t0

    import pyarrow.parquet as pq

    def rows_of(dirs):
        return sum(pq.read_metadata(f).num_rows
                   for f in partition_files(dirs if isinstance(dirs, list)
                                            else [dirs]))

    store = run["store"]
    metrics = {
        "input": (args.input_parquet if args.input_parquet
                  else f"synthetic:{args.pages}"),
        "pages": None if args.input_parquet else args.pages,
        "wall_s": round(wall, 3),
        "triples": rows_of(run["triples_dirs"]),
        "edges": rows_of(run["edges_dir"]),
        "decisions": rows_of(run["decisions_dir"]),
        "committed_triple_parts": store.committed_parts("triples"),
        "candidate_gen": cfg.candidate_gen,
        "per_partition": [
            {"part": p, **{k: v for k, v in
                           vars(store.read_manifest("triples", p)).items()
                           if k in ("rows", "wall_s", "input_fingerprint",
                                    "counters")}}
            for p in store.committed_parts("triples")
        ],
    }
    with open(os.path.join(args.out, "_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps({k: v for k, v in metrics.items()
                      if k != "per_partition"}))
    if owns_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
