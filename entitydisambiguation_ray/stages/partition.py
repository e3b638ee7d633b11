"""Coarse hash-partitioned shuffle helpers.

Ray's ``groupby(key).map_groups(fn)`` invokes ``fn`` once per distinct key —
with millions of tiny groups the per-group pandas overhead dominates wall
time.  The idiomatic fix (and the way a distributed engine would run it
anyway): shuffle on a COARSE partition ``part = stable_hash(key) % P`` so
each of the P groups is processed with one vectorized pandas/pyarrow kernel
over all its keys.  P bounds both parallelism and per-task memory; at 100 TB
P scales with cluster size while per-partition state stays
``rows / P``.

The hash is ``pandas.util.hash_pandas_object`` (C-vectorized siphash with a
fixed default key) — deterministic across processes, unlike builtin
``hash()`` (SURVEY.md §1.2), and ~100× faster than the per-row
``zlib.crc32(str(v))`` loop it replaced.
"""
from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def hash_key_rows(batch: pa.Table, keys: list[str]) -> np.ndarray:
    """Vectorized deterministic 64-bit row hash over one or more key
    columns (multi-column keys are row-hashed jointly)."""
    keydf = batch.select(keys).to_pandas()
    return pd.util.hash_pandas_object(keydf, index=False).to_numpy()


def hash_partition_ids(batch: pa.Table, keys: list[str],
                       nparts: int) -> np.ndarray:
    """Vectorized deterministic partition id per row."""
    return (hash_key_rows(batch, keys) % nparts).astype("int32")


def add_partition_column(batch: pa.Table, key: str, nparts: int,
                         col: str = "_part",
                         isolate: dict | None = None) -> pa.Table:
    parts = hash_partition_ids(batch, [key], nparts)
    if isolate:
        # hot keys get DEDICATED partitions beyond the hash range
        iso = (pd.Series(batch.column(key).to_pandas())
               .map(isolate).to_numpy())
        mask = ~pd.isna(iso)
        if mask.any():
            parts = parts.copy()
            parts[mask] = nparts + iso[mask].astype("int32")
    return batch.append_column(col, pa.array(parts, pa.int32()))


def hot_group_keys(ds: rd.Dataset, key: str, threshold: int,
                   max_isolated: int = 256) -> dict:
    """Pre-pass for ``partitioned_groupby(isolate_hot=...)``: per-batch
    count combiner → keyed sum → {key_value: dedicated_partition_index} for
    keys whose row count exceeds ``threshold`` (capped at the
    ``max_isolated`` heaviest; deterministic ordering).  The dict is
    hot-keys-only — bounded by skew, not cardinality."""
    from .join import count_hot_keys

    hot = count_hot_keys(ds, key, threshold, salt_max=0)  # {key: row count}
    # HEAVIEST first (deterministic key tiebreak) — capping by key VALUE
    # order could drop exactly the pathological key that motivated
    # isolation while spending the budget on barely-hot keys
    keys = sorted(hot, key=lambda k: (-hot[k], str(k)))[:max_isolated]
    return {k: i for i, k in enumerate(keys)}


def partitioned_groupby(
    ds: rd.Dataset, key: str, fn: Callable[[pd.DataFrame], pd.DataFrame],
    nparts: int = 64, isolate_hot: dict | None = None,
) -> rd.Dataset:
    """groupby(key) semantics executed as P coarse partitions; ``fn``
    receives one partition (all rows of many keys) and must itself operate
    per-key (e.g. ``df.drop_duplicates(key)`` or ``df.groupby(key)``).

    ``isolate_hot`` ({key_value: dedicated_partition_index}, from
    ``hot_group_keys``): skew handling for HOLISTIC per-key kernels
    (sessions, as-of, windows) whose keys cannot be salt-SPLIT without
    changing semantics — each hot key is routed to its own partition beyond
    the hash range, so a pathological key no longer convoys with the 1/P of
    the key space that hashes beside it.  Output is identical with or
    without isolation (every key still sees all its rows in one ``fn``
    call); the residual floor is the hot key's own mass, which is the
    irreducible minimum for a holistic kernel."""
    tagged = ds.map_batches(
        lambda b: add_partition_column(b, key, nparts, isolate=isolate_hot),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def run(df: pd.DataFrame) -> pd.DataFrame:
        out = fn(df.drop(columns=["_part"]))
        return out

    return tagged.groupby("_part").map_groups(run, batch_format="pandas")


def dedup_first(ds: rd.Dataset, key: str, nparts: int = 64,
                sort_by: list[str] | None = None) -> rd.Dataset:
    """Distributed exact dedup: one representative row per key.

    ``sort_by`` makes the representative deterministic regardless of block
    arrival order (required for run-to-run byte identity); when the rows of
    a key are known to be identical in all consumed columns it can be
    omitted."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if sort_by:
            df = df.sort_values(sort_by, kind="mergesort")
        return df.drop_duplicates(key)

    return partitioned_groupby(ds, key, f, nparts)
