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
                         col: str = "_part") -> pa.Table:
    parts = hash_partition_ids(batch, [key], nparts)
    return batch.append_column(col, pa.array(parts, pa.int32()))


def partitioned_groupby(
    ds: rd.Dataset, key: str, fn: Callable[[pd.DataFrame], pd.DataFrame],
    nparts: int = 64,
) -> rd.Dataset:
    """groupby(key) semantics executed as P coarse partitions; ``fn``
    receives one partition (all rows of many keys) and must itself operate
    per-key (e.g. ``df.drop_duplicates(key)`` or ``df.groupby(key)``)."""
    tagged = ds.map_batches(
        lambda b: add_partition_column(b, key, nparts),
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
