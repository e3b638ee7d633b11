"""Round-3 hardening: LSH hot-bucket caps, hot-key isolation for
partitioned_groupby, null-aware hot-key counting, self-loop component
contract, vectorized kernels."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


# ------------------------------------------------------------- bucket caps

def test_minhash_hot_bucket_cap_bounded(ray_session):
    """A planted hot bucket (hundreds of identical docs sharing every band)
    stays bounded: with a small cap the quadratic pair emit is skipped, so
    the pair count collapses from O(n²) to the residual (0 here — every
    band bucket of the clones is hot)."""
    from entitydisambiguation_ray.pipelines.dedup import minhash_lsh_pairs

    rows = [{"doc_id": i, "text": "the same boilerplate page " * 20}
            for i in range(400)]
    # distinct docs that must keep pairing normally
    rows += [{"doc_id": 1000 + i,
              "text": f"unique document number {i} " + "alpha beta " * 10}
             for i in range(4)]
    rows += [{"doc_id": 2000, "text": "planted near dup pair xyz " * 30},
             {"doc_id": 2001, "text": "planted near dup pair xyz " * 30}]
    ds = rd.from_items(rows)
    capped = minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.5,
                               bucket_cap=50).to_pandas()
    # the 400-clone mass never explodes into 79,800 pairs
    clone_pairs = capped[(capped["id_a"] < 1000) & (capped["id_b"] < 1000)]
    assert len(clone_pairs) == 0
    # the small planted pair (its buckets are size 2, under the cap) survives
    assert ((capped["id_a"] == 2000) & (capped["id_b"] == 2001)).any()

    # default cap: clones all pair up (n*(n-1)/2 among 400 ids)
    full = minhash_lsh_pairs(ds, "doc_id", "text",
                             threshold=0.5).to_pandas()
    clone_full = full[(full["id_a"] < 1000) & (full["id_b"] < 1000)]
    assert len(clone_full) == 400 * 399 // 2


def test_simhash_hot_bucket_cap_bounded(ray_session):
    from entitydisambiguation_ray.pipelines.dedup import simhash_pairs

    rows = [{"doc_id": i, "text": "identical boilerplate " * 30}
            for i in range(300)]
    rows += [{"doc_id": 900, "text": "some other page entirely alpha"},
             {"doc_id": 901, "text": "some other page entirely alpha"}]
    ds = rd.from_items(rows)
    capped = simhash_pairs(ds, "doc_id", "text", bucket_cap=40).to_pandas()
    clones = capped[(capped["id_a"] < 900) & (capped["id_b"] < 900)]
    assert len(clones) == 0
    assert ((capped["id_a"] == 900) & (capped["id_b"] == 901)).any()


# ------------------------------------------------- hot-key isolation

def _skewed_events(n=4000, hot_frac=0.6, seed=7) -> pd.DataFrame:
    rng = np.random.Generator(np.random.PCG64(seed))
    n_hot = int(n * hot_frac)
    users = np.concatenate([
        np.full(n_hot, 7, dtype=np.int64),
        rng.integers(100, 200, n - n_hot),
    ])
    return pd.DataFrame({
        "user_id": users,
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 10**9, n),
        "value": rng.standard_normal(n).round(4),
    })


def test_hot_group_keys_detects_skew(ray_session):
    from entitydisambiguation_ray.stages.partition import hot_group_keys

    df = _skewed_events()
    hot = hot_group_keys(rd.from_pandas(df), "user_id", threshold=500)
    assert list(hot) == [7]
    assert hot[7] == 0


def test_isolation_identical_output(ray_session):
    """Hot-key isolation is placement-only: a holistic per-key kernel
    (last-wins upsert shape) produces identical results salted vs not."""
    from entitydisambiguation_ray.stages.partition import partitioned_groupby

    df = _skewed_events()

    def last_per_user(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["user_id", "ts", "event_id"],
                                ascending=[True, False, False],
                                kind="mergesort").drop_duplicates("user_id")
        return part[["user_id", "event_id", "ts"]]

    base = partitioned_groupby(rd.from_pandas(df), "user_id", last_per_user,
                               nparts=8).to_pandas()
    iso = partitioned_groupby(rd.from_pandas(df), "user_id", last_per_user,
                              nparts=8, isolate_hot={7: 0}).to_pandas()
    key = ["user_id", "event_id", "ts"]
    pd.testing.assert_frame_equal(
        base.sort_values(key).reset_index(drop=True)[key],
        iso.sort_values(key).reset_index(drop=True)[key])


def test_isolation_actually_isolates(ray_session):
    """The hot key's rows land in a partition that contains ONLY hot keys."""
    from entitydisambiguation_ray.stages.partition import partitioned_groupby

    df = _skewed_events()

    def tag_partition(part: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": part["user_id"].unique(),
            "partition_users": len(part["user_id"].unique()),
        })

    out = partitioned_groupby(rd.from_pandas(df), "user_id", tag_partition,
                              nparts=8, isolate_hot={7: 0}).to_pandas()
    assert int(out.loc[out["user_id"] == 7, "partition_users"].iloc[0]) == 1


# ---------------------------------------------- null-aware hot-key counting

def test_count_hot_keys_null_mass(ray_session, caplog):
    from entitydisambiguation_ray.stages.join import count_hot_keys

    df = pd.DataFrame({
        "k": pd.array([None] * 800 + [1] * 700 + list(range(100, 150)),
                      dtype="Int64"),
        "v": np.arange(1550),
    })
    hot = count_hot_keys(rd.from_pandas(df), "k", threshold=500)
    # the non-null hot key is detected; nulls never enter the salt dict
    assert 1 in {int(k) for k in hot}
    assert all(k is not None and not pd.isna(k) for k in hot)


# ------------------------------------------------- self-loop components

def test_distributed_components_selfloop_nodes_present(ray_session):
    from entitydisambiguation_ray.state.unionfind import (
        distributed_components,
        driver_components,
    )

    edges = [("a", "b"), ("z", "z"), ("c", "c"), ("b", "c")]
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    out = distributed_components(ds, nparts=4).to_pandas()
    got = dict(zip(out["node"], out["canonical"]))
    # z appears ONLY in a self-loop: present, canonical = itself
    assert got["z"] == "z"
    # c has a self-loop AND a real edge: canonical from the real component
    assert got["c"] == "a" and got["b"] == "a" and got["a"] == "a"
    gold = driver_components([(a, b) for a, b in edges])
    for n, c in gold.items():
        assert got[n] == c


def test_distributed_components_only_selfloops(ray_session):
    from entitydisambiguation_ray.state.unionfind import distributed_components

    ds = rd.from_items([{"a": "x", "b": "x"}, {"a": "y", "b": "y"}])
    out = distributed_components(ds, nparts=2).to_pandas()
    got = dict(zip(out["node"], out["canonical"]))
    assert got == {"x": "x", "y": "y"}


# ------------------------------------------------- vectorized kernels

def test_as_matrix_arrow_fast_path():
    import pyarrow as pa

    from entitydisambiguation_ray.pipelines.ann import _as_matrix

    vecs = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
    arr = pa.array(vecs, pa.list_(pa.float32()))
    np.testing.assert_allclose(_as_matrix(arr), np.asarray(vecs))
    # chunked + sliced (offset-safe)
    ch = pa.chunked_array([arr, arr]).slice(1, 2)
    np.testing.assert_allclose(_as_matrix(ch),
                               np.asarray([vecs[1], vecs[0]]))
    # ragged input is rejected (same contract as the generic numpy path)
    ragged = pa.array([[1.0], [2.0, 3.0]], pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        _as_matrix(ragged)


def test_kmeans_fit_still_converges(ray_session):
    """Warm-task rewrite keeps the fit semantics: planted clusters are
    recovered (each centroid collapses onto one planted direction)."""
    from entitydisambiguation_ray.pipelines.ann import kmeans_fit

    rng = np.random.Generator(np.random.PCG64(0))
    base = rng.standard_normal((3, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(600):
        c = i % 3
        v = base[c] + 0.01 * rng.standard_normal(16)
        rows.append({"vec_id": i, "embedding": v.tolist()})
    ds = rd.from_items(rows)
    cents = kmeans_fit(ds, "embedding", n_centroids=3, iters=4)
    sims = cents @ base.T
    # every planted direction is matched by some centroid
    assert (sims.max(axis=0) > 0.99).all()


# ------------------------------------------------- string-key join codes

@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_shuffle_join_string_keys(ray_session, how):
    """Dictionary-encoded string merge keys give identical results to a
    plain pandas merge (including null keys, which pandas matches)."""
    from entitydisambiguation_ray.stages.join import shuffle_hash_join

    rng = np.random.Generator(np.random.PCG64(5))
    left = pd.DataFrame({
        "k": [f"key{int(i)}" for i in rng.integers(0, 80, 600)],
        "lv": np.arange(600),
    })
    right = pd.DataFrame({
        "rk": [f"key{int(i)}" for i in rng.integers(40, 120, 200)],
        "rv": rng.standard_normal(200).round(6),
    })
    got = shuffle_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            on="k", right_on="rk", how=how,
                            nparts=5).to_pandas()
    rn = right.rename(columns={"rk": "k"})
    if how == "semi":
        exp = left.merge(rn[["k"]].drop_duplicates(), on="k", how="inner")
    elif how == "anti":
        m = left.merge(rn[["k"]].drop_duplicates(), on="k", how="left",
                       indicator=True)
        exp = m[m["_merge"] == "left_only"].drop(columns=["_merge"])
    else:
        exp = left.merge(rn, on="k", how=how)
    cols = sorted(exp.columns)
    assert sorted(got.columns) == cols
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True),
        exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True))


def test_hot_group_keys_caps_by_mass_not_key_order(ray_session):
    """With more hot keys than the isolation budget, the HEAVIEST keys get
    the dedicated partitions — capping by key-value order could drop
    exactly the pathological key that motivated isolation."""
    from entitydisambiguation_ray.stages.partition import hot_group_keys

    # key 900 (sorts LAST by value) is catastrophically heavy; keys 1..3
    # are barely hot
    df = pd.DataFrame({"user_id": np.concatenate([
        np.full(5000, 900, np.int64),
        np.repeat(np.array([1, 2, 3], np.int64), 600)])})
    hot = hot_group_keys(rd.from_pandas(df), "user_id",
                         threshold=500, max_isolated=2)
    assert 900 in hot, "heaviest key must be isolated"
    assert len(hot) == 2
