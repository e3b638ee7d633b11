"""Shuffle hash join primitive (stages/join.py) vs pandas ground truth."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from entitydisambiguation_ray.stages.join import shuffle_hash_join


def _mk(seed=0, n_left=5000, n_right=800):
    rng = np.random.Generator(np.random.PCG64(seed))
    left = pd.DataFrame({
        "k": rng.integers(0, 1000, n_left),
        "lv": rng.integers(0, 10**6, n_left),
        "name": [f"l{i % 37}" for i in range(n_left)],
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, 1200, n_right),  # some keys unmatched
        "name": [f"r{i % 11}" for i in range(n_right)],  # collides with left
        "rv": rng.standard_normal(n_right).round(6),
    })
    return left, right


def _canon(df: pd.DataFrame, cols) -> pd.DataFrame:
    return (df[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True))


@pytest.mark.parametrize("nparts", [1, 7, 64])
def test_inner_join_matches_pandas(ray_session, nparts):
    left, right = _mk()
    got = shuffle_hash_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="rk", nparts=nparts).to_pandas()
    exp = left.merge(right.rename(columns={"rk": "k", "name": "name_r"}),
                     on="k", how="inner")
    cols = ["k", "lv", "name", "name_r", "rv"]
    assert sorted(got.columns) == sorted(cols)
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols))


def test_left_join_matches_pandas(ray_session):
    left, right = _mk(seed=3)
    right = right.drop_duplicates("rk")  # left join row-multiplicity sanity
    got = shuffle_hash_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="rk", how="left", nparts=16).to_pandas()
    exp = left.merge(right.rename(columns={"rk": "k", "name": "name_r"}),
                     on="k", how="left")
    cols = ["k", "lv", "name", "name_r", "rv"]
    assert len(got) == len(left)
    pd.testing.assert_frame_equal(_canon(got.fillna({"name_r": ""}), cols),
                                  _canon(exp.fillna({"name_r": ""}), cols))


def test_semi_anti_join(ray_session):
    left, right = _mk(seed=5)
    lds, rds = rd.from_pandas(left), rd.from_pandas(right)
    semi = shuffle_hash_join(lds, rds, on="k", right_on="rk",
                             how="semi", nparts=8).to_pandas()
    anti = shuffle_hash_join(lds, rds, on="k", right_on="rk",
                             how="anti", nparts=8).to_pandas()
    rkeys = set(right["rk"])
    assert set(semi.columns) == set(left.columns)
    assert set(semi["k"]).issubset(rkeys)
    assert not set(anti["k"]) & rkeys
    # partition of left: every left row is in exactly one of the two
    assert len(semi) + len(anti) == len(left)
    both = pd.concat([semi, anti])
    pd.testing.assert_frame_equal(_canon(both, list(left.columns)),
                                  _canon(left, list(left.columns)))


def test_multicolumn_key_and_string_key(ray_session):
    left = pd.DataFrame({"a": ["x", "y", "z", "x"], "b": [1, 2, 3, 1],
                         "v": [10, 20, 30, 40]})
    right = pd.DataFrame({"a": ["x", "y", "q"], "b": [1, 2, 9],
                          "w": [7, 8, 9]})
    got = shuffle_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            on=["a", "b"], nparts=4).to_pandas()
    exp = left.merge(right, on=["a", "b"])
    cols = ["a", "b", "v", "w"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols))


def test_salted_skew_join_matches_pandas(ray_session):
    """Explicit skew salting: hot-key left rows spread over salt shards,
    right rows replicated — identical results, count_hot_keys finds the
    skew."""
    from entitydisambiguation_ray.stages.join import count_hot_keys

    rng = np.random.Generator(np.random.PCG64(11))
    n = 20000
    keys = np.where(rng.random(n) < 0.6, 7, rng.integers(0, 500, n))
    left = pd.DataFrame({"k": keys, "lv": np.arange(n)})
    # keys 400-499 intentionally uncovered so the anti join is nonempty
    right = pd.DataFrame({"rk": np.arange(0, 400),
                          "rv": np.arange(0, 400) * 10})
    # give the hot key several right rows (replication correctness)
    right = pd.concat([right, pd.DataFrame({"rk": [7, 7], "rv": [71, 72]})],
                      ignore_index=True)
    lds = rd.from_pandas(left)
    hot = count_hot_keys(lds, "k", threshold=1000)
    assert 7 in hot and hot[7] > 1
    got = shuffle_hash_join(lds, rd.from_pandas(right), on="k",
                            right_on="rk", nparts=16,
                            salt_hot=hot).to_pandas()
    exp = left.merge(right.rename(columns={"rk": "k"}), on="k")
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols))
    # semi/anti under salting
    semi = shuffle_hash_join(lds, rd.from_pandas(right), on="k",
                             right_on="rk", how="semi", nparts=16,
                             salt_hot=hot).to_pandas()
    anti = shuffle_hash_join(lds, rd.from_pandas(right), on="k",
                             right_on="rk", how="anti", nparts=16,
                             salt_hot=hot).to_pandas()
    assert len(semi) + len(anti) == len(left)
    assert not set(anti["k"]) & set(right["rk"])


def test_key_type_coercion(ray_session):
    """int32 right key joins against int64 left key (cast at prep)."""
    left = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                         "v": [1.0, 2.0, 3.0]})
    right = pd.DataFrame({"k": np.array([2, 3, 4], dtype=np.int32),
                          "w": ["b", "c", "d"]})
    got = shuffle_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                            on="k", nparts=4).to_pandas()
    assert sorted(got["k"].tolist()) == [2, 3]


def test_outer_join_matches_pandas(ray_session):
    left, right = _mk(seed=5)
    got = shuffle_hash_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="rk", how="outer", nparts=16).to_pandas()
    exp = left.merge(right.rename(columns={"rk": "k", "name": "name_r"}),
                     on="k", how="outer")
    cols = ["k", "lv", "name", "name_r", "rv"]
    assert sorted(got.columns) == sorted(cols)
    # unmatched-right keys must survive with their key value coalesced
    right_only = set(right["rk"]) - set(left["k"])
    assert right_only and right_only <= set(got["k"])
    fills = {"name": "", "name_r": "", "lv": -1, "rv": 0.0}
    pd.testing.assert_frame_equal(_canon(got.fillna(fills), cols),
                                  _canon(exp.fillna(fills), cols))


def test_outer_join_string_key(ray_session):
    left = pd.DataFrame({"k": [f"k{i % 13}" for i in range(200)],
                         "lv": np.arange(200)})
    right = pd.DataFrame({"k": [f"k{i % 19}" for i in range(60)],
                          "rv": np.arange(60) * 2})
    got = shuffle_hash_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", how="outer", nparts=8).to_pandas()
    exp = left.merge(right, on="k", how="outer")
    cols = ["k", "lv", "rv"]
    assert not got["k"].isna().any()  # keys always coalesced, never null
    pd.testing.assert_frame_equal(_canon(got.fillna(-1), cols),
                                  _canon(exp.fillna(-1), cols))


def test_outer_join_rejects_salt(ray_session):
    left, right = _mk(seed=7)
    with pytest.raises(ValueError, match="outer"):
        shuffle_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                          on="k", right_on="rk", how="outer",
                          salt_hot={5: 4})
