"""Graph analytics (pipelines/graph.py): distributed PageRank vs a dense
power-iteration oracle; co-purchase pairs vs its DuckDB oracle is covered
by tests/test_round3b.py."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from entitydisambiguation_ray.pipelines.graph import pagerank, pagerank_dense


def _graph(seed=11, n_nodes=40, n_edges=150):
    rng = np.random.Generator(np.random.PCG64(seed))
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    # force structure the dataflow must handle: a dangling node (out-deg
    # 0), a source-only node (in-deg 0), and a self-loop
    edges = [(f"n{s}", f"n{d}") for s, d in zip(src, dst)
             if s != n_nodes - 1]              # n39 never a source: dangling
    edges.append((f"n{n_nodes - 2}", f"n{n_nodes - 2}"))  # self-loop
    edges = [e for e in edges if e[1] != "n0"]  # n0 in-degree 0 (if a source)
    return edges


@pytest.mark.parametrize("nparts", [1, 8])
def test_pagerank_matches_dense(ray_session, nparts):
    edges = _graph()
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = pagerank(ds, iters=8, nparts=nparts).to_pandas()
    exp = pagerank_dense(edges, iters=8)
    assert set(got["node"]) == set(exp)
    got_map = dict(zip(got["node"], got["rank"]))
    for v, r in exp.items():
        assert got_map[v] == pytest.approx(r, abs=1e-9)
    # a proper distribution
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-9)


def test_pagerank_duplicate_edges_count(ray_session):
    """Duplicate edges carry multiplicity (2/3 vs 1/3 of u's mass)."""
    edges = [("u", "a"), ("u", "a"), ("u", "b"), ("a", "u"), ("b", "u")]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = pagerank(ds, iters=20, nparts=2).to_pandas()
    exp = pagerank_dense(edges, iters=20)
    for _, row in got.iterrows():
        assert row["rank"] == pytest.approx(exp[row["node"]], abs=1e-9)
    ranks = dict(zip(got["node"], got["rank"]))
    assert ranks["a"] > ranks["b"]


def test_pagerank_all_dangling(ray_session):
    """Graph whose every node is dangling after one hop: ranks stay
    uniform (dangling mass redistributes uniformly)."""
    edges = [("a", "b")]  # b dangling
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    got = pagerank(ds, iters=5, nparts=1).to_pandas()
    exp = pagerank_dense(edges, iters=5)
    for _, row in got.iterrows():
        assert row["rank"] == pytest.approx(exp[row["node"]], abs=1e-12)


def test_kg_graph_stats_consistent(ray_session):
    """kg_graph_stats (all-distributed aggregates incl.
    distributed_components) vs a driver-side recomputation on the same
    edge table."""
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    stats = entry.queries()["kg_graph_stats"](sf)
    edges = entry._kg_outputs(sf, "edges").to_pandas()
    a = edges["src_id"].astype(str)
    b = edges["dst_id"].astype(str)
    assert stats.loc[0, "n_edges"] == len(edges)
    assert stats.loc[0, "n_source_nodes"] == a.nunique()
    assert stats.loc[0, "max_out_degree"] == a.value_counts().max()
    nodes = set(a) | set(b)
    assert stats.loc[0, "n_nodes"] == len(nodes)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        parent[find(x)] = find(y)
    assert stats.loc[0, "n_components"] == len({find(x) for x in nodes})
