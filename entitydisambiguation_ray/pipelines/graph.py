"""Graph analytics over the constructed knowledge graph — the consumption
side of the engine's north star (the reference stops at materializing the
Neo4j graph, services/neo4j_database.py:120-166; a KG built at 10^12-page
scale is only useful if the engine can also ANALYZE it distributedly).

Two operators:

- ``pagerank``: iterative distributed PageRank over an edge Dataset.
  Each iteration is the classic two-join dataflow — ranks ⋈ out-degrees
  (per-node contribution), edges ⋈ contributions on src (the one wide
  shuffle, edge-sized), groupby dst sum, then damping + dangling-mass
  redistribution.  Ranks stay a Dataset throughout; the driver sees only
  scalar aggregates (n_nodes, dangling mass).  Follows the
  ``state/unionfind.distributed_components`` discipline: materialize +
  repartition per round so lineage doesn't compound.

- ``copurchase_pairs``: exact co-occurrence counting (market-basket
  shape): parts appearing in the same order, counted across all orders.
  Scale shape: ONE hash shuffle on the group key (``partitioned_groupby``
  — whole orders land in one partition), per-partition vectorized pair
  generation with a Counter combiner (pairs are pre-aggregated before the
  keyed groupby), per-block top-k prune, driver merges only
  ``k × blocks`` candidate rows.  Per-group pair cost is O(k²) in basket
  size; baskets here are bounded (~7 lineitems), and the hot-basket cap
  used by the LSH bucket loops (pipelines/dedup.py) is the documented
  treatment when they are not.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _sum_col(ds: rd.Dataset, col: str) -> float:
    agg = ds.sum(col)
    # Dataset.sum returns a scalar for single column
    if isinstance(agg, dict):
        return float(agg[f"sum({col})"])
    return float(agg or 0.0)


def pagerank(edges: rd.Dataset, *, src: str = "src", dst: str = "dst",
             iters: int = 10, damping: float = 0.85,
             nparts: int = 16) -> rd.Dataset:
    """Distributed PageRank over ``edges`` (duplicate edges count with
    multiplicity; self-loops allowed).  Returns a Dataset of
    ``(node, rank)`` summing to 1.0.

    Convention (standard power-iteration form): rank(v) = (1-d)/N +
    d·(Σ_{u→v} rank(u)/outdeg(u) + dangling/N) where dangling is the
    total rank mass of nodes with no out-edges, redistributed uniformly.

    Per iteration: one edge-sized shuffle join (edges ⋈ contributions on
    ``src``) + one keyed groupby sum on ``dst`` + one nodes-sized left
    join to re-cover in-degree-0 nodes.  Ranks/contributions are
    node-sized Datasets; nothing corpus-sized reaches the driver."""
    from ..stages.join import shuffle_hash_join

    etypes = {"src": pa.string(), "dst": pa.string()}

    def proj(cols_map):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({new: b.column(old).cast(pa.string())
                             for new, old in cols_map.items()})
        return f

    e = edges.map_batches(proj({"src": src, "dst": dst}),
                          batch_format="pyarrow", zero_copy_batch=True) \
        .materialize()

    # node universe = distinct(src) ∪ distinct(dst)
    nodes = (e.map_batches(
        lambda b: pa.table({"node": pa.concat_arrays(
            [c.combine_chunks() for c in (b.column("src"), b.column("dst"))])}),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node").count().drop_columns(["count()"])
        .materialize())
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda b: pa.table({"node": pa.array([], pa.string()),
                                "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow")

    # (src, count()) — materialized once: each iteration's join would
    # otherwise re-execute this edge-sized shuffle from lineage
    outdeg = e.groupby("src").count().materialize()

    def init_rank(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("node"),
            "rank": pa.array(np.full(b.num_rows, 1.0 / n), pa.float64())})

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    rank_types = {"node": pa.string(), "rank": pa.float64()}

    for _ in range(iters):
        # per-node contribution rank/outdeg; dangling nodes (no out-edges)
        # get NaN outdeg from the left join and are summed separately
        withdeg = shuffle_hash_join(
            ranks, outdeg, on="node", right_on="src", how="left",
            nparts=nparts, ltypes=rank_types,
            rtypes={"src": pa.string(), "count()": pa.int64()})

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"node": df["node"]})
            deg = df["count()"].to_numpy(dtype="float64")
            r = df["rank"].to_numpy(dtype="float64")
            out["contrib"] = np.where(deg > 0, r / np.where(deg > 0, deg, 1),
                                      0.0)
            out["dangling"] = np.where(deg > 0, 0.0, r)
            return out

        c = withdeg.map_batches(contrib, batch_format="pandas").materialize()
        dangling = _sum_col(c, "dangling")

        # edges ⋈ contributions on src  (the wide, edge-sized shuffle)
        flowing = shuffle_hash_join(
            e, c, on="src", right_on="node", how="inner", nparts=nparts,
            ltypes=etypes,
            rtypes={"node": pa.string(), "contrib": pa.float64(),
                    "dangling": pa.float64()})
        from ray.data.aggregate import Sum
        incoming = (flowing
                    .map_batches(lambda b: b.select(["dst", "contrib"]),
                                 batch_format="pyarrow", zero_copy_batch=True)
                    .groupby("dst").aggregate(Sum("contrib",
                                                  alias_name="inflow")))

        # re-cover nodes with no in-edges (left join against the universe)
        joined = shuffle_hash_join(
            nodes, incoming, on="node", right_on="dst", how="left",
            nparts=nparts, ltypes={"node": pa.string()},
            rtypes={"dst": pa.string(), "inflow": pa.float64()})
        base = (1.0 - damping) / n + damping * dangling / n

        def apply_rank(df: pd.DataFrame) -> pd.DataFrame:
            inflow = df["inflow"].to_numpy(dtype="float64")
            inflow = np.where(np.isnan(inflow), 0.0, inflow)
            return pd.DataFrame({"node": df["node"],
                                 "rank": base + damping * inflow})

        ranks = (joined.map_batches(apply_rank, batch_format="pandas")
                 .repartition(nparts).materialize())

    return ranks


def pagerank_dense(edges: list[tuple[str, str]], *, iters: int = 10,
                   damping: float = 0.85) -> dict[str, float]:
    """Driver-side dense power iteration — the test oracle for
    ``pagerank`` (same convention: dangling mass redistributed
    uniformly).  O(N²) memory; tests only."""
    nodes = sorted({x for st in edges for x in st})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return {}
    m = np.zeros((n, n))
    for s, d in edges:
        m[idx[s], idx[d]] += 1.0
    outdeg = m.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.where(outdeg > 0, r / np.where(outdeg > 0, outdeg, 1),
                           0.0)
        dangling = r[outdeg == 0].sum()
        inflow = contrib @ m
        r = (1.0 - damping) / n + damping * (inflow + dangling / n)
    return {v: float(r[idx[v]]) for v in nodes}


def copurchase_pairs(sf_dir: str):
    """Top-20 part pairs by number of orders containing both (exact
    market-basket co-occurrence over lineitem).  See module docstring for
    the scale shape."""
    import os

    from itertools import combinations

    from ..stages.partition import partitioned_groupby

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_partkey"])

    def pairs_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        # Counter = the in-partition combiner: a pair co-occurring in many
        # of this partition's orders ships as ONE row.  The pair is packed
        # into a single int64 key (partkeys < 2^31) so the second shuffle
        # partitions on one integer column — a two-int64-column Ray
        # groupby-aggregate measured 17× slower than this coarse
        # partitioned sum on the same rows.
        from collections import Counter
        c: Counter = Counter()
        if len(df) and int(df["l_partkey"].max()) >= (1 << 31):
            raise ValueError("copurchase_pairs packs part ids into 31 bits"
                             " each; got l_partkey >= 2^31")
        for _, grp in df.groupby("l_orderkey"):
            parts = sorted(set(grp["l_partkey"].tolist()))
            for a, b in combinations(parts, 2):
                c[(a << 31) | b] += 1
        return pd.DataFrame({"pk": pd.Series(list(c.keys()), dtype="int64"),
                             "n": pd.Series(list(c.values()), dtype="int64")})

    pairs = partitioned_groupby(li, "l_orderkey", pairs_in_partition,
                                nparts=16)

    def sum_topk(df: pd.DataFrame) -> pd.DataFrame:
        # pair groups are complete per partition (hash on pk), so the
        # local top-20 after the sum is a superset of the global answer
        agg = df.groupby("pk", as_index=False)["n"].sum()
        pk = agg["pk"].to_numpy(dtype="int64")
        agg["part_a"] = pk >> 31
        agg["part_b"] = pk & ((1 << 31) - 1)
        agg = agg.sort_values(["n", "part_a", "part_b"],
                              ascending=[False, True, True],
                              kind="mergesort")
        return agg.head(20).drop(columns=["pk"])

    cand = partitioned_groupby(pairs, "pk", sum_topk, nparts=16).to_pandas()
    cand = cand.sort_values(["n", "part_a", "part_b"],
                            ascending=[False, True, True], kind="mergesort")
    out = cand.head(20).copy()
    for col in ("part_a", "part_b", "n"):
        out[col] = out[col].astype("int64")
    return out[["part_a", "part_b", "n"]].reset_index(drop=True)


SQL_COPURCHASE_PAIRS = """
WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n
FROM p a JOIN p b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n DESC, part_a, part_b LIMIT 20
"""
