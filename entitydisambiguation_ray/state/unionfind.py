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


def components_auto(edges_ds, nparts: int = 64,
                    driver_max: int = 5_000_000):
    """Size-adaptive connected components over a (a, b) edges Dataset →
    (node, canonical) Dataset.

    The input must be materialized (callers count it anyway).  When the
    edge count is provably bounded (≤ ``driver_max``) the TWO string
    columns are collected and solved with the O(E·α) driver union-find —
    the same bounded-projection discipline as canonicalize_distributed's
    broadcast sig-map rewrite (the driver sees a bounded 2-column list,
    never a decisions/corpus table).  Beyond the bound, the fully
    Dataset-resident min-label propagation runs.  Both paths produce the
    IDENTICAL mapping (canonical = lexicographically smallest member id;
    equivalence-tested in tests/test_unionfind.py), so the switch is a
    placement decision, not a semantics one.

    Motivation (round-3 finding): merge-edge graphs are cluster-mass-sized
    — at 1M pages the flagship produced 302 edges, yet the distributed
    propagation paid ~7 s of fixed per-round shuffle latency on them."""
    n = edges_ds.count()
    if n > driver_max:
        return distributed_components(edges_ds, nparts=nparts)
    import ray.data as rd

    if n == 0:
        return rd.from_items([])
    df = edges_ds.to_pandas()
    comp = driver_components(
        list(zip(df["a"].astype(str), df["b"].astype(str))))
    out = pd.DataFrame({"node": list(comp.keys()),
                        "canonical": list(comp.values())})
    # deterministic row order → byte-identical downstream runs
    out = out.sort_values("node").reset_index(drop=True)
    return rd.from_pandas(out)


def distributed_components(edges_ds, nparts: int = 64, max_rounds: int = 50):
    """Min-label propagation over an edges Dataset (columns ``a``, ``b``) →
    Dataset (node, canonical) — fully Dataset-resident: labels live as a
    Dataset, edges are relabeled via co-partitioned shuffle hash joins, and
    the driver only ever sees per-round convergence COUNTS (never a label
    map or an edge list).  Converges in O(log n) rounds; each round is one
    keyed min-aggregation plus two keyed joins.

    Small edge lists should use the driver ``UnionFind`` instead — each
    distributed round costs several Ray executions of fixed latency."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.join import shuffle_hash_join
    from ..stages.partition import partitioned_groupby

    def emit(batch: pa.Table) -> pa.Table:
        # each edge proposes min(a, b) as the label of BOTH endpoints
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        lab = np.minimum(a, b)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.string()),
            "label": pa.array(np.concatenate([lab, lab]), pa.string()),
        })

    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        # sort+dedup, NOT groupby().min(): group-min over string columns
        # is a pure-python pandas fallback (profiled 2 s on 20k groups in
        # the driver path; same trap here per propagation round)
        return (df[["node", "label"]]
                .sort_values(["node", "label"], kind="mergesort")
                .drop_duplicates("node").reset_index(drop=True))

    def relabel_endpoint(col: str):
        """Replace edge endpoint ``col`` by its label via one shuffle join
        (every endpoint has a label row by construction → inner join)."""
        def fix(batch: pa.Table) -> pa.Table:
            cols = {c: batch.column(c) for c in ("a", "b")}
            cols[col] = batch.column("label")
            return pa.table(cols)

        return fix

    def drop_selfloops(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.equal(batch.column("a"),
                                               batch.column("b"))))

    # NB: every per-round materialize is preceded by repartition(nparts) —
    # sort-based shuffles emit ~one block per input block, so without the
    # rebound the block count TRIPLES per round and per-task overhead
    # dominates (measured 79→237→711 blocks, 40 s rounds on 80 edges).
    #
    # Contract: EVERY node appearing in ``edges_ds`` appears in the output —
    # including nodes whose only edges are self-loops (x, x).  Self-loops
    # are dropped from propagation (they carry no information), but their
    # endpoints are folded in as identity (node, node) label rows below, so
    # a caller iterating the result sees the full node set.
    e0 = edges_ds.repartition(nparts).materialize()  # consumed twice

    def selfloop_labels(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.equal(batch.column("a"), batch.column("b")))
        return pa.table({"node": kept.column("a").cast(pa.string()),
                         "label": kept.column("a").cast(pa.string())})

    self_labs = e0.map_batches(selfloop_labels, batch_format="pyarrow",
                               zero_copy_batch=True)
    labs = [self_labs]  # (node, label) Datasets; composed ONCE at the end
    cur = e0.map_batches(drop_selfloops, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .repartition(nparts).materialize()
    for _ in range(max_rounds):
        if cur.count() == 0:
            break
        prop = cur.map_batches(emit, batch_format="pyarrow")
        lab = partitioned_groupby(prop, "node", min_label,
                                  nparts=nparts).repartition(nparts) \
            .materialize()
        labs.append(lab)
        # relabel both endpoints through `lab`, drop converged edges
        # (schemas passed explicitly: schema() on the lazy chain between
        # the two joins would re-execute the first one)
        e_types = {"a": pa.string(), "b": pa.string()}
        l_types = {"node": pa.string(), "label": pa.string()}
        nxt = shuffle_hash_join(cur, lab, on="a", right_on="node",
                                nparts=nparts, ltypes=e_types,
                                rtypes=l_types)
        nxt = nxt.map_batches(relabel_endpoint("a"), batch_format="pyarrow")
        nxt = shuffle_hash_join(nxt, lab, on="b", right_on="node",
                                nparts=nparts, ltypes=e_types,
                                rtypes=l_types)
        nxt = nxt.map_batches(relabel_endpoint("b"), batch_format="pyarrow")
        cur = nxt.map_batches(drop_selfloops, batch_format="pyarrow",
                              zero_copy_batch=True) \
            .repartition(nparts).materialize()
    if e0.count() == 0:  # no edges at all
        import ray.data as rd

        return rd.from_items([])
    # Compose all rounds in one pass: round r's map is defined on round
    # r-1's labels (which are themselves node ids), so the union of all
    # round maps + per-node MIN gives every node its best-known label, and
    # pointer jumping below resolves the label→label chains to roots.
    allmaps = labs[0] if len(labs) == 1 else labs[0].union(*labs[1:])
    labels = partitioned_groupby(allmaps, "node", min_label, nparts=nparts)
    labels = labels.map_batches(
        lambda t: t.rename_columns(["node", "canonical"]),
        batch_format="pyarrow").repartition(nparts)
    # final pointer-jump compression: a canonical may still point at a
    # non-root intermediate; resolve by repeated self-join until stable
    for _ in range(max_rounds):
        labels = labels.materialize()
        j = shuffle_hash_join(
            labels, labels, on="canonical", right_on="node",
            nparts=nparts, how="left")
        # j: node, canonical, canonical_r (= label of canonical, or null)

        def jump(batch: pa.Table) -> pa.Table:
            cur_c = batch.column("canonical")
            nxt_c = batch.column("canonical_r")
            new_c = pc.if_else(pc.is_null(nxt_c), cur_c, nxt_c)
            chg = pc.cast(pc.invert(pc.equal(new_c, cur_c)), pa.int64())
            return pa.table({"node": batch.column("node"),
                             "canonical": new_c, "chg": chg})

        j = j.map_batches(jump, batch_format="pyarrow") \
            .repartition(nparts).materialize()
        # convergence = COUNT of changed rows (count() never collects rows
        # to the driver, unlike Dataset.sum which fetches via take)
        changed = j.map_batches(
            lambda t: t.filter(pc.equal(t.column("chg"), 1)),
            batch_format="pyarrow", zero_copy_batch=True).count()
        labels = j.drop_columns(["chg"])
        if not changed:
            break
    return labels
