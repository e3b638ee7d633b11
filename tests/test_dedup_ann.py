"""Dedup family + ANN: kernel correctness and Dataset-level behavior."""
import numpy as np
import pandas as pd
import pytest

from entitydisambiguation_ray.stages.dedup import (
    MinHasher,
    char_shingles,
    hamming64,
    jaccard,
    ngram_jaccard,
    simhash64,
    word_ngrams,
)


def test_shingles_and_jaccard():
    assert char_shingles("abcdef", 3) == {b"abc", b"bcd", b"cde", b"def"}
    assert char_shingles("ab", 3) == {b"ab"}
    assert jaccard(set(), set()) == 1.0
    assert jaccard({1, 2}, {2, 3}) == pytest.approx(1 / 3)
    assert word_ngrams("a b c d", 3) == {("a", "b", "c"), ("b", "c", "d")}
    assert ngram_jaccard("a b c", "a b c") == 1.0
    assert ngram_jaccard("a b c", "x y z") == 0.0


def test_minhash_estimates_jaccard():
    h = MinHasher(num_perm=128)
    a = char_shingles("the quick brown fox jumps over the lazy dog" * 3, 5)
    b = char_shingles("the quick brown fox jumped over the lazy dog" * 3, 5)
    true_j = jaccard(a, b)
    sa, sb = h.signature(a), h.signature(b)
    est = float(np.mean(sa == sb))
    assert abs(est - true_j) < 0.15
    # identical sets → identical signatures; deterministic across instances
    assert np.array_equal(h.signature(a), MinHasher(num_perm=128).signature(a))


def test_simhash_properties():
    a = simhash64("the quick brown fox jumps over the lazy dog")
    b = simhash64("the quick brown fox jumps over the lazy dog")
    c = simhash64("the quick brown fox jumped over a lazy dog")
    d = simhash64("completely unrelated text about databases and queries")
    assert a == b
    assert hamming64(a, c) < hamming64(a, d)
    assert 0 <= a < (1 << 64)


def test_exact_dedup_dataset(ray_session):
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import exact_dedup

    ds = rd.from_items([
        {"doc_id": 3, "text": "aaa"}, {"doc_id": 1, "text": "aaa"},
        {"doc_id": 2, "text": "bbb"},
    ])
    out = exact_dedup(ds, "doc_id", "text").to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2]


def test_minhash_lsh_finds_neardups(ray_session):
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import minhash_lsh_pairs

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight ") * 4
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base.replace("fox", "cat")},   # near-dup
        {"doc_id": 2, "text": base},                          # exact dup
        {"doc_id": 3, "text": "entirely different content about ray data "
                              "pipelines and arrow batches " * 6},
    ]
    out = minhash_lsh_pairs(rd.from_items(rows), "doc_id", "text",
                            threshold=0.4).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 2) in pairs
    assert (0, 1) in pairs or (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_minhash_verify_join_equals_broadcast(ray_session):
    """The scale-path join verify produces exactly the legacy broadcast
    verify's pairs (same ids, same jaccard) with no driver text collect."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import minhash_lsh_pairs

    base = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
            "eiusmod tempor incididunt ut labore et dolore magna aliqua ") * 3
    rows = []
    for i in range(40):
        if i % 4 == 0:
            rows.append({"doc_id": i, "text": base})
        elif i % 4 == 1:
            rows.append({"doc_id": i,
                         "text": base.replace("dolor", f"dolor{i % 8}")})
        else:
            rows.append({"doc_id": i, "text": f"unique content {i} " * 30})
    ds = rd.from_items(rows)
    a = (minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.4,
                           verify="join").to_pandas()
         .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    b = (minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.4,
                           verify="broadcast").to_pandas()
         .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a[["id_a", "id_b", "jaccard"]],
                                  b[["id_a", "id_b", "jaccard"]])


def test_ann_brute_force_and_lsh(ray_session):
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.ann import brute_force_topk, lsh_topk

    rng = np.random.Generator(np.random.PCG64(7))
    mat = rng.standard_normal((300, 32))
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(300)]
    ds = rd.from_items(rows)
    q = mat[:2]
    exact = brute_force_topk(ds, "vec_id", "embedding", q, k=5)
    # self is always rank 1 with cosine 1
    top1 = exact[exact["rank"] == 1]
    assert top1["vec_id"].tolist() == [0, 1]
    assert np.allclose(top1["cosine"], 1.0)
    assert (exact.groupby("query_idx").size() == 5).all()
    # LSH recall: the query's own bucket always contains the query itself
    approx = lsh_topk(ds, "vec_id", "embedding", q, k=5, n_planes=4)
    a1 = approx[approx["rank"] == 1]
    assert a1["vec_id"].tolist() == [0, 1]
    # approximate top-5 overlaps exact top-5 meaningfully
    for qi in (0, 1):
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        assert len(e & a) >= 1


def test_exact_dedup_idempotent(ray_session):
    """Dedup idempotence property (SURVEY.md §5.4)."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import exact_dedup

    ds = rd.from_items([
        {"doc_id": i, "text": f"t{i % 4}"} for i in range(20)
    ])
    once = exact_dedup(ds, "doc_id", "text").to_pandas().sort_values("doc_id")
    twice = exact_dedup(
        exact_dedup(ds, "doc_id", "text"), "doc_id", "text"
    ).to_pandas().sort_values("doc_id")
    assert once["doc_id"].tolist() == twice["doc_id"].tolist() == [0, 1, 2, 3]


def test_ivf_topk(ray_session):
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.ann import brute_force_topk, ivf_topk

    rng = np.random.Generator(np.random.PCG64(5))
    mat = rng.standard_normal((400, 32))
    ds = rd.from_items([{"vec_id": i, "embedding": mat[i].tolist()}
                        for i in range(400)])
    q = mat[:2]
    exact = brute_force_topk(ds, "vec_id", "embedding", q, k=5)
    approx = ivf_topk(ds, "vec_id", "embedding", q, k=5,
                      n_centroids=8, n_probe=4)
    # query's own vector survives probing (its bucket is probed first)
    a1 = approx[approx["rank"] == 1]
    assert a1["vec_id"].tolist() == [0, 1]
    for qi in (0, 1):
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        assert len(e & a) >= 2  # half-probe recall on random data


def test_embedding_neardup_lsh_finds_planted_pair(ray_session):
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import embedding_neardup_lsh

    rng = np.random.Generator(np.random.PCG64(9))
    mat = rng.standard_normal((100, 32))
    mat[7] = mat[3] + 0.01 * rng.standard_normal(32)  # planted near-dup
    ds = rd.from_items([{"vec_id": i, "embedding": mat[i].tolist()}
                        for i in range(100)])
    out = embedding_neardup_lsh(ds, "vec_id", "embedding",
                                threshold=0.95).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (3, 7) in pairs


def test_minhash_dedup_components(ray_session):
    """Pairs → transitive closure: planted dup clusters collapse to their
    smallest member; unrelated docs never appear."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import minhash_dedup

    base_a = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
              "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4
    base_b = ("one two three four five six seven eight nine ten eleven "
              "twelve thirteen fourteen fifteen sixteen seventeen ") * 4
    rows = []
    for i in range(4):                       # cluster A: docs 0-3
        rows.append({"doc_id": i, "text": base_a})
    for i in range(4, 7):                    # cluster B: docs 4-6
        rows.append({"doc_id": i, "text": base_b})
    for i in range(7, 15):                   # singletons
        rows.append({"doc_id": i, "text": f"unique words {i} " * 40})
    out = minhash_dedup(rd.from_items(rows), "doc_id", "text",
                        threshold=0.5, nparts=4).to_pandas()
    got = dict(zip(out["doc_id"], out["canonical_id"]))
    assert {got[i] for i in range(4)} == {0}
    assert {got[i] for i in range(4, 7)} == {4}
    assert not any(i in got for i in range(7, 15))
    assert out["doc_id"].dtype == "int64"


def test_prefix_jaccard_dedup_components(ray_session):
    """Exact-open-domain collapse (prefix_jaccard_pairs → components_auto):
    planted near-identical clusters collapse to their smallest member and
    the mapping equals a brute-force driver union-find over brute-force
    exact-Jaccard pairs."""
    import itertools

    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import (
        prefix_jaccard_dedup,
    )
    from entitydisambiguation_ray.stages.dedup import word_ngrams
    from entitydisambiguation_ray.state.unionfind import driver_components

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    for i in range(5):                       # cluster A: tiny edits
        txt = " ".join(words[: 18 - (i % 2)])
        rows.append({"doc_id": i, "text": txt})
    for i in range(5, 8):                    # cluster B: digits vocab
        txt = " ".join(str(x) for x in range(30 + (i % 2)))
        rows.append({"doc_id": i, "text": txt})
    for i in range(8, 16):                   # singletons
        rows.append({"doc_id": i, "text": f"unique{i} " * 20 + f"tail{i}"})
    out = prefix_jaccard_dedup(rd.from_items(rows), "doc_id", "text",
                               threshold=0.8, n=1, nparts=4).to_pandas()
    got = dict(zip(out["doc_id"], out["canonical_id"]))

    # brute-force oracle: exact jaccard over all pairs -> driver UF
    shingles = {r["doc_id"]: word_ngrams(r["text"], 1) for r in rows}
    edges = []
    for a, b in itertools.combinations(sorted(shingles), 2):
        sa, sb = shingles[a], shingles[b]
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.8:
            edges.append((f"{a:020d}", f"{b:020d}"))
    ref = {int(k): int(v)
           for k, v in driver_components(edges).items()}
    assert got == ref
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in range(5, 8)} == {5}
    assert not any(i in got for i in range(8, 16))
    assert out["doc_id"].dtype == "int64"


def test_ivf_trained_centroids_recall(ray_session):
    """kmeans_fit + ivf_topk: on a clustered corpus, trained coarse
    centroids give high recall@k vs exact while scanning a fraction."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.ann import (
        brute_force_topk,
        ivf_topk,
        kmeans_fit,
    )

    rng = np.random.Generator(np.random.PCG64(5))
    centers = rng.standard_normal((6, 24)) * 3
    mat = np.vstack([c + rng.standard_normal((60, 24)) for c in centers])
    ds = rd.from_items([{"vec_id": i, "embedding": mat[i].tolist()}
                        for i in range(len(mat))])
    q = mat[[0, 100, 250]]
    cents = kmeans_fit(ds, "embedding", n_centroids=6, iters=4)
    assert cents.shape == (6, 24)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    exact = brute_force_topk(ds, "vec_id", "embedding", q, k=10)
    approx = ivf_topk(ds, "vec_id", "embedding", q, k=10, n_probe=2,
                      centroids=cents)
    recalls = []
    for qi in range(3):
        e = set(exact.loc[exact["query_idx"] == qi, "vec_id"])
        a = set(approx.loc[approx["query_idx"] == qi, "vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


def test_hyperloglog_accuracy(ray_session):
    """HLL sketch within ~2% of exact distinct count; merge associative."""
    import ray.data as rd

    from entitydisambiguation_ray.stages.sketches import (
        HyperLogLog,
        approx_distinct,
    )

    exact = 5000
    ds = rd.range(20000).map_batches(
        lambda b: {"k": (b["id"] % exact).astype("int64")},
        batch_format="numpy")
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - exact) / exact < 0.05
    # merge of split sketches == sketch of union
    a = HyperLogLog(10).add_many(range(0, 3000))
    b = HyperLogLog(10).add_many(range(2000, 6000))
    u = HyperLogLog(10).add_many(range(0, 6000))
    assert a.merge(b).estimate() == u.estimate()
    # serialize round trip
    s = u.serialize()
    assert HyperLogLog.deserialize(s, 10).estimate() == u.estimate()


def test_approx_distinct_by_matches_exact(ray_session):
    """Grouped HLL within 2% of the exact per-group distinct count."""
    import ray.data as rd

    from entitydisambiguation_ray.stages.sketches import approx_distinct_by

    ds = rd.range(30000).map_batches(
        lambda b: {"g": np.where(b["id"] % 3 == 0, "A", "B"),
                   "k": (b["id"] % 4000).astype("int64")},
        batch_format="numpy")
    out = approx_distinct_by(ds, "g", "k", p=12).set_index("g")["approx_n"]
    # exact: group A holds k = 3i % 4000 → all 4000 residues; B the same
    assert abs(out["A"] - 4000) / 4000 < 0.02
    assert abs(out["B"] - 4000) / 4000 < 0.02


def test_embedding_lsh_multiprobe_recall(ray_session):
    """Multi-probe LSH recovers strictly more near-dup pairs than one
    probe (independent plane sets union their buckets)."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    rng = np.random.Generator(np.random.PCG64(21))
    mat = rng.standard_normal((200, 16))
    # plant 30 near-dup pairs
    for i in range(30):
        mat[100 + i] = mat[i] + 0.05 * rng.standard_normal(16)
    rows = [{"vec_id": i, "embedding": mat[i].tolist(), "label": 0}
            for i in range(200)]
    ds = rd.from_items(rows)
    exact = embedding_neardup_pairs(ds, "vec_id", "embedding", "label",
                                    threshold=0.95).to_pandas()
    gold = set(zip(exact["id_a"], exact["id_b"]))
    p1 = embedding_neardup_lsh(ds, "vec_id", "embedding", threshold=0.95,
                               n_planes=8, n_probes=1).to_pandas()
    p3 = embedding_neardup_lsh(ds, "vec_id", "embedding", threshold=0.95,
                               n_planes=8, n_probes=3).to_pandas()
    r1 = len(set(zip(p1["id_a"], p1["id_b"])) & gold) / max(len(gold), 1)
    r3 = len(set(zip(p3["id_a"], p3["id_b"])) & gold) / max(len(gold), 1)
    assert r3 >= r1
    assert r3 >= 0.8, (r1, r3)
    # no false pairs: every emitted pair passes the cosine threshold
    assert set(zip(p3["id_a"], p3["id_b"])) <= gold


def test_bloom_filter_properties():
    """No false negatives ever; false-positive rate near theory; OR-merge
    equals the filter of the union; serialize round-trips."""
    from entitydisambiguation_ray.stages.sketches import BloomFilter

    rng = np.random.Generator(np.random.PCG64(3))
    members = rng.integers(0, 10**9, 5000)
    others = rng.integers(10**9, 2 * 10**9, 20000)
    bf = BloomFilter(m_bits=1 << 16, k=5).add_many(members)
    assert bf.contains_many(members).all()  # no false negatives
    fp = bf.contains_many(others).mean()
    # theory: (1 - e^{-k n/m})^k ≈ 0.022 at n=5000, m=65536, k=5
    assert fp < 0.08, fp
    a = BloomFilter(m_bits=1 << 16).add_many(members[:2500])
    b = BloomFilter(m_bits=1 << 16).add_many(members[2500:])
    merged = a.merge(b)
    assert np.array_equal(merged.words,
                          BloomFilter(m_bits=1 << 16)
                          .add_many(members).words)
    back = BloomFilter.deserialize(merged.serialize(), m_bits=1 << 16)
    assert back.contains_many(members).all()


def test_round2_prune_invariant_guard():
    """token_prune_exact reflects the config algebra; the distributed
    round-2 fails loudly when the prune is inexact."""
    import pytest

    from entitydisambiguation_ray.config import EngineConfig
    from entitydisambiguation_ray.functions.scoring import (
        bge_prefilter_floor,
        token_prune_exact,
    )

    assert token_prune_exact(EngineConfig())
    # lowering the threshold below the ce=0 ceiling breaks the invariant
    assert not token_prune_exact(EngineConfig(high_threshold=0.65))
    # a type bonus > 1 lifts the ceiling past the default threshold
    assert not token_prune_exact(EngineConfig(type_match_bonus=1.1))
    # default floor: (0.72 - 0.6) / 0.4 = 0.3
    assert abs(bge_prefilter_floor(EngineConfig()) - 0.3) < 1e-12
    # reranker="none": ce is always 0 → tighter floor (0.72-0.3)/0.4
    assert abs(bge_prefilter_floor(EngineConfig(reranker="none")) - 1.05) < 1e-12

    import ray.data as rd

    from entitydisambiguation_ray.pipelines.round2 import (
        distributed_round2_edges,
    )

    with pytest.raises(ValueError, match="not exact"):
        distributed_round2_edges(rd.from_items([{"decision": "create"}]),
                                 EngineConfig(high_threshold=0.65))


def test_kll_quantile_accuracy(ray_session):
    """KLL sketch rank error ≤ 2·(1.65/k) vs exact quantiles on a skewed
    distribution; merge-of-parts ≈ sketch-of-whole; serialize roundtrip."""
    import ray.data as rd

    from entitydisambiguation_ray.stages.sketches import (
        KLL,
        approx_quantiles,
    )

    n = 100_000
    ds = rd.range(n).map_batches(
        # deterministic skewed values: exp of a uniform grid, shuffled by
        # a multiplicative hop so batches are not pre-sorted
        lambda b: {"v": np.exp(((b["id"] * 48271) % n) / n * 5.0)},
        batch_format="numpy")
    qs = [0.1, 0.5, 0.9, 0.99]
    est = approx_quantiles(ds, "v", qs, k=200)
    allv = np.sort(np.exp(((np.arange(n) * 48271) % n) / n * 5.0))
    for q, e in zip(qs, est):
        rank = np.searchsorted(allv, e) / n
        assert abs(rank - q) <= 2 * (1.65 / 200), (q, rank)
    s = KLL(100).add_many(allv[:5000])
    rt = KLL.deserialize(s.serialize(), 100)
    assert np.allclose(rt.quantiles(qs), s.quantiles(qs))


def test_misra_gries_bound_and_topset(ray_session):
    """MG summary: estimates obey [est, est+err] vs exact counts and the
    exact top-5 of a Zipf-ish stream survives the merge."""
    import ray.data as rd

    from entitydisambiguation_ray.stages.sketches import heavy_hitters_sketch

    n = 60_000
    # zipf-ish: value v appears ~n/(v+1)^1.2 times, deterministic
    ds = rd.range(n).map_batches(
        lambda b: {"v": np.floor(((b["id"] * 2654435761 % n) / n)
                                 ** 3 * 40).astype("int64")},
        batch_format="numpy")
    out = heavy_hitters_sketch(ds, "v", k=30)
    vals = np.floor(((np.arange(n) * 2654435761 % n) / n) ** 3
                    * 40).astype("int64")
    import collections

    exact = collections.Counter(vals.tolist())
    for _, row in out.head(10).iterrows():
        t = exact[row["value"]]
        assert row["count"] <= t <= row["count"] + row["err"], dict(row)
    top5_true = [k for k, _ in exact.most_common(5)]
    assert set(top5_true) <= set(out.head(10)["value"])


def test_nearest_centroid_matches_numpy(ray_session):
    """Distributed nearest-centroid confusion counts == a driver-side
    numpy recomputation on the same table (exact, integer counts)."""
    import numpy as np
    import pyarrow.parquet as pq

    from entitydisambiguation_ray.pipelines.ann import (
        nearest_centroid_accuracy,
    )

    sf = "/root/testdata/sf0.001"
    got = nearest_centroid_accuracy(sf)
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["label", "embedding"])
    m = np.array(t.column("embedding").to_pylist(), dtype="float64")
    labels = np.array(t.column("label").to_pylist(), dtype="int64")
    labs = np.unique(labels)
    cent = np.stack([m[labels == l].mean(axis=0) for l in labs])
    # same algebraic form as the engine (c2 - 2 x.c) so argmin ties
    # break identically
    dist = (cent ** 2).sum(axis=1)[None, :] - 2.0 * (m @ cent.T)
    assigned = labs[np.argmin(dist, axis=1)]
    # engine centroids come from block-order-dependent float sums, the
    # oracle's from numpy mean — near-argmin ties can legitimately flip;
    # allow discrepancy only up to each label's count of near-tie vectors
    srt = np.sort(dist, axis=1)
    margin = srt[:, 1] - srt[:, 0]
    for _, row in got.iterrows():
        mask = labels == row["label"]
        assert row["n"] == int(mask.sum())
        exact = int((assigned[mask] == row["label"]).sum())
        slack = int((margin[mask] < 1e-9).sum())
        assert abs(row["n_correct"] - exact) <= slack
    assert got["n"].sum() == len(labels)


def test_countmin_bounds_vs_exact(ray_session):
    """CM guarantee on real data: est >= true count for every queried
    token, and est <= true + eps*N for the documents corpus (w=2048 is
    far wider than the 31-token vocabulary, so estimates are near-exact
    here; the overestimate bound is what the sketch contracts)."""
    import ray.data as rd
    from collections import Counter

    import pyarrow.parquet as pq

    from entitydisambiguation_ray.stages.sketches import cm_token_freq

    sf = "/root/testdata/sf0.001"
    texts = pq.read_table(f"{sf}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    exact: Counter = Counter()
    for t in texts:
        exact.update(t.split())
    queries = sorted(exact)[:10] + ["never-seen-token"]
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    got = cm_token_freq(ds, "text", queries=queries)
    n = int(sum(exact.values()))
    assert (got["n_total"] == n).all()
    import math
    eps_n = math.e / 2048 * n
    for _, row in got.iterrows():
        true = exact.get(row["token"], 0)
        assert row["est"] >= true                 # never underestimates
        assert row["est"] <= true + eps_n + 1e-9  # CM overestimate bound


def test_countmin_merge_is_additive(ray_session):
    """Merging two CM sketches == sketching the concatenation (the
    combiner property the distributed stage relies on)."""
    from entitydisambiguation_ray.stages.sketches import CountMin

    a = CountMin(64, 3).add_counts(["x", "y"], [5, 2])
    b = CountMin(64, 3).add_counts(["x", "z"], [1, 7])
    both = CountMin(64, 3).add_counts(["x", "y", "z"], [6, 2, 7])
    a.merge(b)
    assert (a.m == both.m).all()
    assert a.estimate("x") == both.estimate("x") >= 6


# ---------------------------------------------------------------------------
# ngram_jaccard_pairs bounded-block contract (round-3 finding: the dense
# per-block kernel must refuse or reroute corpus-scale blocks, not OOM)
# ---------------------------------------------------------------------------
def _blocked_corpus():
    import ray.data as rd

    rng = np.random.default_rng(21)
    words = [f"w{i}" for i in range(40)]
    rows = []
    # a big "en" block (30 docs, planted near-dups) + small "fr" block
    for i in range(30):
        base = [words[int(x)] for x in rng.integers(0, 40, size=12)]
        rows.append({"doc_id": f"en{i:03d}", "lang": "en",
                     "text": " ".join(base)})
        if i % 3 == 0:  # planted near-dup
            dup = list(base)
            dup[0] = words[(int(rng.integers(0, 40)) + 1) % 40]
            rows.append({"doc_id": f"en{i:03d}d", "lang": "en",
                         "text": " ".join(dup)})
    for i in range(6):
        base = [words[int(x)] for x in rng.integers(0, 40, size=10)]
        rows.append({"doc_id": f"fr{i:03d}", "lang": "fr",
                     "text": " ".join(base)})
    rows.append({"doc_id": "empty1", "lang": "fr", "text": ""})
    rows.append({"doc_id": "empty2", "lang": "fr", "text": ""})
    return rd.from_items(rows)


def test_ngram_jaccard_block_cap_raises(ray_session):
    from entitydisambiguation_ray.pipelines.dedup import ngram_jaccard_pairs

    ds = _blocked_corpus()
    with pytest.raises(ValueError, match="block_cap"):
        ngram_jaccard_pairs(ds, "doc_id", "text", "lang",
                            threshold=0.5, block_cap=10).count()


@pytest.mark.parametrize("n", [1, 2])
def test_ngram_jaccard_reroute_parity(ray_session, n):
    """oversize='reroute' (prefix-filter path for blocks over the cap)
    must emit the identical pair set + jaccard values as the unbounded
    dense kernel."""
    from entitydisambiguation_ray.pipelines.dedup import ngram_jaccard_pairs

    ds = _blocked_corpus()
    ref = (ngram_jaccard_pairs(ds, "doc_id", "text", "lang",
                               threshold=0.5, n=n, block_cap=10**6)
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    got = (ngram_jaccard_pairs(ds, "doc_id", "text", "lang",
                               threshold=0.5, n=n, block_cap=10,
                               oversize="reroute")
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    assert len(ref) > 0  # planted dups must actually pair
    pd.testing.assert_frame_equal(got, ref)


def test_ngram_jaccard_reroute_stays_within_block(ray_session):
    """Rerouted pairs must never cross the blocking key (prefix path runs
    PER oversized block)."""
    import ray.data as rd

    from entitydisambiguation_ray.pipelines.dedup import ngram_jaccard_pairs

    rows = []
    for blk in ("a", "b"):  # identical texts in DIFFERENT blocks
        for i in range(12):
            rows.append({"doc_id": f"{blk}{i:02d}", "lang": blk,
                         "text": "same exact text here"})
    ds = rd.from_items(rows)
    got = ngram_jaccard_pairs(ds, "doc_id", "text", "lang",
                              threshold=0.5, block_cap=5,
                              oversize="reroute").to_pandas()
    assert len(got) == 2 * (12 * 11 // 2)
    assert not ((got["doc_a"].str[0] != got["doc_b"].str[0]).any())
