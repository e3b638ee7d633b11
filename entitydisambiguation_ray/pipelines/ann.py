"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k — the baseline.  The query matrix
  is broadcast once (``ray.put``), each batch does one numpy matmul, partial
  top-k per batch (the combiner), and the driver merges tiny per-batch
  partials.  No shuffle at all; scales linearly with corpus size.
- ``lsh_topk``: random-hyperplane LSH variant — the scale path.  Vectors are
  bucketed by sign-pattern; only the query's bucket (plus optional
  multi-probe neighbors) is scanned.  Recall vs the exact baseline is
  measured in pytest.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _as_matrix(col) -> np.ndarray:
    """vectors → (n, dim) float64 matrix.

    Fast path for Arrow ``list<float>`` columns with uniform lengths: one
    vectorized ``list_flatten`` (offset-safe for sliced arrays) + reshape —
    no per-row Python materialization.  Falls back to the generic per-row
    path for Python lists / ragged input."""
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        try:
            import pyarrow.compute as pc

            lens = pc.list_value_length(col)
            n = len(col)
            if n and lens.null_count == 0:
                mn = pc.min_max(lens).as_py()
                if mn["min"] == mn["max"] and mn["min"] is not None:
                    dim = mn["min"]
                    flat = pc.list_flatten(col).to_numpy(
                        zero_copy_only=False)
                    return flat.reshape(n, dim).astype(np.float64, copy=False)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, ValueError):
            pass
        col = col.to_pylist()
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


_BCAST_CACHE: dict[str, object] = {}
_BCAST_CACHE_MAX = 4  # shared by topk/kmeans/decontaminate — keep a few
                      # live refs so interleaved queries don't thrash


def _fetch_bcast(ref):
    """Fetch a ``ray.put`` broadcast once per worker process, memoized by
    object-ref id (the warm-task pattern: no actor pool is spawned per run,
    and repeat runs over the same ref pay zero re-fetch).  Bounded LRU-ish
    (insertion order) so two live broadcasts alternating in one worker —
    concurrent queries, the overlap checkpoint runner — don't evict each
    other on every batch."""
    key = ref.hex()
    v = _BCAST_CACHE.get(key)
    if v is None:
        while len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        v = ray.get(ref)
        _BCAST_CACHE[key] = v
    return v


def _topk_partial(batch: pa.Table, *, ref, id_col: str, vec_col: str,
                  k: int) -> pa.Table:
    """Per-batch partial top-k as a STATELESS task over warm workers.

    Round-3 profile showed ``ActorPoolMapOperator[MapBatches(PartialTopK)]``
    spawning a fresh actor pool per query run — per-run actor spawn cost on
    a 3-query workload.  The combiner holds no mutable state, so it runs as
    plain tasks with the normalized query matrix broadcast via ``ray.put``
    and memoized per worker (the ``_kmeans_partial`` pattern)."""
    q = _fetch_bcast(ref)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    mat = _normalize(_as_matrix(batch.column(vec_col)))
    cos = mat @ q.T  # (n, nq)
    nq = q.shape[0]
    kk = min(k, len(ids))
    if kk < len(ids):
        # one vectorized partial top-k across ALL queries at once
        top = np.argpartition(-cos, kk - 1, axis=0)[:kk]  # (kk, nq)
    else:
        top = np.tile(np.arange(len(ids))[:, None], (1, nq))
    qi = np.repeat(np.arange(nq, dtype=np.int32), top.shape[0])
    rows = top.T.ravel()
    return pa.table({
        "query_idx": pa.array(qi, pa.int32()),
        id_col: pa.array(ids[rows]),
        "cosine": pa.array(cos[rows, qi], pa.float64()),
    })


def brute_force_topk(
    ds: rd.Dataset, id_col: str, vec_col: str,
    queries: np.ndarray, k: int = 10,
) -> pd.DataFrame:
    """Exact cosine top-k for each query row → DataFrame
    (query_idx, id, cosine, rank).  Ties broken by ascending id."""
    import functools

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    partials = ds.map_batches(
        functools.partial(_topk_partial, ref=q_ref, id_col=id_col,
                          vec_col=vec_col, k=k),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = []
    for qi, g in partials.groupby("query_idx"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    if not out:  # empty corpus (e.g. LSH bucket with no members)
        return pd.DataFrame(columns=["query_idx", id_col, "cosine", "rank"])
    return pd.concat(out, ignore_index=True)


class HyperplaneLSH:
    """Sign-pattern bucketing with fixed seeded hyperplanes."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 42):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.standard_normal((n_planes, dim))

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes.T) > 0
        return (signs.astype(np.uint32) << np.arange(signs.shape[1],
                                                     dtype=np.uint32)).sum(axis=1)


def lsh_topk(
    ds: rd.Dataset, id_col: str, vec_col: str,
    queries: np.ndarray, k: int = 10, n_planes: int = 6,
) -> pd.DataFrame:
    """LSH-bucketed approximate top-k: scan only rows in each query's bucket.

    One pass to tag buckets (map_batches), one filtered brute-force pass.
    For corpora where even a bucket is huge, the bucket tag becomes the
    partition key of a sorted parquet layout and queries read one partition."""
    qm = np.asarray(queries, dtype=np.float64)
    dim = qm.shape[1]
    lsh = HyperplaneLSH(dim, n_planes=n_planes)
    qbuckets = set(lsh.bucket(_normalize(qm)).tolist())

    def tag(batch: pa.Table) -> pa.Table:
        mat = _normalize(_as_matrix(batch.column(vec_col)))
        b = lsh.bucket(mat)
        batch = batch.append_column("bucket", pa.array(b, pa.uint32()))
        mask = pa.array(np.isin(b, list(qbuckets)))
        return batch.filter(mask)

    filtered = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return brute_force_topk(filtered, id_col, vec_col, qm, k=k)


def _kmeans_partial(batch: pa.Table, *, ref, vec_col: str) -> pa.Table:
    """Per-batch Lloyd combiner as a STATELESS task over warm workers: the
    per-iteration centroid matrix ships once via ``ray.put`` and is fetched
    once per worker process per iteration (memoized by object-ref id) — no
    actor pool is spawned per iteration (a fresh pool per Lloyd round paid
    actor spawn × iters; warm tasks reuse the already-imported workers, the
    same pattern as kg.rewrite_edges_batch)."""
    c = _fetch_bcast(ref)
    mat = _normalize(_as_matrix(batch.column(vec_col)))
    cid = np.argmax(mat @ c.T, axis=1)
    sums = np.zeros_like(c)
    np.add.at(sums, cid, mat)
    counts = np.bincount(cid, minlength=c.shape[0])
    return pa.table({
        "cid": pa.array(np.arange(c.shape[0]), pa.int32()),
        "count": pa.array(counts, pa.int64()),
        "sum": pa.array(list(sums), pa.list_(pa.float64())),
    })


def kmeans_fit(
    ds: rd.Dataset, vec_col: str, n_centroids: int = 16,
    iters: int = 5, seed: int = 42,
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) for IVF coarse quantization.

    Each iteration is ONE streaming pass: every batch assigns its vectors
    to the nearest current centroid and emits per-centroid partial sums +
    counts (the combiner — k × dim floats per batch, independent of batch
    size); the driver reduces the tiny partials and renormalizes.  No
    shuffle; driver payload is O(k · dim · n_batches) per iteration.
    Initialization: seeded deterministic hyperplane directions (the same
    untrained centroids ``ivf_topk`` defaults to), so fit is reproducible
    across runs and cluster layouts."""
    import functools

    rng = np.random.Generator(np.random.PCG64(seed))
    first = ds.limit(1).to_pandas()
    dim = len(np.asarray(first[vec_col].iloc[0]))
    centroids = _normalize(rng.standard_normal((n_centroids, dim)))
    for _ in range(iters):
        ref = ray.put(centroids)
        parts = ds.map_batches(
            functools.partial(_kmeans_partial, ref=ref, vec_col=vec_col),
            batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        sums = np.zeros_like(centroids)
        counts = np.zeros(centroids.shape[0], dtype=np.int64)
        for cid, cnt, s in zip(parts["cid"], parts["count"], parts["sum"]):
            counts[cid] += cnt
            sums[cid] += np.asarray(s)
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        centroids = _normalize(centroids)
    return centroids


def ivf_topk(
    ds: rd.Dataset, id_col: str, vec_col: str,
    queries: np.ndarray, k: int = 10, n_centroids: int = 16,
    n_probe: int = 4, seed: int = 42,
    centroids: np.ndarray | None = None,
) -> pd.DataFrame:
    """IVF-style approximate top-k: vectors are bucketed by nearest coarse
    centroid; each query scans only its ``n_probe`` nearest centroid
    buckets (the inverted-file structure of Jégou et al.'s IVF indexes).
    Pass ``centroids=kmeans_fit(ds, vec_col, ...)`` for trained coarse
    quantization (better recall/scan-fraction trade-off on clustered
    corpora); the default is deterministic seeded pseudo-centroids — no
    training pass, cluster-stable.

    Two passes, no shuffle: (1) tag + filter to probed buckets,
    (2) brute-force within the ~n_probe/n_centroids fraction retained."""
    qm = np.asarray(queries, dtype=np.float64)
    dim = qm.shape[1]
    if centroids is None:
        rng = np.random.Generator(np.random.PCG64(seed))
        centroids = _normalize(rng.standard_normal((n_centroids, dim)))

    qn = _normalize(qm)
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    probed = set(probe.ravel().tolist())

    def tag(batch: pa.Table) -> pa.Table:
        mat = _normalize(_as_matrix(batch.column(vec_col)))
        cid = np.argmax(mat @ centroids.T, axis=1)
        mask = pa.array(np.isin(cid, list(probed)))
        return batch.filter(mask)

    filtered = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return brute_force_topk(filtered, id_col, vec_col, qm, k=k)


def nearest_centroid_accuracy(sf_dir: str):
    """Nearest-centroid classification of the embeddings table against its
    own per-label centroids (the evaluation loop behind prototype
    classifiers and IVF assignment QA): per label, how many vectors fall
    nearest their own centroid.  Scale shape: centroids come from the
    packed-key combiner aggregate (labels × dims driver payload),
    broadcast once via ``ray.put``; assignment is one (batch × k)
    matmul per batch with a per-batch (label, assigned) count combiner —
    vectors are never shuffled.  Rows-only query (the 640-float
    crossjoin SQL is not reasonably expressible); tests assert exact
    agreement with a driver-side numpy oracle."""
    import os

    import ray
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["label", "embedding"])

    from .relational import CENTROID_DIM_STRIDE, centroid_sum_partial

    agg = (ds.map_batches(centroid_sum_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("key").aggregate(Sum("s", alias_name="s"),
                                     Sum("cnt", alias_name="cnt"))
           .to_pandas())
    key = agg["key"].to_numpy(dtype="int64")
    labs = np.unique(key // CENTROID_DIM_STRIDE)
    d = int((key % CENTROID_DIM_STRIDE).max()) + 1
    cent = np.zeros((len(labs), d))
    lab_pos = {int(l): i for i, l in enumerate(labs)}
    for k, s, c in zip(key, agg["s"], agg["cnt"]):
        cent[lab_pos[int(k // CENTROID_DIM_STRIDE)],
             int(k % CENTROID_DIM_STRIDE)] = s / c
    cent_ref = ray.put((cent, labs.astype("int64")))

    class Assign:
        def __init__(self, ref):
            self.cent, self.labs = ray.get(ref)
            self.c2 = (self.cent ** 2).sum(axis=1)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if n == 0:  # empty block: matmul on (0,0) would raise
                return pa.table({"label": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "n_correct": pa.array([], pa.int64())})
            flat = pc.list_flatten(batch.column("embedding")) \
                .to_numpy(zero_copy_only=False).astype("float64")
            m = flat.reshape(n, len(flat) // max(n, 1))
            # argmin ||x-c||^2 = argmin c2 - 2 x·c
            dist = self.c2[None, :] - 2.0 * (m @ self.cent.T)
            assigned = self.labs[np.argmin(dist, axis=1)]
            true = batch.column("label").to_numpy(zero_copy_only=False) \
                .astype("int64")
            df = (pd.DataFrame({"label": true,
                                "ok": (assigned == true).astype("int64")})
                  .groupby("label", as_index=False)
                  .agg(n=("ok", "size"), n_correct=("ok", "sum")))
            return pa.Table.from_pandas(df, preserve_index=False,
                                        schema=pa.schema(
                                            [("label", pa.int64()),
                                             ("n", pa.int64()),
                                             ("n_correct", pa.int64())]))

    out = (ds.map_batches(Assign, fn_constructor_args=(cent_ref,),
                          batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=(1, 4))
           .groupby("label").aggregate(Sum("n", alias_name="n"),
                                       Sum("n_correct",
                                           alias_name="n_correct"))
           .to_pandas())
    for c in ("label", "n", "n_correct"):
        out[c] = out[c].astype("int64")
    return (out[["label", "n", "n_correct"]]
            .sort_values("label").reset_index(drop=True))
