"""Dataset-level deduplication pipelines.

Each function takes/returns ``ray.data.Dataset`` and composes the batch
kernels in ``stages/dedup.py`` with Ray Data shuffle primitives.  Shuffle
inventory per operator is documented inline (SURVEY.md §7.3 discipline).
"""
from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..stages.dedup import (
    MinHasher,
    hamming64,
    minhash_batch,
    ngram_jaccard,
    simhash_batch,
)
from ..stages.partition import dedup_first, partitioned_groupby
from ..stages.textops import fingerprint_batch

_VERIFY_CACHE: dict[str, dict] = {}


def exact_dedup(ds: rd.Dataset, id_col: str, text_col: str) -> rd.Dataset:
    """Exact duplicate removal: one shuffle on the md5 content hash;
    representative = smallest id (deterministic)."""
    hashed = ds.map_batches(
        functools.partial(fingerprint_batch, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return dedup_first(hashed, "fp_md5", nparts=32,
                       sort_by=[id_col]).drop_columns(["fp_md5"])


def minhash_lsh_pairs(
    ds: rd.Dataset, id_col: str, text_col: str,
    *, num_perm: int = 64, bands: int = 16, threshold: float = 0.6,
    shingle_k: int = 5, verify: str = "join",
) -> rd.Dataset:
    """MinHash+LSH near-dup detection → verified pair list
    (id_a, id_b, jaccard ≥ threshold).

    Shuffles: (1) band groupby over small (band, hash, id) rows;
    (2) candidate-pair groupby for dedup; (3+4) with ``verify="join"``
    (default, the scale path) the candidate pairs are joined BACK to the
    text table twice via the co-partitioned shuffle hash join
    (stages/join.py) — no full-corpus driver collect anywhere; the join
    input is only the (small) candidate set on the left and the text table
    on the right.  ``verify="broadcast"`` keeps the legacy id→text
    broadcast (driver-collected — only for corpora that fit the driver;
    equivalence-tested against the join path)."""
    rows_per_band = num_perm // bands
    hasher = MinHasher(num_perm=num_perm)
    exploded = ds.map_batches(
        functools.partial(
            minhash_batch, id_col=id_col, text_col=text_col,
            hasher=hasher, bands=bands, rows_per_band=rows_per_band,
            shingle_k=shingle_k,
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # bucket → pairs via coarse hash partitioning on band_hash (one
    # vectorized pandas groupby per partition instead of one map_groups
    # call per micro-bucket — stages/partition.py rationale)
    def buckets_to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a: list = []
        out_b: list = []
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            ids = sorted(set(g["doc_id"].tolist()))
            for i, a in enumerate(ids):
                for b in ids[i + 1:]:
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    candidates = partitioned_groupby(exploded, "band_hash", buckets_to_pairs,
                                     nparts=32)
    # distinct candidate pairs (a pair can collide in several bands)
    def pair_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("id_a"), pa.string()),
            pc.cast(batch.column("id_b"), pa.string()), "\x1f")
        return batch.append_column("pair_key", key)

    candidates = dedup_first(
        candidates.map_batches(pair_key, batch_format="pyarrow"),
        "pair_key", nparts=8,
    ).drop_columns(["pair_key"])

    if verify == "join":
        return _verify_pairs_join(candidates, ds, id_col, text_col, threshold)
    if verify != "broadcast":
        raise ValueError(f"verify must be 'join' or 'broadcast', {verify!r}")

    tdf = ds.select_columns([id_col, text_col]).to_pandas()
    texts = dict(zip(tdf[id_col], tdf[text_col]))
    import ray
    texts_ref = ray.put(texts)

    def verify_fn(batch: pa.Table) -> pa.Table:
        # stateless task over warm workers; broadcast text map fetched once
        # per worker process (same pattern as kg.rewrite_edges_batch)
        key = texts_ref.hex()
        tmap = _VERIFY_CACHE.get(key)
        if tmap is None:
            _VERIFY_CACHE.clear()
            tmap = ray.get(texts_ref)
            _VERIFY_CACHE[key] = tmap
        ja = [
            ngram_jaccard(tmap.get(a, ""), tmap.get(b, ""))
            for a, b in zip(batch.column("id_a").to_pylist(),
                            batch.column("id_b").to_pylist())
        ]
        batch = batch.append_column("jaccard", pa.array(ja, pa.float64()))
        return batch.filter(
            pa.compute.greater_equal(batch.column("jaccard"), threshold))

    return candidates.map_batches(verify_fn, batch_format="pyarrow")


def _verify_pairs_join(candidates: rd.Dataset, ds: rd.Dataset,
                       id_col: str, text_col: str,
                       threshold: float) -> rd.Dataset:
    """Exact-Jaccard verification of candidate pairs WITHOUT any driver-side
    text table: two shuffle hash joins fetch text_a / text_b, then a
    stateless per-row kernel scores and filters.  Join input sizes: |pairs|
    (left, small after banding) × |corpus| (right) — both streamed.
    Schemas are passed explicitly so the chained joins never call
    ``Dataset.schema()`` on the (expensive) candidate lineage."""
    from ..stages.join import _arrow_types, shuffle_hash_join

    texts = ds.select_columns([id_col, text_col])
    ttypes = _arrow_types(texts)  # cheap: source-backed
    idt = ttypes[id_col]
    cand_types = {"id_a": idt, "id_b": idt}
    j1 = shuffle_hash_join(candidates, texts, on="id_a", right_on=id_col,
                           nparts=16, rsuffix="_a",
                           ltypes=cand_types, rtypes=ttypes)
    j1 = _rename(j1, text_col, "_text_a")
    j1_types = {**cand_types, "_text_a": ttypes[text_col]}
    j2 = shuffle_hash_join(j1, texts, on="id_b", right_on=id_col,
                           nparts=16, rsuffix="_b",
                           ltypes=j1_types, rtypes=ttypes)
    j2 = _rename(j2, text_col, "_text_b")

    def score(batch: pa.Table) -> pa.Table:
        ja = [ngram_jaccard(a or "", b or "")
              for a, b in zip(batch.column("_text_a").to_pylist(),
                              batch.column("_text_b").to_pylist())]
        batch = batch.append_column("jaccard", pa.array(ja, pa.float64()))
        batch = batch.filter(
            pa.compute.greater_equal(batch.column("jaccard"), threshold))
        return batch.select(["id_a", "id_b", "jaccard"])

    return j2.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def _rename(ds_in: rd.Dataset, old: str, new: str) -> rd.Dataset:
    return ds_in.map_batches(
        lambda t: t.rename_columns(
            [new if c == old else c for c in t.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)


def simhash_pairs(ds: rd.Dataset, id_col: str, text_col: str,
                  *, max_hamming: int = 3) -> rd.Dataset:
    """SimHash near-dup pairs (Hamming ≤ max_hamming) via 4×16-bit band
    blocking (pigeonhole-complete for max_hamming ≤ 3)."""
    sh = ds.map_batches(
        functools.partial(simhash_batch, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()  # consumed 4× below (one pass per band); small sketch rows

    def band_pairs(df: pd.DataFrame, band_col: str) -> pd.DataFrame:
        # each sketch row carries its own simhash, so the full Hamming check
        # runs from in-partition values — no driver-side id→simhash map
        rows = []
        for _, g in df.groupby(band_col, sort=False):
            if len(g) < 2:
                continue
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            ids = g["doc_id"].tolist()
            hs = [int(h) for h in g["simhash"]]
            for i, a in enumerate(ids):
                for j in range(i + 1, len(ids)):
                    h = hamming64(hs[i], hs[j])
                    if h <= max_hamming:
                        rows.append((a, ids[j], h))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])

    per_band = [
        partitioned_groupby(sh, f"sh_band{b}",
                            functools.partial(band_pairs,
                                              band_col=f"sh_band{b}"),
                            nparts=16)
        for b in range(4)
    ]
    allp = per_band[0].union(*per_band[1:])

    def pkey(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("id_a"), pa.string()),
            pc.cast(batch.column("id_b"), pa.string()), "\x1f")
        return batch.append_column("pair_key", key)

    return dedup_first(allp.map_batches(pkey, batch_format="pyarrow"),
                       "pair_key", nparts=16).drop_columns(["pair_key"])


def embedding_neardup_pairs(
    ds: rd.Dataset, id_col: str, vec_col: str, block_col: str,
    *, threshold: float = 0.35,
) -> rd.Dataset:
    """Embedding-cosine near-dup: pairs with cosine > threshold within a
    blocking key (label / LSH bucket).  One shuffle on the block key; the
    per-group kernel is a single normalized matmul."""

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).reset_index(drop=True)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        cos = mat @ mat.T
        ia, ib = np.triu_indices(len(g), k=1)
        keep = cos[ia, ib] > threshold
        return pd.DataFrame({
            "id_a": g[id_col].to_numpy()[ia[keep]],
            "id_b": g[id_col].to_numpy()[ib[keep]],
            "cosine": np.round(cos[ia, ib][keep], 6),
        })

    return ds.groupby(block_col).map_groups(group_pairs, batch_format="pandas")


def embedding_neardup_lsh(
    ds: rd.Dataset, id_col: str, vec_col: str,
    *, threshold: float = 0.35, n_planes: int = 6,
) -> rd.Dataset:
    """Embedding near-dup without a label column: block by random-hyperplane
    LSH bucket (cos-similar vectors land together with high probability),
    then the same within-block matmul.  Recall vs the label-blocked exact
    variant is measured in pytest; multi-probe (several plane sets) is the
    recall knob at scale."""
    from .ann import HyperplaneLSH, _as_matrix, _normalize

    def tag(batch: pa.Table) -> pa.Table:
        mat = _normalize(_as_matrix(batch.column(vec_col).to_pylist()))
        lsh = HyperplaneLSH(mat.shape[1], n_planes=n_planes)
        b = lsh.bucket(mat)
        return batch.append_column("lsh_bucket",
                                   pa.array(b.astype("int64"), pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return embedding_neardup_pairs(tagged, id_col, vec_col, "lsh_bucket",
                                   threshold=threshold)
