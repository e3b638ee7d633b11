"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shapes (all expressed as Ray Data primitives, per the guide's
shingle→minhash→band→bucket-groupby pattern):

- **exact**: content-hash column in a vectorized ``map_batches`` →
  ``groupby(hash).map_groups(first)`` (deterministic representative =
  smallest id).
- **minhash-lsh** (Broder 1997, "On the resemblance and containment of
  documents"; banding per Leskovec et al., MMDS ch.3): per-batch shingling +
  k minhashes → explode to (band_id, band_hash, doc_id) rows →
  ``groupby(band)`` → candidate pairs → exact-Jaccard verification →
  near-dup pairs.  The band groupby is the only shuffle and moves
  k/band-width small rows per doc, never the text.
- **simhash** (Charikar 2002, "Similarity estimation techniques from
  rounding algorithms"): 64-bit simhash per doc; near-dup candidates =
  equal value in any of 4 16-bit bands (Hamming ≤ 3 guarantee by
  pigeonhole); verified by Hamming distance.
- **ngram-jaccard**: the verification kernel, exposed standalone.
- **embedding near-dup**: cosine > τ pairs within a blocking key (label /
  LSH bucket), numpy matmul per group.

All per-doc hashing uses stable seeded hashes (salted crc32 pairs for
shingles, sha1 for band keys) — no process-salted ``hash()`` anywhere
(SURVEY.md §1.2).
"""
from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------- shingles

def char_shingles(text: str, k: int = 5) -> set[bytes]:
    b = text.encode("utf-8")
    if len(b) <= k:
        return {b}
    return {b[i : i + k] for i in range(len(b) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set[tuple[str, ...]]:
    toks = text.split()
    if len(toks) <= n:
        return {tuple(toks)}
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    return jaccard(word_ngrams(text_a, n), word_ngrams(text_b, n))


# ---------------------------------------------------------------- minhash

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """k independent universal-hash minhashes over byte shingles.

    Parameters derived from a fixed seed → identical on every worker."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.Generator(np.random.PCG64(seed))
        # a < 2^29 and 32-bit base hashes keep a*x + b < 2^62: the product
        # stays inside uint64, so (a*x + b) mod p is computed EXACTLY and
        # the family is genuinely universal over x < 2^32 (a full-width a
        # would silently wrap mod 2^64 before the mod-p reduction and void
        # the LSH collision-probability math)
        self.a = rng.integers(1, 1 << 29, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: set[bytes]) -> np.ndarray:
        if not shingles:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # 32-bit crc base hash (C-speed; collision rate irrelevant at
        # minhash's own estimation error)
        base = np.array([zlib.crc32(s) for s in shingles], dtype=np.uint64)
        # (n_shingles, num_perm) universal hashing mod Mersenne prime
        prods = (base[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return prods.min(axis=0)


def minhash_batch(batch: pa.Table, *, id_col: str, text_col: str,
                  hasher: MinHasher, bands: int, rows_per_band: int,
                  shingle_k: int = 5) -> pa.Table:
    """doc batch → exploded (band_id, band_hash, doc_id) rows."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_ids, out_band, out_hash = [], [], []
    for did, text in zip(ids, texts):
        sig = hasher.signature(char_shingles(text or "", shingle_k))
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = hashlib.sha1(chunk.tobytes() + bytes([b])).hexdigest()[:16]
            out_ids.append(did)
            out_band.append(b)
            out_hash.append(h)
    return pa.table({
        "doc_id": pa.array(out_ids),
        "band_id": pa.array(out_band, type=pa.int32()),
        "band_hash": pa.array(out_hash, type=pa.string()),
    })


# ---------------------------------------------------------------- simhash

def simhash64(text: str, k: int = 5) -> int:
    """64-bit charwise simhash (salted-crc32 feature hashing, unweighted).

    splitmix64 over crc32: uniform independent bit patterns (two salted
    crc32s of the same bytes are affinely related — see
    stages/sketches.splitmix64).  Vectorized over ALL shingles at once
    (one (n_shingles, 64) unpack + column sum; the former per-shingle
    numpy loop paid kernel-launch overhead ~500× per doc)."""
    shingles = char_shingles(text, k)
    # splitmix64 vectorized over the crc array (same arithmetic mod 2^64)
    x = np.fromiter((zlib.crc32(s) for s in shingles), dtype=np.uint64,
                    count=len(shingles))
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    shifts = np.arange(64, dtype=np.uint64)
    bits = (x[:, None] >> shifts[None, :]) & np.uint64(1)  # (n, 64)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table, *, id_col: str, text_col: str) -> pa.Table:
    ids = batch.column(id_col)
    texts = batch.column(text_col).to_pylist()
    sh = [simhash64(t or "") for t in texts]
    bands = {f"sh_band{b}": [(h >> (16 * b)) & 0xFFFF for h in sh]
             for b in range(4)}
    cols = {"doc_id": ids, "simhash": pa.array(sh, type=pa.uint64())}
    for k, v in bands.items():
        cols[k] = pa.array(v, type=pa.int32())
    return pa.table(cols)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------- winnowing

# Rolling-hash document fingerprinting per Schleimer, Wilkerson & Aiken,
# "Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD 2003):
# k-gram rolling hashes, a w-wide sliding window, keep the RIGHTMOST
# minimal hash per window.  Default k=12/w=8: the noise threshold k must
# exceed common idiom length (5-grams like " the " match across ALL
# English documents), per the paper's guidance that k be "long enough
# that common idioms are not matches".  Guarantee: any shared substring of length
# >= w + k - 1 between two documents yields at least one shared
# fingerprint.  Unlike the whole-document md5 (`fingerprint_batch`) this
# is LOCAL — partial overlap (a copied paragraph inside otherwise
# different pages) is still detected.

_WINNOW_BASE = np.uint64(1_000_003)


def _rolling_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """Polynomial rolling hashes of every k-byte window, vectorized: k
    shifted multiply-adds on uint64 (mod 2^64 by wraparound) instead of a
    per-position Python loop."""
    n = len(data) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):  # k is small (default 12); each step is vectorized
        h = h * _WINNOW_BASE + data[j:j + n].astype(np.uint64)
    return h


def winnow(text: str, k: int = 12, w: int = 8) -> np.ndarray:
    """Sorted unique fingerprint hashes of one document (uint64)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)))
    h = _rolling_hashes(data, k)
    if len(h) <= w:
        return np.unique(h.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost minimum per window (robust winnowing): argmin on the
    # reversed window axis finds the LAST minimal element
    rev_arg = np.argmin(win[:, ::-1], axis=1)
    pos = np.arange(len(win)) + (w - 1 - rev_arg)
    return np.unique(h[np.unique(pos)])


def winnow_batch(batch: pa.Table, *, id_col: str, text_col: str,
                 k: int = 12, w: int = 8) -> pa.Table:
    """Explode each doc into (id, fp) rows — one row per selected
    fingerprint, ready for a groupby(fp) candidate-pair stage."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_ids, out_fps = [], []
    for i, t in zip(ids, texts):
        fps = winnow(t or "", k=k, w=w)
        out_ids.extend([i] * len(fps))
        out_fps.append(fps)
    fp_arr = (np.concatenate(out_fps) if out_fps
              else np.array([], dtype=np.uint64))
    return pa.table({
        id_col: pa.array(out_ids, batch.schema.field(id_col).type),
        "fp": pa.array(fp_arr.astype(np.int64), pa.int64()),
    })
