"""Pluggable text encoders.

The reference's embedding stage is BGE-M3 via FlagEmbedding with a fallback
chain ending in per-text pseudo-random vectors seeded by ``hash(text)``
(vectorization.py:315-334) — process-salted, hence non-reproducible across
workers, and useless as a similarity signal (distinct texts are orthogonal).

Following SURVEY.md M13 the engine's default deterministic encoder
(``encoder="hash"``) is a **feature-hashed n-gram embedding**: each text is
decomposed into whitespace tokens plus per-token character 2-/3-grams; every
feature is mapped to a fixed pseudo-random vector seeded by
``sha256(feature)``; the text vector is the L2-normalized sum.  Properties:

- fully deterministic across processes / nodes / retries (cluster-stable);
- L2-normalized like BGE-M3's dense output, so inner product == cosine and
  the reference's score space ([0, 1]-ish bge_score, thresholds 0.72/0.60)
  is preserved;
- behaves like a real embedding: identical token multisets → cos 1.0,
  small edits → high cosine, unrelated texts → ~0 — so the retrieval +
  rerank + threshold cascade is exercised meaningfully in CI without
  model weights.

``encoder="bge"`` is gated behind an import-try for FlagEmbedding (absent in
this sandbox, mirroring the reference's own degradation design
vectorization.py:219-313).
"""
from __future__ import annotations

import hashlib

import numpy as np


def _text_features(text: str) -> list[str]:
    feats: list[str] = []
    for tok in text.split():
        feats.append("t:" + tok)
        if len(tok) >= 2:
            for i in range(len(tok) - 1):
                feats.append("2:" + tok[i : i + 2])
        if len(tok) >= 3:
            for i in range(len(tok) - 2):
                feats.append("3:" + tok[i : i + 3])
    return feats


class HashEncoder:
    """Deterministic, batched, cache-warmed encoder (mode ``encoder="hash"``).

    Intended to run inside an actor pool: the per-feature vector cache lives
    for the actor's lifetime and is shared across batches, so hot vocabulary
    features are generated once per worker.
    """

    def __init__(self, dim: int = 1024, normalize: bool = True):
        self.dim = dim
        self.normalize = normalize
        self._feature_cache: dict[str, np.ndarray] = {}

    def _feature_vec(self, feat: str) -> np.ndarray:
        vec = self._feature_cache.get(feat)
        if vec is None:
            seed = int.from_bytes(
                hashlib.sha256(feat.encode("utf-8")).digest()[:8], "big"
            )
            rng = np.random.Generator(np.random.PCG64(seed))
            vec = rng.uniform(-1.0, 1.0, self.dim).astype(np.float32)
            self._feature_cache[feat] = vec
        return vec

    def encode_one(self, text: str) -> np.ndarray:
        feats = _text_features(text)
        if not feats:
            return np.zeros(self.dim, dtype=np.float32)
        acc = np.zeros(self.dim, dtype=np.float32)
        for f in feats:
            acc += self._feature_vec(f)
        if self.normalize:
            norm = float(np.linalg.norm(acc))
            if norm > 0:
                acc /= norm
        return acc

    def encode(self, texts: list[str]) -> np.ndarray:
        """Batched encode → (n, dim) float32.  Deduplicates repeated texts
        inside the batch (hot mentions repeat heavily)."""
        if not texts:
            return np.empty((0, self.dim), dtype=np.float32)
        uniq: dict[str, int] = {}
        order = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            j = uniq.get(t)
            if j is None:
                j = len(uniq)
                uniq[t] = j
            order[i] = j
        mat = np.empty((len(uniq), self.dim), dtype=np.float32)
        for t, j in uniq.items():
            mat[j] = self.encode_one(t)
        return mat[order]


def make_encoder(kind: str, dim: int = 1024):
    if kind == "hash":
        return HashEncoder(dim=dim)
    if kind == "bge":  # pragma: no cover - heavyweight, absent in sandbox
        try:
            from FlagEmbedding import BGEM3FlagModel  # type: ignore

            class _BGE:
                def __init__(self):
                    self.model = BGEM3FlagModel("BAAI/bge-m3", use_fp16=False)
                    self.dim = dim

                def encode(self, texts: list[str]) -> np.ndarray:
                    out = self.model.encode(texts)["dense_vecs"]
                    return np.asarray(out, dtype=np.float32)

            return _BGE()
        except ImportError as exc:
            raise RuntimeError(
                "encoder='bge' requires FlagEmbedding (not installed); "
                "use encoder='hash'"
            ) from exc
    raise ValueError(f"unknown encoder kind: {kind}")
