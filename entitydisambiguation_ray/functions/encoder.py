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
        # feature → row index into a doubling matrix cache: per-text
        # encoding is then ONE fancy-index + column sum (C-speed) instead
        # of a per-feature python loop of 1024-float adds, which profiled
        # at ~90% of encode time (the encoder is the hottest kernel of the
        # decisions and round-2 stages)
        self._feat_idx: dict[str, int] = {}
        self._mat = np.empty((256, dim), dtype=np.float32)
        self._n = 0
        # token → its feature-id array (token + char 2-/3-grams): hot
        # vocabulary repeats across texts, so the n-gram decomposition and
        # per-feature lookups happen once per token per worker
        self._tok_ids: dict[str, np.ndarray] = {}

    def _feature_id(self, feat: str) -> int:
        i = self._feat_idx.get(feat)
        if i is None:
            if self._n == len(self._mat):
                self._mat = np.vstack([self._mat, np.empty_like(self._mat)])
            seed = int.from_bytes(
                hashlib.sha256(feat.encode("utf-8")).digest()[:8], "big"
            )
            rng = np.random.Generator(np.random.PCG64(seed))
            self._mat[self._n] = rng.uniform(-1.0, 1.0, self.dim)
            i = self._n
            self._feat_idx[feat] = i
            self._n += 1
        return i

    def _feature_vec(self, feat: str) -> np.ndarray:
        """Kept for compatibility: the per-feature vector by value."""
        return self._mat[self._feature_id(feat)].copy()

    def _token_ids(self, tok: str) -> np.ndarray:
        a = self._tok_ids.get(tok)
        if a is None:
            feats = ["t:" + tok]
            if len(tok) >= 2:
                feats += ["2:" + tok[i:i + 2] for i in range(len(tok) - 1)]
            if len(tok) >= 3:
                feats += ["3:" + tok[i:i + 3] for i in range(len(tok) - 2)]
            a = np.fromiter((self._feature_id(f) for f in feats),
                            dtype=np.int64, count=len(feats))
            if len(self._tok_ids) > 500_000:  # bound worker memory
                self._tok_ids.clear()
            self._tok_ids[tok] = a
        return a

    def encode_one(self, text: str) -> np.ndarray:
        toks = text.split()
        if not toks:
            return np.zeros(self.dim, dtype=np.float32)
        # same feature order as _text_features (token-major), so the sum
        # is bit-identical to the uncached path
        parts = [self._token_ids(t) for t in toks]
        idxs = parts[0] if len(parts) == 1 else np.concatenate(parts)
        # pairwise-deterministic C sum (same inputs → same float result on
        # every worker; the exact rounding differs from the old sequential
        # loop, which only shifts embeddings by ~1 ulp — all consumers
        # derive signatures from TEXT, not vectors)
        acc = self._mat[idxs].sum(axis=0)
        if self.normalize:
            norm = float(np.linalg.norm(acc))
            if norm > 0:
                acc /= norm
        return acc.astype(np.float32, copy=False)

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


class NpTransformerEncoder:
    """A real-model-SHAPED encoder (mode ``encoder="np_transformer"``):
    a deterministically random-initialized single-layer transformer
    encoder implemented in numpy (~1.2 MB of weights), standing in for
    BGE-M3 so the REAL model path — weights loaded once per actor in
    ``__init__``, batched padded-and-masked inference per ``__call__``,
    an fp16 toggle, ``num_gpus`` plumbing — executes in CI instead of
    being import-gated (round-3 gap A1: no run had ever exercised a
    weight-bearing model through the actor-pool encode path; torch is
    absent in this sandbox, so the module is numpy, engine-authored).

    Architecture (vectorization.py:219-313 is the reference loader being
    shaped after): hashing tokenizer (sha256 → vocab bucket) → token +
    sinusoidal position embeddings → pre-LN multi-head self-attention →
    pre-LN FFN (GELU) → masked mean-pool → linear projection to ``dim``
    → L2 normalize (BGE-M3's dense output contract).

    Deterministic: weights come from a fixed-seed PCG64; same text →
    same vector on every process, node and retry.  ``use_fp16`` runs the
    matmuls in float16 (the BGE ``use_fp16=True`` deployment toggle);
    outputs are float32 either way."""

    VOCAB = 4096
    D_MODEL = 128
    N_HEADS = 4
    D_FF = 256
    MAX_LEN = 64

    def __init__(self, dim: int = 1024, use_fp16: bool = False,
                 seed: int = 1234):
        rng = np.random.Generator(np.random.PCG64(seed))
        dm, dff, v = self.D_MODEL, self.D_FF, self.VOCAB
        s = 1.0 / np.sqrt(dm)

        def w(*shape, scale=s):
            return (rng.standard_normal(shape) * scale).astype(np.float32)

        self.dim = dim
        self.emb = w(v, dm, scale=1.0)
        self.wq, self.wk, self.wv, self.wo = (w(dm, dm) for _ in range(4))
        self.w1, self.b1 = w(dm, dff), np.zeros(dff, dtype=np.float32)
        self.w2, self.b2 = w(dff, dm), np.zeros(dm, dtype=np.float32)
        self.ln1_g = np.ones(dm, dtype=np.float32)
        self.ln2_g = np.ones(dm, dtype=np.float32)
        self.proj = w(dm, dim, scale=1.0 / np.sqrt(dm))
        # sinusoidal positions (fixed, not learned)
        pos = np.arange(self.MAX_LEN)[:, None]
        i = np.arange(dm // 2)[None, :]
        ang = pos / np.power(10000.0, 2 * i / dm)
        pe = np.zeros((self.MAX_LEN, dm), dtype=np.float32)
        pe[:, 0::2], pe[:, 1::2] = np.sin(ang), np.cos(ang)
        self.pe = pe
        self.compute_dtype = np.float16 if use_fp16 else np.float32
        self._tok_cache: dict[str, int] = {}

    def _token_id(self, tok: str) -> int:
        t = self._tok_cache.get(tok)
        if t is None:
            t = int.from_bytes(
                hashlib.sha256(tok.encode("utf-8")).digest()[:4],
                "big") % self.VOCAB
            if len(self._tok_cache) > 500_000:
                self._tok_cache.clear()
            self._tok_cache[tok] = t
        return t

    @staticmethod
    def _ln(x: np.ndarray, g: np.ndarray) -> np.ndarray:
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-5) * g

    def encode(self, texts: list[str]) -> np.ndarray:
        """Batched padded inference → (n, dim) float32, L2-normalized."""
        if not texts:
            return np.empty((0, self.dim), dtype=np.float32)
        dt = self.compute_dtype
        toks = [[self._token_id(t) for t in s.split()[: self.MAX_LEN]]
                or [0] for s in texts]
        lens = np.array([len(t) for t in toks])
        L = int(lens.max())
        n = len(texts)
        ids = np.zeros((n, L), dtype=np.int64)
        mask = np.zeros((n, L), dtype=bool)
        for r, t in enumerate(toks):
            ids[r, : len(t)] = t
            mask[r, : len(t)] = True
        x = (self.emb[ids] + self.pe[:L]).astype(dt)  # (n, L, dm)
        # pre-LN multi-head self-attention with padding mask
        h = self._ln(x, self.ln1_g).astype(dt)
        dm, nh = self.D_MODEL, self.N_HEADS
        dh = dm // nh

        def heads(m):  # (n, L, dm) -> (n, nh, L, dh)
            return m.reshape(n, L, nh, dh).transpose(0, 2, 1, 3)

        q = heads(h @ self.wq.astype(dt))
        k = heads(h @ self.wk.astype(dt))
        vv = heads(h @ self.wv.astype(dt))
        att = (q @ k.transpose(0, 1, 3, 2)).astype(np.float32) / np.sqrt(dh)
        att = np.where(mask[:, None, None, :], att, -1e9)
        att = att - att.max(axis=-1, keepdims=True)
        att = np.exp(att)
        att /= att.sum(axis=-1, keepdims=True)
        ctx = (att.astype(dt) @ vv).transpose(0, 2, 1, 3).reshape(n, L, dm)
        x = x + ctx @ self.wo.astype(dt)
        # pre-LN FFN (GELU tanh approximation)
        h2 = self._ln(x, self.ln2_g).astype(dt)
        u = h2 @ self.w1.astype(dt) + self.b1.astype(dt)
        uf = u.astype(np.float32)
        g = 0.5 * uf * (1.0 + np.tanh(0.7978845608 * (uf + 0.044715 * uf**3)))
        x = x + g.astype(dt) @ self.w2.astype(dt) + self.b2.astype(dt)
        # masked mean pool → projection → L2 normalize
        xf = x.astype(np.float32)
        pooled = ((xf * mask[:, :, None]).sum(axis=1)
                  / lens[:, None].astype(np.float32))
        out = pooled @ self.proj
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return (out / norms).astype(np.float32)


def make_encoder(kind: str, dim: int = 1024):
    if kind == "hash":
        return HashEncoder(dim=dim)
    if kind == "np_transformer":
        return NpTransformerEncoder(dim=dim)
    if kind == "np_transformer_fp16":
        return NpTransformerEncoder(dim=dim, use_fp16=True)
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
