"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (PIL / torchaudio / pyav are not
in this container): each stage tries the real library import in
``__init__`` and otherwise uses a clearly-marked deterministic fake decoder
(or raises ``NotImplementedError`` in ``strict`` mode).  Everything around
the stub — the Arrow schema, the binary-payload block sizing, the actor
signature, batched processing, the partitioned output layout — is real and
tested, so swapping in a real decoder is a one-function change.

Scale notes: binary payloads are wide rows — stages use a SMALL
``batch_size`` (default 32) so batch × concurrency fits worker heaps, and
payload columns are dropped as soon as features are extracted (project
early, SURVEY.md §7.4).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),          # image | audio | video
    ("mime", pa.string()),
    ("payload", pa.binary()),
    ("width", pa.int32()),          # images/video
    ("height", pa.int32()),
    ("duration_s", pa.float32()),   # audio/video
])

FEATURE_DIM = 64

MEDIA_BATCH_SIZE = 32  # binary payloads: keep batches small


def synth_media_batch(indices) -> pa.Table:
    """Deterministic synthetic media rows (payload = seeded pseudo-bytes
    with a kind-specific magic header, like a real container format)."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}
    magic = {"image": b"IMGF", "audio": b"AUDF", "video": b"VIDF"}
    for i in indices:
        i = int(i)
        kind = kinds[i % 3]
        rng = np.random.Generator(np.random.PCG64((1 << 20) ^ i))
        size = int(rng.integers(2_000, 20_000))
        payload = magic[kind] + rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        rows["media_id"].append(f"m{i:08d}")
        rows["kind"].append(kind)
        rows["mime"].append(mimes[kind])
        rows["payload"].append(payload)
        rows["width"].append(int(rng.integers(64, 1024)) if kind != "audio" else 0)
        rows["height"].append(int(rng.integers(64, 1024)) if kind != "audio" else 0)
        rows["duration_s"].append(float(rng.uniform(1, 600)) if kind != "image" else 0.0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: payload bytes → (h, w, 3) uint8.
    STUB for ``PIL.Image.open`` — marked per the environment constraint."""
    h, w = min(height, 64) or 8, min(width, 64) or 8
    need = h * w * 3
    buf = (payload * (need // max(1, len(payload)) + 1))[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


class ImageFeatureStage:
    """Actor-pool stage: decode → resize → feature-extract for images.

    ``__init__`` runs once per actor: real-decoder import probe + any model
    load.  ``strict=True`` raises NotImplementedError instead of using the
    fake decoder (production posture when the lib is genuinely required)."""

    def __init__(self, strict: bool = False, resize_to: int = 16):
        self.resize_to = resize_to
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # type: ignore

            self._pil = Image
        except ImportError:
            self._pil = None
            if strict:
                raise NotImplementedError(
                    "image decode requires PIL, which is not available in "
                    "this environment; run with strict=False to use the "
                    "deterministic fake decoder")

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self._pil is not None:  # pragma: no cover
            import io

            return np.asarray(self._pil.open(io.BytesIO(payload)).convert("RGB"))
        return _fake_decode_image(payload, width, height)

    def _resize(self, img: np.ndarray) -> np.ndarray:
        """Nearest-neighbor resize (real numpy kernel, not stubbed)."""
        t = self.resize_to
        ys = (np.arange(t) * img.shape[0] // t).clip(0, img.shape[0] - 1)
        xs = (np.arange(t) * img.shape[1] // t).clip(0, img.shape[1] - 1)
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, means = [], []
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        for p, w, h in zip(payloads, widths, heights):
            img = self._resize(self._decode(p, w, h)).astype(np.float32)
            gray = img.mean(axis=2)
            vec = np.resize(gray, FEATURE_DIM) / 255.0
            feats.append(vec.astype(np.float32))
            means.append(float(img.mean()))
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(feats), pa.float32()), FEATURE_DIM),
            "mean_intensity": pa.array(means, pa.float64()),
        })


class FrameSampleStage:
    """Actor-pool stage: deterministic frame/segment sampling for
    audio/video — picks ``n_samples`` byte-window 'frames' at evenly spaced
    offsets (the real implementation would seek the container; the offsets,
    schema and batching are the real plumbing)."""

    def __init__(self, n_samples: int = 4, window: int = 256,
                 strict: bool = False):
        self.n = n_samples
        self.window = window
        try:  # pragma: no cover - av/torchaudio absent in this container
            import av  # type: ignore  # noqa: F401

            self._real = True
        except ImportError:
            self._real = False
            if strict:
                raise NotImplementedError(
                    "frame sampling requires PyAV, not available here; "
                    "strict=False uses deterministic byte-window sampling")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, frame_idx, offsets, digests = [], [], [], [], []
        payloads = batch.column("payload").to_pylist()
        mids = batch.column("media_id").to_pylist()
        kind_l = batch.column("kind").to_pylist()
        for mid, kind, p in zip(mids, kind_l, payloads):
            n_body = max(1, len(p) - 4)
            for f in range(self.n):
                off = 4 + (f * n_body) // self.n
                win = p[off : off + self.window]
                ids.append(mid)
                kinds.append(kind)
                frame_idx.append(f)
                offsets.append(off)
                digests.append(hashlib.sha1(win).hexdigest()[:16])
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "byte_offset": pa.array(offsets, pa.int64()),
            "frame_digest": pa.array(digests, pa.string()),
        })


def byte_entropy_batch(batch: pa.Table) -> pa.Table:
    """Real (non-stubbed) payload statistic: Shannon byte entropy +
    payload size — the cheap screening features a media pipeline runs
    before any decode."""
    ents, sizes = [], []
    for p in batch.column("payload").to_pylist():
        arr = np.frombuffer(p, dtype=np.uint8)
        counts = np.bincount(arr, minlength=256)
        probs = counts[counts > 0] / len(arr)
        ents.append(float(-(probs * np.log2(probs)).sum()))
        sizes.append(len(p))
    out = batch.drop_columns(["payload"])  # project early: drop wide bytes
    out = out.append_column("payload_bytes", pa.array(sizes, pa.int64()))
    return out.append_column("byte_entropy", pa.array(ents, pa.float64()))
