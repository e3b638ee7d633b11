"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

Decode kernels, by honesty tier (rounds 4-5 close the "all decoders are
synthetic" gap for the formats that need NO external codec):

- **REAL, dependency-free**: binary PPM (``P6`` — the public Netpbm
  format, hand-parsed ~30 lines), PCM WAV (stdlib ``wave``), and
  UNCOMPRESSED AVI video (RIFF ``movi``/``00db`` DIB frames, hand-parsed
  from the public Microsoft AVI spec) decode to actual pixel / sample /
  frame arrays; the synthetic media corpus emits real containers of all
  three so every decode path executes in CI on genuine bytes.
- **gated**: JPEG/PNG via PIL, compressed video via PyAV — import-probed
  per actor, absent in this container.
- **fake fallback**: unknown formats get the clearly-marked deterministic
  byte-stretch decoder, or ``NotImplementedError`` in ``strict`` mode.
  ``strict`` mode DOES decode PPM/WAV/uncompressed-AVI (no library
  needed).

Scale notes: binary payloads are wide rows — stages use a SMALL
``batch_size`` (default 32) so batch × concurrency fits worker heaps, and
payload columns are dropped as soon as features are extracted (project
early, SURVEY.md §7.4).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


# ------------------------------------------------------------ real codecs

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6), the Netpbm interchange format."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8.  Handles Netpbm whitespace and
    ``#`` comments in the header; maxval ≤ 255 only (the 8-bit case)."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            nl = payload.find(b"\n", pos)
            pos = nl + 1 if nl >= 0 else len(payload)
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    raster = payload[pos:pos + need]
    if len(raster) < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 → PCM WAV bytes (stdlib ``wave``)."""
    import io
    import wave

    s = np.asarray(samples, dtype="<i2")
    ch = 1 if s.ndim == 1 else s.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → ((n_frames, channels) int16, sample_rate) — stdlib-only."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        rate = f.getframerate()
        ch = f.getnchannels()
        raw = f.readframes(f.getnframes())
    arr = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
    return arr, rate


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) RGB uint8 → UNCOMPRESSED AVI bytes — the public RIFF
    'AVI ' container (Microsoft AVI spec / OpenDML): hdrl (avih + one
    'vids' strl with a BI_RGB BITMAPINFOHEADER) + movi with one ``00db``
    DIB chunk per frame (bottom-up rows, BGR order, rows padded to 4
    bytes).  Dependency-free — the video sibling of encode_ppm."""
    import struct

    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    size_image = stride * h
    usec = int(round(1_000_000 / fps))

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        out = fourcc + struct.pack("<I", len(payload)) + payload
        return out + (b"\x00" if len(payload) % 2 else b"")

    def dib(frame: np.ndarray) -> bytes:
        rows = frame[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
        if pad:
            rows = np.concatenate(
                [rows, np.zeros((h, pad), np.uint8)], axis=1)
        return rows.tobytes()

    avih = struct.pack("<14I", usec, size_image * fps, 0, 0, n, 0, 1,
                       size_image, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHH8I4h", 0, 0, 0, 0,
                                            1, fps, 0, n, size_image, 0,
                                            0, 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, size_image,
                       0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)
                 + chunk(b"LIST", b"strl" + chunk(b"strh", strh)
                         + chunk(b"strf", strf)))
    movi = chunk(b"LIST", b"movi" + b"".join(
        chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_riff_chunks(buf: bytes, pos: int, end: int):
    import struct

    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _parse_avi(payload: bytes):
    """AVI bytes → (width, height, fps, [(frame_chunk_offset, size), ...]).
    Raises ValueError for non-AVI or compressed (non-BI_RGB) content."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    w = h = None
    usec = 0
    compression = 0
    frames: list[tuple[int, int]] = []
    for fourcc, start, size in _iter_riff_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST":
            continue
        ltype = payload[start:start + 4]
        if ltype == b"hdrl":
            for fc2, s2, sz2 in _iter_riff_chunks(
                    payload, start + 4, start + size):
                if fc2 == b"avih" and sz2 >= 56:
                    vals = struct.unpack("<14I", payload[s2:s2 + 56])
                    usec, w, h = vals[0], vals[8], vals[9]
                elif fc2 == b"LIST" \
                        and payload[s2:s2 + 4] == b"strl":
                    for fc3, s3, sz3 in _iter_riff_chunks(
                            payload, s2 + 4, s2 + sz2):
                        if fc3 == b"strf" and sz3 >= 40:
                            compression = struct.unpack(
                                "<I", payload[s3 + 16:s3 + 20])[0]
        elif ltype == b"movi":
            for fc2, s2, sz2 in _iter_riff_chunks(
                    payload, start + 4, start + size):
                if fc2[2:4] in (b"db", b"dc"):
                    frames.append((s2, sz2))
    if w is None or not frames:
        raise ValueError("AVI without hdrl/movi frames")
    if compression != 0:
        raise ValueError("compressed AVI (non-BI_RGB) needs PyAV")
    fps = round(1_000_000 / usec) if usec else 0
    return int(w), int(h), fps, frames


def _decode_dib(payload: bytes, off: int, size: int, w: int,
                h: int) -> np.ndarray:
    """One BI_RGB DIB chunk → (h, w, 3) RGB uint8 (undo bottom-up rows,
    BGR order, 4-byte row padding)."""
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1]  # bottom-up → top-down, BGR → RGB


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Uncompressed AVI → ((n, h, w, 3) RGB uint8 frames, fps) —
    dependency-free; the exact inverse of ``encode_avi`` (round-trip
    pytest)."""
    w, h, fps, chunks = _parse_avi(payload)
    frames = np.stack([_decode_dib(payload, off, size, w, h)
                       for off, size in chunks])
    return frames, fps

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
    """Deterministic synthetic media rows.  ALL THREE kinds carry REAL
    containers of the codec-free formats (binary PPM images, PCM WAV
    audio, uncompressed-AVI video), so every decode kernel runs on
    genuine bytes in CI."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/x-portable-pixmap", "audio": "audio/wav",
             "video": "video/x-msvideo"}
    for i in indices:
        i = int(i)
        kind = kinds[i % 3]
        rng = np.random.Generator(np.random.PCG64((1 << 20) ^ i))
        if kind == "image":
            h = int(rng.integers(12, 48))
            w = int(rng.integers(12, 48))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            payload = encode_ppm(img)
            width, height, dur = w, h, 0.0
        elif kind == "audio":
            rate = 16000
            n = int(rng.integers(800, 8000))
            samples = rng.integers(-32768, 32768, n).astype(np.int16)
            payload = encode_wav(samples, rate)
            width = height = 0
            dur = n / rate
        else:
            fps = 10
            nf = int(rng.integers(6, 14))
            height = int(rng.integers(16, 33))
            # odd widths exercise the DIB 4-byte row padding
            width = int(rng.integers(16, 33))
            frames = rng.integers(0, 256, (nf, height, width, 3),
                                  dtype=np.uint8)
            payload = encode_avi(frames, fps=fps)
            dur = nf / fps
        rows["media_id"].append(f"m{i:08d}")
        rows["kind"].append(kind)
        rows["mime"].append(mimes[kind])
        rows["payload"].append(payload)
        rows["width"].append(width)
        rows["height"].append(height)
        rows["duration_s"].append(float(dur))
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
    load.  Decode dispatch per payload: binary PPM decodes for REAL with
    no dependency; other formats go to PIL when importable; otherwise the
    deterministic fake decoder — or, with ``strict=True``,
    ``NotImplementedError`` at decode time (PPM still decodes in strict
    mode; only genuinely undecodable payloads refuse)."""

    def __init__(self, strict: bool = False, resize_to: int = 16):
        self.resize_to = resize_to
        self.strict = strict
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # type: ignore

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if payload[:2] == b"P6":
            return decode_ppm(payload)  # real, dependency-free
        if self._pil is not None:  # pragma: no cover
            import io

            return np.asarray(self._pil.open(io.BytesIO(payload)).convert("RGB"))
        if self.strict:
            raise NotImplementedError(
                "image decode for this format requires PIL, which is not "
                "available in this environment; PPM (P6) decodes natively, "
                "or run with strict=False for the deterministic fake "
                "decoder")
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


class AudioFeatureStage:
    """Actor-pool stage: REAL audio features from PCM WAV payloads
    (stdlib decode, numpy DSP — nothing stubbed on this path): duration,
    RMS level, zero-crossing rate, and an 8-band FFT energy-fraction
    vector (the cheap screening features audio corpus filters run).
    Non-WAV payloads raise in ``strict`` mode, else emit null features."""

    N_BANDS = 8

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _features(self, payload: bytes):
        arr, rate = decode_wav(payload)
        x = arr.astype(np.float64).mean(axis=1)  # downmix
        n = len(x)
        dur = n / rate
        rms = float(np.sqrt((x ** 2).mean())) if n else 0.0
        zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) \
            if n > 1 else 0.0
        spec = np.abs(np.fft.rfft(x)) ** 2
        edges = np.linspace(0, len(spec), self.N_BANDS + 1, dtype=int)
        bands = np.array([spec[a:b].sum() for a, b in
                          zip(edges[:-1], edges[1:])])
        total = bands.sum()
        frac = (bands / total if total > 0
                else np.zeros(self.N_BANDS))
        return dur, rms, zcr, frac.astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, durs, rmss, zcrs, bands = [], [], [], [], []
        for mid, p in zip(batch.column("media_id").to_pylist(),
                          batch.column("payload").to_pylist()):
            if p[:4] != b"RIFF":
                if self.strict:
                    raise NotImplementedError(
                        "audio decode beyond PCM WAV requires an audio "
                        "library not available here")
                ids.append(mid)
                durs.append(None)
                rmss.append(None)
                zcrs.append(None)
                bands.append(np.zeros(self.N_BANDS, dtype=np.float32))
                continue
            dur, rms, zcr, frac = self._features(p)
            ids.append(mid)
            durs.append(dur)
            rmss.append(rms)
            zcrs.append(zcr)
            bands.append(frac)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "duration_s": pa.array(durs, pa.float64()),
            "rms": pa.array(rmss, pa.float64()),
            "zero_crossing_rate": pa.array(zcrs, pa.float64()),
            "band_energy": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(bands)
                         if bands else np.empty(0, np.float32),
                         pa.float32()),
                self.N_BANDS),
        })


class FrameSampleStage:
    """Actor-pool stage: deterministic frame/segment sampling for
    audio/video.

    Uncompressed-AVI video decodes for REAL (``_parse_avi`` +
    ``_decode_dib``, dependency-free): ``n_samples`` frames are picked
    evenly across the movi chunk list, each DECODED to pixels, and the
    digest is over the decoded RGB bytes — so it is invariant to
    container-level byte layout (round-trip pytest).  Other payloads
    (WAV audio segments, unknown containers) keep deterministic
    byte-window sampling of the raw payload; compressed video genuinely
    needs PyAV — import-probed, and ``strict`` mode refuses non-AVI
    video at decode time rather than at init (AVI needs no library)."""

    def __init__(self, n_samples: int = 4, window: int = 256,
                 strict: bool = False):
        self.n = n_samples
        self.window = window
        self.strict = strict
        try:  # pragma: no cover - av/torchaudio absent in this container
            import av  # type: ignore  # noqa: F401

            self._av = True
        except ImportError:
            self._av = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, frame_idx, offsets, digests = [], [], [], [], []
        payloads = batch.column("payload").to_pylist()
        mids = batch.column("media_id").to_pylist()
        kind_l = batch.column("kind").to_pylist()
        for mid, kind, p in zip(mids, kind_l, payloads):
            is_avi = p[:4] == b"RIFF" and p[8:12] == b"AVI "
            if is_avi:
                try:
                    w, h, _fps, chunks = _parse_avi(bytes(p))
                except ValueError:
                    if self.strict:
                        raise NotImplementedError(
                            "compressed/era-malformed AVI needs PyAV, "
                            "not available here")
                    is_avi = False
            if is_avi:
                nf = len(chunks)
                for f in range(self.n):
                    ci = (f * nf) // self.n
                    off, size = chunks[ci]
                    frame = _decode_dib(bytes(p), off, size, w, h)
                    ids.append(mid)
                    kinds.append(kind)
                    frame_idx.append(f)
                    offsets.append(off)
                    digests.append(
                        hashlib.sha1(frame.tobytes()).hexdigest()[:16])
                continue
            if kind == "video" and self.strict and not self._av:
                raise NotImplementedError(
                    "video frame decode beyond uncompressed AVI requires "
                    "PyAV, not available here; strict=False uses "
                    "deterministic byte-window sampling")
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
