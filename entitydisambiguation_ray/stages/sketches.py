"""Mergeable sketches for approximate aggregation at scale.

HyperLogLog (Flajolet et al. 2007) — the canonical distinct-count sketch:
one register array per batch (the combiner), registers merged with
element-wise max in a tiny reduce — exactly the guide's "emit one serialized
sketch per batch and merge them in a second, tiny stage" shape.  Standard
error ≈ 1.04/√(2^p).

Deterministic hashing (salted crc32 pair → 64-bit), no process-salted
``hash()`` (SURVEY.md §1.2).
"""
from __future__ import annotations

import zlib

import numpy as np

_M64 = (1 << 64) - 1


def splitmix64(x: int) -> int:
    """SplitMix64 finalizer (Steele et al. 2014): full-avalanche 64-bit mix.

    Needed because two crc32s of the same bytes with different init values
    are AFFINELY related (they differ by a length-dependent constant —
    CRC is linear), so concatenating them yields only 32 bits of entropy
    with correlated halves; a finalizer over one crc32 gives uniformly
    distributed 64-bit patterns (collision entropy stays 32 bits, ample for
    sketch inputs)."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash64(value: str) -> int:
        return splitmix64(zlib.crc32(value.encode("utf-8")))

    def add_many(self, values) -> "HyperLogLog":
        for v in values:
            h = self._hash64(str(v))
            idx = h & (self.m - 1)
            w = h >> self.p
            # rank = leading-zero count of the remaining 64-p bits, + 1
            rank = (64 - self.p) - w.bit_length() + 1 if w else (64 - self.p) + 1
            if rank > self.registers[idx]:
                self.registers[idx] = rank
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:  # small-range correction
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)
        return float(est)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Distributed approximate COUNT(DISTINCT column): per-batch HLL
    sketches (combiner) merged on the driver — the merge payload is
    ``2^p`` bytes per batch regardless of data size, no shuffle at all."""
    import pyarrow as pa

    def sketch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p).add_many(batch.column(column).to_pylist())
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    acc = HyperLogLog(p)
    for s in parts["sketch"]:
        acc.merge(HyperLogLog.deserialize(s, p))
    return acc.estimate()


def approx_distinct_by(ds, group_col: str, column: str, p: int = 12):
    """Grouped approximate COUNT(DISTINCT column) per ``group_col`` value:
    one HLL per (batch, group) — the combiner — merged per group on the
    driver.  Driver payload is ``n_groups_per_batch × 2^p`` bytes per batch,
    independent of row count; suited to LOW-cardinality group keys (flags,
    languages, shards).  High-cardinality keys should use the exact
    shuffle-based ``pipelines.relational.count_distinct`` instead."""
    import pandas as pd
    import pyarrow as pa

    def sketch(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, column]).to_pandas()
        groups, blobs = [], []
        for gval, g in df.groupby(group_col, sort=False):
            groups.append(gval)
            blobs.append(HyperLogLog(p).add_many(g[column]).serialize())
        return pa.table({group_col: pa.array(groups),
                         "sketch": pa.array(blobs, pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    out = []
    for gval, g in parts.groupby(group_col, sort=True):
        acc = HyperLogLog(p)
        for s in g["sketch"]:
            acc.merge(HyperLogLog.deserialize(s, p))
        out.append({group_col: gval,
                    "approx_n": int(round(acc.estimate()))})
    return pd.DataFrame(out)


class BloomFilter:
    """Vectorized Bloom filter (Bloom 1970) for distributed semi-join
    prefiltering: per-batch filters are the combiner (fixed ``m`` bits
    each), merged with bitwise OR — no false negatives, tunable false
    positives (≈ (1 - e^{-k·n/m})^k).

    Hashing: two independent vectorized 64-bit row hashes (pandas
    siphash with distinct keys) combined by double hashing
    h_i = h1 + i·h2 (Kirsch & Mitzenmacher 2006)."""

    _KEY1 = "0123456789123456"
    _KEY2 = "fedcba9876543210"

    def __init__(self, m_bits: int = 1 << 20, k: int = 5):
        self.m = int(m_bits)
        self.k = int(k)
        self.words = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, values) -> np.ndarray:
        import pandas as pd

        arr = np.asarray(values, dtype=object)
        h1 = pd.util.hash_array(arr, hash_key=self._KEY1)
        h2 = pd.util.hash_array(arr, hash_key=self._KEY2) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m))

    def add_many(self, values) -> "BloomFilter":
        if len(values) == 0:
            return self
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.words, pos // 64,
                         np.uint64(1) << (pos % np.uint64(64)))
        return self

    def contains_many(self, values) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(values)
        bits = (self.words[pos // 64] >> (pos % np.uint64(64))) \
            & np.uint64(1)
        return (bits == 1).all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def serialize(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, m_bits: int = 1 << 20,
                    k: int = 5) -> "BloomFilter":
        b = cls(m_bits, k)
        b.words = np.frombuffer(data, dtype=np.uint64).copy()
        return b


class KLL:
    """KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016): a stack of
    compactor buffers where level ``i`` items carry weight ``2^i``; a full
    level sorts itself and promotes every other item (random parity) to the
    level above.  Mergeable (concatenate levels, re-compact), fixed memory
    ~O(k), normalized rank error ≈ 1.65/k w.h.p.

    The compaction parity comes from a seeded SplitMix64 counter, so a run
    over the same blocks is bit-reproducible (no process-global RNG); the
    tests assert rank tolerance, not byte equality, across batchings."""

    def __init__(self, k: int = 200, seed: int = 0x5EED):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self._ctr = int(seed)

    def _parity(self) -> int:
        self._ctr = (self._ctr + 1) & _M64
        return splitmix64(self._ctr) & 1

    def _capacity(self, level: int, depth: int) -> int:
        # top levels get the full k; lower (lighter) levels shrink by 2/3
        return max(2, int(np.ceil(self.k * (2.0 / 3.0) ** (depth - 1 - level))))

    def _compress(self) -> None:
        while True:
            depth = len(self.levels)
            for lv in range(depth):
                if len(self.levels[lv]) > self._capacity(lv, depth):
                    buf = np.sort(self.levels[lv])
                    keep = buf[self._parity()::2]
                    if lv + 1 == depth:
                        self.levels.append(np.empty(0, np.float64))
                    self.levels[lv + 1] = np.concatenate(
                        [self.levels[lv + 1], keep])
                    self.levels[lv] = np.empty(0, np.float64)
                    break
            else:
                return

    def add_many(self, values) -> "KLL":
        arr = np.asarray(values, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        self.levels[0] = np.concatenate([self.levels[0], arr])
        self._compress()
        return self

    def merge(self, other: "KLL") -> "KLL":
        for lv, buf in enumerate(other.levels):
            while lv >= len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[lv] = np.concatenate([self.levels[lv], buf])
        self._compress()
        return self

    def quantiles(self, qs) -> np.ndarray:
        items = np.concatenate(self.levels)
        if len(items) == 0:
            return np.full(len(qs), np.nan)
        weights = np.concatenate([
            np.full(len(buf), 1 << lv, np.float64)
            for lv, buf in enumerate(self.levels)])
        order = np.argsort(items, kind="mergesort")
        items, weights = items[order], weights[order]
        cum = np.cumsum(weights)
        # rank position of q = q * total_weight (continuous-rank convention)
        targets = np.asarray(qs, np.float64) * cum[-1]
        idx = np.minimum(np.searchsorted(cum, targets, side="left"),
                         len(items) - 1)
        return items[idx]

    def serialize(self) -> bytes:
        import pickle

        return pickle.dumps([b for b in self.levels], protocol=4)

    @classmethod
    def deserialize(cls, data: bytes, k: int = 200) -> "KLL":
        import pickle

        s = cls(k)
        s.levels = [np.asarray(b, np.float64) for b in pickle.loads(data)]
        return s


def approx_quantiles(ds, column: str, qs, k: int = 200):
    """Distributed approximate quantiles: one KLL sketch per batch (the
    combiner, ~k float64s regardless of batch size) merged on the driver —
    no shuffle, no sort of the data.  The exact counterpart (bit-identical
    to percentile_cont, one full sort) is ``relational.price_quantiles``;
    this is the scale path when a full sort of the column is the
    bottleneck.  Rank error ≈ 1.65/k."""
    import pyarrow as pa

    def sketch(batch: pa.Table) -> pa.Table:
        s = KLL(k).add_many(
            batch.column(column).to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([s.serialize()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    acc = KLL(k)
    for b in parts["sketch"]:
        acc.merge(KLL.deserialize(b, k))
    return acc.quantiles(qs)


class MisraGries:
    """Misra–Gries heavy-hitters summary (Misra & Gries 1982) with the
    PODS-2012 mergeable-summaries merge (Agarwal et al.): counters add,
    then every counter is decremented by the (k+1)-th largest and
    non-positives drop — the summed error bounds add, keeping the global
    guarantee ``true_count - n/(k+1) ≤ est ≤ true_count``.

    Per-batch build: exact vectorized value counts (a batch fits in heap
    by construction) truncated to a valid summary by the same
    (k+1)-th-count subtraction.  ``err`` carries the accumulated
    subtraction so estimates come with a certified ± bound."""

    def __init__(self, k: int = 50):
        self.k = int(k)
        self.counts: dict = {}
        self.err = 0  # upper bound on undercount of any key

    def add_counts(self, keys, counts) -> "MisraGries":
        for key, c in zip(keys, counts):
            self.counts[key] = self.counts.get(key, 0) + int(c)
        self._shrink()
        return self

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = np.sort(np.fromiter(self.counts.values(), np.int64))
        cut = int(vals[-(self.k + 1)])  # (k+1)-th largest
        self.counts = {key: c - cut for key, c in self.counts.items()
                       if c > cut}
        self.err += cut

    def merge(self, other: "MisraGries") -> "MisraGries":
        for key, c in other.counts.items():
            self.counts[key] = self.counts.get(key, 0) + c
        self.err += other.err
        self._shrink()
        return self

    def estimates(self):
        """[(key, est_count, err)] sorted by est desc then key — the true
        count of each key lies in [est, est + err]."""
        rows = sorted(self.counts.items(), key=lambda kv: (-kv[1], str(kv[0])))
        return [(key, int(c), int(self.err)) for key, c in rows]

    def serialize(self) -> bytes:
        import pickle

        return pickle.dumps((self.counts, self.err), protocol=4)

    @classmethod
    def deserialize(cls, data: bytes, k: int = 50) -> "MisraGries":
        import pickle

        mg = cls(k)
        mg.counts, mg.err = pickle.loads(data)
        return mg


def heavy_hitters_sketch(ds, column: str, k: int = 50):
    """Distributed approximate top-k values of ``column``: one Misra–Gries
    summary per batch (k counters — the combiner, serialized like the HLL /
    Bloom stages) merged on the driver.  The exact counterpart is
    ``relational.token_freq`` (Counter combiner → keyed shuffle sum); this
    is the scale path when even the distinct-key set of a partition
    outgrows its heap.  Returns a DataFrame (value, count, err) sorted by
    estimate desc — each value's TRUE count lies in [count, count+err]."""
    import pandas as pd
    import pyarrow as pa

    def sketch(batch: pa.Table) -> pa.Table:
        vc = batch.group_by(column).aggregate([([], "count_all")])
        mg = MisraGries(k).add_counts(
            vc.column(column).to_pylist(),
            vc.column("count_all").to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([mg.serialize()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    acc = MisraGries(k)
    for b in parts["sketch"]:
        acc.merge(MisraGries.deserialize(b, k))
    rows = acc.estimates()
    return pd.DataFrame(rows, columns=["value", "count", "err"])


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
    d×w counter matrix; est(x) = min_j M[j, h_j(x)] overestimates the
    true count by at most ε·N with probability ≥ 1-δ, where ε = e/w and
    δ = e^-d.  Counter-wise ADDITION merges sketches exactly (the
    combiner property the per-batch stage needs).  Row hashes are d
    independent splitmix64 streams over crc32 (the HLL discipline —
    never concatenate two affinely-related crc32s)."""

    def __init__(self, w: int = 2048, d: int = 4):
        self.w = w
        self.d = d
        self.m = np.zeros((d, w), dtype=np.int64)

    def _cols(self, value: str) -> np.ndarray:
        h = zlib.crc32(value.encode("utf-8"))
        return np.array([splitmix64(h ^ (j * 0x9E3779B97F4A7C15))
                         % self.w for j in range(self.d)], dtype=np.int64)

    def add_counts(self, values, counts) -> "CountMin":
        for v, c in zip(values, counts):
            self.m[np.arange(self.d), self._cols(str(v))] += int(c)
        return self

    def estimate(self, value: str) -> int:
        return int(self.m[np.arange(self.d), self._cols(str(value))].min())

    def merge(self, other: "CountMin") -> "CountMin":
        self.m += other.m
        return self

    def serialize(self) -> bytes:
        return self.m.tobytes()

    @classmethod
    def deserialize(cls, b: bytes, w: int = 2048, d: int = 4) -> "CountMin":
        s = cls(w, d)
        s.m = np.frombuffer(b, dtype=np.int64).reshape(d, w).copy()
        return s


def cm_token_freq(ds, text_col: str = "text", w: int = 2048, d: int = 4,
                  queries: list[str] | None = None):
    """Distributed Count-Min frequency estimates for ``queries`` tokens
    over a text column: one CM table per batch (the additive combiner,
    serialized like the HLL / Bloom / MG stages), summed on the driver
    (d×w ints per batch — fixed-size payloads regardless of corpus).
    The exact counterpart is ``relational.token_freq``; this is the
    scale path when per-partition distinct-token sets outgrow heaps.
    Returns (token, est, n_total) — est ≥ true count, and
    est ≤ true + (e/w)·N with prob ≥ 1-e^-d."""
    import re

    import pandas as pd
    import pyarrow as pa

    tok_re = re.compile(r"\S+")

    def sketch(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(tok_re.findall(t))
        cm = CountMin(w, d).add_counts(list(c.keys()), list(c.values()))
        return pa.table({
            "sketch": pa.array([cm.serialize()], pa.binary()),
            "n": pa.array([int(sum(c.values()))], pa.int64())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    acc = CountMin(w, d)
    for b in parts["sketch"]:
        acc.merge(CountMin.deserialize(b, w, d))
    n_total = int(parts["n"].sum())
    qs = queries or []
    return pd.DataFrame({
        "token": qs,
        "est": [acc.estimate(q) for q in qs],
        "n_total": [n_total] * len(qs)})
