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
from .relational import _round_half_away

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


# Hot-bucket cap: an LSH band bucket with b members emits O(b²) candidate
# pairs — a boilerplate-heavy crawl segment (thousands of near-identical
# pages sharing one band hash) would go quadratic in both CPU and shuffle
# volume.  Buckets beyond this bound are dropped as pair generators with the
# dropped pair mass counted and logged (the engine's no-silent-caps
# discipline, kg.py round-2 pattern).  The recall cost is explicit and
# small: docs in a >cap bucket are near-identical by construction and almost
# always share several OTHER band buckets below the cap.
LSH_BUCKET_CAP = 2048


def _emit_bucket_pairs(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs (a < b) of a sorted unique id array, vectorized."""
    ia, ib = np.triu_indices(len(ids), k=1)
    return ids[ia], ids[ib]


def _runs_all_pairs(codes: np.ndarray, cap: int
                    ) -> tuple[np.ndarray, np.ndarray, int, int]:
    """All within-run ordered row-index pairs (i < j) over EVERY equal-code
    run at once — rows must be pre-sorted by (code, id) with ids unique
    within a run.  Runs longer than ``cap`` are skipped with their pair
    mass counted.  Returns (a_idx, b_idx, dropped_pairs, dropped_runs).

    This replaces the per-bucket ``for _, g in df.groupby(...)`` loops in
    the LSH pair generators: with tens of thousands of micro-buckets per
    partition the pandas group dispatch dominated the stage (measured
    6.2 s of a 9.5 s single-core minhash run at sf0.1); here the pair
    index arithmetic is pure numpy regardless of bucket count."""
    empty = np.empty(0, np.int64)
    n = len(codes)
    if n == 0:
        return empty, empty, 0, 0
    change = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    starts = np.concatenate([[0], change])
    sizes = np.diff(np.concatenate([starts, [n]]))
    over = sizes > cap
    dropped_pairs = int((sizes[over] * (sizes[over] - 1) // 2).sum())
    dropped_runs = int(over.sum())
    keep = (sizes >= 2) & ~over
    s = sizes[keep].astype(np.int64)
    o = starts[keep].astype(np.int64)
    if len(s) == 0:
        return empty, empty, dropped_pairs, dropped_runs
    # enumerate kept rows: global row index + local position per run
    total = int(s.sum())
    run_of = np.repeat(np.arange(len(s)), s)
    local = np.arange(total) - np.repeat(np.cumsum(s) - s, s)
    row = o[run_of] + local
    # each row i (local pos p, run size sz) is the `a` of (sz - 1 - p) pairs
    a_counts = s[run_of] - 1 - local
    a_idx = np.repeat(row, a_counts)
    csum = np.cumsum(a_counts)
    off = np.arange(int(csum[-1])) - np.repeat(csum - a_counts, a_counts)
    return a_idx, a_idx + off + 1, dropped_pairs, dropped_runs


def _group_codes_sorted(df: pd.DataFrame, key_cols: list[str],
                        id_col: str) -> tuple[pd.DataFrame, np.ndarray]:
    """Sort rows by (key_cols..., id_col), dedupe exact (key, id) repeats,
    and return run codes for ``_runs_all_pairs``."""
    df = df.drop_duplicates(key_cols + [id_col]) \
        .sort_values(key_cols + [id_col], kind="mergesort") \
        .reset_index(drop=True)
    if not len(df):
        return df, np.empty(0, np.int64)
    new = np.zeros(len(df), dtype=bool)
    new[0] = True
    for c in key_cols:
        v = df[c].to_numpy()
        new[1:] |= v[1:] != v[:-1]
    return df, np.cumsum(new) - 1


def minhash_lsh_pairs(
    ds: rd.Dataset, id_col: str, text_col: str,
    *, num_perm: int = 64, bands: int = 16, threshold: float = 0.6,
    shingle_k: int = 5, verify: str = "join",
    bucket_cap: int = LSH_BUCKET_CAP,
) -> rd.Dataset:
    """MinHash+LSH near-dup detection → verified pair list
    (id_a, id_b, jaccard ≥ threshold).

    Shuffles with ``verify="join"`` (default, the scale path): (1) band
    groupby over small (band, hash, id) rows; (2+3) a payload-deduplicated
    cogroup that fetches each referenced text once per target partition
    and scores Jaccard fully distributed — the global distinct-pair dedup
    is folded into the cogroup (pairs route by pair-key hash, so
    band-duplicates co-locate and drop locally; no separate dedup
    exchange).  No full-corpus driver collect anywhere (see
    ``_verify_pairs_join``).  ``verify="broadcast"`` keeps the legacy
    id→text broadcast plus an explicit distinct-pair pass
    (driver-collected — only for corpora that fit the driver;
    equivalence-tested against the join path, and locally ~2× faster,
    which is exactly the trade the broadcast makes)."""
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
        g, codes = _group_codes_sorted(df, ["band_id", "band_hash"],
                                       "doc_id")
        ia, ib, dropped_pairs, dropped_buckets = _runs_all_pairs(
            codes, bucket_cap)
        if dropped_pairs:
            import logging

            logging.getLogger(__name__).warning(
                "minhash LSH dropped %d candidate pairs from %d hot band "
                "buckets (> %d members) — near-dups relying ONLY on those "
                "buckets are missed (they typically share other bands)",
                dropped_pairs, dropped_buckets, bucket_cap)
        if not len(ia):
            return pd.DataFrame({"id_a": pd.Series([], dtype=df["doc_id"].dtype),
                                 "id_b": pd.Series([], dtype=df["doc_id"].dtype)})
        ids = g["doc_id"].to_numpy()
        # local combiner: a pair can re-form via several buckets that hash
        # into THIS partition — dedupe before it enters any exchange
        return pd.DataFrame({"id_a": ids[ia],
                             "id_b": ids[ib]}).drop_duplicates()

    candidates = partitioned_groupby(exploded, "band_hash", buckets_to_pairs,
                                     nparts=32)

    if verify == "join":
        # the global pair dedup is FOLDED INTO the verify cogroup: a pair's
        # verify target partition is hash(pair_key) % nparts, so
        # band-duplicate pairs co-locate and score_partition drops them
        # locally — one whole candidate-stream shuffle saved vs a separate
        # keyed dedup pass
        return _verify_pairs_join(candidates, ds, id_col, text_col, threshold)
    if verify != "broadcast":
        raise ValueError(f"verify must be 'join' or 'broadcast', {verify!r}")

    # broadcast path scores every candidate row directly → it needs the
    # explicit distinct-pair pass (a pair can collide in several bands)
    def pair_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("id_a"), pa.string()),
            pc.cast(batch.column("id_b"), pa.string()), "\x1f")
        return batch.append_column("pair_key", key)

    candidates = dedup_first(
        candidates.map_batches(pair_key, batch_format="pyarrow"),
        "pair_key", nparts=8,
    ).drop_columns(["pair_key"])

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
                       threshold: float, nparts: int = 32,
                       ngram_n: int = 3) -> rd.Dataset:
    """Exact-Jaccard verification of candidate pairs WITHOUT any driver-side
    text table — a payload-deduplicated cogroup:

    1. explode each pair into two slot rows (key=id_a / key=id_b), union
       with the text table (``pad_union``), cogroup on key (each corpus
       text moves through exactly ONE shuffle);
    2. inside that cogroup, compute each pair's TARGET PARTITION
       ``part = hash(pair_key) % nparts`` and emit (a) one id-only row per
       pair and (b) each referenced doc's text ONCE PER TARGET PARTITION —
       hot docs in thousands of pairs ship once per partition, not once
       per pair (measured: the per-pair payload variant moved ~0.5 GB at
       sf0.1 and a per-pair groupby burned more CPU than the Jaccard);
    3. groupby(part): build a per-partition id→n-gram-set dict (each set
       computed once), then score pairs with a plain vectorized zip loop.

    All shuffles are coarse keyed exchanges; nothing is collected to the
    driver.  Schemas are passed explicitly so nothing calls
    ``Dataset.schema()`` on the expensive candidate lineage."""
    import numpy as np

    from ..stages.join import _arrow_types, pad_union

    texts = ds.select_columns([id_col, text_col])
    ttypes = _arrow_types(texts)  # cheap: source-backed
    idt = ttypes[id_col]

    tx = texts.map_batches(
        lambda t: t.rename_columns(
            ["key" if c == id_col else c for c in t.column_names]),
        batch_format="pyarrow", zero_copy_batch=True)

    def explode_slots(batch: pa.Table) -> pa.Table:
        df = batch.select(["id_a", "id_b"]).to_pandas()
        out = pd.concat([
            df.assign(key=df["id_a"], slot=0),
            df.assign(key=df["id_b"], slot=1),
        ], ignore_index=True)
        return pa.Table.from_pandas(out[["key", "id_a", "id_b", "slot"]],
                                    preserve_index=False)

    ex = candidates.map_batches(explode_slots, batch_format="pyarrow",
                                zero_copy_batch=True)
    u = pad_union(ex, tx,
                  a_types={"key": idt, "id_a": idt, "id_b": idt,
                           "slot": pa.int64()},
                  b_types={"key": idt, text_col: ttypes[text_col]})

    def route(df: pd.DataFrame) -> pd.DataFrame:
        # one cogroup partition: texts for a key range + the slot rows of
        # every pair touching those keys.  kind=0 rows carry pair ids,
        # kind=1 rows carry each (target partition, doc) text exactly once;
        # `key`/`id_*` placeholders reuse same-dtype columns so every
        # partition emits an identical schema (empty-safe).
        # duplicate doc_id rows: keep="last" matches the legacy broadcast
        # path's dict(zip(...)) last-wins (a non-unique index would raise
        # InvalidIndexError inside .map)
        tmap = (df.loc[df["_side"] == 1]
                .drop_duplicates("key", keep="last")
                .set_index("key")[text_col])
        probes = df.loc[df["_side"] == 0]
        pk = (probes["id_a"].astype(str) + "\x1f"
              + probes["id_b"].astype(str))
        part = (pd.util.hash_array(pk.to_numpy(dtype=object))
                % nparts).astype("int32")
        probes = probes.assign(part=part)
        s0 = probes.loc[probes["slot"] == 0]
        pair_rows = pd.DataFrame({
            "part": s0["part"].to_numpy(),
            "kind": np.zeros(len(s0), dtype="int8"),
            "id_a": s0["id_a"].to_numpy(),
            "id_b": s0["id_b"].to_numpy(),
            "key": s0["id_a"].to_numpy(),
            "text": np.full(len(s0), "", dtype=object),
        })
        usage = probes[["part", "key"]].drop_duplicates()
        doc_rows = pd.DataFrame({
            "part": usage["part"].to_numpy(),
            "kind": np.ones(len(usage), dtype="int8"),
            "id_a": usage["key"].to_numpy(),
            "id_b": usage["key"].to_numpy(),
            "key": usage["key"].to_numpy(),
            "text": usage["key"].map(tmap).fillna("").to_numpy(),
        })
        return pd.concat([pair_rows, doc_rows], ignore_index=True)

    routed = partitioned_groupby(u, "key", route, nparts=nparts)

    def score_partition(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.dedup import jaccard, word_ngrams

        docs = df.loc[df["kind"] == 1]
        tmap = dict(zip(docs["key"], docs["text"]))
        memo: dict = {}

        def nset(doc_id):
            s = memo.get(doc_id)
            if s is None:
                s = word_ngrams(tmap.get(doc_id, ""), ngram_n)
                memo[doc_id] = s
            return s

        # band-duplicate pairs co-locate here (part = hash(pair_key)):
        # the global distinct-pair semantics are enforced locally
        pairs = df.loc[df["kind"] == 0].drop_duplicates(["id_a", "id_b"])
        rows = []
        for a, b in zip(pairs["id_a"], pairs["id_b"]):
            ja = jaccard(nset(a), nset(b))
            if ja >= threshold:
                rows.append((a, b, ja))
        if rows:
            out = pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])
            out["id_a"] = out["id_a"].astype(pairs["id_a"].dtype)
            out["id_b"] = out["id_b"].astype(pairs["id_b"].dtype)
            return out
        empty = pairs[["id_a", "id_b"]].iloc[0:0].copy()
        empty["jaccard"] = pd.Series([], dtype="float64")
        return empty

    # `part` IS the final partition id — group directly on it (no rehash)
    out = routed.groupby("part").map_groups(score_partition,
                                            batch_format="pandas")
    # normalize to Arrow blocks (pandas map_groups blocks + downstream
    # sort of mixed block types trips Ray)
    return out.map_batches(lambda t: t, batch_format="pyarrow",
                           zero_copy_batch=True)


def simhash_pairs(ds: rd.Dataset, id_col: str, text_col: str,
                  *, max_hamming: int = 3,
                  bucket_cap: int = LSH_BUCKET_CAP) -> rd.Dataset:
    """SimHash near-dup pairs (Hamming ≤ max_hamming) via 4×16-bit band
    blocking (pigeonhole-complete for max_hamming ≤ 3).  Band buckets
    beyond ``bucket_cap`` members are dropped as pair generators with the
    dropped pair mass logged (same discipline as ``minhash_lsh_pairs``).

    ONE band shuffle, not four: sketch rows explode to (band_key, doc,
    simhash) rows — band_key = band_id packed above the 16-bit band value
    so all four bands cogroup in one coarse exchange (the former
    one-`partitioned_groupby`-per-band chain paid 4 full shuffle rounds of
    fixed latency on tiny sketch rows) — then one keyed pair dedup."""
    sh = ds.map_batches(
        functools.partial(simhash_batch, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parts = []
        for b in range(4):
            key = pc.add(
                pc.cast(batch.column(f"sh_band{b}"), pa.int64()),
                pa.scalar((b + 1) << 32, pa.int64()))
            parts.append(pa.table({
                "doc_id": batch.column("doc_id"),
                "band_key": key,
                "simhash": batch.column("simhash"),
            }))
        return pa.concat_tables(parts)

    exploded = sh.map_batches(explode_bands, batch_format="pyarrow")

    def band_pairs(df: pd.DataFrame, band_col: str) -> pd.DataFrame:
        # each sketch row carries its own simhash, so the full Hamming check
        # runs from in-partition values — no driver-side id→simhash map.
        # NB: dedupe by doc_id WITHIN a bucket (the former per-bucket
        # drop_duplicates), not globally — key is (band value, doc).
        g, codes = _group_codes_sorted(df, [band_col], "doc_id")
        ia, ib, dropped_pairs, dropped_buckets = _runs_all_pairs(
            codes, bucket_cap)
        if dropped_pairs:
            import logging

            logging.getLogger(__name__).warning(
                "simhash dropped %d candidate pairs from %d hot band "
                "buckets (> %d members); pairs in those buckets are only "
                "found via their other bands", dropped_pairs,
                dropped_buckets, bucket_cap)
        if not len(ia):
            return pd.DataFrame({"id_a": pd.Series([], dtype=df["doc_id"].dtype),
                                 "id_b": pd.Series([], dtype=df["doc_id"].dtype),
                                 "hamming": pd.Series([], dtype="int64")})
        hs = g["simhash"].to_numpy(dtype=np.uint64)
        x = hs[ia] ^ hs[ib]
        # vectorized popcount: unpack each uint64's bytes and sum bits
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        ids = g["doc_id"].to_numpy()
        return pd.DataFrame({"id_a": ids[ia[keep]],
                             "id_b": ids[ib[keep]],
                             "hamming": ham[keep]})

    allp = partitioned_groupby(
        exploded, "band_key",
        functools.partial(band_pairs, band_col="band_key"), nparts=16)

    def pkey(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("id_a"), pa.string()),
            pc.cast(batch.column("id_b"), pa.string()), "\x1f")
        return batch.append_column("pair_key", key)

    return dedup_first(allp.map_batches(pkey, batch_format="pyarrow"),
                       "pair_key", nparts=16).drop_columns(["pair_key"])


def winnow_pairs(
    ds: rd.Dataset, id_col: str, text_col: str,
    *, k: int = 12, w: int = 8, min_shared: int = 2,
    bucket_cap: int = LSH_BUCKET_CAP,
) -> rd.Dataset:
    """LOCAL-fingerprint near-dup candidates via winnowing (Schleimer,
    Wilkerson & Aiken, SIGMOD 2003 — the MOSS algorithm): rolling-hash
    k-grams → rightmost-min-per-window fingerprints (stages/dedup.winnow)
    → explode to (id, fp) rows → fp-bucket pair emit (hot buckets capped
    with logged dropped mass, same discipline as minhash) → per-pair
    shared-fingerprint count → pairs sharing ≥ ``min_shared``.

    Complements the whole-document sketches: a copied PARAGRAPH inside two
    otherwise-different pages still yields shared fingerprints (any common
    substring ≥ w+k-1 bytes is guaranteed detected), where whole-doc
    minhash dilutes the overlap below threshold.

    Shuffles: one coarse partitioned groupby on fp (small (id, fp) rows —
    the text never moves), one keyed sum on the pair key.  Output:
    (id_a, id_b, n_shared)."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import winnow_batch

    exploded = ds.map_batches(
        functools.partial(winnow_batch, id_col=id_col, text_col=text_col,
                          k=k, w=w),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def fp_to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a: list = []
        out_b: list = []
        dropped_pairs = 0
        dropped_buckets = 0
        for _, g in df.groupby("fp", sort=False):
            if len(g) < 2:
                continue
            ids = np.unique(g[id_col].to_numpy())
            if len(ids) < 2:
                continue
            if len(ids) > bucket_cap:
                dropped_pairs += len(ids) * (len(ids) - 1) // 2
                dropped_buckets += 1
                continue
            a, b = _emit_bucket_pairs(ids)
            out_a.append(a)
            out_b.append(b)
        if dropped_pairs:
            import logging

            logging.getLogger(__name__).warning(
                "winnowing dropped %d candidate pairs from %d hot "
                "fingerprint buckets (> %d members)",
                dropped_pairs, dropped_buckets, bucket_cap)
        if not out_a:
            return pd.DataFrame({
                "id_a": pd.Series([], dtype=df[id_col].dtype),
                "id_b": pd.Series([], dtype=df[id_col].dtype),
                "n_shared": pd.Series([], dtype="int64")})
        # local combiner: count shared fps per pair within this partition
        # (each fp value lives in exactly one partition, so partial counts
        # sum globally without double-counting)
        pairs = pd.DataFrame({"id_a": np.concatenate(out_a),
                              "id_b": np.concatenate(out_b)})
        return (pairs.groupby(["id_a", "id_b"], as_index=False)
                .size().rename(columns={"size": "n_shared"}))

    cand = partitioned_groupby(exploded, "fp", fp_to_pairs, nparts=32)
    agg = cand.groupby(["id_a", "id_b"]).aggregate(
        Sum("n_shared", alias_name="n_shared"))

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("n_shared"), min_shared))

    return agg.map_batches(keep, batch_format="pyarrow",
                           zero_copy_batch=True)


def ngram_jaccard_pairs(
    ds: rd.Dataset, id_col: str, text_col: str, block_col: str,
    *, threshold: float = 0.6, n: int = 1,
    block_cap: int = 2048, oversize: str = "raise",
) -> rd.Dataset:
    """EXACT word-n-gram Jaccard near-dup within a blocking key — the
    exact member of the dedup family (minhash_lsh_pairs is the approximate
    scale path whose verify step already uses n-gram Jaccard; this variant
    computes it for EVERY within-block pair, for blocks known to be
    bounded).  One shuffle on the block key; the per-group kernel is a
    vectorized incidence-matrix matmul (docs × shingle vocabulary), never
    a per-pair Python loop.

    Bounded-block contract — ENFORCED, not prose (round-3 finding: the
    per-block dense docs × vocab incidence matrix OOMs on a corpus-scale
    block such as a whole language): a pre-pass counts block sizes
    (``count_hot_keys`` combiner, bounded by skew); blocks beyond
    ``block_cap`` rows either

    - ``oversize="raise"`` (default): fail LOUDLY listing the offending
      blocks — the caller picked a blocking key that is not a block, or
    - ``oversize="reroute"``: run through ``prefix_jaccard_pairs`` (the
      exact open-domain path with no dense per-block state) per oversized
      block, with the rerouted row mass logged — mirroring the
      LSH_BUCKET_CAP discipline.  Reroute preserves this operator's exact
      tokenization (lower / split(" ") / empties kept) by canonicalizing
      texts before the prefix filter; parity is pytest-verified on a
      planted oversized block.

    n=1 tokenization deliberately matches the SQL oracle byte-for-byte:
    ``lower().split(' ')`` with set semantics (empty tokens kept, exactly
    like DuckDB ``list_distinct(string_split(lower(text), ' '))``).
    Intersection/union counts come out of a float32 matmul (exact for
    counts < 2^24) and the final division is float64, so the quotient is
    bit-identical to the oracle's.
    """
    if oversize not in ("raise", "reroute"):
        raise ValueError(f"oversize must be 'raise' or 'reroute', "
                         f"got {oversize!r}")
    from ..stages.join import count_hot_keys

    # NOT materialized: the input is consumed 2-3 times (count pre-pass +
    # split paths), but it is typically a pruned parquet read — re-running
    # that lineage re-reads three columns, which beats pinning the corpus
    # text in the object store for the duration.  Callers with expensive
    # upstream lineage should materialize before calling.
    hot = count_hot_keys(ds, block_col, threshold=block_cap, salt_max=0)
    if hot and oversize == "raise":
        worst = sorted(hot.items(), key=lambda kv: -kv[1])[:5]
        raise ValueError(
            f"ngram_jaccard_pairs: {len(hot)} block(s) exceed "
            f"block_cap={block_cap} rows (largest: {worst}) — the dense "
            "per-block kernel would not be memory-bounded.  Pick a finer "
            "blocking key, raise block_cap deliberately, or pass "
            "oversize='reroute' to run oversized blocks through the "
            "prefix-filter path")

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).reset_index(drop=True)
        sets = []
        for t in g[text_col]:
            toks = t.lower().split(" ")
            if n > 1:
                toks = [" ".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1)]
            sets.append(set(toks))
        vocab: dict[str, int] = {}
        rows, cols = [], []
        for i, s in enumerate(sets):
            for w in s:
                j = vocab.setdefault(w, len(vocab))
                rows.append(i)
                cols.append(j)
        m = len(g)
        if m < 2:
            return pd.DataFrame({"doc_a": np.array([], dtype=np.int64),
                                 "doc_b": np.array([], dtype=np.int64),
                                 "jaccard": np.array([], dtype=np.float64)})
        inc = np.zeros((m, len(vocab)), dtype=np.float32)
        inc[rows, cols] = 1.0
        inter = inc @ inc.T                      # exact set-intersection counts
        sizes = inc.sum(axis=1)
        union = sizes[:, None] + sizes[None, :] - inter
        ia, ib = np.triu_indices(m, k=1)
        jac = (inter[ia, ib].astype(np.float64)
               / np.maximum(union[ia, ib].astype(np.float64), 1.0))
        keep = jac >= threshold
        ids = g[id_col].to_numpy()
        return pd.DataFrame({
            "doc_a": ids[ia[keep]],
            "doc_b": ids[ib[keep]],
            # DuckDB-compatible half-away rounding (np.round is half-even
            # and diverges on exact dyadic halves like 21/32)
            "jaccard": _round_half_away(jac[keep], 4),
        })

    if not hot:
        return ds.groupby(block_col).map_groups(group_pairs,
                                                batch_format="pandas")

    # oversize="reroute": bounded blocks keep the dense kernel; each
    # oversized block (bounded COUNT — skew, not cardinality) runs the
    # prefix-filter path, which holds no dense per-block state.
    import logging

    hot_set = set(hot)
    rerouted_rows = sum(hot.values())
    logging.getLogger(__name__).warning(
        "ngram_jaccard_pairs rerouting %d block(s) totalling %d rows "
        "(> block_cap=%d) through prefix_jaccard_pairs: %s",
        len(hot), rerouted_rows, block_cap,
        sorted(hot, key=lambda k: -hot[k])[:5])

    def in_hot(batch: pa.Table, invert: bool) -> pa.Table:
        mask = pc.is_in(batch.column(block_col),
                        value_set=pa.array(sorted(hot_set)))
        return batch.filter(pc.invert(mask) if invert else mask)

    import functools

    bounded = ds.map_batches(functools.partial(in_hot, invert=True),
                             batch_format="pyarrow", zero_copy_batch=True)
    out = bounded.groupby(block_col).map_groups(group_pairs,
                                                batch_format="pandas")
    # normalize to Arrow blocks: the union below mixes this with the
    # Arrow-block prefix path, and Ray's sort refuses mixed block types
    out = out.map_batches(lambda t: t, batch_format="pyarrow",
                          zero_copy_batch=True)

    # canonicalize so prefix_jaccard's tokenizer (str.split()) sees
    # EXACTLY this operator's token sets: lower + split(" ") with empty
    # tokens kept ("\\x00" placeholder — whitespace-free by construction).
    # Tokens containing non-space whitespace would be re-split by the
    # prefix path; refuse loudly rather than silently diverge.
    def canon(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        texts = []
        for t in batch.column(text_col).to_pylist():
            toks = t.lower().split(" ")
            for tok in toks:
                if any(c in tok for c in "\t\n\r\x0b\x0c\x00\x01"):
                    raise ValueError(
                        "ngram_jaccard_pairs reroute: token contains "
                        "non-space whitespace or reserved control chars; "
                        "the prefix-path canonicalization cannot "
                        "represent it — clean the text or raise "
                        "block_cap")
            if n > 1:
                # shingle here; inner spaces become \\x01 so the prefix
                # path's whitespace split sees one token per shingle
                toks = ["\x01".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1)]
            texts.append(" ".join(tok if tok else "\x00" for tok in toks))
        # "" marks an n>1 doc with < n tokens (empty shingle set — can
        # never pair at threshold > 0); dropped by the filter below
        return pa.table({id_col: ids, "_canon": pa.array(texts,
                                                         pa.string()),
                         block_col: batch.column(block_col)})

    hot_ds = ds.map_batches(functools.partial(in_hot, invert=False),
                            batch_format="pyarrow", zero_copy_batch=True)
    canon_ds = hot_ds.map_batches(canon, batch_format="pyarrow")
    if n > 1:
        # docs with fewer than n tokens have EMPTY shingle sets and can
        # never reach a positive threshold — dropping them is exact
        canon_ds = canon_ds.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("_canon"), "")),
            batch_format="pyarrow", zero_copy_batch=True)
    parts = [out]
    for blk in sorted(hot_set):
        one = canon_ds.map_batches(
            lambda t, b=blk: t.filter(pc.equal(t.column(block_col), b)),
            batch_format="pyarrow", zero_copy_batch=True)
        pj = prefix_jaccard_pairs(one, id_col, "_canon",
                                  threshold=threshold, n=1)

        def finish(batch: pa.Table) -> pa.Table:
            jac = batch.column("jaccard").to_numpy(zero_copy_only=False)
            return pa.table({
                "doc_a": batch.column("id_a"),
                "doc_b": batch.column("id_b"),
                "jaccard": pa.array(_round_half_away(jac, 4),
                                    pa.float64()),
            })

        parts.append(pj.map_batches(finish, batch_format="pyarrow"))
    first, rest = parts[0], parts[1:]
    return first.union(*rest) if rest else first


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
    *, threshold: float = 0.35, n_planes: int = 6, n_probes: int = 1,
) -> rd.Dataset:
    """Embedding near-dup without a label column: block by random-hyperplane
    LSH bucket (cos-similar vectors land together with high probability),
    then the same within-block matmul.

    ``n_probes`` > 1 is the recall knob: each probe uses an INDEPENDENT
    seeded plane set (each row lands in one bucket per probe → total work
    scales linearly with probes, not exponentially), pairs are unioned and
    deduped.  Recall vs the label-blocked exact variant is measured in
    pytest."""
    from .ann import HyperplaneLSH, _as_matrix, _normalize

    def tag(seed: int):
        def f(batch: pa.Table) -> pa.Table:
            mat = _normalize(_as_matrix(batch.column(vec_col)))
            lsh = HyperplaneLSH(mat.shape[1], n_planes=n_planes, seed=seed)
            b = lsh.bucket(mat)
            return batch.append_column(
                "lsh_bucket", pa.array(b.astype("int64"), pa.int64()))

        return f

    per_probe = []
    for p in range(n_probes):
        tagged = ds.map_batches(tag(42 + p), batch_format="pyarrow",
                                zero_copy_batch=True)
        per_probe.append(embedding_neardup_pairs(
            tagged, id_col, vec_col, "lsh_bucket", threshold=threshold))
    if n_probes == 1:
        return per_probe[0]
    allp = per_probe[0].union(*per_probe[1:])

    def pkey(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("id_a"), pa.string()),
            pc.cast(batch.column("id_b"), pa.string()), "\x1f")
        return batch.append_column("pair_key", key)

    return dedup_first(allp.map_batches(pkey, batch_format="pyarrow"),
                       "pair_key", nparts=8).drop_columns(["pair_key"])


def _pairs_to_canonical(pairs: rd.Dataset, int_ids: bool,
                        components_fn) -> rd.Dataset:
    """Shared tail of the near-dup COLLAPSE operators: (id_a, id_b) pair
    Dataset → transitive closure via ``components_fn`` (a callable over an
    (a, b) string-edges Dataset) → (doc_id, canonical_id) mapping for
    every doc in a cluster (canonical = smallest member id)."""
    import pyarrow.compute as pc2

    def as_edges(batch: pa.Table) -> pa.Table:
        # union-find nodes are strings (min-label order is lexicographic);
        # zero-pad int ids so lexicographic == numeric order — which only
        # holds for NON-NEGATIVE ids (a padded '-5' would sort after '3'
        # and corrupt canonical selection): guard loudly
        if int_ids:
            for col in ("id_a", "id_b"):
                mn = pc2.min(batch.column(col)).as_py()
                if mn is not None and mn < 0:
                    raise ValueError(
                        "near-dup collapse requires non-negative integer "
                        f"ids (found {mn})")
        a = pc2.cast(batch.column("id_a"), pa.string())
        b = pc2.cast(batch.column("id_b"), pa.string())
        if int_ids:
            a = pc2.utf8_lpad(a, 20, "0")
            b = pc2.utf8_lpad(b, 20, "0")
        return pa.table({"a": a, "b": b})

    edges = pairs.map_batches(as_edges, batch_format="pyarrow",
                              zero_copy_batch=True)
    comps = components_fn(edges)

    def unpad(batch: pa.Table) -> pa.Table:
        node, canon = batch.column("node"), batch.column("canonical")
        if int_ids:
            node = pc2.cast(node, pa.int64())
            canon = pc2.cast(canon, pa.int64())
        return pa.table({"doc_id": node, "canonical_id": canon})

    return comps.map_batches(unpad, batch_format="pyarrow",
                             zero_copy_batch=True)


def minhash_dedup(ds: rd.Dataset, id_col: str, text_col: str,
                  *, threshold: float = 0.5, nparts: int = 16) -> rd.Dataset:
    """End-to-end near-duplicate COLLAPSE: MinHash+LSH verified pairs →
    transitive closure (``state.unionfind.distributed_components``, fully
    Dataset-resident) → (doc_id, canonical_id) mapping for every doc in a
    near-dup cluster (canonical = smallest member id).  Docs not returned
    are singletons (their canonical is themselves) — emitting only cluster
    members keeps the output near-dup-mass-sized, not corpus-sized."""
    from ..stages.join import _arrow_types
    from ..state.unionfind import distributed_components

    idt = _arrow_types(ds.select_columns([id_col]))[id_col]
    int_ids = pa.types.is_integer(idt)
    pairs = minhash_lsh_pairs(ds, id_col, text_col, threshold=threshold)
    return _pairs_to_canonical(
        pairs, int_ids, lambda e: distributed_components(e, nparts=nparts))


def prefix_jaccard_dedup(
    ds: rd.Dataset, id_col: str, text_col: str,
    *, threshold: float = 0.7, n: int = 1,
    bucket_cap: int = 2000, nparts: int = 16,
) -> rd.Dataset:
    """EXACT near-duplicate COLLAPSE — the exact-open-domain sibling of
    ``minhash_dedup``: ``prefix_jaccard_pairs`` (exact Jaccard ≥ threshold
    over word-n-gram shingles, no blocking key, distributed prefix filter)
    → size-adaptive transitive closure (``state.unionfind.components_auto``:
    bounded edge lists driver-solved, beyond-bound Dataset-resident —
    identical mapping both ways) → (doc_id, canonical_id) for every doc in
    a cluster (canonical = smallest member id; singletons omitted).

    Edge graphs here are cluster-mass-sized (pairs already passed the
    exact verify), which is exactly components_auto's sweet spot."""
    from ..stages.join import _arrow_types
    from ..state.unionfind import components_auto

    idt = _arrow_types(ds.select_columns([id_col]))[id_col]
    int_ids = pa.types.is_integer(idt)
    pairs = prefix_jaccard_pairs(
        ds, id_col, text_col, threshold=threshold, n=n,
        bucket_cap=bucket_cap, nparts=nparts
    ).select_columns(["id_a", "id_b"])
    return _pairs_to_canonical(
        pairs, int_ids, lambda e: components_auto(
            e.materialize(), nparts=nparts))


def prefix_jaccard_pairs(
    ds: rd.Dataset, id_col: str, text_col: str,
    *, threshold: float = 0.7, n: int = 1,
    bucket_cap: int = 2000, nparts: int = 16,
) -> rd.Dataset:
    """EXACT Jaccard ≥ threshold pairs over word-n-gram shingle sets with
    NO blocking key — prefix filtering (Chaudhuri et al. ICDE 2006;
    Bayardo et al. WWW 2007 "all-pairs"): under any global token order,
    two sets with J ≥ t each keep only their first
    ``|s| − ceil(t·|s|) + 1`` tokens (the prefix), and any qualifying
    pair is guaranteed to co-occur in at least one prefix-token bucket.
    Ordering tokens rarest-first makes those buckets df-bounded — a
    stopword is never anyone's prefix.

    Fully distributed; the global rarity order is NEVER collected:

    1. explode (doc, shingle, set_size) rows — one per DISTINCT shingle
       per doc (inverted-index volume, the scale anchor);
    2. cogroup on shingle: document frequency = group size, attached
       in-partition (no df table, no broadcast);
    3. cogroup on doc: per-doc sort by (df, shingle) — a total order,
       globally consistent because df is global — and keep the prefix;
    4. cogroup on shingle: per-bucket pair emit, capped + logged like
       the LSH band buckets (`buckets_to_pairs` discipline);
    5. candidates verified EXACTLY (same shingle definition) by the
       payload-deduplicated cogroup ``_verify_pairs_join``, which also
       enforces global pair distinctness.

    Complement inventory: ``ngram_jaccard_pairs`` is exact WITHIN a known
    block key; ``minhash_lsh_pairs`` is approximate at open-domain scale;
    this operator is exact AND open-domain, paying one inverted-index
    shuffle for it."""
    from ..stages.dedup import word_ngrams

    sep = "\x1f"

    def explode(batch: pa.Table) -> pa.Table:
        ids, toks, sizes = [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            if not t.split():
                # token-free docs emit nothing: the SQL oracle's jaccard
                # is 0/0 = NULL for them (word_ngrams would return the
                # degenerate {()} and pair every empty doc at 1.0)
                continue
            s = word_ngrams(t, n)
            for sh in s:
                ids.append(did)
                toks.append(sep.join(sh))
                sizes.append(len(s))
        return pa.table({"doc": pa.array(ids),
                         "tok": pa.array(toks, pa.string()),
                         "size": pa.array(sizes, pa.int64())})

    ex = ds.map_batches(explode, batch_format="pyarrow",
                        zero_copy_batch=True)

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        # (doc, tok) rows are distinct by construction → group size = df
        df = df.copy()
        df["df"] = df.groupby("tok")["tok"].transform("size")
        return df

    with_df = partitioned_groupby(ex, "tok", attach_df, nparts=nparts)

    def keep_prefix(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc", "df", "tok"], kind="mergesort")
        # EXACT ceiling of t·|s|: bare np.ceil(t*s) overshoots whenever
        # the float product lands epsilon above the true integer (e.g.
        # 0.55*100 = 55.000000000000007 → ceil 56), silently shortening
        # the prefix and dropping qualifying pairs.  Nudging down by 1e-9
        # can only LENGTHEN a prefix (conservative: extra candidates are
        # discarded by the exact verify, never missed).
        sizes = df["size"].to_numpy()
        plen = sizes - np.ceil(threshold * sizes - 1e-9) + 1
        pos = df.groupby("doc").cumcount().to_numpy()
        return df.loc[pos < plen, ["doc", "tok"]]

    prefixes = partitioned_groupby(with_df, "doc", keep_prefix,
                                   nparts=nparts)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g, codes = _group_codes_sorted(df, ["tok"], "doc")
        ia, ib, dropped_pairs, dropped_buckets = _runs_all_pairs(
            codes, bucket_cap)
        if dropped_buckets:
            import logging
            logging.getLogger(__name__).warning(
                "prefix_jaccard dropped %d candidate pairs from %d hot "
                "prefix buckets (cap %d) — rarity ordering should keep "
                "buckets small; a hit here means near-identical mass",
                dropped_pairs, dropped_buckets, bucket_cap)
        if not len(ia):
            return pd.DataFrame({"id_a": df["doc"].iloc[0:0],
                                 "id_b": df["doc"].iloc[0:0]})
        ids = g["doc"].to_numpy()
        # local combiner: near-dup docs share most prefix tokens, so the
        # same pair recurs once per shared token in this partition —
        # dedupe before the verify shuffle (minhash buckets_to_pairs
        # applies the same discipline)
        return pd.DataFrame({"id_a": ids[ia],
                             "id_b": ids[ib]}) \
            .drop_duplicates(ignore_index=True)

    cand = partitioned_groupby(prefixes, "tok", bucket_pairs,
                               nparts=nparts)
    # the verify cogroup routes by hash(pair) — bucket duplicates
    # co-locate and global distinctness is enforced there
    return _verify_pairs_join(cand, ds, id_col, text_col, threshold,
                              nparts=nparts, ngram_n=n)


def decontaminate_flags(
    ds: rd.Dataset, id_col: str, text_col: str, eval_texts: list[str],
    *, n: int = 3, min_hits: int = 1,
) -> rd.Dataset:
    """Eval-set decontamination: flag corpus documents sharing word
    n-grams with a benchmark set (the GPT-3 §C / Pile appendix-C
    collision rule that guards train/test separation).

    The eval side is SMALL by definition (benchmarks are thousands of
    items) — its distinct n-gram set is built once on the driver and
    broadcast via ``ray.put`` (fetched once per worker, the
    ``_fetch_bcast``-style discipline); the corpus side is one
    embarrassingly-parallel pass: per batch, per-doc DISTINCT n-grams →
    membership count against the eval set → (id, n_hits) for documents
    with ``n_hits ≥ min_hits``.  No shuffle anywhere; 10^12 docs stream.

    Tokenization matches the SQL oracle byte-for-byte (the family rule:
    ``lower().split(' ')`` with empty tokens kept; docs or eval items
    with fewer than ``n`` tokens contribute no n-grams)."""
    import ray as _ray

    def grams_of(text: str) -> set:
        toks = text.lower().split(" ")
        if len(toks) < n:
            return set()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    eval_set: set = set()
    for t in eval_texts:
        eval_set |= grams_of(t)
    if not eval_set:
        raise ValueError("eval set yields no n-grams (all items shorter "
                         f"than n={n} tokens?)")
    ref = _ray.put(eval_set)

    def flag_batch(batch: pa.Table, *, ref=ref) -> pa.Table:
        from .ann import _fetch_bcast

        es = _fetch_bcast(ref)
        ids, hits = [], []
        for did, text in zip(batch.column(id_col).to_pylist(),
                             batch.column(text_col).to_pylist()):
            g = grams_of(text)
            if not g:
                continue
            k = len(g & es)
            if k >= min_hits:
                ids.append(did)
                hits.append(k)
        return pa.table({
            id_col: pa.array(ids, batch.schema.field(id_col).type),
            "n_hits": pa.array(hits, pa.int64()),
        })

    return ds.map_batches(flag_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def decontaminate_oracle_sql(eval_texts: list[str], n: int = 3,
                             min_hits: int = 1, id_col: str = "doc_id",
                             table: str = "documents",
                             text_col: str = "text") -> str:
    """DuckDB SQL computing the identical contamination flags (same
    tokenizer / distinct-gram semantics)."""
    vals = ", ".join("('" + t.replace("'", "''") + "')" for t in eval_texts)
    return f"""
WITH ev(text) AS (VALUES {vals}),
ev_toks AS (SELECT string_split(lower(text), ' ') AS tk FROM ev),
ev_grams AS (
  SELECT DISTINCT array_to_string(tk[i:i+{n}-1], ' ') AS g
  FROM ev_toks, unnest(range(1, len(tk) - {n} + 2)) AS r(i)
  WHERE len(tk) >= {n}
),
doc_toks AS (
  SELECT {id_col}, string_split(lower({text_col}), ' ') AS tk FROM {table}
),
doc_grams AS (
  SELECT DISTINCT {id_col}, array_to_string(tk[i:i+{n}-1], ' ') AS g
  FROM doc_toks, unnest(range(1, len(tk) - {n} + 2)) AS r(i)
  WHERE len(tk) >= {n}
)
SELECT d.{id_col}, CAST(count(*) AS BIGINT) AS n_hits
FROM doc_grams d JOIN ev_grams e USING (g)
GROUP BY d.{id_col}
HAVING count(*) >= {min_hits}
ORDER BY d.{id_col}
"""
