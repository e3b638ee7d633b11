"""End-to-end Ray-Data-native KG-construction pipeline.

pages → extract text → SVO triples → mentions (dictionary-enriched) →
unique-mention collapse (combiner + groupby) → disambiguation (actor pool)
→ canonicalization → graph materialization (entities / edges / decisions).

Dataflow (SURVEY.md §3.2 → Ray mapping):

    read/synthesize pages                (streamed blocks)
      map_batches(extract_text_batch)    stateless tasks, html dropped early
      map_batches(triples_batch)         stateless tasks
      map_batches(build_mentions_batch)  stateless tasks, process-global dict
      map_batches(unique_mentions_partial)  per-batch combiner
      coarse hash-partitioned dedup      THE wide shuffle — over unique sigs
        (stages/partition.py)            only, already skew-collapsed because
                                         hot mentions share one sig
      map_batches(disambiguate_batch)    stateless tasks, process-global KB
                                         (actor pool when encoder="bge")
      round2_canonicalize                created-vs-created union-find
      [broadcast canonical map]          sig → canonical_id (small side)
      map_batches(rewrite_edges_batch)   stateless tasks
      coarse hash-partitioned edge dedup exact (src, dst, rel)
      write_parquet                      partitioned sinks

Nothing materializes the full input: pages stream through extraction;
only the decisions table (≈ distinct mentions, small by construction) is
collected on the driver to build the broadcast canonical map.  Beyond
``cfg.canonical_map_broadcast_max`` rows the broadcast is replaced by
``rewrite_edges_join`` — two co-partitioned shuffle hash joins of the
triples against the decisions Dataset on ``sig`` (equivalence-tested,
byte-identical edges).
"""
from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..sources.pages import make_pages_batch
from ..sources.seed import (
    kb_cache_key,
    kb_entities,
    kb_entities_table,
    kb_vocab,
)
from ..stages.disambiguate import Disambiguator, disambiguate_batch
from ..stages.extract import extract_text_batch, triples_batch
from ..stages.mentions import (
    build_mentions_batch,
    surface_sig,
    unique_mentions_partial,
)
from ..stages.partition import dedup_first


def synth_pages_dataset(n_pages: int, seed: int = 42,
                        fillers: list[str] | None = None,
                        override_num_blocks: int | None = None) -> rd.Dataset:
    """Deterministic distributed page synthesis (order-free per index)."""
    ds = rd.range(n_pages, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: make_pages_batch(b["id"], seed=seed, fillers=fillers),
        batch_format="numpy",
        batch_size=DEFAULT_CONFIG.extract_batch_size,
    )


def extract_stage(pages: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    return pages.map_batches(
        extract_text_batch, batch_format="pyarrow",
        batch_size=cfg.extract_batch_size, zero_copy_batch=True,
    )


def triples_stage(extracted: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    return extracted.map_batches(
        triples_batch, batch_format="pyarrow",
        batch_size=cfg.extract_batch_size, zero_copy_batch=True,
    )


def mentions_stage(triples: rd.Dataset,
                   cfg: EngineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Stateless tasks over warm workers; the dictionary is a process-global
    built once per worker (stages/mentions.get_builder rationale)."""
    import functools

    return triples.map_batches(
        functools.partial(build_mentions_batch, cfg=cfg),
        batch_format="pyarrow", batch_size=cfg.score_batch_size,
    )


_MENTION_CONTENT_COLS = [
    "sig", "first_occ", "name", "type", "aliases_json", "definition",
    "attributes", "rerank_text", "embed_text",
]


def unique_mentions_stage(mentions: rd.Dataset, exact: bool = True,
                          coalesce: int = 16,
                          nparts: int = 64) -> rd.Dataset:
    """Unique-mention collapse (exact dedup, SURVEY.md §2.7).

    Projects to the content columns FIRST (url/sent_idx/role never reach the
    shuffle — measured to halve the exchange volume), then:

    - ``exact=True`` (default): per-batch combiner + coarse hash-partitioned
      shuffle dedup (stages/partition.py) — P partitions, one vectorized
      dedup kernel each.
    - ``exact=False``: shuffle-free combiner chain (per-batch dedup →
      coalescing repartition → per-block dedup).  Leaves residual cross-block
      duplicates (identical rows, dropped deterministically when the driver
      collects decisions) — only worth it when duplicate mass is dominated
      by a small hot dictionary rather than a saturated id space."""
    partial = mentions.select_columns(_MENTION_CONTENT_COLS).map_batches(
        unique_mentions_partial, batch_format="pyarrow", zero_copy_batch=True,
    )
    if exact:
        # sort_by first_occ → the surviving row carries the corpus-earliest
        # occurrence (used as the round-2 canonical representative order)
        return dedup_first(partial, "sig", nparts=nparts,
                           sort_by=["first_occ"])
    coalesced = partial.repartition(coalesce)
    return coalesced.map_batches(
        unique_mentions_partial, batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    )


def decisions_stage(unique_mentions: rd.Dataset,
                    cfg: EngineConfig = DEFAULT_CONFIG,
                    concurrency: int | tuple | None = None,
                    use_actors: bool = False,
                    num_gpus: float | None = None) -> rd.Dataset:
    """Default: stateless tasks with a process-global Disambiguator (cheap
    deterministic KB).  ``use_actors=True`` switches to a dedicated actor
    pool — required when the encoder/reranker is a real model whose load
    cost must be amortized explicitly (SURVEY.md A1/A2); ``num_gpus``
    reserves a GPU fraction per actor for model-backed encoders (the Ray
    counterpart of the reference's torch.cuda detection,
    vectorization.py:219-313)."""
    if num_gpus is not None and not use_actors:
        raise ValueError("num_gpus requires use_actors=True — stateless "
                         "tasks cannot reserve GPUs for a model")
    if use_actors:
        kwargs = {} if num_gpus is None else {"num_gpus": num_gpus}
        return unique_mentions.map_batches(
            Disambiguator, batch_format="pyarrow",
            batch_size=cfg.score_batch_size,
            concurrency=concurrency or (1, 4),
            fn_constructor_kwargs={"cfg": cfg},
            **kwargs,
        )
    import functools

    return unique_mentions.map_batches(
        functools.partial(disambiguate_batch, cfg=cfg),
        batch_format="pyarrow", batch_size=cfg.score_batch_size,
    )


class EdgeRewriter:
    """triples → edges with canonical subj/obj ids.

    The canonical map (sig → canonical_id) is the small side: shipped once
    via ``ray.put`` (broadcast hash join, SURVEY.md §2.4).  Deserialized
    once per worker process and memoized by object-ref id, so stateless
    tasks over warm workers pay the fetch exactly once."""

    _CACHE: dict[str, object] = {}

    def __init__(self, canonical_ref=None, canonical_map=None, cfg=None):
        if canonical_ref is not None:
            key = canonical_ref.hex()
            cached = EdgeRewriter._CACHE.get(key)
            if cached is None:
                cached = ray.get(canonical_ref)
                EdgeRewriter._CACHE.clear()
                EdgeRewriter._CACHE[key] = cached
            self.map = cached
        else:
            self.map = canonical_map or {}
        self.dict = kb_vocab(cfg)[0]
        self._sig_memo: dict[str, str] = {}

    def _canon(self, surface: str) -> str:
        c = self._sig_memo.get(surface)
        if c is None:
            sig = surface_sig(surface, self.dict)
            c = self.map.get(sig)
            if c is None:
                # Every triple surface flows through mentions → decisions, so
                # a miss means the canonical map is stale/partial — corrupting
                # the edge table silently is worse than failing the run.
                raise KeyError(
                    f"surface {surface!r} (sig {sig!r}) missing from the "
                    "canonical map — decisions table does not cover the "
                    "triples input")
            self._sig_memo[surface] = c
        return c

    def _canon_column(self, col) -> pa.Array:
        # dictionary-encode → resolve each UNIQUE surface once, then take()
        # back to row order (hot surfaces dominate real corpora)
        if isinstance(col, pa.ChunkedArray):
            col = (col.chunk(0) if col.num_chunks == 1
                   else pa.concat_arrays(col.chunks) if col.num_chunks
                   else pa.array([], col.type))
        enc = col.dictionary_encode()
        vals = [self._canon(s) for s in enc.dictionary.to_pylist()]
        return pa.array(vals, pa.string()).take(enc.indices)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = self._canon_column(batch.column("subj"))
        dst = self._canon_column(batch.column("obj"))
        rel = batch.column("pred")
        return pa.table(
            {
                "src_id": src,
                "dst_id": dst,
                "rel_type": rel,
                "url": batch.column("url"),
                "sent_idx": batch.column("sent_idx"),
            }
        )


_REWRITERS: dict[tuple, EdgeRewriter] = {}


def rewrite_edges_batch(batch: pa.Table, *, canonical_ref,
                        cfg=None) -> pa.Table:
    """Stateless-task wrapper with a process-global rewriter per map ref."""
    key = (canonical_ref.hex(), kb_cache_key(cfg))
    rw = _REWRITERS.get(key)
    if rw is None:
        _REWRITERS.clear()
        rw = EdgeRewriter(canonical_ref=canonical_ref, cfg=cfg)
        _REWRITERS[key] = rw
    return rw(batch)


_SIG_VOCAB: dict[str, object] = {}


def add_sigs_batch(batch: pa.Table, *, cfg=None) -> pa.Table:
    """triples → + (src_sig, dst_sig): the mention signature of each
    endpoint surface, resolved once per UNIQUE surface per batch
    (dictionary-encode) with a process-global vocab + memo."""
    key = kb_cache_key(cfg)
    st = _SIG_VOCAB.get(key)
    if st is None:
        if len(_SIG_VOCAB) > 4:
            _SIG_VOCAB.clear()
        st = {"dict": kb_vocab(cfg)[0], "memo": {}}
        _SIG_VOCAB[key] = st
    vocab, memo = st["dict"], st["memo"]

    def sig_col(col) -> pa.Array:
        if isinstance(col, pa.ChunkedArray):
            col = (col.chunk(0) if col.num_chunks == 1
                   else pa.concat_arrays(col.chunks) if col.num_chunks
                   else pa.array([], col.type))
        enc = col.dictionary_encode()
        vals = []
        for s in enc.dictionary.to_pylist():
            v = memo.get(s)
            if v is None:
                v = surface_sig(s, vocab)
                memo[s] = v
            vals.append(v)
        return pa.array(vals, pa.string()).take(enc.indices)

    batch = batch.append_column("src_sig", sig_col(batch.column("subj")))
    return batch.append_column("dst_sig", sig_col(batch.column("obj")))


def rewrite_edges_join(triples: rd.Dataset, sig_map: rd.Dataset,
                       nparts: int = 64, cfg=None) -> rd.Dataset:
    """The documented scale fallback for the canonical map (module doc
    §dataflow): when sig→canonical_id outgrows a broadcast, resolve edge
    endpoints via TWO co-partitioned shuffle hash joins against the
    decisions Dataset instead of shipping a driver dict to every worker.
    ``sig_map``: Dataset with (sig, canonical_id).  Missing sigs fail
    loudly (same contract as the broadcast ``EdgeRewriter``).  Join schemas
    are passed explicitly — ``Dataset.schema()`` on the lazy chain would
    re-execute it."""
    from ..stages.join import _arrow_types, shuffle_hash_join

    import functools

    tr = triples.map_batches(functools.partial(add_sigs_batch, cfg=cfg),
                             batch_format="pyarrow", zero_copy_batch=True)
    tr_types = dict(_arrow_types(triples))  # cheap: triples is materialized
    tr_types["src_sig"] = pa.string()
    tr_types["dst_sig"] = pa.string()
    map_types = {"sig": pa.string(), "canonical_id": pa.string()}

    def take_as(col_from: str, col_to: str):
        def f(batch: pa.Table) -> pa.Table:
            miss = pa.compute.sum(
                pa.compute.cast(pa.compute.is_null(batch.column(col_from)),
                                pa.int64())).as_py()
            if miss:
                raise KeyError(
                    f"{miss} edge endpoints missing from the canonical map "
                    "(decisions table does not cover the triples input)")
            cols = {c: batch.column(c) for c in batch.column_names
                    if c != col_from}
            cols[col_to] = batch.column(col_from)
            return pa.table(cols)

        return f

    j1 = shuffle_hash_join(tr, sig_map, on="src_sig", right_on="sig",
                           how="left", nparts=nparts,
                           ltypes=tr_types, rtypes=map_types)
    j1 = j1.map_batches(take_as("canonical_id", "src_id"),
                        batch_format="pyarrow")
    j1_types = {c: t for c, t in tr_types.items()}
    j1_types["src_id"] = pa.string()
    j2 = shuffle_hash_join(j1, sig_map, on="dst_sig", right_on="sig",
                           how="left", nparts=nparts,
                           ltypes=j1_types, rtypes=map_types)
    j2 = j2.map_batches(take_as("canonical_id", "dst_id"),
                        batch_format="pyarrow")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src_id": batch.column("src_id"),
            "dst_id": batch.column("dst_id"),
            "rel_type": batch.column("pred"),
            "url": batch.column("url"),
            "sent_idx": batch.column("sent_idx"),
        })

    return j2.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


def _edge_key(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    key = pc.binary_join_element_wise(
        batch.column("src_id"), batch.column("dst_id"),
        batch.column("rel_type"), "\x1f",
    )
    return batch.append_column("edge_key", key)


def _dedup_partial_edges(batch: pa.Table) -> pa.Table:
    """Per-batch combiner before the edge-key shuffle dedup: keep the first
    row per edge_key, vectorized (pandas hash dedup — the per-row
    ``.as_py()`` loop this replaces dominated the triples-proportional
    stage)."""
    df = batch.to_pandas()
    return pa.Table.from_pandas(df.drop_duplicates("edge_key"),
                                preserve_index=False)


_ROUND2_ENC_MEMO: dict = {}

# below this many rows a round-2 pass stays driver-serial (task latency
# would exceed the win); tests pin it to force either path
ROUND2_FANOUT_MIN = 4000


def _round2_encoder(cfg: EngineConfig):
    """Process-global encoder memo — warm round-2 tasks pay encoder
    construction once per worker process, not once per chunk."""
    key = (cfg.encoder, cfg.embedding_dim)
    enc = _ROUND2_ENC_MEMO.get(key)
    if enc is None:
        from ..functions.encoder import make_encoder

        enc = _ROUND2_ENC_MEMO.setdefault(
            key, make_encoder(cfg.encoder, cfg.embedding_dim))
    return enc


def _round2_chunk_edges(m_cols: list, payload: dict,
                        cfg: EngineConfig) -> tuple[list, int]:
    """Score one contiguous chunk of round-2 mentions against the shared
    created-entity KB payload → (merge edges, dropped-pair mass).

    Pure function of its inputs, so chunking is a placement decision:
    the union of chunk edge lists over contiguous slices is EXACTLY the
    serial single-chunk result (equivalence pytest).  KB embed texts
    encode LAZILY per chunk (never-candidate rows never encode) and KB
    toksets build lazily — the duplicated work across chunks is bounded
    by what each chunk actually touches."""
    import numpy as np

    from ..functions.scoring import (
        bge_prefilter_floor,
        comprehensive_score,
        type_multiplier,
    )
    from ..functions.textbuild import embed_text as _etext
    from ..functions.textbuild import rerank_text as _rtext

    kb_ids = payload["ids"]
    kb_names = payload["names"]
    kb_types = payload["types"]
    kb_aliases = payload["aliases"]
    kb_rtexts = payload["rtexts"]
    kb_texts = payload["etexts"]
    tok_index = payload["tok_index"]
    hot_df = payload["hot_df"]
    prune_ok = payload["prune_ok"]

    enc = _round2_encoder(cfg)
    bge_floor = bge_prefilter_floor(cfg)
    nkb = len(kb_ids)
    kb_mat = np.zeros((nkb, cfg.embedding_dim), dtype=np.float32)
    kb_encoded = np.zeros(nkb, dtype=bool)
    kb_tokset_cache: dict[int, set] = {}

    def ensure_encoded(ks: np.ndarray) -> None:
        new = ks[~kb_encoded[ks]]
        if len(new):
            kb_mat[new] = enc.encode([kb_texts[i] for i in new])
            kb_encoded[new] = True

    def tokset(k: int) -> set:
        s = kb_tokset_cache.get(k)
        if s is None:
            s = kb_tokset_cache.setdefault(k, set(kb_rtexts[k].split()))
        return s

    kb_idx_of = {eid: k for k, eid in enumerate(kb_ids)}
    all_ids = set(range(nkb))
    w_b, w_c, w_f, w_l = cfg.weights()
    ce_exact = cfg.reranker != "cross_encoder"  # hash_ce==jaccard; none==0
    edges: list[tuple[str, str]] = []
    dropped_pair_mass = 0
    for name, mtype, aliases_json, definition, attributes, self_id in zip(
            *m_cols):
        aliases = json.loads(aliases_json)
        rtext = _rtext(name, aliases, definition)
        mtoks = set(rtext.split())
        if prune_ok:
            cand_ids: set[int] = set()
            for t in mtoks:
                ids = tok_index.get(t, ())
                if t in hot_df:
                    dropped_pair_mass += len(ids)
                    continue
                cand_ids.update(ids)
        else:
            cand_ids = set(all_ids)
        cand_ids.discard(kb_idx_of.get(self_id, -1))
        if not cand_ids:
            continue
        # embed lazily: only mentions with surviving candidates pay it
        mvec = enc.encode([_etext(name, aliases, definition, attributes)])[0]
        ks = np.fromiter(cand_ids, dtype=np.int64, count=len(cand_ids))
        ks.sort()
        ensure_encoded(ks)
        # tiered EXACT prefilters — each bounds the max achievable final
        # score; the expensive fuzz/lev string cascade runs only for pairs
        # that could still reach high_threshold:
        #   tier 1 (vectorized): bge floor with ce/fuzz/lev at their max
        #   tier 2: the pair's actual type multiplier
        #   tier 3: the pair's actual ce (token jaccard == hash_ce; 0 for
        #           reranker="none"; skipped for a real CE, unbounded)
        bges = kb_mat[ks] @ mvec
        keep = bges >= bge_floor
        for k, bge in zip(ks[keep], bges[keep]):
            mult = type_multiplier(mtype, kb_types[k], cfg)
            if (w_b * bge + w_c + w_f + w_l) * mult < cfg.high_threshold:
                continue
            if ce_exact:
                kt = tokset(k)
                un = len(mtoks | kt)
                ce = (len(mtoks & kt) / un) if un else 0.0
                if cfg.reranker == "none":
                    ce = 0.0
                if (w_b * bge + w_c * ce + w_f + w_l) * mult \
                        < cfg.high_threshold:
                    continue
            s = comprehensive_score(
                name, aliases, mtype, rtext,
                kb_names[k], kb_aliases[k], kb_types[k],
                kb_rtexts[k], float(bge), cfg)
            if s.final_score >= cfg.high_threshold:
                edges.append((self_id, kb_ids[k]))
    return edges, dropped_pair_mass


@ray.remote
def _round2_chunk_task(m_cols: list, payload: dict,
                       cfg: EngineConfig) -> tuple[list, int]:
    return _round2_chunk_edges(m_cols, payload, cfg)


def _round2_prep_chunk(cre_cols: list) -> tuple:
    """Per-row KB payload prep for one contiguous chunk of created
    entities: alias parse + rerank/embed text builds + distinct-token
    lists.  Pure per-row transforms — chunking is placement only."""
    from ..functions.textbuild import embed_text as _etext
    from ..functions.textbuild import rerank_text as _rtext

    ids, names, types, aliases, rtexts, etexts, toks = \
        [], [], [], [], [], [], []
    for cid, name, typ, aj, definition, attrs in zip(*cre_cols):
        al = json.loads(aj)
        rt = _rtext(name, al, definition)
        ids.append(cid)
        names.append(name)
        types.append(typ)
        aliases.append(al)
        rtexts.append(rt)
        etexts.append(_etext(name, al, definition, attrs))
        toks.append(sorted(set(rt.split())))
    return ids, names, types, aliases, rtexts, etexts, toks


_round2_prep_task = ray.remote(_round2_prep_chunk)


def round2_canonicalize(dec_df: pd.DataFrame,
                        cfg: EngineConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """Round-2 canonicalization: created entities scored against each other
    (blocked candidate gen with self-exclusion), ``merge`` pairs become
    union-find edges, and each component canonicalizes to the member whose
    first corpus occurrence is earliest — the order-free equivalent of the
    reference's online "first create wins, later duplicates merge into it"
    behavior (SURVEY.md §2.9).

    Runs on the driver-resident decisions table (small by construction);
    ``state.unionfind.distributed_components`` is the drop-in replacement
    when distinct mentions outgrow driver memory."""
    created = dec_df[dec_df["decision"] == "create"]
    cand = dec_df[dec_df["decision"] != "merge"]
    if len(created) < 2 or cand.empty:
        return dec_df

    if len(cand) > 200_000:
        # beyond comfortable driver-side indexing: the same exact candidate
        # rule as Ray dataflow (pipelines/round2.py, equivalence-tested)
        from .round2 import distributed_round2_edges

        e = distributed_round2_edges(rd.from_pandas(dec_df.reset_index(drop=True)),
                                     cfg)
        return apply_merge_edges(dec_df, list(zip(e["a"], e["b"])))

    cre_cols = [created[c].tolist() for c in
                ("canonical_id", "name", "type", "aliases_json",
                 "definition", "attributes")]
    # Candidate generation for round 2 uses a token-overlap inverted index
    # over M1 rerank texts: under the default weights a merge needs
    # final >= 0.72, and with bge, fuzz, lev <= 1 that forces
    # cross_encoder_score > 0, i.e. at least one shared M1 token — so pairs
    # with disjoint token sets (the random-novel-name mass) are provably
    # non-merges and are never scored or even embedded.  That invariant
    # (scoring.token_prune_exact) depends on the weight configuration;
    # when an ED_RAY_* override breaks it, fall back to unpruned all-pairs
    # generation (bounded) instead of silently losing merges.
    #
    # Hot tokens stay pair generators up to ROUND2_DF_HARD (per-mention cost
    # is one dot product per candidate thanks to the bge prefilter below);
    # only tokens beyond that hard cap are dropped, with the dropped pair
    # mass counted and logged — pairs sharing ONLY such head-vocabulary
    # tokens can in principle merge, so the drop is an explicit recall
    # trade-off, not "noise".
    from collections import defaultdict

    from ..functions.scoring import token_prune_exact
    from .round2 import ROUND2_DF_HARD

    prune_ok = token_prune_exact(cfg)
    if not prune_ok and len(created) > 20_000:
        raise ValueError(
            "round-2 token-overlap prune is not exact under this config "
            f"((bge+fuzz+lev weights)*max_multiplier >= high_threshold="
            f"{cfg.high_threshold}) and the created-entity set "
            f"({len(created)}) is too large for unpruned all-pairs scoring; "
            "restore default weights or disable round2_dedup")

    # Both round-2 passes were the flagship's last DRIVER-SERIAL steps
    # (~1.3 s combined at 400k pages while every worker idles — the
    # round-4 scaling residual).  Beyond a small threshold each fans out
    # as contiguous chunks over warm stateless tasks (the ann.py
    # _topk_partial discipline: ray.put the shared payload once, no actor
    # pool).  Chunk outputs concatenate in slice order, so both passes are
    # IDENTICAL to the serial path (equivalence pytest) — placement only.
    n_kb = len(cre_cols[0])

    def _fanout(n_rows: int) -> int:
        if n_rows < ROUND2_FANOUT_MIN or not ray.is_initialized():
            return 1
        try:
            return min(16, max(1, int(
                ray.cluster_resources().get("CPU", 1))), n_rows // 1000)
        except Exception:
            return 1

    # ---- pass 1: per-row KB payload prep (alias parse, text builds) ----
    n_prep = _fanout(n_kb)
    if n_prep > 1:
        step = -(-n_kb // n_prep)
        preps = ray.get([
            _round2_prep_task.remote([c[i:i + step] for c in cre_cols])
            for i in range(0, n_kb, step)
        ])
        kb_ids, kb_names, kb_types, kb_aliases, kb_rtexts, kb_etexts, \
            kb_toks = (sum((p[j] for p in preps), []) for j in range(7))
    else:
        kb_ids, kb_names, kb_types, kb_aliases, kb_rtexts, kb_etexts, \
            kb_toks = _round2_prep_chunk(cre_cols)

    tok_index: dict[str, list[int]] = defaultdict(list)
    for k, toks in enumerate(kb_toks):
        for t in toks:
            tok_index[t].append(k)
    hot_df = {t for t, ids in tok_index.items() if len(ids) > ROUND2_DF_HARD}

    # lazily-filled KB matrix inside each chunk: rows encode in BATCHES
    # the first time they appear in any candidate set (never-candidate
    # rows never encode) — both the eager whole-KB encode and the per-row
    # python cache assembly measured slower at 400k pages
    payload = {
        "ids": kb_ids,
        "names": kb_names,
        "types": kb_types,
        "aliases": kb_aliases,
        "rtexts": kb_rtexts,
        "etexts": kb_etexts,
        "tok_index": dict(tok_index),
        "hot_df": hot_df,
        "prune_ok": prune_ok,
    }
    m_cols = [cand[c].tolist() for c in
              ("name", "type", "aliases_json", "definition", "attributes",
               "canonical_id")]

    # ---- pass 2: mention-vs-KB candidate scoring ------------------------
    n_m = len(m_cols[0])
    n_chunks = _fanout(n_m)
    if n_chunks > 1:
        ref = ray.put(payload)
        step = -(-n_m // n_chunks)
        futs = [
            _round2_chunk_task.remote(
                [c[i:i + step] for c in m_cols], ref, cfg)
            for i in range(0, n_m, step)
        ]
        parts = ray.get(futs)
        edges = [e for p in parts for e in p[0]]
        dropped_pair_mass = sum(p[1] for p in parts)
    else:
        edges, dropped_pair_mass = _round2_chunk_edges(m_cols, payload, cfg)
    if dropped_pair_mass:
        import logging

        logging.getLogger(__name__).warning(
            "round-2 dropped %d candidate-pair slots via tokens with "
            "df > %d — merges relying ONLY on such head tokens are missed",
            dropped_pair_mass, ROUND2_DF_HARD)

    return apply_merge_edges(dec_df, edges)


def apply_merge_edges(dec_df: pd.DataFrame,
                      edges: list[tuple[str, str]]) -> pd.DataFrame:
    """Union-find over merge edges + first-occurrence representative
    selection + canonical remap — shared by the driver-side token-index
    round-2 and the distributed one (pipelines/round2.py)."""
    from ..state.unionfind import UnionFind

    if not len(edges):
        return dec_df
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    comp = uf.components()

    # representative = member with earliest first_occ among creates.
    # NB: groupby(...).min() on an OBJECT (string) column falls back to a
    # pure-python per-group aggregation — profiled at 2 s of the serial
    # driver canonicalize at 400k pages; sort + drop_duplicates is the
    # C-vectorized equivalent (first row after a stable sort = group min)
    created = dec_df[dec_df["decision"] == "create"]
    occ = (created[["canonical_id", "first_occ"]]
           .sort_values(["canonical_id", "first_occ"], kind="mergesort")
           .drop_duplicates("canonical_id")
           .set_index("canonical_id")["first_occ"])
    rep: dict[str, str] = {}
    for node, root in comp.items():
        cur = rep.get(root)
        if cur is None or (occ.get(node, "￿"), node) < (occ.get(cur, "￿"), cur):
            rep[root] = node
    remap = {node: rep[root] for node, root in comp.items()}
    out = dec_df.copy()
    out["canonical_id"] = out["canonical_id"].map(lambda c: remap.get(c, c))
    return out


def _cast_to_types(types: dict):
    """map_batches normalizer: enforce the declared Arrow types.  Coarse
    partitioned shuffles round-trip blocks through pandas, and EMPTY
    partitions come back with degraded dtypes (object → Arrow null) that
    poison downstream schema unification / sorts — casting is a no-op for
    healthy blocks and heals the empties."""
    def f(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in types.items():
            col = batch.column(name)
            cols[name] = col if col.type == typ else col.cast(typ)
        return pa.table(cols)

    return f


def _remap_decisions_distributed(dec: rd.Dataset, edges_ds: rd.Dataset,
                                 nparts: int = 64) -> rd.Dataset:
    """Dataset-resident equivalent of ``apply_merge_edges``: merge edges →
    connected components (``distributed_components``, labels stay a
    Dataset) → per-component representative = member with the earliest
    created ``first_occ`` (tie-break: smaller id — the exact driver
    ordering ``(occ.get(node, '￿'), node)``) → decisions' canonical_id
    remapped via one left shuffle join.  The driver never sees a label map,
    an edge list or the decisions table."""
    import pyarrow.compute as pc

    from ..stages.join import pad_union, shuffle_hash_join
    from ..stages.partition import partitioned_groupby
    from ..state.unionfind import components_auto

    comps = components_auto(edges_ds, nparts=nparts)

    # occ: per-batch min-first_occ combiner over CREATED rows (tiny —
    # one row per (batch, canonical_id); the keyed reduction happens inside
    # the fused cogroup below, not as its own shuffle)
    def created_occ_partial(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.equal(batch.column("decision"), "create"))
        tbl = pa.table({"node": kept.column("canonical_id"),
                        "occ": kept.column("first_occ")})
        agg = tbl.group_by("node").aggregate([("occ", "min")])
        return pa.table({"node": agg.column("node"),
                         "occ": agg.column("occ_min")})

    occ = dec.map_batches(created_occ_partial, batch_format="pyarrow",
                          zero_copy_batch=True)

    # Fused remap (round-3 finding: this chain was 2 partitioned_groupbys +
    # 2 shuffle joins + a left join, and its fixed shuffle-round latency
    # made distributed canonicalization 2x driver mode at 1M pages).  Now:
    #   stage A — ONE shuffle keyed node: cogroup comps labels with occ
    #     partials (pad_union side tag); per node: component label from
    #     comps, occ = min over partials, "￿" sentinel when the member has
    #     no created row (same collation as the driver path);
    #   stage B — ONE shuffle keyed canonical: representative = first
    #     (occ, node) member, emitted as the full (node, rep) remap via a
    #     per-group transform — reps and the reps⋈members join collapse
    #     into one kernel.
    st = {"node": pa.string(), "canonical": pa.string()}
    ot = {"node": pa.string(), "occ": pa.string()}
    u = pad_union(comps, occ, a_types=st, b_types=ot)

    def attach_occ(df: pd.DataFrame) -> pd.DataFrame:
        is_c = df["_side"] == 0
        cdf = df[is_c]
        odf = df[~is_c]
        # sort+dedup, NOT groupby().min(): string-column group-min is a
        # pure-python pandas fallback (see apply_merge_edges note)
        occ_min = (odf[["node", "occ"]]
                   .sort_values(["node", "occ"], kind="mergesort")
                   .drop_duplicates("node").set_index("node")["occ"])
        o = cdf["node"].map(occ_min).fillna("￿")
        return pd.DataFrame({"node": cdf["node"].to_numpy(),
                             "canonical": cdf["canonical"].to_numpy(),
                             "occ": o.to_numpy()})

    j = partitioned_groupby(u, "node", attach_occ, nparts=nparts)

    def rep_and_remap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["canonical", "occ", "node"], kind="mergesort")
        rep = df.groupby("canonical", sort=False)["node"].transform("first")
        return pd.DataFrame({"node": df["node"].to_numpy(),
                             "rep": rep.to_numpy()})

    remap = partitioned_groupby(j, "canonical", rep_and_remap, nparts=nparts)

    from ..stages.disambiguate import DECISION_SCHEMA

    dtypes = dict(zip(DECISION_SCHEMA.names, DECISION_SCHEMA.types))
    mt = {"node": pa.string(), "rep": pa.string()}
    dec2 = shuffle_hash_join(dec, remap, on="canonical_id", right_on="node",
                             nparts=nparts, ltypes=dtypes, rtypes=mt,
                             how="left")

    def apply_rep(batch: pa.Table) -> pa.Table:
        rep = batch.column("rep")
        canon = pc.if_else(pc.is_null(rep), batch.column("canonical_id"), rep)
        cols = {c: batch.column(c) for c in DECISION_SCHEMA.names}
        cols["canonical_id"] = canon
        return pa.table(cols)

    return dec2.map_batches(apply_rep, batch_format="pyarrow") \
        .map_batches(_cast_to_types(dtypes), batch_format="pyarrow",
                     zero_copy_batch=True)


_ENTITY_CREATE_TIME = pd.Timestamp("2024-06-01")


def _entities_from_created(created: pd.DataFrame) -> pd.DataFrame:
    """Representative created rows → entity-table rows (shared projection
    of the driver and distributed entity builds)."""
    return pd.DataFrame({
        "id": created["canonical_id"],
        "name": created["name"],
        "type": created["type"],
        "aliases": created["aliases_json"].map(
            lambda s: json.loads(s) if isinstance(s, str) else []),
        "definition": created["definition"],
        "attributes": created["attributes"],
        "source": "pipeline-created",
        "create_time": _ENTITY_CREATE_TIME,
    })


def _not_owner_flags(created: pd.DataFrame) -> list[bool]:
    from ..functions.hashing import generate_entity_id as _gen_id

    return [cid != _gen_id(n, t)
            for cid, n, t in zip(created["canonical_id"], created["name"],
                                 created["type"])]


def build_entities_ds(dec: rd.Dataset, nparts: int = 64,
                      cfg=None) -> rd.Dataset:
    """Distributed entity-table build: one coarse keyed dedup on
    canonical_id (representative = owner mention first, then earliest
    corpus occurrence, then sig — the exact driver ordering), projected to
    the entity schema and unioned with the (tiny) seed KB, seed winning id
    collisions.  Replaces the pandas build in ``run_kg_pipeline`` for
    beyond-driver decision tables."""
    import pyarrow.compute as pc

    from ..stages.partition import dedup_first, partitioned_groupby

    created = dec.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("decision"), "merge")),
        batch_format="pyarrow", zero_copy_batch=True)

    # aliases ride through the keyed dedup as JSON STRINGS (list-valued
    # cells don't survive the pandas-block round trip of the coarse
    # partitioned shuffle); the list<string> column is materialized in the
    # final Arrow projection below
    def rep_per_canonical(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_not_owner=_not_owner_flags(df))
        df = df.sort_values(["canonical_id", "_not_owner", "first_occ",
                             "sig"], kind="mergesort")
        df = df.drop_duplicates("canonical_id")
        return pd.DataFrame({
            "id": df["canonical_id"].to_numpy(),
            "name": df["name"].to_numpy(),
            "type": df["type"].to_numpy(),
            "aliases_json": df["aliases_json"].to_numpy(),
            "definition": df["definition"].to_numpy(),
            "attributes": df["attributes"].to_numpy(),
            "source": "pipeline-created",
            "create_time": _ENTITY_CREATE_TIME,
            "_prio": 1,
        })

    created_ents = partitioned_groupby(created, "canonical_id",
                                       rep_per_canonical, nparts=nparts)
    seed_df = pd.DataFrame(kb_entities_table(cfg))
    seed_df["aliases_json"] = seed_df["aliases"].map(
        lambda a: json.dumps(list(a), ensure_ascii=False))
    seed_df = seed_df.drop(columns=["aliases"]).assign(_prio=0)
    # normalize both sides to Arrow blocks with one declared schema (heals
    # the empty-partition dtype degradation, identical column order)
    ent_types = {
        "id": pa.string(), "name": pa.string(), "type": pa.string(),
        "aliases_json": pa.string(), "definition": pa.string(),
        "attributes": pa.string(), "source": pa.string(),
        "create_time": pa.timestamp("ns"), "_prio": pa.int64(),
    }
    created_ents = created_ents.map_batches(
        _cast_to_types(ent_types), batch_format="pyarrow")
    seed_ds = rd.from_pandas(seed_df[list(ent_types)]).map_batches(
        _cast_to_types(ent_types), batch_format="pyarrow")
    ents = dedup_first(seed_ds.union(created_ents), "id",
                       nparts=max(8, nparts // 4), sort_by=["_prio"])
    ents = ents.map_batches(_cast_to_types(ent_types),
                            batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        aliases = pa.array(
            [json.loads(s) if isinstance(s, str) and s else []
             for s in batch.column("aliases_json").to_pylist()],
            pa.list_(pa.string()))
        return pa.table({
            "id": batch.column("id"),
            "name": batch.column("name"),
            "type": batch.column("type"),
            "aliases": aliases,
            "definition": batch.column("definition"),
            "attributes": batch.column("attributes"),
            "source": batch.column("source"),
            "create_time": batch.column("create_time"),
        })

    return ents.map_batches(finish, batch_format="pyarrow")


def _adaptive_nparts(n_rows: int, rows_per_part: int = 100_000,
                     lo: int = 8, hi: int = 256) -> int:
    """Partition count sized to the DATA, not a constant: each coarse
    partition targets ~``rows_per_part`` rows.  Oversized nparts on small
    inputs costs a fixed scheduling latency per empty partition (measured:
    the 20k-page distributed canonicalization dropped 75→38 s when its
    shuffles went from 64 fixed to size-matched partitions); undersized
    nparts on big inputs blows per-partition memory.  ``hi`` caps driver
    bookkeeping; at true cluster scale callers pass a larger cap."""
    return max(lo, min(hi, -(-n_rows // rows_per_part)))


def canonicalize_distributed(triples: rd.Dataset, decisions: rd.Dataset,
                             cfg: EngineConfig = DEFAULT_CONFIG,
                             nparts: int | None = None) -> dict:
    """Fully Dataset-resident canonicalization + rewrite: the flagship's
    scale path (VERDICT r2 #1).  decisions stay a Dataset through (1) the
    sig dedup, (2) round-2 merge-edge generation
    (``distributed_round2_edges(collect=False)``), (3) components +
    representative remap (``_remap_decisions_distributed``), (4) the edge
    rewrite (broadcast of the bounded two-column sig map while it fits
    ``cfg.canonical_map_broadcast_max``; two shuffle joins
    (``rewrite_edges_join``) beyond) and (5) the entity build
    (``build_entities_ds``).  The driver sees only counts and the bounded
    sig-map projection.  Scales
    the reference's whole /auto-decide KB loop
    (services/disambiguation.py:120-166); byte-identical to the driver path
    (pytest equivalence in tests/test_kg_distributed.py)."""
    from ..stages.disambiguate import DECISION_SCHEMA
    from .round2 import distributed_round2_edges

    dtypes = dict(zip(DECISION_SCHEMA.names, DECISION_SCHEMA.types))
    # decisions-proportional shuffles size to the decision count, the edge
    # rewrite to the triple count.  decisions is pinned first: the count
    # and the dedup are two consumers, and re-running the disambiguation
    # lineage per consumer would double the most expensive stage (triples
    # is already materialized/parquet-backed in both runners).
    decisions = decisions.materialize()
    np_dec = nparts or _adaptive_nparts(decisions.count())
    dec = dedup_first(decisions, "sig", nparts=np_dec,
                      sort_by=["first_occ"]) \
        .map_batches(_cast_to_types(dtypes), batch_format="pyarrow",
                     zero_copy_batch=True).materialize()
    if cfg.round2_dedup:
        # the pair stage is compute-bound per token group, not
        # row-volume-bound: give it at least cluster-width parallelism even
        # when the decisions table is small (np_dec adapts to ROWS)
        edges_r2 = distributed_round2_edges(
            dec, cfg, collect=False, nparts=max(np_dec, 32)).materialize()
        if edges_r2.count():
            dec = _remap_decisions_distributed(dec, edges_r2,
                                               nparts=np_dec).materialize()
    sig_map = dec.select_columns(["sig", "canonical_id"])
    np_tr = nparts or _adaptive_nparts(triples.count())
    n_dec = dec.count()
    if n_dec <= cfg.canonical_map_broadcast_max:
        # the sig→canonical map is PROVABLY bounded (n_dec known) — use the
        # same broadcast rewrite as driver mode: the join variant's cost is
        # TRIPLES-proportional (measured: 1M pages spent ~2 min joining
        # 5.7M triples against a 21k-row map that fits in one object).
        # Only the two-column projection is collected, never the decisions.
        map_df = sig_map.to_pandas()
        map_ref = ray.put(dict(zip(map_df["sig"], map_df["canonical_id"])))

        import functools

        edges_raw = triples.map_batches(
            functools.partial(rewrite_edges_batch, canonical_ref=map_ref,
                              cfg=cfg),
            batch_format="pyarrow", batch_size=cfg.score_batch_size)
    else:
        edges_raw = rewrite_edges_join(triples, sig_map, nparts=np_tr,
                                       cfg=cfg)
    edges = _dedup_edges(edges_raw, nparts=np_tr)
    entities = build_entities_ds(dec, nparts=np_dec, cfg=cfg)
    return {"decisions_ds": dec, "edges": edges, "entities_ds": entities}


def _dedup_edges(edges_raw: rd.Dataset, nparts: int = 64) -> rd.Dataset:
    """Exact (src, dst, rel) edge dedup: per-batch combiner + one coarse
    keyed shuffle (shared by the driver and distributed rewrites)."""
    edges = (
        edges_raw.map_batches(_edge_key, batch_format="pyarrow",
                              zero_copy_batch=True)
        .select_columns(["edge_key", "src_id", "dst_id", "rel_type"])
        .map_batches(_dedup_partial_edges, batch_format="pyarrow",
                     zero_copy_batch=True)
    )
    return dedup_first(edges, "edge_key", nparts=nparts).select_columns(
        ["src_id", "dst_id", "rel_type"])


def make_decisions(triples: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG,
                   concurrency: int | tuple = (1, 4),
                   n_triples: int | None = None) -> rd.Dataset:
    """triples → mentions → unique-mention collapse → per-mention decisions,
    honoring ``cfg.candidate_gen`` (global broadcast KB vs blocked
    co-partitioned KB) — shared by the in-memory and checkpointed runs.

    ``n_triples``: optional row count for sizing the unique-mention dedup
    shuffle (both runners call with MATERIALIZED / parquet-backed triples,
    where count() is a metadata read).  The per-batch combiner leaves far
    fewer partial rows than mentions, so partitions are sized to a
    conservative fraction of the triple count — a fixed 64 partitions
    wasted ~1.4 s of scheduling latency per run at 400k pages while
    undersizing nothing (measured partial volume: 184k rows)."""
    if n_triples is None:
        try:  # cheap for materialized / parquet-backed inputs
            n_triples = triples.count()
        except Exception:
            n_triples = None
    # floor = cluster width: row-proportional sizing alone starves wide
    # hosts (8 reduce tasks on 32 cores measured 0.7 s slower end to end
    # than 64), while row-blind 64 wastes scheduling latency on narrow
    # ones — partitions scale with BOTH data and cluster
    try:
        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    nparts = (_adaptive_nparts(n_triples, rows_per_part=250_000,
                               lo=ncpu) if n_triples else 64)
    mentions = mentions_stage(triples, cfg)
    uniq = unique_mentions_stage(mentions, nparts=nparts)
    if cfg.candidate_gen == "blocked":
        from ..stages.candidates import blocked_decisions

        return blocked_decisions(uniq, kb_entities(cfg), cfg)
    return decisions_stage(uniq, cfg, concurrency)


def canonicalize_and_rewrite(triples: rd.Dataset, decisions: rd.Dataset,
                             cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    """decisions → canonical edges + final decisions + entities.

    Two equivalence-tested execution modes (``cfg.canonicalize``):

    - **driver** — collect + dedup the (KB-proportional) decisions table,
      round-2 canonicalization in memory, then the sig→canonical edge
      rewrite: broadcast below ``cfg.canonical_map_broadcast_max`` rows,
      shuffle hash joins beyond.  Returns ``{"decisions_df", "edges",
      "entities_df"}``.
    - **distributed** — ``canonicalize_distributed``: decisions never leave
      the Datasets (sig dedup → Dataset round-2 edges → components +
      representative remap → join rewrite → distributed entity build).
      Returns ``{"decisions_ds", "edges", "entities_ds"}``.
    - **auto** (default) — driver while the decision count fits
      ``cfg.canonicalize_driver_max``, distributed beyond.

    Shared by ``run_kg_pipeline`` and the checkpointed runner so the two
    runners cannot drift.

    Residual duplicate sigs from the shuffle-free unique stage
    (exact=False) agree in every content column but carry per-batch
    first_occ minima — both modes keep the global-min occurrence row per
    sig regardless of block arrival order (round-2 representative
    selection depends on it)."""
    mode = cfg.canonicalize
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"canonicalize must be auto|driver|distributed, "
                         f"got {mode!r}")
    if mode == "auto":
        decisions = decisions.materialize()
        mode = ("driver" if decisions.count() <= cfg.canonicalize_driver_max
                else "distributed")
    if mode == "distributed":
        return canonicalize_distributed(triples, decisions, cfg)

    dec_df = decisions.to_pandas()
    dec_df = (dec_df.sort_values(["sig", "first_occ"], kind="mergesort")
              .drop_duplicates("sig").reset_index(drop=True))
    if cfg.round2_dedup:
        dec_df = round2_canonicalize(dec_df, cfg)
    if len(dec_df) > cfg.canonical_map_broadcast_max:
        # scale fallback: sig→canonical resolved by shuffle hash joins
        # instead of a broadcast dict (equivalence-tested; module doc)
        sig_map = rd.from_pandas(
            dec_df[["sig", "canonical_id"]].reset_index(drop=True))
        edges_raw = rewrite_edges_join(triples, sig_map, cfg=cfg)
    else:
        canonical_map = dict(zip(dec_df["sig"], dec_df["canonical_id"]))
        map_ref = ray.put(canonical_map)

        import functools

        edges_raw = triples.map_batches(
            functools.partial(rewrite_edges_batch, canonical_ref=map_ref,
                              cfg=cfg),
            batch_format="pyarrow", batch_size=cfg.score_batch_size,
        )
    edges = _dedup_edges(edges_raw)
    return {"decisions_df": dec_df, "edges": edges,
            "entities_df": build_entities_df(dec_df, cfg)}


def build_entities_df(dec_df: pd.DataFrame, cfg=None) -> pd.DataFrame:
    """Driver-side entity table: seed KB ∪ created entities (dedup by
    canonical_id, deterministic first-by-(owner, first_occ, sig) — the
    reference's MERGE-upsert last-wins semantics collapse to first-wins
    under a stable sort, SURVEY.md S6).  ``build_entities_ds`` is the
    Dataset-resident equivalent (identical ordering rules)."""
    created = dec_df[dec_df["decision"] != "merge"].copy()
    # representative row per canonical id: prefer the OWNER mention (the one
    # whose name/type actually derive the id — M12 contract id ==
    # generate_entity_id(name, type); round-2 remapping can attach other
    # mentions' rows to this id), then earliest corpus occurrence, then sig —
    # deterministic and parallelism-stable
    created["_not_owner"] = _not_owner_flags(created)
    created = created.sort_values(
        ["canonical_id", "_not_owner", "first_occ", "sig"], kind="mergesort")
    created = created.drop_duplicates("canonical_id").drop(
        columns=["_not_owner"])
    seed_df = pd.DataFrame(kb_entities_table(cfg))
    entities = pd.concat([seed_df, _entities_from_created(created)],
                         ignore_index=True)
    return entities.drop_duplicates("id", keep="first")


def run_kg_pipeline(pages: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG,
                    concurrency: int | tuple = (1, 4)) -> dict:
    """Full pipeline.

    ``concurrency`` only sizes ACTOR-POOL stages (``decisions_stage(...,
    use_actors=True)`` for model-backed encoders); the default stateless-task
    stages scale with the cluster's CPUs and ignore it.  Returns dict of
    result Datasets / frames: ``triples`` (url-level provenance edges),
    ``edges`` (deduped canonical triples), ``decisions`` (unique-mention
    audit log = the reference's DisambiguationHistory, SURVEY.md S10), and —
    mode-dependent (``cfg.canonicalize``) — ``decisions_df``/``entities_df``
    (driver mode, pandas) or ``decisions_ds``/``entities_ds`` (distributed
    mode, Datasets)."""
    extracted = extract_stage(pages, cfg)
    triples = triples_stage(extracted, cfg)
    # Two consumers read `triples` (mention path and edge-rewrite path);
    # pin the post-extraction dataset (orders of magnitude smaller than the
    # html input — SURVEY.md §7.4 "keep html out of post-extract stages")
    # instead of re-running extraction per consumer.  The checkpointing mode
    # (state/checkpoint.py) writes triples to partitioned parquet and reads
    # them back, which also makes this the resume point.
    triples = triples.materialize()
    decisions = make_decisions(triples, cfg, concurrency)
    out = canonicalize_and_rewrite(triples, decisions, cfg)
    out["extracted"] = extracted
    out["triples"] = triples
    out["decisions"] = decisions
    return out


def run_kg_incremental(pages: rd.Dataset, prior_entities_path: str,
                       cfg: EngineConfig = DEFAULT_CONFIG,
                       concurrency: int | tuple = (1, 4)) -> dict:
    """Incremental run: disambiguate ``pages`` against a PRIOR run's emitted
    entities table instead of the seed corpus — the batch equivalent of the
    reference's KB growing across /auto-decide requests
    (disambiguation.py:120-166; each request searches the index the previous
    requests extended).  ``prior_entities_path`` is write_graph_outputs'
    ``{out_dir}/entities``; the returned outputs' entities table is the
    UPDATED KB (prior ∪ newly created), so runs chain:

        out1 = run_kg_pipeline(batch1); p1 = write_graph_outputs(out1, d1)
        out2 = run_kg_incremental(batch2, p1["entities"])

    Mentions matching an entity created in an earlier batch now MERGE into
    it (match_id = the prior id) instead of re-creating it."""
    import dataclasses

    cfg = dataclasses.replace(cfg, kb_path=prior_entities_path)
    return run_kg_pipeline(pages, cfg, concurrency)


def write_graph_outputs(out: dict, out_dir: str) -> dict:
    """Graph materialization (SURVEY.md S6/S7/S10): entities, canonical
    edges and the decisions audit log as sorted Parquet directories —
    ``{out_dir}/{edges,entities,decisions}/``.  One directory per table so
    a rerun overwrites a table atomically-enough for batch use; the
    checkpointed pipeline (pipelines/checkpointed.py) adds per-partition
    manifests on top for mid-run resume."""
    import os

    paths = {}
    edges_dir = os.path.join(out_dir, "edges")
    out["edges"].sort(["src_id", "dst_id", "rel_type"]).write_parquet(edges_dir)
    paths["edges"] = edges_dir

    ents_dir = os.path.join(out_dir, "entities")
    if "entities_df" in out:
        ents = rd.from_pandas(
            out["entities_df"].sort_values("id").reset_index(drop=True))
    else:  # distributed canonicalization: already a Dataset
        ents = out["entities_ds"].sort("id")
    ents.write_parquet(ents_dir)
    paths["entities"] = ents_dir

    dec_dir = os.path.join(out_dir, "decisions")
    if "decisions_df" in out:
        dec = rd.from_pandas(
            out["decisions_df"].sort_values("sig").reset_index(drop=True))
    else:
        dec = out["decisions_ds"].sort("sig")
    dec.write_parquet(dec_dir)
    paths["decisions"] = dec_dir
    return paths


def export_neo4j_bulk(out: dict, out_dir: str) -> dict:
    """Neo4j bulk-import export of the constructed graph — the sink a
    reference user migrating off the live Neo4j store
    (/root/reference/services/neo4j_database.py:120-166, entity/edge
    CREATE path) actually loads: ``neo4j-admin database import`` CSV
    layout with ONE driver-written header file per table plus HEADERLESS
    distributed part files (the documented bulk-import contract —
    ``--nodes=header.csv,part-*.csv``), so the export parallelizes and
    never funnels rows through the driver.

    Layout: ``{out_dir}/nodes.header.csv`` + ``{out_dir}/nodes/part-*``,
    same for ``relationships``, plus ``IMPORT.txt`` with the exact
    neo4j-admin invocation.  Returns the path dict."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _headerless():  # WriteOptions is not picklable; build per worker
        from pyarrow import csv as pacsv
        return {"write_options": pacsv.WriteOptions(include_header=False)}

    if "entities_df" in out:
        ents = rd.from_pandas(
            out["entities_df"].sort_values("id").reset_index(drop=True))
    else:
        ents = out["entities_ds"].sort("id")

    def node_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "id": b.column("id").cast(pa.string()),
            "name": b.column("name").cast(pa.string()),
            "type": b.column("type").cast(pa.string()),
            "label": pa.array(["Entity"] * b.num_rows, pa.string())})

    nodes_dir = os.path.join(out_dir, "nodes")
    ents.map_batches(node_rows, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .write_csv(nodes_dir, arrow_csv_args_fn=_headerless)
    with open(os.path.join(out_dir, "nodes.header.csv"), "w") as f:
        f.write("id:ID,name,type,:LABEL\n")

    def rel_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b.column("src_id").cast(pa.string()),
            "dst": b.column("dst_id").cast(pa.string()),
            "rel": b.column("rel_type").cast(pa.string())})

    rels_dir = os.path.join(out_dir, "relationships")
    out["edges"].map_batches(rel_rows, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .write_csv(rels_dir, arrow_csv_args_fn=_headerless)
    with open(os.path.join(out_dir, "relationships.header.csv"), "w") as f:
        f.write(":START_ID,:END_ID,:TYPE\n")

    with open(os.path.join(out_dir, "IMPORT.txt"), "w") as f:
        f.write(
            "neo4j-admin database import full \\\n"
            f"  --nodes={out_dir}/nodes.header.csv,{out_dir}/nodes/.* \\\n"
            f"  --relationships={out_dir}/relationships.header.csv,"
            f"{out_dir}/relationships/.* \\\n"
            "  --id-type=string neo4j\n")
    return {"nodes": nodes_dir, "relationships": rels_dir}
