"""Distributed round-2 canonicalization: created-vs-created merge edges at
beyond-driver scale.

The driver-side version (pipelines/kg.round2_canonicalize) holds the token
inverted index in memory; this module is the same EXACT candidate rule —
a merge requires ``ce > 0``, i.e. at least one shared M1 token — expressed
as Ray Data dataflow for decision tables too large to collect:

    created entities  → explode (token, side='kb',    id, payload) rows
    candidate rows    → explode (token, side='probe', id, payload) rows
    union             → coarse hash-partitioned groupby(token)
    per token         → probe × kb candidate pairs (self-excluded)
    per partition     → dedup pairs, score with the shared cascade,
                        keep final >= high_threshold
    edge set          → distinct (a, b) merge edges → union-find
                        (state/unionfind.distributed_components for the
                        edge lists that outgrow the driver too)

The candidate rule matches the driver version exactly (equivalence-tested):
tokens with document frequency above ``ROUND2_DF_HARD`` are dropped as pair
generators by a two-pass count, with the dropped pair mass counted and
logged (pairs sharing ONLY such head tokens CAN merge — the drop is an
explicit recall trade-off at the extreme head, not "noise"); tokens below
the cap generate pairs through a vectorized bge-prefilter (matmul + upper
bound, scoring.bge_prefilter_floor) so hot-but-capped tokens cost one dot
product per pair, not a string cascade.  The token prune itself is exact
only while ``scoring.token_prune_exact(cfg)`` holds — checked at entry,
loud failure otherwise (the driver version falls back to all-pairs; at
distributed scale that fallback is intractable by definition).  Payloads
ride along in the token rows (shuffle volume = tokens × content; the
alternative shape, pair-ids + a content join, trades a second shuffle for
thinner rows — same semantics).
"""
from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.encoder import make_encoder
from ..functions.scoring import (
    bge_prefilter_floor,
    comprehensive_score,
    token_prune_exact,
)
from ..functions.textbuild import embed_text, rerank_text
from ..stages.partition import partitioned_groupby

# hard document-frequency cap beyond which a token stops generating
# candidate pairs (shared with the driver-side round-2 in pipelines/kg.py so
# the two implementations stay equivalence-testable)
ROUND2_DF_HARD = 4096

_ENCODERS: dict[EngineConfig, object] = {}


def _encoder_for(cfg: EngineConfig):
    e = _ENCODERS.get(cfg)
    if e is None:
        if len(_ENCODERS) > 8:
            _ENCODERS.clear()
        e = make_encoder(cfg.encoder, cfg.embedding_dim)
        _ENCODERS[cfg] = e
    return e


def _explode_tokens(batch: pa.Table, side: str) -> pa.Table:
    toks, sides, ids, payloads = [], [], [], []
    names = batch.column("name").to_pylist()
    types = batch.column("type").to_pylist()
    aliases = batch.column("aliases_json").to_pylist()
    defs = batch.column("definition").to_pylist()
    attrs = batch.column("attributes").to_pylist()
    canon = batch.column("canonical_id").to_pylist()
    for i in range(batch.num_rows):
        al = json.loads(aliases[i])
        rt = rerank_text(names[i], al, defs[i])
        payload = json.dumps({
            "name": names[i], "type": types[i], "aliases": al,
            "definition": defs[i], "attributes": attrs[i], "rtext": rt,
        }, ensure_ascii=False)
        for t in set(rt.split()):
            toks.append(t)
            sides.append(side)
            ids.append(canon[i])
            payloads.append(payload)
    return pa.table({
        "token": pa.array(toks, pa.string()),
        "side": pa.array(sides, pa.string()),
        "id": pa.array(ids, pa.string()),
        "payload": pa.array(payloads, pa.string()),
    })


def distributed_round2_edges(
    decisions: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG,
    df_cap: int = ROUND2_DF_HARD, nparts: int = 32,
    collect: bool = True,
) -> pd.DataFrame | rd.Dataset:
    """decisions Dataset (DECISION_SCHEMA columns) → distinct merge edges
    (a, b): a driver DataFrame with ``collect=True`` (default — edge lists
    are cluster-mass-sized and usually driver-comfortable), or a
    Dataset with the distinct-pair dedup run as a coarse partitioned
    shuffle (``collect=False``, the fully Dataset-resident canonicalization
    path in kg.canonicalize_and_rewrite)."""
    import pyarrow.compute as pc

    if not token_prune_exact(cfg):
        raise ValueError(
            "round-2 token-overlap prune is not exact under this config "
            "((bge+fuzz+lev weights)*max_multiplier >= high_threshold) — "
            "distributed round-2 cannot fall back to all-pairs scoring; "
            "restore default weights or disable round2_dedup")

    created = decisions.map_batches(
        lambda t: t.filter(pc.equal(t.column("decision"), "create")),
        batch_format="pyarrow", zero_copy_batch=True)
    cand = decisions.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("decision"), "merge")),
        batch_format="pyarrow", zero_copy_batch=True)

    kb_tok = created.map_batches(
        lambda b: _explode_tokens(b, "kb"), batch_format="pyarrow")
    pr_tok = cand.map_batches(
        lambda b: _explode_tokens(b, "probe"), batch_format="pyarrow")
    both = kb_tok.union(pr_tok)

    # Document-frequency cap WITHOUT a separate counting pass: the coarse
    # groupby(token) below colocates ALL rows of a token in one partition
    # by construction, so each token group's own kb row count IS its global
    # document frequency — the former two-pass (materialize + keyed count +
    # driver hot-set) spent two full Ray executions recomputing a number
    # the cogroup already has in hand.  Semantics identical
    # (equivalence-tested against the driver round-2).
    bge_floor = bge_prefilter_floor(cfg)

    def pairs_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        enc = _encoder_for(cfg)
        out = []
        seen: set[tuple[str, str]] = set()
        payload_cache: dict[str, dict] = {}
        vec_cache: dict[str, object] = {}
        dropped = 0

        def parsed(pid: str, payload_json: str) -> dict:
            p = payload_cache.get(pid)
            if p is None:
                p = json.loads(payload_json)
                payload_cache[pid] = p
            return p

        def vec_of(pid: str, payload_json: str):
            v = vec_cache.get(pid)
            if v is None:
                p = parsed(pid, payload_json)
                v = enc.encode([embed_text(p["name"], p["aliases"],
                                           p["definition"],
                                           p["attributes"])])[0]
                vec_cache[pid] = v
            return v

        for token, g in df.groupby("token", sort=False):
            kb = g[g["side"] == "kb"]
            pr = g[g["side"] == "probe"]
            if kb.empty or pr.empty:
                continue
            if len(kb) > df_cap:  # len(kb) == global df: see note above
                dropped += len(kb) * len(pr)
                continue
            kids = kb["id"].tolist()
            pids = pr["id"].tolist()
            kvecs = np.asarray([vec_of(i, p) for i, p in
                                zip(kids, kb["payload"])])
            pvecs = np.asarray([vec_of(i, p) for i, p in
                                zip(pids, pr["payload"])])
            # tiered EXACT prefilters (same algebra as the driver round-2):
            # vectorized bge floor, then the pair's type multiplier, then
            # its actual ce (token jaccard) — the fuzz/lev cascade runs
            # only for pairs that could still reach high_threshold
            from ..functions.scoring import type_multiplier

            w_b, w_c, w_f, w_l = cfg.weights()
            ce_exact = cfg.reranker != "cross_encoder"
            bges = pvecs @ kvecs.T
            for i, j in np.argwhere(bges >= bge_floor):
                pid, kid = pids[i], kids[j]
                if pid == kid or (pid, kid) in seen:
                    continue
                seen.add((pid, kid))
                m = parsed(pid, pr["payload"].iloc[i])
                e = parsed(kid, kb["payload"].iloc[j])
                bge = float(bges[i, j])
                mult = type_multiplier(m["type"], e["type"], cfg)
                if (w_b * bge + w_c + w_f + w_l) * mult \
                        < cfg.high_threshold:
                    continue
                if ce_exact:
                    mt = m.get("_toks")
                    if mt is None:
                        mt = set(m["rtext"].split())
                        m["_toks"] = mt
                    et = e.get("_toks")
                    if et is None:
                        et = set(e["rtext"].split())
                        e["_toks"] = et
                    un = len(mt | et)
                    ce = (len(mt & et) / un) if un else 0.0
                    if cfg.reranker == "none":
                        ce = 0.0
                    if (w_b * bge + w_c * ce + w_f + w_l) * mult \
                            < cfg.high_threshold:
                        continue
                s = comprehensive_score(
                    m["name"], m["aliases"], m["type"], m["rtext"],
                    e["name"], e["aliases"], e["type"], e["rtext"],
                    bge, cfg)
                if s.final_score >= cfg.high_threshold:
                    out.append((pid, kid))
        if dropped:
            import logging

            logging.getLogger(__name__).warning(
                "round-2 partition dropped %d candidate pairs via tokens "
                "with df > %d", dropped, df_cap)
        if not out:
            # typed empty (object-dtype empties become Arrow null columns
            # and poison downstream schema unification)
            return pd.DataFrame({"a": pd.array([], dtype="string"),
                                 "b": pd.array([], dtype="string")})
        return pd.DataFrame(out, columns=["a", "b"])

    edges_ds = partitioned_groupby(both, "token", pairs_in_partition,
                                   nparts=nparts)
    if collect:
        edges = edges_ds.to_pandas()
        if edges.empty or "a" not in edges.columns:
            # all partitions empty → Ray drops the schema; restore the contract
            return pd.DataFrame(columns=["a", "b"])
        # a pair can re-form via tokens in different partitions: distinct
        edges = edges.drop_duplicates(["a", "b"]).reset_index(drop=True)
        return edges.astype({"a": object, "b": object})
    # Dataset-resident distinct: pair-keyed coarse dedup, no driver collect
    import pyarrow.compute as pc2

    from ..stages.partition import dedup_first

    def pkey(batch: pa.Table) -> pa.Table:
        key = pc2.binary_join_element_wise(
            pc2.cast(batch.column("a"), pa.string()),
            pc2.cast(batch.column("b"), pa.string()), "\x1f")
        return pa.table({"a": pc2.cast(batch.column("a"), pa.string()),
                         "b": pc2.cast(batch.column("b"), pa.string()),
                         "pair_key": key})

    keyed = edges_ds.map_batches(pkey, batch_format="pyarrow")
    return dedup_first(keyed, "pair_key", nparts=max(8, nparts // 4)) \
        .drop_columns(["pair_key"])
