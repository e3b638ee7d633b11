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

Ultra-common tokens (document frequency above ``df_cap``) are dropped as
pair generators by a two-pass count — identical to the driver version's
``hot_df`` rule.  Payloads ride along in the token rows (shuffle volume =
tokens × content; the alternative shape, pair-ids + a content join, trades
a second shuffle for thinner rows — same semantics).
"""
from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.encoder import make_encoder
from ..functions.scoring import comprehensive_score
from ..functions.textbuild import embed_text, rerank_text
from ..stages.partition import partitioned_groupby

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
    df_cap: int = 256, nparts: int = 32,
) -> pd.DataFrame:
    """decisions Dataset (DECISION_SCHEMA columns) → distinct merge-edge
    DataFrame (a, b)."""
    import pyarrow.compute as pc

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
    both = kb_tok.union(pr_tok).materialize()  # consumed twice (count + join)

    # pass 1: document frequency per token on the KB side → hot-token set
    from ray.data.aggregate import Count

    kb_counts = (both.map_batches(
        lambda t: t.filter(pc.equal(t.column("side"), "kb")),
        batch_format="pyarrow")
        .groupby("token").aggregate(Count(alias_name="n")).to_pandas())
    hot = set(kb_counts.loc[kb_counts["n"] > df_cap, "token"])

    def pairs_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        enc = _encoder_for(cfg)
        out = []
        seen: set[tuple[str, str]] = set()
        vec_cache: dict[str, object] = {}

        def vec_of(payload: dict, key: str):
            v = vec_cache.get(key)
            if v is None:
                v = enc.encode([embed_text(payload["name"],
                                           payload["aliases"],
                                           payload["definition"],
                                           payload["attributes"])])[0]
                vec_cache[key] = v
            return v

        for token, g in df.groupby("token", sort=False):
            if token in hot:
                continue
            kb = g[g["side"] == "kb"]
            pr = g[g["side"] == "probe"]
            if kb.empty or pr.empty:
                continue
            for pid, ppay in zip(pr["id"], pr["payload"]):
                for kid, kpay in zip(kb["id"], kb["payload"]):
                    if pid == kid or (pid, kid) in seen:
                        continue
                    seen.add((pid, kid))
                    m = json.loads(ppay)
                    e = json.loads(kpay)
                    bge = float(vec_of(m, pid) @ vec_of(e, kid))
                    s = comprehensive_score(
                        m["name"], m["aliases"], m["type"], m["rtext"],
                        e["name"], e["aliases"], e["type"], e["rtext"],
                        bge, cfg)
                    if s.final_score >= cfg.high_threshold:
                        out.append((pid, kid))
        return pd.DataFrame(out, columns=["a", "b"])

    edges = partitioned_groupby(both, "token", pairs_in_partition,
                                nparts=nparts).to_pandas()
    if edges.empty or "a" not in edges.columns:
        # all partitions empty → Ray drops the schema; restore the contract
        return pd.DataFrame(columns=["a", "b"])
    # a pair can re-form via tokens in different partitions: distinct
    return edges.drop_duplicates(["a", "b"]).reset_index(drop=True)
