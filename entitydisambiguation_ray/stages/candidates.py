"""Blocked candidate generation — the 100 TB scale path
(``candidate_gen="blocked"``) with multi-probe blocking and explicit
salt-based skew splitting.

The default path broadcasts the KB (stages/disambiguate.py) — correct while
the KB fits every worker.  When it does not, mentions and KB entities are
co-partitioned on BLOCKING KEYS and candidates are generated inside each
block (SURVEY.md §7.3 shuffle #1):

    block(surface, type) = (type or '∅') + '|' + first char of surface

- **KB side** (small side of each block): every entity is indexed under the
  blocks of ALL its surfaces (name + aliases), under both its typed key and
  the untyped '∅' key — so alias-form and untyped mentions still meet it.
- **Mention side**: each mention probes the blocks of all its surfaces
  (typed key when typed, plus the untyped key); per-block decisions are then
  reduced per mention to the best-scoring one (max final_score,
  deterministic tie-break) — the union of per-block candidate sets
  approximates the reference's global index search (vectorization.py:516).

Head blocks ("United States"-class surfaces, dominant types) are split with
deterministic salts: the mention side of a hot block partitions into
``n_salt`` sub-blocks by signature hash, the KB slice is REPLICATED into
every sub-block — the classic skew-join treatment (north rule's "explicit
salt-based skew splitting").  Salts come from a cheap two-pass
count-then-salt aggregation (SURVEY.md §4).  Salting is decision-invariant
(tested): every mention still sees its block's full KB slice.
"""
from __future__ import annotations

import json
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.encoder import make_encoder
from ..functions.hashing import generate_entity_id
from ..functions.scoring import (
    MERGE,
    comprehensive_score,
    decision_reasoning,
    make_decision,
)
from ..stages.disambiguate import DECISION_SCHEMA, KnowledgeBase
from ..stages.partition import partitioned_groupby


def _head(surface: str) -> str:
    s = surface.strip()
    return s[:1].lower() if s else "∅"


def block_of(surface: str, etype: str | None) -> str:
    return f"{etype or '∅'}|{_head(surface)}"


def mention_probe_blocks(name: str, aliases: list[str],
                         etype: str | None) -> list[str]:
    blocks = []
    for s in [name, *aliases]:
        if etype:
            blocks.append(block_of(s, etype))
        blocks.append(block_of(s, None))
    # dedup, order-stable
    return list(dict.fromkeys(blocks))


def entity_index_blocks(name: str, aliases: list[str],
                        etype: str | None) -> list[str]:
    return mention_probe_blocks(name, aliases, etype)


def explode_mention_probes(batch: pa.Table) -> pa.Table:
    """mention row → one row per probe block."""
    idx: list[int] = []
    blocks: list[str] = []
    names = batch.column("name").to_pylist()
    types = batch.column("type").to_pylist()
    aliases = batch.column("aliases_json").to_pylist()
    for i in range(batch.num_rows):
        for b in mention_probe_blocks(names[i], json.loads(aliases[i]),
                                      types[i]):
            idx.append(i)
            blocks.append(b)
    out = batch.take(idx)
    return out.append_column("block", pa.array(blocks, pa.string()))


def hot_blocks(probes: rd.Dataset, threshold: int) -> dict[str, int]:
    """Pass 1: block → probe count; {block: n_salt} for hot blocks (the
    shared skew-count helper — same policy as the join primitive's)."""
    from .join import count_hot_keys

    return count_hot_keys(probes, "block", threshold, salt_max=16)


def blocked_decisions(
    unique_mentions: rd.Dataset, entities: list,
    cfg: EngineConfig = DEFAULT_CONFIG,
    salt_threshold: int = 2000, nparts: int = 64,
    self_id_col: str | None = None,
) -> rd.Dataset:
    """Co-partitioned candidate generation + scoring + per-mention reduce.

    ``entities`` — KB rows as a list OR a ``ray.data.Dataset``.  Either way
    the KB side is exploded to (block_salted, payload) rows DISTRIBUTEDLY
    and co-partitioned with the mention probes on ``block_salted`` (one
    ``pad_union`` + one coarse shuffle); nothing KB-sized is ever collected
    on or broadcast from the driver.  Hot blocks replicate their KB slice
    into every salt shard (skew-join treatment); within a partition each
    block's slice is deduped by id and sorted by id, the same deterministic
    order ``_kb_lists`` gives the driver short-circuit.

    ``self_id_col`` — optional mention column holding the mention's own
    entity id; candidates with that id are skipped (used by the round-2
    created-vs-created dedup pass, where every mention is also in the KB)."""
    from .join import pad_union

    probes = unique_mentions.map_batches(
        explode_mention_probes, batch_format="pyarrow", zero_copy_batch=True)
    # consumed twice (hot-block count pass + salted decide pass) — pin the
    # exploded rows so the explode and everything upstream run once
    probes = probes.materialize()
    salts = hot_blocks(probes, salt_threshold)

    def add_salt(batch: pa.Table) -> pa.Table:
        keys = []
        for sig, block in zip(batch.column("sig").to_pylist(),
                              batch.column("block").to_pylist()):
            k = salts.get(block, 1)
            s = zlib.crc32(sig.encode()) % k if k > 1 else 0
            keys.append(f"{block}#{s}")
        return batch.append_column("block_salted", pa.array(keys, pa.string()))

    from .join import _arrow_types

    probe_types = dict(_arrow_types(probes))  # cheap: probes materialized
    probe_types["block_salted"] = pa.string()
    probes = probes.map_batches(add_salt, batch_format="pyarrow",
                                zero_copy_batch=True)

    # KB side: distributed explode to (block_salted, kb_payload) rows; the
    # salts dict (hot blocks only, small by construction) rides in the task
    # closure
    if isinstance(entities, rd.Dataset):
        ents_ds = entities
    else:
        ents_ds = rd.from_items([_entity_row(e) for e in entities])

    def explode_kb(df: pd.DataFrame) -> pd.DataFrame:
        blocks_out: list[str] = []
        payloads: list[str] = []
        for rec in df.to_dict("records"):
            row = _entity_row(rec)
            payload = json.dumps(row, ensure_ascii=False, default=str)
            for b in entity_index_blocks(row["name"], row["aliases"],
                                         row["type"]):
                for s in range(salts.get(b, 1)):
                    blocks_out.append(f"{b}#{s}")
                    payloads.append(payload)
        return pd.DataFrame({"block_salted": blocks_out,
                             "kb_payload": payloads})

    kb_ds = ents_ds.map_batches(explode_kb, batch_format="pandas")

    # both sides' schemas passed explicitly: the add_salt chain and the kb
    # explode are lazy, and Dataset.schema() on a lazy lineage executes it
    # (and the union then executes it again)
    both = pad_union(probes, kb_ds,
                     a_types=probe_types,
                     b_types={"block_salted": pa.string(),
                              "kb_payload": pa.string()})
    _local: dict[str, object] = {}

    def decide_block(df: pd.DataFrame) -> pd.DataFrame:
        # one partition holds many (salted) blocks; encoder + per-block KB
        # indexes cached per worker process (keyed by block + member ids)
        if "enc" not in _local:
            _local["enc"] = make_encoder(cfg.encoder, cfg.embedding_dim)
            _local["kbcache"] = {}
        kbp = df[df["_side"] == 1]
        kb_all: dict[str, list[dict]] = {}
        for bs, g in kbp.groupby("block_salted", sort=False):
            block = bs.rsplit("#", 1)[0]
            by_id = {}
            for pay in g["kb_payload"]:
                row = json.loads(pay)
                by_id.setdefault(row["id"], row)
            # deterministic order (id asc) regardless of arrival order —
            # matches _kb_lists so the driver short-circuit agrees exactly
            kb_all[block] = [by_id[i] for i in sorted(by_id)]
        pdf = df[df["_side"] == 0].drop(columns=["_side", "kb_payload"])
        return _decide_partition(pdf, kb_all, _local["enc"],
                                 _local["kbcache"], cfg, self_id_col)

    per_block = partitioned_groupby(both, "block_salted", decide_block,
                                    nparts=nparts)
    return partitioned_groupby(per_block, "sig", _reduce_best, nparts=16)


def _entity_row(e) -> dict:
    row = dict(e) if isinstance(e, dict) else {
        "id": e.id, "name": e.name, "type": e.type,
        "aliases": list(e.aliases), "definition": e.definition,
        "attributes": e.attributes, "source": e.source,
        "create_time": e.create_time,
    }
    al = row.get("aliases")
    if isinstance(al, str):
        row["aliases"] = json.loads(al) if al else []
    elif al is None:
        row["aliases"] = []
    else:
        row["aliases"] = list(al)
    ct = row.get("create_time")
    if ct is not None and not isinstance(ct, str):
        row["create_time"] = str(ct)
    return row


_KERNELS: dict[EngineConfig, object] = {}


def _kernel_for(cfg: EngineConfig):
    """Process-global PairKernel per config (None for the real-CE mode,
    which must score through comprehensive_score per pair)."""
    if cfg.reranker == "cross_encoder":
        return None
    k = _KERNELS.get(cfg)
    if k is None:
        from ..functions.scoring import PairKernel

        if len(_KERNELS) > 8:
            _KERNELS.clear()
        k = PairKernel(cfg)
        _KERNELS[cfg] = k
    return k


def _decide_partition(df: pd.DataFrame, kb_all: dict, enc, kbcache: dict,
                      cfg: EngineConfig, self_id_col: str | None
                      ) -> pd.DataFrame:
    """Shared decide kernel: one partition of salted-block probe rows →
    per-(mention, block) decision rows.  Per-block KB index built once
    (A3 per-block IndexFlatIP equivalent) and cached by the caller."""
    out_rows = []
    for skey, g in df.groupby("block_salted", sort=False):
        block = skey.rsplit("#", 1)[0]
        kb_rows = kb_all.get(block, [])
        if kb_rows:
            kb = kbcache.get(block)
            if kb is None:
                kb = KnowledgeBase(entities=kb_rows, encoder=enc, cfg=cfg)
                kbcache[block] = kb
        else:
            kb = None
        vecs = enc.encode(g["embed_text"].tolist())
        ips_all = (kb.matrix @ vecs.T) if kb is not None else None
        for j, (_, m) in enumerate(g.iterrows()):
            if kb is None:
                out_rows.append(_create_row(m, cfg))
                continue
            cands = kb.candidates(vecs[j], m["type"], cfg.faiss_top_k,
                                  ips=ips_all[:, j])
            if not cands:
                out_rows.append(_create_row(m, cfg))
                continue
            if self_id_col is not None:
                own = m[self_id_col]
                cands = [(i, b) for i, b in cands
                         if kb.rows[i]["id"] != own]
                if not cands:
                    out_rows.append(_create_row(m, cfg))
                    continue
            aliases = json.loads(m["aliases_json"])
            best, best_row = None, None
            kern = _kernel_for(cfg)
            if kern is not None:
                # argmax-only semantics → the same exact bound pruning as
                # Disambiguator.decide_one (skip candidates whose upper
                # bound cannot strictly beat the running best)
                from ..functions.scoring import MentionPre, type_multiplier

                pre = MentionPre(m["name"], aliases, m["type"],
                                 m["rerank_text"])
                for i, bge in cands:
                    row = kb.rows[i]
                    ce = kern.ce(pre, row["_pre"])
                    mult = type_multiplier(m["type"], row["type"], cfg)
                    if (best is not None
                            and kern.score_bound(bge, ce, mult)
                            <= best.final_score):
                        continue
                    s = kern.score(pre, row["_pre"], bge, ce_score=ce,
                                   mult=mult)
                    if best is None or s.final_score > best.final_score:
                        best, best_row = s, row
            else:
                for i, bge in cands:
                    row = kb.rows[i]
                    s = comprehensive_score(
                        m["name"], aliases, m["type"], m["rerank_text"],
                        row["name"], row["aliases"], row["type"],
                        row["rerank_text"], bge, cfg)
                    if best is None or s.final_score > best.final_score:
                        best, best_row = s, row
            decision = make_decision(best.final_score, cfg=cfg)
            match_id = best_row["id"] if decision == MERGE else None
            canonical = (match_id if decision == MERGE
                         else generate_entity_id(m["name"], m["type"]))
            out_rows.append({
                "sig": m["sig"], "first_occ": m.get("first_occ", ""),
                "name": m["name"], "type": m["type"],
                "aliases_json": m["aliases_json"],
                "definition": m["definition"],
                "attributes": m["attributes"],
                "decision": decision, "match_id": match_id,
                "match_name": (best_row["name"] if decision == MERGE
                               else None),
                "bge_score": best.bge_score,
                "cross_encoder_score": best.cross_encoder_score,
                "fuzz_score": best.fuzz_score,
                "levenshtein_score": best.levenshtein_score,
                "final_score": best.final_score,
                "confidence": best.final_score,
                "reasoning": decision_reasoning(decision,
                                                best.final_score, cfg),
                "canonical_id": canonical,
            })
    cols = [f.name for f in DECISION_SCHEMA]
    return pd.DataFrame(out_rows, columns=cols)


def _reduce_best(df: pd.DataFrame) -> pd.DataFrame:
    """Per-mention reduce over probe blocks: max final_score with a
    deterministic tie-break (then canonical asc)."""
    df = df.sort_values(
        ["sig", "final_score", "decision", "canonical_id"],
        ascending=[True, False, True, True], kind="mergesort")
    return df.drop_duplicates("sig")


def _kb_lists(entities: list) -> dict[str, list[dict]]:
    kb_by_block: dict[str, dict[str, dict]] = {}
    for e in entities:
        row = _entity_row(e)
        for b in entity_index_blocks(row["name"], row["aliases"], row["type"]):
            kb_by_block.setdefault(b, {})[row["id"]] = row
    # id-sorted: the same deterministic per-block order the distributed
    # explode reconstructs, so local and distributed paths agree exactly
    return {b: [d[i] for i in sorted(d)] for b, d in kb_by_block.items()}


def blocked_decisions_local(
    ment_df: pd.DataFrame, entities: list,
    cfg: EngineConfig = DEFAULT_CONFIG, self_id_col: str | None = None,
) -> pd.DataFrame:
    """Driver-local execution of the same blocked decide kernel — the
    small-side short-circuit used by round-2 canonicalization when the
    created-entity set is driver-resident anyway (a few Ray executions of
    fixed latency would dominate the actual compute).  Identical semantics
    to ``blocked_decisions`` (shared `_decide_partition` / `_reduce_best`);
    switch to the distributed form when mentions outgrow the driver."""
    kb_lists = _kb_lists(entities)
    enc = make_encoder(cfg.encoder, cfg.embedding_dim)
    rows = []
    for _, m in ment_df.iterrows():
        for b in mention_probe_blocks(m["name"], json.loads(m["aliases_json"]),
                                      m["type"]):
            r = dict(m)
            r["block_salted"] = f"{b}#0"
            rows.append(r)
    probes = pd.DataFrame(rows)
    per_block = _decide_partition(probes, kb_lists, enc, {}, cfg, self_id_col)
    return _reduce_best(per_block).reset_index(drop=True)


def _create_row(m, cfg: EngineConfig) -> dict:
    return {
        "sig": m["sig"], "first_occ": m.get("first_occ", ""),
        "name": m["name"], "type": m["type"],
        "aliases_json": m["aliases_json"], "definition": m["definition"],
        "attributes": m["attributes"], "decision": "create",
        "match_id": None, "match_name": None,
        "bge_score": 0.0, "cross_encoder_score": 0.0, "fuzz_score": 0.0,
        "levenshtein_score": 0.0, "final_score": 0.0, "confidence": 1.0,
        "reasoning": "no similar entities: create",
        "canonical_id": generate_entity_id(m["name"], m["type"]),
    }
