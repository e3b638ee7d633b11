"""Stateful disambiguation stage: embed → candidate gen → score → decide.

This is the reference's ``/auto-decide`` request path (SURVEY.md §3.2,
services/disambiguation.py:120-166) re-expressed as ONE batched actor-pool
``map_batches`` stage over unique mentions:

- the knowledge base (entities + embedding matrix, the FAISS-index
  equivalent) and the encoder live in ``__init__`` — loaded once per actor,
  amortized over all batches (the reference reloads nothing per request but
  also cannot batch; vectorization.py:487-495 encodes one text per call);
- candidate generation reproduces the smart-search dual path
  (disambiguation.py:168-224): global top-(2k) search by raw inner product
  (IndexFlatIP semantics, vectorization.py:516) overlaid with a type-scoped
  brute-force cosine path (threshold 0.1, disambiguation.py:191-193), merged
  with name-dedup where type results take priority (disambiguation.py:199-215),
  truncated to top_k;
- scoring and decisions use functions/scoring.py (M3-M9 verbatim).

Scale note: the KB here is the SMALL side (a seed KB of ~10^2..10^6 rows vs
10^12 mentions) and is broadcast — built deterministically per actor or
shipped once via ``ray.put`` → ``fn_constructor_kwargs``.  For KBs too large
to broadcast, ``candidate_gen="blocked"`` (stages/candidates.py) shuffles
mentions to name/type blocks and searches per-block indexes instead.
"""
from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.encoder import make_encoder
from ..functions.hashing import generate_entity_id
from ..functions.scoring import (
    CREATE,
    MERGE,
    MentionPre,
    PairKernel,
    comprehensive_score,
    decision_reasoning,
    make_decision,
    type_multiplier,
)
from ..functions.textbuild import embed_text, rerank_text
from ..sources.seed import kb_entities

DECISION_SCHEMA = pa.schema(
    [
        ("sig", pa.string()),
        ("first_occ", pa.string()),
        ("name", pa.string()),
        ("type", pa.string()),
        ("aliases_json", pa.string()),
        ("definition", pa.string()),
        ("attributes", pa.string()),
        ("decision", pa.string()),
        ("match_id", pa.string()),
        ("match_name", pa.string()),
        ("bge_score", pa.float64()),
        ("cross_encoder_score", pa.float64()),
        ("fuzz_score", pa.float64()),
        ("levenshtein_score", pa.float64()),
        ("final_score", pa.float64()),
        ("confidence", pa.float64()),
        ("reasoning", pa.string()),
        ("canonical_id", pa.string()),
    ]
)


def _parse_aliases(raw) -> list[str]:
    """M11 — the reference's defensive record→entity alias parse
    (neo4j_database.py:490-534): aliases may arrive as a native list, a
    JSON-encoded string (possibly ``'[]'``), a bare non-JSON string (treated
    as a single alias), or anything else (→ [])."""
    if raw is None:
        return []
    if isinstance(raw, (list, tuple)):
        return [str(x) for x in raw]
    if isinstance(raw, str):
        s = raw.strip()
        if not s:
            return []
        try:
            parsed = json.loads(s)
        except (ValueError, TypeError):
            return [s]  # bare string → single alias
        if isinstance(parsed, list):
            return [str(x) for x in parsed]
        return [s]
    try:  # numpy arrays etc.
        return [str(x) for x in list(raw)]
    except TypeError:
        return []


class KnowledgeBase:
    """In-memory KB: entity rows + normalized-IP embedding matrix."""

    def __init__(self, entities=None, encoder=None,
                 cfg: EngineConfig = DEFAULT_CONFIG, matrix=None):
        """``matrix`` — optional precomputed (n, dim) embedding matrix
        (e.g. from ``state.kbstore.load_kb``); skips re-encoding the KB."""
        if entities is None:
            # seed corpus, or cfg.kb_path (a prior run's entities table —
            # incremental mode, the reference's growing-KB semantics)
            entities = kb_entities(cfg)
        self.cfg = cfg
        self.encoder = encoder or make_encoder(cfg.encoder, cfg.embedding_dim)
        self.rows = []
        texts = []
        for e in entities:
            if isinstance(e, dict):
                row = dict(e)
                row["aliases"] = _parse_aliases(row.get("aliases"))
            else:
                row = {
                    "id": e.id, "name": e.name, "type": e.type,
                    "aliases": list(e.aliases), "definition": e.definition,
                    "attributes": e.attributes, "source": e.source,
                    "create_time": e.create_time,
                }
            row["rerank_text"] = rerank_text(row["name"], row["aliases"],
                                             row.get("definition"))
            # precomputed string forms for the PairKernel hot path (sorted
            # tokens + rerank token set), built ONCE per actor per KB row
            row["_pre"] = MentionPre(row["name"], row["aliases"],
                                     row["type"], row["rerank_text"])
            if matrix is None:
                texts.append(embed_text(row["name"], row["aliases"],
                                        row.get("definition"),
                                        row.get("attributes")))
            self.rows.append(row)
        if matrix is not None:
            if len(matrix) != len(self.rows):
                raise ValueError(
                    f"matrix rows {len(matrix)} != entities {len(self.rows)}")
            self.matrix = np.asarray(matrix, dtype=np.float32)
        else:
            self.matrix = self.encoder.encode(texts)  # (n, dim) float32
        self.norms = np.linalg.norm(self.matrix, axis=1) if len(self.rows) else np.zeros(0)
        self.types = np.array([r["type"] or "" for r in self.rows], dtype=object)
        self.by_type: dict[str, np.ndarray] = {}
        for t in set(self.types.tolist()):
            if t:
                self.by_type[t] = np.flatnonzero(self.types == t)

    def candidates(self, vec: np.ndarray, mtype: str | None,
                   top_k: int, ips: np.ndarray | None = None
                   ) -> list[tuple[int, float]]:
        """Reference smart-search (disambiguation.py:168-224): returns
        [(kb_row_index, bge_score), ...] truncated to top_k.

        ``ips`` — optional precomputed ``matrix @ vec`` column (the batched
        caller computes one (kb, batch) matmul instead of per-mention
        matrix-vector products)."""
        n = self.matrix.shape[0]
        if n == 0:
            return []
        # global vector path, top_k*2 by raw inner product (IndexFlatIP)
        if ips is None:
            ips = self.matrix @ vec
        k2 = min(top_k * 2, n)
        top = np.argpartition(-ips, k2 - 1)[:k2]
        top = top[np.argsort(-ips[top], kind="stable")]
        vector_results = [(int(i), float(ips[i])) for i in top]
        if mtype and mtype in self.by_type:
            idxs = self.by_type[mtype]
            # type-scoped brute-force cosine, threshold 0.1
            # (disambiguation.py:191-193); vectors are L2-normalized so the
            # explicit norm division is a no-op kept for zero-vector safety
            norms = self.norms[idxs] * (np.linalg.norm(vec) or 1.0)
            norms[norms == 0] = 1.0
            cos = ips[idxs] / norms
            keep = cos > 0.1
            order = np.argsort(-cos[keep], kind="stable")
            type_results = [(int(idxs[np.flatnonzero(keep)[j]]), float(cos[keep][j]))
                            for j in order]
            merged: list[tuple[int, float]] = []
            seen: set[str] = set()
            for i, s in type_results:        # type results take priority
                nm = self.rows[i]["name"]
                if nm not in seen:
                    merged.append((i, s))
                    seen.add(nm)
            for i, s in vector_results:
                nm = self.rows[i]["name"]
                if nm not in seen:
                    merged.append((i, s))
                    seen.add(nm)
            return merged[:top_k]
        return vector_results[:top_k]


def batch_invariant_ips(matrix: np.ndarray, vecs: np.ndarray,
                        unit: int = 1024) -> np.ndarray:
    """(kb, dim) @ (batch, dim).T with BATCH-WIDTH-INVARIANT rounding.

    BLAS picks its blocking (and therefore its float summation order) from
    the GEMM shape, so the same mention scored in a 700-wide batch and a
    300-wide batch can differ by 1 ulp — which broke run-to-run byte
    identity of the decisions table whenever upstream block boundaries
    shifted (observed: 12/20,312 rows drifting ~1e-8 between a resumed and
    a fresh 150k-page run).  Padding every batch to one fixed width makes
    the kernel choice — and the result for every real column — identical
    regardless of how the streaming executor happened to batch the rows
    (verified: padded 300-wide == padded 700-wide to the last bit; column
    position within a fixed-shape GEMM does not affect rounding).  Batches
    wider than ``unit`` are processed in unit-wide slices."""
    n = vecs.shape[0]
    if n == 0:
        return np.empty((matrix.shape[0], 0), dtype=matrix.dtype)
    out = []
    for lo in range(0, n, unit):
        chunk = vecs[lo:lo + unit]
        if chunk.shape[0] == unit:
            out.append(matrix @ chunk.T)
        else:
            pad = np.zeros((unit, vecs.shape[1]), dtype=chunk.dtype)
            pad[: chunk.shape[0]] = chunk
            out.append((matrix @ pad.T)[:, : chunk.shape[0]])
    return out[0] if len(out) == 1 else np.concatenate(out, axis=1)


class Disambiguator:
    """Actor-pool stage over UNIQUE mentions → decisions table."""

    def __init__(self, entities=None, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.kb = KnowledgeBase(entities=entities, cfg=cfg)
        self.encoder = self.kb.encoder
        # deterministic fast path (cached kernels + exact bound pruning);
        # the real-CE mode must call the model per pair → comprehensive_score
        self.kernel = (None if cfg.reranker == "cross_encoder"
                       else PairKernel(cfg))

    def decide_one(self, name, mtype, aliases, rtext, vec, ips=None,
                   pre: MentionPre | None = None):
        cands = self.kb.candidates(vec, mtype, self.cfg.faiss_top_k, ips=ips)
        if not cands:
            # disambiguation.py:126-135 — empty → create, confidence 1.0
            return (CREATE, None, None, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0,
                    "no similar entities: create",
                    generate_entity_id(name, mtype))
        best = None
        best_row = None
        if self.kernel is not None:
            # argmax-only semantics (disambiguation.py:137-154 keeps only
            # the best candidate): candidates whose final-score upper bound
            # (fuzz, lev <= 1) cannot strictly beat the running best are
            # skipped — exact, incl. the reference's keep-first tie rule,
            # because bound <= best implies final <= best (strict > never
            # fires).  Iteration order is unchanged.
            k = self.kernel
            if pre is None:
                pre = MentionPre(name, aliases, mtype, rtext)
            for i, bge in cands:
                row = self.kb.rows[i]
                bpre = row["_pre"]
                ce = k.ce(pre, bpre)
                mult = type_multiplier(mtype, row["type"], self.cfg)
                if (best is not None
                        and k.score_bound(bge, ce, mult)
                        <= best.final_score):
                    continue
                s = k.score(pre, bpre, bge, ce_score=ce, mult=mult)
                if best is None or s.final_score > best.final_score:
                    best, best_row = s, row
        else:
            for i, bge in cands:
                row = self.kb.rows[i]
                s = comprehensive_score(
                    name, aliases, mtype, rtext,
                    row["name"], row["aliases"], row["type"],
                    row["rerank_text"], bge, self.cfg,
                )
                if best is None or s.final_score > best.final_score:
                    best, best_row = s, row
        decision = make_decision(best.final_score, cfg=self.cfg)
        match_id = best_row["id"] if decision == MERGE else None
        match_name = best_row["name"] if decision == MERGE else None
        canonical = match_id if decision == MERGE else generate_entity_id(name, mtype)
        return (decision, match_id, match_name, best.bge_score,
                best.cross_encoder_score, best.fuzz_score,
                best.levenshtein_score, best.final_score, best.final_score,
                decision_reasoning(decision, best.final_score, self.cfg),
                canonical)

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: C901
        etexts = batch.column("embed_text").to_pylist()
        vecs = self.encoder.encode(etexts)
        # one (kb, batch) matmul for the whole batch (vectorized retrieval;
        # the reference encodes and searches one text per call,
        # vectorization.py:487-495 — this is the #1 throughput fix)
        all_ips = (batch_invariant_ips(self.kb.matrix, vecs)
                   if len(self.kb.rows) else None)
        names = batch.column("name").to_pylist()
        types = batch.column("type").to_pylist()
        aliases_l = batch.column("aliases_json").to_pylist()
        rtexts = batch.column("rerank_text").to_pylist()
        sigs = batch.column("sig").to_pylist()
        occs = (batch.column("first_occ").to_pylist()
                if "first_occ" in batch.column_names
                else [""] * batch.num_rows)
        defs = batch.column("definition").to_pylist()
        attrs = batch.column("attributes").to_pylist()
        cols: dict[str, list] = {name: [] for name in DECISION_SCHEMA.names}
        for i in range(batch.num_rows):
            name = names[i]
            mtype = types[i]
            aliases = json.loads(aliases_l[i])
            rtext = rtexts[i]
            (decision, match_id, match_name, bge, ce, fz, lv, final, conf,
             reasoning, canonical) = self.decide_one(
                name, mtype, aliases, rtext, vecs[i],
                ips=all_ips[:, i] if all_ips is not None else None)
            cols["sig"].append(sigs[i])
            cols["first_occ"].append(occs[i])
            cols["name"].append(name)
            cols["type"].append(mtype)
            cols["aliases_json"].append(aliases_l[i])
            cols["definition"].append(defs[i])
            cols["attributes"].append(attrs[i])
            cols["decision"].append(decision)
            cols["match_id"].append(match_id)
            cols["match_name"].append(match_name)
            cols["bge_score"].append(bge)
            cols["cross_encoder_score"].append(ce)
            cols["fuzz_score"].append(fz)
            cols["levenshtein_score"].append(lv)
            cols["final_score"].append(final)
            cols["confidence"].append(conf)
            cols["reasoning"].append(reasoning)
            cols["canonical_id"].append(canonical)
        return pa.table(cols, schema=DECISION_SCHEMA)


_DISAMBIGUATORS: dict[EngineConfig, "Disambiguator"] = {}


def get_disambiguator(cfg: EngineConfig = DEFAULT_CONFIG) -> Disambiguator:
    """Process-global instance (one per worker, keyed by config VALUE —
    EngineConfig is a frozen, hashable dataclass, so equal configs
    deserialized by different tasks share one instance and different
    configs can never collide the way an ``id()`` key could after GC).

    The seed KB + encoder cache are cheap to build (~100 ms) and
    deterministic, so stateless tasks over warm workers beat a dedicated
    actor pool (fresh process + import per actor).  A model-backed encoder
    (encoder="bge") IS actor-pool territory — use ``decisions_stage(...,
    use_actors=True)`` then."""
    d = _DISAMBIGUATORS.get(cfg)
    if d is None:
        if len(_DISAMBIGUATORS) > 8:  # bound worker memory across configs
            _DISAMBIGUATORS.clear()
        d = Disambiguator(cfg=cfg)
        _DISAMBIGUATORS[cfg] = d
    return d


def disambiguate_batch(batch: pa.Table, *, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    return get_disambiguator(cfg)(batch)


CANDIDATES_SCHEMA = pa.schema(
    [
        ("sig", pa.string()),
        ("name", pa.string()),
        ("rank", pa.int32()),
        ("candidate_id", pa.string()),
        ("candidate_name", pa.string()),
        ("bge_score", pa.float64()),
        ("cross_encoder_score", pa.float64()),
        ("fuzz_score", pa.float64()),
        ("levenshtein_score", pa.float64()),
        ("final_score", pa.float64()),
        ("similarity_details", pa.string()),
    ]
)


def similarity_details(name_a, type_a, name_b, type_b, s) -> str:
    """M10 — human-readable multi-line score explanation
    (disambiguation.py:439-463, English rendering)."""
    lines = [
        f"input: {name_a} ({type_a or 'untyped'})",
        f"candidate: {name_b} ({type_b or 'untyped'})",
    ]
    if type_a and type_b:
        lines.append("type match: " + ("yes" if type_a == type_b else
                                       f"no ({type_a} vs {type_b})"))
    else:
        lines.append("type info incomplete")
    lines += [
        f"bge: {s.bge_score:.3f}",
        f"cross_encoder: {s.cross_encoder_score:.3f}",
        f"fuzz: {s.fuzz_score:.3f}",
        f"levenshtein: {s.levenshtein_score:.3f}",
        f"final: {s.final_score:.3f}",
    ]
    return "\n".join(lines)


class CandidateMatcher:
    """The reference's ``/match-candidates`` path (disambiguation.py:226-257):
    same smart search + scoring as auto-decide, but returns the ranked
    candidate list with similarity details instead of a decision."""

    def __init__(self, entities=None, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.kb = KnowledgeBase(entities=entities, cfg=cfg)
        self.encoder = self.kb.encoder
        self.kernel = (None if cfg.reranker == "cross_encoder"
                       else PairKernel(cfg))

    def __call__(self, batch: pa.Table) -> pa.Table:
        etexts = batch.column("embed_text").to_pylist()
        vecs = self.encoder.encode(etexts)
        all_ips = (batch_invariant_ips(self.kb.matrix, vecs)
                   if len(self.kb.rows) else None)
        names = batch.column("name").to_pylist()
        types = batch.column("type").to_pylist()
        aliases_l = batch.column("aliases_json").to_pylist()
        rtexts = batch.column("rerank_text").to_pylist()
        sigs = batch.column("sig").to_pylist()
        cols: dict[str, list] = {n: [] for n in CANDIDATES_SCHEMA.names}
        for i in range(batch.num_rows):
            cands = self.kb.candidates(
                vecs[i], types[i], self.cfg.faiss_top_k,
                ips=all_ips[:, i] if all_ips is not None else None)
            aliases = json.loads(aliases_l[i])
            pre = (MentionPre(names[i], aliases, types[i], rtexts[i])
                   if self.kernel is not None else None)
            # rank by retrieval order (enumerate(similar_entities, 1) —
            # disambiguation.py:238-251: rank reflects search order, not
            # final_score order).  No bound pruning here: EVERY candidate's
            # scores are part of the output; the cached kernels still apply.
            for rank, (ki, bge) in enumerate(cands, 1):
                row = self.kb.rows[ki]
                if self.kernel is not None:
                    s = self.kernel.score(pre, row["_pre"], bge)
                else:
                    s = comprehensive_score(
                        names[i], aliases, types[i], rtexts[i],
                        row["name"], row["aliases"], row["type"],
                        row["rerank_text"], bge, self.cfg)
                cols["sig"].append(sigs[i])
                cols["name"].append(names[i])
                cols["rank"].append(rank)
                cols["candidate_id"].append(row["id"])
                cols["candidate_name"].append(row["name"])
                cols["bge_score"].append(s.bge_score)
                cols["cross_encoder_score"].append(s.cross_encoder_score)
                cols["fuzz_score"].append(s.fuzz_score)
                cols["levenshtein_score"].append(s.levenshtein_score)
                cols["final_score"].append(s.final_score)
                cols["similarity_details"].append(similarity_details(
                    names[i], types[i], row["name"], row["type"], s))
        return pa.table(cols, schema=CANDIDATES_SCHEMA)
