"""Pairwise scoring and decision functions — reference semantics M3-M9.

Reproduces services/disambiguation.py:
- ``normalize_crossencoder_score``  (:42-51)  — linear clamp from [-6.5, 7.7]
- ``type_multiplier``               (:300-311)
- deterministic pseudo-CrossEncoder (engine addition; the reference's real
  CrossEncoder is nondeterministic and unavailable here — reranker="none"
  reproduces the reference's documented degradation where ce_score stays 0.0,
  disambiguation.py:116-118 + models/entity.py:28)
- ``comprehensive_score``           (:259-298) — weighted fusion + multiplier,
  with the error-degradation path ``final = bge * 0.5`` (:294-297)
- ``make_decision``                 (:381-425) — thresholds 0.72 / 0.60,
  force-mode midpoint 0.66
"""
from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from ..config import DEFAULT_CONFIG, EngineConfig
from .strings import fuzz_score, levenshtein_score

MERGE = "merge"
CREATE = "create"
AMBIGUOUS = "ambiguous"


def normalize_crossencoder_score(
    score: float, cfg: EngineConfig = DEFAULT_CONFIG
) -> float:
    """disambiguation.py:42-51 — linear map [-6.5, 7.7] → clamp [0, 1]."""
    normalized = (score - cfg.ce_norm_min) / (cfg.ce_norm_max - cfg.ce_norm_min)
    return max(0.0, min(1.0, float(normalized)))


def type_multiplier(
    type_a: str | None, type_b: str | None, cfg: EngineConfig = DEFAULT_CONFIG
) -> float:
    """disambiguation.py:300-311 — missing → 1.0, match → bonus,
    mismatch → penalty."""
    if not type_a or not type_b:
        return 1.0
    if type_a == type_b:
        return cfg.type_match_bonus
    return cfg.type_mismatch_penalty


_REAL_CE: dict[str, object] = {}


def get_real_cross_encoder():
    """Process-global real CrossEncoder (mode ``reranker="cross_encoder"``),
    loaded ONCE per worker on first use — the reference loads
    ms-marco-MiniLM-L-6-v2 at service init (disambiguation.py:67-118).
    Gated behind an import-try: absent in this sandbox, so the loader
    raises a clear RuntimeError (a configuration error, loud) while
    PREDICTION failures keep the reference's degradation semantics (the
    caller's try/except → ``final = bge * 0.5``)."""
    m = _REAL_CE.get("m")
    if m is None:
        try:  # pragma: no cover - heavyweight, absent in sandbox
            from sentence_transformers import CrossEncoder  # type: ignore
        except ImportError as exc:
            raise RuntimeError(
                "reranker='cross_encoder' requires sentence-transformers "
                "(not installed); use reranker='hash_ce' or 'none'"
            ) from exc
        m = CrossEncoder("cross-encoder/ms-marco-MiniLM-L-6-v2",
                         max_length=512)  # pragma: no cover
        _REAL_CE["m"] = m
    return m


def hash_ce_raw(text_a: str, text_b: str, cfg: EngineConfig = DEFAULT_CONFIG) -> float:
    """Deterministic pseudo-CrossEncoder raw score (engine mode
    reranker="hash_ce"): token-set Jaccard of the two M1 texts mapped onto
    the reference's empirical raw-score range [-6.5, 7.7], so that
    ``normalize_crossencoder_score(hash_ce_raw(a, b)) == jaccard(a, b)``."""
    ta, tb = set(text_a.split()), set(text_b.split())
    union = len(ta | tb)
    jac = (len(ta & tb) / union) if union else 0.0
    return cfg.ce_norm_min + jac * (cfg.ce_norm_max - cfg.ce_norm_min)


@dataclass
class PairScore:
    """= EntityScore, models/entity.py:25-31."""

    bge_score: float = 0.0
    cross_encoder_score: float = 0.0
    fuzz_score: float = 0.0
    levenshtein_score: float = 0.0
    final_score: float = 0.0


def comprehensive_score(
    name_a: str,
    aliases_a: Sequence[str],
    type_a: str | None,
    rerank_a: str,
    name_b: str,
    aliases_b: Sequence[str],
    type_b: str | None,
    rerank_b: str,
    bge_score: float,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> PairScore:
    """disambiguation.py:259-298.  ``rerank_a/rerank_b`` are the M1 texts."""
    s = PairScore(bge_score=bge_score)
    # model LOAD failure is a config error and must escape the degradation
    # try below (reference init-vs-runtime split, disambiguation.py:67-118)
    ce_model = (get_real_cross_encoder()
                if cfg.reranker == "cross_encoder" else None)
    try:
        if cfg.reranker == "hash_ce":
            s.cross_encoder_score = normalize_crossencoder_score(
                hash_ce_raw(rerank_a, rerank_b, cfg), cfg
            )
        elif ce_model is not None:  # pragma: no cover - needs model weights
            raw = float(ce_model.predict([(rerank_a, rerank_b)])[0])
            s.cross_encoder_score = normalize_crossencoder_score(raw, cfg)
        # reranker == "none": ce_score stays 0.0 (reference degradation)
        s.fuzz_score = fuzz_score(name_a, aliases_a, name_b, aliases_b)
        s.levenshtein_score = levenshtein_score(name_a, aliases_a, name_b, aliases_b)
        s.final_score = (
            s.bge_score * cfg.bge_weight
            + s.cross_encoder_score * cfg.cross_encoder_weight
            + s.fuzz_score * cfg.fuzz_weight
            + s.levenshtein_score * cfg.levenshtein_weight
        )
        s.final_score *= type_multiplier(type_a, type_b, cfg)
    except Exception:
        # disambiguation.py:294-297 — defined degradation path
        s.final_score = bge_score * 0.5
    return s


def max_type_multiplier(cfg: EngineConfig = DEFAULT_CONFIG) -> float:
    """Largest multiplier ``type_multiplier`` can return under ``cfg``."""
    return max(1.0, cfg.type_match_bonus, cfg.type_mismatch_penalty)


def token_prune_exact(cfg: EngineConfig = DEFAULT_CONFIG) -> bool:
    """Whether the round-2 token-overlap candidate prune is EXACT for merges
    under ``cfg``: with no shared M1 token, ce == 0 and the max achievable
    final score is ``(w_bge + w_fuzz + w_lev) * max_multiplier`` (bge, fuzz,
    lev are all ≤ 1 by construction) — the prune loses no merges iff that
    bound stays below ``high_threshold``.  Holds for the reference defaults
    (0.7 < 0.72) but NOT for arbitrary ``ED_RAY_*`` overrides (e.g.
    HIGH_THRESHOLD=0.65), so round-2 entry points must check it and fall
    back / fail loudly instead of silently losing recall."""
    ceiling = (cfg.bge_weight + cfg.fuzz_weight + cfg.levenshtein_weight)
    return ceiling * max_type_multiplier(cfg) < cfg.high_threshold


def bge_prefilter_floor(cfg: EngineConfig = DEFAULT_CONFIG) -> float:
    """Smallest bge cosine at which a pair could still reach
    ``high_threshold`` when every other component is maximal (ce ≤ 1 when a
    reranker is active, else 0; fuzz ≤ 1; lev ≤ 1; multiplier ≤
    ``max_type_multiplier``).  Pairs with bge below this are provably
    non-merges (the exception path caps at ``bge * 0.5`` ≤ 0.5 < any sane
    threshold), so candidate scoring can skip the string cascade for them —
    a cheap vectorized dot-product prefilter."""
    if cfg.bge_weight <= 0:
        return float("-inf")
    ce_max = 0.0 if cfg.reranker == "none" else 1.0
    rest = (cfg.cross_encoder_weight * ce_max + cfg.fuzz_weight
            + cfg.levenshtein_weight)
    return (cfg.high_threshold / max_type_multiplier(cfg) - rest) / cfg.bge_weight


class MentionPre:
    """Precomputed string forms for one side of the pair-scoring cascade:
    token-sorted name/aliases (the expensive re-sort inside every
    ``token_sort_ratio`` call, hoisted out) and the rerank-text token set
    (the ``hash_ce_raw`` split, hoisted out).  Built once per mention per
    batch; the KB side is built once per actor (KnowledgeBase.__init__)."""

    __slots__ = ("name", "aliases", "name_sorted", "aliases_sorted",
                 "rr_tokens", "type")

    def __init__(self, name: str, aliases: Sequence[str], mtype,
                 rerank: str):
        from .strings import token_sort

        self.name = name
        self.aliases = list(aliases)
        self.name_sorted = token_sort(name)
        self.aliases_sorted = [token_sort(a) for a in self.aliases]
        self.rr_tokens = frozenset(rerank.split())
        self.type = mtype


class PairKernel:
    """Exact-semantics cached pair scorer for the decisions hot loop.

    Semantics are IDENTICAL to ``comprehensive_score`` (equivalence-tested
    in tests/test_scoring.py) for reranker modes ``hash_ce`` / ``none``;
    the speed comes from three exact transformations:

    - precomputed token-sorted strings + rerank token sets (MentionPre),
      so no per-pair ``str.split``/``sorted`` work;
    - memoized unique string-pair kernels (ratio / levenshtein_norm) with
      equality short-circuits — candidate names repeat across mentions, so
      the same (a, b) pair is computed once per actor, not once per pair;
    - the caches are bounded (cleared past ``_CACHE_MAX`` entries) so a
      long-lived actor streaming 10^9 mentions cannot grow without bound.

    ``score_bound`` gives an upper bound on ``final_score`` given only the
    cheap components (bge + ce + type multiplier; fuzz, lev ≤ 1 by
    construction) — callers that only need the ARGMAX candidate
    (decide-one semantics, disambiguation.py:137-154 keeps only the best)
    can skip the string cascade for candidates whose bound cannot beat the
    running best.  Exactness argument: ``bound ≥ final`` always, and the
    reference keeps the FIRST candidate on final-score ties (strict ``>``),
    so any candidate with ``bound <= best`` can never replace the best.
    """

    _CACHE_MAX = 200_000

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        if cfg.reranker == "cross_encoder":
            raise ValueError(
                "PairKernel is the deterministic fast path; "
                "reranker='cross_encoder' must score via comprehensive_score")
        self.cfg = cfg
        self._ratio_cache: dict[tuple[str, str], float] = {}
        self._lev_cache: dict[tuple[str, str], float] = {}

    # -- cached kernels ---------------------------------------------------
    def _ratio(self, a_sorted: str, b_sorted: str) -> float:
        """token_sort_ratio/100 over PRE-SORTED token strings."""
        if a_sorted == b_sorted:
            return 1.0  # ratio of equal strings is 100 (incl. both empty)
        key = (a_sorted, b_sorted)
        v = self._ratio_cache.get(key)
        if v is None:
            from .strings import ratio

            v = ratio(a_sorted, b_sorted) / 100.0
            if len(self._ratio_cache) > self._CACHE_MAX:
                self._ratio_cache.clear()
            self._ratio_cache[key] = v
        return v

    def _lev(self, a: str, b: str) -> float:
        if a == b:
            # levenshtein_norm(x, x) = 1.0 except BOTH-empty → 0.0
            return 1.0 if a else 0.0
        key = (a, b)
        v = self._lev_cache.get(key)
        if v is None:
            from .strings import levenshtein_norm

            v = levenshtein_norm(a, b)
            if len(self._lev_cache) > self._CACHE_MAX:
                self._lev_cache.clear()
            self._lev_cache[key] = v
        return v

    # -- per-component scores (reference max-over-pairs structure) -------
    def ce(self, a: MentionPre, b: MentionPre) -> float:
        """hash_ce: normalize(hash_ce_raw) over precomputed token sets —
        bit-identical to the string path (same float expression)."""
        cfg = self.cfg
        if cfg.reranker != "hash_ce":
            return 0.0  # reranker="none": reference degradation, ce = 0.0
        union = len(a.rr_tokens | b.rr_tokens)
        jac = (len(a.rr_tokens & b.rr_tokens) / union) if union else 0.0
        raw = cfg.ce_norm_min + jac * (cfg.ce_norm_max - cfg.ce_norm_min)
        return normalize_crossencoder_score(raw, cfg)

    def fuzz(self, a: MentionPre, b: MentionPre) -> float:
        best = self._ratio(a.name_sorted, b.name_sorted)
        for ia in a.aliases_sorted:
            for cb in b.aliases_sorted:
                s = self._ratio(ia, cb)
                if s > best:
                    best = s
        for ia in a.aliases_sorted:
            s = self._ratio(ia, b.name_sorted)
            if s > best:
                best = s
        for cb in b.aliases_sorted:
            s = self._ratio(a.name_sorted, cb)
            if s > best:
                best = s
        return best

    def lev(self, a: MentionPre, b: MentionPre) -> float:
        best = self._lev(a.name, b.name)
        for ia in a.aliases:
            for cb in b.aliases:
                s = self._lev(ia, cb)
                if s > best:
                    best = s
        for ia in a.aliases:
            s = self._lev(ia, b.name)
            if s > best:
                best = s
        for cb in b.aliases:
            s = self._lev(a.name, cb)
            if s > best:
                best = s
        return best

    # -- fused pair score -------------------------------------------------
    def score_bound(self, bge: float, ce_score: float, mult: float) -> float:
        """Upper bound on final_score: fuzz ≤ 1, lev ≤ 1."""
        cfg = self.cfg
        return (bge * cfg.bge_weight + ce_score * cfg.cross_encoder_weight
                + cfg.fuzz_weight + cfg.levenshtein_weight) * mult

    def score(self, a: MentionPre, b: MentionPre, bge: float,
              ce_score: float | None = None,
              mult: float | None = None) -> PairScore:
        """= comprehensive_score for hash_ce/none modes (no exception path
        is reachable: every kernel here is pure string/set arithmetic; the
        reference's try/except guards the CE MODEL predict call, which this
        path never makes)."""
        cfg = self.cfg
        if ce_score is None:
            ce_score = self.ce(a, b)
        if mult is None:
            mult = type_multiplier(a.type, b.type, cfg)
        s = PairScore(bge_score=bge, cross_encoder_score=ce_score)
        s.fuzz_score = self.fuzz(a, b)
        s.levenshtein_score = self.lev(a, b)
        s.final_score = (
            s.bge_score * cfg.bge_weight
            + s.cross_encoder_score * cfg.cross_encoder_weight
            + s.fuzz_score * cfg.fuzz_weight
            + s.levenshtein_score * cfg.levenshtein_weight
        ) * mult
        return s


def make_decision(
    final_score: float,
    force_decision: bool = False,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> str:
    """disambiguation.py:381-407."""
    if final_score >= cfg.high_threshold:
        return MERGE
    if final_score <= cfg.low_threshold:
        return CREATE
    if force_decision:
        if final_score > (cfg.high_threshold + cfg.low_threshold) / 2:
            return MERGE
        return CREATE
    return AMBIGUOUS


def decision_reasoning(decision: str, final_score: float,
                       cfg: EngineConfig = DEFAULT_CONFIG) -> str:
    """English rendering of disambiguation.py:389-407 reasoning strings."""
    if decision == MERGE:
        return f"score {final_score:.3f} >= {cfg.high_threshold}: merge"
    if decision == CREATE:
        return f"score {final_score:.3f} <= {cfg.low_threshold}: create"
    return (
        f"score {final_score:.3f} in ambiguous band "
        f"[{cfg.low_threshold}, {cfg.high_threshold}]"
    )
