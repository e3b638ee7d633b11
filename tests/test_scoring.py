"""Scoring / decision semantics vs the reference formulas
(services/disambiguation.py:42-51, 259-311, 381-425)."""
import numpy as np
import pytest

from entitydisambiguation_ray.config import DEFAULT_CONFIG, EngineConfig
from entitydisambiguation_ray.functions.encoder import HashEncoder
from entitydisambiguation_ray.functions.scoring import (
    AMBIGUOUS,
    CREATE,
    MERGE,
    comprehensive_score,
    hash_ce_raw,
    make_decision,
    normalize_crossencoder_score,
    type_multiplier,
)
from entitydisambiguation_ray.functions.textbuild import embed_text, rerank_text


def test_normalize_ce_clamp():
    assert normalize_crossencoder_score(-6.5) == 0.0
    assert normalize_crossencoder_score(7.7) == 1.0
    assert normalize_crossencoder_score(-100.0) == 0.0
    assert normalize_crossencoder_score(100.0) == 1.0
    mid = normalize_crossencoder_score(0.6)  # (0.6+6.5)/14.2
    assert mid == pytest.approx((0.6 + 6.5) / 14.2)


def test_type_multiplier_three_cases():
    assert type_multiplier(None, "疾病") == 1.0
    assert type_multiplier("疾病", None) == 1.0
    assert type_multiplier("疾病", "疾病") == 1.0  # TYPE_MATCH_BONUS
    assert type_multiplier("疾病", "药物") == 0.1  # TYPE_MISMATCH_PENALTY


def test_hash_ce_is_jaccard_after_normalization():
    raw = hash_ce_raw("a b c", "a b d")
    assert normalize_crossencoder_score(raw) == pytest.approx(2 / 4)
    assert normalize_crossencoder_score(hash_ce_raw("x", "x")) == 1.0
    assert normalize_crossencoder_score(hash_ce_raw("x", "y")) == 0.0


def test_decision_thresholds():
    assert make_decision(0.72) == MERGE
    assert make_decision(0.7201) == MERGE
    assert make_decision(0.60) == CREATE
    assert make_decision(0.599) == CREATE
    assert make_decision(0.65) == AMBIGUOUS
    # force mode splits at midpoint (0.72+0.6)/2 (disambiguation.py:398);
    # in IEEE754 that midpoint is 0.6599999999999999, so 0.66 itself merges —
    # matching the reference's float arithmetic exactly
    assert make_decision(0.661, force_decision=True) == MERGE
    assert make_decision(0.66, force_decision=True) == MERGE
    assert make_decision(0.659, force_decision=True) == CREATE


def test_comprehensive_score_fusion_weights():
    # identical entities, same type, hash_ce reranker → every signal = 1.0
    s = comprehensive_score(
        "糖尿病", ["diabetes"], "疾病", "糖尿病 diabetes",
        "糖尿病", ["diabetes"], "疾病", "糖尿病 diabetes",
        bge_score=1.0,
    )
    assert s.cross_encoder_score == 1.0
    assert s.fuzz_score == 1.0
    assert s.levenshtein_score == 1.0
    assert s.final_score == pytest.approx(0.4 + 0.3 + 0.2 + 0.1)
    assert make_decision(s.final_score) == MERGE


def test_comprehensive_score_type_mismatch_penalty():
    s = comprehensive_score(
        "糖尿病", [], "疾病", "糖尿病",
        "糖尿病", [], "药物", "糖尿病",
        bge_score=1.0,
    )
    assert s.final_score == pytest.approx(1.0 * 0.1)
    assert make_decision(s.final_score) == CREATE


def test_reranker_none_degradation():
    cfg = EngineConfig(reranker="none")
    s = comprehensive_score(
        "x", [], None, "x", "x", [], None, "x", bge_score=1.0, cfg=cfg
    )
    assert s.cross_encoder_score == 0.0
    # ce off caps identical pairs at 0.7 → never reaches the 0.72 merge bar,
    # the reference's real behavior when CrossEncoder fails to load
    assert s.final_score == pytest.approx(0.7)
    assert make_decision(s.final_score) == AMBIGUOUS


def test_m1_m2_text_builder_asymmetry():
    # M1 has no attributes; M2 appends "k: v1, v2" segments
    attrs = '{"symptom": ["口渴", "多尿"]}'
    m1 = rerank_text("糖尿病", ["diabetes"], "慢性病")
    m2 = embed_text("糖尿病", ["diabetes"], "慢性病", attrs)
    assert m1 == "糖尿病 diabetes 慢性病"
    assert m2 == "糖尿病 diabetes 慢性病 symptom: 口渴, 多尿"


def test_hash_encoder_deterministic_and_normalized():
    enc = HashEncoder(dim=1024)
    v1 = enc.encode_one("糖尿病 diabetes")
    v2 = HashEncoder(dim=1024).encode_one("糖尿病 diabetes")  # fresh cache
    assert np.array_equal(v1, v2)
    assert v1.dtype == np.float32
    assert np.linalg.norm(v1) == pytest.approx(1.0, abs=1e-5)
    batch = enc.encode(["a", "b", "a"])
    assert batch.shape == (3, 1024)
    assert np.array_equal(batch[0], batch[2])
    assert not np.array_equal(batch[0], batch[1])
    # disjoint features ≈ orthogonal
    assert abs(float(batch[0] @ batch[1])) < 0.2


def test_hash_encoder_similarity_structure():
    enc = HashEncoder(dim=1024)
    base = enc.encode_one("糖尿病 diabetes DM 慢性代谢疾病")
    reorder = enc.encode_one("diabetes 糖尿病 DM 慢性代谢疾病")
    typo = enc.encode_one("糖尿症 diabetes DM 慢性代谢疾病")
    unrelated = enc.encode_one("阿司匹林 aspirin 解热镇痛药")
    # same token multiset → identical direction
    assert float(base @ reorder) == pytest.approx(1.0, abs=1e-5)
    # one-character edit in one token → still highly similar
    assert float(base @ typo) > 0.75
    # unrelated → near-orthogonal
    assert abs(float(base @ unrelated)) < 0.25
    # empty text → zero vector
    assert np.linalg.norm(enc.encode_one("")) == 0.0


def test_config_from_env():
    from entitydisambiguation_ray.config import EngineConfig

    env = {"ED_RAY_HIGH_THRESHOLD": "0.8", "ED_RAY_RERANKER": "none",
           "ED_RAY_FAISS_TOP_K": "5", "ED_RAY_ROUND2_DEDUP": "false"}
    cfg = EngineConfig.from_env(env)
    assert cfg.high_threshold == 0.8
    assert cfg.reranker == "none"
    assert cfg.faiss_top_k == 5
    assert cfg.round2_dedup is False
    # untouched fields keep defaults
    assert cfg.low_threshold == 0.6


def test_m11_defensive_alias_parse():
    from entitydisambiguation_ray.stages.disambiguate import _parse_aliases

    assert _parse_aliases(None) == []
    assert _parse_aliases([]) == []
    assert _parse_aliases(["a", "b"]) == ["a", "b"]
    assert _parse_aliases("[]") == []
    assert _parse_aliases('["x", "y"]') == ["x", "y"]
    assert _parse_aliases("bare alias") == ["bare alias"]  # non-JSON string
    assert _parse_aliases('{"not": "a list"}') == ['{"not": "a list"}']
    assert _parse_aliases(42) == []
    assert _parse_aliases("") == []


def test_bge_encoder_gated_on_missing_dependency():
    from entitydisambiguation_ray.functions.encoder import make_encoder

    with pytest.raises((RuntimeError, ValueError)):
        make_encoder("bge")  # FlagEmbedding absent in this environment
    with pytest.raises(ValueError):
        make_encoder("nonsense")


# ---------------------------------------------------------------------------
# PairKernel (the cached + bound-pruned decisions fast path) must be
# bit-identical to comprehensive_score for the deterministic reranker modes.
# ---------------------------------------------------------------------------
def _rand_entity(rng):
    words = ["alpha", "beta", "gamma", "delta", "血红蛋白", "心脏", "x1", "q"]
    name = " ".join(rng.choice(words, size=rng.integers(1, 4)).tolist())
    aliases = [" ".join(rng.choice(words, size=rng.integers(1, 3)).tolist())
               for _ in range(rng.integers(0, 3))]
    mtype = ["疾病", "药物", "检查", "", None][rng.integers(0, 5)] or None
    definition = " ".join(rng.choice(words, size=rng.integers(0, 6)).tolist())
    return name, aliases, mtype, definition


@pytest.mark.parametrize("reranker", ["hash_ce", "none"])
def test_pairkernel_matches_comprehensive_score(reranker):
    from entitydisambiguation_ray.functions.scoring import (
        MentionPre,
        PairKernel,
    )

    cfg = EngineConfig(reranker=reranker)
    k = PairKernel(cfg)
    rng = np.random.default_rng(7)
    for _ in range(200):
        na, aa, ta, da = _rand_entity(rng)
        nb, ab, tb, db = _rand_entity(rng)
        ra, rb = rerank_text(na, aa, da), rerank_text(nb, ab, db)
        bge = float(rng.uniform(-0.2, 1.0))
        ref = comprehensive_score(na, aa, ta, ra, nb, ab, tb, rb, bge, cfg)
        pa_, pb_ = MentionPre(na, aa, ta, ra), MentionPre(nb, ab, tb, rb)
        got = k.score(pa_, pb_, bge)
        assert got.final_score == ref.final_score  # bit-identical
        assert got.fuzz_score == ref.fuzz_score
        assert got.levenshtein_score == ref.levenshtein_score
        assert got.cross_encoder_score == ref.cross_encoder_score
        # the prune bound must dominate the achieved final score
        from entitydisambiguation_ray.functions.scoring import (
            type_multiplier as tm,
        )

        assert k.score_bound(bge, got.cross_encoder_score,
                             tm(ta, tb, cfg)) >= got.final_score


def test_pairkernel_empty_vs_empty_lev_edge():
    from entitydisambiguation_ray.functions.scoring import (
        MentionPre,
        PairKernel,
    )

    cfg = EngineConfig(reranker="hash_ce")
    k = PairKernel(cfg)
    # both-empty names: levenshtein_norm("","") == 0.0 (NOT 1.0) — the
    # equality short-circuit must preserve the reference edge case
    ref = comprehensive_score("", [], None, "", "", [], None, "", 0.3, cfg)
    got = k.score(MentionPre("", [], None, ""), MentionPre("", [], None, ""),
                  0.3)
    assert got.final_score == ref.final_score
    assert got.levenshtein_score == ref.levenshtein_score == 0.0


def test_pairkernel_rejects_cross_encoder_mode():
    from entitydisambiguation_ray.functions.scoring import PairKernel

    with pytest.raises(ValueError):
        PairKernel(EngineConfig(reranker="cross_encoder"))


def test_decide_one_prune_matches_unpruned():
    """Disambiguator with bound pruning must produce the identical decision
    tuple as an exhaustive comprehensive_score argmax over the same
    candidates (keep-first tie semantics included)."""
    import json as _json

    from entitydisambiguation_ray.stages.disambiguate import Disambiguator

    cfg = EngineConfig(reranker="hash_ce")
    d = Disambiguator(cfg=cfg)
    rng = np.random.default_rng(11)
    # use real KB rows as mention inputs (guaranteed candidate overlap +
    # exact ties), plus randomized variants
    rows = d.kb.rows
    cases = []
    for i in rng.choice(len(rows), size=min(40, len(rows)), replace=False):
        r = rows[int(i)]
        cases.append((r["name"], r["type"], r["aliases"],
                      r.get("definition") or "",
                      r.get("attributes")))
    for _ in range(20):
        n, a, t, df = _rand_entity(rng)
        cases.append((n, t, a, df, None))
    for name, mtype, aliases, definition, attrs in cases:
        et = embed_text(name, aliases, definition, attrs)
        rt = rerank_text(name, aliases, definition)
        vec = d.encoder.encode([et])[0]
        got = d.decide_one(name, mtype, aliases, rt, vec)
        # exhaustive oracle over the same candidate list
        cands = d.kb.candidates(vec, mtype, cfg.faiss_top_k)
        best, best_row = None, None
        for ki, bge in cands:
            row = d.kb.rows[ki]
            s = comprehensive_score(name, aliases, mtype, rt, row["name"],
                                    row["aliases"], row["type"],
                                    row["rerank_text"], bge, cfg)
            if best is None or s.final_score > best.final_score:
                best, best_row = s, row
        assert got[7] == best.final_score  # final
        assert got[3] == best.bge_score
        assert got[4] == best.cross_encoder_score
        assert got[5] == best.fuzz_score
        assert got[6] == best.levenshtein_score
        if got[0] == MERGE:
            assert got[1] == best_row["id"]
            assert got[2] == best_row["name"]
