"""Engine configuration.

Mirrors the reference constants in ``config/settings.py:7-115`` of
baixie-g/EntityDisambiguation (read at /root/reference): decision thresholds
(settings.py:14-15), retrieval fan-out (settings.py:18-19), fusion weights
(settings.py:56-59), type multipliers (settings.py:64-65), embedding dim
(settings.py:106).  Everything else (paths, parallelism knobs) is new,
engine-side configuration with no reference counterpart.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    # --- reference-conformant scoring constants -------------------------
    # config/settings.py:14-15
    high_threshold: float = 0.72
    low_threshold: float = 0.60
    # config/settings.py:18-19
    faiss_top_k: int = 10
    cross_encoder_top_k: int = 5  # declared but unused in the reference too
    # config/settings.py:56-59
    bge_weight: float = 0.4
    cross_encoder_weight: float = 0.3
    fuzz_weight: float = 0.2
    levenshtein_weight: float = 0.1
    # config/settings.py:64-65
    type_mismatch_penalty: float = 0.1
    type_match_bonus: float = 1.0
    # services/disambiguation.py:44-46 — CrossEncoder linear normalization range
    ce_norm_min: float = -6.5
    ce_norm_max: float = 7.7
    # config/settings.py:106
    embedding_dim: int = 1024

    # --- engine-side knobs ---------------------------------------------
    # encoder: "hash" = deterministic sha256-seeded vectors (CI-safe,
    # mirrors vectorization.py:315-334 semantics but cluster-stable and
    # L2-normalized like BGE-M3's dense output); "bge" would load
    # FlagEmbedding (unavailable in this sandbox; gated behind import-try).
    encoder: str = "hash"
    # reranker: "none" = reference degradation path (disambiguation.py:116-118
    # — CE load failure leaves cross_encoder=None and ce_score=0.0);
    # "hash_ce" = deterministic pseudo-cross-encoder (token-Jaccard mapped
    # into the reference's raw [-6.5, 7.7] score range so the
    # normalize_crossencoder_score clamp reproduces Jaccard exactly);
    # "cross_encoder" would load ms-marco-MiniLM (unavailable here).
    reranker: str = "hash_ce"
    # candidate generation: "global" = exact IndexFlatIP-equivalent search
    # over a broadcast KB matrix (reference-exact, vectorization.py:516);
    # "blocked" = name/type blocking + per-block index (the 100 TB path).
    candidate_gen: str = "global"
    # round-2 canonicalization: score created entities against each other
    # (blocked, self-excluded) and union-find the merge edges — the batch
    # equivalent of the reference's online merges into just-created
    # entities (SURVEY.md §2.9/§7.4 order-dependence).
    round2_dedup: bool = True

    # batch / parallelism knobs (per-stage defaults; sized so that
    # batch_size x concurrency fits a 4 GB worker heap at 1024-dim fp32)
    extract_batch_size: int = 256
    embed_batch_size: int = 512
    score_batch_size: int = 1024
    n_salt: int = 16  # hot-key salt fan-out for the blocked path
    # broadcast the sig→canonical map while it fits every worker; beyond
    # this row count, edge endpoints are resolved via co-partitioned
    # shuffle hash joins instead (pipelines/kg.rewrite_edges_join)
    canonical_map_broadcast_max: int = 2_000_000
    # canonicalization execution mode (pipelines/kg.canonicalize_and_rewrite):
    # "driver" collects the KB-proportional decisions table to pandas (fast
    # at sandbox scale), "distributed" keeps decisions / entities / the
    # canonical remap Dataset-resident end to end (the 10^12-page path,
    # equivalence-tested byte-identical), "auto" switches at
    # canonicalize_driver_max decision rows
    canonicalize: str = "auto"
    canonicalize_driver_max: int = 2_000_000
    # incremental mode: path to a prior run's entities parquet
    # (write_graph_outputs' ``{out_dir}/entities``) used as the KB instead
    # of the seed corpus — the batch equivalent of the reference's KB
    # growing across /auto-decide requests (disambiguation.py:120-166).
    # On a cluster the path must be on shared storage, like any input.
    kb_path: str | None = None

    def weights(self) -> tuple[float, float, float, float]:
        return (
            self.bge_weight,
            self.cross_encoder_weight,
            self.fuzz_weight,
            self.levenshtein_weight,
        )

    @classmethod
    def from_env(cls, env=None) -> "EngineConfig":
        """Environment overrides, mirroring the reference's pydantic
        settings-from-env behavior (config/settings.py:113-114): any field
        can be overridden via ``ED_RAY_<FIELD_UPPER>``, e.g.
        ``ED_RAY_HIGH_THRESHOLD=0.8 ED_RAY_RERANKER=none``."""
        import os

        env = os.environ if env is None else env
        kwargs = {}
        for f in cls.__dataclass_fields__.values():
            raw = env.get(f"ED_RAY_{f.name.upper()}")
            if raw is None:
                continue
            if f.type in ("float", float):
                kwargs[f.name] = float(raw)
            elif f.type in ("int", int):
                kwargs[f.name] = int(raw)
            elif f.type in ("bool", bool):
                kwargs[f.name] = raw.lower() in ("1", "true", "yes")
            else:
                kwargs[f.name] = raw
        return cls(**kwargs)


DEFAULT_CONFIG = EngineConfig()


def get_config() -> EngineConfig:
    """Resolve the effective config at an entry point: defaults + any
    ``ED_RAY_*`` environment overrides (the reference's settings-from-env
    behavior, config/settings.py:113-114).  Library code keeps taking an
    explicit ``cfg`` argument; only entry points (bench, CLI,
    __ray_entry__) call this."""
    return EngineConfig.from_env()

# Reference id-prefix map, neo4j_database.py:475-485 (Chinese type → prefix).
TYPE_PREFIX: dict[str, str] = {
    "疾病": "disease",
    "症状": "symptom",
    "药物": "drug",
    "治疗": "treatment",
    "基因": "gene",
    "蛋白质": "protein",
    "器官": "organ",
    "其他": "other",
}
DEFAULT_PREFIX = "entity"
