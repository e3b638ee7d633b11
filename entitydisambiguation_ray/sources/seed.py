"""Deterministic seed knowledge base + mention dictionary.

Models the reference's ``data/sample_entities.json`` corpus shape (8 medical
entities across 8 Chinese types, each with cross-language aliases, a
definition, ``Dict[str, List[str]]`` attributes, a source and a create_time —
see SURVEY.md §5) and extends it programmatically to ~200 entities with
seed=42, per FIXTURES.md §2.  All content is generated here — nothing is
copied from the reference repo.

Also builds the **mention dictionary** (FIXTURES.md §3): surface form →
enriched mention content, including deliberately "dirty" entries (typos with
the right type, variants with a clashing type, untyped variants) so every
scoring path of the disambiguation cascade is exercised.
"""
from __future__ import annotations

import json
from dataclasses import dataclass
from datetime import datetime, timedelta

from ..functions.hashing import generate_entity_id

# (chinese name, english alias, abbreviation) per type — engine-authored vocabulary
_DISEASES = [
    ("糖尿病", "diabetes", "DM"), ("高血压", "hypertension", "HTN"),
    ("冠心病", "coronary heart disease", "CHD"), ("哮喘", "asthma", "AS"),
    ("肺炎", "pneumonia", "PNA"), ("胃炎", "gastritis", "GST"),
    ("肝炎", "hepatitis", "HEP"), ("贫血", "anemia", "ANE"),
    ("抑郁症", "depression", "MDD"), ("骨质疏松", "osteoporosis", "OP"),
    ("肾炎", "nephritis", "NPH"), ("中风", "stroke", "CVA"),
    ("肥胖症", "obesity", "OB"), ("痛风", "gout", "GT"),
    ("白血病", "leukemia", "LEU"),
]
_SYMPTOMS = [
    ("发热", "fever", "FV"), ("头痛", "headache", "HA"),
    ("咳嗽", "cough", "CG"), ("乏力", "fatigue", "FT"),
    ("恶心", "nausea", "NS"), ("水肿", "edema", "ED"),
    ("眩晕", "vertigo", "VT"), ("胸痛", "chest pain", "CP"),
    ("腹泻", "diarrhea", "DR"), ("失眠", "insomnia", "INS"),
]
_DRUGS = [
    ("阿司匹林", "aspirin", "ASA"), ("二甲双胍", "metformin", "MET"),
    ("青霉素", "penicillin", "PCN"), ("布洛芬", "ibuprofen", "IBU"),
    ("辛伐他汀", "simvastatin", "SIM"), ("氨氯地平", "amlodipine", "AML"),
    ("奥美拉唑", "omeprazole", "OME"), ("泼尼松", "prednisone", "PRD"),
    ("胰岛素注射液", "insulin injection", "INJ"), ("华法林", "warfarin", "WAR"),
]
_TREATMENTS = [
    ("化学疗法", "chemotherapy", "CTX"), ("放射疗法", "radiotherapy", "RT"),
    ("物理疗法", "physiotherapy", "PT"), ("手术治疗", "surgical treatment", "SX"),
    ("饮食控制", "diet control", "DC"), ("运动疗法", "exercise therapy", "ET"),
]
_GENES = [
    ("TP53基因", "TP53", "TP53"), ("BRCA1基因", "BRCA1", "BRCA1"),
    ("EGFR基因", "EGFR", "EGFR"), ("KRAS基因", "KRAS", "KRAS"),
    ("APOE基因", "APOE", "APOE"),
]
_PROTEINS = [
    ("胰岛素", "insulin", "INS-P"), ("血红蛋白", "hemoglobin", "HGB"),
    ("白蛋白", "albumin", "ALB"), ("肌钙蛋白", "troponin", "TNI"),
    ("干扰素", "interferon", "IFN"),
]
_ORGANS = [
    ("心脏", "heart", "HRT"), ("肝脏", "liver", "LVR"),
    ("肾脏", "kidney", "KDN"), ("肺", "lung", "LNG"),
    ("胰腺", "pancreas", "PNC"), ("胃", "stomach", "STM"),
]
_MODIFIERS = ["慢性", "急性", "继发性", "原发性"]

_BASE = [
    ("疾病", _DISEASES), ("症状", _SYMPTOMS), ("药物", _DRUGS),
    ("治疗", _TREATMENTS), ("基因", _GENES), ("蛋白质", _PROTEINS),
    ("器官", _ORGANS),
]

EPOCH = datetime(2024, 1, 1, 0, 0, 0)


@dataclass
class SeedEntity:
    id: str
    name: str
    type: str | None
    aliases: list[str]
    definition: str | None
    attributes: str  # JSON-encoded Dict[str, List[str]] (neo4j_database.py:163)
    source: str | None
    create_time: datetime


def build_seed_entities() -> list[SeedEntity]:
    """~200 deterministic entities.  Pure function — identical output in any
    process, at any parallelism level."""
    out: list[SeedEntity] = []
    idx = 0
    symptom_names = [c for c, _, _ in _SYMPTOMS]
    treatment_names = [c for c, _, _ in _TREATMENTS]

    def add(name: str, etype: str, aliases: list[str], definition: str,
            attributes: dict[str, list[str]]):
        nonlocal idx
        out.append(SeedEntity(
            id=generate_entity_id(name, etype),
            name=name,
            type=etype,
            aliases=aliases,
            definition=definition,
            attributes=json.dumps(attributes, ensure_ascii=False),
            source=f"合成语料-{etype}",
            create_time=EPOCH + timedelta(hours=idx),
        ))
        idx += 1

    for etype, rows in _BASE:
        for i, (cn, en, abbr) in enumerate(rows):
            sym = symptom_names[i % len(symptom_names)]
            sym2 = symptom_names[(i + 3) % len(symptom_names)]
            trt = treatment_names[i % len(treatment_names)]
            add(
                cn, etype, [en, abbr],
                f"{cn}是一种常见的{etype}，英文名为{en}。",
                {"相关症状": [sym, sym2], "处理方法": [trt]},
            )
    # modifier expansion for diseases/symptoms → distinct entities sharing
    # tokens with their base (the near-miss scoring band).  All four
    # modifiers per base name → ~100 extra entities (FIXTURES.md §2: ~200).
    for etype, rows in (("疾病", _DISEASES), ("症状", _SYMPTOMS)):
        for i, (cn, en, abbr) in enumerate(rows):
            for j, mod in enumerate(_MODIFIERS):
                sym = symptom_names[(i + j + 1) % len(symptom_names)]
                add(
                    f"{mod}{cn}", etype, [f"{mod[:1]}-{en}", f"{mod}{en}"],
                    f"{mod}{cn}是{cn}的{mod}亚型。",
                    {"相关症状": [sym], "基础疾病": [cn]},
                )
    # dosage-form variants for drugs (distinct entities, shared tokens)
    for i, (cn, en, abbr) in enumerate(_DRUGS):
        form = ("片", "胶囊")[i % 2]
        sym = symptom_names[(i + 2) % len(symptom_names)]
        add(
            f"{cn}{form}", "药物", [f"{en} tablet" if form == "片" else f"{en} capsule"],
            f"{cn}{form}是{cn}的{form}剂型。",
            {"相关症状": [sym], "基础药物": [cn]},
        )
    return out


# --- mention dictionary -----------------------------------------------------

_TYPO_SUB = "口十丁人乙"  # deterministic substitution characters


def _typo(name: str, salt: int) -> str:
    """Deterministic 1-char substitution (levenshtein-path fixture class)."""
    if len(name) < 2:
        return name + "乙"
    pos = (salt + len(name)) % len(name)
    ch = _TYPO_SUB[(salt + pos) % len(_TYPO_SUB)]
    if name[pos] == ch:
        ch = _TYPO_SUB[(salt + pos + 1) % len(_TYPO_SUB)]
    return name[:pos] + ch + name[pos + 1 :]


_NEXT_TYPE = {"疾病": "药物", "症状": "疾病", "药物": "治疗", "治疗": "药物",
              "基因": "蛋白质", "蛋白质": "基因", "器官": "疾病"}


@dataclass
class MentionEntry:
    """Dictionary payload attached to a recognized surface form."""
    name: str
    type: str | None
    aliases: list[str]
    definition: str | None
    attributes: str
    klass: str  # fixture class: exact | alias | typo | type-clash | untyped


def build_vocab(
    entities: list[SeedEntity],
) -> tuple[dict[str, MentionEntry], list[list[str]]]:
    """(surface form → mention content, surfaces per entity index) —
    FIXTURES.md §3 classes.

    A surface recognized in the dictionary yields an enriched mention (the
    dictionary-based half of "dictionary-plus-embedding candidate
    generation"); unknown surfaces become bare untyped mentions.
    """
    d: dict[str, MentionEntry] = {}
    surfaces_by_entity: list[list[str]] = []

    def put(surface: str, entry: MentionEntry, acc: list[str]):
        if surface not in d:
            d[surface] = entry
            acc.append(surface)

    for k, e in enumerate(entities):
        acc: list[str] = []
        surfaces = [e.name, *e.aliases]
        # exact + alias classes: full enrichment, correct type
        for s in surfaces:
            others = [x for x in surfaces if x != s]
            put(s, MentionEntry(s, e.type, others, e.definition, e.attributes,
                                "exact" if s == e.name else "alias"), acc)
        # typo class: 1-edit surface, right type, same content
        t1 = _typo(e.name, k)
        put(t1, MentionEntry(t1, e.type, list(e.aliases), e.definition,
                             e.attributes, "typo"), acc)
        # type-clash class on every 3rd entity: same content, wrong type
        if k % 3 == 0:
            t2 = _typo(e.name, k + 1)
            put(t2, MentionEntry(t2, _NEXT_TYPE.get(e.type or "", "其他"),
                                 list(e.aliases), e.definition, e.attributes,
                                 "type-clash"), acc)
        # untyped class on every 4th entity
        if k % 4 == 0:
            t3 = _typo(e.name, k + 2)
            put(t3, MentionEntry(t3, None, list(e.aliases), e.definition,
                                 e.attributes, "untyped"), acc)
        surfaces_by_entity.append(acc)
    return d, surfaces_by_entity


def build_mention_dict(entities: list[SeedEntity]) -> dict[str, MentionEntry]:
    return build_vocab(entities)[0]


def seed_entities_table() -> list[dict]:
    """Arrow-ready rows for the ``entities_seed`` table (FIXTURES.md §2)."""
    return [
        {
            "id": e.id,
            "name": e.name,
            "type": e.type,
            "aliases": e.aliases,
            "definition": e.definition,
            "attributes": e.attributes,
            "source": e.source,
            "create_time": e.create_time,
        }
        for e in build_seed_entities()
    ]


# ---------------------------------------------------------------------------
# KB resolution for incremental runs.  Reference parity: the /auto-decide KB
# grows across requests (disambiguation.py:120-166) — the batch equivalent is
# run N+1 disambiguating against run N's emitted entities table
# (``cfg.kb_path`` → write_graph_outputs' ``{out_dir}/entities``).


def entities_from_rows(rows: list[dict]) -> list[SeedEntity]:
    """Entity-table rows (e.g. a prior run's ``entities/`` parquet) →
    ``SeedEntity`` list.  Applies the M11 defensive alias parse and accepts
    both alias layouts the two canonicalization modes emit (``aliases``
    native list / ``aliases_json`` string)."""
    out: list[SeedEntity] = []
    for r in rows:
        raw = r.get("aliases")
        if raw is None:
            raw = r.get("aliases_json")
        if isinstance(raw, str):
            try:
                parsed = json.loads(raw)
                aliases = ([str(x) for x in parsed]
                           if isinstance(parsed, list) else [raw])
            except (ValueError, TypeError):
                aliases = [raw] if raw.strip() else []
        elif raw is None:
            aliases = []
        else:
            aliases = [str(x) for x in list(raw)]
        ct = r.get("create_time")
        out.append(SeedEntity(
            id=r["id"], name=r["name"], type=r.get("type"),
            aliases=aliases, definition=r.get("definition"),
            attributes=r.get("attributes") or "{}",
            source=r.get("source"),
            create_time=ct if isinstance(ct, datetime) else EPOCH,
        ))
    return out


_KB_MEMO: dict[tuple, list[SeedEntity]] = {}
_VOCAB_MEMO: dict[tuple | None, tuple] = {}


def kb_cache_key(cfg=None) -> tuple | None:
    """Per-process memo key for the active KB: (path, file fingerprint).
    The fingerprint (name, size, mtime_ns per parquet file) guards against
    serving a stale KB when a chained run REWRITES the entities table at
    the same path within one Ray session — warm workers would otherwise
    hit the path-keyed memo and disambiguate against the old entities.
    A few os.stat calls per batch; no content read."""
    import os

    path = getattr(cfg, "kb_path", None)
    if not path:
        return None
    if os.path.isdir(path):
        fp = tuple(sorted(
            (e.name, e.stat().st_size, e.stat().st_mtime_ns)
            for e in os.scandir(path) if e.is_file()))
    else:
        st = os.stat(path)
        fp = ((os.path.basename(path), st.st_size, st.st_mtime_ns),)
    return (path, fp)


def load_kb_entities(path: str) -> list[SeedEntity]:
    """Load a KB from an entities parquet file/dir written by
    ``write_graph_outputs``, sorted by id so the embedding-matrix row order
    (and therefore candidate tie-breaks) is identical at any read
    parallelism."""
    import pyarrow.parquet as pq

    ents = entities_from_rows(pq.read_table(path).to_pylist())
    ents.sort(key=lambda e: e.id)
    return ents


def kb_entities(cfg=None) -> list[SeedEntity]:
    """The KB the pipeline disambiguates against: ``cfg.kb_path`` (a prior
    run's entities table → incremental mode) or the seed corpus.  Memoized
    per path per process so workers load once, not per batch; the KB is a
    broadcast-small side by design (entity count ≪ mention count)."""
    key = kb_cache_key(cfg)
    if key is None:
        return build_seed_entities()
    ents = _KB_MEMO.get(key)
    if ents is None:
        if len(_KB_MEMO) > 4:  # bound worker memory across KB versions
            _KB_MEMO.clear()
        ents = load_kb_entities(key[0])
        _KB_MEMO[key] = ents
    return ents


def kb_vocab(cfg=None) -> tuple[dict[str, MentionEntry], list[list[str]]]:
    """The mention dictionary for the active KB, process-global per
    ``kb_path`` — mention building, edge rewrite and sig annotation share
    one dictionary build per worker.

    Incremental mode does NOT rebuild ``build_vocab`` over the loaded
    entity list: the typo / type-clash / untyped surface classes are a
    SEED-CORPUS fixture (index-keyed, FIXTURES.md §3) that the synthetic
    page generator draws from, so they must stay byte-identical across
    runs.  The dictionary for a prior-run KB is therefore the seed fixture
    vocab PLUS exact/alias entries for the created (non-seed) entities,
    first-wins so fixture surfaces keep their fixture content — created
    entities are otherwise reached the way the reference reaches them,
    through the embedding index (disambiguation.py:120-166)."""
    key = kb_cache_key(cfg)
    v = _VOCAB_MEMO.get(key)
    if v is None:
        if len(_VOCAB_MEMO) > 4:
            _VOCAB_MEMO.clear()
        if key is None:
            v = build_vocab(build_seed_entities())
        else:
            d, surfaces = build_vocab(build_seed_entities())
            d = dict(d)
            surfaces = list(surfaces)
            seed_ids = {e.id for e in build_seed_entities()}
            for e in kb_entities(cfg):  # id-sorted → deterministic
                if e.id in seed_ids:
                    continue
                acc: list[str] = []
                forms = [e.name, *e.aliases]
                for s in forms:
                    if s not in d:
                        others = [x for x in forms if x != s]
                        d[s] = MentionEntry(
                            s, e.type, others, e.definition, e.attributes,
                            "exact" if s == e.name else "alias")
                        acc.append(s)
                surfaces.append(acc)
            v = (d, surfaces)
        _VOCAB_MEMO[key] = v
    return v


def kb_entities_table(cfg=None) -> list[dict]:
    """Arrow-ready rows for the active KB (generalizes
    ``seed_entities_table`` to incremental runs)."""
    return [
        {
            "id": e.id,
            "name": e.name,
            "type": e.type,
            "aliases": e.aliases,
            "definition": e.definition,
            "attributes": e.attributes,
            "source": e.source,
            "create_time": e.create_time,
        }
        for e in kb_entities(cfg)
    ]
