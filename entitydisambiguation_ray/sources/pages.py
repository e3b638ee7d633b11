"""Deterministic synthetic Common-Crawl-style page corpus.

Produces the ``input_hint`` table ``(url, warc_ts, html, text, lang)``
(FIXTURES.md §1).  Generation is a pure function of the page index and the
seed — page i's bytes are identical regardless of which worker, process, or
parallelism level generates it, so corpora can be synthesized distributedly
with ``ray.data.range(n).map_batches(...)`` and still be reproducible.

HTML bodies embed SVO sentences over the seed vocabulary (subject/object
surface forms drawn from the mention dictionary's fixture classes — exact /
alias / typo / type-clash / untyped / novel / hot-key) wrapped in boilerplate
(nav, header, footer, aside, script, style) that the extractor must strip.
"""
from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np

from .seed import SeedEntity, build_seed_entities, build_vocab

PAGE_EPOCH = datetime(2024, 6, 1, 0, 0, 0)

# (subject type, rel_type, zh predicate, en predicate, object type)
_REL_TEMPLATES = [
    ("药物", "treats", "治疗", " treats ", "疾病"),
    ("疾病", "causes", "引起", " causes ", "症状"),
    ("基因", "interacts_with", "相互作用于", " interacts with ", "蛋白质"),
    ("蛋白质", "located_in", "位于", " is located in ", "器官"),
    ("症状", "part_of", "属于", " is part of ", "疾病"),
    ("药物", "inhibits", "抑制", " inhibits ", "蛋白质"),
    ("治疗", "treats", "治疗", " treats ", "疾病"),
]

HOT_FRACTION = 0.2  # hot-key fixture class: head entity on ~20% of pages


class PageVocabulary:
    """Precomputed, deterministic generation state (build once per worker)."""

    def __init__(self):
        self.entities: list[SeedEntity] = build_seed_entities()
        self.mention_dict, self.surfaces = build_vocab(self.entities)
        self.by_type: dict[str, list[int]] = {}
        for k, e in enumerate(self.entities):
            self.by_type.setdefault(e.type or "", []).append(k)
        # hot entities: first disease + first drug
        self.hot = [self.by_type["疾病"][0], self.by_type["药物"][0]]


_VOCAB: PageVocabulary | None = None


def get_vocab() -> PageVocabulary:
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = PageVocabulary()
    return _VOCAB


def _rng_for_page(seed: int, i: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64((seed << 34) ^ i))


def _make_sentence(vocab: PageVocabulary, rng: np.random.Generator,
                   lang: str) -> str:
    st, rel, zh, en, ot = _REL_TEMPLATES[int(rng.integers(len(_REL_TEMPLATES)))]
    subs = vocab.by_type[st]
    objs = vocab.by_type[ot]
    si = subs[int(rng.integers(len(subs)))]
    oi = objs[int(rng.integers(len(objs)))]
    ssurfs = vocab.surfaces[si]
    # novel-class subject on ~8% of sentences
    if rng.random() < 0.08:
        subj = (f"novelterm{int(rng.integers(10000)):04d}" if lang == "en"
                else f"新发现实体{int(rng.integers(10000)):04d}")
    else:
        subj = ssurfs[int(rng.integers(len(ssurfs)))]
    # objects: canonical name half the time, any dictionary surface (alias /
    # typo / clash class) otherwise — both argument positions exercise the
    # full disambiguation cascade
    if rng.random() < 0.5:
        obj = vocab.entities[oi].name
    else:
        osurfs = vocab.surfaces[oi]
        obj = osurfs[int(rng.integers(len(osurfs)))]
    if lang == "en":
        return f"{subj}{en}{obj}."
    return f"{subj}{zh}{obj}。"


def make_page(i: int, seed: int = 42, filler: str | None = None) -> dict:
    """Pure function: page index → one input row."""
    vocab = get_vocab()
    rng = _rng_for_page(seed, i)
    lang = "en" if rng.random() < 0.35 else "zh"
    n_sent = int(rng.integers(3, 9))
    sents = [_make_sentence(vocab, rng, lang) for _ in range(n_sent)]
    if rng.random() < HOT_FRACTION:
        hot = vocab.entities[vocab.hot[int(rng.integers(len(vocab.hot)))]]
        disease0 = vocab.entities[vocab.by_type["疾病"][0]].name
        symptom0 = vocab.entities[vocab.by_type["症状"][0]].name
        if hot.type == "药物":
            sents.append(f"{hot.aliases[0]} treats {disease0}." if lang == "en"
                         else f"{hot.name}治疗{disease0}。")
        else:
            sents.append(f"{hot.aliases[0]} causes {symptom0}." if lang == "en"
                         else f"{hot.name}引起{symptom0}。")
    title = f"Synthetic page {i:06d}"
    paras = "\n".join(f"<p>{s}</p>" for s in sents)
    filler_html = f"<p>{filler}</p>\n" if filler else ""
    html = (
        "<!DOCTYPE html>\n"
        f"<html><head><title>{title}</title>\n"
        "<style>body { font: 14px sans-serif; }</style>\n"
        f"<script>var page={i};</script>\n"
        "</head>\n<body>\n"
        "<header><h1>Synthetic Crawl</h1></header>\n"
        '<nav><ul><li><a href="/">home</a></li><li><a href="/about">about</a></li></ul></nav>\n'
        '<div class="content">\n'
        f"<h1>{title}</h1>\n"
        f"{paras}\n"
        f"{filler_html}"
        "</div>\n"
        "<aside>related: <a href='/x'>x</a></aside>\n"
        "<footer>&copy; 2024 example.org</footer>\n"
        "</body></html>\n"
    )
    return {
        "url": f"https://example.org/p/{i:06d}",
        "warc_ts": PAGE_EPOCH + timedelta(seconds=i),
        "html": html.encode("utf-8"),
        "text": " ".join(sents),
        "lang": lang,
    }


def make_pages_batch(indices, seed: int = 42,
                     fillers: list[str] | None = None) -> dict:
    """Vectorized batch constructor for ``map_batches`` over a range dataset.

    ``fillers`` (optional) are filler paragraphs (e.g. documents.parquet
    text) assigned deterministically by page index.
    """
    rows = []
    for pos, i in enumerate(indices):
        f = None
        if fillers:
            f = fillers[int(i) % len(fillers)]
        rows.append(make_page(int(i), seed=seed, filler=f))
    return {
        "url": np.array([r["url"] for r in rows], dtype=object),
        "warc_ts": np.array([r["warc_ts"] for r in rows], dtype="datetime64[us]"),
        "html": np.array([r["html"] for r in rows], dtype=object),
        "text": np.array([r["text"] for r in rows], dtype=object),
        "lang": np.array([r["lang"] for r in rows], dtype=object),
    }
