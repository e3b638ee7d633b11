"""Text-analysis operators for large-scale training-data pipelines.

All stateless, vectorized ``map_batches`` transforms over Arrow batches
(pyarrow.compute kernels; no Python loop over rows in the hot path except
where a hash must be computed per document, which is cheap relative to I/O).

Operators: token counting, quality scoring (length / punctuation / stopword /
alpha ratios), language identification (CJK/ASCII n-gram heuristic), document
fingerprinting (md5 content hash + 64-bit rolling polynomial hash).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# token = maximal run of non-whitespace (matches `\S+` in the duckdb oracle)
_TOKEN_RE = r"\S+"
_PUNCT_RE = r"[.,;:!?。！？，；：]"
_ALPHA_RE = r"[A-Za-z]"
_CJK_RE = r"[\x{4e00}-\x{9fff}]"

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds ``token_count`` (whitespace tokens, `\\S+` semantics)."""
    n = pc.count_substring_regex(batch.column(text_col), _TOKEN_RE)
    return batch.append_column("token_count", pc.cast(n, pa.int64()))


# GPT-2-style pre-tokenizer, restricted to RE2-compatible constructs (no
# lookahead — Arrow's count_substring_regex and DuckDB's regexp_extract_all
# BOTH run RE2 with default leftmost-first alternation, so the oracle and
# the engine share regex semantics bit-for-bit): contraction suffixes,
# optionally space-prefixed letter runs / digit runs / punctuation runs,
# residual whitespace runs.  The proxy every LLM-cost estimator needs when
# the real BPE merges table isn't loadable (weights absent in sandbox).
_BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds ``bpe_token_count`` (GPT-2-ish pre-tokenizer segment count —
    the standard fast token-cost proxy; see ``_BPE_RE``)."""
    n = pc.count_substring_regex(batch.column(text_col), _BPE_RE)
    return batch.append_column("bpe_token_count", pc.cast(n, pa.int64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds quality-signal columns:
    ``n_chars_q`` (length), ``punct_ratio``, ``alpha_ratio``,
    ``stopword_ratio`` (stopword tokens / tokens), ``avg_token_len``."""
    text = batch.column(text_col)
    length = pc.cast(pc.utf8_length(text), pa.float64())
    safe_len = pc.max_element_wise(length, 1.0)
    tokens = pc.cast(pc.count_substring_regex(text, _TOKEN_RE), pa.float64())
    safe_tok = pc.max_element_wise(tokens, 1.0)
    punct = pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.float64())
    alpha = pc.cast(pc.count_substring_regex(text, _ALPHA_RE), pa.float64())
    stop = pa.array(np.zeros(batch.num_rows))
    for w in _STOPWORDS:
        stop = pc.add(stop, pc.cast(
            pc.count_substring_regex(text, rf"\b{w}\b"), pa.float64()))
    batch = batch.append_column("n_chars_q", pc.cast(length, pa.int64()))
    batch = batch.append_column("punct_ratio", pc.divide(punct, safe_len))
    batch = batch.append_column("alpha_ratio", pc.divide(alpha, safe_len))
    batch = batch.append_column("stopword_ratio", pc.divide(stop, safe_tok))
    batch = batch.append_column(
        "avg_token_len",
        pc.divide(pc.subtract(length, pc.subtract(tokens, 1.0)), safe_tok),
    )
    return batch


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds ``lang_pred``: 'zh' when >20% of characters are CJK, else 'en'.

    A deliberately simple deterministic heuristic (no model weights in this
    environment); the SQL oracle reproduces it exactly, and accuracy against
    the corpus's true ``lang`` labels is asserted in pytest for zh/en."""
    text = batch.column(text_col)
    length = pc.cast(pc.utf8_length(text), pa.float64())
    safe_len = pc.max_element_wise(length, 1.0)
    cjk = pc.cast(pc.count_substring_regex(text, _CJK_RE), pa.float64())
    ratio = pc.divide(cjk, safe_len)
    pred = pc.if_else(pc.greater(ratio, 0.2),
                      pa.scalar("zh"), pa.scalar("en"))
    return batch.append_column("lang_pred", pred)


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      include_roll: bool = False) -> pa.Table:
    """Adds ``fp_md5`` (hex content hash; the exact-dedup key) and — only
    when ``include_roll=True`` — ``fp_roll`` (64-bit polynomial rolling
    hash, base 1000003 mod 2^61-1, an order-sensitive document sketch).
    The rolling hash is per-byte interpreted Python, so it is opt-in:
    consumers that only need the dedup key (exact_dedup, the fingerprint
    query) must not pay O(corpus bytes) for a column they drop."""
    texts = batch.column(text_col).to_pylist()
    md5s = []
    rolls = []
    MOD = (1 << 61) - 1
    BASE = 1000003
    for s in texts:
        b = (s or "").encode("utf-8")
        md5s.append(hashlib.md5(b).hexdigest())
        if include_roll:
            h = 0
            for byte in b:
                h = (h * BASE + byte) % MOD
            rolls.append(h)
    batch = batch.append_column("fp_md5", pa.array(md5s, type=pa.string()))
    if include_roll:
        batch = batch.append_column("fp_roll",
                                    pa.array(rolls, type=pa.uint64()))
    return batch

def gopher_flags_batch(batch: pa.Table, text_col: str = "text",
                       min_tokens: int = 20, max_tokens: int = 90,
                       min_awl: float = 4.0, max_awl: float = 5.0,
                       min_stop_hits: int = 2) -> pa.Table:
    """Gopher-style document quality RULES (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", §A1.1 quality heuristics), adapted to
    this corpus's ranges: per document, boolean flags for
    (1) word count within [min_tokens, max_tokens],
    (2) mean word length within [min_awl, max_awl],
    (3) at least ``min_stop_hits`` stopword occurrences —
    plus ``keep`` = all three.  All-Arrow kernels (count_substring_regex),
    no Python row loop; the flags are exact-reproducible in SQL because
    both engines compare the same IEEE doubles built from the same integer
    counts."""
    text = batch.column(text_col)
    length = pc.cast(pc.utf8_length(text), pa.float64())
    tokens = pc.cast(pc.count_substring_regex(text, _TOKEN_RE), pa.float64())
    safe_tok = pc.max_element_wise(tokens, 1.0)
    # mean word length over whitespace-separated tokens: total non-separator
    # chars = length - (tokens - 1) single-space separators (corpus texts
    # are single-space joined; the SQL oracle uses the identical formula).
    awl = pc.divide(pc.subtract(length, pc.subtract(tokens, 1.0)), safe_tok)
    stop = pa.array(np.zeros(batch.num_rows))
    for w in _STOPWORDS:
        stop = pc.add(stop, pc.cast(
            pc.count_substring_regex(text, rf"\b{w}\b"), pa.float64()))
    ok_wc = pc.and_(pc.greater_equal(tokens, float(min_tokens)),
                    pc.less_equal(tokens, float(max_tokens)))
    ok_awl = pc.and_(pc.greater_equal(awl, min_awl),
                     pc.less_equal(awl, max_awl))
    ok_stop = pc.greater_equal(stop, float(min_stop_hits))
    batch = batch.append_column("ok_wordcount", ok_wc)
    batch = batch.append_column("ok_wordlen", ok_awl)
    batch = batch.append_column("ok_stopwords", ok_stop)
    batch = batch.append_column("keep", pc.and_(pc.and_(ok_wc, ok_awl),
                                                ok_stop))
    return batch
