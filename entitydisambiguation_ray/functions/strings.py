"""String-similarity kernels reproducing the reference's scoring functions.

The reference uses ``rapidfuzz.fuzz.token_sort_ratio`` (pinned 3.5.2,
requirements.txt:14) and ``Levenshtein.distance`` (python-Levenshtein 0.21.1,
requirements.txt:19) — see services/disambiguation.py:317-331 and :347-369.
Neither package is available here, so both algorithms are re-implemented from
their public definitions:

- ``levenshtein`` — unit-cost edit distance, Myers' bit-parallel algorithm
  (Myers 1999, "A fast bit-vector algorithm for approximate string matching").
- ``indel_distance`` — insert/delete-only distance = len(a)+len(b)-2*LCS,
  via Hyyrö's bit-parallel LCS (Hyyrö 2004).  rapidfuzz's ``fuzz.ratio`` is
  the normalized Indel similarity: ``(1 - indel/(len(a)+len(b))) * 100``.
- ``token_sort_ratio`` — whitespace-split tokens, sorted, joined with a
  single space, then ``ratio``.  rapidfuzz 3.x applies NO default processor
  (no lowercasing / punctuation stripping), matching the pinned version's
  behavior for the reference's calls (no ``processor=`` argument passed).

All functions are exact (validated against naive DP in tests) and fast enough
for the hot pair-scoring loop (O(len) per comparison for strings <= 64 chars,
O(len * ceil(len/64)) beyond).
"""
from __future__ import annotations

from collections.abc import Sequence


def _pattern_masks(a: str) -> dict[str, int]:
    pm: dict[str, int] = {}
    bit = 1
    for ch in a:
        pm[ch] = pm.get(ch, 0) | bit
        bit <<= 1
    return pm


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (Myers bit-parallel, arbitrary length)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) > len(b):  # keep the pattern (bit-vector side) short
        a, b = b, a
    m = len(a)
    full = (1 << m) - 1
    pm = _pattern_masks(a)
    vp = full
    vn = 0
    score = m
    high = 1 << (m - 1)
    for ch in b:
        eq = pm.get(ch, 0)
        xv = eq | vn
        xh = (((eq & vp) + vp) ^ vp) | eq
        hp = vn | (full & ~(xh | vp))
        hn = vp & xh
        if hp & high:
            score += 1
        if hn & high:
            score -= 1
        hp = ((hp << 1) | 1) & full
        hn = (hn << 1) & full
        vp = hn | (full & ~(xv | hp))
        vn = hp & xv
    return score


def lcs_length(a: str, b: str) -> int:
    """Longest-common-subsequence length (Hyyrö bit-parallel)."""
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    m = len(a)
    full = (1 << m) - 1
    pm = _pattern_masks(a)
    v = full
    for ch in b:
        p = pm.get(ch, 0)
        u = v & p
        v = ((v + u) | (v - u)) & full
    # zero bits of v among the m positions = LCS length
    return m - bin(v).count("1")


def indel_distance(a: str, b: str) -> int:
    """Insert/delete-only edit distance = len(a) + len(b) - 2 * LCS."""
    return len(a) + len(b) - 2 * lcs_length(a, b)


def ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.ratio``: normalized Indel similarity in [0, 100]."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return (1.0 - indel_distance(a, b) / total) * 100.0


def token_sort(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.token_sort_ratio`` (no preprocessing, rapidfuzz 3.x)."""
    return ratio(token_sort(a), token_sort(b))


def levenshtein_norm(a: str, b: str) -> float:
    """Reference's normalized Levenshtein: ``1 - d/max_len`` (0.0 when both
    empty) — services/disambiguation.py:347-349."""
    max_len = max(len(a), len(b))
    if max_len == 0:
        return 0.0
    return 1.0 - levenshtein(a, b) / max_len


def fuzz_score(
    name_a: str,
    aliases_a: Sequence[str],
    name_b: str,
    aliases_b: Sequence[str],
) -> float:
    """Reference fuzz score: max token_sort_ratio/100 over name x name,
    alias x alias, alias_a x name_b, name_a x alias_b
    (services/disambiguation.py:313-341)."""
    best = token_sort_ratio(name_a, name_b) / 100.0
    for ia in aliases_a:
        for cb in aliases_b:
            s = token_sort_ratio(ia, cb) / 100.0
            if s > best:
                best = s
    for ia in aliases_a:
        s = token_sort_ratio(ia, name_b) / 100.0
        if s > best:
            best = s
    for cb in aliases_b:
        s = token_sort_ratio(name_a, cb) / 100.0
        if s > best:
            best = s
    return best


def levenshtein_score(
    name_a: str,
    aliases_a: Sequence[str],
    name_b: str,
    aliases_b: Sequence[str],
) -> float:
    """Reference Levenshtein score: same max-over-pairs structure with
    ``1 - d/max_len`` (services/disambiguation.py:343-379)."""
    best = levenshtein_norm(name_a, name_b)
    for ia in aliases_a:
        for cb in aliases_b:
            s = levenshtein_norm(ia, cb)
            if s > best:
                best = s
    for ia in aliases_a:
        s = levenshtein_norm(ia, name_b)
        if s > best:
            best = s
    for cb in aliases_b:
        s = levenshtein_norm(name_a, cb)
        if s > best:
            best = s
    return best
