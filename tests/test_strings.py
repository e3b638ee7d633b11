"""Validate the bit-parallel string kernels against naive DP references and
the reference's formulas (services/disambiguation.py:313-379)."""
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from entitydisambiguation_ray.functions.strings import (
    fuzz_score,
    indel_distance,
    lcs_length,
    levenshtein,
    levenshtein_norm,
    levenshtein_score,
    ratio,
    token_sort_ratio,
)


def dp_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def dp_lcs(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[len(b)]


ALPHABET = "abc中文 XY"


@given(
    st.text(ALPHABET, max_size=40),
    st.text(ALPHABET, max_size=40),
)
@settings(max_examples=300, deadline=None)
def test_levenshtein_matches_dp(a, b):
    assert levenshtein(a, b) == dp_levenshtein(a, b)


@given(st.text(ALPHABET, max_size=40), st.text(ALPHABET, max_size=40))
@settings(max_examples=300, deadline=None)
def test_lcs_matches_dp(a, b):
    assert lcs_length(a, b) == dp_lcs(a, b)


def test_long_strings_beyond_64():
    rng = random.Random(7)
    for _ in range(20):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(60, 200)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(60, 200)))
        assert levenshtein(a, b) == dp_levenshtein(a, b)
        assert lcs_length(a, b) == dp_lcs(a, b)


def test_ratio_known_values():
    # rapidfuzz.fuzz.ratio("kitten", "sitting") == 61.53846...
    assert ratio("kitten", "sitting") == pytest.approx(61.538461538, abs=1e-6)
    assert ratio("", "") == 100.0
    assert ratio("abc", "") == 0.0
    assert ratio("abc", "abc") == 100.0


def test_token_sort_ratio_reorders_tokens():
    assert token_sort_ratio("world hello", "hello world") == 100.0
    # no lowercasing in rapidfuzz 3.x default
    assert token_sort_ratio("Hello", "hello") < 100.0


def test_levenshtein_norm_reference_edge_case():
    # disambiguation.py:349 — 0.0 when max_len == 0
    assert levenshtein_norm("", "") == 0.0
    assert levenshtein_norm("abc", "abc") == 1.0
    assert levenshtein_norm("abc", "abd") == pytest.approx(2 / 3)


def test_fuzz_score_max_over_pairs():
    # name-vs-name is poor but alias matches name exactly
    s = fuzz_score("糖尿病", ["diabetes"], "diabetes mellitus", ["diabetes"])
    assert s == 1.0
    # no aliases: just the name pair
    assert fuzz_score("abc", [], "abc", []) == 1.0
    assert fuzz_score("abc", [], "xyz", []) == 0.0


def test_levenshtein_score_max_over_pairs():
    s = levenshtein_score("糖尿病", ["diabetes"], "diabetess", ["diabetes"])
    assert s == 1.0
    assert levenshtein_score("ab", [], "ax", []) == 0.5


@given(
    st.text(ALPHABET, max_size=20),
    st.lists(st.text(ALPHABET, max_size=10), max_size=3),
    st.text(ALPHABET, max_size=20),
    st.lists(st.text(ALPHABET, max_size=10), max_size=3),
)
@settings(max_examples=100, deadline=None)
def test_scores_bounded_and_symmetric(na, aa, nb, ab):
    f = fuzz_score(na, aa, nb, ab)
    l = levenshtein_score(na, aa, nb, ab)
    assert 0.0 <= f <= 1.0 and 0.0 <= l <= 1.0
    assert f == pytest.approx(fuzz_score(nb, ab, na, aa))
    assert l == pytest.approx(levenshtein_score(nb, ab, na, aa))
