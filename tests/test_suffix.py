"""Property tests for the suffix-array LCS (V3) against brute force and the
oracle's suffix automaton (SURVEY §5.2)."""

from __future__ import annotations

import random

import pytest

from nise_dedup.suffix import longest_common_substring as lcs_np

import oracle as O


def brute_lcs(a: bytes, b: bytes) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


@pytest.mark.parametrize("a,b,want", [
    (b"", b"", 0), (b"a", b"", 0), (b"", b"b", 0),
    (b"abc", b"abc", 3), (b"abc", b"xbcy", 2),
    (b"aaaa", b"aa", 2), (b"abcdef", b"zzz", 0),
    (b"banana", b"anaconda", 3),
])
def test_lcs_known(a, b, want):
    assert lcs_np(a, b) == want
    assert O.longest_common_substring(a, b) == want


def test_lcs_random_vs_brute_and_oracle():
    rng = random.Random(11)
    for trial in range(60):
        n, m = rng.randint(0, 80), rng.randint(0, 80)
        alpha = b"ab" if trial % 2 else b"abcde"
        a = bytes(rng.choice(alpha) for _ in range(n))
        b = bytes(rng.choice(alpha) for _ in range(m))
        want = brute_lcs(a, b)
        assert lcs_np(a, b) == want
        assert O.longest_common_substring(a, b) == want


def test_lcs_block_copy():
    rng = random.Random(3)
    block = bytes(rng.randrange(256) for _ in range(4000))
    pre = bytes(rng.randrange(65, 90) for _ in range(1500))
    post = bytes(rng.randrange(97, 122) for _ in range(1200))
    a = pre + block
    b = block + post
    assert lcs_np(a, b) == 4000
    assert O.longest_common_substring(a, b) == 4000
