"""Suffix-array longest-common-substring (SURVEY §2.5 V3, §7.3 hard part 2).

Pure NumPy, no Spark imports — runs inside the verification stage's Arrow
batches. Catches containment / large-block copies whose shingle Jaccard is
diluted below tau_jaccard (the `block` duplicate class in FIXTURES.md §B).

Algorithm: generalized suffix array over ``a + SEP + b`` (SEP = 256, outside
the byte alphabet) built by prefix-doubling with ``np.lexsort`` —
O(n log^2 n), the pragmatic vectorizable choice (SA-IS does not vectorize).
The doubling rank tables double as an O(log n) LCP oracle (the classic
sparse-table walk), evaluated vectorized over all adjacent cross-document
suffix pairs at once — no per-character Python loop (so no Kasai).

LCS(a, b) = max LCP over suffix pairs adjacent in SA order, restricted to
pairs from different documents (standard reduction: LCP of any cross-doc
pair is the min of adjacent LCPs between them, so the max is attained on an
adjacent cross-doc pair). Correctness is property-tested against both a
brute-force O(n*m) DP and the oracle's suffix automaton (tests/test_suffix.py).
"""

from __future__ import annotations

import numpy as np

_SEP = 256


def _suffix_array_with_ranks(s: np.ndarray):
    """Prefix-doubling SA. Returns (sa, rank_tables, lengths) where
    rank_tables[k][i] ranks s[i : i + lengths[k]] (padded comparisons)."""
    n = s.shape[0]
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    tables = [rank]
    lengths = [1]
    length = 1
    while length < n and rank.max() != n - 1:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - length] = rank[length:]
        order = np.lexsort((key2, rank))
        k1o, k2o = rank[order], key2[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        if n > 1:
            changed[1:] = (k1o[1:] != k1o[:-1]) | (k2o[1:] != k2o[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed)
        rank = new_rank
        length *= 2
        tables.append(rank)
        lengths.append(length)
    sa = np.argsort(rank, kind="stable")
    return sa, tables, lengths


def _lcp_pairs(i: np.ndarray, j: np.ndarray, tables, lengths, n: int) -> np.ndarray:
    """Vectorized LCP of suffix pairs via the doubling rank tables."""
    i = i.astype(np.int64).copy()
    j = j.astype(np.int64).copy()
    res = np.zeros(i.shape[0], dtype=np.int64)
    for level in range(len(lengths) - 1, -1, -1):
        l = lengths[level]
        r = tables[level]
        ok = (i + l <= n) & (j + l <= n)
        idx = np.where(ok)[0]
        if idx.size:
            eq = r[i[idx]] == r[j[idx]]
            hit = idx[eq]
            res[hit] += l
            i[hit] += l
            j[hit] += l
    return res


def longest_common_substring(a: bytes, b: bytes) -> int:
    """Exact LCS length (in bytes) between two byte strings."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    s = np.empty(la + lb + 1, dtype=np.int32)
    s[:la] = np.frombuffer(a, dtype=np.uint8)
    s[la] = _SEP
    s[la + 1:] = np.frombuffer(b, dtype=np.uint8)
    n = s.shape[0]
    sa, tables, lengths = _suffix_array_with_ranks(s)
    doc = np.where(sa < la, 0, np.where(sa > la, 1, -1))
    keep = doc >= 0
    saf, docf = sa[keep], doc[keep]
    cross = docf[1:] != docf[:-1]
    if not cross.any():
        return 0
    i = saf[:-1][cross]
    j = saf[1:][cross]
    return int(_lcp_pairs(i, j, tables, lengths, n).max())


_B = np.uint64(0x100000001B3)          # odd -> invertible mod 2^64
_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _rolling_hashes(b: np.ndarray, w: int) -> np.ndarray:
    """Polynomial hashes of every w-gram of byte array b, O(n) vectorized:
    H(i) = (Q[i+w] - Q[i]) * B^-i  with  Q[i] = sum_{j<i} b[j] * B^j  (mod 2^64).

    The B^i / B^-i tables come from hashing's shared grown-on-demand cache
    (round 6 — same base; rebuilding them per call was measurable inside
    the deep cascade)."""
    from nise_dedup.hashing import _powers

    n = b.shape[0]
    powers, inv_powers = _powers(n)
    q = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(b.astype(np.uint64) * powers[:n], out=q[1:], dtype=np.uint64)
    return (q[w:] - q[: n - w + 1]) * inv_powers[: n - w + 1]


def maybe_common_substring(a: bytes, b: bytes, min_len: int) -> bool:
    """Sound seed-and-extend prefilter: returns False ONLY IF
    LCS(a, b) < min_len is certain.

    Any common substring of length L >= 2w-1 fully contains an aligned
    w-gram of `a` (offset a multiple of w). With w = (min_len+1)//2, a miss
    in the gram-set intersection proves LCS < min_len. Rolling-hash
    collisions can only cause false *positives* (the exact suffix-array pass
    then decides), never false negatives.
    """
    if min_len <= 1:
        return True
    la, lb = len(a), len(b)
    if min(la, lb) < min_len:
        return False
    short, long_ = (a, b) if la <= lb else (b, a)
    w = (min_len + 1) // 2
    sb = np.frombuffer(short, dtype=np.uint8)
    lb_arr = np.frombuffer(long_, dtype=np.uint8)
    anchors = _rolling_hashes(sb, w)[::w]
    grams = _rolling_hashes(lb_arr, w)
    return bool(np.isin(anchors, grams).any())


def has_common_substring(a: bytes, b: bytes, min_len: int):
    """EXACT decision 'LCS(a, b) >= min_len', O(n):

    intersect the rolling hashes of all min_len-grams of both strings, then
    byte-verify a first-occurrence hit (an actual length-min_len common
    substring implies equal gram hashes, so a miss is a certain False).
    Returns True / False, or None in the astronomically-rare case where the
    only hash hits are unverifiable collisions — caller falls back to the
    exact suffix array.
    """
    if min_len <= 0:
        return True
    la, lb = len(a), len(b)
    if min(la, lb) < min_len:
        return False
    ha = _rolling_hashes(np.frombuffer(a, dtype=np.uint8), min_len)
    hb = _rolling_hashes(np.frombuffer(b, dtype=np.uint8), min_len)
    common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
    if common.size == 0:
        return False
    for i, j in zip(ia, ib):
        if a[i:i + min_len] == b[j:j + min_len]:
            return True
    return None  # hash hits exist but first occurrences collide: ambiguous


def lcs_batch(a_list, b_list) -> np.ndarray:
    """LCS lengths for aligned lists of (str | bytes) pairs."""
    out = np.empty(len(a_list), dtype=np.int64)
    for t, (a, b) in enumerate(zip(a_list, b_list)):
        if isinstance(a, str):
            a = a.encode("utf-8")
        if isinstance(b, str):
            b = b.encode("utf-8")
        out[t] = longest_common_substring(a, b)
    return out
