"""Vectorized hash primitives shared by the Spark signature UDFs.

Pure NumPy, no Spark imports — executors import this inside pandas UDFs
(SURVEY §2.3 S1–S4). All arithmetic is unsigned 64-bit with wraparound
(numpy uint64 array semantics), fully deterministic given ``DedupConfig.seed``.

The frozen single-node oracle (tests/oracle.py) REIMPLEMENTS these formulas
independently with plain Python ints; tests assert bit-identical agreement,
which is what makes "identical shingle/band/row signature configuration"
(BASELINE.json) meaningful.

Hash family: splitmix64 finalizer (Steele et al., public domain) — a strong
64-bit mixer; per-permutation MinHash hashes are ``mix64(shingle ^ seed_i)``.
Shingle hashes are a degree-(k-1) polynomial over bytes in base B, finalized
with mix64 (standard Rabin-Karp style rolling family).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_M1 = U64(0xBF58476D1CE4E5B9)
_M2 = U64(0x94D049BB133111EB)
_POLY_BASE = U64(0x100000001B3)  # FNV-ish odd base for the byte polynomial
_GOLDEN = U64(0x9E3779B97F4A7C15)


def normalize_text(s: str, mode: str) -> str:
    """R1 — canonicalization feeding shingling/LCS only (never `content`).

    "ws": rstrip each line, drop blank lines, join with "\\n". Makes
    whitespace-churn near-dups signature-identical while leaving leading
    indentation (significant in code) intact. "none": identity.
    The oracle (tests/oracle.py) reimplements this definition independently.
    """
    if mode == "none":
        return s
    if mode == "ws":
        lines = [ln.rstrip() for ln in s.split("\n")]
        return "\n".join(ln for ln in lines if ln)
    raise ValueError(f"unknown normalize mode: {mode!r}")


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, elementwise over uint64 arrays (wraps mod 2^64)."""
    x = np.asarray(x, dtype=U64)
    x = (x ^ (x >> U64(30))) * _M1
    x = (x ^ (x >> U64(27))) * _M2
    return x ^ (x >> U64(31))


def hash_seeds(n: int, seed: int) -> np.ndarray:
    """n deterministic 64-bit seeds: mix64(seed + i*golden)."""
    i = np.arange(n, dtype=U64)
    return mix64(U64(seed % (1 << 64)) + i * _GOLDEN)


def shingle_hashes(content: bytes, k: int) -> np.ndarray:
    """Sorted distinct 64-bit hashes of the char k-grams of ``content``.

    A document shorter than k yields ONE shingle: the hash of the whole
    byte string (so short files still get signatures; the DuckDB oracle
    mirrors this as ``case when length(text) < k then 1 ...``).
    """
    b = np.frombuffer(content, dtype=np.uint8)
    if b.size == 0:
        b = np.zeros(1, dtype=np.uint8)
    if b.size < k:
        windows = b[None, :]
    else:
        windows = np.lib.stride_tricks.sliding_window_view(b, k)
    # polynomial: sum(byte[j] * B^(w-1-j)) mod 2^64, then mix
    w = windows.shape[1]
    powers = np.empty(w, dtype=U64)
    acc = 1  # python int, masked: avoids numpy scalar-overflow warnings
    base = int(_POLY_BASE)
    for j in range(w - 1, -1, -1):
        powers[j] = acc
        acc = (acc * base) & 0xFFFFFFFFFFFFFFFF
    h = (windows.astype(U64) * powers[None, :]).sum(axis=1, dtype=U64)
    return np.unique(mix64(h))


def minhash(shingles: np.ndarray, seeds: np.ndarray,
            chunk: int = 1 << 15) -> np.ndarray:
    """MinHash signature: min_i over shingles of mix64(x ^ seed_i).

    Chunked over shingles so a 10^6-shingle file never materializes an
    (n_perm × n_shingles) matrix bigger than ``n_perm * chunk`` (SURVEY §7.3
    hard part 5: Arrow/NumPy memory discipline for megabyte contents).
    Returns uint64[n_perm].
    """
    n = seeds.shape[0]
    out = np.full(n, np.iinfo(np.uint64).max, dtype=U64)
    for lo in range(0, shingles.shape[0], chunk):
        x = shingles[lo:lo + chunk]
        h = mix64(x[None, :] ^ seeds[:, None])  # (n, chunk)
        np.minimum(out, h.min(axis=1), out=out)
    return out


def simhash64(shingles: np.ndarray, chunk: int = 1 << 15) -> int:
    """Charikar 64-bit SimHash over the (unweighted) shingle hash set.

    Bit j of the fingerprint is 1 iff sum over features of (2*bit_j - 1) > 0.
    Returns a Python int in [0, 2^64).
    """
    shifts = np.arange(64, dtype=U64)
    acc = np.zeros(64, dtype=np.int64)
    for lo in range(0, shingles.shape[0], chunk):
        x = shingles[lo:lo + chunk]
        bits = ((x[:, None] >> shifts[None, :]) & U64(1)).astype(np.int64)
        acc += (2 * bits - 1).sum(axis=0)
    fp = U64(0)
    one = U64(1)
    for j in range(64):
        if acc[j] > 0:
            fp |= one << U64(j)
    return int(fp)


def band_keys(sig: np.ndarray, bands: int, rows: int, seed: int) -> np.ndarray:
    """LSH band keys: fold each length-r signature slice with mix64.

    key_b starts at a per-band seed and absorbs each of the band's r
    signature values: key = mix64(key ^ v). Returns uint64[bands].
    """
    sig2 = sig.reshape(bands, rows)
    keys = hash_seeds(bands, seed ^ 0x5CA1AB1E)
    for j in range(rows):
        keys = mix64(keys ^ sig2[:, j])
    return keys


def to_i64(x: np.ndarray | int):
    """Reinterpret uint64 as signed int64 (Spark LongType is signed)."""
    if isinstance(x, np.ndarray):
        return x.view(np.int64) if x.dtype == U64 else x.astype(np.int64)
    return int(np.uint64(x).astype(np.int64))
