"""Round-6 batch signature kernels vs the frozen scalar path.

The vectorized-across-documents kernels (hashing.shingle_sets_batch /
minhash_oph_batch / simhash64_batch / band_keys_batch / pack_bbit_batch)
must be BIT-identical to the per-document functions for every edge case the
corpus can produce: empty documents, documents shorter than / exactly k,
unicode, repeated content, and large documents (the chunked simhash path).
"""

from __future__ import annotations

import numpy as np
import pytest

from nise_dedup import hashing as H

K = 9
CASES = [
    "",                                   # empty -> single zero-byte window
    "a",                                  # shorter than k
    "abcdefgh",                           # k-1
    "abcdefghi",                          # exactly k -> one window
    "abcdefghij",                         # k+1
    "the quick brown fox jumps over the lazy dog " * 8,
    "x" * 500,                            # degenerate repeats -> 1 shingle
    "naïve café déjà vu " * 10,           # multibyte UTF-8
    "\n".join(f"line {i} body" for i in range(40)),
    "z" * 8 + "q",                        # k with distinct tail
]


def _raws():
    return [s.encode("utf-8") for s in CASES] + [
        ("big " * 20000).encode("utf-8")]  # 80 KB doc


def test_shingle_sets_batch_matches_scalar():
    raws = _raws()
    values, starts = H.shingle_sets_batch(raws, K)
    assert starts[0] == 0 and starts[-1] == values.size
    for i, raw in enumerate(raws):
        expect = H.shingle_hashes(raw, K)
        got = values[starts[i]:starts[i + 1]]
        assert got.dtype == expect.dtype == np.uint64
        assert np.array_equal(got, expect), f"doc {i} shingles diverge"


@pytest.mark.parametrize("n", [16, 125])
def test_minhash_oph_batch_matches_scalar(n):
    raws = _raws()
    values, starts = H.shingle_sets_batch(raws, K)
    mh = H.minhash_oph_batch(values, starts, n, seed=42)
    for i in range(len(raws)):
        expect = H.minhash_oph(values[starts[i]:starts[i + 1]], n, 42)
        assert np.array_equal(mh[i], expect), f"doc {i} minhash diverges"


def test_simhash_band_pack_batch_match_scalar():
    raws = _raws()
    values, starts = H.shingle_sets_batch(raws, K)
    sim = H.simhash64_batch(values, starts, chunk_docs=3)  # force chunking
    mh = H.minhash_oph_batch(values, starts, 125, seed=42)
    bk = H.band_keys_batch(mh, 25, 5, seed=42)
    lo, hi = H.pack_bbit_batch(mh, 64)
    lo16, hi16 = H.pack_bbit_batch(mh[:, :16], 64)   # m <= 32 branch
    for i in range(len(raws)):
        sh = values[starts[i]:starts[i + 1]]
        assert int(sim[i]) == H.simhash64(sh), f"doc {i} simhash"
        assert np.array_equal(bk[i], H.band_keys(mh[i], 25, 5, 42))
        slo, shi = H.pack_bbit(mh[i], 64)
        assert (int(lo[i]), int(hi[i])) == (slo, shi)
        slo16, shi16 = H.pack_bbit(mh[i][:16], 64)
        assert (int(lo16[i]), int(hi16[i])) == (slo16, shi16)


def test_compute_signatures_keep_minhash_false(spark):
    from nise_dedup.config import DedupConfig
    from nise_dedup.signatures import compute_signatures

    cfg = DedupConfig(num_perm=16, bands=4, rows=4)
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "file_id long, content string")
    full = {r["file_id"]: r for r in
            compute_signatures(df, cfg).collect()}
    pruned = compute_signatures(df, cfg, keep_minhash=False)
    assert "minhash" not in pruned.columns
    for r in pruned.collect():
        f = full[r["file_id"]]
        for c in ("n_shingles", "n_bytes", "simhash", "mhb_lo", "mhb_hi",
                  "band_keys"):
            assert r[c] == f[c], f"{c} diverges for file {r['file_id']}"
