"""Spark signature stage (S1–S4, one fused Arrow pass) vs the pure-Python
oracle, row by row, bit for bit."""

from __future__ import annotations

from nise_dedup.config import DedupConfig
from nise_dedup.signatures import compute_signatures

import oracle as O


def _i64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def test_signatures_match_oracle(spark):
    cfg = DedupConfig(num_perm=32, bands=8, rows=4, shuffle_partitions=4)
    texts = [
        "def f(x):\n    return x + 1\n",
        "",
        "short",
        "the quick brown fox " * 40,
        "line one   \n\n\nline two\t\t\nline three",
        "ünïcode ≠ ascii\n" * 5,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "file_id long, content string")
    got = {r["file_id"]: r for r in compute_signatures(df, cfg).collect()}
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        norm = O.normalize_text(t, cfg.normalize)
        sh = O.shingle_hashes(norm.encode("utf-8"), cfg.shingle_k)
        mh = O.minhash(sh, O.hash_seeds(cfg.num_perm, cfg.seed))
        bk = O.band_keys(mh, cfg.bands, cfg.rows, cfg.seed)
        row = got[i]
        assert row["n_shingles"] == len(sh)
        assert row["shingles"] == [_i64(x) for x in sh]
        assert row["minhash"] == [_i64(x) for x in mh]
        assert row["band_keys"] == [_i64(x) for x in bk]
        assert row["simhash"] == _i64(O.simhash64(sh))
