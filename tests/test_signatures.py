"""Spark signature stage (S1–S4, one fused Arrow pass) vs the pure-Python
oracle, row by row, bit for bit."""

from __future__ import annotations

from nise_dedup.config import DedupConfig
from nise_dedup.signatures import compute_signatures

import oracle as O


def _i64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


TEXTS = [
    "def f(x):\n    return x + 1\n",
    "",
    "short",
    "the quick brown fox " * 40,
    "line one   \n\n\nline two\t\t\nline three",
    "ünïcode ≠ ascii\n" * 5,
]


def _check_scheme(spark, cfg):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "file_id long, content string")
    got = {r["file_id"]: r
           for r in compute_signatures(df, cfg, keep_shingles=True).collect()}
    assert set(got) == set(range(len(TEXTS)))
    for i, t in enumerate(TEXTS):
        norm = O.normalize_text(t, cfg.normalize)
        sh = O.shingle_hashes(norm.encode("utf-8"), cfg.shingle_k)
        if cfg.minhash_scheme == "kperm":
            mh = O.minhash(sh, O.hash_seeds(cfg.num_perm, cfg.seed))
        else:
            mh = O.minhash_oph(sh, cfg.num_perm, cfg.seed)
        bk = O.band_keys(mh, cfg.bands, cfg.rows, cfg.seed)
        row = got[i]
        assert row["n_shingles"] == len(sh)
        assert row["n_bytes"] == len(norm.encode("utf-8"))
        assert row["shingles"] == [_i64(x) for x in sh]
        assert row["minhash"] == [_i64(x) for x in mh]
        assert row["band_keys"] == [_i64(x) for x in bk]
        assert row["simhash"] == _i64(O.simhash64(sh))


def test_signatures_match_oracle_oph(spark):
    _check_scheme(spark, DedupConfig(num_perm=32, bands=8, rows=4,
                                     shuffle_partitions=4))


def test_signatures_match_oracle_kperm(spark):
    _check_scheme(spark, DedupConfig(num_perm=32, bands=8, rows=4,
                                     minhash_scheme="kperm",
                                     shuffle_partitions=4))


def test_default_schema_omits_shingles(spark):
    cfg = DedupConfig(num_perm=25, bands=5, rows=5)
    df = spark.createDataFrame([(1, "hello world " * 10)],
                               "file_id long, content string")
    cols = compute_signatures(df, cfg).columns
    assert "shingles" not in cols
    assert {"file_id", "n_shingles", "n_bytes", "simhash", "mhb_lo",
            "mhb_hi", "minhash", "band_keys"} == set(cols)
