"""LSH banding L1–L3: pair completeness without salting, connectivity
preservation under aggressive salting, degenerate-bucket drop accounting."""

from __future__ import annotations

from itertools import combinations

from nise_dedup.config import DedupConfig
from nise_dedup.lsh import bucket_metrics, candidate_pairs, explode_bands

import oracle as O


def _bands_df(spark, buckets):
    """buckets: list of (band_id, band_key, [file_ids])."""
    rows = [(fid, band_id, key)
            for band_id, key, fids in buckets for fid in fids]
    return spark.createDataFrame(rows, "file_id long, band_id int, band_key long")


def test_pairs_complete_without_salting(spark):
    cfg = DedupConfig(bucket_cap=100)
    buckets = [(0, 111, [1, 2, 3]), (1, 222, [3, 4]), (2, 333, [9]),
               (3, 444, [2, 3])]
    got = {(r["a"], r["b"])
           for r in candidate_pairs(_bands_df(spark, buckets), cfg).collect()}
    want = {(1, 2), (1, 3), (2, 3), (3, 4)}
    assert got == want


def test_salting_preserves_connectivity(spark):
    cfg = DedupConfig(bucket_cap=4)
    members = list(range(100, 130))
    got = candidate_pairs(_bands_df(spark, [(0, 7, members)]), cfg).collect()
    pairs = [(r["a"], r["b"]) for r in got]
    # far fewer than full pairwise, but one connected component
    assert len(pairs) < len(members) * (len(members) - 1) // 2
    uf = O.UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    roots = {uf.find(m) for m in members}
    assert len(roots) == 1


def test_degenerate_bucket_dropped_and_counted(spark):
    cfg = DedupConfig(bucket_cap=4, max_bucket=10)
    buckets = [(0, 1, list(range(50))),      # degenerate: > max_bucket
               (1, 2, [200, 201])]
    bands = _bands_df(spark, buckets)
    pairs = {(r["a"], r["b"]) for r in candidate_pairs(bands, cfg).collect()}
    assert pairs == {(200, 201)}
    metrics = {r["disposition"]: r for r in bucket_metrics(bands, cfg).collect()}
    assert metrics["dropped_degenerate"]["n_buckets"] == 1
    assert metrics["dropped_degenerate"]["n_members"] == 50
    assert metrics["direct"]["n_buckets"] == 1


def test_multi_rep_recovers_cross_salt_dup(spark):
    """VERDICT r3 next #3: a planted heterogeneous capped bucket where
    single-rep salting loses a dup pair and rep_k=2 recovers it.

    Bucket {75, 35 | 8, 23} under nsplits=2 (salt = pmod(xxhash64(id), 2):
    75,35 -> salt 0; 8,23 -> salt 1 — asserted below, not assumed). The
    hash-rank-1 reps are 75 and 8 (the planted 'license headers', which
    fail verification downstream); the dup pair is (23, 35). With one rep
    per sub-bucket the only cross pair is (8, 75) and (23, 35) never
    meets; with rep_k=2 every member of these size-2 sub-buckets is a rep
    and (23, 35) is emitted."""
    from pyspark.sql import functions as F

    from nise_dedup.lsh import cross_rep_pairs, salted_buckets

    members = [75, 35, 8, 23]
    cfg = DedupConfig(bucket_cap=2)          # 4 members -> nsplits=2
    salted = salted_buckets(_bands_df(spark, [(0, 7, members)]), cfg)
    got = {r["file_id"]: (r["salt"], r["nsplits"]) for r in salted.collect()}
    assert {fid: s for fid, (s, _n) in got.items()} == \
        {75: 0, 35: 0, 8: 1, 23: 1}          # planted split precondition
    assert all(n == 2 for _s, n in got.values())

    single = {(r["a"], r["b"])
              for r in cross_rep_pairs(salted, rep_k=1).collect()}
    multi = {(r["a"], r["b"])
             for r in cross_rep_pairs(salted, rep_k=2).collect()}
    assert single == {(8, 75)}               # dup pair LOST at rep_k=1
    assert (23, 35) in multi                 # ...and RECOVERED at rep_k=2
    # default config flows rep_k=2 through candidate generation
    pairs = {(r["a"], r["b"])
             for r in candidate_pairs(_bands_df(spark, [(0, 7, members)]),
                                      cfg).collect()}
    assert (23, 35) in pairs
    # still bounded: candidates never exceed the bucket's full pairwise set
    assert pairs <= {(a, b) for a, b in combinations(sorted(members), 2)}


def test_explode_bands_shape(spark):
    from nise_dedup.signatures import compute_signatures
    cfg = DedupConfig(num_perm=32, bands=8, rows=4)
    df = spark.createDataFrame([(1, "hello world " * 10)],
                               "file_id long, content string")
    bands = explode_bands(compute_signatures(df, cfg))
    rows = bands.collect()
    assert len(rows) == 8
    assert {r["band_id"] for r in rows} == set(range(8))


def test_identical_docs_share_all_bands(spark):
    from nise_dedup.signatures import compute_signatures
    cfg = DedupConfig(num_perm=32, bands=8, rows=4)
    text = "x = 1\ny = 2\n" * 20
    df = spark.createDataFrame([(1, text), (2, text), (3, "totally different content here")],
                               "file_id long, content string")
    pairs = {(r["a"], r["b"]) for r in candidate_pairs(
        explode_bands(compute_signatures(df, cfg)), cfg).collect()}
    assert (1, 2) in pairs
    assert all(p in {(1, 2)} for p in pairs), pairs
