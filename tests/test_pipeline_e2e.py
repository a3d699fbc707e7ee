"""End-to-end recall contract (SURVEY §5.3–5.4, BASELINE.json):

- tiny corpus: Spark cluster partition == oracle partition EXACTLY,
  dup-pair recall vs oracle == 1.0, sha256 invariant, zero false merges.
- small corpus (5k files): recall vs oracle >= 0.99 and vs planted ground
  truth >= 0.99, precision guard on the `license` negative class.
- aggressive salting (bucket_cap=2): oracle parity must survive skew breaking.
- permutation invariance: repartitioned input -> identical clusters.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from nise_dedup import corpus as C
from nise_dedup.config import DedupConfig
from nise_dedup.pipeline import assert_sha_invariant, run_pipeline

import oracle as O

KEY = ["repo", "path", "commit"]


def _spark_clusters(spark, rows, cfg, ckpt=""):
    df = spark.createDataFrame(C.to_pandas(rows))
    res = run_pipeline(spark, df, cfg, ckpt=ckpt)
    pred = {(r["repo"], r["path"], r["commit"]): r["cluster_id"]
            for r in res.clusters.collect()}
    return df, res, pred


def _partitions(assign: dict) -> set:
    groups = defaultdict(set)
    for k, v in assign.items():
        groups[v].add(k)
    return {frozenset(s) for s in groups.values()}


def test_tiny_exact_oracle_parity(spark):
    cfg = DedupConfig(shuffle_partitions=8)
    rows = C.generate("tiny", seed=42)
    df, res, pred = _spark_clusters(spark, rows, cfg)
    want = O.run_oracle([r.__dict__ for r in rows], cfg,
                        fast_signatures=True)
    assert _partitions(pred) == _partitions(want.clusters)
    op, pp = O.dup_pairs(want.clusters), O.dup_pairs(pred)
    assert op == pp  # recall 1.0 AND precision 1.0 vs reference
    assert_sha_invariant(df, res.clusters)


def test_tiny_salted_parity(spark):
    # bucket_cap=2 forces salting on nearly every bucket; representative
    # pairs must preserve connectivity -> same clusters as the uncapped oracle
    cfg = DedupConfig(shuffle_partitions=8, bucket_cap=2)
    rows = C.generate("tiny", seed=42)
    _, _, pred = _spark_clusters(spark, rows, cfg)
    want = O.run_oracle([r.__dict__ for r in rows], cfg,
                        fast_signatures=True)
    op, pp = O.dup_pairs(want.clusters), O.dup_pairs(pred)
    hit = len(op & pp)
    assert hit / max(1, len(op)) >= 0.99
    # salting may only LOSE pairs relative to full pairwise, never invent
    assert pp <= op


def test_tiny_permutation_invariance(spark):
    cfg = DedupConfig(shuffle_partitions=8)
    rows = C.generate("tiny", seed=42)
    df = spark.createDataFrame(C.to_pandas(rows))
    a = run_pipeline(spark, df, cfg).clusters
    b = run_pipeline(spark, df.repartition(13), cfg).clusters
    pa = {(r["repo"], r["path"], r["commit"]): r["cluster_id"]
          for r in a.collect()}
    pb = {(r["repo"], r["path"], r["commit"]): r["cluster_id"]
          for r in b.collect()}
    assert pa == pb


@pytest.mark.slow
def test_small_recall_contract(spark):
    cfg = DedupConfig(shuffle_partitions=16)
    rows = C.generate("small", seed=42)
    df, res, pred = _spark_clusters(spark, rows, cfg)
    want = O.run_oracle([r.__dict__ for r in rows], cfg, fast_signatures=True)

    op, pp = O.dup_pairs(want.clusters), O.dup_pairs(pred)
    recall_vs_oracle = len(op & pp) / max(1, len(op))
    assert recall_vs_oracle >= 0.99, recall_vs_oracle

    tp = C.truth_dup_pairs(rows)
    recall_vs_truth = len(tp & pp) / max(1, len(tp))
    assert recall_vs_truth >= 0.99, recall_vs_truth

    # precision guard: license-header negatives must not merge
    cls = {(r.repo, r.path, r.commit): r.dup_class for r in rows}
    content = {(r.repo, r.path, r.commit): r.content for r in rows}
    false_merges = [p for p in pp
                    if p not in tp and content[p[0]] != content[p[1]]]
    assert len(false_merges) <= 0.001 * max(1, len(pp)), false_merges[:5]
    assert not any(cls[a] == cls[b] == "license" for a, b in false_merges)
