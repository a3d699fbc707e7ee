"""End-to-end stage DAG (SURVEY §3.1): ingest → uniq → signatures → pairs →
verify → cluster → publish, each stage wrapped in the resumable gate (io.py).

Shuffle discipline notes (the 100-TB design, SURVEY §4):
- `content` is shuffled exactly once (the uniq collapse); signatures, bands,
  pairs and clustering shuffle only ids + fixed-width sketches. The LCS
  residue re-joins content for the (small) set of gated pairs only.
- Stage checkpoints mean each shuffle's input is a pruned columnar parquet,
  and a resumed run replays nothing upstream of the first incomplete stage.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nise_dedup import cc, ingest, lsh, verify
from nise_dedup.config import DedupConfig
from nise_dedup.io import run_stage, write_stage
from nise_dedup.signatures import compute_signatures


def ensure_min_partitions(df: DataFrame, n: int) -> DataFrame:
    """Repartition ONLY when underpartitioned (e.g. the corpus arrived as a
    single unsplittable parquet row group, so every narrow stage — including
    the Arrow signature UDF — would run on one core). On a real cluster the
    scan has natural splits and this is a no-op; the check is plan metadata,
    not an action."""
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


@dataclass
class PipelineResult:
    clusters: DataFrame        # one row per input row: keys + cluster_id
    clusters_uniq: DataFrame   # per canonical content: file_id, cluster_id
    verified_pairs: DataFrame
    metrics: dict


def run_pipeline(spark: SparkSession, corpus: DataFrame,
                 cfg: DedupConfig | None = None,
                 ckpt: str = "",
                 collect_metrics: bool = True) -> PipelineResult:
    cfg = cfg or DedupConfig()
    ch = cfg.config_hash()

    def gate(name, fn, lineage=True):
        if ckpt:
            return run_stage(spark, ckpt, ch, name, fn, lineage=lineage)
        # no checkpoint dir: persist each stage EAGERLY so stages with
        # multiple downstream consumers aren't recomputed per consumer (a
        # lazy persist races cold inside the first multi-branch action)
        df = fn().persist()
        df.count()
        return df

    # --- ingest: ids + shas; content NOT persisted here (only uniq persists
    # content, once, deduplicated) ---
    def _files():
        df = ingest.basic_filters(corpus, cfg)
        df = ingest.with_sha(ingest.with_file_id(df))
        return df.select("file_id", "repo", "path", "commit", "lang",
                         "content_sha256", "n_bytes")
    files = gate("files", _files)

    def _uniq():
        df = ingest.basic_filters(corpus, cfg)
        df = ingest.with_sha(ingest.with_file_id(df))
        return ensure_min_partitions(ingest.uniq_with_content(df),
                                     cfg.shuffle_partitions)
    uniq = gate("uniq", _uniq)

    signatures = gate("signatures", lambda: compute_signatures(uniq, cfg))

    def _cand():
        bands = lsh.explode_bands(signatures)
        return lsh.candidate_pairs(bands, cfg)
    cand = gate("cand_pairs", _cand)

    verified = gate("verified_pairs",
                    lambda: verify.verify_pairs(cand, signatures, uniq, cfg))

    clusters_uniq = gate(
        "clusters_uniq",
        lambda: cc.canonical_clusters(verified, signatures))

    def _publish():
        return ingest.expand_exact(clusters_uniq, files)
    clusters = gate("clusters", _publish)

    metrics = {"config_hash": ch}
    if collect_metrics:
        metrics.update({
            "n_files": files.count(),
            "n_uniq": uniq.count(),
            "n_cand_pairs": cand.count(),
            "n_verified_pairs": verified.where("passed").count(),
            "n_clusters": clusters_uniq.select("cluster_id").distinct().count(),
        })
    if ckpt:
        bands = lsh.explode_bands(signatures)
        write_stage(lsh.bucket_metrics(bands, cfg), "bucket_metrics",
                    ckpt, ch, lineage=False)
    return PipelineResult(clusters=clusters, clusters_uniq=clusters_uniq,
                          verified_pairs=verified, metrics=metrics)


def assert_sha_invariant(corpus: DataFrame, clusters: DataFrame) -> None:
    """BASELINE.json per-row invariant: the published table's content_sha256
    must equal sha256(content) of the input, row for row (natural key join)."""
    expected = corpus.select(
        "repo", "path", "commit",
        F.sha2("content", 256).alias("expected_sha"))
    joined = clusters.join(expected, on=["repo", "path", "commit"], how="full")
    bad = joined.where(
        F.col("content_sha256").isNull()
        | F.col("expected_sha").isNull()
        | (F.col("content_sha256") != F.col("expected_sha"))).count()
    if bad:
        raise AssertionError(f"sha256 invariant violated for {bad} rows")
