"""LSH banding + candidate generation L1–L3 (SURVEY §2.4).

The scale-critical stage: a naive bucket self-join dies on one hot bucket
(boilerplate/minified/near-empty files at web scale produce buckets with
millions of members → O(m²) pair blowup on a single shuffle partition).
The north rule demands "explicit salted repartitioning to break hot-bucket
skew", implemented here as:

  1. bucket sizing (window count over the band key),
  2. degenerate buckets (> cfg.max_bucket members) dropped WITH a metrics
     row — never silently (SURVEY §7.3 hard part 1),
  3. buckets above cfg.bucket_cap split into ceil(cnt/cap) salted
     sub-buckets by pmod(xxhash64(file_id), nsplits) — deterministic,
  4. explicit repartition on (band_id, band_key, salt) so every pair-
     generation task sees at most ~cap members per key,
  5. within-salt pair self-join, PLUS cross-salt representative pairs
     (up to cfg.rep_k hash-rank-chosen reps per sub-bucket, all-pairs
     across a bucket's reps) so bucket connectivity — hence cluster
     recall — survives salting.

Cross-salt member pairs other than representatives are intentionally not
emitted; connectivity via representatives suffices for the union-find stage,
and the recall cost is measured by tests/test_pipeline_e2e.py against the
full-pairwise oracle (caps sized so they never trigger below truly
degenerate buckets). VERDICT r3 next #3 (multi-rep remediation): with a
SINGLE rep per sub-bucket, one failed rep-pair verification silently
disconnects true dups split across the salts of a heterogeneous capped
bucket (e.g. each salt holds one license header and one member of a dup
class: the license reps fail verification and the dup pair never meets).
``rep_k`` reps per sub-bucket give each sub-bucket pair rep_k^2 independent
chances to connect; reps are chosen by xxhash64 rank (content-uncorrelated
spread — min-id reps would correlate across sub-buckets when ids encode
provenance). Cost: <= (nsplits*rep_k)^2/2 extra pairs per salted bucket —
salted buckets are rare by construction, and rep_pair_health still reports
the residual failure count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nise_dedup.config import DedupConfig


def explode_bands(signatures: DataFrame) -> DataFrame:
    """L1 — one row per (band_id, band_key, file_id).

    Band keys were already computed inside the signature UDF (cheapest:
    content scanned once); this is a pure JVM-side posexplode.
    """
    return signatures.select(
        "file_id",
        F.posexplode("band_keys").alias("band_id", "band_key"))


def salted_buckets(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """L2 — size buckets, drop degenerates, salt hot buckets.

    Bucket sizes come from a groupBy (map-side partial agg) restricted to
    cnt >= 2 — the overwhelming majority of buckets are singletons, so the
    surviving count table is small and AQE broadcasts the join back onto
    the band rows (a window over the full band table would sort-shuffle
    every row instead, and was measurably slower).

    Output: (band_id, band_key, salt, file_id, cnt, nsplits), explicitly
    repartitioned on the salted key.
    """
    counts = (bands.groupBy("band_id", "band_key")
              .agg(F.count("*").alias("cnt"))
              .where((F.col("cnt") >= 2) & (F.col("cnt") <= cfg.max_bucket)))
    live = bands.join(counts, on=["band_id", "band_key"])
    salted = (live
              .withColumn("nsplits",
                          F.ceil(F.col("cnt") / F.lit(cfg.bucket_cap))
                          .cast("int"))
              .withColumn("salt",
                          F.pmod(F.xxhash64("file_id"),
                                 F.col("nsplits")).cast("int")))
    return salted.repartition("band_id", "band_key", "salt")


def bucket_metrics(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """No-silent-caps accounting: per-disposition bucket/member counts."""
    counts = bands.groupBy("band_id", "band_key").agg(F.count("*").alias("cnt"))
    return (counts
            .withColumn("disposition",
                        F.when(F.col("cnt") < 2, F.lit("singleton"))
                         .when(F.col("cnt") > cfg.max_bucket,
                               F.lit("dropped_degenerate"))
                         .when(F.col("cnt") > cfg.bucket_cap, F.lit("salted"))
                         .otherwise(F.lit("direct")))
            .groupBy("disposition")
            .agg(F.count("*").alias("n_buckets"),
                 F.sum("cnt").alias("n_members"),
                 F.max("cnt").alias("max_bucket_size")))


def cross_rep_pairs(salted: DataFrame, rep_k: int = 2) -> DataFrame:
    """Cross-salt connectivity pairs: up to ``rep_k`` representatives per
    salted sub-bucket (deterministic xxhash64 rank — see module docstring
    for why multiple reps and why hash rank), all-pairs across a bucket's
    reps. These are the pairs salted-bucket recall DEPENDS on (if every
    rep pair between two sub-buckets fails verification, true dups split
    across those salts never union) — so the pipeline also measures their
    verification outcome (rep_pair_health). The window sort touches only
    rows of buckets that actually salted (nsplits > 1) — a rare,
    metrics-tracked subset — never the full band table."""
    w = (Window.partitionBy("band_id", "band_key", "salt")
         .orderBy(F.xxhash64("file_id"), "file_id"))
    reps = (salted.where(F.col("nsplits") > 1)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= rep_k)
            .select("band_id", "band_key", F.col("file_id").alias("rep")))
    rkey = ["band_id", "band_key"]
    rl = reps.select(*rkey, F.col("rep").alias("a"))
    rr = reps.select(*rkey, F.col("rep").alias("b"))
    return (rl.join(rr, on=rkey)
            .where(F.col("a") < F.col("b"))
            .select("a", "b"))


def rep_pair_health(cross: DataFrame, verified: DataFrame) -> DataFrame:
    """Observability for the salting recall risk (ADVICE round 1): how many
    cross-salt representative pairs exist, and how many FAILED verification
    (a failed rep pair can disconnect true dups split across salts of a
    heterogeneous capped bucket). One small join + agg; only computed for
    metrics, never on the hot path."""
    j = (cross.dropDuplicates(["a", "b"])
         .join(verified.select("a", "b", "passed"), on=["a", "b"],
               how="left"))
    failed = ~F.coalesce(F.col("passed"), F.lit(False))
    return j.agg(
        F.count("*").alias("n_rep_pairs"),
        F.sum(failed.cast("long")).alias("n_rep_pairs_failed"))


def candidate_pairs(bands: DataFrame, cfg: DedupConfig,
                    handles: list | None = None) -> DataFrame:
    """L3 — distinct candidate pairs (a < b) from salted buckets.

    Equi-self-join on the salted key; AQE handles residual imbalance.
    Cross-salt connectivity restored via representative pairs.
    ``handles``: internal persisted DataFrames are appended here so the
    caller can unpersist them once the pair table is materialized.
    """
    # the within-salt self-join reads this TWICE (left/right) and the
    # representative pass a third time: persist EAGERLY — a lazy persist
    # races cold within a single downstream action and each branch
    # recomputes the window-count shuffle
    salted = salted_buckets(bands, cfg).persist()
    salted.count()
    if handles is not None:
        handles.append(salted)

    key = ["band_id", "band_key", "salt"]
    left = salted.select(*key, F.col("file_id").alias("a"))
    right = salted.select(*key, F.col("file_id").alias("b"))
    within = (left.join(right, on=key)
              .where(F.col("a") < F.col("b"))
              .select("a", "b"))

    pairs = (within.unionByName(cross_rep_pairs(salted, cfg.rep_k))
             .dropDuplicates(["a", "b"]))
    if handles is None:
        # no caller will unpersist for us (ADVICE r2: repeated registry
        # calls accumulated executor storage): materialize the pair table
        # now — localCheckpoint stores the (id-only) result and truncates
        # lineage, so the salted cache can be released immediately
        pairs = pairs.localCheckpoint(eager=True)
        salted.unpersist(blocking=True)
    return pairs
