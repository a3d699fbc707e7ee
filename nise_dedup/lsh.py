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
from nise_dedup.instrument import barrier


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
    # width = one task per core (floor 16), same rule as the pipeline's
    # ingest spread (round 6): this repartition feeds the salted CACHE the
    # self-join co-partitions on, so its width sets the task count of
    # every downstream pair stage; per-key load stays bounded by the
    # salting itself, not the partition count
    width = min(cfg.shuffle_partitions,
                max(bands.sparkSession.sparkContext.defaultParallelism, 16))
    return salted.repartition(width, "band_id", "band_key", "salt")


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


def _reps(salted: DataFrame, rep_k: int) -> DataFrame:
    """Per-sub-bucket representatives (band_id, band_key, salt, rep) —
    deterministic xxhash64 rank, shared by cross_rep_pairs and the
    escalation path so both see the SAME reps. The window sort touches
    only rows of buckets that actually salted (nsplits > 1) — a rare,
    metrics-tracked subset — never the full band table."""
    w = (Window.partitionBy("band_id", "band_key", "salt")
         .orderBy(F.xxhash64("file_id"), "file_id"))
    return (salted.where(F.col("nsplits") > 1)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= rep_k)
            .select("band_id", "band_key", "salt",
                    F.col("file_id").alias("rep")))


def cross_rep_pairs(salted: DataFrame, rep_k: int = 2) -> DataFrame:
    """Cross-salt connectivity pairs: up to ``rep_k`` representatives per
    salted sub-bucket (deterministic xxhash64 rank — see module docstring
    for why multiple reps and why hash rank), all-pairs across a bucket's
    reps. These are the pairs salted-bucket recall DEPENDS on (if every
    rep pair between two sub-buckets fails verification, true dups split
    across those salts never union) — so the pipeline also measures their
    verification outcome (rep_pair_health) and escalates buckets where a
    salt pair loses every rep chance (escalation_pairs)."""
    reps = _reps(salted, rep_k)
    rkey = ["band_id", "band_key"]
    rl = reps.select(*rkey, F.col("rep").alias("a"))
    rr = reps.select(*rkey, F.col("rep").alias("b"))
    return (rl.join(rr, on=rkey)
            .where(F.col("a") < F.col("b"))
            .select("a", "b"))


def failed_salt_pairs(salted: DataFrame, verified: DataFrame,
                      rep_k: int) -> DataFrame:
    """Salt pairs of a salted bucket whose rep_k^2 cross-salt rep pairs ALL
    failed verification — the exact situation where true dups split across
    those two salts are silently disconnected (VERDICT r4 next #7).
    Returns DF[band_id, band_key, salt_lo, salt_hi]."""
    reps = _reps(salted, rep_k)
    bkey = ["band_id", "band_key"]
    rl = reps.select(*bkey, F.col("salt").alias("sa"),
                     F.col("rep").alias("ra"))
    rr = reps.select(*bkey, F.col("salt").alias("sb"),
                     F.col("rep").alias("rb"))
    rp = (rl.join(rr, on=bkey)
          .where((F.col("ra") < F.col("rb")) & (F.col("sa") != F.col("sb")))
          .select(*bkey,
                  F.least("sa", "sb").alias("salt_lo"),
                  F.greatest("sa", "sb").alias("salt_hi"),
                  F.col("ra").alias("a"), F.col("rb").alias("b")))
    j = rp.join(verified.select("a", "b", "passed"), on=["a", "b"],
                how="left")
    per = (j.groupBy(*bkey, "salt_lo", "salt_hi")
           .agg(F.max(F.coalesce(F.col("passed"), F.lit(False)))
                .alias("any_pass")))
    return per.where(~F.col("any_pass")).drop("any_pass")


def _escalation_members(salted: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Members eligible for the escalation wave: rows of salted buckets
    whose total size clears ``escalate_max_members`` (oversized buckets
    skip the quadratic wave — accounted in escalation_diag)."""
    return salted.select("band_id", "band_key", "salt", "file_id",
                         "cnt").where(
        F.col("cnt") <= cfg.escalate_max_members)


def _costed_failed(salted: DataFrame, verified: DataFrame,
                   cfg: DedupConfig) -> DataFrame:
    """Failed salt pairs (of non-oversize buckets) with their member-pair
    cost and the running cost total in cost-ASCENDING order:
    DF[band_id, band_key, salt_lo, salt_hi, cost, cum]. Shared by
    escalation_pairs (keeps cum <= escalate_max_pairs) and
    escalation_diag (counts what the budget skipped).

    The running total uses one UNPARTITIONED window — safe because its
    input is the failed-salt-pair table, bounded by the (metrics-tracked)
    count of salted sub-bucket pairs, not by corpus size (2,893 rep pairs
    -> <=723 salt pairs on the 1M bench corpus). Structurally: admissible
    buckets have cnt <= escalate_max_members (512), salting starts above
    bucket_cap (256), so nsplits = 2 and each admissible failed bucket
    contributes exactly ONE salt pair — rows <= #salted admissible
    buckets, 40 B each; even a pathological 100M-salted-bucket corpus
    sorts ~4 GB in the one task (spills, completes). A range-partitioned
    prefix-sum formulation (floor(log2(cost)) buckets + per-bucket
    offsets, cum bit-identical — test_costed_failed_cum_is_global_prefix_
    sum pins the semantics) was A/B-measured at the 1M corpus and
    REVERTED: 414/447 s vs 331/325 s wall at local[8] — it references
    this subtree twice (bucket totals + rows), and the duplicated
    evaluation above the rep-verify join costs far more than the single
    bounded sort saves."""
    failed = failed_salt_pairs(salted, verified, cfg.rep_k)
    bkey = ["band_id", "band_key"]
    mcnt = (_escalation_members(salted, cfg)
            .groupBy(*bkey, "salt").agg(F.count("*").alias("m")))
    cl = mcnt.select(*bkey, F.col("salt").alias("salt_lo"),
                     F.col("m").alias("m_lo"))
    cr = mcnt.select(*bkey, F.col("salt").alias("salt_hi"),
                     F.col("m").alias("m_hi"))
    costed = (failed.join(cl, on=bkey + ["salt_lo"])
              .join(cr, on=bkey + ["salt_hi"])
              .withColumn("cost", F.col("m_lo") * F.col("m_hi")))
    w = Window.orderBy("cost", *bkey, "salt_lo", "salt_hi")
    return (costed.withColumn("cum", F.sum("cost").over(w))
            .select(*bkey, "salt_lo", "salt_hi", "cost", "cum"))


def escalation_pairs(salted: DataFrame, verified: DataFrame,
                     cfg: DedupConfig) -> DataFrame:
    """Remediation wave (VERDICT r4 next #7): for every failed salt pair
    (``failed_salt_pairs``) of a bucket with cnt <= cfg.escalate_max_members,
    emit the FULL cross-salt member pairs between those two sub-buckets as
    new candidates — verified downstream through the same frozen cascade,
    so a true dup split across the salts gets its direct pair instead of
    depending on rep connectivity. Parity-safe toward the oracle: its
    candidate set is the uncapped bucket all-pairs, a superset of every
    pair emitted here.

    TWO accounted caps, never silent (SURVEY §7.3; escalation_diag carries
    both counts):
    - per bucket: cnt <= escalate_max_members (cost ~cnt^2/2 otherwise);
    - per run: a TOTAL member-pair budget ``escalate_max_pairs`` (0 =
      unlimited) spent cost-ascending over the failed salt pairs. Round-5
      measurement on the 1M bench corpus: every one of 2,893 rep pairs
      failed (boilerplate noise buckets), and the unbudgeted wave
      deep-verified 1,392,990 member pairs to recover TWO passing pairs —
      +38% run wall at local[8] (461 s -> 284 s with the wave off,
      in-window paired runs). The genuine recoveries live in small salt
      pairs, so ascending cost keeps them and drops the quadratic noise
      tail.

    Returns DF[a, b] with a < b, deduplicated, NOT yet filtered against
    already-verified pairs (the caller anti-joins)."""
    bkey = ["band_id", "band_key"]
    chosen = _costed_failed(salted, verified, cfg)
    if cfg.escalate_max_pairs > 0:
        chosen = chosen.where(F.col("cum") <= cfg.escalate_max_pairs)
    chosen = chosen.select(*bkey, "salt_lo", "salt_hi")
    members = _escalation_members(salted, cfg)
    ml = members.select(*bkey, F.col("salt").alias("salt_lo"),
                        F.col("file_id").alias("fa"))
    mr = members.select(*bkey, F.col("salt").alias("salt_hi"),
                        F.col("file_id").alias("fb"))
    return (chosen.join(ml, on=bkey + ["salt_lo"])
            .join(mr, on=bkey + ["salt_hi"])
            .select(F.least("fa", "fb").alias("a"),
                    F.greatest("fa", "fb").alias("b"))
            .where(F.col("a") < F.col("b"))
            .dropDuplicates(["a", "b"]))


def escalation_diag(salted: DataFrame, verified: DataFrame,
                    cfg: DedupConfig) -> DataFrame:
    """No-silent-caps accounting for BOTH escalation bounds: one row with
    (n_failed_salt_pairs, n_skipped_oversize, n_skipped_budget,
    n_budgeted_pairs) — metrics path only. ``n_skipped_budget`` counts
    failed salt pairs of admissible (non-oversize) buckets whose running
    cost total exceeded ``escalate_max_pairs``; ``n_budgeted_pairs`` is
    the member-pair cost the wave actually admitted."""
    failed = failed_salt_pairs(salted, verified, cfg.rep_k)
    sizes = (salted.groupBy("band_id", "band_key")
             .agg(F.max("cnt").alias("cnt")))
    j = failed.join(sizes, on=["band_id", "band_key"], how="left")
    base = j.agg(
        F.count("*").alias("n_failed_salt_pairs"),
        F.sum((F.col("cnt") > cfg.escalate_max_members).cast("long"))
        .alias("n_skipped_oversize"))
    costed = _costed_failed(salted, verified, cfg)
    over = (F.col("cum") > cfg.escalate_max_pairs) \
        if cfg.escalate_max_pairs > 0 else F.lit(False)
    bud = costed.agg(
        F.coalesce(F.sum(over.cast("long")), F.lit(0))
        .alias("n_skipped_budget"),
        F.coalesce(F.sum(F.when(~over, F.col("cost"))), F.lit(0))
        .alias("n_budgeted_pairs"))
    return base.crossJoin(bud)


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
                    handles: list | None = None,
                    stats: dict | None = None) -> DataFrame:
    """L3 — distinct candidate pairs (a < b) from salted buckets.

    Equi-self-join on the salted key; AQE handles residual imbalance.
    Cross-salt connectivity restored via representative pairs.
    ``handles``: internal persisted DataFrames are appended here so the
    caller can unpersist them once the pair table is materialized.
    ``stats``: populated with ``n_salted_rows`` (rows living in salted
    sub-buckets) measured by the materializing agg — free signal for the
    caller's escalation-wave gate.
    """
    # the within-salt self-join reads this TWICE (left/right) and the
    # representative pass a third time: persist EAGERLY — a lazy persist
    # races cold within a single downstream action and each branch
    # recomputes the window-count shuffle. The materializing action doubles
    # as the salted-row measurement (any nsplits>1 rows?) so the pipeline's
    # escalation wave never pays a separate probe barrier for the common
    # nothing-salted case (VERDICT r4 next #1: every driver barrier is
    # serial time).
    salted = salted_buckets(bands, cfg).persist()
    with barrier("l_salted_fill"):
        n_salted_rows = salted.agg(
            F.sum((F.col("nsplits") > 1).cast("long"))).first()[0] or 0
    if stats is not None:
        stats["n_salted_rows"] = int(n_salted_rows)
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
