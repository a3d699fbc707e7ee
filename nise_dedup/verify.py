"""Verification cascade V1–V4 (SURVEY §2.5).

Frozen pass policy (identical in tests/oracle.py — this is the semantics the
recall contract is measured under):

    passed = (jaccard >= tau_jaccard)
           | (hamming <= tau_hamming)
           | (jaccard >= tau_lcs_gate  AND  lcs_len >= tau_lcs_ratio
                                            * min(n_bytes_a, n_bytes_b))

Cost cascade: Hamming (one XOR+popcount, JVM) and exact Jaccard
(array_intersect/array_union over the stored shingle sets, JVM) are computed
for every candidate pair; the O(n log^2 n) suffix-array LCS runs ONLY for
pairs that failed both fast checks but cleared the Jaccard gate — at web
scale that is a small residue (the `block` copy class), and it is the only
stage that needs to re-join pair ids back to content bytes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nise_dedup.config import DedupConfig


def jaccard_expr(sh_a, sh_b):
    """V1 — exact shingle-set Jaccard, JVM-side array ops."""
    union = F.size(F.array_union(sh_a, sh_b))
    inter = F.size(F.array_intersect(sh_a, sh_b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def hamming_expr(sim_a, sim_b):
    """V2 — SimHash Hamming distance: popcount(a XOR b), JVM-side."""
    return F.bit_count(sim_a.bitwiseXOR(sim_b))


def _lcs_mapper(tau_lcs_ratio: float, tau_lcs_min_bytes: int, norm: str):
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nise_dedup.hashing import normalize_text
        from nise_dedup.suffix import has_common_substring, \
            longest_common_substring

        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            lcs = [-1] * n
            ok = [False] * n
            for i, (sa, sb) in enumerate(zip(pdf["content_a"],
                                             pdf["content_b"])):
                ca = normalize_text(sa, norm).encode("utf-8")
                cb = normalize_text(sb, norm).encode("utf-8")
                need = int(max(tau_lcs_min_bytes,
                               tau_lcs_ratio * min(len(ca), len(cb))))
                # exact O(n) threshold decision (hash-intersect +
                # byte-verify); the O(n log^2 n) suffix array runs only on
                # PASSING pairs, to report the true lcs_len, and on the
                # astronomically-rare ambiguous collision (None)
                hit = has_common_substring(ca, cb, need)
                if hit is False:
                    continue  # certain fail; lcs_len = -1 = "not computed"
                lcs[i] = longest_common_substring(ca, cb)
                ok[i] = lcs[i] >= need
            yield pd.DataFrame({"a": pdf["a"].to_numpy(),
                                "b": pdf["b"].to_numpy(),
                                "lcs_len": lcs,
                                "lcs_pass": ok})
    return compute


def verify_pairs(cand: DataFrame, signatures: DataFrame,
                 uniq: DataFrame, cfg: DedupConfig) -> DataFrame:
    """V4 — full cascade. Returns
    DF[a, b, jaccard, hamming, lcs_len, passed]; lcs_len = -1 where not run.

    ``signatures`` must carry (file_id, simhash, shingles); ``uniq`` carries
    (file_id, content) for the LCS residue only.
    """
    sig_a = signatures.select(F.col("file_id").alias("a"),
                              F.col("simhash").alias("simhash_a"),
                              F.col("shingles").alias("sh_a"))
    sig_b = signatures.select(F.col("file_id").alias("b"),
                              F.col("simhash").alias("simhash_b"),
                              F.col("shingles").alias("sh_b"))
    fast = (cand.join(sig_a, on="a").join(sig_b, on="b")
            .withColumn("jaccard", jaccard_expr(F.col("sh_a"), F.col("sh_b")))
            .withColumn("hamming", hamming_expr(F.col("simhash_a"),
                                                F.col("simhash_b")))
            .select("a", "b", "jaccard", "hamming")
            .withColumn("passed_fast",
                        (F.col("jaccard") >= cfg.tau_jaccard)
                        | (F.col("hamming") <= cfg.tau_hamming)))
    # `fast` feeds both the LCS residue and the final join (a diamond):
    # persist so the signature joins don't recompute
    fast = fast.persist()

    if not cfg.lcs_enabled:
        return (fast
                .withColumn("lcs_len", F.lit(-1).cast("long"))
                .withColumn("passed", F.col("passed_fast"))
                .drop("passed_fast"))

    need = (fast
            .where(~F.col("passed_fast")
                   & (F.col("jaccard") >= cfg.tau_lcs_gate))
            .select("a", "b"))
    # skip pairs that can never clear the absolute LCS floor: LCS <= min
    # normalized length <= min raw byte length (normalization only removes)
    c_a = uniq.select(F.col("file_id").alias("a"),
                      F.col("content").alias("content_a"),
                      F.octet_length("content").alias("raw_a"))
    c_b = uniq.select(F.col("file_id").alias("b"),
                      F.col("content").alias("content_b"),
                      F.octet_length("content").alias("raw_b"))
    lcs = (need.join(c_a, on="a").join(c_b, on="b")
           .where(F.least("raw_a", "raw_b") >= cfg.tau_lcs_min_bytes)
           .drop("raw_a", "raw_b")
           .mapInPandas(_lcs_mapper(cfg.tau_lcs_ratio, cfg.tau_lcs_min_bytes,
                                    cfg.normalize),
                        schema="a long, b long, lcs_len long, lcs_pass boolean"))

    return (fast
            .join(lcs, on=["a", "b"], how="left")
            .withColumn("lcs_len",
                        F.coalesce(F.col("lcs_len"), F.lit(-1)).cast("long"))
            .withColumn("passed",
                        F.col("passed_fast")
                        | F.coalesce(F.col("lcs_pass"), F.lit(False)))
            .select("a", "b", "jaccard", "hamming", "lcs_len", "passed"))
