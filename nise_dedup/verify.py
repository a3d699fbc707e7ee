"""Verification cascade V1–V4 (SURVEY §2.5).

Frozen pass policy — see DedupConfig for the exact formula; tests/oracle.py
implements the identical cascade, so cluster parity with the reference
oracle is exact, not probabilistic.

Cost shape (the part that matters at 10^12 files):
- every candidate pair joins only fixed-width metadata: an 8-byte simhash,
  a 256-byte minhash prefix (est_components) and a length — never the full
  shingle sets;
- content bytes join ONLY for the est-gated residue, where ONE Arrow mapper
  ("deep verify") recomputes the shingle sets (memoized per worker),
  computes exact Jaccard, and runs the LCS check: an exact O(n)
  rolling-hash threshold decision first, the O(n log^2 n) suffix array only
  for pairs that provably contain a qualifying common substring.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nise_dedup.config import DedupConfig


def jaccard_expr(sh_a, sh_b):
    """V1 — exact set Jaccard over array columns, JVM-side (used by oracle
    queries and tests; the pipeline's exact-J runs in the deep mapper)."""
    union = F.size(F.array_union(sh_a, sh_b))
    inter = F.size(F.array_intersect(sh_a, sh_b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def hamming_expr(sim_a, sim_b):
    """V2 — SimHash Hamming distance: popcount(a XOR b), JVM-side."""
    return F.bit_count(sim_a.bitwiseXOR(sim_b))


_EVEN_BITS = 0x5555555555555555


def bbit_est_expr(lo_a, hi_a, lo_b, hi_b, m: int):
    """b-bit MinHash agreement estimate (b=2, Li & Koenig '10), corrected
    for random 2-bit collisions: est = (matches/m - 1/4) / (3/4).

    Pure XOR / shift / popcount — whole-stage-codegen (the earlier
    zip_with/filter higher-order-function formulation was interpreted
    per-row and dominated the metadata join). Slot i of each 64-bit word
    holds 2 bits; a slot differs iff either bit differs, counted by masking
    (x | x>>1) to the even bit positions. Arithmetic sign-extension from
    shiftright lands on odd bit 63 and is masked out. Unused slots are zero
    in both words and masked out via the slot-count masks.
    """
    def unequal(a, b, slots):
        if slots <= 0:
            return F.lit(0)
        x = a.bitwiseXOR(b)
        y = (x.bitwiseOR(F.shiftright(x, 1))).bitwiseAND(F.lit(_EVEN_BITS))
        if slots < 32:
            y = y.bitwiseAND(F.lit((1 << (2 * slots)) - 1))
        return F.bit_count(y)

    uneq = (unequal(lo_a, lo_b, min(32, m))
            + unequal(hi_a, hi_b, m - 32))
    matches = F.lit(m) - uneq
    return (matches / F.lit(m) - 0.25) / 0.75


def _deep_mapper(cfg: DedupConfig):
    """Exact Jaccard + LCS over content for the est-gated residue.

    Input cols: a, b, est, content_a, content_b.
    Output: a, b, jaccard double (-1 if not computed), lcs_len long (-1),
    deep_pass boolean. Per-worker memo caches normalized bytes AND shingle
    sets per file id (pairs are repartitioned by `a`, so hits are frequent).
    """
    k, norm = cfg.shingle_k, cfg.normalize
    tau_j, exact_gate = cfg.tau_jaccard, cfg.est_exact_gate
    lcs_gate, ratio = cfg.tau_lcs_gate, cfg.tau_lcs_ratio
    floor, lcs_on = cfg.tau_lcs_min_bytes, cfg.lcs_enabled
    exact_lengths = cfg.lcs_exact_lengths

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from nise_dedup import hashing as H
        from nise_dedup.suffix import has_common_substring, \
            longest_common_substring

        memo: dict[int, tuple] = {}   # fid -> (norm_bytes, shingle_set|None)

        def entry(fid: int, s: str, want_shingles: bool):
            e = memo.get(fid)
            if e is None:
                e = (H.normalize_text(s, norm).encode("utf-8"), None)
            if want_shingles and e[1] is None:
                e = (e[0], H.shingle_hashes(e[0], k))
            if len(memo) > 2048:
                memo.clear()
            memo[fid] = e
            return e

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            jac = np.full(n, -1.0)
            lcs = np.full(n, -1, dtype=np.int64)
            ok = np.zeros(n, dtype=bool)
            ids_a = pdf["a"].to_numpy()
            ids_b = pdf["b"].to_numpy()
            ests = pdf["est"].to_numpy()
            for i, (sa, sb) in enumerate(zip(pdf["content_a"],
                                             pdf["content_b"])):
                est = ests[i]
                want_j = est >= exact_gate
                ca, sha = entry(int(ids_a[i]), sa, want_j)
                cb, shb = entry(int(ids_b[i]), sb, want_j)
                if want_j:
                    inter = np.intersect1d(sha, shb,
                                           assume_unique=True).size
                    union = sha.size + shb.size - inter
                    jac[i] = (inter / union) if union else 1.0
                    ok[i] = jac[i] >= tau_j
                if ok[i] or not lcs_on or est < lcs_gate:
                    continue
                # the pass rule is lcs_len >= max(floor, ratio*min_len) with
                # a FLOAT rhs (the frozen oracle compares it unfloored), so
                # the integer threshold is the ceiling, not the truncation:
                # int() would accept lcs=614 when ratio*min_len=614.4
                need = int(max(floor,
                               math.ceil(ratio * min(len(ca), len(cb)))))
                if min(len(ca), len(cb)) < need:
                    continue
                # exact O(n) threshold decision; `passed` never needs the
                # true max — the suffix array runs only for diagnostics
                # (lcs_exact_lengths) or the ~2^-64 ambiguous collision
                hit = has_common_substring(ca, cb, need)
                if hit is False:
                    continue
                if exact_lengths or hit is None:
                    lcs[i] = longest_common_substring(ca, cb)
                    ok[i] = lcs[i] >= need
                else:
                    lcs[i] = need       # verified lower bound
                    ok[i] = True
            yield pd.DataFrame({"a": ids_a, "b": ids_b, "jaccard": jac,
                                "lcs_len": lcs, "deep_pass": ok})

    return compute


def verify_pairs(cand: DataFrame, signatures: DataFrame,
                 uniq: DataFrame, cfg: DedupConfig,
                 handles: list | None = None) -> DataFrame:
    """V4 — cascade (see DedupConfig). Returns
    DF[a, b, est, jaccard, hamming, lcs_len, passed];
    jaccard/lcs_len = -1 where the cascade never computed them.

    ``signatures`` must carry (file_id, simhash, minhash, n_bytes);
    ``uniq`` carries (file_id, content) for the deep residue only.
    ``handles``: internal persisted DataFrames are appended here so the
    caller can unpersist them once the verified table is materialized.
    """
    m_eff = min(cfg.est_components, cfg.num_perm)
    meta_a = signatures.select(F.col("file_id").alias("a"),
                               F.col("simhash").alias("simhash_a"),
                               F.col("mhb_lo").alias("lo_a"),
                               F.col("mhb_hi").alias("hi_a"),
                               F.col("n_bytes").alias("len_a"))
    meta_b = signatures.select(F.col("file_id").alias("b"),
                               F.col("simhash").alias("simhash_b"),
                               F.col("mhb_lo").alias("lo_b"),
                               F.col("mhb_hi").alias("hi_b"),
                               F.col("n_bytes").alias("len_b"))
    meta = (cand.join(meta_a.hint("shuffle_hash"), on="a")
            .join(meta_b.hint("shuffle_hash"), on="b")
            .withColumn("est", bbit_est_expr(F.col("lo_a"), F.col("hi_a"),
                                             F.col("lo_b"), F.col("hi_b"),
                                             m_eff))
            .withColumn("hamming", hamming_expr(F.col("simhash_a"),
                                                F.col("simhash_b")))
            .select("a", "b", "est", "hamming", "len_a", "len_b")
            .persist())
    meta.count()   # eager: three consumers below; lazy persist would race
    if handles is not None:
        handles.append(meta)

    # deep residue: hamming failed, est below the near-certain accept, AND
    # est clears a gate; the LCS-only band (est in [lcs_gate, exact_gate))
    # additionally needs the length floor (LCS <= min normalized length,
    # computed exactly in the signature stage)
    fast_pass = ((F.col("hamming") <= cfg.tau_hamming)
                 | (F.col("est") >= cfg.est_accept))
    deep_gate = ~fast_pass & (
        (F.col("est") >= cfg.est_exact_gate)
        | ((F.col("est") >= cfg.tau_lcs_gate) & cfg.lcs_enabled
           & (F.least("len_a", "len_b") >= cfg.tau_lcs_min_bytes)))
    need = meta.where(deep_gate).select("a", "b", "est")

    c_a = uniq.select(F.col("file_id").alias("a"),
                      F.col("content").alias("content_a"))
    c_b = uniq.select(F.col("file_id").alias("b"),
                      F.col("content").alias("content_b"))
    deep_schema = ("a long, b long, jaccard double, lcs_len long, "
                   "deep_pass boolean")
    deep = (need.join(c_a, on="a").join(c_b, on="b")
            # spread the CPU-heavy residue across cores even when the join
            # planned a broadcast; key by `a` so the worker memo hits
            .repartition(cfg.shuffle_partitions, "a")
            .mapInPandas(_deep_mapper(cfg), schema=deep_schema))

    return (meta.join(deep, on=["a", "b"], how="left")
            .withColumn("jaccard", F.coalesce("jaccard", F.lit(-1.0)))
            .withColumn("lcs_len",
                        F.coalesce(F.col("lcs_len"), F.lit(-1)).cast("long"))
            .withColumn("passed",
                        (F.col("hamming") <= cfg.tau_hamming)
                        | (F.col("est") >= cfg.est_accept)
                        | F.coalesce(F.col("deep_pass"), F.lit(False)))
            .select("a", "b", "est", "jaccard", "hamming", "lcs_len",
                    "passed"))
