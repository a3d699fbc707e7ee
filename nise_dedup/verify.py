"""Verification cascade V1–V4 (SURVEY §2.5).

Frozen pass policy — see DedupConfig for the exact formula; tests/oracle.py
implements the identical cascade, so cluster parity with the reference
oracle is exact, not probabilistic.

Cost shape (the part that matters at 10^12 files):
- every candidate pair joins only fixed-width metadata: an 8-byte simhash,
  a 256-byte minhash prefix (est_components) and a length — never the full
  shingle sets;
- content bytes move ONLY for the est-gated residue, through one of TWO
  formulations chosen ADAPTIVELY from the measured residue size AND its
  content-duplication fanout (round 5, `choose_joined`; the choice costs
  nothing — both inputs fold into the metadata cache-fill agg):

  * JOINED (small residue): join content onto the pair rows and feed the
    Arrow mapper directly. When the pair list is broadcast-sized, AQE
    broadcasts it and `uniq` content never shuffles at all — the only
    content movement is the single repartition of the joined rows. A/B
    at 200k/500k files measured this 10-20% faster end-to-end than the
    co-shuffle (which pays a blocking local sort for a byte saving that
    is small while pairs-per-participant is ~2).
  * CO-SHUFFLED (unbroadcastable residue AND hot participants): in the
    unbroadcastable shape the joined plan shuffles full `uniq` content
    for both join sides plus the per-pair attached bytes — the scale
    killer when each participant's content rides many pairs. Round-5
    A/B measured the crossover at fanout ~16 on this box
    (`choose_joined`; BENCH/ADDENDUM.md Addendum 5). Here, bucket pairs
    by pmod(xxhash64(a), 8P), tag the
    distinct participants' content rows with the same bucket, union,
    repartition ONCE on the bucket and locally sort so each bucket's
    content precedes its pairs: content shuffles once per (participant,
    bucket), never per pair, and the mapper normalizes + shingles each
    participant once per bucket.

- inside the mapper, exact Jaccard and the LCS check run as before: an
  exact O(n) rolling-hash threshold decision first, the O(n log^2 n)
  suffix array only for pairs that provably contain a qualifying common
  substring. Both formulations evaluate pairs through ONE shared cascade
  closure (`_make_cascade`), so the frozen policy cannot drift between
  them.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nise_dedup import instrument
from nise_dedup.config import DedupConfig
from nise_dedup.instrument import barrier


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


def _make_cascade(cfg: DedupConfig):
    """The per-pair deep cascade (exact Jaccard → LCS decision), built once
    per mapper on the worker and SHARED by both deep formulations so the
    frozen policy cannot drift between them.

    ``ea``/``eb`` are mutable ``[norm_bytes, shingles|None]`` entries —
    shingle sets are computed lazily on first need and memoized back into
    the entry, so a participant pays the O(m) shingle pass at most once
    per mapper-side table/memo lifetime.

    Returns run(ea, eb, est) -> (jaccard, lcs_len, ok) with jaccard=-1.0 /
    lcs_len=-1 where the cascade never computed them.
    """
    import numpy as np

    from nise_dedup import hashing as H
    from nise_dedup.suffix import _rolling_hashes, longest_common_substring

    k = cfg.shingle_k
    tau_j, exact_gate = cfg.tau_jaccard, cfg.est_exact_gate
    lcs_gate, ratio = cfg.tau_lcs_gate, cfg.tau_lcs_ratio
    floor, lcs_on = cfg.tau_lcs_min_bytes, cfg.lcs_enabled
    exact_lengths = cfg.lcs_exact_lengths

    def shingles_of(e):
        if e[1] is None:
            e[1] = H.shingle_hashes(e[0], k)
        return e[1]

    def grams_of(e, w: int):
        """Memoized sorted-unique w-gram rolling hashes of a participant's
        normalized bytes + the first-occurrence index of each value —
        the LCS gram decision (suffix.has_common_substring) recomputed
        both tables per PAIR, which profiled at 69% of the whole cascade
        on the 1M corpus's deep residue (round 6); each participant rides
        ~16 pairs there, so the per-(doc, width) memo amortizes them."""
        if len(e) < 3:
            e.append({})
        g = e[2].get(w)
        if g is None:
            h = _rolling_hashes(np.frombuffer(e[0], dtype=np.uint8), w)
            g = np.unique(h, return_index=True)   # (sorted vals, first idx)
            e[2][w] = g
        return g

    def run(ea, eb, est):
        jac, lcs, ok = -1.0, -1, False
        if est >= exact_gate:
            sha, shb = shingles_of(ea), shingles_of(eb)
            inter = np.intersect1d(sha, shb, assume_unique=True).size
            union = sha.size + shb.size - inter
            jac = (inter / union) if union else 1.0
            ok = jac >= tau_j
        ca, cb = ea[0], eb[0]
        if not ok and lcs_on and est >= lcs_gate:
            # the pass rule is lcs_len >= max(floor, ratio*min_len) with a
            # FLOAT rhs (the frozen oracle compares it unfloored), so the
            # integer threshold is the ceiling, not the truncation: int()
            # would accept lcs=614 when ratio*min_len=614.4
            need = int(max(floor,
                           math.ceil(ratio * min(len(ca), len(cb)))))
            if min(len(ca), len(cb)) >= need:
                # exact O(n) threshold decision, identical to
                # suffix.has_common_substring evaluated over the memoized
                # gram tables: a miss in the gram intersection proves
                # LCS < need; a hit is byte-verified at the same
                # first-occurrence positions; unverifiable collisions
                # (~2^-64) fall back to the exact suffix array.
                # `passed` never needs the true max — the suffix array
                # runs only for diagnostics (lcs_exact_lengths) or that
                # ambiguous-collision case.
                va, fa = grams_of(ea, need)
                vb, fb = grams_of(eb, need)
                _, ia, ib = np.intersect1d(va, vb, assume_unique=True,
                                           return_indices=True)
                if ia.size == 0:
                    hit = False
                else:
                    hit = None
                    for iu, ju in zip(ia, ib):
                        i, j = int(fa[iu]), int(fb[ju])
                        if ca[i:i + need] == cb[j:j + need]:
                            hit = True
                            break
                if hit is not False:
                    if exact_lengths or hit is None:
                        lcs = longest_common_substring(ca, cb)
                        ok = lcs >= need
                    else:
                        lcs = need       # verified lower bound
                        ok = True
        return jac, lcs, ok

    return run


def _deep_mapper_joined(cfg: DedupConfig):
    """Deep verify over content-JOINED pair rows (the small-residue
    formulation; see module docstring).

    Input cols: a, b, est, content_a, content_b.
    Output: a, b, jaccard double (-1 if not computed), lcs_len long (-1),
    deep_pass boolean. Per-worker memo caches normalized bytes AND shingle
    sets per file id (pairs are repartitioned by `a`, so hits are
    frequent).
    """
    norm = cfg.normalize

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from nise_dedup import hashing as H

        cascade = _make_cascade(cfg)
        memo: dict[int, list] = {}   # fid -> [norm_bytes, shingles|None]

        def entry(fid: int, s: str):
            e = memo.get(fid)
            if e is None:
                if len(memo) > 2048:
                    memo.clear()
                e = [H.normalize_text(s, norm).encode("utf-8"), None]
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
                ea = entry(int(ids_a[i]), sa)
                eb = entry(int(ids_b[i]), sb)
                jac[i], lcs[i], ok[i] = cascade(ea, eb, ests[i])
            yield pd.DataFrame({"a": ids_a, "b": ids_b, "jaccard": jac,
                                "lcs_len": lcs, "deep_pass": ok})

    return compute


def _deep_mapper(cfg: DedupConfig):
    """Deep verify over the CO-SHUFFLED residue stream (the large-residue
    formulation; see module docstring).

    Input: the tagged union stream, locally sorted by (pid, tag) —
      tag=0 rows carry (pid, a=fid, content): a participant's content;
      tag=1 rows carry (pid, a, b, est): a pair to evaluate.
    All of a bucket's content rows precede its pair rows, so the mapper
    builds one per-bucket table (normalized bytes + lazily computed shingle
    set per fid, each computed EXACTLY ONCE per bucket) and evaluates every
    pair from it. The table is dropped when the bucket id changes — sorted
    input bounds resident memory to one bucket's participants; the bucket
    count (8 * cfg.shuffle_partitions) is the scale knob.

    Output: a, b, jaccard double (-1 if not computed), lcs_len long (-1),
    deep_pass boolean — pair rows only.

    IMPORTANT Arrow detail: every numeric input column is non-nullable by
    construction (content rows reuse a=fid, b=0, est=0.0) — a nullable
    int64 column would surface in pandas as float64 and corrupt xxhash64
    ids above 2^53.
    """
    norm = cfg.normalize

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from nise_dedup import hashing as H

        cascade = _make_cascade(cfg)
        cur_pid = None
        table: dict[int, list] = {}   # fid -> [norm_bytes, shingles|None]

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            pids = pdf["pid"].to_numpy()
            tags = pdf["tag"].to_numpy()
            ids_a = pdf["a"].to_numpy()
            ids_b = pdf["b"].to_numpy()
            ests = pdf["est"].to_numpy()
            contents = pdf["content"]
            out_a: list[int] = []
            out_b: list[int] = []
            out_j: list[float] = []
            out_l: list[int] = []
            out_ok: list[bool] = []
            for i in range(n):
                if pids[i] != cur_pid:
                    cur_pid = pids[i]
                    table.clear()
                if tags[i] == 0:
                    table[int(ids_a[i])] = [
                        H.normalize_text(contents.iloc[i], norm)
                        .encode("utf-8"), None]
                    continue
                a, b = int(ids_a[i]), int(ids_b[i])
                ea, eb = table.get(a), table.get(b)
                if ea is None or eb is None:
                    raise RuntimeError(
                        f"deep verify: content row missing for pair "
                        f"({a}, {b}) in bucket {cur_pid}")
                jac, lcs, ok = cascade(ea, eb, ests[i])
                out_a.append(a)
                out_b.append(b)
                out_j.append(jac)
                out_l.append(lcs)
                out_ok.append(ok)
            if out_a:
                yield pd.DataFrame({
                    "a": np.array(out_a, dtype=np.int64),
                    "b": np.array(out_b, dtype=np.int64),
                    "jaccard": np.array(out_j, dtype=np.float64),
                    "lcs_len": np.array(out_l, dtype=np.int64),
                    "deep_pass": np.array(out_ok, dtype=bool)})

    return compute


def choose_joined(n_deep: int, n_participants: int,
                  cfg: DedupConfig) -> bool:
    """Adaptive deep-verify formulation choice (VERDICT r4 next #3).

    Returns True for the JOINED formulation (content joins the pair list),
    False for the CO-SHUFFLED one (content moves once per participant-
    bucket). Round-5 A/B measured the co-shuffle IN ITS OWN REGIME —
    autoBroadcastJoinThreshold=-1 (nothing broadcastable, the plan shape
    of an over-threshold residue on a real cluster), 1M-file corpus,
    5.8M-pair est-gated residue with 719k distinct participants (mean
    fanout 16.2), local[8]. Adjacent clean-window runs went both ways
    (co-shuffle 344s -> joined 412s -> co-shuffle 437s; clean medians
    391s vs 409s): at this fanout the formulations sit WITHIN
    window-drift noise of each other — the measured crossover. Earlier
    unpaired readings (joined 373-409s vs co-shuffle 568/475s) were
    hypervisor drift: it moves every barrier uniformly 1.5x+ and swamps
    a 20% plan effect (BENCH/ADDENDUM.md Addendum 5). The regime split:

    - below the ``deep_coshuffle_pairs`` floor the pair list is
      broadcast-sized and joined measured 10-20% faster (round-4 A/B,
      616k-pair residue: AQE broadcasts it, content never shuffles);
    - above the floor, switch on the content-duplication fanout
      ``2*n_deep/participants``: joined attaches content once per pair
      side, co-shuffle once per participant-bucket, so co-shuffle pays
      off as fanout grows. ``deep_coshuffle_fanout`` sits just BELOW the
      crossover this box measures (~16) because the box pays joined's
      duplicated bytes through a shared memory bus, while a real cluster
      pays them through the network shuffle — costlier relative to
      co-shuffle's node-local sort, and more so at the 100-TB point.
    """
    if n_deep < cfg.deep_coshuffle_pairs:
        return True
    fanout = 2.0 * n_deep / max(1, n_participants)
    return fanout < cfg.deep_coshuffle_fanout


def _gate_exprs(cfg: DedupConfig):
    """The frozen cascade's routing predicates over a pair-metadata frame
    (est, hamming, len_a, len_b columns): (fast_pass, deep_gate). Shared
    by verify_pairs and the metrics-mode deep-gate accounting so the two
    can never drift."""
    fast_pass = ((F.col("hamming") <= cfg.tau_hamming)
                 | (F.col("est") >= cfg.est_accept))
    deep_gate = ~fast_pass & (
        (F.col("est") >= cfg.est_exact_gate)
        | ((F.col("est") >= cfg.tau_lcs_gate) & cfg.lcs_enabled
           & (F.least("len_a", "len_b") >= cfg.tau_lcs_min_bytes)))
    return fast_pass, deep_gate


def _pair_meta(cand: DataFrame, signatures: DataFrame,
               cfg: DedupConfig) -> DataFrame:
    """The 16-byte-sketch pair-metadata join + est/hamming exprs —
    extracted so count_deep_gated shares verify_pairs' exact plan shape."""
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
    # join strategy left to AQE (round 6): the forced shuffle_hash hint
    # suppressed AQE's runtime broadcast conversion, so the bench-scale
    # sketch table (40 B/row) shuffled the pair list twice; unhinted, AQE
    # broadcasts the sketch side when its runtime size fits and falls back
    # to shuffled-hash (session.py sets preferSortMergeJoin=false) at
    # scale — the same plan the hint forced, minus the sort
    return (cand.join(meta_a, on="a")
            .join(meta_b, on="b")
            .withColumn("est", bbit_est_expr(F.col("lo_a"), F.col("hi_a"),
                                             F.col("lo_b"), F.col("hi_b"),
                                             m_eff))
            .withColumn("hamming", hamming_expr(F.col("simhash_a"),
                                                F.col("simhash_b")))
            .select("a", "b", "est", "hamming", "len_a", "len_b"))


def count_deep_gated(cand: DataFrame, signatures: DataFrame,
                     cfg: DedupConfig) -> int:
    """How many of ``cand`` the cascade would route to DEEP verification —
    metrics-mode accounting for the escalation deep budget (no-silent-caps:
    n_esc_deep_dropped in pipeline metrics), never on the hot path."""
    _, deep_gate = _gate_exprs(cfg)
    row = (_pair_meta(cand, signatures, cfg)
           .agg(F.sum(deep_gate.cast("long")).alias("d")).first())
    return int(row["d"] or 0)


def verify_pairs(cand: DataFrame, signatures: DataFrame,
                 uniq: DataFrame, cfg: DedupConfig,
                 handles: list | None = None,
                 eager_meta: bool = True,
                 formulation: str = "auto",
                 deep_budget: int = 0) -> DataFrame:
    """V4 — cascade (see DedupConfig). Returns
    DF[a, b, est, jaccard, hamming, lcs_len, passed];
    jaccard/lcs_len = -1 where the cascade never computed them.

    ``signatures`` must carry (file_id, simhash, minhash, n_bytes);
    ``uniq`` carries (file_id, content) for the deep residue only.
    ``handles``: internal persisted DataFrames are appended here so the
    caller can unpersist them once the verified table is materialized.

    ``eager_meta=False`` skips the pair-metadata agg barrier (one
    sequential driver action per call — barrier-attributed at 5-8 s per
    occurrence on the 200k bench corpus, r5): the meta persist then
    fills lazily on first consumption, and because the output plan
    references meta twice the fill can race cold and compute the meta
    plan twice. Only for SMALL calls (rep pairs, the escalation wave —
    both bounded by the salting caps) where double-computing meta is
    cheaper than a barrier; the residue count is then unknown, so
    ``formulation`` must name the deep plan explicitly ("joined" for
    those bounded calls — AQE still shuffle-joins if the residue
    surprises upward).

    ``deep_budget`` (0 = off): cap the DEEP residue to the top-N pairs by
    est DESCENDING (deterministic a,b tiebreak) — best-evidence-first.
    Used by the escalation wave only (see DedupConfig.escalate_deep_budget
    for the round-5 1M measurement behind it); budget-dropped pairs keep
    their sketch verdicts (fast-pass/fail) and simply skip deep, exactly
    like pairs below the est gates. Accounted in pipeline metrics via
    count_deep_gated (n_esc_deep_dropped) — never a silent cap.
    """
    if not eager_meta and formulation == "auto":
        raise ValueError("eager_meta=False requires an explicit "
                         "formulation (no residue count to adapt on)")
    meta = _pair_meta(cand, signatures, cfg).persist()

    # deep residue: hamming failed, est below the near-certain accept, AND
    # est clears a gate; the LCS-only band (est in [lcs_gate, exact_gate))
    # additionally needs the length floor (LCS <= min normalized length,
    # computed exactly in the signature stage)
    fast_pass, deep_gate = _gate_exprs(cfg)

    # ONE action fills the (three-consumer) metadata cache AND measures the
    # residue for the adaptive formulation choice — a separate need.count()
    # would be a wasted sequential barrier
    if eager_meta:
        with barrier("v_meta_agg"):
            # the two HLL sketches ride the SAME hash agg / shuffle as the
            # counts — the fanout input costs no extra barrier
            row = meta.agg(
                F.count("*").alias("n"),
                F.sum(deep_gate.cast("long")).alias("d"),
                F.approx_count_distinct(
                    F.when(deep_gate, F.col("a"))).alias("da"),
                F.approx_count_distinct(
                    F.when(deep_gate, F.col("b"))).alias("db")).first()
        n_deep = row["d"] or 0
        # da+db double-counts ids present on both sides, OVERestimating
        # participants and so UNDERestimating fanout — the error biases
        # toward joined, the measured-safe default
        n_participants = (row["da"] or 0) + (row["db"] or 0)
        instrument.note("n_pairs", row["n"])
        instrument.note("n_deep", n_deep)
        instrument.note("n_deep_participants", n_participants)
    else:
        n_deep = 0      # unused: formulation is forced by the caller
        n_participants = 0
    if handles is not None:
        handles.append(meta)
    need = meta.where(deep_gate).select("a", "b", "est")
    if deep_budget > 0:
        # TakeOrdered (sort+limit fuses; no full shuffle) — best evidence
        # first, deterministic under ties
        need = need.orderBy(F.desc("est"), "a", "b").limit(deep_budget)

    deep_schema = ("a long, b long, jaccard double, lcs_len long, "
                   "deep_pass boolean")
    # Wave-1 deep stages get FINER partitioning than the rest of the plan
    # (cfg.deep_partition_factor docstring: the deep mapper's per-task cost
    # is long and skew-varied, so at shuffle_partitions tasks the stage
    # drains with a slot-idling straggler tail — measured 20% of stage wall
    # at 1M/local[8]) — but never more tasks than the residue can fill
    # (round 6, scale-adaptive per guide §2.2): the measured residue count
    # caps the width at ~deep_pairs_per_task pairs per task, so a 48-pair
    # bench residue runs as ONE task instead of 256 near-empty Python
    # tasks (~200 ms Arrow/worker setup each, event-log measured), while
    # the 1M-corpus 5.8M-pair residue still hits the factor*partitions
    # cap and keeps the r5 straggler-packing behavior. Bounded
    # forced-joined calls (eager_meta=False: rep pairs, escalation) keep
    # the plain width — no residue count exists there.
    if eager_meta:
        cap = cfg.shuffle_partitions * max(1, cfg.deep_partition_factor)
        p_deep = max(1, min(cap, -(-n_deep // cfg.deep_pairs_per_task)))
    else:
        p_deep = cfg.shuffle_partitions
    use_joined = (formulation == "joined"
                  or (formulation == "auto"
                      and choose_joined(n_deep, n_participants, cfg)))
    if use_joined:
        # JOINED formulation (module docstring): the pair list is small
        # enough that AQE broadcasts it — uniq content streams past the
        # build side without shuffling, and the only content movement is
        # the explicit repartition that spreads the CPU-heavy residue
        # across cores (keyed by `a` so the worker memo hits)
        c_a = uniq.select(F.col("file_id").alias("a"),
                          F.col("content").alias("content_a"))
        c_b = uniq.select(F.col("file_id").alias("b"),
                          F.col("content").alias("content_b"))
        deep = (need.join(c_a, on="a").join(c_b, on="b")
                .repartition(p_deep, "a")
                .mapInPandas(_deep_mapper_joined(cfg), schema=deep_schema))
    else:
        # CO-SHUFFLED formulation (module docstring): bucket by
        # pmod(xxhash64(a), D). The bucket DOMAIN is 8x the partition
        # count: repartition hashes bucket values into partitions, and
        # with only P distinct values ~1/e of the partitions would stay
        # empty (occupancy of P balls in P bins) — 8P values give every
        # partition ~8 buckets and an even load, while the per-bucket
        # content table the mapper holds stays 8x smaller.
        P = p_deep
        D = 8 * P

        def pid_of(c):
            return F.pmod(F.xxhash64(c), F.lit(D)).cast("int")

        pair_rows = need.select(
            pid_of(F.col("a")).alias("pid"), F.lit(1).alias("tag"),
            "a", "b", "est", F.lit(None).cast("string").alias("content"))
        participants = (need.select(pid_of(F.col("a")).alias("pid"),
                                    F.col("a").alias("fid"))
                        .union(need.select(pid_of(F.col("a")).alias("pid"),
                                           F.col("b").alias("fid")))
                        .distinct())
        content_rows = (participants
                        .join(uniq.select(F.col("file_id").alias("fid"),
                                          "content"), on="fid")
                        .select("pid", F.lit(0).alias("tag"),
                                F.col("fid").alias("a"),
                                F.lit(0).cast("long").alias("b"),
                                F.lit(0.0).alias("est"), "content"))
        deep = (content_rows.unionByName(pair_rows)
                .repartition(P, "pid")
                .sortWithinPartitions("pid", "tag")
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
