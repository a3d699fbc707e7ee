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
    return build_session(master=f"local[{cpus}]", cfg=cfg), cfg


def run_bench(sf_dir: str, cpus: int) -> dict:
    spark, cfg = _build(cpus)
    from pyspark.sql import functions as F

    from nise_dedup import corpus as C
    from nise_dedup.config import DedupConfig
    from nise_dedup.pipeline import run_pipeline
    from nise_dedup.queries import REGISTRY, docs_as_corpus

    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm JVM

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, thunk):
        spark.catalog.clearCache()
        t0 = time.time()
        counts[name] = thunk()
        timings[name] = round(time.time() - t0, 3)

    # flagship: end-to-end near-dup dedup of the documents corpus
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    timed("dedup_documents", lambda: run_pipeline(
        spark, docs_as_corpus(spark, sf_dir), cfg,
        collect_metrics=False).clusters.count())

    # synthetic code corpus with real duplicate structure (5k files)
    code_rows = C.generate("small", seed=42)
    code_df = spark.createDataFrame(C.to_pandas(code_rows)).persist()
    code_df.count()
    timed("dedup_corpus5k", lambda: run_pipeline(
        spark, code_df, DedupConfig(shuffle_partitions=cfg.shuffle_partitions),
        collect_metrics=False).clusters.count())

    # operator headline set (from the driver-contract registry)
    for qname in ["s234_signatures", "a1_pricing_summary", "l4_region_revenue",
                  "x1_explode_tokens", "cc_chain_clusters", "knn_bruteforce",
                  "token_quality", "v1_ngram3_jaccard", "embedding_neardup"]:
        fn = REGISTRY[qname][0]
        timed(qname, lambda fn=fn: fn(spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "cpus": cpus,
        "n_documents": n_docs,
        "dedup_documents_files_per_sec":
            round(n_docs / timings["dedup_documents"], 2),
        "dedup_corpus5k_files_per_sec":
            round(len(code_rows) / timings["dedup_corpus5k"], 2),
        "row_counts": counts,
    }
    spark.stop()
    return result


def run_dedup_only(corpus_path: str, cpus: int) -> dict:
    """Time ONLY the end-to-end dedup pipeline over a corpus parquet —
    the scaling-evidence job (compute-dominated at 50k files)."""
    spark, cfg = _build(cpus)
    from nise_dedup.ingest import read_corpus
    from nise_dedup.pipeline import run_pipeline

    corpus = read_corpus(spark, corpus_path).persist()
    n = corpus.count()          # warm: JVM + input cached out of the timing
    t0 = time.time()
    res = run_pipeline(spark, corpus, cfg, collect_metrics=False)
    n_out = res.clusters.count()
    wall = time.time() - t0
    spark.stop()
    return {"files": n, "rows_out": n_out, "wall_s": round(wall, 2),
            "files_per_sec": round(n / wall, 1), "cpus": cpus}


def _scaling(sf_dir: str) -> None:
    """local[8] vs local[32] on identical input — the sandbox stand-in for
    N vs 4N executors (BASELINE.md). Fresh subprocess per level so JVM/GC
    state can't leak between runs. The job is the flagship dedup over a
    50k-file synthetic code corpus (5k files can't feed 32 cores — fixed
    job-scheduling overhead would dominate and understate scaling)."""
    import nise_dedup.corpus as C

    corpus_path = "/tmp/nise_bench/corpus_medium.parquet"
    if not os.path.exists(corpus_path):
        os.makedirs(os.path.dirname(corpus_path), exist_ok=True)
        # small row groups so the parquet scan is splittable across tasks
        C.to_pandas(C.generate("medium", 42)).to_parquet(
            corpus_path, row_group_size=2000)

    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--dedup-only", corpus_path],
            env=env, capture_output=True, text=True, check=True)
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])

    thr8 = results[8]["files_per_sec"]
    thr32 = results[32]["files_per_sec"]
    eff = (thr32 / thr8) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    import multiprocessing
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling evidence

Protocol (BASELINE.md): same job, same input, two local parallelism levels
on one machine as the sandbox proxy for N vs 4N executor cluster sizes.

Job: end-to-end near-dup dedup (`nise_dedup.pipeline.run_pipeline`) over the
deterministic 50k-file synthetic code corpus
(`nise_dedup.corpus.generate('medium', 42)`, ~79 MB, planted duplicate
classes). Machine: {multiprocessing.cpu_count()} cores. Fresh JVM per level;
input parquet read + cache excluded from timing.

| parallelism | dedup wall (s) | throughput (files/sec) |
|---|---|---|
| local[8]  (N)  | {results[8]['wall_s']} | {thr8} |
| local[32] (4N) | {results[32]['wall_s']} | {thr32} |

**Scaling efficiency (thr32/thr8)/4 = {eff:.3f}** (contract target >= 0.8).

Caveat: both levels share one JVM heap, one memory bus and one shuffle
ramdisk, so this proxy UNDERSTATES multi-executor scaling — a real 4N
cluster adds memory bandwidth and shuffle service capacity with the cores.

Full JSON:

```json
{json.dumps(results, indent=1)}
```
""")
    print(json.dumps({"scaling_efficiency": round(eff, 3),
                      "thr8": thr8, "thr32": thr32}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling(SF_DIR)
    elif "--dedup-only" in sys.argv:
        path = sys.argv[sys.argv.index("--dedup-only") + 1]
        print(json.dumps(run_dedup_only(path, CPUS)))
    else:
        print(json.dumps(run_bench(SF_DIR, CPUS)))
