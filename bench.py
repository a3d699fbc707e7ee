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


def _scaling(sf_dir: str) -> None:
    """local[8] vs local[32] on identical input — the sandbox stand-in for
    N vs 4N executors (BASELINE.md). Fresh subprocess per level so JVM/GC
    state can't leak between runs."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ,
                   SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True)
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])

    def thr(r):  # flagship throughput: corpus5k dedup files/sec
        return r["dedup_corpus5k_files_per_sec"]

    eff = (thr(results[32]) / thr(results[8])) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    import multiprocessing
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling evidence

Protocol (BASELINE.md): same job, same input, two parallelism levels on one
machine as the sandbox proxy for N vs 4N executor cluster sizes.

Machine: {multiprocessing.cpu_count()} cores. Input: synthetic code corpus
`nise_dedup.corpus.generate('small', 42)` (5k files, planted duplicate
classes) + `{sf_dir}` tables.

| parallelism | flagship dedup wall (s) | files/sec | headline total (s) |
|---|---|---|---|
| local[8]  (N)  | {results[8]['queries']['dedup_corpus5k']} | {thr(results[8])} | {results[8]['value']} |
| local[32] (4N) | {results[32]['queries']['dedup_corpus5k']} | {thr(results[32])} | {results[32]['value']} |

**Scaling efficiency (thr32/thr8)/4 = {eff:.3f}** (contract: >= 0.8 means
linear; sub-linear values on one box reflect shared memory bandwidth /
JVM-internal contention rather than the shuffle behavior that governs a real
multi-executor cluster — see notes).

Full JSON:

```json
{json.dumps(results[8], indent=1)}
```

```json
{json.dumps(results[32], indent=1)}
```
""")
    print(json.dumps({"scaling_efficiency": round(eff, 3),
                      "thr8": thr(results[8]), "thr32": thr(results[32])}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling(SF_DIR)
    else:
        print(json.dumps(run_bench(SF_DIR, CPUS)))
