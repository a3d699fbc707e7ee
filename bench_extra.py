"""Round-6 optimization measurement harness (guide §1) — bench.py is FROZEN
for the driver's measurement, so every extra probe lives here.

Modes:
  --plans OUTDIR [--suffix before|after]
      Write .explain("formatted") for every headline query to
      OUTDIR/<query>_<suffix>.txt (plan shape evidence for OPTIMIZATION_r06).
  --barriers
      One instrumented dedup_documents run (NISE_BARRIERS-style driver
      barrier attribution) at $SPARK_GRAFT_SF_DIR; prints the ordered log.
  --query NAME [--reps N]
      Time one headline query with the bench methodology (count(), fresh
      clearCache between reps) and print per-rep seconds.
  --noop NAME [--reps N]
      Same but through the noop sink (computes every column; guide §1.4).

All modes honor $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS exactly like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = ["s234_signatures", "a1_pricing_summary", "l4_region_revenue",
            "x1_explode_tokens", "cc_chain_clusters", "knn_bruteforce",
            "token_quality", "v1_ngram3_jaccard", "embedding_neardup"]


def _build():
    from nise_dedup.config import DedupConfig
    from nise_dedup.session import build_session
    cfg = DedupConfig(shuffle_partitions=max(2 * CPUS, 16))
    ov = os.environ.get("NISE_CFG_OVERRIDES")
    if ov:
        import dataclasses
        cfg = dataclasses.replace(cfg, **json.loads(ov))
    return build_session(master=f"local[{CPUS}]", cfg=cfg), cfg


def write_plans(outdir: str, suffix: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    spark, cfg = _build()
    from nise_dedup.queries import REGISTRY, docs_as_corpus
    from nise_dedup.pipeline import run_pipeline

    for qname in HEADLINE:
        fn = REGISTRY[qname][0]
        df = fn(spark, SF_DIR)
        with open(f"{outdir}/{qname}_{suffix}.txt", "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"wrote {qname}", flush=True)
        spark.catalog.clearCache()
    # flagship: capture the published clusters plan (pipeline already ran
    # its eager stage actions; the plan shows the lazy tail)
    res = run_pipeline(spark, docs_as_corpus(spark, SF_DIR), cfg,
                       collect_metrics=False)
    with open(f"{outdir}/dedup_documents_{suffix}.txt", "w") as f:
        f.write(res.clusters._sc._jvm.PythonSQLUtils.explainString(
            res.clusters._jdf.queryExecution(), "formatted"))
    res.release()
    print("wrote dedup_documents", flush=True)
    spark.stop()


def run_barriers() -> None:
    spark, cfg = _build()
    from nise_dedup import instrument
    from nise_dedup.pipeline import run_pipeline
    from nise_dedup.queries import docs_as_corpus

    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()   # warm JVM
    out = []
    for rep in range(int(os.environ.get("NISE_REPS", "2"))):
        spark.catalog.clearCache()
        instrument.enable()
        t0 = time.time()
        res = run_pipeline(spark, docs_as_corpus(spark, SF_DIR), cfg,
                           collect_metrics=False)
        with instrument.barrier("final_clusters_count"):
            n = res.clusters.count()
        wall = time.time() - t0
        res.release()
        out.append({"rep": rep, "wall_s": round(wall, 3), "rows": n,
                    "barriers": instrument.disable()})
    print(json.dumps(out, indent=1))
    spark.stop()


def time_query(name: str, reps: int, noop: bool) -> None:
    spark, cfg = _build()
    from nise_dedup.queries import REGISTRY, docs_as_corpus
    from nise_dedup.pipeline import run_pipeline

    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()   # warm JVM
    times = []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        if name == "dedup_documents":
            res = run_pipeline(spark, docs_as_corpus(spark, SF_DIR), cfg,
                               collect_metrics=False)
            n = res.clusters.count()
            res.release()
        else:
            df = REGISTRY[name][0](spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"query": name, "rows": n, "times": times,
                      "sf_dir": SF_DIR, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--plans" in args:
        outdir = args[args.index("--plans") + 1]
        suffix = (args[args.index("--suffix") + 1]
                  if "--suffix" in args else "before")
        write_plans(outdir, suffix)
    elif "--barriers" in args:
        run_barriers()
    elif "--query" in args or "--noop" in args:
        key = "--query" if "--query" in args else "--noop"
        name = args[args.index(key) + 1]
        reps = (int(args[args.index("--reps") + 1])
                if "--reps" in args else 3)
        time_query(name, reps, noop=(key == "--noop"))
    else:
        print(__doc__)
