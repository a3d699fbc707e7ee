#!/usr/bin/env python
"""Pure-Spark shuffle-scaling probe (round 5, ADDENDUM 9).

The 1M-corpus barrier table shows v_meta_agg and p_rep_verify walls that
are LINEAR in pair count (3.3 s -> 33 s for 1.25M -> 12.26M pairs at
local[8]) but FLAT across 2 vs 8 cores. Flat-across-cores + linear-in-
rows is the signature of a memory-bandwidth-bound phase on a box whose
DRAM bandwidth does not scale with worker count (Addendum 8's STREAM
probe). This probe isolates that claim from nise_dedup entirely: a
synthetic 12M-row pair table is shuffle-hash-joined against a synthetic
1M-row metadata table and hash-aggregated — the same plan shape as the
verify stage's meta agg, zero Python on the hot path (all codegen
exprs), fresh JVM per level, timed after a warm-up action.

If THIS scales ~4x at 2->8, the flat barriers are nise_dedup's fault;
if it scales ~1-1.5x (tracking the STREAM ratio, not the GEMM ratio),
the residual is the machine's metered memory system.

Usage: python scripts/shuffle_probe.py [n_pairs] [n_meta]
Prints one JSON line per level plus the ratio.
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
cores, n_pairs, n_meta = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
for k in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
          "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ[k] = "1"
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local[{cores}]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .appName("shuffle_probe").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# synthetic pair list (a,b) and metadata table keyed by id — same shape
# as verify's meta join: pairs join meta twice, then one hash agg
pairs = (spark.range(n_pairs, numPartitions=32)
         .select(F.pmod(F.xxhash64("id"), F.lit(n_meta)).alias("a"),
                 F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_meta)).alias("b")))
meta = (spark.range(n_meta, numPartitions=32)
        .select(F.col("id"),
                F.xxhash64("id", F.lit(2)).alias("simhash"),
                F.xxhash64("id", F.lit(3)).alias("lo"),
                F.xxhash64("id", F.lit(4)).alias("hi"),
                F.pmod(F.xxhash64("id", F.lit(5)), F.lit(100000)).alias("n_bytes")))
meta = meta.persist()
meta.count()                     # cache fill outside the timed window
pairs = pairs.localCheckpoint()  # fixed input, plan truncated
ma = meta.select(F.col("id").alias("a"), F.col("simhash").alias("sh_a"),
                 F.col("lo").alias("lo_a"), F.col("hi").alias("hi_a"),
                 F.col("n_bytes").alias("len_a"))
mb = meta.select(F.col("id").alias("b"), F.col("simhash").alias("sh_b"),
                 F.col("lo").alias("lo_b"), F.col("hi").alias("hi_b"),
                 F.col("n_bytes").alias("len_b"))

def job():
    j = (pairs.join(ma.hint("shuffle_hash"), on="a")
         .join(mb.hint("shuffle_hash"), on="b")
         .withColumn("est", (F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
                             + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b"))))
                     .cast("double") / 128.0)
         .withColumn("ham", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))))
    return j.agg(F.count("*").alias("n"),
                 F.sum((F.col("est") > 0.4).cast("long")).alias("d"),
                 F.approx_count_distinct(
                     F.when(F.col("ham") < 20, F.col("a"))).alias("da"),
                 F.approx_count_distinct(
                     F.when(F.col("ham") < 20, F.col("b"))).alias("db")
                 ).first()

job()                            # warm-up: codegen + AQE paths compiled
t0 = time.time(); row = job(); wall = time.time() - t0
print(json.dumps({"cores": int(cores), "wall_s": round(wall, 2),
                  "n": row["n"], "d": row["d"]}))
spark.stop()
"""


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def run_level(cores: int, n_pairs: int, n_meta: int) -> dict:
    s0 = steal()
    r = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(n_pairs),
         str(n_meta)], capture_output=True, text=True)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    rec["steal_jiffies"] = steal() - s0
    return rec


def main():
    import statistics
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    n_meta = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    reps = int(os.environ.get("PROBE_REPS", "3"))
    pairs = [(2, 8), (8, 32)]
    out = {}
    for n_lo, n_hi in pairs:
        runs = {n_lo: [], n_hi: []}
        for _ in range(reps):           # interleaved ABAB
            for c in (n_lo, n_hi):
                rec = run_level(c, n_pairs, n_meta)
                runs[c].append(rec)
                print(json.dumps(rec))
        med = {c: statistics.median(r["wall_s"] for r in runs[c])
               for c in (n_lo, n_hi)}
        eff = (med[n_lo] / med[n_hi]) / 4
        out[f"{n_lo}v{n_hi}"] = {
            "med_lo_s": med[n_lo], "med_hi_s": med[n_hi],
            "speedup": round(med[n_lo] / med[n_hi], 3),
            "efficiency": round(eff, 3),
            "steal": {str(c): [r["steal_jiffies"] for r in runs[c]]
                      for c in (n_lo, n_hi)}}
        print(json.dumps({f"{n_lo}v{n_hi}": out[f"{n_lo}v{n_hi}"]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
