"""A/B: deep-verify joined vs co-shuffled formulation IN THE CO-SHUFFLE'S
OWN REGIME (VERDICT r4 next #3).

Round 4 A/B-measured the two formulations only below the broadcast
threshold, where joined wins by design (AQE broadcasts the residue pair
list, so uniq content never enters an exchange); the co-shuffle was held
in reserve for the unbroadcastable regime on parity tests alone. This
script measures that regime directly: `spark.sql.autoBroadcastJoinThreshold
= -1` makes every residue unbroadcastable (the exact plan shape a
residue > threshold produces at scale), and `deep_coshuffle_pairs`
overrides force each formulation in turn on the same corpus.

Usage: python scripts/ab_coshuffle.py [corpus_parquet] [cpus] [reps]
Writes one JSON line per run; interleaves A/B; prints medians at the end.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def one(corpus: str, cpus: int, formulation: str) -> dict:
    force = {"joined": {"deep_coshuffle_pairs": 2_000_000_000},
             "coshuffle": {"deep_coshuffle_pairs": 0,
                           "deep_coshuffle_fanout": 0.0}}[formulation]
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        NISE_BARRIERS="1",
        NISE_CFG_OVERRIDES=json.dumps(force),
        # the regime under test: nothing broadcastable, as at an
        # over-threshold residue on a real cluster
        NISE_SPARK_CONF=json.dumps(
            {"spark.sql.autoBroadcastJoinThreshold": "-1"}),
    )
    s0 = read_steal()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--dedup-only", corpus],
        env=env, capture_output=True, text=True, check=True)
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["formulation"] = formulation
    r["steal_sub"] = read_steal() - s0
    return r


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/nise_bench/corpus_xl.parquet"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    runs: list[dict] = []
    for _ in range(reps):
        for f in ("joined", "coshuffle"):        # interleaved ABAB
            r = one(corpus, cpus, f)
            runs.append(r)
            print(json.dumps(r), flush=True)
    med = {f: statistics.median(r["wall_s"] for r in runs
                                if r["formulation"] == f)
           for f in ("joined", "coshuffle")}
    print(json.dumps({"medians_wall_s": med, "cpus": cpus,
                      "corpus": corpus,
                      "rows": runs[0]["rows_out"]}), flush=True)


if __name__ == "__main__":
    main()
