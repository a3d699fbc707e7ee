#!/bin/bash
# Round-5 gated scaling campaign (VERDICT r4 next #2): repeatedly invoke
# bench.py --scaling with NISE_GATE=1 so the 200k and 1M local[2]v[8]
# pairs EXTEND their /tmp caches with runs launched only inside
# hypervisor-granted windows (pre-run GEMM probe in [3.0, 4.0]).
# Alternates between the two pairs every $NISE_EXTEND_WALL_S seconds so
# neither starves; stops when both clean-run quotas are met or
# $CAMPAIGN_DEADLINE_S elapses. All attempts stay on the books; the
# BASELINE.md render happens on every loop so partial progress is always
# published.
set -u
cd "$(dirname "$0")/.."
t0=$(date +%s)
DEADLINE=${CAMPAIGN_DEADLINE_S:-14400}
export NISE_GATE=1
export NISE_EXTEND_PAIRS="bench:2,xl:2,bench:8"
export NISE_SCALING_PAIRS="8,2"
export NISE_SCALING_REPS=${NISE_SCALING_REPS:-3}
export NISE_SCALING_EXTRA="xl:2:3"
export NISE_EXTEND_WALL_S=${NISE_EXTEND_WALL_S:-1200}
export NISE_CEIL_RETRIES=1
export NISE_STAGE_RUNS=${NISE_STAGE_RUNS:-0}

check_done() {
  python - <<'EOF'
import json
def met(path, reps):
    try:
        d = json.load(open(path))
    except Exception:
        return False
    return all(sum(1 for r in d["runs"][str(c)] if r.get("window_ok")) >= reps
               for c in (d["n_lo"], d["n_hi"]))
ok = met("/tmp/nise_bench/scaling_bench_2.json", 3) and \
     met("/tmp/nise_bench/scaling_bench_8.json", 3) and \
     met("/tmp/nise_bench/scaling_xl_2.json", 3)
print(1 if ok else 0)
EOF
}

while true; do
  python bench.py --scaling >>/tmp/nise_bench/campaign_r5.log 2>&1
  echo "[campaign] pass done at $(( $(date +%s) - t0 ))s" \
    >>/tmp/nise_bench/campaign_r5.log
  if [ "$(check_done)" = "1" ]; then
    echo "[campaign] quotas met" >>/tmp/nise_bench/campaign_r5.log
    break
  fi
  if [ $(( $(date +%s) - t0 )) -ge "$DEADLINE" ]; then
    echo "[campaign] deadline" >>/tmp/nise_bench/campaign_r5.log
    break
  fi
done
# final pass to fill any missing stage_runs + re-render with stage tables
# (NISE_FINAL_STAGE_RUNS=0 skips the instrumented ckpt couple — at the 1M
# corpus that couple costs ~40 min of tail wall-clock)
NISE_STAGE_RUNS=${NISE_FINAL_STAGE_RUNS:-1} NISE_EXTEND_WALL_S=1 \
  python bench.py --scaling >>/tmp/nise_bench/campaign_r5.log 2>&1
echo "[campaign] finished" >>/tmp/nise_bench/campaign_r5.log
