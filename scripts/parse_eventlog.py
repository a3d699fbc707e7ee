"""Parse a Spark event log into a driver-serial diagnosis.

The barrier attribution (nise_dedup.instrument) names WHICH driver action
a second of wall belongs to; this tool answers WHY that second didn't
parallelize, from the executor's point of view:

  * coverage gaps — wall intervals where NO stage was running: driver-side
    work (AQE re-planning, collect decode, Python driver code, job-DAG
    submission). These are serial by construction.
  * single-task stages — a stage whose one task does data-proportional
    work (e.g. a CollectLimit's shuffle-to-one reduce) is a serial tail.
  * straggler stages — wall >> sum(task_time)/slots means the stage's
    critical path is one long task (skew), which no added executor fixes.

Usage:
    python scripts/parse_eventlog.py /tmp/nise_eventlog/<app-id> [--top 25]

Reads the raw JSONL event file Spark writes with
spark.eventLog.enabled=true (pass the file, not the directory).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> list[dict]:
    evs = []
    with open(path) as f:
        for line in f:
            try:
                evs.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return evs


def analyze(path: str, top: int = 25, min_gap_s: float = 0.3) -> dict:
    evs = load(path)
    stages: dict[int, dict] = {}
    tasks: dict[int, list[float]] = {}
    cores = 0
    for e in evs:
        k = e.get("Event")
        if k == "SparkListenerExecutorAdded":
            cores += e["Executor Info"].get("Total Cores", 0)
        elif k == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            if sub is None or comp is None:
                continue
            stages[sid] = {
                "id": sid,
                "name": si.get("Stage Name", "?").split("\n")[0][:70],
                "n_tasks": si.get("Number of Tasks", 0),
                "t0": sub / 1000.0, "t1": comp / 1000.0,
                "wall": (comp - sub) / 1000.0,
            }
        elif k == "SparkListenerTaskEnd":
            sid = e.get("Stage ID")
            ti = e.get("Task Info", {})
            dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000
            tasks.setdefault(sid, []).append(dur)

    if not stages:
        raise SystemExit("no completed stages found in log")
    t_start = min(s["t0"] for s in stages.values())
    t_end = max(s["t1"] for s in stages.values())
    span = t_end - t_start

    # union coverage of stage intervals -> gaps are driver-only wall
    ivs = sorted((s["t0"], s["t1"]) for s in stages.values())
    gaps, covered, cur0, cur1 = [], 0.0, ivs[0][0], ivs[0][1]
    for a, b in ivs[1:]:
        if a > cur1:
            if a - cur1 >= min_gap_s:
                gaps.append({"t": round(cur1 - t_start, 1),
                             "gap_s": round(a - cur1, 2),
                             "after_stage": max(
                                 (s for s in stages.values()
                                  if abs(s["t1"] - cur1) < 1e-6),
                                 key=lambda s: s["id"])["id"]})
            covered += cur1 - cur0
            cur0, cur1 = a, b
        else:
            cur1 = max(cur1, b)
    covered += cur1 - cur0

    rows = []
    for sid, s in stages.items():
        ts = tasks.get(sid, [])
        tot = sum(ts)
        mx = max(ts) if ts else 0.0
        # serial-tail estimate: how much of the stage's wall exceeds the
        # perfectly-balanced time sum/slots (straggler overhang)
        slots = max(cores, 1)
        overhang = s["wall"] - (tot / slots) if ts else 0.0
        rows.append({**s, "task_sum": round(tot, 1),
                     "task_max": round(mx, 1),
                     "overhang": round(overhang, 1)})
    rows.sort(key=lambda r: r["wall"], reverse=True)

    return {
        "span_s": round(span, 1),
        "covered_s": round(covered, 1),
        "driver_gap_s": round(span - covered, 1),
        "n_stages": len(stages),
        "cores": cores,
        "gaps_over_min": sorted(gaps, key=lambda g: -g["gap_s"])[:top],
        "gap_total_s": round(sum(g["gap_s"] for g in gaps), 1),
        "top_stages": rows[:top],
        "single_task_wall_s": round(
            sum(r["wall"] for r in rows if r["n_tasks"] == 1), 1),
        "overhang_total_s": round(
            sum(max(0.0, r["overhang"]) for r in rows), 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    out = analyze(args.log, args.top)
    tops = out.pop("top_stages")
    gaps = out.pop("gaps_over_min")
    print(json.dumps(out, indent=1))
    print("\n-- largest driver gaps (no stage running) --")
    for g in gaps:
        print(f"  +{g['t']:7.1f}s  gap {g['gap_s']:6.2f}s  "
              f"after stage {g['after_stage']}")
    print("\n-- top stages by wall --")
    for r in tops:
        print(f"  s{r['id']:4d} wall {r['wall']:7.1f}s tasks "
              f"{r['n_tasks']:4d} sum {r['task_sum']:8.1f}s "
              f"max {r['task_max']:6.1f}s over {r['overhang']:6.1f}s "
              f" {r['name']}")


if __name__ == "__main__":
    main()
