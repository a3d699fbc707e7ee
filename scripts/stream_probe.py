#!/usr/bin/env python
"""Standalone DRAM-bandwidth scaling probe (round 5, ADDENDUM 8).

The pair ceilings in bench.py use a 384x384 GEMM as the "memory-traffic"
workload, but a 384x384 float64 matrix is ~1.2 MB — it lives in L2, so
the GEMM ratio mostly measures granted CPU, not granted DRAM bandwidth.
Spark's actual hot loops (shuffle write/read, Arrow serialization,
parquet decode, sha256 over content) stream working sets far larger than
the LLC. This probe measures the machine's *aggregate DRAM-streaming*
scaling: K spawned single-threaded workers each run a STREAM-triad-style
kernel (a = b + s*c) over three 64 MB float64 arrays (192 MB working set
per worker, >> any cache) for a fixed 2 s window; the aggregate
bytes-moved ratio n_lo -> n_hi is the bandwidth the box actually adds
with 4x the workers. Methodology mirrors bench._raw_cpu_ceiling: spawn
(not fork), BLAS pinned to one thread per worker.

Run it inside a granted window (GEMM pre-probe in [3.0, 4.1]) so the
reading is about the MACHINE's memory system, not about hypervisor
steal; the GEMM ratio is measured back-to-back here for exactly that
comparability. Results go to BENCH/ADDENDUM.md, not into the window
gate — the gate's semantics (and the /tmp pair caches) are unchanged.
"""
import json
import multiprocessing as mp
import os
import sys
import time

N = 8 * 1024 * 1024          # 8M float64 = 64 MB per array, 3 arrays


def _pin_blas():
    for k in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
              "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ[k] = "1"


def _triad(_):
    import numpy as np
    rng = np.random.default_rng(0)
    b = rng.standard_normal(N)
    c = rng.standard_normal(N)
    a = np.empty_like(b)
    # warm the pages before the timed window
    np.add(b, c, out=a)
    t0 = time.time()
    passes = 0
    while time.time() - t0 < 2.0:
        np.add(b, 1.5 * c, out=a)    # 2 reads + 1 write + 1 temp
        passes += 1
    return passes


def _gemm(_):
    import numpy as np
    rng = np.random.default_rng(0)
    a = rng.standard_normal((384, 384))
    t0 = time.time()
    i = 0
    while time.time() - t0 < 2.0:
        a @ a
        i += 1
    return i


def ratio(n_lo: int, n_hi: int, fn) -> dict:
    ctx = mp.get_context("spawn")
    rates = {}
    for procs in (n_lo, n_hi):
        with ctx.Pool(procs, initializer=_pin_blas) as p:
            rates[procs] = sum(p.map(fn, range(procs)))
    return {"lo": rates[n_lo], "hi": rates[n_hi],
            "ratio": round(rates[n_hi] / rates[n_lo], 3)}


def main():
    pairs = [(2, 8), (8, 32)]
    if len(sys.argv) > 1:
        pairs = [tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]]
    out = {}
    for n_lo, n_hi in pairs:
        g = ratio(n_lo, n_hi, _gemm)
        s = ratio(n_lo, n_hi, _triad)
        # one triad pass moves ~4 arrays' worth of DRAM traffic
        # (read b, read c, write temp, write a) = 4 * 64 MB
        gbs = {k: round(s[k] * 4 * N * 8 / 2.0 / 1e9, 1)
               for k in ("lo", "hi")}
        out[f"{n_lo}v{n_hi}"] = {
            "gemm_ratio": g["ratio"], "stream_ratio": s["ratio"],
            "stream_gbs_lo": gbs["lo"], "stream_gbs_hi": gbs["hi"],
            "window_comparable": 3.0 <= g["ratio"] <= 4.1}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
