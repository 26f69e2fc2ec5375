"""Box-contention microbenchmark (no Spark): per-process throughput of
JVM-shaped work at 1/2/4/8/16 concurrent processes.

Purpose (BASELINE.md r6): separate what the SANDBOX BOX gives up when
8 cores run concurrently (shared DRAM bandwidth, turbo bins, hypervisor
steal) from what the ENGINE's dataflow gives up (shuffle barriers,
serial driver work). A real N -> 4N executor scale-out multiplies
memory bandwidth by 4x along with cores; a single box does not — so the
box's own concurrency curve is the ceiling any Spark job can measure
here, and the pipeline's efficiency should be read against that
ceiling, not against 1.0.

Two kernels per process, interleaved, mimicking shuffle-heavy JVM work:
  copy:  memcpy of a 256 MB buffer (DRAM-bandwidth-bound — shuffle
         write/read, parquet encode, Arrow IPC are mostly this)
  hash:  xxhash-like integer mixing over the same buffer
         (compute-bound — codegen expression eval, sorting keys)

Each worker runs the pair in a loop for ~WALL seconds and reports
iterations/sec; the parent reports the per-process mean at each level
and the per-core efficiency vs the 1-process baseline.

  python scripts/corebench.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

BUF_MB = 256
WALL = 12.0


def worker(q, barrier) -> None:
    n = BUF_MB * 1024 * 1024 // 8
    a = np.arange(n, dtype=np.uint64)
    b = np.empty_like(a)
    mult = np.uint64(0xFF51AFD7ED558CCD)
    shift = np.uint64(33)
    # UNTIMED warmup iteration: the first pass demand-faults the buffers
    # (and their `>>` temporaries) into existence, which on this sandbox
    # can cost SECONDS per buffer when the hypervisor backs guest pages
    # lazily (measured 2026-08-18: 7.7 s vs 0.07 s for the same 256 MB
    # first-touch). Timing from a cold buffer measures page-backing, not
    # steady-state bandwidth — warm up, sync all workers, then time.
    np.copyto(b, a)
    b ^= b >> shift
    b *= mult
    b ^= b >> shift
    barrier.wait()
    t_end = time.time() + WALL
    iters = 0
    while time.time() < t_end:
        np.copyto(b, a)                      # copy kernel (bandwidth)
        b ^= b >> shift                      # hash kernel (compute+bw)
        b *= mult
        b ^= b >> shift
        iters += 1
    q.put(iters / WALL)


def run_level(k: int) -> float:
    q = mp.Queue()
    barrier = mp.Barrier(k)
    ps = [mp.Process(target=worker, args=(q, barrier)) for _ in range(k)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / len(rates)


def main() -> None:
    base = None
    out = {}
    for k in (1, 2, 4, 8, 16):
        r = run_level(k)
        if base is None:
            base = r
        out[k] = {
            "iters_per_sec_per_proc": round(r, 3),
            "per_core_efficiency_vs_1": round(r / base, 3),
        }
        print(json.dumps({"procs": k, **out[k]}), flush=True)
    e2, e8 = out[2]["iters_per_sec_per_proc"], out[8]["iters_per_sec_per_proc"]
    print(json.dumps({
        "summary": "box_concurrency_ceiling",
        "eff_2_to_8_procs": round(e8 / e2, 3),
        "note": "upper bound on any measured 2->8 Spark scaling here",
    }), flush=True)


if __name__ == "__main__":
    main()
