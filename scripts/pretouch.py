"""One-shot guest-RAM burn-in for the sandbox's lazy host page backing.

Measured 2026-08-18 (after an 11:02 UTC VM reboot): the FIRST touch of
each fresh guest-physical page costs ~10-100x its steady-state cost
(0.01-0.08 GB/s vs 3.8 GB/s re-touch) — the hypervisor backs guest
memory lazily, and the backing path is pathologically slow. Any
memory-growing workload (a fresh JVM heap, Arrow IPC buffers, shuffle
spill) pays that cost exactly once per guest-physical page; the
"bursty host degradation" recorded in BASELINE.md r6 Phase J is this
mechanism, not ongoing contention.

This script forces the backing ONCE by holding and touching most of
guest RAM across K parallel workers (disjoint ranges; backing may
parallelize on the host side even when a single faulting stream does
not). After it exits the pages return to the guest's free list
ALREADY BACKED, and subsequent jobs run at steady-state speed.

  nohup python scripts/pretouch.py > /tmp/pretouch.log 2>&1 &

Safe to re-run: already-backed pages just re-touch at ~GB/s each.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

GB = 1024 ** 3
TARGET_GB = 112          # leave headroom below MemAvailable (~125 GiB)
WORKERS = 8


def worker(idx: int, n_gb: int, q) -> None:
    held = []
    t0 = time.perf_counter()
    for i in range(n_gb):
        t1 = time.perf_counter()
        b = np.empty(GB // 8, dtype=np.uint64)
        b.fill(0)
        held.append(b)
        print(json.dumps({"worker": idx, "gb": i + 1, "of": n_gb,
                          "sec": round(time.perf_counter() - t1, 2)}),
              flush=True)
    # re-touch to report the healthy (backed) rate
    t1 = time.perf_counter()
    for b in held:
        b.fill(1)
    q.put({"worker": idx, "gb": n_gb,
           "first_touch_sec": round(time.perf_counter() - t0, 1),
           "retouch_sec": round(time.perf_counter() - t1, 1)})


def main() -> None:
    per = TARGET_GB // WORKERS
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(i, per, q)) for i in range(WORKERS)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    results = [q.get() for _ in ps]
    for p in ps:
        p.join()
    print(json.dumps({"summary": "pretouch_done",
                      "total_gb": per * WORKERS,
                      "wall_sec": round(time.perf_counter() - t0, 1),
                      "workers": results}), flush=True)


if __name__ == "__main__":
    main()
