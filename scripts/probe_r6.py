"""Round-6 scaling probe driver (VERDICT r5 #1/#2) — runs the three
measurement phases BASELINE.md r5 promised, sequentially, on the shipped
build, and prints one JSON line per run + per-phase summaries.

  Phase C  1.6M pages, local[8] x3, uniform 48g   (frontier-floor check)
  Phase D  1.6M pages, local[2] x3, uniform 48g   (>=0.8 efficiency on
           the shipped build, paired with Phase C)
  Phase E  2.4M pages, local[2] x2, 12 GB heap    (heap-per-core-constant
           pairing: 6 GB/task at BOTH parallelism levels when paired with
           r5 Phase B's local[8]/48g runs — settles whether the 2.4M
           turnover is the uniform-TOTAL-heap sandbox artifact BASELINE.md
           hypothesizes, or a real super-linear term)

Quiet-box protocol applies: nothing else may run Spark while this runs.

  nohup python scripts/probe_r6.py > /tmp/probe_r6.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import run_once  # noqa: E402


def host_gate() -> dict:
    """Pre-run host-health probe (BASELINE.md r6 Phase K protocol).

    The dirty criterion is the ABSOLUTE first-touch rate, not the
    first/re-touch ratio: a sparse per-page re-touch is nearly free, so
    even a healthy host shows a ratio of ~10-15x (fault+zero vs cached
    write) — but healthy first-touch measures 3.4-3.8 GB/s on this box
    while the degraded windows measured 0.01-0.7 GB/s. The gate
    ANNOTATES rather than aborts (the record stays honest and the
    operator decides), but a criterion pairing should only be read when
    every run's gate shows first-touch >= ~1 GB/s.
    """
    import time

    import numpy as np

    n = 256 * 1024 * 1024
    t0 = time.perf_counter()
    buf = np.zeros(n, dtype=np.uint8)
    buf[::4096] = 1
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    buf[::4096] = 2
    retouch = time.perf_counter() - t0
    return {
        "host_first_touch_gb_per_sec": round(0.25 / max(first, 1e-9), 2),
        "host_backing_slowdown": round(first / max(retouch, 1e-9), 1),
    }


def phase(name: str, cpus: int, n_pages: int, runs: int,
          driver_mem: str | None = None, timeout: int = 7200) -> list[dict]:
    if driver_mem is None:
        os.environ.pop("SPARK_GRAFT_DRIVER_MEM", None)
    else:
        os.environ["SPARK_GRAFT_DRIVER_MEM"] = driver_mem
    out = []
    for i in range(runs):
        gate = host_gate()
        if gate["host_first_touch_gb_per_sec"] < 1.0:
            print(json.dumps({"phase": name, "run": i,
                              "host_gate": "DIRTY", **gate}), flush=True)
        try:
            rec = run_once(cpus, n_pages, timeout)
        except Exception as e:  # keep the probe driver alive (r5 lesson)
            print(json.dumps({"phase": name, "run": i, "cpus": cpus,
                              "error": str(e)[:500]}), flush=True)
            continue
        rec.update({"phase": name, "run": i, "cpus": cpus,
                    "driver_mem": driver_mem or "default(48g)", **gate})
        print(json.dumps(rec), flush=True)
        out.append(rec)
    if out:
        walls = sorted(r["wall_sec"] for r in out)
        print(json.dumps({
            "phase_summary": name, "cpus": cpus, "n_pages": n_pages,
            "walls": walls, "median": statistics.median(walls),
            "min": walls[0],
        }), flush=True)
    return out


def main() -> None:
    c = phase("C_1.6M_local8_48g", cpus=8, n_pages=1_600_000, runs=3)
    d = phase("D_1.6M_local2_48g", cpus=2, n_pages=1_600_000, runs=3)
    if c and d:
        med8 = statistics.median(r["wall_sec"] for r in c)
        med2 = statistics.median(r["wall_sec"] for r in d)
        min8 = min(r["wall_sec"] for r in c)
        min2 = min(r["wall_sec"] for r in d)
        print(json.dumps({
            "phase_summary": "D_efficiency_1.6M_shipped_build",
            "eff_median": round(med2 / (4 * med8), 3),
            "eff_min": round(min2 / (4 * min8), 3),
        }), flush=True)
    e = phase("E_2.4M_local2_12g", cpus=2, n_pages=2_400_000, runs=2,
              driver_mem="12g")
    # r5 Phase B local[8]/48g reference walls: [1135.2, 1123.2, 1285.6]
    if e:
        med2 = statistics.median(r["wall_sec"] for r in e)
        print(json.dumps({
            "phase_summary": "E_efficiency_2.4M_heap_per_core_const",
            "eff_vs_r5_local8_median": round(med2 / (4 * 1135.2), 3),
            "eff_vs_r5_local8_min": round(min(r["wall_sec"] for r in e)
                                          / (4 * 1123.2), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
