"""Round-6 scaling probe, part 2 — the per-core-heap-constant pairings
(BASELINE.md r6 Phase D mechanism section; protocol rationale in r5
Phase B). Same build as probe_r6.py (e45a9c0 pipeline path, unchanged).

  Phase F  2.4M pages, local[8] x3, 48 GB   (4N side of the 2.4M
           criterion pairing, re-run on the SHIPPED build so the
           pairing with Phase E is same-build, not r5-vs-r6)
  Phase G  1.6M pages, local[2] x2, 12 GB   (N side of the 1.6M
           pairing under the same per-core-heap protocol — fills the
           1.6M point of the protocol-consistent efficiency curve)

Per-core heap is 6 GB at BOTH parallelism levels in both pairings
(local[2]/12g vs local[8]/48g), which is how a real N -> 4N executor
scale-out behaves: total memory x4, per-executor memory constant.

Quiet-box protocol applies: nothing else may run Spark while this runs.

  nohup python scripts/probe_r6b.py > /tmp/probe_r6b.log 2>&1 &
"""

from __future__ import annotations

import statistics
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_r6 import phase  # noqa: E402


def main() -> None:
    f = phase("F_2.4M_local8_48g", cpus=8, n_pages=2_400_000, runs=3,
              driver_mem="48g")
    if f:
        med8 = statistics.median(r["wall_sec"] for r in f)
        # Phase E walls are read from /tmp/probe_r6.log by the analyst;
        # printed here only if the log is present and parseable.
        try:
            with open("/tmp/probe_r6.log") as fh:
                e_walls = [
                    json.loads(ln)["wall_sec"]
                    for ln in fh
                    if '"phase": "E_2.4M_local2_12g"' in ln and '"wall_sec"' in ln
                ]
        except Exception:
            e_walls = []
        if e_walls:
            med2 = statistics.median(e_walls)
            print(json.dumps({
                "phase_summary": "EF_efficiency_2.4M_heap_per_core_const",
                "e_walls_local2_12g": e_walls,
                "f_median_local8_48g": med8,
                "eff_median": round(med2 / (4 * med8), 3),
                "eff_min": round(min(e_walls) / (4 * min(r["wall_sec"] for r in f)), 3),
            }), flush=True)
    g = phase("G_1.6M_local2_12g", cpus=2, n_pages=1_600_000, runs=2,
              driver_mem="12g")
    # Phase C local[8]/48g reference walls: [761.9, 715.0, 679.9]
    if g:
        med2 = statistics.median(r["wall_sec"] for r in g)
        print(json.dumps({
            "phase_summary": "CG_efficiency_1.6M_heap_per_core_const",
            "eff_vs_phaseC_median": round(med2 / (4 * 715.0), 3),
            "eff_vs_phaseC_min": round(min(r["wall_sec"] for r in g) / (4 * 679.9), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
