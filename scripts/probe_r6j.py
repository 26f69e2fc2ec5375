"""Round-6 scaling probe, part 4 — Phase J: the 1 -> 4 core criterion
pairing at 1.6M pages with block-grouped CC contraction ON
(SPARK_GRAFT_BLOCK_CONTRACT=1 -> ERPipeline(block_contract=True)).

Pairs with Phases H/I (same corpus, same protocol, contraction OFF):
if J's efficiency also clears 0.8, the contraction default can flip to
the measured configuration with same-config criterion evidence; if the
box runs out of wall mid-probe, the default stays off and H/I remain
the shipped build's evidence.

  Phase J4  1.6M pages, local[4] x3, 48 GB, contraction ON
  Phase J1  1.6M pages, local[1] x2, 48 GB, contraction ON

Quiet-box protocol applies.

  nohup python scripts/probe_r6j.py > /tmp/probe_r6j.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from probe_r6 import phase  # noqa: E402


def main() -> None:
    os.environ["SPARK_GRAFT_BLOCK_CONTRACT"] = "1"
    j4 = phase("J4_1.6M_local4_48g_contract", cpus=4, n_pages=1_600_000,
               runs=3, driver_mem="48g")
    j1 = phase("J1_1.6M_local1_48g_contract", cpus=1, n_pages=1_600_000,
               runs=2, driver_mem="48g")
    if j4 and j1:
        med4 = statistics.median(r["wall_sec"] for r in j4)
        med1 = statistics.median(r["wall_sec"] for r in j1)
        print(json.dumps({
            "phase_summary": "J_efficiency_1.6M_1_to_4_cores_contract_on",
            "eff_median": round(med1 / (4 * med4), 3),
            "eff_min": round(
                min(r["wall_sec"] for r in j1)
                / (4 * min(r["wall_sec"] for r in j4)), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
