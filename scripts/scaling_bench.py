"""Scaling-efficiency evidence (north_rule: throughput scaling efficiency
>= 0.8 from N to 4N executors; sandbox evidence = same job at local[8] vs
local[32] — driver instruction).

Runs the full staged ER pipeline in fresh subprocesses (own JVM each),
medians of --runs, and writes the measured table into BASELINE.md.

  python scripts/scaling_bench.py --n-pages 40000 --runs 3
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, n_pages: int, timeout: int = 7200) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    # shuffle width sized to the cluster, as any real deployment does
    # (4x cores keeps every core busy through skewed waves)
    env["SPARK_GRAFT_SHUFFLE"] = str(4 * cpus)
    with tempfile.TemporaryDirectory(prefix=f"scal_{cpus}_") as wh:
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "main.py"),
             "--stage", "all", "--n-pages", str(n_pages), "--warehouse", wh],
            capture_output=True, text=True, env=env, cwd=ROOT, timeout=timeout,
        )
        wall_proc = time.time() - t0
    last = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not last:
        raise RuntimeError(f"no JSON from run (cpus={cpus}):\n{out.stderr[-2000:]}")
    rec = json.loads(last[-1])
    rec["proc_wall_sec"] = round(wall_proc, 2)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=40000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--timeout", type=int, default=7200,
                help="per-run subprocess kill timeout, sec (r5: a 2.4M local[2] run\n                takes ~3600 s; the old hardcoded 3600 killed the probe driver)")
    ap.add_argument("--write-baseline", action="store_true")
    args = ap.parse_args()

    results: dict[int, list[dict]] = {}
    for cpus in args.cpus:
        results[cpus] = []
        for i in range(args.runs):
            rec = run_once(cpus, args.n_pages, args.timeout)
            results[cpus].append(rec)
            print(f"local[{cpus}] run {i}: wall={rec['wall_sec']}s "
                  f"docs/s={rec['docs_per_sec']} "
                  f"stages={json.dumps(rec.get('stage_sec', {}))}", flush=True)

    med = {
        cpus: statistics.median(r["wall_sec"] for r in runs)
        for cpus, runs in results.items()
    }
    # per-stage medians across runs (mention-stage wall is the VERDICT r3
    # vectorization evidence point)
    stage_med = {
        cpus: {
            s: round(statistics.median(r["stage_sec"][s] for r in runs), 2)
            for s in runs[0].get("stage_sec", {})
        }
        for cpus, runs in results.items()
    }
    print("stage medians:", json.dumps(stage_med), flush=True)
    lo, hi = args.cpus
    tput = {c: args.n_pages / med[c] for c in args.cpus}
    efficiency = (tput[hi] / tput[lo]) / (hi / lo)
    summary = {
        "n_pages": args.n_pages,
        "runs": args.runs,
        f"median_wall_local{lo}": round(med[lo], 2),
        f"median_wall_local{hi}": round(med[hi], 2),
        f"docs_per_sec_local{lo}": round(tput[lo], 1),
        f"docs_per_sec_local{hi}": round(tput[hi], 1),
        "cores_ratio": hi / lo,
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(summary))

    if args.write_baseline:
        block = (
            "\n## Measured (sandbox, {} pages, median of {} runs)\n\n"
            "| config | wall sec | docs/sec |\n|---|---|---|\n"
            "| local[{}] | {} | {} |\n| local[{}] | {} | {} |\n\n"
            "**Throughput scaling efficiency {}→{} cores: {}** "
            "(target >= 0.8)\n".format(
                args.n_pages, args.runs,
                lo, summary[f"median_wall_local{lo}"],
                summary[f"docs_per_sec_local{lo}"],
                hi, summary[f"median_wall_local{hi}"],
                summary[f"docs_per_sec_local{hi}"],
                lo, hi, summary["scaling_efficiency"],
            )
        )
        with open(os.path.join(ROOT, "BASELINE.md"), "a") as f:
            f.write(block)
        print("appended to BASELINE.md")


if __name__ == "__main__":
    main()
