"""r6 block-contract probe: ERPipeline(block_contract=True) vs default,
fresh JVM per run, same synthetic corpus, one parallelism level.

Measures the thing the option claims: the CC loop's input edge count
(contracted vs raw) and the cluster-stage wall. Interleaved run order
(off, on, off, on) to balance host drift; JSON line per run.

Usage: python scripts/probe_r6_contract.py [--n-pages 400000]
       [--cpus 8] [--runs-per-config 2] [--driver-mem 48g]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from entity_knowledge_in_bert_spark.session import get_spark
from entity_knowledge_in_bert_spark import datagen
from entity_knowledge_in_bert_spark.sources.tableio import TableIO
from entity_knowledge_in_bert_spark.plans.pipeline import ERPipeline
from pyspark.sql import functions as F

n_pages = int(sys.argv[1]); cpus = int(sys.argv[2])
contract = sys.argv[3] == "on"
spark = get_spark("contract_probe", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")
wh = tempfile.mkdtemp(prefix=f"contract_{'on' if contract else 'off'}_")
io = TableIO(spark, wh)
pipe = ERPipeline(spark, io, block_contract=contract)
t0 = time.time()
clusters = pipe.run(datagen.gen_pages_df(spark, n_pages))
rows = clusters.count()
wall = time.time() - t0
edges = io.read("stage_score")
n_edges = io.snapshot_entry("stage_score")["rows"]
# the CC loop's actual input size under this config
from entity_knowledge_in_bert_spark.operators.cluster import (
    _contract_partitions, _frontier_partitions)
canon = (edges.select(F.greatest("src", "dst").alias("u"),
                      F.least("src", "dst").alias("v"),
                      *( [F.col("block_key").alias("_grp")] if contract else []))
         .filter(F.col("u") != F.col("v")))
parts = _frontier_partitions(edges, n_edges)
if contract:
    frontier = _contract_partitions(
        canon.repartition(parts, "_grp").drop("_grp"))
else:
    frontier = canon.repartition(parts, "u", "v").dropDuplicates()
n_frontier = frontier.count()
print(json.dumps({
    "contract": contract, "n_pages": n_pages, "cpus": cpus,
    "wall_sec": round(wall, 2), "rows_out": rows,
    "stage_sec": {k: round(v, 2) for k, v in pipe.timings.items()},
    "n_match_edges": n_edges, "n_cc_input_edges": n_frontier,
}))
shutil.rmtree(wh, ignore_errors=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=400_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--runs-per-config", type=int, default=2)
    ap.add_argument("--driver-mem", default="48g")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    script = tempfile.NamedTemporaryFile(
        "w", suffix=".py", delete=False)
    script.write(CHILD)
    script.close()
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = args.driver_mem
    env["SPARK_GRAFT_SHUFFLE"] = str(4 * args.cpus)
    order = ["off", "on"] * args.runs_per_config
    for i, cfg in enumerate(order):
        p = subprocess.run(
            [sys.executable, script.name, str(args.n_pages),
             str(args.cpus), cfg],
            capture_output=True, text=True, timeout=args.timeout, env=env,
        )
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")][-1] if p.returncode == 0 else None
        if line:
            rec = json.loads(line)
            rec["run"] = i
            print(json.dumps(rec), flush=True)
        else:
            print(json.dumps({"run": i, "cfg": cfg, "rc": p.returncode,
                              "tail": p.stderr[-500:]}), flush=True)


if __name__ == "__main__":
    main()
