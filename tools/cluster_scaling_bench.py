"""SINGLE-JOB multi-executor scaling evidence via local-cluster mode.

The replication model (tools/multi_executor_bench.py — 4 independent
pipeline processes) omits cross-executor shuffle by construction; the
thread model (tools/scaling_bench.py — local[N] vs local[4N]) shares one
heap/GC, a contention a real cluster does not have. The honest middle is
Spark's ``local-cluster[W, coresPerWorker, memMB]`` master: ONE job,
W separate executor JVMs, real serialized inter-executor shuffle over
netty — exactly the N -> 4N executor scale-up the north rule names,
minus only the network hop (executors are co-located on this host, as
co-located cluster executors share a node).

Per-executor resources are held constant across configs (1 core +
12 GiB + single-threaded BLAS per executor JVM; ActiveProcessorCount
pins the JVM's GC/JIT view), so 4N brings 4x cores AND 4x memory, like
adding real executors does.

Usage: python tools/cluster_scaling_bench.py [n_docs] [n_workers] [reps] [base_workers]
(reps alternate base-worker / n-worker runs; min per config — the host
throttles in bursts, see BENCH/BASELINE.md. base_workers defaults to 1;
pass e.g. 2 with n_workers=8 to measure N=2 -> 4N=8 with BOTH configs in
the multi-process regime — the truer N -> 4N executor analog on hosts
whose serial and parallel throughput degrade differently.)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEM_MB = 12288


def run_at(workers: int, docs_path: str, aliases_path: str, base: str) -> dict:
    workdir = f"{base}/lc_run_w{workers}"
    shutil.rmtree(workdir, ignore_errors=True)
    import pyspark

    env = dict(os.environ)
    env.update(
        {
            "SPARK_HOME": os.path.dirname(pyspark.__file__),
            "SPARK_GRAFT_MASTER": f"local-cluster[{workers},1,{MEM_MB}]",
            # the driver JVM only schedules + runs the tiny final collect;
            # give it a fixed small slice so it is identical across configs
            "SPARK_DRIVER_MEMORY": "8g",
            "SPARK_GC_OPTS": "-XX:ActiveProcessorCount=2",
            "SPARK_GRAFT_CONF": json.dumps(
                {
                    "spark.executor.memory": f"{MEM_MB}m",
                    # each executor JVM believes it owns 1 core: GC threads,
                    # JIT compiler threads, netty pools all size to 1
                    "spark.executor.extraJavaOptions": "-XX:ActiveProcessorCount=1",
                    "spark.executorEnv.OMP_NUM_THREADS": "1",
                    "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
                    "spark.executorEnv.MKL_NUM_THREADS": "1",
                    "spark.executorEnv.PYTHONPATH": REPO,
                }
            ),
            # keep numpy single-threaded in the DRIVER python too
            "OMP_NUM_THREADS": "1",
            "OPENBLAS_NUM_THREADS": "1",
            "MKL_NUM_THREADS": "1",
        }
    )
    cmd = [
        sys.executable,
        "-m",
        "entity_linking_spark.pipeline",
        "--workdir",
        workdir,
        "--input-docs",
        docs_path,
        "--input-aliases",
        aliases_path,
        # --cores only sizes shuffle partitions here (the master override
        # decides real parallelism); keep it IDENTICAL across configs so
        # both runs execute the same physical plan
        "--cores",
        "4",
        "--force",
    ]
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=5400, env=env
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"pipeline produced no JSON at W={workers}")
    return json.loads(lines[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000000
    n_workers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    base_workers = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    assert (
        n_workers % base_workers == 0 and n_workers > base_workers
    ), "n_workers must be a strict multiple of base_workers"
    factor = n_workers // base_workers
    base = f"/tmp/el_scaling_{n_docs}"
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from scaling_bench import prep_input

    docs_path, aliases_path = prep_input(n_docs, base)

    runs_1, runs_w = [], []
    for rep in range(reps):
        r1 = run_at(base_workers, docs_path, aliases_path, base)
        rw = run_at(n_workers, docs_path, aliases_path, base)
        runs_1.append(r1)
        runs_w.append(rw)
        print(
            json.dumps(
                {
                    "rep": rep,
                    f"W{base_workers}": r1["seconds"],
                    f"W{n_workers}": rw["seconds"],
                }
            ),
            flush=True,
        )
    r1 = min(runs_1, key=lambda r: r["seconds"])
    rw = min(runs_w, key=lambda r: r["seconds"])
    eff = (rw["docs_per_sec"] / r1["docs_per_sec"]) / factor
    print(
        json.dumps(
            {
                "model": "single-job local-cluster (separate executor JVMs)",
                "n_docs": n_docs,
                "workers_N": base_workers,
                "workers_scaled": n_workers,
                "scale_factor": factor,
                "seconds_N": r1["seconds"],
                "seconds_scaled": rw["seconds"],
                "throughput_N": r1["docs_per_sec"],
                "throughput_scaled": rw["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "meets_0.8": eff >= 0.8,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
