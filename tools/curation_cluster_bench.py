"""SINGLE-JOB multi-executor scaling evidence for the CURATION chain.

Same protocol as tools/cluster_scaling_bench.py (which grounds the
north-rule scaling claim for the EL pipeline): ONE job on Spark's
``local-cluster[W, 1, memMB]`` master — W separate executor JVMs with
pinned per-executor resources (1 core + 12 GiB + single-threaded BLAS +
ActiveProcessorCount=1), real serialized inter-executor shuffle. This
is the honest N -> 4N executor analog; the single-JVM local[8] vs
local[32] comparison saturates this host's shared memory bus (round-4
WARC finding, reconfirmed for the chain in BENCH/BASELINE.md) and
under-reads the partitioning's true scalability.

The measured job is ``python -m entity_linking_spark.curation --stats``
over the forged corpus of tools/curation_bench.py (same plants, same
derivable attrition; --stats because the stage-boundary persist is the
documented fast mode at ≥1M docs).

Usage: python tools/curation_cluster_bench.py [n_docs] [n_workers] [reps] [base_workers]
(reps alternate base/scaled runs; min per config — the host throttles
in bursts.)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MEM_MB = 12288


def run_at(workers: int, docs_path: str, bench_path: str, base: str) -> dict:
    out_path = f"{base}/lc_out_w{workers}"
    shutil.rmtree(out_path, ignore_errors=True)
    import pyspark

    env = dict(os.environ)
    env.update(
        {
            "SPARK_HOME": os.path.dirname(pyspark.__file__),
            "SPARK_GRAFT_MASTER": f"local-cluster[{workers},1,{MEM_MB}]",
            "SPARK_DRIVER_MEMORY": "8g",
            "SPARK_GC_OPTS": "-XX:ActiveProcessorCount=2",
            "SPARK_GRAFT_CONF": json.dumps(
                {
                    "spark.executor.memory": f"{MEM_MB}m",
                    "spark.executor.extraJavaOptions": "-XX:ActiveProcessorCount=1",
                    "spark.executorEnv.OMP_NUM_THREADS": "1",
                    "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
                    "spark.executorEnv.MKL_NUM_THREADS": "1",
                    "spark.executorEnv.PYTHONPATH": REPO,
                }
            ),
            "OMP_NUM_THREADS": "1",
            "OPENBLAS_NUM_THREADS": "1",
            "MKL_NUM_THREADS": "1",
        }
    )
    cmd = [
        sys.executable, "-m", "entity_linking_spark.curation",
        "--input", docs_path,
        "--output", out_path,
        "--url-col", "url",
        "--benchmark", bench_path,
        "--min-words", "20",
        "--stats",
        # --cores only sizes shuffle partitions (the master override
        # decides real parallelism); identical across configs so both
        # runs execute the same physical plan
        "--cores", "4",
    ]
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=5400, env=env
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"curation job produced no JSON at W={workers}")
    summary = json.loads(lines[-1])
    assert summary.get("metric") == "curate_job", summary
    return summary


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000000
    n_workers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    base_workers = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    assert (
        n_workers % base_workers == 0 and n_workers > base_workers
    ), "n_workers must be a strict multiple of base_workers"
    factor = n_workers // base_workers
    base = f"/tmp/el_curation_scaling_{n_docs}"

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from curation_bench import forge_corpus

    from entity_linking_spark.session import get_spark

    if not os.path.exists(f"{base}/docs"):
        spark = get_spark("curation-forge", cores=16)
        forge_corpus(spark, n_docs, base)
        spark.stop()
    docs_path, bench_path = f"{base}/docs", f"{base}/bench"

    runs_1, runs_w = [], []
    for rep in range(reps):
        r1 = run_at(base_workers, docs_path, bench_path, base)
        rw = run_at(n_workers, docs_path, bench_path, base)
        runs_1.append(r1)
        runs_w.append(rw)
        print(
            json.dumps(
                {
                    "rep": rep,
                    f"W{base_workers}": r1["seconds"],
                    f"W{n_workers}": rw["seconds"],
                    "n_out_equal": r1["n_out"] == rw["n_out"],
                }
            ),
            flush=True,
        )
    r1 = min(runs_1, key=lambda r: r["seconds"])
    rw = min(runs_w, key=lambda r: r["seconds"])
    eff = (r1["seconds"] / rw["seconds"]) / factor
    print(
        json.dumps(
            {
                "model": "single-job local-cluster (separate executor JVMs)",
                "job": "curation.curate_corpus --stats",
                "n_docs": n_docs,
                "workers_N": base_workers,
                "workers_scaled": n_workers,
                "scale_factor": factor,
                "seconds_N": r1["seconds"],
                "seconds_scaled": rw["seconds"],
                "n_out": r1["n_out"],
                "scaling_efficiency": round(eff, 3),
                "meets_0.8": eff >= 0.8,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
