"""Two-parallelism scaling evidence (north-rule N -> 4N criterion).

No real cluster exists in the sandbox, so the cluster-size scaling
criterion is evidenced as the driver prescribes: the identical job at
local[N] and local[4N] on the same parquet input, reporting throughput
at both plus efficiency = (thr_4N / thr_N) / 4. Results land in
BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [n_docs] [N] [--update-md]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def prep_input(n_docs: int, base: str) -> tuple[str, str]:
    sys.path.insert(0, REPO)
    from entity_linking_spark import schema as S
    from entity_linking_spark.session import get_spark

    docs_path, aliases_path = f"{base}/docs", f"{base}/aliases"
    if os.path.exists(docs_path) and os.path.exists(aliases_path):
        return docs_path, aliases_path
    spark = get_spark("scaling-prep", cores=16)
    n_entities = max(100, n_docs // 10)
    S.synth_documents_spark(spark, n_docs, n_entities).write.mode(
        "overwrite"
    ).parquet(docs_path)
    kb = S.synth_kb(n_entities)
    spark.createDataFrame(S.kb_to_aliases(kb), schema=S.ALIASES_SCHEMA).write.mode(
        "overwrite"
    ).parquet(aliases_path)
    spark.stop()
    return docs_path, aliases_path


def run_at(cores: int, docs_path: str, aliases_path: str, base: str) -> dict:
    workdir = f"{base}/run_c{cores}"
    shutil.rmtree(workdir, ignore_errors=True)
    # Model an N-core executor HONESTLY: without these pins the local[N]
    # JVM still spawns 32 GC/JIT/netty threads and numpy's BLAS opens 32
    # threads inside every Python worker — the "1-core" run secretly uses
    # the whole box, inflating the baseline and suppressing measured
    # scaling efficiency below its value on real N-core executors.
    # ActiveProcessorCount pins the JVM's processor view (GC threads,
    # compiler threads, common pools); the BLAS pins keep each Python
    # worker single-threaded (a real executor runs one core per task).
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GC_OPTS": f"-XX:ActiveProcessorCount={cores}",
            # per-core memory constant (4N executors bring 4x memory):
            # an N-core "executor" gets N x 12g, not the whole box's heap
            "SPARK_DRIVER_MEMORY": f"{12 * cores}g",
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
        "--cores",
        str(cores),
        # benchmark integrity: NEVER resume from a leftover checkpoint of
        # an earlier (possibly killed) run — a partially-complete workdir
        # would report a fraction of the pipeline as the full runtime
        "--force",
    ]
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=3600, env=env
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    base = f"/tmp/el_scaling_{n_docs}"
    docs_path, aliases_path = prep_input(n_docs, base)

    # the sandbox host throttles in bursts (measured 7x swings on
    # identical runs) — alternate configs and take min per config so a
    # burst poisons at most one rep of each, not one whole config
    best_n, best_4n = [], []
    for rep in range(reps):
        r_n = run_at(n, docs_path, aliases_path, base)
        r_4n = run_at(4 * n, docs_path, aliases_path, base)
        best_n.append(r_n)
        best_4n.append(r_4n)
        print(
            json.dumps({"rep": rep, "N": r_n["seconds"], "4N": r_4n["seconds"]}),
            flush=True,
        )
    r_n = min(best_n, key=lambda r: r["seconds"])
    r_4n = min(best_4n, key=lambda r: r["seconds"])
    eff = (r_4n["docs_per_sec"] / r_n["docs_per_sec"]) / 4
    result = {
        "n_docs": n_docs,
        "N_cores": n,
        "4N_cores": 4 * n,
        "throughput_N": r_n["docs_per_sec"],
        "throughput_4N": r_4n["docs_per_sec"],
        "seconds_N": r_n["seconds"],
        "seconds_4N": r_4n["seconds"],
        "reps": reps,
        "protocol": "alternating reps, min per config",
        "scaling_efficiency": round(eff, 3),
        "meets_0.8": eff >= 0.8,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
