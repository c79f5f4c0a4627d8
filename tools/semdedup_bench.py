"""SemDeDup semantic dedup at scale: join-path assignment + derivable
removals.

JVM-forged corpus (no Python in datagen or the operator): every id gets
a deterministic 64-dim vector from xxhash64(gid, j); ids with
id % 100 < GROUP of each century share the century head's base vector
plus a tiny per-member jitter — a planted near-dup group. Outcomes are
derivable and asserted before any number is printed:

  - output rows == N (cluster cap sized so no cluster drops);
  - every (planted-group x assigned-cluster) subgroup of size s loses
    exactly s-1 members (pairwise dominance keeps exactly the farthest-
    from-centroid member; jitter makes centroid sims distinct, so no
    ties), and random 64-dim vectors never cross the 0.9 cosine
    threshold (~7-sigma for uniform-cube vectors) — so removed ==
    sum(s-1) over subgroups EXACTLY, computed from the operator's own
    assignment. A handful of groups straddle a knife-edge argmax (the
    per-member jitter can flip assignment near a centroid tie), so the
    subgroup sum sits slightly under n_centuries*(GROUP-1); the bench
    additionally asserts it stays >= 95% of that ideal.

k is sized to the corpus (N / 256-target cluster size, min 128) so the
bench always exercises the beyond-literal-envelope join assignment
path. Pass CORES twice (e.g. 8 then 32) for a two-parallelism scaling
point.

Usage: python tools/semdedup_bench.py [N_DOCS] [CORES] [GROUP]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# single-threaded BLAS per task (the cluster_scaling_bench convention):
# 32 concurrent assignment tasks each spawning a full OpenBLAS thread
# pool measured 45 s for a matmul pass that runs in ~7 s single-threaded
# per task. Must be set before the JVM (and its python workers) launch.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

DIM = 64


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    group = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import functions as F

    from entity_linking_spark.operators.dedup import semantic_dedup
    from entity_linking_spark.session import get_spark

    spark = get_spark("semdedup-bench", cores=cores)

    # group id: first `group` ids of each century collapse onto the
    # century head; everyone else is their own group of one
    gid = F.when(
        F.pmod(F.col("id"), 100) < group, (F.col("id") / 100).cast("long") * 100
    ).otherwise(F.col("id"))
    base = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (F.pmod(F.xxhash64(gid, j), 2000) - 1000).cast("double") / 1000.0,
    )
    jitter = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (F.pmod(F.xxhash64(F.col("id"), j, F.lit(7)), 2000) - 1000)
        .cast("double") / 100000.0,
    )
    emb = spark.range(n_docs).select(
        F.col("id").alias("vec_id"),
        F.zip_with(base, jitter, lambda b, e: b + e).alias("embedding"),
    )
    emb = emb.persist()
    emb.count()  # datagen off the clock

    # k tracks corpus size toward ~256-doc clusters but is capped: the
    # paper itself runs a FIXED cluster budget (50k for LAION-440M), and
    # uncapped k makes the O(N*k) assignment term quadratic in N
    k = max(128, min(n_docs // 256, 16384))
    n_centuries = n_docs // 100 + (1 if n_docs % 100 >= group else 0)
    ideal_removed = n_centuries * (group - 1) if n_docs >= group else 0

    t0 = time.time()
    out = semantic_dedup(
        emb, k=k, min_cosine=0.9, max_cluster_size=max(4096, 64 * n_docs // k)
    ).persist()
    agg = out.agg(
        F.count("*").alias("rows"),
        F.sum((~F.col("keep")).cast("long")).alias("removed"),
    ).collect()[0]
    dt = time.time() - t0

    # exact expectation from the operator's own assignment: each
    # (planted group x cluster) subgroup of size s loses exactly s-1
    out_gid = F.when(
        F.pmod(F.col("vec_id"), 100) < group,
        (F.col("vec_id") / 100).cast("long") * 100,
    ).otherwise(F.col("vec_id"))
    expected_removed = (
        out.where(F.pmod(F.col("vec_id"), 100) < group)
        .groupBy(out_gid.alias("gid"), "cluster_id")
        .count()
        .agg(F.sum(F.col("count") - 1))
        .collect()[0][0]
    ) or 0
    out.unpersist()

    assert agg["rows"] == n_docs, (agg["rows"], n_docs)
    assert agg["removed"] == expected_removed, (agg["removed"], expected_removed)
    assert expected_removed >= 0.95 * ideal_removed, (
        expected_removed, ideal_removed)

    print(json.dumps({
        "metric": "semdedup_docs_per_sec",
        "value": round(n_docs / dt, 1),
        "unit": "docs/sec",
        "n_docs": n_docs,
        "k": k,
        "dim": DIM,
        "removed": agg["removed"],
        "seconds": round(dt, 2),
        "cores": cores,
    }))


if __name__ == "__main__":
    main()
