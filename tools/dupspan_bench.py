"""Repeated-substring dedup at scale: detection + removal, timed.

Round-4 measured detection alone (16,946 docs/s at 200k docs); round 5
completed the operator with span REMOVAL (the Lee et al. 2022 curation
action) and upgraded the window key to a combined two-multiplier poly
hash (the single mod-1e9+7 hash saturates at 10^12 windows). This tool
prices the WHOLE pass — window hashing (now two O(chars) passes),
posting aggregate, islands merge, slice-complement removal — and
reports the dropped-hot-window count the stop-key cap surfaced (the
no-silent-caps rule).

Corpus: synthesized ENTIRELY JVM-side (no Python in datagen): ~60
deterministic pseudo-random base tokens per doc from a 5k vocabulary;
half the docs embed one of n_docs/200 shared 30-token runs (each run
lands in ~100 docs — inside the posting cap, so the planted spans are
DETECTED AND REMOVED); a viral block planted in every 100th doc
exceeds the cap and exercises the observable drop path.

Usage: python tools/dupspan_bench.py [N_DOCS] [CORES]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from entity_linking_spark.operators import dedup
    from entity_linking_spark.session import get_spark

    spark = get_spark("dupspan-bench", cores=cores)

    n_runs = max(8, n_docs // 200)  # ~100 docs per run: under the cap
    viral = " ".join(f"viraltok{i}" for i in range(30))

    base = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(5000))
            ),
        ),
    )
    r_idx = F.pmod(F.col("id"), F.lit(n_runs))
    run_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda i: F.concat(F.lit("run"), r_idx, F.lit("tok"), i),
        ),
    )
    text = F.when(
        F.col("id") % 100 == 0, F.concat_ws(" ", base, F.lit(viral))
    ).when(
        F.col("id") % 2 == 0, F.concat_ws(" ", base, run_text)
    ).otherwise(base)

    docs = (
        spark.range(n_docs)
        .repartition(cores * 2)
        .select(F.col("id").cast("string").alias("url"), text.alias("text"))
        .persist()
    )
    docs.count()  # materialize datagen outside the timed window

    t0 = time.time()
    cleaned, dropped = dedup.dedup_repeated_substrings(
        docs, window=20, max_postings=256
    )
    stats = cleaned.agg(
        F.count("*").alias("n"),
        F.sum("n_removed_tokens").alias("removed"),
        F.sum(F.when(F.col("n_removed_tokens") > 0, 1).otherwise(0)).alias(
            "docs_touched"
        ),
    ).collect()[0]
    n_dropped = dropped.count()
    elapsed = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "dupspan_detect_plus_remove",
                "n_docs": n_docs,
                "cores": cores,
                "seconds": round(elapsed, 2),
                "docs_per_sec": round(n_docs / elapsed, 1),
                "docs_cleaned_rows": stats["n"],
                "docs_touched": stats["docs_touched"],
                "tokens_removed": int(stats["removed"]),
                "dropped_hot_windows": n_dropped,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
