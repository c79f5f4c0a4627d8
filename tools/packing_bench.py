"""Sequence packing at scale: the concatenate-and-split assembly step.

JVM-forged corpus (no Python in datagen or the operator): each doc
carries a deterministic 20-60 token body, packed into 2048-token
training sequences. Outcomes are derivable and asserted before any
number is printed: total tokens = sum of the forged per-doc counts, the
complete-sequence count is exactly total // 2048, and every complete
sequence's slices sum to exactly 2048 tokens.

Usage: python tools/packing_bench.py [N_DOCS] [CORES] [SEQ_LEN]
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    seq_len = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

    from pyspark.sql import functions as F

    from entity_linking_spark.operators.packing import pack_sequences
    from entity_linking_spark.session import get_spark

    spark = get_spark("packing-bench", cores=cores)

    # 20 + (doc_id % 41) tokens per doc — exact expected total:
    # sum over residue classes of (20 + r) for r in 0..40
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (F.lit(20) + F.pmod(F.col("id"), 41)).cast("int")),
                lambda i: F.concat(
                    F.lit("t"), F.pmod(F.xxhash64(F.col("id"), i), F.lit(30000))
                ),
            ),
            " ",
        ).alias("text"),
    )
    full, rem = divmod(n_docs, 41)
    expected_total = full * sum(20 + r for r in range(41)) + sum(
        20 + (r % 41) for r in range(rem)
    )
    expected_seqs = expected_total // seq_len

    t0 = time.time()
    packed = pack_sequences(docs, seq_len)
    bad = (
        packed.groupBy("seq_id")
        .agg(F.sum("slice_len").alias("n"))
        .where(F.col("n") != seq_len)
        .count()
    )
    n_slices = packed.count()
    n_seqs = packed.select("seq_id").distinct().count()
    sec = time.time() - t0

    assert bad == 0, f"{bad} sequences not exactly {seq_len} tokens"
    assert n_seqs == expected_seqs, (n_seqs, expected_seqs)

    print(
        json.dumps(
            {
                "metric": "sequence_packing_bench",
                "n_docs": n_docs,
                "cores": cores,
                "seq_len": seq_len,
                "seconds": round(sec, 2),
                "docs_per_sec": round(n_docs / sec, 1),
                "total_tokens": expected_total,
                "n_sequences": n_seqs,
                "n_slice_rows": n_slices,
            }
        )
    )


if __name__ == "__main__":
    main()
