"""LM perplexity (operators/lm.py, D14) at corpus scale.

Prices the CCNet-style pass on a JVM-synthesized corpus (no Python in
datagen; the operator itself is pure Column exprs + broadcast joins).

Corpus design — the LM must have real bigram structure to learn, or
the perplexity split has nothing to find:
  - NATURAL docs are 20 phrases of 6 tokens each (120 tokens). The
    phrase bank is 20k phrases over a 120k-type space (phrase p owns
    tokens w[6p..6p+5] in order), phrase popularity Zipf-ish
    (slot modulus varies per hash draw, so low phrase ids collect
    mass). Within-phrase bigrams are deterministic -> the trained
    model predicts 100 of a natural doc's 119 bigrams with high
    confidence.
  - JUNK docs (every 9th) are 120 i.i.d. uniform tokens over the
    30k-type HEAD of the same space (phrases 0..4999 — types that are
    certainly inside the 50k-vocab cap, so junk does NOT fold to
    <unk>): same vocabulary, no sequence structure -> pruned bigram
    table misses -> smoothed-backoff probabilities -> high ppl.
  - The 120k-type space exceeds the 50k vocab cap, so rare-phrase
    types genuinely exercise the <unk> fold at scale, and the model
    artifact is FULL-SIZE (50k vocab + 500k bigrams broadcast).

A first draft drew junk from a DISJOINT type tail; every junk token
folded to <unk> and junk docs scored ppl ~1.4 — (unk,unk) becomes the
model's most confident bigram. That inversion is a real property of
any vocab-pruned interpolated LM (and exactly why CCNet keeps the
low-perplexity HEAD band rather than "lower is better", i.e. why
perplexity_filter has min_ppl); it is pinned as a pytest
(tests/test_lm.py::test_all_oov_doc_scores_artificially_well) rather
than left as a bench assumption.

Reports train seconds, score seconds, docs/s for scoring, and two
derivable outcomes asserted: the scored row count equals the corpus,
and the junk decile's mean ppl exceeds the natural decile's (the
signal the operator exists for — a bench rep that lost the signal
would be a broken model, not a timing data point).

Usage: python tools/lm_bench.py [N_DOCS] [CORES]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PHRASES = 20_000
PHRASE_LEN = 6
N_SLOTS = 20                      # 20 phrases/doc -> 120 tokens
JUNK_TYPES = 5_000 * PHRASE_LEN   # head of the type space, surely in-vocab


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from entity_linking_spark.operators.lm import perplexity, train_bigram_lm
    from entity_linking_spark.session import get_spark

    spark = get_spark("lm-bench", cores=cores)
    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id")

    h = lambda i, salt: F.xxhash64(F.col("doc_id"), i, F.lit(salt))  # noqa: E731
    # Zipf-ish phrase popularity: id = h % (1 + h2 % N_PHRASES) — the
    # modulus itself varies per draw, so low phrase ids collect mass.
    phrase_id = lambda s: F.pmod(  # noqa: E731
        h(s, 1), F.lit(1) + F.pmod(h(s, 2), F.lit(N_PHRASES))
    )
    natural = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_SLOTS - 1)),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(PHRASE_LEN - 1)),
                lambda j: F.concat(
                    F.lit("w"), phrase_id(s) * PHRASE_LEN + j
                ),
            ),
        )
    )
    junk = F.transform(
        F.sequence(F.lit(0), F.lit(N_SLOTS * PHRASE_LEN - 1)),
        lambda i: F.concat(F.lit("w"), F.pmod(h(i, 3), F.lit(JUNK_TYPES))),
    )
    corpus = docs.select(
        "doc_id",
        (F.col("doc_id") % 9 == 0).alias("is_junk"),
        F.array_join(
            F.when(F.col("doc_id") % 9 == 0, junk).otherwise(natural), " "
        ).alias("text"),
    )
    path = "/tmp/el_lm_bench/docs"
    corpus.write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)

    t0 = time.time()
    lm = train_bigram_lm(corpus, vocab_size=50_000, bigram_size=500_000)
    # materialize the bounded model tables once so the score phase
    # prices SCORING, not re-training (a real pipeline persists the
    # model artifact exactly like this)
    for t in (lm.vocab, lm.unigrams, lm.bigrams, lm.totals):
        t.persist().count()
    train_sec = time.time() - t0

    t0 = time.time()
    ppl = perplexity(corpus, lm)
    stats = (
        ppl.join(corpus.select("doc_id", "is_junk"), "doc_id")
        .groupBy("is_junk")
        .agg(F.count("*").alias("n"), F.avg("ppl").alias("mean_ppl"))
        .collect()
    )
    score_sec = time.time() - t0
    by = {r["is_junk"]: r for r in stats}
    n_scored = sum(r["n"] for r in stats)
    assert n_scored == n_docs, (n_scored, n_docs)
    assert by[True]["mean_ppl"] > by[False]["mean_ppl"], stats

    print(
        json.dumps(
            {
                "bench": "lm_perplexity",
                "n_docs": n_docs,
                "cores": cores,
                "train_sec": round(train_sec, 2),
                "score_sec": round(score_sec, 2),
                "score_docs_per_sec": round(n_docs / score_sec, 1),
                "mean_ppl_natural": round(by[False]["mean_ppl"], 2),
                "mean_ppl_junk": round(by[True]["mean_ppl"], 2),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
