"""NB quality classifier + Pareto keep (operators/classify.py, D15) at
corpus scale.

Prices the GPT-3-style quality pass on a JVM-synthesized corpus (no
Python in datagen; the operator itself is pure Column exprs + broadcast
joins). Reuses the lm_bench corpus design — the classifier needs real
CLASS structure to learn, or the score split has nothing to find:

  - POSITIVE-class docs (labels for training: every doc with
    doc_id % 9 != 0) are 20 Zipf-popular 6-token phrases; their token
    mass concentrates on popular-phrase types.
  - NEGATIVE-class docs (every 9th) are 120 i.i.d. uniform tokens over
    the 30k-type head of the same space — same vocabulary, different
    token DISTRIBUTION (uniform vs Zipf), which is exactly what a
    multinomial NB separates.
  - The 120k-type space exceeds the 50k vocab cap, so rare types
    genuinely exercise the <unk> fold at scale and the model artifact
    is FULL-SIZE (50k vocab likelihood rows broadcast at score time).

Training simulates GPT-3's setup (curated positives vs crawl
negatives) by training on a 10% deterministic hash-slice of the corpus
and scoring ALL of it — the score side is the 100 TB-shaped pass.

Reports train seconds, score seconds, scoring docs/s, Pareto keep
rates per class, and derivable outcomes asserted before timing counts:
scored rows == corpus rows, positive-class mean log-odds above
negative-class (the signal the operator exists for), and the Pareto
keep rate biased the right way (positives kept at a higher rate).

Usage: python tools/classifier_bench.py [N_DOCS] [CORES]
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
N_SLOTS = 20
JUNK_TYPES = 5_000 * PHRASE_LEN


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from entity_linking_spark.operators.classify import (
        nb_log_odds,
        pareto_keep,
        train_nb_quality,
    )
    from entity_linking_spark.session import get_spark

    spark = get_spark("classifier-bench", cores=cores)
    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id")

    h = lambda i, salt: F.xxhash64(F.col("doc_id"), i, F.lit(salt))  # noqa: E731
    phrase_id = lambda s: F.pmod(  # noqa: E731
        h(s, 1), F.lit(1) + F.pmod(h(s, 2), F.lit(N_PHRASES))
    )
    natural = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_SLOTS - 1)),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(PHRASE_LEN - 1)),
                lambda j: F.concat(F.lit("w"), phrase_id(s) * PHRASE_LEN + j),
            ),
        )
    )
    junk = F.transform(
        F.sequence(F.lit(0), F.lit(N_SLOTS * PHRASE_LEN - 1)),
        lambda i: F.concat(F.lit("w"), F.pmod(h(i, 3), F.lit(JUNK_TYPES))),
    )
    corpus = docs.select(
        "doc_id",
        (F.col("doc_id") % 9 != 0).alias("label"),
        F.array_join(
            F.when(F.col("doc_id") % 9 != 0, natural).otherwise(junk), " "
        ).alias("text"),
    )
    path = "/tmp/el_classifier_bench/docs"
    corpus.write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)

    # GPT-3 trains on a small labeled set, scores the whole crawl: a
    # 10% deterministic hash slice is the training set here
    train_slice = corpus.where(F.pmod(F.xxhash64("doc_id", F.lit(99)), F.lit(10)) == 0)

    t0 = time.time()
    model = train_nb_quality(train_slice, vocab_size=50_000)
    for t in (model.vocab, model.likelihoods, model.totals):
        t.persist().count()
    train_sec = time.time() - t0

    t0 = time.time()
    scored = nb_log_odds(corpus, model)
    stats = (
        scored.join(corpus.select("doc_id", "label"), "doc_id")
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.avg("mean_llr").alias("mean_llr"))
        .collect()
    )
    score_sec = time.time() - t0
    by = {r["label"]: r for r in stats}
    n_scored = sum(r["n"] for r in stats)
    assert n_scored == n_docs, (n_scored, n_docs)
    assert by[True]["mean_llr"] > by[False]["mean_llr"], stats

    t0 = time.time()
    kept = (
        pareto_keep(corpus, model, alpha=9.0, seed=1)
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    keep_sec = time.time() - t0
    kept_by = {r["label"]: r["n"] for r in kept}
    pos_rate = kept_by.get(True, 0) / max(1, n_docs * 8 // 9)
    neg_rate = kept_by.get(False, 0) / max(1, n_docs // 9 + 1)
    assert pos_rate > neg_rate, (pos_rate, neg_rate)

    print(
        json.dumps(
            {
                "bench": "nb_quality_classifier",
                "n_docs": n_docs,
                "cores": cores,
                "train_sec": round(train_sec, 2),
                "score_sec": round(score_sec, 2),
                "score_docs_per_sec": round(n_docs / score_sec, 1),
                "keep_sec": round(keep_sec, 2),
                "mean_llr_pos": round(by[True]["mean_llr"], 4),
                "mean_llr_neg": round(by[False]["mean_llr"], 4),
                "pareto_keep_rate_pos": round(pos_rate, 4),
                "pareto_keep_rate_neg": round(neg_rate, 4),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
