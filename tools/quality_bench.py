"""Round-5 web-pipeline operators at scale: repetition signals + URL dedup.

Prices the two late-round-5 operators on JVM-synthesized corpora (no
Python anywhere in datagen or in the operators themselves):

- repetition_signals: ~120 tokens/doc from a 5k vocabulary, with every
  4th doc carrying a planted periodic block (heavy top-n-gram + dup-
  5-gram coverage) so both signal families do real work, not
  zero-coverage short-circuits.
- url_dedup: one messy URL per doc in the gate row's forge shape
  (mixed case, default ports, www, trailing slash, tracking params,
  fragments) with ~10 raw variants per canonical key, so the dedup
  actually collapses rows.

Usage: python tools/quality_bench.py [N_DOCS] [CORES]
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

    from entity_linking_spark.functions.web import url_dedup
    from entity_linking_spark.operators.quality import repetition_signals
    from entity_linking_spark.session import get_spark

    spark = get_spark("quality-bench", cores=cores)

    docs = spark.range(n_docs).withColumnRenamed("id", "doc_id")

    # ---- corpus: 120 pseudo-random tokens; every 4th doc gets a
    # 40-token periodic block (10x a 4-token phrase) spliced in
    rand_tok = lambda i: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(5000))
    )
    body = F.transform(F.sequence(F.lit(0), F.lit(119)), rand_tok)
    phrase = F.transform(
        F.sequence(F.lit(0), F.lit(3)),
        lambda i: F.concat(F.lit("p"), F.pmod(F.col("doc_id"), F.lit(50)), F.lit("_"), i),
    )
    block = F.flatten(F.array_repeat(phrase, 10))
    text = F.array_join(
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.slice(body, 1, 60), block, F.slice(body, 61, 60)))
        .otherwise(body),
        " ",
    )
    corpus = docs.select("doc_id", text.alias("text"))
    corpus.write.mode("overwrite").parquet("/tmp/el_quality_bench/docs")
    corpus = spark.read.parquet("/tmp/el_quality_bench/docs")

    t0 = time.time()
    sig = repetition_signals(corpus)
    agg = sig.agg(
        F.count("*").alias("n"),
        F.sum((F.col("dup5_covered_tokens") > 0).cast("long")).alias("docs_with_dup"),
        F.sum("dup5_covered_tokens").alias("covered"),
        F.max("top2_count").alias("max_top2"),
    ).collect()[0]
    rep_sec = time.time() - t0

    # ---- URLs: gate-row forge over the same ids
    s = lambda c: c.cast("string")  # noqa: E731
    did = F.col("doc_id")
    url = F.concat(
        F.lit("HTTPS://WWW.Site"), s(did % 7), F.lit(".COM"),
        F.when(did % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        # canonical key is (did%7, did%m, did%2) with m ~ n_docs/140; when
        # 14 | m (the common big-N case) that collapses to did%m alone ->
        # ~140 raw variants per canonical URL (urls_kept reports the
        # measured key count either way)
        F.lit("/Path/"), s(did % (max(n_docs // 140, 1))),
        F.when(did % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?b=2&utm_source=feed&a="), s(did % 2),
        F.when(did % 2 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    urls = docs.select("doc_id", url.alias("url"))
    urls.write.mode("overwrite").parquet("/tmp/el_quality_bench/urls")
    urls = spark.read.parquet("/tmp/el_quality_bench/urls")

    t0 = time.time()
    kept = url_dedup(urls, "url", "doc_id").count()
    url_sec = time.time() - t0

    # ---- decontamination: a 1000-doc "benchmark" slice vs the corpus.
    # Planted overlap: benchmark members flag themselves; every 4th doc
    # shares its periodic block with the benchmark member of the same
    # doc_id % 50 phrase family when that member is also % 4 == 0.
    from entity_linking_spark.operators.quality import decontaminate

    bench = corpus.where(F.col("doc_id") % max(n_docs // 1000, 1) == 0).select("text")
    t0 = time.time()
    flagged = decontaminate(corpus, bench, window=13)
    n_contaminated = flagged.where("is_contaminated").count()
    decon_sec = time.time() - t0

    # ---- multi-line page corpus for the C4 + Gopher-quality passes.
    # 12 lines of 10 tokens; '.'-terminated on (doc_id+i)%2==0 -> exactly
    # 6 C4-kept lines per page; a javascript line on %5 (kept-line rule),
    # a lorem-ipsum line on %17 (page rule -> c4_dropped == ceil(N/17));
    # " the of and" appended on even ids -> gopher keeps exactly N/2.
    from entity_linking_spark.operators.quality import (
        c4_line_clean,
        gopher_quality_signals,
    )

    line_of = lambda i: F.concat(  # noqa: E731
        F.array_join(F.slice(body, i * 10 + 1, 10), " "),
        F.when((did + i) % 2 == 0, F.lit(".")).otherwise(F.lit("")),
    )
    page_lines = F.transform(F.sequence(F.lit(0), F.lit(11)), line_of)
    plant = lambda cond, t: F.when(cond, F.array(F.lit(t))).otherwise(  # noqa: E731
        F.array().cast("array<string>")
    )
    page = F.concat(
        F.array_join(
            F.concat(
                page_lines,
                plant(did % 5 == 0, "Please enable javascript to continue."),
                plant(did % 17 == 0, "Lorem Ipsum dolor sit amet boilerplate."),
            ),
            "\n",
        ),
        F.when(did % 2 == 0, F.lit(" the of and")).otherwise(F.lit("")),
    )
    pages = docs.select("doc_id", page.alias("text"))
    pages.write.mode("overwrite").parquet("/tmp/el_quality_bench/pages")
    pages = spark.read.parquet("/tmp/el_quality_bench/pages")

    t0 = time.time()
    c4 = c4_line_clean(pages).agg(
        F.sum(F.col("is_page_dropped").cast("long")).alias("dropped"),
        F.sum("n_lines_kept").alias("kept_lines"),
    ).collect()[0]
    c4_sec = time.time() - t0

    t0 = time.time()
    gq = gopher_quality_signals(pages, mode="remove").count()
    gq_sec = time.time() - t0

    print(json.dumps({
        "metric": "quality_ops_bench",
        "n_docs": n_docs,
        "cores": cores,
        "repetition_signals_sec": round(rep_sec, 2),
        "repetition_docs_per_sec": round(n_docs / rep_sec, 1),
        "docs_with_dup_coverage": int(agg["docs_with_dup"]),
        "total_covered_tokens": int(agg["covered"]),
        "max_top2_count": int(agg["max_top2"]),
        "url_dedup_sec": round(url_sec, 2),
        "url_docs_per_sec": round(n_docs / url_sec, 1),
        "urls_kept": int(kept),
        "decontaminate_sec": round(decon_sec, 2),
        "decontaminate_docs_per_sec": round(n_docs / decon_sec, 1),
        "n_contaminated": int(n_contaminated),
        "c4_line_clean_sec": round(c4_sec, 2),
        "c4_docs_per_sec": round(n_docs / c4_sec, 1),
        "c4_pages_dropped": int(c4["dropped"]),
        "c4_pages_dropped_expected": -(-n_docs // 17),
        "gopher_quality_sec": round(gq_sec, 2),
        "gopher_quality_docs_per_sec": round(n_docs / gq_sec, 1),
        "gopher_quality_kept": int(gq),
        "gopher_quality_kept_expected": n_docs // 2 + n_docs % 2,
    }))


if __name__ == "__main__":
    main()
