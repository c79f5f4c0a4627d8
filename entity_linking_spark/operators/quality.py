"""Intra-document repetition signals for web-corpus quality filtering.

Beyond-reference operator (the reference repo has no corpus-curation
stage): the repetition family of the Gopher quality rules (Rae et al.
2021, "Scaling Language Models", Table A1), the standard first-pass
filter of public LLM training-data pipelines — a document whose text is
dominated by one repeated n-gram, or largely covered by duplicated
n-grams, is boilerplate/spam and gets dropped before dedup ever runs.

Conventions (documented divergence from the paper, which measures
CHARACTER fractions): signals here are TOKEN-based — the most-frequent-
n-gram signal is its occurrence COUNT and the duplicated-n-gram signal
is the number of token positions covered by any within-doc duplicated
n-gram, islands-merged so overlapping occurrences are not double-
counted (the same overlap-aware convention as the public DataTrove
GopherRepetitionFilter, transposed from chars to tokens). Token and
char fractions are monotonically related on whitespace-tokenized text;
callers thresholding fractions use ``*_frac`` columns.

Scale notes: grams are grouped by (id, gram-string) — exact, no hash
false positives, and the key space distributes well (hot keys are
bounded by the longest document, not by corpus size); the duplicated-
coverage join is co-partitioned with the groupBy that feeds it, so the
whole operator is two shuffles per n (partial-aggregated map-side) plus
one per-doc window. At the 100-TB decade the gram string can be swapped
for the combined poly hash of operators/dedup (FP ~5e-7) to shrink
shuffle width; the gate-row form keeps strings so the DuckDB twin is
exact by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _grams(base: DataFrame, n: int) -> DataFrame:
    """(id, n_tokens, pos, gram) for every n-gram of every doc with at
    least n tokens. posexplode of a transform(sequence(...)) keeps the
    whole expansion in whole-stage codegen; the where-guard exists
    because sequence(0, -k) would count DOWN, not produce empty."""
    g = F.transform(
        F.sequence(F.lit(0), F.size("t") - n),
        lambda i: F.array_join(F.slice("t", i + 1, n), " "),
    )
    return base.where(F.size("t") >= n).select(
        "id", "n_tokens", F.posexplode(g).alias("pos", "gram")
    )


def _top_gram_count(base: DataFrame, n: int) -> DataFrame:
    """Per doc: occurrence count of the most frequent n-gram. Only the
    max count is reported, so no tie-break is needed."""
    return (
        _grams(base, n)
        .groupBy("id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias(f"top{n}_count"))
    )


def _dup_gram_coverage(base: DataFrame, n: int, min_repeats: int) -> DataFrame:
    """Per doc: token positions covered by any n-gram occurring at least
    min_repeats times WITHIN the doc, with overlapping/adjacent
    occurrence windows merged gaps-and-islands style (the same merge as
    operators/dedup.duplicated_spans, but grouped per document instead
    of cross-corpus). Full windows only (pos + n <= n_tokens always),
    so no span clamp is needed."""
    g = _grams(base, n)
    dup_keys = (
        g.groupBy("id", "gram")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_repeats)
        .select("id", "gram")
    )
    # co-partitioned with the groupBy above: same (id, gram) exchange
    dp = g.join(dup_keys, ["id", "gram"]).select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = F.sum(
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    ).over(w)
    return (
        dp.withColumn("_g", grp)
        .groupBy("id", "_g")
        .agg((F.max("pos") + n - F.min("pos")).alias("_cov"))
        .groupBy("id")
        .agg(F.sum("_cov").alias(f"dup{n}_covered_tokens"))
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3),
    dup_n: int = 5,
    min_repeats: int = 2,
    persist_base: bool = False,
) -> DataFrame:
    """One row per document with its Gopher-style repetition signals:

    - ``n_tokens``
    - ``top{n}_count`` for each n in top_ns: occurrences of the doc's
      most frequent n-gram (0 when the doc has fewer than n tokens)
    - ``top{n}_frac``: top{n}_count * n / n_tokens — the token-fraction
      analog of the paper's "fraction of characters in the most
      frequent n-gram"
    - ``dup{dup_n}_covered_tokens`` and ``dup{dup_n}_frac``: overlap-
      merged token coverage of within-doc duplicated dup_n-grams —
      the "fraction of characters in duplicate n-grams" analog.

    All counts are exact integers (the fractions are single divisions
    of exact integers, so they are deterministic across engines).

    The tokenized base feeds one gram pass per n plus the id spine, so
    the source is scanned len(top_ns)+2 times (column-pruned to id +
    text each time). ``persist_base=True`` caches the tokenization
    instead (MEMORY_AND_DISK) — right when the upstream is an expensive
    derived plan or a slow source; leave False when re-scanning pruned
    parquet is cheaper than materializing ~corpus-text-size of token
    arrays, which is the common case for a plain table scan.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("t"), F.size(toks).alias("n_tokens")
    )
    if persist_base:
        base = base.persist()
    out = base.select("id", "n_tokens")
    for n in top_ns:
        out = out.join(_top_gram_count(base, n), "id", "left")
    out = out.join(_dup_gram_coverage(base, dup_n, min_repeats), "id", "left")
    cols = [F.col("id").alias(id_col), "n_tokens"]
    for n in top_ns:
        cnt = F.coalesce(F.col(f"top{n}_count"), F.lit(0)).cast("long")
        cols += [
            cnt.alias(f"top{n}_count"),
            (cnt * n / F.col("n_tokens")).alias(f"top{n}_frac"),
        ]
    cov = F.coalesce(F.col(f"dup{dup_n}_covered_tokens"), F.lit(0)).cast("long")
    cols += [
        cov.alias(f"dup{dup_n}_covered_tokens"),
        (cov / F.col("n_tokens")).alias(f"dup{dup_n}_frac"),
    ]
    return out.select(*cols)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    window: int = 13,
    mode: str = "flag",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag (or drop) every training document
    that shares at least one ``window``-token n-gram with the benchmark
    set — the published curation step of GPT-3 (Brown et al. 2020,
    13-gram overlap) and Gopher/MassiveText (Rae et al. 2021), here as
    a relational pass over the window-hash postings that
    operators/dedup.window_hash_positions already produces.

    Shape at scale: the benchmark side (eval sets — thousands to low
    millions of windows, ALWAYS tiny next to a training corpus) is
    hashed, deduplicated, and broadcast; the corpus side is ONE
    mapInPandas hash pass probed against that broadcast — the training
    corpus is never shuffled. ``broadcast_benchmark=False`` switches to
    a shuffle semi-join for the unusual case of a benchmark too large
    to broadcast. The window key is the combined two-multiplier poly
    hash (false-positive rate ~5e-7 per window — a stray FP flags one
    extra doc, it never drops a benchmark hit).

    Docs (or benchmark rows) of <= window tokens emit one whole-doc
    window, so a short benchmark item only matches documents containing
    its exact full text as a short doc's full text — the conservative
    direction for decontamination.

    mode='flag' returns ``docs`` + is_contaminated +
    n_contaminated_windows; mode='remove' returns only the clean rows
    (original columns). Lowercasing is inherited from the window
    hasher's tokenization, matching the dedup operators.
    """
    if mode not in ("flag", "remove"):
        raise ValueError(f"mode must be 'flag' or 'remove', got {mode!r}")
    from entity_linking_spark.operators.dedup import window_hash_positions

    # the benchmark id is a throwaway (only whash survives); xxhash64 of
    # the text keeps it deterministic, per the module-wide never-rand rule
    bench = benchmark.select(
        F.xxhash64(F.col(bench_text_col or text_col)).alias("_bid"),
        F.col(bench_text_col or text_col).alias("text"),
    )
    bh = (
        window_hash_positions(bench, "text", "_bid", window)
        .select("whash")
        .distinct()
    )
    if broadcast_benchmark:
        bh = F.broadcast(bh)
    dh = window_hash_positions(docs, text_col, id_col, window)
    hits = (
        dh.join(bh, "whash")
        .groupBy("id")
        .agg(F.count("*").alias("n_contaminated_windows"))
    )
    flagged = (
        docs.join(
            hits, docs[id_col].cast("string") == hits["id"], "left"
        )
        .drop("id")
        .withColumn(
            "n_contaminated_windows",
            F.coalesce(F.col("n_contaminated_windows"), F.lit(0)).cast("long"),
        )
        .withColumn(
            "is_contaminated", F.col("n_contaminated_windows") > 0
        )
    )
    if mode == "remove":
        return flagged.where(~F.col("is_contaminated")).drop(
            "is_contaminated", "n_contaminated_windows"
        )
    return flagged
