"""Structured Streaming surface.

The reference's only online surface is a synchronous Flask request loop
(entity_sort/el_service.py:72-105) — per request: lowercase, alias-dict
mention detection, candidate lookup, scoring, top-k. Its Spark-native
equivalent is a micro-batched stream: readStream over arriving documents
-> the same detect/score transformations via foreachBatch -> sink. The
reference has no watermarks/stateful operators (SURVEY §2.9), so the jobs
here are the canonical shapes a production deployment needs:

  streaming_mention_counts  windowed counts with watermark (late data)
  streaming_link_microbatch foreachBatch incremental linkage: each batch
                            of new pages is blocked + scored against the
                            already-linked corpus (the service loop, batched)

Both run with trigger(availableNow=True) in tests — bounded input, real
streaming engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def streaming_mention_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked windowed counts (the streaming analog of
    plans/queries.stream_windowed_counts — same window semantics)."""
    # watermarks require TIMESTAMP (with zone); parquet sources often carry
    # TIMESTAMP_NTZ — cast defensively
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias("window_start"),
            key_col,
            "n",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    source_parquet: str,
    schema,
    transform,
    table_name: str,
    output_mode: str = "complete",
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    """readStream(parquet) -> transform -> in-memory sink, availableNow.

    Bounded run of the real streaming engine: used by tests and as the
    template for a production kafka/iceberg-source deployment.
    ``output_mode='append'`` + ``max_files_per_trigger=1`` turns each
    source file into its own micro-batch, which is how the late-data /
    watermark-drop semantics are exercised deterministically (the file
    source orders batches by modification time).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_parquet)
    )
    out = transform(stream)
    return (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def _first_seen_of_group(n_prior: int, pdf_iter, id_col: str):
    """(keeper_id | None, rows_in_batch) for one state group's chunks.

    A group larger than the Arrow batch cap arrives as MULTIPLE pandas
    chunks — the keeper must be min(id) across ALL of them, never just
    the first chunk (chunk order is not deterministic). Module-level so
    the multi-chunk contract is unit-testable without a streaming query.
    """
    first_id = None
    n_this_batch = 0
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        n_this_batch += len(pdf)
        if n_prior == 0:
            chunk_min = pdf[id_col].min()
            if first_id is None or chunk_min < first_id:
                first_id = chunk_min
    return first_id, n_this_batch


def streaming_dedup_first_seen(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """Stateful streaming exact-dedup: keep only the FIRST document seen
    per content hash across all micro-batches.

    Custom stateful operator via applyInPandasWithState: state per
    content-hash group is a running count; a group's first arrival is
    emitted (keeper = min id across every Arrow chunk of the micro-batch)
    with the in-batch duplicate count, later arrivals are dropped and
    counted in state. This is the streaming face of operators/dedup.exact_dedup
    (training-data pipeline op): at 100 TB-ingest scale the state store
    holds one tiny record per distinct content hash, partitioned by the
    shuffle on the hash key — no global structure, no driver state.
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("content_hash", StringType()),
            StructField(id_col, StringType()),
            StructField("n_batch_dupes", LongType()),
        ]
    )
    state_schema = StructType([StructField("n_seen", LongType())])

    def dedup_fn(key, pdf_iter, state: GroupState):
        n_prior = state.get[0] if state.exists else 0
        first_id, n_this_batch = _first_seen_of_group(n_prior, pdf_iter, id_col)
        state.update((n_prior + n_this_batch,))
        if first_id is not None:
            # n_batch_dupes: duplicates of the keeper within this first
            # micro-batch (later-batch dupes are counted in state only)
            yield pd.DataFrame(
                {
                    "content_hash": [key[0]],
                    id_col: [first_id],
                    "n_batch_dupes": [n_this_batch - 1],
                }
            )

    hashed = docs_stream.select(
        F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col)
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_link_microbatch(
    spark: SparkSession,
    new_docs_stream: DataFrame,
    aliases: DataFrame,
    alias_list: list[str] | None,
    sink_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """foreachBatch incremental linkage: per micro-batch, run mention
    detection + candidate generation on the new pages and append the
    candidate table (reference service loop, service_main.py:93-175,
    re-expressed as micro-batches).

    ``alias_list=None`` selects the beyond-broadcast JOIN mention path
    per batch (blocking.detect_mentions_join) — the streaming service
    keeps working when the KB no longer fits a driver collect; output is
    identical (stream-batch parity pytest covers both modes).

    The alias table is normalized + persisted ONCE here, outside the
    batch loop (pre_normalized=True below): calling candidate_entities's
    default path per micro-batch would pin a fresh cached copy of the
    full alias table every batch until driver GC catches up."""
    from pyspark import StorageLevel

    from entity_linking_spark.functions.normalize import normalize_udf
    from entity_linking_spark.operators import blocking

    alias_norm = (
        aliases.select(normalize_udf(F.col("alias")).alias("alias"), "subject_id")
        .where(F.col("alias") != "")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # decide the alias-token vocabulary half of the prefilter gate ONCE
    # for the stream's lifetime — "auto" inside the batch loop would
    # re-count the alias token vocabulary every micro-batch. The corpus
    # half is per-batch below: a normal micro-batch is far too small for
    # the prefilter to net out (its cost is alias-side and fixed), but a
    # file-source backfill batch can be huge, and its size is free to
    # read from parquet footers.
    prefilter_vocab_ok = (
        alias_norm.select(F.explode(F.split("alias", " ")).alias("t"))
        .distinct()
        .count()
        <= blocking.ALIAS_TOKEN_BROADCAST_MAX
    )
    # same once-outside-the-loop treatment for the candidate-join
    # broadcast gate: the alias table is fixed for the stream's lifetime,
    # so resolve the size gate here instead of paying a row-estimate
    # (possibly a count() job) on every micro-batch
    alias_broadcast_ok = (
        blocking.alias_row_estimate(aliases)
        <= blocking.CANDIDATE_BROADCAST_MAX_ROWS
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch_caches: list[DataFrame] = []
        try:
            if alias_list is None:  # beyond-broadcast KB: join path per batch
                batch_est = blocking.footer_row_estimate(batch_df)
                mentions = blocking.detect_mentions_join(
                    batch_df, alias_norm, pre_normalized=True,
                    cache_registry=batch_caches,
                    anchor_prefilter=prefilter_vocab_ok
                    and batch_est is not None
                    and batch_est >= blocking.PREFILTER_MIN_DOC_ROWS,
                )
            else:
                mentions = blocking.detect_mentions(batch_df, alias_list)
            cands = blocking.candidate_entities(
                mentions, alias_norm, pre_normalized=True,
                broadcast_hint=alias_broadcast_ok,
            )
            cands.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(sink_path)
        finally:
            # release the batch-scoped token cache eagerly: a long-running
            # stream must not accumulate one executor storage entry per
            # micro-batch while waiting on driver GC
            for df in batch_caches:
                df.unpersist()

    return (
        new_docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
