"""End-to-end record-linkage pipeline: extract -> block -> score -> cluster.

Orchestrates the stage graph with resume-from-checkpoint (sources/io.py).
Stage inventory and their shuffle profile:

  extract   narrow map (mapInPandas over html)          no shuffle
  mentions  narrow dictionary UDTF                       no shuffle
  blocking  key explode + stop-key cap                   1 shuffle (groupBy key)
  pairs     within-block self-join + distinct            1-2 shuffles
  scoring   2 hash joins pair->features (ent evidence    shuffles on url (uniform)
            is a JVM map intersection, not a join)
  cluster   large-star/small-star to fixpoint            2 shuffles/round, O(log n) rounds

Run as a job:  python -m entity_linking_spark.pipeline --workdir /tmp/el \
               [--n-docs 2000] [--force]
(spark-submit --py-files form on a real cluster; entry is main()).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from entity_linking_spark import schema as S
from entity_linking_spark.metrics import pairwise_prf
from entity_linking_spark.operators import blocking, cluster, extract, scoring
from entity_linking_spark.session import get_spark
from entity_linking_spark.sources import io


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    aliases: DataFrame,
    workdir: str,
    force: bool = False,
    max_block_size: int = blocking.MAX_BLOCK_SIZE,
    threshold: float = scoring.MATCH_THRESHOLD,
    alias_broadcast_max_rows: int = blocking.ALIAS_BROADCAST_MAX_ROWS,
    salt_factor: int | str | None = "auto",
    salt_hot_threshold: int | None = None,
) -> DataFrame:
    """Full linkage run; returns (url, cluster_id). Checkpoints each stage.

    ``alias_broadcast_max_rows``: alias tables at/below this (row count
    read from parquet footers, no scan job) are collected and matched
    with the broadcast trie; larger KBs take the join-based
    ``detect_mentions_join`` path — identical output, no driver collect,
    so a beyond-broadcast KB no longer kills the job at s2."""
    # per-stage cache registry: every stage materializes to its snapshot,
    # so any DataFrame an operator pinned while BUILDING a stage is dead
    # weight the moment that stage's write commits — downstream stages
    # read the snapshot files, not the lineage. Without the release the
    # pins (e.g. candidate_entities' normalized alias table) stay in
    # executor storage for the rest of the session.
    stage_caches: list = []

    def _release_stage_caches() -> None:
        while stage_caches:
            try:
                stage_caches.pop().unpersist(False)
            except Exception:  # noqa: BLE001 — release is best-effort
                pass

    def _extract() -> DataFrame:
        # spread the corpus across all cores before the Python stage —
        # but ONLY when the scan yields fewer splits than cores (a small
        # parquet input may arrive as 1-2 splits); when the scan already
        # parallelizes, an unconditional repartition would shuffle the
        # whole html corpus for nothing. Extraction and tokenization are
        # FUSED into one mapInPandas (html never crosses JVM<->Python
        # twice — see extract.extract_and_tokenize).
        par = spark.sparkContext.defaultParallelism
        src = documents
        if documents.rdd.getNumPartitions() < par:
            src = documents.repartition(par)
        return extract.extract_and_tokenize(src)

    # the alias-dictionary collect only depends on the INPUT aliases table,
    # not on s1 — submit it from a second thread so the (serial,
    # latency-bound) broadcast prep overlaps the extract stage instead of
    # sitting between s1 and s2 on the critical path. Spark schedules jobs
    # from concurrent driver threads independently (FIFO pools).
    import threading

    alias_box: dict[str, object] = {}

    def _collect_aliases() -> None:
        try:
            # footer-metadata row estimate first: a beyond-broadcast KB
            # must never be collected at all (the estimate itself costs
            # no scan job for parquet-backed alias tables)
            if blocking.alias_row_estimate(aliases) > alias_broadcast_max_rows:
                alias_box["list"] = None  # s2 takes the join-based path
            else:
                alias_box["list"] = [
                    r["alias"] for r in aliases.select("alias").distinct().collect()
                ]
        except BaseException as e:  # noqa: BLE001 — re-raised on the main thread
            alias_box["err"] = e

    alias_thread = threading.Thread(target=_collect_aliases, daemon=True)
    alias_thread.start()

    docs = io.run_stage(spark, workdir, "s1_extract", _extract, force)

    # S9 encodings table: the per-doc embedding as a FIRST-CLASS stage
    # output (url, vec) — written once, reused by scoring and by any
    # ANN/linkage consumer across runs (the reference precomputes and
    # caches entity encodings the same way, eval_biencoder_.py:305-341).
    # The fused s1 pass already computed vec, so building it is a pure
    # projection. s1b depends ONLY on s1, so it runs on a SECOND driver
    # thread concurrently with the s2 -> s4 chain (Spark schedules jobs
    # from concurrent driver threads independently) — DAG parallelism a
    # cluster scheduler would exploit; serially it sat on the critical
    # path between s4 and s5 for no reason.
    emb_box: dict[str, object] = {}

    def _embeddings_stage() -> None:
        try:
            emb_box["df"] = io.run_stage(
                spark, workdir, "s1b_embeddings", lambda: docs.select("url", "vec"), force
            )
        except BaseException as e:  # noqa: BLE001 — re-raised on the main thread
            emb_box["err"] = e

    emb_thread = threading.Thread(target=_embeddings_stage, daemon=True)
    emb_thread.start()

    alias_thread.join()
    if "err" in alias_box:
        raise alias_box["err"]
    alias_list = alias_box["list"]

    def _mentions() -> DataFrame:
        if alias_list is None:  # beyond-broadcast KB: distributed join path
            return blocking.detect_mentions_join(
                docs, aliases, tokens_col="tokens", cache_registry=stage_caches
            )
        return blocking.detect_mentions(docs, alias_list, tokens_col="tokens")

    mentions = io.run_stage(spark, workdir, "s2_mentions", _mentions, force)
    _release_stage_caches()

    def _candidates() -> DataFrame:
        return blocking.candidate_entities(
            mentions, aliases, cache_registry=stage_caches
        )

    candidates = io.run_stage(spark, workdir, "s3_candidates", _candidates, force)
    _release_stage_caches()

    def _pairs() -> DataFrame:
        keys = blocking.blocking_keys(docs, candidates)
        # cache_keys=False: docs/candidates are checkpointed stage
        # snapshots, so the two scans of the keys subtree are cheap
        # columnar re-reads — no Python stage to protect, and no reason
        # to pin a corpus-sized key table to executor storage
        return blocking.candidate_pairs(keys, max_block_size, cache_keys=False)

    pairs = io.run_stage(spark, workdir, "s4_pairs", _pairs, force)

    emb_thread.join()
    if "err" in emb_box:
        raise emb_box["err"]
    embeddings = emb_box["df"]

    def _scores() -> DataFrame:
        supports, emb, top_mention = scoring.doc_features(
            docs, candidates, embeddings=embeddings
        )
        # salt_factor="auto" (default): scoring joins flip hot urls to
        # the salted path from an exact key-frequency pass — uniform
        # corpora pay only the map-side-combined count, skewed ones
        # (viral page in millions of pairs) lose the straggler
        return scoring.score_pairs(
            pairs, supports, emb, top_mention, salt_factor, salt_hot_threshold
        )

    scores = io.run_stage(spark, workdir, "s5_scores", _scores, force)

    def _clusters() -> DataFrame:
        edges = scoring.match_edges(scores, threshold)
        return cluster.connected_components(edges, docs.select("url"))

    out = io.run_stage(spark, workdir, "s6_clusters", _clusters, force)
    _release_stage_caches()
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--n-docs", type=int, default=2000)
    ap.add_argument("--n-entities", type=int, default=300)
    src = ap.add_mutually_exclusive_group()
    src.add_argument("--input-docs", help="parquet path; skips fixture synthesis")
    src.add_argument(
        "--input-warc",
        help="directory of WARC segments (Common-Crawl layout); ingested "
        "via sources/warc.py instead of --input-docs",
    )
    ap.add_argument("--input-aliases", help="parquet path (with --input-docs/-warc)")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    if (args.input_docs or args.input_warc) and not args.input_aliases:
        ap.error("--input-docs/--input-warc require --input-aliases")

    spark = get_spark("el-pipeline", cores=args.cores)
    if args.input_warc:
        from entity_linking_spark.sources import warc

        # ingest is checkpointed as its own stage: a resumed run reads
        # the columnar snapshot instead of re-parsing every WARC segment
        documents = io.run_stage(
            spark,
            args.workdir,
            "s0_ingest",
            lambda: warc.warc_documents(warc.read_warc(spark, args.input_warc)),
            args.force,
        )
        aliases = spark.read.parquet(args.input_aliases)
        labeled_pairs = None
    elif args.input_docs:
        documents = spark.read.parquet(args.input_docs)
        aliases = spark.read.parquet(args.input_aliases)
        labeled_pairs = None
    else:
        fx = S.load_fixtures(spark, n_docs=args.n_docs, n_entities=args.n_entities)
        documents, aliases = fx["documents"], fx["aliases"]
        labeled_pairs = fx["labeled_pairs"]
    t0 = time.time()
    clusters = run_pipeline(spark, documents, aliases, args.workdir, force=args.force)
    # row count from the s6 sidecar (written during the stage's own save)
    # — a final count() action was a pure harness artifact re-scanning
    # the whole output
    n_docs = io.stage_meta(args.workdir, "s6_clusters")["rows"]
    elapsed = time.time() - t0
    out = {
        "docs": n_docs,
        "seconds": round(elapsed, 2),
        "docs_per_sec": round(n_docs / elapsed, 1),
        "cores": spark.sparkContext.defaultParallelism,
    }
    if labeled_pairs is not None:
        prf = pairwise_prf(clusters, labeled_pairs)
        out.update(
            {k: round(v, 4) if isinstance(v, float) else v for k, v in prf.items()}
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
