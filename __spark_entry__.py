"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: near-duplicate clustering of the sf0.001
                 documents corpus (MinHash-LSH blocking -> cosine rescue ->
                 connected components), the web-scale linkage slice.
queries()      — one entry per implemented operator from SURVEY.md §2
                 (see entity_linking_spark/plans/queries.py).
oracle_sql()   — matching DuckDB SQL for every SQL-expressible operator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from entity_linking_spark.plans import queries as Q

SF0001 = "/root/testdata/sf0.001"


def _doc_clusters(spark: SparkSession, sf_dir: str, threshold: float = 0.9) -> DataFrame:
    """Near-dup document clustering over the driver corpus: tokenize ->
    MinHash-LSH band blocking -> exact cosine rescoring -> connected
    components. The flagship linkage slice on generic testdata."""
    from entity_linking_spark.functions.normalize import tokenize_udf
    from entity_linking_spark.functions.vectors import cosine_udf, hash_embed_udf
    from entity_linking_spark.operators import blocking, cluster

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("url"), "text")
        .withColumn("tokens", tokenize_udf(F.col("text")))
    )
    keys = blocking.blocking_keys(
        docs, candidates=None, use_host=False, use_entity=False, use_minhash=True
    )
    pairs = blocking.candidate_pairs(keys, max_block_size=64)
    emb = docs.select("url", hash_embed_udf("tokens").alias("vec"))
    ea = emb.select(F.col("url").alias("url_a"), F.col("vec").alias("vec_a"))
    eb = emb.select(F.col("url").alias("url_b"), F.col("vec").alias("vec_b"))
    edges = (
        pairs.join(ea, "url_a")
        .join(eb, "url_b")
        .withColumn("cos", cosine_udf("vec_a", "vec_b"))
        .where(F.col("cos") >= threshold)
        .select("url_a", "url_b")
    )
    clusters = cluster.connected_components(edges, docs.select("url"))
    return clusters.select(
        F.col("url").cast("long").alias("doc_id"),
        F.col("cluster_id").alias("cluster_key"),
    ).orderBy("doc_id")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _doc_clusters(spark, SF0001)


def _docs_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_linking_spark.functions.normalize import tokenize_udf

    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("url"), "text")
        .withColumn("tokens", tokenize_udf(F.col("text")))
    )


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_linking_spark.operators import dedup

    return dedup.simhash_near_dup_pairs(_docs_tokens(spark, sf_dir), max_hamming=8)


def _dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_linking_spark.operators import dedup

    return dedup.minhash_near_dup_pairs(_docs_tokens(spark, sf_dir), min_jaccard=0.6)


def _ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_linking_spark.operators import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.lsh_topk(emb, queries_df, k=5)


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_linking_spark.operators import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.ivf_topk(emb, queries_df, k=5)


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Row

    from entity_linking_spark.operators import multimodal as mm

    rows = [
        Row(
            media_id=f"m{i}",
            kind="image" if i % 2 else "audio",
            payload=mm.encode_fake_media("image" if i % 2 else "audio", 32 + i, 32, i),
        )
        for i in range(20)
    ]
    return mm.with_media_features(spark.createDataFrame(rows)).select(
        "media_id", "kind", "features", "decode_error"
    )


def _rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from entity_linking_spark.functions.text import rolling_hash_udf

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select("doc_id", rolling_hash_udf(F.col("text")).alias("rh")).orderBy(
        "doc_id"
    )


def _f6_kb_description(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: KB description synthesis — concat predicate:object with 。
    suffix rule (reference eval_biencoder_.py:45-57, el_preprocess.py:
    124-164) as a higher-order aggregate over the struct array."""
    from entity_linking_spark import schema as S

    kb = spark.createDataFrame(S.synth_kb(100), schema=S.KB_SCHEMA)
    desc = F.aggregate(
        F.col("data"),
        F.lit(""),
        lambda acc, kg: F.concat(
            acc,
            kg["predicate"],
            F.lit(":"),
            kg["object"],
            F.when(kg["object"].endswith("。"), F.lit("")).otherwise(F.lit("。")),
        ),
    )
    fallback = F.concat(F.lit("摘要，"), F.col("subject"), F.lit("无描述信息。"))
    return kb.select(
        "subject_id",
        F.when(F.size("data") > 0, desc).otherwise(fallback).alias("description"),
    ).orderBy("subject_id")


def _r1_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: seeded negative sampling — per gold (mention,entity) pick 2
    non-gold candidates by deterministic hash order (reference
    el_preprocess.py:104-121 random.sample with seed=123 -> engine-neutral
    md5 ordering + row_number window)."""
    from pyspark.sql.window import Window

    from entity_linking_spark import schema as S

    kb = spark.createDataFrame(S.synth_kb(100), schema=S.KB_SCHEMA)
    golds = kb.select(F.col("subject_id").alias("gold_id")).limit(30)
    cands = kb.select(F.col("subject_id").alias("cand_id"))
    w = Window.partitionBy("gold_id").orderBy(
        F.md5(F.concat("gold_id", F.lit("|"), "cand_id")), "cand_id"
    )
    return (
        golds.crossJoin(cands)
        .where(F.col("cand_id") != F.col("gold_id"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("gold_id", "cand_id", "rn")
        .orderBy("gold_id", "rn")
    )


def _j11_coref_containment_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: coref self-join — short mention contained (word-boundary) in a
    longer mention of the same doc (reference dataset.py:153-187). Non-equi
    predicate inside an equi join on the doc key."""
    from entity_linking_spark import schema as S
    from entity_linking_spark.operators import blocking

    docs_pd = S.synth_documents(n_docs=300, n_entities=60)
    docs = spark.createDataFrame(docs_pd, schema=S.DOCUMENTS_SCHEMA)
    kb = S.synth_kb(60)
    alias_list = [a for al in kb["alias"] for a in al]
    m = blocking.detect_mentions(docs, alias_list)
    a = m.select(F.col("url"), F.col("mention").alias("short_m"))
    b = m.select(F.col("url"), F.col("mention").alias("long_m"))
    return (
        a.join(b, "url")
        .where(
            (F.length("long_m") > F.length("short_m"))
            & (
                F.instr(
                    F.concat(F.lit(" "), F.col("long_m"), F.lit(" ")),
                    F.concat(F.lit(" "), F.col("short_m"), F.lit(" ")),
                )
                > 0
            )
        )
        .select("url", "short_m", "long_m")
        .distinct()
        .orderBy("url", "short_m", "long_m")
    )


def _j9_hard_negative_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: hard-negative lookup — for each vector, its most-similar OTHER
    vector's payload (reference biencoder/data_process_.py:168-196 uses
    id_sim to fetch the nearest non-gold entity's description)."""
    from entity_linking_spark.operators import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = ann.brute_force_topk(emb, queries_df, k=2).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("neighbor_id"),
        F.substring("text", 1, 60).alias("negative_desc"),
    )
    return (
        top.join(docs, "neighbor_id", "left")
        .select("query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"),
                "negative_desc")
        .orderBy("query_id", "neighbor_id")
    )


def _s1_jsonl_catalogue_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2: JSONL entity-catalogue scan + curid parse — the reference
    reads one JSON entity per line and parses the curid out of the idx
    URL (main_dense.py:119-151). Fixture written once, deterministic."""
    import json
    import os

    from entity_linking_spark import schema as S

    path = "/tmp/el_sources_demo/entities.jsonl"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        kb = S.synth_kb(100)
        with open(path + ".tmp", "w") as f:
            for i, (_, r) in enumerate(kb.iterrows()):
                f.write(
                    json.dumps(
                        {
                            "idx": f"https://en.wikipedia.org/wiki?curid={i}",
                            "title": r["subject"],
                            "text": " ".join(
                                f"{d['predicate']}:{d['object']}" for d in r["data"]
                            ),
                        },
                        ensure_ascii=False,
                    )
                    + "\n"
                )
        os.replace(path + ".tmp", path)
    ents = spark.read.json(path)
    return ents.select(
        F.element_at(F.split("idx", "curid="), -1).cast("long").alias("entity_id"),
        "title",
        F.substring("text", 1, 50).alias("snippet"),
    ).orderBy("entity_id")


def _s5_tsv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: TSV mention-file scan (candidate_retrieval/dataset.py:18-69
    splits lines on tabs). Fixture written once, deterministic."""
    import os

    path = "/tmp/el_sources_demo/mentions.tsv"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".tmp", "w") as f:
            for i in range(50):
                f.write(f"doc{i:03d}\tmention {i}\t{i * 7}\te{i % 10:05d}\n")
        os.replace(path + ".tmp", path)
    df = spark.read.csv(
        path,
        sep="\t",
        schema="doc_id string, mention string, offset int, kb_id string",
    )
    return df.orderBy("doc_id")


def _s10_jsonl_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: JSONL sink (write_dicts_as_json_per_line, utils.py:110-117) —
    write df.write.json, read back, prove lossless roundtrip."""
    import shutil

    src = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .where(F.col("doc_id") < 100)
    )
    out = "/tmp/el_sources_demo/docs_jsonl"
    shutil.rmtree(out, ignore_errors=True)
    src.write.json(out)
    back = spark.read.json(out, schema="doc_id long, lang string, n_chars long")
    return back.orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, plus the
    training-data operators (dedup / ANN / multimodal / fingerprints)."""
    out = Q.all_queries()
    out["f6_kb_description"] = _f6_kb_description
    out["r1_negative_sampling"] = _r1_negative_sampling
    out["j11_coref_containment_selfjoin"] = _j11_coref_containment_selfjoin
    out["j9_hard_negative_join"] = _j9_hard_negative_join
    out["s1_jsonl_catalogue_scan"] = _s1_jsonl_catalogue_scan
    out["s5_tsv_scan"] = _s5_tsv_scan
    out["s10_jsonl_sink_roundtrip"] = _s10_jsonl_sink_roundtrip
    # non-SQL-expressible: rows-only checks (custom vectorized operators)
    out["minhash_near_dup_clusters"] = _doc_clusters
    out["dedup_simhash_pairs"] = _dedup_simhash
    out["dedup_minhash_pairs"] = _dedup_minhash
    out["ann_lsh_topk"] = _ann_lsh
    out["ann_ivf_topk"] = _ann_ivf
    out["multimodal_decode_features"] = _multimodal_features
    out["rolling_fingerprint"] = _rolling_fingerprint
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each SQL-expressible query (same column names)."""
    out = Q.all_oracles()
    # the JSONL sink roundtrip must be lossless: compare the re-read data
    # against DuckDB reading the ORIGINAL parquet
    out["s10_jsonl_sink_roundtrip"] = (
        "SELECT doc_id, lang, n_chars FROM documents "
        "WHERE doc_id < 100 ORDER BY doc_id"
    )
    return out
