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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = Q.all_queries()
    # non-SQL-expressible: rows-only checks (custom vectorized operators)
    out["minhash_near_dup_clusters"] = _doc_clusters
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each SQL-expressible query (same column names)."""
    return Q.all_oracles()
