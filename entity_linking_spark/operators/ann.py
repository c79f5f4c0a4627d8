"""Approximate nearest-neighbor search over an embedding column.

Replaces the reference's FAISS retrieval (faiss_indexer.py:47-136,
IndexFlatIP exact + HNSW approximate) with Spark-native strategies:

  brute_force_topk       exact: query broadcast x corpus, vectorized
                         cosine in one numpy matmul per Arrow batch,
                         per-query top-k window. The J6 full-matmul path
                         (biencoder_.py:166-167) — correct baseline and
                         fine whenever |queries| x |corpus| partitions fit.
  lsh_topk               scale path: random-hyperplane LSH buckets (the
                         banding analog of FAISS's coarse quantizer);
                         candidates only within shared buckets, exact
                         rescoring, per-query top-k. Probes multiple
                         bucket permutations for recall.
  ivf_topk               IVF-style: k-means-lite centroids (seeded,
                         deterministic), assign corpus to nearest
                         centroid, search only n_probe nearest cells.

All math stays in numpy over Arrow batches — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, LongType
from pyspark.sql.window import Window

_SEED = 42
N_PLANES = 16  # default bucket-signature width; tune per corpus size
_PLANE_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _planes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    key = (dim, n_planes)
    if key not in _PLANE_CACHE:
        rng = np.random.RandomState(_SEED)
        _PLANE_CACHE[key] = rng.standard_normal((n_planes, dim)).astype(np.float32)
    return _PLANE_CACHE[key]


def make_bucket_udf(n_planes: int = N_PLANES):
    """Factory: sign pattern of n_planes fixed hyperplanes -> int bucket id.

    Parametrized so callers size the bucket count (2^n_planes) to the
    corpus: more planes = smaller buckets = fewer pairs per bucket."""

    @pandas_udf(IntegerType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
        signs = (mat @ _planes(mat.shape[1], n_planes).T) > 0  # [n, planes]
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((signs @ weights).astype(np.int32))

    return bucket_udf


hyperplane_bucket_udf = make_bucket_udf(N_PLANES)


def make_multiprobe_udf(n_planes: int = N_PLANES):
    """Factory: bucket + its n_planes single-bit-flip neighbors
    (multi-probe LSH: recovers neighbors that fall just across one
    hyperplane). Parametrized with the matching bucket width — fewer
    planes = bigger buckets = higher recall at more candidates/query;
    size to corpus density (≈ log2(corpus/target_bucket_size) planes)."""

    @pandas_udf(ArrayType(IntegerType()))
    def multiprobe_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
        signs = (mat @ _planes(mat.shape[1], n_planes).T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        base = (signs @ weights).astype(np.int64)
        flips = base[:, None] ^ weights[None, :]  # [n, planes]
        out = np.concatenate([base[:, None], flips], axis=1).astype(np.int32)
        return pd.Series(list(out))

    return multiprobe_udf


hyperplane_multiprobe_udf = make_multiprobe_udf(N_PLANES)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries, matmul per Arrow batch.

    Scale shape: corpus stays partitioned; each task scores its slice
    against ALL queries in one [batch, dim] x [dim, nq] matmul, then a
    per-query window keeps k. Works while queries fit in a broadcast
    (the reference's eval path batches mentions the same way)."""
    qrows = queries.select(query_id_col, vec_col).collect()
    qids = [r[0] for r in qrows]
    # float64 throughout: scores are oracle-compared at 4 decimals, and
    # float32 accumulation error (~1e-7 relative) can flip a rounding
    # boundary or a near-tie in the rank order
    qmat = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)

    @pandas_udf(ArrayType(DoubleType()))
    def sims_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ qmat.T  # [batch, nq]
        return pd.Series(list(sims))

    scored = corpus.select(
        F.col(id_col), sims_udf(F.col(vec_col)).alias("sims")
    ).select(
        id_col, F.posexplode("sims").alias("q_idx", "cos_sim")
    )
    qmap = F.array(*[F.lit(q) for q in qids])
    w = Window.partitionBy("q_idx").orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            qmap[F.col("q_idx")].alias(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.round("cos_sim", 4).alias("cos_sim"),
            F.col("rn").alias("rank"),
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = N_PLANES,
) -> DataFrame:
    """LSH-bucketed ANN: corpus bucketed once (single bucket), queries
    multi-probe their bucket + 1-bit neighbors; exact cosine inside
    matched buckets; per-query top-k.

    ``n_planes`` sizes the bucket count (2^n_planes) to the corpus:
    target n_planes ≈ log2(|corpus| / desired_bucket_size); a fixed
    width is recall-fragile as corpus density varies."""
    from entity_linking_spark.functions.vectors import cosine_udf

    bucket_udf = make_bucket_udf(n_planes)
    probe_udf = make_multiprobe_udf(n_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        bucket_udf(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("qvec"),
        F.explode(probe_udf(F.col(vec_col))).alias("bucket"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        q.join(c, "bucket")
        .withColumn("cos_sim", F.round(cosine_udf("qvec", "cvec"), 4))
        .select(query_id_col, "neighbor_id", "cos_sim")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    sample_mod: int = 1,
) -> DataFrame:
    """IVF-style ANN: deterministic centroids (bottom-k-by-hash sample,
    one k-means sweep), corpus assigned to nearest cell, queries probe
    n_probe cells, exact rescoring within.

    ``sample_mod``: hash-modulus pre-filter for the centroid sample. At
    web scale (>=10^10 rows) set e.g. 1<<20 so the bottom-k heap scans
    ~corpus/sample_mod rows instead of everything; default 1 (no filter)
    is right for anything that fits a normal scan.
    """
    from entity_linking_spark.functions.vectors import cosine_udf

    # Deterministic centroid init via BOTTOM-K-BY-HASH — exactly ONE job,
    # no corpus.count() pre-action, never a full sort. orderBy(limit)
    # compiles to TakeOrderedAndProject: a per-partition heap of `target`
    # rows plus one merge task, so the exchange carries target rows per
    # partition, not the corpus. Selection is by xxhash64 order, so the
    # sample is independent of partitioning (FIXTURES.md determinism).
    target = n_cells * 32
    base = corpus.select(id_col, vec_col).withColumn(
        "_h", F.xxhash64(F.col(id_col))
    )

    def _bottom_k(df):
        return df.orderBy("_h").limit(target).drop("_h").collect()

    s = base
    if sample_mod > 1:
        s = s.where(F.pmod(F.col("_h"), F.lit(sample_mod)) == 0)
    sample_rows = _bottom_k(s)
    if not sample_rows and sample_mod > 1:
        # the modulus was too coarse for this corpus (a web-scale
        # sample_mod on a small table can leave zero rows at residue 0):
        # fall back to the unfiltered bottom-k-by-hash over the SAME base
        # — one extra job, still a per-partition heap, never a full sort
        sample_rows = _bottom_k(base)
    if not sample_rows:
        raise ValueError("ivf_topk: empty corpus, cannot seed centroids")
    sample_rows.sort(key=lambda r: r[0])  # seed order independent of plan
    smat = np.stack([np.asarray(r[1], dtype=np.float32) for r in sample_rows])
    cents = smat[: min(n_cells, len(smat))].copy()
    if len(cents) < n_cells:
        cents = np.vstack([cents] * (n_cells // max(len(cents), 1) + 1))[:n_cells]
    assign = np.argmax(smat @ cents.T, axis=1)
    for c_i in range(n_cells):
        members = smat[assign == c_i]
        if len(members):
            cents[c_i] = members.mean(axis=0)
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    @pandas_udf(IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
        return pd.Series(np.argmax(mat @ cents.T, axis=1).astype(np.int32))

    @pandas_udf(ArrayType(IntegerType()))
    def probe_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
        order = np.argsort(-(mat @ cents.T), axis=1)[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        cell_udf(F.col(vec_col)).alias("cell"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("qvec"),
        F.explode(probe_udf(F.col(vec_col))).alias("cell"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        q.join(c, "cell")
        .withColumn("cos_sim", F.round(cosine_udf("qvec", "cvec"), 4))
        .select(query_id_col, "neighbor_id", "cos_sim")
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
