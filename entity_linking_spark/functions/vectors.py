"""Vector ops: deterministic hash-embeddings + cosine, Arrow-vectorized.

The reference encodes contexts/candidates with a BERT bi-encoder into
768-dim float tensors and scores with inner product
(entity_candidate/biencoder/biencoder_.py:128-167). At test scale we
substitute a deterministic feature-hashing embedding with the same API
(SURVEY.md §2.10): same dimensionality contract, L2-normalized, so cosine
scoring code paths are identical and fixtures need no model weights. On a
real cluster the embed UDF body would be a batched model forward
(predict_batch_udf-style); everything downstream is unchanged.

No per-row Python in hot paths: embeddings for an Arrow batch are built
into one [batch, dim] numpy matrix; pair cosine is a single einsum.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, FloatType

EMBED_DIM = 64


def hash_embed_matrix(token_lists: list[list[str]], dim: int = EMBED_DIM) -> np.ndarray:
    """Feature-hash token lists into L2-normalized [n, dim] float32."""
    out = np.zeros((len(token_lists), dim), dtype=np.float32)
    for i, toks in enumerate(token_lists):
        if not toks:
            continue
        idx = np.fromiter(
            (zlib.crc32(t.encode("utf-8")) for t in toks), dtype=np.int64, count=len(toks)
        )
        sign = np.where((idx >> 31) & 1, -1.0, 1.0).astype(np.float32)
        np.add.at(out[i], idx % dim, sign)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


@pandas_udf(ArrayType(FloatType()))
def hash_embed_udf(tokens: pd.Series) -> pd.Series:
    mat = hash_embed_matrix([list(t) if t is not None else [] for t in tokens])
    return pd.Series(list(mat))


@pandas_udf(DoubleType())
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise cosine of two array<float> columns (one matmul per batch)."""
    n = len(a)
    out = np.zeros(n)
    # stack ragged-safe: all vecs same dim in practice
    try:
        ma = np.stack([np.asarray(x, dtype=np.float32) for x in a])
        mb = np.stack([np.asarray(x, dtype=np.float32) for x in b])
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        denom = na * nb
        denom[denom == 0] = 1.0
        out = np.einsum("ij,ij->i", ma, mb) / denom
    except (ValueError, TypeError):
        # ragged/NULL rows: score each row alone, 0.0 for missing vecs.
        # `x or []` would NOT work here — Arrow hands numpy arrays, whose
        # truth value raises for >1 element; test against None explicitly
        for i in range(n):
            xa, xb = a.iloc[i], b.iloc[i]
            va = np.asarray(xa if xa is not None else [], dtype=np.float32)
            vb = np.asarray(xb if xb is not None else [], dtype=np.float32)
            if va.shape != vb.shape:
                out[i] = 0.0
                continue
            d = np.linalg.norm(va) * np.linalg.norm(vb)
            out[i] = float(va @ vb / d) if d else 0.0
    return pd.Series(out)


# --- JVM-side (Column-expression) cosine -------------------------------
#
# cosine_udf above runs float32 numpy per Arrow batch — right for bulk
# rescoring where 1e-7 relative error is irrelevant. The Column variants
# below stay entirely in whole-stage codegen as sequential DOUBLE folds,
# which makes them bit-reproducible against a DuckDB list_cosine_
# similarity twin (same left-to-right accumulation order, same IEEE
# ops) — the property the cosine-bearing oracle gate rows depend on.
# ann_cosine_topk and semantic_dedup call cosine_col directly;
# j9_hard_negative_join goes through brute_force_topk's float64 numpy
# matmul, which agrees with the fold to the last ulp away from ties.

def dot_col(a, b):
    """Sequential-fold double dot product of two array columns (JVM)."""
    from pyspark.sql import Column  # noqa: F401  (doc aid)

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a):
    """L2 norm of an array column as a sequential double fold (JVM)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_col(a, b):
    """Cosine of two array columns, all-JVM double arithmetic.

    Zero-norm rows score 0.0 (not NaN): Spark orders NaN ABOVE every
    number, so an unguarded 0/0 would make a zero vector win argmax
    comparisons and pass >= thresholds — and diverge from the numpy
    paths, which guard zero norms the same way. For non-zero rows the
    guard is a no-op, so DuckDB bit-reproducibility is unchanged."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = norm_col(a) * norm_col(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_col(a, b) / denom)
