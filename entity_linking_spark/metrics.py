"""Evaluation metrics: pairwise P/R/F1 and recall@k.

Pairwise F1 uses exactly the reference's pair-classification formula
(entity_sort/el_main.py:303-306 — p = TP/(TP+FP), r = TP/(TP+FN),
f1 = 2pr/(p+r)) applied to cluster agreement on labeled pairs: a pair is
predicted positive iff both urls land in the same cluster. This is the
BASELINE.json acceptance metric (F1 >= 0.99 on labeled same-block pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pairwise_prf(clusters: DataFrame, labeled_pairs: DataFrame) -> dict[str, float]:
    """P/R/F1 of same-cluster prediction against labeled pairs."""
    ca = clusters.select(
        F.col("url").alias("url_a"), F.col("cluster_id").alias("cid_a")
    )
    cb = clusters.select(
        F.col("url").alias("url_b"), F.col("cluster_id").alias("cid_b")
    )
    joined = (
        labeled_pairs.join(ca, "url_a", "left")
        .join(cb, "url_b", "left")
        .withColumn(
            "pred",
            F.col("cid_a").isNotNull()
            & F.col("cid_b").isNotNull()
            & (F.col("cid_a") == F.col("cid_b")),
        )
    )
    agg = joined.agg(
        F.sum((F.col("pred") & F.col("is_match")).cast("long")).alias("tp"),
        F.sum((F.col("pred") & ~F.col("is_match")).cast("long")).alias("fp"),
        F.sum((~F.col("pred") & F.col("is_match")).cast("long")).alias("fn"),
        F.count("*").alias("n"),
    ).collect()[0]
    tp, fp, fn = int(agg["tp"] or 0), int(agg["fp"] or 0), int(agg["fn"] or 0)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn,
            "n_pairs": int(agg["n"])}


def clusters_agree(
    predicted: DataFrame, expected: DataFrame
) -> dict[str, float]:
    """Exact cluster-assignment agreement (ids are both min-url canonical)."""
    j = predicted.alias("p").join(
        expected.alias("e"), F.col("p.url") == F.col("e.url"), "full"
    )
    agg = j.agg(
        F.sum(
            (F.col("p.cluster_id") == F.col("e.cluster_id")).cast("long")
        ).alias("same"),
        F.count("*").alias("n"),
    ).collect()[0]
    return {"agree": int(agg["same"] or 0), "n": int(agg["n"])}
