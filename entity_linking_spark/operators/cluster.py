"""Transitive clustering: connected components via large-star/small-star.

The reference's final grouping is implicit — mentions resolved to the
same subject_id belong together (entity_sort/service_main.py:160-172).
At corpus scale that becomes transitive closure over match edges. We use
the alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public), which
converges in O(log² n) rounds even on path graphs, vs O(diameter) for
naive min-label propagation. Each round is two groupBy-min + join
shuffles; no collect_list (hot vertices never materialize a neighbor
array), so degree skew stays inside the hash aggregate.

Vertex ids are the url strings themselves under lexicographic order —
cluster_id = min(url) falls out of the fixpoint with no id<->url
mapping shuffle.

Every iteration localCheckpoints to truncate lineage (the reference's
per-stage pickle checkpoints, SURVEY §2.1 S7, become per-iteration
materialization here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_ITERATIONS = 50


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u."""
    sym = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.withColumn("m", F.least("u", "mn")).select("u", "m")
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient (big, small); for each big b: m = min of its small neighbors;
    emit (s, m) for each small neighbor plus (b, m)."""
    o = edges.select(
        F.greatest("src", "dst").alias("b"), F.least("src", "dst").alias("s")
    ).where(F.col("b") != F.col("s"))
    mins = o.groupBy("b").agg(F.min("s").alias("m"))
    relink = (
        o.join(mins, "b")
        .select(F.col("s").alias("src"), F.col("m").alias("dst"))
        .unionByName(mins.select(F.col("b").alias("src"), F.col("m").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return relink


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iterations: int = MAX_ITERATIONS
) -> DataFrame:
    """(url, cluster_id) for every vertex; cluster_id = component min url.

    ``edges``: (url_a, url_b) match pairs. ``vertices``: (url) all docs —
    isolated docs become singleton clusters (cluster_id = own url).
    """
    e = (
        edges.select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if e.isEmpty():
        return vertices.select("url", F.col("url").alias("cluster_id"))

    e = e.localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_iterations):
        e = _large_star(e)
        e = _small_star(e)
        e = e.localCheckpoint(eager=True)
        sig = _signature(e)
        if sig == prev_sig:
            break
        prev_sig = sig

    # fixpoint edges are (member, root); roots map to themselves
    member = e.select(F.col("src").alias("url"), F.col("dst").alias("cluster_id"))
    # a vertex may appear as src in multiple residual edges pre-fixpoint;
    # take the min root defensively (no-op at true fixpoint)
    member = member.groupBy("url").agg(F.min("cluster_id").alias("cluster_id"))
    return (
        vertices.select("url")
        .join(member, "url", "left")
        .select("url", F.coalesce("cluster_id", "url").alias("cluster_id"))
    )
