"""Salted join: correctness equivalence + partition-spread evidence."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from entity_linking_spark.operators import skew


def _skewed(spark):
    # one viral key owning 90% of the probe side
    rows = [Row(key="hot", other=f"o{i}", v=i) for i in range(900)]
    rows += [Row(key=f"k{i}", other=f"o{i}", v=i) for i in range(100)]
    large = spark.createDataFrame(rows)
    small = spark.createDataFrame(
        [Row(key="hot", label="HOT")] + [Row(key=f"k{i}", label=f"L{i}") for i in range(100)]
    )
    return large, small


def test_salted_join_equals_plain_join(spark):
    large, small = _skewed(spark)
    plain = large.join(small, "key").select("key", "other", "v", "label")
    salted = skew.salted_join(large, small, "key", salt_cols=["other"]).select(
        "key", "other", "v", "label"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salt_spreads_hot_key(spark):
    large, _ = _skewed(spark)
    salted = skew.with_salt(large.where("key = 'hot'"), ["other"], n_salts=8)
    spread = salted.groupBy("_salt").count().collect()
    assert len(spread) == 8  # hot key occupies all salt buckets
    assert max(r["count"] for r in spread) < 900  # no single straggler bucket


def test_salted_join_left(spark):
    large, small = _skewed(spark)
    some = small.where("key <> 'hot'")
    out = skew.salted_join(large, some, "key", salt_cols=["other"], how="left")
    assert out.count() == large.count()  # left semantics preserved
    assert out.where("label IS NULL").count() == 900  # hot rows unmatched


def test_salted_repartition_spreads(spark):
    large, _ = _skewed(spark)
    rep = skew.salted_repartition(large, "key", n_partitions=8)
    sizes = rep.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert max(r["count"] for r in sizes) < 900  # hot key split across partitions
