"""Salted-join/aggregation equivalence on a power-law key."""

from pyspark.sql import functions as F


def _skewed_df(spark):
    # one hot key (0) with 50k rows, 100 cold keys with 10 each
    hot = spark.range(0, 50_000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(0, 1_000).select(
        (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("payload")
    )
    return hot.unionByName(cold)


def test_salted_join_equals_plain_join(spark):
    from fluxgraph_spark.operators.skew import salted_join

    skewed = _skewed_df(spark)
    dim = spark.range(0, 101).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    plain = skewed.join(dim, "k")
    salted = salted_join(skewed, dim, "k", n_salts=4)
    assert salted.count() == plain.count() == 51_000
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_salted_count_equals_group_count(spark):
    from fluxgraph_spark.operators.skew import salted_count

    skewed = _skewed_df(spark)
    got = {r["k"]: r["count"] for r in salted_count(skewed, "k", 4).collect()}
    want = {r["k"]: r["count"] for r in skewed.groupBy("k").count().collect()}
    assert got == want
