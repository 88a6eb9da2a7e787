"""Skew mitigation: salted joins and aggregations.

AQE's skew-join handles most hot-key cases at runtime
(`spark.sql.adaptive.skewJoin.enabled`); these explicit forms are for
plans AQE can't rewrite (e.g. a broadcast-ineligible dimension joined on
a power-law key like a hub vertex id, or a deterministic-layout job
where runtime splitting is off).

Pattern: the skewed (fact) side gets a salt in [0, n); the other side is
replicated once per salt value; the join key becomes (key, salt), so one
hot key fans out over n reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``n_salts``
    reducers.  ``other`` is replicated n_salts× (keep it the smaller
    side); result equals ``skewed.join(other, on, how)``."""
    s = skewed.withColumn(SALT, F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    o = other.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return s.join(o, [on, SALT], how).drop(SALT)


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase count for a skewed group-by key: partial counts per
    (key, salt), then a final sum over n_salts rows per key.  (Spark's
    hash aggregation already does map-side partials — this explicit form
    is for when the *reduce* side of one key overflows a single task,
    e.g. exact distinct-heavy aggs downstream.)"""
    s = df.withColumn(SALT, F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    partial = s.groupBy(key, SALT).agg(F.count("*").alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("count"))
