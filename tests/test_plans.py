"""Layout planning: time-bucket partition pruning + id bucketing."""

import pytest
from pyspark.sql import functions as F


def test_as_of_partition_pruning(spark, tmp_path):
    from fluxgraph_spark.plans import (
        explain_str,
        read_as_of_pruned,
        write_time_bucketed,
    )

    # synthetic SCD2 table: 1000 versions across tx 1..1000
    df = spark.range(1, 1001).select(
        F.col("id"),
        F.col("id").alias("tx_from"),
        F.when(F.col("id") % 2 == 0, F.col("id") + 5).alias("tx_to"),
    )
    path = str(tmp_path / "scd2")
    write_time_bucketed(df, path, bucket_txs=100)

    snap = read_as_of_pruned(spark, path, as_of_tx=250, bucket_txs=100)
    # correctness: visible = tx_from <= 250 and (open or tx_to > 250)
    expect = df.where(
        (F.col("tx_from") <= 250) & (F.col("tx_to").isNull() | (F.col("tx_to") > 250))
    )
    assert snap.count() == expect.count()

    # pruning: the physical plan carries a PartitionFilters entry on
    # tx_bucket and reads only buckets 0..2 (of 10)
    plan = explain_str(snap)
    import re

    m = re.search(r"PartitionFilters: \[(.*)\]", plan)
    assert m and "tx_bucket" in m.group(1) and "<= 2" in m.group(1), plan


def test_id_bucketed_join_no_exchange(spark, tmp_path):
    from fluxgraph_spark.plans import explain_str, write_id_bucketed

    v = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 7).alias("x"))
    e = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("src"), (F.col("id") % 997).alias("dst")
    )
    write_id_bucketed(v, "v_bucketed", n_buckets=8)
    write_id_bucketed(e, "e_bucketed", n_buckets=8, key="src")
    vt = spark.table("v_bucketed")
    et = spark.table("e_bucketed")
    try:
        # force a non-broadcast join so the assertion actually exercises
        # bucket co-location, not the broadcast fallback
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = vt.join(et, vt["id"] == et["src"])
        assert joined.count() == 5000
        plan = explain_str(joined)
        # bucketed-on-key join: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS v_bucketed")
        spark.sql("DROP TABLE IF EXISTS e_bucketed")
