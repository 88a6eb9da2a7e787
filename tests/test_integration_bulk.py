"""End-to-end bulk path: mutable graph -> parquet history ->
time-bucketed layout -> pruned as-of read -> DataFrameGraph analytics.

This is the 100 TB workflow in miniature: CRUD happens element-at-a-time
(reference semantics), analytics happen on the persisted SCD2 tables
without ever touching the driver-side store again.
"""

import datetime
import os

from pyspark.sql import functions as F


def test_bulk_roundtrip_asof_analytics(spark, tmp_path):
    from fluxgraph_spark import DataFrameGraph, TemporalGraph
    from fluxgraph_spark.plans import read_as_of_pruned, write_time_bucketed
    from fluxgraph_spark.sources.parquet_io import save_graph_parquet

    # 1. build a small timeline with the mutable engine
    g = TemporalGraph.create(spark)
    t0 = datetime.datetime(2024, 1, 1)
    vs = []
    for i in range(6):
        g.set_transaction_time(t0 + datetime.timedelta(days=i))
        v = g.add_vertex()
        v.set_property("name", f"v{i}")
        vs.append(v)
    g.set_transaction_time(t0 + datetime.timedelta(days=10))
    for i in range(5):
        g.add_edge(None, vs[i], vs[i + 1], "next")
    mid_tx = 7  # after the first 7 transactions (6 adds + 6 set_property = 12... use resolve)
    path = str(tmp_path / "graph")
    save_graph_parquet(g, path)

    # 2. re-layout vertices time-bucketed; as-of read prunes partitions
    vhist = spark.read.parquet(os.path.join(path, "vertices"))
    bucketed = str(tmp_path / "v_bucketed")
    write_time_bucketed(vhist, bucketed, bucket_txs=4)
    snap = read_as_of_pruned(spark, bucketed, as_of_tx=mid_tx, bucket_txs=4)
    # visible versions at tx 7 == engine's own snapshot at that tx
    expect = vhist.where(
        (F.col("tx_from") <= mid_tx)
        & (F.col("tx_to").isNull() | (F.col("tx_to") > mid_tx))
    )
    assert snap.count() == expect.count()

    # 3. bulk graph over the full history + analytics without the store
    e_hist = spark.read.parquet(os.path.join(path, "edges"))
    bg = DataFrameGraph(spark, vhist, e_hist,
                        spark.read.parquet(os.path.join(path, "tx_log")))
    assert bg.vertices_df().count() == 6       # current snapshot
    assert bg.edges_df().count() == 5
    from fluxgraph_spark.operators.analytics import connected_components

    comp = connected_components(bg.edges_df().select("src", "dst"))
    # the 6 chained vertices form one component labeled by the min id
    assert comp.select(F.count_distinct("component")).first()[0] == 1

    # 4. as-of via the tx_log: before any edges existed
    bg.set_checkpoint_time(t0 + datetime.timedelta(days=9))
    assert bg.edges_df().count() == 0
    assert bg.vertices_df().count() == 6
