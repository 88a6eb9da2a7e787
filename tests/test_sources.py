"""Source/sink tests (S5-S7, parquet round-trip, tpch mapping)."""

import os

from fluxgraph_spark import IN, OUT, TemporalGraph
from fluxgraph_spark.sources import (
    DataFrameGraph,
    load_gml,
    load_graph_parquet,
    load_graphml,
    load_graphson,
    save_graph_parquet,
    tpch_graph,
    write_graphml,
    write_graphson,
)

SF_DIR = "/root/testdata/sf0.001"

GRAPHML = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <key id="name" for="node" attr.name="name" attr.type="string"/>
  <key id="age" for="node" attr.name="age" attr.type="int"/>
  <key id="weight" for="edge" attr.name="weight" attr.type="float"/>
  <graph id="G" edgedefault="directed">
    <node id="1"><data key="name">marko</data><data key="age">29</data></node>
    <node id="2"><data key="name">vadas</data><data key="age">27</data></node>
    <node id="3"><data key="name">lop</data></node>
    <edge id="7" source="1" target="2" label="knows"><data key="weight">0.5</data></edge>
    <edge id="9" source="1" target="3" label="created"><data key="weight">0.4</data></edge>
  </graph>
</graphml>
"""


def test_graphml_roundtrip(spark, tmp_path):
    p = tmp_path / "toy.graphml"
    p.write_text(GRAPHML)
    g = TemporalGraph.create(spark)
    id_map = load_graphml(g, str(p))
    assert len(id_map) == 3
    marko = next(g.get_vertices("name", "marko"))
    assert marko.get_property("age") == 29
    assert len(marko.get_edges(OUT)) == 2
    e = marko.get_edges(OUT, "knows")[0]
    assert abs(e.get_property("weight") - 0.5) < 1e-6
    # write + reload
    out = tmp_path / "out.graphml"
    write_graphml(g, str(out))
    g2 = TemporalGraph.create(spark)
    load_graphml(g2, str(out))
    assert sorted(v.get_property("name") for v in g2.get_vertices()) == ["lop", "marko", "vadas"]
    m2 = next(g2.get_vertices("name", "marko"))
    assert m2.get_property("age") == 29
    assert len(m2.get_edges(OUT, "created")) == 1


def test_graphson_roundtrip(toy_graph, tmp_path):
    g, vs, _ = toy_graph
    p = tmp_path / "g.json"
    write_graphson(g, str(p))
    g2 = TemporalGraph.create(g.spark)
    load_graphson(g2, str(p))
    assert len(list(g2.get_vertices())) == 6
    assert len(list(g2.get_edges())) == 6
    m = next(g2.get_vertices("name", "marko"))
    assert m.get_property("age") == 29
    assert sorted(v.get_property("name") for v in m.get_vertices(OUT, "knows")) == ["josh", "vadas"]


GML = """
graph [
  node [ id 1 label "marko" age 29 ]
  node [ id 2 label "vadas" age 27 ]
  edge [ source 1 target 2 label "knows" weight 0.5 ]
]
"""


def test_gml_load(spark, tmp_path):
    p = tmp_path / "g.gml"
    p.write_text(GML)
    g = TemporalGraph.create(spark)
    load_gml(g, str(p))
    vs = list(g.get_vertices())
    assert len(vs) == 2
    marko = next(g.get_vertices("label", "marko"))
    assert marko.get_property("age") == 29
    es = list(g.get_edges())
    assert len(es) == 1 and es[0].get_label() == "knows"
    assert abs(es[0].get_property("weight") - 0.5) < 1e-9


def test_parquet_roundtrip(toy_graph, tmp_path):
    g, vs, es = toy_graph
    # add history so the round-trip covers SCD2 + tx log
    vs["marko"].set_property("age", 30)
    path = str(tmp_path / "gdir")
    save_graph_parquet(g, path)
    g2 = load_graph_parquet(g.spark, path)
    m = next(g2.get_vertices("name", "marko"))
    assert m.get_property("age") == 30
    assert m.previous_version().get_property("age") == 29
    assert len(list(g2.get_edges())) == 6
    assert sorted(v.get_property("name") for v in m.get_vertices(OUT, "knows")) == ["josh", "vadas"]
    # new writes continue from the right tx/id counters
    v_new = g2.add_vertex()
    assert v_new.get_id() > max(v.get_id() for v in vs.values())


def test_tpch_graph_mapping(spark):
    from pyspark.sql import functions as F

    v, e = tpch_graph(spark, SF_DIR)
    kinds = {r["kind"]: r["n"] for r in v.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert kinds == {"customer": 150, "supplier": 10, "part": 200,
                     "order": 1500, "nation": 25, "region": 5}
    labels = {r["label"]: r["n"] for r in e.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert labels["placed_by"] == 1500
    assert labels["contains"] == 6000
    assert labels["located_in"] == 160
    assert labels["part_of"] == 25
    # ids disjoint across kinds and edges reference existing vertices
    assert v.select("id").distinct().count() == v.count()
    dangling = e.join(v.select(F.col("id").alias("vid")), e["src"] == F.col("vid"), "left_anti")
    assert dangling.count() == 0


def test_from_dataframes_bulk_ctor(spark):
    from fluxgraph_spark import TemporalGraph

    v, e = tpch_graph(spark, SF_DIR)
    g = TemporalGraph.from_dataframes(spark, v, e)
    assert g.read_only
    assert g.vertices_df().count() == v.count()
    assert "tx_from" in g.vertices_df(snapshot=False).columns


def test_sql_surface(spark):
    from fluxgraph_spark import TemporalGraph
    from pyspark.sql import functions as F

    v, e = tpch_graph(spark, SF_DIR)
    g = TemporalGraph.from_dataframes(spark, v, e)
    got = g.sql(
        """
        SELECT e.label, count(*) AS n
        FROM edges e JOIN vertices v ON e.src = v.id
        GROUP BY e.label ORDER BY e.label
        """
    )
    want = (
        e.join(v.select(F.col("id").alias("src")), "src")
        .groupBy("label").count().orderBy("label")
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_dataframe_graph_traversal(spark):
    from fluxgraph_spark.operators import traversal as TR
    from pyspark.sql import functions as F

    v, e = tpch_graph(spark, SF_DIR)
    g = DataFrameGraph(spark, v, e)
    frontier = g.vertices_df().where(F.col("kind") == "customer").select("id")
    nations = TR.hop(frontier, g.edges_df(), "out", labels=("located_in",))
    assert nations.distinct().count() <= 25
    deg = TR.degrees(g.edges_df().where(F.col("label") == "contains"), "out")
    assert deg.agg(F.sum("degree")).first()[0] == 6000
