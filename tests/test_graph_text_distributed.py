"""Distributed graph-text parse (sources/graph_text.py) — parity with
the driver-side loaders on the TCK-style fixtures, and a multi-file
multi-MB export proving the scale path (VERDICT r6 item 7)."""

import json

import pytest
from pyspark.sql import functions as F

from fluxgraph_spark import OUT, TemporalGraph
from fluxgraph_spark.sources import load_gml, load_graphml, load_graphson
from fluxgraph_spark.sources.graph_text import (
    read_graph_distributed,
    read_graph_elements,
)

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

GML = """
graph [
  node [ id 1 label "marko" age 29 ]
  node [ id 2 label "vadas" age 27 ]
  edge [ source 1 target 2 label "knows" weight 0.5 ]
]
"""


def _driver_topology(g):
    """(orig-ish) topology + props from a driver-loaded TemporalGraph:
    {name_or_label: props}, {(src_prop, dst_prop, label)}."""
    vprops = {}
    for v in g.get_vertices():
        vprops[v.get_id()] = {k: v.get_property(k) for k in v.get_property_keys()}
    triples = set()
    for e in g.get_edges():
        row = e._require_row()
        triples.add((row["src"], row["dst"], e.get_label()))
    return vprops, triples


def test_graphml_distributed_parity(spark, tmp_path):
    p = tmp_path / "toy.graphml"
    p.write_text(GRAPHML)
    # driver path
    g = TemporalGraph.create(spark)
    id_map = load_graphml(g, str(p))
    vprops, triples = _driver_topology(g)
    # distributed path
    v, e = read_graph_distributed(spark, str(p), fmt="graphml")
    vrows = {r["original_id"]: r for r in v.collect()}
    erows = e.collect()
    assert set(vrows) == set(id_map)  # same original vertex ids
    assert len(erows) == len(triples)
    # per-vertex property parity (values via the type map)
    for orig, eng in id_map.items():
        want = vprops[eng]
        got = vrows[orig]["props"]
        types = vrows[orig]["prop_types"]
        assert set(got) == set(want)
        for k, val in want.items():
            cast = {"long": int, "double": float, "float": float,
                    "string": str, "boolean": lambda s: s == "true"}[types[k]]
            assert cast(got[k]) == pytest.approx(val) if isinstance(val, float) \
                else cast(got[k]) == val
    # edge topology parity through the engine-id remap
    eng_of = {r["original_id"]: r["id"] for r in v.collect()}
    driver_eng_to_orig = {v_: k for k, v_ in id_map.items()}
    want_triples = {
        (driver_eng_to_orig[s], driver_eng_to_orig[d], lbl)
        for s, d, lbl in triples
    }
    orig_of = {v_: k for k, v_ in eng_of.items()}
    got_triples = {
        (orig_of[r["src"]], orig_of[r["dst"]], r["label"]) for r in erows
    }
    assert got_triples == want_triples
    # edge props survive
    w = {r["original_id"]: r["props"].get("weight") for r in erows}
    assert float(w["7"]) == pytest.approx(0.5)


def test_graphson_distributed_parity(toy_graph, tmp_path):
    from fluxgraph_spark.sources import write_graphson

    g, vs, _ = toy_graph
    p = tmp_path / "g.json"
    write_graphson(g, str(p))
    # driver reload for reference
    g2 = TemporalGraph.create(g.spark)
    load_graphson(g2, str(p))
    v, e = read_graph_distributed(g.spark, str(p), fmt="graphson")
    assert v.count() == len(list(g2.get_vertices())) == 6
    assert e.count() == len(list(g2.get_edges())) == 6
    names = {r["props"]["name"] for r in v.collect()}
    assert names == {x.get_property("name") for x in g2.get_vertices()}
    marko = next(x for x in v.collect() if x["props"]["name"] == "marko")
    assert marko["prop_types"]["age"] == "long"
    assert int(marko["props"]["age"]) == 29
    knows = [r for r in e.collect() if r["label"] == "knows"]
    assert {r["src"] for r in knows} == {marko["id"]}


def test_gml_distributed_parity(spark, tmp_path):
    p = tmp_path / "g.gml"
    p.write_text(GML)
    g = TemporalGraph.create(spark)
    load_gml(g, str(p))
    v, e = read_graph_distributed(spark, str(p), fmt="gml")
    assert v.count() == 2 and e.count() == 1
    marko = next(r for r in v.collect() if r["props"].get("label") == "marko")
    assert int(marko["props"]["age"]) == 29
    (edge,) = e.collect()
    assert edge["label"] == "knows"
    assert float(edge["props"]["weight"]) == pytest.approx(0.5)
    assert edge["src"] == marko["id"] or edge["dst"] == marko["id"]


def test_multi_file_multi_mb_export(spark, tmp_path):
    """A sharded multi-MB GraphML export (the way big graphs arrive):
    per-file vertex numbering restarts at 0 — engine ids must not
    collide across shards — and the parse parallelizes at file
    granularity (one input partition per file)."""
    n_files, n_nodes = 8, 1200
    pad = "x" * 220  # push total bytes past ~2 MB
    d = tmp_path / "shards"
    d.mkdir()
    for f in range(n_files):
        rows = ['<?xml version="1.0"?>',
                '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
                '<key id="pad" for="node" attr.name="pad" attr.type="string"/>',
                '<graph id="G" edgedefault="directed">']
        for i in range(n_nodes):
            rows.append(f'<node id="{i}"><data key="pad">{pad}{f}:{i}</data></node>')
        for i in range(n_nodes - 1):
            rows.append(f'<edge source="{i}" target="{i + 1}" label="next"/>')
        rows.append("</graph></graphml>")
        (d / f"shard{f}.graphml").write_text("\n".join(rows))
    total_bytes = sum(p.stat().st_size for p in d.iterdir())
    assert total_bytes > 2_000_000
    elems = read_graph_elements(spark, str(d) + "/*.graphml", fmt="graphml")
    # file-granular parallelism: every shard parsed (binaryFile bin-packs
    # SMALL files into shared partitions; files are never split, so big
    # shards each get their own task)
    assert elems.select("source_file").distinct().count() == n_files
    v, e = read_graph_distributed(spark, str(d) + "/*.graphml", fmt="graphml")
    assert v.count() == n_files * n_nodes
    assert e.count() == n_files * (n_nodes - 1)
    # per-shard numbering reused orig ids 0..N; engine ids must be unique
    assert v.select("id").distinct().count() == n_files * n_nodes
    # edges resolve within their own shard: every engine endpoint exists
    missing = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .join(v.select("id"), "id", "left_anti")
        .count()
    )
    assert missing == 0
    # spot parity with the driver loader on one shard
    g = TemporalGraph.create(spark)
    id_map = load_graphml(g, str(d / "shard3.graphml"))
    assert len(id_map) == n_nodes
    shard3 = v.where(F.col("source_file").contains("shard3"))
    assert shard3.count() == n_nodes
    one = shard3.where(F.col("original_id") == "17").collect()[0]
    assert one["props"]["pad"] == f"{pad}3:17"


def test_bad_format_rejected(spark):
    with pytest.raises(ValueError, match="fmt must be"):
        read_graph_elements(spark, "/nonexistent/*.xml", fmt="dot")
