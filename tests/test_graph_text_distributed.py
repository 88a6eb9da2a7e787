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


# ---------------------------------------------------------------------------
# distributed writers (r8 stretch): write -> distributed-read round trip
# ---------------------------------------------------------------------------

def _canon(v, e):
    """Canonical (vertices, edges) sets keyed by original ids, engine
    ids resolved back to originals — the layout-independent view.
    Type tags normalize float->double: GraphSON/GML carry no float tag
    (values stay exact; only GraphML preserves the narrower tag)."""
    def tags(m):
        return tuple(
            sorted((k, "double" if t == "float" else t) for k, t in (m or {}).items())
        )

    orig_of = {r["id"]: r["original_id"] for r in v.collect()}
    vset = {
        (r["original_id"], tuple(sorted((r["props"] or {}).items())),
         tags(r["prop_types"]))
        for r in v.collect()
    }
    eset = {
        (orig_of[r["src"]], orig_of[r["dst"]], r["label"],
         tuple(sorted((r["props"] or {}).items())),
         tags(r["prop_types"]))
        for r in e.collect()
    }
    return vset, eset


@pytest.mark.parametrize("fmt", ["graphml", "graphson", "gml"])
def test_write_read_roundtrip_classic(spark, tmp_path, fmt):
    """The classic toy graph survives write -> distributed read in every
    format, single shard: typed props, labels, topology all intact."""
    from fluxgraph_spark.sources.graph_text import write_graph_distributed

    p = tmp_path / "toy.graphml"
    p.write_text(GRAPHML)
    v, e = read_graph_distributed(spark, str(p), fmt="graphml")
    out = str(tmp_path / f"out_{fmt}")
    write_graph_distributed(
        v.selectExpr("original_id AS id", "props", "prop_types"),
        e.join(
            v.selectExpr("id AS src", "original_id AS osrc"), "src"
        ).join(
            v.selectExpr("id AS dst", "original_id AS odst"), "dst"
        ).selectExpr(
            "osrc AS src", "odst AS dst", "label",
            "original_id AS id", "props", "prop_types",
        ),
        out, fmt=fmt, n_shards=1,
    )
    v2, e2 = read_graph_distributed(
        spark, out + "/__shard=*/part-*", fmt=fmt, global_ids=True
    )
    assert _canon(v, e) == _canon(v2, e2)


def test_write_read_roundtrip_multi_shard_cross_edges(spark, tmp_path):
    """A multi-shard export with CROSS-SHARD edges round-trips exactly
    under global_ids=True: every vertex written once, edges co-located
    with their src shard but free to reference any shard's vertices;
    engine endpoints all resolve; a second write is byte-deterministic."""
    import glob as _glob

    from pyspark.sql import functions as FX

    from fluxgraph_spark.sources.graph_text import write_graph_distributed

    n = 200
    v = spark.range(n).select(
        FX.col("id"),
        FX.create_map(
            FX.lit("name"), FX.concat(FX.lit("v"), FX.col("id").cast("string")),
            FX.lit("rank"), FX.col("id").cast("string"),
        ).alias("props"),
        FX.create_map(
            FX.lit("name"), FX.lit("string"), FX.lit("rank"), FX.lit("long")
        ).alias("prop_types"),
    )
    # ring + skip edges: guaranteed to cross shard boundaries
    e = spark.range(n).select(
        FX.col("id").alias("src"),
        ((FX.col("id") + 1) % n).alias("dst"),
        FX.lit("next").alias("label"),
    ).unionByName(
        spark.range(0, n, 7).select(
            FX.col("id").alias("src"),
            ((FX.col("id") + 13) % n).alias("dst"),
            FX.lit("skip").alias("label"),
        )
    )
    out = str(tmp_path / "sharded")
    write_graph_distributed(v, e, out, fmt="graphml", n_shards=6)
    files = _glob.glob(out + "/__shard=*/part-*")
    assert len(files) == 6  # one self-contained document per shard
    v2, e2 = read_graph_distributed(
        spark, out + "/__shard=*/part-*", fmt="graphml", global_ids=True
    )
    assert v2.count() == n
    assert e2.count() == n + len(range(0, n, 7))
    # every engine endpoint resolves even across shards
    missing = (
        e2.select(FX.col("src").alias("id"))
        .union(e2.select(FX.col("dst").alias("id")))
        .join(v2.select("id"), "id", "left_anti")
        .count()
    )
    assert missing == 0
    # topology + typed props intact
    orig_of = {r["id"]: int(r["original_id"]) for r in v2.collect()}
    got = {
        (orig_of[r["src"]], orig_of[r["dst"]], r["label"]) for r in e2.collect()
    }
    want = {(i, (i + 1) % n, "next") for i in range(n)} | {
        (i, (i + 13) % n, "skip") for i in range(0, n, 7)
    }
    assert got == want
    r0 = next(r for r in v2.collect() if r["original_id"] == "0")
    assert r0["props"] == {"name": "v0", "rank": "0"}
    assert r0["prop_types"]["rank"] == "long"
    # determinism: a second write produces byte-identical shards
    out2 = str(tmp_path / "sharded2")
    write_graph_distributed(v, e, out2, fmt="graphml", n_shards=6)
    by_shard = lambda root: {
        f.split("__shard=")[1].split("/")[0]: open(f).read()
        for f in _glob.glob(root + "/__shard=*/part-*")
    }
    assert by_shard(out) == by_shard(out2)


def test_writer_contracts(spark, tmp_path):
    """Error contract: bad format / shard count raise; GML rejects
    boolean props and non-token keys; GraphSON rejects _-prefixed
    names; missing props columns default to empty maps."""
    from pyspark.sql import functions as FX

    from fluxgraph_spark.sources.graph_text import write_graph_distributed

    v = spark.range(3).select("id")
    e = spark.range(2).select(
        FX.col("id").alias("src"), (FX.col("id") + 1).alias("dst")
    )
    with pytest.raises(ValueError, match="fmt must be"):
        write_graph_distributed(v, e, str(tmp_path / "x"), fmt="dot")
    with pytest.raises(ValueError, match="n_shards"):
        write_graph_distributed(v, e, str(tmp_path / "x"), n_shards=0)
    # bare graph (no props, no label, no edge id) writes and reads back
    out = str(tmp_path / "bare")
    write_graph_distributed(v, e, out, fmt="gml", n_shards=2)
    v2, e2 = read_graph_distributed(
        spark, out + "/__shard=*/part-*", fmt="gml", global_ids=True
    )
    assert v2.count() == 3 and e2.count() == 2
    assert {r["label"] for r in e2.collect()} == {"edge"}

    bad_gml = spark.range(1).select(
        "id",
        FX.create_map(FX.lit("flag"), FX.lit("true")).alias("props"),
        FX.create_map(FX.lit("flag"), FX.lit("boolean")).alias("prop_types"),
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError), match="boolean"):
        write_graph_distributed(
            bad_gml, e.limit(0), str(tmp_path / "y"), fmt="gml", n_shards=1
        )
    bad_json = spark.range(1).select(
        "id",
        FX.create_map(FX.lit("_id"), FX.lit("x")).alias("props"),
        FX.create_map(FX.lit("_id"), FX.lit("string")).alias("prop_types"),
    )
    with pytest.raises((PythonException, Py4JJavaError), match="structural"):
        write_graph_distributed(
            bad_json, e.limit(0), str(tmp_path / "z"), fmt="graphson",
            n_shards=1,
        )


def test_renderers_reject_null_prop_values():
    """A null VALUE inside a props map must raise a clear ValueError
    naming the key and element (r9 ADVICE fix) — none of the text graph
    formats has a null literal, and the old behavior was an opaque
    TypeError inside the executor's Python worker."""
    from fluxgraph_spark.sources.graph_text import (
        render_gml_doc,
        render_graphml_doc,
        render_graphson_doc,
    )

    vrows = [
        {
            "orig_id": "v1",
            "props": {"name": None},
            "prop_types": {"name": "string"},
        }
    ]
    for fn in (render_graphml_doc, render_graphson_doc, render_gml_doc):
        with pytest.raises(ValueError, match="null value"):
            fn(vrows, [])


def test_writer_max_rows_per_shard_splits_oversized_shards(spark, tmp_path):
    """max_rows_per_shard (r9): a hash shard whose element count exceeds
    the cap splits into hash sub-shards — more output documents, every
    vertex still written exactly once, cross-(sub-)shard edges resolve,
    and the round trip is exact.  Splitting is semantics-free, so the
    capped export reads back identical to the uncapped one."""
    import glob as _glob

    from pyspark.sql import functions as FX

    from fluxgraph_spark.sources.graph_text import write_graph_distributed

    n = 120
    v = spark.range(n).select(
        FX.col("id"),
        FX.create_map(
            FX.lit("name"), FX.concat(FX.lit("v"), FX.col("id").cast("string"))
        ).alias("props"),
        FX.create_map(FX.lit("name"), FX.lit("string")).alias("prop_types"),
    )
    e = spark.range(n).select(
        FX.col("id").alias("src"),
        ((FX.col("id") + 1) % n).alias("dst"),
        FX.lit("next").alias("label"),
    )
    # n_shards=2 with 240 elements: both hash shards far exceed cap=25
    out = str(tmp_path / "capped")
    write_graph_distributed(
        v, e, out, fmt="graphml", n_shards=2, max_rows_per_shard=25
    )
    files = _glob.glob(out + "/__shard=*/part-*")
    assert len(files) > 2                 # oversized shards actually split
    v2, e2 = read_graph_distributed(
        spark, out + "/__shard=*/part-*", fmt="graphml", global_ids=True
    )
    assert v2.count() == n                # every vertex exactly once
    assert e2.count() == n
    missing = (
        e2.select(FX.col("src").alias("id"))
        .union(e2.select(FX.col("dst").alias("id")))
        .join(v2.select("id"), "id", "left_anti")
        .count()
    )
    assert missing == 0                   # sub-shard edges all resolve
    orig_of = {r["id"]: int(r["original_id"]) for r in v2.collect()}
    got = {(orig_of[r["src"]], orig_of[r["dst"]]) for r in e2.collect()}
    assert got == {(i, (i + 1) % n) for i in range(n)}
    # a cap that never binds is a no-op: same 2 files as uncapped
    out2 = str(tmp_path / "uncapped")
    write_graph_distributed(
        v, e, out2, fmt="graphml", n_shards=2, max_rows_per_shard=10_000
    )
    assert len(_glob.glob(out2 + "/__shard=*/part-*")) == 2
    with pytest.raises(ValueError, match="max_rows_per_shard"):
        write_graph_distributed(
            v, e, str(tmp_path / "bad"), fmt="graphml", n_shards=2,
            max_rows_per_shard=0,
        )
