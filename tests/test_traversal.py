"""Traversal tests (T1-T7): element-at-a-time API vs set-at-a-time
DataFrame joins must agree; 3-hop elements-touched matches a reference
implementation of the benchmark loop (FluxBenchmarkTestSuite.java:30-56)."""

import random

import pytest
from pyspark.sql import functions as F

from fluxgraph_spark import BOTH, IN, OUT, TemporalGraph
from fluxgraph_spark.operators import traversal as TR


def test_incident_edges_directions(toy_graph):
    g, vs, es = toy_graph
    marko = vs["marko"]
    assert {e.get_id() for e in marko.get_edges(OUT)} == {
        es["e1"].get_id(), es["e2"].get_id(), es["e3"].get_id()
    }
    assert marko.get_edges(IN) == []
    assert len(marko.get_edges(BOTH)) == 3
    lop = vs["lop"]
    assert len(lop.get_edges(IN)) == 3
    assert {e.get_id() for e in lop.get_edges(IN, "created")} == {
        es["e3"].get_id(), es["e5"].get_id(), es["e6"].get_id()
    }
    assert lop.get_edges(IN, "knows") == []


def test_one_hop_neighbors(toy_graph):
    g, vs, _ = toy_graph
    names = sorted(v.get_property("name") for v in vs["marko"].get_vertices(OUT))
    assert names == ["josh", "lop", "vadas"]
    knows = sorted(v.get_property("name") for v in vs["marko"].get_vertices(OUT, "knows"))
    assert knows == ["josh", "vadas"]
    both = vs["josh"].get_vertices(BOTH)
    assert sorted(v.get_property("name") for v in both) == ["lop", "marko", "ripple"]


def test_df_hop_matches_element_api(toy_graph, spark):
    g, vs, _ = toy_graph
    e_df = g.edges_df()
    frontier = spark.createDataFrame([(vs["marko"].get_id(),)], "id long")
    out_ids = sorted(
        r["id"] for r in TR.hop(frontier, e_df, OUT, broadcast_frontier=True).collect()
    )
    assert out_ids == sorted(v.get_id() for v in vs["marko"].get_vertices(OUT))
    labeled = TR.hop(frontier, e_df, OUT, labels=("knows",)).collect()
    assert sorted(r["id"] for r in labeled) == sorted(
        v.get_id() for v in vs["marko"].get_vertices(OUT, "knows")
    )
    both = TR.hop(frontier, e_df, BOTH).collect()
    assert len(both) == len(vs["marko"].get_vertices(BOTH))


def test_df_incident_edges(toy_graph, spark):
    g, vs, es = toy_graph
    e_df = g.edges_df()
    lop_front = spark.createDataFrame([(vs["lop"].get_id(),)], "id long")
    hits = TR.incident_edges(e_df, lop_front, IN, labels=("created",)).collect()
    assert {r["id"] for r in hits} == {es["e3"].get_id(), es["e5"].get_id(), es["e6"].get_id()}


def test_multi_hop(toy_graph, spark):
    g, vs, _ = toy_graph
    e_df = g.edges_df()
    frontier = spark.createDataFrame([(vs["marko"].get_id(),)], "id long")
    two = TR.multi_hop(frontier, e_df, [(OUT, ("knows",)), (OUT, ("created",))])
    # marko -knows-> {vadas, josh}; josh -created-> {ripple, lop}
    ids = sorted(r["id"] for r in two.collect())
    assert ids == sorted([vs["ripple"].get_id(), vs["lop"].get_id()])


def test_degrees(toy_graph):
    g, vs, _ = toy_graph
    deg = {r["id"]: r["degree"] for r in TR.degrees(g.edges_df(), OUT).collect()}
    assert deg[vs["marko"].get_id()] == 3
    assert deg[vs["josh"].get_id()] == 2
    both = {r["id"]: r["degree"] for r in TR.degrees(g.edges_df(), BOTH).collect()}
    assert both[vs["lop"].get_id()] == 3
    assert both[vs["josh"].get_id()] == 3


def _python_3hop_touch_count(vrows, erows):
    """Literal transcription of the benchmark's nested loops
    (FluxBenchmarkTestSuite.java:30-56): touch each vertex, its out-edges,
    their in-vertices, 3 levels deep."""
    out_edges = {}
    for e in erows:
        out_edges.setdefault(e["src"], []).append(e)
    count = 0

    def visit(vid, depth):
        nonlocal count
        count += 1  # vertex touched
        if depth == 3:
            return
        for e in out_edges.get(vid, ()):
            count += 1  # edge touched
            visit(e["dst"], depth + 1)

    for v in vrows:
        visit(v["id"], 0)
    return count


def test_elements_touched_3hop_small(toy_graph):
    g, _, _ = toy_graph
    v_rows = [r.asDict() for r in g.vertices_df().collect()]
    e_rows = [r.asDict() for r in g.edges_df().collect()]
    expected = _python_3hop_touch_count(v_rows, e_rows)
    got = TR.elements_touched_3hop(g.vertices_df(), g.edges_df())
    assert got == expected


def test_elements_touched_3hop_gd_shaped(spark):
    """Synthetic Grateful-Dead-shaped graph (FIXTURES.md §2 cardinalities,
    deterministic seed): DataFrame join-chain count == nested-loop count."""
    rnd = random.Random(42)
    n_v = 200
    vrows = [{"id": i} for i in range(1, n_v + 1)]
    erows = []
    for eid in range(1000, 1000 + 1600):
        erows.append(
            {
                "id": eid,
                "src": rnd.randint(1, n_v),
                "dst": rnd.randint(1, n_v),
                "label": rnd.choice(["followed_by", "sung_by", "written_by"]),
            }
        )
    v_df = spark.createDataFrame([(r["id"],) for r in vrows], "id long")
    e_df = spark.createDataFrame(
        [(r["id"], r["src"], r["dst"], r["label"]) for r in erows],
        "id long, src long, dst long, label string",
    )
    expected = _python_3hop_touch_count(vrows, erows)
    got = TR.elements_touched_3hop(v_df, e_df)
    assert got == expected


def test_query_builder(toy_graph):
    g, vs, es = toy_graph
    marko, josh = vs["marko"], vs["josh"]
    assert marko.query().direction(OUT).labels("knows").count() == 2
    # interval: start inclusive, end exclusive
    hits = marko.query().direction(OUT).interval("weight", 0.4, 1.0).edges()
    assert {e.get_id() for e in hits} == {es["e1"].get_id(), es["e3"].get_id()}
    # has with compare
    from fluxgraph_spark.operators.query_builder import GREATER_THAN_EQUAL

    ge = marko.query().direction(OUT).has("weight", GREATER_THAN_EQUAL, 0.5).edges()
    assert {e.get_id() for e in ge} == {es["e1"].get_id(), es["e2"].get_id()}
    # limit
    assert len(marko.query().direction(OUT).limit(2).edges()) == 2
    # vertices() returns opposite endpoints
    names = sorted(v.get_property("name") for v in josh.query().direction(OUT).labels("created").vertices())
    assert names == ["lop", "ripple"]
    # has_not
    assert marko.query().direction(OUT).has_not("weight", 0.5).count() == 2


def test_query_builder_df_equivalent(toy_graph):
    from fluxgraph_spark.operators.query_builder import EQUAL, edge_query_df

    g, vs, es = toy_graph
    df = edge_query_df(
        g.edges_df(),
        vertex_id=vs["marko"].get_id(),
        direction=OUT,
        intervals=[("weight", 0.4, 1.0)],
    )
    assert {r["id"] for r in df.collect()} == {es["e1"].get_id(), es["e3"].get_id()}
    df2 = edge_query_df(g.edges_df(), labels=("created",), has=[("weight", EQUAL, None)])
    assert df2.count() == 0


# ---------------------------------------------------------------------------
# fluent traversal DSL
# ---------------------------------------------------------------------------

def test_fluent_traversal_classic_graph(toy_graph):
    from fluxgraph_spark.operators.fluent import Traversal

    g, vs, es = toy_graph
    t = Traversal(g.vertices_df(), g.edges_df())

    # marko's out-neighbors over 'knows' = vadas, josh
    names = {
        r["name__string"]
        for r in t.V().has("name__string", "marko").out("knows")
        .values("name__string").collect()
    }
    assert names == {"vadas", "josh"}

    # who created software marko knows?  marko ->knows-> X ->created-> SW
    sw = t.V().has("name__string", "marko").out("knows").out("created")
    # josh created ripple and lop => bag of 2 (duplicates preserved)
    assert sw.count() == 2
    assert sw.dedup().count() == 2

    # everything that created lop, via edge steps
    creators = {
        r["name__string"]
        for r in t.V().has("name__string", "lop").in_e("created").out_v()
        .values("name__string").collect()
    }
    assert creators == {"marko", "josh", "peter"}

    # has_not + interval compose as scan predicates
    aged = t.V().interval("age__long", 28, 33).values("name__string").collect()
    assert {r["name__string"] for r in aged} == {"marko", "josh"}

    # both() keeps bag semantics: josh touches marko(in), ripple+lop(out)
    assert t.V().has("name__string", "josh").both().count() == 3


def test_fluent_traversal_matches_multi_hop(spark):
    """DSL chain == TR.multi_hop over a random graph (set-at-a-time
    equivalence, bag semantics included)."""
    from fluxgraph_spark.operators.fluent import Traversal

    random.seed(7)
    n = 60
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [
            (i, random.randrange(n), random.randrange(n),
             random.choice(["a", "b"]))
            for i in range(300)
        ],
        "id long, src long, dst long, label string",
    )
    t = Traversal(verts, edges)
    got = sorted(
        r["id"]
        for r in t.V().where(F.col("id") < 5).out("a").out().df().collect()
    )
    start = verts.where(F.col("id") < 5).select("id")
    want = sorted(
        r["id"]
        for r in TR.multi_hop(start, edges, [(TR.OUT, ("a",)), (TR.OUT, ())])
        .collect()
    )
    assert got == want and len(got) > 0
