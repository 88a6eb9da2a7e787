"""CRUD + property + feature-contract tests (SURVEY.md §2.2, §2.10 —
the Blueprints TCK intent: VertexTestSuite/EdgeTestSuite/GraphTestSuite)."""

import decimal
import uuid

import pytest

from fluxgraph_spark import BOTH, IN, OUT, TemporalGraph
from fluxgraph_spark.model import UnsupportedTypeError


def test_add_vertex_ignores_supplied_id(spark):
    g = TemporalGraph.create(spark)
    v = g.add_vertex(999)
    assert v.get_id() != 999
    assert g.get_vertex(v.get_id()) is not None


def test_add_edge_and_endpoints(spark):
    g = TemporalGraph.create(spark)
    a, b = g.add_vertex(), g.add_vertex()
    e = g.add_edge(None, a, b, "knows")
    assert e.get_label() == "knows"
    assert e.get_vertex(OUT).get_id() == a.get_id()
    assert e.get_vertex(IN).get_id() == b.get_id()
    with pytest.raises(ValueError):
        e.get_vertex(BOTH)


def test_get_vertex_null_id_throws(spark):
    g = TemporalGraph.create(spark)
    with pytest.raises(ValueError):
        g.get_vertex(None)
    with pytest.raises(ValueError):
        g.get_edge(None)
    assert g.get_vertex("not-a-number") is None


def test_property_roundtrip_types(spark):
    g = TemporalGraph.create(spark)
    v = g.add_vertex()
    v.set_property("s", "hello")
    v.set_property("b", True)
    v.set_property("l", 42)
    v.set_property("d", 1.5)
    v.set_property("dec", decimal.Decimal("1.25"))
    u = uuid.uuid5(uuid.NAMESPACE_DNS, "x")
    v.set_property("u", u)
    assert v.get_property("s") == "hello"
    assert v.get_property("b") is True
    assert v.get_property("l") == 42
    assert v.get_property("d") == 1.5
    assert v.get_property("dec") == decimal.Decimal("1.25")
    assert v.get_property("u") == str(u)
    assert v.get_property_keys() == {"s", "b", "l", "d", "dec", "u"}


def test_property_rejects_unsupported_types(spark):
    g = TemporalGraph.create(spark)
    v = g.add_vertex()
    for bad in ([1, 2], {"a": 1}, (1,), {1, 2}, b"bytes"):
        with pytest.raises(UnsupportedTypeError):
            v.set_property("p", bad)


def test_property_key_validation(spark):
    g = TemporalGraph.create(spark)
    a, b = g.add_vertex(), g.add_vertex()
    e = g.add_edge(None, a, b, "x")
    with pytest.raises(ValueError):
        a.set_property("", 1)
    with pytest.raises(ValueError):
        a.set_property("id", 1)
    with pytest.raises(ValueError):
        e.set_property("label", "y")
    # 'label' IS allowed on vertices (reference restricts it to edges only)
    a.set_property("label", "fine")
    assert a.get_property("label") == "fine"


def test_property_type_change_single_live_value(spark):
    """Same key, new type: old-typed fact retracted, at most one live value
    (reference FluxElement.java:123-130)."""
    g = TemporalGraph.create(spark)
    v = g.add_vertex()
    v.set_property("x", 1)
    v.set_property("x", "one")
    assert v.get_property("x") == "one"
    assert v.get_property_keys() == {"x"}
    # historical version still carries the long-typed value
    prev = v.previous_version()
    assert prev.get_property("x") == 1


def test_remove_property_returns_old_value(spark):
    g = TemporalGraph.create(spark)
    v = g.add_vertex()
    v.set_property("x", 7)
    assert v.remove_property("x") == 7
    assert v.get_property("x") is None
    assert v.remove_property("x") is None  # absent: no-op, no bump


def test_remove_vertex_cascades_edges(toy_graph):
    g, vs, es = toy_graph
    g.remove_vertex(vs["lop"])
    assert g.get_vertex(vs["lop"].get_id()) is None
    remaining = {e.get_id() for e in g.get_edges()}
    assert es["e3"].get_id() not in remaining
    assert es["e5"].get_id() not in remaining
    assert es["e6"].get_id() not in remaining
    assert es["e1"].get_id() in remaining


def test_duplicate_edges_and_self_loops(spark):
    g = TemporalGraph.create(spark)
    a, b = g.add_vertex(), g.add_vertex()
    g.add_edge(None, a, b, "knows")
    g.add_edge(None, a, b, "knows")
    loop = g.add_edge(None, a, a, "self")
    assert len(a.get_edges(OUT, "knows")) == 2
    # self-loop shows up twice under BOTH (MultiIterable concatenation)
    assert sum(1 for e in a.get_edges(BOTH) if e.get_id() == loop.get_id()) == 2


def test_lookup_by_property_typed(toy_graph):
    g, vs, _ = toy_graph
    found = list(g.get_vertices("name", "marko"))
    assert len(found) == 1 and found[0].get_id() == vs["marko"].get_id()
    assert list(g.get_vertices("age", "29")) == []  # string probe ≠ long fact
    assert len(list(g.get_vertices("age", 29))) == 1
    assert len(list(g.get_edges("label", "created"))) == 4


def test_indexed_count(toy_graph):
    g, _, _ = toy_graph
    assert g.count("vertex", "lang", "java") == 2
    assert g.count("edge", "label", "knows") == 2
    assert g.count("vertex", "nope", "x") == 0


def test_clear(toy_graph):
    g, _, _ = toy_graph
    g.clear()
    assert list(g.get_vertices()) == []
    assert list(g.get_edges()) == []


def test_key_index_manifest(spark):
    g = TemporalGraph.create(spark)
    g.create_key_index("name", "vertex")
    assert g.get_indexed_keys("vertex") == {"name"}
    g.drop_key_index("name", "vertex")
    assert g.get_indexed_keys("vertex") == set()
    with pytest.raises(NotImplementedError):
        g.index_put("k", "v")


def test_features_contract(spark):
    from fluxgraph_spark import FEATURES

    assert FEATURES["ignoresSuppliedIds"] is True
    assert FEATURES["supportsTransactions"] is False
    assert FEATURES["supportsSelfLoops"] is True
    assert FEATURES["supportsDuplicateEdges"] is True
    assert FEATURES["supportsMapProperty"] is False


def test_dataframe_views(toy_graph):
    g, _, _ = toy_graph
    v_df = g.vertices_df()
    e_df = g.edges_df()
    assert v_df.count() == 6
    assert e_df.count() == 6
    assert set(v_df.columns) >= {"id", "tx_from", "tx_to"}
    names = {r["name__string"] for r in v_df.collect()}
    assert names == {"marko", "vadas", "lop", "josh", "ripple", "peter"}
    # full history has more rows than the snapshot (version bumps)
    assert g.vertices_df(snapshot=False).count() > 6
    assert g.tx_log_df().count() > 0
