"""Graph/element difference tests (P10, P11, S9) — golden fact-level
assertions incl. orphan pruning and original_id remap (FluxUtil.java:243-319)."""

import datetime

import pytest

from fluxgraph_spark import IN, OUT, TemporalGraph, WorkingSet

T0 = datetime.datetime(2021, 6, 1)


def ts(n):
    return T0 + datetime.timedelta(days=n)


@pytest.fixture()
def diff_graph(spark):
    g = TemporalGraph.create(spark)
    g.set_transaction_time(ts(1))
    v1, v2, v3 = g.add_vertex(), g.add_vertex(), g.add_vertex()
    v1.set_property("name", "alice")
    e1 = g.add_edge(None, v1, v2, "knows")
    # --- d1 = day 2: alice + edge present; v3 bare ---
    g.set_transaction_time(ts(3))
    v1.set_property("name", "alicia")
    g.remove_edge(e1)
    # --- d2 = day 4: alicia, no edge ---
    g.set_transaction_time(None)
    return g, v1, v2, v3, e1


def test_working_set_difference(diff_graph):
    g, v1, v2, v3, e1 = diff_graph
    ws = WorkingSet([v1.get_id(), v2.get_id(), v3.get_id()], [e1.get_id()])
    d = g.difference(ws, ts(2), ts(4))
    # remapped graph: alice-version vertex, endpoint vertex, the removed edge
    verts = list(d.get_vertices())
    edges = list(d.get_edges())
    assert len(verts) == 2 and len(edges) == 1
    by_orig = {v.get_property("original_id"): v for v in verts}
    assert set(by_orig) == {v1.get_id(), v2.get_id()}  # v3 orphan-pruned
    assert by_orig[v1.get_id()].get_property("name") == "alice"
    # new ids differ from originals; edge endpoints remapped consistently
    de = edges[0]
    assert de.get_property("original_id") == e1.get_id()
    assert de.get_label() == "knows"
    assert de.get_vertex(OUT).get_id() == by_orig[v1.get_id()].get_id()
    assert de.get_vertex(IN).get_id() == by_orig[v2.get_id()].get_id()


def test_difference_graph_is_immutable(diff_graph):
    g, v1, v2, v3, e1 = diff_graph
    ws = WorkingSet([v1.get_id()], [])
    d = g.difference(ws, ts(2), ts(4))
    with pytest.raises(RuntimeError):
        d.add_vertex()
    with pytest.raises(RuntimeError):
        d.set_transaction_time(ts(1))


def test_identical_dates_empty_difference(diff_graph):
    g, v1, v2, v3, e1 = diff_graph
    ws = WorkingSet([v1.get_id(), v2.get_id()], [e1.get_id()])
    d = g.difference(ws, ts(2), ts(2))
    assert list(d.get_vertices()) == []
    assert list(d.get_edges()) == []


def test_element_difference(diff_graph):
    """P11: v1@d1 vs v1@d2 — vertex facts include incident edge topology
    (FluxVertex.java:130-148)."""
    g, v1, v2, v3, e1 = diff_graph
    a = g.as_of(ts(2)).get_vertex(v1.get_id())
    b = g.as_of(ts(4)).get_vertex(v1.get_id())
    d = g.difference(a, b)
    verts = list(d.get_vertices())
    edges = list(d.get_edges())
    assert len(edges) == 1 and edges[0].get_property("original_id") == e1.get_id()
    origs = {v.get_property("original_id") for v in verts}
    assert origs == {v1.get_id(), v2.get_id()}
    names = {v.get_property("name") for v in verts}
    assert "alice" in names  # the changed property fact survives


def test_dataframe_fact_diff_matches_driver(diff_graph, spark):
    """The set-at-a-time anti-join diff agrees with the exact driver-side
    semantics on non-type facts."""
    from fluxgraph_spark.operators import diff as D

    g, v1, v2, v3, e1 = diff_graph
    s1, s2 = g.as_of(ts(2)), g.as_of(ts(4))
    f1 = D.explode_facts(s1.vertices_df(), "vertex").unionByName(
        D.explode_facts(s1.edges_df(), "edge")
    )
    f2 = D.explode_facts(s2.vertices_df(), "vertex").unionByName(
        D.explode_facts(s2.edges_df(), "edge")
    )
    out = {
        (r["id"], r["attr"], r["value_str"])
        for r in D.facts_difference_df(f1, f2).collect()
    }
    # the changed name fact and the removed edge's topology facts survive
    assert (v1.get_id(), "name__string", "alice") in out
    assert (e1.get_id(), ":graph.edge/label", "knows") in out
    assert (e1.get_id(), ":graph.edge/outVertex", str(v1.get_id())) in out
    # unchanged-at-both-dates facts are absent
    assert not any(r[0] == v3.get_id() for r in out)
