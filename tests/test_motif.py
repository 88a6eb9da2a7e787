"""Motif finding (operators/motif.py): GraphFrames find() semantics —
binding/joining by shared names, anonymous elements, named-edge
structs, self-loop terms, negated terms as anti-joins, and the error
contract."""

import pytest
from pyspark.sql import functions as F

from fluxgraph_spark.operators.motif import find


@pytest.fixture()
def tiny(spark):
    v = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id long, kind string"
    )
    e = spark.createDataFrame(
        [(1, 2, "x"), (2, 3, "y"), (1, 3, "z"), (3, 3, "w"), (4, 1, "u")],
        "src long, dst long, label string",
    )
    return v, e


def test_motif_open_two_paths(tiny):
    v, e = tiny
    r = find(v, e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    got = sorted((x["a"]["id"], x["b"]["id"], x["c"]["id"]) for x in r.collect())
    # 1->2->3 closed by 1->3; every path ending in the 3->3 self loop is
    # closed by the respective edge into 3; only the paths through 4->1 stay
    assert got == [(4, 1, 2), (4, 1, 3)]


def test_motif_named_edges_and_attributes(tiny):
    v, e = tiny
    row = (
        find(v, e, "(a)-[e1]->(b)")
        .where(F.col("e1.label") == "x")
        .collect()[0]
    )
    assert (row["a"]["kind"], row["b"]["kind"], row["e1"]["label"]) == ("a", "b", "x")


def test_motif_self_loop_and_anonymous(tiny):
    v, e = tiny
    assert [r["s"]["id"] for r in find(v, e, "(s)-[]->(s)").collect()] == [3]
    # anonymous endpoints bind nothing: one row per edge
    assert find(v, e, "(a)-[]->()").count() == 5
    # disconnected components cross-join: |E| x |self-loops|
    assert find(v, e, "(a)-[]->(); (s)-[]->(s)").count() == 5


def test_motif_shared_name_chains(tiny):
    v, e = tiny
    # same middle vertex: plain 2-paths (incl. through the self loop)
    r = find(v, e, "(a)-[]->(b); (b)-[]->(c)")
    got = sorted((x["a"]["id"], x["b"]["id"], x["c"]["id"]) for x in r.collect())
    assert (1, 2, 3) in got and (4, 1, 2) in got and (3, 3, 3) in got


def test_motif_error_contract(tiny):
    v, e = tiny
    for bad in [
        "",                                  # empty
        "nonsense",                          # unparseable
        "(a)-[e]->(b); !(a)-[e2]->(b)",      # named edge in negation
        "!(q)-[]->(z)",                      # negation without bindings
        "(a)-[e]->(b); (b)-[e]->(c)",        # duplicate edge name
        "(a)-[c]->(b); (b)-[]->(c)",         # vertex reuses an edge name
        "(c)-[c]->(b)",                      # edge reuses its own vertex
    ]:
        with pytest.raises(ValueError):
            find(v, e, bad).collect()
