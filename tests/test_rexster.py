"""Rexster-shaped REST shim (SURVEY §2 S8) — pure routing + one real
HTTP round trip over a TemporalGraph built through the public API."""

import json
import urllib.request

import pytest

from fluxgraph_spark import TemporalGraph
from fluxgraph_spark.sources.rexster import RexsterShim, graph_from_location


@pytest.fixture(scope="module")
def shim(spark):
    g = TemporalGraph.create(spark)
    a = g.add_vertex()
    b = g.add_vertex()
    c = g.add_vertex()
    a.set_property("name", "alice")
    a.set_property("age", 30)
    b.set_property("name", "bob")
    e1 = g.add_edge(None, a, b, "knows")
    e1.set_property("weight", 2)
    g.add_edge(None, a, c, "likes")
    return RexsterShim(g, name="flux"), a, b, c, e1


def test_graph_metadata_and_listing(shim):
    s, *_ = shim
    status, body = s.handle("GET", "/graphs")
    assert status == 200 and body["graphs"] == ["flux"]
    status, body = s.handle("GET", "/graphs/flux")
    assert status == 200
    assert body["readOnly"] is True
    assert body["features"]["ignoresSuppliedIds"] is True
    status, body = s.handle("GET", "/graphs/nope")
    assert status == 404 and "could not be found" in body["message"]


def test_vertices_listing_lookup_and_paging(shim):
    s, a, b, c, _ = shim
    status, body = s.handle("GET", "/graphs/flux/vertices")
    assert status == 200 and body["totalSize"] == 3
    ids = {v["_id"] for v in body["results"]}
    assert ids == {a.id, b.id, c.id}
    # Rexster typed-value property lookup
    status, body = s.handle(
        "GET", "/graphs/flux/vertices", {"key": "age", "value": "(i,30)"}
    )
    assert [v["_id"] for v in body["results"]] == [a.id]
    assert body["results"][0]["name"] == "alice"
    # paging: offset window of 1
    status, body = s.handle(
        "GET", "/graphs/flux/vertices",
        {"rexster.offset.start": "1", "rexster.offset.end": "2"},
    )
    assert body["totalSize"] == 3 and len(body["results"]) == 1


def test_vertex_neighbors_and_edges(shim):
    s, a, b, c, e1 = shim
    status, body = s.handle("GET", f"/graphs/flux/vertices/{a.id}")
    assert status == 200 and body["results"]["name"] == "alice"
    # out neighbors, label-filtered
    status, body = s.handle(
        "GET", f"/graphs/flux/vertices/{a.id}/out", {"_label": "knows"}
    )
    assert [v["_id"] for v in body["results"]] == [b.id]
    # outE edges carry Rexster edge fields
    status, body = s.handle("GET", f"/graphs/flux/vertices/{a.id}/outE")
    got = {e["_label"]: e for e in body["results"]}
    assert set(got) == {"knows", "likes"}
    assert got["knows"]["_outV"] == a.id and got["knows"]["_inV"] == b.id
    assert got["knows"]["weight"] == 2
    # in direction from the far side
    status, body = s.handle("GET", f"/graphs/flux/vertices/{b.id}/in")
    assert [v["_id"] for v in body["results"]] == [a.id]


def test_edges_and_404s(shim):
    s, a, b, _, e1 = shim
    status, body = s.handle("GET", "/graphs/flux/edges", {"key": "label", "value": "knows"})
    assert status == 200 and [e["_id"] for e in body["results"]] == [e1.id]
    status, body = s.handle("GET", f"/graphs/flux/edges/{e1.id}")
    assert body["results"]["_label"] == "knows"
    status, body = s.handle("GET", "/graphs/flux/vertices/999999")
    assert status == 404 and "cannot be found" in body["message"]
    status, body = s.handle("GET", "/graphs/flux/edges/999999")
    assert status == 404


def test_read_only_verbs_rejected(shim):
    s, *_ = shim
    status, body = s.handle("POST", "/graphs/flux/vertices")
    assert status == 405 and "read-only" in body["message"]
    status, _ = s.handle("DELETE", "/graphs/flux/vertices/1")
    assert status == 405


def test_http_round_trip(shim):
    """One real socket round trip: ephemeral port, JSON envelope."""
    s, a, *_ = shim
    server = s.serve(port=0)
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/graphs/flux/vertices/{a.id}"
        ) as resp:
            assert resp.status == 200
            body = json.loads(resp.read())
        assert body["results"]["name"] == "alice"
        assert "queryTime" in body and "version" in body
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/graphs/flux/vertices/424242")
        assert ei.value.code == 404
    finally:
        server.shutdown()


def test_graph_from_location_contract(spark, tmp_path):
    """The reference's configureGraphInstance error + load path
    (FluxGraphConfiguration.java:28-42)."""
    with pytest.raises(ValueError, match="Missing or empty configuration"):
        graph_from_location(spark, "")
    with pytest.raises(ValueError, match="Missing or empty configuration"):
        graph_from_location(spark, None)
    from fluxgraph_spark.sources.parquet_io import save_graph_parquet

    g = TemporalGraph.create(spark)
    v1, v2 = g.add_vertex(), g.add_vertex()
    g.add_edge(None, v1, v2, "knows")
    save_graph_parquet(g, str(tmp_path / "g"))
    g2 = graph_from_location(spark, str(tmp_path / "g"))
    shim = RexsterShim(g2)
    status, body = shim.handle("GET", "/graphs/fluxgraph/vertices")
    assert status == 200 and body["totalSize"] == 2


def test_malformed_ids_and_paging(shim):
    s, *_ = shim
    status, body = s.handle("GET", "/graphs/flux/vertices/abc")
    assert status == 404 and "cannot be found" in body["message"]
    status, body = s.handle("GET", "/graphs/flux/edges/xyz")
    assert status == 404 and "cannot be found" in body["message"]
    status, body = s.handle(
        "GET", "/graphs/flux/vertices", {"rexster.offset.start": "foo"}
    )
    assert status == 400 and "malformed" in body["message"]


def test_gremlin_post_route(shim):
    """Rexster clients POST their Gremlin scripts; POST is accepted on
    the tp/gremlin route only (the scripts are read-only pipelines) —
    every other verb/route stays 405."""
    s, a, b, c, e1 = shim
    status, body = s.handle(
        "POST", "/graphs/flux/tp/gremlin",
        {"script": "g.V.has('name','alice').out.dedup.count()"},
    )
    assert status == 200 and body["success"] is True
    assert body["results"] == [{"count": 2}]
    status, body = s.handle("POST", "/graphs/flux/vertices")
    assert status == 405
    status, body = s.handle("DELETE", "/graphs/flux/tp/gremlin", {"script": "g.V"})
    assert status == 405


def test_gremlin_post_http_round_trip(shim):
    import urllib.request

    s, *_ = shim
    srv = s.serve(port=0)
    try:
        port = srv.server_address[1]
        payload = json.dumps(
            {"script": "g.V.has('name','alice').outE.label"}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/graphs/flux/tp/gremlin",
            data=payload,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            body = json.load(r)
        assert body["success"] is True
        assert sorted(x["label"] for x in body["results"]) == ["knows", "likes"]
    finally:
        srv.shutdown()


def test_post_body_variants_and_size_cap(shim):
    import urllib.error
    import urllib.request

    s, *_ = shim
    srv = s.serve(port=0)
    try:
        port = srv.server_address[1]
        url = f"http://127.0.0.1:{port}/graphs/flux/tp/gremlin"
        # classic form-encoded body works too
        req = urllib.request.Request(
            url, data=b"script=g.V.count()",
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            assert json.load(r)["results"] == [{"count": 3}]
        # numeric JSON params survive (stringified) — paging bound applies
        payload = json.dumps({"script": "g.V.order.id", "rexster.offset.end": 2}).encode()
        req = urllib.request.Request(
            url, data=payload,
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req) as r:
            assert len(json.load(r)["results"]) == 2
        # a client-declared multi-MB body is rejected before buffering
        big = urllib.request.Request(
            url, data=b"x" * 8, headers={"Content-Length": str(1 << 22)},
            method="POST",
        )
        try:
            urllib.request.urlopen(big, timeout=10)
            assert False, "expected HTTP 413"
        except urllib.error.HTTPError as ex:
            assert ex.code == 413
        except OSError:
            pass  # server may cut the connection on the oversized body
    finally:
        srv.shutdown()


def test_gremlin_runtime_error_returns_envelope(shim):
    """A script that parses but fails during Spark evaluation (ANSI cast
    failure at collect time) must come back as a JSON error envelope,
    not crash the handler (ADVICE r4)."""
    s, *_ = shim
    status, body = s.handle(
        "POST", "/graphs/flux/tp/gremlin",
        {"script": "g.V.has('age', T.gt, 'notanumber')"},
    )
    assert status == 500
    assert body["success"] is False and "CAST_INVALID_INPUT" in body["message"]


def test_malformed_content_length_returns_400(shim):
    """A non-numeric Content-Length header gets a 400 envelope instead
    of a dropped connection (ADVICE r4)."""
    import http.client

    s, *_ = shim
    srv = s.serve(port=0)
    try:
        port = srv.server_address[1]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.putrequest("POST", "/graphs/flux/tp/gremlin")
        conn.putheader("Content-Length", "not-a-number")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert "malformed Content-Length" in json.loads(resp.read())["message"]
        conn.close()
    finally:
        srv.shutdown()


def test_write_routes_gated_and_live(spark):
    """Rexster 2.x mutation routes (VERDICT r5 item 9): OFF by default
    (405), behind allow_writes=True they wire to the CRUD path with
    auto-commit semantics and the §2.10 error contract's 4xx mapping —
    including one real HTTP round trip."""
    g = TemporalGraph.create(spark)
    ro = RexsterShim(g, name="flux")
    status, body = ro.handle("POST", "/graphs/flux/vertices", {"name": "x"})
    assert status == 405 and "allow_writes" in body["message"]

    s = RexsterShim(g, name="flux", allow_writes=True)
    assert s.handle("GET", "/graphs/flux")[1]["readOnly"] is False

    # create two vertices (typed property), then an edge between them
    status, body = s.handle(
        "POST", "/graphs/flux/vertices", {"name": "alice", "age": "(i,30)"}
    )
    assert status == 200 and body["results"]["name"] == "alice"
    a_id = body["results"]["_id"]
    assert body["results"]["age"] == 30
    b_id = s.handle("POST", "/graphs/flux/vertices", {"name": "bob"})[1][
        "results"
    ]["_id"]
    status, body = s.handle(
        "POST", "/graphs/flux/edges",
        {"_outV": str(a_id), "_inV": str(b_id), "_label": "knows",
         "weight": "(d,0.5)"},
    )
    assert status == 200
    e_id = body["results"]["_id"]
    assert body["results"]["_label"] == "knows"
    assert body["results"]["weight"] == 0.5
    # the engine's auto-commit made it readable immediately
    assert g.get_edge(e_id).get_property("weight") == 0.5

    # property update on existing vertex; supplied-id create is ignored
    status, body = s.handle(
        "POST", f"/graphs/flux/vertices/{a_id}", {"age": "(i,31)"}
    )
    assert status == 200 and body["results"]["age"] == 31
    status, body = s.handle("POST", "/graphs/flux/vertices/424242", {"name": "z"})
    assert status == 200 and body["results"]["_id"] != 424242  # C1: id ignored

    # error contract: empty/reserved keys are engine ValueErrors -> 400
    status, body = s.handle("POST", f"/graphs/flux/vertices/{a_id}", {"id": "7"})
    assert status == 400 and "malformed request" in body["message"]
    # missing endpoint -> 404; missing required edge params -> 400
    status, _ = s.handle(
        "POST", "/graphs/flux/edges",
        {"_outV": "999999", "_inV": str(b_id), "_label": "x"},
    )
    assert status == 404
    status, _ = s.handle("POST", "/graphs/flux/edges", {"_outV": str(a_id)})
    assert status == 400

    # DELETE with params removes properties; bare DELETE removes element
    status, body = s.handle("DELETE", f"/graphs/flux/vertices/{a_id}", {"age": ""})
    assert status == 200 and "age" not in body["results"]
    status, _ = s.handle("DELETE", f"/graphs/flux/edges/{e_id}")
    assert status == 200 and g.get_edge(e_id) is None
    status, _ = s.handle("DELETE", f"/graphs/flux/vertices/{b_id}")
    assert status == 200 and g.get_vertex(b_id) is None
    status, _ = s.handle("DELETE", "/graphs/flux/vertices/424242")
    assert status == 404

    # live HTTP: POST a vertex through the stdlib server
    srv = s.serve(port=0)
    try:
        port = srv.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/graphs/flux/vertices?name=carol",
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        assert body["results"]["name"] == "carol"
        assert g.get_vertex(body["results"]["_id"]).get_property("name") == "carol"
        # writes stay gated on a read-only server
        ro_srv = RexsterShim(g, name="flux").serve(port=0)
        try:
            ro_port = ro_srv.server_address[1]
            req = urllib.request.Request(
                f"http://127.0.0.1:{ro_port}/graphs/flux/vertices?name=mallory",
                method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as ex:
                urllib.request.urlopen(req)
            assert ex.value.code == 405
        finally:
            ro_srv.shutdown()
    finally:
        srv.shutdown()
