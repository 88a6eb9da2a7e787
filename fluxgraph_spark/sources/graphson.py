"""GraphSON 1.0 source/sink (S6) — the Blueprints JSON graph format the
TCK round-trips (GraphSONReaderTestSuite, FluxGraphTest.java:63-67).

Shape: ``{"graph": {"mode": "NORMAL", "vertices": [{"_id", "_type",
<props>}], "edges": [{"_id", "_type", "_outV", "_inV", "_label",
<props>}]}}``.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from ..graph import TemporalGraph


def load_graphson(graph: "TemporalGraph", path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    body = doc.get("graph", doc)
    id_map: dict = {}
    for vdoc in body.get("vertices", []):
        v = graph.add_vertex()
        id_map[vdoc["_id"]] = v.get_id()
        for k, val in vdoc.items():
            if not k.startswith("_"):
                v.set_property(k, val)
    for edoc in body.get("edges", []):
        src = graph.get_vertex(id_map[edoc["_outV"]])
        dst = graph.get_vertex(id_map[edoc["_inV"]])
        e = graph.add_edge(None, src, dst, edoc.get("_label", "edge"))
        for k, val in edoc.items():
            if not k.startswith("_"):
                e.set_property(k, val)
    return id_map


def write_graphson(graph: "TemporalGraph", path: str) -> None:
    from .. import model as M

    def props_of(el) -> dict:
        row = el._require_row()
        out = {}
        for col, val in row["props"].items():
            if val is not None:
                out[M.demangle(col)[0]] = float(val) if hasattr(val, "is_finite") else val
        return out

    vertices = []
    for v in graph.get_vertices():
        d = {"_id": v.get_id(), "_type": "vertex"}
        d.update(props_of(v))
        vertices.append(d)
    edges = []
    for e in graph.get_edges():
        row = e._require_row()
        d = {
            "_id": e.get_id(),
            "_type": "edge",
            "_outV": row["src"],
            "_inV": row["dst"],
            "_label": row["label"],
        }
        d.update(props_of(e))
        edges.append(d)
    with open(path, "w") as fh:
        json.dump({"graph": {"mode": "NORMAL", "vertices": vertices, "edges": edges}}, fh)
