"""GraphML source/sink (S5) — the format the reference's TCK loads its
fixture graphs from (GraphMLReaderTestSuite, FluxGraphTest.java:57-61;
benchmark graph at FluxBenchmarkTestSuite.java:24).

Driver-side XML parse (fixture graphs are small); the bulk path for huge
graphs is parquet (parquet_io.py).  Supplied ids are remapped because the
engine ignores them (ignoresSuppliedIds, FluxGraph.java:59) — the
returned mapping lets callers resolve originals.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from ..graph import TemporalGraph

_NS = "{http://graphml.graphdrawing.org/xmlns}"

_TYPE_MAP = {
    "string": "string",
    "boolean": "boolean",
    "int": "long",      # widened, like the reference (FluxUtil.java:26)
    "long": "long",
    "float": "float",
    "double": "double",
}


def _parse_value(raw: str, gtype: str):
    if gtype == "boolean":
        return raw == "true"
    if gtype in ("int", "long"):
        return int(raw)
    if gtype in ("float", "double"):
        return float(raw)
    return raw


def load_graphml(graph: "TemporalGraph", path: str) -> dict[str, int]:
    """Populate ``graph`` from a GraphML file; returns original-id ->
    engine-id mapping for vertices."""
    tree = ET.parse(path)
    root = tree.getroot()
    keys: dict[str, tuple[str, str]] = {}  # key id -> (attr name, graphml type)
    for k in root.iter(f"{_NS}key"):
        keys[k.get("id")] = (k.get("attr.name", k.get("id")), k.get("attr.type", "string"))
    id_map: dict[str, int] = {}
    for node in root.iter(f"{_NS}node"):
        v = graph.add_vertex()
        id_map[node.get("id")] = v.get_id()
        for data in node.findall(f"{_NS}data"):
            name, gtype = keys.get(data.get("key"), (data.get("key"), "string"))
            v.set_property(name, _parse_value(data.text or "", gtype), _TYPE_MAP[gtype])
    for edge in root.iter(f"{_NS}edge"):
        src = graph.get_vertex(id_map[edge.get("source")])
        dst = graph.get_vertex(id_map[edge.get("target")])
        label = edge.get("label") or "edge"
        e = graph.add_edge(None, src, dst, label)
        for data in edge.findall(f"{_NS}data"):
            name, gtype = keys.get(data.get("key"), (data.get("key"), "string"))
            if name == "label":
                continue
            e.set_property(name, _parse_value(data.text or "", gtype), _TYPE_MAP[gtype])
    return id_map


_REV_TYPE = {"string": "string", "boolean": "boolean", "long": "long",
             "bigint": "long", "float": "float", "double": "double",
             "bigdec": "double", "uuid": "string", "uri": "string"}


def write_graphml(graph: "TemporalGraph", path: str) -> None:
    """Serialize the current snapshot to GraphML."""
    from .. import model as M

    root = ET.Element("graphml", xmlns="http://graphml.graphdrawing.org/xmlns")
    key_defs: dict[tuple[str, str, str], str] = {}

    def key_id(name: str, suffix: str, domain: str) -> str:
        kk = (name, suffix, domain)
        if kk not in key_defs:
            kid = f"k{len(key_defs)}"
            key_defs[kk] = kid
            el = ET.SubElement(root, "key", id=kid)
            el.set("for", domain)
            el.set("attr.name", name)
            el.set("attr.type", _REV_TYPE[suffix])
        return key_defs[kk]

    gel = ET.SubElement(root, "graph", id="G", edgedefault="directed")
    for v in graph.get_vertices():
        nel = ET.SubElement(gel, "node", id=str(v.get_id()))
        row = v._require_row()
        for col, val in row["props"].items():
            if val is None:
                continue
            name, suffix = M.demangle(col)
            del_ = ET.SubElement(nel, "data", key=key_id(name, suffix, "node"))
            del_.text = _to_text(val)
    for e in graph.get_edges():
        row = e._require_row()
        eel = ET.SubElement(
            gel, "edge", id=str(e.get_id()), source=str(row["src"]),
            target=str(row["dst"]), label=row["label"],
        )
        for col, val in row["props"].items():
            if val is None:
                continue
            name, suffix = M.demangle(col)
            del_ = ET.SubElement(eel, "data", key=key_id(name, suffix, "edge"))
            del_.text = _to_text(val)
    ET.ElementTree(root).write(path, xml_declaration=True, encoding="utf-8")


def _to_text(val) -> str:
    if isinstance(val, bool):
        return "true" if val else "false"
    return str(val)
