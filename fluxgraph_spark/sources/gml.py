"""GML source (S7) — minimal Graph Modelling Language reader
(GMLReaderTestSuite, FluxGraphTest.java:69-73).

Grammar subset: ``graph [ node [ id N <k v>... ] edge [ source N target N
label "s" <k v>... ] ]`` with quoted strings, ints, floats.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from ..graph import TemporalGraph

_TOKEN = re.compile(r'"(?:[^"\\]|\\.)*"|\[|\]|[^\s\[\]]+')


def _tokenize(text: str) -> list[str]:
    return _TOKEN.findall(text)


def _parse_value(tok: str) -> Any:
    if tok.startswith('"'):
        return tok[1:-1].replace('\\"', '"')
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return tok


def _parse_block(tokens: list[str], i: int) -> tuple[dict, int]:
    """Parse after an opening '[' up to its matching ']'. Returns (dict, next)."""
    out: dict = {}
    while i < len(tokens):
        tok = tokens[i]
        if tok == "]":
            return out, i + 1
        key = tok
        i += 1
        if tokens[i] == "[":
            sub, i = _parse_block(tokens, i + 1)
            out.setdefault(key, []).append(sub) if key in ("node", "edge") else out.update({key: sub})
        else:
            val = _parse_value(tokens[i])
            i += 1
            if key in ("node", "edge"):
                out.setdefault(key, []).append(val)
            else:
                out[key] = val
    return out, i


def load_gml(graph: "TemporalGraph", path: str) -> dict:
    with open(path) as fh:
        tokens = _tokenize(fh.read())
    # find 'graph ['
    i = 0
    doc: dict = {}
    while i < len(tokens):
        if tokens[i] == "graph" and i + 1 < len(tokens) and tokens[i + 1] == "[":
            doc, i = _parse_block(tokens, i + 2)
            break
        i += 1
    id_map: dict = {}
    for node in doc.get("node", []):
        v = graph.add_vertex()
        id_map[node["id"]] = v.get_id()
        for k, val in node.items():
            if k != "id":
                v.set_property(k, val)
    for edge in doc.get("edge", []):
        src = graph.get_vertex(id_map[edge["source"]])
        dst = graph.get_vertex(id_map[edge["target"]])
        e = graph.add_edge(None, src, dst, str(edge.get("label", "edge")))
        for k, val in edge.items():
            if k not in ("source", "target", "label"):
                e.set_property(k, val)
    return id_map
