"""Distributed parse for the graph TEXT formats (GraphML / GraphSON /
GML) — the scale path for multi-file or large exports (VERDICT r6
"missing" #2: the driver-side loaders in graphml.py / graphson.py /
gml.py are faithful to the reference's library-side fixture loaders,
FluxGraphTest.java:57-73, but a single-machine bottleneck past a few
hundred MB).

Same house pattern as the WARC source (warc.py): one task per file via
Spark's ``binaryFile`` source, the whole parse executor-side through
``mapInPandas`` (this module ships BY VALUE — executors don't have the
package on PYTHONPATH), rows landing in ONE unified element schema so a
single pass over the bytes yields both element kinds.  The parsed frame
is persisted and split into (vertices, edges) DataFrames whose engine
ids are deterministic hashes of (source_file, original id) — the engine
ignores supplied ids (FluxGraph.java:59), and at 100 TB an id remap
must be a pure column expression, not a driver-side dict.  Originals
ride along as ``original_id`` (the difference-sink convention).

A directory of per-shard exports (the way big graphs actually arrive)
parallelizes at file granularity; the driver loaders remain the
element-at-a-time CRUD path for the TCK fixtures.
"""

from __future__ import annotations

import io
import json
import xml.etree.ElementTree as ET
from typing import TYPE_CHECKING, Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

_NS = "{http://graphml.graphdrawing.org/xmlns}"

ELEMENT_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),        # 'vertex' | 'edge'
        T.StructField("source_file", T.StringType(), False),
        T.StructField("orig_id", T.StringType(), True),
        T.StructField("src", T.StringType(), True),          # edges only
        T.StructField("dst", T.StringType(), True),
        T.StructField("label", T.StringType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("prop_types", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_ROW = Tuple[str, str, Optional[str], Optional[str], Optional[str],
             Optional[str], dict, dict]


def _register_by_value() -> None:
    """Ship this module (and the GML tokenizer it reuses) by value into
    the mapInPandas closures — the executor Python has no
    fluxgraph_spark on its path (empirically verified; same mechanism
    as codecs.py / warc.py)."""
    import sys

    import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


# ---------------------------------------------------------------------------
# per-format byte parsers (executor-side, pure functions of the file bytes)
# ---------------------------------------------------------------------------

def _render(val) -> Tuple[str, str]:
    """(string form, type tag) for a parsed property value — the unified
    schema carries strings; the type map says how to cast back."""
    if isinstance(val, bool):
        return ("true" if val else "false", "boolean")
    if isinstance(val, int):
        return (str(val), "long")
    if isinstance(val, float):
        return (repr(val), "double")
    return (str(val), "string")


def parse_graphml_bytes(path: str, data: bytes) -> Iterator[_ROW]:
    """GraphML: key declarations drive the type tags (same widening as
    the driver loader, graphml.py _TYPE_MAP / FluxUtil.java:26)."""
    root = ET.parse(io.BytesIO(data)).getroot()
    keys = {}
    for k in root.iter(f"{_NS}key"):
        keys[k.get("id")] = (
            k.get("attr.name", k.get("id")),
            k.get("attr.type", "string"),
        )
    type_map = {"string": "string", "boolean": "boolean", "int": "long",
                "long": "long", "float": "float", "double": "double"}
    for node in root.iter(f"{_NS}node"):
        props, ptypes = {}, {}
        for data_el in node.findall(f"{_NS}data"):
            name, gtype = keys.get(
                data_el.get("key"), (data_el.get("key"), "string")
            )
            props[name] = data_el.text or ""
            ptypes[name] = type_map[gtype]
        yield ("vertex", path, node.get("id"), None, None, None, props, ptypes)
    for i, edge in enumerate(root.iter(f"{_NS}edge")):
        props, ptypes = {}, {}
        for data_el in edge.findall(f"{_NS}data"):
            name, gtype = keys.get(
                data_el.get("key"), (data_el.get("key"), "string")
            )
            if name == "label":
                continue
            props[name] = data_el.text or ""
            ptypes[name] = type_map[gtype]
        yield (
            "edge", path, edge.get("id") or str(i),
            edge.get("source"), edge.get("target"),
            edge.get("label") or "edge", props, ptypes,
        )


def parse_graphson_bytes(path: str, data: bytes) -> Iterator[_ROW]:
    """GraphSON 1.0 (the Blueprints shape graphson.py round-trips)."""
    body = json.loads(data.decode("utf-8"))
    body = body.get("graph", body)
    for vdoc in body.get("vertices", []):
        props, ptypes = {}, {}
        for k, val in vdoc.items():
            if not k.startswith("_"):
                props[k], ptypes[k] = _render(val)
        yield ("vertex", path, str(vdoc["_id"]), None, None, None, props, ptypes)
    for i, edoc in enumerate(body.get("edges", [])):
        props, ptypes = {}, {}
        for k, val in edoc.items():
            if not k.startswith("_"):
                props[k], ptypes[k] = _render(val)
        yield (
            "edge", path, str(edoc.get("_id", i)),
            str(edoc["_outV"]), str(edoc["_inV"]),
            edoc.get("_label", "edge"), props, ptypes,
        )


def parse_gml_bytes(path: str, data: bytes) -> Iterator[_ROW]:
    """GML: the same grammar subset as the driver loader (gml.py) —
    ``graph [ node [ id N ... ] edge [ source N target N ... ] ]`` —
    re-tokenized here so the function is self-contained on executors."""
    import re

    token_re = re.compile(r'"(?:[^"\\]|\\.)*"|\[|\]|[^\s\[\]]+')
    tokens = token_re.findall(data.decode("utf-8"))

    def parse_value(tok: str):
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

    def parse_block(i: int):
        out: dict = {}
        while i < len(tokens):
            tok = tokens[i]
            if tok == "]":
                return out, i + 1
            key = tok
            i += 1
            if tokens[i] == "[":
                sub, i = parse_block(i + 1)
                if key in ("node", "edge"):
                    out.setdefault(key, []).append(sub)
                else:
                    out[key] = sub
            else:
                out[key] = parse_value(tokens[i])
                i += 1
        return out, i

    i = 0
    doc: dict = {}
    while i < len(tokens):
        if tokens[i] == "graph" and i + 1 < len(tokens) and tokens[i + 1] == "[":
            doc, i = parse_block(i + 2)
        else:
            i += 1
    for node in doc.get("node", []):
        props, ptypes = {}, {}
        for k, val in node.items():
            if k != "id":
                props[k], ptypes[k] = _render(val)
        yield ("vertex", path, str(node.get("id")), None, None, None,
               props, ptypes)
    for j, edge in enumerate(doc.get("edge", [])):
        props, ptypes = {}, {}
        for k, val in edge.items():
            if k not in ("source", "target", "label", "id"):
                props[k], ptypes[k] = _render(val)
        yield (
            "edge", path, str(edge.get("id", j)),
            str(edge.get("source")), str(edge.get("target")),
            edge.get("label", "edge"), props, ptypes,
        )


_PARSERS = {
    "graphml": parse_graphml_bytes,
    "graphson": parse_graphson_bytes,
    "gml": parse_gml_bytes,
}


# ---------------------------------------------------------------------------
# the distributed reader
# ---------------------------------------------------------------------------

def read_graph_elements(
    spark: SparkSession, path_glob: str, fmt: str = "graphml"
) -> DataFrame:
    """Unified (kind, source_file, orig_id, src, dst, label, props,
    prop_types) rows from every matching file — one task per file, the
    parse entirely executor-side."""
    if fmt not in _PARSERS:
        raise ValueError(f"fmt must be one of {sorted(_PARSERS)}, got {fmt!r}")
    _register_by_value()
    parse = _PARSERS[fmt]
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in ELEMENT_SCHEMA.fields]
        for pdf in it:
            rows: List[_ROW] = []
            for _, row in pdf.iterrows():
                rows.extend(parse(row["path"], bytes(row["content"])))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(batches, schema=ELEMENT_SCHEMA)


def graphml_files_from_documents(
    docs: DataFrame, out_dir: str, every: int = 23, per_file: int = 8
) -> int:
    """Fixture builder (the warc_files_from_documents pattern): every
    ``every``-th document becomes a GraphML node carrying its text and
    char count as typed properties, packed ``per_file`` nodes per shard
    file with a ``next`` chain edge between shard-adjacent nodes — the
    multi-file export shape the distributed reader targets.  Returns
    the shard count.  Driver-side by design: it stands in for the
    EXPORTER; the reader path above is the distributed piece."""
    import os
    from xml.sax.saxutils import escape

    rows = (
        docs.where(F.col("doc_id") % every == 0)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    os.makedirs(out_dir, exist_ok=True)
    n_files = 0
    for i in range(0, len(rows), per_file):
        shard = rows[i : i + per_file]
        parts = [
            '<?xml version="1.0" encoding="UTF-8"?>',
            '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
            '<key id="text" for="node" attr.name="text" attr.type="string"/>',
            '<key id="n_chars" for="node" attr.name="n_chars" attr.type="long"/>',
            '<graph id="G" edgedefault="directed">',
        ]
        for r in shard:
            txt = r["text"] or ""
            parts.append(
                f'<node id="{r["doc_id"]}">'
                f'<data key="text">{escape(txt)}</data>'
                f'<data key="n_chars">{len(txt)}</data></node>'
            )
        for a, b in zip(shard, shard[1:]):
            parts.append(
                f'<edge source="{a["doc_id"]}" target="{b["doc_id"]}" '
                f'label="next"/>'
            )
        parts.append("</graph></graphml>")
        with open(
            os.path.join(out_dir, f"shard-{n_files:05d}.graphml"), "w"
        ) as fh:
            fh.write("\n".join(parts))
        n_files += 1
    return n_files


def read_graph_distributed(
    spark: SparkSession, path_glob: str, fmt: str = "graphml"
) -> Tuple[DataFrame, DataFrame]:
    """(vertices, edges) DataFrames for the bulk path
    (``TemporalGraph.from_dataframes`` / DataFrameGraph): engine ids are
    ``xxhash64(source_file, orig_id)`` — deterministic, computed
    column-side, no driver-side id map — and edge endpoints resolve
    through the same expression, so cross-file id reuse (each shard
    numbering its own vertices from 0) cannot collide.  Original ids
    ride along as ``original_id``.

    The parsed element frame is persisted: both splits come from one
    pass over the bytes."""
    elems = read_graph_elements(spark, path_glob, fmt).persist()
    eng_id = lambda file_col, id_col: F.xxhash64(F.lit("v:"), file_col, id_col)
    vertices = elems.where(F.col("kind") == "vertex").select(
        eng_id(F.col("source_file"), F.col("orig_id")).alias("id"),
        F.col("orig_id").alias("original_id"),
        "source_file", "props", "prop_types",
    )
    edges = elems.where(F.col("kind") == "edge").select(
        F.xxhash64(F.lit("e:"), "source_file", "orig_id").alias("id"),
        eng_id(F.col("source_file"), F.col("src")).alias("src"),
        eng_id(F.col("source_file"), F.col("dst")).alias("dst"),
        "label",
        F.col("orig_id").alias("original_id"),
        "source_file", "props", "prop_types",
    )
    return vertices, edges
