from .graphml import load_graphml, write_graphml
from .graphson import load_graphson, write_graphson
from .gml import load_gml
from .parquet_io import DataFrameGraph, load_graph_parquet, save_graph_parquet
from .tpch import tpch_graph
from .bucketed import DedupIndex
from .ann_index import DeltaIvfIndex, DeltaIvfPqIndex, IvfIndex, IvfPqIndex
from .scd2_table import Scd2ParquetTable
from .rexster import RexsterShim
from .text_index import DeltaInvertedIndex, InvertedIndex
from .warc import extract_text, html_to_text, read_warc, write_warc
from .graph_text import (
    read_graph_distributed,
    read_graph_elements,
    write_graph_distributed,
)

__all__ = [
    "read_graph_distributed",
    "write_graph_distributed",
    "read_graph_elements",
    "load_graphml",
    "write_graphml",
    "load_graphson",
    "write_graphson",
    "load_gml",
    "DataFrameGraph",
    "save_graph_parquet",
    "load_graph_parquet",
    "tpch_graph",
    "DedupIndex",
    "IvfIndex",
    "IvfPqIndex",
    "DeltaIvfIndex",
    "DeltaIvfPqIndex",
    "Scd2ParquetTable",
    "RexsterShim",
    "InvertedIndex",
    "DeltaInvertedIndex",
    "read_warc",
    "write_warc",
    "extract_text",
    "html_to_text",
]
