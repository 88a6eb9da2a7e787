"""fluxgraph_spark — a PySpark-native temporal property-graph engine.

A from-scratch rebuild of the capabilities of datablend/fluxgraph
(a Blueprints-on-Datomic temporal graph database; see SURVEY.md) on the
Spark DataFrame/SQL stack: vertices and edges are SCD2-versioned
DataFrames, traversal is joins, temporal navigation is window functions,
and graph diffs are set operations — all Catalyst-optimized.
"""

from .elements import BOTH, IN, OUT, FluxSparkEdge, FluxSparkVertex
from .graph import FEATURES, TemporalGraph, WorkingSet
from .sources.parquet_io import DataFrameGraph
from .store import LocalStore

__all__ = [
    "TemporalGraph",
    "DataFrameGraph",
    "WorkingSet",
    "FluxSparkVertex",
    "FluxSparkEdge",
    "LocalStore",
    "FEATURES",
    "OUT",
    "IN",
    "BOTH",
]

__version__ = "0.1.0"
