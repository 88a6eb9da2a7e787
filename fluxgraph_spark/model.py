"""Data model for the PySpark-native temporal property-graph engine.

Re-expresses the reference's Datomic-backed model (see SURVEY.md §1) as
SCD2-versioned DataFrames:

    vertices: id LONG, tx_from LONG, tx_to LONG (null = open), <prop cols...>
    edges:    id LONG, src LONG, dst LONG, label STRING,
              tx_from LONG, tx_to LONG, <prop cols...>
    tx_log:   tx_id LONG, tx_time TIMESTAMP, element_id LONG,
              prev_tx_id LONG, kind STRING

Dynamic typed attributes (reference: FluxUtil.java:58-81, createKey at
FluxUtil.java:161-167) map to mangled per-type columns ``<name$>__<type>``
so that the "same key, different value type = different attribute"
semantics survive (FluxElement.java:123-130). The ``.vertex``/``.edge``
kind suffix of the reference is unnecessary here because vertices and
edges live in separate tables (disjoint attribute spaces for free).
"""

from __future__ import annotations

import datetime
import decimal
import uuid as _uuid
from typing import Any

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Column-name constants
# ---------------------------------------------------------------------------

ID = "id"
SRC = "src"
DST = "dst"
LABEL = "label"
TX_FROM = "tx_from"
TX_TO = "tx_to"

TX_ID = "tx_id"
TX_TIME = "tx_time"
ELEMENT_ID = "element_id"
PREV_TX_ID = "prev_tx_id"
KIND = "kind"

VERTEX_BASE_COLS = (ID, TX_FROM, TX_TO)
EDGE_BASE_COLS = (ID, SRC, DST, LABEL, TX_FROM, TX_TO)

# Open-ended validity sentinel (reference uses Long.MAX_VALUE wrapped in a
# joda Interval, FluxElement.java:142-152).
MAX_TIME = datetime.datetime(9999, 12, 31, 23, 59, 59)

VERTEX_KIND = "vertex"
EDGE_KIND = "edge"

# ---------------------------------------------------------------------------
# Supported value types — closed set (FluxUtil.java:20-33, FluxGraph.java:66-76)
# ---------------------------------------------------------------------------

# type-name -> Spark type.  Mirrors the Datomic type table in SURVEY.md §1.4.
TYPE_SUFFIXES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "long": T.LongType(),       # Java Integer is widened to long too
    "bigint": T.DecimalType(38, 0),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bigdec": T.DecimalType(38, 18),
    "uuid": T.StringType(),     # canonical string form
    "uri": T.StringType(),
}

_MANGLE_SEP = "__"


class UnsupportedTypeError(TypeError):
    """Raised for property values outside the closed supported-type set
    (reference throws IllegalArgumentException, FluxUtil.java:50-55)."""


def infer_type_suffix(value: Any) -> str:
    """Python value -> type-name.  bool must be tested before int
    (bool is an int subclass).  Python int -> long (the reference widens
    Integer to long as well, FluxUtil.java:26); Python float -> double.
    Explicitly rejects arrays/maps/bytes to honor the Blueprints feature
    flags (FluxGraph.java:66-76)."""
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        if value > 2**63 - 1 or value < -(2**63):
            return "bigint"
        return "long"
    if isinstance(value, float):
        return "double"
    if isinstance(value, str):
        return "string"
    if isinstance(value, decimal.Decimal):
        return "bigdec"
    if isinstance(value, _uuid.UUID):
        return "uuid"
    raise UnsupportedTypeError(
        f"datatype {type(value).__name__} is not supported"
    )


def normalize_value(value: Any, suffix: str) -> Any:
    """Convert a Python value to the storage representation for ``suffix``."""
    if suffix == "uuid":
        return str(value)
    if suffix == "uri":
        return str(value)
    if suffix == "bigint":
        return decimal.Decimal(int(value))
    if suffix == "bigdec":
        return decimal.Decimal(value) if not isinstance(value, decimal.Decimal) else value
    if suffix == "float":
        return float(value)
    return value


def mangle(key: str, suffix: str) -> str:
    """Property key + type -> column name, mirroring FluxUtil.createKey
    (FluxUtil.java:161-167): underscores in the key map to ``$`` so the
    ``__`` separator stays unambiguous; dots are illegal (the reference
    silently truncates names at the first dot when demangling —
    FluxUtil.java:42-47 — we reject instead)."""
    if suffix not in TYPE_SUFFIXES:
        raise UnsupportedTypeError(f"unknown type suffix {suffix!r}")
    if "." in key:
        raise ValueError("property keys may not contain '.'")
    return key.replace("_", "$") + _MANGLE_SEP + suffix


def demangle(column: str) -> tuple[str, str]:
    """Column name -> (property key, type suffix)."""
    name, _, suffix = column.rpartition(_MANGLE_SEP)
    return name.replace("$", "_"), suffix


def is_property_column(column: str) -> bool:
    if _MANGLE_SEP not in column:
        return False
    _, suffix = demangle(column)
    return suffix in TYPE_SUFFIXES


def property_spark_type(column: str) -> T.DataType:
    _, suffix = demangle(column)
    return TYPE_SUFFIXES[suffix]


def vertex_schema(prop_columns: list[str]) -> T.StructType:
    fields = [
        T.StructField(ID, T.LongType(), False),
        T.StructField(TX_FROM, T.LongType(), False),
        T.StructField(TX_TO, T.LongType(), True),
    ]
    for col in prop_columns:
        fields.append(T.StructField(col, property_spark_type(col), True))
    return T.StructType(fields)


def edge_schema(prop_columns: list[str]) -> T.StructType:
    fields = [
        T.StructField(ID, T.LongType(), False),
        T.StructField(SRC, T.LongType(), False),
        T.StructField(DST, T.LongType(), False),
        T.StructField(LABEL, T.StringType(), False),
        T.StructField(TX_FROM, T.LongType(), False),
        T.StructField(TX_TO, T.LongType(), True),
    ]
    for col in prop_columns:
        fields.append(T.StructField(col, property_spark_type(col), True))
    return T.StructType(fields)


TX_LOG_SCHEMA = T.StructType(
    [
        T.StructField(TX_ID, T.LongType(), False),
        T.StructField(TX_TIME, T.TimestampType(), False),
        T.StructField(ELEMENT_ID, T.LongType(), False),
        T.StructField(PREV_TX_ID, T.LongType(), True),
        T.StructField(KIND, T.StringType(), False),
    ]
)
