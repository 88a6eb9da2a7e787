"""Vertex-local query builder (T6) — the Blueprints ``vertex.query()``
surface (reference FluxVertex.java:125-127 delegating to blueprints-core
2.1.0 ``DefaultQuery``; exercised by QueryTestSuite, FluxGraphTest.java:45-49).

Supported: ``has(key, value)``, ``has(key, compare, value)``,
``has_not(key, value)``, ``interval(key, start, end)`` (start inclusive,
end exclusive), ``direction(...)``, ``labels(...)``, ``limit(n)``,
terminated by ``edges()`` / ``vertices()`` / ``count()``.

Also provides the set-at-a-time DataFrame equivalent
(:func:`edge_query_df`) — the same predicate compiled to Catalyst columns
so the filter pushes down to the parquet scan at scale.
"""

from __future__ import annotations

import operator
from typing import Any, Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import model as M
from ..elements import BOTH, IN, OUT, FluxSparkEdge, FluxSparkVertex

EQUAL = "="
NOT_EQUAL = "<>"
GREATER_THAN = ">"
GREATER_THAN_EQUAL = ">="
LESS_THAN = "<"
LESS_THAN_EQUAL = "<="

_OPS: dict[str, Callable[[Any, Any], bool]] = {
    EQUAL: operator.eq,
    NOT_EQUAL: operator.ne,
    GREATER_THAN: operator.gt,
    GREATER_THAN_EQUAL: operator.ge,
    LESS_THAN: operator.lt,
    LESS_THAN_EQUAL: operator.le,
}


class _HasClause:
    def __init__(self, key: str, compare: str, value: Any):
        self.key, self.compare, self.value = key, compare, value

    def matches(self, edge: FluxSparkEdge) -> bool:
        actual = edge.get_label() if self.key == "label" else edge.get_property(self.key)
        if self.compare in (EQUAL, NOT_EQUAL):
            if self.value is None:
                ok = actual is None
            else:
                ok = actual is not None and actual == self.value
            return ok if self.compare == EQUAL else not ok
        if actual is None:
            return False
        try:
            return _OPS[self.compare](actual, self.value)
        except TypeError:
            return False


class _IntervalClause:
    def __init__(self, key: str, start: Any, end: Any):
        self.key, self.start, self.end = key, start, end

    def matches(self, edge: FluxSparkEdge) -> bool:
        actual = edge.get_property(self.key)
        if actual is None:
            return False
        try:
            return self.start <= actual < self.end
        except TypeError:
            return False


class VertexQuery:
    def __init__(self, vertex: FluxSparkVertex):
        self._vertex = vertex
        self._direction = BOTH
        self._labels: Sequence[str] = ()
        self._clauses: list = []
        self._limit: Optional[int] = None

    def direction(self, d: str) -> "VertexQuery":
        self._direction = d
        return self

    def labels(self, *labels: str) -> "VertexQuery":
        self._labels = labels
        return self

    def has(self, key: str, *args: Any) -> "VertexQuery":
        if len(args) == 0:
            self._clauses.append(_HasClause(key, NOT_EQUAL, None))
        elif len(args) == 1:
            self._clauses.append(_HasClause(key, EQUAL, args[0]))
        else:
            compare, value = args
            self._clauses.append(_HasClause(key, compare, value))
        return self

    def has_not(self, key: str, value: Any = None) -> "VertexQuery":
        self._clauses.append(_HasClause(key, NOT_EQUAL, value))
        return self

    def interval(self, key: str, start: Any, end: Any) -> "VertexQuery":
        self._clauses.append(_IntervalClause(key, start, end))
        return self

    def limit(self, n: int) -> "VertexQuery":
        self._limit = n
        return self

    # -- terminals ----------------------------------------------------------

    def edges(self) -> list[FluxSparkEdge]:
        out = []
        for e in self._vertex.get_edges(self._direction, *self._labels):
            if all(c.matches(e) for c in self._clauses):
                out.append(e)
                if self._limit is not None and len(out) >= self._limit:
                    break
        return out

    def vertices(self) -> list[FluxSparkVertex]:
        out = []
        for e in self.edges():
            if self._direction == OUT:
                out.append(e.get_vertex(IN))
            elif self._direction == IN:
                out.append(e.get_vertex(OUT))
            else:
                # opposite endpoint relative to the queried vertex
                other = e.get_vertex(IN) if e.get_vertex(OUT).id == self._vertex.id else e.get_vertex(OUT)
                out.append(other)
        return out

    def count(self) -> int:
        return len(self.edges())


# ---------------------------------------------------------------------------
# Set-at-a-time equivalent: compile the same query shape to Catalyst columns
# ---------------------------------------------------------------------------

def prop_col(df: DataFrame, key: str) -> Column:
    """Resolve the live value of a (possibly multi-typed) property key:
    coalesce over every typed variant column, mirroring getProperty's
    first-live-typed-column rule (FluxElement.java:76-97)."""
    variants = [c for c in df.columns if M.is_property_column(c) and M.demangle(c)[0] == key]
    if not variants:
        return F.lit(None)
    if len(variants) == 1:
        return F.col(variants[0])
    return F.coalesce(*[F.col(c) for c in variants])


def edge_query_df(
    edges: DataFrame,
    vertex_id: Optional[int] = None,
    direction: str = BOTH,
    labels: Sequence[str] = (),
    has: Sequence[tuple] = (),
    intervals: Sequence[tuple] = (),
    limit: Optional[int] = None,
) -> DataFrame:
    """The whole T6 surface as one declarative filter — conjunctive
    predicates that Catalyst pushes into the scan."""
    df = edges
    if vertex_id is not None:
        if direction == OUT:
            df = df.where(F.col(M.SRC) == vertex_id)
        elif direction == IN:
            df = df.where(F.col(M.DST) == vertex_id)
        else:
            df = df.where((F.col(M.SRC) == vertex_id) | (F.col(M.DST) == vertex_id))
    if labels:
        df = df.where(F.col(M.LABEL).isin(list(labels)))
    for key, compare, value in has:
        c = F.col(M.LABEL) if key == "label" else prop_col(df, key)
        if compare == EQUAL:
            df = df.where(c.isNull() if value is None else c == value)
        elif compare == NOT_EQUAL:
            df = df.where(c.isNotNull() if value is None else ~(c.eqNullSafe(value)))
        else:
            df = df.where({">": c > value, ">=": c >= value, "<": c < value, "<=": c <= value}[compare])
    for key, start, end in intervals:
        c = prop_col(df, key)
        df = df.where((c >= start) & (c < end))
    if limit is not None:
        df = df.limit(limit)
    return df
