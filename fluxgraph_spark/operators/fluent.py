"""Fluent set-at-a-time traversal DSL (Gremlin/Blueprints-pipe style).

The reference exposes single-element traversal primitives that callers
compose imperatively (T1-T7; e.g. the 3-hop benchmark loop,
FluxBenchmarkTestSuite.java:30-56).  This module gives the same
composition as a fluent builder over WHOLE FRONTIERS: every step is a
DataFrame transform, so a chain like

    t = Traversal(vertices, edges)
    (t.V().has("kind", "customer").has("nationkey", 3)
       .in_("placed_by").out("contains").dedup().count())

declares one Catalyst join tree — predicates push down to the vertex
scan, each hop is an equi-join AQE can broadcast or shuffle as sizes
dictate, and nothing materializes until a terminal (.df/.count/.ids).

Bag semantics match the reference: hops keep duplicates (one output row
per matching edge — MultiIterable behavior, FluxVertex.java:83,115);
``dedup()`` is the explicit set-ification step.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import model as M
from . import traversal as TR


class Traversal:
    """Immutable fluent builder: every step returns a new Traversal.

    ``vertices`` needs an ``id`` column; ``edges`` need ``id``/``src``/
    ``dst``/``label``.  Works over any snapshot pair — e.g.
    ``TemporalGraph.vertices_df()`` / ``edges_df()`` (current or as-of),
    or a ``DataFrameGraph``'s tables.
    """

    def __init__(self, vertices: DataFrame, edges: DataFrame) -> None:
        self._vertices = vertices
        self._edges = edges
        self._cur: DataFrame | None = None
        self._kind: str | None = None  # 'V' | 'E'

    def _derived(self, cur: DataFrame, kind: str) -> "Traversal":
        t = Traversal(self._vertices, self._edges)
        t._cur = cur
        t._kind = kind
        return t

    def _need(self, kind: str) -> DataFrame:
        if self._cur is None or self._kind != kind:
            raise ValueError(
                f"step requires a {kind}-frontier; start with .{kind}() "
                f"or check the step order"
            )
        return self._cur

    def _current(self) -> DataFrame:
        if self._cur is None:
            raise ValueError("no frontier yet; start with .V() or .E()")
        return self._cur

    # -- starts ---------------------------------------------------------
    def V(self, *ids: Any) -> "Traversal":
        cur = self._vertices
        if ids:
            cur = cur.where(F.col(M.ID).isin(list(ids)))
        return self._derived(cur, "V")

    def E(self, *ids: Any) -> "Traversal":
        cur = self._edges
        if ids:
            cur = cur.where(F.col(M.ID).isin(list(ids)))
        return self._derived(cur, "E")

    # -- filters --------------------------------------------------------
    def has(self, key: str, value: Any) -> "Traversal":
        return self._derived(self._current().where(F.col(key) == F.lit(value)), self._kind)

    def has_not(self, key: str, value: Any) -> "Traversal":
        cur = self._current().where(
            F.col(key).isNull() | (F.col(key) != F.lit(value))
        )
        return self._derived(cur, self._kind)

    def interval(self, key: str, start: Any, end: Any) -> "Traversal":
        """Half-open range [start, end) — T6 ``interval`` semantics."""
        cur = self._current().where((F.col(key) >= start) & (F.col(key) < end))
        return self._derived(cur, self._kind)

    def where(self, condition) -> "Traversal":
        """Escape hatch: arbitrary Column predicate."""
        return self._derived(self._current().where(condition), self._kind)

    # -- vertex hops (bag semantics, duplicates preserved) --------------
    def _hop(self, direction: str, labels: Sequence[str]) -> "Traversal":
        front = self._need("V").select(M.ID)
        ids = TR.hop(front, self._edges, direction, tuple(labels))
        return self._derived(ids.join(self._vertices, M.ID, "inner"), "V")

    def out(self, *labels: str) -> "Traversal":
        return self._hop(TR.OUT, labels)

    def in_(self, *labels: str) -> "Traversal":
        return self._hop(TR.IN, labels)

    def both(self, *labels: str) -> "Traversal":
        return self._hop(TR.BOTH, labels)

    # -- vertex -> incident edges --------------------------------------
    def _edges_step(self, direction: str, labels: Sequence[str]) -> "Traversal":
        front = self._need("V").select(M.ID)
        return self._derived(
            TR.incident_edges(self._edges, front, direction, tuple(labels)), "E"
        )

    def out_e(self, *labels: str) -> "Traversal":
        return self._edges_step(TR.OUT, labels)

    def in_e(self, *labels: str) -> "Traversal":
        return self._edges_step(TR.IN, labels)

    def both_e(self, *labels: str) -> "Traversal":
        return self._edges_step(TR.BOTH, labels)

    # -- edge -> endpoint vertices -------------------------------------
    def _vertex_step(self, endpoint: str) -> "Traversal":
        ids = self._need("E").select(F.col(endpoint).alias(M.ID))
        return self._derived(ids.join(self._vertices, M.ID, "inner"), "V")

    def out_v(self) -> "Traversal":
        """Edge source vertex (reference edge.getVertex(OUT))."""
        return self._vertex_step(M.SRC)

    def in_v(self) -> "Traversal":
        """Edge destination vertex (reference edge.getVertex(IN))."""
        return self._vertex_step(M.DST)

    def both_v(self) -> "Traversal":
        """Both endpoints of each edge — one output row per endpoint
        (Gremlin ``bothV`` bag semantics)."""
        e = self._need("E")
        ids = e.select(F.col(M.SRC).alias(M.ID)).unionAll(
            e.select(F.col(M.DST).alias(M.ID))
        )
        return self._derived(ids.join(self._vertices, M.ID, "inner"), "V")

    # -- shaping / terminals -------------------------------------------
    def dedup(self) -> "Traversal":
        cur = self._current()
        key = [M.ID] if M.ID in cur.columns else cur.columns
        return self._derived(cur.dropDuplicates(key), self._kind)

    def limit(self, n: int) -> "Traversal":
        return self._derived(self._current().limit(n), self._kind)

    def values(self, *cols: str) -> DataFrame:
        return self._current().select(*cols)

    def ids(self) -> DataFrame:
        return self._current().select(M.ID)

    def df(self) -> DataFrame:
        return self._current()

    def count(self) -> int:
        return self._current().count()
