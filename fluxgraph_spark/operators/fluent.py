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

**Walk history** (``track_paths=True``): per-traverser history steps
(Gremlin's ``path``/``as``/``back``/``select``) ARE expressible
set-at-a-time — each traverser is a ROW, and its history is a column
built up per hop.  In tracking mode every frontier-changing step
appends the new current element to a ``__path`` string column
(``v[1]->e[7]->v[2]``), ``as_(name)`` snapshots the current element id
into ``__as_<name>``, ``back(name)`` makes that element the current
frontier again (appending it to the walked path), and
``select_steps(names)`` / ``path_df()`` project the history out.  Hops
in tracking mode extend each traverser row independently (edge steps
join per frontier row, not per distinct edge), which is exactly
Gremlin's per-traverser iterator semantics.  ``dedup`` keeps the
lexicographically-least path per current element so results stay
deterministic.  Cost model: the history column adds bytes per row but
no extra shuffles — each hop remains one equi-join.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .. import model as M
from . import traversal as TR

_PATH = "__path"
_AS_PREFIX = "__as_"


def _entry(kind: str, id_col) -> "F.Column":
    return F.concat(F.lit(kind + "["), id_col.cast("string"), F.lit("]"))


class Traversal:
    """Immutable fluent builder: every step returns a new Traversal.

    ``vertices`` needs an ``id`` column; ``edges`` need ``id``/``src``/
    ``dst``/``label``.  Works over any snapshot pair — e.g.
    ``TemporalGraph.vertices_df()`` / ``edges_df()`` (current or as-of),
    or a ``DataFrameGraph``'s tables.
    """

    def __init__(
        self,
        vertices: DataFrame,
        edges: DataFrame,
        track_paths: bool = False,
    ) -> None:
        self._vertices = vertices
        self._edges = edges
        self._cur: DataFrame | None = None
        self._kind: str | None = None  # 'V' | 'E'
        self._track = track_paths
        self._as_kinds: dict[str, str] = {}  # step name -> 'V' | 'E'

    def _derived(self, cur: DataFrame, kind: str) -> "Traversal":
        t = Traversal(self._vertices, self._edges, track_paths=self._track)
        t._cur = cur
        t._kind = kind
        t._as_kinds = dict(self._as_kinds)
        return t

    def _hist_cols(self, df: DataFrame) -> list[str]:
        return [c for c in df.columns if c == _PATH or c.startswith(_AS_PREFIX)]

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
        if self._track:
            cur = cur.withColumn(_PATH, _entry("v", F.col(M.ID)))
        return self._derived(cur, "V")

    def E(self, *ids: Any) -> "Traversal":
        cur = self._edges
        if ids:
            cur = cur.where(F.col(M.ID).isin(list(ids)))
        if self._track:
            cur = cur.withColumn(_PATH, _entry("e", F.col(M.ID)))
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
        if self._track:
            ids = self._tracked_join(self._need("V"), direction, labels, "dst_vertex")
            return self._derived(ids.join(self._vertices, M.ID, "inner"), "V")
        front = self._need("V").select(M.ID)
        ids = TR.hop(front, self._edges, direction, tuple(labels))
        return self._derived(ids.join(self._vertices, M.ID, "inner"), "V")

    def _tracked_join(
        self, cur: DataFrame, direction: str, labels: Sequence[str], emit: str
    ) -> DataFrame:
        """One tracked traverser extension: join the frontier (id +
        history columns) to the label-filtered edges per direction, emit
        either the far vertex id (``dst_vertex``) or the full edge row
        (``edge``), with the path column extended by the new element.
        Each frontier ROW extends independently — per-traverser
        semantics.  Still one equi-join per direction."""
        hist = self._hist_cols(cur)
        front = cur.select(M.ID, *hist).alias("__f")
        e = TR._label_filter(self._edges, tuple(labels)).alias("__e")

        def _one(src_col: str, far_col: str) -> DataFrame:
            joined = e.join(
                front, F.col(f"__e.{src_col}") == F.col(f"__f.{M.ID}"), "inner"
            )
            if emit == "dst_vertex":
                new_id = F.col(f"__e.{far_col}")
                cols = [new_id.alias(M.ID)]
                path = _entry("v", new_id)
            else:
                cols = [F.col(f"__e.{c}") for c in self._edges.columns]
                path = _entry("e", F.col(f"__e.{M.ID}"))
            cols += [
                F.col(f"__f.{c}")
                for c in hist
                if c != _PATH
            ]
            cols.append(
                F.concat(F.col(f"__f.{_PATH}"), F.lit("->"), path).alias(_PATH)
            )
            return joined.select(*cols)

        if direction == TR.OUT:
            return _one(M.SRC, M.DST)
        if direction == TR.IN:
            return _one(M.DST, M.SRC)
        return _one(M.SRC, M.DST).unionByName(_one(M.DST, M.SRC))

    def out(self, *labels: str) -> "Traversal":
        return self._hop(TR.OUT, labels)

    def in_(self, *labels: str) -> "Traversal":
        return self._hop(TR.IN, labels)

    def both(self, *labels: str) -> "Traversal":
        return self._hop(TR.BOTH, labels)

    # -- vertex -> incident edges --------------------------------------
    def _edges_step(self, direction: str, labels: Sequence[str]) -> "Traversal":
        if self._track:
            return self._derived(
                self._tracked_join(self._need("V"), direction, labels, "edge"), "E"
            )
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
    def _endpoint_ids(self, endpoint: str) -> DataFrame:
        cur = self._need("E")
        if not self._track:
            return cur.select(F.col(endpoint).alias(M.ID))
        hist = self._hist_cols(cur)
        new_id = F.col(endpoint)
        return cur.select(
            new_id.alias(M.ID),
            *[F.col(c) for c in hist if c != _PATH],
            F.concat(F.col(_PATH), F.lit("->"), _entry("v", new_id)).alias(_PATH),
        )

    def _vertex_step(self, endpoint: str) -> "Traversal":
        ids = self._endpoint_ids(endpoint)
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
        ids = self._endpoint_ids(M.SRC).unionByName(self._endpoint_ids(M.DST))
        return self._derived(ids.join(self._vertices, M.ID, "inner"), "V")

    # -- walk history (track_paths mode) -------------------------------
    def as_(self, name: str) -> "Traversal":
        """Name the current step (Gremlin ``as('x')``): snapshots the
        current element id into a history column for later ``back`` /
        ``select_steps``.  Requires ``track_paths=True``."""
        if not self._track:
            raise ValueError("as_ requires Traversal(track_paths=True)")
        if not name.isidentifier():
            raise ValueError(f"step name must be an identifier: {name!r}")
        cur = self._current().withColumn(_AS_PREFIX + name, F.col(M.ID))
        t = self._derived(cur, self._kind)
        t._as_kinds[name] = self._kind
        return t

    def back(self, name: str) -> "Traversal":
        """Return each traverser to the element it held at the named
        step (Gremlin 2 ``back('x')``): filters applied since then keep
        their effect; the walked path keeps its full history with the
        named element re-appended as the new current step."""
        if name not in self._as_kinds:
            raise ValueError(f"no step named {name!r}; call as_({name!r}) first")
        kind = self._as_kinds[name]
        cur = self._current()
        hist = self._hist_cols(cur)
        named = F.col(_AS_PREFIX + name)
        proj = cur.select(
            named.alias(M.ID),
            *[F.col(c) for c in hist if c != _PATH],
            F.concat(
                F.col(_PATH),
                F.lit("->"),
                _entry("v" if kind == "V" else "e", named),
            ).alias(_PATH),
        )
        base = self._vertices if kind == "V" else self._edges
        return self._derived(proj.join(base, M.ID, "inner"), kind)

    def select_steps(self, *names: str) -> DataFrame:
        """Project the element ids held at the named steps (Gremlin 2
        ``select(['a','b'])``), one column per name; no names = every
        named step in naming order."""
        use = list(names) if names else list(self._as_kinds)
        missing = [n for n in use if n not in self._as_kinds]
        if missing:
            raise ValueError(f"unknown step name(s): {missing}")
        return self._current().select(
            *[F.col(_AS_PREFIX + n).alias(n) for n in use]
        )

    def simple_path(self) -> "Traversal":
        """Keep only traversers whose walked path has no repeated
        element (Gremlin ``simplePath``) — a cycle filter expressed as
        one array predicate over the history column, no joins."""
        cur = self._current()
        if _PATH not in cur.columns:
            raise ValueError("simple_path requires Traversal(track_paths=True)")
        parts = F.split(F.col(_PATH), "->")
        return self._derived(
            cur.where(F.size(parts) == F.size(F.array_distinct(parts))),
            self._kind,
        )

    def path_df(self) -> DataFrame:
        """The walked path per traverser (Gremlin ``path``) as a single
        ``path`` string column, e.g. ``v[1]->e[7]->v[2]``."""
        cur = self._current()
        if _PATH not in cur.columns:
            raise ValueError("path_df requires Traversal(track_paths=True)")
        return cur.select(F.col(_PATH).alias("path"))

    # -- shaping / terminals -------------------------------------------
    def dedup(self) -> "Traversal":
        cur = self._current()
        if self._track and _PATH in cur.columns and M.ID in cur.columns:
            # traversers collapse by current element; keep the
            # lexicographically-least path so the surviving history is
            # deterministic, not whichever row a shuffle saw first
            w = W.partitionBy(M.ID).orderBy(F.col(_PATH))
            cur = (
                cur.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
            return self._derived(cur, self._kind)
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
