"""Set-at-a-time traversal operators (T1-T7) as DataFrame joins.

The reference composes single-hop primitives imperatively per element
(FluxVertex.java:77-117; 3-hop benchmark at FluxBenchmarkTestSuite.java:30-56,
an N+1 nested loop).  Here a hop is ONE equi-join over the whole frontier:

    out-hop:  frontier ⋈ edges on (frontier.id = edges.src)
    in-hop:   frontier ⋈ edges on (frontier.id = edges.dst)

Scale notes (100 TB):
* Joins hash-partition on vertex id — natural high-cardinality key.
* When the frontier is small (seeded traversals) Spark's AQE converts the
  shuffle join to a broadcast join at runtime; `broadcast_frontier=True`
  forces it.
* Label filters are conjunctive scan predicates (pushed down), applied
  BEFORE the join so the shuffle only carries matching edges.
* Duplicate paths are preserved (bag semantics) exactly like the
  reference's MultiIterable concatenation — no accidental `distinct`,
  which would add a shuffle AND change semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import model as M
from ..elements import BOTH, IN, OUT

__all__ = [
    "incident_edges",
    "hop",
    "neighbors",
    "multi_hop",
    "degrees",
    "elements_touched_3hop",
]


def _label_filter(edges: DataFrame, labels: Sequence[str]) -> DataFrame:
    if labels:
        return edges.where(F.col(M.LABEL).isin(list(labels)))
    return edges


def incident_edges(
    edges: DataFrame,
    vertex_ids: DataFrame,
    direction: str = BOTH,
    labels: Sequence[str] = (),
    broadcast_frontier: bool = False,
) -> DataFrame:
    """T1/T2 set-at-a-time: edges incident to a frontier of vertex ids.

    ``vertex_ids`` must have a single column ``id``.  BOTH is the bag
    union of the two directed matches (duplicates preserved, matching the
    reference's MultiIterable; a self-loop edge appears twice)."""
    e = _label_filter(edges, labels)
    front = F.broadcast(vertex_ids) if broadcast_frontier else vertex_ids
    if direction == OUT:
        return e.join(front, e[M.SRC] == front[M.ID], "left_semi")
    if direction == IN:
        return e.join(front, e[M.DST] == front[M.ID], "left_semi")
    out_part = e.join(front, e[M.SRC] == front[M.ID], "left_semi")
    in_part = e.join(front, e[M.DST] == front[M.ID], "left_semi")
    return out_part.unionByName(in_part)


def hop(
    frontier: DataFrame,
    edges: DataFrame,
    direction: str = OUT,
    labels: Sequence[str] = (),
    broadcast_frontier: bool = False,
) -> DataFrame:
    """One traversal hop: frontier vertex ids -> neighbor vertex ids
    (bag semantics — one output row per matching edge, duplicates kept).

    T3 set-at-a-time (reference FluxVertex.java:88-117)."""
    e = _label_filter(edges, labels)
    front = F.broadcast(frontier) if broadcast_frontier else frontier
    if direction == OUT:
        return (
            e.join(front, e[M.SRC] == front[M.ID], "inner")
            .select(e[M.DST].alias(M.ID))
        )
    if direction == IN:
        return (
            e.join(front, e[M.DST] == front[M.ID], "inner")
            .select(e[M.SRC].alias(M.ID))
        )
    return hop(frontier, edges, OUT, labels, broadcast_frontier).unionByName(
        hop(frontier, edges, IN, labels, broadcast_frontier)
    )


def neighbors(
    vertices: DataFrame,
    edges: DataFrame,
    frontier: DataFrame,
    direction: str = OUT,
    labels: Sequence[str] = (),
    broadcast_frontier: bool = False,
) -> DataFrame:
    """1-hop neighbors with their vertex rows (T3): hop + join back to the
    vertex table on id."""
    ids = hop(frontier, edges, direction, labels, broadcast_frontier)
    return ids.join(vertices, M.ID, "inner")


def multi_hop(
    frontier: DataFrame,
    edges: DataFrame,
    hops: Sequence[tuple],
    broadcast_frontier: bool = False,
) -> DataFrame:
    """T7: chained hops, e.g. ``[(OUT, ()), (OUT, ('knows',))]``.

    Each hop is an aliased self-join of the edge table; Catalyst plans the
    chain as a join tree and AQE picks broadcast sides at runtime."""
    cur = frontier
    for direction, labels in hops:
        cur = hop(cur, edges, direction, labels, broadcast_frontier)
    return cur


def degrees(edges: DataFrame, direction: str = BOTH) -> DataFrame:
    """Vertex degree table — partial aggregation map-side, single shuffle
    on vertex id."""
    if direction == OUT:
        return edges.groupBy(F.col(M.SRC).alias(M.ID)).agg(F.count("*").alias("degree"))
    if direction == IN:
        return edges.groupBy(F.col(M.DST).alias(M.ID)).agg(F.count("*").alias("degree"))
    both = edges.select(F.col(M.SRC).alias(M.ID)).unionByName(
        edges.select(F.col(M.DST).alias(M.ID))
    )
    return both.groupBy(M.ID).agg(F.count("*").alias("degree"))


def elements_touched_3hop(vertices: DataFrame, edges: DataFrame) -> int:
    """The reference benchmark's elements-touched counter
    (FluxBenchmarkTestSuite.java:30-56): for every vertex, walk out-edges
    3 levels deep, counting 1 per vertex visit + 1 per edge visit.

    Per path-prefix arithmetic: touches = Σ_k (vertices at depth k) +
    Σ_k (edges traversed at depth k), with bag semantics.  Computed here
    with three chained joins and counts — no driver-side loop."""
    e = edges.select(M.SRC, M.DST)
    v0 = vertices.select(M.ID)
    total = v0.count()  # depth-0 vertex visits
    frontier = v0
    for _ in range(3):
        edges_hit = e.join(frontier, e[M.SRC] == frontier[M.ID], "inner")
        nxt = edges_hit.select(F.col(M.DST).alias(M.ID))
        n = nxt.count()
        total += 2 * n  # each traversed edge is touched once, its head vertex once
        frontier = nxt
    return total
