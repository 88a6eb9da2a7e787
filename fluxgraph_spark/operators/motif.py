"""Graph motif finding — the GraphFrames ``find()`` pattern surface,
compiled to one Catalyst join tree.

Pattern language (the public GraphFrames subset):

* ``(a)-[e]->(b)``  — a directed edge term; ``a``/``b`` name vertices,
  ``e`` names the edge.  Re-using a vertex name constrains terms to the
  SAME vertex; re-used names join, fresh names bind.
* ``()`` / ``[]``   — anonymous vertex / edge: matches anything, binds
  nothing (two ``()`` are independent).
* ``!(a)-[]->(b)``  — negated term: no edge from ``a`` to ``b`` may
  exist (an anti-join); negated terms cannot name an edge and must use
  vertices bound by positive terms.
* terms separated by ``;``.

Result: one STRUCT column per named vertex (the full vertex row) and
per named edge (the full edge row), like GraphFrames — downstream code
projects ``F.col("a.kind")`` etc.  Every binding is returned (no
dedup), matching GraphFrames semantics.

Compilation is pure joins: each positive term joins the edge table once
(on whatever endpoints are already bound — a cross join only for a
genuinely disconnected pattern), each negated term is one left-anti
join, and vertex attributes attach at the end with one join per named
vertex.  Catalyst reorders/broadcasts as usual, so a motif over a
bucketed graph layout (plans/layout.materialize_graph_bucketed) scans
pre-shuffled edges.  Reference parity: the Blueprints-era surface has
no motif API — this extends the traversal family (fluent DSL, Gremlin
pipelines) with the pattern-join form popularized by GraphFrames/
Cypher MATCH.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(r"^(!?)\((\w*)\)-\[(\w*)\]->\((\w*)\)$")


def _parse(pattern: str) -> list:
    terms = []
    for raw in pattern.split(";"):
        t = "".join(raw.split())
        if not t:
            continue
        m = _TERM_RE.match(t)
        if not m:
            raise ValueError(
                f"bad motif term {raw.strip()!r} — expected "
                "'(a)-[e]->(b)' (optionally '!'-negated)"
            )
        neg, va, en, vb = m.groups()
        if neg and en:
            raise ValueError(
                f"negated term {raw.strip()!r} cannot name an edge"
            )
        terms.append((bool(neg), va or None, en or None, vb or None))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find(vertices: DataFrame, edges: DataFrame, pattern: str) -> DataFrame:
    """Match ``pattern`` against the graph; see the module docstring.
    ``vertices`` must carry ``id``, ``edges`` must carry ``src``/``dst``
    (extra columns ride along inside the result structs)."""
    terms = _parse(pattern)
    seen_edges: set = set()
    bound: dict = {}  # vertex name -> flat id column
    edge_cols: list = []
    cur = None
    i = 0
    for neg, va, en, vb in terms:
        if neg:
            continue  # anti-joins apply after all positive bindings
        if en:
            if en in seen_edges or en in bound:
                raise ValueError(f"duplicate element name {en!r}")
            seen_edges.add(en)
        i += 1
        src_c, dst_c = f"__src_{i}", f"__dst_{i}"
        sel = [F.col("src").alias(src_c), F.col("dst").alias(dst_c)]
        if en:
            sel.append(F.struct(*edges.columns).alias(en))
            edge_cols.append(en)
        e = edges.select(*sel)
        conds = []
        if va in bound:
            conds.append(F.col(bound[va]) == F.col(src_c))
        if vb in bound:
            conds.append(F.col(bound[vb]) == F.col(dst_c))
        if va is not None and va == vb:  # self-loop term '(a)-[]->(a)'
            conds.append(F.col(src_c) == F.col(dst_c))
        if cur is None:
            cur = e
            if conds:  # only the self-loop case on the first term
                cur = cur.where(conds[0])
        elif conds:
            on = conds[0]
            for c in conds[1:]:
                on = on & c
            cur = cur.join(e, on)
        else:  # disconnected pattern component
            cur = cur.crossJoin(e)
        for name, col in ((va, src_c), (vb, dst_c)):
            if name is None or name in bound:
                continue
            if name in seen_edges:
                raise ValueError(f"duplicate element name {name!r}")
            bound[name] = col
    if cur is None:
        raise ValueError("motif pattern needs at least one positive term")
    for neg, va, en, vb in terms:
        if not neg:
            continue
        if va not in bound or vb not in bound:
            raise ValueError(
                f"negated term '!({va})-[]->({vb})' uses a vertex no "
                "positive term binds"
            )
        anti = edges.select(
            F.col("src").alias("__anti_src"), F.col("dst").alias("__anti_dst")
        )
        cur = cur.join(
            anti,
            (F.col(bound[va]) == F.col("__anti_src"))
            & (F.col(bound[vb]) == F.col("__anti_dst")),
            "left_anti",
        )
    out_cols = []
    for name, id_col in bound.items():
        v = vertices.select(
            F.col("id").alias(f"__vid_{name}"),
            F.struct(*vertices.columns).alias(name),
        )
        cur = cur.join(v, F.col(id_col) == F.col(f"__vid_{name}"))
        out_cols.append(name)
    return cur.select(*out_cols, *edge_cols)
