"""Gremlin 2.x pipeline strings compiled onto the fluent Traversal DSL.

The reference is a Blueprints 2.1 implementation (SURVEY §0;
FluxGraph.java:16), and Blueprints-era users query it with
Gremlin-Groovy pipelines — either embedded (`g.v(1).out('knows')`) or
through Rexster's Gremlin extension endpoint.  This module gives those
users a switch-over path: the same pipeline STRING evaluates against a
fluxgraph_spark graph, compiled to one declarative DataFrame chain (via
operators/fluent.py), so Catalyst sees the whole pipeline — predicate
pushdown into the vertex scan, each hop an equi-join AQE can broadcast
or shuffle-plan, nothing materialized until a terminal.

Supported step vocabulary (the Gremlin-2 subset whose semantics the
engine's surface covers — everything SURVEY §2.3/§2.4 maps to):

    starts      g.V  g.E  g.v(id, ...)  g.e(id, ...)
    filters     has(k)  has(k, v)  has(k, T.cmp, v)  hasNot(k)
                hasNot(k, v)  interval(k, a, b)
    hops        out(*labels)  in(*labels)  both(*labels)
    edge steps  outE(*labels)  inE(*labels)  bothE(*labels)
    endpoints   outV  inV  bothV
    shaping     dedup  order  range(i, j)  limit(n)  [i..j]
                (i > 0 requires an earlier explicit ``order`` — offset
                paging of an UNORDERED distributed frontier is
                nondeterministic; a sorted frontier pages fine)
    projection  id  label  values(*keys)  property(k)
    history     as('x')  back('x')  select('x','y')  path  simplePath
                (per-traverser walk history carried as columns — see
                fluent.py ``track_paths``; ``path`` emits the walk as a
                ``v[1]->e[7]->v[2]`` string, ``select`` the element ids
                at the named steps.  Enabled automatically when the
                pipeline uses any history step.)
    loops       loop(k){it.loops < N}  loop('name'){it.loops < N}
                (bounded while-closures only — the literal bound lets
                the section unroll statically into the join tree; see
                ``_unroll_loops``)
    collections aggregate('x')  store('x')  except('x')  retain('x')
                (side-effect element collections: aggregate/store
                snapshot the frontier as a named set — declaratively, a
                subplan — and except/retain anti-/semi-join the current
                frontier against it by element id: the classic
                friends-of-friends-minus-friends shape as two joins)
    aggregation groupCount(k?)  sum  mean  max  min  (over a projected
                single value; groupCount over a key, or visit counts
                per element id without one)
    terminals   count()  toList()/iterate() (no-ops — evaluation is lazy)

Unbounded ``loop`` (a data-dependent while-closure or emit-closure)
remains absent: that is a driver-side fixpoint (the analytics
operators' superstep pattern), not a static join tree.

`T` comparison tokens: T.eq T.neq T.gt T.gte T.lt T.lte (Tokens.T of
Gremlin 2; FluxVertex's VertexQuery accepts the same set through
Blueprints' DefaultVertexQuery).

Property keys are resolved against the frame's columns: a bare key
matches either a plain column (DataFrameGraph tables) or the engine's
type-mangled property columns (``name__string`` — SURVEY §1.3); with a
comparison value the value's inferred type picks among typed twins.

Evaluation is set-at-a-time over whole frontiers — a deliberate
re-expression, not an emulation of Gremlin's per-traverser iterators:
bag semantics (duplicate paths preserved) match, `dedup` set-ifies.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import model as M
from .fluent import Traversal


class GremlinSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
      (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<number>-?\d+\.\d+[fFdD]?|-?\d+[lL]?)
    | (?P<tcmp>T\.(?:neq|eq|gte|gt|lte|lt))
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<punct>\.\.|[().,\[\]{}<])
    )
    """,
    re.VERBOSE,
)

_ESCAPES = {"\\'": "'", '\\"': '"', "\\\\": "\\", "\\n": "\n", "\\t": "\t"}


def _unescape(body: str) -> str:
    return re.sub(
        r"\\.", lambda m: _ESCAPES.get(m.group(0), m.group(0)[1]), body
    )


def _tokenize(script: str) -> list[tuple[str, Any]]:
    tokens: list[tuple[str, Any]] = []
    pos = 0
    while pos < len(script):
        m = _TOKEN_RE.match(script, pos)
        if not m or m.end() == m.start():
            rest = script[pos:].strip()
            if not rest:
                break
            raise GremlinSyntaxError(f"cannot tokenize at: {rest[:30]!r}")
        pos = m.end()
        if m.group("string") is not None:
            tokens.append(("lit", _unescape(m.group("string")[1:-1])))
        elif m.group("number") is not None:
            raw = m.group("number")
            if raw[-1] in "lL":
                tokens.append(("lit", int(raw[:-1])))
            elif raw[-1] in "fFdD":
                tokens.append(("lit", float(raw[:-1])))
            elif "." in raw:
                tokens.append(("lit", float(raw)))
            else:
                tokens.append(("lit", int(raw)))
        elif m.group("tcmp") is not None:
            tokens.append(("cmp", m.group("tcmp")[2:]))
        elif m.group("name") is not None:
            name = m.group("name")
            if name == "true":
                tokens.append(("lit", True))
            elif name == "false":
                tokens.append(("lit", False))
            elif name == "null":
                tokens.append(("lit", None))
            else:
                tokens.append(("name", name))
        else:
            tokens.append(("punct", m.group("punct")))
    return tokens


# ---------------------------------------------------------------------------
# parser — `g` . step ( args? ) . step ...  |  [i..j] range suffix
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Step:
    name: str
    args: tuple


def parse(script: str) -> list[Step]:
    """Parse a Gremlin pipeline string into a flat step list."""
    try:
        return _parse(script)
    except IndexError:
        # truncated input (unclosed args list / range suffix) walks past
        # the token list — surface it as a syntax error, not IndexError
        raise GremlinSyntaxError("unexpected end of pipeline") from None


def _parse(script: str) -> list[Step]:
    toks = _tokenize(script)
    if not toks or toks[0] != ("name", "g"):
        raise GremlinSyntaxError("pipeline must start with `g`")
    i = 1
    steps: list[Step] = []
    while i < len(toks):
        kind, val = toks[i]
        if (kind, val) == ("punct", "."):
            i += 1
            if i >= len(toks) or toks[i][0] != "name":
                raise GremlinSyntaxError("expected step name after `.`")
            name = toks[i][1]
            i += 1
            args: list = []
            if i < len(toks) and toks[i] == ("punct", "("):
                i += 1
                while toks[i] != ("punct", ")"):
                    k, v = toks[i]
                    if k == "lit":
                        args.append(v)
                    elif k == "cmp":
                        args.append(Cmp(v))
                    else:
                        raise GremlinSyntaxError(
                            f"unexpected token {v!r} in args of .{name}"
                        )
                    i += 1
                    if toks[i] == ("punct", ","):
                        i += 1
                i += 1
            if name == "loop" and i < len(toks) and toks[i] == ("punct", "{"):
                # the canonical bounded while-closure: {it.loops < N}
                want = [("punct", "{"), ("name", "it"), ("punct", "."),
                        ("name", "loops"), ("punct", "<")]
                if toks[i : i + 5] != want or i + 6 >= len(toks) \
                        or toks[i + 5][0] != "lit" \
                        or toks[i + 6] != ("punct", "}"):
                    raise GremlinSyntaxError(
                        "loop closures support exactly {it.loops < N}"
                    )
                args.append(toks[i + 5][1])
                i += 7
            steps.append(Step(name, tuple(args)))
        elif (kind, val) == ("punct", "["):
            # Groovy range suffix [i..j] (inclusive) — also [i] single index
            if (
                i + 4 < len(toks)
                and toks[i + 1][0] == "lit"
                and toks[i + 2] == ("punct", "..")
                and toks[i + 3][0] == "lit"
                and toks[i + 4] == ("punct", "]")
            ):
                steps.append(Step("range", (toks[i + 1][1], toks[i + 3][1])))
                i += 5
            elif (
                i + 2 < len(toks)
                and toks[i + 1][0] == "lit"
                and toks[i + 2] == ("punct", "]")
            ):
                steps.append(Step("range", (toks[i + 1][1], toks[i + 1][1])))
                i += 3
            else:
                raise GremlinSyntaxError("malformed [..] range")
        else:
            raise GremlinSyntaxError(f"unexpected token {val!r}")
    return steps


@dataclass(frozen=True)
class Cmp:
    op: str


def _unroll_loops(steps: list[Step]) -> list[Step]:
    """Statically unroll ``loop`` steps: the loop bound is a literal, so
    the looped section just repeats in the step list — the evaluator
    stays a single pass and Catalyst still sees ONE join tree (the
    unrolled hops are chained equi-joins, exactly what multi_hop
    plans).  ``loop(k){it.loops < N}`` re-runs the previous ``k`` steps
    (or the section after ``as('name')`` for a named anchor) until the
    counter — which starts at 1 and increments per arrival — fails the
    bound: N-1 total executions, matching GremlinDocs' classic example
    (``g.v(1).out.loop(1){it.loops < 3}`` = the 2-hop frontier).
    Unbounded/emit-closure loops stay unsupported: a data-dependent
    fixpoint needs the driver-side superstep pattern of the analytics
    operators, not a static pipeline."""
    out: list[Step] = []
    for st in steps:
        if st.name != "loop":
            out.append(st)
            continue
        if len(st.args) != 2:
            raise GremlinSyntaxError(
                "loop takes (stepsBack|'name') and a {it.loops < N} closure"
            )
        anchor, bound = st.args
        if not isinstance(bound, int) or bound < 2:
            raise GremlinSyntaxError("loop bound must be an int >= 2")
        if isinstance(anchor, str):
            marks = [
                i for i, s in enumerate(out)
                if s.name == "as" and s.args == (anchor,)
            ]
            if not marks:
                raise GremlinSyntaxError(f"loop anchor {anchor!r} not named")
            section = out[marks[-1] + 1 :]
        else:
            if anchor < 1 or anchor > len(out):
                raise GremlinSyntaxError(f"loop({anchor}) out of range")
            section = out[len(out) - anchor :]
        for _ in range(bound - 2):  # the section already ran once
            out.extend(section)
    return out


# ---------------------------------------------------------------------------
# property-key resolution (SURVEY §1.3 type-mangled columns)
# ---------------------------------------------------------------------------


def _resolve_key(columns: Sequence[str], key: str, value: Any = None) -> str:
    """Bare Gremlin key -> concrete column on this frame."""
    if key in columns:
        return key
    mangled = [c for c in columns if M.is_property_column(c) and M.demangle(c)[0] == key]
    if value is not None:
        want = M.mangle(key, M.infer_type_suffix(value))
        if want in mangled:
            return want
    if len(mangled) == 1:
        return mangled[0]
    if mangled:
        raise GremlinSyntaxError(
            f"key {key!r} is type-ambiguous among {mangled}; supply a typed value"
        )
    # unknown key: reference lookups on absent keys match nothing, not error
    return ""


def _key_filter(t: Traversal, key: str, op: str, value: Any) -> Traversal:
    col = _resolve_key(t.df().columns, key, value)
    if not col:
        # absent property key ⇒ empty match for has, everything for hasNot
        if op in ("isnull", "neq_or_null"):
            return t
        return t.where(F.lit(False))
    c = F.col(col)
    if op == "notnull":
        return t.where(c.isNotNull())
    if op == "isnull":
        return t.where(c.isNull())
    if op == "eq":
        return t.where(c == F.lit(value))
    if op == "neq_or_null":
        return t.where(c.isNull() | (c != F.lit(value)))
    if op == "neq":
        return t.where(c != F.lit(value))
    if op == "gt":
        return t.where(c > F.lit(value))
    if op == "gte":
        return t.where(c >= F.lit(value))
    if op == "lt":
        return t.where(c < F.lit(value))
    if op == "lte":
        return t.where(c <= F.lit(value))
    raise GremlinSyntaxError(f"unknown comparison {op!r}")


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------

_HOPS = {"out": "out", "in": "in_", "both": "both"}
_EDGE_STEPS = {"outE": "out_e", "inE": "in_e", "bothE": "both_e"}
_ENDPOINTS = {"outV": "out_v", "inV": "in_v", "bothV": "both_v"}
_NOOPS = {"toList", "iterate", "next"}


def run(script: str, vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """Evaluate a Gremlin pipeline string against (vertices, edges).

    Always returns a DataFrame (count() becomes a one-row ``count``
    frame) — evaluation stays lazy/declarative end to end.
    """
    steps = _unroll_loops(parse(script))
    if not steps:
        raise GremlinSyntaxError("empty pipeline")
    track = any(
        s.name in ("path", "select", "as", "back", "simplePath") for s in steps
    )
    cur: Any = Traversal(vertices, edges, track_paths=track)
    ordered = False  # an explicit `order` makes later offset paging deterministic
    collections: dict[str, DataFrame] = {}  # aggregate/store snapshots (id sets)
    for step in steps:
        name, args = step.name, step.args
        if name == "order":
            pass
        elif name not in ("range", "limit", *_NOOPS):
            # conservative: only steps that provably keep row order leave
            # the ordered flag up — anything else (hops, filters, dedup,
            # projections) may re-plan/re-shuffle and lose it
            ordered = False
        if not isinstance(cur, Traversal) and name not in (
            "order", "dedup", "range", "limit", "count",
            "groupCount", "sum", "mean", "max", "min", *_NOOPS,
        ):
            raise GremlinSyntaxError(
                f".{name} after a projection/terminal step"
            )
        if name in ("V", "E"):
            cur = getattr(cur, name)(*args)
        elif name in ("v", "e"):
            if not args:
                raise GremlinSyntaxError(f"g.{name}() needs at least one id")
            cur = getattr(cur, name.upper())(*args)
        elif name == "has":
            if len(args) == 1:
                cur = _key_filter(cur, args[0], "notnull", None)
            elif len(args) == 2 and not isinstance(args[1], Cmp):
                cur = _key_filter(cur, args[0], "eq", args[1])
            elif len(args) == 3 and isinstance(args[1], Cmp):
                cur = _key_filter(cur, args[0], args[1].op, args[2])
            else:
                raise GremlinSyntaxError("has() takes (k), (k,v) or (k,T.cmp,v)")
        elif name == "hasNot":
            if len(args) == 1:
                cur = _key_filter(cur, args[0], "isnull", None)
            elif len(args) == 2:
                cur = _key_filter(cur, args[0], "neq_or_null", args[1])
            else:
                raise GremlinSyntaxError("hasNot() takes (k) or (k,v)")
        elif name == "interval":
            if len(args) != 3:
                raise GremlinSyntaxError("interval(k, start, end)")
            col = _resolve_key(cur.df().columns, args[0], args[1])
            if not col:
                cur = cur.where(F.lit(False))
            else:
                cur = cur.interval(col, args[1], args[2])
        elif name in _HOPS:
            cur = getattr(cur, _HOPS[name])(*args)
        elif name in _EDGE_STEPS:
            cur = getattr(cur, _EDGE_STEPS[name])(*args)
        elif name in _ENDPOINTS:
            if args:
                raise GremlinSyntaxError(f"{name} takes no args")
            cur = getattr(cur, _ENDPOINTS[name])()
        elif name == "dedup":
            if isinstance(cur, Traversal):
                cur = cur.dedup()
            else:
                cur = cur.dropDuplicates()
        elif name == "order":
            df = cur.df() if isinstance(cur, Traversal) else cur
            if args:
                key = _resolve_key(df.columns, args[0])
                if not key:
                    raise GremlinSyntaxError(f"unknown property key {args[0]!r}")
                cols = [key]
            elif isinstance(cur, Traversal) and M.ID in df.columns:
                cols = [M.ID]
            else:
                cols = list(df.columns)
            # the sort must be TOTAL before it can license offset paging:
            # a non-unique key (order('kind')) leaves ties in
            # shuffle-dependent relative order, so append the element id
            # when present, else every remaining column, as a tiebreaker
            tie = (
                [M.ID]
                if M.ID in df.columns
                else [c for c in df.columns if c not in cols]
            )
            df = df.orderBy(*cols, *[c for c in tie if c not in cols])
            cur = cur._derived(df, cur._kind) if isinstance(cur, Traversal) else df
            ordered = True
        elif name in ("range", "limit"):
            if name == "limit":
                lo, hi = 0, args[0] - 1
            else:
                lo, hi = args
            if lo != 0:
                if not ordered:
                    raise GremlinSyntaxError(
                        "range/[i..j] with a non-zero start needs an "
                        "explicit `order` first (offset paging of an "
                        "unordered distributed frontier is "
                        "nondeterministic; use rexster.offset paging on "
                        "the REST surface instead)"
                    )
                # a sorted frontier pages deterministically
                df = cur.df() if isinstance(cur, Traversal) else cur
                df = df.offset(lo).limit(hi - lo + 1)
                cur = cur._derived(df, cur._kind) if isinstance(cur, Traversal) else df
            else:
                cur = cur.limit(hi + 1)
        elif name in ("values", "property"):
            if name == "property" and len(args) != 1:
                raise GremlinSyntaxError("property(k) takes one key")
            if not args:
                raise GremlinSyntaxError("values() needs at least one key")
            cols = []
            for k in args:
                col = _resolve_key(cur.df().columns, k)
                if not col:
                    raise GremlinSyntaxError(f"unknown property key {k!r}")
                cols.append(F.col(col).alias(k))
            cur = cur.df().select(*cols)
        elif name == "id":
            cur = cur.ids()
        elif name == "label":
            cur = cur.df().select(M.LABEL)
        elif name == "count":
            df = cur.df() if isinstance(cur, Traversal) else cur
            cur = df.agg(F.count(F.lit(1)).alias("count"))
        elif name == "groupCount":
            df = cur.df() if isinstance(cur, Traversal) else cur
            if args:
                col = _resolve_key(df.columns, args[0])
                if not col:
                    raise GremlinSyntaxError(f"unknown property key {args[0]!r}")
                keys = [F.col(col).alias(args[0])]
            elif isinstance(cur, Traversal):
                keys = [F.col(M.ID)]  # traverser visit counts per element
            else:
                keys = [F.col(c) for c in df.columns]
            cur = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("count"))
        elif name in ("sum", "mean", "max", "min"):
            if isinstance(cur, Traversal) or len(cur.columns) != 1:
                raise GremlinSyntaxError(
                    f".{name} aggregates a single projected value — "
                    f"use .values(key) / .property(key) first"
                )
            agg = {"sum": F.sum, "mean": F.avg, "max": F.max, "min": F.min}[
                name
            ](F.col(cur.columns[0]))
            cur = cur.agg(agg.alias(name))
        elif name == "as":
            if len(args) != 1 or not isinstance(args[0], str):
                raise GremlinSyntaxError("as('name') takes one string")
            cur = cur.as_(args[0])
        elif name == "back":
            if len(args) != 1 or not isinstance(args[0], str):
                raise GremlinSyntaxError(
                    "back('name') takes one named step (numeric back(n) "
                    "is not supported — name the step with as())"
                )
            try:
                cur = cur.back(args[0])
            except ValueError as ex:
                raise GremlinSyntaxError(str(ex)) from None
        elif name == "select":
            try:
                cur = cur.select_steps(*args)
            except ValueError as ex:
                raise GremlinSyntaxError(str(ex)) from None
        elif name == "path":
            if args:
                raise GremlinSyntaxError("path takes no args")
            cur = cur.path_df()
        elif name == "simplePath":
            if args:
                raise GremlinSyntaxError("simplePath takes no args")
            cur = cur.simple_path()
        elif name in ("aggregate", "store"):
            if len(args) != 1 or not isinstance(args[0], str):
                raise GremlinSyntaxError(f"{name}('x') takes one string")
            collections[args[0]] = cur.df().select(M.ID).distinct()
        elif name in ("except", "retain"):
            if len(args) != 1 or not isinstance(args[0], str):
                raise GremlinSyntaxError(f"{name}('x') takes one named set")
            if args[0] not in collections:
                raise GremlinSyntaxError(
                    f"no collection named {args[0]!r}; aggregate/store it first"
                )
            how = "left_anti" if name == "except" else "left_semi"
            cur = cur._derived(
                cur.df().join(collections[args[0]], M.ID, how), cur._kind
            )
        elif name in _NOOPS:
            pass
        else:
            raise GremlinSyntaxError(f"unsupported step .{name}")
    if isinstance(cur, Traversal):
        return cur.df()
    return cur


def run_on_graph(script: str, graph) -> DataFrame:
    """Evaluate against a TemporalGraph/DataFrameGraph (current snapshot)."""
    return run(script, graph.vertices_df(), graph.edges_df())
