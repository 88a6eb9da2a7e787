"""Rexster-shaped read-only REST shim (SURVEY §2 row S8).

The reference ships a Rexster ``GraphConfiguration`` adapter
(FluxGraphConfiguration.java:24-42): given rexster.xml's
``<graph-location>``, it constructs a FluxGraph and hands it to the
Rexster server, which then exposes the TinkerPop 2.x REST surface over
the Blueprints API.  The rebuild's twin has the same two halves:

* :func:`graph_from_location` — the configuration contract: a location
  string (here: a ``save_graph_parquet`` directory, the analog of the
  reference's Datomic URI) resolved to a live graph, raising on a
  missing/empty location exactly like the reference's
  ``GraphConfigurationException`` path.
* :class:`RexsterShim` — a dependency-free (stdlib ``http.server``)
  read-only HTTP layer serving the Rexster response shapes over a
  :class:`~fluxgraph_spark.graph.TemporalGraph`: the
  ``{"version", "results", "totalSize", "queryTime"}`` envelope,
  vertices as ``{"_id", "_type": "vertex", ...properties}``, edges with
  ``"_outV"/"_inV"/"_label"``, TinkerPop typed-value query params
  (``value=(i,5)``), and Rexster's ``rexster.offset.start/end`` paging.

Read-only by design: Rexster's mutating verbs return 405 — the engine's
write path is the transactional Python API (C1-C7), not HTTP.  This is
a deployment shim for element-at-a-time reads; set-at-a-time analytics
stay on the DataFrame surface where Catalyst can see them.

Routing (``handle``) is pure — (method, path, params) -> (status, body)
— so the protocol surface is testable without sockets; ``serve`` is a
thin threaded-server wrapper around it.
"""

from __future__ import annotations

import datetime
import json
import time
from typing import Any, Optional
from urllib.parse import parse_qs, urlparse

from .. import model as M

_VERSION = "fluxgraph-spark/rexster-shim 1.0"

# Gremlin endpoint response cap: REST materializes rows on the driver by
# nature; anything larger belongs in parquet via the DataFrame API.
_GREMLIN_MAX_ROWS = 10_000

# POST body cap (scripts are small; never buffer a client-declared
# Content-Length of arbitrary size into driver memory)
_MAX_BODY_BYTES = 1 << 20

_OUT_DIRS = {"out": "out", "outE": "out"}
_IN_DIRS = {"in": "in", "inE": "in"}
_BOTH_DIRS = {"both": "both", "bothE": "both"}
_VERTEX_RETURNING = {"out", "in", "both"}


def graph_from_location(spark, location: Optional[str]):
    """The reference's ``configureGraphInstance`` contract
    (FluxGraphConfiguration.java:28-42): resolve the configured graph
    location to a live graph, with the same missing-location error
    path."""
    if location is None or len(location) == 0:
        raise ValueError(
            "Check graph configuration. Missing or empty configuration "
            "element: graph-location"
        )
    from .parquet_io import load_graph_parquet

    return load_graph_parquet(spark, location)


def _typed_param(raw: str) -> Any:
    """TinkerPop 2.x typed query-param values: ``(i,5)`` int,
    ``(l,5)`` long, ``(d,1.5)`` double, ``(f,1.5)`` float, ``(b,true)``
    boolean, ``(s,x)`` string; bare values fall back to string."""
    if raw.startswith("(") and raw.endswith(")") and "," in raw:
        code, _, val = raw[1:-1].partition(",")
        code = code.strip().lower()
        val = val.strip()
        if code in ("i", "l"):
            return int(val)
        if code in ("d", "f"):
            return float(val)
        if code == "b":
            return val.lower() == "true"
        return val
    return raw


def _json_value(v: Any) -> Any:
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def _vertex_json(v) -> dict:
    out = {k: _json_value(v.get_property(k)) for k in v.get_property_keys()}
    out["_id"] = v.id
    out["_type"] = "vertex"
    return out


def _edge_json(e) -> dict:
    out = {k: _json_value(e.get_property(k)) for k in e.get_property_keys()}
    out["_id"] = e.id
    out["_type"] = "edge"
    out["_label"] = e.get_label()
    out["_outV"] = e.get_vertex("out").id
    out["_inV"] = e.get_vertex("in").id
    return out


_RESERVED_PARAMS = {"script", "key", "value", "_outV", "_inV", "_label"}


def _property_params(params: dict) -> dict:
    """Non-reserved query/body params -> typed property assignments
    (TinkerPop 2.x ``(i,5)`` typing via :func:`_typed_param`)."""
    return {
        k: _typed_param(v)
        for k, v in params.items()
        if k not in _RESERVED_PARAMS and not k.startswith("rexster.")
    }


class RexsterShim:
    """Rexster-shaped routes over one named TemporalGraph.

    READ-ONLY by default.  ``allow_writes=True`` additionally serves
    Rexster 2.x's mutation routes (the reference's Rexster exposed the
    full Blueprints mutation surface) wired straight to the CRUD path —
    auto-commit per request, exactly the Python API's transaction
    semantics (SURVEY §2.2 C1-C7):

        POST   /graphs/{g}/vertices[?k=v...]       create (+properties)
        POST   /graphs/{g}/vertices/{id}?k=v       set properties
            (an absent {id} CREATES a vertex with an ENGINE id —
            Blueprints ignoreSuppliedIds, C1)
        POST   /graphs/{g}/edges?_outV=&_label=&_inV=[&k=v] create edge
        POST   /graphs/{g}/edges/{id}?k=v          set properties
        DELETE /graphs/{g}/vertices/{id}           remove (cascades, C4)
        DELETE /graphs/{g}/vertices/{id}?k&k2      remove properties
        DELETE /graphs/{g}/edges/{id}[?k...]       remove edge / props

    The §2.10 error contract maps onto HTTP: engine ``ValueError``
    (empty key, 'id'/'label' keys, historical/deleted mutation) -> 400
    envelope; absent elements/endpoints -> 404."""

    def __init__(
        self, graph, name: str = "fluxgraph", allow_writes: bool = False
    ) -> None:
        self.graph = graph
        self.name = name
        self.allow_writes = allow_writes

    # -- pure routing --------------------------------------------------

    def handle(self, method: str, path: str, params: Optional[dict] = None):
        """(method, path, query params) -> (http status, response dict).
        Params values are raw strings (first value wins, as parse_qs
        lists collapse)."""
        t0 = time.time()
        params = params or {}
        parts = [p for p in path.split("/") if p]
        up = method.upper()
        # without allow_writes, POST is allowed ONLY on the Gremlin
        # extension route (Rexster clients POST their scripts; the
        # scripts themselves are read-only pipelines) and every other
        # mutating verb stays 405.  With it, POST/DELETE on the
        # vertices/edges routes dispatch to the CRUD write path.
        if up != "GET":
            gremlin_post = up == "POST" and parts[2:4] == ["tp", "gremlin"]
            write_route = (
                up in ("POST", "DELETE")
                and len(parts) >= 3
                and parts[0] == "graphs"
                and parts[2] in ("vertices", "edges")
            )
            if not gremlin_post and not (write_route and self.allow_writes):
                return 405, {
                    "message": (
                        "this shim is read-only; construct RexsterShim with "
                        "allow_writes=True to enable the mutation routes, or "
                        "use the Python API"
                    ),
                    "version": _VERSION,
                }
        try:
            if up != "GET" and parts[2:4] != ["tp", "gremlin"]:
                status, body = self._write(up, parts, params)
            else:
                status, body = self._route(parts, params)
        except KeyError:
            status, body = 404, {"message": f"Graph [{parts[1]}] could not be found"}
        except ValueError as ex:
            # malformed client input (e.g. non-numeric rexster.offset.*)
            # is a 400 envelope, never an unhandled handler exception
            status, body = 400, {"message": f"malformed request: {ex}"}
        body.setdefault("version", _VERSION)
        body.setdefault("queryTime", round((time.time() - t0) * 1000, 3))
        return status, body

    def _route(self, parts: list[str], params: dict):
        if not parts:
            return 200, {"name": _VERSION, "graphs": [self.name]}
        if parts[0] != "graphs":
            return 404, {"message": f"unknown route /{'/'.join(parts)}"}
        if len(parts) == 1:
            return 200, {"graphs": [self.name]}
        if parts[1] != self.name:
            return 404, {"message": f"Graph [{parts[1]}] could not be found"}
        if len(parts) == 2:
            return 200, {
                "name": self.name,
                "graph": f"fluxgraph_spark[{self.name}]",
                "type": "fluxgraph_spark.TemporalGraph",
                "readOnly": not self.allow_writes,
                "features": dict(getattr(self.graph, "features", {})),
            }
        if parts[2] == "vertices":
            return self._vertices(parts[3:], params)
        if parts[2] == "edges":
            return self._edges(parts[3:], params)
        if parts[2:4] == ["tp", "gremlin"]:
            return self._gremlin(params)
        return 404, {"message": f"unknown route /{'/'.join(parts)}"}

    # -- collections ---------------------------------------------------

    def _page(self, items: list, params: dict) -> dict:
        total = len(items)
        start = int(params.get("rexster.offset.start", 0))
        end = params.get("rexster.offset.end")
        if end is not None:
            items = items[start : int(end)]
        elif start:
            items = items[start:]
        return {"results": items, "totalSize": total}

    def _lookup_params(self, params: dict):
        key = params.get("key")
        if key is None:
            return None, None
        return key, _typed_param(params.get("value", ""))

    def _vertices(self, rest: list[str], params: dict):
        g = self.graph
        if not rest:
            key, value = self._lookup_params(params)
            items = [_vertex_json(v) for v in g.get_vertices(key, value)]
            return 200, self._page(items, params)
        try:
            vid = int(rest[0])
        except ValueError:
            return 404, {"message": f"Vertex with [{rest[0]}] cannot be found."}
        v = g.get_vertex(vid)
        if v is None or v.is_deleted():
            return 404, {"message": f"Vertex with [{vid}] cannot be found."}
        if len(rest) == 1:
            return 200, {"results": _vertex_json(v)}
        direction = rest[1]
        labels = tuple(params["_label"].split(",")) if "_label" in params else ()
        dirmap = {**_OUT_DIRS, **_IN_DIRS, **_BOTH_DIRS}
        if direction not in dirmap:
            return 404, {"message": f"unknown vertex route [{direction}]"}
        if direction in _VERTEX_RETURNING:
            items = [_vertex_json(n) for n in v.get_vertices(dirmap[direction], *labels)]
        else:
            items = [_edge_json(e) for e in v.get_edges(dirmap[direction], *labels)]
        return 200, self._page(items, params)

    def _gremlin(self, params: dict):
        """Rexster's Gremlin extension (``/graphs/{g}/tp/gremlin?script=``):
        the pipeline string evaluates through operators/gremlin.py as one
        DataFrame chain; only the HTTP response materializes rows, capped
        at ``_GREMLIN_MAX_ROWS`` (an interactive REST surface, not a bulk
        export — bulk results belong in parquet via the DataFrame API)."""
        script = params.get("script")
        if not script:
            return 400, {"success": False, "message": "no script provided"}
        from ..operators import gremlin as GL

        try:
            df = GL.run(script, self.graph.vertices_df(), self.graph.edges_df())
        except ValueError as ex:
            return 400, {"success": False, "message": str(ex)}
        except Exception as ex:  # noqa: BLE001 — e.g. AnalysisException
            return 500, {"success": False, "message": str(ex)[:2000]}
        try:
            # Analysis/execution errors only surface at collect time (e.g.
            # a type mismatch inside a comparison); those are server-side
            # evaluation failures, not syntax errors — return the JSON
            # envelope instead of letting the exception kill the handler.
            rows = df.limit(_GREMLIN_MAX_ROWS).collect()
        except Exception as ex:  # noqa: BLE001 — HTTP boundary
            return 500, {"success": False, "message": str(ex)[:2000]}
        results = []
        for r in rows:
            d = {}
            for k, v in r.asDict().items():
                if k in (M.TX_FROM, M.TX_TO):
                    continue
                if M.is_property_column(k):
                    k = M.demangle(k)[0]
                elif k == M.ID:
                    k = "_id"
                d[k] = _json_value(v)
            results.append(d)
        body = self._page(results, params)
        body["success"] = True
        return 200, body

    def _edges(self, rest: list[str], params: dict):
        g = self.graph
        if not rest:
            key, value = self._lookup_params(params)
            items = [_edge_json(e) for e in g.get_edges(key, value)]
            return 200, self._page(items, params)
        try:
            eid = int(rest[0])
        except ValueError:
            return 404, {"message": f"Edge with [{rest[0]}] cannot be found."}
        e = g.get_edge(eid)
        if e is None or e.is_deleted():
            return 404, {"message": f"Edge with [{eid}] cannot be found."}
        return 200, {"results": _edge_json(e)}

    # -- writes (allow_writes=True only; see class docstring) ----------

    def _write(self, method: str, parts: list[str], params: dict):
        if parts[1] != self.name:
            return 404, {"message": f"Graph [{parts[1]}] could not be found"}
        g = self.graph
        kind, rest = parts[2], parts[3:]
        props = _property_params(params)

        def _get(elem_kind: str, raw_id: str):
            try:
                eid = int(raw_id)
            except ValueError:
                return None
            el = g.get_vertex(eid) if elem_kind == "v" else g.get_edge(eid)
            return None if el is None or el.is_deleted() else el

        if kind == "vertices":
            if method == "POST":
                v = _get("v", rest[0]) if rest else None
                if v is None:
                    # create: a supplied id is IGNORED (Blueprints
                    # ignoreSuppliedIds — reference C1); the engine
                    # assigns the id, auto-committing the transaction
                    v = g.add_vertex()
                for k, val in props.items():
                    v.set_property(k, val)
                return 200, {"results": _vertex_json(v)}
            if not rest:
                return 400, {"message": "DELETE needs a vertex id"}
            v = _get("v", rest[0])
            if v is None:
                return 404, {"message": f"Vertex with [{rest[0]}] cannot be found."}
            if props:  # Rexster: DELETE with params removes those keys
                for k in props:
                    v.remove_property(k)
                return 200, {"results": _vertex_json(v)}
            g.remove_vertex(v)  # cascades incident edges (C4)
            return 200, {"results": None}

        # edges
        if method == "POST":
            if rest:
                e = _get("e", rest[0])
                if e is None:
                    return 404, {"message": f"Edge with [{rest[0]}] cannot be found."}
                for k, val in props.items():
                    e.set_property(k, val)
                return 200, {"results": _edge_json(e)}
            missing = [k for k in ("_outV", "_label", "_inV") if not params.get(k)]
            if missing:
                return 400, {"message": f"edge creation needs {missing}"}
            out_v = _get("v", params["_outV"])
            in_v = _get("v", params["_inV"])
            if out_v is None or in_v is None:
                # the reference's addEdge throws on a null endpoint
                # (§2.10); over HTTP that's the absent-element envelope
                bad = params["_outV"] if out_v is None else params["_inV"]
                return 404, {"message": f"Vertex with [{bad}] cannot be found."}
            e = g.add_edge(None, out_v, in_v, params["_label"])
            for k, val in props.items():
                e.set_property(k, val)
            return 200, {"results": _edge_json(e)}
        if not rest:
            return 400, {"message": "DELETE needs an edge id"}
        e = _get("e", rest[0])
        if e is None:
            return 404, {"message": f"Edge with [{rest[0]}] cannot be found."}
        if props:
            for k in props:
                e.remove_property(k)
            return 200, {"results": _edge_json(e)}
        g.remove_edge(e)
        return 200, {"results": None}

    # -- stdlib HTTP wrapper -------------------------------------------

    def serve(self, port: int = 8182, host: str = "127.0.0.1"):
        """Start a threaded HTTP server on (host, port); returns the
        server object (call ``.shutdown()`` to stop; ``.server_address``
        has the bound port when ``port=0``)."""
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        shim = self

        class Handler(BaseHTTPRequestHandler):
            def _respond(self, method: str) -> None:
                url = urlparse(self.path)
                params = {k: v[0] for k, v in parse_qs(url.query).items()}
                try:
                    n = int(self.headers.get("Content-Length") or 0)
                except ValueError:
                    payload = json.dumps(
                        {"message": "malformed Content-Length", "version": _VERSION}
                    ).encode()
                    self.send_response(400)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                if n > _MAX_BODY_BYTES:
                    # never buffer a client-declared body of arbitrary
                    # size — scripts are small
                    payload = json.dumps(
                        {"message": "request body too large", "version": _VERSION}
                    ).encode()
                    self.send_response(413)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
                if n:
                    # Rexster's Gremlin extension POSTs {"script": ...};
                    # scalar params (paging bounds...) arrive stringified,
                    # and classic form-encoded bodies fall back to parse_qs
                    raw = self.rfile.read(n)
                    try:
                        posted = json.loads(raw)
                        if isinstance(posted, dict):
                            params.update(
                                {
                                    k: v if isinstance(v, str) else json.dumps(v)
                                    for k, v in posted.items()
                                    if isinstance(v, (str, int, float, bool))
                                }
                            )
                    except ValueError:
                        for k, v in parse_qs(raw.decode(errors="replace")).items():
                            params[k] = v[0]
                status, body = shim.handle(method, url.path, params)
                payload = json.dumps(body, default=str).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):  # noqa: N802 (http.server API)
                self._respond("GET")

            def do_POST(self):  # noqa: N802
                self._respond("POST")

            def do_DELETE(self):  # noqa: N802
                self._respond("DELETE")

            def log_message(self, *args):  # silence per-request stderr
                pass

        server = ThreadingHTTPServer((host, port), Handler)
        import threading

        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server
