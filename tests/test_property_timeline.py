"""Property-based testing: random mutation timelines vs a naive model.

Hypothesis generates abstract op sequences; each op is resolved against
the live element set at execution time, applied BOTH to the engine and
to a pure-Python model that snapshots full state after every
transaction.  The engine must then agree with the model at every
checkpoint: current state AND as-of state at random past transactions
(including cascade semantics: vertex removal closes incident edges).

The reference ships no temporal tests at all (SURVEY.md §5) — this is
the rebuild's scripted-timeline gap-filler.
"""

import copy
import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

T0 = datetime.datetime(2020, 1, 1)


def _tx_time(tx: int) -> datetime.datetime:
    return T0 + datetime.timedelta(seconds=tx)


VALUES = ["a", "bb", 7, 123456789012, 2.5, True, "x y z"]
KEYS = ["k1", "k2", "note"]

op_strategy = st.tuples(
    st.sampled_from(
        ["add_v", "add_e", "set_vp", "set_ep", "rm_vp", "rm_e", "rm_v"]
    ),
    st.integers(min_value=0, max_value=10 ** 6),
    st.integers(min_value=0, max_value=10 ** 6),
    st.integers(min_value=0, max_value=len(KEYS) - 1),
    st.integers(min_value=0, max_value=len(VALUES) - 1),
)


class Model:
    """Pure-Python mirror: state snapshots per tx."""

    def __init__(self):
        self.vertices = {}   # id -> {key: value}
        self.edges = {}      # id -> [src, dst, label, {key: value}]
        self.snapshots = []  # snapshots[t] = state after tx t+1... index by tx

    def snap(self):
        self.snapshots.append(
            (copy.deepcopy(self.vertices), copy.deepcopy(self.edges))
        )

    def at(self, tx):
        # tx is 1-based; snapshots[k] is the state after the (k+1)-th tx
        if tx <= 0 or not self.snapshots:
            return {}, {}
        return self.snapshots[min(tx, len(self.snapshots)) - 1]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_strategy, min_size=1, max_size=25))
def test_timeline_matches_model(spark, ops):
    from fluxgraph_spark import TemporalGraph

    g = TemporalGraph.create(spark)
    model = Model()
    live_v = {}  # model id order -> engine vertex object
    live_e = {}

    def engine_tx():
        return g._store.max_tx

    for kind, r1, r2, ki, vi in ops:
        g.set_transaction_time(_tx_time(engine_tx() + 1))
        if kind == "add_v":
            v = g.add_vertex()
            live_v[v.get_id()] = v
            model.vertices[v.get_id()] = {}
            model.snap()
        elif kind == "add_e" and live_v:
            ids = sorted(live_v)
            src = live_v[ids[r1 % len(ids)]]
            dst = live_v[ids[r2 % len(ids)]]
            e = g.add_edge(None, src, dst, "l%d" % (ki,))
            live_e[e.get_id()] = e
            model.edges[e.get_id()] = [src.get_id(), dst.get_id(), "l%d" % (ki,), {}]
            model.snap()
        elif kind == "set_vp" and live_v:
            ids = sorted(live_v)
            v = live_v[ids[r1 % len(ids)]]
            v.set_property(KEYS[ki], VALUES[vi])
            model.vertices[v.get_id()][KEYS[ki]] = VALUES[vi]
            model.snap()
        elif kind == "set_ep" and live_e:
            ids = sorted(live_e)
            e = live_e[ids[r1 % len(ids)]]
            e.set_property(KEYS[ki], VALUES[vi])
            model.edges[e.get_id()][3][KEYS[ki]] = VALUES[vi]
            model.snap()
        elif kind == "rm_vp" and live_v:
            ids = sorted(live_v)
            v = live_v[ids[r1 % len(ids)]]
            if KEYS[ki] in model.vertices[v.get_id()]:
                v.remove_property(KEYS[ki])
                del model.vertices[v.get_id()][KEYS[ki]]
                model.snap()
        elif kind == "rm_e" and live_e:
            ids = sorted(live_e)
            eid = ids[r1 % len(ids)]
            g.remove_edge(live_e.pop(eid))
            del model.edges[eid]
            model.snap()
        elif kind == "rm_v" and live_v:
            ids = sorted(live_v)
            vid = ids[r1 % len(ids)]
            g.remove_vertex(live_v.pop(vid))
            del model.vertices[vid]
            # cascade: incident edges close too
            for eid in [
                i for i, (s, d, _, _) in model.edges.items() if s == vid or d == vid
            ]:
                del model.edges[eid]
                live_e.pop(eid, None)
            model.snap()

    n_tx = engine_tx()
    assert n_tx == len(model.snapshots)

    # current state: ids + every live property
    cur_v = {v.get_id(): dict(_props(v)) for v in g.get_vertices()}
    assert cur_v == model.vertices
    cur_e = {
        e.get_id(): [
            e.get_vertex("out").get_id(),
            e.get_vertex("in").get_id(),
            e.get_label(),
            dict(_props(e)),
        ]
        for e in g.get_edges()
    }
    assert cur_e == {k: list(v) for k, v in model.edges.items()}

    # as-of state at three past checkpoints (first, middle, last-1)
    for tx in sorted({1, n_tx // 2, max(n_tx - 1, 1)}) if n_tx else []:
        snap_v, snap_e = model.at(tx)
        h = g.as_of(_tx_time(tx))
        got_v = {v.get_id(): dict(_props(v)) for v in h.get_vertices()}
        assert got_v == snap_v, f"vertices mismatch at tx {tx}"
        got_e = {e.get_id(): dict(_props(e)) for e in h.get_edges()}
        assert got_e == {k: dict(v[3]) for k, v in snap_e.items()}, (
            f"edges mismatch at tx {tx}"
        )


def _props(el):
    return {k: el.get_property(k) for k in el.get_property_keys()}
