"""Golden version-chain timelines for OUT-OF-ORDER transaction times.

The reference forwards an explicit transaction time straight into the
Datomic tx datom (:db/txInstant — FluxGraph.java:325-340, installed by
FluxUtil.java:68-73) without checking monotonicity, and resolves a
checkpoint date to a transaction by scanning all txInstants
(FluxGraph.java:225-243).  These timelines pin the rebuild's documented
model for that surface (graph.py:141-190): a checkpoint is a TX-ID cut —
``resolve_checkpoint(t) = max(tx_id) with tx_time <= t`` — so a snapshot
includes every earlier-id transaction, even one whose wall-clock time is
later than the checkpoint.  Interleavings covered (VERDICT r2 item 7):

1. a backdated property write landing UNDER earlier-committed writes,
2. an edge add (which bumps both endpoint vertex versions,
   FluxGraph.java:156-157) interleaved with backdated property writes,
   with checkpoint reads taken BETWEEN the backdated transactions,
3. cascade remove (FluxGraph.java:362-363, 371-387) followed by a
   backdated edge insert.
"""

import datetime

import pytest

from fluxgraph_spark import TemporalGraph

T0 = datetime.datetime(2020, 1, 1)


def ts(n):
    return T0 + datetime.timedelta(days=n)


def chain_len(el):
    return len(list(el.previous_versions())) + 1


def test_backdated_write_shadows_earlier_committed_value(spark):
    """day1: create v.  day5: p=a.  THEN backdate p=b to day3.

    tx order is (create, a, b) so the backdated 'b' is the CURRENT value;
    'a' is visible at no checkpoint at all: any t >= day3 resolves to the
    backdated tx (highest id), whose snapshot has b overwriting a."""
    g = TemporalGraph.create(spark)
    g.set_transaction_time(ts(1))
    v = g.add_vertex()
    g.set_transaction_time(ts(5))
    v.set_property("p", "a")
    g.set_transaction_time(ts(3))  # backdate
    v.set_property("p", "b")
    g.set_transaction_time(None)

    assert v.get_property("p") == "b"
    assert chain_len(v) == 3

    g.set_checkpoint_time(ts(2))  # resolves to the create tx only
    assert g.get_vertex(v.get_id()).get_property("p") is None
    g.set_checkpoint_time(ts(3))  # resolves to the backdated tx (max id)
    assert g.get_vertex(v.get_id()).get_property("p") == "b"
    g.set_checkpoint_time(ts(4))
    assert g.get_vertex(v.get_id()).get_property("p") == "b"
    g.set_checkpoint_time(ts(6))
    assert g.get_vertex(v.get_id()).get_property("p") == "b"
    g.set_checkpoint_time(None)

    # validity intervals follow tx ids: 'a' was live between its tx and
    # the backdated tx, regardless of wall-clock order
    prevs = list(v.previous_versions())
    assert [p.get_property("p") for p in prevs] == ["a", None]


def test_edge_bump_interleaved_with_backdated_writes(spark):
    """day1: v1, v2.  day10: e = v1->v2 (bumps BOTH endpoints).  Then two
    backdated property writes (day2 on v1, day6 on v2) with checkpoint
    reads BETWEEN the backdated transactions.

    Pins the tx-id-cut subtlety: after the day2-backdated write exists,
    checkpoint(day2) resolves to that tx — whose id is ABOVE the edge
    add — so the edge IS visible at a day2 checkpoint even though its
    own wall-clock time is day10."""
    g = TemporalGraph.create(spark)
    g.set_transaction_time(ts(1))
    v1, v2 = g.add_vertex(), g.add_vertex()
    g.set_transaction_time(ts(10))
    e = g.add_edge(None, v1, v2, "knows")

    # checkpoint BEFORE any backdated tx exists: day2 -> create tx only
    g.set_checkpoint_time(ts(2))
    assert g.get_edge(e.get_id()) is None
    assert g.get_vertex(v1.get_id()).get_property("p1") is None
    g.set_checkpoint_time(None)

    g.set_transaction_time(ts(2))  # backdated write #1
    v1.set_property("p1", "x")

    # checkpoint read BETWEEN the two backdated transactions:
    # day2 now resolves to the p1 tx (max id) => edge visible too
    g.set_checkpoint_time(ts(2))
    assert g.get_vertex(v1.get_id()).get_property("p1") == "x"
    assert g.get_edge(e.get_id()) is not None
    g.set_checkpoint_time(None)

    g.set_transaction_time(ts(6))  # backdated write #2
    v2.set_property("p2", "y")
    g.set_transaction_time(None)

    # day2 still resolves to the p1 tx (p2's time is day6 > day2):
    # p2 not visible, p1 and the edge are
    g.set_checkpoint_time(ts(2))
    assert g.get_vertex(v1.get_id()).get_property("p1") == "x"
    assert g.get_vertex(v2.get_id()).get_property("p2") is None
    g.set_checkpoint_time(ts(6))
    assert g.get_vertex(v2.get_id()).get_property("p2") == "y"
    g.set_checkpoint_time(None)

    # golden chain lengths: v1 = create + edge-bump + prop write;
    # v2 = create + edge-bump + prop write; e = single version
    assert chain_len(v1) == 3
    assert chain_len(v2) == 3
    assert chain_len(e) == 1

    # the bump copy carries no properties (props were written later in
    # tx order than the bump): walking v1's chain backward is
    # p1=x -> bump(None) -> create(None)
    assert [p.get_property("p1") for p in v1.previous_versions()] == [None, None]


def test_cascade_remove_then_backdated_edge(spark):
    """day1: v1,v2,v3.  day2: e1 v1->v2.  day3: e2 v2->v3.
    day10: remove v2 (cascades e1+e2, bumps v1 and v3).
    Then backdate e3 = v1->v3 to day5.

    Current state: v2 and both old edges gone, e3 live.  checkpoint(day5)
    resolves to the backdated tx (max id), so the day10 cascade is
    included: same picture as current."""
    g = TemporalGraph.create(spark)
    g.set_transaction_time(ts(1))
    v1, v2, v3 = g.add_vertex(), g.add_vertex(), g.add_vertex()
    g.set_transaction_time(ts(2))
    e1 = g.add_edge(None, v1, v2, "a")
    g.set_transaction_time(ts(3))
    e2 = g.add_edge(None, v2, v3, "b")
    g.set_transaction_time(ts(10))
    g.remove_vertex(v2)
    g.set_transaction_time(ts(5))  # backdated edge insert
    e3 = g.add_edge(None, v1, v3, "c")
    g.set_transaction_time(None)

    assert g.get_vertex(v2.get_id()) is None
    assert g.get_edge(e1.get_id()) is None
    assert g.get_edge(e2.get_id()) is None
    assert g.get_edge(e3.get_id()) is not None

    # chains: v1 = create + e1-add bump + cascade bump + e3-add bump
    assert chain_len(v1) == 4
    # v3 = create + e2-add bump + cascade bump + e3-add bump
    assert chain_len(v3) == 4

    # checkpoint day4: only txs with time <= day4 (create, e1, e2) —
    # the original topology, v2 alive
    g.set_checkpoint_time(ts(4))
    assert g.get_vertex(v2.get_id()) is not None
    assert g.get_edge(e1.get_id()) is not None
    assert g.get_edge(e2.get_id()) is not None
    assert g.get_edge(e3.get_id()) is None

    # checkpoint day5: resolves to e3's tx (max id) -> includes the
    # day10 cascade that precedes it in tx order
    g.set_checkpoint_time(ts(5))
    assert g.get_vertex(v2.get_id()) is None
    assert g.get_edge(e1.get_id()) is None
    assert g.get_edge(e3.get_id()) is not None
    g.set_checkpoint_time(None)

    # as_of() snapshot views agree with set_checkpoint_time reads
    snap = g.as_of(ts(4))
    assert snap.get_vertex(v2.get_id()) is not None
    assert snap.get_edge(e3.get_id()) is None
    with pytest.raises(RuntimeError):
        snap.add_vertex()
