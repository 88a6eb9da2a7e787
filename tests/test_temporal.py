"""Temporal operator tests (P1-P9) — the surface the reference leaves
UNTESTED (SURVEY.md §5); scripted mutation timelines with golden
version-chain assertions per FIXTURES.md §4."""

import datetime

import pytest

from fluxgraph_spark import IN, OUT, TemporalGraph
from fluxgraph_spark.model import MAX_TIME

T0 = datetime.datetime(2020, 1, 1)


def ts(n):
    return T0 + datetime.timedelta(days=n)


@pytest.fixture()
def timeline(spark):
    """day1: v1, v2 created; day2: v1.name=alice; day3: e1 v1->v2 (bumps both);
    day4: v1.name=alicia; day5: remove e1 (bumps both)."""
    g = TemporalGraph.create(spark)
    g.set_transaction_time(ts(1))
    v1, v2 = g.add_vertex(), g.add_vertex()
    g.set_transaction_time(ts(2))
    v1.set_property("name", "alice")
    g.set_transaction_time(ts(3))
    e1 = g.add_edge(None, v1, v2, "knows")
    g.set_transaction_time(ts(4))
    v1.set_property("name", "alicia")
    g.set_transaction_time(ts(5))
    g.remove_edge(e1)
    g.set_transaction_time(None)
    return g, v1, v2, e1


def test_version_chain_includes_topology_bumps(timeline):
    """v1 chain: create, set name, edge add (bump), set name, edge remove
    (bump) = 5 versions (reference FluxGraph.java:156-157, 362-363)."""
    g, v1, v2, e1 = timeline
    prevs = list(v1.previous_versions())
    assert len(prevs) == 4
    # v2 only sees create + 2 topology bumps
    assert len(list(v2.previous_versions())) + 1 == 3


def test_previous_next_roundtrip(timeline):
    g, v1, _, _ = timeline
    p = v1.previous_version()
    assert p.get_property("name") == "alicia"  # bump kept props
    p2 = p.previous_version()
    assert p2.get_property("name") == "alice"
    n = p2.next_version()
    assert n.get_property("name") == "alicia"
    assert not n.is_current_version()
    # walking forward from the first version ends at the current element
    chain = list(p2.next_versions())
    assert chain[-1].is_current_version()


def test_version_filter(timeline):
    g, v1, _, _ = timeline
    named = list(v1.previous_versions(lambda el: el.get_property("name") == "alice"))
    assert len(named) == 2  # name=alice version + its bump copy at edge-add


def test_checkpoint_between_txs(timeline):
    """P1: as-of reads pin every lookup (FluxGraph.java:225-243)."""
    g, v1, v2, e1 = timeline
    g.set_checkpoint_time(ts(2))
    assert g.get_vertex(v1.get_id()).get_property("name") == "alice"
    assert g.get_edge(e1.get_id()) is None  # edge not yet created
    g.set_checkpoint_time(ts(3))
    assert g.get_edge(e1.get_id()) is not None
    g.set_checkpoint_time(ts(10))
    assert g.get_edge(e1.get_id()) is None  # removed on day5
    assert g.get_vertex(v1.get_id()).get_property("name") == "alicia"
    g.set_checkpoint_time(None)
    assert g.get_vertex(v1.get_id()).is_current_version()


def test_checkpoint_before_everything(timeline):
    g, v1, _, _ = timeline
    g.set_checkpoint_time(ts(0))
    assert g.get_vertex(v1.get_id()) is None
    assert list(g.get_vertices()) == []
    g.set_checkpoint_time(None)


def test_as_of_readonly_snapshot(timeline):
    g, v1, v2, e1 = timeline
    snap = g.as_of(ts(3))
    assert snap.get_vertex(v1.get_id()).get_property("name") == "alice"
    assert snap.get_edge(e1.get_id()) is not None
    with pytest.raises(RuntimeError):
        snap.add_vertex()
    with pytest.raises(RuntimeError):
        snap.clear()
    # origin graph unaffected
    assert g.get_vertex(v1.get_id()).get_property("name") == "alicia"


def test_backdated_write_out_of_order(spark):
    """P2: arbitrary backdating; checkpoint resolution must map tx_time ->
    max(tx_id) without assuming sorted times (FluxGraph.java:228-241)."""
    g = TemporalGraph.create(spark)
    g.set_transaction_time(ts(5))
    v = g.add_vertex()
    v.set_property("x", 1)
    g.set_transaction_time(ts(2))  # backdate AFTER a later tx exists
    v.set_property("x", 2)
    g.set_transaction_time(None)
    # at day 3, the latest tx with tx_time <= day3 is the backdated one (tx 3)
    g.set_checkpoint_time(ts(3))
    assert g.get_vertex(v.get_id()).get_property("x") == 2
    g.set_checkpoint_time(None)
    assert v.get_property("x") == 2  # tx order (not time order) wins for current


def test_time_id_and_is_deleted(timeline):
    g, v1, v2, e1 = timeline
    # txs: 1=add v1, 2=add v2, 3=name, 4=edge add, 5=name, 6=edge remove
    assert v1.time_id() == 6
    assert not v1.is_deleted()
    g.remove_vertex(v1)
    assert v1.is_deleted()
    assert v1.time_id() is None


def test_time_interval(timeline):
    """P9: [tx_time(from), tx_time(to)); open end = MAX_TIME
    (FluxElement.java:142-152)."""
    g, v1, _, _ = timeline
    start, end = v1.time_interval()
    assert start == ts(5) and end == MAX_TIME
    first = list(v1.previous_versions())[-1]
    s, e = first.time_interval()
    assert s == ts(1) and e == ts(2)


def test_dataframe_temporal_ops(timeline, spark):
    """Set-at-a-time windows: one scan yields every chain (P5-P7)."""
    from fluxgraph_spark.operators import temporal as TP

    g, v1, v2, e1 = timeline
    hist = g.vertices_df(snapshot=False)
    chains = TP.with_version_index(TP.with_prev_next(hist))
    rows = {
        (r["id"], r["version_idx"]): r
        for r in chains.collect()
    }
    assert rows[(v1.get_id(), 1)]["prev_tx_from"] is None
    assert rows[(v1.get_id(), 5)]["next_tx_from"] is None
    assert rows[(v1.get_id(), 2)]["prev_tx_from"] == rows[(v1.get_id(), 1)]["tx_from"]
    # intervals
    iv = TP.validity_intervals(hist, g.tx_log_df())
    cur = [r for r in iv.collect() if r["id"] == v1.get_id() and r["tx_to"] is None][0]
    assert cur["valid_from"] == ts(5) and cur["valid_to"] == MAX_TIME
    # time ids from the log
    tids = {r["element_id"]: r["time_id"] for r in TP.time_ids(g.tx_log_df()).collect()}
    assert tids[v1.get_id()] == v1.time_id()
    # checkpoint resolution via DataFrame agg matches driver-side resolution
    assert TP.resolve_checkpoint(g.tx_log_df(), ts(3)) == g.resolve_checkpoint(ts(3))


def test_interval_join_matches_naive_theta(spark):
    """Bucketed interval_join == the naive equi+range join, including
    intervals spanning many buckets and points on boundaries."""
    import datetime

    from pyspark.sql import functions as F

    from fluxgraph_spark.operators import temporal as TP

    base = datetime.datetime(2024, 1, 1)

    def t(h, m=0):
        return base + datetime.timedelta(hours=h, minutes=m)

    points = spark.createDataFrame(
        [(1, "k1", t(0)), (2, "k1", t(5)), (3, "k1", t(23, 59)),
         (4, "k2", t(5)), (5, "k1", t(24))],
        ["pid", "key", "pts"],
    )
    intervals = spark.createDataFrame(
        [(100, "k1", t(0), t(24)),     # spans 4 six-hour buckets
         (101, "k1", t(5), t(6)),      # inside one bucket
         (102, "k2", t(0), t(1)),      # wrong key for most points
         (103, "k1", t(23), t(30))],   # crosses midnight
        ["iid", "key", "start", "end"],
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in TP.interval_join(
            points, intervals, ["key"], "pts", "start", "end",
            bucket=datetime.timedelta(hours=6),
        ).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in points.join(
            intervals, "key"
        ).where(
            (F.col("pts") >= F.col("start")) & (F.col("pts") < F.col("end"))
        ).collect()
    )
    assert got == naive
    # boundary semantics: start inclusive (pid 1 in 100), end exclusive
    # (pid 5 NOT in 100 but in 103)
    assert (1, 100) in got and (5, 100) not in got and (5, 103) in got


def test_scd2_upsert_equals_full_rebuild(spark):
    """Incremental SCD2 upsert == rebuilding from the concatenated
    change history (keys with and without changes, late new keys)."""
    from pyspark.sql import functions as F

    from fluxgraph_spark.operators import temporal as TP

    def ev(uid, day, val):
        return (uid, datetime.datetime(2024, 1, day), val)

    first = spark.createDataFrame(
        [ev(1, 1, "a"), ev(1, 3, "b"), ev(2, 2, "x"), ev(3, 1, "q")],
        ["user_id", "ts", "state"],
    )
    second = spark.createDataFrame(
        # user 1 gets more changes, user 4 is brand new, users 2/3 untouched
        [ev(1, 5, "c"), ev(4, 4, "n")],
        ["user_id", "ts", "state"],
    )
    current = TP.scd2_from_change_events(first, ["user_id"], "ts").select(
        "user_id", F.col("ts").alias("valid_from"), "state",
        "valid_to", "version_idx", "is_current",
    )
    upserted = TP.scd2_upsert(
        current, second.select("user_id", F.col("ts").alias("valid_from"), "state"),
        ["user_id"],
    )
    rebuilt = TP.scd2_from_change_events(
        first.unionByName(second), ["user_id"], "ts"
    ).select(
        "user_id", F.col("ts").alias("valid_from"), "state",
        "valid_to", "version_idx", "is_current",
    )
    key = lambda r: (r["user_id"], r["valid_from"])
    assert sorted(map(tuple, upserted.collect()), key=lambda t: (t[0], t[1])) == \
           sorted(map(tuple, rebuilt.collect()), key=lambda t: (t[0], t[1]))
    # user 1's old open version must now be closed
    u1 = {r["version_idx"]: r for r in upserted.where(F.col("user_id") == 1).collect()}
    assert u1[2]["is_current"] is False and u1[2]["valid_to"] is not None
    assert u1[3]["state"] == "c" and u1[3]["is_current"] is True


def test_interval_join_randomized_matches_naive(spark):
    """Property-style: bucketed interval_join == naive theta join on
    randomized (seeded) points/intervals across bucket widths."""
    import random

    from pyspark.sql import functions as F

    from fluxgraph_spark.operators import temporal as TP

    rng = random.Random(20260813)
    base = datetime.datetime(2024, 1, 1)
    us = lambda m: base + datetime.timedelta(minutes=m)
    points = [(i, f"k{rng.randrange(3)}", us(rng.randrange(0, 3000))) for i in range(120)]
    ivs = []
    for i in range(60):
        start = rng.randrange(0, 3000)
        ivs.append((100 + i, f"k{rng.randrange(3)}", us(start), us(start + rng.randrange(1, 600))))
    pdf = spark.createDataFrame(points, ["pid", "key", "pts"])
    idf = spark.createDataFrame(ivs, ["iid", "key", "start", "end"])
    naive = sorted(
        (r["pid"], r["iid"])
        for r in pdf.join(idf, "key")
        .where((F.col("pts") >= F.col("start")) & (F.col("pts") < F.col("end")))
        .collect()
    )
    for hours in (1, 6, 48):
        got = sorted(
            (r["pid"], r["iid"])
            for r in TP.interval_join(
                pdf, idf, ["key"], "pts", "start", "end",
                bucket=datetime.timedelta(hours=hours),
            ).collect()
        )
        assert got == naive, f"bucket={hours}h"


def test_asof_join_forward_and_ties(spark):
    from pyspark.sql import functions as F

    from fluxgraph_spark.operators import temporal as TP

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, "k", t(10)), (2, "k", t(20)), (3, "k", t(40))],
        ["lid", "key", "lts"],
    )
    right = spark.createDataFrame(
        [("k", t(5), 50.0), ("k", t(20), 200.0), ("k", t(30), 300.0)],
        ["key", "rts", "val"],
    )
    fwd = {r["lid"]: r["val"] for r in TP.asof_join(
        left, right, ["key"], "lts", "rts", ["val"], direction="forward"
    ).collect()}
    # next value at-or-after: 10 -> 200 (t20), 20 -> 200 (tie inclusive),
    # 40 -> none
    assert fwd == {1: 200.0, 2: 200.0, 3: None}
    bwd = {r["lid"]: r["val"] for r in TP.asof_join(
        left, right, ["key"], "lts", "rts", ["val"]
    ).collect()}
    assert bwd == {1: 50.0, 2: 200.0, 3: 300.0}


def test_asof_join_duplicate_timestamp_determinism(spark):
    """Several right rows sharing (key, ts): backward picks the MAX value
    tuple among the tied rows, forward the MIN — deterministic, pinned so
    the SQL oracles (max/min over {'ts','v'} structs) can replay it."""
    from fluxgraph_spark.operators import temporal as TP

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame([(1, "k", t(10))], ["lid", "key", "lts"])
    right = spark.createDataFrame(
        [("k", t(5), 1.0), ("k", t(5), 9.0), ("k", t(5), 4.0),
         ("k", t(20), 7.0), ("k", t(20), 2.0)],
        ["key", "rts", "val"],
    )
    bwd = TP.asof_join(left, right, ["key"], "lts", "rts", ["val"]).collect()
    assert len(bwd) == 1 and bwd[0]["val"] == 9.0
    fwd = TP.asof_join(
        left, right, ["key"], "lts", "rts", ["val"], direction="forward"
    ).collect()
    assert len(fwd) == 1 and fwd[0]["val"] == 2.0
    near = TP.asof_join(
        left, right, ["key"], "lts", "rts", ["val"], direction="nearest"
    ).collect()
    # 5 is 5min back, 20 is 10min fwd -> backward side, max of the tie
    assert len(near) == 1 and near[0]["val"] == 9.0


def test_asof_join_null_value_does_not_mix_rows(spark):
    """A NULL in a right value column must NOT be skipped over to an
    older row's value — all value columns come from the single chosen
    right row (struct-carried)."""
    from fluxgraph_spark.operators import temporal as TP

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame([(1, "k", t(10))], ["lid", "key", "lts"])
    right = spark.createDataFrame(
        [("k", t(1), 100.0, "old"), ("k", t(9), None, "new")],
        "key string, rts timestamp_ntz, a double, b string",
    )
    row = TP.asof_join(
        left, right, ["key"], "lts", "rts", ["a", "b"]
    ).collect()[0]
    # chosen row is t(9): a is genuinely NULL there, b is "new"
    assert row["a"] is None and row["b"] == "new"


def test_scd2_upsert_randomized_splits(spark):
    """Seeded random event sets split at random points: incremental
    upsert must equal full rebuild regardless of how history is split
    (new keys late, keys untouched in the delta, interleaved times)."""
    import random

    from pyspark.sql import functions as F

    from fluxgraph_spark.operators import temporal as TP

    rng = random.Random(0xF10C5)
    events = [
        (rng.randrange(8), datetime.datetime(2024, 1, 1) +
         datetime.timedelta(minutes=i * 7 + rng.randrange(5)), f"s{i}")
        for i in range(60)
    ]
    # unique (key, ts) — scd2 ordering is by ts within key
    seen = set()
    events = [e for e in events if not (
        (e[0], e[1]) in seen or seen.add((e[0], e[1])))]
    cols = ["user_id", "ts", "state"]
    sel = lambda df: df.select(
        "user_id", F.col("ts").alias("valid_from"), "state",
        "valid_to", "version_idx", "is_current")
    for _ in range(4):
        cut = rng.randrange(1, len(events))
        shuffled = events[:]
        rng.shuffle(shuffled)
        first, second = shuffled[:cut], shuffled[cut:]
        current = sel(TP.scd2_from_change_events(
            spark.createDataFrame(first, cols), ["user_id"], "ts"))
        if not second:
            continue
        upserted = TP.scd2_upsert(
            current,
            spark.createDataFrame(second, cols).select(
                "user_id", F.col("ts").alias("valid_from"), "state"),
            ["user_id"],
        )
        rebuilt = sel(TP.scd2_from_change_events(
            spark.createDataFrame(events, cols), ["user_id"], "ts"))
        k = lambda t: (t[0], t[1])
        assert sorted(map(tuple, upserted.collect()), key=k) == \
               sorted(map(tuple, rebuilt.collect()), key=k)


def test_asof_join_tolerance(spark):
    import datetime as dt

    from fluxgraph_spark.operators import temporal as TP

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 7, t0), (2, 7, t0 + dt.timedelta(hours=2))],
        ["id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [(7, t0 - dt.timedelta(minutes=5), 11.0)],
        ["k", "ts", "v"],
    )
    out = {
        r["id"]: r["v"]
        for r in TP.asof_join(
            left, right, ["k"], "ts", "ts", ["v"],
            tolerance=dt.timedelta(minutes=10),
        ).collect()
    }
    # row 1: match is 5 min stale -> within tolerance
    assert out[1] == 11.0
    # row 2: same match is >2h stale -> nulled out
    assert out[2] is None

    # without tolerance the stale match is kept (back-compat)
    out2 = {
        r["id"]: r["v"]
        for r in TP.asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    }
    assert out2[2] == 11.0

    # forward direction: match 5 min ahead within tolerance, 2h ahead not
    fleft = spark.createDataFrame(
        [(1, 7, t0 - dt.timedelta(minutes=5)), (2, 7, t0 - dt.timedelta(hours=2))],
        ["id", "k", "ts"],
    )
    fright = spark.createDataFrame([(7, t0, 5.0)], ["k", "ts", "v"])
    fout = {
        r["id"]: r["v"]
        for r in TP.asof_join(
            fleft, fright, ["k"], "ts", "ts", ["v"],
            direction="forward", tolerance=dt.timedelta(minutes=10),
        ).collect()
    }
    assert fout[1] == 5.0
    assert fout[2] is None


def test_funnel_stages(spark):
    import datetime as dt

    from fluxgraph_spark.operators import temporal as TP

    t = lambda m: dt.datetime(2024, 1, 1, 12, m)
    rows = [
        # user 1 completes the whole funnel in order
        (1, t(0), "view"), (1, t(5), "click"), (1, t(9), "purchase"),
        # user 2: purchase BEFORE click -> funnel stops at click
        (2, t(0), "view"), (2, t(3), "purchase"), (2, t(6), "click"),
        # user 3: no view -> not in the output at all
        (3, t(1), "click"), (3, t(2), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["user_id"]: r for r in TP.funnel_stages(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert set(out) == {1, 2}
    assert out[1]["stage_reached"] == 3 and out[1]["t2"] == t(9)
    assert out[2]["stage_reached"] == 2 and out[2]["t2"] is None
    # a second purchase after the click completes user 2's funnel
    ev2 = spark.createDataFrame(rows + [(2, t(8), "purchase")], ["user_id", "ts", "event_type"])
    out2 = {r["user_id"]: r for r in TP.funnel_stages(
        ev2, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert out2[2]["stage_reached"] == 3 and out2[2]["t2"] == t(8)


def test_asof_join_nearest_picks_closer_side(spark):
    import datetime

    from fluxgraph_spark.operators import temporal as TP

    from pyspark.sql import functions as F

    def t(m):
        return datetime.datetime(2024, 1, 1, 0, m)

    left = spark.createDataFrame(
        [(1, t(10)), (2, t(30)), (3, t(50)), (4, t(0))],
        "lid long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("a", t(8)), ("b", t(11)), ("c", t(29)), ("d", t(31)), ("e", t(55))],
        "v string, rts timestamp_ntz",
    )
    left = left.withColumn("k", F.lit(1))
    right = right.withColumn("k", F.lit(1))
    out = {
        r["lid"]: r["v"]
        for r in TP.asof_join(
            left, right, ["k"], "ts", "rts", ["v"], direction="nearest"
        ).collect()
    }
    assert out[1] == "b"   # 11 is 1min away vs 8 at 2min
    assert out[2] == "c"   # tie (29 vs 31) -> earlier match wins
    assert out[3] == "e"   # only forward side within reach (55 vs 31: 5 vs 19)
    assert out[4] == "a"   # before all rights -> forward-only fallback... 8 is nearest
    # tolerance discards matches farther than the bound
    out_tol = {
        r["lid"]: r["v"]
        for r in TP.asof_join(
            left, right, ["k"], "ts", "rts", ["v"],
            direction="nearest", tolerance=datetime.timedelta(minutes=2),
        ).collect()
    }
    assert out_tol[1] == "b" and out_tol[2] == "c"
    assert out_tol[4] is None  # nearest (8min away) exceeds 2min bound


def test_scd2_compact_merges_unchanged_runs(spark):
    """scd2_compact: adjacent value-identical versions merge into one
    interval; the open version keeps the run open; changes split runs;
    a value can recur in a later, separate run."""
    import datetime as dt

    from fluxgraph_spark.operators import temporal as TP

    t0 = dt.datetime(2024, 1, 1)
    t = lambda n: t0 + dt.timedelta(hours=n)
    events = spark.createDataFrame(
        [
            # user 1: a a a b a(open) -> runs [a:0-3) [b:3-4) [a:4-)
            (1, t(0), "a"), (1, t(1), "a"), (1, t(2), "a"),
            (1, t(3), "b"), (1, t(4), "a"),
            # user 2: single open version
            (2, t(0), "x"),
        ],
        "user_id long, ts timestamp_ntz, state string",
    )
    versions = TP.scd2_from_change_events(events, ["user_id"], "ts")
    out = TP.scd2_compact(versions, ["user_id"], ["state"])
    rows = {
        (r["user_id"], r["valid_from"]): (r["state"], r["valid_to"])
        for r in out.collect()
    }
    assert rows == {
        (1, t(0)): ("a", t(3)),
        (1, t(3)): ("b", t(4)),
        (1, t(4)): ("a", None),
        (2, t(0)): ("x", None),
    }
