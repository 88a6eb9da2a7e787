"""fsutil (sources/fsutil.py): the scheme-dispatched maintenance
primitives, and the ANN index maintenance paths running entirely on a
``file://`` URI — which routes every primitive through the Hadoop
FileSystem branch (Hadoop's LocalFileSystem), proving the index layout
works on any Hadoop-compatible filesystem, not just POSIX paths."""

import json
import os

import pytest
from pyspark.sql import functions as F

from fluxgraph_spark.sources import fsutil
from fluxgraph_spark.sources.ann_index import DeltaIvfIndex, DeltaIvfPqIndex
from fluxgraph_spark.sources.tpch import read_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_tables(spark, SF_DIR)["embeddings"]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_scheme_detection():
    assert fsutil.has_scheme("file:///tmp/x")
    assert fsutil.has_scheme("hdfs://nn:8020/data")
    assert fsutil.has_scheme("s3a://bucket/key")
    assert not fsutil.has_scheme("/tmp/x")
    assert not fsutil.has_scheme("relative/path")


def test_fsutil_primitives_hadoop_branch(spark, tmp_path):
    """Every primitive through the Hadoop FileSystem API (file:// URI)."""
    root = f"file://{tmp_path}"

    # makedirs / is_dir / has_subdirs
    fsutil.makedirs(spark, f"{root}/a/b")
    assert fsutil.is_dir(spark, f"{root}/a")
    assert fsutil.has_subdirs(spark, f"{root}/a")
    assert not fsutil.has_subdirs(spark, f"{root}/a/b")
    assert not fsutil.has_subdirs(spark, f"{root}/missing")

    # write/read text round-trip; FileNotFoundError on absent
    fsutil.write_text(spark, f"{root}/m.json", json.dumps({"v": 1}))
    assert json.loads(fsutil.read_text(spark, f"{root}/m.json")) == {"v": 1}
    with pytest.raises(FileNotFoundError):
        fsutil.read_text(spark, f"{root}/nope.json")

    # replace_file atomically overwrites an existing destination
    fsutil.write_text(spark, f"{root}/m.json.tmp", json.dumps({"v": 2}))
    fsutil.replace_file(spark, f"{root}/m.json.tmp", f"{root}/m.json")
    assert json.loads(fsutil.read_text(spark, f"{root}/m.json")) == {"v": 2}
    assert not os.path.exists(tmp_path / "m.json.tmp")

    # rename moves directories; failure raises OSError
    fsutil.rename(spark, f"{root}/a/b", f"{root}/a/c")
    assert fsutil.is_dir(spark, f"{root}/a/c")
    with pytest.raises(OSError):
        fsutil.rename(spark, f"{root}/a/missing", f"{root}/a/d")

    # delete is recursive and missing-ok; remove_file, rmdir_if_empty
    fsutil.delete(spark, f"{root}/a")
    assert not fsutil.is_dir(spark, f"{root}/a")
    fsutil.delete(spark, f"{root}/a")  # second call: no error
    fsutil.remove_file(spark, f"{root}/m.json")
    fsutil.remove_file(spark, f"{root}/m.json")  # missing-ok
    assert not os.path.exists(tmp_path / "m.json")
    fsutil.makedirs(spark, f"{root}/e")
    fsutil.rmdir_if_empty(spark, f"{root}/e")
    assert not fsutil.is_dir(spark, f"{root}/e")
    fsutil.makedirs(spark, f"{root}/f/kid")
    fsutil.rmdir_if_empty(spark, f"{root}/f")  # non-empty: kept
    assert fsutil.is_dir(spark, f"{root}/f/kid")


def test_delta_ivf_index_on_hadoop_path(spark, emb, tmp_path):
    """The full DeltaIvfIndex lifecycle — build, streaming-style delta
    append, probe, crash-atomic merge, compact — on a ``file://`` URI:
    delta discovery, manifest publish/read, staged-dir swap and GC all
    run through the Hadoop FileSystem branch.  Results must be
    bit-identical to the same index on a plain local path."""
    seed = emb.where(F.col("vec_id") % 5 != 0)
    batch = emb.where(F.col("vec_id") % 5 == 0)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    local = DeltaIvfIndex.build(seed, str(tmp_path / "local"), n_centroids=16)
    local.append_batch(batch, batch_id=0)
    expect = _rows(local.topk(queries, k=5, n_probe=4))

    hroot = f"file://{tmp_path}/hadoop"
    idx = DeltaIvfIndex.build(seed, hroot, n_centroids=16)
    idx.append_batch(batch, batch_id=0)
    assert _rows(idx.topk(queries, k=5, n_probe=4)) == expect

    # merge folds the delta through the manifest on the Hadoop branch
    idx.merge_delta()
    assert _rows(idx.topk(queries, k=5, n_probe=4)) == expect
    m = json.loads(
        fsutil.read_text(spark, f"{hroot}/_delta_manifest.json")
    )
    assert m["base"]["lists"] == "lists__m1"
    assert m["folded_batches"] == [0]
    # old base GC'd, delta root dropped once folded
    assert not fsutil.is_dir(spark, f"{hroot}/lists")
    assert not fsutil.is_dir(spark, f"{hroot}/delta_lists")

    # compact's sibling swap on the versioned base dir
    idx.compact()
    assert _rows(idx.topk(queries, k=5, n_probe=4)) == expect

    # a reopened handle resolves the same manifest state
    again = DeltaIvfIndex(spark, hroot)
    assert _rows(again.topk(queries, k=5, n_probe=4)) == expect


def test_delta_ivfpq_index_on_hadoop_path(spark, emb, tmp_path):
    """The PQ twin on a ``file://`` URI: codebooks JSON write/read,
    raw-vector sidecar detection, and the one-swap merge covering both
    layouts all route through the Hadoop branch."""
    seed = emb.where(F.col("vec_id") % 5 != 0)
    batch = emb.where(F.col("vec_id") % 5 == 0)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    local = DeltaIvfPqIndex.build(
        seed, str(tmp_path / "local"), n_centroids=16, m=4, ksub=16
    )
    local.append_batch(batch, batch_id=0)
    expect = _rows(local.topk(queries, k=5, n_probe=4))
    expect_rr = _rows(local.topk_rerank(queries, k=5, n_probe=4))

    hroot = f"file://{tmp_path}/hadoop"
    idx = DeltaIvfPqIndex.build(seed, hroot, n_centroids=16, m=4, ksub=16)
    idx.append_batch(batch, batch_id=0)
    assert _rows(idx.topk(queries, k=5, n_probe=4)) == expect
    assert _rows(idx.topk_rerank(queries, k=5, n_probe=4)) == expect_rr

    idx.merge_delta()
    assert _rows(idx.topk(queries, k=5, n_probe=4)) == expect
    assert _rows(idx.topk_rerank(queries, k=5, n_probe=4)) == expect_rr
    m = json.loads(fsutil.read_text(spark, f"{hroot}/_delta_manifest.json"))
    assert m["base"]["codes"] == "codes__m1"
    assert m["base"]["vectors"] == "vectors__m1"
    assert not fsutil.is_dir(spark, f"{hroot}/delta_codes")
    assert not fsutil.is_dir(spark, f"{hroot}/delta_vectors")


def test_scd2_table_on_hadoop_path(spark, tmp_path):
    """The durable SCD2 table's write-audit-publish lifecycle — ingest,
    manifest-driven reload, time travel, vacuum — on a ``file://`` URI:
    manifest publish/read, staged-bucket swap, staging GC and the
    vacuum listing all route through the Hadoop branch."""
    import datetime

    from fluxgraph_spark.sources.scd2_table import Scd2ParquetTable

    t0 = datetime.datetime(2024, 1, 1)

    def batch(rows):
        return spark.createDataFrame(
            rows, "user_id long, valid_from timestamp_ntz, state string"
        )

    hroot = f"file://{tmp_path}/tbl"
    tbl = Scd2ParquetTable(spark, hroot, ["user_id"], n_buckets=4)
    a1 = tbl.ingest(batch([(1, t0, "a"), (2, t0, "x")]))
    a2 = tbl.ingest(
        batch([(1, t0 + datetime.timedelta(hours=5), "b"), (3, t0, "m")])
    )
    assert (a1["version"], a2["version"]) == (1, 2)

    # manifest-driven reload through a fresh handle
    tbl2 = Scd2ParquetTable(spark, hroot, ["ignored"])
    assert tbl2.key_cols == ["user_id"]
    got = sorted(
        map(tuple, tbl2.read().select("user_id", "state", "is_current").collect())
    )
    assert got == [
        (1, "a", False), (1, "b", True), (2, "x", True), (3, "m", True),
    ]

    # transaction-time travel resolves the retained v1 manifest
    v1 = sorted(r["user_id"] for r in tbl2.read_version(1).collect())
    assert v1 == [1, 2]

    # vacuum drops user 1's dead bucket version; current state intact
    assert tbl2.vacuum() >= 1
    assert sorted(
        map(tuple, tbl2.read().select("user_id", "state", "is_current").collect())
    ) == got


def test_delete_handles_plain_files_on_both_branches(spark, tmp_path):
    """fsutil.delete must remove FILES as well as directories on the
    POSIX branch — the Hadoop branch always did (fs.delete recursive),
    and callers pass staged files (versioned codebooks JSONs) through
    the same primitive."""
    for prefix in ("", "file://"):
        f = tmp_path / f"plain_{bool(prefix)}.json"
        f.write_text("{}")
        fsutil.delete(spark, prefix + str(f))
        assert not f.exists()
        d = tmp_path / f"dir_{bool(prefix)}"
        (d / "sub").mkdir(parents=True)
        fsutil.delete(spark, prefix + str(d))
        assert not d.exists()
        fsutil.delete(spark, prefix + str(tmp_path / "missing"))  # no-op
