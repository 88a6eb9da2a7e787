"""On-disk layout: time-bucketed SCD2 partitioning + id bucketing.

As-of reads carry the predicate ``tx_from <= T AND (tx_to IS NULL OR
tx_to > T)`` (operators/temporal.py).  A version row with
``tx_from <= T`` can only live in a tx_from-bucket ``<= bucket(T)``, so
partitioning by ``tx_bucket = floor(tx_from / bucket_txs)`` lets the
scan skip every later bucket — partition pruning visible as
``PartitionFilters`` in the physical plan.  This is the "explicit
partition columns" variant SURVEY.md §4.2.6 recommends over a custom
Catalyst rule.

Id bucketing (``bucketBy`` on the join key) pre-shuffles element tables
once at write time so repeated traversal joins are exchange-free.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import model as M

TX_BUCKET = "tx_bucket"


def write_time_bucketed(
    df: DataFrame, path: str, bucket_txs: int = 10_000
) -> None:
    """Write an SCD2 element table partitioned by tx_from bucket."""
    (
        df.withColumn(
            TX_BUCKET, F.floor(F.col(M.TX_FROM) / F.lit(bucket_txs)).cast("long")
        )
        .write.mode("overwrite")
        .partitionBy(TX_BUCKET)
        .parquet(path)
    )


def read_as_of_pruned(
    spark: SparkSession, path: str, as_of_tx: int, bucket_txs: int = 10_000
) -> DataFrame:
    """As-of snapshot over a time-bucketed table.  The ``tx_bucket``
    predicate is a pure partition filter (no file rows read for later
    buckets); the row-level snapshot predicate handles the rest."""
    df = spark.read.parquet(path)
    return df.where(
        (F.col(TX_BUCKET) <= as_of_tx // bucket_txs)
        & (F.col(M.TX_FROM) <= as_of_tx)
        & (F.col(M.TX_TO).isNull() | (F.col(M.TX_TO) > as_of_tx))
    ).drop(TX_BUCKET)


def write_id_bucketed(
    df: DataFrame, table_name: str, n_buckets: int = 64, key: str = M.ID
) -> None:
    """Persist bucketed by the join key: co-located, exchange-free joins
    for every downstream traversal over the same key."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (for layout assertions in tests)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def morton_col(scaled: list, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of pre-scaled integer columns: bit
    ``i`` of dimension ``j`` lands at position ``i * k + j``.  Pure
    bitwise Catalyst expressions (``bits x k`` shift/mask terms — 32-64
    nodes, constant plan size), no UDF."""
    k = len(scaled)
    if bits * k > 63:
        raise ValueError(
            f"morton key needs {bits * k} bits for {k} dims x {bits} "
            "bits, but a signed long holds 63 — reaching the sign bit "
            "would order high-coordinate rows FIRST and silently break "
            "the clustering; lower `bits` (e.g. 15 for 4 dims)"
        )
    out = F.lit(0).cast("long")
    for j, c in enumerate(scaled):
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return out


def _scale_to_lattice(df: DataFrame, cols: list, bits: int):
    """Linear min-max scaling of numeric columns into ``bits``-bit
    lattice coordinates (shared by :func:`zorder_write` and
    :func:`hilbert_write`).  One bounded driver probe (2 x len(cols)
    scalars); returns None when the table is empty / all-NULL so the
    caller can fall back to a plain write."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{j}") for j, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"hi_{j}") for j, c in enumerate(cols)],
    ).collect()[0]  # bounded driver probe: 2 x len(cols) scalars
    if any(stats[f"lo_{j}"] is None for j in range(len(cols))):
        return None
    scaled = []
    top = (1 << bits) - 1
    for j, c in enumerate(cols):
        lo, hi = stats[f"lo_{j}"], stats[f"hi_{j}"]
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(c).cast("double") - F.lit(lo))
                        * F.lit(top / span)
                    ).cast("long"),
                ),
            )
        )
    return scaled


def hilbert_key_frame(
    df: DataFrame, scaled: list, bits: int = 8, out: str = "__h"
) -> DataFrame:
    """Append the 2-D Hilbert index of two pre-scaled ``bits``-bit
    integer coordinates as column ``out``.

    The classic xy2d recurrence (top bit down: emit the quadrant digit,
    then rotate/reflect the LOWER bits into canonical orientation)
    rewrites x and y at every step, so a single nested Column expression
    would double in size per bit.  Instead each step is ONE projection
    whose x'/y'/d' reference the PREVIOUS step's named columns — the
    plan stays linear in ``bits`` (and Catalyst's CollapseProject leaves
    multi-referenced non-trivial projections alone, so it cannot
    re-inline the chain into an exponential tree).  Pure bitwise/
    conditional Catalyst expressions, no UDF, whole-stage codegen keeps
    the key computation JVM-side."""
    xs, ys = "__hx", "__hy"
    keep = df.columns
    df = df.select(
        "*",
        scaled[0].cast("long").alias(xs),
        scaled[1].cast("long").alias(ys),
        F.lit(0).cast("long").alias(out),
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col(xs), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col(ys), i).bitwiseAND(F.lit(1))
        d2 = F.col(out) + F.lit(s * s).cast("long") * (
            (F.lit(3) * rx).bitwiseXOR(ry).cast("long")
        )
        # rot(): when ry==0, optionally reflect (rx==1), then swap x/y
        nx = (
            F.when(ry == 1, F.col(xs))
            .when(rx == 1, F.lit(s - 1) - F.col(ys))
            .otherwise(F.col(ys))
        )
        ny = (
            F.when(ry == 1, F.col(ys))
            .when(rx == 1, F.lit(s - 1) - F.col(xs))
            .otherwise(F.col(xs))
        )
        df = df.select(
            *keep, nx.alias(xs), ny.alias(ys), d2.alias(out)
        )
    return df.drop(xs, ys)


def hilbert_write(
    df: DataFrame,
    path: str,
    cols: list,
    bits: int = 8,
    n_files: Optional[int] = None,
) -> None:
    """2-D clustering on the Hilbert curve: like :func:`zorder_write`
    but ordering files along the Hilbert space-filling curve instead of
    the Morton interleave.  Hilbert has strictly better locality — every
    curve step is a UNIT lattice step (Morton takes long diagonal jumps
    at power-of-two boundaries), so a contiguous key range decomposes
    into fewer/tighter boxes and a 2-D box predicate touches fewer files
    for the same file count; at 100 TB that is the difference measured
    in whole row-groups skipped.  The trade: the key needs a
    ``bits``-step rotate/reflect recurrence instead of one interleave
    expression — still pure Catalyst projections (see
    :func:`hilbert_key_frame`), paid once at write time.

    Exactly two columns (the curve is 2-D here; Morton covers k-D).
    Reads need no helper: plain ``spark.read.parquet`` + the box
    predicate, pushed down as usual."""
    if len(cols) != 2:
        raise ValueError(
            f"hilbert_write clusters exactly 2 columns, got {len(cols)} "
            "— use zorder_write for other dimensionalities"
        )
    spark = df.sparkSession
    if n_files is None:
        n_files = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    scaled = _scale_to_lattice(df, cols, bits)
    if scaled is None:
        df.write.mode("overwrite").parquet(path)
        return
    (
        hilbert_key_frame(df, scaled, bits, out="__h")
        .repartitionByRange(n_files, F.col("__h"))
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list,
    bits: int = 16,
    n_files: Optional[int] = None,
) -> None:
    """Multi-dimensional clustering for scan skipping: write ``df``
    range-partitioned and sorted by the Morton (Z-order) interleave of
    ``cols`` (numeric).  Each output file then covers a contiguous
    Z-range, which is a small BOX in the original dimensions — so
    parquet footer/row-group min-max stats become tight on EVERY
    clustered column and a multi-column box predicate skips most files.
    A single-column sort gives this for one column only; at 100 TB the
    difference is reading ~sqrt(selectivity) of the files instead of
    all of them for 2-D point/range lookups.  This is the layout trick
    behind Delta OSS ``OPTIMIZE ZORDER BY`` and the classic UB-tree.

    Columns scale LINEARLY between their min and max into ``bits``-bit
    lattice coordinates (one bounded min/max probe at write time) —
    heavy value skew clusters less evenly than a rank-based scaling
    would; pre-transform (log, bucketed rank) skewed columns before
    passing them in.  Reads need no helper: plain ``spark.read.parquet``
    + the box predicate, pushed down as usual."""
    if not cols:
        raise ValueError("zorder_write needs at least one column")
    spark = df.sparkSession
    if n_files is None:
        n_files = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    scaled = _scale_to_lattice(df, cols, bits)
    if scaled is None:
        # zero rows (or an all-NULL column): nothing to cluster — write
        # the (empty) table plainly instead of dying in the scaler
        df.write.mode("overwrite").parquet(path)
        return
    (
        df.withColumn("__z", morton_col(scaled, bits))
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def materialize_graph_bucketed(
    vertices: DataFrame,
    edges: DataFrame,
    database_prefix: str,
    n_buckets: int = 32,
) -> "BucketedGraph":
    """Traversal-optimized graph layout: vertices bucketed by id, edges
    stored TWICE — bucketed by ``src`` (out-hops) and by ``dst``
    (in-hops), the storage analog of forward and reverse adjacency
    indexes.  A hop join against either copy reads the (huge) edge table
    pre-shuffled from disk, so the only Exchange in the plan moves the
    (small) frontier — at 100 TB the edge table never crosses the
    network again after the one-time write.  The duplicate edge copy is
    the textbook space-for-shuffle trade every production graph store
    makes (adjacency in both directions)."""
    write_id_bucketed(vertices, f"{database_prefix}_vertices", n_buckets, key=M.ID)
    # two writes, one computation: without the persist a DERIVED edges
    # frame (tpch unions, joins...) would re-run its full lineage for
    # the second copy
    edges = edges.persist()
    try:
        write_id_bucketed(edges, f"{database_prefix}_edges_out", n_buckets, key=M.SRC)
        write_id_bucketed(edges, f"{database_prefix}_edges_in", n_buckets, key=M.DST)
    finally:
        edges.unpersist()
    return BucketedGraph(vertices.sparkSession, database_prefix)


class BucketedGraph:
    """Reader over :func:`materialize_graph_bucketed` tables with
    frontier-only-shuffle hop joins."""

    def __init__(self, spark: SparkSession, database_prefix: str) -> None:
        self.spark = spark
        self.prefix = database_prefix

    def vertices(self) -> DataFrame:
        return self.spark.table(f"{self.prefix}_vertices")

    def edges_out(self) -> DataFrame:
        return self.spark.table(f"{self.prefix}_edges_out")

    def edges_in(self) -> DataFrame:
        return self.spark.table(f"{self.prefix}_edges_in")

    def _hop(self, frontier_ids: DataFrame, table: DataFrame, key: str,
             other: str, labels) -> DataFrame:
        e = table
        if labels:
            e = e.where(F.col(M.LABEL).isin(list(labels)))
        return (
            frontier_ids.select(F.col(M.ID).alias(key))
            .join(e, key)
            .select(F.col(other).alias(M.ID))
        )

    def out_hop(self, frontier_ids: DataFrame, *labels: str) -> DataFrame:
        """Bag of destination ids one hop out (duplicates preserved —
        T3 semantics).  The edges_out scan is bucket-aligned: only the
        frontier shuffles."""
        return self._hop(frontier_ids, self.edges_out(), M.SRC, M.DST, labels)

    def in_hop(self, frontier_ids: DataFrame, *labels: str) -> DataFrame:
        return self._hop(frontier_ids, self.edges_in(), M.DST, M.SRC, labels)
